package graft.operators

import graft.{GQuery, Tables}
import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family for an LLM training-data pipeline
  * (SURVEY.md §2.D). Scale discipline: NOTHING here is a global
  * O(n²) cross join — candidates come from hash groups (exact),
  * blocking keys (shingle jaccard), LSH band buckets (minhash), or
  * band-blocked simhash. Per-bucket pair expansion is the only
  * quadratic step and bucket sizes are bounded by design.
  */
object Dedup {

  /** Exact dedup on md5(normalized text): canonical id per content
    * hash. One hash-shuffle; at 100 TB this is the cheapest possible
    * full-corpus dedup.
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(Text.normalized(col("text")).cast("binary")).as("md5_hash"))
      .groupBy("md5_hash")
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy("md5_hash")

  /** Distinct 3-token shingles of the lowercased token stream. */
  private def shingled(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), Text.tokens(lower(col("text"))).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), col("source"),
        array_distinct(transform(
          sequence(lit(1), greatest(size(col("t")) - 2, lit(1))),
          i => concat_ws(" ",
            element_at(col("t"), i),
            element_at(col("t"), i + 1),
            element_at(col("t"), i + 2)))).as("shingles"))

  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Blocked n-gram-Jaccard near-dup pairs: candidate pairs share a
    * blocking key (source), verified with exact trigram-shingle
    * Jaccard ≥ 0.35. The block join is a shuffle on the key; pair
    * expansion is per-block only.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val a = shingled(spark, dir)
      .select(col("source"), col("doc_id").as("doc_id_1"), col("shingles").as("sh1"))
    val b = shingled(spark, dir)
      .select(col("source"), col("doc_id").as("doc_id_2"), col("shingles").as("sh2"))
    a.join(b, Seq("source"))
      .filter(col("doc_id_1") < col("doc_id_2"))
      .filter(jaccard(col("sh1"), col("sh2")) >= 0.35)
      .select(col("doc_id_1"), col("doc_id_2"),
        round(jaccard(col("sh1"), col("sh2")), 4).as("jaccard"))
      .orderBy("doc_id_1", "doc_id_2")
  }

  private val MinhashK = 32 // signature length
  private val BandRows = 4  // rows per LSH band → 8 bands

  /** MinHash + LSH near-dup candidates, fully declarative:
    * shingle → K minhashes (xxhash64 with K seeds, min per doc) →
    * bands of BandRows → bucket join on (band, band-hash) → exact
    * Jaccard verification of candidates only. The classic
    * Broder/MMDS construction; at 100 TB the bucket join replaces the
    * all-pairs comparison entirely. Rows-only (no SQL equivalent).
    */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sigCols = (0 until MinhashK).map { i =>
      min(xxhash64(col("shingle"), lit(i))).as(s"h$i")
    }
    val sigs = shingled(spark, dir)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .groupBy("doc_id")
      .agg(sigCols.head, sigCols.tail: _*)
    val bands = (0 until MinhashK / BandRows).map { b =>
      val cols = (b * BandRows until (b + 1) * BandRows).map(i => col(s"h$i"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bucket"))
    }
    val buckets = sigs
      .select(col("doc_id"), explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cand = buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id_1"), col("y.doc_id").as("doc_id_2"))
      .distinct()
    val sh = shingled(spark, dir).select(col("doc_id"), col("shingles"))
    cand
      .join(sh.withColumnsRenamed(Map("doc_id" -> "doc_id_1", "shingles" -> "sh1")), Seq("doc_id_1"))
      .join(sh.withColumnsRenamed(Map("doc_id" -> "doc_id_2", "shingles" -> "sh2")), Seq("doc_id_2"))
      .select(col("doc_id_1"), col("doc_id_2"),
        round(jaccard(col("sh1"), col("sh2")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.35)
      .orderBy("doc_id_1", "doc_id_2")
  }

  /** 64-bit SimHash over token hashes: per bit, sign of the sum of
    * ±1 contributions; near-dups share ≥1 of four 16-bit bands and
    * verify hamming ≤ 3 (bit_count of xor). Rows-only.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    // expr() SQL lambdas: the inner fold must reference the outer bit
    // variable, which nests naturally in SQL lambda syntax.
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), Text.tokens(lower(col("text"))).as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"),
        transform(array_distinct(col("t")), tk => xxhash64(tk)).as("hashes"))
      .select(col("doc_id"), expr(
        """aggregate(sequence(0, 63), 0L, (acc, b) ->
          |  acc | if(aggregate(hashes, 0L,
          |            (s, h) -> s + if(((h >> b) & 1L) = 1L, 1L, -1L)) > 0L,
          |          shiftleft(1L, b), 0L))""".stripMargin).as("simhash"))
    val banded = docs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bits"))): _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band").as("band"), col("bb.bits").as("bits"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bits") === col("y.bits") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id_1"), col("y.doc_id").as("doc_id_2"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("doc_id_1", "doc_id_2")
  }

  /** Embedding near-dup pairs: label-blocked cosine ≥ 0.3, double
    * arithmetic on both engines (sequential fold ⇒ bit-identical).
    * At scale the blocking key becomes an LSH/IVF cell (see
    * Similarity.ivfTopk); the verify step is identical.
    */
  def embedCosine(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val dot = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)
    val cosine = dot(col("x.v"), col("y.v")) /
      (sqrt(dot(col("x.v"), col("x.v"))) * sqrt(dot(col("y.v"), col("y.v"))))
    e.as("x").join(e.as("y"),
        col("x.label") === col("y.label") && col("x.vec_id") < col("y.vec_id"))
      .filter(cosine >= 0.3)
      .select(col("x.vec_id").as("vec_id_1"), col("y.vec_id").as("vec_id_2"),
        col("x.label").as("label"), round(cosine, 4).as("cosine"))
      .orderBy("vec_id_1", "vec_id_2")
  }

  val queries: Map[String, GQuery] = Map(
    "dd_exact" -> GQuery.sql(exact,
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS md5_hash,
        |  min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY md5_hash""".stripMargin),
    "dd_ngram_jaccard" -> GQuery.sql(ngramJaccard,
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
        |                x -> len(x) > 0) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source,
        |    list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
        |  FROM toks WHERE len(t) >= 3)
        |SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
        |  round(len(list_intersect(a.shingles, b.shingles))::DOUBLE /
        |        len(list_distinct(list_concat(a.shingles, b.shingles))), 4) AS jaccard
        |FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE /
        |      len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.35
        |ORDER BY doc_id_1, doc_id_2""".stripMargin),
    "dd_minhash_lsh" -> GQuery.rowsOnly(minhashLsh),
    "dd_simhash" -> GQuery.rowsOnly(simhash),
    "dd_embed_cosine" -> GQuery.sql(embedCosine,
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT x.vec_id AS vec_id_1, y.vec_id AS vec_id_2, x.label AS label,
        |  round(list_inner_product(x.v, y.v) /
        |    (sqrt(list_inner_product(x.v, x.v)) * sqrt(list_inner_product(y.v, y.v))), 4) AS cosine
        |FROM e x JOIN e y ON x.label = y.label AND x.vec_id < y.vec_id
        |WHERE list_inner_product(x.v, y.v) /
        |  (sqrt(list_inner_product(x.v, x.v)) * sqrt(list_inner_product(y.v, y.v))) >= 0.3
        |ORDER BY vec_id_1, vec_id_2""".stripMargin),
  )
}
