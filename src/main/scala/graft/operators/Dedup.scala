package graft.operators

import graft.{GQuery, Tables}
import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Token stream: one row per (doc, position, token). posexplode +
    * a row-level length filter keeps tokenization inside whole-stage
    * codegen — higher-order array functions (transform/filter) are
    * interpreted in Spark and, worse, get inlined into scan filters
    * by constraint propagation, so array-free is the scalable form.
    */
  private def tokenStream(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        posexplode(split(lower(col("text")), Text.TokenSplitRegex)).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)

  /** One row per distinct (doc, 3-token shingle), built with window
    * lead() over the token stream — the per-doc window sort is the
    * only cost and it parallelizes across docs via the window
    * shuffle (which also spreads the single-file local scan).
    */
  private def shingleRows(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    tokenStream(spark, dir)
      .withColumn("t1", lead(col("tok"), 1).over(w))
      .withColumn("t2", lead(col("tok"), 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), col("source"),
        concat_ws(" ", col("tok"), col("t1"), col("t2")).as("shingle"))
      .distinct()
    // NOT persisted: the identical distinct() shuffle in every branch
    // is deduplicated by exchange reuse within a query, and an
    // explicit cache measured slower (parallel branches race to build
    // it). A production pipeline would write this table out once.
  }

  /** Shingles keyed by 64-bit hash: joins and signatures operate on
    * 8-byte keys instead of ~30-char strings — far less shuffle bytes
    * and build-side memory (collision odds over the shingle
    * vocabulary are ~|V|²/2⁶⁴, negligible).
    */
  private def shingleHashRows(spark: SparkSession, dir: String): DataFrame =
    shingleRows(spark, dir)
      .select(col("doc_id"), col("source"), xxhash64(col("shingle")).as("sh"))

  private def shingleSizes(spark: SparkSession, dir: String): DataFrame =
    shingleHashRows(spark, dir).groupBy("doc_id")
      .agg(count(lit(1)).as("sh_size"))

  /** Blocked n-gram-Jaccard near-dup pairs: candidate pairs share a
    * blocking key (source), verified with exact trigram-shingle
    * Jaccard ≥ 0.35. The block join is a shuffle on the key; pair
    * expansion is per-block only.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // set-similarity join: pairs that share >=1 shingle (equi-join on
    // the shingle itself), |A∩B| by count, |A∪B| = |A|+|B|-|A∩B|.
    // No pair ever materializes both arrays; everything is a
    // codegen'd join + hash aggregate. Pairs sharing nothing are
    // never generated at all (they can't pass any threshold > 0).
    val r = shingleHashRows(spark, dir)
    val inter = r.select(col("source"), col("doc_id").as("doc_id_1"), col("sh"))
      .join(r.select(col("source"), col("doc_id").as("doc_id_2"), col("sh")),
        Seq("source", "sh"))
      .filter(col("doc_id_1") < col("doc_id_2"))
      .groupBy("doc_id_1", "doc_id_2")
      .agg(count(lit(1)).as("n_inter"))
    val sizes = shingleSizes(spark, dir)
    inter
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_id_1", "sh_size" -> "sz1")), Seq("doc_id_1"))
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_id_2", "sh_size" -> "sz2")), Seq("doc_id_2"))
      .withColumn("jaccard_raw", col("n_inter").cast("double") /
        (col("sz1") + col("sz2") - col("n_inter")).cast("double"))
      .filter(col("jaccard_raw") >= 0.35)
      .select(col("doc_id_1"), col("doc_id_2"), round(col("jaccard_raw"), 4).as("jaccard"))
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
      min(xxhash64(col("sh"), lit(i))).as(s"h$i")
    }
    val sigs = shingleHashRows(spark, dir)
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
    // exact-verify ONLY the candidates (tiny set): intersection counts
    // via broadcast joins against the shingle rows.
    val r = shingleHashRows(spark, dir).select("doc_id", "sh")
    val inter = broadcast(cand)
      .join(r.withColumnRenamed("doc_id", "doc_id_1"), Seq("doc_id_1"))
      .join(r.withColumnsRenamed(Map("doc_id" -> "doc_id_2", "sh" -> "sh2")),
        Seq("doc_id_2"))
      .filter(col("sh") === col("sh2"))
      .groupBy("doc_id_1", "doc_id_2")
      .agg(count(lit(1)).as("n_inter"))
    val sizes = shingleSizes(spark, dir)
    inter
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_id_1", "sh_size" -> "sz1")), Seq("doc_id_1"))
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_id_2", "sh_size" -> "sz2")), Seq("doc_id_2"))
      .withColumn("jaccard", round(col("n_inter").cast("double") /
        (col("sz1") + col("sz2") - col("n_inter")).cast("double"), 4))
      .filter(col("jaccard") >= 0.35)
      .select("doc_id_1", "doc_id_2", "jaccard")
      .orderBy("doc_id_1", "doc_id_2")
  }

  /** 64-bit SimHash over token hashes: per bit, sign of the sum of
    * ±1 contributions; near-dups share ≥1 of four 16-bit bands and
    * verify hamming ≤ 3 (bit_count of xor). Rows-only.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    // Per-bit ±1 sums as 64 codegen'd conditional aggregates over the
    // exploded (doc, token-hash) stream — one hash aggregate with
    // map-side partials, instead of interpreted nested lambda folds.
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"s$b")
    }
    val sigFromSums = (0 until 64).map { b =>
      when(col(s"s$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    val docs = tokenStream(spark, dir)
      .select(col("doc_id"), xxhash64(col("tok")).as("h")).distinct()
      .groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sigFromSums.as("simhash"))
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
    import graft.functions.VectorFunctions.{vec_dot, vec_norm}
    val dot = vec_dot _
    // norms once per vector (narrow pass), dot once per pair; vec_dot
    // is a native codegen Expression (double accumulation, exact
    // float→double widening — DuckDB-parity)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding").as("v"))
      .withColumn("norm", vec_norm(col("v")))
    e.as("x").join(e.as("y"),
        col("x.label") === col("y.label") && col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos_raw",
        dot(col("x.v"), col("y.v")) / (col("x.norm") * col("y.norm")))
      .filter(col("cos_raw") >= 0.3)
      .select(col("x.vec_id").as("vec_id_1"), col("y.vec_id").as("vec_id_2"),
        col("x.label").as("label"), round(col("cos_raw"), 4).as("cosine"))
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
