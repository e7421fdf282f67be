package graft.operators

import graft.{GQuery, Tables}
import graft.Ckpt.TruncOps
import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators (SURVEY.md §2.I): deterministic
  * sampling and splits, sequence packing, grouped statistics, TF-IDF,
  * and the composite clean-corpus pass. All narrow or single-shuffle
  * plans; sampling is hash-deterministic (reproducible across runs
  * and engines, unlike rand()).
  */
object Pipeline {

  /** Deterministic ~5% sample via a Knuth multiplicative hash of the
    * key — reproducible, engine-portable, and filterable at the scan.
    * The key is reduced mod a prime BEFORE the multiply so the Long
    * product can never overflow (Spark 4 ANSI mode throws on wrap;
    * DuckDB would silently promote to HUGEINT and diverge) — max
    * product 999982 * 2654435761 ≈ 2.7e15 << 2^63.
    */
  private def hashBucket(key: Column): Column =
    ((key % 999983L) * 2654435761L) % 100

  def hashSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(hashBucket(col("doc_id")) < 5)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")

  /** Chunk size / stride for `pipe_rag_chunks` (64-char overlap). */
  val RagChunkChars = 256L
  val RagStrideChars = 192L

  /** RAG chunking plan — the retrieval-indexing shape every RAG
    * pipeline runs (fixed-size windows with overlap so no answer
    * spans a boundary): chunks of 256 chars at stride 192 per doc,
    * reported as the per-source census an indexing budget is planned
    * from (chunks, chars in, chars indexed, overlap waste in HALF_UP
    * ppm). Chunk count AND total chunk chars have closed integer
    * forms ((k−1)·C + tail — every chunk but the last is full), so
    * the whole op is ONE scan + a sources-sized agg with no explode:
    * the 100 TB plan costs the same as a row count. The sibling
    * materializer (explode over the same start sequence) shares the
    * formulas; `mm_chunk`/`pipe_long_doc_split` cover that shape.
    */
  def ragChunks(spark: SparkSession, dir: String): DataFrame = {
    val (c, s) = (RagChunkChars, RagStrideChars)
    Tables.documents(spark, dir)
      .select(col("source"), col("n_chars"))
      .withColumn("n_chunks",
        when(col("n_chars") <= c, lit(1L))
          .otherwise(expr(s"(n_chars - $c + $s - 1) div $s + 1")))
      .withColumn("chunk_chars",
        when(col("n_chars") <= c, col("n_chars"))
          .otherwise((col("n_chunks") - 1) * c +
            (col("n_chars") - (col("n_chunks") - 1) * s)))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("n_chunks")).as("n_chunks"),
        sum(col("chunk_chars")).as("sum_chunk_chars"))
      // a source of all-empty docs has sum_chunk_chars = 0 (empty
      // docs still count one 0-char chunk): overlap is 0 by
      // definition, and the guard keeps ANSI Spark from throwing on
      // the 0 divisor (DuckDB would NULL differently)
      .withColumn("overlap_ppm",
        expr("""CASE WHEN sum_chunk_chars = 0 THEN 0
               ELSE (2*(sum_chunk_chars - sum_chars)*1000000
                     + sum_chunk_chars) div (2*sum_chunk_chars) END"""))
      .orderBy("source")
  }

  /** Folds for `pipe_kfold_assign`. */
  val KFolds = 5L

  /** Deterministic k-fold assignment with a per-source stratification
    * audit — the cross-validation primitive `pipe_train_test_split`'s
    * two-way split doesn't give: fold = Knuth multiplicative hash of
    * doc_id under a different multiplier than the percent bucket,
    * taken from the HIGH bits (div 2^20 before the mod — the low
    * bits of k·r mod small m are a deterministic function of
    * r mod m, so a low-bit fold would collapse onto the percent
    * bucket; the high bits genuinely mix, so fold and split can
    * stack), reported as
    * the (fold × source) census a practitioner reads to confirm every
    * fold sees every source in proportion. One scan, one keyed agg
    * onto K×sources keys; the hash is replayed verbatim in the
    * oracle. Reduced mod 999983 before the multiply so the product
    * stays < 2⁶³ under ANSI.
    */
  def kfoldAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("fold",
        expr(s"(((doc_id % 999983) * 2246822519) div 1048576) % $KFolds"))
      .groupBy("fold", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("fold", "source")

  /** Deterministic train/val/test split on the same hash. */
  def trainTestSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket", hashBucket(col("doc_id")))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy("split")

  /** Stratified sample: first ceil(20%) of each language by doc_id.
    * Window count-over-partition + row_number — one shuffle on the
    * stratum key.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val byLang = Window.partitionBy("lang")
    val ordered = Window.partitionBy("lang").orderBy("doc_id")
    Tables.documents(spark, dir)
      .withColumn("rn", row_number().over(ordered).cast("long"))
      .withColumn("quota", ceil(count(lit(1)).over(byLang) * 0.2).cast("long"))
      .filter(col("rn") <= col("quota"))
      .select("doc_id", "lang", "rn")
      .orderBy("doc_id")
  }

  val PackBudget = 512L

  val ShardDocs = 1000L

  /** Budgeted sequence packing (prefix-sum binning): docs in id order
    * are assigned to packs of ~PackBudget whitespace tokens by
    * exclusive-prefix-sum division — computed as TWO-LEVEL packing so
    * no task ever sees the whole corpus: (1) a partitioned running sum
    * within doc_id-range shards, (2) per-shard exclusive prefix
    * offsets from a tiny shard-totals aggregate (n_docs/ShardDocs
    * rows) via a broadcast theta-join prefix sum — no global window
    * even over the totals, so the plan emits zero single-partition
    * WindowExec stages. Because shards are doc_id ranges, offset +
    * local running sum == the global prefix sum exactly, so semantics
    * are identical to a single global window.
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), Text.wsTokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("shard", expr(s"doc_id div $ShardDocs"))
    val wLocal = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = toks.groupBy("shard").agg(sum(col("n_tokens")).as("shard_total"))
    val offsets = totals.as("a")
      .join(broadcast(totals.as("b")), col("b.shard") < col("a.shard"), "left")
      .groupBy(col("a.shard").as("shard"))
      .agg(coalesce(sum(col("b.shard_total")), lit(0L)).as("offset"))
    toks
      .withColumn("local_incl", sum(col("n_tokens")).over(wLocal))
      .join(broadcast(offsets), Seq("shard"))
      .withColumn("cum_incl", col("offset") + col("local_incl"))
      .withColumn("pack_id", expr(s"(cum_incl - n_tokens) div $PackBudget"))
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("pack_id")
  }

  /** Grouped statistics: sample stddev + Pearson correlation of order
    * totals vs customer balance per market segment.
    */
  def groupStats(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(stddev_samp(col("o_totalprice")), 2).as("price_stddev"),
        round(corr(col("o_totalprice"), col("c_acctbal")), 4).as("price_balance_corr"))
      .orderBy("c_mktsegment")

  val TfidfTopN = 3

  /** TF-IDF: top-N terms per document (tf = count/len, idf = ln(N/df),
    * deterministic tie-break on term).
    */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.select(count(lit(1)).as("n_total"))
    val terms = docs
      .select(col("doc_id"), explode(Text.tokens(lower(col("text")))).as("term"))
    // tf is the one corpus-keyed aggregate everything downstream reads
    // (doc lengths, document frequencies, the ranked join):
    // materialized once. doc_len derives from tf by per-doc sum — the
    // r15 shape re-tokenized the corpus a second time for the same
    // number (Σ term_count ≡ token count).
    val tf = graft.Ckpt.truncate(
      terms.groupBy("doc_id", "term").agg(count(lit(1)).as("term_count")))
    val docLen = tf.groupBy("doc_id").agg(sum(col("term_count")).as("doc_len"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    val w = Window.partitionBy("doc_id").orderBy(desc("tfidf_raw"), asc("term"))
    tf.join(docLen, Seq("doc_id"))
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf_raw",
        (col("term_count").cast("double") / col("doc_len")) *
          log(col("n_total").cast("double") / col("doc_freq")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TfidfTopN)
      .select(col("doc_id"), col("rank"), col("term"), round(col("tfidf_raw"), 6).as("tfidf"))
      .orderBy("doc_id", "rank")
  }

  /** Composite clean-corpus pass — the end-to-end shape of a training
    * data pipeline: exact-dedup (keep canonical), then quality gates.
    */
  def cleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    val toks = Text.tokens(lower(col("text")))
    val withHash = Tables.documents(spark, dir)
      .withColumn("md5_hash", md5(Text.normalized(col("text")).cast("binary")))
    val canonical = withHash
      .groupBy("md5_hash").agg(min(col("doc_id")).as("doc_id"))
    withHash.join(canonical, Seq("md5_hash", "doc_id"), "left_semi")
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("punct_ratio", Text.punctRatio(col("text")))
      .filter(col("n_tokens") >= 5 && col("n_tokens") <= 1000 &&
        col("punct_ratio") < 0.2)
      .select("doc_id", "lang", "n_tokens")
      .orderBy("doc_id")
  }

  val BenchmarkMaxId = 50L

  /** Benchmark decontamination — the training-pipeline pass that
    * removes eval-set leakage before training: report every training
    * doc sharing at least one trigram shingle with the held-out
    * benchmark (doc_id < BenchmarkMaxId stands in for the eval set),
    * with its distinct-overlap count. The benchmark's distinct
    * shingle-hash set is tiny relative to the corpus and is BROADCAST;
    * the training side streams through the hash equi-join into a
    * per-doc distinct count — corpus text is scanned once and never
    * shuffled, the shape a 100 TB decontamination needs. Shingles come
    * from the one-pass native `ShingleHashes` expression.
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.ShingleHashes.shingle_hashes(col("text"), 3)).as("sh"))
    val benchShingles = sh.filter(col("doc_id") < BenchmarkMaxId)
      .select("sh").distinct()
    sh.filter(col("doc_id") >= BenchmarkMaxId)
      .join(broadcast(benchShingles), Seq("sh"))
      .groupBy("doc_id")
      .agg(countDistinct(col("sh")).as("n_overlap"))
      .orderBy("doc_id")
  }

  val BloomBits = 1 << 18
  val BloomK = 5

  /** The same decontamination through a distributed BLOOM FILTER —
    * the shape that wins when the eval set is too large to broadcast
    * raw: its shingle set is folded into a constant-size bitmap
    * (2^18 bits = 32 KB here; size m to ~10·n_keys bits for ~1% FP at
    * any eval-set scale) by a map-side-combinable Aggregator, the
    * bitmap broadcasts as ONE row, and a codegen'd `might_contain`
    * pre-filter drops the overwhelming majority of training shingles
    * inside the scan's whole-stage pipeline — only Bloom-positive
    * candidates reach the exact verification join that removes false
    * positives. Output is therefore EXACTLY `pipe_decontaminate`'s
    * (Bloom has no false negatives), checked against the identical
    * DuckDB oracle — hash equality proves the probabilistic pre-filter
    * is semantically invisible.
    */
  def bloomDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Bloom
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.ShingleHashes.shingle_hashes(col("text"), 3)).as("sh"))
    val benchShingles = sh.filter(col("doc_id") < BenchmarkMaxId)
      .select("sh").distinct()
    val bloom = benchShingles.agg(
      Bloom.bloomAgg(BloomBits, BloomK)(col("sh")).as("bloom"))
    sh.filter(col("doc_id") >= BenchmarkMaxId)
      .crossJoin(broadcast(bloom))
      .filter(Bloom.mightContain(col("sh"), col("bloom"), BloomK))
      .select("doc_id", "sh")
      .join(broadcast(benchShingles), Seq("sh"))
      .groupBy("doc_id")
      .agg(countDistinct(col("sh")).as("n_overlap"))
      .orderBy("doc_id")
  }

  /** LSH bands (of MinhashErrK/NearDecontamBandRows rows each) and
    * the HALF_UP ×1e6 Jaccard admission threshold for the near-dup
    * decontamination pass.
    */
  val NearDecontamBandRows = 4
  val NearDecontamJx1e6 = 350000L

  /** NEAR-duplicate decontamination — the production reality the
    * exact-shingle forms miss: benchmarks leak into training sets
    * lightly edited (reformatted, re-tokenized, paraphrased at the
    * margins), so contamination screening needs MinHash-LSH against
    * the eval set, not just exact shingle overlap. For every training
    * doc (doc_id ≥ BenchmarkMaxId): LSH band candidates against the
    * benchmark side (doc_id < BenchmarkMaxId), exact shingle-Jaccard
    * verification of candidates only, and admission at J ≥ 0.35 —
    * reporting how many benchmark docs it near-matches and the worst
    * Jaccard. Unlike `dd_minhash_lsh` (xxhash64 signatures, hence its
    * planted-pair oracle), the signatures here are the REPLAYABLE
    * affine permutations of `dd_minhash_error` over rolling-hash
    * shingles — so DuckDB replays the ENTIRE pipeline (signatures,
    * banding, the probabilistic candidate set itself, verification)
    * cell-for-cell on the natural corpus: both engines miss exactly
    * the same below-threshold band collisions, and the hash certifies
    * the real recall behavior instead of a planted J=1 corner.
    * Scale shape: the benchmark side is eval-set-sized (tiny), so its
    * buckets broadcast; candidates are bounded by band collisions
    * against that small set; verification joins are keyed on doc ids
    * — never all-pairs over training docs.
    */
  def nearDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val P = Dedup.MinhashErrP
    val K = Dedup.MinhashErrK
    // rolling-hash shingle ids (replayable), materialized once for
    // the signature pass and both verification sides
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.NGrams.ngrams(col("text"), 3)).as("span"))
      .select(col("doc_id"), Text.rollingHash(col("span")).as("u"))
      .distinct()
      .truncated
    val sigCols = (0 until K).map { i =>
      min((col("u") * Dedup.minhashErrA(i) + Dedup.minhashErrB(i)) % P)
        .as(s"h$i")
    }
    val sigs = sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    val bands = (0 until K / NearDecontamBandRows).map { b =>
      val cols = (b * NearDecontamBandRows until (b + 1) * NearDecontamBandRows)
        .map(i => col(s"h$i"))
      struct(lit(b).as("band"), concat_ws("_", cols: _*).as("bucket"))
    }
    val buckets = sigs.select(col("doc_id"), explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
    val cand = buckets.filter(col("doc_id") >= BenchmarkMaxId).as("t")
      .join(broadcast(buckets.filter(col("doc_id") < BenchmarkMaxId).as("bz")),
        col("t.band") === col("bz.band") && col("t.bucket") === col("bz.bucket"))
      .select(col("t.doc_id").as("train_id"), col("bz.doc_id").as("bench_id"))
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // NO broadcast hint on the candidate side (VERDICT r10 #5): the
    // candidate set is bounded only by band collisions against the
    // eval suite — with a large eval set over a mirror-heavy corpus
    // it can outgrow a broadcast, and a forced hint would then OOM
    // the build side. Left unhinted, AQE broadcasts it while it is
    // small and falls back to a shuffled hash/sort-merge join the
    // moment it is not (PipelineOpsSpec pins that the plan survives a
    // sub-broadcast-threshold run with identical output).
    val inter = cand
      .join(sh.withColumnRenamed("doc_id", "train_id"), Seq("train_id"))
      .join(sh.withColumnsRenamed(Map("doc_id" -> "bench_id", "u" -> "u2")),
        Seq("bench_id"))
      .filter(col("u") === col("u2"))
      .groupBy("train_id", "bench_id").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "train_id", "sz" -> "sz_t")),
        Seq("train_id"))
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "bench_id", "sz" -> "sz_b")),
        Seq("bench_id"))
      .withColumn("uni", col("sz_t") + col("sz_b") - col("n_inter"))
      .withColumn("jaccard_x1e6", expr("(2*n_inter*1000000 + uni) div (2*uni)"))
      .filter(col("jaccard_x1e6") >= NearDecontamJx1e6)
      .groupBy("train_id")
      .agg(count(lit(1)).as("n_bench_matches"),
        max(col("jaccard_x1e6")).as("max_jaccard_x1e6"))
      .orderBy("train_id")
  }

  private def nearDecontaminateOracle: String = {
    val K = Dedup.MinhashErrK
    val P = Dedup.MinhashErrP
    val sigExprs = (0 until K).map(i =>
      s"min((u * ${Dedup.minhashErrA(i)} + ${Dedup.minhashErrB(i)}) % $P) AS h$i")
      .mkString(",\n    ")
    val bandSelects = (0 until K / NearDecontamBandRows).map { b =>
      val key = (b * NearDecontamBandRows until (b + 1) * NearDecontamBandRows)
        .map(i => s"h$i").mkString(" || '_' || ")
      s"SELECT doc_id, $b AS band, $key AS bucket FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
      |                x -> len(x) > 0) AS t
      |  FROM documents),
      |spans AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
      |      i -> array_to_string(t[i:i+2], ' '))) AS span
      |  FROM toks),
      |u AS (
      |  SELECT DISTINCT doc_id,
      |    CAST(list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        list_transform(range(1, length(span) + 1),
      |          i -> CAST(ascii(span[i]) AS BIGINT))),
      |      (acc, x) -> (acc * 131 + x) % $P) AS BIGINT) AS u
      |  FROM spans),
      |sig AS (
      |  SELECT doc_id,
      |    $sigExprs
      |  FROM u GROUP BY doc_id),
      |buckets AS (
      |  $bandSelects),
      |cand AS (
      |  SELECT DISTINCT t.doc_id AS train_id, bz.doc_id AS bench_id
      |  FROM buckets t JOIN buckets bz
      |    ON t.band = bz.band AND t.bucket = bz.bucket
      |  WHERE t.doc_id >= $BenchmarkMaxId AND bz.doc_id < $BenchmarkMaxId),
      |inter AS (
      |  SELECT c.train_id, c.bench_id, count(*) AS n_inter
      |  FROM cand c
      |  JOIN u a ON a.doc_id = c.train_id
      |  JOIN u b ON b.doc_id = c.bench_id AND b.u = a.u
      |  GROUP BY 1, 2),
      |sz AS (SELECT doc_id, count(*) AS s FROM u GROUP BY 1),
      |j AS (
      |  SELECT train_id, bench_id,
      |    (2*n_inter*1000000 + (st.s + sb.s - n_inter))
      |      // (2*(st.s + sb.s - n_inter)) AS jx
      |  FROM inter
      |  JOIN sz st ON st.doc_id = train_id
      |  JOIN sz sb ON sb.doc_id = bench_id)
      |SELECT train_id, count(*) AS n_bench_matches,
      |  CAST(max(jx) AS BIGINT) AS max_jaccard_x1e6
      |FROM j WHERE jx >= $NearDecontamJx1e6
      |GROUP BY train_id ORDER BY train_id""".stripMargin
  }

  /** Shared by the exact and Bloom-pre-filtered decontamination forms
    * — identical output contract, so one oracle proves both.
    */
  private def decontaminateOracle: String =
    s"""WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
      |                x -> len(x) > 0) AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    unnest(list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
      |  FROM toks WHERE len(t) >= 3),
      |b AS (SELECT DISTINCT s FROM sh WHERE doc_id < $BenchmarkMaxId),
      |tr AS (SELECT doc_id, s FROM sh WHERE doc_id >= $BenchmarkMaxId)
      |SELECT tr.doc_id, count(DISTINCT tr.s) AS n_overlap
      |FROM tr JOIN b USING (s)
      |GROUP BY tr.doc_id ORDER BY doc_id""".stripMargin

  val MixBudgetFrac = 0.9

  /** Domain-mixture sampling — the pretraining-mix pass: given target
    * weights per source domain, keep a deterministic hash-sample of
    * each source sized so kept volumes approach the target mixture
    * under a global budget (MixBudgetFrac of the corpus). Per-source
    * keep rates derive from one tiny aggregate (rows = #sources,
    * broadcast back); membership is the same engine-portable Knuth
    * hash as `pipe_hash_sample`, compared against a per-source integer
    * cutoff — so the corpus is scanned once, filtered at the scan by a
    * broadcast map, never shuffled. Rates above 1 clamp (a rare domain
    * can't be upsampled by filtering — that's a repeat-epochs decision
    * recorded in keep_frac = 1.0). Target weights here come from the
    * source's numeric suffix (suffix mod 4 + 1) — a stand-in for the
    * externally supplied mixture table a real pipeline would join.
    */
  def domainMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "source")
    // a digit-free source name must get the default weight, not a
    // silent null that drops the source from the mix (Spark) or a
    // cast error (DuckDB TRY_CAST mirrors the coalesce)
    val bySrc = docs.groupBy("source").agg(count(lit(1)).as("n_source"))
      .withColumn("w_raw",
        (coalesce(regexp_extract(col("source"), "(\\d+)", 1).cast("long"), lit(0L))
          % 4L + 1L).cast("double"))
    val tot = bySrc.agg(sum(col("n_source")).as("n_total"), sum(col("w_raw")).as("w_total"))
    val rates = bySrc.crossJoin(broadcast(tot))
      .withColumn("keep_frac",
        least(lit(1.0), col("w_raw") / col("w_total") * lit(MixBudgetFrac) *
          col("n_total").cast("double") / col("n_source").cast("double")))
      .withColumn("cut", floor(col("keep_frac") * 1000000.0).cast("long"))
    docs.join(broadcast(rates.select("source", "n_source", "keep_frac", "cut")), Seq("source"))
      .filter(((col("doc_id") % 999983L) * 2654435761L) % 1000000L < col("cut"))
      .groupBy(col("source"), col("n_source"), round(col("keep_frac"), 6).as("keep_frac"))
      .agg(count(lit(1)).as("n_kept"))
      .orderBy("source")
  }

  /** Number of export shards for the range-sharded corpus manifest. */
  val ExportShards = 8

  /** Range-sharded export manifest — the last step of a training-data
    * pipeline: pack the corpus into key-ordered shards and emit the
    * manifest (per shard: doc count, char budget, key range) that the
    * trainer's data loader consumes. Documents are keyed by
    * (n_chars, doc_id) packed into one long (doc_id loudly asserted
    * < 2²⁰, mirroring `Dedup.spanDedup`'s order key), and the key
    * space is split into `ExportShards` EQUAL-WIDTH ranges computed
    * from the exact global min/max — fixed-width bounds are exact
    * integer arithmetic on both engines, where sampled (Spark
    * RangePartitioner) or interpolated-quantile bounds would be
    * nondeterministic or float-fragile under the oracle's hash
    * compare. A production export at 100 TB swaps the bound rule for
    * the sampled range partitioner and follows with
    * `repartitionByRange(shard_id).sortWithinPartitions(k).write`;
    * the manifest aggregation below is unchanged.
    *
    * Plan shape: one scalar min/max aggregate broadcast back over the
    * scan (no second pass materialization), then a single groupBy on
    * shard_id — two narrow scans + one tiny shuffle regardless of
    * corpus size.
    */
  def shardManifest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .filter(assert_true(col("doc_id") < 1048576L,
        lit("shardManifest: doc_id >= 2^20 breaks the packed shard key")).isNull)
      .select(col("doc_id"), col("n_chars"),
        (col("n_chars") * lit(1048576L) + col("doc_id")).as("k"))
    val ext = docs.agg(min(col("k")).as("mn"), max(col("k")).as("mx"))
    docs.crossJoin(broadcast(ext))
      .withColumn("shard_id",
        expr(s"((k - mn) * $ExportShards) div (mx - mn + 1)"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars_total"),
        min(col("k")).as("min_key"), max(col("k")).as("max_key"))
      .orderBy("shard_id")
  }

  /** Columns profiled by `pipe_schema_profile` (the orders table). */
  val ProfileCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  /** Per-column data profiling — the ingest-time QA pass: row count,
    * null count and exact distinct count for every column in one
    * unpivoted stream. Values are compared only within each engine
    * (distinct counting over each engine's own injective string
    * cast), so heterogeneous column types never touch cross-engine
    * formatting. The unpivot multiplies rows by n_cols before a
    * low-cardinality aggregate — the standard profiling trade; at
    * cluster scale you'd swap countDistinct for the HLL sketch
    * (`rel_approx_distinct` is that path).
    */
  def schemaProfile(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(ProfileCols.map(c => col(c).cast("string").as(c)): _*)
    o.selectExpr(
        s"stack(${ProfileCols.length}, " +
          ProfileCols.map(c => s"'$c', $c").mkString(", ") + ") AS (col_name, val)")
      .groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("val"))).as("n_nulls"),
        countDistinct(col("val")).as("n_distinct"))
      .orderBy("col_name")
  }

  private def schemaProfileOracle: String = {
    val branches = ProfileCols.map(c =>
      s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS val FROM orders")
      .mkString("\n  UNION ALL ")
    s"""WITH s AS (
  $branches)
SELECT col_name, count(*) AS n_rows,
  count(*) - count(val) AS n_nulls,
  count(DISTINCT val) AS n_distinct
FROM s GROUP BY col_name ORDER BY col_name"""
  }

  val WeightedK = 50

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    * each doc draws a deterministic pseudo-uniform u ∈ (0, 1] from the
    * same overflow-safe multiplicative hash as `hashSample`, and the
    * k docs with the largest u^(1/w) — equivalently ln(u)/w — win.
    * Heavier docs (w = n_chars) thus win proportionally more often,
    * the standard quality-/length-weighted selection a curriculum
    * pipeline uses. Deterministic (no rand()), engine-portable, and
    * the top-k runs as TakeOrdered — no global sort, no shuffle of
    * the corpus. Both engines evaluate the identical ln expression on
    * identical integers, so ranking by the raw key is stable.
    * Residual risk (accepted): Math.log vs DuckDB's std::log are each
    * only 1-ulp-accurate, so a divergence at a 5e-10 round boundary
    * could in principle flip a key; if this ever flakes, derive the
    * key as a scaled integer over the 1e6 possible u values (§4).
    */
  def weightedSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("u",
        (((col("doc_id") % 999983L) * 2654435761L) % 1000000L + 1L) / 1000000.0)
      .withColumn("es_key", round(log(col("u")) / col("n_chars"), 9))
      .select("doc_id", "source", "n_chars", "es_key")
      .orderBy(desc("es_key"), asc("doc_id"))
      .limit(WeightedK)

  /** Vocabulary cap: tokens ranked past the cap map to the single OOV
    * id (= the cap) — real tokenizers ship a fixed-size vocab, not one
    * that grows with the corpus.
    */
  val VocabCap = 24L

  /** Distributed frequency rank of a (w, cnt) vocabulary — the
    * `rel_distributed_rank` bucket-offset decomposition applied to a
    * zipf-shaped relation, replacing the former GLOBAL unpartitioned
    * window (a one-task scale cliff: a 100 TB corpus has hundreds of
    * millions of distinct tokens). Bucket key = (band, sub):
    *   - band is a cnt-MONOTONE integer, so bands strictly order by
    *     frequency: exact bands for the zipf tail (cnt ≤ 16 — where
    *     most of the vocabulary lives and rank order within a band is
    *     purely lexicographic), log₂ bands for the head (few tokens).
    *     log₂ is computed integer-exactly as length(bin(cnt)) — no FP
    *     log that could flip at a power-of-two boundary between
    *     engines;
    *   - sub splits the huge single-cnt tail bands by first character
    *     (UTF-8 byte order == code-point order, so prefix order is
    *     consistent with full-string order); deepen the prefix to 2-3
    *     chars if a tail band still overflows a task.
    * Per-(band, sub) counts turn into offsets by a broadcast theta-join
    * prefix sum over that TINY aggregate (≤ ~80 bands × first-char
    * alphabet — conf-bounded): offset(bucket) = Σ bcnt of strictly
    * earlier buckets. No unpartitioned window ANYWHERE — not even over
    * the totals; final rank = offset + per-bucket row_number, so no
    * window sees more than one bucket of the vocabulary.
    */
  def rankVocab(vocab: DataFrame): DataFrame = {
    val b = vocab
      .withColumn("band",
        when(col("cnt") <= 16, col("cnt"))
          .otherwise(lit(15L) + length(bin(col("cnt")))).cast("long"))
      .withColumn("sub",
        when(col("cnt") <= 16, substring(col("w"), 1, 1)).otherwise(lit("")))
    val counts = b.groupBy("band", "sub").agg(count(lit(1)).as("bcnt"))
    val offsets = counts.as("a")
      .join(broadcast(counts.as("b")),
        col("b.band") > col("a.band") ||
          (col("b.band") === col("a.band") && col("b.sub") < col("a.sub")),
        "left")
      .groupBy(col("a.band").as("band"), col("a.sub").as("sub"))
      .agg(coalesce(sum(col("b.bcnt")), lit(0L)).as("offset"))
    val inBucket = Window.partitionBy("band", "sub")
      .orderBy(desc("cnt"), asc("w"))
    b.join(broadcast(offsets), Seq("band", "sub"))
      .withColumn("rank", col("offset") + row_number().over(inBucket))
      .select(col("w"), col("cnt"), col("rank"))
  }

  val ShuffleShards = 16L
  val ShuffleBuckets = 64L
  val HashMod = 1000000L

  /** Deterministic global shuffle — the reproducible pseudorandom
    * training order (position + round-robin shard) every run needs
    * WITHOUT a seed file: sort key = the repo's overflow-safe
    * multiplicative hash of doc_id, so the permutation is stable
    * across engines and runs. The global rank over (skey, doc_id)
    * uses the bucket-offset decomposition a third time — and here the
    * bucketing is trivial: the hash key is uniform by construction,
    * so fixed equal-width ranges of skey ARE balanced buckets (no
    * sampling pass, unlike terasort's arbitrary keys). Bucket counts
    * are ShuffleBuckets rows; offsets via the broadcast theta-join
    * prefix sum; per-bucket row_number. No global window, no task
    * sees more than n/ShuffleBuckets rows.
    */
  def globalShuffle(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"),
        (((col("doc_id") % 999983L) * 2654435761L) % HashMod).as("skey"))
      .withColumn("bucket", floor(col("skey") / (HashMod / ShuffleBuckets)))
    val counts = d.groupBy("bucket").agg(count(lit(1)).as("bcnt"))
    val offsets = counts.as("a")
      .join(broadcast(counts.as("b")), col("b.bucket") < col("a.bucket"), "left")
      .groupBy(col("a.bucket").as("bucket"))
      .agg(coalesce(sum(col("b.bcnt")), lit(0L)).as("offset"))
    val inBucket = Window.partitionBy("bucket").orderBy("skey", "doc_id")
    d.join(broadcast(offsets), Seq("bucket"))
      .withColumn("pos", col("offset") + row_number().over(inBucket))
      .select(col("doc_id"), col("pos"),
        ((col("pos") - 1) % ShuffleShards).as("shard"))
      .orderBy("doc_id")
  }

  /** Token→id encoding — the vocabulary step every training pipeline
    * runs before packing: build a frequency-ranked vocabulary (dense
    * ids, most frequent = 0, ranks past `VocabCap` collapse to the OOV
    * id) and rewrite each document as its id sequence. The ranking is
    * the two-level `rankVocab` decomposition — no corpus-scaled window
    * anywhere. The rewrite join is a plain vocab equi-join — NOT
    * broadcast by hint, since a real vocabulary scales with the corpus
    * (AQE may still broadcast a small one); per-doc sequences
    * reassemble with the bounded per-doc collect + sort, emitted as a
    * space-joined string so the oracle hash is format-stable.
    */
  def tokenizeToIds(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(Text.tokens(lower(col("text")))).as(Seq("pos", "w")))
    val vocab = rankVocab(toks.groupBy("w").agg(count(lit(1)).as("cnt")))
      .withColumn("id",
        when(col("rank") <= VocabCap, col("rank") - 1)
          .otherwise(lit(VocabCap)).cast("long"))
      .select("w", "id")
    toks.join(vocab, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("id")))),
            x => x.getField("id").cast("string")), " ").as("ids"))
      .orderBy("doc_id")
  }

  /** Tokenizer-invertibility certification — the check a pipeline
    * owner runs before deleting raw text in favor of id shards: decode
    * the `pipe_tokenize_to_ids` artifact (the ids STRING a training
    * job actually reads, re-parsed, not the pre-serialization rows)
    * back through the sub-cap vocabulary and compare against the
    * normalized original. Sub-cap ids are rank-bijective so every
    * OOV-free document must reconstruct EXACTLY; documents carrying
    * the collapsed OOV id are counted but unreconstructable by
    * construction. The oracle states the invertibility theorem in
    * closed form (n_roundtrip_exact == n_invocab, from the vocabulary
    * ranking alone, never running the decode) — the Spark side has to
    * EARN that equality through the real encode→serialize→parse→
    * decode→reassemble path, so any drift in ranking, ordering,
    * serialization, or reassembly breaks the hash. Shape: the
    * tokenize plan plus one vocab equi-join and a bounded per-doc
    * collect — nothing new scales past the encode itself.
    * Since round 11 the certification ALSO rides the subword path
    * (column n_bpe_exact): the BPE encode→decode roundtrip against
    * the learned `Bpe.trainMerges` table, see the inline block below.
    */
  def detokenizeRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val norm = docs.select(col("doc_id"), col("source"),
      array_join(Text.tokens(lower(col("text"))), " ").as("norm"))
    // NOTE (measured): truncating the token stream or the vocab here
    // does not pay — the narrow codegen explode recomputes cheaper
    // than a materialization writes, unlike the shingle/signature
    // pipelines where each branch repeats a corpus-scaled agg.
    val toks = docs.select(col("doc_id"),
      posexplode(Text.tokens(lower(col("text")))).as(Seq("pos", "w")))
    val vocab = rankVocab(toks.groupBy("w").agg(count(lit(1)).as("cnt")))
      .withColumn("id",
        when(col("rank") <= VocabCap, col("rank") - 1)
          .otherwise(lit(VocabCap)).cast("long"))
      .select("w", "id")
    val enc = toks.join(vocab, Seq("w"))
      .groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("id")))),
          x => x.getField("id").cast("string")), " ").as("ids"))
    val inverse = vocab.filter(col("id") < VocabCap)
      .select(col("id"), col("w").as("w2"))
    val dec = enc
      .select(col("doc_id"), posexplode(split(col("ids"), " ")).as(Seq("pos", "sid")))
      .select(col("doc_id"), col("pos"), col("sid").cast("long").as("id"))
      .join(inverse, Seq("id"), "left")
      .groupBy("doc_id")
      .agg(max(when(col("w2").isNull, 1).otherwise(0)).as("has_oov"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("w2")))),
            x => x.getField("w2")), " ").as("rebuilt"))
    // SUBWORD ride (VERDICT r10 #1): the same certification through
    // the BPE path — encode each doc against the learned merge table
    // with the −1 word-boundary marker between words, SERIALIZE the
    // id string (the artifact a training job reads), re-parse it,
    // decode through the inverse symbol table, and compare against
    // the normalized original. BPE invertibility is a theorem (merges
    // are concatenations; the marker preserves boundaries; the min-id
    // dedup keeps id→symbol bijective), so the oracle states
    // n_bpe_exact = n_docs in closed form — the Spark side has to
    // EARN the equality through the real
    // encode→serialize→parse→decode→reassemble path, where any drift
    // in merge order, symbol ids, or reassembly breaks the hash.
    val encBpe = toks.join(Bpe.wordIds(spark, dir), Seq("w"))
      .groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("wids")))),
          x => x.getField("wids")), " -1 ").as("ids_sep"))
    val decBpe = encBpe
      .select(col("doc_id"),
        posexplode(split(col("ids_sep"), " ")).as(Seq("p", "sid")))
      .select(col("doc_id"), col("p"), col("sid").cast("long").as("id"))
      .join(Bpe.symbolOf(spark, dir), Seq("id"), "left")
      .groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("p"),
          when(col("id") === -1L, lit(" ")).otherwise(col("sym")).as("part")))),
          x => x.getField("part")), "").as("rebuilt_bpe"))
    norm.join(dec, Seq("doc_id")).join(decBpe, Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("has_oov") === 0, 1)).as("n_invocab"),
        count(when(col("has_oov") === 0 && col("rebuilt") === col("norm"), 1))
          .as("n_roundtrip_exact"),
        count(when(col("rebuilt_bpe") === col("norm"), 1)).as("n_bpe_exact"))
      .orderBy("source")
  }

  /** Per-source dataset card — the summary block a corpus release
    * ships (docs, volume, language mix, exact-dup level, dominant
    * language): one pass of keyed aggregates over the bounded source
    * domain plus a tiny per-(source, lang) argmax. The distinct
    * counts (languages, unique text hashes) are exact two-phase
    * aggregates here; `rel_approx_distinct`'s HLL is the declared
    * swap once distinct text hashes per source stop fitting the
    * exchange. Dominant-language ties break to the lexicographically
    * LARGEST lang on both engines (max_by struct vs ORDER BY cnt
    * DESC, lang DESC).
    */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val base = d.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("total_chars"),
      // conf-switched to HLL via graft.distinct.approx (the declared
      // at-scale swap, now a code path — functions.Approx)
      graft.functions.Approx.distinctCountOf(spark, col("lang")).as("n_langs"),
      graft.functions.Approx.distinctCountOf(spark,
        md5(col("text").cast("binary"))).as("n_uniq_texts"))
    val top = d.groupBy("source", "lang").agg(count(lit(1)).as("cnt"))
      .groupBy("source")
      .agg(max_by(struct(col("lang"), col("cnt")),
        struct(col("cnt"), col("lang"))).as("t"))
      .select(col("source"), col("t.lang").as("top_lang"),
        col("t.cnt").as("top_lang_docs"))
    base.join(top, Seq("source")).orderBy("source")
  }

  val FunnelMinChars = 100L
  val FunnelMaxChars = 500L
  val FunnelMinTokens = 30

  /** Sequential quality-filter funnel with per-stage survival counts —
    * the reporting artifact every corpus-curation pipeline ships
    * (RefinedWeb/FineWeb-style "documents remaining after each rule").
    * A doc reaches stage k's gate only by passing stages 1..k−1, so
    * n_in(k) = n_kept(k−1) and the funnel is monotone. All four
    * signals compute in ONE scan projection (codegen'd; the ratio
    * cuts are integer CROSS-MULTIPLICATIONS — stopword_hits·50 ≥
    * n_tokens, uniq·2 ≥ n_tokens — so no FP threshold can sit on an
    * engine-dependent boundary) and reduce through a single algebraic
    * aggregate: at 100 TB the corpus is never shuffled at all, only
    * five counters per partition reach the driver-side merge. The
    * 4-row unpivot happens on the one-row aggregate.
    */
  def filterFunnel(spark: SparkSession, dir: String): DataFrame = {
    val toks = Text.tokens(lower(col("text")))
    val flagged = Tables.documents(spark, dir).select(
      (col("n_chars") >= FunnelMinChars && col("n_chars") <= FunnelMaxChars)
        .as("f1"),
      (size(toks) >= FunnelMinTokens).as("f2"),
      (size(filter(toks, t => t.isin(TextAnalysis.Stopwords: _*))) * 50 >=
        size(toks)).as("f3"),
      (size(array_distinct(toks)) * 2 >= size(toks)).as("f4"))
    def kept(fs: Column*): Column =
      sum(when(fs.reduce(_ && _), 1L).otherwise(0L))
    val a = flagged.agg(
      count(lit(1)).as("n0"),
      kept(col("f1")).as("k1"),
      kept(col("f1"), col("f2")).as("k2"),
      kept(col("f1"), col("f2"), col("f3")).as("k3"),
      kept(col("f1"), col("f2"), col("f3"), col("f4")).as("k4"))
    def stage(no: Int, name: String, in: String, keptCol: String): Column =
      struct(lit(no.toLong).as("stage_no"), lit(name).as("stage"),
        col(in).as("n_in"), col(keptCol).as("n_kept"))
    a.select(explode(array(
        stage(1, "length", "n0", "k1"),
        stage(2, "min_tokens", "k1", "k2"),
        stage(3, "stopword_ratio", "k2", "k3"),
        stage(4, "uniq_ratio", "k3", "k4"))).as("s"))
      .select(col("s.stage_no").as("stage_no"), col("s.stage").as("stage"),
        col("s.n_in").as("n_in"), col("s.n_kept").as("n_kept"))
      .withColumn("n_dropped", col("n_in") - col("n_kept"))
      .orderBy("stage_no")
  }

  /** Pad-to-multiple block size for `pipe_padding_census` (tokens) —
    * the granularity inference servers pad batched sequences to.
    */
  val PadBlock = 16L

  /** Batch size for the padding census (sequences per batch). */
  val PadBatch = 32L

  /** Inference length-bucketing efficiency census — the batching
    * planner's input: bucket docs by whitespace-token length padded
    * up to the next PadBlock multiple, and report per-bucket doc /
    * batch counts plus the padding waste that bucket pays (padded
    * minus real tokens, HALF_UP ppm). One codegen'd scan projection +
    * one keyed agg on the bounded band domain — the corpus is never
    * shuffled by anything data-sized. All integers end to end: the
    * band formula uses greatest(n, 1) so `div` truncation and DuckDB
    * floor-`//` agree (operands stay non-negative), and waste ships
    * via the §4 ppm identity, no FP anywhere.
    */
  def paddingCensus(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(Text.wsTokenCount(col("text")).cast("long").as("n"))
      .select(col("n"),
        expr(s"((greatest(n, 1) - 1) div $PadBlock + 1) * $PadBlock")
          .as("band_tokens"))
      .groupBy("band_tokens")
      .agg(count(lit(1)).as("n_docs"),
        expr(s"(count(1) + $PadBatch - 1) div $PadBatch").as("n_batches"),
        sum(col("n")).as("real_tokens"))
      .withColumn("padded_tokens", col("n_docs") * col("band_tokens"))
      .withColumn("waste_ppm",
        expr("(2*(padded_tokens - real_tokens)*1000000 + padded_tokens)" +
          " div (2*padded_tokens)"))
      .orderBy("band_tokens")

  /** Band width (in score_x4 units) for `pipe_quality_score`. */
  val QsBand = 100000L
  /** Offset keeping the banding operand non-negative (min score is
    * −10⁶ when punct saturates and the other signals are zero), so
    * Spark `div` truncation equals DuckDB floor-`//`.
    */
  val QsOffset = 1000000L

  /** Fixed-weight linear quality scorer + score-band census — the
    * deterministic stand-in for classifier-based filtering (the
    * fasttext-quality-model pass of a curation pipeline): per doc,
    * score_x4 = 2·stop_ppm + 3·uniq_ppm − punct_ppm over HALF_UP ppm
    * ratio integers (each ratio exact via the §4 identity, zero
    * guards on empty docs), then a census of 100k-wide score bands.
    * Integer end to end; the subtraction happens AFTER the exact
    * divisions so no negative operand ever reaches `div`, and the
    * band shift keeps the one remaining division non-negative. One
    * scan projection + one keyed agg on the bounded band domain —
    * swap the weights for a learned model's and the plan is the
    * production filter.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = Text.tokens(lower(col("text")))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("chars"),
        size(toks).cast("long").as("tok"),
        size(filter(toks, t => t.isin(TextAnalysis.Stopwords: _*)))
          .cast("long").as("stop"),
        size(array_distinct(toks)).cast("long").as("uniq"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "\\p{Punct}", "")))
          .cast("long").as("punct"))
      .select(
        expr("(2*stop*1000000 + greatest(tok,1)) div (2*greatest(tok,1))")
          .as("stop_ppm"),
        expr("(2*uniq*1000000 + greatest(tok,1)) div (2*greatest(tok,1))")
          .as("uniq_ppm"),
        expr("(2*punct*1000000 + greatest(chars,1)) div (2*greatest(chars,1))")
          .as("punct_ppm"))
      .select((lit(2L) * col("stop_ppm") + lit(3L) * col("uniq_ppm") -
        col("punct_ppm")).as("score_x4"))
      .select(col("score_x4"),
        expr(s"(score_x4 + $QsOffset) div $QsBand").as("band"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_docs"),
        min(col("score_x4")).as("min_score"),
        max(col("score_x4")).as("max_score"))
      .orderBy("band")
  }

  /** Per-source exact-duplicate rate — the curation dashboard's
    * first column: docs, distinct normalized-md5 contents, and the
    * duplicate fraction as a HALF_UP ppm integer. Two keyed aggs on
    * (source, hash) then source; the at-scale swap for the exact
    * distinct is HLL, same shape.
    */
  def dupRateBySource(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        md5(Text.normalized(col("text")).cast("binary")).as("h"))
      .groupBy("source")
      // single-level distinct agg: Spark plans it as the same
      // two-phase (source, h) partial dedup the explicit two-level
      // groupBy spelled out, and the conf can now swap the distinct
      // for HLL (graft.distinct.approx — functions.Approx)
      .agg(count(lit(1)).as("n_docs"),
        graft.functions.Approx.distinctCountOf(spark, col("h"))
          .as("n_unique"))
      .select(col("source"), col("n_docs"), col("n_unique"),
        expr("(2*(n_docs - n_unique)*1000000 + n_docs) div (2*n_docs)")
          .as("dup_ppm"))
      .orderBy("source")

  /** Training-mix epoch planner: given per-source token totals, the
    * domain-mix weights (`domainMix`'s digit rule), and a global
    * token budget of half the corpus, compute each source's token
    * target and the number of epochs (×1000) needed to serve it —
    * epochs > 1.0 flags the up-sampled (repeated) domains, the number
    * every data-mixture paper reports. Pure integer arithmetic end to
    * end (HALF_UP §4 rule), so the oracle is bit-exact. One scan +
    * a |sources|-row agg + a broadcast of the 1-row totals: the same
    * cost shape at 100 TB.
    */
  def epochSchedule(spark: SparkSession, dir: String): DataFrame = {
    val bySrc = Tables.documents(spark, dir)
      .select(col("source"), Text.wsTokenCount(col("text")).cast("long").as("tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"))
      .withColumn("w",
        coalesce(regexp_extract(col("source"), "(\\d+)", 1).cast("long"), lit(0L))
          % 4L + 1L)
    val tot = bySrc.agg(sum("n_tokens").as("tok_total"), sum("w").as("w_total"))
    bySrc.crossJoin(broadcast(tot))
      .withColumn("budget", expr("tok_total div 2"))
      .withColumn("target_tokens",
        expr("(2*budget*w + w_total) div (2*w_total)"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("w"),
        col("target_tokens"),
        expr("(2*1000*target_tokens + greatest(n_tokens,1)) div (2*greatest(n_tokens,1))")
          .as("epochs_x1000"))
      .orderBy("source")
  }

  /** Temperature-scaled mixture weights (τ = 1/2): sampling rate
    * ∝ n_tokens^τ — the standard multilingual-corpus flattening that
    * up-weights small domains relative to proportional sampling.
    * τ = 1/2 keeps the whole computation deterministic: sqrt is an
    * exactly-rounded IEEE op in BOTH engines (no libm pow in the
    * loop), the weight is then quantized to an e6 integer via
    * ⌊x·10⁶+0.5⌋, and every downstream ratio is the pure-integer
    * HALF_UP rule. The flat (τ=1) ppm rides alongside so the
    * flattening is readable per source. One scan + source-count agg +
    * broadcast 1-row totals.
    */
  def mixtureTemperature(spark: SparkSession, dir: String): DataFrame = {
    val bySrc = Tables.documents(spark, dir)
      .select(col("source"), Text.wsTokenCount(col("text")).cast("long").as("tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"))
      .withColumn("w_e6",
        expr("CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"))
    val tot = bySrc.agg(sum("n_tokens").as("tok_total"), sum("w_e6").as("w_total"))
    bySrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("w_e6"),
        expr("(2*1000000*w_e6 + w_total) div (2*w_total)").as("temp_ppm"),
        expr("(2*1000000*n_tokens + tok_total) div (2*tok_total)").as("flat_ppm"))
      .orderBy("source")
  }

  val SplitWin = 64
  val SplitStride = 48

  /** Token-aligned long-document splitting with overlap — the
    * context-window prep step between cleaning and packing: each doc
    * becomes ⌈(n−W+S−1)/S⌉+1 windows of SplitWin tokens advancing by
    * SplitStride (16-token overlap carries context across chunk
    * boundaries; `mm_chunk` is the byte-aligned cousin, this is the
    * token-aligned one a tokenizer-bound pipeline needs). Geometry is
    * the `mm_audio_windows` integer formula; each chunk publishes its
    * token span and an md5 of the space-joined slice, so a downstream
    * exact-dedup can run on chunks. Per-doc linear, codegen'd
    * sequence+explode+slice, no shuffle before the verification sort.
    */
  def longDocSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), Text.tokens(lower(col("text"))).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0L),
          expr(s"greatest(n - $SplitWin + $SplitStride - 1, 0L) div $SplitStride")))
          .as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * SplitStride).as("start_tok"),
        expr(s"slice(toks, CAST(chunk_idx * $SplitStride + 1 AS INT), $SplitWin)")
          .as("chunk"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("chunk")).cast("long").as("n_tok"),
        md5(concat_ws(" ", col("chunk")).cast("binary")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")

  /** Per-source token-budget selection — the "fill the mixture
    * bucket" step of corpus assembly: within each source, take
    * documents in a deterministic curriculum order (longest first,
    * doc_id tie-break — both pure integers) until HALF the source's
    * tokens are consumed; report the selection census. The running
    * total is a per-SOURCE window (keyed shuffle, per-partition sort
    * bounded by that source's docs — the `ev_sessionize` shape, with
    * the salting-by-range escape documented for a mega-source), and
    * the half-budget comes from a broadcast per-source 1-row total.
    * A doc is kept while the PRIOR cumulative stays under budget, so
    * exactly the document that crosses the line is the last one in —
    * the greedy prefix rule, deterministic on both engines.
    */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars").as("n_chars_ord"),
        Text.wsTokenCount(col("text")).cast("long").as("tok"))
    val bySrc = Window.partitionBy("source")
      .orderBy(desc("n_chars_ord"), asc("doc_id"))
    val totals = docs.groupBy("source")
      .agg(sum(col("tok")).as("tot_tok"), count(lit(1)).as("n_docs"))
    docs
      .withColumn("cum_before",
        coalesce(sum(col("tok")).over(
          bySrc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(broadcast(totals), Seq("source"))
      .withColumn("kept", (lit(2) * col("cum_before") < col("tot_tok")).cast("int"))
      .groupBy("source")
      .agg(max(col("n_docs")).as("n_docs"),
        sum(col("kept")).as("n_selected"),
        max(col("tot_tok")).as("tokens_total"),
        sum(col("kept") * col("tok")).as("tokens_selected"))
      .orderBy("source")
  }

  /** Per-language document cap for `pipe_lang_cap`. */
  val LangCap = 100L

  /** Hash-band width for the cap's two-level rank (999983/CapBandDiv
    * ≈ 10⁴ bands — the boundary band holds ~corpus/10⁴ rows; widen
    * the divisor at larger corpora, it's a conf knob).
    */
  val CapBandDiv = 100L

  /** Per-language quota cap — the rebalancing step that stops a
    * dominant language from flooding the mixture: keep the first
    * `LangCap` docs per language in deterministic hash order (the
    * repo's overflow-safe multiplicative hash, doc_id tie-break).
    * A per-LANGUAGE row_number would funnel corpus/|langs| rows into
    * one task (the tiny-domain window cliff PlanSpec rejects), so the
    * rank is two-level: hash-band counts → prefix sums over the
    * CONF-BOUNDED (lang, band) grid — that aggregate's window is over
    * ≈10⁴ rows per language by construction — then row_number ONLY
    * inside bands whose offset is still under the cap (≈ cap + one
    * band of rows per language ever reach a window sort; every later
    * band is dropped by the broadcast offset filter before any sort).
    * The census output reports kept/total docs and chars per lang.
    */
  def langCap(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("h", ((col("doc_id") % 999983L) * 2654435761L) % 999983L)
      .withColumn("band", expr(s"h div $CapBandDiv"))
    val counts = d.groupBy("lang", "band").agg(count(lit(1)).as("bcnt"))
    val offsets = counts
      .withColumn("offset",
        coalesce(sum(col("bcnt")).over(
          Window.partitionBy("lang").orderBy("band")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("lang", "band", "offset")
    val inBand = Window.partitionBy("lang", "band").orderBy("h", "doc_id")
    val kept = d
      .join(broadcast(offsets.filter(col("offset") < LangCap)), Seq("lang", "band"))
      .withColumn("rn", row_number().over(inBand))
      .filter(col("offset") + col("rn") <= LangCap)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("chars_kept"))
    d.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_total"))
      .join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("chars_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("chars_kept"), lit(0L)).as("chars_kept"))
      .orderBy("lang")
  }

  /** Dedup impact census — the budget question a curation run answers
    * BEFORE paying for a full dedup pass: per source, how many
    * documents and how much token mass near-dedup would remove.
    * Removal set = every non-canonical member (id ≠ component min) of
    * the connected components over the exact within-source
    * shingle-Jaccard ≥ 0.35 pairs — the same pair semantics as
    * `dd_ngram_jaccard` and the same O(log n) star-contraction as
    * `dd_cluster`, composed with a token-mass rollup. Token counts
    * ride one codegen'd scan; the only corpus-scaled exchanges are
    * the shingle block join and the contraction rounds. Division
    * zero-guarded (ADVICE r8: empty sources must not throw under
    * ANSI).
    */
  def dedupImpact(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(Text.tokens(lower(col("text")))).cast("long").as("n_tok"))
    // the memoized verified pair index — one pair computation per
    // corpus shared with dd_ngram_jaccard / pipe_split_leakage
    val pairs = Dedup.nearDupPairsOf(spark, dir)
      .select(col("doc_id_1"), col("doc_id_2"))
    val removed = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("lbl"))
      .select(col("id").as("doc_id"), lit(1L).as("rm"))
    docs.join(removed, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        count(when(col("rm") === 1L, 1)).as("docs_removed"),
        sum(when(col("rm") === 1L, col("n_tok")).otherwise(lit(0L)))
          .as("tokens_removed"))
      .select(col("source"), col("n_docs"), col("docs_removed"),
        col("n_tokens"), col("tokens_removed"),
        when(col("n_tokens") === 0L, lit(0L))
          .otherwise(expr(
            "(2*tokens_removed*1000000 + n_tokens) div (2*n_tokens)"))
          .as("tokens_removed_ppm"))
      .orderBy("source")
  }

  /** Split-leakage census — the contamination exact decontamination
    * misses: NEAR-duplicate pairs (same Jaccard ≥ 0.35 semantics as
    * `dd_ngram_jaccard`) whose two members land in DIFFERENT
    * `pipe_train_test_split` buckets, so a paraphrase/near-copy of a
    * training document sits in val/test and inflates eval. Per
    * source: near-dup pairs, boundary-crossing pairs, crossing ppm
    * (zero-guarded). The split assignment is the same multiplicative
    * hash replayed in the oracle; pairs come from the shared
    * materialized shingle pass, and the census is a pair-domain
    * rollup — nothing here scales beyond the pair set itself.
    */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val splits = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        when(hashBucket(col("doc_id")) < 80, "train")
          .when(hashBucket(col("doc_id")) < 90, "val")
          .otherwise("test").as("split"))
    val pairs = Dedup.nearDupPairsOf(spark, dir)
      .select(col("doc_id_1"), col("doc_id_2"))
    pairs
      .join(splits.select(col("doc_id").as("doc_id_1"),
        col("source"), col("split").as("split_1")), Seq("doc_id_1"))
      .join(splits.select(col("doc_id").as("doc_id_2"),
        col("split").as("split_2")), Seq("doc_id_2"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_pairs"),
        count(when(col("split_1") =!= col("split_2"), 1)).as("n_cross_pairs"))
      .select(col("source"), col("n_pairs"), col("n_cross_pairs"),
        when(col("n_pairs") === 0L, lit(0L))
          .otherwise(expr("(2*n_cross_pairs*1000000 + n_pairs) div (2*n_pairs)"))
          .as("cross_ppm"))
      .orderBy("source")
  }

  /** Tokenizer-fertility census — the multilingual tokenizer-
    * efficiency readout (how many subword tokens a word costs, and
    * how many chars a token carries) a pipeline meters per language
    * before committing a token budget: fertility = BPE-ish tokens per
    * whitespace word ×1000 and chars-per-token ×1000, both HALF_UP
    * integers, per lang. One codegen'd scan (both token counts are
    * regex/size projections), one lang-domain agg; divisions
    * zero-guarded for degenerate languages.
    */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"),
        Text.wsTokenCount(col("text")).cast("long").as("ws"),
        Text.bpeIshTokenCount(col("text")).cast("long").as("bpe"),
        length(col("text")).cast("long").as("chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("ws")).as("n_words"),
        sum(col("bpe")).as("n_bpe_tokens"), sum(col("chars")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_words"),
        col("n_bpe_tokens"), col("n_chars"),
        when(col("n_words") === 0L, lit(0L))
          .otherwise(expr("(2*n_bpe_tokens*1000 + n_words) div (2*n_words)"))
          .as("fertility_x1000"),
        when(col("n_bpe_tokens") === 0L, lit(0L))
          .otherwise(expr("(2*n_chars*1000 + n_bpe_tokens) div (2*n_bpe_tokens)"))
          .as("chars_per_token_x1000"))
      .orderBy("lang")

  val queries: Map[String, GQuery] = Map(
    "pipe_tokenizer_fertility" -> GQuery.sql(tokenizerFertility,
      """WITH d AS (
        |  SELECT lang,
        |    len(list_filter(regexp_split_to_array(text, '\s+'),
        |        x -> len(x) > 0)) AS ws,
        |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
        |      AS bpe,
        |    length(text) AS chars
        |  FROM documents),
        |c AS (
        |  SELECT lang, count(*) AS n_docs,
        |    CAST(sum(ws) AS BIGINT) AS n_words,
        |    CAST(sum(bpe) AS BIGINT) AS n_bpe_tokens,
        |    CAST(sum(chars) AS BIGINT) AS n_chars
        |  FROM d GROUP BY lang)
        |SELECT lang, n_docs, n_words, n_bpe_tokens, n_chars,
        |  CASE WHEN n_words = 0 THEN CAST(0 AS BIGINT)
        |       ELSE (2*n_bpe_tokens*1000 + n_words) // (2*n_words) END
        |    AS fertility_x1000,
        |  CASE WHEN n_bpe_tokens = 0 THEN CAST(0 AS BIGINT)
        |       ELSE (2*n_chars*1000 + n_bpe_tokens) // (2*n_bpe_tokens) END
        |    AS chars_per_token_x1000
        |FROM c ORDER BY lang""".stripMargin),
    "pipe_split_leakage" -> GQuery.sql(splitLeakage,
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
        |                x -> len(x) > 0) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source,
        |    list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
        |  FROM toks WHERE len(t) >= 3),
        |pairs AS (
        |  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, a.source
        |  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE /
        |        len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.35),
        |sp AS (
        |  SELECT doc_id,
        |    CASE WHEN ((doc_id % 999983) * 2654435761) % 100 < 80 THEN 'train'
        |         WHEN ((doc_id % 999983) * 2654435761) % 100 < 90 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |c AS (
        |  SELECT p.source, count(*) AS n_pairs,
        |    CAST(count(*) FILTER (WHERE s1.split <> s2.split) AS BIGINT)
        |      AS n_cross_pairs
        |  FROM pairs p JOIN sp s1 ON s1.doc_id = p.doc_id_1
        |               JOIN sp s2 ON s2.doc_id = p.doc_id_2
        |  GROUP BY p.source)
        |SELECT source, n_pairs, n_cross_pairs,
        |  CASE WHEN n_pairs = 0 THEN CAST(0 AS BIGINT)
        |       ELSE (2*n_cross_pairs*1000000 + n_pairs) // (2*n_pairs) END
        |    AS cross_ppm
        |FROM c ORDER BY source""".stripMargin),
    "pipe_dedup_impact" -> GQuery.sql(dedupImpact,
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, source,
        |    list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
        |                x -> len(x) > 0) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source,
        |    list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
        |  FROM toks WHERE len(t) >= 3),
        |pairs AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j
        |  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE /
        |        len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.35),
        |edges AS (SELECT i, j FROM pairs UNION ALL SELECT j AS i, i AS j FROM pairs),
        |cc AS (
        |  SELECT DISTINCT i AS id, i AS lbl FROM edges
        |  UNION
        |  SELECT e.j AS id, cc.lbl FROM cc JOIN edges e ON e.i = cc.id),
        |rm AS (SELECT id AS doc_id FROM cc GROUP BY id HAVING id <> min(lbl)),
        |c AS (
        |  SELECT t.source,
        |    count(*) AS n_docs,
        |    CAST(count(*) FILTER (WHERE rm.doc_id IS NOT NULL) AS BIGINT)
        |      AS docs_removed,
        |    CAST(sum(len(t.t)) AS BIGINT) AS n_tokens,
        |    CAST(coalesce(sum(len(t.t)) FILTER (WHERE rm.doc_id IS NOT NULL), 0)
        |      AS BIGINT) AS tokens_removed
        |  FROM toks t LEFT JOIN rm ON rm.doc_id = t.doc_id
        |  GROUP BY t.source)
        |SELECT source, n_docs, docs_removed, n_tokens, tokens_removed,
        |  CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT)
        |       ELSE (2*tokens_removed*1000000 + n_tokens) // (2*n_tokens) END
        |    AS tokens_removed_ppm
        |FROM c ORDER BY source""".stripMargin),
    "pipe_lang_cap" -> GQuery.sql(langCap,
      s"""WITH d AS (
        |  SELECT lang, doc_id, n_chars,
        |    ((doc_id % 999983) * 2654435761) % 999983 AS h
        |  FROM documents),
        |r AS (
        |  SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
        |  FROM d)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_total,
        |  CAST(count(*) FILTER (WHERE rn <= $LangCap) AS BIGINT) AS n_kept,
        |  CAST(coalesce(sum(n_chars) FILTER (WHERE rn <= $LangCap), 0) AS BIGINT)
        |    AS chars_kept
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin),
    "pipe_token_budget" -> GQuery.sql(tokenBudget,
      """WITH d AS (
        |  SELECT source, doc_id, n_chars,
        |    len(list_filter(regexp_split_to_array(text, '[[:space:]]+'),
        |      x -> len(x) > 0)) AS tok
        |  FROM documents),
        |t AS (SELECT source, CAST(sum(tok) AS BIGINT) AS tot_tok,
        |        count(*) AS n_docs FROM d GROUP BY source),
        |c AS (
        |  SELECT source, tok,
        |    coalesce(CAST(sum(tok) OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |      AS cum_before
        |  FROM d),
        |k AS (
        |  SELECT c.source, c.tok,
        |    CASE WHEN 2*c.cum_before < t.tot_tok THEN 1 ELSE 0 END AS kept
        |  FROM c JOIN t USING (source))
        |SELECT k.source AS source, max(t.n_docs) AS n_docs,
        |  CAST(sum(kept) AS BIGINT) AS n_selected,
        |  max(t.tot_tok) AS tokens_total,
        |  CAST(sum(kept * tok) AS BIGINT) AS tokens_selected
        |FROM k JOIN t ON k.source = t.source
        |GROUP BY k.source ORDER BY source""".stripMargin),
    "pipe_long_doc_split" -> GQuery.sql(longDocSplit,
      s"""WITH t AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
        |      x -> len(x) > 0) AS toks
        |  FROM documents),
        |d AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
        |c AS (
        |  SELECT doc_id, toks, n,
        |    unnest(range(0,
        |      greatest(n - $SplitWin + $SplitStride - 1, 0) // $SplitStride + 1))
        |      AS chunk_idx
        |  FROM d)
        |SELECT doc_id, chunk_idx,
        |  chunk_idx * $SplitStride AS start_tok,
        |  CAST(len(list_slice(toks, chunk_idx * $SplitStride + 1,
        |    chunk_idx * $SplitStride + $SplitWin)) AS BIGINT) AS n_tok,
        |  md5(array_to_string(list_slice(toks, chunk_idx * $SplitStride + 1,
        |    chunk_idx * $SplitStride + $SplitWin), ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin),
    "pipe_mixture_temperature" -> GQuery.sql(mixtureTemperature,
      """WITH s AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(list_filter(regexp_split_to_array(text, '[[:space:]]+'),
        |      x -> len(x) > 0))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (
        |  SELECT source, n_docs, n_tokens,
        |    CAST(floor(sqrt(n_tokens::DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS w_e6
        |  FROM s),
        |tot AS (
        |  SELECT CAST(sum(n_tokens) AS BIGINT) AS tok_total,
        |    CAST(sum(w_e6) AS BIGINT) AS w_total FROM w)
        |SELECT source, n_docs, n_tokens, w_e6,
        |  (2*1000000*w_e6 + w_total) // (2*w_total) AS temp_ppm,
        |  (2*1000000*n_tokens + tok_total) // (2*tok_total) AS flat_ppm
        |FROM w CROSS JOIN tot ORDER BY source""".stripMargin),
    "pipe_epoch_schedule" -> GQuery.sql(epochSchedule,
      """WITH s AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(list_filter(regexp_split_to_array(text, '[[:space:]]+'),
        |      x -> len(x) > 0))) AS BIGINT) AS n_tokens,
        |    (coalesce(TRY_CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT), 0) % 4) + 1 AS w
        |  FROM documents GROUP BY source),
        |tot AS (
        |  SELECT CAST(sum(n_tokens) AS BIGINT) AS tok_total,
        |    CAST(sum(w) AS BIGINT) AS w_total FROM s),
        |t AS (
        |  SELECT s.*, tok_total // 2 AS budget, w_total FROM s CROSS JOIN tot),
        |x AS (
        |  SELECT source, n_docs, n_tokens, w,
        |    (2*budget*w + w_total) // (2*w_total) AS target_tokens
        |  FROM t)
        |SELECT source, n_docs, n_tokens, w, target_tokens,
        |  (2*1000*target_tokens + greatest(n_tokens,1)) // (2*greatest(n_tokens,1))
        |    AS epochs_x1000
        |FROM x ORDER BY source""".stripMargin),
    "pipe_quality_score" -> GQuery.sql(qualityScore,
      """WITH toks AS (
        |  SELECT doc_id, text, length(text) AS chars,
        |    list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
        |                x -> len(x) > 0) AS t
        |  FROM documents),
        |sig AS (
        |  SELECT CAST(len(t) AS BIGINT) AS tok,
        |    CAST(len(list_filter(t,
        |      x -> x IN ('the','a','an','and','of','to','in','is'))) AS BIGINT) AS stop,
        |    CAST(len(list_distinct(t)) AS BIGINT) AS uniq,
        |    CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))
        |      AS BIGINT) AS punct,
        |    CAST(chars AS BIGINT) AS chars
        |  FROM toks),
        |ppm AS (
        |  SELECT
        |    (2*stop*1000000 + greatest(tok,1)) // (2*greatest(tok,1)) AS stop_ppm,
        |    (2*uniq*1000000 + greatest(tok,1)) // (2*greatest(tok,1)) AS uniq_ppm,
        |    (2*punct*1000000 + greatest(chars,1)) // (2*greatest(chars,1)) AS punct_ppm
        |  FROM sig),
        |sc AS (
        |  SELECT 2*stop_ppm + 3*uniq_ppm - punct_ppm AS score_x4 FROM ppm)
        |SELECT (score_x4 + 1000000) // 100000 AS band,
        |  count(*) AS n_docs,
        |  CAST(min(score_x4) AS BIGINT) AS min_score,
        |  CAST(max(score_x4) AS BIGINT) AS max_score
        |FROM sc GROUP BY 1 ORDER BY band""".stripMargin),
    "pipe_dup_rate_by_source" -> GQuery.sql(dupRateBySource,
      """WITH h AS (
        |  SELECT source,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h,
        |    count(*) AS copies
        |  FROM documents GROUP BY 1, 2)
        |SELECT source, CAST(sum(copies) AS BIGINT) AS n_docs,
        |  count(*) AS n_unique,
        |  CAST((2*(CAST(sum(copies) AS BIGINT) - count(*))*1000000
        |        + CAST(sum(copies) AS BIGINT))
        |    // (2*CAST(sum(copies) AS BIGINT)) AS BIGINT) AS dup_ppm
        |FROM h GROUP BY 1 ORDER BY source""".stripMargin),
    "pipe_padding_census" -> GQuery.sql(paddingCensus,
      s"""WITH t AS (
        |  SELECT CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
        |    x -> len(x) > 0)) AS BIGINT) AS n
        |  FROM documents),
        |b AS (
        |  SELECT n, ((greatest(n, 1) - 1) // $PadBlock + 1) * $PadBlock
        |    AS band_tokens FROM t),
        |g AS (
        |  SELECT band_tokens, count(*) AS n_docs,
        |    (count(*) + $PadBatch - 1) // $PadBatch AS n_batches,
        |    CAST(sum(n) AS BIGINT) AS real_tokens
        |  FROM b GROUP BY 1)
        |SELECT band_tokens, n_docs, n_batches,  real_tokens,
        |  n_docs * band_tokens AS padded_tokens,
        |  CAST((2*(n_docs*band_tokens - real_tokens)*1000000
        |        + n_docs*band_tokens) // (2*n_docs*band_tokens) AS BIGINT)
        |    AS waste_ppm
        |FROM g ORDER BY band_tokens""".stripMargin),
    "pipe_dataset_card" -> GQuery.sql(datasetCard,
      """WITH base AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |    count(DISTINCT lang) AS n_langs,
        |    count(DISTINCT md5(text)) AS n_uniq_texts
        |  FROM documents GROUP BY source),
        |lc AS (SELECT source, lang, count(*) AS cnt
        |       FROM documents GROUP BY 1, 2),
        |top AS (
        |  SELECT source, lang AS top_lang, cnt AS top_lang_docs FROM (
        |    SELECT source, lang, cnt,
        |      row_number() OVER (PARTITION BY source
        |        ORDER BY cnt DESC, lang DESC) AS rn
        |    FROM lc) WHERE rn = 1)
        |SELECT b.source, n_docs, total_chars, n_langs, n_uniq_texts,
        |  top_lang, top_lang_docs
        |FROM base b JOIN top USING (source) ORDER BY source""".stripMargin),
    "pipe_filter_funnel" -> GQuery.sql(filterFunnel,
      s"""WITH t AS (
        |  SELECT n_chars,
        |    list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
        |                x -> len(x) > 0) AS toks
        |  FROM documents),
        |f AS (
        |  SELECT n_chars BETWEEN $FunnelMinChars AND $FunnelMaxChars AS f1,
        |    len(toks) >= $FunnelMinTokens AS f2,
        |    len(list_filter(toks,
        |      x -> x IN ('the','a','an','and','of','to','in','is'))) * 50
        |      >= len(toks) AS f3,
        |    len(list_distinct(toks)) * 2 >= len(toks) AS f4
        |  FROM t),
        |a AS (
        |  SELECT count(*) AS n0,
        |    count(*) FILTER (f1) AS k1,
        |    count(*) FILTER (f1 AND f2) AS k2,
        |    count(*) FILTER (f1 AND f2 AND f3) AS k3,
        |    count(*) FILTER (f1 AND f2 AND f3 AND f4) AS k4
        |  FROM f),
        |s AS (
        |  SELECT CAST(1 AS BIGINT) AS stage_no, 'length' AS stage,
        |         n0 AS n_in, k1 AS n_kept FROM a
        |  UNION ALL SELECT 2, 'min_tokens', k1, k2 FROM a
        |  UNION ALL SELECT 3, 'stopword_ratio', k2, k3 FROM a
        |  UNION ALL SELECT 4, 'uniq_ratio', k3, k4 FROM a)
        |SELECT stage_no, stage, n_in, n_kept, n_in - n_kept AS n_dropped
        |FROM s ORDER BY stage_no""".stripMargin),
    "pipe_detokenize_roundtrip" -> GQuery.sql(detokenizeRoundtrip,
      s"""WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
        |                x -> len(x) > 0) AS t
        |  FROM documents),
        |pt AS (
        |  SELECT doc_id, generate_subscripts(t, 1) AS pos, unnest(t) AS w
        |  FROM toks),
        |vocab AS (SELECT w, count(*) AS cnt FROM pt GROUP BY w),
        |vid AS (
        |  SELECT w, CAST(CASE WHEN rn <= $VocabCap THEN rn - 1 ELSE $VocabCap END
        |              AS BIGINT) AS id
        |  FROM (SELECT w, row_number() OVER (ORDER BY cnt DESC, w) AS rn FROM vocab)),
        |flag AS (
        |  SELECT doc_id, max(CASE WHEN id >= $VocabCap THEN 1 ELSE 0 END) AS has_oov
        |  FROM pt JOIN vid USING (w) GROUP BY doc_id)
        |SELECT d.source, count(*) AS n_docs,
        |  count(*) FILTER (WHERE has_oov = 0) AS n_invocab,
        |  count(*) FILTER (WHERE has_oov = 0) AS n_roundtrip_exact,
        |  count(*) AS n_bpe_exact
        |FROM documents d JOIN toks ON toks.doc_id = d.doc_id
        |JOIN flag ON flag.doc_id = d.doc_id
        |WHERE len(toks.t) > 0
        |GROUP BY d.source ORDER BY d.source""".stripMargin),
    "pipe_tokenize_to_ids" -> GQuery.sql(tokenizeToIds,
      s"""WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
        |                x -> len(x) > 0) AS t
        |  FROM documents),
        |pt AS (
        |  SELECT doc_id, generate_subscripts(t, 1) AS pos, unnest(t) AS w
        |  FROM toks),
        |vocab AS (SELECT w, count(*) AS cnt FROM pt GROUP BY w),
        |vid AS (
        |  SELECT w, CAST(CASE WHEN rn <= $VocabCap THEN rn - 1 ELSE $VocabCap END
        |              AS BIGINT) AS id
        |  FROM (SELECT w, row_number() OVER (ORDER BY cnt DESC, w) AS rn FROM vocab))
        |SELECT doc_id, count(*) AS n_tokens,
        |  string_agg(id::VARCHAR, ' ' ORDER BY pos) AS ids
        |FROM pt JOIN vid USING (w)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "pipe_weighted_sample" -> GQuery.sql(weightedSample,
      s"""WITH keyed AS (
        |  SELECT doc_id, source, n_chars,
        |    round(ln((((doc_id % 999983) * 2654435761) % 1000000 + 1) / 1000000.0)
        |      / n_chars, 9) AS es_key
        |  FROM documents)
        |SELECT doc_id, source, n_chars, es_key FROM keyed
        |ORDER BY es_key DESC, doc_id LIMIT $WeightedK""".stripMargin),
    "pipe_global_shuffle" -> GQuery.sql(globalShuffle,
      s"""WITH k AS (
        |  SELECT doc_id, ((doc_id % 999983) * 2654435761) % $HashMod AS skey
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY skey, doc_id) AS pos
        |  FROM k)
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |  CAST((pos - 1) % $ShuffleShards AS BIGINT) AS shard
        |FROM p ORDER BY doc_id""".stripMargin),
    "pipe_schema_profile" -> GQuery.sql(schemaProfile, schemaProfileOracle),
    "pipe_shard_manifest" -> GQuery.sql(shardManifest,
      s"""WITH d AS (
        |  SELECT doc_id, n_chars, n_chars * 1048576 + doc_id AS k FROM documents),
        |e AS (SELECT min(k) AS mn, max(k) AS mx FROM d)
        |SELECT CAST(((k - mn) * $ExportShards) // (mx - mn + 1) AS BIGINT) AS shard_id,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
        |  min(k) AS min_key, max(k) AS max_key
        |FROM d CROSS JOIN e
        |GROUP BY 1 ORDER BY shard_id""".stripMargin),
    "pipe_domain_mix" -> GQuery.sql(domainMix,
      s"""WITH s AS (
        |  SELECT source, count(*) AS n_source,
        |    ((coalesce(TRY_CAST(regexp_extract(source, '(\\d+)', 1) AS BIGINT), 0) % 4) + 1)::DOUBLE AS w_raw
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(n_source) AS BIGINT) AS n_total, sum(w_raw) AS w_total FROM s),
        |rates AS (
        |  SELECT source, n_source,
        |    least(1.0, w_raw / w_total * $MixBudgetFrac * n_total::DOUBLE / n_source::DOUBLE)
        |      AS keep_frac
        |  FROM s CROSS JOIN tot)
        |SELECT r.source AS source, r.n_source AS n_source,
        |  round(r.keep_frac, 6) AS keep_frac, count(*) AS n_kept
        |FROM documents d JOIN rates r USING (source)
        |WHERE ((d.doc_id % 999983) * 2654435761) % 1000000 <
        |      CAST(floor(r.keep_frac * 1000000.0) AS BIGINT)
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin),
    "pipe_decontaminate" -> GQuery.sql(decontaminate, decontaminateOracle),
    "pipe_near_decontaminate" ->
      GQuery.sql(nearDecontaminate, nearDecontaminateOracle),
    "pipe_bloom_decontaminate" -> GQuery.sql(bloomDecontaminate, decontaminateOracle),
    "pipe_rag_chunks" -> GQuery.sql(ragChunks,
      s"""WITH d AS (
        |  SELECT source, n_chars,
        |    CASE WHEN n_chars <= $RagChunkChars THEN 1
        |         ELSE (n_chars - $RagChunkChars + $RagStrideChars - 1)
        |              // $RagStrideChars + 1 END AS n_chunks
        |  FROM documents),
        |e AS (
        |  SELECT source, n_chars, n_chunks,
        |    CASE WHEN n_chars <= $RagChunkChars THEN n_chars
        |         ELSE (n_chunks - 1) * $RagChunkChars +
        |              (n_chars - (n_chunks - 1) * $RagStrideChars)
        |    END AS chunk_chars
        |  FROM d),
        |g AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |    CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
        |    CAST(sum(chunk_chars) AS BIGINT) AS sum_chunk_chars
        |  FROM e GROUP BY source)
        |SELECT source, n_docs, sum_chars, n_chunks, sum_chunk_chars,
        |  CASE WHEN sum_chunk_chars = 0 THEN 0
        |       ELSE (2*(sum_chunk_chars - sum_chars)*1000000
        |              + sum_chunk_chars) // (2*sum_chunk_chars)
        |  END AS overlap_ppm
        |FROM g ORDER BY source""".stripMargin),
    "pipe_kfold_assign" -> GQuery.sql(kfoldAssign,
      s"""SELECT (((doc_id % 999983) * 2246822519) // 1048576) % $KFolds AS fold,
        |  source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1, 2 ORDER BY fold, source""".stripMargin),
    "pipe_hash_sample" -> GQuery.sql(hashSample,
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE ((doc_id % 999983) * 2654435761) % 100 < 5
        |ORDER BY doc_id""".stripMargin),
    "pipe_train_test_split" -> GQuery.sql(trainTestSplit,
      """SELECT CASE WHEN ((doc_id % 999983) * 2654435761) % 100 < 80 THEN 'train'
        |            WHEN ((doc_id % 999983) * 2654435761) % 100 < 90 THEN 'val'
        |            ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1 ORDER BY split""".stripMargin),
    "pipe_stratified_sample" -> GQuery.sql(stratifiedSample,
      """SELECT doc_id, lang, rn FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
        |    CAST(ceil(count(*) OVER (PARTITION BY lang) * 0.2) AS BIGINT) AS quota
        |  FROM documents)
        |WHERE rn <= quota ORDER BY doc_id""".stripMargin),
    "pipe_pack_sequences" -> GQuery.sql(packSequences,
      s"""WITH t AS (
        |  SELECT doc_id,
        |    len(list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0)) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_incl
        |  FROM t)
        |SELECT CAST((cum_incl - n_tokens) // $PackBudget AS BIGINT) AS pack_id,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1 ORDER BY pack_id""".stripMargin),
    "pipe_group_stats" -> GQuery.sql(groupStats,
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(stddev_samp(o_totalprice), 2) AS price_stddev,
        |  round(corr(o_totalprice, c_acctbal), 4) AS price_balance_corr
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
    "pipe_tfidf" -> GQuery.sql(tfidf,
      s"""WITH terms AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+')) AS term
        |  FROM documents),
        |terms2 AS (SELECT * FROM terms WHERE length(term) > 0),
        |doclen AS (SELECT doc_id, count(*) AS doc_len FROM terms2 GROUP BY 1),
        |tf AS (SELECT doc_id, term, count(*) AS term_count FROM terms2 GROUP BY 1, 2),
        |idf AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_total FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    (tf.term_count::DOUBLE / doclen.doc_len) *
        |      ln(n.n_total::DOUBLE / idf.doc_freq) AS tfidf_raw
        |  FROM tf JOIN doclen USING (doc_id) JOIN idf USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, tfidf_raw,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf_raw DESC, term) AS rank
        |  FROM scored)
        |SELECT doc_id, rank, term, round(tfidf_raw, 6) AS tfidf
        |FROM ranked WHERE rank <= $TfidfTopN ORDER BY doc_id, rank""".stripMargin),
    "pipe_clean_corpus" -> GQuery.sql(cleanCorpus,
      """WITH h AS (
        |  SELECT doc_id, lang, text,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS md5_hash,
        |    len(list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
        |        x -> len(x) > 0)) AS n_tokens,
        |    CASE WHEN length(text) = 0 THEN 0 ELSE
        |      (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
        |      / length(text) END AS punct_ratio
        |  FROM documents),
        |canon AS (SELECT md5_hash, min(doc_id) AS doc_id FROM h GROUP BY 1)
        |SELECT h.doc_id, h.lang, h.n_tokens
        |FROM h JOIN canon ON h.md5_hash = canon.md5_hash AND h.doc_id = canon.doc_id
        |WHERE h.n_tokens BETWEEN 5 AND 1000 AND h.punct_ratio < 0.2
        |ORDER BY h.doc_id""".stripMargin),
  )
}
