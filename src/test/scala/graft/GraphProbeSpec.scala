package graft

import org.apache.spark.sql.functions._

/** Graph-ANN serving contract (VERDICT r14 #4): the persisted
  * NN-descent graph is built once and REUSED by probes; greedy beam
  * search from the fixed entry is deterministic; and its rank-1
  * answers reach the exact nearest neighbor for most planted-twin
  * queries (the recall-vs-exact floor — the planted twin's source
  * sits at cosine 1, so missing it means the beam never reached the
  * query's neighborhood).
  */
class GraphProbeSpec extends SparkTestBase {

  test("probe serves from the persisted graph and a second run reuses it") {
    val r = operators.Similarity.annGraphProbe(spark, SfDir)
    assert(r.count() > 0)
    // idempotent staging: the second probe must reuse, not rebuild
    val marker = java.nio.file.Paths.get(
      operators.Staging.resolve(operators.Staging.pathFor(
        operators.Similarity.KnnGraphRoot, SfDir)), "_SOURCE")
    val before = java.nio.file.Files.getLastModifiedTime(marker)
    val r2 = operators.Similarity.annGraphProbe(spark, SfDir)
    assert(r2.collect().map(_.toString).toSeq ==
      r.collect().map(_.toString).toSeq, "probe must be deterministic")
    assert(java.nio.file.Files.getLastModifiedTime(marker) == before,
      "second probe rebuilt the persisted graph")
    // the persisted artifact is the real serve input: it holds the
    // edges subtable as parquet (the probe's lineage is truncated by
    // the per-hop checkpoints, so the scan cannot be asserted off the
    // final executedPlan — assert the artifact instead)
    val edges = java.nio.file.Paths.get(
      operators.Staging.resolve(operators.Staging.pathFor(
        operators.Similarity.KnnGraphRoot, SfDir)), "edges")
    assert(java.nio.file.Files.exists(edges))
    assert(Option(edges.toFile.listFiles).toSeq.flatten
      .exists(_.getName.endsWith(".parquet")),
      "staged graph holds no parquet edges")
  }

  test("stream-maintained insert edges equal the batch beam search, replay-idempotent") {
    val batchAnswer = operators.Similarity.annGraphProbe(spark, SfDir)
      .collect().map(_.toString).toSeq
    val streamed = operators.StreamingOps
      .streamGraphIndexIngest(spark, SfDir)
      .collect().map(_.toString).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batchAnswer,
      "stream-appended insert edges diverged from the batch beam search")
    // replay idempotency: re-running a micro-batch overwrites its own
    // slice, leaving the maintained layout unchanged
    val e = operators.Similarity.vecs(spark, SfDir)
      .select(col("vec_id"), col("v"))
    val idx = operators.Similarity.stageKnnGraph(spark, SfDir)
    val edges = operators.Similarity.readKnnGraph(spark, idx)
    val batch = operators.Similarity.plantedVecQueriesOf(e)
      .filter(col("q_id") % 3 === 0)
    val root = java.nio.file.Files.createTempDirectory("graft_graph_replay")
    try {
      operators.StreamingOps.appendGraphBatch(spark, root.toString,
        edges, e, batch, 0L)
      def slice() = spark.read
        .schema("q_id BIGINT, rank BIGINT, vec_id BIGINT, cosine DOUBLE")
        .option("recursiveFileLookup", "true")
        .parquet(s"$root/edges")
        .orderBy("q_id", "rank").collect().map(_.toString).toSeq
      val once = slice()
      operators.StreamingOps.appendGraphBatch(spark, root.toString,
        edges, e, batch, 0L)
      assert(slice() == once, "micro-batch replay duplicated insert edges")
    } finally operators.Staging.deleteTree(root)
  }

  test("beam-search rank-1 recall vs exact nearest neighbor clears the floor") {
    // exact NN of each planted twin is its source vector (cosine 1);
    // ties on cosine 1 can only come from exact-duplicate vectors,
    // which the deterministic (cos desc, id) order resolves — accept
    // any answer at rounded cosine 1 as a hit, plus exact id matches
    val withCos = operators.Similarity.annGraphProbe(spark, SfDir)
      .filter(col("rank") === 1L)
    val nq = withCos.count()
    assert(nq > 0)
    val hits = withCos.filter(
      (col("q_id") - col("vec_id") === operators.Similarity.QueryOffset) ||
        col("cosine") >= 0.9999).count()
    assert(hits * 2 >= nq,
      s"beam search found the planted source for only $hits/$nq queries")
  }
}
