package graft

import org.apache.spark.sql.functions._

/** Round-11 operators and hardening. */
class Round11OpsSpec extends SparkTestBase {

  test("pipe_near_decontaminate survives a non-broadcastable candidate set") {
    import spark.implicits._
    val stage = "/root/repo/target/graft_neardec_stress"
    // A full-width eval suite (all 50 benchmark ids) against a
    // MIRROR-HEAVY corpus: every benchmark doc has 8 distinct edited
    // near-copies on the training side, so the candidate set is ~400
    // pairs — the regime where a forced broadcast(cand) hint is a
    // scale hazard (VERDICT r10 #5). With autoBroadcastJoinThreshold
    // = -1 NOTHING unhinted may broadcast: the candidate join must
    // plan as a shuffled join and still produce identical admissions.
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lam", "mu")
    def docText(i: Long, edit: Int): String = {
      val base = (0 until 8).map(j => words(((i + j) % 12).toInt))
      (if (edit >= 0) base.init :+ s"edit$edit" else base).mkString(" ")
    }
    val B = operators.Pipeline.BenchmarkMaxId
    val bench = (0L until B).map(i => (i, "en", "bench", docText(i, -1)))
    val leaks = for (i <- 0L until B; k <- 0 until 8) yield
      (B + i * 8 + k, "en", "web", docText(i, k))
    (bench ++ leaks).map { case (id, l, s, t) => (id, l, s, t, t.length.toLong) }
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$stage/documents.parquet")
    val default = operators.Pipeline.nearDecontaminate(spark, stage)
      .collect().map(_.toSeq).toSeq
    assert(default.nonEmpty, "stress corpus produced no admissions")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val strict = operators.Pipeline.nearDecontaminate(spark, stage)
        .collect().map(_.toSeq).toSeq
      assert(strict == default,
        "shuffled-join fallback changed the admission set")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
