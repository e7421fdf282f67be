package graft

import org.apache.spark.sql.functions._

/** Invariants for the seventh round-8 operator batch beyond their
  * DuckDB oracles.
  */
class Round8gOpsSpec extends SparkTestBase {

  test("rake keyphrases contain no stopwords and score by the deg/freq identity") {
    val got = operators.TextAnalysis.rakeKeyphrases(spark, SfDir).collect()
    assert(got.nonEmpty && got.length <= operators.TextAnalysis.RakeTopK)
    val stop = operators.TextAnalysis.Stopwords.toSet
    got.foreach { r =>
      val words = r.getAs[String]("phrase").split(" ")
      assert(words.length == r.getAs[Long]("n_words"))
      assert(words.forall(w => !stop.contains(w)),
        s"stopword leaked into phrase '${r.getAs[String]("phrase")}'")
      assert(r.getAs[Long]("n_occurrences") >= 1L)
      // each member word's score is >= 1e6 ppm (deg >= freq always,
      // since every occurrence sits in a phrase of length >= 1), so a
      // phrase scores at least n_words * 1e6
      assert(r.getAs[Long]("score_ppm") >= r.getAs[Long]("n_words") * 1000000L)
    }
    // descending score with phrase tie-break
    val scores = got.map(_.getAs[Long]("score_ppm"))
    assert(scores.sliding(2).forall { case Array(x, y) => x >= y })
  }

  test("phash dedup reconciles payload counts and bucket arithmetic per kind") {
    val got = operators.Multimodal.phashDedup(spark, SfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (np, ns, dup, mx) = (r.getAs[Long]("n_payloads"),
        r.getAs[Long]("n_signatures"), r.getAs[Long]("dup_payloads"),
        r.getAs[Long]("max_bucket"))
      assert(np == ns + dup, "payloads = signatures + surplus duplicates")
      assert(mx >= 1L && mx <= np - ns + 1)
      assert(ns <= np)
    }
    // signatures are 16-bit: at most 2^16 distinct per kind
    assert(got.forall(_.getAs[Long]("n_signatures") <= (1L << 16)))
  }

  test("slo burn partitions days, flags exactly above budget, and runs the breach count") {
    val got = operators.Events.sloBurn(spark, SfDir).collect().sortBy(_.getAs[Long]("day"))
    assert(got.nonEmpty)
    val ev = Tables.events(spark, SfDir)
    assert(got.map(_.getAs[Long]("n_events")).sum == ev.count())
    assert(got.map(_.getAs[Long]("n_errors")).sum ==
      ev.filter(col("event_type") === "error").count())
    var run = 0L
    got.foreach { r =>
      val (bp, br) = (r.getAs[Long]("burn_ppm"), r.getAs[Long]("breached"))
      assert(br == (if (bp > operators.Events.SloBudgetPpm) 1L else 0L))
      run += br
      assert(r.getAs[Long]("breach_days_to_date") == run,
        "running breach count must accumulate in day order")
      assert(bp >= 0L && bp <= 1000000L)
    }
  }
}
