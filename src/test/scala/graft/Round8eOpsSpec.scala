package graft

import org.apache.spark.sql.functions._

/** Invariants for the fifth round-8 operator batch beyond their
  * DuckDB oracles.
  */
class Round8eOpsSpec extends SparkTestBase {

  test("outage census gaps reconcile with the distinct-minute timeline") {
    val got = operators.Events.outageCensus(spark, SfDir).collect()
    assert(got.nonEmpty)
    val minutes = Tables.events(spark, SfDir)
      .select(expr("unix_millis(ts) div 60000").as("m")).distinct()
    val n = minutes.count()
    assert(got.map(_.getAs[Long]("n_gaps")).sum == n - 1,
      "every present minute except the last contributes exactly one gap")
    val Array(lo, hi) = minutes.agg(min("m"), max("m")).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    // Σ gap = span, so Σ missing = span - (n-1)
    assert(got.map(_.getAs[Long]("missing_minutes")).sum == (hi - lo) - (n - 1))
    val hiCut = Map("a_adjacent" -> 1L, "b_2_4" -> 4L, "c_5_9" -> 9L,
      "d_10_29" -> 29L, "e_ge_30" -> Long.MaxValue)
    got.foreach { r =>
      assert(r.getAs[Long]("max_gap") <= hiCut(r.getAs[String]("band")))
    }
  }

  test("velocity flags audit every user and fire exactly at the threshold") {
    val got = operators.Events.velocityFlags(spark, SfDir).collect()
    val ev = Tables.events(spark, SfDir)
    assert(got.length == ev.select("user_id").distinct().count())
    assert(got.map(_.getAs[Long]("n_events")).sum == ev.count())
    got.foreach { r =>
      val (burst, n, fl) = (r.getAs[Long]("max_burst_1d"),
        r.getAs[Long]("n_events"), r.getAs[Long]("flagged"))
      assert(burst >= 1L && burst <= n)
      assert(fl == (if (burst >= operators.Events.VelocityBurstN) 1L else 0L))
    }
  }

  test("benford audit covers all orders with ppm shares and exact reference mass") {
    val got = operators.Relational.benfordAudit(spark, SfDir).collect()
    assert(operators.Relational.BenfordPpm.map(_._2).sum == 1000000L,
      "reference constants must sum to exactly 1e6 ppm")
    val nOrders = Tables.orders(spark, SfDir)
      .filter(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) > 0")).count()
    assert(got.map(_.getAs[Long]("n_orders")).sum == nOrders)
    val shareSum = got.map(_.getAs[Long]("share_ppm")).sum
    assert(math.abs(shareSum - 1000000L) <= got.length,
      s"HALF_UP shares sum $shareSum strays beyond rounding slack")
    got.foreach { r =>
      val d = r.getAs[Long]("digit")
      assert(d >= 1L && d <= 9L)
      assert(r.getAs[Long]("delta_ppm") ==
        r.getAs[Long]("share_ppm") - r.getAs[Long]("benford_ppm"))
    }
  }

  test("payload entropy is bounded and the byte census covers every char") {
    val got = operators.Multimodal.payloadEntropy(spark, SfDir).collect()
    assert(got.map(_.getAs[String]("kind")).sorted.sameElements(
      Array("audio", "image", "video")))
    val docs = Tables.documents(spark, SfDir)
    assert(got.map(_.getAs[Long]("n_payloads")).sum == docs.count())
    val totalChars = docs.agg(sum(length(col("text")))).collect()(0).getLong(0)
    assert(got.map(_.getAs[Long]("n_bytes")).sum == totalChars)
    got.foreach { r =>
      val (h, dist) = (r.getAs[Double]("entropy_bits"),
        r.getAs[Long]("n_distinct_bytes"))
      assert(h >= 0.0 && h <= 8.0, s"byte entropy $h outside [0,8]")
      assert(math.pow(2.0, h) <= dist + 1e-6,
        "2^H cannot exceed the distinct-byte support")
    }
  }

  test("kfold assignment partitions the corpus across all folds and sources") {
    val got = operators.Pipeline.kfoldAssign(spark, SfDir).collect()
    val docs = Tables.documents(spark, SfDir)
    assert(got.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val chars = docs.agg(sum(col("n_chars"))).collect()(0).getLong(0)
    assert(got.map(_.getAs[Long]("sum_chars")).sum == chars)
    val folds = got.map(_.getAs[Long]("fold")).distinct
    assert(folds.forall(f => f >= 0L && f < operators.Pipeline.KFolds))
    assert(folds.length == operators.Pipeline.KFolds.toInt,
      "every fold must be populated (hash must not collapse)")
  }
}
