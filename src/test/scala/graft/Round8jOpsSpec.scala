package graft

import org.apache.spark.sql.functions._

/** Invariants for the tenth round-8 operator batch beyond their
  * DuckDB oracles.
  */
class Round8jOpsSpec extends SparkTestBase {

  test("triplet audit: margins nest and counts are bounded by triplet total") {
    val r = operators.Similarity.tripletAudit(spark, SfDir).collect()(0)
    val (n, m0, m05, m10) = (r.getAs[Long]("n_triplets"), r.getAs[Long]("viol_m0"),
      r.getAs[Long]("viol_m05"), r.getAs[Long]("viol_m10"))
    assert(n > 0L)
    // a larger margin can only add violations
    assert(m0 <= m05 && m05 <= m10 && m10 <= n)
    assert(r.getAs[Long]("viol_ppm") == (2 * m0 * 1000000 + n) / (2 * n))
    // labeled synthetic embeddings must show SOME metric structure:
    // the zero-margin violation rate stays below half
    assert(m0 * 2 < n, s"violations $m0 of $n — space has no label structure")
  }

  test("hazard table: at-risk populations nest and churn+censor partition users") {
    val got = operators.Events.hazardTable(spark, SfDir).collect()
      .sortBy(_.getAs[Long]("band"))
    assert(got.nonEmpty)
    val nUsers = Tables.events(spark, SfDir).select("user_id").distinct().count()
    // band 0's at-risk population is everyone; at-risk is non-increasing
    assert(got.head.getAs[Long]("band") > 0L ||
      got.head.getAs[Long]("n_at_risk") <= nUsers)
    assert(got.map(r => r.getAs[Long]("n_churned") + r.getAs[Long]("n_censored")).sum
      == nUsers, "every user exits in exactly one band")
    val atRisk = got.map(_.getAs[Long]("n_at_risk"))
    assert(atRisk.sliding(2).forall {
      case Array(a, b) => a >= b
      case _           => true // single-band table has no adjacent pair
    }, "at-risk population must be non-increasing in band")
    got.foreach { r =>
      assert(r.getAs[Long]("hazard_ppm") <= 1000000L)
      assert(r.getAs[Long]("n_churned") <= r.getAs[Long]("n_at_risk"))
    }
  }

  test("psi drift: buckets cover both sides, smoothing keeps terms finite and signs consistent") {
    val got = operators.Relational.psiDrift(spark, SfDir).collect()
    assert(got.nonEmpty)
    val n = Tables.orders(spark, SfDir).count()
    assert(got.map(r => r.getAs[Long]("n_base") + r.getAs[Long]("n_cur")).sum == n)
    got.foreach { r =>
      val (p, q, term) = (r.getAs[Long]("p_ppm"), r.getAs[Long]("q_ppm"),
        r.getAs[Double]("psi_term"))
      assert(p > 0L && q > 0L, "Laplace smoothing must keep shares positive")
      // (p-q) and ln(p/q) share sign, so every PSI term is >= 0
      assert(term >= 0.0, s"PSI term $term negative")
      if (p == q) assert(term == 0.0)
    }
    // the parity split of one distribution should show LOW drift:
    // every term small (the monitor's null case behaves)
    assert(got.map(_.getAs[Double]("psi_term")).max < 0.05)
  }
}
