package graft

/** Property pins for `ann_recall_curve`: probe-budget domain,
  * monotonicity, and the HALF_UP recall arithmetic.
  *
  * Monotonicity is a THEOREM of the construction, not a hope: the
  * candidate set grows with the probe budget, and a brute-top-k
  * member x can only be displaced from the candidate top-k by
  * strictly-better-cosine candidates — of which fewer than k exist
  * globally (x is in the global top-k) — so once found, a hit stays
  * found at every larger budget.
  */
class RecallCurveSpec extends SparkTestBase {
  import graft.operators.Similarity.{RecallProbes, NQueries, TopK}

  private lazy val rows =
    graft.operators.Similarity.recallCurve(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("one row per probe budget, hits within bounds, exact ppm arithmetic") {
    assert(rows.map(_._1).toSeq == RecallProbes)
    rows.foreach { case (_, nq, hits, ppm) =>
      assert(nq == NQueries.toLong)
      assert(hits >= 0 && hits <= nq * TopK)
      assert(ppm == (2 * hits * 1000000L + nq * TopK) / (2 * nq * TopK))
    }
  }

  test("recall is monotone non-decreasing in the probe budget") {
    val hits = rows.sortBy(_._1).map(_._3)
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b })
    assert(hits.last > hits.head,
      "widening probes 1 -> 8 must actually recover neighbors on this corpus")
  }
}
