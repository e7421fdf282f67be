package graft

import org.apache.spark.sql.functions._

/** Property pins for `mm_dedup_lift`: the lift inequality chain and
  * consistency with the standalone exact/perceptual censuses.
  */
class DedupLiftSpec extends SparkTestBase {

  test("surpluses nest: exact <= phash, lift = difference, scope matches phash") {
    val out = graft.operators.Multimodal.dedupLift(spark, SfDir).collect()
    assert(out.nonEmpty)
    val phash = graft.operators.Multimodal.phashDedup(spark, SfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.foreach { r =>
      val (kind, n, ex, ph, lift, ppm) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(ex >= 0 && ph >= ex, s"$kind: phash surplus must cover exact")
      assert(lift == ph - ex && lift >= 0)
      assert(ppm == (2 * lift * 1000000L + n) / (2 * n))
      // same population and bucket structure as the standalone census
      val (np, nsig) = phash(kind)
      assert(n == np && n - ph == nsig)
    }
  }
}
