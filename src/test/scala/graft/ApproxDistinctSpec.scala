package graft

import org.apache.spark.sql.Row

/** VERDICT r9 #4 done-gate: `graft.distinct.approx=true` must
  * actually swap the exact distincts for HLL in the five census
  * queries, the approx answers must sit inside the 3σ rsd bracket of
  * the exact ones, and the default path must be byte-identical to
  * before (it stays the oracle-checked plan).
  */
class ApproxDistinctSpec extends SparkTestBase {

  private val Targets = Seq(
    ("ev_dau_mau", "dau"),
    ("ev_sliding_active", "n_users"),
    ("pipe_dataset_card", "n_uniq_texts"),
    ("pipe_dup_rate_by_source", "n_unique"),
    ("mm_dedup_lift", "n_payloads"))

  private def run(name: String, col: String): Map[String, Long] = {
    val df = SparkEntry.queries(name)(spark, SfDir)
    val keyCols = df.columns.take(1)
    df.select(keyCols.head, col).collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
  }

  test("approx mode brackets exact within 3 sigma of the HLL rsd") {
    val exact = Targets.map { case (q, c) => (q, c) -> run(q, c) }.toMap
    spark.conf.set("graft.distinct.approx", "true")
    try {
      Targets.foreach { case (q, c) =>
        val approx = run(q, c)
        val ex = exact((q, c))
        assert(approx.keySet == ex.keySet, s"$q: key sets diverged")
        approx.foreach { case (k, a) =>
          val e = ex(k)
          val tol = math.max(3.0 * graft.functions.Approx.Rsd * e, 2.0)
          assert(math.abs(a - e) <= tol,
            s"$q[$k].$c: approx $a vs exact $e exceeds 3σ ($tol)")
        }
      }
    } finally spark.conf.unset("graft.distinct.approx")
    // default restored: the exact plan is back and yields the same rows
    Targets.foreach { case (q, c) =>
      assert(run(q, c) == exact((q, c)), s"$q: default path changed")
    }
  }
}
