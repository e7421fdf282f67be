package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{approx_count_distinct, count_distinct}

/** Conf-switched distinct counting (VERDICT r9 #4 — the
  * `graft.checkpoint.dir` precedent): the exact distincts in the
  * census queries (`ev_sliding_active`, `ev_dau_mau`,
  * `pipe_dataset_card`, `pipe_dup_rate_by_source`, `mm_dedup_lift`)
  * are the oracle-checkable DEFAULT; setting the Spark conf
  * `graft.distinct.approx=true` swaps every one of them to
  * `approx_count_distinct` (HyperLogLog++, rsd = `Rsd`) — the 100 TB
  * plan when per-group distinct keys stop fitting the exchange. The
  * swap changes only the aggregate function, never the plan shape
  * around it, so the prose "HLL at scale" claim is now a code path
  * ApproxDistinctSpec runs both ways.
  */
object Approx {
  /** HLL++ relative standard deviation for the approx path. */
  val Rsd = 0.05

  def distinctCountOf(spark: SparkSession, c: Column): Column =
    if (spark.conf.get("graft.distinct.approx", "false").toBoolean)
      approx_count_distinct(c, Rsd)
    else count_distinct(c)
}
