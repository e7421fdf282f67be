package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{PartialReducerPartitionSpec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

/** Executed-plan telemetry (VERDICT r10 #7): per-query EXCHANGE count
  * and AQE skew-split count read off the EXECUTED physical plan — not
  * the optimized-logical guess — so bench.json's scale claims ("this
  * row runs exchange-free", "AQE absorbed the skew") ride executed
  * numbers. Lives in the spark.sql namespace because the adaptive
  * execution nodes are package-private to it.
  *
  * Counting rules:
  *  - AdaptiveSparkPlanExec / QueryStageExec unwrap to the FINAL plan
  *    (call only after an action, or the counts reflect a partial run);
  *  - ReusedExchangeExec subtrees don't recount — a reused exchange
  *    moves no additional data;
  *  - a skew split is one PartialReducerPartitionSpec in an
  *    AQEShuffleReadExec: the number of extra partial-reduce tasks
  *    AQE minted to break a skewed reducer.
  *
  * Scope: the returned DataFrame's own plan. Iterative operators
  * (fixpoints over checkpointed state) surface only their FINAL
  * rollup here — their per-round shuffles are governed by the §3 loop
  * discipline; streaming drains surface the sink read.
  */
object PlanTelemetry {
  final case class Counts(exchanges: Int, skewSplits: Int)

  /** Executes the DataFrame's OWN QueryExecution (a no-op job over its
    * internal rows) so AdaptiveSparkPlanExec replans through to its
    * FINAL plan, then counts off that. `df.count()` would NOT do:
    * count() wraps df in a fresh aggregate QueryExecution and executes
    * THAT, leaving df's own AQE root un-run (isFinalPlan=false) — `of`
    * would then read the static initial plan: pre-AQE exchange counts
    * and structurally-zero skew splits (ADVICE r11 #1). Note this runs
    * the full plan INCLUDING any top-level sort that count() would let
    * the optimizer elide — the published telemetry describes the
    * operator's whole public contract, which is what we want.
    */
  def executedOf(df: DataFrame): Counts = {
    df.queryExecution.toRdd.foreach(_ => ())
    of(df)
  }

  def of(df: DataFrame): Counts = {
    var ex = 0
    var skew = 0
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _: ReusedExchangeExec => ()
      case s: ShuffleExchangeLike =>
        ex += 1
        s.children.foreach(walk)
      case r: AQEShuffleReadExec =>
        skew += r.partitionSpecs
          .count(_.isInstanceOf[PartialReducerPartitionSpec])
        r.children.foreach(walk)
      case other => other.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    Counts(ex, skew)
  }
}
