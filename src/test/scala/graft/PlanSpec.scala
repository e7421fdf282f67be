package graft

import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical._

/** Scale-invariant gate over EVERY registry query's optimized plan —
  * the shapes that killed 100-TB viability in round 1 (corpus-wide
  * ordered windows, unhinted cartesians) must never reappear:
  *
  *  1. a `Window` with an empty partitionSpec (global sort of its
  *     input) may only run over an already-aggregated, i.e. reduced,
  *     subtree — never over a base-table scan;
  *  2. a join with no condition (cartesian shape) must carry a
  *     broadcast hint on one side — a shuffled cartesian product is
  *     never acceptable;
  *  3. no Limit may feed a join from below (a collect-limit pattern
  *     that serializes through the driver).
  */
class PlanSpec extends SparkTestBase {

  test("every registry query plan honors the scale invariants") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, SfDir).queryExecution.optimizedPlan
      plan.foreach {
        case w: Window if w.partitionSpec.isEmpty =>
          val reduced = w.child.collectFirst { case a: Aggregate => a }.isDefined
          if (!reduced)
            offenders += s"$name: unpartitioned Window over non-aggregated input"
        case j: Join =>
          if (j.condition.isEmpty || j.joinType == Cross) {
            val hinted = j.hint.leftHint.exists(_.strategy.isDefined) ||
              j.hint.rightHint.exists(_.strategy.isDefined)
            if (!hinted)
              offenders += s"$name: cartesian join without a broadcast hint"
          }
          if (j.children.exists(_.collectFirst { case l: GlobalLimit => l }.isDefined))
            offenders += s"$name: Limit feeding a join"
        case _ =>
      }
    }
    assert(offenders.isEmpty, "scale invariants violated:\n" + offenders.mkString("\n"))
  }
}
