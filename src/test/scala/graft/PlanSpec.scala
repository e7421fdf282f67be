package graft

import org.apache.spark.sql.catalyst.expressions._
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
  *     that serializes through the driver);
  *  4. a rank filter over a Window whose EVERY partition key is
  *     statically bounded to a tiny literal domain (e.g. q_id < 5)
  *     funnels the window's whole input into that many tasks — only
  *     legal when the input was already reduced by an aggregation or
  *     an earlier (salted) window below it.
  */
class PlanSpec extends SparkTestBase {

  /** Strip casts: `cast(rank as bigint) <= 10` still bounds rank. */
  private def unwrap(e: Expression): Expression = e match {
    case c: Cast => unwrap(c.child)
    case x => x
  }

  private def isRankFn(e: Expression): Boolean = e.exists {
    case WindowExpression(f, _) =>
      f.isInstanceOf[RowNumber] || f.isInstanceOf[Rank] || f.isInstanceOf[DenseRank]
    case _ => false
  }

  /** Attribute is statically confined to ≤ ~1024 values by a
    * propagated constraint (`a < lit`, `a <= lit`, `a = lit`).
    */
  private def tinyDomain(a: Attribute, child: LogicalPlan): Boolean =
    child.constraints.exists {
      case LessThan(x: AttributeReference, Literal(v: Number, _)) =>
        x.exprId == a.exprId && v.longValue <= 1024
      case LessThanOrEqual(x: AttributeReference, Literal(v: Number, _)) =>
        x.exprId == a.exprId && v.longValue <= 1024
      case EqualTo(x: AttributeReference, _: Literal) => x.exprId == a.exprId
      case _ => false
    }

  /** Rule-4 offenders in one optimized plan. */
  private def tinyTopkOffenders(plan: LogicalPlan): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    plan.foreach {
      case Filter(cond, w: Window) =>
        val boundedIds: Set[ExprId] = {
          val ids = scala.collection.mutable.Set.empty[ExprId]
          cond.foreach {
            case LessThanOrEqual(l, _: Literal) => unwrap(l) match {
              case a: AttributeReference => ids += a.exprId
              case _ =>
            }
            case LessThan(l, _: Literal) => unwrap(l) match {
              case a: AttributeReference => ids += a.exprId
              case _ =>
            }
            case _ =>
          }
          ids.toSet
        }
        val rankIds = w.windowExpressions.collect {
          case a: Alias if isRankFn(a.child) => a.exprId
        }.toSet
        val isTopkFilter = boundedIds.intersect(rankIds).nonEmpty
        val allPartitionsTiny = w.partitionSpec.nonEmpty && w.partitionSpec.forall {
          case a: AttributeReference => tinyDomain(a, w.child)
          case _ => false
        }
        val reduced = w.child.collectFirst {
          case p if p.isInstanceOf[Aggregate] || p.isInstanceOf[Window] => p
        }.isDefined
        if (isTopkFilter && allPartitionsTiny && !reduced)
          out += "top-k rank filter over a tiny-domain-partition Window on unreduced input"
      case _ =>
    }
    out.toSeq
  }

  /** Queries allowed an unpartitioned Window, each required to sit
    * over an aggregate whose grouping key is CONF-bounded (a knob, not
    * data): an aggregate alone is NOT enough — a vocabulary groupBy is
    * also an aggregate, yet scales with the corpus (the round-6
    * tokenize_to_ids hole this gate now closes). Currently EMPTY: the
    * two former holders (pack_sequences shard totals, tokenize vocab
    * bands) both compute their prefix sums as broadcast theta-joins
    * over the tiny totals instead, so no registry plan carries a
    * single-partition WindowExec at all.
    */
  private val BoundedGlobalWindows: Set[String] = Set.empty

  test("every registry query plan honors the scale invariants") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, SfDir).queryExecution.optimizedPlan
      plan.foreach {
        case w: Window if w.partitionSpec.isEmpty =>
          val reduced = w.child.collectFirst { case a: Aggregate => a }.isDefined
          if (!BoundedGlobalWindows.contains(name))
            offenders += s"$name: unpartitioned Window (not in the bounded whitelist)"
          else if (!reduced)
            offenders += s"$name: whitelisted global window lost its aggregate input"
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
      tinyTopkOffenders(plan).foreach(o => offenders += s"$name: $o")
    }
    assert(offenders.isEmpty, "scale invariants violated:\n" + offenders.mkString("\n"))
  }

  test("the tiny-domain top-k window gate actually fires (positive control)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // The round-3 ann_bruteforce_topk shape: rank over partitionBy of a
    // column constrained to < 5, straight off the scan join.
    val e = Tables.embeddings(spark, SfDir)
      .select(col("vec_id"), element_at(col("embedding"), 1).as("s"))
    val q = e.filter(col("vec_id") < 5).select(col("vec_id").as("q_id"))
    val w = Window.partitionBy("q_id").orderBy(desc("s"), asc("vec_id"))
    val bad = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
    assert(tinyTopkOffenders(bad.queryExecution.optimizedPlan).nonEmpty,
      "gate failed to flag the known-bad tiny-partition top-k window")
  }
}
