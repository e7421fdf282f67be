package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k by score as a typed Aggregator.
  *
  * Scale rationale: per-group top-k via `row_number().over(window)`
  * must shuffle and sort EVERY scored row; this aggregator reduces
  * each map partition to ≤ k rows before the exchange (partial
  * aggregation), so the shuffle carries k·partitions rows instead of
  * the whole candidate set — the difference between feasible and not
  * at corpus scale. Deterministic: ties broken by ascending id.
  */
case class ScoredId(score: Double, id: Long)

class TopKByScore(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private val ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.score, s.id))

  private def trim(xs: Seq[ScoredId]): Seq[ScoredId] =
    if (xs.length <= k) xs else xs.sorted(ord).take(k)

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] = {
    val appended = b :+ a
    // amortize: only re-sort when the buffer doubles past k
    if (appended.length >= 2 * k) trim(appended) else appended
  }

  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    trim(b1 ++ b2)

  override def finish(b: Seq[ScoredId]): Seq[ScoredId] = b.sorted(ord).take(k)

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}

object TopK {
  /** Column-API UDAF: `top_k_by_score(k)(scoreCol, idCol)` →
    * array<struct<score,id>> of the k best, score-descending.
    */
  def topKByScore(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKByScore(k), Encoders.product[ScoredId])
}
