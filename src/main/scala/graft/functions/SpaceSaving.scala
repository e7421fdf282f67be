package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SpaceSaving heavy-hitters summary (Metwally et al.) as a typed,
  * MERGEABLE Aggregator — the bounded-memory form of word count.
  *
  * Scale rationale: exact token counting shuffles one row per distinct
  * token; at 100 TB the long tail of near-unique tokens dominates that
  * exchange even though only the head matters. SpaceSaving keeps a
  * fixed `capacity`-entry summary PER PARTITION (partial aggregation),
  * so the shuffle carries capacity·partitions rows total, independent
  * of both corpus size and vocabulary size.
  *
  * Each entry tracks an upper bound `ub` and a max overestimate `err`:
  * the true count is always within [ub − err, ub]. Inserting over a
  * full summary evicts the min-ub entry m and admits the newcomer as
  * (ub = m.ub + w, err = m.ub) — the newcomer can have occurred at
  * most m.ub times before. Merging sums ub/err for shared keys, charges
  * keys missing from the other side that side's worst-case min (its
  * eviction floor — 0 if it never evicted, i.e. it saw its keys
  * exactly), then re-prunes to capacity: the mergeable-summaries
  * construction, error bounds add. All entries keep
  * true ≤ ub ≤ true + Σ floors, so any key with true count above the
  * summed floor is guaranteed present.
  *
  * NONDETERMINISM NOTE: merge is commutative but not associative once
  * pruning kicks in, and Spark's final no-key aggregate combines
  * partials in shuffle-fetch order — so ub/err values (and, near the
  * cutoff, the top-k composition) may vary run to run. Every
  * guarantee above holds for ANY merge order; consumers must treat
  * the output as a bound-carrying summary, not a stable artifact:
  * specs assert only order-invariant facts (bound brackets,
  * exact-degeneration), the registry row is rows-only by design, and
  * its outputs must never be diffed byte-for-byte across runs.
  */
case class SSEntry(token: String, ub: Long, err: Long)
case class SSBuf(entries: Seq[SSEntry], evicted: Boolean)

class SpaceSavingAgg(capacity: Int)
    extends Aggregator[String, SSBuf, Seq[SSEntry]] {

  override def zero: SSBuf = SSBuf(Vector.empty, evicted = false)

  private def floor(b: SSBuf): Long =
    if (!b.evicted || b.entries.isEmpty) 0L else b.entries.map(_.ub).min

  override def reduce(b: SSBuf, token: String): SSBuf = {
    val i = b.entries.indexWhere(_.token == token)
    if (i >= 0) {
      val e = b.entries(i)
      SSBuf(b.entries.updated(i, e.copy(ub = e.ub + 1)), b.evicted)
    } else if (b.entries.length < capacity) {
      SSBuf(b.entries :+ SSEntry(token, 1L, 0L), b.evicted)
    } else {
      val mi = b.entries.zipWithIndex.minBy { case (e, _) => (e.ub, e.token) }._2
      val m = b.entries(mi)
      SSBuf(b.entries.updated(mi, SSEntry(token, m.ub + 1, m.ub)), evicted = true)
    }
  }

  override def merge(b1: SSBuf, b2: SSBuf): SSBuf = {
    val f1 = floor(b1)
    val f2 = floor(b2)
    val m1 = b1.entries.map(e => e.token -> e).toMap
    val m2 = b2.entries.map(e => e.token -> e).toMap
    val merged = (m1.keySet ++ m2.keySet).toSeq.map { t =>
      (m1.get(t), m2.get(t)) match {
        case (Some(a), Some(b)) => SSEntry(t, a.ub + b.ub, a.err + b.err)
        case (Some(a), None)    => SSEntry(t, a.ub + f2, a.err + f2)
        case (None, Some(b))    => SSEntry(t, b.ub + f1, b.err + f1)
        case (None, None)       => throw new IllegalStateException("unreachable")
      }
    }
    val kept = merged.sortBy(e => (-e.ub, e.token)).take(capacity)
    SSBuf(kept, b1.evicted || b2.evicted || merged.length > capacity)
  }

  override def finish(b: SSBuf): Seq[SSEntry] =
    b.entries.sortBy(e => (-e.ub, e.token))

  override def bufferEncoder: Encoder[SSBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[SSBuf]()
  override def outputEncoder: Encoder[Seq[SSEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SSEntry]]()
}

object SpaceSaving {
  /** Column-API UDAF: `space_saving(capacity)(tokenCol)` →
    * array<struct<token,ub,err>>, ub-descending.
    */
  def spaceSaving(capacity: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new SpaceSavingAgg(capacity), Encoders.STRING)
}
