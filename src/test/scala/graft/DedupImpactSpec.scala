package graft

import org.apache.spark.sql.functions._

/** Pins `pipe_dedup_impact` against a driver-side union-find replay
  * of the same pair graph — the oracle hash certifies cross-engine
  * parity; this certifies the census against an independent
  * (non-iterative) component construction.
  */
class DedupImpactSpec extends SparkTestBase {

  test("census equals a driver-side union-find over the jaccard pair graph") {
    val pairs = graft.operators.Dedup.ngramJaccardOn(
        Tables.documents(spark, SfDir).select("doc_id", "source", "text"))
      .select("doc_id_1", "doc_id_2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val removed = members.filter(x => find(x) != x).toSet
    assert(removed.nonEmpty, "corpus must contain near-dup components")

    val docs = Tables.documents(spark, SfDir)
      .select(col("doc_id"), col("source"),
        size(graft.functions.Text.tokens(lower(col("text"))))
          .cast("long").as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = docs.groupBy(_._2).map { case (src, rows) =>
      src -> (rows.length.toLong,
        rows.count(r => removed(r._1)).toLong,
        rows.map(_._3).sum,
        rows.filter(r => removed(r._1)).map(_._3).sum)
    }
    val out = graft.operators.Pipeline.dedupImpact(spark, SfDir).collect()
    assert(out.map(_.getString(0)).toSet == expected.keySet)
    out.foreach { r =>
      val (nd, dr, nt, tr) = expected(r.getString(0))
      assert(r.getLong(1) == nd && r.getLong(2) == dr)
      assert(r.getLong(3) == nt && r.getLong(4) == tr)
      val ppm = if (nt == 0) 0L else (2 * tr * 1000000L + nt) / (2 * nt)
      assert(r.getLong(5) == ppm)
    }
  }
}
