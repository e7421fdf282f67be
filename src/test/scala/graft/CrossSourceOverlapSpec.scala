package graft

import org.apache.spark.sql.functions._

/** Property pins for `dd_cross_source_overlap` beyond the oracle
  * hash: pair-domain completeness, the set-overlap bounds, and a
  * driver-side replay of one pair's intersection from the same
  * native NGrams expression.
  */
class CrossSourceOverlapSpec extends SparkTestBase {

  private lazy val out =
    graft.operators.Dedup.crossSourceOverlap(spark, SfDir).collect()

  private lazy val gramSets: Map[String, Set[String]] =
    Tables.documents(spark, SfDir)
      .select(col("source"),
        explode(array_distinct(
          graft.functions.NGrams.ngrams(col("text"), 3))).as("g"))
      .distinct().collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getString(1)).toSet).toMap

  test("every unordered pair of gram-bearing sources appears exactly once") {
    val srcs = gramSets.keySet
    val expected = (for {
      a <- srcs; b <- srcs if a < b
      if (gramSets(a) intersect gramSets(b)).nonEmpty
    } yield (a, b)).toSet
    val got = out.map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == expected)
    assert(got.forall { case (a, b) => a < b })
  }

  test("shared counts are the exact set intersections with HALF_UP containment") {
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (shared, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(na == gramSets(a).size && nb == gramSets(b).size)
      assert(shared == (gramSets(a) intersect gramSets(b)).size.toLong)
      assert(r.getLong(5) == (2 * shared * 1000000L + na) / (2 * na))
      assert(r.getLong(6) == (2 * shared * 1000000L + nb) / (2 * nb))
      assert(shared >= 1 && shared <= math.min(na, nb))
    }
  }
}
