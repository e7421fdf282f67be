package graft

import org.apache.spark.sql.functions._

/** Property pins for `vec_hubness_census`: mass conservation and a
  * driver-side brute-force replay of the reverse-k counts.
  */
class HubnessSpec extends SparkTestBase {
  import graft.operators.Similarity.{HubSample, TopK}

  private lazy val vecs: Array[(Long, Array[Double])] =
    Tables.embeddings(spark, SfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  private lazy val out =
    graft.operators.Similarity.hubnessCensus(spark, SfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hit mass and vector mass are conserved") {
    val n = vecs.length.toLong
    val step = math.max(n / HubSample, 1L)
    val nQueries = vecs.count(_._1 % step == 0).toLong
    assert(out.values.sum == n, "every vector appears in exactly one band")
    assert(out.map { case (h, c) => h * c }.sum == nQueries * TopK,
      "each probe contributes exactly TopK hits")
  }

  test("census equals the driver-side brute-force reverse-k replay") {
    val n = vecs.length.toLong
    val step = math.max(n / HubSample, 1L)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val hits = scala.collection.mutable.Map.empty[Long, Long]
    vecs.filter(_._1 % step == 0).foreach { case (qid, qv) =>
      vecs.filter(_._1 != qid)
        .map { case (id, v) => (cos(qv, v), id) }
        .sortBy { case (s, id) => (-s, id) }
        .take(TopK)
        .foreach { case (_, id) => hits(id) = hits.getOrElse(id, 0L) + 1L }
    }
    val expected = hits.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap +
      (0L -> (n - hits.size))
    assert(out == expected.filter(_._2 > 0))
  }
}
