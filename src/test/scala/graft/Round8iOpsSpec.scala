package graft

import org.apache.spark.sql.functions._

/** Invariants for the ninth round-8 operator batch beyond their
  * DuckDB oracles.
  */
class Round8iOpsSpec extends SparkTestBase {

  test("edit distance pairs respect the relative cut and symmetry of lengths") {
    val got = operators.Dedup.editDistance(spark, SfDir).collect()
    assert(got.nonEmpty, "the corpus plants near-dup pairs; some must verify")
    got.foreach { r =>
      val (d, ml, ppm) = (r.getAs[Long]("dist"), r.getAs[Long]("max_len"),
        r.getAs[Long]("rel_ppm"))
      assert(d * 5 <= ml, "the 20% relative cut must hold")
      assert(ppm <= 200000L + 1L, "rel_ppm consistent with the cut")
      assert(r.getAs[Long]("n_shared") >= operators.Dedup.EditMinShared)
      assert(r.getAs[Long]("doc_id_1") < r.getAs[Long]("doc_id_2"))
    }
    // spot-check one pair against a driver-side Levenshtein replay
    val r0 = got.head
    val norm = Tables.documents(spark, SfDir)
      .filter(col("doc_id").isin(r0.getAs[Long]("doc_id_1"), r0.getAs[Long]("doc_id_2")))
      .select(graft.functions.Text.normalized(col("text")).as("nt"))
      .collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val t = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(b.length)
    }
    assert(lev(norm(0), norm(1)).toLong == r0.getAs[Long]("dist"))
  }

  test("truss census covers every edge and reconciles with the triangle count") {
    val got = operators.WordCount.trussCensus(spark, SfDir).collect()
    assert(got.nonEmpty)
    // Σ n_edges over all support levels = |E|; Σ support·n_edges = 3T
    val li = Tables.lineitem(spark, SfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val e = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk"), col("b.pk")).agg(count(lit(1)).as("w"))
      .filter(col("w") >= operators.WordCount.TriMinOrders)
    assert(got.map(_.getAs[Long]("n_edges")).sum == e.count())
    val nTri = operators.WordCount.triangleCount(spark, SfDir)
      .collect()(0).getAs[Long]("n_triangles")
    val weighted = got.map(r => r.getAs[Long]("support") * r.getAs[Long]("n_edges")).sum
    assert(weighted == 3 * nTri,
      s"edge-support mass $weighted must equal 3 x $nTri triangles")
  }

  test("constraint audit: synthetic integrity holds, planted FD violation fires") {
    val got = operators.Relational.constraintAudit(spark, SfDir).collect()
      .map(r => r.getAs[String]("constraint_name") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_violations"))).toMap
    assert(got.size == 6)
    // the synthetic star schema is referentially intact
    assert(got("pk_orders_orderkey")._2 == 0L)
    // ...but (l_orderkey, l_linenumber) is NOT unique in the synthetic
    // lineitem — a genuine data finding the audit must surface
    assert(got("pk_lineitem_orderkey_linenumber")._2 > 0L,
      "the synthetic lineitem's duplicate line numbers must be caught")
    assert(got("fk_lineitem_orders")._2 == 0L)
    assert(got("fk_orders_customer")._2 == 0L)
    assert(got("nn_orders_custkey")._2 == 0L)
    // multi-supplier orders exist, so the false FD must fire
    assert(got("fd_orderkey_to_suppkey")._2 > 0L,
      "the audit must be non-degenerate: l_orderkey does not determine l_suppkey")
    assert(got("fd_orderkey_to_suppkey")._2 <= got("fd_orderkey_to_suppkey")._1)
  }
}
