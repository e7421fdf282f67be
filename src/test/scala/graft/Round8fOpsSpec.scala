package graft

import org.apache.spark.sql.functions._

/** Invariants for the sixth round-8 operator batch beyond their
  * DuckDB oracles.
  */
class Round8fOpsSpec extends SparkTestBase {

  test("modularity numerators are exact and reconcile with the graph totals") {
    val got = operators.WordCount.modularity(spark, SfDir).collect()
    assert(got.nonEmpty)
    // rebuild the graph facts independently
    val o = Tables.orders(spark, SfDir).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, SfDir).select("l_orderkey", "l_suppkey")
    val eraw = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"),
        (col("l_suppkey") * 2 + operators.WordCount.SuppParity).as("b"))
      .distinct()
    val m = eraw.count()
    // Σ d_c = 2m (degrees partition), Σ e_c <= m
    assert(got.map(_.getAs[Long]("degree_sum")).sum == 2 * m)
    assert(got.map(_.getAs[Long]("internal_edges")).sum <= m)
    got.foreach { r =>
      val (e, d, num) = (r.getAs[Long]("internal_edges"),
        r.getAs[Long]("degree_sum"), r.getAs[Long]("mod_num"))
      assert(num == 4 * m * e - d * d, "numerator identity must hold exactly")
      assert(e <= m && d >= r.getAs[Long]("n_nodes"),
        "internal edges bounded by m; every node has degree >= 1")
    }
    // Q = Σ num / 4m² must sit in the valid modularity range [-0.5, 1).
    // The lower bound is ATTAINED here: LPA on a bipartite graph
    // oscillates onto the two sides (zero internal edges), the
    // worst-possible partition — exactly what this op is for exposing.
    val q = got.map(_.getAs[Long]("mod_num")).sum.toDouble / (4.0 * m * m)
    assert(q >= -0.5 && q < 1.0, s"modularity $q outside [-0.5, 1)")
  }

  test("random walks visit valid neighbors at every step for every seed") {
    val visits = operators.WordCount.randomWalks(spark, SfDir).collect()
    assert(visits.nonEmpty)
    val bySeed = visits.groupBy(_.getAs[Long]("walk_id"))
    val steps = operators.WordCount.WalkSteps
    // every walk is complete: steps 0..K, each exactly once
    bySeed.foreach { case (seed, rows) =>
      assert(rows.map(_.getAs[Long]("step")).sorted.toSeq ==
        (0L to steps.toLong).toSeq, s"walk $seed has missing steps")
      assert(seed % operators.WordCount.WalkSeedMod == 0L)
      val byStep = rows.map(r => r.getAs[Long]("step") -> r.getAs[Long]("node")).toMap
      assert(byStep(0L) == seed, "walks start at their seed")
    }
    // consecutive visits are edges of the bipartite graph
    val o = Tables.orders(spark, SfDir).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, SfDir).select("l_orderkey", "l_suppkey")
    val edges = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"),
        (col("l_suppkey") * 2 + operators.WordCount.SuppParity).as("b"))
      .distinct().collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSet
    bySeed.foreach { case (seed, rows) =>
      val byStep = rows.map(r => r.getAs[Long]("step") -> r.getAs[Long]("node")).toMap
      (1 to steps).foreach { i =>
        assert(edges.contains((byStep(i - 1L), byStep(i.toLong))),
          s"walk $seed step $i is not an edge")
      }
    }
  }

  test("cusum drift is exact against a driver-side replay of the hour grid") {
    val got = operators.Events.cusumChangepoints(spark, SfDir).collect()
    assert(got.length == operators.Events.CusumTopK)
    val grid = Tables.events(spark, SfDir)
      .groupBy(expr("unix_millis(ts) div 3600000").as("hour"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => r.getAs[Long]("hour") -> r.getAs[Long]("cnt")).sortBy(_._1)
    val n = grid.length.toLong
    val t = grid.map(_._2).sum
    var cum = 0L
    val drift = grid.zipWithIndex.map { case ((h, c), i) =>
      cum += c; h -> (n * cum - (i + 1) * t)
    }.toMap
    got.foreach { r =>
      assert(drift(r.getAs[Long]("hour")) == r.getAs[Long]("drift_xn"))
    }
    // top-k really is top-k by |drift|
    val kth = got.map(r => math.abs(r.getAs[Long]("drift_xn"))).min
    val better = drift.values.count(v => math.abs(v) > kth)
    assert(better < operators.Events.CusumTopK)
  }

  test("rag chunk census matches a per-doc sliding-window replay") {
    val got = operators.Pipeline.ragChunks(spark, SfDir).collect()
    val (c, s) = (operators.Pipeline.RagChunkChars, operators.Pipeline.RagStrideChars)
    val docs = Tables.documents(spark, SfDir).select("source", "n_chars").collect()
    val expect = docs.groupBy(_.getAs[String]("source")).map { case (src, rows) =>
      var (nc, scc) = (0L, 0L)
      rows.foreach { r =>
        val len = r.getAs[Long]("n_chars")
        // replay the actual window walk, not the closed form: emit a
        // chunk, stop once it reaches the end, else advance by stride
        var (start, k, tot, done) = (0L, 0L, 0L, false)
        while (!done) {
          tot += math.min(c, len - start); k += 1
          if (start + c >= len) done = true else start += s
        }
        nc += k; scc += tot
      }
      src -> ((nc, scc))
    }
    got.foreach { r =>
      val (nc, scc) = expect(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_chunks") == nc, s"chunk count ${r.getAs[Long]("n_chunks")} != replay $nc")
      assert(r.getAs[Long]("sum_chunk_chars") == scc)
      assert(r.getAs[Long]("overlap_ppm") >= 0L && r.getAs[Long]("overlap_ppm") < 1000000L)
    }
  }
}
