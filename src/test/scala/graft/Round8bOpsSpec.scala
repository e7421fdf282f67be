package graft

import org.apache.spark.sql.functions._

/** Invariants for the second round-8 operator batch beyond their
  * DuckDB oracles.
  */
class Round8bOpsSpec extends SparkTestBase {

  test("charclass census partitions every character and covers every doc") {
    val got = operators.TextAnalysis.charclassCensus(spark, SfDir).collect()
    assert(got.nonEmpty)
    val nDocs = Tables.documents(spark, SfDir).count()
    assert(got.map(_.getAs[Long]("n_docs")).sum == nDocs)
    val ppmCols = Seq("lower_ppm", "upper_ppm", "digit_ppm", "space_ppm",
      "punct_ppm", "other_ppm")
    got.foreach { r =>
      val ppms = ppmCols.map(r.getAs[Long])
      ppms.foreach(p => assert(p >= 0L && p <= 1000000L))
      // six HALF_UP roundings, each off by at most half a ppm
      assert(math.abs(ppms.sum - 1000000L) <= 3L,
        s"class ppms ${ppms.sum} drifted beyond rounding slack")
    }
  }

  test("epoch schedule allocates the half-corpus budget proportionally") {
    val got = operators.Pipeline.epochSchedule(spark, SfDir).collect()
    assert(got.nonEmpty)
    val tokTotal = got.map(_.getAs[Long]("n_tokens")).sum
    val budget = tokTotal / 2
    val wTotal = got.map(_.getAs[Long]("w")).sum
    val targetSum = got.map(_.getAs[Long]("target_tokens")).sum
    // each source's HALF_UP share is off by at most half a token
    assert(math.abs(targetSum - budget) <= (got.length + 1) / 2)
    got.foreach { r =>
      val (w, tok, target) = (r.getAs[Long]("w"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("target_tokens"))
      assert(w >= 1L && w <= 4L)
      assert(target == (2 * budget * w + wTotal) / (2 * wTotal))
      val e = r.getAs[Long]("epochs_x1000")
      assert(e == (2 * 1000 * target + math.max(tok, 1)) / (2 * math.max(tok, 1)))
    }
  }

  test("inactivity churn bands partition the user base with consistent bounds") {
    val got = operators.Events.inactivityChurn(spark, SfDir).collect()
    assert(got.nonEmpty)
    val nUsers = Tables.events(spark, SfDir).select("user_id").distinct().count()
    assert(got.map(_.getAs[Long]("n_users")).sum == nUsers)
    got.foreach { r =>
      val (band, mx) = (r.getAs[String]("band"), r.getAs[Long]("max_days"))
      band match {
        case "active"  => assert(mx >= 0L && mx < 7L)
        case "at_risk" => assert(mx >= 7L && mx < 30L)
        case "churned" => assert(mx >= 30L)
        case other     => fail(s"unknown band $other")
      }
      assert(r.getAs[Long]("sum_days") <= mx * r.getAs[Long]("n_users"))
    }
  }

  test("value histogram counts every coordinate of every vector") {
    val got = operators.Similarity.valueHistogram(spark, SfDir).collect()
    assert(got.nonEmpty)
    val perLabel = Tables.embeddings(spark, SfDir)
      .groupBy("label").agg(count(lit(1)).as("n"), first(size(col("embedding"))).as("dim"))
      .collect().map(r => r.getAs[Int]("label") -> (r.getAs[Long]("n"), r.getAs[Int]("dim")))
      .toMap
    got.groupBy(_.getAs[Int]("label")).foreach { case (label, rs) =>
      val (n, dim) = perLabel(label)
      assert(rs.map(_.getAs[Long]("n")).sum == n * dim,
        s"label $label histogram lost coordinates")
      rs.foreach(r => assert(r.getAs[Long]("bin") >= 0L && r.getAs[Long]("bin") <= 19L))
    }
  }

  test("lateness census counts every event and bands bound their members") {
    val got = operators.Events.latenessCensus(spark, SfDir).collect()
    assert(got.nonEmpty)
    val nEvents = Tables.events(spark, SfDir).count()
    assert(got.map(_.getAs[Long]("n_events")).sum == nEvents)
    // the planted perturbation must populate more than the on-time band
    assert(got.length >= 3, s"lateness census degenerate: ${got.length} bands")
    val bounds = Map("a_on_time" -> (0L, 0L), "b_lt_6h" -> (1L, 21599999L),
      "c_lt_1d" -> (21600000L, 86399999L), "d_lt_3d" -> (86400000L, 259199999L),
      "e_ge_3d" -> (259200000L, Long.MaxValue))
    got.foreach { r =>
      val (lo, hi) = bounds(r.getAs[String]("band"))
      val mx = r.getAs[Long]("max_late_ms")
      assert(mx >= lo && mx <= hi)
      assert(r.getAs[Long]("sum_late_ms") <= mx * r.getAs[Long]("n_events"))
    }
  }

  test("dau/mau stickiness is bounded and replays driver-side") {
    val got = operators.Events.dauMau(spark, SfDir).collect()
    assert(got.nonEmpty)
    // brute-force replay over the raw (day, user) pairs
    val pairs = Tables.events(spark, SfDir)
      .select(expr("unix_millis(ts) div 86400000").as("day"), col("user_id"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byDay = pairs.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    got.foreach { r =>
      val day = r.getAs[Long]("day")
      val dau = byDay(day).size.toLong
      val wau = (day - 6L to day).flatMap(d => byDay.getOrElse(d, Set.empty))
        .toSet.size.toLong
      assert(r.getAs[Long]("dau") == dau && r.getAs[Long]("wau7") == wau)
      // DAU ⊆ WAU window ⇒ ratio in (0, 1]
      val ppm = r.getAs[Long]("stickiness_ppm")
      assert(ppm > 0L && ppm <= 1000000L)
    }
  }

  test("image tiles exactly partition each payload and one doc replays byte-for-byte") {
    val tiles = operators.Multimodal.imageTiles(spark, SfDir)
    val perDoc = tiles.groupBy("doc_id").agg(sum("tile_len").as("covered"))
    val docs = Tables.documents(spark, SfDir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
      .filter(col("n") > 0)
    // non-overlapping tiles with ragged-edge clamping must cover every
    // byte exactly once
    val joined = docs.join(perDoc, Seq("doc_id"), "left")
    assert(joined.filter(col("covered").isNull || col("covered") =!= col("n"))
      .count() == 0)
    // grid bounds
    val t = operators.Multimodal.TileDim
    val w = operators.Multimodal.RowBytes
    assert(tiles.filter(col("tx") < 0 || col("tx") >= w / t).count() == 0)
    // driver-side replay of one real doc's tile set
    val doc = Tables.documents(spark, SfDir).select("doc_id", "text")
      .orderBy("doc_id").head()
    val (id, text) = (doc.getLong(0), doc.getString(1))
    val want = for {
      ty <- 0 to (text.length - 1) / (w * t)
      tx <- 0 until w / t
      tile = (0 until t).map { r =>
        val start = (ty * t + r) * w + tx * t
        if (start >= text.length) ""
        else text.substring(start, math.min(start + t, text.length))
      }.mkString
      if tile.nonEmpty
    } yield ((ty.toLong, tx.toLong), tile.length.toLong)
    val gotDoc = tiles.filter(col("doc_id") === id)
      .select("ty", "tx", "tile_len").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(gotDoc == want.toMap)
  }
}
