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

  test("hits scores are L-inf normalized on a strictly bipartite node split") {
    val got = operators.WordCount.hits(spark, SfDir).collect()
    assert(got.nonEmpty)
    val bySide = got.groupBy(_.getAs[String]("side"))
    assert(bySide.keySet == Set("auth", "hub"))
    bySide.foreach { case (side, rs) =>
      assert(rs.length <= 50)
      val scores = rs.map(_.getAs[Double]("score"))
      // max normalization puts the top node at exactly 1.0 each side
      assert(scores.max == 1.0)
      scores.foreach(sc => assert(sc > 0.0 && sc <= 1.0))
      rs.foreach { r =>
        val n = r.getAs[Long]("node")
        // parity encoding: suppliers (auth side) odd, customers even
        if (side == "auth") assert(n % 2 == operators.WordCount.SuppParity)
        else assert(n % 2 == 0)
      }
    }
  }

  test("js divergence covers every source pair and one pair replays driver-side") {
    val got = operators.TextAnalysis.jsDivergence(spark, SfDir).collect()
    val nSources = Tables.documents(spark, SfDir)
      .select("source").distinct().count().toInt
    assert(got.length == nSources * (nSources - 1) / 2)
    got.foreach { r =>
      val j = r.getAs[Double]("jsd")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[String]("s1") < r.getAs[String]("s2"))
    }
    // brute-force one pair from raw token streams
    val (s1, s2) = (got.head.getAs[String]("s1"), got.head.getAs[String]("s2"))
    def dist(src: String): Map[String, Double] = {
      val toks = Tables.documents(spark, SfDir)
        .filter(col("source") === src)
        .select(explode(graft.functions.Text.tokens(lower(col("text")))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c")).collect()
        .map(r => r.getString(0) -> r.getLong(1).toDouble)
      val t = toks.map(_._2).sum
      toks.map { case (w, c) => w -> c / t }.toMap
    }
    val (p, q) = (dist(s1), dist(s2))
    val want = (p.keySet ++ q.keySet).toSeq.map { w =>
      val (pw, qw) = (p.getOrElse(w, 0.0), q.getOrElse(w, 0.0))
      val t = pw + qw
      (if (pw > 0) 0.5 * pw * (math.log(2 * pw / t) / math.log(2)) else 0.0) +
        (if (qw > 0) 0.5 * qw * (math.log(2 * qw / t) / math.log(2)) else 0.0)
    }.sum
    assert(math.abs(got.head.getAs[Double]("jsd") - want) < 1e-5)
  }

  test("cohort ltv curves accumulate to each cohort's total spend") {
    val got = operators.Events.cohortLtv(spark, SfDir).collect()
    assert(got.nonEmpty)
    val byCohort = got.groupBy(_.getAs[Long]("cohort_day"))
    byCohort.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("age"))
      // cum_cents is exactly the prefix sum of the per-age cents
      var acc = 0L
      sorted.foreach { r =>
        acc += r.getAs[Long]("cents")
        assert(r.getAs[Long]("cum_cents") == acc)
      }
    }
    // every event lands in exactly one (cohort, age) cell
    val wantCents = Tables.events(spark, SfDir)
      .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))).head().getLong(0)
    assert(got.map(_.getAs[Long]("cents")).sum == wantCents)
  }

  test("temperature sampling flattens the mixture toward small sources") {
    val got = operators.Pipeline.mixtureTemperature(spark, SfDir).collect()
    assert(got.nonEmpty)
    val tempSum = got.map(_.getAs[Long]("temp_ppm")).sum
    assert(math.abs(tempSum - 1000000L) <= (got.length + 1) / 2)
    val byTok = got.sortBy(_.getAs[Long]("n_tokens"))
    // τ=1/2 up-weights the smallest source and down-weights the largest
    assert(byTok.head.getAs[Long]("temp_ppm") >= byTok.head.getAs[Long]("flat_ppm"))
    assert(byTok.last.getAs[Long]("temp_ppm") <= byTok.last.getAs[Long]("flat_ppm"))
  }

  test("z-order layout dominates lexicographic on non-sort-dimension probes") {
    val got = operators.Relational.relSkippingStats(spark, SfDir).collect()
    assert(got.length == operators.Relational.SkipProbes * 2)
    val byProbe = got.groupBy(_.getAs[Long]("probe"))
    var zRows = 0L; var lexRows = 0L
    byProbe.foreach { case (_, rs) =>
      val z = rs.find(_.getAs[String]("layout") == "z").get
      val lex = rs.find(_.getAs[String]("layout") == "lex").get
      Seq(z, lex).foreach { r =>
        assert(r.getAs[Long]("buckets_scanned") <= r.getAs[Long]("n_buckets"))
        val ppm = r.getAs[Long]("prune_ppm")
        assert(ppm >= 0L && ppm <= 1000000L)
      }
      zRows += z.getAs[Long]("rows_scanned")
      lexRows += lex.getAs[Long]("rows_scanned")
    }
    // the point of the operator: across the probe set, z-order's
    // rectangular buckets scan far fewer rows than the partkey sort
    assert(zRows < lexRows,
      s"z-order scanned $zRows rows vs lex $lexRows — layout advantage lost")
  }

  test("long-doc split windows tile every token stream with exact overlap") {
    val got = operators.Pipeline.longDocSplit(spark, SfDir).collect()
    assert(got.nonEmpty)
    val (w, s) = (operators.Pipeline.SplitWin, operators.Pipeline.SplitStride)
    val nToks = Tables.documents(spark, SfDir)
      .select(col("doc_id"),
        size(graft.functions.Text.tokens(lower(col("text")))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      val n = nToks(id)
      val wantChunks = math.max(n - w + s - 1, 0L) / s + 1
      assert(rs.length == wantChunks)
      rs.foreach { r =>
        val start = r.getAs[Long]("start_tok")
        assert(start == r.getAs[Long]("chunk_idx") * s)
        assert(r.getAs[Long]("n_tok") == math.min(w.toLong, n - start))
      }
      // the final window reaches the end of the stream
      assert(rs.map(r => r.getAs[Long]("start_tok") + r.getAs[Long]("n_tok")).max == n)
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
