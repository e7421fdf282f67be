package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-8 operators beyond their DuckDB oracles. */
class Round8OpsSpec extends SparkTestBase {

  test("markov transition rows are a stochastic matrix over the event stream") {
    val got = operators.Events.markovTransitions(spark, SfDir)
    val rows = got.collect()
    assert(rows.nonEmpty)
    // each user's n-event stream contributes exactly n-1 transitions
    val perUser = Tables.events(spark, SfDir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val wantTrans = perUser.agg(sum(col("n") - 1)).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_trans")).sum == wantTrans)
    // per from_type: counts sum to the row total, and HALF_UP ppm
    // probabilities sum to 10^6 within half-a-ppm-per-cell rounding
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (_, rs) =>
      val nFrom = rs.head.getAs[Long]("n_from")
      assert(rs.map(_.getAs[Long]("n_trans")).sum == nFrom)
      val ppmSum = rs.map(_.getAs[Long]("prob_ppm")).sum
      assert(math.abs(ppmSum - 1000000L) <= rs.length / 2 + 1,
        s"ppm sum $ppmSum drifted beyond rounding slack")
    }
  }

  test("common-neighbor candidates are non-edges with correct Jaccard bounds") {
    val got = operators.WordCount.commonNeighbors(spark, SfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (cn, da, db) = (r.getAs[Long]("cn"), r.getAs[Long]("da"),
        r.getAs[Long]("db"))
      // the hub filter really ran, intersection can't exceed a side,
      // and Jaccard stays a valid [0, 1] ppm fraction
      assert(da <= operators.WordCount.CnDegCap &&
        db <= operators.WordCount.CnDegCap)
      assert(cn >= 1L && cn <= math.min(da, db))
      val ppm = r.getAs[Long]("jaccard_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
    }
  }

  test("padding census bands tile the corpus and batch math is exact") {
    val got = operators.Pipeline.paddingCensus(spark, SfDir).collect()
    assert(got.nonEmpty)
    val nDocs = Tables.documents(spark, SfDir).count()
    assert(got.map(_.getAs[Long]("n_docs")).sum == nDocs)
    got.foreach { r =>
      val band = r.getAs[Long]("band_tokens")
      val (docs, batches) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_batches"))
      assert(band > 0 && band % operators.Pipeline.PadBlock == 0)
      assert(batches == (docs + operators.Pipeline.PadBatch - 1) /
        operators.Pipeline.PadBatch)
      assert(r.getAs[Long]("real_tokens") <= r.getAs[Long]("padded_tokens"))
    }
  }

  test("audio windows overlap correctly and cover every decoded sample") {
    // decoded-domain closed forms (the WAV synthesizer's rules):
    // n samples = 256 + (id%5)·64, sample rate = 8000 + (id%3)·4000
    val docs = Tables.documents(spark, SfDir)
      .select(col("doc_id")).filter(col("doc_id") % 4 === 1)
      .collect().map(_.getLong(0))
      .map(id => id -> (256L + (id % 5) * 64L, 8000L + (id % 3) * 4000L))
      .toMap
    val wins = operators.Multimodal.audioWindows(spark, SfDir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(wins.keySet == docs.keySet)
    val (w, h) = (operators.Multimodal.WinSamples.toLong,
      operators.Multimodal.HopSamples.toLong)
    wins.foreach { case (id, rs) =>
      val (n, sr) = docs(id)
      val wantCount = if (n <= w) 1L else 1L + (n - w + h - 1) / h
      assert(rs.length == wantCount, s"doc $id: ${rs.length} != $wantCount")
      val sorted = rs.sortBy(_.getAs[Long]("win_idx"))
      sorted.foreach { r =>
        val start = r.getAs[Long]("start_sample")
        assert(start == r.getAs[Long]("win_idx") * h)
        assert(r.getAs[Long]("start_ms") == start * 1000 / sr)
        assert(r.getAs[Long]("win_len") == math.min(w, n - start))
        // decoded-sample window stats match the synthesizer closed form
        val len = r.getAs[Long]("win_len")
        val samples = (start until start + len)
          .map(i => ((id * 37L + i * 11L) % 2001L) - 1000L)
        assert(r.getAs[Long]("s_sum") == samples.sum)
        assert(r.getAs[Long]("s_peak") == samples.map(math.abs).max)
      }
      // full coverage: the last window reaches the decoded stream end
      val last = sorted.last
      assert(last.getAs[Long]("start_sample") + last.getAs[Long]("win_len") == n)
    }
  }

  test("matryoshka census fractions are monotone and saturate at full dim") {
    val rows = operators.Similarity.matryoshkaCensus(spark, SfDir).collect()
    assert(rows.nonEmpty)
    // the expected ladder comes from the corpus's own width through
    // the SAME rule the census uses — a pinned {8,16,32,64} constant
    // silently decoupled on non-64-dim corpora (ADVICE r13 #1)
    val dim = Tables.embeddings(spark, SfDir)
      .select(size(col("embedding"))).head().getInt(0)
    val ladder = operators.Similarity.mrlLadder(dim).map(_.toLong)
    rows.groupBy(_.getAs[Int]("label")).foreach { case (_, rs) =>
      val byPrefix = rs.sortBy(_.getAs[Long]("prefix_dim"))
      assert(byPrefix.map(_.getAs[Long]("prefix_dim")).toSeq == ladder)
      // energy can only grow with a longer prefix, per min/avg/max
      for (c <- Seq("avg_frac_ppm", "min_frac_ppm", "max_frac_ppm")) {
        val v = byPrefix.map(_.getAs[Long](c))
        assert(v.zip(v.tail).forall { case (a, b) => a <= b }, s"$c not monotone")
      }
      // the full prefix retains everything, exactly
      val full = byPrefix.last
      assert(full.getAs[Long]("min_frac_ppm") == 1000000L &&
        full.getAs[Long]("max_frac_ppm") == 1000000L)
      byPrefix.foreach { r =>
        assert(r.getAs[Long]("min_frac_ppm") >= 0L &&
          r.getAs[Long]("max_frac_ppm") <= 1000000L)
      }
    }
  }

  test("sliding active windows double-count events and the heatmap tiles them") {
    val total = Tables.events(spark, SfDir).count()
    val sliding = operators.Events.slidingActive(spark, SfDir).collect()
    // 2h window / 1h slide: every event lands in exactly two windows
    assert(sliding.map(_.getAs[Long]("n_events")).sum == 2 * total)
    sliding.foreach(r =>
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_events")))
    val heat = operators.Events.heatmap(spark, SfDir).collect()
    assert(heat.map(_.getAs[Long]("n_events")).sum == total)
    heat.foreach { r =>
      val (dow, hour) = (r.getAs[Long]("dow"), r.getAs[Long]("hour"))
      assert(dow >= 0 && dow <= 6 && hour >= 0 && hour <= 23)
    }
    // integer-epoch anchor: 1970-01-01 (epoch day 0) was a Thursday=4
    import spark.implicits._
    val anchor = Seq(0L).toDF("ms").select(expr("((ms div 86400000) + 4) % 7"))
      .head().getLong(0)
    assert(anchor == 4L)
  }

  test("assortativity is a valid correlation over the symmetrized edges") {
    val r = operators.WordCount.assortativity(spark, SfDir).head()
    val (e, _, _) = {
      // m must equal twice the undirected edge count
      val df = Tables.lineitem(spark, SfDir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      val edges = df.as("a").join(df.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk"), col("b.pk")).agg(count(lit(1)).as("w"))
        .filter(col("w") >= operators.WordCount.TriMinOrders)
      (edges.count(), (), ())
    }
    assert(r.getAs[Long]("m") == 2 * e)
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 && a <= 1.0)
  }

  test("quality-score bands tile the corpus with scores inside band bounds") {
    val rows = operators.Pipeline.qualityScore(spark, SfDir).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, SfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    val (bw, off) = (operators.Pipeline.QsBand, operators.Pipeline.QsOffset)
    rows.foreach { r =>
      val b = r.getAs[Long]("band")
      val (lo, hi) = (b * bw - off, (b + 1) * bw - off)
      assert(r.getAs[Long]("min_score") >= lo &&
        r.getAs[Long]("max_score") < hi &&
        r.getAs[Long]("min_score") <= r.getAs[Long]("max_score"))
    }
  }

  test("per-source dup rates partition the corpus and bound the ppm") {
    val rows = operators.Pipeline.dupRateBySource(spark, SfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, SfDir).count())
    rows.foreach { r =>
      val (n, u) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_unique"))
      assert(u >= 1L && u <= n)
      val ppm = r.getAs[Long]("dup_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
      // exact identity, not just a bound: ppm is HALF_UP((n-u)/n)
      assert(ppm == (2 * (n - u) * 1000000L + n) / (2 * n))
    }
  }

  test("the §4 HALF_UP identity equals BigDecimal HALF_UP for random fractions") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // the identity every ppm column in the registry rides on:
    // ⌈p·s/q⌋ (round-half-up) == (2·p·s + q) div (2·q), p ≥ 0, q ≥ 1
    val gen = for {
      p <- Gen.chooseNum(0L, 4000000L)
      q <- Gen.chooseNum(1L, 4000000L)
      s <- Gen.oneOf(100L, 1000L, 1000000L)
    } yield (p, q, s)
    val prop = Prop.forAll(gen) { case (p, q, s) =>
      val identity = (2 * p * s + q) / (2 * q)
      val reference = BigDecimal(p) * BigDecimal(s) / BigDecimal(q)
      identity == reference.setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val res = check(Parameters.default.withMinSuccessfulTests(2000), prop)
    assert(res.passed, res.status.toString)
  }

  test("streaming registry wrappers agree with their batch twins") {
    // the oracle certifies vs DuckDB; this pins streaming == batch
    // inside the engine, so a drift in either implementation is caught
    // even on corpora the driver never oracles
    val hr = operators.StreamingOps.streamHourlyRollup(spark, SfDir)
      .select("hour_ms", "event_type", "n_events")
    val hrBatch = operators.Events.hourlyRollup(spark, SfDir)
      .select("hour_ms", "event_type", "n_events")
    assert(hr.exceptAll(hrBatch).count() == 0 &&
      hrBatch.exceptAll(hr).count() == 0)
    val sess = operators.StreamingOps.streamSessionize(spark, SfDir)
    val sessBatch = operators.Events.sessionize(spark, SfDir)
      .select("user_id", "session_seq", "session_start_ms",
        "session_end_ms", "n_events")
    assert(sess.exceptAll(sessBatch).count() == 0 &&
      sessBatch.exceptAll(sess).count() == 0)
  }
}
