package graft

import org.apache.spark.sql.functions._

/** Invariants for the third round-8 operator batch beyond their
  * DuckDB oracles.
  */
class Round8cOpsSpec extends SparkTestBase {

  test("rfm segments partition the user base with tercile scores in 1..3") {
    val got = operators.Events.rfmSegments(spark, SfDir).collect()
    assert(got.nonEmpty)
    val nUsers = Tables.events(spark, SfDir).select("user_id").distinct().count()
    assert(got.map(_.getAs[Long]("n_users")).sum == nUsers)
    val nEvents = Tables.events(spark, SfDir).count()
    assert(got.map(_.getAs[Long]("sum_events")).sum == nEvents)
    got.foreach { r =>
      Seq("r", "f", "m").foreach { c =>
        val s = r.getAs[Long](c)
        assert(s >= 1L && s <= 3L, s"score $c=$s outside 1..3")
      }
      assert(r.getAs[Long]("sum_cents") >= 0L)
    }
    // the mean-tercile cut cannot put everyone in one cell
    assert(got.length > 1, "degenerate single-segment RFM census")
  }

  test("interarrival census counts exactly (events - users) gaps with banded maxima") {
    val got = operators.Events.interarrivalCensus(spark, SfDir).collect()
    assert(got.nonEmpty)
    val ev = Tables.events(spark, SfDir)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(got.map(_.getAs[Long]("n_gaps")).sum == nEvents - nUsers)
    val hi = Map("a_lt_1h" -> 3600000L, "b_lt_6h" -> 21600000L,
      "c_lt_1d" -> 86400000L, "d_lt_3d" -> 259200000L,
      "e_ge_3d" -> Long.MaxValue)
    got.foreach { r =>
      val (band, mx, mean) = (r.getAs[String]("band"),
        r.getAs[Long]("max_ms"), r.getAs[Long]("mean_ms"))
      assert(mx < hi(band), s"band $band max $mx beyond its upper cut")
      assert(mean <= mx && mean >= 0L)
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_gaps"))
    }
  }

  test("equi-width histogram partitions lineitem with in-edge bucket extrema") {
    val got = operators.Relational.equiwidthHistogram(spark, SfDir).collect()
    assert(got.nonEmpty)
    val li = Tables.lineitem(spark, SfDir)
      .select(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cents"))
    assert(got.map(_.getAs[Long]("n_rows")).sum == li.count())
    val Array(lo, hi) = li.agg(min("cents"), max("cents")).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val b = operators.Relational.HistBuckets
    got.foreach { r =>
      val bk = r.getAs[Long]("bucket")
      assert(bk >= 0L && bk < b)
      // bucket k holds cents with ((c-lo)*B) div (hi-lo+1) == k
      val (mn, mx) = (r.getAs[Long]("min_cents"), r.getAs[Long]("max_cents"))
      assert(((mn - lo) * b) / (hi - lo + 1) == bk)
      assert(((mx - lo) * b) / (hi - lo + 1) == bk)
      assert(mn <= mx)
    }
    // extrema of the data land in the first and last occupied buckets
    assert(got.head.getAs[Long]("min_cents") == lo)
    assert(got.last.getAs[Long]("max_cents") == hi)
  }

  test("label cosine covers every label pair with ppm in [-1e6, 1e6]") {
    val got = operators.Similarity.labelCosine(spark, SfDir).collect()
    val nLabels = Tables.embeddings(spark, SfDir).select("label").distinct().count()
    assert(got.length == (nLabels * (nLabels - 1) / 2).toInt)
    got.foreach { r =>
      assert(r.getAs[Long]("la") < r.getAs[Long]("lb"))
      val c = r.getAs[Long]("cos_ppm")
      assert(c >= -1000000L && c <= 1000000L, s"cosine ppm $c out of range")
    }
  }

  test("token budget keeps the greedy prefix that first crosses half the tokens") {
    val got = operators.Pipeline.tokenBudget(spark, SfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (nDocs, nSel) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_selected"))
      val (tot, sel) = (r.getAs[Long]("tokens_total"), r.getAs[Long]("tokens_selected"))
      assert(nSel >= 1L && nSel <= nDocs)
      assert(sel <= tot)
      // the crossing doc is included, so the selection covers the half budget
      assert(2 * sel >= tot, s"selection $sel under half of $tot")
    }
  }

  test("streak census: active days partition into streaks, max <= total") {
    val got = operators.Events.streakCensus(spark, SfDir).collect()
    assert(got.nonEmpty)
    val du = Tables.events(spark, SfDir)
      .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"))
      .distinct()
    assert(got.map(_.getAs[Long]("n_active_days")).sum == du.count())
    got.foreach { r =>
      val (ns, ad, mx) = (r.getAs[Long]("n_streaks"),
        r.getAs[Long]("n_active_days"), r.getAs[Long]("max_streak"))
      assert(ns >= 1L && mx >= 1L)
      assert(mx <= ad && ad <= ns * mx)
    }
  }

  test("lang cap keeps exactly min(cap, n_docs) per language") {
    val got = operators.Pipeline.langCap(spark, SfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (nd, nk) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))
      assert(nk == math.min(operators.Pipeline.LangCap, nd),
        s"lang ${r.getAs[String]("lang")} kept $nk of $nd")
      assert(r.getAs[Long]("chars_kept") <= r.getAs[Long]("chars_total"))
    }
  }

  test("simpson concentration is a valid probability and matches a replay") {
    val got = operators.TextAnalysis.simpsonDiversity(spark, SfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val p = r.getAs[Long]("simpson_ppm")
      // unbiased Simpson can reach 0 (all-hapax source), never exceed 1
      assert(p >= 0L && p <= 1000000L)
    }
    // driver-side replay of one source pins the whole integer pipeline
    val src = got.head.getAs[String]("source")
    val counts = Tables.documents(spark, SfDir).filter(col("source") === src)
      .select(explode(graft.functions.Text.tokens(lower(col("text")))).as("w"))
      .groupBy("w").count().collect().map(_.getAs[Long]("count"))
    val n = counts.sum
    val coll = counts.map(c => c * (c - 1)).sum
    val expected = (2 * coll * 1000000L + n * (n - 1)) / (2 * n * (n - 1))
    assert(got.head.getAs[Long]("simpson_ppm") == expected)
    assert(got.head.getAs[Long]("n_types") == counts.length.toLong)
  }

  test("ngram novelty: doc 0 is fully novel, ppms bounded, grams consistent") {
    val got = operators.TextAnalysis.ngramNovelty(spark, SfDir).collect()
    assert(got.nonEmpty)
    val first = got.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Long]("n_novel") == first.getAs[Long]("n_grams"),
      "the earliest doc must be 100% novel")
    got.foreach { r =>
      val (g, nv, p) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
        r.getAs[Long]("novelty_ppm"))
      assert(nv <= g && g >= 1L)
      assert(p == (2 * nv * 1000000L + g) / (2 * g))
    }
  }

  test("blob dedup: uniq <= blobs, dedup bytes <= total, kinds partition docs") {
    val got = operators.Multimodal.blobDedup(spark, SfDir).collect()
    assert(got.nonEmpty)
    val nDocs = Tables.documents(spark, SfDir).count()
    assert(got.map(_.getAs[Long]("n_blobs")).sum == nDocs)
    got.foreach { r =>
      val (nb, nu) = (r.getAs[Long]("n_blobs"), r.getAs[Long]("n_uniq"))
      assert(nu >= 1L && nu <= nb)
      assert(r.getAs[Long]("bytes_dedup") <= r.getAs[Long]("bytes_total"))
      assert(r.getAs[Long]("dup_ppm") == (2 * (nb - nu) * 1000000L + nb) / (2 * nb))
    }
  }

  test("user entropy: zero for single-type users, bounded by log2(n_types)") {
    val got = operators.Events.userEntropy(spark, SfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (k, h) = (r.getAs[Long]("n_types"), r.getAs[Double]("entropy"))
      if (k == 1L) assert(h == 0.0)
      assert(h >= -1e-6 && h <= math.log(k.toDouble) / math.log(2.0) + 1e-6)
    }
  }

  test("chi2 crosstab: expected margins reconcile and contributions are finite") {
    val got = operators.Relational.crosstabChi2(spark, SfDir).collect()
    assert(got.nonEmpty)
    val n = Tables.lineitem(spark, SfDir).count()
    assert(got.map(_.getAs[Long]("observed")).sum == n)
    // expected counts (x100) sum back to ~100n (HALF_UP slack per cell)
    val expSum = got.map(_.getAs[Long]("expected_x100")).sum
    assert(math.abs(expSum - 100L * n) <= got.length.toLong,
      s"expected_x100 sum $expSum drifted from ${100L * n}")
    got.foreach(r => assert(r.getAs[Long]("chi2_contrib_ppm") >= 0L))
  }

  test("garbage census flags real consonant runs and only those") {
    import spark.implicits._
    val got = operators.TextAnalysis.garbageTokens(spark, SfDir).collect()
    assert(got.nonEmpty)
    val nDocs = Tables.documents(spark, SfDir).count()
    assert(got.map(_.getAs[Long]("n_docs")).sum == nDocs)
    got.foreach { r =>
      assert(r.getAs[Long]("n_garbage") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_docs_hit") <= r.getAs[Long]("n_docs"))
    }
    // the detector itself: positive and negative controls
    val probe = Seq("strength asdfghjkl ok", "plain words only").toDF("text")
      .select(size(filter(graft.functions.Text.tokens(lower(col("text"))),
        t => t.rlike(operators.TextAnalysis.GarbageRunRegex))).as("n"))
      .collect().map(_.getAs[Int]("n"))
    assert(probe.toSeq == Seq(1, 0))
  }

  test("cluster size histogram reconciles docs and clusters with dd_exact") {
    val got = operators.Dedup.clusterSizeHist(spark, SfDir).collect()
    assert(got.nonEmpty)
    val nDocs = Tables.documents(spark, SfDir).count()
    assert(got.map(_.getAs[Long]("n_docs")).sum == nDocs)
    val exact = operators.Dedup.exact(spark, SfDir).collect()
    assert(got.map(_.getAs[Long]("n_clusters")).sum == exact.length.toLong)
    got.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("size") * r.getAs[Long]("n_clusters"))
    }
  }

  test("feature snapshot never leaks: priors bounded by history, sentinels consistent") {
    val got = operators.Events.featureSnapshot(spark, SfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("event_id") % 10 == 7)
      val n = r.getAs[Long]("n_prior")
      val (sf, sl) = (r.getAs[Long]("ms_since_first"), r.getAs[Long]("ms_since_last"))
      if (n == 0L) {
        assert(r.getAs[Long]("cents_prior") == 0L && sf == -1L && sl == -1L)
      } else {
        assert(sf >= sl && sl >= 0L)
      }
    }
  }

  test("survivorship keeps the padded planted copy and breaks singleton ties to doc_id") {
    val got = operators.Dedup.survivorship(spark, SfDir).collect()
    assert(got.nonEmpty)
    val planted = got.filter(_.getAs[Long]("n_copies") == 2L)
    assert(planted.nonEmpty, "planted clusters missing")
    // planted copies are padded by 2 chars, so the survivor is the plant
    planted.foreach(r =>
      assert(r.getAs[Long]("survivor_id") >= operators.Dedup.PlantOffset))
    got.filter(_.getAs[Long]("n_copies") == 1L)
      .foreach(r => assert(r.getAs[Long]("survivor_id") < operators.Dedup.PlantOffset))
  }

  test("bit balance: every plane counts all vectors, ppm near the coin flip") {
    val got = operators.Similarity.bitBalance(spark, SfDir).collect()
    assert(got.length == operators.Similarity.BalanceBits)
    val nVecs = Tables.embeddings(spark, SfDir).count()
    got.foreach { r =>
      assert(r.getAs[Long]("n_vecs") == nVecs)
      val p = r.getAs[Long]("ones_ppm")
      // Gaussian planes over zero-ish-mean vectors: loose sanity band
      assert(p > 100000L && p < 900000L, s"bit ${r.getAs[Long]("bit")} ppm $p")
    }
  }

  test("peak concurrency: change count reconciles with 2x sessions, peaks sane") {
    val got = operators.Events.peakConcurrency(spark, SfDir).collect()
    assert(got.nonEmpty)
    val nSessions = operators.Events.sessionize(spark, SfDir).count()
    assert(got.map(_.getAs[Long]("n_changes")).sum == 2 * nSessions)
    val users = Tables.events(spark, SfDir).select("user_id").distinct().count()
    got.foreach { r =>
      val p = r.getAs[Long]("peak_concurrency")
      // a user has at most one open session at a time
      assert(p >= 0L && p <= users)
    }
    assert(got.map(_.getAs[Long]("peak_concurrency")).max >= 1L)
  }

  test("template prefixes are 5 tokens or fewer with bounded source counts") {
    val got = operators.TextAnalysis.templatePrefixes(spark, SfDir).collect()
    assert(got.nonEmpty && got.length <= operators.TextAnalysis.TemplateTopK)
    val nSources = Tables.documents(spark, SfDir).select("source").distinct().count()
    val counts = got.map(_.getAs[Long]("n_docs"))
    assert(counts.sameElements(counts.sorted.reverse), "not sorted by n_docs desc")
    got.foreach { r =>
      assert(r.getAs[String]("prefix").split(" ").length <= 5)
      val s = r.getAs[Long]("n_sources")
      assert(s >= 1L && s <= math.min(nSources, r.getAs[Long]("n_docs")))
    }
  }

  test("lorenz curve: cumulative shares are monotone and end at 100%") {
    val got = operators.Events.lorenzCurve(spark, SfDir).collect()
    assert(got.nonEmpty)
    // rows ordered band DESC; cumulative shares must be non-decreasing
    val up = got.map(_.getAs[Long]("cum_users_ppm"))
    val cp = got.map(_.getAs[Long]("cum_cents_ppm"))
    assert(up.zip(up.tail).forall { case (a, b) => a <= b })
    assert(cp.zip(cp.tail).forall { case (a, b) => a <= b })
    assert(up.last == 1000000L && cp.last == 1000000L)
    // concentration: at every prefix the revenue share dominates the user share
    got.init.foreach { r =>
      assert(r.getAs[Long]("cum_cents_ppm") >= r.getAs[Long]("cum_users_ppm") - 1)
    }
  }

  test("wcc sizes: components cover every edge endpoint, sizes >= 2") {
    val got = operators.WordCount.wccSizes(spark, SfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      // every labeled node sits on an edge, so no singleton components
      assert(r.getAs[Long]("size") >= 2L)
      assert(r.getAs[Long]("n_nodes") ==
        r.getAs[Long]("size") * r.getAs[Long]("n_components"))
    }
  }

  test("dwell by type: gap count reconciles with events minus users") {
    val got = operators.Events.dwellByType(spark, SfDir).collect()
    assert(got.nonEmpty)
    val ev = Tables.events(spark, SfDir)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(got.map(_.getAs[Long]("n_gaps")).sum == expected)
    got.foreach { r =>
      assert(r.getAs[Long]("mean_ms") <= r.getAs[Long]("max_ms"))
      assert(r.getAs[Long]("sum_ms") >= 0L)
    }
  }

  test("pair distance histogram counts exactly C(s,2) pairs in valid bins") {
    val got = operators.Similarity.pairDistanceHist(spark, SfDir).collect()
    assert(got.nonEmpty)
    val n = Tables.embeddings(spark, SfDir).count()
    val m = math.max(n / operators.Similarity.PdhSample, 1L)
    val s = Tables.embeddings(spark, SfDir)
      .filter(col("vec_id") % m === 0).count()
    assert(got.map(_.getAs[Long]("n_pairs")).sum == s * (s - 1) / 2)
    got.foreach { r =>
      val b = r.getAs[Long]("bin")
      assert(b >= 0L && b <= 19L)
    }
  }

  test("scene cuts: frame counts match decoded GIF geometry, cuts bounded") {
    val got = operators.Multimodal.sceneCuts(spark, SfDir).collect()
    assert(got.nonEmpty)
    val ids = Tables.documents(spark, SfDir)
      .filter(col("doc_id") % 4 === 2)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got.map(_.getAs[Long]("doc_id")).toSet == ids)
    got.foreach { r =>
      val (id, nf) = (r.getAs[Long]("doc_id"), r.getAs[Long]("n_frames"))
      // the GIF synthesizer's frame-count rule
      assert(nf == 3L + (id / 4) % 4, s"doc $id frame count")
      assert(r.getAs[Long]("n_cuts") <= nf - 1)
    }
  }

  test("reorder gaps: per-band bounds hold and gaps reconcile") {
    val got = operators.Relational.reorderGaps(spark, SfDir).collect()
    assert(got.nonEmpty)
    val o = Tables.orders(spark, SfDir)
    val expected = o.count() - o.select("o_custkey").distinct().count()
    assert(got.map(_.getAs[Long]("n_gaps")).sum == expected)
    val hi = Map("a_within_week" -> 7L, "b_within_month" -> 30L,
      "c_within_quarter" -> 90L, "d_longer" -> Long.MaxValue)
    got.foreach { r =>
      assert(r.getAs[Long]("max_days") <= hi(r.getAs[String]("band")))
      assert(r.getAs[Long]("mean_days") <= r.getAs[Long]("max_days"))
      assert(r.getAs[Long]("n_customers") <= r.getAs[Long]("n_gaps"))
    }
  }

  test("seasonal baseline: horizons cover fewer pairs as lag grows") {
    val got = operators.Events.seasonalBaseline(spark, SfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      // longer lags can only lose co-present hours
      assert(r.getAs[Long]("n_h1") >= r.getAs[Long]("n_h24"))
      assert(r.getAs[Long]("n_h24") >= r.getAs[Long]("n_h168"))
      Seq("mae_h1_x100", "mae_h24_x100", "mae_h168_x100")
        .foreach(c => assert(r.getAs[Long](c) >= 0L))
    }
  }

  test("knn degree curve: edge ends reconcile with the handshake sum") {
    val got = operators.WordCount.knnDegree(spark, SfDir).collect()
    assert(got.nonEmpty)
    // sum over degree classes of edge-ends == 2|E| == sum of degree*n_nodes
    val ends = got.map(_.getAs[Long]("n_edge_ends")).sum
    val handshake = got.map(r => r.getAs[Long]("degree") * r.getAs[Long]("n_nodes")).sum
    assert(ends == handshake)
    got.foreach { r =>
      val m = r.getAs[Long]("mean_nbr_deg_x100")
      assert(m >= 100L, s"mean neighbor degree below 1: $m")
    }
  }

  test("burstiness: cf >= df per band, band-1 words are all hapax-like") {
    val got = operators.TextAnalysis.burstiness(spark, SfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("sum_cf") >= r.getAs[Long]("sum_df"))
      assert(r.getAs[Long]("burst_x100") >= 100L)
    }
    // band 1 = cf in [1,1]: cf == df == n_words there
    got.find(_.getAs[Long]("cf_band") == 1L).foreach { r =>
      assert(r.getAs[Long]("sum_cf") == r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("burst_x100") == 100L)
    }
  }

  test("conversion delay bands partition the viewing population") {
    val got = operators.Events.conversionDelay(spark, SfDir).collect()
    assert(got.nonEmpty)
    val nViewers = Tables.events(spark, SfDir)
      .filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(got.map(_.getAs[Long]("n_users")).sum == nViewers)
    got.foreach { r =>
      val band = r.getAs[String]("band")
      val mx = r.getAs[Long]("max_delay_ms")
      if (band == "e_no_purchase" || band == "f_purchase_first")
        assert(mx == 0L && r.getAs[Long]("sum_delay_ms") == 0L)
      else assert(r.getAs[Long]("sum_delay_ms") >= mx)
    }
  }

  test("rich club: density is monotone checkable and node counts shrink with k") {
    val got = operators.WordCount.richClub(spark, SfDir).collect()
    assert(got.nonEmpty)
    val byK = got.map(r => r.getAs[Long]("k") ->
      (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"), r.getAs[Long]("density_ppm"))).toMap
    val ks = byK.keys.toSeq.sorted
    ks.zip(ks.tail).foreach { case (a, b) =>
      assert(byK(a)._1 >= byK(b)._1, s"nodes grew from k=$a to k=$b")
      assert(byK(a)._2 >= byK(b)._2)
    }
    got.foreach { r =>
      val (n, e, d) = (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
        r.getAs[Long]("density_ppm"))
      assert(e <= n * (n - 1) / 2)
      assert(d >= 0L && d <= 1000000L)
    }
  }

  test("mean direction census covers all vectors with a skew toward +1") {
    val got = operators.Similarity.meanDirectionCensus(spark, SfDir).collect()
    assert(got.nonEmpty)
    val n = Tables.embeddings(spark, SfDir).count()
    assert(got.map(_.getAs[Long]("n_vecs")).sum == n)
    got.foreach { r =>
      val b = r.getAs[Long]("bin")
      assert(b >= 0L && b <= 19L)
    }
    // cosine to the MEAN direction must average positive: upper half > lower half
    val hi = got.filter(_.getAs[Long]("bin") >= 10L).map(_.getAs[Long]("n_vecs")).sum
    val lo = got.filter(_.getAs[Long]("bin") < 10L).map(_.getAs[Long]("n_vecs")).sum
    assert(hi > lo, s"mean-direction cosines skew negative ($hi vs $lo)")
  }

  test("hapax census bounds: hapax <= types <= tokens, ppms consistent") {
    val got = operators.TextAnalysis.hapaxCensus(spark, SfDir).collect()
    assert(got.nonEmpty)
    val totalToks = Tables.documents(spark, SfDir)
      .select(explode(graft.functions.Text.tokens(lower(col("text")))).as("w"))
      .count()
    assert(got.map(_.getAs[Long]("n_tokens")).sum == totalToks)
    got.foreach { r =>
      val (ty, to, ha) = (r.getAs[Long]("n_types"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_hapax"))
      assert(ha <= ty && ty <= to)
      assert(r.getAs[Long]("ttr_ppm") == (2 * ty * 1000000L + to) / (2 * to))
      assert(r.getAs[Long]("hapax_ppm") == (2 * ha * 1000000L + ty) / (2 * ty))
    }
  }
}
