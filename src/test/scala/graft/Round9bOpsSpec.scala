package graft

import org.apache.spark.sql.functions._

/** Property pins for the second round-9 operator batch (oracle hash
  * is the primary gate; these assert what a hash can't express).
  */
class Round9bOpsSpec extends SparkTestBase {

  test("txt_boilerplate_census: the planted footer dominates every source") {
    val out = graft.operators.TextAnalysis.boilerplateCensus(spark, SfDir)
      .collect()
    val planted = Tables.documents(spark, SfDir)
      .filter(col("doc_id") % 3 === 0)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.map(_.getString(0)).toSet == planted.keySet)
    out.foreach { r =>
      val (src, nDocs, nSpans, hits, affected, ppm) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))
      // the 8-token footer contributes 6 source-internal trigrams,
      // each present in every planted doc of the source
      assert(nSpans >= 6, s"$src: $nSpans template spans")
      assert(hits >= 6 * planted(src))
      assert(affected >= planted(src) && affected <= nDocs)
      assert(ppm >= planted(src) * 1000000L / nDocs - 1 && ppm <= 1000000L)
    }
  }

  test("txt_oov_census: planted doc-unique tokens are exactly the OOV set") {
    val out = graft.operators.TextAnalysis.oovCensus(spark, SfDir).collect()
    val docsPerSource = Tables.documents(spark, SfDir)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.map(_.getString(0)).toSet == docsPerSource.keySet)
    out.foreach { r =>
      val (src, nTokens, nOov) = (r.getString(0), r.getLong(1), r.getLong(2))
      // natural vocab is tiny and frequent (every word >= 0.1% of
      // mass); the ONLY sub-threshold tokens are the planted uniques
      assert(nOov == docsPerSource(src), s"$src: $nOov oov tokens")
      assert(nTokens > nOov)
    }
  }

  test("ann_pq_distortion: one census row per subspace, internally consistent") {
    val out = graft.operators.Similarity.pqDistortionCensus(spark, SfDir).collect()
    val n = Tables.embeddings(spark, SfDir).count()
    assert(out.length == graft.operators.Similarity.PqM)
    assert(out.map(_.getLong(0)).toSeq == (0L until graft.operators.Similarity.PqM))
    out.foreach { r =>
      val (nv, sum, mx, avg) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nv == n)
      assert(sum >= 0 && mx >= 0 && avg >= 0)
      assert(mx * nv >= sum, "max below the mean")
      assert(avg == (2 * sum + nv) / (2 * nv), "HALF_UP mean broken")
    }
  }

  test("dd_minhash_error: planted pairs carry strictly-interior Jaccard") {
    val out = graft.operators.Dedup.minhashErrorCensus(spark, SfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (matches, nInter, est, jac, err) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(matches >= 0 && matches <= graft.operators.Dedup.MinhashErrK)
      assert(nInter >= 1, "twin shares no shingles with its source")
      assert(jac > 0 && jac < 1000000L, "planted Jaccard must be interior")
      assert(est >= 0 && est <= 1000000L)
      assert(err == math.abs(est - jac))
    }
  }

  test("ann_ivf_balance: census invariants over the cell domain") {
    val r = graft.operators.Similarity.ivfBalanceCensus(spark, SfDir).head()
    val (nCells, nUsed, nVecs, minC, maxC, avg, skew, top) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    assert(nVecs == Tables.embeddings(spark, SfDir).count())
    assert(nUsed >= 1 && nUsed <= nCells)
    assert(minC >= 1 && maxC >= minC)
    assert(nVecs >= nUsed * minC && nVecs <= nUsed * maxC)
    assert(skew >= 1000 - 1, "max cell cannot sit below the mean")
    assert(avg >= 1000 && top <= 1000000L)
  }

  test("ev_countmin_error: the sketch never undercounts") {
    val r = graft.operators.Events.countminErrorCensus(spark, SfDir).head()
    val (nKeys, nEvents, nTight, sumOver, maxOver) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nKeys == Tables.events(spark, SfDir).select("user_id").distinct().count())
    assert(nEvents == Tables.events(spark, SfDir).count())
    assert(nTight <= nKeys)
    assert(sumOver >= 0 && maxOver >= 0, "CM overcount is one-sided")
    assert(maxOver * nKeys >= sumOver)
  }

  test("stream_file_sink_census: re-draining the same checkpoint changes nothing") {
    val first = graft.operators.StreamingOps.streamFileSinkCensus(spark, SfDir)
      .collect().toSeq
    val second = graft.operators.StreamingOps.streamFileSinkCensus(spark, SfDir)
      .collect().toSeq
    assert(first == second, "re-drain duplicated or dropped sink rows")
    val total = first.map(_.getLong(1)).sum
    assert(total == Tables.events(spark, SfDir).count())
  }

  test("ev_topk_users_hourly: heap output equals the window-ranked top-3") {
    import org.apache.spark.sql.expressions.Window
    val got = graft.operators.Events.topkUsersHourly(spark, SfDir)
    val g = Tables.events(spark, SfDir)
      .select(unix_millis(date_trunc("HOUR", col("ts"))).as("hour_ms"),
        col("user_id"))
      .groupBy("hour_ms", "user_id").agg(count(lit(1)).as("n"))
    val want = g.withColumn("rank", row_number().over(
        Window.partitionBy("hour_ms").orderBy(desc("n"), asc("user_id")))
        .cast("long"))
      .filter(col("rank") <= graft.operators.Events.HotUsersK)
      .select(col("hour_ms"), col("rank"), col("user_id"),
        col("n").as("n_events"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("rel_decimal_money: fixed-point totals are repartition-invariant") {
    val a = graft.operators.Relational.decimalMoney(spark, SfDir).collect().toSeq
    // same aggregation over a deliberately different partitioning —
    // decimal sums must not care about combine order
    val b = Tables.lineitem(spark, SfDir).repartition(13)
      .select(col("l_returnflag"),
        expr("CAST(l_extendedprice AS DECIMAL(18,2))").as("p2"),
        expr("CAST(l_discount AS DECIMAL(18,2))").as("d2"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        (sum(col("p2")) * 100).cast("long").as("base_cents"),
        (sum(col("p2") * (lit(1) - col("d2"))) * 10000).cast("long")
          .as("revenue_e4"))
      .orderBy("l_returnflag").collect().toSeq
    assert(a == b)
  }

  test("src_corrupt_json_census: quarantine counts match the corruption rule") {
    val r = graft.operators.Sources.corruptJsonCensus(spark, SfDir).head()
    val docs = Tables.documents(spark, SfDir)
    val corrupt = docs.filter(col("doc_id") % 7 === 0).count()
    assert(r.getLong(0) == docs.count())
    assert(r.getLong(1) == docs.count() - corrupt)
    assert(r.getLong(2) == corrupt)
  }

  test("wc_eccentricity_census: bounds bracket the closeness distances") {
    val e = graft.operators.WordCount.eccentricityCensus(spark, SfDir).head()
    val (nSeeds, radiusUb, diamLb, avgEcc) =
      (e.getLong(0), e.getLong(1), e.getLong(2), e.getLong(3))
    val closeness = graft.operators.WordCount.closenessCentrality(spark, SfDir)
      .collect()
    assert(nSeeds == closeness.length)
    assert(radiusUb >= 1 && diamLb >= radiusUb)
    assert(diamLb <= graft.operators.WordCount.BfsMaxRounds)
    assert(avgEcc >= radiusUb * 1000 - 1 && avgEcc <= diamLb * 1000 + 1)
  }

  test("pipe_detokenize_roundtrip: every OOV-free doc reconstructs exactly") {
    val out = graft.operators.Pipeline.detokenizeRoundtrip(spark, SfDir).collect()
    assert(out.nonEmpty)
    var invocab = 0L
    out.foreach { r =>
      val (nDocs, nInvocab, nExact) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nExact == nInvocab, s"${r.getString(0)}: roundtrip lost docs")
      assert(nInvocab <= nDocs)
      invocab += nInvocab
    }
    // the corpus vocabulary exceeds VocabCap, so OOV docs must exist
    // AND some docs must be fully in-vocab for the test to bite
    assert(invocab > 0)
    assert(invocab < out.map(_.getLong(1)).sum)
  }

  test("rel_sql_frontend: the SQL text plans like the equivalent DSL") {
    val sql = graft.operators.Relational.sqlFrontend(spark, SfDir)
    val dsl = Tables.orders(spark, SfDir).as("o")
      .join(Tables.lineitem(spark, SfDir).as("l"),
        col("o.o_orderkey") === col("l.l_orderkey"))
      .filter(col("o.o_orderstatus") =!= "F")
      .groupBy(col("o.o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l.l_extendedprice") * (lit(1) - col("l.l_discount"))), 2)
          .as("revenue"),
        countDistinct(col("o.o_orderkey")).as("n_orders"))
    assert(sql.exceptAll(dsl).count() == 0 && dsl.exceptAll(sql).count() == 0)
  }

  test("vec_sql_udf: vec_dot from SQL equals the Column-API dot") {
    import graft.functions.VectorFunctions.vec_dot
    val viaSql = graft.operators.Similarity.vecSqlUdf(spark, SfDir)
    val viaCol = Tables.embeddings(spark, SfDir)
      .select(col("label"),
        round(vec_dot(col("embedding"), col("embedding")) * lit(1e6))
          .cast("long").as("n2"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"), sum(col("n2")).as("norm2_e6_sum"))
    assert(viaSql.exceptAll(viaCol).count() == 0 &&
      viaCol.exceptAll(viaSql).count() == 0)
  }

  test("stream_static_enrich: enrichment preserves the event stream") {
    val out = graft.operators.StreamingOps.streamCohortRollup(spark, SfDir)
    val total = out.agg(sum(col("n_events"))).head().getLong(0)
    assert(total == Tables.events(spark, SfDir).count())
    // a user's cohort day can never postdate the hour of their event
    assert(out.filter(col("cohort_ms") > col("hour_ms")).count() == 0)
  }

  test("wc_closeness_centrality: per-seed sums agree with reachability bounds") {
    val out = graft.operators.WordCount.closenessCentrality(spark, SfDir)
      .collect()
    assert(out.nonEmpty)
    // the landmark set stays a BUDGET: the count-derived modulus keeps
    // the seed count near TargetSeeds regardless of graph size (the
    // slack covers id-distribution lumpiness across the two id bands)
    assert(out.length <= 4 * graft.operators.WordCount.ClosenessTargetSeeds)
    out.foreach { r =>
      val (n, sd) = (r.getLong(1), r.getLong(2))
      assert(n >= 2, s"seed ${r.getLong(0)} reached only itself")
      // every non-seed node is >= 1 hop away, <= BfsMaxRounds hops
      assert(sd >= n - 1 && sd <= (n - 1) * graft.operators.WordCount.BfsMaxRounds)
      val closeness = r.getLong(3)
      assert(closeness >= 0 && closeness <= 1000000L)
    }
  }
}
