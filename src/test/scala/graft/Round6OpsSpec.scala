package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-6 operators beyond their DuckDB oracles:
  * the properties that must hold at ANY corpus size, checked on
  * sf0.001.
  */
class Round6OpsSpec extends SparkTestBase {

  test("kmeans clusters partition the corpus and centroids have full dim") {
    val out = operators.Similarity.kmeans(spark, SfDir).collect()
    val n = Tables.embeddings(spark, SfDir).count()
    assert(out.map(_.getLong(1)).sum === n)
    // centroid is a space-joined ×1e6 scaled-int string (harness-hashable)
    assert(out.forall(_.getString(2).split(" ").length == 64))
    assert(out.forall(_.getString(2).split(" ").forall(s => s.matches("-?\\d+"))))
    assert(out.map(_.getLong(0)).distinct.length === out.length)
  }

  test("pagerank conserves rank mass on the dangle-free graph") {
    val out = operators.WordCount.pagerank(spark, SfDir).collect()
    assert(out.length === 100)
    // pr = 0.15 + 0.85·(received mass); with bidirectional edges every
    // node emits its full mass, so every rank sits in [0.15, ∞) and
    // the top node's rank is strictly above the floor.
    assert(out.forall(_.getDouble(1) >= 0.15))
    assert(out.head.getDouble(1) > 1.0)
  }

  test("bloom pre-filter equals exact decontamination and actually prunes") {
    import graft.functions.Bloom
    val exact = operators.Pipeline.decontaminate(spark, SfDir).collect()
    val bloomed = operators.Pipeline.bloomDecontaminate(spark, SfDir).collect()
    assert(bloomed.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      exact.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    // the pre-filter must reject a real fraction of training shingles —
    // if it passes everything, the bitmap is saturated (m too small)
    val sh = Tables.documents(spark, SfDir)
      .select(col("doc_id"),
        explode(graft.functions.ShingleHashes.shingle_hashes(col("text"), 3)).as("sh"))
    val bench = sh.filter(col("doc_id") < operators.Pipeline.BenchmarkMaxId)
      .select("sh").distinct()
    val bloom = bench.agg(
      Bloom.bloomAgg(operators.Pipeline.BloomBits, operators.Pipeline.BloomK)(col("sh"))
        .as("bloom"))
    val train = sh.filter(col("doc_id") >= operators.Pipeline.BenchmarkMaxId)
    val total = train.count()
    val positives = train.crossJoin(broadcast(bloom))
      .filter(Bloom.mightContain(col("sh"), col("bloom"), operators.Pipeline.BloomK))
      .count()
    assert(positives < total,
      s"bloom passed all $total shingles — saturated filter")
  }

  test("char entropy is bounded by log2 of the per-doc alphabet") {
    val ent = operators.TextAnalysis.charEntropy(spark, SfDir)
    val alpha = Tables.documents(spark, SfDir)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(length(col("ch")) === 1)
      .groupBy("doc_id").agg(countDistinct(col("ch")).as("n_alpha"))
    val joined = ent.join(alpha, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val e = r.getDouble(2)
      val bound = math.log(r.getLong(3).toDouble) / math.log(2.0)
      assert(e >= 0.0 && e <= bound + 1e-6,
        s"doc ${r.getLong(0)}: entropy $e outside [0, $bound]")
    }
  }

  test("every anomaly row exceeds its user's recomputed threshold") {
    val out = operators.Events.anomaly(spark, SfDir).collect()
    val hourly = Tables.events(spark, SfDir)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      .groupBy("user_id", "hr").agg(count(lit(1)).as("cnt"))
    val stats = hourly.groupBy("user_id")
      .agg(avg(col("cnt")).as("mu"), stddev_samp(col("cnt")).as("sd"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    out.foreach { r =>
      val (mu, sd) = stats(r.getLong(0))
      assert(r.getLong(2).toDouble > mu + 3 * sd - 1e-6)
    }
  }

  test("schema profile counts are consistent") {
    val rows = operators.Pipeline.schemaProfile(spark, SfDir).collect()
    assert(rows.map(_.getString(0)).toSet === operators.Pipeline.ProfileCols.toSet)
    val n = Tables.orders(spark, SfDir).count()
    rows.foreach { r =>
      assert(r.getLong(1) === n)
      assert(r.getLong(2) >= 0 && r.getLong(2) <= n)
      assert(r.getLong(3) <= n - r.getLong(2))
    }
  }

  test("distributed rank is a per-nation permutation with balanced quartiles") {
    val rows = operators.Relational.relDistributedRank(spark, SfDir).collect()
      .map(r => (r.getAs[Number](1).longValue, r.getLong(3), r.getLong(6))) // nation, rnk, quartile
    rows.groupBy(_._1).foreach { case (_, g) =>
      val ranks = g.map(_._2).sorted
      assert(ranks === (1L to g.length.toLong).toArray)
      val sizes = g.groupBy(_._3).values.map(_.length).toSeq
      assert(sizes.max - sizes.min <= 1, s"unbalanced ntile: $sizes")
    }
  }

  test("triangle stats are internally consistent") {
    val r = operators.WordCount.triangleCount(spark, SfDir).collect().head
    val (nodes, edges, tris, wedges) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nodes > 0 && edges > 0)
    assert(wedges * 1L >= 3 * tris) // every triangle closes 3 wedges
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
  }

  test("gap stats reconcile: span = active + missing, skips within span") {
    operators.Events.gapStats(spark, SfDir).collect().foreach { r =>
      val (active, span, missing, skip) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))
      assert(span === active + missing)
      assert(skip <= missing)
    }
  }

  test("resampled grids are dense per user and fill is monotone-defined") {
    val byUser = operators.Events.resampleFfill(spark, SfDir).collect()
      .groupBy(_.getLong(0))
    assert(byUser.nonEmpty)
    byUser.foreach { case (_, rows) =>
      val hours = rows.map(_.getLong(1))
      assert(hours.max - hours.min === (hours.length - 1) * 3600000L)
      // once a value appears, every later row is non-null
      val defined = rows.sortBy(_.getLong(1)).map(!_.isNullAt(3))
      assert(defined.dropWhile(!_).forall(identity))
    }
  }

  test("weighted-sample keys are valid A-ES keys and heavy docs dominate") {
    val rows = operators.Pipeline.weightedSample(spark, SfDir).collect()
    assert(rows.length === operators.Pipeline.WeightedK)
    assert(rows.forall(_.getDouble(3) <= 0.0)) // ln(u)/w with u ≤ 1
    val sampleMean = rows.map(_.getLong(2)).sum.toDouble / rows.length
    val corpusMean = Tables.documents(spark, SfDir)
      .agg(avg(col("n_chars"))).collect().head.getDouble(0)
    assert(sampleMean > corpusMean, "length-weighted sample should skew long")
  }

  test("space-saving bounds bracket the exact counts and eviction really ran") {
    val exact = operators.WordCount.wordcount(spark, SfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.size > operators.WordCount.HeavyHitterCap,
      "corpus vocab must exceed capacity for this test to bite")
    val approx = operators.WordCount
      .ssSummary(operators.WordCount.HeavyHitterCap)(spark, SfDir).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (tok, ub, err) = (r.getString(0), r.getLong(1), r.getLong(2))
      val t = exact.getOrElse(tok, 0L)
      assert(t <= ub, s"$tok: true $t above upper bound $ub")
      assert(t >= ub - err, s"$tok: true $t below lower bound ${ub - err}")
    }
    // the eviction-floor invariant behind the verdict row: any token
    // ABSENT from the summary occurred at most min-ub times
    val minUb = approx.map(_.getLong(1)).min
    val present = approx.map(_.getString(0)).toSet
    exact.foreach { case (tok, t) =>
      if (!present(tok))
        assert(t <= minUb, s"absent $tok: true $t above eviction floor $minUb")
    }
    // and the registry row's containment verdicts are all 1
    val verdict = operators.WordCount.heavyHitters(spark, SfDir).collect()
    assert(verdict.length == operators.WordCount.HeavyHitterK)
    verdict.foreach { r =>
      assert(r.getAs[Long]("contained") == 1L,
        s"${r.getString(0)}: containment verdict flipped to 0")
    }
    // capacity ≥ vocabulary ⇒ no eviction ⇒ the sketch degenerates to
    // exact counting: equality with the exact top-k pins the plumbing
    val wide = operators.WordCount
      .heavyHittersWith(exact.size + 1)(spark, SfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val top = exact.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(operators.WordCount.HeavyHitterK)
      .map { case (t, c) => (t, c, 0L) }
    assert(wide.toSeq === top)
  }

  test("pq top-k is well-formed and overlaps the exact dot-product ranking") {
    import graft.functions.VectorFunctions.vec_dot
    val pq = operators.Similarity.pqTopk(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val qs = pq.map(_._1).distinct
    assert(qs.length === operators.Similarity.NQueries)
    qs.foreach { q =>
      val ranks = pq.filter(_._1 == q).map(_._2).sorted
      assert(ranks === (1L to operators.Similarity.TopK.toLong).toArray)
    }
    // exact (uncompressed) inner-product top-k for the same queries
    val e = Tables.embeddings(spark, SfDir)
      .select(col("vec_id"), col("embedding").as("v"))
    val q = e.filter(col("vec_id") < operators.Similarity.NQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val exact = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), vec_dot(col("qv"), col("v")).as("dp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (qid, rows) =>
        qid -> rows.sortBy(t => (-t._3, t._2))
          .take(operators.Similarity.TopK).map(_._2).toSet
      }
    val overlaps = qs.map { qid =>
      val got = pq.filter(_._1 == qid).map(_._3).toSet
      (got & exact(qid)).size
    }
    // quantization is lossy, but 16-entry codebooks over this corpus
    // must keep a real fraction of the true neighbors in every list
    assert(overlaps.forall(_ >= 2), s"pq recall collapsed: $overlaps")
  }

  test("terasort ranks land on stride positions in strict key order") {
    val rows = operators.Relational.relTerasort(spark, SfDir).collect()
    val n = Tables.lineitem(spark, SfDir).count()
    assert(rows.length === (n + operators.Relational.TerasortStride - 1) /
      operators.Relational.TerasortStride)
    assert(rows.forall(_.getLong(0) % operators.Relational.TerasortStride == 1L))
    val keys = rows.map(r => (-r.getDouble(1),
      r.getAs[Number](2).longValue, r.getAs[Number](3).longValue))
    assert(keys.toSeq === keys.sorted.toSeq, "stride rows out of global order")
  }

  test("merge upsert reconciles op counts against the base table") {
    val base = Tables.customer(spark, SfDir)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val out = operators.Relational.relMergeUpsert(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    val expectUpdates = base.count(_ % 7 == 0)
    val expectDeletes = base.count(k => k % 11 == 0 && k % 7 != 0)
    val expectInserts = base.count(_ % 13 == 0)
    assert(out.count(_._2 == "update") === expectUpdates)
    assert(out.count(_._2 == "insert") === expectInserts)
    assert(out.length === base.length - expectDeletes + expectInserts)
    // inserts must live strictly above the base key space (collision-free)
    val maxBase = base.max
    assert(out.filter(_._2 == "insert").forall(_._1 > maxBase))
    assert(out.map(_._1).distinct.length === out.length, "duplicate keys")
  }

  test("token-id encoding round-trips through the vocabulary") {
    import graft.functions.Text
    val docs = Tables.documents(spark, SfDir)
      .select(col("doc_id"), Text.tokens(lower(col("text"))).as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val enc = operators.Pipeline.tokenizeToIds(spark, SfDir).collect()
    // rebuild the vocab exactly as the operator defines it: dense ids
    // for the top VocabCap ranks, everything past the cap → OOV id
    val freq = docs.values.flatten.groupBy(identity).map { case (w, ws) => w -> ws.size }
    val vocab = freq.toSeq.sortBy { case (w, c) => (-c, w) }
      .zipWithIndex.map { case ((w, _), i) =>
        w -> math.min(i.toLong, operators.Pipeline.VocabCap) }.toMap
    assert(vocab.values.exists(_ == operators.Pipeline.VocabCap),
      "cap must bite at this SF or the OOV path is untested")
    enc.foreach { r =>
      val (id, n, ids) = (r.getLong(0), r.getLong(1), r.getString(2))
      val want = docs(id).map(vocab)
      assert(n === want.length.toLong)
      assert(ids === want.mkString(" "), s"doc $id id sequence mismatch")
    }
    assert(enc.length === docs.count(_._2.nonEmpty))
  }

  test("gram matrix diagonal matches summed squared norms and is Cauchy-Schwarz-consistent") {
    import graft.functions.VectorFunctions.vec_dot
    val g = operators.Similarity.gramMatrix(spark, SfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(g.size === operators.Similarity.GramDim * (operators.Similarity.GramDim + 1) / 2)
    val sumSq = Tables.embeddings(spark, SfDir)
      .select(vec_dot(col("embedding"), col("embedding")).as("d"))
      .agg(sum(col("d"))).collect().head.getDouble(0)
    val diag = (0 until operators.Similarity.GramDim)
      .map(i => g((i.toLong, i.toLong))).sum
    assert(math.abs(diag - sumSq) < 1e-2, s"trace $diag vs $sumSq")
    g.foreach { case ((i, j), v) =>
      val bound = math.sqrt(g((i, i)) * g((j, j))) + 1e-6
      assert(math.abs(v) <= bound, s"G($i,$j)=$v violates Cauchy-Schwarz $bound")
    }
  }

  test("session paths cover no more sessions than exist") {
    val paths = operators.Events.sessionPaths(spark, SfDir).collect()
    val total = operators.Events.sessionize(spark, SfDir).count()
    assert(paths.map(_.getLong(1)).sum <= total)
    assert(paths.forall(_.getString(0).nonEmpty))
  }
}
