package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Pipeline, Similarity, TextAnalysis}

class PipelineOpsSpec extends SparkTestBase {

  test("exact dedup: copies partition the corpus") {
    val d = Dedup.exact(spark, SfDir)
    val total = d.agg(sum("n_copies")).collect()(0).getLong(0)
    assert(total == Tables.documents(spark, SfDir).count())
  }

  test("minhash LSH candidates recall every exact high-jaccard same-source pair") {
    val exactPairs = Dedup.ngramJaccard(spark, SfDir)
      .select("doc_id_1", "doc_id_2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshPairs = Dedup.minhashLsh(spark, SfDir)
      .select("doc_id_1", "doc_id_2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH searches all sources, so it can only find MORE pairs than the
    // source-blocked exact scan; at jaccard>=0.35 with 8 bands x 4 rows
    // the per-pair candidate probability is >99.9%.
    assert(exactPairs.subsetOf(lshPairs),
      s"missed: ${exactPairs.diff(lshPairs)}")
  }

  test("sign-LSH embed dedup recalls every planted near-dup pair exactly") {
    val pairs = Dedup.embedCosineLsh(spark, SfDir).collect()
    val n = Tables.embeddings(spark, SfDir).count()
    // every vector's planted 0.5-scaled copy must be recalled (identical
    // sign signature ⇒ candidate recall 1), and nothing else crosses 0.9
    assert(pairs.length == n)
    assert(pairs.forall(r => r.getAs[Long]("vec_id_2") == r.getAs[Long]("vec_id_1") + 1000000L))
    assert(pairs.forall(_.getAs[Double]("cosine") == 1.0))
  }

  test("minhash LSH natural pairs all appear in brute force with identical jaccard") {
    // Precision + verify-math parity on NON-identical pairs: every pair
    // the natural (unplanted) LSH pipeline emits must exist in the
    // unblocked brute-force jaccard>=0.35 set with the SAME rounded
    // jaccard — LSH may only MISS pairs (candidate recall), never
    // invent one or mis-score one. This covers the natural-pair surface
    // the planted registry oracle deliberately restricts away.
    val docs = Tables.documents(spark, SfDir).select("doc_id", "source", "text")
    val bf = Dedup.allPairsJaccardOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Dedup.minhashLsh(spark, SfDir).collect()
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(bf.get(key).contains(r.getDouble(2)),
        s"LSH pair $key -> ${r.getDouble(2)} not in brute force (${bf.get(key)})")
    }
  }

  test("simhash banded pairs equal brute-force hamming<=3 over the same signatures") {
    // The pigeonhole-losslessness claim, checked mechanically: the
    // C(5,2) band-pair blocked output must EQUAL the all-pairs hamming
    // computation from the same signatures — banding loses nothing and
    // the join-side hamming math is right for non-identical pairs too.
    val docs = Tables.documents(spark, SfDir).select("doc_id", "source", "text")
    val sig = Dedup.simhashSignatures(docs)
    val bf = sig.as("x").crossJoin(sig.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id_1"), col("y.doc_id").as("doc_id_2"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
    val banded = Dedup.simhash(spark, SfDir)
    assert(bf.exceptAll(banded).count() == 0 && banded.exceptAll(bf).count() == 0)
  }

  test("simhash pairs are symmetric-free and within hamming bound") {
    val s = Dedup.simhash(spark, SfDir)
    assert(s.filter(col("doc_id_1") >= col("doc_id_2")).count() == 0)
    assert(s.filter(col("hamming") > 3).count() == 0)
  }

  test("ivf ANN achieves >=60% recall@10 of brute force on sf0.001") {
    val bf = Similarity.bruteforceTopk(spark, SfDir)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopk(spark, SfDir)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.intersect(ivf).size.toDouble / bf.size
    assert(recall >= 0.6, s"recall@10 = $recall")
  }

  test("rolling hash is stable and collision-sane") {
    val fp = TextAnalysis.fingerprintFnv(spark, SfDir)
    val n = fp.count()
    val distinct = fp.select("rolling_hash").distinct().count()
    // text dedup level: distinct hashes == distinct normalized texts
    val distinctTexts = Tables.documents(spark, SfDir)
      .select(graft.functions.Text.normalized(col("text"))).distinct().count()
    assert(n == 500 || n > 0)
    assert(distinct == distinctTexts)
  }

  test("batch features come from decoded rasters at the minted dimensions") {
    val f = Multimodal.batchFeatures(spark, SfDir)
    // n_px must equal the PNG synthesizer's w·h rule — the count
    // reaches the output only through a real decode of the raster
    val bad = f.filter(col("n_px") =!=
      (lit(16) + pmod(col("doc_id"), lit(5)) * 8) *
        (lit(12) + pmod(col("doc_id"), lit(7)) * 4))
    assert(bad.count() == 0)
    // gray samples live in [0, 255] and mean sits between min and max
    assert(f.filter(col("f_max") < 0 || col("f_max") > 255).count() == 0)
    assert(f.filter(col("f_min") < 0 || col("f_min") > 255).count() == 0)
    assert(f.filter(col("f_mean") < col("f_min") || col("f_mean") > col("f_max")).count() == 0)
  }

  test("vec_dot is SQL-callable after registration and matches the HOF form") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 32.0)
  }

  test("bounded-heap top-k aggregator equals the window top-k") {
    val win = Similarity.bruteforceTopk(spark, SfDir)
    val agg = Similarity.bruteforceTopkAgg(spark, SfDir)
    assert(win.exceptAll(agg).count() == 0 && agg.exceptAll(win).count() == 0)
  }

  test("hash sample + split are deterministic partitions of the corpus") {
    val total = Tables.documents(spark, SfDir).count()
    val split = Pipeline.trainTestSplit(spark, SfDir)
      .agg(sum("n_docs")).collect()(0).getLong(0)
    assert(split == total)
    val s1 = Pipeline.hashSample(spark, SfDir).collect()
    val s2 = Pipeline.hashSample(spark, SfDir).collect()
    assert(s1.sameElements(s2))
  }

  test("sequence packs respect the prefix-sum budget invariant") {
    val packs = Pipeline.packSequences(spark, SfDir).collect()
    val totalTokens = packs.map(_.getAs[Long]("pack_tokens")).sum
    val expected = Tables.documents(spark, SfDir)
      .select(graft.functions.Text.wsTokenCount(col("text")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(totalTokens == expected)
    assert(packs.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, SfDir).count())
  }

  test("clean corpus only keeps canonical docs passing the gates") {
    val cc = Pipeline.cleanCorpus(spark, SfDir)
    assert(cc.count() > 0)
    assert(cc.filter(col("n_tokens") < 5 || col("n_tokens") > 1000).count() == 0)
  }

  test("repetition fractions are bounded and token totals reconcile") {
    val rep = TextAnalysis.repetition(spark, SfDir)
    // each fraction lives in [1/n_tokens, 1] when tokens exist
    // (epsilon: the 6-dp rounding can land just below the exact bound)
    val bad = rep.filter(col("n_tokens") > 0 &&
      (col("top_token_frac") > 1.0 ||
        col("top_token_frac") < lit(1.0) / col("n_tokens").cast("double") - 1e-6 ||
        col("top_bigram_frac") > 1.0))
    assert(bad.count() == 0)
    val total = rep.agg(sum("n_tokens")).collect()(0).getLong(0)
    val expected = Tables.documents(spark, SfDir)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("w")).count()
    assert(total == expected)
  }

  test("decontamination reports only training docs, each with real overlap") {
    val d = Pipeline.decontaminate(spark, SfDir)
    assert(d.filter(col("doc_id") < Pipeline.BenchmarkMaxId).count() == 0)
    assert(d.filter(col("n_overlap") < 1).count() == 0)
    // sanity: this corpus's shared vocabulary makes overlap common
    assert(d.count() > 0)
  }

  test("binary chunks tile each payload exactly") {
    val ch = Multimodal.chunk(spark, SfDir)
    val sizes = ch.groupBy("doc_id")
      .agg(sum("chunk_len").as("total"), count(lit(1)).as("n"))
    val meta = Multimodal.meta(spark, SfDir).select(col("doc_id"), col("n_bytes"))
    // chunk lengths reassemble the payload byte count
    assert(sizes.join(meta, "doc_id")
      .filter(col("total") =!= col("n_bytes")).count() == 0)
    // every chunk except the last is full-width
    assert(ch.join(sizes, "doc_id")
      .filter(col("chunk_id") < col("n") - 1 &&
        col("chunk_len") =!= Multimodal.ChunkBytes).count() == 0)
  }

  test("plan shape: decontamination broadcasts the benchmark shingle set") {
    val plan = Pipeline.decontaminate(spark, SfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "benchmark side must broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("connected components converge on a path graph deeper than one round") {
    // a 6-node path (60..10, edges between consecutive) has diameter 5:
    // min-label 10 must propagate five hops, so any
    // single-round-and-stop bug fails loudly; plus a disjoint pair.
    import spark.implicits._
    val pairs = Seq((10L, 20L), (20L, 30L), (30L, 40L), (40L, 50L), (50L, 60L),
      (100L, 200L)).toDF("doc_id_1", "doc_id_2")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[Long]("lbl"), r.getAs[Long]("cluster_size")))
      .toMap
    Seq(10L, 20L, 30L, 40L, 50L, 60L).foreach(id => assert(cc(id) == (10L, 6L)))
    Seq(100L, 200L).foreach(id => assert(cc(id) == (100L, 2L)))
  }

  test("connected components handle diameter >> round cap (large/small-star)") {
    // a 201-node path has diameter 200: O(diameter) label propagation
    // could never finish within MaxCcRounds=30, so this converging at
    // all proves the O(log n) star-contraction bound, not just
    // correctness. Ids are descending so the component min (1000) sits
    // at one END of the chain — the worst case for propagation.
    import spark.implicits._
    val ids = (0 to 200).map(i => 3000L - 10L * i) // 3000, 2990, …, 1000
    val pairs = ids.zip(ids.tail).toDF("doc_id_1", "doc_id_2")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[Long]("lbl"), r.getAs[Long]("cluster_size")))
      .toMap
    assert(cc.size == 201)
    ids.foreach(id => assert(cc(id) == (1000L, 201L)))
  }

  test("span dedup: exactly one non-dup occurrence per distinct span") {
    // every distinct span has exactly one kept (first) occurrence, so
    // Σ n_spans − Σ n_dup_spans must equal the number of distinct
    // spans in the corpus — and only docs with ≥ SpanTokens tokens
    // appear
    val d = Dedup.spanDedup(spark, SfDir)
    val (tot, dup) = {
      val r = d.agg(sum("n_spans"), sum("n_dup_spans")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val distinctSpans = Tables.documents(spark, SfDir)
      .select(explode(graft.functions.NGrams.ngrams(col("text"), Dedup.SpanTokens)).as("s"))
      .agg(countDistinct(col("s"))).collect()(0).getLong(0)
    assert(tot - dup == distinctSpans)
    assert(d.filter(col("dup_ratio") < 0 || col("dup_ratio") > 1).isEmpty)
  }

  test("shard manifest partitions the corpus into disjoint ordered ranges") {
    val m = Pipeline.shardManifest(spark, SfDir).collect()
    assert(m.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, SfDir).count())
    val ids = m.map(_.getAs[Long]("shard_id"))
    assert(ids.forall(i => i >= 0 && i < Pipeline.ExportShards))
    assert(ids.sameElements(ids.sorted))
    // shards are key-disjoint and ordered: each shard's min exceeds
    // the previous shard's max
    m.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("min_key") > a.getAs[Long]("max_key"))
      case _ =>
    }
  }

  test("cluster assigns every planted doc to its original's component") {
    val c = Dedup.cluster(spark, SfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val planted = c.keys.filter(_ >= Dedup.PlantOffset)
    assert(planted.nonEmpty)
    planted.foreach { id =>
      assert(c(id) == c(id - Dedup.PlantOffset),
        s"planted $id not clustered with its original")
    }
  }

  test("near-dedup keeps exactly one doc per component") {
    val nd = Dedup.nearDedupCorpus(spark, SfDir)
    val totals = nd.agg(sum("n_docs").as("d"), sum("n_kept").as("k")).collect()(0)
    // dropped == sum over components of (size - 1): one canonical each
    val expectedDropped = Dedup.cluster(spark, SfDir)
      .select("cluster_id", "cluster_size").distinct().collect()
      .map(_.getAs[Long]("cluster_size") - 1).sum
    assert(totals.getLong(0) - totals.getLong(1) == expectedDropped)
  }

  test("perplexity is positive and covers exactly the multi-token docs") {
    val p = TextAnalysis.perplexity(spark, SfDir)
    assert(p.filter(col("avg_nll") <= 0.0).count() == 0)
    val expected = Tables.documents(spark, SfDir)
      .filter(size(graft.functions.Text.tokens(lower(col("text")))) >= 2).count()
    assert(p.count() == expected)
  }

  test("domain mix keeps at most n_source docs at a clamped positive rate") {
    val m = Pipeline.domainMix(spark, SfDir).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      val frac = r.getAs[Double]("keep_frac")
      assert(frac > 0.0 && frac <= 1.0)
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_source"))
      // a clamped source keeps everything
      if (frac == 1.0) assert(r.getAs[Long]("n_kept") == r.getAs[Long]("n_source"))
    }
  }

  test("langid predicts a language for every doc, deterministically") {
    val l1 = TextAnalysis.langId(spark, SfDir).collect()
    val l2 = TextAnalysis.langId(spark, SfDir).collect()
    assert(l1.sameElements(l2))
    assert(l1.forall(r => r.getString(2).nonEmpty))
  }
}
