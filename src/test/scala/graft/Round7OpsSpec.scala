package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-7 changes beyond their DuckDB oracles. */
class Round7OpsSpec extends SparkTestBase {

  test("rankVocab bucket-offset rank equals the global frequency rank") {
    import spark.implicits._
    // Counts straddling every band boundary: log-band head (with a tie
    // across different first chars), the 16/17 exact/log edge, 32/33
    // power-of-two edge, and a deep cnt=1 tail spanning many first-char
    // prefixes with ties inside each prefix.
    val vocab = (
      Seq("zz-head" -> 9000L, "aa-head" -> 9000L, "gamma" -> 500L,
        "delta" -> 64L, "eps" -> 33L, "zeta" -> 32L, "eta" -> 31L,
        "theta" -> 17L, "iota" -> 16L, "kappa" -> 16L, "mu" -> 15L,
        "nu" -> 2L) ++
        ('a' to 'z').flatMap(c => Seq(s"${c}x" -> 1L, s"${c}y" -> 1L))
      ).toDF("w", "cnt")
    val got = operators.Pipeline.rankVocab(vocab).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val want = vocab.collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (w, c) => (-c, w) }
      .zipWithIndex.map { case ((w, _), i) => w -> (i + 1).toLong }.toMap
    assert(got === want)
  }

  test("rankVocab plan has NO unpartitioned window at all") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val toks = Tables.documents(spark, SfDir)
      .select(posexplode(graft.functions.Text.tokens(lower(col("text"))))
        .as(Seq("pos", "w")))
    val ranked = operators.Pipeline.rankVocab(
      toks.groupBy("w").agg(count(lit(1)).as("cnt")))
    val plan = ranked.queryExecution.optimizedPlan
    plan.foreach {
      case w: LWindow =>
        assert(w.partitionSpec.nonEmpty,
          "offsets are a theta-join prefix sum — no global window may appear")
      case _ =>
    }
  }

  test("codegen guard counts CodeGenerator errors and the risky queries stay clean") {
    CodegenGuard.install()
    CodegenGuard.reset()
    // positive control: the counter must see an ERROR routed through the
    // same logger Spark's codegen compiler uses
    org.apache.logging.log4j.LogManager
      .getLogger("org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
      .error("synthetic codegen failure (guard positive control)")
    assert(CodegenGuard.count === 1L, "guard missed a CodeGenerator ERROR")
    CodegenGuard.reset()
    // the expression-heaviest queries — the ones that have previously
    // flirted with janino's budget — must compile cleanly end to end
    Seq("ann_pq_topk", "dd_simhash", "dd_minhash_lsh", "mm_chunk",
      "txt_fingerprint", "pipe_tokenize_to_ids").foreach { q =>
      SparkEntry.queries(q)(spark, SfDir).count()
    }
    assert(CodegenGuard.count === 0L,
      "a stage silently fell out of whole-stage codegen")
  }

  test("rankVocab equals the global rank on random zipf-ish vocabularies (property)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    import spark.implicits._
    // words over a small alphabet (forcing shared first-char prefixes
    // and lexicographic ties), counts drawn zipf-ish so the mass sits
    // in the exact-band tail with occasional log-band heads
    val word = for {
      len <- Gen.choose(1, 6)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', 'z'))
    } yield cs.mkString
    val entry = for {
      w <- word
      c <- Gen.frequency(
        6 -> Gen.choose(1L, 3L), 3 -> Gen.choose(4L, 40L),
        1 -> Gen.choose(41L, 100000L))
    } yield (w, c)
    val vocabGen = Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, entry))
      .map(_.groupBy(_._1).map { case (w, es) => (w, es.head._2) }.toSeq)
    val prop = Prop.forAll(vocabGen) { entries =>
      val got = operators.Pipeline.rankVocab(entries.toDF("w", "cnt")).collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      val want = entries.sortBy { case (w, c) => (-c, w) }
        .zipWithIndex.map { case ((w, _), i) => w -> (i + 1).toLong }.toMap
      got == want
    }
    val res = check(Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("semantic dedup drops exactly the planted copies and keeps originals") {
    val out = operators.Similarity.semanticDedup(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = Tables.embeddings(spark, SfDir).count()
    val planted = out.filter(_._1 >= operators.Similarity.SemPlantOffset)
    assert(out.length === n + planted.length)
    assert(planted.nonEmpty, "no planted copies — the recall check is vacuous")
    // every planted copy has its lower-id original at cosine ~1 in the
    // same cluster, so ALL planted rows are dups and NO original is
    // (the synthetic corpus has no natural pair above cosine 0.48)
    assert(planted.forall(_._3 == 1L))
    assert(out.filter(_._1 < operators.Similarity.SemPlantOffset).forall(_._3 == 0L))
    // and each planted copy shares its original's cluster
    val cluster = out.map(t => t._1 -> t._2).toMap
    planted.foreach { case (id, cid, _) =>
      assert(cluster(id - operators.Similarity.SemPlantOffset) === cid,
        s"planted $id strayed from its original's cluster")
    }
  }

  test("zipf fit is an exact OLS over the vocabulary's log-log points") {
    val r = operators.TextAnalysis.zipfFit(spark, SfDir).collect().head
    val (nv, nt) = (r.getLong(0), r.getLong(1))
    // recompute the OLS in plain Scala from the exact frequency table
    val freq = Tables.documents(spark, SfDir)
      .select(explode(graft.functions.Text.tokens(lower(col("text")))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt")).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    assert(nv === freq.length.toLong)
    assert(nt === freq.map(_._2).sum)
    val pts = freq.sortBy { case (w, c) => (-c, w) }.zipWithIndex
      .map { case ((_, c), i) => (math.log((i + 1).toDouble), math.log(c.toDouble)) }
    val n = pts.length.toDouble
    val (mx, my) = (pts.map(_._1).sum / n, pts.map(_._2).sum / n)
    val sxy = pts.map { case (x, y) => (x - mx) * (y - my) }.sum
    val sxx = pts.map { case (x, _) => (x - mx) * (x - mx) }.sum
    assert(math.abs(r.getDouble(2) - sxy / sxx) < 1e-5,
      s"slope ${r.getDouble(2)} vs recomputed ${sxy / sxx}")
  }

  test("space-saving bounds hold under ANY partitioning and merge order (property)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    import graft.functions.{SpaceSavingAgg, SSBuf}
    // the merge is commutative but NOT associative once pruning bites
    // (documented contract): the [ub − err, ub] bracket must bracket
    // the true count for EVERY merge tree, not just Spark's
    val tokenGen = Gen.frequency(
      5 -> Gen.oneOf("a", "b", "c"),
      3 -> Gen.oneOf("d", "e", "f", "g"),
      2 -> Gen.choose(0, 50).map("t" + _))
    val caseGen = for {
      stream <- Gen.listOfN(120, tokenGen)
      cap <- Gen.choose(3, 12)
      nChunks <- Gen.choose(1, 5)
      cuts <- Gen.listOfN(nChunks - 1, Gen.choose(0, stream.length))
      order <- Gen.choose(0L, Long.MaxValue) // seeds the merge order
    } yield (stream, cap, cuts.sorted, order)
    val prop = Prop.forAll(caseGen) { case (stream, cap, cuts, seed) =>
      val agg = new SpaceSavingAgg(cap)
      val bounds = (0 +: cuts) :+ stream.length
      val chunks = bounds.sliding(2).map { case Seq(a, b) =>
        stream.slice(a, b).foldLeft(agg.zero)(agg.reduce)
      }.toVector
      val rnd = new scala.util.Random(seed)
      // random left/right fold order = a random merge tree shape
      var acc: SSBuf = chunks.head
      chunks.tail.foreach { c =>
        acc = if (rnd.nextBoolean()) agg.merge(acc, c) else agg.merge(c, acc)
      }
      val out = agg.finish(acc)
      val truth = stream.groupBy(identity).map { case (t, ts) => t -> ts.size.toLong }
      out.size <= cap &&
        out.forall { e =>
          val t = truth.getOrElse(e.token, 0L)
          t <= e.ub && t >= e.ub - e.err
        }
    }
    val res = check(Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("incremental rollup merges non-vacuous state and delta partials") {
    val ev = Tables.events(spark, SfDir)
    val nState = ev.filter(col("event_id") % 10 =!= 0).count()
    val nDelta = ev.filter(col("event_id") % 10 === 0).count()
    assert(nState > 0 && nDelta > 0,
      "both sides of the split must be populated or the merge proof is vacuous")
    val out = operators.Events.incrementalRollup(spark, SfDir).collect()
    assert(out.map(_.getLong(2)).sum === nState + nDelta)
    out.foreach { r =>
      assert(r.getDouble(5) <= r.getDouble(6) + 1e-9) // min <= max
      val avg = r.getDouble(4)
      assert(avg >= r.getDouble(5) - 1e-9 && avg <= r.getDouble(6) + 1e-9)
    }
  }

  test("global shuffle is a permutation with balanced round-robin shards") {
    val rows = operators.Pipeline.globalShuffle(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = Tables.documents(spark, SfDir).count()
    assert(rows.length === n)
    assert(rows.map(_._2).sorted.toSeq === (1L to n).toSeq, "pos not a permutation")
    val sizes = rows.groupBy(_._3).values.map(_.length)
    assert(sizes.max - sizes.min <= 1, s"unbalanced shards: $sizes")
    // the order must actually be shuffled, not id order
    val byPos = rows.sortBy(_._2).map(_._1)
    assert(byPos.toSeq !== byPos.sorted.toSeq, "permutation degenerated to id order")
  }

  test("bloom join equals the plain join and the pre-filter really prunes") {
    import graft.functions.Bloom
    import operators.Relational._
    val got = relBloomJoin(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val plain = Tables.lineitem(spark, SfDir)
      .join(Tables.supplier(spark, SfDir)
        .filter(col("s_nationkey") === BloomJoinNation),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("s_suppkey").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === plain.toSeq)
    // the bitmap must reject most foreign fact rows, or it's saturated
    val dim = Tables.supplier(spark, SfDir)
      .filter(col("s_nationkey") === BloomJoinNation).select(col("s_suppkey"))
    val bloom = dim.agg(
      Bloom.bloomAgg(BloomJoinBits, BloomJoinK)(col("s_suppkey")).as("bloom"))
    val fact = Tables.lineitem(spark, SfDir).select(col("l_suppkey"))
    val total = fact.count()
    val positives = fact.crossJoin(broadcast(bloom))
      .filter(Bloom.mightContain(col("l_suppkey"), col("bloom"), BloomJoinK))
      .count()
    val trueMatches = fact.join(broadcast(dim),
      col("l_suppkey") === col("s_suppkey"), "leftsemi").count()
    assert(positives >= trueMatches) // no false negatives, ever
    assert(positives < total / 2,
      s"bloom passed $positives of $total fact rows — saturated bitmap")
  }

  test("scd2 intervals are per-key disjoint and current only at the tail") {
    val rows = operators.Events.scd2Intervals(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3),
        r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, ivs) =>
      val sorted = ivs.sortBy(iv => (iv._2, iv._3))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 <= b._2,
          s"intervals overlap: $a then $b")
        case _ =>
      }
      // only an interval nothing follows can be current, so it is
      // unique and last (a tombstone-closed tail has none at all)
      assert(sorted.count(_._4) <= 1)
      sorted.dropRight(1).foreach(iv => assert(!iv._4))
      sorted.filter(_._4).foreach(iv => assert(iv._3 == Long.MaxValue))
    }
  }

  test("z-order buckets bound BOTH dimensions (the pruning property)") {
    val b = Tables.lineitem(spark, SfDir).agg(
      min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).collect()(0)
    val pSpan = math.max(b.getLong(1) - b.getLong(0), 1L)
    val sSpan = math.max(b.getLong(3) - b.getLong(2), 1L)
    val buckets = operators.Relational.relZorderCluster(spark, SfDir).collect()
    assert(buckets.length > 1)
    // a bucket fixes the top 4 normalized bits of EACH dim → it spans
    // ≤ 16 of the 256 levels, i.e. ≤ 16·span/255 raw units (+2 for the
    // two integer-floor cell edges). A lexicographic (part, supp) sort
    // could not bound supp at all.
    buckets.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 16L * pSpan / 255 + 2,
        s"bucket ${r.getLong(0)} part span ${r.getLong(3) - r.getLong(2)}")
      assert(r.getLong(5) - r.getLong(4) <= 16L * sSpan / 255 + 2,
        s"bucket ${r.getLong(0)} supp span ${r.getLong(5) - r.getLong(4)}")
    }
  }

  test("filter funnel is monotone and chains n_in(k+1) == n_kept(k)") {
    val rows = operators.Pipeline.filterFunnel(spark, SfDir).collect()
      .sortBy(_.getLong(0))
    assert(rows.length === 4)
    assert(rows.head.getLong(2) === Tables.documents(spark, SfDir).count())
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2))
      assert(r.getLong(4) === r.getLong(2) - r.getLong(3))
      // every stage discriminates at this SF — no vacuous threshold
      assert(r.getLong(3) > 0 && r.getLong(4) > 0)
    }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b.getLong(2) === a.getLong(3))
      case _ =>
    }
  }

  test("ivfpq keeps real recall@10 vs brute force despite both cuts") {
    val bf = operators.Similarity.bruteforceTopk(spark, SfDir)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = operators.Similarity.ivfpqTopk(spark, SfDir)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty)
    // two lossy stages compound (probe half the cells × 16-entry
    // codebooks), but the composite must still surface a real fraction
    // of the true neighbor lists — collapse here means a wiring bug
    // (empty probe sets, LUT misindexing), not quantization error
    val recall = bf.intersect(got).size.toDouble / bf.size
    assert(recall >= 0.4, s"ivfpq recall@10 = $recall")
  }

  test("degree histogram mass equals the symmetrized edge count") {
    val rows = operators.WordCount.degreeDist(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // handshake identity: Σ deg·n_nodes = |symmetrized edges| = 2·|eraw|
    val o = Tables.orders(spark, SfDir).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, SfDir).select("l_orderkey", "l_suppkey")
    val nPairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select("o_custkey", "l_suppkey").distinct().count()
    assert(rows.map(r => r._1 * r._2).sum === 2 * nPairs)
    rows.foreach { case (deg, _, band) =>
      assert(band === (63 - java.lang.Long.numberOfLeadingZeros(deg)).toLong)
    }
  }

  test("table diff counts match the closed-form snapshot derivation") {
    val got = operators.Relational.relTableDiff(spark, SfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val keys = Tables.orders(spark, SfDir).select("o_orderkey")
      .collect().map(_.getLong(0))
    val added = keys.count(k => k % 7 == 1 && k % 7 != 2)
    val removed = keys.count(k => k % 7 == 2)
    val changed = keys.count(k => k % 7 != 1 && k % 7 != 2 && k % 5 == 0)
    val unchanged = keys.count(k => k % 7 != 1 && k % 7 != 2 && k % 5 != 0)
    assert(got("added")._1 === added)
    assert(got("removed")._1 === removed)
    assert(got("changed")._1 === changed)
    assert(got("unchanged")._1 === unchanged)
    // every changed row was perturbed by exactly +1.00 → −100 cents each
    assert(got("changed")._2 === -100L * changed)
    assert(got("unchanged")._2 === 0L)
  }

  test("dataset card partitions the corpus and bounds its own fields") {
    val rows = operators.Pipeline.datasetCard(spark, SfDir).collect()
    val total = Tables.documents(spark, SfDir).count()
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(1))           // uniq texts ≤ docs
      assert(r.getLong(6) <= r.getLong(1))           // top-lang docs ≤ docs
      assert(r.getLong(3) >= 1 && r.getLong(6) >= 1) // non-degenerate
    }
  }

  test("readability columns replay the formula from raw text exactly") {
    val byId = operators.TextAnalysis.readability(spark, SfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    def halfUp(p: Long, q: Long): Long = (2 * p + q) / (2 * q)
    Tables.documents(spark, SfDir).select("doc_id", "text").collect()
      .take(50).foreach { r =>
        val (id, text) = (r.getLong(0), r.getString(1))
        val w = text.toLowerCase.split(graft.functions.Text.TokenSplitRegex)
          .count(_.nonEmpty).toLong
        val s = text.split("[.!?]+").count(_.trim.nonEmpty).toLong
        val y = "[aeiouy]+".r.findAllIn(text.toLowerCase).length.toLong
        val e3 = 206835L - halfUp(1015 * w, math.max(s, 1)) -
          halfUp(84600 * y, math.max(w, 1))
        assert(byId(id) === ((w, s, y, e3)), s"doc $id")
      }
  }

  test("k-core is a genuine fixpoint and genuinely peeled something") {
    val rows = operators.WordCount.kcore(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    // fixpoint condition: every surviving node's degree WITHIN the
    // surviving subgraph is >= k — that IS the k-core definition
    rows.foreach { case (n, d) =>
      assert(d >= operators.WordCount.KCoreK, s"node $n kept deg $d")
    }
    // and the peel must have removed real mass (k was chosen so the
    // thinned graph loses nodes at every SF)
    val o = Tables.orders(spark, SfDir).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, SfDir).select("l_orderkey", "l_suppkey")
    val nAll = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .filter(pmod(col("o_custkey") + col("l_suppkey"), lit(3L)) === 0L)
      .select(explode(array(col("o_custkey") * 2,
        col("l_suppkey") * 2 + operators.WordCount.SuppParity)).as("n"))
      .distinct().count()
    assert(rows.length < nAll, s"peel removed nothing: ${rows.length} of $nAll")
  }

  test("bfs distances replay driver-side from the raw edge list") {
    val o = Tables.orders(spark, SfDir).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, SfDir).select("l_orderkey", "l_suppkey")
    val eraw = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"),
        (col("l_suppkey") * 2 + operators.WordCount.SuppParity).as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (eraw ++ eraw.map(_.swap)).groupBy(_._1).map { case (k, v) =>
      k -> v.map(_._2).toSet
    }
    val src = adj.keys.min
    // textbook queue BFS — an independent third construction next to
    // the Spark frontier loop and the dense unrolled oracle
    val dist = scala.collection.mutable.Map(src -> 0L)
    var level = Vector(src)
    while (level.nonEmpty) {
      val next = level.flatMap(adj).distinct.filterNot(dist.contains)
      next.foreach(n => dist(n) = dist(level.head) + 1)
      level = next
    }
    val got = operators.WordCount.bfsDistance(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === dist.toMap)
    assert(got.values.max >= 2L, "graph degenerately shallow")
  }

  test("lpa labels replay driver-side for the fixed round count") {
    val o = Tables.orders(spark, SfDir).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, SfDir).select("l_orderkey", "l_suppkey")
    val eraw = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"),
        (col("l_suppkey") * 2 + operators.WordCount.SuppParity).as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = eraw ++ eraw.map(_.swap)
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lbl = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to operators.WordCount.LpaRounds)
      lbl = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(lbl).map { case (lb, xs) => lb -> xs.size }
        val mx = counts.values.max
        n -> counts.filter(_._2 == mx).keys.min
      }
    val got = operators.WordCount.lpaCommunities(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === lbl)
    assert(got.values.toSet.size > 1, "collapsed to one community")
    assert(got.values.toSet.size < got.size, "no propagation happened")
  }

  test("int8 quantization codes replay driver-side and stay in range") {
    val got = operators.Similarity.quantizeInt8(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    val raw = Tables.embeddings(spark, SfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    got.foreach { case (id, scaleUm, sumQ, sumQ2, nSat) =>
      val v = raw(id).map(_.toDouble)
      val m = v.map(math.abs).max
      val q = v.map(x => math.floor(x * 127.0 / m + 0.5).toLong)
      assert(q.forall(c => c >= -127L && c <= 127L), s"vec $id code range")
      assert(scaleUm === math.floor(m * 1000000.0 + 0.5).toLong, s"vec $id scale")
      assert(sumQ === q.sum, s"vec $id sum")
      assert(sumQ2 === q.map(c => c * c).sum, s"vec $id sumsq")
      assert(nSat === q.count(c => math.abs(c) == 127L).toLong, s"vec $id sat")
      assert(nSat >= 1L, s"vec $id: max element must saturate")
    }
  }

  test("clustering coefficients bound, sum to 3T, and replay the division") {
    val rows = operators.WordCount.clusteringCoeff(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (node, deg, nTri, nWedge, coeffE6) =>
      assert(deg >= 2, s"node $node")
      assert(nWedge === deg * (deg - 1) / 2, s"node $node wedges")
      assert(nTri <= nWedge, s"node $node: triangles exceed wedges")
      assert(coeffE6 >= 0L && coeffE6 <= 1000000L, s"node $node coeff range")
      // the integer HALF_UP identity
      assert(coeffE6 === (2 * nTri * 1000000L + nWedge) / (2 * nWedge), s"node $node div")
    }
    // per-node triangle mass = 3 * global triangle count (each triangle
    // has three corners); ties per-node output to the proven global op
    val globalT = operators.WordCount.triangleCount(spark, SfDir)
      .collect()(0).getAs[Long]("n_triangles")
    assert(rows.map(_._3).sum === 3L * globalT, "corner mass != 3T")
  }

  test("dim moments replay driver-side for one (label, dim) cell") {
    val got = operators.Similarity.dimMoments(spark, SfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got.nonEmpty)
    val raw = Tables.embeddings(spark, SfDir)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    val lbl = raw.head._1
    (0 until 4).foreach { d =>
      val xs = raw.filter(_._1 == lbl)
        .map(p => math.floor(p._2(d).toDouble * 1e6 + 0.5).toLong)
      val e = (xs.length.toLong, xs.sum, xs.map(x => x * x).sum, xs.min, xs.max)
      assert(got((lbl, d.toLong)) === e, s"cell ($lbl, $d)")
    }
    // every (label, dim) cell of a rectangular corpus is present
    val labels = raw.map(_._1).distinct.length
    assert(got.size === labels * 64)
  }

  test("lang confusion cells partition the corpus and shares sum to ~1e6") {
    val rows = operators.TextAnalysis.langConfusion(spark, SfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val total = Tables.documents(spark, SfDir).count()
    assert(rows.map(_._3).sum === total, "cells must partition the corpus")
    rows.groupBy(_._1).foreach { case (tl, cells) =>
      assert(cells.map(_._3).sum === cells.head._4, s"$tl row total")
      // HALF_UP shares of one row differ from 1e6 by at most #cells/2
      val s = cells.map(_._5).sum
      assert(math.abs(s - 1000000L) <= cells.length.toLong, s"$tl shares sum $s")
    }
    // matches a direct recomputation from the per-doc langid output
    val perDoc = operators.TextAnalysis.langId(spark, SfDir).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val expect = perDoc.groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (tl, pl, n, _, _) =>
      assert(expect((tl, pl)) === n, s"cell ($tl, $pl)")
    }
  }

  test("pca top component is unit-norm and its projection census replays") {
    val (u, lambda) = operators.Similarity.pcaComponent(spark, SfDir)
    val norm = math.sqrt(u.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-12, s"||u|| = $norm")
    assert(lambda > 0.0)
    val raw = Tables.embeddings(spark, SfDir)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    // replay the exact executor arithmetic: ascending double accumulation
    val expect = raw.groupBy(_._1).map { case (lbl, vs) =>
      val pus = vs.map { case (_, v) =>
        var s = 0.0
        var i = 0
        while (i < v.length) { s += u(i) * v(i).toDouble; i += 1 }
        math.floor(s * 1e6 + 0.5).toLong
      }
      lbl -> (pus.length.toLong, pus.sum, pus.map(math.abs).sum, pus.min, pus.max)
    }
    val got = operators.Similarity.pcaTopComponent(spark, SfDir).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (lbl, e) => assert(got(lbl) === e, s"label $lbl") }
  }

  test("ewma decay replays driver-side for a sample user") {
    val got = operators.Events.ewma(spark, SfDir)
      .filter(col("user_id") === 3L).collect()
      .map(r => (r.getLong(1), r.getDouble(3)))
    assert(got.nonEmpty)
    val evs = Tables.events(spark, SfDir).filter(col("user_id") === 3L)
      .select(unix_millis(col("ts")).as("ms"), col("event_id"),
        round(col("value") * 100).cast("long").as("vc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(e => (e._1, e._2))
    val expect = evs.indices.map { i =>
      val lo = math.max(0, i - (operators.Events.EwmaLags - 1))
      val s = (lo to i).map(j => evs(j)._3 << (operators.Events.EwmaLags - 1 - (i - j))).sum
      evs(i)._2 -> s.toDouble / (1L << (operators.Events.EwmaLags - 1)).toDouble
    }.toMap
    got.foreach { case (eid, v) =>
      assert(v === expect(eid), s"event $eid")
    }
  }

  test("trailing range window replays driver-side for a sample user") {
    val rows = operators.Events.trailingWindow(spark, SfDir)
      .filter(col("user_id") === 3L).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val evs = Tables.events(spark, SfDir).filter(col("user_id") === 3L)
      .select(unix_millis(col("ts")).as("ms"),
        round(col("value") * 100).cast("long").as("vc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.foreach { case (ms, n, s) =>
      val frame = evs.filter(e => e._1 >= ms - 3600000L && e._1 <= ms)
      assert(n === frame.length.toLong, s"at $ms")
      assert(math.abs(s - frame.map(_._2).sum / 100.0) < 1e-9, s"at $ms")
    }
  }

  test("kmeans centroid strings decode to in-range scaled components") {
    val out = operators.Similarity.kmeans(spark, SfDir).collect()
    // embeddings are unit-scale floats: every ×1e6 component must stay
    // well inside ±10⁸ — a garbled join or format drift would explode this
    out.foreach { r =>
      val comps = r.getString(2).split(" ").map(_.toLong)
      assert(comps.length === 64)
      assert(comps.forall(c => math.abs(c) < 100000000L))
    }
  }
}
