package graft

import org.apache.spark.sql.functions._

/** Round-11 operators and hardening. */
class Round11OpsSpec extends SparkTestBase {

  test("pipe_near_decontaminate survives a non-broadcastable candidate set") {
    import spark.implicits._
    val stage = "/root/repo/target/graft_neardec_stress"
    // A full-width eval suite (all 50 benchmark ids) against a
    // MIRROR-HEAVY corpus: every benchmark doc has 8 distinct edited
    // near-copies on the training side, so the candidate set is ~400
    // pairs — the regime where a forced broadcast(cand) hint is a
    // scale hazard (VERDICT r10 #5). With autoBroadcastJoinThreshold
    // = -1 NOTHING unhinted may broadcast: the candidate join must
    // plan as a shuffled join and still produce identical admissions.
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lam", "mu")
    def docText(i: Long, edit: Int): String = {
      val base = (0 until 8).map(j => words(((i + j) % 12).toInt))
      (if (edit >= 0) base.init :+ s"edit$edit" else base).mkString(" ")
    }
    val B = operators.Pipeline.BenchmarkMaxId
    val bench = (0L until B).map(i => (i, "en", "bench", docText(i, -1)))
    val leaks = for (i <- 0L until B; k <- 0 until 8) yield
      (B + i * 8 + k, "en", "web", docText(i, k))
    (bench ++ leaks).map { case (id, l, s, t) => (id, l, s, t, t.length.toLong) }
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$stage/documents.parquet")
    val default = operators.Pipeline.nearDecontaminate(spark, stage)
      .collect().map(_.toSeq).toSeq
    assert(default.nonEmpty, "stress corpus produced no admissions")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val strict = operators.Pipeline.nearDecontaminate(spark, stage)
        .collect().map(_.toSeq).toSeq
      assert(strict == default,
        "shuffled-join fallback changed the admission set")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  /** Hand-computed BPE fixture: vocab {aaa: 10, abab: 3}.
    * Round 1: (a,a) count 20 (2 per "aaa" — overlapping pair counted
    *   per adjacent position — plus 0 in "abab"... the 6 (a,b) and 3
    *   (b,a) lose) → "aaa" refolds GREEDILY to [aa, a], never [a, aa].
    * Round 2: (aa,a) 10 → [aaa]. Round 3: (a,b) 6 → "abab" → [ab,ab]
    *   (both non-overlapping occurrences merge in one round).
    * Round 4: (ab,ab) 3 → [abab]. Round 5: NO pairs remain — the
    *   loop must stop minting merges well before NumMerges.
    */
  test("pipe_bpe_train: greedy left-to-right merges and clean exhaustion") {
    import spark.implicits._
    val stage = "/root/repo/target/graft_bpe_tiny"
    Seq((1L, "en", "t", ("aaa " * 10).trim + " abab abab abab", 0L))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$stage/documents.parquet")
    val got = operators.Bpe.bpeTrain(spark, stage).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, "a", "a", "aa", 20L),
      (2L, "aa", "a", "aaa", 10L),
      (3L, "a", "b", "ab", 6L),
      (4L, "ab", "ab", "abab", 3L)),
      s"merge sequence diverged from the hand replay: $got")
  }

  test("pipe_bpe_encode: ids follow alphabet-then-merge-order numbering") {
    // Same fixture: alphabet {a→0, b→1}; minted symbols aa→2, aaa→3,
    // ab→4, abab→5. "aaa" encodes to [3], "abab" to [5].
    val stage = "/root/repo/target/graft_bpe_tiny"
    val enc = operators.Bpe.bpeEncode(spark, stage).collect()
    assert(enc.length == 1)
    val r = enc.head
    assert(r.getLong(1) == 13L, s"n_words: ${r.getLong(1)}") // 10 aaa + 3 abab
    assert(r.getLong(2) == 13L, s"n_bpe_tokens: ${r.getLong(2)}") // all 1-symbol
    assert(r.getString(3) == (List.fill(10)("3") ++ List.fill(3)("5")).mkString(" "),
      s"ids: ${r.getString(3)}")
  }

  test("plan telemetry: the bucketed join reads zero join-side exchanges") {
    import org.apache.spark.sql.graftshim.PlanTelemetry
    val df = SparkEntry.queries("src_bucketed_join_census")(spark, SfDir)
    // executedOf, not count()+of: count() runs a separate
    // QueryExecution and the assertion would pin the STATIC plan
    // (ADVICE r11 #1)
    val t = PlanTelemetry.executedOf(df)
    // the fact-fact join itself is exchange-free (bucketed layout);
    // the ONLY exchanges in the whole executed plan are the post-join
    // 3-row status rollup and the final orderBy
    assert(t.exchanges == 2,
      s"bucketed census should carry exactly the 2 rollup exchanges: $t")
    assert(t.skewSplits == 0)
    // the unbucketed twin of the same join must pay its join shuffles
    // (broadcast disabled so the tiny test SF can't hide them)
    import org.apache.spark.sql.functions._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = Tables.orders(spark, SfDir)
        .join(Tables.lineitem(spark, SfDir),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n_rows"))
        .orderBy("o_orderstatus")
      val t2 = PlanTelemetry.executedOf(plain)
      assert(t2.exchanges == t.exchanges + 2,
        s"unbucketed twin should add exactly the 2 join shuffles: $t2 vs $t")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("stream_upsert_sink_census: re-drain and batch replay are no-ops") {
    val census = SparkEntry.queries("stream_upsert_sink_census")(spark, SfDir)
      .collect().map(_.toSeq).toSeq
    assert(census.nonEmpty)
    val root = operators.StreamingOps.upsertRoot(SfDir)
    val commits = new java.io.File(s"$root/commits").listFiles.map(_.getName).sorted
    assert(commits.length == 4, s"expected 4 micro-batch commits: ${commits.toSeq}")
    // re-drain: same checkpoint discovers no new files — a resumption,
    // not a reprocessing; census and commit log unchanged
    val again = SparkEntry.queries("stream_upsert_sink_census")(spark, SfDir)
      .collect().map(_.toSeq).toSeq
    assert(again == census, "re-drain changed the upserted state")
    assert(new java.io.File(s"$root/commits").listFiles.length == 4)
    // at-least-once REPLAY: re-apply an already-committed batchId with
    // POISONED data (every event duplicated); the commit marker must
    // make the application a no-op — this is the exactly-once proof
    val poison = Tables.events(spark, SfDir)
      .select("event_id", "user_id", "event_type", "ts", "value")
    operators.StreamingOps.applyUpsertBatch(spark, root,
      poison.unionAll(poison), commits.head.toLong)
    val afterReplay = SparkEntry.queries("stream_upsert_sink_census")(spark, SfDir)
      .collect().map(_.toSeq).toSeq
    assert(afterReplay == census, "replayed batch was double-applied")
  }

  test("wc_betweenness: hand-replayed Brandes on planted path + cycle graphs") {
    import spark.implicits._
    val stage = "/root/repo/target/graft_betweenness_graph"
    // Two components; 7 nodes total, so the count-derived landmark
    // modulus is 1 and EVERY node seeds — landmark Brandes degenerates
    // to exact Brandes, which is hand-computable (parity node
    // encoding: customer c → 2c, supplier s → 2s+1):
    //  P3: c1 — s77 — c2        (center carries all 4 ordered pairs)
    //  C4: c3/c4 — s78/s79      (each pair of opposite nodes has TWO
    //                            shortest paths, σ = 2, so every
    //                            intermediate splits the dependency)
    val edges = Seq((1L, 77L), (2L, 77L),
      (3L, 78L), (3L, 79L), (4L, 78L), (4L, 79L))
    edges.zipWithIndex.map { case ((c, _), i) => (i.toLong, c) }
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$stage/orders.parquet")
    edges.zipWithIndex.map { case ((_, s), i) => (i.toLong, s) }
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$stage/lineitem.parquet")
    val got = operators.WordCount.betweennessCentrality(spark, stage)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (2L, 2L, 0L), (4L, 2L, 0L),
      (6L, 3L, 1000000L), (8L, 3L, 1000000L),
      (2L * 77 + 1, 2L, 2000000L),
      (2L * 78 + 1, 3L, 1000000L), (2L * 79 + 1, 3L, 1000000L)),
      s"betweenness diverged from the hand replay: $got")
  }

  test("pipe_bpe_train equals an independent reference BPE on random corpora (property)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    import spark.implicits._
    // independent in-JVM reference: greedy left-to-right merge of the
    // (max count, lexicographically smallest) pair, weighted by word
    // frequency — written directly from the Sennrich semantics, no
    // shared code with the Spark fold
    def refMerge(seq: List[String], a: String, b: String): List[String] = {
      val buf = scala.collection.mutable.ListBuffer.empty[String]
      seq.foreach { x =>
        if (buf.nonEmpty && buf.last == a && x == b) {
          buf.remove(buf.length - 1); buf += (a + b)
        } else buf += x
      }
      buf.toList
    }
    def refBpe(tokens: Seq[String]): Seq[(String, String, Long)] = {
      var vocab = tokens.groupBy(identity).map { case (w, ws) =>
        w -> (w.map(_.toString).toList, ws.size.toLong) }
      val out = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
      var done = false
      while (out.length < operators.Bpe.NumMerges && !done) {
        val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.values.foreach { case (seq, c) =>
          seq.sliding(2).filter(_.length == 2).foreach { p =>
            pairs((p(0), p(1))) = pairs.getOrElse((p(0), p(1)), 0L) + c
          }
        }
        if (pairs.isEmpty) done = true
        else {
          val ((a, b), c) = pairs.toSeq
            .sortBy { case ((l, r), n) => (-n, l, r) }.head
          out += ((a, b, c))
          vocab = vocab.map { case (w, (seq, n)) => w -> (refMerge(seq, a, b), n) }
        }
      }
      out.toList
    }
    // words over a tiny alphabet so pair counts collide and tie-breaks
    // actually fire; repeats so counts vary
    val word = for {
      len <- Gen.choose(1, 5)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val corpus = Gen.choose(3, 25).flatMap(n => Gen.listOfN(n, word))
    var caseNo = 0
    val prop = Prop.forAll(corpus) { tokens =>
      caseNo += 1 // fresh dir per case: trainMerges memoizes per (session, dir)
      val dir = s"/root/repo/target/graft_bpe_prop/c$caseNo"
      Seq((1L, "en", "p", tokens.mkString(" "), 0L))
        .toDF("doc_id", "lang", "source", "text", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      operators.Bpe.trainMerges(spark, dir) == refBpe(tokens)
    }
    val res = check(Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("ann_nndescent_knn: descent improves on init and recalls exact kNN") {
    import org.apache.spark.sql.functions._
    val K = operators.Similarity.NdK
    val got = operators.Similarity.nndescentKnn(spark, SfDir).collect()
    val n = Tables.embeddings(spark, SfDir).count()
    assert(got.length == n * K, s"expected full ${n}x$K graph, got ${got.length}")
    // exact kNN per node (driver-side at the test SF) for recall@K
    val vecs = Tables.embeddings(spark, SfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val exact = vecs.map { case (id, v) =>
      id -> vecs.toSeq.filter(_._1 != id)
        .map { case (j, w) => (j, cos(v, w)) }
        .sortBy { case (j, c) => (-c, j) }.take(K).map(_._1).toSet
    }
    val approx = got.groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(2)).toSet }
    val recall = approx.map { case (id, nb) =>
      nb.intersect(exact(id)).size.toDouble / K }.sum / approx.size
    // two descent rounds on the stride+cell-representative init must
    // land well above both chance (K/n ≈ 0.016) and the init-only
    // graph (≈0.145 measured): the corpus is unstructured random
    // embeddings — the hard case for neighbor-of-neighbor descent —
    // and the measured trajectory is 0.145 init → 0.32 → 0.455
    assert(recall >= 0.35, f"NN-descent recall@$K collapsed: $recall%.3f")
  }

  test("pipe_bpe_fertility is consistent with the encode artifact") {
    import org.apache.spark.sql.functions._
    val fert = SparkEntry.queries("pipe_bpe_fertility")(spark, SfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the same totals must fall out of pipe_bpe_encode's per-doc rows
    val enc = SparkEntry.queries("pipe_bpe_encode")(spark, SfDir)
      .join(Tables.documents(spark, SfDir).select("doc_id", "source"), Seq("doc_id"))
      .groupBy("source")
      .agg(sum("n_words").as("w"), sum("n_bpe_tokens").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fert == enc, s"fertility totals diverged from encode: $fert vs $enc")
  }

  test("pipe_detokenize_roundtrip: the subword path reconstructs every doc") {
    val rows = SparkEntry.queries("pipe_detokenize_roundtrip")(spark, SfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(1),
        s"${r.getString(0)}: n_bpe_exact ${r.getLong(4)} != n_docs ${r.getLong(1)}")
    }
  }
}
