package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.PlanTelemetry

/** Round-12 operators and hardening. */
class Round12OpsSpec extends SparkTestBase {

  test("plan telemetry reads the FINAL adaptive plan: skew splits are visible") {
    import spark.implicits._
    // ADVICE r11 #1: PlanTelemetry.of after count() read the STATIC
    // plan, so skew_splits was structurally 0 in every bench.json
    // entry. This is the positive control for the executedOf fix: a
    // deliberately skewed sort-merge join under aggressive AQE skew
    // thresholds MUST surface PartialReducerPartitionSpec splits —
    // and the old static read on the same frame must miss them.
    val prev = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE re-checks broadcastability at runtime with its OWN threshold;
    // both must be off or it demotes the SMJ before skew handling runs
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    try {
      def skewed = {
        // key must be data-dependent (a lit() key constant-folds the
        // equi-join away); ~99% of rows land on key 1
        val left = spark.range(40000)
          .select(when(col("id") % 100 < 99, lit(1L))
            .otherwise(col("id") % 8).as("k"),
            rpad(col("id").cast("string"), 64, "x").as("pay"))
        val right = spark.range(8)
          .select(col("id").as("k"), col("id").as("r"))
        // the agg must reference pay or column pruning strips the
        // payload from the shuffle and the partition ducks under the
        // skew threshold
        left.join(right, "k").select(sum(length(col("pay"))).as("n"))
      }
      val staticRead = PlanTelemetry.of(skewed)
      assert(staticRead.skewSplits == 0,
        "static (un-executed) plan should not show splits — it has no AQE reads yet")
      val t = PlanTelemetry.executedOf(skewed)
      assert(t.skewSplits > 0,
        s"executed final plan must surface the AQE skew splits: $t")
      assert(t.exchanges >= 2, s"SMJ must keep its two join shuffles: $t")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("dd_incremental_probe: stored-index probe matches the one-shot pipeline and reuses the staging") {
    val probe = operators.Dedup.incrementalProbe(spark, SfDir)
    val oneShot = operators.Dedup.minhashLshPlanted(spark, SfDir)
    assert(probe.count() > 0)
    assert(probe.exceptAll(oneShot).count() == 0 &&
      oneShot.exceptAll(probe).count() == 0,
      "stored-index probe diverged from the in-memory LSH pipeline")
    // idempotent staging: a second probe must REUSE the index, not
    // rebuild it (the whole point of the incremental shape)
    val marker = java.nio.file.Paths.get(
      operators.Dedup.lshIndexPathFor(SfDir), "_SOURCE")
    val before = java.nio.file.Files.getLastModifiedTime(marker)
    operators.Dedup.incrementalProbe(spark, SfDir).count()
    assert(java.nio.file.Files.getLastModifiedTime(marker) == before,
      "second probe rebuilt the persisted index")
    // and the probe plan actually READS the persisted artifact (the
    // index side comes from parquet scans, not a corpus recompute)
    val plan = operators.Dedup.incrementalProbe(spark, SfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_lsh_index"),
      "probe plan does not scan the staged index")
  }

  test("src_snapshot_census: v1 reads prune to the v1 manifest and ignore the v2 commit") {
    val stage = operators.Sources.stageSnapshotDir(spark, SfDir)
    val schema = Tables.documents(spark, SfDir).schema
    val v1 = operators.Sources.readSnapshot(spark, stage, 1, schema)
    // time travel: the v2 commit (append file + delete vector) already
    // sits in the same directory, yet v1 equals the original table
    val orig = Tables.documents(spark, SfDir)
    assert(v1.count() == orig.count() && v1.count() > 0)
    assert(v1.select("doc_id").exceptAll(orig.select("doc_id")).count() == 0)
    // manifest-level file pruning: the v1 scan must NOT touch the
    // append file — commits are invisible until their manifest is read
    val v1Files = v1.select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    assert(v1Files.nonEmpty && !v1Files.exists(_.contains("append-v2")),
      s"v1 scan leaked the v2 append file: $v1Files")
    // v2 sees the append and not the deleted ids
    val v2 = operators.Sources.readSnapshot(spark, stage, 2, schema)
    assert(v2.filter(col("doc_id") % 5 === 0 &&
      col("doc_id") < operators.Sources.SnapAppendOffset).count() == 0,
      "v2 still contains delete-vector rows")
    assert(v2.filter(col("doc_id") >= operators.Sources.SnapAppendOffset).count() ==
      orig.filter(col("doc_id") % 7 === 0).count(),
      "v2 append rows missing")
  }

  test("ann_index_probe: persisted IVF index serves the in-memory pipeline's answers") {
    val probe = operators.Similarity.annIndexProbe(spark, SfDir)
    val mem = operators.Similarity.ivfTopkPlanted(spark, SfDir)
    assert(probe.count() > 0)
    assert(probe.exceptAll(mem).count() == 0 && mem.exceptAll(probe).count() == 0,
      "stored-index probe diverged from the in-memory IVF pipeline")
    val marker = java.nio.file.Paths.get(
      operators.Similarity.stageIvfIndex(spark, SfDir), "_SOURCE")
    val before = java.nio.file.Files.getLastModifiedTime(marker)
    operators.Similarity.annIndexProbe(spark, SfDir).count()
    assert(java.nio.file.Files.getLastModifiedTime(marker) == before,
      "second probe rebuilt the persisted IVF index")
    val plan = operators.Similarity.annIndexProbe(spark, SfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_ivf_index"),
      "probe plan does not scan the staged index")
  }

  test("stream_index_ingest: the stream-built index serves the batch-built answers") {
    val streamed = operators.StreamingOps.streamIndexIngest(spark, SfDir)
      .collect().map(_.toSeq).toSeq
    val batch = operators.Dedup.incrementalProbe(spark, SfDir)
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "streamed index diverged from the batch-staged index probe")
  }

  test("ann_mips_topk ranks by inner product, not angle") {
    val mips = operators.Similarity.mipsTopk(spark, SfDir)
      .select("q_id", "rank", "vec_id").collect().map(_.toSeq).toSeq
    val cos = operators.Similarity.bruteforceTopkAgg(spark, SfDir)
      .select("q_id", "rank", "vec_id").collect().map(_.toSeq).toSeq
    assert(mips.nonEmpty && mips.size == cos.size)
    // norms vary across the synthetic embeddings, so the two metrics
    // must produce genuinely different rankings somewhere — if they
    // ever became identical the op would be a redundant alias
    assert(mips != cos, "MIPS ordering collapsed to the cosine ordering")
  }

  test("pipe_viterbi_segment: hand-replayed DP on the tiny BPE fixture") {
    import spark.implicits._
    val stage = "/root/repo/target/graft_vit_tiny"
    // 10×"aaa" + 3×"abab" (the Round11 BPE fixture): merges mint
    // aa(2), aaa(3), ab(4), abab(5) over alphabet a(0), b(1).
    // Scores s(p) = 1000·len²−id:
    //   a=1000, b=999, aa=3998, aaa=8997, ab=3996, abab=15995.
    // Hand DP: "aaa" → whole piece 8997 beats aa+a (4998) and a·3
    // (3000); "abab" → whole 15995 beats ab+ab (7992).
    Seq((0L, "en", "web", (List.fill(10)("aaa") ++ List.fill(3)("abab")).mkString(" ")))
      .map { case (id, l, s, t) => (id, l, s, t, t.length.toLong) }
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$stage/documents.parquet")
    val got = operators.Bpe.viterbiSegment(spark, stage).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("aaa", 3L, 8997L), ("abab", 4L, 15995L)),
      s"Viterbi diverged from the hand replay: $got")
  }

  test("ev_sessionize money field is exact integer cents on both paths") {
    import spark.implicits._
    // exact-quarter values (0.25 is binary-exact): per-event HALF_UP
    // cents make the session total a closed-form integer under ANY
    // addition order — the association-independence the old
    // round(sum(double),2) contract could not promise (ADVICE r11 #2).
    val stage = "/root/repo/target/graft_cents_events"
    val rows = (0 until 64).map { i =>
      (i.toLong, 0L, i * 60000L, i + 0.25)
    }
    rows.toDF("event_id", "user_id", "ms", "v")
      .select(col("event_id"), col("user_id"),
        timestamp_millis(col("ms")).as("ts"), lit("click").as("event_type"),
        col("v").as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$stage/events.parquet")
    val default = operators.Events.sessionize(spark, stage)
      .collect().map(_.toSeq).toSeq
    spark.conf.set("graft.session.skewsafe", "true")
    val safe =
      try operators.Events.sessionize(spark, stage).collect().map(_.toSeq).toSeq
      finally spark.conf.unset("graft.session.skewsafe")
    assert(default == safe, s"paths diverged:\n $default\n $safe")
    // one session (1-min spacing); cents(i) = 100i + 25 exactly
    val cents = default.head(5).asInstanceOf[Long]
    assert(cents == (0 until 64).map(i => 100L * i + 25L).sum,
      s"expected exact HALF_UP per-event cents, got $cents")
  }
}
