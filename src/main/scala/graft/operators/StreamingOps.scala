package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GQuery, Tables}
import graft.Ckpt.TruncOps
import graft.streaming.EventsStreaming

/** Structured-Streaming operators promoted to the driver-visible
  * registry (SURVEY.md §2.C): each query builds the INCREMENTAL plan
  * (file source → watermark → stateful operator → sink), drains the
  * staged test corpus through it with `processAllAvailable`, and
  * returns the sink table — so the DuckDB oracle certifies the
  * streaming semantics themselves, not just a batch twin. In
  * production the same plans run unbounded (files landing / Kafka);
  * state is bounded by the watermark (windows/joins/sessions) or the
  * sketch capacity, which is what lets them run forever at 100 TB/day.
  *
  * Reference ground: the reference replays its MapReduce jobs over
  * directory inputs as they land
  * (/root/reference/mapreduce/coordinator/algorithm.py:start_map);
  * these are the always-on forms of the same jobs.
  */
object StreamingOps {

  /** Drain a streaming DF into a memory sink and return the table.
    * Memory-sink names are global per SparkSession: each query uses a
    * fixed `graft_`-prefixed name, replaced on re-run (bench reruns).
    * `Trigger.AvailableNow` plans the whole backlog up front and
    * stops itself (including the watermark-flush batches append-mode
    * operators need) — fewer micro-batch round-trips than the default
    * trigger + `processAllAvailable` polling, which at bench scale is
    * a dominant, data-size-independent cost of the family.
    */
  private def drain(spark: SparkSession, df: DataFrame, name: String,
      mode: String): DataFrame =
    withDrainConf(spark) {
      val q = df.writeStream.outputMode(mode).format("memory")
        .queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
      spark.table(name)
    }

  /** HARNESS-ONLY state sizing: a streaming query instantiates one
    * state store per shuffle partition per stateful operator per
    * micro-batch — at the batch session's 32 partitions that fixed
    * cost dwarfs the staged test corpus and is constant in data size
    * (the r8 bench floor). The drain pins 8 partitions for the stream
    * it starts (state-partition count is fixed at first start by this
    * conf), then restores. Production sizing is the opposite: an
    * unbounded 100 TB/day stream sets this to match state volume,
    * exactly like batch shuffle sizing.
    */
  private def withDrainConf[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    // state-partition count, parameterised (spark.graft.stream.statePartitions
    // — spark.-prefixed so it can also arrive as a -D system property);
    // see the scaladoc above for why the harness default is corpus-bound
    spark.conf.set(key,
      spark.conf.getOption("spark.graft.stream.statePartitions")
        .getOrElse("8"))
    try body finally spark.conf.set(key, prev)
  }

  /** Root for staged empty seed slices (see `linkEmptySeed`). */
  private val EmptySeedRoot = "/root/repo/target/graft_empty_seed"

  /** Stage (once per schema) one EMPTY parquet part file and symlink
    * it as `dst` — the constant empty seed slice every ingest drain
    * needs so its post-drain reads exist even when no batch writes
    * (empty corpus). r16 shape: each timed pass re-executed a Spark
    * write of an empty frame per seed (3 jobs for the LSH layout, 1-2
    * for DV/IVF/graph); the seed is schema-only, so a staged part
    * file + symlink is byte-equivalent at zero jobs per invocation.
    */
  private def linkEmptySeed(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType, dst: String): Unit = {
    val part = synchronized {
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(schema.toDDL.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val d = java.nio.file.Paths.get(EmptySeedRoot, key)
      val marker = d.resolve("_SCHEMA")
      if (!java.nio.file.Files.exists(marker)) {
        // one-partition empty RDD — emptyRDD has ZERO partitions and
        // would write no part file at all, leaving nothing to link
        spark.createDataFrame(
            spark.sparkContext.parallelize(
              Seq.empty[org.apache.spark.sql.Row], 1), schema)
          .write.mode("overwrite").parquet(d.toString)
        java.nio.file.Files.write(marker, schema.toDDL.getBytes("UTF-8"))
      }
      d.toFile.listFiles.find(_.getName.startsWith("part-")).get.toPath
    }
    val dstDir = java.nio.file.Paths.get(dst)
    java.nio.file.Files.createDirectories(dstDir)
    java.nio.file.Files.createSymbolicLink(
      dstDir.resolve("part-00000-seed.parquet"), part)
  }

  /** Tumbling 1-hour event-time rollup, incrementally maintained.
    * Complete mode so the windows the 2-hour watermark has not sealed
    * when the source drains are still visible to the oracle.
    */
  def streamHourlyRollup(spark: SparkSession, dir: String): DataFrame = {
    val events = EventsStreaming.readEvents(
      spark, EventsStreaming.stageEventsDir(dir))
    drain(spark, EventsStreaming.hourlyRollup(events),
      "graft_stream_hourly", "complete")
      .orderBy("hour_ms", "event_type")
  }

  /** Streaming word count over the staged raw-text corpus — the
    * reference's flagship job in its always-on form. Complete-mode
    * counts after drain ARE the batch word count; the incremental
    * state is the per-word partial, the same map-side partial
    * aggregation as the batch plan.
    */
  def streamWordcount(spark: SparkSession, dir: String): DataFrame =
    drain(spark,
      EventsStreaming.wordcount(spark, WordCount.stageTextDir(spark, dir)),
      "graft_stream_wc", "complete")
      .orderBy("word")

  /** Streaming heavy hitters promoted to the driver-visible registry:
    * the stream folds into ONE mergeable SpaceSaving summary (state =
    * `cap` entries regardless of vocabulary — the sketch analogue of
    * the watermark bound; see EventsStreaming.heavyHitters), drained
    * at the exact-degeneration capacity (cap ≥ vocab ⇒ no eviction,
    * err 0, count_ub exact), so the STREAMING sketch path — per-batch
    * partials, state-store merge, head extraction — hash-checks
    * against plain word-count top-k in DuckDB, exactly like the batch
    * twin `wc_heavy_hitters_exact`. The sub-capacity eviction
    * behavior stays pinned by StreamingSpec's bound assertions.
    */
  def streamHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    drain(spark,
      EventsStreaming.heavyHitters(spark, WordCount.stageTextDir(spark, dir),
        WordCount.HeavyHitterExactCap),
      "graft_stream_hh", "complete")
      .select(explode(col("summary")).as("e"))
      .select(col("e.token").as("token"), col("e.ub").as("count_ub"),
        col("e.err").as("err"))
      .orderBy(desc("count_ub"), asc("token"))
      .limit(WordCount.HeavyHitterK)

  /** Stream-stream interval join: purchases joined to the same user's
    * clicks in the preceding hour. Append mode — pairs are emitted
    * exactly once, when the two-sided watermark proves no further
    * match can arrive; per-user state is bounded to the hour horizon.
    */
  def streamClickAttribution(spark: SparkSession, dir: String): DataFrame = {
    val events = EventsStreaming.readEvents(
      spark, EventsStreaming.stageEventsDir(dir))
    drain(spark, EventsStreaming.clickAttribution(events),
      "graft_stream_attrib", "append")
      .orderBy("event_id", "c_ms")
  }

  /** LEFT OUTER interval join, drained to batch equality: unmatched
    * purchases can only emit their NULL-click row once the watermark
    * seals them, and a drained finite source leaves the tail of the
    * timeline unsealed — so, exactly like `stream_sessionize`, two
    * far-future sentinel drops (one click + one purchase on the
    * negative sentinel user, filtered back out) advance both sides'
    * watermarks past every real purchase's window and a final batch
    * under the advanced watermark flushes the remaining outer rows —
    * the streaming end-of-input. The result must equal DuckDB's batch
    * LEFT JOIN row-for-row, nulls included.
    */
  def streamClickAttributionOuter(spark: SparkSession, dir: String): DataFrame = {
    val all = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    def sentinel(id: Long, ms: Long, tpe: String): DataFrame =
      spark.range(1).select(lit(id).as("event_id"),
        timestamp_millis(lit(ms)).as("ts"), lit(-1L).as("user_id"),
        lit(tpe).as("event_type"), lit(0.0).as("value"))
    // Pre-stage corpus + both sentinel generations and drain with
    // AvailableNow + maxFilesPerTrigger=1: the files process as
    // ordered micro-batches — FileStreamSource orders by MODIFICATION
    // TIME, which the stagings force strictly increasing (ADVICE r11
    // #3; staged sentinel slices carry staging-time mtimes strictly
    // above the staged corpus) — each batch-end advances the
    // watermark, and the NEXT batch emits what the previous one
    // sealed — same determinism as the interactive sentinel protocol
    // at a third of the drain round-trips.
    // r17: the sentinels are a deterministic function of the corpus
    // (its max event time), so they are STAGED once per corpus like
    // the corpus drop itself — the per-pass corpus-scale max(ts)
    // action and two sentinel write jobs now run only at staging time
    // (stageSlicedDrop evaluates its slices by-name).
    val watch = java.nio.file.Files.createTempDirectory("graft_attr_outer")
    EventsStreaming.stageCorpusDrop(all, dir, "events5", watch.toString)
    EventsStreaming.stageSlicedDrop({
      val maxMs = Option(all.select(max(unix_millis(col("ts")))).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      Seq(
        sentinel(-1L, maxMs + 10L * 3600 * 1000, "click")
          .unionByName(sentinel(-2L, maxMs + 10L * 3600 * 1000, "purchase")),
        sentinel(-3L, maxMs + 20L * 3600 * 1000, "click")
          .unionByName(sentinel(-4L, maxMs + 20L * 3600 * 1000, "purchase")))
    }, dir, "attr_outer_sent", watch.toString)
    val joined = EventsStreaming.clickAttributionOuter(
      spark.readStream.schema(all.schema)
        .option("maxFilesPerTrigger", 1).parquet(watch.toString))
    drain(spark, joined, "graft_stream_attrib_outer", "append")
      .filter(col("user_id") >= 0)
      .orderBy("event_id", "c_ms")
  }

  /** Streaming INDEX MAINTENANCE — the missing third of the
    * persisted-index story (`dd_incremental_probe` probes it,
    * `stageLshIndex` batch-builds it; production indexes are kept
    * fresh by a STREAM): the documents corpus arrives as ordered file
    * micro-batches, and foreachBatch computes each batch's shingle
    * rows / MinHash signatures / band buckets / set sizes with the
    * SAME shared Dedup primitives the batch build uses (signatures
    * are per-doc, hence batch-computable with no cross-batch state)
    * and writes them into BATCH-KEYED subdirectories with overwrite
    * semantics — a retried micro-batch overwrites ITS OWN
    * subdirectory, so replay is idempotent by construction (the
    * table-format trick without the manifest; plain `append` would
    * duplicate rows on retry — the `stream_upsert_sink_census`
    * lesson applied to index maintenance).
    * After the drain, the planted twin batch probes the STREAMED
    * index through the same verify join as `dd_incremental_probe` —
    * so the DuckDB brute-force oracle hash-checks stream-built index
    * == batch-built index == ground truth in one row. At 100 TB this
    * is the shape that keeps dedup current between full rebuilds:
    * per-batch cost is O(batch), the probe never re-scans the corpus.
    */
  def streamIndexIngest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val (watch, idx) = ingestLshIndex(spark, docs, dir)
    sealAndClean(
      Dedup.plantedPairsOnly(Dedup.probeLshIndex(spark, idx.toString,
        Dedup.ingestBatchOf(docs))),
      watch, idx)
  }

  /** Eagerly materialize the (constant-size) census, then reclaim the
    * per-invocation temp roots the drain staged — repeated bench and
    * correctness sweeps were accumulating the watch + index slices on
    * disk (ADVICE r13 #2). `localCheckpoint` pins the result rows in
    * block storage (partition order, hence row order, preserved), so
    * the returned frame outlives its directories.
    */
  private def sealAndClean(df: DataFrame,
      dirs: java.nio.file.Path*): DataFrame = {
    val out = df.localCheckpoint()
    dirs.foreach { d =>
      if (java.nio.file.Files.exists(d)) Staging.deleteTree(d)
    }
    out
  }

  /** Compact a stream-maintained index: rewrite every subtable's
    * accumulated batch-keyed slices into one consolidated version
    * directory and commit it with the manifest-pointer swap (the
    * `Staging.stagedDir` commit protocol, applied to an index the
    * stream owns — one atomic `_CURRENT` rename is the only mutation
    * a reader can observe). This is the missing last step of the maintained-
    * index lifecycle (VERDICT r13 #3): per-batch overwrite keeps
    * replay idempotent but accumulates one directory per micro-batch
    * forever — unbounded small files at production cadence, the
    * problem `src_compaction_census` solves for data files. The serve
    * path is layout-blind (recursiveFileLookup), so a probe reads the
    * compacted index unchanged — CompactionLifecycleSpec pins probe
    * equality and the file-count drop. `coalesce(1)` because each
    * subtable here is KB-scale; production compaction bins slices to
    * a target file size per partition (the `compactionPlan` shape)
    * and runs incrementally — the commit protocol is identical.
    */
  private[graft] def compactStreamedIndex(spark: SparkSession, idx: String,
      tables: Seq[(String, String)]): Unit = {
    val nonce = System.nanoTime()
    val root = java.nio.file.Paths.get(idx)
    // serve-path resolution: a previously-compacted root reads its
    // committed version; a live flat layout (stream-appended batch
    // slices) reads the root itself
    val live = Staging.resolveOpt(idx).getOrElse(idx)
    val vname = s"v-compact-$nonce"
    // dot-prefixed while half-written (hidden from any Spark/Hadoop
    // listing), renamed to its final name only when complete, made
    // current only by the atomic `_CURRENT` pointer swap — VERDICT
    // r14 #2: the old two-directory-rename swap had a window with NO
    // index at the serve path; under the pointer commit a reader
    // resolves to the old complete layout or the new one, never to
    // nothing (StagedSwapSpec pins the interleaving)
    val tmp = root.resolve(s".tmp-$vname")
    // the subtables are independent read→rewrite jobs over disjoint
    // directories: submit them concurrently (guide §2.6 — overlapping
    // independent jobs back-fills the executor slots one small job's
    // tail would leave idle; at production compaction cadence the
    // same shape overlaps per-partition rewrite bins)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(tables.size, 1))
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val jobs = tables.map { case (t, schema) =>
        scala.concurrent.Future {
          val sub = if (t.isEmpty) live else s"$live/$t"
          val dst = if (t.isEmpty) s"$tmp/compact" else s"$tmp/$t/compact"
          spark.read.schema(schema)
            .option("recursiveFileLookup", "true").parquet(sub)
            .coalesce(1)
            .write.mode("overwrite").parquet(dst)
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(jobs),
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
    java.nio.file.Files.move(tmp, root.resolve(vname),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    val displaced = Staging.commitPointer(root, vname)
    // one-generation retention, like Staging.stagedDir: the version
    // displaced by THIS compaction survives until the next one
    Staging.expireVersions(root,
      Set(vname) ++ displaced.map(_.getFileName.toString))
    if (displaced.isEmpty) {
      // first compaction of a flat live layout: retire the
      // pre-pointer batch slices AFTER the pointer landed (production
      // retention would expire them on a delay — src_vacuum_census)
      val ls = java.nio.file.Files.list(root)
      try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala.toSeq
          .filter { p =>
            val n = p.getFileName.toString
            n != vname && !n.startsWith(Staging.CurrentPointer)
          }
          .foreach(p => if (java.nio.file.Files.isDirectory(p))
            Staging.deleteTree(p) else java.nio.file.Files.delete(p))
      } finally ls.close()
    }
  }

  /** The streamed-LSH-index lifecycle COMPLETED: ingest the corpus as
    * micro-batches (per-batch subdirectories, replay-idempotent),
    * compact the accumulated slices into one consolidated layout, and
    * probe the COMPACTED index through the identical serve path — so
    * the closed-form brute-force oracle certifies that compaction
    * changed the file layout and nothing else. At 100 TB this is the
    * scheduled job that keeps a stream-maintained index from
    * dissolving into per-minute micro-files between full rebuilds.
    */
  def streamIndexCompaction(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val (watch, idx) = ingestLshIndex(spark, docs, dir)
    compactStreamedIndex(spark, idx.toString, Dedup.LshIndexTables)
    sealAndClean(
      Dedup.plantedPairsOnly(Dedup.probeLshIndex(spark, idx.toString,
        Dedup.ingestBatchOf(docs))),
      watch, idx)
  }

  /** The ingest half of `stream_index_ingest` /
    * `stream_index_compaction`: drain the corpus into a fresh
    * batch-keyed LSH index layout. Returns the (watch, index) temp
    * roots — the CALLER owns their cleanup (`sealAndClean`).
    */
  private[graft] def ingestLshIndex(spark: SparkSession, docs: DataFrame,
      dir: String): (java.nio.file.Path, java.nio.file.Path) = {
    val watch = java.nio.file.Files.createTempDirectory("graft_idx_ingest")
    // three roughly equal corpus slices arrive as ordered batches —
    // staged once per corpus (r17): the slices are pure pmod filters
    // of the corpus, so re-writing them per invocation was 3
    // corpus-scale Spark write jobs per timed pass
    EventsStreaming.stageSlicedDrop(
      (0 to 2).map(i => docs.filter(pmod(col("doc_id"), lit(3L)) === i.toLong)),
      dir, "docs3", watch.toString)
    val idx = java.nio.file.Files.createTempDirectory("graft_idx_stream")
    // seed every index table with an EMPTY slice so the post-drain
    // reads exist even when no batch writes (empty corpus) — explicit
    // schemas besides; schema-only, so served from the staged empty
    // part (schema derivation is analysis-only, no job)
    val emptyDocs = docs.filter(lit(false))
    linkEmptySeed(spark,
      Dedup.shingleHashRowsOf(emptyDocs).select("doc_id", "sh").schema,
      s"$idx/shingles/seed")
    linkEmptySeed(spark,
      Dedup.bandBucketsOf(Dedup.sigsOf(Dedup.shingleHashRowsOf(emptyDocs))).schema,
      s"$idx/buckets/seed")
    linkEmptySeed(spark,
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, sh_size BIGINT"),
      s"$idx/sizes/seed")
    withDrainConf(spark) {
      val q = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(watch.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          // overwrite into a batchId-keyed subdirectory: a retried
          // micro-batch replaces its own slice — idempotent replay
          val r = Dedup.shingleHashRowsOf(batch).localCheckpoint()
          r.select("doc_id", "sh")
            .write.mode("overwrite").parquet(s"$idx/shingles/b$batchId")
          Dedup.bandBucketsOf(Dedup.sigsOf(r))
            .write.mode("overwrite").parquet(s"$idx/buckets/b$batchId")
          r.groupBy("doc_id").agg(count(lit(1)).as("sh_size"))
            .write.mode("overwrite").parquet(s"$idx/sizes/b$batchId")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    (watch, idx)
  }

  /** One micro-batch of IVF index maintenance: assign the batch's
    * vectors to the ALREADY-TRAINED centroids (read back from the
    * index — no retraining, the whole point) and overwrite the
    * batch's own `assigned/b<batchId>` subdirectory — idempotent
    * under micro-batch replay, like `streamIndexIngest`'s writer.
    */
  private[graft] def appendVecBatch(spark: SparkSession, idx: String,
      batch: DataFrame, batchId: Long): Unit = {
    // resolve the pointer when the root has been compacted (ADVICE
    // r15 #2): a per-batch slice appended to the FLAT root after a
    // compaction would be invisible to both the serve path and the
    // next compaction, which resolve `_CURRENT` — writing into the
    // committed version keeps post-compaction appends served and
    // compactable; a fresh (never-compacted) root resolves to itself
    val live = Staging.resolveOpt(idx).getOrElse(idx)
    val centroids = spark.read.schema("cell_id BIGINT, cv ARRAY<FLOAT>")
      .option("recursiveFileLookup", "true").parquet(s"$live/centroids")
    Similarity.ivfAssign(batch, centroids)
      .write.mode("overwrite").parquet(s"$live/assigned/b$batchId")
  }

  /** Vector-side streaming index maintenance (VERDICT r12 #4) — the
    * IVF mirror of `stream_index_ingest`: centroids are trained ONCE
    * from the corpus (the offline half every vector store runs, here
    * written up front), then the corpus arrives as three ordered
    * micro-batches of vectors, each of which assigns ITSELF to the
    * stored centroids and appends a per-batchId cell file — recurring
    * cost O(batch × √n cells), no corpus re-index, replay-idempotent
    * by per-batch overwrite. After the drain, the planted query set
    * probes the STREAM-MAINTAINED layout through the identical
    * `readIvfIndex`/`ivfProbe` serve path as `ann_index_probe`, so
    * one closed-form oracle certifies stream-built == batch-built ==
    * ground truth. At 100 TB this is what keeps ANN serving current
    * between full rebuilds.
    */
  /** Append one micro-batch of positional delete commands as the
    * batch's own `batch=<id>` subdirectory — idempotent under replay
    * by per-batch overwrite, like `appendVecBatch`.
    */
  private[graft] def appendDvBatch(spark: SparkSession, root: String,
      batch: DataFrame, batchId: Long): Unit =
    batch.repartition(1).write.mode("overwrite")
      .parquet(s"$root/batch=b$batchId")

  /** Streaming maintenance of the positional-delete sidecar — the DV
    * member of the stream-maintained-artifact family (LSH index r12,
    * IVF index r13): the data files are staged once (immutable, the
    * whole point of merge-on-read), then the delete commands arrive
    * as three ordered micro-batches of (file, position) rows, each
    * appended as its own per-batchId directory — recurring cost
    * O(batch), no data-file rewrite, replay-idempotent by per-batch
    * overwrite. After the drain the census runs through the identical
    * layout-agnostic `dvCensusOf` serve path as
    * `src_delete_vector_census`, so one closed-form oracle certifies
    * stream-maintained == batch-staged == ground truth. At 100 TB
    * this is how row-level deletes land between compactions: DV
    * commits, never data rewrites.
    */
  def streamDvIngest(spark: SparkSession, dir: String): DataFrame = {
    val stage = Sources.stageDvDir(spark, dir)
    val cmds = spark.read.schema("file_name STRING, pos BIGINT")
      .parquet(s"$stage/dv")
    val watch = java.nio.file.Files.createTempDirectory("graft_dv_ingest")
    // ordered command slices staged once per corpus (r17 — the
    // stageSlicedDrop protocol; the slices are pure pmod filters of
    // the staged DV command table)
    EventsStreaming.stageSlicedDrop(
      (0 to 2).map(i => cmds.filter(pmod(col("pos"), lit(3L)) === i.toLong)),
      dir, "dvcmd3", watch.toString)
    val root = java.nio.file.Files.createTempDirectory("graft_dv_stream")
    // seed an empty slice so the post-drain read exists even when the
    // corpus (and so the command stream) is empty — schema-only,
    // served from the staged empty part
    linkEmptySeed(spark, cmds.schema, s"$root/batch=seed")
    withDrainConf(spark) {
      val q = spark.readStream.schema(cmds.schema)
        .option("maxFilesPerTrigger", 1).parquet(watch.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          appendDvBatch(spark, root.toString, batch, batchId)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    sealAndClean(
      Sources.dvCensusOf(Sources.readDvData(spark, stage),
        spark.read.schema("file_name STRING, pos BIGINT")
          .option("recursiveFileLookup", "true").parquet(root.toString)),
      watch, root)
  }

  def streamVecIndexIngest(spark: SparkSession, dir: String): DataFrame = {
    val e = Similarity.vecs(spark, dir).select(col("vec_id"), col("v"))
    val watch = java.nio.file.Files.createTempDirectory("graft_vecidx_ingest")
    // ordered vector slices staged once per corpus (r17 — the
    // stageSlicedDrop protocol; pure pmod filters of the corpus)
    EventsStreaming.stageSlicedDrop(
      (0 to 2).map(i => e.filter(pmod(col("vec_id"), lit(3L)) === i.toLong)),
      dir, "vec3", watch.toString)
    val idx = java.nio.file.Files.createTempDirectory("graft_vecidx_stream")
    // Offline centroid training served from the STAGED IVF index
    // (r17): `stageIvfIndex` persists exactly `ivfCentroidsOf(e)` —
    // deterministic hash sampling, same corpus — once per corpus dir
    // (cold fill accounted in memo_fill_breakdown.ivf_index). This is
    // the same staged-offline-artifact shape the graph twin
    // (`stream_graph_index_ingest`) already uses via `stageKnnGraph`;
    // re-training per invocation was a corpus-scale sample + write
    // inside every timed pass of a query whose subject is the
    // STREAMING maintenance half, not the offline build.
    val stagedIdx = Similarity.stageIvfIndex(spark, dir)
    val cdst = java.nio.file.Paths.get(s"$idx/centroids/seed")
    java.nio.file.Files.createDirectories(cdst)
    new java.io.File(s"$stagedIdx/centroids").listFiles
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      .zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.createSymbolicLink(
          cdst.resolve(s"part-$i-centroids.parquet"), f.toPath)
      }
    // seed assigned/ with an empty slice so the post-drain read exists
    // even for an empty corpus (the RobustnessSpec contract) —
    // ivfAssign of an empty batch is provably empty (groupBy over no
    // rows), so the seed is schema-only
    linkEmptySeed(spark,
      org.apache.spark.sql.types.StructType.fromDDL(
        "vec_id BIGINT, v ARRAY<FLOAT>, cell_id BIGINT"),
      s"$idx/assigned/seed")
    withDrainConf(spark) {
      val q = spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1).parquet(watch.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          appendVecBatch(spark, idx.toString, batch, batchId)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    val (centroids, assigned) = Similarity.readIvfIndex(spark, idx.toString)
    sealAndClean(
      Similarity.ivfProbe(centroids, assigned,
          Similarity.plantedVecQueriesOf(e))
        .filter(col("rank") === 1L)
        .orderBy("q_id"),
      watch, idx)
  }

  /** One micro-batch of graph-index maintenance: the batch's NEW
    * vectors beam-search the ALREADY-BUILT static graph for their
    * link sets (no rebuild — the HNSW insert path: a node's links ARE
    * its search result) and overwrite the batch's own `edges/b<id>`
    * slice — idempotent under micro-batch replay, like
    * `appendVecBatch`.
    */
  private[graft] def appendGraphBatch(spark: SparkSession, root: String,
      staticEdges: DataFrame, e: DataFrame, batch: DataFrame,
      batchId: Long): Unit = {
    // pointer-aware like appendVecBatch (ADVICE r15 #2)
    val live = Staging.resolveOpt(root).getOrElse(root)
    Similarity.beamSearchTopK(staticEdges, e, batch)
      .write.mode("overwrite").parquet(s"$live/edges/b$batchId")
  }

  /** Graph-side streaming index maintenance — completes the graph-ANN
    * lifecycle the way `stream_vec_index_ingest` completed IVF's
    * (build `ann_nndescent_knn`, persist+serve `ann_graph_probe`, now
    * MAINTAIN): the static serve adjacency is staged once (the
    * offline build), then new vectors arrive as three ordered
    * micro-batches, each of which finds its own link set by
    * deterministic beam search AGAINST THE STATIC GRAPH (recurring
    * cost O(batch × beam × K × hops) — no NN-descent re-run, no
    * corpus re-scan) and appends a per-batchId edge slice,
    * replay-idempotent by per-batch overwrite. New nodes link into
    * the static graph only (batch-order independence — the
    * insert-edge set is identical however the stream slices the
    * arrivals), so the drained maintained layout is closed-form and
    * the SAME hop-for-hop DuckDB replay as `ann_graph_probe`
    * hash-checks stream-built == batch beam search == ground truth.
    */
  def streamGraphIndexIngest(spark: SparkSession, dir: String): DataFrame = {
    // loop-invariant serve relations checkpointed once per invocation
    // (r17 — see annGraphProbe): 3 micro-batches × 6 hops re-scanned
    // the adjacency parquet and the corpus vectors per hop otherwise
    val e = Similarity.vecs(spark, dir).select(col("vec_id"), col("v"))
      .truncated
    val idx = Similarity.stageKnnGraph(spark, dir)
    val staticEdges = Similarity.readKnnGraph(spark, idx).truncated
    val newVecs = Similarity.plantedVecQueriesOf(e)
    val watch = java.nio.file.Files.createTempDirectory("graft_graph_ingest")
    // ordered new-vector slices staged once per corpus (r17 — the
    // stageSlicedDrop protocol; the planted query set is a
    // deterministic function of the corpus)
    EventsStreaming.stageSlicedDrop(
      (0 to 2).map(i =>
        newVecs.filter(pmod(col("q_id"), lit(3L)) === i.toLong)),
      dir, "newvec3", watch.toString)
    val root = java.nio.file.Files.createTempDirectory("graft_graph_stream")
    // seed an empty slice so the post-drain read exists even when the
    // corpus (and so the ingest stream) is empty. Schema-only (r16
    // finding: beamSearchTopK over an empty query set is provably
    // empty — every output row carries a q_id), served from the
    // staged empty part at zero jobs per invocation (r17).
    linkEmptySeed(spark,
      org.apache.spark.sql.types.StructType.fromDDL(
        "q_id BIGINT, rank BIGINT, vec_id BIGINT, cosine DOUBLE"),
      s"$root/edges/seed")
    withDrainConf(spark) {
      val q = spark.readStream.schema(newVecs.schema)
        .option("maxFilesPerTrigger", 1).parquet(watch.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          appendGraphBatch(spark, root.toString, staticEdges, e,
            batch.toDF(), batchId)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    sealAndClean(
      spark.read
        .schema("q_id BIGINT, rank BIGINT, vec_id BIGINT, cosine DOUBLE")
        .option("recursiveFileLookup", "true").parquet(s"$root/edges")
        .orderBy("q_id", "rank"),
      watch, root)
  }

  /** Watermark-progression census — the OBSERVABILITY row a streaming
    * operator on call actually reads (is the watermark advancing? how
    * many rows rode each advance?): the corpus plus two far-future
    * sentinel files drain as ordered micro-batches (dropFile's strictly
    * increasing mtimes fix the order) under a windowed count with the
    * standard 2-hour watermark, and the query's OWN progress telemetry
    * (`recentProgress` — read synchronously after the drain, no async
    * listener) reduces to (watermark_ms → input rows processed under
    * it). Batch k runs under the watermark its predecessors
    * established, so the expected progression is CLOSED-FORM over the
    * corpus: 0 for the corpus batch, max(ts)−2h for the first
    * sentinel's batch, +10h−2h for the second, +20h−2h for the final
    * no-data flush — which is exactly what the DuckDB oracle computes
    * (GREATEST(…, 0) folds the empty-corpus case, where the watermark
    * floor merges batches). Grouping by watermark value rather than
    * batch index keeps the census invariant to how many zero-row
    * housekeeping batches the engine interleaves. recentProgress is a
    * ≤4-entry driver read — the constant-size driver contract.
    */
  def streamWatermarkCensus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    def sentinel(id: Long, ms: Long): DataFrame =
      spark.range(1).select(lit(id).as("event_id"),
        timestamp_millis(lit(ms)).as("ts"), lit(-1L).as("user_id"),
        lit("sentinel").as("event_type"), lit(0.0).as("value"))
    val watch = java.nio.file.Files.createTempDirectory("graft_wm_census")
    EventsStreaming.stageCorpusDrop(all, dir, "events5", watch.toString)
    // staged sentinels (r17 — see streamClickAttributionOuter): the
    // per-pass max(ts) action and both drop writes run at staging only
    EventsStreaming.stageSlicedDrop({
      val maxMs = Option(all.select(max(unix_millis(col("ts")))).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      Seq(sentinel(-1L, maxMs + 10L * 3600 * 1000),
        sentinel(-2L, maxMs + 20L * 3600 * 1000))
    }, dir, "wm_census_sent", watch.toString)
    withDrainConf(spark) {
      val agg = spark.readStream.schema(all.schema)
        .option("maxFilesPerTrigger", 1).parquet(watch.toString)
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
      val q = agg.writeStream.outputMode("append").format("memory")
        .queryName("graft_stream_wm")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
      q.recentProgress.toSeq
        .map { p =>
          val wm = Option(p.eventTime.get("watermark"))
            .map(s => java.time.Instant.parse(s).toEpochMilli)
            .getOrElse(0L)
          (wm, p.numInputRows)
        }
        .toDF("wm_ms", "rows_in")
        .groupBy("wm_ms").agg(sum(col("rows_in")).as("rows_in"))
        .orderBy("wm_ms")
    }
  }

  /** Exactly-once ingest: the events file is staged TWICE (every row
    * arrives duplicated, the at-least-once delivery the pattern
    * exists for) and `dropDuplicatesWithinWatermark` on event_id must
    * collapse the copies — the per-type counts equal the single-copy
    * table's. Dedup state is bounded by the watermark horizon, not
    * the stream length.
    */
  def streamDedupCounts(spark: SparkSession, dir: String): DataFrame = {
    val events = EventsStreaming.readEvents(
      spark, EventsStreaming.stageEventsDir(dir, copies = 2))
    drain(spark, EventsStreaming.dedupCounts(events),
      "graft_stream_dedup", "complete")
      .orderBy("event_type")
  }

  /** Stateful gap sessionization (flatMapGroupsWithState), drained to
    * batch equality: after the corpus lands, two far-future sentinel
    * drops (negative user_id, filtered back out) advance the
    * watermark past every real session's close so the event-time
    * timeouts fire and every pending session is emitted — the
    * streaming analogue of end-of-input. Emits the integer session
    * intervals; value sums stay on the batch twin (`ev_sessionize`)
    * where addition order is deterministic.
    */
  def streamSessionize(spark: SparkSession, dir: String): DataFrame = {
    val all = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    def sentinel(id: Long, ms: Long): DataFrame =
      spark.range(1).select(lit(id).as("event_id"),
        timestamp_millis(lit(ms)).as("ts"), lit(-1L).as("user_id"),
        lit("sentinel").as("event_type"), lit(0.0).as("value"))
    // Pre-stage corpus + both sentinels and drain once with
    // AvailableNow + maxFilesPerTrigger=1 — the attribution-outer
    // protocol applied here too (r16): the files process as ordered
    // micro-batches (mtime order — staged corpus oldest, dropFile
    // sentinels strictly increasing), the first sentinel's batch-end
    // advances the watermark and the second's batch fires the
    // event-time timeouts under it, exactly like the former
    // interactive drop/processAllAvailable/drop protocol at a third
    // of the drain round-trips (AvailableNow also appends the no-data
    // flush batch append-mode state operators need).
    val watch = java.nio.file.Files.createTempDirectory("graft_sess_stream")
    EventsStreaming.stageCorpusDrop(all, dir, "events5", watch.toString)
    // staged sentinels (r17 — see streamClickAttributionOuter); empty
    // corpus (the 3 a.m. empty-partition case): any sentinel epoch
    // works, there are no sessions to seal
    EventsStreaming.stageSlicedDrop({
      val maxMs = Option(all.select(max(unix_millis(col("ts")))).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      Seq(sentinel(-1L, maxMs + 10L * 3600 * 1000),
        sentinel(-2L, maxMs + 20L * 3600 * 1000))
    }, dir, "sessionize_sent", watch.toString)
    withDrainConf(spark) {
      val sessions = EventsStreaming.sessionize(spark,
        spark.readStream.schema(all.schema)
          .option("maxFilesPerTrigger", 1).parquet(watch.toString))
      val q = sessions.toDF().writeStream.outputMode("append")
        .format("memory").queryName("graft_stream_sess")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    spark.table("graft_stream_sess")
      .filter(col("user_id") >= 0)
      .select("user_id", "session_seq", "session_start_ms",
        "session_end_ms", "n_events")
      .orderBy("user_id", "session_seq")
  }

  /** Stream-static enrichment join: the live event stream joined to
    * the per-user cohort-day dimension PRECOMPUTED from batch (the
    * canonical "enrich the stream with reference data" pattern), then
    * a tumbling 1-hour cohort × hour activity rollup. The static side
    * is broadcast and the join keeps NO state — only the windowed agg
    * does; the complete-mode drained table must equal the batch
    * self-join the oracle runs.
    */
  def streamCohortRollup(spark: SparkSession, dir: String): DataFrame = {
    val cohorts = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(unix_millis(date_trunc("DAY", min(col("ts")))).as("cohort_ms"))
    val events = EventsStreaming.readEvents(
      spark, EventsStreaming.stageEventsDir(dir))
    drain(spark, EventsStreaming.cohortRollup(events, cohorts),
      "graft_stream_cohort", "complete")
      .orderBy("hour_ms", "cohort_ms")
  }

  val FileSinkStageRoot = "/root/repo/target/graft_stream_sink"

  /** Stable per-source-dir staging for the file-sink pipeline: unlike
    * `stageEventsDir` (fresh temp dir per call — fine for memory-sink
    * drains), the FILE sink's checkpoint binds to its source path, so
    * source, checkpoint and sink must all live at deterministic
    * locations for re-drains to be resumptions instead of restarts.
    */
  def fileSinkRoot(dir: String): String =
    stagedRootFor(dir, FileSinkStageRoot)

  private def stagedRootFor(dir: String, stageRoot: String): String = {
    val abs = java.nio.file.Paths.get(dir).toAbsolutePath.normalize
    // The key folds in the source files' (name, size, mtime): the file
    // source's checkpoint tracks inputs BY PATH, so a regenerated
    // corpus at the same path would otherwise be silently skipped as
    // already-processed — a content-shaped key gives fresh content a
    // fresh checkpoint lineage instead.
    val table = abs.resolve("events.parquet")
    val sig = {
      val files: Seq[java.nio.file.Path] =
        if (java.nio.file.Files.isDirectory(table))
          table.toFile.listFiles.filter(_.getName.endsWith(".parquet"))
            .map(_.toPath).toSeq.sortBy(_.getFileName.toString)
        else if (java.nio.file.Files.exists(table)) Seq(table)
        else Seq.empty
      files.map(f => s"${f.getFileName}:${java.nio.file.Files.size(f)}:" +
        java.nio.file.Files.getLastModifiedTime(f).toMillis).mkString("|")
    }
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest((abs.toString + "\n" + sig).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    s"$stageRoot/${abs.getFileName}_$key"
  }

  /** Exactly-once FILE sink certification, driver-visible: drain the
    * event stream through a parquet `writeStream` (append, AvailableNow,
    * durable checkpoint), then read the sink back THROUGH its
    * `_spark_metadata` commit manifest and reduce to a per-type census
    * the oracle recomputes from the original table. The manifest is
    * the exactly-once mechanism under test — only files recorded by a
    * committed batch are visible to the read, so a crashed/duplicated
    * task's orphan files can't alter the census, and a re-drain with
    * the same checkpoint is a no-op resumption (Round9bOpsSpec
    * drains twice and asserts the census is unchanged). This is the
    * 100 TB landing-zone pattern: object-store parquet + manifest,
    * re-runnable without dedup jobs.
    */
  def streamFileSinkCensus(spark: SparkSession, dir: String): DataFrame =
    synchronized {
      val root = fileSinkRoot(dir)
      val src = java.nio.file.Paths.get(root, "src")
      if (!java.nio.file.Files.exists(src)) {
        java.nio.file.Files.createDirectories(src)
        val table = java.nio.file.Paths.get(s"$dir/events.parquet")
        val files: Seq[java.nio.file.Path] =
          if (java.nio.file.Files.isDirectory(table))
            table.toFile.listFiles.filter(_.getName.endsWith(".parquet"))
              .map(_.toPath).toSeq
          else Seq(table)
        files.zipWithIndex.foreach { case (f, i) =>
          java.nio.file.Files.createSymbolicLink(
            src.resolve(s"events_$i.parquet"), f)
        }
      }
      val events = EventsStreaming.readEvents(spark, src.toString)
      withDrainConf(spark) {
        val q = events
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
          .writeStream.outputMode("append").format("parquet")
          .option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally if (q.isActive) q.stop()
      }
      // explicit schema: a drained-empty corpus commits zero files, so
      // there is no footer to infer from — the read must still produce
      // the audited shape
      val sinkSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType)))
      spark.read.schema(sinkSchema).parquet(s"$root/out")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(col("event_id")).as("id_sum"),
          round(sum(col("value")), 2).as("value_sum"))
        .orderBy("event_type")
    }

  val UpsertStageRoot = "/root/repo/target/graft_stream_upsert"

  def upsertRoot(dir: String): String = stagedRootFor(dir, UpsertStageRoot)

  /** One exactly-once UPSERT application of a micro-batch (VERDICT
    * r10 #4): the batch reduces to per-user algebraic partials
    * (count, cents, last-seen ms) and MERGEs into the keyed state
    * table with the `rel_merge_upsert` machinery — full outer join on
    * the key, coalesce each side, integer accumulators. Exactly-once
    * rides TWO mechanisms layered the way a production foreachBatch
    * sink does it:
    *   (1) versioned state — batch b writes state/v_b from the LATEST
    *       COMMITTED version, never in place, so a crash mid-write
    *       leaves an orphan directory the reader can never see;
    *   (2) a commit marker per batchId, written only after the state
    *       write completes — a REPLAYED batchId (foreachBatch is
    *       at-least-once under retries) finds its marker and is a
    *       no-op, which upgrades at-least-once delivery to
    *       exactly-once application (Round11OpsSpec replays a batch
    *       with poisoned data and proves the census unchanged).
    */
  def applyUpsertBatch(spark: SparkSession, root: String,
      batch: DataFrame, batchId: Long): Unit = {
    import java.nio.file.{Files, Paths}
    val commits = Paths.get(root, "commits")
    Files.createDirectories(commits)
    val marker = commits.resolve(batchId.toString)
    if (Files.exists(marker)) return
    val delta = batch.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("cents"),
        max(unix_millis(col("ts"))).as("last_ms"))
    val merged = latestCommitted(root) match {
      case None => delta
      case Some(v) =>
        val state = spark.read.parquet(s"$root/state/v_$v")
        state.withColumnsRenamed(Map("n_events" -> "n0", "cents" -> "c0",
            "last_ms" -> "m0"))
          .join(delta, Seq("user_id"), "full_outer")
          .select(col("user_id"),
            (coalesce(col("n0"), lit(0L)) + coalesce(col("n_events"), lit(0L)))
              .as("n_events"),
            (coalesce(col("c0"), lit(0L)) + coalesce(col("cents"), lit(0L)))
              .as("cents"),
            greatest(coalesce(col("m0"), lit(Long.MinValue)),
              coalesce(col("last_ms"), lit(Long.MinValue))).as("last_ms"))
    }
    merged.write.mode("overwrite").parquet(s"$root/state/v_$batchId")
    Files.write(marker, Array.emptyByteArray)
  }

  private def latestCommitted(root: String): Option[Long] = {
    val commits = java.nio.file.Paths.get(root, "commits")
    if (!java.nio.file.Files.exists(commits)) None
    else {
      val ids = commits.toFile.listFiles.map(_.getName.toLong)
      if (ids.isEmpty) None else Some(ids.max)
    }
  }

  /** Exactly-once UPSERT sink certification, driver-visible — the
    * companion of `stream_file_sink_census` for the keyed-table
    * landing zone: the event stream drains through foreachBatch in
    * FOUR micro-batches (maxFilesPerTrigger=1 over a 4-file staging),
    * each merging its per-user partials into the versioned state
    * table, and the census reads the final committed version back.
    * The oracle recomputes the per-user profile from the original
    * table in one shot, so a lost batch, a double-applied batch, or a
    * mis-merged key breaks the hash; a re-drain with the same
    * checkpoint discovers no new files and is a no-op resumption
    * (spec drains twice and replays a batch).
    */
  def streamUpsertSinkCensus(spark: SparkSession, dir: String): DataFrame =
    synchronized {
      val root = upsertRoot(dir)
      val src = java.nio.file.Paths.get(root, "src")
      if (!java.nio.file.Files.exists(src))
        Tables.events(spark, dir)
          .select("event_id", "user_id", "event_type", "ts", "value")
          .repartition(4)
          .write.parquet(src.toString)
      val events = EventsStreaming.readEvents(spark, src.toString,
        maxFilesPerTrigger = Some(1))
      withDrainConf(spark) {
        val q = events.writeStream
          .foreachBatch((b: DataFrame, id: Long) =>
            applyUpsertBatch(spark, root, b, id))
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally if (q.isActive) q.stop()
      }
      val v = latestCommitted(root).getOrElse(
        throw new IllegalStateException(s"no committed upsert state under $root"))
      spark.read.parquet(s"$root/state/v_$v")
        .select(col("user_id"), col("n_events"),
          round(col("cents").cast("double") / 100.0, 2).as("value_sum"),
          col("last_ms"))
        .orderBy("user_id")
    }

  /** Brute-force planted-pair ground truth shared by
    * `stream_index_ingest` and `stream_index_compaction` — compaction
    * must serve the identical probe result through the identical
    * serve path, so the two rows replay one oracle.
    */
  private val lshIngestOracle: String =
    """WITH docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, ' ' || text || chr(9)
      |  FROM documents WHERE doc_id % 4 = 0),
      |toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
      |                x -> len(x) > 0) AS t
      |  FROM docs),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
      |  FROM toks WHERE len(t) >= 3)
      |SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
      |  round(len(list_intersect(a.shingles, b.shingles))::DOUBLE /
      |        len(list_distinct(list_concat(a.shingles, b.shingles))), 4) AS jaccard
      |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1000000
      |WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE /
      |      len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.35
      |ORDER BY doc_id_1, doc_id_2""".stripMargin

  val queries: Map[String, GQuery] = Map(
    "stream_upsert_sink_census" -> GQuery.sql(streamUpsertSinkCensus,
      """SELECT user_id, count(*) AS n_events,
        |  round(CAST(sum(round(value * 100)) AS DOUBLE) / 100, 2) AS value_sum,
        |  max(epoch_ms(ts)) AS last_ms
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
    "stream_file_sink_census" -> GQuery.sql(streamFileSinkCensus,
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum,
        |  round(sum(value), 2) AS value_sum
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
    "stream_static_enrich" -> GQuery.sql(streamCohortRollup,
      """WITH u AS (
        |  SELECT user_id,
        |    epoch_ms(date_trunc('day', min(ts))) AS cohort_ms
        |  FROM events GROUP BY user_id)
        |SELECT epoch_ms(date_trunc('hour', e.ts)) AS hour_ms,
        |  u.cohort_ms, count(*) AS n_events
        |FROM events e JOIN u USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "stream_hourly_rollup" -> GQuery.sql(streamHourlyRollup,
      """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
        |  count(*) AS n_events,
        |  round(sum(value), 2) AS value_sum
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "stream_wordcount" -> GQuery.sql(streamWordcount,
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(regexp_split_to_array(text, '[[:punct:][:space:]]+')) AS word
        |      FROM documents)
        |WHERE length(word) > 0
        |GROUP BY word ORDER BY word""".stripMargin),
    "stream_heavy_hitters" -> GQuery.sql(streamHeavyHitters,
      s"""WITH wc AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(regexp_split_to_array(text, '[[:punct:][:space:]]+')) AS word
        |        FROM documents)
        |  WHERE length(word) > 0 GROUP BY word)
        |SELECT word AS token, cnt AS count_ub, CAST(0 AS BIGINT) AS err
        |FROM wc ORDER BY count_ub DESC, token LIMIT ${WordCount.HeavyHitterK}""".stripMargin),
    "stream_click_attribution_outer" -> GQuery.sql(streamClickAttributionOuter,
      """SELECT p.event_id, p.user_id,
        |  epoch_ms(p.ts) AS p_ms, epoch_ms(c.ts) AS c_ms
        |FROM events p LEFT JOIN events c
        |  ON c.user_id = p.user_id
        |  AND c.event_type = 'click'
        |  AND epoch_ms(c.ts) >= epoch_ms(p.ts) - 3600000
        |  AND epoch_ms(c.ts) < epoch_ms(p.ts)
        |WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id, c_ms""".stripMargin),
    "stream_click_attribution" -> GQuery.sql(streamClickAttribution,
      """SELECT p.event_id, p.user_id,
        |  epoch_ms(p.ts) AS p_ms, epoch_ms(c.ts) AS c_ms
        |FROM events p JOIN events c
        |  ON c.user_id = p.user_id
        |  AND c.event_type = 'click'
        |  AND epoch_ms(c.ts) >= epoch_ms(p.ts) - 3600000
        |  AND epoch_ms(c.ts) < epoch_ms(p.ts)
        |WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id, c_ms""".stripMargin),
    "stream_dedup_counts" -> GQuery.sql(streamDedupCounts,
      """SELECT event_type, count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
    // identical truth domain to dd_incremental_probe: a stream-built
    // index must serve the same planted pairs the batch-built one does
    // identical truth domain to ann_ivf_topk/ann_index_probe: the
    // stream-maintained index must serve the same rank-1 answers
    // identical truth domain to src_delete_vector_census: the
    // stream-maintained sidecar must serve the same MOR census
    "stream_dv_ingest" -> GQuery.sql(streamDvIngest, Sources.dvOracleSql),
    "stream_vec_index_ingest" -> GQuery.sql(streamVecIndexIngest,
      s"""SELECT vec_id + ${Similarity.QueryOffset} AS q_id, CAST(1 AS BIGINT) AS rank,
        |  vec_id, CAST(1.0 AS DOUBLE) AS cosine
        |FROM embeddings WHERE vec_id % 8 = 0
        |ORDER BY q_id""".stripMargin),
    // same hop-for-hop replay as ann_graph_probe: the stream-appended
    // insert edges must equal the batch beam search exactly
    "stream_graph_index_ingest" -> GQuery.sql(streamGraphIndexIngest,
      Similarity.graphProbeOracle),
    "stream_index_ingest" -> GQuery.sql(streamIndexIngest, lshIngestOracle),
    "stream_index_compaction" ->
      GQuery.sql(streamIndexCompaction, lshIngestOracle),
    "stream_watermark_census" -> GQuery.sql(streamWatermarkCensus,
      """WITH m AS (
        |  SELECT COALESCE(CAST(max(epoch_ms(ts)) AS BIGINT), 0) AS mx,
        |    count(*) AS cnt
        |  FROM events),
        |raw AS (
        |  SELECT CAST(0 AS BIGINT) AS wm_ms, cnt AS rows_in FROM m
        |  UNION ALL
        |  SELECT GREATEST(mx - 7200000, 0), 1 FROM m
        |  UNION ALL
        |  SELECT GREATEST(mx + 36000000 - 7200000, 0), 1 FROM m
        |  UNION ALL
        |  SELECT GREATEST(mx + 72000000 - 7200000, 0), 0 FROM m)
        |SELECT wm_ms, CAST(sum(rows_in) AS BIGINT) AS rows_in
        |FROM raw GROUP BY wm_ms ORDER BY wm_ms""".stripMargin),
    "stream_sessionize" -> GQuery.sql(streamSessionize,
      """WITH flagged AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 30*60*1000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
        |sessions AS (
        |  SELECT user_id, event_id, ms,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq,
        |  min(ms) AS session_start_ms, max(ms) AS session_end_ms,
        |  count(*) AS n_events
        |FROM sessions GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin))
}
