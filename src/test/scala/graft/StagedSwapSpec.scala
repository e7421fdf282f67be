package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

/** The manifest-pointer commit contract (VERDICT r14 #2): staged
  * artifacts are immutable version directories under a stable root,
  * and the ONLY mutation a reader can observe is the atomic
  * `_CURRENT` pointer rename. The displaced protocol (rename the
  * whole artifact aside, rename the replacement into place) had a
  * window between the two directory renames where the serve path
  * held NOTHING — the first test interleaves a reader at exactly
  * that point in the new protocol's step sequence and requires a
  * complete artifact at every step; the second hammers recommits
  * from a concurrent reader thread; the third pins the stream-owned
  * index compaction to the same contract end to end.
  */
class StagedSwapSpec extends SparkTestBase {

  import operators.Staging

  /** Step-level interleaving: between "new version fully written and
    * renamed into the root" and "pointer swapped" — the instant at
    * which the OLD protocol had already renamed the live artifact
    * aside (ENOENT at the serve path) — a reader must still resolve
    * to the old complete version.
    */
  test("a reader interleaved between commit steps always sees a complete version") {
    val stage = Files.createTempDirectory("graft_swap_spec")
    try {
      def readPayload(): String = {
        val v = Staging.resolve(stage.toString)
        new String(Files.readAllBytes(Paths.get(v, "payload")), "UTF-8")
      }
      // initial commit: v1
      val v1 = stage.resolve(".tmp-v-1")
      Files.createDirectories(v1)
      Files.write(v1.resolve("payload"), "one".getBytes("UTF-8"))
      Files.move(v1, stage.resolve("v-1"), StandardCopyOption.ATOMIC_MOVE)
      assert(Staging.commitPointer(stage, "v-1").isEmpty)
      assert(readPayload() == "one")
      // recommit, interleaving the reader at every step
      val tmp = stage.resolve(".tmp-v-2")
      Files.createDirectories(tmp)
      Files.write(tmp.resolve("payload"), "two".getBytes("UTF-8"))
      assert(readPayload() == "one", "reader during version write must see v1")
      Files.move(tmp, stage.resolve("v-2"), StandardCopyOption.ATOMIC_MOVE)
      // THE step the old protocol failed: replacement in place, not
      // yet current — old protocol had already moved v1 aside here
      assert(readPayload() == "one",
        "reader between version rename and pointer swap must still see v1")
      val displaced = Staging.commitPointer(stage, "v-2")
      assert(readPayload() == "two", "reader after pointer swap sees v2")
      assert(displaced.map(_.getFileName.toString) == Some("v-1"))
      displaced.foreach(Staging.deleteTree)
      assert(readPayload() == "two")
    } finally Staging.deleteTree(stage)
  }

  /** End-to-end hammer: a reader thread resolves + fully reads the
    * staged artifact in a tight loop while the writer recommits it
    * repeatedly (source fingerprint forced stale each round). The
    * reader follows the table-format reader model: a resolve must
    * ALWAYS succeed and land on a complete version (the old
    * two-rename protocol could fail exactly there — no artifact at
    * the serve path), while a version expiring AFTER it was resolved
    * (the writer retires displaced versions immediately — production
    * would vacuum on a retention delay) is the one legitimate
    * re-resolve trigger. A NoSuchFile on the resolve itself, a
    * partial read, or wrong content fails the test.
    */
  test("concurrent reader never fails across repeated stagedDir recommits") {
    val srcRoot = Files.createTempDirectory("graft_swap_src")
    val stageRoot = Files.createTempDirectory("graft_swap_root")
    val failures = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    try {
      Files.write(srcRoot.resolve("data.txt"), "seed".getBytes("UTF-8"))
      def stage(): String =
        Staging.stagedDir(stageRoot.toString, srcRoot.toString) { tmp =>
          Files.createDirectories(tmp)
          Files.write(tmp.resolve("payload"), "p".getBytes("UTF-8"))
        }
      val first = stage()
      assert(Files.exists(Paths.get(first, "payload")))
      val reader = new Thread(() => {
        try {
          while (!stop.get()) {
            // the pointer file itself must always resolve — ENOENT
            // here is the commit-window bug the protocol closes; a
            // version expiring AFTER resolve (immediate retention)
            // is the one legitimate re-resolve trigger, bounded so a
            // persistent hole still fails
            def readOnce(attempt: Int): Array[Byte] =
              try {
                val v = Staging.resolve(
                  Staging.pathFor(stageRoot.toString, srcRoot.toString))
                Files.readAllBytes(Paths.get(v, "payload"))
              } catch {
                case _: java.nio.file.NoSuchFileException
                    if attempt < 5 && Files.exists(Paths.get(
                      Staging.pathFor(stageRoot.toString, srcRoot.toString),
                      Staging.CurrentPointer)) =>
                  readOnce(attempt + 1)
              }
            assert(readOnce(0).sameElements("p".getBytes("UTF-8")))
          }
        } catch { case t: Throwable => failures.set(t) }
      })
      reader.start()
      (1 to 25).foreach { i =>
        // mutate the source so the fingerprint goes stale → recommit
        Files.write(srcRoot.resolve("data.txt"),
          ("seed" + i).getBytes("UTF-8"))
        stage()
      }
      stop.set(true)
      reader.join(30000)
      assert(failures.get() == null,
        s"concurrent reader failed during a recommit: ${failures.get()}")
    } finally {
      stop.set(true)
      Staging.deleteTree(stageRoot)
      Staging.deleteTree(srcRoot)
    }
  }

  /** The stream-owned index inherits the contract: after compaction
    * the root resolves through `_CURRENT` to the consolidated
    * version, the probe is byte-identical, and a second compaction
    * (version → version, the production steady state) swaps pointers
    * without ever leaving the root unreadable.
    */
  test("stream-index compaction commits via the pointer and recompacts version-to-version") {
    val docs = Tables.documents(spark, SfDir)
      .select(col("doc_id"), col("source"), col("text"))
    val (watch, idx) = operators.StreamingOps.ingestLshIndex(spark, docs, SfDir)
    try {
      val batch = operators.Dedup.ingestBatchOf(docs)
      def probe() = operators.Dedup.plantedPairsOnly(
        operators.Dedup.probeLshIndex(spark, idx.toString, batch))
        .collect().map(_.toString).toSeq
      val before = probe()
      operators.StreamingOps.compactStreamedIndex(spark, idx.toString,
        operators.Dedup.LshIndexTables)
      val v1 = Staging.resolve(idx.toString)
      assert(Paths.get(v1).getFileName.toString.startsWith("v-compact-"),
        s"compaction must commit a version dir, resolved $v1")
      assert(probe() == before, "first compaction changed the probe")
      // steady state: recompact the compacted root
      operators.StreamingOps.compactStreamedIndex(spark, idx.toString,
        operators.Dedup.LshIndexTables)
      val v2 = Staging.resolve(idx.toString)
      assert(v2 != v1, "second compaction must commit a NEW version")
      // one-generation retention: the just-displaced version survives
      // this commit (a mid-commit reader can finish) and expires at
      // the NEXT one
      assert(Files.exists(Paths.get(v1)),
        "just-displaced version must survive one generation")
      assert(probe() == before, "second compaction changed the probe")
      operators.StreamingOps.compactStreamedIndex(spark, idx.toString,
        operators.Dedup.LshIndexTables)
      assert(!Files.exists(Paths.get(v1)),
        "grace expired: versions displaced two commits ago must be gone")
      assert(probe() == before, "third compaction changed the probe")
    } finally {
      operators.Staging.deleteTree(watch)
      if (Files.exists(idx)) operators.Staging.deleteTree(idx)
    }
  }
}
