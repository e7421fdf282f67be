package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Snapshot retention contract (VERDICT r14 #3): VACUUM expires old
  * versions, reclaims every byte only they referenced, leaves the
  * retained version byte-identical — and an expired version REFUSES
  * to read rather than silently serving a half-vacuumed file set.
  */
class VacuumSpec extends SparkTestBase {

  private def freshWork(): java.nio.file.Path = {
    val stage = operators.Sources.stageVacuumDir(spark, SfDir)
    val work = Files.createTempDirectory("graft_vacuum_spec")
    operators.Sources.copyTree(Paths.get(stage), work)
    work
  }

  test("vacuum reclaims exactly the expired files and keeps v3 byte-identical") {
    val work = freshWork()
    try {
      val schema = Tables.documents(spark, SfDir).schema
      def v3() = operators.Sources
        .readSnapshot(spark, work.toString, 3, schema)
        .orderBy("doc_id").collect().map(_.toString).toSeq
      val before = v3()
      assert(before.nonEmpty)
      // pre-vacuum: expired artifacts all present
      assert(Files.exists(work.resolve("v1.manifest")))
      assert(Files.exists(work.resolve("deletes_v2")))
      assert(Files.exists(work.resolve(".tmp-orphan-crashed")))
      assert(Files.exists(work.resolve("data/append-v2.parquet")))
      val (dataN, sideN, orphN, bytes) =
        operators.Sources.vacuumSnapshot(work, 3)
      assert(dataN == 9L, s"8 v1 parts + 1 append, got $dataN")
      assert(sideN == 1L, s"one delete-vector slice, got $sideN")
      assert(orphN == 1L, s"one planted orphan dir, got $orphN")
      assert(bytes > 0L)
      assert(!Files.exists(work.resolve("v1.manifest")))
      assert(!Files.exists(work.resolve("v2.manifest")))
      assert(!Files.exists(work.resolve("deletes_v2")))
      assert(!Files.exists(work.resolve(".tmp-orphan-crashed")))
      assert(!Files.exists(work.resolve("data/append-v2.parquet")))
      assert(v3() == before, "v3 must read byte-identical after vacuum")
      // only the retained manifest's files remain in data/
      val left = Option(work.resolve("data").toFile.listFiles).toSeq.flatten
        .map(_.getName).filter(_.endsWith(".parquet")).sorted
      assert(left.forall(_.startsWith("compact-v3-")),
        s"unreclaimed expired data files: $left")
    } finally operators.Staging.deleteTree(work)
  }

  test("an expired version refuses to read after vacuum") {
    val work = freshWork()
    try {
      val schema = Tables.documents(spark, SfDir).schema
      // before vacuum both expired versions still serve
      assert(operators.Sources.readSnapshot(spark, work.toString, 1, schema)
        .count() > 0)
      operators.Sources.vacuumSnapshot(work, 3)
      intercept[Exception] {
        operators.Sources.readSnapshot(spark, work.toString, 1, schema)
          .count()
      }
      intercept[Exception] {
        operators.Sources.readSnapshot(spark, work.toString, 2, schema)
          .count()
      }
    } finally operators.Staging.deleteTree(work)
  }

  test("vacuum is idempotent and the registry row is all-green verdicts") {
    val work = freshWork()
    try {
      operators.Sources.vacuumSnapshot(work, 3)
      val (d2, s2, o2, b2) = operators.Sources.vacuumSnapshot(work, 3)
      assert((d2, s2, o2, b2) == ((0L, 0L, 0L, 0L)),
        s"second vacuum must be a no-op, got ($d2,$s2,$o2,$b2)")
    } finally operators.Staging.deleteTree(work)
    val r = operators.Sources.vacuumCensus(spark, SfDir).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("identical_after_vacuum") == 1L)
    assert(row.getAs[Long]("bytes_reclaimed_pos") == 1L)
    assert(row.getAs[Long]("v1_refused") == 1L)
    assert(row.getAs[Long]("data_files_reclaimed") == 9L)
    // and the staged artifact itself is untouched by the run: a
    // second census sees the same pre-vacuum state
    val r2 = operators.Sources.vacuumCensus(spark, SfDir).collect()(0)
    assert(r2 == row, "vacuumCensus must be deterministic across runs")
  }
}
