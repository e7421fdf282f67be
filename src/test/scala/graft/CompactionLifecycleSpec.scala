package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

/** The stream-maintained-index COMPACTION contract (VERDICT r13 #3):
  * per-batch idempotent overwrites accumulate one directory per
  * micro-batch forever — compaction must collapse them to one slice
  * per subtable, the file count must DROP, and the layout-blind serve
  * path must return byte-identical results before and after (the
  * `src_dv_compaction` contract applied to the three streamed
  * artifacts: LSH dedup index, IVF vector index, DV sidecar).
  */
class CompactionLifecycleSpec extends SparkTestBase {

  private def parquetFiles(root: Path): Seq[Path] = {
    val walk = Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .toSeq
    } finally walk.close()
  }

  test("LSH index compaction: probe identical, files collapse to 1/subtable") {
    val docs = Tables.documents(spark, SfDir)
      .select(col("doc_id"), col("source"), col("text"))
    val (watch, idx) = operators.StreamingOps.ingestLshIndex(spark, docs, SfDir)
    try {
      val batch = operators.Dedup.ingestBatchOf(docs)
      def probe() = operators.Dedup.plantedPairsOnly(
        operators.Dedup.probeLshIndex(spark, idx.toString, batch))
        .collect().map(_.toString).toSeq
      val before = probe()
      val filesBefore = parquetFiles(idx).size
      // 3 corpus batches + 1 seed per subtable accumulated ≥ 4 slices
      assert(filesBefore > operators.Dedup.LshIndexTables.size,
        s"expected accumulated batch slices, saw $filesBefore files")
      operators.StreamingOps.compactStreamedIndex(spark, idx.toString,
        operators.Dedup.LshIndexTables)
      val filesAfter = parquetFiles(idx).size
      assert(filesAfter == operators.Dedup.LshIndexTables.size,
        s"compaction should leave one file per subtable, saw $filesAfter")
      assert(filesAfter < filesBefore, "compaction must shrink the file count")
      assert(probe() == before,
        "compacted index must serve the identical probe result")
    } finally {
      operators.Staging.deleteTree(watch)
      if (Files.exists(idx)) operators.Staging.deleteTree(idx)
    }
  }

  test("DV sidecar compaction: census identical through the same read path") {
    val stage = operators.Sources.stageDvDir(spark, SfDir)
    val cmds = spark.read.schema("file_name STRING, pos BIGINT")
      .parquet(s"$stage/dv")
    val root = Files.createTempDirectory("graft_dv_compact_spec")
    try {
      // three micro-batches land as their own batch=… directories
      (0 until 3).foreach { b =>
        operators.StreamingOps.appendDvBatch(spark, root.toString,
          cmds.filter(pmod(col("pos"), lit(3L)) === b.toLong), b.toLong)
      }
      def census() = operators.Sources.dvCensusOf(
        operators.Sources.readDvData(spark, stage),
        spark.read.schema("file_name STRING, pos BIGINT")
          .option("recursiveFileLookup", "true").parquet(root.toString))
        .collect().map(_.toString).toSeq
      val before = census()
      val filesBefore = parquetFiles(root).size
      assert(filesBefore >= 3)
      operators.StreamingOps.compactStreamedIndex(spark, root.toString,
        Seq("" -> "file_name STRING, pos BIGINT"))
      assert(parquetFiles(root).size == 1)
      assert(census() == before)
    } finally if (Files.exists(root)) operators.Staging.deleteTree(root)
  }

  test("IVF index compaction: probe identical through readIvfIndex") {
    val e = operators.Similarity.vecs(spark, SfDir)
      .select(col("vec_id"), col("v"))
    val idx = Files.createTempDirectory("graft_ivf_compact_spec")
    try {
      operators.Similarity.ivfCentroidsOf(e)
        .write.mode("overwrite").parquet(s"$idx/centroids/seed")
      (0 until 3).foreach { b =>
        operators.StreamingOps.appendVecBatch(spark, idx.toString,
          e.filter(pmod(col("vec_id"), lit(3L)) === b.toLong), b.toLong)
      }
      def probe() = {
        val (c, a) = operators.Similarity.readIvfIndex(spark, idx.toString)
        operators.Similarity.ivfProbe(c, a,
            operators.Similarity.plantedVecQueriesOf(e))
          .filter(col("rank") === 1L).orderBy("q_id")
          .collect().map(_.toString).toSeq
      }
      val before = probe()
      assert(before.nonEmpty)
      val filesBefore = parquetFiles(idx).size
      operators.StreamingOps.compactStreamedIndex(spark, idx.toString,
        operators.Similarity.IvfIndexTables)
      assert(parquetFiles(idx).size == operators.Similarity.IvfIndexTables.size)
      assert(parquetFiles(idx).size < filesBefore)
      assert(probe() == before)
    } finally if (Files.exists(idx)) operators.Staging.deleteTree(idx)
  }
}
