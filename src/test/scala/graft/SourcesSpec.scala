package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source/sink coverage (SURVEY.md §2.H): csv + json round-trips,
  * partitioned parquet writes with partition pruning, and the raw
  * `text` source the reference's file-splitting map stage maps to.
  */
class SourcesSpec extends SparkTestBase {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").toString

  test("csv round-trip preserves the customer table") {
    val out = tmp("csv")
    val c = Tables.customer(spark, SfDir)
    c.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true").schema(c.schema).csv(out)
    assert(back.exceptAll(c).count() == 0 && c.exceptAll(back).count() == 0)
  }

  test("json round-trip preserves the orders table") {
    val out = tmp("json")
    val o = Tables.orders(spark, SfDir)
    o.write.mode("overwrite").json(out)
    val back = spark.read.schema(o.schema).json(out)
    assert(back.exceptAll(o).count() == 0 && o.exceptAll(back).count() == 0)
  }

  test("partitioned parquet write prunes partitions on read") {
    val out = tmp("part")
    Tables.customer(spark, SfDir).write.mode("overwrite")
      .partitionBy("c_mktsegment").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("c_mktsegment") === "BUILDING")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(c_mktsegment"))
    assert(pruned.count() ==
      Tables.customer(spark, SfDir).filter(col("c_mktsegment") === "BUILDING").count())
  }

  test("orc round-trip preserves the lineitem table with pushdown intact") {
    val out = tmp("orc")
    val l = Tables.lineitem(spark, SfDir)
    l.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.exceptAll(l).count() == 0 && l.exceptAll(back).count() == 0)
    // predicate pushdown reaches the ORC scan like parquet
    val plan = back.filter(col("l_quantity") > 40)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]"))
  }

  test("bucketed tables join co-located, with no shuffle on the join keys") {
    // the SURVEY §3 claim demonstrated: pre-bucketing both fact tables
    // on the join key lets the sort-merge join read buckets in place —
    // the repeated-join shape (fact ⋈ fact every day at 100 TB) where
    // paying one bucketed write amortizes away every future shuffle.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.lineitem(spark, SfDir).write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
      Tables.orders(spark, SfDir).write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_bucketed")
      val j = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(round(sum(col("l_quantity")), 2).as("qty"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        "bucketed join must not shuffle either side on the join key")
      val plain = Tables.lineitem(spark, SfDir)
        .join(Tables.orders(spark, SfDir), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(round(sum(col("l_quantity")), 2).as("qty"))
      assert(j.exceptAll(plain).count() == 0 && plain.exceptAll(j).count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("binaryFile source reads staged payloads byte-exact with file metadata") {
    // the ingestion mode for multimodal corpora: opaque payload files
    // land in a directory; binaryFile yields (path, length, content)
    // rows the Multimodal operators consume
    val out = tmp("bin")
    val docs = Tables.documents(spark, SfDir)
      .select("doc_id", "text").filter(col("doc_id") < 5).collect()
    docs.foreach { r =>
      Files.write(java.nio.file.Paths.get(out, s"doc_${r.getLong(0)}.bin"),
        r.getString(1).getBytes("UTF-8"))
    }
    val bin = spark.read.format("binaryFile").load(s"$out/*.bin")
      .select(regexp_extract(input_file_name(), "doc_(\\d+)\\.bin", 1)
          .cast("long").as("doc_id"),
        col("length"), md5(col("content")).as("content_md5"))
    val want = Tables.documents(spark, SfDir).filter(col("doc_id") < 5)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("length"),
        md5(col("text").cast("binary")).as("content_md5"))
    assert(bin.count() == 5)
    assert(bin.exceptAll(want).count() == 0 && want.exceptAll(bin).count() == 0)
  }

  test("text source feeds the wordcount pipeline like the reference's file inputs") {
    val out = tmp("text")
    Tables.documents(spark, SfDir).select("text")
      .write.mode("overwrite").text(out)
    val lines = spark.read.text(out)
    assert(lines.count() == Tables.documents(spark, SfDir).count())
    val totalTokens = lines
      .select(explode(graft.functions.Text.tokens(col("value"))).as("w"))
      .groupBy("w").count().agg(sum("count")).collect()(0).getLong(0)
    val expected = Tables.documents(spark, SfDir)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("w")).count()
    assert(totalTokens == expected)
  }

  test("src_bucketed_join_census: co-bucketed SMJ carries zero shuffle") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val (to, tl) = operators.Sources.stageBucketedTables(spark, SfDir)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // broadcast off: at test SF the tables fit the broadcast
      // threshold, which is the RIGHT tiny-scale plan — the claim
      // under test is the big-fact shape (SMJ, no exchange)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(to).join(spark.table(tl),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan
      val smj = plan.collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, "bucketed join did not plan as SortMergeJoin")
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"bucketed join still shuffles: ${shuffles.mkString(", ")}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
    // content: census equals the same rollup off the raw parquet
    val want = Tables.orders(spark, SfDir).join(Tables.lineitem(spark, SfDir),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
    val got = operators.Sources.bucketedJoinCensus(spark, SfDir)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("src_partition_prune_census: the scan opens one segment directory") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val stage = operators.Sources.stageRoundtripDir(spark, SfDir)
    val df = operators.Sources.partitionPruneCensus(spark, SfDir)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in the prune plan"))
    assert(scan.partitionFilters.exists(_.references.map(_.name)
      .exists(_ == "c_mktsegment")), "partition filter did not bind to the dir key")
    df.collect() // execute so numFiles reflects the pruned listing
    val readFiles = scan.metrics("numFiles").value
    val allFiles = new java.io.File(s"$stage/parquet_part").listFiles()
      .filter(_.isDirectory)
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    assert(readFiles > 0 && readFiles < allFiles,
      s"pruning read $readFiles of $allFiles files")
  }

  test("src_schema_evolution_census: v1 rows surface NULL for the evolved column") {
    val stage = operators.Sources.stageEvolutionDir(spark, SfDir)
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$stage/v1", s"$stage/v2")
    assert(merged.schema.fieldNames.contains("quality_x1000"))
    assert(merged.filter(col("doc_id") % 2 === 0 &&
      col("quality_x1000").isNotNull).count() == 0)
    assert(merged.filter(col("doc_id") % 2 === 1 &&
      col("quality_x1000").isNull).count() == 0)
    assert(merged.count() == Tables.documents(spark, SfDir).count())
  }

  test("compaction: bin-packed rewrite honors target size and file counts") {
    import graft.operators.Sources
    import spark.implicits._
    // a corpus wide enough that the packer MUST open several bins:
    // the text is pseudo-random (deterministic LCG chars) so parquet
    // cannot dictionary-compress it under CompactTargetBytes
    val dir = "/root/repo/target/graft_compaction_corpus"
    def noise(i: Long): String = {
      val sb = new StringBuilder
      var x = i * 6364136223846793005L + 1442695040888963407L
      (0 until 600).foreach { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        val c = (math.floorMod(x >>> 33, 27L)).toInt
        sb += (if (c == 26) ' ' else ('a' + c).toChar)
      }
      sb.toString
    }
    (0L until 2000L).map(i => (i, "en", s"src${i % 7}", noise(i), 600L))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val census = Sources.compactionCensus(spark, dir).collect()
    assert(census.length == 3 &&
      census.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).distinct.length == 1,
      s"layout censuses diverged: ${census.mkString(";")}")
    val stage = Sources.stageCompactionDir(spark, dir)
    val plan = Sources.compactionPlan(s"$stage/small")
    val nSmall = new java.io.File(s"$stage/small").listFiles
      .count(_.getName.endsWith(".parquet"))
    val binDirs = new java.io.File(s"$stage/compacted").listFiles
      .filter(d => d.isDirectory && d.getName.startsWith("bin="))
    assert(nSmall == Sources.CompactSmallFiles)
    assert(plan.length > 1, "packer never opened a second bin — corpus too small")
    assert(plan.length < nSmall, "compaction did not reduce file count")
    // one physical file per bin: a bin never splits across tasks
    assert(binDirs.length == plan.length,
      s"bins ${plan.length} vs compacted dirs ${binDirs.length}")
    binDirs.foreach { d =>
      assert(d.listFiles.count(_.getName.endsWith(".parquet")) == 1,
        s"${d.getName} split across tasks")
    }
    // greedy guarantee: a MULTI-file bin stays under the target (only
    // a single oversized file may exceed it alone)
    plan.filter(_.files.length > 1).foreach { b =>
      assert(b.bytes <= Sources.CompactTargetBytes,
        s"bin ${b.bin} overpacked: ${b.bytes}")
    }
    // the plan covers every small file exactly once — the histogram
    // and the manifest partition the input
    assert(plan.flatMap(_.files).sorted ==
      new java.io.File(s"$stage/small").listFiles
        .map(_.getName).filter(_.endsWith(".parquet")).sorted.toSeq)
  }
}
