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
}
