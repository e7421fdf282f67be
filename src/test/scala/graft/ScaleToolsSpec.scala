package graft

import org.apache.spark.sql.functions._
import graft.plans.Skew

/** Scale tooling evidence: salting preserves join semantics; bucketed
  * tables join without a shuffle (the co-located-join path SURVEY §3
  * prescribes for repeated fact-fact joins at 100 TB).
  */
class ScaleToolsSpec extends SparkTestBase {

  test("salted join returns exactly the plain join's rows") {
    val ev = Tables.events(spark, SfDir)
      .select("event_id", "user_id", "value")
    val users = Tables.events(spark, SfDir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val plain = ev.join(users, Seq("user_id"))
      .select("event_id", "user_id", "n")
    val salted = Skew.saltedJoin(ev, users, "user_id", col("event_id"), 8)
      .select("event_id", "user_id", "n")
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).count() == 0 && salted.exceptAll(plain).count() == 0)
  }

  test("bucketed tables join without an exchange") {
    spark.sql("DROP TABLE IF EXISTS c_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    // the in-memory catalog forgets tables between JVMs but the
    // warehouse directories persist — clear them or CTAS refuses
    for (t <- Seq("c_bucketed", "o_bucketed")) {
      val p = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    Tables.customer(spark, SfDir).write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("c_bucketed")
    Tables.orders(spark, SfDir).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("o_bucketed")
    val joined = spark.table("o_bucketed")
      .join(spark.table("c_bucketed"),
        col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // bucketed-on-key join: no shuffle exchange on either side
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
    assert(joined.count() == Tables.orders(spark, SfDir).count())
  }
}
