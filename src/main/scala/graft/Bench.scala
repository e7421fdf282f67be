package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first measured query isn't charged for it
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()
    // best-of-2 per query: the host shows bursty CPU steal; a single
    // sample can absorb a multi-second hypervisor stall. A failing
    // query is recorded as -1 (never a masquerading "fast" time).
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        (ok, (System.nanoTime() - t0) / 1e9)
      }
      if (samples.exists(!_._1)) { failed += name; name -> -1.0 }
      else name -> samples.map(_._2).min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"sf":"$sfDir"}"""
    // stdout line for the driver AND a file artifact: round 1's JSON
    // overflowed the driver's stdout tail capture (parsed: null), so
    // persist the per-query regression baseline ourselves.
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get("bench.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
