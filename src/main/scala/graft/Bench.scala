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
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // Pass 0 (untimed): warms JIT, codegen caches, and file listings for
    // EVERY query, so the first timed pass isn't charged for them and a
    // failing query is discovered before it can skew timings.
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).count()
      catch { case _: Throwable => failed += name }
    }
    // 3 timed passes over the whole registry, interleaved at pass level:
    // host CPU-steal bursts (this VM shows 2-5x swings) hit all queries
    // of a pass roughly equally instead of whichever single query was
    // running. Min-of-3 per query is the regression number; the spread
    // (max/min) makes a noisy sample visible instead of silently
    // absorbed.
    val Passes = 3
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    (1 to Passes).foreach { _ =>
      queries.foreach { case (name, fn) =>
        if (!failed.contains(name)) {
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
            catch { case _: Throwable => false }
          val dt = (System.nanoTime() - t0) / 1e9
          if (!ok) failed += name
          else times(name) = dt :: times.getOrElse(name, Nil)
        }
      }
    }
    def fmt(d: Double): String = BigDecimal(d)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val results = queries.map { case (name, _) =>
      if (failed.contains(name)) name -> (-1.0, -1.0)
      else {
        val ts = times(name)
        name -> (ts.min, ts.max / ts.min)
      }
    }
    val qs = results.map { case (k, (mn, _)) => s"\"" + k + "\":" + fmt(mn) }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, (_, sp)) => s"\"" + k + "\":" + fmt(sp) }
      .mkString("{", ",", "}")
    val fs = failed.distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"spread":$spread,"failed":$fs,"sf":"$sfDir"}"""
    // stdout line for the driver AND a file artifact: round 1's JSON
    // overflowed the driver's stdout tail capture (parsed: null), so
    // persist the per-query regression baseline ourselves.
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get("bench.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
