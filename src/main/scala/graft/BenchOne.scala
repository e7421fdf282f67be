package graft
import org.apache.spark.sql.SparkSession

/** Dev micro-bench: time ONE registry query (warmup + N passes) so a
  * plan change can be measured without a full Bench sweep.
  * Usage: BenchOne <name> [passes]; same env knobs as Bench.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val passes = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    CodegenGuard.install()
    // SPARK_GRAFT_CONF=k=v[,k=v...] sets session confs (e.g. the
    // graft.session.skewsafe / graft.distinct.approx knobs) so the
    // conf'd plan variants can be timed without code edits.
    // Tolerates trailing/doubled commas; a segment WITHOUT '=' is a
    // typo'd knob that would otherwise silently not apply — fail loud
    // with the offending segment instead of a bare MatchError
    // (ADVICE r11 #4).
    sys.env.get("SPARK_GRAFT_CONF").foreach(
      _.split(",").map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k, v)
          case _ => sys.error(
            s"SPARK_GRAFT_CONF segment '$kv' is not key=value")
        }
      })
    val fn = SparkEntry.queries(name)
    val w0 = System.nanoTime()
    fn(spark, sfDir).count() // warmup: JIT + codegen + file listing + memo fill
    val warm = (System.nanoTime() - w0) / 1e9
    val ts = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    val med = if (ts.length % 2 == 1) ts(ts.length / 2)
      else (ts(ts.length / 2 - 1) + ts(ts.length / 2)) / 2
    println(f"$name%s min=${ts.min}%.3f median=$med%.3f max=${ts.max}%.3f" +
      f" warmup=$warm%.3f sec codegen_fallbacks=${CodegenGuard.count}")
    spark.stop()
  }
}
