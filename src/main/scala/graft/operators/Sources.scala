package graft.operators

import graft.{GQuery, Tables}
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources / sinks surface (SURVEY.md §2.H) as a driver-visible,
  * oracle-checked registry row — SourcesSpec proves the same
  * round-trips in-process, but a user auditing the driver's
  * CORRECTNESS artifact could not see them certified until this.
  *
  * `src_roundtrip_census` stages the customer table once per source
  * dir as csv, json, orc, and mktsegment-partitioned parquet, reads
  * EACH format back through the corresponding Spark source, and
  * reduces every read to the same content census: row count, key
  * sum, and a sum of per-row polynomial rolling hashes over a
  * canonical `concat_ws` row rendering. The DuckDB oracle computes
  * the census ONCE from the original parquet and expects every
  * format row to equal it — so a single dropped, duplicated, or
  * altered row in any write/read path breaks the hash. Only
  * integer/string columns ride the canonical rendering (csv/json
  * would re-render DOUBLEs through engine-specific text formatting;
  * that is a formatting property, not a content one).
  */
object Sources {

  /** Staging root under the build dir (same rationale as
    * WordCount.TextStageRoot: project-owned, oracle-globbable).
    */
  val RoundtripStageRoot = "/root/repo/target/graft_roundtrip"

  private def stagePathFor(dir: String): String = {
    val abs = java.nio.file.Paths.get(dir).toAbsolutePath.normalize
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(abs.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    s"$RoundtripStageRoot/${abs.getFileName}_$key"
  }

  /** The audited column slice: integers + strings only (see above). */
  private def slice(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_mktsegment"))

  /** Stage all four sink formats, idempotent per source dir (the
    * `stageTextDir` commit protocol: fresh temp sibling with a
    * `_SOURCE` marker, atomic rename aside + into place, delete old
    * after the swap — a concurrent reader never sees a half-written
    * staging).
    */
  def stageRoundtripDir(spark: SparkSession, dir: String): String =
    synchronized {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val stage = stagePathFor(dir)
      val stagePath = Paths.get(stage)
      val cur =
        try new String(Files.readAllBytes(stagePath.resolve("_SOURCE")), "UTF-8")
        catch { case _: Exception => "" }
      if (cur != dir) {
        val nonce = System.nanoTime()
        val tmp = Paths.get(s"$stage.tmp-$nonce")
        val src = slice(spark, dir).repartition(4)
        src.write.mode("overwrite").option("header", "true")
          .csv(s"$tmp/csv")
        src.write.mode("overwrite").json(s"$tmp/json")
        src.write.mode("overwrite").orc(s"$tmp/orc")
        src.write.mode("overwrite").partitionBy("c_mktsegment")
          .parquet(s"$tmp/parquet_part")
        Files.write(tmp.resolve("_SOURCE"), dir.getBytes("UTF-8"))
        val old = Paths.get(s"$stage.old-$nonce")
        if (Files.exists(stagePath))
          Files.move(stagePath, old, StandardCopyOption.ATOMIC_MOVE)
        Files.move(tmp, stagePath, StandardCopyOption.ATOMIC_MOVE)
        if (Files.exists(old)) {
          import scala.jdk.CollectionConverters._
          Files.walk(old).iterator().asScala.toSeq
            .reverse.foreach(Files.delete)
        }
      }
      stage
    }

  /** Census of one read-back: (rows, Σ c_custkey, Σ rollingHash(row)).
    * Per-row hashes are < 1e9+7, so the un-modded sum stays exact in
    * a BIGINT to ~9·10⁹ rows — far beyond any single table here.
    */
  private def censusOf(df: DataFrame, format: String): DataFrame =
    df.select(col("c_custkey"),
      concat_ws("|", col("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_mktsegment")).as("s"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("c_custkey")).as("key_sum"),
        sum(Text.rollingHash(col("s"))).as("content_sum"))
      .select(lit(format).as("format"), col("n_rows"), col("key_sum"),
        col("content_sum"))

  def roundtripCensus(spark: SparkSession, dir: String): DataFrame = {
    val stage = stageRoundtripDir(spark, dir)
    val schema = slice(spark, dir).schema
    // explicit schema on EVERY read: csv/json can't infer types, and
    // an empty corpus (0-row staging) leaves orc/parquet with no
    // footer to infer from — the read must still produce the audited
    // shape, not throw
    val csv = spark.read.option("header", "true").schema(schema)
      .csv(s"$stage/csv")
    val json = spark.read.schema(schema).json(s"$stage/json")
    val orc = spark.read.schema(schema).orc(s"$stage/orc")
    // partition column comes back typed from the directory names;
    // select restores the audited column order
    val pq = spark.read.schema(schema).parquet(s"$stage/parquet_part")
      .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    censusOf(slice(spark, dir), "source")
      .unionByName(censusOf(csv, "csv"))
      .unionByName(censusOf(json, "json"))
      .unionByName(censusOf(orc, "orc"))
      .unionByName(censusOf(pq, "parquet_part"))
      .orderBy("format")
  }

  val queries: Map[String, GQuery] = Map(
    "src_roundtrip_census" -> GQuery.sql(roundtripCensus,
      """WITH c AS (
        |  SELECT c_custkey,
        |    concat_ws('|', c_custkey, c_name, c_nationkey, c_mktsegment) AS s
        |  FROM customer),
        |h AS (
        |  SELECT c_custkey,
        |    CAST(list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(range(1, length(s) + 1),
        |          i -> CAST(ascii(s[i]) AS BIGINT))),
        |      (acc, x) -> (acc * 131 + x) % 1000000007) AS BIGINT) AS rh
        |  FROM c),
        |a AS (
        |  SELECT count(*) AS n_rows,
        |    CAST(sum(c_custkey) AS BIGINT) AS key_sum,
        |    CAST(sum(rh) AS BIGINT) AS content_sum
        |  FROM h)
        |SELECT f.format, a.n_rows, a.key_sum, a.content_sum
        |FROM a CROSS JOIN (VALUES ('csv'), ('json'), ('orc'),
        |  ('parquet_part'), ('source')) f(format)
        |ORDER BY f.format""".stripMargin))
}
