package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each operator module contributes a `Map[String, GQuery]`; queries
  * and oracleSql are projected from the same registry so they can
  * never drift apart.
  */
object SparkEntry {

  val registry: Map[String, GQuery] =
    operators.WordCount.queries ++
      operators.Relational.queries ++
      operators.Events.queries ++
      operators.TextAnalysis.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.Multimodal.queries ++
      operators.Pipeline.queries ++
      operators.Bpe.queries ++
      operators.StreamingOps.queries ++
      operators.Sources.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.WordCount.wordcount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, GQuery(_, Some(sql))) => k -> sql }
}
