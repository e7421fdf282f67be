package graft

import org.apache.spark.sql.DataFrame

/** Lineage truncation for the iterative fixpoint family (PageRank,
  * connected components, k-core, LPA, HITS, BFS, random walks).
  *
  * Default is `localCheckpoint()` — executor-local blocks, the right
  * trade on a single machine and for short loops, but the blocks die
  * with their executor: on a real cluster a lost executor kills the
  * whole job because the truncated lineage cannot be replayed.
  *
  * Setting the Spark conf `graft.checkpoint.dir` (e.g. to an HDFS/S3
  * path) switches EVERY fixpoint round to reliable `checkpoint()`:
  * rounds are written to durable storage, so executor loss costs one
  * round's recompute, not the job. First value seen wins for the
  * session (Spark's checkpoint dir is context-global).
  */
object Ckpt {
  def truncate(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption("graft.checkpoint.dir") match {
      case Some(dir) =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }

  /** `.truncated` postfix form so loop bodies read like the
    * `.localCheckpoint()` chains they replace.
    */
  implicit class TruncOps(private val df: DataFrame) extends AnyVal {
    def truncated: DataFrame = truncate(df)
  }
}
