package graft

import org.apache.spark.sql.functions._

/** Pins the `graft.checkpoint.dir` knob (Ckpt.truncate): with the
  * conf unset the fixpoint family truncates lineage via executor-local
  * blocks (`localCheckpoint`); with it set, rounds go through reliable
  * `checkpoint()` into the configured directory — the cluster-durable
  * path where losing an executor costs one round, not the job. Same
  * fixpoint, both modes, byte-identical output; and the reliable mode
  * must actually have written checkpoint files.
  */
class CheckpointSpec extends SparkTestBase {

  test("fixpoint output is identical under local and reliable checkpointing") {
    // pagerank, not lpaCommunities: the LPA label state is memoized
    // per (session, corpus) since r16, so its second run would read
    // the memo instead of re-running rounds under the reliable conf —
    // pagerank's per-round truncation re-executes on every call.
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val local = graft.operators.WordCount.pagerank(spark, SfDir)
      .collect().map(_.toSeq).toSeq
    try {
      spark.conf.set("graft.checkpoint.dir", dir)
      val reliable = graft.operators.WordCount.pagerank(spark, SfDir)
        .collect().map(_.toSeq).toSeq
      assert(local == reliable)
      // the reliable path must have materialized durable round files
      def files(f: java.io.File): Seq[java.io.File] = {
        val kids = Option(f.listFiles).map(_.toSeq).getOrElse(Seq.empty)
        kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(files)
      }
      assert(files(new java.io.File(dir)).nonEmpty,
        "graft.checkpoint.dir set but no checkpoint files were written")
    } finally {
      spark.conf.unset("graft.checkpoint.dir")
    }
  }
}
