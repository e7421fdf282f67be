package graft

import org.apache.spark.sql.functions._

/** The semantic-side hot-cell cap (`graft.sem.cellcap` — the mirror
  * of `graft.lsh.bucketcap`): on a one-region corpus (a topical crawl
  * where most embeddings share a semantic neighborhood) the
  * within-cell pair join goes quadratic in the fat cell's width; the
  * cap excludes over-wide cells from candidate generation, trading
  * dense-region recall (the drop-all-but-one population) for bounded
  * work. Pins: (a) byte-identity under a generous cap on the stock
  * corpus; (b) on a constructed one-region corpus the capped run's
  * output is a strict, much smaller subset of the uncapped run's.
  */
class SemCellCapSpec extends SparkTestBase {

  private def withCap[A](cap: Option[Long])(body: => A): A = {
    val key = "graft.sem.cellcap"
    val prev = spark.conf.getOption(key)
    cap.fold(spark.conf.unset(key))(c => spark.conf.set(key, c.toString))
    try body
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("generous cap is byte-identical on the stock corpus") {
    val default = operators.Dedup.semanticDedup(spark, SfDir)
      .collect().map(_.toSeq).toSeq
    val capped = withCap(Some(4096L)) {
      operators.Dedup.semanticDedup(spark, SfDir).collect().map(_.toSeq).toSeq
    }
    assert(capped == default)
  }

  test("one-region corpus: cap bounds the candidate blowup, subset holds") {
    // 240 vectors all tiny perturbations of one direction — every
    // pair is a semantic dup, so the uncapped within-cell join is
    // genuinely quadratic (the hot-cell shape). dim 8 keeps it cheap.
    val dim = 8
    val n = 240
    val dir = java.nio.file.Files.createTempDirectory("graft_semcap")
    try {
      import spark.implicits._
      val rows = (0 until n).map { i =>
        val v = Array.tabulate(dim) { d =>
          (if (d == 0) 1.0f else 0.0f) + 0.001f * ((i + d) % 7)
        }
        (i.toLong, i % 3, v)
      }
      rows.toDF("vec_id", "label", "embedding")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val uncapped = operators.Dedup.semanticDedup(spark, dir.toString)
        .collect().map(_.getAs[Long]("vec_id")).toSet
      // every vector except global-min partners drops: quadratic
      // candidate work produced a corpus-sized drop set
      assert(uncapped.size > n / 2,
        s"expected a dense drop set, got ${uncapped.size}")
      val capped = withCap(Some(8L)) {
        operators.Dedup.semanticDedup(spark, dir.toString)
          .collect().map(_.getAs[Long]("vec_id")).toSet
      }
      assert(capped.subsetOf(uncapped), "cap must only REMOVE pairs")
      assert(capped.size < uncapped.size / 4,
        s"cap should bound the hot cell: ${capped.size} vs ${uncapped.size}")
    } finally operators.Staging.deleteTree(dir)
  }
}
