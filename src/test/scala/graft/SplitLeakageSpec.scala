package graft

import org.apache.spark.sql.functions._

/** Pins `pipe_split_leakage` against a driver-side replay of the
  * split assignment over the same pair set.
  */
class SplitLeakageSpec extends SparkTestBase {

  test("census equals the driver-side split replay over the pair graph") {
    def splitOf(id: Long): String = {
      val b = ((id % 999983L) * 2654435761L) % 100L
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val docs = Tables.documents(spark, SfDir)
    val srcOf = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = graft.operators.Dedup.ngramJaccardOn(
        docs.select("doc_id", "source", "text"))
      .select("doc_id_1", "doc_id_2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val expected = pairs.groupBy(p => srcOf(p._1)).map { case (src, ps) =>
      src -> (ps.length.toLong,
        ps.count(p => splitOf(p._1) != splitOf(p._2)).toLong)
    }
    val out = graft.operators.Pipeline.splitLeakage(spark, SfDir).collect()
    assert(out.map(_.getString(0)).toSet == expected.keySet)
    out.foreach { r =>
      val (np, nc) = expected(r.getString(0))
      assert(r.getLong(1) == np && r.getLong(2) == nc)
      assert(nc <= np)
      assert(r.getLong(3) == (if (np == 0) 0L else (2 * nc * 1000000L + np) / (2 * np)))
    }
  }
}
