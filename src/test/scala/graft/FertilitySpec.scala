package graft

import org.apache.spark.sql.functions._

/** Property pins for `pipe_tokenizer_fertility`: a driver-side regex
  * replay on a sample and the partition-of-corpus identity.
  */
class FertilitySpec extends SparkTestBase {

  test("census sums equal a driver-side regex replay") {
    val bpeRe = graft.functions.Text.BpeIshRegex.r
    val docs = Tables.documents(spark, SfDir)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (lang, rows) =>
      lang -> (rows.length.toLong,
        rows.map(r => r._2.split("\\s+").count(_.nonEmpty).toLong).sum,
        rows.map(r => bpeRe.findAllIn(r._2).length.toLong).sum,
        rows.map(_._2.length.toLong).sum)
    }
    val out = graft.operators.Pipeline.tokenizerFertility(spark, SfDir).collect()
    assert(out.map(_.getString(0)).toSet == expected.keySet)
    assert(out.map(_.getLong(1)).sum == docs.length.toLong)
    out.foreach { r =>
      val (nd, nw, nb, nc) = expected(r.getString(0))
      assert(r.getLong(1) == nd && r.getLong(2) == nw)
      assert(r.getLong(3) == nb && r.getLong(4) == nc)
      assert(r.getLong(5) == (if (nw == 0) 0L else (2 * nb * 1000L + nw) / (2 * nw)))
      assert(r.getLong(6) == (if (nb == 0) 0L else (2 * nc * 1000L + nb) / (2 * nb)))
    }
  }
}
