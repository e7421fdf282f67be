package graft

import org.apache.spark.sql.functions._

/** Pins the banded-Levenshtein refactor of `dd_edit_distance`
  * (Dedup.editDistance): the 3-arg `levenshtein(l, r, threshold)`
  * with threshold = max_len div 5 must reproduce the unbounded DP's
  * relative cut EXACTLY — same surviving pair set, same distances —
  * because within the band the banded DP is exact and above it the
  * −1 sentinel is excluded by the `dist >= 0` guard (without the
  * guard, −1·5 ≤ max_len would PASS the cross-multiplied cut — the
  * trap this spec exists to keep closed).
  */
class EditDistanceBandSpec extends SparkTestBase {

  test("banded levenshtein + guard == unbounded relative cut on real doc pairs") {
    val docs = Tables.documents(spark, SfDir)
      .select(col("doc_id"),
        graft.functions.Text.normalized(col("text")).as("nt"))
      .filter(length(col("nt")) > 0)
      .orderBy("doc_id").limit(40)
    val pairs = docs.select(col("doc_id").as("id1"), col("nt").as("t1"))
      .crossJoin(docs.select(col("doc_id").as("id2"), col("nt").as("t2")))
      .filter(col("id1") < col("id2"))
      .withColumn("max_len",
        greatest(length(col("t1")), length(col("t2"))).cast("long"))
      .withColumn("full", levenshtein(col("t1"), col("t2")).cast("long"))
      .withColumn("banded",
        expr("levenshtein(t1, t2, CAST(max_len div 5 AS INT))").cast("long"))
      .select("id1", "id2", "max_len", "full", "banded")
      .collect()
    assert(pairs.length > 500, "pair sample unexpectedly small")
    var passed = 0
    pairs.foreach { r =>
      val (maxLen, full, banded) =
        (r.getLong(2), r.getLong(3), r.getLong(4))
      val fullPass = full * 5 <= maxLen
      val bandPass = banded >= 0 && banded * 5 <= maxLen
      assert(fullPass == bandPass,
        s"cut disagreement: full=$full banded=$banded max_len=$maxLen")
      if (fullPass) {
        assert(full == banded,
          s"in-band distance mismatch: full=$full banded=$banded")
        passed += 1
      }
    }
    // self-pairs are excluded, so survivors may be rare — but the
    // sentinel path must have fired for the guard to be exercised
    assert(pairs.exists(_.getLong(4) == -1L),
      "no pair exceeded the band; spec is not exercising the sentinel")
  }

  test("dd_edit_distance registry row still runs under the banded form") {
    val out = graft.operators.Dedup.queries("dd_edit_distance")
      .fn(spark, SfDir)
    // every surviving row satisfies the cut with a non-negative dist
    val bad = out.filter(col("dist") < 0 ||
      col("dist") * 5 > col("max_len")).count()
    assert(bad == 0L)
  }
}
