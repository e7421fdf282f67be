package graft

import org.apache.spark.sql.functions._

/** Property pins for `mm_dedup_lift`: the lift inequality chain and
  * consistency with the standalone exact/perceptual censuses.
  */
class DedupLiftSpec extends SparkTestBase {

  test("surpluses nest: exact <= phash, lift = difference, scope matches phash") {
    val out = graft.operators.Multimodal.dedupLift(spark, SfDir).collect()
    assert(out.nonEmpty)
    val phash = graft.operators.Multimodal.phashDedup(spark, SfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.foreach { r =>
      val (kind, n, ex, ph, lift, ppm) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(ex >= 0 && ph >= ex, s"$kind: phash surplus must cover exact")
      assert(lift == ph - ex && lift >= 0)
      assert(ppm == (2 * lift * 1000000L + n) / (2 * n))
      // same population and bucket structure as the standalone census
      val (np, nsig) = phash(kind)
      assert(n == np && n - ph == nsig)
    }
  }

  test("semantic dedup drops exactly the planted paraphrase twins") {
    val out = graft.operators.Dedup.semanticDedup(spark, SfDir).collect()
    val planted = Tables.embeddings(spark, SfDir)
      .filter(col("vec_id") % 4 === 0).count()
    assert(out.length.toLong == planted)
    out.foreach { r =>
      // each dropped vector is a twin, canonical is its source
      assert(r.getAs[Long]("vec_id") ==
        r.getAs[Long]("canonical_id") + graft.operators.Dedup.PlantOffset)
      val c2 = r.getAs[Long]("cos2_ppm")
      assert(c2 >= graft.operators.Dedup.SemTau2Ppm)
      // genuinely perturbed: strictly below an exact-copy cosine
      assert(c2 < 1000000L, s"cos2_ppm $c2 looks like an exact copy")
    }
  }

  test("semantic lift: twins invisible to shingles, visible to bag cosine") {
    val rows = graft.operators.Dedup.semanticLift(spark, SfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, lex, sem, lift, ppm) = (r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_lex"), r.getAs[Long]("n_sem"),
        r.getAs[Long]("sem_lift"), r.getAs[Long]("lift_ppm"))
      assert(n > 0 && lex >= 0 && sem <= n)
      assert(lift == sem - lex)
      assert(ppm == (2 * lift * 1000000L + n) / (2 * n))
      // the SemDeDup motivation, quantified: the semantic pass sees
      // strictly more of the paraphrase twins than shingle Jaccard
      assert(sem > lex, s"${r.getAs[String]("source")}: no semantic lift")
    }
  }
}
