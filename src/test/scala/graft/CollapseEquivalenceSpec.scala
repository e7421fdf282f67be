package graft

import org.apache.spark.sql.functions._

/** Exact-family-collapse equivalence (VERDICT r14 #1): collapsing
  * identical-(source, shingle-set) docs to one representative before
  * near-dup pair verification must leave components, labels, and
  * sizes BYTE-IDENTICAL to the uncollapsed pipeline — the collapse is
  * a pure workload optimization, never a semantics change. Also pins
  * the edges the key construction has to get right: source blocking
  * survives (identical text across sources never merges), empty-text
  * docs stay pairless, and an isolated exact family still forms its
  * own component.
  */
class CollapseEquivalenceSpec extends SparkTestBase {

  import operators.Dedup

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("id"), col("lbl"), col("cluster_size"))
      .orderBy("id").collect().map(_.toString).toSeq

  test("collapsed components equal the uncollapsed pipeline on the planted corpus") {
    val aug = Dedup.withPlanted(Dedup.docsTable(spark, SfDir))
    val uncollapsed = Dedup.connectedComponents(
      Dedup.ngramJaccardOn(aug).select(col("doc_id_1"), col("doc_id_2")))
    val collapsed = Dedup.collapsedNearDupComponents(aug)
    assert(canon(collapsed).nonEmpty)
    assert(canon(collapsed) == canon(uncollapsed),
      "exact-family collapse changed the component structure")
  }

  test("collapse respects source blocking, empty docs, and isolated families") {
    import spark.implicits._
    val docs = Seq(
      // an isolated exact family of three (no cross-family near-dup):
      // must surface as one component of size 3 labeled by the min id
      (1L, "a", "alpha beta gamma delta epsilon"),
      (2L, "a", "alpha beta gamma delta epsilon"),
      (3L, "a", "alpha beta gamma delta epsilon"),
      // identical text in ANOTHER source: source blocking means no
      // cross-source pair; a lone copy has no pair at all
      (4L, "b", "alpha beta gamma delta epsilon"),
      // empty + sub-shingle docs: no shingles, no pairs, excluded
      (5L, "a", ""),
      (6L, "a", "two words"),
      // a near-dup (not exact) neighbor of the family: one shared
      // 4-of-5-shingle overlap, joins the family's component
      (7L, "a", "alpha beta gamma delta zeta"))
      .toDF("doc_id", "source", "text")
    val uncollapsed = Dedup.connectedComponents(
      Dedup.ngramJaccardOn(docs).select(col("doc_id_1"), col("doc_id_2")))
    val collapsed = Dedup.collapsedNearDupComponents(docs)
    assert(canon(collapsed) == canon(uncollapsed))
    val byId = collapsed.collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("lbl"), r.getAs[Long]("cluster_size"))).toMap
    assert(!byId.contains(4L), "cross-source copy must stay pairless")
    assert(!byId.contains(5L) && !byId.contains(6L),
      "shingle-less docs must stay out of the component set")
    assert(byId(1L)._1 == 1L && byId(2L)._1 == 1L && byId(3L)._1 == 1L,
      "exact family must label by its min id")
    // trigram overlap 2/4 = J 0.5 ≥ 0.35: the near-dup joins the
    // family's component through the representative
    assert(byId(7L)._1 == 1L && byId(7L)._2 == 4L,
      s"near-dup neighbor must join the family component, got ${byId.get(7L)}")
  }

  test("pair workload drops to representatives: C(reps,2) not C(members,2)") {
    import spark.implicits._
    // one family of 6 exact copies + 1 near-dup: uncollapsed verifies
    // C(7,2)=21 pairs; collapsed verifies C(2,2)=1 (rep vs near-dup)
    val docs = (1L to 6L).map(i => (i, "a", "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "source", "text")
      .unionByName(Seq((7L, "a", "alpha beta gamma delta zeta"))
        .toDF("doc_id", "source", "text"))
    val collapsed = Dedup.collapsedNearDupComponents(docs)
    val uncollapsed = Dedup.connectedComponents(
      Dedup.ngramJaccardOn(docs).select(col("doc_id_1"), col("doc_id_2")))
    assert(canon(collapsed) == canon(uncollapsed))
    // all 7 in one component labeled 1 (family ∪ near-dup, J ≥ 0.35)
    val sizes = collapsed.select("lbl", "cluster_size").distinct().collect()
    assert(sizes.length == 1 && sizes(0).getAs[Long]("cluster_size") == 7L)
  }
}
