package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the native `RakeCandidates` walk against the composed island
  * construction it replaced (posexplode → lag/cumsum window →
  * island⋈phrase joins) — on the corpus and on edge literals. The
  * oracle hash certifies end-to-end scores; this certifies the
  * candidate extraction row-for-row.
  */
class RakeFusionSpec extends SparkTestBase {
  import graft.operators.TextAnalysis.Stopwords

  /** (doc_id, island, phrase, w, len) via the composed construction. */
  private def composed(df: org.apache.spark.sql.DataFrame) = {
    val toks = df.select(col("doc_id"),
      posexplode(graft.functions.Text.tokens(lower(col("text"))))
        .as(Seq("pos", "w")))
    val ns = toks.filter(!col("w").isInCollection(Stopwords))
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val isl = ns
      .withColumn("brk",
        when(lag(col("pos"), 1).over(byDoc) === col("pos") - 1, 0L).otherwise(1L))
      .withColumn("island", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ph = isl.groupBy("doc_id", "island")
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos").as("p"), col("w").as("w")))),
          x => x.getField("w")), " ").as("phrase"),
        count(lit(1)).as("len"))
    isl.join(ph, Seq("doc_id", "island"))
      .select(col("doc_id"), col("phrase"), col("w"), col("len"))
  }

  private def fused(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"),
        explode(graft.functions.RakeCandidates.rake_candidates(
          col("text"), Stopwords.toSet)).as("o"))
      .select(col("doc_id"), col("o.phrase").as("phrase"),
        col("o.w").as("w"), col("o.len").as("len"))

  private def bag(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .groupBy(identity).view.mapValues(_.length).toMap

  test("fused candidates equal the composed islands on the whole corpus") {
    // island ordinals differ between the two constructions (cumsum id
    // vs dense ordinal) — the per-occurrence (doc, phrase, word, len)
    // MULTISET is the identity that matters for scoring
    val docs = Tables.documents(spark, SfDir).select("doc_id", "text")
    val c = bag(composed(docs).collect())
    val f = bag(fused(docs).collect())
    assert(f.nonEmpty && f == c)
  }

  test("edge literals: leading/trailing stopwords, all-stopword, punct-only") {
    import spark.implicits._
    val rows = Seq(
      1L -> "the quick brown fox and the lazy dog",
      2L -> "the a an and of to in is",       // all stopwords → no rows
      3L -> "...!!!,,,",                       // no tokens → no rows
      // punctuation is a TOKENIZER delimiter, not an island breaker:
      // positions stay consecutive across the comma, so this is ONE
      // island "alpha beta alpha beta" then (after the stopword) "gamma"
      4L -> "alpha beta, alpha beta, and gamma",
      5L -> "The IS Mixed CASE tokens"          // case-folding
    ).toDF("doc_id", "text")
    val c = bag(composed(rows).collect())
    val f = bag(fused(rows).collect())
    assert(f == c)
    assert(!f.keys.exists(_._1 == 2L) && !f.keys.exists(_._1 == 3L))
    assert(f(((4L, "alpha beta alpha beta", "alpha", 4L))) == 2)
    assert(f(((4L, "gamma", "gamma", 1L))) == 1)
  }
}
