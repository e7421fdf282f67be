package graft

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback

/** VERDICT r9 #1 done-gate: the four native text expressions
  * (ShingleHashes, NGrams, PhashSignature, RakeCandidates) carry real
  * `doGenCode`, so the dedup/text hot scans must contain NO graft
  * expression that falls back to interpreted eval. Scoped to graft
  * classes: Spark's own plans may legitimately contain built-in
  * `CodegenFallback` expressions outside our control.
  */
class NativeCodegenSpec extends SparkTestBase {

  private val HotQueries = Seq(
    "dd_ngram_jaccard", "dd_minhash_lsh", "dd_containment",
    "pipe_split_leakage", "mm_phash_dedup", "txt_rake_keyphrases",
    "wc_bigrams", "wc_cooccurrence")

  private def graftFallbacksIn(name: String): Set[String] = {
    val df = SparkEntry.queries(name)(spark, SfDir)
    val offenders = scala.collection.mutable.Set.empty[String]
    df.queryExecution.executedPlan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case e: CodegenFallback if e.getClass.getName.startsWith("graft.") =>
          offenders += e.getClass.getName
        case _ =>
      })
    }
    offenders.toSet
  }

  test("no graft expression in the hot scans is a CodegenFallback") {
    HotQueries.foreach { name =>
      val offenders = graftFallbacksIn(name)
      assert(offenders.isEmpty,
        s"$name plan contains interpreted graft expressions: $offenders")
    }
  }

  test("the WHOLE registry is free of graft CodegenFallback expressions") {
    // §3's "everything codegen" as a structural property, not a
    // per-query promise: every native graft expression anywhere in
    // any registry query's physical plan (all SparkEntry.queries.size
    // of them) must carry real doGenCode.
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val off = graftFallbacksIn(name)
      if (off.isEmpty) None else Some(s"$name: ${off.mkString(",")}")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("generated and interpreted paths agree on the native text expressions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Exercise the actual codegen'd projection against a direct
    // interpreted eval of the same expression tree on tricky inputs
    // (surrogate pairs, empty strings, all-stopword text).
    val rows = Seq(
      "alpha beta gamma alpha beta", "", "the and of", "a",
      "mixed CASE Text; with, punct!  spaces", "emoji 😀 pair x y z")
    val df = rows.toDF("t")
    val ng = df.select(
      graft.functions.NGrams.ngrams(col("t"), 2).as("ng"),
      graft.functions.ShingleHashes.shingle_hashes(col("t"), 3).as("sh"),
      graft.functions.PhashSignature.phash_signature(col("t"), 2, 8).as("ph"))
    val got = ng.collect()
    rows.zip(got).foreach { case (s, r) =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val wantNg = graft.functions.NGrams.compute(u, 2)
        .toArray[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      assert(r.getSeq[String](0) == wantNg, s"ngrams diverged on '$s'")
      val wantSh = graft.functions.ShingleHashes.compute(u, 3)
        .toLongArray().toSeq
      assert(r.getSeq[Long](1) == wantSh, s"shingles diverged on '$s'")
      val wantPh = graft.functions.PhashSignature.compute(u, 2, 8)
      if (wantPh == null) assert(r.isNullAt(2), s"phash null diverged on '$s'")
      else assert(r.getLong(2) == wantPh.longValue(), s"phash diverged on '$s'")
    }
  }

  test("vec_dot_long: codegen agrees with a plain-Scala dot on edge shapes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.vec_dot_long
    // unequal lengths truncate to the shorter (the vec_dot contract),
    // empty arrays dot to 0, negatives and large-ish magnitudes exact
    val rows: Seq[(Seq[Long], Seq[Long])] = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-7L, 580L, 0L), Seq(580L, -7L, 9L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1000000L, -1000000L), Seq(1000000L, 1000000L)),
      (Seq(1L, 2L, 3L, 4L), Seq(9L, 8L)))
    val got = rows.toDF("a", "b")
      .select(vec_dot_long(col("a"), col("b")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    val want = rows.map { case (a, b) =>
      a.zip(b).map { case (x, y) => x * y }.sum }
    assert(got == want)
  }
}
