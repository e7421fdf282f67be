package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-7 changes beyond their DuckDB oracles. */
class Round7OpsSpec extends SparkTestBase {

  test("rankVocab bucket-offset rank equals the global frequency rank") {
    import spark.implicits._
    // Counts straddling every band boundary: log-band head (with a tie
    // across different first chars), the 16/17 exact/log edge, 32/33
    // power-of-two edge, and a deep cnt=1 tail spanning many first-char
    // prefixes with ties inside each prefix.
    val vocab = (
      Seq("zz-head" -> 9000L, "aa-head" -> 9000L, "gamma" -> 500L,
        "delta" -> 64L, "eps" -> 33L, "zeta" -> 32L, "eta" -> 31L,
        "theta" -> 17L, "iota" -> 16L, "kappa" -> 16L, "mu" -> 15L,
        "nu" -> 2L) ++
        ('a' to 'z').flatMap(c => Seq(s"${c}x" -> 1L, s"${c}y" -> 1L))
      ).toDF("w", "cnt")
    val got = operators.Pipeline.rankVocab(vocab).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val want = vocab.collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (w, c) => (-c, w) }
      .zipWithIndex.map { case ((w, _), i) => w -> (i + 1).toLong }.toMap
    assert(got === want)
  }

  test("rankVocab plan has NO unpartitioned window at all") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val toks = Tables.documents(spark, SfDir)
      .select(posexplode(graft.functions.Text.tokens(lower(col("text"))))
        .as(Seq("pos", "w")))
    val ranked = operators.Pipeline.rankVocab(
      toks.groupBy("w").agg(count(lit(1)).as("cnt")))
    val plan = ranked.queryExecution.optimizedPlan
    plan.foreach {
      case w: LWindow =>
        assert(w.partitionSpec.nonEmpty,
          "offsets are a theta-join prefix sum — no global window may appear")
      case _ =>
    }
  }

  test("codegen guard counts CodeGenerator errors and the risky queries stay clean") {
    CodegenGuard.install()
    CodegenGuard.reset()
    // positive control: the counter must see an ERROR routed through the
    // same logger Spark's codegen compiler uses
    org.apache.logging.log4j.LogManager
      .getLogger("org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
      .error("synthetic codegen failure (guard positive control)")
    assert(CodegenGuard.count === 1L, "guard missed a CodeGenerator ERROR")
    CodegenGuard.reset()
    // the expression-heaviest queries — the ones that have previously
    // flirted with janino's budget — must compile cleanly end to end
    Seq("ann_pq_topk", "dd_simhash", "dd_minhash_lsh", "mm_chunk",
      "txt_fingerprint", "pipe_tokenize_to_ids").foreach { q =>
      SparkEntry.queries(q)(spark, SfDir).count()
    }
    assert(CodegenGuard.count === 0L,
      "a stage silently fell out of whole-stage codegen")
  }

  test("kmeans centroid strings decode to in-range scaled components") {
    val out = operators.Similarity.kmeans(spark, SfDir).collect()
    // embeddings are unit-scale floats: every ×1e6 component must stay
    // well inside ±10⁸ — a garbled join or format drift would explode this
    out.foreach { r =>
      val comps = r.getString(2).split(" ").map(_.toLong)
      assert(comps.length === 64)
      assert(comps.forall(c => math.abs(c) < 100000000L))
    }
  }
}
