package graft

import org.apache.spark.sql.functions._

/** Pins the Unicode tokenizer twin (Text.unicodeTokens) on actual
  * non-ASCII text — the behavior the ASCII corpus oracle can't see:
  * accented Latin, CJK, and non-ASCII digits must survive as word
  * characters, while the reference ASCII tokenizer (deliberately
  * unchanged) splits on them as "punctuation".
  */
class UnicodeTokensSpec extends SparkTestBase {

  private def tok(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                  s: String): Seq[String] = {
    import spark.implicits._
    Seq(s).toDF("t").select(f(col("t")).as("toks"))
      .collect().head.getSeq[String](0)
  }

  test("unicode tokens keep accented, CJK, and non-ASCII digit runs") {
    assert(tok(graft.functions.Text.unicodeTokens, "héllo wörld, 你好！١٢٣ x2")
      == Seq("héllo", "wörld", "你好", "١٢٣", "x2"))
    // ASCII reference tokenizer splits ON the non-ASCII chars (they
    // are neither \p{Punct} nor \s, so they stay glued to any
    // adjacent word chars — reference semantics, pinned elsewhere);
    // the point here: the two tokenizers genuinely differ on
    // non-ASCII input, and only the unicode twin is multilingual-safe
    assert(tok(graft.functions.Text.unicodeTokens, "a—b…c")
      == Seq("a", "b", "c"))
  }

  test("unicode and ascii tokenizers agree on pure-ASCII text") {
    val s = "The quick! brown-fox; jumps_over 42 lazy dogs."
    assert(tok(graft.functions.Text.unicodeTokens, s)
      == tok(graft.functions.Text.tokens, s))
  }

  test("tokensFor selects by mode string") {
    // em dash: not \p{Punct} (ASCII class) but also not \p{L}\p{N} —
    // the one-char input where the two tokenizers provably diverge
    val s = "a—b"
    assert(tok(graft.functions.Text.tokensFor("unicode"), s)
      == Seq("a", "b"))
    assert(tok(graft.functions.Text.tokensFor("ascii"), s)
      == Seq("a—b"))
  }

  test("graft.tokenizer conf routes txt_ operators through the unicode twin") {
    // ADVICE r9 #2: the documented knob must actually reach an
    // operator. txt_quality's n_tokens tokenizes via docTokens; on a
    // text containing an em dash the two modes provably diverge, and
    // the conf must flip the result of the REGISTERED query path.
    import spark.implicits._
    val stage = "/root/repo/target/graft_tokconf_docs"
    Seq((0L, "en", "synth", "alpha—beta gamma", 16L))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$stage/documents.parquet")
    def nTokens(): Long =
      graft.operators.TextAnalysis.queries("txt_quality").fn(spark, stage)
        .select("n_tokens").collect().head.getLong(0)
    assert(nTokens() == 2L) // ascii default: "alpha—beta" is one token
    spark.conf.set("graft.tokenizer", "unicode")
    try assert(nTokens() == 3L) // unicode: em dash is a delimiter
    finally spark.conf.unset("graft.tokenizer")
    assert(nTokens() == 2L) // default restored — shared session stays clean
  }

  test("txt_token_count_unicode runs and counts every alnum char") {
    val out = graft.operators.TextAnalysis.queries("txt_token_count_unicode")
      .fn(spark, SfDir)
    assert(out.filter(col("n_tokens") <= 0).count() == 0)
    // token chars can never exceed total alnum chars
    assert(out.filter(col("n_alnum_chars") < col("n_tokens")).count() == 0)
  }
}
