package graft

import org.apache.spark.sql.functions._
import graft.operators.WordCount

class WordCountSpec extends SparkTestBase {

  test("wordcount totals equal total token occurrences") {
    val wc = WordCount.wordcount(spark, SfDir)
    val totalFromCounts =
      wc.agg(sum("cnt")).collect()(0).getLong(0)
    val totalTokens = Tables.documents(spark, SfDir)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .count()
    assert(totalFromCounts == totalTokens)
    assert(wc.count() > 0)
  }

  test("tokenizer drops empties and splits on punctuation like the reference") {
    import spark.implicits._
    val df = Seq("!!!word!!!\"\"\"word\"\"\"   word   word", "", "a,b;;c").toDF("text")
    val toks = df.select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .groupBy("w").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(toks == Map("word" -> 4L, "a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("raw-text-directory wordcount equals the parquet wordcount") {
    val fromText = WordCount.wordcountText(spark, SfDir)
    val fromParquet = WordCount.wordcount(spark, SfDir)
    assert(fromText.count() > 0)
    assert(fromText.exceptAll(fromParquet).count() == 0 &&
      fromParquet.exceptAll(fromText).count() == 0)
  }

  test("inverted index doc lists are sorted and consistent with n_docs") {
    val ii = WordCount.invertedIndex(spark, SfDir)
    val bad = ii.filter(size(split(col("doc_ids"), ",")) =!= col("n_docs"))
    assert(bad.count() == 0)
  }

  test("sharded inverted index is shard-size invariant (no unbounded per-key collect)") {
    // A tiny shard forces many level-1 runs per word; output must be
    // byte-identical to an effectively unsharded run — pins that the
    // bounded-buffer rewrite preserves the contract.
    val tiny = WordCount.invertedIndexSharded(spark, SfDir, 3L)
    val one = WordCount.invertedIndexSharded(spark, SfDir, Long.MaxValue / 2)
    assert(tiny.exceptAll(one).count() == 0 && one.exceptAll(tiny).count() == 0)
  }

  test("ShingleHashes and NGrams match the composed tokenizer pipeline") {
    import spark.implicits._
    val df = Seq("The quick, brown fox! jumps").toDF("text")
    // hashes must equal Spark's own xxhash64 of the space-joined windows
    val got = df.select(explode(
        graft.functions.ShingleHashes.shingle_hashes(col("text"), 3)).as("h"))
      .collect().map(_.getLong(0)).toSet
    val want = df.select(explode(array(
        xxhash64(lit("the quick brown")), xxhash64(lit("quick brown fox")),
        xxhash64(lit("brown fox jumps")))).as("h"))
      .collect().map(_.getLong(0)).toSet
    assert(got == want)
    // NGrams emits every occurrence, in order, tokenized identically
    val ng = df.select(graft.functions.NGrams.ngrams(col("text"), 2).as("g"))
      .collect()(0).getSeq[String](0)
    assert(ng == Seq("the quick", "quick brown", "brown fox", "fox jumps"))
  }

  test("cooccurrence pairs are canonical and reconcile with the n-gram streams") {
    val co = operators.WordCount.cooccurrence(spark, SfDir)
    val rows = co.collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // unordered canonical form: w1 <= w2 always
    assert(rows.forall(r => r.getString(0) <= r.getString(1)))
    // counts are bounded by the total pair stream (d<=2 skip-grams)
    val docs = Tables.documents(spark, SfDir)
    val nPairs =
      docs.select(explode(graft.functions.NGrams.ngrams(col("text"), 2))).count() +
        docs.select(explode(graft.functions.NGrams.ngrams(col("text"), 3))).count()
    assert(rows.map(_.getLong(2)).sum <= nPairs)
  }

  test("pii scrub redacts exactly the planted PII and leaves clean docs untouched") {
    val s = operators.TextAnalysis.piiScrub(spark, SfDir)
    val joined = s.join(Tables.documents(spark, SfDir), "doc_id")
      .withColumn("plain_md5", md5(lower(col("text")).cast("binary")))
    // planted docs: exactly one email and one digit run (the ref id)
    assert(joined.filter(col("doc_id") % 3 === 0 &&
      (col("n_emails") =!= 1 || col("n_nums") =!= 1)).count() == 0)
    // the digit-free natural docs scrub to their own lowered text
    assert(joined.filter(col("doc_id") % 3 =!= 0 &&
      (col("n_emails") =!= 0 || col("n_nums") =!= 0 ||
        col("scrubbed_md5") =!= col("plain_md5"))).count() == 0)
    // and a planted doc's hash must differ from its unscrubbed text
    assert(joined.filter(col("doc_id") % 3 === 0 &&
      col("scrubbed_md5") === col("plain_md5")).count() == 0)
  }

  test("registry: every oracle key exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("SURVEY.md §2 inventory matches the registry exactly") {
    // the coverage table and the code can never drift: every `id`
    // row in SURVEY §2 must be a registry query and vice versa
    // resolved relative to the working directory (sbt runs tests from
    // the project root) so the spec survives any checkout location
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md").toAbsolutePath), "UTF-8")
    val section2 = survey.substring(survey.indexOf("## §2"),
      survey.indexOf("## §3"))
    val surveyIds = "\\| `([a-z0-9_]+)` \\|".r
      .findAllMatchIn(section2).map(_.group(1)).toSet
    val registryIds = SparkEntry.queries.keySet
    assert(surveyIds == registryIds,
      s"survey-only: ${surveyIds.diff(registryIds)}; " +
        s"registry-only: ${registryIds.diff(surveyIds)}")
  }
}
