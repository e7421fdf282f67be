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

  test("registry: every oracle key exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
