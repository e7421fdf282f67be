package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Replays the reference's OWN whitebox tests
  * (/root/reference/mapreduce/tests/whitebox_tests/tests.py) through
  * this engine: same input files, same expected `word,count` output
  * lines, same order-insensitive comparison tests.py uses. The
  * worker-failure variants exercise the reference's recovery path —
  * Spark's task retry covers that natively for batch (and
  * RecoverySpec pins the streaming checkpoint analogue), so each test
  * appears once here.
  */
class ReferenceConformanceSpec extends SparkTestBase {

  private val WhiteboxDir = "/root/reference/mapreduce/tests/whitebox_tests"

  /** The reference job: split on whitespace + string.punctuation,
    * drop empties, count per word (worker/algorithm.py:4-23), emitted
    * in its `word,count` line format.
    */
  private def wordcountLines(paths: String*): Set[String] =
    MapReduce.mapReduce(
      spark.read.text(paths: _*),
      df => df.select(explode(Text.tokens(col("value"))).as("word")),
      "word",
      count(lit(1)).as("cnt"))
      .collect().map(r => s"${r.getString(0)},${r.getLong(1)}").toSet

  private def expectedLines(name: String): Set[String] =
    new String(Files.readAllBytes(Paths.get(s"$WhiteboxDir/$name")), "UTF-8")
      .split("\n").filter(_.nonEmpty).toSet

  test("single_word: every ASCII punctuation delimiter strips away") {
    assert(wordcountLines(s"$WhiteboxDir/single_word_input") ==
      expectedLines("single_word_output"))
  }

  test("multiple_words: a three-file input directory reduces once") {
    assert(wordcountLines(
      s"$WhiteboxDir/multiple_words_input1",
      s"$WhiteboxDir/multiple_words_input2",
      s"$WhiteboxDir/multiple_words_input3") ==
      expectedLines("multiple_words_output"))
  }

  test("big_file: 1050625 occurrences count exactly (reconstructed input)") {
    // big_file_input is the repo's one missing large blob
    // (.MISSING_LARGE_BLOBS); its expected output pins the count at
    // 1025² = 1050625, so a deterministic reconstruction — 1025 lines
    // of 1025 space-separated `word`s — exercises the same job at the
    // same scale: a file large enough that the reference splits it
    // across workers, here across input partitions.
    val dir = Files.createTempDirectory("graft_bigfile")
    val line = Array.fill(1025)("word").mkString(" ")
    Files.write(dir.resolve("big_file_input"),
      Array.fill(1025)(line).mkString("\n").getBytes("UTF-8"))
    assert(wordcountLines(dir.resolve("big_file_input").toString) ==
      expectedLines("big_file_output"))
  }
}
