package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the native `PhashSignature` fused loop against the composed
  * construction it replaced (substring → BMP-char filter → posexplode
  * → per-frame HALF_UP means → lag window → shiftleft packing), on
  * the real corpus AND on adversarial literals the corpus can't
  * guarantee — the oracle hash certifies corpus behavior, this spec
  * certifies the edges.
  */
class PhashFusionSpec extends SparkTestBase {
  import graft.operators.Multimodal.{PhashBits, SceneFrameBytes}

  private def composedSignatures(df: org.apache.spark.sql.DataFrame) = {
    val prefixChars = (PhashBits + 1) * SceneFrameBytes
    val frames = df
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        posexplode(filter(
          split(substring(col("text"), 1, prefixChars.toInt), ""),
          s => length(s) === 1))
          .as(Seq("pos", "ch")))
      .select(col("doc_id"),
        expr(s"pos div $SceneFrameBytes").as("frame_idx"),
        ascii(col("ch")).cast("long").as("v"))
      .groupBy("doc_id", "frame_idx")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .select(col("doc_id"), col("frame_idx"),
        expr("(2*s + n) div (2*n)").as("mv"))
    val byDoc = Window.partitionBy("doc_id").orderBy("frame_idx")
    frames
      .withColumn("prev", lag(col("mv"), 1).over(byDoc))
      .select(col("doc_id"),
        when(col("mv") > col("prev"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(frame_idx AS INT) - 1)"))
          .otherwise(lit(0L)).as("bit"))
      .groupBy("doc_id")
      .agg(sum(col("bit")).as("signature"))
  }

  private def fusedSignatures(df: org.apache.spark.sql.DataFrame) =
    df.filter(length(col("text")) > 0)
      .select(col("doc_id"),
        graft.functions.PhashSignature.phash_signature(
          col("text"), SceneFrameBytes.toInt, PhashBits).as("signature"))
      .filter(col("signature").isNotNull)

  test("fused signature equals the composed plan on the whole corpus") {
    val docs = Tables.documents(spark, SfDir).select("doc_id", "text")
    val composed = composedSignatures(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fused = fusedSignatures(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused.size == composed.size && fused.nonEmpty)
    assert(fused == composed)
  }

  test("edge payloads: single frame, partial frames, non-BMP, all-non-BMP") {
    import spark.implicits._
    val frame = SceneFrameBytes.toInt
    val rows = Seq(
      1L -> "a" * 10,                       // single partial frame → 0
      2L -> ("a" * frame + "zz"),           // partial second frame
      3L -> ("z" * frame + "a" * frame),    // falling mean → bit unset
      4L -> ("a" * frame + "z" * frame),    // rising mean → bit set
      5L -> ("a" * (frame - 1) + "😀" + "z" * frame), // non-BMP code point
      6L -> "😀😀",     // all-non-BMP: code points still censused
      7L -> "b" * ((PhashBits + 2) * frame) // longer than the prefix
    ).toDF("doc_id", "text")
    val composed = composedSignatures(rows).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fused = fusedSignatures(rows).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused == composed)
    assert(fused.contains(6L), "non-BMP code points are length-1 to Spark")
    assert(fused(1L) == 0L && fused(4L) == 1L && fused(3L) == 0L)
  }
}
