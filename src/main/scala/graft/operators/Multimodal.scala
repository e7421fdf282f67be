package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.G): media payloads are
  * opaque `binary` columns with typed metadata travelling alongside.
  * The decode step is STUBBED (no media libs in this environment) —
  * `stubDecode` below is a deterministic fake — but everything
  * Spark-side is real: schema, binary handling, per-partition
  * batching, and the feature-vector output shape a downstream
  * embedding/training stage consumes.
  */
object Multimodal {

  /** Payload + typed metadata extraction: byte size and a magic-byte
    * "sniff" (deterministic over the synthetic payload = utf-8 text
    * bytes). The real pipeline sniffs jpg/png/wav headers the same
    * way — prefix compare on the binary column.
    */
  def meta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        when(length(col("payload")) % 3 === 0, "image")
          .when(length(col("payload")) % 3 === 1, "audio")
          .otherwise("video").as("kind"))
      .orderBy("doc_id")

  /** Deterministic stand-in for a media decoder: a real pipeline
    * would replace this with an image/audio decode producing a
    * fixed-length feature vector. Operates on raw payload bytes.
    */
  private def stubDecode(payload: Array[Byte]): Array[Double] = {
    if (payload == null || payload.isEmpty) Array.fill(4)(0.0)
    else {
      val n = payload.length.toDouble
      var sum = 0L; var mx = Int.MinValue; var mn = Int.MaxValue
      payload.foreach { b => val v = b & 0xff; sum += v; if (v > mx) mx = v; if (v < mn) mn = v }
      Array(n, sum / n, mx.toDouble, mn.toDouble)
    }
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("batch_size", IntegerType),
    StructField("features", ArrayType(DoubleType))))

  /** mapPartitions batched decode→featurize: payloads are processed
    * in bounded batches per partition (the shape a GPU/vectorized
    * decoder needs — amortized setup per batch, bounded peak memory).
    * Partitioning, batch size, and output schema are the real
    * contract; only the per-payload decode body is stubbed.
    */
  def batchFeatures(spark: SparkSession, dir: String): DataFrame = {
    val BatchSize = 64
    val src = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    src.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        // one "decoder init" per batch happens here in a real pipeline
        batch.iterator.map { r =>
          Row(r.getLong(0), batch.size, stubDecode(r.getAs[Array[Byte]](1)))
        }
      }
    }(enc).orderBy("doc_id")
  }

  /** Frame-sampling plumbing for video-ish payloads: every payload
    * yields ceil(n_bytes / 1024) "frames"; we keep every 4th frame
    * index plus a deterministic per-frame fingerprint (stand-in for a
    * decoded frame hash). Schema and explode shape are the real
    * contract — the decode is the stub.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .select(col("doc_id"), length(col("payload")).cast("long").as("n_bytes"))
      .select(col("doc_id"),
        explode(sequence(lit(0L), expr("(n_bytes - 1) div 1024"))).as("frame_idx"))
      .filter(col("frame_idx") % 4 === 0)
      .select(col("doc_id"), col("frame_idx"),
        xxhash64(col("doc_id"), col("frame_idx")).as("frame_fingerprint"))
      .orderBy("doc_id", "frame_idx")

  val queries: Map[String, GQuery] = Map(
    "mm_frame_sample" -> GQuery.rowsOnly(frameSample),
    "mm_meta" -> GQuery.sql(meta,
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  CASE octet_length(encode(text)) % 3
        |    WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind
        |FROM documents ORDER BY doc_id""".stripMargin),
    "mm_batch_features" -> GQuery.rowsOnly(batchFeatures),
  )
}
