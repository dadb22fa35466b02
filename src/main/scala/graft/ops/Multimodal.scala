package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: media payloads ride as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extract /
  * resize / frame-sample run partition-parallel over the bytes.
  *
  * The decode step is STUBBED: this container has no image/audio codecs,
  * so [[decodeStub]] derives deterministic pseudo-features from the raw
  * bytes. Everything around it — the schema contract, the
  * `mapPartitions`-batched execution (the JVM analog of `mapInPandas`
  * batch processing: one iterator pass per partition, no per-row setup),
  * the feature-column output shape — is the real production plumbing; a
  * real deployment swaps [[decodeStub]] for a codec call.
  *
  * Scale shape: decode is embarrassingly parallel and shuffle-free; the
  * only knob that matters at 100 TB is partition sizing
  * (`spark.sql.files.maxPartitionBytes`) so one task's payload batch fits
  * executor memory.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType), // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** STUB decode: deterministic 8-dim feature vector from payload bytes
    * (moment statistics over the byte stream — stands in for an image
    * embedding; replace with a codec + model call in production). */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    if (payload == null || payload.isEmpty) return Array.fill(8)(0.0f)
    val n = payload.length
    var sum = 0L; var sumSq = 0L; var min = 255; var max = 0
    var i = 0
    while (i < n) {
      val b = payload(i) & 0xff
      sum += b; sumSq += b.toLong * b
      if (b < min) min = b
      if (b > max) max = b
      i += 1
    }
    val mean = sum.toDouble / n
    val variance = sumSq.toDouble / n - mean * mean
    Array(n.toFloat, mean.toFloat, variance.toFloat, min.toFloat, max.toFloat,
      (payload(0) & 0xff).toFloat, (payload(n / 2) & 0xff).toFloat,
      (payload(n - 1) & 0xff).toFloat)
  }

  /** STUB resize: nearest-neighbor downsample of a (width × height) byte
    * grid to (outW × outH) — the image-resize access pattern (strided
    * gather) over raw bytes; a real deployment swaps this for a codec's
    * scaler. Pads with zeros when the payload is smaller than the claimed
    * grid (the contract a corrupt-tolerant pipeline needs). */
  def resizeStub(payload: Array[Byte], width: Int, height: Int,
      outW: Int, outH: Int): Array[Byte] = {
    val out = new Array[Byte](outW * outH)
    if (payload == null || payload.isEmpty || width <= 0 || height <= 0) return out
    var y = 0
    while (y < outH) {
      val srcY = y * height / outH
      var x = 0
      while (x < outW) {
        val srcX = x * width / outW
        val idx = srcY * width + srcX
        out(y * outW + x) = if (idx < payload.length) payload(idx) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  /** Append `thumb: binary` (outW × outH nearest-neighbor thumbnail) using
    * the meta struct's dimensions — same partition-parallel plumbing as
    * [[withFeatures]]. */
  def withThumbnail(df: DataFrame, payloadCol: String, outW: Int, outH: Int): DataFrame = {
    val outSchema = df.schema.add("thumb", BinaryType)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val metaIdx = df.schema.fieldIndex("meta")
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val meta = r.getStruct(metaIdx)
        val thumb = resizeStub(r.getAs[Array[Byte]](payloadIdx),
          meta.getInt(0), meta.getInt(1), outW, outH)
        Row.fromSeq(r.toSeq :+ thumb)
      }
    }
  }

  /** Fixed-stride frame sampling (the video-keyframe access pattern):
    * `frames` byte slices of `frameSize` at even offsets. */
  def sampleFrames(payload: Array[Byte], frames: Int, frameSize: Int): Array[Array[Byte]] = {
    if (payload == null || payload.isEmpty) return Array.empty
    val stride = math.max(1, payload.length / frames)
    (0 until frames).iterator
      .map(i => i * stride)
      .takeWhile(_ < payload.length)
      .map(off => payload.slice(off, math.min(off + frameSize, payload.length)))
      .toArray
  }

  /** Append `features: array<float>` by running the (stubbed) decoder
    * partition-parallel. Input must contain a binary `payloadCol`. */
  def withFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = df.schema.add("features", ArrayType(FloatType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // one-time per-partition setup would go here (codec init, model load)
      rows.map { r =>
        val feats = decodeStub(r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }
  }

  /** Demo source: wrap the documents table as media rows (utf-8 payloads). */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): DataFrame =
    graft.Graft.table(spark, sfDir, "documents")
      .select(
        col("doc_id").as("media_id"),
        lit("image").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(lit(64).as("width"), lit(64).as("height"),
          lit(0L).as("duration_ms")).as("meta"))
}
