package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata structs, plus batched decode / feature-extract /
  * resize / frame-sample operators.
  *
  * The decode kernels are STUBS (deterministic fakes derived from the raw
  * bytes — this container has no image/audio codecs); everything around
  * them is real and tested: the schema contract, the `mapPartitions`
  * batching shape (decoder state initialized once per partition, rows
  * streamed through it — the Scala analogue of `mapInPandas` batch
  * processing), and the partitioning posture (media blobs never shuffle
  * unless the caller repartitions; derived features are small columns).
  */
object Multimodal {

  /** Canonical media metadata struct carried beside the binary payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("n_bytes", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType),  // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", mediaMetaType)))

  /** Wrap a text column as a synthetic binary media table (test fixture:
    * the container ships no real media, so documents' bytes stand in).
    */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String,
      modality: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        lit("raw").as("format"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
        octet_length(col(textCol)).cast("long").as("n_bytes")).as("meta"))

  /** STUB image decode: a real implementation would parse the codec header;
    * the deterministic fake derives (width, height) from a byte hash so the
    * plumbing is testable. Marked ??? semantics: do NOT ship.
    */
  private def stubDecodeDims(bytes: Array[Byte]): (Int, Int) = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < math.min(bytes.length, 64)) {
      // unsigned byte: FNV-1a's standard octet semantics (and engine-
      // portable — a signed xor would sign-extend bytes >= 0x80)
      h ^= (bytes(i) & 0xFF); h *= 0x100000001b3L; i += 1
    }
    (64 + (h & 0x3f).toInt * 16, 64 + ((h >>> 6) & 0x3f).toInt * 16)
  }

  /** STUB feature extraction: 8 floats from a rolling byte hash (a real
    * kernel would run a vision/audio model over the decoded frame batch).
    */
  private def stubFeatures(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i); h *= 0x100000001b3L
      out(i % 8) = ((h >>> 32).toInt.toFloat / Int.MaxValue)
      i += 1
    }
    out
  }

  /** Decode + feature-extract, batched per partition. The decoder is
    * "opened" once per partition (amortized, like a model handle) and each
    * row flows through it — the batch shape a real codec/model needs.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("width_px", IntegerType),
      StructField("height_px", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      // per-partition decoder init happens HERE (once, not per row)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val (w, h) =
          if (bytes == null) (0, 0) else stubDecodeDims(bytes)
        val feats =
          if (bytes == null) Array.empty[Float] else stubFeatures(bytes)
        Row.fromSeq(r.toSeq ++ Seq(w, h, feats.toSeq))
      }
    }(enc)
  }

  /** STUB resize: records the target dims in meta; a real kernel would
    * re-encode the payload. Keeps the schema contract honest.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(
        col("meta.format"),
        lit(w).as("width"), lit(h).as("height"),
        col("meta.duration_ms"), col("meta.n_bytes")))

  /** STUB frame sampling for video rows: emits `n` (media_id, frame_idx,
    * frame) rows per video by slicing the payload — the explode shape and
    * output schema are real, the slicing is the fake decode.
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    media.filter(col("modality") === "video")
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), lit(n - 1)), i =>
          substring(col("content"),
            (i * greatest(octet_length(col("content")) / n, lit(1))) + 1,
            lit(32)))).as(Seq("frame_idx", "frame")))
}
