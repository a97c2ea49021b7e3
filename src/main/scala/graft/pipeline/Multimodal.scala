package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata structs, plus batched decode / feature-extract /
  * resize / frame-sample operators.
  *
  * The IMAGE path is real end to end: `syntheticMedia` renders genuine PNG
  * payloads (JDK `javax.imageio`, zero extra dependencies), `decodeFeatures`
  * decodes them back (`ImageIO.read`) reporting true pixel dimensions and
  * pixel-derived band features, and `resize` rescales + re-encodes the
  * payload through `Graphics2D`. The AUDIO path is equally real via
  * `javax.sound.sampled`: rendered 16-bit PCM WAV payloads, header-parsing
  * decode with true frame counts and PCM-derived amplitude features. The
  * VIDEO path is real for MJPEG-style streams (the one video format the
  * JDK CAN decode, because its frames are plain JPEGs): `syntheticMedia`
  * renders concatenated baseline-JPEG frames, and `sampleFrames` splits
  * on real JPEG SOI/EOI markers (valid because baseline JPEG byte-stuffs
  * `FF` inside entropy-coded data, so marker pairs cannot occur mid-scan)
  * and decodes each sampled frame through `ImageIO` — true per-frame
  * dimensions and counts, not slicing arithmetic. Container formats
  * needing an external codec (H.264 etc.) stay out of scope. The
  * `mapPartitions` batching shape (decoder state initialized once per
  * partition, rows streamed through it) and the partitioning posture
  * (media blobs never shuffle unless the caller repartitions) are the
  * same for all modalities.
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

  private def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      // unsigned octet semantics (a signed xor would sign-extend >= 0x80)
      h ^= (bytes(i) & 0xFF); h *= 0x100000001b3L; i += 1
    }
    h
  }

  /** Rendered-image dimensions are a pure function of the source byte
    * length so an external oracle can predict them without decoding:
    * width = 16 + n % 16, height = 8 * (1 + n % 4).
    */
  private[pipeline] def dimsFor(nBytes: Int): (Int, Int) =
    (16 + nBytes % 16, 8 * (1 + nBytes % 4))

  /** Second seed for the right-half cells: an avalanche mix of the first
    * (murmur finalizer), so the 16 cell intensities carry 16 independent
    * bytes of content hash.
    */
  @inline private def mix64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33; h *= 0xC4CEB9FE1A85EC53L
    h ^ (h >>> 33)
  }

  /** Render a REAL grayscale PNG: 8 horizontal bands x 2 halves = 16
    * constant-intensity cells, each taking one byte of (FNV-1a hash,
    * mixed hash) of the source. Identical sources produce byte-identical
    * PNGs; the cell structure makes the 16 decoded features exactly
    * recoverable. 16 dims (not 8) so feature cosines discriminate:
    * at 8 dims, random centered features collide above cosine 0.99 with
    * probability ~8e-6/pair — real 35-vs-20 spurious pairs at sf0.1 —
    * while at 16 dims the odds are ~1e-12/pair.
    */
  private[pipeline] def renderPng(src: Array[Byte]): Array[Byte] = {
    val (w, h) = dimsFor(src.length)
    val seed1 = fnv64(src)
    val seed2 = mix64(seed1)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    val half = w / 2
    var y = 0
    while (y < h) {
      val b = y * 8 / h
      val v1 = ((seed1 >>> (8 * b)) & 0xFF).toInt
      val v2 = ((seed2 >>> (8 * b)) & 0xFF).toInt
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, if (x < half) v1 else v2); x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.setUseCache(false) // in-memory streams; no temp-file cache
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Expected cell intensities for a payload rendered by [[renderPng]]
    * (8 left-half bands then 8 right-half bands) — exposed so tests can
    * pin decode output against the render contract.
    */
  private[pipeline] def expectedBands(src: Array[Byte]): Array[Int] = {
    val seed1 = fnv64(src)
    val seed2 = mix64(seed1)
    Array.tabulate(16)(i =>
      (((if (i < 8) seed1 else seed2) >>> (8 * (i % 8))) & 0xFF).toInt)
  }

  /** Rendered-audio frame count is a pure function of the source byte
    * length (8 frames/ms at 8 kHz keeps duration_ms exact):
    * frames = 8 * (100 + n % 100), i.e. 100-199 ms of PCM.
    */
  private[pipeline] def framesFor(nBytes: Int): Int = 8 * (100 + nBytes % 100)

  private val wavFormat = new javax.sound.sampled.AudioFormat(
    8000f, 16, 1, true, false) // 8 kHz, 16-bit, mono, signed, little-endian

  /** Render a REAL mono 16-bit PCM WAV (`javax.sound.sampled`, zero extra
    * dependencies): sample i takes its amplitude from byte (i mod 8) of
    * the FNV-1a hash of the source. Identical sources produce
    * byte-identical WAVs; the header carries true frame count and rate.
    */
  private[pipeline] def renderWav(src: Array[Byte]): Array[Byte] = {
    val nFrames = framesFor(src.length)
    val seed = fnv64(src)
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = ((((seed >>> ((i % 8) * 8)) & 0xFF) - 128) * 256).toInt.toShort
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), wavFormat, nFrames.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Rendered-video frame count is a pure function of the source byte
    * length: 3-6 JPEG frames per stream.
    */
  private[pipeline] def videoFramesFor(nBytes: Int): Int = 3 + nBytes % 4

  /** Frame `i`'s dimensions in a rendered MJPEG — a pure function of
    * (source length, frame index) so an external oracle can predict what
    * a real decode must report.
    */
  private[pipeline] def frameDimsFor(nBytes: Int, i: Int): (Int, Int) =
    (16 + (nBytes + 5 * i) % 16, 8 * (1 + (nBytes + i) % 4))

  /** Render a REAL MJPEG-style stream: `videoFramesFor` concatenated
    * baseline JPEG frames (`javax.imageio`, zero extra dependencies),
    * frame i a constant-gray image of `frameDimsFor(n, i)` with intensity
    * from the mixed content hash. Identical sources render byte-identical
    * streams.
    */
  private[pipeline] def renderMjpeg(src: Array[Byte]): Array[Byte] = {
    val nf = videoFramesFor(src.length)
    val seed = fnv64(src)
    val bos = new ByteArrayOutputStream()
    ImageIO.setUseCache(false)
    var i = 0
    while (i < nf) {
      val (w, h) = frameDimsFor(src.length, i)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val v = ((mix64(seed + i) >>> 24) & 0xFF).toInt
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, v); x += 1 }
        y += 1
      }
      ImageIO.write(img, "jpg", bos)
      i += 1
    }
    bos.toByteArray
  }

  /** Split an MJPEG byte stream into its JPEG frames by scanning for the
    * EOI marker (FF D9) — exact for baseline JPEG, whose entropy-coded
    * segments byte-stuff every FF as FF 00, so a marker pair can only be
    * a real marker. Segments not starting with SOI (FF D8) are dropped.
    */
  private[pipeline] def splitJpegFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var start = 0
    var i = 0
    while (i + 1 < bytes.length) {
      if ((bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == 0xD9) {
        val seg = java.util.Arrays.copyOfRange(bytes, start, i + 2)
        if (seg.length >= 2 && (seg(0) & 0xFF) == 0xFF &&
            (seg(1) & 0xFF) == 0xD8) frames += seg
        start = i + 2
        i += 2
      } else i += 1
    }
    frames.toSeq
  }

  /** Wrap a text column as a binary media table (test fixture: the
    * container ships no real media files, so each document is RENDERED
    * into a genuine payload — PNG for images, PCM WAV for audio, an
    * MJPEG-style JPEG-frame stream for video).
    */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String,
      modality: String = "image"): DataFrame = {
    val src = df.select(col(idCol).cast("long"), col(textCol).cast("string"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema)
    src.mapPartitions { rows =>
      // encoder/codec init happens HERE (once per partition, not per row)
      rows.map { r =>
        val id = r.getLong(0)
        val text = if (r.isNullAt(1)) "" else r.getString(1)
        val bytes = text.getBytes(StandardCharsets.UTF_8)
        modality match {
          case "image" =>
            val png = renderPng(bytes)
            val (w, h) = dimsFor(bytes.length)
            Row(id, modality, png,
              Row("png", w, h, null, png.length.toLong))
          case "audio" =>
            val wav = renderWav(bytes)
            val durationMs = framesFor(bytes.length).toLong / 8L
            Row(id, modality, wav,
              Row("wav", null, null, durationMs, wav.length.toLong))
          case "video" =>
            val mjpeg = renderMjpeg(bytes)
            // 10 fps: 100 ms per frame keeps duration_ms exact
            val durationMs = videoFramesFor(bytes.length).toLong * 100L
            Row(id, modality, mjpeg,
              Row("mjpeg", null, null, durationMs, mjpeg.length.toLong))
          case _ =>
            Row(id, modality, bytes,
              Row("raw", null, null, null, bytes.length.toLong))
        }
      }
    }(enc)
  }

  /** REAL audio decode (`AudioSystem.getAudioInputStream` parses the
    * actual WAV header): true frame count, sample rate, exact duration,
    * and a mean-absolute-amplitude feature from the decoded PCM samples.
    * Non-decodable payloads yield (-1, -1, -1) — same per-partition
    * batch shape as [[decodeFeatures]].
    */
  def decodeAudio(media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("n_frames", LongType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType),
      StructField("mean_abs_amp", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val decoded =
          if (bytes == null || bytes.isEmpty) None
          else scala.util.Try {
            val ais = javax.sound.sampled.AudioSystem
              .getAudioInputStream(new ByteArrayInputStream(bytes))
            val fmt = ais.getFormat
            val frames = ais.getFrameLength
            val pcm = ais.readAllBytes()
            var sum = 0L
            var i = 0
            while (i + 1 < pcm.length) {
              // 16-bit little-endian signed samples
              val s = ((pcm(i + 1) << 8) | (pcm(i) & 0xFF)).toShort
              sum += math.abs(s.toInt); i += 2
            }
            val meanAbs = if (frames > 0) sum / frames else 0L
            (frames, fmt.getSampleRate.toInt,
              frames * 1000L / fmt.getSampleRate.toLong, meanAbs)
          }.toOption
        decoded match {
          // Seq[Any]: a plain Seq would widen the Int sample rate to Long
          // (weak conformance) and break the encoder's INT field
          case Some((f, sr, d, m)) =>
            Row.fromSeq(r.toSeq ++ Seq[Any](f, sr, d, m))
          case None => Row.fromSeq(r.toSeq ++ Seq[Any](-1L, -1, -1L, -1L))
        }
      }
    }(enc)
  }

  /** Integer-factor audio DOWNSAMPLE (decimation): decode the real WAV,
    * keep every `factor`-th 16-bit frame, re-encode a genuine WAV at
    * rate/factor, and report the RE-DECODED header truth (a broken
    * resampler or encoder cannot hide behind arithmetic). Duration is
    * preserved by construction (frames and rate shrink together) — the
    * oracle checks exactly that. mapPartitions-batched like every media
    * kernel; blobs never shuffle. Non-decodable/non-PCM payloads yield
    * the -1 sentinel row, like [[decodeAudio]].
    */
  def resampleAudio(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("rs_content", BinaryType),
      StructField("rs_frames", LongType),
      StructField("rs_rate", IntegerType),
      StructField("rs_duration_ms", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val out =
          if (bytes == null || bytes.isEmpty) None
          else scala.util.Try {
            val ais = javax.sound.sampled.AudioSystem
              .getAudioInputStream(new ByteArrayInputStream(bytes))
            val fmt = ais.getFormat
            require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
              "resample supports 16-bit mono PCM")
            val pcm = ais.readAllBytes()
            val nIn = pcm.length / 2
            val nOut = (nIn + factor - 1) / factor
            val dec = new Array[Byte](nOut * 2)
            var i = 0
            while (i < nOut) {
              dec(2 * i) = pcm(2 * i * factor)
              dec(2 * i + 1) = pcm(2 * i * factor + 1)
              i += 1
            }
            val newRate = fmt.getSampleRate / factor
            val newFmt = new javax.sound.sampled.AudioFormat(
              newRate, 16, 1, true, false)
            val bos = new ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(
              new javax.sound.sampled.AudioInputStream(
                new ByteArrayInputStream(dec), newFmt, nOut.toLong),
              javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
            val wav = bos.toByteArray
            // RE-DECODE: report what the new file actually says
            val back = javax.sound.sampled.AudioSystem
              .getAudioInputStream(new ByteArrayInputStream(wav))
            val f = back.getFrameLength
            val sr = back.getFormat.getSampleRate.toInt
            (wav, f, sr, f * 1000L / sr)
          }.toOption
        out match {
          case Some((wav, f, sr, d)) =>
            Row.fromSeq(r.toSeq ++ Seq[Any](wav, f, sr, d))
          case None =>
            Row.fromSeq(r.toSeq ++ Seq[Any](null, -1L, -1, -1L))
        }
      }
    }(enc)
  }

  /** Decode + feature-extract, batched per partition. `ImageIO.read` parses
    * the actual codec header: `width_px`/`height_px` are TRUE pixel
    * dimensions, and the 16 features are per-cell (8 bands x 2 halves)
    * mean intensities centered to [-1, 1). Non-decodable payloads yield
    * (0, 0, empty) — the decoder is "opened" once per partition
    * (amortized, like a model handle).
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("width_px", IntegerType),
      StructField("height_px", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      ImageIO.setUseCache(false) // per-partition decoder init
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val img =
          if (bytes == null || bytes.isEmpty) null
          else ImageIO.read(new ByteArrayInputStream(bytes))
        if (img == null)
          Row.fromSeq(r.toSeq ++ Seq(0, 0, Seq.empty[Float]))
        else {
          val w = img.getWidth; val h = img.getHeight
          val raster = img.getRaster
          val half = w / 2
          val sums = new Array[Long](16)
          val counts = new Array[Long](16)
          var y = 0
          while (y < h) {
            val band = y * 8 / h
            var x = 0
            while (x < w) {
              val cell = band + (if (x < half) 0 else 8)
              sums(cell) += raster.getSample(x, y, 0)
              counts(cell) += 1
              x += 1
            }
            y += 1
          }
          val feats = Array.tabulate(16) { c =>
            if (counts(c) == 0) 0f
            else ((sums(c).toDouble / counts(c) - 128.0) / 128.0).toFloat
          }
          Row.fromSeq(r.toSeq ++ Seq(w, h, feats.toSeq))
        }
      }
    }(enc)
  }

  /** REAL resize: decode the payload, rescale through `Graphics2D`,
    * re-encode as PNG, and refresh both content and meta. Non-decodable
    * payloads pass through with only the meta target recorded.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(media.schema)
    val contentIdx = media.schema.fieldIndex("content")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val img =
          if (bytes == null || bytes.isEmpty) null
          else ImageIO.read(new ByteArrayInputStream(bytes))
        val meta = r.getStruct(metaIdx)
        if (img == null)
          Row.fromSeq(r.toSeq.updated(metaIdx,
            Row(meta.get(0), w, h, meta.get(3), meta.get(4))))
        else {
          val imgType =
            if (img.getType == BufferedImage.TYPE_CUSTOM)
              BufferedImage.TYPE_INT_RGB
            else img.getType
          val out = new BufferedImage(w, h, imgType)
          val g = out.createGraphics()
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val bos = new ByteArrayOutputStream()
          ImageIO.write(out, "png", bos)
          val png = bos.toByteArray
          Row.fromSeq(r.toSeq
            .updated(contentIdx, png)
            .updated(metaIdx,
              Row("png", w, h, meta.get(3), png.length.toLong)))
        }
      }
    }(enc)
  }

  /** REAL frame sampling for video rows: split the MJPEG payload on JPEG
    * markers, uniformly sample up to `n` frames (all of them when the
    * stream has <= n; else frame indices floor(k*n_frames/n), k < n —
    * deterministic), and DECODE each sampled frame through `ImageIO`:
    * `width_px`/`height_px` are true decoded dimensions, `n_frames` the
    * true frame count, `frame` the exact JPEG payload for downstream
    * feature extraction. Rows whose payload contains no decodable JPEG
    * frames emit nothing; a corrupt individual frame reports (0, 0).
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    require(n >= 1, "need n >= 1 frames")
    val vids = media.filter(col("modality") === "video")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("width_px", IntegerType),
      StructField("height_px", IntegerType),
      StructField("frame", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val idIdx = vids.schema.fieldIndex("media_id")
    val contentIdx = vids.schema.fieldIndex("content")
    vids.mapPartitions { rows =>
      ImageIO.setUseCache(false) // per-partition decoder init
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val frames =
          if (bytes == null || bytes.isEmpty) Seq.empty
          else splitJpegFrames(bytes)
        val nf = frames.length
        val idxs =
          if (nf <= n) 0 until nf
          else (0 until n).map(k => (k.toLong * nf / n).toInt)
        idxs.map { fi =>
          val seg = frames(fi)
          val img = ImageIO.read(new ByteArrayInputStream(seg))
          if (img == null)
            Row(r.getLong(idIdx), fi, nf, 0, 0, seg)
          else
            Row(r.getLong(idIdx), fi, nf, img.getWidth, img.getHeight, seg)
        }
      }
    }(enc)
  }
}
