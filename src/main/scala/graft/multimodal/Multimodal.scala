package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travels as an opaque `binary` column plus a typed
  * metadata struct; decode / feature-extract run as partition-parallel
  * batch transforms.
  *
  * The IMAGE path is real end-to-end: encode / decode / stat / resize /
  * batched featurize run on the JDK's built-in `javax.imageio` codecs
  * (PNG, BMP, GIF, JPEG — no external libraries), and [[decodeBatched]]
  * routes through [[imageBatchCodec]] by default. Audio/video codecs
  * don't ship in the JVM; their payloads plug a JNI/ONNX decoder into the
  * same `Seq`-in/`Seq`-out batch-codec signature (the iterator/batch/
  * schema plumbing is codec-agnostic), with [[stubResize]] /
  * [[frameOffsets]] covering the metadata-side operations until then.
  */
object Multimodal {

  /** Metadata struct carried beside every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  def mediaSchema(idType: DataType = LongType): StructType = StructType(Seq(
    StructField("media_id", idType),
    StructField("data", BinaryType),
    StructField("meta", mediaMetaType)))

  /** Wrap a text/binary column into the media schema (used by tests and by
    * ingest adapters that already carry raw bytes). */
  def asMedia(df: DataFrame, idCol: String, binCol: String, format: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(binCol).cast("binary").as("data"),
      struct(lit(format).as("format"), lit(0).as("width"), lit(0).as("height"),
        lit(0L).as("duration_ms")).as("meta"))

  /** Byte length + content hash — the cheap always-real metadata pass
    * (pure expressions, no decode). */
  def byteStats(df: DataFrame): DataFrame =
    df.withColumn("n_bytes", length(col("data")).cast("long"))
      .withColumn("content_hash", xxhash64(col("data")))

  /** Batched partition-parallel decode — the Scala shape of a
    * `mapInPandas` media pipeline: each task pulls rows, groups them into
    * decode batches (bounding peak memory to batchSize payloads), hands
    * the batch to the codec, and emits (media_id, features) rows. The
    * default codec is the REAL [[imageBatchCodec]] (javax.imageio);
    * audio/video decoders plug into the same `Seq`-in/`Seq`-out
    * signature without touching the iterator/batch/schema plumbing.
    *
    * @param decode batch codec: N payloads in, N fixed-dim feature vectors
    *               out (defaults to [[imageBatchCodec]])
    */
  def decodeBatched(df: DataFrame, dim: Int = 8, batchSize: Int = 64,
      decode: Seq[Array[Byte]] => Seq[Array[Float]] = null): DataFrame = {
    val codec: Seq[Array[Byte]] => Seq[Array[Float]] =
      if (decode != null) decode else imageBatchCodec(dim)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          val feats = codec(batch.map(_._2))
          require(feats.length == batch.length,
            s"codec returned ${feats.length} results for ${batch.length} inputs")
          batch.map(_._1).zip(feats)
        }
      }
      .toDF("media_id", "features")
  }

  /** REAL default batch codec for [[decodeBatched]]: every payload through
    * `javax.imageio.ImageIO.read`, features =
    * `[width, height, mean_r, mean_g, mean_b]` zero-padded to `dim`
    * (`dim >= 5`). Channel means are computed from exact integer pixel
    * sums with ONE correctly-rounded double division and ONE rounding to
    * float, so for lossless inputs (PNG/BMP) the values are closed-form
    * reproducible — what lets an oracle pin this path exactly.
    * Undecodable payloads fail loudly rather than silently skewing corpus
    * features. */
  def imageBatchCodec(dim: Int)(batch: Seq[Array[Byte]]): Seq[Array[Float]] = {
    require(dim >= 5, s"imageBatchCodec needs dim >= 5 for [w,h,r,g,b], got $dim")
    batch.map { bytes =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "payload is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var i = 0
      while (i < px.length) {
        sr += (px(i) >> 16) & 0xff; sg += (px(i) >> 8) & 0xff; sb += px(i) & 0xff
        i += 1
      }
      val n = w.toLong * h
      val out = new Array[Float](dim)
      out(0) = w.toFloat; out(1) = h.toFloat
      out(2) = (sr.toDouble / n).toFloat
      out(3) = (sg.toDouble / n).toFloat
      out(4) = (sb.toDouble / n).toFloat
      out
    }
  }

  // ---------------------------------------------------------------- images
  // Real codecs via the JDK's javax.imageio — available in every JVM, no
  // external dependency, headless-safe.

  /** Encode a horizontal two-band RGB image (rows [0, h/2) in color1, the
    * rest in color2) to PNG bytes — the deterministic fixture generator for
    * decode tests and oracle queries: PNG is lossless, so the decoded
    * per-channel means are closed-form in (w, h, colors). Runs inside
    * executor-side maps (pure function of its arguments). */
  def encodeTwoBandPng(width: Int, height: Int,
      rgb1: (Int, Int, Int), rgb2: (Int, Int, Int)): Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad dimensions ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val p1 = (rgb1._1 << 16) | (rgb1._2 << 8) | rgb1._3
    val p2 = (rgb2._1 << 16) | (rgb2._2 << 8) | rgb2._3
    var y = 0
    while (y < height) {
      val p = if (y < height / 2) p1 else p2
      var x = 0
      while (x < width) { img.setRGB(x, y, p); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL image decode: each payload through `javax.imageio.ImageIO.read`
    * (PNG/BMP/GIF/JPEG), reporting actual decoded dimensions and exact
    * per-channel pixel means — the geometry/stat pass a curation pipeline
    * runs before filtering or resizing. ImageIO decodes ONE image at a
    * time, so this maps element-wise (at most one decoded pixel buffer
    * live per task — no batch buffering is needed or pretended; batch
    * grouping only matters for codecs with a batch API, [[decodeBatched]]).
    * Undecodable payloads fail loudly with the media id rather than
    * silently skewing corpus stats.
    *
    * @return (media_id, width, height, mean_r, mean_g, mean_b) */
  def decodeImageStats(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("data"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        require(img != null, s"media_id=$id: payload is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var i = 0
        while (i < px.length) {
          sr += (px(i) >> 16) & 0xff; sg += (px(i) >> 8) & 0xff; sb += px(i) & 0xff
          i += 1
        }
        val n = w.toLong * h
        (id, w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
      }
      .toDF("media_id", "width", "height", "mean_r", "mean_g", "mean_b")
  }

  /** 64-bit average hash (aHash) from REAL image decode — the standard
    * perceptual near-dup fingerprint: nearest-neighbor 8×8 downsample
    * (sample pixel `((i·w)/8, (j·h)/8)`, integer floor), integer gray
    * `(r+g+b)/3`, bit `j·8+i` set when `64·gray > Σgray` (strict,
    * integer-exact — which is what lets a lossless fixture's hash be
    * restated in closed form by an oracle). Element-wise decode like
    * [[decodeImageStats]]; undecodable payloads fail loudly with the id.
    *
    * Output: (media_id, ahash). */
  def averageHash(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("data"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        require(img != null, s"media_id=$id: payload is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        val gray = new Array[Long](64)
        var sum = 0L
        var k = 0
        while (k < 64) {
          val p = img.getRGB(((k % 8) * w) / 8, ((k / 8) * h) / 8)
          val g = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
          gray(k) = g; sum += g; k += 1
        }
        var hash = 0L
        k = 0
        while (k < 64) { if (gray(k) * 64L > sum) hash |= (1L << k); k += 1 }
        (id, hash)
      }
      .toDF("media_id", "ahash")
  }

  /** Perceptual image near-dup pairs over [[averageHash]] signatures:
    * pigeonhole banding (`maxDistance + 1` chunks ⇒ FULL recall at the
    * threshold, no tuning) + exact popcount verify — the image-corpus
    * dedup pass, sharing the text SimHash pipeline's banding stage. One
    * decode scan, then an equi-join on (chunk, value): never an image×image
    * cross product. Output: (id1, id2, hamming), id1 < id2. */
  def ahashNearDups(df: DataFrame, maxDistance: Int = 8): DataFrame =
    graft.dedup.Dedup.bandedHammingPairs(
      averageHash(df).withColumnRenamed("ahash", "simhash"),
      "media_id", maxDistance)

  // ---------------------------------------------------------------- audio
  // Real WAV/PCM codec via the JDK's javax.sound.sampled — file parsing
  // only, headless-safe, no audio hardware touched. Compressed codecs
  // (mp3/aac/opus) still don't ship in the JVM; they plug the same
  // element-wise decode seam.

  /** Encode signed 16-bit little-endian mono PCM samples as a WAV payload
    * — the deterministic fixture generator for the audio-decode path
    * (PCM is lossless: decoded samples are bit-identical to the input, so
    * integer sample statistics are closed-form in the generation formula).
    * Runs inside executor-side maps (pure function of its arguments). */
  def encodePcm16Wav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate >= 1 && samples.nonEmpty, "empty audio fixture")
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL audio decode: each payload through the JDK's
    * `javax.sound.sampled` WAV reader, reporting the decoded format and
    * EXACT integer sample statistics (min/max/sum/sum-of-abs over all
    * interleaved 16-bit samples) — the loudness/clipping/silence pass an
    * audio-curation pipeline runs before feature extraction, integer-exact
    * so a lossless fixture's output is closed-form checkable. Element-wise
    * like [[decodeImageStats]]; non-WAV or non-16-bit payloads fail loudly
    * with the media id.
    *
    * @return (media_id, sample_rate, channels, n_samples, s_min, s_max,
    *         s_sum, s_sumabs) */
  def decodeWavStats(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("data"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16,
          s"media_id=$id: expected 16-bit PCM, got ${fmt.getSampleSizeInBits}-bit")
        val data = ais.readAllBytes()
        // fail loudly (with the id) on truncated or empty payloads, like
        // the other decode paths — otherwise a zero-frame WAV would emit
        // Int.MaxValue/MinValue sentinel stats and an odd trailing byte
        // would be silently dropped
        require(data.length >= 2 && data.length % 2 == 0,
          s"media_id=$id: PCM payload must be a non-empty whole number of" +
            s" 16-bit samples, got ${data.length} bytes")
        // ... and a whole number of FRAMES matching the header: for
        // multi-channel PCM a payload ending mid-frame (e.g. 2 of 4
        // stereo-frame bytes) is sample-aligned yet still truncated.
        // AudioInputStream floors each read to whole frames, so the
        // mid-frame tail of a truncated file is silently DISCARDED
        // before it reaches `data` — the observable symptom is fewer
        // bytes than the header's declared frame count, checked here.
        val frameSize = fmt.getFrameSize // 2 * channels for 16-bit PCM
        require(frameSize <= 0 || data.length % frameSize == 0,
          s"media_id=$id: PCM payload must be a whole number of frames, " +
            s"got ${data.length} bytes with frame size $frameSize " +
            s"(${fmt.getChannels} channels)")
        val declared = ais.getFrameLength
        require(declared < 0 || frameSize <= 0 ||
            data.length.toLong == declared * frameSize,
          s"media_id=$id: truncated PCM payload — header declares " +
            s"$declared frames (${declared * frameSize} bytes) but only " +
            s"${data.length} bytes are readable")
        val big = fmt.isBigEndian
        var (sum, sumAbs) = (0L, 0L)
        var (mn, mx) = (Int.MaxValue, Int.MinValue)
        var i = 0
        while (i + 1 < data.length) {
          val v = if (big) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort.toInt
            else ((data(i) & 0xff) | (data(i + 1) << 8)).toShort.toInt
          sum += v; sumAbs += math.abs(v)
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 2
        }
        (id, fmt.getSampleRate.toInt, fmt.getChannels, (data.length / 2).toLong,
          mn, mx, sum, sumAbs)
      }
      .toDF("media_id", "sample_rate", "channels", "n_samples",
        "s_min", "s_max", "s_sum", "s_sumabs")
  }

  /** REAL image resize via JDK `Graphics2D` bilinear scaling + PNG
    * re-encode: data and metadata are rewritten to the target geometry.
    * Executor-side, element-wise like [[decodeImageStats]]. The output
    * format is normalized to PNG regardless of input codec (the usual
    * corpus-prep normalization step). */
  def resizeImages(df: DataFrame, width: Int, height: Int): DataFrame = {
    require(width >= 1 && height >= 1, s"bad target ${width}x$height")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("data"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        require(img != null, s"media_id=$id: payload is not a decodable image")
        val dst = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, width, height, null)
        g.dispose()
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", out)
        (id, out.toByteArray)
      }
      .toDF("media_id", "data")
      .withColumn("meta", struct(
        lit("image/png").as("format"), lit(width).as("width"),
        lit(height).as("height"), lit(0L).as("duration_ms")))
  }

  /** Metadata-only resize used where no decodable payload exists (the
    * audio/video analogue of [[resizeImages]]): updates the metadata struct
    * to the target dimensions and derives a deterministic placeholder
    * payload. For real images use [[resizeImages]]. */
  def stubResize(df: DataFrame, width: Int, height: Int): DataFrame = {
    val fakeBytes = sha2(concat(col("data").cast("string"),
      lit(s"${width}x$height")), 256).cast("binary")
    df.withColumn("data", fakeBytes)
      .withColumn("meta", struct(
        col("meta.format"), lit(width).as("width"), lit(height).as("height"),
        col("meta.duration_ms")))
  }

  /** Frame-sampling plan for video/audio payloads: offsets (ms) of `fps`
    * frames over the recorded duration — the sampling schedule is real
    * engine work (the per-offset decode is the stub). */
  def frameOffsets(df: DataFrame, everyMs: Long): DataFrame =
    df.withColumn("frame_offsets_ms",
      when(col("meta.duration_ms") <= 0, array().cast("array<bigint>"))
        .otherwise(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs))))
}
