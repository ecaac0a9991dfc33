package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travels as an opaque `binary` column plus a typed
  * metadata struct; decode / feature-extract run as partition-parallel
  * batch transforms.
  *
  * The IMAGE path is real: encode / decode / stat / resize run on the
  * JDK's built-in `javax.imageio` codecs (PNG, BMP, GIF, JPEG — no
  * external libraries), partition-parallel in the same batch shape as
  * [[decodeBatched]]. Audio/video codecs don't ship in the JVM, so their
  * decode remains the deterministic hash fallback (`stubDecodeFeatures` /
  * `stubBatchCodec`) behind the same pluggable batch-codec signature —
  * swapping in a JNI/ONNX decoder changes one function.
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

  /** ??? STUB ??? — deterministic fake decode+feature-extract: `dim`
    * pseudo-features derived by hashing (bytes, i). Replace with a real
    * decoder (ONNX / JNI image lib) keeping the same signature: the
    * partition-parallel `mapPartitions`-style shape, batch size, and output
    * schema are what matter for the 100 TB plumbing. */
  def stubDecodeFeatures(df: DataFrame, dim: Int = 8): DataFrame = {
    val feats = transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(col("data"), i), lit(1000L)).cast("double") / 500.0) - 1.0)
    df.withColumn("features", feats)
  }

  /** Batched partition-parallel decode — the Scala shape of a
    * `mapInPandas` media pipeline: each task pulls rows, groups them into
    * decode batches (bounding peak memory to batchSize payloads), hands
    * the batch to the codec, and emits (media_id, features) rows. The
    * codec callback is the ONLY stub; the iterator/batch/schema plumbing
    * is exactly what a JNI/ONNX decoder plugs into.
    *
    * @param decode batch codec: N payloads in, N fixed-dim feature vectors
    *               out (defaults to the deterministic hash stub)
    */
  def decodeBatched(df: DataFrame, dim: Int = 8, batchSize: Int = 64,
      decode: Seq[Array[Byte]] => Seq[Array[Float]] = null): DataFrame = {
    val codec: Seq[Array[Byte]] => Seq[Array[Float]] =
      if (decode != null) decode else stubBatchCodec(dim)
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

  /** ??? STUB ??? — JVM-side deterministic batch codec (FNV-1a over bytes,
    * per-feature remix); replace with a real image/audio decoder keeping
    * the same Seq-in/Seq-out batch signature. */
  def stubBatchCodec(dim: Int)(batch: Seq[Array[Byte]]): Seq[Array[Float]] =
    batch.map { bytes =>
      var h = 0xcbf29ce484222325L
      bytes.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      Array.tabulate(dim) { i =>
        val z = (h ^ (i * 0x9e3779b97f4a7c15L))
        (((z % 1000L + 1000L) % 1000L).toFloat / 500.0f) - 1.0f
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
