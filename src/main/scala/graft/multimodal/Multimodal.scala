package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travels as an opaque `binary` column plus a typed
  * metadata struct; decode / feature-extract run as partition-parallel
  * batch transforms.
  *
  * The actual codec step is STUBBED (this container ships no image/audio
  * libraries): `stubDecodeFeatures` produces a deterministic fake feature
  * vector derived from the bytes. The Spark-side plumbing — schema,
  * partitioning, batch iterator shape — is real and tested; swapping the
  * stub for a JNI/ONNX decoder changes one function.
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

  /** ??? STUB ??? — image resize: updates the metadata struct to the target
    * dimensions and derives a deterministic fake payload of plausible size
    * (payload scales with pixel count). The metadata bookkeeping, payload
    * re-emission, and schema preservation are the real plumbing; swap the
    * byte transform for an actual resampler. */
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
