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

  /** Frame-sampling plan for video/audio payloads: offsets (ms) of `fps`
    * frames over the recorded duration — the sampling schedule is real
    * engine work (the per-offset decode is the stub). */
  def frameOffsets(df: DataFrame, everyMs: Long): DataFrame =
    df.withColumn("frame_offsets_ms",
      when(col("meta.duration_ms") <= 0, array().cast("array<bigint>"))
        .otherwise(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs))))
}
