package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar embedding quantization — the storage/bandwidth half of ANN at
  * 100 TB (the codebook half is [[Pq]]): int8 codes cut an embedding
  * column 4× against float32, which is usually the difference between an
  * index that fits executor memory and one that spills. Everything here
  * is per-row array arithmetic: one codegen scan, zero shuffles, and the
  * whole transform restates as SQL list operations.
  */
object Quantize {

  /** Symmetric per-vector int8 quantization: `scale = max|x| / 127`,
    * `codes = round(x / scale)` (integer-valued, in [-127, 127]), plus the
    * reconstruction-error report (`max_abs_err = max|code·scale − x|`,
    * bounded by scale/2). Zero vectors quantize to all-zero codes with
    * zero error. Codes are emitted as integer-valued doubles so the exact
    * values hash-compare across engines; pack to `tinyint` at the storage
    * boundary. */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.select(col(idCol), v.as("__v"))
      .withColumn("__s", array_max(transform(col("__v"), x => abs(x))) / lit(127.0))
      .withColumn("codes",
        when(col("__s") === 0, transform(col("__v"), _ => lit(0.0)))
          .otherwise(transform(col("__v"), x => round(x / col("__s"), 0))))
      .withColumn("max_abs_err",
        when(col("__s") === 0, lit(0.0))
          .otherwise(array_max(zip_with(col("codes"), col("__v"),
            (c, x) => abs(c * col("__s") - x)))))
      .select(col(idCol),
        size(col("__v")).cast("bigint").as("n_dims"),
        round(col("__s"), 6).as("scale"),
        col("codes"),
        round(col("max_abs_err"), 6).as("max_abs_err"))
  }
}
