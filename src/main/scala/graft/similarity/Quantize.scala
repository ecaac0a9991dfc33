package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** ANN top-k over the int8 codes — the search half of the quantization
    * story: the approximate scan runs entirely on the 4×-smaller code
    * arrays, ranking by CODE-SPACE COSINE (the per-vector scales cancel
    * out of the ratio, and code norms are precomputed once per row — a
    * raw code dot product would rank by magnitude and lose recall the
    * moment norms vary), a per-query `shortlist` survives, and ONLY the
    * shortlist touches the full-precision vectors for an exact cosine
    * re-rank — so reported scores are always true, and the shortlist size
    * is the single recall/cost dial (shortlist ≥ corpus degrades to exact
    * brute force, the oracle anchor; the [[Pq]] ADC device). Queries
    * broadcast; the corpus never shuffles until the shortlist. */
  def int8TopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, shortlist: Int,
      roundDigits: Int = -1): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val q8 = int8(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("codes").as("__qc"),
        sqrt(Similarity.dot(col("codes"), col("codes"))).as("__qn"))
    val c8 = int8(corpus, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("codes").as("__cc"),
        sqrt(Similarity.dot(col("codes"), col("codes"))).as("__cn"))
    // Zero vectors (int8() maps them to all-zero codes) would make the
    // cosine 0/0 = NaN, and Spark ranks NaN above every real score — so a
    // zero query or corpus row would permanently occupy top-k slots with
    // cos = NaN. Drop zero-norm rows from the scan; a zero code norm is
    // equivalent to a zero raw vector, so the exact re-rank below can
    // never see a NaN pair either (the mmrRerank zero-norm device).
    val approx = c8.filter(col("__cn") > 0)
      .crossJoin(broadcast(q8.filter(col("__qn") > 0)))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__a",
        Similarity.dot(col("__qc"), col("__cc")) / (col("__qn") * col("__cn")))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("__a").desc, col("neighbor_id"))
    val cands = approx.withColumn("__ar", row_number().over(wA))
      .filter(col("__ar") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val rawCos = Similarity.cosine(col("__qv"), col("__cv"))
    val exact = cands
      .join(broadcast(qv), "query_id")
      .join(cv, "neighbor_id")
      .withColumn("cos",
        if (roundDigits >= 0) round(rawCos, roundDigits) else rawCos)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    exact.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
  }
}
