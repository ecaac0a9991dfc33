package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive an sf1-scale dataset from the driver's sf0.1 tables for the
  * BENCH_NOTES time-vs-sf scaling table (`runMain graft.tools.ScaleUp
  * [mult] [outDir]`). The driver only ships sf ≤ 0.1; this unions `mult`
  * id-shifted copies of each fact table so heavies can be timed at 10×
  * without inventing a new generator.
  *
  * Copy discipline (so the WORKLOAD scales, not just the bytes):
  *  - dimension tables (region, nation) are NOT duplicated — facts in every
  *    copy reference the same dims, exactly like a bigger TPC-H SF;
  *  - fact keys (`*key`, `*_id`) shift by copy × 10^9, so joins stay 1:N
  *    with the same fan-out per copy and zero cross-copy matches;
  *  - document tokens get a per-copy suffix (token → token·cN), making
  *    cross-copy shingle sets DISJOINT: each copy carries sf0.1's exact
  *    near-dup structure and no accidental 45×-per-doc cross-copy pairs —
  *    dedup output scales linearly in mult, as a real 10× corpus would;
  *  - embeddings rotate dimensions by copy (norm- and within-copy-cosine-
  *    preserving), so ANN workloads scale with near-orthogonal cross-copy
  *    vectors instead of 10 exact clones of every point.
  */
object ScaleUp {
  private val Offset = 1000000000L

  def main(args: Array[String]): Unit = {
    val mult = if (args.length > 0) args(0).toInt else 10
    val outDir = if (args.length > 1) args(1) else "/tmp/graft-sf1"
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // write timestamps as the source's physical form (timestamp[us]),
      // not Spark's INT96 default — scaled data should differ from the
      // real dataset ONLY in row count
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dims = Set("region", "nation")
    val shiftCols = Set(
      "l_orderkey", "l_partkey", "l_suppkey", "o_orderkey", "o_custkey",
      "c_custkey", "s_suppkey", "p_partkey", "event_id", "user_id",
      "doc_id", "vec_id")

    def copies(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until mult).map(i => f(df, i)).reduce(_ union _)

    def shifted(df: DataFrame, i: Int): DataFrame =
      df.columns.foldLeft(df) { (d, c) =>
        if (shiftCols(c)) {
          // preserve the SOURCE physical type: a bare `+ lit(Long)` widens
          // a 32-bit key to bigint (and union coercion then widens copy 0
          // too), so the scaled dataset's schema would diverge from the
          // real one and schema-sensitive paths (the a5 physical-kind
          // fixture, analyzer heuristics) would misread it. Every current
          // key is int64, making the cast a no-op; a narrower key cannot
          // hold copy × 10^9 and must fail loud here, not overflow.
          val srcType = df.schema(c).dataType
          require(srcType == org.apache.spark.sql.types.LongType,
            s"shift column $c is ${srcType.simpleString}: the per-copy " +
              s"$Offset shift assumes a 64-bit key — shrink the offset " +
              "or widen the source before scaling")
          d.withColumn(c, (col(c) + lit(i * Offset)).cast(srcType))
        } else d
      }

    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      val df = spark.read.parquet(s"$srcDir/$t.parquet")
      val out = t match {
        case _ if dims(t) => df
        case "documents" =>
          copies(df, (d, i) => shifted(d, i).withColumn("text",
            when(col("text").isNull, col("text")).otherwise(
              array_join(transform(split(col("text"), "\\s+"),
                tok => concat(tok, lit(s"·c$i"))), " "))))
        case "embeddings" =>
          copies(df, (d, i) => shifted(d, i).withColumn("embedding",
            concat(slice(col("embedding"), lit(i + 1), size(col("embedding")) - i),
              slice(col("embedding"), lit(1), lit(i)))))
        case _ => copies(df, (d, i) => shifted(d, i))
      }
      // Timestamps: written as int64 micros (outputTimestampType above),
      // matching the source's physical form. They stay LTZ on the Spark
      // side: the source files are pyarrow-written NAIVE micros that the
      // engine sessions read as LTZ via inferTimestampNTZ=false — but
      // that conf only governs INFERENCE for files without Spark schema
      // metadata. A Spark-written NTZ column carries explicit NTZ
      // metadata that overrides the conf, so casting to NTZ here would
      // make every engine session read the scaled data as NTZ and break
      // LTZ-typed paths (measured: 4 queries failed on unix_micros).
      // Net: pyarrow sees an isAdjustedToUTC annotation the source lacks;
      // every engine session sees the IDENTICAL Spark schema either way.
      out.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scaleup] $t x$mult -> $outDir")
    }
    spark.stop()
  }
}
