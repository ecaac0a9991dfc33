package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass Poisson bootstrap (Chamandy et al. 2012, "Estimating
  * uncertainty for massive data streams" — the standard trick for
  * bootstrapping data too large to resample by index): replicate b
  * reweights every row by an independent Poisson(1) draw, so B
  * bootstrap replicates of a mean cost ONE scan — rows explode into
  * B (replicate, weighted-value) pairs that map-side partial
  * aggregation folds straight into B groups; nothing data-sized is
  * resampled, shuffled, or stored.
  *
  * Every draw is the portable md5 16-bit coin of (key, seed,
  * replicate) pushed through a PINNED cumulative-Poisson(1) CASE
  * ladder (literals to 10 dp), so weights — and therefore every
  * replicate mean — are engine-reproducible.
  */
object Bootstrap {

  private val cumPoisson1 = Seq(
    0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431,
    0.9963401532, 0.9994058152, 0.9999167589, 0.9999897508)

  /** The ladder inversion, branchless: the cumulative thresholds are
    * monotone, so the drawn weight is simply HOW MANY thresholds u has
    * passed — a sum of 8 comparisons instead of a 9-deep conditional
    * chain (visibly cheaper to codegen at 32 replicates per row). */
  private def ladder(u: Column): Column =
    cumPoisson1.map(thr => (u >= thr).cast("int")).reduce(_ + _)

  /** Poisson(1) weight for `keyCol` in replicate `rep`. One md5 digest
    * carries EIGHT independent 16-bit coins (32 hex chars = 8 slices of
    * 4), so replicate `rep` reads slice `rep % 8` of the digest of
    * (key, seed, rep/8) — an 8× hashing saving over one digest per
    * replicate, with the coin still a pure function of (key, seed,
    * rep). The draw inverts the pinned cumulative-Poisson(1) ladder. */
  def poissonWeight(keyCol: Column, rep: Int, seed: String): Column = {
    val coin = conv(substring(md5(concat(keyCol.cast("string"),
      lit(s":$seed:${rep / 8}"))), 4 * (rep % 8) + 1, 4), 16, 10).cast("double")
    val u = (coin + 0.5) / 65536.0
    ladder(u)
  }

  /** B bootstrap replicate means of `valCol` in ONE scan: each input
    * row explodes into B (replicate, weight·x) rows that map-side
    * partial aggregation folds immediately into B groups — the same
    * total arithmetic as B side-by-side sum columns, but the per-row
    * expression stays SMALL, so the whole pipeline keeps whole-stage
    * codegen (a 2B-buffer wide aggregate with B md5 ladders inline
    * falls back to interpreted evaluation and runs ~10× slower,
    * measured at sf0.1). Returns the B means in replicate order
    * (driver-side — B doubles, not data). */
  def replicateMeans(df: DataFrame, valCol: String, keyCol: String,
      b: Int, seed: String): Seq[Double] = {
    require(b >= 2, "need at least 2 replicates")
    val nBlocks = (b + 7) / 8
    // The explode multiplies per-row work B×, so a narrow input (one
    // small parquet file = one partition) would serialize the whole
    // pass on a single core; spreading the (cheap, pre-explode) rows
    // costs 1/B of the work it parallelizes. A 100 TB input already
    // has >> parallelism partitions and skips this branch entirely.
    val par = df.sparkSession.sparkContext.defaultParallelism
    val spread = if (df.rdd.getNumPartitions < par) df.repartition(par) else df
    // one digest PER BLOCK per input row (materialized columns so the
    // md5 is computed once, not once per replicate), then the B weights
    // as an array of slice-ladder lookups, exploded with their index
    val withDigests = (0 until nBlocks).foldLeft(
      spread.select(col(keyCol).cast("string").as("__k"),
        col(valCol).cast("double").as("__x"))) { (acc, blk) =>
      acc.withColumn(s"__h$blk",
        md5(concat(col("__k"), lit(s":$seed:$blk"))))
    }
    val weights = array((0 until b).map { r =>
      val coin = conv(substring(col(s"__h${r / 8}"), 4 * (r % 8) + 1, 4),
        16, 10).cast("double")
      ladder((coin + 0.5) / 65536.0).cast("double")
    }: _*)
    val means = withDigests
      .select(col("__x"), posexplode(weights).as(Seq("__r", "__wt")))
      .groupBy(col("__r"))
      .agg(sum(col("__wt") * col("__x")).as("__sx"), sum(col("__wt")).as("__sw"))
      .collect().map { r =>
        val sw = r.getDouble(r.fieldIndex("__sw"))
        require(sw > 0,
          s"replicate ${r.getInt(0)} drew all-zero weights — input too small to bootstrap")
        r.getInt(0) -> r.getDouble(r.fieldIndex("__sx")) / sw
      }.toMap
    require(means.size == b, "every replicate must aggregate to one group")
    (0 until b).map(means)
  }

  /** Percentile-bootstrap confidence interval for the mean: the
    * (floor(α/2·(B−1))+1)-th and (ceil((1−α/2)·(B−1))+1)-th order
    * statistics of the B replicate means (1-based, a pinned
    * convention both engines can restate). Returns one row:
    * (n_replicates, ci_lo, ci_hi). */
  def meanCi(df: DataFrame, valCol: String, keyCol: String, b: Int,
      seed: String, alpha: Double = 0.05): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    val means = replicateMeans(df, valCol, keyCol, b, seed).sorted
    val kLo = math.floor(alpha / 2 * (b - 1)).toInt
    val kHi = math.ceil((1 - alpha / 2) * (b - 1)).toInt
    df.sparkSession.range(1).select(
      lit(b).as("n_replicates"),
      lit(means(kLo)).as("ci_lo"),
      lit(means(kHi)).as("ci_hi"))
  }
}
