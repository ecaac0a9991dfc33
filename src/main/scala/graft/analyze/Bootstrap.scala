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
    // reads as >> parallelism partitions and skips the branch entirely
    // (this was the origin of graft.util.Spread — r15 routes it through
    // the shared utility instead of an inline copy).
    val spread = graft.util.Spread.wide(df)
    // Two-level explode, (r14) replacing one B-wide weight-array
    // projection: rows explode into nBlocks (block, digest) pairs, then
    // each pair into its 8 slice-ladder weights (__r = 8·block + slice —
    // the same weight for the same replicate, bit for bit). The flat
    // form put B conv/ladder chains in ONE generated Project (~500
    // expression nodes at B=32), and Janino compile time of that unit
    // dominated the query's cold cost (official 7.1 s vs 2.9 s warm,
    // BENCH_NOTES r14); block-sized units compile in milliseconds and
    // the per-row arithmetic is unchanged (guide §1.2 per-task work).
    val blocks = array((0 until nBlocks).map { blk =>
      struct(lit(blk).as("b"),
        md5(concat(col("__k"), lit(s":$seed:$blk"))).as("h"))
    }: _*)
    val perBlock = spread
      .select(col(keyCol).cast("string").as("__k"),
        col(valCol).cast("double").as("__x"))
      .select(col("__x"), explode(blocks).as("__blk"))
    val sliceWeights = array((0 until 8).map { sl =>
      val coin = conv(substring(col("__blk").getField("h"), 4 * sl + 1, 4),
        16, 10).cast("double")
      ladder((coin + 0.5) / 65536.0).cast("double")
    }: _*)
    val means = perBlock
      .select(col("__x"), (col("__blk").getField("b") * 8).as("__base"),
        posexplode(sliceWeights).as(Seq("__s", "__wt")))
      .select(col("__x"), (col("__base") + col("__s")).as("__r"), col("__wt"))
      .filter(col("__r") < b) // trailing slices of a partial last block
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
