package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable mergeable cardinality sketches: HyperLogLog registers and
  * KMV (k-minimum-values) bottom-k, built on the engine's portable md5
  * device so every result is a pure function of the DATA — bit-identical
  * across runs, partitionings, thread counts, and engines (each query
  * carries a DuckDB restatement and is oracle-checked).
  *
  * Why this exists at 100 TB: exact distinct counts need a shuffle of
  * every distinct value, every time the question is asked. A register
  * sketch is built in ONE pass (map-side max-combine, 256 rows per group
  * shuffle), can be MATERIALIZED per shard/day/source, and any later
  * union of shards is answered by merging the tiny register tables —
  * no rescan of the data. Merge is `max` per bucket: associative,
  * commutative, idempotent, so re-sharding, duplicate arrivals, and
  * arbitrary merge trees cannot change the merged sketch.
  *
  * Portability device (no numeric hashing in the hot path): the hash is
  * the first 13 lowercase hex chars of md5 (52 bits). The HLL bucket is
  * the first 2 hex chars (p = 8, m = 256); the rank rho is 1 + the
  * number of leading zero BITS of the remaining 11 hex chars (44 bits),
  * computed from the STRING — `ltrim(_, "0")` counts zero nibbles, a
  * 4-way CASE on the first surviving nibble counts the residual bits.
  * KMV exploits that lexicographic order on fixed-width lowercase hex IS
  * numeric order, so the bottom-k is a plain `orderBy(h).limit(k)` —
  * Spark plans a distributed TakeOrderedAndProject (per-partition top-k,
  * driver merges k rows; no global sort). Only the single k-th hash is
  * ever converted to a number (one `conv` on one row).
  *
  * Estimator arithmetic is drift-free by construction: the harmonic sum
  * `sum(2^-rho)` is carried as the INTEGER `sum(2^(45-rho))` (a sum of
  * longs is exact in any order; max value m·2^45 = 2^53 stays exact),
  * so the one floating division at the end sees bit-identical operands
  * in both engines. The small-range (linear-counting) correction
  * `m·ln(m/V)` is the lone transcendental — last-ulp `ln` drift is
  * absorbed by `round(_, 4)`, the registry's established device (lm1).
  *
  * Reference anchor: the reference profiles column cardinalities ahead
  * of schema inference (db_transformer/db/distinct_cnt.py) with exact
  * per-column counts; this is the shard-incremental form of that
  * statistic.
  */
object Sketches {

  /** Bucket-address width in hex chars: p = 8 bits, m = 256 buckets.
    * Standard error 1.04/sqrt(256) ~ 6.5%. */
  val BucketChars = 2
  val Buckets: Int = 1 << (4 * BucketChars)

  /** Rank-window width in hex chars (11 chars = 44 bits). */
  val SuffixChars = 11
  val SuffixBits: Int = 4 * SuffixChars

  /** Total hash width: 13 hex chars = 52 bits — the widest prefix whose
    * integer value is exact in a double, so the oracle's digit-sum
    * conversion (and ours) cannot round. */
  val HashChars: Int = BucketChars + SuffixChars

  /** alpha_m * m^2 * 2^45 for m = 256 — precomputed with the same
    * left-associated IEEE ops the oracle SQL spells out, so the constant
    * is bit-identical in both engines. */
  private val EstNumerator: Double =
    0.7213 / (1 + 1.079 / Buckets) * Buckets * Buckets *
      math.pow(2.0, SuffixBits + 1)

  /** The portable 52-bit hash of `value` under `seed`, as its fixed-width
    * lowercase hex string. Lexicographic order = numeric order. */
  def hexHash(value: Column, seed: String): Column =
    substring(md5(concat(lit(seed + ":"), value.cast("string"))), 1, HashChars)

  /** rho(h) = 1 + leading zero bits of the 44-bit suffix, 1..45 — from
    * the hex string alone (zero nibbles via ltrim, residual bits via a
    * 4-way CASE on the first surviving nibble). */
  def rho(h: Column): Column = {
    val suffix = substring(h, BucketChars + 1, SuffixChars)
    val stripped = ltrim(suffix, "0")
    val zeroNibbleBits = (lit(SuffixChars) - length(stripped)) * lit(4)
    val residual = when(substring(stripped, 1, 1)
        .isin("8", "9", "a", "b", "c", "d", "e", "f"), 0)
      .when(substring(stripped, 1, 1).isin("4", "5", "6", "7"), 1)
      .when(substring(stripped, 1, 1).isin("2", "3"), 2)
      .otherwise(3)
    when(length(stripped) === 0, lit(SuffixBits + 1))
      .otherwise(zeroNibbleBits + residual + lit(1))
  }

  /** Per-group HLL registers: one row per (group..., bucket) holding the
    * max rank — THE mergeable representation. At most m = 256 rows per
    * group ever shuffle; partial (map-side) max-combine does the heavy
    * lifting, and no `distinct` is needed (duplicate values hash to the
    * same (bucket, rho), which max absorbs). */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], value: Column,
      seed: String = "hll"): DataFrame = {
    val h = hexHash(value, seed)
    df.select(groupCols.map(col) :+ h.as("__h"): _*)
      .groupBy(groupCols.map(col) :+
        substring(col("__h"), 1, BucketChars).as("bucket"): _*)
      .agg(max(rho(col("__h"))).as("r"))
  }

  /** Merge register tables (possibly from different shards/days/sources
    * of the SAME keyspace): max per (group, bucket). Associative,
    * commutative, idempotent. */
  def hllMerge(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers.groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("r")).as("r"))

  /** Cardinality estimate per group from a register table: raw HLL
    * (`est_raw`) plus the standard small-range linear-counting switch
    * (`estimate`), with the zero-register count (`zeros`) exposed. All
    * arithmetic before the final divisions is exact-integer (see object
    * doc); both outputs rounded to 4 decimals. */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val m = Buckets
    val scale = SuffixBits + 1 // 45
    val grouped =
      if (groupCols.isEmpty) registers.groupBy()
      else registers.groupBy(groupCols.map(col): _*)
    grouped
      .agg(sum(pow(lit(2.0), lit(scale) - col("r")).cast("long")).as("__sp"),
        count(lit(1)).as("__nb"))
      .withColumn("zeros", lit(m.toLong) - col("__nb"))
      .withColumn("__s", col("__sp") + col("zeros") * lit(1L << scale))
      .withColumn("__raw", lit(EstNumerator) / col("__s").cast("double"))
      .withColumn("est_raw", round(col("__raw"), 4))
      .withColumn("estimate",
        round(when(col("__raw") <= lit(2.5 * m) && col("zeros") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("zeros").cast("double")))
          .otherwise(col("__raw")), 4))
      .select(groupCols.map(col) ++
        Seq(col("zeros"), col("est_raw"), col("estimate")): _*)
  }

  /** KMV bottom-k sketch of the value set: the k smallest distinct
    * 52-bit hashes, as hex strings. Distinct-on-hash first (duplicate
    * values share a hash), then a distributed top-k — no global sort,
    * no full shuffle of the value set. */
  def kmvSketch(df: DataFrame, value: Column, k: Int,
      seed: String = "kmv"): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    df.select(hexHash(value, seed).as("h")).distinct()
      .orderBy("h").limit(k)
  }

  /** Bottom-k uniform row sample: the k rows whose KEY hashes smallest,
    * all columns preserved plus the hash as `__h`. Because md5 is a pure
    * function of the key, this is simultaneously (a) a uniform
    * without-replacement sample of the key population, (b) deterministic
    * across runs/partitionings/engines, and (c) MERGEABLE: the bottom-k
    * of a union is the bottom-k of the concatenated per-shard bottom-k's
    * (dedup by hash absorbs keys seen in several shards) — so per-shard
    * samples can be materialized and any later union re-sampled without
    * rescanning the data. Plans as a distributed TakeOrderedAndProject:
    * per-partition top-k, driver merges k rows, no global sort. */
  def bottomK(df: DataFrame, key: Column, k: Int,
      seed: String = "sample"): DataFrame = {
    require(k >= 1, s"bottomK needs k >= 1, got $k")
    df.withColumn("__h", hexHash(key, seed)).orderBy("__h").limit(k)
  }

  /** Merge per-shard bottom-k samples (built with the SAME seed over the
    * same keyspace): dedup on the hash, keep the k smallest. */
  def bottomKMerge(parts: DataFrame, k: Int): DataFrame =
    parts.dropDuplicates("__h").orderBy("__h").limit(k)

  /** Distinct-count estimate from a full KMV sketch: (k-1) * 2^52 / h_k
    * where h_k is the largest (k-th smallest) hash — converted to a
    * number only here, on a single row. Caller must pass the k the
    * sketch was built with; if the sketch is short (fewer than k
    * distinct values exist) the estimate row reports the exact count
    * instead (`saturated` = false). */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.groupBy()
      .agg(count(lit(1)).as("n_sketch"), max(col("h")).as("__hk"))
      .withColumn("saturated", col("n_sketch") === k)
      .withColumn("estimate",
        round(when(col("saturated"),
            lit((k - 1).toDouble * math.pow(2.0, 4.0 * HashChars)) /
              conv(col("__hk"), 16, 10).cast("double"))
          .otherwise(col("n_sketch").cast("double")), 4))
      .select(col("n_sketch"), col("saturated"), col("estimate"))
}
