package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for hot keys at cluster scale.
  *
  * AQE (`spark.sql.adaptive.skewJoin`) already splits skewed SHUFFLE
  * partitions at runtime; these helpers cover the two cases AQE cannot:
  * a single aggregation key so hot one task owns it, and a broadcast-
  * ineligible join against a skewed build side.
  *
  * (No counterpart in the reference — it has no shuffle concept; this is
  * part of the 100 TB design surface this engine adds.)
  */
object Skew {

  /** Two-phase salted aggregation: groupBy (key, salt) first — splitting a
    * hot key across `buckets` reducers — then reduce the partials. Works
    * for any algebraic aggregate you can express as (partial, merge):
    * sum/count/min/max and anything built from them.
    *
    * @param partials aggregates for phase 1 (over raw rows)
    * @param merges   aggregates for phase 2 (over phase-1 partials)
    */
  def saltedAggregate(df: DataFrame, keyCols: Seq[String], buckets: Int,
      partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    require(buckets > 0)
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val phase1 = salted.groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
    phase1.groupBy(keyCols.map(col): _*).agg(merges.head, merges.tail: _*)
  }

  /** Convenience: salted sum/count of one value column — the common
    * hot-key case (e.g. per-domain counts where one domain is 30% of the
    * corpus). */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
      buckets: Int = 32): DataFrame =
    saltedAggregate(df, keyCols, buckets,
      partials = Seq(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt")),
      merges = Seq(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).cast("long").as("n")))

  /** Salted join for a skewed LEFT side against a non-broadcastable right
    * side: left rows get a random salt in [0, buckets); right rows are
    * REPLICATED once per salt value, so the join key becomes
    * (key, salt) and a hot key spreads over `buckets` tasks. Output
    * equals the plain inner join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int = 8): DataFrame = {
    val l = left.withColumn("__salt", (rand(42) * buckets).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** One-row skew diagnosis for a key column — what you run BEFORE picking
    * salting/AQE settings: row and key counts, the hottest key's row count
    * and share, the count coefficient of variation, and the key-frequency
    * entropy in nats (log(n_keys) = perfectly uniform; ≪ that = skewed).
    * Two aggregations over the per-key counts (n_keys rows, not data-sized);
    * the 1-row totals side is broadcast into the entropy pass. */
  def keyProfile(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
    val totals = counts.agg(
      sum(col("__c")).as("__n"), count(lit(1)).as("n_keys"),
      max(col("__c")).as("max_key_rows"),
      stddev_samp(col("__c")).as("__sd"), avg(col("__c")).as("__mean"))
    // plain global aggregate over the cross join (every row carries the
    // same 1-row totals, so first() is deterministic) — not a groupBy on
    // floating-point columns, which only "worked" because the broadcast
    // side was a single row
    counts.crossJoin(broadcast(totals))
      .agg(first(col("__n")).as("n_rows"), first(col("n_keys")).as("n_keys"),
        first(col("max_key_rows")).as("max_key_rows"),
        first(col("__sd")).as("__sd"), first(col("__mean")).as("__mean"),
        (-sum((col("__c") / col("__n")) * log(col("__c") / col("__n")))).as("__h"))
      .select(col("n_rows"), col("n_keys"), col("max_key_rows"),
        round(col("max_key_rows") / col("n_rows"), 6).as("max_share"),
        round(col("__sd") / col("__mean"), 4).as("count_cv"),
        round(col("__h"), 4).as("entropy_nats"))
  }
}
