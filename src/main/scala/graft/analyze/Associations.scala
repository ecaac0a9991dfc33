package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association-rule mining over (basket, item) pairs: frequent item pairs
  * with support / confidence / lift — the market-basket statistic a
  * training-data pipeline uses to find correlated sources, templates, or
  * co-occurring entities.
  *
  * Scale shape (the a-priori property, Agrawal & Srikant VLDB'94): a pair
  * can only reach `minCount` if BOTH items do, so items are counted first
  * (one cheap aggregate) and the basket table is SEMI-REDUCED to frequent
  * items BEFORE the pair self-join. At 100 TB that prune is the difference
  * between joining the long tail (quadratic in basket size over millions
  * of rare items) and joining only the head. The pair join itself is an
  * equi-join on the basket key, so per-basket work is bounded by
  * (frequent items per basket)² and shuffles partition by basket — no
  * cross-basket blowup, no skew beyond the largest basket (cap baskets
  * upstream if adversarial).
  *
  * All outputs are pure integer counts plus single-division ratios rounded
  * to 4 decimals (one IEEE division per ratio — drift-free to restate).
  *
  * Reference anchor: the reference has no rule miner; nearest surface is
  * its categorical co-occurrence statistics ahead of schema inference
  * (db_transformer/db/distinct_cnt.py) — this is the pairwise form.
  */
object Associations {

  /** Frequent item pairs with rule statistics. `baskets` rows are
    * (basketCol, itemCol) memberships (duplicates tolerated — deduped);
    * items must be orderable (the canonical pair is item_a < item_b).
    *
    * Output: item_a, item_b, pair_n, n_a, n_b, n_baskets,
    * support = pair_n/n_baskets, conf_ab = P(b|a), conf_ba = P(a|b),
    * lift = support / (P(a)·P(b)). */
  def frequentPairs(baskets: DataFrame, basketCol: String, itemCol: String,
      minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be positive, got $minCount")
    val li = baskets.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val counts = li.groupBy("__i").agg(count(lit(1)).as("__n"))
    // a-priori prune: only frequent items can appear in a frequent pair.
    // NULL baskets are dropped explicitly — the r14 self-join's __b
    // equi-join never paired them, and the basket-collect below must not
    // sweep them into one spurious group (the coPurchasePairs device).
    val fi = li.join(counts.filter(col("__n") >= minCount), Seq("__i"))
      .filter(col("__b").isNotNull)
    // r15 (guide §2.4, the now-proven coPurchasePairs device): collect
    // each basket's sorted frequent (item, count) structs with ONE
    // groupBy(basket) — partial-aggregating map-side — and expand the
    // u<v pairs row-locally with a TWO-LEVEL explode (posexplode + the
    // suffix slice), so no value ever holds more than one basket's
    // O(frequent items) list. Replaces the __b-keyed self-join: its two
    // identical legs shared one exchange via reuse, but the join output
    // (one row per candidate pair) then re-shuffled into the pair
    // groupBy, where this shape shuffles each basket's item list once
    // and pairs never cross the wire unaggregated. sort_array orders by
    // (__i, __n) = by __i (the count is functionally determined by the
    // item), reproducing the a.__i < b.__i orientation; collect_set is
    // set-semantics like the self-join over the distinct'd input.
    val baskets2 = fi.groupBy(col("__b"))
      .agg(sort_array(collect_set(struct(col("__i"), col("__n")))).as("__ps"))
    val pairs = baskets2
      .select(col("__ps"), posexplode(col("__ps")).as(Seq("__x", "__a")))
      .select(col("__a"),
        explode(slice(col("__ps"), col("__x") + lit(2), size(col("__ps"))))
          .as("__c"))
      .groupBy(col("__a.__i").as("item_a"), col("__c.__i").as("item_b"))
      // per-item counts are constant within the group; min() carries them
      // through on the same shuffle instead of two extra joins
      .agg(count(lit(1)).as("pair_n"),
        min(col("__a.__n")).as("n_a"), min(col("__c.__n")).as("n_b"))
      .filter(col("pair_n") >= minCount)
    val nBaskets = li.agg(countDistinct(col("__b")).as("n_baskets"))
    pairs.crossJoin(nBaskets)
      .withColumn("support",
        round(col("pair_n").cast("double") / col("n_baskets").cast("double"), 4))
      .withColumn("conf_ab",
        round(col("pair_n").cast("double") / col("n_a").cast("double"), 4))
      .withColumn("conf_ba",
        round(col("pair_n").cast("double") / col("n_b").cast("double"), 4))
      .withColumn("lift",
        // cast each factor BEFORE multiplying: pair_n * n_baskets as longs
        // overflows Int64 once n_baskets reaches ~1e10 (the 100 TB regime),
        // while double products lose only ulps
        round(col("pair_n").cast("double") * col("n_baskets").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 4))
  }
}
