package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.VectorAgg
import graft.analyze.{Behavior, DistinctCounter, Olap, Quantiles, TimeSeries}
import graft.functions.ZOrder
import graft.catalog.{ConstraintRegistry, ParquetCatalog}
import graft.convert.{CategoricalCodes, Converters, TableConverter}
import graft.dedup.Dedup
import graft.features.Features
import graft.functions.Normalizers
import graft.graph.RelGraph
import graft.joins.TemporalJoins
import graft.multimodal.Multimodal
import graft.sample.{BfsSampler, Sampling}
import graft.schema._
import graft.similarity.{Ivf, Quantize, Similarity}
import graft.streaming.EventStream
import graft.text.TextAnalysis


/** Registry domain: temporal joins, rolling features, splits, quantiles. See [[SparkEntry]] for the contract. */
private[graft] object QueriesTemporal {
  import QBase._

  // Temporal joins, rolling features, splits, quantiles (round 5)
  // ====================================================================

  /** Backward as-of join: each click picks the user's latest purchase
    * at-or-before it (merge-as-of: one window over a tagged union — no
    * inequality join). The oracle restates it as max-timestamp-then-max-id
    * subqueries, which DuckDB can afford at sf0.01. */
  private[graft] val qAsof = Q("aj1_asof_join",
    (s, d) => {
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("p_event_id"),
          col("value").as("p_value"))
      TemporalJoins.asofJoin(clicks, purchases, "user_id", "user_id", "ts", "ts",
          carry = Seq("p_event_id", "p_value"), tieBreak = "p_event_id")
        .select(col("event_id"), col("p_event_id"),
          round(col("p_value"), 4).as("p_value"))
        .orderBy("event_id")
    },
    Some("""WITH l AS (SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts
        FROM events WHERE event_type='click'),
      r AS (SELECT user_id, date_trunc('microseconds', ts) AS ts,
        event_id AS p_event_id, value FROM events WHERE event_type='purchase'),
      m AS (SELECT l.event_id, max(r.ts) AS mt FROM l LEFT JOIN r
        ON r.user_id=l.user_id AND r.ts<=l.ts GROUP BY 1),
      b AS (SELECT l.event_id AS event_id, max(r.p_event_id) AS p_event_id
        FROM l JOIN m ON l.event_id=m.event_id
        JOIN r ON r.user_id=l.user_id AND r.ts=m.mt GROUP BY 1)
      SELECT l.event_id, b.p_event_id, round(r2.value, 4) AS p_value
      FROM l LEFT JOIN b ON l.event_id=b.event_id
      LEFT JOIN r r2 ON r2.p_event_id=b.p_event_id
      ORDER BY l.event_id"""))

  /** Range join: clicks within each purchase's 24h window, per user —
    * bucketed equi-join on (user, day-bucket), exact containment filter,
    * then left-join back so empty windows report 0. */
  private[graft] val qRangeJoin = Q("rj1_range_join",
    (s, d) => {
      val dayUs = 86400000000L
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("c_ts"),
          col("value"))
      val windows = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("w_id"), col("user_id"),
          unix_micros(col("ts")).as("lo"))
        .withColumn("hi", col("lo") + dayUs)
      val matched = TemporalJoins.rangeJoinBucketed(clicks, windows,
        "c_user", "user_id", "c_ts", "lo", "hi", bucketWidth = dayUs)
      val aggd = matched.groupBy(col("w_id"))
        .agg(count(lit(1)).as("n_clicks"), sum(col("value")).as("__sv"))
      windows.select(col("w_id")).join(aggd, Seq("w_id"), "left")
        .select(col("w_id"), coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          round(coalesce(col("__sv"), lit(0.0)), 4).as("sum_value"))
        .orderBy("w_id")
    },
    Some("""WITH p AS (SELECT event_id AS w_id, user_id,
        date_trunc('microseconds', ts) AS lo,
        date_trunc('microseconds', ts) + INTERVAL 24 HOUR AS hi
        FROM events WHERE event_type='purchase'),
      c AS (SELECT user_id, date_trunc('microseconds', ts) AS ts, value
        FROM events WHERE event_type='click')
      SELECT p.w_id, count(c.ts) AS n_clicks,
        round(coalesce(sum(c.value),0),4) AS sum_value
      FROM p LEFT JOIN c ON c.user_id=p.user_id AND c.ts >= p.lo AND c.ts < p.hi
      GROUP BY 1 ORDER BY 1"""))

  /** Rolling per-user features over the event sequence + typed JSON field
    * extraction — one window sort serves lag, trailing mean and sequence
    * number. */
  private[graft] val qRolling = Q("fe1_rolling_features",
    (s, d) => Features.rolling(events(s, d), "user_id", "ts", "value",
        tie = "event_id", k = 3)
      .select(col("event_id"), round(col("prev_value"), 4).as("prev_value"),
        round(col("avg3"), 4).as("avg3"), col("seq"),
        Features.jsonField(col("props"), "$.k", "int").as("k"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
        round(lag(value) OVER w, 4) AS prev_value,
        round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS avg3,
        row_number() OVER w AS seq,
        json_extract_string(props, '$.k')::INTEGER AS k
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY event_id"""))

  /** Recency-weighted rolling feature: finite-window EWMA (α = 1/2 —
    * exact binary weights, so the lag-chain arithmetic is bit-identical
    * cross-engine) over each user's event stream. */
  private[graft] val qEwma = Q("fe3_ewma",
    (s, d) => Features.ewma(events(s, d), "user_id", "ts", "value",
        tie = "event_id", k = 4)
      .select(col("event_id"), round(col("ewma"), 6).as("ewma"))
      .orderBy("event_id"),
    Some("""SELECT event_id, round((
        coalesce(value * 1.0, 0.0)
        + coalesce(lag(value, 1) OVER w * 0.5, 0.0)
        + coalesce(lag(value, 2) OVER w * 0.25, 0.0)
        + coalesce(lag(value, 3) OVER w * 0.125, 0.0))
      / ((CASE WHEN value IS NOT NULL THEN 1.0 ELSE 0.0 END)
        + (CASE WHEN lag(value, 1) OVER w IS NOT NULL THEN 0.5 ELSE 0.0 END)
        + (CASE WHEN lag(value, 2) OVER w IS NOT NULL THEN 0.25 ELSE 0.0 END)
        + (CASE WHEN lag(value, 3) OVER w IS NOT NULL THEN 0.125 ELSE 0.0 END)),
      6) AS ewma
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY event_id"""))

  /** Calendar-spine densification: each user's hourly activity with
    * missing hours materialized as zero rows, spine bounded per key. */
  private[graft] val qGapFill = Q("gf1_gap_fill",
    (s, d) => Features.fillHourlyGaps(events(s, d), "user_id", "ts", "value")
      .select(col("user_id"), col("bucket_start"), col("n"),
        round(col("sum_value"), 4).as("sum_value"))
      .orderBy("user_id", "bucket_start"),
    Some("""WITH h AS (SELECT user_id, date_trunc('hour', ts) AS h,
        count(*) AS n, sum(value) AS v FROM events GROUP BY 1, 2),
      b AS (SELECT user_id, min(h) AS lo, max(h) AS hi FROM h GROUP BY 1),
      s AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        FROM b)
      SELECT s.user_id, epoch(s.h)::BIGINT AS bucket_start,
        coalesce(n, 0) AS n, round(coalesce(v, 0.0), 4) AS sum_value
      FROM s LEFT JOIN h ON s.user_id = h.user_id AND s.h = h.h
      ORDER BY 1, 2"""))

  /** Unpivot/melt: lineitem's four numeric measures to long form — pure
    * row-local stack, values carried verbatim (bit-identical, no rounding
    * device needed). */
  private[graft] val qUnpivot = Q("a21_unpivot",
    (s, d) => Olap.unpivot(
        t(s, d, "lineitem").filter(col("l_orderkey") < 1000),
        Seq("l_orderkey", "l_linenumber"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .orderBy("l_orderkey", "l_linenumber", "column"),
    Some("""SELECT l_orderkey, l_linenumber, c AS column, v AS value
      FROM (
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS c, l_quantity AS v
          FROM lineitem WHERE l_orderkey < 1000
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
          FROM lineitem WHERE l_orderkey < 1000
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
          FROM lineitem WHERE l_orderkey < 1000
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
          FROM lineitem WHERE l_orderkey < 1000) t
      ORDER BY l_orderkey, l_linenumber, c"""))

  /** k-anonymity audit over (nation, market-segment) quasi-identifiers —
    * group sizes under k = 10 are re-identification risks. */
  private[graft] val qKAnonymity = Q("dq4_k_anonymity",
    (s, d) => graft.analyze.DataQuality.kAnonymity(
      t(s, d, "customer"), Seq("c_nationkey", "c_mktsegment"), k = 10),
    Some("""WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS gs
        FROM customer GROUP BY 1, 2)
      SELECT count(*)::BIGINT AS n_groups,
        sum(CASE WHEN gs < 10 THEN 1 ELSE 0 END)::BIGINT AS n_violating_groups,
        coalesce(sum(CASE WHEN gs < 10 THEN gs END), 0)::BIGINT AS n_rows_at_risk,
        min(gs)::BIGINT AS min_group_size
      FROM g"""))

  /** ORC sink/source round-trip: lineitem through ORC and back, then an
    * aggregate the oracle computes straight off parquet — value equality
    * proves the second columnar format preserves the data. */
  private[graft] val qOrcRoundTrip = Q("orc1_orc_roundtrip",
    (s, d) => {
      val dir = scratchDir("graft_orc")
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      graft.sources.Ingest.viaOrc(li, s"$dir/lineitem_orc")
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** JSONL sink/source round-trip: the documents corpus through
    * line-delimited JSON (THE LLM-corpus interchange format) and back,
    * then a text-fidelity aggregate (md5 extrema + distinct content
    * count) the oracle computes straight off parquet — value equality
    * proves the JSON encode/decode preserved every byte of every text. */
  private[graft] val qJsonlRoundTrip = Q("jsonl1_jsonl_roundtrip",
    (s, d) => {
      val dir = scratchDir("graft_jsonl")
      graft.sources.Ingest.viaJsonl(t(s, d, "documents"), s"$dir/documents_jsonl")
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          count_distinct(md5(col("text"))).as("n_distinct_texts"),
          min(md5(col("text"))).as("md5_min"),
          max(md5(col("text"))).as("md5_max"),
          count_distinct(col("lang"), col("source")).as("n_lang_source"))
    },
    Some("""SELECT count(*) AS n, sum(n_chars)::BIGINT AS sum_chars,
        count(DISTINCT md5(text)) AS n_distinct_texts,
        min(md5(text)) AS md5_min, max(md5(text)) AS md5_max,
        count(DISTINCT (lang, source)) AS n_lang_source
      FROM documents"""))

  /** CSV round-trip of quoted free text — the third interchange format
    * beside parquet/ORC/JSONL: embedded commas and quotes must survive
    * Spark's CSV quoting verbatim or the md5 fidelity aggregate (same
    * device as jsonl1) diverges from the parquet truth. */
  private[graft] val qCsvRoundTrip = Q("csv1_csv_roundtrip",
    (s, d) => {
      val dir = scratchDir("graft_csv")
      graft.sources.Ingest.viaCsv(t(s, d, "documents"), s"$dir/documents_csv")
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          count_distinct(md5(col("text"))).as("n_distinct_texts"),
          min(md5(col("text"))).as("md5_min"),
          max(md5(col("text"))).as("md5_max"),
          count_distinct(col("lang"), col("source")).as("n_lang_source"))
    },
    Some("""SELECT count(*) AS n, sum(n_chars)::BIGINT AS sum_chars,
        count(DISTINCT md5(text)) AS n_distinct_texts,
        min(md5(text)) AS md5_min, max(md5(text)) AS md5_max,
        count(DISTINCT (lang, source)) AS n_lang_source
      FROM documents"""))

  /** S8/S6 under the ORACLE gate: the documents corpus through the REAL
    * JDBC sink and range-partitioned JDBC source — embedded Derby, the
    * same in-process execution path (dialect DDL, batched INSERTs,
    * range-predicate parallel read) a remote MariaDB would take, with
    * zero egress — then the jsonl1-style fidelity aggregate the oracle
    * computes straight off parquet. The partition bounds are deliberately
    * narrower than the id range at larger SFs: Spark's JDBC partitioner
    * puts out-of-range rows in the edge partitions, so the read is
    * correct at every scale (and that property is what this pins). */
  private[graft] val qJdbcRoundTrip = Q("jdbc1_derby_roundtrip",
    (s, d) => {
      val src = graft.sources.JdbcSource.embedded(
        "jdbc:derby:memory:graft_verify;create=true",
        "org.apache.derby.jdbc.EmbeddedDriver")
      src.writeTable(t(s, d, "documents"), "documents_rt")
      src.tablePartitioned(s, "documents_rt", "doc_id", 0, 400, 4)
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          count_distinct(md5(col("text"))).as("n_distinct_texts"),
          min(md5(col("text"))).as("md5_min"),
          max(md5(col("text"))).as("md5_max"),
          count_distinct(col("lang"), col("source")).as("n_lang_source"))
    },
    Some("""SELECT count(*) AS n, sum(n_chars)::BIGINT AS sum_chars,
        count(DISTINCT md5(text)) AS n_distinct_texts,
        min(md5(text)) AS md5_min, max(md5(text)) AS md5_max,
        count(DISTINCT (lang, source)) AS n_lang_source
      FROM documents"""))

  /** l-diversity privacy audit: within (nation, segment) groups the
    * sensitive attribute is the customer's account-balance bracket —
    * groups where fewer than l = 9 brackets appear leak attribute
    * information even when k-anonymous. */
  private[graft] val qLDiversity = Q("dq5_l_diversity",
    (s, d) => graft.analyze.DataQuality.lDiversity(
      t(s, d, "customer")
        .withColumn("bal_bracket", floor(col("c_acctbal") / 1000)),
      Seq("c_nationkey", "c_mktsegment"), "bal_bracket", l = 9),
    Some("""WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS gs,
        count(DISTINCT floor(c_acctbal / 1000)) AS div
        FROM customer GROUP BY 1, 2)
      SELECT count(*)::BIGINT AS n_groups,
        sum(CASE WHEN div < 9 THEN 1 ELSE 0 END)::BIGINT AS n_low_diversity_groups,
        coalesce(sum(CASE WHEN div < 9 THEN gs END), 0)::BIGINT AS n_rows_at_risk,
        min(div)::BIGINT AS min_diversity
      FROM g"""))

  /** Deterministic k-per-group sample: 5 orders per priority class by
    * md5 coin — stable across engines, restated as the same row_number. */
  private[graft] val qGroupSample = Q("w10_group_sample",
    (s, d) => Sampling.topKPerGroup(
        t(s, d, "orders").select(col("o_orderpriority"), col("o_orderkey")),
        "o_orderpriority", "o_orderkey", k = 5)
      .orderBy("o_orderpriority", "o_orderkey"),
    Some("""SELECT o_orderpriority, o_orderkey FROM (
        SELECT o_orderpriority, o_orderkey,
          row_number() OVER (PARTITION BY o_orderpriority
            ORDER BY md5(o_orderkey::VARCHAR || ':42'), o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 5 ORDER BY o_orderpriority, o_orderkey"""))

  /** Quality-weighted corpus selection: the 100 longest-weighted docs by
    * the Efraimidis–Spirakis exponential race (`w = n_chars + 1`) — a
    * doc's odds scale with its weight, selection is without replacement,
    * and the race value is a pure function of (doc_id, seed), so the
    * winning set restates exactly: the oracle decodes the same 48-bit
    * md5 coin digit-by-digit (the d4d strpos device; u is then a
    * division by 2⁴⁸, so both engines' u are bit-identical and only
    * ~1-ulp ln() drift touches the ranking, spread ~1/500 apart). */
  private[graft] val qWeightedSample = Q("w13_weighted_sample",
    (s, d) => Sampling.weightedSample(
        t(s, d, "documents").filter(col("text").isNotNull)
          .select(col("doc_id"), (col("n_chars") + 1).as("w")),
        "doc_id", "w", k = 100)
      .orderBy("doc_id"),
    Some("""WITH d AS (SELECT doc_id, n_chars + 1 AS w,
          substr(md5(doc_id::VARCHAR || ':ws:42'), 1, 12) AS h
        FROM documents WHERE text IS NOT NULL),
      v AS (SELECT doc_id, w,
          sum((strpos('0123456789abcdef', substr(h, j.j, 1)) - 1)
              * power(16, 12 - j.j)) AS iv
        FROM d CROSS JOIN (SELECT unnest(generate_series(1, 12)) AS j) j
        GROUP BY doc_id, w),
      e AS (SELECT doc_id, w,
          -ln((iv + 0.5) / power(16, 12)) / w AS e FROM v),
      win AS (SELECT doc_id, w FROM e ORDER BY e, doc_id LIMIT 100)
      SELECT doc_id, w FROM win ORDER BY doc_id"""))

  /** HGT-style budget sample: one hop from a 50-customer frontier into
    * two node types (their orders, their nations), collapsed to unique
    * nodes, ≤10 kept per TYPE by the namespaced md5 coin — restated as
    * the same row_number-over-md5 (the w10 device, node-deduped). */
  private[graft] val qBudgetSample = Q("w12_budget_sample",
    (s, d) => {
      val f = t(s, d, "customer")
        .filter(col("c_custkey") <= 50)
        .select(col("c_custkey"), col("c_nationkey"))
      val ordCand = t(s, d, "orders")
        .join(f.select(col("c_custkey").as("o_custkey")), "o_custkey")
        .select(lit("orders").as("node_type"),
          col("o_orderkey").cast("string").as("node_key"))
      val natCand = f.select(lit("nation").as("node_type"),
        col("c_nationkey").cast("string").as("node_key"))
      Sampling.budgetSample(ordCand.unionAll(natCand),
          "node_type", "node_key", budget = 10)
        .orderBy("node_type", "node_key")
    },
    Some("""WITH f AS (SELECT c_custkey, c_nationkey FROM customer
          WHERE c_custkey <= 50),
        cand AS (
          SELECT 'orders' AS node_type, o_orderkey::VARCHAR AS node_key
          FROM orders JOIN f ON o_custkey = c_custkey
          UNION ALL
          SELECT 'nation', c_nationkey::VARCHAR FROM f),
        u AS (SELECT DISTINCT node_type, node_key FROM cand),
        r AS (SELECT node_type, node_key,
          row_number() OVER (PARTITION BY node_type
            ORDER BY md5(node_type || ':' || node_key || ':hgt:42'),
            node_key) AS rn FROM u)
        SELECT node_type, node_key FROM r WHERE rn <= 10
        ORDER BY node_type, node_key"""))

  /** Zipf-law fit over the corpus vocabulary (top-100 terms): slope and
    * intercept of the ln-freq vs ln-rank least-squares line. */
  private[graft] val qZipf = Q("zipf1_zipf_slope",
    (s, d) => graft.text.TextAnalysis.zipfSlope(t(s, d, "documents"), "text", 100)
      .select(col("n_terms"), round(col("slope"), 6).as("slope"),
        round(col("intercept"), 6).as("intercept")),
    Some("""WITH tok AS (SELECT unnest(string_split(lower(trim(text)), ' ')) AS tk
        FROM documents),
      c AS (SELECT tk, count(*) AS c FROM tok WHERE length(tk) > 0 GROUP BY tk),
      r AS (SELECT row_number() OVER (ORDER BY c DESC, tk) AS rnk, c FROM c),
      p AS (SELECT ln(rnk) AS x, ln(c) AS y FROM r WHERE rnk <= 100),
      s AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
        sum(x*y) AS sxy, sum(x*x) AS sxx FROM p)
      SELECT n::BIGINT AS n_terms,
        round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
        round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 6) AS intercept
      FROM s"""))

  /** Snapshot diff between orders and a deterministically mutated "next
    * load" (status rewritten for the md5<10 slice, md5<04 dropped, fresh
    * negated keys inserted — the up1 device), every key classified. */
  private[graft] val qSnapshotDiff = Q("dv1_snapshot_diff",
    (s, d) => {
      val old = t(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus"))
      val changed = Sampling.hashSample(old, "o_orderkey", "10")
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"))
      val removedKeys = Sampling.hashSample(old, "o_orderkey", "04")
        .select(col("o_orderkey"))
      val added = Sampling.hashSample(old, "o_orderkey", "02")
        .select((-col("o_orderkey")).as("o_orderkey"),
          lit("N").as("o_orderstatus"))
      val next = graft.sources.Merge.upsert(
          old.join(removedKeys, Seq("o_orderkey"), "left_anti"),
          changed.join(removedKeys, Seq("o_orderkey"), "left_anti"),
          Seq("o_orderkey"))
        .unionAll(added)
      graft.sources.Merge.snapshotDiff(old, next, Seq("o_orderkey"))
        .orderBy("o_orderkey")
    },
    Some("""WITH o AS (SELECT o_orderkey, o_orderstatus FROM orders),
      rm AS (SELECT o_orderkey FROM orders
        WHERE substr(md5(o_orderkey::VARCHAR),1,2) < '04'),
      n AS (
        SELECT o_orderkey,
          CASE WHEN substr(md5(o_orderkey::VARCHAR),1,2) < '10'
            THEN 'U' ELSE o_orderstatus END AS o_orderstatus
        FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM rm)
        UNION ALL
        SELECT -o_orderkey, 'N' FROM orders
        WHERE substr(md5(o_orderkey::VARCHAR),1,2) < '02')
      SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        CASE WHEN o.o_orderkey IS NULL THEN 'added'
          WHEN n.o_orderkey IS NULL THEN 'removed'
          WHEN o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
            THEN 'unchanged'
          ELSE 'changed' END AS change
      FROM o FULL JOIN n ON o.o_orderkey = n.o_orderkey
      ORDER BY o_orderkey"""))

  /** Epoch up-sampling for a pretraining mix: rare languages repeated
    * (de ×2.5, fr ×3) by the deterministic md5 coin — copy counts are a
    * pure function of (doc_id, seed), restated row-for-row in SQL. */
  private[graft] val qUpsample = Q("rs1_epoch_upsample",
    (s, d) => Sampling.upsample(
        t(s, d, "documents").select(col("doc_id"), col("lang")),
        "lang", "doc_id", Map("de" -> 2.5, "fr" -> 3.0))
      .orderBy("doc_id", "copy_id"),
    Some("""WITH w AS (SELECT doc_id, lang,
        (CASE lang WHEN 'de' THEN 2 WHEN 'fr' THEN 3 ELSE 1 END
         + CASE WHEN substring(md5(doc_id::VARCHAR || ':up:42'), 1, 4) <
             (CASE lang WHEN 'de' THEN '8000' ELSE '0000' END)
           THEN 1 ELSE 0 END)::BIGINT AS n
        FROM documents)
      SELECT doc_id, lang, unnest(generate_series(0::BIGINT, n - 1)) AS copy_id
      FROM w WHERE n > 0 ORDER BY doc_id, copy_id"""))

  /** Count-min sketch heavy-hitter counts via Spark's native
    * `count_min_sketch` aggregate (codegen'd, mergeable — the bounded-
    * state sibling of the bloom probe and HLL distinct): one pass builds
    * the sketch, the driver reads estimates for the known key set. At
    * eps = 0.001 the 2719-cell rows make collisions among 5 keys
    * practically impossible and the seed is fixed, so the deterministic
    * estimates EQUAL the exact counts — which is the oracle (a mismatch
    * would mean the sketch path broke, exactly what the gate should
    * catch). */
  private[graft] val qCmsCounts = Q("cms1_sketch_counts",
    (s, d) => {
      val skBytes = events(s, d)
        .agg(count_min_sketch(col("event_type"), lit(0.001), lit(0.99),
          lit(42)).as("sk"))
        .collect()(0).getAs[Array[Byte]](0)
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(skBytes))
      val s2 = s
      import s2.implicits._
      Seq("click", "error", "purchase", "signup", "view")
        .map(t => (t, cms.estimateCount(t)))
        .toDF("event_type", "estimate")
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS estimate FROM events
      GROUP BY 1 ORDER BY 1"""))

  /** Asymmetric containment near-dups (quote/subset detection): ordered
    * pairs where ≥ 80% of A's shingles live in B — the exact all-pairs
    * restatement is the oracle (DuckDB can afford it at sf0.01). */
  private[graft] val qContainment = Q("d10_containment_pairs",
    (s, d) => Dedup.containmentPairs(t(s, d, "documents"), "doc_id", "text",
        n = 3, threshold = 0.8)
      .select(col("id_a"), col("id_b"),
        round(col("containment"), 4).as("containment"))
      .orderBy("id_a", "id_b"),
    Some("""WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents),
      s AS (SELECT doc_id, list_distinct(CASE WHEN len(w) < 3
          THEN [array_to_string(w, ' ')]
          ELSE list_transform(range(1, len(w)-1),
            i -> array_to_string(list_slice(w, i, i+2), ' ')) END) AS st FROM t)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        round(len(list_intersect(a.st, b.st))::DOUBLE / len(a.st), 4)
          AS containment
      FROM s a JOIN s b ON a.doc_id != b.doc_id
      WHERE len(list_intersect(a.st, b.st))::DOUBLE / len(a.st) >= 0.8
      ORDER BY id_a, id_b"""))

  /** Image dup CLUSTERS: the mm4 perceptual pair set collapsed into
    * connected components with a min-id representative — the multimodal
    * composition of the text dedup pipeline (same `dupClusters` CC
    * device as d6, fed by real-decode aHash pairs); the oracle re-derives
    * the pairs in closed form and runs the same transitive closure
    * recursively. */
  private[graft] val qImageDupClusters = Q("mm6_image_dup_clusters",
    (s, d) => {
      val media = twoBandPngMedia(s, d)
      val pairs = Multimodal.ahashNearDups(media, maxDistance = 8)
      Dedup.dupClusters(media.select(col("media_id")), "media_id", pairs)
        .orderBy("media_id")
    },
    Some(s"""WITH RECURSIVE $twoBandPngCte,
      jj AS (SELECT unnest(generate_series(0, 7)) AS j),
      rb AS (SELECT media_id, j,
          CASE WHEN (j * height) // 8 < height // 2
            THEN (r1 + g1 + b1) // 3 ELSE (r2 + g2 + b2) // 3 END AS gray
        FROM s CROSS JOIN jj),
      tot AS (SELECT media_id, 8 * sum(gray) AS sum64 FROM rb GROUP BY 1),
      bits AS (SELECT rb.media_id, j,
          CASE WHEN 64 * gray > sum64 THEN 1 ELSE 0 END AS b
        FROM rb JOIN tot USING (media_id)),
      hp AS (SELECT a.media_id AS id1, c.media_id AS id2
        FROM bits a JOIN bits c ON a.j = c.j AND a.media_id < c.media_id
        GROUP BY 1, 2
        HAVING 8 * sum(CASE WHEN a.b != c.b THEN 1 ELSE 0 END) <= 8),
      e AS (SELECT id1 AS a, id2 AS b FROM hp
        UNION SELECT id2, id1 FROM hp),
      reach AS (SELECT a, b FROM e
        UNION SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
      mn AS (SELECT a AS media_id, min(b) AS m FROM reach GROUP BY a)
      SELECT s.media_id, least(coalesce(m, s.media_id), s.media_id) AS rep
      FROM s LEFT JOIN mn USING (media_id) ORDER BY media_id"""))

  /** REAL audio decode (javax.sound.sampled WAV/PCM): deterministic
    * 16-bit PCM ramp signals are WAV-encoded per nation row executor-side,
    * then decoded back by [[Multimodal.decodeWavStats]] — sample rate,
    * channel count, and exact integer sample statistics come ONLY from
    * actual WAV parse + sample reads, while the oracle knows them in
    * closed form from the generation formula (PCM is lossless and the
    * stats are pure integer arithmetic). The audio sibling of mm3. */
  private[graft] val qWavDecode = Q("mm5_wav_decode",
    (s, d) => {
      import s.implicits._
      val media = t(s, d, "nation")
        .select(col("n_nationkey").cast("long").as("id"),
          (lit(64) + pmod(col("n_nationkey"), lit(5)) * 16).cast("int").as("ns"))
        .as[(Long, Int)]
        .map { case (k, ns) =>
          val samples = Array.tabulate(ns)(i =>
            (((k.toInt * 1717 + i * 313) % 65536) - 32768).toShort)
          (k, Multimodal.encodePcm16Wav(8000, samples))
        }
        .toDF("media_id", "data")
      Multimodal.decodeWavStats(media).orderBy("media_id")
    },
    Some("""WITH n AS (SELECT n_nationkey::BIGINT AS media_id,
          n_nationkey AS k, (64 + (n_nationkey % 5) * 16) AS ns FROM nation),
      i AS (SELECT media_id, k, ns,
          unnest(generate_series(0, ns - 1)) AS i FROM n),
      s AS (SELECT media_id, ns,
          ((k * 1717 + i * 313) % 65536) - 32768 AS v FROM i)
      SELECT media_id, 8000 AS sample_rate, 1 AS channels,
        ns::BIGINT AS n_samples, min(v)::INT AS s_min, max(v)::INT AS s_max,
        sum(v)::BIGINT AS s_sum, sum(abs(v))::BIGINT AS s_sumabs
      FROM s GROUP BY media_id, ns ORDER BY media_id"""))

  /** Substring-level (span) duplication profile — Lee et al. 2022's
    * exact-substring-dedup measurement at word-8-gram granularity: per
    * doc, how many start positions carry an n-gram that occurs anywhere
    * else in the corpus. Positional grams (duplicates kept), NOT the
    * distinct shingle sets of d3. */
  private[graft] val qRepeatedSpans = Q("dupspan1_repeated_spans",
    (s, d) => Dedup.repeatedSpanStats(t(s, d, "documents"), "doc_id", "text",
        n = 8)
      .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id,
        string_split_regex(lower(trim(text)), '\s+') AS w FROM documents),
      p AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
        FROM t WHERE len(w) >= 8),
      g AS (SELECT doc_id, array_to_string(w[i:i+7], ' ') AS gram FROM p),
      dg AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
      tot AS (SELECT gram, sum(c) AS ct FROM dg GROUP BY 1)
      SELECT dg.doc_id, sum(c)::BIGINT AS n_spans,
        sum(CASE WHEN ct > 1 THEN c ELSE 0 END)::BIGINT AS n_dup_spans,
        round(sum(CASE WHEN ct > 1 THEN c ELSE 0 END)::DOUBLE / sum(c), 4)
          AS dup_ratio
      FROM dg JOIN tot USING (gram) GROUP BY 1 ORDER BY 1"""))

  /** Span removal applied (the other half of dupspan1): every non-first
    * occurrence of a duplicated 8-gram has its token range stripped, and
    * the cleaned text is reassembled — exact-substring dedup as a
    * transform, not just a measurement. */
  private[graft] val qRemoveSpans = Q("dupspan3_remove_spans",
    (s, d) => Dedup.removeRepeatedSpans(t(s, d, "documents"), "doc_id", "text",
        n = 8)
      .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id,
          list_filter(string_split_regex(trim(text), '\s+'),
            x -> x <> '') AS wo,
          string_split_regex(lower(trim(text)), '\s+') AS w FROM documents),
      p AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
        FROM t WHERE len(w) >= 8),
      g AS (SELECT doc_id, i, array_to_string(w[i:i+7], ' ') AS gram FROM p),
      r AS (SELECT doc_id, i,
          row_number() OVER (PARTITION BY gram ORDER BY doc_id, i) AS rn FROM g),
      m AS (SELECT DISTINCT doc_id, unnest(generate_series(i, i + 7)) AS tp
        FROM r WHERE rn >= 2),
      tok AS (SELECT doc_id, unnest(wo) AS tok,
          unnest(generate_series(1, len(wo))) AS tp FROM t),
      kept AS (SELECT tok.doc_id, tok.tp, tok.tok FROM tok
        LEFT JOIN m ON tok.doc_id = m.doc_id AND tok.tp = m.tp
        WHERE m.doc_id IS NULL),
      agg AS (SELECT doc_id, count(*) AS n_kept,
          string_agg(tok, ' ' ORDER BY tp) AS text_clean FROM kept GROUP BY 1)
      SELECT t.doc_id, len(t.wo)::BIGINT AS n_tokens,
        (len(t.wo) - coalesce(n_kept, 0))::BIGINT AS n_removed,
        coalesce(text_clean, '') AS text_clean
      FROM t LEFT JOIN agg USING (doc_id) ORDER BY doc_id"""))

  /** Corpus-wide most-repeated 8-grams (the boilerplate/template report
    * behind span-removal thresholds); deterministic (n_occ desc, gram)
    * order before the top-20 cut — TakeOrderedAndProject, no global
    * sort. */
  private[graft] val qTopRepeatedSpans = Q("dupspan2_top_repeated",
    (s, d) => Dedup.topRepeatedSpans(t(s, d, "documents"), "doc_id", "text",
        n = 8, k = 20),
    Some("""WITH t AS (SELECT doc_id,
        string_split_regex(lower(trim(text)), '\s+') AS w FROM documents),
      p AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
        FROM t WHERE len(w) >= 8),
      g AS (SELECT doc_id, array_to_string(w[i:i+7], ' ') AS gram FROM p)
      SELECT gram, count(*)::BIGINT AS n_occ,
        count(DISTINCT doc_id)::BIGINT AS n_docs
      FROM g GROUP BY 1 HAVING count(*) > 1
      ORDER BY n_occ DESC, gram LIMIT 20"""))

  /** Repeated-sentence removal per document — first occurrences kept in
    * order; the oracle rebuilds the same first-occurrence sequence from
    * zipped unnest positions. */
  private[graft] val qSentenceDedup = Q("t10_sentence_dedup",
    (s, d) => TextAnalysis.dedupSentences(t(s, d, "documents"), "doc_id", "text")
      .orderBy("doc_id"),
    Some("""WITH s AS (SELECT doc_id,
        list_filter(list_transform(string_split_regex(text, '[.!?]+'),
          x -> trim(x)), x -> length(x) > 0) AS segs
        FROM documents),
      e AS (SELECT doc_id, unnest(segs) AS seg,
        unnest(range(1, len(segs) + 1)) AS pos FROM s),
      f AS (SELECT doc_id, seg, min(pos) AS p FROM e GROUP BY 1, 2),
      g AS (SELECT doc_id, count(*)::BIGINT AS n_unique,
        string_agg(seg, '. ' ORDER BY p) AS text_clean FROM f GROUP BY 1)
      SELECT s.doc_id,
        CASE WHEN segs IS NULL THEN NULL ELSE len(segs)::BIGINT END AS n_sentences,
        CASE WHEN segs IS NULL THEN NULL
          ELSE coalesce(g.n_unique, 0) END AS n_unique,
        CASE WHEN segs IS NULL THEN NULL
          ELSE coalesce(g.text_clean, '') END AS text_clean
      FROM s LEFT JOIN g USING (doc_id) ORDER BY doc_id"""))

  /** Cross-source contamination matrix over the corpus: shared distinct
    * 3-gram shingles per source pair, containment-normalized. */
  private[graft] val qSourceOverlap = Q("cont2_source_overlap",
    (s, d) => TextAnalysis.sourceOverlap(t(s, d, "documents"),
        "source", "text", n = 3)
      .orderBy("source_a", "source_b"),
    Some("""WITH t AS (SELECT source, string_split(lower(trim(text)), ' ') AS w
        FROM documents WHERE text IS NOT NULL),
      s AS (SELECT source, unnest(list_distinct(CASE WHEN len(w) < 3
          THEN [array_to_string(w, ' ')]
          ELSE list_transform(range(1, len(w)-1),
            i -> array_to_string(list_slice(w, i, i+2), ' ')) END)) AS sh FROM t),
      d AS (SELECT DISTINCT source, sh FROM s),
      sz AS (SELECT source, count(*) AS n FROM d GROUP BY 1),
      p AS (SELECT a.source AS source_a, b.source AS source_b,
          count(*) AS n_shared
        FROM d a JOIN d b ON a.sh = b.sh AND a.source < b.source
        GROUP BY 1, 2)
      SELECT source_a, source_b, n_shared,
        round(n_shared::DOUBLE / least(za.n, zb.n), 6) AS overlap_frac
      FROM p JOIN sz za ON za.source = p.source_a
        JOIN sz zb ON zb.source = p.source_b
      ORDER BY source_a, source_b"""))

  /** Whole-catalog FK integrity audit: all 8 declared FKs checked —
    * the oracle repeats each count pair with NOT-EXISTS subqueries. */
  private[graft] def fkAuditOracle: String = {
    val fks = Seq(
      ("nation", "n_regionkey", "region", "r_regionkey"),
      ("customer", "c_nationkey", "nation", "n_nationkey"),
      ("supplier", "s_nationkey", "nation", "n_nationkey"),
      ("orders", "o_custkey", "customer", "c_custkey"),
      ("events", "user_id", "customer", "c_custkey"),
      ("lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem", "l_suppkey", "supplier", "s_suppkey"))
    fks.map { case (c, ck, p, pk) =>
      s"""SELECT '$c' AS child_table, '$ck' AS fk_columns, '$p' AS parent_table,
        (SELECT count(*) FROM $c WHERE $ck IS NOT NULL) AS n_checked,
        (SELECT count(*) FROM $c WHERE $ck IS NOT NULL AND NOT EXISTS
          (SELECT 1 FROM $p WHERE $p.$pk = $c.$ck)) AS n_dangling"""
    }.mkString("", " UNION ALL ",
      " ORDER BY child_table, fk_columns")
  }

  private[graft] val qFkAudit = Q("dq6_fk_audit",
    (s, d) => graft.analyze.DataQuality.fkAudit(catalog(s, d))
      .orderBy("child_table", "fk_columns"),
    Some(fkAuditOracle))

  /** Rank features per event type: percent rank + quartile over the
    * (value, event_id)-totalized order — rank definitions are standard
    * SQL, so the restatement is verbatim. */
  private[graft] val qRankFeatures = Q("fe4_rank_features",
    (s, d) => Features.rankFeatures(events(s, d), "event_type", "value",
        tie = "event_id")
      .select(col("event_id"), round(col("pct_rank"), 6).as("pct_rank"),
        col("tile"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
        round(percent_rank() OVER w, 6) AS pct_rank,
        ntile(4) OVER w AS tile
      FROM events WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
      ORDER BY event_id"""))

  /** Propositionalization over orders→lineitem: the FastProp battery
    * (count + sum/mean/min/max per numeric + mode per categorical) per
    * parent key, joined back to orders — one partial-aggregating shuffle
    * for the numeric battery, one grouped-mode pass for the categorical.
    * Float parity: l_quantity is integer-valued (sums exact, mean =
    * exact-int/int — identical division both engines); extendedprice
    * SUM rounds at 4dp (boundary-safe for cent-valued doubles — the a7
    * device); min/max are value-picks, no summation order to disagree
    * on. */
  private[graft] val qPropositionalize = Q("fp1_propositionalize",
    (s, d) => graft.features.Propositionalize.features(
        t(s, d, "orders").select("o_orderkey"), t(s, d, "lineitem"),
        ForeignKeyDef(Seq("l_orderkey"), "orders", Seq("o_orderkey")),
        numericCols = Seq("l_quantity", "l_extendedprice"),
        catCols = Seq("l_returnflag"), prefix = "li")
      .select(col("o_orderkey"), col("li_n"),
        col("li_l_quantity_sum").cast("double").as("q_sum"),
        round(col("li_l_quantity_mean"), 4).as("q_mean"),
        round(col("li_l_extendedprice_sum"), 4).as("p_sum"),
        col("li_l_extendedprice_min").as("p_min"),
        col("li_l_extendedprice_max").as("p_max"),
        col("li_l_returnflag_mode").as("flag_mode"))
      .orderBy("o_orderkey"),
    Some("""WITH agg AS (SELECT l_orderkey, count(*) AS li_n,
        sum(l_quantity)::DOUBLE AS q_sum,
        round(avg(l_quantity), 4) AS q_mean,
        round(sum(l_extendedprice), 4) AS p_sum,
        min(l_extendedprice) AS p_min, max(l_extendedprice) AS p_max
        FROM lineitem GROUP BY 1),
      m AS (SELECT l_orderkey, l_returnflag,
        row_number() OVER (PARTITION BY l_orderkey
          ORDER BY count(*) DESC, l_returnflag) AS rn
        FROM lineitem WHERE l_returnflag IS NOT NULL GROUP BY 1, 2)
      SELECT o_orderkey, coalesce(li_n, 0)::BIGINT AS li_n, q_sum, q_mean,
        p_sum, p_min, p_max, m.l_returnflag AS flag_mode
      FROM orders o
      LEFT JOIN agg ON o.o_orderkey = agg.l_orderkey
      LEFT JOIN (SELECT * FROM m WHERE rn = 1) m ON o.o_orderkey = m.l_orderkey
      ORDER BY o_orderkey"""))

  /** Depth-2 propositionalization (the reference's FastProp runs over
    * the BFS data model to max_depth, getml_xgboost.py:420): featurize
    * lineitem→orders first, then feed the ENRICHED orders table to the
    * customer hop — aggregate-of-aggregate features (total/mean lineitem
    * count per customer, max per-order quantity sum). Two aggregate
    * passes total. Float parity: counts and quantity sums are exact
    * integers in double; the only cent-valued battery column
    * (o_totalprice) appears as a SUM, rounded 4dp (a7 boundary rule);
    * li mean = exact-int/int. */
  private[graft] val qPropositionalizeDeep = Q("fp2_propositionalize_deep",
    (s, d) => {
      import graft.features.Propositionalize
      val ordersFeat = Propositionalize.features(
        t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        t(s, d, "lineitem"),
        ForeignKeyDef(Seq("l_orderkey"), "orders", Seq("o_orderkey")),
        numericCols = Seq("l_quantity"), prefix = "li")
      Propositionalize.features(
          t(s, d, "customer").select("c_custkey"), ordersFeat,
          ForeignKeyDef(Seq("o_custkey"), "customer", Seq("c_custkey")),
          numericCols = Seq("li_n", "li_l_quantity_sum", "o_totalprice"),
          prefix = "ord")
        .select(col("c_custkey"), col("ord_n"),
          col("ord_li_n_sum").cast("double").as("li_total"),
          round(col("ord_li_n_mean"), 4).as("li_mean"),
          col("ord_li_l_quantity_sum_max").as("qsum_max"),
          round(col("ord_o_totalprice_sum"), 4).as("price_sum"))
        .orderBy("c_custkey")
    },
    Some("""WITH li AS (SELECT l_orderkey, count(*) AS li_n,
          sum(l_quantity) AS li_qsum FROM lineitem GROUP BY 1),
        o AS (SELECT o_custkey, o_totalprice,
          coalesce(li_n, 0) AS li_n, li_qsum
          FROM orders LEFT JOIN li ON o_orderkey = l_orderkey),
        agg AS (SELECT o_custkey, count(*) AS ord_n,
          sum(li_n)::DOUBLE AS li_total,
          round(avg(li_n), 4) AS li_mean,
          max(li_qsum) AS qsum_max,
          round(sum(o_totalprice), 4) AS price_sum
          FROM o GROUP BY 1)
      SELECT c_custkey, coalesce(ord_n, 0)::BIGINT AS ord_n, li_total,
        li_mean, qsum_max, price_sum
      FROM customer LEFT JOIN agg ON c_custkey = o_custkey
      ORDER BY c_custkey"""))

  /** Per-language min-max scaling of document length — group-relative
    * normalization; bit-identical division from identical min/max. */
  private[graft] val qGroupScaling = Q("sc2_grouped_scaling",
    (s, d) => Features.scaleByGroup(t(s, d, "documents"), "lang", "n_chars")
      .select(col("doc_id"), round(col("scaled"), 6).as("scaled"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
        round(CASE WHEN mx = mn THEN 0.0
          ELSE (n_chars - mn)::DOUBLE / (mx - mn) END, 6) AS scaled
      FROM (SELECT doc_id, n_chars::DOUBLE AS n_chars,
        min(n_chars::DOUBLE) OVER (PARTITION BY lang) AS mn,
        max(n_chars::DOUBLE) OVER (PARTITION BY lang) AS mx
        FROM documents) t
      ORDER BY doc_id"""))

  /** Robust median/MAD outlier profile per return flag — the anomaly gate
    * run on numeric features before training; medians rounded before use
    * so both engines flag identical rows. */
  private[graft] val qMadOutliers = Q("an1_mad_outliers",
    (s, d) => graft.analyze.Quantiles.madOutliers(
        t(s, d, "lineitem"), "l_returnflag", "l_extendedprice", k = 3.0)
      .orderBy("l_returnflag"),
    Some("""WITH m AS (SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 4) AS med
        FROM lineitem GROUP BY 1),
      d AS (SELECT l.l_returnflag, abs(l.l_extendedprice - m.med) AS dev, m.med
        FROM lineitem l JOIN m USING (l_returnflag)),
      md AS (SELECT l_returnflag, round(quantile_cont(dev, 0.5), 4) AS mad
        FROM d GROUP BY 1)
      SELECT d.l_returnflag, count(*) AS n,
        sum(CASE WHEN dev > 3.0 * 1.4826 * md.mad THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
        min(d.med) AS median, min(md.mad) AS mad
      FROM d JOIN md USING (l_returnflag)
      GROUP BY 1 ORDER BY 1"""))

  /** Deterministic k-fold CV assignment — every order keeps its fold
    * across runs and engines (the md5 16-bit coin mod k). */
  private[graft] val qKFold = Q("w11_kfold",
    (s, d) => Sampling.kFold(
        t(s, d, "orders").select(col("o_orderkey")), "o_orderkey", k = 5)
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
        ('0x' || substring(md5(o_orderkey::VARCHAR || ':cv'), 1, 4))::INT % 5 AS fold
      FROM orders ORDER BY o_orderkey"""))

  /** Sentence segmentation stats per document (RE2-safe split — the same
    * pattern runs in both engines; token-mean is an exact integer/integer
    * division, bit-identical with no rounding device). */
  private[graft] val qSentences = Q("snt1_sentence_stats",
    (s, d) => TextAnalysis.sentenceStats(t(s, d, "documents"), "doc_id", "text")
      .orderBy("doc_id"),
    Some("""WITH s AS (SELECT doc_id,
        list_filter(list_transform(string_split_regex(text, '[.!?]+'),
          x -> trim(x)), x -> length(x) > 0) AS segs
        FROM documents)
      SELECT doc_id, len(segs)::BIGINT AS n_sentences,
        CASE WHEN len(segs) = 0 THEN 0.0
          ELSE list_sum(list_transform(segs,
            x -> len(string_split_regex(x, '\s+'))))::DOUBLE / len(segs)
        END AS avg_sentence_tokens
      FROM s ORDER BY doc_id"""))

  /** Gopher-style repetition signals over documents. */
  private[graft] val qRepetition = Q("t5_repetition_stats",
    (s, d) => TextAnalysis.repetitionStats(t(s, d, "documents"), "doc_id", "text")
      .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents),
      n AS (SELECT doc_id, w, len(w) AS n_tok, len(list_distinct(w)) AS n_uniq FROM t),
      tok AS (SELECT doc_id, unnest(w) AS tk FROM t),
      cnt AS (SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY 1,2),
      mx AS (SELECT doc_id, max(c) AS mc FROM cnt GROUP BY 1),
      g AS (SELECT doc_id, CASE WHEN len(w) < 2 THEN NULL
          ELSE len(list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1]))) END AS n_uniq2 FROM t)
      SELECT n.doc_id, n.n_tok, n.n_uniq,
        round(1.0 - n.n_uniq / n.n_tok::DOUBLE, 4) AS dup_word_frac,
        round(mx.mc / n.n_tok::DOUBLE, 4) AS top_word_frac,
        round(1.0 - g.n_uniq2 / (n.n_tok - 1)::DOUBLE, 4) AS dup_bigram_frac
      FROM n LEFT JOIN mx ON n.doc_id=mx.doc_id LEFT JOIN g ON n.doc_id=g.doc_id
      ORDER BY n.doc_id"""))

  /** Top-3 TF-IDF terms per document (smoothed idf, term-tiebroken rank). */
  private[graft] val qTfidf = Q("t6_tfidf_topk",
    (s, d) => TextAnalysis.tfidfTopK(t(s, d, "documents"), "doc_id", "text", 3)
      .orderBy("doc_id", "rk"),
    Some("""WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents),
      tok AS (SELECT doc_id, unnest(w) AS term FROM t),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1,2),
      df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      n AS (SELECT count(*) AS n FROM t),
      sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
          tf.tf * ln((n.n + 1) / (df.df + 1.0)) AS score
        FROM tf JOIN df ON tf.term=df.term CROSS JOIN n),
      rk AS (SELECT *, row_number() OVER
          (PARTITION BY doc_id ORDER BY score DESC, term) AS rk FROM sc)
      SELECT doc_id, term, tf, df, round(score, 4) AS score, rk
      FROM rk WHERE rk <= 3 ORDER BY doc_id, rk"""))

  /** Leakage-free group split: md5-prefix assignment per customer, rows
    * follow their group (orders counted per split through the FK). */
  private[graft] val qGroupSplit = Q("w8_group_split",
    (s, d) => {
      val c = Sampling.groupSplit(t(s, d, "customer"), "c_custkey")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("split"))
        .agg(count_distinct(col("c_custkey")).as("n_groups"),
          count(col("o_orderkey")).as("n_rows"))
        .orderBy("split")
    },
    Some("""WITH s AS (SELECT c_custkey, CASE
          WHEN substr(md5(c_custkey::VARCHAR),1,2) < 'cd' THEN 'train'
          ELSE 'test' END AS split FROM customer)
      SELECT s.split, count(DISTINCT s.c_custkey) AS n_groups,
        count(o.o_orderkey) AS n_rows
      FROM s LEFT JOIN orders o ON o.o_custkey = s.c_custkey
      GROUP BY 1 ORDER BY 1"""))

  /** Exact column quantiles in long form; `Quantiles.approx` is the
    * sketch-based 100 TB path (same output shape, not oracle-checkable). */
  private[graft] val qQuantiles = Q("a13_quantiles",
    (s, d) => Quantiles.exact(t(s, d, "lineitem"),
        Seq("l_extendedprice", "l_quantity"), Seq(0.25, 0.5, 0.75, 0.95))
      .select(col("col"), col("p"), round(col("q"), 4).as("q"))
      .orderBy("col", "p"),
    Some("""WITH q AS (
        SELECT 'l_extendedprice' AS col,
          quantile_cont(l_extendedprice, [0.25,0.5,0.75,0.95]) AS qs FROM lineitem
        UNION ALL
        SELECT 'l_quantity', quantile_cont(l_quantity, [0.25,0.5,0.75,0.95]) FROM lineitem)
      SELECT col, unnest([0.25,0.5,0.75,0.95])::DOUBLE AS p,
        round(unnest(qs), 4) AS q FROM q ORDER BY col, p"""))

  /** Interval join (the streaming-capable twin of rj1): purchase×click
    * pairs within 24h per user. The batch plan (key equi-join + range
    * filter) is what the oracle checks; EventStreamSpec drives the same
    * function as a watermarked stream-stream join. */
  private[graft] val qIntervalJoin = Q("st4_interval_join",
    (s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("p_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
      EventStream.intervalJoin(purchases, clicks, "p_user", "c_user",
          "p_ts", "c_ts", lower = "0 seconds", upper = "24 hours")
        .select(col("p_id"), col("c_id"))
        .orderBy("p_id", "c_id")
    },
    Some("""SELECT p.event_id AS p_id, c.event_id AS c_id
      FROM events p JOIN events c ON c.user_id = p.user_id
        AND p.event_type='purchase' AND c.event_type='click'
        AND date_trunc('microseconds', c.ts) >= date_trunc('microseconds', p.ts)
        AND date_trunc('microseconds', c.ts) <
          date_trunc('microseconds', p.ts) + INTERVAL 24 HOUR
      ORDER BY p_id, c_id"""))

  /** BM25 ranking of documents for a fixed query term set (k1=1.2, b=0.75;
    * only docs matching ≥1 term appear). */
  private[graft] val qBm25 = Q("t7_bm25",
    (s, d) => TextAnalysis.bm25(t(s, d, "documents"), "doc_id", "text",
        Seq("table", "query", "fast"))
      .select(col("doc_id"), round(col("bm25"), 4).as("bm25"))
      .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents),
      tok AS (SELECT doc_id, unnest(w) AS term FROM t),
      lens AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
      stats AS (SELECT avg(dl::DOUBLE) AS avgdl FROM lens),
      n AS (SELECT count(*) AS n FROM t),
      q AS (SELECT doc_id, term, count(*) AS tf FROM tok
        WHERE term IN ('table','query','fast') GROUP BY 1,2),
      dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
        WHERE term IN ('table','query','fast') GROUP BY 1),
      sc AS (SELECT q.doc_id,
          ln(1.0 + (n.n - dfq.df + 0.5) / (dfq.df + 0.5)) *
          (q.tf * (1.2 + 1.0) / (q.tf + 1.2 * (1.0 - 0.75 + 0.75 * lens.dl / stats.avgdl))) AS s
        FROM q JOIN dfq ON q.term=dfq.term JOIN lens ON q.doc_id=lens.doc_id
        CROSS JOIN n CROSS JOIN stats)
      SELECT doc_id, round(sum(s), 4) AS bm25 FROM sc
      GROUP BY 1 ORDER BY doc_id"""))

  /** PQ ANN with an unbounded shortlist: exact re-rank over every
    * candidate ≡ brute force (the correctness anchor, like sim3's
    * nProbe=nCells); PqSpec measures the bounded-shortlist approximate
    * path's recall on clustered data. */
  private[graft] val qPqTopK = Q("sim4_pq_topk",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val cb = graft.similarity.Pq.trainCodebooks(emb, "vec_id", "embedding",
        dim = 64, m = 8, ksub = 16, iters = 2)
      graft.similarity.Pq.pqTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 3, cb, refine = Int.MaxValue, roundDigits = 6)
        .orderBy("query_id", "neighbor_id")
    },
    QueriesDedup.qBruteTopK.oracle)

  /** IVF-PQ composition at full probe + unbounded shortlist ≡ brute force
    * (anchor); PqSpec measures the pruned/bounded path. Quantizer quality
    * is irrelevant to the anchor (exactness comes from the re-rank), so
    * training is minimal here — ksub=8/iters=1 halves the codegen width
    * and quantizer cost vs sim4's realistic parameters. */
  private[graft] val qIvfPqTopK = Q("sim5_ivfpq_topk",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val cents = Ivf.trainCentroids(emb, "vec_id", "embedding", nCells = 8, iters = 1)
      val cb = graft.similarity.Pq.trainCodebooks(emb, "vec_id", "embedding",
        dim = 64, m = 8, ksub = 8, iters = 1)
      graft.similarity.Pq.ivfPqTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 3, cents, cb,
          nProbe = 8, refine = Int.MaxValue, roundDigits = 6)
        .orderBy("query_id", "neighbor_id")
    },
    QueriesDedup.qBruteTopK.oracle)

  /** Deterministic content-hash sample (~10%: md5 prefix < '1a' = 26/256):
    * a pure filter that pushes toward the scan and agrees across engines
    * and data arrivals. */
  private[graft] val qHashSample = Q("s10_hash_sample",
    (s, d) => Sampling.hashSample(t(s, d, "orders"), "o_orderkey", "1a")
      .select(col("o_orderkey"), col("o_custkey"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_custkey FROM orders
      WHERE substr(md5(o_orderkey::VARCHAR),1,2) < '1a' ORDER BY o_orderkey"""))

  /** Shipping-priority analytic query (TPC-H Q3 shape): segment-filtered
    * customer×orders×lineitem, revenue per order, top-10 — the
    * filter-join-aggregate-topN slice. Ordering is on the ROUNDED revenue
    * (identical on both engines) with an id tiebreak, so the LIMIT
    * boundary is deterministic. */
  /** TPC-H Q6 shape — the pushdown showcase: a single filtered scan whose
    * three predicates all reach the parquet reader, one map-side partial
    * sum, a 1-row result. The canonical "is the scan actually pruned"
    * benchmark query. */
  private[graft] val qQ6 = Q("q6_forecast_revenue",
    (s, d) => t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue")),
    Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount >= 0.05 AND l_discount <= 0.07
        AND l_quantity < 24"""))

  /** TPC-H Q10 shape — returned-item customer ranking: 3-way join,
    * per-customer revenue, top 20. Revenue is ROUNDED BEFORE ranking
    * (with a key tiebreak) so both engines cut the same top 20 even when
    * summation order shifts an ulp. */
  private[graft] val qQ10 = Q("q10_returned_items",
    (s, d) => {
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(round(sum(rev), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, n_name,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  private[graft] val qQ3 = Q("q3_shipping_priority",
    (s, d) => {
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment") === "BUILDING" &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_shipdate") >= lit("1996-06-01").cast("timestamp"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(rev), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("revenue"),
          unix_timestamp(col("o_orderdate")).as("odate_s"), col("o_orderpriority"))
    },
    Some("""SELECT l_orderkey, revenue, odate_s, o_orderpriority FROM (
        SELECT l_orderkey,
          round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
          floor(epoch(o_orderdate))::BIGINT AS odate_s, o_orderpriority
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate >= TIMESTAMP '1996-06-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10)
      ORDER BY revenue DESC, l_orderkey"""))

  /** Incremental ingestion dedup: drop arriving documents whose content
    * fingerprint already exists in the historical set — a fingerprint
    * LEFT ANTI join (the registry's anti-join shape). At 100 TB the
    * history side is a bucketed fingerprint table; here it is a
    * deterministic hash-sample of the corpus standing in for "yesterday's
    * data". */
  private[graft] val qIncrementalDedup = Q("d7_incremental_dedup",
    (s, d) => {
      val docs = t(s, d, "documents")
      val fp = TextAnalysis.fingerprint(col("text"))
      val history = Sampling.hashSample(docs, "doc_id", "40")
        .select(fp.as("fp")).distinct()
      docs.withColumn("fp", fp)
        .join(history, Seq("fp"), "left_anti")
        .select(col("doc_id"))
        .orderBy("doc_id")
    },
    Some("""WITH hist AS (SELECT DISTINCT md5(lower(trim(text))) AS fp
        FROM documents WHERE substr(md5(doc_id::VARCHAR),1,2) < '40')
      SELECT d.doc_id FROM documents d
      WHERE NOT EXISTS (SELECT 1 FROM hist
        WHERE hist.fp = md5(lower(trim(d.text))))
      ORDER BY doc_id"""))

  /** pr1's oracle: the FIXED 5-round power iteration unrolls into chained
    * CTEs exactly like [[labelPropOracle]] — per round one dangling-mass
    * scalar (the left-anti sum the engine collects to the driver), one
    * contribution aggregate over the joined edge list, one left join back
    * onto the vertex set. The arithmetic SHAPES mirror the engine's
    * exactly ((1−d)/n as one division, rank/deg with a BIGINT degree,
    * dangling/n at use site), so both engines differ only by summation
    * order — ~1e-15 relative, absorbed by the shared round-to-6. */
  private[graft] def pageRankOracle(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""d$k AS (SELECT coalesce(sum(r.rank), 0.0) AS dang
        FROM r${k - 1} r LEFT JOIN deg ON r.id = deg.src
        WHERE deg.src IS NULL),
      c$k AS (SELECT e.dst AS id, sum(r.rank / e.d) AS s
        FROM e JOIN r${k - 1} r ON e.src = r.id GROUP BY 1),
      r$k AS (SELECT v.id,
          (1 - 0.85) / (SELECT n FROM nn)
            + 0.85 * (coalesce(c.s, 0.0)
                      + (SELECT dang FROM d$k) / (SELECT n FROM nn)) AS rank
        FROM v LEFT JOIN c$k c ON v.id = c.id)"""
    }.mkString(",\n      ")
    s"""WITH v AS (SELECT o_orderkey::BIGINT AS id FROM orders
        UNION ALL SELECT (c_custkey + 1000000)::BIGINT FROM customer),
      e0 AS (SELECT o_orderkey::BIGINT AS src,
          (o_custkey + 1000000)::BIGINT AS dst FROM orders),
      deg AS (SELECT src, count(*) AS d FROM e0 GROUP BY 1),
      e AS (SELECT e0.src, e0.dst, deg.d FROM e0 JOIN deg ON e0.src = deg.src),
      nn AS (SELECT count(*)::DOUBLE AS n FROM v),
      r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM v),
      $rounds
      SELECT id, round(rank, 6) AS rank FROM r$iters
      WHERE id >= 1000000 ORDER BY id"""
  }

  /** PageRank over the orders→customer FK graph (bipartite: rank flows to
    * heavily-ordered customers). Fully oracle-checked since round 12: the
    * fixed iteration count makes the float loop SQL-restatable after all
    * (see [[pageRankOracle]]) — both engines run the identical 5-round
    * recurrence and round to 6 decimals; PageRankSpec additionally pins
    * closed-form fixpoints, mass conservation and dangling
    * redistribution. */
  private[graft] val qPageRank = Q("pr1_pagerank",
    (s, d) => {
      val orders = t(s, d, "orders")
      val vertices = orders.select(col("o_orderkey").as("id"))
        .unionAll(t(s, d, "customer").select((col("c_custkey") + 1000000L).as("id")))
      val edges = orders.select(col("o_orderkey").as("src"),
        (col("o_custkey") + 1000000L).as("dst"))
      graft.graph.PageRank.run(vertices, "id", edges, iters = 5)
        .filter(col("id") >= 1000000L) // report the customer side
        .select(col("id"), round(col("rank"), 6).as("rank"))
        .orderBy("id")
    },
    Some(pageRankOracle(5)))

  /** lp1's oracle: both engines run the SAME two synchronous
    * label-propagation rounds over the order–customer FK graph — the
    * neighbor-mode update (count desc, min-label tiebreak) is pure integer
    * arithmetic, so the unrolled SQL restatement is exact, no rounding
    * device needed. */
  private[graft] def labelPropOracle(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""n$k AS (SELECT e.dst, l.label, count(*) AS c
        FROM e JOIN l${k - 1} l ON e.src = l.id GROUP BY 1, 2),
      m$k AS (SELECT dst AS id, label AS newl FROM (
        SELECT dst, label,
          row_number() OVER (PARTITION BY dst ORDER BY c DESC, label) AS rn
        FROM n$k) t WHERE rn = 1),
      l$k AS (SELECT l.id, coalesce(m.newl, l.label) AS label
        FROM l${k - 1} l LEFT JOIN m$k m USING (id))"""
    }.mkString(",\n      ")
    s"""WITH v AS (SELECT o_orderkey::BIGINT AS id FROM orders
        UNION ALL SELECT c_custkey + 1000000 FROM customer),
      e AS (SELECT o_orderkey::BIGINT AS src, (o_custkey + 1000000)::BIGINT AS dst FROM orders
        UNION ALL SELECT o_custkey + 1000000, o_orderkey FROM orders),
      l0 AS (SELECT id, id AS label FROM v),
      $rounds
      SELECT id, label FROM l$iters ORDER BY id"""
  }

  /** Label-propagation communities over the order–customer graph: two
    * synchronous min-tiebreak rounds, fully oracle-checked (16.5k rows at
    * sf0.01 — every label hash-compared). */
  private[graft] val qLabelProp = Q("lp1_label_prop",
    (s, d) => {
      val orders = t(s, d, "orders")
      val vertices = orders.select(col("o_orderkey").cast("long").as("id"))
        .unionAll(t(s, d, "customer")
          .select((col("c_custkey") + 1000000L).as("id")))
      val edges = orders.select(col("o_orderkey").cast("long").as("src"),
          (col("o_custkey") + 1000000L).as("dst"))
        .unionAll(orders.select((col("o_custkey") + 1000000L).as("src"),
          col("o_orderkey").cast("long").as("dst")))
      graft.graph.LabelProp.run(vertices, "id", edges, iters = 2)
        .orderBy("id")
    },
    Some(labelPropOracle(2)))

  /** pr1's oracle anchor: the same iterate-to-fixpoint loop on a literal
    * 4-cycle, where every iteration's arithmetic is EXACT — (1−d) is exact
    * by Sterbenz, /4 and ·0.25 are power-of-two scalings, and the two
    * addends sum to the representable 1/4 — so ranks stay bit-exactly
    * 0.25 and the closed-form expected output IS the oracle. The big
    * rows-only pr1 stays the scale exercise; this row moves the loop's
    * SEMANTICS (damping, contribution split, convergence plumbing) under
    * the driver gate. */
  private[graft] val qPageRankAnchor = Q("pr1b_pagerank_anchor",
    (s, d) => {
      import s.implicits._
      val vertices = (1L to 4L).toDF("id")
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
      graft.graph.PageRank.run(vertices, "id", edges, iters = 5, validate = true)
        .select(col("id"), col("rank").as("pr"))
        .orderBy("id")
    },
    Some("""SELECT * FROM (VALUES (1::BIGINT, 0.25::DOUBLE),
      (2::BIGINT, 0.25::DOUBLE), (3::BIGINT, 0.25::DOUBLE),
      (4::BIGINT, 0.25::DOUBLE)) AS t(id, pr) ORDER BY id"""))

  /** Weighted PageRank on a literal micro-graph, 2 iterations unrolled in
    * SQL — weights chosen so every per-source weight sum and fraction is
    * an exact binary value, making both engines' arithmetic identical
    * step for step (every vertex has out-edges, so the dangling term is
    * exactly 0 each round). */
  private[graft] val qWeightedPr = Q("wpr1_weighted_pagerank",
    (s, d) => {
      import s.implicits._
      val v = (1L to 4L).toDF("id")
      val e = Seq((1L, 2L, 3.0), (1L, 3L, 1.0), (2L, 3L, 2.0),
        (3L, 1L, 1.0), (4L, 1L, 5.0)).toDF("src", "dst", "w")
      graft.graph.PageRank.runWeighted(v, "id", e, "w", iters = 2)
        .select(col("id"), round(col("rank"), 6).as("pr"))
        .orderBy("id")
    },
    Some("""WITH v AS (SELECT * FROM (VALUES (1::BIGINT), (2), (3), (4)) t(id)),
      e AS (SELECT * FROM (VALUES (1::BIGINT, 2::BIGINT, 3.0::DOUBLE),
        (1, 3, 1.0), (2, 3, 2.0), (3, 1, 1.0), (4, 1, 5.0)) t(src, dst, w)),
      f AS (SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS frac FROM e),
      r0 AS (SELECT id, 0.25 AS rank FROM v),
      c1 AS (SELECT f.dst AS id, sum(r.rank * f.frac) AS s
        FROM f JOIN r0 r ON f.src = r.id GROUP BY 1),
      r1 AS (SELECT v.id, (1 - 0.85)/4 + 0.85 * (coalesce(c.s, 0.0) + 0.0) AS rank
        FROM v LEFT JOIN c1 c ON v.id = c.id),
      c2 AS (SELECT f.dst AS id, sum(r.rank * f.frac) AS s
        FROM f JOIN r1 r ON f.src = r.id GROUP BY 1),
      r2 AS (SELECT v.id, (1 - 0.85)/4 + 0.85 * (coalesce(c.s, 0.0) + 0.0) AS rank
        FROM v LEFT JOIN c2 c ON v.id = c.id)
      SELECT id, round(rank, 6) AS pr FROM r2 ORDER BY id"""))

  /** kc1's oracle anchor: the distributed peel on a literal triangle+tail
    * graph whose unique fixpoint is closed-form (peel 5 then 4; the
    * triangle survives at k=2 with degree 2 each) — integer degrees, no
    * float anywhere, expected output stated as VALUES. */
  private[graft] val qKCoreAnchor = Q("kc1b_kcore_anchor",
    (s, d) => {
      import s.implicits._
      val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
        .toDF("u", "v")
      graft.graph.KCore.vertices(e, "u", "v", k = 2).orderBy("id")
    },
    Some("""SELECT * FROM (VALUES (1::BIGINT, 2::BIGINT),
      (2::BIGINT, 2::BIGINT), (3::BIGINT, 2::BIGINT)) AS t(id, degree)
      ORDER BY id"""))

  /** Hierarchical rollup with explicit subtotal labels and grouping_id —
    * ONE aggregate over the expanded grouping sets. */
  private[graft] val qRollup = Q("a14_rollup",
    (s, d) => Olap.rollupAgg(t(s, d, "lineitem"),
        Seq("l_returnflag", "l_linestatus"),
        Seq(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n")))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("flag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("status"),
        col("sum_qty"), col("n"), col("gid"))
      .orderBy("gid", "flag", "status"),
    Some("""SELECT coalesce(l_returnflag,'(all)') AS flag,
        coalesce(l_linestatus,'(all)') AS status,
        sum(l_quantity) AS sum_qty, count(*) AS n,
        GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY gid, flag, status"""))

  /** Full cube over both dimensions — rollup's every-subset sibling, ONE
    * aggregate over the expanded grouping sets (4 sets vs rollup's 3). */
  private[graft] val qCube = Q("a22_cube",
    (s, d) => Olap.cubeAgg(t(s, d, "lineitem"),
        Seq("l_returnflag", "l_linestatus"),
        Seq(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n")))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("flag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("status"),
        col("sum_qty"), col("n"), col("gid"))
      .orderBy("gid", "flag", "status"),
    Some("""SELECT coalesce(l_returnflag,'(all)') AS flag,
        coalesce(l_linestatus,'(all)') AS status,
        sum(l_quantity) AS sum_qty, count(*) AS n,
        GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid
      FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY gid, flag, status"""))

  /** Event-type counts pivoted wide per user (enumerated domain — no
    * domain-discovery scan). */
  private[graft] val qPivot = Q("a15_pivot",
    (s, d) => Olap.pivotCounts(events(s, d), "user_id", "event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .orderBy("user_id"),
    Some("""SELECT user_id,
        count(*) FILTER (WHERE event_type='click') AS click,
        count(*) FILTER (WHERE event_type='error') AS error,
        count(*) FILTER (WHERE event_type='purchase') AS purchase,
        count(*) FILTER (WHERE event_type='signup') AS signup,
        count(*) FILTER (WHERE event_type='view') AS view
      FROM events GROUP BY 1 ORDER BY 1"""))

  /** Fixed-width histogram with clamped edges and a complete bucket spine. */
  private[graft] val qHistogram = Q("a16_histogram",
    (s, d) => Olap.histogram(t(s, d, "lineitem"), "l_extendedprice",
        lo = 0.0, hi = 110000.0, nBuckets = 10)
      .orderBy("bucket"),
    Some("""WITH b AS (SELECT least(greatest(
          floor((l_extendedprice - 0.0)/11000.0)::BIGINT, 0), 9) AS bucket
        FROM lineitem WHERE l_extendedprice IS NOT NULL),
      c AS (SELECT bucket, count(*) AS n FROM b GROUP BY 1)
      SELECT r.range AS bucket, (0.0 + r.range*11000.0)::DOUBLE AS lo,
        coalesce(c.n, 0) AS n
      FROM range(0,10) r LEFT JOIN c ON c.bucket = r.range ORDER BY bucket"""))

  /** Autocorrelation of daily shipped quantity at lags 1..7 — the
    * seasonality probe ([[graft.analyze.TimeSeries.acf]]: exact integer
    * sums per lag, one sqrt·sqrt division at the end). A weekly cycle
    * surfaces as a lag-7 peak. */
  private[graft] val qAcf = Q("ts1_autocorrelation",
    (s, d) => {
      val daily = t(s, d, "lineitem")
        .groupBy(to_date(col("l_shipdate")).as("day"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
      TimeSeries.acf(daily, "day", "qty", maxLag = 7).orderBy("lag")
    },
    Some("""WITH s AS (SELECT l_shipdate::DATE AS day,
          sum(l_quantity::BIGINT) AS x FROM lineitem GROUP BY 1),
        l AS (SELECT unnest(generate_series(1, 7)) AS lag),
        p AS (SELECT l.lag, a.x AS xa, b.x AS xb
          FROM s a CROSS JOIN l JOIN s b ON b.day = a.day + l.lag::INTEGER),
        g AS (SELECT lag, count(*) AS n_pairs, sum(xa*xb) AS sxy,
            sum(xa) AS sx, sum(xb) AS sy,
            sum(xa*xa) AS sxx, sum(xb*xb) AS syy
          FROM p GROUP BY 1)
      SELECT lag, n_pairs,
        round((n_pairs*sxy - sx*sy)::DOUBLE /
          (sqrt((n_pairs*sxx - sx*sx)::DOUBLE) *
           sqrt((n_pairs*syy - sy*sy)::DOUBLE)), 4) AS acf
      FROM g ORDER BY lag"""))

  /** Day-of-week profile of the same daily series ts1 probes: the
    * seasonal-mean table a pipeline inspects when ts1's lag-7 spike
    * fires. Exact integer sums; dow 0=Sunday..6=Saturday on both
    * engines. */
  private[graft] val qSeasonalProfile = Q("ts2_weekday_profile",
    (s, d) => {
      val daily = t(s, d, "lineitem")
        .groupBy(to_date(col("l_shipdate")).as("day"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
      TimeSeries.seasonalProfile(daily, "day", "qty").orderBy("dow")
    },
    Some("""WITH s AS (SELECT l_shipdate::DATE AS day,
          sum(l_quantity::BIGINT) AS x FROM lineitem GROUP BY 1)
      SELECT dayofweek(day) AS dow, count(*) AS n_days,
        round(sum(x)::DOUBLE / count(*)::DOUBLE, 4) AS mean_v,
        min(x)::BIGINT AS min_v, max(x)::BIGINT AS max_v
      FROM s GROUP BY 1 ORDER BY 1"""))

  // ====================================================================

  private[graft] val all: Seq[Q] = Seq(
    qAcf,
    qSeasonalProfile,
    qAsof,
    qRangeJoin,
    qRolling,
    qEwma,
    qGapFill,
    qUnpivot,
    qKAnonymity,
    qOrcRoundTrip,
    qJsonlRoundTrip,
    qCsvRoundTrip,
    qJdbcRoundTrip,
    qLDiversity,
    qGroupSample,
    qBudgetSample,
    qWeightedSample,
    qZipf,
    qSnapshotDiff,
    qUpsample,
    qCmsCounts,
    qContainment,
    qImageDupClusters,
    qWavDecode,
    qRepeatedSpans,
    qRemoveSpans,
    qTopRepeatedSpans,
    qSentenceDedup,
    qSourceOverlap,
    qFkAudit,
    qRankFeatures,
    qPropositionalize,
    qPropositionalizeDeep,
    qGroupScaling,
    qMadOutliers,
    qKFold,
    qSentences,
    qRepetition,
    qTfidf,
    qGroupSplit,
    qQuantiles,
    qIntervalJoin,
    qBm25,
    qPqTopK,
    qIvfPqTopK,
    qHashSample,
    qQ6,
    qQ10,
    qQ3,
    qIncrementalDedup,
    qPageRank,
    qLabelProp,
    qPageRankAnchor,
    qWeightedPr,
    qKCoreAnchor,
    qRollup,
    qCube,
    qPivot,
    qHistogram)
}
