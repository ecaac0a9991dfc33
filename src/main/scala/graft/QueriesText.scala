package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.VectorAgg
import graft.analyze.{Behavior, DistinctCounter, Olap, Quantiles}
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
import graft.text.{Dsir, TextAnalysis}


/** Registry domain: text analysis, multimodal plumbing, streaming-shaped transforms. See [[SparkEntry]] for the contract. */
private[graft] object QueriesText {
  import QBase._

  // Text analysis
  // ====================================================================

  private[graft] val qTextQuality = Q("t1_text_quality",
    (s, d) => t(s, d, "documents").select(
      col("doc_id"),
      length(col("text")).cast("bigint").as("n_chars_q"),
      TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_tokens"),
      TextAnalysis.bpeishTokenCount(col("text")).cast("bigint").as("n_bpeish"),
      round(TextAnalysis.meanWordLen(col("text")), 4).as("mean_wlen"),
      round(TextAnalysis.punctRatio(col("text")), 4).as("punct_ratio"),
      round(TextAnalysis.stopwordRatio(col("text")), 4).as("stopword_ratio"))
      .orderBy("doc_id"),
    Some {
      val sw = TextAnalysis.englishStopwords.map(w => s"'$w'").mkString("[", ",", "]")
      """SELECT doc_id, length(text)::BIGINT AS n_chars_q,
      (CASE WHEN length(trim(text)) = 0 THEN 0
        ELSE len(string_split(trim(text), ' ')) END)::BIGINT AS n_tokens,
      len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]', 0))::BIGINT AS n_bpeish,
      CASE WHEN length(trim(text)) = 0 THEN 0.0 ELSE
        round(list_aggregate(list_transform(string_split(trim(text), ' '),
          x -> length(x)), 'sum')::DOUBLE / len(string_split(trim(text), ' ')), 4) END AS mean_wlen,
      CASE WHEN length(text) = 0 THEN 0.0 ELSE
        round((length(text) - length(translate(text, '.,!?;:''"()-', '')))::DOUBLE
          / length(text), 4) END AS punct_ratio,
      CASE WHEN length(trim(text)) = 0 THEN 0.0 ELSE
        round(len(list_filter(string_split(lower(trim(text)), ' '),
          x -> list_contains(""" + sw + """, x)))::DOUBLE
          / len(string_split(lower(trim(text)), ' ')), 4) END AS stopword_ratio
      FROM documents ORDER BY doc_id"""
    })

  private[graft] val qLangId = Q("t2_lang_id",
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id"),
    Some {
      def score(lang: String): String = {
        val prof = TextAnalysis.langProfiles(lang).map(w => s"'$w'").mkString("[", ",", "]")
        s"len(list_filter(list_distinct(string_split(lower(trim(text)), ' ')), x -> list_contains($prof, x)))"
      }
      val langs = Seq("de", "en", "es", "fr")
      val scores = langs.map(l => s"${score(l)} AS s_$l").mkString(", ")
      val best = "greatest(" + langs.map(l => s"s_$l").mkString(", ") + ")"
      val cases = langs.map(l => s"WHEN s_$l = __best AND __best > 0 THEN '$l'").mkString(" ")
      s"""WITH sc AS (SELECT doc_id, text, $scores FROM documents),
        sc2 AS (SELECT doc_id, text, $best AS __best, s_de, s_en, s_es, s_fr FROM sc)
        SELECT doc_id, CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
          $cases ELSE 'und' END AS lang_pred
        FROM sc2 ORDER BY doc_id"""
    })

  private[graft] val qFingerprint = Q("t3_fingerprint",
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fingerprint"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, md5(lower(trim(text))) AS fingerprint
      FROM documents ORDER BY doc_id"""))

  // ====================================================================
  // Multimodal plumbing
  // ====================================================================

  private[graft] val qMedia = Q("mm1_media_stats",
    (s, d) => {
      val media = Multimodal.asMedia(t(s, d, "documents"), "doc_id", "text", "text/plain")
      Multimodal.byteStats(media)
        .select(col("media_id"), col("n_bytes"), md5(col("data")).as("content_md5"))
        .orderBy("media_id")
    },
    Some("""SELECT doc_id AS media_id, octet_length(encode(text))::BIGINT AS n_bytes,
      md5(text) AS content_md5 FROM documents ORDER BY media_id"""))

  // ====================================================================
  // Streaming-shaped transforms (batch-checked)
  // ====================================================================

  /** Deterministic two-band PNG corpus keyed off the nation table —
    * geometry and band colors are closed-form in the keys, PNG encode
    * runs executor-side: the shared fixture for the real-decode queries
    * mm2 and mm3 (and the matching CTE head of both oracles). */
  /** Batched mapPartitions decode through the DEFAULT codec — which since
    * round 9 is the real `javax.imageio` path ([[Multimodal.imageBatchCodec]]):
    * features [w, h, mean_r, mean_g, mean_b] come only from actual PNG
    * decode, and the oracle knows them in closed form (PNG lossless; the
    * means take one correctly-rounded double division and one rounding to
    * float on both sides, so values are bit-identical). What's exercised
    * beyond mm3: the batch-iterator plumbing and the float feature-vector
    * contract a JNI/ONNX codec would plug into. */
  private[graft] val qDecode = Q("mm2_decode_batched",
    (s, d) => {
      Multimodal.decodeBatched(twoBandPngMedia(s, d), dim = 5, batchSize = 8)
        .select(col("media_id"),
          element_at(col("features"), 1).cast("double").as("f_w"),
          element_at(col("features"), 2).cast("double").as("f_h"),
          element_at(col("features"), 3).cast("double").as("f_r"),
          element_at(col("features"), 4).cast("double").as("f_g"),
          element_at(col("features"), 5).cast("double").as("f_b"))
        .orderBy("media_id")
    },
    Some(s"""WITH $twoBandPngCte
      SELECT media_id, width::DOUBLE AS f_w, height::DOUBLE AS f_h,
        (((height // 2) * r1 + (height - height // 2) * r2)::DOUBLE / height)::FLOAT4::DOUBLE AS f_r,
        (((height // 2) * g1 + (height - height // 2) * g2)::DOUBLE / height)::FLOAT4::DOUBLE AS f_g,
        (((height // 2) * b1 + (height - height // 2) * b2)::DOUBLE / height)::FLOAT4::DOUBLE AS f_b
      FROM s ORDER BY media_id"""))

  /** REAL image decode (javax.imageio): deterministic two-band PNGs are
    * encoded per nation row executor-side, then decoded back by
    * [[Multimodal.decodeImageStats]] — the reported geometry and
    * per-channel means come ONLY from actual PNG decode, while the oracle
    * knows them in closed form from the construction (PNG is lossless;
    * integer pixel sums / one IEEE division are bit-identical to DuckDB's
    * rational formula because correctly-rounded division of equal exact
    * rationals is unique). */
  private[graft] val qImageDecode = Q("mm3_image_decode",
    (s, d) => Multimodal.decodeImageStats(twoBandPngMedia(s, d)).orderBy("media_id"),
    Some(s"""WITH $twoBandPngCte
      SELECT media_id, width, height,
        ((height // 2) * r1 + (height - height // 2) * r2)::DOUBLE / height AS mean_r,
        ((height // 2) * g1 + (height - height // 2) * g2)::DOUBLE / height AS mean_g,
        ((height // 2) * b1 + (height - height // 2) * b2)::DOUBLE / height AS mean_b
      FROM s ORDER BY media_id"""))

  /** Perceptual image near-dup (aHash + pigeonhole-banded Hamming join)
    * over the real-decode PNG fixture. The hash comes ONLY from actual
    * `javax.imageio` decode; the oracle re-derives each image's 8×8
    * average-hash bits in closed form from the two-band construction
    * (integer gray + strict integer mean test — no float anywhere), then
    * brute-forces all pairs. Banding guarantees full recall at the
    * threshold, so the LSH side must equal the brute-force side exactly. */
  private[graft] val qAhashNearDups = Q("mm4_ahash_neardups",
    (s, d) => Multimodal.ahashNearDups(twoBandPngMedia(s, d), maxDistance = 8)
      .orderBy("id1", "id2"),
    Some(s"""WITH $twoBandPngCte,
      jj AS (SELECT unnest(generate_series(0, 7)) AS j),
      rb AS (SELECT media_id, j,
          CASE WHEN (j * height) // 8 < height // 2
            THEN (r1 + g1 + b1) // 3 ELSE (r2 + g2 + b2) // 3 END AS gray
        FROM s CROSS JOIN jj),
      tot AS (SELECT media_id, 8 * sum(gray) AS sum64 FROM rb GROUP BY 1),
      bits AS (SELECT rb.media_id, j,
          CASE WHEN 64 * gray > sum64 THEN 1 ELSE 0 END AS b
        FROM rb JOIN tot USING (media_id)),
      ham AS (SELECT a.media_id AS id1, c.media_id AS id2,
          8 * sum(CASE WHEN a.b != c.b THEN 1 ELSE 0 END) AS hamming
        FROM bits a JOIN bits c ON a.j = c.j AND a.media_id < c.media_id
        GROUP BY 1, 2)
      SELECT id1, id2, hamming::INT AS hamming FROM ham
      WHERE hamming <= 8 ORDER BY id1, id2"""))

  /** Stateful running totals (mapGroupsWithState) — on a bounded input the
    * final state per key equals the plain aggregate, which IS the oracle. */
  private[graft] val qRunningTotals = Q("st2_running_totals",
    (s, d) => EventStream.runningTotals(events(s, d), "event_type", "value")
      .toDF()
      .select(col("key"), col("n"), round(col("total"), 4).as("total"))
      .orderBy("key"),
    Some("""SELECT event_type AS key, count(*) AS n, round(sum(value),4) AS total
      FROM events GROUP BY event_type ORDER BY key"""))

  private[graft] val qSessions = Q("st3_sessionize",
    (s, d) => EventStream.sessionizeBatch(events(s, d), "user_id", "ts",
        gapSeconds = 1800)
      .orderBy("user_id", "session_id"),
    // floor(epoch(...)) everywhere: Spark's unix_timestamp truncates
    // sub-second parts, so the oracle's gap test and bounds must too
    Some("""WITH e AS (SELECT user_id, ts,
        lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events),
      s AS (SELECT user_id, ts, CASE WHEN prev IS NULL
          OR floor(epoch(ts)) - floor(epoch(prev)) > 1800 THEN 1 ELSE 0 END AS new_s FROM e),
      c AS (SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
          ROWS UNBOUNDED PRECEDING) AS session_id FROM s)
      SELECT user_id, session_id::BIGINT AS session_id, count(*) AS n_events,
        floor(epoch(min(ts)))::BIGINT AS start_s, floor(epoch(max(ts)))::BIGINT AS end_s
      FROM c GROUP BY user_id, session_id ORDER BY user_id, session_id"""))

  private[graft] val qHourly = Q("st1_hourly_events",
    (s, d) => EventStream.hourlyStats(events(s, d))
      .orderBy("wstart", "event_type"),
    Some("""SELECT epoch(date_trunc('hour', ts))::BIGINT AS wstart, event_type,
      count(*) AS n, round(sum(value),4) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY wstart, event_type"""))

  /** The shared CTE prefix of both DSIR oracles: hashed uni+bigram
    * buckets (64 cells), per-(doc, target, bucket) counts, smoothed
    * per-bucket log p̂/q̂ with target = English documents — a SQL
    * restatement of [[Dsir.scoreAgainstTarget]]'s dataflow.
    */
  private val dsirScoreCtes =
    """WITH t AS (SELECT doc_id, lang, string_split(lower(trim(text)), ' ') AS w
        FROM documents WHERE text IS NOT NULL),
      g AS (SELECT doc_id, lang, unnest(w || list_transform(range(1, len(w)),
          i -> w[i] || ' ' || w[i+1])) AS g FROM t),
      b AS (SELECT doc_id, lang,
          ('0x' || substr(md5(g), 1, 7))::BIGINT % 64 AS bucket FROM g),
      dcb AS (SELECT doc_id, lang = 'en' AS tgt, bucket, count(*) AS c
        FROM b GROUP BY 1, 2, 3),
      cnt AS (SELECT bucket, sum(c) AS cr,
          sum(CASE WHEN tgt THEN c ELSE 0 END) AS ct FROM dcb GROUP BY 1),
      tot AS (SELECT sum(cr) AS r_tot, sum(ct) AS t_tot FROM cnt),
      sp AS (SELECT unnest(generate_series(0, 63)) AS bucket),
      lr AS (SELECT sp.bucket,
          ln((coalesce(cnt.ct, 0) + 1)::DOUBLE / (tot.t_tot + 64)) -
          ln((coalesce(cnt.cr, 0) + 1)::DOUBLE / (tot.r_tot + 64)) AS lr
        FROM sp LEFT JOIN cnt USING (bucket) CROSS JOIN tot),
      sc AS (SELECT dcb.doc_id, sum(dcb.c)::BIGINT AS n_ngrams,
          round(sum(dcb.c * lr.lr), 4) AS log_weight
        FROM dcb JOIN lr USING (bucket) GROUP BY 1)"""

  /** DSIR importance scores (Xie et al. 2023): every document scored
    * by how English-like its hashed uni+bigram distribution is —
    * fit and score in ONE corpus scan/shuffle. The 64-bucket table is
    * a test-scale knob; the paper's 10⁴ buckets stay broadcastable.
    */
  private[graft] val qDsirScore = Q("dsir1_importance_score",
    (s, d) => Dsir.scoreAgainstTarget(t(s, d, "documents"), "doc_id", "text",
        col("lang") === "en", nBuckets = 64)
      .orderBy("doc_id"),
    Some(dsirScoreCtes +
      " SELECT doc_id, n_ngrams, log_weight FROM sc ORDER BY doc_id"))

  /** DSIR resampling step: 50 documents drawn without replacement with
    * probability ∝ exp(importance weight) via Gumbel-top-k on the
    * portable md5 coin — the pick is deterministic and the oracle
    * recomputes every key.
    */
  private[graft] val qDsirResample = Q("dsir2_gumbel_resample",
    (s, d) => Dsir.gumbelTopK(
        Dsir.scoreAgainstTarget(t(s, d, "documents"), "doc_id", "text",
          col("lang") === "en", nBuckets = 64)
          .select(col("doc_id"), col("log_weight")),
        "doc_id", "log_weight", k = 50, seed = "dsir")
      .orderBy("doc_id"),
    Some(dsirScoreCtes + """,
      gk AS (SELECT doc_id, log_weight, log_weight +
          -ln(-ln((('0x' || substr(md5(doc_id::VARCHAR || ':dsir'), 1, 4))::INT
            + 0.5) / 65536.0)) AS key
        FROM sc),
      rk AS (SELECT doc_id, log_weight, key,
          row_number() OVER (ORDER BY key DESC, doc_id) AS rn FROM gk)
      SELECT doc_id, log_weight, round(key, 4) AS gumbel_key
      FROM rk WHERE rn <= 50 ORDER BY doc_id"""))

  // ====================================================================

  private[graft] val all: Seq[Q] = Seq(
    qTextQuality,
    qLangId,
    qFingerprint,
    qMedia,
    qDecode,
    qImageDecode,
    qAhashNearDups,
    qRunningTotals,
    qSessions,
    qHourly,
    qDsirScore,
    qDsirResample)
}
