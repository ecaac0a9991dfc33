package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Automated form of BENCH_NOTES' plan-quality spot checks: the structural
  * properties that make the engine 100 TB-viable are asserted on every
  * registered query's physical plan, so a regression (a lost pushdown, an
  * accidental cartesian product, a join that stopped broadcasting) fails
  * CI instead of surfacing as a mystery slowdown at scale. Plans are built
  * at sf0.001 with AQE off so the static plan is inspectable.
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(name: String): SparkPlan = {
    val df = SparkEntry.queries(name)(spark, sf())
    df.queryExecution.executedPlan
  }

  private def withStaticPlans[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  // ANN paths deliberately broadcast the (tiny) query side against every
  // corpus row / code, tf-idf/bm25 cross-join a 1-ROW broadcast scalar
  // (corpus count / avg doc length), and sk2 joins per-key counts against
  // the 1-ROW broadcast totals for the entropy pass — bounded-by-
  // construction nested loops, not bugs
  private val allowedNestedLoop = Set(
    "sim1_bruteforce_topk", "sim2_lsh_topk", "sim4_pq_topk", "sim6_mmr_topk",
    "t6_tfidf_topk", "t7_bm25", "sk2_key_profile",
    "lm1_bigram_surprisal", // vocab-size V is a 1-row broadcast scalar
    "dr1_psi_drift", // smoothed totals are a 1-row broadcast aggregate
    "km1_kaplan_meier", // censoring cutoff is a 1-ROW broadcast max-timestamp
    "wau1_rolling_actives", // date-range clip vs the 1-ROW bounds aggregate
    "sim7_int8_topk", // broadcast tiny query side, like the other ANN paths
    "sim8_range_search", // same broadcast-queries scoring scan as sim1
    "tc2_clustering_coeff", // two 1-ROW aggregates cross-joined
    "tc3_triangle_approx", // estimate × 1-ROW sampled-edges aggregate
    "tc4_triangle_vsample", // same scalar attach as tc3
    // the degenerate-parameter oracle anchors are DELIBERATELY exhaustive:
    // a constant bucket key folds the equi-join into a nested loop
    "sim2b_lsh_exact_anchor", "sim6b_mmr_exact_anchor",
    "d5b_embedding_exact_anchor",
    // sketch estimate × 1-ROW exact-count aggregate (crossJoin of scalars)
    "hll2_sketch_merge", "kmv1_distinct_est", "kmv2_jaccard_est",
    "mb1_association_rules", // pair stats × 1-ROW n_baskets aggregate
    "jc1_joinsize_est", // sampled sum × 1-ROW exact-sum aggregate
    "ab1_welch_ttest", // the two 1-ROW group-stat sides cross-joined
    "chi1_chi2_independence", // contingency cells × 1-ROW totals aggregate
    "dq8_benford", // 9 digit counts × the 1-ROW total aggregate
    "rp1_projection_distortion") // broadcast tiny query side, like sim1

  test("no registered query plans a cartesian product; nested-loop joins only where deliberate") {
    withStaticPlans {
      val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
        val p = plan(name)
        val cartesian = p.collect { case c: CartesianProductExec => c }
        val bnlj = p.collect { case j: BroadcastNestedLoopJoinExec => j }
        val bad =
          (if (cartesian.nonEmpty) Seq(s"$name: CartesianProduct") else Nil) ++
            (if (bnlj.nonEmpty && !allowedNestedLoop(name))
              Seq(s"$name: BroadcastNestedLoopJoin") else Nil)
        bad
      }
      assert(offenders.isEmpty, s"plan regressions: $offenders")
    }
  }

  // Global windows over CARDINALITY-BOUNDED frames, never the input:
  // DSIR's smoothing totals run over the dense bucket table (exactly
  // nBuckets rows — 64 registered, 10^4 in the paper; the window
  // replaces a separate aggregate + crossJoin that defeated exchange
  // reuse and re-scanned the corpus, see Dsir.logRatioFromCounts), and
  // Kaplan–Meier's risk-set/survival recurrences run over the life
  // table (one row per DISTINCT duration — days, not subjects; subjects
  // collapse in the preceding groupBy). Bounded-by-construction, not
  // single-task funnels of the data.
  private val allowedBoundedWindow = Set(
    "dsir1_importance_score", "dsir2_gumbel_resample", "km1_kaplan_meier",
    "ks1_ks_test") // ks1: ECDF cumsums over DISTINCT values, not rows

  test("no registered query plans an unpartitioned window (single-task funnel)") {
    // round-9 guard: row_number() over an empty partition spec moves the
    // WHOLE input to one task ("WindowExec: No Partition Defined") — every
    // global ranking now goes through DistributedRank (range-sort +
    // zipWithIndex), so any reappearance is a scale regression
    withStaticPlans {
      val offenders = SparkEntry.queries.keys.toSeq.sorted
        .filterNot(allowedBoundedWindow).flatMap { name =>
        plan(name).collect {
          case w: WindowExec if w.partitionSpec.isEmpty => s"$name: WindowExec"
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
            s"$name: WindowGroupLimitExec"
        }
      }
      assert(offenders.isEmpty, s"unpartitioned windows: $offenders")
    }
  }

  test("IN-list filter reaches the parquet scan as a pushed filter") {
    withStaticPlans {
      val scans = plan("p5_in_filter").collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.exists(_.metadata.get("PushedFilters").exists(_.contains("In("))),
        s"no In(...) in PushedFilters: ${scans.map(_.metadata.get("PushedFilters"))}")
    }
  }

  test("q6's three predicates all reach the parquet scan") {
    withStaticPlans {
      val scans = plan("q6_forecast_revenue").collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      val pushed = scans.flatMap(_.metadata.get("PushedFilters")).mkString
      Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
        assert(pushed.contains(c), s"$c not pushed: $pushed")
      }
    }
  }

  test("projection prunes the parquet read schema") {
    withStaticPlans {
      val scans = plan("p1_project_fk").collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      // lineitem has 11 columns; the projection needs only a couple
      assert(scans.nonEmpty && scans.forall(_.output.length <= 3),
        s"scan reads ${scans.map(_.output.length)} columns")
    }
  }

  test("brute-force top-k plans a WindowGroupLimit rank pushdown") {
    withStaticPlans {
      val p = plan("sim1_bruteforce_topk")
      assert(p.collect { case w: WindowGroupLimitExec => w }.nonEmpty)
    }
  }

  test("as-of join runs on a single shuffle ahead of its window") {
    withStaticPlans {
      val p = plan("aj1_asof_join")
      assert(p.collect { case w: WindowExec => w }.nonEmpty)
      // one hash exchange for the window + one range exchange for the
      // output ORDER BY — anything more means the merge-as-of regressed
      val shuffles = p.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.length <= 2, s"${shuffles.length} shuffles")
    }
  }

  test("the star join broadcasts every dimension") {
    withStaticPlans {
      val p = plan("q5_local_supplier_revenue")
      val bhj = p.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }
      val smj = p.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(bhj.nonEmpty, "no broadcast joins in the star query")
      assert(smj.isEmpty, s"${smj.length} sort-merge joins at sf0.001 — a dimension stopped broadcasting")
    }
  }

  test("the bloom probe filter stays inside WholeStageCodegen") {
    withStaticPlans {
      val p = plan("d9_bloom_incremental")
      val codegenStages = p.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }
      val probeInCodegen = codegenStages.exists(_.collectWithSubqueries {
        case f: org.apache.spark.sql.execution.FilterExec =>
          f.condition.exists(_.isInstanceOf[graft.functions.BloomMightContain])
      }.exists(identity))
      assert(probeInCodegen,
        "graft_bloom_might_contain filter fell out of whole-stage codegen")
    }
  }

  test("ANN scoring stages compile under janino's 64 KB method limit") {
    // Runtime falls back to interpreted mode SILENTLY when a generated
    // method exceeds 64 KB (the round-6 regression: the PQ codebook spine
    // codegen'd element-by-element) — so compile every WholeStageCodegen
    // stage of the ANN-family plans here and fail loudly instead. The
    // margin check (< half the limit) catches growth before it tips over.
    withStaticPlans {
      val annQueries = Seq("sim1_bruteforce_topk", "sim3_ivf_topk",
        "sim4_pq_topk", "sim5_ivfpq_topk", "sim7_int8_topk",
        "eq1_int8_quantize")
      val oversized = annQueries.flatMap { name =>
        org.apache.spark.sql.GraftCodegenProbe.compileStages(plan(name))
          .filter(_._2 > 32 * 1024)
          .map { case (stage, size) => s"$name/$stage: $size bytes" }
      }
      assert(oversized.isEmpty,
        s"generated methods near/over the 64 KB janino limit: $oversized")
    }
  }

  test("physical plan fingerprints match the committed PLANS.lock") {
    // The sweeps above catch KNOWN anti-patterns; the lock catches every
    // OTHER silent plan-shape change (broadcast→sort-merge flip, an extra
    // Exchange, a split codegen stage) as a reviewable diff. After an
    // intentional plan change: `sbt "runMain graft.tools.PlanLock"` and
    // commit the lock diff as the plan review.
    val lockFile = java.nio.file.Paths.get(graft.tools.PlanLock.LockPath)
    assert(java.nio.file.Files.exists(lockFile),
      "PLANS.lock missing — generate with `sbt \"runMain graft.tools.PlanLock\"`")
    val locked = scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(lockFile)).asScala
      .filter(_.nonEmpty)
      .map { l => val Array(n, f) = l.split(": ", 2); n -> f }.toMap
    val current = graft.tools.PlanLock.fingerprints(spark, sf()).toMap
    val missing = (current.keySet -- locked.keySet).toSeq.sorted
    val stale = (locked.keySet -- current.keySet).toSeq.sorted
    val changed = current.keySet.intersect(locked.keySet).toSeq.sorted
      .filter(n => current(n) != locked(n))
      .map(n => s"$n:\n  locked:  ${locked(n)}\n  current: ${current(n)}")
    assert(missing.isEmpty && stale.isEmpty && changed.isEmpty,
      s"plan fingerprints drifted from PLANS.lock — review and regenerate " +
        s"if intentional.\nnew queries not in lock: $missing\n" +
        s"locked queries gone: $stale\nchanged: ${changed.mkString("\n")}")
  }
}
