package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations compiled into as few passes as
  * the checks allow: every row-local check (not-null, range, set, regex)
  * and every uniqueness check becomes one conditional aggregate in a
  * SINGLE scan — adding a check adds a column to the aggregate, not a
  * pass over 100 TB — and each referential check adds one anti-join
  * count. Output is a long-form report `(expectation, violations)`, one row per
  * expectation, 0 = clean.
  */
object DataQuality {

  sealed trait Check { def name: String }
  /** `col` must never be NULL. */
  final case class NotNull(col: String) extends Check {
    val name = s"not_null($col)"
  }
  /** `cols` form a key: violations = non-NULL-key rows beyond the first
    * per key. NULL-containing keys never violate (SQL UNIQUE semantics:
    * NULLs compare as never-equal) — and this is also exactly
    * `count(rows with key) − count(DISTINCT key)`, the restatement any
    * SQL oracle writes. */
  final case class Unique(cols: Seq[String]) extends Check {
    val name = s"unique(${cols.mkString(",")})"
  }
  /** `col` (when non-NULL) must lie in [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    val name = s"in_range($col,$lo,$hi)"
  }
  /** `col` (when non-NULL) must be one of `values`. */
  final case class InSet(col: String, values: Seq[String]) extends Check {
    val name = s"in_set($col)"
  }
  /** `col` (when non-NULL) must match `regex` (Java regex, `rlike`
    * semantics — unanchored unless the pattern anchors). */
  final case class Matches(col: String, regex: String) extends Check {
    val name = s"matches($col)"
  }
  /** Every non-NULL `col` value must exist in `parentCol` of `parent`
    * (foreign-key integrity). One left-anti join per check. */
  final case class RefIntegrity(col: String, parent: DataFrame,
      parentCol: String) extends Check {
    val name = s"ref_integrity($col)"
  }

  private def violationAgg(c: Check): Option[Column] = c match {
    case NotNull(col0) =>
      Some(sum(when(col(col0).isNull, 1L).otherwise(0L)))
    case Unique(cols0) =>
      // struct() is never NULL even over NULL fields, so a bare
      // count_distinct(struct(...)) would count NULL keys as values;
      // mask NULL-containing keys out of BOTH counts instead
      val anyNull = cols0.map(col(_).isNull).reduce(_ || _)
      Some(sum(when(anyNull, 0L).otherwise(1L)) -
        count_distinct(when(!anyNull, struct(cols0.map(col): _*))))
    case InRange(col0, lo, hi) =>
      Some(sum(when(col(col0).isNotNull &&
        (col(col0) < lo || col(col0) > hi), 1L).otherwise(0L)))
    case InSet(col0, vs) =>
      Some(sum(when(col(col0).isNotNull &&
        !col(col0).isin(vs: _*), 1L).otherwise(0L)))
    case Matches(col0, re) =>
      Some(sum(when(col(col0).isNotNull &&
        !col(col0).rlike(re), 1L).otherwise(0L)))
    case _: RefIntegrity => None
  }

  /** Run all `checks` against `df` → `(expectation, violations)` report. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val scanChecks = checks.flatMap(c => violationAgg(c).map(a => (c, a)))
    val scanPart = if (scanChecks.isEmpty) None else Some {
      val aggs = scanChecks.zipWithIndex.map { case ((_, a), i) =>
        coalesce(a, lit(0L)).as(s"v$i")
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      // long form via one explode of the 1-row aggregate
      val names = array(scanChecks.map { case (c, _) => lit(c.name) }: _*)
      one.select(posexplode(array(scanChecks.indices.map(i => col(s"v$i")): _*))
          .as(Seq("__i", "violations")))
        .select(element_at(names, col("__i") + 1).as("expectation"), col("violations"))
    }
    val refParts = checks.collect { case r @ RefIntegrity(c, parent, pc) =>
      df.select(col(c)).filter(col(c).isNotNull)
        .join(parent.select(col(pc).as(c)), Seq(c), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(r.name).as("expectation"), col("violations"))
    }
    (scanPart.toSeq ++ refParts).reduce(_ unionAll _)
  }

  /** Row-level quarantine routing — the counting report's structured-data
    * sibling of [[graft.sources.Ingest.readJsonlQuarantined]]: split `df`
    * into rows passing every row-local check and rows failing at least
    * one, the latter annotated with a deterministic `violated` reason
    * string (failed check names, name-sorted, ';'-joined — check names
    * themselves contain commas, e.g. `in_range(col,lo,hi)`, so ';' keeps
    * the evidence string unambiguously splittable downstream). Violating
    * rows are ROUTED with evidence, never silently dropped or merely
    * counted. One codegen predicate per check in a single scan; the two
    * sides are complementary filters over it. Shuffle-needing checks
    * (`Unique`, `RefIntegrity`) are rejected — their "violating rows"
    * need joins, not row predicates. */
  def quarantine(df: DataFrame, checks: Seq[Check]): (DataFrame, DataFrame) = {
    require(checks.nonEmpty, "need at least one check")
    require(!df.columns.contains("violated"),
      "input already has a `violated` column (re-quarantining routed " +
        "rows?) — rename or drop it first; silently overwriting it would " +
        "lose the prior evidence")
    val preds: Seq[(String, Column)] = checks.map {
      case c @ NotNull(col0) => c.name -> col(col0).isNull
      case c @ InRange(col0, lo, hi) =>
        c.name -> (col(col0).isNotNull && (col(col0) < lo || col(col0) > hi))
      case c @ InSet(col0, vs) =>
        c.name -> (col(col0).isNotNull && !col(col0).isin(vs: _*))
      case c @ Matches(col0, re) =>
        c.name -> (col(col0).isNotNull && !col(col0).rlike(re))
      case c => throw new IllegalArgumentException(
        s"quarantine() supports row-local checks only, got ${c.name}")
    }.sortBy(_._1)
    val violated = concat_ws(";",
      preds.map { case (n, p) => when(p, lit(n)) }: _*)
    val flagged = df.withColumn("violated", violated)
    (flagged.filter(col("violated") === "").drop("violated"),
      flagged.filter(col("violated") =!= ""))
  }

  /** Zero-extra-cost instrumentation: attach the row-local checks to an
    * existing action via `Dataset.observe`, so the QA report materializes
    * as a side effect of whatever job already runs (the write, the count)
    * — at 100 TB the difference between "quality-checked" and "scanned
    * twice". Read `observation.get` AFTER the action completes; metric
    * names are the check names. Only single-scan checks qualify:
    * `Unique` (distinct aggregate — disallowed inside observe) and
    * `RefIntegrity` (needs its own join) are rejected — run those
    * through [[run]]. */
  def observed(df: DataFrame, checks: Seq[Check],
      name: String = "graft_dq"): (DataFrame, org.apache.spark.sql.Observation) = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = checks.map {
      case c @ (_: NotNull | _: InRange | _: InSet | _: Matches) =>
        coalesce(violationAgg(c).get, lit(0L)).as(c.name)
      case c => throw new IllegalArgumentException(
        s"observed() supports single-scan checks only, got ${c.name}")
    }
    val obs = org.apache.spark.sql.Observation(name)
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** k-anonymity audit — the privacy gate a training-data pipeline runs
    * before releasing quasi-identified rows (pseudonymization, [[graft
    * .text.TextAnalysis.piiScan]]'s structural sibling): every combination
    * of the quasi-identifier columns must describe at least `k` rows, or
    * the rows in smaller groups are re-identifiable. One partial-
    * aggregating groupBy over the quasi-id key followed by a scalar
    * roll-up — two shuffles, the second of group-count rows only; no
    * driver-side state, so the audit runs at any corpus size.
    *
    * @return single row: n_groups, n_violating_groups (size < k),
    *         n_rows_at_risk (rows in violating groups), min_group_size */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2 (k=1 is vacuous), got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__gs"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("__gs") < k, 1L).otherwise(0L)).as("n_violating_groups"),
        coalesce(sum(when(col("__gs") < k, col("__gs"))), lit(0L))
          .as("n_rows_at_risk"),
        min(col("__gs")).as("min_group_size"))
  }

  /** Catalog-wide referential-integrity audit: every declared FK checked
    * in one pass — child rows with a fully non-NULL key, left-joined to
    * the distinct parent keys, counted checked/dangling in a single
    * aggregate (no nested-loop scalar joins; per FK one key-shuffle join,
    * prefilterable with the d9 bloom probe at 100 TB). The whole-database
    * version of [[RefIntegrity]]'s single check — the audit a pipeline
    * runs after every load, not per-column.
    *
    * @return one row per declared FK:
    *         (child_table, fk_columns, parent_table, n_checked, n_dangling) */
  def fkAudit(cat: graft.catalog.ParquetCatalog): DataFrame = {
    val perFk = cat.listTables().flatMap { t =>
      cat.foreignKeys(t).map { fk =>
        val nn = fk.columns.map(c => col(c).isNotNull).reduce(_ && _)
        val parentKeys = cat.table(fk.refTable)
          .select(fk.refColumns.map(col): _*)
          .toDF(fk.columns: _*).distinct()
          .withColumn("__hit", lit(1))
        cat.table(t).filter(nn)
          .join(parentKeys, fk.columns, "left")
          // coalesce: sum() over an empty relation (empty child table or
          // all-NULL FK column) is NULL, and a NULL dangling count reads
          // as "audit broken" where it means "nothing to check" — the
          // run() device at the violation aggregate
          .agg(count(lit(1)).as("n_checked"),
            coalesce(sum(when(col("__hit").isNull, 1L).otherwise(0L)),
              lit(0L)).as("n_dangling"))
          .select(lit(t).as("child_table"),
            lit(fk.columns.mkString(",")).as("fk_columns"),
            lit(fk.refTable).as("parent_table"),
            col("n_checked"), col("n_dangling"))
      }
    }
    require(perFk.nonEmpty, "the catalog declares no foreign keys")
    perFk.reduce(_.unionAll(_))
  }

  /** l-diversity audit, [[kAnonymity]]'s companion: a quasi-identifier
    * group can be large yet still leak if everyone in it shares the same
    * SENSITIVE value — each group must contain at least `l` distinct
    * sensitive values. Exact distinct-per-group is safe here because the
    * aggregation is keyed by the quasi-id (the distinct set lives inside
    * one group's aggregation buffer, bounded by the sensitive domain),
    * then a scalar roll-up — same two-shuffle shape as [[kAnonymity]].
    *
    * @return single row: n_groups, n_low_diversity_groups (distinct
    *         sensitive < l), n_rows_at_risk, min_diversity */
  def lDiversity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(!quasiCols.contains(sensitiveCol),
      "the sensitive column cannot be part of the quasi-identifier")
    require(l >= 2, s"l must be >= 2 (l=1 is vacuous), got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__gs"),
        count_distinct(col(sensitiveCol)).as("__div"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("__div") < l, 1L).otherwise(0L))
          .as("n_low_diversity_groups"),
        coalesce(sum(when(col("__div") < l, col("__gs"))), lit(0L))
          .as("n_rows_at_risk"),
        min(col("__div")).as("min_diversity"))
  }
}
