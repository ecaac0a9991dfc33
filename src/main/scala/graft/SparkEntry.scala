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
import graft.text.TextAnalysis

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY §2 (plus the training-data-pipeline
  * additions) is registered here as a named query over the driver test
  * tables, with matching DuckDB oracle SQL where SQL-expressible.
  * Column names/types are aligned on both sides (the driver's compare
  * sorts columns by name and hashes values); floating aggregates are
  * rounded identically on both sides; every query carries an ORDER BY over
  * its full output column list so row order is deterministic under any
  * comparison scheme.
  */
object SparkEntry {
  import QBase.Q

  private val all: Seq[Q] =
    QueriesCore.all ++ QueriesML.all ++ QueriesDedup.all ++
      QueriesText.all ++ QueriesTemporal.all ++ QueriesAnalytics.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full build slice — catalog → row ids → FK edge joins → reverse
    * edges → graph statistics. */
  def entry(spark: SparkSession): DataFrame =
    QueriesCore.graphStats(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (seeded-random and hash-function-defined pipelines). */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
