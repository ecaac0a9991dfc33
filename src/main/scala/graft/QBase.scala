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


/** Shared plumbing for the per-domain query registries ([[SparkEntry]]
  * assembles them): session conf pinning, table readers, the scratch
  * sink area, the [[QBase.Q]] query definition, and the cross-domain
  * two-band PNG test fixture (used by the multimodal queries and the
  * round-5 image-dup pipeline). Split out of the monolithic SparkEntry
  * in round 12 — the registry grew ~200 lines/round, and the Q case
  * class already carried everything a per-domain file needs. */
private[graft] object QBase {

  /** The driver's events table is written with nanosecond-precision parquet
    * timestamps, which Spark only reads via the nanos-as-long legacy conf —
    * a runtime-mutable SQL conf, set here defensively so queries work on
    * any session the driver hands us. [[events]] converts back to a real
    * timestamp column (microsecond floor). */
  private[graft] def nanosOk(s: SparkSession): SparkSession = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // oracle parity: DuckDB's epoch()/hour() are TZ-naive; pin the session
    // zone so unix_timestamp/hour/window agree on any driver-provided session
    s.conf.set("spark.sql.session.timeZone", "UTC")
    // parquet timestamps without isAdjustedToUTC (naive timestamp[us]) must
    // read as TIMESTAMP (LTZ, = the pinned UTC session zone), not
    // TIMESTAMP_NTZ — every downstream instant function (unix_micros,
    // window, unix_timestamp) takes LTZ, and with the session zone pinned
    // the wall-clock values match DuckDB's naive reading exactly
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    s
  }

  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame =
    nanosOk(s).read.parquet(s"$dir/$name.parquet")

  private[graft] def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integral `div`, not `/`: ns-epoch longs exceed 2^53, so double
        // division can shift the resulting microsecond by 1. `div`
        // truncates toward zero, which equals the microsecond floor only
        // for POST-1970 timestamps — the testdata contract (pre-1970
        // events would need floor division to match DuckDB)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }

  private[graft] def catalog(s: SparkSession, dir: String): ParquetCatalog =
    new ParquetCatalog(nanosOk(s), dir, ConstraintRegistry.testdata)

  // Scratch space for queries that materialize through a sink (s6 copy,
  // s7 schema cache, orc1), deleted recursively at JVM exit. (Deletion
  // can't happen inside the query — the returned plan still reads it.)
  // One scratch ROOT per JVM (single shutdown hook); sink queries write
  // under per-query subdirs, so a re-executed query overwrites its own
  // subdir instead of accumulating a fresh catalog-sized copy (and a
  // fresh hook thread) per execution — disk use within one long-lived
  // JVM is bounded by one copy per sink query.
  private[graft] lazy val scratchRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(root.toFile)
    }))
    root
  }

  private[graft] def scratchDir(name: String): String = {
    val dir = scratchRoot.resolve(name)
    java.nio.file.Files.createDirectories(dir)
    dir.toFile.getAbsolutePath
  }

  /** One query definition: Spark plan + optional DuckDB oracle SQL. */
  private[graft] final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])


  private[graft] def twoBandPngMedia(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    t(s, d, "nation").select(
        col("n_nationkey").cast("long").as("id"),
        (lit(4) + pmod(col("n_nationkey"), lit(5))).cast("int").as("w"),
        (lit(3) + pmod(col("n_regionkey"), lit(4))).cast("int").as("h"),
        pmod(col("n_nationkey") * 37, lit(256)).cast("int").as("r1"),
        pmod(col("n_nationkey") * 59, lit(256)).cast("int").as("g1"),
        pmod(col("n_nationkey") * 83, lit(256)).cast("int").as("b1"),
        pmod(col("n_nationkey") * 101, lit(256)).cast("int").as("r2"),
        pmod(col("n_nationkey") * 131, lit(256)).cast("int").as("g2"),
        pmod(col("n_nationkey") * 151, lit(256)).cast("int").as("b2"))
      .as[(Long, Int, Int, Int, Int, Int, Int, Int, Int)]
      .map { case (id, w, h, r1, g1, b1, r2, g2, b2) =>
        (id, Multimodal.encodeTwoBandPng(w, h, (r1, g1, b1), (r2, g2, b2)))
      }
      .toDF("media_id", "data")
  }

  /** Shared oracle CTE: the same two-band construction in closed form. */
  private[graft] val twoBandPngCte =
    """s AS (SELECT n_nationkey::BIGINT AS media_id,
        (4 + n_nationkey % 5)::INT AS width,
        (3 + n_regionkey % 4)::INT AS height,
        (n_nationkey * 37) % 256 AS r1, (n_nationkey * 59) % 256 AS g1,
        (n_nationkey * 83) % 256 AS b1, (n_nationkey * 101) % 256 AS r2,
        (n_nationkey * 131) % 256 AS g2, (n_nationkey * 151) % 256 AS b2
        FROM nation)"""

}
