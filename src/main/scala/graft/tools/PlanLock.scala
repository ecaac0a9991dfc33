package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan fingerprint lock: a committed census of every registered
  * query's plan-operator multiset (`PLANS.lock`), asserted by
  * PlanQualitySpec. The cartesian/window/nested-loop sweeps catch KNOWN
  * anti-patterns; the lock catches everything else — a broadcast join
  * silently flipping to sort-merge, an extra Exchange sneaking into a
  * pipeline, a codegen stage splitting — as a diff against the reviewed
  * shape instead of a mystery slowdown at scale.
  *
  * Regenerate after an INTENTIONAL plan change with
  * `sbt "runMain graft.tools.PlanLock"` and review the lock diff like any
  * other code change; the diff IS the plan review.
  */
object PlanLock {

  val LockPath = "PLANS.lock"

  /** Sorted `Class=count` multiset of the plan's node classes — stable
    * across partition counts and data scale (classes, not sizes), built
    * with AQE off so the static shape is what's recorded. */
  def fingerprint(p: SparkPlan): String = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    p.foreach { n =>
      val k = n.getClass.getSimpleName
      counts(k) = counts.getOrElse(k, 0) + 1
    }
    counts.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(",")
  }

  def fingerprints(spark: SparkSession, sfDir: String): Seq[(String, String)] = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fingerprint(fn(spark, sfDir).queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lines = fingerprints(spark, sfDir).map { case (n, f) => s"$n: $f" }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(LockPath),
      lines.mkString("", "\n", "\n"))
    println(s"[planlock] wrote ${lines.size} fingerprints to $LockPath")
    spark.stop()
  }
}
