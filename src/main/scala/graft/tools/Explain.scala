package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: print formatted physical plans for selected queries —
  * `runMain graft.tools.Explain <sfDir> <query...>`. Used to check that
  * filters/projections reach the parquet scan (PushedFilters/ReadSchema),
  * small dimensions broadcast, and operators stay inside WholeStageCodegen.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    // Skip one-shot eager localCheckpoints during query CONSTRUCTION so
    // the printed plan is the real dataflow, not a post-checkpoint RDD
    // scan (graft.util.Checkpoints.eager; r14 verdict evidence gap).
    // Loop operators keep real checkpoints — their convergence depends on
    // them — so iterative queries still explain as their final round.
    // This property is explain-only: Bench/Verify never set it.
    sys.props("graft.explain.lazyPlans") = "true"
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
