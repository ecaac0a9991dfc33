package graft.sources

import org.apache.spark.sql.DataFrame

/** Shared sink-safety plumbing for every writer in this package. */
object Sinks {

  /** Refuse to write `outPath` when it is one of `df`'s own source paths:
    * `mode("overwrite")` onto the live input would race the scan and
    * Spark's self-overwrite detection is the only thing between the user
    * and data loss. One guard, used by every sink ([[Bucketing.compact]],
    * [[Ingest.viaOrc]], …) so a fix here covers them all. */
  def requireNotSourcePath(df: DataFrame, outPath: String): Unit = {
    val hconf = df.sparkSession.sessionState.newHadoopConf()
    def qualified(p: org.apache.hadoop.fs.Path) =
      p.getFileSystem(hconf).makeQualified(p)
    val outQ = qualified(new org.apache.hadoop.fs.Path(outPath))
    val srcPaths = df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(qualified)
          case _ => Seq.empty
        }
    }.flatten
    require(!srcPaths.contains(outQ),
      s"output path $outPath is a source path of the input — in-place " +
        "overwrite is unsupported; write to a sibling path and swap at " +
        "the storage layer")
  }
}
