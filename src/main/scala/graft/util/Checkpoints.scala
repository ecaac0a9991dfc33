package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Explicit storage release for superseded `localCheckpoint` frames.
  *
  * Every iterate-to-fixpoint operator in this engine (k-core peel,
  * connected components, PageRank, label propagation) rebinds its loop
  * frame each round: `e = e2`. Without an explicit release the previous
  * round's checkpoint blocks stay in the block manager until the DRIVER
  * garbage-collects the old DataFrame and the async ContextCleaner gets
  * around to the removal — in local mode those blocks share the one heap
  * with execution memory, and the round-10 telemetry measured the cost:
  * kc1's official 30.0 s first pass carried 5,056 ms of GC against a
  * 169 ms-GC same-JVM retime at identical shuffle bytes, and the 30×
  * scale audit OOM'd an 8 GB heap on exactly these superseded blocks
  * (BENCH_DETAIL_r10.json, BENCH_NOTES.md). On a real cluster the same
  * leak wastes distributed storage memory proportional to round count.
  *
  * Contract: call ONLY on a frame whose data can never be re-read — a
  * localCheckpoint truncates lineage, so a released frame is
  * unrecomputable by design. The loop discipline is: materialize the new
  * round's checkpoint (eager), THEN release the previous round's.
  */
object Checkpoints {

  /** True when the process runs with `-Dgraft.explain.lazyPlans=true` —
    * set ONLY by [[graft.tools.Explain]] so plan dumps show the real
    * pre-checkpoint physical plan instead of a vacuous post-checkpoint
    * RDD scan (the r14 verdict's evidence gap for the eagerly-
    * materializing family: dsir1/2, er1, d3/d6/d8/dq7). Bench and Verify
    * never set it, so timed/verified semantics are untouched. */
  private[graft] def lazyPlans: Boolean =
    java.lang.Boolean.getBoolean("graft.explain.lazyPlans")

  /** Eagerly materialize a ONE-SHOT result frame (`localCheckpoint(true)`)
    * — or, under [[lazyPlans]], return the frame unchanged so its full
    * plan stays visible to explain. Use for terminal materializations
    * only; iterate-to-fixpoint loops must keep real `localCheckpoint`
    * calls (their convergence counts and [[release]] discipline depend on
    * actually materializing each round). */
  def eager(df: DataFrame): DataFrame =
    if (lazyPlans) df else df.localCheckpoint(true)

  /** Unpersisting a locally-checkpointed RDD logs a WARN ("lineage has
    * been truncated and cannot be recomputed") — here that is the whole
    * POINT (the contract above releases only unreachable frames), and a
    * 186-query sweep would emit hundreds of them. Suppression is SCOPED:
    * the logger (named for the concrete RDD class) is dropped to ERROR
    * only around the unpersist call and restored after, so legitimate
    * truncated-lineage warnings from unrelated unpersists elsewhere
    * (Bench's between-query sweep, ShufProbe) still surface. */
  private def quietly[A](body: => A): A = {
    val name = "org.apache.spark.rdd.MapPartitionsRDD"
    val prev =
      try Option(org.apache.logging.log4j.LogManager.getLogger(name).getLevel)
      catch { case _: Throwable => None }
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      name, org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () }
    try body
    finally prev.foreach { lvl =>
      try org.apache.logging.log4j.core.config.Configurator.setLevel(name, lvl)
      catch { case _: Throwable => () }
    }
  }

  /** Unpersist the storage blocks behind `df`, which MUST be a bare
    * checkpoint frame — its analyzed plan a single `LogicalRDD` leaf,
    * exactly what `localCheckpoint()` returns. Anything else (a
    * projection/join DERIVED from a checkpoint) throws: unpersisting the
    * leaves under a derived frame would release blocks the caller still
    * owns, and a truncated-lineage checkpoint cannot be recomputed, so
    * that misuse must fail fast rather than corrupt caller state.
    * Non-blocking: the block-manager removal proceeds asynchronously, but
    * the RDD leaves the persistent-RDD registry immediately, so storage
    * accounting (and [[org.apache.spark.SparkContext#getPersistentRDDs]])
    * reflects the release at once. */
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: LogicalRDD => quietly(lr.rdd.unpersist(blocking = false))
    case other => throw new IllegalArgumentException(
      "Checkpoints.release expects a bare checkpoint frame (a single " +
        s"LogicalRDD leaf); got ${other.nodeName} — releasing a derived " +
        "frame would unpersist blocks the caller still owns")
  }
}
