package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}

/** Test-side bridge into the `private[sql]` codegen compiler: generate and
  * janino-compile every WholeStageCodegen stage of a physical plan,
  * returning each stage's max method bytecode size. A stage that fails to
  * compile (janino "Code grows beyond 64 KB") throws here — whereas at
  * runtime Spark silently falls back to interpreted execution, which is
  * exactly the regression this probe exists to turn into a test failure
  * (the round-6 PQ scoring projection did precisely that). */
object GraftCodegenProbe {
  /** (stage treeString-first-line, maxMethodCodeSize) per codegen stage. */
  def compileStages(plan: SparkPlan): Seq[(String, Int)] =
    plan.collectWithSubqueries { case w: WholeStageCodegenExec => w }.map { w =>
      val (_, code) = w.doCodeGen()
      val (_, stats) = CodeGenerator.compile(code)
      (w.child.nodeName, stats.maxMethodCodeSize)
    }
}
