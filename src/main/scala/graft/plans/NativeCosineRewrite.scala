package graft.plans

import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.expressions.CosineSimilarity

/** Optimizer rule: rewrite the kernel-UDF spelling of cosine
  * similarity ([[graft.operators.Similarity.cosine]], named
  * `graft_cosine_kernel`) into the native codegen'd
  * [[CosineSimilarity]] expression. Same math bit-for-bit (both fold
  * float→double left-to-right), but the native expression inlines
  * into whole-stage codegen instead of a UDF dispatch with
  * ArrayData↔Seq conversion per call.
  *
  * This is the library's one `Rule[LogicalPlan]` — kept deliberately
  * narrow per SURVEY §4.1 (the reference has no optimizer; Catalyst
  * covers parity, and custom rules are reserved for rewrites built-ins
  * cannot express). Inject via
  * `spark.sql.extensions=graft.expressions.GraftExtensions` or
  * `spark.experimental.extraOptimizations ++= Seq(NativeCosineRewrite)`
  * on a live session.
  */
object NativeCosineRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case u: ScalaUDF
          if u.udfName.contains("graft_cosine_kernel") && u.children.length == 2 =>
        CosineSimilarity(u.children.head, u.children(1))
    }
}
