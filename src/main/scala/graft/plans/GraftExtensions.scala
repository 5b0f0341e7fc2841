package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.{Deduplicate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY.md §7.3 deliberate addition (b), documented
  * extension point): collapse directly-nested `Deduplicate` nodes with
  * identical key sets. `dropDuplicates(keys)` is idempotent, and upsert
  * pipelines that compose library ops (e.g. a raw-table LWW dedup feeding
  * a defensive dedup in a downstream writer) can stack two identical
  * dedups. Removing the inner node at analysis saves a full hash-aggregate
  * pass over the data (the outer dedup reuses the single exchange either
  * way), and keeps the plan clean before the optimizer rewrites
  * Deduplicate into Aggregate.
  *
  * Safety: only fires when the key attribute-id sets are EQUAL — the
  * outer dedup then keeps exactly one row per key group either way (which
  * row is unspecified by dropDuplicates semantics in both plans).
  */
object CollapseDeduplicate extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case outer @ Deduplicate(outerKeys, inner @ Deduplicate(innerKeys, _))
        if outerKeys.map(_.exprId).toSet == innerKeys.map(_.exprId).toSet =>
      outer.copy(child = inner.child)
  }
}

/** Session-extension entry point. Two installation routes:
  *
  *  - at session build (new JVMs / spark-submit):
  *    `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  *  - on a live session (tests, notebooks): `GraftExtensions.install(spark)`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // post-hoc RESOLUTION rule, not an optimizer rule: the optimizer
    // rewrites Deduplicate → Aggregate in its Replace-Operators batch,
    // before user-injected optimizer rules ever see the plan
    e.injectPostHocResolutionRule(_ => CollapseDeduplicate)
    e.injectFunction(graft.functions.SimHash64Expr.descriptor)
    e.injectFunction(graft.functions.BpeEncodeExpr.descriptor)
    e.injectFunction(graft.functions.BloomMightContain.descriptor)
    e.injectFunction(graft.functions.NfcNormalize.descriptor)
    e.injectFunction(graft.functions.SortedDotExpr.descriptor)
    graft.functions.SqlFunctions.all.foreach(e.injectFunction)
  }
}

object GraftExtensions {
  /** Live-session install: registers the SQL functions. (The analyzer rule
    * can only be attached at session build via `spark.sql.extensions` —
    * a live session's analyzer is already constructed.) */
  def install(spark: SparkSession): Unit = {
    (graft.functions.SimHash64Expr.descriptor +:
        graft.functions.BpeEncodeExpr.descriptor +:
        graft.functions.BloomMightContain.descriptor +:
        graft.functions.NfcNormalize.descriptor +:
        graft.functions.SortedDotExpr.descriptor +:
        graft.functions.SqlFunctions.all)
      .foreach { case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
      }
  }
}
