package graft.core

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Expression, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.functions.expressions.ArrayIntersectCount

/** Optimizer rule: `size(array_intersect(a, b))` on string arrays →
  * [[ArrayIntersectCount]]. The builtin pair materializes the
  * intersection ARRAY (allocation + copy per row) only to take its
  * length; the custom expression counts matches in one hash-probe pass
  * and allocates nothing. Semantics are identical by construction —
  * set-intersection counting with array_intersect's exact null
  * treatment (a null element counts once iff present on both sides;
  * ExpressionsSpec pins the equivalence on fixture pairs) — and the
  * rewrite is gated to `legacySizeOfNull = false` (the default), since
  * the legacy form returns -1 where the expression returns null.
  *
  * Registered through [[GraftExtensions]], so a plain-SQL user writing
  * the builtin composition gets the codegen'd counting plan with no
  * API change — the standard extension-point division of labor:
  * expressions for new scalars, a Rule for recognizing rewritable
  * builtin shapes.
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {

  private def isStringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a, b), false)
          if isStringArray(a) && isStringArray(b) =>
        ArrayIntersectCount(a, b)
    }
}
