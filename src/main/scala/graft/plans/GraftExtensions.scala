package graft.plans

import graft.functions.NormalizeEpochMillis
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: strength-reduce the SQL-expressible P3 `when`-chain
  * (emitted by [[graft.cdc.ops.Normalize.commitMsLong]]) into the native
  * codegen'd [[NormalizeEpochMillis]]. The match is anchored on the exact
  * unit-heuristic shape — the three threshold literals, the millis
  * passthrough branch, the ×1000 seconds branch, and the identity else —
  * so it cannot misfire on unrelated CaseWhens. Results are bit-identical
  * (thresholds imply v > 0 in the division branch, where floorDiv equals
  * the chain's exact decimal division).
  */
object EpochNormalizeStrengthReduction extends Rule[LogicalPlan] {
  private val NsT = Literal(100000000000000L)
  private val MsT = Literal(100000000000L)
  private val SecT = Literal(1000000000L)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case CaseWhen(Seq(
          (IsNull(v1), Literal(null, _)),
          (GreaterThan(v2, NsT), _),
          (GreaterThan(v3, MsT), passMs),
          (GreaterThan(v4, SecT), Multiply(v5, Literal(1000L, _), _))),
        Some(passElse))
        if v1.semanticEquals(v2) && v1.semanticEquals(v3) && v1.semanticEquals(v4) &&
          v1.semanticEquals(v5) && v1.semanticEquals(passMs) && v1.semanticEquals(passElse) =>
      NormalizeEpochMillis(v1)
  }
}

/** Session extensions: `normalize_epoch_millis` SQL function + the
  * strength-reduction rule. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("normalize_epoch_millis"),
      new ExpressionInfo(classOf[NormalizeEpochMillis].getName, "normalize_epoch_millis"),
      (children: Seq[Expression]) => NormalizeEpochMillis(children.head)))
    ext.injectOptimizerRule(_ => EpochNormalizeStrengthReduction)
  }
}
