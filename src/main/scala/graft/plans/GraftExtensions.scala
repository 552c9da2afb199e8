package graft.plans

import graft.functions.{BottomKByKey, DotProduct, UpcValid}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension wiring for the engine's native pieces:
  *  - SQL function `upc_valid` → the codegen'd [[UpcValid]] expression;
  *  - SQL function `vec_dot` → the codegen'd [[DotProduct]] expression;
  *  - the [[LevenshteinPrefilter]] optimizer rule;
  *  - the [[AsOfJoinStrategy]] planner strategy (native merge as-of
  *    join for [[AsOfJoinPlan]] nodes).
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("upc_valid"),
      new ExpressionInfo(classOf[UpcValid].getName, "upc_valid"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        UpcValid(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("bottom_k_by_key"),
      new ExpressionInfo(classOf[BottomKByKey].getName, "bottom_k_by_key"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val k = exprs(2) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"bottom_k_by_key: k must be an integer literal, got $other")
        }
        BottomKByKey(exprs(0), exprs(1), k)
      }))
    ext.injectOptimizerRule(_ => LevenshteinPrefilter)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
