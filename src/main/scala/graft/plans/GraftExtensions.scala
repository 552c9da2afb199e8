package graft.plans

import graft.functions.{AdcDist6, BottomKByKey, DotProduct, Phash16, Simhash64Agg, Sq8Dist, Sq8Encode, UpcValid}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

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

  private def requireArity(name: String, exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n) throw new IllegalArgumentException(
      s"$name expects $n arguments, got ${exprs.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("upc_valid"),
      new ExpressionInfo(classOf[UpcValid].getName, "upc_valid"),
      (exprs: Seq[Expression]) => {
        requireArity("upc_valid", exprs, 1)
        UpcValid(exprs.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (exprs: Seq[Expression]) => {
        requireArity("vec_dot", exprs, 2)
        DotProduct(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("bottom_k_by_key"),
      new ExpressionInfo(classOf[BottomKByKey].getName, "bottom_k_by_key"),
      (exprs: Seq[Expression]) => {
        requireArity("bottom_k_by_key", exprs, 3)
        // any statically-evaluable integral k (10, 10L, CAST(10 AS INT), …)
        val k = exprs(2) match {
          case e if e.foldable &&
              Seq(ByteType, ShortType, IntegerType, LongType).contains(e.dataType) =>
            e.eval() match {
              case n: Number if n.longValue() >= 1 && n.longValue() <= Int.MaxValue =>
                n.intValue()
              case bad => throw new IllegalArgumentException(
                s"bottom_k_by_key: k must be a positive integer, got $bad")
            }
          case other => throw new IllegalArgumentException(
            s"bottom_k_by_key: k must be a foldable integral expression, got $other")
        }
        BottomKByKey(exprs(0), exprs(1), k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("adc_dist6"),
      new ExpressionInfo(classOf[AdcDist6].getName, "adc_dist6"),
      (exprs: Seq[Expression]) => {
        requireArity("adc_dist6", exprs, 2)
        AdcDist6(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("phash16"),
      new ExpressionInfo(classOf[Phash16].getName, "phash16"),
      (exprs: Seq[Expression]) => {
        requireArity("phash16", exprs, 1)
        Phash16(exprs.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("sq8_enc"),
      new ExpressionInfo(classOf[Sq8Encode].getName, "sq8_enc"),
      (exprs: Seq[Expression]) => {
        requireArity("sq8_enc", exprs, 3)
        Sq8Encode(exprs(0), exprs(1), exprs(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("sq8_dist"),
      new ExpressionInfo(classOf[Sq8Dist].getName, "sq8_dist"),
      (exprs: Seq[Expression]) => {
        requireArity("sq8_dist", exprs, 4)
        Sq8Dist(exprs(0), exprs(1), exprs(2), exprs(3))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[Simhash64Agg].getName, "simhash64"),
      (exprs: Seq[Expression]) => {
        requireArity("simhash64", exprs, 1)
        Simhash64Agg(exprs.head)
      }))
    // Spark's own bloom-filter sketch pair (the machinery behind
    // runtime row-level filtering), surfaced as callable functions so
    // operators can build EXPLICIT semi-join prefilters: aggregate the
    // small side's keys into a bloom (mergeable, partial-aggregated),
    // ship it as a scalar subquery, and drop non-candidate rows
    // map-side before a shuffle. `bloom_agg(xxhash64(k)[, n_items[,
    // n_bits]])` → binary; `bloom_contains(bf, xxhash64(k))` → bool.
    ext.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_agg"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c)       => new BloomFilterAggregate(c)
        case Seq(c, n)    => new BloomFilterAggregate(c, n)
        case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
        case other => throw new IllegalArgumentException(
          s"bloom_agg expects 1-3 arguments, got ${other.length}")
      }))
    ext.injectFunction((
      new FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "bloom_contains"),
      (exprs: Seq[Expression]) => {
        requireArity("bloom_contains", exprs, 2)
        BloomFilterMightContain(exprs(0), exprs(1))
      }))
    ext.injectOptimizerRule(_ => LevenshteinPrefilter)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
