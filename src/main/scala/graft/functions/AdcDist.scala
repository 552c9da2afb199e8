package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** `adc_dist6(codes, table)` → bigint: one product-quantized vector's
  * ASYMMETRIC distance to a query, computed array-at-a-time from the
  * query's flattened ADC lookup table.
  *
  * `codes` is the vector's M subspace codes (array<int>, m-ordered);
  * `table` is the query's M×Ks codeword-distance table flattened in
  * (m, code) order, so subspace m's entry for code c sits at
  * `m·Ks + c` (Ks is inferred as `table.length / codes.length`). The
  * result is the 10⁶-scaled integer term sum
  * Σ_m round(table[m·Ks + codes[m]] · 10⁶) — round in Spark's
  * `round(x, 0)` semantics (shared [[Sq8.round0]]) so the DuckDB
  * oracle's per-term CAST(round(dsub·1e6, 0) AS BIGINT) replays it
  * exactly, and the sum is order-free integer arithmetic (the repo's
  * BM25 float discipline; the previous double-sum matched the oracle
  * only because these magnitudes happened to sum stably).
  *
  * This replaces the M×-per-vector exploded (m, code) equi-join + a
  * (query, vector) hash re-aggregation: the ADC scan becomes a pure
  * map over candidate rows — the FAISS scan shape, where the hot loop
  * reads one code array and one resident table.
  */
case class AdcDist6(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"adc_dist6 requires (array<int> codes, array<double> table), got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_dist6"

  override def nullSafeEval(codes: Any, table: Any): Any =
    AdcDist6.dist(codes.asInstanceOf[ArrayData], table.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val res = ctx.freshName("adcRes")
      s"""
         |Object $res = graft.functions.AdcDist6.dist($c, $t);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $res).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDist6 =
    copy(left = newLeft, right = newRight)
}

object AdcDist6 {
  /** Interpreted twin of the generated loop. Null on nulls, a table
    * length that is not a positive multiple of the code count, or an
    * out-of-range code — a malformed model must surface as null, not
    * a wrong distance.
    */
  def dist(codes: ArrayData, table: ArrayData): Any = {
    val m = codes.numElements()
    val n = table.numElements()
    if (m == 0 || n == 0 || n % m != 0) return null
    val ks = n / m
    var s = 0L
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) return null
      val c = codes.getInt(i)
      if (c < 0 || c >= ks) return null
      val idx = i * ks + c
      if (table.isNullAt(idx)) return null
      s += Sq8.round0(table.getDouble(idx) * 1000000).toLong
      i += 1
    }
    s
  }
}
