package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for UPC-A check-digit validation
  * (the reference's `BarcodeValidator`, batch_processor.py:417-423):
  * 12 digits, 3·(sum of odd positions) + (sum of even positions) +
  * check digit ≡ 0 (mod 10).
  *
  * A UnaryExpression with `doGenCode`, so it inlines into whole-stage
  * codegen as a branch-free byte loop over the UTF8String — no UDF
  * boxing, no string allocation, stays inside the generated stage.
  * Registered as SQL function `upc_valid` by
  * [[graft.plans.GraftExtensions]].
  */
case class UpcValid(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"upc_valid requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "upc_valid"

  override protected def nullSafeEval(input: Any): Any =
    UpcValid.check(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val sum = ctx.freshName("sum")
      val ok = ctx.freshName("ok")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |${ev.value} = false;
         |if ($c.numBytes() == 12) {
         |  byte[] $bytes = $c.getBytes();
         |  int $sum = 0;
         |  boolean $ok = true;
         |  for (int $i = 0; $i < 12; $i++) {
         |    int $d = $bytes[$i] - 48;
         |    if ($d < 0 || $d > 9) { $ok = false; break; }
         |    $sum += ($i % 2 == 0 && $i < 11) ? 3 * $d : $d;
         |  }
         |  ${ev.value} = $ok && $sum % 10 == 0;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UpcValid =
    copy(child = newChild)
}

object UpcValid {
  /** Interpreted twin of the generated code (eval path / unit tests). */
  def check(s: UTF8String): Boolean = {
    if (s.numBytes() != 12) return false
    val b = s.getBytes
    var sum = 0
    var i = 0
    while (i < 12) {
      val d = b(i) - 48
      if (d < 0 || d > 9) return false
      sum += (if (i % 2 == 0 && i < 11) 3 * d else d)
      i += 1
    }
    sum % 10 == 0
  }
}
