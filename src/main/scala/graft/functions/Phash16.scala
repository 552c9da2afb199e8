package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `phash16(payload_hex)` → bigint: the whole 16-bit perceptual
  * fingerprint of a hex-encoded payload in ONE map-side expression.
  *
  * Semantics (mirrored term-for-term by the DuckDB oracle CTE in
  * [[graft.operators.Multimodal]]): slide a 4-byte window at stride 1
  * over the payload bytes (bytes past the end read as 0, so payloads
  * shorter than a window still fingerprint); mix each window's 32-bit
  * word to 16 bits with two Knuth-style multiplicative rounds and an
  * xor-fold — all arithmetic in non-negative int64, so the SQL replay
  * is exact:
  * {{{
  *   v  = b0·2^24 + b1·2^16 + b2·2^8 + b3
  *   h1 = (v · 49157) mod 2^31
  *   h2 = h1 xor (h1 div 2^15)
  *   h3 = (h2 · 40503) mod 2^31
  *   h  = (h3 div 2^15) mod 2^16
  * }}}
  * The fingerprint bit b is the MAJORITY vote of bit b over all window
  * hashes — flipping a few payload bytes flips a few votes, not the
  * fingerprint.
  *
  * This replaces a per-byte-offset `md5(substring(...))` explode + a
  * 16-column vote aggregation: one cryptographic hash per payload BYTE
  * made the fingerprint pass the dominant cost of the whole multimodal
  * fleet (and at corpus scale would dwarf the banded pair search it
  * feeds). Work is still ∝ payload bytes — the floor for any
  * content fingerprint — but per byte it is a handful of integer ops,
  * and the relation never inflates: scan in, scan out.
  */
case class Phash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"phash16 requires a string (hex) argument, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "phash16"

  override def nullSafeEval(hex: Any): Any =
    Phash16.fingerprint(hex.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h => s"graft.functions.Phash16.fingerprint($h)")

  override protected def withNewChildInternal(newChild: Expression): Phash16 =
    copy(child = newChild)
}

object Phash16 {
  private val Window = 4

  /** The interpreted/codegen-shared loop. Hex chars outside [0-9a-fA-F]
    * parse as 0 (the payloads are engine-written lowercase hex, so this
    * is unreachable in practice but keeps the function total).
    */
  def fingerprint(hex: UTF8String): Long = {
    // hex is ASCII, so UTF-8 bytes ARE the characters — read raw bytes
    val nBytes = hex.numBytes() / 2
    // one decode pass: byte i (0-based); windows then read array slots
    val bytes = new Array[Int](nBytes)
    var i = 0
    while (i < nBytes) {
      val hi = Character.digit(hex.getByte(2 * i).toChar, 16)
      val lo = Character.digit(hex.getByte(2 * i + 1).toChar, 16)
      bytes(i) = (Math.max(hi, 0) << 4) | Math.max(lo, 0)
      i += 1
    }
    def byteAt(j: Int): Long = if (j < nBytes) bytes(j).toLong else 0L
    val nWins = Math.max(1, nBytes - (Window - 1))
    val votes = new Array[Int](16)
    var s = 0
    while (s < nWins) {
      val v = (byteAt(s) << 24) | (byteAt(s + 1) << 16) |
        (byteAt(s + 2) << 8) | byteAt(s + 3)
      val h1 = (v * 49157L) % 2147483648L
      val h2 = h1 ^ (h1 / 32768L)
      val h3 = (h2 * 40503L) % 2147483648L
      val h = ((h3 / 32768L) % 65536L).toInt
      var b = 0
      while (b < 16) {
        if (((h >> b) & 1) == 1) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      s += 1
    }
    var fp = 0L
    var b = 0
    while (b < 16) {
      if (votes(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }
}
