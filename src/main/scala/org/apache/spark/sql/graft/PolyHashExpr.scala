package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native (codegen) form of `graft.functions.TextHash.polyHash` — the
  * polynomial rolling hash `fold(h*31 + code(ch)) mod P` that keys every
  * sampler, fingerprint, and shingle signature.
  *
  * The HOF formulation (`aggregate(filter(split(s, "")), ...)`) is exact
  * and cross-engine-checkable but INTERPRETED: per character it allocates
  * a 1-char string (regex split), re-encodes it, and walks a lambda chain
  * — measured as the costliest map in the dedup family (the signature
  * build exists to amortize it). This expression computes the identical
  * value in one unboxed loop over the UTF8String's bytes, inside
  * whole-stage codegen.
  *
  * EXACT-EQUIVALENCE argument (pinned by PolyHashExprSpec): `split(s, "")`
  * pieces are whole CODEPOINTS (Java regex never splits a supplementary
  * character; the filter drops the trailing empty piece) and Spark 4's
  * `ascii(piece)` returns the piece's full first codepoint (233 for é,
  * 128512 for 😀 — probed, not assumed). Decoding each codepoint straight
  * from the already-valid UTF-8 bytes therefore reproduces the fold
  * bit-for-bit on any input Spark strings can hold.
  */
case class PolyHashExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PolyHashExpr.hashBytes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.PolyHashExpr$$.MODULE$$.hashBytes($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

object PolyHashExpr {
  private val P = 1000000007L

  /** The fold, decoding UTF-8 codepoints in place. */
  def hashBytes(s: UTF8String): Long = {
    val n = s.numBytes()
    var acc = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xFF
      var cp = b
      var len = 1
      if (b >= 0x80) {
        if ((b & 0xE0) == 0xC0) { len = 2; cp = b & 0x1F }
        else if ((b & 0xF0) == 0xE0) { len = 3; cp = b & 0x0F }
        else { len = 4; cp = b & 0x07 }
        var j = 1
        while (j < len && i + j < n) {
          cp = (cp << 6) | (s.getByte(i + j) & 0x3F)
          j += 1
        }
      }
      acc = (acc * 31L + cp) % P
      i += len
    }
    acc
  }

  def column(c: Column): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(
      PolyHashExpr(org.apache.spark.sql.classic.ExpressionUtils.expression(c)))
}
