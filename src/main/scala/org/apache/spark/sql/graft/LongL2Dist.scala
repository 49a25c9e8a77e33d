package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native Catalyst expression for integer squared-L2 distance over
  * `array<bigint>` — the codegen replacement for the
  * `aggregate(zip_with(a,b,(x,y)=>(x-y)*(x-y)), 0L, (acc,v)=>acc+v)` HOF
  * formulation (guide §4: HOF lambdas evaluate interpreted, per-element
  * dispatch + boxing), which dominated the PQ gate's task time.
  *
  * Numerical contract: Long subtract/multiply/add per element — exact
  * integer arithmetic, so any fold order equals the HOF's left fold and
  * the DuckDB oracle's `list_sum`; results are bit-identical. Inputs are
  * the gates' quantized vectors (equal length, no null elements) — like
  * [[FloatDotProduct]], the loop runs to the SHORTER length and does not
  * null-propagate per element, which is indistinguishable on this domain.
  */
case class LongL2Dist(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_l2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $d = $a.getLong($i) - $b.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongL2Dist =
    copy(left = newLeft, right = newRight)
}

object LongL2Dist {
  /** Column-level entry point: `long_l2(a, b)` as a [[Column]]. */
  def dist(a: Column, b: Column): Column =
    ExpressionUtils.column(
      LongL2Dist(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Codegen integer dot product over `array<int>` — replaces the SQ8
  * gate's `aggregate(zip_with(a,b,(x,y)=>(x*y).cast(long)))` HOF. Each
  * element multiplies in INT (the HOF's exact op — the gates' quantized
  * values are within ±127, so the int product never overflows) and
  * widens to Long for the sum; exact integer arithmetic keeps any fold
  * order bit-identical to the HOF and the DuckDB oracle.
  */
case class IntDotLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.IntegerType),
      ArrayType(org.apache.spark.sql.types.IntegerType))
  override def dataType: DataType = LongType
  override def prettyName: String = "int_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += (x.getInt(i) * y.getInt(i)).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) ($a.getInt($i) * $b.getInt($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotLong =
    copy(left = newLeft, right = newRight)
}

object IntDotLong {
  /** Column-level entry point: `int_dot(a, b)` as a [[Column]]. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      IntDotLong(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
