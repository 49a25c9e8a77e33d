package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: the number of positions `i` where two
  * `array<bigint>` columns agree (`a[i] == b[i]`, over the common prefix
  * length) — the MinHash signature-agreement count. Codegen'd replacement
  * for the interpreted
  * `aggregate(zip_with(a,b,(x,y)=>if(x=y,1,0)), 0, +)` HOF pair, which
  * allocates an intermediate array per row on the LSH candidate-pair hot
  * path. Value-identical, so the DuckDB oracle needs no change.
  */
case class PositionalEqCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "positional_eq_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var c = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PositionalEqCount =
    copy(left = newLeft, right = newRight)
}

object PositionalEqCount {
  /** Positions where `a` and `b` agree, as a [[Column]]. */
  def eqCount(a: Column, b: Column): Column =
    ExpressionUtils.column(
      PositionalEqCount(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
