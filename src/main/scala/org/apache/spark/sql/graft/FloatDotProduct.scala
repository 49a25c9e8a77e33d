package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the float-vector dot product — SURVEY
  * §4.4 / M7: the codegen'd replacement for the
  * `aggregate(zip_with(a,b,(x,y)=>x*y),0D,(s,x)=>s+x)` HOF formulation,
  * which Spark evaluates interpreted (per-element lambda dispatch +
  * boxing). On the O(n²) similarity pair queries the HOF path dominated
  * the bench; this expression is a tight unboxed loop inside whole-stage
  * codegen.
  *
  * Numerical contract: promotes each float element to double and folds
  * LEFT-TO-RIGHT — the exact IEEE op sequence of both the HOF formulation
  * and the DuckDB oracle (`list_aggregate(list_transform(...), 'sum')`),
  * so results are bit-identical and the oracle needs no change.
  *
  * Lives under `org.apache.spark.sql` because the Expression-to-Column
  * bridge (`classic.ExpressionUtils`) and `AbstractDataType` are
  * `private[sql]` — the standard technique for Spark extension libraries
  * built on Catalyst internals.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
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
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

object FloatDotProduct {
  /** Column-level entry point: `float_dot(a, b)` as a [[Column]]. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatDotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
