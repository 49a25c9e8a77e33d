package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** Thresholded variant of [[SortedLongIntersectCount]]: returns `|A ∩ B|`
  * when it can still satisfy `den·|A∩B| >= num·min(|A|,|B|)`, and bails
  * with −1 the moment the bound becomes unreachable
  * (`c + remaining < num/den·min`). For a containment-style predicate the
  * result is EXACT: −1 is returned only for pairs that cannot pass the
  * threshold, and those are filtered out anyway — the early exit skips the
  * tail of the merge on every non-qualifying pair, which is almost all of
  * them in an all-pairs similarity join.
  */
case class SortedLongIntersectAtLeast(left: Expression, right: Expression, num: Int, den: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(num > 0 && den > 0, "threshold must be positive")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_at_least"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val need = num.toLong * math.min(nx, ny) // den*c must reach this
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      if (den.toLong * (c + math.min(nx - i, ny - j)) < need) return -1
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    if (den.toLong * c < need) -1 else c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val need = ctx.freshName("need")
      val rem = ctx.freshName("rem")
      val out = ctx.freshName("out")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |final long $need = ${num}L * java.lang.Math.min($nx, $ny);
         |int $i = 0; int $j = 0; int $c = 0;
         |int $out = -1;
         |while ($i < $nx && $j < $ny) {
         |  final int $rem = java.lang.Math.min($nx - $i, $ny - $j);
         |  if (${den}L * ($c + $rem) < $need) { break; }
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |if (${den}L * $c >= $need) { $out = $c; }
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectAtLeast =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersectAtLeast {
  /** `|a ∩ b|` if `|a∩b| >= (num/den)·min(|a|,|b|)` else −1; inputs sorted
    * + distinct. */
  def intersectAtLeast(a: Column, b: Column, num: Int, den: Int): Column =
    ExpressionUtils.column(SortedLongIntersectAtLeast(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), num, den))
}
