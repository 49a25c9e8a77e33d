package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native Catalyst expression: `|A ∩ B|` for two SORTED (ascending),
  * duplicate-free `array<bigint>` columns, via a single merge pass — SURVEY
  * §4.4 / M7. Replaces `size(array_intersect(a, b))` on the set-similarity
  * join hot path: `array_intersect` builds a boxed hash set per row pair,
  * which dominated the O(n²-per-block) n-gram Jaccard bench queries. This
  * is a tight primitive loop inside whole-stage codegen — no allocation,
  * no boxing.
  *
  * Jaccard callers derive the union cardinality algebraically
  * (`|A∪B| = |A| + |B| − |A∩B|`, valid because inputs are sets), so the
  * `array_union` hash set disappears too. Semantics match the DuckDB
  * oracle's `len(list_intersect(...))` (set intersection cardinality)
  * exactly; the caller is responsible for pre-sorting with
  * `array_sort(array_distinct(...))` once per document, not per pair.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
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
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersectCount {
  /** `|a ∩ b|` as a [[Column]]; both inputs must be sorted + distinct. */
  def intersectCount(a: Column, b: Column): Column =
    ExpressionUtils.column(
      SortedLongIntersectCount(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
