package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils, SparkSession, Strategy}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native AS-OF join — SURVEY §2C C14 / §4.4 M7 option (c): a whole-operator
  * extension (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`) for the
  * one point-in-time operator Spark has no built-in for. For every left row
  * it returns the LAST right row of the same key with `rightTs <= leftTs`
  * (ties on ts broken by the greatest `rightTie`), or nulls (left-outer).
  *
  * Physical shape is the sort-merge-join one: both children hash-clustered
  * on the key (`ClusteredDistribution`, so EnsureRequirements plants
  * co-partitioned exchanges exactly as for SortMergeJoin, and AQE coalesces
  * both sides consistently), each sorted by (key, ts[, tie]); execution is
  * a single forward merge pass per partition — no state beyond one buffered
  * row, no per-key grouping materialization. At 100 TB this is one shuffle
  * per side and O(n+m) per partition, strictly better than the
  * window+filter composition (`q_join_asof`) which shuffles the union and
  * sorts whole groups.
  *
  * The window formulation stays in the suite as the semantic witness: the
  * gate query `q_join_asof_native` must hash-match the same oracle SQL.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Expression,
    toleranceMicros: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Expression,
    toleranceMicros: Option[Long] = None) extends BinaryExecNode {

  // tolerance compares ts values numerically: timestamps are Long
  // microseconds internally, integral types are themselves — anything
  // else cannot take a tolerance
  require(toleranceMicros.isEmpty || (leftTs.dataType match {
    case org.apache.spark.sql.types.TimestampType
       | org.apache.spark.sql.types.TimestampNTZType
       | org.apache.spark.sql.types.LongType
       | org.apache.spark.sql.types.IntegerType => true
    case _ => false
  }), s"as-of tolerance requires a timestamp/integral ts column, got ${leftTs.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
        SortOrder(rightTie, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  private def toMicros(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue()
    case i: java.lang.Integer => i.longValue()
    case other => sys.error(s"non-numeric as-of ts value: $other")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val tol = toleranceMicros
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val rightWidth = right.output.size
    val outAttrs = output
    val leftOut = left.output
    val rightOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      // input schema must mark the right side nullable: unmatched left rows
      // pair with an all-null row, and a non-nullable BoundReference would
      // skip the null check and read garbage zeros
      val proj = UnsafeProjection.create(outAttrs, leftOut ++ rightOut.map(_.withNullability(true)))
      val rBuf = rIter.buffered
      // one buffered candidate: the last right row seen for `matchKey`
      // with ts <= the current left ts (right rows are consumed at most
      // once — the merge is a single forward pass)
      var matchKey: Any = null
      var matchRow: InternalRow = null
      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTsB.eval(lRow)
        // left keys are non-decreasing: a buffered match for a previous key
        // can never apply again
        if (matchRow != null && (lk == null || keyOrd.compare(matchKey, lk) != 0)) {
          matchRow = null; matchKey = null
        }
        if (lk != null) {
          var advance = true
          while (advance && rBuf.hasNext) {
            val rk = rKeyB.eval(rBuf.head)
            val kc = if (rk == null) -1 else keyOrd.compare(rk, lk)
            if (kc < 0) {
              // behind every remaining left key (left is sorted too) — drop
              rBuf.next()
            } else if (kc == 0) {
              val rt = rTsB.eval(rBuf.head)
              if (rt == null) {
                rBuf.next() // null ts sorts first and can never satisfy <=
              } else if (lt != null && tsOrd.compare(rt, lt) <= 0) {
                matchKey = lk
                matchRow = rBuf.next().copy()
              } else {
                advance = false // this and later right rows are in the future
              }
            } else {
              advance = false // right ran ahead to a later key
            }
          }
        }
        // tolerance: the buffered candidate is the MOST RECENT right row
        // <= lt, so if it is older than the bound no other row qualifies —
        // emitting null here is exactly merge_asof(tolerance=...) semantics
        val withinTol = matchRow != null && tol.forall { t =>
          lt != null && {
            val mt = rTsB.eval(matchRow)
            mt != null && toMicros(lt) - toMicros(mt) <= t
          }
        }
        proj(joined(lRow, if (withinTol) matchRow else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to its exec (injected via
  * [[GraftExtensions]], or applied with `spark.experimental.extraStrategies`).
  */
object AsOfJoinStrategy extends Strategy {
  import org.apache.spark.sql.execution.SparkPlan
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie, tol) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {
  /** Left-outer as-of join: for each `left` row, the last `right` row with
    * equal key and `rightTs <= leftTs` (ties by greatest `rightTie`).
    * Column names must not collide across sides.
    */
  /** As-of join with a match-staleness bound (pandas
    * `merge_asof(tolerance=...)` parity): a candidate older than
    * `toleranceMicros` before the left ts yields nulls instead. The merge
    * pass is unchanged — tolerance filters at emission, since the
    * buffered candidate is already the most recent qualifying row.
    */
  def join(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTs: Column, rightTs: Column,
      rightTie: Column,
      toleranceMicros: Option[Long]): DataFrame = {
    val spark = left.sparkSession.asInstanceOf[SparkSession]
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        AsOfJoinStrategy +: spark.experimental.extraStrategies
    }
    val plan = AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      ExpressionUtils.expression(leftKey), ExpressionUtils.expression(rightKey),
      ExpressionUtils.expression(leftTs), ExpressionUtils.expression(rightTs),
      ExpressionUtils.expression(rightTie), toleranceMicros)
    Dataset.ofRows(spark, plan)
  }

  def join(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTs: Column, rightTs: Column,
      rightTie: Column): DataFrame =
    join(left, right, leftKey, rightKey, leftTs, rightTs, rightTie, None)
}
