package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of the library's native Catalyst expressions (SURVEY
  * §4.4 / M7): `float_dot`, `sorted_intersect_count`,
  * `positional_eq_count`, and `poly_hash` become plain SQL functions, so
  * `spark.sql("...")` users get the same codegen'd hot paths as the
  * DataFrame API.
  *
  * Two entry points, same registrations:
  *  - [[GraftExtensions]] for the declarative route
  *    (`spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`),
  *    the standard way a Spark extension library ships;
  *  - [[GraftFunctions.register]] for an already-running session (used by
  *    the gate query so it works on any session the driver builds).
  */
object GraftFunctions {

  private def entries: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("float_dot"),
        new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
        (args: Seq[Expression]) => FloatDotProduct(args(0), args(1))),
      (FunctionIdentifier("sorted_intersect_count"),
        new ExpressionInfo(classOf[SortedLongIntersectCount].getName, "sorted_intersect_count"),
        (args: Seq[Expression]) => SortedLongIntersectCount(args(0), args(1))),
      (FunctionIdentifier("positional_eq_count"),
        new ExpressionInfo(classOf[PositionalEqCount].getName, "positional_eq_count"),
        (args: Seq[Expression]) => PositionalEqCount(args(0), args(1))),
      (FunctionIdentifier("poly_hash"),
        new ExpressionInfo(classOf[PolyHashExpr].getName, "poly_hash"),
        (args: Seq[Expression]) => PolyHashExpr(args(0))),
      (FunctionIdentifier("subword_count"),
        new ExpressionInfo(classOf[SubwordCountExpr].getName, "subword_count"),
        (args: Seq[Expression]) => SubwordCountExpr(args(0))),
      (FunctionIdentifier("shingle_hashes"),
        new ExpressionInfo(classOf[ShingleHashExpr].getName, "shingle_hashes"),
        (args: Seq[Expression]) => ShingleHashExpr(args(0))))

  /** Idempotently register on a live session (overwrites are harmless —
    * same builder). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    entries.foreach { case (id, info, b) => reg.registerFunction(id, info, b) }
  }

  private[graft] def inject(ext: SparkSessionExtensions): Unit = {
    entries.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // CREATE/REFRESH/DROP MATERIALIZED VIEW in spark.sql — statements
    // Spark's grammar lacks; everything else delegates to the session
    // parser untouched
    ext.injectParser((_, delegate) => new graft.lake.GraftSqlParser(delegate))
    // MERGE INTO over GraftCatalog tables (SURVEY M6) — must run during
    // resolution, before Spark's row-level-operation rewrite rejects the
    // v1-write table
    // manifest-driven scan statistics across the V1Scan bridge (round 10):
    // the swap must run AFTER "Early Filter and Projection Push-Down" (the
    // pre-CBO batch precedes it in Spark 4.1), so it rides the session's
    // extraOptimizations ("User Provided Optimizers", post-pushdown,
    // pre-planning) — installed from the same per-session factory hook
    ext.injectResolutionRule { session =>
      AcidScanStatsRule.install(session)
      graft.lake.AcidMergeRule(session)
    }
  }
}

/** `spark.sql.extensions` entry point: SQL functions + the as-of join
  * planner strategy + the acid MERGE resolution rule. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
