package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal bridge to `Dataset.ofRows` (private[sql]) for the SQL text
  * front-end: turns a parsed-but-unresolved logical plan (e.g. the USING
  * source of a MERGE statement) into a DataFrame through the session's
  * normal analyzer, so temp views and functions resolve exactly as in
  * `spark.sql`.
  */
object PlanShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def parse(spark: SparkSession, sql: String): LogicalPlan =
    spark.asInstanceOf[classic.SparkSession].sessionState.sqlParser.parsePlan(sql)

  /** The (unanalyzed) logical plan of a DataFrame — for splicing a
    * snapshot read into a parsed statement tree. */
  def logical(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.logical

  /** `SparkSession.cloneSession()` (private[sql]): an isolated session
    * state INITIALIZED FROM the parent — conf, temp views, and registered
    * functions are inherited at clone time, then diverge. This is the
    * semantics the reference's session pool relies on
    * (`writer/TransactionManager.java:95-101`); `newSession()` would start
    * from empty state instead.
    */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()
}
