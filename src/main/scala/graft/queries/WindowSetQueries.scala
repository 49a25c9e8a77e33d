package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import Qdsl._

/** SURVEY §2C C21-C28: window functions, sort/limit/top-k, set operations.
  * Every window spec carries a unique tiebreak column so results are a
  * total order (engine-independent determinism).
  */
object WindowSetQueries {

  def all: Seq[Q] = Seq(
    // ---- C21 distribution ranks (percent_rank / cume_dist) ---------------
    Q(
      "q_window_percentiles",
      (s, dir) => {
        val su = Tables.supplier(s, dir)
        val w = Window.orderBy(col("s_acctbal"), col("s_suppkey"))
        su.select(
            col("s_suppkey"),
            col("s_acctbal"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
          .orderBy(col("s_suppkey"))
      },
      Some("""
        SELECT s_suppkey, s_acctbal,
               PERCENT_RANK() OVER (ORDER BY s_acctbal, s_suppkey) AS pr,
               CUME_DIST() OVER (ORDER BY s_acctbal, s_suppkey) AS cd
        FROM supplier ORDER BY s_suppkey
      """)),

    // ---- C22 analytic: lag / lead / first_value / last_value --------------
    Q(
      "q_window_analytic",
      (s, dir) => {
        val e = Tables.events(s, dir).filter(col("user_id") < 10)
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        e.select(
            col("user_id"),
            col("event_id"),
            coalesce(lag(col("value"), 1).over(w), lit(-1.0)).as("prev_value"),
            coalesce(lead(col("value"), 1).over(w), lit(-1.0)).as("next_value"),
            first_value(col("event_id")).over(w).as("first_eid"),
            last_value(col("event_id"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
              .as("last_eid"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""
        SELECT user_id, event_id,
               COALESCE(LAG(value, 1) OVER w, -1.0) AS prev_value,
               COALESCE(LEAD(value, 1) OVER w, -1.0) AS next_value,
               FIRST_VALUE(event_id) OVER w AS first_eid,
               LAST_VALUE(event_id) OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_eid
        FROM events
        WHERE user_id < 10
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        ORDER BY user_id, event_id
      """)),

    // ---- C23 frames: running sum, moving avg, rangeBetween ----------------
    Q(
      "q_window_frames",
      (s, dir) => {
        val o = Tables.orders(s, dir).filter(col("o_custkey") < 100)
        val wRun = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wMov = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderkey"))
          .rowsBetween(-2, 0)
        val wRange = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderkey"))
          .rangeBetween(-100, 0)
        o.select(
            col("o_custkey"),
            col("o_orderkey"),
            sum(dec2(col("o_totalprice"))).over(wRun).cast("double").as("running_total"),
            (sum(dec2(col("o_totalprice"))).over(wMov).cast("double") /
              count(lit(1)).over(wMov)).as("moving_avg3"),
            count(lit(1)).over(wRange).as("n_in_key_range"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER wRun AS DOUBLE) AS running_total,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER wMov AS DOUBLE)
                 / COUNT(*) OVER wMov AS moving_avg3,
               COUNT(*) OVER wRange AS n_in_key_range
        FROM orders
        WHERE o_custkey < 100
        WINDOW
          wRun AS (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wMov AS (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
          wRange AS (PARTITION BY o_custkey ORDER BY o_orderkey RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, o_orderkey
      """)),

    // ---- C24 multi-column sort with NULLS FIRST/LAST ----------------------
    Q(
      "q_sort_nulls",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        // nullable sort key, null-free output (null encodings differ across
        // engines; the *ordering effect* of NULLS FIRST is what's verified)
        c.withColumn("seg_or_null", nullif(col("c_mktsegment"), lit("BUILDING")))
          .orderBy(
            asc_nulls_first("seg_or_null"),
            desc("c_acctbal"),
            asc("c_custkey"))
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
          .limit(100)
      },
      Some("""
        SELECT c_custkey, c_mktsegment, c_acctbal
        FROM customer
        ORDER BY NULLIF(c_mktsegment, 'BUILDING') ASC NULLS FIRST,
                 c_acctbal DESC, c_custkey ASC
        LIMIT 100
      """)),

    // ---- C26 top-k per group ------------------------------------------------
    Q(
      "q_topk_per_group",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        o.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_orderpriority"), col("rn").cast("long").as("rn"),
            col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderpriority"), col("rn"))
      },
      Some("""
        SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders
        ) WHERE rn <= 3
        ORDER BY o_orderpriority, rn
      """)),

    // ---- C27 UNION ALL / UNION DISTINCT --------------------------------------
    Q(
      "q_set_union",
      (s, dir) => {
        val c = Tables.customer(s, dir)
          .select(col("c_nationkey").cast("int").as("nk"))
        val su = Tables.supplier(s, dir)
          .select(col("s_nationkey").cast("int").as("nk"))
        val unionAllCounts = c.unionAll(su)
          .groupBy(col("nk")).agg(count(lit(1)).as("n_all"))
        val unionDistinct = c.union(su).distinct()
          .withColumn("n_all", lit(-1L)) // marker rows prove DISTINCT branch
        unionAllCounts.unionAll(unionDistinct)
          .orderBy(col("nk"), col("n_all"))
      },
      Some("""
        SELECT nk, n_all FROM (
          SELECT nk, COUNT(*) AS n_all
          FROM (SELECT c_nationkey AS nk FROM customer
                UNION ALL SELECT s_nationkey FROM supplier)
          GROUP BY nk
          UNION ALL
          SELECT nk, -1 AS n_all
          FROM (SELECT c_nationkey AS nk FROM customer
                UNION SELECT s_nationkey FROM supplier)
        ) ORDER BY nk, n_all
      """)),

    // ---- C28 INTERSECT / EXCEPT ------------------------------------------------
    Q(
      "q_set_intersect_except",
      (s, dir) => {
        val cParts = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
          .select(col("l_partkey").as("pk"))
        val oParts = Tables.lineitem(s, dir).filter(col("l_returnflag") === "A")
          .select(col("l_partkey").as("pk"))
        val both = cParts.intersect(oParts).withColumn("src", lit("both"))
        val onlyR = cParts.except(oParts).withColumn("src", lit("only_r"))
        both.unionAll(onlyR).orderBy(col("src"), col("pk"))
      },
      Some("""
        SELECT pk, src FROM (
          SELECT pk, 'both' AS src FROM (
            SELECT l_partkey AS pk FROM lineitem WHERE l_returnflag = 'R'
            INTERSECT
            SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')
          UNION ALL
          SELECT pk, 'only_r' AS src FROM (
            SELECT l_partkey AS pk FROM lineitem WHERE l_returnflag = 'R'
            EXCEPT
            SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')
        ) ORDER BY src, pk
      """))
  )
}
