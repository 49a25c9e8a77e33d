package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.WeightedAvg
import Qdsl._

/** SURVEY §2C C15-C20: aggregation operator inventory. All shapes are
  * partial-aggregatable (map-side combine) — no operator here materializes
  * per-group rows, so group cardinality, not input size, bounds memory.
  */
object AggQueries {

  def all: Seq[Q] = Seq(
    // ---- C15 global agg (no GROUP BY) -----------------------------------
    Q(
      "q_agg_global",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.agg(
            count(lit(1)).as("n_rows"),
            sumMoney(col("l_quantity")).as("total_qty"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"),
            avgMoney(col("l_extendedprice")).as("avg_price"))
      },
      Some("""
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
               MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS DOUBLE) AS avg_price
        FROM lineitem
      """)),

    // ---- C15 GROUP BY + HAVING ------------------------------------------
    Q(
      "q_agg_having",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"), sumMoney(col("o_totalprice")).as("spent"))
          .filter(col("n_orders") >= 15)
          .orderBy(col("o_custkey"))
      },
      Some("""
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spent
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
        ORDER BY o_custkey
      """)),

    // ---- C16 multi count-distinct ----------------------------------------
    Q(
      "q_agg_count_distinct",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            countDistinct(col("l_partkey"), col("l_suppkey")).as("n_part_supp"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps,
               COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
      """)),

    // ---- C17 approx_count_distinct (HLL) ---------------------------------
    // Sketch internals differ per engine → no SQL oracle; ApproxSpec asserts
    // |approx - exact| / exact <= rsd*3 at sf0.001/0.01.
    Q(
      "q_agg_approx_distinct",
      (s, dir) => {
        // the HLL estimate itself is engine-specific, so the ORACLE-CHECKED
        // output is the error-bound PROPERTY (|approx-exact| within 3×rsd)
        // plus the exact count — §2C's `bound` oracle made hash-checkable
        val li = Tables.lineitem(s, dir)
        li.groupBy(col("l_returnflag"))
          .agg(
            approx_count_distinct(col("l_partkey"), 0.02).as("apx"),
            countDistinct(col("l_partkey")).as("n_exact"))
          .select(
            col("l_returnflag"), col("n_exact"),
            (abs(col("apx") - col("n_exact")) <= col("n_exact") * 0.06 + lit(10))
              .as("within_bound"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS n_exact,
               true AS within_bound
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
      """)),

    // ---- C18 rollup + grouping_id -----------------------------------------
    Q(
      "q_agg_rollup",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n"),
            sumMoney(col("o_totalprice")).as("total"),
            grouping_id().cast("long").as("gid"))
          .select(
            coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
            coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
            col("gid"), col("n"), col("total"))
          .orderBy(col("status"), col("priority"), col("gid"))
      },
      Some("""
        SELECT COALESCE(o_orderstatus, '(all)') AS status,
               COALESCE(o_orderpriority, '(all)') AS priority,
               CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        ORDER BY status, priority, gid
      """)),

    // ---- C18 cube ----------------------------------------------------------
    Q(
      "q_agg_cube",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), grouping_id().cast("long").as("gid"))
          .select(
            coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
            coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
            col("gid"), col("n"))
          .orderBy(col("rf"), col("ls"), col("gid"))
      },
      Some("""
        SELECT COALESCE(l_returnflag, '(all)') AS rf,
               COALESCE(l_linestatus, '(all)') AS ls,
               CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               COUNT(*) AS n
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY rf, ls, gid
      """)),

    // ---- C18 grouping sets --------------------------------------------------
    Q(
      "q_agg_grouping_sets",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        c.createOrReplaceTempView("gs_customer")
        s.sql("""
          SELECT COALESCE(c_mktsegment, '(all)') AS seg,
                 COALESCE(CAST(c_nationkey AS STRING), '(all)') AS nk,
                 COUNT(*) AS n
          FROM gs_customer
          GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
          ORDER BY seg, nk
        """)
      },
      Some("""
        SELECT COALESCE(c_mktsegment, '(all)') AS seg,
               COALESCE(CAST(c_nationkey AS VARCHAR), '(all)') AS nk,
               COUNT(*) AS n
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        ORDER BY seg, nk
      """)),

    // ---- C19 collect_list / collect_set (order-normalized) + max_by/min_by --
    Q(
      "q_agg_collect",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        c.groupBy(col("c_mktsegment"))
          .agg(
            concat_ws(",", sort_array(collect_set(col("c_nationkey")))).as("nations"),
            max_by(col("c_name"), col("c_custkey")).as("latest_customer"),
            min_by(col("c_name"), col("c_custkey")).as("first_customer"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""
        SELECT c_mktsegment,
               array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nations,
               arg_max(c_name, c_custkey) AS latest_customer,
               arg_min(c_name, c_custkey) AS first_customer
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
      """)),

    // ---- C20/C48 custom typed Aggregator (exact weighted average) -----------
    Q(
      "q_agg_weighted_avg",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.groupBy(col("l_returnflag"))
          .agg(WeightedAvg.column(col("l_quantity"), col("l_extendedprice"))
            .as("w_avg_price"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS w_avg_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
      """))
  )
}
