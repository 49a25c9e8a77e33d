package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import Qdsl._

/** SURVEY.md §2C rows C1-C36: the declared relational operator inventory,
  * one named query per operator family, each paired with the DuckDB oracle
  * SQL the driver hash-compares against.
  *
  * Determinism rules (SURVEY §5.3): total-order ORDER BY on all projected
  * columns, money math through DECIMAL(18,2) (see [[Qdsl]]), UTC, no
  * order-sensitive aggregates without explicit sorts.
  */
object RelationalQueries {

  def all: Seq[Q] = Seq(
    // ---- C15 hash aggregate (TPC-H Q1 shape) --------------------------
    Q(
      "q_agg_pricing_summary",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sumMoney(col("l_quantity")).as("sum_qty"),
            sumMoney(col("l_extendedprice")).as("sum_base_price"),
            sum(dec2(col("l_extendedprice")) * dec2(lit(1.0) - col("l_discount")))
              .cast("double").as("sum_disc_price"),
            avgMoney(col("l_quantity")).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS DOUBLE) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """)),

    // ---- C6/C7 projection + predicates --------------------------------
    Q(
      "q_filter_project",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.filter(
            col("o_totalprice").between(1000.0, 5000.0) &&
              col("o_orderstatus").isin("O", "F") &&
              col("o_orderpriority").like("%URGENT%") &&
              col("o_custkey").isNotNull)
          .select(
            col("o_orderkey"),
            col("o_custkey"),
            dec2(col("o_totalprice")).cast("double").as("price2"),
            (col("o_orderkey") % 7).as("bucket7"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey, o_custkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price2,
               o_orderkey % 7 AS bucket7
        FROM orders
        WHERE o_totalprice BETWEEN 1000.0 AND 5000.0
          AND o_orderstatus IN ('O','F')
          AND o_orderpriority LIKE '%URGENT%'
          AND o_custkey IS NOT NULL
        ORDER BY o_orderkey
      """)),

    // ---- C8 + C12 star join (dims broadcast) ---------------------------
    Q(
      "q_join_star",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        // dims are tiny at every scale factor → broadcast, no shuffle of facts
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            count(lit(1)).as("n_orders"),
            sumMoney(col("o_totalprice")).as("total_price"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""
        SELECT r_name, n_name, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
      """)),

    // ---- C21 ranking window functions ----------------------------------
    Q(
      "q_window_rank",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        // deterministic total order within each partition: tie-break on pk
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        c.select(
            col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
            // cast to long: DuckDB window fns return BIGINT, keep schemas equal
            row_number().over(w).cast("long").as("rn"),
            rank().over(w).cast("long").as("rnk"),
            dense_rank().over(w).cast("long").as("drnk"),
            ntile(4).over(w).cast("long").as("quartile"))
          .filter(col("rn") <= 10)
          .orderBy(col("c_mktsegment"), col("rn"))
      },
      Some("""
        SELECT * FROM (
          SELECT c_custkey, c_mktsegment, c_acctbal,
                 ROW_NUMBER() OVER w AS rn,
                 RANK() OVER w AS rnk,
                 DENSE_RANK() OVER w AS drnk,
                 NTILE(4) OVER w AS quartile
          FROM customer
          WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        ) WHERE rn <= 10
        ORDER BY c_mktsegment, rn
      """)),

    // ---- C24/C25 global sort + top-k -----------------------------------
    Q(
      "q_sort_topk",
      (s, dir) => {
        val p = Tables.part(s, dir)
        p.orderBy(col("p_retailprice").desc, col("p_partkey").asc)
          .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
          .limit(25)
      },
      Some("""
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        ORDER BY p_retailprice DESC, p_partkey ASC
        LIMIT 25
      """))
  )
}
