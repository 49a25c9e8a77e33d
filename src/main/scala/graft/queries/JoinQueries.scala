package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import Qdsl._

/** SURVEY §2C C8-C14: join operator inventory.
  *
  * Scale notes: dims (region/nation/supplier/customer) are broadcast — the
  * fact side never shuffles for them. The one deliberate BNLJ (theta join)
  * broadcasts its small side. Null-producing outer joins coalesce their
  * outputs so the comparator never sees engine-specific null encodings.
  */
object JoinQueries {

  def all: Seq[Q] = Seq(
    // ---- C9 left outer: customers with zero orders kept ---------------
    Q(
      "q_join_left_outer",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(
            count(col("o_orderkey")).as("n_orders"),
            coalesce(sumMoney(col("o_totalprice")), lit(0.0)).as("spent"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
               COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
        ORDER BY c_custkey
      """)),

    // ---- C9 full outer: nations seen from customer vs supplier side ----
    Q(
      "q_join_full_outer",
      (s, dir) => {
        val c = Tables.customer(s, dir)
          .groupBy(col("c_nationkey")).agg(count(lit(1)).as("c_cnt"))
        val su = Tables.supplier(s, dir)
          .groupBy(col("s_nationkey")).agg(count(lit(1)).as("s_cnt"))
        c.join(su, c("c_nationkey") === su("s_nationkey"), "full")
          .select(
            coalesce(col("c_nationkey"), col("s_nationkey")).as("nk"),
            coalesce(col("c_cnt"), lit(0L)).as("c_cnt"),
            coalesce(col("s_cnt"), lit(0L)).as("s_cnt"))
          .orderBy(col("nk"))
      },
      Some("""
        SELECT COALESCE(c_nationkey, s_nationkey) AS nk,
               COALESCE(c_cnt, 0) AS c_cnt, COALESCE(s_cnt, 0) AS s_cnt
        FROM (SELECT c_nationkey, COUNT(*) AS c_cnt FROM customer GROUP BY c_nationkey) a
        FULL JOIN (SELECT s_nationkey, COUNT(*) AS s_cnt FROM supplier GROUP BY s_nationkey) b
          ON c_nationkey = s_nationkey
        ORDER BY nk
      """)),

    // ---- C9 right outer: mirror of the left-outer case --------------------
    Q(
      "q_join_right_outer",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        o.join(c, o("o_custkey") === c("c_custkey"), "right")
          .groupBy(col("c_nationkey"))
          .agg(
            count(col("o_orderkey")).as("n_orders"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("c_nationkey"))
      },
      Some("""
        SELECT c_nationkey, COUNT(o_orderkey) AS n_orders, COUNT(*) AS n_rows
        FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey ORDER BY c_nationkey
      """)),

    // ---- C12 broadcast-hinted equi-join (same result as the shuffled plan) --
    Q(
      "q_join_broadcast",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        // dims forced to broadcast: the orders side never shuffles
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_orders"), sumMoney(col("o_totalprice")).as("revenue"))
          .orderBy(col("n_name"))
      },
      Some("""
        SELECT n_name, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
      """)),

    // ---- C10 left semi (EXISTS) ----------------------------------------
    Q(
      "q_join_semi",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val li = Tables.lineitem(s, dir).filter(col("l_quantity") >= 48.0)
        o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 48.0)
        GROUP BY o_orderstatus ORDER BY o_orderstatus
      """)),

    // ---- C10 left anti (NOT EXISTS) -------------------------------------
    Q(
      "q_join_anti",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers_no_orders"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n_customers_no_orders
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment ORDER BY c_mktsegment
      """)),

    // ---- C11 cross join --------------------------------------------------
    Q(
      "q_join_cross",
      (s, dir) => {
        val r = Tables.region(s, dir)
        val n = Tables.nation(s, dir)
        r.crossJoin(n)
          .select(col("r_name"), col("n_name"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""
        SELECT r_name, n_name FROM region CROSS JOIN nation
        ORDER BY r_name, n_name
      """)),

    // ---- C13 range join (equi + interval condition) ----------------------
    Q(
      "q_join_range",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        li.join(
            o,
            li("l_orderkey") === o("o_orderkey") &&
              li("l_shipdate") >= o("o_orderdate") &&
              to_date(li("l_shipdate")) <= date_add(to_date(o("o_orderdate")), 90))
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n_lines"),
            sumMoney(col("l_extendedprice")).as("shipped_value"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS shipped_value
        FROM lineitem JOIN orders
          ON l_orderkey = o_orderkey
         AND l_shipdate >= o_orderdate
         AND CAST(l_shipdate AS DATE) <= CAST(o_orderdate AS DATE) + INTERVAL 90 DAY
        GROUP BY o_orderpriority ORDER BY o_orderpriority
      """)),

    // ---- C13 pure theta join (BNLJ, small side broadcast) ----------------
    Q(
      "q_join_theta",
      (s, dir) => {
        val su = Tables.supplier(s, dir)
        val c = Tables.customer(s, dir)
        // no equi key at all → BroadcastNestedLoopJoin on the tiny side
        c.join(broadcast(su), col("c_acctbal") > col("s_acctbal") * 2.0)
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("s_nationkey"))
      },
      Some("""
        SELECT s_nationkey, COUNT(*) AS n_pairs
        FROM customer JOIN supplier ON c_acctbal > s_acctbal * 2.0
        GROUP BY s_nationkey ORDER BY s_nationkey
      """)),

    // ---- C14 as-of: latest event per user at-or-before a cutoff ----------
    Q(
      "q_join_asof",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val cutoff = lit("2024-01-03 00:00:00").cast("timestamp")
        e.filter(col("ts") <= cutoff)
          .groupBy(col("user_id"))
          .agg(
            max_by(col("event_id"), struct(col("ts"), col("event_id"))).as("last_event_id"),
            date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id, event_id AS last_event_id,
               strftime(max_ts, '%Y-%m-%d %H:%M:%S') AS last_ts
        FROM (
          SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsx,
                 MAX(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id) AS max_ts,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
          FROM events
          WHERE CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-03 00:00:00'
        ) WHERE rn = 1 ORDER BY user_id
      """))
  )
}
