package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.graft.SortedLongIntersectCount.intersectCount

import graft.Tables
import graft.functions.TextHash
import graft.lake.AcidTable

/** Training-data-pipeline operators beyond SURVEY §2C's inventory:
  * reproducible sampling, order-independent statistics, data-layout
  * clustering, incremental (CDC-driven) aggregate maintenance, containment
  * dedup, fuzzy joins, pooled embeddings, and sketch-accuracy checks.
  *
  * Determinism doctrine (what makes these 100 TB-safe): anything that
  * crosses a shuffle is accumulated in integers or DECIMAL — never raw
  * doubles — so results are independent of partitioning and task order;
  * sampling decisions are pure hash functions of the row key, never RNG
  * state; all double math happens AFTER aggregation on single values with
  * the operation sequence mirrored in the DuckDB oracle.
  */
object PipelineQueries {

  private val Knuth = 2654435761L // Knuth multiplicative hash constant

  def all: Seq[Q] = Seq(
    // ---- reproducible Bernoulli-style sampling by key hash ----------------------
    // The sampling decision is a pure function of the row key: the sample
    // is stable across runs, executors, AND engines — the property actual
    // corpus pipelines need so a re-run selects the identical subset
    // (Spark's df.sample seeds per-partition RNG → repartition changes the
    // sample; this does not).
    Q(
      "q_sample_hash",
      (s, dir) =>
        Tables.events(s, dir)
          .filter((col("event_id") * Knuth) % 1000 < 100)
          .select(col("event_id"), col("user_id"), col("event_type"))
          .orderBy(col("event_id")),
      Some(s"""
        SELECT event_id, user_id, event_type
        FROM events WHERE (event_id * $Knuth) % 1000 < 100
        ORDER BY event_id
      """)),

    // ---- stratified fixed-size-per-stratum sampling -----------------------------
    // Hash-ranked top-20 per language: balanced per-stratum subsets for
    // eval sets / per-language quota sampling. One window per stratum —
    // shuffles only (lang, hash, id), and WindowGroupLimit pushes the
    // top-k below the exchange.
    Q(
      "q_sample_stratified",
      (s, dir) =>
        Tables.documents(s, dir)
          .withColumn("hk", (col("doc_id") * Knuth) % TextHash.P)
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("lang")).orderBy(col("hk"), col("doc_id"))))
          .filter(col("rk") <= 20)
          .select(col("lang"), col("rk").cast("long").as("rk"), col("doc_id"))
          .orderBy(col("lang"), col("rk")),
      Some(s"""
        SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id FROM (
          SELECT lang, doc_id,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY (doc_id * $Knuth) % ${TextHash.P}, doc_id) AS rk
          FROM documents)
        WHERE rk <= 20 ORDER BY lang, rk
      """)),

    // ---- order-independent moment statistics (mean/stddev/corr) -----------------
    // Second moments accumulated in DECIMAL (values carry 2 dp) and BIGINT,
    // then combined in double space on the final single values: the result
    // is bit-identical no matter how partial aggregation interleaves —
    // the numerically-reproducible way to compute corpus statistics at
    // scale. (A raw double `corr` differs per run on a real cluster.)
    Q(
      "q_stat_summary",
      (s, dir) => {
        val vd = col("value").cast(DecimalType(18, 2))
        val h = hour(col("ts")).cast("long")
        val agg = Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(vd).as("sxd"), sum(vd * vd).as("sxxd"),
            sum(h).as("sy"), sum(h * h).as("syy"),
            sum(vd * h.cast(DecimalType(18, 2))).as("sxyd"))
        val n = col("n").cast("double")
        val sx = col("sxd").cast("double"); val sxx = col("sxxd").cast("double")
        val sy = col("sy").cast("double"); val syy = col("syy").cast("double")
        val sxy = col("sxyd").cast("double")
        agg.select(
            col("event_type"), col("n"),
            round(sx / n, 4).as("mean_val"),
            round(sqrt((n * sxx - sx * sx) / (n * (n - 1))), 4).as("stddev_val"),
            round((n * sxy - sx * sy)
              / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 4).as("corr_val_hour"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH a AS (
          SELECT event_type, COUNT(*) AS n,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT)) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT)
                          * CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT)) AS DOUBLE) AS syy,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))
                          * CAST(CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS DECIMAL(18,2))) AS DOUBLE) AS sxy
          FROM events GROUP BY event_type)
        SELECT event_type, n,
               round(sx / CAST(n AS DOUBLE), 4) AS mean_val,
               round(sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))), 4) AS stddev_val,
               round((CAST(n AS DOUBLE) * sxy - sx * sy)
                     / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                            * (CAST(n AS DOUBLE) * syy - sy * sy)), 4) AS corr_val_hour
        FROM a ORDER BY event_type
      """)),

    // ---- Z-order data-layout clustering -----------------------------------------
    // Bit-interleaved (Morton) key over two dimensions, then per-bucket
    // min/max ranges: files written in z-order carry tight multi-column
    // min/max statistics, so scans filtering on EITHER dimension prune —
    // the layout technique behind Delta OPTIMIZE ZORDER / Hudi clustering.
    // The query materializes the bucket→range map that proves locality
    // (each 4096-wide z-range covers a 64×64 tile of the key space).
    Q(
      "q_layout_zorder",
      (s, dir) => {
        val x = col("o_custkey") % 256
        val y = col("o_orderkey") % 256
        val z = Seq.tabulate(8)(b =>
          (shiftright(x, b) % 2) * lit(1L << (2 * b))
            + (shiftright(y, b) % 2) * lit(1L << (2 * b + 1))).reduce(_ + _)
        Tables.orders(s, dir)
          .select(x.as("x"), y.as("y"), z.as("z"))
          .withColumn("bucket", floor(col("z") / 4096).cast("long"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("x")).as("min_x"), max(col("x")).as("max_x"),
            min(col("y")).as("min_y"), max(col("y")).as("max_y"))
          .orderBy(col("bucket"))
      },
      Some({
        val z = (0 until 8).map(b =>
          s"((x // ${1L << b}) % 2) * ${1L << (2 * b)} + ((y // ${1L << b}) % 2) * ${1L << (2 * b + 1)}")
          .mkString(" + ")
        s"""
        WITH d AS (SELECT o_custkey % 256 AS x, o_orderkey % 256 AS y FROM orders),
        zd AS (SELECT x, y, $z AS z FROM d)
        SELECT z // 4096 AS bucket, COUNT(*) AS n,
               min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
        FROM zd GROUP BY bucket ORDER BY bucket
        """
      })),

    // ---- incremental aggregate maintenance over CDC -----------------------------
    // The lakehouse pattern that avoids re-reading 100 TB to refresh a
    // rollup: aggregate the v0 snapshot once, then apply the CDC diff
    // (inserts add, deletes subtract — an update is delete+insert of the
    // two row images) to roll the aggregate forward to v2. The oracle
    // computes the v2 aggregate directly, so the gate proves
    // incremental == full recompute.
    Q(
      "q_acid_incremental_agg",
      (s, dir) => {
        val schema = StructType(Seq(
          StructField("pk", StringType), StructField("part", StringType),
          StructField("val", DoubleType)))
        val t = AcidTable.create(s,
          java.nio.file.Files.createTempDirectory("graft-acid-")
            .resolve(java.util.UUID.randomUUID().toString).toString,
          schema, "pk", "part", stablePartitions = true)
        val base = Tables.customer(s, dir)
          .filter(col("c_custkey") < 500)
          .select(
            col("c_custkey").cast("string").as("pk"),
            concat(lit("p"), (col("c_nationkey") % 4).cast("string")).as("part"),
            col("c_acctbal").as("val"))
        val v0 = t.upsert(base)
        t.upsert(base.filter(col("pk").cast("long") % 4 === 0)
          .withColumn("val", col("val") + 50))
        val v2 = t.delete(base.filter(col("pk").cast("long") % 9 === 0)
          .select("pk").collect().map(_.getString(0)).toSeq)
        val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(18, 2))
        val agg0 = t.snapshot(v0).groupBy(col("part"))
          .agg(count(lit(1)).as("n0"), sum(dec(col("val"))).as("s0"))
        val delta = t.changesBetween(v0, v2).groupBy(col("part"))
          .agg(
            sum(when(col("_change_type") === "insert", 1L).otherwise(-1L)).as("dn"),
            sum(when(col("_change_type") === "insert", dec(col("val")))
              .otherwise(-dec(col("val")))).as("ds"))
        agg0.join(delta, Seq("part"), "full_outer")
          .select(col("part"),
            (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
            (coalesce(col("s0"), lit(0).cast(DecimalType(18, 2)))
              + coalesce(col("ds"), lit(0).cast(DecimalType(18, 2))))
              .cast("double").as("total"))
          .filter(col("n") > 0)
          .orderBy(col("part"))
      },
      Some("""
        WITH base AS (
          SELECT CAST(c_custkey AS VARCHAR) AS pk,
                 'p' || CAST(c_nationkey % 4 AS VARCHAR) AS part,
                 c_acctbal AS val
          FROM customer WHERE c_custkey < 500),
        v2 AS (
          SELECT pk, part,
                 CASE WHEN CAST(pk AS BIGINT) % 4 = 0 THEN val + 50 ELSE val END AS val
          FROM base WHERE CAST(pk AS BIGINT) % 9 <> 0)
        SELECT part, COUNT(*) AS n,
               CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM v2 GROUP BY part ORDER BY part
      """)),

    // ---- containment near-dup (sub-document duplication) ------------------------
    // Jaccard misses a document pasted INSIDE a bigger one; containment
    // |A∩B|/min(|A|,|B|) catches it. No size-ratio prune is sound here
    // (small⊂big is exactly the target), so this is the deliberate exact
    // baseline over same-lang pairs with the codegen'd merge-intersect
    // doing the heavy lifting.
    Q(
      "q_dedup_containment",
      (s, dir) => {
        val sh = TextQueries.hashedShingleSets(s, dir)
        // PREFIX-PROBED inverted index (lossless for containment >= 0.9 on
        // the smaller set): if |A∩B| >= 0.9·|A| then at most floor(|A|/10)
        // of A's tokens miss B, so ANY floor(|A|/10)+1 of A's tokens must
        // hit B SOMEWHERE — probe each doc's prefix against the full token
        // index (no size-ratio prune is sound here; small⊂big is exactly
        // the target). The probe prefix is drawn from `hd` (ascending
        // global document frequency): the probed tokens are the corpus's
        // rarest, so hot boilerplate shingles never fan a probe out across
        // their whole index bucket — the round-5 hot-token residual risk.
        // Candidates then take the thresholded merge: exact for every pair
        // that can reach 0.9 containment, bails with -1 (→ filtered) the
        // moment a pair cannot.
        val index = sh.select(col("lang"), col("doc_id"), explode(col("hs")).as("tok"))
        val probe = sh.select(col("lang"), col("doc_id"),
          explode(expr("slice(hd, 1, ds div 10 + 1)")).as("tok"))
        val cand = probe.as("a").join(index.as("b"),
            col("a.lang") === col("b.lang") && col("a.tok") === col("b.tok")
              && col("a.doc_id") =!= col("b.doc_id"))
          .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
            greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
          .dropDuplicates("doc_a", "doc_b")
        cand
          .join(sh.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"),
            col("ds").as("ds_a")), "doc_a")
          .join(sh.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"),
            col("ds").as("ds_b")), "doc_b")
          .withColumn("inter",
            org.apache.spark.sql.graft.SortedLongIntersectAtLeast
              .intersectAtLeast(col("hs_a"), col("hs_b"), 9, 10).cast("double"))
          .withColumn("cont", col("inter") / least(col("ds_a"), col("ds_b")))
          .filter(col("cont") >= 0.9)
          .select(col("doc_a"), col("doc_b"), round(col("cont"), 6).as("containment"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""
        WITH sh AS (
          SELECT doc_id, lang,
                 list_sort(list_distinct(list_transform(
                   list_distinct(list_transform(
                     range(1, greatest(len(w) - 1, 0) + 1), i -> w[i] || ' ' || w[i + 1])),
                   x -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(string_split(x, ''), c -> CAST(ascii(c) AS BIGINT))),
                     (acc, h) -> (acc * 31 + h) % ${TextHash.P})))) AS hs
          FROM (SELECT doc_id, lang, string_split(trim(text), ' ') AS w FROM documents))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
                     / least(len(a.hs), len(b.hs)), 6) AS containment
        FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
              / least(len(a.hs), len(b.hs)) >= 0.9
        ORDER BY doc_a, doc_b
      """)),

    // ---- blocked fuzzy (edit-distance) join -------------------------------------
    // Entity-resolution shape: candidate pairs restricted to equality
    // blocks (brand, size) so the quadratic edit-distance only runs inside
    // blocks — the join shuffles on the block key and scales with block
    // size, not corpus size.
    Q(
      "q_join_fuzzy",
      (s, dir) => {
        val p = Tables.part(s, dir)
          .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"))
        val a = p.select(col("p_brand"), col("p_size"),
          col("p_partkey").as("p_a"), col("p_name").as("name_a"))
        val b = p.select(col("p_brand"), col("p_size"),
          col("p_partkey").as("p_b"), col("p_name").as("name_b"))
        a.join(b, Seq("p_brand", "p_size"))
          .filter(col("p_a") < col("p_b"))
          .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
          .filter(col("dist") <= 4)
          .select(col("p_a"), col("p_b"), col("dist"))
          .orderBy(col("p_a"), col("p_b"))
      },
      Some("""
        SELECT a.p_partkey AS p_a, b.p_partkey AS p_b,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 4
        ORDER BY p_a, p_b
      """)),

    // ---- mean-pooled (centroid) embeddings per label ----------------------------
    // Class centroids via FIXED-POINT accumulation: each component is
    // quantized to an integer of millionths, summed exactly (order-free),
    // and divided back once — the reproducible way to mean-pool float
    // vectors across a shuffle. Explode is map-side; the shuffle carries
    // (label, dim, int64).
    Q(
      "q_embed_centroid",
      (s, dir) =>
        Tables.embeddings(s, dir)
          .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .filter(col("pos") < 8)
          .withColumn("q", round(col("v").cast("double") * 1e6).cast("long"))
          .groupBy(col("label"), col("pos"))
          .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"))
          .select(col("label"), col("pos").cast("long").as("pos"),
            round(col("sq").cast("double") / (col("n").cast("double") * 1e6), 6)
              .as("centroid"))
          .orderBy(col("label"), col("pos")),
      Some("""
        WITH expl AS (
          SELECT label, i - 1 AS pos,
                 CAST(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1e6) AS BIGINT) AS q
          FROM embeddings, range(1, 9) r(i)),
        agg AS (SELECT label, pos, COUNT(*) AS n, SUM(q) AS sq FROM expl GROUP BY 1, 2)
        SELECT label, CAST(pos AS BIGINT) AS pos,
               round(CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6), 6) AS centroid
        FROM agg ORDER BY label, pos
      """)),

    // ---- ORC source/sink round-trip ---------------------------------------------
    // Format breadth: the same events relation written as ORC and read
    // back must aggregate identically to the parquet original (which is
    // what the oracle reads) — column pruning and predicate pushdown work
    // on the ORC scan the same way.
    Q(
      "q_src_orc",
      (s, dir) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft-orc-")
          .resolve("events_orc").toString
        Tables.events(s, dir).write.mode("overwrite").orc(tmp)
        s.read.orc(tmp)
          .filter(col("value") >= 100)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_val"))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        FROM events WHERE value >= 100
        GROUP BY event_type ORDER BY event_type
      """)),

    // ---- batch sessionization (gaps-and-islands) --------------------------------
    // The batch twin of q_stream_session: a new session starts where the
    // gap to the previous event exceeds 30 min; session id is the running
    // count of starts. Gap math in exact integer micros — fractional-
    // second timestamps compare identically in both engines.
    Q(
      "q_sessionize_batch",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"))
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("new_s",
            when(col("prev_us").isNull
              || unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
              .otherwise(0L))
          .withColumn("sid", sum(col("new_s")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sid"))
          .agg(
            unix_timestamp(min(col("ts"))).as("session_start"),
            count(lit(1)).as("n"),
            (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts")))).as("dur_sec"))
          .select(col("user_id"), col("session_start"), col("n"), col("dur_sec"))
          .orderBy(col("user_id"), col("session_start"))
      },
      Some("""
        WITH o AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                 CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) IS NULL
                      OR epoch(CAST(ts AS TIMESTAMP)) - epoch(lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))) > 1800
                      THEN 1 ELSE 0 END AS new_s
          FROM events),
        sess AS (
          SELECT user_id, ts,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM o)
        SELECT user_id,
               CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
               COUNT(*) AS n,
               CAST(floor(epoch(max(ts))) AS BIGINT)
                 - CAST(floor(epoch(min(ts))) AS BIGINT) AS dur_sec
        FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start
      """)),

    // ---- fixed-width histogram (data profiling) ---------------------------------
    Q(
      "q_stat_histogram",
      (s, dir) =>
        Tables.events(s, dir)
          .withColumn("bucket", (floor(col("value") / 50) * 50).cast("long"))
          .groupBy(col("event_type"), col("bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("event_type"), col("bucket")),
      Some("""
        SELECT event_type, CAST(floor(value / 50) * 50 AS BIGINT) AS bucket, COUNT(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY event_type, bucket
      """)),

    // ---- modal value per group ---------------------------------------------------
    Q(
      "q_agg_mode",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("cnt").desc, col("event_type"))))
          .filter(col("rk") === 1)
          .select(col("user_id"), col("event_type").as("modal_type"), col("cnt"))
          .orderBy(col("user_id")),
      Some("""
        SELECT user_id, event_type AS modal_type, cnt FROM (
          SELECT user_id, event_type, COUNT(*) AS cnt,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY COUNT(*) DESC, event_type) AS rk
          FROM events GROUP BY user_id, event_type)
        WHERE rk = 1 ORDER BY user_id
      """)),

    // ---- native as-of join (custom LogicalPlan + Strategy + SparkPlan) ----------
    // SURVEY §4.4 M7 option (c): the whole-operator extension path. For
    // each order, the latest event of that customer at-or-before the order
    // date — one co-partitioned exchange per side (SortMergeJoin shape)
    // and a single forward merge per partition, versus the window
    // composition's union-shuffle + full group sort (`q_join_asof` stays
    // in the suite as the semantic witness against the same oracle shape).
    Q(
      "q_join_asof_native",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val l = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
        val r = ev.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("event_id").as("v_id"),
            col("ts").as("v_ts"))
        org.apache.spark.sql.graft.AsOfJoin.join(l, r,
            l("user_id"), r("v_user"), l("p_ts"), r("v_ts"), r("v_id"))
          .select(col("p_id"), col("user_id"),
            coalesce(col("v_id"), lit(-1L)).as("last_view_id"),
            coalesce(unix_timestamp(col("v_ts")), lit(-1L)).as("last_view_ts"))
          .orderBy(col("p_id"))
      },
      Some("""
        WITH p AS (SELECT event_id AS p_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts
                   FROM events WHERE event_type = 'purchase'),
        v AS (SELECT user_id AS v_user, event_id AS v_id, CAST(ts AS TIMESTAMP) AS v_ts
              FROM events WHERE event_type = 'view'),
        j AS (SELECT p.p_id, p.user_id, v.v_id, v.v_ts,
                row_number() OVER (PARTITION BY p.p_id
                  ORDER BY v.v_ts DESC, v.v_id DESC) AS rn
              FROM p LEFT JOIN v ON v.v_user = p.user_id AND v.v_ts <= p.p_ts)
        SELECT p_id, user_id,
               coalesce(v_id, -1) AS last_view_id,
               coalesce(CAST(floor(epoch(v_ts)) AS BIGINT), -1) AS last_view_ts
        FROM j WHERE rn = 1 ORDER BY p_id
      """)),

    // ---- native as-of join with tolerance (merge_asof parity) -------------------
    // The staleness-bounded point-in-time lookup (pandas
    // `merge_asof(tolerance=...)`): each purchase gets its most recent
    // same-user view ONLY when that view is within 1 hour — older context
    // is stale and must not attach. Same single forward-merge exec as
    // q_join_asof_native (tolerance filters at emission: the buffered
    // candidate is already the most recent qualifying row, so if IT is
    // too old, nothing qualifies); the oracle is the window formulation
    // restricted to the 1-hour band.
    Q(
      "q_join_asof_tolerance",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val l = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
        val r = ev.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("event_id").as("v_id"),
            col("ts").as("v_ts"))
        org.apache.spark.sql.graft.AsOfJoin.join(l, r,
            l("user_id"), r("v_user"), l("p_ts"), r("v_ts"), r("v_id"),
            toleranceMicros = Some(3600L * 1000000L))
          .select(col("p_id"), col("user_id"),
            coalesce(col("v_id"), lit(-1L)).as("ctx_view_id"),
            coalesce(unix_timestamp(col("v_ts")), lit(-1L)).as("ctx_view_ts"))
          .orderBy(col("p_id"))
      },
      Some("""
        WITH p AS (SELECT event_id AS p_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts
                   FROM events WHERE event_type = 'purchase'),
        v AS (SELECT user_id AS v_user, event_id AS v_id, CAST(ts AS TIMESTAMP) AS v_ts
              FROM events WHERE event_type = 'view'),
        j AS (SELECT p.p_id, p.user_id, v.v_id, v.v_ts,
                row_number() OVER (PARTITION BY p.p_id
                  ORDER BY v.v_ts DESC, v.v_id DESC) AS rn
              FROM p LEFT JOIN v ON v.v_user = p.user_id AND v.v_ts <= p.p_ts
                AND v.v_ts >= p.p_ts - INTERVAL 1 HOUR)
        SELECT p_id, user_id,
               coalesce(v_id, -1) AS ctx_view_id,
               coalesce(CAST(floor(epoch(v_ts)) AS BIGINT), -1) AS ctx_view_ts
        FROM j WHERE rn = 1 ORDER BY p_id
      """)),

    // ---- SQL extension surface: native expressions as SQL functions -------------
    // The library's codegen'd Catalyst expressions registered through the
    // FunctionRegistry (declaratively via
    // spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions, or
    // imperatively as here) — SQL users get the same hot paths as the
    // DataFrame API. The quantization (round(x*10) into BIGINT) keeps the
    // oracle comparison integer-exact.
    Q(
      "q_fn_sql_extension",
      (s, dir) => {
        org.apache.spark.sql.graft.GraftFunctions.register(s)
        Tables.embeddings(s, dir).createOrReplaceTempView("embeddings_ext")
        s.sql("""
          SELECT vec_id,
                 round(float_dot(embedding, embedding), 4) AS self_dot,
                 CAST(sorted_intersect_count(
                   array_sort(array_distinct(transform(embedding, x -> CAST(round(x * 10) AS BIGINT)))),
                   array_sort(array_distinct(transform(slice(embedding, 1, 32), x -> CAST(round(x * 10) AS BIGINT))))
                 ) AS BIGINT) AS half_overlap,
                 CAST(positional_eq_count(
                   transform(embedding, x -> CAST(round(x * 10) AS BIGINT)),
                   transform(reverse(embedding), x -> CAST(round(x * 10) AS BIGINT))
                 ) AS BIGINT) AS palindromic_dims,
                 poly_hash(CAST(vec_id AS STRING)) AS id_hash,
                 subword_count(concat('table', CAST(vec_id AS STRING), 'scan')) AS sub_cnt,
                 aggregate(shingle_hashes(concat('w', CAST(vec_id AS STRING),
                   ' x w', CAST(vec_id AS STRING))), CAST(0 AS BIGINT),
                   (acc, x) -> acc + x) AS sh_sum
          FROM embeddings_ext WHERE vec_id < 50 ORDER BY vec_id
        """)
      },
      Some(s"""
        WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 50),
        q AS (SELECT vec_id,
                     list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10) AS BIGINT)) AS qv
              FROM e)
        SELECT e.vec_id,
               round(list_aggregate(list_transform(range(1, 65),
                 i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), 'sum'), 4) AS self_dot,
               CAST(len(list_intersect(list_distinct(q.qv), list_distinct(q.qv[1:32]))) AS BIGINT) AS half_overlap,
               CAST(list_sum(list_transform(range(1, 65),
                 i -> CASE WHEN q.qv[i] = q.qv[65 - i] THEN 1 ELSE 0 END)) AS BIGINT) AS palindromic_dims,
               (${TextQueries.sqlPolyHash("CAST(e.vec_id AS VARCHAR)")}) AS id_hash,
               CAST(2 + length(CAST(e.vec_id AS VARCHAR)) AS BIGINT) AS sub_cnt,
               (SELECT CAST(list_sum(list_transform(${TextQueries.sqlShingles},
                  x -> ${TextQueries.sqlPolyHash("x")})) AS BIGINT)
                FROM (SELECT string_split('w' || CAST(e.vec_id AS VARCHAR)
                  || ' x w' || CAST(e.vec_id AS VARCHAR), ' ') AS w)) AS sh_sum
        FROM e JOIN q ON e.vec_id = q.vec_id
        ORDER BY e.vec_id
      """)),

    // ---- conversion funnel: first view → first subsequent purchase --------------
    // The product-analytics staple: per user, the first 'view' and the
    // first 'purchase' at-or-after it, with time-to-convert. Two partial
    // min-aggregations and one broadcast-sized join — no windows over the
    // full event stream, so the plan is two map-side-combined shuffles at
    // any scale.
    Q(
      "q_funnel_conversion",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val firstView = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"))
          .agg(min(unix_micros(col("ts"))).as("first_view_us"))
        val firstPurchase = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
          .join(firstView, Seq("user_id"))
          .filter(col("p_us") >= col("first_view_us"))
          .groupBy(col("user_id"))
          .agg(min(col("p_us")).as("first_purchase_us"))
        firstView.join(firstPurchase, Seq("user_id"), "left")
          .select(col("user_id"),
            col("first_view_us"),
            col("first_purchase_us").isNotNull.as("converted"),
            coalesce(expr("(first_purchase_us - first_view_us) div 1000000"), lit(-1L))
              .as("secs_to_convert"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH fv AS (
          SELECT user_id, min(epoch_us(CAST(ts AS TIMESTAMP))) AS first_view_us
          FROM events WHERE event_type = 'view' GROUP BY user_id),
        fp AS (
          SELECT e.user_id, min(epoch_us(CAST(e.ts AS TIMESTAMP))) AS first_purchase_us
          FROM events e JOIN fv ON e.user_id = fv.user_id
          WHERE e.event_type = 'purchase'
            AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= fv.first_view_us
          GROUP BY e.user_id)
        SELECT fv.user_id, fv.first_view_us,
               (fp.first_purchase_us IS NOT NULL) AS converted,
               CAST(coalesce((fp.first_purchase_us - fv.first_view_us) // 1000000, -1) AS BIGINT)
                 AS secs_to_convert
        FROM fv LEFT JOIN fp ON fv.user_id = fp.user_id
        ORDER BY fv.user_id
      """)),

    // ---- binned (bucketized) pure range join ------------------------------------
    // A range-only join (no equi key) is a broadcast nested loop — O(n·m)
    // comparisons. The scale rewrite: bucket time into join-window-sized
    // bins, explode each probe row into the two bins its window can touch,
    // and equi-join on the bin — a plain shuffle join whose cost tracks
    // rows-per-bin, with the exact range predicate as the residual. Here:
    // for every purchase, the number of views (any user) in the preceding
    // hour.
    Q(
      "q_join_range_binned",
      (s, dir) => {
        val us = 3600L * 1000000L // 1 hour in microseconds = bin width
        val ev = Tables.events(s, dir)
        val views = ev.filter(col("event_type") === "view")
          .select(unix_micros(col("ts")).as("v_us"))
          .withColumn("bin", floor(col("v_us") / us))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), unix_micros(col("ts")).as("p_us"))
          .withColumn("bin0", floor(col("p_us") / us))
          .withColumn("bin", explode(array(col("bin0") - 1, col("bin0"))))
        purchases.join(views,
            purchases("bin") === views("bin")
              && col("v_us") > col("p_us") - us && col("v_us") <= col("p_us"),
            "left")
          .groupBy(col("p_id"))
          .agg(count(col("v_us")).as("n_views_prior_hour"))
          .orderBy(col("p_id"))
      },
      Some("""
        WITH v AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS v_us
                   FROM events WHERE event_type = 'view'),
        p AS (SELECT event_id AS p_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
              FROM events WHERE event_type = 'purchase')
        SELECT p_id, COUNT(v.v_us) AS n_views_prior_hour
        FROM p LEFT JOIN v ON v.v_us > p.p_us - 3600000000 AND v.v_us <= p.p_us
        GROUP BY p_id ORDER BY p_id
      """)),

    // ---- mergeable HLL sketches: nation-level sketches unioned to regions -------
    // The property that makes approximate distinct-counting work at 100 TB
    // is MERGEABILITY: per-shard sketches union into rollup sketches
    // without touching raw data. The gate pins the exact region-level
    // count and checks the merged estimate lands inside the sketch's error
    // envelope.
    Q(
      "q_agg_hll_merge",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_regionkey"))
        val joined = c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        val perNation = joined.groupBy(col("n_regionkey"), col("n_nationkey"))
          .agg(expr("hll_sketch_agg(c_custkey)").as("sk"))
        val merged = perNation.groupBy(col("n_regionkey"))
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
        val exact = joined.groupBy(col("n_regionkey"))
          .agg(countDistinct(col("c_custkey")).as("n_exact"))
        exact.join(merged, Seq("n_regionkey"))
          .select(col("n_regionkey"), col("n_exact"),
            (abs(col("est") - col("n_exact")) <= col("n_exact") * 0.05).as("within_tol"))
          .orderBy(col("n_regionkey"))
      },
      Some("""
        SELECT n_regionkey, COUNT(DISTINCT c_custkey) AS n_exact, TRUE AS within_tol
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_regionkey ORDER BY n_regionkey
      """)),

    // ---- sketch accuracy gate: approx percentile vs exact -----------------------
    // The approx_percentile (KLL-style) sketch is the 100 TB path — one
    // pass, mergeable, bounded memory; the gate emits the exact value and
    // an in-tolerance flag so the oracle pins BOTH the exact result and
    // the sketch's declared error envelope (2% of the group's value range).
    Q(
      "q_agg_approx_percentile",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(
            round(expr("percentile(value, 0.9)"), 4).as("p90_exact"),
            expr("approx_percentile(value, 0.9, 10000)").as("p90_approx"),
            ((max(col("value")) - min(col("value"))) * 0.02).as("tol"))
          .select(col("event_type"), col("p90_exact"),
            (abs(col("p90_approx") - col("p90_exact")) <= col("tol")).as("within_tol"))
          .orderBy(col("event_type")),
      Some("""
        SELECT event_type,
               round(quantile_cont(value, 0.9), 4) AS p90_exact,
               TRUE AS within_tol
        FROM events GROUP BY event_type ORDER BY event_type
      """))
  )
}
