package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.Tables

/** SURVEY §2C C29-C36 + C47: scalar function surface. Everything here is a
  * built-in Catalyst expression (whole-stage-codegen'd); the single Scala
  * UDF (C47) is quarantined in its own query so the rest of the surface
  * never pays the serialization tax.
  */
object FunctionQueries {

  def all: Seq[Q] = Seq(
    // ---- C29 string functions ---------------------------------------------
    Q(
      "q_fn_string",
      (s, dir) => {
        val p = Tables.part(s, dir)
        p.select(
            col("p_partkey"),
            concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
            substring(col("p_name"), 1, 5).as("name5"),
            upper(col("p_name")).as("name_up"),
            lower(col("p_type")).as("type_lo"),
            trim(concat(lit("  "), col("p_name"), lit("  "))).as("name_trim"),
            length(col("p_name")).cast("long").as("name_len"),
            size(split(col("p_name"), " ")).cast("long").as("n_words"),
            regexp_extract(col("p_brand"), "#([0-9]+)", 1).as("brand_num"),
            regexp_replace(col("p_name"), "[aeiou]", "_").as("name_novowel"),
            lpad(col("p_partkey").cast("string"), 8, "0").as("key_pad"),
            instr(col("p_name"), "e").cast("long").as("first_e"))
          .orderBy(col("p_partkey"))
      },
      Some("""
        SELECT p_partkey,
               p_brand || '/' || p_type AS brand_type,
               substring(p_name, 1, 5) AS name5,
               upper(p_name) AS name_up,
               lower(p_type) AS type_lo,
               trim('  ' || p_name || '  ') AS name_trim,
               CAST(length(p_name) AS BIGINT) AS name_len,
               CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
               regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
               regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_novowel,
               lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad,
               CAST(instr(p_name, 'e') AS BIGINT) AS first_e
        FROM part ORDER BY p_partkey
      """)),

    // ---- C30 date/time functions --------------------------------------------
    Q(
      "q_fn_datetime",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("y"),
            month(col("o_orderdate")).cast("long").as("m"),
            dayofmonth(col("o_orderdate")).cast("long").as("d"),
            date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
            date_format(date_add(to_date(col("o_orderdate")), 30), "yyyy-MM-dd").as("plus30"),
            datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
              .cast("long").as("days_since_95"),
            unix_timestamp(col("o_orderdate")).as("epoch_s"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS y,
               CAST(month(o_orderdate) AS BIGINT) AS m,
               CAST(day(o_orderdate) AS BIGINT) AS d,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
               date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
               CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
        FROM orders ORDER BY o_orderkey
      """)),

    // ---- C30 hour/minute on event timestamps ---------------------------------
    Q(
      "q_fn_event_time",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.groupBy(
            dayofmonth(col("ts")).cast("long").as("d"),
            hour(col("ts")).cast("long").as("h"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("d"), col("h"))
      },
      Some("""
        SELECT CAST(day(CAST(ts AS TIMESTAMP)) AS BIGINT) AS d,
               CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS h,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY d, h
      """)),

    // ---- C31 math functions ----------------------------------------------------
    Q(
      "q_fn_math",
      (s, dir) => {
        val p = Tables.part(s, dir)
        p.select(
            col("p_partkey"),
            round(col("p_retailprice") * 1.1, 2).as("up10"),
            floor(col("p_retailprice")).cast("long").as("fl"),
            ceil(col("p_retailprice")).cast("long").as("ce"),
            abs(col("p_size") - 25).cast("long").as("dist25"),
            pow(col("p_size").cast("double"), 2.0).as("size_sq"),
            sqrt(col("p_size").cast("double")).as("size_sqrt"),
            round(log(col("p_retailprice")), 6).as("ln_price"),
            round(log10(col("p_retailprice")), 6).as("log10_price"),
            (col("p_partkey") % 13).as("mod13"))
          .orderBy(col("p_partkey"))
      },
      Some("""
        SELECT p_partkey,
               round(p_retailprice * 1.1, 2) AS up10,
               CAST(floor(p_retailprice) AS BIGINT) AS fl,
               CAST(ceil(p_retailprice) AS BIGINT) AS ce,
               CAST(abs(p_size - 25) AS BIGINT) AS dist25,
               pow(CAST(p_size AS DOUBLE), 2.0) AS size_sq,
               sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
               round(ln(p_retailprice), 6) AS ln_price,
               round(log10(p_retailprice), 6) AS log10_price,
               p_partkey % 13 AS mod13
        FROM part ORDER BY p_partkey
      """)),

    // ---- C32 conditional expressions ---------------------------------------------
    Q(
      "q_fn_conditional",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        c.select(
            col("c_custkey"),
            when(col("c_acctbal") < 0, "negative")
              .when(col("c_acctbal") < 5000, "mid")
              .otherwise("high").as("bal_band"),
            coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(redacted)"))
              .as("seg_masked"),
            greatest(col("c_nationkey"), lit(10)).cast("long").as("nk_hi"),
            least(col("c_nationkey"), lit(10)).cast("long").as("nk_lo"),
            expr("if(c_acctbal >= 0, 'credit', 'debit')").as("side"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'negative'
                    WHEN c_acctbal < 5000 THEN 'mid'
                    ELSE 'high' END AS bal_band,
               COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(redacted)') AS seg_masked,
               CAST(greatest(c_nationkey, 10) AS BIGINT) AS nk_hi,
               CAST(least(c_nationkey, 10) AS BIGINT) AS nk_lo,
               if(c_acctbal >= 0, 'credit', 'debit') AS side
        FROM customer ORDER BY c_custkey
      """)),

    // ---- C33 casts + decimal money arithmetic --------------------------------------
    Q(
      "q_fn_cast_decimal",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.select(
            col("o_orderkey"),
            col("o_totalprice").cast("decimal(18,2)").cast("string").as("price_dec"),
            (col("o_totalprice").cast("decimal(18,2)") * 2).cast("string").as("price_x2"),
            col("o_orderkey").cast("string").as("key_str"),
            (col("o_orderkey").cast("string").cast("long") + 1L).as("key_roundtrip"),
            col("o_totalprice").cast("int").cast("long").as("price_int"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS VARCHAR) AS price_x2,
               CAST(o_orderkey AS VARCHAR) AS key_str,
               CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) + 1 AS key_roundtrip,
               CAST(trunc(o_totalprice) AS BIGINT) AS price_int
        FROM orders ORDER BY o_orderkey
      """)),

    // ---- C34 arrays: constructors, predicates, explode, HOFs -------------------------
    Q(
      "q_fn_array",
      (s, dir) => {
        val p = Tables.part(s, dir).filter(col("p_partkey") < 500)
        p.select(
            col("p_partkey"),
            concat_ws(",", sort_array(array(
              (col("p_partkey") % 7).cast("int"),
              (col("p_partkey") % 5).cast("int"),
              (col("p_partkey") % 3).cast("int")))).as("mods_sorted"),
            array_contains(
              array((col("p_partkey") % 7).cast("int"), (col("p_partkey") % 5).cast("int")),
              lit(0)).as("has_zero"),
            aggregate(
              transform(sequence(lit(1), (col("p_size") % 4) + 1), x => x * x),
              lit(0L), (acc, x) => acc + x).as("sum_squares"),
            size(filter(sequence(lit(1), lit(10)), x => x % 2 === 0)).cast("long")
              .as("n_even"))
          .orderBy(col("p_partkey"))
      },
      Some("""
        SELECT p_partkey,
               array_to_string(list_sort([CAST(p_partkey % 7 AS INT),
                                          CAST(p_partkey % 5 AS INT),
                                          CAST(p_partkey % 3 AS INT)]), ',') AS mods_sorted,
               list_contains([CAST(p_partkey % 7 AS INT), CAST(p_partkey % 5 AS INT)], 0) AS has_zero,
               CAST(list_aggregate(list_transform(range(1, CAST(p_size % 4 AS BIGINT) + 2), x -> x * x), 'sum') AS BIGINT) AS sum_squares,
               CAST(len(list_filter(range(1, 11), x -> x % 2 = 0)) AS BIGINT) AS n_even
        FROM part WHERE p_partkey < 500 ORDER BY p_partkey
      """)),

    // ---- C34 explode / posexplode as a lateral row generator --------------------------
    Q(
      "q_fn_explode",
      (s, dir) => {
        val d = Tables.documents(s, dir).filter(col("doc_id") < 20)
        d.select(col("doc_id"), posexplode(split(trim(col("text")), " ")))
          .withColumnRenamed("pos", "word_pos")
          .withColumn("word_pos", col("word_pos").cast("long"))
          .withColumnRenamed("col", "word")
          .orderBy(col("doc_id"), col("word_pos"))
      },
      Some("""
        SELECT doc_id,
               CAST(u.pos - 1 AS BIGINT) AS word_pos,
               u.word
        FROM documents,
             LATERAL (SELECT unnest(string_split(trim(text), ' ')) AS word,
                             generate_subscripts(string_split(trim(text), ' '), 1) AS pos) u
        WHERE doc_id < 20
        ORDER BY doc_id, word_pos
      """)),

    // ---- C35 maps (round-trip through MapType, scalar out) ----------------------------
    Q(
      "q_fn_map",
      (s, dir) => {
        val c = Tables.customer(s, dir).filter(col("c_custkey") < 200)
        val m = map(
          lit("seg"), col("c_mktsegment"),
          lit("nation"), col("c_nationkey").cast("string"))
        c.select(
            col("c_custkey"),
            element_at(m, "seg").as("seg_out"),
            element_at(m, "nation").as("nation_out"),
            concat_ws(",", map_keys(m)).as("keys_out"),
            size(m).cast("long").as("map_size"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey,
               c_mktsegment AS seg_out,
               CAST(c_nationkey AS VARCHAR) AS nation_out,
               'seg,nation' AS keys_out,
               CAST(2 AS BIGINT) AS map_size
        FROM customer WHERE c_custkey < 200 ORDER BY c_custkey
      """)),

    // ---- C36 JSON: parse, extract, aggregate over extracted values --------------------
    Q(
      "q_fn_json",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.select(
            col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k_get"),
            from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
              .getField("k").cast("long").as("k_parsed"))
          .groupBy(col("event_type"))
          .agg(
            sum(col("k_get")).as("sum_k"),
            sum(col("k_parsed")).as("sum_k_parsed"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k_parsed,
               COUNT(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type
      """)),

    // ---- C36+ VARIANT semi-structured type (Spark 4) --------------------------
    // The open-format semi-structured path: JSON → parse_json → VARIANT →
    // typed variant_get extraction. The roundtrip must reproduce the
    // source values exactly (shortest-round-trip double printing +
    // variant numeric parsing), and a missing path must be NULL, not an
    // error — pinned against a pure relational reconstruction.
    Q(
      "q_fn_variant",
      (s, dir) => {
        Tables.orders(s, dir).filter(col("o_orderkey") < 500)
          .select(col("o_orderkey"),
            parse_json(to_json(struct(
              col("o_custkey"), col("o_totalprice"), col("o_orderstatus")))).as("v"))
          .select(col("o_orderkey"),
            expr("variant_get(v, '$.o_custkey', 'bigint')").as("custkey"),
            expr("variant_get(v, '$.o_totalprice', 'double')").as("price"),
            expr("variant_get(v, '$.o_orderstatus', 'string')").as("status"),
            expr("try_variant_get(v, '$.missing', 'string')").as("absent"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS custkey,
               CAST(o_totalprice AS DOUBLE) AS price,
               o_orderstatus AS status, CAST(NULL AS VARCHAR) AS absent
        FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey
      """)),

    // ---- C47 Scala UDF (row-scalar) -----------------------------------------------------
    Q(
      "q_fn_udf",
      (s, dir) => {
        // deterministic pure-Scala scalar; the codegen'd built-in formulation
        // of the same logic lives in q_fn_string — this entry exercises the
        // UDF extension surface itself
        val initials = udf((name: String) =>
          name.split(" ").filter(_.nonEmpty).map(_.head.toUpper).mkString("."))
        val p = Tables.part(s, dir)
        p.select(col("p_partkey"), initials(col("p_name")).as("initials"))
          .orderBy(col("p_partkey"))
      },
      Some("""
        SELECT p_partkey,
               array_to_string(list_transform(list_filter(string_split(p_name, ' '), w -> len(w) > 0),
                                              w -> upper(w[1])), '.') AS initials
        FROM part ORDER BY p_partkey
      """))
  )
}
