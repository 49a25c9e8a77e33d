package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Conditional / multi-clause MERGE (round-10): `WHEN MATCHED AND <cond>
  * THEN UPDATE/DELETE` with first-match-wins clause order, and conditional
  * full-row inserts — through the DataFrame API, the SQL-text front-end
  * (AcidSql), and the catalog front-end (AcidMergeRule). All three must
  * produce the same state for the same statement.
  */
class ConditionalMergeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("pk", StringType), StructField("part", StringType),
    StructField("v", LongType)))

  private def freshTable(): AcidTable = {
    val t = AcidTable.create(spark,
      Files.createTempDirectory("cmerge-").resolve("t").toString,
      schema, "pk", "part", stablePartitions = true)
    t.upsert(Seq(
      ("a", "p0", 1L), ("b", "p0", 5L), ("c", "p1", 10L), ("d", "p1", 50L))
      .toDF("pk", "part", "v"))
    t
  }

  private def source = Seq(
    ("a", "p0", 100L), // matches clause 1 (s.v >= 100) -> update
    ("b", "p0", 2L),   // matches clause 2 (t.v > s.v)  -> delete
    ("c", "p1", 30L),  // matches no clause (10 < 30 < 100) -> carry
    ("x", "p2", 7L),   // unmatched, s.v < 10           -> insert
    ("y", "p2", 99L))  // unmatched, s.v >= 10          -> not inserted
    .toDF("pk", "part", "v")

  private val expected = Set(
    ("a", "p0", 100L), // updated
    ("c", "p1", 10L),  // carried (clause conditions failed)
    ("d", "p1", 50L),  // untouched
    ("x", "p2", 7L))   // conditionally inserted

  private def state(t: AcidTable): Set[(String, String, Long)] =
    t.snapshot().collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  test("API: first-match-wins update/delete clauses + conditional insert") {
    val t = freshTable()
    t.mergeConditional(source,
      matched = Seq(
        MergeMatchedClause.Update(Some(col("s.v") >= 100), Seq("v")),
        MergeMatchedClause.Delete(Some(col("t.v") > col("s.v")))),
      notMatched = Seq(Some(col("s.v") < 10)))
    assert(state(t) === expected)
  }

  test("API: clause order decides — swapped clauses give the other outcome") {
    val t = freshTable()
    // now the delete clause comes FIRST: row 'a' (t.v=1 < s.v=100) does
    // not match it, still updates; but a row matching BOTH must take the
    // first clause. Seed 'e' so both clauses match it: t.v=500 > s.v=200
    // and s.v >= 100.
    t.upsert(Seq(("e", "p0", 500L)).toDF("pk", "part", "v"))
    val src = source.unionByName(Seq(("e", "p0", 200L)).toDF("pk", "part", "v"))
    t.mergeConditional(src,
      matched = Seq(
        MergeMatchedClause.Delete(Some(col("t.v") > col("s.v"))),
        MergeMatchedClause.Update(Some(col("s.v") >= 100), Seq("v"))),
      notMatched = Seq(Some(col("s.v") < 10)))
    // 'e' deleted (first clause wins), 'b' deleted, 'a' updated
    assert(state(t) === expected)
  }

  test("API: NULL clause condition skips the clause (three-valued guard)") {
    val t = freshTable()
    // v IS NULL in source for 'a' -> s.v >= 100 is NULL -> clause skipped,
    // next clause (unconditional update of part... none) -> carry
    val src = Seq(("a", "p0", Option.empty[java.lang.Long])).toDF("pk", "part", "v")
      .select(col("pk"), col("part"), col("v").cast("long"))
    t.mergeConditional(src,
      matched = Seq(MergeMatchedClause.Update(Some(col("s.v") >= 100), Seq("v"))),
      notMatched = Nil)
    assert(state(t) === Set(
      ("a", "p0", 1L), ("b", "p0", 5L), ("c", "p1", 10L), ("d", "p1", 50L)))
  }

  test("SQL text front-end: conditional clauses route to mergeConditional") {
    val t = freshTable()
    val reg = Map("acid.t" -> t, "t" -> t)
    source.createOrReplaceTempView("cmerge_src")
    AcidSql.execute(spark, reg,
      """MERGE INTO acid.t tgt
        |USING (SELECT * FROM cmerge_src) src
        |ON tgt.pk = src.pk
        |WHEN MATCHED AND src.v >= 100 THEN UPDATE SET tgt.v = src.v
        |WHEN MATCHED AND tgt.v > src.v THEN DELETE
        |WHEN NOT MATCHED AND src.v < 10 THEN
        |  INSERT (tgt.pk, tgt.part, tgt.v) VALUES (src.pk, src.part, src.v)
        |""".stripMargin)
    assert(state(t) === expected)
  }

  test("SQL text front-end: bare column references in clause conditions fail loudly") {
    val t = freshTable()
    val reg = Map("t" -> t)
    source.createOrReplaceTempView("cmerge_src2")
    val e = intercept[IllegalArgumentException](AcidSql.execute(spark, reg,
      """MERGE INTO t tgt USING (SELECT * FROM cmerge_src2) src ON tgt.pk = src.pk
        |WHEN MATCHED AND v >= 100 THEN UPDATE SET tgt.v = src.v
        |WHEN NOT MATCHED THEN INSERT (tgt.pk, tgt.part, tgt.v)
        |  VALUES (src.pk, src.part, src.v)
        |""".stripMargin))
    assert(e.getMessage.contains("qualify"))
  }

  test("NOT MATCHED BY SOURCE deletes unmatched target rows (full-sync shape)") {
    val t = freshTable() // a 1, b 5, c 10, d 50 — source covers a, b, c
    t.mergeConditional(source,
      matched = Seq(MergeMatchedClause.Update(None, Seq("v"))),
      notMatched = Nil,
      // 'd' (v=50) is absent from the source: delete it iff v >= 20
      notMatchedBySource = Seq(MergeMatchedClause.Delete(Some(col("t.v") >= 20))))
    assert(state(t) === Set(("a", "p0", 100L), ("b", "p0", 2L), ("c", "p1", 30L)),
      "unmatched target row matching the NMBS condition must be deleted")
    // the condition guards: re-seed d with a small value, sync again — kept
    t.upsert(Seq(("d", "p1", 5L)).toDF("pk", "part", "v"))
    t.mergeConditional(source,
      matched = Seq(MergeMatchedClause.Update(None, Seq("v"))),
      notMatched = Nil,
      notMatchedBySource = Seq(MergeMatchedClause.Delete(Some(col("t.v") >= 20))))
    assert(state(t).contains(("d", "p1", 5L)))
    // UPDATE clauses are rejected: the same-named-source-copy contract
    // would silently null the row
    intercept[IllegalArgumentException](t.mergeConditional(source,
      matched = Nil, notMatched = Nil,
      notMatchedBySource = Seq(MergeMatchedClause.Update(None, Seq("v")))))
  }

  test("NOT MATCHED BY SOURCE through both SQL front-ends") {
    // text front-end
    val t = freshTable()
    val reg = Map("t" -> t)
    source.createOrReplaceTempView("cmerge_nmbs_src")
    AcidSql.execute(spark, reg,
      """MERGE INTO t tgt USING (SELECT * FROM cmerge_nmbs_src) src
        |ON tgt.pk = src.pk
        |WHEN MATCHED THEN UPDATE SET tgt.v = src.v
        |WHEN NOT MATCHED BY SOURCE AND tgt.v >= 20 THEN DELETE
        |""".stripMargin)
    assert(state(t) === Set(("a", "p0", 100L), ("b", "p0", 2L), ("c", "p1", 30L)))
    // catalog front-end
    val wh = Files.createTempDirectory("cmerge-nmbs-cat-").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.graft.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.nm")
    spark.sql("""CREATE TABLE graft.nm.t (pk STRING, part STRING, v BIGINT)
                |PARTITIONED BY (part)
                |TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    Seq(("a", "p0", 1L), ("b", "p0", 5L), ("c", "p1", 10L), ("d", "p1", 50L))
      .toDF("pk", "part", "v").createOrReplaceTempView("nm_base")
    spark.sql("INSERT INTO graft.nm.t SELECT * FROM nm_base")
    source.createOrReplaceTempView("nm_src")
    spark.sql(
      """MERGE INTO graft.nm.t tgt USING (SELECT * FROM nm_src) src
        |ON tgt.pk = src.pk
        |WHEN MATCHED THEN UPDATE SET tgt.v = src.v
        |WHEN NOT MATCHED BY SOURCE AND tgt.v >= 20 THEN DELETE
        |""".stripMargin)
    val got = spark.sql("SELECT * FROM graft.nm.t").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("a", "p0", 100L), ("b", "p0", 2L), ("c", "p1", 30L)))
    spark.sql("DROP TABLE graft.nm.t")
  }

  test("clauses recompute from the fresh snapshot on an OCC conflict (no lost update)") {
    // the delete clause reads the TARGET value (t.v < 50). Just before our
    // merge publishes, a second handle rewrites the same row to v=100 —
    // same cell, so the conflict takes the redo path and resultOf re-runs
    // against the fresh snapshot: the clause must see 100 and spare the
    // row. A stale-read implementation (clauses frozen at the first read,
    // where v=1 < 50) would delete it.
    val t = AcidTable.create(spark,
      Files.createTempDirectory("cmerge-occ-").resolve("t").toString,
      schema, "pk", "part", stablePartitions = true)
    t.upsert(Seq(("a", "p0", 1L)).toDF("pk", "part", "v"))
    t.beforePublishHook = () => {
      t.beforePublishHook = () => ()
      AcidTable.open(spark, t.path)
        .upsert(Seq(("a", "p0", 100L)).toDF("pk", "part", "v"))
    }
    t.mergeConditional(Seq(("a", "p0", 0L)).toDF("pk", "part", "v"),
      matched = Seq(MergeMatchedClause.Delete(Some(col("t.v") < 50))),
      notMatched = Nil)
    assert(state(t) === Set(("a", "p0", 100L)),
      "conditional merge applied a clause decision computed from a stale read")
  }

  test("catalog front-end: conditional MERGE via spark.sql against GraftCatalog") {
    val wh = Files.createTempDirectory("cmerge-cat-").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.graft.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cm")
    spark.sql("""CREATE TABLE graft.cm.t (pk STRING, part STRING, v BIGINT)
                |PARTITIONED BY (part)
                |TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    Seq(("a", "p0", 1L), ("b", "p0", 5L), ("c", "p1", 10L), ("d", "p1", 50L))
      .toDF("pk", "part", "v").createOrReplaceTempView("cm_base")
    spark.sql("INSERT INTO graft.cm.t SELECT * FROM cm_base")
    source.createOrReplaceTempView("cm_src")
    spark.sql(
      """MERGE INTO graft.cm.t tgt
        |USING (SELECT * FROM cm_src) src
        |ON tgt.pk = src.pk
        |WHEN MATCHED AND src.v >= 100 THEN UPDATE SET tgt.v = src.v
        |WHEN MATCHED AND tgt.v > src.v THEN DELETE
        |WHEN NOT MATCHED AND src.v < 10 THEN
        |  INSERT (tgt.pk, tgt.part, tgt.v) VALUES (src.pk, src.part, src.v)
        |""".stripMargin)
    val got = spark.sql("SELECT * FROM graft.cm.t").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expected)
    spark.sql("DROP TABLE graft.cm.t")
  }

  test("expression assignments (round 10b): RHS over the t/s pre-image, all front-ends") {
    // API: t.v + s.v, and a literal — both see the PRE-image
    val t1 = freshTable()
    t1.mergeConditional(source,
      matched = Seq(
        MergeMatchedClause.UpdateExprs(Some(col("s.v") >= 100),
          Seq("v" -> (col("t.v") + col("s.v")))),
        MergeMatchedClause.UpdateExprs(None, Seq("v" -> lit(0L)))),
      notMatched = Nil)
    assert(state(t1) === Set(
      ("a", "p0", 101L), // 1 + 100 (clause 1)
      ("b", "p0", 0L), ("c", "p1", 0L), // clause 2 literal
      ("d", "p1", 50L))) // unmatched by source: carried

    // nondeterministic RHS rejected up front
    val t2 = freshTable()
    intercept[IllegalArgumentException] {
      t2.mergeConditional(source,
        matched = Seq(MergeMatchedClause.UpdateExprs(None,
          Seq("v" -> (rand() * 100).cast("long")))),
        notMatched = Nil)
    }
    // unknown column / key assignment rejected
    intercept[IllegalArgumentException] {
      t2.mergeConditional(source,
        matched = Seq(MergeMatchedClause.UpdateExprs(None, Seq("nope" -> lit(1L)))),
        notMatched = Nil)
    }
    intercept[IllegalArgumentException] {
      t2.mergeConditional(source,
        matched = Seq(MergeMatchedClause.UpdateExprs(None, Seq("pk" -> lit("z")))),
        notMatched = Nil)
    }

    // text front-end: transformed SET routes to the expression clause
    val t3 = freshTable()
    val reg = Map("acid.t" -> t3, "t" -> t3)
    source.createOrReplaceTempView("cmerge_expr_src")
    AcidSql.execute(spark, reg,
      """MERGE INTO acid.t tgt
        |USING (SELECT * FROM cmerge_expr_src) src
        |ON tgt.pk = src.pk
        |WHEN MATCHED THEN UPDATE SET tgt.v = tgt.v + src.v * 2
        |WHEN NOT MATCHED AND src.v < 10 THEN
        |  INSERT (tgt.pk, tgt.part, tgt.v) VALUES (src.pk, src.part, src.v)
        |""".stripMargin)
    assert(state(t3) === Set(
      ("a", "p0", 201L),  // 1 + 100*2
      ("b", "p0", 9L),    // 5 + 2*2
      ("c", "p1", 70L),   // 10 + 30*2
      ("d", "p1", 50L),   // unmatched by source
      ("x", "p2", 7L)))   // conditional insert

    // unconditional transformed SET + full insert also works through the
    // text path (previously it would have MISCOMPILED as an identity copy)
    val t4 = freshTable()
    val reg4 = Map("acid.t" -> t4, "t" -> t4)
    AcidSql.execute(spark, reg4,
      """MERGE INTO acid.t tgt
        |USING (SELECT * FROM cmerge_expr_src) src
        |ON tgt.pk = src.pk
        |WHEN MATCHED THEN UPDATE SET tgt.v = src.v * 10
        |WHEN NOT MATCHED THEN
        |  INSERT (tgt.pk, tgt.part, tgt.v) VALUES (src.pk, src.part, src.v)
        |""".stripMargin)
    assert(state(t4) === Set(
      ("a", "p0", 1000L), ("b", "p0", 20L), ("c", "p1", 300L),
      ("d", "p1", 50L), ("x", "p2", 7L), ("y", "p2", 99L)))
  }

  test("expression INSERT clauses (round 10b): transformed/partial, first-match-wins, cells follow images") {
    val t = freshTable() // a, b, c, d
    val src = Seq(("n1", "px", 3L), ("n2", "px", 30L)).toDF("pk", "part", "v")
    t.mergeClauses(src,
      matched = Nil,
      notMatched = Seq(
        // clause 1: small rows insert TRANSFORMED — computed pk, a
        // partition the raw source never names (cells must follow the
        // IMAGE, not the source row), scaled value
        MergeInsertClause(Some(col("s.v") < 10),
          Some(Seq(
            "pk" -> concat(lit("lo-"), col("s.pk")),
            "part" -> lit("pLow"),
            "v" -> (col("s.v") * 100)))),
        // clause 2: PARTIAL insert — v unassigned → NULL
        MergeInsertClause(None,
          Some(Seq("pk" -> col("s.pk"), "part" -> col("s.part"))))))
    val rows = t.snapshot().collect()
      .map(r => r.getString(0) -> (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(rows("lo-n1") === (("pLow", Some(300L))), s"transformed insert wrong: $rows")
    assert(rows("n2") === (("px", None)), s"partial insert must NULL unassigned cols: $rows")
    assert(rows.keySet === Set("a", "b", "c", "d", "lo-n1", "n2"))

    // key/partition must be assigned; target references rejected
    intercept[IllegalArgumentException] {
      freshTable().mergeClauses(src, Nil,
        notMatched = Seq(MergeInsertClause(None, Some(Seq("v" -> lit(1L))))))
    }
    intercept[IllegalArgumentException] {
      freshTable().mergeClauses(src, Nil,
        notMatched = Seq(MergeInsertClause(None, Some(Seq(
          "pk" -> col("s.pk"), "part" -> col("s.part"), "v" -> col("t.v"))))))
    }

    // text front-end: reordered VALUES execute as written
    val t2 = freshTable()
    val reg = Map("acid.t" -> t2, "t" -> t2)
    Seq(("n9", "pz", 5L)).toDF("pk", "part", "v")
      .createOrReplaceTempView("ins_expr_src")
    AcidSql.execute(spark, reg,
      """MERGE INTO acid.t tgt
        |USING (SELECT * FROM ins_expr_src) src
        |ON tgt.pk = src.pk
        |WHEN NOT MATCHED THEN INSERT (tgt.pk, tgt.part, tgt.v)
        |  VALUES (src.part, src.pk, src.v * 7)
        |""".stripMargin)
    assert(state(t2).contains(("pz", "n9", 35L)),
      "reordered/transformed VALUES must insert columns as written")
  }

  test("NOT MATCHED BY SOURCE expression UPDATE (round 10b): mark stale rows, all front-ends") {
    // API: rows absent from the source get a t-only expression update —
    // the "mark stale" pattern Delta's NMBS UPDATE exists for
    val t1 = freshTable()
    t1.mergeConditional(
      Seq(("a", "p0", 100L)).toDF("pk", "part", "v"),
      matched = Seq(MergeMatchedClause.Update(None, Seq("v"))),
      notMatched = Nil,
      notMatchedBySource = Seq(
        MergeMatchedClause.Delete(Some(col("t.v") >= 50)),
        MergeMatchedClause.UpdateExprs(None, Seq("v" -> (col("t.v") * -1)))))
    assert(state(t1) === Set(
      ("a", "p0", 100L), // matched update
      ("b", "p0", -5L),  // NMBS expr update (second clause)
      ("c", "p1", -10L), // NMBS expr update
      /* d deleted: NMBS delete clause first-match (t.v=50 >= 50) */ ))

    // source-side reference in an NMBS assignment fails loudly (the rows
    // have no source image)
    intercept[IllegalArgumentException] {
      freshTable().mergeConditional(
        Seq(("a", "p0", 1L)).toDF("pk", "part", "v"),
        matched = Nil, notMatched = Nil,
        notMatchedBySource = Seq(
          MergeMatchedClause.UpdateExprs(None, Seq("v" -> col("s.v")))))
    }
    // identity Update (source-copy shape) stays rejected for NMBS
    intercept[IllegalArgumentException] {
      freshTable().mergeConditional(
        Seq(("a", "p0", 1L)).toDF("pk", "part", "v"),
        matched = Nil, notMatched = Nil,
        notMatchedBySource = Seq(MergeMatchedClause.Update(None, Seq("v"))))
    }

    // text front-end
    val t2 = freshTable()
    val reg = Map("acid.t" -> t2, "t" -> t2)
    Seq(("a", "p0", 100L)).toDF("pk", "part", "v")
      .createOrReplaceTempView("nmbs_upd_src")
    AcidSql.execute(spark, reg,
      """MERGE INTO acid.t tgt
        |USING (SELECT * FROM nmbs_upd_src) src
        |ON tgt.pk = src.pk
        |WHEN MATCHED THEN UPDATE SET tgt.v = src.v
        |WHEN NOT MATCHED BY SOURCE AND tgt.v < 50 THEN UPDATE SET tgt.v = tgt.v + 1000
        |""".stripMargin)
    assert(state(t2) === Set(
      ("a", "p0", 100L), ("b", "p0", 1005L), ("c", "p1", 1010L), ("d", "p1", 50L)))

    // catalog front-end
    val wh = Files.createTempDirectory("cmerge-nmbs-upd-").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.graft.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.nu")
    spark.sql("""CREATE TABLE graft.nu.t (pk STRING, part STRING, v BIGINT)
                |PARTITIONED BY (part) TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    Seq(("a", "p0", 1L), ("b", "p0", 5L)).toDF("pk", "part", "v")
      .createOrReplaceTempView("nu_seed")
    spark.sql("INSERT INTO graft.nu.t SELECT * FROM nu_seed")
    Seq(("a", "p0", 9L)).toDF("pk", "part", "v").createOrReplaceTempView("nu_src")
    spark.sql("""MERGE INTO graft.nu.t t USING (SELECT * FROM nu_src) s
                |ON t.pk = s.pk
                |WHEN MATCHED THEN UPDATE SET t.v = s.v
                |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.v = t.v * 100""".stripMargin)
    assert(spark.sql("SELECT pk, v FROM graft.nu.t ORDER BY pk")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      === Seq(("a", 9L), ("b", 500L)))
    spark.sql("DROP TABLE graft.nu.t")
  }
}
