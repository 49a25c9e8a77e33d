package graft.lake

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Record

/** Merge-on-read deletes via inline deletion vectors
  * ([[AcidTable.deleteVectored]]): a point delete commits O(keys)
  * metadata (the `#dvs=` manifest header) and rewrites NO data files;
  * readers hide the entries; any later commit touching an entry's cell
  * materializes it. These tests pin the full lifecycle: zero-rewrite
  * commit, time travel, lookup, re-insert, compaction sweep, CDC diff,
  * restore, clone, COW fallback, and a writer race.
  */
class DeletionVectorSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("primaryKeyValue", StringType),
    StructField("partitionKeyValue", StringType),
    StructField("dataValue", StringType)))

  private def tmp(): String =
    Files.createTempDirectory("dv-spec-").resolve("t").toString

  private def df(rs: Record*) = spark.createDataset(rs).toDF()

  private def manifestText(t: AcidTable, v: Long): String =
    new String(Files.readAllBytes(
      Paths.get(t.path, "_commits", f"v$v%012d.txt")), StandardCharsets.UTF_8)

  private def dataLines(t: AcidTable, v: Long): Seq[String] =
    manifestText(t, v).linesIterator.filterNot(_.startsWith("#")).filter(_.nonEmpty).toSeq

  private def dvHeader(t: AcidTable, v: Long): Option[String] =
    manifestText(t, v).linesIterator.find(_.startsWith("#dvs="))

  private def seeded(n: Int = 8): (AcidTable, Long) = {
    val t = AcidTable.create(spark, tmp(), schema, "primaryKeyValue", "partitionKeyValue")
    val v = t.upsert(df((1 to n).map(i => Record(s"R$i", s"P${i % 2}", s"v$i")): _*))
    (t, v)
  }

  test("deleteVectored hides the row without rewriting any data file") {
    val (t, v0) = seeded()
    val v1 = t.deleteVectored(Seq("R3"))
    assert(v1 == v0 + 1)
    // zero data I/O: the new manifest references the SAME files
    assert(dataLines(t, v1) == dataLines(t, v0))
    assert(dvHeader(t, v1).exists(_.contains("R3")))
    val rows = t.snapshot().as[Record].collect()
    assert(rows.length == 7 && !rows.exists(_.primaryKeyValue == "R3"))
    // time travel: the pre-delete version still shows the row
    assert(t.snapshot(v0).as[Record].collect().exists(_.primaryKeyValue == "R3"))
    // lookup respects the entry; other keys unaffected
    assert(t.lookup(Seq("R3")).count() == 0)
    assert(t.lookup(Seq("R4")).count() == 1)
  }

  test("a NULL partition alongside a non-null pk voids the hint, not the delete") {
    // round-14 ADVICE (medium): the hinted probe must cover EVERY key that
    // stays in the key set — a (pk, NULL-partition) caller row keeps its
    // key but has no partition to restate, so the hint must be dropped
    // outright (hinting around it silently no-ops that key's delete)
    val t = AcidTable.create(spark, tmp(), schema, "primaryKeyValue",
      "partitionKeyValue", stablePartitions = true)
    t.upsert(df((1 to 8).map(i => Record(s"R$i", s"P${i % 2}", s"v$i")): _*))
    // R3 lives in P1; the caller restates R4's partition (P0) but passes
    // NULL for R3's — before the fix the hint [P0] skipped P1's segments
    // and R3 survived the delete
    val keys = Seq(("R3", null: String), ("R4", "P0"))
      .toDF("primaryKeyValue", "partitionKeyValue")
    t.deleteVectored(keys)
    val left = t.snapshot().as[Record].collect().map(_.primaryKeyValue).toSet
    assert(!left.contains("R3"),
      "NULL-partition key must still be deleted (hint voided, full probe)")
    assert(!left.contains("R4") && left.size == 6)
  }

  test("a commit touching the entry's cell materializes it; other cells' entries survive") {
    val (t, _) = seeded()
    // R1 lives in P1, R2 in P0 — two distinct cells
    val v1 = t.deleteVectored(Seq("R1", "R2"))
    assert(dvHeader(t, v1).exists(h => h.contains("R1") && h.contains("R2")))
    // re-insert R1: the upsert touches R1's cell, so its entry drops and
    // the new row is visible; R2's entry (another cell) stays live
    val v2 = t.upsert(df(Record("R1", "P1", "reborn")))
    val h2 = dvHeader(t, v2).getOrElse("")
    assert(!h2.contains("R1"), s"R1 entry not materialized: $h2")
    assert(h2.contains("R2"), s"R2 entry lost: $h2")
    val rows = t.snapshot().as[Record].collect()
    assert(rows.exists(r => r.primaryKeyValue == "R1" && r.dataValue == "reborn"))
    assert(!rows.exists(_.primaryKeyValue == "R2"))
  }

  test("compact sweeps partitions with entries even below the small-file threshold") {
    val (t, _) = seeded()
    t.deleteVectored(Seq("R5"))
    // one file per touched cell so far — well under maxFilesPerPartition
    val vc = t.compact(maxFilesPerPartition = 100)
    assert(vc >= 0, "compact must run for the DV partition")
    assert(dvHeader(t, vc).isEmpty, s"entries survived compaction: ${dvHeader(t, vc)}")
    val rows = t.snapshot().as[Record].collect()
    assert(rows.length == 7 && !rows.exists(_.primaryKeyValue == "R5"))
  }

  test("changesBetween reports the MOR delete once; materialization adds nothing") {
    val (t, v0) = seeded()
    val v1 = t.deleteVectored(Seq("R6"))
    val d1 = t.changesBetween(v0, v1).collect()
    assert(d1.length == 1)
    assert(d1.head.getAs[String]("_change_type") == "delete")
    assert(d1.head.getAs[String]("primaryKeyValue") == "R6")
    // an upsert of ANOTHER key in R6's partition materializes the entry —
    // the CDC diff of that commit must NOT re-report R6's delete
    val v2 = t.upsert(df(Record("R9", "P0", "v9")))
    val d2 = t.changesBetween(v1, v2).collect()
    assert(d2.forall(_.getAs[String]("primaryKeyValue") != "R6"), d2.mkString(";"))
    assert(d2.exists(r => r.getAs[String]("primaryKeyValue") == "R9" &&
      r.getAs[String]("_change_type") == "insert"))
  }

  test("update/deleteWhere over a table with live entries do not resurrect rows") {
    val (t, _) = seeded()
    t.deleteVectored(Seq("R7"))
    // R7 is in P1; update every P1 row — rewrites R7's cell from the
    // DV-applied pre-image
    val vu = t.update(Seq("dataValue" -> lit("upd")),
      col("partitionKeyValue") === "P1")
    assert(dvHeader(t, vu).isEmpty)
    val rows = t.snapshot().as[Record].collect()
    assert(!rows.exists(_.primaryKeyValue == "R7"), "deleted row resurrected by UPDATE")
    assert(rows.filter(_.partitionKeyValue == "P1").forall(_.dataValue == "upd"))
  }

  test("restore before/after the entry; clone carries it") {
    val (t, v0) = seeded()
    val v1 = t.deleteVectored(Seq("R4"))
    // clone of the DV version hides the row in the clone
    val c = t.cloneTo(Files.createTempDirectory("dv-clone-").resolve("c").toString)
    assert(c.snapshot().count() == 7)
    assert(c.lookup(Seq("R4")).count() == 0)
    // restore source to the pre-delete version: row resurrects
    t.restore(v0)
    assert(t.snapshot().count() == 8)
    // restore forward to the DV version's state: hidden again
    t.restore(v1)
    assert(t.snapshot().count() == 7)
  }

  test("no-op and fallback: absent keys commit nothing; big key sets take the COW path") {
    val (t, v0) = seeded()
    val v1 = t.deleteVectored(Seq("NOPE"))
    assert(v1 == v0, "absent-key delete must not commit")
    assert(dvHeader(t, v0).isEmpty)
    // COW fallback: over MorMaxKeys distinct keys → data files rewritten
    val many = (1 to (AcidTable.MorMaxKeys + 1)).map(i => s"K$i")
    val big = AcidTable.create(spark, tmp(), schema, "primaryKeyValue", "partitionKeyValue")
    big.upsert(df((1 to 6).map(i => Record(s"K$i", "P0", s"v$i")): _*))
    val vb = big.deleteVectored(many)
    assert(dvHeader(big, vb).isEmpty, "COW fallback must not write entries")
    assert(big.snapshot().count() == 0)
  }

  test("morDeletes table mode routes key deletes through DVs from every front-end") {
    val (t, v0) = seeded()
    t.setTableProperty("morDeletes", Some("true"))
    assert(t.morDeletes)
    // API delete: DV commit, no file rewrite
    val v1 = t.delete(Seq("R1"))
    assert(dvHeader(t, v1).isDefined)
    assert(dataLines(t, v1).toSet === dataLines(t, v0).toSet)
    // SQL text front-end DELETE pk IN (…) routes through the same mode
    val v2 = AcidSql.execute(spark, Map("t" -> t),
      "DELETE FROM t WHERE primaryKeyValue IN ('R2')")
    assert(dvHeader(t, v2).get.contains("R2"))
    assert(dataLines(t, v2).toSet === dataLines(t, v0).toSet)
    assert(t.snapshot().count() === 6)
    // UNSET flips back to copy-on-write
    t.setTableProperty("morDeletes", None)
    val v3 = t.delete(Seq("R3"))
    assert(dataLines(t, v3).toSet !== dataLines(t, v0).toSet)
    assert(t.snapshot().count() === 5)
  }

  test("table properties survive schema-evolution meta rewrites") {
    val (t, _) = seeded()
    t.setTableProperty("morDeletes", Some("true"))
    t.setTableProperty("team", Some("data-eng"))
    val t2 = t.addColumns(Seq(
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.StringType, nullable = true)))
    assert(t2.morDeletes, "addColumns meta rewrite dropped morDeletes")
    assert(t2.tableProperty("team") === Some("data-eng"))
    assert(AcidTable.open(spark, t.path).tableProperties ===
      Map("morDeletes" -> "true", "team" -> "data-eng"))
  }

  test("catalog: CREATE TABLE TBLPROPERTIES morDeletes + ALTER SET/UNSET + SHOW") {
    val wh = Files.createTempDirectory("dv-cat-wh-").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.graft.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dv")
    spark.sql("""CREATE TABLE graft.dv.t (pk STRING, part STRING, v STRING)
      PARTITIONED BY (part)
      TBLPROPERTIES ('primaryKey' = 'pk', 'morDeletes' = 'true')""")
    spark.sql("INSERT INTO graft.dv.t VALUES ('a','P0','1'), ('b','P1','2'), ('c','P0','3')")
    val t = AcidTable.open(spark, s"$wh/dv/t")
    assert(t.morDeletes)
    val props = spark.sql("SHOW TBLPROPERTIES graft.dv.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("morDeletes") === Some("true"))
    // catalog DELETE routes through the DV path (no data-file change)
    val before = t.latestVersion()
    spark.sql("DELETE FROM graft.dv.t WHERE pk = 'a'")
    val after = t.latestVersion()
    assert(dataLines(t, after).toSet === dataLines(t, before).toSet)
    assert(dvHeader(t, after).isDefined)
    assert(spark.sql("SELECT * FROM graft.dv.t").count() === 2)
    // ALTER TABLE UNSET: back to copy-on-write
    spark.sql("ALTER TABLE graft.dv.t UNSET TBLPROPERTIES ('morDeletes')")
    assert(!AcidTable.open(spark, s"$wh/dv/t").morDeletes)
    spark.sql("DELETE FROM graft.dv.t WHERE pk = 'b'")
    assert(dvHeader(t, t.latestVersion()).isEmpty
      || !dvHeader(t, t.latestVersion()).get.contains("%62") &&
        !dvHeader(t, t.latestVersion()).get.contains("b|"))
    assert(spark.sql("SELECT * FROM graft.dv.t").count() === 1)
    // ALTER TABLE SET re-arms it
    spark.sql("ALTER TABLE graft.dv.t SET TBLPROPERTIES ('morDeletes' = 'true')")
    assert(AcidTable.open(spark, s"$wh/dv/t").morDeletes)
    // structural keys are rejected, not stored as inert lies
    Seq("primaryKey", "numBuckets", "preCombinedField").foreach { k =>
      val e = intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.dv.t SET TBLPROPERTIES ('$k' = '64')")
      }
      def hasStructural(t: Throwable): Boolean =
        t != null && (Option(t.getMessage).exists(_.contains("structural")) ||
          hasStructural(t.getCause))
      assert(hasStructural(e), s"SET TBLPROPERTIES('$k') did not reject: $e")
    }
  }

  test("morDeletes routes a bounded predicate DELETE through DVs; unbounded/null-pk keep COW") {
    val (t, v0) = seeded()
    t.setTableProperty("morDeletes", Some("true"))
    // bounded matched set: DV commit, zero data I/O, content identical to
    // what the rewrite would produce
    val v1 = t.deleteWhere(col("dataValue").isin("v2", "v5"))
    assert(dataLines(t, v1).toSet === dataLines(t, v0).toSet)
    assert(dvHeader(t, v1).exists(h => h.contains("R2") && h.contains("R5")))
    assert(t.snapshot().as[Record].collect().map(_.primaryKeyValue).toSet ===
      Set("R1", "R3", "R4", "R6", "R7", "R8"))
    // empty matched set: no commit at all
    assert(t.deleteWhere(col("dataValue") === "no-such") === v1)
    // SQL text front-end predicate DELETE routes through the same mode
    val v2 = AcidSql.execute(spark, Map("t" -> t),
      "DELETE FROM t WHERE dataValue = 'v7'")
    assert(dataLines(t, v2).toSet === dataLines(t, v0).toSet)
    assert(t.snapshot().count() === 5)
    // a matched NULL pk has no DV representation: the COW rewrite runs
    val tn = AcidTable.create(spark, tmp(), schema, "primaryKeyValue", "partitionKeyValue")
    tn.setTableProperty("morDeletes", Some("true"))
    tn.upsert(df(Record("K1", "P0", "x"), Record("K2", "P0", "y")))
    val vn0 = tn.upsert(spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(null, "P0", "x")), schema))
    val vn1 = tn.deleteWhere(col("dataValue") === "x")
    assert(dataLines(tn, vn1).toSet !== dataLines(tn, vn0).toSet,
      "null-pk match must force the rewrite path")
    assert(tn.snapshot().collect().map(_.getString(2)).toSeq === Seq("y"))
  }

  test("a deleteVectored racing an upsert of the same key never shows the stale value") {
    val (t, _) = seeded()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      (1 to 10).foreach { i =>
        t.upsert(df(Record("RX", "P0", s"old$i")))
        val del = pool.submit(new Runnable {
          def run(): Unit = { t.deleteVectored(Seq("RX")); () }
        })
        val ups = pool.submit(new Runnable {
          def run(): Unit = { t.upsert(df(Record("RX", "P0", s"new$i"))); () }
        })
        del.get(); ups.get()
        val vals = t.lookup(Seq("RX")).as[Record].collect().map(_.dataValue).toSeq
        // version order decides: delete-last → absent; upsert-last → new$i.
        // The OLD pre-race value must never survive both commits.
        assert(vals.isEmpty || vals == Seq(s"new$i"), s"round $i saw $vals")
      }
    } finally pool.shutdown()
  }

  test("MOR deleteWhere re-evaluates the predicate at the commit-winning snapshot") {
    // Round-10 ADVICE: the MOR route used to pin the matched KEY set at
    // the read snapshot, so a concurrently-updated row that no longer
    // matched was still deleted — diverging from the COW redo's
    // predicate re-run. Race a deleteWhere(dataValue = 'kill') against an
    // upsert flipping the row to 'keep': whenever the delete commits
    // AFTER the update (its base snapshot holds 'keep'), the row MUST
    // survive at the delete's own version. Both orders occur across
    // rounds; the assertion is exact given the observed version order.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      var laterDeletes = 0
      (1 to 12).foreach { i =>
        val t = AcidTable.create(spark, tmp(), schema, "primaryKeyValue", "partitionKeyValue")
        t.setTableProperty("morDeletes", Some("true"))
        t.upsert(df(Record("X", "P0", "kill"), Record("Y", "P1", s"other$i")))
        val h2 = AcidTable.open(spark, t.path)
        val del = pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = t.deleteWhere(col("dataValue") === "kill")
        })
        val upd = pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = h2.upsert(df(Record("X", "P0", "keep")))
        })
        val vDel = del.get(); val vUpd = upd.get()
        val atDel = t.snapshot(vDel).as[Record].collect().filter(_.primaryKeyValue == "X")
        if (vDel > vUpd) {
          laterDeletes += 1
          assert(atDel.map(_.dataValue).toSeq == Seq("keep"),
            s"round $i: delete (v$vDel) after update (v$vUpd) removed a row " +
              "that no longer matched the predicate")
        } else {
          // delete first: X gone at vDel, resurrected by the update at vUpd
          assert(atDel.isEmpty, s"round $i: delete at v$vDel left a matching row")
          assert(t.snapshot(vUpd).as[Record].collect()
            .exists(r => r.primaryKeyValue == "X" && r.dataValue == "keep"))
        }
      }
      info(s"delete-committed-after-update rounds: $laterDeletes of 12")
    } finally pool.shutdown()
  }
}
