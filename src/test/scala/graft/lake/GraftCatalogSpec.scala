package graft.lake

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** DSv2 catalog (SURVEY M6 full form): the reference's SQL lifecycle runs
  * against `graft.<ns>.<table>` with NO AcidSql shim — resolution, scans,
  * inserts, deletes via connector APIs; MERGE via the session-extension
  * rule. The underlying table stays a plain [[AcidTable]], so the same
  * manifests serve both the SQL catalog and the programmatic API.
  */
class GraftCatalogSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCatalog(): String = {
    val wh = Files.createTempDirectory("graft-cat-").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.graft.warehouse", wh)
    wh
  }

  test("full native SQL lifecycle: create, insert, merge, delete, select, drop") {
    freshCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("""CREATE TABLE graft.db.accounts (pk STRING, part STRING, v DOUBLE)
                |PARTITIONED BY (part) TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)

    Seq(("a", "p0", 1.0), ("b", "p1", 2.0), ("c", "p0", 3.0))
      .toDF("pk", "part", "v").createOrReplaceTempView("cat_src")
    spark.sql("INSERT INTO graft.db.accounts SELECT * FROM cat_src")
    assert(spark.sql("SELECT * FROM graft.db.accounts").count() == 3)

    Seq(("a", "p0", 10.0), ("d", "p1", 4.0))
      .toDF("pk", "part", "v").createOrReplaceTempView("cat_upd")
    spark.sql("""MERGE INTO graft.db.accounts t
                |USING (SELECT * FROM cat_upd) s
                |ON t.pk = s.pk
                |WHEN MATCHED THEN UPDATE SET t.v = s.v
                |WHEN NOT MATCHED THEN INSERT (t.pk, t.part, t.v)
                |VALUES (s.pk, s.part, s.v)""".stripMargin)
    spark.sql("DELETE FROM graft.db.accounts WHERE pk IN ('b')")

    val rows = spark.sql("SELECT pk, v FROM graft.db.accounts ORDER BY pk")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(rows == Seq("a" -> 10.0, "c" -> 3.0, "d" -> 4.0))

    // UPDATE completes the DML surface: filter + SET + transactional upsert
    spark.sql("UPDATE graft.db.accounts SET v = v + 0.5 WHERE pk = 'c'")
    val updated = spark.sql("SELECT pk, v FROM graft.db.accounts ORDER BY pk")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(updated == Seq("a" -> 10.0, "c" -> 3.5, "d" -> 4.0))
    intercept[Throwable] { spark.sql("UPDATE graft.db.accounts SET pk = 'x'") }

    // filters + pruning flow through the snapshot scan
    assert(spark.sql("SELECT pk FROM graft.db.accounts WHERE part = 'p0' AND v > 5")
      .collect().map(_.getString(0)).toSeq == Seq("a"))

    // catalog metadata surface
    assert(spark.sql("SHOW TABLES IN graft.db").collect().map(_.getString(1)).toSeq
      == Seq("accounts"))
    val props = spark.sql("SHOW TBLPROPERTIES graft.db.accounts").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("primaryKey").contains("pk") &&
      props.get("partitionColumn").contains("part") &&
      props.contains("numBuckets"), s"missing table properties: $props")

    // SQL time travel: version 0 is the post-insert state, before the
    // merge updated 'a' and before 'b' was deleted
    val v0 = spark.sql("SELECT pk, v FROM graft.db.accounts VERSION AS OF 0 ORDER BY pk")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(v0 == Seq("a" -> 1.0, "b" -> 2.0, "c" -> 3.0))
    // a time-travelled relation is read-only
    intercept[Throwable] {
      spark.sql("INSERT INTO graft.db.accounts VERSION AS OF 0 SELECT * FROM cat_src")
    }

    // TIMESTAMP AS OF: "now" resolves to the latest committed version
    // (the manifests' #ts= publish headers are the commit clock)
    val nowTs = java.time.Instant.now().plusSeconds(1)
      .atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    val asOfNow = spark.sql(
      s"SELECT pk, v FROM graft.db.accounts TIMESTAMP AS OF '$nowTs' ORDER BY pk")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(asOfNow == Seq("a" -> 10.0, "c" -> 3.5, "d" -> 4.0))
    // a timestamp before the first commit fails loudly
    intercept[Throwable] {
      spark.sql("SELECT * FROM graft.db.accounts TIMESTAMP AS OF '2000-01-01 00:00:00'")
        .collect()
    }

    // the SAME manifests serve the programmatic API (one table, two faces)
    val wh = spark.conf.get("spark.sql.graft.warehouse")
    assert(AcidTable.open(spark, s"$wh/db/accounts").snapshot().count() == 3)

    // ALTER TABLE ADD COLUMNS: manifest-only evolution, old rows read NULL
    spark.sql("ALTER TABLE graft.db.accounts ADD COLUMNS (tag STRING)")
    assert(spark.sql("SELECT tag FROM graft.db.accounts").collect().forall(_.isNullAt(0)))

    // ALTER TABLE DROP COLUMN: metadata-only drop + re-add blocked by the
    // dropped-name ledger (round 10) — then restore the column for the
    // overwrite below via the physical purge
    spark.sql("ALTER TABLE graft.db.accounts DROP COLUMN tag")
    assert(!spark.sql("SELECT * FROM graft.db.accounts").columns.contains("tag"))
    intercept[Throwable] {
      spark.sql("ALTER TABLE graft.db.accounts ADD COLUMNS (tag STRING)")
    }
    AcidTable.open(spark, s"$wh/db/accounts").purgeDroppedColumns()
    spark.sql("ALTER TABLE graft.db.accounts ADD COLUMNS (tag STRING)")
    assert(spark.sql("SELECT tag FROM graft.db.accounts").collect().forall(_.isNullAt(0)))

    // INSERT OVERWRITE replaces the whole table in one commit
    Seq(("z", "p1", 99.0, "fresh")).toDF("pk", "part", "v", "tag")
      .createOrReplaceTempView("cat_ovw")
    spark.sql("INSERT OVERWRITE graft.db.accounts SELECT * FROM cat_ovw")
    val after = spark.sql("SELECT pk, v, tag FROM graft.db.accounts")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSeq
    assert(after == Seq(("z", 99.0, "fresh")))

    spark.sql("DROP TABLE graft.db.accounts")
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM graft.db.accounts").collect()
    }
  }

  test("a PK-filtered SELECT routes through the bucket-pruned lookup path") {
    freshCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("""CREATE TABLE graft.db.pts (pk STRING, part STRING, v DOUBLE)
                |PARTITIONED BY (part) TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    (0 until 32).map(i => (s"k$i", s"p${i % 2}", i.toDouble))
      .toDF("pk", "part", "v").createOrReplaceTempView("pts_src")
    spark.sql("INSERT INTO graft.db.pts SELECT * FROM pts_src")

    // pk = literal → lookup (bucket-pruned file list), value correct
    val before = AcidTable.lookupScans.get()
    val one = spark.sql("SELECT v FROM graft.db.pts WHERE pk = 'k7'").collect()
    assert(one.map(_.getDouble(0)).toSeq == Seq(7.0))
    assert(AcidTable.lookupScans.get() > before,
      "pk = 'k7' did not take the point-lookup route")

    // pk IN (...) AND part = … → lookup with the partition hint, still exact
    val before2 = AcidTable.lookupScans.get()
    val two = spark.sql(
      "SELECT pk, v FROM graft.db.pts WHERE pk IN ('k2', 'k4') AND part = 'p0' ORDER BY pk")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(two == Seq("k2" -> 2.0, "k4" -> 4.0))
    assert(AcidTable.lookupScans.get() > before2)

    // a non-PK filter keeps the full snapshot route (no false pruning)
    val before3 = AcidTable.lookupScans.get()
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.pts WHERE v >= 16").collect()
      .head.getLong(0) == 16)
    assert(AcidTable.lookupScans.get() == before3,
      "a non-PK filter must not pretend to be a point lookup")
    spark.sql("DROP TABLE graft.db.pts")
  }

  test("concurrent INSERT INTO through the catalog keeps every row (OCC)") {
    // four sessions, each with its own GraftCatalog instance, hammer the
    // SAME warehouse path — isolation comes from the manifest OCC commit,
    // not from any shared driver state
    val wh = freshCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cc")
    spark.sql("""CREATE TABLE graft.cc.t (pk STRING, part STRING, v DOUBLE)
                |PARTITIONED BY (part) TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    val failures = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val threads = (0 until 4).map { i =>
      new Thread(() => {
        try {
          val sess = spark.newSession()
          sess.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
          sess.conf.set("spark.sql.graft.warehouse", wh)
          (0 until 5).foreach { k =>
            sess.createDataFrame(Seq((s"k-$i-$k", s"p${k % 2}", 1.0)))
              .toDF("pk", "part", "v").createOrReplaceTempView("cc_src")
            sess.sql("INSERT INTO graft.cc.t SELECT * FROM cc_src")
          }
        } catch { case t: Throwable => failures.compareAndSet(null, t); () }
      }, s"cc-insert-$i")
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(failures.get() == null, s"writer failed: ${failures.get()}")
    assert(spark.sql("SELECT count(*) FROM graft.cc.t").collect().head.getLong(0) == 20L)
  }

  test("non-PK deletes route to the predicate path; unsupported merges fail loudly") {
    freshCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db2")
    spark.sql("""CREATE TABLE graft.db2.t (pk STRING, part STRING, v DOUBLE)
                |PARTITIONED BY (part) TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    Seq(("a", "p0", 1.0), ("b", "p1", 5.0), ("c", "p0", 9.0))
      .toDF("pk", "part", "v").createOrReplaceTempView("cat_src2")
    spark.sql("INSERT INTO graft.db2.t SELECT * FROM cat_src2")
    // round 9: a non-key DELETE is a predicate delete (AcidTable.deleteWhere)
    spark.sql("DELETE FROM graft.db2.t WHERE v > 4.0")
    assert(spark.sql("SELECT pk FROM graft.db2.t ORDER BY pk")
      .collect().map(_.getString(0)).toSeq === Seq("a"))
    // restore the rows the merge assertions below operate on
    spark.sql("INSERT INTO graft.db2.t SELECT * FROM cat_src2 WHERE pk <> 'a'")
    // round 9: MERGE … WHEN MATCHED THEN DELETE = delete by source keys
    Seq(("b", "p1", 0.0)).toDF("pk", "part", "v").createOrReplaceTempView("cat_mdel")
    spark.sql("""MERGE INTO graft.db2.t t USING (SELECT * FROM cat_mdel) s
                |ON t.pk = s.pk WHEN MATCHED THEN DELETE""".stripMargin)
    assert(spark.sql("SELECT pk FROM graft.db2.t ORDER BY pk")
      .collect().map(_.getString(0)).toSeq === Seq("a", "c"))
    spark.sql("INSERT INTO graft.db2.t SELECT * FROM cat_src2 WHERE pk = 'b'")
    // round 10: MERGE without an INSERT branch is the update-only shape
    // (valid Delta/Hudi SQL) — it updates matched rows and inserts
    // nothing, through the conditional-merge path
    spark.sql("""MERGE INTO graft.db2.t t USING (SELECT * FROM cat_src2) s
                |ON t.pk = s.pk
                |WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin)
    assert(spark.sql("SELECT pk, v FROM graft.db2.t ORDER BY pk")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      === Seq(("a", 1.0), ("b", 5.0), ("c", 9.0)),
      "update-only merge must update matched rows and insert nothing")
    // round 10b: transformed UPDATE values EXECUTE (expression clauses
    // over the t/s pre-image) — previously rejected
    spark.sql("""MERGE INTO graft.db2.t t USING (SELECT * FROM cat_src2) s
                |ON t.pk = s.pk
                |WHEN MATCHED THEN UPDATE SET t.v = s.v * 2
                |WHEN NOT MATCHED THEN INSERT (t.pk, t.part, t.v)
                |VALUES (s.pk, s.part, s.v)""".stripMargin)
    assert(spark.sql("SELECT pk, v FROM graft.db2.t ORDER BY pk")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      === Seq(("a", 2.0), ("b", 10.0), ("c", 18.0)),
      "transformed SET must evaluate the expression, not copy s.v")
    // round 10b: reordered INSERT values EXECUTE as written (expression
    // inserts) — s.part into t.pk means exactly that
    Seq(("zz", "p9", 7.0)).toDF("pk", "part", "v").createOrReplaceTempView("cat_reord")
    spark.sql("""MERGE INTO graft.db2.t t USING (SELECT * FROM cat_reord) s
                |ON t.pk = s.pk
                |WHEN MATCHED THEN UPDATE SET t.v = s.v
                |WHEN NOT MATCHED THEN INSERT (t.pk, t.part, t.v)
                |VALUES (s.part, s.pk, s.v)""".stripMargin)
    assert(spark.sql("SELECT part FROM graft.db2.t WHERE pk = 'p9'")
      .collect().map(_.getString(0)).toSeq === Seq("zz"),
      "reordered VALUES must insert the columns as written")
    spark.sql("DELETE FROM graft.db2.t WHERE pk = 'p9'")
    // round 10b: TARGET-qualified RHS (`t.v = t.v`, "keep the target
    // value") now means what SQL says — the pre-image target value
    spark.sql("""MERGE INTO graft.db2.t t USING (SELECT * FROM cat_src2) s
                |ON t.pk = s.pk
                |WHEN MATCHED THEN UPDATE SET t.v = t.v
                |WHEN NOT MATCHED THEN INSERT (t.pk, t.part, t.v)
                |VALUES (s.pk, s.part, s.v)""".stripMargin)
    assert(spark.sql("SELECT pk, v FROM graft.db2.t ORDER BY pk")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      === Seq(("a", 2.0), ("b", 10.0), ("c", 18.0)),
      "t.v = t.v must keep the target value")
    // mixed pre-image semantics: every RHS sees the ORIGINAL pair
    spark.sql("""MERGE INTO graft.db2.t t USING (SELECT * FROM cat_src2) s
                |ON t.pk = s.pk
                |WHEN MATCHED AND t.v > 15.0 THEN UPDATE SET t.v = t.v + s.v
                |WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin)
    assert(spark.sql("SELECT pk, v FROM graft.db2.t ORDER BY pk")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      === Seq(("a", 1.0), ("b", 5.0), ("c", 27.0)),
      "first-match-wins with expression clauses over the pre-image")
  }

  test("scan statistics come from the manifest: pruned sizes reach the planner") {
    val wh = freshCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.st")
    spark.sql("""CREATE TABLE graft.st.d (pk STRING, part STRING, v DOUBLE)
                |PARTITIONED BY (part) TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    (0 until 64).map(i => (s"k$i", s"p${i % 2}", i.toDouble))
      .toDF("pk", "part", "v").createOrReplaceTempView("st_src")
    spark.sql("INSERT INTO graft.st.d SELECT * FROM st_src")
    val acid = AcidTable.open(spark, s"$wh/st/d")
    val total = acid.liveBytes()
    assert(total > 0)

    def scanSize(sql: String): BigInt =
      spark.sql(sql).queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.stats.sizeInBytes
      }.head

    // full scan: the estimate is the manifest's live bytes, not DSv2's
    // defaultSizeInBytes fallback (Long.MaxValue = never broadcastable)
    assert(scanSize("SELECT * FROM graft.st.d") == BigInt(total))
    // pk-filtered scan: the estimate shrinks to the pruned buckets' bytes
    val pruned = scanSize("SELECT * FROM graft.st.d WHERE pk = 'k7'")
    assert(pruned > 0 && pruned < BigInt(total),
      s"pk-pruned estimate $pruned should be a strict subset of $total")
    // end-to-end: the dimension-sized table auto-broadcasts with NO hint
    spark.range(0, 10000).selectExpr("concat('k', id % 64) AS fk", "id AS x")
      .createOrReplaceTempView("st_fact")
    val joined = spark.sql(
      "SELECT d.pk, count(*) AS n FROM st_fact f JOIN graft.st.d d ON f.fk = d.pk GROUP BY d.pk")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"manifest stats did not drive a broadcast:\n$plan")
    spark.sql("DROP TABLE graft.st.d")
  }

  test("UPDATE SET evaluates all assignments against the old row (swap works)") {
    freshCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db3")
    spark.sql("""CREATE TABLE graft.db3.s (pk STRING, part STRING, a DOUBLE, b DOUBLE)
                |PARTITIONED BY (part) TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    Seq(("x", "p0", 1.0, 2.0)).toDF("pk", "part", "a", "b")
      .createOrReplaceTempView("cat_swap")
    spark.sql("INSERT INTO graft.db3.s SELECT * FROM cat_swap")
    // SQL UPDATE semantics: every RHS sees the PRE-update row, so this
    // swaps — a sequential withColumn chain would set b to its own old value
    spark.sql("UPDATE graft.db3.s SET a = b, b = a")
    val r = spark.sql("SELECT a, b FROM graft.db3.s").collect().head
    assert((r.getDouble(0), r.getDouble(1)) == (2.0, 1.0))
    // unknown SET column fails loudly
    intercept[Throwable] { spark.sql("UPDATE graft.db3.s SET nope = 1.0") }
    // Spark attribute resolution is case-insensitive by default — `SET A`
    // must target column `a`, not be spuriously rejected as unknown
    spark.sql("UPDATE graft.db3.s SET A = 5.0")
    assert(spark.sql("SELECT a FROM graft.db3.s").collect().head.getDouble(0) == 5.0)
    // duplicate assignments: SQL engines reject, not last-one-wins silently
    intercept[Throwable] { spark.sql("UPDATE graft.db3.s SET a = 1.0, a = 2.0") }
    intercept[Throwable] { spark.sql("UPDATE graft.db3.s SET a = 1.0, A = 2.0") }
    assert(spark.sql("SELECT a FROM graft.db3.s").collect().head.getDouble(0) == 5.0)
  }

  test("SHOW PARTITIONS lists live partitions natively; partition DDL fails loudly") {
    freshCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db4")
    spark.sql("""CREATE TABLE graft.db4.p (pk STRING, part STRING, v DOUBLE)
                |PARTITIONED BY (part) TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    Seq(("a", "p0", 1.0), ("b", "p1", 2.0), ("c", "p2", 3.0), ("d", "p0", 4.0))
      .toDF("pk", "part", "v").createOrReplaceTempView("sp_src")
    spark.sql("INSERT INTO graft.db4.p SELECT * FROM sp_src")
    val all = spark.sql("SHOW PARTITIONS graft.db4.p")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(all == Seq("part=p0", "part=p1", "part=p2"), all.toString)
    // a deleted partition's rows leave the inventory
    spark.sql("DELETE FROM graft.db4.p WHERE pk IN ('c')")
    val after = spark.sql("SHOW PARTITIONS graft.db4.p")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(after == Seq("part=p0", "part=p1"), after.toString)
    // structural partition DDL is meaningless on derived layout
    intercept[Throwable] {
      spark.sql("ALTER TABLE graft.db4.p ADD PARTITION (part = 'p9')")
    }
    // DESCRIBE DETAIL through the parser extension: one-row summary
    val det = spark.sql("DESCRIBE DETAIL graft.db4.p").collect().head
    assert(det.getString(0) == "graft-acid")
    assert(det.getLong(3) > 0 && det.getLong(5) == 2) // files; p0, p1 live
    assert(det.getString(6) == "pk" && det.getString(7) == "part")
    spark.sql("DROP TABLE graft.db4.p")
  }
  test("DESCRIBE DETAIL names the identifier for non-graft tables; matviews resolve") {
    freshCatalog()
    // session-wide interception must not turn a missing table into a
    // confusing path error — it raises NoSuchTableException with the name
    val e = intercept[org.apache.spark.sql.catalyst.analysis.NoSuchTableException] {
      spark.sql("DESCRIBE DETAIL graft.nodb.nope").collect()
    }
    assert(e.getMessage.contains("nope"), e.getMessage)
    // a materialized view (no _meta.properties of its own) answers with
    // its backing state table's detail instead of failing to open
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dd")
    spark.sql("""CREATE TABLE graft.dd.src (pk STRING, part STRING, v BIGINT)
                |PARTITIONED BY (part) TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    Seq(("a", "p0", 1L), ("b", "p1", 2L)).toDF("pk", "part", "v")
      .createOrReplaceTempView("dd_src")
    spark.sql("INSERT INTO graft.dd.src SELECT * FROM dd_src")
    spark.sql("CREATE MATERIALIZED VIEW graft.dd.mv AS SELECT part, sum(v) AS s FROM graft.dd.src GROUP BY part")
    val det = spark.sql("DESCRIBE DETAIL graft.dd.mv").collect().head
    assert(det.getString(0) == "graft-acid")
    spark.sql("DROP MATERIALIZED VIEW graft.dd.mv")
    spark.sql("DROP TABLE graft.dd.src")
  }
  test("FSCK TABLE through the parser extension: empty on healthy, finds orphans") {
    freshCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.fsck")
    spark.sql("""CREATE TABLE graft.fsck.t (pk STRING, part STRING, v BIGINT)
                |PARTITIONED BY (part) TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    Seq(("a", "p0", 1L), ("b", "p1", 2L)).toDF("pk", "part", "v")
      .createOrReplaceTempView("fsck_native_src")
    spark.sql("INSERT INTO graft.fsck.t SELECT * FROM fsck_native_src")
    val healthy = spark.sql("FSCK TABLE graft.fsck.t")
    assert(healthy.columns.toSeq == Seq("kind", "version", "name", "detail"))
    assert(healthy.count() == 0)
    // inject a dangling segment ref and see it surface through spark.sql
    val wh = spark.conf.get("spark.sql.graft.warehouse")
    val segs = java.nio.file.Paths.get(s"$wh/fsck/t", "_commits", "_segments")
    val victim = java.nio.file.Files.list(segs).iterator()
      .asScala.find(_.getFileName.toString.startsWith("seg-")).get
    val saved = java.nio.file.Files.readAllBytes(victim)
    java.nio.file.Files.delete(victim)
    val found = spark.sql("FSCK TABLE graft.fsck.t").collect()
    assert(found.exists(r => r.getString(0) == "dangling_segment_ref" &&
      r.getString(2) == victim.getFileName.toString))
    java.nio.file.Files.write(victim, saved)
    assert(spark.sql("FSCK TABLE graft.fsck.t").count() == 0)
    // unknown identifier raises the named error, not a path failure
    val e = intercept[org.apache.spark.sql.catalyst.analysis.NoSuchTableException] {
      spark.sql("FSCK TABLE graft.nodb.nope").collect()
    }
    assert(e.getMessage.contains("nope"), e.getMessage)
    spark.sql("DROP TABLE graft.fsck.t")
  }

  test("metadata tables: live recompute per scan, SQL composition, unknown names refuse") {
    val wh = java.nio.file.Files.createTempDirectory("graft-cat-md-").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.graft.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mdx")
    spark.sql("""CREATE TABLE graft.mdx.t (pk STRING, part STRING, v DOUBLE)
                |PARTITIONED BY (part)
                |TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    import spark.implicits._
    Seq(("a", "p0", 1.0), ("b", "p1", 2.0)).toDF("pk", "part", "v")
      .createOrReplaceTempView("mdx_src")
    spark.sql("INSERT INTO graft.mdx.t SELECT * FROM mdx_src")
    // SQL composes over the relation (aggregation, not just SELECT *)
    assert(spark.sql(
      "SELECT count(*) FROM graft.mdx.t.history WHERE operation = 'UPSERT'")
      .head().getLong(0) == 1L)
    // live recompute: a ref created AFTER the first scan appears
    assert(spark.sql("SELECT count(*) FROM graft.mdx.t.tags").head().getLong(0) == 0L)
    AcidTable.open(spark, s"$wh/mdx/t").createTag("snap")
    assert(spark.sql("SELECT tag FROM graft.mdx.t.tags").head().getString(0) == "snap")
    // unknown metadata names and orphan parents refuse as missing tables
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM graft.mdx.t.nonsense").collect()
    }
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM graft.mdx.ghost.history").collect()
    }
  }
}
