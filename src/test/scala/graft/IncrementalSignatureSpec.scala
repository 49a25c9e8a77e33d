package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.AcidTable
import graft.queries.TextQueries

/** CDC-incremental signature maintenance (round-8 verdict #5): folding
  * `changesBetween` increments into the stored base-signature table must
  * be BIT-IDENTICAL to a full rebuild from the target snapshot — after
  * every single increment of a history that exercises inserts, revisions
  * (delete+insert under CDC), deletes, and a mixed commit. The production
  * claim is "a 100 TB corpus never re-shingles itself per run"; this spec
  * is the equivalence that claim rests on.
  */
class IncrementalSignatureSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("text", StringType)))

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  private def baseState(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Int, Seq[Long], Int)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
      r.getSeq[Long](3), r.getInt(4))).toSeq.sortBy(_._1)

  test("incremental maintenance equals full rebuild after every increment") {
    val stage = Files.createTempDirectory("incsig-spec-")
    val t = AcidTable.create(spark, stage.resolve("t").toString, schema,
      "doc_id", "lang", stablePartitions = true)

    def doc(i: Long, rev: Int): (Long, String, String) =
      (i, s"l${i % 3}",
        (0 to (i % 5).toInt).map(w => s"w${(i + w) % 11} t${(i * 7 + w + rev) % 13}")
          .mkString(" "))

    val v1 = t.upsert(docsDf((0L until 40L).filter(_ % 4 != 1).map(doc(_, 0))))

    // increment 1: pure inserts (the held-out slice arrives)
    t.upsert(docsDf((0L until 40L).filter(_ % 4 == 1).map(doc(_, 0))))
    // increment 2: revisions (CDC shows delete-old + insert-new per doc)
    t.upsert(docsDf((0L until 40L).filter(_ % 5 == 0).map(doc(_, 1))))
    // increment 3: deletes
    t.delete(docsDf((0L until 40L).filter(_ % 7 == 2).map(doc(_, 0))).select(col("doc_id")))
    // increment 4: mixed — new docs AND revisions in one commit
    t.upsert(docsDf((40L until 48L).map(doc(_, 0)) ++
      (0L until 40L).filter(_ % 9 == 3).map(doc(_, 2))))

    (v1 to t.latestVersion()).foreach { v =>
      val incremental = TextQueries.maintainSignatureBase(spark, t, stage, v1, v)
      val rebuild = TextQueries.shingleBaseOf(spark, t.snapshot(v))
      assert(baseState(incremental) === baseState(rebuild),
        s"incremental store diverged from full rebuild at version $v")
    }
  }
}
