package graft.lake

import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Record

/** `TIMESTAMP AS OF` commit clock: versions are stamped with a `#ts=`
  * header inside the manifest at publish, NOT attributed from file mtimes
  * (`Files.createLink` shares the inode with the fsync'd temp file, so the
  * link's mtime is the pre-publish write time; and any copy/rsync of the
  * table directory rewrites mtimes entirely). These specs pin both
  * properties.
  */
class TimeTravelSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("primaryKeyValue", StringType),
    StructField("partitionKeyValue", StringType),
    StructField("dataValue", StringType)))

  private def df(rs: Record*) = spark.createDataset(rs).toDF()

  private def copyTree(src: Path, dst: Path): Unit = {
    Files.walk(src).forEach { p =>
      val target = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else Files.copy(p, target)
    }
  }

  test("versionAt resolves from #ts= headers and survives a directory copy") {
    val root = Files.createTempDirectory("tt-spec-")
    val orig = root.resolve("t")
    val t = AcidTable.create(spark, orig.toString, schema, "primaryKeyValue", "partitionKeyValue")
    t.upsert(df(Record("R1", "P0", "v0")))              // version 0
    Thread.sleep(5)
    val betweenCommits = System.currentTimeMillis()
    Thread.sleep(5)
    t.upsert(df(Record("R1", "P0", "v1")))              // version 1

    assert(t.versionAt(betweenCommits) == 0L)
    assert(t.versionAt(System.currentTimeMillis()) == 1L)
    assert(t.versionAt(0L) == -1L)

    // copy the table directory (fresh mtimes on every file — exactly what
    // rsync/DistCp-style movement does) and clobber the copied manifests'
    // mtimes outright: time travel must still attribute versions correctly
    val copied = root.resolve("copy")
    copyTree(orig, copied)
    val now = FileTime.fromMillis(System.currentTimeMillis())
    Files.list(copied.resolve("_commits")).forEach(p => Files.setLastModifiedTime(p, now))
    val t2 = AcidTable.open(spark, copied.toString)
    assert(t2.versionAt(betweenCommits) == 0L)
    assert(t2.snapshot(t2.versionAt(betweenCommits))
      .as[Record].collect().map(_.dataValue).toSeq == Seq("v0"))
    assert(t2.snapshot().as[Record].collect().map(_.dataValue).toSeq == Seq("v1"))
  }

  test("pre-header manifests (no #ts=) fall back to file mtime") {
    val path = Files.createTempDirectory("tt-legacy-").resolve("t")
    val t = AcidTable.create(spark, path.toString, schema, "primaryKeyValue", "partitionKeyValue")
    t.upsert(df(Record("R1", "P0", "v0")))              // version 0
    // rewrite the manifest the way a pre-header build wrote it: strip #ts=
    val commits = path.resolve("_commits")
    val manifest = Files.list(commits).filter(_.getFileName.toString.startsWith("v")).findFirst().get()
    val body = new String(Files.readAllBytes(manifest), "UTF-8")
      .linesIterator.filterNot(_.startsWith("#ts=")).mkString("\n")
    Files.write(manifest, body.getBytes("UTF-8"))
    val mtime = 1700000000000L
    Files.setLastModifiedTime(manifest, FileTime.fromMillis(mtime))
    assert(t.versionAt(mtime - 1) == -1L)
    assert(t.versionAt(mtime) == 0L)
  }
}
