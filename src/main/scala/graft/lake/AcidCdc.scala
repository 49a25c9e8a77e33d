package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Public face of the streaming change feed: read an [[AcidTable]] as a
  * Structured Streaming SOURCE of version-ordered row images (the
  * streaming form of [[AcidTable.changesBetween]]; Delta `readChangeFeed`
  * semantics). Each emitted row is a table row image plus `_change_type`
  * (`insert` / `delete` — an update is its delete+insert pair) and
  * `_commit_version` (the manifest version that committed it).
  */
object AcidCdc {

  /** `spark.readStream` over the table's change feed.
    *
    * @param startingVersion first commit version whose changes to emit
    *        (must still be retained — vacuum archival prunes old versions)
    * @param maxVersionsPerBatch cap on versions per micro-batch (bounds a
    *        catch-up replay's batch size); None = all available
    */
  def readStream(
      spark: SparkSession,
      path: String,
      startingVersion: Long = 0L,
      maxVersionsPerBatch: Option[Long] = None): DataFrame = {
    val r = spark.readStream
      .format(classOf[org.apache.spark.sql.graft.AcidCdcSourceProvider].getName)
      .option("path", path)
      .option("startingVersion", startingVersion.toString)
    maxVersionsPerBatch.fold(r)(m => r.option("maxVersionsPerBatch", m.toString)).load()
  }
}
