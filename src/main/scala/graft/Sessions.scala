package graft

import org.apache.spark.sql.SparkSession

/** Session bootstrap shared by Verify / Bench / tests.
  *
  * Replaces the reference's metastore-backed bootstrap
  * (`/root/reference/src/test/java/org/example/SparkSessionProvider.java:45-72`)
  * with a plain local session: the native lake layer ([[graft.lake.AcidTable]])
  * keeps its catalog in filesystem manifests — no Hive metastore needed.
  * [[org.apache.spark.sql.graft.GraftExtensions]] rides along the standard
  * `spark.sql.extensions` route (SQL functions, as-of join strategy, acid
  * MERGE resolution rule).
  */
object Sessions {
  def local(cpus: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      // match executor-thread count, not the 200 default sized for clusters
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.extensions", classOf[org.apache.spark.sql.graft.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
