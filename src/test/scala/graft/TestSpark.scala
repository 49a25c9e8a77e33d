package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (forked by sbt). */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local(cpus = 4, appName = "graft-test")
}
