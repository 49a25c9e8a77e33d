package graft

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.scalatest.funsuite.AnyFunSuite

/** Physical-schema fingerprint gate for the driver-generated testdata
  * (round-7 verdict #7). The driver regenerates `/root/testdata` between
  * rounds and physical layouts have silently drifted before (events.ts:
  * timestamp[ns] → timestamp[us] ntz; see FIXTURES.md §2) — when that
  * happens again this spec fails FIRST, with a message naming the table and
  * the new layout, instead of the drift surfacing as confusing oracle
  * mismatches downstream.
  *
  * The fingerprint is the parquet footer `MessageType` (PHYSICAL types +
  * logical annotations — `spark.read.schema` only shows the logical view),
  * whitespace-collapsed, with one declared looseness: any
  * `TIMESTAMP(unit,adjusted)` annotation normalizes to `TIMESTAMP(_)`,
  * because the loaders handle every timestamp unit (`Tables.events`
  * branches on the read dtype; TablesSpec pins temporal loading of the
  * order/shipment dates). Anything else — an unannotated int64 where a
  * timestamp was, a DATE, a widened int — is a REAL drift and must fail
  * until handled and re-recorded here intentionally.
  *
  * Footer reads cost ~ms per file, so all three SFs are checked.
  */
class SchemaFingerprintSpec extends AnyFunSuite {

  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  /** Canonical one-line physical schema: footer MessageType with collapsed
    * whitespace and timestamp units wildcarded (see class doc).
    */
  private def fingerprint(path: String): String = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), new Configuration())
    val reader = ParquetFileReader.open(in)
    try {
      reader.getFooter.getFileMetaData.getSchema.toString
        .replaceAll("\\s+", " ").trim
        .replaceAll("TIMESTAMP\\([A-Z]+,(?:true|false)\\)", "TIMESTAMP(_)")
    } finally reader.close()
  }

  /** Recorded fingerprints (2026-08-13 generation). Update INTENTIONALLY:
    * re-run this spec, read the failure message's actual value, confirm the
    * loaders/queries handle the new layout, then paste it here.
    */
  private val expected = Map(
    "region" -> ("message schema { optional int32 r_regionkey; " +
      "optional binary r_name (STRING); }"),
    "nation" -> ("message schema { optional int32 n_nationkey; " +
      "optional binary n_name (STRING); optional int32 n_regionkey; }"),
    "customer" -> ("message schema { optional int64 c_custkey; " +
      "optional binary c_name (STRING); optional int32 c_nationkey; " +
      "optional double c_acctbal; optional binary c_mktsegment (STRING); }"),
    "supplier" -> ("message schema { optional int64 s_suppkey; " +
      "optional binary s_name (STRING); optional int32 s_nationkey; " +
      "optional double s_acctbal; }"),
    "part" -> ("message schema { optional int64 p_partkey; " +
      "optional binary p_name (STRING); optional binary p_brand (STRING); " +
      "optional binary p_type (STRING); optional int32 p_size; " +
      "optional double p_retailprice; }"),
    "orders" -> ("message schema { optional int64 o_orderkey; " +
      "optional int64 o_custkey; optional binary o_orderstatus (STRING); " +
      "optional double o_totalprice; optional int64 o_orderdate (TIMESTAMP(_)); " +
      "optional binary o_orderpriority (STRING); }"),
    "lineitem" -> ("message schema { optional int64 l_orderkey; " +
      "optional int64 l_partkey; optional int64 l_suppkey; " +
      "optional int32 l_linenumber; optional double l_quantity; " +
      "optional double l_extendedprice; optional double l_discount; " +
      "optional double l_tax; optional binary l_returnflag (STRING); " +
      "optional binary l_linestatus (STRING); " +
      "optional int64 l_shipdate (TIMESTAMP(_)); }"),
    "events" -> ("message schema { optional int64 event_id; " +
      "optional int64 ts (TIMESTAMP(_)); optional int64 user_id; " +
      "optional binary event_type (STRING); optional double value; " +
      "optional binary props (STRING); }"),
    "documents" -> ("message schema { optional int64 doc_id; " +
      "optional binary text (STRING); optional binary lang (STRING); " +
      "optional binary source (STRING); optional int64 n_chars; }"),
    "embeddings" -> ("message schema { optional int64 vec_id; " +
      "optional group embedding (LIST) { repeated group list { " +
      "optional float element; } } optional int32 label; }")
  )

  sfDirs.foreach { dir =>
    test(s"physical schemas at $dir match the recorded fingerprints") {
      val drifted = tables.flatMap { t =>
        val p = s"$dir/$t.parquet"
        if (!new java.io.File(p).exists()) Some(s"$t: MISSING $p")
        else {
          val actual = fingerprint(p)
          if (actual == expected(t)) None
          else Some(s"""$t: physical layout drifted.
            |  recorded: ${expected(t)}
            |  actual:   $actual
            |  → a testdata regeneration changed this table; verify the
            |    loaders handle the new layout, then re-record it in
            |    SchemaFingerprintSpec (see FIXTURES.md §2).""".stripMargin)
        }
      }
      assert(drifted.isEmpty, drifted.mkString("\n\n", "\n\n", ""))
    }
  }
}
