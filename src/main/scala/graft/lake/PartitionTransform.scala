package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hidden-partitioning transforms (the Iceberg partition-transform /
  * Delta generated-column analog): the table's partition STRING derives
  * from a source column through a NAMED, invertible-enough transform —
  * `month(ts)`, `day(ts)`, `hour(ts)`, `bucket(n, c)`, `truncate(n, c)`,
  * `identity(c)` — instead of being caller-provided data.
  *
  * Write side: [[AcidTable]] fills the partition column (absent column or
  * NULL values) with [[toColumn]], and an auto-added CHECK constraint
  * (`<part> <=> sql`) rejects any explicitly-provided value that
  * disagrees — the invariant that makes read-side pruning SOUND.
  *
  * Read side: because the named transforms are order- or
  * equality-transposable, a pushed predicate on the SOURCE column turns
  * into a partition list (equality → one value through the same
  * expression; a time range → the enumerated period values), so a
  * `WHERE ts BETWEEN …` on a 100 TB table prunes to the touched months'
  * directories with the user never naming a partition. Arbitrary SQL
  * generators would forfeit exactly this transposability — the reason
  * the grammar is the named set, as Iceberg's is.
  *
  * Time transforms render through Spark's `date_format`, i.e. in the
  * SESSION time zone: every writer and reader of a table must pin one
  * zone (this engine's sessions pin UTC). `bucket` uses Spark's `hash`
  * (Murmur3, fixed seed) — session-independent.
  *
  * Mutating a row's SOURCE value would move its partition — the same
  * hazard as changing a provided partition value on a classic table.
  * The auto-CHECK makes that loud instead of silent: an in-place UPDATE
  * that changes the source column but keeps the old partition fails the
  * constraint rather than stranding the row in a directory the
  * transposed read would no longer visit.
  */
sealed trait PartitionTransform {
  def sourceCol: String

  /** Write-side derivation of the partition value (STRING column). */
  def toColumn: Column

  /** Canonical Spark-SQL text of [[toColumn]] — the auto-CHECK constraint
    * body, also usable in documentation and EXPLAIN-side reasoning. */
  def sql: String

  /** Property rendering (parse-round-trippable). */
  def render: String

  /** Loud validation against the table schema (round-10 verdict #5
    * standard: a misconfigured layout property must error at set time). */
  def validate(schema: StructType, partitionCol: String): Unit = {
    require(schema.fieldNames.contains(sourceCol),
      s"partitionTransform: source column '$sourceCol' does not exist in " +
        s"table schema (${schema.fieldNames.mkString(", ")})")
    require(sourceCol != partitionCol,
      "partitionTransform: the source column cannot be the partition column itself")
    validateType(schema(sourceCol).dataType)
  }

  protected def validateType(dt: DataType): Unit
}

/** `month(ts)` / `day(ts)` / `hour(ts)` — calendar-period partitioning
  * over a TIMESTAMP (or DATE, for month/day) column. */
final case class TimeTransform(unit: String, sourceCol: String) extends PartitionTransform {
  val pattern: String = unit match {
    case "month" => "yyyy-MM"
    case "day" => "yyyy-MM-dd"
    case "hour" => "yyyy-MM-dd-HH"
  }
  override def toColumn: Column = date_format(col(sourceCol), pattern)
  override def sql: String = s"date_format($sourceCol, '$pattern')"
  override def render: String = s"$unit($sourceCol)"
  override protected def validateType(dt: DataType): Unit = dt match {
    case TimestampType => ()
    case DateType if unit != "hour" => ()
    case other => throw new IllegalArgumentException(
      s"partitionTransform: $unit() needs a TIMESTAMP${if (unit != "hour") " or DATE" else ""} " +
        s"source column, got ${other.sql}")
  }
}

/** `bucket(n, c)` — Murmur3 hash bucketing into n directories (`b0000`…),
  * the layout for high-cardinality keys with no natural period. */
final case class BucketTransform(n: Int, sourceCol: String) extends PartitionTransform {
  require(n >= 1 && n <= 9999, s"bucket(n, c): n must be in [1, 9999], got $n")
  override def toColumn: Column =
    concat(lit("b"), lpad(pmod(hash(col(sourceCol)), lit(n)).cast("string"), 4, "0"))
  override def sql: String =
    s"concat('b', lpad(cast(pmod(hash($sourceCol), $n) as string), 4, '0'))"
  override def render: String = s"bucket($n, $sourceCol)"
  override protected def validateType(dt: DataType): Unit = dt match {
    case StringType | LongType | IntegerType | ShortType | ByteType => ()
    case other => throw new IllegalArgumentException(
      s"partitionTransform: bucket() needs a STRING or integral source column, got ${other.sql}")
  }
}

/** `truncate(n, c)` — leading-prefix partitioning of a STRING column. */
final case class TruncateTransform(n: Int, sourceCol: String) extends PartitionTransform {
  require(n >= 1, s"truncate(n, c): n must be >= 1, got $n")
  override def toColumn: Column = substring(col(sourceCol), 1, n)
  override def sql: String = s"substring($sourceCol, 1, $n)"
  override def render: String = s"truncate($n, $sourceCol)"
  override protected def validateType(dt: DataType): Unit = dt match {
    case StringType => ()
    case other => throw new IllegalArgumentException(
      s"partitionTransform: truncate() needs a STRING source column, got ${other.sql}")
  }
}

/** `identity(c)` — the source value itself (rendered as STRING); hidden
  * only in the sense that writers stop providing the column. */
final case class IdentityTransform(sourceCol: String) extends PartitionTransform {
  override def toColumn: Column = col(sourceCol).cast("string")
  override def sql: String = s"cast($sourceCol as string)"
  override def render: String = s"identity($sourceCol)"
  override protected def validateType(dt: DataType): Unit = dt match {
    case StringType | LongType | IntegerType | ShortType | ByteType | DateType => ()
    case other => throw new IllegalArgumentException(
      s"partitionTransform: identity() needs a STRING/integral/DATE source column, " +
        s"got ${other.sql}")
  }
}

object PartitionTransform {
  private val Unary = """(?i)\s*(month|day|hour|identity)\s*\(\s*([A-Za-z_]\w*)\s*\)\s*""".r
  private val Binary = """(?i)\s*(bucket|truncate)\s*\(\s*(\d+)\s*,\s*([A-Za-z_]\w*)\s*\)\s*""".r

  /** Parse the property grammar; loud on anything else. */
  def parse(s: String): PartitionTransform = s match {
    case Unary(u, c) if u.equalsIgnoreCase("identity") => IdentityTransform(c)
    case Unary(u, c) => TimeTransform(u.toLowerCase, c)
    case Binary(b, n, c) if b.equalsIgnoreCase("bucket") => BucketTransform(n.toInt, c)
    case Binary(_, n, c) => TruncateTransform(n.toInt, c)
    case other => throw new IllegalArgumentException(
      s"partitionTransform: cannot parse '$other' — expected month(col), day(col), " +
        "hour(col), bucket(n, col), truncate(n, col), or identity(col)")
  }
}
