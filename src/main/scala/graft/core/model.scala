package graft.core

/** Row type of the ACID verification table — the rebuild of the reference's
  * three-string bean (`resultset/Record.java:15-31`): primary key, Hive-style
  * partition value, free-form payload. All three fields participate in
  * equality (case-class semantics match the reference's
  * `@EqualsAndHashCode.Include` on each field).
  */
final case class Record(
    primaryKeyValue: String,
    partitionKeyValue: String,
    dataValue: String)

/** Duplicate primary key observed in one snapshot — a snapshot-isolation
  * violation (`resultset/InconsistentResultSetException.java:3-7`).
  */
final class InconsistentResultSetException(msg: String) extends RuntimeException(msg)

/** Fully-materialized snapshot with a PK index
  * (`resultset/ResultSet.java:14-36`). The reference deliberately collects
  * the whole (≤100-key) table to the driver for verification; the engine
  * side stays distributed — only the verification harness materializes.
  */
final class ResultSet(val records: Seq[Record]) {
  private val byPk: Map[String, Seq[Record]] = records.groupBy(_.primaryKeyValue)

  /** Point lookup; throws on duplicate PKs (`ResultSet.java:26-34`). */
  def recordByPrimaryKey(pk: String): Option[Record] =
    byPk.get(pk) match {
      case None => None
      case Some(Seq(one)) => Some(one)
      case Some(many) =>
        throw new InconsistentResultSetException(
          s"Multiple records for primary key $pk: $many")
    }

  def primaryKeys: Set[String] = byPk.keySet
  def size: Int = records.size
}
