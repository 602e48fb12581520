package graft.config

import org.apache.spark.sql.types._

/** Declared replication mapping — the Spark-side equivalent of the
  * reference's YAML `tables:` map (reference `run.go:66-75`, parse loop
  * `run.go:96-124`, sample `momyre.yml:3-15`).
  *
  * Column order is semantic (the reference preserves YAML order and
  * reorders sink columns to match, `mysql.go:267-285`); we keep a `Seq`.
  * The `_id` primary key is implicit and always first (`mysql.go:183-198`);
  * a declared `_id` entry is ignored (`run.go:105-107`).
  */
final case class ColumnSpec(
    sourceName: String,           // dotted path on the source document
    declaredType: String,         // MySQL-style type string from config
    default: Option[String] = None) { // parsed-but-inert in the reference (run.go:108-115)
  /** SQL-safe sink column name — `col4sql`, reference `mysql.go:54-56`. */
  def sinkName: String = sourceName.replace(".", "_")
  def dataType: DataType = SqlTypes.toSpark(declaredType)
}

final case class TableSpec(name: String, columns: Seq[ColumnSpec], pk: String = "_id") {
  require(columns.forall(_.sourceName != pk), s"$pk is implicit; do not declare it")
  /** Sink schema: `_id varchar(24) NOT NULL PRIMARY KEY` + declared columns,
    * NULL-able, in declared order (`mysql.go:183-198`, `mysql.go:267-285`). */
  def structType: StructType = StructType(
    StructField(pk, StringType, nullable = false) +:
      columns.map(c => StructField(c.sinkName, c.dataType, nullable = true)))
  def columnBySink(sink: String): Option[ColumnSpec] = columns.find(_.sinkName == sink)
}

final case class MappingConfig(
    source: String,               // `inp:` URL (momyre.yml:1)
    sink: String,                 // `out:` URL (momyre.yml:2)
    tables: Seq[TableSpec]) {
  def table(name: String): Option[TableSpec] = tables.find(_.name == name)
  def replicatedNamespaces(db: String): Set[String] = tables.map(t => s"$db.${t.name}").toSet
}

/** MySQL type-string → Spark DataType. The reference never interprets the
  * type string (it passes it verbatim to DDL, `mysql.go:194`); we need a
  * Spark-side schema, so we map the common MySQL families. Unknown types
  * fall back to StringType — the reference's effective behavior, since the
  * MySQL driver coerces bound text. */
object SqlTypes {
  private val ParenType = """([a-z]+)\s*\((\d+)(?:\s*,\s*(\d+))?\)""".r
  def toSpark(declared: String): DataType = {
    val d = declared.trim.toLowerCase
    val (base, p, s) = d match {
      case ParenType(b, pp, ss) => (b, Option(pp).map(_.toInt), Option(ss).map(_.toInt))
      case _ => (d.takeWhile(_.isLetter), None, None)
    }
    base match {
      case "bigint"                       => LongType
      case "int" | "integer" | "mediumint" => IntegerType
      case "smallint"                     => ShortType
      case "tinyint"                      => if (p.contains(1)) BooleanType else ByteType
      case "double" | "real"              => DoubleType
      case "float"                        => FloatType
      case "decimal" | "numeric"          => DecimalType(p.getOrElse(10), s.getOrElse(0))
      case "bit" | "bool" | "boolean"     => BooleanType
      case "date"                         => DateType
      case "datetime" | "timestamp"       => TimestampType
      case "binary" | "varbinary"         => BinaryType
      // blob stores JSON text in the reference (mysql.go:402-404) → String
      case _                              => StringType
    }
  }
}
