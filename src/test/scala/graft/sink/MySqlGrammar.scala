package graft.sink

import scala.util.matching.Regex

/** Recorded MySQL 8 grammar for the statement surface the sink emits.
  * No MySQL exists in this environment, so this table — transcribed from
  * the MySQL 8.0 reference manual's INSERT/DELETE/SELECT/CREATE/ALTER
  * syntax (single-row INSERT … ON DUPLICATE KEY UPDATE with VALUES(col),
  * backtick-quoted identifiers, column type literals as
  * information_schema reports them) — is the executable stand-in: every
  * statement [[MemJdbc]] receives must match one production EXACTLY, so
  * any dialect drift (double-quoted identifiers, `ON CONFLICT`,
  * multi-row VALUES, an unknown type literal) fails every spec that
  * touches the JDBC path, not just the goldens.
  */
object MySqlGrammar {

  private val I = "`[A-Za-z_][A-Za-z0-9_$]*`" // quoted identifier (no embedded backtick)
  // column type literals as MySQL 8 information_schema renders them
  private val T = "(?:bigint(?:\\(\\d+\\))?|int(?:\\(\\d+\\))?|integer|mediumint|smallint|" +
    "tinyint(?:\\(\\d+\\))?|bit(?:\\(\\d+\\))?|bool|boolean|double|float|real|" +
    "decimal\\(\\d+,\\s?\\d+\\)|numeric\\(\\d+,\\s?\\d+\\)|" +
    "varchar\\(\\d+\\)|char\\(\\d+\\)|text|mediumtext|longtext|" +
    "blob|longblob|varbinary\\(\\d+\\)|binary\\(\\d+\\)|" +
    "datetime(?:\\(\\d\\))?|timestamp(?:\\(\\d\\))?|date|json)"
  private val V = "(?:\\?|'[^']*'|-?\\d+|NULL)" // insertable value term

  private def re(s: String): Regex = ("^" + s + "$").r

  /** statement-class name → anchored production. */
  val productions: Seq[(String, Regex)] = Seq(
    "insert_odku" -> re(
      s"INSERT INTO $I \\($I(?:, $I)*\\) VALUES \\($V(?:, $V)*\\)" +
        s" ON DUPLICATE KEY UPDATE $I=VALUES\\($I\\)(?:, $I=VALUES\\($I\\))*"),
    "delete_by_key" -> re(s"DELETE FROM $I WHERE $I = \\?"),
    "select_point" -> re(s"SELECT $I FROM $I WHERE $I = '[^']*'"),
    "create_table" -> re(
      s"CREATE TABLE (?:IF NOT EXISTS )?$I " +
        s"\\($I $T(?: NOT NULL| NULL)?(?:, $I $T(?: NOT NULL| NULL)?)*" +
        s", PRIMARY KEY \\($I\\)\\)"),
    "drop_table" -> re(s"DROP TABLE $I"),
    "alter_add_column" -> re(s"ALTER TABLE $I ADD COLUMN $I $T(?: NOT NULL| NULL)?"),
    "alter_drop_column" -> re(s"ALTER TABLE $I DROP COLUMN $I"),
    "alter_change_column" -> re(
      s"ALTER TABLE $I CHANGE $I $I $T(?: NOT NULL| NULL)?(?: AFTER $I| FIRST)?"))

  /** Validate one statement; returns its class or throws SQLException —
    * the failure mode a real MySQL connection would produce. */
  def validate(sql: String): String =
    productions.collectFirst { case (name, p) if p.matches(sql) => name }
      .map { name => semanticChecks(name, sql); name }
      .getOrElse(throw new java.sql.SQLSyntaxErrorException(
        s"not MySQL 8 grammar (recorded surface): $sql"))

  /** Shape checks the regex cannot express. */
  private def semanticChecks(cls: String, sql: String): Unit = cls match {
    case "insert_odku" =>
      val cols = "INSERT INTO `[^`]+` \\(([^)]*)\\)".r
        .findFirstMatchIn(sql).get.group(1)
        .split(", ").map(_.stripPrefix("`").stripSuffix("`")).toSeq
      val values = "VALUES \\(([^)]*)\\)".r.findFirstMatchIn(sql).get.group(1)
        .split(", ").toSeq
      if (values.length != cols.length)
        throw new java.sql.SQLSyntaxErrorException(
          s"column/value count mismatch (${cols.length} vs ${values.length}): $sql")
      val odku = "ON DUPLICATE KEY UPDATE (.*)$".r.findFirstMatchIn(sql).get.group(1)
      "`([^`]+)`=VALUES\\(`([^`]+)`\\)".r.findAllMatchIn(odku).foreach { m =>
        if (m.group(1) != m.group(2))
          throw new java.sql.SQLSyntaxErrorException(
            s"ODKU assigns `${m.group(1)}` from VALUES(`${m.group(2)}`): $sql")
        if (!cols.contains(m.group(1)))
          throw new java.sql.SQLSyntaxErrorException(
            s"ODKU references VALUES(`${m.group(1)}`) not in the insert list: $sql")
      }
    case "create_table" =>
      val pk = ", PRIMARY KEY \\(`([^`]+)`\\)".r.findFirstMatchIn(sql).get.group(1)
      val cols = "[(,] ?`([^`]+)` ".r.findAllMatchIn(sql).map(_.group(1)).toSeq
      if (!cols.contains(pk))
        throw new java.sql.SQLSyntaxErrorException(s"PRIMARY KEY `$pk` not a column: $sql")
    case _ => ()
  }
}
