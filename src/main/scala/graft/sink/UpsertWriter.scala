package graft.sink

import graft.config.TableSpec
import org.apache.spark.sql.DataFrame

import java.sql.{Connection, DriverManager, PreparedStatement}

/** W1/W2/W3/C1: the transactional JDBC apply path (reference
  * `mysql.go:292-588`). Spark's built-in JDBC sink is append/overwrite
  * only, so upsert-with-offset-co-commit is necessarily custom — but the
  * custom part is confined to `foreachPartition`: the plan upstream stays
  * declarative.
  *
  * Exactly-once contract (SURVEY §7 "hard parts"): `foreachBatch` may
  * replay a micro-batch after failure. Safety =
  *   (a) idempotent statements (`INSERT … ON DUPLICATE KEY UPDATE`,
  *       keyed DELETE — replays converge, `mysql.go:357-374`), plus
  *   (b) the batch's max offset committed AFTER all partitions' data
  *       transactions, in its own driver-side transaction (the C1
  *       ordering; the reference co-commits on its ONE connection,
  *       `mysql.go:563-588` — with parallel executor connections the
  *       window between data-commit and offset-commit is closed by (a)
  *       and (c), not by a shared transaction), plus
  *   (c) skip-if-already-applied: each batch reads the stored offset
  *       first and drops ops STRICTLY below it ([[readOffset]], consumed
  *       by `Replicator.startStream`) — replays after a crash in the
  *       (b)-window re-apply only the unrecorded suffix plus the
  *       boundary-ts ops, which (a) makes free; ops AT the stored ts are
  *       never skipped because a later entry may legally share that ts.
  *
  * SQL generation is pure and unit-tested; the connection path runs only
  * in integration (no MySQL in this environment).
  */
object UpsertWriter {

  val StateTable = "momyre" // reference mysql.go:128-144
  val OffsetKey  = "timestamp"

  /** `INSERT … ON DUPLICATE KEY UPDATE col=VALUES(col)` over the full
    * declared column list (insert path `mysql.go:376-431`; the reference's
    * separate UPDATE fallback on error 1062 collapses into one statement). */
  def upsertSql(spec: TableSpec): String = {
    val cols = spec.pk +: spec.columns.map(_.sinkName)
    val collist = cols.map(c => s"`$c`").mkString(", ")
    val placeholders = cols.map(_ => "?").mkString(", ")
    // a pk-only table (declarable via ConfigParser) must not render the
    // bare "ON DUPLICATE KEY UPDATE " MySQL rejects — same no-op
    // assignment fallback as partialUpsertSql's empty-present case
    val updates =
      if (spec.columns.isEmpty) s"`${spec.pk}`=VALUES(`${spec.pk}`)"
      else spec.columns.map(c => s"`${c.sinkName}`=VALUES(`${c.sinkName}`)").mkString(", ")
    s"INSERT INTO `${spec.name}` ($collist) VALUES ($placeholders) ON DUPLICATE KEY UPDATE $updates"
  }

  /** Partial-image upsert: only `present` columns are written on conflict
    * (parity with `mysql.go:449-476`, absent field → column omitted). An
    * empty present set (an update touching only unmapped columns) uses
    * the `pk=VALUES(pk)` no-op assignment — MySQL rejects a bare
    * `ON DUPLICATE KEY UPDATE` with no assignment list. */
  def partialUpsertSql(spec: TableSpec, present: Seq[String]): String = {
    val cols = spec.pk +: present
    val collist = cols.map(c => s"`$c`").mkString(", ")
    val placeholders = cols.map(_ => "?").mkString(", ")
    val updates =
      if (present.isEmpty) s"`${spec.pk}`=VALUES(`${spec.pk}`)"
      else present.map(c => s"`$c`=VALUES(`$c`)").mkString(", ")
    s"INSERT INTO `${spec.name}` ($collist) VALUES ($placeholders) ON DUPLICATE KEY UPDATE $updates"
  }

  def deleteSql(spec: TableSpec): String =
    s"DELETE FROM `${spec.name}` WHERE `${spec.pk}` = ?" // mysql.go:516-523

  /** C1: offset upsert, co-committed with data (reference `mysql.go:563-588`). */
  def offsetUpsertSql: String =
    s"INSERT INTO `$StateTable` (`name`, `value`) VALUES ('$OffsetKey', ?) " +
      "ON DUPLICATE KEY UPDATE `value`=VALUES(`value`)"

  def readOffsetSql: String =
    s"SELECT `value` FROM `$StateTable` WHERE `name` = '$OffsetKey'" // mysql.go:108-123

  /** Read the stored offset (checkpoint), None if absent/unparseable —
    * the resume position (`mysql.go:108-126`: missing row → 0) and the
    * replay guard's comparison point. The blob value is decimal text,
    * parity with `mysql.go:541`.
    *
    * Only a MISSING state table maps to None (a syntax-class error, what
    * MySQL raises for ER_NO_SUCH_TABLE and Derby for 42X05). Any other
    * SQLException — a transient connection/lock failure — propagates:
    * swallowing it as None would read as offset 0 and trigger a spurious
    * full from-scratch resync of every table. */
  def readOffset(conn: Connection, dialect: SqlDialect = MySqlDialect): Option[Long] =
    try {
      // close statement + cursor deterministically: callers reuse one
      // driver-side connection across micro-batches, and an unclosed
      // handle per batch eventually exhausts the server's cursor limit
      val ps = conn.prepareStatement(dialect.readOffsetSql)
      try {
        val rs = ps.executeQuery()
        try {
          if (rs.next()) {
            val v = rs.getObject(1) match {
              case b: Array[Byte] => new String(b, "UTF-8")
              case s: String      => s
              case other          => String.valueOf(other)
            }
            v.toLongOption
          } else None
        } finally rs.close()
      } finally ps.close()
    } catch { case _: java.sql.SQLSyntaxErrorException => None } // state table absent

  def createStateTableSql: String = // mysql.go:128-144
    s"CREATE TABLE IF NOT EXISTS `$StateTable` (`name` varchar(100) NOT NULL, " +
      "`value` blob, PRIMARY KEY (`name`))"

  /** W3: write one micro-batch transactionally. Each partition opens one
    * connection, applies its rows as a JDBC batch (amortized — the
    * reference commits one tx per row during snapshot, `run.go:235-246`),
    * and the driver co-commits the offset once all partitions succeed.
    *
    * `batchSize` bounds statement batches (≈ `rewriteBatchedStatements`).
    */
  def writeBatch(
      df: DataFrame,
      spec: TableSpec,
      url: String,
      props: java.util.Properties,
      batchSize: Int = 1000,
      dialect: SqlDialect = MySqlDialect): Unit = {
    val stmt = dialect.upsertAll(spec)
    val cols = (spec.pk +: spec.columns.map(_.sinkName)).distinct
    val idxBySink = cols.map(c => c -> df.columns.indexOf(c)).toMap
    require(idxBySink.values.forall(_ >= 0), s"batch is missing declared columns for ${spec.name}")
    // bind positions come from the dialect's declared param order (the pk
    // may occur at more than one slot — e.g. MERGE binds it twice)
    val srcIdx = stmt.params.map(idxBySink)
    val bounded = dialect.maxWriteConnections.fold(df)(df.coalesce)
    bounded.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(url, props)
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(stmt.sql)
          var n = 0
          rows.foreach { r =>
            srcIdx.zipWithIndex.foreach { case (src, dst) => bindValue(st, dst + 1, r.get(src)) }
            st.addBatch(); n += 1
            if (n % batchSize == 0) st.executeBatch()
          }
          if (n % batchSize != 0) st.executeBatch()
          conn.commit()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally conn.close()
      }
    }
  }

  /** Null-safe bind: Derby (and other strict engines) reject
    * `setObject(i, null)` without a type — resolve it from the statement's
    * parameter metadata; MySQL/the test double accept either form. */
  def bindValue(st: PreparedStatement, idx: Int, v: Any): Unit =
    if (v == null) {
      val t = try {
        Option(st.getParameterMetaData).map(_.getParameterType(idx))
          .getOrElse(java.sql.Types.VARCHAR)
      } catch { case _: java.sql.SQLException => java.sql.Types.VARCHAR }
      st.setNull(idx, t)
    } else st.setObject(idx, v)

  /** Driver-side offset co-commit for a completed micro-batch (C1). */
  def commitOffset(conn: Connection, offset: Long,
      dialect: SqlDialect = MySqlDialect): Unit = {
    val stmt = dialect.offsetUpsert
    val st: PreparedStatement = conn.prepareStatement(stmt.sql)
    try {
      val bytes = offset.toString.getBytes("UTF-8") // blob value, parity with mysql.go:541
      stmt.params.indices.foreach(i => st.setBytes(i + 1, bytes))
      st.executeUpdate(): Unit
    } finally st.close()
  }
}
