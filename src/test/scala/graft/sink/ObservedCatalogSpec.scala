package graft.sink

import java.util.Properties

import graft.Daemon
import graft.config.{ColumnSpec, MappingConfig, TableSpec}
import org.scalatest.funsuite.AnyFunSuite

/** `Daemon.observedCatalog` against MemJdbc's DDL-tracked metadata: the
  * SHOW TABLES / SHOW COLUMNS leg round-trips, LIKE wildcards in table
  * names are escaped, and schema reconciliation converges: plan →
  * execute → observe → re-plan is a fixpoint (no Add/Drop/Create left).
  */
class ObservedCatalogSpec extends AnyFunSuite {

  private val Db = "obscat"

  private def cfg(tables: TableSpec*) =
    MappingConfig("mongodb://src/app", MemJdbc.UrlPrefix + Db, tables)

  test("observedCatalog reads the DDL-tracked catalog with sizes rendered") {
    MemJdbc.reset(Db)
    val spec = TableSpec("users", Seq(
      ColumnSpec("name", "varchar(100)"), ColumnSpec("visits", "bigint(20)")))
    val conn = MemJdbc.connect(Db)
    conn.setAutoCommit(false)
    SchemaSync.plan(cfg(spec), Map.empty, force = false)
      .ddl.foreach(d => conn.prepareStatement(d.sql).executeUpdate())
    conn.commit()
    val observed = Daemon.observedCatalog(conn)
    assert(observed.keySet == Set("users"))
    // MySQL 8 drops integer display widths: declared bigint(20) is
    // observed as bare bigint — typeEq must equate them (the fixpoint
    // test below locks that no destructive migration is planned)
    assert(observed("users") == Seq(
      "_id" -> "varchar(24)", "name" -> "varchar(100)", "visits" -> "bigint"))
  }

  test("underscore-bearing table names do not merge other tables' columns") {
    MemJdbc.reset(Db)
    val conn = MemJdbc.connect(Db)
    conn.setAutoCommit(false)
    Seq(
      "CREATE TABLE `user_stats` (`_id` varchar(24) NOT NULL, PRIMARY KEY (`_id`))",
      "ALTER TABLE `user_stats` ADD COLUMN `a` double NULL",
      // `user1stats` matches the UNescaped LIKE pattern `user_stats`
      "CREATE TABLE `user1stats` (`_id` varchar(24) NOT NULL, PRIMARY KEY (`_id`))",
      "ALTER TABLE `user1stats` ADD COLUMN `intruder` double NULL")
      .foreach(sql => conn.prepareStatement(sql).executeUpdate())
    conn.commit()
    val observed = Daemon.observedCatalog(conn)
    assert(observed("user_stats").map(_._1) == Seq("_id", "a"))
    assert(!observed("user_stats").exists(_._1 == "intruder"))
  }

  test("schema reconciliation is a fixpoint: re-plan after execute is order-only") {
    MemJdbc.reset(Db)
    val spec = TableSpec("orders", Seq(
      ColumnSpec("status", "varchar(1)"), ColumnSpec("total", "double"),
      ColumnSpec("qty", "bigint(20)"))) // display width must not churn
    val conn = MemJdbc.connect(Db)
    conn.setAutoCommit(false)
    SchemaSync.plan(cfg(spec), Map.empty, force = false)
      .ddl.foreach(d => conn.prepareStatement(d.sql).executeUpdate())
    conn.commit()
    val observed = Daemon.observedCatalog(conn)
    val replan = SchemaSync.plan(cfg(spec), observed, force = false)
    // converged: no creates, adds, or drops — only the unconditional
    // column reorders (already in declared order, hence no-ops to execute)
    assert(replan.ddl.forall(_.isInstanceOf[SchemaSync.ReorderColumn]))
    assert(replan.resyncColumns.values.forall(_.isEmpty))
    // and executing the re-plan changes nothing
    conn.setAutoCommit(false)
    replan.ddl.foreach(d => conn.prepareStatement(d.sql).executeUpdate())
    conn.commit()
    assert(Daemon.observedCatalog(conn) == observed)
  }
}
