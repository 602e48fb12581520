package graft.sink

import graft.config.{ColumnSpec, MappingConfig, TableSpec}
import org.scalatest.funsuite.AnyFunSuite

class SchemaSyncSpec extends AnyFunSuite {

  val config = MappingConfig("in", "out", Seq(
    TableSpec("users", Seq(
      ColumnSpec("name", "varchar(100)"),
      ColumnSpec("visits", "bigint(20)")))))

  test("missing table → CREATE with pk only, all columns added + resync (mysql.go:183-198)") {
    val plan = SchemaSync.plan(config, Map.empty, force = false)
    assert(plan.ddl.head == SchemaSync.CreateTable("users"))
    assert(plan.ddl.collect { case a: SchemaSync.AddColumn => a.column } ==
      Seq("name", "visits"))
    assert(plan.resyncColumns == Map("users" -> Set("name", "visits")))
  }

  test("type mismatch → destructive drop+add + resync under force (mysql.go:223-236)") {
    val observed = Map("users" -> Seq(
      "_id" -> "varchar(24)", "name" -> "varchar(50)", "visits" -> "bigint(20)"))
    val plan = SchemaSync.plan(config, observed, force = true)
    val ddl = plan.ddl.map(_.sql)
    assert(ddl.contains("ALTER TABLE `users` DROP COLUMN `name`"))
    assert(ddl.contains("ALTER TABLE `users` ADD COLUMN `name` varchar(100) NULL"))
    assert(plan.resyncColumns == Map("users" -> Set("name")))
  }

  test("type mismatch without force REFUSES, names the column (mysql.go:238-240)") {
    val observed = Map("users" -> Seq(
      "_id" -> "varchar(24)", "name" -> "varchar(50)", "visits" -> "bigint(20)"))
    val e = intercept[SchemaSync.ForceRequired] {
      SchemaSync.plan(config, observed, force = false)
    }
    assert(e.getMessage.contains("users.[name]") && e.getMessage.contains("--force"))
  }

  test("unmapped column without force REFUSES (mysql.go:238-240)") {
    val observed = Map("users" -> Seq(
      "_id" -> "varchar(24)", "name" -> "varchar(100)",
      "visits" -> "bigint(20)", "legacy" -> "text"))
    val e = intercept[SchemaSync.ForceRequired] {
      SchemaSync.plan(config, observed, force = false)
    }
    assert(e.getMessage.contains("legacy"))
    // under force the stray column is dropped, the declared ones untouched
    val forced = SchemaSync.plan(config, observed, force = true)
    assert(forced.ddl.contains(SchemaSync.DropColumn("users", "legacy")))
    assert(!forced.ddl.contains(SchemaSync.DropColumn("users", "name")))
  }

  test("type comparison is case/whitespace-insensitive (mysql.go:219-222)") {
    val observed = Map("users" -> Seq(
      "_id" -> "varchar(24)", "name" -> "VARCHAR( 100 )", "visits" -> "bigint(20)"))
    val plan = SchemaSync.plan(config, observed, force = false)
    assert(!plan.ddl.exists(_.sql.contains("DROP COLUMN `name`")))
  }

  test("unmapped table: refused without force, dropped with it; state table survives (mysql.go:167-177)") {
    val observed = Map(
      "users" -> Seq("_id" -> "varchar(24)", "name" -> "varchar(100)", "visits" -> "bigint(20)"),
      "stray" -> Seq("_id" -> "varchar(24)"),
      UpsertWriter.StateTable -> Seq("name" -> "varchar(100)"))
    val e = intercept[SchemaSync.ForceRequired] {
      SchemaSync.plan(config, observed, force = false)
    }
    assert(e.getMessage.contains("stray") && e.getMessage.contains("--force"))
    val forced = SchemaSync.plan(config, observed, force = true)
    assert(forced.ddl.contains(SchemaSync.DropTable("stray")))
    assert(!forced.ddl.exists(_.sql.contains(UpsertWriter.StateTable)))
  }

  test("in-sync catalog yields only the column reorder pass (mysql.go:267-285)") {
    val observed = Map("users" -> Seq(
      "_id" -> "varchar(24)", "name" -> "varchar(100)", "visits" -> "bigint(20)"))
    val plan = SchemaSync.plan(config, observed, force = false)
    assert(plan.ddl == Seq(
      SchemaSync.ReorderColumn("users", "name", "varchar(100)", "_id"),
      SchemaSync.ReorderColumn("users", "visits", "bigint(20)", "name")))
    assert(plan.resyncColumns.isEmpty)
  }
}
