package graft.sink

import graft.SparkSpec
import graft.config.{ColumnSpec, TableSpec}

import java.util.Properties

/** Runtime coverage of W1/W3/C1: the REAL writeBatch path (executor
  * partitions → DriverManager → prepared statement batches → per-partition
  * transaction) against the in-memory JDBC double. */
class UpsertWriterRuntimeSpec extends SparkSpec {
  import spark.implicits._

  val spec = TableSpec("users", Seq(
    ColumnSpec("name", "varchar(100)"),
    ColumnSpec("visits", "bigint(20)")))

  test("writeBatch upserts a DataFrame through real JDBC machinery") {
    MemJdbc.reset("db1")
    val df = Seq(("u1", "ann", 1L), ("u2", "bob", 2L)).toDF("_id", "name", "visits")
      .repartition(3) // exercise multiple partitions incl. empty ones
    UpsertWriter.writeBatch(df, spec, MemJdbc.UrlPrefix + "db1", new Properties(), batchSize = 1)
    assert(MemJdbc.table("db1", "users") == Map(
      "u1" -> Map("_id" -> "u1", "name" -> "ann", "visits" -> 1L),
      "u2" -> Map("_id" -> "u2", "name" -> "bob", "visits" -> 2L)))
  }

  test("replaying the same batch is idempotent; later batch updates win") {
    MemJdbc.reset("db2")
    val df = Seq(("u1", "ann", 1L)).toDF("_id", "name", "visits")
    val url = MemJdbc.UrlPrefix + "db2"
    UpsertWriter.writeBatch(df, spec, url, new Properties())
    UpsertWriter.writeBatch(df, spec, url, new Properties()) // replay
    assert(MemJdbc.table("db2", "users").size == 1)
    val df2 = Seq(("u1", "anne", 5L)).toDF("_id", "name", "visits")
    UpsertWriter.writeBatch(df2, spec, url, new Properties())
    assert(MemJdbc.table("db2", "users")("u1")("name") == "anne")
  }

  test("offset co-commits transactionally with data (C1)") {
    MemJdbc.reset("db3")
    val conn = MemJdbc.connect("db3")
    conn.setAutoCommit(false)
    UpsertWriter.commitOffset(conn, 12345L)
    // not visible before commit
    assert(MemJdbc.table("db3", UpsertWriter.StateTable).isEmpty)
    conn.commit()
    val stored = MemJdbc.table("db3", UpsertWriter.StateTable)("timestamp")("value")
    assert(new String(stored.asInstanceOf[Array[Byte]], "UTF-8") == "12345")
    // rollback path discards
    UpsertWriter.commitOffset(conn, 99999L)
    conn.rollback()
    conn.commit()
    val after = MemJdbc.table("db3", UpsertWriter.StateTable)("timestamp")("value")
    assert(new String(after.asInstanceOf[Array[Byte]], "UTF-8") == "12345")
  }
}
