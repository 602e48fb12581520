package graft.operators

import graft.SparkSpec
import graft.config.{ColumnSpec, TableSpec}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  test("flatten joins nested struct paths with _ (obj2plain, mongo.go:141-155)") {
    val df = spark.range(1).select(
      struct(lit(1).as("pub"), struct(lit("x").as("y")).as("deep")).as("cfg"),
      lit(2).as("top"))
    val flat = Transforms.flatten(df)
    assert(flat.columns.toSeq == Seq("cfg_pub", "cfg_deep_y", "top"))
    assert(flat.collect()(0) == Row(1, "x", 2))
  }

  test("flatten resolves name collisions deterministically with __n suffix") {
    val df = spark.range(1).select(
      struct(lit(1).as("b")).as("a"),   // flattens to a_b
      lit(2).as("a_b"))                 // literal a_b collides
    val flat = Transforms.flatten(df)
    assert(flat.columns.toSeq == Seq("a_b", "a_b__1"))
    assert(flat.collect()(0) == Row(1, 2))
  }

  test("projectTo: NULL-fill for absent columns, declared order, cast (mysql.go:381-407)") {
    val spec = TableSpec("t", Seq(
      ColumnSpec("name", "varchar(100)"),
      ColumnSpec("visits", "bigint(20)"),
      ColumnSpec("missing", "int")))
    val df = Seq(("id1", "alice", 7)).toDF("_id", "name", "visits")
    val out = Transforms.projectTo(df, spec)
    assert(out.columns.toSeq == Seq("_id", "name", "visits", "missing"))
    assert(out.schema("visits").dataType == LongType)
    assert(out.collect()(0) == Row("id1", "alice", 7L, null))
  }

  test("projectTo: nested dotted paths flatten to underscore sink names") {
    val spec = TableSpec("t", Seq(ColumnSpec("cfg.pub", "tinyint(1)")))
    val df = spark.range(1).select(lit("i").as("_id"),
      struct(lit(true).as("pub")).as("cfg"))
    val out = Transforms.projectTo(df, spec)
    assert(out.columns.toSeq == Seq("_id", "cfg_pub"))
    assert(out.collect()(0) == Row("i", true))
  }

  test("P4 conversions: array/map/struct → JSON text, binary → base64 (mysql.go:399-406)") {
    val df = spark.range(1).select(
      lit("i").as("_id"),
      array(lit(1), lit(2)).as("arr"),
      struct(lit(5).as("x")).as("doc"))
    val spec = TableSpec("t", Seq(
      ColumnSpec("arr", "blob"), ColumnSpec("doc", "blob")))
    val out = Transforms.projectTo(df, spec).collect()(0)
    assert(out == Row("i", "[1,2]", """{"x":5}"""))
    // binary → base64, applied symmetrically (reference had it update-only)
    val b = Transforms.convert(lit(Array[Byte](1, 2)), BinaryType, StringType)
    assert(spark.range(1).select(b).as[String].head() == "AQI=")
  }

  test("col4sql renames dots to underscores (mysql.go:54-56)") {
    assert(Transforms.col4sql("cfg.pub") == "cfg_pub")
    assert(Transforms.col4sql("plain") == "plain")
  }

  test("resolveType walks nested schemas") {
    val schema = StructType(Seq(StructField("a",
      StructType(Seq(StructField("b", IntegerType))))))
    assert(Transforms.resolveType(schema, "a.b").contains(IntegerType))
    assert(Transforms.resolveType(schema, "a.zz").isEmpty)
  }
}
