package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MergeApplySpec extends SparkSpec {
  import spark.implicits._

  def base = Seq(("a", 1.0, "s1"), ("b", 2.0, "s2")).toDF("_id", "bal", "seg")

  def changes = Seq(
    // key a: two updates out of order — latest (ts=20) must win
    ("a", "update", 20L, 1, Some(100.0), None: Option[String]),
    ("a", "update", 10L, 2, Some(50.0), None: Option[String]),
    // key b: update then delete — delete wins
    ("b", "update", 10L, 3, Some(60.0), None: Option[String]),
    ("b", "delete", 20L, 4, None: Option[Double], None: Option[String]),
    // key c: fresh insert
    ("c", "insert", 5L, 5, Some(9.0), Some("s9")))
    .toDF("_id", "op", "ts", "seq", "bal", "seg")

  test("lastImage keeps exactly the latest row per key with tiebreak") {
    val last = MergeApply.lastImage(changes, Seq("_id"), Seq(col("ts"), col("seq")))
    val byId = last.collect().map(r => r.getString(0) -> r.getInt(3)).toMap
    assert(byId == Map("a" -> 1, "b" -> 4, "c" -> 5)) // seq of winning row
    // equal ts: higher tiebreak wins deterministically
    val tie = Seq(("k", 1L, 1, "first"), ("k", 1L, 2, "second")).toDF("_id", "ts", "seq", "v")
    val winner = MergeApply.lastImage(tie, Seq("_id"), Seq(col("ts"), col("seq")))
    assert(winner.select("v").as[String].head() == "second")
  }

  test("applyChanges: last-write-wins, partial update preserves untouched columns, delete removes") {
    val out = MergeApply.applyChanges(base, changes, "_id", "op",
      Seq(col("ts"), col("seq")), Seq("bal", "seg")).orderBy("_id").collect()
    assert(out.toSeq == Seq(
      Row("a", 100.0, "s1"), // updated bal, seg preserved from base
      Row("c", 9.0, "s9")))  // inserted; b deleted
  }

  test("applyChanges is idempotent under replay (C1 invariant, mysql.go:563-588)") {
    val once = MergeApply.applyChanges(base, changes, "_id", "op",
      Seq(col("ts"), col("seq")), Seq("bal", "seg"))
    val twice = MergeApply.applyChanges(once, changes, "_id", "op",
      Seq(col("ts"), col("seq")), Seq("bal", "seg"))
    assert(twice.orderBy("_id").collect().toSeq ==
      once.orderBy("_id").collect().toSeq)
  }

  test("deleteReconcile = left anti join (replaces per-row FindOne, run.go:256-279)") {
    val sink = Seq("a", "b", "c").toDF("_id")
    val source = Seq("b").toDF("_id")
    val gone = MergeApply.deleteReconcile(sink, source, "_id")
      .as[String].collect().sorted.toSeq
    assert(gone == Seq("a", "c"))
  }
}
