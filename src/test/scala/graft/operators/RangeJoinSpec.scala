package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    ("u1", 5L, "a"), ("u1", 15L, "b"), ("u1", 25L, "c"), ("u2", 15L, "d"))
    .toDF("k", "p", "pid")

  // i1 spans bins [0,2] at width 10; i2 is fully inside one bin
  private def intervals = Seq(
    ("u1", 3L, 26L, "i1"), ("u1", 14L, 16L, "i2"), ("u2", 0L, 5L, "i3"))
    .toDF("k", "s", "e", "iid")

  private def run(binWidth: Long) =
    RangeJoin.pointInInterval(points, intervals, "p", "s", "e", binWidth, Seq("k"))
      .select("pid", "iid").as[(String, String)].collect().toSeq.sorted

  test("matches points to covering intervals across bin boundaries, exactly once") {
    val expected = Seq("a" -> "i1", "b" -> "i1", "b" -> "i2", "c" -> "i1").sorted
    assert(run(binWidth = 10L) == expected)
  }

  test("result is bin-width invariant (pairs meet in exactly one bin)") {
    assert(run(1L) == run(10L) && run(10L) == run(1000L))
  }

  test("interval bounds are inclusive on both ends") {
    val p = Seq(("k", 3L, "lo"), ("k", 26L, "hi")).toDF("k", "p", "pid")
    val iv = Seq(("k", 3L, 26L, "i")).toDF("k", "s", "e", "iid")
    val out = RangeJoin.pointInInterval(p, iv, "p", "s", "e", 10L, Seq("k"))
    assert(out.count() == 2)
  }

  test("equi-key misses produce no pairs") {
    val out = run(10L)
    assert(!out.exists(_._1 == "d")) // u2's point is outside i3's range
  }

  test("plans an equi-join on (key, bin), not a nested loop") {
    val out = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 10L, Seq("k"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range join degenerated to a nested loop")
  }

  test("matches survive double-rounded binning above 2^53 (nanosecond-scale longs)") {
    // bins may shift off exact boundaries up here, but monotonicity keeps
    // point and covering interval in a shared bin and the residual is exact
    val base = 1700000000000000000L
    val p = Seq(("k", base + 3, "p")).toDF("k", "p", "pid")
    val iv = Seq(("k", base + 1, base + 5, "i")).toDF("k", "s", "e", "iid")
    val out = RangeJoin.pointInInterval(p, iv, "p", "s", "e", 1000L, Seq("k"))
    assert(out.count() == 1)
  }

  test("negative domains floor correctly across zero") {
    val p = Seq(("k", -5L, "p")).toDF("k", "p", "pid")
    val iv = Seq(("k", -7L, -3L, "i")).toDF("k", "s", "e", "iid")
    val out = RangeJoin.pointInInterval(p, iv, "p", "s", "e", 10L, Seq("k"))
    assert(out.count() == 1)
  }

  test("colliding column names are rejected") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, intervals.withColumnRenamed("iid", "pid"),
        "p", "s", "e", 10L, Seq("k"))
    }
  }

  // ---- intervalOverlap ----

  private def leftIv = (0 until 40).map { i =>
    val s = (i * 2654435761L) % 200
    (s"u${i % 3}", s, s + (i * 7919) % 60, s"L$i")
  }.toDF("k", "ls", "le", "lid")

  private def rightIv = (0 until 40).map { i =>
    val s = (i * 40503L + 13) % 200
    (s"u${i % 3}", s, s + (i * 104729) % 45, s"R$i")
  }.toDF("k", "rs", "re", "rid")

  private def overlapNaive: Seq[(String, String)] =
    leftIv.join(rightIv, Seq("k"))
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").as[(String, String)].collect().toSeq.sorted

  private def overlapBinned(w: Long): Seq[(String, String)] =
    RangeJoin.intervalOverlap(leftIv, rightIv, "ls", "le", "rs", "re", w, Seq("k"))
      .select("lid", "rid").as[(String, String)].collect().toSeq.sorted

  test("intervalOverlap matches the naive theta join, each pair exactly once") {
    val expected = overlapNaive
    assert(expected.nonEmpty && expected.size > 100, "fixture should overlap a lot")
    Seq(1L, 7L, 50L, 1000L).foreach { w =>
      val got = overlapBinned(w)
      assert(got == expected, s"binWidth=$w")
      assert(got.distinct.size == got.size, s"duplicate pairs at binWidth=$w")
    }
  }

  test("intervalOverlap: touching endpoints are inclusive, disjoint are excluded") {
    val l = Seq(("k", 0L, 10L, "a")).toDF("k", "ls", "le", "lid")
    val r = Seq(("k", 10L, 20L, "touch"), ("k", 11L, 20L, "gap")).toDF("k", "rs", "re", "rid")
    val out = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re", 5L, Seq("k"))
      .select("rid").as[String].collect().toSeq
    assert(out == Seq("touch"))
  }
}
