package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    ("u1", 100L, "p1"), ("u1", 200L, "p2"), ("u1", 50L, "p0"),
    ("u2", 100L, "p3")).toDF("k", "ts", "pid")

  private def right = Seq(
    ("u1", 60L, "r1"), ("u1", 100L, "r2"), ("u1", 150L, "r3"),
    ("u3", 10L, "r4")).toDF("k", "ts", "rid")

  test("matches the latest right row at or before each left ts, null when none") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts")
      .select("pid", "rid", "ts_right").as[(String, Option[String], Option[Long])]
      .collect().map { case (k, v, t) => k -> ((v, t)) }.toMap
    assert(out("p0") == ((None, None)))          // nothing at ts<=50
    assert(out("p1") == ((Some("r2"), Some(100L)))) // inclusive: 100<=100 beats 60
    assert(out("p2") == ((Some("r3"), Some(150L))))
    assert(out("p3") == ((None, None)))          // u2 has no right rows at all
  }

  test("tolerance nulls out matches farther in the past") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts", tolerance = Some(40L))
      .select("pid", "rid").as[(String, Option[String])].collect().toMap
    assert(out("p1").contains("r2")) // lag 0 <= 40
    assert(out("p2").isEmpty)        // lag 200-150=50 > 40 -> nulled out
  }

  test("tolerance boundary is inclusive") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts", tolerance = Some(50L))
      .select("pid", "rid").as[(String, Option[String])].collect().toMap
    assert(out("p2").contains("r3")) // exactly 50
  }

  test("rightOrder breaks equal-ts ties toward the largest tuple") {
    val r2 = Seq(("u1", 100L, "a"), ("u1", 100L, "z"), ("u1", 100L, "m"))
      .toDF("k", "ts", "rid")
    val l2 = Seq(("u1", 120L, "p")).toDF("k", "ts", "pid")
    val out = AsOf.asofJoin(l2, r2, Seq("k"), "ts", rightOrder = Seq("rid"))
      .select("rid").as[String].collect()
    assert(out.toSeq == Seq("z"))
  }

  test("colliding right payload names are rejected") {
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(left, right.withColumnRenamed("rid", "pid"), Seq("k"), "ts")
    }
  }

  test("forward direction matches the earliest right row at or after each left ts") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts", direction = "forward")
      .select("pid", "rid", "ts_right").as[(String, Option[String], Option[Long])]
      .collect().map { case (k, v, t) => k -> ((v, t)) }.toMap
    assert(out("p0") == ((Some("r1"), Some(60L))))   // earliest at ts>=50
    assert(out("p1") == ((Some("r2"), Some(100L))))  // inclusive: 100>=100
    assert(out("p2") == ((None, None)))              // nothing at ts>=200
    assert(out("p3") == ((None, None)))
  }

  test("forward tolerance nulls out matches too far in the future") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts",
        tolerance = Some(5L), direction = "forward")
      .select("pid", "rid").as[(String, Option[String])].collect().toMap
    assert(out("p0").isEmpty)        // 60-50=10 > 5
    assert(out("p1").contains("r2")) // gap 0
  }

  test("invalid direction is rejected") {
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(left, right, Seq("k"), "ts", direction = "sideways")
    }
  }

  test("differential: matches a brute-force reference on pseudo-random data, both directions") {
    // deterministic pseudo-random fixture (no Random: repeatable)
    def h(i: Int, salt: Int): Long = ((i * 2654435761L + salt * 40503L) % 997 + 997) % 997
    val lRows = (0 until 300).map(i => (s"u${h(i, 1) % 7}", h(i, 2), s"p$i"))
    val rRows = (0 until 200).map(i => (s"u${h(i, 3) % 9}", h(i, 4), s"r$i"))
    def run(direction: String) = AsOf.asofJoin(
        lRows.toDF("k", "ts", "pid"), rRows.toDF("k", "ts", "rid"),
        Seq("k"), "ts", rightOrder = Seq("rid"), direction = direction)
      .select("pid", "rid").as[(String, Option[String])].collect().toMap
    val expectedBack = lRows.map { case (k, ts, pid) =>
      val best = rRows.filter(r => r._1 == k && r._2 <= ts)
        .sortBy(r => (r._2, r._3)).lastOption
      (pid, best.map(_._3))
    }.toMap
    assert(run("backward") == expectedBack)
    // forward: earliest ts at-or-after; among equal-ts candidates the
    // LARGEST rightOrder tuple wins (same tie rule as backward)
    val expectedFwd = lRows.map { case (k, ts, pid) =>
      val cands = rRows.filter(r => r._1 == k && r._2 >= ts)
      val best = cands.sortBy(r => (r._2, r._3))(
        Ordering.Tuple2(Ordering.Long, Ordering.String.reverse)).headOption
      (pid, best.map(_._3))
    }.toMap
    assert(run("forward") == expectedFwd)
  }

  test("rejects reserved internal column names on either input") {
    Seq("__side", "__r", "__lr", "__rts", "ts_right").foreach { bad =>
      val e = intercept[IllegalArgumentException] {
        AsOf.asofJoin(left.withColumn(bad, lit(1)), right, Seq("k"), "ts")
      }
      assert(e.getMessage.contains(bad), s"left-side $bad")
      intercept[IllegalArgumentException] {
        AsOf.asofJoin(left, right.withColumn(bad, lit(1)), Seq("k"), "ts")
      }
    }
  }

  test("null-ts right rows never match (no phantom fallback)") {
    val r = Seq(("u1", Option(60L), "r1"), ("u1", Option.empty[Long], "rz"))
      .toDF("k", "ts", "rid")
    val l = Seq(("u1", 50L, "p0"), ("u1", 70L, "p1")).toDF("k", "ts", "pid")
    val out = AsOf.asofJoin(l, r, Seq("k"), "ts")
      .select("pid", "rid").as[(String, Option[String])].collect().toMap
    assert(out("p0").isEmpty)        // nothing at ts<=50; rz must NOT appear
    assert(out("p1").contains("r1"))
  }

  test("plans one exchange on the key, no join operator") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts")
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "asof must not plan a join")
    assert("ShuffleExchange|Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      "expected the single key shuffle (plus at most AQE reuse)")
  }
}
