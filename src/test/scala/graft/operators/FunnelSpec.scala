package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  // u1 completes all stages in order; u2 clicks BEFORE its first view
  // (click must not count) then purchases after the view; u3 only views;
  // u4 never views (excluded entirely despite clicking/purchasing).
  private def events = Seq(
    ("u1", "view", 10L), ("u1", "click", 20L), ("u1", "purchase", 30L),
    ("u2", "click", 5L), ("u2", "view", 10L), ("u2", "purchase", 40L),
    ("u3", "view", 10L),
    ("u4", "click", 10L), ("u4", "purchase", 20L))
    .toDF("user_id", "event_type", "ts")

  private val stageTypes = Seq("view", "click", "purchase")

  test("stages: earliest-qualifying-event semantics, order respected") {
    val out = Funnel.stages(events, "user_id", "event_type", "ts", stageTypes)
      .select("user_id", "stage_0_ts", "stage_1_ts", "stage_2_ts")
      .as[(String, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.keySet == Set("u1", "u2", "u3"))
    assert(out("u1") == ((Some(10L), Some(20L), Some(30L))))
    // u2's pre-view click is ignored; no later click exists, so the
    // purchase cannot qualify either (stage order is respected)
    assert(out("u2") == ((Some(10L), None, None)))
    assert(out("u3") == ((Some(10L), None, None)))
  }

  test("same-timestamp events qualify (at-or-after, inclusive)") {
    val ev = Seq(("u", "view", 10L), ("u", "click", 10L), ("u", "purchase", 10L))
      .toDF("user_id", "event_type", "ts")
    val out = Funnel.stages(ev, "user_id", "event_type", "ts", stageTypes)
      .select("stage_2_ts").as[Option[Long]].head()
    assert(out.contains(10L))
  }

  test("census counts stage survivors and step rates") {
    val c = Funnel.census(
        Funnel.stages(events, "user_id", "event_type", "ts", stageTypes), stageTypes)
      .select("n_view", "n_click", "n_purchase", "rate_click", "rate_purchase")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(c == ((3L, 1L, 1L, 0.3333, 1.0)))
  }

  test("windowed funnel: later stages must land within windowLen of stage 0") {
    // u1: click at +10, purchase at +20 — inside a 25-tick window;
    // u5: clicks inside the window but purchases outside it;
    // u6: clicks outside the window entirely.
    val ev = Seq(
      ("u1", "view", 10L), ("u1", "click", 20L), ("u1", "purchase", 30L),
      ("u5", "view", 10L), ("u5", "click", 30L), ("u5", "purchase", 100L),
      ("u6", "view", 10L), ("u6", "click", 99L))
      .toDF("user_id", "event_type", "ts")
    val out = Funnel.stagesWindowed(ev, "user_id", "event_type", "ts",
        stageTypes, windowLen = 25L)
      .select("user_id", "stage_0_ts", "stage_1_ts", "stage_2_ts")
      .as[(String, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("u1") == ((Some(10L), Some(20L), Some(30L))))
    assert(out("u5") == ((Some(10L), Some(30L), None)))
    assert(out("u6") == ((Some(10L), None, None)))
  }

  test("windowed funnel window boundary is inclusive") {
    val ev = Seq(("u", "view", 10L), ("u", "click", 35L))
      .toDF("user_id", "event_type", "ts")
    val out = Funnel.stagesWindowed(ev, "user_id", "event_type", "ts",
        Seq("view", "click"), windowLen = 25L)
      .select("stage_1_ts").as[Option[Long]].head()
    assert(out.contains(35L))
  }

  test("windowed funnel equals unwindowed funnel when the window covers everything") {
    val a = Funnel.stagesWindowed(events, "user_id", "event_type", "ts",
        stageTypes, windowLen = Long.MaxValue / 2)
      .orderBy("user_id").collect().toSeq
    val b = Funnel.stages(events, "user_id", "event_type", "ts", stageTypes)
      .orderBy("user_id").collect().toSeq
    assert(a == b)
  }

  test("stage joins reuse the entity hash partitioning: one exchange per stage slice") {
    val out = Funnel.stages(events, "user_id", "event_type", "ts", stageTypes)
    val p = out.queryExecution.executedPlan.toString
    // 3 stage slices -> at most 3 aggregate exchanges + join exchanges that
    // Spark reuses; the plan must not contain a cartesian or broadcast-loop
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }
}
