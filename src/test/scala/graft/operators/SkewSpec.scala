package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join (inner) on a skewed key") {
    val skewed = (Seq.fill(500)("hot") ++ Seq("a", "b", "c")).zipWithIndex
      .toDF("k", "v")
    val small = Seq(("hot", 1), ("a", 2), ("z", 3)).toDF("k", "w")
    val plain = skewed.join(small, Seq("k")).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("w").as("sw"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedJoin(skewed, small, "k", buckets = 8).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("w").as("sw"))
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }

  test("saltedJoin left_outer keeps unmatched skewed rows exactly once") {
    val skewed = Seq("hot", "hot", "lonely").toDF("k")
    val small = Seq(("hot", 1)).toDF("k", "w")
    val out = Skew.saltedJoin(skewed, small, "k", buckets = 4, joinType = "left_outer")
      .orderBy("k").collect()
    assert(out.length == 3)
    assert(out.count(_.isNullAt(1)) == 1) // lonely row, null w, exactly once
  }

  /** Run `body` with AQE (incl. skew-join splitting) forced on, restoring
    * the shared session's previous values after. */
  private def withAqe[A](body: => A): A = {
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceApply" -> "true")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("saltedJoin composes with AQE skew-join: adaptive re-plan, exact result") {
    withAqe {
      val skewed = (Seq.fill(500)("hot") ++ Seq("a", "b", "c")).zipWithIndex
        .toDF("k", "v")
      val small = Seq(("hot", 1), ("a", 2), ("z", 3)).toDF("k", "w")
      val joined = Skew.saltedJoin(skewed, small, "k", buckets = 8)
      val got = joined.groupBy("k")
        .agg(count(lit(1)).as("n"), sum("w").as("sw"))
        .orderBy("k").collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      // exact under adaptive re-planning: the salt spreads 'hot', AQE may
      // coalesce/convert exchanges, and neither duplicates nor drops rows
      assert(got == Seq(("a", 1L, 2L), ("hot", 500L, 500L)))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AdaptiveSparkPlan"), "AQE must be active in this spec")
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    }
  }

  test("twoPhaseAgg composes with AQE: partial->final stays exact") {
    withAqe {
      val df = (Seq.fill(1000)(("hot", 2)) ++ Seq(("cold", 5))).toDF("k", "v")
      val twoPhase = Skew.twoPhaseAgg(df, "k", buckets = 16,
        partial = Seq("n" -> count(lit(1)), "sv" -> sum(col("v"))),
        combine = Seq("n" -> sum(col("n")), "sv" -> sum(col("sv"))))
      val got = twoPhase.orderBy("k").collect().toSeq
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got == Seq(("cold", 1L, 5L), ("hot", 1000L, 2000L)))
      assert(twoPhase.queryExecution.executedPlan.toString.contains("AdaptiveSparkPlan"))
    }
  }

  test("twoPhaseAgg count/sum matches single-phase on a hot key") {
    val df = (Seq.fill(1000)(("hot", 2)) ++ Seq(("cold", 5))).toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("k").collect().toSeq
    val twoPhase = Skew.twoPhaseAgg(df, "k", buckets = 16,
      partial = Seq("n" -> count(lit(1)), "sv" -> sum(col("v"))),
      combine = Seq("n" -> sum(col("n")), "sv" -> sum(col("sv"))))
      .orderBy("k").collect().toSeq
    assert(twoPhase == direct)
  }
}
