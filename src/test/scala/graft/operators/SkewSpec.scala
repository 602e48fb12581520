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
