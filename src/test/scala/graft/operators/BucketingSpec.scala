package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("joining two tables bucketed on the key plans with NO exchange") {
    val n = 1000
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Bucketing.writeBucketed(
        (1 to n).map(i => (i.toLong, s"name$i")).toDF("k", "name"),
        "bk_users", "k", buckets = 4, sortCols = Seq("k"))
      Bucketing.writeBucketed(
        (1 to n).map(i => (i.toLong, i * 10.0)).toDF("k", "bal"),
        "bk_balances", "k", buckets = 4, sortCols = Seq("k"))

      val joined = Bucketing.readBucketed(spark, "bk_users")
        .join(Bucketing.readBucketed(spark, "bk_balances"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == n)

      // same join on unbucketed frames DOES shuffle — the baseline cost
      val plain = (1 to n).map(i => (i.toLong, s"name$i")).toDF("k", "name")
        .join((1 to n).map(i => (i.toLong, i * 10.0)).toDF("k", "bal"), Seq("k"))
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bk_users")
      spark.sql("DROP TABLE IF EXISTS bk_balances")
    }
  }

  test("bucketed aggregation on the bucket key avoids the shuffle too") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        (1 to 500).map(i => (i.toLong % 50, i.toDouble)).toDF("k", "v"),
        "bk_agg", "k", buckets = 4)
      val agg = Bucketing.readBucketed(spark, "bk_agg")
        .groupBy("k").agg(sum("v").as("sv"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(agg.count() == 50)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bk_agg")
    }
  }
}
