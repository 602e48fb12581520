package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts, seq, value): key 1 observes buckets 0, 3 (gap 1-2);
  // bucket 0 has two observations, later ts wins; bucket 3 has a ts tie
  // broken by the seq tiebreak
  private def data = Seq(
    (1L, 5L, 1L, 10.0), (1L, 9L, 2L, 11.0),
    (1L, 35L, 3L, 40.0), (1L, 35L, 4L, 41.0),
    (2L, 12L, 5L, 7.0))
    .toDF("k", "ts", "seq", "v")

  test("forward fill: dense grid per key, gaps carry the last observation") {
    val out = Resample.forwardFill(data, "k", "ts", "v",
        bucketWidth = 10L, tiebreak = Seq(col("seq")))
      .as[(Long, Long, Double)].collect().toSet
    assert(out == Set(
      (1L, 0L, 11.0), // later ts in bucket 0 wins
      (1L, 1L, 11.0), // gap forward-filled
      (1L, 2L, 11.0),
      (1L, 3L, 41.0), // ts tie broken by seq desc (max_by)
      (2L, 1L, 7.0))) // key 2's span is its single bucket
  }

  test("spans never extend beyond a key's own observations") {
    val spans = Resample.forwardFill(data, "k", "ts", "v", bucketWidth = 10L,
        tiebreak = Seq(col("seq")))
      .as[(Long, Long, Double)].collect().groupBy(_._1)
      .view.mapValues(r => (r.map(_._2).min, r.map(_._2).max)).toMap
    assert(spans == Map(1L -> ((0L, 3L)), 2L -> ((1L, 1L))))
  }

  test("rejects a non-positive bucket width") {
    intercept[IllegalArgumentException] {
      Resample.forwardFill(data, "k", "ts", "v", bucketWidth = 0L)
    }
  }

  test("negative timestamps bucket by floor division, like DuckDB //") {
    // ts = -5 at width 10: floor(-5/10) = -1 (truncation would give 0);
    // ts = -15: floor = -2. The key's grid runs -2..0 with the gapless fill.
    val neg = Seq((1L, -15L, 1L, 1.0), (1L, -5L, 2L, 2.0), (1L, 9L, 3L, 3.0))
      .toDF("k", "ts", "seq", "v")
    val out = Resample.forwardFill(neg, "k", "ts", "v",
        bucketWidth = 10L, tiebreak = Seq(col("seq")))
      .as[(Long, Long, Double)].collect().toSet
    assert(out == Set((1L, -2L, 1.0), (1L, -1L, 2.0), (1L, 0L, 3.0)))
  }

  test("backtick-hostile column names are quoted, not parsed") {
    val odd = data.withColumnRenamed("ts", "ts col")
    val out = Resample.forwardFill(odd, "k", "ts col", "v",
        bucketWidth = 10L, tiebreak = Seq(col("seq")))
      .as[(Long, Long, Double)].collect().toSet
    assert(out.nonEmpty && out.contains((1L, 0L, 11.0)))
  }

  test("a key spanning more than maxBuckets fails fast with the key and span") {
    // key 9 observes ts 0 and 1000 at width 1: span 1001 buckets > cap 100
    val wide = Seq((9L, 0L, 1L, 1.0), (9L, 1000L, 2L, 2.0))
      .toDF("k", "ts", "seq", "v")
    val e = intercept[Exception] {
      Resample.forwardFill(wide, "k", "ts", "v", bucketWidth = 1L,
        tiebreak = Seq(col("seq")), maxBuckets = 100L).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("maxBuckets") && msg.contains("1001") && msg.contains("key 9"))
  }

  test("maxBuckets exactly at the span passes") {
    val wide = Seq((9L, 0L, 1L, 1.0), (9L, 99L, 2L, 2.0))
      .toDF("k", "ts", "seq", "v")
    val rows = Resample.forwardFill(wide, "k", "ts", "v", bucketWidth = 1L,
      tiebreak = Seq(col("seq")), maxBuckets = 100L).count()
    assert(rows == 100L)
  }
}
