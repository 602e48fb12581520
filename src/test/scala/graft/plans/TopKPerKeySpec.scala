package graft.plans

import graft.SparkSpec
import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random rows over 11 keys with ties
  private def data = (0 until 500).map { i =>
    (s"g${i % 11}", (i * 2654435761L % 97).toDouble, i.toLong)
  }.toDF("g", "score", "id")

  private def windowed(k: Int) = data
    .withColumn("rn", row_number().over(
      Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)))
    .filter(col("rn") <= k).drop("rn")
    .select("g", "score", "id").as[(String, Double, Long)]
    .collect().toSeq.sorted

  private def custom(k: Int) =
    TopK.perKey(data, Seq("g"), Seq(col("score").desc, col("id").asc), k)
      .select("g", "score", "id").as[(String, Double, Long)]
      .collect().toSeq.sorted

  test("matches the window row_number formulation, ties broken identically") {
    Seq(1, 3, 10).foreach(k => assert(custom(k) == windowed(k), s"k=$k"))
  }

  test("k larger than every group returns all rows") {
    assert(custom(1000).size == 500)
  }

  test("plans as partial+final heap phases around ONE exchange, no sort") {
    val df = TopK.perKey(data, Seq("g"), Seq(col("score").desc, col("id").asc), 3)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyPartial"), "partial phase missing")
    assert(p.contains("TopKPerKeyFinal"), "final phase missing")
    assert(!p.contains("Sort "), "the whole point is no sort")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "expected exactly the partial->final exchange")
  }

  test("rejects unknown columns and non-positive k") {
    intercept[IllegalArgumentException] {
      TopK.perKey(data, Seq("nope"), Seq(col("score").desc), 3)
    }
    intercept[IllegalArgumentException] {
      TopK.perKey(data, Seq("g"), Seq(col("score").desc), 0).collect()
    }
  }

  test("partial-phase key cap flushes instead of OOMing, results unchanged") {
    val expected = windowed(3)
    // cap far below the 11 distinct keys → many mid-partition flushes
    spark.conf.set("spark.graft.topk.partialMaxKeys", "2")
    try assert(custom(3) == expected)
    finally spark.conf.unset("spark.graft.topk.partialMaxKeys")
  }

  test("partial map is TaskMemoryManager-accounted: reserve, decline, release") {
    // runs INSIDE a task, against the real unified memory manager
    val out = spark.sparkContext.parallelize(Seq(1), 1).mapPartitions { _ =>
      val tmm = org.apache.spark.GraftMemoryBridge
        .taskMemoryManager(org.apache.spark.TaskContext.get())
      val c = new TopKPartialMemoryConsumer(tmm)
      val granted = c.tryReserve(TopKPerKeyExec.ReserveChunk)
      val usedAfterGrant = c.getUsed
      // an absurd reservation is DECLINED (returns false), not an OOM —
      // and a declined acquire must not leak partially granted bytes
      val declined = c.tryReserve(Long.MaxValue / 2)
      val usedAfterDecline = c.getUsed
      c.releaseAll()
      Iterator((granted, usedAfterGrant, declined, usedAfterDecline, c.getUsed))
    }.collect()(0)
    assert(out._1, "a 4 MB chunk should be granted")
    assert(out._2 == TopKPerKeyExec.ReserveChunk)
    assert(!out._3, "an impossible reservation must be declined, not throw")
    assert(out._4 == TopKPerKeyExec.ReserveChunk, "declined acquire leaked bytes")
    assert(out._5 == 0L, "releaseAll must return every accounted byte")
  }

  test("memory-pressure flush: declined reservations degrade to per-row flush, exact") {
    // raise the reservation chunk past anything the pool can grant: the
    // manager declines the partial map's FIRST reservation, so every row
    // flushes straight downstream — the spill degradation path end to
    // end, with results still exact
    val expected = windowed(3)
    spark.conf.set("spark.graft.topk.partialReserveChunk", (1L << 60).toString)
    try assert(custom(3) == expected)
    finally spark.conf.unset("spark.graft.topk.partialReserveChunk")
  }

  test("strategy-free window fallback produces identical rows") {
    val viaFallback = TopK.windowed(data, Seq("g"),
        Seq(col("score").desc, col("id").asc), 3)
      .select("g", "score", "id").as[(String, Double, Long)]
      .collect().toSeq.sorted
    assert(viaFallback == windowed(3))
  }

  test("window fallback rejects a reserved __topk_rn input column") {
    intercept[IllegalArgumentException] {
      TopK.windowed(data.withColumn("__topk_rn", lit(1)), Seq("g"),
        Seq(col("score").desc), 3)
    }
  }

  test("downstream operators compose on top of the custom node") {
    val out = TopK.perKey(data, Seq("g"), Seq(col("score").desc, col("id").asc), 2)
      .groupBy("g").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(out.values.forall(_ == 2L))
    assert(out.size == 11)
  }
}
