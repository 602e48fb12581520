package graft.plans

import graft.SparkSpec
import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-task memory hog for the tier-2 spill tests — top-level so the task
  * closure does not capture the spec instance. Never spills itself. */
private class PoolHog(tmm: org.apache.spark.memory.TaskMemoryManager)
    extends org.apache.spark.memory.MemoryConsumer(
      tmm, org.apache.spark.memory.MemoryMode.ON_HEAP) {
  override def spill(size: Long, trigger: org.apache.spark.memory.MemoryConsumer): Long = 0L
  def grab(): Long = acquireMemory(1L << 42)
  def give(bytes: Long): Unit = freeMemory(math.min(bytes, getUsed))
}

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

  test("SQL metrics: healthy runs report zero flushes; forced pressure counts them") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // AQE query stages do not expose their subplan as a child, so a plain
    // collect never sees the partial node below the exchange — walk them
    def all(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => all(a.executedPlan)
      case q: QueryStageExec        => q +: all(q.plan)
      case other                    => other +: other.children.flatMap(all)
    }
    def metricValue(df: org.apache.spark.sql.DataFrame, name: String): Long =
      all(df.queryExecution.executedPlan).collect {
        case t: TopKPerKeyExec if t.partial =>
          t.metrics.get(name).map(_.value).getOrElse(0L)
      }.sum
    val healthy = TopK.perKey(data, Seq("g"), Seq(col("score").desc, col("id").asc), 3)
    healthy.collect()
    assert(metricValue(healthy, "numSpills") == 0L)
    assert(metricValue(healthy, "numFlushes") == 0L)
    spark.conf.set("spark.graft.topk.partialReserveChunk", (1L << 60).toString)
    try {
      val forced = TopK.perKey(data, Seq("g"), Seq(col("score").desc, col("id").asc), 3)
      forced.collect()
      assert(metricValue(forced, "numFlushes") > 0L,
        "forced declines must be visible in the flush metric")
    } finally spark.conf.unset("spark.graft.topk.partialReserveChunk")
  }

  test("cooperative spill dispatch: peer trigger runs the callback, self trigger reports 0") {
    val out = spark.sparkContext.parallelize(Seq(1), 1).mapPartitions { _ =>
      val tmm = org.apache.spark.GraftMemoryBridge
        .taskMemoryManager(org.apache.spark.TaskContext.get())
      val c = new TopKPartialMemoryConsumer(tmm)
      val peer = new TopKPartialMemoryConsumer(tmm)
      var ran = 0
      c.setSpillCallback { () => ran += 1; 42L }
      val selfResult = c.spill(100L, c)    // mid-reserve: must not touch the map
      val peerResult = c.spill(100L, peer) // between rows: spill is safe
      Iterator((selfResult, peerResult, ran))
    }.collect()(0)
    assert(out._1 == 0L, "self-triggered spill must report 0 (map is mid-mutation)")
    assert(out._2 == 42L, "peer-triggered spill must run the callback")
    assert(out._3 == 1)
  }

  test("tier-2 disk spill: peer pressure mid-input spills hot-key heaps, merge emits exactly k") {
    // Drives TopKPerKeyExec.process inside a real task: a hog consumer
    // drains the pool mid-input (the cooperative-spill trigger), the
    // operator spills its heaps to disk and keeps reducing, and the
    // end-of-input merge still ships exactly keys x k rows — the whole
    // point of spilling over flushing for hot keys. Runs in-task because
    // only there can a peer consumer share the TaskMemoryManager.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Descending, SortOrder, UnsafeProjection}
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val nRows = 3000
    val nKeys = 5
    val k = 3
    // expected exact top-3 values per key (value desc, unique values)
    val expected = (0 until nRows).map(i => (i % nKeys, (i * 2654435761L) % 999983L))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.reverse.take(k).toSet).toMap
    val out = spark.sparkContext.parallelize(Seq(1), 1).mapPartitions { _ =>
      val tmm = org.apache.spark.GraftMemoryBridge
        .taskMemoryManager(org.apache.spark.TaskContext.get())
      val consumer = new TopKPartialMemoryConsumer(tmm)
      val hog = new PoolHog(tmm)
      val keyAttr = AttributeReference("g", IntegerType, nullable = false)()
      val valAttr = AttributeReference("v", LongType, nullable = false)()
      val output = Seq(keyAttr, valAttr)
      val toUnsafe = UnsafeProjection.create(output, output)
      var spilledByPeer = false
      val rows: Iterator[InternalRow] = (0 until nRows).iterator.map { i =>
        if (i == nRows / 2) {
          // mid-input peer pressure: the hog's acquire makes the manager
          // ask our consumer to spill; afterwards free headroom so the
          // operator can rebuild (tier 2, not the tier-3 flush path)
          val grabbed = hog.grab()
          spilledByPeer = consumer.getUsed == 0
          hog.give(math.min(grabbed, 64L * 1024))
        }
        toUnsafe(InternalRow(i % nKeys, (i * 2654435761L) % 999983L)).copy()
      }
      val cleanups = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
      val result = TopKPerKeyExec.process(rows,
          Seq(keyAttr), Seq(SortOrder(valAttr, Descending)), output,
          k, Int.MaxValue, 8L * 1024, consumer, cb => cleanups += cb)
        .map(r => (r.getInt(0), r.getLong(1))).toVector
      cleanups.foreach(_.apply())
      val usedAfter = consumer.getUsed
      hog.give(Long.MaxValue)
      Iterator((result, spilledByPeer, usedAfter))
    }.collect()(0)
    val (result, spilledByPeer, usedAfter) = out
    assert(spilledByPeer, "the peer's acquire must have spilled the heap map to disk")
    assert(usedAfter == 0L, "cleanup must release every accounted byte")
    assert(result.size == nKeys * k,
      s"spill+merge must emit exactly keys x k rows, got ${result.size}")
    assert(result.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap == expected,
      "merged output must be the exact top-k per key")
  }

  test("tier-2 via declined reservation: many-key state spills and re-reduces exactly") {
    // The insert-path decline (getUsed > 0) tier: a hog leaves only a
    // sliver of pool, thousands of distinct keys overflow it repeatedly,
    // so the map spills to disk many times mid-input and the merge runs
    // under the same pressure (its declines flush downstream — by
    // design, the final phase re-merges). Keys arrive adjacently, so
    // almost every key reduces fully in-map; only a key straddling a
    // spill boundary may emit a second partial heap (the row that
    // trips the decline is already admitted, its siblings start the
    // next window). Assert near-total reduction and exact re-merge.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Descending, SortOrder, UnsafeProjection}
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val nRows = 6000
    val nKeys = 2000
    val k = 1
    val expected = (0 until nRows).map(i => (i / 3, (i * 2654435761L) % 999983L))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val out = spark.sparkContext.parallelize(Seq(1), 1).mapPartitions { _ =>
      val tmm = org.apache.spark.GraftMemoryBridge
        .taskMemoryManager(org.apache.spark.TaskContext.get())
      val consumer = new TopKPartialMemoryConsumer(tmm)
      val hog = new PoolHog(tmm)
      val grabbed = hog.grab()
      hog.give(math.min(grabbed, 48L * 1024)) // leave ~6 chunks of 8 KB
      val keyAttr = AttributeReference("g", IntegerType, nullable = false)()
      val valAttr = AttributeReference("v", LongType, nullable = false)()
      val output = Seq(keyAttr, valAttr)
      val toUnsafe = UnsafeProjection.create(output, output)
      val rows: Iterator[InternalRow] = (0 until nRows).iterator.map { i =>
        toUnsafe(InternalRow(i / 3, (i * 2654435761L) % 999983L)).copy()
      }
      val cleanups = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
      val result = TopKPerKeyExec.process(rows,
          Seq(keyAttr), Seq(SortOrder(valAttr, Descending)), output,
          k, Int.MaxValue, 8L * 1024, consumer, cb => cleanups += cb)
        .map(r => (r.getInt(0), r.getLong(1))).toVector
      cleanups.foreach(_.apply())
      hog.give(Long.MaxValue)
      Iterator(result)
    }.collect()(0)
    assert(out.map(_._1).distinct.size == nKeys, "every key must survive the spill/merge cycle")
    assert(out.size < nKeys + 64,
      s"only spill-boundary keys may duplicate (one per spill), got ${out.size} rows for $nKeys keys")
    val reduced = out.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(reduced == expected, "re-reduced output must be the exact per-key max")
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
