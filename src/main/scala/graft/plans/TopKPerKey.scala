package graft.plans

import org.apache.spark.{GraftMemoryBridge, TaskContext}
import org.apache.spark.memory.{MemoryConsumer, MemoryMode, TaskMemoryManager}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Exact top-k rows per key as a WHOLE-OPERATOR Catalyst extension — the
  * (c) tier of the custom-operator ladder (native expression → optimizer
  * rule → logical plan + strategy + physical plan): a `LogicalPlan` node,
  * a planner `SparkStrategy`, and a two-phase `SparkPlan` with
  * BOUNDED-HEAP state, registered through `SparkSessionExtensions` /
  * `experimental.extraStrategies`.
  *
  * Why built-ins don't reach: the window formulation
  * (`row_number().over(partitionBy(key).orderBy(...)) <= k`) SORTS every
  * key's full candidate set (Spark's WindowGroupLimit prunes rows per
  * partition but still sort-based), and `TakeOrderedAndProject` is global
  * top-k, not per-key. This operator keeps a size-k heap per key per
  * partition — O(n log k) with NO sort buffer — and ships exactly
  * `keys × k` rows into the single exchange: the partial phase runs
  * map-side like a partial aggregate, the final phase (same code, keyed
  * distribution) reduces the partials, so the shuffle volume is
  * independent of the candidate fanout. At 100 TB that is the difference
  * between shuffling the scored corpus and shuffling the answer.
  *
  * Memory: partial-phase state is an ON-HEAP map of per-key heaps,
  * ACCOUNTED against the task's unified execution memory through a
  * `MemoryConsumer` ([[TopKPartialMemoryConsumer]]): the map's estimated
  * footprint is reserved from the `TaskMemoryManager` in chunks, so it
  * shows up in Spark's memory arithmetic and competes fairly with the
  * other consumers in the task (shuffle writers, aggregates). Under
  * pressure the partial phase degrades in three tiers:
  *
  *  1. `spark.graft.topk.partialMaxKeys` overflow (default 1,048,576 —
  *     a key-CARDINALITY cap, not memory pressure): flush the map
  *     downstream and restart empty. A near-unique-key input degrades
  *     to shuffling ~input rows, like the window form, instead of
  *     holding a map that can never reduce anything.
  *  2. Declined reservation while holding at least one granted chunk
  *     (real memory pressure against a REAL map): SPILL the map's rows
  *     to a local disk file (the executor's `spark.local.dir` via the
  *     DiskBlockManager), release the memory, keep consuming. At end of
  *     input the spilled runs re-enter the same bounded-heap insert
  *     path, so a hot key still leaves the task as ONE k-row heap —
  *     partial reduction stays effective exactly when it matters
  *     (fanout × hot keys is what created the pressure). Disk volume is
  *     bounded by what was admitted heap-side: ≤ keys × k rows per
  *     spill, never raw input.
  *  3. Declined reservation with not even one chunk granted (the pool
  *     is exhausted and nothing here can free it): flush downstream
  *     per-batch — the partial-aggregate pass-through degradation; the
  *     final phase merges any number of partial heaps per key. Also the
  *     response to declines DURING the end-of-input merge, which
  *     guarantees the merge terminates under sustained pressure.
  *
  * The cooperative `spill(size, trigger)` callback from peer consumers
  * spills the map to disk (tier 2) when it arrives between rows; a
  * request landing mid-insert (our own reserve's acquire path) reports
  * 0 and surfaces as the declined reservation instead. The final
  * phase's map holds exactly its output (keys-in-partition × k rows) —
  * bounded by the shuffle input it just received — and never spills.
  */
case class TopKPerKey(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: LogicalPlan)
  extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Execution-memory accounting for the partial phase's heap map: reserve
  * in chunks, report usage, free on flush/spill/completion. `tryReserve`
  * returns false when the manager cannot grant the FULL chunk — the
  * operator's signal to spill to disk or flush downstream. */
private[plans] class TopKPartialMemoryConsumer(tmm: TaskMemoryManager)
    extends MemoryConsumer(tmm, MemoryMode.ON_HEAP) {

  /** Set by the owning iterator once its spill machinery exists: returns
    * bytes freed (a disk spill of the heap map), or 0 when the map is
    * mid-mutation or empty. */
  private var spillCallback: () => Long = () => 0L
  def setSpillCallback(cb: () => Long): Unit = spillCallback = cb

  /** Cooperative-spill request from a peer consumer. Usually lands on the
    * task thread between rows (the callback safely writes the map to disk
    * and frees its reservation) or inside our own reserve's acquire path
    * (`trigger eq this` — the map is mid-mutation; report 0 and let the
    * pressure surface as the declined reservation instead). It can ALSO
    * arrive from a helper thread the task spawned (Spark allows any
    * thread to acquire execution memory for the task), so the callback
    * itself takes the iterator's state lock with `tryLock` — contended
    * means the map is mid-mutation on another thread: report 0 rather
    * than corrupt the heap map or double-release the reservation. */
  override def spill(size: Long, trigger: MemoryConsumer): Long =
    if (trigger eq this) 0L else spillCallback()

  def tryReserve(bytes: Long): Boolean = {
    val got = acquireMemory(bytes)
    if (got < bytes) { freeMemory(got); false } else true
  }

  def releaseAll(): Unit = freeMemory(getUsed)
}

/** Two-phase physical operator: `partial = true` runs on whatever
  * distribution the child has (map-side); `partial = false` requires
  * `ClusteredDistribution(keys)` — EnsureRequirements inserts the single
  * hash exchange between the phases. Rows retained per (partition, key)
  * form the TOP k under `order` (heap head = worst retained; a new row
  * replaces it only when it ranks strictly better). */
case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    partial: Boolean, child: SparkPlan)
  extends UnaryExecNode {

  // Observability: tier-2 disk spills and downstream flushes (tiers 1/3)
  // surface in the Spark UI / SQL metrics like the built-in operators'.
  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] =
    if (partial) Map(
      "numSpills" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "partial disk spills"),
      "numFlushes" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "partial downstream flushes"))
    else Map.empty

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    // Partial-phase key cap: flush-and-clear on overflow keeps memory
    // bounded; the final phase must NOT flush mid-key (a key's rows would
    // split into two surviving heaps → up to 2k rows out), and its map is
    // output-sized anyway, so the cap applies to the partial phase only.
    val maxKeys =
      if (partial) conf.getConfString("spark.graft.topk.partialMaxKeys", "1048576").toInt
      else Int.MaxValue
    require(maxKeys > 0, s"spark.graft.topk.partialMaxKeys must be positive, got $maxKeys")
    // Reservation granularity against the TaskMemoryManager (specs raise
    // it past the pool size to force the decline→flush degradation path
    // deterministically).
    val reserveChunk = conf.getConfString(
      "spark.graft.topk.partialReserveChunk", TopKPerKeyExec.ReserveChunk.toString).toLong
    require(reserveChunk > 0, s"spark.graft.topk.partialReserveChunk must be positive, got $reserveChunk")
    val isPartial = partial
    val spillMetric = metrics.get("numSpills").orNull
    val flushMetric = metrics.get("numFlushes").orNull
    child.execute().mapPartitions { iter =>
      // Partial phase only: account the map's estimated bytes against the
      // task's execution memory pool (final-phase state is output-sized).
      val taskCtx = TaskContext.get()
      val consumer =
        if (isPartial && taskCtx != null)
          new TopKPartialMemoryConsumer(GraftMemoryBridge.taskMemoryManager(taskCtx))
        else null
      TopKPerKeyExec.process(iter, keyExprs, sortOrder, childOutput,
        kLocal, maxKeys, reserveChunk, consumer,
        cleanup =>
          if (taskCtx != null) taskCtx.addTaskCompletionListener[Unit](_ => cleanup()),
        spillMetric, flushMetric)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"
}

object TopKPerKeyExec {
  /** Granularity of TaskMemoryManager reservations. */
  private[plans] val ReserveChunk = 4L << 20
  /** Per-retained-row overhead beyond its UnsafeRow bytes (PQ node +
    * object headers), and the fallback when a row is not an UnsafeRow. */
  private[plans] val RowOverhead = 48L
  private[plans] val FallbackRowBytes = 256L
  /** Per-distinct-key overhead (HashMap entry, PriorityQueue, key copy
    * header). */
  private[plans] val KeyOverhead = 96L

  /** The per-partition state machine of one exec phase — package-private
    * and consumer-injectable so TopKPerKeySpec can drive the tier-2
    * disk-spill path deterministically inside a real task (pre-draining
    * the task's memory pool with a hog consumer, which the planner-level
    * tests cannot arrange). `registerCleanup` hooks end-of-task disposal
    * (reservation release + leaked spill files). */
  private[plans] def process(
      iter: Iterator[InternalRow],
      keyExprs: Seq[Expression],
      sortOrder: Seq[SortOrder],
      childOutput: Seq[Attribute],
      kLocal: Int, maxKeys: Int, reserveChunk: Long,
      consumer: TopKPartialMemoryConsumer,
      registerCleanup: (() => Unit) => Unit,
      spillMetric: org.apache.spark.sql.execution.metric.SQLMetric = null,
      flushMetric: org.apache.spark.sql.execution.metric.SQLMetric = null)
      : Iterator[InternalRow] = {
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val ordering = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // worst-retained-at-head heaps, keyed by the projected key bytes
      var heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      import scala.jdk.CollectionConverters._

      // Guards every mutation of `heaps`/`estBytes`/the reservation against
      // the cooperative spill callback, which may arrive from a HELPER
      // thread of the same task (e.g. an Arrow/Python writer acquiring
      // execution memory) — Spark's own spillable consumers synchronize
      // spill() for the same reason. The task thread takes it around each
      // insert/spill/drain; the callback only ever `tryLock`s, so a
      // contended request reports 0 freed and can never deadlock against
      // the TaskMemoryManager's own monitor.
      val stateLock = new java.util.concurrent.locks.ReentrantLock()
      val spillFiles = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
      // Spill files being read back during the merge: close their streams
      // on task completion even if the output iterator is abandoned early
      // (downstream limit, task kill) — otherwise the descriptor leaks
      // until process exit and the delete below can fail on an open handle.
      val openSpillStreams = new java.util.concurrent.ConcurrentLinkedQueue[java.io.Closeable]()
      // Set under stateLock by the cleanup below; read under the same lock
      // by the cooperative-spill callback. Once true, the callback must not
      // write a NEW spill file — teardown's delete loop has already run, so
      // a late helper-thread spill would leak the file until process exit.
      var closed = false
      registerCleanup { () =>
        // Plain lock (not tryLock) is fine here: the task is ending, and
        // the only contenders are per-row insert()s or a spill callback,
        // both of which hold the lock briefly. Holding it across disposal
        // makes teardown atomic with any racing spill: either the spill
        // lands first and its file is deleted below, or `closed` lands
        // first and the callback declines.
        stateLock.lock()
        try {
          closed = true
          if (consumer != null) consumer.releaseAll()
          var s = openSpillStreams.poll()
          while (s != null) {
            try s.close() catch { case _: java.io.IOException => () }
            s = openSpillStreams.poll()
          }
          spillFiles.foreach(f => if (f.exists()) f.delete())
        } finally stateLock.unlock()
      }
      var estBytes = 0L
      // true = capacity granted; false = the manager declined. Reservations
      // go to the TaskMemoryManager one chunk at a time, so the
      // synchronized acquire path is hit once per ~4 MB of state, not once
      // per row.
      def reserve(delta: Long): Boolean = {
        estBytes += delta
        consumer == null || {
          var ok = true
          while (ok && estBytes > consumer.getUsed)
            ok = consumer.tryReserve(reserveChunk)
          ok
        }
      }
      def entryBytes(r: InternalRow): Long = r match {
        case u: UnsafeRow => u.getSizeInBytes.toLong + TopKPerKeyExec.RowOverhead
        case _            => TopKPerKeyExec.FallbackRowBytes
      }

      def resetMap(): Unit = {
        heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        estBytes = 0L
        if (consumer != null) consumer.releaseAll()
      }

      def drain(): Iterator[InternalRow] = {
        stateLock.lock()
        try drainLocked()
        finally stateLock.unlock()
      }
      def drainLocked(): Iterator[InternalRow] = {
        val out = heaps
        resetMap()
        out.values().iterator().asScala.flatMap(_.iterator().asScala)
      }
      // tier-1/3 downstream flushes (drains before end-of-state are the
      // degradation signal; the final drain of a healthy run is not)
      def drainFlush(): Iterator[InternalRow] = {
        if (flushMetric != null) flushMetric.add(1)
        drain()
      }
      def drainFlushLocked(): Iterator[InternalRow] = {
        if (flushMetric != null) flushMetric.add(1)
        drainLocked()
      }

      // Tier-2 spill: write the retained rows (≤ keys × k — never raw
      // input) to a local file in the executor's spill dirs and release
      // the map's reservation. Merge happens at end of input.
      val writeBuffer = new Array[Byte](4096)
      def spillToDisk(): Unit = {
        stateLock.lock()
        try spillToDiskLocked()
        finally stateLock.unlock()
      }
      def spillToDiskLocked(): Unit = {
        if (!heaps.isEmpty) {
          val file = GraftMemoryBridge.createSpillFile()
          val out = new java.io.DataOutputStream(
            new java.io.BufferedOutputStream(new java.io.FileOutputStream(file), 1 << 16))
          try {
            val hs = heaps.values().iterator()
            while (hs.hasNext) {
              val rows = hs.next().iterator()
              while (rows.hasNext) {
                val u = rows.next() match {
                  case u: UnsafeRow => u
                  case other        => toUnsafe(other)
                }
                out.writeInt(u.getSizeInBytes)
                u.writeToStream(out, writeBuffer)
              }
            }
          } finally out.close()
          spillFiles += file
          if (spillMetric != null) spillMetric.add(1)
          resetMap()
        }
      }

      def readSpill(file: java.io.File): Iterator[InternalRow] = new Iterator[InternalRow] {
        private val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(new java.io.FileInputStream(file), 1 << 16))
        openSpillStreams.add(in)
        private var nextLen = readLen()
        private def readLen(): Int =
          try in.readInt()
          catch {
            case _: java.io.EOFException =>
              openSpillStreams.remove(in); in.close(); file.delete(); -1
          }
        override def hasNext: Boolean = nextLen >= 0
        override def next(): InternalRow = {
          val bytes = new Array[Byte](nextLen)
          in.readFully(bytes)
          val row = new UnsafeRow(childOutput.length)
          row.pointTo(bytes, nextLen)
          nextLen = readLen()
          row
        }
      }

      // 0 = admitted; 1 = key-cardinality cap overflow; 2 = memory declined
      def insert(row: InternalRow): Int = {
        stateLock.lock()
        try insertLocked(row)
        finally stateLock.unlock()
      }
      def insertLocked(row: InternalRow): Int = {
        val key = keyProj(row)
        var heap = heaps.get(key)
        var delta = 0L
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, ordering.reverse)
          heaps.put(key.copy(), heap)
          delta += key.getSizeInBytes.toLong + TopKPerKeyExec.KeyOverhead
        }
        if (heap.size() < kLocal) {
          heap.offer(row.copy())
          delta += entryBytes(row)
        } else if (ordering.compare(row, heap.peek()) < 0) {
          val evicted = heap.poll()
          heap.offer(row.copy())
          delta += entryBytes(row) - entryBytes(evicted)
        }
        val fits = reserve(delta)
        if (heaps.size() > maxKeys) 1 else if (!fits) 2 else 0
      }

      new Iterator[InternalRow] {
        private var cur: Iterator[InternalRow] = Iterator.empty
        private var inputDone = false
        @volatile private var inMerge = false
        private var spillQueue: Iterator[InternalRow] = Iterator.empty
        private var allDone = false

        // Peer pressure between rows: during input consumption the map is
        // consistent here, so a disk spill is safe and frees real bytes.
        // During the merge it reports 0 (re-spilling mid-merge could
        // cycle); pressure then lands as declined reservations → tier-3
        // downstream flushes, which terminate. The request may arrive from
        // a helper thread of the task, so it only `tryLock`s the state
        // lock — a contended lock means insert()/spill/drain is mid-flight
        // elsewhere: report 0 freed instead of touching the map.
        if (consumer != null) consumer.setSpillCallback { () =>
          if (!stateLock.tryLock()) 0L
          else try {
            if (closed || inMerge || heaps.isEmpty) 0L
            else { val freed = consumer.getUsed; spillToDiskLocked(); freed }
          } finally stateLock.unlock()
        }

        // Lock granularity is the operator's liveness/atomicity balance:
        //
        //  - INPUT consumption runs UNLOCKED between rows — insert() takes
        //    the state lock per row, so a helper-thread cooperative spill
        //    can win the lock between any two rows and free the map's
        //    multi-MB reservation (holding the lock across the whole input
        //    loop would starve every peer consumer for the entire input
        //    phase and report 0 freed when memory is tightest). A helper
        //    spill landing between an insert verdict and the response
        //    below only empties the map into a spill file: drainFlush()
        //    then drains empty (no row loss — the rows are on disk) and
        //    the phase decision below is guaranteed to see the file.
        //  - PHASE decisions are ATOMIC with the drain they pick: the
        //    spillFiles check, merge setup, and terminal drain share one
        //    lock hold, so a helper-thread spill can no longer land
        //    between the `spillFiles.nonEmpty` check and drain() and
        //    write retained rows to a file the merge never reads. Holding
        //    the lock across the whole merge loop starves nobody: the
        //    callback already reports 0 during the merge (inMerge), and
        //    the locked loop uses the *Locked variants rather than paying
        //    a reentrant re-acquisition per spilled row.
        override def hasNext: Boolean = {
          while (!cur.hasNext && !allDone) {
            if (!inputDone) {
              var flushed = false
              while (iter.hasNext && !flushed) {
                insert(iter.next()) match {
                  case 0 => ()
                  case 1 => cur = drainFlush(); flushed = true // tier 1: key cap
                  case 2 =>
                    if (consumer != null && consumer.getUsed > 0) spillToDisk() // tier 2
                    else { cur = drainFlush(); flushed = true }                 // tier 3
                }
              }
              if (!iter.hasNext) inputDone = true
            } else {
              stateLock.lock()
              try {
                if (spillFiles.nonEmpty && !inMerge) {
                  inMerge = true
                  spillQueue = spillFiles.toSeq.iterator.flatMap(readSpill)
                } else if (inMerge && spillQueue.hasNext) {
                  var flushed = false
                  while (spillQueue.hasNext && !flushed) {
                    insertLocked(spillQueue.next()) match {
                      case 0 => ()
                      case _ => cur = drainFlushLocked(); flushed = true // sustained pressure
                    }
                  }
                  if (!spillQueue.hasNext && !flushed) { cur = drainLocked(); allDone = true }
                } else { cur = drainLocked(); allDone = true }
              } finally stateLock.unlock()
            }
          }
          cur.hasNext
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          cur.next()
        }
      }
  }
}

/** Planner rule: logical [[TopKPerKey]] → partial exec under final exec;
  * EnsureRequirements provides the one exchange in between. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}
