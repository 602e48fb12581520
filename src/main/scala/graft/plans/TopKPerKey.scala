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
  * shows up in Spark's memory arithmetic, competes fairly with the other
  * consumers in the task (shuffle writers, aggregates), and — when the
  * manager declines a reservation — the partial phase "spills" by
  * FLUSHING its whole map downstream and starting empty. Emitting
  * partial heaps downstream is the correct spill strategy for a partial
  * operator (the final phase merges any number of partial heaps per
  * key — exactly Spark's partial-aggregate pass-through degradation):
  * it needs no disk, and a near-unique-key input degrades to shuffling
  * ~input rows like the window formulation would, instead of OOMing the
  * executor. `spark.graft.topk.partialMaxKeys` (default 1,048,576)
  * remains as a hard secondary cap on distinct keys. The cooperative
  * `spill(size, trigger)` callback reports 0 — the heap map cannot be
  * shrunk safely mid-iteration from another consumer's acquire path —
  * so pressure from peers surfaces as a declined NEXT reservation, i.e.
  * a flush at the next row boundary. The final phase's map holds
  * exactly its output (keys-in-partition × k rows) — bounded by the
  * shuffle input it just received.
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
  * in chunks, report usage, free on flush/completion. `tryReserve`
  * returns false when the manager cannot grant the FULL chunk — the
  * operator's signal to flush downstream (its spill). */
private[plans] class TopKPartialMemoryConsumer(tmm: TaskMemoryManager)
    extends MemoryConsumer(tmm, MemoryMode.ON_HEAP) {

  /** Cooperative-spill request from a peer consumer: the on-heap map
    * cannot be emitted downstream from inside someone else's acquire
    * call (it would corrupt the producing iterator mid-row), so nothing
    * frees here; the pressure lands as this consumer's next declined
    * reservation instead. */
  override def spill(size: Long, trigger: MemoryConsumer): Long = 0L

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
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // worst-retained-at-head heaps, keyed by the projected key bytes
      var heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      import scala.jdk.CollectionConverters._

      // Partial phase only: account the map's estimated bytes against the
      // task's execution memory pool (final-phase state is output-sized).
      val taskCtx = TaskContext.get()
      val consumer =
        if (isPartial && taskCtx != null)
          new TopKPartialMemoryConsumer(GraftMemoryBridge.taskMemoryManager(taskCtx))
        else null
      if (consumer != null) {
        taskCtx.addTaskCompletionListener[Unit](_ => consumer.releaseAll())
      }
      var estBytes = 0L
      // true = capacity granted; false = the manager declined → flush now.
      // Reservations go to the TaskMemoryManager one chunk at a time, so
      // the synchronized acquire path is hit once per ~4 MB of state, not
      // once per row.
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

      def drain(): Iterator[InternalRow] = {
        val out = heaps
        heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        estBytes = 0L
        if (consumer != null) consumer.releaseAll()
        out.values().iterator().asScala.flatMap(_.iterator().asScala)
      }

      new Iterator[InternalRow] {
        private var cur: Iterator[InternalRow] = Iterator.empty
        private var drainedFinal = false

        override def hasNext: Boolean = {
          while (!cur.hasNext && !drainedFinal) {
            if (!iter.hasNext) { cur = drain(); drainedFinal = true }
            else {
              var flushed = false
              while (iter.hasNext && !flushed) {
                val row = iter.next()
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
                if (heaps.size() > maxKeys || !fits) { cur = drain(); flushed = true }
              }
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
