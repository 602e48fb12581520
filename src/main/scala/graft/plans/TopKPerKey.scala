package graft.plans

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
  * BOUNDED at `spark.graft.topk.partialMaxKeys` distinct keys (default
  * 1,048,576). On overflow the partial phase FLUSHES its whole map
  * downstream and starts empty — correct because the final phase merges
  * any number of partial heaps per key (exactly Spark's partial-aggregate
  * pass-through degradation): a near-unique-key input degrades to
  * shuffling ~input rows like the window formulation would, instead of
  * OOMing the executor. The final phase's map holds exactly its output
  * (keys-in-partition × k rows) — bounded by the shuffle input it just
  * received. A `TaskMemoryManager`-accounted spillable map remains the
  * listed upgrade for workloads that want large partial maps under
  * memory pressure rather than early flushes.
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
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // worst-retained-at-head heaps, keyed by the projected key bytes
      var heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      import scala.jdk.CollectionConverters._

      def drain(): Iterator[InternalRow] = {
        val out = heaps
        heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
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
                if (heap == null) {
                  heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, ordering.reverse)
                  heaps.put(key.copy(), heap)
                }
                if (heap.size() < kLocal) heap.offer(row.copy())
                else if (ordering.compare(row, heap.peek()) < 0) {
                  heap.poll(); heap.offer(row.copy())
                }
                if (heaps.size() > maxKeys) { cur = drain(); flushed = true }
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
