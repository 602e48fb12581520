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
  * Memory: partial-phase state is `(keys in partition) × k` retained rows
  * in an ON-HEAP map with NO spill path (unlike Spark's hash aggregate,
  * which falls back to sort-based spilling under pressure). The operator
  * is built for the keys ≪ rows regime (per-query ANN ranking, per-group
  * leaderboards); for near-unique keys, `k × keys ≈ input` and the window
  * formulation's spillable sort is the right tool. Producing a spillable
  * variant means a `TaskMemoryManager`-accounted map — noted as the
  * upgrade path, not done here.
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
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // worst-retained-at-head heaps, keyed by the projected key bytes
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
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
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
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
