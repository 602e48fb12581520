package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** Marker mixed into every driver-collected kernel expression: they all
  * evaluate via `nullSafeEval`/`defineCodeGen` (NULL in → NULL out), so
  * declaring null-intolerance lets the optimizer rewrite
  * `IsNotNull(kernel(x))` — e.g. the join-key constraint
  * InferFiltersFromConstraints adds when a kernel-derived column (an IVF
  * cluster id) becomes an inner-join key — into `IsNotNull(x)`, which
  * pushes into the parquet scan instead of re-running the kernel per
  * corpus row inside a Filter (Filter and Project are separate codegen
  * consumers with no cross-operator CSE, so an un-rewritten constraint
  * doubles the kernel cost of the whole scan — caught by plan audit on
  * `sim_topk_ivf`). */
trait NullIntolerantKernel extends Expression {
  override def nullIntolerant: Boolean = true
}
