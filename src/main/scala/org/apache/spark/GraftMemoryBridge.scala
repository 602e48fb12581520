package org.apache.spark

import org.apache.spark.memory.TaskMemoryManager

/** The one `private[spark]` core touch point graft's physical operator
  * needs: the running task's `TaskMemoryManager`, so operator state can be
  * ACCOUNTED against Spark's unified execution memory instead of growing
  * as dark on-heap usage (cf. `org.apache.spark.sql.GraftSqlBridge` for
  * the sql-side equivalents). */
object GraftMemoryBridge {
  def taskMemoryManager(ctx: TaskContext): TaskMemoryManager =
    ctx.taskMemoryManager()
}
