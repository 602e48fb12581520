package org.apache.spark

import org.apache.spark.memory.TaskMemoryManager

/** The two `private[spark]` core touch points graft's physical operator
  * needs: the running task's `TaskMemoryManager`, so operator state can be
  * ACCOUNTED against Spark's unified execution memory instead of growing
  * as dark on-heap usage, and the executor's `DiskBlockManager`, so
  * operator spill files land in the executor's configured local dirs
  * (`spark.local.dir` — striped across disks, cleaned on executor exit)
  * the way Spark's own spilling consumers place theirs (cf.
  * `org.apache.spark.sql.GraftSqlBridge` for the sql-side equivalents). */
object GraftMemoryBridge {
  def taskMemoryManager(ctx: TaskContext): TaskMemoryManager =
    ctx.taskMemoryManager()

  /** Drain the listener bus so SparkListener-accumulated metrics (e.g.
    * SpillProof's spill counters) reflect every completed task. */
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()

  /** A temp file for operator spill output, in the executor's local dirs
    * when an executor environment exists (the production path), in
    * `java.io.tmpdir` otherwise (bare unit-test harnesses). The caller
    * owns deletion; the block manager's shutdown hook sweeps leaks. */
  def createSpillFile(): java.io.File = {
    val env = SparkEnv.get
    if (env != null && env.blockManager != null)
      env.blockManager.diskBlockManager.createTempLocalBlock()._2
    else java.io.File.createTempFile("graft-topk", ".spill")
  }
}
