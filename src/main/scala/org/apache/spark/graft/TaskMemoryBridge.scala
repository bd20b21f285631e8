package org.apache.spark.graft

import org.apache.spark.TaskContext
import org.apache.spark.memory.TaskMemoryManager

/** Accessor for the task's memory manager, which is private[spark].
  *
  * Lives in the org.apache.spark package for the same reason
  * GraftFunctions lives in org.apache.spark.sql: graft's custom
  * physical operators (TopKPerKeyExec) participate in executor
  * memory arbitration exactly like Spark's own SortExec — acquiring
  * their heap bytes from TaskMemoryManager and spilling when asked —
  * and the manager handle is only reachable from inside the spark
  * package. This is the entire surface: one getter, no state. */
object TaskMemoryBridge {
  def memoryManager(ctx: TaskContext): TaskMemoryManager =
    ctx.taskMemoryManager()

  /** A spill file allocated the way SortExec's spills are: through
    * the executor's DiskBlockManager, which places it under the
    * configured spark.local.dir roots (striped across disks) instead
    * of java.io.tmpdir. Falls back to a plain temp file when no
    * SparkEnv exists (driver-side unit contexts). Callers own
    * deletion — task-completion listeners, not deleteOnExit, so
    * long-lived executors don't accumulate shutdown-hook entries. */
  def createTempSpillFile(): java.io.File = {
    val env = org.apache.spark.SparkEnv.get
    if (env != null) env.blockManager.diskBlockManager.createTempLocalBlock()._2
    else java.io.File.createTempFile("graft_topk_spill_", ".run")
  }
}
