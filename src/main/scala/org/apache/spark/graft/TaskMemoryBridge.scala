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
}
