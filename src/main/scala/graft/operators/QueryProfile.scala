package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame

/** Per-stage query profile — the Spark analog of the reference
  * engine's query profile UX (Impala exposes per-operator rows/bytes/
  * time for every query; /root/reference/hdfs-parquet-scanner.cc
  * counters feed it). Spark already aggregates the same counters per
  * stage; this surface collects them for ONE query run and returns
  * them as a DataFrame, so a pipeline can assert resource contracts
  * ("this stage must not spill", "input rows == table rows") the way
  * the correctness gate asserts values.
  *
  * Mechanics: the query runs under a unique jobGroup; the listener
  * records only stages belonging to that group's jobs, so concurrent
  * work in a shared session never pollutes the profile. Listener
  * delivery is asynchronous with no public flush hook, so collection
  * polls until every announced stage has completed or the set is
  * quiescent (skipped stages — reused exchanges — never complete) —
  * bounded wait over profile metadata, read only after the action
  * returns.
  */
object QueryProfile {

  /** One completed stage's executor-aggregated counters. */
  case class StageProfile(
      stageId: Int,
      numTasks: Int,
      inputRecords: Long,
      inputBytes: Long,
      outputRecords: Long,
      shuffleReadBytes: Long,
      shuffleReadRecords: Long,
      shuffleWriteBytes: Long,
      shuffleWriteRecords: Long,
      memorySpillBytes: Long,
      diskSpillBytes: Long,
      executorRunTimeMs: Long)

  /** Run `df.count()` and return (rowCount, per-stage profile). The
    * profile DataFrame is a tiny local relation (one row per stage of
    * this query) — driver-side by design, like any metrics readout. */
  def profile(df: DataFrame): (Long, DataFrame) = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    val groupId = "graft-profile-" + java.util.UUID.randomUUID()
    val announced = TrieMap.empty[Int, Unit]
    val completed = TrieMap.empty[Int, StageProfile]
    val listener = new SparkListener {
      override def onJobStart(ev: SparkListenerJobStart): Unit =
        if (groupId == ev.properties.getProperty("spark.jobGroup.id"))
          ev.stageIds.foreach(announced.put(_, ()))
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        if (announced.contains(si.stageId)) {
          val m = si.taskMetrics
          completed(si.stageId) = StageProfile(
            si.stageId, si.numTasks,
            m.inputMetrics.recordsRead, m.inputMetrics.bytesRead,
            m.outputMetrics.recordsWritten,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleReadMetrics.recordsRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.shuffleWriteMetrics.recordsWritten,
            m.memoryBytesSpilled, m.diskBytesSpilled,
            m.executorRunTime)
        }
      }
    }
    sc.addSparkListener(listener)
    try {
      sc.setJobGroup(groupId, "graft query profile", interruptOnCancel = false)
      val n = try df.count() finally sc.clearJobGroup()
      var stable = 0
      var spins = 0
      while (stable < 3 && spins < 100) {
        val before = (announced.size, completed.size)
        Thread.sleep(50)
        spins += 1
        if ((announced.size, completed.size) == before &&
            completed.size >= 1) stable += 1
        else stable = 0
      }
      import spark.implicits._
      (n, completed.values.toSeq.sortBy(_.stageId).toDF())
    } finally sc.removeSparkListener(listener)
  }
}
