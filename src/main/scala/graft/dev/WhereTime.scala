package graft.dev
// scratch profiling main — not part of the library surface.
// For each named query: run once warm, then measure a steady run with
// (a) driver-side construction+planning time, (b) Spark job/stage/task
// accounting from a listener, so the floor decomposes into
// driver/scheduler overhead vs actual task work.
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

object WhereTime {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val nJobs = new AtomicInteger(0)
    val nStages = new AtomicInteger(0)
    val nTasks = new AtomicInteger(0)
    val taskRunNs = new AtomicLong(0)      // sum of executorRunTime
    val taskDeserNs = new AtomicLong(0)
    val taskResultNs = new AtomicLong(0)
    val taskGcNs = new AtomicLong(0)
    val jobWallNs = new AtomicLong(0)
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        nJobs.incrementAndGet(); jobStarts.put(j.jobId, System.nanoTime()); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = jobStarts.remove(j.jobId)
        if (s != 0L) jobWallNs.addAndGet(System.nanoTime() - s); ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        nStages.incrementAndGet(); ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        nTasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskRunNs.addAndGet(m.executorRunTime * 1000000L)
          taskDeserNs.addAndGet(m.executorDeserializeTime * 1000000L)
          taskResultNs.addAndGet(m.resultSerializationTime * 1000000L)
          taskGcNs.addAndGet(m.jvmGCTime * 1000000L)
        }
        ()
      }
    }

    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm run (codegen, staging)
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      Thread.sleep(300) // settle listener queue
      Seq(nJobs, nStages, nTasks).foreach(_.set(0))
      Seq(taskRunNs, taskDeserNs, taskResultNs, taskGcNs, jobWallNs).foreach(_.set(0))
      spark.sparkContext.addSparkListener(listener)

      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val tBuilt = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val tPlanned = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val tDone = System.nanoTime()
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)

      def s(ns: Long): Double = ns / 1e9
      val wall = s(tDone - t0)
      println(f"[wt] $name%-28s wall=$wall%6.3f build=${s(tBuilt - t0)}%6.3f " +
        f"plan=${s(tPlanned - tBuilt)}%6.3f exec=${s(tDone - tPlanned)}%6.3f")
      println(f"[wt]   jobs=${nJobs.get}%3d stages=${nStages.get}%3d tasks=${nTasks.get}%5d " +
        f"jobWallSum=${s(jobWallNs.get)}%6.3f taskRunSum=${s(taskRunNs.get)}%7.3f " +
        f"deser=${s(taskDeserNs.get)}%5.3f gc=${s(taskGcNs.get)}%5.3f")
      val cores = cpus.toDouble
      println(f"[wt]   run/cores=${s(taskRunNs.get) / cores}%6.3f  " +
        f"(perfect-parallel task time; wall minus this ~= overhead+stragglers)")
    }
    spark.stop()
  }
}
