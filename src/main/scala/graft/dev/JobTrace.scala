package graft.dev
// scratch profiling main — not part of the library surface.
// Runs a query once warm then once traced, printing every Spark job's
// wall duration and first-stage name so iterative operators' job
// budgets decompose.
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

object JobTrace {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val name = j.stageInfos.headOption.map(_.name).getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), name)); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.remove(j.jobId)
        if (s != null) {
          val ms = (System.nanoTime() - s._1) / 1e6
          lines.add(f"[job] ${j.jobId}%4d ${ms}%8.1f ms  ${s._2.take(110)}")
        }
        ()
      }
    }
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
      Thread.sleep(300)
      lines.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      println(f"[jobtrace] $name wall=$wall%.2f s, jobs:")
      lines.forEach(l => println(l))
    }
    spark.stop()
  }
}
