package graft.dev

import org.apache.spark.sql.SparkSession

/** dev-only: where does the bounded streaming replay time go —
  * measure the oracle-gated streaming queries under different
  * state-partition counts (state store instances per stateful op
  * scale with spark.sql.shuffle.partitions). */
object StreamCostProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (parts <- Seq("32", "8")) {
      val spark = SparkSession.builder().master("local[32]")
        .appName(s"graft-streamcost-$parts")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      for (name <- Seq("stream_interval_join", "stream_tumbling_append", "stream_session_append")) {
        val fn = graft.SparkEntry.queries(name)
        def run(): Double = {
          val t0 = System.nanoTime()
          fn(spark, sf).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        run()
        val steady = math.min(run(), run())
        println(f"[probe] parts=$parts $name steady=$steady%.2f s")
      }
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
  }
}
