package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** dev-only: inspect the multi-file late replay — batch splits, input
  * rows per batch, watermark progression, dropped-rows accounting. */
object LateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val d = graft.queries.SourcesSinks.tmp(spark, dir, "events_probe3")
    graft.queries.SourcesSinks.deleteRecursively(new java.io.File(d))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
    val ev = spark.read.parquet(s"$dir/events.parquet")
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmpDir = s"$d/__tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmpDir)
      val part = new java.io.File(tmpDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(d, s"$name.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.setLastModified(mtime): Unit
      graft.queries.SourcesSinks.deleteRecursively(new java.io.File(tmpDir))
    }
    val t0 = 1600000000000L
    writeOne(ev.filter(col("event_id") % 20 > 1), "a_ontime", t0)
    writeOne(ev.filter(col("event_id") % 20 === 1), "c_tick", t0 + 60000)
    writeOne(ev.filter(col("event_id") % 20 === 0), "b_late", t0 + 120000)
    val phys = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(phys)
      .option("maxFilesPerTrigger", "1").parquet(d)
      .withColumn("ts", graft.sources.Tables.epochNsOf(phys, "ts"))
      .withColumn("ts_ts", expr("timestamp_micros(ts div 1000)"))
    val agg = stream.withWatermark("ts_ts", "2 hours")
      .groupBy(window(col("ts_ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val name = "lateprobe" + System.nanoTime()
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
        s"wm=${p.eventTime.get("watermark")} nOps=${p.stateOperators.length}")
      p.stateOperators.foreach(op =>
        println(s"[probe]   dropped=${op.numRowsDroppedByWatermark} " +
          s"updated=${op.numRowsUpdated} total=${op.numRowsTotal}"))
    }
    val distinctKeys = spark.table(name)
      .select("w", "event_type").distinct().count()
    println(s"[probe] distinct output keys=$distinctKeys")
    spark.stop()
  }
}
