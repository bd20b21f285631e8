package graft.dev

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Empirically pins the LEFT OUTER stream-stream join's null-row
  * eviction boundary: plants unmatched purchases at W-1s, W, W+1s
  * around the expected final watermark W = min(max click, max
  * purchase) - 2h and prints which null rows the bounded replay
  * emits. Run: sbt "runMain graft.dev.OuterJoinProbe". */
object OuterJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("outer-join-probe").master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._

    val T = 100000L // max event sec on both sides -> W = 92800
    val rows = Seq(
      // matched purchase: click 1000s before
      (1L, 49000L, 10L, "click", 1.0, "{}"),
      (2L, 50000L, 10L, "purchase", 2.0, "{}"),
      // unmatched purchases around the boundary (users with no clicks)
      (3L, 92799L, 20L, "purchase", 1.0, "{}"),
      (4L, 92800L, 21L, "purchase", 1.0, "{}"),
      (5L, 92801L, 22L, "purchase", 1.0, "{}"),
      // watermark anchors: one click + one purchase at T
      (6L, T, 30L, "click", 1.0, "{}"),
      (7L, T, 31L, "purchase", 1.0, "{}"))
    val df = rows.toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .select(col("event_id"), expr("timestamp_seconds(sec)").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    val dir = java.nio.file.Files.createTempDirectory("ojprobe").toString
    val tmp = s"$dir/__w"
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, "events.parquet"))

    val out = graft.streaming.StreamQueries.outerJoin(spark, dir)
    println("[probe] result:")
    out.collect().foreach(r => println(s"[probe] $r"))
    spark.stop()
  }
}
