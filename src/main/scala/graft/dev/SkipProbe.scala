package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** dev-only: measure row-group skipping for sorted vs unsorted layouts. */
object SkipProbe {
  def scanRows(df: DataFrame): Long = {
    df.collect()
    def find(p: SparkPlan): Long = p match {
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case q: QueryStageExec => find(q.plan)
      case f: FileSourceScanExec => f.metrics("numOutputRows").value
      case other => other.children.map(find).sum
    }
    find(df.queryExecution.executedPlan)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    val sorted = graft.queries.SourcesSinks.sortedSink(spark, sf)
    println("[probe] sorted scan rows: " + scanRows(sorted))
    val unsortedPath = graft.queries.SourcesSinks.tmp(spark, sf, "lineitem_unsorted")
    graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_shipdate").cast("date").as("l_shipdate"),
        col("l_quantity"), col("l_extendedprice"))
      .repartition(4)
      .write.mode("overwrite")
      .option("parquet.block.size", (256 * 1024).toString).parquet(unsortedPath)
    println("[probe] unsorted scan rows: " +
      scanRows(graft.queries.SourcesSinks.sortedRangeRead(spark, unsortedPath)))
    println("[probe] total rows: " + graft.sources.Tables.lineitem(spark, sf).count())
    val rd = graft.queries.SourcesSinks.sortedRangeRead(spark,
      graft.queries.SourcesSinks.tmp(spark, sf, "lineitem_sorted"))
    println("[probe] plan: " + rd.queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("PushedFilters") || l.contains("Scan"))
      .mkString(" || ").take(1200))
    // how many files / row groups does the sorted layout have?
    val d = new java.io.File(graft.queries.SourcesSinks.tmp(spark, sf, "lineitem_sorted"))
    println("[probe] files: " + d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName.take(12) + "=" + f.length()).mkString(","))
    // control: same experiment on a BIGINT key instead of timestamp_ntz
    val keyPath = graft.queries.SourcesSinks.tmp(spark, sf, "lineitem_bykey")
    graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_shipdate", "l_quantity", "l_extendedprice")
      .repartitionByRange(4, col("l_orderkey")).sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").option("parquet.block.size", (256 * 1024).toString).parquet(keyPath)
    val keyRead = spark.read.parquet(keyPath)
      .filter(col("l_orderkey") >= 100L && col("l_orderkey") < 400L)
      .agg(count(lit(1)).as("n"))
    println("[probe] bigint-sorted scan rows: " + scanRows(keyRead))
    spark.stop()
  }
}
