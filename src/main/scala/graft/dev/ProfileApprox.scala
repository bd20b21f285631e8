package graft.dev
// scratch profiling main for agg_approx_stats components — not part of the library surface
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileApprox {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = graft.sources.Tables.lineitem(spark, dir)
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $tag%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    time("warm scan")(li.count())
    time("countDistinct x2 (Expand)")(
      li.agg(countDistinct(col("l_partkey")), countDistinct(col("l_orderkey"))).collect())
    time("distinct+count partkey")(
      li.select("l_partkey").distinct().agg(count(lit(1))).collect())
    time("distinct+count orderkey")(
      li.select("l_orderkey").distinct().agg(count(lit(1))).collect())
    time("approx_cd x2")(
      li.agg(approx_count_distinct(col("l_partkey")), approx_count_distinct(col("l_orderkey"))).collect())
    time("percentile exact")(
      li.agg(expr("percentile(l_extendedprice, 0.5)")).collect())
    time("percentile_approx")(
      li.agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))).collect())
    time("full current approxStats")(
      graft.queries.SqlSurface.approxStats(spark, dir).collect())
    time("full current approxStats 2nd")(
      graft.queries.SqlSurface.approxStats(spark, dir).collect())
    spark.stop()
  }
}
