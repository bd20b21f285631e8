package graft.dev
// scratch probe main — not part of the library surface
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object SketchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.01")
    val partial = li.groupBy(pmod(col("l_suppkey"), lit(16)).as("shard"))
      .agg(expr("hll_sketch_agg(l_orderkey, 12)").as("sk"))
    val merged = partial.agg(
      expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est_merged"))
    val direct = li.agg(
      expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey, 12))").as("est_direct"))
    val exact = li.select("l_orderkey").distinct().count()
    val m = merged.collect()(0).getLong(0)
    val d = direct.collect()(0).getLong(0)
    println(s"[probe] merged=$m direct=$d exact=$exact equal=${m == d} relerr=${math.abs(m - exact).toDouble / exact}")
    spark.stop()
  }
}
