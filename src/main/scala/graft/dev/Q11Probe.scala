package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decomposes q11_important_stock's steady-state cost at a given SF
  * dir — the probe behind the round-13 fix for its 2.19×-floor bench
  * regression. Variants: the shipped query, the derived-partsupp
  * scan alone, and a forced-broadcast supplier join (the pre-round-12
  * shape, for reference only — the hint is banned for SF-scaled
  * dims). Run:
  *   sbt -batch "runMain graft.dev.Q11Probe /root/testdata/sf0.1"
  */
object Q11Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(mk: => DataFrame): Unit = {
      val xs = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q11probe] $tag%-18s cold=${xs.head}%.3f steady=${xs.tail.min}%.3f")
    }
    time("q11")(graft.queries.Tpch.q11(spark, dir))
    time("partsupp_only")(graft.queries.Tpch.partsupp(spark, dir))
    time("pairs_distinct")(
      graft.sources.Tables.lineitem(spark, dir)
        .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
        .distinct())
    time("q11_forcedbc") {
      val sup = graft.sources.Tables.supplier(spark, dir)
        .join(broadcast(graft.sources.Tables.nation(spark, dir)
          .filter(col("n_name") === "NATION_7")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val perPart = graft.queries.Tpch.partsupp(spark, dir)
        .join(broadcast(sup), col("ps_suppkey") === col("s_suppkey"))
        .withColumn("value", col("ps_supplycost") * col("ps_availqty"))
        .groupBy("ps_partkey").agg(sum("value").as("value"))
        .localCheckpoint()
      val tot = perPart.agg(sum("value").as("total"))
      perPart.crossJoin(broadcast(tot))
        .filter(col("value") * 5000 > col("total"))
        .select(col("ps_partkey"), col("value"))
        .orderBy(desc("value"), col("ps_partkey"))
    }
    spark.stop()
  }
}
