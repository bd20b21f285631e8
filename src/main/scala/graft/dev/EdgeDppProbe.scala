package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Feasibility probe for a bucket-partitioned edge store: does
  * dynamic partition pruning fire when the frontier side is a
  * localCheckpoint'd relation (the beam loop's shape)? */
object EdgeDppProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val edges = spark.range(100000).select(
      (col("id") % 5000).as("src"), (col("id") % 997).as("dst"))
      .withColumn("src_bucket", col("src") % 16)
    val dir = "/tmp/graft_dpp_probe"
    graft.queries.SourcesSinks.deleteRecursively(new java.io.File(dir))
    edges.write.partitionBy("src_bucket").parquet(dir)
    val rel = spark.read.parquet(dir)
      .withColumn("src_bucket", col("src_bucket").cast("bigint"))
    val frontier = Seq(3L, 19L, 35L).toDF("vec_id").localCheckpoint(true)
    val f2 = frontier.withColumn("b_bucket", col("vec_id") % 16)
    val joined = f2.join(rel,
      f2("b_bucket") === rel("src_bucket") && f2("vec_id") === rel("src"))
    val plan = joined.queryExecution.executedPlan.toString
    println("[dpp] fires=" + plan.contains("dynamicpruning"))
    joined.write.format("noop").mode("overwrite").save()
    val finalPlan = joined.queryExecution.executedPlan.toString
    println("[dpp] final fires=" + finalPlan.contains("dynamicpruning"))
    println(finalPlan.split("\n").filter(_.contains("PartitionFilters")).mkString("\n").take(500))
    spark.stop()
  }
}
