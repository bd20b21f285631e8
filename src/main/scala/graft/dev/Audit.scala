package graft.dev
// scratch audit main: flags plan anti-patterns across every query
import org.apache.spark.sql.SparkSession

object Audit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    // intentional BNLJs: ANN broadcasts a handful of probe rows; the
    // rest broadcast 1-row scalar aggregates (corpus totals / value
    // bounds — scalar-subquery shape, bounded by construction)
    val allowBnlj = Set("ann_bruteforce_topk", "ann_ivf_topk", "ann_filtered_topk",
      "q22_anti_join", "agg_approx_stats", "agg_sketch_merge",
      "dict_cardinality_stats", "ev_histogram", "pipeline_mix_weights",
      "text_bm25", "text_tfidf_topterms")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BNLJ" -> (plan.contains("BroadcastNestedLoopJoin") && !allowBnlj(name)),
          "InMemoryTableScan" -> plan.contains("InMemoryTableScan")
        ).collect { case (f, true) => f }
        println(s"[audit] $name ${if (flags.isEmpty) "clean" else "FLAGS: " + flags.mkString(",")}")
      } catch { case e: Throwable => println(s"[audit] $name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
