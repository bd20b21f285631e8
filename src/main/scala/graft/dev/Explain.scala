package graft.dev
// scratch plan-audit main — not part of the library surface
import org.apache.spark.sql.SparkSession

object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("sql_full_outer", "ev_gap_fill", "sink_nested_types", "dedup_minhash_lsh")
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val smells = Seq("BroadcastNestedLoopJoin", "CartesianProduct")
        .filter(plan.contains)
      val joins = "(\\w*Join\\w*)".r.findAllIn(plan).toSeq.distinct
      println(s"[explain] $name joins=${joins.mkString(",")} smells=${smells.mkString(",")}")
    }
    spark.stop()
  }
}
