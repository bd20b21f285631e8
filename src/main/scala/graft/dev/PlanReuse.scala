package graft.dev
// scratch plan-audit main — not part of the library surface:
// prints whether a query's physical plan reuses exchanges/subqueries
// (the token-budget totals branch must NOT rescan the corpus).
import org.apache.spark.sql.SparkSession

object PlanReuse {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (name <- (if (args.nonEmpty) args.toSeq else Seq("pipeline_token_budget"))) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // NOTE: AQE plan strings print initial + final plans, so raw
      // node counts read ~2x the real plan; "ReusedExchange" also
      // substring-matches "Exchange" and must be subtracted
      val scans = "FileScan parquet".r.findAllIn(plan).length
      val reused = "ReusedExchange".r.findAllIn(plan).length +
        "ReusedSubquery".r.findAllIn(plan).length
      val exchanges = "Exchange".r.findAllIn(plan).length -
        "ReusedExchange".r.findAllIn(plan).length
      println(s"[reuse] $name scans=$scans exchanges=$exchanges reused=$reused")
      if (sys.env.contains("SPARK_GRAFT_VERBOSE")) println(plan)
    }
    spark.stop()
  }
}
