package graft.dev
// scratch plan-audit main — not part of the library surface.
// Prints shuffle/broadcast/sort counts and the formatted plan head
// for the named SparkEntry queries (dev loop for the per-operator
// "is this the plan I'd want at 100 TB" check).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "dedup_containment", "dedup_ngram_novelty", "vocab_pair_freq",
      "ev_pattern_match", "ev_incremental_agg", "sink_compaction",
      "sink_dynamic_overwrite")
    def count(p: SparkPlan, pred: SparkPlan => Boolean): Int = {
      val self = if (pred(p)) 1 else 0
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case _ => p.children ++ p.subqueries
      }
      self + kids.map(count(_, pred)).sum
    }
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.executedPlan
      val shuffles = count(plan, _.isInstanceOf[ShuffleExchangeLike])
      val bcasts = count(plan, _.isInstanceOf[BroadcastExchangeLike])
      val sorts = count(plan, _.nodeName.toLowerCase.contains("sort"))
      val windows = count(plan, _.nodeName.toLowerCase.contains("window"))
      println(s"[audit] $n shuffles=$shuffles broadcasts=$bcasts sorts=$sorts windows=$windows")
      if (args.nonEmpty) println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).take(4000))
    }
    spark.stop()
  }
}
