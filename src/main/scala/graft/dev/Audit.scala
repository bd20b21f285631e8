package graft.dev
// scratch audit main: flags plan anti-patterns across every query
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

object Audit {

  /** A BNLJ build side is acceptable iff its shape BOUNDS the row
    * count: either a grand (no-grouping-key) aggregate — the 1-row
    * scalar-subquery shape — or a filter comparing a column against a
    * small literal (the ANN probe set, `vec_id < 5`). Asserting the
    * shape instead of allowlisting query names means a future plan
    * change that makes a BNLJ unbounded gets flagged even in a query
    * that used to carry a benign one. */
  private def boundedBuild(p: SparkPlan): Boolean = {
    val scalarAgg = p.exists {
      case a: BaseAggregateExec => a.groupingExpressions.isEmpty
      case _ => false
    }
    def smallLit(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
      e.exists {
        case Literal(v: Number, _) => math.abs(v.longValue()) <= 64
        case _ => false
      }
    val smallFilter = p.exists {
      case f: FilterExec => smallLit(f.condition)
      case _ => false
    }
    scalarAgg || smallFilter
  }

  private def unboundedBnljs(p: SparkPlan): Seq[String] = p match {
    case a: AdaptiveSparkPlanExec => unboundedBnljs(a.executedPlan)
    case j: BroadcastNestedLoopJoinExec =>
      val build = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
      }
      val here = if (boundedBuild(build)) Nil else Seq("BNLJ-unbounded-build")
      here ++ j.children.flatMap(unboundedBnljs)
    case other => other.children.flatMap(unboundedBnljs)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val physical = fn(spark, dir).queryExecution.executedPlan
        val plan = physical.toString
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "InMemoryTableScan" -> plan.contains("InMemoryTableScan")
        ).collect { case (f, true) => f } ++ unboundedBnljs(physical)
        println(s"[audit] $name ${if (flags.isEmpty) "clean" else "FLAGS: " + flags.mkString(",")}")
      } catch { case e: Throwable => println(s"[audit] $name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
