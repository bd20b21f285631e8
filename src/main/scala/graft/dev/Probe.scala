package graft.dev
// scratch probe main — not part of the library surface
import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    for (name <- Seq("sql_cube", "sql_full_outer",
        "agg_percentile_exact", "sink_nested_types")) {
      val rows = graft.SparkEntry.queries(name)(spark, dir).collect()
      println(s"[probe] $name rows=${rows.length} head=${rows.take(3).mkString(" | ")}")
    }
    spark.stop()
  }
}
