package graft.dev
// scratch probe main — not part of the library surface
import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = spark.sql(
        """WITH RECURSIVE t(n) AS (
          |  SELECT 1
          |  UNION ALL
          |  SELECT n + 1 FROM t WHERE n < 5
          |) SELECT * FROM t ORDER BY n""".stripMargin)
      println("[probe] recursive CTE rows: " + df.collect().map(_.getInt(0)).mkString(","))
    } catch {
      case e: Throwable => println("[probe] recursive CTE unsupported: " + e.toString.take(300))
    }
    spark.stop()
  }
}
