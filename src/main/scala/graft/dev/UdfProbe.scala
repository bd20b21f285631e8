package graft.dev
import org.apache.spark.sql.SparkSession
/** one-shot probe: Spark 4 SQL UDF / SQL TVF syntax support. */
object UdfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("CREATE TEMPORARY FUNCTION sq(x BIGINT) RETURNS BIGINT RETURN x * x + 1")
    println("scalar: " + spark.sql("SELECT sq(id) AS v FROM range(4)").collect().map(_.getLong(0)).mkString(","))
    try {
      spark.sql("CREATE TEMPORARY FUNCTION tf(n BIGINT) RETURNS TABLE (i BIGINT) RETURN SELECT id AS i FROM range(100) WHERE id < n")
      println("tvf: " + spark.sql("SELECT * FROM tf(3)").collect().map(_.getLong(0)).mkString(","))
    } catch { case e: Exception => println("TVF unsupported: " + e.getMessage.take(150)) }
    spark.stop()
  }
}
