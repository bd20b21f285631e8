package graft.dev
import org.apache.spark.sql.SparkSession
/** one-shot probe: Spark 4 SQL scripting (BEGIN..END) support —
  * control flow + scalar-subquery SET over a real table. */
object ScriptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .createOrReplaceTempView("script_orders")
    try {
      val r = spark.sql(
        """BEGIN
          |  DECLARE thr BIGINT DEFAULT 1;
          |  DECLARE covered BIGINT DEFAULT 0;
          |  DECLARE total BIGINT DEFAULT 0;
          |  SET total = (SELECT count(*) FROM script_orders);
          |  SET covered = (SELECT count(*) FROM script_orders WHERE o_totalprice <= thr);
          |  WHILE covered * 10 < total * 9 DO
          |    SET thr = thr * 2;
          |    SET covered = (SELECT count(*) FROM script_orders WHERE o_totalprice <= thr);
          |  END WHILE;
          |  SELECT thr AS threshold, covered AS n_covered, total AS n_total;
          |END""".stripMargin)
      println("scripting: " + r.collect().mkString(","))
    } catch { case e: Exception => println("scripting unsupported: " + e.getMessage.take(300)) }
    spark.stop()
  }
}
