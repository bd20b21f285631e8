package graft.dev
// scratch profiling main — not part of the library surface
import org.apache.spark.sql.SparkSession

object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $tag%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      time(name)(fn(spark, dir).count())
      time(name + " (2nd)")(fn(spark, dir).count())
    }
    spark.stop()
  }
}
