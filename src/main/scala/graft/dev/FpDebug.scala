package graft.dev
// scratch probe: dump normalized canonicalized plans for fingerprint
// stability debugging (args: outDir queryName...)
import org.apache.spark.sql.SparkSession

object FpDebug {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    new java.io.File(out).mkdirs()
    names.foreach { n =>
      val s = graft.SparkEntry.queries(n)(spark, dir)
        .queryExecution.optimizedPlan.canonicalized.toString
        .replaceAll("graft_io/[^/]+", "graft_io/APP")
        .replaceAll("@[0-9a-fA-F]{4,}", "@X")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/$n.txt"), s)
      println(s"[fp] $n ${graft.Bench.planFingerprint(graft.SparkEntry.queries(n)(spark, dir))}")
    }
    spark.stop()
  }
}
