package graft.dev

import org.apache.spark.sql.SparkSession

/** dev-only: recall of the 0-iteration vs Lloyd-trained IVF
  * quantizer at each sf — the measurement behind TrainIters. */
object IvfTrainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val base = graft.operators.Similarity.recallAtK(spark, sf).collect()
        .map(r => r.getAs[Double]("recall"))
      val trained = graft.operators.Similarity.recallTrained(spark, sf).collect()
        .map(r => r.getAs[Double]("recall"))
      println(f"[probe] $sf untrained=${base.sum / base.length}%.3f " +
        f"trained=${trained.sum / trained.length}%.3f " +
        s"(per-probe untrained ${base.mkString(",")} trained ${trained.mkString(",")})")
    }
    spark.stop()
  }
}
