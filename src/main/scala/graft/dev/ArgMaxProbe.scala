package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the native graft_argmax_cell kernel against the
  * aggregate() HOF fold it replaced, on the real sf0.1 corpus at the
  * trained quantizer's data-derived cell count — the numbers quoted
  * in ArgMaxCell's scaladoc. Also asserts bit-identical assignment. */
object ArgMaxProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.GraftFunctions.register(spark)
    val corpus = graft.operators.Vectors.asDouble(
        graft.sources.Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("vd"),
        graft.operators.Vectors.norm(col("vd")).as("vnrm"))
      .localCheckpoint(true)
    val cents = graft.operators.Similarity.trainedCellsOf(corpus, 2)
      .localCheckpoint(true)
    val centsRow = cents
      .agg(array_sort(collect_list(struct(col("cell"), col("cv"), col("cnrm"))))
        .as("cents")).localCheckpoint(true)
    def native: DataFrame = corpus.crossJoin(broadcast(centsRow))
      .select(col("vec_id"),
        call_function("graft_argmax_cell",
          col("vd"), col("vnrm"), col("cents"), lit(-1L)).as("cell"))
    def hof: DataFrame = corpus.crossJoin(broadcast(centsRow))
      .select(col("vec_id"),
        expr("""aggregate(
          transform(cents, c -> named_struct(
            'sim', graft_dot(vd, c.cv) / (vnrm * c.cnrm), 'cell', c.cell)),
          named_struct('sim', CAST(-2.0 AS DOUBLE), 'cell', CAST(-1 AS BIGINT)),
          (acc, s) -> IF(s.sim > acc.sim, s, acc)).cell""").as("cell"))
    def time(mk: => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both, then min-of-3 each
    time(native); time(hof)
    val nT = Seq(time(native), time(native), time(native)).min
    val hT = Seq(time(hof), time(hof), time(hof)).min
    val mismatch = native.withColumnRenamed("cell", "nc")
      .join(hof, "vec_id").filter(col("nc") =!= col("cell")).count()
    println(f"[argmax] native=$nT%.3f s hof=$hT%.3f s speedup=${hT / nT}%.2fx mismatch=$mismatch")
    spark.stop()
  }
}
