package graft.dev
// scratch probe main — not part of the library surface
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    // signature parity: 128 min-columns vs the one-pass imperative agg
    org.apache.spark.sql.GraftFunctions.register(spark)
    val p = 2147483647L
    def A(i: Int): Long = ((2L * i + 1) * 2654435761L) % p
    def B(i: Int): Long = ((i + 1L) * 2246822519L) % p
    val post = graft.operators.Dedup.shinglePostings(spark, dir).localCheckpoint()
    val minCols = (0 until 128).map(i =>
      min(expr(s"(${A(i)} * (h % $p) + ${B(i)}) % $p")).as(s"m$i"))
    val oldSigs = post.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), array((0 until 128).map(i => col(s"m$i")): _*).as("sig"))
    val newSigs = post.groupBy("doc_id")
      .agg(expr("graft_minhash_sig(h)").as("sig"))
    val joined = oldSigs.as("o").join(newSigs.as("n"), "doc_id")
    val n = joined.count()
    val mismatches = joined.filter(col("o.sig") =!= col("n.sig")).count()
    println(s"[probe] docs=$n sig_mismatches=$mismatches")
    spark.stop()
  }
}
