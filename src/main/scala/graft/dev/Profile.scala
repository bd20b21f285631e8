package graft.dev
// scratch profiling main — not part of the library surface
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    // minhash pipeline, staged: checkpoint postings then time each phase
    val postRaw = graft.operators.Dedup.shinglePostings(spark, dir)
    time("warm postings")(postRaw.count())
    time("postings")(postRaw.count())
    val t0 = System.nanoTime()
    val post = postRaw.localCheckpoint()
    println(f"[prof] checkpoint postings        ${(System.nanoTime()-t0)/1e9}%8.2f s")
    val p = 2147483647L
    def A(i: Int): Long = ((2L * i + 1) * 2654435761L) % p
    def B(i: Int): Long = ((i + 1L) * 2246822519L) % p
    val minCols = (0 until 128).map(i =>
      min(expr(s"(${A(i)} * (h % $p) + ${B(i)}) % $p")).as(s"m$i"))
    val sigs = post.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), array((0 until 128).map(i => col(s"m$i")): _*).as("sig"))
    time("sigs")(sigs.count())
    time("sigs 2nd")(sigs.count())
    val exploded = sigs.withColumn("bands", expr(
        """transform(sequence(0, 15), b -> struct(b AS band,
          |  md5(array_join(transform(slice(sig, b*8+1, 8), x -> CAST(x AS STRING)), ',')) AS key))""".stripMargin))
      .select(col("doc_id"), explode(col("bands")).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    time("exploded")(exploded.count())
    time("exploded 2nd")(exploded.count())
    val cand = exploded.as("a").join(exploded.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    time("cand")(cand.count())
    time("cand 2nd")(cand.count())
    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      time(name)(fn(spark, dir).count())
      time(name + " (2nd)")(fn(spark, dir).count())
    }
    spark.stop()
  }
}
