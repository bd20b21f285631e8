package graft.dev
// scratch profiling main — not part of the library surface
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

object CdcProbe {
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
    val docs = graft.sources.Tables.documents(spark, dir)
    val normTextExpr = "trim(regexp_replace(lower(text), '\\\\s+', ' '))"
    val t = docs.select(col("doc_id"), expr(normTextExpr).as("norm"))
    time("norm")(t.count())
    time("norm 2nd")(t.count())
    val cuts = t
      .select(col("doc_id"), col("norm"),
        explode(expr("sequence(8, greatest(length(norm), 9) - 1)")).as("i"))
      .filter(expr(
        s"i < length(norm) AND ${graft.operators.Hash60.sql("substring(norm, i - 7, 8)")} % 64 = 0"))
      .select(col("doc_id"), col("i").as("e"))
    time("cuts")(cuts.count())
    time("cuts 2nd")(cuts.count())
    val ends = cuts.union(t.select(col("doc_id"), length(col("norm")).as("e")))
    val byDoc = Window.partitionBy("doc_id").orderBy("e")
    val seg = ends.withColumn("s",
      coalesce(lag("e", 1).over(byDoc), lit(0)) + 1)
    time("seg")(seg.count())
    val chunks = seg.join(t, Seq("doc_id"))
      .select(col("doc_id"),
        md5(expr("substring(norm, s, e - s + 1)")).as("digest"),
        (col("e") - col("s") + 1).cast("bigint").as("clen"))
    time("chunks")(chunks.count())
    time("chunks 2nd")(chunks.count())
    val sharing = chunks.select("doc_id", "digest").distinct()
      .groupBy("digest").agg(count(lit(1)).as("n_docs"))
    time("sharing")(sharing.count())
    val out = graft.operators.Dedup.cdcChunksOn(docs)
    time("full")(out.count())
    time("full 2nd")(out.count())
    spark.stop()
  }
}
