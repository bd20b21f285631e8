package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-generated parquet test data.
  *
  * Spark-side analog of the reference's scan-node table access
  * (/root/reference/hdfs-parquet-scanner.h: the scanner reads one
  * parquet file per table; here `spark.read.parquet` hands the file
  * to Spark's vectorized parquet reader, which does the same
  * dictionary/RLE/plain decoding plus row-group and page-level
  * predicate skipping the reference implements by hand).
  *
  * Every loader takes the scale-factor directory so the identical
  * plan runs at sf0.001 → 100 TB; nothing is cached or collected at
  * load time.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 only reads
    // as a BIGINT of epoch-nanos behind this legacy flag. All graft
    // code treats `ts` as ns-since-epoch (see Analytic.tsSec); the
    // DuckDB oracles mirror it with epoch_ns(ts).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // session-scoped native functions (graft_dot); the driver hands us
    // a pre-built session, so registration rides every table access.
    org.apache.spark.sql.GraftFunctions.register(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame   = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
