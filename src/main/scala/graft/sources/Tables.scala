package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    // events.ts has shipped as parquet TIMESTAMP(NANOS) in some data
    // generations (Spark 4 reads those as BIGINT epoch-nanos behind
    // this legacy flag) and as TIMESTAMP(MICROS) in others. All graft
    // code treats `ts` as ns-since-epoch (see Analytic.tsSec); the
    // DuckDB oracles mirror it with epoch_ns(ts). `events` below
    // normalizes whatever physical type arrives to the epoch-ns
    // contract.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // naive timestamps (TIMESTAMP_NTZ / DuckDB TIMESTAMP) are
    // compared as UTC wall clock on both sides; pin the session zone
    // so the ntz→epoch conversion can't drift with host timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // session-scoped native functions (graft_dot); the driver hands us
    // a pre-built session, so registration rides every table access.
    org.apache.spark.sql.GraftFunctions.register(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Normalize a timestamp-ish column to the repo-wide epoch-ns LONG
    * contract, whatever physical type the data generation used:
    * parquet TIMESTAMP(NANOS) already arrives as epoch-ns long (via
    * the legacy flag above); TIMESTAMP(MICROS) — tz-adjusted or naive
    * — converts exactly (micros × 1000 never overflows for sane
    * dates). Naive wall clock is interpreted as UTC, matching how the
    * DuckDB oracle's epoch_ns treats its naive TIMESTAMP. */
  private def epochNs(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case LongType => col(c)
      case TimestampType => expr(s"unix_micros($c) * 1000L")
      case TimestampNTZType =>
        // session zone is pinned UTC above, so the cast is the
        // identity instant mapping
        expr(s"unix_micros(cast($c as timestamp)) * 1000L")
      case other =>
        throw new IllegalStateException(s"unexpected type for $c: $other")
    }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.withColumn("ts", epochNs(df, "ts"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
