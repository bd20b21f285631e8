package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Pins the Tables.events epoch-ns contract across the physical
  * timestamp types the driver's data generations have shipped:
  * TIMESTAMP(NANOS) arrives as epoch-ns BIGINT (legacy flag),
  * TIMESTAMP(MICROS) — naive or tz-adjusted — must be converted to
  * the same epoch-ns longs. A generation flip must never silently
  * null out or rescale `ts` (round 8's src_json_lines hash miss was
  * exactly this: micros data + a long-schema JSON read → null ts). */
class TablesSpec extends SparkSpec {

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft_tables_spec").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("events normalizes naive-micros timestamps to epoch-ns longs") {
    val dir = freshDir()
    // 2024-01-01T00:00:07.179 UTC → epoch micros 1704067207179000
    spark.sql(
      """SELECT 1L AS event_id,
        | TIMESTAMP_NTZ'2024-01-01 00:00:07.179' AS ts,
        | 8L AS user_id, 'error' AS event_type, 6.55d AS value,
        | '{}' AS props""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType === LongType)
    val ns = got.select("ts").collect().head.getLong(0)
    assert(ns === 1704067207179000L * 1000L)
  }

  test("events passes epoch-ns longs through unchanged") {
    val dir = freshDir()
    spark.range(1)
      .select(col("id").as("event_id"),
        lit(1704067207179000123L).as("ts"),
        lit(8L).as("user_id"), lit("error").as("event_type"),
        lit(6.55d).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType === LongType)
    assert(got.select("ts").collect().head.getLong(0) === 1704067207179000123L)
  }

  test("events converts tz-adjusted micros timestamps identically") {
    val dir = freshDir()
    spark.sql(
      """SELECT 1L AS event_id,
        | TIMESTAMP'2024-01-01 00:00:07.179' AS ts,
        | 8L AS user_id, 'error' AS event_type, 6.55d AS value,
        | '{}' AS props""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // tz-adjusted micros (isAdjustedToUTC=true) reads back as
    // TimestampType; session zone is UTC so the instant is the same
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType === LongType)
    assert(got.select("ts").collect().head.getLong(0) === 1704067207179000L * 1000L)
  }
}
