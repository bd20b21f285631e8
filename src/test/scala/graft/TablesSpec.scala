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

  test("documents normalizes drifted integer widths to the canonical longs") {
    val dir = freshDir()
    spark.sql(
      """SELECT CAST(7 AS INT) AS doc_id, 'hello world' AS text,
        | 'en' AS lang, 'srcA' AS source, CAST(11 AS INT) AS n_chars""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Tables.documents(spark, dir)
    assert(got.schema("doc_id").dataType === LongType)
    assert(got.schema("n_chars").dataType === LongType)
    val r = got.collect().head
    assert(r.getAs[Long]("doc_id") == 7L && r.getAs[Long]("n_chars") == 11L)
  }

  test("embeddings normalizes a double vector to the canonical array<float>") {
    val dir = freshDir()
    spark.sql(
      """SELECT CAST(3 AS INT) AS vec_id,
        | array(CAST(0.5 AS DOUBLE), CAST(-1.25 AS DOUBLE)) AS embedding,
        | CAST(2 AS BIGINT) AS label""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Tables.embeddings(spark, dir)
    assert(got.schema("vec_id").dataType === LongType)
    assert(got.schema("embedding").dataType.asInstanceOf[ArrayType].elementType === FloatType)
    assert(got.schema("label").dataType === IntegerType)
    val r = got.collect().head
    assert(r.getAs[scala.collection.Seq[Float]]("embedding").toSeq == Seq(0.5f, -1.25f))
  }

  test("a generation matching the canonical schema loads with no extra plan nodes") {
    val dir = freshDir()
    spark.sql(
      """SELECT CAST(1 AS BIGINT) AS doc_id, 'x' AS text, 'en' AS lang,
        | 'srcA' AS source, CAST(1 AS BIGINT) AS n_chars""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val plan = Tables.documents(spark, dir).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Project"), plan)
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
