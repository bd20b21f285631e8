package graft

import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {

  test("hand-built frames: inclusive bound, tie rule, null padding, key fences") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // match: right ts 90 (latest ≤ 100)
      (2L, 10L, 50L),  // match: right ts 50 — INCLUSIVE bound
      (3L, 10L, 40L),  // no right row ≤ 40 → null padded
      (4L, 20L, 100L), // key 20 has no right rows at all → null padded
      (5L, 30L, 100L)  // tie: two right rows at ts 60 → larger rid wins
    ).toDF("lid", "k", "ts")
    val right = Seq(
      (101L, 10L, 50L), (102L, 10L, 90L), (103L, 10L, 101L), // 103 too late
      (201L, 30L, 60L), (202L, 30L, 60L)
    ).toDF("rid", "rk", "rts")
    val out = graft.plans.AsOf.join(left, right, Seq("k" -> "rk"),
        "ts", "rts", Seq("rid"))
      .select("lid", "rid", "rts").collect()
      .map(r => r.getAs[Long]("lid") ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
      .toMap
    assert(out.size == 5)
    assert(out(1L) == Some((102L, 90L)))
    assert(out(2L) == Some((101L, 50L)))
    assert(out(3L) == None)
    assert(out(4L) == None)
    assert(out(5L) == Some((202L, 60L)))
  }

  test("plan runs on AsOfJoinExec and matches the window form row-for-row") {
    val native = queries.Analytic.asofNative(spark, sf)
    val planStr = native.queryExecution.executedPlan.toString
    assert(planStr.contains("AsOfJoin"), s"native node missing:\n$planStr")
    val got = native.collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("last_click_sec"))) -1L
         else r.getAs[Long]("last_click_sec")))
      .toMap
    val window = queries.Analytic.asofAttribution(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("last_click_sec"))) -1L
         else r.getAs[Long]("last_click_sec")))
      .toMap
    assert(got == window)
  }

  test("left rows all survive exactly once (LEFT OUTER cardinality)") {
    val n = queries.Analytic.asofNative(spark, sf).count()
    val purchases = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(n == purchases)
  }
}
