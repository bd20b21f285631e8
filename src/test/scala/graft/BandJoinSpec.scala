package graft

import org.apache.spark.sql.functions._

class BandJoinSpec extends SparkSpec {

  test("hand-built frames: inclusive edges, multi-match, key fences, empty bands") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // band [40, 99]: rids at 50, 90 (not 100, not 39)
      (2L, 10L, 150L), // band [90, 149]: rids 90, 101 — 50 evicted
      (3L, 10L, 500L), // empty band → emits nothing (INNER)
      (4L, 20L, 100L), // key 20 has no right rows at all
      (5L, 30L, 60L)   // band [0, 59]: the ts-60 rows sit just above → nothing
    ).toDF("lid", "k", "ts")
    val right = Seq(
      (101L, 10L, 39L), (102L, 10L, 50L), (103L, 10L, 90L), (104L, 10L, 101L),
      (201L, 30L, 60L), (202L, 30L, 60L)
    ).toDF("rid", "rk", "rts")
    val out = graft.plans.Band.join(left, right, Seq("k" -> "rk"),
        "ts", "rts", lo = -60L, hi = -1L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set(
      (1L, 102L), (1L, 103L),   // 39 below band, 101 above
      (2L, 103L), (2L, 104L)))  // 102 (ts 50) evicted, never re-enters
  }

  test("ties and a zero-width band: all equal-ts rows emit") {
    import spark.implicits._
    val left = Seq((1L, 30L, 60L)).toDF("lid", "k", "ts")
    val right = Seq((201L, 30L, 60L), (202L, 30L, 60L), (203L, 30L, 61L))
      .toDF("rid", "rk", "rts")
    val out = graft.plans.Band.join(left, right, Seq("k" -> "rk"),
        "ts", "rts", lo = 0L, hi = 0L)
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(out == Set(201L, 202L))
  }

  test("SQL null semantics: null keys and timestamps never match") {
    import spark.implicits._
    val left = Seq(
      (1L, Some(10L), Some(100L)),
      (2L, None, Some(100L)),     // null key → nothing
      (3L, Some(10L), None)       // null ts → nothing
    ).toDF("lid", "k", "ts")
    val right = Seq(
      (101L, Some(10L), Some(90L)),
      (102L, None, Some(90L)),    // null right key → skipped
      (103L, Some(10L), None)     // null right ts → skipped
    ).toDF("rid", "rk", "rts")
    val out = graft.plans.Band.join(left, right, Seq("k" -> "rk"),
        "ts", "rts", lo = -60L, hi = 0L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 101L)))
  }

  test("plan runs on BandJoinExec and matches the bucketed form row-for-row") {
    val native = queries.Analytic.rangeNative(spark, sf)
    val planStr = native.queryExecution.executedPlan.toString
    assert(planStr.contains("BandJoin"), s"native node missing:\n$planStr")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        ((r.getAs[Long]("n_clicks_1h"), r.getAs[Long]("first_click_sec"),
          r.getAs[Long]("last_click_sec"))))
      .toMap
    assert(key(native) == key(queries.Analytic.rangeJoin(spark, sf)))
  }

  test("randomized equivalence vs the declarative inequality join") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xBA2D)
    val left = Seq.tabulate(400)(i =>
      (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(300).toLong))
      .toDF("lid", "k", "ts")
    val right = Seq.tabulate(600)(i =>
      (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(300).toLong))
      .toDF("rid", "rk", "rts")
    val native = graft.plans.Band.join(left, right, Seq("k" -> "rk"),
        "ts", "rts", lo = -25L, hi = 10L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val declarative = left.join(right,
        col("k") === col("rk") &&
          col("rts") >= col("ts") - 25 && col("rts") <= col("ts") + 10)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(native.length == declarative.length)
    assert(native == declarative)
  }

  test("shape requires fail fast: shared names, type mismatch, empty band") {
    import spark.implicits._
    val l = Seq((1L, 1L, 1L)).toDF("lid", "k", "ts")
    val rShared = Seq((1L, 1L, 1L)).toDF("rid", "rk", "ts")
    intercept[IllegalArgumentException] {
      graft.plans.Band.join(l, rShared, Seq("k" -> "rk"), "ts", "ts", -1L, 0L)
    }
    val rIntKey = Seq((1L, 1, 1L)).toDF("rid", "rk", "rts")
    intercept[IllegalArgumentException] {
      graft.plans.Band.join(l, rIntKey, Seq("k" -> "rk"), "ts", "rts", -1L, 0L)
    }
    val r = Seq((1L, 1L, 1L)).toDF("rid", "rk", "rts")
    intercept[IllegalArgumentException] {
      graft.plans.Band.join(l, r, Seq("k" -> "rk"), "ts", "rts", 5L, -5L)
    }
  }
}
