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

  test("tolerance bounds the match; a just-outside candidate null-pads, never falls back") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // candidate ts 90, gap 10
      (2L, 10L, 90L),  // candidate ts 90, gap 0
      (3L, 20L, 100L)  // candidate ts 50, gap 50
    ).toDF("lid", "k", "ts")
    val right = Seq(
      (101L, 10L, 50L), (102L, 10L, 90L), (201L, 20L, 50L)
    ).toDF("rid", "rk", "rts")
    def run(tol: Option[Long]): Map[Long, Option[Long]] =
      graft.plans.AsOf.join(left, right, Seq("k" -> "rk"),
          "ts", "rts", Seq("rid"), tol)
        .select("lid", "rid").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // inclusive bound: gap 10 matches at tol 10...
    assert(run(Some(10L)) == Map(1L -> Some(102L), 2L -> Some(102L), 3L -> None))
    // ...and null-pads at tol 9 — it must NOT fall back to the older
    // in-tolerance-looking rid 101 (ts 50 is farther, gap 50)
    assert(run(Some(9L)) == Map(1L -> None, 2L -> Some(102L), 3L -> None))
    // no tolerance: everything with a preceding row matches
    assert(run(None) == Map(1L -> Some(102L), 2L -> Some(102L), 3L -> Some(201L)))
  }

  test("null keys and null timestamps never match on either side") {
    import spark.implicits._
    val L = (x: Long) => java.lang.Long.valueOf(x)
    val nl: java.lang.Long = null
    val left = Seq(
      (L(1L), nl, L(100L)),   // null key → null-pad
      (L(2L), L(10L), nl),    // null ts → null-pad
      (L(3L), L(10L), L(100L)) // real match
    ).toDF("lid", "k", "ts")
    val right = Seq(
      (L(900L), nl, L(50L)),   // null key: skipped by the merge
      (L(901L), L(10L), nl),   // null ts: skipped by the merge
      (L(101L), L(10L), L(90L))
    ).toDF("rid", "rk", "rts")
    val out = graft.plans.AsOf.join(left, right, Seq("k" -> "rk"),
        "ts", "rts", Seq("rid"))
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(1L -> None, 2L -> None, 3L -> Some(101L)))
  }

  test("forward join: earliest at-or-after match, largest-tie rule, tolerance bound") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // rights at 100 (two: 103,104) and 150 → ts 100, rid 104
      (2L, 10L, 120L), // next right is 150
      (3L, 10L, 200L), // no right at/after 200 → null
      (4L, 20L, 50L)   // right at 500: gap 450 — outside tolerance 100
    ).toDF("lid", "k", "ts")
    val right = Seq(
      (103L, 10L, 100L), (104L, 10L, 100L), (105L, 10L, 150L),
      (201L, 20L, 500L)
    ).toDF("rid", "rk", "rts")
    def run(tol: Option[Long]): Map[Long, Option[(Long, Long)]] =
      graft.plans.AsOf.joinForward(left, right, Seq("k" -> "rk"),
          "ts", "rts", Seq("rid"), tol)
        .select("lid", "rid", "rts").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2))))).toMap
    assert(run(None) == Map(
      1L -> Some((104L, 100L)), // inclusive bound + largest-tie rule
      2L -> Some((105L, 150L)),
      3L -> None,
      4L -> Some((201L, 500L))))
    assert(run(Some(100L)) == Map(
      1L -> Some((104L, 100L)),
      2L -> Some((105L, 150L)), // gap 30 ≤ 100
      3L -> None,
      4L -> None)) // gap 450 > 100: no fallback
  }

  test("mismatched shapes fail fast instead of silently mis-comparing") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("lid", "k", "ts")
    val shared = Seq((2L, 10L, 50L)).toDF("lid", "rk", "rts") // 'lid' collides
    intercept[IllegalArgumentException] {
      graft.plans.AsOf.join(left, shared, Seq("k" -> "rk"), "ts", "rts", Seq.empty)
    }
    val badKey = Seq((2, 10, 50L)).toDF("rid", "rk", "rts") // int key vs long
    intercept[IllegalArgumentException] {
      graft.plans.AsOf.join(left, badKey, Seq("k" -> "rk"), "ts", "rts", Seq.empty)
    }
    val badTs = Seq((2L, 10L, "x")).toDF("rid", "rk", "rts") // string ts
    intercept[IllegalArgumentException] {
      graft.plans.AsOf.join(left, badTs, Seq("k" -> "rk"), "ts", "rts", Seq.empty)
    }
  }
}
