package graft

import org.apache.spark.sql.functions._

class AnalyticSpec extends SparkSpec {

  test("rolling bitmap distinct matches brute force incl. bucket-boundary ids") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    // ids straddle the 63-bit bucket boundary (62/63/64) and spread
    // across buckets; days leave gaps so window edges are exercised
    val ids = Seq(0L, 1L, 62L, 63L, 64L, 125L, 126L, 200L, 500L, 1000L)
    val rows = Seq.tabulate(400)(_ =>
      (ids(rng.nextInt(ids.length)), rng.nextInt(12).toLong * 2))
    val got = queries.Analytic
      .rollingDistinctOn(rows.toDF("id", "day"), "id", "day", windowDays = 7)
      .collect()
      .map(r => r.getAs[Long]("day") ->
        ((r.getAs[Long]("n_day"), r.getAs[Long]("n_window"))))
      .toMap
    val byDay = rows.groupMap(_._2)(_._1)
    val expect = byDay.map { case (d, us) =>
      d -> ((us.distinct.size.toLong,
        byDay.filter { case (d2, _) => d2 >= d - 6 && d2 <= d }
          .values.flatten.toSeq.distinct.size.toLong))
    }
    assert(got == expect)
  }

  test("rank topN keeps at most 3 parts per brand, rank-ordered") {
    val rows = queries.Analytic.rankTopN(spark, sf).collect()
    val perBrand = rows.groupBy(_.getAs[String]("p_brand"))
    perBrand.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Long]("rn")).sorted.sameElements(1L to rs.length))
      val prices = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("p_retailprice"))
      assert(prices.sameElements(prices.sortBy(-(_: Double))))
    }
  }

  test("running sum for a supplier tops out at the supplier's total revenue") {
    val rows = queries.Analytic.runningSum(spark, sf)
      .filter(col("l_suppkey") === 1).collect()
    assert(rows.nonEmpty)
    val maxRunning = rows.map(_.getAs[Double]("running_rev")).max
    val total = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_suppkey") === 1)
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"))
      .collect()(0).getDouble(0)
    assert(math.abs(maxRunning - total) < 1e-6)
  }

  test("sessionize: session gaps exceed 30min between sessions, not within") {
    val sess = queries.Analytic.sessionize(spark, sf).collect()
    assert(sess.nonEmpty)
    // within each user, sessions don't overlap and are ordered
    sess.groupBy(_.getAs[Long]("user_id")).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.getAs[Long]("session_id"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_sec") - a.getAs[Long]("end_sec") > 1800)
        case _ =>
      }
    }
  }

  test("dense_rank never jumps and rank jumps exactly by tie-group sizes") {
    val rows = queries.Analytic.denseRank(spark, sf).collect()
    for ((_, rs) <- rows.groupBy(_.getAs[Long]("l_suppkey"))) {
      val byQty = rs.groupBy(_.getAs[Double]("l_quantity")).toSeq
        .sortBy(_._1).map { case (q, g) => (q, g.head.getAs[Long]("rnk"),
          g.head.getAs[Long]("dense_rnk"), g.length) }
      // dense ranks are 1,2,3,... per distinct quantity
      assert(byQty.map(_._3) == (1L to byQty.length))
      // rank = 1 + number of rows with a strictly smaller quantity
      var seen = 0L
      for ((_, rnk, _, n) <- byQty) {
        assert(rnk == seen + 1, s"rank $rnk != ${seen + 1}")
        seen += n
      }
      // all rows within a tie share both ranks
      rs.groupBy(_.getAs[Double]("l_quantity")).values.foreach { g =>
        assert(g.map(_.getAs[Long]("rnk")).distinct.length == 1)
        assert(g.map(_.getAs[Long]("dense_rnk")).distinct.length == 1)
      }
    }
  }

  test("gap fill produces a complete hourly spine with zero-filled flagged gaps and LOCF") {
    val rows = queries.Analytic.gapFill(spark, sf).collect()
    for ((_, rs0) <- rows.groupBy(_.getAs[String]("event_type"))) {
      val rs = rs0.sortBy(_.getAs[Long]("hour_sec"))
      // spine is contiguous: every hour between min and max present once
      val hours = rs.map(_.getAs[Long]("hour_sec"))
      assert(hours.sameElements(hours.head to hours.last by 3600L))
      // gaps are flagged, zero-filled, and carry the last observed value
      var lastObserved: Option[Double] = None
      rs.foreach { r =>
        if (r.getAs[Boolean]("is_gap")) {
          assert(r.getAs[Long]("n_events") == 0 && r.getAs[Double]("sum_value") == 0.0)
          assert(lastObserved.contains(r.getAs[Double]("carried_value")))
        } else {
          lastObserved = Some(r.getAs[Double]("sum_value"))
          assert(r.getAs[Double]("carried_value") == lastObserved.get)
        }
      }
    }
    // the fill is real: at least one gap exists in the synthetic feed
    assert(rows.exists(_.getAs[Boolean]("is_gap")), "no gaps — the spine test is vacuous")
  }

  test("tumbling window hours align to 3600s and event counts total correctly") {
    val rows = queries.Analytic.tumblingWindow(spark, sf).collect()
    rows.foreach(r => assert(r.getAs[Long]("hour_sec") % 3600 == 0))
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == graft.sources.Tables.events(spark, sf).count())
  }

  test("session_window merges an exactly-gap event and splits one second past") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the boundary rule the sf0.1 oracle sweep caught: gap == 1800s
    // MERGES ([start, end] closed), 1801s splits — an >=-gap island
    // oracle diverges one row per exact-gap pair
    val df = Seq((1L, 1000L), (1L, 2800L), (2L, 1000L), (2L, 2801L))
      .toDF("user_id", "sec")
      .select(col("user_id"), expr("timestamp_seconds(sec)").as("ts"))
    val got = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), expr("unix_timestamp(sw.start)").as("st"),
        expr("unix_timestamp(sw.end)").as("en"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set((1L, 1000L, 4600L, 2L),
      (2L, 1000L, 2800L, 1L), (2L, 2801L, 4601L, 1L)), s"got $got")
  }

  test("native session_window agrees with the lag+cumsum sessionizer") {
    import org.apache.spark.sql.functions._
    // both operators MERGE an event at exactly gap distance (probed:
    // a 1800s gap joins, 1801s splits — [start, end] closed merge),
    // so the two forms agree on EVERY session including exact-gap
    // boundaries; the planted-boundary test below pins the rule
    val native = queries.Analytic.sessionWindowAgg(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val lagForm = queries.Analytic.sessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("start_sec")) ->
        ((r.getAs[Long]("end_sec"), r.getAs[Long]("n_events"),
          r.getAs[Double]("session_value")))).toMap
    assert(native.nonEmpty)
    // same sessions keyed by (user, start); session_window's end is
    // last event + gap, the lag form's is the last event itself
    assert(native.keySet == lagForm.keySet,
      s"extra=${(native.keySet -- lagForm.keySet).take(3)} missing=${(lagForm.keySet -- native.keySet).take(3)}")
    native.foreach { case (k, (end, n, v)) =>
      val (lend, ln, lv) = lagForm(k)
      assert(end == lend + 1800 && n == ln && v == lv, s"$k: $end/$n/$v vs $lend/$ln/$lv")
    }
    // the native operator builds sessions in the aggregate — no
    // per-user WindowExec sort in the plan
    val plan = queries.Analytic.sessionWindowAgg(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition"), plan.take(2000))
  }

  test("user stats cover every user exactly once") {
    val df = queries.Analytic.userStats(spark, sf)
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(df.count() == users)
  }

  test("range frame: trailing 30d sum >= day revenue and respects the value window") {
    import org.apache.spark.sql.functions._
    val rows = queries.Analytic.rangeFrame(spark, sf)
      .filter(col("l_suppkey") === 7).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (day, dayRev, trailing) =>
      assert(trailing >= dayRev - 1e-9)
      val expected = rows.filter(x => x._1 >= day - 29 && x._1 <= day).map(_._2).sum
      assert(math.abs(trailing - expected) < 1e-6, s"day $day: $trailing vs $expected")
    }
  }

  test("range join matches the naive per-pair computation and avoids BNLJ") {
    import org.apache.spark.sql.functions._
    val df = queries.Analytic.rangeJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(2000))
    // naive reference computed driver-side on the small test sf
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000000000").as("sec")).collect()
    val clicks = ev.filter(_.getString(2) == "click")
      .map(r => (r.getLong(0), r.getLong(3))).groupBy(_._1)
    val want = ev.filter(_.getString(2) == "purchase").flatMap { p =>
      val inWin = clicks.getOrElse(p.getLong(0), Array.empty[(Long, Long)])
        .map(_._2).filter(c => c >= p.getLong(3) - 3600 && c < p.getLong(3))
      if (inWin.isEmpty) None
      else Some((p.getLong(1), (inWin.length.toLong, inWin.min, inWin.max)))
    }.toMap
    val got = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"diff=${(want.toSet diff got.toSet).take(3)}")
  }

  test("ignore-nulls navigation matches a brute-force purchase scan per user") {
    val rows = queries.Analytic.ignoreNullsWindow(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "value", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))
    val byUser = ev.groupBy(_._1).map { case (u, es) =>
      u -> es.sortBy(e => (e._5, e._2))
    }
    rows.foreach { r =>
      val (u, eid) = (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"))
      val seq = byUser(u)
      val i = seq.indexWhere(_._2 == eid)
      val before = seq.take(i + 1).filter(_._3 == "purchase").map(_._4)
      val strictBefore = seq.take(i).filter(_._3 == "purchase").map(_._4)
      val after = seq.drop(i + 1).filter(_._3 == "purchase").map(_._4)
      val allP = seq.filter(_._3 == "purchase").map(_._4)
      def gotOpt(c: String): Option[Double] =
        if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Double](c))
      assert(gotOpt("last_purchase") == before.lastOption)
      assert(gotOpt("prev_purchase") == strictBefore.lastOption)
      assert(gotOpt("next_purchase") == after.headOption)
      assert(gotOpt("second_purchase") == allP.drop(1).headOption)
    }
  }

  test("markov transition rows are probability distributions over observed pairs") {
    val rows = queries.Analytic.markovTransitions(spark, sf).collect()
    rows.groupBy(_.getAs[String]("prev_type")).foreach { case (_, rs) =>
      val total = rs.head.getAs[Long]("row_total")
      assert(rs.map(_.getAs[Long]("n_transitions")).sum == total)
      assert(math.abs(rs.map(_.getAs[Double]("prob")).sum - 1.0) < 1e-9)
    }
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id").collect().map(_.getLong(0))
    val expectedPairs = ev.length - ev.distinct.length
    assert(rows.map(_.getAs[Long]("n_transitions")).sum == expectedPairs,
      "every user-adjacent pair contributes exactly one transition")
  }

  test("cohort LTV cumulative column ends at the cohort's total revenue") {
    val rows = queries.Analytic.cohortLtv(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("cohort_week")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("week_offset"))
      val cum = sorted.map(_.getAs[Double]("cum_ltv"))
      assert(cum.zip(cum.drop(1)).forall { case (a, b) => b >= a - 1e-9 })
      val totalRev = sorted.map(_.getAs[Double]("revenue")).sum
      assert(math.abs(cum.last - totalRev) < 1e-6)
    }
  }

  test("RFM bands are 1..5 quintiles balanced within one user") {
    val rows = queries.Analytic.rfmSegments(spark, sf).collect()
    for (band <- Seq("r_band", "f_band", "m_band")) {
      val counts = rows.groupBy(_.getAs[Long](band)).map { case (b, rs) => b -> rs.length }
      assert(counts.keySet.subsetOf((1L to 5L).toSet), s"$band out of range")
      assert(counts.values.max - counts.values.min <= 1,
        s"$band quintiles unbalanced: $counts")
    }
    rows.foreach { r =>
      assert(r.getAs[String]("segment") ==
        s"${r.getAs[Long]("r_band")}-${r.getAs[Long]("f_band")}-${r.getAs[Long]("m_band")}")
    }
  }

  test("SCD2 intervals tile each user's purchase history exactly once") {
    val rows = queries.Analytic.scd2Intervals(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("version"))
      assert(sorted.map(_.getAs[Long]("version")).sameElements(1L to rs.length))
      // contiguity: each interval closes exactly where the next opens
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to_sec") == b.getAs[Long]("valid_from_sec"))
          assert(!a.getAs[Boolean]("is_current"))
        case _ =>
      }
      val current = sorted.filter(_.getAs[Boolean]("is_current"))
      assert(current.length == 1 && current.head == sorted.last)
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("valid_to_sec")))
    }
  }

  test("running count-distinct ends at the user's true distinct-type count") {
    val rows = queries.Analytic.distinctRunning(spark, sf).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rs) =>
      // rows arrive orderBy(user_id, event_id); re-sort within user by the
      // running value's own order key (ts, event_id) via the is_first trail
      val run = rs.sortBy(_.getAs[Long]("event_id"))
        .map(_.getAs[Long]("distinct_types_so_far"))
      val trueDistinct = rs.map(_.getAs[String]("event_type")).distinct.length.toLong
      assert(run.max == trueDistinct,
        s"final running distinct ${run.max} != true $trueDistinct")
      val firsts = rs.map(_.getAs[Long]("is_first")).sum
      assert(firsts == trueDistinct, "first-occurrence flags != distinct count")
    }
  }

  test("hourly anomalies agree with a float z-score recomputation") {
    val rows = queries.Analytic.hourlyAnomaly(spark, sf).collect()
    assert(rows.map(_.getAs[Boolean]("is_anomaly")).toSet == Set(true, false),
      "anomaly gate is vacuous on this corpus")
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ns = rs.map(_.getAs[Long]("n_events").toDouble)
      val mean = ns.sum / ns.length
      val sigma = math.sqrt(ns.map(n => (n - mean) * (n - mean)).sum / ns.length)
      rs.foreach { r =>
        val n = r.getAs[Long]("n_events").toDouble
        // integer test and float test agree away from the boundary;
        // on the boundary the integer form is the defined semantics
        if (math.abs(math.abs(n - mean) - 2 * sigma) > 1e-6)
          assert(r.getAs[Boolean]("is_anomaly") == (math.abs(n - mean) > 2 * sigma),
            s"type=${r.getString(0)} hour=${r.getLong(1)} n=$n mean=$mean sigma=$sigma")
      }
    }
  }

  test("pattern match: strict funnels, gapped funnels, and error runs on planted sequences") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pattern").toFile
    dir.deleteOnExit()
    import spark.implicits._
    // user 1: v c p v c p adjacent → 2 strict funnels, gapped too
    // user 2: v e c e p → gapped funnel only, max error run 1
    // user 3: e e e s → no funnel, error run 3
    // user 4: p c v → reverse order, nothing matches
    val ev = Seq(
      (1L, "view"), (1L, "click"), (1L, "purchase"),
      (1L, "view"), (1L, "click"), (1L, "purchase"),
      (2L, "view"), (2L, "error"), (2L, "click"), (2L, "error"), (2L, "purchase"),
      (3L, "error"), (3L, "error"), (3L, "error"), (3L, "signup"),
      (4L, "purchase"), (4L, "click"), (4L, "view"))
    ev.zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, 1704067200000000000L + i * 1000000000L, u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
    val got = queries.Analytic.patternMatch(spark, dir.getAbsolutePath).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_strict_funnels"), r.getAs[Long]("has_gap_funnel"),
          r.getAs[Long]("max_error_run"))).toMap
    assert(got == Map(
      1L -> ((2L, 1L, 0L)),
      2L -> ((0L, 1L, 1L)),
      3L -> ((0L, 0L, 3L)),
      4L -> ((0L, 0L, 0L))))
  }

  test("pattern match survives a planted 100k-event whale user with exact counts") {
    // the automaton form must fold a bot/whale user's history through
    // spillable window frames — never one in-memory per-user string.
    // 33,333 adjacent v,c,p cycles then a 7-long error run, exact.
    val dir = java.nio.file.Files.createTempDirectory("graft_whale").toFile
    dir.deleteOnExit()
    spark.range(100006)
      .selectExpr(
        "id AS event_id",
        "1704067200000000000L + id * 1000000000L AS ts",
        "9L AS user_id",
        """CASE WHEN id >= 99999 THEN 'error'
          | WHEN id % 3 = 0 THEN 'view'
          | WHEN id % 3 = 1 THEN 'click'
          | ELSE 'purchase' END AS event_type""".stripMargin,
        "1.0 AS value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
    val r = queries.Analytic.patternMatch(spark, dir.getAbsolutePath).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_events") == 100006L)
    assert(r(0).getAs[Long]("n_strict_funnels") == 33333L)
    assert(r(0).getAs[Long]("has_gap_funnel") == 1L)
    assert(r(0).getAs[Long]("max_error_run") == 7L)
  }

  test("rfm: sharded ntile is bit-identical to the global-window ntile formulation") {
    import org.apache.spark.sql.expressions.Window
    val got = queries.Analytic.rfmSegments(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("r_band"), r.getAs[Long]("f_band"), r.getAs[Long]("m_band")))).toMap
    // reference formulation: the three unpartitioned ntile windows
    val per = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .withColumn("ts_sec", expr("ts div 1000000000"))
      .groupBy("user_id")
      .agg(max("ts_sec").as("last_purchase_sec"),
        count(lit(1)).as("n_purchases"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_spend"))
    val want = per
      .withColumn("r_band", ntile(5).over(
        Window.orderBy(col("last_purchase_sec"), col("user_id"))).cast("bigint"))
      .withColumn("f_band", ntile(5).over(
        Window.orderBy(col("n_purchases"), col("user_id"))).cast("bigint"))
      .withColumn("m_band", ntile(5).over(
        Window.orderBy(col("total_spend"), col("user_id"))).cast("bigint"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("r_band"), r.getAs[Long]("f_band"), r.getAs[Long]("m_band")))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (u, bands) => assert(bands == want(u), s"user $u") }
    // and no unpartitioned window over the USER relation survives in
    // the plan: every Window node's partition spec is non-empty except
    // the bounded nShards-row offset cumsum (which reads a tiny agg)
    val rfmPlan = queries.Analytic.rfmSegments(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!rfmPlan.contains("ntile"), "global ntile windows must be gone")
  }

  test("point-in-time lookup agrees with the SCD2 interval table row-for-row") {
    val scd = queries.Analytic.scd2Intervals(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("version")) ->
        (r.getAs[Long]("valid_from_sec"),
          Option(r.getAs[java.lang.Long]("valid_to_sec")).map(Long2long),
          r.getAs[Double]("value"))).toMap
    val rows = queries.Analytic.pitLookup(spark, sf).collect()
    assert(rows.nonEmpty)
    var matched = 0
    rows.foreach { r =>
      val (u, ts, v) =
        (r.getAs[Long]("user_id"), r.getAs[Long]("ts_sec"), r.getAs[Long]("version"))
      if (v == 0L) {
        assert(r.isNullAt(r.fieldIndex("pit_value")))
        // before the user's first purchase, if any
        scd.get((u, 1L)).foreach { case (from, _, _) => assert(ts < from) }
      } else {
        val (from, to, value) = scd((u, v))
        assert(from <= ts, s"user $u v$v")
        to.foreach(t => assert(ts < t || (ts == t && from == t), s"user $u v$v"))
        assert(r.getAs[Double]("pit_value") == value, s"user $u v$v")
        matched += 1
      }
    }
    assert(matched > 0, "corpus must exercise the covered-interval path")
  }

  test("ewma smoothing: exact dyadic values matching a driver-side replay") {
    val rows = queries.Analytic.ewmaSmooth(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("hour_sec"))
      val counts = ordered.map(_.getAs[Long]("n_events"))
      ordered.zipWithIndex.foreach { case (r, i) =>
        // replay: sum over the 16 trailing observed hours, dyadic weights
        var expect = 0.0
        for (j <- 0 until 16; if i - j >= 0)
          expect += counts(i - j).toDouble / (1L << (j + 1)).toDouble
        val got = r.getAs[Double]("ewma")
        assert(got == expect, s"row $i: $got != $expect")
        // exactness witness: every value is an integer multiple of 2^-16
        assert((got * 65536.0) == math.rint(got * 65536.0))
        assert(r.getAs[Boolean]("is_spike") == (counts(i).toDouble > 4.0 * got))
      }
    }
  }

  test("interval union: equals a brute-force sweep-merge per user") {
    val rows = queries.Analytic.intervalUnion(spark, sf).collect()
    assert(rows.nonEmpty)
    val ivs = graft.sources.Tables.events(spark, sf)
      .selectExpr("user_id", "ts div 1000000000 as s",
        "ts div 1000000000 + (event_id % 541) + 60 as e")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val sorted = ivs(u).map(t => (t._2, t._3)).sortBy(identity)
      // sweep-merge: accumulate disjoint islands
      var (nIslands, union, curS, curE) = (0L, 0L, Long.MinValue, Long.MinValue)
      sorted.foreach { case (s, e) =>
        if (curE == Long.MinValue || s > curE) {
          if (curE != Long.MinValue) union += curE - curS
          nIslands += 1; curS = s; curE = e
        } else curE = math.max(curE, e)
      }
      if (curE != Long.MinValue) union += curE - curS
      assert(r.getAs[Long]("n_islands") == nIslands, s"user $u islands")
      assert(r.getAs[Long]("union_sec") == union, s"user $u union")
    }
  }

  test("ab test: counts partition the users and the z-test replays exactly") {
    val r = queries.Analytic.abTest(spark, sf).collect()(0)
    val (na, ca, nb, cb) = (r.getAs[Long]("n_a"), r.getAs[Long]("c_a"),
      r.getAs[Long]("n_b"), r.getAs[Long]("c_b"))
    val users = graft.sources.Tables.events(spark, sf)
      .selectExpr("user_id").distinct().count()
    assert(na + nb == users && ca <= na && cb <= nb && na > 0 && nb > 0)
    val (bna, bca, bnb, bcb) =
      (BigInt(na), BigInt(ca), BigInt(nb), BigInt(cb))
    val lhs = 25 * (bca * bnb - bcb * bna).pow(2) * (bna + bnb)
    val rhs = 96 * (bca + bcb) * ((bna + bnb) - (bca + bcb)) * bna * bnb
    assert(r.getAs[Boolean]("significant") == (lhs > rhs))
  }

  test("dau/mau and new-vs-returning replay exactly from the user-day relation") {
    val ud = graft.sources.Tables.events(spark, sf)
      .selectExpr("user_id", "ts div 1000000000 div 86400 as day")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = ud.map(_._2).toSet
    val dauMap = ud.groupBy(_._2).view.mapValues(_.length).toMap
    val rows = queries.Analytic.dauMau(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("day")).toSet == days)
    rows.foreach { r =>
      val d = r.getAs[Long]("day")
      val mau = ud.filter { case (_, ad) => ad <= d && ad > d - 30 }
        .map(_._1).distinct.length
      assert(r.getAs[Long]("dau") == dauMap(d).toLong, s"day $d dau")
      assert(r.getAs[Long]("mau") == mau.toLong, s"day $d mau")
      assert(r.getAs[Long]("stickiness_permille") == dauMap(d).toLong * 1000 / mau)
      assert(r.getAs[Long]("mau") >= r.getAs[Long]("dau"))
    }
    val firstDay = ud.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val nvr = queries.Analytic.newVsReturning(spark, sf).collect()
    assert(nvr.map(_.getAs[Long]("day")).toSet == days)
    nvr.foreach { r =>
      val d = r.getAs[Long]("day")
      val onDay = ud.filter(_._2 == d).map(_._1)
      val newU = onDay.count(u => firstDay(u) == d)
      assert(r.getAs[Long]("new_users") == newU.toLong, s"day $d new")
      assert(r.getAs[Long]("returning_users") == (onDay.length - newU).toLong)
      // new + returning partitions that day's DAU
      assert(r.getAs[Long]("new_users") + r.getAs[Long]("returning_users")
        == dauMap(d).toLong)
    }
  }

  test("power users: above-mean cohort replays from per-user counts") {
    val counts = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id").count().collect().map(_.getLong(1))
    val (u, total) = (counts.length.toLong, counts.sum)
    val power = counts.filter(_ * u > total)
    val r = queries.Analytic.powerUsers(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_users") == u)
    assert(r.getAs[Long]("total_events") == total)
    assert(r.getAs[Long]("n_power_users") == power.length.toLong)
    assert(r.getAs[Long]("power_events") == power.sum)
    assert(r.getAs[Long]("user_share_permille") == power.length * 1000L / u)
    assert(r.getAs[Long]("event_share_permille") == power.sum * 1000L / total)
    // concentration: the above-mean cohort carries a super-proportional share
    assert(r.getAs[Long]("event_share_permille") > r.getAs[Long]("user_share_permille"))
  }

  test("funnel latency replays from a driver-side as-of scan") {
    val evs = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "purchase"))
      .selectExpr("event_id", "user_id", "event_type", "ts div 1000000000 as s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val lat = scala.collection.mutable.ArrayBuffer[(Long, Long)]() // (hour, latency)
    evs.groupBy(_._2).foreach { case (_, es) =>
      var lastView = Option.empty[Long]
      es.sortBy(e => (e._4, e._3, e._1)).foreach { case (_, _, t, s) =>
        if (t == "view") lastView = Some(s)
        else lastView.foreach(v => lat += ((s / 3600 % 24, s - v)))
      }
    }
    val exp = lat.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = queries.Analytic.funnelLatency(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("hour_of_day")).toSet == exp.keySet)
    rows.foreach { r =>
      val ls = exp(r.getAs[Long]("hour_of_day"))
      assert(r.getAs[Long]("n_conversions") == ls.length.toLong)
      assert(r.getAs[Long]("min_latency") == ls.min)
      assert(r.getAs[Long]("max_latency") == ls.max)
      assert(r.getAs[Long]("sum_latency") == ls.sum)
      assert(r.getAs[Double]("mean_latency") == ls.sum.toDouble / ls.length)
    }
  }

  test("MAD anomaly: lower medians and outlier counts replay exactly") {
    val hourly = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type", "ts div 1000000000 div 3600 * 3600 as h")
      .groupBy("event_type", "h").count().collect()
      .map(r => (r.getString(0), r.getLong(2))).groupBy(_._1)
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.length - 1) / 2)
    val rows = queries.Analytic.hourlyAnomalyMad(spark, sf).collect()
    assert(rows.map(_.getAs[String]("event_type")).toSet == hourly.keySet)
    rows.foreach { r =>
      val ns = hourly(r.getAs[String]("event_type")).map(_._2).toSeq
      val med = lowerMedian(ns)
      val devs = ns.map(n => math.abs(n - med))
      val mad = lowerMedian(devs)
      assert(r.getAs[Long]("n_hours") == ns.length.toLong)
      assert(r.getAs[Long]("med_hourly") == med)
      assert(r.getAs[Long]("mad_hourly") == mad)
      assert(r.getAs[Long]("n_outlier_hours") == devs.count(_ > 5 * mad).toLong)
    }
  }

  test("peak rate replays from an explicit 5-window expansion") {
    val evs = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type", "ts div 1000000000 as s").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val counts = scala.collection.mutable.Map[(String, Long), Long]()
    evs.foreach { case (t, s) =>
      for (k <- 0 to 4) {
        val w = (s / 60 - k) * 60
        counts((t, w)) = counts.getOrElse((t, w), 0L) + 1
      }
    }
    val rows = queries.Analytic.peakRate(spark, sf).collect()
    assert(rows.map(_.getAs[String]("event_type")).toSet == evs.map(_._1).toSet)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val mine = counts.collect { case ((tt, w), n) if tt == t => (w, n) }
      val peak = mine.map(_._2).max
      assert(r.getAs[Long]("peak_n") == peak)
      assert(r.getAs[Long]("peak_win_start") ==
        mine.collect { case (w, n) if n == peak => w }.min)
    }
  }

  test("type co-occurrence replays from distinct user-hour contexts") {
    val ctx = graft.sources.Tables.events(spark, sf)
      .selectExpr("user_id", "ts div 1000000000 div 3600 as h", "event_type")
      .distinct().collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getString(2)))
    val exp = scala.collection.mutable.Map[(String, String), Long]()
    ctx.groupBy(_._1).values.foreach { ts =>
      val types = ts.map(_._2).sorted
      for (i <- types.indices; j <- i + 1 until types.length)
        exp((types(i), types(j))) = exp.getOrElse((types(i), types(j)), 0L) + 1
    }
    val rows = queries.Analytic.typeCooccurrence(spark, sf).collect()
    val got = rows.map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
      r.getAs[Long]("n_cohours")).toMap
    assert(got == exp.toMap)
  }

  test("trend slope: power sums recomputed independently per type") {
    import org.apache.spark.sql.functions._
    val rows = queries.Analytic.trendSlope(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), expr("ts div 1000000000 div 86400").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n")).collect()
      .groupBy(_.getAs[String]("event_type"))
    rows.foreach { r =>
      val g = daily(r.getAs[String]("event_type"))
        .map(x => (x.getAs[Long]("day"), x.getAs[Long]("n")))
      val m = g.length.toLong
      val (sx, sy) = (g.map(_._1).sum, g.map(_._2).sum)
      val (sxx, sxy) = (g.map(p => p._1 * p._1).sum, g.map(p => p._1 * p._2).sum)
      assert(r.getAs[Long]("m") == m)
      assert(r.getAs[Long]("num") == m * sxy - sx * sy)
      assert(r.getAs[Long]("den") == m * sxx - sx * sx)
      assert(r.getAs[Long]("direction") == (m * sxy - sx * sy).sign)
    }
  }

  test("user lifetime: histogram partitions users and brackets spans") {
    import org.apache.spark.sql.functions._
    val rows = queries.Analytic.userLifetime(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
    assert(rows.map(_.getAs[Long]("n_users")).sum ==
      ev.select("user_id").distinct().count())
    assert(rows.map(_.getAs[Long]("total_events")).sum == ev.count())
    rows.foreach { r =>
      val b = r.getAs[Long]("week_bucket")
      assert(r.getAs[Long]("min_days") >= b * 7)
      assert(r.getAs[Long]("max_days") <= b * 7 + 6)
      assert(r.getAs[Long]("min_days") <= r.getAs[Long]("max_days"))
    }
  }

  test("autocorr: lag pairs and power sums recomputed independently") {
    import org.apache.spark.sql.functions._
    val rows = queries.Analytic.autocorr(spark, sf).collect()
    assert(rows.nonEmpty)
    val hourly = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), expr("ts div 1000000000 div 3600").as("hr"))
      .groupBy("event_type", "hr").agg(count(lit(1)).as("n"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
      .map { case (t, g) =>
        t -> g.map(r => (r.getAs[Long]("hr"), r.getAs[Long]("n")))
          .sortBy(_._1).map(_._2)
      }
    rows.foreach { r =>
      val (t, k) = (r.getAs[String]("event_type"), r.getAs[Long]("lag").toInt)
      val series = hourly(t)
      val pairs = series.dropRight(k).zip(series.drop(k))
      assert(r.getAs[Long]("m") == pairs.length)
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val m = pairs.length.toLong
      assert(r.getAs[Long]("num") == m * sxy - sx * sy)
      val acf = r.getAs[Double]("acf")
      assert(acf >= -1.0 - 1e-9 && acf <= 1.0 + 1e-9)
    }
  }

  test("rolling median: trailing-7 frames recomputed independently per supplier") {
    import org.apache.spark.sql.functions._
    val rows = queries.Analytic.rollingMedian(spark, sf).collect()
    val li = graft.sources.Tables.lineitem(spark, sf)
    assert(rows.length == li.count())
    // replay the frames in Scala: same ordering, interpolated median.
    // Both engines evaluate (1−d)·lower + d·upper — NOT
    // lower + d·(upper−lower), which differs in the last ulp
    def median(vs: Seq[Double]): Double = {
      val s = vs.sorted
      val idx = (s.length - 1) * 0.5
      val lo = idx.toInt
      val d = idx - lo
      if (lo + 1 >= s.length) s(lo)
      else (1 - d) * s(lo) + d * s(lo + 1)
    }
    val bySupp = li.select("l_suppkey", "l_shipdate", "l_orderkey",
        "l_linenumber", "l_extendedprice").collect()
      .map(r => (r.getAs[Long]("l_suppkey"),
        (r.getAs[Any]("l_shipdate").toString,
          r.getAs[Long]("l_orderkey"), r.getAs[Int]("l_linenumber"),
          r.getAs[Double]("l_extendedprice"))))
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sortBy(identity) }
    val got = rows.groupBy(_.getAs[Long]("l_suppkey"))
    bySupp.foreach { case (supp, ordered) =>
      val expMeds = ordered.indices.map { i =>
        median(ordered.slice(math.max(0, i - 6), i + 1).map(_._4))
      }
      // compare as multisets of (order-key, med) — the output rows of
      // one supplier sorted the same way
      // sort by the FULL tuple incl. med: full-duplicate rows may
      // legitimately carry the two frames' medians in either order —
      // the multiset is what the operator pins
      val gotMeds = got(supp)
        .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Int]("l_linenumber"),
          r.getAs[Double]("l_extendedprice"), r.getAs[Double]("med7")))
        .sortBy(identity)
      val expPairs = ordered.zip(expMeds)
        .map { case ((_, ok, ln, px), m) => (ok, ln, px, m) }
        .sortBy(identity)
      assert(gotMeds.toSeq == expPairs.toSeq, s"supplier $supp")
    }
  }

  test("groups frame: domain-collapsed ROWS ±1 equals brute-force GROUPS semantics") {
    val rows = queries.Analytic.winGroupsFrame(spark, sf).collect()
    val base = graft.sources.Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "o_orderstatus",
        "CAST(o_orderdate AS DATE) AS d",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS tp")
      .collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[String]("o_orderstatus"),
        r.getAs[java.sql.Date]("d").toString, r.getAs[Double]("tp")))
    assert(rows.length == base.length)
    // brute force: per status, frame = orders whose date is within one
    // DISTINCT-date step of the row's date
    val byStatus = base.groupBy(_._2)
    val exp: Map[Long, (BigDecimal, Long)] = byStatus.toSeq.flatMap {
      case (_, g) =>
        val dates = g.map(_._3).distinct.sorted
        val idx = dates.zipWithIndex.toMap
        g.toSeq.map { case (ok, _, d, _) =>
          val i = idx(d)
          val frame = g.filter(r => math.abs(idx(r._3) - i) <= 1)
          (ok, (frame.map(r => BigDecimal(r._4)).sum, frame.length.toLong))
        }
    }.toMap
    rows.foreach { r =>
      val ok = r.getAs[Long]("o_orderkey")
      val (es, en) = exp(ok)
      assert(en == r.getAs[Long]("frame_n"), s"order $ok n")
      assert(math.abs(es.toDouble - r.getAs[Double]("frame_sum")) < 1e-6,
        s"order $ok sum")
    }
  }

  test("changepoint: the integer CUSUM argmax replays driver-side") {
    val rows = queries.Analytic.changepoint(spark, sf).collect()
    val daily = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type", "ts div 1000000000 div 86400 AS day")
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val days = daily.collect { case ((`t`, d), n) => (d, n) }.toSeq.sortBy(_._1)
      val tDays = days.length.toLong
      val nTot = days.map(_._2).sum
      var prefix = 0L
      val cs = days.zipWithIndex.map { case ((d, n), i) =>
        prefix += n; (d, tDays * prefix - (i + 1) * nTot)
      }
      val best = cs.maxBy { case (d, c) => (math.abs(c), -d) }
      assert(r.getAs[Long]("t_days") == tDays && r.getAs[Long]("n_total") == nTot)
      assert(r.getAs[Long]("day_hat") == best._1, s"$t day")
      assert(r.getAs[Long]("cusum") == best._2, s"$t cusum")
      val shift = if (best._2 > 0) "drop_after"
        else if (best._2 < 0) "rise_after" else "flat"
      assert(r.getAs[String]("shift") == shift)
    }
  }

  test("bot detect: a planted metronome user flags, a bursty human does not") {
    import spark.implicits._
    // replay the operator's aggregate logic on planted gap patterns
    def judge(gaps: Seq[Long]): (Boolean, Boolean) = {
      val n = gaps.length + 1
      val span = gaps.sum
      val m = gaps.length.toLong
      val sg = gaps.sum
      val sgg = gaps.map(g => BigInt(g) * g).sum
      val fast = n * 3600L > span * 50L
      val regular = 4 * (m * sgg - BigInt(sg) * sg) < BigInt(sg) * sg
      (fast, regular)
    }
    // metronome: 30 events exactly 10s apart -> fast + perfectly regular
    assert(judge(Seq.fill(29)(10L)) == (true, true))
    // bursty human: bursts of 5s separated by hour-long gaps -> not regular
    val bursty = Seq.tabulate(29)(i => if (i % 5 == 4) 3600L else 5L)
    assert(judge(bursty)._2 == false)
    // and the real query agrees with a full driver-side replay
    val rows = queries.Analytic.botDetect(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "ts div 1000000000 AS sec").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"), r.getAs[Long]("sec")))
    val byUser = ev.groupBy(_._1).view
      .mapValues(_.map(t => (t._3, t._2)).sortBy(identity).map(_._1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val secs = byUser(r.getAs[Long]("user_id"))
      val gaps = secs.zip(secs.tail).map { case (a, b) => b - a }
      assert(r.getAs[Long]("n_events") == secs.length)
      val (f, reg) = judge(gaps)
      assert(r.getAs[Boolean]("fast") == f && r.getAs[Boolean]("regular") == reg)
      assert(r.getAs[Boolean]("is_bot") == (f && reg))
    }
  }

  test("revenue bridge: categories partition users and deltas sum to the total") {
    val rows = queries.Analytic.revenueBridge(spark, sf).collect()
    val rev = graft.sources.Tables.events(spark, sf)
      .filter("event_type = 'purchase'")
      .selectExpr("user_id", "ts div 1000000000 div 86400 div 7 AS wk",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c")
      .collect().map(r => ((r.getAs[Long]("user_id"), r.getAs[Long]("wk")),
        r.getAs[Long]("c")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val w0 = rev.keys.map(_._2).min
    val a = rev.collect { case ((u, w), v) if w == w0 + 1 => u -> v }.toMap
    val b = rev.collect { case ((u, w), v) if w == w0 + 2 => u -> v }.toMap
    val users = a.keySet ++ b.keySet
    assert(rows.map(_.getAs[Long]("n_users")).sum == users.size)
    // the bridge identity: category deltas reassemble the WoW delta
    assert(rows.map(_.getAs[Long]("delta_cents")).sum ==
      b.values.sum - a.values.sum)
    val got = rows.map(r => r.getAs[String]("category") ->
      r.getAs[Long]("n_users")).toMap
    assert(got.getOrElse("new", 0L) == users.count(u => !a.contains(u)))
    assert(got.getOrElse("churned", 0L) == users.count(u => !b.contains(u)))
    assert(got.getOrElse("expansion", 0L) ==
      users.count(u => a.contains(u) && b.contains(u) && b(u) > a(u)))
  }

  test("markov stationary: three integer power rounds replay driver-side") {
    val rows = queries.Analytic.markovStationary(spark, sf).collect()
      .map(r => r.getAs[String]("state") -> r.getAs[Long]("v_ppm")).toMap
    val ev = graft.sources.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type", "ts div 1000000000 AS sec")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("sec")))
    val trans = ev.groupBy(_._1).values.flatMap { g =>
      val seq = g.sortBy(t => (t._4, t._2)).map(_._3)
      seq.zip(seq.tail)
    }.toSeq
    val n = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nFrom = trans.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val states = (trans.map(_._1) ++ trans.map(_._2)).distinct.sorted
    var v: Map[String, Long] = states.map(_ -> 1000000L / states.length).toMap
    for (_ <- 1 to 3) {
      v = states.map { to =>
        to -> states.flatMap { from =>
          n.get((from, to)).flatMap(c => v.get(from).map(_ * c / nFrom(from)))
        }.sum
      }.toMap
    }
    assert(rows.keySet == states.toSet)
    states.foreach(s => assert(rows(s) == v(s), s"state $s: ${rows(s)} vs ${v(s)}"))
    // mass conservation modulo floor leakage: within k ppm per round
    val mass = rows.values.sum
    assert(mass <= 1000000L && mass > 1000000L - 3 * 5 * states.length)
  }

  test("burn rate: calendar-true trailing sums and the two-window page rule") {
    val rows = queries.Analytic.burnRate(spark, sf).collect()
    val bk = graft.sources.Tables.events(spark, sf)
      .selectExpr("ts div 1000000000 div 300 AS b",
        "CAST(event_type = 'error' AS LONG) AS e")
      .collect().map(r => (r.getAs[Long]("b"), r.getAs[Long]("e")))
      .groupBy(_._1).view.mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    assert(rows.length == bk.size)
    var pages = 0
    rows.foreach { r =>
      val b = r.getAs[Long]("b")
      val (t, e) = bk(b)
      assert(r.getAs[Long]("n_total") == t && r.getAs[Long]("n_err") == e)
      // trailing 12 calendar buckets, missing = zero
      val trail = (0L to 11L).flatMap(i => bk.get(b - i))
      assert(r.getAs[Long]("slow_total") == trail.map(_._1).sum, s"bucket $b slow_total")
      assert(r.getAs[Long]("slow_err") == trail.map(_._2).sum, s"bucket $b slow_err")
      val fast = e * 10 > t * 3
      val slow = trail.map(_._2).sum * 10 > trail.map(_._1).sum * 3
      assert(r.getAs[Boolean]("page") == (fast && slow), s"bucket $b page")
      if (fast && slow) pages += 1
    }
    // the gate distinguishes: some buckets page, most do not
    assert(pages > 0 && pages < rows.length)
  }

  test("interval union, concurrency, bot detect survive a planted 100k-event whale") {
    // the ev_pattern_match whale discipline applied to the three
    // remaining per-user sweeps: their per-user window partitions are
    // spillable sorts, and this fixture makes one user's partition
    // hold 100k rows so the spill path is exercised, not assumed.
    // user 9 = the whale (100k events, 1 s apart — one session
    // spanning ~28 h, constant gaps ⇒ metronome bot); user 1 = a
    // slow human (30 events, 1 h apart — regular but NOT fast);
    // user 2 = a metronome burst (25 events, 7 s apart ⇒ bot).
    val dir = java.nio.file.Files.createTempDirectory("graft_whale3").toFile
    dir.deleteOnExit()
    val t0 = 1704067200L
    import spark.implicits._
    spark.range(100055)
      .selectExpr(
        "id AS event_id",
        s"""CASE WHEN id < 100000 THEN ${t0}L + id
           | WHEN id < 100030 THEN ${t0}L + (id - 100000) * 3600
           | ELSE ${t0}L + (id - 100030) * 7 END * 1000000000 AS ts""".stripMargin,
        "CASE WHEN id < 100000 THEN 9L WHEN id < 100030 THEN 1L ELSE 2L END AS user_id",
        "'view' AS event_type", "1.0 AS value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
    val ev = spark.read.parquet(s"${dir.getAbsolutePath}/events.parquet")
      .selectExpr("user_id", "event_id", "ts div 1000000000 AS sec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // ---- interval union: brute-force sweep-merge per user ----
    val gotIu = queries.Analytic.intervalUnion(spark, dir.getAbsolutePath)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_islands"), r.getAs[Long]("union_sec")))).toMap
    val expIu = ev.groupBy(_._1).map { case (u, g) =>
      val sorted = g.map(t => (t._3, t._3 + (t._2 % 541) + 60)).sortBy(identity)
      var (n, union, curS, curE) = (0L, 0L, Long.MinValue, Long.MinValue)
      sorted.foreach { case (s, e) =>
        if (curE == Long.MinValue || s > curE) {
          if (curE != Long.MinValue) union += curE - curS
          n += 1; curS = s; curE = e
        } else curE = math.max(curE, e)
      }
      union += curE - curS
      u -> ((n, union))
    }
    assert(gotIu == expIu, s"got=$gotIu exp=$expIu")

    // ---- concurrency: minute-sweep simulation ----
    val sessions = ev.groupBy(_._1).values.flatMap { g =>
      val sorted = g.map(t => (t._3, t._2)).sortBy(identity)
      val buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var start = sorted.head._1; var prev = sorted.head._1
      for ((s, _) <- sorted.tail) {
        if (s - prev > 1800) { buf += ((start, prev)); start = s }
        prev = s
      }
      buf += ((start, prev)); buf
    }.toSeq.map { case (s, e) => (s / 60, e / 60) }
    val deltas = scala.collection.mutable.TreeMap[Long, Long]()
    sessions.foreach { case (ms, me) =>
      deltas(ms) = deltas.getOrElse(ms, 0L) + 1
      deltas(me + 1) = deltas.getOrElse(me + 1, 0L) - 1
    }
    var run = 0L
    val concSim = deltas.toSeq.map { case (m, d) => run += d; (m, run) }
    val expPeaks = concSim.groupBy(_._1 / 1440).view.mapValues { g =>
      val best = g.maxBy(x => (x._2, -x._1)); (best._2, best._1)
    }.toMap
    val gotConc = queries.Analytic.concurrency(spark, dir.getAbsolutePath).collect()
    assert(gotConc.length == expPeaks.size)
    gotConc.foreach { r =>
      val d = r.getAs[Long]("day")
      assert((r.getAs[Long]("peak_conc"), r.getAs[Long]("peak_minute")) ==
        expPeaks(d), s"day $d")
    }
    // the whale's single 28 h session spans a day boundary: the
    // carry must keep concurrency ≥ 1 on the second day
    assert(gotConc.length >= 2 && gotConc.forall(_.getAs[Long]("peak_conc") >= 1L))

    // ---- bot detect: the whale IS a metronome bot at 100k scale ----
    val gotBot = queries.Analytic.botDetect(spark, dir.getAbsolutePath)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Boolean]("fast"), r.getAs[Boolean]("regular"),
          r.getAs[Boolean]("is_bot")))).toMap
    // user 9: 100k events over 99999 s — fast AND zero-variance gaps
    assert(gotBot(9L) == ((true, true, true)))
    // user 1: perfectly regular but 1/hour — never fast, never a bot
    assert(gotBot(1L) == ((false, true, false)))
    // user 2: 7 s metronome — classic scraper
    assert(gotBot(2L) == ((true, true, true)))
  }

  test("concurrency: sweep peaks replay from a driver-side simulation") {
    val rows = queries.Analytic.concurrency(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "ts div 1000000000 AS sec")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("sec")))
    // sessionize: per user sort by (sec, event_id), split at >1800s gaps
    val sessions = ev.groupBy(_._1).values.flatMap { g =>
      val sorted = g.map(t => (t._3, t._2)).sortBy(identity)
      val buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var start = sorted.head._1; var prev = sorted.head._1
      for ((s, _) <- sorted.tail) {
        if (s - prev > 1800) { buf += ((start, prev)); start = s }
        prev = s
      }
      buf += ((start, prev)); buf
    }.toSeq.map { case (s, e) => (s / 60, e / 60) }
    // sweep over minute deltas
    val deltas = scala.collection.mutable.TreeMap[Long, Long]()
    sessions.foreach { case (ms, me) =>
      deltas(ms) = deltas.getOrElse(ms, 0L) + 1
      deltas(me + 1) = deltas.getOrElse(me + 1, 0L) - 1
    }
    var run = 0L
    val conc = deltas.toSeq.map { case (m, d) => run += d; (m, run) }
    val expPeaks = conc.groupBy(_._1 / 1440).view.mapValues { g =>
      val best = g.maxBy(x => (x._2, -x._1)); (best._2, best._1)
    }.toMap
    val expStarts = sessions.groupBy(_._1 / 1440).view.mapValues(_.size.toLong).toMap
    assert(rows.length == expPeaks.size)
    rows.foreach { r =>
      val d = r.getAs[Long]("day")
      assert((r.getAs[Long]("peak_conc"), r.getAs[Long]("peak_minute")) ==
        expPeaks(d), s"day $d peak")
      assert(r.getAs[Long]("n_starts") == expStarts.getOrElse(d, 0L), s"day $d starts")
    }
  }

  test("exclude current row: peer sums replay as frame sum minus self") {
    val rows = queries.Analytic.winExcludeCurrent(spark, sf).collect()
    val bySupp = graft.sources.Tables.lineitem(spark, sf)
      .selectExpr("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS p")
      .collect()
      .map(r => (r.getAs[Long]("l_suppkey"),
        (r.getAs[Any]("l_shipdate").toString, r.getAs[Long]("l_orderkey"),
          r.getAs[Int]("l_linenumber"), r.getAs[Double]("p"))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(identity)).toMap
    val got = rows.groupBy(_.getAs[Long]("l_suppkey"))
    bySupp.foreach { case (supp, ordered) =>
      val exp = ordered.indices.map { i =>
        val frame = ordered.slice(math.max(0, i - 3), i + 4)
        val n = frame.length - 1L
        val s = if (n > 0)
          Some(frame.map(x => BigDecimal(x._4)).sum - BigDecimal(ordered(i)._4))
        else None
        (ordered(i)._2, ordered(i)._3, ordered(i)._4, n, s)
      }
      // multiset compare (full-duplicate rows may swap frames; the
      // rolling-median ordering argument)
      val gotSet = got(supp).map(r => (r.getAs[Long]("l_orderkey"),
        r.getAs[Int]("l_linenumber"), r.getAs[Double]("l_extendedprice"),
        r.getAs[Long]("peer_n"),
        Option(r.getAs[java.lang.Double]("peer_sum")).map(v => BigDecimal(v))))
        .sortBy(x => (x._1, x._2, x._3, x._4))
      val expSet = exp.sortBy(x => (x._1, x._2, x._3, x._4))
      assert(gotSet.toSeq == expSet.toSeq, s"supplier $supp")
    }
  }

  test("linear interpolation: gap rows replay the exact two-point formula") {
    val rows = queries.Analytic.interpolateLinear(spark, sf).collect()
    val daily = graft.sources.Tables.events(spark, sf)
      .filter("value > 200")
      .selectExpr("event_type", "ts div 1000000000 div 86400 AS day",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c")
      .collect()
      .map(r => ((r.getAs[String]("event_type"), r.getAs[Long]("day")), r.getAs[Long]("c")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(rows.nonEmpty)
    var gaps = 0
    rows.foreach { r =>
      val t = r.getAs[String]("event_type"); val d = r.getAs[Long]("day")
      daily.get((t, d)) match {
        case Some(c) =>
          assert(!r.getAs[Boolean]("is_gap"))
          assert(r.getAs[Long]("cents") == c)
          assert(r.getAs[Long]("interp_num") == c && r.getAs[Long]("interp_den") == 1L)
        case None =>
          gaps += 1
          assert(r.getAs[Boolean]("is_gap"))
          val obsDays = daily.keys.filter(_._1 == t).map(_._2)
          val pd = obsDays.filter(_ < d).max; val nd = obsDays.filter(_ > d).min
          val pv = daily((t, pd)); val nv = daily((t, nd))
          assert(r.getAs[Long]("interp_num") == pv * (nd - d) + nv * (d - pd), s"$t $d num")
          assert(r.getAs[Long]("interp_den") == nd - pd, s"$t $d den")
          assert(r.getAs[Double]("value_interp") ==
            r.getAs[Long]("interp_num").toDouble / r.getAs[Long]("interp_den").toDouble / 100.0)
      }
    }
    assert(gaps > 0, "test slice produced no gaps — the interpolation path went unexercised")
  }

  test("forecast backtest: lag joins, micro-MAE, and winner replay from day counts") {
    val rows = queries.Analytic.forecastNaive(spark, sf).collect()
    val counts = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type", "ts div 1000000000 div 86400 AS day")
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val types = counts.keys.map(_._1).toSeq.distinct
    assert(rows.map(_.getAs[String]("event_type")).toSeq.sorted == types.sorted)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val days = counts.collect { case ((`t`, d), n) => d -> n }
      def lagScore(k: Long): Option[(Long, Long)] = {
        val pairs = days.toSeq.flatMap { case (d, n) =>
          days.get(d - k).map(p => math.abs(n - p)) }
        if (pairs.isEmpty) None else Some((pairs.length.toLong, pairs.sum))
      }
      assert(r.getAs[Long]("n_days") == days.size)
      assert(r.getAs[Long]("n_events") == days.values.sum)
      (lagScore(1), lagScore(7)) match {
        case (Some((c1, e1)), Some((c7, e7))) =>
          assert(r.getAs[Long]("n_scored_1") == c1 && r.getAs[Long]("abs_err_1") == e1)
          assert(r.getAs[Long]("n_scored_7") == c7 && r.getAs[Long]("abs_err_7") == e7)
          assert(r.getAs[Long]("mae1_micro") == e1 * 1000000L / c1)
          assert(r.getAs[Long]("mae7_micro") == e7 * 1000000L / c7)
          assert(r.getAs[Boolean]("weekly_better") == (e7 * c1 < e1 * c7))
        case _ => // absent lag pairs surface as nulls; nothing to pin
      }
    }
  }

  test("seasonal dow: profile counts, ppm deviation, and unique peak per type") {
    val rows = queries.Analytic.seasonalDow(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type", "((ts div 1000000000 div 86400) + 3) % 7 AS dow")
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("dow")))
    val counts = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val totals = ev.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(rows.length == counts.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[Long]("dow"))
      val n = counts(k); val t = totals(k._1)
      assert(r.getAs[Long]("n_events") == n, s"$k n")
      assert(r.getAs[Long]("dev_ppm") == (7 * n - t) * 1000000L / t, s"$k ppm")
      assert(r.getAs[Long]("dow") >= 0 && r.getAs[Long]("dow") <= 6)
    }
    // exactly one peak per type, and it carries the type's max count
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, g) =>
      val peaks = g.filter(_.getAs[Boolean]("is_peak"))
      assert(peaks.length == 1, s"$t peaks")
      assert(peaks.head.getAs[Long]("n_events") ==
        g.map(_.getAs[Long]("n_events")).max, s"$t peak count")
    }
  }

  test("survival curve: KM accounting identities and the exact recursion replay") {
    import org.apache.spark.sql.functions._
    val rows = queries.Analytic.survivalCurve(spark, sf).collect()
      .sortBy(_.getAs[Long]("tenure_days"))
    assert(rows.nonEmpty)
    val nUsers = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    // spine starts at tenure 0 with the full population at risk
    assert(rows.head.getAs[Long]("tenure_days") == 0L)
    assert(rows.head.getAs[Long]("n_risk") == nUsers)
    // every user exits exactly once (churn or censoring)
    assert(rows.map(r => r.getAs[Long]("n_churn") +
      r.getAs[Long]("n_censored")).sum == nUsers)
    // risk set decreases by the previous tenure's exits
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("tenure_days") == a.getAs[Long]("tenure_days") + 1)
      assert(b.getAs[Long]("n_risk") == a.getAs[Long]("n_risk") -
        a.getAs[Long]("n_churn") - a.getAs[Long]("n_censored"))
    }
    // replay the integer fixed-point recursion exactly
    var s = 1000000L
    rows.foreach { r =>
      val n = r.getAs[Long]("n_risk"); val d = r.getAs[Long]("n_churn")
      s = s * (n - d) / n
      assert(r.getAs[Long]("s_micro") == s, s"tenure ${r.getAs[Long]("tenure_days")}")
    }
    // censoring must be present (otherwise KM degenerates to the CDF)
    assert(rows.map(_.getAs[Long]("n_censored")).sum > 0)
  }

  test("attribution removal: probabilities bounded, severing only hurts") {
    val rows = queries.Analytic.attributionRemoval(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val base = r.getAs[Long]("p_base_micro")
      val rem = r.getAs[Long]("p_removed_micro")
      val ppm = r.getAs[Long]("removal_ppm")
      assert(base > 0 && base <= 1000000L)
      // severing a channel can only remove conversion probability
      assert(rem >= 0 && rem <= base, r.toString)
      assert(ppm == (base - rem) * 1000000L / base, r.toString)
    }
    // one row per non-purchase event type
    val types = graft.sources.Tables.events(spark, sf)
      .select("event_type").distinct().collect()
      .map(_.getString(0)).filter(_ != "purchase").toSet
    assert(rows.map(_.getAs[String]("channel")).toSet == types)
  }

  test("seasonal adjustment is mean-preserving per type") {
    val rows = queries.Analytic.seasonalAdjust(spark, sf).collect()
    assert(rows.nonEmpty)
    // sum over days of (n - mean_dow + mean_all) telescopes back to
    // sum(n): the adjustment moves mass between days, never creates
    // it. Truncation slack <= 1 milli per row.
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, g) =>
      val raw = g.map(_.getAs[Long]("n")).sum * 1000L
      val adj = g.map(_.getAs[Long]("adjusted_milli")).sum
      assert(math.abs(adj - raw) <= g.length, s"$t: adj=$adj raw=$raw")
    }
  }
}
