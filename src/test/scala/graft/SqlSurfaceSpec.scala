package graft

import org.apache.spark.sql.functions._

class SqlSurfaceSpec extends SparkSpec {

  test("lateral top-n equals the window-ranked top-2 per customer") {
    import org.apache.spark.sql.expressions.Window
    val got = queries.SqlSurface.lateralTopN(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = graft.sources.Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("count-min estimates honor both sketch bounds on every probe key") {
    val rows = queries.SqlSurface.countMin(spark, sf).collect()
    // probe keys present at this SF (sf0.001 ships no suppkey 10)
    val present = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_suppkey").between(1, 10))
      .select("l_suppkey").distinct().count()
    assert(rows.length == present && present >= 9)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("never_undercounts"), r.toString)
      assert(r.getAs[Boolean]("within_eps_bound"), r.toString)
      assert(r.getAs[Long]("exact_n") > 0)
    }
  }

  test("earliest order: one row per customer with an order") {
    val df = queries.SqlSurface.earliestOrder(spark, sf)
    val custs = graft.sources.Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(df.count() == custs)
  }

  test("rollup emits detail + subtotal + grand-total rows") {
    val rows = queries.SqlSurface.rollupAgg(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val liCount = graft.sources.Tables.lineitem(spark, sf).count()
    assert(grand(0).getAs[Long]("n_rows") == liCount)
    // flag-level subtotals sum to the grand total
    val flagSubs = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(flagSubs.map(_.getAs[Long]("n_rows")).sum == liCount)
  }

  test("grouping sets: per-flag, per-status, and grand-total rows with correct markers") {
    val rows = queries.SqlSurface.groupingSets(spark, sf).collect()
    val byMarker = rows.groupBy(r => (r.getAs[Long]("g_flag"), r.getAs[Long]("g_status")))
    // (0,1): per-returnflag rows; (1,0): per-linestatus; (1,1): grand total
    assert(byMarker((0L, 1L)).length == 3)
    assert(byMarker((1L, 0L)).length == 2)
    assert(byMarker((1L, 1L)).length == 1)
    val total = graft.sources.Tables.lineitem(spark, sf).count()
    assert(byMarker((1L, 1L)).head.getAs[Long]("n_rows") == total)
    assert(byMarker((0L, 1L)).map(_.getAs[Long]("n_rows")).sum == total)
  }

  test("cube emits all four grouping-set combinations that reconcile to the total") {
    val rows = queries.SqlSurface.cubeAgg(spark, sf).collect()
    val byMarker = rows.groupBy(r => (r.getAs[Long]("g_status"), r.getAs[Long]("g_priority")))
    val total = graft.sources.Tables.orders(spark, sf).count()
    // (0,0) detail, (0,1) per-status, (1,0) per-priority, (1,1) grand
    assert(byMarker.keySet == Set((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)))
    assert(byMarker((1L, 1L)).head.getAs[Long]("n_orders") == total)
    assert(byMarker((0L, 1L)).map(_.getAs[Long]("n_orders")).sum == total)
    assert(byMarker((1L, 0L)).map(_.getAs[Long]("n_orders")).sum == total)
    assert(byMarker((0L, 0L)).map(_.getAs[Long]("n_orders")).sum == total)
  }

  test("full outer join surfaces dangling rows on BOTH sides") {
    val rows = queries.SqlSurface.fullOuter(spark, sf).collect()
    // right-dangling: dropped customers whose orders survive
    val noCust = rows.filter(_.getAs[String]("segment") == "(no-customer)")
    assert(noCust.nonEmpty && noCust.forall(_.getAs[Long]("n_orders") > 0))
    // left-dangling: kept customers with no orders at all
    assert(rows.exists(r =>
      r.getAs[String]("segment") != "(no-customer)" && r.getAs[Long]("n_orders") == 0))
    // nothing lost: every surviving customer and every order group appears
    import org.apache.spark.sql.functions._
    val keptCusts = graft.sources.Tables.customer(spark, sf)
      .filter(col("c_custkey") % 3 =!= 0).count()
    val droppedWithUrgent = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_custkey") % 3 === 0 && col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().count()
    assert(rows.length == keptCusts + droppedWithUrgent)
  }

  test("exact percentiles are ordered and bounded by the group's min/max") {
    val rows = queries.SqlSurface.percentileExact(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (p25, p50, p90) = (r.getAs[Double]("p25_qty"),
        r.getAs[Double]("p50_qty"), r.getAs[Double]("p90_qty"))
      assert(p25 <= p50 && p50 <= p90, s"$p25 $p50 $p90")
      assert(p25 >= 1.0 && p90 <= 50.0)
    }
  }

  test("set ops partition 1996 buyers into both/only segments") {
    val rows = queries.SqlSurface.setOps(spark, sf).collect()
    val seg = rows.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    val b96 = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .select("o_custkey").distinct().count()
    assert(seg.getOrElse("both", 0) + seg.getOrElse("only_1996", 0) == b96)
  }

  test("partitioned sink read prunes partitions in the plan") {
    // materialize the partitioned layout, then inspect the read plan
    queries.SqlSurface.partitionedSink(spark, sf).count()
    val path = queries.SourcesSinks.tmp(spark, sf, "events_parts")
    val plan = queries.SqlSurface.partitionPrunedRead(spark, path)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("event_type"), plan)
  }

  test("approx aggregates report exact NDVs and in-bound sketches") {
    val r = queries.SqlSurface.approxStats(spark, sf).collect()(0)
    val li = graft.sources.Tables.lineitem(spark, sf)
    assert(r.getAs[Long]("exact_ndv_partkey") == li.select("l_partkey").distinct().count())
    assert(r.getAs[Long]("exact_ndv_orderkey") == li.select("l_orderkey").distinct().count())
    assert(r.getAs[Boolean]("ndv_partkey_within_bound"))
    assert(r.getAs[Boolean]("ndv_orderkey_within_bound"))
    assert(r.getAs[Boolean]("median_within_bound"))
  }

  test("sketch merge: sharded partial sketches union to the global estimate") {
    val r = queries.SqlSurface.sketchMerge(spark, sf).collect()(0)
    assert(r.getAs[Long]("exact_ndv") ==
      graft.sources.Tables.lineitem(spark, sf).select("l_orderkey").distinct().count())
    assert(r.getAs[Boolean]("merged_within_bound"))
    assert(r.getAs[Boolean]("direct_within_bound"))
    assert(r.getAs[Boolean]("merge_consistent"))
  }

  test("retention: every user appears in their cohort's offset-0 cell") {
    val rows = queries.Analytic.retention(spark, sf).collect()
    val offset0 = rows.filter(_.getAs[Long]("week_offset") == 0)
      .map(_.getAs[Long]("n_users")).sum
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(offset0 == users)
    // retention never exceeds the cohort size
    val byCohort = rows.groupBy(_.getAs[Long]("cohort_week"))
    byCohort.foreach { case (_, rs) =>
      val base = rs.find(_.getAs[Long]("week_offset") == 0).get.getAs[Long]("n_users")
      rs.foreach(r => assert(r.getAs[Long]("n_users") <= base))
    }
  }

  test("q21: sole-late suppliers have positive wait counts") {
    val rows = queries.Tpch.q21(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("numwait") >= 1))
  }

  test("json props stats cover every event type") {
    val rows = queries.SqlSurface.jsonProps(spark, sf).collect()
    assert(rows.map(_.getAs[String]("event_type")).toSet ==
      Set("click", "error", "purchase", "signup", "view"))
    rows.foreach(r => assert(r.getAs[Long]("min_k") <= r.getAs[Long]("max_k")))
  }

  test("variant extraction agrees with get_json_object and nulls the bad paths") {
    val rows = queries.SqlSurface.jsonVariant(spark, sf).collect()
    assert(rows.map(_.getAs[String]("etype")).toSet ==
      Set("click", "error", "purchase", "signup", "view"))
    // a type-mismatched path and a missing path must BOTH be null for
    // every row — the counts of non-nulls pin that to zero
    rows.foreach { r =>
      assert(r.getAs[Long]("n_badcast") == 0L)
      assert(r.getAs[Long]("n_absent") == 0L)
    }
    // the variant path reads the same numbers the string path does
    val viaString = queries.SqlSurface.jsonProps(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("sum_k")).toMap
    rows.foreach(r =>
      assert(r.getAs[Long]("sum_k") == viaString(r.getAs[String]("etype"))))
  }

  test("listagg strings are sorted and sized to their groups") {
    val rows = queries.SqlSurface.listAgg(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val nations = r.getAs[String]("nations").split(",")
      assert(nations.length == r.getAs[Long]("n_nations"))
      assert(nations.sorted.sameElements(nations))
      val segs = r.getAs[String]("segments").split(",")
      assert(segs.distinct.length == segs.length && segs.sorted.sameElements(segs))
    }
  }

  test("multi-distinct NDVs match independently computed distinct counts") {
    val rows = queries.SqlSurface.multiDistinct(spark, sf).collect()
    val li = graft.sources.Tables.lineitem(spark, sf)
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val sub = li.filter(col("l_returnflag") === flag)
      assert(r.getAs[Long]("ndv_supp") == sub.select("l_suppkey").distinct().count())
      assert(r.getAs[Long]("ndv_part") == sub.select("l_partkey").distinct().count())
      assert(r.getAs[Long]("n_rows") == sub.count())
    }
  }

  test("unpivot emits one long row per (status, metric) that reconciles to the wide sums") {
    val rows = queries.SqlSurface.unpivotRevenue(spark, sf).collect()
    assert(rows.length == 9) // 3 statuses × 3 metric columns
    assert(rows.map(_.getAs[String]("prio_class")).toSet ==
      Set("rev_urgent", "rev_high", "rev_other"))
    val totalLong = rows.map(_.getAs[Double]("revenue")).sum
    val totalWide = graft.sources.Tables.orders(spark, sf)
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
      .collect()(0).getDouble(0)
    assert(math.abs(totalLong - totalWide) < 1e-6)
  }

  test("exact correlation agrees with the built-in and a driver recomputation") {
    val rows = queries.SqlSurface.corrExact(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("builtin_agrees"),
        s"flag=${r.getAs[String]("l_returnflag")}")
      val c = r.getAs[Double]("corr_exact")
      assert(c >= -1.0 && c <= 1.0)
      assert(r.getAs[Double]("stddev_pop_price") > 0)
    }
    // driver-side recomputation for one group pins the closed form
    val li = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "A")
      .select(col("l_quantity").cast("bigint"),
        col("l_extendedprice").cast("decimal(18,2)").multiply(lit(100)).cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = li.length.toDouble
    val (sx, sy) = (li.map(_._1).sum.toDouble, li.map(_._2).sum.toDouble)
    val sxx = li.map(p => p._1 * p._1).sum.toDouble
    val syy = li.map(p => p._2 * p._2).sum.toDouble
    val sxy = li.map(p => p._1 * p._2).sum.toDouble
    val want = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val gotA = rows.find(_.getAs[String]("l_returnflag") == "A").get
      .getAs[Double]("corr_exact")
    assert(math.abs(gotA - want) < 1e-12, s"got=$gotA want=$want")
  }

  test("recursive CTE depths equal floor(log2(custkey)) per customer") {
    val rows = queries.SqlSurface.recursiveCte(spark, sf).collect()
      .map(r => r.getAs[Long]("depth") -> r.getAs[Long]("n_customers")).toMap
    val keys = graft.sources.Tables.customer(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0))
    // depth = halvings until node <= 1: 0 for keys 0 and 1, else floor(log2)
    val want = keys
      .groupBy(k => if (k <= 1) 0L else (63 - java.lang.Long.numberOfLeadingZeros(k)).toLong)
      .map { case (d, ks) => d -> ks.length.toLong }
    assert(rows == want, s"got=$rows want=$want")
  }

  test("as-of attribution matches a brute-force per-purchase lookup") {
    val got = queries.Analytic.asofAttribution(spark, sf).limit(20).collect()
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000000000").as("ts_sec")).collect()
    val clicks = ev.filter(_.getAs[String]("event_type") == "click")
      .groupBy(_.getAs[Long]("user_id"))
    got.foreach { r =>
      val want = clicks.getOrElse(r.getAs[Long]("user_id"), Array.empty)
        .map(_.getAs[Long]("ts_sec")).filter(_ <= r.getAs[Long]("ts_sec"))
      if (want.nonEmpty)
        assert(r.getAs[Long]("last_click_sec") == want.max)
      else assert(r.isNullAt(r.fieldIndex("last_click_sec")))
    }
  }

  test("correlated subqueries decorrelate into joins and agree with direct aggs") {
    val df = queries.SqlSurface.correlatedSubquery(spark, sf)
    // Catalyst must rewrite all four subqueries into joins — a plan
    // that still evaluates per-row subqueries would be a driver loop
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Subquery"), plan.take(2000))
    val rows = df.collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val byCust = graft.sources.Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), max("o_totalprice").as("mx"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("urgent"),
        sum(when(col("o_totalprice") < 5000, 1).otherwise(0)).as("cheap"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toMap
    val returned = rows.map(_.getAs[Long]("c_custkey")).toSet
    rows.foreach { r =>
      val (n, mx, urgent, cheap) = byCust(r.getAs[Long]("c_custkey"))
      assert(r.getAs[Long]("n_orders") == n)
      assert(r.getAs[Double]("max_price") == mx)
      assert(urgent >= 1 && cheap == 0)
    }
    // and no qualifying customer is missing
    byCust.foreach { case (ck, (_, _, urgent, cheap)) =>
      if (urgent >= 1 && cheap == 0) assert(returned(ck), s"missing custkey $ck")
    }
  }

  test("heavy hitters: guaranteed region nonempty, all promises hold") {
    val rows = queries.SqlSurface.heavyHitters(spark, sf).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(_.getAs[Long]("key"))
    // the lowest-set-bit key space is powers of two; the two heaviest
    // (~50% and ~25% mass) must clear the 1/9 threshold at any sf
    keys.foreach(k => assert((k & (k - 1)) == 0L && k > 0L))
    assert(keys.contains(1L) && keys.contains(2L))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("in_summary"), s"key ${r.get(0)} evicted")
      assert(r.getAs[Boolean]("est_le_exact"))
      assert(r.getAs[Boolean]("err_bounded"))
    }
  }

  test("weighted median: half the character mass sits at or below it, less below it") {
    val rows = queries.SqlSurface.weightedMedian(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.sources.Tables.documents(spark, sf)
      .selectExpr("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val med = r.getAs[Long]("mass_median_len")
      val lens = docs(lang).map(_._2)
      val total = lens.sum
      assert(r.getAs[Long]("total_mass") == total)
      assert(r.getAs[Long]("n_docs") == lens.length)
      val atOrBelow = lens.filter(_ <= med).sum
      val strictlyBelow = lens.filter(_ < med).sum
      assert(2 * atOrBelow >= total, s"$lang: median too low")
      assert(2 * strictlyBelow < total, s"$lang: median too high")
    }
  }

  test("bag set ops: multiplicities are min / clamped difference of yearly counts") {
    def counts(y: Int) = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit(s"$y-01-01") &&
        col("o_orderdate") < lit(s"${y + 1}-01-01"))
      .groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (c96, c97) = (counts(1996), counts(1997))
    val rows = queries.SqlSurface.setOpsAll(spark, sf).collect()
    assert(rows.nonEmpty)
    val got = rows.map(r => (r.getAs[String]("segment"),
      r.getAs[Long]("o_custkey")) -> r.getAs[Long]("multiplicity")).toMap
    val expInter = for ((k, n) <- c96; m <- c97.get(k))
      yield ("intersect_all", k) -> math.min(n, m)
    val expExc = for ((k, n) <- c96; d = n - c96.get(k).flatMap(_ => c97.get(k)).getOrElse(0L); if d > 0)
      yield ("except_all", k) -> d
    assert(got == (expInter ++ expExc).toMap)
  }

  test("FILTER-clause aggregates equal their separately-filtered twins") {
    val rows = queries.SqlSurface.filterClause(spark, sf).collect()
    assert(rows.nonEmpty)
    val li = graft.sources.Tables.lineitem(spark, sf)
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val base = li.filter(col("l_returnflag") === flag)
      assert(r.getAs[Long]("n_rows") == base.count())
      assert(r.getAs[Long]("n_bulk") == base.filter(col("l_quantity") > 25).count())
      val rev = base.filter(col("l_discount") > 0.05)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"))
        .collect()(0)
      if (rev.isNullAt(0)) assert(r.isNullAt(r.fieldIndex("discounted_rev")))
      else assert(r.getAs[Double]("discounted_rev") == rev.getDouble(0))
    }
  }

  test("group by all infers the same grouping as the explicit form") {
    import org.apache.spark.sql.functions._
    val got = queries.SqlSurface.groupByAll(spark, sf).collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus"),
        r.getAs[Int]("ship_year"), r.getAs[Long]("n_rows"),
        r.getAs[Double]("sum_qty"))).toSet
    val exp = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"),
        year(col("l_shipdate")).as("ship_year"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus"),
        r.getAs[Int]("ship_year"), r.getAs[Long]("n_rows"),
        r.getAs[Double]("sum_qty"))).toSet
    assert(got == exp)
  }

  test("bool aggregates match the directly-counted predicates") {
    import org.apache.spark.sql.functions._
    val rows = queries.SqlSurface.boolAgg(spark, sf).collect()
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity", "l_discount", "l_tax").collect()
      .groupBy(_.getAs[String]("l_returnflag"))
    rows.foreach { r =>
      val g = li(r.getAs[String]("l_returnflag"))
      assert(r.getAs[Boolean]("all_positive_qty") ==
        g.forall(_.getAs[Double]("l_quantity") > 0))
      assert(r.getAs[Boolean]("any_deep_discount") ==
        g.exists(_.getAs[Double]("l_discount") > 0.05))
      assert(r.getAs[Boolean]("any_tax_free") ==
        g.exists(_.getAs[Double]("l_tax") == 0))
    }
  }

  test("values inline bands partition the fact rows exactly once") {
    val rows = queries.SqlSurface.valuesInline(spark, sf).collect()
    val total = graft.sources.Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total,
      "bands overlap or leave gaps")
    assert(rows.map(_.getAs[String]("band_name")).toSet ==
      Set("small", "medium", "large"))
  }

  test("window clause: one named spec drives rank, running sum, lag coherently") {
    val rows = queries.SqlSurface.windowClause(spark, sf).collect()
      .groupBy(_.getAs[Long]("o_custkey"))
    rows.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rn"))
      assert(sorted.map(_.getAs[Long]("rn")).toSeq ==
        (1L to sorted.length.toLong))
      val spend = sorted.map(_.getAs[Double]("run_spend"))
      assert(spend.zip(spend.tail).forall { case (a, b) => a <= b + 1e-9 })
      assert(sorted.head.isNullAt(sorted.head.fieldIndex("prev_order")))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("prev_order") == a.getAs[Long]("o_orderkey"))
        case _ =>
      }
    }
  }

  test("argminmax: the selected order really carries the extreme price") {
    import org.apache.spark.sql.functions._
    val rows = queries.SqlSurface.argMinMax(spark, sf).collect()
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_orderkey", "l_extendedprice").collect()
      .groupBy(_.getAs[String]("l_returnflag"))
    rows.foreach { r =>
      val g = li(r.getAs[String]("l_returnflag"))
      val maxP = g.map(_.getAs[Double]("l_extendedprice")).max
      val minP = g.map(_.getAs[Double]("l_extendedprice")).min
      assert(r.getAs[Double]("max_price") == maxP)
      assert(r.getAs[Double]("min_price") == minP)
      // the argmax order must own a row at the extreme price
      assert(g.exists(x => x.getAs[Long]("l_orderkey") == r.getAs[Long]("max_price_order")
        && x.getAs[Double]("l_extendedprice") == maxP))
      assert(g.exists(x => x.getAs[Long]("l_orderkey") == r.getAs[Long]("min_price_order")
        && x.getAs[Double]("l_extendedprice") == minP))
    }
  }

  test("hll precision sweep: four sketches land inside their envelopes") {
    val rows = queries.SqlSurface.hllPrecisionSweep(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("rsd_permille")).toSeq ==
      Seq(10L, 23L, 80L, 260L))
    val exact = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_ndv") == exact)
      assert(r.getAs[Boolean]("within_5rsd"),
        s"rsd ${r.getAs[Long]("rsd_permille")} out of envelope")
    }
  }

  test("bitmap distinct: popcount sum equals the built-in distinct everywhere") {
    val rows = queries.SqlSurface.bitmapDistinct(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
    assert(rows.length == ev.select("event_type").distinct().count())
    val maxUser = ev.agg(org.apache.spark.sql.functions.max("user_id"))
      .collect()(0).getLong(0)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("bitmap_matches"),
        s"${r.getAs[String]("event_type")}: bitmap ${r.getAs[Long]("n_users_bitmap")} " +
          s"vs direct ${r.getAs[Long]("n_users_direct")}")
      // bucket count bounded by the id universe and by the distinct
      val b = r.getAs[Long]("n_buckets")
      assert(b <= maxUser / 63 + 1)
      assert(b <= r.getAs[Long]("n_users_direct"))
    }
  }

  test("quantified: ALL/ANY rewrite incl. vacuous truth on an empty inner set") {
    import spark.implicits._
    val outer = Seq((1L, "a", 5.0), (2L, "a", 10.0), (3L, "b", 1.0),
      (4L, "z", -99.0)).toDF("id", "k", "v")
    val inner = Seq(("a", 5.0), ("a", 7.0), ("b", 0.5)).toDF("ik", "iv")
    val got = queries.SqlSurface.quantifiedOn(outer, "k", "v", inner, "ik", "iv")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Boolean]("gt_all"), r.getAs[Boolean]("gt_any"))).toMap
    assert(got == Map(
      1L -> (false, false), // 5 > ALL{5,7} no; 5 > ANY{5,7} no (strict)
      2L -> (true, true),
      3L -> (true, true),
      4L -> (true, false))) // empty set: ALL vacuously true, ANY false
  }

  test("sql udf: macro-expanded scalar + TVF agree with a direct recompute") {
    val rows = queries.SqlSurface.sqlUdf(spark, sf).collect()
    val li = graft.sources.Tables.lineitem(spark, sf)
      .selectExpr("l_quantity",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
          "(1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS net")
      .collect()
      .map(r => (r.getAs[Double]("l_quantity"), r.getAs[java.math.BigDecimal]("net")))
    assert(rows.map(_.getAs[Long]("bucket")).toSeq == (0L to 4L))
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val in = li.filter { case (q, _) => q >= b * 10 + 1 && q <= b * 10 + 10 }
      assert(r.getAs[Long]("n_items") == in.length, s"bucket $b count")
      val exp = in.map(x => BigDecimal(x._2)).sum.toDouble
      assert(r.getAs[Double]("net_revenue") == exp, s"bucket $b revenue")
    }
    // the 5 bands tile quantity 1..50: totals reconcile
    assert(rows.map(_.getAs[Long]("n_items")).sum ==
      li.count { case (q, _) => q >= 1 && q <= 50 })
  }

  test("named params: bound values reach the pushed filters and match inlining") {
    val df = queries.SqlSurface.namedParams(spark, sf)
    val inlined = graft.sources.Tables.orders(spark, sf)
      .filter("o_totalprice > 200000 AND o_orderpriority = '1-URGENT'")
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getAs[String]("o_orderstatus") -> r.getAs[Long]("count")).toMap
    val got = df.collect()
      .map(r => r.getAs[String]("o_orderstatus") -> r.getAs[Long]("n_orders")).toMap
    assert(got == inlined)
    // the bound literal is visible to the scan as a pushed filter
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("200000"), "bound parameter not folded into the plan")
  }

  test("sql scripting: the WHILE doubling search lands on the closed-form threshold") {
    val row = queries.SqlSurface.sqlScripting(spark, sf).collect().head
    val prices = graft.sources.Tables.orders(spark, sf)
      .select("o_totalprice").collect().map(_.getDouble(0))
    val total = prices.length.toLong
    val expThr = Iterator.iterate(1L)(_ * 2)
      .find(t => prices.count(_ <= t) * 10L >= total * 9).get
    assert(row.getAs[Long]("threshold") == expThr)
    assert(row.getAs[Long]("n_covered") == prices.count(_ <= expThr))
    assert(row.getAs[Long]("n_total") == total)
  }

  test("distinct on: one row per group carrying the group's max balance") {
    val rows = queries.SqlSurface.distinctOn(spark, sf).collect()
    val cust = graft.sources.Tables.customer(spark, sf)
      .select("c_nationkey", "c_mktsegment", "c_custkey", "c_acctbal")
      .collect()
      .map(r => (r.getAs[Int]("c_nationkey"), r.getAs[String]("c_mktsegment"),
        r.getAs[Long]("c_custkey"), r.getAs[Double]("c_acctbal")))
    val groups = cust.groupBy(c => (c._1, c._2))
    assert(rows.length == groups.size)
    rows.foreach { r =>
      val g = groups((r.getAs[Int]("c_nationkey"), r.getAs[String]("c_mktsegment")))
      // the elected row is the (acctbal DESC, custkey ASC) head
      val best = g.minBy(c => (-c._4, c._3))
      assert(r.getAs[Long]("c_custkey") == best._3)
      assert(r.getAs[Double]("c_acctbal") == best._4)
    }
  }

  test("kmv setops: estimates bracket exact within KMV error, under-full is exact") {
    val rows = queries.SqlSurface.kmvSetops(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val eu = r.getAs[Long]("exact_union"); val ku = r.getAs[Long]("kmv_union_est")
      val ei = r.getAs[Long]("exact_inter"); val ki = r.getAs[Long]("kmv_inter_est")
      assert(r.getAs[Long]("exact_a") + r.getAs[Long]("exact_b") ==
        eu + ei, "inclusion-exclusion")
      if (eu < 64) assert(ku == eu, s"under-full union must be exact: $r")
      // k=64 KMV relative error ~ 1/sqrt(62) ~ 13%; allow 4 sigma
      assert(math.abs(ku - eu).toDouble / eu < 0.52, s"union est off: $r")
      assert(ki <= ku && ki >= 0)
      if (eu < 64) assert(ki == ei, s"under-full inter must be exact: $r")
    }
  }

  test("qualify translation: exactly the per-nation top-2 by balance") {
    import org.apache.spark.sql.functions._
    val rows = queries.SqlSurface.qualifyClause(spark, sf).collect()
    val byNation = rows.groupBy(_.getAs[Int]("c_nationkey"))
    byNation.foreach { case (_, g) =>
      assert(g.length <= 2)
      assert(g.map(_.getAs[Long]("rn")).sorted.toSeq ==
        (1L to g.length).toSeq)
    }
    // rank 1 really is the nation max balance
    val maxBal = graft.sources.Tables.customer(spark, sf)
      .groupBy("c_nationkey").agg(max("c_acctbal").as("m")).collect()
      .map(r => r.getAs[Int]("c_nationkey") -> r.getAs[Double]("m")).toMap
    rows.filter(_.getAs[Long]("rn") == 1L).foreach { r =>
      assert(r.getAs[Double]("c_acctbal") ==
        maxBal(r.getAs[Int]("c_nationkey")))
    }
  }

  test("ctas lifecycle: managed table carries the whole base and the computed stats") {
    import org.apache.spark.sql.functions._
    val got = queries.SqlSurface.ctasCatalog(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val want = graft.sources.Tables.orders(spark, sf)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == want)
    // the ANALYZE pass landed in the catalog: row count + column stats
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(
        s"graft_ctas_${queries.SqlSurface.dirSlug(sf)}"))
    val nOrders = want.values.map(_._1).sum
    assert(meta.stats.exists(_.rowCount.exists(_.toLong == nOrders)),
      s"row-count statistic missing or wrong: ${meta.stats}")
    assert(meta.stats.exists(_.colStats.nonEmpty), "no column stats computed")
  }

  test("analyze partition: per-partition rowCounts land, the pruned estimate uses them") {
    import org.apache.spark.sql.functions._
    val got = queries.SqlSurface.analyzePartition(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))).toMap
    val want = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == want)
    // the per-partition stats really landed: every partition's
    // catalog rowCount is the exact per-type count
    val tbl = s"graft_parts_${queries.SqlSurface.dirSlug(sf)}"
    val parts = spark.sessionState.catalog.listPartitions(
      org.apache.spark.sql.catalyst.TableIdentifier(tbl))
    val trueCounts = graft.sources.Tables.events(spark, sf)
      .groupBy("event_type").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(parts.map(_.spec("event_type")).toSet == trueCounts.keySet)
    parts.foreach { p =>
      val et = p.spec("event_type")
      assert(p.stats.exists(_.rowCount.exists(_.toLong == trueCounts(et))),
        s"partition $et rowCount missing or wrong: ${p.stats}")
    }
    // the planner's estimate for a partition-filtered scan is the
    // PRUNED partitions' own analyzed bytes, not the table-wide size
    val chosen = Set("click", "purchase")
    val pruned = spark.table(tbl)
      .filter(col("event_type").isin(chosen.toSeq: _*))
    val est = pruned.queryExecution.optimizedPlan.stats.sizeInBytes
    val wantBytes = parts.filter(p => chosen(p.spec("event_type")))
      .map(_.stats.get.sizeInBytes).sum
    val allBytes = parts.map(_.stats.get.sizeInBytes).sum
    assert(est == wantBytes && est < allBytes,
      s"pruned estimate $est, analyzed-partition bytes $wantBytes, table $allBytes")
  }

  test("star except: the excluded columns are gone, pruning reaches the scan") {
    val df = queries.SqlSurface.starExcept(spark, sf)
    assert(df.columns.toSet == Set("c_custkey", "c_nationkey", "c_acctbal"))
    // the reader must not materialize the excluded columns
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("c_custkey") && !scan.contains("c_comment"))
    assert(df.count() == graft.sources.Tables.customer(spark, sf).count())
  }

  test("refresh metadata: out-of-band file swap is served only after REFRESH") {
    import org.apache.spark.sql.functions._
    val got = queries.SqlSurface.refreshMetadata(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_orders"), r.getAs[Double]("sum_price")))).toMap
    val want = graft.sources.Tables.orders(spark, sf)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == want)
    // swap the files AGAIN behind Spark's back (back to the URGENT
    // slice): the cached listing now points at deleted files, so the
    // unrefreshed read must fail — and after REFRESH the slice serves
    val tbl = s"graft_refresh_${queries.SqlSurface.dirSlug(sf)}"
    val loc = new java.io.File(
      queries.SourcesSinks.tmp(spark, sf, "refresh_orders"))
    val staging = queries.SourcesSinks.tmp(spark, sf, "refresh_orders_respec")
    val slice = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
    slice.write.mode("overwrite").parquet(staging)
    loc.listFiles().foreach(f => f.delete(): Unit)
    new java.io.File(staging).listFiles().foreach { f =>
      java.nio.file.Files.move(f.toPath,
        new java.io.File(loc, f.getName).toPath): Unit
    }
    val stale = intercept[Exception] { spark.table(tbl).count() }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.toString + " | " + msgs(t.getCause)
    assert(msgs(stale).contains("FileNotFound") || msgs(stale).contains("REFRESH"),
      msgs(stale).take(400))
    spark.sql(s"REFRESH TABLE $tbl")
    assert(spark.table(tbl).count() == slice.count())
  }

  test("tablesample: invariants hold, REPEATABLE seed is rerun-stable, plan is a Sample") {
    val row = queries.SqlSurface.tableSample(spark, sf).collect()(0)
    assert(row.getAs[Long]("n_total") ==
      graft.sources.Tables.lineitem(spark, sf).count())
    assert(row.getAs[Boolean]("in_envelope"), "sample count outside 10% ± 5pp")
    assert(row.getAs[Boolean]("rerun_stable"), "REPEATABLE(42) rerun diverged")
    assert(row.getAs[Boolean]("is_subset"), "sampled rows not in the base table")
    // the verb plans as a Sample over the scan — sampling happens in
    // the reader pipeline, not after a full materialization
    val v = s"lineitem_tsamp_${queries.SqlSurface.dirSlug(sf)}"
    val plan = spark.sql(
      s"SELECT * FROM $v TABLESAMPLE (10 PERCENT) REPEATABLE (42)")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Sample"), plan.take(500))
  }

  test("view pushdown: both predicates and the pruned schema cross the view boundary") {
    import org.apache.spark.sql.functions._
    val df = queries.SqlSurface.viewPushdown(spark, sf)
    // values match the inlined definition
    val want = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_quantity") < 30 &&
        col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1995-06-01 00:00:00")))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val got = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == want)
    // the view dissolves: the scan sees the view's own l_quantity
    // predicate AND the query's l_shipdate predicate, and reads only
    // the three referenced columns
    val plan = df.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_quantity") && pushed.contains("l_shipdate"), pushed)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_extendedprice")
      && !readSchema.contains("l_orderkey") && !readSchema.contains("l_discount"),
      readSchema)
  }
}
