package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

class ScanSpec extends SparkSpec {

  /** PushedFilters/ReadSchema of the first parquet scan in df's
    * physical plan (descending through the AQE wrapper). */
  private def scanInfo(df: DataFrame): (String, String) = {
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case a: AdaptiveSparkPlanExec => scans(a.inputPlan)
      case s: FileSourceScanExec    => Seq(s)
    }.flatten
    val found = scans(df.queryExecution.executedPlan)
    assert(found.nonEmpty, "expected a FileSourceScanExec in the plan")
    val s = found.head
    (s.metadata.getOrElse("PushedFilters", ""), s.metadata.getOrElse("ReadSchema", ""))
  }

  test("eq predicate reaches the parquet scan as a pushed filter") {
    val (pushed, _) = scanInfo(queries.Scans.predEq(spark, sf))
    assert(pushed.contains("EqualTo(l_returnflag,R)"), pushed)
  }

  test("range predicates reach the scan") {
    val (pushed, _) = scanInfo(queries.Scans.predRange(spark, sf))
    assert(pushed.contains("GreaterThanOrEqual(l_quantity,10.0)"), pushed)
    assert(pushed.contains("LessThan(l_extendedprice,10000.0)"), pushed)
  }

  test("IN-list predicates reach the scan") {
    val (pushed, _) = scanInfo(queries.Scans.predIn(spark, sf))
    assert(pushed.contains("In(o_orderpriority"), pushed)
  }

  test("compound AND/OR/NOT tree reaches the scan") {
    val (pushed, _) = scanInfo(queries.Scans.predCompound(spark, sf))
    assert(pushed.contains("Or("), pushed)
  }

  test("2-column projection prunes ReadSchema to exactly those columns") {
    val (_, readSchema) = scanInfo(queries.Scans.pruneProjection(spark, sf))
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_extendedprice"), readSchema)
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipdate"), readSchema)
  }

  test("q6 scan reads only the four columns it needs") {
    val (_, readSchema) = scanInfo(queries.Tpch.q6(spark, sf))
    assert(!readSchema.contains("l_orderkey"), readSchema)
    assert(readSchema.contains("l_discount"), readSchema)
  }

  test("selectivity sweep returns one row with positive counts") {
    val r = queries.Scans.selectivitySweep(spark, sf).collect()(0)
    assert(r.getLong(0) > 0 && r.getDouble(1) > 0)
  }

  test("q3 top-N plans TakeOrderedAndProject, not a global sort") {
    val plan = queries.Tpch.q3(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("stratified sample pushes nothing to the driver and scans only needed columns") {
    val df = operators.TextAnalysis.stratifiedSample(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // map-side filter over a pruned scan: no shuffle before the sort
    assert(plan.contains("ReadSchema"), plan.take(2000))
    assert(!plan.contains("text"), "sample should not read the text column:\n" + plan.take(2000))
  }

  test("dpp query: partitioned scan carries a dynamicpruning filter") {
    val df = queries.Scans.dppPrunedJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(3000))
    // and the result itself is right: only EUROPE nations appear
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("n_customers") > 0))
  }

  test("bloom query: runtime bloom filter applied on the fact side") {
    val df = queries.Scans.bloomFilteredJoin(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), plan.take(3000))
    assert(df.collect().nonEmpty)
  }

  test("observe(): corpus accounting rides the action, no second scan") {
    import org.apache.spark.sql.functions._
    // the 100 TB pattern: a curation job reports its input volume
    // (docs/chars seen BEFORE its filters) as a side-metric of the
    // one pass it already runs, instead of a second count() scan
    val obs = new org.apache.spark.sql.Observation("corpus_stats")
    val docs = graft.sources.Tables.documents(spark, sf)
    val en = docs
      .observe(obs, count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("bigint")).as("n_chars"))
      .filter(col("lang") === "en")
      .count()
    val m = obs.get
    assert(m("n_docs").asInstanceOf[Long] == docs.count())
    assert(m("n_chars").asInstanceOf[Long] ==
      docs.agg(sum(length(col("text")).cast("bigint"))).collect().head.getLong(0))
    // the filter genuinely reduced the action's own result
    assert(en < m("n_docs").asInstanceOf[Long] && en > 0)
  }

  test("aggregate pushdown: COUNT/MIN/MAX absorbed into the DSv2 parquet scan") {
    val df = queries.Scans.aggPushdown(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation"), plan.take(3000))
    assert(plan.contains("COUNT(*)"), plan.take(3000))
    val r = df.collect()(0)
    val t = graft.sources.Tables.orders(spark, sf)
      .selectExpr("count(*)", "min(o_orderkey)", "max(o_orderkey)",
        "min(o_custkey)", "max(o_custkey)").collect()(0)
    assert(r.getAs[Long]("n_rows") == t.getLong(0))
    assert(r.getAs[Long]("min_okey") == t.getLong(1))
    assert(r.getAs[Long]("max_okey") == t.getLong(2))
    assert(r.getAs[Long]("min_ckey") == t.getLong(3))
    assert(r.getAs[Long]("max_ckey") == t.getLong(4))
  }

  test("ANALYZE TABLE feeds CBO: row and column stats reach the optimizer") {
    // the stats-collection half of cost-based optimization: a fresh
    // catalog table exposes only file sizes (rowCount unknown), and
    // after ANALYZE the optimizer sees exact row counts and per-column
    // NDV/min/max — what join reordering and broadcast decisions key
    // on at 100 TB, where a wrong build side is a job-killer
    val s = spark.newSession()
    s.conf.set("spark.sql.cbo.enabled", "true")
    val t = s"graft_nation_stats_${math.abs(sf.hashCode)}"
    val path = java.nio.file.Files
      .createTempDirectory("graft_stats").toString
    val nation = graft.sources.Tables.nation(s, sf)
    val n = nation.count()
    nation.write.mode("overwrite").option("path", path).saveAsTable(t)
    def statsRow(): Option[String] =
      s.sql(s"DESCRIBE EXTENDED $t").collect()
        .find(_.getString(0) == "Statistics").map(_.getString(1))
    try {
      // fresh table: file sizes only, no row count
      assert(!statsRow().exists(_.contains("rows")),
        s"fresh table already had row stats: ${statsRow()}")
      s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS")
      s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS n_nationkey")
      assert(statsRow().exists(_.contains(s"$n rows")),
        s"post-ANALYZE stats: ${statsRow()}")
      // column-level NDV equals the key cardinality (exact at this size)
      val desc = s.sql(s"DESCRIBE EXTENDED $t n_nationkey").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(desc("distinct_count") == n.toString,
        s"ndv=${desc("distinct_count")} expected $n")
      val minKey = nation.agg(org.apache.spark.sql.functions.min("n_nationkey"))
        .collect()(0).get(0).toString
      assert(desc("min") == minKey)
      assert(desc("num_nulls") == "0")
    } finally {
      s.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("CBO join reorder: column stats flip a pessimal join order end-to-end") {
    // ANALYZE stats exist (test above); this ties them to a PLAN: a
    // 3-table chain written in the worst left-deep order — the big
    // orders⋈customer join first, the 1-row-filtered nation last —
    // must come out of CostBasedJoinReorder with nation joined to
    // customer at the BOTTOM (1500-row orders join deferred until the
    // selective dim has shrunk customer ~25×). Broadcast is disabled
    // so the logical order, not a runtime build-side pick, is under
    // test; AQE can re-pick build sides and split skew at runtime but
    // it canNOT re-associate a join tree — ordering remains the
    // planner's (CBO's) job even with AQE on.
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val s = spark.newSession()
    s.conf.set("spark.sql.cbo.enabled", "true")
    s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val sfx = math.abs(sf.hashCode).toString
    val tabs = Seq(
      "orders" -> graft.sources.Tables.orders(s, sf),
      "customer" -> graft.sources.Tables.customer(s, sf),
      "nation" -> graft.sources.Tables.nation(s, sf))
    try {
      tabs.foreach { case (name, df) =>
        val path = java.nio.file.Files
          .createTempDirectory(s"graft_cbo_$name").toString
        df.write.mode("overwrite").option("path", path)
          .saveAsTable(s"graft_cbo_${name}_$sfx")
        s.sql(s"ANALYZE TABLE graft_cbo_${name}_$sfx COMPUTE STATISTICS FOR ALL COLUMNS")
      }
      val q = s.sql(
        s"""SELECT count(*) AS n
           |FROM graft_cbo_orders_$sfx o
           |JOIN graft_cbo_customer_$sfx c ON o.o_custkey = c.c_custkey
           |JOIN graft_cbo_nation_$sfx n ON c.c_nationkey = n.n_nationkey
           |WHERE n.n_name = 'NATION_7'""".stripMargin)
      val joins = q.queryExecution.optimizedPlan.collect { case j: Join => j }
      assert(joins.size == 2, q.queryExecution.optimizedPlan.toString)
      // the INNERMOST join (no Join below it) must pair customer with
      // the filtered nation — i.e. the reorder fired and moved orders up
      val bottom = joins.filter(j => j.collect { case x: Join => x } == Seq(j))
      assert(bottom.size == 1)
      val bottomStr = bottom.head.toString
      assert(bottomStr.contains("nation") && bottomStr.contains("customer")
        && !bottomStr.contains("orders"),
        s"CBO did not reorder; bottom join:\n$bottomStr")
      // and the reordered plan is still the right ANSWER: replay the
      // count relationally on the plain session
      val want = {
        val o = graft.sources.Tables.orders(spark, sf)
        val c = graft.sources.Tables.customer(spark, sf)
        val n = graft.sources.Tables.nation(spark, sf)
          .filter(org.apache.spark.sql.functions.col("n_name") === "NATION_7")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(n, c("c_nationkey") === n("n_nationkey")).count()
      }
      assert(q.collect()(0).getAs[Long]("n") == want)
    } finally {
      tabs.foreach { case (name, _) =>
        s.sql(s"DROP TABLE IF EXISTS graft_cbo_${name}_$sfx")
      }
    }
  }
}
