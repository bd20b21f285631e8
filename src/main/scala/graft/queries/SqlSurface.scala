package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables._

/** Wider Impala-class SQL surface beyond the TPC-H set: correlated
  * min (argmin-per-group), ROLLUP, set operations, pivot-style
  * conditional aggregation, JSON extraction, regex kernels, and a
  * partitioned parquet sink with partition pruning.
  *
  * Being an Impala slice, the reference's implied surface is the full
  * SQL dialect (expr.h / scalar-fn-call.cc evaluate arbitrary exprs
  * inside scans); these queries pin the Spark analogs to DuckDB
  * oracles like everything else.
  */
object SqlSurface {
  private val D = DecimalType(18, 2)

  /** Correlated-min / argmin pattern (TPC-H Q2's shape adapted to the
    * available schema): each customer's earliest order, dedup by
    * (orderdate, orderkey) window rank — the scalable form of a
    * correlated subquery. */
  def earliestOrder(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"), col("o_totalprice"))
      .orderBy("o_custkey")
  }

  /** Managed-table DDL LIFECYCLE — the Impala bread-and-butter
    * catalog surface run end to end as one row: CREATE TABLE AS
    * SELECT into the session catalog (managed parquet), INSERT INTO
    * appending the remaining slice, ANALYZE TABLE ... COMPUTE
    * STATISTICS FOR ALL COLUMNS (Impala's COMPUTE STATS — the pass
    * that feeds its planner exactly as it feeds Catalyst's CBO), and
    * a query answered FROM THE CATALOG TABLE. The aggregate must be
    * invisible to the lifecycle: CTAS slice + INSERT slice = the
    * whole base table, bit-exact (prices ride the exact-decimal
    * path through the managed parquet). DROP IF EXISTS leads, so
    * the row is idempotent per session; at 100 TB the same sequence
    * is partitioned-INSERT territory and the stats pass is what
    * keeps join orders sane (SqlSurfaceSpec asserts the catalog
    * row-count statistic landed). */
  /** sanitized identifier slug of an sf dir and a stable lock key.
    * The sanitization alone is NOT collision-free (it collapses
    * punctuation runs and case: /data/sf0.1 and /data/sf0_1 would
    * map to the same identifier), so a short digest of the RAW path
    * is appended — that suffix is what makes distinct dirs yield
    * distinct catalog names and distinct interned locks. */
  private[graft] def dirSlug(dir: String): String = {
    val base = dir.replaceAll("[^A-Za-z0-9]+", "_")
      .replaceAll("^_|_$", "").toLowerCase
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"${base}_$digest"
  }

  def ctasCatalog(spark: SparkSession, dir: String): DataFrame = {
    val slug = dirSlug(dir)
    val tbl = s"graft_ctas_$slug"
    val v = s"orders_ctas_$slug"
    // the drop/delete/create sequence mutates shared catalog + fs
    // state: serialize concurrent invocations in one JVM on the
    // interned table name (the Staging.stagedPath lock discipline)
    tbl.intern.synchronized {
      orders(spark, dir).createOrReplaceTempView(v)
      // external CTAS at a per-app scratch location: the session
      // catalog is in-memory, so a MANAGED table's files would outlive
      // the catalog entry across apps and the next CTAS would hit
      // LOCATION_ALREADY_EXISTS (measured in the round-13 full gate);
      // dropping the entry AND clearing the location keeps the row
      // idempotent both across apps and across in-app re-runs
      val loc = graft.queries.SourcesSinks.tmp(spark, dir, "ctas_orders")
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      graft.queries.SourcesSinks.deleteRecursively(new java.io.File(loc))
      spark.sql(
        s"""CREATE TABLE $tbl USING PARQUET LOCATION '$loc' AS
           |SELECT o_orderkey, o_orderstatus,
           |  CAST(o_totalprice AS DECIMAL(18,2)) AS price
           |FROM $v WHERE o_orderstatus <> 'F'""".stripMargin)
      spark.sql(
        s"""INSERT INTO $tbl
           |SELECT o_orderkey, o_orderstatus,
           |  CAST(o_totalprice AS DECIMAL(18,2))
           |FROM $v WHERE o_orderstatus = 'F'""".stripMargin)
      spark.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR ALL COLUMNS")
      // materialize INSIDE the lock (round-14 advice): a concurrent
      // invocation's DROP + location delete between lock release and
      // a lazy execution would scan deleted files. The result is a
      // handful of grouped rows, so the checkpoint is O(groups).
      spark.sql(
        s"""SELECT o_orderstatus, count(*) AS n_orders,
           |  CAST(sum(price) AS DOUBLE) AS sum_price,
           |  min(o_orderkey) AS min_okey, max(o_orderkey) AS max_okey
           |FROM $tbl GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
        .localCheckpoint()
    }
  }

  /** REFRESH TABLE — Impala's REFRESH verb (the catalog-coherence
    * primitive every external-writer pipeline depends on): Spark
    * caches a catalog table's file listing, so files swapped in
    * OUT-OF-BAND (another engine, a distcp job, a compaction daemon
    * — here a raw filesystem move that bypasses every Spark write
    * path and its automatic refreshByPath) leave the cached listing
    * pointing at deleted files. The row materializes the v1 listing
    * (partial slice), swaps the location's files to the full table
    * behind Spark's back, REFRESHes, and answers from the new files
    * — the query SUCCEEDING is itself the evidence, since the stale
    * listing references deleted paths (SqlSurfaceSpec asserts the
    * unrefreshed read fails or serves v1 while the refreshed read is
    * exact). */
  def refreshMetadata(spark: SparkSession, dir: String): DataFrame = {
    val slug = dirSlug(dir)
    val tbl = s"graft_refresh_$slug"
    tbl.intern.synchronized {
      val loc = graft.queries.SourcesSinks.tmp(spark, dir, "refresh_orders")
      val staging = graft.queries.SourcesSinks.tmp(spark, dir, "refresh_orders_v2")
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      graft.queries.SourcesSinks.deleteRecursively(new java.io.File(loc))
      val slim = orders(spark, dir).select(
        col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast(D).as("price"))
      // v1: the URGENT-priority slice only
      orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast(D).as("price"))
        .write.parquet(loc)
      spark.sql(
        s"""CREATE TABLE $tbl (o_orderkey BIGINT, o_orderstatus STRING,
           |  price DECIMAL(18,2)) USING PARQUET LOCATION '$loc'""".stripMargin)
      spark.table(tbl).count() // populate the cached file listing
      // v2 swapped in OUT-OF-BAND: staged by Spark, MOVED by the
      // filesystem — no Spark write touches `loc`, so nothing
      // auto-refreshes the table's cached listing
      slim.write.mode("overwrite").parquet(staging)
      val locDir = new java.io.File(loc)
      locDir.listFiles().foreach(f => f.delete())
      new java.io.File(staging).listFiles().foreach { f =>
        java.nio.file.Files.move(f.toPath,
          new java.io.File(locDir, f.getName).toPath)
      }
      spark.sql(s"REFRESH TABLE $tbl")
      // materialize INSIDE the lock (round-14 advice): a concurrent
      // invocation's drop/delete window between lock release and a
      // lazy execution would serve deleted files.
      spark.sql(
        s"""SELECT o_orderstatus, count(*) AS n_orders,
           |  CAST(sum(price) AS DOUBLE) AS sum_price,
           |  max(o_orderkey) AS max_okey
           |FROM $tbl GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
        .localCheckpoint()
    }
  }

  /** TABLESAMPLE dialect surface — the sampling entry point users
    * actually TYPE (Impala ships TABLESAMPLE SYSTEM(p); Spark parses
    * TABLESAMPLE (p PERCENT) REPEATABLE(seed) natively). The
    * deterministic hash-mod family (sample_stratified etc.) is the
    * reproducible-pipeline primitive; this row covers the ad-hoc SQL
    * verb. A sample's rows are seed-dependent, so the oracle pins
    * the INVARIANTS instead of the membership: the exact base count,
    * the count envelope (10% ± 5pp — ≥13σ of Bernoulli at every SF),
    * REPEATABLE-seed rerun stability (same multiset twice), and
    * sample ⊆ base. Each check is a distributed count/exceptAll; the
    * scalars are a bounded driver collect. */
  def tableSample(spark: SparkSession, dir: String): DataFrame = {
    val v = s"lineitem_tsamp_${dirSlug(dir)}"
    lineitem(spark, dir).createOrReplaceTempView(v)
    def sample() = spark.sql(
      s"""SELECT l_orderkey, l_linenumber FROM $v
         |TABLESAMPLE (10 PERCENT) REPEATABLE (42)""".stripMargin)
    val base = spark.table(v).select("l_orderkey", "l_linenumber")
    val total = base.count()
    val s1 = sample()
    val n1 = s1.count()
    val stable = n1 == sample().count() && s1.exceptAll(sample()).isEmpty
    val subset = s1.exceptAll(base).isEmpty
    spark.range(1).select(
      lit(total).as("n_total"),
      lit(n1 * 20 >= total && n1 * 20 <= total * 3).as("in_envelope"),
      lit(stable).as("rerun_stable"),
      lit(subset).as("is_subset"))
  }

  /** Catalog VIEW lifecycle — the other Impala bread-and-butter DDL
    * verb next to [[ctasCatalog]]'s CTAS/INSERT/ANALYZE: CREATE OR
    * REPLACE VIEW over the parquet-backed table, ALTER VIEW ... AS
    * re-pointing the definition (the view queried is the ALTERed
    * one), then a query answered THROUGH the view. A view is a named
    * logical plan, so Catalyst inlines it and pushdown must be
    * unaffected by the boundary — SqlSurfaceSpec asserts
    * PushedFilters carries BOTH the view's own predicate and the
    * query's, and ReadSchema only the referenced columns. The 100 TB
    * story: views cost nothing at scan time exactly because they
    * dissolve before planning. */
  def viewPushdown(spark: SparkSession, dir: String): DataFrame = {
    val vw = s"graft_liview_${dirSlug(dir)}"
    vw.intern.synchronized {
      val src = s"parquet.`$dir/lineitem.parquet`"
      // CREATE establishes the view; ALTER ... AS swaps in the
      // definition actually served (narrower projection + predicate)
      spark.sql(
        s"""CREATE OR REPLACE VIEW $vw AS
           |SELECT l_orderkey, l_returnflag, l_shipdate, l_quantity,
           |  l_extendedprice, l_discount
           |FROM $src""".stripMargin)
      spark.sql(
        s"""ALTER VIEW $vw AS
           |SELECT l_returnflag, l_shipdate, l_extendedprice
           |FROM $src WHERE l_quantity < 30""".stripMargin)
      // ANALYZE the query inside the lock (round-14 advice): the view
      // inlines at analysis time, so once spark.sql returns, this
      // DataFrame's plan has captured the ALTERed definition — a
      // concurrent invocation sitting between its own CREATE (wide)
      // and ALTER can no longer leak the unfiltered definition into
      // this thread's plan. Execution stays lazy (the inlined plan
      // reads the parquet directly; no catalog state remains in it),
      // so SqlSurfaceSpec can still assert pushdown on the live plan.
      spark.sql(
        s"""SELECT l_returnflag, count(*) AS n_rows,
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
           |FROM $vw WHERE l_shipdate >= TIMESTAMP '1995-06-01'
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }
  }

  /** ROLLUP aggregation over returnflag × linestatus (subtotals +
    * grand total — the OLAP cube surface). */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** CUBE over status × priority — all four grouping-set combinations
    * (detail, two subtotal axes, grand total) in one Expand + hash
    * agg. Completes the rollup/grouping-sets/cube trio. Neither group
    * column is nullable in the data, so a NULL group key always means
    * "subtotal" here; the grouping() bits are still emitted as the
    * disambiguation contract. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(grouping("o_orderstatus").cast("bigint").as("g_status"),
        grouping("o_orderpriority").cast("bigint").as("g_priority"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(D)).cast("double").as("sum_price"))
      .orderBy(col("g_status"), col("g_priority"),
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** FULL OUTER join — both dangling sides must survive: kept
    * customers with no URGENT order (every customer has orders in
    * this data, so the urgent filter manufactures the left-dangling
    * side) AND urgent-order groups whose customer was dropped (every
    * third custkey). The 100 TB shape is the same shuffle join as
    * inner; only the null-padding differs, so the plan scales
    * identically. */
  def fullOuter(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir)
      .filter(col("c_custkey") % 3 =!= 0)
      .select("c_custkey", "c_mktsegment")
    val ords = orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
    cust.join(ords, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        coalesce(col("c_mktsegment"), lit("(no-customer)")).as("segment"),
        coalesce(col("cnt"), lit(0L)).as("n_orders"))
      .orderBy("custkey")
  }

  /** Exact percentiles per group (Impala ships APPX_MEDIAN; the exact
    * form is the calibration baseline the sketch is judged against —
    * agg_approx_stats already rank-validates the approx side). Exact
    * percentile requires a full sort of each group's values, which is
    * why it stays a calibration/audit tool at 100 TB while the sketch
    * serves queries. Quantities are small integers and both engines
    * interpolate lower + d·(upper−lower), so the doubles are
    * engine-exact. */
  def percentileExact(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.25)").as("p25_qty"),
        expr("percentile(l_quantity, 0.5)").as("p50_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"))
      .orderBy("l_returnflag")

  /** GROUPING SETS with grouping() markers — the generalized form of
    * rollup/cube: per-returnflag totals, per-linestatus totals, and
    * the grand total in ONE pass (a single Expand + hash agg, not
    * three scans of the fact table). The grouping() bits disambiguate
    * a NULL group key from a subtotal row — the contract every BI
    * layer on top of a 100 TB store depends on. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    val v = s"lineitem_gs_${math.abs(dir.hashCode)}"
    lineitem(spark, dir).createOrReplaceTempView(v)
    spark.sql(
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
         |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
         |  count(*) AS n_rows,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         |FROM $v
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY g_flag, g_status,
         |  l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
  }

  /** Correlated-subquery surface — EXISTS and NOT IN predicates plus
    * two correlated scalar subqueries, written as literal SQL the way
    * an Impala-dialect user would. Catalyst decorrelates all four
    * into joins (the scalar counts/maxes become an aggregated LEFT
    * join, EXISTS a left-semi, NOT IN a null-aware anti) — exactly
    * the rewrite a 100 TB engine must do, since per-row subquery
    * execution is a driver loop in disguise. The per-customer
    * aggregates shuffle on the high-cardinality custkey only. */
  def correlatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    val c = s"customer_cs_${math.abs(dir.hashCode)}"
    val o = s"orders_cs_${math.abs(dir.hashCode)}"
    customer(spark, dir).createOrReplaceTempView(c)
    orders(spark, dir).createOrReplaceTempView(o)
    spark.sql(
      s"""SELECT c_custkey,
         |  (SELECT count(*) FROM $o o WHERE o.o_custkey = c.c_custkey) AS n_orders,
         |  (SELECT max(o_totalprice) FROM $o o WHERE o.o_custkey = c.c_custkey) AS max_price
         |FROM $c c
         |WHERE EXISTS (SELECT 1 FROM $o o
         |              WHERE o.o_custkey = c.c_custkey
         |                AND o.o_orderpriority = '1-URGENT')
         |  AND c_custkey NOT IN (SELECT o_custkey FROM $o WHERE o_totalprice < 5000)
         |ORDER BY c_custkey""".stripMargin)
  }

  /** LIMIT/OFFSET paging over a total order — the result-paging
    * contract every SQL frontend leans on. Only correct with a
    * UNIQUE total order (the o_orderkey tiebreaker): paging over a
    * non-deterministic sort returns overlapping/missing rows across
    * pages at any scale. */
  def limitOffset(spark: SparkSession, dir: String): DataFrame = {
    val v = s"orders_lo_${math.abs(dir.hashCode)}"
    orders(spark, dir).createOrReplaceTempView(v)
    spark.sql(
      s"""SELECT o_orderkey, o_custkey, o_totalprice
         |FROM $v
         |ORDER BY o_totalprice DESC, o_orderkey
         |LIMIT 20 OFFSET 40""".stripMargin)
  }

  /** Set operations: customers buying in both 1996 and 1997
    * (INTERSECT) vs only in 1996 (EXCEPT), tagged and unioned. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    def buyers(year: Int): DataFrame =
      orders(spark, dir)
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf(s"$year-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf(s"${year + 1}-01-01 00:00:00")))
        .select("o_custkey").distinct()
    val both = buyers(1996).intersect(buyers(1997)).withColumn("segment", lit("both"))
    val only96 = buyers(1996).except(buyers(1997)).withColumn("segment", lit("only_1996"))
    both.unionAll(only96)
      .select("segment", "o_custkey")
      .orderBy("segment", "o_custkey")
  }

  /** Pivot-style conditional aggregation: revenue per linestatus with
    * one column per returnflag (engine-portable pivot). */
  def pivotRevenue(spark: SparkSession, dir: String): DataFrame = {
    def rev(flag: String) =
      sum(when(col("l_returnflag") === flag,
        col("l_extendedprice").cast(D)).otherwise(lit(BigDecimal(0)).cast(D)))
        .cast("double").as(s"rev_${flag.toLowerCase}")
    lineitem(spark, dir)
      .groupBy("l_linestatus")
      .agg(rev("A"), rev("N"), rev("R"))
      .orderBy("l_linestatus")
  }

  /** JSON extraction from the events props column + per-type stats —
    * the semi-structured column surface. */
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum("k").as("sum_k"), min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** Regex kernel: capture groups, global replace, rlike. */
  def regexFuncs(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir).select(
      col("p_partkey"),
      regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
      regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels"),
      col("p_name").rlike("^(red|blue|green)").as("is_color_named"))
      .orderBy("p_partkey")

  /** Approximate aggregates (HLL++ NDV, quantile sketch) — the
    * sketch surface every 100 TB profiler leans on. Sketch internals
    * are engine-specific, so the contract row carries what IS
    * engine-exact: the exact NDVs, plus within-bounds booleans that
    * compare Spark's sketches to exact answers. The oracle pins the
    * booleans to TRUE — a sketch regression beyond its error bound
    * fails the driver's hash.
    *
    * Shapes chosen for scale:
    * - Each exact NDV is its own distinct→count (a column-pruned scan
    *   + two-phase hash agg). Two countDistinct in ONE agg would plan
    *   an Expand that multiplies every row by the number of distinct
    *   groups AND drags the sketch buffers through the widened
    *   shuffle (measured 10.5 s vs ~3 s split, sf0.1).
    * - The quantile sketch is validated by RANK, not value: G-K
    *   percentile_approx(accuracy=10000) guarantees rank error
    *   ≤ N/10000, so we count rows below/at the sketch's median (one
    *   codegen pass) and assert the rank lands within 10× that bound
    *   (±0.1%·N). An exact median would need a full sort or a
    *   value histogram — l_extendedprice is near-unique, so at 100 TB
    *   both are off the table, while the rank check stays O(N).
    * - HLL++ runs at default rsd=0.05, asserted at 3σ = 15%. */
  def approxStats(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    val ndvP = li.select("l_partkey").distinct()
      .agg(count(lit(1)).as("exact_ndv_partkey"))
    val ndvO = li.select("l_orderkey").distinct()
      .agg(count(lit(1)).as("exact_ndv_orderkey"))
    val sk = li.agg(
      approx_count_distinct(col("l_partkey")).as("a_p"),
      approx_count_distinct(col("l_orderkey")).as("a_o"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("a_m"),
      count(lit(1)).as("n"))
    val medianRank = li.crossJoin(broadcast(sk.select("a_m")))
      .agg(sum(when(col("l_extendedprice") < col("a_m"), 1L).otherwise(0L)).as("cnt_lt"),
        sum(when(col("l_extendedprice") <= col("a_m"), 1L).otherwise(0L)).as("cnt_le"))
    val margin = greatest(lit(1.0), col("n").cast("double") * 0.001)
    ndvP.crossJoin(ndvO).crossJoin(sk).crossJoin(medianRank).select(
      col("exact_ndv_partkey"), col("exact_ndv_orderkey"),
      (abs(col("a_p") - col("exact_ndv_partkey")).cast("double") /
        col("exact_ndv_partkey") <= 0.15).as("ndv_partkey_within_bound"),
      (abs(col("a_o") - col("exact_ndv_orderkey")).cast("double") /
        col("exact_ndv_orderkey") <= 0.15).as("ndv_orderkey_within_bound"),
      (col("cnt_lt").cast("double") <= col("n").cast("double") / 2 + margin &&
        col("cnt_le").cast("double") >= col("n").cast("double") / 2 - margin)
        .as("median_within_bound"))
  }

  /** Mergeable HLL sketches (Apache DataSketches via Spark's
    * hll_sketch_agg family) — the distributed-aggregation pattern
    * behind every 100 TB profile job: each shard builds a PARTIAL
    * sketch, the tiny fixed-size sketches travel, and a final union
    * reproduces the global estimate without the raw keys ever
    * re-shuffling. This is the general form of what
    * approx_count_distinct does internally, surfaced so sketches can
    * be stored per partition/day and re-merged across any grouping
    * later (the reference's analog: per-row-group stats rolled up to
    * file level).
    *
    * Sketch bytes are engine-specific, so the contract row carries
    * the exact NDV plus three engine-exact booleans: partial-merge
    * and direct estimates each within the 3σ bound of exact, and
    * merge consistency (union-of-16-partials within 1% of the
    * one-shot sketch — they differ only by the union's HLL_8 target
    * type, not by the registers; measured 0.1% on this data). */
  def sketchMerge(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    val partial = li.groupBy(pmod(col("l_suppkey"), lit(16)).as("shard"))
      .agg(expr("hll_sketch_agg(l_orderkey, 12)").as("sk"))
    val merged = partial.agg(
      expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est_merged"))
    val direct = li.agg(
      expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey, 12))").as("est_direct"))
    val exact = li.select("l_orderkey").distinct()
      .agg(count(lit(1)).as("exact_ndv"))
    exact.crossJoin(broadcast(merged)).crossJoin(broadcast(direct)).select(
      col("exact_ndv"),
      (abs(col("est_merged") - col("exact_ndv")).cast("double") /
        col("exact_ndv") <= 0.05).as("merged_within_bound"),
      (abs(col("est_direct") - col("exact_ndv")).cast("double") /
        col("exact_ndv") <= 0.05).as("direct_within_bound"),
      (abs(col("est_merged") - col("est_direct")).cast("double") /
        col("est_direct") <= 0.01).as("merge_consistent"))
  }

  /** Partition-level ANALYZE — Impala's COMPUTE INCREMENTAL STATS
    * analog (the last catalog verb next to [[ctasCatalog]]'s
    * table-level pass): events land as a PARTITIONED external
    * catalog table (one directory per event_type — the layout
    * [[partitionedSink]] proves prunes), partitions are discovered
    * with ALTER TABLE ... RECOVER PARTITIONS (Impala's post-load
    * metadata refresh), then `ANALYZE TABLE ... PARTITION
    * (event_type) COMPUTE STATISTICS` writes PER-PARTITION row
    * counts and sizes into the catalog — the granularity that lets a
    * planner cost a partition-filtered query from the pruned
    * partitions' own stats instead of a whole-table average. The
    * answered query filters to two partitions; SqlSurfaceSpec
    * asserts every partition's catalog rowCount is exact and that
    * the pruned scan's size estimate equals the analyzed partitions'
    * stored totalSize (not the table-wide bytes). At 100 TB the
    * incremental form is the only affordable one: stats refresh
    * touches the partitions a load changed, never the whole table. */
  def analyzePartition(spark: SparkSession, dir: String): DataFrame = {
    val slug = dirSlug(dir)
    val tbl = s"graft_parts_$slug"
    tbl.intern.synchronized {
      val loc = SourcesSinks.tmp(spark, dir, "events_parts_cat")
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      SourcesSinks.deleteRecursively(new java.io.File(loc))
      events(spark, dir)
        .select(expr("ts div 1000000000 div 3600 * 3600").as("hour_sec"),
          col("value"), col("event_type"))
        .write.partitionBy("event_type").parquet(loc)
      spark.sql(
        s"""CREATE TABLE $tbl (hour_sec BIGINT, value DOUBLE,
           |  event_type STRING)
           |USING PARQUET PARTITIONED BY (event_type)
           |LOCATION '$loc'""".stripMargin)
      spark.sql(s"ALTER TABLE $tbl RECOVER PARTITIONS")
      spark.sql(s"ANALYZE TABLE $tbl PARTITION (event_type) COMPUTE STATISTICS")
      // materialize INSIDE the lock (the ctasCatalog discipline): a
      // concurrent invocation's DROP + location delete must not race
      // a lazy execution
      spark.sql(
        s"""SELECT event_type, count(*) AS n_events,
           |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           |  min(hour_sec) AS min_hour, max(hour_sec) AS max_hour
           |FROM $tbl WHERE event_type IN ('click', 'purchase')
           |GROUP BY event_type ORDER BY event_type""".stripMargin)
        .localCheckpoint()
    }
  }

  /** Partitioned parquet sink + partition-pruned re-read: events
    * written partitioned by event_type, then one partition's hourly
    * stats — the scan shows PartitionFilters, the 100 TB analog of
    * directory-level pruning. */
  def partitionedSink(spark: SparkSession, dir: String): DataFrame = {
    val path = SourcesSinks.tmp(spark, dir, "events_parts")
    events(spark, dir)
      .select(col("event_type"), expr("ts div 1000000000 div 3600 * 3600").as("hour_sec"),
        col("value"))
      .write.mode("overwrite").partitionBy("event_type").parquet(path)
    partitionPrunedRead(spark, path)
  }

  /** the pruned read half (separable so ScanSpec can inspect it). */
  private[graft] def partitionPrunedRead(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("event_type") === "click")
      .groupBy("hour_sec")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("sum_value"))
      .orderBy("hour_sec")

  /** Spark 4 VariantType over semi-structured JSON — the open-schema
    * column surface (Impala analog: the expr framework evaluating
    * paths into complex/JSON columns at scan time). A nested document
    * is assembled around the raw `props` payload, parsed ONCE to a
    * variant (binary-encoded, so repeated path extraction never
    * re-parses text — the reason variant beats get_json_object when a
    * row is probed more than once), then probed four ways: a typed
    * string path, a typed bigint path through the nested object, a
    * type-MISMATCHED path (string as bigint) and a MISSING path —
    * both of which try_variant_get must yield NULL for, pinned by the
    * n_badcast/n_absent zero counts. Scale shape: pure per-row
    * projection into one hash agg over 5 groups. */
  def jsonVariant(spark: SparkSession, dir: String): DataFrame = {
    val js = concat(lit("{\"e\":\""), col("event_type"),
      lit("\",\"p\":"), col("props"), lit("}"))
    // single-row-group input: parse_json + 4 variant probes + partial
    // agg would run in ONE scan task; fan rows across the machine
    // first (identity at scale — see Tables.parallelized)
    graft.sources.Tables.parallelized(events(spark, dir), col("event_id"))
      .withColumn("v", parse_json(js))
      .select(
        variant_get(col("v"), "$.e", "string").as("etype"),
        variant_get(col("v"), "$.p.k", "bigint").as("k"),
        try_variant_get(col("v"), "$.e", "bigint").as("e_as_int"),
        try_variant_get(col("v"), "$.missing", "bigint").as("absent"))
      .groupBy("etype")
      .agg(count(lit(1)).as("n_events"),
        sum("k").as("sum_k"),
        count(col("e_as_int")).as("n_badcast"),
        count(col("absent")).as("n_absent"))
      .orderBy("etype")
  }

  /** LISTAGG (SQL:2016, Spark 4) — ordered string aggregation, the
    * report-formatting surface: per region, the member nations and
    * the distinct customer market segments present, each as one
    * deterministic comma-joined string (WITHIN GROUP ordering makes
    * the result a pure function of the group's row SET, never of
    * partial-agg order). Scale contract: listagg materializes each
    * group's values in one buffer, so it belongs on bounded groups —
    * dims, rollup outputs, per-key top-k results — never raw facts;
    * the unbounded-group alternative stays collect-free (agg to
    * distinct rows first, as the segment arm does here). */
  def listAgg(spark: SparkSession, dir: String): DataFrame = {
    val geo = nation(spark, dir)
      .join(region(spark, dir), col("n_regionkey") === col("r_regionkey"))
    val nations = geo.groupBy("r_name")
      .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("nations"),
        count(lit(1)).as("n_nations"))
    val segs = customer(spark, dir)
      .join(geo.select("n_nationkey", "r_name"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("r_name")
      .agg(expr("listagg(DISTINCT c_mktsegment, ',') WITHIN GROUP (ORDER BY c_mktsegment)")
        .as("segments"))
    nations.join(segs, "r_name").orderBy("r_name")
  }

  /** UNPIVOT (wide → long, the inverse of sql_pivot) via the native
    * Dataset.unpivot/melt operator — the reshape every metrics table
    * needs before a generic per-metric pipeline can consume it.
    * Unpivot is a pure per-row projection (each row explodes to
    * n_metrics rows in the map phase, no shuffle beyond the upstream
    * agg), so it scales as a constant-factor row expansion. The SQL
    * dialect twin is `stack(n, ...)`. */
  def unpivotRevenue(spark: SparkSession, dir: String): DataFrame = {
    val wide = orders(spark, dir).groupBy("o_orderstatus")
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT",
          col("o_totalprice").cast(D)).otherwise(lit(0).cast(D)))
          .cast("double").as("rev_urgent"),
        sum(when(col("o_orderpriority") === "2-HIGH",
          col("o_totalprice").cast(D)).otherwise(lit(0).cast(D)))
          .cast("double").as("rev_high"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
          col("o_totalprice").cast(D)).otherwise(lit(0).cast(D)))
          .cast("double").as("rev_other"))
    wide.unpivot(
        Array(col("o_orderstatus")),
        Array(col("rev_urgent"), col("rev_high"), col("rev_other")),
        "prio_class", "revenue")
      .orderBy("o_orderstatus", "prio_class")
  }

  /** Numerically-EXACT distributed correlation/covariance — the
    * profiling statistics every feature store publishes. A naive
    * streaming corr over doubles is partial-sum-order dependent
    * (non-deterministic on a cluster and unreplayable by an oracle);
    * instead both moments' inputs are exact integers (quantity is
    * integral, price in cents via the DECIMAL cast), the five
    * power sums fold order-free (BIGINT where a row contributes
    * ≤ 10⁹ — sx, sy, sxx — and DECIMAL(38,0) for the price-squared
    * terms syy/sxy, whose ~10¹³-per-row contributions would exhaust a
    * BIGINT within ~10⁶ rows/group: the agg_moments_exact overflow
    * class, fixed the same way), and the closed-form
    * corr/covar/stddev evaluate once per group in doubles from those
    * exact sums — bit-identical on any partitioning, any engine.
    * The built-in corr() is asserted against the exact value within
    * 1e-9 as a pinned boolean, the same contract pattern as
    * agg_approx_stats. */
  /** Exact distribution-shape statistics — skewness and excess
    * kurtosis per event type from ORDER-FREE integer power sums,
    * extending [[corrExact]]'s discipline to the 3rd/4th moments:
    * values quantize to cents (exact — the data is 2-decimal), the
    * four power sums accumulate as DECIMAL(38,0) (c⁴ ≤ 10¹⁶ per row,
    * so even 10¹² rows stay inside 38 digits — the 100 TB headroom
    * ev_ab_test documents), and the central moments + ratios are a
    * FIXED-order double expression both engines evaluate identically
    * (skew/kurtosis are scale-invariant, so the cents unit cancels).
    * The built-in skewness()/kurtosis() are order-dependent float
    * folds — fine for one engine, unreplayable across two; this is
    * the deterministic form a monitoring pipeline can diff across
    * runs. Zero-variance groups yield NULL, the oracle's
    * division-by-zero semantics.
    *
    * Overflow budget, honestly: the per-row c⁴ runs in DECIMAL from
    * the FIRST multiply (a bigint chain overflows Long at
    * c > 55 108 — a $551 event, present from sf0.1 up), exact for
    * any c ≤ 10⁹ cents. The binding bound is the fraction-clearing
    * closed form: mM4 carries n³·Σc⁴ ≈ (n·c)⁴, so 38 digits hold
    * while n·c ≲ 3×10⁹ worst-case (5-digit cents → ~10⁵ rows/group;
    * in practice the moments track σ, not max c, so real headroom is
    * 10-100× that). Past it, a deployment rescales the unit
    * (cents→dollars: exact on a coarser grid) or splits the group by
    * subkey and diffs the mergeable power sums instead of the
    * ratios. */
  def momentsExact(spark: SparkSession, dir: String): DataFrame = {
    // the FIRST multiply already runs in decimal: a bigint c⁴ chain
    // overflows Long at c > 55 108 cents (value > $551 — present from
    // sf0.1 up), exactly the poison-row cliff expr_try_arith documents
    val g = events(spark, dir)
      .select(col("event_type"),
        (col("value").cast(D) * 100).cast("bigint")
          .cast(DecimalType(38, 0)).as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("c")).as("s1"),
        sum(col("c") * col("c")).as("s2"),
        sum(col("c") * col("c") * col("c")).as("s3"),
        sum(col("c") * col("c") * col("c") * col("c")).as("s4"))
    // scaled central sums as EXACT integers (skew/kurtosis are ratios
    // in which the n-powers cancel: kurt+3 = M4/M2², skew = M3/M2^1.5)
    // — one float division at the very end, so the doubles are the
    // correctly-rounded casts of identical integers in any engine. A
    // double central-moment formula instead diverges in the last ulps
    // across engines (measured: 3-ulp kurtosis drift), which an exact
    // value gate rejects. M4 ≈ n³·Σc⁴ stays inside 38 digits through
    // ~10⁹ rows/group at 4-digit cents; past that a deployment shards
    // groups or accepts the float formula for monitoring.
    val nDec = col("n").cast(DecimalType(38, 0))
    val mM2 = nDec * col("s2") - col("s1") * col("s1")
    val mM3 = nDec * nDec * col("s3") -
      lit(3) * nDec * col("s1") * col("s2") +
      lit(2) * col("s1") * col("s1") * col("s1")
    val mM4 = nDec * nDec * nDec * col("s4") -
      lit(4) * nDec * nDec * col("s1") * col("s3") +
      lit(6) * nDec * col("s1") * col("s1") * col("s2") -
      lit(3) * col("s1") * col("s1") * col("s1") * col("s1")
    val m2d = mM2.cast("double")
    g.select(col("event_type"), col("n"),
        (col("s1").cast("double") / col("n").cast("double") / lit(100.0))
          .as("mean_value"),
        (m2d / (col("n").cast("double") * col("n").cast("double")))
          .as("m2_cents"),
        when(m2d =!= 0.0,
          mM3.cast("double") / (m2d * sqrt(m2d))).as("skewness"),
        when(m2d =!= 0.0,
          mM4.cast("double") / (m2d * m2d) - lit(3.0)).as("kurtosis_excess"))
      .orderBy("event_type")
  }

  def corrExact(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .select(col("l_returnflag"),
        col("l_quantity").cast("bigint").as("xi"),
        (col("l_quantity")).as("xd"),
        (col("l_extendedprice").cast(D) * 100).cast("bigint").as("yi"),
        col("l_extendedprice").as("yd"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum("xi").as("sx"), sum("yi").as("sy"),
        sum(col("xi") * col("xi")).as("sxx"),
        // yi² ≈ 10¹³ per row (7-digit cents squared): a bigint sum has
        // only ~10⁶ rows/group of headroom — the agg_moments_exact
        // overflow class. Decimal from the first multiply, like there.
        sum(col("yi").cast(DecimalType(38, 0)) * col("yi")).as("syy"),
        sum(col("xi").cast(DecimalType(38, 0)) * col("yi")).as("sxy"),
        corr(col("xd"), col("yd")).as("corr_builtin"))
      .select(col("l_returnflag"), col("n"),
        ((col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (sqrt(col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) *
           sqrt(col("n").cast("double") * col("syy").cast("double") -
            col("sy").cast("double") * col("sy").cast("double"))))
          .as("corr_exact"),
        ((col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double") / col("n").cast("double")) /
          col("n").cast("double") / lit(100.0)).as("covar_pop"),
        (sqrt((col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double") / col("n").cast("double")) /
          col("n").cast("double")) / lit(100.0)).as("stddev_pop_price"),
        col("corr_builtin"))
      .withColumn("builtin_agrees",
        abs(col("corr_builtin") - col("corr_exact")) < lit(1e-9))
      .drop("corr_builtin")
      .orderBy("l_returnflag")

  /** WITH RECURSIVE (Spark 4's UnionLoop) — iterative transitive
    * closure INSIDE one SQL statement: every customer walks the
    * halving chain custkey → custkey div 2 → … → 1 (a synthetic
    * referral hierarchy with guaranteed termination), and the query
    * reports how many customers sit at each chain depth. Execution is
    * a driver-coordinated loop of distributed steps (UnionLoopExec),
    * the declarative twin of Dedup.components' iterative label
    * propagation — step output feeds the next step, bounded here by
    * log2(max key) iterations. */
  def recursiveCte(spark: SparkSession, dir: String): DataFrame = {
    customer(spark, dir).createOrReplaceTempView("customer_v")
    spark.sql(
      """WITH RECURSIVE chain AS (
        |  SELECT c_custkey AS root, c_custkey AS node, 0 AS depth FROM customer_v
        |  UNION ALL
        |  SELECT root, node DIV 2 AS node, depth + 1 FROM chain WHERE node > 1
        |)
        |SELECT depth, count(*) AS n_customers FROM (
        |  SELECT root, max(depth) AS depth FROM chain GROUP BY root
        |) GROUP BY depth ORDER BY depth""".stripMargin)
      .select(col("depth").cast("bigint").as("depth"), col("n_customers"))
  }

  /** LATERAL join (SQL:1999; Impala ships the same shape as
    * correlated inline views) — the top-N-per-row form: every
    * customer joined to the LATERAL subquery of its own two most
    * expensive orders. Catalyst decorrelates this into the same
    * shuffle-join + per-key ranking a hand-written window query
    * plans, so the declarative correlated form costs nothing extra at
    * 100 TB — the point of pinning it: users port correlated queries
    * as-is instead of rewriting them. Customers with fewer than two
    * orders keep what they have (inner lateral drops order-less
    * customers; this corpus has none). */
  def lateralTopN(spark: SparkSession, dir: String): DataFrame = {
    customer(spark, dir).createOrReplaceTempView("customer_lat_v")
    orders(spark, dir).createOrReplaceTempView("orders_lat_v")
    spark.sql(
      """SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
        |FROM customer_lat_v c, LATERAL (
        |  SELECT o_orderkey, o_totalprice
        |  FROM orders_lat_v o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 2
        |) t
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
  }

  /** Count-min sketch point-frequency estimates — the frequency twin
    * of the HLL NDV sketch above (Impala analog: the same
    * hash-bucketed summaries hash-util.h feeds): each partition folds
    * rows into a tiny counter grid, grids ADD (order-free, so the
    * estimate is deterministic for a fixed seed on any partitioning —
    * the property BenchSpec-style stability rests on), and point
    * lookups answer "how often does key k appear" without a group-by
    * shuffle of the raw keys. The sketch guarantees est ≥ exact
    * always, and est ≤ exact + eps·N with the configured confidence;
    * both bounds are pinned as booleans against the exact per-key
    * counts (computed relationally), the agg_approx_stats contract
    * pattern. The sketch itself builds via treeAggregate (executor
    * partials → driver), i.e. the partial-aggregate shape, never a
    * collect of rows. */
  def countMin(spark: SparkSession, dir: String): DataFrame = {
    val probeKeys = (1L to 10L)
    val li = lineitem(spark, dir)
    val cms = li.select(col("l_suppkey")).stat
      .countMinSketch(col("l_suppkey"), eps = 0.0001, confidence = 0.99, seed = 42)
    val total = cms.totalCount()
    val slack = math.ceil(0.0001 * total).toLong
    val estimates = probeKeys.map(k => (k, cms.estimateCount(Long.box(k))))
    import spark.implicits._
    val estDf = estimates.toDF("l_suppkey", "est")
    val exact = li.filter(col("l_suppkey").isin(probeKeys: _*))
      .groupBy("l_suppkey").agg(count(lit(1)).as("exact_n"))
    estDf.join(exact, Seq("l_suppkey"))
      .select(col("l_suppkey"), col("exact_n"),
        (col("est") >= col("exact_n")).as("never_undercounts"),
        (col("est") <= col("exact_n") + lit(slack)).as("within_eps_bound"))
      .orderBy("l_suppkey")
  }

  /** Exact WEIGHTED median over a compressed value domain — the
    * length-mass p50 per language: the document length below which
    * half the corpus's character mass sits (weight = n_chars), the
    * statistic behind "how long are the docs that carry the data"
    * curation dashboards ([[percentileExact]] is its unweighted
    * sibling). Pure integer arithmetic: the threshold test is
    * 2·cum ≥ total, never a float quantile interpolation, so the
    * answer is engine-exact by construction.
    *
    * Scale shape: the corpus collapses FIRST to (lang, n_chars)
    * granularity in one map-side-combined hash agg, and the cumsum
    * window runs over that compressed relation — partitions bounded
    * by the VALUE DOMAIN (distinct lengths per language), never by
    * row count. The naive form (window over raw docs) is the
    * unbounded-partition shape this repo systematically avoids. */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    // byLen feeds BOTH the cumsum window and the totals agg — staged
    // once (domain-bounded relation) so the corpus is scanned once
    val byLen = documents(spark, dir)
      .groupBy("lang", "n_chars").agg(count(lit(1)).as("n_docs_len"))
      .withColumn("mass", col("n_chars") * col("n_docs_len"))
      .localCheckpoint()
    val totals = byLen.groupBy("lang")
      .agg(sum("mass").as("total_mass"), sum("n_docs_len").as("n_docs"))
    val w = Window.partitionBy("lang").orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byLen.withColumn("cum", sum("mass").over(w))
      .join(broadcast(totals), "lang")
      .filter(col("cum") * 2 >= col("total_mass"))
      .groupBy("lang", "n_docs", "total_mass")
      .agg(min("n_chars").as("mass_median_len"))
      .select("lang", "n_docs", "total_mass", "mass_median_len")
      .orderBy("lang")
  }

  /** Deterministic heavy hitters: a mergeable Misra-Gries summary
    * (K = 8 counters) built with treeAggregate partials — the
    * bounded-memory frequent-items shape next to [[countMin]]'s
    * frequency sketch. The summarized key is the lowest set bit of
    * event_id (geometric distribution: key 2^j carries ~2^−(j+1) of
    * the mass), so genuine heavy keys exist at every corpus size and
    * evictions actually fire on the ~16-key tail.
    *
    * Output = the GUARANTEED region only: keys whose exact count
    * exceeds N/(K+1), for which the mergeable-summaries theorem
    * (Agarwal et al., PODS'12) promises membership, est ≤ exact, and
    * exact − est ≤ N/(K+1) REGARDLESS of partition merge order — so
    * the value-checked contract is deterministic even though the
    * summary's tail content is not (the est values themselves stay
    * out of the checked columns for exactly that reason). All three
    * promises are pinned as booleans against relational exact
    * counts, integer-arithmetic only (×(K+1), no division).
    *
    * Scale shape: one treeAggregate pass (O(K) state per partition,
    * executor-combined before the driver sees anything) + one key agg
    * over the ~16-key relation for the exact side. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val K = 8
    val keys = events(spark, dir).select(expr("event_id & -event_id").as("key"))
    // one pass: MG counters + the total row count in the same state
    val (summary, n) = keys.as[Long].rdd.treeAggregate(
      (scala.collection.mutable.HashMap.empty[Long, Long], 0L))(
      seqOp = { case ((m, cnt), k) =>
        if (m.contains(k)) m(k) += 1L
        else if (m.size < K) m(k) = 1L
        else { // shared decrement: the Misra-Gries eviction step
          val dead = m.iterator.collect { case (kk, 1L) => kk }.toList
          m.mapValuesInPlace((_, v) => v - 1L)
          dead.foreach(m.remove)
        }
        (m, cnt + 1L)
      },
      combOp = { case ((a, na), (b, nb)) =>
        b.foreach { case (k, v) => a(k) = a.getOrElse(k, 0L) + v }
        if (a.size > K) {
          val cut = a.values.toSeq.sorted(Ordering[Long].reverse)(K)
          val dead = a.iterator.collect { case (kk, v) if v <= cut => kk }.toList
          a.mapValuesInPlace((_, v) => v - cut)
          dead.foreach(a.remove)
        }
        (a, na + nb)
      })
    val estDf = broadcast(summary.toSeq.toDF("key", "est"))
    keys.groupBy("key").agg(count(lit(1)).as("exact_n"))
      .filter(col("exact_n") * (K + 1) > lit(n))
      .join(estDf, Seq("key"), "left")
      .select(col("key"), col("exact_n"),
        col("est").isNotNull.as("in_summary"),
        (coalesce(col("est"), lit(0L)) <= col("exact_n")).as("est_le_exact"),
        (lit(K + 1) * (col("exact_n") - coalesce(col("est"), lit(0L))) <= lit(n))
          .as("err_bounded"))
      .orderBy("key")
  }

  /** Multiple DISTINCT aggregates in one GROUP BY (Impala supports
    * several count(distinct) per query since 2.12) — Spark plans one
    * Expand that replicates every row once per distinct clause, then
    * a two-phase de-dup + final agg. The cost model at 100 TB: the
    * shuffle widens ×(number of distinct clauses), which is the right
    * trade when the grouping key set is small and one pass over the
    * fact is what you can afford; when the multiplier hurts, split
    * into per-clause aggs joined on the group key (agg_approx_stats
    * documents the measured crossover) or drop to sketches. */
  def multiDistinct(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir).groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("ndv_supp"),
        countDistinct(col("l_partkey")).as("ndv_part"),
        countDistinct(year(col("l_shipdate"))).as("ndv_shipyear"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Bag-semantics set operations — INTERSECT ALL / EXCEPT ALL, the
    * multiset counterparts of [[setOps]]: a customer ordering 3 times
    * in 1996 and twice in 1997 contributes multiplicity min(3,2)=2 to
    * the intersection and 3-2=1 to the difference. The result is
    * reported as (segment, custkey, multiplicity) — the grouped form
    * of the ALL-variant row multiset, which keeps the output
    * deterministically ordered. The oracle recomputes the
    * multiplicity algebra (least / clamped difference) relationally,
    * pinning the semantics rather than another engine's ALL
    * implementation. */
  def setOpsAll(spark: SparkSession, dir: String): DataFrame = {
    // each yearly slice feeds BOTH set operations — staged once so
    // the fact table is scanned twice total, not four times
    def year(y: Int): DataFrame = orders(spark, dir)
      .filter(col("o_orderdate") >= lit(s"$y-01-01") &&
        col("o_orderdate") < lit(s"${y + 1}-01-01"))
      .select("o_custkey")
      .localCheckpoint()
    val y96 = year(1996)
    val y97 = year(1997)
    val inter = y96.intersectAll(y97)
      .groupBy("o_custkey").agg(count(lit(1)).as("multiplicity"))
      .withColumn("segment", lit("intersect_all"))
    val exc = y96.exceptAll(y97)
      .groupBy("o_custkey").agg(count(lit(1)).as("multiplicity"))
      .withColumn("segment", lit("except_all"))
    inter.unionByName(exc)
      .select("segment", "o_custkey", "multiplicity")
      .orderBy("segment", "o_custkey")
  }

  /** Aggregate FILTER clause — the SQL:2003 per-aggregate predicate
    * (Impala and every modern dialect ship it): one pass computes
    * differently-filtered aggregates side by side, where the naive
    * form runs one scan per predicate. Spark plans all four into a
    * single hash agg with conditional accumulation — the same
    * map-side-combined shape as a CASE-WHEN pivot, stated
    * declaratively. */
  def filterClause(spark: SparkSession, dir: String): DataFrame = {
    val v = s"lineitem_fc_${math.abs(dir.hashCode)}"
    lineitem(spark, dir).createOrReplaceTempView(v)
    spark.sql(
      s"""SELECT l_returnflag,
         |  count(*) AS n_rows,
         |  count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
         |    FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS discounted_rev,
         |  max(l_quantity) FILTER (WHERE l_shipdate >= TIMESTAMP '1997-01-01')
         |    AS max_qty_97
         |FROM $v
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** bool_and / bool_or (SQL:1999 EVERY / SOME) — predicate
    * aggregates: "did EVERY line ship discounted", "did ANY line
    * carry tax" per group, the data-quality assertions a pipeline
    * runs as one scan instead of two count comparisons. Both map-side
    * combine (AND/OR are associative-commutative). */
  def boolAgg(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        expr("bool_and(l_quantity > 0)").as("all_positive_qty"),
        expr("bool_and(l_discount < 0.5)").as("all_sane_discount"),
        expr("bool_or(l_discount > 0.05)").as("any_deep_discount"),
        expr("bool_or(l_tax = 0)").as("any_tax_free"))
      .orderBy("l_returnflag")

  /** VALUES inline table — the literal lookup dimension ad-hoc SQL
    * ships inside the query text (band definitions, code→name maps)
    * instead of a side table: a three-row VALUES relation of
    * quantity bands range-joined to the fact, then aggregated. The
    * inline relation is a LocalRelation — broadcast for free, no
    * scan, no catalog object. Same text both engines. */
  def valuesInline(spark: SparkSession, dir: String): DataFrame = {
    val v = s"lineitem_vi_${math.abs(dir.hashCode)}"
    lineitem(spark, dir).createOrReplaceTempView(v)
    spark.sql(
      s"""SELECT b.band_name, count(*) AS n_rows,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         |FROM $v l
         |JOIN (VALUES ('small', 0, 10), ('medium', 10, 30), ('large', 30, 1000000))
         |  AS b(band_name, lo, hi)
         |  ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
         |GROUP BY b.band_name ORDER BY b.band_name""".stripMargin)
  }

  /** Named WINDOW clause — the SQL:2003 dialect form that declares a
    * window once and shares it across several analytic functions:
    * one WindowExec pass serves rank + running sum + lag because the
    * three functions reference the same named spec (ad-hoc per-column
    * OVERs with equal specs collapse the same way, but the named form
    * is what ported BI SQL actually contains). Same query text runs
    * on both engines. */
  def windowClause(spark: SparkSession, dir: String): DataFrame = {
    val v = s"orders_wc_${math.abs(dir.hashCode)}"
    orders(spark, dir).createOrReplaceTempView(v)
    spark.sql(
      s"""SELECT o_custkey, o_orderkey,
         |  CAST(row_number() OVER w AS BIGINT) AS rn,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_spend,
         |  lag(o_orderkey) OVER w AS prev_order
         |FROM $v
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         |ORDER BY o_custkey, rn""".stripMargin)
  }

  /** min_by / max_by argmin-argmax aggregates (DuckDB/Snowflake
    * arg_min/arg_max) — "which ORDER had the max price", the
    * accompanying-column selection GROUP BY can't express without a
    * self-join or window. Tie discipline: the ordering key packs
    * (price-cents, orderkey, linenumber) into ONE BIGINT so the
    * winner is total-ordered and both engines' argmax agrees
    * (DuckDB's arg_max takes scalar keys only — struct keys don't
    * bind); cents ≤ ~1e7 × 1e11 stays far inside BIGINT. */
  def argMinMax(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .withColumn("okey", expr(
        "CAST(round(l_extendedprice * 100) AS BIGINT) * 100000000000L + l_orderkey * 10L + l_linenumber"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        expr("max_by(l_orderkey, okey)").as("max_price_order"),
        expr("min_by(l_orderkey, okey)").as("min_price_order"),
        max("l_extendedprice").as("max_price"),
        min("l_extendedprice").as("min_price"))
      .orderBy("l_returnflag")

  /** HLL precision-tuning sweep — the sketch-sizing decision
    * agg_approx_stats' single point can't inform: the SAME scan
    * carries four approx_count_distinct aggregates at rsd 26% → 1%
    * (HLL++ register arrays from 2^4 to 2^13 — the memory/accuracy
    * axis a 100 TB NDV service picks a point on), each checked
    * against the exact NDV within a generous 5·rsd envelope. The
    * estimates themselves are engine-specific so the contract row
    * exports exact + booleans, the agg_approx_stats discipline; all
    * four sketches ride ONE pass (one hash agg, four register
    * arrays). */
  def hllPrecisionSweep(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val exact = ev.select("user_id").distinct()
      .agg(count(lit(1)).as("exact_ndv"))
    val est = ev.agg(
      approx_count_distinct(col("user_id"), 0.26).as("e_260"),
      approx_count_distinct(col("user_id"), 0.08).as("e_80"),
      approx_count_distinct(col("user_id"), 0.023).as("e_23"),
      approx_count_distinct(col("user_id"), 0.01).as("e_10"))
    // stage the 1-row (estimates × exact) relation once: the four
    // output branches below would otherwise each re-run the corpus
    // agg (union branches don't share subplans)
    val j = est.crossJoin(broadcast(exact)).localCheckpoint()
    def row(permille: Int, c: String) =
      j.select(lit(permille.toLong).as("rsd_permille"), col("exact_ndv"),
        (abs(col(c) - col("exact_ndv")).cast("double") /
          col("exact_ndv").cast("double") <= permille / 1000.0 * 5)
          .as("within_5rsd"))
    row(10, "e_10").unionByName(row(23, "e_23"))
      .unionByName(row(80, "e_80")).unionByName(row(260, "e_260"))
      .orderBy("rsd_permille")
  }

  /** GROUP BY ALL / ORDER BY ALL — the modern SQL shorthand (adopted
    * by Spark 4, DuckDB, Snowflake, BigQuery) where the grouping key
    * is inferred as every non-aggregate select item: the exact query
    * text below runs unchanged on both engines, which is the whole
    * point of the dialect row — a user's ad-hoc GROUP BY ALL
    * notebooks port verbatim. Plans identically to the explicit
    * GROUP BY (one partial→final hash agg). */
  def groupByAll(spark: SparkSession, dir: String): DataFrame = {
    val v = s"lineitem_gba_${math.abs(dir.hashCode)}"
    lineitem(spark, dir).createOrReplaceTempView(v)
    spark.sql(
      s"""SELECT l_returnflag, l_linestatus, year(l_shipdate) AS ship_year,
         |  count(*) AS n_rows,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         |FROM $v
         |GROUP BY ALL ORDER BY ALL""".stripMargin)
  }

  /** Exact distributed COUNT(DISTINCT) via fixed-width bitmap
    * partials — the bitmap-index trick: users bucket by id div 63,
    * each (type, bucket) cell ORs its members into one 63-bit word
    * (map-side combined — the raw ids never shuffle, only
    * |universe|/63 longs per type), and the distinct count is the
    * popcount sum. Where the built-in distinct shuffles every
    * (type, user_id) pair and agg_multi_distinct pays the Expand,
    * the bitmap partial is a constant 8 bytes per 63 ids per type —
    * the shape that survives a 100 TB fact table with a bounded id
    * universe. The same row carries the built-in count(distinct) and
    * the match flag, so the contract self-certifies. Bits stay in
    * 0..62 (never the sign bit) so the long arithmetic is identical
    * in both engines. */
  def bitmapDistinct(spark: SparkSession, dir: String): DataFrame = {
    val cells = events(spark, dir)
      .select(col("event_type"),
        expr("user_id div 63").as("bucket"),
        expr("shiftleft(1L, CAST(user_id % 63 AS INT))").as("bit"))
      .groupBy("event_type", "bucket")
      .agg(expr("bit_or(bit)").as("mask"))
      .groupBy("event_type")
      .agg(sum(expr("bit_count(mask)")).as("n_users_bitmap"),
        count(lit(1)).as("n_buckets"))
    val direct = events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users_direct"))
    cells.join(direct, "event_type")
      .withColumn("bitmap_matches",
        col("n_users_bitmap") === col("n_users_direct"))
      .select("event_type", "n_users_bitmap", "n_users_direct",
        "n_buckets", "bitmap_matches")
      .orderBy("event_type")
  }

  /** The NATIVE Spark 4 bitmap-aggregate surface
    * (bitmap_bucket_number / bitmap_bit_position /
    * bitmap_construct_agg / bitmap_count) — the engine-level twin of
    * [[bitmapDistinct]]'s hand-rolled 63-bit partials: exact distinct
    * users per event type as a two-level bitmap rollup (32 Ki-bit
    * bitmaps per bucket, map-side combinable, shuffle payload =
    * universe/32768 bitmaps per group instead of raw ids). The
    * oracle is plain COUNT(DISTINCT) — the value the bitmaps must
    * reproduce exactly. */
  def bitmapNative(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        expr("bitmap_bucket_number(user_id)").as("bucket"),
        expr("bitmap_bit_position(user_id)").as("pos"))
      .groupBy("event_type", "bucket")
      .agg(expr("bitmap_count(bitmap_construct_agg(pos))").as("bucket_distinct"))
      .groupBy("event_type")
      .agg(sum("bucket_distinct").as("n_users"),
        count(lit(1)).as("n_buckets"))
      .orderBy("event_type")

  /** Deterministic exact MODE: the most frequent order priority per
    * customer nation, ties broken by (count, value) lexicographic
    * max so the answer is a pure function of the row set. Spark's
    * built-in `mode()` documents nondeterministic tie-breaking, so a
    * 100 TB pipeline (and an oracle gate) needs this two-level
    * shape instead: groupBy(group, value) count — map-side combined,
    * AQE-splittable even when one nation dominates — then
    * max_by(value, struct(cnt, value)) over the DOMAIN-bounded
    * per-group frequency relation (≤5 priorities per nation). Never
    * a window over the raw rows: a hot group would single-task. */
  def modeExact(spark: SparkSession, dir: String): DataFrame =
    customer(spark, dir)
      .join(orders(spark, dir),
        col("c_custkey") === col("o_custkey"))
      .groupBy("c_nationkey", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("c_nationkey")
      .agg(
        expr("max_by(o_orderpriority, struct(cnt, o_orderpriority))")
          .as("mode_priority"),
        max("cnt").as("mode_cnt"),
        sum("cnt").as("n_orders"))
      .orderBy("c_nationkey")

  /** Explicit LEFT SEMI / LEFT ANTI join SYNTAX — the join types
    * q21/q22 reach through EXISTS subqueries, surfaced as first-class
    * dialect (the planner's semi/anti operators are what every
    * "has-a"/"lacks-a" filter compiles to; writing them directly
    * skips the subquery-decorrelation step). Semi/anti joins carry
    * only the LEFT side's columns and never duplicate a left row no
    * matter how many right matches exist — which is why n_with +
    * n_without = n_customers holds exactly, the invariant the output
    * exposes per nation. Both joins broadcast the dimension-side
    * key set at this shape; at fact-scale right sides they shuffle on
    * the key like any equi-join. */
  def semiAnti(spark: SparkSession, dir: String): DataFrame = {
    customer(spark, dir).createOrReplaceTempView("sa_customer")
    orders(spark, dir).createOrReplaceTempView("sa_orders")
    spark.sql(
      """WITH w AS (
        |  SELECT c_nationkey, count(*) AS n_with_orders
        |  FROM sa_customer LEFT SEMI JOIN sa_orders ON c_custkey = o_custkey
        |  GROUP BY c_nationkey),
        |wo AS (
        |  SELECT c_nationkey, count(*) AS n_without_orders
        |  FROM sa_customer LEFT ANTI JOIN sa_orders ON c_custkey = o_custkey
        |  GROUP BY c_nationkey),
        |base AS (SELECT c_nationkey, count(*) AS n_customers
        |         FROM sa_customer GROUP BY c_nationkey)
        |SELECT base.c_nationkey, n_customers,
        |  coalesce(n_with_orders, 0) AS n_with_orders,
        |  coalesce(n_without_orders, 0) AS n_without_orders
        |FROM base
        |LEFT JOIN w ON base.c_nationkey = w.c_nationkey
        |LEFT JOIN wo ON base.c_nationkey = wo.c_nationkey
        |ORDER BY base.c_nationkey""".stripMargin)
  }

  /** SQL-defined functions (SQL:2016 / Spark 4 `CREATE FUNCTION …
    * RETURN`) — the reference's scalar-fn-call.cc surface expressed
    * as CATALOG objects instead of engine built-ins: a scalar SQL UDF
    * (exact-decimal net revenue) and a TABLE-VALUED SQL UDF (the
    * quantity band dimension) defined in SQL and composed in one
    * query. Both are macro-expanded by the analyzer into the plan —
    * codegen'd like any expression, NEVER an opaque JVM lambda, so
    * pushdown/pruning see through them (the reason to prefer SQL UDFs
    * over Scala UDFs at 100 TB). The oracle inlines the bodies: macro
    * expansion equivalence IS the semantics under test. The band
    * dimension is a 5-row TVF result broadcast against the fact. */
  def sqlUdf(spark: SparkSession, dir: String): DataFrame = {
    lineitem(spark, dir).createOrReplaceTempView("udf_lineitem")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_net(
        |  ep DECIMAL(18,2), d DECIMAL(18,2)) RETURNS DECIMAL(38,4)
        |RETURN ep * (CAST(1 AS DECIMAL(18,2)) - d)""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_qty_bands(k BIGINT)
        |RETURNS TABLE (bucket BIGINT)
        |RETURN SELECT id AS bucket FROM range(10) WHERE id < k""".stripMargin)
    spark.sql(
      """SELECT b.bucket, count(*) AS n_items,
        |  CAST(sum(graft_net(CAST(l_extendedprice AS DECIMAL(18,2)),
        |                     CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS net_revenue
        |FROM udf_lineitem l JOIN graft_qty_bands(5) b
        |  ON l.l_quantity >= b.bucket * 10 + 1
        | AND l.l_quantity <= b.bucket * 10 + 10
        |GROUP BY b.bucket ORDER BY b.bucket""".stripMargin)
  }

  /** NAMED PARAMETER MARKERS (`:param`, Spark 4 `spark.sql(text,
    * args)`) — the injection-safe template surface every BI/service
    * layer uses instead of string interpolation: the parameter
    * values bind through the API as LITERALS in the analyzed plan
    * (so constant folding and pushdown see them exactly like inline
    * constants — `PushedFilters` carries the bound threshold). The
    * oracle inlines the same values; binding-vs-inlining equivalence
    * is the semantics under test. */
  def namedParams(spark: SparkSession, dir: String): DataFrame = {
    orders(spark, dir).createOrReplaceTempView("np_orders")
    spark.sql(
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM np_orders
        |WHERE o_totalprice > :minPrice AND o_orderpriority = :prio
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
      Map("minPrice" -> 200000, "prio" -> "1-URGENT"))
  }

  /** SQL SCRIPTING (SQL/PSM, Spark 4 BEGIN…END) — procedural control
    * flow in pure SQL: DECLARE'd state, scalar-subquery assignment,
    * and a WHILE loop that re-queries the DATA each iteration (a
    * doubling search for the smallest power-of-two price threshold
    * covering ≥ 90 % of orders — the iterative-calibration shape that
    * otherwise needs driver-side Scala). Each iteration is one tiny
    * aggregate over the table; iteration count is log of the value
    * domain, never of the row count. The oracle replays the search
    * declaratively (min k over a generate_series of thresholds) —
    * fixpoint-vs-closed-form equivalence is the semantics under
    * test. */
  def sqlScripting(spark: SparkSession, dir: String): DataFrame = {
    // The loop probes ONE column ~log2(domain) times; an iterative
    // calibration at scale caches that projection once instead of
    // re-reading the table per iteration (in-memory columnar scan per
    // probe, parquet IO paid once). The script executes EAGERLY and
    // its final SELECT reads only script variables, so the cache is
    // released before returning — it must not pin storage memory for
    // the rest of the session.
    val probed = orders(spark, dir).select("o_totalprice").cache()
    probed.createOrReplaceTempView("script_orders")
    val out = spark.sql(
      """BEGIN
        |  DECLARE thr BIGINT DEFAULT 1;
        |  DECLARE covered BIGINT DEFAULT 0;
        |  DECLARE total BIGINT DEFAULT 0;
        |  SET total = (SELECT count(*) FROM script_orders);
        |  SET covered = (SELECT count(*) FROM script_orders WHERE o_totalprice <= thr);
        |  WHILE covered * 10 < total * 9 DO
        |    SET thr = thr * 2;
        |    SET covered = (SELECT count(*) FROM script_orders WHERE o_totalprice <= thr);
        |  END WHILE;
        |  SELECT thr AS threshold, covered AS n_covered, total AS n_total;
        |END""".stripMargin)
    probed.unpersist()
    out
  }

  /** QUALIFY clause — the Snowflake/BigQuery/DuckDB post-window
    * filter (SQL's missing fourth filter stage: WHERE → GROUP →
    * HAVING → QUALIFY). Spark has no QUALIFY syntax, so this row IS
    * the translation: compute the window function as a column and
    * filter on it — Catalyst plans the identical
    * Window → Filter the native clause compiles to, so the port
    * costs nothing at scale. Top-2 customers per nation by balance
    * (total tie-break), against the ORACLE'S NATIVE QUALIFY syntax. */
  def qualifyClause(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    customer(spark, dir)
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= 2)
      .select("c_nationkey", "c_custkey", "c_acctbal", "rn")
      .orderBy("c_nationkey", "rn")
  }

  /** DISTINCT ON — the Postgres/DuckDB "first row per group under an
    * ORDER BY" dialect form (Impala users write the same thing as a
    * row_number() = 1 analytic filter; scalar-fn-call.cc evaluates
    * the tie-break exprs either way). Spark has no DISTINCT ON
    * syntax, so this row IS the translation: a row_number window
    * over the group keys with the full tie-break order (acctbal
    * DESC, custkey ASC — total, so both engines pick the identical
    * row), filtered to rank 1. Scale: one shuffle on the group keys,
    * window partitions bounded by group size, no join. */
  def distinctOn(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey", "c_mktsegment")
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    customer(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("c_nationkey", "c_mktsegment", "c_custkey", "c_acctbal")
      .orderBy("c_nationkey", "c_mktsegment")
  }

  /** Quantified comparisons — `> ALL (corr. subquery)` / `> ANY`
    * (SQL:92 surface; Impala/DuckDB evaluate them as subquery
    * rewrites, which is exactly what this query pins): each
    * supplier's account balance against ALL/ANY same-nation customer
    * balances. The scalable rewrite is the textbook one — the
    * subquery collapses to a per-nation (max, min) aggregate
    * (map-side combined, 25 rows) broadcast against the outer
    * relation; `> ALL` over an EMPTY set is TRUE and `> ANY` FALSE
    * (the left-join null probe carries the vacuous-truth case), the
    * data is null-free so the NULL-in-set subtleties don't arise.
    * One corpus scan, zero shuffles on the outer side. */
  def quantified(spark: SparkSession, dir: String): DataFrame =
    quantifiedOn(supplier(spark, dir)
        .select("s_suppkey", "s_nationkey", "s_acctbal"),
      "s_nationkey", "s_acctbal",
      customer(spark, dir), "c_nationkey", "c_acctbal")
      .orderBy("s_suppkey")

  /** Generic core of [[quantified]]: appends `gt_all` / `gt_any`
    * (outer value > ALL / > ANY inner values sharing its key) to any
    * outer relation. The inner subquery collapses to per-key
    * (max, min) bounds — map-side combined, broadcast — and the
    * left-join null probe carries the empty-set cases (> ALL of
    * nothing = TRUE, > ANY of nothing = FALSE). Inner values must be
    * non-null (SQL's NULL-in-set quantified semantics are not
    * modeled). */
  def quantifiedOn(outer: DataFrame, keyCol: String, valCol: String,
      inner: DataFrame, innerKey: String, innerVal: String): DataFrame = {
    val bounds = inner.groupBy(col(innerKey).as("__qk"))
      .agg(max(innerVal).as("__mx"), min(innerVal).as("__mn"))
    outer.join(broadcast(bounds), col(keyCol) === col("__qk"), "left")
      .withColumn("gt_all", col("__mx").isNull || col(valCol) > col("__mx"))
      .withColumn("gt_any", col("__mn").isNotNull && col(valCol) > col("__mn"))
      .drop("__qk", "__mx", "__mn")
  }

  /** Dynamic SQL surface — the two Spark 4 primitives that replace
    * string interpolation (the injection vector every service layer
    * fights): IDENTIFIER() binds a TABLE/COLUMN name as data (only a
    * valid identifier can pass — a payload string fails analysis
    * instead of executing), and EXECUTE IMMEDIATE runs a SQL text
    * with `?` parameter binding (the dynamic-statement form stored
    * procedures use). Here the fact table name arrives through
    * IDENTIFIER and the price threshold through USING — same plan,
    * same pushdown as the inlined spelling the oracle runs. */
  def dynamicSql(spark: SparkSession, dir: String): DataFrame = {
    orders(spark, dir).createOrReplaceTempView("o_dyn_v")
    spark.sql(
      """EXECUTE IMMEDIATE
        |  'SELECT o_orderstatus, count(*) AS n_orders,
        |     CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |   FROM IDENTIFIER(?) WHERE o_totalprice > ?
        |   GROUP BY o_orderstatus ORDER BY o_orderstatus'
        |  USING 'o_dyn_v', 150000""".stripMargin)
  }

  /** ORDERED-SET aggregates (SQL:2008 WITHIN GROUP — Spark 4's
    * percentile_disc): the inverse-distribution quartiles as REAL
    * members of the value set (disc, not cont — no interpolation, so
    * the result is an actual observed value and cross-engine parity
    * is exact by construction; probed: both engines return the
    * smallest value whose cumulative share reaches p). Per order
    * status: the price quartiles + count. One hash agg; at scale the
    * exact inverse distribution sorts per group — the approx sketch
    * (agg_approx_stats) is the 100 TB default, this row is the exact
    * contract it approximates. */
  def orderedSet(spark: SparkSession, dir: String): DataFrame = {
    orders(spark, dir).createOrReplaceTempView("o_ordset_v")
    spark.sql(
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
        |  percentile_disc(0.5)  WITHIN GROUP (ORDER BY o_totalprice) AS p50,
        |  percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS p75
        |FROM o_ordset_v GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin)
  }

  /** SQL SESSION VARIABLES (Spark 4 DECLARE VARIABLE / SET VAR —
    * SQL:2023 session variables): typed session state assigned from
    * a SCALAR SUBQUERY and referenced like a literal in later
    * statements — the two-statement "compute a threshold, then query
    * with it" shape that otherwise needs driver-side string
    * interpolation. The threshold is max/2 (one exact double halving
    * of an exact max — engine-bitwise, no percentile interpolation
    * caveats); the oracle inlines the identical subquery. Variables
    * resolve to plan literals, so pushdown sees the bound value. */
  def sessionVar(spark: SparkSession, dir: String): DataFrame = {
    orders(spark, dir).createOrReplaceTempView("o_var_v")
    spark.sql(
      "DECLARE OR REPLACE VARIABLE graft_price_floor DOUBLE DEFAULT 0.0")
    spark.sql(
      "SET VAR graft_price_floor = (SELECT max(o_totalprice) / 2 FROM o_var_v)")
    spark.sql(
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  max(graft_price_floor) AS price_floor
        |FROM o_var_v WHERE o_totalprice > graft_price_floor
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  /** SQL PIPE syntax (Spark 4's `|>` operators, the GoogleSQL
    * pipe-query surface): linear dataflow order — FROM first, then
    * WHERE, AGGREGATE, ORDER BY as successive stages — instead of the
    * inside-out SELECT nesting; each `|>` stage compiles to exactly
    * the operator the classic clause would, so the plan (and the
    * oracle, which runs the classic spelling) is identical. The
    * dialect row for the "queries read like pipelines" surface every
    * dataframe user asks of SQL. */
  def pipeSyntax(spark: SparkSession, dir: String): DataFrame = {
    orders(spark, dir).createOrReplaceTempView("o_pipe_v")
    spark.sql(
      """FROM o_pipe_v
        ||> WHERE o_totalprice > 100000
        ||> AGGREGATE count(*) AS n_orders,
        |     CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |   GROUP BY o_orderstatus
        ||> ORDER BY o_orderstatus""".stripMargin)
  }

  /** `SELECT * EXCEPT(...)` — the wide-table projection dialect
    * (Databricks/BigQuery EXCEPT, DuckDB EXCLUDE): project everything
    * BUT the named columns, the only sane way to write "all 500
    * feature columns minus the 2 internal ones". Spark 4 parses
    * EXCEPT natively in the select list; the oracle runs its own
    * native EXCLUDE spelling — a cross-dialect pin that the
    * column-set semantics agree. Pruning still reaches the scan: the
    * unprojected columns never leave the reader. */
  def starExcept(spark: SparkSession, dir: String): DataFrame = {
    customer(spark, dir).createOrReplaceTempView("cust_sx_v")
    spark.sql(
      """SELECT * EXCEPT (c_name, c_mktsegment)
        |FROM cust_sx_v ORDER BY c_custkey""".stripMargin)
  }

  /** KMV (k-minimum-values / theta-sketch family) SET-OPERATION
    * estimates — the sketch capability HLL cannot provide: distinct
    * UNION and INTERSECTION cardinalities of audience sets from
    * fixed-size sketches (Beyer et al. 2007; the Theta sketch is its
    * productionization). Per event-type pair: the exact audience
    * sizes/union/intersection next to the k = 64 KMV estimates —
    * est_union = (k−1)·2⁶⁰ div θ (θ = the k-th smallest hash of the
    * merged sketch), est_inter = m·est_union div k with m = merged
    * minima present in BOTH sketches; an under-full merged sketch IS
    * the exact hash set, so both estimates collapse to exact.
    *
    * Engine-exactness: hashes are Hash60 (md5-derived, shared), all
    * estimator arithmetic is integer (DECIMAL(38,0) for the
    * 63·2⁶⁰ numerator). Scale: the per-type k-minima ride the native
    * bounded-heap TopKPerKey (never a per-type sort or collect);
    * everything pairwise lives on the ≤ |types|·k sketch rows; the
    * one corpus-scale join (exact intersection ground truth) fans
    * out ≤ C(|types|,2) rows per user. */
  def kmvSetops(spark: SparkSession, dir: String): DataFrame = {
    val K = 64
    val ud = events(spark, dir)
      .select(col("event_type").as("t"), col("user_id")).distinct()
      .withColumn("h", expr(graft.operators.Hash60.sql("CAST(user_id AS STRING)")))
      .localCheckpoint() // consumers: sketches + exact sizes + exact inter
    val sk = graft.plans.TopK.perKey(ud, Seq("t"), Seq(("h", true)), K)
      .select("t", "h")
      .localCheckpoint() // ≤ |types|·k rows
    val exact = ud.groupBy("t").agg(count(lit(1)).as("n_exact"))
    val tpairs = exact.select(col("t").as("ta"), col("n_exact").as("exact_a"))
      .join(exact.select(col("t").as("tb"), col("n_exact").as("exact_b")),
        col("ta") < col("tb"))
    val exInter = ud.as("a").join(ud.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("ta"), col("b.t").as("tb"))
      .agg(count(lit(1)).as("exact_inter"))
    // merged sketch per pair: k smallest of the union of both
    // sketches' hashes (windows bounded by 2k rows per pair)
    val skA = sk.select(col("t").as("ta"), col("h"))
    val skB = sk.select(col("t").as("tb"), col("h"))
    val unionH = tpairs.select("ta", "tb").join(skA, "ta")
      .select(col("ta"), col("tb"), col("h"))
      .unionAll(tpairs.select("ta", "tb").join(skB, "tb")
        .select(col("ta"), col("tb"), col("h")))
      .distinct()
    val wPair = Window.partitionBy("ta", "tb").orderBy("h")
    val merged = unionH.withColumn("rk", row_number().over(wPair))
      .filter(col("rk") <= K)
      .join(skA.withColumn("in_a", lit(1L)), Seq("ta", "h"), "left")
      .join(skB.withColumn("in_b", lit(1L)), Seq("tb", "h"), "left")
      .groupBy("ta", "tb")
      .agg(count(lit(1)).as("n_m"), max("h").as("theta"),
        sum(when(col("in_a") === 1L && col("in_b") === 1L, 1L).otherwise(0L))
          .as("m_both"))
      .withColumn("kmv_union_est", when(col("n_m") < K, col("n_m"))
        .otherwise(expr(s"CAST(CAST(${K - 1} AS DECIMAL(38,0)) * " +
          "1152921504606846976 div theta AS BIGINT)")))
      .withColumn("kmv_inter_est", when(col("n_m") < K, col("m_both"))
        .otherwise(expr(s"m_both * kmv_union_est div $K")))
    tpairs.join(exInter, Seq("ta", "tb"), "left")
      .na.fill(0L, Seq("exact_inter"))
      .join(merged.select("ta", "tb", "kmv_union_est", "kmv_inter_est"),
        Seq("ta", "tb"))
      .select(col("ta"), col("tb"), col("exact_a"), col("exact_b"),
        (col("exact_a") + col("exact_b") - col("exact_inter"))
          .as("exact_union"),
        col("exact_inter"), col("kmv_union_est"), col("kmv_inter_est"))
      .orderBy("ta", "tb")
  }
}
