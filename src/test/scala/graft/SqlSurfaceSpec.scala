package graft

import org.apache.spark.sql.functions._

class SqlSurfaceSpec extends SparkSpec {

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
    val path = s"/tmp/graft_io/events_parts_${math.abs(sf.hashCode)}"
    val plan = queries.SqlSurface.partitionPrunedRead(spark, path)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("event_type"), plan)
  }

  test("json props stats cover every event type") {
    val rows = queries.SqlSurface.jsonProps(spark, sf).collect()
    assert(rows.map(_.getAs[String]("event_type")).toSet ==
      Set("click", "error", "purchase", "signup", "view"))
    rows.foreach(r => assert(r.getAs[Long]("min_k") <= r.getAs[Long]("max_k")))
  }
}
