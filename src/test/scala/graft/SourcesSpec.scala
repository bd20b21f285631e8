package graft

class SourcesSpec extends SparkSpec {

  test("delimited text roundtrip preserves the nation join") {
    val rows = queries.SourcesSinks.delimitedText(spark, sf).collect()
    assert(rows.length == 25)
    assert(rows.map(_.getAs[Int]("n_nationkey")).toSeq == (0 until 25))
  }

  test("parquet sink roundtrip aggregates match a direct query") {
    val viaSink = queries.SourcesSinks.parquetRoundtrip(spark, sf).collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[Long]("n_rows"))).toMap
    import org.apache.spark.sql.functions._
    val direct = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
      .groupBy("l_returnflag").count().collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[Long]("count"))).toMap
    assert(viaSink == direct)
  }

  test("v2 encoded sink: delta encodings for keys, dictionary for low-NDV, exact roundtrip") {
    import org.apache.spark.sql.functions._
    // run the query first (writes the files), check the aggregate matches
    val viaSink = queries.SourcesSinks.encodedSink(spark, sf).collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[Long]("sum_okey"))).toMap
    val direct = graft.sources.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(sum("l_orderkey").as("s")).collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[Long]("s"))).toMap
    assert(viaSink == direct)
    // then open a footer and assert the per-column encoding choices landed
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val dirPath = new java.io.File(queries.SourcesSinks.encodedSinkPath(spark, sf))
    val part = dirPath.listFiles().filter(_.getName.endsWith(".parquet")).head
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(part.getAbsolutePath), new Configuration()))
    try {
      val chunks = reader.getFooter.getBlocks.asScala.head.getColumns.asScala
      def encodings(col: String): Set[String] =
        chunks.find(_.getPath.toDotString == col).get
          .getEncodings.asScala.map(_.name()).toSet
      // dict disabled per-column => v2 delta bit-packing (the FLE analog)
      assert(encodings("l_orderkey").contains("DELTA_BINARY_PACKED"), encodings("l_orderkey"))
      assert(encodings("l_partkey").contains("DELTA_BINARY_PACKED"), encodings("l_partkey"))
      // low-NDV string keeps dictionary encoding
      assert(encodings("l_returnflag").exists(e => e.contains("DICTIONARY")), encodings("l_returnflag"))
    } finally reader.close()
  }

  test("json-lines roundtrip preserves per-type aggregates exactly") {
    import org.apache.spark.sql.functions._
    val viaJson = queries.SourcesSinks.jsonLines(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    val direct = graft.sources.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).cast("double").as("s"),
        min(expr("ts div 1000000000")).as("f"), max(expr("ts div 1000000000")).as("l"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    assert(viaJson == direct)
  }

  test("bucketed join: no exchange or sort on the join inputs, result matches plain join") {
    import org.apache.spark.sql.functions._
    val df = queries.SourcesSinks.bucketedJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    // bucketed scans: the only exchanges are the post-join agg and the
    // final sort; an un-bucketed SMJ would add two more + two sorts
    val nExchanges = "Exchange".r.findAllIn(plan).length
    assert(nExchanges <= 2, s"expected <=2 exchanges, got $nExchanges:\n${plan.take(3000)}")
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
      "join inputs are not bucketed scans")
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val want = graft.sources.Tables.orders(spark, sf)
      .join(graft.sources.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
  }

  /** rows materialized by every parquet/orc file scan in the executed
    * plan — AFTER row-group/page stats skipping, so it measures what
    * the layout let the reader avoid. */
  private def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.collect()
    def find(p: SparkPlan): Long = p match {
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case q: QueryStageExec => find(q.plan)
      case f: FileSourceScanExec => f.metrics("numOutputRows").value
      case other => other.children.map(find).sum
    }
    find(df.queryExecution.executedPlan)
  }

  test("orc roundtrip matches the parquet table and pushes its predicate") {
    import org.apache.spark.sql.functions._
    val viaOrc = queries.SourcesSinks.orcRoundtrip(spark, sf)
    val plan = viaOrc.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_totalprice"), plan.take(2000))
    val got = viaOrc.collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    val want = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 1000.0)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("s"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got == want)
  }

  test("sort-clustered layout skips row groups the unsorted control must read") {
    import org.apache.spark.sql.functions._
    val sorted = queries.SourcesSinks.sortedSink(spark, sf) // writes the clustered layout
    // control: identical rows and row-group size, no clustering
    val unsortedPath = queries.SourcesSinks.tmp(spark, sf, "lineitem_unsorted")
    graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_shipdate").cast("date").as("l_shipdate"),
        col("l_quantity"), col("l_extendedprice"))
      .repartition(4)
      .write.mode("overwrite")
      .option("parquet.block.size", (256 * 1024).toString).parquet(unsortedPath)
    val control = queries.SourcesSinks.sortedRangeRead(spark, unsortedPath)
    // both layouts return the identical aggregate...
    val a = sorted.collect()(0); val b = control.collect()(0)
    assert(a.getLong(0) == b.getLong(0) && a.getDouble(1) == b.getDouble(1))
    // ...but the clustered one materializes a fraction of the rows
    val sortedRows = scanRows(queries.SourcesSinks.sortedRangeRead(spark,
      queries.SourcesSinks.tmp(spark, sf, "lineitem_sorted")))
    val unsortedRows = scanRows(control)
    assert(sortedRows * 3 <= unsortedRows,
      s"layout skipped nothing: sorted=$sortedRows unsorted=$unsortedRows")
  }

  test("schema evolution: legacy rows surface with NULL status under mergeSchema") {
    import org.apache.spark.sql.functions._
    val rows = queries.SourcesSinks.schemaEvolution(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = graft.sources.Tables.orders(spark, sf)
    assert(rows("(legacy)") == o.filter(col("o_orderkey") % 2 === 0).count())
    assert(rows.filterNot(_._1 == "(legacy)").values.sum ==
      o.filter(col("o_orderkey") % 2 =!= 0).count())
  }

  test("dict cardinality stats: low-NDV flags encodable, high-NDV key is not at scale") {
    val rows = queries.SourcesSinks.dictCardinalityStats(spark, sf).collect()
      .map(r => r.getAs[String]("column_name") ->
        (r.getAs[Long]("ndv"), r.getAs[Boolean]("dict_encodable"))).toMap
    assert(rows("l_returnflag")._1 == 3 && rows("l_returnflag")._2)
    assert(rows("l_linestatus")._1 == 2 && rows("l_linestatus")._2)
    assert(rows("l_partkey")._1 > rows("l_quantity")._1)
  }

  test("dict cardinality stats plans per-column distinct branches, no Expand") {
    // N countDistinct in one agg would plan an Expand multiplying every
    // row ×N before the partial agg — the measured 100 TB anti-pattern
    val plan = queries.SourcesSinks.dictCardinalityStats(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan.take(3000))
    // each branch must be a pruned single-column scan
    assert("ReadSchema: struct<l_partkey".r.findFirstIn(plan).isDefined, plan.take(3000))
  }
}
