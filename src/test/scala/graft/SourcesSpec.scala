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

  test("dict cardinality stats: low-NDV flags encodable, high-NDV key is not at scale") {
    val rows = queries.SourcesSinks.dictCardinalityStats(spark, sf).collect()
      .map(r => r.getAs[String]("column_name") ->
        (r.getAs[Long]("ndv"), r.getAs[Boolean]("dict_encodable"))).toMap
    assert(rows("l_returnflag")._1 == 3 && rows("l_returnflag")._2)
    assert(rows("l_linestatus")._1 == 2 && rows("l_linestatus")._2)
    assert(rows("l_partkey")._1 > rows("l_quantity")._1)
  }
}
