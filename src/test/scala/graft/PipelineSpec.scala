package graft

import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("clean-corpus pipeline: stats consistent with running the stages separately") {
    val rows = operators.Pipeline.cleanCorpusStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") > 0)
      assert(r.getAs[Double]("min_quality") >= 0.5) // the gate held
      assert(r.getAs[Double]("min_quality") <= r.getAs[Double]("max_quality"))
    }
    // total kept docs == number of distinct surviving digests
    val docs = graft.sources.Tables.documents(spark, sf)
      .withColumn("norm", expr("trim(regexp_replace(lower(text), '\\\\s+', ' '))"))
    val keptDocs = operators.TextAnalysis.quality(spark, sf)
      .filter(col("quality_score") >= 0.5).select("doc_id")
    val expected = docs.join(keptDocs, "doc_id")
      .select(md5(col("norm"))).distinct().count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == expected)
  }
}
