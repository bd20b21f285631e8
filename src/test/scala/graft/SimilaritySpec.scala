package graft

import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("brute-force topk: 10 ranked neighbors per probe, cosine-descending") {
    val rows = operators.Similarity.bruteForceTopK(spark, sf).collect()
    val byProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    assert(byProbe.size == 5)
    byProbe.foreach { case (pid, rs) =>
      assert(rs.length == 10)
      assert(rs.forall(_.getAs[Long]("vec_id") != pid))
      val ordered = rs.sortBy(_.getAs[Long]("rank"))
      val cos = ordered.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ivf topk: k results per probe, all drawn from probed cells") {
    val rows = operators.Similarity.ivfTopK(spark, sf).collect()
    val byProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    assert(byProbe.size == 5)
    byProbe.foreach { case (_, rs) =>
      assert(rs.length == 10)
      // ≤ NProbe distinct cells contributed
      assert(rs.map(_.getAs[Long]("cell")).distinct.length <= operators.Similarity.NProbe)
    }
  }

  test("ivf overlaps brute force (same scoring, pruned candidate set)") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val bf = pairs(operators.Similarity.bruteForceTopK(spark, sf))
    val ivf = pairs(operators.Similarity.ivfTopK(spark, sf))
    // random vectors spread neighbors across cells; probing 4/16
    // cells must still recover a nonzero chunk of the true top-10
    assert((bf intersect ivf).nonEmpty, "ivf found none of the true neighbors")
  }

  test("graft_dot matches a manual dot product") {
    import spark.implicits._
    graft.sources.Tables.events(spark, sf) // registers graft_dot
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val got = df.select(call_function("graft_dot", col("a"), col("b"))).collect()(0).getDouble(0)
    assert(got == 32.0)
  }
}
