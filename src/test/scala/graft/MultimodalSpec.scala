package graft

class MultimodalSpec extends SparkSpec {

  test("binary metadata: byte lengths and digests line up with the text") {
    val rows = operators.Multimodal.binaryMeta(spark, sf).collect()
    assert(rows.length == graft.sources.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bytes") > 0)
      assert(r.getAs[String]("payload_md5").matches("[0-9a-f]{32}"))
      assert(r.getAs[Long]("fake_width") >= 1 && r.getAs[Long]("fake_width") <= 1920)
      assert(r.getAs[Long]("fake_height") >= 1 && r.getAs[Long]("fake_height") <= 1080)
    }
  }

  test("partition-parallel decode stub: one decoded row per document, deterministic") {
    val a = operators.Multimodal.decodeBatch(spark, sf).collect().sortBy(_.doc_id)
    val b = operators.Multimodal.decodeBatch(spark, sf).collect().sortBy(_.doc_id)
    assert(a.length == graft.sources.Tables.documents(spark, sf).count())
    assert(a.map(d => (d.doc_id, d.width, d.height)).sameElements(
      b.map(d => (d.doc_id, d.width, d.height))))
    a.foreach { d =>
      assert(d.ok && d.n_bytes > 0)
      assert(d.width >= 1 && d.height >= 1)
    }
  }
}
