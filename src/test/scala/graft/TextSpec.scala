package graft

class TextSpec extends SparkSpec {

  test("langid covers every doc and predictions come from the lang set") {
    val rows = operators.TextAnalysis.langId(spark, sf).collect()
    assert(rows.length == graft.sources.Tables.documents(spark, sf).count())
    val langs = Set("de", "en", "es", "fr", "zh")
    rows.foreach { r =>
      assert(langs(r.getAs[String]("predicted_lang")))
      assert(r.getAs[Boolean]("correct") ==
        (r.getAs[String]("predicted_lang") == r.getAs[String]("lang")))
    }
  }

  test("quality ratios are in [0,1] and the score is bounded") {
    val rows = operators.TextAnalysis.quality(spark, sf).collect()
    rows.foreach { r =>
      for (c <- Seq("stop_ratio", "digit_ratio", "punct_ratio")) {
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c=$v")
      }
      val q = r.getAs[Double]("quality_score")
      assert(q >= 0.0 && q <= 1.0, s"quality=$q")
    }
  }

  test("token counts: bpe tokens >= whitespace tokens on word text") {
    val rows = operators.TextAnalysis.tokens(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("ws_tokens") >= 1)
      // every >4-char word splits into multiple BPE-ish chunks
      assert(r.getAs[Long]("bpe_tokens") >= r.getAs[Long]("ws_tokens"))
    }
  }

  test("fingerprint is deterministic and within the modulus") {
    val a = operators.TextAnalysis.fingerprint(spark, sf).collect()
    val b = operators.TextAnalysis.fingerprint(spark, sf).collect()
    assert(a.map(_.getLong(1)).sameElements(b.map(_.getLong(1))))
    a.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) < 1000000007L))
    // distinct texts ⇒ (near-certainly) many distinct fingerprints
    assert(a.map(_.getLong(1)).distinct.length > a.length / 2)
  }
}
