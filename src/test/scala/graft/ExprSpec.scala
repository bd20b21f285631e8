package graft

import org.apache.spark.sql.functions._

class ExprSpec extends SparkSpec {

  test("string funcs: upper/substr/concat_ws behave as documented") {
    val r = queries.Exprs.stringFuncs(spark, sf).limit(1).collect()(0)
    val nameUpper = r.getAs[String]("name_upper")
    assert(nameUpper == nameUpper.toUpperCase)
    assert(r.getAs[String]("type_prefix").length <= 3)
    assert(r.getAs[String]("brand_type").contains("/"))
  }

  test("math/case: disc_band matches the discount value") {
    val rows = queries.Exprs.mathCase(spark, sf).limit(500).collect()
    assert(rows.nonEmpty)
    rows.foreach { r => assert(Set("HIGH", "ZERO", "LOW")(r.getAs[String]("disc_band"))) }
  }

  test("date funcs: month in 1..12, quarter consistent with month") {
    val rows = queries.Exprs.dateFuncs(spark, sf).limit(500).collect()
    rows.foreach { r =>
      val m = r.getAs[Long]("o_month"); val q = r.getAs[Long]("o_quarter")
      assert(m >= 1 && m <= 12)
      assert(q == (m - 1) / 3 + 1)
    }
  }

  test("date parse: string roundtrip recovers the original date exactly") {
    import org.apache.spark.sql.functions._
    val rows = queries.Exprs.dateParse(spark, sf).limit(500).collect()
    rows.foreach { r =>
      val ymd = r.getAs[String]("ymd")
      val parsed = r.getAs[java.sql.Date]("parsed")
      assert(ymd == parsed.toLocalDate.format(
        java.time.format.DateTimeFormatter.BASIC_ISO_DATE), s"$ymd != $parsed")
      assert(r.getAs[Long]("epoch_day") == parsed.toLocalDate.toEpochDay)
      val wd = r.getAs[Long]("weekday")
      assert(wd >= 1 && wd <= 7)
    }
  }

  test("hash digests are stable hex strings") {
    val rows = queries.Exprs.hashDigest(spark, sf).limit(5).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("digest_md5").matches("[0-9a-f]{32}"))
      assert(r.getAs[String]("digest_sha256").matches("[0-9a-f]{64}"))
    }
  }

  test("crc-family hashes: stock check vectors, aggregates invariant to partitioning") {
    import spark.implicits._
    // the classic zlib CRC32 check value, and crc32 of empty input
    val v = Seq("123456789", "").toDF("s")
      .select(crc32(col("s").cast("binary")).as("c"))
      .collect().map(_.getLong(0))
    assert(v(0) == 0xCBF43926L, f"crc32('123456789') = ${v(0)}%x")
    assert(v(1) == 0L)
    // xxhash64 must be deterministic across sessions for equal input
    val x = Seq("graft", "graft").toDF("s").select(xxhash64(col("s")))
      .collect().map(_.getLong(0))
    assert(x(0) == x(1))
    // the driver's oracle pins the fixed known-answer vectors; pin
    // here the data-dependent invariant it can't: every aggregate is
    // an order-free fold, identical under adversarial repartitionings
    // of the same row set
    val kat = queries.Exprs.hashCrc(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(kat("123456789") == ((0xCBF43926L, -6808433898042478093L)))
    assert(kat("") == ((0L, -7444071767201028348L)))
    val docs = graft.sources.Tables.documents(spark, sf)
    val base = queries.Exprs.crcAgg(docs).collect()(0).toSeq
    val shuffled = queries.Exprs.crcAgg(
      docs.repartition(7, col("doc_id"))).collect()(0).toSeq
    val oneDesc = queries.Exprs.crcAgg(
      docs.repartition(1).sortWithinPartitions(col("text").desc)).collect()(0).toSeq
    assert(base == shuffled && base == oneDesc, s"$base / $shuffled / $oneDesc")
    assert(base.head.asInstanceOf[Long] > 0)
  }

  test("null semantics: nullif(0.0) is null and coalesce restores -1") {
    val df = queries.Exprs.nullSemantics(spark, sf)
      .filter(col("is_zero_nullsafe"))
    val rows = df.limit(10).collect()
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("disc_or_null")))
      assert(r.getAs[Double]("disc_coalesced") == -1.0)
    }
  }

  test("date interval kernel replays with java.time (clamping, dow, quarter)") {
    import java.time.LocalDate
    val rows = queries.Exprs.dateInterval(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[java.sql.Date]("d").toLocalDate
      assert(r.getAs[java.sql.Date]("plus_3m").toLocalDate == d.plusMonths(3))
      assert(r.getAs[java.sql.Date]("plus_30d").toLocalDate == d.plusDays(30))
      assert(r.getAs[java.sql.Date]("month_end").toLocalDate ==
        d.`with`(java.time.temporal.TemporalAdjusters.lastDayOfMonth()))
      assert(r.getAs[Long]("qtr") == (d.getMonthValue - 1) / 3 + 1)
      assert(r.getAs[Long]("dow") == d.getDayOfWeek.getValue % 7)
    }
    // the month-end clamp path must actually be exercised
    assert(rows.exists { r =>
      val d = r.getAs[java.sql.Date]("d").toLocalDate
      d.getDayOfMonth > d.plusMonths(3).getDayOfMonth
    }, "no clamping date in the domain")
  }

  test("array set ops: per-row sets replay exactly") {
    val fixed = Set("tin", "steel", "brass")
    val byKey = graft.sources.Tables.part(spark, sf)
      .selectExpr("p_partkey", "lower(p_type) as t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = queries.Exprs.arraySetOps(spark, sf).collect()
    assert(rows.length == byKey.size)
    rows.foreach { r =>
      val words = byKey(r.getAs[Long]("p_partkey")).split(" ")
      val ws = words.toSet
      assert(r.getAs[Long]("n_words") == words.length)
      assert(r.getAs[String]("inter") == (ws & fixed).toSeq.sorted.mkString("|"))
      assert(r.getAs[String]("uni") == (ws | fixed).toSeq.sorted.mkString("|"))
      assert(r.getAs[String]("exc") == (ws -- fixed).toSeq.sorted.mkString("|"))
    }
  }

  test("string kernel 2: pads fixed-width, translate maps vowels, slices bound") {
    val rows = queries.Exprs.stringKernel2(spark, sf).limit(200).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("brand_lpad").length == 12)
      assert(r.getAs[String]("brand_rpad").length == 12)
      assert(!r.getAs[String]("type_vowels").exists("aeiou".contains(_)))
      assert(r.getAs[String]("type_left5").length <= 5)
      assert(r.getAs[String]("type_right4").length <= 4)
      val rev = r.getAs[String]("name_rev")
      assert(rev.reverse.reverse == rev)
    }
  }

  test("try arithmetic: null counts equal the directly-computed boundaries") {
    import org.apache.spark.sql.functions._
    val rows = queries.Exprs.tryArith(spark, sf).collect()
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber").collect()
      .groupBy(_.getAs[String]("l_returnflag"))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = li(r.getAs[String]("l_returnflag"))
      assert(r.getAs[Long]("n_rows") == g.length)
      // overflow boundaries recomputed in BigInt, independently
      assert(r.getAs[Long]("mul_nulls") == g.count(x =>
        BigInt(x.getAs[Long]("l_orderkey") % 13300) * BigInt(700000000000000L) >
          BigInt(Long.MaxValue)))
      assert(r.getAs[Long]("add_nulls") == g.count(x =>
        BigInt(Long.MaxValue - 1000L) + BigInt(x.getAs[Long]("l_partkey") % 1024) >
          BigInt(Long.MaxValue)))
      assert(r.getAs[Long]("sub_nulls") == g.count(x =>
        BigInt(Long.MinValue + 50L) - BigInt(x.getAs[Long]("l_suppkey") % 52) <
          BigInt(Long.MinValue)))
      assert(r.getAs[Long]("div_nulls") == g.count(
        _.getAs[Long]("l_orderkey") % 97 == 0))
      // survivors stay representable: max of the non-null multiply is
      // the largest in-range key times the multiplier
      val okKeys = g.map(_.getAs[Long]("l_orderkey") % 13300)
        .filter(k => BigInt(k) * BigInt(700000000000000L) <= BigInt(Long.MaxValue))
      if (okKeys.nonEmpty)
        assert(r.getAs[Long]("mul_max") == okKeys.max * 700000000000000L)
    }
  }

  test("decimal rounding: HALF_UP at exact halves, both digit directions") {
    // exact .x5 halves — where HALF_UP (Spark) and round-half-away-
    // from-zero (DuckDB) agree on positives, pinned so a future
    // half-even regression fails loudly
    val rows = spark.sql(
      """SELECT v, CAST(round(v, 1) AS STRING) AS r1,
        |       CAST(round(v, -2) AS BIGINT) AS rh
        |FROM VALUES (CAST(0.05 AS DECIMAL(18,2))), (CAST(2.25 AS DECIMAL(18,2))),
        |  (CAST(2.35 AS DECIMAL(18,2))), (CAST(149.99 AS DECIMAL(18,2))),
        |  (CAST(150.00 AS DECIMAL(18,2))), (CAST(250.00 AS DECIMAL(18,2))) t(v)
        |ORDER BY v""".stripMargin).collect()
      .map(r => (r.getAs[java.math.BigDecimal]("v").toPlainString,
        r.getAs[String]("r1"), r.getAs[Long]("rh")))
    assert(rows.toSeq == Seq(
      ("0.05", "0.1", 0L), ("2.25", "2.3", 0L), ("2.35", "2.4", 0L),
      ("149.99", "150.0", 100L), ("150.00", "150.0", 200L),
      ("250.00", "250.0", 300L)))
  }
}
