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

  test("token budget: selection is a prefix per language and stops at the budget") {
    val rows = operators.Pipeline.tokenBudget(spark, sf).collect()
    for ((_, rs0) <- rows.groupBy(_.getAs[String]("lang"))) {
      val rs = rs0.sortBy(_.getAs[Long]("doc_id"))
      // cumsum is monotone and selection is a contiguous prefix
      val cums = rs.map(_.getAs[Long]("cum_tokens"))
      assert(cums.sameElements(cums.sorted))
      val sel = rs.map(_.getAs[Boolean]("selected"))
      assert(!sel.dropWhile(identity).contains(true), "selection is not a prefix")
      // kept prefix stays within budget; first cut doc overflows it
      rs.filter(_.getAs[Boolean]("selected"))
        .foreach(r => assert(r.getAs[Long]("cum_tokens") <= 2000L))
      rs.find(!_.getAs[Boolean]("selected"))
        .foreach(r => assert(r.getAs[Long]("cum_tokens") > 2000L))
      // both branches fire at every test SF
      assert(sel.contains(true) && sel.contains(false), "budget never binds")
    }
  }

  test("source stats: dup pressure and totals match independent computations") {
    val rows = operators.Pipeline.sourceStats(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .withColumn("norm", expr("trim(regexp_replace(lower(text), '\\\\s+', ' '))"))
      .select(col("source"), md5(col("norm")).as("digest"))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // dup_docs re-derived: digests appearing more than once corpus-wide
    val dupDigests = docs.groupBy("digest").count().filter(col("count") > 1)
      .select("digest").collect().map(_.getString(0)).toSet
    val wantDups = docs.collect()
      .filter(r => dupDigests.contains(r.getString(1)))
      .groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("dup_docs") == wantDups.getOrElse(src, 0L), src)
      assert(r.getAs[Double]("dup_share") ==
        r.getAs[Long]("dup_docs").toDouble / r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_langs") >= 1 && r.getAs[Long]("n_langs") <= 5)
    }
  }

  test("leakage split: exact duplicates never span train and eval; both sides populated") {
    val rows = operators.Pipeline.leakageSplit(spark, sf).collect()
    val bySplit = rows.groupBy(_.getAs[String]("split"))
    assert(bySplit.keySet == Set("train", "eval"), bySplit.keySet)
    assert(bySplit("eval").length > 0 && bySplit("train").length > bySplit("eval").length)
    // shuffle-free: a pure projection + final sort only
    val plan = operators.Pipeline.leakageSplit(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
    // the leakage guard, exercised for real: this SF's corpus has no
    // exact duplicates, so simulate the re-crawl case — the same
    // content arriving again under NEW doc_ids — and run the operator
    // on the augmented corpus. Every duplicated pair must land on one
    // side; an id-hash split would scatter them ~10% of the time.
    val docs = graft.sources.Tables.documents(spark, sf)
    val maxId = docs.agg(max("doc_id")).collect()(0).getLong(0)
    val recrawled = docs.limit(40)
      .withColumn("doc_id", col("doc_id") + maxId + 1)
    val augDir = queries.SourcesSinks.tmp(spark, sf, "leakage_aug")
    docs.unionByName(recrawled).write.mode("overwrite")
      .parquet(s"$augDir/documents.parquet")
    val aug = operators.Pipeline.leakageSplit(spark, augDir).collect()
    val dupGroups = aug.groupBy(_.getAs[String]("digest")).filter(_._2.length > 1)
    assert(dupGroups.nonEmpty, "augmented corpus lost its duplicates")
    dupGroups.foreach { case (d, rs) =>
      assert(rs.map(_.getAs[String]("split")).distinct.length == 1,
        s"digest $d spans both splits")
    }
  }

  test("token budget: sharded cumsum equals the naive per-language window exactly") {
    import org.apache.spark.sql.expressions.Window
    // the two-level prefix-sum decomposition must be invisible in the
    // output: same cum_tokens as one window over the whole language
    val naive = {
      val w = Window.partitionBy("lang").orderBy("doc_id")
      graft.sources.Tables.documents(spark, sf)
        .select(col("doc_id"), col("lang"),
          size(split(expr("trim(regexp_replace(lower(text), '\\\\s+', ' '))"), " "))
            .cast("bigint").as("n_tokens"))
        .withColumn("cum_tokens", sum("n_tokens").over(w))
        .withColumn("selected", col("cum_tokens") <= 2000L)
    }
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "lang", "n_tokens", "cum_tokens", "selected").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
        .toSet
    assert(asSet(operators.Pipeline.tokenBudget(spark, sf)) == asSet(naive))
  }

  test("token budget: the doc-level window is sharded, not per-language") {
    // a lang-only window serializes each language through ONE task at
    // any scale; the doc-level cumsum must partition by (lang, shard)
    val plan = operators.Pipeline.tokenBudget(spark, sf)
      .queryExecution.executedPlan.toString
    val docWin = """windowspecdefinition\(lang#\d+, shard#\d+L?, doc_id""".r
    assert(docWin.findFirstIn(plan).isDefined,
      s"doc-level cumsum window is not sharded:\n${plan.take(3000)}")
    // multiple shards actually exist per language at test SF
    val nShards = operators.Pipeline.tokenBudget(spark, sf)
      .selectExpr("doc_id div 16 AS shard").distinct().count()
    assert(nShards > 1, s"only $nShards shard(s) — width too wide for this SF")
  }

  test("curriculum bands partition the corpus without a global-sort window") {
    val df = operators.Pipeline.curriculum(spark, sf)
    val rows = df.collect()
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total,
      "phases must partition the corpus")
    val phases = rows.map(_.getAs[String]("phase")).toSet
    assert(phases.subsetOf(Set("1_easy", "2_core", "3_hard")), phases)
    assert(phases.size == 3, s"only $phases fired — z-bands degenerate at this SF")
    rows.foreach { r =>
      assert(r.getAs[Double]("min_score") <= r.getAs[Double]("max_score"))
    }
    // the band pick must be a broadcast + projection, never a global
    // ntile sort (the unpartitioned-window anti-pattern)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("shard manifest conserves docs/tokens and re-derives per-shard checksums") {
    val rows = operators.Pipeline.shardManifest(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .withColumn("norm", expr("trim(regexp_replace(lower(text), '\\\\s+', ' '))"))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    assert(rows.forall { r =>
      val s = r.getAs[Long]("shard"); s >= 0 && s < 16
    })
    // checksum re-derived independently for one shard: order-free sum
    // of the digest-hash residues, folded mod the prime (the
    // shard-size-proof form the operator ships)
    val want = docs
      .select(md5(col("norm")).as("digest"))
      .selectExpr(
        operators.Hash60.sql("digest") + " % 16 AS shard",
        operators.Hash60.sql("digest") + " % 1000000007 AS chk")
      .groupBy("shard")
      .agg((sum(col("chk").cast("decimal(38,0)")) % 1000000007L)
        .cast("long").as("checksum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("checksum") == want(r.getAs[Long]("shard")))
    }
  }

  test("data quality core: planted violations count exactly, null predicates don't") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, 5.0, "x"), (2L, -1.0, "y"), (3L, 200.0, null))
      .toDF("id", "v", "s")
    val rows = operators.Pipeline.dataQualityOn(df, Seq(
        "v_range" -> (col("v") < 0.0 || col("v") > 100.0),
        "s_nonnull" -> col("s").isNull,
        // null comparison result (s = 'x' when s is null) must count
        // as NON-violation, not explode or count as one
        "s_is_x" -> (col("s") =!= "x")))
      .collect().map(r => r.getAs[String]("check_name") ->
        (r.getAs[Long]("n_violations"), r.getAs[Boolean]("pass"))).toMap
    assert(rows("v_range") == ((2L, false)))
    assert(rows("s_nonnull") == ((1L, false)))
    assert(rows("s_is_x") == ((1L, false))) // only row 2 ('y'); null row skipped
    val dup = intercept[IllegalArgumentException] {
      operators.Pipeline.dataQualityOn(df, Seq(
        "a" -> col("v").isNull, "a" -> col("s").isNull))
    }
    assert(dup.getMessage.contains("unique"))
  }

  test("negative sampling: full slot coverage, no self-pairs, run-reproducible") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pool = (1L to 256L).toDF("doc_id")
    val anchors = (1L to 16L).toDF("doc_id")
    def run() = operators.Pipeline
      .negativeSampleOn(pool, anchors, buckets = 4L, k = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("slot"),
        r.getAs[Long]("neg_id"))).sorted.toSeq
    val s = run()
    // 4 buckets over 256 docs: no bucket can be empty, so every
    // (anchor, slot) must produce a draw
    assert(s.length == 16 * 3, s"got ${s.length} rows")
    s.foreach { case (a, _, n) => assert(a != n, s"self-pair $a") }
    // the sample is a pure function of the ids: a second run (and a
    // repartitioned pool) reproduces it exactly
    assert(run() == s)
    assert(operators.Pipeline
      .negativeSampleOn(pool.repartition(7), anchors, buckets = 4L, k = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("slot"),
        r.getAs[Long]("neg_id"))).sorted.toSeq == s)
  }

  test("quantile norm: domain-compressed CDF equals the window form incl. ties and singletons") {
    import spark.implicits._
    // planted ties (three 10s in src a), a singleton source, and an
    // all-equal source — the three edge shapes of percent_rank/cume_dist
    val rows = Seq(
      (1L, "a", 10L), (2L, "a", 10L), (3L, "a", 10L), (4L, "a", 20L), (5L, "a", 30L),
      (6L, "b", 7L),
      (7L, "c", 5L), (8L, "c", 5L)
    ).toDF("doc_id", "source", "v")
    val got = operators.Pipeline.quantileNormOn(rows)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pct_ppm"),
        r.getAs[Double]("cd"))).sortBy(_._1).toSeq
    // window-form truth: rank()/count() integers (percent_rank's
    // (rank-1)/(n-1) as EXACT ppm floor division, not a double floor)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("v")
    val truth = rows
      .withColumn("rnk", rank().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("source")))
      .withColumn("pct_ppm", when(col("cnt") > 1,
        expr("(rnk - 1) * 1000000L div (cnt - 1)")).otherwise(0L))
      .withColumn("cd", cume_dist().over(w))
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("pct_ppm"),
        r.getAs[Double]("cd"))).sortBy(_._1).toSeq
    assert(got == truth)
    // repartition-invariant: the result is a pure function of the row set
    val got2 = operators.Pipeline.quantileNormOn(rows.repartition(5))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pct_ppm"),
        r.getAs[Double]("cd"))).sortBy(_._1).toSeq
    assert(got2 == got)
  }

  test("time split: cutoff, partitions, and the spanning audit replay driver-side") {
    val r = operators.Pipeline.timeSplit(spark, sf).collect().head
    val ev = graft.sources.Tables.events(spark, sf)
      .selectExpr("user_id", "ts div 1000000000 div 86400 AS day")
      .collect().map(x => (x.getAs[Long]("user_id"), x.getAs[Long]("day")))
    val days = ev.map(_._2)
    val cutoff = days.min + (days.max - days.min) * 4 / 5
    assert(r.getAs[Long]("cutoff_day") == cutoff)
    assert(r.getAs[Long]("n_train_events") == ev.count(_._2 <= cutoff))
    assert(r.getAs[Long]("n_val_events") == ev.count(_._2 > cutoff))
    val byUser = ev.groupBy(_._1)
    val span = byUser.values.count(g => g.exists(_._2 <= cutoff) && g.exists(_._2 > cutoff))
    assert(r.getAs[Long]("n_spanning") == span)
    assert(r.getAs[Long]("n_users") == byUser.size)
    assert(r.getAs[Long]("spanning_ppm") == span.toLong * 1000000L / byUser.size)
    // the partitions reassemble the corpus
    assert(r.getAs[Long]("n_train_events") + r.getAs[Long]("n_val_events") == ev.length)
  }

  test("rater kappa: textbook contingency tables score the known kappa values") {
    import spark.implicits._
    def kappa(cells: Seq[(Long, Boolean, Boolean)]): (Long, Long, Long, Long, Double) = {
      val a = cells.map { case (id, ka, _) => (id, ka) }.toDF("doc_id", "ka")
      val b = cells.map { case (id, _, kb) => (id, kb) }.toDF("doc_id", "kb")
      val r = operators.Pipeline.raterKappaOn(a, b).collect().head
      (r.getAs[Long]("both_keep"), r.getAs[Long]("only_a"),
        r.getAs[Long]("only_b"), r.getAs[Long]("both_drop"),
        r.getAs[Double]("kappa"))
    }
    // perfect agreement: kappa = 1
    val perfect = (1L to 10L).map(i => (i, i % 2 == 0, i % 2 == 0))
    assert(kappa(perfect)._5 == 1.0)
    // textbook 2x2: a=20 b=5 c=10 d=15, n=50 -> po=.7 pe=.5 -> kappa=.4
    val cells = (1L to 20L).map(i => (i, true, true)) ++
      (21L to 25L).map(i => (i, true, false)) ++
      (26L to 35L).map(i => (i, false, true)) ++
      (36L to 50L).map(i => (i, false, false))
    val (bk, oa, ob, bd, k) = kappa(cells)
    assert((bk, oa, ob, bd) == (20L, 5L, 10L, 15L))
    assert(math.abs(k - 0.4) < 1e-12, s"kappa $k")
    // independent-looking raters: kappa near 0 (exactly 0 for the
    // product table a=9 b=21 c=6 d=14: po = pe)
    val indep = (1L to 9L).map(i => (i, true, true)) ++
      (10L to 30L).map(i => (i, true, false)) ++
      (31L to 36L).map(i => (i, false, true)) ++
      (37L to 50L).map(i => (i, false, false))
    assert(kappa(indep)._5 == 0.0)
  }

  test("rebalance: ceil repetition factors reach the target with bounded overshoot") {
    import spark.implicits._
    // a×5, b×2, c×1 → target 5; factors a=1, b=3, c=5
    val docs = (Seq.tabulate(5)(i => (i.toLong, "a")) ++
      Seq((10L, "b"), (11L, "b")) :+ (20L, "c")).toDF("doc_id", "cls")
    val rows = operators.Pipeline.rebalanceOn(docs).collect()
    val byCls = rows.groupBy(_.getAs[String]("cls"))
    assert(byCls("a").length == 5 && byCls("b").length == 6 && byCls("c").length == 5)
    // every doc carries exactly its class factor of consecutive copies
    rows.groupBy(r => r.getAs[Long]("doc_id")).foreach { case (_, g) =>
      val n = g.head.getAs[Long]("n_copies")
      assert(g.map(_.getAs[Long]("copy_id")).sorted.toSeq == (1L to n))
    }
    // overshoot bounded by one extra epoch: total < target + n_c per class
    assert(byCls.forall { case (_, g) =>
      g.length < 5 + g.map(_.getAs[Long]("doc_id")).distinct.length })
    // salts are distinct across (doc, copy) — the interleave key works
    assert(rows.map(_.getAs[Long]("salt")).distinct.length == rows.length)
  }

  test("sequence packing conserves docs and fills every non-final bin past its boundary") {
    val rows = operators.Pipeline.packSequences(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs)
    rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("shard"))).foreach {
      case ((lang, shard), rs) =>
        val sorted = rs.sortBy(_.getAs[Long]("bin_id"))
        // contiguous bin ids from 0 (holds because every doc here is
        // far below the 2048-token budget; a doc > 2×budget would
        // legitimately skip a bin)
        sorted.zipWithIndex.foreach { case (r, i) =>
          assert(r.getAs[Long]("bin_id") == i, s"$lang/$shard bins not contiguous")
          assert(r.getAs[Long]("first_doc") <= r.getAs[Long]("last_doc"))
        }
        // greedy rule: cumulative tokens through bin b reach the
        // b+1'th budget boundary for every bin except the last
        var cum = 0L
        sorted.dropRight(1).foreach { r =>
          cum += r.getAs[Long]("n_tokens")
          assert(cum >= 2048L * (r.getAs[Long]("bin_id") + 1),
            s"$lang/$shard bin ${r.getAs[Long]("bin_id")} closed before its boundary")
        }
    }
  }

  test("epoch shuffle: permutations differ across epochs but are reproducible") {
    val rows = operators.Pipeline.epochShuffle(spark, sf).collect()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.length == 3 * nDocs)
    val byEpoch = rows.groupBy(_.getAs[Long]("epoch"))
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    byEpoch.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("doc_id")).distinct.length == nDocs)
      rs.foreach { r =>
        assert(r.getAs[Long]("shard") == r.getAs[Long]("skey") % 8)
        assert(r.getAs[Long]("skey") >= 0)
      }
    }
    // epoch orders genuinely differ: the shard assignment of a doc
    // changes between at least some epochs
    def shardMap(e: Long) = byEpoch(e)
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    assert(shardMap(0L) != shardMap(1L) && shardMap(1L) != shardMap(2L))
    // and a re-run reproduces the identical permutation
    val again = operators.Pipeline.epochShuffle(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("epoch"), r.getAs[Long]("skey"))).toSet
    assert(again == rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("epoch"), r.getAs[Long]("skey"))).toSet)
  }

  test("split contamination matches an independent in-test recompute on the corpus") {
    val rows = operators.Pipeline.splitContamination(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent ground truth: trigram sets + split recomputed in
    // plain Scala from the raw documents
    val docs = graft.sources.Tables.documents(spark, sf)
      .selectExpr("doc_id", "trim(regexp_replace(lower(text), '\\\\s+', ' ')) AS norm")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("norm")).toMap
    def trigrams(s: String): Set[String] =
      s.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val split = operators.Pipeline.leakageSplit(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val trainSet = docs.collect {
      case (id, t) if split(id) == "train" => trigrams(t)
    }.flatten.toSet
    val expected = docs.collect {
      case (id, t) if split(id) == "eval" && trigrams(t).nonEmpty =>
        val sh = trigrams(t)
        id -> ((sh.size.toLong, sh.count(trainSet.contains).toLong))
    }
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == expected.map(_._1).toSet)
    val got = rows.map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("n_sh"), r.getAs[Long]("n_overlap")))).toMap
    expected.foreach { case (id, e) => assert(got(id) == e, s"doc $id") }
    rows.foreach { r =>
      val f = r.getAs[Double]("overlap_frac")
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("semantic contamination: a planted paraphrase leak crosses the digest-keyed split") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // doc 1 (eval) is a PARAPHRASE of doc 0 (train): different digest
    // — the digest-keyed split cannot co-locate them and the n-gram
    // gate may see zero overlap — but their embeddings are near-dups,
    // so the semantic audit must surface the leak (both directions of
    // the a<b pair orientation); train-train pairs are not leaks.
    val pairs = Seq((0L, 1L, 0.97), (2L, 3L, 0.95), (4L, 5L, 0.99))
      .toDF("vec_a", "vec_b", "cosine")
    val split = Seq(
      0L -> "train", 1L -> "eval",
      2L -> "eval", 3L -> "train",
      4L -> "train", 5L -> "train")
      .toDF("doc_id", "split")
    val got = operators.Pipeline.semanticContaminationOn(pairs, split).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_train_neighbors"), r.getAs[Long]("max_cosine_micro")))).toMap
    assert(got.keySet == Set(1L, 2L), got.toString)
    assert(got(1L) == ((1L, math.floor(0.97 * 1e6).toLong)))
    assert(got(2L) == ((1L, math.floor(0.95 * 1e6).toLong)))
    // and on the real corpus the audit agrees with an in-test
    // recompute from the shipped pair + split relations
    val corpusPairs = operators.Dedup.embeddingCosine(spark, sf)
      .select(col("vec_a"), col("vec_b"), col("cosine")).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"), r.getAs[Double]("cosine")))
    val sp = operators.Pipeline.leakageSplit(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val expected = (corpusPairs.map(p => (p._1, p._2, p._3)) ++
        corpusPairs.map(p => (p._2, p._1, p._3)))
      .filter { case (e, t, _) => sp.get(e).contains("eval") && sp.get(t).contains("train") }
      .groupBy(_._1)
      .map { case (id, xs) => id ->
        ((xs.length.toLong, xs.map(x => math.floor(x._3 * 1e6).toLong).max)) }
    val onCorpus = operators.Pipeline.semanticContamination(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_train_neighbors"), r.getAs[Long]("max_cosine_micro")))).toMap
    assert(onCorpus == expected, s"corpus audit diverged: $onCorpus vs $expected")
  }

  test("dataset card: per-lang rows reconcile exactly with the TOTAL row") {
    val rows = operators.Pipeline.datasetCard(spark, sf).collect()
    val (total, langs) = rows.partition(_.getAs[String]("lang") == "TOTAL")
    assert(total.length == 1 && langs.nonEmpty)
    val t = total.head
    assert(langs.map(_.getAs[Long]("n_docs")).sum == t.getAs[Long]("n_docs"))
    assert(langs.map(_.getAs[Long]("total_tokens")).sum == t.getAs[Long]("total_tokens"))
    assert(langs.map(_.getAs[Long]("dup_docs")).sum == t.getAs[Long]("dup_docs"))
    assert(t.getAs[Long]("n_docs") ==
      graft.sources.Tables.documents(spark, sf).count())
    // distinct sources: total is a distinct-union, NOT a sum
    assert(t.getAs[Long]("n_sources") <= langs.map(_.getAs[Long]("n_sources")).sum)
    rows.foreach { r =>
      assert(r.getAs[Long]("dup_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("avg_chars") > 0.0)
    }
  }

  test("dataset card: dup accounting and source distinctness on a planted corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft_card").toFile
    dir.deleteOnExit()
    import spark.implicits._
    // en: 3 docs, one exact-dup pair (2 dup members), 2 sources;
    // de: 1 doc sharing srcA — total distinct sources = 2, not 3
    Seq((0L, "alpha beta gamma", "en", "srcA", 16L),
        (1L, "alpha  beta gamma ", "en", "srcB", 18L), // normalizes equal to doc 0
        (2L, "delta epsilon zeta", "en", "srcA", 18L),
        (3L, "eins zwei drei", "de", "srcA", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val card = operators.Pipeline.datasetCard(spark, dir.getAbsolutePath).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    assert(card.keySet == Set("de", "en", "TOTAL"))
    assert(card("en").getAs[Long]("n_docs") == 3L)
    assert(card("en").getAs[Long]("dup_docs") == 2L) // both members counted
    assert(card("en").getAs[Long]("n_sources") == 2L)
    assert(card("de").getAs[Long]("dup_docs") == 0L)
    assert(card("TOTAL").getAs[Long]("n_docs") == 4L)
    assert(card("TOTAL").getAs[Long]("dup_docs") == 2L)
    assert(card("TOTAL").getAs[Long]("n_sources") == 2L)
    assert(card("TOTAL").getAs[Long]("total_tokens") == 3L + 3L + 3L + 3L)
  }

  test("winsorize: clamp accounting brackets the mass and covers the corpus") {
    val rows = operators.Pipeline.winsorize(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    rows.foreach { r =>
      val (n, lo, hi) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_low"),
        r.getAs[Long]("n_high"))
      val (p05, p95) = (r.getAs[Double]("p05"), r.getAs[Double]("p95"))
      val wins = r.getAs[Double]("sum_winsorized")
      assert(p05 <= p95)
      // interpolated 5%/95% cut points clamp at most ~5% + 1 per side
      assert(lo <= n * 0.05 + 1, s"${r.getAs[String]("lang")}: lo=$lo n=$n")
      assert(hi <= n * 0.05 + 1, s"${r.getAs[String]("lang")}: hi=$hi n=$n")
      assert(lo + hi <= n)
      // every winsorized value lies in [p05, p95]
      assert(wins >= n * p05 - 1e-6 && wins <= n * p95 + 1e-6)
      // clamping can only pull mass toward the band: interior mass
      // alone never exceeds the winsorized total
      assert(r.getAs[Long]("interior_mass").toDouble <= wins + 1e-6)
    }
  }

  test("kfold: folds partition the corpus, shares close, duplicates co-fold") {
    import org.apache.spark.sql.functions._
    val rows = operators.Pipeline.kfold(spark, sf).collect()
    val folds = rows.map(_.getAs[Long]("fold")).distinct
    assert(folds.forall(f => f >= 0 && f < 5))
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == graft.sources.Tables.documents(spark, sf).count())
    // share ppm is per fold: consistent within each fold's rows
    rows.groupBy(_.getAs[Long]("fold")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("fold_share_ppm")).distinct.length == 1)
      assert(g.head.getAs[Long]("fold_docs") == g.map(_.getAs[Long]("n_docs")).sum)
    }
  }

  test("dedup cascade: stage accounting chains and matches the components mass") {
    val rows = operators.Dedup.cascade(spark, sf).collect()
      .sortBy(_.getAs[String]("stage"))
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      Seq("1_exact", "2_neardup"))
    rows.foreach { r =>
      assert(r.getAs[Long]("docs_out") ==
        r.getAs[Long]("docs_in") - r.getAs[Long]("docs_removed"))
      assert(r.getAs[Long]("docs_removed") >= 0)
    }
    assert(rows(1).getAs[Long]("docs_in") == rows(0).getAs[Long]("docs_out"))
    assert(rows(1).getAs[Long]("docs_removed") > 0,
      "near-dup stage should remove something at this sf")
  }

  test("dedup weights: hard weight inverts copy count, soft weight bounded below by hard") {
    val rows = operators.Pipeline.dedupWeights(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_copies"); val m = r.getAs[Long]("near_dup_size")
      val hw = r.getAs[Long]("hard_weight_ppm"); val sw = r.getAs[Long]("soft_weight_ppm")
      assert(n >= 1 && m >= 1, r.toString)
      assert(hw == 1000000L / n, r.toString)
      assert(sw == 1000000L / math.floor(math.sqrt(m.toDouble)).toLong, r.toString)
      // sqrt-downweighting keeps MORE mass than full component division
      assert(sw >= 1000000L / m, r.toString)
    }
    // every doc of the corpus gets a weight row
    val nDocs = sources.Tables.documents(spark, sf).count()
    assert(rows.length.toLong == nDocs)
  }
}
