package graft

import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  test("exact dedup covers every document once, canonical ids are group minima") {
    val rows = operators.Dedup.exact(spark, sf).collect()
    assert(rows.length == graft.sources.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("canonical_id") <= r.getAs[Long]("doc_id"))
    }
  }

  test("minhash-LSH surfaces the high-jaccard near-dup pairs") {
    val rows = operators.Dedup.minhashLsh(spark, sf).collect()
    assert(rows.nonEmpty)
    // candidates at >= 0.9 jaccard must also be flagged is_dup
    rows.filter(_.getAs[Double]("jaccard") >= 0.9)
      .foreach(r => assert(r.getAs[Boolean]("is_dup")))
    assert(rows.exists(_.getAs[Double]("jaccard") >= 0.9),
      "test corpus contains planted near-dups the LSH should find")
  }

  test("minhash-LSH candidates agree with exact ngram-jaccard on >=0.8 pairs") {
    val lsh = operators.Dedup.minhashLsh(spark, sf).collect()
      .filter(_.getAs[Boolean]("is_dup"))
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val exact = operators.Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // LSH-confirmed dups are a subset of the exact >=0.8 pairs; with
    // 128 perms / 16 bands recall on ~0.9+ pairs is effectively 1
    assert(lsh.subsetOf(exact), s"lsh-only: ${lsh -- exact}")
    assert((exact -- lsh).size <= exact.size / 4, s"missed: ${exact -- lsh}")
  }

  test("minhash accuracy audit: estimator tracks exact jaccard within sampling error") {
    val rows = operators.Dedup.minhashAccuracy(spark, sf).collect()
    assert(rows.nonEmpty)
    // same pair set as the verified LSH output (both inner-join the
    // candidates against the shared-shingle intersections)
    val lshPairs = operators.Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      == lshPairs)
    rows.foreach { r =>
      val (nEq, est, j, err) = (r.getAs[Long]("n_eq"), r.getAs[Double]("est_jaccard"),
        r.getAs[Double]("jaccard"), r.getAs[Double]("abs_err"))
      assert(nEq >= 0 && nEq <= 128)
      assert(est == nEq.toDouble / 128.0)
      assert(err == math.abs(est - j))
      // 128 lanes: σ = sqrt(J(1−J)/128) ≤ 0.045; 5σ keeps this
      // deterministic-corpus assertion far from flaky while still
      // catching a broken hash family (which decorrelates est from J)
      assert(err <= 5 * math.sqrt(0.25 / 128) + 1e-12,
        s"(${r.getAs[Long]("doc_a")},${r.getAs[Long]("doc_b")}) est=$est jaccard=$j")
    }
  }

  test("fuzzy verify: levenshtein prefix similarity matches a reference implementation") {
    val rows = operators.Dedup.fuzzyVerify(spark, sf).collect()
    assert(rows.nonEmpty)
    val pfx = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        substring(expr("trim(regexp_replace(lower(text), '\\\\s+', ' '))"), 1, 64).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    rows.foreach { r =>
      val (a, b) = (pfx(r.getAs[Long]("doc_a")), pfx(r.getAs[Long]("doc_b")))
      assert(r.getAs[Long]("lev") == lev(a, b), s"($a, $b)")
      assert(r.getAs[Long]("max_len") == math.max(a.length, b.length))
      val sim = r.getAs[Double]("prefix_sim")
      assert(sim >= 0.0 && sim <= 1.0)
      assert(r.getAs[Boolean]("is_dup") == (sim >= 0.8))
    }
    // the planted near-dups give the refinement both branches
    assert(rows.exists(_.getAs[Boolean]("is_dup")))
  }

  test("simhash pairs are within hamming 3 and include near-identical docs") {
    val rows = operators.Dedup.simhash(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("hamming") <= 3))
  }

  test("components: labels are transitive closures of the pair graph") {
    val pairs = operators.Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val comp = operators.Dedup.components(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.nonEmpty)
    // every paired doc is labeled, both ends share a component
    pairs.foreach { case (a, b) =>
      assert(comp(a) == comp(b), s"pair ($a,$b) split across components")
    }
    // driver-side union-find reference on the tiny test graph
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    comp.foreach { case (doc, label) => assert(label == find(doc)) }
  }

  test("embedding cosine pairs are all above threshold") {
    val rows = operators.Dedup.embeddingCosine(spark, sf).collect()
    rows.foreach(r => assert(r.getAs[Double]("cosine") >= 0.4))
  }

  test("incremental dedup ships unseen docs and drops every re-crawl") {
    import org.apache.spark.sql.functions._
    val delta = operators.Dedup.incremental(spark, sf).collect()
    // every re-crawl (doc_id >= 1000000 marks them) was anti-joined away
    delta.foreach(r => assert(r.getAs[Long]("doc_id") < 1000000L, r.toString))
    // shipped docs are exactly the genuinely-new quarter
    delta.foreach(r => assert(r.getAs[Long]("doc_id") % 4 == 3))
    // none of the shipped digests exists in the previous release
    val prevDigests = operators.Dedup.exact(spark, sf)
      .filter(col("doc_id") % 4 =!= 3).select("digest").collect()
      .map(_.getString(0)).toSet
    delta.foreach(r => assert(!prevDigests(r.getAs[String]("digest"))))
    // the anti-join did real work: the incoming batch (new + re-crawls)
    // is strictly larger than the delta
    val docs = graft.sources.Tables.documents(spark, sf)
    val incoming = docs.filter(col("doc_id") % 4 === 3).count() +
      docs.filter(col("doc_id") % 8 === 0).count()
    assert(delta.length > 0 && delta.length < incoming)
  }

  test("native minhash aggregate is bit-identical to 128 min columns, merge path included") {
    import org.apache.spark.sql.functions._
    org.apache.spark.sql.GraftFunctions.register(spark)
    val p = 2147483647L
    def A(i: Int): Long = ((2L * i + 1) * 2654435761L) % p
    def B(i: Int): Long = ((i + 1L) * 2246822519L) % p
    // repartition scatters each doc's shingles across partitions, so
    // the aggregate MUST take the partial-update + merge + serde path
    val post = operators.Dedup.shinglePostings(spark, sf).repartition(7).localCheckpoint()
    val minCols = (0 until 128).map(i =>
      min(expr(s"(${A(i)} * (h % $p) + ${B(i)}) % $p")).as(s"m$i"))
    val oldSigs = post.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), array((0 until 128).map(i => col(s"m$i")): _*).as("sig"))
    val newSigs = post.groupBy("doc_id").agg(expr("graft_minhash_sig(h)").as("sig"))
    val joined = oldSigs.as("o").join(newSigs.as("n"), "doc_id")
    assert(joined.count() > 0)
    assert(joined.filter(col("o.sig") =!= col("n.sig")).count() == 0)
  }

  test("chunk dedup: fractions consistent, dup chunks re-derived independently") {
    val rows = operators.Dedup.chunkDedup(spark, sf).collect()
    assert(rows.length == graft.sources.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (n, d) = (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dup_chunks"))
      assert(n >= 1 && d >= 0 && d <= n)
      assert(r.getAs[Double]("dup_chunk_frac") == d.toDouble / n)
    }
    // the dup counts match an independent chunk-md5 frequency pass
    val chunks = operators.TextAnalysis.chunkOverlap(spark, sf)
      .select("doc_id", "chunk_md5").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val freq = chunks.groupBy(_._2).view.mapValues(_.length).toMap
    val wantDups = chunks.groupBy(_._1).view
      .mapValues(_.count { case (_, m) => freq(m) > 1 }.toLong).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup_chunks") == wantDups(r.getAs[Long]("doc_id")))
    }
    // the property does real work at this SF
    assert(rows.exists(_.getAs[Long]("n_dup_chunks") > 0),
      "no duplicate chunks anywhere — the fraction is vacuous")
  }

  test("shingle df-cap: a generous cap is recall-neutral, a tight cap prunes postings") {
    import org.apache.spark.sql.functions._
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSeq
    val post = operators.Dedup.shinglePostings(spark, sf)
    val maxDf = post.groupBy("h").count()
      .agg(max("count")).collect()(0).getLong(0).toInt
    assert(maxDf >= 2, "no shingle shared by 2 docs — the cap test is vacuous")
    // cap at the observed max df: nothing drops, so BOTH near-dup
    // operators must reproduce their oracle-checked output exactly
    // (pairs AND jaccard values AND denominators)
    assert(rows(operators.Dedup.ngramJaccard(spark, sf, Some(maxDf)))
      == rows(operators.Dedup.ngramJaccard(spark, sf)))
    assert(rows(operators.Dedup.minhashLsh(spark, sf, Some(maxDf)))
      == rows(operators.Dedup.minhashLsh(spark, sf)))
    // a tight cap actually drops the shared-shingle mass (the knob is
    // wired, not decorative) and only ever REMOVES candidate pairs
    val capped1 = operators.Dedup.shinglePostings(spark, sf, Some(1))
    assert(capped1.count() < post.count())
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(operators.Dedup.ngramJaccard(spark, sf, Some(1)))
      .subsetOf(pairSet(operators.Dedup.ngramJaccard(spark, sf))))
  }

  test("containment flags a short doc embedded in a long one that jaccard misses") {
    // planted corpus: doc 0 (40 unique words) pasted verbatim at the
    // head of doc 1 (240 words) — the quote-inclusion shape. Jaccard
    // = 38/238 ≈ 0.16 stays far under its 0.8 bar; containment = 1.0.
    val dir = java.nio.file.Files.createTempDirectory("graft_containment").toFile
    dir.deleteOnExit()
    val shortWords = (1 to 40).map(i => f"s$i%03d")
    val longWords = shortWords ++ (1 to 200).map(i => f"l$i%03d")
    val other = (1 to 50).map(i => f"o$i%03d")
    val docs = Seq(
      (0L, shortWords.mkString(" "), "en", "srcA", shortWords.mkString(" ").length.toLong),
      (1L, longWords.mkString(" "), "en", "srcA", longWords.mkString(" ").length.toLong),
      (2L, other.mkString(" "), "en", "srcB", other.mkString(" ").length.toLong))
    import spark.implicits._
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val cont = operators.Dedup.containment(spark, dir.getAbsolutePath).collect()
    assert(cont.length == 1)
    assert(cont.head.getAs[Long]("doc_a") == 0L && cont.head.getAs[Long]("doc_b") == 1L)
    assert(cont.head.getAs[Double]("containment") == 1.0)
    assert(cont.head.getAs[Long]("na") == 38L && cont.head.getAs[Long]("nb") == 238L)
    val jac = operators.Dedup.ngramJaccard(spark, dir.getAbsolutePath).collect()
    assert(jac.isEmpty, "jaccard must miss the asymmetric containment pair")
  }

  test("novelty: first occurrence scores 1, an exact re-crawl scores 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft_novelty").toFile
    dir.deleteOnExit()
    val a = (1 to 30).map(i => f"a$i%03d").mkString(" ")
    val fresh = (1 to 30).map(i => f"f$i%03d").mkString(" ")
    import spark.implicits._
    Seq((0L, a, "en", "srcA", a.length.toLong),
        (1L, a, "en", "srcA", a.length.toLong), // re-crawl of doc 0
        (2L, fresh, "en", "srcB", fresh.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val nov = operators.Dedup.ngramNovelty(spark, dir.getAbsolutePath).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("novelty")).toMap
    assert(nov == Map(0L -> 1.0, 1L -> 0.0, 2L -> 1.0))
  }

  test("repeated spans recover a planted shared passage exactly, incl. in-doc repeats") {
    val dir = java.nio.file.Files.createTempDirectory("graft_spans").toFile
    dir.deleteOnExit()
    val passage = (1 to 10).map(i => f"p$i%03d")
    val u = (1 to 30).map(i => f"u$i%03d")
    val v = (1 to 30).map(i => f"v$i%03d")
    // doc 3: a 4-word phrase repeated TWICE WITHIN the doc — no other
    // doc shares it; positional (non-distinct) shingles must flag both
    val rep = Seq("r1", "r2", "r3", "r4")
    val d3 = rep ++ Seq("q1", "q2", "q3") ++ rep
    val mk = (id: Long, ws: Seq[String]) =>
      (id, ws.mkString(" "), "en", "srcA", ws.mkString(" ").length.toLong)
    import spark.implicits._
    Seq(mk(0L, u ++ passage), mk(1L, v.take(15) ++ passage ++ v.drop(15)), mk(2L, (1 to 20).map(i => f"w$i%03d")), mk(3L, d3))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val rows = operators.Dedup.repeatedSpans(spark, dir.getAbsolutePath).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // docs 0/1: exactly the 8 fully-inside-passage trigram positions
    // merge into ONE 10-word span covering exactly the passage
    for (id <- Seq(0L, 1L)) {
      assert(rows(id).getAs[Long]("n_spans") == 1L, s"doc $id")
      assert(rows(id).getAs[Long]("max_span_words") == 10L, s"doc $id")
      assert(rows(id).getAs[Long]("covered_words") == 10L, s"doc $id")
    }
    assert(rows(2L).getAs[Long]("n_spans") == 0L)
    assert(rows(2L).getAs[Long]("covered_words") == 0L)
    assert(rows(2L).getAs[Double]("covered_frac") == 0.0)
    // doc 3: both occurrences of the phrase flagged -> 2 spans of 4
    // words, 8 covered positions out of 11
    assert(rows(3L).getAs[Long]("n_spans") == 2L)
    assert(rows(3L).getAs[Long]("max_span_words") == 4L)
    assert(rows(3L).getAs[Long]("covered_words") == 8L)
    assert(rows(3L).getAs[Long]("n_words") == 11L)
  }

  test("repeated spans on the test corpus: coverage bounded and consistent") {
    val rows = operators.Dedup.repeatedSpans(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val covered = r.getAs[Long]("covered_words")
      val n = r.getAs[Long]("n_words")
      assert(covered <= n)
      assert(r.getAs[Long]("max_span_words") <= covered)
      if (r.getAs[Long]("n_spans") == 0L) assert(covered == 0L)
      else assert(covered >= r.getAs[Long]("max_span_words"))
    }
    // the corpus plants near-dups (the LSH specs depend on them), and
    // a >=0.8-jaccard pair means most of each doc's trigrams recur —
    // span coverage on those docs must be substantial
    assert(rows.exists(r => r.getAs[Double]("covered_frac") >= 0.8),
      "near-dup docs must be substantially covered by repeated spans")
  }

  test("semantic clusters: every embedding near-dup pair is co-clustered, ids are minima") {
    val pairs = operators.Dedup.embeddingCosine(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    assert(pairs.nonEmpty)
    val rows = operators.Dedup.semanticClusters(spark, sf).collect()
    val cluster = rows.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id")).toMap
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
    }
    val members = rows.groupBy(_.getAs[Long]("cluster_id"))
    members.foreach { case (cid, rs) =>
      assert(cid == rs.map(_.getAs[Long]("vec_id")).min)
      rs.foreach(r => assert(r.getAs[Long]("cluster_size") == rs.length))
      assert(rs.count(_.getAs[Boolean]("is_representative")) == 1)
    }
    // only paired vectors are clustered
    assert(rows.map(_.getAs[Long]("vec_id")).toSet ==
      pairs.flatMap(p => Seq(p._1, p._2)).toSet)
  }

  test("multi-probe LSH finds a strict superset of the exact-bucket pairs") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val exact = pairs(operators.Dedup.embeddingCosine(spark, sf))
    val multi = operators.Dedup.embeddingMultiprobe(spark, sf).collect()
    val multiSet = multi.map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(exact.subsetOf(multiSet),
      s"missing exact-bucket pairs: ${(exact diff multiSet).take(3)}")
    multi.foreach(r => assert(r.getAs[Double]("cosine") >= 0.4))
    info(s"exact-bucket pairs ${exact.size}, multi-probe pairs ${multiSet.size}")
  }

  test("widened embedding banding: bounded bucket occupancy, keys carry similarity") {
    // The round-10 scale-killer was 4-bit RAW band keys: 16 possible
    // values per band guarantees ~1/16 of the corpus in every bucket
    // (quadratic candidate mass at 10^9 vectors). The widened banding
    // (128 planes, 16 bands x 8 hashed bits) must keep every bucket a
    // small fraction of the corpus — similarity-driven occupancy, not
    // a tiny hash range.
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val n = emb.count()
    val occ = operators.Vectors.bandKeys(emb)
      .groupBy("key").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(occ * 20 <= n, s"a band bucket holds $occ of $n vectors (> 5%)")
    // the legacy raw keys fail exactly this bound — the receipts for
    // the migration (pigeonhole: 64 keys total over 4x N rows)
    val legacyOcc = operators.Vectors.signatures(emb)
      .selectExpr("explode(transform(sequence(0, 3), b -> b*16 + (int(shiftright(sig, b*4)) & 15))) AS key")
      .groupBy("key").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(legacyOcc * 20 > n, "legacy keys unexpectedly pass the occupancy bound")
    // a planted near-identical pair (one sign-boundary-safe nudge)
    // shares almost every band key; an unrelated vector shares none
    import spark.implicits._
    val base = (0 until 64).map(d => 1.0f + (d % 7) * 0.25f)
    val nudged = base.updated(3, base(3) + 0.001f)
    val anti = base.map(x => -x)
    val planted = Seq((1L, base), (2L, nudged), (3L, anti))
      .toDF("vec_id", "embedding")
      .selectExpr("vec_id", "CAST(embedding AS array<float>) AS embedding")
    val keys = operators.Vectors.bandKeys(planted).collect()
      .groupBy(_.getAs[Long]("vec_id")).view.mapValues(_.map(_.getAs[Long]("key")).toSet)
    assert((keys(1L) intersect keys(2L)).size >= 14,
      s"near-identical pair shares only ${(keys(1L) intersect keys(2L)).size}/16 band keys")
    assert((keys(1L) intersect keys(3L)).isEmpty,
      "an antipodal vector must share no band key")
  }

  test("embedding banding migration audit: probed recall dominates, identities hold") {
    val rows = operators.Dedup.embeddingTuning(spark, sf).collect()
      .map(r => r.getAs[String]("config") -> r).toMap
    assert(rows.keySet == Set("legacy_4x4_raw", "wide_16x8_hashed", "wide_16x8_probed"))
    val probed = rows("wide_16x8_probed")
    val wide = rows("wide_16x8_hashed")
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_verified") <= r.getAs[Long]("n_truth"))
      assert(r.getAs[Long]("n_verified") <= r.getAs[Long]("n_candidates"))
    }
    // multi-probe candidates are a superset of the exact-bucket ones
    assert(probed.getAs[Long]("n_candidates") >= wide.getAs[Long]("n_candidates"))
    assert(probed.getAs[Long]("recall_ppm") >= wide.getAs[Long]("recall_ppm"))
    // the shipped config beats legacy recall on this corpus
    assert(probed.getAs[Long]("recall_ppm") > rows("legacy_4x4_raw").getAs[Long]("recall_ppm"))
  }

  test("url canonicalization collapses all four planted variant shapes") {
    val rows = operators.Dedup.urlCanonical(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val u = r.getAs[String]("canonical_url")
      assert(!u.contains("utm_") && !u.contains("#") && !u.contains(":443"))
      assert(u == u.toLowerCase && !u.endsWith("/"))
      assert(r.getAs[Boolean]("has_variants") == (r.getAs[Long]("n_docs") > 1))
    }
    // ground truth: same (lang, doc_id div 4) => same canonical page
    val docs = graft.sources.Tables.documents(spark, sf)
      .selectExpr("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expectGroups = docs.groupBy { case (id, lang) => (lang, id / 4) }
      .map { case ((lang, page), ds) =>
        (s"https://$lang.example.com/doc/$page?a=1&b=2", ds.map(_._1).min, ds.size) }
      .toSet
    val gotGroups = rows.map(r => (r.getAs[String]("canonical_url"),
      r.getAs[Long]("min_doc_id"), r.getAs[Long]("n_docs").toInt)).toSet
    assert(gotGroups == expectGroups)
  }

  test("generic cores run on arbitrary (doc_id, text) relations, id-shift-equivariant") {
    // a user's own corpus: same texts under shifted ids
    val docs2 = graft.sources.Tables.documents(spark, sf)
      .selectExpr("doc_id + 5000 as doc_id", "text")
    val shifted = operators.Dedup.exactOn(docs2).collect()
      .map(r => (r.getAs[Long]("doc_id") - 5000, r.getAs[String]("digest"),
        r.getAs[Long]("group_size"), r.getAs[Long]("canonical_id") - 5000)).toSet
    val bound = operators.Dedup.exact(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("digest"),
        r.getAs[Long]("group_size"), r.getAs[Long]("canonical_id"))).toSet
    assert(shifted == bound)
    val pairs2 = operators.Dedup.minhashLshOn(docs2).collect()
      .map(r => (r.getAs[Long]("doc_a") - 5000, r.getAs[Long]("doc_b") - 5000)).toSet
    val pairs = operators.Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs2 == pairs)
    val q2 = operators.TextAnalysis.qualityOn(docs2).collect()
      .map(r => (r.getAs[Long]("doc_id") - 5000, r.getAs[Double]("quality_score"))).toMap
    val q = operators.TextAnalysis.quality(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("quality_score"))).toMap
    assert(q2 == q)
    val d2 = operators.TextAnalysis.diversityOn(docs2).collect()
      .map(r => (r.getAs[Long]("doc_id") - 5000,
        r.getAs[Double]("simpson_diversity"))).toMap
    val d = operators.TextAnalysis.diversity(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("simpson_diversity"))).toMap
    assert(d2 == d)
  }

  test("generic ANN core: known cosine ordering on a hand-built vector relation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vectors = Seq(
      (10L, Array(1.0, 0.0)), (11L, Array(0.9, 0.1)),
      (12L, Array(0.0, 1.0)), (13L, Array(-1.0, 0.0)))
      .toDF("vec_id", "vd")
      .withColumn("vnrm", operators.Vectors.norm(col("vd")))
    val probeSet = Seq((1L, Array(1.0, 0.0))).toDF("probe_id", "pv")
      .withColumn("pnrm", operators.Vectors.norm(col("pv")))
    val rows = operators.Similarity.bruteForceTopKOn(vectors, probeSet, 3)
      .collect()
    assert(rows.map(_.getAs[Long]("vec_id")).toSeq == Seq(10L, 11L, 12L))
    assert(rows.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
  }

  test("threshold sweep recomputes from the accuracy pair relation") {
    val r = operators.Dedup.thresholdSweep(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val pairs = operators.Dedup.minhashAccuracy(spark, sf).collect()
      .map(x => (x.getAs[Double]("jaccard"), x.getAs[Double]("est_jaccard")))
    assert(row.getAs[Long]("n_candidates") == pairs.length)
    Seq(500, 700, 800, 900).foreach { t =>
      val tau = t / 1000.0
      assert(row.getAs[Long](s"exact_ge_$t") == pairs.count(_._1 >= tau))
      assert(row.getAs[Long](s"est_ge_$t") == pairs.count(_._2 >= tau))
      assert(row.getAs[Long](s"agree_$t") ==
        pairs.count(p => (p._1 >= tau) == (p._2 >= tau)))
    }
    // the admit counts can only shrink as the threshold tightens
    val ex = Seq(500, 700, 800, 900).map(t => row.getAs[Long](s"exact_ge_$t"))
    assert(ex.zip(ex.tail).forall { case (a, b) => a >= b })
  }

  test("exact dedup survives a planted hot digest with exact group accounting") {
    // the scenario the groupBy+join-back shape exists for: one
    // boilerplate text repeated 200k times (the empty/parked page at
    // corpus scale) next to a handful of unique docs. The hot key
    // must flow through map-side-combined partial aggregation and an
    // AQE-splittable join — and the accounting must stay exact.
    import spark.implicits._
    val hot = spark.range(200000)
      .selectExpr("id AS doc_id", "'same boilerplate page text' AS text")
    val unique = spark.range(200000, 200005)
      .selectExpr("id AS doc_id", "concat('unique ', id) AS text")
    val out = operators.Dedup.exactOn(hot.unionAll(unique))
    val rows = out.collect()
    assert(rows.length == 200005)
    val hotRows = rows.filter(_.getAs[Long]("group_size") == 200000L)
    assert(hotRows.length == 200000)
    assert(hotRows.forall(_.getAs[Long]("canonical_id") == 0L))
    assert(hotRows.count(_.getAs[Boolean]("is_canonical")) == 1)
    assert(rows.count(_.getAs[Long]("group_size") == 1L) == 5)
  }

  test("CDC chunking self-heals past a prefix insertion; fixed strides cannot") {
    import spark.implicits._
    // deterministic ~1500-char base text; doc 2 = doc 1 with a head
    // insertion (the edit that re-phases EVERY fixed-stride chunk);
    // doc 3 unrelated
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
    val base = (0 until 250).map(i => vocab((i * 7 + 3) % vocab.size)).mkString(" ")
    val other = (0 until 250).map(i => vocab((i * 5 + 1) % vocab.size)).reverse.mkString("x ")
    val docs = Seq(
      (1L, base), (2L, "zulu yankee inserted preamble " + base), (3L, other)
    ).toDF("doc_id", "text")
    val out = operators.Dedup.cdcChunksOn(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // sanity: chunk chars partition the normalized text exactly
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_chars_norm") > 0)
      assert(r.getAs[Long]("n_shared_chunks") <= r.getAs[Long]("n_chunks"))
    }
    assert(out(1L).getAs[Long]("n_chunks") >= 5,
      "base text long enough to carry several content boundaries")
    // the CDC contract: everything after the first post-insertion
    // boundary re-aligns, so the shared mass dominates
    assert(out(2L).getAs[Double]("shared_frac") > 0.5,
      s"insertion should re-phase one chunk, not all: ${out(2L)}")
    assert(out(3L).getAs[Long]("n_shared_chunks") == 0L,
      "unrelated doc shares nothing")
  }

  test("truncation: planted cutoff families group; equal-length heads do not") {
    import spark.implicits._
    val base = ("word " * 120).trim // 599 norm chars
    val docs = Seq(
      (1L, base),                          // full page
      (2L, base.substring(0, 300)),        // truncated capture
      (3L, "x " * 200),                    // different head, same length class
      (4L, "short doc"),                   // under the 256-char floor
      (10L, "y " * 150), (11L, "y " * 150) // same head, SAME length -> not truncation
    ).toDF("doc_id", "text")
    val got = operators.Dedup.truncationOn(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_docs"), r.getAs[Boolean]("is_longest"))).toMap
    assert(got.keySet == Set(1L, 2L), s"got $got")
    assert(got(1L) == (2L, true) && got(2L) == (2L, false))
  }

  test("b-bit accuracy: estimators bracket jaccard and near-dups agree at 1 bit") {
    val rows = operators.Dedup.bbitAccuracy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n1 = r.getAs[Long]("n_eq_1bit")
      // every full-lane match is also a low-bit match
      assert(n1 >= r.getAs[Long]("n_eq"))
      assert(r.getAs[Double]("est_1bit") ==
        math.max(0.0, 2 * (n1.toDouble / 128.0) - 1.0))
      assert(r.getAs[Double]("err_full") >= 0 && r.getAs[Double]("err_1bit") >= 0)
    }
    // LSH candidates are near-dups: the 1-bit estimator still sees them
    // (jaccard >= 0.8 pairs have raw 1-bit agreement >> 1/2)
    rows.filter(_.getAs[Double]("jaccard") >= 0.8)
      .foreach(r => assert(r.getAs[Double]("est_1bit") > 0.5,
        s"${r.getAs[Long]("doc_a")}-${r.getAs[Long]("doc_b")}"))
  }

  test("winnowing: shared runs >= w+k-1 words are guaranteed a common fingerprint") {
    import spark.implicits._
    val run = "alpha beta gamma delta epsilon zeta eta theta" // 8-word shared run
    val docs = Seq(
      (1L, s"one two three four five six seven $run"),
      (2L, s"$run red orange yellow green blue indigo violet"),
      (3L, "completely different words nowhere near the others at all today"),
      (4L, "too short")).toDF("doc_id", "text")
    val got = operators.Dedup.winnowingOn(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_fps"), r.getAs[Long]("n_shared_fps"))).toMap
    // the coverage theorem: an 8-word shared run (6 = w+k-1 needed)
    // must produce at least one common fingerprint in both docs
    assert(got(1L)._2 >= 1 && got(2L)._2 >= 1, s"guarantee violated: $got")
    assert(got(3L)._2 == 0, "unrelated doc shares a fingerprint")
    assert(!got.contains(4L), "sub-window doc must be absent")
    // density: far fewer fingerprints than shingles
    assert(got(1L)._1 < 13, s"kept ${got(1L)._1} fps from 13 shingles")
  }

  test("no WindowExec partitions on a skewable hash/content key in any dedup plan") {
    // A window partitioned by a content-derived key (digest, shingle
    // hash, chunk md5, component id) has no map-side combine and no
    // AQE skew split: one hot key = one task's buffer at 100 TB. The
    // per-key aggregates must be groupBy + join-back instead; the
    // only legitimate window partitionings here are per-doc (bounded
    // by doc length). This pins the executed plans to that contract.
    import org.apache.spark.sql.execution.window.WindowExec
    val banned = Set("h", "digest", "chunk_md5", "component_id", "cluster_id")
    val plans = Seq(
      "dedup_exact" -> operators.Dedup.exact(spark, sf),
      "dedup_ngram_novelty" -> operators.Dedup.ngramNovelty(spark, sf),
      "dedup_chunks" -> operators.Dedup.chunkDedup(spark, sf),
      "dedup_cdc_chunks" -> operators.Dedup.cdcChunks(spark, sf),
      "dedup_repeated_spans" -> operators.Dedup.repeatedSpans(spark, sf),
      "dedup_components" -> operators.Dedup.components(spark, sf),
      "dedup_keep_best" -> operators.Dedup.keepBest(spark, sf),
      "dedup_jaccard_capped" -> operators.Dedup.ngramJaccard(spark, sf, Some(50)),
      "dedup_winnowing" -> operators.Dedup.winnowing(spark, sf))
    plans.foreach { case (name, df) =>
      df.collect() // force AQE-final plan
      val windowKeys = df.queryExecution.executedPlan.collect {
        case w: WindowExec => w.partitionSpec.flatMap(_.references.map(_.name))
      }.flatten.toSet
      val hit = windowKeys.intersect(banned)
      assert(hit.isEmpty, s"$name windows over skewable key(s) $hit")
    }
  }

  test("lsh tuning: stricter configs retain subsets, decile accounting closes") {
    val rows = operators.Dedup.lshTuning(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_pairs")
      val w16 = r.getAs[Long]("n_caught_8x16")
      val w32 = r.getAs[Long]("n_caught_4x32")
      val h8 = r.getAs[Long]("n_caught_8x8")
      assert(w16 <= n && w32 <= n && h8 <= n, r.toString)
      // a 32-lane band match contains two matching 16-lane halves,
      // so 4x32 catches are a subset of 8x16 catches
      assert(w32 <= w16, r.toString)
      val d = r.getAs[Long]("j_decile")
      assert(d >= 0 && d <= 9)
    }
    // every accuracy pair lands in exactly one decile bucket
    val nAcc = operators.Dedup.minhashAccuracy(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == nAcc)
  }

  test("prefix filter: exact pair-set equality with the posting join, smaller candidate mass") {
    import org.apache.spark.sql.functions._
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val viaPrefix = pairSet(operators.Dedup.prefixFilter(spark, sf))
    val viaPosting = pairSet(operators.Dedup.ngramJaccard(spark, sf))
    assert(viaPrefix == viaPosting,
      s"prefix filtering must be exact: ${viaPrefix.size} vs ${viaPosting.size}")
    assert(viaPrefix.nonEmpty)
  }

  test("audit sample cap: sampled embedding-tuning counts bounded by the full audit") {
    def byConfig(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[String]("config") -> r).toMap
    val full = byConfig(operators.Dedup.embeddingTuning(spark, sf))
    val s = byConfig(operators.Dedup.embeddingTuningOn(spark, sf, 3L))
    for (cfg <- full.keys; colName <- Seq("n_candidates", "n_verified", "n_truth")) {
      assert(s(cfg).getAs[Long](colName) <= full(cfg).getAs[Long](colName),
        s"$cfg.$colName grew under sampling")
      val ppm = s(cfg).getAs[Long]("recall_ppm")
      assert(ppm >= 0L && ppm <= 1000000L, s"$cfg recall_ppm $ppm out of range")
    }
    assert(s.values.exists(_.getAs[Long]("n_candidates") > 0))
  }
}
