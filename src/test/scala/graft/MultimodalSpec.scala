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

  test("frame sample: every 4th frame, md5 matches a direct slice") {
    import org.apache.spark.sql.functions._
    val rows = operators.Multimodal.frameSample(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("frame_idx") % 4 == 0)
      assert(r.getAs[Long]("frame_idx") < r.getAs[Long]("n_frames"))
    }
    // cross-check one document's frame digests driver-side
    val docId = rows.head.getAs[Long]("doc_id")
    val text = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") === docId).collect()(0).getAs[String]("text")
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.filter(_.getAs[Long]("doc_id") == docId).foreach { r =>
      val off = r.getAs[Long]("frame_idx").toInt * 32
      val slice = text.getBytes("UTF-8").slice(off, off + 32)
      val hex = md.digest(slice).map("%02x".format(_)).mkString
      md.reset()
      assert(r.getAs[String]("frame_md5") == hex)
    }
  }

  test("feature extract: resize fits 224 box preserving aspect, features in [0,1]") {
    val rows = operators.Multimodal.featureExtract(spark, sf).collect()
    assert(rows.length == graft.sources.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (w, h) = (r.getAs[Long]("fake_width"), r.getAs[Long]("fake_height"))
      val (ow, oh) = (r.getAs[Long]("out_w"), r.getAs[Long]("out_h"))
      assert(ow <= 224 && oh <= 224 && ow >= 1 && oh >= 1)
      // the long side always lands exactly on 224; the short side is
      // floor-scaled (clamped to 1)
      assert(math.max(ow, oh) == 224)
      val short = math.min(w, h) * 224 / math.max(w, h)
      assert(math.min(ow, oh) == math.max(1L, short))
      Seq("f0", "f1", "f2", "f3").foreach { f =>
        val v = r.getAs[Double](f); assert(v >= 0.0 && v <= 1.0)
      }
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

  test("binary dedup accounting: copies x size and reclaimable bytes replay exactly") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val groups = docs.groupBy(_._2)
    val rows = operators.Multimodal.binaryDedup(spark, sf).collect()
    assert(rows.length == groups.size)
    val byCanonical = rows.map(r => r.getAs[Long]("canonical_id") -> r).toMap
    groups.foreach { case (text, ds) =>
      val r = byCanonical(ds.map(_._1).min)
      assert(r.getAs[Long]("n_copies") == ds.length.toLong)
      assert(r.getAs[Long]("n_bytes") == text.getBytes("UTF-8").length.toLong)
      assert(r.getAs[Long]("reclaimable_bytes") ==
        (ds.length - 1).toLong * text.getBytes("UTF-8").length)
    }
  }

  test("image ahash: shared-thumbnail docs collide at hamming 0") {
    val pairs = operators.Multimodal.imageAHash(spark, sf).collect()
    pairs.foreach(r => assert(r.getAs[Long]("hamming") <= 3))
    // identical stub thumbnails (normalized 64-char prefix) must land
    // at distance 0 — recompute that pair set directly
    val texts = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map { r =>
        val norm = r.getAs[String]("text").toLowerCase
          .replaceAll("\\s+", " ").trim
        (r.getAs[Long]("doc_id"), norm.substring(0, math.min(64, norm.length)))
      }
    val dupPairs = texts.groupBy(_._2).values.filter(_.length > 1)
      .flatMap { g =>
        val ids = g.map(_._1).sorted
        for (i <- ids.indices; j <- (i + 1) until ids.length)
          yield (ids(i), ids(j))
      }.toSet
    val zeroPairs = pairs.filter(_.getAs[Long]("hamming") == 0L)
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(dupPairs.nonEmpty, "corpus has no shared-prefix docs?")
    assert(dupPairs.subsetOf(zeroPairs),
      s"missing dup pairs: ${dupPairs -- zeroPairs}")
  }

  test("generic ahash core: planted shared-prefix payloads collide, others don't") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared header content " * 4 + "tail one"),   // same 64-prefix
      (2L, "shared header content " * 4 + "another tail"),
      (3L, "completely different body with its own words entirely"))
      .toDF("doc_id", "text")
    val pairs = operators.Multimodal.imageAHashOn(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming")))
    assert(pairs.toSeq == Seq((1L, 2L, 0L)))
  }

  test("phash core: shared-prefix payloads collide at 0, basis is exact DCT") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared header content " * 4 + "tail one"),   // same 64-prefix
      (2L, "shared header content " * 4 + "another tail"),
      (3L, "completely different body with its own words entirely"))
      .toDF("doc_id", "text")
    val pairs = operators.Multimodal.imagePHashOn(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming")))
    assert(pairs.toSeq == Seq((1L, 2L, 0L)))
    // the embedded integer basis IS the scaled 8-point DCT-II: DC row
    // all 1024, and each row's raw cosine is within rounding of c/1024
    val t = operators.Multimodal.dctTable.map { case (u, x, c) => ((u, x), c) }.toMap
    (0 until 8).foreach(x => assert(t((0L, x.toLong)) == 1024L))
    operators.Multimodal.dctTable.foreach { case (u, x, c) =>
      val exact = 1024.0 * math.cos(math.Pi * (2 * x + 1) * u / 16.0)
      assert(math.abs(exact - c) <= 0.5, s"basis ($u,$x): $c vs $exact")
    }
  }

  test("REAL decoder through the seam: imageio PNGs drive the same pHash plumbing") {
    // The decode stage is the documented stub only because this
    // container ships no media codecs — but javax.imageio is pure
    // JVM. This test proves the SEAM: real PNG pixels enter
    // imagePHashFromPixels, the exact operator the stub path uses,
    // and perceptual near-duplicates come out. Three planted 32x32
    // images: A = a blocky high-contrast pattern, B = A with a few
    // +-2 gray-level pixels of noise (a visually identical
    // re-encode), C = A's inverse (maximally different content).
    import java.awt.image.BufferedImage
    def png(paint: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v = paint(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def base(x: Int, y: Int): Int = if (((x / 8) + (y / 8)) % 2 == 0) 40 else 215
    val a = png(base)
    val b = png((x, y) => base(x, y) + (if ((x * 31 + y * 17) % 97 == 0) 2 else 0))
    val c = png((x, y) => 255 - base(x, y))
    import spark.implicits._
    val images = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "content")
    val pix = operators.Multimodal.decodeImagePixels(images)
    // 64 thumbnail pixels per image, exact box means of real pixels
    val pxRows = pix.collect()
    assert(pxRows.length == 3 * 64)
    assert(pxRows.forall(r => r.getAs[Long]("p") >= 0 && r.getAs[Long]("p") <= 255))
    val pairs = operators.Multimodal.imagePHashFromPixels(pix).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming")))
    // the re-encode pair survives; the inverted image matches nothing
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)),
      s"pairs=${pairs.toSeq}")
    assert(pairs.head._3 <= 3)
    // a lossless PNG roundtrip decodes to the exact planted pixels:
    // A's thumbnail boxes are pure 40/215 blocks (4x4 boxes inside
    // 8x8 squares), so the box means equal the painted values
    val aPix = pxRows.filter(_.getAs[Long]("doc_id") == 1L)
      .map(r => ((r.getAs[Long]("x"), r.getAs[Long]("y")), r.getAs[Long]("p"))).toMap
    for (bx <- 0 until 8; by <- 0 until 8) {
      val want = if (((bx / 2) + (by / 2)) % 2 == 0) 40L else 215L
      assert(aPix((bx.toLong, by.toLong)) == want, s"box ($bx,$by)")
    }
  }

  test("REAL audio decoder through the seam: javax.sound WAVs drive the same VAD plumbing") {
    // the audio twin of the imageio PNG proof: real 16-bit PCM WAVs
    // (pure-JVM encode AND decode) enter silenceFromFrames, the exact
    // operator the md5 stub path uses. doc 1: 0.5 s sine, 0.5 s
    // silence, 0.25 s sine at 8 kHz; doc 2: all sine (no silence).
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def wav(samples: Array[Short], rate: Float): Array[Byte] = {
      val raw = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        raw(2 * i) = (s & 0xff).toByte; raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(rate, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def sine(n: Int, amp: Int): Array[Short] =
      Array.tabulate(n)(i => (amp * math.sin(2 * math.Pi * i / 50.0)).toShort)
    val s1 = sine(4000, 8000) ++ Array.fill[Short](4000)(0) ++ sine(2000, 8000)
    val s2 = sine(10000, 8000)
    import spark.implicits._
    val audio = Seq((1L, wav(s1, 8000f)), (2L, wav(s2, 8000f)))
      .toDF("doc_id", "content")
    val frames = operators.Multimodal.decodeAudioEnergies(audio)
    val got = operators.Multimodal.silenceFromFrames(frames, threshold = 100L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_frames"), r.getAs[Long]("n_silent"),
          r.getAs[Long]("n_segments"), r.getAs[Long]("longest_run")))).toMap
    // expectations from an in-test simulation on the SAME samples —
    // the decoded energies must equal integer mean-|s| per frame
    def sim(samples: Array[Short]) = {
      val (win, hop) = (200, 80)
      val nF = (samples.length - win) / hop + 1
      val energies = (0 until nF).map { f =>
        (f * hop until f * hop + win).map(i => math.abs(samples(i).toLong)).sum / win
      }
      val silent = energies.map(_ < 100L)
      var (nSil, nSeg, longest, run) = (0L, 0L, 0L, 0L)
      silent.foreach { s =>
        if (s) { nSil += 1; run += 1; if (run == 1) nSeg += 1; longest = math.max(longest, run) }
        else run = 0
      }
      (nF.toLong, nSil, nSeg, longest)
    }
    assert(got(1L) == sim(s1), s"doc 1: got=${got(1L)} want=${sim(s1)}")
    assert(got(2L) == sim(s2), s"doc 2: got=${got(2L)} want=${sim(s2)}")
    // the planted silence is really found: one mid-file segment
    assert(got(1L)._2 > 0 && got(2L)._2 == 0)
    // decoded energies are the exact integer means of the planted PCM
    val e0 = frames.filter(
        org.apache.spark.sql.functions.col("doc_id") === 1L &&
        org.apache.spark.sql.functions.col("frame_idx") === 60L)
      .collect()(0).getAs[Long]("energy")
    assert(e0 == 0L, s"frame fully inside the zero span must read 0, got $e0")
  }

  test("audio frames: grid arithmetic and digests replay per doc") {
    val rows = operators.Multimodal.audioFrames(spark, sf).collect()
    assert(rows.nonEmpty)
    val texts = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      val text = texts(id)
      val rate = (8000 + (id % 3) * 4000).toInt
      val (win, hop) = (rate * 25 / 1000, rate * 10 / 1000)
      assert(text.length >= win)
      val nFrames = (text.length - win) / hop + 1
      assert(rs.head.getAs[Long]("n_frames") == nFrames.toLong)
      assert(rs.head.getAs[Long]("sample_rate") == rate.toLong)
      // strided coordinates: 0, 8, 16, ...
      val idxs = rs.map(_.getAs[Long]("frame_idx")).sorted
      assert(idxs.toSeq == (0L until nFrames.toLong by 8L))
      // digest of exactly the window's chars, replayed with MessageDigest
      rs.foreach { r =>
        val off = (r.getAs[Long]("frame_idx") * hop).toInt
        val slice = text.substring(off, math.min(off + win, text.length))
        val hex = md.digest(slice.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(r.getAs[String]("frame_md5") == hex)
      }
    }
  }

  test("phash clusters: components cover exactly the pair-graph nodes") {
    val pairs = operators.Multimodal.imagePHash(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val rows = operators.Multimodal.phashClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"))).toMap
    val nodes = (pairs.map(_._1) ++ pairs.map(_._2)).toSet
    assert(rows.keySet == nodes)
    // every pair's endpoints share a cluster; sizes count members
    pairs.foreach { case (a, b) => assert(rows(a)._1 == rows(b)._1) }
    rows.values.groupBy(_._1).foreach { case (_, g) =>
      assert(g.forall(_._2 == g.size)) }
  }

  test("silence detect: runs replay from per-frame stub energies") {
    val rows = operators.Multimodal.silenceDetect(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val text = docs(id)
      val rate = 8000 + (id % 3) * 4000
      val win = (rate * 25 / 1000).toInt; val hop = (rate * 10 / 1000).toInt
      val nFrames = (text.length - win) / hop + 1
      assert(r.getAs[Long]("n_frames") == nFrames)
      val silent = (0 until nFrames).map { i =>
        val slice = text.substring(i * hop, math.min(i * hop + win, text.length))
        val hex = md.digest(slice.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.take(4), 16) % 1000 < 150
      }
      val runs = silent.foldLeft(List.empty[Int]) {
        case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
        case (acc, true) => 1 :: acc
        case (acc, false) => 0 :: acc
      }.filter(_ > 0)
      assert(r.getAs[Long]("n_silent") == silent.count(identity), s"doc $id silent")
      assert(r.getAs[Long]("n_segments") == runs.length, s"doc $id segments")
      assert(r.getAs[Long]("longest_run") ==
        (if (runs.isEmpty) 0L else runs.max.toLong), s"doc $id longest")
    }
  }

  test("clip filter: per-source accounting sane, planted alignment separates") {
    val rows = operators.Multimodal.clipFilter(spark, sf).collect()
    assert(rows.nonEmpty)
    var keep, pairs, misKeep, mis = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("n_keep") <= r.getAs[Long]("n_pairs"))
      assert(r.getAs[Long]("n_mismatch_keep") <= r.getAs[Long]("n_mismatch"))
      assert(r.getAs[Long]("n_mismatch") <= r.getAs[Long]("n_pairs"))
      keep += r.getAs[Long]("n_keep"); pairs += r.getAs[Long]("n_pairs")
      misKeep += r.getAs[Long]("n_mismatch_keep"); mis += r.getAs[Long]("n_mismatch")
    }
    // the shared-head construction must separate true pairs from the
    // mismatched negative control at the shipped threshold
    assert(keep * mis > 2 * misKeep * pairs,
      s"no separation: $keep/$pairs vs $misKeep/$mis")
  }

  test("audio fingerprint: shifted twins match, unrelated audio does not") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val M = operators.Multimodal
    // corpus row: exactly the planted twin pairs, at full overlap
    val rows = M.audioFingerprint(spark, sf).collect()
    val pairs = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs == M.RealWavShifted.map(d => (d, 100L + d)).toSet, pairs.toString)
    rows.foreach(r => assert(r.getAs[Long]("overlap_ppm") >= 800000, r.toString))
    // core property on planted frames: doc 11 = doc 10 shifted 2
    // frames (every raw energy displaced — zero frame-wise equality
    // at the same index), doc 12 unrelated; only the twin matches
    def eng(seed: Int, f: Int) = 200L + ((f * 37 + seed * 101) % 97) * ((f % 3) + 1)
    val frames =
      (0 until 40).map(f => (10L, f.toLong, eng(1, f))) ++
      (0 until 40).map(f => (11L, f.toLong, if (f < 2) 0L else eng(1, f - 2))) ++
      (0 until 40).map(f => (12L, f.toLong, eng(7, f)))
    val got = M.audioFingerprintOn(
        frames.toDF("doc_id", "frame_idx", "energy"))
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(got == Set((10L, 11L)), got.toString)
  }

  test("audio fingerprint: shift invariance holds for ARBITRARY delays (seeded sweep)") {
    import spark.implicits._
    val M = operators.Multimodal
    // deterministic pseudo-random energy series per (seed, frame)
    def eng(seed: Int, f: Int): Long =
      200L + (math.abs((f * 2654435761L + seed * 40503L).toInt) % 97) * ((f % 3) + 1)
    for (round <- 1 to 3) {
      // 3 base docs per round, each with a twin delayed by a
      // round-varying shift k ∈ [1, 12]; shift must never change the
      // constellation, whatever k is
      val shifts = Seq(1 + round, 4 + round * 2, 12 - round)
      val frames = (0 until 3).flatMap { d =>
        val seed = round * 100 + d * 7 + 1
        val k = shifts(d)
        (0 until 48).map(f => (d.toLong, f.toLong, eng(seed, f))) ++
          (0 until 48).map(f =>
            (100L + d, f.toLong, if (f < k) 0L else eng(seed, f - k)))
      }.toDF("doc_id", "frame_idx", "energy")
      val got = M.audioFingerprintOn(frames).collect()
      val pairs = got.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      assert(pairs == (0 until 3).map(d => (d.toLong, 100L + d)).toSet,
        s"round $round: $pairs")
      // the delayed twin carries the IDENTICAL constellation: full overlap
      got.foreach(r => assert(r.getAs[Long]("overlap_ppm") == 1000000L, r.toString))
    }
  }

  test("audio fingerprint: ubiquitous hash is df-capped out, cap is recall-neutral") {
    import spark.implicits._
    val M = operators.Multimodal
    def eng(seed: Int, f: Int) = 200L + ((f * 37 + seed * 101) % 97) * ((f % 3) + 1)
    // twin pair 1/2 (doc 2 = doc 1 delayed 2 frames) + one unrelated doc
    val base =
      (0 until 40).map(f => (1L, f.toLong, eng(1, f))) ++
      (0 until 40).map(f => (2L, f.toLong, if (f < 2) 0L else eng(1, f - 2))) ++
      (0 until 40).map(f => (3L, f.toLong, eng(7, f)))
    // the hot channel: FpDfCap+16 byte-identical clones — every hash
    // they carry lands in all of them (df ≫ cap), the mass-reused
    // jingle at 10⁹ assets. Uncapped, the match join's fan-out on
    // each such hash is nHot² pairs.
    val nHot = M.FpDfCap + 16
    val hot = (0 until nHot).flatMap(d =>
      (0 until 40).map(f => (100L + d, f.toLong, eng(5, f))))
    val corpus = (base ++ hot).toDF("doc_id", "frame_idx", "energy")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // capped (deployment default): the twin survives, the nHot²-pair
    // hot channel is GONE — every join group is ≤ dfCap postings
    val capped = pairs(M.audioFingerprintOn(corpus))
    assert(capped == Set((1L, 2L)), capped.toString)
    // control: without the cap the hot clones flood the result —
    // proving the cap (not luck) is what bounded the join
    val uncapped = pairs(M.audioFingerprintOn(corpus, dfCap = Int.MaxValue))
    assert(uncapped.size == 1 + nHot * (nHot - 1) / 2, uncapped.size.toString)
    // recall-neutral: on a corpus with no ubiquitous hash the capped
    // and uncapped results are byte-identical (n_prints included —
    // the denominator counts kept hashes only)
    val clean = base.toDF("doc_id", "frame_idx", "energy")
    assert(M.audioFingerprintOn(clean).collect().toSeq ==
      M.audioFingerprintOn(clean, dfCap = Int.MaxValue).collect().toSeq)
  }

  test("audio fingerprint: no hint-forced broadcast of a corpus-scaled relation") {
    // `counts` (one row per corpus doc) joins back per match side;
    // a broadcast() hint there is a driver-memory bomb at 10⁹ assets
    // (the round-12 policy). The only hints allowed in this plan are
    // the scale-safe shuffle_hash pins on the pairing/match joins —
    // any broadcast must be AQE's own measured-size decision.
    val M = operators.Multimodal
    val analyzed = M.audioFingerprint(spark, sf).queryExecution.analyzed.toString
    assert(!analyzed.contains("strategy=broadcast"),
      "fingerprint plan carries a forced broadcast hint:\n" +
        analyzed.linesIterator.filter(_.contains("ResolvedHint")).mkString("\n"))
  }

  test("GIF decode: delta-encoded frames fail fast, corrupt payloads drop the doc") {
    import spark.implicits._
    val M = operators.Multimodal
    val grays = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    def gifBytes(disposal: Option[String]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      writer.setOutput(out)
      writer.prepareWriteSequence(null)
      (0 until 3).foreach { f =>
        val img = new java.awt.image.BufferedImage(8, 8,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        for (y <- 0 until 8; x <- 0 until 8) {
          val v = (f * 40 + x + y) % 256
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
        }
        val md = disposal.map { d =>
          val m = writer.getDefaultImageMetadata(
            javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img),
            writer.getDefaultWriteParam)
          val fmt = "javax_imageio_gif_image_1.0"
          val root = m.getAsTree(fmt)
            .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          val gces = root.getElementsByTagName("GraphicControlExtension")
          val gce = if (gces.getLength > 0)
            gces.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          else {
            val n = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
            n.setAttribute("userInputFlag", "FALSE")
            n.setAttribute("transparentColorFlag", "FALSE")
            n.setAttribute("delayTime", "10")
            n.setAttribute("transparentColorIndex", "0")
            root.appendChild(n); n
          }
          gce.setAttribute("disposalMethod", d)
          m.setFromTree(fmt, root)
          m
        }.orNull
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, md), null)
      }
      writer.endWriteSequence(); writer.dispose(); out.close()
      bos.toByteArray
    }
    // a delta GIF (disposal composites against prior frames) must
    // fail the job loudly — a per-index read would silently sum a
    // partial frame
    val delta = Seq((1L, gifBytes(Some("restoreToBackgroundColor"))))
      .toDF("doc_id", "content")
    val e = intercept[Exception] {
      M.decodeGifFrames(delta, stride = 1).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("delta-encoded")), messages(e).toString)
    // the COMMON delta form: a sub-rectangle frame (ImageDescriptor
    // smaller than the logical screen) under a non-restore disposal —
    // it passes the disposal guard but its pixels outside the rect
    // composite against the prior frame, so it must also fail fast
    def subRectGif(): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      writer.setOutput(out)
      writer.prepareWriteSequence(null)
      Seq(8, 4).foreach { side => // frame 1 covers only a 4x4 corner
        val img = new java.awt.image.BufferedImage(side, side,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        for (y <- 0 until side; x <- 0 until side) {
          val v = (x + y) % 256
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence(); writer.dispose(); out.close()
      bos.toByteArray
    }
    val sub = Seq((1L, subRectGif())).toDF("doc_id", "content")
    val e2 = intercept[Exception] {
      M.decodeGifFrames(sub, stride = 1).collect()
    }
    assert(messages(e2).exists(_.contains("sub-rectangle delta")), messages(e2).toString)
    // a truncated payload drops ITS doc only; intact docs decode
    val good = gifBytes(None)
    val mixed = Seq((1L, good), (2L, good.take(good.length / 2)))
      .toDF("doc_id", "content")
    val got = M.decodeGifFrames(mixed, stride = 1).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSet == Set(1L), got.mkString(","))
    assert(got.length == 3)
  }

  test("real GIF decode: scene cuts land exactly on the planted boundaries") {
    val M = operators.Multimodal
    // in-test ground truth straight from the planted content keys:
    // per-frame sums through the SAME md5 scheme, then the cut logic
    def frameSums(doc: Long): Seq[Long] =
      (0 until M.gifFrames(doc)).map { f =>
        val scene = f / M.gifSceneLen(doc)
        (for (y <- 0 until 8; x <- 0 until 8)
          yield M.gifPixel(doc, scene, x, y).toLong).sum
      }
    val cuts = operators.Multimodal.sceneCutsReal(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_decoded"), r.getAs[Long]("n_scenes"),
          r.getAs[Long]("longest_scene")))).toMap
    assert(cuts.keySet == M.RealGifDocs.toSet)
    M.RealGifDocs.foreach { doc =>
      val sums = frameSums(doc)
      val nScenes = 1L + sums.sliding(2).count { case Seq(a, b) => a != b }
      val runs = sums.foldLeft(List.empty[(Long, Long)]) {
        case ((v, n) :: t, s) if v == s => (v, n + 1) :: t
        case (acc, s) => (s, 1L) :: acc
      }
      assert(cuts(doc) == ((sums.length.toLong, nScenes, runs.map(_._2).max)),
        s"doc $doc: ${cuts(doc)}")
      // and the planted structure itself: scenes of gifSceneLen frames
      assert(nScenes == (M.gifFrames(doc) + M.gifSceneLen(doc) - 1) / M.gifSceneLen(doc),
        s"doc $doc: planted sums collided across a scene boundary")
    }
    // frame sampling decodes ONLY the strided indexes, sums exact
    val sampled = operators.Multimodal.frameSampleReal(spark, sf).collect()
    assert(sampled.length == M.RealGifDocs.map(d => (M.gifFrames(d) + 3) / 4).sum)
    sampled.foreach { r =>
      val doc = r.getAs[Long]("doc_id"); val f = r.getAs[Long]("frame_idx")
      assert(f % 4 == 0)
      assert(r.getAs[Long]("n_frames") == M.gifFrames(doc).toLong)
      assert(r.getAs[Long]("fsum") == frameSums(doc)(f.toInt), s"doc $doc frame $f")
    }
  }
}
