package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Multimodal column handling: opaque binary payloads + typed
  * metadata, with the decode step STUBBED deterministically (no image
  * / audio codecs ship in this environment — a real deployment swaps
  * `stubDecode` for a codec call; every other part of the plumbing —
  * schema, batching, partition-parallel decode — is real and tested).
  *
  * The test corpus has no binary media, so the payload is the
  * document's UTF-8 bytes; the stub derives fake dimensions from the
  * payload's md5 — engine-reproducible, so even the stub is oracle-
  * checked (mm_binary_meta).
  */
object Multimodal {

  /** SQL-surface metadata extraction over a binary column: byte
    * length, content digest, leading-bytes magic, stub-decoded
    * dimensions (md5-derived). */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("n_bytes", expr("octet_length(payload)").cast("bigint"))
      .withColumn("payload_md5", md5(col("payload")))
      .withColumn("magic_hex", hex(expr("substring(payload, 1, 4)")))
      // STUB decode: dimensions derived from the digest, not a codec
      .withColumn("fake_width",
        expr("1 + CAST(conv(substring(payload_md5, 1, 4), 16, 10) AS BIGINT) % 1920"))
      .withColumn("fake_height",
        expr("1 + CAST(conv(substring(payload_md5, 5, 4), 16, 10) AS BIGINT) % 1080"))
      .select("doc_id", "n_bytes", "payload_md5", "magic_hex", "fake_width", "fake_height")
      .orderBy("doc_id")

  /** Frame sampling over a binary "video" column: the payload is
    * treated as fixed 32-byte frames and every 4th frame is sampled
    * and fingerprinted. The explode(sequence(...)) fan-out is exactly
    * how a real frame sampler turns one media row into per-frame
    * rows — the per-frame decode here is a digest stub (no codecs in
    * this environment), but the row-multiplying shape, the byte
    * offsets, and the downstream schema are the real thing. Sampling
    * happens before any decode, which is the 100 TB-correct order:
    * never decode frames you won't keep. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("n_frames", expr("octet_length(payload) div 32").cast("bigint"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("payload"), col("n_frames"),
        explode(expr("sequence(CAST(0 AS BIGINT), n_frames - 1, 4)")).as("frame_idx"))
      .withColumn("frame_md5", md5(expr("substring(payload, CAST(frame_idx * 32 + 1 AS INT), 32)")))
      .select("doc_id", "n_frames", "frame_idx", "frame_md5")
      .orderBy("doc_id", "frame_idx")

  /** Shot/scene segmentation over the sampled frame grid — the video
    * curation pass that turns raw footage into training clips: walk
    * the sampled frames in order, flag a CUT where consecutive frame
    * signatures differ, and segment the frames into scenes (the
    * island trick on the cut flags), reporting per asset the scene
    * count and the longest scene. The frame signature is the
    * documented stub (a 4-bit bucket of the frame bytes' md5 — a
    * real deployment swaps in a perceptual frame distance; the stub
    * keeps the boundary statistics non-trivial and both engines
    * replay it exactly). The SHAPE is the operator: per-asset
    * lag/running-sum windows bounded by frames-per-asset, one
    * scene-level agg, one asset-level rollup — never a self-join of
    * frames, and sampling happens before any per-frame work. */
  def sceneCuts(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    val frames = documents(spark, dir)
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("n_frames", expr("octet_length(payload) div 32").cast("bigint"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("payload"), col("n_frames"),
        explode(expr("sequence(CAST(0 AS BIGINT), n_frames - 1, 4)")).as("frame_idx"))
      .withColumn("fsig", expr(
        "CAST(conv(substring(md5(substring(payload, CAST(frame_idx * 32 + 1 AS INT), 32)), 1, 1), 16, 10) AS BIGINT)"))
    frames
      .withColumn("prev", lag("fsig", 1).over(w))
      .withColumn("is_cut",
        when(col("prev").isNull || col("prev") =!= col("fsig"), 1L).otherwise(0L))
      .withColumn("scene_id", sum("is_cut")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "scene_id")
      .agg(count(lit(1)).as("scene_frames"))
      .groupBy("doc_id")
      .agg(sum("scene_frames").as("n_sampled"),
        count(lit(1)).as("n_scenes"),
        max("scene_frames").as("longest_scene"))
      .orderBy("doc_id")
  }

  /** Perceptual-hash media dedup (average-hash / aHash family) — the
    * near-duplicate IMAGE detector a media lake runs where byte
    * digests (mm_dedup_binary) miss re-encodes: decode to a tiny
    * grayscale thumbnail, threshold each pixel against the mean, and
    * compare the resulting bit signatures by hamming distance. The
    * decode is the documented stub (60 deterministic pseudo-pixels
    * from md5 over the normalized 64-char payload prefix — this
    * container ships no codecs, and the prefix plays the thumbnail's
    * role: near-duplicate payloads share it, so they land at hamming
    * 0 the way visually-near re-encodes would under a real decoder;
    * unrelated payloads get independent signatures). The plumbing is
    * the operator and it is exactly
    * dedup_simhash's scale shape: per-doc signature in one
    * projection, 4×15-bit pigeonhole blocking (hamming ≤ 3 ⇒ some
    * block equal), exact bit_count verify on candidates only — never
    * an all-pairs compare. Mean threshold is exact integer math
    * (pixel·60 > Σpixels). */
  def imageAHash(spark: SparkSession, dir: String): DataFrame =
    // r16: the r15 scan fan-out is dropped — re-adjudicated on an
    // interleaved same-session A/B (plain beat fan-out 0.85 median of
    // 5 pairs): the signature projection feeds the blocking join's
    // exchange, which already parallelizes everything downstream, so
    // the added repartition was pure stage latency here.
    imageAHashOn(documents(spark, dir))

  /** Generic core: aHash near-dup pairs over any (doc_id, text)
    * payload relation — the library entry point (and the seam the
    * spec drives with planted payloads whose collisions are known). */
  def imageAHashOn(docs: DataFrame): DataFrame = {
    val thumb =
      expr("substring(trim(regexp_replace(lower(text), '\\\\s+', ' ')), 1, 64)")
    val hexed = docs.select(col("doc_id"),
      concat((0 until 4).map(k => md5(concat(thumb, lit(s"#px$k")))): _*)
        .as("hex"))
    val pxCols = (0 until 60).map(i =>
      expr(s"CAST(conv(substring(hex, ${2 * i + 1}, 2), 16, 10) AS BIGINT)")
        .as(s"p$i"))
    val total = (0 until 60).map(i => col(s"p$i")).reduce(_ + _)
    // materialization barrier: without it CollapseProject inlines the
    // md5/conv pixel subtree into every one of the 60 threshold
    // conditions AND the 60-term mean under each — a multiplicative
    // tree explosion (observed: the optimizer never returned). The
    // staged thumbnail relation is 61 longs per doc — tiny at any
    // corpus size, and the natural "decoded thumbnails" handoff a
    // real decoder stage would produce anyway.
    val px = hexed.select(col("doc_id") +: pxCols: _*)
      .withColumn("total", total)
      .localCheckpoint()
    val hash = (0 until 60)
      .map(i => when(col(s"p$i") * 60 > col("total"), lit(1L << i))
        .otherwise(lit(0L)))
      .reduce(_ + _)
    val sigs = px.select(col("doc_id"), hash.as("ahash"))
    val exploded = sigs
      .withColumn("blocks", expr(
        "transform(sequence(0, 3), b -> struct(b AS blk, shiftright(ahash, b*15) & 32767 AS key))"))
      .select(col("doc_id"), col("ahash"), explode(col("blocks")).as("bk"))
      .select(col("doc_id"), col("ahash"), col("bk.blk"), col("bk.key"))
    exploded.as("a").join(exploded.as("b").hint("shuffle_hash"),
        col("a.blk") === col("b.blk") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("CAST(bit_count(a.ahash ^ b.ahash) AS BIGINT)").as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

  /** Audio framing plan — the 25 ms window / 10 ms hop frame grid
    * every speech pipeline (MFCC, wav2vec-style encoders) lays over a
    * waveform BEFORE any decode. Sample-rate metadata is a
    * deterministic stub (8/12/16 kHz by doc_id), the "waveform" is
    * the text payload at one sample per char, and the frame count /
    * offsets / strided sampling are the real integer arithmetic the
    * planner owns: n_frames = (n −win) div hop + 1, every 8th frame
    * materialized, per-frame digest of exactly the window's samples.
    * Sample-before-decode order as in mm_frame_sample: the explode
    * emits frame COORDINATES and only sampled frames ever touch
    * payload bytes. */
  def audioFrames(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("doc_id"), col("text"),
        expr("8000 + (doc_id % 3) * 4000").as("sample_rate"),
        length(col("text")).cast("bigint").as("n_samples"))
      .withColumn("win", expr("sample_rate * 25 div 1000"))
      .withColumn("hop", expr("sample_rate * 10 div 1000"))
      .filter(col("n_samples") >= col("win"))
      .withColumn("n_frames", expr("(n_samples - win) div hop + 1"))
      .select(col("doc_id"), col("sample_rate"), col("n_frames"),
        col("text"), col("win"), col("hop"),
        explode(expr("sequence(CAST(0 AS BIGINT), n_frames - 1, 8)")).as("frame_idx"))
      .withColumn("frame_md5",
        md5(expr("CAST(substring(text, CAST(frame_idx * hop + 1 AS INT), CAST(win AS INT)) AS BINARY)")))
      .select("doc_id", "sample_rate", "n_frames", "frame_idx", "frame_md5")
      .orderBy("doc_id", "frame_idx")

  /** Silence detection over the audio frame grid (VAD-style
    * trim/segment planning — the speech-pipeline twin of
    * [[sceneCuts]]): per frame a stub energy (md5-derived integer,
    * the codec stand-in convention — a real deployment swaps ONE
    * expression for the decoded RMS), frames under the threshold
    * merge into maximal silence segments via per-doc island
    * detection (the repeated-spans shape). Per doc: frame counts,
    * silent mass, segment count, longest run, silence ppm — the
    * numbers a dataset card reports and a trimming pass acts on.
    * Scale: the frame grid is an explode bounded by payload length;
    * islands ride per-doc windows; no shuffle wider than the
    * per-doc rollup. */
  def silenceDetect(spark: SparkSession, dir: String): DataFrame = {
    val frames = documents(spark, dir)
      .select(col("doc_id"), col("text"),
        expr("8000 + (doc_id % 3) * 4000").as("sample_rate"),
        length(col("text")).cast("bigint").as("n_samples"))
      .withColumn("win", expr("sample_rate * 25 div 1000"))
      .withColumn("hop", expr("sample_rate * 10 div 1000"))
      .filter(col("n_samples") >= col("win"))
      .withColumn("n_frames", expr("(n_samples - win) div hop + 1"))
      .select(col("doc_id"), col("n_frames"), col("text"), col("win"), col("hop"),
        explode(expr("sequence(CAST(0 AS BIGINT), n_frames - 1)")).as("frame_idx"))
      .withColumn("energy", expr(
        """CAST(conv(substring(md5(CAST(substring(text,
          |CAST(frame_idx * hop + 1 AS INT), CAST(win AS INT)) AS BINARY)), 1, 4), 16, 10)
          |AS BIGINT) % 1000""".stripMargin.replace("\n", " ")))
      .select("doc_id", "n_frames", "frame_idx", "energy")
    silenceFromFrames(frames, threshold = 150L)
  }

  /** The VAD plumbing DOWNSTREAM of the decode seam, shared by the
    * md5 stub and the real WAV decoder: a (doc_id, n_frames,
    * frame_idx, energy) frame-energy relation → threshold →
    * per-doc island detection → segment accounting. */
  def silenceFromFrames(frames: DataFrame, threshold: Long): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    val silent = frames.filter(col("energy") < threshold)
      .withColumn("g", col("frame_idx") - row_number().over(w))
    val runs = silent.groupBy("doc_id", "g").agg(count(lit(1)).as("run_len"))
    val perDoc = runs.groupBy("doc_id")
      .agg(count(lit(1)).as("n_segments"), max("run_len").as("longest_run"),
        sum("run_len").as("n_silent"))
    frames.groupBy("doc_id").agg(max("n_frames").as("n_frames"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_segments", "longest_run", "n_silent"))
      .withColumn("silence_ppm", expr("n_silent * 1000000 div n_frames"))
      .select("doc_id", "n_frames", "n_silent", "n_segments",
        "longest_run", "silence_ppm")
      .orderBy("doc_id")
  }

  /** REAL audio decoder for the seam: WAV bytes → javax.sound
    * (pure JVM; PCM decodes deterministically) → 16-bit samples →
    * the 25 ms / 10 ms frame grid at the file's OWN sample rate →
    * integer mean-|amplitude| energy per frame — the same
    * (doc_id, n_frames, frame_idx, energy) relation the md5 stub
    * produces, feeding [[silenceFromFrames]] unchanged.
    * mapPartitions so a real codec amortizes init per batch;
    * unreadable or non-16-bit payloads drop out. */
  def decodeAudioEnergies(audio: DataFrame): DataFrame = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.select(col("doc_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (id, bytes) =>
          val in = try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
          if (in == null || in.getFormat.getSampleSizeInBits != 16 ||
              in.getFormat.getChannels != 1) Iterator.empty
          else {
            val fmt = in.getFormat
            val raw = in.readAllBytes()
            val le = !fmt.isBigEndian
            val n = raw.length / 2
            val rate = fmt.getSampleRate.toLong
            val win = rate * 25 / 1000
            val hop = rate * 10 / 1000
            if (n < win || hop <= 0) Iterator.empty
            else {
              def sample(i: Long): Long = {
                val b0 = raw(2 * i.toInt) & 0xff
                val b1 = raw(2 * i.toInt + 1) & 0xff
                val v = if (le) (b1 << 8) | b0 else (b0 << 8) | b1
                (v << 16) >> 16 // sign-extend
              }
              val nFrames = (n - win) / hop + 1
              (0L until nFrames).iterator.map { f =>
                var s = 0L; var i = f * hop
                val end = f * hop + win
                while (i < end) { s += math.abs(sample(i)); i += 1 }
                (id, nFrames, f, s / win)
              }
            }
          }
        }
      }.toDF("doc_id", "n_frames", "frame_idx", "energy")
  }

  /** Feature-extract + resize planning over the binary column. The
    * per-payload feature vector is a codec stand-in (md5-derived
    * floats in [0,1] — deterministic, oracle-checkable, emitted as
    * scalar columns); the resize arithmetic is real: fit the
    * stub-decoded dimensions into 224×224 preserving aspect ratio
    * with integer math (no doubles — cross-engine exact and what a
    * batch image pipeline computes BEFORE decoding, so the decoder
    * can target the output size directly). */
  def featureExtract(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("payload_md5", md5(col("payload")))
      .withColumn("fake_width",
        expr("1 + CAST(conv(substring(payload_md5, 1, 4), 16, 10) AS BIGINT) % 1920"))
      .withColumn("fake_height",
        expr("1 + CAST(conv(substring(payload_md5, 5, 4), 16, 10) AS BIGINT) % 1080"))
      // clamp the short side to >= 1: an extreme aspect ratio (say
      // 1900x5) floors to 0 otherwise, and no resizer emits 0-px dims
      .withColumn("out_w",
        expr("greatest(CAST(1 AS BIGINT), fake_width * 224 div greatest(fake_width, fake_height))"))
      .withColumn("out_h",
        expr("greatest(CAST(1 AS BIGINT), fake_height * 224 div greatest(fake_width, fake_height))"))
      .withColumn("f0", expr("CAST(conv(substring(payload_md5,  9, 4), 16, 10) AS DOUBLE) / 65535.0"))
      .withColumn("f1", expr("CAST(conv(substring(payload_md5, 13, 4), 16, 10) AS DOUBLE) / 65535.0"))
      .withColumn("f2", expr("CAST(conv(substring(payload_md5, 17, 4), 16, 10) AS DOUBLE) / 65535.0"))
      .withColumn("f3", expr("CAST(conv(substring(payload_md5, 21, 4), 16, 10) AS DOUBLE) / 65535.0"))
      .select("doc_id", "fake_width", "fake_height", "out_w", "out_h", "f0", "f1", "f2", "f3")
      .orderBy("doc_id")

  /** typed row for the partition-parallel decode path. */
  case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** decoded metadata a real codec would produce. */
  case class DecodedMedia(doc_id: Long, n_bytes: Int, width: Int, height: Int, ok: Boolean)

  /** STUB decoder — stands in for an image/audio codec invocation.
    * Deterministic: dimensions from the first payload bytes. A real
    * implementation replaces only this function; the Dataset plumbing
    * (encoder schema, mapPartitions batch shape, per-partition
    * parallelism) is exactly what a codec UDF needs at 100 TB. */
  private def stubDecode(row: MediaRow): DecodedMedia = {
    val b = row.payload
    val w = 1 + (((b.headOption.getOrElse(0: Byte) & 0xff) << 4) % 1920)
    val h = 1 + (((b.lift(1).getOrElse(0: Byte) & 0xff) << 4) % 1080)
    DecodedMedia(row.doc_id, b.length, w, h, ok = b.nonEmpty)
  }

  /** Partition-parallel decode over the binary column: the
    * mapPartitions analog of a mapInPandas decode stage — one
    * iterator per partition so a real codec could amortize
    * init/native-buffer cost across the batch. */
  def decodeBatch(spark: SparkSession, dir: String): Dataset[DecodedMedia] = {
    import spark.implicits._
    documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
      .mapPartitions(iter => iter.map(stubDecode))
  }

  /** Binary-payload dedup accounting — the media-side twin of
    * Dedup.exact: groups on the digest of the RAW bytes (no text
    * normalization — for opaque media the bytes ARE the identity)
    * and reports per duplicate group the copy count, per-copy size,
    * the canonical keeper, and the bytes a dedup store would
    * reclaim ((copies−1)·size) — the number a 100 TB media-lake
    * dedup job is judged by. One digest shuffle, linear. */
  def binaryDedup(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .withColumn("payload", col("text").cast("binary"))
      .select(md5(col("payload")).as("payload_md5"),
        expr("octet_length(payload)").cast("bigint").as("n_bytes"),
        col("doc_id"))
      .groupBy("payload_md5", "n_bytes")
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("canonical_id"))
      .withColumn("reclaimable_bytes", (col("n_copies") - 1) * col("n_bytes"))
      .select("payload_md5", "n_copies", "n_bytes", "canonical_id",
        "reclaimable_bytes")
      .orderBy("payload_md5")

  /** Integer DCT-II basis, scaled ×1024 and rounded: c(u,x) =
    * round(1024·cos(π(2x+1)u/16)) for the 8-point transform. One
    * Scala source feeds BOTH engines (the operator embeds it as a
    * 64-row literal relation, the oracle as a generated VALUES list —
    * the Vectors.plane precedent), so the transform is exact integer
    * arithmetic everywhere. */
  private[graft] val dctTable: Seq[(Long, Long, Long)] =
    for (u <- 0L until 8L; x <- 0L until 8L) yield
      (u, x, math.round(1024.0 * math.cos(math.Pi * (2 * x + 1) * u / 16.0)))

  /** Perceptual-hash media dedup, DCT variant (pHash family) — the
    * re-encode-robust upgrade of [[imageAHash]]: aHash thresholds raw
    * pixels, so local brightness noise flips bits; pHash thresholds the
    * LOW-FREQUENCY DCT coefficients, which survive resampling and
    * recompression. Same stub decoder (the 8×8 = 64 md5 pseudo-pixel
    * thumbnail), then:
    *
    *  1. Separable 2-D DCT as TWO join+aggregate stages over the long
    *     (doc, x, y, p) layout — G[u,y] = Σₓ p·c(u,x), then
    *     F[u,v] = Σ_y G·c(v,y). Each stage is an 8× fan-out against
    *     the broadcast 64-row basis followed by a map-side-combined
    *     hash agg: the plan a cluster DCT actually wants (never a
    *     4096-term projection, which is also what janino would choke
    *     on — the PQ kernel lesson). MEASURED alternative rejected: a
    *     per-doc nested higher-order-function loop (transform over
    *     the 64 (u,v) pairs × aggregate over 64 pixels) is 6× SLOWER
    *     (19 s vs 3.3 s at sf0.1) because Spark's HOF lambdas are
    *     CodegenFallback — the 4096 multiply-adds run interpreted per
    *     row, while the join+agg layout keeps every stage in
    *     whole-stage codegen. HOFs earn their keep on SHORT per-row
    *     arrays (expr_higher_order); dense per-row compute belongs in
    *     relational operators or a native kernel.
    *  2. Mean-variant pHash signature: bit(u,v) = F·63 > ΣF over the
    *     63 non-DC coefficients — exact integer compare, no doubles
    *     anywhere (the classic median variant needs an order
    *     statistic; the mean variant is the same family and keeps the
    *     fold order-free).
    *  3. The dedup tail is [[imageAHashOn]]'s: 4×16-bit pigeonhole
    *     blocks (hamming ≤ 3 ⇒ some block equal), exact bit_count on
    *     candidates only.
    *
    * All magnitudes are long-safe by construction: p ≤ 255 ⇒
    * |G| ≤ 8·255·1024 ≈ 2.1e6 ⇒ |F| ≤ 1.7e10 ⇒ F·63 ≤ 1.1e12. */
  def imagePHash(spark: SparkSession, dir: String): DataFrame =
    stagedPhashPairs(spark, dir).orderBy("doc_a", "doc_b")

  /** the pHash pair graph feeds two consumers (the pair query + the
    * cluster rollup): stage it once per (app, sf dir) like the dedup
    * stack's shared relations. */
  private def stagedPhashPairs(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Staging.staged(spark, dir, "phash_pairs")(imagePHashOn(documents(spark, dir)))

  /** Perceptual-duplicate CLUSTERS — the media-library rollup over
    * the [[imagePHash]] pair graph: connected components via the same
    * enforced-fixpoint min-label propagation as [[Dedup.components]]
    * (hamming ≤ 3 is near-transitive for re-encodes of one asset, so
    * components ARE the asset groups a storage dedup collapses), with
    * each cluster's size joined back map-side-combined. */
  def phashClusters(spark: SparkSession, dir: String): DataFrame = {
    val comp = Dedup.minLabelComponents(
      stagedPhashPairs(spark, dir).select("doc_a", "doc_b"), "doc_a", "doc_b")
      .localCheckpoint() // consumers: size agg + join
    comp.join(comp.groupBy("label").agg(count(lit(1)).as("cluster_size")), "label")
      .select(col("node").as("doc_id"), col("label").as("cluster_id"),
        col("cluster_size"))
      .orderBy("doc_id")
  }

  /** Generic core of [[imagePHash]] over any (doc_id, text) payload
    * relation: the documented STUB decode (md5 pseudo-pixels over the
    * normalized payload prefix) feeding the REAL transform plumbing —
    * everything downstream of the pixel relation is shared with the
    * javax.imageio path ([[decodeImagePixels]]), which is how
    * MultimodalSpec proves the seam: stub and real decoder drive the
    * SAME [[imagePHashFromPixels]]. */
  def imagePHashOn(docs: DataFrame): DataFrame = {
    val thumb =
      expr("substring(trim(regexp_replace(lower(text), '\\\\s+', ' ')), 1, 64)")
    val hexed = docs.select(col("doc_id"),
      concat((0 until 4).map(k => md5(concat(thumb, lit(s"#px$k")))): _*)
        .as("hex"))
    val pix = hexed
      .select(col("doc_id"), col("hex"), explode(expr("sequence(0, 63)")).as("i"))
      .select(col("doc_id"), expr("CAST(i % 8 AS BIGINT)").as("x"),
        expr("CAST(i div 8 AS BIGINT)").as("y"),
        expr("CAST(conv(substring(hex, 2*i + 1, 2), 16, 10) AS BIGINT)").as("p"))
    imagePHashFromPixels(pix)
  }

  /** REAL decoder for the seam: image bytes (PNG/JPEG/BMP — whatever
    * javax.imageio reads; pure JVM, lossless formats decode
    * deterministically) → exact integer 8×8 box-mean grayscale
    * thumbnail → the same (doc_id, x, y, p) pixel relation the stub
    * produces. mapPartitions so a deployed codec amortizes decoder
    * init across the batch (the mapInPandas seam shape); unreadable
    * payloads drop out rather than poisoning the stage. */
  def decodeImagePixels(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("doc_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (id, bytes) =>
          val img = try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          catch { case _: java.io.IOException => null }
          if (img == null || img.getWidth < 8 || img.getHeight < 8) Iterator.empty
          else {
            val w = img.getWidth; val h = img.getHeight
            for { by <- (0 until 8).iterator; bx <- (0 until 8).iterator } yield {
              val x0 = bx * w / 8; val x1 = math.max(x0 + 1, (bx + 1) * w / 8)
              val y0 = by * h / 8; val y1 = math.max(y0 + 1, (by + 1) * h / 8)
              var sum = 0L; var n = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  val rgb = img.getRGB(x, y)
                  sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                  n += 3
                  x += 1
                }
                y += 1
              }
              (id, bx.toLong, by.toLong, sum / n)
            }
          }
        }
      }.toDF("doc_id", "x", "y", "p")
  }

  /** The PLANTED real-media corpus driving the driver-path decode
    * rows ([[imagePHashReal]], [[silenceReal]]): every byte derives
    * from md5 of a content key, so the DuckDB oracle regenerates the
    * identical pixels/samples from first principles and replays the
    * whole decode→transform chain — a REAL oracle over REAL codec
    * bytes, not a literal answer table. Image variants: 8 base
    * 16×16 RGB images, 4 exact re-encodes (hamming 0 by
    * construction), 1 inverse (matches nothing), 2 noisy copies
    * (+1 on the (x+y)%7 diagonal — the MultimodalSpec re-encode
    * recipe). PNG is lossless and TYPE_INT_RGB carries channels
    * verbatim, so decoded == planted exactly. */
  private[graft] val RealImageDocs: Seq[(Long, Long, String)] =
    (0L to 7L).map(i => (i, i, "base")) ++
      (0L to 3L).map(i => (100L + i, i, "copy")) ++
      Seq((200L, 0L, "inverse")) ++
      (0L to 1L).map(i => (300L + i, i, "noisy"))

  /** WAV side: 6 mono 16-bit PCM files at 8 kHz, 4000 samples each,
    * amplitudes md5-derived in ±2048 with one planted 700-sample
    * silent span per doc at offset doc·300+400. */
  private[graft] val RealWavDocs: Seq[Long] = 0L to 5L
  private[graft] val WavSamples = 4000

  /** shifted TWINS for the fingerprint row (files fp_10d.wav): doc
    * 100+d is doc d delayed by [[WavShift]] samples — exactly 2
    * frame hops, so the shifted energies are the original's
    * energies displaced by 2 frames: the same audio at a different
    * alignment. Raw energy vectors disagree frame-by-frame; only a
    * time-delta-anchored fingerprint can match the pair — precisely
    * the property constellation hashing exists for. */
  private[graft] val RealWavShifted: Seq[Long] = 0L to 2L
  private[graft] val WavShift = 160

  /** GIF side (the frame family's real corpus): 6 animated GIFs,
    * 8×8 indexed-gray frames, doc d carrying [[gifFrames]] frames in
    * scenes of [[gifSceneLen]] consecutive identical frames — the
    * planted scene boundaries. Every pixel derives from
    * md5("vid{doc}:{scene}:{x}:{y}"), the palette is the explicit
    * 256-gray IndexColorModel, and GIF is lossless over an indexed
    * image — decoded == planted exactly, so the oracle regenerates
    * every frame from first principles. */
  private[graft] val RealGifDocs: Seq[Long] = 0L to 5L
  private[graft] def gifFrames(doc: Long): Int = 24 + (doc.toInt % 3) * 8
  private[graft] def gifSceneLen(doc: Long): Int = 4 + (doc.toInt % 3)
  private[graft] def gifPixel(doc: Long, scene: Int, x: Int, y: Int): Int =
    Integer.parseInt(md5Hex(s"vid$doc:$scene:$x:$y").substring(0, 2), 16)

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private[graft] def imgChannel(base: Long, variant: String, x: Int, y: Int,
      c: Int): Int = {
    val p = Integer.parseInt(md5Hex(s"img$base:$x:$y:$c").substring(0, 2), 16)
    variant match {
      case "inverse" => 255 - p
      case "noisy"   => if ((x + y) % 7 == 0) math.min(p + 1, 255) else p
      case _         => p
    }
  }

  private[graft] def wavSample(doc: Long, i: Int): Int = {
    val s0 = (doc * 300 + 400).toInt
    if (i >= s0 && i < s0 + 700) 0
    else Integer.parseInt(md5Hex(s"wav$doc:$i").substring(0, 3), 16) - 2048
  }

  /** the planted media FILES, staged once per (app, sf) through the
    * atomic publish helper — 15 PNGs + 6 WAVs written with the real
    * encoders (javax.imageio / javax.sound), read back through the
    * real binaryFile source. */
  private def stagedRealMedia(spark: SparkSession, dir: String): String =
    graft.sources.Staging.stagedPath(spark, dir, "real_media",
        readyMarker = "_DONE") { tmp =>
      val d = new java.io.File(tmp); d.mkdirs()
      RealImageDocs.foreach { case (id, base, variant) =>
        val img = new java.awt.image.BufferedImage(16, 16,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until 16; x <- 0 until 16) {
          val r = imgChannel(base, variant, x, y, 0)
          val g = imgChannel(base, variant, x, y, 1)
          val b = imgChannel(base, variant, x, y, 2)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
        }
        javax.imageio.ImageIO.write(img, "png",
          new java.io.File(d, s"doc_$id.png")): Unit
      }
      RealWavDocs.foreach { id =>
        val bytes = new Array[Byte](WavSamples * 2)
        (0 until WavSamples).foreach { i =>
          val v = wavSample(id, i)
          bytes(2 * i) = (v & 0xff).toByte
          bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(bytes), fmt, WavSamples.toLong)
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE,
          new java.io.File(d, s"doc_$id.wav")): Unit
      }
      RealWavShifted.foreach { base =>
        val bytes = new Array[Byte](WavSamples * 2)
        (0 until WavSamples).foreach { i =>
          val v = if (i < WavShift) 0 else wavSample(base, i - WavShift)
          bytes(2 * i) = (v & 0xff).toByte
          bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(bytes), fmt, WavSamples.toLong)
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE,
          new java.io.File(d, s"fp_${100 + base}.wav")): Unit
      }
      // explicit 256-gray palette: an indexed image roundtrips GIF
      // losslessly (the default RGB path would re-quantize)
      val grays = Array.tabulate(256)(_.toByte)
      val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
      RealGifDocs.foreach { id =>
        val out = javax.imageio.ImageIO.createImageOutputStream(
          new java.io.File(d, s"doc_$id.gif"))
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        writer.setOutput(out)
        writer.prepareWriteSequence(null)
        val sceneLen = gifSceneLen(id)
        (0 until gifFrames(id)).foreach { f =>
          val img = new java.awt.image.BufferedImage(8, 8,
            java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
          val scene = f / sceneLen
          for (y <- 0 until 8; x <- 0 until 8) {
            val v = gifPixel(id, scene, x, y)
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
          }
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), null)
        }
        writer.endWriteSequence()
        writer.dispose()
        out.close()
      }
      new java.io.File(d, "_DONE").createNewFile(): Unit
    }

  /** Driver-path REAL image decode: the planted PNGs ingested through
    * the binaryFile source, decoded DISTRIBUTED by the javax.imageio
    * seam ([[decodeImagePixels]] — 8×8 integer box-mean grayscale
    * inside mapPartitions), then the SAME pHash transform plumbing as
    * the stub path. The oracle regenerates every planted channel
    * value from its md5 content key, replays the box means in SQL,
    * and runs the identical DCT chain — end-to-end proof that the
    * real-codec path and the relational transform agree on real
    * bytes. */
  def imagePHashReal(spark: SparkSession, dir: String): DataFrame = {
    val media = stagedRealMedia(spark, dir)
    // pathGlobFilter, never a glob in the load PATH: a globbed path
    // logs a recovered FileNotFoundException under Spark 4.1's
    // hybrid analyzer (single-path loads) — the dir+filter form is
    // silent and equivalent
    val images = spark.read.format("binaryFile")
      .option("pathGlobFilter", "doc_*.png").load(media)
      .select(expr("CAST(regexp_extract(path, 'doc_(\\\\d+)\\\\.png$', 1) AS BIGINT)")
        .as("doc_id"), col("content"))
    imagePHashFromPixels(decodeImagePixels(images))
  }

  /** Driver-path REAL audio decode: planted 16-bit PCM WAVs through
    * binaryFile → the javax.sound seam ([[decodeAudioEnergies]] —
    * 25 ms/10 ms frame grid, integer mean-|amplitude| energies) →
    * the shared VAD island plumbing. Oracle regenerates the samples
    * (incl. each doc's planted silent span) and replays frame
    * energies + island detection in SQL. */
  def silenceReal(spark: SparkSession, dir: String): DataFrame = {
    val media = stagedRealMedia(spark, dir)
    // doc_*.wav only: the fp_* shifted twins belong to the
    // fingerprint row's corpus, not the silence audit's
    val audio = spark.read.format("binaryFile")
      .option("pathGlobFilter", "doc_*.wav").load(media)
      .select(expr("CAST(regexp_extract(path, 'doc_(\\\\d+)\\\\.wav$', 1) AS BIGINT)")
        .as("doc_id"), col("content"))
    silenceFromFrames(decodeAudioEnergies(audio), threshold = 150L)
  }

  /** Audio FINGERPRINT matching (the Shazam constellation scheme) —
    * the near-dup detector for audio the way pHash is for images:
    * local energy PEAKS anchor hashes of (peak energy, next-peak
    * energy, frame delta), and two recordings match when they share
    * hashes — the Δ-anchoring makes the fingerprint TIME-SHIFT
    * INVARIANT, the property that separates it from raw energy-
    * vector comparison. Driven end-to-end on REAL codec bytes: the
    * corpus is the planted WAVs plus shifted twins (fp_10d.wav =
    * doc d delayed 2 frame hops — same audio, every frame energy
    * displaced, so only the constellation matches the pair), decoded
    * through the javax.sound seam. Scale shape: peaks are a bounded
    * per-doc window pass; the target-zone pairing is a band
    * self-join with Δ ≤ 8 fan-out; matching is one hash-keyed join
    * over the fingerprint relation — never a doc×doc compare — with
    * ubiquitous hashes df-capped out first ([[FpDfCap]]) so no hot
    * fingerprint can make a join group quadratic. All integer
    * arithmetic; the oracle regenerates samples (incl. the shift)
    * and replays peaks → hashes → df-cap → match counts in SQL. */
  def audioFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val media = stagedRealMedia(spark, dir)
    val audio = spark.read.format("binaryFile")
      .option("pathGlobFilter", "{doc,fp}_*.wav").load(media)
      .select(expr("CAST(regexp_extract(path, '(?:doc|fp)_(\\\\d+)\\\\.wav$', 1) AS BIGINT)")
        .as("doc_id"), col("content"))
    audioFingerprintOn(decodeAudioEnergies(audio))
  }

  /** doc-frequency cap on the fingerprint hash postings, the
    * shinglePostings dfCap discipline: the match self-join keys on
    * fhash, so a UBIQUITOUS fingerprint (silence-adjacent plateau
    * patterns, a jingle re-used across 10⁹ assets) is a hot key with
    * (docs sharing it)² pair fan-out — the one unbounded channel in
    * the pipeline. Match evidence lives in the RARE constellation
    * hashes (a hash in >64 docs identifies nothing), so dropping hot
    * hashes BEFORE the join is recall-neutral under a generous cap
    * (MultimodalSpec proves result equality vs uncapped on a planted
    * corpus) while bounding every join group at dfCap postings. The
    * per-doc denominator n_prints counts KEPT hashes, so overlap is
    * measured consistently on the kept hash sets. */
  private[graft] val FpDfCap: Int = 64

  /** generic core over any (doc_id, frame_idx, energy) frame grid. */
  private[graft] def audioFingerprintOn(frames: DataFrame,
      dfCap: Int = FpDfCap): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    val peaks = frames
      .withColumn("prev", lag("energy", 1).over(w))
      .withColumn("next", lead("energy", 1).over(w))
      .filter(col("energy") >= 200 &&
        col("energy") > coalesce(col("prev"), lit(-1L)) &&
        col("energy") > coalesce(col("next"), lit(-1L)))
      .select(col("doc_id"), col("frame_idx"), col("energy"))
      .localCheckpoint() // both sides of the target-zone pairing
    // target-zone pairing as a BANDED join, never doc-keyed with the
    // Δ-range as a post-filter: a doc-keyed self-join is per-doc
    // peaks² intermediate (quadratic in recording length — the skew
    // channel a 3-hour asset would blow open); bucketing frame_idx
    // by the zone width bounds each join group at one bucket's peaks
    // (strict peaks are ≥2 frames apart → ≤4/bucket), so the pairing
    // is LINEAR in frames at any asset length — the ev_range_join
    // bucket-explode discipline
    val anchor = peaks.withColumn("bkt", explode(array(
      expr("frame_idx DIV 8"), expr("frame_idx DIV 8 + 1L"))))
    val target = peaks
      .select(col("doc_id"), expr("frame_idx DIV 8").as("bkt"),
        col("frame_idx").as("t_idx"), col("energy").as("t_energy"))
    val raw = anchor.join(target.hint("shuffle_hash"), Seq("doc_id", "bkt"))
      .filter((col("t_idx") - col("frame_idx")).between(1, 8))
      .select(col("doc_id"),
        ((col("energy") * 4096 + col("t_energy")) * 16 +
          (col("t_idx") - col("frame_idx"))).as("fhash"))
      .distinct()
      .localCheckpoint() // df agg + the capped postings join
    // df-cap ([[FpDfCap]]): drop ubiquitous hashes BEFORE the match
    // self-join — the df is a map-side-combined hash agg, so a hash
    // in 10⁹ docs collapses to partial counts, never one task's
    // buffer; the surviving join groups are ≤ dfCap postings each
    val prints = raw.join(
        raw.groupBy("fhash").agg(count(lit(1)).as("df"))
          .filter(col("df") <= dfCap).select("fhash"),
        Seq("fhash"), "inner")
      .localCheckpoint() // counts + both sides of the match join
    val counts = prints.groupBy("doc_id").agg(count(lit(1)).as("n_prints"))
    prints.as("x").join(prints.as("y").hint("shuffle_hash"),
        col("x.fhash") === col("y.fhash") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 3)
      // UNHINTED join-backs on purpose (round 15; were broadcast()):
      // `counts` is one row per corpus document, so a forced
      // broadcast is a driver-memory bomb at 10⁹ assets — the exact
      // class the round-12 audit removed repo-wide. AQE broadcasts
      // from the MEASURED size at bench SFs and degrades to a
      // shuffle join at scale (cf. graphInsert's unhinted
      // arrival-scaled audit join, Similarity.scala);
      // MultimodalSpec pins that no hint forces the exchange.
      .join(counts.select(col("doc_id").as("doc_a"),
        col("n_prints").as("n_a")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"),
        col("n_prints").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("n_a"),
        col("n_b"),
        expr("1000000 * n_shared DIV least(n_a, n_b)").as("overlap_ppm"))
      .orderBy("doc_a", "doc_b")
  }

  /** REAL multi-frame decoder for the frame-family seam: animated
    * GIF bytes → per-frame 8×8 integer gray sums, decoding ONLY the
    * strided frame indexes (`reader.read(i)` is index-addressable —
    * sampling happens before decode, the 100 TB-correct order the
    * stub documents). mapPartitions so a deployed codec amortizes
    * init across the batch; unreadable/corrupt payloads drop out
    * (any IOException from the codec drops the DOC, not the task).
    * The seam contract is COMPLETE frames — a per-index read of a
    * delta-encoded GIF (disposal compositing against prior frames)
    * would silently sum a partial frame, so the decoder FAILS FAST
    * on any frame whose disposal method composites (`restore*`):
    * contract violations error loudly instead of corrupting sums.
    * Per-doc decode is eager (a doc's sampled sums are a handful of
    * longs) so the reader and stream dispose deterministically. */
  def decodeGifFrames(videos: DataFrame, stride: Int): DataFrame = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos.select(col("doc_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (id, bytes) =>
          val in = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(in)
            if (!readers.hasNext) Seq.empty
            else {
              val r = readers.next()
              try {
                r.setInput(in)
                val n = r.getNumImages(true)
                val (sw, sh) = gifLogicalScreen(r)
                (0 until n by stride).map { i =>
                  requireCompleteGifFrame(r, i, id, sw, sh)
                  val img = r.read(i)
                  var sum = 0L
                  var y = 0
                  while (y < img.getHeight) {
                    var x = 0
                    while (x < img.getWidth) {
                      sum += (img.getRGB(x, y) >> 16) & 0xff // gray: r=g=b
                      x += 1
                    }
                    y += 1
                  }
                  (id, n.toLong, i.toLong, sum)
                }
              } catch {
                // truncated/corrupt payload: this doc drops out; the
                // contract require above is an IllegalArgumentException
                // and PROPAGATES (a delta GIF must fail the job, not
                // silently vanish)
                case _: java.io.IOException => Seq.empty
              } finally r.dispose()
            }
          } finally if (in != null) in.close()
        }
      }.toDF("doc_id", "n_frames", "frame_idx", "fsum")
  }

  /** the GIF's LogicalScreenDescriptor dimensions — the canvas every
    * complete frame must fully cover. Falls back to frame 0's
    * dimensions when the stream metadata is absent (a reader that
    * cannot surface it), which is the same contract: frame 0 always
    * paints the whole canvas. */
  private def gifLogicalScreen(r: javax.imageio.ImageReader): (Int, Int) = {
    val sm = r.getStreamMetadata
    val lsd = if (sm == null) null else
      sm.getAsTree("javax_imageio_gif_stream_1.0")
        .asInstanceOf[org.w3c.dom.Element]
        .getElementsByTagName("LogicalScreenDescriptor")
    if (lsd == null || lsd.getLength == 0) (r.getWidth(0), r.getHeight(0))
    else {
      val e = lsd.item(0).asInstanceOf[org.w3c.dom.Element]
      (e.getAttribute("logicalScreenWidth").toInt,
        e.getAttribute("logicalScreenHeight").toInt)
    }
  }

  /** fail-fast seam contract for [[decodeGifFrames]]: frame i must be
    * complete (a full-canvas redraw that never composites against
    * prior frames). GIF delta encoding shows up two ways, BOTH
    * guarded: the per-frame GraphicControlExtension's
    * disposalMethod=restore* (compositing disposal — "none" and
    * "doNotDispose" on a full redraw are the complete-frame modes
    * the planted writer emits), and — the far more common form — a
    * SUB-RECTANGLE ImageDescriptor (offset into the canvas, or
    * smaller than it) under a non-restore disposal, whose pixels
    * outside the rect come from the PRIOR frame; r.read(i) on such a
    * frame returns only the sub-rect and a gray sum over it would be
    * silently partial. */
  private def requireCompleteGifFrame(r: javax.imageio.ImageReader,
      i: Int, docId: Long, screenW: Int, screenH: Int): Unit = {
    val md = r.getImageMetadata(i)
    val tree = md.getAsTree("javax_imageio_gif_image_1.0")
      .asInstanceOf[org.w3c.dom.Element]
    val gce = tree.getElementsByTagName("GraphicControlExtension")
    var j = 0
    while (j < gce.getLength) {
      val disposal = gce.item(j).asInstanceOf[org.w3c.dom.Element]
        .getAttribute("disposalMethod")
      require(disposal == "none" || disposal == "doNotDispose",
        s"doc $docId frame $i is delta-encoded (disposalMethod=$disposal): " +
          "decodeGifFrames reads frames WITHOUT disposal compositing; " +
          "composite upstream or decode sequentially")
      j += 1
    }
    val desc = tree.getElementsByTagName("ImageDescriptor")
    var k = 0
    while (k < desc.getLength) {
      val e = desc.item(k).asInstanceOf[org.w3c.dom.Element]
      def at(n: String): Int = e.getAttribute(n).toInt
      val (l, t, w, h) = (at("imageLeftPosition"), at("imageTopPosition"),
        at("imageWidth"), at("imageHeight"))
      require(l == 0 && t == 0 && w == screenW && h == screenH,
        s"doc $docId frame $i is a sub-rectangle delta " +
          s"(${w}x$h at ($l,$t) on a ${screenW}x$screenH canvas): " +
          "decodeGifFrames reads frames WITHOUT compositing the pixels " +
          "outside the rect; composite upstream or decode sequentially")
      k += 1
    }
  }

  /** Driver-path REAL frame sampling: the planted animated GIFs
    * through binaryFile → [[decodeGifFrames]] at stride 4 (only the
    * sampled indexes decode) → per-frame integer gray sums. The
    * oracle regenerates every sampled frame's pixels from the md5
    * content keys and sums them in SQL — the mm_frame_sample shape
    * on real codec bytes. */
  def frameSampleReal(spark: SparkSession, dir: String): DataFrame =
    decodeGifFrames(realGifBytes(spark, dir), stride = 4)
      .orderBy("doc_id", "frame_idx")

  /** Driver-path REAL scene segmentation: every frame decodes
    * (stride 1), a CUT lands where consecutive frame sums differ,
    * and the island trick rolls cuts into scenes — run against the
    * planted scene boundaries (each GIF is scenes of
    * [[gifSceneLen]] identical frames). Same per-asset window
    * plumbing as the stub row; the oracle replays the frame sums and
    * the lag/island logic in SQL. */
  def sceneCutsReal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    decodeGifFrames(realGifBytes(spark, dir), stride = 1)
      .withColumn("prev", lag("fsum", 1).over(w))
      .withColumn("is_cut",
        when(col("prev").isNull || col("prev") =!= col("fsum"), 1L).otherwise(0L))
      .withColumn("scene_id", sum("is_cut")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "scene_id")
      .agg(count(lit(1)).as("scene_frames"))
      .groupBy("doc_id")
      .agg(sum("scene_frames").as("n_decoded"),
        count(lit(1)).as("n_scenes"),
        max("scene_frames").as("longest_scene"))
      .orderBy("doc_id")
  }

  private def realGifBytes(spark: SparkSession, dir: String): DataFrame = {
    val media = stagedRealMedia(spark, dir)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "doc_*.gif").load(media)
      .select(expr("CAST(regexp_extract(path, 'doc_(\\\\d+)\\\\.gif$', 1) AS BIGINT)")
        .as("doc_id"), col("content"))
  }

  /** The transform plumbing DOWNSTREAM of the decode seam, shared by
    * the stub and the real decoder: (doc_id, x, y, p) 8×8 grayscale
    * pixels → separable integer DCT-II → 63-AC-coefficient median
    * threshold signature → 4×16-bit pigeonhole banding → exact
    * hamming verify on candidates only. */
  def imagePHashFromPixels(pix: DataFrame): DataFrame = {
    val spark = pix.sparkSession
    import spark.implicits._
    val basis = broadcast(dctTable.toDF("u", "x", "c"))
    val g = pix.join(basis, "x")
      .groupBy(col("doc_id"), col("u"), col("y"))
      .agg(sum(col("p") * col("c")).as("g"))
    val f = g.join(basis.select(col("u").as("v"), col("x").as("y"), col("c").as("cy")), "y")
      .groupBy(col("doc_id"), col("u"), col("v"))
      .agg(sum(col("g") * col("cy")).as("f"))
      .filter(!(col("u") === 0 && col("v") === 0))
    val tot = f.groupBy("doc_id").agg(sum("f").as("tot"))
    val sigs = f.join(tot, "doc_id")
      .select(col("doc_id"),
        when(col("f") * 63 > col("tot"),
          expr("shiftleft(1L, CAST(u*8 + v - 1 AS INT))"))
          .otherwise(lit(0L)).as("bit"))
      .groupBy("doc_id").agg(sum("bit").as("phash"))
      // both sides of the pigeonhole self-join consume the signature
      // relation: pin it once so the DCT chain runs once, not twice
      .localCheckpoint()

    val exploded = sigs
      .withColumn("blocks", expr(
        "transform(sequence(0, 3), b -> struct(b AS blk, shiftright(phash, b*16) & 65535 AS key))"))
      .select(col("doc_id"), col("phash"), explode(col("blocks")).as("bk"))
      .select(col("doc_id"), col("phash"), col("bk.blk"), col("bk.key"))
    exploded.as("a").join(exploded.as("b").hint("shuffle_hash"),
        col("a.blk") === col("b.blk") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("CAST(bit_count(a.phash ^ b.phash) AS BIGINT)").as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

  /** CLIP-score image–text pair filtering — the LAION-style curation
    * gate that decides which (image, caption) pairs enter a
    * multimodal training set: encode both sides, keep pairs whose
    * embedding cosine clears a threshold, and CALIBRATE that
    * threshold against deliberately mismatched pairs (each image
    * scored against its arithmetic partner's caption — the standard
    * negative-control the threshold is tuned on). Both encoders are
    * documented STUBS (no vision/text models ship here): 8-dim
    * md5-derived embeddings whose first 4 dims come from a SHARED
    * content head — so true pairs align by construction (≈ 0.5
    * cosine mass) and mismatched pairs don't, giving the threshold
    * real separation to demonstrate. A deployment swaps the two
    * encoder expressions for model calls; the pairing, scoring,
    * thresholding, and per-source accounting are the real operator.
    *
    * Scale shape: encoders are pure projections (one corpus pass);
    * the negative control pairs doc d with partner d XOR 1 via
    * arithmetic (d + 1 − 2·(d mod 2)) — a plain hash self-join, no
    * global-order window; per-source rollup is one map-side-combined
    * agg. Engine-exact: embedding dims live on a 1/1000 grid, the
    * cosine rides the shared left-fold kernel, and scores quantize
    * to floor(cos·1e9) BIGINTs. */
  def clipFilter(spark: SparkSession, dir: String): DataFrame = {
    def dims(h: String, lo: Int) = (0 until 4).map(i => expr(
      s"CAST(CAST(conv(substring($h, ${4 * (lo + i) + 1}, 4), 16, 10) AS BIGINT)" +
        s" % 2001 - 1000 AS DOUBLE) / CAST(1000 AS DOUBLE)"))
    val enc = documents(spark, dir)
      .withColumn("shared_md5", md5(expr("substring(text, 1, 32)")))
      .withColumn("img_md5", md5(col("text").cast("binary")))
      .withColumn("txt_md5", md5(expr("concat('cap:', substring(text, 1, 48))")))
      .select(col("doc_id"), col("source"),
        array(dims("shared_md5", 0) ++ dims("img_md5", 0): _*).as("img_emb"),
        array(dims("shared_md5", 0) ++ dims("txt_md5", 0): _*).as("txt_emb"))
      // consumed by the true-pair score AND both sides of the
      // mismatch join: stage the encoded relation once
      .localCheckpoint()
    val scored = enc.withColumn("clip_q",
      floor(Vectors.cosine(col("img_emb"), col("txt_emb")) * lit(1e9))
        .cast("bigint"))
    val mis = enc.select(col("doc_id"), col("source"), col("img_emb"),
        (col("doc_id") + 1 - lit(2) * pmod(col("doc_id"), lit(2)))
          .as("partner_id"))
      .join(enc.select(col("doc_id").as("partner_id"),
        col("txt_emb").as("mis_txt")), Seq("partner_id"))
      .withColumn("mis_q",
        floor(Vectors.cosine(col("img_emb"), col("mis_txt")) * lit(1e9))
          .cast("bigint"))
    val thr = 200000000L // 0.2 cosine
    val t = scored.groupBy("source").agg(
      count(lit(1)).as("n_pairs"),
      sum(when(col("clip_q") >= thr, 1L).otherwise(0L)).as("n_keep"),
      sum("clip_q").as("sum_clip_q"))
    val m = mis.groupBy("source").agg(
      count(lit(1)).as("n_mismatch"),
      sum(when(col("mis_q") >= thr, 1L).otherwise(0L)).as("n_mismatch_keep"),
      sum("mis_q").as("sum_mis_q"))
    t.join(m, Seq("source")).orderBy("source")
  }
}
