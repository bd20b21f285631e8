package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Deduplication operators over the `documents` table — the
  * LLM-training-pipeline side of the engine.
  *
  * Every hot path is built from codegen'd built-ins — no Scala UDF
  * and, deliberately, no array-lambda (higher-order) expressions on
  * the per-shingle path: Spark evaluates array lambdas interpreted,
  * row-at-a-time, which profiled >100× slower than the equivalent
  * explode → project → hash-aggregate pipeline used here (which also
  * gets map-side partial aggregation for free). This mirrors how the
  * reference keeps its predicate kernels inside the scan loop
  * (/root/reference/simple-predicates.h:37-120): the work rides the
  * tight generated loop, never a per-row interpreter.
  *
  * Cross-engine determinism: every hash derives from md5 (identical
  * in Spark and DuckDB), reduced to a 60-bit integer via the first
  * 15 hex chars. The DuckDB oracles in SparkEntry replay the same
  * arithmetic, so results hash-match exactly — including the
  * *approximate* operators (LSH banding), whose candidate sets are
  * deterministic given the hash.
  *
  * Scale design (100 TB):
  * - exact: one hash-shuffle on digest — linear.
  * - minhash-LSH: signatures reduce map-side (128 mins in one hash
  *   agg); candidates form only inside (band, key) buckets; verify
  *   touches only candidate docs' postings.
  * - simhash: same banded shape via 15-bit blocks (a pair with
  *   hamming ≤ 3 on 60 bits shares ≥ 1 of 4 blocks — pigeonhole).
  * - ngram-jaccard: posting-list equi-join on shingle hash, with a
  *   doc-frequency cap knob (dfCap on shinglePostings/ngramJaccard/
  *   minhashLsh): drop shingles in > N docs — recall-neutral for
  *   near-dup thresholds (spec-proven) and the bound on the worst
  *   posting list's N² pair mass at 100 TB.
  * - embedding: random-hyperplane LSH — never a cross join.
  */
object Dedup {

  private val normTextExpr = "trim(regexp_replace(lower(text), '\\\\s+', ' '))"

  /** md5-derived 60-bit hash of string expression s (cross-engine stable). */
  private def h60(s: String): String = Hash60.sql(s)

  /** Distinct (doc_id, h, n_sh) postings, one row per distinct
    * word-trigram shingle: words are exploded, trigrams assembled
    * with lead() windows, hashed in a codegen'd projection,
    * de-duplicated by a hash agg. The per-doc shingle count (jaccard
    * denominator) rides along via a window count — the doc_id hash
    * partitioning from the lead() window is reused, so neither the
    * distinct nor the count adds a shuffle. */
  private[graft] def shinglePostings(spark: SparkSession, dir: String,
      dfCap: Option[Int] = None): DataFrame = dfCap match {
    // the canonical (uncapped) posting relation feeds seven
    // operators (simhash, jaccard, containment, novelty, signatures,
    // calibration, fuzzy verify) — stage it once per (app, sf dir)
    // instead of re-exploding the corpus per consumer; capped forms
    // are knob experiments and compute directly
    case None => graft.sources.Staging.staged(spark, dir, "shingle_postings")(
      shinglePostingsOf(documents(spark, dir), None))
    case some => shinglePostingsOf(documents(spark, dir), some)
  }

  /** Generic core over ANY corpus relation with (doc_id, text) —
    * the library entry point; the (spark, dir) forms are the
    * test-table bindings of these cores. */
  private[graft] def shinglePostingsOf(docs: DataFrame,
      dfCap: Option[Int] = None): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val post = docs
      .select(col("doc_id"), posexplode(split(expr(normTextExpr), " ")).as(Seq("pos", "w")))
      .withColumn("w1", lead("w", 1).over(byDoc))
      .withColumn("w2", lead("w", 2).over(byDoc))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), expr(h60("concat_ws(' ', w, w1, w2)")).as("h"))
      .distinct()
    // df-cap: drop shingles appearing in more than dfCap docs BEFORE
    // any pairing. Boilerplate/stopword shingles are what generate
    // the quadratic candidate mass in a posting join (a shingle in N
    // docs yields N² candidate pairs); near-dup recall lives in the
    // rarer shingles, so a generous cap is recall-neutral (DedupSpec
    // proves pair-set equality at test scale) while bounding the
    // worst posting list at 100 TB. The df is a groupBy(h) hash agg
    // joined back on h — map-side combined and AQE-splittable, so a
    // boilerplate shingle repeated 10⁹× collapses to partial counts
    // instead of buffering one task's window (a count() window over
    // h would put every occurrence of a hot shingle in one task).
    // The doc's jaccard denominator n_sh counts KEPT shingles, so
    // capped runs compare documents by their kept shingle sets
    // consistently.
    val capped = dfCap match {
      case Some(cap) =>
        post.join(
          post.groupBy("h").agg(count(lit(1)).as("df"))
            .filter(col("df") <= cap).select("h"),
          Seq("h"), "inner")
      case None => post
    }
    capped.withColumn("n_sh", count(lit(1)).over(Window.partitionBy("doc_id")))
  }

  /** exact |A∩B| posting-join pair counts with the denominators in
    * the group keys. shuffle_hash on purpose: both join sides then
    * end in identical exchanges, so ReuseExchange computes the
    * posting pipeline once — and a broadcast of the full posting set
    * would be impossible at 100 TB anyway. */
  private def pairIntersections(post: DataFrame): DataFrame =
    post.as("a").join(post.as("b").hint("shuffle_hash"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("inter"))

  /** Exact dedup: md5 of normalized text, group sizes, canonical id.
    * One shuffle on the digest; at 100 TB this is the cheapest and
    * first pass of any dedup pipeline. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    exactOn(documents(spark, dir))

  /** generic core: exact dedup over any (doc_id, text) relation.
    * The per-digest group size / canonical id is a groupBy(digest)
    * hash agg joined back on the digest — NOT a window over the
    * digest: a window puts every row of a hot key (the empty page,
    * the parked-domain boilerplate — 10⁸-10⁹ copies at 100 TB) into
    * ONE task's buffer with no partial aggregation and no AQE skew
    * split, while the groupBy form combines map-side and the
    * join-back is an ordinary AQE-splittable shuffle join. */
  def exactOn(docs: DataFrame): DataFrame = {
    val hashed = docs.withColumn("digest", expr(s"md5($normTextExpr)"))
    val groups = hashed.groupBy("digest")
      .agg(count(lit(1)).as("group_size"), min("doc_id").as("canonical_id"))
    hashed
      .join(groups, Seq("digest"), "inner")
      .withColumn("is_canonical", col("doc_id") === col("canonical_id"))
      .select("doc_id", "digest", "group_size", "canonical_id", "is_canonical")
      .orderBy("doc_id")
  }

  /** MinHash(128) + 16-band LSH candidate pairs, verified with exact
    * shingle-set Jaccard (posting-join over candidate docs only).
    * Signature: per-perm universal hashing (a_i·h + b_i mod p) over
    * the doc's shingle hashes, computed by the one-pass native
    * [[graft.functions.MinHashSig]] aggregate — all 128 lanes update
    * in a single primitive-array loop per shingle (128 separate `min`
    * aggregate expressions per row blow past JIT-friendly generated-
    * method sizes; the dev probe verified the two formulations emit
    * bit-identical signatures). Bands of 8 lanes are md5-keyed. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashLsh(spark, dir, None)

  /** dfCap: the 100 TB shingle doc-frequency cap (see
    * [[shinglePostings]]) — None reproduces the oracle-checked
    * output exactly; DedupSpec proves a generous cap leaves the
    * near-dup pair set unchanged while a tight cap prunes postings. */
  /** per-doc 128-lane MinHash signatures over staged postings. */
  private[graft] def minhashSigs(post: DataFrame): DataFrame =
    post.groupBy("doc_id").agg(expr("graft_minhash_sig(h)").as("sig"))

  /** 16-band LSH candidate pairs from the signatures. Band keys from
    * element_at projections (md5 over concat_ws) — NOT an array
    * lambda: higher-order transforms are interpreted and the nested
    * one (16 bands × 8 casts) profiled ~1.3 s of the query on its
    * own. concat_ws(',', casts) produces byte-identical strings to
    * the oracle's array_to_string, and stays in codegen. */
  private[graft] def lshCandidates(sigs: DataFrame): DataFrame = {
    val keys = (0 until 16).map { b =>
      md5(concat_ws(",", (0 until 8).map(i =>
        element_at(col("sig"), b * 8 + i + 1).cast("string")): _*)).as(s"k$b")
    }
    val exploded = sigs.select(col("doc_id") +: keys: _*)
      .select(col("doc_id"), explode(array((0 until 16).map(b =>
        struct(lit(b).as("band"), col(s"k$b").as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    exploded.as("a").join(exploded.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
  }

  def minhashLsh(spark: SparkSession, dir: String, dfCap: Option[Int]): DataFrame =
    dfCap match {
      // uncapped: consume the staged posting relation (already
      // materialized — no checkpoint needed)
      case None => minhashLshFromPost(shinglePostings(spark, dir))
      case some => minhashLshOn(documents(spark, dir), some)
    }

  /** generic core: MinHash+LSH near-dup pairs over any (doc_id, text)
    * relation — the library entry point a user calls on their own
    * corpus (requires graft_minhash_sig registered on the session,
    * which Tables.table does per session; call
    * GraftFunctions.register(spark) when bypassing Tables). */
  def minhashLshOn(docs: DataFrame, dfCap: Option[Int] = None): DataFrame =
    // Stage postings once: the signature branch and the jaccard-verify
    // branch both consume them, but the candidate filter on the verify
    // side breaks exchange-subtree identity, so ReuseExchange cannot
    // collapse the two shingle pipelines. An eager localCheckpoint
    // materializes the (small relative to the corpus) posting list a
    // single time and truncates lineage — the 100 TB shape is the
    // same: stage postings to a temp table, then fan out.
    minhashLshFromPost(shinglePostingsOf(docs, dfCap).localCheckpoint())

  private def minhashLshFromPost(post: DataFrame): DataFrame = {
    val cand = lshCandidates(minhashSigs(post))
    // verify with exact jaccard — postings filtered to candidate docs
    // first, so at scale the verify join is proportional to the
    // candidate set, not the corpus. Inner join: a band collision
    // between docs sharing zero shingles is a hash fluke, not a
    // near-dup candidate — it drops out here.
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id")))
    // left_semi: filters without duplicating (no distinct stage needed
    // on the candidate list) — postings come from the checkpoint, so
    // this branch never re-shingles the corpus. candDocs GROWS with
    // the corpus's near-dup density, so no forced broadcast: AQE
    // broadcasts it when it measures small, shuffles when it doesn't.
    val cpost = post.join(candDocs, Seq("doc_id"), "left_semi")
    cand
      .join(pairIntersections(cpost), Seq("doc_a", "doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(inter AS DOUBLE) / (na + nb - inter)").as("jaccard"))
      .withColumn("is_dup", col("jaccard") >= 0.8)
      .orderBy("doc_a", "doc_b")
  }

  /** Incremental-ingest dedup — the delta form every recurring crawl
    * runs: only documents whose content digest is NOT in the previous
    * release ship in the new batch. The previous release is a
    * deterministic snapshot (doc_id % 4 != 3); the synthetic corpus
    * has no repeated texts, so the incoming batch additionally
    * carries RE-CRAWLS (old docs under new ids — exactly what a
    * recurring crawl produces) which the anti-join must drop. In
    * production the previous side is the prior manifest's digest
    * table. One left_anti join on the digest — the same
    * single-shuffle shape as exact dedup, and the anti side only
    * carries digests, never text. */
  def incremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir)
    val recrawl = docs.filter(col("doc_id") % 8 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val incoming = docs.filter(col("doc_id") % 4 === 3).select("doc_id", "text")
      .unionAll(recrawl)
      .withColumn("digest", expr(s"md5($normTextExpr)"))
      .select("doc_id", "digest")
    val prev = docs.filter(col("doc_id") % 4 =!= 3)
      .select(expr(s"md5($normTextExpr)").as("digest")).distinct()
    incoming.join(prev, Seq("digest"), "left_anti")
      .select("doc_id", "digest")
      .orderBy("doc_id")
  }

  /** 60-bit SimHash over shingle hashes + 4×15-bit block LSH; pairs
    * verified with hamming ≤ 3 (bit_count of xor). Per-bit majority
    * votes are plain sums in a codegen'd hash agg: bit_j is set iff
    * 2·(count of shingles with bit j) ≥ (shingle count).
    *
    * Profiled at sf0.1 (noop-sink, steady state): ~2.2 s total, of
    * which the shingle pipeline is ~1.5 s — the 60 sum columns ride
    * one map-side-combined hash agg and are NOT the cost center, so
    * a packed-lane popcount reformulation (which would cap shingle
    * counts per doc to the lane width) is not worth the correctness
    * risk. Linear in corpus size; one aggregation shuffle. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val bitCols = (0 until 60).map(j =>
      sum(expr(s"shiftright(h, $j) & 1")).as(s"c$j"))
    val aggd = shinglePostings(spark, dir).groupBy("doc_id")
      .agg(count(lit(1)).as("n"), bitCols: _*)
    val sim = (0 until 60)
      .map(j => when(col(s"c$j") * 2 >= col("n"), lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val sigs = aggd.select(col("doc_id"), sim.as("sim"))
    val exploded = sigs
      .withColumn("blocks", expr(
        "transform(sequence(0, 3), b -> struct(b AS blk, shiftright(sim, b*15) & 32767 AS key))"))
      .select(col("doc_id"), col("sim"), explode(col("blocks")).as("bk"))
      .select(col("doc_id"), col("sim"), col("bk.blk"), col("bk.key"))
    exploded.as("a").join(exploded.as("b").hint("shuffle_hash"),
        col("a.blk") === col("b.blk") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("CAST(bit_count(a.sim ^ b.sim) AS BIGINT)").as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

  /** Exact 3-gram Jaccard ≥ 0.8 pairs via a posting-list equi-join on
    * the shingle hash (pairs only form for docs sharing a shingle).
    * Staged once per (app, sf): the pair graph feeds this query, the
    * connected components, and keep-best — one posting join, not
    * three. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    stagedJaccard(spark, dir).orderBy("doc_a", "doc_b")

  private def stagedJaccard(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Staging.staged(spark, dir, "ngram_jaccard_pairs")(ngramJaccard(spark, dir, None))

  /** The staged exact-Jaccard pair graph, exposed for graph-analytic
    * consumers ([[Graph.dedupTriangles]]) so they ride the same
    * one-per-(app, sf) posting join as jaccard/components/keep-best. */
  private[operators] def jaccardPairs(spark: SparkSession, dir: String): DataFrame =
    stagedJaccard(spark, dir)

  /** dfCap as in [[shinglePostings]]: bounds the worst posting list
    * (the N² pair mass of boilerplate shingles) at 100 TB; None is
    * the oracle-exact form. */
  def ngramJaccard(spark: SparkSession, dir: String, dfCap: Option[Int]): DataFrame =
    pairIntersections(shinglePostings(spark, dir, dfCap))
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(inter AS DOUBLE) / (na + nb - inter)").as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy("doc_a", "doc_b")

  /** PREFIX-FILTERING exact near-dup join (AllPairs/PPJoin, Bayardo
    * et al. 2007 / Xiao et al. 2008) — the other industrial-strength
    * candidate generator, with the property MinHash-LSH gives up:
    * NO FALSE NEGATIVES. Order every doc's shingles by global
    * rarity (df asc, hash tie-break — one global order in both
    * engines); two sets with Jaccard ≥ τ MUST share a token inside
    * their first n − ⌈τ·n⌉ + 1 rarest tokens (the prefix-filter
    * theorem), so joining on PREFIX tokens only finds every
    * qualifying pair while skipping the boilerplate-token pair mass
    * (rare-first ordering puts the high-fanout tokens outside the
    * prefix). For τ = 0.8 the prefix is n div 5 + 1 — pure integer.
    * Verification replays exact Jaccard on the candidates' full
    * postings. The OUTPUT CONTRACT is the point: identical pair set
    * to [[ngramJaccard]]'s full posting-join enumeration (same
    * oracle SQL; DedupSpec asserts set equality), at a candidate
    * mass bounded by prefix collisions instead of all shingle
    * collisions.
    *
    * Scale: df is a map-side-combined hash agg joined back; the
    * prefix rank windows per doc (bounded by doc length); the
    * candidate join touches prefix postings only; verify touches
    * candidate docs only — the LSH discipline with an exactness
    * guarantee. */
  def prefixFilter(spark: SparkSession, dir: String): DataFrame = {
    val post = shinglePostings(spark, dir) // staged (doc_id, h, n_sh)
    val dfreq = post.groupBy("h").agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy("doc_id").orderBy(asc("df"), asc("h"))
    val pref = post.join(dfreq, Seq("h"))
      .withColumn("rk", row_number().over(byDoc))
      .filter(col("rk") <= expr("n_sh div 5 + 1"))
      .select("doc_id", "h")
    val cand = pref.as("a").join(pref.as("b").hint("shuffle_hash"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id")))
    val cpost = post.join(candDocs, Seq("doc_id"), "left_semi") // corpus-scaled: unhinted
    cand.join(pairIntersections(cpost), Seq("doc_a", "doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(inter AS DOUBLE) / (na + nb - inter)").as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy("doc_a", "doc_b")
  }

  /** Containment near-dup pairs: C(A,B) = |A∩B| / min(|A|, |B|).
    *
    * Jaccard misses the asymmetric duplicate a crawl actually
    * produces — a short doc pasted inside a much longer one (quote
    * inclusions, boilerplate wrappers, article + comment thread):
    * |A∩B|/|A∪B| stays small when |B| ≫ |A| even though A is wholly
    * contained. Containment against the SMALLER set flags exactly
    * that pair. Same posting-join scale shape as [[ngramJaccard]]
    * (candidates only where a shingle collides, dfCap bounds the
    * worst posting list at 100 TB); the score is one int/int
    * division, so oracle parity is exact. */
  def containment(spark: SparkSession, dir: String): DataFrame =
    containment(spark, dir, None)

  def containment(spark: SparkSession, dir: String, dfCap: Option[Int]): DataFrame =
    pairIntersections(shinglePostings(spark, dir, dfCap))
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
        expr("CAST(inter AS DOUBLE) / least(na, nb)").as("containment"))
      .filter(col("containment") >= 0.9)
      .orderBy("doc_a", "doc_b")

  /** Per-doc shingle novelty in doc_id (crawl) order: the fraction
    * of a doc's distinct shingles whose FIRST corpus occurrence is
    * this doc. The continuous-crawl curation signal — a recrawled or
    * templated page scores near 0, genuinely new text near 1 — and
    * the metric behind "% novel tokens per snapshot" dashboards.
    * Shape: the shingle-first-seen resolution is a groupBy(h) hash
    * agg (map-side combined, AQE-splittable — a min() window over h
    * would buffer every occurrence of a boilerplate shingle in one
    * task) joined back on h, then one per-doc hash agg; no pair
    * join at all, so it runs BEFORE pairing decisions at 100 TB.
    * Novelty is one int/int division — oracle parity exact. */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val post = shinglePostings(spark, dir)
    val firstSeen = post.groupBy("h").agg(min("doc_id").as("first_doc"))
    post
      .join(firstSeen, Seq("h"), "inner")
      .groupBy("doc_id")
      .agg(max("n_sh").as("n_sh"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("novel"))
      .withColumn("novelty", expr("CAST(novel AS DOUBLE) / n_sh"))
      .orderBy("doc_id")
  }

  /** Connected components over the near-dup pair graph. Pairs are
    * only half the dedup story: a release keeps ONE document per
    * duplicate GROUP, and groups are the transitive closure of pairs
    * (a~b, b~c ⇒ {a,b,c} even when a and c never collide directly).
    *
    * Iterative min-label propagation: every node adopts the smallest
    * label among itself and its neighbors, repeated to fixpoint.
    * Iterations are bounded by cluster diameter — near-dup clusters
    * are shallow, so a handful of rounds converge — and each round is
    * one distributed join + hash agg over the pair graph (tiny
    * relative to the corpus). The driver loop only reads the
    * convergence counter; rows never leave the executors.
    * localCheckpoint per round keeps the lineage flat (the iterative-
    * algorithm analog of the postings staging above). Output: every
    * clustered doc with its canonical (minimum) doc id and the
    * cluster size. */
  def components(spark: SparkSession, dir: String): DataFrame =
    stagedComponents(spark, dir).orderBy("doc_id")

  /** the closure is staged too: its other consumer (keep-best) must
    * not re-run the propagation fixpoint. */
  private[operators] def stagedComponents(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Staging.staged(spark, dir, "dedup_components") {
      val labels = minLabelComponents(
        stagedJaccard(spark, dir).select("doc_a", "doc_b"), "doc_a", "doc_b")
        .select(col("node").as("doc_id"), col("label").as("component_id"))
      // size via groupBy + join-back: a count window over component_id
      // would buffer a mega-cluster (the 10⁸-copy boilerplate page) in
      // one task; the hash agg combines map-side and AQE can split it
      val sizes = labels.groupBy("component_id")
        .agg(count(lit(1)).as("component_size"))
      labels
        .join(sizes, Seq("component_id"), "inner")
        .select("doc_id", "component_id", "component_size")
    }

  /** Iterative min-label propagation over an undirected pair graph —
    * the distributed transitive closure shared by every clustering
    * consumer here ([[components]], [[semanticClusters]]). Returns
    * (node, label) with label = the component's minimum node id.
    * Per round: one join + one min-agg, eagerly localCheckpointed so
    * the driver reads only a convergence counter; rounds are bounded
    * by cluster diameter with a loud require on cap-out (a capped
    * fixpoint is WRONG labels and must never ship silently). */
  private[operators] def minLabelComponents(pairs: DataFrame, a: String, b: String): DataFrame = {
    val edges = pairs.select(col(a), col(b))
      .union(pairs.select(col(b), col(a)))
      .toDF("src", "dst")
      .localCheckpoint()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    var converged = false
    var iter = 0
    // cap >> any real cluster diameter (convergence exits early; a
    // graph that needs 64 rounds means 64-hop near-dup chains) — the
    // cap exists so a pathological input can't loop forever, and a
    // capped-out result would fail the oracle gate loudly rather
    // than ship silently
    while (!converged && iter < 64) {
      val fromNeighbors = edges.join(labels, col("dst") === col("node"))
        .select(col("src").as("node"), col("label"))
      // carry the previous label through the SAME min-aggregation that
      // produces the new one (every node has exactly one old label, so
      // min(label where is_old) recovers it) — the convergence check
      // then needs no join back against the previous round. The eager
      // localCheckpoint is the round's one distributed job; the change
      // count after it is a filter-count over the already-materialized
      // partitions, not a recompute.
      val next = labels.withColumn("is_old", lit(true))
        .unionByName(fromNeighbors.withColumn("is_old", lit(false)))
        .groupBy("node").agg(min("label").as("label"),
          min(when(col("is_old"), col("label"))).as("old_label"))
        .localCheckpoint()
      val changed = next.filter(col("label") =!= col("old_label")).count()
      labels = next.select("node", "label")
      converged = changed == 0
      iter += 1
    }
    // a capped-out fixpoint is WRONG labels (some nodes still carry a
    // non-minimal label); library callers outside the oracle gate must
    // never receive them silently
    require(converged,
      s"components: min-label propagation did not converge within $iter rounds — " +
        "input pair graph has a pathological (>64-hop) near-dup chain")
    labels
  }

  /** Semantic-dedup clusters (SemDeDup-style): connected components
    * over the EMBEDDING near-dup pair graph ([[embeddingCosine]] —
    * hyperplane-LSH candidates verified at the cosine threshold), so
    * paraphrase groups that share no n-grams still collapse to one
    * cluster. Same [[minLabelComponents]] propagation as the lexical
    * [[components]]; one representative per cluster (min vec_id) and
    * the cluster size via a map-side-combined groupBy + join-back
    * over the dup subgraph only — vectors with no near-dup pair are
    * not clustered, exactly as the lexical form treats pairless
    * docs. */
  def semanticClusters(spark: SparkSession, dir: String): DataFrame = {
    val labels = minLabelComponents(
      stagedEmbeddingCosine(spark, dir).select("vec_a", "vec_b"), "vec_a", "vec_b")
      .select(col("node").as("vec_id"), col("label").as("cluster_id"))
    val sizes = labels.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    labels
      .join(sizes, Seq("cluster_id"), "inner")
      .withColumn("is_representative", col("vec_id") === col("cluster_id"))
      .select("vec_id", "cluster_id", "cluster_size", "is_representative")
      .orderBy("vec_id")
  }

  /** The release-set selection a dedup pipeline actually ships: ONE
    * document per near-dup group, chosen by QUALITY rather than by
    * arbitrary minimum id. Composes components() (transitive closure
    * of near-dup pairs) with the quality score: docs outside any
    * cluster are their own singleton component (component_id =
    * doc_id); within a component the keeper is the highest
    * quality_score, ties broken by smallest doc_id (a total order, so
    * the choice is deterministic and engine-exact — the score
    * arithmetic is the same integer-ratio formula the quality oracle
    * already matches bitwise).
    *
    * Shape: the pair-graph closure runs over the (tiny) duplicate
    * subgraph; the quality pass is one corpus scan; the final pick is
    * a groupBy(component_id) argmax (max_by over the total order
    * (quality_score, -doc_id)) joined back — map-side combined and
    * AQE-splittable where a per-component window would buffer a
    * mega-cluster in one task. */
  def keepBest(spark: SparkSession, dir: String): DataFrame = {
    val comp = stagedComponents(spark, dir).select("doc_id", "component_id")
    val quality = TextAnalysis.quality(spark, dir).select("doc_id", "quality_score")
    val scored = documents(spark, dir).select("doc_id", "lang")
      .join(comp, Seq("doc_id"), "left_outer")
      .withColumn("component_id", coalesce(col("component_id"), col("doc_id")))
      .join(quality, "doc_id")
    val groups = scored.groupBy("component_id").agg(
      count(lit(1)).as("component_size"),
      max_by(col("doc_id"),
        struct(col("quality_score"), -col("doc_id"))).as("keeper_id"))
    scored
      .join(groups, Seq("component_id"), "inner")
      .withColumn("keep", col("doc_id") === col("keeper_id"))
      .select("doc_id", "component_id", "component_size", "quality_score", "keep")
      .orderBy("doc_id")
  }

  /** Near-dup pairs on the embeddings table: 128 random-hyperplane
    * bits (md5-seeded, engine-reproducible) banded 16 × 8 with
    * md5-HASHED band keys → LSH candidates → exact cosine ≥ 0.4
    * verify. Approximate-by-design: the candidate set is the LSH
    * one, but deterministic, so the oracle replays it exactly.
    * Round 11 retired the 4-band × 4-bit RAW keys (16 possible
    * values per band ⇒ ~1/16 of the corpus in every bucket — a
    * near-cross-join at 10⁹ vectors); the 8-bit hashed banding keeps
    * a 2⁻⁸ unrelated-collision rate per band and its measured
    * occupancy/recall trade lives in [[embeddingTuning]]. Staged
    * once per (app, sf): the pair relation also seeds the
    * semantic-cluster closure. */
  def embeddingCosine(spark: SparkSession, dir: String): DataFrame =
    stagedEmbeddingCosine(spark, dir).orderBy("vec_a", "vec_b")

  private[graft] def stagedEmbeddingCosine(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Staging.staged(spark, dir, "embedding_cosine_pairs")(embeddingCosineCompute(spark, dir))

  private def embeddingCosineCompute(spark: SparkSession, dir: String): DataFrame = {
    val exploded = Vectors.bandKeys(embeddings(spark, dir))
    val cand = exploded.as("a").join(exploded.as("b").hint("shuffle_hash"),
        col("a.key") === col("b.key") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
    verifyCosine(spark, dir, cand)
  }

  /** exact-cosine verify join over a candidate pair relation — norm
    * cached per vector (not per candidate pair): same IEEE value,
    * 3× less kernel work. */
  private def verifyCosine(spark: SparkSession, dir: String,
      cand: DataFrame): DataFrame = {
    val vecs = Vectors.asDouble(embeddings(spark, dir))
      .select(col("vec_id"), col("vd"), Vectors.norm(col("vd")).as("nrm"))
    cand
      .join(vecs.select(col("vec_id").as("vec_a"), col("vd").as("va"),
        col("nrm").as("na")), "vec_a")
      .join(vecs.select(col("vec_id").as("vec_b"), col("vd").as("vb"),
        col("nrm").as("nb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        Vectors.cosinePre(col("va"), col("vb"), col("na"), col("nb")).as("cosine"))
      .filter(col("cosine") >= 0.4)
      .orderBy("vec_a", "vec_b")
  }

  /** Multi-probe LSH near-dup detection — the recall lever that does
    * NOT cost more hash tables: alongside each vector's exact hashed
    * band keys, the probe side also explodes the 8 keys one bit-flip
    * away (hashed AFTER the flip, in slice space), so pairs whose
    * 128-bit signatures straddle a single band bit (the near-misses
    * plain bucketing drops) still collide somewhere. The probe
    * fan-out is a fixed ×9 on the tiny (vec_id, band, key) relation —
    * at 100 TB that beats doubling the signature tables (the classic
    * multi-probe trade from the LSH literature), and the verify join
    * still only ever scores candidate pairs. Measured at sf0.1:
    * recall 0.35 → 0.93 against the exact cosine ≥ 0.4 enumeration
    * for ~6× the candidate mass — see [[embeddingTuning]]. Same 0.4
    * cosine release threshold and output contract as
    * [[embeddingCosine]]; DedupSpec asserts the candidate superset. */
  def embeddingMultiprobe(spark: SparkSession, dir: String): DataFrame = {
    val exploded = Vectors.bandKeys(embeddings(spark, dir))
    val probes = Vectors.probeBandKeys(embeddings(spark, dir))
    val cand = probes.as("a").join(exploded.as("b").hint("shuffle_hash"),
        col("a.key") === col("b.key") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
    verifyCosine(spark, dir, cand)
  }

  /** Embedding LSH banding-MIGRATION audit — the round-11 receipts
    * for retiring the 4-band × 4-bit raw keys: for the legacy config
    * and the shipped 16 × 8-bit hashed banding (exact and
    * multi-probe), the candidate mass, the verified pairs (cosine ≥
    * 0.4), and recall against the EXACT all-pairs enumeration — the
    * dedup_lsh_tuning discipline applied to the embedding side.
    * Ground truth is a calibration-scale brute force (broadcast
    * nested-loop over the corpus — a deployment runs this audit on a
    * bounded sample, exactly like [[minhashAccuracy]]'s candidate
    * relation); the all-pairs cosine relation stages once per
    * (app, sf) and every config's verify rides it as a join. All
    * outputs exact integers (ppm by floor division). */
  def embeddingTuning(spark: SparkSession, dir: String): DataFrame =
    embeddingTuningOn(spark, dir, auditSampleMod = 1L)

  /** `auditSampleMod` is the calibration-scale SAMPLE CAP the audit
    * scaladoc promises: the exact all-pairs truth and every config's
    * candidate mass are restricted to pairs whose ANCHOR (vec_a, the
    * smaller id) satisfies vec_a % mod == 0 — a deterministic
    * hash-mod sample of anchors (the sample_stratified discipline),
    * so a deployment audits 1/mod of the quadratic mass while every
    * ratio stays an unbiased estimate. mod=1 (the query default at
    * test SFs) is the full audit; DedupSpec pins subset consistency
    * (every sampled count ≤ its full count). */
  private[graft] def embeddingTuningOn(spark: SparkSession, dir: String,
      auditSampleMod: Long): DataFrame = {
    val pairCos = stagedPairCosine(spark, dir)
      .filter(col("vec_a") % auditSampleMod === 0L)
    val truth = pairCos.filter(col("cosine") >= 0.4)
      .select("vec_a", "vec_b").withColumn("t", lit(1L))
    val totals = broadcast(pairCos.agg(
      count(lit(1)).as("n_allpairs"),
      sum(when(col("cosine") >= 0.4, 1L).otherwise(0L)).as("n_truth")))

    // legacy: 16-plane sign signature, 4 bands × 4 RAW bits
    // (key = band*16 + slice so one column carries (band, slice))
    val legacy = Vectors.signatures(embeddings(spark, dir))
      .select(col("vec_id"), explode(expr(
        "transform(sequence(0, 3), b -> b*16 + (int(shiftright(sig, b*4)) & 15))"))
        .as("key"))
    val wide = Vectors.bandKeys(embeddings(spark, dir)).select("vec_id", "key")
    val probed = Vectors.probeBandKeys(embeddings(spark, dir)).select("vec_id", "key")

    def statsOf(name: String, probe: DataFrame, build: DataFrame): DataFrame =
      // counts only — the per-band multiplicity collapses in ONE hash
      // agg (two DISTINCT counts) instead of a dropDuplicates
      // exchange + join + agg chain. Measured ~4.3 s at sf0.1 either
      // way: the cost is the candidate JOIN mass itself (the thing
      // this audit exists to measure), not the counting shape — kept
      // because one aggregate is still one fewer exchange.
      probe.as("a").join(build.as("b").hint("shuffle_hash"),
          col("a.key") === col("b.key") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
        .filter(col("vec_a") % auditSampleMod === 0L)
        .join(truth, Seq("vec_a", "vec_b"), "left") // pair-graph-scaled: unhinted
        .agg(
          countDistinct(col("vec_a"), col("vec_b")).as("n_candidates"),
          countDistinct(when(col("t") === 1L,
            struct(col("vec_a"), col("vec_b")))).as("n_verified"))
        .withColumn("config", lit(name))

    statsOf("legacy_4x4_raw", legacy, legacy)
      .unionByName(statsOf("wide_16x8_hashed", wide, wide))
      .unionByName(statsOf("wide_16x8_probed", probed, wide))
      .crossJoin(totals)
      .select(col("config"), col("n_candidates"), col("n_verified"),
        col("n_truth"),
        expr("1000000 * n_verified DIV greatest(n_truth, 1L)").as("recall_ppm"),
        expr("1000000 * n_candidates DIV greatest(n_allpairs, 1L)").as("cand_share_ppm"))
      .orderBy("config")
  }

  /** exact all-pairs cosine over the embeddings corpus, staged once
    * per (app, sf) — calibration-scale only (O(N²)): the audit's
    * ground truth, never a production path. */
  private def stagedPairCosine(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Staging.staged(spark, dir, "embedding_paircos") {
      val vecs = Vectors.asDouble(embeddings(spark, dir))
        .select(col("vec_id"), col("vd"), Vectors.norm(col("vd")).as("nrm"))
      broadcast(vecs.select(col("vec_id").as("vec_a"), col("vd").as("va"),
          col("nrm").as("na")))
        .join(vecs.select(col("vec_id").as("vec_b"), col("vd").as("vb"),
          col("nrm").as("nb")), col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          Vectors.cosinePre(col("va"), col("vb"), col("na"), col("nb")).as("cosine"))
    }

  /** Chunk-granularity dedup — boilerplate detection at the
    * context-window level: document-level dedup misses the repeated
    * paragraph (headers, license blocks, templated intros) that
    * inflates loss on every copy, so the release pipeline also scores
    * each doc's share of chunks whose content appears ANYWHERE else
    * in the corpus. Built on the same 64-word/48-stride chunking as
    * doc_chunk_overlap; a chunk-md5 count window (high-cardinality
    * key — scales like the digest windows) feeds one per-doc agg.
    * A high dup_chunk_frac with a unique doc digest is exactly the
    * "templated but not duplicate" doc that per-doc dedup keeps and
    * chunk accounting flags. */
  /** MinHash estimator accuracy audit — the calibration pass that
    * justifies the LSH threshold choice: for every LSH candidate
    * pair, the MinHash ESTIMATE of Jaccard (matching lanes / 128)
    * next to the EXACT shingle-set Jaccard, with the absolute error.
    * E[est] = J with σ = sqrt(J(1−J)/128) ≈ 0.04; a drifting error
    * distribution means the signature machinery (hash family, lane
    * count, banding) no longer supports the 0.8 release threshold —
    * the dedup analog of emb_recall_at_k. The 128 lane comparisons
    * are statically-unrolled element_at columns (codegen'd, and per
    * CANDIDATE PAIR — a set proportional to the near-dup rate, never
    * the corpus), and both estimator and exact sides are md5-derived,
    * so the whole audit replays in the oracle. */
  def minhashAccuracy(spark: SparkSession, dir: String): DataFrame =
    stagedAccuracy(spark, dir)
      .select("doc_a", "doc_b", "n_eq", "est_jaccard", "jaccard", "abs_err")
      .orderBy("doc_a", "doc_b")

  /** The accuracy pair relation, staged to parquet once per
    * (app, sf dir) — the deployed shape: a calibration pass is one
    * job whose output feeds BOTH the accuracy readout and the
    * threshold sweep (and any later retune), so the signature +
    * posting pipeline runs once, not once per consumer. Same
    * stage-once discipline as the IVF / BM25 indexes. */
  private def stagedAccuracy(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Staging.staged(spark, dir, "minhash_accuracy")(minhashAccuracyCompute(spark, dir))

  /** b-BIT MinHash accuracy audit (Li & König 2010): store only the
    * LOW BIT of each of the 128 lanes — 1/64th of the 64-bit
    * signature storage — and estimate Jaccard from the corrected
    * match rate Ĵ = 2·(matches/128) − 1 (a random lane-bit collides
    * half the time, so raw agreement sits at (1+J)/2). This query
    * measures, on the SAME LSH candidate pairs as
    * [[minhashAccuracy]], what that 64× compression costs in
    * estimator error — the storage-vs-accuracy decision a 100 TB
    * signature store actually faces (b-bit makes a billion-doc
    * signature table RAM-resident). Clamped at 0 (the estimator goes
    * negative below ~50 % raw agreement); both estimators and both
    * errors ride the identical fixed-order float expressions in both
    * engines. */
  def bbitAccuracy(spark: SparkSession, dir: String): DataFrame =
    // One derivation over the STAGED accuracy relation (which carries
    // the 1-bit lane-match count alongside the full-lane count) — the
    // signature + candidate + intersection pipeline runs once per
    // (app, sf) for all three calibration consumers.
    stagedAccuracy(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("n_eq"), col("n_eq_1bit"),
        (col("n_eq").cast("double") / 128.0).as("est_full"),
        expr("greatest(0.0, 2 * (CAST(n_eq_1bit AS DOUBLE) / 128.0) - 1.0)")
          .as("est_1bit"),
        col("jaccard"))
      .withColumn("err_full", abs(col("est_full") - col("jaccard")))
      .withColumn("err_1bit", abs(col("est_1bit") - col("jaccard")))
      .orderBy("doc_a", "doc_b")

  private def minhashAccuracyCompute(spark: SparkSession, dir: String): DataFrame = {
    val post = shinglePostings(spark, dir) // staged: already materialized
    val sigs = minhashSigs(post)
    val cand = lshCandidates(sigs)
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id")))
    val cpost = post.join(candDocs, Seq("doc_id"), "left_semi") // corpus-scaled: unhinted
    val nEq = (1 to 128).map(i =>
      when(element_at(col("sa"), i) === element_at(col("sb"), i), 1L)
        .otherwise(0L)).reduce(_ + _)
    // the b-bit (low-bit) lane agreement rides along in the staged
    // relation so the bbit audit never re-runs the pipeline
    val nEq1 = (1 to 128).map(i =>
      when(element_at(col("sa"), i) % 2 === element_at(col("sb"), i) % 2, 1L)
        .otherwise(0L)).reduce(_ + _)
    // alternative-banding catch flags (for the (b,r) tuning audit):
    // config (b bands × r lanes) catches a pair iff SOME of its first
    // b bands of r consecutive lanes matches end to end; only configs
    // STRICTER than the 16×8 generator are measurable on its own
    // candidate set (their catches are true subsets)
    def caught(bands: Int, r: Int) = (0 until bands).map(b =>
      (1 to r).map(i => element_at(col("sa"), b * r + i) ===
        element_at(col("sb"), b * r + i)).reduce(_ && _)).reduce(_ || _)
    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sa")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sb")), "doc_b")
      .withColumn("n_eq", nEq)
      .withColumn("n_eq_1bit", nEq1)
      .withColumn("caught_8x16", caught(8, 16))
      .withColumn("caught_4x32", caught(4, 32))
      .withColumn("caught_8x8", caught(8, 8))
      .join(pairIntersections(cpost), Seq("doc_a", "doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_eq"), col("n_eq_1bit"),
        col("caught_8x16"), col("caught_4x32"), col("caught_8x8"),
        (col("n_eq").cast("double") / 128.0).as("est_jaccard"),
        expr("CAST(inter AS DOUBLE) / (na + nb - inter)").as("jaccard"))
      .withColumn("abs_err", abs(col("est_jaccard") - col("jaccard")))
      .orderBy("doc_a", "doc_b")
  }

  /** LSH RECALL audit — the missing half of the calibration story:
    * [[minhashAccuracy]] grades the pairs the banding SURFACED
    * (precision side); this row grades the pairs it MISSED. Ground
    * truth is the EXACT τ ≥ 0.8 pair enumeration (the staged posting
    * join — the same set [[prefixFilter]] reproduces with a
    * guarantee); each true pair is checked for membership in the LSH
    * candidate set (the staged accuracy relation), per exact-Jaccard
    * decile: n_true, n_found, n_missed. A missed decile-9 pair is a
    * real duplicate the release would ship twice — THE number a
    * banding config answers for. Both relations are staged once per
    * (app, sf); the audit itself is one left join + one agg on the
    * pair graph. */
  def lshRecall(spark: SparkSession, dir: String): DataFrame = {
    val truth = stagedJaccard(spark, dir)
    val cand = stagedAccuracy(spark, dir)
      .select(col("doc_a"), col("doc_b")).withColumn("found", lit(1L))
    truth.join(cand, Seq("doc_a", "doc_b"), "left")
      .withColumn("j_decile",
        least(floor(col("jaccard") * 10).cast("bigint"), lit(9L)))
      .groupBy("j_decile")
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("found"), lit(0L))).as("n_found"))
      .withColumn("n_missed", col("n_true") - col("n_found"))
      .orderBy("j_decile")
  }

  /** LSH BANDING-MIGRATION audit — the (bands × rows) tuning table a
    * dedup deployment reads before tightening its S-curve: for every
    * pair the SHIPPED config (16 bands × 8 lanes) surfaced, would the
    * stricter configs have kept it — 8×16 (same 128 lanes, double-
    * width bands), 4×32 (quad width), and 8×8 (HALF the signature
    * storage, same band width) — bucketed by exact-Jaccard decile.
    * Each stricter config's catches are a true subset of the shipped
    * candidates, so per-decile retention counts are exactly
    * measurable on the candidate set and read as the empirical
    * 1−(1−J^r)^b S-curve shift with NO libm pow anywhere: the
    * decile where retention collapses is where that migration starts
    * dropping real near-dups. One conditional agg over the STAGED
    * accuracy relation (the catch flags ride the one signature
    * pass); all counts BIGINT. */
  def lshTuning(spark: SparkSession, dir: String): DataFrame =
    stagedAccuracy(spark, dir)
      .withColumn("j_decile",
        least(floor(col("jaccard") * 10).cast("bigint"), lit(9L)))
      .groupBy("j_decile")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("caught_8x16"), 1L).otherwise(0L)).as("n_caught_8x16"),
        sum(when(col("caught_4x32"), 1L).otherwise(0L)).as("n_caught_4x32"),
        sum(when(col("caught_8x8"), 1L).otherwise(0L)).as("n_caught_8x8"))
      .orderBy("j_decile")

  /** Release-threshold tuning sweep over the LSH candidate set — the
    * operating-curve readout a dedup deployment derives its τ from:
    * for τ ∈ {0.5, 0.7, 0.8, 0.9}, how many candidate pairs the
    * EXACT Jaccard admits, how many the 128-lane MinHash ESTIMATE
    * admits, and how often the two decisions agree. Disagreement at
    * the chosen τ is the operational false-positive/negative rate of
    * shipping the estimator instead of the exact verify. One extra
    * conditional agg over [[minhashAccuracy]]'s pair relation (the
    * candidate set — proportional to the near-dup rate, never the
    * corpus); one wide row out — consuming the STAGED accuracy
    * relation, so the sweep never re-runs the signature pipeline. */
  def thresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val acc = stagedAccuracy(spark, dir)
    val cols = Seq(500, 700, 800, 900).flatMap { t =>
      val tau = t / 1000.0
      Seq(
        sum(when(col("jaccard") >= tau, 1L).otherwise(0L)).as(s"exact_ge_$t"),
        sum(when(col("est_jaccard") >= tau, 1L).otherwise(0L)).as(s"est_ge_$t"),
        sum(when((col("jaccard") >= tau) === (col("est_jaccard") >= tau), 1L)
          .otherwise(0L)).as(s"agree_$t"))
    }
    acc.agg(count(lit(1)).as("n_candidates"), cols: _*)
  }

  /** Edit-distance verification of LSH candidates — the fuzzy-match
    * refinement a dedup pipeline adds where shingle Jaccard is blind:
    * two docs differing by scattered single-character edits (OCR
    * noise, templated number substitutions) break many word-trigrams
    * at once, so their Jaccard understates similarity while edit
    * distance still sees it. Verification runs levenshtein on the
    * 64-char normalized PREFIX of each candidate pair: bounded-input
    * edit distance is the deployable form — levenshtein is O(m·n) per
    * pair, so at 100 TB it is only ever run on (a) candidate pairs,
    * never the corpus, and (b) bounded slices, never full documents.
    * Standard DP levenshtein is engine-identical, so the whole
    * refinement replays in the oracle. */
  def fuzzyVerify(spark: SparkSession, dir: String): DataFrame = {
    val post = shinglePostings(spark, dir) // staged: already materialized
    val cand = lshCandidates(minhashSigs(post))
    val pfx = documents(spark, dir)
      .select(col("doc_id"), substring(expr(normTextExpr), 1, 64).as("pfx"))
    cand
      .join(pfx.select(col("doc_id").as("doc_a"), col("pfx").as("pa")), "doc_a")
      .join(pfx.select(col("doc_id").as("doc_b"), col("pfx").as("pb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("pa"), col("pb")).cast("bigint").as("lev"),
        greatest(length(col("pa")), length(col("pb"))).cast("bigint").as("max_len"))
      .withColumn("prefix_sim",
        lit(1.0) - col("lev").cast("double") / col("max_len").cast("double"))
      .withColumn("is_dup", col("prefix_sim") >= 0.8)
      .orderBy("doc_a", "doc_b")
  }

  def chunkDedup(spark: SparkSession, dir: String): DataFrame = {
    val chunks = TextAnalysis.chunks(spark, dir)
    // per-chunk occurrence count as a map-side-combined groupBy +
    // join-back — not a window over chunk_md5, where a license-block
    // chunk repeated 10⁸× at 100 TB becomes one task's buffer
    val counts = chunks.groupBy("chunk_md5").agg(count(lit(1)).as("n_same"))
    chunks
      .join(counts, Seq("chunk_md5"), "inner")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_same") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .withColumn("dup_chunk_frac",
        col("n_dup_chunks").cast("double") / col("n_chunks"))
      .orderBy("doc_id")
  }

  /** Cross-source duplication matrix — for every pair of corpus
    * sources, how many exact-content digests they SHARE, next to
    * each source's distinct-digest count and the digest-set Jaccard
    * (the "CommonCrawl ∩ C4" overlap table a mixing decision reads:
    * high overlap means the mixture double-counts that content mass
    * and the weights need dedup-aware correction). Zero-overlap
    * pairs are kept (a complete matrix), via the tiny source×source
    * frame LEFT-joined to the measured overlaps. Scale shape: the
    * (source, digest) relation is DISTINCT (one row per source-
    * content pair, map-side combined); the overlap self-join runs
    * digest⋈digest where both sides end in IDENTICAL exchanges so
    * ReuseExchange computes the relation once, and a digest present
    * in s sources yields s² join rows with s bounded by the SOURCE
    * DOMAIN (a handful) — never a content-hot-key explosion; the
    * matrix frame is a broadcast of the per-source totals. */
  def crossSource(spark: SparkSession, dir: String): DataFrame = {
    val ds = documents(spark, dir)
      .select(col("source"), expr(s"md5($normTextExpr)").as("digest"))
      .distinct()
    val tot = ds.groupBy("source").agg(count(lit(1)).as("n"))
    val shared = ds.as("a").join(ds.as("b").hint("shuffle_hash"),
        col("a.digest") === col("b.digest") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    broadcast(tot.select(col("source").as("source_a"), col("n").as("n_a")))
      .join(broadcast(tot.select(col("source").as("source_b"), col("n").as("n_b"))),
        col("source_a") < col("source_b"))
      .join(shared, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("digest_jaccard",
        col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double"))
      .orderBy("source_a", "source_b")
  }

  /** Content-defined chunking (CDC) dedup accounting — the
    * rsync/LBFS/restic boundary rule that fixed-stride chunking
    * ([[chunkDedup]]) cannot express: a chunk boundary falls AFTER
    * character i whenever the hash of the trailing 8-char window is
    * ≡ 0 mod 64 (expected chunk ≈ 64 chars), so an insertion near
    * the head of a doc re-phases ONE chunk instead of every chunk
    * after it — alignment self-heals at the next content boundary,
    * which is why block-level dedup systems ship CDC and not fixed
    * strides. Per doc: chunk count, chunks shared with another doc,
    * shared-character mass and fraction.
    *
    * Scale shape: the boundary scan explodes per-character positions
    * (codegen'd md5 per position — deliberately NOT a lambda HOF,
    * the documented >100× explode-vs-lambda cliff), segments rebuild
    * with a per-doc window (bounded by doc length), and chunk
    * sharing is a groupBy(digest) hash agg over DISTINCT (doc,
    * digest) pairs joined back on the digest — map-side combined and
    * AQE-splittable, the same no-content-key-window discipline as
    * every digest count in this file. Reference analog: the
    * dictionary-page chunk accounting of dict-encoding.h:1 applied
    * at document granularity. */
  def cdcChunks(spark: SparkSession, dir: String): DataFrame =
    cdcChunksOn(documents(spark, dir))

  /** generic core: CDC chunk accounting over any (doc_id, text)
    * relation — the library entry point. */
  def cdcChunksOn(docs: DataFrame): DataFrame = {
    // Repartition by doc_id BEFORE the per-character fan-out: scan
    // partitions are sized by input BYTES, so the 300×-fan-out hash
    // stage otherwise inherits the scan's parallelism (one thread per
    // 128 MB split regardless of core count). The shuffle moves 5 KB
    // rows, not exploded positions, and the downstream per-doc window
    // needs this exact partitioning anyway.
    val t = docs.select(col("doc_id"), expr(normTextExpr).as("norm"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
    // cut positions: i in [8, len-1] with Hash60(norm[i-7..i]) ≡ 0 (mod 64);
    // the greatest() guard keeps sequence() ascending on short docs and
    // the i < len filter drops the padding element it introduces
    val cuts = t
      .select(col("doc_id"), col("norm"),
        explode(expr("sequence(8, greatest(length(norm), 9) - 1)")).as("i"))
      .filter(expr(
        s"i < length(norm) AND ${graft.operators.Hash60.sql("substring(norm, i - 7, 8)")} % 64 = 0"))
      .select(col("doc_id"), col("i").as("e"))
    // segment ends = cuts plus the doc tail; starts from lag() per doc
    val ends = cuts.union(t.select(col("doc_id"), length(col("norm")).as("e")))
    val byDoc = Window.partitionBy("doc_id").orderBy("e")
    val seg = ends.withColumn("s",
      coalesce(lag("e", 1).over(byDoc), lit(0)) + 1)
    val chunks = seg.join(t, Seq("doc_id"))
      .select(col("doc_id"),
        md5(expr("substring(norm, s, e - s + 1)")).as("digest"),
        (col("e") - col("s") + 1).cast("bigint").as("clen"))
    val sharing = chunks.select("doc_id", "digest").distinct()
      .groupBy("digest").agg(count(lit(1)).as("n_docs"))
    chunks.join(sharing, Seq("digest"), "inner")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_shared_chunks"),
        sum(when(col("n_docs") > 1, col("clen")).otherwise(0L)).as("shared_chars"),
        sum(col("clen")).as("n_chars_norm"))
      .withColumn("shared_frac",
        when(col("n_chars_norm") > 0,
          col("shared_chars").cast("double") / col("n_chars_norm").cast("double")))
      .orderBy("doc_id")
  }

  /** Dedup CASCADE report — the end-to-end accounting a curation
    * pipeline publishes with its release: how many documents each
    * dedup stage removes, in the order production runs them (cheap
    * exact first, then the near-dup closure over the SURVIVORS).
    * Stage 1 keeps the minimum doc per content digest; stage 2 keeps
    * the minimum surviving member per verified-Jaccard (τ = 0.8)
    * connected component. The component labels come from the FULL-
    * corpus staged closure — sound for the survivor set because an
    * exact duplicate has its keeper's exact shingle set, so removing
    * it never disconnects a component. One row per stage:
    * docs_in / docs_removed / docs_out, all BIGINT.
    *
    * Scale: stage 1 is one digest agg; stage 2 reuses the STAGED
    * pair-graph closure ([[stagedComponents]] — computed once per
    * (app, sf) for all its consumers) plus two tiny aggs. */
  def cascade(spark: SparkSession, dir: String): DataFrame = {
    // three consumers (the stage-1 agg and both sides of the keeper
    // self-join): stage the digest projection once — without the
    // barrier the corpus re-normalizes + re-hashes per consumer
    val d = documents(spark, dir)
      .select(col("doc_id"), expr(s"md5($normTextExpr)").as("digest"))
      .localCheckpoint()
    val s1 = d.agg(count(lit(1)).as("docs_in"),
        countDistinct("digest").as("docs_out"))
      .select(lit("1_exact").as("stage"), col("docs_in"),
        (col("docs_in") - col("docs_out")).as("docs_removed"), col("docs_out"))
      .localCheckpoint() // 1 row; embedded twice (s2 derives from it)
    val survivors = d.join(
        d.groupBy("digest").agg(min("doc_id").as("keep_id")), Seq("digest"))
      .filter(col("doc_id") === col("keep_id")).select("doc_id")
    val removed2 = survivors
      .join(stagedComponents(spark, dir).select("doc_id", "component_id"),
        Seq("doc_id"))
      .groupBy("component_id").agg(count(lit(1)).as("m"))
      .agg(coalesce(sum(col("m") - 1), lit(0L)).as("docs_removed"))
    val s2 = s1.select(col("docs_out").as("in2")).crossJoin(broadcast(removed2))
      .select(lit("2_neardup").as("stage"), col("in2").as("docs_in"),
        col("docs_removed"), (col("in2") - col("docs_removed")).as("docs_out"))
    s1.unionAll(s2).orderBy("stage")
  }

  /** TRUNCATION-family detection — the crawl artifact neither exact
    * nor shingle dedup names: the SAME page captured at different
    * cutoffs (paywall folds, timeout truncation, pagination) shares
    * its head but differs in length, so exact dedup misses it and
    * near-dup scores degrade with the length gap. Detector: docs
    * with ≥ 256 normalized chars group by the md5 of their 256-char
    * HEAD; a group with >1 doc and differing lengths is a truncation
    * family, and the longest member is the keeper (is_longest; ties
    * all flagged — equal-length same-head docs are exact-dup
    * territory). One digest shuffle, groupBy + join-back (never a
    * window on the content key — the house discipline). */
  def truncation(spark: SparkSession, dir: String): DataFrame =
    truncationOn(documents(spark, dir)).orderBy("doc_id")

  /** Generic core of [[truncation]] over any (doc_id, text) relation. */
  def truncationOn(docs: DataFrame): DataFrame = {
    val headed = docs
      .withColumn("norm", expr(normTextExpr))
      .withColumn("n_chars_norm", length(col("norm")).cast("bigint"))
      .filter(col("n_chars_norm") >= 256)
      .withColumn("prefix_md5", md5(expr("substring(norm, 1, 256)")))
      .select("doc_id", "prefix_md5", "n_chars_norm")
    val fams = headed.groupBy("prefix_md5")
      .agg(count(lit(1)).as("n_docs"),
        min("n_chars_norm").as("min_len"), max("n_chars_norm").as("max_len"))
      .filter(col("n_docs") > 1 && col("max_len") > col("min_len"))
    headed.join(fams, Seq("prefix_md5"), "inner")
      .withColumn("is_longest", col("n_chars_norm") === col("max_len"))
      .select("doc_id", "prefix_md5", "n_docs", "n_chars_norm",
        "max_len", "is_longest")
  }

  /** WINNOWING fingerprints (Schleimer-Wilkerson-Aiken, the MOSS
    * algorithm) — the guaranteed-coverage selective fingerprinting
    * between MinHash (fixed-size sketch, no locality) and full
    * postings (everything): from each window of `w` consecutive
    * shingle hashes keep the MINIMUM, so any shared run of at least
    * w+k−1 words is guaranteed to share a fingerprint (the winnowing
    * density/coverage theorem) while storage drops to ~2/(w+1) of
    * the shingle mass. Per doc: fingerprints kept, fingerprints seen
    * in another doc, and the shared fraction — the plagiarism-
    * detector readout at corpus scale.
    *
    * Scale: positional shingles explode to corpus token mass
    * (linear, the repeated-spans path); the window min rides per-doc
    * windows (bounded by doc length); sharing is a groupBy(fp) hash
    * agg joined back — map-side combined, never a window over the
    * fingerprint key (a boilerplate fingerprint stays AQE-splittable).
    * Docs with fewer than w shingles emit no full window and are
    * absent — the contract (MOSS ignores sub-window fragments too). */
  def winnowing(spark: SparkSession, dir: String): DataFrame =
    // single-row-group input: normalize+shingle would explode the
    // whole corpus in ONE scan task before the per-doc window's
    // exchange; fan docs out first (identity at scale — see
    // Tables.parallelized). Re-confirmed r16 by interleaved A/B:
    // plain is 1.09× slower (unlike repeatedSpans, the winnowing
    // kernel is heavy enough that the fan-out pays).
    winnowingOn(graft.sources.Tables.parallelized(
      documents(spark, dir), col("doc_id"))).orderBy("doc_id")

  /** Generic core of [[winnowing]] over any (doc_id, text) relation;
    * k=3-word shingles, window w=4. */
  def winnowingOn(docs: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val sh = docs
      .select(col("doc_id"), posexplode(split(expr(normTextExpr), " ")).as(Seq("pos", "w")))
      .withColumn("w1", lead("w", 1).over(byDoc))
      .withColumn("w2", lead("w", 2).over(byDoc))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("pos"), expr(h60("concat_ws(' ', w, w1, w2)")).as("h"))
    val fps = sh
      .withColumn("fp", min("h").over(byDoc.rowsBetween(-3, 0)))
      .filter(col("pos") >= 3)
      .select("doc_id", "fp").distinct()
    val df = fps.groupBy("fp").agg(count(lit(1)).as("n_docs"))
    fps.join(df, Seq("fp"), "inner")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fps"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_shared_fps"))
      .withColumn("shared_ppm", expr("n_shared_fps * 1000000 div n_fps"))
  }

  /** Repeated-SUBSTRING spans — the distributed approximation of
    * suffix-array exact-substring dedup ("Deduplicating Training
    * Data Makes Language Models Better", Lee et al. 2022): instead
    * of a corpus-global suffix array (inherently sequential), every
    * word-trigram occurrence (positional, NOT distinct — a phrase
    * repeated inside one doc counts) is checked for recurrence
    * anywhere in the corpus, and runs of ADJACENT recurring trigram
    * positions merge into maximal repeated spans — a shared k-word
    * passage appears as one span of k-2 consecutive flagged
    * positions, so span_words recovers the passage length exactly.
    * Per doc: span count, longest span, distinct word positions
    * covered, and the covered fraction — the per-doc "memorized
    * text" mass that drives span-level (not doc-level) removal.
    *
    * Scale: positional postings explode to corpus token mass
    * (linear); recurrence is a groupBy(h) hash agg semi-joined back
    * (map-side combined and AQE-splittable — a count window over h
    * would buffer a boilerplate trigram's 10⁹ occurrences in one
    * task); span merging windows per doc_id (partitions bounded by
    * doc length); coverage is a distinct-count over flagged
    * positions only. No pair join anywhere — cost is O(tokens),
    * never O(dups²), which is what makes span accounting feasible
    * where pairwise diffing is not. */
  def repeatedSpans(spark: SparkSession, dir: String): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    // NOTE (r16): the scan fan-out (Tables.parallelized before the
    // explode) was re-adjudicated with an alternating same-session A/B
    // and measured 1.4× SLOWER than this plain shape (median of 4
    // interleaved pairs) — the explode feeds a window whose exchange
    // already parallelizes everything above the scan, so the added
    // repartition is pure stage latency. The r15 revert stands.
    val words = documents(spark, dir)
      .select(col("doc_id"), posexplode(split(expr(normTextExpr), " ")).as(Seq("pos", "w")))
    // shuffle-free: the word count is a projection over the doc row,
    // never an aggregate over the exploded token relation
    val nWords = documents(spark, dir)
      .select(col("doc_id"),
        size(split(expr(normTextExpr), " ")).cast("bigint").as("n_words"))
    val sh = words
      .withColumn("w1", lead("w", 1).over(byDoc))
      .withColumn("w2", lead("w", 2).over(byDoc))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("pos"), expr(h60("concat_ws(' ', w, w1, w2)")).as("h"))
      // staged once: the recurrence agg and the semi-join back both
      // consume the token-mass positional postings — without the
      // checkpoint each branch would re-explode the corpus
      .localCheckpoint()
    val recurring = sh.groupBy("h").agg(count(lit(1)).as("occ"))
      .filter(col("occ") > 1).select("h")
    val flagged = sh
      .join(recurring, Seq("h"), "left_semi")
      .select("doc_id", "pos")
      .localCheckpoint() // staged once: feeds both span merge and coverage
    val spanStats = flagged
      .withColumn("isl", col("pos") - row_number().over(byDoc))
      .groupBy("doc_id", "isl")
      .agg(min("pos").as("first_pos"), max("pos").as("last_pos"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        max(col("last_pos") - col("first_pos") + lit(3)).cast("bigint").as("max_span_words"))
    val coverage = flagged
      .select(col("doc_id"),
        explode(array(col("pos"), col("pos") + 1, col("pos") + 2)).as("wp"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("covered_words"))
    nWords.filter(col("n_words") >= 3)
      .join(spanStats, Seq("doc_id"), "left")
      .join(coverage, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_spans", "max_span_words", "covered_words"))
      .withColumn("covered_frac",
        col("covered_words").cast("double") / col("n_words").cast("double"))
      .select("doc_id", "n_words", "n_spans", "max_span_words",
        "covered_words", "covered_frac")
      .orderBy("doc_id")
  }

  /** URL canonicalization dedup — the crawl-frontier stage that runs
    * BEFORE any content fetch: tracking-parameter noise, host-case
    * noise, default ports, trailing slashes and fragments make one
    * logical page arrive under many raw URLs, and collapsing them is
    * the cheapest dedup in the whole cascade (string kernels only, no
    * content). Raw URLs are assembled deterministically from doc
    * columns with four planted variant shapes (clean / upper-case
    * host + :443 + trailing slash / utm_* params + fragment /
    * reordered params), four doc_ids per logical page, so the
    * canonicalizer has real work at every corpus size.
    *
    * Canonical form: drop fragment → split query → lowercase the
    * scheme://host/path part → strip :443 and the trailing slash →
    * drop utm_* parameters → sort the survivors. The query-param
    * lambda runs on a ≤3-element array (O(params) per row, bounded by
    * construction), NOT on a per-token relation — the documented
    * exception to the no-HOF rule for constant-size cold arrays.
    *
    * Scale shape: pure projection + one canonical-key hash agg —
    * exactly [[exact]]'s one-shuffle cost, on strings ~100× smaller
    * than content digests' inputs. */
  def urlCanonical(spark: SparkSession, dir: String): DataFrame = {
    val page = expr("doc_id div 4")
    val base = concat(lit("https://"), col("lang"), lit(".example.com/doc/"), page)
    val url = when(pmod(col("doc_id"), lit(4L)) === 0,
        concat(base, lit("?a=1&b=2")))
      .when(pmod(col("doc_id"), lit(4L)) === 1,
        concat(lit("HTTPS://"), upper(col("lang")), lit(".EXAMPLE.COM:443/doc/"),
          page, lit("/?b=2&a=1")))
      .when(pmod(col("doc_id"), lit(4L)) === 2,
        concat(base, lit("?utm_source=feed&b=2&a=1#frag")))
      .otherwise(concat(base, lit("?a=1&utm_campaign=x&b=2")))
    documents(spark, dir)
      .withColumn("url", url)
      .withColumn("nofrag", regexp_replace(col("url"), "#.*$", ""))
      .withColumn("pre", expr("split_part(nofrag, '?', 1)"))
      .withColumn("q", expr("split_part(nofrag, '?', 2)"))
      .withColumn("pre_c",
        regexp_replace(regexp_replace(lower(col("pre")), ":443/", "/"), "/$", ""))
      .withColumn("q_c",
        expr("array_join(array_sort(filter(split(q, '&'), " +
          "p -> NOT startswith(p, 'utm_'))), '&')"))
      .withColumn("canonical_url",
        concat(col("pre_c"),
          when(col("q_c") =!= "", concat(lit("?"), col("q_c"))).otherwise(lit(""))))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc_id"),
        (count(lit(1)) > 1).as("has_variants"))
      .orderBy("canonical_url")
  }
}
