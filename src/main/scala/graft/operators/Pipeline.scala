package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** End-to-end corpus-cleaning composition — the shape a 100 TB
  * pre-training pipeline actually runs, in one declarative plan:
  *
  *   quality gate → exact dedup (md5-canonical) → per-language
  *   corpus accounting
  *
  * One normalized-text projection feeds every stage (Catalyst
  * collapses the shared projections into the scan stage), the dedup
  * is a single digest-partitioned window, and the final accounting is
  * a partial→final hash agg on the ~handful of languages. Nothing
  * here is driver-side; the whole pipeline is one job whose only
  * shuffles are the digest window and the tiny final agg. Aggregates
  * are chosen order-free (counts, integer sums, min/max) so the
  * result is engine-exact for the oracle.
  */
object Pipeline {

  private val normTextExpr = "trim(regexp_replace(lower(text), '\\\\s+', ' '))"

  def cleanCorpusStats(spark: SparkSession, dir: String): DataFrame = {
    val scored = documents(spark, dir)
      .withColumn("norm", expr(normTextExpr))
      .withColumn("n_char", length(col("norm")).cast("bigint"))
      .withColumn("n_words", size(split(col("norm"), " ")).cast("bigint"))
      .withColumn("n_digit",
        (length(col("norm")) - length(regexp_replace(col("norm"), "[0-9]", ""))).cast("bigint"))
      .withColumn("n_punct",
        (length(col("norm")) - length(regexp_replace(col("norm"), "[^a-z0-9 ]", ""))).cast("bigint"))
      .withColumn("n_stop",
        size(expr("filter(split(norm, ' '), w -> w IN ('the','and','is','of','to','in','that','it'))")).cast("bigint"))
      .withColumn("quality_score",
        lit(0.4) * (col("n_stop").cast("double") / col("n_words")) +
          lit(0.3) * (lit(1.0) - col("n_punct").cast("double") / col("n_char")) +
          lit(0.2) * least(lit(1.0), col("n_words").cast("double") / 100.0) +
          lit(0.1) * (lit(1.0) - col("n_digit").cast("double") / col("n_char")))
    val kept = scored.filter(col("quality_score") >= 0.5)
    val w = Window.partitionBy("digest").orderBy("doc_id")
    val canonical = kept
      .withColumn("digest", md5(col("norm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    canonical.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("total_words"),
        min("quality_score").as("min_quality"),
        max("quality_score").as("max_quality"))
      .orderBy("lang")
  }

  /** Training-mix weights: per-language token accounting → the
    * sampling weight that rebalances the corpus to a UNIFORM language
    * mix (the multilingual-curation step between cleaning and
    * tokenization). mix_weight = target_share / actual_share — a
    * language holding half the tokens gets weight 1/(n_langs·0.5),
    * a rare one gets > 1 (upsample). `oversample_capped` applies the
    * standard ≤4× repetition cap (diminishing returns past ~4 epochs
    * of a subset).
    *
    * Shape: one corpus pass → per-lang hash agg (a handful of rows)
    * → 1-row broadcast of the totals. Both divisions are single
    * double ops over exact integer sums, so the oracle matches
    * bitwise. Scales: the only shuffle is the tiny per-lang agg. */
  /** Sequence packing — the batch-assembly step that turns variable-
    * length documents into fixed token-budget training bins (budget
    * 2048 here). Docs are packed greedily in doc_id order: a doc
    * lands in bin floor(cum_tokens_before / budget), so bins fill to
    * ~budget and a straddling doc stays in the bin where it started —
    * deterministic, single-pass, and engine-exact (pure integer
    * window arithmetic).
    *
    * The packing key is (lang, shard): packing is inherently
    * sequential WITHIN a stream, so scale comes from sharding the
    * corpus first (shard = doc_id % 8 here; at 100 TB, % n_tasks) and
    * packing each shard independently — window partitions stay
    * bounded and the cluster fans out across shards. Output is
    * per-bin accounting (doc count, token fill, doc-id span) — what a
    * training-data loader consumes as its manifest. */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val budget = 2048L
    val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    documents(spark, dir)
      .withColumn("n_tokens", size(split(expr(normTextExpr), " ")).cast("bigint"))
      .withColumn("shard", pmod(col("doc_id"), lit(8L)))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("bin_id", expr(s"cum_before div $budget"))
      .groupBy("lang", "shard", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .withColumn("fill_ratio", col("n_tokens").cast("double") / budget)
      .select("lang", "shard", "bin_id", "n_docs", "n_tokens",
        "first_doc", "last_doc", "fill_ratio")
      .orderBy("lang", "shard", "bin_id")
  }

  def mixWeights(spark: SparkSession, dir: String): DataFrame = {
    val byLang = documents(spark, dir)
      .withColumn("n_words", size(split(expr(normTextExpr), " ")).cast("bigint"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_tokens"))
    val totals = byLang.agg(
      count(lit(1)).as("n_langs"), sum("n_tokens").as("total_tokens"))
    byLang.crossJoin(broadcast(totals))
      .withColumn("token_share",
        col("n_tokens").cast("double") / col("total_tokens").cast("double"))
      .withColumn("mix_weight",
        col("total_tokens").cast("double") / (col("n_langs") * col("n_tokens")).cast("double"))
      .withColumn("oversample_capped", least(col("mix_weight"), lit(4.0)))
      .select("lang", "n_docs", "n_tokens", "token_share", "mix_weight", "oversample_capped")
      .orderBy("lang")
  }

  /** Temperature-scaled source mixing — the α-sampling rule
    * multilingual training mixes actually deploy (p_l ∝ n_l^α, here
    * α = 1/2): flattens the natural token distribution toward
    * uniform so low-resource sources upsample without drowning the
    * head — the knob between [[mixWeights]]' natural share and its
    * uniform mix_weight. Exactness: each source's √tokens is one
    * correctly-rounded IEEE op; the normalizing sum folds IN LANG
    * ORDER via one aggregate() lambda over the collected ≤|langs|
    * array (the bounded-domain fold of the survival curve), so both
    * engines build the identical double; shares and upsample factors
    * land as floor(10⁶·x) integers. Scale: one map-side-combined
    * lang agg + a 1-row broadcast — the corpus is touched once. */
  def mixTemperature(spark: SparkSession, dir: String): DataFrame = {
    val byLang = documents(spark, dir)
      .withColumn("n_words", size(split(expr(normTextExpr), " ")).cast("bigint"))
      .groupBy("lang").agg(sum("n_words").as("n_tokens"))
    val totals = byLang.agg(
      sum("n_tokens").as("total_tokens"),
      expr("""aggregate(array_sort(collect_list(struct(lang, n_tokens))),
        CAST(0.0 AS DOUBLE), (acc, s) -> acc + sqrt(CAST(s.n_tokens AS DOUBLE)))""")
        .as("w_sum"))
    byLang.crossJoin(broadcast(totals))
      .withColumn("w", sqrt(col("n_tokens").cast("double")))
      .select(col("lang"), col("n_tokens"),
        expr("CAST(floor(1000000.0 * w / w_sum) AS BIGINT)").as("share_ppm"),
        expr("""CAST(floor(1000000.0 * (w / w_sum) /
          (CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE))) AS BIGINT)""")
          .as("upsample_ppm"))
      .orderBy("lang")
  }

  /** Per-source provenance scorecard — the accounting a corpus build
    * runs before setting source quotas: per ingestion source, doc and
    * language counts, token mass, and exact-duplicate pressure (how
    * many of the source's docs share their normalized digest with ANY
    * doc corpus-wide — a source that mostly re-crawls what other
    * sources already contributed gets its quota cut first).
    *
    * One plan: normalized-text projection → corpus-wide digest-count
    * window (digest is effectively unique per distinct text, so the
    * window partitions by a HIGH-cardinality key and scales like the
    * dedup digests) → one per-source hash agg (~thousands of rows at
    * any scale). The dup share is a single double division of exact
    * integer counts, so the oracle matches bitwise. */
  def sourceStats(spark: SparkSession, dir: String): DataFrame = {
    val wDigest = Window.partitionBy("digest")
    documents(spark, dir)
      .withColumn("norm", expr(normTextExpr))
      .select(col("source"), col("lang"), md5(col("norm")).as("digest"),
        size(split(col("norm"), " ")).cast("bigint").as("n_tokens"))
      .withColumn("is_dup", count(lit(1)).over(wDigest) > 1)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("lang").as("n_langs"),
        sum("n_tokens").as("total_tokens"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("dup_docs"))
      .withColumn("dup_share", col("dup_docs").cast("double") / col("n_docs"))
      .orderBy("source")
  }

  /** Leakage-proof train/eval split — the assignment step before
    * packing: the split is a deterministic hash of the CONTENT digest
    * (md5 of normalized text), not of the doc id, so exact duplicates
    * land on the same side by construction — the guard against
    * train→eval leakage that an id-hash split (sample_stratified's
    * shape) cannot give, because duplicate content arrives under
    * different ids. 90/10 by digest-hash mod 100; shuffle-free, pure
    * projection (embarrassingly parallel at any scale), and the
    * md5-derived bucket replays bitwise in the oracle. PipelineSpec
    * asserts no digest ever spans both splits. */
  def leakageSplit(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .withColumn("norm", expr(normTextExpr))
      .select(col("doc_id"), col("lang"), md5(col("norm")).as("digest"))
      .withColumn("bucket",
        expr(Hash60.sql("digest") + " % 100"))
      .withColumn("split", when(col("bucket") < 90, "train").otherwise("eval"))
      .select("doc_id", "lang", "digest", "bucket", "split")
      .orderBy("doc_id")

  /** Deterministic K-FOLD assignment + balance audit — the
    * cross-validation split with the two properties a training-eval
    * loop actually requires and naive `rand()` folds lack:
    * reproducibility (the fold is a pure function of CONTENT, so
    * re-runs, retries, and incremental ingests agree forever) and
    * leakage safety (keyed on the content digest, so exact
    * duplicates land in the SAME fold and can never sit on both
    * sides of a train/test boundary — the [[leakageSplit]]
    * discipline extended to k folds). Per (fold, source): docs and
    * token mass; per fold: the total share vs the uniform 200 000
    * ppm ideal. Reading the audit: share_ppm far from 1/k means the
    * hash is biased or duplicates concentrate; source composition
    * shifting across folds means a stratified variant is needed.
    * One doc-level projection + two map-side-combined aggs; all
    * integer outputs. */
  def kfold(spark: SparkSession, dir: String): DataFrame = {
    val K = 5
    val docs = documents(spark, dir)
      .withColumn("norm", expr(normTextExpr))
      .select(col("doc_id"), col("source"),
        size(split(col("norm"), " ")).cast("bigint").as("n_tokens"),
        expr(Hash60.sql(s"md5($normTextExpr)") + s" % $K").as("fold"))
    val bySrc = docs.groupBy("fold", "source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
    val byFold = bySrc.groupBy("fold").agg(sum("n_docs").as("fold_docs"))
    val tot = byFold.agg(sum("fold_docs").as("tot_docs"))
    bySrc.join(broadcast(byFold), "fold").crossJoin(broadcast(tot))
      .select(col("fold"), col("source"), col("n_docs"), col("n_tokens"),
        col("fold_docs"),
        expr("fold_docs * 1000000 div tot_docs").as("fold_share_ppm"))
      .orderBy("fold", "source")
  }

  /** Token-budget selection — the "cut the corpus to N tokens per
    * language" step between mixing and packing: docs are taken
    * greedily in arrival order (doc_id) within each language until
    * the running token total exceeds the budget, and the selection is
    * a pure projection off the cumsum — no second pass, no driver
    * loop.
    *
    * Scale shape: a naive `Window.partitionBy(lang)` serializes each
    * language's ENTIRE doc stream through one task (~5 partitions at
    * any corpus size — the low-cardinality-window anti-pattern). The
    * cumsum is instead computed by the classic two-level prefix-sum
    * decomposition: shard the arrival axis into contiguous doc_id
    * RANGES (shard = doc_id div width — ranges, not doc_id % N, so
    * concatenating shards in shard order IS doc_id order and the
    * global cumsum is recovered EXACTLY, not under a permuted
    * arrival key), cumsum within each (lang, shard) window, then add
    * each shard's per-language prefix — a second cumsum over the
    * per-shard TOTALS (a ~n_shards×n_langs-row relation) broadcast
    * back onto the data. Window partitions stay bounded at `width`
    * docs regardless of corpus size; `width` is the deployment knob
    * (≈2^20 at 100 TB keeps the totals relation tiny while shards
    * fan out across the cluster; 16 here so every test SF exercises
    * multiple shards per language). The tokenized projection is
    * staged ONCE (localCheckpoint — the repo's temp-table-staging
    * pattern; measured: without staging Catalyst re-scanned and
    * re-tokenized the corpus for the totals branch), then
    * the doc-level window and the tiny totals agg both read the
    * stage. The budget is a constant of the contract row (2000
    * tokens/lang — both kept and cut branches are exercised at every
    * test SF). */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val budget = 2000L
    val shardWidth = 16L
    val wShard = Window.partitionBy("lang", "shard").orderBy("doc_id")
    val wPrefix = Window.partitionBy("lang").orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val toks = documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(expr(normTextExpr), " ")).cast("bigint").as("n_tokens"))
      // exact integer FLOOR division (not `div`, which truncates
      // toward zero): ids -15..15 would otherwise collapse into one
      // shard and break the shard-order = doc_id-order invariant the
      // two-level cumsum recovery depends on. The corpus ships
      // non-negative doc_ids, but the operator must not.
      .withColumn("shard",
        expr(s"(doc_id - pmod(doc_id, $shardWidth)) div $shardWidth"))
      // lazy: plan construction/inspection must not run a corpus job;
      // the stage materializes on first execution and is shared by
      // both branches of that execution
      .localCheckpoint(eager = false)
    val inShard = toks.withColumn("cum_in_shard", sum("n_tokens").over(wShard))
    // per-(lang, shard) totals need no window at all — a direct hash
    // agg over the stage, prefix-summed along the tiny shard axis
    val prefixes = toks.groupBy("lang", "shard")
      .agg(sum("n_tokens").as("shard_total"))
      .withColumn("prefix", coalesce(sum("shard_total").over(wPrefix), lit(0L)))
      .select("lang", "shard", "prefix")
    inShard.join(broadcast(prefixes), Seq("lang", "shard"))
      .withColumn("cum_tokens", col("prefix") + col("cum_in_shard"))
      .withColumn("selected", col("cum_tokens") <= budget)
      .select("doc_id", "lang", "n_tokens", "cum_tokens", "selected")
      .orderBy("doc_id")
  }

  /** Curriculum banding — the difficulty-ordered phase assignment a
    * curriculum-training run consumes: each doc lands in a phase by
    * its quality score's z-band against the corpus distribution
    * (easy = above μ+σ/2, core = within ±σ/2, hard = below μ−σ/2).
    *
    * A rank-based quartile (ntile over a global ORDER BY score) is
    * the textbook form but plans an unpartitioned window — one task
    * sorts the whole corpus, the low-cardinality-window anti-pattern
    * this repo rejects everywhere. Z-bands give the same curriculum
    * semantics from a 1-ROW broadcast: μ and σ come from order-free
    * integer power sums over the floor(score·1e9) grid (the
    * agg_corr_exact construction — engine-exact on any partitioning),
    * and the band pick is then a pure per-row projection. Output is
    * the per-(lang, phase) manifest: doc count, token mass, min/max
    * score — what the training loader reads to schedule phases. */
  def curriculum(spark: SparkSession, dir: String): DataFrame = {
    val scored = documents(spark, dir)
      .withColumn("norm", expr(normTextExpr))
      .withColumn("n_char", length(col("norm")).cast("bigint"))
      .withColumn("n_words", size(split(col("norm"), " ")).cast("bigint"))
      .withColumn("n_digit",
        (length(col("norm")) - length(regexp_replace(col("norm"), "[0-9]", ""))).cast("bigint"))
      .withColumn("n_punct",
        (length(col("norm")) - length(regexp_replace(col("norm"), "[^a-z0-9 ]", ""))).cast("bigint"))
      .withColumn("n_stop",
        size(expr("filter(split(norm, ' '), w -> w IN ('the','and','is','of','to','in','that','it'))")).cast("bigint"))
      .withColumn("quality_score",
        lit(0.4) * (col("n_stop").cast("double") / col("n_words")) +
          lit(0.3) * (lit(1.0) - col("n_punct").cast("double") / col("n_char")) +
          lit(0.2) * least(lit(1.0), col("n_words").cast("double") / 100.0) +
          lit(0.1) * (lit(1.0) - col("n_digit").cast("double") / col("n_char")))
      // 1e6 grid: 1e-6 score resolution is far below any
      // band-assignment consequence. The σ computation sums q²
      // (≤1e12 per row), which exhausts a BIGINT within ~9·10^6 docs
      // — the agg_moments_exact overflow class — so that sum runs in
      // DECIMAL(38,0) from the first multiply: corpus-size-proof.
      .withColumn("q", floor(col("quality_score") * lit(1e6)).cast("bigint"))
      .localCheckpoint(eager = false) // one tokenization pass feeds both branches
    val moments = scored.agg(
      count(lit(1)).as("n"), sum("q").as("sq"),
      sum(col("q").cast("decimal(38,0)") * col("q")).as("sqq"))
    val banded = scored.crossJoin(broadcast(moments))
      .withColumn("mu", col("sq").cast("double") / col("n").cast("double"))
      .withColumn("sigma",
        sqrt(col("sqq").cast("double") / col("n").cast("double") -
          (col("sq").cast("double") / col("n").cast("double")) *
          (col("sq").cast("double") / col("n").cast("double"))))
      .withColumn("phase",
        when(col("q").cast("double") > col("mu") + col("sigma") / 2, "1_easy")
          .when(col("q").cast("double") >= col("mu") - col("sigma") / 2, "2_core")
          .otherwise("3_hard"))
    banded.groupBy("lang", "phase")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("total_tokens"),
        min("quality_score").as("min_score"),
        max("quality_score").as("max_score"))
      .orderBy("lang", "phase")
  }

  /** Output-shard manifest — the final accounting of the training-
    * data build: every doc is assigned a shard by a deterministic
    * hash of its CONTENT digest (so re-runs and re-crawls land
    * identically — the same digest-keyed rationale as leakageSplit),
    * and the manifest reports per shard the doc count, token mass,
    * doc_id span, and an ORDER-FREE content checksum (each digest's
    * hash mod a prime, summed in DECIMAL(38,0) and folded mod the
    * same prime — shard-size-proof where a bigint sum of ~10⁹-per-row
    * terms would overflow past ~9·10⁹ docs/shard, and bit-identical
    * on any partitioning/engine) that a downstream loader re-derives
    * to detect a corrupt or stale shard.
    * The physical partitioned write itself is covered by
    * sink_partitioned_prune; this is the pure manifest plan: one
    * projection → one n_shards-row hash agg, no window, no join. */
  /** Per-epoch training-order shuffle — the deterministic permutation
    * a multi-epoch trainer needs so each epoch visits the corpus in a
    * different but REPRODUCIBLE order: every (doc, epoch) pair gets a
    * 60-bit md5 shuffle key and a key-derived shard; the loader reads
    * a shard's docs ordered by (skey, doc_id) and the concatenation
    * across shards IS the epoch's permutation. Deliberately NO
    * position column: ranking inside (epoch, shard) would be a
    * window over corpus/n_shards-sized partitions (the exact shape
    * the token-budget rewrite removed) — the sort key itself carries
    * the order, so the whole operator stays a pure shuffle-free
    * projection (epoch fan-out via explode of a 3-literal array, not
    * a join) at any corpus size. */
  def epochShuffle(spark: SparkSession, dir: String): DataFrame = {
    val nShards = 8L
    documents(spark, dir)
      .select(col("doc_id"))
      .withColumn("epoch", explode(array(lit(0L), lit(1L), lit(2L))))
      .withColumn("skey",
        expr(Hash60.sql("concat('ep', epoch, '_', doc_id)")))
      .withColumn("shard", col("skey") % nShards)
      .select("doc_id", "epoch", "shard", "skey")
      .orderBy("epoch", "shard", "skey", "doc_id")
  }

  def shardManifest(spark: SparkSession, dir: String): DataFrame = {
    val nShards = 16L
    documents(spark, dir)
      .withColumn("norm", expr(normTextExpr))
      .select(col("doc_id"), md5(col("norm")).as("digest"),
        size(split(col("norm"), " ")).cast("bigint").as("n_tokens"))
      .withColumn("shard", expr(Hash60.sql("digest") + s" % $nShards"))
      .withColumn("chk", expr(Hash60.sql("digest") + " % 1000000007"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"),
        (sum(col("chk").cast("decimal(38,0)")) % 1000000007L)
          .cast("long").as("checksum"))
      .orderBy("shard")
  }

  /** Train/eval split n-gram contamination audit — the overlap
    * report a training-data release publishes next to its benchmark
    * claims: [[leakageSplit]] guarantees no EXACT duplicate spans the
    * boundary (same digest ⇒ same side), but near-duplicates and
    * shared boilerplate still leak signal, so every eval doc is
    * scored by the fraction of its distinct word-trigrams that occur
    * ANYWHERE in the train side. A high-overlap eval doc is
    * contaminated eval data and must be dropped before the split
    * ships (the train/test-overlap analysis of GPT-3 appendix C /
    * the Dolma decontamination audit, as one relational pass).
    *
    * Scale: postings stage once (localCheckpoint); the split column
    * joins on the postings' existing doc_id hash partitioning (only
    * the thin projection shuffles); the train trigram set and the
    * eval overlap count are one distinct + one left-semi equi-join
    * on the shingle hash — the same high-cardinality-key shapes as
    * the dedup family, never a pair join. */
  def splitContamination(spark: SparkSession, dir: String): DataFrame = {
    val split = leakageSplit(spark, dir).select("doc_id", "split")
    val post = Dedup.shinglePostings(spark, dir)
      .join(split, "doc_id")
      .localCheckpoint()
    val trainH = post.filter(col("split") === "train").select("h").distinct()
    val evalPost = post.filter(col("split") === "eval")
    val hits = evalPost.join(trainH, Seq("h"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    evalPost.groupBy("doc_id").agg(max("n_sh").as("n_sh"))
      .join(hits, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_overlap"))
      .withColumn("overlap_frac",
        col("n_overlap").cast("double") / col("n_sh").cast("double"))
      .select("doc_id", "n_sh", "n_overlap", "overlap_frac")
      .orderBy("doc_id")
  }

  /** SEMANTIC train/eval contamination audit — the embedding-level
    * twin of [[splitContamination]], and the leak class SemDeDup-era
    * curation actually hunts: a PARAPHRASE of an eval document sits
    * in train with a different digest (so [[leakageSplit]]'s
    * digest keying cannot co-locate it) and possibly near-zero
    * n-gram overlap (so the shingle audit under-reports it), but its
    * EMBEDDING is a near-duplicate. Candidates come from the staged
    * banded-LSH near-dup relation (dedup_embedding_cosine's 16×8
    * hashed bands + exact-cosine verify at ≥0.4 — never all-pairs),
    * joined against the digest-keyed split on both endpoints; every
    * eval doc with a verified train-side neighbor is reported with
    * its neighbor count and max cosine (micro-quantized: both
    * engines floor the same IEEE double). Scale shape: the pair
    * relation is the already-staged near-dup graph (tiny vs corpus);
    * two id-keyed joins and one small groupBy — nothing rescans the
    * corpus. Reading the audit: a nonzero row here after the digest
    * and n-gram gates pass is exactly the signal to re-split or drop
    * the eval doc. Reference ethos: the reference's scanner dedups
    * at VALUE granularity (dict codes) because byte equality is too
    * coarse — this is the same lesson at corpus granularity. */
  def semanticContamination(spark: SparkSession, dir: String): DataFrame =
    semanticContaminationOn(
      Dedup.stagedEmbeddingCosine(spark, dir).select("vec_a", "vec_b", "cosine"),
      leakageSplit(spark, dir).select("doc_id", "split"))

  /** generic core: `pairs` (vec_a, vec_b, cosine — verified near-dup
    * pairs over doc ids), `split` (doc_id, split ∈ train|eval). */
  private[graft] def semanticContaminationOn(pairs: DataFrame,
      split: DataFrame): DataFrame = {
    val sym = pairs
      .select(col("vec_a").as("doc_id"), col("vec_b").as("nbr"), col("cosine"))
      .unionByName(pairs
        .select(col("vec_b").as("doc_id"), col("vec_a").as("nbr"), col("cosine")))
    sym
      .join(split, "doc_id")
      .filter(col("split") === "eval")
      .join(split.select(col("doc_id").as("nbr"), col("split").as("nbr_split")),
        "nbr")
      .filter(col("nbr_split") === "train")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_train_neighbors"),
        max(floor(col("cosine") * lit(1e6)).cast("long")).as("max_cosine_micro"))
      .orderBy("doc_id")
  }

  /** Dataset card — the per-release summary table a corpus ships
    * with (per-language rows + the grand total via ROLLUP): doc and
    * distinct-source counts, token mass, exact-duplicate pressure,
    * and mean normalized length. One pass: a digest count-window
    * marks dup membership (high-cardinality key — scales like every
    * digest window here), then a single ROLLUP agg; the Expand the
    * rollup plans doubles rows BEFORE the map-side partial combine,
    * so the shuffle stays ≤ 2·|langs| rows no matter the corpus
    * size. All stats are exact integer sums (the mean is one final
    * double division), so the card replays exactly in the oracle. */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("digest")
    documents(spark, dir)
      .withColumn("norm", expr(normTextExpr))
      .select(col("doc_id"), col("lang"), col("source"),
        md5(col("norm")).as("digest"),
        size(split(col("norm"), " ")).cast("bigint").as("n_tokens"),
        length(col("norm")).cast("bigint").as("n_chars_norm"))
      .withColumn("dup",
        when(count(lit(1)).over(w) > 1, 1L).otherwise(0L))
      .rollup("lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("source").as("n_sources"),
        sum("n_tokens").as("total_tokens"),
        sum("dup").as("dup_docs"),
        (sum("n_chars_norm").cast("double") / count(lit(1))).as("avg_chars"))
      .withColumn("lang", coalesce(col("lang"), lit("TOTAL")))
      .select("lang", "n_docs", "n_sources", "total_tokens", "dup_docs", "avg_chars")
      .orderBy("lang")
  }

  /** Per-language winsorized length statistics — the outlier-capping
    * policy a curation pipeline applies before length-sensitive
    * decisions (mixture weights, packing bins, mean-length gates):
    * clamp each doc's length into its language's exact [p05, p95]
    * band and account for what the clamp did. Two passes, both
    * scale-safe: an exact-percentile agg per language (a handful of
    * groups; the exact form is the calibration tool — the serving
    * path would use the sketch, see agg_approx_stats), broadcast of
    * the tiny (lang, p05, p95) table back over the corpus, and one
    * conditional hash agg. Float discipline for the oracle: the
    * winsorized mass is assembled as exact-integer interior mass plus
    * the two clamp products (count × boundary) in a fixed
    * left-to-right add order, so the one double expression is
    * engine-bitwise; both engines interpolate percentiles as
    * lower + d·(upper−lower) over integer lengths. */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir).select("lang", "n_chars")
    val bands = docs.groupBy("lang")
      .agg(expr("percentile(n_chars, 0.05)").as("p05"),
        expr("percentile(n_chars, 0.95)").as("p95"))
    docs.join(broadcast(bands), "lang")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_chars") < col("p05"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("n_chars") > col("p95"), 1L).otherwise(0L)).as("n_high"),
        sum(when(col("n_chars") >= col("p05") && col("n_chars") <= col("p95"),
          col("n_chars")).otherwise(0L)).as("interior_mass"),
        min("p05").as("p05"), min("p95").as("p95"))
      .withColumn("sum_winsorized",
        col("interior_mass").cast("double") +
          col("n_low").cast("double") * col("p05") +
          col("n_high").cast("double") * col("p95"))
      .select("lang", "n_docs", "n_low", "n_high", "interior_mass",
        "p05", "p95", "sum_winsorized")
      .orderBy("lang")
  }

  /** Declarative data-quality audit (the Deequ/expectation-suite
    * shape): EIGHT constraint checks — range, domain, non-null,
    * positivity, date-window, and one deliberately-tight SLA — over
    * the fact table in ONE scan. Every check is a conditional-sum
    * column of a single aggregate (map-side combined, no per-check
    * pass), then the 1-row result unpivots to a (check, violations)
    * scorecard via stack — the constant-size relation a pipeline
    * gates a release on. At 100 TB this is the audit you run INSIDE
    * the ingest pass for free: one scan, one 1-row shuffle,
    * violation ppm exact by integer division. The tight
    * discount ≤ 0.05 SLA is expected to fail (viol_ppm > 0) so the
    * scorecard demonstrably distinguishes passing from failing
    * constraints (a quality gate that can only say PASS measures
    * nothing). Reference analog: the scanner's row-level conjunct
    * evaluation (/root/reference/hdfs-parquet-scanner.h:1) — here
    * the conjuncts become audit counters instead of filters. */
  def dataQuality(spark: SparkSession, dir: String): DataFrame =
    dataQualityOn(lineitem(spark, dir), Seq(
      "quantity_range" -> (col("l_quantity") < 1.0 || col("l_quantity") > 50.0),
      "discount_range" -> (col("l_discount") < 0.0 || col("l_discount") > 0.10),
      "discount_sla" -> (col("l_discount") > 0.05),
      "returnflag_domain" -> !col("l_returnflag").isin("R", "A", "N"),
      "linestatus_domain" -> !col("l_linestatus").isin("O", "F"),
      "price_positive" -> (col("l_extendedprice") <= 0.0),
      "keys_nonnull" -> (col("l_orderkey").isNull || col("l_partkey").isNull ||
        col("l_suppkey").isNull),
      "shipdate_window" -> (to_date(col("l_shipdate")) < lit("1992-01-01") ||
        to_date(col("l_shipdate")) > lit("1998-12-31"))))

  /** Deterministic NEGATIVE SAMPLING for contrastive training pairs —
    * per anchor, k pseudo-random negatives drawn from the whole
    * corpus WITHOUT a per-anchor corpus scan. The naive form (rank
    * all candidates per anchor) is an |anchors|×|corpus| cross join;
    * the scale-correct form here is bucket-draw: candidates land in B
    * hash buckets once, each (anchor, slot) probes ONE
    * slot-keyed pseudo-random bucket, and the draw inside the bucket
    * is the argmin of a per-(anchor, slot, candidate) hash — so work
    * per anchor is k·(corpus/B) rows through one equi-join +
    * map-side-combined min_by, and the sample is a pure md5 function
    * of the ids: reproducible across runs, engines, partitionings
    * (the property a training-data release needs — re-generating the
    * pairs file must not silently reshuffle negatives). Self-pairs
    * are excluded in the join; at corpus scale a deployment also
    * anti-joins the near-dup component closure so a duplicate of the
    * anchor can't be drawn as its negative (the relation
    * dedup_components already ships).
    *
    * Sizing rule (the knob that carries 100 TB): B must GROW with the
    * corpus so the bucket SIZE stays a constant (≈32-1000 rows) — the
    * per-anchor work is k·(corpus/B), so a fixed small B would turn
    * the bucket join back into a near-cross-join at scale, while
    * B ∝ corpus keeps it k·O(1) per anchor and the join key NDV high
    * enough that no bucket is a hot key. An empty probed bucket drops
    * that slot row deterministically on both engines — bucket size
    * ≥32 makes that probability negligible. */
  def negativeSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir).select(col("doc_id"))
    // test-scale sizing: 500-5000 docs / 16 buckets ≈ 31-312 per bucket
    negativeSampleOn(docs, docs.filter(col("doc_id") % 10 === 0),
      buckets = 16L, k = 4)
      .orderBy("doc_id", "slot")
  }

  /** Generic core of [[negativeSample]]: draw `k` deterministic
    * negatives per anchor from `pool` (both single-column id
    * relations named doc_id). Set `buckets` ≈ |pool| / 64. */
  def negativeSampleOn(pool: DataFrame, anchors: DataFrame,
      buckets: Long, k: Int): DataFrame = {
    require(buckets >= 1 && k >= 1, s"bad sizing: $buckets/$k")
    val cands = pool.select(col("doc_id").as("cand_id"))
      .withColumn("bkt",
        expr(Hash60.sql("concat('nsb_', cand_id)") + s" % $buckets"))
    val probes = anchors.select(col("doc_id"))
      .withColumn("slot", explode(typedlit((0 until k).map(_.toLong))))
      .withColumn("bkt",
        expr(Hash60.sql("concat('nsp_', doc_id, '_', slot)") + s" % $buckets"))
    probes.join(cands, Seq("bkt"))
      .filter(col("cand_id") =!= col("doc_id"))
      .withColumn("r",
        expr(Hash60.sql("concat('nsr_', doc_id, '_', slot, '_', cand_id)")))
      .groupBy("doc_id", "slot")
      .agg(min(struct(col("r"), col("cand_id"))).as("m"))
      .select(col("doc_id"), col("slot"),
        col("m.cand_id").as("neg_id"), col("m.r").as("draw_rank"))
  }

  /** Per-source QUANTILE NORMALIZATION of document length — the
    * cross-source comparability transform a mixture-weighting or
    * curriculum pass runs before comparing raw per-doc statistics
    * across heterogeneous sources (a "long" web page and a "long"
    * wiki article sit at very different raw lengths but the same
    * within-source percentile). Scale shape (the [[Analytic.valueCdf]]
    * discipline): the corpus NEVER rides a per-source window — a
    * window partitioned by the handful of source keys would put a
    * whole source's docs in one task's sort. Instead the CDF is
    * computed on the COMPRESSED (source, n_chars) value domain (per
    * value counts → one running sum over the domain-bounded relation)
    * and equi-joined back to the docs. percent_rank's exact
    * (rank−1)/(n−1) lower-tie ratio survives as an integer-ppm
    * (floor) plus the cume_dist double — both pure functions of
    * exact integer counts, engine-identical. */
  def quantileNorm(spark: SparkSession, dir: String): DataFrame =
    quantileNormOn(documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars").cast("bigint").as("v")))
      .orderBy("doc_id")

  /** Generic core of [[quantileNorm]]: exact within-group percentile
    * position of `v` over any (doc_id, source, v) relation.
    * `pct_ppm` = ⌊10⁶·(#rows in the same source with strictly smaller
    * v)/(n−1)⌋ (the percent_rank convention; 0 for singleton groups),
    * `cd` = count(≤v)/n (cume_dist). */
  def quantileNormOn(rows: DataFrame): DataFrame = {
    val counts = rows.groupBy("source", "v").agg(count(lit(1)).as("c"))
    // domain-bounded window: one row per distinct (source, v), never per doc
    val byV = Window.partitionBy("source").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("cum_le", sum("c").over(byV))
      .withColumn("cum_lt", col("cum_le") - col("c"))
    val tot = rows.groupBy("source").agg(count(lit(1)).as("n"))
    rows.join(cum, Seq("source", "v"))
      .join(broadcast(tot), "source")
      .select(col("doc_id"), col("source"), col("v").as("n_chars"),
        when(col("n") > 1L, expr("cum_lt * 1000000 div (n - 1)"))
          .otherwise(0L).as("pct_ppm"),
        (col("cum_le").cast("double") / col("n").cast("double")).as("cd"))
  }

  /** CHRONOLOGICAL train/validation split + boundary-leakage audit —
    * the time-series discipline [[leakageSplit]]'s digest split
    * cannot provide: a forecasting/behavior model must validate on
    * data STRICTLY AFTER everything it trained on, and the audit
    * that matters is how many USERS span the boundary (a user-level
    * feature model leaks target signal through them). The cutoff is
    * data-derived (last ~20 % of active days = validation; exact
    * integer quantile over the day domain) so the same contract
    * holds at any sf. One-row scorecard: cutoff, sizes, user
    * populations, spanning users, spanning ppm. Scale: one
    * (user, day)-grain collapse, two conditional distincts, zero
    * windows. */
  def timeSplit(spark: SparkSession, dir: String): DataFrame = {
    val ud = events(spark, dir)
      .select(col("user_id"), expr("ts div 1000000000 div 86400").as("day"))
      .groupBy("user_id", "day").agg(count(lit(1)).as("n"))
      .localCheckpoint() // consumers: the cutoff bound + the audit agg
    // cutoff = the day at the 80% position of the [min,max] span
    val bound = ud.agg(min("day").as("mn"), max("day").as("mx"))
      .select(expr("mn + (mx - mn) * 4 div 5").as("cutoff"))
    ud.crossJoin(broadcast(bound))
      .withColumn("is_train", col("day") <= col("cutoff"))
      .groupBy("user_id")
      .agg(max("cutoff").as("cutoff_day"),
        sum(when(col("is_train"), col("n")).otherwise(0L)).as("train_ev"),
        sum(when(!col("is_train"), col("n")).otherwise(0L)).as("val_ev"))
      .agg(max("cutoff_day").as("cutoff_day"),
        sum("train_ev").as("n_train_events"),
        sum("val_ev").as("n_val_events"),
        sum(when(col("train_ev") > 0, 1L).otherwise(0L)).as("n_users_train"),
        sum(when(col("val_ev") > 0, 1L).otherwise(0L)).as("n_users_val"),
        sum(when(col("train_ev") > 0 && col("val_ev") > 0, 1L).otherwise(0L))
          .as("n_spanning"),
        count(lit(1)).as("n_users"))
      .withColumn("spanning_ppm", expr("n_spanning * 1000000 div n_users"))
  }

  /** Inter-rater agreement (Cohen's κ) between two quality GATES —
    * the evaluation-methodology readout a curation team computes
    * before trusting either filter: raw agreement alone is inflated
    * by class imbalance (two gates that keep almost everything
    * "agree" by accident), κ subtracts the chance-agreement floor.
    * Raters here are the repo's two real gates — the Gopher
    * heuristic rules and the hashed-linear model filter — joined on
    * doc_id. Exactness: κ = (n·(a+d) − [(a+b)(a+c)+(c+d)(b+d)]) /
    * (n² − [...]) as DECIMAL(38,0) numerator/denominator
    * (n² overflows a long at 10¹⁰-doc scale), string-rendered plus
    * ONE fixed-order double division. Scale: two gate passes + one
    * doc-keyed join collapse to a single 4-cell contingency row. */
  def raterKappa(spark: SparkSession, dir: String): DataFrame =
    raterKappaOn(
      TextAnalysis.gopherRules(spark, dir).select(col("doc_id"), col("keep").as("ka")),
      TextAnalysis.modelFilter(spark, dir).select(col("doc_id"), col("keep").as("kb")))

  /** Generic core of [[raterKappa]] over any two (doc_id, flag)
    * relations (inner-joined on doc_id). */
  def raterKappaOn(a: DataFrame, b: DataFrame): DataFrame = {
    val D0 = "DECIMAL(38,0)"
    a.join(b, "doc_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("ka") && col("kb"), 1L).otherwise(0L)).as("both_keep"),
        sum(when(col("ka") && !col("kb"), 1L).otherwise(0L)).as("only_a"),
        sum(when(!col("ka") && col("kb"), 1L).otherwise(0L)).as("only_b"),
        sum(when(!col("ka") && !col("kb"), 1L).otherwise(0L)).as("both_drop"))
      .withColumn("pe_num", expr(
        s"""CAST(both_keep + only_a AS $D0) * (both_keep + only_b)
           | + CAST(only_b + both_drop AS $D0) * (only_a + both_drop)"""
          .stripMargin.replace("\n", " ")))
      .select(col("n"), col("both_keep"), col("only_a"), col("only_b"),
        col("both_drop"),
        expr(s"CAST(CAST(n AS $D0) * (both_keep + both_drop) - pe_num AS $D0)")
          .cast("string").as("kappa_num_str"),
        expr(s"CAST(CAST(n AS $D0) * n - pe_num AS $D0)")
          .cast("string").as("kappa_den_str"),
        expr(s"""CAST(CAST(n AS $D0) * (both_keep + both_drop) - pe_num AS DOUBLE)
           | / CAST(CAST(n AS $D0) * n - pe_num AS DOUBLE)"""
          .stripMargin.replace("\n", " ")).as("kappa"))
  }

  /** Deterministic CLASS REBALANCING by repetition — the minority-
    * oversampling materialization a training pipeline runs before a
    * class-sensitive pass (language balancing, domain balancing):
    * every class is repeated up to the majority class's volume with a
    * per-CLASS scalar factor ⌈target/n_c⌉ (the per-source repetition
    * convention of data-mixing recipes — never a per-doc random draw,
    * so the output is a pure function of the input), overshoot
    * bounded by one extra epoch of the class. Each emitted copy
    * carries a [[Hash60]] salt of (doc_id, copy_id) — the
    * deterministic shuffle key that interleaves copies downstream
    * instead of leaving epochs clustered. Scale: class factors are a
    * |classes|-row broadcast; the explode multiplies only minority
    * rows (majority factor is 1), no shuffle at all — the output
    * inherits the input's partitioning. */
  def rebalance(spark: SparkSession, dir: String): DataFrame =
    rebalanceOn(documents(spark, dir)
      .select(col("doc_id"), col("lang").as("cls")))
      .orderBy("doc_id", "copy_id")

  /** Generic core of [[rebalance]] over any (doc_id, cls) relation. */
  def rebalanceOn(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy("cls").agg(count(lit(1)).as("n_c"))
    val target = counts.agg(max("n_c").as("target"))
    val reps = counts.crossJoin(broadcast(target))
      .select(col("cls"), expr("(target + n_c - 1) div n_c").as("n_copies"))
    docs.join(broadcast(reps), "cls")
      .select(col("doc_id"), col("cls"), col("n_copies"),
        explode(expr("sequence(1L, n_copies)")).as("copy_id"))
      .withColumn("salt", expr(Hash60.sql("concat(doc_id, ':', copy_id)")))
  }

  /** Generic core of [[dataQuality]]: run any (name → violation
    * predicate) suite over any relation in ONE aggregate pass.
    * NULL predicate results count as non-violations (SQL three-valued
    * semantics — write `isNull` checks explicitly when null itself is
    * the defect). */
  def dataQualityOn(df: DataFrame,
      checks: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    require(checks.map(_._1).distinct.size == checks.size,
      "check names must be unique")
    def viol(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
    val a = df.agg(count(lit(1)).as("n_rows"),
      checks.map { case (n, c) => viol(c).as(s"v_$n") }: _*)
    val stackArgs = checks
      .map { case (n, _) => s"'$n', v_$n" }.mkString(", ")
    a.select(col("n_rows"), expr(
      s"stack(${checks.size}, $stackArgs) as (check_name, n_violations)"))
      .select(col("check_name"), col("n_rows"), col("n_violations"),
        expr("n_violations * 1000000L div n_rows").as("viol_ppm"),
        (col("n_violations") === 0L).as("pass"))
      .orderBy("check_name")
  }

  /** Duplicate-aware SAMPLING WEIGHTS — the SOFT-dedup alternative to
    * dropping copies (the RefinedWeb/SlimPajama-class decision: keep
    * every document but downweight duplicated content so k copies of
    * a page contribute ~one page of gradient): per doc, its EXACT-dup
    * group size (normalized-digest groups — the hard multiplicity),
    * its NEAR-dup component size (the staged Jaccard closure;
    * singletons count 1), the hard weight 10⁶ div n_copies (k exact
    * copies sum to ≈ one document of sampling mass), and the soft
    * weight 10⁶ div ⌊√component_size⌋ (near-dups are related, not
    * identical — the standard sqrt compromise keeps some extra mass
    * for genuinely popular content instead of flattening it to one).
    * Engine-exactness: both weights are BIGINT floor divisions;
    * ⌊√k⌋ is exact in both engines (small-int sqrt is correctly
    * rounded IEEE). Scale: the digest groups are a map-side-combined
    * hash agg + join-back (never a window over the hot empty-page
    * digest), and the component closure is the SAME staged relation
    * the dedup stack already pays for — this row adds two joins. */
  def dedupWeights(spark: SparkSession, dir: String): DataFrame = {
    val exact = Dedup.exactOn(documents(spark, dir))
      .select(col("doc_id"), col("group_size").as("n_copies"))
    val comp = Dedup.stagedComponents(spark, dir)
      .select(col("doc_id"), col("component_size"))
    exact.join(comp, Seq("doc_id"), "left")
      .withColumn("near_dup_size", coalesce(col("component_size"), lit(1L)))
      .select(col("doc_id"), col("n_copies"), col("near_dup_size"),
        expr("1000000L DIV n_copies").as("hard_weight_ppm"),
        expr("1000000L DIV CAST(floor(sqrt(CAST(near_dup_size AS DOUBLE))) AS BIGINT)")
          .as("soft_weight_ppm"))
      .orderBy("doc_id")
  }
}
