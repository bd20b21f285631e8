package graft

/** Converts the "identical plan at any sf" scale claim into measured
  * evidence: across the 100× row span from sf0.001 to sf0.1, steady
  * query time must grow far SLOWER than the data (fixed per-query
  * overhead dominates at these sizes; a healthy distributed plan is
  * at worst linear). A super-linear curve — time ratio exceeding the
  * 100× data ratio — would expose a hidden driver-side loop or
  * quadratic join, which is exactly the regression this guards
  * against. The bound is generous (50× = half the data growth) so
  * host noise cannot flake the suite while a genuinely quadratic
  * plan (≫100×) still fails loudly. */
class ScaleTrendSpec extends SparkSpec {

  private val small = "/root/testdata/sf0.001"
  private val large = "/root/testdata/sf0.1"

  private def steady(name: String, dir: String): Double = {
    val fn = SparkEntry.queries(name)
    def run(): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm codegen/broadcast for this (query, sf)
    math.min(run(), run())
  }

  // q6/q1: scan+agg staples; pii_redact: the map-only text path;
  // minhash: the native-aggregate signature pipeline; token_budget:
  // the range-sharded two-level prefix sum (its partition count must
  // GROW with the data — a lang-only window would trend linear here)
  // ann_pq_topk: the native PQ encode + ADC scoring pass (guards
  // against a codegen-fallback regression, which measured ~2.6×);
  // ev_scd2_intervals: the per-user lead-window shape
  // dedup_containment: the posting-join pair generator under the
  // containment score (quadratic only if boilerplate shingles were
  // unbounded — the df-cap story); ev_pattern_match: the per-user
  // sequence fold (linear in events, bounded per-user state)
  // dedup_repeated_spans: the token-mass positional-shingle path
  // (corpus-count window + per-doc islands — the heaviest new shape);
  // ann_refine_topk: the quantized-scan + rerank two-stage plan
  // ev_asof_native: the custom AsOfJoinExec merge (quadratic only if
  // the per-key candidate state leaked into a cross product);
  // vocab_bpe_merges: the iterative compressed-vocab loop (its rounds
  // must stay vocabulary-sized as the corpus grows);
  // mm_image_ahash: the pigeonhole-blocked signature pair path
  // emb_knn_classify: the leave-one-out vote path whose topk/pred
  // relations grow with |probes|·k (AQE decides their join sides)
  // ev_value_cdf: the compressed-domain CDF join-back (its window
  // must stay value-domain-bounded, never corpus-bounded)
  // graph_triangles: the degree-ordered wedge join (O(E^1.5) by the
  // orientation — a hub-degree regression would trend quadratic);
  // emb_pca_power: two matrix-free passes over the long (vec, d, q)
  // layout (quadratic only if the d×d Gram ever materialized);
  // mm_image_phash: the separable-DCT join+agg chain + pigeonhole
  // text_source_drift: the counts⋈counts term join (quadratic only
  // if the absent-term mass ever materialized the source×vocab grid);
  // ev_concurrency: the two-level sweep (its unpartitioned window
  // must stay |days|-bounded, never minute- or corpus-bounded)
  // dedup_prefix_filter: the rare-first prefix join (quadratic only
  // if candidates regressed to all shingle collisions);
  // dedup_cdc_chunks: the per-character boundary fan-out (parallelism
  // must come from the pinned repartition, not input splits);
  // ev_attribution_removal: corpus touched exactly twice, the whole
  // value iteration domain-bounded in one projection;
  // agg_kmv_setops: bounded-heap k-minima + the pairwise-type exact
  // ground truth (fanout C(|types|,2) per user, never a cross join)
  for (name <- Seq("q6_forecast_revenue", "q1_pricing_summary",
      "text_pii_redact", "dedup_minhash_lsh", "pipeline_token_budget",
      "ann_pq_topk", "ev_scd2_intervals", "dedup_containment",
      "ev_pattern_match", "dedup_repeated_spans", "ann_refine_topk",
      "ev_asof_native", "vocab_bpe_merges", "mm_image_ahash",
      "emb_knn_classify", "ev_value_cdf",
      "graph_triangles", "emb_pca_power", "mm_image_phash",
      "text_source_drift", "ev_concurrency",
      "dedup_prefix_filter", "dedup_cdc_chunks",
      "ev_attribution_removal", "agg_kmv_setops")) {
    test(s"$name scales sub-linearly over the 100x sf0.001->sf0.1 span") {
      assume(new java.io.File(large).isDirectory)
      val tSmall = steady(name, small)
      val tLarge = steady(name, large)
      info(f"$name: sf0.001 $tSmall%.3f s -> sf0.1 $tLarge%.3f s (ratio ${tLarge / tSmall}%.1f x over 100x rows)")
      assert(tLarge < tSmall * 50,
        f"super-linear growth: $tSmall%.3f s -> $tLarge%.3f s over 100x data")
    }
  }
}
