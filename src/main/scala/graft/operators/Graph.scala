package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over derived pair relations.
  *
  * The dedup stack already treats the near-dup pair set as a graph
  * (connected components → [[Dedup.components]]); triangle counting
  * is the next structural signal a curation pipeline reads off that
  * graph: a component whose nodes close many triangles is a true
  * duplicate CLUSTER (every copy pairwise-similar — safe to collapse
  * to one representative), while a component that is a long
  * triangle-free chain is pairwise drift (A~B~C but A≁C — collapsing
  * it to one doc throws away non-duplicate text). Local triangle
  * count / degree is exactly the local clustering coefficient that
  * distinguishes the two.
  *
  * Scale design (100 TB): the classic degree-ordered algorithm
  * (Schank–Wagner ordering, the shape every distributed triangle
  * count uses). Edges are oriented from the lower-(degree, id)
  * endpoint to the higher, which caps every node's OUT-degree at
  * O(√E) regardless of how hot a hub is — the wedge self-join on the
  * low endpoint then does O(E^{3/2}) work worst-case instead of the
  * Σdeg² a naive neighbor join pays on a power-law graph. Both
  * degree computation and the per-node rollup are hash aggregates
  * (map-side combined, AQE-splittable); no windows, no driver
  * collection, no cross join anywhere.
  */
object Graph {

  /** Normalized undirected simple edge set (a < b, no self-loops, no
    * duplicates), node degrees, and the triangle list (one row per
    * triangle, corners u/v/w in low-to-high degree-rank order) — the
    * shared core behind [[trianglesOn]] and [[edgeSimilarityOn]]. */
  private def triangleCore(edges: DataFrame, src: String, dst: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val e = edges
      .select(least(col(src), col(dst)).as("a"),
        greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()

    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))

    // Orient each edge from the lower (deg, id) endpoint to the
    // higher; carry the destination's rank so wedge formation can
    // order the two out-neighbors without re-joining degrees.
    val withDeg = e
      .join(deg.select(col("node").as("a"), col("deg").as("deg_a")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("deg_b")), Seq("b"))
    val aLow = struct(col("deg_a"), col("a")) < struct(col("deg_b"), col("b"))
    // three consumers (both wedge sides + the closing-edge probe)
    // would each re-run the degree joins: pin the oriented edge list
    val oriented = withDeg.select(
      when(aLow, col("a")).otherwise(col("b")).as("u"),
      when(aLow, col("b")).otherwise(col("a")).as("v"),
      when(aLow, struct(col("deg_b").as("d"), col("b").as("n")))
        .otherwise(struct(col("deg_a").as("d"), col("a").as("n"))).as("rv"))
      .localCheckpoint()

    // Wedges at the lowest-rank corner u: unordered out-neighbor
    // pairs {v, w} with rank(v) < rank(w); the closing edge, if it
    // exists, is oriented v → w by construction.
    val x = oriented.select(col("u"), col("v").as("v"), col("rv").as("rkv"))
    val y = oriented.select(col("u"), col("v").as("w"), col("rv").as("rkw"))
    val wedges = x.join(y, Seq("u")).filter(col("rkv") < col("rkw"))
      .select("u", "v", "w")
    val closing = oriented.select(col("u").as("v"), col("v").as("w"))
    val tris = wedges.join(closing, Seq("v", "w"), "leftsemi")
    (e, deg, tris)
  }

  /** Per-node triangle participation over an undirected simple graph
    * given as a pair relation. Returns (node, degree, n_tri) for
    * every node with at least one incident edge; each triangle
    * increments all three of its corners. Self-loops are dropped and
    * parallel/reversed duplicate edges collapse to one undirected
    * edge, so the result is a pure function of the edge SET. */
  def trianglesOn(edges: DataFrame, src: String, dst: String): DataFrame = {
    val (e, deg, tris) = triangleCore(edges, src, dst)

    val perNode = tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))

    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  /** EDGE-level structural similarity: for every undirected edge
    * (a, b), the common-neighbor count |N(a)∩N(b)| (= triangles
    * through the edge) and the exact integer neighborhood Jaccard
    *   jacc_micro = 10⁶·common div (deg_a + deg_b − common).
    * This is the per-PAIR refinement of the per-node clustering
    * signal [[trianglesOn]] reads: a near-dup edge whose endpoints
    * share most of their neighbors is interior to a duplicate clique
    * (collapse-safe); an edge with zero common neighbors is a
    * BRIDGE between drift regions — exactly the edges to cut before
    * collapsing components, turning chain-merged clusters back into
    * tight ones. Integer floor division keeps the score a pure
    * function of the edge set (engine- and order-independent); the
    * denominator is ≥ 2 because each endpoint is in the union.
    *
    * Scale shape: the SAME degree-ordered wedge join as the triangle
    * count (O(E^{3/2}) worst case), one explode of the triangle list
    * to its three edges, one map-side-combined count, two degree
    * joins on the edge list — no windows, no all-pairs. */
  def edgeSimilarityOn(edges: DataFrame, src: String, dst: String): DataFrame = {
    val (e, deg, tris) = triangleCore(edges, src, dst)

    // each triangle contributes one common neighbor to each of its
    // three edges; corners are rank-oriented, so normalize to a < b
    val edgeTris = tris.select(explode(array(
        struct(least(col("u"), col("v")).as("a"),
          greatest(col("u"), col("v")).as("b")),
        struct(least(col("u"), col("w")).as("a"),
          greatest(col("u"), col("w")).as("b")),
        struct(least(col("v"), col("w")).as("a"),
          greatest(col("v"), col("w")).as("b")))).as("ed"))
      .select(col("ed.a").as("a"), col("ed.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))

    e.join(deg.select(col("node").as("a"), col("deg").as("deg_a")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("deg_b")), Seq("b"))
      .join(edgeTris, Seq("a", "b"), "left")
      .select(col("a"), col("b"), col("deg_a"), col("deg_b"),
        coalesce(col("common"), lit(0L)).as("common"))
      .withColumn("jacc_micro",
        expr("(1000000L * common) div (deg_a + deg_b - common)"))
  }

  /** Driver query: common-neighbor / neighborhood-Jaccard score of
    * every edge in the near-dup graph (same staged pair relation as
    * triangles/pagerank/kcore) — the bridge-vs-interior split that
    * decides which near-dup pairs are safe to collapse through. */
  def dedupEdgeSim(spark: SparkSession, dir: String): DataFrame =
    edgeSimilarityOn(Dedup.jaccardPairs(spark, dir), "doc_a", "doc_b")
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        col("deg_a"), col("deg_b"), col("common"), col("jacc_micro"))
      .orderBy("doc_a", "doc_b")

  /** Driver query: triangle participation of every document in the
    * exact 3-gram Jaccard ≥ 0.8 near-dup graph (the SAME staged pair
    * relation that feeds dedup_ngram_jaccard / components /
    * keep-best — no additional posting join). n_tri close to
    * C(deg, 2) ⇒ the doc sits in a clique-like duplicate cluster;
    * n_tri = 0 with deg ≥ 2 ⇒ pairwise chain drift. */
  def dedupTriangles(spark: SparkSession, dir: String): DataFrame =
    trianglesOn(Dedup.jaccardPairs(spark, dir), "doc_a", "doc_b")
      .withColumnRenamed("node", "doc_id")
      .orderBy("doc_id")

  /** Per-node LOCAL CLUSTERING COEFFICIENT in exact integer micro:
    *   coeff_micro = (2·10⁶·n_tri) div (deg·(deg−1))   for deg ≥ 2
    * (0 for degree-1 nodes — no possible neighbor pair). This is the
    * normalized readout of [[trianglesOn]]: 10⁶ means every neighbor
    * pair is itself connected (the node is interior to a clique),
    * 0 means a pure star/chain hub. Floor division keeps the score a
    * pure integer function of the edge set — identical on any
    * engine and any partitioning, unlike a float ratio whose last
    * ulp depends on the division order. Same cost as the triangle
    * count: the coefficient is one projected column on top of it. */
  def clusteringCoeffOn(edges: DataFrame, src: String, dst: String): DataFrame =
    trianglesOn(edges, src, dst)
      .withColumn("coeff_micro",
        when(col("deg") >= 2,
          expr("(2000000L * n_tri) div (deg * (deg - 1L))"))
          .otherwise(lit(0L)))

  /** Driver query: clustering coefficient of every document in the
    * near-dup graph — the per-node collapse-safety score (the node
    * form of [[dedupEdgeSim]]'s per-edge split): coefficient ≈ 10⁶ ⇒
    * the doc's whole neighborhood is one duplicate clique, collapse
    * freely; low coefficient with high degree ⇒ the doc chains
    * unrelated near-dup regions and needs edge-level inspection. */
  def dedupClusterCoeff(spark: SparkSession, dir: String): DataFrame =
    clusteringCoeffOn(Dedup.jaccardPairs(spark, dir), "doc_a", "doc_b")
      .withColumnRenamed("node", "doc_id")
      .orderBy("doc_id")

  /** PageRank over an undirected simple graph, in EXACT integer
    * arithmetic: ranks are carried in millionths (pr_micro, starting
    * at 10⁶ div N) and every update is a floor division —
    *   pr'(v) = (0.15·10⁶ div N) + (85 · Σ_{u~v} (pr(u) div deg(u))) div 100
    * — so the result is a pure integer function of the edge set, the
    * same on any engine and any partitioning (float PageRank differs
    * in the last ulps with summation order; an oracle gate and a
    * cross-run diff both need the deterministic form). Undirected ⇒
    * every node has in-degree ≥ 1, so there is no dangling-mass term.
    *
    * Scale shape: the canonical Pregel/Spark iterative workload —
    * per iteration ONE shuffle join (ranks ⋈ edges on the source) and
    * ONE map-side-combined sum by destination; the rank relation is
    * 2 longs per node, degrees computed once. Iterations are a fixed
    * small constant (the analytics signal saturates in a few rounds);
    * at real scale each iteration's output would be checkpointed to
    * truncate lineage, which a 3-round fixed unroll does not need. */
  def pageRankOn(edges: DataFrame, src: String, dst: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters out of range: $iters")
    val e = edges
      .select(least(col(src), col(dst)).as("a"),
        greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val dirE = e.select(col("a").as("u"), col("b").as("v"))
      .unionAll(e.select(col("b").as("u"), col("a").as("v")))
    val deg = dirE.groupBy("u").agg(count(lit(1)).as("deg"))
    val n = broadcast(deg.agg(count(lit(1)).as("n")))

    var pr = deg.crossJoin(n).select(col("u").as("node"), col("deg"),
      col("n"), expr("1000000L div n").as("pr_micro"))
    for (i <- 1 to iters) {
      val contrib = dirE
        .join(pr, dirE("u") === pr("node"))
        .select(col("v").as("node"), expr("pr_micro div deg").as("c"))
      pr = pr.select("node", "deg", "n")
        .join(contrib.groupBy("node").agg(sum("c").as("s")), Seq("node"))
        .select(col("node"), col("deg"), col("n"),
          expr("(150000L div n) + ((85L * s) div 100)").as("pr_micro"))
      // truncate lineage on long runs: each round stacks a join+agg
      // onto the plan, and 10+ unchecked rounds make analysis itself
      // the bottleneck (the kcore lesson); the rank relation is 3
      // longs per node, cheap to pin
      if (i % 4 == 0 && i < iters) pr = pr.localCheckpoint()
    }
    pr.select(col("node"), col("deg"), col("pr_micro"))
  }

  /** Driver query: integer PageRank (3 rounds) of every document in
    * the near-dup graph — the centrality signal that ranks which
    * documents anchor the largest duplication mass (crawl-prioritize
    * or down-weight them first), on the SAME staged pair relation as
    * triangles/components. */
  def dedupPageRank(spark: SparkSession, dir: String): DataFrame =
    pageRankOn(Dedup.jaccardPairs(spark, dir), "doc_a", "doc_b", iters = 3)
      .withColumnRenamed("node", "doc_id")
      .orderBy("doc_id")

  /** Onion-layer k-core peeling: iteratively remove nodes of degree
    * < k; a removed node's `layer` is the round that removed it,
    * survivors form the k-core (`layer` 0) and report their degree
    * WITHIN the core (`core_deg` ≥ k; 0 for peeled nodes). The core/
    * layer split is the graph-cleaning primitive on a near-dup graph:
    * the 2-core is the cyclically-redundant mass (safe to collapse
    * aggressively), layers 1..R are tree-like fringe whose removal
    * order doubles as a skeletonization curve.
    *
    * Scale shape: each round is one hash-agg degree count plus two
    * anti-joins on the node key — all map-side-combinable shuffles on
    * a relation that only SHRINKS; no windows, no driver data. The
    * round count is a fixed unroll (the oracle replays it CTE by
    * CTE), and a `require` on the final degree relation turns
    * non-convergence within `rounds` into a loud error instead of a
    * wrong answer — the same enforced-fixpoint discipline as the
    * component propagation. The check is one count on the bounded
    * degree relation. */
  def kCoreLayersOn(edges: DataFrame, src: String, dst: String,
      k: Int = 2, rounds: Int = 4): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 16,
      s"k/rounds out of range: $k/$rounds")
    val e = edges
      .select(least(col(src), col(dst)).as("a"),
        greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    var dirE = e.select(col("a").as("u"), col("b").as("v"))
      .unionAll(e.select(col("b").as("u"), col("a").as("v")))
    // The alive set must be tracked explicitly: a node whose LAST
    // edge vanishes with a peeled neighbor drops out of the degree
    // relation entirely, and "absent" must read as degree 0 (peel
    // next round), not as survival.
    var alive = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node"))).distinct()

    def degrees: DataFrame = alive.join(
      dirE.groupBy("u").agg(count(lit(1)).as("d"))
        .withColumnRenamed("u", "node"),
      Seq("node"), "left")
      .select(col("node"), coalesce(col("d"), lit(0L)).as("deg"))

    var layers = Seq.empty[DataFrame]
    for (r <- 1 to rounds) {
      // Eager localCheckpoint truncates lineage: the peel set feeds
      // THREE downstream plans per round (alive, and dirE twice), so
      // without a barrier the plan tree grows ~3^rounds and analysis
      // itself becomes the bottleneck. The peel relation is the small
      // side by construction (nodes leaving the graph this round).
      val peel = degrees.filter(col("deg") < k).select("node")
        .localCheckpoint()
      layers = layers :+ peel.select(col("node"),
        lit(r.toLong).as("layer"), lit(0L).as("core_deg"))
      // alive/dirE must ALSO checkpoint: only barriering the peel set
      // leaves round r's degree plan re-executing every prior round's
      // anti-join chain from the raw edges (O(rounds²) edge passes).
      // With all three barriered each round costs one pass over the
      // current (shrinking) relation.
      alive = alive.join(peel, Seq("node"), "left_anti").localCheckpoint()
      dirE = dirE
        .join(peel.withColumnRenamed("node", "u"), Seq("u"), "left_anti")
        .join(peel.withColumnRenamed("node", "v"), Seq("v"), "left_anti")
        .select("u", "v")
        .localCheckpoint()
    }
    val coreDeg = degrees
    require(coreDeg.filter(col("deg") < k).isEmpty,
      s"k-core peeling did not converge within $rounds rounds; raise `rounds`")
    val core = coreDeg.select(col("node"),
      lit(0L).as("layer"), col("deg").as("core_deg"))
    layers.reduce(_ unionAll _).unionAll(core)
  }

  /** Driver query: 2-core onion layers of the near-dup graph (same
    * staged pair relation). */
  def dedupKCore(spark: SparkSession, dir: String): DataFrame =
    kCoreLayersOn(Dedup.jaccardPairs(spark, dir), "doc_a", "doc_b",
      k = 2, rounds = 4)
      .withColumnRenamed("node", "doc_id")
      .orderBy("doc_id")

  /** Connected components over any pair relation: (node, label) with
    * label = the component's minimum node id — the generic entry
    * point for the same enforced-fixpoint min-label propagation the
    * dedup stack runs (one join + one min-agg per round, eagerly
    * checkpointed, loud `require` on cap-out; see
    * [[Dedup.minLabelComponents]] for the full contract). */
  def componentsOn(edges: DataFrame, src: String, dst: String): DataFrame =
    Dedup.minLabelComponents(edges, src, dst)

  /** SYNCHRONOUS label propagation (Raghavan-style LPA) made fully
    * DETERMINISTIC: every node starts labeled with its own id, and
    * each round simultaneously adopts the most frequent label among
    * its NEIGHBORS, ties broken by the smallest label — so the
    * result is a pure function of the edge set and the round count
    * (classic async LPA depends on visit order and coin flips, which
    * no oracle or cross-run diff can gate). Communities are FINER
    * than connected components: a chain of cliques that component
    * propagation merges into one blob splits at sparse cuts, which
    * is exactly the near-dup signal components over-merge
    * ([[edgeSimilarityOn]] scores the cut edges; this labels the
    * sides). Per round: ONE shuffle join (labels ⋈ directed edges)
    * + ONE map-side-combined (node, label) count + ONE argmin-struct
    * agg per node — the same Pregel cost shape as [[pageRankOn]];
    * state is 2 longs per node. Fixed unroll, oracle-replayable. */
  def labelPropOn(edges: DataFrame, src: String, dst: String,
      iters: Int = 2): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters out of range: $iters")
    val e = edges
      .select(least(col(src), col(dst)).as("a"),
        greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val dirE = e.select(col("a").as("u"), col("b").as("v"))
      .unionAll(e.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint() // two consumers per round; pin the edge list
    var lab = dirE.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
    for (i <- 1 to iters) {
      val nb = dirE.join(lab, dirE("v") === lab("node"))
        .select(col("u"), col("label"))
        .groupBy("u", "label").agg(count(lit(1)).as("c"))
      // argmax by (count desc, label asc) as one struct-min agg:
      // no join-back, no window, deterministic
      lab = nb
        .groupBy("u")
        .agg(min(struct((-col("c")).as("nc"), col("label").as("l"))).as("m"))
        .select(col("u").as("node"), col("m.l").as("label"))
      if (i % 4 == 0 && i < iters) lab = lab.localCheckpoint()
    }
    lab
  }

  /** Bounded multi-source BFS: hop distance from the nearest seed
    * node, capped at `rounds` hops (nodes further than the cap are
    * absent from the result — the caller decides the sentinel). Per
    * round: ONE shuffle join (frontier ⋈ directed edges) + ONE
    * map-side-combined min-agg — the same Pregel cost shape as
    * [[pageRankOn]]/[[labelPropOn]]; state is 2 longs per reached
    * node. The round cap is part of the CONTRACT (dist ≤ rounds),
    * not a convergence heuristic, so the result is a pure function
    * of (edge set, seed set, rounds) that an unrolled SQL replay can
    * gate exactly. `seeds` must expose a `node` column. */
  def bfsDistanceOn(edges: DataFrame, src: String, dst: String,
      seeds: DataFrame, rounds: Int): DataFrame = {
    val dirE = edges
      .select(col(src).as("u"), col(dst).as("v"))
      .unionAll(edges.select(col(dst).as("u"), col(src).as("v")))
      .localCheckpoint()
    var dist = seeds.select(col("node"), lit(0L).as("dist")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val next = dist.join(dirE, col("node") === col("u"))
        .select(col("v").as("node"), (col("dist") + 1L).as("dist"))
      dist = dist.unionAll(next)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint()
    }
    dist
  }

  /** Driver query: hop distance of every near-dup graph node from
    * its component's canonical doc (the component's min doc_id —
    * what [[Dedup.components]] elects and keep-best collapses to).
    * Distance 1 = directly similar to the canonical (a true copy);
    * distance ≥ 2 = only transitively merged (the chain-drift docs a
    * curation reviewer re-checks before collapsing); -1 = beyond the
    * 4-hop audit horizon. Reuses the staged component relation, so
    * the only new work is 4 join+min-agg BFS rounds on the staged
    * pair graph. */
  def dedupBfsDistance(spark: SparkSession, dir: String): DataFrame = {
    val comp = Dedup.stagedComponents(spark, dir)
      .select("doc_id", "component_id").localCheckpoint()
    val seeds = comp.select(col("component_id").as("node")).distinct()
    val dist = bfsDistanceOn(Dedup.jaccardPairs(spark, dir),
      "doc_a", "doc_b", seeds, rounds = 4)
    comp.join(dist, col("doc_id") === col("node"), "left")
      .select(col("doc_id"), col("component_id"),
        coalesce(col("dist"), lit(-1L)).as("dist"))
      .orderBy("doc_id")
  }

  /** Newman MODULARITY accounting per community — the "was this
    * clustering better than chance" score that turns
    * [[labelPropOn]]'s communities from a labeling into a judged
    * labeling: Q = Σ_c [e_c/m − (d_c/2m)²]. Each community's
    * contribution is exported as the EXACT integer numerator
    * 4·m·e_c − d_c² over the common denominator 4m² (DECIMAL(38,0) —
    * d_c² overflows a long at 10¹²-edge scale), rendered as a string
    * plus one fixed-order double division; a negative contribution
    * flags a community sparser inside than random — the split a
    * curation pass should not trust. Scale: degrees and intra-edge
    * counts are map-side-combined aggregates over the pair relation;
    * m is a broadcast 1-row count; no window, no pair fan-out beyond
    * the edge list itself. */
  def modularityOn(edges: DataFrame, src: String, dst: String,
      labels: DataFrame): DataFrame = {
    val e = edges.select(col(src).as("a"), col(dst).as("b"))
    val deg = e.select(col("a").as("u")).unionAll(e.select(col("b").as("u")))
      .groupBy("u").agg(count(lit(1)).as("deg"))
    val mRow = e.agg(count(lit(1)).as("m"))
    val la = labels.select(col("node").as("a"), col("label").as("la"))
    val lb = labels.select(col("node").as("b"), col("label").as("lb"))
    val intra = e.join(la, "a").join(lb, "b")
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("label")).agg(count(lit(1)).as("e_in"))
    labels.join(deg, col("node") === col("u"))
      .groupBy("label").agg(count(lit(1)).as("n_members"), sum("deg").as("d_c"))
      .join(intra, Seq("label"), "left")
      .na.fill(0L, Seq("e_in"))
      .crossJoin(broadcast(mRow))
      .withColumn("qn", expr(
        "4 * CAST(m AS DECIMAL(38,0)) * e_in - CAST(d_c AS DECIMAL(38,0)) * d_c"))
      .select(col("label"), col("n_members"), col("e_in"), col("d_c"),
        col("qn").cast("string").as("q_num_str"),
        expr("CAST(qn AS DOUBLE) / CAST(4 * CAST(m AS DECIMAL(38,0)) * m AS DOUBLE)")
          .as("q_contrib"))
  }

  /** Degree ASSORTATIVITY (Newman's r) — do similar-degree nodes
    * attach to each other? Positive r = hub-to-hub duplication
    * (template farms linking templates), negative = hub-and-spoke
    * (one canonical with many leaf copies — the shape safe to
    * collapse). Pearson correlation of the endpoint degrees over the
    * DIRECTED edge list (both orientations, so r is symmetric),
    * computed from exact BIGINT power sums (the agg_corr_exact
    * discipline) with the one sqrt+division at the end — engine-
    * bitwise. Degenerate (regular) graphs yield NULL like the
    * oracle's ÷0. Scale: degrees are one map-side-combined agg, the
    * sums another; no window, no pair fan-out beyond the edges. */
  def assortativityOn(edges: DataFrame, src: String, dst: String): DataFrame = {
    val e = edges.select(col(src).as("a"), col(dst).as("b"))
    val dirE = e.select(col("a").as("u"), col("b").as("v"))
      .unionAll(e.select(col("b").as("u"), col("a").as("v")))
    val deg = dirE.groupBy("u").agg(count(lit(1)).as("deg"))
    dirE
      .join(deg.select(col("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("u").as("v"), col("deg").as("dv")), Seq("v"))
      .agg(count(lit(1)).as("m"),
        sum("du").as("sx"), sum("dv").as("sy"),
        sum(col("du") * col("dv")).as("sxy"),
        sum(col("du") * col("du")).as("sxx"),
        sum(col("dv") * col("dv")).as("syy"))
      .select(col("m"), col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy"),
        when(expr("(m * sxx - sx * sx) > 0 AND (m * syy - sy * sy) > 0"),
          expr("""CAST(m * sxy - sx * sy AS DOUBLE) /
            (sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) *
             sqrt(CAST(m * syy - sy * sy AS DOUBLE)))""".replace("\n", " ")))
          .as("assortativity"))
  }

  /** Driver query: assortativity of the staged near-dup pair graph. */
  def dedupAssortativity(spark: SparkSession, dir: String): DataFrame =
    assortativityOn(Dedup.jaccardPairs(spark, dir), "doc_a", "doc_b")

  /** Driver query: modularity scorecard of the 2-round LPA
    * communities over the staged near-dup pair graph. */
  def dedupModularity(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.jaccardPairs(spark, dir).select("doc_a", "doc_b")
      .localCheckpoint() // consumers: LPA rounds + edge/degree/intra aggs
    val lab = labelPropOn(pairs, "doc_a", "doc_b", iters = 2).localCheckpoint()
    modularityOn(pairs, "doc_a", "doc_b", lab).orderBy("label")
  }

  /** Driver query: 2-round deterministic label-propagation
    * communities of the near-dup graph (same staged pair relation),
    * with each community's member count joined back — the
    * finer-than-components clustering that keeps chain-merged
    * near-dup blobs from collapsing across sparse cuts. */
  def dedupLabelProp(spark: SparkSession, dir: String): DataFrame = {
    // two consumers (the size agg + the join) would each re-run the
    // 2-round propagation chain: pin the final label relation
    val lab = labelPropOn(Dedup.jaccardPairs(spark, dir), "doc_a", "doc_b",
      iters = 2).localCheckpoint()
    lab.join(lab.groupBy("label").agg(count(lit(1)).as("n_members")), "label")
      .select(col("node").as("doc_id"), col("label"), col("n_members"))
      .orderBy("doc_id")
  }
}
