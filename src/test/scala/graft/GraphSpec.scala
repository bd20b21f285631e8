package graft

import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    operators.Graph
      .trianglesOn(edges.toDF("s", "d"), "s", "d")
      .collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("deg"), r.getAs[Long]("n_tri")))
      .toMap

  test("triangle in a 4-cycle plus chord: corners count, chord-free nodes do not") {
    // square 1-2-3-4 with chord 1-3: triangles (1,2,3) and (1,3,4)
    val got = run(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 1L -> 3L))
    assert(got(1L) == (3L, 2L) && got(3L) == (3L, 2L))
    assert(got(2L) == (2L, 1L) && got(4L) == (2L, 1L))
  }

  test("triangle-free path graph yields zero triangles with correct degrees") {
    val got = run(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L))
    assert(got == Map(1L -> (1L, 0L), 2L -> (2L, 0L),
      3L -> (2L, 0L), 4L -> (1L, 0L)))
  }

  test("result is a pure function of the edge set: duplicates, reversals, self-loops ignored") {
    val clean = run(Seq(1L -> 2L, 2L -> 3L, 1L -> 3L))
    val noisy = run(Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L,
      1L -> 3L, 1L -> 3L, 2L -> 2L))
    assert(clean == noisy)
    assert(clean == Map(1L -> (2L, 1L), 2L -> (2L, 1L), 3L -> (2L, 1L)))
  }

  test("K5 clique: every node has degree 4 and sits in C(4,2)=6 triangles") {
    val nodes = (1L to 5L)
    val edges = for { a <- nodes; b <- nodes if a < b } yield (a, b)
    val got = run(edges)
    nodes.foreach(n => assert(got(n) == (4L, 6L), s"node $n: ${got(n)}"))
  }

  test("hub star with one closing rim edge: only that wedge closes") {
    // hub 0 connected to 1..6; rim edge 1-2 closes exactly one triangle
    val got = run((1L to 6L).map(0L -> _) :+ (1L -> 2L))
    assert(got(0L) == (6L, 1L))
    assert(got(1L) == (2L, 1L) && got(2L) == (2L, 1L))
    (3L to 6L).foreach(n => assert(got(n) == (1L, 0L)))
  }

  private def prRun(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    operators.Graph
      .pageRankOn(edges.toDF("s", "d"), "s", "d", iters)
      .collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr_micro"))
      .toMap

  private def prBrute(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = edges.map { case (a, b) => (a min b, a max b) }
      .filter { case (a, b) => a != b }.toSet
    val nb = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupMap(_._1)(_._2)
    val n = nb.size
    var pr = nb.map { case (node, _) => node -> 1000000L / n }
    for (_ <- 1 to iters) {
      pr = nb.map { case (node, neigh) =>
        val s = neigh.map(u => pr(u) / nb(u).size).sum
        node -> (150000L / n + (85L * s) / 100)
      }
    }
    pr
  }

  test("integer pagerank matches brute-force replay on a random graph") {
    val rng = new scala.util.Random(7)
    val edges = (for (_ <- 1 to 150) yield
      (rng.nextInt(25).toLong, rng.nextInt(25).toLong))
      .filter { case (a, b) => a != b }
    assert(prRun(edges, 3) == prBrute(edges, 3))
  }

  test("pagerank is a pure function of the edge set and ranks the star hub highest") {
    val star = (1L to 8L).map(0L -> _)
    val noisy = star ++ star.map(_.swap) :+ (3L -> 3L)
    val got = prRun(star, 3)
    assert(got == prRun(noisy, 3))
    assert(got == prBrute(star, 3))
    val hub = got(0L)
    (1L to 8L).foreach(n => assert(got(n) < hub, s"leaf $n >= hub"))
  }

  private def kcRun(edges: Seq[(Long, Long)], rounds: Int = 4): Map[Long, (Long, Long)] =
    operators.Graph
      .kCoreLayersOn(edges.toDF("s", "d"), "s", "d", k = 2, rounds = rounds)
      .collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("layer"), r.getAs[Long]("core_deg")))
      .toMap

  test("2-core peeling: chain dissolves layer by layer, middle node peels once isolated") {
    // a-b-c: endpoints peel round 1; b is then isolated (deg 0) -> round 2
    assert(kcRun(Seq(1L -> 2L, 2L -> 3L)) ==
      Map(1L -> (1L, 0L), 3L -> (1L, 0L), 2L -> (2L, 0L)))
  }

  test("2-core peeling: triangle with a tail keeps the triangle as core") {
    // triangle 1-2-3, tail 3-4-5: 5 peels r1, 4 peels r2, triangle survives
    val got = kcRun(Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L))
    assert(got(5L) == (1L, 0L) && got(4L) == (2L, 0L))
    Seq(1L, 2L, 3L).foreach(n => assert(got(n) == (0L, 2L), s"node $n"))
  }

  test("2-core peeling covers every node exactly once and fails loudly on non-convergence") {
    val chain = (1L to 9L).map(i => i -> (i + 1))
    val got = kcRun(chain, rounds = 5)
    assert(got.keySet == (1L to 10L).toSet)
    assert(got.values.forall { case (layer, cd) => layer >= 1 && cd == 0 })
    intercept[IllegalArgumentException](kcRun(chain, rounds = 2))
  }

  test("degree orientation matches brute-force count on a random graph") {
    val rng = new scala.util.Random(42)
    val edges = (for (_ <- 1 to 120) yield
      (rng.nextInt(20).toLong, rng.nextInt(20).toLong))
      .filter { case (a, b) => a != b }.distinct
    val und = edges.map { case (a, b) => (a min b, a max b) }.toSet
    val nodes = und.flatMap { case (a, b) => Seq(a, b) }
    val brute = nodes.map { n =>
      val nb = und.toSeq.collect { case (a, b) if a == n => b
                                   case (a, b) if b == n => a }
      val tri = (for { x <- nb; y <- nb if x < y
                       if und((x min y, x max y)) } yield 1).size
      n -> (nb.size.toLong, tri.toLong)
    }.toMap
    assert(run(edges) == brute)
  }

  test("generic components: min labels on a forest of known components") {
    import spark.implicits._
    // two triangles bridged to nothing + an isolated chain
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (20L, 21L)).toDF("src", "dst")
    val got = operators.Graph.componentsOn(edges, "src", "dst")
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("pagerank with lineage checkpoints (8 rounds) equals the unrolled recurrence") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("a", "b")
    // brute-force integer replay of the floor-division recurrence
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val adj = (und ++ und.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val n = adj.size.toLong
    var pr = adj.keys.map(k => k -> 1000000L / n).toMap
    for (_ <- 1 to 8) {
      val s = adj.keys.map(v =>
        v -> adj(v).map(u => pr(u) / deg(u)).sum).toMap
      pr = adj.keys.map(v => v -> (150000L / n + 85L * s(v) / 100L)).toMap
    }
    val got = operators.Graph.pageRankOn(edges, "a", "b", iters = 8)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr_micro")).toMap
    assert(got == pr)
  }

  private def edgeSimRun(edges: Seq[(Long, Long)])
      : Map[(Long, Long), (Long, Long, Long, Long)] =
    operators.Graph
      .edgeSimilarityOn(edges.toDF("s", "d"), "s", "d")
      .collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        ((r.getAs[Long]("deg_a"), r.getAs[Long]("deg_b"),
          r.getAs[Long]("common"), r.getAs[Long]("jacc_micro"))))
      .toMap

  private def edgeSimBrute(edges: Seq[(Long, Long)])
      : Map[(Long, Long), (Long, Long, Long, Long)] = {
    val und = edges.map { case (a, b) => (a min b, a max b) }
      .filter { case (a, b) => a != b }.toSet
    val nb = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap
    und.map { case (a, b) =>
      val common = (nb(a) intersect nb(b)).size.toLong
      val da = nb(a).size.toLong
      val db = nb(b).size.toLong
      (a, b) -> ((da, db, common, 1000000L * common / (da + db - common)))
    }.toMap
  }

  test("edge jaccard: chord is clique-interior, square edges are not, bridge scores zero") {
    // square 1-2-3-4 with chord 1-3, plus pendant bridge 4-5
    val got = edgeSimRun(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L,
      1L -> 3L, 4L -> 5L))
    // chord (1,3): common neighbors {2, 4}, degs 3/3 → 2/4
    assert(got((1L, 3L)) == (3L, 3L, 2L, 500000L))
    // square edge (1,2): common {3}, degs 3/2 → 1/4
    assert(got((1L, 2L)) == (3L, 2L, 1L, 250000L))
    // bridge (4,5): no common neighbors
    assert(got((4L, 5L)) == (3L, 1L, 0L, 0L))
    assert(got == edgeSimBrute(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L,
      1L -> 3L, 4L -> 5L)))
  }

  test("edge jaccard matches brute force on a random graph") {
    val rng = new scala.util.Random(1789)
    val edges = Seq.fill(160)(
      (rng.nextInt(22).toLong, rng.nextInt(22).toLong))
    assert(edgeSimRun(edges) == edgeSimBrute(edges))
  }

  test("clustering coefficient: clique interior 10^6, star hub 0, pendant 0") {
    // square 1-2-3-4 with chord 1-3, pendant 4-5 (same graph as the
    // edge-sim case), plus an isolated star 10-{11,12,13}
    val got = operators.Graph
      .clusteringCoeffOn(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L,
        1L -> 3L, 4L -> 5L, 10L -> 11L, 10L -> 12L, 10L -> 13L).toDF("s", "d"),
        "s", "d")
      .collect()
      .map(r => r.getAs[Long]("node") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("n_tri"),
          r.getAs[Long]("coeff_micro"))))
      .toMap
    // node 2: deg 2, one triangle (1,2,3) → 2*10^6*1 div 2 = 10^6
    assert(got(2L) == (2L, 1L, 1000000L))
    // node 1: deg 3, triangles (1,2,3),(1,3,4) → 4*10^6 div 6
    assert(got(1L) == (3L, 2L, 666666L))
    // node 4: deg 3 (3,1,5), one triangle (1,3,4) → 2*10^6 div 6
    assert(got(4L) == (3L, 1L, 333333L))
    // pendant 5: deg 1 → defined as 0
    assert(got(5L) == (1L, 0L, 0L))
    // star hub 10: deg 3, no triangles → 0; leaves deg 1 → 0
    assert(got(10L) == (3L, 0L, 0L))
    assert(got(11L) == (1L, 0L, 0L))
  }

  private def lpaBrute(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = edges.map { case (a, b) => (a min b, a max b) }
      .filter { case (a, b) => a != b }.toSet
    val nb = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupMap(_._1)(_._2)
    var lab = nb.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      lab = nb.map { case (n, ns) =>
        val cnt = ns.groupBy(lab).view.mapValues(_.size).toMap
        n -> cnt.toSeq.map { case (l, c) => (-c, l) }.min._2
      }
    }
    lab
  }

  test("label propagation splits two cliques at the bridge") {
    val cliqueA = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val cliqueB = for { a <- 5L to 8L; b <- 5L to 8L if a < b } yield (a, b)
    val edges = cliqueA ++ cliqueB :+ (4L -> 5L)
    val got = operators.Graph.labelPropOn(edges.toDF("s", "d"), "s", "d", iters = 2)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    // after 2 synchronous rounds each clique is uniformly labeled and
    // the labels DIFFER across the bridge (components would merge them)
    assert((1L to 4L).map(got).toSet.size == 1)
    assert((5L to 8L).map(got).toSet.size == 1)
    assert(got(1L) != got(5L))
    assert(got == lpaBrute(edges, 2))
  }

  test("label propagation matches the synchronous brute force on a random graph") {
    val rng = new scala.util.Random(97)
    val edges = Seq.fill(150)(
      (rng.nextInt(25).toLong, rng.nextInt(25).toLong))
      .filter { case (a, b) => a != b }
    for (iters <- Seq(1, 3)) {
      val got = operators.Graph
        .labelPropOn(edges.toDF("s", "d"), "s", "d", iters = iters)
        .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
      assert(got == lpaBrute(edges, iters), s"iters=$iters")
    }
  }

  test("K5 clique: every edge has 3 common neighbors and jaccard 3/5") {
    val nodes = (1L to 5L)
    val edges = for { a <- nodes; b <- nodes if a < b } yield (a, b)
    val got = edgeSimRun(edges)
    assert(got.size == 10)
    got.values.foreach(v => assert(v == (4L, 4L, 3L, 600000L)))
  }

  private def bfsRun(edges: Seq[(Long, Long)], seeds: Seq[Long],
      rounds: Int): Map[Long, Long] =
    operators.Graph.bfsDistanceOn(edges.toDF("s", "d"), "s", "d",
        seeds.toDF("node"), rounds)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap

  test("bfs distance: path graph caps at the round horizon, tail absent") {
    // 1-2-3-4-5-6-7 from seed 1 with 4 rounds: 6 and 7 unreached
    val path = (1L to 6L).map(i => (i, i + 1))
    val got = bfsRun(path, Seq(1L), rounds = 4)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("bfs distance: min over alternative routes and multiple seeds") {
    // square 1-2-3-4 plus chord 1-3: dist(3) = 1 via the chord, not 2;
    // second seed 10 in a separate component claims its own side
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 1L -> 3L,
      10L -> 11L, 11L -> 12L)
    val got = bfsRun(edges, Seq(1L, 10L), rounds = 4)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 0L, 11L -> 1L, 12L -> 2L))
  }

  test("bfs distance: seed in no edge still reports itself at 0") {
    val got = bfsRun(Seq(1L -> 2L), Seq(5L), rounds = 2)
    assert(got == Map(5L -> 0L))
  }

  test("assortativity: star is perfectly disassortative, regular graph is null") {
    def run(edges: Seq[(Long, Long)]) =
      operators.Graph.assortativityOn(edges.toDF("s", "d"), "s", "d")
        .collect().head
    // star K1,3: every edge pairs the deg-3 hub with a deg-1 leaf -> r = -1
    val star = run(Seq(1L -> 2L, 1L -> 3L, 1L -> 4L))
    assert(math.abs(star.getAs[Double]("assortativity") + 1.0) < 1e-12)
    // 4-cycle: all degrees equal -> zero variance -> NULL
    val cycle = run(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L))
    assert(cycle.isNullAt(cycle.fieldIndex("assortativity")))
    // two disjoint K3s: still regular -> NULL; sums sanity
    val k3s = run(Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 4L -> 5L, 5L -> 6L, 4L -> 6L))
    assert(k3s.getAs[Long]("m") == 12L && k3s.isNullAt(k3s.fieldIndex("assortativity")))
  }

  test("modularity: two bridged triangles score the textbook numerators") {
    // K3 {1,2,3} + K3 {4,5,6} + bridge 3-4: m=7; per community
    // e_in=3, d_c=7 -> q_num = 4*7*3 - 49 = 35; Q = 70/196
    val edges = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L,
      4L -> 5L, 5L -> 6L, 4L -> 6L, 3L -> 4L).toDF("s", "d")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("node", "label")
    val rows = operators.Graph.modularityOn(edges, "s", "d", labels)
      .collect().map(r => r.getAs[Long]("label") ->
        (r.getAs[Long]("n_members"), r.getAs[Long]("e_in"),
          r.getAs[Long]("d_c"), r.getAs[String]("q_num_str"),
          r.getAs[Double]("q_contrib"))).toMap
    assert(rows(10L) == (3L, 3L, 7L, "35", 35.0 / 196.0))
    assert(rows(20L) == (3L, 3L, 7L, "35", 35.0 / 196.0))
    // everything in ONE community: Q = 4*7*7 - 196 = 0 exactly
    val one = operators.Graph.modularityOn(edges, "s", "d",
        labels.select(col("node"), lit(1L).as("label")))
      .collect()
    assert(one.length == 1 && one.head.getAs[String]("q_num_str") == "0")
  }
}
