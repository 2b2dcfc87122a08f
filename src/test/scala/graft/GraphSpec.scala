package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkTestBase {

  /** In-memory reference of the integer fixed-point PageRank —
    * independently written fold the distributed operator must match
    * exactly (all-integer arithmetic makes "exactly" well-defined). */
  private def reference(edges: Seq[(String, String, Long)], iters: Int,
      dampingE2: Long = 85L): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val init = 1000000000L / nodes.size
    val base = ((100L - dampingE2) * init) / 100L
    var rank = nodes.map(_ -> init).toMap
    for (_ <- 0 until iters) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _, w) => (rank(s) * w) / outw(s) }.sum
      }
      rank = nodes.map(n =>
        n -> (base + (dampingE2 * in.getOrElse(n, 0L)) / 100L)).toMap
    }
    rank
  }

  private def run(edges: Seq[(String, String, Long)], iters: Int)
      : Map[String, Long] = {
    import spark.implicits._
    Graph.weightedPageRankE9(
        edges.toDF("src", "dst", "w"), "src", "dst", "w", iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("two-node cycle is stationary at the uniform rank") {
    // A⇄B: every iteration maps (r, r) to (base + 0.85·r, base + 0.85·r)
    // whose fixed point is the uniform 5·10⁸ — and integer arithmetic
    // holds it exactly from the first step
    val got = run(Seq(("a", "b", 1L), ("b", "a", 1L)), iters = 7)
    assert(got == Map("a" -> 500000000L, "b" -> 500000000L))
  }

  test("star graph: the hub outranks the spokes, spokes tie") {
    val got = run(
      Seq(("s1", "hub", 1L), ("s2", "hub", 1L), ("s3", "hub", 1L),
        ("hub", "s1", 1L), ("hub", "s2", 1L), ("hub", "s3", 1L)),
      iters = 10)
    assert(got("hub") > got("s1"))
    assert(got("s1") == got("s2") && got("s2") == got("s3"))
  }

  test("random weighted graphs match the in-memory reference exactly") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 5) {
      val n = 4 + rnd.nextInt(8)
      val edges = (0 until n * 3).map { _ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}",
          1L + rnd.nextInt(9))
      }.distinct.map { case (s, d, w) => (s, d, w.toLong) }
      val iters = 1 + rnd.nextInt(6)
      assert(run(edges, iters) == reference(edges, iters),
        s"trial $trial: $edges iters=$iters")
    }
  }

  /** Personalized reference: restart mass only on the seed set. */
  private def referencePersonalized(edges: Seq[(String, String, Long)],
      seeds: Seq[String], iters: Int,
      dampingE2: Long = 85L): Map[String, Long] = {
    val nodes =
      ((edges.map(_._1) ++ edges.map(_._2)).distinct ++ seeds).distinct.sorted
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val init = 1000000000L / seeds.size
    val base = ((100L - dampingE2) * init) / 100L
    var rank = nodes.map(n =>
      n -> (if (seeds.contains(n)) init else 0L)).toMap
    for (_ <- 0 until iters) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _, w) => (rank(s) * w) / outw(s) }.sum
      }
      rank = nodes.map(n =>
        n -> ((if (seeds.contains(n)) base else 0L) +
          (dampingE2 * in.getOrElse(n, 0L)) / 100L)).toMap
    }
    rank
  }

  test("personalized: mass stays near the seed, off-graph seed accepted") {
    import spark.implicits._
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L),
      ("b", "a", 3L))
    def runP(seeds: Seq[String], iters: Int) =
      Graph.personalizedPageRankE9(edges.toDF("src", "dst", "w"),
          "src", "dst", "w", seeds, iters)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = runP(Seq("a"), 4)
    assert(got == referencePersonalized(edges, Seq("a"), 4))
    // seed proximity: a (the seed) holds the most rank
    assert(got("a") > got("b") && got("a") > got("c"))
    // a seed the edge frame never mentions still appears with its
    // restart mass (and only that — nothing flows to it)
    val off = runP(Seq("zz"), 3)
    assert(off == referencePersonalized(edges, Seq("zz"), 3))
    assert(off("zz") == (15L * 1000000000L) / 100L)
    // a duplicated seed must NOT split the restart mass — seeds are a
    // set, so Seq("a","a") ranks exactly like Seq("a")
    assert(runP(Seq("a", "a"), 4) == runP(Seq("a"), 4))
  }

  test("personalized on an EMPTY graph: seeds keep their restart mass") {
    import spark.implicits._
    val empty = Seq.empty[(String, String, Long)].toDF("src", "dst", "w")
    val got = Graph.personalizedPageRankE9(empty, "src", "dst", "w",
        Seq("s1", "s2"), iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // |seeds| = 2 → init 5·10⁸ each; no edges → every iteration
    // re-lands only the damped restart base
    val base = (15L * (1000000000L / 2)) / 100L
    assert(got == Map("s1" -> base, "s2" -> base))
  }

  test("dangling nodes rank at base; disconnected sinks still appear") {
    // c has no out-edges (dangling, leaks mass); d only receives
    val got = run(Seq(("a", "b", 2L), ("b", "c", 1L), ("a", "d", 1L)),
      iters = 3)
    assert(got.keySet == Set("a", "b", "c", "d"))
    // a receives nothing → exactly base after iteration 1 onward
    val init = 1000000000L / 4
    assert(got("a") == (15L * init) / 100L)
  }

  test("convergence driver: stationary graph stops at once; general " +
      "graph lands on the truncation orbit") {
    import spark.implicits._
    // the two-node cycle is stationary from the first step: the
    // driver detects a zero delta immediately
    val cyc = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
    val (r1, it1) = Graph.weightedPageRankE9Converged(cyc, "src", "dst", "w")
    assert(it1 == 1, s"ran $it1 iterations on a stationary graph")
    assert(r1.collect().map(x => x.getString(0) -> x.getLong(1)).toMap ==
      Map("a" -> 500000000L, "b" -> 500000000L))
    // a graph whose integer iteration orbits a small limit cycle
    // (period 3, few-unit amplitude — measured): the tolerance rule
    // must stop well before maxIters, and the result must sit within
    // a hair of a long fixed-iteration run
    val g = Seq(("a", "b", 1L), ("b", "c", 2L), ("c", "a", 1L),
      ("b", "a", 1L)).toDF("src", "dst", "w")
    val (fix, it2) = Graph.weightedPageRankE9Converged(g, "src", "dst", "w")
    assert(it2 < 200, "did not converge")
    val fixM = fix.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val long = Graph.weightedPageRankE9(g, "src", "dst", "w", iters = 100)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    fixM.keys.foreach { k =>
      assert(math.abs(fixM(k) - long(k)) <= 64L,
        s"$k: ${fixM(k)} vs ${long(k)}")
    }
  }

  test("zero-weight edges are dropped (no division by zero)") {
    // c's only out-edge has weight 0 → c is effectively dangling;
    // the zero edge must not reach the contribution division
    val withZero = Seq(("a", "b", 1L), ("b", "a", 1L), ("b", "c", 1L),
      ("c", "a", 0L))
    val without = Seq(("a", "b", 1L), ("b", "a", 1L), ("b", "c", 1L))
    // after the drop the graphs are identical (c stays in the node
    // set as b's target) — ranks must match the clean graph exactly
    assert(run(withZero, 4) == reference(without, 4))
    assert(run(withZero, 4) == run(without, 4))
  }

  /** Brute-force per-node triangle counts over the undirected
    * dedup'd edge set — the degree-oriented distributed plan must
    * reproduce these exactly. */
  private def triangleReference(edges: Seq[(String, String)])
      : (Map[String, Long], Map[String, Long]) = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => if (e._1 < e._2) e else e.swap).distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (n, es) => n -> es.map(_._2).toSet }
    val deg = adj.map { case (n, ns) => n -> ns.size.toLong }
    val tri = adj.map { case (n, ns) =>
      n -> ns.toSeq.combinations(2)
        .count(p => adj(p(0)).contains(p(1))).toLong
    }
    (deg, tri)
  }

  test("triangleStats matches brute force on random graphs (incl. a hub)") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x7121A46L)
    for (round <- 1 to 4) {
      // dense enough for real triangles; node 'h' is a deliberate hub
      // so the degree orientation's skew cap is actually exercised
      val base = (1 to 120).map(_ =>
        (s"n${rnd.nextInt(18)}", s"n${rnd.nextInt(18)}"))
      val hub = (0 until 18).map(i => ("h", s"n$i"))
      val edges = rnd.shuffle(base ++ hub)
      val (deg, tri) = triangleReference(edges)
      val got = Graph.triangleStats(edges.toDF("src", "dst"), "src", "dst")
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toMap
      assert(got.keySet === deg.keySet, s"round $round")
      deg.keys.foreach { n =>
        val (d, t, cc) = got(n)
        assert(d === deg(n), s"degree($n) round $round")
        assert(t === tri(n), s"triangles($n) round $round")
        val wantCc = if (deg(n) >= 2) Some(10000L * 2 * tri(n) /
          (deg(n) * (deg(n) - 1))) else None
        assert(cc === wantCc, s"cc($n) round $round")
      }
    }
  }

  test("triangleStats: a clique and a path, exact small cases") {
    import spark.implicits._
    // K4 ∪ path x—y—z: every K4 node has 3 triangles and cc = 1;
    // y bridges two non-adjacent neighbours (cc = 0)
    val k4 = Seq("a", "b", "c", "d").combinations(2).map(p => (p(0), p(1))).toSeq
    val edges = k4 ++ Seq(("x", "y"), ("y", "z"))
    val got = Graph.triangleStats(edges.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    Seq("a", "b", "c", "d").foreach { n =>
      assert(got(n) === ((3L, 3L, Some(10000L))))
    }
    assert(got("y") === ((2L, 0L, Some(0L))))
    assert(got("x") === ((1L, 0L, None)))
    assert(got("z") === ((1L, 0L, None)))
  }

  test("approxTriangleCount: p=1 degenerates to the exact count; " +
      "sampling is layout-independent with exact scale-up arithmetic") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xD041107L)
    val edges = ((1 to 400).map(_ =>
      (s"n${rnd.nextInt(30)}", s"n${rnd.nextInt(30)}")) ++
      (0 until 30).map(i => ("h", s"n$i"))).toDF("src", "dst")
    // exact global count from the per-node stats (each triangle has
    // exactly 3 corners)
    val exact = Graph.triangleStats(edges, "src", "dst")
      .agg(sum(col("triangles"))).head.getLong(0) / 3
    // p = 1: the sample IS the population — estimate, sample count,
    // and edge census all exact (the degeneracy contract)
    val full = Graph.approxTriangleCount(edges, "src", "dst",
        pE4 = 10000).collect()(0)
    assert(full.getLong(2) == exact && full.getLong(3) == exact)
    assert(full.getLong(0) == full.getLong(1))
    // p < 1: membership is a pure function of (edge values, seed) —
    // identical across partition layouts; the scale-up is the pinned
    // integer form ⌊sampled·10¹²/pE4³⌋
    val s1 = Graph.approxTriangleCount(edges, "src", "dst",
      pE4 = 4000, seed = 7).collect()(0)
    val s2 = Graph.approxTriangleCount(edges.repartition(13), "src",
      "dst", pE4 = 4000, seed = 7).collect()(0)
    assert(s1.toSeq == s2.toSeq, "sample depends on partition layout")
    assert(s1.getLong(1) < s1.getLong(0), "p=0.4 kept every edge")
    assert(s1.getLong(3) ==
      (BigInt(s1.getLong(2)) * BigInt(1000000000000L) /
        BigInt(4000L * 4000L * 4000L)).toLong)
    // a different seed draws a different sample (the seed is live)
    val s3 = Graph.approxTriangleCount(edges, "src", "dst",
      pE4 = 4000, seed = 8).collect()(0)
    assert(s3.getLong(1) != s1.getLong(1) || s3.getLong(2) != s1.getLong(2))
    // census opt-out: identical sample and estimate, n_edges = -1 —
    // the serving call never pays the full-pair distinct count
    val s4 = Graph.approxTriangleCount(edges, "src", "dst",
      pE4 = 4000, seed = 7, census = false).collect()(0)
    assert(s4.getLong(0) == -1L)
    assert((s4.getLong(1), s4.getLong(2), s4.getLong(3)) ==
      ((s1.getLong(1), s1.getLong(2), s1.getLong(3))))
  }

  test("triangleStats hub fallback: the flat plan (threshold forced) " +
      "answers identically to the fused plan on every random graph") {
    import spark.implicits._
    // the automatic degree-threshold switch (SCALE.md §8): beyond the
    // hub bound the orientation derives from scalar degree joins and
    // no FULL neighbor array is ever buffered. Same rows, pinned here
    // by forcing the flat arm with threshold 0 against the fused
    // default on the same graphs (multi-edges and a hub included).
    val rnd = new scala.util.Random(0xF1A7L)
    for (round <- 1 to 3) {
      val base = (1 to 150).map(_ =>
        (s"n${rnd.nextInt(20)}", s"n${rnd.nextInt(20)}"))
      val hub = (0 until 20).map(i => ("h", s"n$i"))
      val edges = rnd.shuffle(base ++ hub ++ base.take(30)).toDF("src", "dst")
      val fused = Graph.triangleStats(edges, "src", "dst")
        .collect().map(_.toSeq).toSet
      val flat = Graph.triangleStats(edges, "src", "dst",
          hubDegreeThreshold = 0L)
        .collect().map(_.toSeq).toSet
      assert(flat === fused, s"round $round")
    }
  }

  test("hopDistances: directed BFS matches Floyd-style reference; cap respected") {
    import spark.implicits._
    // a→b→c→d→e chain plus shortcut a→d; f unreachable from a
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
      ("a", "d"), ("f", "a"))
    val got = Graph.hopDistances(edges.toDF("src", "dst"), "src", "dst",
        sources = Seq("a"), maxHops = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 1L, "e" -> 2L))
    // hop cap truncates the frontier, it never mislabels
    val capped = Graph.hopDistances(edges.toDF("src", "dst"), "src", "dst",
        sources = Seq("a"), maxHops = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped === Map("a" -> 0L, "b" -> 1L, "d" -> 1L))
  }

  test("hopDistances: undirected mode, multi-source, off-graph seed") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("c", "b"), ("d", "c"))
    // undirected from d: d=0, c=1, b=2, a=3
    val und = Graph.hopDistances(edges.toDF("src", "dst"), "src", "dst",
        sources = Seq("d"), maxHops = 10, undirected = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(und === Map("d" -> 0L, "c" -> 1L, "b" -> 2L, "a" -> 3L))
    // directed from d reaches only via d→c; b is c's TARGET? no — edge
    // is (d,c) only, then (c,b): d=0, c=1, b=2; a unreachable
    val dir = Graph.hopDistances(edges.toDF("src", "dst"), "src", "dst",
        sources = Seq("d"), maxHops = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dir === Map("d" -> 0L, "c" -> 1L, "b" -> 2L))
    // multi-source with one seed absent from the graph: the off-graph
    // seed still reports itself at hop 0 (restart-mass convention)
    val multi = Graph.hopDistances(edges.toDF("src", "dst"), "src", "dst",
        sources = Seq("a", "zz"), maxHops = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(multi === Map("a" -> 0L, "zz" -> 0L, "b" -> 1L))
  }
}
