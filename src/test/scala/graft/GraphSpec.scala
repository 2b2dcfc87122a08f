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
}
