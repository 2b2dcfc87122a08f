package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-analysis centrality — the graph plane's ranking companion to
  * the connected-components clustering in [[Dedup]].
  *
  * Why it belongs in a training-data engine: link centrality is the
  * classic web-corpus QUALITY WEIGHT — crawl curation ranks hosts by
  * (Page)Rank-style scores and samples/filters documents by them, the
  * same role the content-side quality score
  * ([[TextAnalysis.qualityScoreE4]]) plays for text. The operator is
  * graph-generic: any (src, dst, weight) edge frame ranks, e.g. the
  * per-user event-type transition graph the driver query derives.
  *
  * Exactness: ranks are INTEGER fixed-point (×10⁹) and every step is
  * integer arithmetic — per-edge contribution `(rank·w) DIV out_w`,
  * damping `(d·Σ) DIV 100` — so results are independent of partition
  * count, summation order, and engine (a float PageRank sums doubles
  * in shuffle order and never hash-compares across engines; this one
  * is bit-reproducible, and the deliberate DIV truncation is part of
  * the contract). Dangling nodes (no out-edges) leak their damped
  * mass rather than redistributing it — fine for a RANKING signal
  * (order is what matters) and keeps the per-iteration plan to the
  * two joins below; document-grade PageRank sums are not the goal.
  *
  * Scale shape: the edge frame (joined once with per-src out-weights)
  * is materialized ONCE (eager local checkpoint) and reused by every
  * iteration; each iteration is one broadcast-or-shuffle hash join of
  * ranks onto edges (on src) plus one aggregation (on dst) — O(iters)
  * shuffles total, no growing lineage (per-iteration checkpoints, the
  * [[Dedup.connectedComponents]] discipline). Rank state is one row
  * per node, never per edge.
  */
object Graph {

  /** Weighted PageRank, integer e9 fixed-point. Node ids are cast to
    * string (dimension-value convention). Returns (`id`, `rank_e9`)
    * with one row per node that appears as a src or dst.
    *
    * @param dampingE2 damping factor ×100 (85 = the canonical 0.85)
    */
  def weightedPageRankE9(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iters: Int, dampingE2: Int = 85): DataFrame = {
    val (ew, nodes) = prepare(edges, srcCol, dstCol, wCol, iters, dampingE2)
    // the count is global rank's own need (init mass is 1e9/n); the
    // personalized form sizes by its seed set and never pays this job
    val n = nodes.count()
    require(n > 0, "weightedPageRankE9: empty edge set")
    val init = 1000000000L / n
    val base = ((100L - dampingE2) * init) / 100L
    iterate(ew, nodes, lit(init), lit(base), iters, dampingE2)
  }

  /** PERSONALIZED PageRank: restart mass goes to the `seeds` node set
    * (uniformly) instead of to every node — ranks become proximity to
    * the seeds through the link structure. This is the seed-expansion
    * curation pattern: hand-pick known-good sources, rank the rest of
    * the graph by how strongly the seeds flow into it, harvest the
    * high-rank frontier. Same integer fixed-point contract as
    * [[weightedPageRankE9]]; seeds absent from the graph still receive
    * their restart mass (they just pass nothing on). */
  def personalizedPageRankE9(edges: DataFrame, srcCol: String,
      dstCol: String, wCol: String, seeds: Seq[String], iters: Int,
      dampingE2: Int = 85): DataFrame = {
    // a duplicated seed must not silently split the restart mass —
    // the contract is a seed SET (mass is per distinct node)
    val seedSet = seeds.distinct
    require(seedSet.nonEmpty, "personalizedPageRankE9 needs seed nodes")
    val (ew, nodes0) = prepare(edges, srcCol, dstCol, wCol,
      iters, dampingE2, seedUnion = seedSet)
    // an EMPTY (or all-zero-weight) graph is legal here: the seeds
    // alone carry their restart mass, nothing flows — no node count
    // is needed since mass is sized by the seed set
    val init = 1000000000L / seedSet.size
    val seedBase = ((100L - dampingE2) * init) / 100L
    val isSeed = col("id").isin(seedSet: _*)
    iterate(ew, nodes0,
      when(isSeed, lit(init)).otherwise(lit(0L)),
      when(isSeed, lit(seedBase)).otherwise(lit(0L)),
      iters, dampingE2)
  }

  /** Shared setup: the checkpointed out-weighted edge frame and the
    * checkpointed node set (graph nodes ∪ `seedUnion` — seeds are part
    * of the node set even if the edge frame never mentions them:
    * restart mass must have somewhere to land). One materialization
    * per frame, no counting. */
  private def prepare(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iters: Int, dampingE2: Int,
      seedUnion: Seq[String] = Nil): (DataFrame, DataFrame) = {
    require(iters >= 1 && iters <= 1000, s"iters in [1,1000], got $iters")
    require(dampingE2 >= 0 && dampingE2 <= 100,
      s"dampingE2 in [0,100], got $dampingE2")
    // non-positive weights are meaningless for a random surfer and a
    // node whose edges are ALL zero-weight would divide by zero in
    // the contribution term — dropped up front (it then ranks as
    // dangling, the same thing a zero-out-mass node is)
    val e = edges.select(
        col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"),
        col(wCol).cast("long").as("w"))
      .where(col("w") > 0)
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    // reused every iteration: materialize once, lineage-free
    val ew = e.join(outw, "src").localCheckpoint(true)
    val spark = edges.sparkSession
    import spark.implicits._
    val graphNodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
    val nodes =
      (if (seedUnion.isEmpty) graphNodes
       else graphNodes.union(seedUnion.toDF("id")))
        .distinct()
        .localCheckpoint(true)
    (ew, nodes)
  }

  /** [[weightedPageRankE9]] iterated to CONVERGENCE — stop when an
    * iteration moves no rank by more than `tolE9` (absolute, in e9
    * units), or at `maxIters`. The residual shrinks geometrically at
    * rate d until it reaches the truncation noise floor: the integer
    * DIV iteration then ORBITS a tiny limit cycle (measured period
    * ≤ 3, amplitude a few units — it does NOT reach strict equality
    * in general), so the tolerance is the honest stopping rule; with
    * integer deltas the check itself is exact arithmetic and the
    * whole run stays deterministic. Each probe is one node-sized
    * join + max aggregate.
    *
    * @return (ranks at the stop, iterations actually run; a result
    *   with iterations == maxIters did not meet the tolerance) */
  def weightedPageRankE9Converged(edges: DataFrame, srcCol: String,
      dstCol: String, wCol: String, maxIters: Int = 200,
      tolE9: Long = 16L, dampingE2: Int = 85): (DataFrame, Int) = {
    require(tolE9 >= 0, s"tolE9 must be >= 0, got $tolE9")
    val (ew, nodes) = prepare(edges, srcCol, dstCol, wCol,
      maxIters, dampingE2)
    val n = nodes.count()
    require(n > 0, "weightedPageRankE9Converged: empty edge set")
    val init = 1000000000L / n
    val base = ((100L - dampingE2) * init) / 100L
    var rank = nodes.select(col("id"), lit(init).as("rank_e9"))
      .localCheckpoint(true)
    var it = 0
    var converged = false
    while (it < maxIters && !converged) {
      val next = step(ew, nodes, rank, lit(base), dampingE2)
        .localCheckpoint(true)
      val maxDelta = next
        .join(rank.withColumnRenamed("rank_e9", "prev"), "id")
        .agg(max(abs(col("rank_e9") - col("prev"))))
        .head.getLong(0)
      converged = maxDelta <= tolE9
      rank = next
      it += 1
    }
    (rank, it)
  }

  /** The shared power iteration: rank' = base(id) + d·Σ in-flow, all
    * integer. `initOf`/`baseOf` are per-node column expressions over
    * the node frame (uniform for global rank, seed-gated for the
    * personalized form). */
  private def iterate(ew: DataFrame, nodes: DataFrame, initOf: org.apache.spark.sql.Column,
      baseOf: org.apache.spark.sql.Column, iters: Int, dampingE2: Int): DataFrame = {
    var rank = nodes.select(col("id"), initOf.as("rank_e9"))
    for (i <- 1 to iters) {
      rank = step(ew, nodes, rank, baseOf, dampingE2)
      // bound lineage WITHOUT an eager job per round: a short chain
      // (≤10 iterations) executes as one lazy job; longer runs cut
      // their plan every 10th round — the checkpoint cadence trade
      // between job-launch overhead and plan depth
      if (i % 10 == 0 && i < iters) rank = rank.localCheckpoint(true)
    }
    rank
  }

  /** Per-node TRIANGLE counts and exact local clustering coefficient
    * over the undirected view of an edge frame — the cohesion metric
    * beside rank centrality: rank says "how much flows here",
    * clustering says "how clique-like is the neighborhood" (dense
    * co-occurrence neighborhoods are the signal behind related-item
    * blocks and template/boilerplate link farms alike).
    *
    * Semantics: edges are symmetrized, self-loops dropped, and each
    * unordered pair counted once; `triangles(v)` = number of
    * unordered triangles through v; `cc_e4` = the exact local
    * clustering coefficient ×10⁴, INTEGRAL-divided
    * (`10000·2·tri div deg·(deg−1)`, NULL when deg < 2) so it
    * hash-compares across engines.
    *
    * Scale shape — DEGREE-ORDERED ORIENTATION + ADJACENCY
    * INTERSECTION (the compact-forward algorithm): every undirected
    * edge is directed from its lower-(degree, id) endpoint to the
    * higher one, which bounds oriented out-degree by O(√m) on any
    * graph — no hub blowup. Triangles are then counted per EDGE as
    * `adj⁺(u) ∩ adj⁺(v)` with the (≤ O(√m)-element, sorted) forward
    * adjacency arrays joined onto each edge: the quadratic wedge set
    * is never materialized as rows — the candidate space lives inside
    * a row-local `array_intersect`, so shuffle volume is
    * O(m·√m·8 bytes) of packed arrays instead of O(Σ outdeg²) wedge
    * rows (measured ~8× less traffic on the co-purchase fixture, and
    * the gap widens with density). Each triangle surfaces exactly once
    * (at the edge between its two lowest-ordered corners), then
    * explodes to its 3 corners for the per-node aggregation. The
    * prologue DEDUPS the unordered pairs as SCALAR rows first
    * (hash-aggregate with map-side partial dedup — cheap fixed-width
    * state), and only then builds each node's neighbor array from
    * already-unique pairs: on multi-edge-heavy inputs (a co-purchase
    * frame emits one pair per co-occurrence) building the sets
    * directly from the duplicated stream made the array buffers the
    * hot aggregation state — measured 2× slower at the ×100 fixture
    * (SCALE.md §15). Node ids keep their input type (numeric ids
    * hash/compare/pack far cheaper than strings). The FULL-adjacency
    * build's memory bound is the MAX DEGREE (one full neighbor array
    * per aggregation buffer — ~8 bytes per neighbor, so a 10⁷-degree
    * hub costs an 80 MB row); only the oriented forward arrays
    * downstream enjoy the O(√m) cap. The hub guard is AUTOMATIC now:
    * degrees are measured first from the deduped scalar pairs (a
    * fixed-width aggregation that cannot blow up), and when the max
    * degree exceeds `hubDegreeThreshold` the orientation switches to
    * the FLAT plan — forward edges from two scalar degree joins, no
    * full-adjacency array ever built — same answers (spec-pinned),
    * one extra shuffle (SCALE.md §8). The forward arrays it still
    * builds are O(√m)-capped, safe at any hub size.
    */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String,
      hubDegreeThreshold: Long = 5000000L): DataFrame = {
    val und = undirectedPairs(edges, srcCol, dstCol)
    val degrees = pairDegrees(und)
    val triangles = triangleFrame(und, degrees, hubDegreeThreshold)
    val perNode = triangles
      .select(explode(array(col("src"), col("dst"), col("third"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
    degrees
      .join(perNode, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2,
          expr("(10000L * 2 * coalesce(triangles, 0L)) " +
            "div (degree * (degree - 1))"))
          .as("cc_e4"))
  }

  /** Normalized unordered edge set: multi-edges collapse as SCALAR
    * rows before any array is built, so the adjacency aggregations
    * downstream never buffer duplicates. Checkpointed — it feeds
    * multiple consumers. */
  private def undirectedPairs(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b"))
      .dropDuplicates("a", "b")
      .localCheckpoint(true)

  /** Degrees from the SCALAR pair rows (already unique): safe at any
    * hub size, and the basis of [[triangleFrame]]'s plan choice. */
  private def pairDegrees(und: DataFrame): DataFrame =
    und.select(col("a").as("id"), col("b").as("nbr"))
      .unionAll(und.select(col("b").as("id"), col("a").as("nbr")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("degree"))
      .localCheckpoint(true)

  /** The oriented-wedge triangle enumeration shared by the exact
    * stats and the sampled estimator: one row `(src, dst, third)` PER
    * TRIANGLE (each closes exactly once under the degree
    * orientation). */
  private def triangleFrame(und: DataFrame, degrees: DataFrame,
      hubDegreeThreshold: Long): DataFrame = {
    val sym = und.select(col("a").as("id"), col("b").as("nbr"))
      .unionAll(und.select(col("b").as("id"), col("a").as("nbr")))
    val maxDegree = degrees.agg(max(col("degree"))).head match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    // orient lower (degree, id) → higher (bounds oriented out-degree
    // by O(√m) on any graph — no hub blowup downstream). Bounded
    // graphs take the fused explode (the full adjacency is built once
    // below and doubles as the orientation source); hub graphs derive
    // forward edges from two scalar degree joins instead, so no full
    // neighbor array is ever buffered.
    val fwdE =
      if (maxDegree <= hubDegreeThreshold) {
        val adjFull = sym.groupBy(col("id"))
          .agg(collect_set(col("nbr")).as("nbrs"))
          .select(col("id"), col("nbrs"),
            size(col("nbrs")).cast("long").as("degree"))
        val degT = degrees.select(col("id").as("nbr"),
          col("degree").as("dn"))
        adjFull.select(col("id"), col("degree"),
            explode(col("nbrs")).as("nbr"))
          .join(degT, Seq("nbr"))
          .where(struct(col("degree"), col("id")) <
            struct(col("dn"), col("nbr")))
          .select(col("id").as("src"), col("nbr").as("dst"))
      } else {
        und
          .join(degrees.select(col("id").as("a"), col("degree").as("da")),
            Seq("a"))
          .join(degrees.select(col("id").as("b"), col("degree").as("db")),
            Seq("b"))
          .select(
            when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
              struct(col("a").as("src"), col("b").as("dst")))
              .otherwise(struct(col("b").as("src"), col("a").as("dst")))
              .as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
      }
    // forward adjacency, sorted so array_intersect scans cache-tight.
    // localCheckpoint pins ONE computation: adj feeds BOTH sides of
    // the triangle self-join below (exploded source side + dst
    // lookup side), and without the pin the full forward-adjacency
    // aggregation subtree runs twice whenever exchange reuse doesn't
    // kick in — the same single-computation contract und/degrees get.
    val adj = fwdE.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      .localCheckpoint(true)
    // per edge u→v: common forward neighbours close one triangle each.
    // The (src, dst, srcNbrs) triples come from EXPLODING the forward
    // adjacency itself — every forward edge is an entry of its
    // source's array, so re-deriving the edge list from adj attaches
    // srcNbrs for free and the old fwdE⋈adj(src) shuffle join (45M
    // array-carrying rows at the ×100 fixture) disappears; ONE join
    // remains, looking up the destination's array. A dst with NO
    // forward edges is absent from adj — left join + empty-array
    // default keeps those edges (they just close nothing).
    val empty = array().cast(adj.schema("nbrs").dataType)
    adj
      .select(col("src"), col("nbrs").as("srcNbrs"),
        explode(col("nbrs")).as("dst"))
      .join(adj.select(col("src").as("dst"), col("nbrs").as("dstNbrs")),
        Seq("dst"), "left")
      .select(col("src"), col("dst"),
        explode(array_intersect(col("srcNbrs"),
          coalesce(col("dstNbrs"), empty))).as("third"))
  }

  /** APPROXIMATE global triangle count by deterministic edge
    * sampling — DOULION (Tsourakakis, Kang, Miller, Faloutsos: KDD
    * 2009): keep each distinct undirected edge with probability
    * `p = pE4/10⁴`, count triangles EXACTLY on the sparsified graph
    * (the same oriented-wedge plan as [[triangleStats]], now over
    * ~p·m edges — the wedge join shrinks ~p², the closures ~p³), and
    * scale by 1/p³. The estimator is unbiased (each triangle survives
    * with probability p³) with relative standard error
    * ≈ √((p⁻³−1)/T + noise from edge-sharing triangle pairs) — at the
    * ×100 regime where the exact count runs minutes, p = 0.1 prices
    * the same read at ~1/1000 of the closure work for single-digit-%
    * error on any graph with millions of triangles. This is the
    * SERVED form at scale; the exact [[triangleStats]] stays the
    * audit key.
    *
    * Determinism: membership is a pure function of the edge's
    * endpoint values and `seed` ([[Dedup.seededHash]] md5 machinery —
    * the trainingSample/split-manifest discipline), independent of
    * partitioning and row order, so the estimate is reproducible and
    * hash-comparable across engines; `pE4 = 10⁴` keeps every edge and
    * degenerates to the exact count (spec-pinned). Integer-exact
    * arithmetic throughout: the scale-up runs in decimal(38,0) so no
    * count can overflow or round engine-dependently.
    *
    * Output (one row): `n_edges` (distinct undirected; `-1` when the
    * census is skipped), `kept_edges`, `sampled_triangles` (exact on
    * the sample), `est_triangles` (= ⌊sampled · 10¹² / pE4³⌋).
    *
    * `census = false` skips the exact distinct-edge count — the ONE
    * stage that still scans and shuffles every pair (at the ×100
    * fixture, 119.6M nearly-all-distinct edges, it is ~⅓ of the
    * run). The estimator never needs it (DOULION scales by p³ alone;
    * `kept_edges/p` estimates the census when a magnitude is wanted),
    * so the pure serving call drops it and pays only the kept
    * fraction everywhere past the row-local membership filter. With
    * `census = true` the distinct pass is unavoidable, so it is paid
    * ONCE: the deduped edge set is pinned and feeds both the count
    * and (filter-after-dedup — same set, membership is value-pure)
    * the kept sample, instead of re-scanning and re-shuffling the raw
    * pair stream a second time. The pin buys that at one edge-list
    * copy of executor storage (two longs per distinct edge). */
  def approxTriangleCount(edges: DataFrame, srcCol: String,
      dstCol: String, pE4: Int, seed: Int = 42,
      hubDegreeThreshold: Long = 5000000L,
      census: Boolean = true): DataFrame = {
    require(pE4 >= 1 && pE4 <= 10000, s"pE4 in [1,10000], got $pE4")
    val spark = edges.sparkSession
    import spark.implicits._
    val pairs = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b"))
    // membership is a pure function of the edge VALUES, so the filter
    // COMMUTES with dedup. Two consequences, one per census mode:
    // with census=false, sampling BEFORE the distinct shrinks the
    // only full-width shuffle to the kept fraction; with census=true,
    // the census's own distinct pass IS a valid dedup to sample
    // AFTER — materializing it once feeds both the count and the kept
    // set, so the raw pair stream (the basket explode) is scanned and
    // dedup-shuffled ONCE instead of twice.
    val membership = pmod(Dedup.seededHash(
      concat_ws(":", col("a"), col("b")), seed), lit(10000L)) <
      lit(pE4.toLong)
    val (nEdges, kept) =
      if (census) {
        val und = pairs.dropDuplicates("a", "b").localCheckpoint(true)
        val n = und.count()
        val k = und.where(membership).localCheckpoint(true)
        // kept is EAGERLY checkpointed above, so the full distinct
        // edge set (two longs per edge — ~2 GB at the ×100 fixture's
        // 119.6M edges) is released NOW instead of riding executor
        // storage for the rest of the session (ADVICE r14)
        und.queryExecution.analyzed match {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.unpersist(blocking = false)
          case _ => ()
        }
        (n, k)
      } else
        (-1L,
          pairs.where(membership).dropDuplicates("a", "b")
            .localCheckpoint(true))
    val nKept = kept.count()
    val nTri =
      if (nKept == 0L) 0L
      else triangleFrame(kept, pairDegrees(kept), hubDegreeThreshold)
        .count()
    val p3 = pE4.toLong * pE4 * pE4
    Seq((nEdges, nKept, nTri))
      .toDF("n_edges", "kept_edges", "sampled_triangles")
      .withColumn("est_triangles",
        expr(s"CAST(floor((CAST(sampled_triangles AS DECIMAL(38,0)) * " +
          s"1000000000000) / $p3) AS BIGINT)"))
  }

  /** Single-source HOP DISTANCES (unweighted BFS) over directed
    * edges — the reachability read beside the flow/cohesion metrics:
    * "how many steps from the seeds does each node sit" is the
    * seed-expansion radius question (crawl frontiers, contamination
    * blast radius, referral depth).
    *
    * Iterative frontier expansion over the ADJACENCY-LIST form: edges
    * collapse once into one (node, out-neighbor array) row per source
    * node — collect_set dedups multi-edges in the same aggregation —
    * and each round joins the (tiny, AQE-broadcast) frontier against
    * that node-count-sized table and explodes the matched arrays.
    * Per-round scan cost is O(nodes) rows instead of O(edges) (same
    * bytes live in the arrays, but only the frontier's rows explode),
    * which is what makes a 6-round BFS cheaper than one edge-frame
    * pass, not 6× one. Like [[triangleStats]]' prologue, the
    * adjacency build buffers one full neighbor set per node — the
    * max-degree memory bound (SCALE.md §8); a hub beyond
    * executor-buffer scale needs the flat edge-frame probe instead.
    * Newly-reached nodes (anti-joined against
    * everything settled) become the next frontier; rounds are bounded
    * by the graph's diameter (≤ `maxHops`), each checkpointed so
    * lineage stays O(1). All arithmetic is integer; the result is
    * unique (min hops is well-defined) so any engine hash-matches.
    *
    * @param undirected treat each edge as traversable both ways (the
    *        co-occurrence-graph reading); default is directed (the
    *        transition-graph reading)
    * @return (`id`, `hops`) for every node reachable within `maxHops`
    *         (sources at 0; unreachable nodes absent)
    */
  def hopDistances(edges: DataFrame, srcCol: String, dstCol: String,
      sources: Seq[String], maxHops: Int,
      undirected: Boolean = false): DataFrame = {
    require(sources.nonEmpty, "hopDistances needs at least one source")
    require(maxHops >= 0 && maxHops <= 10000,
      s"maxHops in [0,10000], got $maxHops")
    val spark = edges.sparkSession
    import spark.implicits._
    // node ids keep the edge frame's native type (numeric ids hash
    // far cheaper than strings); the string seeds are cast INTO it
    val idType = edges.select(col(srcCol)).schema.head.dataType
    val directed = edges.select(col(srcCol).as("src"),
      col(dstCol).as("dst"))
    val sym = if (undirected)
        directed.unionAll(directed.select(col("dst").as("src"),
          col("src").as("dst")))
      else directed
    // ONE aggregation replaces the edge-distinct pass AND yields the
    // adjacency table the rounds probe (collect_set dedups)
    val adj = sym.groupBy(col("src"))
      .agg(collect_set(col("dst")).as("nbrs"))
      .localCheckpoint(true)
    var frontier = sources.distinct.toDF("id")
      .select(col("id").cast(idType).as("id"), lit(0L).as("hops"))
      .localCheckpoint(true)
    // settled = lazy union of the per-round CHECKPOINTED frontiers —
    // each node's rows are materialized exactly once (at the round
    // that reached it) instead of re-checkpointing the whole growing
    // settled set every round; the union is ≤ maxHops branches of
    // already-materialized data, so lineage stays O(rounds) flat
    val rounds = scala.collection.mutable.ArrayBuffer(frontier)
    var hop = 0L
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val settled = rounds.reduce(_ unionAll _)
      frontier = frontier.select(col("id").as("src"))
        .join(adj, "src")
        .select(explode(col("nbrs")).as("id")).distinct()
        .join(settled, Seq("id"), "left_anti")
        .select(col("id"), lit(hop).as("hops"))
        .localCheckpoint(true)
      rounds += frontier
    }
    rounds.reduce(_ unionAll _)
  }

  private def step(ew: DataFrame, nodes: DataFrame, rank: DataFrame,
      baseOf: org.apache.spark.sql.Column, dampingE2: Int): DataFrame = {
    val sums = ew
      .join(rank.withColumnRenamed("id", "src"), "src")
      .select(col("dst").as("id"),
        expr("(rank_e9 * w) DIV ow").as("c"))
      .groupBy(col("id")).agg(sum(col("c")).as("s"))
    nodes.join(sums, Seq("id"), "left")
      .select(col("id"),
        (baseOf +
          expr(s"($dampingE2 * coalesce(s, 0L)) DIV 100")).as("rank_e9"))
  }
}
