package graft

/** Physical-plan regression tests — pins the plan SHAPES the 100 TB
  * design depends on (SCALE.md's audit claims), so a refactor that
  * silently turns a broadcast into a sort-merge join, loses a filter
  * pushdown, or reintroduces a cartesian product fails CI instead of
  * surfacing as a cluster-scale incident. Assertions are deliberately
  * loose (substring presence/absence on the executed plan) to stay
  * robust across Spark versions and AQE re-planning.
  */
class PlanAuditSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Final (post-AQE) executed plan string, after running the query.
    * The AQE plan's trailing `== Initial Plan ==` section is cut so
    * operator COUNTS reflect the final plan only (substring-presence
    * assertions are unaffected either way). */
  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // force execution so AQE's final plan is the one audited
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("decontamination probes a broadcast, never a sort-merge join") {
    val p = plan("decontaminate_overlap")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("timeseries scan pushes its raw time bounds into the parquet reader") {
    val p = plan("ts_counter_hour_fill")
    assert(p.contains("PushedFilters"), p.take(2000))
    assert(p.contains("GreaterThanOrEqual(ts"), p.take(2000))
    assert(p.contains("LessThan(ts"), p.take(2000))
  }

  test("embedding near-dup is a broadcast nested loop, never a cartesian") {
    val p = plan("emb_near_pairs")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("exact dedup is one hash aggregation pass, no joins in the dedup core") {
    val p = plan("dedup_exact")
    // the canonical-id map itself: aggregation + the id re-join only —
    // never a sort-merge of raw text
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("star join broadcasts every dimension side") {
    val p = plan("q5_local_supplier_volume")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("filtered ANN pushes the metadata predicate into the corpus scan") {
    val p = plan("ann_filtered_topk")
    assert(p.contains("PushedFilters"), p.take(2000))
    assert(p.contains("LessThan(label"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("PII scrub is row-local: zero shuffles, zero joins") {
    val p = plan("pii_stats")
    assert(!p.contains("Exchange"), p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("boilerplate strip: hot set broadcast, no doc-sized extra join") {
    val p = plan("boilerplate_clean")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    // 3 data shuffles: distinct (line,doc) pairs + line-df + per-doc
    // reassembly — and no 4th from a totals⋈kept doc join. Upper bound,
    // not equality: planner/AQE changes may legally merge exchanges
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3, p.take(3000))
  }

  test("bucketed cohort join: sort-merge with no exchange on either side") {
    val p = plan("bucketed_cohort_spend")
    assert(p.contains("SortMergeJoin"), p.take(3000))
    // the co-located layout is the point: the ONLY runtime exchange is
    // the final cohort aggregation — neither join input re-shuffles
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p.take(3000))
  }

  test("mixture rebalancing output is sample + single aggregation") {
    val p = plan("mix_sources_profile")
    assert(!p.contains("Join"), p.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p.take(3000))
  }

  test("composed scrub pipeline adds no shuffle beyond strip + final agg") {
    val p = plan("pipeline_scrub_profile")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // 3 strip shuffles + the final per-source aggregation; the (id,
    // source) key-restore join must not re-shuffle the strip side.
    // Upper bound: a merged exchange is fine, an extra one is the bug
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 4, p.take(3000))
  }

  test("length percentiles reuse the window partitioning for the final agg") {
    val p = plan("length_percentiles")
    // one hash partitioning on source serves both the rank window and
    // the aggregation — a second exchange would mean lost co-partitioning
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p.take(3000))
  }

  test("as-of join is one window partitioning: 1 shuffle, 0 joins") {
    val p = plan("asof_click_purchase")
    // both sides union into one window partitioning on the entity key —
    // a join formulation would explode candidate pairs per key
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(3000))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("SCD point-in-time read rides the as-of shape: no interval join") {
    val p = plan("scd_click_level")
    // the validity-interval lookup must be the union+window as-of
    // composition — an interval theta-join would pair per key
    // quadratically. (The change-log build adds its own windows; the
    // pin is on JOIN ABSENCE in the lookup, then one final count agg.)
    assert(!p.contains("Join"), p.take(3000))
  }

  test("grouping-path fan-out is one Expand + one shuffle, no joins") {
    val p = plan("ts_grouping_paths")
    // every grouping path aggregates in ONE pass (Expand feeds a single
    // partial+final agg) — versus one raw scan per path
    assert(p.contains("Expand"), p.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(3000))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("plan linter: each rule fires on its hazard, none on shipped plans") {
    import graft.plans.PlanLint
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // spark.range is an unbounded-looking source (RangeExec) — the
    // bounded-build exemption below must NOT cover it
    val d = spark.range(50).select(col("id"),
      concat(lit("s"), col("id") % 3).as("src"))
    // each pathological shape trips exactly its own rule
    val cross = d.crossJoin(d.select(col("id").as("id2")))
    assert(PlanLint.audit(cross).map(_.rule)
      .exists(r => r == "cartesian-product" || r == "unconditioned-nested-loop"))
    val win = d.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("id"))))
    assert(PlanLint.audit(win).map(_.rule)
      .contains("single-partition-window"))
    assert(PlanLint.audit(d.orderBy(col("id"))).map(_.rule)
      .contains("global-sort"))
    // legitimate shapes stay clean: partitioned window, top-k, join
    val okWin = d.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
        .orderBy(col("id"))))
    assert(PlanLint.audit(okWin).isEmpty)
    assert(PlanLint.audit(d.orderBy(col("id")).limit(5)).isEmpty)
    assert(PlanLint.audit(
      d.join(d.select(col("id"), lit(1).as("x")), Seq("id"))).isEmpty)
    // BOUNDED exemptions: attaching a 1-row aggregate, expanding
    // against a driver-literal table, and ranking a post-limit top-k
    // are the standard idioms, not hazards
    assert(PlanLint.audit(
      d.crossJoin(d.agg(count(lit(1)).as("n")))).isEmpty)
    val lut = Seq((0L, "a"), (1L, "b")).toDF("m", "v")
    assert(PlanLint.audit(d.crossJoin(lut)).isEmpty)
    val topkRank = d.orderBy(col("id").desc).limit(10)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("id"))))
    assert(PlanLint.audit(topkRank).map(_.rule)
      .forall(_ == "global-sort") &&
      !PlanLint.audit(topkRank).map(_.rule)
        .contains("single-partition-window"))
    // the bounded check is ROOT-DOWN, not a subtree search: a literal
    // lookup table joined into an unbounded frame does not launder an
    // unconditioned cross of that frame, and a buried limit in a
    // union branch does not exempt a global window over the union
    val enriched = d.join(lut.withColumnRenamed("m", "id"), Seq("id"))
    assert(PlanLint.audit(d.crossJoin(
        enriched.select(col("id").as("id2")))).nonEmpty)
    val unionWithLimit = d.select(col("id"))
      .unionByName(d.limit(3).select(col("id")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("id"))))
    assert(PlanLint.audit(unionWithLimit).map(_.rule)
      .contains("single-partition-window"))
    // and the shipped prefix-sum / similarity plans carry no findings —
    // the conditioned broadcast NLJ the near-dup join uses is NOT the
    // unconditioned hazard
    assert(PlanLint.audit(SparkEntry.queries("sample_shuffle_positions")(
      spark, sf)).isEmpty)
    assert(PlanLint.audit(SparkEntry.queries("emb_near_pairs")(
      spark, sf)).isEmpty)
  }

  test("rollup advisor: one scan + one Expand sizes every candidate") {
    val p = plan("rollup_advisor")
    // all candidates measure from ONE pass over events: the
    // grouping-sets Expand feeds the aggregation — a per-candidate
    // scan or a union of scans would show several FileScans
    assert(p.contains("Expand"), p.take(2000))
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(3000))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("moving average rides the fill: 2 shuffles, no joins, no range sort") {
    val p = plan("ts_moving_avg")
    // collapse agg + the shared series partitioning for fill/window —
    // a third exchange means the window stopped reusing the fill's
    // partitioning; a range exchange means a global sort crept in
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p.take(3000))
    assert(!p.contains("Exchange rangepartitioning"), p.take(3000))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("sequence packing shuffles once, by bucket hash — never by range") {
    // the packed frame is built from the shared two-pass RDD, so the
    // shuffle lives in the RDD lineage rather than the visible SQL
    // plan: walk the dependency graph instead. Exactly ONE shuffle
    // (the bucket hash exchange — its hashpartitioning form is
    // require()-guarded inside Packing); a second shuffle means the
    // prefix sum grew a range exchange or an extra repartition, whose
    // sampling job re-executes the token-count expression over the
    // whole corpus a second time
    val df = SparkEntry.queries("pack_sequences")(spark, sf)
    df.collect()
    val lineage = df.queryExecution.toRdd.toDebugString
    assert("ShuffledRowRDD".r.findAllIn(lineage).size == 1, lineage)
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("Join"), p.take(2000))
  }

  test("distinct series: two-phase distinct agg, pushdown intact, no joins") {
    val p = plan("ts_distinct_day")
    // COUNT DISTINCT plans as a partial dedupe on (keys, value) + the
    // distinct-count aggregation, and the join-free gap fill adds its
    // one per-series aggregation: 3 hash exchanges total, all carrying
    // aggregate-sized data. A 4th exchange or any join means the
    // collapse or the fill grew an extra pass.
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3, p.take(3000))
    assert(!p.contains("Join"), p.take(2000))
    // the raw ts range still reaches the parquet reader
    assert(p.contains("PushedFilters"), p.take(2000))
  }

  test("rare-token df join consumes pre-aggregated pairs, not occurrences") {
    // Zipfian skew guard: the df table must join onto (id, token) → cnt
    // AGGREGATES, never the raw exploded occurrence stream — on every
    // path from a join down to an explode there must be an aggregation
    // absorbing the hot-token head before the shuffle
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, Join, LogicalPlan}
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
    val df = SparkEntry.queries("rare_token_stats")(spark, sf)
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty, "expected a df join in rare_token_stats")
    def aggGated(p: LogicalPlan): Boolean = p match {
      case _: Generate => false
      case _: Aggregate => true
      case j: Join if j.joinType == LeftAnti || j.joinType == LeftSemi =>
        // the hot-set anti join is row-local (broadcast, bounded right
        // side) — it may legally sit below the pair aggregation on the
        // raw exploded stream; only its RIGHT side must be agg-derived
        aggGated(j.right)
      case other => other.children.forall(aggGated)
    }
    joins.filterNot(j => j.joinType == LeftAnti || j.joinType == LeftSemi)
      .foreach(j => j.children.foreach(side =>
        assert(aggGated(side),
          s"join side consumes an un-aggregated explode:\n$side")))
    joins.filter(j => j.joinType == LeftAnti || j.joinType == LeftSemi)
      .foreach(j => assert(aggGated(j.right),
        s"anti-join right side not aggregate-derived:\n${j.right}"))
  }

  test("routed histogram: bounds prune the partials' date partitions") {
    val p = plan("ts_routed_hist")
    // the rewrite swapped the raw scan for the (hist_bucket, count)
    // partials, and the aligned time bounds reach them as bucket_date
    // PARTITION filters — whole-directory pruning before any read
    assert(p.contains("hist_bucket"), p.take(2000))
    assert("PartitionFilters: \\[[^\\]]*bucket_date".r
      .findFirstIn(p).isDefined, p.take(3000))
  }

  test("mixed multi-fact read: two disjoint fact-pruned scans, no join") {
    val p = plan("ts_multi_mixed")
    // one pipeline per fact TYPE under a Union, never a join; each
    // scan carries the ts bounds as pushed filters AND its own type's
    // fact predicate folded into the scan filter (Catalyst pushes the
    // isin through the when/otherwise fact mapping), so the two scans
    // read DISJOINT row sets — together, one scan of the requested
    // facts
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("Union"), p.take(2000))
    assert("FileScan parquet".r.findAllIn(p).size == 2, p.take(3000))
    assert("GreaterThanOrEqual\\(ts".r.findAllIn(p).size >= 2, p.take(3000))
    // the per-type complement predicates that make the scans disjoint
    assert(p.contains("(event_type"), p.take(3000))
  }

  test("rollup-served multi read: the dashboard never scans the event store") {
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val p = try plan("ts_multi_routed")
      finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    // with every fact's rollup registered, the product's hottest read
    // (the k-tile dashboard refresh) is O(rollup): each tile rides its
    // registered partials (here the hierarchical day tier) and the raw
    // event store appears NOWHERE in the plan — at 100 TB this is the
    // difference between reading KBs of partials and a full scan
    assert(!p.contains("events.parquet"), p.take(3000))
    assert(p.contains("graft_multi_mv"), p.take(3000))
    // one pruned rollup scan per fact under the union, never a join
    assert(!p.contains("Join"), p.take(2000))
    assert("FileScan parquet".r.findAllIn(p).size == 2, p.take(3000))
  }

  test("rollup-served FOUR-TYPE multi read: only partial stores are scanned") {
    import graft.model.{FactType, Step}
    import graft.functions.TimeKernel.ts
    val svc = new TimeSeriesService(spark)
    svc.defineFact("cnt", FactType.Counter, slice = 10)
    svc.defineFact("lat", FactType.Average, slice = 10)
    svc.defineFact("uniq", FactType.Distinct, slice = 10)
    svc.defineFact("h1", FactType.Histogram, slice = 10,
      start = Some(0L), end = Some(50L), step = Some(10L))
    svc.defineDimension("dep", facts = Set("cnt", "lat", "uniq", "h1"))
    for (i <- 0 until 6) {
      val dep = Map("dep" -> "d0")
      val t = ts(f"2014-03-21T${9 + i % 2}%02d:1$i")
      svc.newFact("cnt", t, 1L, dep); svc.newFact("lat", t, 10L + i, dep)
      svc.newFact("uniq", t, (i % 3).toLong, dep)
      svc.newFact("h1", t, (i * 9).toLong, dep)
    }
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_plan_multi4").toString
    svc.materializeRollups(tmp)
    val df = svc.getTimeseriesMulti(Seq("cnt", "uniq", "lat", "h1"),
      "dep", Map("dep" -> None),
      ts("2014-03-21T09:00"), ts("2014-03-21T12:00"), Step.Hour)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // with every type's rollup registered, even the FOUR-TYPE
    // dashboard (hist + distinct tiles included) is O(rollup): the
    // raw in-memory events (a LocalTableScan here) appear NOWHERE —
    // each tile is one pruned parquet scan of its partial store
    assert(!p.contains("LocalTableScan"), p.take(3000))
    assert(!p.contains("Join"), p.take(2000))
    assert("FileScan parquet".r.findAllIn(p).size == 4, p.take(4000))
  }

  test("streaming-store multi read: tiles scan maintained partials only") {
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val p = try plan("ts_multi_stream")
      finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    // the stream's raw input feeds MAINTENANCE (query construction);
    // the served read must scan only the maintained partial stores
    assert(!p.contains("events.parquet"), p.take(3000))
    assert(p.contains("graft_streamroll"), p.take(3000))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("four-type streaming dashboard: every tile scans its maintained store") {
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val p = try plan("ts_multi_stream4")
      finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    // four partial SHAPES (counter, tall-dval distinct, (counter,total)
    // average, bucketed histogram), four maintained stores, zero raw
    // event access in the served read
    assert(!p.contains("events.parquet"), p.take(3000))
    assert(p.contains("graft_streamroll"), p.take(3000))
    assert(!p.contains("Join"), p.take(2000))
    assert("FileScan parquet".r.findAllIn(p).size == 4, p.take(4000))
  }

  test("date-partitioned raw events: date bounds prune event_date= dirs") {
    val p = plan("events_date_partitioned")
    // the RAW deployment layout's pruning claim, driven end to end:
    // the read's date bounds must reach the scan as PARTITION filters
    // (whole-directory pruning at the partition index), with the ts
    // bounds still pushed to the row-group level underneath
    assert("PartitionFilters: \\[[^\\]]*event_date".r.findFirstIn(p)
      .isDefined, p.take(3000))
    assert(p.contains("PushedFilters"), p.take(3000))
    assert(p.contains("GreaterThanOrEqual(ts"), p.take(3000))
  }

  test("persisted IVF store: the probe set prunes part= directories") {
    val p = plan("ann_ivf_persisted")
    // the probe ids must reach the vector store as a PARTITION filter
    // (whole-directory pruning) — a data filter on part would mean the
    // serving layout is being full-scanned at 100 TB
    assert("PartitionFilters: \\[[^\\]]*part".r.findFirstIn(p).isDefined,
      p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("attribution: banded equality join, no cartesian, one window family") {
    val p = plan("attribution_touch")
    // the trailing-hour touch collection must ride the bucketed
    // equality join — a per-key cartesian or range BNLJ would explode
    // at clickstream scale
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("cube fan-out: one Expand feeds one aggregation pass") {
    val p = plan("events_cube")
    assert(p.contains("Expand"), p.take(2000))
    // Expand + partial/final agg = a single exchange; per-marginal
    // rescans would show several
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p.take(3000))
  }

  test("ewma/autocov: one per-entity partitioning, no joins") {
    for (q <- Seq("event_ewma", "series_autocov")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q grew a join:\n" + p.take(2000))
      assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
        s"$q shuffles more than entity+agg:\n" + p.take(3000))
    }
  }

  test("hybrid rerank: candidate-bounded joins, no cartesian") {
    val p = plan("hybrid_search")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the query-vector side must broadcast (|queries| rows)
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("series similarity/lag: dense-grid cross joins broadcast the small side") {
    for (q <- Seq("series_similarity", "series_lag_profile")) {
      val p = plan(q)
      // the |entities| × |days| grid must be a broadcast NLJ with the
      // tiny calendar side shipped — a CartesianProduct would pair
      // partitions of two large sides
      assert(!p.contains("CartesianProduct"), s"$q:\n" + p.take(2000))
    }
  }

  test("rolling WAU: fan-out rides distinct user-day pairs, no cartesian") {
    val p = plan("rolling_wau")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("Expand") || p.contains("distinct"), p.take(3000))
  }

  test("BM25 postings store: query-term buckets prune part= directories") {
    val p = plan("text_bm25_indexed")
    // the terms' md5 buckets must reach the postings store as a
    // PARTITION filter — a data filter on part would full-scan the
    // index at corpus scale
    assert("PartitionFilters: \\[[^\\]]*part".r.findFirstIn(p).isDefined,
      p.take(3000))
    // and the exact-term filter pushes into the pruned parquet read
    assert(p.contains("PushedFilters"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("erased BM25 serve: part= pruning survives, tombstones are a " +
      "broadcast anti join") {
    val p = plan("text_bm25_erased")
    // erasure must not cost the index its scale story: the query-term
    // buckets still reach the postings store as a PARTITION filter
    assert("PartitionFilters: \\[[^\\]]*part".r.findFirstIn(p).isDefined,
      p.take(3000))
    // and the tombstone exclusion is a broadcast anti join (the
    // deletion-request side is small by construction) — a shuffled
    // anti join here would re-key the pruned read at corpus scale
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      p.take(3000))
    assert(!p.contains("SortMergeJoin LeftAnti"), p.take(3000))
  }

  test("erased IVF serve: probes still prune part= dirs; exclusion is " +
      "broadcast anti") {
    val p = plan("ann_erased_topk")
    assert("PartitionFilters: \\[[^\\]]*part".r.findFirstIn(p).isDefined,
      p.take(3000))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("spilled event store: time range prunes whole date partitions") {
    import spark.implicits._
    import graft.functions.TimeKernel.ts
    val svc = new TimeSeriesService(spark)
    svc.defineFact("signups", graft.model.FactType.Counter, slice = 10)
    svc.defineDimension("dependency", facts = Set("signups"))
    // 40 single-event frames across 4 distinct dates cross the spill
    // threshold, so the store holds __batch_id=*/__event_date=* dirs
    for (i <- 0 until 40)
      svc.ingest(Seq(graft.model.Event("signups",
        ts(f"2014-03-${10 + i % 4}%02dT09:15"), 1L,
        Map("dependency" -> "31"))).toDF())
    val df = svc.getTimeseries("signups", "dependency",
      Map("dependency" -> Some("31")),
      ts("2014-03-11T00:00"), ts("2014-03-11T23:59"))
    // correctness first: exactly the 10 day-11 events
    assert(df.collect().map(_.getLong(2)).sum == 10L)
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the ts range must be restated on the store's partition column —
    // whole date directories drop out of the partition index before a
    // byte of parquet is read (the 100 TB narrow-window read path);
    // row-group min/max alone would still open every footer
    assert("PartitionFilters: \\[[^\\]]*__event_date".r.findFirstIn(p).isDefined,
      p.take(3000))
    // and the artifact column never reaches the result schema
    assert(!df.columns.contains("__event_date"))
  }

  test("q6 scan-aggregate: every predicate pushed, schema pruned to 4 cols") {
    // plan strings elide scan metadata at 100 chars by default — widen
    // so the full PushedFilters list is assertable
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val p = try plan("q6_forecast_revenue")
      finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert(p.contains("PushedFilters"), p.take(2000))
    // all three predicate families reach the parquet reader
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p.take(3000))
    assert(p.contains("GreaterThanOrEqual(l_discount"), p.take(3000))
    assert(p.contains("LessThan(l_quantity"), p.take(3000))
    // column pruning: only the 4 referenced columns are read
    val read = "ReadSchema: [^\n]*".r.findFirstIn(p).getOrElse("")
    assert(Seq("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
      .forall(read.contains), read)
    assert(!read.contains("l_orderkey") && !read.contains("l_comment"), read)
  }

  test("IVF-PQ: probes prune part= dirs; the ADC scan never reads embeddings") {
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val p = try plan("ann_ivfpq_topk")
      finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    // the probe set must land as a partition filter on the store
    assert("PartitionFilters: \\[[^\\]]*part".r.findFirstIn(p).isDefined,
      p.take(3000))
    // the candidate stage projects (id, pq_codes): its scan's schema
    // must NOT include the float embedding column — that is the IO win
    // the code layout exists for
    val schemas = "ReadSchema: [^\n]*".r.findAllIn(p).toSeq
    val codeScans = schemas.filter(_.contains("pq_codes"))
    assert(codeScans.nonEmpty, schemas.mkString("\n"))
    assert(codeScans.forall(!_.contains("embedding")),
      codeScans.mkString("\n"))
  }

  test("bigram LM: context counts come from a window, never an occurrence join") {
    val p = plan("text_bigram_lm")
    // one hash aggregation on pair keys + one window over the
    // aggregated pair table — a join would mean the occurrence stream
    // was re-scanned (the Zipf-head skew shape rareTokenStats had)
    assert(p.contains("Window"), p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
  }

  test("interpolation fill: both neighbour scans share ONE window exchange") {
    val p = plan("ts_interp_fill")
    // per-series map agg + grid explode + neighbour windows: the two
    // directional scans must ride a single series partitioning — a
    // second window exchange would double the shuffle at scale
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"$exchanges exchanges\n" + p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
    // and never a global (single-partition) sort
    assert(!p.contains("Exchange SinglePartition"), p.take(3000))
  }

  test("q1 revenue MV: the routed pricing summary never scans lineitem") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val df = SparkEntry.queries("q1_routed_mv")(spark, sf)
    df.collect()
    val paths = df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
      case _ => Nil
    }
    assert(paths.exists(_.contains("graft_mv_q1")),
      s"MV not scanned: $paths")
    assert(!paths.exists(_.contains("lineitem")),
      s"raw lineitem still scanned: $paths")
  }

  test("bloom semi-join: row-local might_contain gates the fact scan " +
      "below the exact join") {
    val p = plan("events_bloom_semijoin")
    // the probe must appear as a plain Filter expression (codegen'd,
    // pre-shuffle), and the exact join must still exist above it
    assert(p.contains("might_contain"), p.take(3000))
    assert(p.contains("LeftSemi"), p.take(3000))
    val probeAt = p.indexOf("might_contain")
    val joinAt = p.indexOf("Join LeftSemi") max p.indexOf("LeftSemi")
    // executed plans print top-down: the join line precedes the
    // deeper filter line
    assert(joinAt < probeAt,
      s"probe not below the exact join:\n" + p.take(3000))
  }

  test("bloom decontamination: the probe filter sits below the verify " +
      "join and admits every true hit") {
    val p = plan("decontaminate_bloom")
    assert(p.contains("might_contain"), p.take(3000))
    // the exact verify join still runs (exactness is restored there)
    assert(p.contains("Join") || p.contains("BroadcastHashJoin"),
      p.take(3000))
  }

  test("cusum: both statistics ride ONE per-entity sort, no joins") {
    val p = plan("event_cusum")
    assert(!p.contains("Join"), p.take(2000))
    // prefix sums + running mins share the (entity, order) window
    // spec: one hash exchange, one sort — a second sort would mean
    // the two window passes stopped sharing their partitioning
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      p.take(3000))
    assert("Sort ".r.findAllIn(p).size <= 1, p.take(3000))
  }

  test("holt: one aggregation exchange, no window, no join") {
    val p = plan("series_holt")
    assert(!p.contains("Join"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      p.take(3000))
  }

  test("a-priori pairs: the frequent-item prune is a broadcast semi-join") {
    val p = plan("basket_frequent_pairs")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("triangles: no cartesian; the degree joins broadcast") {
    val p = plan("basket_triangles")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("routed cusum: the window's aggregate input scans the partials") {
    val p = plan("ts_cusum_routed")
    // the rewrite must fire UNDER the window operators: the daily
    // series comes from a registered partials store, never raw
    // events. WHICH store is registration-order dependent across the
    // suite (another spec may have registered a histogram tall store
    // for the same raw source first — equally exact), so pin the
    // property, not the directory name.
    assert(p.contains("partials"), p.take(3000))
    assert(!p.contains("events.parquet"), p.take(3000))
    assert(p.contains("Window"), p.take(2000))
  }

  test("quality gate: N row-local checks fuse into ONE scan-aggregate") {
    import org.apache.spark.sql.functions.{col, length}
    import graft.operators.Quality
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val rep = Quality.report(li, Seq(
      Quality.NotNull("l_orderkey"),
      Quality.NotNull("l_shipdate"),
      Quality.Satisfies("qty_pos", col("l_quantity") > 0),
      Quality.Satisfies("flag_1ch", length(col("l_returnflag")) === 1)))
    // four checks, one pass: exactly one leaf scan in the plan —
    // adding row-local constraints must add agg columns, never scans
    val leaves = rep.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size == 1, rep.queryExecution.optimizedPlan.toString)
    assert(rep.collect().forall(_.getString(2) == "pass"))
  }

  test("label outliers: centroid sums broadcast; scoring has no second explode") {
    val p = plan("emb_label_outliers")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    // exactly one Generate (the centroid-sum posexplode); the
    // per-vector score must stay row-local zip_with/aggregate
    assert("Generate".r.findAllIn(p).size == 1, p.take(3000))
  }

  test("next-event examples: both window frames share one user exchange") {
    val p = plan("event_next_examples")
    // one hashpartitioning exchange on user_id serves collect_list+lag
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("source overlap matrix: posting join only — no cartesian, no BNLJ") {
    val p = plan("source_overlap_matrix")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("corpus manifest: one scan, one aggregate, no join") {
    val p = plan("corpus_manifest")
    assert(!p.contains("Join"), p.take(2000))
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(2000))
  }

  test("fim examples: ZERO exchanges — pure row-local slicing") {
    val p = plan("fim_examples")
    assert(!p.contains("Exchange"), p.take(3000))
  }

  test("span corruption: one doc-id exchange serves window + reassembly") {
    val p = plan("span_corruption_examples")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 2, p.take(3000)) // ordinal window + final agg
    assert(!p.contains("Join"), p.take(2000))
  }

  test("cohort drift: one scan, no join") {
    val p = plan("emb_cohort_drift")
    assert(!p.contains("Join"), p.take(2000))
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(2000))
  }

  test("co-occurrence pairs: one hash equi-join, top-k, never a range join") {
    val df = SparkEntry.queries("text_cooccurrence")(spark, sf)
    // the project's own linter is the arbiter: the pair join must be
    // an EQUI hash join on (doc, position) — a position-band condition
    // would compile to an unconditioned nested loop the linter bans —
    // and the only nested loop allowed is the bounded 1-row Σ-stats
    // combine (the linter's bounded-broadcast exemption)
    assert(graft.plans.PlanLint.audit(df).isEmpty,
      graft.plans.PlanLint.audit(df).toString)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // ranking serves as TakeOrdered, not a global sort
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("series similarity is sparse: no dense user×day grid in the plan") {
    val p = plan("series_similarity")
    // the distance is computed over the SPARSE user-day rows plus a
    // broadcast query series and a 1-row Σqc² constant — never a
    // users.crossJoin(days) dense grid; the only nested-loop join
    // allowed is the single-row stats combine
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("entity resolution: fuzzy work never touches the records table twice") {
    val p = plan("er_part_matches")
    // no cartesian anywhere; the match set comes off the token posting
    // join over DISTINCT values
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("levenshtein"), p.take(2000))
  }

  /** Executed plan of a [[SparkEntry.planProbes]] internal frame. */
  private def probePlan(name: String): String = {
    val df = SparkEntry.planProbes(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("PQ operating grid: every cell derives from ONE scored pool — " +
      "no per-cell store rescan") {
    // round-14 one-pass grid (Similarity.pqGridCells): the union's cell
    // branches rank over the checkpointed pool (Scan ExistingRDD);
    // a parquet scan or a broadcast here would mean a cell re-executed
    // its own serve again
    val p = probePlan("ann_pq_stamped__grid_cells")
    assert(p.contains("Union"), p.take(2000))
    assert(p.contains("Scan ExistingRDD"), p.take(2000))
    assert(!p.contains("Scan parquet"), p.take(2000))
    assert(!p.contains("BroadcastExchange"), p.take(2000))
  }

  test("sampled triangles (census mode): the kept set is a row-local " +
      "filter over the pinned census, never a second pair-stream pass") {
    val p = probePlan("basket_triangles_approx__kept_after")
    assert(p.contains("Scan ExistingRDD"), p.take(2000))
    assert(!p.contains("Scan parquet"), p.take(2000))
    assert(!p.contains("Exchange"), p.take(2000))
  }
}
