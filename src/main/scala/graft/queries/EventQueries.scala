package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.functions.TimeKernel
import graft.functions.TimeKernel.ts
import graft.model.{FactDef, FactType, Step}
import graft.operators.Timeseries

/** Driver-checkable timeseries queries over the synthetic `events` table
  * (`event_id, ts, user_id, event_type, value, props`), exercising the
  * engine's operator pipeline (SURVEY §2: O7, O13–O21) with DuckDB-SQL
  * oracles over the same parquet.
  *
  * Adapter mapping: `event_type` is a flat dimension; `user_bucket`
  * (= user_id mod 10, stringified — dimension values are strings, SURVEY
  * §1.2) is a dimension grouped under `event_type`. Monetary `value`
  * becomes integral cents so sums stay exact longs (FP-sum order would
  * otherwise make the DuckDB hash-compare flaky).
  */
object EventQueries {

  // Facts: the catalog definitions these queries run under.
  val countFact = FactDef("events_count", FactType.Counter, sliceMinutes = 15)
  val avgFact = FactDef("value_avg", FactType.Average, sliceMinutes = 15)
  val distinctFact = FactDef("uniq_users", FactType.Distinct, sliceMinutes = 15)
  val histFact = FactDef("value_hist", FactType.Histogram, sliceMinutes = 15,
    start = Some(0L), end = Some(200L), step = Some(20L))
  val userDimGroupedBy: Seq[Seq[String]] = Seq(Seq("event_type"))

  /** The synthetic events.parquet — `ts` normalized to TIMESTAMP
    * whatever the fixture's stored type (nanos BIGINT / TIMESTAMP_NTZ /
    * TIMESTAMP; it has varied across driver rounds), via the
    * schema-adaptive [[graft.sources.EventSource.wideEvents]]. */
  private def events(spark: SparkSession, dir: String): DataFrame =
    graft.sources.EventSource.wideEvents(spark, dir)

  /** Range-pruned events: the scan bounds are expressed on the RAW
    * stored column in its native type before the timestamp conversion,
    * so they reach the parquet reader as PushedFilters (row-group
    * min/max pruning) — a post-conversion predicate would be opaque to
    * pushdown, and at 100 TB an unpruned time-range scan is the
    * dominant cost. Bounds replicate Timeseries.scan's inclusive
    * bucketed endpoints: [sliceFloor(start), sliceFloor(finish)+slice). */
  private def eventsRanged(spark: SparkSession, dir: String,
      start: String, finish: String, slice: Int = 15): DataFrame = {
    val loSec = TimeKernel.sliceFloorLocal(ts(start), slice)
      .toInstant.getEpochSecond
    val hiSec = TimeKernel.sliceFloorLocal(ts(finish), slice)
      .toInstant.getEpochSecond + slice * 60L
    graft.sources.EventSource.wideEvents(spark, dir, Some((loSec, hiSec)))
  }

  private val userBucket: Column =
    (col("user_id") % 10).cast(StringType).as("user_bucket")

  /** The per-user event-type TRANSITION graph both PageRank queries
    * rank: edge (a → b, w) = how often b immediately follows a in
    * some user's stream (ordered by ts, then event_id for same-second
    * determinism). One derivation — the global and personalized
    * queries must never diverge on what the graph IS. */
  private def transitionEdges(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .where(col("dst").isNotNull)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
  }

  /** Full-history last-writer CDC state — the one oracle both the
    * batch snapshot-composition query and the streaming maintained-
    * state twin must hash-match. */
  private val cdcStateOracle: String =
    """WITH ranked AS (
      |  SELECT user_id, event_type,
      |    CAST(round(value * 100) AS BIGINT) AS last_cents,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id, event_type AS last_type, last_cents
      |FROM ranked WHERE rn = 1 AND event_type <> 'error'""".stripMargin

  /** Unrolled 5-iteration integer-PageRank oracle over the transition
    * graph — ONE arithmetic for both query oracles; the node set,
    * init, r0, and per-step restart-mass expressions are injected
    * (uniform vs seed-gated). */
  private def pageRankOracleSql(nodesSql: String, initSql: String,
      r0Sql: String, stepBaseSql: String): String = {
    val iters = (0 until 5).map { k =>
      s"""r${k + 1} AS (
         |  SELECT n.id,
         |    $stepBaseSql
         |      + (85 * coalesce(s.s, 0)) // 100 AS rank_e9
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS id, sum((r.rank_e9 * e.w) // o.ow) AS s
         |    FROM e JOIN r$k r ON r.id = e.src
         |    JOIN ow o ON o.src = e.src
         |    GROUP BY e.dst) s ON s.id = n.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH seq AS (
       |  SELECT event_type AS src, lead(event_type) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id) AS dst
       |  FROM events),
       |e AS (SELECT src, dst, count(*) AS w FROM seq
       |      WHERE dst IS NOT NULL GROUP BY 1, 2),
       |ow AS (SELECT src, sum(w) AS ow FROM e GROUP BY 1),
       |nodes AS ($nodesSql),
       |init AS ($initSql),
       |r0 AS ($r0Sql),
       |$iters
       |SELECT id AS event_type, CAST(rank_e9 AS BIGINT) AS rank_e9
       |FROM r5""".stripMargin
  }

  /** Prepared frame for the Timeseries pipeline: grouping dims + ts +
    * value; when the query range is known it is pushed onto the raw
    * nanos column ([[eventsRanged]]) for parquet row-group pruning. */
  private def prep(spark: SparkSession, dir: String, withUser: Boolean,
      value: Column, range: Option[(String, String)] = None): DataFrame = {
    val dims: Seq[Column] =
      if (withUser) Seq(col("event_type"), userBucket) else Seq(col("event_type"))
    val src = range match {
      case Some((s, f)) => eventsRanged(spark, dir, s, f)
      case None => events(spark, dir)
    }
    src.select(dims :+ col("ts") :+ value.as("value"): _*)
  }

  private val one = lit(1L)
  private val cents = round(col("value") * 100).cast(LongType)

  /** Raw frame for the routed-SQL query: monetary value as exact cents
    * so sums/avgs re-aggregate bit-identically from partials. */
  private def routedRaw(s: SparkSession, dir: String): DataFrame =
    events(s, dir).withColumn("value", cents)

  /** Materialize + register the slice partials for [[routedRaw]] once
    * per (session, sf dir) — queries then measure the ROUTED read path,
    * the deployment shape where the rollup already exists. */
  private val routedDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def ensureRouted(s: SparkSession, dir: String): Unit =
    routedDirs.getOrElseUpdate((s, dir), {
      import graft.operators.Rollups
      import graft.plans.RollupRouting
      val out = java.nio.file.Files.createTempDirectory("graft_partials").toString
      Rollups.materializePartials(routedRaw(s, dir), Seq("event_type"), out)
      RollupRouting.install(s)
      RollupRouting.register(s, routedRaw(s, dir), Rollups.read(s, out),
        Seq("event_type"))
      out
    })

  /** Distinct tall partials for the routing rule, registered once per
    * (session, sf dir): COUNT(DISTINCT user_id) aggregates over the
    * raw events route onto them transparently. Built with
    * [[Rollups.distinctPartials]] (NOT the service write path's
    * [[Rollups.materialize]]): the rule rewrites arbitrary user SQL
    * whose GROUP BY keeps null-dimension groups, so the registered
    * store must keep them too — the service path's null-skip matches
    * the reference's `event-key` write semantics but would silently
    * drop the NULL event_type group from a routed plan. */
  private val routedDistinctDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def ensureRoutedDistinct(s: SparkSession, dir: String): Unit =
    routedDistinctDirs.getOrElseUpdate((s, dir), {
      import graft.operators.Rollups
      import graft.plans.RollupRouting
      val out = java.nio.file.Files
        .createTempDirectory("graft_dpartials").toString
      Rollups.materializeDistinctPartials(events(s, dir),
        Seq("event_type"), out, valueCol = "user_id")
      RollupRouting.install(s)
      RollupRouting.registerDistinct(s, events(s, dir),
        Rollups.read(s, out), Seq("event_type"), valueCol = "user_id")
      out
    })

  /** Day-grain DISTINCT tier over [[ensureRoutedDistinct]]'s tall
    * partials, built and registered once per (session, sf dir): with
    * both distinct tiers live, day+ COUNT DISTINCT queries serve from
    * one row per (dims, day, value). */
  private val routedDistinctDayDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def ensureRoutedDistinctDay(s: SparkSession, dir: String): Unit = {
    ensureRoutedDistinct(s, dir)
    routedDistinctDayDirs.getOrElseUpdate((s, dir), {
      import graft.operators.Rollups
      import graft.plans.RollupRouting
      val out = java.nio.file.Files
        .createTempDirectory("graft_ddaypartials").toString
      Rollups.materializeDistinctDayPartials(
        Rollups.read(s, routedDistinctDirs((s, dir))), out)
      RollupRouting.registerDistinctDayGrain(s, events(s, dir),
        Rollups.read(s, out), Seq("event_type"), valueCol = "user_id")
      out
    })
    ()
  }

  /** Day-grain tier over [[ensureRouted]]'s slice partials, built and
    * registered once per (session, sf dir): with both tiers live, the
    * rule serves day+ queries from ~96× fewer rows. */
  private val routedDayDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def ensureRoutedDay(s: SparkSession, dir: String): Unit = {
    ensureRouted(s, dir)
    routedDayDirs.getOrElseUpdate((s, dir), {
      import graft.operators.Rollups
      import graft.plans.RollupRouting
      val out = java.nio.file.Files
        .createTempDirectory("graft_daypartials").toString
      Rollups.materializeDayPartials(
        Rollups.read(s, routedDirs((s, dir))), out)
      RollupRouting.registerDayGrain(s, routedRaw(s, dir),
        Rollups.read(s, out), Seq("event_type"))
      out
    })
    ()
  }

  /** Histogram tall partials for the routing rule, registered once per
    * (session, sf dir): `count(*) GROUP BY histBucket(value)` plans
    * over the raw events route onto (hist_bucket, count) partials —
    * built null-KEEPING like the distinct registration. */
  private val routedHistDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def ensureRoutedHist(s: SparkSession, dir: String): Unit =
    routedHistDirs.getOrElseUpdate((s, dir), {
      import graft.operators.{Rollups, Timeseries}
      import graft.plans.RollupRouting
      val out = java.nio.file.Files
        .createTempDirectory("graft_hpartials").toString
      Rollups.materializeHistogramPartials(events(s, dir),
        Seq("event_type"), Timeseries.histBucket(histFact), out)
      RollupRouting.install(s)
      RollupRouting.registerHistogram(s, events(s, dir),
        Rollups.read(s, out), Seq("event_type"),
        Timeseries.histBucket(histFact))
      out
    })

  /** The scan's inclusive-bucket upper bound, for oracle parity:
    * ts < slice(finish) + slice. */
  private def hi(finish: String, slice: Int = 15): String =
    TimeKernel.sliceFloorLocal(ts(finish), slice).toInstant
      .plusSeconds(slice * 60L).toString.replace("T", " ").replace("Z", "")

  private def lo(start: String, slice: Int = 15): String =
    TimeKernel.sliceFloorLocal(ts(start), slice).toInstant
      .toString.replace("T", " ").replace("Z", "")

  // ---------------------------------------------------------------- queries

  /** Two-phase (build, read) decomposition of a lifecycle query: the
    * BUILD thunk runs the state mutation (ingests, spill, expire,
    * erase, batch writes) and the READ thunk serves from the built
    * state. [[graft.Bench]] times the phases separately — these
    * queries deliberately measure the full lifecycle, and without the
    * split a real serving regression hides inside build noise (round-8
    * verdict). The combined `queries` entries stay exactly
    * `build(); read()`, so the correctness gate is unchanged. */
  private def asofBatchPhases(s: SparkSession,
      dir: String): (() => Unit, () => DataFrame) = {
    import graft.TimeSeriesService
    val svc = new TimeSeriesService(s)
    val build = () => {
      svc.defineFact("events_count", FactType.Counter, slice = 15)
      svc.defineDimension("event_type", facts = Set("events_count"))
      val store = java.nio.file.Files
        .createTempDirectory("graft_asof").toString + "/store"
      svc.attachEventStore(store)
      val ev = eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00")
      (0 to 2).foreach { b =>
        svc.ingest(ev.where(col("event_id") % 3 === b)
          .select(lit("events_count").as("fact"), col("ts"),
            lit(1L).as("value"),
            map(lit("event_type"), col("event_type")).as("categories")),
          b.toLong)
      }
    }
    val read = () => svc.getTimeseriesAsOf("events_count", "event_type",
      Map("event_type" -> Some("click")),
      ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), maxBatchId = 1L,
      Step.Hour)
    (build, read)
  }

  private def lifecycleDay(s: SparkSession, dir: String, d: Int,
      withUserBucket: Boolean): DataFrame = {
    val cats =
      if (withUserBucket)
        map(lit("event_type"), col("event_type"),
          lit("user_bucket"), pmod(col("user_id"), lit(5)).cast("string"))
      else map(lit("event_type"), col("event_type"))
    events(s, dir)
      .where(col("ts") >= lit(java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"))
        && col("ts") < lit(java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 00:00:00")))
      .select(lit("events_count").as("fact"), col("ts"),
        lit(1L).as("value"), cats.as("categories"))
  }

  private def retentionPhases(s: SparkSession,
      dir: String): (() => Unit, () => DataFrame) = {
    import graft.TimeSeriesService
    val svc = new TimeSeriesService(s, spillDepth = 2)
    val build = () => {
      svc.defineFact("events_count", FactType.Counter, slice = 15)
      svc.defineDimension("event_type", facts = Set("events_count"))
      svc.ingest(lifecycleDay(s, dir, 5, withUserBucket = false))
      svc.ingest(lifecycleDay(s, dir, 6, withUserBucket = false))
      svc.ingest(lifecycleDay(s, dir, 7, withUserBucket = false))
      val base = java.nio.file.Files
        .createTempDirectory("graft_retain").toString
      svc.expireEvents(ts("2024-01-07T00:00"), base)
      ()
    }
    val read = () => svc.getTimeseries("events_count", "event_type",
      Map("event_type" -> Some("click")),
      ts("2024-01-05T00:00"), ts("2024-01-07T23:45"), Step.Day)
    (build, read)
  }

  private def erasurePhases(s: SparkSession,
      dir: String): (() => Unit, () => DataFrame) = {
    import graft.TimeSeriesService
    val svc = new TimeSeriesService(s, spillDepth = 2)
    val build = () => {
      svc.defineFact("events_count", FactType.Counter, slice = 15)
      svc.defineDimension("event_type", facts = Set("events_count"))
      svc.ingest(lifecycleDay(s, dir, 5, withUserBucket = true))
      svc.ingest(lifecycleDay(s, dir, 6, withUserBucket = true))
      svc.ingest(lifecycleDay(s, dir, 7, withUserBucket = true))
      val out = java.nio.file.Files
        .createTempDirectory("graft_erase").toString
      svc.eraseEvents(
        element_at(col("categories"), "user_bucket") === "3", out)
      ()
    }
    val read = () => svc.getTimeseries("events_count", "event_type",
      Map("event_type" -> Some("click")),
      ts("2024-01-05T00:00"), ts("2024-01-07T23:45"), Step.Day)
    (build, read)
  }

  /** The rollup-served dashboard's two phases: build = catalog DDL +
    * ingest + rollup materialization (the deployment-time cost), read
    * = the tier-routed [[graft.TimeSeriesService.getTimeseriesMulti]]
    * over the registered partials (the serving latency the dashboard
    * user sees — PlanAuditSpec pins it compiles with NO event-store
    * scan). The combined `ts_multi_routed` query times both in one
    * number; this split is what makes the serving claim measurable. */
  private def multiRoutedPhases(s: SparkSession,
      dir: String): (() => Unit, () => DataFrame) = {
    import graft.TimeSeriesService
    val svc = new TimeSeriesService(s)
    val build = () => {
      svc.defineFact("clicks_count", FactType.Counter, slice = 15)
      svc.defineFact("spend_avg", FactType.Average, slice = 15)
      svc.defineDimension("user_bucket",
        facts = Set("clicks_count", "spend_avg"))
      val ev = eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00")
        .where(col("event_type").isin("click", "purchase"))
        .select(
          when(col("event_type") === "click", lit("clicks_count"))
            .otherwise(lit("spend_avg")).as("fact"),
          col("ts"),
          when(col("event_type") === "click", lit(1L))
            .otherwise(cents).as("value"),
          map(lit("user_bucket"),
            (col("user_id") % 4).cast("string")).as("categories"))
      svc.ingest(ev)
      svc.materializeRollups(java.nio.file.Files
        .createTempDirectory("graft_multi_mv").toString)
      ()
    }
    val read = () => svc.getTimeseriesMulti(
      Seq("clicks_count", "spend_avg"),
      "user_bucket", Map("user_bucket" -> None),
      ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Day)
    (build, read)
  }

  /** The routing-introspection two phases: build = the fixture's store
    * lifecycle (DDL + ingest + materialize + register + the late
    * fact), read = [[graft.TimeSeriesService.explainRoute]] itself —
    * which touches NO store bytes (it is catalog + registration-map
    * algebra), so its `__read` must sit at milliseconds; the combined
    * `ts_route_explain` bench number is ~all store materialization. */
  private def routeExplainPhases(s: SparkSession,
      dir: String): (() => Unit, () => DataFrame) = {
    import graft.TimeSeriesService
    val svc = new TimeSeriesService(s)
    val build = () => {
      svc.defineFact("clicks_count", FactType.Counter, slice = 15)
      svc.defineFact("purchases_count", FactType.Counter, slice = 15)
      svc.defineDimension("user_bucket",
        facts = Set("clicks_count", "purchases_count"))
      val ev = eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00")
        .where(col("event_type").isin("click", "purchase"))
        .select(
          when(col("event_type") === "click", lit("clicks_count"))
            .otherwise(lit("purchases_count")).as("fact"),
          col("ts"), lit(1L).as("value"),
          map(lit("user_bucket"),
            (col("user_id") % 4).cast("string")).as("categories"))
      svc.ingest(ev)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_route_explain").toString
      svc.materializeRollups(tmp)
      svc.registerRollup("purchases_count", Seq("user_bucket"),
        s"$tmp/user_bucket_purchases_count")
      svc.defineFact("late_count", FactType.Counter, slice = 15)
      svc.updateDimension("user_bucket", "late_count")
      ()
    }
    // day-eligible window: floor(23:45)+15m lands ON midnight, so
    // the inclusive bucketed scan spans whole UTC days
    val read = () => svc.explainRoute(
        Seq("clicks_count", "purchases_count", "late_count"),
        "user_bucket", Map("user_bucket" -> None),
        ts("2024-01-05T00:00"), ts("2024-01-06T23:45"), Step.Day)
      .select(col("fact"), col("grouping"), col("tier"))
    (build, read)
  }

  /** The day-tier windowed SQL table function's two phases: build =
    * DDL + ingest + rollup/day-store materialization + the view
    * install; read = the three movable windows from pure SQL text
    * (two day-aligned — served from the ~96×-smaller day store — and
    * one that keeps the exact slice branch). The combined
    * `ts_window_day_sql` entry conflates store materialization with
    * the per-call served read; this split is what lets a serving
    * regression show against the day tier specifically. */
  private def windowDaySqlPhases(s: SparkSession,
      dir: String): (() => Unit, () => DataFrame) = {
    import graft.TimeSeriesService
    val svc = new TimeSeriesService(s)
    val build = () => {
      svc.defineFact("events_count", FactType.Counter, slice = 15)
      svc.defineDimension("event_type", facts = Set("events_count"))
      svc.ingest(eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00")
        .select(lit("events_count").as("fact"), col("ts"),
          lit(1L).as("value"),
          map(lit("event_type"), col("event_type")).as("categories")))
      svc.materializeRollups(java.nio.file.Files
        .createTempDirectory("graft_winday").toString)
      graft.sql.PipelineViews.installTimeseriesWindow(s, svc,
        "events_count", "event_type", Map("event_type" -> Some("click")),
        Step.Day, name = "graft_timeseries_window_day")
      ()
    }
    val read = () =>
      s.sql("""SELECT 1L AS win, * FROM graft_timeseries_window_day(
              |  TIMESTAMP '2024-01-05 00:00:00',
              |  TIMESTAMP '2024-01-05 23:45:00')
              |UNION ALL
              |SELECT 2L AS win, * FROM graft_timeseries_window_day(
              |  TIMESTAMP '2024-01-05 00:00:00',
              |  TIMESTAMP '2024-01-06 23:45:00')
              |UNION ALL
              |SELECT 3L AS win, * FROM graft_timeseries_window_day(
              |  TIMESTAMP '2024-01-05 00:00:00',
              |  TIMESTAMP '2024-01-06 12:00:00')""".stripMargin)
    (build, read)
  }

  /** The lifecycle queries' two-phase forms, consumed by
    * [[graft.Bench]] for separate `__build` / `__read` timings. */
  val lifecycleSplits
      : Map[String, (SparkSession, String) => (() => Unit, () => DataFrame)] =
    Map("ts_asof_batch" -> (asofBatchPhases _),
      "ts_retention_serve" -> (retentionPhases _),
      "ts_erasure_serve" -> (erasurePhases _),
      "ts_multi_routed" -> (multiRoutedPhases _),
      "ts_route_explain" -> (routeExplainPhases _),
      "ts_window_day_sql" -> (windowDaySqlPhases _))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O20 full pipeline: hourly collapse + finish-exclusive zero-filled grid
    "ts_counter_hour_fill" -> ((s, dir) =>
      Timeseries.run(prep(s, dir, withUser = false, one,
          Some(("2024-01-05T00:00", "2024-01-07T00:00"))), countFact, 15,
        Seq("event_type"), Map("event_type" -> Some("click")),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Hour)),

    // series smoothing on top of the filled grid: trailing-4-bucket
    // sum + mean per series — ONE series partitioning serves both
    // window frames; dense fill makes the ROWS frame a time frame
    "ts_moving_avg" -> ((s, dir) =>
      Timeseries.movingAverage(
        Timeseries.run(prep(s, dir, withUser = false, one,
            Some(("2024-01-05T00:00", "2024-01-07T00:00"))), countFact, 15,
          Seq("event_type"), Map("event_type" -> Some("click")),
          ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Hour),
        Seq("event_type"), k = 4)),

    // counter rate over a cumulative gauge: the filled hourly series
    // accumulated into a monotonic counter with injected wrap-arounds
    // (mod 100) — the Prometheus-scrape shape — then per-bucket
    // increase with the reset rule (gauge down ⇒ increase = gauge)
    "ts_rate" -> ((s, dir) => {
      val filled = Timeseries.run(prep(s, dir, withUser = false, one,
          Some(("2024-01-05T00:00", "2024-01-07T00:00"))), countFact, 15,
        Seq("event_type"), Map("event_type" -> Some("click")),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Hour)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("bucket"))
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val gauge = filled
        .withColumn("gauge", (sum(col("value")).over(w) % lit(100L))
          .cast(LongType))
        .drop("value")
      Timeseries.counterRate(gauge, Seq("event_type"), 3600L, "gauge")
    }),

    // linear-interpolation gap fill on a deliberately SPARSE series
    // (purchase × one user bucket, hourly over a week): unobserved
    // grid buckets take the neighbour line, not a constant
    "ts_interp_fill" -> ((s, dir) => {
      val prepared = prep(s, dir, withUser = true, one,
        Some(("2024-01-05T00:00", "2024-01-12T00:00")))
      val scanned = Timeseries.scan(prepared, 15,
        Seq("event_type", "user_bucket"),
        Map("event_type" -> Some("purchase"), "user_bucket" -> Some("3")),
        ts("2024-01-05T00:00"), ts("2024-01-12T00:00"))
      val coll = Timeseries.collapse(scanned, countFact,
        Seq("event_type", "user_bucket"), Step.Hour, 0)
      Timeseries.interpolateFill(coll, Seq("event_type", "user_bucket"),
        ts("2024-01-05T00:00"), ts("2024-01-12T00:00"), Step.Hour)
    }),

    // the SERVICE façade end-to-end under the oracle gate: catalog DDL
    // (O3/O4) → bulk ingest of canonical events (O11) → routed
    // getTimeseries (O20). Must produce byte-identical results to the
    // operator-level ts_counter_hour_fill pipeline.
    "ts_service_end_to_end" -> ((s, dir) => {
      import graft.TimeSeriesService
      val svc = new TimeSeriesService(s)
      svc.defineFact("events_count", FactType.Counter, slice = 15)
      svc.defineDimension("event_type", facts = Set("events_count"))
      svc.ingest(eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00")
        .select(lit("events_count").as("fact"), col("ts"),
          lit(1L).as("value"),
          map(lit("event_type"), col("event_type")).as("categories")))
      svc.getTimeseries("events_count", "event_type",
        Map("event_type" -> Some("click")),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Hour)
    }),

    // the gap-filled calendar read from PURE SQL TEXT: the same
    // service read as ts_service_end_to_end, but installed as the
    // `graft_timeseries` session view (PipelineViews.installTimeseries)
    // and consumed with spark.sql — the BI surface. The view is the
    // routed read's logical plan, so tier routing / pruning / the
    // dense grid all survive into SQL; shares ts_counter_hour_fill's
    // oracle verbatim, pinning that the SQL surface cannot drift from
    // the Scala read.
    "ts_fill_sql" -> ((s, dir) => {
      import graft.TimeSeriesService
      val svc = new TimeSeriesService(s)
      svc.defineFact("events_count", FactType.Counter, slice = 15)
      svc.defineDimension("event_type", facts = Set("events_count"))
      svc.ingest(eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00")
        .select(lit("events_count").as("fact"), col("ts"),
          lit(1L).as("value"),
          map(lit("event_type"), col("event_type")).as("categories")))
      graft.sql.PipelineViews.installTimeseries(s, svc, "events_count",
        "event_type", Map("event_type" -> Some("click")),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Hour)
      s.sql("SELECT event_type, bucket, value FROM graft_timeseries")
    }),

    // the PARAMETERIZED window from pure SQL text: one installed SQL
    // table function (installTimeseriesWindow), TWO different windows
    // queried from the same session with no Scala re-install — the
    // round-11 BI gap (views baked the window at install time). Each
    // window's rows must match the Scala read's fill oracle exactly;
    // the union is tagged by window so both gates in one compare.
    "ts_window_sql" -> ((s, dir) => {
      import graft.TimeSeriesService
      val svc = new TimeSeriesService(s)
      svc.defineFact("events_count", FactType.Counter, slice = 15)
      svc.defineDimension("event_type", facts = Set("events_count"))
      svc.ingest(eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00")
        .select(lit("events_count").as("fact"), col("ts"),
          lit(1L).as("value"),
          map(lit("event_type"), col("event_type")).as("categories")))
      graft.sql.PipelineViews.installTimeseriesWindow(s, svc,
        "events_count", "event_type", Map("event_type" -> Some("click")),
        Step.Hour)
      s.sql("""SELECT 1L AS win, * FROM graft_timeseries_window(
              |  TIMESTAMP '2024-01-05 00:00:00',
              |  TIMESTAMP '2024-01-06 00:00:00')
              |UNION ALL
              |SELECT 2L AS win, * FROM graft_timeseries_window(
              |  TIMESTAMP '2024-01-06 00:00:00',
              |  TIMESTAMP '2024-01-07 00:00:00')""".stripMargin)
    }),

    // the windowed SQL table function SERVING THE DAY TIER: with the
    // rollup (and its day store) materialized, a Day-step install
    // emits a two-branch body — a literal window whose slice-bucketed
    // scan bounds land on midnights (finish is slice-INCLUSIVE, so an
    // aligned window finishes at the day's LAST slice, 23:45)
    // constant-folds onto the ~96×-smaller day store, any other
    // window keeps the exact slice branch (window 3's 12:00 finish) —
    // the SAME per-window rows either way (PlanAuditSpec pins the
    // branch pruning; this entry gates the rows)
    "ts_window_day_sql" -> ((s, dir) => {
      val (build, read) = windowDaySqlPhases(s, dir); build(); read()
    }),

    // the MULTI-FACT dashboard from pure SQL text: ts_multi_mixed's
    // two-tile read installed as the graft_timeseries_multi view and
    // consumed with spark.sql — shares ts_multi_mixed's oracle
    // verbatim (the SQL dashboard is the Scala dashboard)
    "ts_multi_sql" -> ((s, dir) => {
      import graft.TimeSeriesService
      val svc = new TimeSeriesService(s)
      svc.defineFact("clicks_count", FactType.Counter, slice = 15)
      svc.defineFact("spend_avg", FactType.Average, slice = 15)
      svc.defineDimension("user_bucket",
        facts = Set("clicks_count", "spend_avg"))
      val ev = eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00")
        .where(col("event_type").isin("click", "purchase"))
        .select(
          when(col("event_type") === "click", lit("clicks_count"))
            .otherwise(lit("spend_avg")).as("fact"),
          col("ts"),
          when(col("event_type") === "click", lit(1L))
            .otherwise(cents).as("value"),
          map(lit("user_bucket"),
            (col("user_id") % 4).cast("string")).as("categories"))
      svc.ingest(ev)
      graft.sql.PipelineViews.installTimeseriesMulti(s, svc,
        Seq("clicks_count", "spend_avg"), "user_bucket",
        Map("user_bucket" -> None),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Day)
      s.sql("SELECT * FROM graft_timeseries_multi")
    }),

    // the PER-TILE-FILTERED dashboard from pure SQL text:
    // ts_multi_filters' split-filter read (clicks for bucket 1 beside
    // the unfiltered spend, SAME dimension) installed through the
    // tiles view overload and consumed with spark.sql — shares
    // ts_multi_filters' oracle verbatim
    "ts_multi_filters_sql" -> ((s, dir) => {
      import graft.TimeSeriesService
      val svc = new TimeSeriesService(s)
      svc.defineFact("clicks_count", FactType.Counter, slice = 15)
      svc.defineFact("spend_avg", FactType.Average, slice = 15)
      svc.defineDimension("user_bucket",
        facts = Set("clicks_count", "spend_avg"))
      val ev = eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00")
        .where(col("event_type").isin("click", "purchase"))
        .select(
          when(col("event_type") === "click", lit("clicks_count"))
            .otherwise(lit("spend_avg")).as("fact"),
          col("ts"),
          when(col("event_type") === "click", lit(1L))
            .otherwise(cents).as("value"),
          map(lit("user_bucket"),
            (col("user_id") % 4).cast("string")).as("categories"))
      svc.ingest(ev)
      graft.sql.PipelineViews.installTimeseriesMultiTiles(s, svc, Seq(
          ("clicks_count", "user_bucket",
            Map("user_bucket" -> Option("1"))),
          ("spend_avg", "user_bucket",
            Map.empty[String, Option[String]])),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Day, 0,
        name = "graft_timeseries_tiles")
      s.sql("SELECT * FROM graft_timeseries_tiles")
    }),

    // the FOUR-TYPE bridge holds for histogram tiles too: the
    // counter+histogram dashboard (ts_multi_hist's fixture) consumed
    // as pure SQL text through the same view — shares ts_multi_hist's
    // null-padded-union oracle verbatim
    "ts_multi_hist_sql" -> ((s, dir) => {
      import graft.TimeSeriesService
      val svc = new TimeSeriesService(s)
      svc.defineFact("clicks_count", FactType.Counter, slice = 15)
      svc.defineFact("spend_hist", FactType.Histogram, slice = 15,
        start = Some(0L), end = Some(20000L), step = Some(2000L))
      svc.defineDimension("user_bucket",
        facts = Set("clicks_count", "spend_hist"))
      val ev = eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00")
        .where(col("event_type").isin("click", "purchase"))
        .select(
          when(col("event_type") === "click", lit("clicks_count"))
            .otherwise(lit("spend_hist")).as("fact"),
          col("ts"),
          when(col("event_type") === "click", lit(1L))
            .otherwise(cents).as("value"),
          map(lit("user_bucket"),
            (col("user_id") % 4).cast("string")).as("categories"))
      svc.ingest(ev)
      graft.sql.PipelineViews.installTimeseriesMulti(s, svc,
        Seq("clicks_count", "spend_hist"), "user_bucket",
        Map("user_bucket" -> None),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Day,
        name = "graft_timeseries_multi4")
      s.sql("SELECT * FROM graft_timeseries_multi4")
    }),

    // the HISTOGRAM read (O21) from pure SQL text: integral-cents
    // spend distribution per event type over [0,20000) in 2000-cent
    // buckets, installed as the graft_histogram view — the
    // monitoring-dashboard read (and any percentile/CDF SQL a user
    // derives on top of it)
    "ts_hist_sql" -> ((s, dir) => {
      import graft.TimeSeriesService
      val svc = new TimeSeriesService(s)
      svc.defineFact("spend_hist", FactType.Histogram, slice = 15,
        start = Some(0L), end = Some(20000L), step = Some(2000L))
      svc.defineDimension("event_type", facts = Set("spend_hist"))
      svc.ingest(eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00")
        .select(lit("spend_hist").as("fact"), col("ts"),
          cents.as("value"),
          map(lit("event_type"), col("event_type")).as("categories")))
      graft.sql.PipelineViews.installHistogram(s, svc, "spend_hist",
        "event_type", Map("event_type" -> None),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"))
      s.sql("SELECT event_type, hist_bucket, value FROM graft_histogram")
    }),

    // the histogram read's PARAMETERIZED window: one installed SQL
    // table function, two different windows (day 1, day 2) queried
    // from one session — each window's distribution is exactly the
    // service read's for that range (histograms never gap-fill, so
    // the window moves only the scan)
    "ts_hist_window_sql" -> ((s, dir) => {
      import graft.TimeSeriesService
      val svc = new TimeSeriesService(s)
      svc.defineFact("spend_hist", FactType.Histogram, slice = 15,
        start = Some(0L), end = Some(20000L), step = Some(2000L))
      svc.defineDimension("event_type", facts = Set("spend_hist"))
      svc.ingest(eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00")
        .select(lit("spend_hist").as("fact"), col("ts"),
          cents.as("value"),
          map(lit("event_type"), col("event_type")).as("categories")))
      graft.sql.PipelineViews.installHistogramWindow(s, svc, "spend_hist",
        "event_type", Map("event_type" -> None))
      s.sql("""SELECT 1L AS win, * FROM graft_histogram_window(
              |  TIMESTAMP '2024-01-05 00:00:00',
              |  TIMESTAMP '2024-01-06 00:00:00')
              |UNION ALL
              |SELECT 2L AS win, * FROM graft_histogram_window(
              |  TIMESTAMP '2024-01-06 00:00:00',
              |  TIMESTAMP '2024-01-07 00:00:00')""".stripMargin)
    }),

    // LENIENT ingest under the driver's gate: a feed where every 7th
    // event carries a null value and every 7th+1 an undefined fact id
    // must neither fail the job nor distort history — corrupt rows
    // quarantine, valid rows ingest, and the read hash-matches the
    // oracle computed over exactly the valid subset.
    "ts_lenient_ingest" -> ((s, dir) => {
      import graft.TimeSeriesService
      val svc = new TimeSeriesService(s)
      svc.defineFact("events_count", FactType.Counter, slice = 15)
      svc.defineDimension("event_type", facts = Set("events_count"))
      val frame = eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00")
        .select(
          when(col("event_id") % 7 === 1, lit("mystery"))
            .otherwise(lit("events_count")).as("fact"),
          col("ts"),
          when(col("event_id") % 7 === 0, lit(null).cast(LongType))
            .otherwise(lit(1L)).as("value"),
          map(lit("event_type"), col("event_type")).as("categories"))
      val qdir = java.nio.file.Files
        .createTempDirectory("graft_quarantine").toString + "/bad"
      svc.ingestLenient(frame, qdir)
      svc.getTimeseries("events_count", "event_type",
        Map("event_type" -> Some("click")),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Hour)
    }),

    // DASHBOARD batch read: two counter facts served from ONE scan —
    // the fact id rides as a grouping column, so the result must be
    // exactly the union of the per-fact fills (k tiles, one scan)
    "ts_multi_fact" -> ((s, dir) => {
      import graft.TimeSeriesService
      val svc = new TimeSeriesService(s)
      svc.defineFact("clicks_count", FactType.Counter, slice = 15)
      svc.defineFact("purchases_count", FactType.Counter, slice = 15)
      svc.defineDimension("user_bucket",
        facts = Set("clicks_count", "purchases_count"))
      val ev = eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00")
        .where(col("event_type").isin("click", "purchase"))
        .select(
          when(col("event_type") === "click", lit("clicks_count"))
            .otherwise(lit("purchases_count")).as("fact"),
          col("ts"), lit(1L).as("value"),
          map(lit("user_bucket"),
            (col("user_id") % 4).cast("string")).as("categories"))
      svc.ingest(ev)
      svc.getTimeseriesMulti(Seq("clicks_count", "purchases_count"),
        "user_bucket", Map("user_bucket" -> None),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Day)
    }),

    // PER-FACT FILLERS in the dashboard read: two counter tiles whose
    // facts declare DIFFERENT fillers (clicks gap→0, purchases
    // gap→−1 — "no data" distinguished from "zero sales") still share
    // ONE scan/collapse/fill pipeline; the fill expression becomes a
    // broadcast-literal fact→filler map lookup, so each fact's gaps
    // carry its own filler (round-10 verdict item 8 — the old
    // distinct-filler require rejected this legitimate dashboard)
    "ts_multi_fillers" -> ((s, dir) => {
      import graft.TimeSeriesService
      val svc = new TimeSeriesService(s)
      svc.defineFact("clicks_count", FactType.Counter, slice = 15)
      svc.defineFact("purchases_count", FactType.Counter, slice = 15,
        filler = -1L)
      svc.defineDimension("user_bucket",
        facts = Set("clicks_count", "purchases_count"))
      val ev = eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00")
        .where(col("event_type").isin("click", "purchase"))
        .select(
          when(col("event_type") === "click", lit("clicks_count"))
            .otherwise(lit("purchases_count")).as("fact"),
          col("ts"), lit(1L).as("value"),
          map(lit("user_bucket"),
            (col("user_id") % 4).cast("string")).as("categories"))
      svc.ingest(ev)
      svc.getTimeseriesMulti(Seq("clicks_count", "purchases_count"),
        "user_bucket", Map("user_bucket" -> None),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Hour)
    }),

    // HISTOGRAM tile in the dashboard read: a counter tile (clicks)
    // and a histogram tile (purchase spend distribution, 2000-cent
    // buckets clamped to [0, 20000)) in ONE multi read — the
    // null-padded union gains `hist_bucket` (null on counter rows);
    // histogram cells never gap-fill, exactly like getHistogram
    "ts_multi_hist" -> ((s, dir) => {
      import graft.TimeSeriesService
      val svc = new TimeSeriesService(s)
      svc.defineFact("clicks_count", FactType.Counter, slice = 15)
      svc.defineFact("spend_hist", FactType.Histogram, slice = 15,
        start = Some(0L), end = Some(20000L), step = Some(2000L))
      svc.defineDimension("user_bucket",
        facts = Set("clicks_count", "spend_hist"))
      val ev = eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00")
        .where(col("event_type").isin("click", "purchase"))
        .select(
          when(col("event_type") === "click", lit("clicks_count"))
            .otherwise(lit("spend_hist")).as("fact"),
          col("ts"),
          when(col("event_type") === "click", lit(1L))
            .otherwise(cents).as("value"),
          map(lit("user_bucket"),
            (col("user_id") % 4).cast("string")).as("categories"))
      svc.ingest(ev)
      svc.getTimeseriesMulti(Seq("clicks_count", "spend_hist"),
        "user_bucket", Map("user_bucket" -> None),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Day)
    }),

    // DISTINCT tile in the dashboard read: a counter tile (click
    // volume) and an exact-distinct tile (unique users) computed from
    // the SAME click events in ONE multi read — the two type groups
    // share the output schema (value), so this is the pure union;
    // distinct gaps fill with the fact's filler like counters
    "ts_multi_distinct" -> ((s, dir) => {
      import graft.TimeSeriesService
      val svc = new TimeSeriesService(s)
      svc.defineFact("clicks_count", FactType.Counter, slice = 15)
      svc.defineFact("uniq_users", FactType.Distinct, slice = 15)
      svc.defineDimension("user_bucket",
        facts = Set("clicks_count", "uniq_users"))
      val clicks = eventsRanged(s, dir, "2024-01-05T00:00",
          "2024-01-07T00:00")
        .where(col("event_type") === "click")
      val ev = clicks.select(lit("clicks_count").as("fact"), col("ts"),
          lit(1L).as("value"),
          map(lit("user_bucket"),
            (col("user_id") % 4).cast("string")).as("categories"))
        .unionByName(clicks.select(lit("uniq_users").as("fact"), col("ts"),
          col("user_id").cast(LongType).as("value"),
          map(lit("user_bucket"),
            (col("user_id") % 4).cast("string")).as("categories")))
      svc.ingest(ev)
      svc.getTimeseriesMulti(Seq("clicks_count", "uniq_users"),
        "user_bucket", Map("user_bucket" -> None),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Day)
    }),

    // MIXED-TYPE dashboard read: a counter tile (clicks) and an
    // average tile (purchase spend, integral cents) served by ONE
    // multi read — per-type pipelines over disjoint fact partitions,
    // null-padded union schema (value | counter,total per row kind)
    "ts_multi_mixed" -> ((s, dir) => {
      import graft.TimeSeriesService
      val svc = new TimeSeriesService(s)
      svc.defineFact("clicks_count", FactType.Counter, slice = 15)
      svc.defineFact("spend_avg", FactType.Average, slice = 15)
      svc.defineDimension("user_bucket",
        facts = Set("clicks_count", "spend_avg"))
      val ev = eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00")
        .where(col("event_type").isin("click", "purchase"))
        .select(
          when(col("event_type") === "click", lit("clicks_count"))
            .otherwise(lit("spend_avg")).as("fact"),
          col("ts"),
          when(col("event_type") === "click", lit(1L))
            .otherwise(cents).as("value"),
          map(lit("user_bucket"),
            (col("user_id") % 4).cast("string")).as("categories"))
      svc.ingest(ev)
      svc.getTimeseriesMulti(Seq("clicks_count", "spend_avg"),
        "user_bucket", Map("user_bucket" -> None),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Day)
    }),

    // the MULTI-DIMENSION dashboard read: a counter tile by event_type
    // BESIDE an average tile by user_bucket in ONE service call — per
    // dimension the per-type shared pipeline is unchanged, the frames
    // union by name with a `dim` discriminator and the other
    // dimension's grouping column null-padded (a real dashboard mixes
    // dimensions; one call per dimension was the round-11 gap)
    "ts_multi_dims" -> ((s, dir) => {
      import graft.TimeSeriesService
      val svc = new TimeSeriesService(s)
      svc.defineFact("clicks_count", FactType.Counter, slice = 15)
      svc.defineFact("spend_avg", FactType.Average, slice = 15)
      svc.defineDimension("event_type", facts = Set("clicks_count"))
      svc.defineDimension("user_bucket", facts = Set("spend_avg"))
      val ev = eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00")
        .where(col("event_type").isin("click", "purchase"))
        .select(
          when(col("event_type") === "click", lit("clicks_count"))
            .otherwise(lit("spend_avg")).as("fact"),
          col("ts"),
          when(col("event_type") === "click", lit(1L))
            .otherwise(cents).as("value"),
          map(lit("event_type"), col("event_type"),
            lit("user_bucket"),
            (col("user_id") % 4).cast("string")).as("categories"))
      svc.ingest(ev)
      svc.getTimeseriesMulti(
        Seq("clicks_count" -> "event_type", "spend_avg" -> "user_bucket"),
        Map.empty[String, Option[String]],
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Day, 0)
    }),

    // the PER-TILE-FILTERED dashboard: clicks for user bucket 1 only
    // BESIDE the unfiltered spend average, SAME dimension, ONE call —
    // the read the pairs overload could not express (one filter map
    // routed to every tile of a dimension). Tiles group by (dim,
    // routed filters): agreeing tiles keep the shared per-TYPE scan,
    // disagreeing tiles split into their own groups; the union
    // carries the `dim` discriminator like ts_multi_dims
    "ts_multi_filters" -> ((s, dir) => {
      import graft.TimeSeriesService
      val svc = new TimeSeriesService(s)
      svc.defineFact("clicks_count", FactType.Counter, slice = 15)
      svc.defineFact("spend_avg", FactType.Average, slice = 15)
      svc.defineDimension("user_bucket",
        facts = Set("clicks_count", "spend_avg"))
      val ev = eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00")
        .where(col("event_type").isin("click", "purchase"))
        .select(
          when(col("event_type") === "click", lit("clicks_count"))
            .otherwise(lit("spend_avg")).as("fact"),
          col("ts"),
          when(col("event_type") === "click", lit(1L))
            .otherwise(cents).as("value"),
          map(lit("user_bucket"),
            (col("user_id") % 4).cast("string")).as("categories"))
      svc.ingest(ev)
      svc.getTimeseriesMulti(Seq(
          ("clicks_count", "user_bucket",
            Map("user_bucket" -> Option("1"))),
          ("spend_avg", "user_bucket",
            Map.empty[String, Option[String]])),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Day, 0)
    }),

    // the ROLLUP-SERVED dashboard read: same mixed dashboard as
    // ts_multi_mixed, but both facts' rollups are materialized first —
    // the multi read tier-routes EVERY tile onto its registered
    // partials (the SLICE tier here: the finish floors to a 00:15
    // scan bound, not a whole-day window — ts_routed_day_tier covers
    // the day tier) and the event store is never scanned
    // (PlanAuditSpec pins the plan).
    // Identical rows by re-aggregability → shares ts_multi_mixed's
    // oracle verbatim. Bench also times the phases separately
    // (ts_multi_routed__build / __read via lifecycleSplits): the
    // combined number is ~80% store construction, the __read twin is
    // the serving latency the B75 claim is actually about.
    "ts_multi_routed" -> ((s, dir) => {
      val (build, read) = multiRoutedPhases(s, dir); build(); read()
    }),

    // the ADVISOR→MATERIALIZE loop closed under the driver's gate: the
    // mixed dashboard starts compute-on-read (explainRoute: every tile
    // raw-scan — pinned in-query), ONE applyAdvice call measures the
    // candidate groupings (one grouping-sets pass per fact) and
    // materializes + registers the paying ones, and the SAME explain
    // now shows rollup tiers — the raw-scan rows an operator had to
    // fix by hand are fixed by the advice. The read itself then serves
    // routed and shares ts_multi_mixed's oracle verbatim: advice must
    // change the tier, never a row.
    "ts_advised_route" -> ((s, dir) => {
      import graft.TimeSeriesService
      val svc = new TimeSeriesService(s)
      // HOURLY slices: at the driver fixture's event density a 15-min
      // slice store compacts only ~1.08× — the advisor must be able to
      // say a genuine YES under its default 2× bar, so the dashboard
      // declares the grain it actually needs (day-step tiles)
      svc.defineFact("clicks_count", FactType.Counter, slice = 60)
      svc.defineFact("spend_avg", FactType.Average, slice = 60)
      svc.defineDimension("user_bucket",
        facts = Set("clicks_count", "spend_avg"))
      val ev = eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00")
        .where(col("event_type").isin("click", "purchase"))
        .select(
          when(col("event_type") === "click", lit("clicks_count"))
            .otherwise(lit("spend_avg")).as("fact"),
          col("ts"),
          when(col("event_type") === "click", lit(1L))
            .otherwise(cents).as("value"),
          map(lit("user_bucket"),
            (col("user_id") % 2).cast("string")).as("categories"))
      svc.ingest(ev)
      def tiers(): Map[String, String] = svc.explainRoute(
          Seq("clicks_count", "spend_avg"), "user_bucket",
          Map("user_bucket" -> None),
          ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Day)
        .select(col("fact"), col("tier")).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val before = tiers()
      require(before.values.forall(_ == "raw-scan"),
        s"expected every tile raw-scan before the advice, got $before")
      // the bar is the operator's knob: the driver fixture's 2-day
      // window measures ~1.8× per grouping (events are deliberately
      // sparse at small SF; at ×10 data the same groupings measure
      // ~18×, clearing any bar) — 1.5× is this dashboard's declared
      // "worth the storage" line, and the requires pin that BOTH
      // verdicts were genuine measurements, not bypasses
      val advised = svc.applyAdvice(java.nio.file.Files
        .createTempDirectory("graft_advice").toString,
        minCompactionE4 = 15000L)
      require(advised.nonEmpty && advised.forall(_.path.isDefined),
        s"both dashboard groupings must pay at this fixture: $advised")
      val after = tiers()
      // rollup-SLICE, not day: finish 07T00:00 floors to a scan upper
      // bound of 00:15 — not a whole-day window, so the shared
      // eligibility rule keeps the slice tier (exactness first)
      require(after.values.forall(_ == "rollup-slice"),
        s"expected every tile rollup-slice after the advice, got $after")
      svc.getTimeseriesMulti(Seq("clicks_count", "spend_avg"),
        "user_bucket", Map("user_bucket" -> None),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Day)
    }),

    // the WORKLOAD-OBSERVED advisor loop: the catalog implies every
    // rollup a dashboard COULD ask for; the read log says which ones
    // dashboards DO ask for. Two dimensions are declared for the same
    // fact; only user_bucket is actually read (twice, raw-scan — the
    // log records at the serving route decision, never at
    // explainRoute). applyAdviceFromWorkload(minReads = 2)
    // materializes EXACTLY the hot grouping — the cold event_type
    // target, which plain applyAdvice would also have built, stays
    // compute-on-read with zero storage spent (required in-query via
    // explainRoute). The returned profile then shows the loop's whole
    // history: 2 raw scans before the advice, the post-advice re-read
    // on rollup-slice, and the cold dimension's single raw scan.
    "ts_workload_advice" -> ((s, dir) => {
      import graft.TimeSeriesService
      val svc = new TimeSeriesService(s)
      svc.defineFact("clicks_count", FactType.Counter, slice = 60)
      svc.defineDimension("user_bucket", facts = Set("clicks_count"))
      svc.defineDimension("event_type", facts = Set("clicks_count"))
      val ev = eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00")
        .where(col("event_type").isin("click", "purchase"))
        .select(lit("clicks_count").as("fact"), col("ts"),
          lit(1L).as("value"),
          map(lit("user_bucket"), (col("user_id") % 2).cast("string"),
            lit("event_type"), col("event_type")).as("categories"))
      svc.ingest(ev)
      val win = (ts("2024-01-05T00:00"), ts("2024-01-07T00:00"))
      def readHot(): Unit = svc.getTimeseries("clicks_count",
        "user_bucket", Map("user_bucket" -> None), win._1, win._2,
        Step.Day)
      readHot(); readHot()
      val advised = svc.applyAdviceFromWorkload(java.nio.file.Files
          .createTempDirectory("graft_wl_advice").toString,
        minReads = 2L, minCompactionE4 = 15000L)
      require(advised.map(_.grouping) == Seq("user_bucket") &&
        advised.forall(_.path.isDefined),
        s"exactly the hot grouping must materialize, got $advised")
      val cold = svc.explainRoute(Seq("clicks_count"), "event_type",
          Map("event_type" -> None), win._1, win._2, Step.Day)
        .select(col("tier")).head().getString(0)
      require(cold == "raw-scan",
        s"the unread dimension must stay compute-on-read, got $cold")
      readHot() // now rollup-slice — the flip lands in the log
      svc.getTimeseries("clicks_count", "event_type",
        Map("event_type" -> None), win._1, win._2, Step.Day)
      svc.workloadProfile()
    }),

    // the PERSISTED advisor loop (the deployment topology: traffic
    // accumulates across driver bounces): session 1 serves the hot
    // grouping twice and checkpoints its read log; session 2 is a
    // FRESH instance that attaches the same log and must materialize
    // from the PRIOR session's observed reads (it has served nothing
    // itself — required in-query), then serves once from the rollup
    // and checkpoints; session 3 attaches and returns the
    // accumulated two-session history. The in-memory TrieMap dies
    // with every instance here — only the parquet log carries the
    // counts forward, which is exactly what the oracle gates.
    "ts_workload_persisted" -> ((s, dir) => {
      import graft.TimeSeriesService
      val logDir = java.nio.file.Files
        .createTempDirectory("graft_wl_log").toString + "/log"
      val win = (ts("2024-01-05T00:00"), ts("2024-01-07T00:00"))
      def freshService(): TimeSeriesService = {
        val svc = new TimeSeriesService(s)
        svc.defineFact("clicks_count", FactType.Counter, slice = 60)
        svc.defineDimension("user_bucket", facts = Set("clicks_count"))
        svc.ingest(eventsRanged(s, dir, "2024-01-05T00:00",
            "2024-01-07T00:00")
          .where(col("event_type").isin("click", "purchase"))
          .select(lit("clicks_count").as("fact"), col("ts"),
            lit(1L).as("value"),
            map(lit("user_bucket"),
              (col("user_id") % 2).cast("string")).as("categories")))
        svc.attachWorkloadLog(logDir)
        svc
      }
      def readHot(svc: TimeSeriesService): Unit =
        svc.getTimeseries("clicks_count", "user_bucket",
          Map("user_bucket" -> None), win._1, win._2, Step.Day)
      val svc1 = freshService()
      readHot(svc1); readHot(svc1)
      svc1.checkpointWorkloadLog()
      val svc2 = freshService()
      val advised = svc2.applyAdviceFromWorkload(java.nio.file.Files
          .createTempDirectory("graft_wl_persist_mv").toString,
        minReads = 2L, minCompactionE4 = 15000L)
      require(advised.map(_.grouping) == Seq("user_bucket") &&
        advised.forall(_.path.isDefined),
        s"the prior session's logged reads must drive the " +
          s"materialization, got $advised")
      readHot(svc2)
      svc2.checkpointWorkloadLog()
      val svc3 = freshService()
      svc3.workloadProfile()
    }),

    // the STREAMING-MAINTAINED dashboard (the production topology:
    // ingest maintains one partial store per fact, the service read
    // never sees raw events): a counter tile and an average tile,
    // each served from a streaming-maintained store registered as an
    // EXTERNAL rollup, read by ONE tier-routed multi call — the
    // oracle recomputes both tiles from the raw events the stream
    // replayed, so cross-batch partial merging is gated end to end
    "ts_multi_stream" -> ((s, dir) => {
      import graft.TimeSeriesService
      val cntPath = maintainedRollup(s, dir)
      val avgPath = streamedRollupFor(s, dir, avgFact, cents)
      val svc = new TimeSeriesService(s)
      svc.defineFact("events_count", FactType.Counter, slice = 15)
      svc.defineFact("value_avg", FactType.Average, slice = 15)
      svc.defineDimension("event_type",
        facts = Set("events_count", "value_avg"))
      svc.registerRollup("events_count", Seq("event_type"), cntPath)
      svc.registerRollup("value_avg", Seq("event_type"), avgPath)
      svc.getTimeseriesMulti(Seq("events_count", "value_avg"),
        "event_type", Map("event_type" -> None),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Hour)
    }),

    // the FOUR-TYPE streaming dashboard (B85's production topology):
    // counter, exact-distinct (tall dval partials), average, and
    // histogram tiles EACH served from a streaming-maintained store
    // registered as an external rollup, read by one tier-routed multi
    // call — the oracle recomputes all four tiles from the raw events
    // the streams replayed, so cross-batch partial merging of every
    // partial SHAPE is gated end to end in one read
    "ts_multi_stream4" -> ((s, dir) => {
      import graft.TimeSeriesService
      val cntPath = maintainedRollup(s, dir)
      val avgPath = streamedRollupFor(s, dir, avgFact, cents)
      val uniqPath = maintainedDistinctRollup(s, dir)
      val histPath = streamedRollupFor(s, dir, histFact, col("value"))
      val svc = new TimeSeriesService(s)
      svc.defineFact("events_count", FactType.Counter, slice = 15)
      svc.defineFact("uniq_users", FactType.Distinct, slice = 15)
      svc.defineFact("value_avg", FactType.Average, slice = 15)
      svc.defineFact("value_hist", FactType.Histogram, slice = 15,
        start = Some(0L), end = Some(200L), step = Some(20L))
      svc.defineDimension("event_type", facts = Set("events_count",
        "uniq_users", "value_avg", "value_hist"))
      svc.registerRollup("events_count", Seq("event_type"), cntPath)
      svc.registerRollup("uniq_users", Seq("event_type"), uniqPath)
      svc.registerRollup("value_avg", Seq("event_type"), avgPath)
      svc.registerRollup("value_hist", Seq("event_type"), histPath)
      svc.getTimeseriesMulti(
        Seq("events_count", "uniq_users", "value_avg", "value_hist"),
        "event_type", Map("event_type" -> None),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Hour)
    }),

    // ROUTING INTROSPECTION (serving observability): for each
    // dashboard fact, the tier the read serves from — decided by the
    // same bestGrouping + day-eligibility + registration code the
    // read itself uses, no store bytes touched. One registered
    // internal rollup under a whole-day window (day tier), one
    // re-pointed external store with pooled local events (the
    // streaming topology's merge), one fact defined after the
    // materialization (the raw-scan row an operator must fix before
    // the dashboard ships at 100 TB)
    "ts_route_explain" -> ((s, dir) => {
      val (build, read) = routeExplainPhases(s, dir); build(); read()
    }),

    // TIME TRAVEL under the driver's gate: three batch-identified
    // ingests land in the attached durable store; the as-of read at
    // batch watermark 1 must hash-match the oracle computed over
    // exactly batches 0-1 (event_id % 3 <= 1) — batch 2's partition
    // prunes at the partition index and is never read
    "ts_asof_batch" -> ((s, dir) => {
      val (build, read) = asofBatchPhases(s, dir); build(); read()
    }),

    // RETENTION under the driver's correctness gate: three daily
    // batches spill to the on-disk store, the first two days age out
    // into retained partials (raw partitions DELETED), and the
    // full-range daily read must still hash-match the oracle computed
    // over the COMPLETE raw history — aged ranges rollup-served,
    // retained-raw ranges compute-on-read, exactly once each.
    "ts_retention_serve" -> ((s, dir) => {
      val (build, read) = retentionPhases(s, dir); build(); read()
    }),

    // right-to-erasure end-to-end: ingest → spill → erase one user
    // bucket (GDPR deletion request) → the served series must equal
    // compute-over-surviving-events exactly (the oracle filters the
    // subject out of raw); replay protection and rollup invalidation
    // are spec-pinned in TimeSeriesServiceSpec
    "ts_erasure_serve" -> ((s, dir) => {
      val (build, read) = erasurePhases(s, dir); build(); read()
    }),

    // O16 + :all sentinel: step none -> NULL bucket, routed hierarchy
    "ts_counter_none" -> ((s, dir) =>
      Timeseries.run(prep(s, dir, withUser = true, one,
          Some(("2024-01-10T00:00", "2024-01-20T00:00"))), countFact, 15,
        Seq("event_type", "user_bucket"), Map("user_bucket" -> Some("3")),
        ts("2024-01-10T00:00"), ts("2024-01-20T00:00"), Step.NoStep)),

    // O10/O16 average: (counter,total) pairs per day, zero-filled
    "ts_avg_day_fill" -> ((s, dir) =>
      Timeseries.run(prep(s, dir, withUser = false, cents,
          Some(("2024-01-03T00:00", "2024-01-10T00:00"))), avgFact, 15,
        Seq("event_type"), Map.empty,
        ts("2024-01-03T00:00"), ts("2024-01-10T00:00"), Step.Day)),

    // O21 histogram (completed beyond reference): clamped bucket counts
    "ts_hist" -> ((s, dir) =>
      Timeseries.runHistogram(prep(s, dir, withUser = false, col("value"),
          Some(("2024-01-01T00:00", "2024-01-31T00:00"))),
        histFact, 15, Seq("event_type"), Map.empty,
        ts("2024-01-01T00:00"), ts("2024-01-31T00:00"))),

    // percentiles FROM the histogram (the read a monitoring stack
    // actually wants from maintained histograms): smallest bucket
    // lower bound reaching q% of the series total — integer-exact
    // (cum·100 >= tot·q), one series partitioning, percentile fan-out
    // by explode over the tiny requested list
    "ts_hist_pct" -> ((s, dir) =>
      Timeseries.histPercentiles(
        Timeseries.runHistogram(prep(s, dir, withUser = false, col("value"),
            Some(("2024-01-01T00:00", "2024-01-31T00:00"))),
          histFact, 15, Seq("event_type"), Map.empty,
          ts("2024-01-01T00:00"), ts("2024-01-31T00:00")),
        Seq("event_type"), Seq(50L, 90L, 95L, 99L))),

    // CDF from the histogram (the inverse read of ts_hist_pct): share
    // of observations at-or-below each requested bucket bound — "what
    // fraction of values were under 100" — served from the same
    // partials, exact long division
    "ts_hist_cdf" -> ((s, dir) =>
      Timeseries.histCdf(
        Timeseries.runHistogram(prep(s, dir, withUser = false, col("value"),
            Some(("2024-01-01T00:00", "2024-01-31T00:00"))),
          histFact, 15, Seq("event_type"), Map.empty,
          ts("2024-01-01T00:00"), ts("2024-01-31T00:00")),
        Seq("event_type"), Seq(40L, 100L, 160L))),

    // O21 served from MATERIALIZED partials: the same histogram query
    // re-aggregated from tall (series × slice × hist_bucket) rollup
    // rows instead of raw events — count re-aggregability makes the
    // result identical, so it shares ts_hist's oracle
    "ts_hist_rollup" -> ((s, dir) => {
      import graft.operators.Rollups
      val prepared = prep(s, dir, withUser = false, col("value"),
        Some(("2024-01-01T00:00", "2024-01-31T00:00")))
      val partials = Rollups.build(prepared, histFact, 15, Seq("event_type"))
      Rollups.runHistogram(partials, histFact, 15, Seq("event_type"),
        Map.empty, ts("2024-01-01T00:00"), ts("2024-01-31T00:00"))
    }),

    // O21 merge-with under the oracle gate: series axis collapsed by
    // the MergeWith UDAF (the reference's declared user-supplied
    // reduction, stubbed in every backend) — with f = + the result
    // must equal the plain grouped count, which DuckDB recomputes
    "ts_hist_merged" -> ((s, dir) => {
      val per = Timeseries.runHistogram(prep(s, dir, withUser = false,
          col("value"), Some(("2024-01-01T00:00", "2024-01-31T00:00"))),
        histFact, 15, Seq("event_type"), Map.empty,
        ts("2024-01-01T00:00"), ts("2024-01-31T00:00"))
      per.groupBy(col("hist_bucket"))
        .agg(graft.functions.MergeWith((a, b) => a + b)(col("value"))
          .as("value"))
    }),

    // O21 + O15/O17: histogram SERIES at a calendar step — one
    // histogram per (series × day), the step surface getTimeseries has
    // applied to the histogram pipeline
    "ts_hist_day" -> ((s, dir) =>
      Timeseries.runHistogram(prep(s, dir, withUser = false, col("value"),
          Some(("2024-01-01T00:00", "2024-01-15T00:00"))),
        histFact, 15, Seq("event_type"), Map.empty,
        ts("2024-01-01T00:00"), ts("2024-01-15T00:00"), Step.Day)),

    // O15 non-ISO week truncation (previous Sunday), week grid
    "ts_week_fill" -> ((s, dir) =>
      Timeseries.run(prep(s, dir, withUser = false, one,
          Some(("2023-12-31T00:00", "2024-02-04T00:00"))), countFact, 15,
        Seq("event_type"), Map("event_type" -> Some("signup")),
        ts("2023-12-31T00:00"), ts("2024-02-04T00:00"), Step.Week)),

    // O15/O17 month truncation + month grid: range straddles empty
    // months on both sides — the fill must produce them as zeros
    "ts_month_fill" -> ((s, dir) =>
      Timeseries.run(prep(s, dir, withUser = false, one,
          Some(("2023-12-01T00:00", "2024-03-01T00:00"))), countFact, 15,
        Seq("event_type"), Map("event_type" -> Some("view")),
        ts("2023-12-01T00:00"), ts("2024-03-01T00:00"), Step.Month)),

    // The reference fans one event out into a table per grouping path
    // (postgres/schema.clj:233-239, update.clj:89-92) — a hand-rolled
    // GROUPING SETS (SURVEY §2.2). Spark-first: ONE aggregation pass
    // materializes every path's rollup; `grouping(dim)` tags which
    // path each row belongs to (1 = coarse [event_type], 0 = fine
    // [event_type, user_bucket]). At 100 TB this halves the number of
    // raw scans per maintained path set versus one job per path.
    "ts_grouping_paths" -> ((s, dir) => {
      val src = eventsRanged(s, dir, "2024-01-08T00:00", "2024-01-11T00:00")
        .select(col("event_type"), userBucket,
          date_trunc("day", col("ts")).as("bucket"))
      src.groupingSets(
          Seq(Seq(col("event_type"), col("bucket")),
            Seq(col("event_type"), col("user_bucket"), col("bucket"))),
          col("event_type"), col("user_bucket"), col("bucket"))
        .agg(grouping(col("user_bucket")).cast(LongType).as("path_id"),
          count(lit(1)).as("value"))
    }),

    // O15 offset-hours timezone shift before day truncation
    "ts_offset_day" -> ((s, dir) =>
      Timeseries.run(prep(s, dir, withUser = false, one,
          Some(("2024-01-05T00:00", "2024-01-10T00:00"))), countFact, 15,
        Seq("event_type"), Map("event_type" -> Some("purchase")),
        ts("2024-01-05T00:00"), ts("2024-01-10T00:00"), Step.Day,
        offsetHours = -5)),

    // O7 slice bucketing at query granularity (15-minute buckets)
    "ts_slice_15m" -> ((s, dir) => {
      val scanned = Timeseries.scan(prep(s, dir, withUser = false, one,
          Some(("2024-01-10T00:00", "2024-01-11T00:00"))), 15,
        Seq("event_type"), Map("event_type" -> Some("purchase")),
        ts("2024-01-10T00:00"), ts("2024-01-11T00:00"))
      Timeseries.sliceBuckets(scanned, countFact, 15, Seq("event_type"))
    }),

    // the SQL text surface: the same slice bucketing as ts_slice_15m,
    // but expressed entirely in spark.sql through the REGISTERED
    // graft_slice session function (plus the non-ISO graft_week as a
    // second grouping column) — the BI-tool/notebook consumption path
    // of the engine's time kernel, still codegen'd built-ins
    "ts_sql_surface" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      events(s, dir).createOrReplaceTempView("graft_events_sql")
      s.sql(s"""
        SELECT event_type, graft_slice(ts, 15) AS bucket,
               graft_week(ts) AS week_bucket, count(*) AS value
        FROM graft_events_sql
        WHERE event_type = 'purchase'
          AND ts >= TIMESTAMP '${lo("2024-01-10T00:00")}'
          AND ts < TIMESTAMP '${hi("2024-01-11T00:00")}'
        GROUP BY 1, 2, 3""")
    }),

    // O13 routing: filter on the parent dim routes to the hierarchy path
    "ts_routing_hier" -> ((s, dir) => {
      val filters: Map[String, Option[String]] = Map("event_type" -> Some("view"))
      val grouping = Timeseries.bestGrouping(userDimGroupedBy, "user_bucket",
        filters.keySet) // -> [event_type, user_bucket]
      Timeseries.run(prep(s, dir, withUser = true, one,
          Some(("2024-01-08T00:00", "2024-01-11T00:00"))), countFact, 15,
        grouping, filters,
        ts("2024-01-08T00:00"), ts("2024-01-11T00:00"), Step.Day)
    }),

    // distinct aggregation breadth (not in reference; built-in)
    "events_distinct_users" -> ((s, dir) =>
      events(s, dir).groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("users"))),

    // BEYOND-REFERENCE fact type: exact DISTINCT-count series (unique
    // users per day) through the full reference pipeline — routed
    // scan, calendar collapse, zero-filled finish-exclusive grid. The
    // reference's scalar fact types cannot express this (distinct
    // counts are not re-aggregable from per-slice scalars).
    "ts_distinct_day" -> ((s, dir) =>
      Timeseries.run(prep(s, dir, withUser = false, col("user_id"),
          Some(("2024-01-05T00:00", "2024-01-12T00:00"))), distinctFact, 15,
        Seq("event_type"), Map("event_type" -> Some("click")),
        ts("2024-01-05T00:00"), ts("2024-01-12T00:00"), Step.Day)),

    // the same series served from TALL (series × slice × value)
    // distinct partials — the histogram trick applied to distinct
    // counting: values retained at slice granularity keep any
    // calendar collapse exact at O(rollup) scan cost. Shares
    // ts_distinct_day's oracle: the two paths must be identical.
    // the tall-partials audit: same recompute-and-diff over the
    // DISTINCT store's (series, slice, dval) keys
    "rollup_audit_distinct" -> ((s, dir) => {
      import graft.operators.Rollups
      val raw = prep(s, dir, withUser = false, col("user_id"),
        Some(("2024-01-05T00:00", "2024-01-12T00:00")))
      val store = Rollups.build(raw, distinctFact, 15, Seq("event_type"))
      Rollups.auditTall(store, raw, distinctFact, 15,
        Seq("event_type"), "dval")
    }),

    "ts_distinct_rollup" -> ((s, dir) => {
      import graft.operators.Rollups
      val partials = Rollups.build(prep(s, dir, withUser = false,
          col("user_id"), Some(("2024-01-05T00:00", "2024-01-12T00:00"))),
        distinctFact, 15, Seq("event_type"))
      Rollups.run(partials, distinctFact, 15, Seq("event_type"),
        Map("event_type" -> Some("click")),
        ts("2024-01-05T00:00"), ts("2024-01-12T00:00"), Step.Day)
    }),

    // co-located large-x-large join: events and the per-user cohort
    // profile are both BUCKETED on user_id (EventSource.writeBucketed),
    // so the MERGE join runs with no exchange on either side — the
    // join shuffle is paid once at layout time; the only runtime
    // exchange is the final cohort aggregation (plan-audit-pinned)
    "bucketed_cohort_spend" -> ((s, dir) => {
      val (evT, usT) = bucketedTables(s, dir)
      s.table(evT).hint("MERGE").join(s.table(usT), Seq("user_id"))
        .groupBy(col("cohort"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value_cents")).as("sum_cents"))
    }),

    // DATE-PARTITIONED raw deployment layout (sources/Layout
    // .writeDatePartitioned): the RAW feed rewritten as event_date=
    // hive directories — the read states its date bounds beside the
    // ts predicate (the ingested store's __event_date discipline), so
    // the unrequested days prune at the PARTITION INDEX, before any
    // row group opens (plan-audit-pinned PartitionFilters). The
    // oracle gates losslessness: the ranged aggregate over the
    // partitioned copy must equal the same aggregate over the raw
    // fixture.
    "events_date_partitioned" -> ((s, dir) => {
      val path = datePartitionedStore(s, dir)
      s.read.parquet(path)
        .where(col("event_date") >= lit("2024-01-08").cast("date") &&
          col("event_date") < lit("2024-01-15").cast("date") &&
          col("ts") >= lit(ts("2024-01-08T00:00")) &&
          col("ts") < lit(ts("2024-01-15T00:00")))
        .groupBy(col("event_type"))
        .agg(count(one).as("n_events"), sum(cents).as("sum_cents"))
    }),

    // Z-ORDER clustered layout (sources/Layout): events rewritten with
    // (user_id, ts) Morton-interleaved range clustering, so parquet
    // min/max stats stay tight on BOTH columns — a predicate on either
    // prunes files/row groups, where a plain sort serves only its
    // leading column (LayoutSpec pins the span advantage). The oracle
    // gates losslessness: the clustered copy must aggregate exactly
    // like the original.
    "events_zorder_roundtrip" -> ((s, dir) => {
      val path = zorderedStore(s, dir)
      s.read.parquet(path).groupBy(col("event_type"))
        .agg(count(one).as("n_events"),
          sum(col("user_id")).as("sum_users"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"))
    }),

    // semi-structured property extraction: events carry a JSON props
    // blob (the universal event-pipeline escape hatch); get_json_object
    // is a row-local codegen'd path expression, so the extraction rides
    // the scan — no UDF, no parse-to-struct materialization, and at
    // 100 TB the blob column never survives past the map side (only
    // the extracted long reaches the exchange)
    "props_json_profile" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("k")).as("sum_k"),
          count(when(col("k") >= 50, 1)).as("n_hi"))),

    // dataset profiling (the "dataset card" numbers for each pipeline
    // stage): per column — rows, nulls, exact distinct cardinality,
    // min/max. One column-pruned single-column aggregation per column,
    // NOT one wide Expand-multiplied aggregate (Profiling scaladoc).
    "events_profile" -> ((s, dir) =>
      graft.operators.Profiling.columnProfile(
        events(s, dir).select("event_id", "user_id", "event_type"),
        Seq("event_id", "user_id", "event_type"))),

    // as-of join: each click matched to the user's most recent purchase
    // value at or before the click (one window shuffle, no range join)
    "asof_click_purchase" -> ((s, dir) => {
      import graft.operators.AsOfJoin
      val e = events(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          round(col("value") * 100).cast(LongType).as("purchase_cents"))
      AsOfJoin.backward(clicks, purchases, Seq("user_id"), "ts",
          Seq("purchase_cents"))
        .select(col("event_id"), col("user_id"), col("purchase_cents"))
    }),

    // forward as-of: each signup matched to the user's NEXT purchase at
    // or after the signup (same single-shuffle window composition,
    // reversed scan direction)
    "asof_signup_next_purchase" -> ((s, dir) => {
      import graft.operators.AsOfJoin
      val e = events(s, dir)
      val signups = e.where(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          round(col("value") * 100).cast(LongType).as("purchase_cents"))
      AsOfJoin.forward(signups, purchases, Seq("user_id"), "ts",
          Seq("purchase_cents"))
        .select(col("event_id"), col("user_id"), col("purchase_cents"))
    }),

    // backward as-of WITH tolerance: matches older than 1 hour null
    // out (merge_asof semantics) — same single-shuffle window
    // composition, the tolerance is a post-match filter
    "asof_click_purchase_tol" -> ((s, dir) => {
      import graft.operators.AsOfJoin
      val e = events(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          round(col("value") * 100).cast(LongType).as("purchase_cents"))
      AsOfJoin.backward(clicks, purchases, Seq("user_id"), "ts",
          Seq("purchase_cents"), tolerance = Some(expr("INTERVAL 1 HOUR")))
        .select(col("event_id"), col("user_id"), col("purchase_cents"))
    }),

    // the full source surface under the oracle gate: wide events →
    // canonical schema (fromWide) → CSV round-trip (EventSource.writeCsv
    // /csv, microsecond-exact timestamps, categories as JSON strings) →
    // the reference pipeline — must match the same raw-parquet oracle
    // as ts_counter_hour_fill
    "events_csv_roundtrip" -> ((s, dir) => {
      import graft.sources.EventSource
      val csvPath = csvDirs.getOrElseUpdate((s, dir), {
        val p = java.nio.file.Files.createTempDirectory("graft_evcsv").toString
        EventSource.writeCsv(
          EventSource.fromWide(
            eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00"),
            "events_count", col("ts"), lit(1L),
            Map("event_type" -> col("event_type"))), p)
        p
      })
      val prepared = EventSource.csv(s, csvPath)
        .where(col("fact") === "events_count")
        .select(col("categories").getItem("event_type").as("event_type"),
          col("ts"), col("value"))
      Timeseries.run(prepared, countFact, 15, Seq("event_type"),
        Map("event_type" -> Some("click")),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Hour)
    }),

    // the JSON twin of the CSV round-trip: raw events → canonical JSON
    // lines (microsecond-explicit timestamps) → the reference pipeline —
    // must match the same raw-parquet oracle
    "events_json_roundtrip" -> ((s, dir) => {
      import graft.sources.EventSource
      val jsonPath = jsonDirs.getOrElseUpdate((s, dir), {
        val p = java.nio.file.Files.createTempDirectory("graft_evjson").toString
        EventSource.writeJson(
          EventSource.fromWide(
            eventsRanged(s, dir, "2024-01-05T00:00", "2024-01-07T00:00"),
            "events_count", col("ts"), lit(1L),
            Map("event_type" -> col("event_type"))), p)
        p
      })
      val prepared = EventSource.json(s, jsonPath)
        .where(col("fact") === "events_count")
        .select(col("categories").getItem("event_type").as("event_type"),
          col("ts"), col("value"))
      Timeseries.run(prepared, countFact, 15, Seq("event_type"),
        Map("event_type" -> Some("click")),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Hour)
    }),

    // time-band range join: every (click, purchase) pair of the same
    // user within one hour forward — bucketed equality join (2× left
    // fan-out), never the per-key cartesian a naive theta join runs
    "range_click_purchase_1h" -> ((s, dir) => {
      import graft.operators.RangeJoin
      val e = events(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      RangeJoin.band(clicks, purchases, Seq("user_id"), "ts",
        windowSeconds = 3600, Seq("click_id", "user_id"),
        Seq(("event_id", "purchase_id")))
    }),

    // multi-touch attribution (first / last / linear) per purchase:
    // the band join (one bucketed equality shuffle, never a per-key
    // cartesian) collects each purchase's trailing-hour clicks; two
    // orderings of ONE purchase partitioning pick the first/last
    // touch, and the linear split is an exact e4 floor — composes
    // B15b's range join into the marketing read a funnel store serves
    "attribution_touch" -> ((s, dir) => {
      import graft.operators.RangeJoin
      import org.apache.spark.sql.expressions.Window
      val e = events(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts"), col("ts").as("click_ts"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          cents.as("pcents"))
      val touches = RangeJoin.band(clicks, purchases, Seq("user_id"),
        "ts", windowSeconds = 3600,
        Seq("click_id", "user_id", "click_ts"),
        Seq(("event_id", "purchase_id"), ("pcents", "purchase_cents")))
      val wAsc = Window.partitionBy(col("purchase_id"))
        .orderBy(col("click_ts").asc, col("click_id").asc)
      val wDesc = Window.partitionBy(col("purchase_id"))
        .orderBy(col("click_ts").desc, col("click_id").desc)
      touches
        .withColumn("rna", row_number().over(wAsc))
        .withColumn("rnd", row_number().over(wDesc))
        .groupBy(col("purchase_id"), col("user_id"), col("purchase_cents"))
        .agg(count(lit(1)).as("n_touches"),
          max(when(col("rna") === 1, col("click_id"))).as("first_click_id"),
          max(when(col("rnd") === 1, col("click_id"))).as("last_click_id"))
        .withColumn("linear_attr_e4",
          floor((lit(10000.0) * col("purchase_cents")) / col("n_touches"))
            .cast(LongType))
    }),

    // gap-based sessionization (30-minute inactivity) via the built-in
    // session_window — stateful event analytics the reference lacks
    "event_sessions" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("n_events"))),

    // gap + MAX-DURATION sessionization (the cap that stops idle
    // refreshes accreting week-long "sessions"): recursive semantics
    // — an event's session depends on the running session START — so
    // the plan is the per-user greedy fold, and the oracle is a
    // genuine recursive CTE; 12h gap / 24h cap makes both rules fire
    // on the fixture (~2.6 events/session, cap splits included)
    "event_sessions_capped" -> ((s, dir) =>
      graft.operators.Sessions.cappedSessions(events(s, dir), "user_id",
        "ts", gapMinutes = 720, maxDurationMinutes = 1440)),

    // CONCURRENCY / occupancy analytics: active sessions per hour.
    // The duration cap makes the hour fan-out row-local AND bounded
    // (≤ cap/1h + 1 rows per session) — the interval-overlap count
    // needs no global timeline sort, just one hash agg on hour
    "session_hourly_active" -> ((s, dir) => {
      val sess = graft.operators.Sessions.cappedSessions(events(s, dir),
        "user_id", "ts", gapMinutes = 720, maxDurationMinutes = 1440)
      sess
        .select(explode(sequence(
          expr("CAST(session_start AS LONG) DIV 3600"),
          expr("CAST(session_end AS LONG) DIV 3600"))).as("hour_idx"))
        .groupBy(col("hour_idx"))
        .agg(count(lit(1)).as("n_active"))
    }),

    // Markov TRANSITION matrix over event types (the aggregate view
    // of the next-event structure: P(next | current) as exact counts
    // + ×10⁴ integral probabilities): one user exchange for the lag,
    // one hash agg on the (from, to) pair
    "event_transition_matrix" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .select(col("user_id"), col("event_type").as("to_type"),
          lag(col("event_type"), 1).over(byUser).as("from_type"))
        .where(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p_e4", expr("10000 * n DIV " +
          "sum(n) OVER (PARTITION BY from_type)").cast("long"))
    }),

    // RFM features (recency / frequency / monetary): the classic
    // per-entity feature triple — ONE hash agg on user_id, no global
    // window (quintile scoring at billion-entity scale belongs to the
    // prefix-sum rank machinery, not an unpartitioned ntile)
    "user_rfm" -> ((s, dir) =>
      events(s, dir)
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(max(col("ts").cast("long")).as("last_purchase_s"),
          count(lit(1)).as("n_purchases"),
          sum(cents).as("total_cents"))),

    // POINT-IN-TIME training-set assembly — the feature-store read
    // that must never leak the future: for every purchase (the label
    // event), the user's trailing-hour click count and the age of the
    // last click strictly-or-equal before it. ONE union stream, ONE
    // user exchange, two frames over the same ordering — features come
    // only from rows at or before the label time by construction.
    "training_asof_features" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val secs = col("ts").cast("long")
      val e = events(s, dir)
        .where(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("user_id"), secs.as("s"),
          col("event_type"),
          when(col("event_type") === "click", 1L).otherwise(0L)
            .as("is_click"),
          cents.as("cents"))
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("s"))
      val hour = byUser.rangeBetween(-3600L, 0L)
      val past = byUser.rangeBetween(Window.unboundedPreceding, 0L)
      e.withColumn("clicks_1h", sum(col("is_click")).over(hour))
        .withColumn("last_click_s",
          max(when(col("is_click") === 1L, col("s"))).over(past))
        .where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("clicks_1h"),
          (col("s") - col("last_click_s")).as("click_gap_s"),
          col("cents").as("label_cents"))
    }),

    // SEQUENCE-MODEL training examples (Sessions.nextEventExamples):
    // per event, the user's previous 3 event types + µs-exact gap,
    // labeled by what happened — one hash exchange on user_id serves
    // both window frames
    "event_next_examples" -> ((s, dir) =>
      graft.operators.Sessions.nextEventExamples(events(s, dir),
        "user_id", "ts", "event_type", "event_id", k = 3)),

    // ONLINE example generation: the streaming twin's watermark-gated
    // ordered drain must emit exactly the batch window's examples
    // (shared oracle; sentinels filtered)
    "stream_next_examples" -> ((s, dir) =>
      s.read.parquet(streamedNextExamples(s, dir))
        .where(col("user_id") >= 0L)
        .select(col("event_id"), col("user_id"), col("prefix"),
          col("gap_us"), col("label"))),

    // per-entity rolling features (the feature-engineering op of an
    // event-driven training pipeline): for EVERY event, the count of
    // the same user's events in the trailing hour (RANGE frame on
    // event time — tie-complete, so concurrent events see each other)
    // and the seconds since the user's previous event. ONE shuffle on
    // user_id serves both window frames; at 100 TB this is the same
    // single hash partitioning any per-entity pass needs.
    "event_user_features" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val secs = col("ts").cast("long")
      val byUser = Window.partitionBy(col("user_id"))
      val rolling = byUser.orderBy(secs).rangeBetween(-3600L, 0L)
      val seq = byUser.orderBy(secs, col("event_id"))
      events(s, dir).select(col("event_id"), col("user_id"),
        count(lit(1)).over(rolling).as("n_prev_1h"),
        (secs - lag(secs, 1).over(seq)).as("secs_since_prev"))
    }),

    // trailing z-score anomaly detection (the alerting read a counter
    // store exists to serve): per user, flag values deviating > 3
    // trailing sigmas from the mean of the previous <=20 observations
    // (min 8). Integer-exact cross-multiplied test — no sqrt, no
    // division — so the oracle hash-matches; ONE entity partitioning,
    // O(baseN) frame state, row-local verdict.
    "event_anomalies" -> ((s, dir) => {
      import graft.operators.Anomaly
      val e = events(s, dir).select(col("event_id"), col("user_id"),
        col("ts").cast("long").as("sec"), cents.as("value_cents"))
      Anomaly.trailingZFlags(e, col("user_id"),
          Seq(col("sec"), col("event_id")), col("value_cents"),
          baseN = 20, minN = 8, k = 3)
        .where(col("is_anomaly"))
        .select(col("event_id"), col("user_id"), col("value_cents"),
          col("n_base"), col("base_sum"))
    }),

    // CUBE fan-out (the 2ᵈ companion of B18's GROUPING SETS): all four
    // (event_type × day) marginals in ONE pass — Spark's Expand feeds
    // a single hash aggregation, no per-marginal rescans; grouping()
    // flags disambiguate data NULLs from roll-up rows
    "events_cube" -> ((s, dir) =>
      events(s, dir)
        .withColumn("day", col("ts").cast("date").cast("string"))
        .cube(col("event_type"), col("day"))
        .agg(
          grouping(col("event_type")).cast(LongType).as("g_type"),
          grouping(col("day")).cast(LongType).as("g_day"),
          count(lit(1)).as("n_events"),
          sum(cents).as("sum_cents"))
        .select(
          coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("day"), lit("ALL")).as("day"),
          col("g_type"), col("g_day"), col("n_events"), col("sum_cents"))),

    // event-type AFFINITY (market-basket-lite): for every unordered
    // type pair, how many users performed both — the co-occurrence
    // read behind "users who X also Y". The self-join runs on the
    // (user, type)-DISTINCT pairs (≤ |users|·|types| rows), never raw
    // events, and output is |types|² small
    // Bloom-pregated semi-join (the key-set filter for sets past
    // broadcast range): keep only events of BUILDING-segment customers
    // — the fact side is gated by a row-local might_contain probe
    // before the exact semi-join, so the shuffle moves ~|matches|
    // instead of the whole fact table. Exactly the plain semi-join
    // (the oracle is the plain EXISTS text)
    "events_bloom_semijoin" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("event_type"), col("user_id"), cents.as("value_cents"))
      val keys = s.read.parquet(s"$dir/customer.parquet")
        .where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("user_id"))
      graft.operators.BloomJoin.bloomSemiJoin(e, keys, Seq("user_id"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value_cents")).as("sum_cents"))
    }),

    // salted fact×dimension join (the hot-key layout fix): events are
    // naturally skewed per user (power users are hot keys at corpus
    // scale), customer is the SF-growing dimension that outgrows
    // broadcast — SkewJoin salts the fact side across 8 sub-keys and
    // replicates the dimension ×8, so no reducer owns a whole hot key.
    // Salting is result-invisible: the oracle is the PLAIN join SQL,
    // and ScaleSpec pins salted ≡ unsalted + the fan-out itself
    "events_salted_enrich" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("event_id"), col("user_id"), cents.as("value_cents"))
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      graft.operators.SkewJoin.saltedInnerJoin(
          e, cust, Seq("user_id"), col("event_id"), buckets = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value_cents")).as("sum_cents"))
    }),

    "event_type_affinity" -> ((s, dir) => {
      val ut = events(s, dir)
        .select(col("user_id"), col("event_type")).distinct()
      val a = ut.withColumnRenamed("event_type", "type_a")
      val b = ut.withColumnRenamed("event_type", "type_b")
      a.join(b, Seq("user_id"))
        .where(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // LINK-ANALYSIS centrality (integer fixed-point weighted PageRank,
    // graft.operators.Graph) over the per-user event-type TRANSITION
    // graph. The web-corpus quality-weighting operator (crawl curation
    // ranks hosts this way) exercised on the fixture's natural graph;
    // all-integer arithmetic makes the 5-iteration power method
    // bit-reproducible against the unrolled SQL oracle
    "events_pagerank" -> ((s, dir) =>
      graft.operators.Graph
        .weightedPageRankE9(transitionEdges(s, dir),
          "src", "dst", "w", iters = 5)
        .withColumnRenamed("id", "event_type")),

    // CDC APPLY (graft.operators.Cdc — the MERGE/upsert maintenance
    // loop): events replay as a change log keyed by user ('error' =
    // delete, anything else upserts the user's latest activity), and
    // the query runs the COMPACTION shape — state snapshotted at a
    // mid-history cut, then the remaining log applied on top — which
    // must be bit-identical to replaying the full log (the oracle
    // computes the full-history state directly)
    "cdc_user_state" -> ((s, dir) => {
      import graft.operators.Cdc
      val ops = events(s, dir)
        .select(col("user_id"), col("event_type"), cents.as("last_cents"),
          col("ts"), col("event_id"))
        .withColumn("op",
          when(col("event_type") === "error", "D").otherwise("U"))
      val cut = lit(java.sql.Timestamp.valueOf("2024-01-08 00:00:00"))
      val snap = Cdc.applyChanges(None, ops.where(col("ts") < cut),
        Seq("user_id"), Seq("event_type", "last_cents"),
        Seq("ts", "event_id"), "op")
      Cdc.applyChanges(Some(snap), ops.where(col("ts") >= cut),
          Seq("user_id"), Seq("event_type", "last_cents"),
          Seq("ts", "event_id"), "op")
        .withColumnRenamed("event_type", "last_type")
    }),

    // STREAMING quality monitoring: each micro-batch's violation
    // report (graft.operators.Quality) lands with its batch id — the
    // per-batch trend a degrading feed shows up in. The landing split
    // is the same deterministic mid-history cut the CDC twin uses, so
    // the oracle recomputes each batch's report exactly
    "stream_quality_monitor" -> ((s, dir) => {
      val path = streamedQualityReports(s, dir)
      s.read.parquet(path)
        .select(col("batch_id"), col("check"), col("violations"),
          col("status"))
    }),

    // STREAM-STATIC SCD enrichment twin: clicks replayed in two
    // micro-batches against the offline-built Type-2 purchase-level
    // dimension — enrichment is row-pure against a static dimension,
    // so the appended batches aggregate to EXACTLY the batch
    // pointInTime read (shared oracle verbatim)
    "stream_scd_click_level" -> ((s, dir) => {
      val path = streamedScdClicks(s, dir)
      s.read.parquet(path)
        .groupBy(coalesce(col("level"), lit(0L)).as("level"))
        .agg(count(lit(1)).as("n_clicks"))
    }),

    // WATERMARK-HEALTH observability: per micro-batch, how many rows
    // arrived older than (prior batches' max event time − 1h)? Batch
    // 1 sets the mark; batch 2 carries the replayed history and must
    // count exactly those rows late — the report is a pure function
    // of batch contents and order, so the oracle states it from the
    // same split rule
    "stream_late_profile" -> ((s, dir) => {
      val path = streamedLateReports(s, dir)
      s.read.parquet(path)
        .select(col("__batch_id").cast(LongType).as("batch_id"),
          col("n_rows"), col("n_late"), col("max_ts"))
    }),

    // the STREAMING-maintained CDC state table under the same oracle:
    // the change log replays as two micro-batches, each applying onto
    // the previous committed state VERSION (v=0 → v=1); the final
    // version must equal the batch operator's full-replay state —
    // lateness rides the SEQUENCE columns, so the arrival split is
    // semantically invisible
    "stream_cdc_user_state" -> ((s, dir) => {
      val path = streamedCdcState(s, dir)
      graft.streaming.StreamingIngest.readState(s, path)
        .withColumnRenamed("event_type", "last_type")
    }),

    // PERSONALIZED PageRank seeded at 'signup': restart mass lands on
    // the seed only, so ranks measure PROXIMITY to signups through the
    // transition structure — the seed-expansion curation read
    // ("what does the good stuff link to?"); same integer contract
    "events_ppr_signup" -> ((s, dir) =>
      graft.operators.Graph.personalizedPageRankE9(
          transitionEdges(s, dir), "src", "dst", "w",
          seeds = Seq("signup"), iters = 5)
        .withColumnRenamed("id", "event_type")),

    // K-ANONYMITY release gate (graft.operators.Pii): daily per-
    // (event_type, user_bucket) spend stats are released only when
    // backed by ≥5 distinct users — the suppression rule that keeps a
    // published aggregate non-re-identifying; the fixture exercises
    // both branches (~1/3 of cells suppress at k=5)
    "events_kanon_release" -> ((s, dir) => {
      val rows = events(s, dir).select(col("event_type"),
        date_trunc("day", col("ts")).as("day"), userBucket,
        col("user_id"), cents.as("c"))
      graft.operators.Pii.kAnonymousAggregate(rows,
        Seq("event_type", "day", "user_bucket"), "user_id", k = 5,
        Seq("n_events" -> count(lit(1)), "sum_cents" -> sum(col("c"))))
    }),

    // SCD TYPE-2 point-in-time read (graft.operators.Scd): each
    // user's "level" is their cumulative purchase count — a change
    // log that builds into validity intervals — and every click joins
    // the level that was current AT CLICK TIME (not the user's final
    // level: the no-time-travel-leakage property SCD2 exists for).
    // Same-instant purchases exercise the supersede collapse
    "scd_click_level" -> ((s, dir) => {
      val e = events(s, dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val changes = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("level", row_number().over(w).cast(LongType))
      val scd2 = graft.operators.Scd
        .buildType2(changes, Seq("user_id"), "ts", col("event_id"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"))
      graft.operators.Scd
        .pointInTime(clicks, scd2, Seq("user_id"), "ts", Seq("level"))
        .groupBy(coalesce(col("level"), lit(0L)).as("level"))
        .agg(count(lit(1)).as("n_clicks"))
    }),

    // cross-series LEAD/LAG profile ("do clicks lead purchases?"):
    // daily click and purchase series zero-filled on the shared day
    // grid, exact integer cross-covariance numerator n·Σxy − Σx·Σy
    // at every lag in −3..3 — the correlation-structure read an
    // attribution model starts from; all-exact longs, no ranking of
    // floats anywhere
    "series_lag_profile" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("event_type"), col("ts").cast("date").as("day"))
      val days = e.select(col("day")).distinct()
      def daily(t: String) = days
        .join(e.where(col("event_type") === t)
          .groupBy(col("day")).agg(count(lit(1)).as("c")),
          Seq("day"), "left")
        .select(col("day"), coalesce(col("c"), lit(0L)).as("c"))
      val a = daily("click").select(col("day"), col("c").as("ca"))
      val b = daily("purchase").select(col("day").as("bday"),
        col("c").as("cb"))
      a.select(col("day"), col("ca"),
          explode(sequence(lit(-3), lit(3))).as("lag"))
        .join(b, date_add(col("day"), col("lag")) === col("bday"))
        .groupBy(col("lag").cast("long").as("lag"))
        .agg(count(lit(1)).as("n_days"),
          (count(lit(1)) * sum(col("ca") * col("cb")) -
            sum(col("ca")) * sum(col("cb"))).as("cov_num"))
    }),

    // time-series SIMILARITY search ("which entities behave like this
    // one?"): per-user daily count series ranked by EXACT integer
    // squared euclidean distance to the query user's series over the
    // shared day grid — no float normalization, so the ranking is
    // deterministic. SPARSE algebra, no dense grid: over the zero
    // -filled grid, dist²(u,q) = Σ_d qc_d² + Σ_{d: c_u,d>0}
    // ((c−qc)² − qc²) — days where BOTH series are 0 contribute
    // nothing, user-only days contribute c², query-only days are the
    // broadcast Σqc² constant corrected on overlap. Cost is the
    // user-day SPARSE row count (≤ event volume after the first
    // dedup-agg), never |users|·|days| — at 10⁹ users × 365 days the
    // dense grid is 3.6e11 rows; this never materializes it
    "series_similarity" -> ((s, dir) => {
      val cnt = events(s, dir)
        .select(col("user_id"), col("ts").cast("date").as("day"))
        .groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("c"))
      val q = cnt.where(col("user_id") === 7)
        .select(col("day"), col("c").as("qc"))
      // Σqc² — the whole-grid constant (zero days contribute 0)
      val q2 = q.agg(coalesce(sum(col("qc") * col("qc")), lit(0L))
        .as("__q2"))
      cnt.where(col("user_id") =!= 7)
        .join(broadcast(q), Seq("day"), "left")
        .withColumn("__qc", coalesce(col("qc"), lit(0L)))
        .groupBy(col("user_id"))
        .agg(sum((col("c") - col("__qc")) * (col("c") - col("__qc"))
          - col("__qc") * col("__qc")).as("__part"))
        .crossJoin(broadcast(q2)) // 1-row stats frame
        .select(col("user_id"),
          (col("__part") + col("__q2")).as("dist2"))
        .orderBy(col("dist2").asc, col("user_id"))
        .limit(5)
    }),

    // rolling 7-day active users (the WAU product metric): each
    // (user, day) DISTINCT pair fans out to the ≤7 reporting days its
    // activity supports, then one exact count-distinct per day — the
    // fan-out is bounded by 7 × |user-day pairs| (already
    // deduplicated), never by raw event volume
    "rolling_wau" -> ((s, dir) => {
      val du = events(s, dir)
        .select(col("user_id"), col("ts").cast("date").as("day"))
        .distinct()
      val days = du.select(col("day")).distinct()
      du.select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("off"), col("day"))
        .select(col("user_id"), date_add(col("day"), col("off")).as("day"))
        .join(days, Seq("day"), "left_semi")
        .groupBy(col("day").cast("string").as("day"))
        .agg(count_distinct(col("user_id")).as("wau"))
    }),

    // UNPIVOT (melt) back to long form: the cross-tab's inverse —
    // zero cells become explicit (day, type, 0) rows, the shape a
    // modeling pipeline wants after a BI-style pivot
    "events_unpivot" -> ((s, dir) =>
      events(s, dir)
        .withColumn("day", col("ts").cast("date").cast("string"))
        .groupBy(col("day"))
        .pivot("event_type",
          Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "view", "purchase", "signup", "error"))
        .unpivot(Array(col("day")),
          Array(col("click"), col("view"), col("purchase"),
            col("signup"), col("error")),
          "event_type", "n_events")),

    // PIVOT (the BI cross-tab surface): daily event counts spread
    // into one column per event type — explicit value list, so Spark
    // skips the extra distinct-scan pass and the plan is one
    // aggregation; zero-filled like any cross-tab
    "events_pivot" -> ((s, dir) =>
      events(s, dir)
        .withColumn("day", col("ts").cast("date").cast("string"))
        .groupBy(col("day"))
        .pivot("event_type",
          Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .select(col("day"),
          coalesce(col("click"), lit(0L)).as("n_click"),
          coalesce(col("view"), lit(0L)).as("n_view"),
          coalesce(col("purchase"), lit(0L)).as("n_purchase"),
          coalesce(col("signup"), lit(0L)).as("n_signup"),
          coalesce(col("error"), lit(0L)).as("n_error"))),

    // per-series lag-1 autocovariance (is the series trending or
    // mean-reverting?): pairs via one window lag, then the exact
    // cross-multiplied population covariance n·Σxy − Σx·Σy in
    // decimal(38,0) — the Anomaly.trailingZFlags arithmetic — with
    // ONE double conversion at the end (both engines round the same
    // exact integer to the same double)
    "series_autocov" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val dec = DecimalType(38, 0)
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("sec"), col("event_id"))
      val pairs = events(s, dir)
        .select(col("event_type"), col("ts").cast("long").as("sec"),
          col("event_id"), cents.as("x"))
        .withColumn("xprev", lag(col("x"), 1).over(w))
        .where(col("xprev").isNotNull)
      val agg = pairs.groupBy(col("event_type")).agg(
        count(lit(1)).as("n_pairs"),
        sum(col("x").cast(dec) * col("xprev").cast(dec)).as("sxy"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("xprev").cast(dec)).as("sy"))
      val covd = (col("n_pairs").cast(dec) * col("sxy") -
        col("sx") * col("sy")).cast(DoubleType)
      val nd = col("n_pairs").cast(DoubleType)
      agg.select(col("event_type"), col("n_pairs"),
        floor(lit(100.0) * (covd / (nd * nd))).cast(LongType)
          .as("autocov_e2"))
    }),

    // MAD robust-outlier profile: median and median-absolute-deviation
    // per event type, both EXACT discrete medians via the rank trick
    // (low median, deterministic tie-break) — the robust twin of the
    // z-score anomaly flags: one 50%-outlier burst shifts a mean/stddev
    // gate but leaves med/MAD standing. Outlier convention: integer
    // compare |v − med| > 5·MAD (no 1.4826 normal-consistency float).
    // Two rank windows on ONE event_type partitioning + count-only
    // final aggregation
    "events_mad_outliers" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = events(s, dir)
        .select(col("event_type"), col("event_id"), cents.as("v"))
      def medOf(df: DataFrame, valueCol: String, outName: String) = {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col(valueCol), col("event_id"))
        df.withColumn("rn", row_number().over(w))
          .withColumn("n",
            count(lit(1)).over(Window.partitionBy(col("event_type"))))
          .groupBy(col("event_type"))
          .agg(max(when(col("rn") === floor((col("n") - 1) * 50 / lit(100)) + 1,
            col(valueCol))).as(outName))
      }
      val med = medOf(e, "v", "med_cents")
      val absDev = e.join(broadcast(med), Seq("event_type"))
        .withColumn("ad", abs(col("v") - col("med_cents")))
      val mad = medOf(absDev, "ad", "mad_cents")
      e.join(broadcast(med), Seq("event_type"))
        .join(broadcast(mad), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          max(col("med_cents")).as("med_cents"),
          max(col("mad_cents")).as("mad_cents"),
          sum(when(abs(col("v") - col("med_cents")) >
            lit(5L) * col("mad_cents"), 1L).otherwise(0L))
            .as("n_outliers"))
    }),

    // WINSORIZATION profile (outlier clipping, the standard cleaning
    // step before value aggregates): per event type, clip values to
    // the exact discrete [p01, p99] band — rank-picked bounds (the
    // length_percentiles trick, no interpolated doubles), then one
    // pass re-aggregates clipped vs raw sums and the clip counts. Two
    // window functions on ONE event_type partitioning + one join of
    // the 5-row bounds table back onto events (broadcast)
    "events_winsorized" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = events(s, dir)
        .select(col("event_type"), col("event_id"), cents.as("v"))
      val byV = Window.partitionBy(col("event_type"))
        .orderBy(col("v"), col("event_id"))
      val ranked = e
        .withColumn("rn", row_number().over(byV))
        .withColumn("n",
          count(lit(1)).over(Window.partitionBy(col("event_type"))))
      def pick(p: Int) =
        max(when(col("rn") === floor((col("n") - 1) * p / lit(100)) + 1,
          col("v")))
      val bounds = ranked.groupBy(col("event_type"))
        .agg(pick(1).as("lo"), pick(99).as("hi"))
      e.join(broadcast(bounds), Seq("event_type"))
        .select(col("event_type"), col("v"), col("lo"), col("hi"),
          greatest(col("lo"), least(col("hi"), col("v"))).as("w"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("v") < col("lo"), 1L).otherwise(0L))
            .as("n_clipped_lo"),
          sum(when(col("v") > col("hi"), 1L).otherwise(0L))
            .as("n_clipped_hi"),
          sum(col("v")).as("sum_raw_cents"),
          sum(col("w")).as("sum_wins_cents"))
    }),

    // weekly SEASONALITY profile: per (event type, day-of-week), how
    // far the mean daily count sits from the series' overall daily
    // mean — the "is Monday special" read that the trend fit cannot
    // answer. The deviation (s·n_days − sy·n)/(n·n_days) keeps both
    // cross-products in exact decimal(38,0) with ONE terminal double
    // division; day-of-week alignment pinned to DuckDB's 0=Sunday
    // (Spark dayofweek−1). Two aggregations over daily counts — only
    // the first sees event-scale data
    "series_seasonality" -> ((s, dir) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val dec = DecimalType(38, 0)
      val daily = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(one).as("y"))
      val tot = daily.groupBy(col("event_type"))
        .agg(count(one).as("n_days"), sum(col("y")).as("sy"))
      val byDow = daily
        .groupBy(col("event_type"),
          (dayofweek(col("d")) - 1).cast(LongType).as("dow"))
        .agg(count(one).as("n"), sum(col("y")).as("sw"))
      byDow.join(tot, Seq("event_type"))
        .select(col("event_type"), col("dow"), col("n"),
          floor(lit(10000.0) *
            ((col("sw").cast(dec) * col("n_days").cast(dec) -
              col("sy").cast(dec) * col("n").cast(dec)).cast(DoubleType) /
             (col("n").cast(dec) * col("n_days").cast(dec))
               .cast(DoubleType)))
            .cast(LongType).as("dev_e4"))
    }),

    // TIME-WEIGHTED average per series (the irregular-sampling TSDB
    // read): each sample holds its value until the next one, so the
    // mean must weight by holding time, not sample count — a
    // burst of 100 readings in one minute must not drown 23 quiet
    // hours. One window lead per series gives the holding interval
    // (the last sample holds until the window end), then
    // twa = Σ vᵢ·(tᵢ₊₁−tᵢ) / (end − t₀) with the integral in exact
    // decimal(38,0) cents·seconds and ONE terminal double division —
    // single entity partitioning, no self-join, O(1) state per row
    "series_twa" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val dec = DecimalType(38, 0)
      val hiSec = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
        .toInstant.getEpochSecond
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("sec"), col("event_id"))
      val e = events(s, dir)
        .where(col("user_id") < 40 && col("ts") <
          lit(java.sql.Timestamp.valueOf("2024-02-01 00:00:00")))
        .select(col("user_id"), col("event_id"),
          col("ts").cast("long").as("sec"), cents.as("v"))
        .withColumn("nxt",
          coalesce(lead(col("sec"), 1).over(w), lit(hiSec)))
      val agg = e.groupBy(col("user_id")).agg(
        count(lit(1)).as("n_samples"),
        min(col("sec")).as("t0"),
        sum(col("v").cast(dec) *
          (col("nxt") - col("sec")).cast(dec)).as("integral"))
      agg.select(col("user_id"), col("n_samples"),
        floor(lit(100.0) * (col("integral").cast(DoubleType) /
          (lit(hiSec) - col("t0")).cast(DoubleType)))
          .cast(LongType).as("twa_e2"))
    }),

    // per-series linear trend (is traffic growing, and how fast?):
    // daily counts per event type, then closed-form OLS over the day
    // index — slope and intercept both from the exact cross-products
    // n·Σxy − Σx·Σy and Σy·Σx² − Σx·Σxy in decimal(38,0), ONE double
    // division each at the very end (the series_autocov discipline).
    // Two shuffles total (day grouping, then per-type fold of ≤365
    // rows/type/year) — no window, no sort; at 100 TB the first
    // aggregation is the only one that sees event-scale data
    "series_trend" -> ((s, dir) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val dec = DecimalType(38, 0)
      val daily = events(s, dir)
        .groupBy(col("event_type"),
          floor(col("ts").cast("long") / 86400L).cast(LongType)
            .as("day_idx"))
        .agg(count(lit(1)).as("y"))
      val agg = daily.groupBy(col("event_type")).agg(
        count(lit(1)).as("n_days"),
        sum(col("day_idx").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum(col("day_idx").cast(dec) * col("y").cast(dec)).as("sxy"),
        sum(col("day_idx").cast(dec) * col("day_idx").cast(dec))
          .as("sxx"))
      val den = (col("n_days").cast(dec) * col("sxx") -
        col("sx") * col("sx")).cast(DoubleType)
      val slopeNum = (col("n_days").cast(dec) * col("sxy") -
        col("sx") * col("sy")).cast(DoubleType)
      val interNum = (col("sy") * col("sxx") -
        col("sx") * col("sxy")).cast(DoubleType)
      agg.where(col("n_days") >= 2)
        .select(col("event_type"), col("n_days"),
          floor(lit(1000000.0) * (slopeNum / den)).cast(LongType)
            .as("slope_e6"),
          floor(lit(100.0) * (interNum / den)).cast(LongType)
            .as("intercept_e2"))
    }),

    // the SAME trend fit served from the materialized day-tier rollup:
    // the user writes a plain daily count(*) aggregate over raw events
    // and the routing rule swaps in the day partials — the OLS fold
    // then runs over O(types × days) rollup rows, so at 100 TB the
    // trend never scans an event. Shares series_trend's oracle: routed
    // ≡ raw is the gate (day_idx from the UTC day bucket is the same
    // floor(epoch/86400) integer)
    "series_trend_routed" -> ((s, dir) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val dec = DecimalType(38, 0)
      val raw = routedRaw(s, dir)
      ensureRoutedDay(s, dir)
      val daily = raw
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(one).as("y"))
        .withColumn("day_idx", (col("day").cast("long") / 86400L)
          .cast(LongType))
      val agg = daily.groupBy(col("event_type")).agg(
        count(one).as("n_days"),
        sum(col("day_idx").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum(col("day_idx").cast(dec) * col("y").cast(dec)).as("sxy"),
        sum(col("day_idx").cast(dec) * col("day_idx").cast(dec))
          .as("sxx"))
      val den = (col("n_days").cast(dec) * col("sxx") -
        col("sx") * col("sx")).cast(DoubleType)
      val slopeNum = (col("n_days").cast(dec) * col("sxy") -
        col("sx") * col("sy")).cast(DoubleType)
      val interNum = (col("sy") * col("sxx") -
        col("sx") * col("sxy")).cast(DoubleType)
      agg.where(col("n_days") >= 2)
        .select(col("event_type"), col("n_days"),
          floor(lit(1000000.0) * (slopeNum / den)).cast(LongType)
            .as("slope_e6"),
          floor(lit(100.0) * (interNum / den)).cast(LongType)
            .as("intercept_e2"))
    }),

    // EWMA smoothing (α = 1/2, trailing 8 rows) per user series — the
    // level-tracking companion to the flat moving average; Horner-fold
    // powers-of-two weights keep numerator/denominator exact longs,
    // one per-entity partitioning, O(w) frame state
    "event_ewma" -> ((s, dir) => {
      import graft.operators.Anomaly
      graft.functions.GraftFunctions.register(s)
      val e = events(s, dir)
        .where(col("user_id") < 40)
        .select(col("event_id"), col("user_id"),
          col("ts").cast("long").as("sec"), cents.as("value_cents"))
      // fused codegen fold (graft_ewma_e4) — the HOF pair is the
      // spec-pinned semantic reference
      Anomaly.ewma(e, col("user_id"),
          Seq(col("sec"), col("event_id")), col("value_cents"), w = 8,
          foldFn = graft.functions.GraftFunctions.ewmaE4Native)
        .select(col("event_id"), col("user_id"), col("value_cents"),
          col("ewma_e4"))
    }),

    // M4 DOWNSAMPLING (graft.operators.Downsample — Jugel et al.,
    // VLDB'14): per (user, day) retain only the first/last/min/max
    // rows — the error-free rendering read (a min/max line plot of
    // the downsample is pixel-identical to the full series). Pure
    // selection, so the oracle is the same four row_number picks;
    // ≤ 4 rows per series-bucket regardless of density
    "series_m4_downsample" -> ((s, dir) => {
      val e = events(s, dir)
        .where(col("user_id") < 40)
        .select(col("user_id"), col("ts"), col("event_id"),
          cents.as("value_cents"))
        .withColumn("bucket", date_trunc("day", col("ts")))
        .withColumn("sec", col("ts").cast("long"))
      graft.operators.Downsample.m4(e, col("user_id"), col("bucket"),
          Seq(col("sec"), col("event_id")), col("value_cents"))
        .select(col("user_id"), col("bucket"), col("event_id"),
          col("value_cents"))
    }),

    // HOLT double-exponential smoothing (graft.operators.Anomaly.holt):
    // per-user (level, trend) state with α=1/2, β=1/4 integer gains
    // and the 8-step-ahead linear forecast — the trend-aware serving
    // read EWMA can't give (a climbing series is extrapolated, not
    // lagged). One hash agg + per-series fold on the Spark side; the
    // oracle replays the IDENTICAL floor-division recursion as a
    // recursive CTE, so the fold is pinned step-for-step
    "series_holt" -> ((s, dir) => {
      import graft.operators.Anomaly
      val e = events(s, dir)
        .where(col("user_id") < 40)
        .select(col("user_id"), col("ts").cast("long").as("sec"),
          col("event_id"), cents.as("value_cents"))
      Anomaly.holt(e, col("user_id"),
        Seq(col("sec"), col("event_id")), col("value_cents"),
        horizon = 8)
    }),

    // CUSUM change-point detection (graft.operators.Anomaly.cusumFlags
    // — Page's sequential test): sustained per-user spend drift away
    // from a 50.00 target accumulates past a 200.00 decision interval
    // where the z-flagger only sees single spikes. The recursion runs
    // as its prefix-sum/running-min closed form — two same-sort window
    // passes, integer-exact, which is also what lets the oracle state
    // the identical algebra in plain window SQL
    "event_cusum" -> ((s, dir) => {
      import graft.operators.Anomaly
      val e = events(s, dir)
        .where(col("user_id") < 40)
        .select(col("event_id"), col("user_id"),
          col("ts").cast("long").as("sec"), cents.as("value_cents"))
      Anomaly.cusumFlags(e, col("user_id"),
          Seq(col("sec"), col("event_id")), col("value_cents"),
          target = 5000L, slack = 1000L, threshold = 20000L)
        .where(col("is_shift"))
        .select(col("event_id"), col("user_id"), col("value_cents"),
          col("s_pos"), col("s_neg"))
    }),

    // PLANES COMPOSED: CUSUM drift over a ROLLUP-SERVED daily series —
    // the aggregate under the window is transparently rewritten by
    // RollupRouteRule to scan the materialized partials (the
    // production monitoring shape: the alarm never re-scans raw
    // history), while the oracle recomputes the identical closed form
    // from raw events — routing AND the drift algebra must both be
    // answer-invisible at once
    "ts_cusum_routed" -> ((s, dir) => {
      import graft.operators.Anomaly
      val raw = routedRaw(s, dir)
      ensureRouted(s, dir)
      val daily = raw
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n_events"))
      Anomaly.cusumFlags(daily, col("event_type"), Seq(col("bucket")),
          col("n_events"), target = 67L, slack = 3L, threshold = 20L)
        .where(col("is_shift"))
        .select(col("event_type"), col("bucket"), col("n_events"),
          col("s_pos"), col("s_neg"))
    }),

    // Catalyst rollup routing (SURVEY §4's custom-Rule upgrade of
    // `best-grouping`): a plain DataFrame aggregate over raw events is
    // transparently rewritten by graft.plans.RollupRouteRule to scan
    // the materialized slice partials; the oracle runs the SAME
    // aggregate over raw events in DuckDB — routed ≡ unrouted.
    "ts_routed_sql" -> ((s, dir) => {
      val raw = routedRaw(s, dir)
      ensureRouted(s, dir)
      raw.where(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-05 00:00:00"))
          && col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-20 00:00:00")))
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_cents"),
          min(col("value")).as("min_cents"), max(col("value")).as("max_cents"))
    }),

    // routed AVG + count(value): the Average/Count(v) re-aggregation
    // paths of the routing rule (avg(value) → sum(total)/sum(cntv)) —
    // RollupRoutingSpec pins that this plan scans the rollup, the
    // oracle pins that routed ≡ raw
    "ts_routed_avg" -> ((s, dir) => {
      val raw = routedRaw(s, dir)
      ensureRouted(s, dir)
      raw.where(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-03 00:00:00"))
          && col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-12 00:00:00")))
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
        .agg(count(col("value")).as("n_vals"), avg(col("value")).as("avg_cents"))
    }),

    // HIERARCHICAL tiers under the ROUTING RULE: a day-grouped query
    // with midnight bounds rides the DAY tier (coarsened FROM the
    // slice partials, never from raw — ~96× fewer rows than the slice
    // tier), preferred over the also-servable slice tier
    // (RollupRoutingSpec pins the tier choice); routed ≡ raw gated by
    // the oracle as usual
    "ts_routed_day_tier" -> ((s, dir) => {
      val raw = routedRaw(s, dir)
      ensureRoutedDay(s, dir)
      raw.where(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-03 00:00:00"))
          && col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-12 00:00:00")))
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
        .agg(count(one).as("n_events"), sum(col("value")).as("total_cents"),
          max(col("value")).as("max_cents"))
    }),

    // COUNT DISTINCT under the ROUTING RULE: the user writes a plain
    // DataFrame count-distinct over raw events; the rule rewrites it
    // onto the registered distinct tall partials (RollupRoutingSpec
    // pins the scan swap) — the one aggregate scalar partials can
    // never serve, at O(rollup) instead of O(events)
    "ts_routed_distinct" -> ((s, dir) => {
      val raw = events(s, dir)
      ensureRoutedDistinct(s, dir)
      raw.where(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-03 00:00:00"))
          && col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-12 00:00:00")))
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
        .agg(count_distinct(col("user_id")).as("uniq_users"))
    }),

    // COUNT DISTINCT on the hierarchical DAY tier: with both distinct
    // tiers registered, the same day-grouped plan must ride the
    // coarser store (one row per dims × day × value — up to 96× fewer
    // rows; RollupRoutingSpec pins the tier choice) and stay exact
    "ts_routed_distinct_day" -> ((s, dir) => {
      val raw = events(s, dir)
      ensureRoutedDistinctDay(s, dir)
      raw.where(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-03 00:00:00"))
          && col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-12 00:00:00")))
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
        .agg(count_distinct(col("user_id")).as("uniq_users"))
    }),

    // APPROXIMATE distinct via HLL sketch partials — the scale path
    // for unique-per-event values where exact tall partials would be
    // as big as the event stream (SCALE.md §8). Per-slice sketches
    // union losslessly into daily estimates; the query pins the
    // estimate against the EXACT count in-plan (integer 5% band) and
    // emits the exact count + the verdict, so the DuckDB oracle gates
    // the sketch path deterministically.
    "ts_distinct_sketch" -> ((s, dir) => {
      import graft.operators.Rollups
      val raw = events(s, dir)
        .where(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-03 00:00:00"))
          && col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-12 00:00:00")))
      val partials = Rollups.sketchPartials(raw, Seq("event_type"),
        valueCol = "user_id")
      val approx = Rollups.collapseSketchPartials(partials,
          Seq("event_type"), Step.Day)
        .withColumnRenamed("value", "approx")
      raw.groupBy(col("event_type"),
          date_trunc("day", col("ts")).as("bucket"))
        .agg(count_distinct(col("user_id")).as("value"))
        .join(approx, Seq("event_type", "bucket"))
        .select(col("event_type"), col("bucket"), col("value"),
          (abs(col("approx") - col("value")) * lit(20L) <= col("value"))
            .as("within_5pct"))
    }),

    // the KLL quantile-sketch scale path under a deterministic gate:
    // per-slice KllLongsSketch partials merge to daily sketches, and
    // each estimated percentile's RANK interval [count(<est),
    // count(<=est)] must intersect ±5 rank points around the target —
    // k=200 gives ~±1.65% rank error, so the verdict is stable while
    // the estimate itself may vary at the margin between runs (sketch
    // compaction draws random bits). Output = exact index-selection
    // percentiles + verdicts, so the frame hashes deterministically.
    "ts_pct_sketch" -> ((s, dir) => {
      import graft.operators.Rollups
      val raw = pctSketchRaw(s, dir)
      val partials = Rollups.kllPartials(raw, Seq("event_type"),
        valueCol = "cents")
      val est = Rollups.collapseKllQuantiles(partials, Seq("event_type"),
        Seq(50, 90, 99), Step.Day)
      pctSketchGate(s, dir, est)
    }),

    // the STREAMING-maintained KLL store under the same gate: the
    // file-stream replay appends batch-local quantile sketches, the
    // read-side merge unifies the distribution across batches AND
    // slices, and each daily estimate must land in the same ±5
    // rank-point band around the exact percentile — sharing
    // ts_pct_sketch's oracle verbatim
    "ts_stream_pct_sketch" -> ((s, dir) => {
      import graft.operators.Rollups
      val path = maintainedKllRollup(s, dir)
      val est = Rollups.collapseKllQuantiles(
          Rollups.read(s, path).drop("bucket_date", "__batch_id"),
          Seq("event_type"), Seq(50, 90, 99), Step.Day)
        .where(col("bucket") >= lit(java.sql.Timestamp.valueOf("2024-01-03 00:00:00"))
          && col("bucket") < lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")))
      pctSketchGate(s, dir, est)
    }),

    // the STREAMING-maintained sketch store under the same gate: the
    // file-stream replay appends batch-local sketches, the read-side
    // union dedupes values across batches AND slices, and the daily
    // estimate must sit in the 5% band around the exact count over
    // the complete replayed history
    "ts_stream_distinct_sketch" -> ((s, dir) => {
      import graft.operators.Rollups
      val path = maintainedSketchRollup(s, dir)
      val approx = Rollups.collapseSketchPartials(
          Rollups.read(s, path).drop("bucket_date", "__batch_id"),
          Seq("event_type"), Step.Day)
        .withColumnRenamed("value", "approx")
      events(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
        .agg(count_distinct(col("user_id")).as("value"))
        .join(approx, Seq("event_type", "bucket"))
        .select(col("event_type"), col("bucket"), col("value"),
          (abs(col("approx") - col("value")) * lit(20L) <= col("value"))
            .as("within_5pct"))
    }),

    // HISTOGRAM under the ROUTING RULE: the user groups raw events by
    // the bucketing expression and counts — the rule rewrites onto the
    // registered (hist_bucket, count) tall partials, summing counts.
    // Shares ts_hist's oracle SHAPE (same bucketing, same aligned
    // range), so routed ≡ raw is DuckDB-gated like the other routed
    // queries; RollupRoutingSpec pins the scan swap.
    "ts_routed_hist" -> ((s, dir) => {
      import graft.operators.Timeseries
      val raw = events(s, dir)
      ensureRoutedHist(s, dir)
      raw.where(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
          && col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-31 00:15:00")))
        .groupBy(col("event_type"), Timeseries.histBucket(histFact))
        .agg(count(one).as("value"))
    }),

    // histogram on the hierarchical DAY tier: per-day histogram series
    // with midnight-aligned bounds, both histogram tiers registered —
    // the plan must ride the (dims × day × hist_bucket) store
    // (RollupRoutingSpec pins the tier choice) and stay exact
    "ts_routed_hist_day" -> ((s, dir) => {
      import graft.operators.Timeseries
      val raw = events(s, dir)
      ensureRoutedHistDay(s, dir)
      raw.where(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-03 00:00:00"))
          && col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-12 00:00:00")))
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"),
          Timeseries.histBucket(histFact))
        .agg(count(one).as("value"))
    }),

    // the raw-scan FALLBACK: a time bound NOT on a slice boundary
    // (…00:07:00 with 15-minute slices) makes the rollup unable to
    // answer exactly — the rule must leave the plan on raw events
    // (RollupRoutingSpec pins the non-rewrite; this pins the answer)
    "ts_routed_unaligned" -> ((s, dir) => {
      val raw = routedRaw(s, dir)
      ensureRouted(s, dir)
      raw.where(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-05 00:07:00"))
          && col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-09 00:00:00")))
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_cents"))
    }),

    // batch/stream EQUIVALENCE under the oracle gate: the rollup is
    // maintained by Structured Streaming (maintainRollup's idempotent
    // per-batch appends), then the SAME hourly fill query is served
    // from it — must hash-match the raw-events oracle exactly like the
    // batch-materialized ts_rollup_hour_fill does. Rollups.run prunes
    // the maintained history to the queried bucket range, so serving
    // from the full-history rollup equals the range-scoped build.
    "ts_stream_maintained_fill" -> ((s, dir) => {
      import graft.operators.Rollups
      val path = maintainedRollup(s, dir)
      Rollups.run(Rollups.read(s, path), countFact, 15,
        Seq("event_type"), Map("event_type" -> Some("click")),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Hour)
    }),

    // the DISTINCT fact type under the same streaming gate: the
    // maintained rollup's tall per-value partials must count each user
    // once per hour even when the user's events arrived in different
    // micro-batches — the raw-events COUNT(DISTINCT) oracle is the
    // loudest possible cross-batch overcount detector
    "ts_stream_distinct_fill" -> ((s, dir) => {
      import graft.operators.Rollups
      val path = maintainedDistinctRollup(s, dir)
      Rollups.run(Rollups.read(s, path), distinctFact, 15,
        Seq("event_type"), Map("event_type" -> Some("click")),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Hour)
    }),

    // batch/stream EQUIVALENCE for SESSIONIZATION under the oracle
    // gate: the events replay through flatMapGroupsWithState
    // (sessionizeStream, custom per-user open-interval state) as a
    // file stream, closed sessions land in a parquet sink, and the
    // result must hash-match the SAME window-SQL oracle as the batch
    // session_window query (event_sessions). Far-future sentinel
    // files advance the watermark past every real session close —
    // the streaming analogue of "the stream has moved on"
    "stream_sessions" -> ((s, dir) =>
      s.read.parquet(streamedSessions(s, dir))
        .where(col("user_id") >= 0L)
        .select(col("user_id"), col("session_start"), col("n_events"))),

    // the CAPPED sessionizer's streaming twin: watermark-gated ordered
    // drain through the same greedy fold (a compressed span cannot be
    // re-split, so events stay event-level until final) — emitted
    // sessions must equal the batch fold exactly (shared oracle)
    "stream_sessions_capped" -> ((s, dir) =>
      s.read.parquet(streamedCappedSessions(s, dir))
        .where(col("user_id") >= 0L)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"))),

    // ordered funnel over the raw stream: signup → later click →
    // later purchase, earliest-qualifying-event rule; one user_id
    // partitioning serves all three monotonically-shrinking stages
    "event_funnel" -> ((s, dir) =>
      graft.operators.Funnel.funnel(events(s, dir), "user_id", "ts", Seq(
        "signup" -> (col("event_type") === "signup"),
        "click" -> (col("event_type") === "click"),
        "purchase" -> (col("event_type") === "purchase")))),

    // plan-time CARDINALITY estimation: the events-by-user self-join
    // size from two count-min sketches (min over depth rows of the
    // bucket-product sum — always >= the exact Σ c_u², error ~ 1/width)
    // beside the exact per-key-count answer; both deterministic, the
    // oracle restates the same md5 bucket hashes
    "join_size_profile" -> ((s, dir) => {
      val e = events(s, dir)
      graft.operators.Profiling.joinSizeEstimate(e, "user_id", e, "user_id")
        .select(col("est_rows").cast(LongType).as("est_rows"),
          col("exact_rows").cast(LongType).as("exact_rows"))
    }),

    // CONVERSION-WINDOW funnel: each stage must land within 3 days of
    // the previous qualifying time — the attribution-honest variant
    // (the unbounded funnel above credits month-later conversions);
    // earliest-in-window qualifying rule, exact µs comparison
    "event_funnel_windowed" -> ((s, dir) =>
      graft.operators.Funnel.windowedFunnel(events(s, dir), "user_id", "ts",
        Seq(
          "signup" -> (col("event_type") === "signup"),
          "click" -> (col("event_type") === "click"),
          "purchase" -> (col("event_type") === "purchase")),
        windowSec = 3L * 86400L)),

    // funnel step latencies: exact p50/p90 seconds between each
    // consecutive qualifying-time pair — where the funnel stalls, not
    // just where it narrows; rank-picked discrete quantiles (no
    // interpolated doubles), per-user rows only
    "funnel_latency" -> ((s, dir) =>
      graft.operators.Funnel.stageLatencies(events(s, dir), "user_id",
        "ts", Seq(
          "signup" -> (col("event_type") === "signup"),
          "click" -> (col("event_type") === "click"),
          "purchase" -> (col("event_type") === "purchase")))),

    // cohort retention matrix: users by first-seen day × day offset,
    // each user once per cell — the day-N retention read
    "event_cohort_retention" -> ((s, dir) =>
      graft.operators.Funnel.cohortRetention(events(s, dir), "user_id", "ts")),

    // streaming twin of event_funnel: per-user stage advancements from
    // the watermark-gated ordered drain, aggregated by stage — must
    // reproduce the batch funnel counts verbatim (same oracle)
    "stream_funnel" -> ((s, dir) => {
      val names = Seq("signup", "click", "purchase")
      s.read.parquet(streamedFunnel(s, dir))
        .where(col("user_id") >= 0L)
        .groupBy(col("stage_idx"))
        .agg(count(lit(1)).as("n_users"))
        .withColumn("stage", element_at(typedlit(names),
          (col("stage_idx") + 1L).cast("int")))
        .select(col("stage_idx"), col("stage"), col("n_users"))
    }),

    // streaming twin of range_click_purchase_1h: a STREAM-STREAM
    // interval self-join (clicks × purchases branches of one replayed
    // stream, symmetric hash join with watermark-bounded state) —
    // must emit exactly the batch band join's pairs, so it shares
    // that oracle verbatim
    "stream_click_attrib" -> ((s, dir) =>
      s.read.parquet(streamedAttribution(s, dir))
        .where(col("user_id") >= 0L)
        .select(col("click_id"), col("user_id"), col("purchase_id"))),

    // streaming twin of event_user_features: same watermark-gated
    // ordered drain as stream_anomalies — the tie-complete RANGE count
    // is exact because a whole second drains at once
    "stream_user_features" -> ((s, dir) =>
      s.read.parquet(streamedFeatures(s, dir))
        .where(col("user_id") >= 0L)
        .select(col("event_id"), col("user_id"), col("n_prev_1h"),
          col("secs_since_prev"))),

    // streaming twin of event_ewma: the same gated ordered drain —
    // the Horner frame is exact because a whole second drains at
    // once; shares the batch oracle verbatim
    "stream_ewma" -> ((s, dir) =>
      s.read.parquet(streamedEwma(s, dir))
        .where(col("user_id") >= 0L)
        .select(col("event_id"), col("user_id"), col("value_cents"),
          col("ewma_e4"))),

    // streaming twin of event_cusum: the same gated ordered drain
    // advances the textbook O(1) recursion per entity (AnomalySpec
    // pins recursion ≡ the batch closed form), so the flagged drift
    // rows hash-match the batch window query's oracle verbatim
    "stream_cusum" -> ((s, dir) =>
      s.read.parquet(streamedCusum(s, dir))
        .where(col("user_id") >= 0L)
        .select(col("event_id"), col("user_id"), col("value_cents"),
          col("s_pos"), col("s_neg"))),

    // streaming Holt state maintenance: the batch operator serves the
    // final per-series state, the stream emits (level, trend) after
    // EVERY observation — the oracle's recursive CTE naturally holds
    // all intermediate states, so the per-event emission is exactly
    // checkable where the batch surface only exposes the endpoint
    "stream_holt" -> ((s, dir) =>
      s.read.parquet(streamedHolt(s, dir))
        .where(col("user_id") >= 0L)
        .select(col("event_id"), col("user_id"), col("value_cents"),
          col("level_e4"), col("trend_e4"))),

    // streaming twin of event_anomalies: events replay as a bounded
    // file stream through StreamingIngest.anomalyStream (watermark-
    // gated in-order processing over flatMapGroupsWithState ring
    // state); flagged rows land in parquet and must hash-match the
    // SAME DuckDB oracle as the batch window query
    "stream_anomalies" -> ((s, dir) =>
      s.read.parquet(streamedAnomalies(s, dir))
        .where(col("user_id") >= 0L)
        .select(col("event_id"), col("user_id"), col("value_cents"),
          col("n_base"), col("base_sum"))),

    // rollup ADVISOR: measure every candidate grouping's would-be
    // rollup size and compaction ratio in ONE grouping-sets pass over
    // raw events — the "which layouts pay for their storage" decision
    // made from data before any store is built
    "rollup_advisor" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("user_bucket",
        (col("user_id") % 10).cast("string"))
      graft.operators.Rollups.adviseRollups(ev,
        Seq(Seq("event_type"), Seq("user_bucket"),
          Seq("event_type", "user_bucket")),
        sliceMinutes = 15)
    }),

    // materialized-rollup read path: build slice partials, serve the
    // hourly query FROM the rollup — result must hash-match the same
    // oracle as the raw-events pipeline (re-aggregability, SURVEY §4)
    // rollup consistency AUDIT (the read-repair check after
    // incidents): recompute slice partials from raw, collapse both
    // sides per key, full-outer-diff — per date, bucket count and
    // mismatches (zero on a healthy store; RollupsSpec pins that a
    // corrupted row IS flagged)
    "rollup_audit" -> ((s, dir) => {
      import graft.operators.Rollups
      val out = rollupDirs.getOrElseUpdate((s, dir), {
        val d = java.nio.file.Files.createTempDirectory("graft_rollup").toString
        Rollups.materialize(
          prep(s, dir, withUser = false, one,
            Some(("2024-01-05T00:00", "2024-01-07T00:00"))),
          countFact, 15, Seq("event_type"), d)
        d
      })
      Rollups.audit(Rollups.read(s, out),
        prep(s, dir, withUser = false, one,
          Some(("2024-01-05T00:00", "2024-01-07T00:00"))),
        countFact, 15, Seq("event_type"))
    }),

    "ts_rollup_hour_fill" -> ((s, dir) => {
      import graft.operators.Rollups
      val out = rollupDirs.getOrElseUpdate((s, dir), {
        val d = java.nio.file.Files.createTempDirectory("graft_rollup").toString
        Rollups.materialize(
          prep(s, dir, withUser = false, one,
            Some(("2024-01-05T00:00", "2024-01-07T00:00"))),
          countFact, 15, Seq("event_type"), d)
        d
      })
      Rollups.run(Rollups.read(s, out), countFact, 15,
        Seq("event_type"), Map("event_type" -> Some("click")),
        ts("2024-01-05T00:00"), ts("2024-01-07T00:00"), Step.Hour)
    }))

  /** ts_rollup_hour_fill's materialized partials, built once per
    * (session, sf dir): repeated runs measure the rollup READ path (the
    * deployment shape), not a rebuild per query. */
  private val rollupDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** events_csv_roundtrip's CSV copy of the ranged events, written once
    * per (session, sf dir). */
  private val csvDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** events_json_roundtrip's JSON copy, same lifecycle as [[csvDirs]]. */
  private val jsonDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** ts_stream_maintained_fill's streaming-maintained rollup, built
    * once per (session, sf dir) by replaying the events parquet as a
    * bounded file stream. */
  private val streamRollupDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** Replay the sf events through
    * [[graft.streaming.StreamingIngest.maintainRollup]] (file-source
    * stream, AvailableNow trigger — each parquet file is a micro-batch)
    * and return the maintained rollup path. No driver-side collect: the
    * stream reads files directly, exactly like a deployed pipeline
    * draining a landing directory. */
  private def maintainedRollup(s: SparkSession, dir: String): String =
    streamedRollupFor(s, dir, countFact, lit(1L))

  /** The distinct twin: the same file-stream replay maintains a
    * DISTINCT-fact rollup (value = user id → tall per-value partials). */
  private def maintainedDistinctRollup(s: SparkSession, dir: String): String =
    streamedRollupFor(s, dir, distinctFact, col("user_id").cast(LongType))

  private def streamedRollupFor(s: SparkSession, dir: String,
      fact: FactDef, value: Column): String =
    streamRollupDirs.getOrElseUpdate((s, s"$dir#${fact.id}"), {
      import graft.streaming.StreamingIngest
      val base = java.nio.file.Files.createTempDirectory("graft_streamroll")
        .toString
      val rollPath = s"$base/rollup"
      // nanos-adaptive schema resolution without mutating the session
      // conf; the stream itself stays on the caller's session
      val schema = graft.sources.EventSource
        .adaptiveSchema(s, s"$dir/events.parquet")
      // the file-stream source needs a directory: stream the sf dir
      // with a glob pinned to the events table (single-file tables at
      // test scale; a landing DIRECTORY of files in deployment, each
      // arriving file its own micro-batch via maxFilesPerTrigger)
      val stream = graft.sources.EventSource.normalizeEventTs(
        s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "events.parquet")
          .parquet(dir))
        .select(lit(fact.id).as("fact"), col("ts"),
          value.as("value"),
          map(lit("event_type"), col("event_type")).as("categories"))
      val q = StreamingIngest
        .maintainRollup(stream, fact, Seq("event_type"), rollPath)
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      rollPath
    })

  /** The streaming-maintained APPROXIMATE-distinct store: same
    * file-stream replay, per-batch HLL sketch partials instead of
    * exact tall partials ([[graft.streaming.StreamingIngest
    * .maintainSketchRollup]]). */
  private def maintainedSketchRollup(s: SparkSession, dir: String): String =
    streamRollupDirs.getOrElseUpdate((s, s"$dir#sketch"), {
      import graft.streaming.StreamingIngest
      val base = java.nio.file.Files.createTempDirectory("graft_streamsk")
        .toString
      val rollPath = s"$base/rollup"
      val schema = graft.sources.EventSource
        .adaptiveSchema(s, s"$dir/events.parquet")
      val stream = graft.sources.EventSource.normalizeEventTs(
        s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "events.parquet")
          .parquet(dir))
        .select(lit("uniq_users").as("fact"), col("ts"),
          col("user_id").cast(LongType).as("value"),
          map(lit("event_type"), col("event_type")).as("categories"))
      val q = StreamingIngest
        .maintainSketchRollup(stream, "uniq_users", Seq("event_type"),
          rollPath)
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      rollPath
    })

  /** Date-partitioned (event_date= hive layout) copy of the RAW
    * events table, laid out once per (session, sf dir). */
  private val datePartedDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def datePartitionedStore(s: SparkSession, dir: String): String =
    datePartedDirs.getOrElseUpdate((s, dir), {
      val out = java.nio.file.Files.createTempDirectory("graft_dateparted")
        .toString + "/events"
      graft.sources.Layout.writeDatePartitioned(events(s, dir), "ts", out)
      out
    })

  /** Z-ordered copy of the events table, laid out once per
    * (session, sf dir). */
  private val zorderedDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def zorderedStore(s: SparkSession, dir: String): String =
    zorderedDirs.getOrElseUpdate((s, dir), {
      val out = java.nio.file.Files.createTempDirectory("graft_zorder")
        .toString + "/events"
      graft.sources.Layout.writeZOrdered(events(s, dir),
        Seq("user_id", "ts"), out, files = 8)
      out
    })

  /** bucketed_cohort_spend's (events, users) bucketed tables, laid out
    * once per (session, sf dir). */
  private val bucketedTabs = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, String)]

  /** Lay out the events table and its derived per-user cohort profile
    * as co-bucketed tables (8 buckets on user_id, one file per bucket,
    * per-bucket sorted) in a temp warehouse dir, returning the table
    * names. The layout job runs once; every subsequent join on
    * user_id is exchange-free. */
  private def bucketedTables(s: SparkSession, dir: String): (String, String) =
    bucketedTabs.getOrElseUpdate((s, dir), {
      import graft.sources.EventSource
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      val base = java.nio.file.Files.createTempDirectory("graft_bkt").toString
      val ev = events(s, dir)
        .select(col("user_id"), col("event_type"),
          round(col("value") * 100).cast(LongType).as("value_cents"))
      val users = events(s, dir).select(col("user_id")).distinct()
        .withColumn("cohort", col("user_id") % 7)
      val (evT, usT) = (s"graft_ev_$tag", s"graft_users_$tag")
      EventSource.writeBucketed(ev, evT, s"$base/ev", "user_id", 8)
      EventSource.writeBucketed(users, usT, s"$base/users", "user_id", 8)
      (evT, usT)
    })

  /** stream_sessions' closed-session parquet, built once per (session,
    * sf dir). */
  private val streamSessionDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** Replay the sf events through
    * [[graft.streaming.StreamingIngest.sessionizeStream]] via
    * [[replayThroughState]] and return the closed-session parquet
    * path. Watermark delay 0: all real events arrive in one batch, so
    * nothing is late relative to the still-epoch watermark. */
  private def streamedSessions(s: SparkSession, dir: String): String =
    streamSessionDirs.getOrElseUpdate((s, dir), {
      import s.implicits._
      replayThroughState(s, "streamsess",
        events(s, dir).select(col("user_id").cast(LongType), col("ts")),
        Seq(Seq((-1L, ts("2100-01-01T00:00"))).toDF("user_id", "ts"),
          Seq((-2L, ts("2100-06-01T00:00"))).toDF("user_id", "ts")),
        graft.streaming.StreamingIngest.sessionizeStream(_, gapMinutes = 30,
          watermarkDelay = "0 seconds"))
    })

  /** stream_sessions_capped's drained output, built once per
    * (session, sf dir): same replay choreography, the capped twin's
    * gap/cap parameters matching `event_sessions_capped`. */
  private val streamCappedSessionDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  /** stream_next_examples' replayed output dir, built once per
    * (session, sf dir). Same landing choreography as the capped
    * sessions; far-future sentinels push the watermark past every
    * real event so the drain completes. */
  private val streamNextExampleDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def streamedNextExamples(s: SparkSession, dir: String): String =
    streamNextExampleDirs.getOrElseUpdate((s, dir), {
      import s.implicits._
      replayThroughState(s, "streamne",
        events(s, dir).select(col("user_id").cast(LongType), col("ts"),
          col("event_type"), col("event_id").cast(LongType)),
        Seq(Seq((-1L, ts("2100-01-01T00:00"), "x", -1L))
            .toDF("user_id", "ts", "event_type", "event_id"),
          Seq((-2L, ts("2100-06-01T00:00"), "x", -2L))
            .toDF("user_id", "ts", "event_type", "event_id")),
        graft.streaming.StreamingIngest.nextExampleStream(_, k = 3,
          watermarkDelay = "0 seconds"))
    })

  private def streamedCappedSessions(s: SparkSession, dir: String): String =
    streamCappedSessionDirs.getOrElseUpdate((s, dir), {
      import s.implicits._
      replayThroughState(s, "streamcap",
        events(s, dir).select(col("user_id").cast(LongType), col("ts")),
        Seq(Seq((-1L, ts("2100-01-01T00:00"))).toDF("user_id", "ts"),
          Seq((-2L, ts("2100-06-01T00:00"))).toDF("user_id", "ts")),
        graft.streaming.StreamingIngest.cappedSessionStream(_,
          gapMinutes = 720, maxDurationMinutes = 1440,
          watermarkDelay = "0 seconds"))
    })

  /** Day-grain histogram tier over [[ensureRoutedHist]]'s tall
    * partials, built and registered once per (session, sf dir). */
  private val routedHistDayDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def ensureRoutedHistDay(s: SparkSession, dir: String): Unit = {
    ensureRoutedHist(s, dir)
    routedHistDayDirs.getOrElseUpdate((s, dir), {
      import graft.operators.{Rollups, Timeseries}
      import graft.plans.RollupRouting
      val out = java.nio.file.Files
        .createTempDirectory("graft_hdaypartials").toString
      Rollups.materializeHistogramDayPartials(
        Rollups.read(s, routedHistDirs((s, dir))), out)
      RollupRouting.registerHistogramDayGrain(s, events(s, dir),
        Rollups.read(s, out), Seq("event_type"),
        Timeseries.histBucket(histFact))
      out
    })
    ()
  }

  /** The KLL percentile gate's raw scan (one week, integral cents). */
  private def pctSketchRaw(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .where(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-03 00:00:00"))
        && col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")))
      .withColumn("cents", cents)

  /** Shared deterministic gate for the KLL percentile reads (batch
    * partials and the streaming-maintained store): exact
    * index-selection percentiles per (event_type, day), joined with
    * rank-band verdicts for the estimate frame — each `est_p<q>`'s
    * rank interval [count(<est), count(≤est)] must intersect ±5 rank
    * points around q. Output is estimate-free, so it hashes
    * deterministically despite sketch randomness. */
  private def pctSketchGate(s: SparkSession, dir: String,
      est: DataFrame): DataFrame = {
    val daily = pctSketchRaw(s, dir).select(col("event_type"),
      date_trunc("day", col("ts")).as("bucket"), col("cents"))
    def ok(q: Int) = {
      val e = col(s"est_p$q")
      val nLt = sum(when(col("cents") < e, 1L).otherwise(0L))
      val nLe = sum(when(col("cents") <= e, 1L).otherwise(0L))
      val n = count(lit(1))
      ((nLt * lit(100L) <= lit(q + 5L) * n) &&
        (nLe * lit(100L) >= lit(q - 5L) * n)).as(s"ok$q")
    }
    val verdicts = daily.join(est, Seq("event_type", "bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(ok(50), ok(90), ok(99))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), col("bucket"))
    val rk = daily
      .withColumn("rn", row_number().over(w.orderBy(col("cents"))))
      .withColumn("n", count(lit(1)).over(w))
    def pick(q: Int) = max(when(
      col("rn") === floor((col("n") - 1L) * q / lit(100L)) + 1L,
      col("cents"))).as(s"p$q")
    rk.groupBy(col("event_type"), col("bucket"))
      .agg(max(col("n")).as("n_rows"), pick(50), pick(90), pick(99))
      .join(verdicts, Seq("event_type", "bucket"))
  }

  /** ts_stream_pct_sketch's streaming-maintained KLL store, built once
    * per (session, sf dir) by replaying the events parquet as a
    * bounded file stream of cents-valued samples. */
  private def maintainedKllRollup(s: SparkSession, dir: String): String =
    streamRollupDirs.getOrElseUpdate((s, s"$dir#kll"), {
      import graft.streaming.StreamingIngest
      val base = java.nio.file.Files.createTempDirectory("graft_streamkll")
        .toString
      val rollPath = s"$base/rollup"
      val schema = graft.sources.EventSource
        .adaptiveSchema(s, s"$dir/events.parquet")
      val stream = graft.sources.EventSource.normalizeEventTs(
        s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "events.parquet")
          .parquet(dir))
        .select(lit("value_pct").as("fact"), col("ts"),
          round(col("value") * 100).cast(LongType).as("value"),
          map(lit("event_type"), col("event_type")).as("categories"))
      val q = StreamingIngest
        .maintainKllRollup(stream, "value_pct", Seq("event_type"), rollPath)
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      rollPath
    })

  /** stream_funnel's stage-advancement parquet, built once per
    * (session, sf dir). */
  private val streamFunnelDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def streamedFunnel(s: SparkSession, dir: String): String =
    streamFunnelDirs.getOrElseUpdate((s, dir), {
      import s.implicits._
      replayThroughState(s, "streamfunnel",
        events(s, dir).select(col("user_id").cast(LongType), col("ts"),
          col("event_id").cast(LongType), col("event_type")),
        Seq(Seq((-1L, ts("2100-01-01T00:00"), -1L, "__sentinel"))
            .toDF("user_id", "ts", "event_id", "event_type"),
          Seq((-2L, ts("2100-06-01T00:00"), -2L, "__sentinel"))
            .toDF("user_id", "ts", "event_id", "event_type")),
        graft.streaming.StreamingIngest.funnelStream(_,
          Seq("signup", "click", "purchase"), watermarkDelay = "0 seconds"))
    })

  /** stream_click_attrib's matched-pair parquet, built once per
    * (session, sf dir). */
  private val streamAttribDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** Replay the sf events through
    * [[graft.streaming.StreamingIngest.attributionStream]] via
    * [[replayThroughState]] and return the matched-pair parquet path.
    * Sentinels carry a non-click/purchase event_type, so they advance
    * the watermark (evicting join state) without ever matching. */
  private def streamedAttribution(s: SparkSession, dir: String): String =
    streamAttribDirs.getOrElseUpdate((s, dir), {
      import s.implicits._
      replayThroughState(s, "streamattrib",
        events(s, dir).select(col("event_id").cast(LongType),
          col("user_id").cast(LongType), col("event_type"), col("ts")),
        Seq(Seq((-1L, -1L, "__sentinel", ts("2100-01-01T00:00")))
            .toDF("event_id", "user_id", "event_type", "ts"),
          Seq((-2L, -2L, "__sentinel", ts("2100-06-01T00:00")))
            .toDF("event_id", "user_id", "event_type", "ts")),
        graft.streaming.StreamingIngest.attributionStream(_,
          windowSeconds = 3600L, watermarkDelay = "0 seconds"))
    })

  /** stream_cdc_user_state's maintained-state path, built once per
    * (session, sf dir): the event change log lands as TWO parquet
    * files (split mid-history) so the file stream replays it as two
    * micro-batches through
    * [[graft.streaming.StreamingIngest.maintainState]] — a real
    * v=0 → v=1 version chain, not a single-apply degenerate. */
  private val streamCdcDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def streamedCdcState(s: SparkSession, dir: String): String =
    streamCdcDirs.getOrElseUpdate((s, dir), {
      import java.nio.file.{Files, Paths}
      import java.nio.file.attribute.FileTime
      val base = Files.createTempDirectory("graft_streamcdc").toString
      val landing = s"$base/landing"
      Files.createDirectories(Paths.get(landing))
      val ops = events(s, dir)
        .select(col("user_id"), col("event_type"), cents.as("last_cents"),
          col("ts"), col("event_id"))
        .withColumn("op",
          when(col("event_type") === "error", "D").otherwise("U"))
      val cut = lit(java.sql.Timestamp.valueOf("2024-01-08 00:00:00"))
      def land(df: DataFrame, name: String, mtimeMs: Long): Unit = {
        val tmp = s"$base/tmp_$name"
        df.coalesce(1).write.parquet(tmp)
        val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
          .filter(_.endsWith(".parquet")).head
        val dest = Paths.get(landing, s"$name.parquet")
        Files.move(Paths.get(part), dest)
        Files.setLastModifiedTime(dest, FileTime.fromMillis(mtimeMs))
      }
      val t0 = System.currentTimeMillis()
      land(ops.where(col("ts") < cut), "f1", t0)
      land(ops.where(col("ts") >= cut), "f2", t0 + 60000L)
      val stream = s.readStream.schema(ops.schema)
        .option("maxFilesPerTrigger", "1").parquet(landing)
      val q = graft.streaming.StreamingIngest
        .maintainState(stream, Seq("user_id"),
          Seq("event_type", "last_cents"), Seq("ts", "event_id"), "op",
          s"$base/state")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s"$base/state"
    })

  /** stream_scd_click_level's enriched-clicks path, built once per
    * (session, sf dir): the Type-2 dimension builds offline from
    * purchases exactly as the batch query does; the clicks replay as
    * two mid-history file batches through
    * [[graft.streaming.StreamingIngest.enrichPointInTime]]. */
  private val streamScdDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def streamedScdClicks(s: SparkSession, dir: String): String =
    streamScdDirs.getOrElseUpdate((s, dir), {
      import java.nio.file.{Files, Paths}
      import java.nio.file.attribute.FileTime
      val base = Files.createTempDirectory("graft_streamscd").toString
      val landing = s"$base/landing"
      Files.createDirectories(Paths.get(landing))
      val e = events(s, dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val changes = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("level", row_number().over(w).cast(LongType))
      val scd2 = graft.operators.Scd
        .buildType2(changes, Seq("user_id"), "ts", col("event_id"))
        .localCheckpoint(true)
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"))
      val cut = lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
      def land(df: DataFrame, name: String, mtimeMs: Long): Unit = {
        val tmp = s"$base/tmp_$name"
        df.coalesce(1).write.parquet(tmp)
        val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
          .filter(_.endsWith(".parquet")).head
        val dest = Paths.get(landing, s"$name.parquet")
        Files.move(Paths.get(part), dest)
        Files.setLastModifiedTime(dest, FileTime.fromMillis(mtimeMs))
      }
      val t0 = System.currentTimeMillis()
      land(clicks.where(col("ts") < cut), "f1", t0)
      land(clicks.where(col("ts") >= cut), "f2", t0 + 60000L)
      val stream = s.readStream.schema(clicks.schema)
        .option("maxFilesPerTrigger", "1").parquet(landing)
      val q = graft.streaming.StreamingIngest
        .enrichPointInTime(stream, scd2, Seq("user_id"), "ts",
          Seq("level"), s"$base/enriched")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s"$base/enriched"
    })

  /** stream_late_profile's per-batch lateness reports, built once per
    * (session, sf dir): batch 1 is the pre-cut history MINUS the
    * replayed ids, batch 2 the post-cut rows PLUS those replays — so
    * the second batch arrives with genuinely old event times and the
    * monitor's high-water-mark rule must count exactly them late. */
  private val streamLateDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def streamedLateReports(s: SparkSession, dir: String): String =
    streamLateDirs.getOrElseUpdate((s, dir), {
      import java.nio.file.{Files, Paths}
      import java.nio.file.attribute.FileTime
      val base = Files.createTempDirectory("graft_streamlate").toString
      val landing = s"$base/landing"
      Files.createDirectories(Paths.get(landing))
      val ev = events(s, dir).select(col("event_id"), col("ts"))
      val cut = lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
      val replayed = col("event_id") % 50 === 0
      def land(df: DataFrame, name: String, mtimeMs: Long): Unit = {
        val tmp = s"$base/tmp_$name"
        df.coalesce(1).write.parquet(tmp)
        val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
          .filter(_.endsWith(".parquet")).head
        val dest = Paths.get(landing, s"$name.parquet")
        Files.move(Paths.get(part), dest)
        Files.setLastModifiedTime(dest, FileTime.fromMillis(mtimeMs))
      }
      val t0 = System.currentTimeMillis()
      land(ev.where(col("ts") < cut && !replayed), "f1", t0)
      land(ev.where(col("ts") >= cut || replayed), "f2", t0 + 60000L)
      val stream = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(landing)
      val q = graft.streaming.StreamingIngest
        .monitorLateness(stream, "ts", horizonSec = 3600L,
          s"$base/reports")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s"$base/reports"
    })

  /** stream_quality_monitor's per-batch report path, built once per
    * (session, sf dir): same two-file mid-history landing split as
    * [[streamedCdcState]], through
    * [[graft.streaming.StreamingIngest.monitorQuality]]. */
  private val streamQualityDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def streamedQualityReports(s: SparkSession, dir: String): String =
    streamQualityDirs.getOrElseUpdate((s, dir), {
      import java.nio.file.{Files, Paths}
      import java.nio.file.attribute.FileTime
      import graft.operators.Quality
      val base = Files.createTempDirectory("graft_streamqual").toString
      val landing = s"$base/landing"
      Files.createDirectories(Paths.get(landing))
      val ev = events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"), col("ts"))
      val cut = lit(java.sql.Timestamp.valueOf("2024-01-08 00:00:00"))
      def land(df: DataFrame, name: String, mtimeMs: Long): Unit = {
        val tmp = s"$base/tmp_$name"
        df.coalesce(1).write.parquet(tmp)
        val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
          .filter(_.endsWith(".parquet")).head
        val dest = Paths.get(landing, s"$name.parquet")
        Files.move(Paths.get(part), dest)
        Files.setLastModifiedTime(dest, FileTime.fromMillis(mtimeMs))
      }
      val t0 = System.currentTimeMillis()
      land(ev.where(col("ts") < cut), "f1", t0)
      land(ev.where(col("ts") >= cut), "f2", t0 + 60000L)
      val stream = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(landing)
      val q = graft.streaming.StreamingIngest
        .monitorQuality(stream, Seq(
          Quality.NotNull("user_id"),
          Quality.Satisfies("value_nonneg", col("value") >= 0),
          Quality.Unique(Seq("event_id"))), s"$base/reports")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s"$base/reports"
    })

  /** Shared bounded-replay choreography for the stateful streaming
    * twins (`stream_sessions` / `stream_user_features` /
    * `stream_anomalies`). Lands `f1` (the real-events projection) and
    * two far-future sentinel files in a landing dir with ascending
    * mtimes — one micro-batch each: after f1 the watermark advances to
    * the max real event time; the first sentinel pushes it past every
    * real observation; the second runs one more batch so event-time
    * TIMEOUTS fire and gated state drains. Sentinel rows carry
    * negative user ids, filtered at serve time. Replays the landing
    * dir as a bounded file stream (schema = f1's, no inference pass)
    * through `op` and returns the parquet path of the appended
    * output. */
  private def replayThroughState(s: SparkSession, tag: String,
      f1: DataFrame, sentinels: Seq[DataFrame],
      op: DataFrame => org.apache.spark.sql.Dataset[_]): String = {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val base = Files.createTempDirectory(s"graft_$tag").toString
    val landing = s"$base/landing"
    Files.createDirectories(Paths.get(landing))
    val outPath = s"$base/out"
    def writeFile(df: DataFrame, name: String, mtimeMs: Long): Unit = {
      val tmp = s"$base/tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      val dest = Paths.get(landing, s"$name.parquet")
      Files.move(Paths.get(part), dest)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(mtimeMs))
    }
    val t0 = System.currentTimeMillis()
    writeFile(f1, "f1", t0)
    sentinels.zipWithIndex.foreach { case (df, i) =>
      writeFile(df, s"f${i + 2}", t0 + (i + 1) * 60000L)
    }
    val stream = s.readStream.schema(f1.schema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    val q = op(stream)
      .writeStream.outputMode("append").format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    outPath
  }

  /** stream_user_features' rolling-feature parquet, built once per
    * (session, sf dir). Same landing choreography as
    * [[streamedAnomalies]]. */
  private val streamFeatureDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  private def streamedFeatures(s: SparkSession, dir: String): String =
    streamFeatureDirs.getOrElseUpdate((s, dir), {
      import s.implicits._
      replayThroughState(s, "streamfeat",
        events(s, dir).select(col("user_id").cast(LongType), col("ts"),
          col("event_id").cast(LongType)),
        Seq(Seq((-1L, ts("2100-01-01T00:00"), -1L))
            .toDF("user_id", "ts", "event_id"),
          Seq((-2L, ts("2100-06-01T00:00"), -2L))
            .toDF("user_id", "ts", "event_id")),
        graft.streaming.StreamingIngest.userFeatureStream(_,
          windowSecs = 3600L, watermarkDelay = "0 seconds"))
    })

  /** stream_anomalies' flagged-observation parquet, built once per
    * (session, sf dir). */
  private val streamAnomalyDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** Replay the sf events through
    * [[graft.streaming.StreamingIngest.anomalyStream]] via
    * [[replayThroughState]] and return the flagged-rows parquet path.
    * Sentinel users are negative and filtered at serve time (their
    * rings never reach minN, so they can't emit). */
  private def streamedAnomalies(s: SparkSession, dir: String): String =
    streamAnomalyDirs.getOrElseUpdate((s, dir), {
      import s.implicits._
      replayThroughState(s, "streamanom",
        events(s, dir).select(col("user_id").cast(LongType), col("ts"),
          col("event_id").cast(LongType), cents.as("value_cents")),
        Seq(Seq((-1L, ts("2100-01-01T00:00"), -1L, 0L))
            .toDF("user_id", "ts", "event_id", "value_cents"),
          Seq((-2L, ts("2100-06-01T00:00"), -2L, 0L))
            .toDF("user_id", "ts", "event_id", "value_cents")),
        graft.streaming.StreamingIngest.anomalyStream(_, baseN = 20,
          minN = 8, k = 3, watermarkDelay = "0 seconds"))
    })

  /** stream_ewma's smoothed-observation parquet, built once per
    * (session, sf dir) — batch twin's user subset (< 40) applied on
    * the input side; sentinel users (-1/-2) advance the watermark and
    * are filtered from the served output. */
  private val streamEwmaDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  /** stream_holt's per-event state parquet, built once per (session,
    * sf dir). Same landing choreography as [[streamedEwma]]. */
  private val streamHoltDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def streamedHolt(s: SparkSession, dir: String): String =
    streamHoltDirs.getOrElseUpdate((s, dir), {
      import s.implicits._
      replayThroughState(s, "streamholt",
        events(s, dir).where(col("user_id") < 40)
          .select(col("user_id").cast(LongType), col("ts"),
            col("event_id").cast(LongType), cents.as("value_cents")),
        Seq(Seq((-1L, ts("2100-01-01T00:00"), -1L, 0L))
            .toDF("user_id", "ts", "event_id", "value_cents"),
          Seq((-2L, ts("2100-06-01T00:00"), -2L, 0L))
            .toDF("user_id", "ts", "event_id", "value_cents")),
        graft.streaming.StreamingIngest.holtStream(_,
          watermarkDelay = "0 seconds"))
    })

  /** stream_cusum's flagged-drift parquet, built once per (session,
    * sf dir). Same landing choreography as [[streamedEwma]]. */
  private val streamCusumDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def streamedCusum(s: SparkSession, dir: String): String =
    streamCusumDirs.getOrElseUpdate((s, dir), {
      import s.implicits._
      replayThroughState(s, "streamcusum",
        events(s, dir).where(col("user_id") < 40)
          .select(col("user_id").cast(LongType), col("ts"),
            col("event_id").cast(LongType), cents.as("value_cents")),
        Seq(Seq((-1L, ts("2100-01-01T00:00"), -1L, 0L))
            .toDF("user_id", "ts", "event_id", "value_cents"),
          Seq((-2L, ts("2100-06-01T00:00"), -2L, 0L))
            .toDF("user_id", "ts", "event_id", "value_cents")),
        graft.streaming.StreamingIngest.cusumStream(_,
          target = 5000L, slack = 1000L, threshold = 20000L,
          watermarkDelay = "0 seconds"))
    })

  private def streamedEwma(s: SparkSession, dir: String): String =
    streamEwmaDirs.getOrElseUpdate((s, dir), {
      import s.implicits._
      replayThroughState(s, "streamewma",
        events(s, dir).where(col("user_id") < 40)
          .select(col("user_id").cast(LongType), col("ts"),
            col("event_id").cast(LongType), cents.as("value_cents")),
        Seq(Seq((-1L, ts("2100-01-01T00:00"), -1L, 0L))
            .toDF("user_id", "ts", "event_id", "value_cents"),
          Seq((-2L, ts("2100-06-01T00:00"), -2L, 0L))
            .toDF("user_id", "ts", "event_id", "value_cents")),
        graft.streaming.StreamingIngest.ewmaStream(_, w = 8,
          watermarkDelay = "0 seconds"))
    })

  // ---------------------------------------------------------------- oracles

  /** Zero-fill oracle template: scan → collapse → series × grid left join.
    * `dimExprs` are the projection expressions (may alias), `dimNames` the
    * resulting column names used downstream. */
  private def fillOracle(where: String, bucketExpr: String, gridStart: String,
      gridStop: String, gridStep: String, loTs: String, hiTs: String,
      dimExprs: String = "event_type", dimNames: String = "event_type",
      measure: String = "count(*)"): String = {
    s"""WITH scanned AS (
       |  SELECT $dimExprs, CAST($bucketExpr AS TIMESTAMP) AS bucket, $measure AS cnt
       |  FROM events
       |  WHERE $where AND ts >= TIMESTAMP '$loTs' AND ts < TIMESTAMP '$hiTs'
       |  GROUP BY ALL),
       |grid AS (
       |  SELECT unnest(generate_series(TIMESTAMP '$gridStart',
       |    TIMESTAMP '$gridStop', INTERVAL $gridStep)) AS bucket),
       |series AS (SELECT DISTINCT $dimNames FROM scanned)
       |SELECT s.*, g.bucket AS bucket, coalesce(c.cnt, 0) AS value
       |FROM series s CROSS JOIN grid g
       |LEFT JOIN scanned c USING ($dimNames, bucket)""".stripMargin
  }

  /** The mixed (counter + average) dashboard oracle — the null-padded
    * union of the per-type fills. Shared by `ts_multi_mixed`
    * (compute-on-read) and `ts_multi_routed` (rollup-served): the tier
    * must change only the store scanned, never a row. Parameterized by
    * the user-bucket modulus and the slice (ts_advised_route uses a
    * sparser series set on hourly slices so the advisor's default 2×
    * bar is clearable at the driver fixture's density). */
  private def multiMixedSqlMod(m: Int, slice: Int): String =
    s"""WITH base AS (
       |  SELECT CAST(user_id % $m AS VARCHAR) AS user_bucket, event_type,
       |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
       |    CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events
       |  WHERE event_type IN ('click', 'purchase')
       |    AND ts >= TIMESTAMP '${lo("2024-01-05T00:00", slice)}'
       |    AND ts < TIMESTAMP '${hi("2024-01-07T00:00", slice)}'),
       |cnt AS (SELECT user_bucket, bucket, count(*) AS value
       |  FROM base WHERE event_type = 'click' GROUP BY ALL),
       |avgp AS (SELECT user_bucket, bucket,
       |    count(*) AS counter, sum(cents) AS total
       |  FROM base WHERE event_type = 'purchase' GROUP BY ALL),
       |grid AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-05',
       |  TIMESTAMP '2024-01-06', INTERVAL 1 DAY)) AS bucket),
       |cs AS (SELECT DISTINCT user_bucket FROM cnt),
       |avs AS (SELECT DISTINCT user_bucket FROM avgp)
       |SELECT s.user_bucket, 'clicks_count' AS fact, g.bucket,
       |  coalesce(c.value, 0) AS value,
       |  CAST(NULL AS BIGINT) AS counter, CAST(NULL AS BIGINT) AS total
       |FROM cs s CROSS JOIN grid g
       |LEFT JOIN cnt c USING (user_bucket, bucket)
       |UNION ALL
       |SELECT s.user_bucket, 'spend_avg' AS fact, g.bucket,
       |  CAST(NULL AS BIGINT) AS value,
       |  coalesce(a.counter, 0) AS counter, coalesce(a.total, 0) AS total
       |FROM avs s CROSS JOIN grid g
       |LEFT JOIN avgp a USING (user_bucket, bucket)""".stripMargin

  private val multiMixedSql: String = multiMixedSqlMod(4, 15)

  /** The counter+HISTOGRAM dashboard oracle — counter fill
    * (hist_bucket null) ∪ un-filled histogram cells. Shared by
    * `ts_multi_hist` (Scala call) and `ts_multi_hist_sql` (the same
    * read as pure SQL text through the installed view): the consumption
    * plane must change nothing. */
  private val multiHistSql: String =
    s"""WITH base AS (
       |  SELECT CAST(user_id % 4 AS VARCHAR) AS user_bucket, event_type,
       |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
       |    CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events
       |  WHERE event_type IN ('click', 'purchase')
       |    AND ts >= TIMESTAMP '${lo("2024-01-05T00:00")}'
       |    AND ts < TIMESTAMP '${hi("2024-01-07T00:00")}'),
       |cnt AS (SELECT user_bucket, bucket, count(*) AS value
       |  FROM base WHERE event_type = 'click' GROUP BY ALL),
       |hist AS (SELECT user_bucket, bucket,
       |    CAST(LEAST(GREATEST(FLOOR(cents / 2000), 0), 9) AS BIGINT)
       |      * 2000 AS hist_bucket,
       |    count(*) AS value
       |  FROM base WHERE event_type = 'purchase' GROUP BY ALL),
       |grid AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-05',
       |  TIMESTAMP '2024-01-06', INTERVAL 1 DAY)) AS bucket),
       |cs AS (SELECT DISTINCT user_bucket FROM cnt)
       |SELECT s.user_bucket, 'clicks_count' AS fact, g.bucket,
       |  coalesce(c.value, 0) AS value, CAST(NULL AS BIGINT) AS hist_bucket
       |FROM cs s CROSS JOIN grid g
       |LEFT JOIN cnt c USING (user_bucket, bucket)
       |UNION ALL
       |SELECT user_bucket, 'spend_hist' AS fact, bucket, value, hist_bucket
       |FROM hist""".stripMargin

  /** Shared by the batch and streaming EWMA queries (ordered drain ≡
    * window frame). */
  private val ewmaSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) // 1000000 AS sec,
      |         CAST(round(value * 100) AS BIGINT) AS x
      |  FROM events WHERE user_id < 40),
      |w AS (
      |  SELECT event_id, user_id, x,
      |    list(x) OVER (PARTITION BY user_id ORDER BY sec, event_id
      |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS l
      |  FROM e)
      |SELECT event_id, user_id, x AS value_cents,
      |  CAST(floor((CAST(10000.0 AS DOUBLE) *
      |      list_sum(list_transform(range(1, len(l) + 1),
      |        i -> l[i] * ((1::BIGINT) << (len(l) - i))))) /
      |    (((1::BIGINT) << len(l)) - 1)) AS BIGINT) AS ewma_e4
      |FROM w""".stripMargin

  /** CUSUM oracle — the SAME closed form (prefix sums, then running
    * min) in DuckDB window SQL; constants are target±slack pre-folded
    * (6000 = target+slack, 4000 = target−slack). */
  private val cusumSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) // 1000000 AS sec,
      |         CAST(round(value * 100) AS BIGINT) AS x
      |  FROM events WHERE user_id < 40),
      |c AS (
      |  SELECT event_id, user_id, sec, x,
      |    CAST(sum(x - 6000) OVER w AS BIGINT) AS cpos,
      |    CAST(sum(4000 - x) OVER w AS BIGINT) AS cneg
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |s AS (
      |  SELECT event_id, user_id, x,
      |    cpos - least(min(cpos) OVER w, 0) AS s_pos,
      |    cneg - least(min(cneg) OVER w, 0) AS s_neg
      |  FROM c
      |  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id, x AS value_cents, s_pos, s_neg
      |FROM s WHERE s_pos >= 20000 OR s_neg >= 20000""".stripMargin

  /** Holt oracle — the SAME integer floor-division recursion replayed
    * as a recursive CTE (L_t appears twice in B_t's expression; SQL
    * has no step-local binding). */
  private val holtSql: String =
    """WITH RECURSIVE e AS (
      |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS x,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts) // 1000000, event_id) AS rn
      |  FROM events WHERE user_id < 40),
      |h(user_id, rn, l, b) AS (
      |  SELECT user_id, 1, x * 10000, CAST(0 AS BIGINT) FROM e WHERE rn = 1
      |  UNION ALL
      |  SELECT e.user_id, e.rn,
      |    CAST(floor((e.x * 10000 + h.l + h.b) / 2.0) AS BIGINT),
      |    CAST(floor((CAST(floor((e.x * 10000 + h.l + h.b) / 2.0) AS BIGINT)
      |      - h.l + 3 * h.b) / 4.0) AS BIGINT)
      |  FROM h JOIN e ON e.user_id = h.user_id AND e.rn = h.rn + 1),
      |last AS (SELECT user_id, max(rn) AS mx FROM e GROUP BY 1)
      |SELECT h.user_id, h.rn AS n_obs, h.l AS level_e4, h.b AS trend_e4,
      |  h.l + 8 * h.b AS forecast_e4
      |FROM h JOIN last ON h.user_id = last.user_id AND h.rn = last.mx""".stripMargin

  /** Per-event Holt states — the same recursion as [[holtSql]], but
    * emitting EVERY rn (the streaming twin's surface) instead of the
    * series endpoint. */
  private val holtStreamSql: String =
    """WITH RECURSIVE e AS (
      |  SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS x,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts) // 1000000, event_id) AS rn
      |  FROM events WHERE user_id < 40),
      |h(user_id, rn, l, b) AS (
      |  SELECT user_id, 1, x * 10000, CAST(0 AS BIGINT) FROM e WHERE rn = 1
      |  UNION ALL
      |  SELECT e.user_id, e.rn,
      |    CAST(floor((e.x * 10000 + h.l + h.b) / 2.0) AS BIGINT),
      |    CAST(floor((CAST(floor((e.x * 10000 + h.l + h.b) / 2.0) AS BIGINT)
      |      - h.l + 3 * h.b) / 4.0) AS BIGINT)
      |  FROM h JOIN e ON e.user_id = h.user_id AND e.rn = h.rn + 1)
      |SELECT e.event_id, e.user_id, e.x AS value_cents,
      |  h.l AS level_e4, h.b AS trend_e4
      |FROM h JOIN e ON e.user_id = h.user_id AND e.rn = h.rn""".stripMargin

  private val multiFiltersSql: String =
    s"""WITH base AS (
         |  SELECT event_type, CAST(user_id % 4 AS VARCHAR) AS user_bucket,
         |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         |    CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events
         |  WHERE event_type IN ('click', 'purchase')
         |    AND ts >= TIMESTAMP '${lo("2024-01-05T00:00")}'
         |    AND ts < TIMESTAMP '${hi("2024-01-07T00:00")}'),
         |cnt AS (SELECT user_bucket, bucket, count(*) AS value
         |  FROM base WHERE event_type = 'click' AND user_bucket = '1'
         |  GROUP BY ALL),
         |avgp AS (SELECT user_bucket, bucket,
         |    count(*) AS counter, sum(cents) AS total
         |  FROM base WHERE event_type = 'purchase' GROUP BY ALL),
         |grid AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-05',
         |  TIMESTAMP '2024-01-06', INTERVAL 1 DAY)) AS bucket),
         |cs AS (SELECT DISTINCT user_bucket FROM cnt),
         |avs AS (SELECT DISTINCT user_bucket FROM avgp)
         |SELECT s.user_bucket, 'clicks_count' AS fact, g.bucket,
         |  coalesce(c.value, 0) AS value,
         |  CAST(NULL AS BIGINT) AS counter, CAST(NULL AS BIGINT) AS total,
         |  'user_bucket' AS dim
         |FROM cs s CROSS JOIN grid g
         |LEFT JOIN cnt c USING (user_bucket, bucket)
         |UNION ALL
         |SELECT s.user_bucket, 'spend_avg' AS fact,
         |  g.bucket, CAST(NULL AS BIGINT) AS value,
         |  coalesce(a.counter, 0) AS counter, coalesce(a.total, 0) AS total,
         |  'user_bucket' AS dim
         |FROM avs s CROSS JOIN grid g
         |LEFT JOIN avgp a USING (user_bucket, bucket)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "series_holt" -> holtSql,
    "stream_holt" -> holtStreamSql,
    "event_cusum" -> cusumSql,
    // the streaming recursion must land exactly the batch rows
    "stream_cusum" -> cusumSql,
    // routed ≡ raw AND recursion ≡ closed form, in one compare
    "ts_cusum_routed" ->
      """WITH d AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, bucket, n_events,
        |    CAST(sum(n_events - 70) OVER w AS BIGINT) AS cpos,
        |    CAST(sum(64 - n_events) OVER w AS BIGINT) AS cneg
        |  FROM d
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (
        |  SELECT event_type, bucket, n_events,
        |    cpos - least(min(cpos) OVER w, 0) AS s_pos,
        |    cneg - least(min(cneg) OVER w, 0) AS s_neg
        |  FROM c
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_type, bucket, n_events, s_pos, s_neg
        |FROM s WHERE s_pos >= 20 OR s_neg >= 20""".stripMargin,

    // the four roles as row_number picks — selection, not synthesis,
    // so the compare is row-exact
    "series_m4_downsample" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    event_id, epoch_us(ts) // 1000000 AS sec,
        |    CAST(round(value * 100) AS BIGINT) AS x
        |  FROM events WHERE user_id < 40),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY user_id, bucket
        |      ORDER BY sec, event_id) AS rf,
        |    row_number() OVER (PARTITION BY user_id, bucket
        |      ORDER BY sec DESC, event_id DESC) AS rl,
        |    row_number() OVER (PARTITION BY user_id, bucket
        |      ORDER BY x, sec, event_id) AS rmin,
        |    row_number() OVER (PARTITION BY user_id, bucket
        |      ORDER BY x DESC, sec, event_id) AS rmax
        |  FROM e)
        |SELECT user_id, bucket, event_id, x AS value_cents
        |FROM r WHERE rf = 1 OR rl = 1 OR rmin = 1 OR rmax = 1""".stripMargin,
    "ts_counter_hour_fill" -> fillOracle(
      where = "event_type = 'click'",
      bucketExpr = "date_trunc('hour', ts)",
      gridStart = "2024-01-05 00:00:00", gridStop = "2024-01-06 23:00:00",
      gridStep = "1 HOUR",
      loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-07T00:00")),

    // exact distinct counts per day over the same fill grid; the
    // rollup-served twin must be bit-identical, so it shares this SQL
    "ts_distinct_day" -> fillOracle(
      where = "event_type = 'click'",
      bucketExpr = "date_trunc('day', ts)",
      gridStart = "2024-01-05 00:00:00", gridStop = "2024-01-11 00:00:00",
      gridStep = "1 DAY",
      loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-12T00:00"),
      measure = "count(DISTINCT user_id)"),

    // routed ≡ raw for the day-tier read (the Spark side scans the
    // coarsened day partials; the oracle recomputes from raw events)
    "ts_routed_day_tier" ->
      """SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
        |  max(CAST(round(value * 100) AS BIGINT)) AS max_cents
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-12 00:00:00'
        |GROUP BY ALL""".stripMargin,

    // routed ≡ raw for count distinct: the oracle computes straight
    // from raw events, the Spark side is served from the partials
    "ts_routed_distinct" ->
      """SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |  count(DISTINCT user_id) AS uniq_users
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-12 00:00:00'
        |GROUP BY 1, 2""".stripMargin,

    // identical to ts_routed_distinct: the day tier must not change
    // the answer, only the store it reads
    "ts_routed_distinct_day" ->
      """SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |  count(DISTINCT user_id) AS uniq_users
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-12 00:00:00'
        |GROUP BY 1, 2""".stripMargin,

    // hourly distinct fill for the streaming-maintained rollup twin
    "ts_stream_distinct_fill" -> fillOracle(
      where = "event_type = 'click'",
      bucketExpr = "date_trunc('hour', ts)",
      gridStart = "2024-01-05 00:00:00", gridStop = "2024-01-06 23:00:00",
      gridStep = "1 HOUR",
      loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-07T00:00"),
      measure = "count(DISTINCT user_id)"),

    "ts_distinct_rollup" -> fillOracle(
      where = "event_type = 'click'",
      bucketExpr = "date_trunc('day', ts)",
      gridStart = "2024-01-05 00:00:00", gridStop = "2024-01-11 00:00:00",
      gridStep = "1 DAY",
      loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-12T00:00"),
      measure = "count(DISTINCT user_id)"),

    // the fill oracle wrapped in the trailing window; window sums CAST
    // back to BIGINT (DuckDB widens to HUGEINT)
    "ts_moving_avg" ->
      s"""WITH filled AS (
         |${fillOracle(
             where = "event_type = 'click'",
             bucketExpr = "date_trunc('hour', ts)",
             gridStart = "2024-01-05 00:00:00",
             gridStop = "2024-01-06 23:00:00",
             gridStep = "1 HOUR",
             loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-07T00:00"))}
         |)
         |SELECT event_type, bucket, value,
         |  CAST(sum(value) OVER w AS BIGINT) AS trailing_sum,
         |  CAST(floor(100.0 * sum(value) OVER w / count(*) OVER w)
         |    AS BIGINT) AS mavg_e2
         |FROM filled
         |WINDOW w AS (PARTITION BY event_type ORDER BY bucket
         |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin,

    // the fill oracle accumulated into a wrapping gauge, then the
    // reset-aware increase; both sides compute rate_e4 in the same
    // double expression over identical integers, so floor agrees
    "ts_rate" ->
      s"""WITH filled AS (
         |${fillOracle(
             where = "event_type = 'click'",
             bucketExpr = "date_trunc('hour', ts)",
             gridStart = "2024-01-05 00:00:00",
             gridStop = "2024-01-06 23:00:00",
             gridStep = "1 HOUR",
             loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-07T00:00"))}
         |),
         |gauge AS (
         |  SELECT event_type, bucket,
         |    CAST(sum(value) OVER (PARTITION BY event_type ORDER BY bucket
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) % 100
         |      AS BIGINT) AS gauge
         |  FROM filled),
         |lagged AS (
         |  SELECT event_type, bucket, gauge,
         |    lag(gauge) OVER (PARTITION BY event_type ORDER BY bucket) AS prev
         |  FROM gauge),
         |inc AS (
         |  SELECT event_type, bucket, gauge,
         |    CASE WHEN prev IS NULL THEN NULL
         |         WHEN gauge >= prev THEN gauge - prev
         |         ELSE gauge END AS increase
         |  FROM lagged)
         |SELECT event_type, bucket, gauge, increase,
         |  CAST(floor(increase * 10000.0 / 3600) AS BIGINT) AS rate_e4
         |FROM inc""".stripMargin,

    // sparse hourly series → dense grid with NULL holes → neighbour
    // structs via IGNORE NULLS windows → the same weighted-mean double
    // expression over identical integers as the Spark side
    "ts_interp_fill" ->
      s"""WITH scanned AS (
         |  SELECT event_type, CAST(user_id % 10 AS VARCHAR) AS user_bucket,
         |    CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
         |    count(*) AS v
         |  FROM events
         |  WHERE event_type = 'purchase'
         |    AND CAST(user_id % 10 AS VARCHAR) = '3'
         |    AND ts >= TIMESTAMP '${lo("2024-01-05T00:00")}'
         |    AND ts < TIMESTAMP '${hi("2024-01-12T00:00")}'
         |  GROUP BY ALL),
         |grid AS (
         |  SELECT unnest(generate_series(TIMESTAMP '2024-01-05 00:00:00',
         |    TIMESTAMP '2024-01-11 23:00:00', INTERVAL 1 HOUR)) AS bucket),
         |series AS (SELECT DISTINCT event_type, user_bucket FROM scanned),
         |sparse AS (
         |  SELECT s.event_type, s.user_bucket, g.bucket, c.v
         |  FROM series s CROSS JOIN grid g
         |  LEFT JOIN scanned c ON c.event_type = s.event_type
         |    AND c.user_bucket = s.user_bucket AND c.bucket = g.bucket),
         |nb AS (
         |  SELECT event_type, user_bucket, bucket, v,
         |    CAST(epoch(bucket) AS BIGINT) AS t,
         |    last_value(CASE WHEN v IS NOT NULL THEN
         |        struct_pack(t := CAST(epoch(bucket) AS BIGINT), v := v)
         |      END IGNORE NULLS)
         |      OVER (PARTITION BY event_type, user_bucket ORDER BY bucket
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
         |    first_value(CASE WHEN v IS NOT NULL THEN
         |        struct_pack(t := CAST(epoch(bucket) AS BIGINT), v := v)
         |      END IGNORE NULLS)
         |      OVER (PARTITION BY event_type, user_bucket ORDER BY bucket
         |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
         |  FROM sparse)
         |SELECT event_type, user_bucket, bucket,
         |  CASE WHEN v IS NOT NULL THEN v * 100
         |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
         |         CAST(floor((pv.v * (nv.t - t) + nv.v * (t - pv.t))
         |           * 100.0 / (nv.t - pv.t)) AS BIGINT)
         |       ELSE 0 END AS value_e2,
         |  CASE WHEN v IS NOT NULL THEN 'obs'
         |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
         |       ELSE 'edge' END AS src
         |FROM nb""".stripMargin,

    // identical to ts_counter_hour_fill: the service façade must be
    // indistinguishable from the operator pipeline
    "ts_service_end_to_end" -> fillOracle(
      where = "event_type = 'click'",
      bucketExpr = "date_trunc('hour', ts)",
      gridStart = "2024-01-05 00:00:00", gridStop = "2024-01-06 23:00:00",
      gridStep = "1 HOUR",
      loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-07T00:00")),

    // the SQL-text surface over the identical read: same fill oracle
    "ts_fill_sql" -> fillOracle(
      where = "event_type = 'click'",
      bucketExpr = "date_trunc('hour', ts)",
      gridStart = "2024-01-05 00:00:00", gridStop = "2024-01-06 23:00:00",
      gridStep = "1 HOUR",
      loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-07T00:00")),

    // the parameterized SQL window function: each queried window is
    // exactly the Scala read's fill for that window, tagged by window
    "ts_window_sql" ->
      s"""SELECT 1 AS win, * FROM (${fillOracle(
        where = "event_type = 'click'",
        bucketExpr = "date_trunc('hour', ts)",
        gridStart = "2024-01-05 00:00:00", gridStop = "2024-01-05 23:00:00",
        gridStep = "1 HOUR",
        loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-06T00:00"))})
         |UNION ALL
         |SELECT 2 AS win, * FROM (${fillOracle(
        where = "event_type = 'click'",
        bucketExpr = "date_trunc('hour', ts)",
        gridStart = "2024-01-06 00:00:00", gridStop = "2024-01-06 23:00:00",
        gridStep = "1 HOUR",
        loTs = lo("2024-01-06T00:00"), hiTs = hi("2024-01-07T00:00"))})""".stripMargin,

    // the day-tier windowed function: each window's rows are the
    // plain day-grain fill over exactly that inclusive-bucketed scan
    // — the day/slice branch choice must never show in the rows
    "ts_window_day_sql" ->
      s"""SELECT 1 AS win, * FROM (${fillOracle(
        where = "event_type = 'click'",
        bucketExpr = "date_trunc('day', ts)",
        gridStart = "2024-01-05 00:00:00", gridStop = "2024-01-05 00:00:00",
        gridStep = "1 DAY",
        loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-05T23:45"))})
         |UNION ALL
         |SELECT 2 AS win, * FROM (${fillOracle(
        where = "event_type = 'click'",
        bucketExpr = "date_trunc('day', ts)",
        gridStart = "2024-01-05 00:00:00", gridStop = "2024-01-06 00:00:00",
        gridStep = "1 DAY",
        loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-06T23:45"))})
         |UNION ALL
         |SELECT 3 AS win, * FROM (${fillOracle(
        where = "event_type = 'click'",
        bucketExpr = "date_trunc('day', ts)",
        gridStart = "2024-01-05 00:00:00", gridStop = "2024-01-06 00:00:00",
        gridStep = "1 DAY",
        loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-06T12:00"))})""".stripMargin,

    // the SQL dashboard IS the Scala dashboard: oracle shared verbatim
    "ts_multi_sql" -> multiMixedSql,

    // the SQL hist-tile dashboard shares the Scala twin's oracle
    "ts_multi_hist_sql" -> multiHistSql,

    // the routing decisions are structural constants of the setup —
    // no store bytes read, no data-dependent value in the output
    "ts_route_explain" ->
      """SELECT * FROM (VALUES
        |  ('clicks_count', 'user_bucket', 'rollup-day'),
        |  ('purchases_count', 'user_bucket', 'external-rollup+local-events'),
        |  ('late_count', 'user_bucket', 'raw-scan'))
        |  AS t(fact, grouping, tier)""".stripMargin,

    // the full loop history the read log must show: 2 raw scans drew
    // the advice, the post-advice re-read routed, the cold dimension
    // was read once and never materialized
    "ts_workload_advice" ->
      """SELECT * FROM (VALUES
        |  ('clicks_count', 'event_type', 'raw-scan', CAST(1 AS BIGINT)),
        |  ('clicks_count', 'user_bucket', 'raw-scan', CAST(2 AS BIGINT)),
        |  ('clicks_count', 'user_bucket', 'rollup-slice', CAST(1 AS BIGINT)))
        |  AS t(fact, grouping, tier, n_reads)""".stripMargin,

    // the cross-session history only the parquet log can carry: 2 raw
    // scans from session 1, the post-advice rollup read from session
    // 2 — session 3's own memory starts empty, so these counts prove
    // the fold-on-attach path
    "ts_workload_persisted" ->
      """SELECT * FROM (VALUES
        |  ('clicks_count', 'user_bucket', 'raw-scan', CAST(2 AS BIGINT)),
        |  ('clicks_count', 'user_bucket', 'rollup-slice', CAST(1 AS BIGINT)))
        |  AS t(fact, grouping, tier, n_reads)""".stripMargin,

    // integral-cents spend distribution, 2000-cent buckets clamped to
    // [0, 20000) — the service's histogram kernel over ingested cents
    "ts_hist_sql" ->
      s"""SELECT event_type,
         |  CAST(LEAST(GREATEST(FLOOR(CAST(round(value * 100) AS BIGINT)
         |    / 2000), 0), 9) AS BIGINT) * 2000 AS hist_bucket,
         |  count(*) AS value
         |FROM events
         |WHERE ts >= TIMESTAMP '${lo("2024-01-05T00:00")}'
         |  AND ts < TIMESTAMP '${hi("2024-01-07T00:00")}'
         |GROUP BY ALL""".stripMargin,

    // the windowed histogram function: each queried window is the
    // service's distribution over exactly that inclusive-bucketed scan
    "ts_hist_window_sql" -> {
      def win(tag: Int, l: String, h: String) =
        s"""SELECT $tag AS win, event_type,
           |  CAST(LEAST(GREATEST(FLOOR(CAST(round(value * 100) AS BIGINT)
           |    / 2000), 0), 9) AS BIGINT) * 2000 AS hist_bucket,
           |  count(*) AS value
           |FROM events
           |WHERE ts >= TIMESTAMP '${lo(l)}'
           |  AND ts < TIMESTAMP '${hi(h)}'
           |GROUP BY ALL""".stripMargin
      win(1, "2024-01-05T00:00", "2024-01-06T00:00") +
        "\nUNION ALL\n" +
        win(2, "2024-01-06T00:00", "2024-01-07T00:00")
    },

    // exactly the valid subset of the corrupted feed: events whose
    // id % 7 hit the null-value (0) or undefined-fact (1) corruption
    // are excluded — they were quarantined, not ingested
    "ts_lenient_ingest" -> fillOracle(
      where = "event_type = 'click' AND (event_id % 7) NOT IN (0, 1)",
      bucketExpr = "date_trunc('hour', ts)",
      gridStart = "2024-01-05 00:00:00", gridStop = "2024-01-06 23:00:00",
      gridStep = "1 HOUR",
      loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-07T00:00")),

    // the union of the two per-fact fills, derived with the fact id
    // as a second series dimension
    "ts_multi_fact" -> fillOracle(
      where = "event_type IN ('click', 'purchase')",
      bucketExpr = "date_trunc('day', ts)",
      gridStart = "2024-01-05 00:00:00", gridStop = "2024-01-06 00:00:00",
      gridStep = "1 DAY",
      loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-07T00:00"),
      dimExprs = "CAST(user_id % 4 AS VARCHAR) AS user_bucket, " +
        "CASE event_type WHEN 'click' THEN 'clicks_count' " +
        "ELSE 'purchases_count' END AS fact",
      dimNames = "user_bucket, fact"),

    // per-fact fillers: each fact's gaps carry ITS OWN filler
    // (clicks→0, purchases→−1) — the coalesce default is a CASE on
    // the fact id, exactly the map lookup the Scala fill compiles to
    "ts_multi_fillers" -> fillOracle(
      where = "event_type IN ('click', 'purchase')",
      bucketExpr = "date_trunc('hour', ts)",
      gridStart = "2024-01-05 00:00:00", gridStop = "2024-01-06 23:00:00",
      gridStep = "1 HOUR",
      loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-07T00:00"),
      dimExprs = "CAST(user_id % 4 AS VARCHAR) AS user_bucket, " +
        "CASE event_type WHEN 'click' THEN 'clicks_count' " +
        "ELSE 'purchases_count' END AS fact",
      dimNames = "user_bucket, fact")
      .replace("coalesce(c.cnt, 0)",
        "coalesce(c.cnt, CASE s.fact WHEN 'purchases_count' " +
          "THEN -1 ELSE 0 END)"),

    // counter fill (hist_bucket null) ∪ histogram cells (no fill):
    // the null-padded union the hist-tile dashboard serves
    "ts_multi_hist" -> multiHistSql,

    // two fills sharing one schema: click counts ∪ exact distinct
    // users, each from its own scan of the same click events
    "ts_multi_distinct" ->
      s"""WITH base AS (
         |  SELECT CAST(user_id % 4 AS VARCHAR) AS user_bucket, user_id,
         |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket
         |  FROM events
         |  WHERE event_type = 'click'
         |    AND ts >= TIMESTAMP '${lo("2024-01-05T00:00")}'
         |    AND ts < TIMESTAMP '${hi("2024-01-07T00:00")}'),
         |cnt AS (SELECT user_bucket, bucket, count(*) AS value
         |  FROM base GROUP BY ALL),
         |uniq AS (SELECT user_bucket, bucket,
         |    count(DISTINCT user_id) AS value
         |  FROM base GROUP BY ALL),
         |grid AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-05',
         |  TIMESTAMP '2024-01-06', INTERVAL 1 DAY)) AS bucket),
         |cs AS (SELECT DISTINCT user_bucket FROM cnt),
         |us AS (SELECT DISTINCT user_bucket FROM uniq)
         |SELECT s.user_bucket, 'clicks_count' AS fact, g.bucket,
         |  coalesce(c.value, 0) AS value
         |FROM cs s CROSS JOIN grid g
         |LEFT JOIN cnt c USING (user_bucket, bucket)
         |UNION ALL
         |SELECT s.user_bucket, 'uniq_users' AS fact, g.bucket,
         |  coalesce(u.value, 0) AS value
         |FROM us s CROSS JOIN grid g
         |LEFT JOIN uniq u USING (user_bucket, bucket)""".stripMargin,

    // the null-padded union of the per-type fills: counter rows carry
    // value (0-filled), average rows carry the (counter, total)
    // partial ((0,0)-filled); each type's series set comes from ITS
    // OWN scan (absent series stay absent, per type)
    "ts_multi_mixed" -> multiMixedSql,

    // the advisor-materialized dashboard must serve the exact mixed
    // rows — the advice changes the tier, never a row (2 user buckets
    // on hourly slices: the density where the default 2× bar passes)
    "ts_advised_route" -> multiMixedSqlMod(2, 60),

    // the multi-DIMENSION dashboard: clicks by event_type ∪ spend by
    // user_bucket, `dim` discriminator, foreign grouping columns null
    "ts_multi_dims" ->
      s"""WITH base AS (
         |  SELECT event_type, CAST(user_id % 4 AS VARCHAR) AS user_bucket,
         |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         |    CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events
         |  WHERE event_type IN ('click', 'purchase')
         |    AND ts >= TIMESTAMP '${lo("2024-01-05T00:00")}'
         |    AND ts < TIMESTAMP '${hi("2024-01-07T00:00")}'),
         |cnt AS (SELECT event_type, bucket, count(*) AS value
         |  FROM base WHERE event_type = 'click' GROUP BY ALL),
         |avgp AS (SELECT user_bucket, bucket,
         |    count(*) AS counter, sum(cents) AS total
         |  FROM base WHERE event_type = 'purchase' GROUP BY ALL),
         |grid AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-05',
         |  TIMESTAMP '2024-01-06', INTERVAL 1 DAY)) AS bucket),
         |cs AS (SELECT DISTINCT event_type FROM cnt),
         |avs AS (SELECT DISTINCT user_bucket FROM avgp)
         |SELECT s.event_type, 'clicks_count' AS fact, g.bucket,
         |  coalesce(c.value, 0) AS value,
         |  CAST(NULL AS VARCHAR) AS user_bucket,
         |  CAST(NULL AS BIGINT) AS counter, CAST(NULL AS BIGINT) AS total,
         |  'event_type' AS dim
         |FROM cs s CROSS JOIN grid g
         |LEFT JOIN cnt c USING (event_type, bucket)
         |UNION ALL
         |SELECT CAST(NULL AS VARCHAR) AS event_type, 'spend_avg' AS fact,
         |  g.bucket, CAST(NULL AS BIGINT) AS value,
         |  s.user_bucket,
         |  coalesce(a.counter, 0) AS counter, coalesce(a.total, 0) AS total,
         |  'user_bucket' AS dim
         |FROM avs s CROSS JOIN grid g
         |LEFT JOIN avgp a USING (user_bucket, bucket)""".stripMargin,

    // per-tile filters on ONE dimension: the clicks tile serves
    // bucket-1 rows only (its filter prunes both rows and the series
    // grid), the spend tile stays unfiltered — same null-padded
    // union shape as ts_multi_dims, one dimension, `dim` constant
    "ts_multi_filters" -> multiFiltersSql,

    // the tiles SQL view is the Scala tiles read: shared verbatim
    "ts_multi_filters_sql" -> multiFiltersSql,

    // rollup-served ≡ compute-on-read for the mixed dashboard: the
    // tiers must change only the store that is scanned, never a row
    "ts_multi_routed" -> multiMixedSql,

    // both streaming-maintained tiles recomputed from the raw events
    // the stream replayed (hour grid, null-padded per-type union —
    // the multiMixedSql shape over the full event stream)
    "ts_multi_stream" ->
      s"""WITH base AS (
         |  SELECT event_type,
         |    CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
         |    CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events
         |  WHERE ts >= TIMESTAMP '${lo("2024-01-05T00:00")}'
         |    AND ts < TIMESTAMP '${hi("2024-01-07T00:00")}'),
         |cnt AS (SELECT event_type, bucket, count(*) AS value
         |  FROM base GROUP BY ALL),
         |avgp AS (SELECT event_type, bucket,
         |    count(*) AS counter, sum(cents) AS total
         |  FROM base GROUP BY ALL),
         |grid AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-05',
         |  TIMESTAMP '2024-01-06 23:00:00', INTERVAL 1 HOUR)) AS bucket),
         |cs AS (SELECT DISTINCT event_type FROM cnt),
         |avs AS (SELECT DISTINCT event_type FROM avgp)
         |SELECT s.event_type, 'events_count' AS fact, g.bucket,
         |  coalesce(c.value, 0) AS value,
         |  CAST(NULL AS BIGINT) AS counter, CAST(NULL AS BIGINT) AS total
         |FROM cs s CROSS JOIN grid g
         |LEFT JOIN cnt c USING (event_type, bucket)
         |UNION ALL
         |SELECT s.event_type, 'value_avg' AS fact, g.bucket,
         |  CAST(NULL AS BIGINT) AS value,
         |  coalesce(a.counter, 0) AS counter, coalesce(a.total, 0) AS total
         |FROM avs s CROSS JOIN grid g
         |LEFT JOIN avgp a USING (event_type, bucket)""".stripMargin,

    // all four tiles recomputed from the raw events the streams
    // replayed — exact distinct from tall dval partials, histogram
    // from bucketed count partials, beside the counter/average pair;
    // the null-padded four-type union schema
    "ts_multi_stream4" ->
      s"""WITH base AS (
         |  SELECT event_type, user_id, value AS raw,
         |    CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
         |    CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events
         |  WHERE ts >= TIMESTAMP '${lo("2024-01-05T00:00")}'
         |    AND ts < TIMESTAMP '${hi("2024-01-07T00:00")}'),
         |cnt AS (SELECT event_type, bucket, count(*) AS value
         |  FROM base GROUP BY ALL),
         |uniq AS (SELECT event_type, bucket,
         |    count(DISTINCT user_id) AS value
         |  FROM base GROUP BY ALL),
         |avgp AS (SELECT event_type, bucket,
         |    count(*) AS counter, sum(cents) AS total
         |  FROM base GROUP BY ALL),
         |hist AS (SELECT event_type, bucket,
         |    CAST(LEAST(GREATEST(FLOOR(raw / 20), 0), 9) AS BIGINT) * 20
         |      AS hist_bucket,
         |    count(*) AS value
         |  FROM base GROUP BY ALL),
         |grid AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-05',
         |  TIMESTAMP '2024-01-06 23:00:00', INTERVAL 1 HOUR)) AS bucket),
         |es AS (SELECT DISTINCT event_type FROM base)
         |SELECT s.event_type, 'events_count' AS fact, g.bucket,
         |  coalesce(c.value, 0) AS value, CAST(NULL AS BIGINT) AS counter,
         |  CAST(NULL AS BIGINT) AS total, CAST(NULL AS BIGINT) AS hist_bucket
         |FROM es s CROSS JOIN grid g
         |LEFT JOIN cnt c USING (event_type, bucket)
         |UNION ALL
         |SELECT s.event_type, 'uniq_users', g.bucket,
         |  coalesce(u.value, 0), NULL, NULL, NULL
         |FROM es s CROSS JOIN grid g
         |LEFT JOIN uniq u USING (event_type, bucket)
         |UNION ALL
         |SELECT s.event_type, 'value_avg', g.bucket, NULL,
         |  coalesce(a.counter, 0), coalesce(a.total, 0), NULL
         |FROM es s CROSS JOIN grid g
         |LEFT JOIN avgp a USING (event_type, bucket)
         |UNION ALL
         |SELECT event_type, 'value_hist', bucket, value, NULL, NULL,
         |  hist_bucket
         |FROM hist""".stripMargin,

    // batches 0-1 only: the as-of watermark excludes batch 2's
    // events exactly as the partition filter does on the Spark side
    "ts_asof_batch" -> fillOracle(
      where = "event_type = 'click' AND (event_id % 3) <= 1",
      bucketExpr = "date_trunc('hour', ts)",
      gridStart = "2024-01-05 00:00:00", gridStop = "2024-01-06 23:00:00",
      gridStep = "1 HOUR",
      loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-07T00:00")),

    // the retention read recomputed over the COMPLETE raw history —
    // the Spark side deleted days 5-6 from its raw store and must
    // still produce exactly this from the retained partials
    "ts_retention_serve" -> fillOracle(
      where = "event_type = 'click'",
      bucketExpr = "date_trunc('day', ts)",
      gridStart = "2024-01-05 00:00:00", gridStop = "2024-01-07 00:00:00",
      gridStep = "1 DAY",
      loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-07T23:45")),

    // the oracle deletes the subject from raw — served-after-erasure
    // must equal computed-over-survivors
    "ts_erasure_serve" -> fillOracle(
      where = "event_type = 'click' AND user_id % 5 <> 3",
      bucketExpr = "date_trunc('day', ts)",
      gridStart = "2024-01-05 00:00:00", gridStop = "2024-01-07 00:00:00",
      gridStep = "1 DAY",
      loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-07T23:45")),

    "ts_counter_none" ->
      s"""SELECT event_type, CAST(user_id % 10 AS VARCHAR) AS user_bucket,
         |  CAST(NULL AS TIMESTAMP) AS bucket, count(*) AS value
         |FROM events
         |WHERE CAST(user_id % 10 AS VARCHAR) = '3'
         |  AND ts >= TIMESTAMP '${lo("2024-01-10T00:00")}'
         |  AND ts < TIMESTAMP '${hi("2024-01-20T00:00")}'
         |GROUP BY ALL""".stripMargin,

    "ts_avg_day_fill" ->
      s"""WITH scanned AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         |    count(*) AS counter,
         |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total
         |  FROM events
         |  WHERE ts >= TIMESTAMP '${lo("2024-01-03T00:00")}'
         |    AND ts < TIMESTAMP '${hi("2024-01-10T00:00")}'
         |  GROUP BY ALL),
         |grid AS (
         |  SELECT unnest(generate_series(TIMESTAMP '2024-01-03 00:00:00',
         |    TIMESTAMP '2024-01-09 00:00:00', INTERVAL 1 DAY)) AS bucket),
         |series AS (SELECT DISTINCT event_type FROM scanned)
         |SELECT s.event_type, g.bucket AS bucket,
         |  coalesce(c.counter, 0) AS counter, coalesce(c.total, 0) AS total
         |FROM series s CROSS JOIN grid g
         |LEFT JOIN scanned c USING (event_type, bucket)""".stripMargin,

    "ts_hist" ->
      s"""SELECT event_type,
         |  CAST(LEAST(GREATEST(FLOOR(value / 20), 0), 9) AS BIGINT) * 20 AS hist_bucket,
         |  count(*) AS value
         |FROM events
         |WHERE ts >= TIMESTAMP '${lo("2024-01-01T00:00")}'
         |  AND ts < TIMESTAMP '${hi("2024-01-31T00:00")}'
         |GROUP BY ALL""".stripMargin,

    // the hist oracle wrapped in the same integer-exact cumulative
    // threshold (window sums stay internal, so no HUGEINT reaches the
    // output schema)
    "ts_hist_pct" ->
      s"""WITH h AS (
         |  SELECT event_type,
         |    CAST(LEAST(GREATEST(FLOOR(value / 20), 0), 9) AS BIGINT) * 20
         |      AS hist_bucket,
         |    count(*) AS value
         |  FROM events
         |  WHERE ts >= TIMESTAMP '${lo("2024-01-01T00:00")}'
         |    AND ts < TIMESTAMP '${hi("2024-01-31T00:00")}'
         |  GROUP BY ALL),
         |c AS (
         |  SELECT event_type, hist_bucket, value,
         |    sum(value) OVER (PARTITION BY event_type ORDER BY hist_bucket
         |      ROWS UNBOUNDED PRECEDING) AS cum,
         |    sum(value) OVER (PARTITION BY event_type) AS tot
         |  FROM h)
         |SELECT event_type, CAST(p.pct AS BIGINT) AS pct,
         |  min(hist_bucket) AS value
         |FROM c CROSS JOIN (SELECT unnest([50, 90, 95, 99]) AS pct) p
         |WHERE cum * 100 >= tot * p.pct
         |GROUP BY 1, 2""".stripMargin,

    // the inverse read: cumulative share at each requested bound
    "ts_hist_cdf" ->
      s"""WITH h AS (
         |  SELECT event_type,
         |    CAST(LEAST(GREATEST(FLOOR(value / 20), 0), 9) AS BIGINT) * 20
         |      AS hist_bucket,
         |    count(*) AS value
         |  FROM events
         |  WHERE ts >= TIMESTAMP '${lo("2024-01-01T00:00")}'
         |    AND ts < TIMESTAMP '${hi("2024-01-31T00:00")}'
         |  GROUP BY ALL),
         |t AS (
         |  SELECT event_type, hist_bucket, value,
         |    sum(value) OVER (PARTITION BY event_type) AS tot
         |  FROM h)
         |SELECT event_type, CAST(v.at_value AS BIGINT) AS at_value,
         |  CAST(floor(10000.0 * sum(value) / max(tot)) AS BIGINT)
         |    AS cdf_e4
         |FROM t CROSS JOIN (SELECT unnest([40, 100, 160]) AS at_value) v
         |WHERE hist_bucket <= v.at_value
         |GROUP BY 1, 2""".stripMargin,

    // rollup-served twin: identical result by count re-aggregability
    "ts_hist_rollup" ->
      s"""SELECT event_type,
         |  CAST(LEAST(GREATEST(FLOOR(value / 20), 0), 9) AS BIGINT) * 20 AS hist_bucket,
         |  count(*) AS value
         |FROM events
         |WHERE ts >= TIMESTAMP '${lo("2024-01-01T00:00")}'
         |  AND ts < TIMESTAMP '${hi("2024-01-31T00:00")}'
         |GROUP BY ALL""".stripMargin,

    "ts_hist_merged" ->
      s"""SELECT
         |  CAST(LEAST(GREATEST(FLOOR(value / 20), 0), 9) AS BIGINT) * 20 AS hist_bucket,
         |  count(*) AS value
         |FROM events
         |WHERE ts >= TIMESTAMP '${lo("2024-01-01T00:00")}'
         |  AND ts < TIMESTAMP '${hi("2024-01-31T00:00")}'
         |GROUP BY ALL""".stripMargin,

    "ts_hist_day" ->
      s"""SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         |  CAST(LEAST(GREATEST(FLOOR(value / 20), 0), 9) AS BIGINT) * 20 AS hist_bucket,
         |  count(*) AS value
         |FROM events
         |WHERE ts >= TIMESTAMP '${lo("2024-01-01T00:00")}'
         |  AND ts < TIMESTAMP '${hi("2024-01-15T00:00")}'
         |GROUP BY ALL""".stripMargin,

    "ts_week_fill" -> fillOracle(
      where = "event_type = 'signup'",
      bucketExpr = "CAST(ts AS DATE) - CAST(isodow(ts) AS INTEGER)",
      gridStart = "2023-12-31 00:00:00", gridStop = "2024-01-28 00:00:00",
      gridStep = "7 DAY",
      loTs = lo("2023-12-31T00:00"), hiTs = hi("2024-02-04T00:00")),

    "ts_month_fill" -> fillOracle(
      where = "event_type = 'view'",
      bucketExpr = "date_trunc('month', ts)",
      gridStart = "2023-12-01 00:00:00", gridStop = "2024-02-01 00:00:00",
      gridStep = "1 MONTH",
      loTs = lo("2023-12-01T00:00"), hiTs = hi("2024-03-01T00:00")),

    "ts_grouping_paths" ->
      s"""SELECT event_type, user_bucket, bucket,
         |  CAST(GROUPING(user_bucket) AS BIGINT) AS path_id,
         |  count(*) AS value
         |FROM (
         |  SELECT event_type, CAST(user_id % 10 AS VARCHAR) AS user_bucket,
         |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket
         |  FROM events
         |  WHERE ts >= TIMESTAMP '${lo("2024-01-08T00:00")}'
         |    AND ts < TIMESTAMP '${hi("2024-01-11T00:00")}')
         |GROUP BY GROUPING SETS ((event_type, bucket),
         |  (event_type, user_bucket, bucket))""".stripMargin,

    "ts_offset_day" -> fillOracle(
      where = "event_type = 'purchase'",
      bucketExpr = "date_trunc('day', ts - INTERVAL 5 HOUR)",
      gridStart = "2024-01-05 00:00:00", gridStop = "2024-01-09 00:00:00",
      gridStep = "1 DAY",
      loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-10T00:00")),

    "ts_slice_15m" ->
      s"""SELECT event_type,
         |  make_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) * 1000000) AS bucket,
         |  count(*) AS value
         |FROM events
         |WHERE event_type = 'purchase'
         |  AND ts >= TIMESTAMP '${lo("2024-01-10T00:00")}'
         |  AND ts < TIMESTAMP '${hi("2024-01-11T00:00")}'
         |GROUP BY ALL""".stripMargin,

    // slice floor as epoch arithmetic, the reference week as
    // date − isodow days (isodow: Mon=1..Sun=7, same as Joda)
    "ts_sql_surface" ->
      s"""SELECT event_type,
         |  make_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) * 1000000) AS bucket,
         |  CAST(CAST(ts AS DATE) - CAST(isodow(ts) AS INTEGER) AS TIMESTAMP)
         |    AS week_bucket,
         |  count(*) AS value
         |FROM events
         |WHERE event_type = 'purchase'
         |  AND ts >= TIMESTAMP '${lo("2024-01-10T00:00")}'
         |  AND ts < TIMESTAMP '${hi("2024-01-11T00:00")}'
         |GROUP BY ALL""".stripMargin,

    "ts_routing_hier" -> fillOracle(
      where = "event_type = 'view'",
      bucketExpr = "date_trunc('day', ts)",
      gridStart = "2024-01-08 00:00:00", gridStop = "2024-01-10 00:00:00",
      gridStep = "1 DAY",
      loTs = lo("2024-01-08T00:00"), hiTs = hi("2024-01-11T00:00"),
      dimExprs = "event_type, CAST(user_id % 10 AS VARCHAR) AS user_bucket",
      dimNames = "event_type, user_bucket"),

    "events_distinct_users" ->
      "SELECT event_type, count(DISTINCT user_id) AS users FROM events GROUP BY 1",

    // cohort profile recomputed inline; cents sums CAST to BIGINT
    "bucketed_cohort_spend" ->
      """WITH u AS (
        |  SELECT DISTINCT user_id, user_id % 7 AS cohort FROM events)
        |SELECT u.cohort, e.event_type, count(*) AS n_events,
        |  CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM events e JOIN u USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    // json_extract_string replicates get_json_object's $.k path; sums
    // CAST back to BIGINT (DuckDB widens sums to HUGEINT)
    "props_json_profile" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS sum_k,
        |  count(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT)
        |    >= 50 THEN 1 END) AS n_hi
        |FROM events GROUP BY 1""".stripMargin,

    // the date-partitioned copy must aggregate exactly like the raw
    // fixture over the same ts range (the date bounds on the Spark
    // side are pruning-only — derived from, and covering, the ts
    // predicate)
    "events_date_partitioned" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY 1""".stripMargin,

    // the clustered copy must aggregate exactly like the original
    "events_zorder_roundtrip" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(user_id) AS BIGINT) AS sum_users,
        |  min(event_id) AS min_id, max(event_id) AS max_id
        |FROM events GROUP BY 1""".stripMargin,

    // per-column recompute; sums CAST back to BIGINT
    "events_profile" -> Seq("event_id", "user_id", "event_type").map(c =>
      s"""SELECT '$c' AS "column", count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_val,
         |  CAST(max($c) AS VARCHAR) AS max_val
         |FROM events""".stripMargin).mkString("\nUNION ALL\n"),

    "asof_click_purchase" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |purch AS (
        |  SELECT user_id, ts,
        |    CAST(round(value * 100) AS BIGINT) AS purchase_cents
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, p.purchase_cents
        |FROM clicks c ASOF LEFT JOIN purch p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,

    "asof_signup_next_purchase" ->
      """WITH s AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'),
        |p AS (
        |  SELECT user_id, ts,
        |    CAST(round(value * 100) AS BIGINT) AS purchase_cents
        |  FROM events WHERE event_type = 'purchase')
        |SELECT s.event_id, s.user_id, m.purchase_cents
        |FROM s LEFT JOIN LATERAL (
        |  SELECT purchase_cents FROM p
        |  WHERE p.user_id = s.user_id AND p.ts >= s.ts
        |  ORDER BY p.ts LIMIT 1) m ON true""".stripMargin,

    // tolerance = the as-of match restricted to a 1-hour lookback: the
    // latest purchase <= click time is in-window iff ANY purchase is
    // (earlier matches are older), so the LATERAL window form is
    // equivalent to match-then-null-out
    "asof_click_purchase_tol" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |purch AS (
        |  SELECT user_id, ts,
        |    CAST(round(value * 100) AS BIGINT) AS purchase_cents
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, m.purchase_cents
        |FROM clicks c LEFT JOIN LATERAL (
        |  SELECT purchase_cents FROM purch p
        |  WHERE p.user_id = c.user_id AND p.ts <= c.ts
        |    AND p.ts >= c.ts - INTERVAL 1 HOUR
        |  ORDER BY p.ts DESC LIMIT 1) m ON true""".stripMargin,

    // identical to ts_counter_hour_fill: the CSV-round-tripped source
    // must be indistinguishable from the parquet scan
    "events_csv_roundtrip" -> fillOracle(
      where = "event_type = 'click'",
      bucketExpr = "date_trunc('hour', ts)",
      gridStart = "2024-01-05 00:00:00", gridStop = "2024-01-06 23:00:00",
      gridStep = "1 HOUR",
      loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-07T00:00")),

    "events_json_roundtrip" -> fillOracle(
      where = "event_type = 'click'",
      bucketExpr = "date_trunc('hour', ts)",
      gridStart = "2024-01-05 00:00:00", gridStop = "2024-01-06 23:00:00",
      gridStep = "1 HOUR",
      loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-07T00:00")),

    "range_click_purchase_1h" ->
      """SELECT c.event_id AS click_id, c.user_id, p.event_id AS purchase_id
        |FROM events c JOIN events p ON c.user_id = p.user_id
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR""".stripMargin,

    // chained earliest-qualifying CTEs, one per stage
    "event_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS q FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS q FROM events e
        |  JOIN s1 ON s1.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.q GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS q FROM events e
        |  JOIN s2 ON s2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.q GROUP BY 1)
        |SELECT CAST(0 AS BIGINT) AS stage_idx, 'signup' AS stage,
        |  (SELECT count(*) FROM s1) AS n_users
        |UNION ALL SELECT CAST(1 AS BIGINT), 'click',
        |  (SELECT count(*) FROM s2)
        |UNION ALL SELECT CAST(2 AS BIGINT), 'purchase',
        |  (SELECT count(*) FROM s3)""".stripMargin,

    // same seeded md5 bucket family (seeds 1000..1003), width 4096;
    // self-join so both sketch sides coincide
    "join_size_profile" ->
      """WITH k AS (
        |  SELECT CAST(user_id AS VARCHAR) AS k FROM events
        |  WHERE user_id IS NOT NULL),
        |h AS (
        |  SELECT i.i,
        |    CAST('0x' || substr(md5(CAST(1000 + i.i AS VARCHAR) || ':' || k),
        |      1, 15) AS BIGINT) % 4096 AS bkt
        |  FROM k, (SELECT unnest(range(0, 4)) AS i) i),
        |s AS (SELECT i, bkt, count(*) AS cnt FROM h GROUP BY 1, 2),
        |est AS (
        |  SELECT min(coalesce(e, 0)) AS est_rows
        |  FROM (SELECT unnest(range(0, 4)) AS i) sp
        |  LEFT JOIN (SELECT i, sum(cnt * cnt) AS e FROM s GROUP BY 1) t
        |    USING (i)),
        |ex AS (
        |  SELECT sum(c * c) AS exact_rows FROM (
        |    SELECT count(*) AS c FROM events
        |    WHERE user_id IS NOT NULL GROUP BY user_id))
        |SELECT CAST(est_rows AS BIGINT) AS est_rows,
        |  CAST(exact_rows AS BIGINT) AS exact_rows
        |FROM est, ex""".stripMargin,

    // the same stage CTEs with the window bound on each join
    "event_funnel_windowed" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS q FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS q FROM events e
        |  JOIN s1 ON s1.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.q
        |    AND e.ts <= s1.q + INTERVAL 3 DAY GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS q FROM events e
        |  JOIN s2 ON s2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.q
        |    AND e.ts <= s2.q + INTERVAL 3 DAY GROUP BY 1)
        |SELECT CAST(0 AS BIGINT) AS stage_idx, 'signup' AS stage,
        |  (SELECT count(*) FROM s1) AS n_users
        |UNION ALL SELECT CAST(1 AS BIGINT), 'click',
        |  (SELECT count(*) FROM s2)
        |UNION ALL SELECT CAST(2 AS BIGINT), 'purchase',
        |  (SELECT count(*) FROM s3)""".stripMargin,

    // same qualifying-time CTEs as the funnel; rank-picked discrete
    // quantiles over exact integer seconds
    "funnel_latency" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS q FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS q FROM events e
        |  JOIN s1 ON s1.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.q GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS q FROM events e
        |  JOIN s2 ON s2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.q GROUP BY 1),
        |lat AS (
        |  SELECT 1 AS stage_idx, 'signup->click' AS step, s2.user_id,
        |    epoch_us(s2.q) // 1000000 - epoch_us(s1.q) // 1000000
        |      AS lat_secs
        |  FROM s2 JOIN s1 USING (user_id)
        |  UNION ALL
        |  SELECT 2, 'click->purchase', s3.user_id,
        |    epoch_us(s3.q) // 1000000 - epoch_us(s2.q) // 1000000
        |  FROM s3 JOIN s2 USING (user_id)),
        |rk AS (
        |  SELECT stage_idx, step, lat_secs,
        |    row_number() OVER (PARTITION BY step
        |      ORDER BY lat_secs, user_id) AS rn,
        |    count(*) OVER (PARTITION BY step) AS n
        |  FROM lat)
        |SELECT CAST(stage_idx AS BIGINT) AS stage_idx, step,
        |  CAST(max(n) AS BIGINT) AS n_users,
        |  max(CASE WHEN rn = (n - 1) * 50 // 100 + 1 THEN lat_secs END)
        |    AS p50_secs,
        |  max(CASE WHEN rn = (n - 1) * 90 // 100 + 1 THEN lat_secs END)
        |    AS p90_secs
        |FROM rk GROUP BY 1, 2""".stripMargin,

    // identical to event_funnel: the streamed stage advancements,
    // aggregated, must equal the batch funnel
    "stream_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS q FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS q FROM events e
        |  JOIN s1 ON s1.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.q GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS q FROM events e
        |  JOIN s2 ON s2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.q GROUP BY 1)
        |SELECT CAST(0 AS BIGINT) AS stage_idx, 'signup' AS stage,
        |  (SELECT count(*) FROM s1) AS n_users
        |UNION ALL SELECT CAST(1 AS BIGINT), 'click',
        |  (SELECT count(*) FROM s2)
        |UNION ALL SELECT CAST(2 AS BIGINT), 'purchase',
        |  (SELECT count(*) FROM s3)""".stripMargin,

    // first-seen day per user, then distinct (user, activity day)
    // cells per cohort × offset
    "event_cohort_retention" ->
      """WITH fst AS (
        |  SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP)
        |    AS cohort_day
        |  FROM events GROUP BY 1),
        |act AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
        |  FROM events)
        |SELECT f.cohort_day,
        |  CAST(date_diff('day', f.cohort_day, a.d) AS BIGINT) AS day_offset,
        |  count(*) AS n_users
        |FROM act a JOIN fst f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    // identical to range_click_purchase_1h: the stream-stream interval
    // join must emit exactly the batch band join's pairs
    "stream_click_attrib" ->
      """SELECT c.event_id AS click_id, c.user_id, p.event_id AS purchase_id
        |FROM events c JOIN events p ON c.user_id = p.user_id
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR""".stripMargin,

    "event_sessions" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |          OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts, sum(ns) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM o)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        |FROM s GROUP BY user_id, sess""".stripMargin,

    // the greedy capped fold as a recursive CTE: each event inherits
    // or restarts the running session start under the same two strict
    // split rules, then sessions aggregate per (user, start)
    "session_hourly_active" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
        |  FROM events),
        |s AS (
        |  SELECT user_id, rn, ts, ts AS sess_start FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.rn, e.ts,
        |    CASE WHEN e.ts - s.ts > INTERVAL 720 MINUTE
        |           OR e.ts - s.sess_start > INTERVAL 1440 MINUTE
        |      THEN e.ts ELSE s.sess_start END
        |  FROM ev e JOIN s ON e.user_id = s.user_id AND e.rn = s.rn + 1),
        |sess AS (SELECT user_id, sess_start, max(ts) AS sess_end
        |         FROM s GROUP BY 1, 2),
        |hrs AS (SELECT unnest(generate_series(
        |    epoch_us(sess_start) // 3600000000,
        |    epoch_us(sess_end) // 3600000000)) AS hour_idx FROM sess)
        |SELECT hour_idx, count(*) AS n_active FROM hrs GROUP BY 1""".stripMargin,

    "event_transition_matrix" ->
      """WITH t AS (
        |  SELECT lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
        |    event_type AS to_type
        |  FROM events),
        |g AS (SELECT from_type, to_type, count(*) AS n FROM t
        |      WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST((10000 * n) // sum(n) OVER (PARTITION BY from_type)
        |    AS BIGINT) AS p_e4
        |FROM g""".stripMargin,

    "user_rfm" ->
      """SELECT user_id,
        |  CAST(max(epoch_us(ts) // 1000000) AS BIGINT)
        |    AS last_purchase_s,
        |  count(*) AS n_purchases,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1""".stripMargin,

    "training_asof_features" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) // 1000000 AS s,
        |    event_type,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (SELECT *,
        |  sum(is_click) OVER (PARTITION BY user_id ORDER BY s
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS clicks_1h,
        |  max(CASE WHEN is_click = 1 THEN s END) OVER (
        |    PARTITION BY user_id ORDER BY s
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_click_s
        |  FROM e)
        |SELECT event_id, user_id, CAST(clicks_1h AS BIGINT) AS clicks_1h,
        |  s - last_click_s AS click_gap_s, cents AS label_cents
        |FROM w WHERE event_type = 'purchase'""".stripMargin,

    // identical to event_next_examples: the ordered drain must be
    // indistinguishable from the batch window under the oracle
    "stream_next_examples" ->
      """SELECT event_id, user_id,
        |  coalesce(array_to_string(list(event_type) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), ' '), '') AS prefix,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
        |  event_type AS label
        |FROM events
        |QUALIFY gap_us IS NOT NULL""".stripMargin,

    "event_next_examples" ->
      """SELECT event_id, user_id,
        |  coalesce(array_to_string(list(event_type) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), ' '), '') AS prefix,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
        |  event_type AS label
        |FROM events
        |QUALIFY gap_us IS NOT NULL""".stripMargin,

    "event_sessions_capped" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
        |  FROM events),
        |s AS (
        |  SELECT user_id, rn, ts, ts AS sess_start FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.rn, e.ts,
        |    CASE WHEN e.ts - s.ts > INTERVAL 720 MINUTE
        |           OR e.ts - s.sess_start > INTERVAL 1440 MINUTE
        |      THEN e.ts ELSE s.sess_start END
        |  FROM ev e JOIN s ON e.user_id = s.user_id AND e.rn = s.rn + 1)
        |SELECT user_id, sess_start AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY 1, 2""".stripMargin,

    // identical to event_sessions_capped: the drained streaming fold
    // must be indistinguishable from the batch fold under the oracle
    "stream_sessions_capped" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
        |  FROM events),
        |s AS (
        |  SELECT user_id, rn, ts, ts AS sess_start FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.rn, e.ts,
        |    CASE WHEN e.ts - s.ts > INTERVAL 720 MINUTE
        |           OR e.ts - s.sess_start > INTERVAL 1440 MINUTE
        |      THEN e.ts ELSE s.sess_start END
        |  FROM ev e JOIN s ON e.user_id = s.user_id AND e.rn = s.rn + 1)
        |SELECT user_id, sess_start AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY 1, 2""".stripMargin,

    // identical to event_sessions: a streaming sessionization must be
    // indistinguishable from the batch session_window under the oracle
    "stream_sessions" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |          OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts, sum(ns) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM o)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        |FROM s GROUP BY user_id, sess""".stripMargin,

    // same floor-second time base as Spark's timestamp→long cast
    // (integer epoch_us division — no double rounding), tie-complete
    // RANGE frame, deterministic lag order
    "event_user_features" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) // 1000000 AS s
        |  FROM events)
        |SELECT event_id, user_id,
        |  count(*) OVER (PARTITION BY user_id ORDER BY s
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_prev_1h,
        |  s - lag(s) OVER (PARTITION BY user_id ORDER BY s, event_id)
        |    AS secs_since_prev
        |FROM e""".stripMargin,

    // same floor-second order base and cents scaling as the Spark side;
    // the z test is exact integer arithmetic on both engines (Spark in
    // DecimalType(38,0), DuckDB in HUGEINT via its BIGINT-sum
    // promotion) — no float mean/stddev, both exact over the
    // documented |x| domain
    "event_anomalies" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) // 1000000 AS sec,
        |         CAST(round(value * 100) AS BIGINT) AS x
        |  FROM events),
        |w AS (
        |  SELECT event_id, user_id, x,
        |    count(x) OVER f AS n, sum(x) OVER f AS sm, sum(x*x) OVER f AS sxx
        |  FROM e
        |  WINDOW f AS (PARTITION BY user_id ORDER BY sec, event_id
        |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, x AS value_cents, n AS n_base,
        |  CAST(sm AS BIGINT) AS base_sum
        |FROM w
        |WHERE n >= 8 AND (n*x - sm)*(n*x - sm) > 9*(n*sxx - sm*sm)""".stripMargin,

    "attribution_touch" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts,
        |         CAST(round(value * 100) AS BIGINT) AS cents, event_type
        |  FROM events),
        |c AS (SELECT event_id AS click_id, user_id, ts AS cts FROM e
        |      WHERE event_type = 'click'),
        |p AS (SELECT event_id AS purchase_id, user_id, ts AS pts, cents
        |      FROM e WHERE event_type = 'purchase'),
        |t AS (
        |  SELECT c.click_id, p.purchase_id, p.user_id, p.cents, c.cts
        |  FROM c JOIN p ON c.user_id = p.user_id
        |    AND p.pts >= c.cts AND p.pts < c.cts + INTERVAL 3600 SECOND),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY purchase_id
        |      ORDER BY cts ASC, click_id ASC) AS rna,
        |    row_number() OVER (PARTITION BY purchase_id
        |      ORDER BY cts DESC, click_id DESC) AS rnd
        |  FROM t)
        |SELECT purchase_id, user_id, cents AS purchase_cents,
        |  count(*) AS n_touches,
        |  CAST(max(CASE WHEN rna = 1 THEN click_id END) AS BIGINT)
        |    AS first_click_id,
        |  CAST(max(CASE WHEN rnd = 1 THEN click_id END) AS BIGINT)
        |    AS last_click_id,
        |  CAST(floor((CAST(10000.0 AS DOUBLE) * cents) / count(*))
        |    AS BIGINT) AS linear_attr_e4
        |FROM r GROUP BY purchase_id, user_id, cents""".stripMargin,

    "events_cube" ->
      """WITH e AS (
        |  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events)
        |SELECT coalesce(event_type, 'ALL') AS event_type,
        |  coalesce(day, 'ALL') AS day,
        |  CAST(grouping(event_type) AS BIGINT) AS g_type,
        |  CAST(grouping(day) AS BIGINT) AS g_day,
        |  count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM e GROUP BY CUBE(event_type, day)""".stripMargin,

    // the Bloom pregate is semantics-preserving — the oracle is the
    // plain semi-join, no filter anywhere
    "events_bloom_semijoin" ->
      """SELECT e.event_type, count(*) AS n_events,
        |  CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM events e
        |WHERE EXISTS (
        |  SELECT 1 FROM customer c
        |  WHERE c.c_custkey = e.user_id
        |    AND c.c_mktsegment = 'BUILDING')
        |GROUP BY 1""".stripMargin,

    // salting is a pure partitioning trick — the oracle is the plain
    // inner join, no salt anywhere
    "events_salted_enrich" ->
      """SELECT c.c_mktsegment, count(*) AS n_events,
        |  CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1""".stripMargin,

    "event_type_affinity" ->
      """WITH ut AS (
        |  SELECT DISTINCT user_id, event_type FROM events)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  count(*) AS n_users
        |FROM ut a JOIN ut b ON a.user_id = b.user_id
        |  AND a.event_type < b.event_type
        |GROUP BY 1, 2""".stripMargin,

    // the 5 power iterations unrolled as chained CTEs (standard SQL
    // forbids aggregation in a recursive term); every step is integer
    // division (`//`), mirroring the operator's DIV fixed-point
    "events_pagerank" -> pageRankOracleSql(
      nodesSql = "SELECT src AS id FROM e UNION SELECT dst FROM e",
      initSql =
        "SELECT CAST(1000000000 AS BIGINT) // count(*) AS i0 FROM nodes",
      r0Sql = "SELECT id, (SELECT i0 FROM init) AS rank_e9 FROM nodes",
      stepBaseSql = "(SELECT ((100 - 85) * i0) // 100 FROM init)"),

    // full-history last-writer state: the snapshot-at-cut composition
    // (batch) and the two-batch maintained version chain (stream)
    // must both collapse to exactly this
    "cdc_user_state" -> cdcStateOracle,
    "stream_cdc_user_state" -> cdcStateOracle,

    // batch 1: pre-cut minus replays, no mark yet, nothing late;
    // batch 2: post-cut plus replays, late = older than batch 1's
    // max event time minus the 1h horizon
    "stream_late_profile" ->
      """WITH f1 AS (
        |  SELECT * FROM events
        |  WHERE ts < TIMESTAMP '2024-01-15 00:00:00' AND event_id % 50 <> 0),
        |f2 AS (
        |  SELECT * FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' OR event_id % 50 = 0)
        |SELECT CAST(0 AS BIGINT) AS batch_id,
        |  (SELECT COUNT(*) FROM f1) AS n_rows,
        |  CAST(0 AS BIGINT) AS n_late,
        |  (SELECT max(ts) FROM f1) AS max_ts
        |UNION ALL
        |SELECT CAST(1 AS BIGINT),
        |  (SELECT COUNT(*) FROM f2),
        |  (SELECT COUNT(*) FROM f2
        |   WHERE ts < (SELECT max(ts) FROM f1) - INTERVAL 1 HOUR),
        |  (SELECT max(ts) FROM f2)""".stripMargin,

    // per-batch quality reports: the oracle re-derives each batch
    // from the same deterministic mid-history split and recomputes
    // every check with the operator's exact semantics (null
    // predicate = violation; uniqueness = surplus rows per key)
    "stream_quality_monitor" ->
      """WITH b AS (
        |  SELECT *, CAST(CASE WHEN ts < TIMESTAMP '2024-01-08 00:00:00'
        |    THEN 0 ELSE 1 END AS BIGINT) AS batch_id
        |  FROM events),
        |v AS (
        |  SELECT batch_id, 'not_null(user_id)' AS "check",
        |    CAST(count(CASE WHEN user_id IS NULL THEN 1 END) AS BIGINT)
        |      AS violations
        |  FROM b GROUP BY 1
        |  UNION ALL
        |  SELECT batch_id, 'satisfies(value_nonneg)',
        |    CAST(count(CASE WHEN NOT coalesce(value >= 0, false)
        |      THEN 1 END) AS BIGINT)
        |  FROM b GROUP BY 1
        |  UNION ALL
        |  SELECT batch_id, 'unique(event_id)',
        |    CAST(count(*) - count(DISTINCT (event_id)) AS BIGINT)
        |  FROM b GROUP BY 1)
        |SELECT batch_id, "check", violations,
        |  CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status
        |FROM v""".stripMargin,

    // personalized variant: same unrolled CTEs, restart mass gated to
    // the 'signup' seed (|seeds| = 1 → i0 = 10⁹)
    "events_ppr_signup" -> pageRankOracleSql(
      nodesSql = "SELECT src AS id FROM e UNION SELECT dst FROM e " +
        "UNION SELECT 'signup'",
      initSql = "SELECT CAST(1000000000 AS BIGINT) // 1 AS i0",
      r0Sql = "SELECT id, CASE WHEN id = 'signup' " +
        "THEN (SELECT i0 FROM init) ELSE 0 END AS rank_e9 FROM nodes",
      stepBaseSql = "(CASE WHEN n.id = 'signup' THEN " +
        "(SELECT ((100 - 85) * i0) // 100 FROM init) ELSE 0 END)"),

    "events_kanon_release" ->
      """SELECT event_type,
        |  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  CAST(user_id % 10 AS VARCHAR) AS user_bucket,
        |  count(DISTINCT user_id) AS n_contributors,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM events
        |GROUP BY 1, 2, 3
        |HAVING count(DISTINCT user_id) >= 5""".stripMargin,

    // the interval semantics reduce to "purchases at or before the
    // click" — the correlated form DuckDB decorrelates into a join
    "scd_click_level" ->
      """WITH c AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
        |lv AS (
        |  SELECT c.user_id, c.ts,
        |    (SELECT count(*) FROM p
        |     WHERE p.user_id = c.user_id AND p.ts <= c.ts) AS level
        |  FROM c)
        |SELECT level, count(*) AS n_clicks FROM lv GROUP BY 1""".stripMargin,

    // identical to scd_click_level: the stream-static enrichment must
    // be indistinguishable from the batch point-in-time read
    "stream_scd_click_level" ->
      """WITH c AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
        |lv AS (
        |  SELECT c.user_id, c.ts,
        |    (SELECT count(*) FROM p
        |     WHERE p.user_id = c.user_id AND p.ts <= c.ts) AS level
        |  FROM c)
        |SELECT level, count(*) AS n_clicks FROM lv GROUP BY 1""".stripMargin,

    "series_lag_profile" ->
      """WITH e AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
        |days AS (SELECT DISTINCT day FROM e),
        |a AS (
        |  SELECT d.day, coalesce(x.c, 0) AS ca FROM days d
        |  LEFT JOIN (SELECT day, count(*) AS c FROM e
        |             WHERE event_type = 'click' GROUP BY 1) x
        |    ON x.day = d.day),
        |b AS (
        |  SELECT d.day AS bday, coalesce(x.c, 0) AS cb FROM days d
        |  LEFT JOIN (SELECT day, count(*) AS c FROM e
        |             WHERE event_type = 'purchase' GROUP BY 1) x
        |    ON x.day = d.day),
        |lags AS (SELECT unnest(range(-3, 4)) AS lag),
        |j AS (
        |  SELECT l.lag, a.ca, b.cb
        |  FROM a CROSS JOIN lags l
        |  JOIN b ON b.bday = a.day + to_days(CAST(l.lag AS INT)))
        |SELECT CAST(lag AS BIGINT) AS lag, count(*) AS n_days,
        |  CAST(count(*) * sum(ca * cb) - sum(ca) * sum(cb) AS BIGINT)
        |    AS cov_num
        |FROM j GROUP BY 1""".stripMargin,

    "series_similarity" ->
      """WITH cnt AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |users AS (SELECT DISTINCT user_id FROM cnt),
        |days AS (SELECT DISTINCT day FROM cnt),
        |dense AS (
        |  SELECT u.user_id, d.day, coalesce(c.c, 0) AS c
        |  FROM users u CROSS JOIN days d
        |  LEFT JOIN cnt c ON c.user_id = u.user_id AND c.day = d.day),
        |q AS (SELECT day, c AS qc FROM dense WHERE user_id = 7)
        |SELECT user_id,
        |  CAST(sum((dense.c - q.qc) * (dense.c - q.qc)) AS BIGINT) AS dist2
        |FROM dense JOIN q USING (day)
        |WHERE user_id <> 7
        |GROUP BY 1
        |ORDER BY dist2 ASC, user_id ASC
        |LIMIT 5""".stripMargin,

    "rolling_wau" ->
      """WITH du AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |days AS (SELECT DISTINCT day FROM du),
        |fan AS (
        |  SELECT du.user_id,
        |    du.day + to_days(CAST(o.off AS INT)) AS day
        |  FROM du CROSS JOIN (SELECT unnest(range(0, 7)) AS off) o)
        |SELECT CAST(CAST(f.day AS DATE) AS VARCHAR) AS day,
        |  count(DISTINCT f.user_id) AS wau
        |FROM fan f JOIN days d ON d.day = f.day
        |GROUP BY 1""".stripMargin,

    "events_unpivot" ->
      """WITH d AS (
        |  SELECT DISTINCT CAST(CAST(ts AS DATE) AS VARCHAR) AS day
        |  FROM events),
        |t(event_type) AS (VALUES
        |  ('click'), ('view'), ('purchase'), ('signup'), ('error')),
        |c AS (
        |  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT d.day, t.event_type,
        |  CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
        |FROM d CROSS JOIN t
        |LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type""".stripMargin,

    "events_pivot" ->
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
        |FROM events GROUP BY 1""".stripMargin,

    // exact HUGEINT cross-products, one double conversion at the end
    "series_autocov" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) // 1000000 AS sec, event_id,
        |         CAST(round(value * 100) AS BIGINT) AS x
        |  FROM events),
        |p AS (
        |  SELECT event_type, x, lag(x) OVER (PARTITION BY event_type
        |    ORDER BY sec, event_id) AS xprev
        |  FROM e),
        |a AS (
        |  SELECT event_type, count(*) AS n_pairs, sum(x * xprev) AS sxy,
        |         sum(x) AS sx, sum(xprev) AS sy
        |  FROM p WHERE xprev IS NOT NULL GROUP BY 1)
        |SELECT event_type, n_pairs,
        |  CAST(floor(CAST(100.0 AS DOUBLE) *
        |    (CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
        |      (CAST(n_pairs AS DOUBLE) * CAST(n_pairs AS DOUBLE))))
        |    AS BIGINT) AS autocov_e2
        |FROM a""".stripMargin,

    // exact low-median rank picks; pure integer outlier compare
    "events_mad_outliers" ->
      """WITH e AS (
        |  SELECT event_type, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |r1 AS (
        |  SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY v, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM e),
        |med AS (
        |  SELECT event_type,
        |    max(CASE WHEN rn = (n - 1) * 50 // 100 + 1 THEN v END)
        |      AS med_cents
        |  FROM r1 GROUP BY 1),
        |r2 AS (
        |  SELECT e.event_type, abs(e.v - med.med_cents) AS ad,
        |    row_number() OVER (PARTITION BY e.event_type
        |      ORDER BY abs(e.v - med.med_cents), e.event_id) AS rn,
        |    count(*) OVER (PARTITION BY e.event_type) AS n
        |  FROM e JOIN med USING (event_type)),
        |mad AS (
        |  SELECT event_type,
        |    max(CASE WHEN rn = (n - 1) * 50 // 100 + 1 THEN ad END)
        |      AS mad_cents
        |  FROM r2 GROUP BY 1)
        |SELECT e.event_type, count(*) AS n_events,
        |  max(med.med_cents) AS med_cents,
        |  max(mad.mad_cents) AS mad_cents,
        |  CAST(sum(CASE WHEN abs(e.v - med.med_cents) >
        |    5 * mad.mad_cents THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM e JOIN med USING (event_type) JOIN mad USING (event_type)
        |GROUP BY 1""".stripMargin,

    // rank-picked exact percentile bounds, integer clip arithmetic
    "events_winsorized" ->
      """WITH e AS (
        |  SELECT event_type, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |rk AS (
        |  SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY v, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM e),
        |b AS (
        |  SELECT event_type,
        |    max(CASE WHEN rn = (n - 1) * 1 // 100 + 1 THEN v END) AS lo,
        |    max(CASE WHEN rn = (n - 1) * 99 // 100 + 1 THEN v END) AS hi
        |  FROM rk GROUP BY 1)
        |SELECT e.event_type, count(*) AS n_events,
        |  CAST(sum(CASE WHEN e.v < b.lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clipped_lo,
        |  CAST(sum(CASE WHEN e.v > b.hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clipped_hi,
        |  CAST(sum(e.v) AS BIGINT) AS sum_raw_cents,
        |  CAST(sum(greatest(b.lo, least(b.hi, e.v))) AS BIGINT)
        |    AS sum_wins_cents
        |FROM e JOIN b USING (event_type)
        |GROUP BY 1""".stripMargin,

    // exact HUGEINT cross-products, one terminal double division;
    // dayofweek is 0=Sunday on both sides (Spark shifts by −1)
    "series_seasonality" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, count(*) AS n_days, sum(y) AS sy
        |  FROM daily GROUP BY 1),
        |bd AS (
        |  SELECT event_type, CAST(dayofweek(d) AS BIGINT) AS dow,
        |    count(*) AS n, sum(y) AS sw
        |  FROM daily GROUP BY 1, 2)
        |SELECT bd.event_type, bd.dow, bd.n,
        |  CAST(floor(CAST(10000.0 AS DOUBLE) *
        |    (CAST(bd.sw * tot.n_days - tot.sy * bd.n AS DOUBLE) /
        |     CAST(bd.n * tot.n_days AS DOUBLE))) AS BIGINT) AS dev_e4
        |FROM bd JOIN tot USING (event_type)""".stripMargin,

    // exact HUGEINT cents·seconds integral, one terminal double
    // division with identical operands on both engines
    "series_twa" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS sec,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events
        |  WHERE user_id < 40 AND ts < TIMESTAMP '2024-02-01 00:00:00'),
        |hold AS (
        |  SELECT user_id, v, sec,
        |    coalesce(lead(sec) OVER (PARTITION BY user_id
        |      ORDER BY sec, event_id),
        |      epoch(TIMESTAMP '2024-02-01 00:00:00')) AS nxt
        |  FROM e),
        |a AS (
        |  SELECT user_id, count(*) AS n_samples, min(sec) AS t0,
        |    sum(v * (nxt - sec)) AS integral
        |  FROM hold GROUP BY 1)
        |SELECT user_id, n_samples,
        |  CAST(floor(CAST(100.0 AS DOUBLE) *
        |    (CAST(integral AS DOUBLE) /
        |     CAST(epoch(TIMESTAMP '2024-02-01 00:00:00') - t0 AS DOUBLE)))
        |    AS BIGINT) AS twa_e2
        |FROM a""".stripMargin,

    // closed-form OLS from exact HUGEINT cross-products; the two
    // double divisions use identical exact operands on both engines
    "series_trend" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(floor((epoch_us(ts) // 1000000) / 86400) AS BIGINT)
        |      AS day_idx,
        |    count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |a AS (
        |  SELECT event_type, count(*) AS n_days,
        |    sum(day_idx) AS sx, sum(y) AS sy,
        |    sum(day_idx * y) AS sxy, sum(day_idx * day_idx) AS sxx
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n_days,
        |  CAST(floor(CAST(1000000.0 AS DOUBLE) *
        |    (CAST(n_days * sxy - sx * sy AS DOUBLE) /
        |     CAST(n_days * sxx - sx * sx AS DOUBLE))) AS BIGINT)
        |    AS slope_e6,
        |  CAST(floor(CAST(100.0 AS DOUBLE) *
        |    (CAST(sy * sxx - sx * sxy AS DOUBLE) /
        |     CAST(n_days * sxx - sx * sx AS DOUBLE))) AS BIGINT)
        |    AS intercept_e2
        |FROM a WHERE n_days >= 2""".stripMargin,

    // the routed twin serves the SAME oracle — routed ≡ raw is the gate
    "series_trend_routed" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(floor((epoch_us(ts) // 1000000) / 86400) AS BIGINT)
        |      AS day_idx,
        |    count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |a AS (
        |  SELECT event_type, count(*) AS n_days,
        |    sum(day_idx) AS sx, sum(y) AS sy,
        |    sum(day_idx * y) AS sxy, sum(day_idx * day_idx) AS sxx
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n_days,
        |  CAST(floor(CAST(1000000.0 AS DOUBLE) *
        |    (CAST(n_days * sxy - sx * sy AS DOUBLE) /
        |     CAST(n_days * sxx - sx * sx AS DOUBLE))) AS BIGINT)
        |    AS slope_e6,
        |  CAST(floor(CAST(100.0 AS DOUBLE) *
        |    (CAST(sy * sxx - sx * sxy AS DOUBLE) /
        |     CAST(n_days * sxx - sx * sx AS DOUBLE))) AS BIGINT)
        |    AS intercept_e2
        |FROM a WHERE n_days >= 2""".stripMargin,

    // Horner fold ≡ Σ l[i]·2^(len−i) (1-based); numerator/denominator
    // exact BIGINTs, one double division with identical operands
    "event_ewma" -> ewmaSql,

    "stream_ewma" -> ewmaSql,

    // the streaming twin serves the SAME oracle as the batch windows
    "stream_user_features" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) // 1000000 AS s
        |  FROM events)
        |SELECT event_id, user_id,
        |  count(*) OVER (PARTITION BY user_id ORDER BY s
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_prev_1h,
        |  s - lag(s) OVER (PARTITION BY user_id ORDER BY s, event_id)
        |    AS secs_since_prev
        |FROM e""".stripMargin,

    // the streaming twin serves the SAME oracle as the batch window
    // query — batch/stream equivalence is the gate, like stream_sessions
    "stream_anomalies" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) // 1000000 AS sec,
        |         CAST(round(value * 100) AS BIGINT) AS x
        |  FROM events),
        |w AS (
        |  SELECT event_id, user_id, x,
        |    count(x) OVER f AS n, sum(x) OVER f AS sm, sum(x*x) OVER f AS sxx
        |  FROM e
        |  WINDOW f AS (PARTITION BY user_id ORDER BY sec, event_id
        |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, x AS value_cents, n AS n_base,
        |  CAST(sm AS BIGINT) AS base_sum
        |FROM w
        |WHERE n >= 8 AND (n*x - sm)*(n*x - sm) > 9*(n*sxx - sm*sm)""".stripMargin,

    "ts_routed_sql" ->
      """SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
        |  min(CAST(round(value * 100) AS BIGINT)) AS min_cents,
        |  max(CAST(round(value * 100) AS BIGINT)) AS max_cents
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-20 00:00:00'
        |GROUP BY ALL""".stripMargin,

    // avg recomputed as exact-integer-sum / count so both engines run
    // the same IEEE division (DuckDB's avg() aggregation order is not
    // pinned; sum over BIGINT is)
    "ts_routed_avg" ->
      """SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |  count(value) AS n_vals,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) /
        |    CAST(count(value) AS DOUBLE) AS avg_cents
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-12 00:00:00'
        |GROUP BY ALL""".stripMargin,

    // exact daily distincts + the sketch-estimate verdict: the oracle
    // recomputes the exact side and pins the verdict at TRUE — a
    // sketch drifting past the 5% band fails the hash compare
    "ts_distinct_sketch" ->
      """SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |  count(DISTINCT user_id) AS value, TRUE AS within_5pct
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-12 00:00:00'
        |GROUP BY 1, 2""".stripMargin,

    // exact index-selection percentiles over the same scan, verdicts
    // pinned TRUE — the sketch estimates must land in the rank band
    "ts_pct_sketch" ->
      """WITH t AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-10 00:00:00'),
        |rk AS (
        |  SELECT event_type, bucket, cents,
        |    row_number() OVER (PARTITION BY event_type, bucket
        |      ORDER BY cents) AS rn,
        |    count(*) OVER (PARTITION BY event_type, bucket) AS n
        |  FROM t)
        |SELECT event_type, bucket, CAST(max(n) AS BIGINT) AS n_rows,
        |  max(CASE WHEN rn = (n - 1) * 50 // 100 + 1 THEN cents END) AS p50,
        |  max(CASE WHEN rn = (n - 1) * 90 // 100 + 1 THEN cents END) AS p90,
        |  max(CASE WHEN rn = (n - 1) * 99 // 100 + 1 THEN cents END) AS p99,
        |  TRUE AS ok50, TRUE AS ok90, TRUE AS ok99
        |FROM rk GROUP BY event_type, bucket""".stripMargin,

    // identical to ts_pct_sketch: the streaming-maintained KLL store's
    // cross-batch merged estimates face the same exact percentiles and
    // rank-band verdicts
    "ts_stream_pct_sketch" ->
      s"""WITH t AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-10 00:00:00'),
        |rk AS (
        |  SELECT event_type, bucket, cents,
        |    row_number() OVER (PARTITION BY event_type, bucket
        |      ORDER BY cents) AS rn,
        |    count(*) OVER (PARTITION BY event_type, bucket) AS n
        |  FROM t)
        |SELECT event_type, bucket, CAST(max(n) AS BIGINT) AS n_rows,
        |  max(CASE WHEN rn = (n - 1) * 50 // 100 + 1 THEN cents END) AS p50,
        |  max(CASE WHEN rn = (n - 1) * 90 // 100 + 1 THEN cents END) AS p90,
        |  max(CASE WHEN rn = (n - 1) * 99 // 100 + 1 THEN cents END) AS p99,
        |  TRUE AS ok50, TRUE AS ok90, TRUE AS ok99
        |FROM rk GROUP BY event_type, bucket""".stripMargin,

    // exact over the complete replayed history + the pinned verdict
    "ts_stream_distinct_sketch" ->
      """SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |  count(DISTINCT user_id) AS value, TRUE AS within_5pct
        |FROM events
        |GROUP BY 1, 2""".stripMargin,

    // routed ≡ raw for the histogram read: same bucketing algebra and
    // aligned range as ts_hist (the Spark side scans the registered
    // hist partials, the oracle recomputes from raw events)
    "ts_routed_hist" ->
      s"""SELECT event_type,
         |  CAST(LEAST(GREATEST(FLOOR(value / 20), 0), 9) AS BIGINT) * 20 AS hist_bucket,
         |  count(*) AS value
         |FROM events
         |WHERE ts >= TIMESTAMP '${lo("2024-01-01T00:00")}'
         |  AND ts < TIMESTAMP '${hi("2024-01-31T00:00")}'
         |GROUP BY ALL""".stripMargin,

    // the day-tier histogram must be exactly the raw per-day histogram
    "ts_routed_hist_day" ->
      """SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |  CAST(LEAST(GREATEST(FLOOR(value / 20), 0), 9) AS BIGINT) * 20 AS hist_bucket,
        |  count(*) AS value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-12 00:00:00'
        |GROUP BY ALL""".stripMargin,

    "ts_routed_unaligned" ->
      """SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05 00:07:00'
        |  AND ts < TIMESTAMP '2024-01-09 00:00:00'
        |GROUP BY ALL""".stripMargin,

    // identical to ts_counter_hour_fill: a streaming-maintained rollup
    // must be indistinguishable from batch compute-on-read
    "ts_stream_maintained_fill" -> fillOracle(
      where = "event_type = 'click'",
      bucketExpr = "date_trunc('hour', ts)",
      gridStart = "2024-01-05 00:00:00", gridStop = "2024-01-06 23:00:00",
      gridStep = "1 HOUR",
      loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-07T00:00")),

    // identical to ts_counter_hour_fill: the rollup path must be
    // indistinguishable from compute-on-read
    "rollup_audit_distinct" ->
      """WITH e AS (
        |  SELECT event_type, user_id,
        |    make_timestamp((epoch_us(ts) // 1000000 // 900 * 900) * 1000000)
        |      AS bucket
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-12 00:15:00'),
        |b AS (SELECT event_type, bucket, user_id FROM e GROUP BY 1, 2, 3)
        |SELECT CAST(CAST(bucket AS DATE) AS VARCHAR) AS bucket_date,
        |  count(*) AS n_rows, CAST(0 AS BIGINT) AS n_mismatched
        |FROM b GROUP BY 1""".stripMargin,

    // one UNION ALL branch per candidate: the would-be rollup row
    // count is the distinct (dims, slice) combinations
    "rollup_advisor" ->
      """WITH base AS (
        |  SELECT event_type, CAST(user_id % 10 AS VARCHAR) AS user_bucket,
        |    make_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT)
        |      * 1000000) AS bucket
        |  FROM events),
        |tot AS (SELECT COUNT(*) AS n FROM base)
        |SELECT grouping, n_series_slices, n_events,
        |  CAST((10000 * n_events) // n_series_slices AS BIGINT)
        |    AS compaction_e4
        |FROM (
        |  SELECT 'event_type' AS grouping, COUNT(*) AS n_series_slices,
        |    (SELECT n FROM tot) AS n_events
        |  FROM (SELECT DISTINCT event_type, bucket FROM base)
        |  UNION ALL
        |  SELECT 'user_bucket', COUNT(*), (SELECT n FROM tot)
        |  FROM (SELECT DISTINCT user_bucket, bucket FROM base)
        |  UNION ALL
        |  SELECT 'event_type,user_bucket', COUNT(*), (SELECT n FROM tot)
        |  FROM (SELECT DISTINCT event_type, user_bucket, bucket FROM base)
        |)""".stripMargin,

    // healthy store: per date the distinct (event_type, slice) bucket
    // count with zero mismatches — the range mirrors eventsRanged's
    // [floor(start), floor(finish)+slice) window
    "rollup_audit" ->
      """WITH e AS (
        |  SELECT event_type,
        |    make_timestamp((epoch_us(ts) // 1000000 // 900 * 900) * 1000000)
        |      AS bucket
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-07 00:15:00'),
        |b AS (SELECT event_type, bucket FROM e GROUP BY 1, 2)
        |SELECT CAST(CAST(bucket AS DATE) AS VARCHAR) AS bucket_date,
        |  count(*) AS n_buckets, CAST(0 AS BIGINT) AS n_mismatched
        |FROM b GROUP BY 1""".stripMargin,

    "ts_rollup_hour_fill" -> fillOracle(
      where = "event_type = 'click'",
      bucketExpr = "date_trunc('hour', ts)",
      gridStart = "2024-01-05 00:00:00", gridStop = "2024-01-06 23:00:00",
      gridStep = "1 HOUR",
      loTs = lo("2024-01-05T00:00"), hiTs = hi("2024-01-07T00:00")))
}
