package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, Quality, TextAnalysis}

/** The pipeline plane's SQL CONSUMPTION surface — session views for
  * notebook/BI users who speak `spark.sql` text, not Scala.
  *
  * `spark.sql.extensions=graft.GraftExtensions` injects the engine's
  * scalar functions and the rollup-routing rule at session build, but
  * the pipeline READS (dedup rate, quality gates, BM25 retrieval) are
  * whole-table operators over session data — they cannot exist before
  * the data is named. These installers are the one-line bridge: each
  * registers the operator's DataFrame as a temp view, after which the
  * read is plain SQL (`SELECT * FROM graft_dedup_rate_by_source`),
  * composable with the rest of the user's SQL (joins, filters, CTEs)
  * and optimizer-transparent — a view is its logical plan, so filters
  * the user writes on top push straight down into the operator's scan.
  *
  * Each view is the VERBATIM Scala read (the `*_sql` driver twins
  * share the Scala forms' DuckDB oracles), so the SQL surface can
  * never drift from the library surface. */
object PipelineViews {

  /** [[Dedup.rateBySource]] as the `graft_dedup_rate_by_source` view:
    * per source, docs / distinct contents / dup_e4. */
  def installDedupRate(spark: SparkSession, docs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      sourceCol: String = "source",
      name: String = "graft_dedup_rate_by_source"): Unit =
    Dedup.rateBySource(docs, textCol, idCol, sourceCol)
      .createOrReplaceTempView(name)

  /** [[Quality.report]] as the `graft_quality_report` view: one row
    * per declared constraint with its violation count and pass/fail
    * status — the release gate a SQL dashboard polls. */
  def installQualityReport(spark: SparkSession, df: DataFrame,
      constraints: Seq[Quality.Constraint],
      name: String = "graft_quality_report"): Unit =
    Quality.report(df, constraints).createOrReplaceTempView(name)

  /** [[graft.TimeSeriesService.getTimeseries]] — the tier-routed,
    * zero-filled calendar read (O13–O20) — as the `graft_timeseries`
    * view: the BI gap-filled series from pure SQL text
    * (`SELECT event_type, bucket, value FROM graft_timeseries`).
    *
    * The view is the read's LOGICAL PLAN, so everything the Scala call
    * decides survives into SQL untouched: rollup-tier routing (the
    * plan scans registered partials, never raw events, whenever one
    * serves), partition-pruned scans, the dense finish-exclusive grid.
    * User predicates written over the view push down into that plan.
    * One view per (fact, dim, filters, range, step) read — views are
    * cheap named plans, not materializations, so a dashboard installs
    * one per tile exactly as it would hold one DataFrame per tile. */
  def installTimeseries(spark: SparkSession,
      svc: graft.TimeSeriesService, factId: String, dimId: String,
      filters: Map[String, Option[String]],
      start: java.sql.Timestamp, finish: java.sql.Timestamp,
      step: graft.model.Step = graft.model.Step.NoStep,
      offsetHours: Int = 0, name: String = "graft_timeseries"): Unit =
    svc.getTimeseries(factId, dimId, filters, start, finish, step,
      offsetHours).createOrReplaceTempView(name)

  /** [[graft.TimeSeriesService.getTimeseriesMulti]] — the tier-routed
    * multi-fact dashboard read — as the `graft_timeseries_multi` view:
    * every dashboard tile from one pure-SQL select. Same
    * plan-is-the-view transparency as [[installTimeseries]]: facts
    * with registered rollups keep serving from their partials (the
    * no-event-scan dashboard) under the SQL text. */
  def installTimeseriesMulti(spark: SparkSession,
      svc: graft.TimeSeriesService, factIds: Seq[String], dimId: String,
      filters: Map[String, Option[String]],
      start: java.sql.Timestamp, finish: java.sql.Timestamp,
      step: graft.model.Step = graft.model.Step.NoStep,
      offsetHours: Int = 0,
      name: String = "graft_timeseries_multi"): Unit =
    svc.getTimeseriesMulti(factIds, dimId, filters, start, finish, step,
      offsetHours).createOrReplaceTempView(name)

  /** The PER-TILE-FILTERED dashboard (the tiles overload of
    * [[graft.TimeSeriesService.getTimeseriesMulti]]) as the same SQL
    * view — clicks WHERE type='click' beside an unfiltered spend
    * total, one view, pure SQL consumption; agreeing tiles keep their
    * shared per-type scan under the text exactly as in Scala. */
  def installTimeseriesMultiTiles(spark: SparkSession,
      svc: graft.TimeSeriesService,
      tiles: Seq[(String, String, Map[String, Option[String]])],
      start: java.sql.Timestamp, finish: java.sql.Timestamp,
      step: graft.model.Step = graft.model.Step.NoStep,
      offsetHours: Int = 0,
      name: String = "graft_timeseries_multi"): Unit =
    svc.getTimeseriesMulti(tiles, start, finish, step, offsetHours)
      .createOrReplaceTempView(name)

  /** The PARAMETERIZED window read: [[installTimeseries]] bakes
    * (start, finish, step) into the view at install time — a BI user
    * can move filters over the view but not the window. This installs
    * a SQL TABLE FUNCTION instead, so the window moves in pure SQL
    * text with no Scala re-install:
    *
    * {{{
    *   SELECT * FROM graft_timeseries_window(
    *     TIMESTAMP '2024-01-05 00:00:00', TIMESTAMP '2024-01-06 00:00:00')
    * }}}
    *
    * The function body IS the routed read's pipeline as SQL text over
    * a window-free slice-partials view
    * ([[graft.TimeSeriesService.routedSlicePartials]]): inclusive
    * slice-bucketed scan bounds (`graft_slice`, the [[SqlSurface]]
    * mirror of the Scala kernel), calendar collapse (non-ISO week via
    * `graft_week`), and the start-inclusive finish-EXCLUSIVE dense
    * grid with the fact's filler — the driver-gated `ts_window_sql`
    * twin shares the Scala read's fill oracle per window, so this
    * surface cannot drift. Spark inlines the body at invocation with
    * the call's literals, so the scan bounds constant-fold and the
    * partials store prunes its `bucket_date` partitions per call.
    *
    * Serving tier: the registered rollup's SLICE partials when one
    * exists (an external store unions local partials), else partials
    * from raw events — and, when the routed rollup carries a DAY
    * tier, the body routes per call: a midnight-aligned window at a
    * day-or-coarser step scans the day store (~96× fewer rows — a
    * year-long windowed SQL read no longer pays the slice-tier scan
    * the Scala read routes around), any other window keeps the
    * slice branch. The tier choice is the SAME [[graft
    * .TimeSeriesService]] day-eligibility rule, made IN SQL by an
    * alignment predicate over the call's literal bounds — it
    * constant-folds at invocation, so the losing branch's scan is
    * optimized away entirely (PlanAuditSpec pins both plans).
    *
    * FRESHNESS: the serving source is re-routed automatically — the
    * installer registers a re-install hook with the service, so any
    * later ingest (which invalidates internal rollups for Scala
    * reads) re-installs this function over the then-current tier
    * instead of leaving it silently serving the stale rollup
    * parquet. Dropping the service without dropping the function
    * leaves the last-installed snapshot, like any baked view.
    *
    * Counter / Distinct / Average facts; the step is baked per install
    * (a grid interval cannot be a runtime parameter of one SQL body —
    * install one function per step a dashboard needs). Histograms
    * have their own windowed twin, [[installHistogramWindow]]
    * (no grid: histograms never gap-fill). */
  def installTimeseriesWindow(spark: SparkSession,
      svc: graft.TimeSeriesService, factId: String, dimId: String,
      filters: Map[String, Option[String]],
      step: graft.model.Step, offsetHours: Int = 0,
      name: String = "graft_timeseries_window"): Unit = {
    import graft.model.{FactType, Step}
    require(step != Step.NoStep,
      "installTimeseriesWindow needs a calendar step (the windowed " +
        "grid is the point); use installTimeseries for :all reads")
    graft.functions.SqlSurface.register(spark)
    val (fact, slice, grouping, partials, dayPartials) =
      svc.routedWindowSources(factId, dimId, filters)
    val src = s"__graft_win_src_$name"
    partials.createOrReplaceTempView(src)
    // day branch: step ≥ day and unshifted, decided per call by the
    // alignment of the literal window (mirrors dayTierEligible)
    val daySrc = dayPartials.collect {
      case day if offsetHours == 0 && (step match {
          case Step.Day | Step.Week | Step.Month | Step.Year => true
          case _ => false }) =>
        val v = s"__graft_win_day_$name"
        day.createOrReplaceTempView(v)
        v
    }
    svc.registerSqlRefresher(name)(() => installTimeseriesWindow(
      spark, svc, factId, dimId, filters, step, offsetHours, name))
    val dims = grouping.map(d => s"`$d`").mkString(", ")
    val nonNull = grouping.map(d => s"`$d` IS NOT NULL").mkString(" AND ")
    val eq = filters.collect {
      case (k, Some(v)) if grouping.contains(k) =>
        s" AND `$k` = '${v.replace("'", "''")}'"
    }.mkString
    val shifted =
      if (offsetHours == 0) "bucket"
      else s"timestamp_seconds(unix_timestamp(bucket) + ${offsetHours * 3600L})"
    val bucketExpr = step match {
      case Step.Hour => s"date_trunc('HOUR', $shifted)"
      case Step.Day => s"date_trunc('DAY', $shifted)"
      case Step.Week => s"graft_week($shifted)"
      case Step.Month => s"date_trunc('MONTH', $shifted)"
      case Step.Year => s"date_trunc('YEAR', $shifted)"
      case Step.NoStep => throw new IllegalStateException
    }
    val gridInterval = step match {
      case Step.Hour => "INTERVAL 1 HOUR"
      case Step.Day => "INTERVAL 1 DAY"
      case Step.Week => "INTERVAL 7 DAY"
      case Step.Month => "INTERVAL 1 MONTH"
      case Step.Year => "INTERVAL 1 YEAR"
      case Step.NoStep => throw new IllegalStateException
    }
    val loB = s"graft_slice(win_start, $slice)"
    val hiB = s"graft_slice(win_finish, $slice) + INTERVAL $slice MINUTE"
    val (retMeas, aggSel, fillSel, measCols) = fact.ftype match {
      case FactType.Counter => ("value BIGINT",
        "sum(value) AS value",
        s"coalesce(s.value, ${fact.filler}L) AS value", "value")
      case FactType.Distinct => ("value BIGINT",
        // tall dval partials: exact distinct re-collapses from the
        // retained values, never from per-slice scalars (the day
        // tier retains dval too — coarsening is grain-lossless here)
        "count(DISTINCT dval) AS value",
        s"coalesce(s.value, ${fact.filler}L) AS value", "dval")
      case FactType.Average => ("counter BIGINT, total BIGINT",
        "sum(counter) AS counter, sum(total) AS total",
        "coalesce(s.counter, 0L) AS counter, " +
          "coalesce(s.total, 0L) AS total", "counter, total")
      case FactType.Histogram => throw new IllegalArgumentException(
        "installTimeseriesWindow does not cover histogram facts — " +
          "histograms never gap-fill; use installHistogram")
    }
    val dimCols = grouping.map(d => s"`$d` STRING").mkString(", ")
    val joinOn = grouping.map(d => s"s.`$d` = series.`$d`")
      .mkString(" AND ")
    val scanPred =
      s"""bucket_date BETWEEN to_date($loB)
         |      AND to_date($hiB - INTERVAL 1 MICROSECOND)
         |    AND bucket >= $loB AND bucket < $hiB
         |    AND $nonNull$eq""".stripMargin
    // the per-call tier decision: both window bounds land on UTC
    // midnights after slice-bucketing — a pure expression of the
    // call's literals, so it constant-folds and the losing branch's
    // scan is removed from the plan entirely
    val aligned = s"($loB = date_trunc('DAY', $loB) " +
      s"AND $hiB = date_trunc('DAY', $hiB))"
    val rows = daySrc match {
      case Some(day) =>
        s"""SELECT $dims, bucket, $measCols FROM $src
           |  WHERE NOT $aligned AND $scanPred
           |  UNION ALL
           |  SELECT $dims, bucket, $measCols FROM $day
           |  WHERE $aligned AND $scanPred""".stripMargin
      case None =>
        s"""SELECT $dims, bucket, $measCols FROM $src
           |  WHERE $scanPred""".stripMargin
    }
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION $name(
         |    win_start TIMESTAMP, win_finish TIMESTAMP)
         |RETURNS TABLE ($dimCols, bucket TIMESTAMP, $retMeas)
         |RETURN
         |WITH rows_in AS (
         |  $rows),
         |scanned AS (
         |  SELECT $dims, $bucketExpr AS bucket, $aggSel
         |  FROM rows_in
         |  GROUP BY ALL),
         |grid AS (SELECT explode(filter(sequence(win_start,
         |    greatest(win_start, win_finish), $gridInterval),
         |    x -> x < win_finish)) AS bucket),
         |series AS (SELECT DISTINCT $dims FROM scanned)
         |SELECT ${grouping.map(d => s"series.`$d`").mkString(", ")},
         |  grid.bucket, $fillSel
         |FROM series CROSS JOIN grid
         |LEFT JOIN scanned s
         |  ON $joinOn AND s.bucket = grid.bucket""".stripMargin)
  }

  /** The HISTOGRAM twin of [[installTimeseriesWindow]]: the O21
    * value-distribution read as a SQL table function whose window
    * moves in pure SQL text. Histograms never gap-fill, so the body is
    * scan + per-(series × hist_bucket) sum over the window-free
    * slice-partials view — the TALL (dims…, bucket, hist_bucket,
    * value) rows [[graft.TimeSeriesService.routedSlicePartials]]
    * serves, rollup-registered or raw-built. `:all` (NoStep) time-axis
    * semantics, matching `getHistogram`'s default; calendar-stepped
    * histogram series keep the Scala surface. */
  def installHistogramWindow(spark: SparkSession,
      svc: graft.TimeSeriesService, factId: String, dimId: String,
      filters: Map[String, Option[String]],
      name: String = "graft_histogram_window"): Unit = {
    graft.functions.SqlSurface.register(spark)
    val (fact, slice, grouping, partials, dayPartials) =
      svc.routedWindowSources(factId, dimId, filters)
    require(fact.ftype == graft.model.FactType.Histogram,
      s"installHistogramWindow: fact $factId is not a histogram")
    val src = s"__graft_hwin_src_$name"
    partials.createOrReplaceTempView(src)
    // :all semantics are day-eligible whenever the literal window
    // aligns (the Scala read's dayTierEligible includes NoStep), so
    // the day branch needs no step gate here — hist_bucket is a
    // retained key of the day tier, coarsening is grain-lossless
    val daySrc = dayPartials.map { day =>
      val v = s"__graft_hwin_day_$name"
      day.createOrReplaceTempView(v)
      v
    }
    svc.registerSqlRefresher(name)(() => installHistogramWindow(
      spark, svc, factId, dimId, filters, name))
    val dims = grouping.map(d => s"`$d`").mkString(", ")
    val nonNull = grouping.map(d => s"`$d` IS NOT NULL").mkString(" AND ")
    val eq = filters.collect {
      case (k, Some(v)) if grouping.contains(k) =>
        s" AND `$k` = '${v.replace("'", "''")}'"
    }.mkString
    val loB = s"graft_slice(win_start, $slice)"
    val hiB = s"graft_slice(win_finish, $slice) + INTERVAL $slice MINUTE"
    val dimCols = grouping.map(d => s"`$d` STRING").mkString(", ")
    val scanPred =
      s"""bucket_date BETWEEN to_date($loB)
         |    AND to_date($hiB - INTERVAL 1 MICROSECOND)
         |  AND bucket >= $loB AND bucket < $hiB
         |  AND $nonNull$eq""".stripMargin
    val aligned = s"($loB = date_trunc('DAY', $loB) " +
      s"AND $hiB = date_trunc('DAY', $hiB))"
    val rows = daySrc match {
      case Some(day) =>
        s"""SELECT $dims, hist_bucket, value FROM $src
           |  WHERE NOT $aligned AND $scanPred
           |  UNION ALL
           |  SELECT $dims, hist_bucket, value FROM $day
           |  WHERE $aligned AND $scanPred""".stripMargin
      case None =>
        s"""SELECT $dims, hist_bucket, value FROM $src
           |  WHERE $scanPred""".stripMargin
    }
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION $name(
         |    win_start TIMESTAMP, win_finish TIMESTAMP)
         |RETURNS TABLE ($dimCols, hist_bucket BIGINT, value BIGINT)
         |RETURN
         |SELECT $dims, hist_bucket, sum(value) AS value
         |FROM (
         |  $rows)
         |GROUP BY ALL""".stripMargin)
  }

  /** [[graft.TimeSeriesService.getHistogram]] (O21) as the
    * `graft_histogram` view: per-series value-distribution counts —
    * and, through plain SQL on top, any percentile/CDF-style read the
    * dashboard derives from them. Rollup-served when the histogram's
    * tall partials are registered, exactly like the Scala call. */
  def installHistogram(spark: SparkSession,
      svc: graft.TimeSeriesService, factId: String, dimId: String,
      filters: Map[String, Option[String]],
      start: java.sql.Timestamp, finish: java.sql.Timestamp,
      step: graft.model.Step = graft.model.Step.NoStep,
      offsetHours: Int = 0, mergeSeries: Boolean = false,
      name: String = "graft_histogram"): Unit =
    svc.getHistogram(factId, dimId, filters, start, finish, step,
      offsetHours, mergeSeries).createOrReplaceTempView(name)

  /** [[TextAnalysis.bm25TopKFromIndex]] as the `graft_bm25_topk` view:
    * top-k docs per query served from a REGISTERED postings index —
    * the corpus is never scanned; query-term md5 buckets prune the
    * store's `part=` directories underneath the view. */
  def installBm25(spark: SparkSession, indexDir: String,
      queries: Seq[(String, Seq[String])], topK: Int = 5,
      name: String = "graft_bm25_topk"): Unit =
    TextAnalysis.bm25TopKFromIndex(spark, indexDir, queries, topK)
      .createOrReplaceTempView(name)
}
