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
