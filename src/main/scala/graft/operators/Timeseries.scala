package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.functions.TimeKernel
import graft.model.{FactDef, FactType, Step}

/** The read-path pipeline: route → scan → collapse → fill.
  *
  * Reference chain (`get-timeseries`, postgres.clj:103-118):
  * `best-grouping` (postgres/query.clj:19-28) → range scan
  * (postgres/query.clj:30-47) → `collapse` (query.clj:41-73) →
  * `fill-range` (query.clj:99-111).
  *
  * Scale design (100 TB posture):
  *  - the scan is expressed as raw-column predicates (`ts >= … AND ts < …`,
  *    equality on dimension columns) so Catalyst pushes them into the
  *    Parquet scan (row-group min/max + partition pruning when the events
  *    table is partitioned by `date(ts)`);
  *  - collapse is ONE `groupBy` → partial (map-side) + final hash
  *    aggregation, shuffling only the aggregated keys;
  *  - gap fill is join-free: per-series bucket maps built by a second
  *    aggregation over the ALREADY-AGGREGATED (small) data, then the
  *    calendar grid — a driver-side literal array bounded by the query
  *    range, independent of data volume — is exploded per series. No
  *    cross join, no shuffle of a dense grid.
  */
object Timeseries {

  /** Rollup routing (`best-grouping`, postgres/query.clj:19-28): the first
    * grouping path whose keys (plus the dimension itself) cover ALL query
    * filter keys — including nil-valued ones, which participate in routing
    * but not in the WHERE. Falls back to just the dimension. The routed
    * grouping is the set of output series columns. */
  def bestGrouping(groupedBy: Seq[Seq[String]], dim: String,
      filterKeys: Set[String]): Seq[String] =
    groupedBy.find(g => filterKeys.subsetOf(g.toSet + dim))
      .map(_ :+ dim)
      .getOrElse(Seq(dim))

  /** Range scan + equality filter (O14, postgres/query.clj:30-47) over a
    * PREPARED frame: columns = grouping dims (string) + `ts` timestamp +
    * `value` long.
    *
    * Bounds follow `range-where` (postgres/query.clj:10-17): both
    * endpoints are slice-bucketed and INCLUSIVE — expressed on the raw
    * `ts` as `ts >= slice(start) AND ts < slice(finish) + slice` for
    * pushdown. Events missing any grouping value are skipped (`event-key`,
    * postgres/update.clj:11-26). Nil-valued filters are dropped from the
    * predicate (postgres/query.clj:39-41); filter keys outside the routed
    * grouping are ignored (postgres/query.clj:37-41). */
  def scan(prepared: DataFrame, sliceMinutes: Int, grouping: Seq[String],
      filters: Map[String, Option[String]],
      start: Timestamp, finish: Timestamp): DataFrame = {
    val lo = TimeKernel.sliceFloorLocal(start, sliceMinutes)
    val hiExcl = Timestamp.from(
      TimeKernel.sliceFloorLocal(finish, sliceMinutes).toInstant
        .plusSeconds(sliceMinutes * 60L))
    val nonNull = grouping.map(col(_).isNotNull).reduce(_ && _)
    val eq = filters.collect {
      case (k, Some(v)) if grouping.contains(k) => col(k) === lit(v)
    }.foldLeft(lit(true))(_ && _)
    // When the frame carries the event store's `__event_date`
    // partition column (TimeSeriesService.eventsDF), restate the time
    // range on it: the date of any admitted ts lies in
    // [date(lo), date(hiExcl − 1µs)] (implied by the ts bounds, so
    // results are unchanged), and a predicate on the PARTITION column
    // is what lets the store prune whole date directories from the
    // partition index — row-group min/max alone still opens every
    // footer. The artifact column is dropped here; it never reaches
    // aggregation keys or output.
    val dated =
      if (prepared.columns.contains("__event_date"))
        prepared.where(col("__event_date").between(
            to_date(lit(lo)),
            to_date(lit(Timestamp.from(hiExcl.toInstant.minusNanos(1000))))))
          .drop("__event_date")
      else prepared
    dated
      .where(col("ts") >= lit(lo) && col("ts") < lit(hiExcl))
      .where(nonNull && eq)
  }

  /** Client-side re-aggregation (`collapse`, query.clj:41-73) as one
    * hash aggregation. Dispatch comes from the catalog's fact type, not
    * from sniffing result columns (fixes the reference's empty-result
    * misdispatch, query.clj:41-46 / SURVEY §7.5.6).
    *
    * Truncating the raw `ts` is equivalent to truncating the slice bucket
    * for every calendar step (slice flooring only zeroes minutes within
    * the hour; calendar truncation + whole-hour offsets preserve that),
    * so the slice bucket is never materialized on this path. */
  /** Histogram bucket lower bound for a raw value: index clamped to
    * [start, end) — beyond-reference completion (collapse :histogram
    * throws at query.clj:75-77). */
  def histBucket(fact: FactDef): Column = {
    val n = fact.histogramBuckets.size
    val lo = fact.start.get
    val st = fact.step.get
    val idx = least(greatest(
      floor((col("value") - lit(lo)) / lit(st)).cast(LongType),
      lit(0L)), lit(n - 1L))
    (idx * lit(st) + lit(lo)).as("hist_bucket")
  }

  def collapse(scanned: DataFrame, fact: FactDef, grouping: Seq[String],
      step: Step, offsetHours: Int,
      histOverride: Option[Column] = None): DataFrame = {
    val keys = grouping.map(col) :+
      TimeKernel.timeDimension(col("ts"), step, offsetHours).as("bucket")
    fact.ftype match {
      case FactType.Counter =>
        scanned.groupBy(keys: _*).agg(sum("value").as("value"))
      case FactType.Average =>
        scanned.groupBy(keys: _*)
          .agg(count(lit(1)).as("counter"), sum("value").as("total"))
      case FactType.Histogram =>
        // histOverride: the multi-fact dashboard's per-ROW bucket
        // expression (each fact bucketizes by its own lo/step/n via a
        // fact→param map lookup); single-fact reads keep the scalar
        // literals. The override must alias to `hist_bucket`.
        scanned.groupBy(keys :+ histOverride.getOrElse(histBucket(fact)): _*)
          .agg(count(lit(1)).as("value"))
      case FactType.Distinct =>
        // exact distinct values per (series × bucket) — one hash
        // aggregation; Spark plans distinct as a two-phase partial
        // (Expand-free here: single count distinct), still shuffling
        // only aggregate keys
        scanned.groupBy(keys: _*)
          .agg(count_distinct(col("value")).as("value"))
    }
  }

  /** Dense gap fill (`fill-range`, query.clj:99-111): one row per
    * (series × calendar grid point), missing buckets filled with the
    * fact's `filler` (the reference hard-codes 0 and leaves a TODO at
    * query.clj:110 to honor the definition — we honor it; default is 0).
    * Grid points: raw `start` inclusive to `finish` exclusive
    * (`time-range`, query.clj:84-97) — NOT truncated, so a mid-hour start
    * yields grid points that match no collapsed bucket, exactly like the
    * reference. Series absent from the scan stay absent.
    *
    * `fillerOverride`, when given, replaces the fact's scalar `filler`
    * with a per-ROW expression evaluated on the exploded grid frame —
    * the multi-fact dashboard read passes a `fact → filler` map lookup
    * here so counter facts with DIFFERENT fillers share one pipeline
    * yet each fills its own gaps with its own filler (the expression
    * sees the grouping columns, `fact` among them). Ignored for
    * AVERAGE facts (their gap partial is always (0, 0)). */
  def fillRange(collapsed: DataFrame, fact: FactDef, grouping: Seq[String],
      start: Timestamp, finish: Timestamp, step: Step,
      fillerOverride: Option[Column] = None): DataFrame = {
    if (step == Step.NoStep) return collapsed
    val grid = TimeKernel.timeRange(start, finish, step)
    val dims = grouping.map(col)
    if (grid.isEmpty) {
      // time-range yields nothing when start >= finish: every series maps
      // to an empty grid → zero rows, same schema.
      return collapsed.limit(0)
    }
    val entry = fact.ftype match {
      case FactType.Average => struct(col("counter"), col("total"))
      case _ => struct(col("value"))
    }
    val gridLit = typedlit(grid)
    val withMap = collapsed
      .groupBy(dims: _*)
      .agg(map_from_entries(collect_list(struct(col("bucket"), entry))).as("__m"))
    val exploded = withMap.select(dims :+ col("__m") :+
      explode(gridLit).as("bucket"): _*)
    val lookup = element_at(col("__m"), col("bucket"))
    val out = fact.ftype match {
      case FactType.Average =>
        exploded.select(dims :+ col("bucket") :+
          coalesce(lookup.getField("counter"), lit(0L)).as("counter") :+
          coalesce(lookup.getField("total"), lit(0L)).as("total"): _*)
      case _ =>
        val filler = fillerOverride.getOrElse(lit(fact.filler))
        exploded.select(dims :+ col("bucket") :+
          coalesce(lookup.getField("value"), filler).as("value"): _*)
    }
    out
  }

  /** Full pipeline over a prepared frame (dims + ts + value). */
  def run(prepared: DataFrame, fact: FactDef, sliceMinutes: Int,
      grouping: Seq[String], filters: Map[String, Option[String]],
      start: Timestamp, finish: Timestamp, step: Step,
      offsetHours: Int = 0,
      fillerOverride: Option[Column] = None): DataFrame = {
    val scanned = scan(prepared, sliceMinutes, grouping, filters, start, finish)
    val coll = collapse(scanned, fact, grouping, step, offsetHours)
    if (fact.ftype == FactType.Histogram) coll
    else fillRange(coll, fact, grouping, start, finish, step, fillerOverride)
  }

  /** Trailing moving average over a FILLED series (beyond-reference
    * smoothing surface): per series, the trailing-`k`-bucket sum
    * (exact long arithmetic) and mean (×100, floored — integer-exact
    * for the oracle). Requires a dense grid ([[fillRange]] output) so
    * the ROWS frame equals the time frame: on a gappy series a
    * row-count frame would silently span time gaps.
    *
    * Scale shape: ONE hash partitioning on the series dims serves both
    * window functions; window state is the k-row frame, not the
    * series. Ramp-up buckets (fewer than k rows yet) average over the
    * rows present — the standard trailing-window convention. */
  def movingAverage(filled: DataFrame, grouping: Seq[String], k: Int,
      valueCol: String = "value"): DataFrame = {
    require(k >= 1, "window size must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(grouping.map(col): _*)
      .orderBy(col("bucket"))
      .rowsBetween(-(k - 1L), 0L)
    filled
      .withColumn("trailing_sum", sum(col(valueCol)).over(w))
      .withColumn("mavg_e2",
        floor(lit(100.0) * sum(col(valueCol)).over(w)
          / count(lit(1)).over(w)).cast(LongType))
  }

  /** Counter rate (beyond-reference; the PromQL `increase` read): per
    * series, the per-bucket increase of a CUMULATIVE gauge sampled into
    * the series, with monotonic-counter reset handling — when the gauge
    * goes DOWN the source counter restarted, so the whole current
    * reading is the increase (the extrapolation-free Prometheus rule).
    * `rate_e4` = increase × 10⁴ / `stepSeconds`, floored. The first
    * bucket of a series has no predecessor: increase is NULL
    * (unknowable, not zero).
    *
    * Scale shape: ONE series partitioning serves the lag; window state
    * is a single row. Inputs are already-collapsed series (KB per
    * series), never raw events. */
  def counterRate(series: DataFrame, grouping: Seq[String],
      stepSeconds: Long, valueCol: String = "value"): DataFrame = {
    require(stepSeconds >= 1, "stepSeconds must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(grouping.map(col): _*)
      .orderBy(col("bucket"))
    val prev = lag(col(valueCol), 1).over(w)
    val inc = when(prev.isNull, lit(null).cast(LongType))
      .when(col(valueCol) >= prev, col(valueCol) - prev)
      .otherwise(col(valueCol))
    series
      .withColumn("increase", inc)
      // increase ≥ 0 and ≪ 2^43, so the double product is exact and
      // floor matches the oracle's identical double computation
      .withColumn("rate_e4",
        floor(col("increase") * lit(10000.0) / lit(stepSeconds))
          .cast(LongType))
  }

  /** Linear-interpolation gap fill (beyond-reference; the TSDB
    * `fill(linear)` read, vs [[fillRange]]'s `fill(constant)`): over
    * the dense calendar grid, buckets with no observations take the
    * straight line between the nearest observed neighbours.
    * Integer-exact ×100 via epoch-second positions:
    * `value_e2 = floor(100·(pv·(nt−t) + nv·(t−pt)) / (nt−pt))` — the
    * weighted mean form, no float slope accumulating error across a
    * gap. Leading/trailing edges (no neighbour on one side) take the
    * filler. `src` labels each row `obs` / `interp` / `edge`.
    *
    * Scale shape: the grid explode reuses [[fillRange]]'s join-free
    * per-series map (missing buckets surface as NULL, not filler), and
    * ONE series partitioning serves both neighbour scans — window
    * state is one struct each direction, not the series. Series with
    * no observation in range stay absent, like fillRange. */
  def interpolateFill(collapsed: DataFrame, grouping: Seq[String],
      start: Timestamp, finish: Timestamp, step: Step,
      filler: Long = 0L): DataFrame = {
    val grid = TimeKernel.timeRange(start, finish, step)
    val dims = grouping.map(col)
    if (grid.isEmpty)
      return collapsed.select(dims :+ col("bucket") :+
        lit(0L).as("value_e2") :+ lit("obs").as("src"): _*).limit(0)
    val withMap = collapsed
      .groupBy(dims: _*)
      .agg(map_from_entries(collect_list(struct(col("bucket"),
        struct(col("value"))))).as("__m"))
    val sparse = withMap
      .select(dims :+ col("__m") :+ explode(typedlit(grid)).as("bucket"): _*)
      .select(dims :+ col("bucket") :+
        element_at(col("__m"), col("bucket")).getField("value")
          .as("__v"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(dims: _*).orderBy(col("bucket"))
    val wPrev = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wNext = w.rowsBetween(1,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val t = unix_timestamp(col("bucket"))
    val obs = when(col("__v").isNotNull, struct(t.as("t"), col("__v").as("v")))
    val pv = last(obs, ignoreNulls = true).over(wPrev)
    val nv = first(obs, ignoreNulls = true).over(wNext)
    val num = pv.getField("v") * (nv.getField("t") - t) +
      nv.getField("v") * (t - pv.getField("t"))
    val den = nv.getField("t") - pv.getField("t")
    sparse
      .withColumn("value_e2",
        when(col("__v").isNotNull, col("__v") * lit(100L))
          .when(pv.isNotNull && nv.isNotNull,
            // all terms ≥ 0 and ≪ 2^53: the double quotient is exact
            // enough that floor matches the oracle's identical form
            floor(num * lit(100.0) / den).cast(LongType))
          .otherwise(lit(filler * 100L)))
      .withColumn("src",
        when(col("__v").isNotNull, lit("obs"))
          .when(pv.isNotNull && nv.isNotNull, lit("interp"))
          .otherwise(lit("edge")))
      .drop("__v")
  }

  /** Histogram pipeline (O21, completed beyond the reference): counts per
    * (series × hist_bucket lower bound) over the scan range. With a
    * calendar `step`, one histogram per (series × time bucket) — the
    * O15/O17 time kernel applied to the histogram surface, matching
    * [[run]]'s step semantics (NoStep collapses the time axis away). */
  def runHistogram(prepared: DataFrame, fact: FactDef, sliceMinutes: Int,
      grouping: Seq[String], filters: Map[String, Option[String]],
      start: Timestamp, finish: Timestamp, step: Step = Step.NoStep,
      offsetHours: Int = 0,
      histOverride: Option[Column] = None): DataFrame = {
    val scanned = scan(prepared, sliceMinutes, grouping, filters, start, finish)
    val coll = collapse(scanned, fact, grouping, step, offsetHours, histOverride)
    if (step == Step.NoStep)
      coll.groupBy(grouping.map(col) :+ col("hist_bucket"): _*)
        .agg(sum("value").as("value"))
    else coll // already one row per (series × bucket × hist_bucket)
  }

  /** Percentiles from a histogram result (O21 serving surface): per
    * series, for each requested percentile q, the smallest bucket
    * lower bound whose cumulative count reaches q% of the series
    * total — the standard "estimate percentiles from the histogram
    * you already maintain" read, integer-exact on both sides
    * (`cum·100 ≥ tot·q` avoids any float quantile arithmetic).
    *
    * Input is [[runHistogram]] / `Rollups.runHistogram` output
    * (dims…, hist_bucket, value) — KB-scale aggregates, so the ONE
    * series partitioning both window functions share costs nothing at
    * any corpus size; percentile fan-out is an explode over the
    * (tiny) requested list, not a second pass over the histogram.
    *
    * @return (dims…, pct, value = bucket lower bound) */
  def histPercentiles(hist: DataFrame, grouping: Seq[String],
      pcts: Seq[Long] = Seq(50L, 95L)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(q => q >= 1 && q <= 100),
      "percentiles must be in [1, 100]")
    val byS = org.apache.spark.sql.expressions.Window
      .partitionBy(grouping.map(col): _*)
    val cumW = byS.orderBy(col("hist_bucket"))
      .rowsBetween(Long.MinValue, 0L)
    hist
      .withColumn("__cum", sum(col("value")).over(cumW))
      .withColumn("__tot", sum(col("value")).over(byS))
      .select(grouping.map(col) :+ col("hist_bucket") :+ col("__cum") :+
        col("__tot") :+ explode(typedlit(pcts)).as("pct"): _*)
      .where(col("__cum") * lit(100L) >= col("__tot") * col("pct"))
      .groupBy(grouping.map(col) :+ col("pct"): _*)
      .agg(min(col("hist_bucket")).as("value"))
  }

  /** Inverse of [[histPercentiles]]: the CDF read — for each requested
    * bucket lower bound, the share of observations (×10⁴, floored) in
    * buckets at or below it. "What fraction of requests were under
    * 100 ms" served from maintained histogram partials, O(buckets)
    * input, never raw events. Requested values below the lowest
    * populated bucket are absent from the output (their cumulative
    * set is empty), mirroring the percentile read's convention. The
    * single division is two exact longs, identical on any engine. */
  def histCdf(hist: DataFrame, grouping: Seq[String],
      values: Seq[Long]): DataFrame = {
    require(values.nonEmpty, "histCdf needs at least one value")
    val byS = org.apache.spark.sql.expressions.Window
      .partitionBy(grouping.map(col): _*)
    hist
      .withColumn("__tot", sum(col("value")).over(byS))
      .select(grouping.map(col) :+ col("hist_bucket") :+ col("value") :+
        col("__tot") :+ explode(typedlit(values)).as("at_value"): _*)
      .where(col("hist_bucket") <= col("at_value"))
      .groupBy(grouping.map(col) :+ col("at_value"): _*)
      .agg(floor(lit(10000L) * sum(col("value")) / max(col("__tot")))
        .cast(org.apache.spark.sql.types.LongType).as("cdf_e4"))
  }

  /** Slice-bucket view (O7 at query granularity): the scan with its
    * slice bucket materialized, for callers that want the finest
    * pre-aggregated granularity rather than a calendar collapse. */
  def sliceBuckets(scanned: DataFrame, fact: FactDef, sliceMinutes: Int,
      grouping: Seq[String]): DataFrame = {
    val keys = grouping.map(col) :+
      TimeKernel.sliceFloor(col("ts"), sliceMinutes).as("bucket")
    fact.ftype match {
      case FactType.Average =>
        scanned.groupBy(keys: _*)
          .agg(count(lit(1)).as("counter"), sum("value").as("total"))
      case FactType.Histogram =>
        // tall partials: one row per (series × slice × value bucket),
        // re-aggregable by summing counts — the reference's b<lower>
        // columns (postgres/schema.clj:162-166) as rows, not DDL
        scanned.groupBy(keys :+ histBucket(fact): _*)
          .agg(count(lit(1)).as("value"))
      case FactType.Distinct =>
        // tall partials: one row per (series × slice × distinct value)
        // with its occurrence count — the histogram trick applied to
        // distinct counting. Retaining the values at slice granularity
        // is what keeps any later calendar collapse EXACT (distinct
        // counts don't re-aggregate from scalars); the count column
        // keeps appended streaming partials mergeable by the standard
        // sum convention (Rollups.compact). Partial size is bounded by
        // per-slice cardinality, the same envelope the reference's
        // per-key upsert rows occupy.
        scanned.groupBy(keys :+ col("value").as("dval"): _*)
          .agg(count(lit(1)).as("value"))
      case _ =>
        scanned.groupBy(keys: _*).agg(sum("value").as("value"))
    }
  }
}
