package graft.plans

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DateType, DoubleType, LongType, StringType, TimestampNTZType, TimestampType}

import graft.functions.TimeKernel

/** Transparent aggregate→rollup routing as a Catalyst optimizer rule.
  *
  * The reference's one query optimization is `best-grouping`
  * (`postgres/query.clj:19-28`): answer a query from the smallest
  * pre-aggregated table that covers it instead of raw events. The
  * service layer already reimplements that routing
  * ([[graft.operators.Timeseries.bestGrouping]]); this rule lifts it
  * into Catalyst (SURVEY §4's "optional custom Rule" upgrade) so that
  * ARBITRARY DataFrame/SQL aggregations over the raw events source —
  * not just `TimeSeriesService` calls — are served from a registered
  * slice-level rollup when semantics allow.
  *
  * A registered rollup holds, per (dims…, slice bucket), the partial
  * aggregates `cnt = count(*)`, `cntv = count(value)`,
  * `total = sum(value)`, `mn = min(value)`, `mx = max(value)`
  * (see [[graft.operators.Rollups.partials]]). The rule rewrites
  * `Aggregate [g…] [a…] (Filter? (Project? raw))` into the same
  * aggregate over the rollup when:
  *
  *  - every grouping expression is a registered dimension expression,
  *    a calendar truncation of the event time no finer than the slice
  *    (`date_trunc` hour/day/week/month/quarter/year, or a cast to
  *    date), or the slice-floor bucket itself;
  *  - every aggregate is re-aggregable from the partials:
  *    `sum(value)→sum(total)`, `count(*)→sum(cnt)`,
  *    `count(value)→sum(cntv)`, `min/max(value)→min(mn)/max(mx)`,
  *    `avg(value)→sum(total)/sum(cntv)`;
  *  - every filter conjunct touches only dimension expressions, or is
  *    a slice-ALIGNED half-open time bound (`ts >= lit` / `ts < lit`
  *    with `lit` on a slice boundary — the only bounds for which the
  *    raw row set is exactly a set of whole buckets).
  *
  * Anything else leaves the plan untouched — the rewrite is strictly
  * best-effort and semantics-preserving. At 100 TB this is the
  * difference between scanning raw events and scanning a table smaller
  * by the events-per-slice compaction factor, with the time/dim
  * predicates pushed into the rollup's parquet scan (the rewritten
  * Filter sits directly on the rollup relation, so FileSourceStrategy
  * still applies pushdown + pruning at physical planning).
  */
object RollupRouting {

  /** One registered (raw source → rollup) mapping. All expressions are
    * stored OPTIMIZED and expressed over `leaf`'s output attributes, so
    * canonical comparison against a user plan (optimized by the time
    * the rule runs) is stable; they are remapped onto the user plan's
    * own leaf attribute ids at match time. */
  private[plans] final case class Entry(
      leaf: LogicalPlan,
      tsExpr: Expression,
      valueExpr: Expression,
      sliceExpr: Expression,
      dimExprs: Seq[(String, Expression)],
      rollup: LogicalPlan,
      sliceMinutes: Int,
      /** true → `rollup` is DISTINCT tall partials (dims…, bucket,
        * dval, value): the retained values serve COUNT(DISTINCT
        * value) — and only that — exactly at any coarser grouping.
        * Scalar-partial entries cannot serve distincts and distinct
        * entries cannot serve sums, so the two kinds never compete. */
      distinctVals: Boolean = false,
      /** Some(expr) → `rollup` is HISTOGRAM tall partials (dims…,
        * bucket, hist_bucket, value-as-count): `expr` is the
        * registered bucketing expression over the raw value, and
        * `count(*) GROUP BY <expr>`-shaped aggregates route onto
        * `sum(value) GROUP BY hist_bucket`. Counts re-aggregate by
        * summing, so any coarser calendar/dim grouping stays exact. */
      histExpr: Option[Expression] = None)

  private val registry = TrieMap.empty[SparkSession, Vector[Entry]]

  private[plans] def entriesFor(spark: SparkSession): Vector[Entry] =
    registry.getOrElse(spark, Vector.empty)

  /** Register a rollup for a raw source. `raw` is the DataFrame users
    * query (it may derive columns — e.g. a nanos→timestamp conversion —
    * as long as it is Project/Filter-free-equivalent over ONE leaf
    * relation); `rollup` must be shaped like
    * [[graft.operators.Rollups.partials]] of the same raw frame. */
  /** True iff `tz` is a fixed zero-offset zone (UTC/GMT/Etc/UTC/+00:00).
    * The routing rule's time reasoning — slice alignment of literal
    * bounds via epoch arithmetic ([[RollupRouteRule]]`.aligned`) and
    * epoch-day `bucket_date` partition bounds — is only valid when the
    * session interprets timestamps in UTC, which is also the zone
    * `to_date(bucket)` used when the rollup's `bucket_date` partition
    * column was written (build.sbt pins it; arbitrary user sessions
    * may not). */
  private[graft] def isUtcZone(tz: String): Boolean =
    try {
      val rules = java.time.ZoneId.of(tz).getRules
      rules.isFixedOffset && rules.getOffset(java.time.Instant.EPOCH) ==
        java.time.ZoneOffset.UTC
    } catch { case _: java.time.DateTimeException => false }

  def register(spark: SparkSession, raw: DataFrame, rollup: DataFrame,
      dims: Seq[String], tsCol: String = "ts", valueCol: String = "value",
      sliceMinutes: Int = 15): Unit =
    registerImpl(spark, raw, rollup, dims, tsCol, valueCol, sliceMinutes,
      distinctVals = false)

  /** Register a DAY-grain scalar-partials tier
    * ([[graft.operators.Rollups.coarsenPartialsToDay]] shape) for
    * `raw`: hierarchical rollups — with both a slice tier and a day
    * tier registered, the rule serves day/week/month/quarter/year
    * queries from the day tier (~96× fewer rows than 15-min slices)
    * and hour queries from the slice tier, preferring the COARSEST
    * tier that can serve exactly. Time bounds must be
    * midnight-aligned to route here; hour truncations and sub-day
    * bounds structurally cannot be served and fall through to a finer
    * tier or the raw scan. */
  def registerDayGrain(spark: SparkSession, raw: DataFrame,
      rollup: DataFrame, dims: Seq[String], tsCol: String = "ts",
      valueCol: String = "value"): Unit =
    registerImpl(spark, raw, rollup, dims, tsCol, valueCol,
      sliceMinutes = DayGrainMinutes, distinctVals = false)

  /** Register a DAY-grain DISTINCT tier
    * ([[graft.operators.Rollups.coarsenDistinctPartialsToDay]] shape)
    * for `raw`: COUNT DISTINCT with day+ truncation and
    * midnight-aligned bounds serves from one row per (dims, day,
    * value) instead of one per (dims, slice, value) — up to 96× fewer
    * rows for values that recur through the day (exactly the
    * daily-active-user shape a distinct read targets). Hour
    * truncations and sub-day bounds structurally cannot ride this
    * tier, same as the scalar day tier; the null-keeping requirement
    * of [[registerDistinct]] applies identically. */
  def registerDistinctDayGrain(spark: SparkSession, raw: DataFrame,
      rollup: DataFrame, dims: Seq[String], tsCol: String = "ts",
      valueCol: String = "value"): Unit =
    registerImpl(spark, raw, rollup, dims, tsCol, valueCol,
      sliceMinutes = DayGrainMinutes, distinctVals = true)

  /** Sentinel grain for day-tier entries (24 × 60). */
  private[plans] val DayGrainMinutes = 1440

  /** Register DISTINCT tall partials (the `FactType.Distinct` rollup
    * shape — `Timeseries.sliceBuckets` output with a `dval` column)
    * for `raw`: `COUNT(DISTINCT valueCol)` aggregates route onto
    * `COUNT(DISTINCT dval)` over the rollup. At 100 TB the distinct
    * count is THE query that cannot be served from scalar partials —
    * this is its O(rollup) path under user SQL we don't control.
    *
    * The rollup MUST retain null dimension groups (build it with
    * [[graft.operators.Rollups.distinctPartials]], not the service
    * write path's null-skipping
    * [[graft.operators.Rollups.build]]): user `GROUP BY dim` plans
    * emit the NULL-dim group, and a store missing it would make the
    * routed plan silently drop those rows. */
  def registerDistinct(spark: SparkSession, raw: DataFrame,
      rollup: DataFrame, dims: Seq[String], tsCol: String = "ts",
      valueCol: String = "value", sliceMinutes: Int = 15): Unit =
    registerImpl(spark, raw, rollup, dims, tsCol, valueCol, sliceMinutes,
      distinctVals = true)

  /** Register HISTOGRAM tall partials (the `FactType.Histogram` rollup
    * shape — (dims…, bucket, hist_bucket, value) where `value` is the
    * bucket's COUNT, [[graft.operators.Rollups.histogramPartials]])
    * for `raw`: aggregates of the shape
    * `count(*) … GROUP BY [dims…, calendar trunc,] <histCol>` route
    * onto `sum(value) … GROUP BY [dims…, bucket trunc,] hist_bucket`.
    *
    * `histCol` is the bucketing expression users are expected to group
    * by (canonically [[graft.operators.Timeseries.histBucket]]); the
    * match is structural after optimization, so a user plan must
    * compute the SAME bucketing algebra — a differently-written but
    * semantically-equal bucketing simply keeps its raw scan.
    * Like [[registerDistinct]], the rollup MUST retain null dimension
    * groups and the null-value bucket (build it with
    * histogramPartials, not the service write path). */
  def registerHistogram(spark: SparkSession, raw: DataFrame,
      rollup: DataFrame, dims: Seq[String], histCol: org.apache.spark.sql.Column,
      tsCol: String = "ts", valueCol: String = "value",
      sliceMinutes: Int = 15): Unit =
    registerImpl(spark, raw, rollup, dims, tsCol, valueCol, sliceMinutes,
      distinctVals = false, histCol = Some(histCol))

  /** Register a DAY-grain HISTOGRAM tier
    * ([[graft.operators.Rollups.coarsenHistogramPartialsToDay]]
    * shape): `count(*) GROUP BY histBucket(value)` plans with day+
    * truncation (or no time grouping) and midnight-aligned bounds
    * serve from one row per (dims, day, hist_bucket) — counts are
    * sums of sums at any grain, so the coarse tier is exact wherever
    * it is reachable; hour truncations and sub-day bounds fall back
    * exactly like the other day tiers. */
  def registerHistogramDayGrain(spark: SparkSession, raw: DataFrame,
      rollup: DataFrame, dims: Seq[String],
      histCol: org.apache.spark.sql.Column, tsCol: String = "ts",
      valueCol: String = "value"): Unit =
    registerImpl(spark, raw, rollup, dims, tsCol, valueCol,
      sliceMinutes = DayGrainMinutes, distinctVals = false,
      histCol = Some(histCol))

  private def registerImpl(spark: SparkSession, raw: DataFrame,
      rollup: DataFrame, dims: Seq[String], tsCol: String,
      valueCol: String, sliceMinutes: Int, distinctVals: Boolean,
      histCol: Option[org.apache.spark.sql.Column] = None): Unit = {
    require(isUtcZone(spark.sessionState.conf.sessionLocalTimeZone),
      "RollupRouting.register requires spark.sql.session.timeZone=UTC: " +
        "slice alignment and bucket_date partition bounds are derived " +
        "with epoch (UTC) arithmetic and would mis-prune in other zones")
    require((sliceMinutes >= 1 && sliceMinutes <= 60) ||
      sliceMinutes == DayGrainMinutes,
      s"grain must be a (0,60]-minute slice or the day tier; got $sliceMinutes")
    // Probe plan: optimize the registered expressions exactly the way a
    // user query's will be, then inline them down to the leaf attrs.
    val bucketExpr =
      if (sliceMinutes == DayGrainMinutes)
        org.apache.spark.sql.functions.date_trunc("day", col(tsCol))
      else TimeKernel.sliceFloor(col(tsCol), sliceMinutes)
    val probeCols = Seq(col(tsCol).as("__ts"), col(valueCol).as("__value"),
      bucketExpr.as("__slice")) ++
      histCol.map(_.as("__hist")).toSeq ++
      dims.map(d => col(d).as(s"__dim__$d"))
    val probe = raw.select(probeCols: _*).queryExecution.optimizedPlan
    val (leaf, maps, fs) = strip(probe)
    require(fs.isEmpty, "register: raw frame must not carry filters")
    val byName = probe.output.map(a => a.name -> inline(a, maps, 0)).toMap
    val entry = Entry(leaf, byName("__ts"), byName("__value"),
      byName("__slice"), dims.map(d => d -> byName(s"__dim__$d")),
      rollup.queryExecution.analyzed, sliceMinutes, distinctVals,
      histExpr = histCol.map(_ => byName("__hist")))
    registry.updateWith(spark)(v => Some(v.getOrElse(Vector.empty) :+ entry))
  }

  def clear(spark: SparkSession): Unit = registry.remove(spark)

  /** Add the routing rule to an already-built session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[RollupRouteRule]))
      spark.experimental.extraOptimizations = cur :+ RollupRouteRule(spark)
  }

  // ---- plan surgery helpers (shared by register + rule) ----------------

  /** Walk Project/Filter/SubqueryAlias down to the leaf; collect alias
    * maps top-down and filter conditions with the number of alias maps
    * above them. */
  private[plans] def strip(plan: LogicalPlan)
      : (LogicalPlan, Seq[Map[ExprId, Expression]], Seq[(Expression, Int)]) = {
    val maps = ArrayBuffer.empty[Map[ExprId, Expression]]
    val filters = ArrayBuffer.empty[(Expression, Int)]
    var node = plan
    var done = false
    while (!done) node match {
      case p: Project if p.projectList.forall(e =>
          e.isInstanceOf[AttributeReference] || e.isInstanceOf[Alias]) =>
        maps += p.projectList.collect {
          case a: Alias => a.exprId -> a.child
        }.toMap
        node = p.child
      case f: Filter =>
        filters += ((f.condition, maps.size)); node = f.child
      case s: SubqueryAlias => node = s.child
      case _ => done = true
    }
    (node, maps.toSeq, filters.toSeq)
  }

  /** Substitute project aliases (top-down) so `e` references only leaf
    * attributes. `fromDepth` = how many maps sit above e's position. */
  private[plans] def inline(e: Expression,
      maps: Seq[Map[ExprId, Expression]], fromDepth: Int): Expression =
    maps.drop(fromDepth).foldLeft(e) { (ex, m) =>
      ex.transformUp {
        case ar: AttributeReference if m.contains(ar.exprId) => m(ar.exprId)
      }
    }

  /** Leaf equivalence: structural sameResult, or same files for two
    * independent reads of the same parquet location (HadoopFsRelation
    * equality is reference-based on its FileIndex, so two
    * `spark.read.parquet(path)` calls never compare equal). */
  private[plans] def leavesMatch(a: LogicalPlan, b: LogicalPlan): Boolean =
    a.sameResult(b) || ((a, b) match {
      case (la: LogicalRelation, lb: LogicalRelation) =>
        (la.relation, lb.relation) match {
          case (fa: HadoopFsRelation, fb: HadoopFsRelation) =>
            fa.fileFormat.getClass == fb.fileFormat.getClass &&
              fa.location.rootPaths.map(_.toString).sorted ==
                fb.location.rootPaths.map(_.toString).sorted &&
              fa.dataSchema == fb.dataSchema
          case _ => false
        }
      case _ => false
    })
}

/** The optimizer rule. Runs late (extraOptimizations / injected user
  * batch) — the rewritten subtree is final, but parquet pushdown and
  * column pruning for the new rollup scan still happen at physical
  * planning (FileSourceStrategy's PhysicalOperation), so the routed
  * plan scans only the rollup columns and partitions it needs. */
final case class RollupRouteRule(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {
  import RollupRouting._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val entries = entriesFor(spark)
    if (entries.isEmpty) plan
    // Non-UTC session (possible when the rule was injected via
    // GraftExtensions into an arbitrary user session, or the zone was
    // changed after register): the rule's epoch-based slice-alignment /
    // bucket_date bounds would be wrong — leave plans untouched, the
    // raw scan stays correct.
    else if (!isUtcZone(spark.sessionState.conf.sessionLocalTimeZone)) {
      logWarning("RollupRouting disabled: session timezone is " +
        s"${spark.sessionState.conf.sessionLocalTimeZone}, not UTC")
      plan
    } else plan.transformUp {
      case agg: Aggregate =>
        // best-grouping preference (postgres/query.clj:19-28): among
        // every registered rollup that can serve this aggregate, route
        // to the NARROWEST — fewest dimension columns, i.e. the most
        // compacted partials (a wider rollup carries one row per extra
        // dimension combination that this query would immediately
        // re-aggregate away) — then, within a dimension width, to the
        // COARSEST time grain (the day tier holds up to 96× fewer
        // rows than a 15-minute tier over the same span). Ties keep
        // registration order (minBy is stable over the ordered list).
        val servable = entries.flatMap(e =>
          rewrite(agg, e).map((e.dimExprs.size, -e.sliceMinutes) -> _))
        if (servable.isEmpty) agg else servable.minBy(_._1)._2
    }
  }

  private def rewrite(agg: Aggregate, entry: Entry): Option[Aggregate] = {
    val (leaf, maps, filters) = strip(agg.child)
    if (!leavesMatch(leaf, entry.leaf)) return None

    // Remap the entry's leaf-attr expressions onto THIS plan's leaf ids.
    val remap: Map[ExprId, Attribute] = entry.leaf.output.flatMap { a =>
      leaf.output.find(_.name == a.name).map(a.exprId -> _)
    }.toMap
    if (remap.size != entry.leaf.output.size) return None
    def re(e: Expression): Expression = e.transformUp {
      case ar: AttributeReference if remap.contains(ar.exprId) => remap(ar.exprId)
    }
    val tsE = re(entry.tsExpr)
    val valueE = re(entry.valueExpr)
    val sliceE = re(entry.sliceExpr)
    val dimEs = entry.dimExprs.map { case (n, e) => n -> re(e) }

    // Fresh rollup instance (stable attr ids per rewrite site).
    val rollup = entry.rollup match {
      case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
      case p => p
    }
    def rAttr(name: String): Option[Attribute] = rollup.output.find(_.name == name)
    val bucket = rAttr("bucket") match {
      case Some(b) => b
      case None => return None
    }
    // distinct entries carry the values (dval), histogram entries
    // carry (hist_bucket, count), generic entries carry re-aggregable
    // scalar partials — each kind requires its columns
    val isHist = entry.histExpr.isDefined
    val dvalOpt = rAttr("dval")
    if (entry.distinctVals && dvalOpt.isEmpty) return None
    val histAttrOpt = rAttr("hist_bucket")
    val histCntOpt = rAttr("value")
    if (isHist && (histAttrOpt.isEmpty || histCntOpt.isEmpty)) return None
    val (cntOpt, cntvOpt, totalOpt) = (rAttr("cnt"), rAttr("cntv"), rAttr("total"))
    if (!entry.distinctVals && !isHist &&
      (cntOpt.isEmpty || cntvOpt.isEmpty || totalOpt.isEmpty)) return None
    val histE = entry.histExpr.map(re)
    val dimAttrs: Map[String, Attribute] =
      dimEs.flatMap { case (n, _) => rAttr(n).map(n -> _) }.toMap
    if (dimAttrs.size != dimEs.size) return None
    val dimByCanon: Map[Expression, Attribute] =
      dimEs.map { case (n, e) => e.canonicalized -> dimAttrs(n) }.toMap

    val dayGrain = entry.sliceMinutes == DayGrainMinutes
    // units a tier can serve exactly: every bucket must lie WHOLLY
    // inside one truncation unit. Sub-hour slices floor within the
    // hour, so any calendar unit ≥ hour works; the day tier's buckets
    // are whole days, so hour (and minute) truncs are out of reach.
    val dayUnits =
      Set("year", "yyyy", "yy", "quarter", "month", "mon", "mm", "week",
        "day", "dd")
    def truncOk(fmt: String): Boolean = {
      val f = fmt.toLowerCase(java.util.Locale.ROOT)
      dayUnits.contains(f) ||
        (!dayGrain && f == "hour") ||
        (f == "minute" && entry.sliceMinutes == 1)
    }

    // ---- grouping --------------------------------------------------------
    def groupTranslate(e: Expression): Option[Expression] =
      dimByCanon.get(e.canonicalized).orElse(e match {
        case _ if histE.exists(e.semanticEquals) => histAttrOpt
        case tt @ TruncTimestamp(Literal(fmt, StringType), t, _)
            if t.semanticEquals(tsE) && truncOk(fmt.toString) =>
          Some(tt.copy(timestamp = bucket))
        case c: Cast if c.dataType == DateType && c.child.semanticEquals(tsE) =>
          Some(c.copy(child = bucket))
        case _ if e.semanticEquals(sliceE) => Some(bucket)
        case _ => None
      })

    val inlinedGroups = agg.groupingExpressions.map(inline(_, maps, 0))
    val groupPairs = inlinedGroups.map(g => groupTranslate(g).map(g -> _))
    if (groupPairs.exists(_.isEmpty)) return None
    val groupByCanon: Map[Expression, Expression] =
      groupPairs.flatten.map { case (g, t) => g.canonicalized -> t }.toMap

    // ---- aggregates ------------------------------------------------------
    val global = agg.groupingExpressions.isEmpty
    def sumOf(a: Attribute): Expression = Sum(a).toAggregateExpression()
    def aggTranslate(ae: AggregateExpression): Option[Expression] = {
      if (ae.filter.isDefined || ae.mode != Complete) return None
      val out: Option[Expression] =
        if (entry.distinctVals) ae.aggregateFunction match {
          // the ONE aggregate distinct-value partials serve:
          // count(distinct value) → count(distinct dval). The values
          // are physically retained per slice, so re-aggregation to
          // any coarser grouping stays exact — the scalar-partial
          // scheme structurally cannot answer this.
          case Count(Seq(v)) if ae.isDistinct && v.semanticEquals(valueE) =>
            dvalOpt.map(d =>
              Count(Seq(d)).toAggregateExpression(isDistinct = true))
          case _ => None
        }
        else if (isHist) ae.aggregateFunction match {
          // the ONE aggregate histogram partials serve: count(*) →
          // sum(per-bucket count). Correct at ANY registered grouping
          // subset — with the bucket expression in the user's GROUP BY
          // this is the histogram read; without it the buckets simply
          // re-aggregate away (counts are sums of sums either way).
          case Count(cs) if !ae.isDistinct && cs.nonEmpty &&
              cs.forall(_.foldable) =>
            val s = sumOf(histCntOpt.get)
            Some(if (global) Coalesce(Seq(s, Literal(0L, LongType))) else s)
          case _ => None
        }
        else if (ae.isDistinct) None
        else ae.aggregateFunction match {
          case Sum(v, _) if v.semanticEquals(valueE) =>
            Some(sumOf(totalOpt.get))
          case Count(cs) if cs.nonEmpty && cs.forall(_.foldable) =>
            // count(*): null on an empty rollup vs 0 on raw — coalesce
            // for the global-aggregate case where the group always
            // exists.
            val s = sumOf(cntOpt.get)
            Some(if (global) Coalesce(Seq(s, Literal(0L, LongType))) else s)
          case Count(Seq(v)) if v.semanticEquals(valueE) =>
            val s = sumOf(cntvOpt.get)
            Some(if (global) Coalesce(Seq(s, Literal(0L, LongType))) else s)
          case Min(v) if v.semanticEquals(valueE) =>
            rAttr("mn").map(m => Min(m).toAggregateExpression())
          case Max(v) if v.semanticEquals(valueE) =>
            rAttr("mx").map(m => Max(m).toAggregateExpression())
          case Average(v, _) if v.semanticEquals(valueE) =>
            Some(Divide(Cast(sumOf(totalOpt.get), DoubleType),
              Cast(sumOf(cntvOpt.get), DoubleType)))
          case _ => None
        }
      out.filter(_.dataType == ae.dataType)
    }

    def tx(e: Expression): Option[Expression] =
      groupByCanon.get(e.canonicalized) match {
        case Some(r) => Some(r)
        case None => e match {
          case ae: AggregateExpression => aggTranslate(ae)
          case _: AttributeReference => None
          case _ if e.children.nonEmpty =>
            val kids = e.children.map(tx)
            if (kids.forall(_.isDefined)) Some(e.withNewChildren(kids.map(_.get)))
            else None
          case l: Literal => Some(l)
          case _ => None
        }
      }

    val newResults: Seq[Option[NamedExpression]] =
      agg.aggregateExpressions.map { ne =>
        inline(ne, maps, 0) match {
          case a: Alias =>
            tx(a.child).map(c => Alias(c, a.name)(exprId = a.exprId))
          case ar: AttributeReference =>
            tx(ar).map(c => Alias(c, ar.name)(exprId = ar.exprId))
          case _ => None
        }
      }
    if (newResults.exists(_.isEmpty)) return None

    // ---- filters ---------------------------------------------------------
    def aligned(micros: Long): Boolean =
      if (dayGrain) micros % 86400000000L == 0 // midnight (UTC epoch day)
      else {
        val minuteMicros = 60L * 1000000L
        if (micros % minuteMicros != 0) false
        else {
          val minuteOfHour = (((micros / minuteMicros) % 60) + 60) % 60
          minuteOfHour % entry.sliceMinutes == 0
        }
      }
    // IsNotNull inferred on an underlying raw column: sound to move to
    // the corresponding rollup column iff the registered expression is a
    // null-intolerant function of exactly that column — verified node by
    // node (every non-leaf on the path must declare `nullIntolerant`, so
    // reg(x) is null whenever x is; a null-TOLERANT registration like
    // coalesce(c, 'unknown') must NOT absorb IsNotNull(c), since rows
    // with c null survive on the rollup side that raw would drop).
    // Residual assumption: the registration is also TOTAL (non-null in →
    // non-null out), which holds for the temporal/arithmetic conversions
    // registrations use; partial functions (cast from free-form string,
    // map lookup) should register the underlying column instead.
    def nullIntolerantTree(reg: Expression): Boolean = reg match {
      case _: AttributeReference | _: Literal => true
      case _ => reg.nullIntolerant && reg.children.forall(nullIntolerantTree)
    }
    def notNullTarget(e: Expression): Option[Attribute] = {
      def covers(reg: Expression): Boolean =
        e.isInstanceOf[AttributeReference] && reg.references.size == 1 &&
          reg.references == e.references && nullIntolerantTree(reg)
      if (e.semanticEquals(tsE) || covers(tsE)) Some(bucket)
      else dimEs.collectFirst {
        case (n, de) if de.semanticEquals(e) || covers(de) => dimAttrs(n)
      }
    }
    // A bucket bound implies a bound on the bucket_date PARTITION column
    // (date is monotone in bucket) — attaching it prunes whole date
    // partitions of the rollup before any parquet is read.
    val bucketDate = rAttr("bucket_date")
    def dateLit(micros: Long): Literal =
      Literal(Math.floorDiv(micros, 86400000000L).toInt, DateType)
    def loBound(l: Literal, v: Long): Expression = {
      val p: Expression = GreaterThanOrEqual(bucket, l)
      bucketDate.map(bd => And(p, GreaterThanOrEqual(bd, dateLit(v))))
        .getOrElse(p)
    }
    def hiBound(l: Literal, v: Long): Expression = {
      val p: Expression = LessThan(bucket, l)
      bucketDate.map(bd => And(p, LessThanOrEqual(bd, dateLit(v))))
        .getOrElse(p)
    }
    // A time bound appears either as the registered expression compared
    // to an LTZ literal, or — when the registration is a plain
    // NTZ→LTZ cast that the optimizer UNWRAPPED
    // (UnwrapCastInBinaryComparison) — as the raw NTZ column compared
    // to an NTZ literal. The session is pinned UTC, so both literal
    // kinds carry the same epoch micros and the same slice-alignment
    // arithmetic applies; the rollup-side bound is always re-issued as
    // an LTZ literal (the `bucket` column's type).
    def tsBoundMicros(t: Expression, l: Literal): Option[Long] = {
      val matches = l.dataType match {
        case TimestampType => t.semanticEquals(tsE)
        case TimestampNTZType => tsE match {
          case c: Cast =>
            c.dataType == TimestampType && c.child.semanticEquals(t)
          // a registration DIRECTLY on an NTZ column (e.g. a parquet
          // ship-date with no zone): the user bound stays NTZ. The
          // session is pinned UTC (apply() bails otherwise), so NTZ
          // wall micros equal LTZ epoch micros and the bound can be
          // re-issued against the LTZ bucket unchanged.
          case _ =>
            tsE.dataType == TimestampNTZType && t.semanticEquals(tsE)
        }
        case _ => false
      }
      if (matches) Some(l.value.asInstanceOf[Long]) else None
    }
    def ltz(v: Long): Literal = Literal(v, TimestampType)
    def filterTranslate(c: Expression): Option[Expression] = {
      val dimRefs = AttributeSet(dimEs.flatMap(_._2.references))
      c match {
        case GreaterThanOrEqual(t, l: Literal)
            if tsBoundMicros(t, l).exists(aligned) =>
          tsBoundMicros(t, l).map(v => loBound(ltz(v), v))
        case LessThanOrEqual(l: Literal, t)
            if tsBoundMicros(t, l).exists(aligned) =>
          tsBoundMicros(t, l).map(v => loBound(ltz(v), v))
        case LessThan(t, l: Literal)
            if tsBoundMicros(t, l).exists(aligned) =>
          tsBoundMicros(t, l).map(v => hiBound(ltz(v), v))
        case GreaterThan(l: Literal, t)
            if tsBoundMicros(t, l).exists(aligned) =>
          tsBoundMicros(t, l).map(v => hiBound(ltz(v), v))
        case IsNotNull(e) => notNullTarget(e).map(IsNotNull)
        case _ =>
          // Dimension-only predicate of any shape: replace each embedded
          // dimension expression with its rollup column; succeed only if
          // no raw attribute survives.
          def dtx(e: Expression): Option[Expression] =
            dimByCanon.get(e.canonicalized) match {
              case Some(a) => Some(a)
              case None => e match {
                case _: AttributeReference => None
                case _ if e.children.nonEmpty =>
                  val kids = e.children.map(dtx)
                  if (kids.forall(_.isDefined))
                    Some(e.withNewChildren(kids.map(_.get)))
                  else None
                case l: Literal => Some(l)
                case _ => None
              }
            }
          if (c.references.subsetOf(dimRefs)) dtx(c) else None
      }
    }

    val conjuncts = filters.flatMap { case (cond, depth) =>
      splitConjunctivePredicates(inline(cond, maps, depth))
    }
    val newConjuncts = conjuncts.map(filterTranslate)
    if (newConjuncts.exists(_.isEmpty)) return None

    val child = newConjuncts.flatten.reduceOption(And)
      .map(Filter(_, rollup)).getOrElse(rollup)
    logInfo(s"RollupRouting: served aggregate from rollup " +
      s"(${entry.dimExprs.map(_._1).mkString(",")} @ ${entry.sliceMinutes}m)")
    Some(Aggregate(groupPairs.flatten.map(_._2), newResults.flatten, child))
  }
}

/** `SparkSessionExtensions` hook: build sessions with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` (or
  * `withExtensions(new GraftExtensions)`) to get routing without
  * touching `experimental`. */
final class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(s => RollupRouteRule(s))
}
