package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.operators.Rollups
import graft.plans.RollupRouting

/** The Catalyst routing rule: aggregates over the raw events source are
  * transparently rewritten onto materialized slice partials — result
  * rows must be identical to the unrouted plan, and the routed plan
  * must scan the rollup parquet instead of the events parquet. */
class RollupRoutingSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val rollupDir = {
    val d = java.nio.file.Files.createTempDirectory("graft_route").toString
    Rollups.materializePartials(raw, Seq("event_type"), d)
    d
  }

  private def raw: DataFrame =
    graft.sources.EventSource.wideEvents(spark, dir)

  private def withRouting[A](f: => A): A = {
    RollupRouting.install(spark)
    RollupRouting.register(spark, raw, Rollups.read(spark, rollupDir),
      Seq("event_type"))
    try f finally RollupRouting.clear(spark)
  }

  private def scannedPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
      case _ => Nil
    }

  private def hourly: DataFrame =
    raw.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("b"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"),
        min(col("value")).as("mn"), max(col("value")).as("mx"),
        avg(col("value")).as("av"))

  test("hourly grouped aggregate is served from the rollup, same rows") {
    val expected = hourly.collect().map(r =>
      (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getDouble(5)))
      .sortBy(t => (t._1, t._2.getTime))
    val (routedRows, paths) = withRouting {
      val df = hourly
      (df.collect(), scannedPaths(df))
    }
    assert(paths.exists(_.contains(rollupDir)), s"not routed: $paths")
    assert(!paths.exists(_.contains("events.parquet")), s"still raw: $paths")
    val routed = routedRows.map(r =>
      (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getDouble(5)))
      .sortBy(t => (t._1, t._2.getTime))
    assert(routed.length == expected.length)
    routed.zip(expected).foreach { case (a, b) =>
      assert(a._1 == b._1 && a._2 == b._2 && a._3 == b._3)
      assert(math.abs(a._4 - b._4) < 1e-9, s"min mismatch $a vs $b")
    }
    // float-summed partials: sum/avg re-aggregate within tolerance
    val svE = hourly.collect().map(r => (r.getString(0), r.getTimestamp(1)) ->
      (r.getDouble(3), r.getDouble(6))).toMap
    routedRows.foreach { r =>
      val (sv, av) = svE((r.getString(0), r.getTimestamp(1)))
      assert(math.abs(r.getDouble(3) - sv) < 1e-6)
      assert(math.abs(r.getDouble(6) - av) < 1e-9)
    }
  }

  test("aligned time bounds + dimension filter route, with pushdown") {
    def q: DataFrame = raw
      .where(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-05 00:00:00"))
        && col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-07 00:00:00"))
        && col("event_type") === "click")
      .groupBy(date_trunc("day", col("ts")).as("b"))
      .agg(count(lit(1)).as("n"))
    val expected = q.collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val (rows, paths, physical) = withRouting {
      val df = q
      (df.collect(), scannedPaths(df), df.queryExecution.executedPlan.toString)
    }
    assert(paths.exists(_.contains(rollupDir)))
    assert(rows.map(r => r.getTimestamp(0) -> r.getLong(1)).toMap == expected)
    // the rewritten Filter reaches the rollup scan as pushed filters,
    // and the implied bucket_date bounds prune whole date partitions
    assert(physical.contains("PushedFilters: ["), physical)
    assert("PartitionFilters: \\[[^\\]]*bucket_date".r
      .findFirstIn(physical).isDefined, physical)
  }

  test("unaligned time bound does NOT route") {
    val paths = withRouting {
      scannedPaths(raw
        .where(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-05 00:07:00")))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n")))
    }
    assert(!paths.exists(_.contains(rollupDir)), s"wrongly routed: $paths")
  }

  test("aggregate the rollup cannot answer does NOT route") {
    val paths = withRouting {
      scannedPaths(raw.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("users")))
    }
    assert(!paths.exists(_.contains(rollupDir)), s"wrongly routed: $paths")
  }

  test("SQL over a temp view routes too") {
    raw.createOrReplaceTempView("__route_ev")
    val sql = """SELECT event_type, date_trunc('hour', ts) AS b, count(*) AS n
                |FROM __route_ev
                |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
                |  AND ts < TIMESTAMP '2024-01-11 00:00:00'
                |GROUP BY 1, 2""".stripMargin
    val expected = spark.sql(sql).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).sorted
    val (rows, paths) = withRouting {
      val df = spark.sql(sql)
      (df.collect(), scannedPaths(df))
    }
    assert(paths.exists(_.contains(rollupDir)), s"not routed: $paths")
    assert(rows.map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      .sorted.sameElements(expected))
  }

  test("non-UTC session timezone disables routing (correct raw plan kept)") {
    val paths = withRouting {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      try scannedPaths(hourly)
      finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    }
    assert(!paths.exists(_.contains(rollupDir)), s"routed in non-UTC: $paths")
    // and register() itself refuses a non-UTC session outright
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try intercept[IllegalArgumentException] {
      RollupRouting.register(spark, raw, Rollups.read(spark, rollupDir),
        Seq("event_type"))
    } finally {
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      RollupRouting.clear(spark)
    }
  }

  test("IsNotNull through a null-TOLERANT dim registration does not route") {
    // dim registered as coalesce(event_type, 'unknown'): rows where
    // event_type IS NULL survive on the rollup side as 'unknown', so a
    // raw-side IsNotNull(event_type) must NOT be absorbed into
    // IsNotNull(dim) — the rule has to leave the plan unrouted.
    val raw2 = raw.select(
      coalesce(col("event_type"), lit("unknown")).as("etype"),
      col("ts"), col("value"))
    val d2 = java.nio.file.Files.createTempDirectory("graft_ni").toString
    Rollups.materializePartials(raw2, Seq("etype"), d2)
    RollupRouting.install(spark)
    RollupRouting.register(spark, raw2, Rollups.read(spark, d2), Seq("etype"))
    try {
      val q = raw.where(col("event_type").isNotNull)
        .groupBy(coalesce(col("event_type"), lit("unknown")).as("etype"))
        .agg(count(lit(1)).as("n"))
      assert(!scannedPaths(q).exists(_.contains(d2)),
        "null-tolerant registration absorbed IsNotNull")
      // without the raw-column IsNotNull the same aggregate DOES route
      val q2 = raw.groupBy(coalesce(col("event_type"), lit("unknown")).as("etype"))
        .agg(count(lit(1)).as("n"))
      assert(scannedPaths(q2).exists(_.contains(d2)), "coalesce group no longer routes")
    } finally RollupRouting.clear(spark)
  }

  test("global aggregate: count(*) stays 0-valued on empty range") {
    val (n, paths) = withRouting {
      val df = raw
        .where(col("ts") >= lit(java.sql.Timestamp.valueOf("2031-01-01 00:00:00")))
        .agg(count(lit(1)).as("n"))
      (df.collect()(0).getLong(0), scannedPaths(df))
    }
    assert(paths.exists(_.contains(rollupDir)))
    assert(n == 0L)
  }

  test("two covering rollups: the narrowest is routed (best-grouping)") {
    // the reference's best-grouping picks the most specific covering
    // pre-aggregation (postgres/query.clj:19-28); the Catalyst twin
    // must prefer the fewest-dimension covering rollup, not whichever
    // registered first — a wider rollup carries rows this query would
    // immediately re-aggregate away
    val wideD = java.nio.file.Files.createTempDirectory("graft_rt_wide").toString
    val narrowD = java.nio.file.Files.createTempDirectory("graft_rt_nar").toString
    Rollups.materializePartials(raw, Seq("event_type", "user_id"), wideD)
    Rollups.materializePartials(raw, Seq("event_type"), narrowD)
    def q: DataFrame = raw.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
    val expected = q.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    RollupRouting.install(spark)
    // WIDE registered first: registration order must not decide
    RollupRouting.register(spark, raw, Rollups.read(spark, wideD),
      Seq("event_type", "user_id"))
    RollupRouting.register(spark, raw, Rollups.read(spark, narrowD),
      Seq("event_type"))
    try {
      val paths = scannedPaths(q)
      assert(paths.exists(_.contains(narrowD)), s"narrow not chosen: $paths")
      assert(!paths.exists(_.contains(wideD)), s"wide chosen: $paths")
      assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSet
        == expected)
      // a query grouping by user_id too is only covered by the wide
      // rollup — it must still route there
      val q2 = raw.groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n"))
      val p2 = scannedPaths(q2)
      assert(p2.exists(_.contains(wideD)), s"wide query not routed: $p2")
    } finally RollupRouting.clear(spark)
  }

  test("COUNT DISTINCT routes onto distinct tall partials — and only it") {
    val dDir = java.nio.file.Files.createTempDirectory("graft_rt_dst").toString
    Rollups.materializeDistinctPartials(raw, Seq("event_type"), dDir,
      valueCol = "user_id")
    def q: DataFrame = raw
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("b"))
      .agg(countDistinct(col("user_id")).as("u"))
    def qSum: DataFrame = raw.groupBy(col("event_type"))
      .agg(sum(col("user_id")).as("s"))
    val expected = q.collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    val sumExpected = qSum.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    RollupRouting.install(spark)
    RollupRouting.registerDistinct(spark, raw, Rollups.read(spark, dDir),
      Seq("event_type"), valueCol = "user_id")
    try {
      val paths = scannedPaths(q)
      assert(paths.exists(_.contains(dDir)), s"distinct not routed: $paths")
      assert(q.collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
        == expected)
      // a SUM over the same raw must NOT ride the distinct partials
      // (they cannot re-aggregate sums of the value column)
      assert(!scannedPaths(qSum).exists(_.contains(dDir)),
        "sum wrongly routed onto distinct partials")
      assert(qSum.collect().map(r => (r.getString(0), r.getLong(1))).toSet
        == sumExpected)
    } finally RollupRouting.clear(spark)
  }

  test("hierarchical tiers: day queries ride the day tier, hour the slice") {
    val dayDir = java.nio.file.Files.createTempDirectory("graft_rt_day").toString
    Rollups.materializeDayPartials(Rollups.read(spark, rollupDir), dayDir)
    def dayQ: DataFrame = raw
      .where(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-05 00:00:00"))
        && col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-09 00:00:00")))
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("b"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
    def hourQ: DataFrame = raw
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("b"))
      .agg(count(lit(1)).as("n"))
    def monthQ: DataFrame = raw
      .groupBy(date_trunc("month", col("ts")).as("b"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("mn"))
    val expDay = dayQ.collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    val expMonth = monthQ.collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
    RollupRouting.install(spark)
    RollupRouting.register(spark, raw, Rollups.read(spark, rollupDir),
      Seq("event_type"))
    RollupRouting.registerDayGrain(spark, raw, Rollups.read(spark, dayDir),
      Seq("event_type"))
    try {
      // day-truncated query with midnight bounds: the COARSE tier wins
      val pDay = scannedPaths(dayQ)
      assert(pDay.exists(_.contains(dayDir)), s"day not on day tier: $pDay")
      assert(!pDay.exists(_.contains(rollupDir)),
        s"day query wrongly on slice tier: $pDay")
      assert(dayQ.collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
        == expDay)
      // calendar units above day re-aggregate from the day tier too
      val pMonth = scannedPaths(monthQ)
      assert(pMonth.exists(_.contains(dayDir)), s"month: $pMonth")
      assert(monthQ.collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
        == expMonth)
      // hour truncation is OUT OF REACH for day buckets — slice tier
      val pHour = scannedPaths(hourQ)
      assert(pHour.exists(_.contains(rollupDir)), s"hour: $pHour")
      assert(!pHour.exists(_.contains(dayDir)),
        s"hour query wrongly on day tier: $pHour")
      // a sub-day-aligned bound cannot ride the day tier: 03:00 is
      // slice-aligned (15m) but not midnight — the slice tier serves
      val pBound = scannedPaths(raw
        .where(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-05 03:00:00")))
        .groupBy(date_trunc("day", col("ts")).as("b"))
        .agg(count(lit(1)).as("n")))
      assert(pBound.exists(_.contains(rollupDir)) &&
        !pBound.exists(_.contains(dayDir)),
        s"sub-day bound mis-tiered: $pBound")
    } finally RollupRouting.clear(spark)
  }

  test("fuzz: random aggregate shapes never change results, routed or not") {
    // metamorphic property for the flagship rule: whatever random
    // combination of grouping keys, aggregate set, and (possibly
    // unaligned) time bounds the user writes, installing the rule may
    // only swap the SCAN — the rows must be identical. The rule's own
    // mechanics (when it routes, which tier) are pinned by the
    // deterministic tests; this pins that it is SEMANTICS-PRESERVING
    // under shapes nobody hand-wrote.
    import scala.util.Random
    def runShape(rnd: Random): DataFrame = {
      val base = raw
      val bounded =
        if (rnd.nextBoolean()) {
          val lo = f"2024-01-${3 + rnd.nextInt(4)}%02d " +
            (if (rnd.nextBoolean()) "00:00:00"
             else f"${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")
          base.where(col("ts") >= lit(java.sql.Timestamp.valueOf(lo)))
        } else base
      val groups = Seq(
        Seq(col("event_type")),
        Seq(date_trunc("day", col("ts")).as("b")),
        Seq(col("event_type"), date_trunc("hour", col("ts")).as("b")),
        Seq.empty[org.apache.spark.sql.Column])(rnd.nextInt(4))
      val aggs = Random.javaRandomToRandom(new java.util.Random(rnd.nextInt()))
        .shuffle(Seq(
          count(lit(1)).as("cnt"), sum(col("value")).as("sv"),
          min(col("value")).as("mn"), max(col("value")).as("mx"),
          avg(col("value")).as("av")))
        .take(1 + rnd.nextInt(4))
      if (groups.isEmpty) bounded.agg(aggs.head, aggs.tail: _*)
      else bounded.groupBy(groups: _*).agg(aggs.head, aggs.tail: _*)
    }
    def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
      rows.map(_.toSeq.map {
        case d: Double => f"$d%.6f" // float-summed partials: tolerance
        case x => String.valueOf(x)
      }.mkString("|")).sorted.toSeq
    for (seed <- 1 to 12) {
      val expected = canon(runShape(new Random(seed)).collect())
      val got = withRouting {
        canon(runShape(new Random(seed)).collect())
      }
      assert(got == expected, s"seed $seed diverged")
    }
  }

  test("composition above a routed aggregate still routes (trend fold)") {
    // the series_trend_routed shape: a second aggregation + arithmetic
    // stacked ON TOP of the routable daily count — transformUp rewrites
    // the inner Aggregate regardless of what consumes it
    def trendQ: DataFrame = {
      val daily = raw
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
        .withColumn("day_idx", (col("day").cast("long") / 86400L).cast("long"))
      daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), sum(col("y")).as("sy"),
          sum(col("day_idx") * col("y")).as("sxy"))
    }
    val expected = trendQ.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    withRouting {
      val p = scannedPaths(trendQ)
      assert(p.exists(_.contains(rollupDir)),
        s"inner daily aggregate not routed under composition: $p")
      assert(!p.exists(_.contains("events")),
        s"raw events still scanned: $p")
      val got = trendQ.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == expected, "routed trend fold diverged from raw")
    }
  }

  test("distinct day tier: day COUNT DISTINCT rides it, hour stays on slices") {
    val sliceDir = java.nio.file.Files
      .createTempDirectory("graft_rt_dsl").toString
    Rollups.materializeDistinctPartials(raw, Seq("event_type"), sliceDir,
      valueCol = "user_id")
    val dayDir = java.nio.file.Files
      .createTempDirectory("graft_rt_dday").toString
    Rollups.materializeDistinctDayPartials(
      Rollups.read(spark, sliceDir), dayDir)
    def dayQ: DataFrame = raw
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("b"))
      .agg(countDistinct(col("user_id")).as("u"))
    def hourQ: DataFrame = raw
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("b"))
      .agg(countDistinct(col("user_id")).as("u"))
    val expDay = dayQ.collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    val expHour = hourQ.collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    RollupRouting.install(spark)
    RollupRouting.registerDistinct(spark, raw, Rollups.read(spark, sliceDir),
      Seq("event_type"), valueCol = "user_id")
    RollupRouting.registerDistinctDayGrain(spark, raw,
      Rollups.read(spark, dayDir), Seq("event_type"), valueCol = "user_id")
    try {
      // day truncation: the coarse tier wins and the count stays exact
      // (a user active in many slices of one day counts once)
      val pDay = scannedPaths(dayQ)
      assert(pDay.exists(_.contains(dayDir)), s"day not on day tier: $pDay")
      assert(!pDay.exists(_.contains(sliceDir)),
        s"day query wrongly on slice tier: $pDay")
      assert(dayQ.collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
        == expDay)
      // hour truncation cannot ride day buckets — slice tier serves
      val pHour = scannedPaths(hourQ)
      assert(pHour.exists(_.contains(sliceDir)) &&
        !pHour.exists(_.contains(dayDir)), s"hour mis-tiered: $pHour")
      assert(hourQ.collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
        == expHour)
    } finally RollupRouting.clear(spark)
  }

  test("count-by-histogram-bucket routes onto histogram tall partials") {
    import graft.model.{FactDef, FactType}
    import graft.operators.Timeseries
    val hFact = FactDef("vh", FactType.Histogram, sliceMinutes = 15,
      start = Some(0L), end = Some(200L), step = Some(20L))
    val hDir = java.nio.file.Files.createTempDirectory("graft_rt_hist").toString
    Rollups.materializeHistogramPartials(raw, Seq("event_type"),
      Timeseries.histBucket(hFact), hDir)
    def q: DataFrame = raw
      .where(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-05 00:00:00"))
        && col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-07 00:00:00")))
      .groupBy(col("event_type"), Timeseries.histBucket(hFact))
      .agg(count(lit(1)).as("value"))
    def qSum: DataFrame = raw
      .groupBy(col("event_type"), Timeseries.histBucket(hFact))
      .agg(sum(col("value")).as("s"))
    val expected = q.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val sumExpected = qSum.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    RollupRouting.install(spark)
    RollupRouting.registerHistogram(spark, raw, Rollups.read(spark, hDir),
      Seq("event_type"), Timeseries.histBucket(hFact))
    try {
      val paths = scannedPaths(q)
      assert(paths.exists(_.contains(hDir)), s"hist not routed: $paths")
      assert(q.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
        == expected)
      // a SUM of the raw value must NOT ride histogram partials (they
      // carry bucket counts, not value sums)
      assert(!scannedPaths(qSum).exists(_.contains(hDir)),
        "sum wrongly routed onto histogram partials")
      assert(qSum.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
        == sumExpected)
    } finally RollupRouting.clear(spark)
  }

  test("histogram day tier: day series ride it, hour stays on slices") {
    import graft.model.{FactDef, FactType}
    import graft.operators.Timeseries
    val hFact = FactDef("vh", FactType.Histogram, sliceMinutes = 15,
      start = Some(0L), end = Some(200L), step = Some(20L))
    val sliceDir = java.nio.file.Files
      .createTempDirectory("graft_rt_hsl").toString
    Rollups.materializeHistogramPartials(raw, Seq("event_type"),
      Timeseries.histBucket(hFact), sliceDir)
    val dayDir = java.nio.file.Files
      .createTempDirectory("graft_rt_hday").toString
    Rollups.materializeHistogramDayPartials(
      Rollups.read(spark, sliceDir), dayDir)
    def dayQ: DataFrame = raw
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("b"),
        Timeseries.histBucket(hFact))
      .agg(count(lit(1)).as("value"))
    def hourQ: DataFrame = raw
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("b"),
        Timeseries.histBucket(hFact))
      .agg(count(lit(1)).as("value"))
    def key(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getLong(3))).toSet
    val (expDay, expHour) = (key(dayQ), key(hourQ))
    RollupRouting.install(spark)
    RollupRouting.registerHistogram(spark, raw,
      Rollups.read(spark, sliceDir), Seq("event_type"),
      Timeseries.histBucket(hFact))
    RollupRouting.registerHistogramDayGrain(spark, raw,
      Rollups.read(spark, dayDir), Seq("event_type"),
      Timeseries.histBucket(hFact))
    try {
      val pDay = scannedPaths(dayQ)
      assert(pDay.exists(_.contains(dayDir)), s"day not on day tier: $pDay")
      assert(!pDay.exists(_.contains(sliceDir)),
        s"day query wrongly on slice tier: $pDay")
      assert(key(dayQ) == expDay)
      val pHour = scannedPaths(hourQ)
      assert(pHour.exists(_.contains(sliceDir)) &&
        !pHour.exists(_.contains(dayDir)), s"hour mis-tiered: $pHour")
      assert(key(hourQ) == expHour)
    } finally RollupRouting.clear(spark)
  }

  test("distinct routing preserves NULL dimension and NULL value groups") {
    // a raw GROUP BY dim emits the NULL-dim group; a routed plan served
    // from null-dropping partials (the service write path's semantics)
    // would silently lose it — distinctPartials must keep nulls so the
    // rewrite stays a pure physical substitution
    import spark.implicits._
    val t = graft.functions.TimeKernel.ts("2024-01-05T10:07:00")
    val base = java.nio.file.Files.createTempDirectory("graft_nulld").toString
    Seq[(Long, java.sql.Timestamp, java.lang.Long, String, Double, String)](
        (1L, t, 7L, "click", 1.0, "{}"),
        (2L, t, 8L, null, 1.0, "{}"),      // NULL dim, distinct user
        (3L, t, 8L, null, 1.0, "{}"),      // NULL dim, same user again
        (4L, t, null, "view", 1.0, "{}"),  // NULL value: count distinct skips
        (5L, t, 9L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$base/events.parquet")
    val nRaw = graft.sources.EventSource.wideEvents(spark, base)
    val dDir = java.nio.file.Files.createTempDirectory("graft_nulld_r").toString
    Rollups.materializeDistinctPartials(nRaw, Seq("event_type"), dDir,
      valueCol = "user_id")
    def q: DataFrame = nRaw.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
    val expected = q.collect()
      .map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    assert(expected == Set((Some("click"), 1L), (None, 1L), (Some("view"), 1L)),
      s"fixture sanity: $expected")
    RollupRouting.install(spark)
    RollupRouting.registerDistinct(spark, nRaw, Rollups.read(spark, dDir),
      Seq("event_type"), valueCol = "user_id")
    try {
      val paths = scannedPaths(q)
      assert(paths.exists(_.contains(dDir)), s"not routed: $paths")
      val routed = q.collect()
        .map(r => (Option(r.getString(0)), r.getLong(1))).toSet
      assert(routed == expected, s"routed $routed != raw $expected")
    } finally RollupRouting.clear(spark)
  }

  test("time-bounded routing works across every fixture ts encoding") {
    // the driver has shipped events.ts as nanos-int64, TIMESTAMP_NTZ,
    // and a Spark producer writes TIMESTAMP — aligned bounds must route
    // whichever encoding the registered raw frame was read from
    // (UnwrapCastInBinaryComparison rewrites NTZ-sourced bounds onto
    // the raw column with NTZ literals; the rule must catch both forms)
    import spark.implicits._
    val t1 = graft.functions.TimeKernel.ts("2024-01-05T10:07:00")
    val t2 = graft.functions.TimeKernel.ts("2024-01-06T11:09:00")
    val base = java.nio.file.Files.createTempDirectory("graft_enc").toString
    Seq((1L, t1.getTime * 1000000L, 1L, "click", 1.0, "{}"),
        (2L, t2.getTime * 1000000L, 2L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$base/nanos/events.parquet")
    Seq((1L, t1.toLocalDateTime, 1L, "click", 1.0, "{}"),
        (2L, t2.toLocalDateTime, 2L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$base/ntz/events.parquet")
    Seq((1L, t1, 1L, "click", 1.0, "{}"), (2L, t2, 2L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$base/ltz/events.parquet")
    Seq("nanos", "ntz", "ltz").foreach { enc =>
      val encRaw = graft.sources.EventSource.wideEvents(spark, s"$base/$enc")
      val d = java.nio.file.Files.createTempDirectory(s"graft_enc_$enc").toString
      Rollups.materializePartials(encRaw, Seq("event_type"), d)
      RollupRouting.install(spark)
      RollupRouting.register(spark, encRaw, Rollups.read(spark, d),
        Seq("event_type"))
      try {
        val q = encRaw
          .where(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-05 00:00:00"))
            && col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-06 00:00:00")))
          .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        assert(scannedPaths(q).exists(_.contains(d)), s"$enc: not routed")
        val rows = q.collect().map(r => (r.getString(0), r.getLong(1))).toSet
        assert(rows == Set(("click", 1L)), s"$enc: wrong rows $rows")
      } finally RollupRouting.clear(spark)
    }
  }
}
