package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.TimeKernel.ts
import graft.model._
import graft.operators.{Rollups, Timeseries}

/** The rollup-serving contract: a query answered from materialized
  * slice partials is IDENTICAL to the same query over raw events
  * (re-aggregability — the property the reference's storage design
  * depends on, query.clj:66-72). */
class RollupsSpec extends SparkTestBase {
  import spark.implicits._

  private val counterFact = FactDef("clicks", FactType.Counter, sliceMinutes = 15)
  private val avgFact = FactDef("latency", FactType.Average, sliceMinutes = 15)

  // events spread over several days, two series, varying values
  private def rawCounter = (0 until 200).map { i =>
    ("s" + (i % 2), ts(f"2024-01-${1 + i % 5}%02dT${i % 24}%02d:${(i * 7) % 60}%02d"), 1L + i % 3)
  }.toDF("dim", "ts", "value")

  private def rawAvg = (0 until 100).map { i =>
    ("h" + (i % 2), ts(f"2024-01-${1 + i % 3}%02dT${i % 24}%02d:${(i * 11) % 60}%02d"), (50 + i).toLong)
  }.toDF("dim", "ts", "value")

  private def collectSorted(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("audit: healthy store is clean; a corrupted partial is flagged") {
    val store = Rollups.build(rawCounter, counterFact, 15, Seq("dim"))
    val clean = Rollups.audit(store, rawCounter, counterFact, 15, Seq("dim"))
      .collect()
    assert(clean.nonEmpty)
    assert(clean.map(_.getAs[Long]("n_mismatched")).sum == 0L, clean.toSeq)
    // flip one partial's value — exactly the single-bucket corruption
    // a partial write or manual surgery leaves behind
    val firstBucket = store.orderBy(col("dim"), col("bucket"))
      .head.getAs[java.sql.Timestamp]("bucket")
    val corrupted = store.withColumn("value",
      when(col("bucket") === firstBucket && col("dim") === "s0",
        col("value") + 1L).otherwise(col("value")))
    val bad = Rollups.audit(corrupted, rawCounter, counterFact, 15,
        Seq("dim")).collect()
    assert(bad.map(_.getAs[Long]("n_mismatched")).sum >= 1L, bad.toSeq)
    // and a MISSING key (dropped partition) is also a mismatch
    val dropped = store.where(!(col("dim") === "s0" &&
      col("bucket") === firstBucket))
    val miss = Rollups.audit(dropped, rawCounter, counterFact, 15,
        Seq("dim")).collect()
    assert(miss.map(_.getAs[Long]("n_mismatched")).sum >= 1L, miss.toSeq)
    // average stores audit BOTH partial columns: a total-only skew
    // (same counter) must still flag
    val avgStore = Rollups.build(rawAvg, avgFact, 15, Seq("dim"))
    val avgClean = Rollups.audit(avgStore, rawAvg, avgFact, 15, Seq("dim"))
      .collect()
    assert(avgClean.map(_.getAs[Long]("n_mismatched")).sum == 0L)
    val firstAvg = avgStore.orderBy(col("dim"), col("bucket"))
      .head.getAs[java.sql.Timestamp]("bucket")
    val skewed = avgStore.withColumn("total",
      when(col("bucket") === firstAvg && col("dim") === "h0",
        col("total") + 1L).otherwise(col("total")))
    val avgBad = Rollups.audit(skewed, rawAvg, avgFact, 15, Seq("dim"))
      .collect()
    assert(avgBad.map(_.getAs[Long]("n_mismatched")).sum >= 1L, avgBad.toSeq)
  }

  test("counter: rollup-served query == raw-events query (day step + fill)") {
    val dir = Files.createTempDirectory("rollup").toString
    Rollups.materialize(rawCounter, counterFact, 15, Seq("dim"), dir)
    val rollup = Rollups.read(spark, dir)
    val fromRollup = Rollups.run(rollup, counterFact, 15, Seq("dim"),
      Map("dim" -> Some("s1")), ts("2024-01-01T00:00"), ts("2024-01-06T00:00"),
      Step.Day)
    val fromRaw = Timeseries.run(rawCounter, counterFact, 15, Seq("dim"),
      Map("dim" -> Some("s1")), ts("2024-01-01T00:00"), ts("2024-01-06T00:00"),
      Step.Day)
    assert(collectSorted(fromRollup) == collectSorted(fromRaw))
    assert(fromRollup.count() == 5) // 5 day grid points, one series
  }

  test("counter: equivalence holds for hour step and :none") {
    val dir = Files.createTempDirectory("rollup").toString
    Rollups.materialize(rawCounter, counterFact, 15, Seq("dim"), dir)
    val rollup = Rollups.read(spark, dir)
    for (step <- Seq(Step.Hour, Step.NoStep)) {
      val a = Rollups.run(rollup, counterFact, 15, Seq("dim"), Map.empty,
        ts("2024-01-02T06:00"), ts("2024-01-04T18:00"), step)
      val b = Timeseries.run(rawCounter, counterFact, 15, Seq("dim"), Map.empty,
        ts("2024-01-02T06:00"), ts("2024-01-04T18:00"), step)
      assert(collectSorted(a) == collectSorted(b), s"step $step")
    }
  }

  test("average: (counter,total) partials re-aggregate exactly") {
    val dir = Files.createTempDirectory("rollup").toString
    Rollups.materialize(rawAvg, avgFact, 15, Seq("dim"), dir)
    val rollup = Rollups.read(spark, dir)
    val a = Rollups.run(rollup, avgFact, 15, Seq("dim"), Map.empty,
      ts("2024-01-01T00:00"), ts("2024-01-04T00:00"), Step.Day)
    val b = Timeseries.run(rawAvg, avgFact, 15, Seq("dim"), Map.empty,
      ts("2024-01-01T00:00"), ts("2024-01-04T00:00"), Step.Day)
    assert(collectSorted(a) == collectSorted(b))
    // and totals actually contain data
    assert(a.agg(sum("total")).head().getLong(0) > 0)
  }

  private val distinctFact =
    FactDef("uniq", FactType.Distinct, sliceMinutes = 15)

  test("distinct: tall (series × slice × value) partials re-aggregate exactly") {
    // value = user id; users deliberately recur across slices, hours,
    // and days, so a scalar-partial scheme (summing per-slice distinct
    // counts) would OVERCOUNT — only the retained values collapse
    // exactly at every step
    val rawDistinct = (0 until 300).map { i =>
      ("s" + (i % 2),
        ts(f"2024-01-${1 + i % 4}%02dT${i % 24}%02d:${(i * 13) % 60}%02d"),
        (i % 7).toLong) // 7 users cycling — heavy cross-slice recurrence
    }.toDF("dim", "ts", "value")
    val dir = Files.createTempDirectory("rollup-distinct").toString
    Rollups.materialize(rawDistinct, distinctFact, 15, Seq("dim"), dir)
    val rollup = Rollups.read(spark, dir)
    for (step <- Seq(Step.Day, Step.Hour, Step.NoStep)) {
      val a = Rollups.run(rollup, distinctFact, 15, Seq("dim"), Map.empty,
        ts("2024-01-01T00:00"), ts("2024-01-05T00:00"), step)
      val b = Timeseries.run(rawDistinct, distinctFact, 15, Seq("dim"),
        Map.empty, ts("2024-01-01T00:00"), ts("2024-01-05T00:00"), step)
      assert(collectSorted(a) == collectSorted(b), s"step $step")
    }
    // :none over the whole range = global distinct per series — with 7
    // cycling users both series must report exactly 7, the loudest
    // possible overcount detector
    val none = Timeseries.run(rawDistinct, distinctFact, 15, Seq("dim"),
      Map.empty, ts("2024-01-01T00:00"), ts("2024-01-05T00:00"), Step.NoStep)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(none == Map("s0" -> 7L, "s1" -> 7L), s"got $none")
  }

  test("service façade serves a DISTINCT fact end to end") {
    val svc = new TimeSeriesService(spark)
    svc.defineFact("uniq", FactType.Distinct, slice = 15)
    svc.defineDimension("dim", facts = Set("uniq"))
    // user 5 appears twice in the same hour, user 6 once; hour 11 empty
    Seq((ts("2024-02-01T10:05"), 5L), (ts("2024-02-01T10:20"), 5L),
      (ts("2024-02-01T10:40"), 6L), (ts("2024-02-01T12:10"), 5L))
      .foreach { case (t, u) => svc.newFact("uniq", t, u, Map("dim" -> "a")) }
    val got = pivot(svc.getTimeseries("uniq", "dim", Map("dim" -> Some("a")),
      ts("2024-02-01T10:00"), ts("2024-02-01T13:00"), Step.Hour), Seq("dim"))
    assert(got == Map(Map("dim" -> "a") -> Map(
      Option(ts("2024-02-01T10:00")) -> 2L,
      Option(ts("2024-02-01T11:00")) -> 0L,
      Option(ts("2024-02-01T12:00")) -> 1L)))
    // materialized rollups serve the same result
    val base = Files.createTempDirectory("svc-distinct").toString
    svc.materializeRollups(base)
    val viaRollup = pivot(svc.getTimeseries("uniq", "dim",
      Map("dim" -> Some("a")),
      ts("2024-02-01T10:00"), ts("2024-02-01T13:00"), Step.Hour), Seq("dim"))
    assert(viaRollup == got)
  }

  test("refreshRollups recomputes only the touched day partitions") {
    val svc = new TimeSeriesService(spark)
    svc.defineFact("clicks", FactType.Counter, slice = 15)
    svc.defineDimension("dim", facts = Set("clicks"))
    def ev(day: Int, hour: Int, v: Long): Unit =
      svc.newFact("clicks", ts(f"2024-03-$day%02dT$hour%02d:05"), v,
        Map("dim" -> "a"))
    ev(1, 10, 1L); ev(3, 12, 5L) // days 1 and 3
    val base = Files.createTempDirectory("svc-refresh").toString
    svc.materializeRollups(base)
    def daySnapshot(date: String): Map[String, Long] = {
      val d = new java.io.File(s"$base/dim_clicks/bucket_date=$date")
      if (!d.exists()) Map.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val d1Before = daySnapshot("2024-03-01")
    val d3Before = daySnapshot("2024-03-03")
    assert(d1Before.nonEmpty && d3Before.nonEmpty)
    // new day-2 event invalidates the materialized rollups…
    ev(2, 9, 7L)
    // …and a WINDOWED refresh of day 2 re-registers them, recomputing
    // only that day's partition
    svc.refreshRollups(base, ts("2024-03-02T00:00"), ts("2024-03-02T23:59"))
    val got = pivot(svc.getTimeseries("clicks", "dim",
      Map("dim" -> Some("a")),
      ts("2024-03-01T00:00"), ts("2024-03-04T00:00"), Step.Day), Seq("dim"))
    assert(got == Map(Map("dim" -> "a") -> Map(
      Option(ts("2024-03-01T00:00")) -> 1L,
      Option(ts("2024-03-02T00:00")) -> 7L,
      Option(ts("2024-03-03T00:00")) -> 5L)))
    // untouched day partitions were not rewritten (same files, same
    // mtimes); the refreshed day exists
    assert(daySnapshot("2024-03-01") == d1Before)
    assert(daySnapshot("2024-03-03") == d3Before)
    assert(daySnapshot("2024-03-02").nonEmpty)
  }

  test("sketch partials: cross-slice dedupe, exact in the coupon regime") {
    // one user hits in three slices of day 1 and once on day 2; a
    // second user only on day 1 — the sketch union must count each
    // user once per day (the collapse-exactness property), and at
    // this cardinality the DataSketches coupon list is exact
    val raw = Seq(
      ("click", ts("2024-03-01T10:05"), 7L),
      ("click", ts("2024-03-01T10:20"), 7L), // same user, next slice
      ("click", ts("2024-03-01T11:40"), 7L), // and again
      ("click", ts("2024-03-01T12:00"), 8L),
      ("click", ts("2024-03-02T09:10"), 7L))
      .toDF("event_type", "ts", "value")
    val partials = Rollups.sketchPartials(raw, Seq("event_type"))
    // slice granularity: 4 distinct (slice, sketch) rows on day 1
    assert(partials.count() == 5)
    val daily = Rollups.collapseSketchPartials(partials,
        Seq("event_type"), Step.Day)
      .collect().map(r => r.getTimestamp(1) -> r.getLong(2)).toMap
    assert(daily == Map(
      ts("2024-03-01T00:00") -> 2L,
      ts("2024-03-02T00:00") -> 1L), s"got $daily")
    // materialized round trip preserves the estimate
    val dir = Files.createTempDirectory("sketch-rt").toString
    Rollups.materializeSketchPartials(raw, Seq("event_type"), dir)
    val viaStore = Rollups.collapseSketchPartials(
        Rollups.read(spark, dir).drop("bucket_date"),
        Seq("event_type"), Step.Day)
      .collect().map(r => r.getTimestamp(1) -> r.getLong(2)).toMap
    assert(viaStore == daily)
  }

  test("service day tier: calendar reads ride it, sub-day reads do not") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def scanned(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collectLeaves().flatMap {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
          case _ => Nil
        }
        case _ => Nil
      }
    val svc = new TimeSeriesService(spark)
    svc.defineFact("uniq", FactType.Distinct, slice = 15)
    svc.defineDimension("dim", facts = Set("uniq"))
    // user 7 hits in TWO slices of day 1 and once on day 2: the day
    // tier must still count each user once per day (dval retained)
    svc.newFact("uniq", ts("2024-03-01T10:05"), 7L, Map("dim" -> "a"))
    svc.newFact("uniq", ts("2024-03-01T11:40"), 7L, Map("dim" -> "a"))
    svc.newFact("uniq", ts("2024-03-01T12:00"), 8L, Map("dim" -> "a"))
    svc.newFact("uniq", ts("2024-03-02T09:10"), 7L, Map("dim" -> "a"))
    val base = Files.createTempDirectory("svc-daytier").toString
    svc.materializeRollups(base)
    // 23:59 finish → the scan's inclusive-bucket upper bound lands on
    // midnight, making the whole window exact whole days
    def daily = svc.getTimeseries("uniq", "dim", Map("dim" -> Some("a")),
      ts("2024-03-01T00:00"), ts("2024-03-02T23:59"), Step.Day)
    assert(scanned(daily).exists(_.contains("__day")),
      s"daily read not on the day tier: ${scanned(daily)}")
    assert(pivot(daily, Seq("dim")) == Map(Map("dim" -> "a") -> Map(
      Option(ts("2024-03-01T00:00")) -> 2L,
      Option(ts("2024-03-02T00:00")) -> 1L)))
    // hour step is finer than the day tier's buckets → slice store
    val hourly = svc.getTimeseries("uniq", "dim", Map("dim" -> Some("a")),
      ts("2024-03-01T10:00"), ts("2024-03-01T13:00"), Step.Hour)
    assert(!scanned(hourly).exists(_.contains("__day")),
      s"hourly read wrongly on the day tier: ${scanned(hourly)}")
    assert(pivot(hourly, Seq("dim")) == Map(Map("dim" -> "a") -> Map(
      Option(ts("2024-03-01T10:00")) -> 1L,
      Option(ts("2024-03-01T11:00")) -> 1L,
      Option(ts("2024-03-01T12:00")) -> 1L)))
    // midnight-unaligned window → slice store even for a Day step
    val shifted = svc.getTimeseries("uniq", "dim", Map("dim" -> Some("a")),
      ts("2024-03-01T10:30"), ts("2024-03-02T10:30"), Step.Day)
    assert(!scanned(shifted).exists(_.contains("__day")),
      s"sub-day window wrongly on the day tier: ${scanned(shifted)}")
    // refresh keeps BOTH tiers fresh for the touched window
    svc.newFact("uniq", ts("2024-03-02T15:00"), 9L, Map("dim" -> "a"))
    svc.refreshRollups(base, ts("2024-03-02T00:00"), ts("2024-03-02T23:59"))
    val after = svc.getTimeseries("uniq", "dim", Map("dim" -> Some("a")),
      ts("2024-03-01T00:00"), ts("2024-03-02T23:59"), Step.Day)
    assert(scanned(after).exists(_.contains("__day")))
    assert(pivot(after, Seq("dim")) == Map(Map("dim" -> "a") -> Map(
      Option(ts("2024-03-01T00:00")) -> 2L,
      Option(ts("2024-03-02T00:00")) -> 2L)))
  }

  test("getSliceSeries serves registered stores, identical to raw") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val svc = new TimeSeriesService(spark)
    svc.defineFact("clicks", FactType.Counter, slice = 15)
    svc.defineDimension("dim", facts = Set("clicks"))
    svc.newFact("clicks", ts("2024-03-01T10:05"), 3L, Map("dim" -> "a"))
    svc.newFact("clicks", ts("2024-03-01T10:10"), 2L, Map("dim" -> "a"))
    svc.newFact("clicks", ts("2024-03-01T11:40"), 4L, Map("dim" -> "b"))
    def slices = svc.getSliceSeries("clicks", "dim",
      Map("dim" -> Some("a")),
      ts("2024-03-01T10:00"), ts("2024-03-01T12:00"))
    val raw = slices.collect().map(_.toSeq).toSet
    val base = Files.createTempDirectory("svc-sliceserve").toString
    svc.materializeRollups(base)
    val served = slices
    val paths = served.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
      case _ => Nil
    }
    assert(paths.exists(_.contains(base)), s"not store-served: $paths")
    assert(served.collect().map(_.toSeq).toSet == raw)
  }

  test("attachRollups: a restarted service serves from the found store") {
    val svc = new TimeSeriesService(spark)
    svc.defineFact("clicks", FactType.Counter, slice = 15)
    svc.defineDimension("dim", facts = Set("clicks"))
    svc.newFact("clicks", ts("2024-03-01T10:05"), 3L, Map("dim" -> "a"))
    svc.newFact("clicks", ts("2024-03-02T11:20"), 4L, Map("dim" -> "a"))
    val base = Files.createTempDirectory("svc-attach").toString
    svc.materializeRollups(base)
    def read(s: TimeSeriesService) = pivot(s.getTimeseries("clicks", "dim",
      Map("dim" -> Some("a")),
      ts("2024-03-01T00:00"), ts("2024-03-03T00:00"), Step.Day), Seq("dim"))
    val expect = read(svc)
    // "restart": same catalog, no events, no registrations — without
    // attach the read is empty (ALL history lives in the store)
    val svc2 = new TimeSeriesService(spark, svc.catalog)
    assert(read(svc2).isEmpty)
    assert(svc2.attachRollups(base).nonEmpty)
    assert(read(svc2) == expect, s"attached read: ${read(svc2)}")
    // attach over a directory with no matching stores finds nothing
    val svc3 = new TimeSeriesService(spark, svc.catalog)
    assert(svc3.attachRollups(
      Files.createTempDirectory("svc-attach-none").toString).isEmpty)
  }

  test("refreshRollups refuses a never-materialized target") {
    // a fact defined AFTER materializeRollups has no store directory:
    // refreshing it would write only the window and register a
    // history-less rollup (queries outside the window read nothing) —
    // it must fail loudly instead
    val svc = new TimeSeriesService(spark)
    svc.defineFact("clicks", FactType.Counter, slice = 15)
    svc.defineDimension("dim", facts = Set("clicks"))
    svc.newFact("clicks", ts("2024-03-01T10:05"), 1L, Map("dim" -> "a"))
    val base = Files.createTempDirectory("svc-refresh-miss").toString
    svc.materializeRollups(base)
    svc.defineFact("views", FactType.Counter, slice = 15)
    svc.updateDimension("dim", "views")
    svc.newFact("views", ts("2024-03-02T11:05"), 2L, Map("dim" -> "a"))
    val e = intercept[IllegalArgumentException] {
      svc.refreshRollups(base, ts("2024-03-02T00:00"),
        ts("2024-03-02T23:59"))
    }
    assert(e.getMessage.contains("materializeRollups"), e.getMessage)
  }

  private val histFact = FactDef("lat_hist", FactType.Histogram,
    sliceMinutes = 15, start = Some(0L), end = Some(100L), step = Some(20L))

  test("histogram: tall partials re-aggregate exactly (:none + day step + filters)") {
    val raw = rawAvg // values 50..149 spread across the bucket range
    val dir = Files.createTempDirectory("rollup").toString
    Rollups.materialize(raw, histFact, 15, Seq("dim"), dir)
    val rollup = Rollups.read(spark, dir)
    // partials are (dim, bucket, hist_bucket, value) rows
    assert(rollup.columns.toSet ==
      Set("dim", "bucket", "hist_bucket", "value", "bucket_date"))
    for ((step, filters) <- Seq(
        (Step.NoStep, Map.empty[String, Option[String]]),
        (Step.Day, Map.empty[String, Option[String]]),
        (Step.NoStep, Map("dim" -> Option("h1"))))) {
      val a = Rollups.runHistogram(rollup, histFact, 15, Seq("dim"), filters,
        ts("2024-01-01T00:00"), ts("2024-01-04T00:00"), step)
      val b = Timeseries.runHistogram(raw, histFact, 15, Seq("dim"), filters,
        ts("2024-01-01T00:00"), ts("2024-01-04T00:00"), step)
      assert(collectSorted(a) == collectSorted(b), s"step $step $filters")
      assert(a.count() > 0, s"step $step $filters")
    }
  }

  test("kll partials: small-set estimates are EXACT, slices merge losslessly") {
    // below k=200 retained items a KLL sketch stores every value, so
    // quantile reads are exact — the merge across slices/partitions is
    // what's under test, not the approximation
    val raw = (0 until 150).map { i =>
      // two days, values 1..150 in scrambled slice/partition order
      ("s" + (i % 2), ts(f"2024-01-${1 + (i / 2) % 2}%02dT${i % 24}%02d:${(i * 13) % 60}%02d"),
        (1L + (i * 101) % 150))
    }.toDF("dim", "ts", "value").repartition(7)
    val partials = Rollups.kllPartials(raw, Seq("dim"))
    // shape: one BINARY sketch per (dim, slice) — named `qsketch`, NOT
    // `sketch`: compactFrame dispatches merges by column name and the
    // HLL union would fail to heapify a KLL blob
    assert(partials.columns.toSeq == Seq("dim", "bucket", "qsketch"))
    val est = Rollups.collapseKllQuantiles(partials, Seq("dim"),
      Seq(50, 100), Step.NoStep)
    val got = est.collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // exact per-dim quantiles computed scala-side (inclusive rank rule:
    // smallest item whose rank/n >= q)
    val byDim = (0 until 150).map(i =>
      ("s" + (i % 2), 1L + (i * 101) % 150)).groupBy(_._1)
    for ((d, rows) <- byDim) {
      val sorted = rows.map(_._2).sorted
      val n = sorted.size
      def q(p: Double) = sorted(math.ceil(p * n).toInt - 1)
      assert(got(d) == ((q(0.5), q(1.0))), s"dim $d: ${got(d)}")
    }
    // calendar collapse: per-day estimates cover each day's values only
    val byDay = Rollups.collapseKllQuantiles(partials, Seq("dim"),
      Seq(100), Step.Day).collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) -> r.getLong(2)).toMap
    assert(byDay.size == 4)
    for (((d, day), mx) <- byDay) {
      val want = (0 until 150)
        .filter(i => "s" + (i % 2) == d &&
          1 + (i / 2) % 2 == day.toLocalDateTime.getDayOfMonth)
        .map(i => 1L + (i * 101) % 150).max
      assert(mx == want, s"$d $day")
    }

    // compaction of a KLL store (the streaming-maintained shape: one
    // partial per (key, slice, batch) plus storage-artifact columns)
    // merges to one row per (key, slice) and preserves quantile reads
    // EXACTLY here: merging a sketch with itself doubles every value's
    // multiplicity, which leaves inclusive-rank quantiles of this
    // exact-mode sketch unchanged
    val asStore = partials
      .withColumn("bucket_date", org.apache.spark.sql.functions.to_date(col("bucket")))
    val twoBatches = asStore.withColumn("__batch_id",
        org.apache.spark.sql.functions.lit("b0"))
      .unionByName(asStore.withColumn("__batch_id",
        org.apache.spark.sql.functions.lit("b1")))
    val compacted = Rollups.compactFrame(twoBatches)
    assert(compacted.columns.toSeq == Seq("dim", "bucket", "qsketch"))
    assert(compacted.count() == partials.count())
    val estC = Rollups.collapseKllQuantiles(compacted, Seq("dim"),
      Seq(50, 100), Step.NoStep).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(estC == got)
  }

  test("adviseRollups: one pass measures every candidate's compaction") {
    // 2 dims, 4 slices; dim a has 2 values, dim b has 4 — b's rollup
    // compacts less than a's, the pair grouping less than either
    val raw = (for {
      a <- 0 until 2; b <- 0 until 4; h <- 0 until 4; _ <- 0 until 3
    } yield ("a" + a, "b" + b, ts(f"2024-01-01T$h%02d:05"), 1L))
      .toDF("da", "db", "ts", "value")
    val advice = Rollups.adviseRollups(raw,
        Seq(Seq("da"), Seq("db"), Seq("da", "db")), sliceMinutes = 60)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // distinct (da, hour-slice) = 2 × 4; (db, slice) = 4 × 4; pair = 8 × 4
    assert(advice("da") == ((8L, 96L, 10000L * 96 / 8)))
    assert(advice("db") == ((16L, 96L, 10000L * 96 / 16)))
    assert(advice("da,db") == ((32L, 96L, 10000L * 96 / 32)))
    // null dim values count as groups (partials' null-keeping rule)
    val withNull = raw.withColumn("da",
      when(col("db") === "b0", lit(null)).otherwise(col("da")))
    val a2 = Rollups.adviseRollups(withNull, Seq(Seq("da")),
        sliceMinutes = 60)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a2("da") == 12L) // (null, a0, a1) × 4 slices
  }

  test("rollup parquet is date-partitioned for partition pruning") {
    val dir = Files.createTempDirectory("rollup").toString
    Rollups.materialize(rawCounter, counterFact, 15, Seq("dim"), dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("bucket_date=")).map(_.getName).sorted
    assert(parts.length == 5)
    assert(parts.head == "bucket_date=2024-01-01")
  }

  test("rollup is smaller than raw events (slice compaction)") {
    val dir = Files.createTempDirectory("rollup").toString
    Rollups.materialize(rawCounter, counterFact, 15, Seq("dim"), dir)
    assert(Rollups.read(spark, dir).count() < rawCounter.count())
  }

  test("events missing a grouping value never enter the rollup") {
    // event-key skips incomplete paths at write (postgres/update.clj:
    // 11-26); the raw-path scan drops them with its non-null filter —
    // both paths must agree when a dim value is null.
    val dir = Files.createTempDirectory("rollup_null").toString
    val withNull = rawCounter.union(
      Seq((null.asInstanceOf[String], ts("2024-01-02T10:00"), 7L))
        .toDF("dim", "ts", "value"))
    Rollups.materialize(withNull, counterFact, 15, Seq("dim"), dir)
    val a = Rollups.run(Rollups.read(spark, dir), counterFact, 15, Seq("dim"),
      Map.empty, ts("2024-01-01T00:00"), ts("2024-01-06T00:00"), Step.NoStep)
    val b = Timeseries.run(withNull, counterFact, 15, Seq("dim"),
      Map.empty, ts("2024-01-01T00:00"), ts("2024-01-06T00:00"), Step.NoStep)
    assert(collectSorted(a) == collectSorted(b))
    assert(!a.collect().exists(_.isNullAt(0)))
  }

  test("service: materializeRollups serves getTimeseries, writes invalidate") {
    import graft.functions.TimeKernel.ts
    val svc = TimeSeriesService(spark)
    svc.defineFact("signups", FactType.Counter, slice = 15)
    svc.defineDimension("country", facts = Set("signups"))
    svc.defineDimension("city", groupedBy = Seq(Seq("country")),
      facts = Set("signups"))
    svc.newFact("signups", ts("2024-02-01T09:07"), 1,
      Map("country" -> "uy", "city" -> "mvd"))
    svc.newFact("signups", ts("2024-02-01T10:22"), 2,
      Map("country" -> "uy", "city" -> "mvd"))
    svc.newFact("signups", ts("2024-02-01T10:40"), 3,
      Map("country" -> "ar", "city" -> "bsas"))
    def query() = pivot(svc.getTimeseries("signups", "city",
      Map("country" -> Some("uy")), ts("2024-02-01T09:00"),
      ts("2024-02-01T12:00"), Step.Hour), Seq("country", "city"))
    val fromRaw = query()

    val dir = Files.createTempDirectory("svc_rollup").toString
    val made = svc.materializeRollups(dir)
    // fan-out naming mirrors the reference's <path…>_<dim>_<fact>
    // (postgres/common.clj:25-32): city has path [country], country [].
    assert(made.map(_.stripPrefix(s"$dir/")).toSet ==
      Set("country_signups", "country_city_signups"))
    assert(query() == fromRaw) // rollup-served ≡ compute-on-read

    // a write invalidates; the query falls back to raw and sees new data
    svc.newFact("signups", ts("2024-02-01T11:05"), 5,
      Map("country" -> "uy", "city" -> "mvd"))
    val after = query()
    assert(after != fromRaw)
    assert(after(Map("country" -> "uy", "city" -> "mvd"))(
      Some(ts("2024-02-01T11:00"))) == 5L)
  }
}
