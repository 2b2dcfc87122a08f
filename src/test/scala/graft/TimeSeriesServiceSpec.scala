package graft

import graft.functions.TimeKernel.ts
import graft.model.{FactType, Step}
import graft.operators.Timeseries

/** Golden end-to-end scenarios ported 1:1 from the reference test suites
  * (`test/time_series_storage/mem_test.clj:81-133`,
  * `postgres_test.clj:93-161`, `query_test.clj:1-74`) — see FIXTURES.md. */
class TimeSeriesServiceSpec extends SparkTestBase {

  private def freshService(): TimeSeriesService = {
    val svc = new TimeSeriesService(spark)
    svc.defineFact("signups", FactType.Counter, slice = 10,
      name = Some("Cantidad de registros"))
    svc.defineDimension("dependency", name = Some("Dependencia de Correo"),
      facts = Set("signups"))
    svc.defineDimension("dependency_user", name = Some("Usuario"),
      groupedBy = Seq(Seq("dependency")), facts = Set("signups"))
    svc.newFact("signups", ts("2014-03-21T09:09"), 1,
      Map("dependency" -> "32", "dependency_user" -> "pepe"))
    svc.newFact("signups", ts("2014-03-21T10:23"), 1,
      Map("dependency" -> "31", "dependency_user" -> "juanele"))
    svc
  }

  test("golden 1: filtered single series, step none (postgres_test.clj:106-114)") {
    val svc = freshService()
    val df = svc.getTimeseries("signups", "dependency_user",
      Map("dependency" -> Some("31")),
      ts("2014-03-21T09:00"), ts("2014-03-21T13:00"))
    assert(pivot(df, Seq("dependency", "dependency_user")) === Map(
      Map("dependency" -> "31", "dependency_user" -> "juanele") -> Map(None -> 1L)))
  }

  test("golden 2: nil filter matches all series (postgres_test.clj:116-125)") {
    val svc = freshService()
    val df = svc.getTimeseries("signups", "dependency_user",
      Map("dependency" -> None),
      ts("2014-03-21T09:00"), ts("2014-03-21T13:00"))
    assert(pivot(df, Seq("dependency", "dependency_user")) === Map(
      Map("dependency" -> "32", "dependency_user" -> "pepe") -> Map(None -> 1L),
      Map("dependency" -> "31", "dependency_user" -> "juanele") -> Map(None -> 1L)))
  }

  test("golden 3: hourly step, zero fill, finish-exclusive grid (postgres_test.clj:127-144)") {
    val svc = freshService()
    val df = svc.getTimeseries("signups", "dependency_user",
      Map("dependency" -> Some("31")),
      ts("2014-03-21T09:00"), ts("2014-03-21T13:00"), Step.Hour)
    assert(pivot(df, Seq("dependency", "dependency_user")) === Map(
      Map("dependency" -> "31", "dependency_user" -> "juanele") -> Map(
        Some(ts("2014-03-21T09:00")) -> 0L,
        Some(ts("2014-03-21T10:00")) -> 1L,
        Some(ts("2014-03-21T11:00")) -> 0L,
        Some(ts("2014-03-21T12:00")) -> 0L)))
  }

  test("golden 4: counter with value 3 (postgres_test.clj:147-161)") {
    val svc = new TimeSeriesService(spark)
    svc.defineFact("signups", FactType.Counter, slice = 10)
    svc.defineDimension("dependency", facts = Set("signups"))
    svc.newFact("signups", ts("2014-03-21T00:00"), 3, Map("dependency" -> "32"))
    val df = svc.getTimeseries("signups", "dependency", Map.empty,
      ts("2014-03-20T00:00"), ts("2014-03-22T00:00"))
    assert(pivot(df, Seq("dependency")) === Map(
      Map("dependency" -> "32") -> Map(None -> 3L)))
  }

  test("golden 5: hourly collapse re-buckets 10-min slices (query_test.clj:26-38)") {
    val svc = new TimeSeriesService(spark)
    svc.defineFact("visits", FactType.Counter, slice = 10)
    svc.defineDimension("key", facts = Set("visits"))
    // rows at 09:00 +0/40/80/130 minutes with counters 2/1/8/4
    Seq(("2014-03-21T09:00", 2L), ("2014-03-21T09:40", 1L),
      ("2014-03-21T10:20", 8L), ("2014-03-21T11:10", 4L)).foreach {
      case (t, v) => svc.newFact("visits", ts(t), v, Map("key" -> "some-key"))
    }
    val df = svc.getTimeseries("visits", "key", Map.empty,
      ts("2014-03-21T09:00"), ts("2014-03-21T12:00"), Step.Hour)
    assert(pivot(df, Seq("key")) === Map(
      Map("key" -> "some-key") -> Map(
        Some(ts("2014-03-21T09:00")) -> 3L,
        Some(ts("2014-03-21T10:00")) -> 8L,
        Some(ts("2014-03-21T11:00")) -> 4L)))
  }

  test("golden 6: average keeps (counter,total) pairs per hour (query_test.clj:61-74)") {
    val svc = new TimeSeriesService(spark)
    svc.defineFact("took", FactType.Average, slice = 10)
    svc.defineDimension("key", facts = Set("took"))
    // hour 09: 3 events totaling 50; hour 10: 8 totaling 34; hour 11: 4 totaling 42
    val events = Seq(
      ("2014-03-21T09:00", Seq(5L, 15L)), ("2014-03-21T09:40", Seq(30L)),
      ("2014-03-21T10:20", Seq(4L, 4L, 4L, 4L, 4L, 4L, 4L, 6L)),
      ("2014-03-21T11:10", Seq(10L, 10L, 10L, 12L)))
    events.foreach { case (t, vs) =>
      vs.foreach(v => svc.newFact("took", ts(t), v, Map("key" -> "some-key")))
    }
    val df = svc.getTimeseries("took", "key", Map.empty,
      ts("2014-03-21T09:00"), ts("2014-03-21T12:00"), Step.Hour)
    assert(pivotAvg(df, Seq("key")) === Map(
      Map("key" -> "some-key") -> Map(
        Some(ts("2014-03-21T09:00")) -> ((3L, 50L)),
        Some(ts("2014-03-21T10:00")) -> ((8L, 34L)),
        Some(ts("2014-03-21T11:00")) -> ((4L, 42L)))))
  }

  test("routing: best-grouping picks first covering path, appends dim, falls back") {
    val gb = Seq(Seq("company"), Seq("company", "campaign"))
    assert(Timeseries.bestGrouping(gb, "channel", Set("company")) ===
      Seq("company", "channel"))
    assert(Timeseries.bestGrouping(gb, "channel", Set("company", "campaign")) ===
      Seq("company", "campaign", "channel"))
    assert(Timeseries.bestGrouping(gb, "channel", Set.empty) ===
      Seq("company", "channel"))
    assert(Timeseries.bestGrouping(gb, "channel", Set("channel")) ===
      Seq("company", "channel"))
    // no covering path -> just the dimension
    assert(Timeseries.bestGrouping(gb, "channel", Set("other")) === Seq("channel"))
  }

  test("incomplete grouping paths are skipped (event-key, postgres/update.clj:11-26)") {
    val svc = freshService()
    // event carrying only dependency_user: counted in the flat [dim] path
    // — but dependency_user has no flat path (groupedBy [[dependency]]),
    // so a query routed to [dependency, dependency_user] must not see it.
    svc.newFact("signups", ts("2014-03-21T10:25"), 1,
      Map("dependency_user" -> "solo"))
    val df = svc.getTimeseries("signups", "dependency_user",
      Map("dependency" -> None),
      ts("2014-03-21T09:00"), ts("2014-03-21T13:00"))
    val got = pivot(df, Seq("dependency", "dependency_user"))
    assert(!got.keySet.exists(_.get("dependency_user").contains("solo")))
    assert(got.size === 2)
  }

  test("boundary: scan includes the bucketed finish endpoint (range-where inclusive)") {
    val svc = freshService()
    // 12:59 is inside slice bucket 12:50 <= slice(13:00)=13:00? No:
    // slice(13:00)=13:00, event at 13:05 -> bucket 13:00 == included;
    // event at 13:10+slice -> excluded.
    svc.newFact("signups", ts("2014-03-21T13:05"), 1,
      Map("dependency" -> "31", "dependency_user" -> "juanele"))
    svc.newFact("signups", ts("2014-03-21T13:11"), 1,
      Map("dependency" -> "31", "dependency_user" -> "juanele"))
    val df = svc.getTimeseries("signups", "dependency_user",
      Map("dependency" -> Some("31")),
      ts("2014-03-21T09:00"), ts("2014-03-21T13:00"))
    // 10:23 event + 13:05 event (bucket 13:00, inclusive); 13:11 excluded
    assert(pivot(df, Seq("dependency", "dependency_user")) === Map(
      Map("dependency" -> "31", "dependency_user" -> "juanele") -> Map(None -> 2L)))
  }

  test("validation errors match the reference messages (FIXTURES §4)") {
    val svc = freshService()
    val e1 = intercept[IllegalArgumentException] {
      svc.newFact("signups", ts("2014-03-21T09:00"), 1, Map("dependency" -> null))
    }
    assert(e1.getMessage.contains("Some categories have nil values"))
    val e2 = intercept[IllegalArgumentException] {
      svc.newFact("nope", ts("2014-03-21T09:00"), 1, Map("dependency" -> "1"))
    }
    assert(e2.getMessage.contains("Fact nope is not defined"))
    val e3 = intercept[IllegalArgumentException] {
      svc.defineFact("orphan", FactType.Counter)
      svc.newFact("orphan", ts("2014-03-21T09:00"), 1, Map("dependency" -> "1"))
    }
    assert(e3.getMessage.contains("None of the dimensions specified track the supplied fact"))
    val e4 = intercept[IllegalArgumentException] {
      svc.defineDimension("child", groupedBy = Seq(Seq("ghost")))
    }
    assert(e4.getMessage.contains("Some specified dimensions to group-by do not exist"))
    val e5 = intercept[IllegalArgumentException] {
      svc.getTimeseries("ghost_fact", "dependency", Map.empty,
        ts("2014-03-21T09:00"), ts("2014-03-21T13:00"))
    }
    assert(e5.getMessage.contains("Non existent fact"))
    val e6 = intercept[IllegalArgumentException] {
      svc.getTimeseries("signups", "ghost_dim", Map.empty,
        ts("2014-03-21T09:00"), ts("2014-03-21T13:00"))
    }
    assert(e6.getMessage.contains("Non existent dimension"))
  }

  test("histogram: write + getHistogram (beyond-reference completion)") {
    val svc = new TimeSeriesService(spark)
    svc.defineFact("time-distr", FactType.Histogram, slice = 15,
      start = Some(0L), end = Some(1000L), step = Some(100L))
    svc.defineDimension("host", facts = Set("time-distr"))
    Seq(50L, 150L, 160L, 999L, 1500L, -5L).foreach { v =>
      svc.newFact("time-distr", ts("2014-03-21T09:05"), v, Map("host" -> "h1"))
    }
    val df = svc.getHistogram("time-distr", "host", Map.empty,
      ts("2014-03-21T09:00"), ts("2014-03-21T10:00"))
    val got = df.collect().map(r => (r.getAs[String]("host"),
      r.getAs[Long]("hist_bucket"), r.getAs[Long]("value"))).toSet
    // 50 -> b0; 150,160 -> b100; 999 -> b900; 1500 clamps to b900; -5 clamps to b0
    assert(got === Set(("h1", 0L, 2L), ("h1", 100L, 2L), ("h1", 900L, 2L)))

    // second series + mergeSeries: the declared "single row histogram,
    // merged with +" (api.clj:38-41)
    svc.newFact("time-distr", ts("2014-03-21T09:20"), 120L, Map("host" -> "h2"))
    val merged = svc.getHistogram("time-distr", "host", Map.empty,
        ts("2014-03-21T09:00"), ts("2014-03-21T10:00"), mergeSeries = true)
      .collect().map(r => r.getAs[Long]("hist_bucket") -> r.getAs[Long]("value"))
      .toMap
    assert(merged === Map(0L -> 2L, 100L -> 3L, 900L -> 2L))

    // user-supplied merge-with: max instead of + — per bucket, the
    // LARGEST single-series count survives (h1 has 2 in b100, h2 has 1)
    val maxMerged = svc.getHistogram("time-distr", "host", Map.empty,
        ts("2014-03-21T09:00"), ts("2014-03-21T10:00"), mergeSeries = true,
        mergeWith = Some(math.max))
      .collect().map(r => r.getAs[Long]("hist_bucket") -> r.getAs[Long]("value"))
      .toMap
    assert(maxMerged === Map(0L -> 2L, 100L -> 2L, 900L -> 2L))
  }

  test("update-dimension! associates a later fact (postgres.clj:42-47)") {
    val svc = freshService()
    svc.defineFact("conversions", FactType.Counter, slice = 10)
    intercept[IllegalArgumentException] {
      svc.newFact("conversions", ts("2014-03-21T09:00"), 1, Map("dependency" -> "32"))
    }
    svc.updateDimension("dependency", "conversions")
    svc.newFact("conversions", ts("2014-03-21T09:00"), 1, Map("dependency" -> "32"))
    val df = svc.getTimeseries("conversions", "dependency", Map.empty,
      ts("2014-03-21T09:00"), ts("2014-03-21T10:00"))
    assert(pivot(df, Seq("dependency")) === Map(
      Map("dependency" -> "32") -> Map(None -> 1L)))
  }

  test("group_only dimensions route but carry no own rollup (postgres_test.clj:78-80)") {
    val svc = new TimeSeriesService(spark)
    svc.defineFact("avg_time", FactType.Average, slice = 15)
    svc.defineDimension("company", groupOnly = true, facts = Set("avg_time"))
    svc.defineDimension("campaign", groupedBy = Seq(Seq("company")), facts = Set("avg_time"))
    svc.newFact("avg_time", ts("2014-03-21T09:00"), 15,
      Map("company" -> "bbva", "campaign" -> "ventas"))
    val df = svc.getTimeseries("avg_time", "campaign", Map("company" -> Some("bbva")),
      ts("2014-03-21T09:00"), ts("2014-03-21T10:00"))
    assert(pivotAvg(df, Seq("company", "campaign")) === Map(
      Map("company" -> "bbva", "campaign" -> "ventas") -> Map(None -> ((1L, 15L)))))
  }

  test("drop-schema clears engine state, leaves unrelated data intact (postgres_test.clj:173-201)") {
    import spark.implicits._
    val svc = freshService()
    val rollups = svc.materializeRollups(
      java.nio.file.Files.createTempDirectory("graft-drop").toString)
    assert(rollups.nonEmpty)
    // unrelated user data, not owned by the engine
    val unrelated = java.nio.file.Files.createTempDirectory("user-own").toString
    Seq((1, "keep")).toDF("k", "v").write.mode("overwrite").parquet(unrelated)

    svc.dropSchema()
    assert(svc.catalog.facts.isEmpty && svc.catalog.dimensions.isEmpty)
    val err = intercept[IllegalArgumentException] {
      svc.getTimeseries("signups", "dependency_user", Map.empty,
        ts("2014-03-21T09:00"), ts("2014-03-21T13:00"))
    }
    assert(err.getMessage.contains("Non existent fact"))
    // schema can be redefined cleanly afterward, with no ghost events
    svc.defineFact("signups", FactType.Counter, slice = 10)
    svc.defineDimension("dependency", facts = Set("signups"))
    val re = svc.getTimeseries("signups", "dependency", Map.empty,
      ts("2014-03-21T09:00"), ts("2014-03-21T13:00"))
    assert(re.count() == 0)
    // the user's own data is untouched
    assert(spark.read.parquet(unrelated).count() == 1)
  }

  test("three-level grouping hierarchy routes and serves both leaf series (README.md:110-111)") {
    val svc = new TimeSeriesService(spark)
    svc.defineFact("avg_time", FactType.Average, slice = 15)
    svc.defineDimension("company", groupOnly = true, facts = Set("avg_time"))
    svc.defineDimension("campaign", groupedBy = Seq(Seq("company")), facts = Set("avg_time"))
    svc.defineDimension("channel", groupedBy = Seq(Seq("company", "campaign")),
      facts = Set("avg_time"))
    svc.newFact("avg_time", ts("2014-03-21T09:00"), 15,
      Map("company" -> "bbva", "campaign" -> "ventas", "channel" -> "web"))
    svc.newFact("avg_time", ts("2014-03-21T09:10"), 25,
      Map("company" -> "bbva", "campaign" -> "ventas", "channel" -> "mail"))
    val got = pivotAvg(svc.getTimeseries("avg_time", "channel",
      Map("company" -> Some("bbva"), "campaign" -> Some("ventas")),
      ts("2014-03-21T09:00"), ts("2014-03-21T10:00")),
      Seq("company", "campaign", "channel"))
    assert(got == Map(
      Map("company" -> "bbva", "campaign" -> "ventas", "channel" -> "web") ->
        Map(None -> ((1L, 15L))),
      Map("company" -> "bbva", "campaign" -> "ventas", "channel" -> "mail") ->
        Map(None -> ((1L, 25L)))))
  }

  test("long ingest streams spill to the event store without losing data") {
    import spark.implicits._
    val svc = new TimeSeriesService(spark)
    svc.defineFact("signups", FactType.Counter, slice = 10)
    svc.defineDimension("dependency", facts = Set("signups"))
    // 40 single-event frames crosses the in-memory union spill
    // threshold mid-stream; totals must be exact across the switch
    for (i <- 0 until 40) {
      val min = i % 60
      svc.ingest(Seq(graft.model.Event("signups",
        ts(f"2014-03-21T09:$min%02d"), 1L, Map("dependency" -> "31")))
        .toDF())
    }
    val got = pivot(svc.getTimeseries("signups", "dependency",
      Map("dependency" -> Some("31")),
      ts("2014-03-21T09:00"), ts("2014-03-21T10:00"), Step.NoStep),
      Seq("dependency"))
    assert(got == Map(Map("dependency" -> "31") -> Map(None -> 40L)))
    // post-spill appends land in the store too
    svc.ingest(Seq(graft.model.Event("signups",
      ts("2014-03-21T09:30"), 2L, Map("dependency" -> "31"))).toDF())
    val after = pivot(svc.getTimeseries("signups", "dependency",
      Map("dependency" -> Some("31")),
      ts("2014-03-21T09:00"), ts("2014-03-21T10:00"), Step.NoStep),
      Seq("dependency"))
    assert(after == Map(Map("dependency" -> "31") -> Map(None -> 42L)))
  }

  test("event-store compaction shrinks files, preserves rows and idempotency") {
    import spark.implicits._
    val svc = new TimeSeriesService(spark)
    svc.defineFact("signups", FactType.Counter, slice = 10)
    svc.defineDimension("dependency", facts = Set("signups"))
    def frame(v: Long) = Seq(graft.model.Event("signups",
      ts("2014-03-21T09:15"), v, Map("dependency" -> "31"))).toDF()
    def total(): Long = pivot(svc.getTimeseries("signups", "dependency",
      Map("dependency" -> Some("31")),
      ts("2014-03-21T09:00"), ts("2014-03-21T10:00"), Step.NoStep),
      Seq("dependency"))(Map("dependency" -> "31"))(None)
    for (_ <- 0 until 40) svc.ingest(frame(1L)) // cross the spill threshold
    svc.ingest(frame(3L), batchId = 9L)
    assert(total() == 43L)
    def parquetFiles(dir: String): Int = {
      val b = new scala.collection.mutable.ArrayBuffer[java.io.File]()
      def walk(f: java.io.File): Unit =
        if (f.isDirectory) f.listFiles().foreach(walk)
        else if (f.getName.endsWith(".parquet")) b += f
      walk(new java.io.File(dir)); b.length
    }
    val out = java.nio.file.Files.createTempDirectory("graft-escompact").toString
    svc.compactEventStore(out, targetFiles = 2)
    assert(parquetFiles(out) <= 2, s"expected <=2 files, got ${parquetFiles(out)}")
    assert(total() == 43L) // identical rows after the swap
    // post-compaction ingest + replayed pre-compaction batch id
    svc.ingest(frame(2L))
    svc.ingest(frame(3L), batchId = 9L) // seen — must not re-apply
    assert(total() == 45L)
  }

  test("multi-fact read == union of per-fact reads; type/slice guarded") {
    import org.apache.spark.sql.functions.{col, lit}
    val svc = new TimeSeriesService(spark)
    svc.defineFact("a_count", FactType.Counter, slice = 10)
    svc.defineFact("b_count", FactType.Counter, slice = 10)
    svc.defineFact("lat", FactType.Average, slice = 10)
    svc.defineDimension("dep", facts = Set("a_count", "b_count", "lat"))
    for (i <- 0 until 8) {
      svc.newFact(if (i % 2 == 0) "a_count" else "b_count",
        ts(f"2014-03-21T${9 + i % 3}%02d:1$i"), 1L + i,
        Map("dep" -> ("d" + (i % 2))))
    }
    val multi = svc.getTimeseriesMulti(Seq("a_count", "b_count"), "dep",
        Map("dep" -> None),
        ts("2014-03-21T09:00"), ts("2014-03-21T12:00"), Step.Hour)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    val perFact = Seq("a_count", "b_count").flatMap { f =>
      svc.getTimeseries(f, "dep", Map("dep" -> None),
          ts("2014-03-21T09:00"), ts("2014-03-21T12:00"), Step.Hour)
        .withColumn("fact", lit(f))
        .select(col("dep"), col("fact"), col("bucket"), col("value"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2),
          r.getLong(3)))
    }.toSet
    assert(multi == perFact)
    // MIXED counter+average: the null-padded union of the per-type
    // reads — counter rows carry value, average rows carry the
    // re-aggregable (counter, total) pair
    for (i <- 0 until 4)
      svc.newFact("lat", ts(f"2014-03-21T${9 + i % 2}%02d:2$i"),
        100L + i, Map("dep" -> "d0"))
    val mixed = svc.getTimeseriesMulti(Seq("a_count", "lat"), "dep",
        Map("dep" -> None),
        ts("2014-03-21T09:00"), ts("2014-03-21T12:00"), Step.Hour)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toSet
    val expCnt = svc.getTimeseries("a_count", "dep", Map("dep" -> None),
        ts("2014-03-21T09:00"), ts("2014-03-21T12:00"), Step.Hour)
      .collect().map(r => (r.getString(0), "a_count", r.getTimestamp(1),
        Some(r.get(2)), None, None))
    val expAvg = svc.getTimeseries("lat", "dep", Map("dep" -> None),
        ts("2014-03-21T09:00"), ts("2014-03-21T12:00"), Step.Hour)
      .collect().map(r => (r.getString(0), "lat", r.getTimestamp(1),
        None, Some(r.get(2)), Some(r.get(3))))
    assert(mixed == (expCnt ++ expAvg).toSet)
    // ROLLUP-SERVED multi read: materializing every rollup must not
    // change a row (re-aggregability — the tier changes only the store
    // scanned)
    def mixedRead() = svc.getTimeseriesMulti(Seq("a_count", "lat"), "dep",
        Map("dep" -> None),
        ts("2014-03-21T09:00"), ts("2014-03-21T12:00"), Step.Hour)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toSet
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_multi_spec").toString
    svc.materializeRollups(tmp)
    assert(mixedRead() == mixed,
      "rollup-served multi read diverged from compute-on-read")
    // the STEPLESS rollup-served read (bucket = NULL encodes :all —
    // the day-tier candidate window): still the per-fact union
    val multiNone = svc.getTimeseriesMulti(Seq("a_count", "lat"), "dep",
        Map("dep" -> None),
        ts("2014-03-21T09:00"), ts("2014-03-21T12:00"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.get(2)),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toSet
    val expCntN = svc.getTimeseries("a_count", "dep", Map("dep" -> None),
        ts("2014-03-21T09:00"), ts("2014-03-21T12:00"))
      .collect().map(r => (r.getString(0), "a_count",
        Option(r.get(1)), Option(r.get(2)), None, None))
    val expAvgN = svc.getTimeseries("lat", "dep", Map("dep" -> None),
        ts("2014-03-21T09:00"), ts("2014-03-21T12:00"))
      .collect().map(r => (r.getString(0), "lat",
        Option(r.get(1)), None, Option(r.get(2)), Option(r.get(3))))
    assert(multiNone == (expCntN ++ expAvgN).toSet,
      "stepless rollup-served multi read diverged from per-fact reads")
    // PARTIAL registration: a later ingest for ONE fact invalidates
    // only that fact's rollup — the read becomes the union of a
    // rollup-served tile and a raw-scan tile, still equal to the
    // per-fact reads
    svc.newFact("a_count", ts("2014-03-21T10:55"), 5L, Map("dep" -> "d1"))
    val expCnt2 = svc.getTimeseries("a_count", "dep", Map("dep" -> None),
        ts("2014-03-21T09:00"), ts("2014-03-21T12:00"), Step.Hour)
      .collect().map(r => (r.getString(0), "a_count", r.getTimestamp(1),
        Some(r.get(2)), None, None))
    assert(mixedRead() == (expCnt2 ++ expAvg).toSet,
      "partially-registered multi read diverged from per-fact reads")
    // histogram tiles ride the same read since round 11 (B85): the
    // mixed counter+histogram schema appends a null-padded hist_bucket
    svc.defineFact("hist", FactType.Histogram, slice = 10,
      start = Some(0L), end = Some(50L), step = Some(10L))
    svc.updateDimension("dep", "hist")
    svc.newFact("hist", ts("2014-03-21T09:30"), 25L, Map("dep" -> "d0"))
    val withHist = svc.getTimeseriesMulti(
      Seq("a_count", "hist"), "dep", Map("dep" -> None),
      ts("2014-03-21T09:00"), ts("2014-03-21T12:00"))
    assert(withHist.columns.contains("hist_bucket"))
    assert(withHist.where(col("fact") === "hist").count() == 1L)
  }

  test("multi-fact read fills each counter's gaps with ITS OWN filler") {
    import org.apache.spark.sql.functions.{col, lit}
    val svc = new TimeSeriesService(spark)
    svc.defineFact("views", FactType.Counter, slice = 10) // filler 0
    svc.defineFact("sales", FactType.Counter, slice = 10, filler = -1L)
    svc.defineDimension("dep", facts = Set("views", "sales"))
    // views lands in hours 09 and 11, sales only in hour 10 → each
    // fact has gaps the OTHER fact's buckets cover, so a shared
    // scalar filler would be visibly wrong in both directions
    svc.newFact("views", ts("2014-03-21T09:10"), 2L, Map("dep" -> "d0"))
    svc.newFact("views", ts("2014-03-21T11:20"), 3L, Map("dep" -> "d0"))
    svc.newFact("sales", ts("2014-03-21T10:30"), 7L, Map("dep" -> "d0"))
    def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    val multi = shape(svc.getTimeseriesMulti(Seq("views", "sales"), "dep",
      Map("dep" -> None),
      ts("2014-03-21T09:00"), ts("2014-03-21T12:00"), Step.Hour))
    val perFact = Seq("views", "sales").flatMap { f =>
      svc.getTimeseries(f, "dep", Map("dep" -> None),
          ts("2014-03-21T09:00"), ts("2014-03-21T12:00"), Step.Hour)
        .withColumn("fact", lit(f))
        .select(col("dep"), col("fact"), col("bucket"), col("value"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2),
          r.getLong(3)))
    }.toSet
    assert(multi == perFact,
      "heterogeneous-filler multi read diverged from per-fact reads")
    // the gap rows themselves: sales' two empty hours carry −1 (not
    // 0), views' one empty hour carries 0 (not −1)
    assert(multi((("d0"), "sales", ts("2014-03-21T09:00"), -1L)))
    assert(multi((("d0"), "sales", ts("2014-03-21T11:00"), -1L)))
    assert(multi((("d0"), "views", ts("2014-03-21T10:00"), 0L)))
    // rollup-SERVED: each tile runs its own Rollups.run pipeline with
    // its own fact def, so per-fact fillers must survive the tier
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_fillers_spec").toString
    svc.materializeRollups(tmp)
    val served = shape(svc.getTimeseriesMulti(Seq("views", "sales"), "dep",
      Map("dep" -> None),
      ts("2014-03-21T09:00"), ts("2014-03-21T12:00"), Step.Hour))
    assert(served == multi,
      "rollup-served heterogeneous-filler read diverged from raw")
  }

  test("multi-fact read serves all four types; per-fact hist bucketization") {
    val svc = new TimeSeriesService(spark)
    svc.defineFact("cnt", FactType.Counter, slice = 10)
    svc.defineFact("lat", FactType.Average, slice = 10)
    svc.defineFact("uniq", FactType.Distinct, slice = 10)
    // TWO histogram tiles with DIFFERENT bucketizations — the shared
    // pipeline must bucketize each by its own (lo, step, n)
    svc.defineFact("h1", FactType.Histogram, slice = 10,
      start = Some(0L), end = Some(50L), step = Some(10L))
    svc.defineFact("h2", FactType.Histogram, slice = 10,
      start = Some(0L), end = Some(500L), step = Some(100L))
    svc.defineDimension("dep",
      facts = Set("cnt", "lat", "uniq", "h1", "h2"))
    for (i <- 0 until 12) {
      val dep = Map("dep" -> ("d" + (i % 2)))
      val t = ts(f"2014-03-21T${9 + i % 3}%02d:1${i % 6}")
      svc.newFact("cnt", t, 1L, dep)
      svc.newFact("lat", t, 100L + i, dep)
      svc.newFact("uniq", t, (i % 4).toLong, dep)
      svc.newFact("h1", t, (i * 7).toLong, dep)   // crosses h1's clamp
      svc.newFact("h2", t, (i * 55).toLong, dep)  // crosses h2's clamp
    }
    val ids = Seq("cnt", "uniq", "lat", "h1", "h2")
    def read() = svc.getTimeseriesMulti(ids, "dep", Map("dep" -> None),
        ts("2014-03-21T09:00"), ts("2014-03-21T12:00"), Step.Hour)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5)),
        Option(r.get(6)))).toSet
    val multi = read()
    // null-padded union of the per-fact single reads, column order
    // (dep, fact, bucket, value, counter, total, hist_bucket)
    val expVal = Seq("cnt", "uniq").flatMap { f =>
      svc.getTimeseries(f, "dep", Map("dep" -> None),
          ts("2014-03-21T09:00"), ts("2014-03-21T12:00"), Step.Hour)
        .collect().map(r => (r.getString(0), f, r.getTimestamp(1),
          Some(r.get(2)), None, None, None))
    }
    val expAvg = svc.getTimeseries("lat", "dep", Map("dep" -> None),
        ts("2014-03-21T09:00"), ts("2014-03-21T12:00"), Step.Hour)
      .collect().map(r => (r.getString(0), "lat", r.getTimestamp(1),
        None, Some(r.get(2)), Some(r.get(3)), None))
    val expHist = Seq("h1", "h2").flatMap { f =>
      svc.getHistogram(f, "dep", Map("dep" -> None),
          ts("2014-03-21T09:00"), ts("2014-03-21T12:00"), Step.Hour)
        .collect().map(r => (r.getString(0), f, r.getTimestamp(1),
          Some(r.get(3)), None, None, Some(r.get(2))))
    }
    assert(multi == (expVal ++ expAvg ++ expHist).toSet,
      "four-type multi read diverged from per-fact reads")
    // distinct semantics really distinct: hour 09 sees users 0..3 on
    // d0/d1 interleaved — the uniq tile must count ids, not rows
    assert(multi.exists { case (_, "uniq", _, v, _, _, _) =>
      v.exists(_.asInstanceOf[Long] < 4L) })
    // per-fact clamps: h1 tops out at bucket 40, h2 at 400
    val histBuckets = multi.collect {
      case (_, f, _, _, _, _, Some(hb)) => (f, hb.asInstanceOf[Long]) }
    assert(histBuckets.filter(_._1 == "h1").map(_._2).max == 40L)
    assert(histBuckets.filter(_._1 == "h2").map(_._2).max == 400L)
    // ROLLUP-SERVED: materializing every rollup must not change a row
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_multi4_spec").toString
    svc.materializeRollups(tmp)
    assert(read() == multi,
      "rollup-served four-type multi read diverged from compute-on-read")
  }

  test("explainRoute mirrors the tier the read actually compiles to") {
    import org.apache.spark.sql.functions.col
    val svc = new TimeSeriesService(spark)
    svc.defineFact("a_count", FactType.Counter, slice = 10)
    svc.defineFact("b_count", FactType.Counter, slice = 10)
    svc.defineDimension("dep", facts = Set("a_count", "b_count"))
    for (i <- 0 until 6)
      svc.newFact(if (i % 2 == 0) "a_count" else "b_count",
        ts(f"2014-03-21T0$i:10"), 1L, Map("dep" -> "d0"))
    // day-eligible window: the INCLUSIVE bucketed scan spans
    // [floor(start), floor(finish)+slice) — midnight to 23:50+10m
    def tiers(step: Step) = svc.explainRoute(Seq("a_count", "b_count"),
        "dep", Map("dep" -> None),
        ts("2014-03-21T00:00"), ts("2014-03-21T23:50"), step)
      .collect().map(r => (r.getString(0), r.getString(2))).toMap
    // nothing registered: both raw
    assert(tiers(Step.Day) ==
      Map("a_count" -> "raw-scan", "b_count" -> "raw-scan"))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_explain_spec").toString
    svc.materializeRollups(tmp)
    // whole-day window -> day tier; hour step -> slice tier (the
    // shared dayTierEligible rule, not a re-implementation)
    assert(tiers(Step.Day) ==
      Map("a_count" -> "rollup-day", "b_count" -> "rollup-day"))
    assert(tiers(Step.Hour) ==
      Map("a_count" -> "rollup-slice", "b_count" -> "rollup-slice"))
    // explain == the compiled plan: all-registered -> the multi read
    // scans no raw events (no LocalTableScan); after an invalidating
    // write to ONE fact, that fact's explain flips to raw-scan AND
    // the raw scan reappears in the plan
    def multiPlan(): String = {
      val df = svc.getTimeseriesMulti(Seq("a_count", "b_count"), "dep",
        Map("dep" -> None),
        ts("2014-03-21T00:00"), ts("2014-03-21T23:50"), Step.Day)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    assert(!multiPlan().contains("LocalTableScan"))
    svc.newFact("b_count", ts("2014-03-21T07:10"), 1L, Map("dep" -> "d0"))
    assert(tiers(Step.Day) ==
      Map("a_count" -> "rollup-day", "b_count" -> "raw-scan"))
    assert(multiPlan().contains("LocalTableScan"))
    // external registration reports the local-events merge
    svc.registerRollup("b_count", Seq("dep"), s"$tmp/dep_b_count")
    assert(tiers(Step.Day)("b_count") == "external-rollup+local-events")
  }

  test("as-of batch time travel: watermark reads match per-batch prefixes") {
    import spark.implicits._
    val svc = new TimeSeriesService(spark)
    svc.defineFact("signups", FactType.Counter, slice = 10)
    svc.defineDimension("dependency", facts = Set("signups"))
    val store = java.nio.file.Files
      .createTempDirectory("graft-asof").toString + "/store"
    svc.attachEventStore(store)
    def frame(v: Long) = Seq(graft.model.Event("signups",
      ts("2014-03-21T09:15"), v, Map("dependency" -> "31"))).toDF()
    svc.ingest(frame(1L), batchId = 0L)
    svc.ingest(frame(2L), batchId = 1L)
    svc.ingest(frame(4L), batchId = 2L)
    def asOfTotal(b: Long): Long = pivot(svc.getTimeseriesAsOf("signups",
      "dependency", Map("dependency" -> Some("31")),
      ts("2014-03-21T09:00"), ts("2014-03-21T10:00"), maxBatchId = b),
      Seq("dependency")).get(Map("dependency" -> "31"))
      .map(_(None)).getOrElse(0L)
    assert(asOfTotal(0L) == 1L)
    assert(asOfTotal(1L) == 3L)
    assert(asOfTotal(2L) == 7L)
    assert(asOfTotal(99L) == 7L) // beyond-head watermark = full history
    // full (non-as-of) read agrees with the complete watermark
    assert(pivot(svc.getTimeseries("signups", "dependency",
      Map("dependency" -> Some("31")),
      ts("2014-03-21T09:00"), ts("2014-03-21T10:00")),
      Seq("dependency"))(Map("dependency" -> "31"))(None) == 7L)
    // a watermark before every batch is an empty (still well-formed) read
    assert(svc.eventsAsOf(-1L).isEmpty)
    // delta reads partition the as-of exactly: (-inf,0] U (0,2] = (-inf,2]
    def flat(df: org.apache.spark.sql.DataFrame) = df.select(
      org.apache.spark.sql.functions.col("fact"),
      org.apache.spark.sql.functions.col("ts"),
      org.apache.spark.sql.functions.col("value"),
      org.apache.spark.sql.functions.col("categories")("dependency"))
    val both = flat(svc.eventsAsOf(0L))
      .unionByName(flat(svc.eventsInBatchRange(1L, 2L)))
    val full = flat(svc.eventsAsOf(2L))
    assert(both.count() == full.count() &&
      both.exceptAll(full).isEmpty && full.exceptAll(both).isEmpty)
  }

  test("as-of refuses batch-anonymous history and post-ingest attach") {
    import spark.implicits._
    val svc = new TimeSeriesService(spark, spillDepth = 1)
    svc.defineFact("signups", FactType.Counter, slice = 10)
    svc.defineDimension("dependency", facts = Set("signups"))
    def frame(v: Long) = Seq(graft.model.Event("signups",
      ts("2014-03-21T09:15"), v, Map("dependency" -> "31"))).toDF()
    svc.ingest(frame(1L)) // spills under the anonymous local tag
    val e = intercept[IllegalArgumentException](svc.eventsAsOf(5L))
    assert(e.getMessage.contains("batch-anonymous"))
    val svc2 = new TimeSeriesService(spark, spillDepth = 1)
    svc2.defineFact("signups", FactType.Counter, slice = 10)
    svc2.defineDimension("dependency", facts = Set("signups"))
    svc2.ingest(frame(1L))
    val e2 = intercept[IllegalArgumentException](svc2.attachEventStore(
      java.nio.file.Files.createTempDirectory("graft-asof2").toString))
    assert(e2.getMessage.contains("before any event"))
  }

  test("ingestLenient quarantines corrupt rows, ingests the rest") {
    import spark.implicits._
    val svc = new TimeSeriesService(spark)
    svc.defineFact("signups", FactType.Counter, slice = 15)
    svc.defineDimension("dependency", facts = Set("signups"))
    val good = ts("2014-03-21T09:15")
    val frame = Seq[(String, java.sql.Timestamp, java.lang.Long, Map[String, String])](
      ("signups", good, 2L, Map("dependency" -> "31")),
      ("signups", good, 3L, Map("dependency" -> "31")),
      (null, good, 1L, Map("dependency" -> "31")),      // null fact
      ("signups", null, 1L, Map("dependency" -> "31")), // null ts
      ("signups", good, null, Map("dependency" -> "31")), // null value
      ("ghosts", good, 9L, Map("dependency" -> "31")))  // undefined fact
      .toDF("fact", "ts", "value", "categories")
    val qdir = java.nio.file.Files
      .createTempDirectory("svc-quarantine").toString + "/bad"
    svc.ingestLenient(frame, qdir)
    // only the two valid rows made it into history
    val got = pivot(svc.getTimeseries("signups", "dependency",
      Map("dependency" -> Some("31")),
      ts("2014-03-21T09:00"), ts("2014-03-21T10:00"), Step.NoStep),
      Seq("dependency"))
    assert(got == Map(Map("dependency" -> "31") -> Map(None -> 5L)))
    // quarantine holds each reject with its reason
    val reasons = spark.read.parquet(qdir)
      .select("__reason").collect().map(_.getString(0)).sorted.toSeq
    assert(reasons ==
      Seq("null_fact", "null_ts", "null_value", "undefined_fact"))
  }

  test("retention ages out raw partitions; full-range reads stay exact") {
    import spark.implicits._
    val svc = new TimeSeriesService(spark)
    svc.defineFact("signups", FactType.Counter, slice = 15)
    svc.defineDimension("dependency", facts = Set("signups"))
    // 40 frames over 4 dates cross the spill threshold → on-disk store
    for (i <- 0 until 40)
      svc.ingest(Seq(graft.model.Event("signups",
        ts(f"2014-03-${10 + i % 4}%02dT09:${i % 60}%02d"), 1L,
        Map("dependency" -> "31"))).toDF())
    def daily() = pivot(svc.getTimeseries("signups", "dependency",
      Map("dependency" -> Some("31")),
      ts("2014-03-10T00:00"), ts("2014-03-14T00:00"), Step.Day),
      Seq("dependency"))
    val before = daily()
    def datesOnDisk(): Set[String] = {
      val b = scala.collection.mutable.Set.empty[String]
      def walk(f: java.io.File): Unit =
        if (f.isDirectory) {
          if (f.getName.startsWith("__event_date=")) b += f.getName
          f.listFiles().foreach(walk)
        }
      svc.eventStoreDir.foreach(d => walk(new java.io.File(d)))
      b.toSet
    }
    assert(datesOnDisk().size == 4, s"fixture sanity: ${datesOnDisk()}")
    val base = java.nio.file.Files.createTempDirectory("svc-retain").toString
    // age out days 10 and 11 (horizon = start of day 12)
    val made = svc.expireEvents(ts("2014-03-12T00:00"), base)
    assert(made.nonEmpty)
    assert(datesOnDisk() == Set("__event_date=2014-03-12",
      "__event_date=2014-03-13"), s"raw partitions left: ${datesOnDisk()}")
    // the FULL range — including the aged days — reads unchanged
    assert(daily() == before, s"retention changed results: ${daily()}")
    // new ingest invalidates nothing it shouldn't: the retained store
    // survives (external) and unions with the remaining raw events
    svc.ingest(Seq(graft.model.Event("signups",
      ts("2014-03-13T10:05"), 5L, Map("dependency" -> "31"))).toDF())
    val after = daily()
    assert(after(Map("dependency" -> "31"))(Some(ts("2014-03-13T00:00"))) ==
      before(Map("dependency" -> "31"))(Some(ts("2014-03-13T00:00"))) + 5L)
    assert(after(Map("dependency" -> "31"))(Some(ts("2014-03-10T00:00"))) ==
      before(Map("dependency" -> "31"))(Some(ts("2014-03-10T00:00"))))
    // REPEAT retention with a later horizon folds the prior retained
    // history in losslessly (days 10-12 now aged, day 13 raw)
    svc.expireEvents(ts("2014-03-13T00:00"), base)
    assert(datesOnDisk() == Set("__event_date=2014-03-13"))
    assert(daily() == after, s"repeat retention changed results: ${daily()}")
  }

  test("erasure removes the subject's rows, survives replays, and " +
      "reads recompute without them") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{coalesce => _, col, element_at}
    val svc = new TimeSeriesService(spark)
    svc.defineFact("signups", FactType.Counter, slice = 15)
    svc.defineDimension("dependency", facts = Set("signups"))
    def frame(user: String, v: Long) = Seq(graft.model.Event("signups",
      ts("2014-03-21T09:15"), v,
      Map("dependency" -> "31", "user" -> user))).toDF()
    def total(): Long = pivot(svc.getTimeseries("signups", "dependency",
      Map("dependency" -> Some("31")),
      ts("2014-03-21T09:00"), ts("2014-03-21T10:00"), Step.NoStep),
      Seq("dependency"))(Map("dependency" -> "31"))(None)
    // cross the spill threshold: alice twice (batch-tagged), bob many
    svc.ingest(frame("alice", 1L), batchId = 7L)
    for (_ <- 0 until 40) svc.ingest(frame("bob", 1L))
    svc.ingest(frame("alice", 1L), batchId = 9L)
    assert(total() == 42L)
    val isAlice = element_at(col("categories"), "user") === "alice"
    val out = java.nio.file.Files
      .createTempDirectory("svc-erase").toString
    // erased-row audit count, and reads no longer see the subject
    assert(svc.eraseEvents(isAlice, out) == 2L)
    assert(total() == 40L)
    assert(svc.eventStoreDir.contains(out))
    // a replayed pre-erasure batch id cannot resurrect the rows
    svc.ingest(frame("alice", 1L), batchId = 7L)
    assert(total() == 40L)
    // erasing a subject with no rows is a 0-count no-op
    val out2 = java.nio.file.Files
      .createTempDirectory("svc-erase2").toString
    assert(svc.eraseEvents(
      element_at(col("categories"), "user") === "carol", out2) == 0L)
    assert(total() == 40L)
    // NULL condition rows are KEPT (missing category ≠ the subject)
    svc.ingest(frame("dave", 3L).drop("categories")
      .withColumn("categories",
        org.apache.spark.sql.functions.map(
          org.apache.spark.sql.functions.lit("dependency"),
          org.apache.spark.sql.functions.lit("31"))))
    val out3 = java.nio.file.Files
      .createTempDirectory("svc-erase3").toString
    assert(svc.eraseEvents(
      element_at(col("categories"), "user") === "bob", out3) == 40L)
    assert(total() == 3L)
  }

  test("erasure after retention: raw scrubbed, retained aggregates keep " +
      "the documented anonymized history") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, element_at}
    val svc = new TimeSeriesService(spark)
    svc.defineFact("signups", FactType.Counter, slice = 15)
    svc.defineDimension("dependency", facts = Set("signups"))
    // 2 users × 4 days; cross the spill threshold
    for (i <- 0 until 40; u <- Seq("alice", "bob"))
      svc.ingest(Seq(graft.model.Event("signups",
        ts(f"2014-03-${10 + i % 4}%02dT09:${i % 60}%02d"), 1L,
        Map("dependency" -> "31", "user" -> u))).toDF())
    def daily() = pivot(svc.getTimeseries("signups", "dependency",
      Map("dependency" -> Some("31")),
      ts("2014-03-10T00:00"), ts("2014-03-14T00:00"), Step.Day),
      Seq("dependency"))(Map("dependency" -> "31"))
    val before = daily()
    val base = java.nio.file.Files
      .createTempDirectory("svc-retain-erase").toString
    // age out days 10-11, then erase alice
    svc.expireEvents(ts("2014-03-12T00:00"), base)
    val out = java.nio.file.Files
      .createTempDirectory("svc-erase-raw").toString
    val erased = svc.eraseEvents(
      element_at(col("categories"), "user") === "alice", out)
    // only alice's REMAINING raw rows (days 12-13) could be erased:
    // 40 ingests × 2 users over 4 days → 10 alice rows per day
    assert(erased == 20L, s"erased $erased")
    val after = daily()
    // aged days keep the retained (anonymized-aggregate) totals…
    assert(after(Some(ts("2014-03-10T00:00"))) ==
      before(Some(ts("2014-03-10T00:00"))))
    assert(after(Some(ts("2014-03-11T00:00"))) ==
      before(Some(ts("2014-03-11T00:00"))))
    // …while the raw window drops exactly alice's share
    assert(after(Some(ts("2014-03-12T00:00"))) ==
      before(Some(ts("2014-03-12T00:00"))) - 10L)
    assert(after(Some(ts("2014-03-13T00:00"))) ==
      before(Some(ts("2014-03-13T00:00"))) - 10L)
  }

  test("replayed ingest batches are idempotent pre- and post-spill") {
    import spark.implicits._
    val svc = new TimeSeriesService(spark)
    svc.defineFact("signups", FactType.Counter, slice = 10)
    svc.defineDimension("dependency", facts = Set("signups"))
    def frame(v: Long) = Seq(graft.model.Event("signups",
      ts("2014-03-21T09:15"), v, Map("dependency" -> "31"))).toDF()
    def total(): Long = pivot(svc.getTimeseries("signups", "dependency",
      Map("dependency" -> Some("31")),
      ts("2014-03-21T09:00"), ts("2014-03-21T10:00"), Step.NoStep),
      Seq("dependency"))(Map("dependency" -> "31"))(None)
    // pre-spill: batch 7 delivered twice counts once (seen-set skip)
    svc.ingest(frame(1L), batchId = 7L)
    svc.ingest(frame(1L), batchId = 7L)
    assert(total() == 1L)
    // cross the spill threshold with plain ingests
    for (i <- 0 until 40) svc.ingest(frame(1L))
    assert(total() == 41L)
    // post-spill: a replayed batch id overwrites its own partition dir
    svc.ingest(frame(5L), batchId = 8L)
    svc.ingest(frame(5L), batchId = 8L)
    assert(total() == 46L)
  }

  test("single-writer lease: second attach conflicts, takeover evicts " +
      "the first writer's mutations") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, sum}
    def mkSvc(): TimeSeriesService = {
      val svc = new TimeSeriesService(spark)
      svc.defineFact("signups", FactType.Counter, slice = 10)
      svc.defineDimension("dependency", facts = Set("signups"))
      svc
    }
    def frame(v: Long) = Seq(graft.model.Event("signups",
      ts("2014-03-21T09:15"), v, Map("dependency" -> "31"))).toDF()
    val store = java.nio.file.Files
      .createTempDirectory("graft-lease").toString + "/store"
    val a = mkSvc()
    a.attachEventStore(store)
    a.ingest(frame(1L), batchId = 0L)
    // a second live service attaching the same store is the
    // double-writer accident the lease exists to catch — loud, not
    // silent interleaving
    val b = mkSvc()
    val conflict = intercept[IllegalStateException](
      b.attachEventStore(store))
    assert(conflict.getMessage.contains("SINGLE-WRITER"),
      conflict.getMessage)
    // crash recovery: takeover seizes the lease; the store's history
    // is intact and the new writer proceeds
    b.attachEventStore(store, takeover = true)
    b.ingest(frame(2L), batchId = 1L)
    // the evicted first writer's next mutation must fail loudly —
    // ingest, erasure, and retention all re-verify the lease
    val evicted = intercept[IllegalStateException](
      a.ingest(frame(4L), batchId = 2L))
    assert(evicted.getMessage.contains("no longer leased"),
      evicted.getMessage)
    val out = java.nio.file.Files
      .createTempDirectory("graft-lease-erase").toString + "/scrub"
    assert(intercept[IllegalStateException](
      a.eraseEvents(lit(true), out)).getMessage.contains("eraseEvents"))
    assert(intercept[IllegalStateException](
      a.expireEvents(ts("2014-03-22T00:00"),
        java.nio.file.Files.createTempDirectory("graft-lease-ret")
          .toString)).getMessage.contains("expireEvents"))
    // the store only ever saw each writer's accepted batches: the
    // takeover owner reads exactly batches 0 (pre-takeover history)
    // and 1 — batch 2 was refused before any byte was written
    val got = b.getTimeseries("signups", "dependency",
      Map("dependency" -> Some("31")),
      ts("2014-03-21T00:00"), ts("2014-03-22T00:00"))
      .agg(sum(col("value"))).head.getLong(0)
    assert(got == 3L)
    // the lease file is storage-invisible: underscore-prefixed, so
    // event scans never see it as data
    assert(!b.getTimeseries("signups", "dependency",
      Map("dependency" -> None),
      ts("2014-03-21T00:00"), ts("2014-03-22T00:00"))
      .columns.contains("__writer"))
  }

  test("retireStoreDir finishes the swap: deletes only a retired, " +
      "self-leased event store") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, element_at, sum}
    def mkSvc(): TimeSeriesService = {
      val svc = new TimeSeriesService(spark)
      svc.defineFact("signups", FactType.Counter, slice = 10)
      svc.defineDimension("dependency", facts = Set("signups"))
      svc
    }
    def frame(dep: String) = Seq(graft.model.Event("signups",
      ts("2014-03-21T09:15"), 1L, Map("dependency" -> dep))).toDF()
    val base = java.nio.file.Files
      .createTempDirectory("graft-retire").toString
    val store = s"$base/store"
    val svc = mkSvc()
    svc.attachEventStore(store)
    svc.ingest(frame("31"), batchId = 0L)
    svc.ingest(frame("32"), batchId = 1L)
    assert(svc.retiredStoreDir.isEmpty) // no swap yet
    val scrubbed = s"$base/scrubbed"
    assert(svc.eraseEvents(
      element_at(col("categories"), "dependency") === "32", scrubbed) == 1L)
    assert(svc.retiredStoreDir.contains(store))
    // the LIVE store refuses — only swapped-out history is deletable
    assert(intercept[IllegalArgumentException](
      svc.retireStoreDir(scrubbed)).getMessage.contains("LIVE"))
    // a path that is not an event store refuses (mistyped-path guard)
    val notAStore = s"$base/other"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(notAStore))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(notAStore, "data.txt"), "x".getBytes)
    assert(intercept[IllegalArgumentException](
      svc.retireStoreDir(notAStore)).getMessage
      .contains("does not look like"))
    // the retired store deletes; the deletion request is now complete
    svc.retireStoreDir(store)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(store)))
    assert(svc.retiredStoreDir.isEmpty)
    // reads keep serving from the swapped-in store
    assert(svc.getTimeseries("signups", "dependency",
        Map("dependency" -> None),
        ts("2014-03-21T00:00"), ts("2014-03-22T00:00"))
      .agg(sum(col("value"))).head.getLong(0) == 1L)
    // a store leased to ANOTHER writer refuses — not ours to delete
    val foreign = s"$base/foreign"
    val other = mkSvc()
    other.attachEventStore(foreign)
    other.ingest(frame("31"), batchId = 0L)
    assert(intercept[IllegalStateException](
      svc.retireStoreDir(foreign)).getMessage.contains("retireStoreDir"))
  }

  test("catalog round-trip through parquet (O1/O6)") {
    val svc = freshService()
    val dir = java.nio.file.Files.createTempDirectory("graft-catalog").toString
    svc.catalog.save(spark, dir)
    val loaded = graft.model.Catalog.load(spark, dir)
    assert(loaded.facts === svc.catalog.facts)
    assert(loaded.dimensions === svc.catalog.dimensions)
  }

  test("crash mid-swap: a death between the swap's write and pointer " +
      "flip loses nothing — takeover of EITHER side serves exact history") {
    import spark.implicits._
    // every store SWAP (compaction, erasure, retention) writes a FRESH
    // directory, then flips the service's in-memory pointer, then the
    // caller retires the old directory. A crash between the write and
    // the flip leaves two complete stores on disk; this pins the
    // recovery contract: attachEventStore(dir, takeover = true) on the
    // PRE-swap directory serves the pre-swap history exactly (nothing
    // was mutated in place), and on the post-swap directory serves the
    // swap's result exactly (the write phase is atomic-per-partition
    // overwrite into a fresh path).
    def freshCatalog(): TimeSeriesService = {
      val s = new TimeSeriesService(spark, spillDepth = 2)
      s.defineFact("hits", FactType.Counter, slice = 10)
      s.defineDimension("dep", facts = Set("hits"))
      s
    }
    def frame(v: Long, dep: String) = Seq(graft.model.Event("hits",
      ts("2014-03-21T09:15"), v, Map("dep" -> dep))).toDF()
    def series(s: TimeSeriesService) = pivot(s.getTimeseries("hits", "dep",
      Map("dep" -> None),
      ts("2014-03-21T09:00"), ts("2014-03-21T10:00"), Step.NoStep),
      Seq("dep"))
    // --- compaction swap ---
    val a = freshCatalog()
    val dir1 = java.nio.file.Files
      .createTempDirectory("graft-crash-swap").toString + "/store"
    a.attachEventStore(dir1)
    a.ingest(frame(1L, "x"), batchId = 0L)
    a.ingest(frame(2L, "y"), batchId = 1L)
    a.ingest(frame(4L, "x"), batchId = 2L)
    val preSwap = series(a)
    val out = java.nio.file.Files
      .createTempDirectory("graft-crash-out").toString + "/compacted"
    a.compactEventStore(out)
    // CRASH here: a dies before retiring dir1 (nothing more from a).
    // Recovery path 1 — the operator resumes on the OLD store:
    val b = freshCatalog()
    b.attachEventStore(dir1, takeover = true)
    assert(series(b) == preSwap, "pre-swap directory must hold exact history")
    // Recovery path 2 — the operator resumes on the NEW store:
    val c = freshCatalog()
    c.attachEventStore(out, takeover = true)
    assert(series(c) == preSwap, "swapped store must hold exact history")
    // the recovered writer is live: it can keep ingesting and the
    // stale pre-crash instance is fenced out by the lease
    b.ingest(frame(8L, "y"), batchId = 3L)
    assert(series(b)(Map("dep" -> "y"))(None) == 10L)
    val fenced = intercept[IllegalStateException] {
      a.ingest(frame(100L, "x"), batchId = 4L)
    }
    assert(fenced.getMessage.contains("no longer leased"))
    // --- erasure swap: same contract, and the retired dir still holds
    // the to-be-erased rows until retireStoreDir closes the request ---
    val d = freshCatalog()
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft-crash-erase").toString + "/store"
    d.attachEventStore(dir2)
    d.ingest(frame(1L, "x"), batchId = 0L)
    d.ingest(frame(2L, "victim"), batchId = 1L)
    val preErase = series(d)
    val scrubbed = java.nio.file.Files
      .createTempDirectory("graft-crash-scrub").toString + "/scrubbed"
    import org.apache.spark.sql.functions.{col, element_at}
    d.eraseEvents(element_at(col("categories"), "dep") === "victim", scrubbed)
    // CRASH before retireStoreDir(dir2): the old store still has the
    // victim rows (the deletion is NOT complete — that is why
    // retireStoreDir is mandatory), the new store never had them
    val e = freshCatalog()
    e.attachEventStore(dir2, takeover = true)
    assert(series(e) == preErase)
    val f = freshCatalog()
    f.attachEventStore(scrubbed, takeover = true)
    assert(series(f) == preErase - Map("dep" -> "victim"))
    // the recovered post-swap owner closes the deletion request: the
    // retired dir is leased to a writer it knows to be gone (here, e —
    // the operator decided the scrub wins), so retirement is the
    // takeover arm; without it the erased rows would outlive the crash.
    // The takeover is FENCED: the runbook reads the lease owner first,
    // a wrong expectedOwner (mistyped path) refuses, and the delete
    // returns the displaced owner id for the recovery log.
    intercept[IllegalStateException] { f.retireStoreDir(dir2) }
    val deadOwner = f.storeLeaseOwner(dir2)
    assert(deadOwner.nonEmpty, "the crashed writer's lease must be visible")
    intercept[IllegalArgumentException] {
      f.retireStoreDir(dir2, takeover = true,
        expectedOwner = Some("not-the-dead-owner"))
    }
    assert(new java.io.File(dir2).exists(),
      "a refused takeover must not have deleted anything")
    val displaced =
      f.retireStoreDir(dir2, takeover = true, expectedOwner = deadOwner)
    assert(displaced == deadOwner,
      "takeover must report the lease it displaced")
    assert(!new java.io.File(dir2).exists())
    // a lease of OUR OWN refuses the takeover arm outright — a live
    // writer cannot launder a delete of its own store through the
    // crash-recovery path (the normal path already owns the lease)
    val g = freshCatalog()
    val dir3 = java.nio.file.Files
      .createTempDirectory("graft-crash-own").toString + "/store"
    g.attachEventStore(dir3)
    g.ingest(frame(1L, "x"), batchId = 7L)
    val out3 = java.nio.file.Files
      .createTempDirectory("graft-crash-own-out").toString + "/compacted"
    g.compactEventStore(out3)
    assert(intercept[IllegalArgumentException] {
      g.retireStoreDir(dir3, takeover = true)
    }.getMessage.contains("THIS writer"))
    assert(g.retireStoreDir(dir3).isEmpty,
      "the normal path retires our own retired dir, displacing nobody")
  }

  test("multi-dimension read == union of per-dim multi reads with a " +
      "dim discriminator; foreign filters drop per dimension") {
    import org.apache.spark.sql.functions.{col, lit}
    val svc = new TimeSeriesService(spark)
    svc.defineFact("clicks", FactType.Counter, slice = 10)
    svc.defineFact("lat", FactType.Average, slice = 10)
    svc.defineDimension("page", facts = Set("clicks"))
    svc.defineDimension("region", facts = Set("lat"))
    for (i <- 0 until 6)
      svc.newFact("clicks", ts(f"2014-03-21T${9 + i % 2}%02d:1$i"), 1L,
        Map("page" -> ("p" + i % 2)))
    for (i <- 0 until 4)
      svc.newFact("lat", ts(f"2014-03-21T${9 + i % 2}%02d:2$i"), 50L + i,
        Map("region" -> ("r" + i % 2)))
    val md = svc.getTimeseriesMulti(
      Seq("clicks" -> "page", "lat" -> "region"),
      Map("page" -> Some("p0")),
      ts("2014-03-21T09:00"), ts("2014-03-21T11:00"), Step.Hour, 0)
    assert(md.columns.toSet ==
      Set("page", "region", "fact", "dim", "bucket", "value", "counter",
        "total"))
    val got = md.collect().map(r =>
      (Option(r.getAs[String]("page")), Option(r.getAs[String]("region")),
        r.getAs[String]("fact"), r.getAs[String]("dim"),
        r.getAs[java.sql.Timestamp]("bucket"),
        Option(r.getAs[Any]("value")), Option(r.getAs[Any]("counter")),
        Option(r.getAs[Any]("total")))).toSet
    // the page filter applies to the page read; the region read must
    // NOT lose rows to a key its dimension does not know
    val exp =
      svc.getTimeseriesMulti(Seq("clicks"), "page",
          Map("page" -> Some("p0")),
          ts("2014-03-21T09:00"), ts("2014-03-21T11:00"), Step.Hour)
        .collect().map(r => (Option(r.getString(0)), None: Option[String],
          r.getString(1), "page", r.getTimestamp(2), Option(r.get(3)),
          None: Option[Any], None: Option[Any])) ++
      svc.getTimeseriesMulti(Seq("lat"), "region",
          Map.empty[String, Option[String]],
          ts("2014-03-21T09:00"), ts("2014-03-21T11:00"), Step.Hour)
        .collect().map(r => (None: Option[String], Option(r.getString(0)),
          r.getString(1), "region", r.getTimestamp(2), None: Option[Any],
          Option(r.get(3)), Option(r.get(4))))
    assert(got == exp.toSet)
  }

  test("per-tile-filtered multi read == union of per-tile calls; " +
      "same-dim tiles may filter differently; duplicates refuse") {
    val svc = new TimeSeriesService(spark)
    svc.defineFact("clicks", FactType.Counter, slice = 10)
    svc.defineFact("spend", FactType.Counter, slice = 10)
    svc.defineFact("lat", FactType.Average, slice = 10)
    svc.defineDimension("page", facts = Set("clicks", "spend"))
    svc.defineDimension("region", facts = Set("lat"))
    for (i <- 0 until 6) {
      svc.newFact("clicks", ts(f"2014-03-21T${9 + i % 2}%02d:1$i"), 1L,
        Map("page" -> ("p" + i % 2)))
      svc.newFact("spend", ts(f"2014-03-21T${9 + i % 2}%02d:1$i"),
        10L + i, Map("page" -> ("p" + i % 2)))
    }
    for (i <- 0 until 4)
      svc.newFact("lat", ts(f"2014-03-21T${9 + i % 2}%02d:2$i"), 50L + i,
        Map("region" -> ("r" + i % 2)))
    val lo = ts("2014-03-21T09:00"); val hi = ts("2014-03-21T11:00")
    // three tiles, two on ONE dimension with DIFFERENT filters — the
    // read the pairs overload needed two service calls for
    val md = svc.getTimeseriesMulti(Seq(
        ("clicks", "page", Map("page" -> Option("p0"))),
        ("spend", "page", Map.empty[String, Option[String]]),
        ("lat", "region", Map("page" -> Option("p0")))), // foreign: drops
      lo, hi, Step.Hour, 0)
    def shape(df: org.apache.spark.sql.DataFrame, dim: String) =
      df.collect().map { r =>
        def opt(c: String) = if (df.columns.contains(c))
          Option(r.getAs[Any](c)) else None
        (opt("page"), opt("region"), r.getAs[String]("fact"), dim,
          r.getAs[java.sql.Timestamp]("bucket"), opt("value"),
          opt("counter"), opt("total"))
      }
    val exp =
      shape(svc.getTimeseriesMulti(Seq("clicks"), "page",
        Map("page" -> Option("p0")), lo, hi, Step.Hour), "page") ++
      shape(svc.getTimeseriesMulti(Seq("spend"), "page",
        Map.empty[String, Option[String]], lo, hi, Step.Hour), "page") ++
      shape(svc.getTimeseriesMulti(Seq("lat"), "region",
        Map.empty[String, Option[String]], lo, hi, Step.Hour), "region")
    val got = md.collect().map(r =>
      (Option(r.getAs[Any]("page")), Option(r.getAs[Any]("region")),
        r.getAs[String]("fact"), r.getAs[String]("dim"),
        r.getAs[java.sql.Timestamp]("bucket"),
        Option(r.getAs[Any]("value")), Option(r.getAs[Any]("counter")),
        Option(r.getAs[Any]("total")))).toSet
    assert(got == exp.toSet)
    // all-filters-equal degenerates to the pairs overload exactly
    // (agreeing tiles regroup into the shared-scan read)
    val uniform = svc.getTimeseriesMulti(Seq(
        ("clicks", "page", Map("page" -> Option("p0"))),
        ("spend", "page", Map("page" -> Option("p0")))),
      lo, hi, Step.Hour, 0)
    val pairs = svc.getTimeseriesMulti(
      Seq("clicks" -> "page", "spend" -> "page"),
      Map("page" -> Option("p0")), lo, hi, Step.Hour, 0)
    assert(uniform.collect().toSet == pairs.collect().toSet)
    // the same fact twice on one dimension is indistinguishable rows —
    // refuse loudly
    assert(intercept[IllegalArgumentException] {
      svc.getTimeseriesMulti(Seq(
          ("clicks", "page", Map("page" -> Option("p0"))),
          ("clicks", "page", Map.empty[String, Option[String]])),
        lo, hi, Step.Hour, 0)
    }.getMessage.contains("duplicate"))
  }

  test("applyAdvice materializes only paying groupings and flips " +
      "explainRoute; rows unchanged") {
    import org.apache.spark.sql.functions.{col, lit, map, when}
    import spark.implicits._
    val svc = new TimeSeriesService(spark)
    svc.defineFact("hits", FactType.Counter, slice = 60)
    svc.defineDimension("dep", facts = Set("hits"))
    // 40 events over 2 hours × 2 deps → 4 slice keys, ratio 10× — pays
    val ev = (0 until 40).map(i => graft.model.Event("hits",
      ts(f"2014-03-21T${9 + i % 2}%02d:${i % 60}%02d"), 1L,
      Map("dep" -> ("d" + i % 2)))).toDF()
    svc.ingest(ev)
    def read() = svc.getTimeseries("hits", "dep", Map("dep" -> None),
      ts("2014-03-21T09:00"), ts("2014-03-21T11:00"), Step.Hour)
    def tier() = svc.explainRoute(Seq("hits"), "dep", Map("dep" -> None),
        ts("2014-03-21T09:00"), ts("2014-03-21T11:00"), Step.Hour)
      .select("tier").head.getString(0)
    val preRows = pivot(read(), Seq("dep"))
    assert(tier() == "raw-scan")
    // bar too high: a genuine NO — nothing materializes, still raw
    val declined = svc.applyAdvice(java.nio.file.Files
      .createTempDirectory("graft-advice-hi").toString,
      minCompactionE4 = 1000000L)
    assert(declined.forall(_.path.isEmpty) && tier() == "raw-scan")
    assert(declined.forall(_.compactionE4 >= 90000L),
      s"fixture should measure ~10x: $declined")
    // default bar: pays, materializes, registers — tier flips, rows don't
    val applied = svc.applyAdvice(java.nio.file.Files
      .createTempDirectory("graft-advice").toString)
    assert(applied.forall(_.path.isDefined))
    assert(tier() == "rollup-slice")
    assert(pivot(read(), Seq("dep")) == preRows)
    // a later ingest invalidates the advised rollup like any internal
    // one — the loop is re-runnable, never stale
    svc.ingest(Seq(graft.model.Event("hits", ts("2014-03-21T09:05"), 1L,
      Map("dep" -> "d0"))).toDF())
    assert(tier() == "raw-scan")
  }

  test("workload log records serves (not explains) and " +
      "applyAdviceFromWorkload materializes only hot raw-scan targets") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val svc = new TimeSeriesService(spark)
    svc.defineFact("hits", FactType.Counter, slice = 60)
    svc.defineDimension("dep", facts = Set("hits"))
    svc.defineDimension("kind", facts = Set("hits")) // declared, never read
    val ev = (0 until 40).map(i => graft.model.Event("hits",
      ts(f"2014-03-21T${9 + i % 2}%02d:${i % 60}%02d"), 1L,
      Map("dep" -> ("d" + i % 2), "kind" -> ("k" + i % 3)))).toDF()
    svc.ingest(ev)
    def read() = svc.getTimeseries("hits", "dep", Map("dep" -> None),
      ts("2014-03-21T09:00"), ts("2014-03-21T11:00"), Step.Hour)
    def log() = svc.workloadProfile().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    def tier(dim: String) = svc.explainRoute(Seq("hits"), dim,
        Map(dim -> None), ts("2014-03-21T09:00"),
        ts("2014-03-21T11:00"), Step.Hour)
      .select("tier").head.getString(0)
    assert(log().isEmpty)
    // explain is introspection — it must never inflate the workload
    assert(tier("dep") == "raw-scan" && log().isEmpty)
    val preRows = pivot(read(), Seq("dep"))
    read()
    assert(log() == Set(("hits", "dep", "raw-scan", 2L)))
    // minReads above the observed count: a genuine NO, nothing built
    val below = svc.applyAdviceFromWorkload(java.nio.file.Files
      .createTempDirectory("graft-wl-hi").toString, minReads = 3L)
    assert(below.isEmpty && tier("dep") == "raw-scan")
    // at the bar: exactly the hot grouping materializes; the declared
    // but never-read 'kind' target stays compute-on-read (plain
    // applyAdvice would have built BOTH — that is the difference)
    val applied = svc.applyAdviceFromWorkload(java.nio.file.Files
      .createTempDirectory("graft-wl").toString, minReads = 2L)
    assert(applied.map(_.grouping) == Seq("dep"))
    assert(applied.forall(_.path.isDefined))
    assert(tier("dep") == "rollup-slice" && tier("kind") == "raw-scan")
    // rows never change; the post-advice serve lands in the log on
    // its new tier
    assert(pivot(read(), Seq("dep")) == preRows)
    assert(log() == Set(("hits", "dep", "raw-scan", 2L),
      ("hits", "dep", "rollup-slice", 1L)))
    // a fresh observation window
    svc.resetWorkloadLog()
    assert(log().isEmpty)
  }

  test("workload log survives a service bounce: fold-on-attach, " +
      "checkpoint idempotence, prior-session advice") {
    import spark.implicits._
    val logPath = java.nio.file.Files
      .createTempDirectory("graft-wl-log").toString + "/log"
    def boot(): TimeSeriesService = {
      val svc = new TimeSeriesService(spark)
      svc.defineFact("hits", FactType.Counter, slice = 60)
      svc.defineDimension("dep", facts = Set("hits"))
      svc.ingest((0 until 40).map(i => graft.model.Event("hits",
        ts(f"2014-03-21T${9 + i % 2}%02d:${i % 60}%02d"), 1L,
        Map("dep" -> ("d" + i % 2)))).toDF())
      svc.attachWorkloadLog(logPath) // first boot: missing log = zero
      svc
    }
    def read(svc: TimeSeriesService) = svc.getTimeseries("hits", "dep",
      Map("dep" -> None), ts("2014-03-21T09:00"),
      ts("2014-03-21T11:00"), Step.Hour)
    def log(svc: TimeSeriesService) = svc.workloadProfile().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    val a = boot()
    read(a); read(a)
    a.checkpointWorkloadLog()
    // checkpoint is a full snapshot: doing it twice converges (a
    // crash between checkpoint and shutdown cannot double-count)
    a.checkpointWorkloadLog()
    // double attach would double-fold history — loud
    intercept[IllegalArgumentException] { a.attachWorkloadLog(logPath) }
    // the bounce: a FRESH instance holds the prior session's counts
    val b = boot()
    assert(log(b) == Set(("hits", "dep", "raw-scan", 2L)))
    // and the advisor acts on them without b having served anything
    val applied = b.applyAdviceFromWorkload(java.nio.file.Files
      .createTempDirectory("graft-wl-boot").toString, minReads = 2L)
    assert(applied.map(_.grouping) == Seq("dep"))
    assert(applied.forall(_.path.isDefined))
    read(b)
    b.checkpointWorkloadLog()
    // third boot: both sessions' traffic, accumulated
    val c = boot()
    assert(log(c) == Set(("hits", "dep", "raw-scan", 2L),
      ("hits", "dep", "rollup-slice", 1L)))
    // checkpointing without an attached log is loud, not silent
    intercept[IllegalStateException] {
      new TimeSeriesService(spark).checkpointWorkloadLog()
    }
  }

  test("typed Dataset surface agrees with the nested-map adapter") {
    val svc = freshService()
    val df = svc.getTimeseries("signups", "dependency_user",
      Map("dependency" -> None),
      ts("2014-03-21T09:00"), ts("2014-03-21T13:00"), Step.Hour)
    val dims = Seq("dependency", "dependency_user")
    val points = ResultShape.typed(df, dims)
    // typed lambdas over the distributed Dataset — the Dataset[T] path
    val juanele = points
      .filter(_.series("dependency_user") == "juanele")
      .collect()
    assert(juanele.forall(_.series == Map("dependency" -> "31",
      "dependency_user" -> "juanele")))
    // same content as the reference-shape adapter, point for point
    val viaTyped = points.collect()
      .groupBy(_.series)
      .map { case (k, ps) => k -> ps.map(p => p.bucket -> p.value).toMap }
    assert(viaTyped == pivot(df, dims))
    // and the values survive a typed aggregation
    assert(points.filter(_.value > 0).collect().map(_.value).sum ==
      df.agg(org.apache.spark.sql.functions.sum("value")).head.getLong(0))
  }
}
