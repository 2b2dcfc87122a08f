package graft

import org.apache.spark.sql.functions.col

import graft.operators.{Dedup, Quality, TextAnalysis}

/** The SQL consumption surface ([[graft.sql.PipelineViews]]): each
  * installed view must be the Scala read VERBATIM (the `*_sql` driver
  * twins additionally share the Scala forms' DuckDB oracles), and the
  * view must compose with user SQL on top. */
class PipelineViewsSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (0L, "alpha beta", "s0"), (1L, "alpha beta", "s1"),
    (2L, "gamma delta", "s0")).toDF("doc_id", "text", "source")

  test("dedup-rate view == Dedup.rateBySource; user SQL composes on top") {
    graft.sql.PipelineViews.installDedupRate(spark, docs)
    val viaSql = spark.sql("SELECT * FROM graft_dedup_rate_by_source")
      .collect().map(_.toSeq).toSet
    val viaScala = Dedup.rateBySource(docs, "text", "doc_id", "source")
      .collect().map(_.toSeq).toSet
    assert(viaSql == viaScala && viaSql.nonEmpty)
    // composable: a filter written in SQL on top of the view
    val s1 = spark.sql("SELECT n_docs, n_canonical, dup_e4 " +
        "FROM graft_dedup_rate_by_source WHERE source = 's1'")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s1.toSeq == Seq((1L, 0L, 10000L))) // s1's doc clones s0's
  }

  test("quality-report view == Quality.report") {
    val checks = Seq(
      Quality.NotNull("doc_id"),
      Quality.Satisfies("text_nonempty", col("text") =!= ""),
      Quality.Unique(Seq("text"))) // fails: two docs share a text
    graft.sql.PipelineViews.installQualityReport(spark, docs, checks)
    val viaSql = spark.sql(
        "SELECT `check`, violations, status FROM graft_quality_report")
      .collect().map(_.toSeq).toSet
    val viaScala = Quality.report(docs, checks)
      .collect().map(_.toSeq).toSet
    assert(viaSql == viaScala)
    val uniq = spark.sql("SELECT status FROM graft_quality_report " +
      "WHERE `check` LIKE 'unique%'").collect().map(_.getString(0))
    assert(uniq.toSeq == Seq("fail"))
  }

  test("timeseries view: the routed gap-filled calendar read from pure " +
      "SQL text — grid dense and finish-exclusive, plan rollup-served") {
    import graft.functions.TimeKernel.ts
    import graft.model.{FactType, Step}
    val svc = new TimeSeriesService(spark)
    svc.defineFact("clicks", FactType.Counter, slice = 15)
    svc.defineDimension("event_type", facts = Set("clicks"))
    svc.ingest(Seq(
      graft.model.Event("clicks", ts("2014-03-21T10:05"), 1L,
        Map("event_type" -> "click")),
      graft.model.Event("clicks", ts("2014-03-21T10:20"), 1L,
        Map("event_type" -> "click")),
      graft.model.Event("clicks", ts("2014-03-21T13:40"), 1L,
        Map("event_type" -> "view"))).toDF())
    val mvDir = java.nio.file.Files
      .createTempDirectory("graft_view_ts").toString
    svc.materializeRollups(mvDir)
    graft.sql.PipelineViews.installTimeseries(spark, svc, "clicks",
      "event_type", Map("event_type" -> Some("click")),
      ts("2014-03-21T08:00"), ts("2014-03-21T12:00"), Step.Hour)
    val q = spark.sql(
      "SELECT bucket, value FROM graft_timeseries ORDER BY bucket")
    // dense grid, start-inclusive / finish-EXCLUSIVE: 08..11, never 12
    assert(q.collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
      == Seq((ts("2014-03-21T08:00"), 0L), (ts("2014-03-21T09:00"), 0L),
        (ts("2014-03-21T10:00"), 2L), (ts("2014-03-21T11:00"), 0L)))
    // the view IS the routed logical plan: it scans the materialized
    // partials, never the raw events
    assert(q.queryExecution.executedPlan.toString.contains(mvDir))
    // identical to the Scala read it names
    val viaScala = svc.getTimeseries("clicks", "event_type",
        Map("event_type" -> Some("click")),
        ts("2014-03-21T08:00"), ts("2014-03-21T12:00"), Step.Hour)
      .collect().map(_.toSeq).toSet
    assert(spark.sql("SELECT * FROM graft_timeseries")
      .collect().map(_.toSeq).toSet == viaScala)
    // composable: user SQL filters over the view
    assert(spark.sql(
        "SELECT count(*) AS n FROM graft_timeseries WHERE value > 0")
      .head.getLong(0) == 1L)
  }

  test("windowed table function: the window moves in SQL text, each " +
      "window == the Scala read, rollup-served when registered") {
    import graft.functions.TimeKernel.ts
    import graft.model.{FactType, Step}
    val svc = new TimeSeriesService(spark)
    svc.defineFact("clicks", FactType.Counter, slice = 15, filler = -1L)
    svc.defineDimension("event_type", facts = Set("clicks"))
    svc.ingest(Seq(
      graft.model.Event("clicks", ts("2014-03-21T10:05"), 1L,
        Map("event_type" -> "click")),
      graft.model.Event("clicks", ts("2014-03-21T10:20"), 1L,
        Map("event_type" -> "click")),
      graft.model.Event("clicks", ts("2014-03-22T13:40"), 3L,
        Map("event_type" -> "click"))).toDF())
    val mvDir = java.nio.file.Files
      .createTempDirectory("graft_view_win").toString
    svc.materializeRollups(mvDir)
    graft.sql.PipelineViews.installTimeseriesWindow(spark, svc, "clicks",
      "event_type", Map("event_type" -> Some("click")), Step.Hour)
    def viaSql(a: String, b: String) = spark.sql(
      s"SELECT * FROM graft_timeseries_window(TIMESTAMP '$a', " +
        s"TIMESTAMP '$b')")
    def viaScala(a: String, b: String) = svc.getTimeseries("clicks",
      "event_type", Map("event_type" -> Some("click")),
      ts(a.replace(" ", "T")), ts(b.replace(" ", "T")), Step.Hour)
    // two windows from ONE install — the round-11 gap was exactly
    // this: moving the window required a Scala re-install
    for ((a, b) <- Seq(
        ("2014-03-21 08:00:00", "2014-03-21 12:00:00"),
        ("2014-03-22 12:00:00", "2014-03-22 15:00:00"),
        // mid-hour start: grid points match no truncated bucket —
        // all filler, the reference's documented edge
        ("2014-03-21 09:30:00", "2014-03-21 11:30:00"))) {
      val sql = viaSql(a, b).collect().map(_.toSeq).toSet
      val sc = viaScala(a, b).collect().map(_.toSeq).toSet
      assert(sql == sc, s"window [$a, $b): $sql != $sc")
    }
    // the fact's filler is honored (filler = -1, not the default 0):
    // 08:00 is a gap bucket of a series that IS in the window's scan
    assert(viaSql("2014-03-21 08:00:00", "2014-03-21 12:00:00")
      .where("bucket = TIMESTAMP '2014-03-21 08:00:00'")
      .head.getLong(2) == -1L)
    // empty window → zero rows, same schema
    assert(viaSql("2014-03-21 08:00:00", "2014-03-21 08:00:00")
      .count() == 0L)
    // the function body serves from the REGISTERED slice partials:
    // the inlined plan scans the store, and the call's literal window
    // prunes its bucket_date partitions
    val plan = viaSql("2014-03-21 08:00:00", "2014-03-21 12:00:00")
      .queryExecution.executedPlan.toString
    assert(plan.contains(mvDir), "window function must scan the rollup")
  }

  test("windowed function day branch: aligned calls prune to the day " +
      "store, unaligned keep the slice branch, rows identical; a later " +
      "ingest re-routes the installed function (no stale rollup)") {
    import graft.functions.TimeKernel.ts
    import graft.model.{FactType, Step}
    val svc = new TimeSeriesService(spark)
    svc.defineFact("clicks", FactType.Counter, slice = 15)
    svc.defineDimension("event_type", facts = Set("clicks"))
    svc.ingest(Seq(
      graft.model.Event("clicks", ts("2014-03-21T10:05"), 1L,
        Map("event_type" -> "click")),
      graft.model.Event("clicks", ts("2014-03-21T22:20"), 2L,
        Map("event_type" -> "click")),
      graft.model.Event("clicks", ts("2014-03-22T13:40"), 3L,
        Map("event_type" -> "click"))).toDF())
    val mvDir = java.nio.file.Files
      .createTempDirectory("graft_view_winday").toString
    val slicePath = svc.materializeRollups(mvDir).head
    val dayPath = s"${slicePath}__day"
    graft.sql.PipelineViews.installTimeseriesWindow(spark, svc, "clicks",
      "event_type", Map("event_type" -> Some("click")), Step.Day,
      name = "graft_tw_day")
    def q(a: String, b: String) = spark.sql(
      s"SELECT * FROM graft_tw_day(TIMESTAMP '$a', TIMESTAMP '$b')")
    def viaScala(a: String, b: String) = svc.getTimeseries("clicks",
      "event_type", Map("event_type" -> Some("click")),
      ts(a.replace(" ", "T")), ts(b.replace(" ", "T")), Step.Day)
    // ALIGNED window (finish = last slice of the day → scan bound is
    // the next midnight): the constant-folded alignment predicate
    // must remove the slice branch — the plan scans ONLY the day
    // store (scan locations read from the optimized plan: the plan
    // STRING truncates long parquet paths)
    def scans(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      import org.apache.spark.sql.execution.datasources.{
        HadoopFsRelation, LogicalRelation}
      df.queryExecution.optimizedPlan.collectLeaves().flatMap {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
          case _ => Nil
        }
        case _ => Nil
      }
    }
    val aligned = q("2014-03-21 00:00:00", "2014-03-22 23:45:00")
    val ap = scans(aligned)
    assert(ap.exists(_.contains(dayPath)),
      s"aligned call must scan the day store, scanned: $ap")
    assert(!ap.exists(p => p.contains(slicePath) && !p.contains(dayPath)),
      s"aligned call must NOT scan the slice store, scanned: $ap")
    assert(aligned.collect().map(_.toSeq).toSet ==
      viaScala("2014-03-21 00:00:00", "2014-03-22 23:45:00")
        .collect().map(_.toSeq).toSet)
    // UNALIGNED window (12:00 finish): slice branch serves, day store
    // pruned out of the plan
    val unaligned = q("2014-03-21 00:00:00", "2014-03-22 12:00:00")
    val up = scans(unaligned)
    assert(!up.exists(_.contains(dayPath)),
      s"unaligned call must NOT scan the day store, scanned: $up")
    assert(up.exists(_.contains(slicePath)),
      s"unaligned call must scan the slice store, scanned: $up")
    assert(unaligned.collect().map(_.toSeq).toSet ==
      viaScala("2014-03-21 00:00:00", "2014-03-22 12:00:00")
        .collect().map(_.toSeq).toSet)
    // FRESHNESS: a later write invalidates the rollup for Scala reads
    // — the installed function must re-route with it instead of
    // silently serving the stale rollup parquet (the installer
    // registers a re-install hook the write path runs)
    svc.newFact("clicks", ts("2014-03-21T10:07"), 10L,
      Map("event_type" -> "click"))
    val fresh = q("2014-03-21 00:00:00", "2014-03-22 23:45:00")
    assert(!scans(fresh).exists(_.contains(mvDir)),
      "post-ingest call must not read the invalidated store")
    assert(fresh.collect().map(_.toSeq).toSet ==
      viaScala("2014-03-21 00:00:00", "2014-03-22 23:45:00")
        .collect().map(_.toSeq).toSet,
      "the installed function served stale pre-ingest rollups")
    assert(fresh.where("bucket = TIMESTAMP '2014-03-21 00:00:00'")
      .head.getLong(2) == 13L, "day 1 must include the new event")
  }

  test("windowed histogram function day branch: aligned :all windows " +
      "serve the day store; ingest re-routes") {
    import graft.functions.TimeKernel.ts
    import graft.model.FactType
    val svc = new TimeSeriesService(spark)
    svc.defineFact("lat_hist", FactType.Histogram, slice = 15,
      start = Some(0L), end = Some(100L), step = Some(10L))
    svc.defineDimension("event_type", facts = Set("lat_hist"))
    svc.ingest(Seq(
      graft.model.Event("lat_hist", ts("2014-03-21T10:05"), 12L,
        Map("event_type" -> "click")),
      graft.model.Event("lat_hist", ts("2014-03-22T09:40"), 95L,
        Map("event_type" -> "click"))).toDF())
    val mvDir = java.nio.file.Files
      .createTempDirectory("graft_view_hwinday").toString
    val slicePath = svc.materializeRollups(mvDir).head
    val dayPath = s"${slicePath}__day"
    graft.sql.PipelineViews.installHistogramWindow(spark, svc,
      "lat_hist", "event_type", Map("event_type" -> None),
      name = "graft_hw_day")
    def q(a: String, b: String) = spark.sql(
      s"SELECT * FROM graft_hw_day(TIMESTAMP '$a', TIMESTAMP '$b')")
    def scans(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      import org.apache.spark.sql.execution.datasources.{
        HadoopFsRelation, LogicalRelation}
      df.queryExecution.optimizedPlan.collectLeaves().flatMap {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
          case _ => Nil
        }
        case _ => Nil
      }
    }
    val aligned = q("2014-03-21 00:00:00", "2014-03-22 23:45:00")
    val ap = scans(aligned)
    assert(ap.exists(_.contains(dayPath)) &&
      !ap.exists(p => p.contains(slicePath) && !p.contains(dayPath)),
      s"aligned :all window must serve only the day store, scanned: $ap")
    assert(aligned.collect().map(_.toSeq).toSet ==
      svc.getHistogram("lat_hist", "event_type",
          Map("event_type" -> None), ts("2014-03-21T00:00"),
          ts("2014-03-22T23:45"))
        .collect().map(_.toSeq).toSet)
    val unaligned = q("2014-03-21 00:00:00", "2014-03-22 12:00:00")
    assert(!scans(unaligned).exists(_.contains(dayPath)),
      "unaligned window must keep the slice branch")
    // freshness through the hook, histogram twin
    svc.newFact("lat_hist", ts("2014-03-21T10:06"), 44L,
      Map("event_type" -> "click"))
    val fresh = q("2014-03-21 00:00:00", "2014-03-22 23:45:00")
    assert(fresh.collect().map(_.toSeq).toSet ==
      svc.getHistogram("lat_hist", "event_type",
          Map("event_type" -> None), ts("2014-03-21T00:00"),
          ts("2014-03-22T23:45"))
        .collect().map(_.toSeq).toSet,
      "the installed histogram function served stale rollups")
  }

  test("windowed histogram function: each SQL-text window == the Scala " +
      "getHistogram for that range") {
    import graft.functions.TimeKernel.ts
    import graft.model.{FactType, Step}
    val svc = new TimeSeriesService(spark)
    svc.defineFact("lat_hist", FactType.Histogram, slice = 15,
      start = Some(0L), end = Some(100L), step = Some(10L))
    svc.defineDimension("event_type", facts = Set("lat_hist"))
    svc.ingest(Seq(
      graft.model.Event("lat_hist", ts("2014-03-21T10:05"), 12L,
        Map("event_type" -> "click")),
      graft.model.Event("lat_hist", ts("2014-03-21T10:20"), 17L,
        Map("event_type" -> "click")),
      graft.model.Event("lat_hist", ts("2014-03-22T09:40"), 95L,
        Map("event_type" -> "click")),
      graft.model.Event("lat_hist", ts("2014-03-22T09:41"), 300L,
        Map("event_type" -> "view"))).toDF())
    graft.sql.PipelineViews.installHistogramWindow(spark, svc, "lat_hist",
      "event_type", Map("event_type" -> None))
    def viaSql(a: String, b: String) = spark.sql(
      s"SELECT * FROM graft_histogram_window(TIMESTAMP '$a', " +
        s"TIMESTAMP '$b')").collect().map(_.toSeq).toSet
    def viaScala(a: String, b: String) = svc.getHistogram("lat_hist",
        "event_type", Map("event_type" -> None),
        ts(a.replace(" ", "T")), ts(b.replace(" ", "T")))
      .collect().map(_.toSeq).toSet
    for ((a, b) <- Seq(
        ("2014-03-21 00:00:00", "2014-03-22 00:00:00"),
        ("2014-03-22 00:00:00", "2014-03-23 00:00:00"),
        ("2014-03-21 00:00:00", "2014-03-23 00:00:00"))) {
      assert(viaSql(a, b) == viaScala(a, b), s"window [$a, $b)")
    }
    // clamp semantics survive into SQL: 300 lands in the top bucket
    assert(viaSql("2014-03-22 00:00:00", "2014-03-23 00:00:00")
      .exists(r => r(0) == "view" && r(1) == 90L && r(2) == 1L))
  }

  test("bm25 view serves from the registered index via SQL text") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_view_bm25").toString
    TextAnalysis.buildTextIndex(docs, "text", "doc_id", idx, nBuckets = 8)
    graft.sql.PipelineViews.installBm25(spark, idx,
      Seq("q0" -> Seq("alpha"), "q1" -> Seq("delta")), topK = 2)
    val got = spark.sql("SELECT query_id, id FROM graft_bm25_topk")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("q0", 0L), ("q0", 1L), ("q1", 2L)))
    val viaScala = TextAnalysis.bm25TopKFromIndex(spark, idx,
        Seq("q0" -> Seq("alpha"), "q1" -> Seq("delta")), topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(got == viaScala)
  }
}
