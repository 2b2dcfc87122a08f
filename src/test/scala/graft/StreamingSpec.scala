package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.TimeKernel.ts
import graft.model._
import graft.streaming.StreamingIngest

/** Batch/stream equivalence: replaying the golden events through
  * Structured Streaming yields the same query results as batch writes
  * (SURVEY §5 test plan, item 5). */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private val goldenEvents = Seq(
    Event("signups", ts("2014-03-21T09:09"), 1,
      Map("dependency" -> "32", "dependency_user" -> "pepe")),
    Event("signups", ts("2014-03-21T10:23"), 1,
      Map("dependency" -> "31", "dependency_user" -> "juanele")))

  private def freshService(): TimeSeriesService = {
    val svc = new TimeSeriesService(spark)
    svc.defineFact("signups", FactType.Counter, slice = 10)
    svc.defineDimension("dependency", facts = Set("signups"))
    svc.defineDimension("dependency_user",
      groupedBy = Seq(Seq("dependency")), facts = Set("signups"))
    svc
  }

  test("foreachBatch ingestion: stream replay == batch writes (golden query)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val svc = freshService()
    val q = StreamingIngest.foreachBatchInto(source.toDF(), svc)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ck").toString)
      .start()
    source.addData(goldenEvents.head)
    q.processAllAvailable()
    source.addData(goldenEvents(1)) // second micro-batch
    q.processAllAvailable()
    q.stop()

    val got = pivot(
      svc.getTimeseries("signups", "dependency_user",
        Map("dependency" -> Some("31")),
        ts("2014-03-21T09:00"), ts("2014-03-21T13:00"), Step.Hour),
      Seq("dependency", "dependency_user"))
    assert(got == Map(
      Map("dependency" -> "31", "dependency_user" -> "juanele") -> Map(
        Option(ts("2014-03-21T09:00")) -> 0L,
        Option(ts("2014-03-21T10:00")) -> 1L,
        Option(ts("2014-03-21T11:00")) -> 0L,
        Option(ts("2014-03-21T12:00")) -> 0L)))
  }

  test("late data lands in its own old bucket (unbounded lateness parity)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val svc = freshService()
    val q = StreamingIngest.foreachBatchInto(source.toDF(), svc)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ck").toString)
      .start()
    source.addData(Event("signups", ts("2014-03-21T12:00"), 1,
      Map("dependency" -> "31", "dependency_user" -> "juanele")))
    q.processAllAvailable()
    // hours-late event for the 09:xx bucket arrives after 12:00 data
    source.addData(Event("signups", ts("2014-03-21T09:05"), 1,
      Map("dependency" -> "31", "dependency_user" -> "juanele")))
    q.processAllAvailable()
    q.stop()

    val got = pivot(
      svc.getTimeseries("signups", "dependency_user",
        Map("dependency" -> Some("31")),
        ts("2014-03-21T09:00"), ts("2014-03-21T13:00"), Step.Hour),
      Seq("dependency", "dependency_user"))
    val series = got(Map("dependency" -> "31", "dependency_user" -> "juanele"))
    assert(series(Option(ts("2014-03-21T09:00"))) == 1L)
    assert(series(Option(ts("2014-03-21T12:00"))) == 1L)
  }

  test("watermarked slice aggregation emits per-slice partial aggregates") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val fact = FactDef("signups", FactType.Counter, sliceMinutes = 10)
    val agged = StreamingIngest.sliceAggregation(source.toDF(), fact,
      Seq("dependency"), watermarkHorizon = "1 hour")
    val q = StreamingIngest.startToMemory(agged, "slice_agg_test")
    source.addData(
      Event("signups", ts("2014-03-21T09:05"), 1, Map("dependency" -> "32")),
      Event("signups", ts("2014-03-21T09:09"), 1, Map("dependency" -> "32")),
      Event("signups", ts("2014-03-21T09:21"), 1, Map("dependency" -> "32")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT * FROM slice_agg_test")
      .collect()
      .map(r => (r.getAs[String]("dependency"),
        r.getAs[Timestamp]("bucket"), r.getAs[Long]("value"))).toSet
    // 09:05 and 09:09 share the 09:00 ten-minute slice; 09:21 is in 09:20
    assert(rows == Set(
      ("32", ts("2014-03-21T09:00"), 2L),
      ("32", ts("2014-03-21T09:20"), 1L)))
  }

  test("stateful sessionization: closed sessions == batch session_window") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp)]
    val sessions = StreamingIngest.sessionizeStream(
      source.toDF().toDF("user_id", "ts"), gapMinutes = 30,
      watermarkDelay = "1 hour")
    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sess_test")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ck").toString)
      .start()
    val batch1 = Seq(
      (1L, ts("2024-01-01T10:00")), (1L, ts("2024-01-01T10:10")),
      (2L, ts("2024-01-01T10:05")), (1L, ts("2024-01-01T10:50")))
    source.addData(batch1: _*)
    q.processAllAvailable()
    // out-of-order (inside the 1h watermark): merges into user 1's
    // first session
    source.addData((1L, ts("2024-01-01T10:05")))
    q.processAllAvailable()
    // push the watermark past every session's close, then one more
    // batch so the event-time timeouts actually fire
    source.addData((99L, ts("2024-01-01T20:00")))
    q.processAllAvailable()
    source.addData((98L, ts("2024-01-01T20:01")))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sess_test").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("session_start"),
        r.getAs[Timestamp]("session_end"), r.getAs[Long]("n_events"))).toSet
    assert(got == Set(
      (1L, ts("2024-01-01T10:00"), ts("2024-01-01T10:10"), 3L),
      (1L, ts("2024-01-01T10:50"), ts("2024-01-01T10:50"), 1L),
      (2L, ts("2024-01-01T10:05"), ts("2024-01-01T10:05"), 1L)))

    // batch session_window over the same closed-user events agrees
    import org.apache.spark.sql.functions.{col, count, lit, session_window}
    val staticEvents = (batch1 :+ ((1L, ts("2024-01-01T10:05"))))
      .toDF("user_id", "ts")
    val batchSessions = staticEvents
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(batchSessions == got.map(s => (s._1, s._2, s._4)))
  }

  test("stream-stream attribution join: cross-batch matches, window bounds") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Long, String, Timestamp)]
    val joined = StreamingIngest.attributionStream(
      source.toDF().toDF("event_id", "user_id", "event_type", "ts"),
      windowSeconds = 3600L, watermarkDelay = "1 hour")
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("attrib_test")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ck").toString)
      .start()
    // batch 1: a click, and one same-batch purchase inside the window
    source.addData(
      (1L, 7L, "click", ts("2024-01-01T10:00")),
      (2L, 7L, "purchase", ts("2024-01-01T10:30")))
    q.processAllAvailable()
    // batch 2: a LATER purchase for the same click — the click must
    // still be in join state from batch 1 (cross-micro-batch match);
    // plus boundary probes: exactly +1h is OUTSIDE (exclusive upper),
    // equal timestamps are INSIDE (inclusive lower), other user never
    source.addData(
      (3L, 7L, "purchase", ts("2024-01-01T10:59")),
      (4L, 7L, "purchase", ts("2024-01-01T11:00")),
      (5L, 7L, "purchase", ts("2024-01-01T10:00")),
      (6L, 8L, "purchase", ts("2024-01-01T10:15")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("attrib_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 7L, 2L), (1L, 7L, 3L), (1L, 7L, 5L)),
      s"got $got")
  }

  test("streaming funnel: late click slots before the purchase (ordered drain)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, Long, String)]
    val hits = StreamingIngest.funnelStream(
      source.toDF().toDF("user_id", "ts", "event_id", "event_type"),
      stages = Seq("signup", "click", "purchase"),
      watermarkDelay = "1 hour")
    val q = hits.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("funnel_test")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ck").toString)
      .start()
    // batch 1: signup and purchase arrive; the qualifying click is
    // MISSING so far — an unordered incremental funnel would discard
    // the purchase here and never recover
    source.addData(
      (7L, ts("2024-01-01T10:00"), 1L, "signup"),
      (7L, ts("2024-01-01T10:30"), 3L, "purchase"))
    q.processAllAvailable()
    // batch 2: the click arrives LATE but inside the 1 h horizon
    source.addData((7L, ts("2024-01-01T10:10"), 2L, "click"))
    q.processAllAvailable()
    // advance the watermark past everything, then one more batch so
    // the event-time timeout drains the gated events
    source.addData((99L, ts("2024-01-01T20:00"), 90L, "signup"))
    q.processAllAvailable()
    source.addData((98L, ts("2024-01-01T20:01"), 91L, "signup"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel_test")
      .where(org.apache.spark.sql.functions.col("user_id") === 7L)
      .collect()
      .map(r => (r.getLong(1), r.getTimestamp(2))).toSet
    // all three stages reached, in true event-time order
    assert(got == Set(
      (0L, ts("2024-01-01T10:00")),
      (1L, ts("2024-01-01T10:10")),
      (2L, ts("2024-01-01T10:30"))), s"got $got")
  }

  test("streaming-maintained rollup serves getTimeseries; compaction preserves") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Rollups
    val source = MemoryStream[Event]
    val fact = FactDef("signups", FactType.Counter, sliceMinutes = 10)
    val path = java.nio.file.Files.createTempDirectory("graft-mnt").toString
    val q = StreamingIngest.maintainRollup(source.toDF(), fact,
        Seq("dependency", "dependency_user"), path)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ck").toString)
      .start()
    source.addData(goldenEvents.head)
    q.processAllAvailable()
    // second batch: juanele's 10:20 slice + an hours-late event for an
    // earlier bucket (appends into the old date partition)
    source.addData(goldenEvents(1),
      Event("signups", ts("2014-03-21T09:02"), 1,
        Map("dependency" -> "31", "dependency_user" -> "juanele")))
    q.processAllAvailable()
    // third batch: the SAME 10:20 slice again → a second partial row
    // for that key, summed away by every reader
    source.addData(Event("signups", ts("2014-03-21T10:23"), 1,
      Map("dependency" -> "31", "dependency_user" -> "juanele")))
    q.processAllAvailable()
    q.stop()

    val svc = freshService()
    svc.registerRollup("signups", Seq("dependency", "dependency_user"), path)
    def query() = pivot(svc.getTimeseries("signups", "dependency_user",
      Map("dependency" -> Some("31")),
      ts("2014-03-21T09:00"), ts("2014-03-21T13:00"), Step.Hour),
      Seq("dependency", "dependency_user"))
    val expected = Map(
      Map("dependency" -> "31", "dependency_user" -> "juanele") -> Map(
        Option(ts("2014-03-21T09:00")) -> 1L, // the late event
        Option(ts("2014-03-21T10:00")) -> 2L, // two partial rows summed
        Option(ts("2014-03-21T11:00")) -> 0L,
        Option(ts("2014-03-21T12:00")) -> 0L))
    assert(query() == expected)

    // compaction collapses duplicate partials without changing results
    val compacted = java.nio.file.Files.createTempDirectory("graft-cmp").toString
    Rollups.compact(spark, path, compacted)
    val rawRows = Rollups.read(spark, path).count()
    val cmpRows = Rollups.read(spark, compacted).count()
    assert(cmpRows < rawRows) // the duplicate 10:20 partials merged
    // file growth is bounded too: one file set per key-partition, not
    // one per (batch × partition)
    def parquetFiles(p: String): Long =
      java.nio.file.Files.walk(java.nio.file.Paths.get(p))
        .filter(f => f.toString.endsWith(".parquet")).count()
    assert(parquetFiles(compacted) < parquetFiles(path))
    svc.registerRollup("signups", Seq("dependency", "dependency_user"), compacted)
    assert(query() == expected)
  }

  test("maintained rollup: replayed micro-batches overwrite, never double-count") {
    implicit val sqlCtx = spark.sqlContext
    val fact = FactDef("signups", FactType.Counter, sliceMinutes = 10)
    val path = java.nio.file.Files.createTempDirectory("graft-rply").toString
    val dims = Seq("dependency", "dependency_user")
    def runOnce(): Unit = {
      val source = MemoryStream[Event]
      val q = StreamingIngest.maintainRollup(source.toDF(), fact, dims, path)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-ck").toString)
        .start()
      source.addData(goldenEvents.head)
      q.processAllAvailable()
      source.addData(goldenEvents(1))
      q.processAllAvailable()
      q.stop()
    }
    runOnce()
    val svc = freshService()
    svc.registerRollup("signups", dims, path)
    def query() = pivot(svc.getTimeseries("signups", "dependency_user",
      Map("dependency" -> Some("31")),
      ts("2014-03-21T09:00"), ts("2014-03-21T13:00"), Step.Hour), dims)
    val first = query()
    assert(first(Map("dependency" -> "31", "dependency_user" -> "juanele"))(
      Option(ts("2014-03-21T10:00"))) == 1L)
    // Simulate a crash between the data write and the marker write: the
    // marker is gone, so a restart replays every batch. The batch-scoped
    // overwrite must absorb the replay — same result, no double counts.
    val marker = new org.apache.hadoop.fs.Path(path, "_graft_last_batch")
    marker.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(marker, false)
    runOnce()
    assert(query() == first)
  }

  test("streaming-maintained BM25 index == scan-time; replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.TextAnalysis
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a hash join beats a sort merge join on small builds"),
      (3L, "the fox likes hash tables"),
      (4L, "window functions sort within partitions"))
    val path = java.nio.file.Files.createTempDirectory("graft-bm25s").toString
    def runOnce(): Unit = {
      val source = MemoryStream[(Long, String)]
      val q = StreamingIngest.maintainTextIndex(
          source.toDF().toDF("doc_id", "text"), "text", "doc_id",
          s"$path/idx", nBuckets = 8)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-bm25ck").toString)
        .start()
      source.addData(corpus.take(2): _*)
      q.processAllAvailable()
      source.addData(corpus.drop(2): _*)
      q.processAllAvailable()
      q.stop()
    }
    runOnce()
    val qs = Seq("q1" -> Seq("hash", "join"), "q2" -> Seq("fox"))
    def served() = TextAnalysis
      .bm25TopKFromIndex(spark, s"$path/idx", qs, topK = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val scan = TextAnalysis.bm25TopK(corpus.toDF("doc_id", "text"),
        "text", "doc_id", qs, topK = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val first = served()
    assert(first == scan, s"served=$first scan=$scan")
    // a full replay (fresh checkpoint, same batch ids) must overwrite
    // its own batch dirs and change nothing — effectively-once
    runOnce()
    assert(served() == first)
  }

  test("streamed index erasure: mid-stream deletion closes exactly; " +
      "redelivered requests never double-subtract") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.TextAnalysis
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a hash join beats a sort merge join on small builds"),
      (3L, "the fox likes hash tables"),
      (4L, "window functions sort within partitions"))
    val path = java.nio.file.Files.createTempDirectory("graft-bm25se")
      .toString
    // appends batch 1 → erase doc 3 MID-STREAM → appends batch 2: the
    // erasure interleaves with index maintenance on the same store
    val docSrc = MemoryStream[(Long, String)]
    val idx = StreamingIngest.maintainTextIndex(
        docSrc.toDF().toDF("doc_id", "text"), "text", "doc_id",
        s"$path/idx", nBuckets = 8)
      .option("checkpointLocation", s"$path/ck_idx").start()
    docSrc.addData(corpus.take(3): _*)
    idx.processAllAvailable()
    def erase(ckpt: String): Unit = {
      val reqSrc = MemoryStream[String]
      val er = StreamingIngest.eraseTextIndexStream(
          reqSrc.toDF().toDF("id"), "id", s"$path/idx")
        .option("checkpointLocation", s"$path/$ckpt").start()
      reqSrc.addData("3")
      er.processAllAvailable()
      er.stop()
    }
    erase("ck_er1")
    docSrc.addData(corpus.drop(3): _*)
    idx.processAllAvailable()
    idx.stop()
    val qs = Seq("q1" -> Seq("hash", "join"), "q2" -> Seq("fox"))
    def served() = TextAnalysis
      .bm25TopKFromIndex(spark, s"$path/idx", qs, topK = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // exact over the SURVIVORS: stats (n, Σdl) subtracted, df
    // re-aggregated — identical to never having indexed doc 3
    val scan = TextAnalysis.bm25TopK(
        corpus.filter(_._1 != 3L).toDF("doc_id", "text"),
        "text", "doc_id", qs, topK = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val first = served()
    assert(first == scan, s"served=$first scan=$scan")
    assert(!first.exists(_._3 == 3L), "erased doc still serves")
    // full request redelivery (fresh checkpoint): already-tombstoned
    // id subtracts nothing — replay-idempotent with zero state
    erase("ck_er2")
    assert(served() == first)
  }

  test("streaming decontamination: per-batch reports union to the " +
      "batch report; replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Decontaminate
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a story about the lazy dog sleeping all day"),
      (3L, "completely unrelated words appear here today friends"),
      (4L, "the quick brown fox naps"))
    val evalDocs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val out = java.nio.file.Files
      .createTempDirectory("graft-sdecon").toString + "/out"
    def runOnce(): Unit = {
      val source = MemoryStream[(Long, String)]
      val q = StreamingIngest.decontaminateStream(
          source.toDF().toDF("doc_id", "text"), evalDocs,
          "text", "doc_id", out)
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory("graft-sdeconck").toString)
        .start()
      source.addData(train.take(2): _*)
      q.processAllAvailable()
      source.addData(train.drop(2): _*)
      q.processAllAvailable()
      q.stop()
    }
    runOnce()
    def got(): Map[Long, Long] = spark.read.parquet(out)
      .select(col("id"), col("hits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Decontaminate.overlapReport(
        train.toDF("doc_id", "text"), evalDocs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got() == batch, s"stream=${got()} batch=$batch")
    // doc 4 arrived in batch 1 with two shared shingles — the report
    // is cross-batch complete, not just first-batch
    assert(got().contains(4L))
    // full replay (fresh checkpoint, same batch ids): deterministic
    // __batch_id= dirs overwrite themselves — effectively-once
    runOnce()
    assert(got() == batch)
  }

  test("external rollup + direct service writes: both histories served") {
    implicit val sqlCtx = spark.sqlContext
    val fact = FactDef("signups", FactType.Counter, sliceMinutes = 10)
    val path = java.nio.file.Files.createTempDirectory("graft-ext").toString
    val dims = Seq("dependency", "dependency_user")
    val source = MemoryStream[Event]
    val q = StreamingIngest.maintainRollup(source.toDF(), fact, dims, path)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ck").toString)
      .start()
    source.addData(goldenEvents: _*) // 09:09 dep=32 + 10:23 dep=31
    q.processAllAvailable()
    q.stop()

    val svc = freshService()
    svc.registerRollup("signups", dims, path)
    // a write through the service must NOT silently drop the streamed
    // history (the registration survives), and the new event must be
    // visible merged into the same query
    svc.newFact("signups", ts("2014-03-21T11:30"), 1,
      Map("dependency" -> "31", "dependency_user" -> "juanele"))
    val got = pivot(svc.getTimeseries("signups", "dependency_user",
      Map("dependency" -> Some("31")),
      ts("2014-03-21T09:00"), ts("2014-03-21T13:00"), Step.Hour), dims)
    assert(got == Map(
      Map("dependency" -> "31", "dependency_user" -> "juanele") -> Map(
        Option(ts("2014-03-21T09:00")) -> 0L,
        Option(ts("2014-03-21T10:00")) -> 1L, // streamed history
        Option(ts("2014-03-21T11:00")) -> 1L, // direct write
        Option(ts("2014-03-21T12:00")) -> 0L)))

    // push local ingestion past the spill threshold: events now live in
    // the on-disk store (buffer empty, bulk None) — the external-rollup
    // merge must STILL see them alongside the streamed history
    implicit val sqlCtx2 = spark.sqlContext
    import spark.implicits._
    for (i <- 0 until 35) {
      svc.ingest(Seq(Event("signups", ts(f"2014-03-21T12:${i % 60}%02d"), 1L,
        Map("dependency" -> "31", "dependency_user" -> "juanele"))).toDF())
    }
    val spilled = pivot(svc.getTimeseries("signups", "dependency_user",
      Map("dependency" -> Some("31")),
      ts("2014-03-21T09:00"), ts("2014-03-21T13:00"), Step.Hour), dims)
    val series = spilled(
      Map("dependency" -> "31", "dependency_user" -> "juanele"))
    assert(series(Option(ts("2014-03-21T10:00"))) == 1L) // streamed kept
    assert(series(Option(ts("2014-03-21T11:00"))) == 1L) // buffered kept
    assert(series(Option(ts("2014-03-21T12:00"))) == 35L) // spilled seen
  }

  test("maintained rollup serves an AVERAGE fact: (counter,total) partials") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val fact = FactDef("resptime", FactType.Average, sliceMinutes = 15)
    val path = java.nio.file.Files.createTempDirectory("graft-avg").toString
    val q = StreamingIngest.maintainRollup(source.toDF(), fact, Seq("host"), path)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ck").toString)
      .start()
    source.addData(
      Event("resptime", ts("2014-03-21T09:01"), 100, Map("host" -> "a")),
      Event("resptime", ts("2014-03-21T09:07"), 200, Map("host" -> "a")))
    q.processAllAvailable()
    // second batch into the SAME slice: partials must re-aggregate
    source.addData(
      Event("resptime", ts("2014-03-21T09:11"), 60, Map("host" -> "a")))
    q.processAllAvailable()
    q.stop()

    val svc = new TimeSeriesService(spark)
    svc.defineFact("resptime", FactType.Average, slice = 15)
    svc.defineDimension("host", facts = Set("resptime"))
    svc.registerRollup("resptime", Seq("host"), path)
    val rows = svc.getTimeseries("resptime", "host", Map.empty,
        ts("2014-03-21T09:00"), ts("2014-03-21T10:00"), Step.Hour)
      .collect()
      .map(r => (r.getAs[String]("host"), r.getAs[Timestamp]("bucket"),
        r.getAs[Long]("counter"), r.getAs[Long]("total"))).toSet
    assert(rows == Set(("a", ts("2014-03-21T09:00"), 3L, 360L)))
  }

  test("maintained rollup serves a HISTOGRAM fact: tall partials") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val fact = FactDef("lat_hist", FactType.Histogram, sliceMinutes = 15,
      start = Some(0L), end = Some(300L), step = Some(100L))
    val path = java.nio.file.Files.createTempDirectory("graft-hist").toString
    val q = StreamingIngest.maintainRollup(source.toDF(), fact, Seq("host"), path)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ck").toString)
      .start()
    source.addData(
      Event("lat_hist", ts("2014-03-21T09:01"), 50, Map("host" -> "a")),
      Event("lat_hist", ts("2014-03-21T09:07"), 250, Map("host" -> "a")))
    q.processAllAvailable()
    // same slice, same value bucket as the first event: counts re-agg
    source.addData(
      Event("lat_hist", ts("2014-03-21T09:11"), 80, Map("host" -> "a")))
    q.processAllAvailable()
    q.stop()

    val svc = new TimeSeriesService(spark)
    svc.defineFact("lat_hist", FactType.Histogram, slice = 15,
      start = Some(0L), end = Some(300L), step = Some(100L))
    svc.defineDimension("host", facts = Set("lat_hist"))
    svc.registerRollup("lat_hist", Seq("host"), path)
    val rows = svc.getHistogram("lat_hist", "host", Map.empty,
        ts("2014-03-21T09:00"), ts("2014-03-21T10:00"))
      .collect()
      .map(r => (r.getAs[String]("host"), r.getAs[Long]("hist_bucket"),
        r.getAs[Long]("value"))).toSet
    assert(rows == Set(("a", 0L, 2L), ("a", 200L, 1L)))
  }

  test("maintained rollup serves a DISTINCT fact: tall value partials") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val fact = FactDef("uniq", FactType.Distinct, sliceMinutes = 15)
    val path = java.nio.file.Files.createTempDirectory("graft-dst").toString
    val q = StreamingIngest.maintainRollup(source.toDF(), fact, Seq("dim"), path)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ck").toString)
      .start()
    // batch 1: users 5 and 6 in the 09:00 hour
    source.addData(
      Event("uniq", ts("2014-03-21T09:01"), 5, Map("dim" -> "a")),
      Event("uniq", ts("2014-03-21T09:07"), 6, Map("dim" -> "a")))
    q.processAllAvailable()
    // batch 2: user 5 AGAIN in the same hour (different slice) + user 7
    // — the cross-batch duplicate must count once per hour
    source.addData(
      Event("uniq", ts("2014-03-21T09:31"), 5, Map("dim" -> "a")),
      Event("uniq", ts("2014-03-21T09:40"), 7, Map("dim" -> "a")))
    q.processAllAvailable()
    q.stop()

    val svc = new TimeSeriesService(spark)
    svc.defineFact("uniq", FactType.Distinct, slice = 15)
    svc.defineDimension("dim", facts = Set("uniq"))
    svc.registerRollup("uniq", Seq("dim"), path)
    val got = pivot(svc.getTimeseries("uniq", "dim", Map("dim" -> Some("a")),
      ts("2014-03-21T09:00"), ts("2014-03-21T11:00"), Step.Hour), Seq("dim"))
    assert(got == Map(Map("dim" -> "a") -> Map(
      Option(ts("2014-03-21T09:00")) -> 3L, // users 5,6,7 — 5 once
      Option(ts("2014-03-21T10:00")) -> 0L)))
  }

  test("distinct partials compact across batches without changing results") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Rollups
    val source = MemoryStream[Event]
    val fact = FactDef("uniq", FactType.Distinct, sliceMinutes = 15)
    val path = java.nio.file.Files.createTempDirectory("graft-dstc").toString
    val q = StreamingIngest.maintainRollup(source.toDF(), fact, Seq("dim"), path)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ck").toString)
      .start()
    // the SAME (dim, slice, user) tuple lands in two different batches
    // → two duplicate tall partial rows that compaction must merge
    // (dval is a KEY for compaction, counts sum)
    source.addData(Event("uniq", ts("2014-03-21T09:01"), 5, Map("dim" -> "a")))
    q.processAllAvailable()
    source.addData(Event("uniq", ts("2014-03-21T09:07"), 5, Map("dim" -> "a")),
      Event("uniq", ts("2014-03-21T09:08"), 6, Map("dim" -> "a")))
    q.processAllAvailable()
    q.stop()
    def query(p: String): Map[Option[java.sql.Timestamp], Long] = {
      val svc = new TimeSeriesService(spark)
      svc.defineFact("uniq", FactType.Distinct, slice = 15)
      svc.defineDimension("dim", facts = Set("uniq"))
      svc.registerRollup("uniq", Seq("dim"), p)
      pivot(svc.getTimeseries("uniq", "dim", Map("dim" -> Some("a")),
        ts("2014-03-21T09:00"), ts("2014-03-21T10:00"), Step.Hour),
        Seq("dim"))(Map("dim" -> "a"))
    }
    val before = query(path)
    assert(before == Map(Option(ts("2014-03-21T09:00")) -> 2L))
    val compacted = java.nio.file.Files.createTempDirectory("graft-dstcmp").toString
    Rollups.compact(spark, path, compacted)
    assert(Rollups.read(spark, compacted).count()
      < Rollups.read(spark, path).count())
    assert(query(compacted) == before)
  }

  test("average fact streams as re-aggregable (counter,total) pairs") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val fact = FactDef("resptime", FactType.Average, sliceMinutes = 15)
    val agged = StreamingIngest.sliceAggregation(source.toDF(), fact,
      Seq("host"))
    val q = StreamingIngest.startToMemory(agged, "avg_agg_test")
    source.addData(
      Event("resptime", ts("2014-03-21T09:01"), 100, Map("host" -> "a")),
      Event("resptime", ts("2014-03-21T09:07"), 200, Map("host" -> "a")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT * FROM avg_agg_test")
      .collect()
      .map(r => (r.getAs[String]("host"), r.getAs[Timestamp]("bucket"),
        r.getAs[Long]("counter"), r.getAs[Long]("total"))).toSet
    assert(rows == Set(("a", ts("2014-03-21T09:00"), 2L, 300L)))
  }

  test("streaming exact dedup drops duplicate content within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, String)]
    val deduped = StreamingIngest.dedupStream(
      source.toDF().toDF("doc_id", "ts", "text"), "text", "ts",
      watermarkDelay = "1 hour")
    val q = deduped.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup_stream_test")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ck").toString)
      .start()
    source.addData(
      (1L, ts("2024-01-01T10:00"), "alpha beta"),
      (2L, ts("2024-01-01T10:01"), "alpha beta"), // dup of 1, same batch
      (3L, ts("2024-01-01T10:02"), "gamma delta"))
    q.processAllAvailable()
    // dup of 1 across batches, still inside the 1h watermark horizon
    source.addData((4L, ts("2024-01-01T10:30"), "alpha beta"))
    q.processAllAvailable()
    // fresh content always passes
    source.addData((5L, ts("2024-01-01T10:40"), "epsilon zeta"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("dedup_stream_test").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(1L, 3L, 5L))
    // the surviving set equals batch exact-dedup canonicals over the
    // same rows (streaming twin contract)
    val batchCanon = graft.operators.Dedup.exact(
      Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma delta"),
        (4L, "alpha beta"), (5L, "epsilon zeta")).toDF("doc_id", "text"),
      "text", "doc_id")
      .where(col("doc_id") === col("canonical_id"))
      .collect().map(_.getLong(0)).toSet
    assert(batchCanon == kept)
  }

  test("stream-vs-corpus dedup drops known content, stateless") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((100L, "alpha beta"), (101L, "gamma delta"))
      .toDF("doc_id", "text")
    val source = MemoryStream[(Long, Timestamp, String)]
    val gated = StreamingIngest.dedupStreamAgainst(
      source.toDF().toDF("doc_id", "ts", "text"), "text", corpus, "text")
    val q = gated.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup_against_test")
      .start()
    source.addData(
      (1L, ts("2024-01-01T10:00"), "alpha beta"),   // known → dropped
      (2L, ts("2024-01-01T10:01"), "fresh words"),  // new → kept
      (3L, ts("2024-01-01T10:02"), "gamma delta"))  // known → dropped
    q.processAllAvailable()
    // no watermark needed: later batches see the same static gate
    source.addData((4L, ts("2024-01-02T09:00"), "alpha beta"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("dedup_against_test").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(2L))
  }

  // ---- checkpoint restart recovery --------------------------------------
  // The stateful twins are replay-gated above; these kill the query
  // mid-stream (with data already ADDED but not processed — the
  // crash-with-in-flight-work shape) and restart from the checkpoint:
  // custom state (pending buffers, rings, RLE second counts, open
  // sessions) must round-trip the state store, and the parquet sink's
  // metadata log must keep output exactly-once across the restart.

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("sessionization survives kill+restart from checkpoint (same oracle)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp)]
    val (ck, out) = (tmp("graft-rck"), tmp("graft-rout"))
    def startQ() = StreamingIngest.sessionizeStream(
        source.toDF().toDF("user_id", "ts"), gapMinutes = 30,
        watermarkDelay = "1 hour")
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    val q1 = startQ()
    source.addData((1L, ts("2024-01-01T10:00")), (2L, ts("2024-01-01T10:05")))
    q1.processAllAvailable()
    // in-flight at kill time: added, never processed by q1
    source.addData((1L, ts("2024-01-01T10:10")))
    q1.stop()
    val q2 = startQ()
    // out-of-order merge into user 1's OPEN session recovered from state
    source.addData((1L, ts("2024-01-01T10:05")), (1L, ts("2024-01-01T10:50")))
    q2.processAllAvailable()
    source.addData((99L, ts("2024-01-01T20:00")))
    q2.processAllAvailable()
    source.addData((98L, ts("2024-01-01T20:01")))
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("session_start"),
        r.getAs[Timestamp]("session_end"), r.getAs[Long]("n_events"))).toSet
    assert(got == Set(
      (1L, ts("2024-01-01T10:00"), ts("2024-01-01T10:10"), 3L),
      (1L, ts("2024-01-01T10:50"), ts("2024-01-01T10:50"), 1L),
      (2L, ts("2024-01-01T10:05"), ts("2024-01-01T10:05"), 1L)))
  }

  test("anomaly stream survives kill+restart from checkpoint (same oracle)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, Long, Long)]
    val (ck, out) = (tmp("graft-ack"), tmp("graft-aout"))
    def startQ() = StreamingIngest.anomalyStream(
        source.toDF().toDF("user_id", "ts", "event_id", "value_cents"),
        baseN = 5, minN = 3, k = 3, watermarkDelay = "1 hour")
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    def e(id: Long, sec: Int, x: Long) =
      (1L, ts(f"2024-01-01T10:00:$sec%02d"), id, x)
    val q1 = startQ()
    source.addData(e(1, 1, 100), e(2, 2, 101), e(3, 3, 99))
    q1.processAllAvailable()
    // the spike is in flight (added, unprocessed) when the query dies
    source.addData(e(6, 6, 100), e(7, 7, 10000))
    q1.stop()
    val q2 = startQ()
    // out-of-order pre-spike events arrive only after the restart: the
    // recovered pending buffer must still order them before the spike
    source.addData(e(4, 4, 100), e(5, 5, 102))
    q2.processAllAvailable()
    source.addData((99L, ts("2024-01-01T20:00"), 99L, 0L))
    q2.processAllAvailable()
    source.addData((98L, ts("2024-01-01T20:01"), 98L, 0L))
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("n_base"),
        r.getAs[Long]("base_sum"))).toSet
    // the batch twin over the union: one flag, with the full 5-event
    // baseline — i.e. the restart lost neither the ring nor the gate
    assert(got == Set((7L, 5L, 502L)), s"got $got")
  }

  test("ewma stream survives kill+restart; frame matches the batch fold") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, Long, Long)]
    val (ck, out) = (tmp("graft-eck"), tmp("graft-eout"))
    def startQ() = StreamingIngest.ewmaStream(
        source.toDF().toDF("user_id", "ts", "event_id", "value_cents"),
        w = 3, watermarkDelay = "1 hour")
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    def e(id: Long, sec: Int, x: Long) =
      (1L, ts(f"2024-01-01T10:00:$sec%02d"), id, x)
    val q1 = startQ()
    source.addData(e(1, 1, 100), e(2, 2, 200))
    q1.processAllAvailable()
    // event 3 is in flight when the query dies; event 4 arrives only
    // after restart and must see the recovered ring (200, 400)
    source.addData(e(3, 3, 400))
    q1.stop()
    val q2 = startQ()
    source.addData(e(4, 4, 800))
    q2.processAllAvailable()
    source.addData((99L, ts("2024-01-01T20:00"), 99L, 0L))
    q2.processAllAvailable()
    source.addData((98L, ts("2024-01-01T20:01"), 98L, 0L))
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out)
      .where(col("user_id") === 1L)
      .collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("ewma_e4"))
      .toMap
    // batch-fold expectations over the UNION of pre/post-restart data:
    // t1: 100; t2: (2·100+200)/3; t3: (4·100+2·200+400)/7;
    // t4 frame slides to (200,400,800): (4·200+2·400+800)/7
    assert(got == Map(
      1L -> 1000000L,
      2L -> math.floor(10000.0 * 400 / 3).toLong,
      3L -> math.floor(10000.0 * 1200 / 7).toLong,
      4L -> math.floor(10000.0 * 2400 / 7).toLong), s"got $got")
  }

  test("cusum stream survives kill+restart; recursion matches the batch closed form") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, Long, Long)]
    val (ck, out) = (tmp("graft-cck"), tmp("graft-cout"))
    def startQ() = StreamingIngest.cusumStream(
        source.toDF().toDF("user_id", "ts", "event_id", "value_cents"),
        target = 100L, slack = 20L, threshold = 200L,
        watermarkDelay = "1 hour")
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    def e(id: Long, sec: Int, x: Long) =
      (1L, ts(f"2024-01-01T10:00:$sec%02d"), id, x)
    val q1 = startQ()
    // drift terms (x−120): 80, 80 → S⁺ = 80, 160 (no flag yet)
    source.addData(e(1, 1, 200), e(2, 2, 200))
    q1.processAllAvailable()
    // event 3 is in flight when the query dies: S⁺ must resume at 160
    source.addData(e(3, 3, 200))
    q1.stop()
    val q2 = startQ()
    // post-restart: S⁺ = 240 at event 3 (flag), 320 at event 4 (flag);
    // the negative side: a crash to 0 adds (80−x) = 80 per event → S⁻
    // needs 3 zeros to flag — only the 3rd (event 7) crosses 240≥200
    source.addData(e(4, 4, 200), e(5, 5, 0), e(6, 6, 0), e(7, 7, 0))
    q2.processAllAvailable()
    source.addData((99L, ts("2024-01-01T20:00"), 99L, 100L))
    q2.processAllAvailable()
    source.addData((98L, ts("2024-01-01T20:01"), 98L, 100L))
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out)
      .where(col("user_id") === 1L)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("s_pos"), r.getAs[Long]("s_neg"))).toMap
    // batch recursion over the union: S⁺ 80,160,240*,320*; then zeros
    // decay S⁺ 200*,80,0 while S⁻ climbs 80,160,240* — flags at 3,4,5,7
    assert(got === Map(
      3L -> (240L, 0L), 4L -> (320L, 0L),
      5L -> (200L, 80L), 7L -> (0L, 240L)), s"got $got")
  }

  test("holt stream survives kill+restart; states match the batch fold") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, Long, Long)]
    val (ck, out) = (tmp("graft-hck"), tmp("graft-hout"))
    def startQ() = StreamingIngest.holtStream(
        source.toDF().toDF("user_id", "ts", "event_id", "value_cents"),
        watermarkDelay = "1 hour")
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    def e(id: Long, sec: Int, x: Long) =
      (1L, ts(f"2024-01-01T10:00:$sec%02d"), id, x)
    val q1 = startQ()
    source.addData(e(1, 1, 100), e(2, 2, 200))
    q1.processAllAvailable()
    // event 3 in flight at the kill: the recovered (l, b, n) must
    // carry the recursion forward, not restart it
    source.addData(e(3, 3, 400))
    q1.stop()
    val q2 = startQ()
    source.addData(e(4, 4, 800))
    q2.processAllAvailable()
    source.addData((99L, ts("2024-01-01T20:00"), 99L, 0L))
    q2.processAllAvailable()
    source.addData((98L, ts("2024-01-01T20:01"), 98L, 0L))
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out)
      .where(col("user_id") === 1L)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("level_e4"), r.getAs[Long]("trend_e4"))).toMap
    // the floorDiv recursion over the union of pre/post-restart data
    var (l, b) = (0L, 0L)
    val want = Seq(1L -> 100L, 2L -> 200L, 3L -> 400L, 4L -> 800L)
      .zipWithIndex.map { case ((id, x), i) =>
        if (i == 0) { l = x * 10000L; b = 0L }
        else {
          val ln = Math.floorDiv(x * 10000L + l + b, 2L)
          b = Math.floorDiv(ln - l + 3L * b, 4L)
          l = ln
        }
        id -> (l, b)
      }.toMap
    assert(got === want, s"got $got")
  }

  test("user features survive kill+restart from checkpoint (same oracle)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, Long)]
    val (ck, out) = (tmp("graft-fck"), tmp("graft-fout"))
    def startQ() = StreamingIngest.userFeatureStream(
        source.toDF().toDF("user_id", "ts", "event_id"),
        windowSecs = 3600L, watermarkDelay = "2 hours")
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    val all = Seq(
      (1L, ts("2024-01-01T10:00:05"), 1L),
      (1L, ts("2024-01-01T10:00:05"), 2L),
      (1L, ts("2024-01-01T10:30:00"), 4L),
      (1L, ts("2024-01-01T10:15:00"), 3L),
      (1L, ts("2024-01-01T12:30:00"), 5L))
    val q1 = startQ()
    source.addData(all.take(2): _*)
    q1.processAllAvailable()
    source.addData(all(2)) // in flight at kill time
    q1.stop()
    val q2 = startQ()
    source.addData(all(3)) // out of order, must drain between 2 and 4
    q2.processAllAvailable()
    source.addData(all(4))
    q2.processAllAvailable()
    source.addData((99L, ts("2024-01-02T20:00"), 99L))
    q2.processAllAvailable()
    source.addData((98L, ts("2024-01-02T20:01"), 98L))
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("n_prev_1h"),
        Option(r.getAs[java.lang.Long]("secs_since_prev"))
          .map(_.longValue))).toSet
    import org.apache.spark.sql.expressions.Window
    val secs = col("ts").cast("long")
    val byUser = Window.partitionBy(col("user_id"))
    val rolling = byUser.orderBy(secs).rangeBetween(-3600L, 0L)
    val seq2 = byUser.orderBy(secs, col("event_id"))
    val expect = all.toDF("user_id", "ts", "event_id")
      .select(col("event_id"),
        count(lit(1)).over(rolling).as("n_prev_1h"),
        (secs - lag(secs, 1).over(seq2)).as("secs_since_prev"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getAs[java.lang.Long]("secs_since_prev"))
          .map(_.longValue))).toSet
    assert(got == expect, s"got $got expect $expect")
  }

  test("capped sessions: cap splits, out-of-order joins, kill+restart") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp)]
    val (ck, out) = (tmp("graft-cck"), tmp("graft-cout"))
    def startQ() = StreamingIngest.cappedSessionStream(
        source.toDF().toDF("user_id", "ts"), gapMinutes = 30,
        maxDurationMinutes = 60, watermarkDelay = "1 hour")
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    val q1 = startQ()
    // user 1: 10:00, 10:25 — in gap; 11:20 is 80 min from start → CAP
    // splits even though the 55-min gap... exceeds gap too; use 10:50
    // (25-min gap, 50 min from start, stays) then 11:20 (30-min gap
    // exactly = stays by gap, but 80 min from start → cap split)
    source.addData((1L, ts("2024-01-01T10:00")), (1L, ts("2024-01-01T10:25")))
    q1.processAllAvailable()
    source.addData((1L, ts("2024-01-01T10:50")))
    q1.stop()
    val q2 = startQ() // in-flight row recovered from the source replay
    // out-of-order: 10:10 is older than 10:50 but inside the horizon —
    // it must slot INTO the open session, not start one
    source.addData((1L, ts("2024-01-01T10:10")), (1L, ts("2024-01-01T11:20")))
    q2.processAllAvailable()
    // advance the watermark far enough to drain and close everything
    source.addData((99L, ts("2024-01-02T10:00")))
    q2.processAllAvailable()
    source.addData((98L, ts("2024-01-02T20:00")))
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out).where(col("user_id") === 1L).collect()
      .map(r => (r.getAs[Timestamp]("session_start"),
        r.getAs[Timestamp]("session_end"), r.getAs[Long]("n_events"))).toSet
    // 10:00, 10:10, 10:25, 10:50 one session (all gaps ≤ 30m, span 50m);
    // 11:20 = 30m gap from 10:50 (stays by gap) but 80m from 10:00 →
    // the CAP starts a new session
    assert(got == Set(
      (ts("2024-01-01T10:00"), ts("2024-01-01T10:50"), 4L),
      (ts("2024-01-01T11:20"), ts("2024-01-01T11:20"), 1L)))
  }

  test("capped session stream: random in-order batch splits equal the batch fold") {
    implicit val sqlCtx = spark.sqlContext
    for (seed <- Seq(61, 62)) {
      val rnd = new scala.util.Random(seed)
      val gapMin = 1 + rnd.nextInt(60)
      val capMin = gapMin + rnd.nextInt(120)
      val base = 1700000000000L
      val rows = (0 until 300).map { _ =>
        (rnd.nextInt(6).toLong, new Timestamp(
          base + rnd.nextInt(400000).toLong * 1000L))
      }
      val expect = graft.operators.Sessions.cappedSessions(
          rows.toDF("user_id", "ts"), "user_id", "ts", gapMin, capMin)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          r.getTimestamp(2), r.getLong(3))).toSet
      // deliver in ts order, cut into random chunks (within-chunk
      // order shuffled — one micro-batch absorbs any internal
      // disorder); two far-future sentinels drain the state
      val sorted = rows.sortBy(_._2.getTime)
      val nCuts = 2 + rnd.nextInt(3)
      val cuts = (Seq(0, sorted.length) ++
        Seq.fill(nCuts)(rnd.nextInt(sorted.length))).distinct.sorted
      val source = MemoryStream[(Long, Timestamp)]
      val (ck, out) = (tmp(s"graft-fck$seed"), tmp(s"graft-fout$seed"))
      val q = StreamingIngest.cappedSessionStream(
          source.toDF().toDF("user_id", "ts"), gapMin, capMin,
          watermarkDelay = "0 seconds")
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ck).start()
      cuts.sliding(2).foreach { case Seq(a, b) =>
        if (b > a) {
          source.addData(rnd.shuffle(sorted.slice(a, b)): _*)
          q.processAllAvailable()
        }
      }
      source.addData((-1L, ts("2100-01-01T00:00"))); q.processAllAvailable()
      source.addData((-2L, ts("2100-06-01T00:00"))); q.processAllAvailable()
      q.stop()
      val got = spark.read.parquet(out).where(col("user_id") >= 0L)
        .collect().map(r => (r.getAs[Long]("user_id"),
          r.getAs[Timestamp]("session_start"),
          r.getAs[Timestamp]("session_end"),
          r.getAs[Long]("n_events"))).toSet
      assert(got == expect, s"seed $seed gap=$gapMin cap=$capMin")
    }
  }

  test("next-example stream: random in-order batch splits equal the batch window") {
    implicit val sqlCtx = spark.sqlContext
    for (seed <- Seq(71, 72)) {
      val rnd = new scala.util.Random(seed)
      val types = Array("a", "b", "c")
      val base = 1700000000000L
      val rows = (0 until 250).map { i =>
        (i.toLong, rnd.nextInt(5).toLong,
          new Timestamp(base + rnd.nextInt(300000).toLong * 1000L),
          types(rnd.nextInt(3)))
      }
      val k = 1 + rnd.nextInt(4)
      val expect = graft.operators.Sessions.nextEventExamples(
          rows.toDF("event_id", "user_id", "ts", "event_type"),
          "user_id", "ts", "event_type", "event_id", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getString(4))).toSet
      val sorted = rows.sortBy(r => (r._3.getTime, r._1))
      val nCuts = 2 + rnd.nextInt(3)
      val cuts = (Seq(0, sorted.length) ++
        Seq.fill(nCuts)(rnd.nextInt(sorted.length))).distinct.sorted
      val source = MemoryStream[(Long, Long, Timestamp, String)]
      val (ck, out) = (tmp(s"graft-neck$seed"), tmp(s"graft-neout$seed"))
      val q = StreamingIngest.nextExampleStream(
          source.toDF().toDF("event_id", "user_id", "ts", "event_type"),
          k, watermarkDelay = "0 seconds")
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ck).start()
      cuts.sliding(2).foreach { case Seq(a, b) =>
        if (b > a) {
          source.addData(rnd.shuffle(sorted.slice(a, b)): _*)
          q.processAllAvailable()
        }
      }
      source.addData((-1L, -1L, ts("2100-01-01T00:00"), "x"))
      q.processAllAvailable()
      source.addData((-2L, -2L, ts("2100-06-01T00:00"), "x"))
      q.processAllAvailable()
      q.stop()
      val got = spark.read.parquet(out).where(col("user_id") >= 0L)
        .collect().map(r => (r.getAs[Long]("event_id"),
          r.getAs[Long]("user_id"), r.getAs[String]("prefix"),
          r.getAs[Long]("gap_us"), r.getAs[String]("label"))).toSet
      assert(got == expect, s"seed $seed k=$k")
    }
  }

  test("funnel stream survives kill+restart; late click still slots in order") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, Long, String)]
    val (ck, out) = (tmp("graft-fck"), tmp("graft-fout"))
    def startQ() = StreamingIngest.funnelStream(
        source.toDF().toDF("user_id", "ts", "event_id", "event_type"),
        stages = Seq("signup", "click", "purchase"),
        watermarkDelay = "1 hour")
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    val q1 = startQ()
    // signup and purchase land; the qualifying click is still missing
    source.addData(
      (7L, ts("2024-01-01T10:00"), 1L, "signup"),
      (7L, ts("2024-01-01T10:30"), 3L, "purchase"))
    q1.processAllAvailable()
    // the late click is IN FLIGHT (added, never processed) at kill time
    source.addData((7L, ts("2024-01-01T10:10"), 2L, "click"))
    q1.stop()
    val q2 = startQ()
    // the recovered pending buffer + stage gate must still order the
    // click BEFORE the purchase; a second user's funnel spans the
    // restart to pin that fresh state coexists with recovered state
    source.addData(
      (8L, ts("2024-01-01T10:20"), 4L, "signup"),
      (8L, ts("2024-01-01T10:25"), 5L, "click"))
    q2.processAllAvailable()
    source.addData((99L, ts("2024-01-01T20:00"), 90L, "signup"))
    q2.processAllAvailable()
    source.addData((98L, ts("2024-01-01T20:01"), 91L, "signup"))
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out)
      .where(col("user_id").isin(7L, 8L))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("stage_idx"),
        r.getAs[Timestamp]("ts"))).toSet
    assert(got == Set(
      (7L, 0L, ts("2024-01-01T10:00")),
      (7L, 1L, ts("2024-01-01T10:10")),
      (7L, 2L, ts("2024-01-01T10:30")),
      (8L, 0L, ts("2024-01-01T10:20")),
      (8L, 1L, ts("2024-01-01T10:25"))), s"got $got")
  }

  test("next-example stream survives kill+restart (same batch-window oracle)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Long, Timestamp, String)]
    val (ck, out) = (tmp("graft-nrck"), tmp("graft-nrout"))
    def startQ() = StreamingIngest.nextExampleStream(
        source.toDF().toDF("event_id", "user_id", "ts", "event_type"),
        k = 2, watermarkDelay = "1 hour")
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    def e(id: Long, min: Int, t: String) =
      (id, 1L, ts(f"2024-01-01T10:$min%02d"), t)
    val rows = Seq(e(1, 0, "a"), e(2, 5, "b"), e(3, 10, "c"),
      e(4, 15, "a"), e(5, 20, "b"))
    val q1 = startQ()
    source.addData(rows(0), rows(1))
    q1.processAllAvailable()
    // events 3 and 4 are in flight at kill time
    source.addData(rows(2), rows(3))
    q1.stop()
    val q2 = startQ()
    // event 5 arrives only after restart and must extend the recovered
    // per-user ordered history, not restart it
    source.addData(rows(4))
    q2.processAllAvailable()
    source.addData((-1L, -1L, ts("2024-06-01T00:00"), "x"))
    q2.processAllAvailable()
    source.addData((-2L, -2L, ts("2024-12-01T00:00"), "x"))
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out).where(col("user_id") >= 0L)
      .collect().map(r => (r.getAs[Long]("event_id"),
        r.getAs[Long]("user_id"), r.getAs[String]("prefix"),
        r.getAs[Long]("gap_us"), r.getAs[String]("label"))).toSet
    val expect = graft.operators.Sessions.nextEventExamples(
        rows.toDF("event_id", "user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", "event_id", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getString(4))).toSet
    assert(got == expect, s"got $got")
  }

  test("maintained manifest across micro-batches == batch manifest") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (0 until 60).map(i => (i.toLong, s"doc text $i word${i % 7}",
      s"s${i % 4}"))
    val source = MemoryStream[(Long, String, String)]
    val base = tmp("graft-man")
    val q = graft.streaming.StreamingIngest.maintainManifest(
        source.toDF().toDF("doc_id", "text", "source"), "text", "source",
        s"$base/store")
      .option("checkpointLocation", s"$base/ck")
      .start()
    rows.grouped(25).foreach { g =>
      source.addData(g: _*); q.processAllAvailable()
    }
    q.stop()
    val got = graft.streaming.StreamingIngest
      .readManifest(spark, s"$base/store", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val expect = graft.operators.Dedup.contentManifest(
        rows.toDF("doc_id", "text", "source"), "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect, "re-aggregated digests bit-identical to batch")
  }

  test("lateness monitor: hwm rule per batch; restart re-arms from reports") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp)]
    val (ck, rep) = (tmp("graft-lck"), tmp("graft-lrep"))
    def startQ() = StreamingIngest.monitorLateness(
        source.toDF().toDF("id", "ts"), "ts", horizonSec = 3600L, rep)
      .option("checkpointLocation", ck).start()
    val q1 = startQ()
    // batch 0: no mark yet -> nothing late even for ancient rows
    source.addData((1L, ts("2024-01-01T10:00")), (2L, ts("2024-01-01T12:00")))
    q1.processAllAvailable()
    // batch 1: mark = 12:00, late bound 11:00 — 10:30 and 09:00 are
    // late, 13:00 advances the mark
    source.addData((3L, ts("2024-01-01T10:30")), (4L, ts("2024-01-01T09:00")),
      (5L, ts("2024-01-01T13:00")))
    q1.processAllAvailable()
    q1.stop()
    // RESTART: a fresh monitor instance must re-arm its mark (13:00)
    // from the committed reports, not start blind
    val q2 = startQ()
    source.addData((6L, ts("2024-01-01T11:30")), (7L, ts("2024-01-01T12:30")))
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(rep).collect()
      .map(r => r.getAs[Long]("__batch_id") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_late"))).toMap
    assert(got == Map(0L -> ((2L, 0L)), 1L -> ((3L, 2L)), 2L -> ((2L, 1L))))
  }

  test("streaming anomaly flags == batch trailingZFlags, out-of-order safe") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, Long, Long)]
    val flags = StreamingIngest.anomalyStream(
      source.toDF().toDF("user_id", "ts", "event_id", "value_cents"),
      baseN = 5, minN = 3, k = 3, watermarkDelay = "1 hour")
    val q = flags.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("anom_test")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ck").toString)
      .start()
    // user 1: flat baseline at 100 cents, then a 10000-cent spike at
    // event 7. Events 4 and 5 arrive OUT OF ORDER in a later
    // micro-batch (inside the 1h watermark) — the gated buffer must
    // still process them before the spike, so the spike's baseline is
    // the batch one.
    def e(id: Long, sec: Int, x: Long) =
      (1L, ts(f"2024-01-01T10:00:$sec%02d"), id, x)
    source.addData(e(1, 1, 100), e(2, 2, 101), e(3, 3, 99), e(6, 6, 100),
      e(7, 7, 10000))
    q.processAllAvailable()
    source.addData(e(4, 4, 100), e(5, 5, 102)) // out of order, buffered
    q.processAllAvailable()
    // advance the watermark past every observation, then fire timeouts
    source.addData((99L, ts("2024-01-01T20:00"), 99L, 0L))
    q.processAllAvailable()
    source.addData((98L, ts("2024-01-01T20:01"), 98L, 0L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("anom_test").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Long]("value_cents"), r.getAs[Long]("n_base"),
        r.getAs[Long]("base_sum"))).toSet

    // batch twin over the union, regardless of arrival order
    import graft.operators.Anomaly
    val static = Seq(e(1, 1, 100), e(2, 2, 101), e(3, 3, 99), e(6, 6, 100),
      e(7, 7, 10000), e(4, 4, 100), e(5, 5, 102))
      .toDF("user_id", "ts", "event_id", "value_cents")
      .select(col("user_id"), col("ts").cast("long").as("sec"),
        col("event_id"), col("value_cents"))
    val expect = Anomaly.trailingZFlags(static, col("user_id"),
        Seq(col("sec"), col("event_id")), col("value_cents"),
        baseN = 5, minN = 3, k = 3)
      .where(col("is_anomaly"))
      .select(col("event_id"), col("user_id"), col("value_cents"),
        col("n_base"), col("base_sum"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(expect.nonEmpty, "fixture must flag the spike")
    assert(got == expect)
    // the spike's baseline must include the late-arriving events 4, 5
    assert(got.exists { case (id, _, _, n, _) => id == 7L && n == 5L })
  }

  test("streaming rolling features == batch windows, ties + disorder safe") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, Long)]
    val feats = StreamingIngest.userFeatureStream(
      source.toDF().toDF("user_id", "ts", "event_id"),
      windowSecs = 3600L, watermarkDelay = "2 hours")
    val q = feats.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("feat_test")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ck").toString)
      .start()
    // user 1: two events in the SAME second (tie-complete RANGE count
    // must see both), an event 30 min later, one 2h later (outside the
    // window of the first pair); event 3 arrives OUT OF ORDER after
    // event 4 and must still order between 2 and 5 on drain
    val all = Seq(
      (1L, ts("2024-01-01T10:00:05"), 1L),
      (1L, ts("2024-01-01T10:00:05"), 2L),
      (1L, ts("2024-01-01T10:30:00"), 4L),
      (1L, ts("2024-01-01T10:15:00"), 3L),
      (1L, ts("2024-01-01T12:30:00"), 5L))
    source.addData(all.take(3): _*)
    q.processAllAvailable()
    source.addData(all(3)) // out of order, inside the 2h watermark
    q.processAllAvailable()
    source.addData(all(4))
    q.processAllAvailable()
    // drain: watermark past every second, then fire the timeout
    source.addData((99L, ts("2024-01-02T20:00"), 99L))
    q.processAllAvailable()
    source.addData((98L, ts("2024-01-02T20:01"), 98L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("feat_test").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("n_prev_1h"),
        Option(r.getAs[java.lang.Long]("secs_since_prev"))
          .map(_.longValue))).toSet

    // batch twin over the union
    import org.apache.spark.sql.expressions.Window
    val secs = col("ts").cast("long")
    val byUser = Window.partitionBy(col("user_id"))
    val rolling = byUser.orderBy(secs).rangeBetween(-3600L, 0L)
    val seq2 = byUser.orderBy(secs, col("event_id"))
    val expect = all.toDF("user_id", "ts", "event_id")
      .select(col("event_id"),
        count(lit(1)).over(rolling).as("n_prev_1h"),
        (secs - lag(secs, 1).over(seq2)).as("secs_since_prev"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getAs[java.lang.Long]("secs_since_prev"))
          .map(_.longValue))).toSet
    assert(got == expect)
    // spot-check the tie group: both 10:00:05 events count each other
    assert(got.contains((1L, 2L, None)) && got.contains((2L, 2L, Some(0L))))
    // and the 12:30 event's window excludes everything
    assert(got.contains((5L, 1L, Some(7200L))))
  }

  test("maintained-store lease: a second maintaining stream claims the " +
      "store; the first fails loudly on its next batch") {
    implicit val sqlCtx = spark.sqlContext
    val fact = FactDef("signups", FactType.Counter, sliceMinutes = 10)
    val path = java.nio.file.Files
      .createTempDirectory("graft-mlease").toString + "/roll"
    def ck() = java.nio.file.Files
      .createTempDirectory("graft-mlease-ck").toString
    def ev(min: Int) = Event("signups", ts(f"2014-03-21T10:$min%02d"), 1,
      Map("dependency" -> "31"))
    val a = MemoryStream[Event]
    val qa = StreamingIngest.maintainRollup(a.toDF(), fact,
      Seq("dependency"), path).option("checkpointLocation", ck()).start()
    a.addData(ev(1))
    qa.processAllAvailable() // A claims the store on its first batch
    // a SECOND stream pointed at the same store: its first batch
    // re-claims (the restart-safe takeover — a crash restart must be
    // able to resume unconditionally) ...
    val b = MemoryStream[Event]
    val qb = StreamingIngest.maintainRollup(b.toDF(), fact,
      Seq("dependency"), path).option("checkpointLocation", ck()).start()
    b.addData(ev(2))
    qb.processAllAvailable()
    // ... and the EARLIER stream now fails LOUDLY on its next batch
    // instead of silently interleaving __batch_id= dirs with B
    a.addData(ev(3))
    val e = intercept[Exception] { qa.processAllAvailable() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("ONE maintaining stream")),
      msgs(e).mkString(" | "))
    try qa.stop() catch { case _: Exception => () }
    // the surviving maintainer keeps going and the store stays readable
    b.addData(ev(4))
    qb.processAllAvailable()
    qb.stop()
    val svc = freshService()
    svc.registerRollup("signups", Seq("dependency"), path)
    val total = svc.getTimeseries("signups", "dependency",
        Map("dependency" -> Some("31")),
        ts("2014-03-21T00:00"), ts("2014-03-22T00:00"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("value"))).head.getLong(0)
    // B's two batches landed (batch ids 0,1 under B's checkpoint — id 0
    // overwrote A's; exactly the corruption class the lease now stops)
    assert(total == 2L, s"served total: $total")
  }
}
