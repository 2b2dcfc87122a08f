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
}
