package graft

import org.apache.spark.sql.functions._

import graft.functions.TimeKernel.ts
import graft.model.{Event, FactType, Step}
import graft.sources.EventSource

/** Canonical-event sources: every format round-trips byte-identically,
  * streams share the batch schema, and the wide-table adapter feeds the
  * service the same events the reference's `new-fact!` calls would. */
class EventSourceSpec extends SparkTestBase {
  import spark.implicits._

  private val events = Seq(
    Event("signups", ts("2014-03-21T09:09"), 1,
      Map("dependency" -> "32", "dependency_user" -> "pepe")),
    Event("signups", ts("2014-03-21T10:23"), 2,
      Map("dependency" -> "31", "dependency_user" -> "juanele")))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
      r.getMap[String, String](3).toString)).toSet

  test("parquet / json / csv round-trip the canonical schema") {
    val src = spark.createDataset(events).toDF()
    val base = java.nio.file.Files.createTempDirectory("graft-src").toString
    src.write.mode("overwrite").parquet(s"$base/p")
    src.toJSON.rdd.coalesce(1)
      .saveAsTextFile(s"$base/j")
    EventSource.writeCsv(src, s"$base/c")
    val expect = canon(EventSource.validated(src))
    assert(canon(EventSource.parquet(spark, s"$base/p")) == expect)
    assert(canon(EventSource.json(spark, s"$base/j")) == expect)
    assert(canon(EventSource.csv(spark, s"$base/c")) == expect)
  }

  test("writeJson round-trips microsecond timestamps losslessly") {
    val micro = Seq(Event("signups",
      java.sql.Timestamp.from(java.time.Instant.parse("2014-03-21T09:09:00.123456Z")),
      7, Map("k" -> "v")))
    val src = spark.createDataset(micro).toDF()
    val base = java.nio.file.Files.createTempDirectory("graft-srcj").toString
    EventSource.writeJson(src, s"$base/jm")
    assert(canon(EventSource.json(spark, s"$base/jm")) ==
      canon(EventSource.validated(src)))
  }

  test("file stream shares the batch schema and feeds the service") {
    val base = java.nio.file.Files.createTempDirectory("graft-srcs").toString
    spark.createDataset(events).toDF()
      .write.mode("overwrite").parquet(s"$base/in")
    val stream = EventSource.stream(spark, s"$base/in")
    assert(stream.isStreaming)
    assert(stream.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      EventSource.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val svc = new TimeSeriesService(spark)
    svc.defineFact("signups", FactType.Counter, slice = 10)
    svc.defineDimension("dependency", facts = Set("signups"))
    val q = graft.streaming.StreamingIngest.foreachBatchInto(stream, svc)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ck").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    val got = pivot(svc.getTimeseries("signups", "dependency", Map.empty,
      ts("2014-03-21T09:00"), ts("2014-03-21T11:00"), Step.NoStep),
      Seq("dependency"))
    assert(got == Map(
      Map("dependency" -> "32") -> Map(None -> 1L),
      Map("dependency" -> "31") -> Map(None -> 2L)))
  }

  test("fromWide adapts a per-dimension-column table to canonical events") {
    val wide = Seq((ts("2024-01-01T10:00"), "click", 7L, 3))
      .toDF("ts", "event_type", "user_id", "v")
    val got = EventSource.fromWide(wide, "events_count", col("ts"), col("v"),
      Map("event_type" -> col("event_type"),
        "user_bucket" -> (col("user_id") % 10)))
    val r = got.head()
    assert(got.schema == EventSource.schema ||
      got.schema.fieldNames.toSeq == EventSource.schema.fieldNames.toSeq)
    assert(r.getString(0) == "events_count" && r.getLong(2) == 3L)
    assert(r.getMap[String, String](3).toMap ==
      Map("event_type" -> "click", "user_bucket" -> "7"))
  }
}
