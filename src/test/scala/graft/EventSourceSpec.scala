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

  // ---- wideEvents schema adaptivity ------------------------------------
  // The driver has regenerated events.parquet with ts as nanos-int64
  // (round ≤4) and as timestamp[us]/TIMESTAMP_NTZ (round 5) — pin all
  // three encodings so the next regeneration can't break the read path.

  /** Three physically different events.parquet dirs encoding the SAME
    * two instants; expected values under the UTC session. */
  private def wideFixtures(): Seq[(String, String)] = {
    val t1 = ts("2024-01-05T10:07:30")
    val t2 = ts("2024-03-02T23:59:59")
    val base = java.nio.file.Files.createTempDirectory("graft-wide").toString
    // (a) nanos int64 — read back as LongType under nanosAsLong
    Seq((t1, 1L), (t2, 2L))
      .map { case (t, id) => (id, t.getTime * 1000000L, id, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$base/nanos/events.parquet")
    // (b) TIMESTAMP_NTZ micros — the round-5 fixture shape
    Seq((t1, 1L), (t2, 2L))
      .map { case (t, id) => (id, t.toLocalDateTime, id, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$base/ntz/events.parquet")
    // (c) TIMESTAMP (LTZ) — what a Spark producer writes
    Seq((t1, 1L), (t2, 2L))
      .map { case (t, id) => (id, t, id, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$base/ltz/events.parquet")
    // (d) TRUE INT64(TIMESTAMP(NANOS,true)) annotation via parquet-mr —
    // what the round-≤4 driver fixtures actually stored; Spark's
    // automatic schema conversion rejects this annotation outright, so
    // it exercises adaptiveSchema's clone fallback + explicit-schema
    // read (fixture (a) is a plain un-annotated int64)
    writeNanosAnnotated(s"$base/nanos_ann/events.parquet",
      Seq((1L, t1.getTime * 1000000L), (2L, t2.getTime * 1000000L)))
    Seq("nanos" -> s"$base/nanos", "ntz" -> s"$base/ntz",
      "ltz" -> s"$base/ltz", "nanos_ann" -> s"$base/nanos_ann")
  }

  /** Write a wide events file whose ts column carries the real
    * TIMESTAMP(NANOS) logical-type annotation (Spark cannot write one;
    * parquet-mr, already on the classpath, can). */
  private def writeNanosAnnotated(path: String,
      rows: Seq[(Long, Long)]): Unit = {
    import org.apache.parquet.schema.MessageTypeParser
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    val msg = MessageTypeParser.parseMessageType(
      """message events {
        |  required int64 event_id;
        |  required int64 ts (TIMESTAMP(NANOS,true));
        |  required int64 user_id;
        |  required binary event_type (STRING);
        |  required double value;
        |  required binary props (STRING);
        |}""".stripMargin)
    new java.io.File(path).mkdirs()
    val w = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$path/part-00000.parquet"))
      .withType(msg).build()
    val gf = new SimpleGroupFactory(msg)
    rows.foreach { case (id, tsNanos) =>
      val g = gf.newGroup()
      g.add("event_id", id); g.add("ts", tsNanos); g.add("user_id", id)
      g.add("event_type", "click"); g.add("value", 1.0); g.add("props", "{}")
      w.write(g)
    }
    w.close()
  }

  test("wideEvents normalizes nanos-long, NTZ, and LTZ ts to TIMESTAMP") {
    val expect = Set(ts("2024-01-05T10:07:30"), ts("2024-03-02T23:59:59"))
    wideFixtures().foreach { case (enc, dir) =>
      val got = EventSource.wideEvents(spark, dir)
      assert(got.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType, s"encoding $enc")
      assert(got.select("ts").collect().map(_.getTimestamp(0)).toSet ==
        expect, s"encoding $enc")
    }
  }

  test("wideEvents range bounds filter [lo, hi) and reach the scan") {
    // [2024-01-05 10:00, 2024-01-05 10:15) keeps t1, drops t2
    val lo = ts("2024-01-05T10:00").toInstant.getEpochSecond
    val hi = ts("2024-01-05T10:15").toInstant.getEpochSecond
    wideFixtures().foreach { case (enc, dir) =>
      val got = EventSource.wideEvents(spark, dir, Some((lo, hi)))
      assert(got.select("ts").collect().map(_.getTimestamp(0)).toSeq ==
        Seq(ts("2024-01-05T10:07:30")), s"encoding $enc")
      // the bound must reach the parquet reader on the RAW column —
      // unpruned time scans are the dominant cost at scale
      got.collect()
      val physical = got.queryExecution.executedPlan.toString
      assert(physical.contains("PushedFilters: [") &&
        physical.contains("GreaterThanOrEqual(ts"), s"encoding $enc: $physical")
    }
  }
}
