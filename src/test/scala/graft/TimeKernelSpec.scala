package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.TimeKernel
import graft.functions.TimeKernel.ts
import graft.model.Step

/** Unit tests for the time kernel, golden values from the reference:
  * `get-slice` (postgres/common.clj:7-23), `time-dimension`
  * (query.clj:6-37), `time-range` (query.clj:84-97). */
class TimeKernelSpec extends SparkTestBase {
  import spark.implicits._

  private def sliceOf(t: Timestamp, slice: Int): Timestamp =
    Seq(t).toDF("ts").select(TimeKernel.sliceFloor(col("ts"), slice).as("b"))
      .head().getTimestamp(0)

  private def dimOf(t: Timestamp, step: Step, off: Int = 0): Option[Timestamp] =
    Option(Seq(t).toDF("ts")
      .select(TimeKernel.timeDimension(col("ts"), step, off).as("b"))
      .head().getTimestamp(0))

  test("slice floor: 16:46 @15m -> 16:45 (get-slice docstring)") {
    assert(sliceOf(ts("2014-03-21T16:46:30"), 15) === ts("2014-03-21T16:45"))
  }

  test("slice floor zeroes seconds and is within-hour") {
    assert(sliceOf(ts("2014-03-21T09:09:59"), 10) === ts("2014-03-21T09:00"))
    assert(sliceOf(ts("2014-03-21T10:23:01"), 10) === ts("2014-03-21T10:20"))
    // non-divisor-of-60 slice still floors within the hour
    assert(sliceOf(ts("2014-03-21T10:55"), 25) === ts("2014-03-21T10:50"))
    assert(sliceOf(ts("2014-03-21T11:10"), 25) === ts("2014-03-21T11:00"))
  }

  test("driver-side slice floor matches the column expr") {
    val cases = Seq(("2014-03-21T16:46:30", 15), ("2014-03-21T09:09:59", 10),
      ("2014-12-31T23:59:59", 60), ("2014-03-21T10:55", 25))
    cases.foreach { case (s, sl) =>
      assert(TimeKernel.sliceFloorLocal(ts(s), sl) === sliceOf(ts(s), sl), s"$s @$sl")
    }
  }

  test("week floor: every day maps to the PREVIOUS Sunday (non-ISO)") {
    // 2014-03-21 is a Friday (isodow 5) -> 2014-03-16 (Sunday)
    assert(dimOf(ts("2014-03-21T09:09"), Step.Week) === Some(ts("2014-03-16T00:00")))
    // Monday -> yesterday's Sunday
    assert(dimOf(ts("2014-03-17T13:00"), Step.Week) === Some(ts("2014-03-16T00:00")))
    // Sunday maps to the Sunday a FULL WEEK before (reference quirk)
    assert(dimOf(ts("2014-03-16T13:00"), Step.Week) === Some(ts("2014-03-09T00:00")))
  }

  test("calendar collapse: hour/day/month/year + offset") {
    val t = ts("2014-03-21T09:40:30")
    assert(dimOf(t, Step.Hour) === Some(ts("2014-03-21T09:00")))
    assert(dimOf(t, Step.Day) === Some(ts("2014-03-21T00:00")))
    assert(dimOf(t, Step.Month) === Some(ts("2014-03-01T00:00")))
    assert(dimOf(t, Step.Year) === Some(ts("2014-01-01T00:00")))
    assert(dimOf(t, Step.NoStep) === None)
    // offset shifts before truncation (query.clj:8-9)
    assert(dimOf(ts("2014-03-21T01:30"), Step.Day, -3) === Some(ts("2014-03-20T00:00")))
    assert(dimOf(ts("2014-03-21T22:30"), Step.Day, +3) === Some(ts("2014-03-22T00:00")))
  }

  test("time range: start inclusive, finish exclusive (09:00-13:00 hourly -> 4 points)") {
    val grid = TimeKernel.timeRange(ts("2014-03-21T09:00"), ts("2014-03-21T13:00"), Step.Hour)
    assert(grid === Seq(ts("2014-03-21T09:00"), ts("2014-03-21T10:00"),
      ts("2014-03-21T11:00"), ts("2014-03-21T12:00")))
  }

  test("time range: month step crosses year boundary; empty when start >= finish") {
    val grid = TimeKernel.timeRange(ts("2014-11-15T00:00"), ts("2015-02-15T00:00"), Step.Month)
    assert(grid === Seq(ts("2014-11-15T00:00"), ts("2014-12-15T00:00"), ts("2015-01-15T00:00")))
    assert(TimeKernel.timeRange(ts("2014-03-21T09:00"), ts("2014-03-21T09:00"), Step.Hour).isEmpty)
  }

  test("basic date time presentation format matches the reference string") {
    val s = Seq(ts("2014-03-21T09:00")).toDF("ts")
      .select(TimeKernel.basicDateTime(col("ts"))).head().getString(0)
    assert(s === "20140321T090000.000Z")
  }

  test("SQL-surface mirrors equal the Column kernels over a sweep") {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    // a timestamp sweep crossing hours, days, a week boundary (incl. a
    // Sunday — the non-ISO week's trickiest day), odd minutes/seconds
    val sweep = (0 until 400).map(i =>
      Timestamp.from(ts("2023-12-30T21:17:11").toInstant
        .plusSeconds(i * 3937L)))
    val df = sweep.toDF("ts")
    df.createOrReplaceTempView("sql_surface_sweep")
    for (slice <- Seq(1, 7, 15, 25, 60)) {
      val viaSql = spark.sql(
        s"SELECT graft_slice(ts, $slice) FROM sql_surface_sweep")
        .collect().map(_.getTimestamp(0)).toSeq
      val viaKernel = df.select(TimeKernel.sliceFloor(col("ts"), slice))
        .collect().map(_.getTimestamp(0)).toSeq
      assert(viaSql == viaKernel, s"slice $slice")
      // and against the driver-side twin
      assert(viaKernel == sweep.map(TimeKernel.sliceFloorLocal(_, slice)))
    }
    val weekSql = spark.sql("SELECT graft_week(ts) FROM sql_surface_sweep")
      .collect().map(_.getTimestamp(0)).toSeq
    val weekKernel = df.select(TimeKernel.weekFloor(col("ts")))
      .collect().map(_.getTimestamp(0)).toSeq
    assert(weekSql == weekKernel)
    // golden: Sunday 2023-12-31 maps to the PREVIOUS Sunday
    val sunday = spark.sql(
      "SELECT graft_week(TIMESTAMP '2023-12-31 10:00:00')")
      .head().getTimestamp(0)
    assert(sunday == ts("2023-12-24T00:00"))
    // non-literal minutes is a loud error, not a silent misparse
    val err = intercept[Exception] {
      spark.sql("SELECT graft_slice(ts, minute(ts) % 60 + 1) " +
        "FROM sql_surface_sweep").collect()
    }
    assert(err.getMessage.contains("integer literal"), err.getMessage)
  }
}
