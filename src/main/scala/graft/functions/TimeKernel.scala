package graft.functions

import java.sql.Timestamp
import java.time.{Instant, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampType}

import graft.model.Step

/** Time bucketing kernel — pure `Column` combinators over Spark built-ins
  * (codegen'd, whole-stage-compatible; no UDFs, no custom Expressions —
  * SURVEY §7.4).
  *
  * Semantics reproduced from the reference:
  *  - slice flooring within the hour: `get-slice`,
  *    `postgres/common.clj:7-23` (minutes = ⌊minute/slice⌋·slice,
  *    seconds/millis zeroed)
  *  - calendar collapse incl. offset hours and the NON-ISO week:
  *    `time-dimension`, `query.clj:6-37` (week = day-truncated date minus
  *    `day-of-week` days, Joda dow Mon=1..Sun=7 — every day, including
  *    Sunday itself, maps to the PREVIOUS Sunday)
  *  - calendar grid: `time-range`, `query.clj:84-97` (start inclusive,
  *    finish exclusive, steps hour/day/week/month/year)
  *
  * All functions assume a UTC session timezone (build.sbt pins
  * `spark.sql.session.timeZone=UTC`), matching the reference's UTC
  * DateTimes.
  */
object TimeKernel {

  /** Floor `ts` to the enclosing `slice`-minute boundary within its hour.
    * Keeps TimestampType end to end; formatting to the reference's
    * sortable ISO-basic string happens only at the presentation edge.
    */
  def sliceFloor(ts: Column, sliceMinutes: Int): Column = {
    require(sliceMinutes > 0 && sliceMinutes <= 60)
    timestamp_seconds(
      unix_timestamp(date_trunc("hour", ts)) +
        floor(minute(ts) / sliceMinutes).cast("long") * (sliceMinutes * 60L))
  }

  /** Driver-side twin of [[sliceFloor]] for bucketing query endpoints
    * (`range-where`, postgres/query.clj:10-17 buckets both bounds). */
  def sliceFloorLocal(t: Timestamp, sliceMinutes: Int): Timestamp = {
    val ldt = LocalDateTime.ofInstant(t.toInstant, ZoneOffset.UTC)
    val m = ldt.getMinute / sliceMinutes * sliceMinutes
    Timestamp.from(
      ldt.withMinute(0).withSecond(0).withNano(0).plusMinutes(m.toLong)
        .toInstant(ZoneOffset.UTC))
  }

  /** ISO day-of-week (Mon=1..Sun=7) from Spark's Sunday-based
    * `dayofweek` (Sun=1..Sat=7). Matches Joda `day-of-week`. */
  def isoDayOfWeek(ts: Column): Column =
    ((dayofweek(ts) + lit(5)) % lit(7)) + lit(1)

  /** The reference's non-ISO week truncation (`query.clj:24-30`):
    * midnight of (date − isoDayOfWeek days). Monday → previous Sunday,
    * and Sunday → the Sunday a full week before. Deliberately NOT
    * `date_trunc("week", …)`. */
  def weekFloor(ts: Column): Column =
    date_sub(ts.cast(DateType), isoDayOfWeek(ts)).cast(TimestampType)

  /** Calendar collapse of a (slice-bucketed) timestamp: `time-dimension`,
    * query.clj:6-37. `offsetHours` shifts the timestamp before truncation
    * (timezone adjustment, query.clj:8-9). `NoStep` → NULL bucket (the
    * reference's `:all` sentinel). */
  def timeDimension(bucket: Column, step: Step, offsetHours: Int = 0): Column = {
    val shifted =
      if (offsetHours == 0) bucket
      else timestamp_seconds(unix_timestamp(bucket) + offsetHours * 3600L)
    step match {
      case Step.Hour => date_trunc("hour", shifted)
      case Step.Day => date_trunc("day", shifted)
      case Step.Week => weekFloor(shifted)
      case Step.Month => date_trunc("month", shifted)
      case Step.Year => date_trunc("year", shifted)
      case Step.NoStep => lit(null).cast(TimestampType)
    }
  }

  /** Calendar grid: `time-range`, query.clj:84-97 — timestamps from
    * `start` (inclusive, NOT truncated) to `finish` (exclusive), stepping
    * one calendar unit. Driver-side by design: the grid size is bounded
    * by the query range (buckets), independent of data volume, and it is
    * broadcast as the tiny side of the fill join. */
  def timeRange(start: Timestamp, finish: Timestamp, step: Step): Seq[Timestamp] = {
    require(step != Step.NoStep, "no grid for step none")
    val s = LocalDateTime.ofInstant(start.toInstant, ZoneOffset.UTC)
    val f = LocalDateTime.ofInstant(finish.toInstant, ZoneOffset.UTC)
    val out = Seq.newBuilder[Timestamp]
    var cur = s
    while (cur.isBefore(f)) {
      out += Timestamp.from(cur.toInstant(ZoneOffset.UTC))
      cur = step match {
        case Step.Hour => cur.plusHours(1)
        case Step.Day => cur.plusDays(1)
        case Step.Week => cur.plusWeeks(1)
        case Step.Month => cur.plusMonths(1)
        case Step.Year => cur.plusYears(1)
        case Step.NoStep => throw new IllegalStateException
      }
    }
    out.result()
  }

  /** Presentation-edge formatter matching the reference's sortable
    * ISO-basic string (`postgres/common.clj:18-23`). */
  def basicDateTime(ts: Column): Column =
    date_format(ts, "yyyyMMdd'T'HHmmss.SSS'Z'")

  /** Parse a java.time ISO instant string into a UTC Timestamp (test/
    * fixture convenience). Accepts `2014-03-21T09:09` style local forms
    * (interpreted as UTC) and full instants. */
  def ts(s: String): Timestamp = {
    val norm = if (s.endsWith("Z")) s else s + "Z"
    val padded =
      if (norm.count(_ == ':') == 1) norm.replace("Z", ":00Z") else norm
    Timestamp.from(Instant.parse(padded))
  }
}
