package graft

import org.apache.spark.sql.functions._

import graft.functions.TimeKernel.ts
import graft.operators.Funnel

/** Deterministic pins for the product-analytics pair: ordered funnel
  * (earliest-qualifying-event rule, strict ordering) and cohort
  * retention (first-seen day × day offset, one count per user-day). */
class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  test("funnel: strict ordering, earliest-qualifying rule, monotone counts") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "signup", ts("2024-01-01T10:00")),
      (1L, "click", ts("2024-01-01T11:00")),
      (1L, "purchase", ts("2024-01-01T12:00")),
      // user 2: click BEFORE signup — that click cannot qualify, and
      // there is no later one, so user 2 stops at stage 0
      (2L, "click", ts("2024-01-01T09:00")),
      (2L, "signup", ts("2024-01-01T10:00")),
      (2L, "purchase", ts("2024-01-01T11:00")),
      // user 3: signup + click, purchase exactly AT the click time —
      // strict ordering rejects the tie
      (3L, "signup", ts("2024-01-01T08:00")),
      (3L, "click", ts("2024-01-01T09:00")),
      (3L, "purchase", ts("2024-01-01T09:00")),
      // user 4: earliest-qualifying matters — first click precedes
      // signup, the SECOND click qualifies, and the purchase after it
      (4L, "click", ts("2024-01-01T07:00")),
      (4L, "signup", ts("2024-01-01T08:00")),
      (4L, "click", ts("2024-01-01T09:00")),
      (4L, "purchase", ts("2024-01-01T10:00")),
      // user 5: never signs up — in no stage
      (5L, "click", ts("2024-01-01T10:00")))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.funnel(ev, "user_id", "ts", Seq(
        "signup" -> (col("event_type") === "signup"),
        "click" -> (col("event_type") === "click"),
        "purchase" -> (col("event_type") === "purchase")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // stage 0: users 1,2,3,4; stage 1: 1,3,4 (user 2 has no later
    // click); stage 2: 1,4 (user 3's tie rejected)
    assert(got == Set((0L, "signup", 4L), (1L, "click", 3L),
      (2L, "purchase", 2L)), s"got $got")
  }

  test("cohortRetention: first-seen day cohorts, one count per user-day") {
    val ev = Seq(
      // user 1: first seen Jan 1, active Jan 1 (twice — counts once)
      // and Jan 3
      (1L, ts("2024-01-01T10:00")), (1L, ts("2024-01-01T20:00")),
      (1L, ts("2024-01-03T10:00")),
      // user 2: first seen Jan 1, active Jan 1 only
      (2L, ts("2024-01-01T12:00")),
      // user 3: first seen Jan 2, active Jan 2 and Jan 3
      (3L, ts("2024-01-02T12:00")), (3L, ts("2024-01-03T12:00")))
      .toDF("user_id", "ts").withColumn("event_type", lit("x"))
    val got = Funnel.cohortRetention(ev, "user_id", "ts").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (ts("2024-01-01T00:00"), 0L) -> 2L,
      (ts("2024-01-01T00:00"), 2L) -> 1L,
      (ts("2024-01-02T00:00"), 0L) -> 1L,
      (ts("2024-01-02T00:00"), 1L) -> 1L), s"got $got")
  }

  test("stageLatencies: exact discrete p50/p90 over qualifying-time gaps") {
    // four users complete signup→click with gaps 60, 120, 180, 240
    // minutes; only users 1 and 2 purchase (gaps 30 and 60 min).
    def u(id: Long, sMin: Int, cMin: Int, pMin: Int = -1) = {
      val base = Seq(
        (id, "signup", ts(f"2024-01-01T00:$sMin%02d")),
        (id, "click", ts(f"2024-01-01T0${cMin / 60}%d:${cMin % 60}%02d")))
      if (pMin < 0) base
      else base :+ ((id, "purchase",
        ts(f"2024-01-01T0${pMin / 60}%d:${pMin % 60}%02d")))
    }
    val ev = (u(1L, 0, 60, 90) ++ u(2L, 0, 120, 180) ++
      u(3L, 0, 180) ++ u(4L, 0, 240))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.stageLatencies(ev, "user_id", "ts", Seq(
        "signup" -> (col("event_type") === "signup"),
        "click" -> (col("event_type") === "click"),
        "purchase" -> (col("event_type") === "purchase")))
      .collect()
      .map(r => r.getString(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // signup→click gaps sorted: 3600,7200,10800,14400; n=4 →
    // p50 at row (3*50)/100+1 = 2 → 7200; p90 at row (3*90)/100+1=3
    // → 10800. click→purchase gaps: 1800,3600; p50 row 1 → 1800,
    // p90 row 1 → 1800.
    assert(got == Map(
      "signup->click" -> ((4L, 7200L, 10800L)),
      "click->purchase" -> ((2L, 1800L, 1800L))), s"got $got")
  }
}
