package graft

import org.apache.spark.sql.functions._

import graft.functions.TimeKernel.ts
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val quotes = Seq(
    ("A", ts("2024-01-01T09:00"), 100L),
    ("A", ts("2024-01-01T09:05"), 101L),
    ("A", ts("2024-01-01T09:10"), 102L),
    ("B", ts("2024-01-01T09:02"), 500L))
    .toDF("sym", "ts", "px")

  private val trades = Seq(
    (1L, "A", ts("2024-01-01T09:04")), // after 09:00 quote
    (2L, "A", ts("2024-01-01T09:05")), // exactly at 09:05 quote (inclusive)
    (3L, "A", ts("2024-01-01T08:59")), // before any quote -> null
    (4L, "B", ts("2024-01-01T10:00")), // old quote still matches (no tol)
    (5L, "C", ts("2024-01-01T09:30"))) // key never quoted -> null
    .toDF("trade_id", "sym", "ts")

  test("backward as-of join picks the latest right row at or before left.ts") {
    val got = AsOfJoin.backward(trades, quotes, Seq("sym"), "ts", Seq("px"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == Map(
      1L -> Some(100L), 2L -> Some(101L), 3L -> None,
      4L -> Some(500L), 5L -> None))
  }

  test("tolerance nulls out matches older than the bound") {
    val got = AsOfJoin.backward(trades, quotes, Seq("sym"), "ts", Seq("px"),
        tolerance = Some(expr("INTERVAL 10 MINUTES")))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got(4L).isEmpty) // 58 min old quote dropped
    assert(got(1L).contains(100L))
  }

  test("forward as-of join picks the earliest right row at or after left.ts") {
    val got = AsOfJoin.forward(trades, quotes, Seq("sym"), "ts", Seq("px"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == Map(
      1L -> Some(101L), // next A quote after 09:04 is 09:05
      2L -> Some(101L), // exactly-at quote matches (inclusive)
      3L -> Some(100L), // 08:59 -> first quote 09:00
      4L -> None, // B has no quote after 10:00
      5L -> None))
  }

  test("forward tolerance nulls out matches farther than the bound") {
    val got = AsOfJoin.forward(trades, quotes, Seq("sym"), "ts", Seq("px"),
        tolerance = Some(expr("INTERVAL 30 SECONDS")))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got(3L).isEmpty) // 09:00 quote is 60s ahead of 08:59 trade
    assert(got(2L).contains(101L)) // zero-distance match survives
  }

  test("all left columns and the matched timestamp survive") {
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "ts", Seq("px"))
    assert(out.columns.toSeq == Seq("trade_id", "sym", "ts", "px", "matched_ts"))
    assert(out.count() == 5)
  }
}
