package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.TimeKernel.ts
import graft.operators.Scd

class ScdSpec extends SparkTestBase {

  private def changes = {
    import spark.implicits._
    // user 1: bronze → silver → gold, with the silver/gold flip
    // happening at the SAME instant (ord 2 then 3 — gold supersedes);
    // user 2: a single open-ended tier
    Seq(
      (1L, ts("2024-01-01T00:00"), 1L, "bronze"),
      (1L, ts("2024-01-05T00:00"), 2L, "silver"),
      (1L, ts("2024-01-05T00:00"), 3L, "gold"),
      (2L, ts("2024-01-03T00:00"), 4L, "bronze")
    ).toDF("user_id", "at", "ord", "tier")
  }

  test("buildType2: gapless intervals, same-instant changes collapse") {
    val scd2 = Scd.buildType2(changes, Seq("user_id"), "at", col("ord"))
    val got = scd2.select("user_id", "tier", "valid_from", "valid_to")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.get(3)).map(_.asInstanceOf[Timestamp])))
      .sortBy(t => (t._1, t._3.getTime)).toSeq
    assert(got == Seq(
      (1L, "bronze", ts("2024-01-01T00:00"), Some(ts("2024-01-05T00:00"))),
      (1L, "gold", ts("2024-01-05T00:00"), None), // silver superseded
      (2L, "bronze", ts("2024-01-03T00:00"), None)))
  }

  test("pointInTime: inclusive from, exclusive to, null before first") {
    import spark.implicits._
    val scd2 = Scd.buildType2(changes, Seq("user_id"), "at", col("ord"))
    val facts = Seq(
      (1L, ts("2023-12-31T23:59"), "pre"),   // before any change → null
      (1L, ts("2024-01-01T00:00"), "exact"), // valid_from inclusive
      (1L, ts("2024-01-04T23:59"), "mid"),
      (1L, ts("2024-01-05T00:00"), "flip"),  // same-instant → gold
      (2L, ts("2024-06-01T00:00"), "open"),
      (3L, ts("2024-01-02T00:00"), "nokey")  // key never in the dim
    ).toDF("user_id", "at", "tag")
    val got = Scd.pointInTime(facts, scd2, Seq("user_id"), "at", Seq("tier"))
      .select("tag", "tier").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got == Map(
      "pre" -> None, "exact" -> Some("bronze"), "mid" -> Some("bronze"),
      "flip" -> Some("gold"), "open" -> Some("bronze"), "nokey" -> None))
  }

  test("fuzz: pointInTime == brute-force latest-change-at-or-before") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 5) {
      def t(day: Int): Timestamp = ts(f"2024-01-$day%02dT00:00")
      val changes = (0 until 25).map { i =>
        (rnd.nextInt(4).toLong, t(1 + rnd.nextInt(20)), i.toLong, s"a$i")
      }
      val facts = (0 until 40).map { i =>
        (rnd.nextInt(5).toLong, t(1 + rnd.nextInt(25)), i.toLong)
      }
      // brute force: the attribute of the latest change with
      // change.ts <= fact.ts (ties by ord desc), else null
      val ref = facts.map { case (k, at, fid) =>
        val cands = changes.filter(c => c._1 == k && !c._2.after(at))
        fid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(c => (c._2.getTime, c._3))._4))
      }.toMap
      val scd2 = Scd.buildType2(
        changes.toDF("k", "at", "ord", "attr"), Seq("k"), "at", col("ord"))
      val got = Scd.pointInTime(facts.toDF("k", "at", "fid"), scd2,
          Seq("k"), "at", Seq("attr"))
        .collect().map(r => r.getAs[Long]("fid") ->
          Option(r.getAs[String]("attr"))).toMap
      assert(got == ref, s"trial $trial")
    }
  }

  test("pointInTime on a GAPPED hand-maintained table nulls inside the gap") {
    import spark.implicits._
    // validity ends 01-10 but the next version only starts 01-20
    val scd2 = Seq(
      (1L, ts("2024-01-01T00:00"), ts("2024-01-10T00:00"), "v1"),
      (1L, ts("2024-01-20T00:00"), null, "v2"))
      .toDF("user_id", "valid_from", "valid_to", "ver")
      .withColumn("valid_to", col("valid_to").cast("timestamp"))
    val facts = Seq(
      (1L, ts("2024-01-05T00:00"), "in1"),
      (1L, ts("2024-01-15T00:00"), "gap"),
      (1L, ts("2024-01-25T00:00"), "in2")).toDF("user_id", "at", "tag")
    val got = Scd.pointInTime(facts, scd2, Seq("user_id"), "at", Seq("ver"))
      .select("tag", "ver").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got == Map("in1" -> Some("v1"), "gap" -> None,
      "in2" -> Some("v2")))
  }
}
