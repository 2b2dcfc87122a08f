package graft

import graft.operators.Cdc

class CdcSpec extends SparkTestBase {

  private def state(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("applyChanges: last writer wins, deletes drop, reinsert revives") {
    import spark.implicits._
    val log = Seq(
      (1L, "a", 10L, "U"), (1L, "b", 20L, "U"),   // 1 → b
      (2L, "x", 5L, "U"), (2L, "x2", 8L, "D"),    // 2 deleted
      (3L, "m", 1L, "U"), (3L, "gone", 2L, "D"),
      (3L, "back", 3L, "U"))                       // 3 revived
      .toDF("id", "v", "seq", "op")
    val got = Cdc.applyChanges(None, log, Seq("id"), Seq("v"),
      Seq("seq"), "op")
    assert(state(got) == Set((1L, "b"), (3L, "back")))
  }

  test("snapshot + remaining log == full replay (compositionality)") {
    import spark.implicits._
    val log = Seq(
      (1L, "a", 1L, "U"), (1L, "b", 4L, "U"),
      (2L, "x", 2L, "U"), (2L, "_", 5L, "D"),
      (3L, "k", 3L, "D"),                         // delete before cut
      (4L, "q", 6L, "U"))                         // insert after cut
      .toDF("id", "v", "seq", "op")
    val full = Cdc.applyChanges(None, log, Seq("id"), Seq("v"),
      Seq("seq"), "op")
    val snap = Cdc.applyChanges(None, log.where($"seq" <= 3),
      Seq("id"), Seq("v"), Seq("seq"), "op")
    val resumed = Cdc.applyChanges(Some(snap), log.where($"seq" > 3),
      Seq("id"), Seq("v"), Seq("seq"), "op")
    assert(state(resumed) == state(full))
    assert(state(full) == Set((1L, "b"), (4L, "q")))
  }

  test("multi-column sequence breaks timestamp ties deterministically") {
    import spark.implicits._
    val log = Seq(
      (1L, "first", 10L, 1L, "U"),
      (1L, "second", 10L, 2L, "U"))   // same seq1, higher tiebreak wins
      .toDF("id", "v", "s1", "s2", "op")
    val got = Cdc.applyChanges(None, log, Seq("id"), Seq("v"),
      Seq("s1", "s2"), "op")
    assert(state(got) == Set((1L, "second")))
  }

  test("a change always outranks the snapshot, even at equal payload") {
    import spark.implicits._
    val snap = Seq((1L, "old"), (2L, "keep")).toDF("id", "v")
    val log = Seq((1L, "new", 1L, "U")).toDF("id", "v", "seq", "op")
    val got = Cdc.applyChanges(Some(snap), log, Seq("id"), Seq("v"),
      Seq("seq"), "op")
    assert(state(got) == Set((1L, "new"), (2L, "keep")))
  }
}
