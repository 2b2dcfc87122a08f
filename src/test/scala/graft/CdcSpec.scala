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

  test("maintained state: version chain through a real stream, replay-safe") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingIngest
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("cdc-state").toString
    val src = MemoryStream[(Long, String, Long, String)]
    val q = StreamingIngest.maintainState(
        src.toDF().toDF("id", "v", "seq", "op"),
        Seq("id"), Seq("v"), Seq("seq"), "op", s"$base/state")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    src.addData((1L, "a", 1L, "U"), (2L, "x", 2L, "U"))
    q.processAllAvailable()
    assert(state(StreamingIngest.readState(spark, s"$base/state")) ==
      Set((1L, "a"), (2L, "x")))
    src.addData((1L, "b", 3L, "U"), (2L, "_", 4L, "D"))
    q.processAllAvailable()
    q.stop()
    assert(state(StreamingIngest.readState(spark, s"$base/state")) ==
      Set((1L, "b")))
    // full versions, not deltas: both dirs committed and readable
    assert(new java.io.File(s"$base/state/v=0").isDirectory)
    assert(new java.io.File(s"$base/state/v=1").isDirectory)
    // crash replay of batch 1 = recompute v=1 FROM v=0 (the version
    // below its id); last-writer-wins makes it land identically
    val v0 = spark.read.parquet(s"$base/state/v=0")
    val replayed = Cdc.applyChanges(Some(v0),
      Seq((1L, "b", 3L, "U"), (2L, "_", 4L, "D")).toDF("id", "v", "seq", "op"),
      Seq("id"), Seq("v"), Seq("seq"), "op")
    assert(state(replayed) ==
      state(spark.read.parquet(s"$base/state/v=1")))
  }

  test("fuzz: random logs — full replay == reference == snapshot+rest at any cut") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 5) {
      val n = 20 + rnd.nextInt(30)
      // seq values drawn 1..n*2 with collisions possible → tiebreak col
      val log = (0 until n).map { i =>
        (rnd.nextInt(6).toLong,                     // key
          s"v$i",                                   // payload
          (1L + rnd.nextInt(n * 2)),                // seq (collides)
          i.toLong,                                 // tiebreak (unique)
          if (rnd.nextInt(4) == 0) "D" else "U")
      }
      // in-memory reference: last (seq, tie) wins per key; D removes
      val ref = log.groupBy(_._1).flatMap { case (k, es) =>
        val last = es.maxBy(e => (e._3, e._4))
        if (last._5 == "D") None else Some((k, last._2))
      }.toSet
      val df = log.toDF("id", "v", "seq", "tie", "op")
      val full = Cdc.applyChanges(None, df, Seq("id"), Seq("v"),
        Seq("seq", "tie"), "op")
      assert(state(full) == ref, s"trial $trial full")
      // arbitrary cut on the SEQUENCE (not arrival): snapshot + rest
      val cut = 1L + rnd.nextInt(n * 2)
      val snap = Cdc.applyChanges(None, df.where($"seq" <= cut),
        Seq("id"), Seq("v"), Seq("seq", "tie"), "op")
      val resumed = Cdc.applyChanges(Some(snap), df.where($"seq" > cut),
        Seq("id"), Seq("v"), Seq("seq", "tie"), "op")
      assert(state(resumed) == ref, s"trial $trial cut=$cut")
    }
  }

  test("a change always outranks the snapshot, even at equal payload") {
    import spark.implicits._
    val snap = Seq((1L, "old"), (2L, "keep")).toDF("id", "v")
    val log = Seq((1L, "new", 1L, "U")).toDF("id", "v", "seq", "op")
    val got = Cdc.applyChanges(Some(snap), log, Seq("id"), Seq("v"),
      Seq("seq"), "op")
    assert(state(got) == Set((1L, "new"), (2L, "keep")))
  }

  test("snapshotDiff classifies added / removed / changed / unchanged") {
    import spark.implicits._
    val oldS = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val newS = Seq((2L, "b"), (3L, "C2"), (4L, "d")).toDF("id", "text")
    val got = Cdc.snapshotDiff(oldS, newS, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff against itself is all-unchanged") {
    import spark.implicits._
    val s = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val st = Cdc.snapshotDiff(s, s, "id", "text")
      .select("status").distinct().collect().map(_.getString(0)).toSeq
    assert(st == Seq("unchanged"))
  }

  test("snapshotDiff treats NULL content as a value, not as absence") {
    import spark.implicits._
    val n: String = null
    // 1: null→null (unchanged)  2: "b"→null (changed)
    // 3: null→"c" (changed)     4: present-with-null on old side only
    val oldS = Seq((1L, n), (2L, "b"), (3L, n), (4L, n)).toDF("id", "text")
    val newS = Seq((1L, n), (2L, n), (3L, "c")).toDF("id", "text")
    val got = Cdc.snapshotDiff(oldS, newS, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "changed", 4L -> "removed"))
  }

  test("snapshotDiff raises loudly on a duplicate key (either side)") {
    import spark.implicits._
    val ok = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val dup = Seq((1L, "a"), (1L, "a2"), (2L, "b")).toDF("id", "text")
    val e1 = intercept[Exception] {
      Cdc.snapshotDiff(dup, ok, "id", "text").collect()
    }
    assert(e1.getMessage.contains("duplicate key"), e1.getMessage)
    val e2 = intercept[Exception] {
      Cdc.snapshotDiff(ok, dup, "id", "text").collect()
    }
    assert(e2.getMessage.contains("duplicate key"), e2.getMessage)
    // the guard costs nothing on the clean path: unique keys unchanged
    assert(Cdc.snapshotDiff(ok, ok, "id", "text")
      .select("status").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("unchanged"))
  }

  test("snapshotDiff NULL keys: unique within a side, never match across") {
    import spark.implicits._
    val nk: java.lang.Long = null
    // Two NULL-keyed rows on ONE side = a duplicate (groupBy pools NULLs)
    val dupNull = Seq((nk, "a"), (nk, "a2")).toDF("id", "text")
    val one = Seq((java.lang.Long.valueOf(7L), "x")).toDF("id", "text")
    val e = intercept[Exception] {
      Cdc.snapshotDiff(dupNull, one, "id", "text").collect()
    }
    assert(e.getMessage.contains("duplicate key"), e.getMessage)
    assert(e.getMessage.contains("null"), e.getMessage)
    // One NULL-keyed row per side: equality join never matches NULL keys,
    // so the same NULL key on both sides reports removed + added.
    val oldS = Seq((nk, "a"), (java.lang.Long.valueOf(1L), "b"))
      .toDF("id", "text")
    val newS = Seq((nk, "a"), (java.lang.Long.valueOf(1L), "b"))
      .toDF("id", "text")
    val got = Cdc.snapshotDiff(oldS, newS, "id", "text")
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSeq
    assert(got.filter(_._1.isEmpty).map(_._2).sorted ==
      Seq("added", "removed"), got.toString)
    assert(got.filter(_._1.nonEmpty).map(_._2) == Seq("unchanged"))
  }
}
