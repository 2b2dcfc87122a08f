package graft

import graft.functions.TimeKernel.ts
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val lefts = Seq(
    (1L, "u1", ts("2024-01-01T10:30")),
    (2L, "u2", ts("2024-01-01T10:00")),
    (3L, "u3", ts("2024-01-01T10:00")))
    .toDF("lid", "key", "ts")

  private val rights = Seq(
    (10L, "u1", ts("2024-01-01T10:30")), // == l.ts       → inclusive match
    (11L, "u1", ts("2024-01-01T11:29")), // l.ts + 59 min → match, crosses bucket
    (12L, "u1", ts("2024-01-01T11:30")), // == l.ts + 1h  → exclusive, no match
    (13L, "u1", ts("2024-01-01T10:29")), // before l.ts   → no match
    (14L, "u2", ts("2024-01-01T10:59")), // same bucket   → match
    (15L, "u9", ts("2024-01-01T10:10"))) // other key     → no match
    .toDF("rid", "key", "ts")

  test("band join: inclusive start, exclusive end, cross-bucket, key-scoped") {
    val got = RangeJoin.band(lefts, rights, Seq("key"), "ts",
        windowSeconds = 3600, Seq("lid"), Seq(("rid", "rid")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 14L)))
  }

  test("band join equals the naive theta join on random data") {
    val rnd = new scala.util.Random(21)
    def t(min: Int) = new java.sql.Timestamp(
      ts("2024-01-01T00:00").getTime + min * 60000L)
    val l = (0 until 150).map(i =>
      (i.toLong, "k" + rnd.nextInt(5), t(rnd.nextInt(1000)))).toDF("lid", "key", "ts")
    val r = (0 until 150).map(i =>
      (i.toLong, "k" + rnd.nextInt(6), t(rnd.nextInt(1000)))).toDF("rid", "key", "ts")
    val got = RangeJoin.band(l, r, Seq("key"), "ts", 1800,
        Seq("lid"), Seq(("rid", "rid")))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val naive = l.as("a").join(r.as("b"),
        $"a.key" === $"b.key" && $"b.ts" >= $"a.ts" &&
          $"b.ts" < $"a.ts" + org.apache.spark.sql.functions.expr("INTERVAL 30 MINUTES"))
      .select($"a.lid", $"b.rid")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == naive)
  }
}
