package graft

import org.apache.spark.sql.functions._

import graft.operators.Anomaly

/** Pins [[Anomaly.trailingZFlags]] against a brute-force JVM replica:
  * per entity, per row, recompute mean/variance of the previous
  * `baseN` values exactly (BigInt cross-multiplied) and compare the
  * verdict row-for-row. Randomized over seeded series (plain
  * scala.util.Random — deterministic, no external property framework)
  * so frame boundaries (first rows, short series, ties) and the
  * large-magnitude domain (where a naive int64 pipeline overflows)
  * are all exercised.
  */
class AnomalySpec extends SparkTestBase {

  /** Exact replica ordered by (sec, event_id), BigInt arithmetic. */
  private def replica(rows: Seq[(Long, Long, Long, Long)], baseN: Int,
      minN: Int, k: Int): Map[Long, Boolean] =
    rows.groupBy(_._2).flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._3, e._1))
      sorted.zipWithIndex.map { case ((id, _, _, x), i) =>
        val base = sorted.slice(math.max(0, i - baseN), i).map(_._4)
        val n = BigInt(base.size)
        val s = base.map(BigInt(_)).sum
        val sxx = base.map(v => BigInt(v) * v).sum
        val lhs = (n * x - s).pow(2)
        val rhs = BigInt(k) * k * (n * sxx - s * s)
        id -> (base.size >= minN && lhs > rhs)
      }
    }

  private def check(rows: Seq[(Long, Long, Long, Long)]): Unit = {
    import spark.implicits._
    val df = rows.toDF("event_id", "user_id", "sec", "cents")
    val got = Anomaly.trailingZFlags(df, col("user_id"),
        Seq(col("sec"), col("event_id")), col("cents"),
        baseN = 10, minN = 4, k = 3)
      .select(col("event_id"), col("is_anomaly"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === replica(rows, baseN = 10, minN = 4, k = 3))
  }

  test("trailingZFlags matches a brute-force exact replica (seeded runs)") {
    val rnd = new scala.util.Random(0xA50417L)
    for (_ <- 1 to 12) {
      val rows = (0 until 120).map { i =>
        val cents =
          if (rnd.nextBoolean()) 90L + rnd.nextInt(21)
          else rnd.nextInt(5001).toLong
        (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(41).toLong, cents)
      }
      check(rows)
    }
  }

  test("large magnitudes stay exact (int64 cross-multiply would overflow)") {
    val rnd = new scala.util.Random(0xBEEF5EEDL)
    for (_ <- 1 to 6) {
      // |x| up to 1e9: n·Σx² ≈ 10·1e18 exceeds Long.MaxValue, so this
      // domain is exactly where the DecimalType(38,0) path earns its keep
      val rows = (0 until 80).map { i =>
        val mag = if (rnd.nextBoolean()) 1000000000L else 999999999L
        val sign = if (rnd.nextBoolean()) 1L else -1L
        val cents =
          if (rnd.nextInt(4) == 0) sign * (mag - rnd.nextInt(1000))
          else rnd.nextInt(2000).toLong - 1000L
        (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(30).toLong, cents)
      }
      check(rows)
    }
  }

  test("domain-edge magnitudes near the documented 3e15 bound stay exact") {
    val rnd = new scala.util.Random(0xD0C5EEDL)
    val rows = (0 until 40).map { i =>
      val cents = (rnd.nextLong() % 3000000000000000L)
      (i.toLong, rnd.nextInt(2).toLong, rnd.nextInt(20).toLong, cents)
    }
    check(rows)
  }

  test("anomaly test never fires without enough history") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1L, 1000000L), (2L, 1L, 2L, 0L), (3L, 1L, 3L, 999999L))
      .toDF("event_id", "user_id", "sec", "cents")
    val flagged = Anomaly.trailingZFlags(df, col("user_id"),
        Seq(col("sec"), col("event_id")), col("cents"),
        baseN = 10, minN = 4, k = 3)
      .where(col("is_anomaly")).count()
    assert(flagged === 0L)
  }

  test("constant baseline flags any deviation (zero variance)") {
    import spark.implicits._
    val base = (0 until 8).map(i => (i.toLong, 7L, i.toLong, 100L))
    val df = (base :+ (99L, 7L, 99L, 101L))
      .toDF("event_id", "user_id", "sec", "cents")
    val flagged = Anomaly.trailingZFlags(df, col("user_id"),
        Seq(col("sec"), col("event_id")), col("cents"),
        baseN = 10, minN = 4, k = 3)
      .where(col("is_anomaly"))
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(flagged === Set(99L))
  }

  test("ewma: Horner-fold weights match the closed form, per entity") {
    import spark.implicits._
    // user 1: values 100, 200, 400 → EWMAs (α=1/2, w=3):
    //   t0: 100/1                       → 1_000_000 e4 / 1 = 1e4·100
    //   t1: (2·100+200)/3               → floor(1e4·400/3)
    //   t2: (4·100+2·200+400)/7         → floor(1e4·1200/7)
    // user 2 must not contaminate user 1's frames
    val df = Seq(
      (1L, 1L, 10L, 100L), (2L, 1L, 20L, 200L), (3L, 1L, 30L, 400L),
      (4L, 2L, 5L, 999L))
      .toDF("event_id", "user_id", "sec", "cents")
    val got = Anomaly.ewma(df, col("user_id"),
        Seq(col("sec"), col("event_id")), col("cents"), w = 3)
      .select(col("event_id"), col("ewma_e4"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 100L * 10000)
    assert(got(2L) === math.floor(10000.0 * 400 / 3).toLong)
    assert(got(3L) === math.floor(10000.0 * 1200 / 7).toLong)
    assert(got(4L) === 999L * 10000)
  }

  test("ewma: fused codegen fold ≡ higher-order fold on random series") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val df = (1 to 400).map(i =>
        (i.toLong, (i % 13).toLong, i.toLong, rnd.nextLong() % 1000000L))
      .toDF("event_id", "user_id", "sec", "cents")
    def run(fold: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      Anomaly.ewma(df, col("user_id"),
          Seq(col("sec"), col("event_id")), col("cents"), w = 8,
          foldFn = fold)
        .select(col("event_id"), col("ewma_e4"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = run(Anomaly.ewmaFoldHof)
    val native = run(graft.functions.GraftFunctions.ewmaE4Native)
    assert(hof == native)
    assert(hof.size == 400)

    // the folds must also agree OFF the documented contract: an empty
    // frame (all values null → collect_list collapses it) is NULL in
    // both, not codegen-NULL vs HOF floor(0/0 = NaN) → 0
    val emptyFrame = Seq(Seq.empty[Long], Seq(3L, 5L)).toDF("l")
    val pair = emptyFrame.select(
        Anomaly.ewmaFoldHof(col("l")).as("hof"),
        graft.functions.GraftFunctions.ewmaE4Native(col("l")).as("native"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    assert(pair.toSeq == Seq((None, None),
      (Some(math.floor(10000.0 * 11 / 3).toLong),
        Some(math.floor(10000.0 * 11 / 3).toLong))))
  }

  /** Recursive tabular-CUSUM replica: the textbook max(0, acc + d)
    * recursion the closed-form window algebra must reproduce. */
  private def cusumReplica(rows: Seq[(Long, Long, Long, Long)],
      target: Long, slack: Long): Map[Long, (Long, Long)] =
    rows.groupBy(_._2).flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._3, e._1))
      var sp = 0L; var sn = 0L
      sorted.map { case (id, _, _, x) =>
        sp = math.max(0L, sp + (x - target - slack))
        sn = math.max(0L, sn + (target - slack - x))
        id -> (sp, sn)
      }
    }

  test("cusumFlags: closed form ≡ the textbook recursion (seeded runs)") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xC0505EEDL)
    for (_ <- 1 to 10) {
      // drifting regimes: level shifts up/down mid-series so both
      // statistics rise, reset, and re-accumulate
      val rows = (0 until 150).map { i =>
        val level = (i / 30) % 3 match {
          case 0 => 1000L; case 1 => 2400L; case _ => 200L
        }
        (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(50).toLong,
          level + rnd.nextInt(400) - 200L)
      }
      val got = Anomaly.cusumFlags(rows.toDF("event_id", "user_id", "sec", "cents"),
          col("user_id"), Seq(col("sec"), col("event_id")), col("cents"),
          target = 1200L, slack = 300L, threshold = 2000L)
        .select(col("event_id"), col("s_pos"), col("s_neg"), col("is_shift"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .toMap
      val want = cusumReplica(rows, target = 1200L, slack = 300L)
      assert(got.keySet === want.keySet)
      want.foreach { case (id, (sp, sn)) =>
        assert(got(id) === ((sp, sn, sp >= 2000L || sn >= 2000L)),
          s"event $id")
      }
    }
  }

  test("cusumFlags: sub-slack noise never accumulates, a sustained shift fires") {
    import spark.implicits._
    // noise within ±slack of target: every drift term is ≤ 0, both
    // statistics stay 0; then a sustained +400-over-deadband run
    // accumulates linearly to the threshold
    val calm = (0 until 20).map(i => (i.toLong, 1L, i.toLong, 1000L + (i % 2) * 200L - 100L))
    val shifted = (20 until 30).map(i => (i.toLong, 1L, i.toLong, 1700L))
    val got = Anomaly.cusumFlags((calm ++ shifted).toDF("event_id", "user_id", "sec", "cents"),
        col("user_id"), Seq(col("sec"), col("event_id")), col("cents"),
        target = 1000L, slack = 300L, threshold = 2000L)
      .select(col("event_id"), col("s_pos"), col("is_shift")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    got.filter(_._1 < 20).foreach { case (_, sp, flag) =>
      assert(sp === 0L); assert(!flag)
    }
    // shift rows: s_pos = 400·(k+1) after k-th shifted row → fires at row 24
    assert(got.filter(_._1 >= 20).map(g => g._1 -> g._2).toMap ===
      (20 until 30).map(i => i.toLong -> 400L * (i - 19)).toMap)
    assert(got.filter(_._3).map(_._1).min === 24L)
  }

  /** JVM replica of the Holt recursion (math.floorDiv — the documented
    * floor-division semantics the SQL floor(x/2.0) form must equal
    * inside the 2^53 domain). */
  private def holtReplica(rows: Seq[(Long, Long, Long, Long)],
      horizon: Long): Map[Long, (Long, Long, Long, Long)] =
    rows.groupBy(_._2).map { case (u, es) =>
      val xs = es.sortBy(e => (e._3, e._1)).map(_._4)
      var l = xs.head * 10000L; var b = 0L
      xs.tail.foreach { x =>
        val ln = Math.floorDiv(x * 10000L + l + b, 2L)
        b = Math.floorDiv(ln - l + 3L * b, 4L)
        l = ln
      }
      u -> (xs.size.toLong, l, b, l + horizon * b)
    }

  test("holt: fold ≡ the floor-division recursion, incl. negative trends") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x401757L)
    for (_ <- 1 to 8) {
      // regimes that climb, crash, and go negative so the trend (and
      // its floor division) is exercised on both signs
      val rows = (0 until 160).map { i =>
        val drift = ((i / 40) % 4) match {
          case 0 => 50L * (i % 40); case 1 => 2000L - 90L * (i % 40)
          case 2 => -1500L; case _ => 0L
        }
        (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(60).toLong,
          drift + rnd.nextInt(300) - 150L)
      }
      val got = Anomaly.holt(rows.toDF("event_id", "user_id", "sec", "cents"),
          col("user_id"), Seq(col("sec"), col("event_id")), col("cents"),
          horizon = 8)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toMap
      assert(got === holtReplica(rows, 8L))
    }
  }

  test("holt: constant series settles level exactly; linear ramp is tracked") {
    import spark.implicits._
    // constant: L stays x·1e4, B stays 0 from the very first step
    val const = (0 until 12).map(i => (i.toLong, 1L, i.toLong, 700L))
    val gotC = Anomaly.holt(const.toDF("event_id", "user_id", "sec", "cents"),
        col("user_id"), Seq(col("sec"), col("event_id")), col("cents"),
        horizon = 5)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).head
    assert(gotC === ((700L * 10000, 0L, 700L * 10000)))
    // ramp x_t = 100·t: the trend must converge NEAR the true slope
    // (100·1e4 per step) — fixed gains keep a small bias, so pin a
    // band, and pin the exact value via the replica
    val ramp = (0 until 60).map(i => (i.toLong, 2L, i.toLong, 100L * i))
    val gotR = Anomaly.holt(ramp.toDF("event_id", "user_id", "sec", "cents"),
        col("user_id"), Seq(col("sec"), col("event_id")), col("cents"),
        horizon = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    val want = holtReplica(ramp, 1L)(2L)
    assert(gotR === ((want._1, want._2, want._3)))
    assert(math.abs(gotR._3 - 100L * 10000) < 300000L,
      s"trend ${gotR._3} should sit near the true 1e6 slope")
  }

  test("ewma window slides: a row beyond w drops out of the fold") {
    import spark.implicits._
    val df = (1 to 5).map(i => (i.toLong, 1L, i.toLong, 100L * i))
      .toDF("event_id", "user_id", "sec", "cents")
    val got = Anomaly.ewma(df, col("user_id"),
        Seq(col("sec"), col("event_id")), col("cents"), w = 2)
      .select(col("event_id"), col("ewma_e4"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // at t5 only (400, 500) are in frame: floor(1e4·(2·400+500)/3)
    assert(got(5L) === math.floor(10000.0 * 1300 / 3).toLong)
  }
}
