package graft

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.TimeKernel
import graft.functions.TimeKernel.ts
import graft.model._
import graft.operators.Timeseries

/** Property tests (SURVEY §5.3) over seeded-random event sets — an
  * upgrade over the reference's example-only suite:
  *  1. conservation: Σ of a counter timeseries == Σ of event values
  *     for ANY event set / step (events are never lost or duplicated
  *     across grouping fan-out, `postgres/update.clj:84-87`);
  *  2. re-aggregation associativity: collapsing slices to hours then
  *     summing == collapsing straight to days (sums of sums);
  *  3. fill-range density: rows == |series| × calendar distance
  *     regardless of data sparsity.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private val fact = FactDef("f", FactType.Counter, sliceMinutes = 15)

  private def randomEvents(seed: Int, n: Int) = {
    val rnd = new Random(seed)
    (0 until n).map { _ =>
      val day = 1 + rnd.nextInt(9)
      val h = rnd.nextInt(24)
      val m = rnd.nextInt(60)
      ("d" + rnd.nextInt(3), ts(f"2024-02-$day%02dT$h%02d:$m%02d"),
        1L + rnd.nextInt(5))
    }.toDF("dim", "ts", "value")
  }

  private val start = ts("2024-02-01T00:00")
  private val finish = ts("2024-02-10T00:00")

  test("conservation: grid sum equals event-value sum for every step") {
    for (seed <- Seq(1, 2, 3)) {
      val ev = randomEvents(seed, 300).cache()
      val total = ev.agg(sum("value")).head().getLong(0)
      for (step <- Seq(Step.NoStep, Step.Hour, Step.Day)) {
        // full-range query, no filters: nothing may be lost at the edges
        val got = Timeseries.run(ev, fact, 15, Seq("dim"), Map.empty,
          start, finish, step)
        val gridTotal = got.agg(sum("value")).head().getLong(0)
        assert(gridTotal == total, s"seed $seed step $step")
      }
      ev.unpersist()
    }
  }

  test("movingAverage: trailing frames match a scala fold on the filled grid") {
    val ev = randomEvents(7, 200)
    val filled = Timeseries.run(ev, fact, 15, Seq("dim"), Map.empty,
      start, finish, Step.Hour)
    val got = Timeseries.movingAverage(filled, Seq("dim"), k = 4)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // brute-force per series: sort the filled grid, slide a 4-window
    val base = filled.collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      .groupBy(_._1)
    for ((dim, rows) <- base; (window, i) <- {
        val sorted = rows.sortBy(_._2.getTime).map(x => (x._2, x._3))
        sorted.indices.map(i => (sorted.slice(math.max(0, i - 3), i + 1), i) -> i)
          .map(_._1)
      }) {
      val sorted = rows.sortBy(_._2.getTime).map(x => (x._2, x._3))
      val (bucket, v) = sorted(i)
      val tsum = window.map(_._2).sum
      val mavg = math.floor(100.0 * tsum / window.length).toLong
      assert(got((dim, bucket)) == ((v, tsum, mavg)),
        s"$dim $bucket: got ${got((dim, bucket))} want ($v, $tsum, $mavg)")
    }
  }

  test("counterRate: reset rule, first-bucket NULL, exact rate_e4") {
    val rows = Seq(
      ("d", ts("2024-02-01T00:00"), 10L),
      ("d", ts("2024-02-01T01:00"), 17L),  // +7
      ("d", ts("2024-02-01T02:00"), 3L),   // reset: increase = 3
      ("d", ts("2024-02-01T03:00"), 3L),   // flat: +0
      ("e", ts("2024-02-01T00:00"), 5L))   // other series: own first NULL
      .toDF("dim", "bucket", "gauge")
    val got = Timeseries.counterRate(rows, Seq("dim"), 3600L, "gauge")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(got(("d", ts("2024-02-01T00:00"))) == ((None, None)))
    assert(got(("d", ts("2024-02-01T01:00"))) ==
      ((Some(7L), Some(7L * 10000L / 3600L))))
    assert(got(("d", ts("2024-02-01T02:00"))) ==
      ((Some(3L), Some(3L * 10000L / 3600L))))
    assert(got(("d", ts("2024-02-01T03:00"))) == ((Some(0L), Some(0L))))
    assert(got(("e", ts("2024-02-01T00:00"))) == ((None, None)))
  }

  test("interpolateFill: exact neighbour line, obs passthrough, edges") {
    // observed hourly buckets 01:00=100 and 04:00=40 inside a
    // 00:00..06:00 grid: 02:00 and 03:00 interpolate the line, 00:00
    // and 05:00 are edges (filler), observed rows pass through ×100
    val coll = Seq(
      ("d", ts("2024-02-01T01:00"), 100L),
      ("d", ts("2024-02-01T04:00"), 40L))
      .toDF("dim", "bucket", "value")
    val got = Timeseries.interpolateFill(coll, Seq("dim"),
      ts("2024-02-01T00:00"), ts("2024-02-01T06:00"), Step.Hour,
      filler = 7L)
      .collect()
      .map(r => r.getTimestamp(1) -> ((r.getLong(2), r.getString(3))))
      .toMap
    assert(got.size == 6)
    assert(got(ts("2024-02-01T00:00")) == ((700L, "edge")))
    assert(got(ts("2024-02-01T01:00")) == ((10000L, "obs")))
    // line 100 → 40 over 3 h: 02:00 = 80, 03:00 = 60
    assert(got(ts("2024-02-01T02:00")) == ((8000L, "interp")))
    assert(got(ts("2024-02-01T03:00")) == ((6000L, "interp")))
    assert(got(ts("2024-02-01T04:00")) == ((4000L, "obs")))
    assert(got(ts("2024-02-01T05:00")) == ((700L, "edge")))
    // non-integer slope floors: 10 → 11 over 2 h ⇒ midpoint 10.5 → 1050
    val coll2 = Seq(
      ("d", ts("2024-02-01T00:00"), 10L),
      ("d", ts("2024-02-01T02:00"), 11L)).toDF("dim", "bucket", "value")
    val got2 = Timeseries.interpolateFill(coll2, Seq("dim"),
      ts("2024-02-01T00:00"), ts("2024-02-01T03:00"), Step.Hour)
      .collect().map(r => r.getTimestamp(1) -> r.getLong(2)).toMap
    assert(got2(ts("2024-02-01T01:00")) == 1050L)
    // empty grid (start >= finish): zero rows, stable schema
    assert(Timeseries.interpolateFill(coll2, Seq("dim"),
      ts("2024-02-01T00:00"), ts("2024-02-01T00:00"), Step.Hour)
      .count() == 0L)
  }

  test("histPercentiles: threshold cut matches a scala cumulative scan") {
    val rnd = new Random(11)
    val hist = (for (d <- Seq("a", "b"); b <- 0 until 10)
      yield (d, b.toLong * 20, 1L + rnd.nextInt(50)))
      .toDF("dim", "hist_bucket", "value")
    val pcts = Seq(1L, 50L, 90L, 99L, 100L)
    val got = Timeseries.histPercentiles(hist, Seq("dim"), pcts)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val rows = hist.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for (d <- Seq("a", "b"); q <- pcts) {
      val series = rows.filter(_._1 == d).sortBy(_._2)
      val tot = series.map(_._3).sum
      var cum = 0L
      val want = series.collectFirst {
        case (_, b, v) if { cum += v; cum * 100 >= tot * q } => b
      }.get
      assert(got((d, q)) == want, s"$d p$q")
    }
    // p100 is the last non-empty bucket, p1 the first
    assert(got(("a", 100L)) == 180L && got(("a", 1L)) == 0L)
  }

  test("tfIdfTopTerms: scores and rank cut match a scala reference") {
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana cherry cherry date"),
      (3L, "apple egg egg egg date"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .tfIdfTopTerms(docs, "text", "doc_id", topK = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val corpus = Map(
      1L -> Seq("apple", "banana", "apple", "cherry"),
      2L -> Seq("banana", "cherry", "cherry", "date"),
      3L -> Seq("apple", "egg", "egg", "egg", "date"))
    val dfm = corpus.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val n = corpus.size.toDouble
    for ((id, toks) <- corpus) {
      val scored = toks.groupBy(identity).toSeq.map { case (t, xs) =>
        val tf = xs.size.toLong
        val e6 = math.floor(1000000.0 * tf * math.log(n / dfm(t))).toLong
        (t, tf, dfm(t), e6)
      }.sortBy { case (t, _, _, e6) => (-e6, t) }
      for ((exp, i) <- scored.take(2).zipWithIndex)
        assert(got((id, i + 1L)) == exp, s"doc $id rank ${i + 1}")
    }
  }

  test("distinct: rollup-served == raw == scala reference on random data") {
    val dFact = FactDef("u", FactType.Distinct, sliceMinutes = 15)
    for (seed <- Seq(11, 12)) {
      val rnd = new Random(seed)
      // values cycle over a small user pool → heavy cross-slice
      // recurrence, the case where scalar partials would overcount
      val ev = (0 until 400).map { _ =>
        val day = 1 + rnd.nextInt(5)
        ("d" + rnd.nextInt(2),
          ts(f"2024-02-$day%02dT${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d"),
          rnd.nextInt(12).toLong)
      }.toDF("dim", "ts", "value")
      val dir = java.nio.file.Files.createTempDirectory("prop-distinct").toString
      graft.operators.Rollups.materialize(ev, dFact, 15, Seq("dim"), dir)
      val rollup = graft.operators.Rollups.read(spark, dir)
      for (step <- Seq(Step.NoStep, Step.Hour, Step.Day)) {
        val raw = Timeseries.run(ev, dFact, 15, Seq("dim"), Map.empty,
          start, finish, step).collect().map(_.toSeq).toSet
        val served = graft.operators.Rollups.run(rollup, dFact, 15,
          Seq("dim"), Map.empty, start, finish, step)
          .collect().map(_.toSeq).toSet
        assert(raw == served, s"seed $seed step $step")
      }
      // scala reference at NoStep: distinct values per dim
      val expect = ev.collect()
        .map(r => (r.getString(0), r.getLong(2))).distinct
        .groupBy(_._1).view.mapValues(_.length.toLong).toMap
      val none = Timeseries.run(ev, dFact, 15, Seq("dim"), Map.empty,
        start, finish, Step.NoStep)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(none == expect, s"seed $seed")
    }
  }

  test("re-aggregation associativity: hour-collapse summed == day-collapse") {
    for (seed <- Seq(4, 5)) {
      val ev = randomEvents(seed, 300)
      val scanned = Timeseries.scan(ev, 15, Seq("dim"), Map.empty, start, finish)
      val hourly = Timeseries.collapse(scanned, fact, Seq("dim"), Step.Hour, 0)
      val viaHour = hourly
        .groupBy(col("dim"), date_trunc("day", col("bucket")).as("bucket"))
        .agg(sum("value").as("value"))
      val direct = Timeseries.collapse(scanned, fact, Seq("dim"), Step.Day, 0)
      val a = viaHour.collect().map(_.toSeq).toSet
      val b = direct.collect().map(_.toSeq).toSet
      assert(a == b, s"seed $seed")
    }
  }

  test("fill density: |result| == |series present| × calendar points") {
    for (seed <- Seq(6, 7)) {
      val ev = randomEvents(seed, 50) // sparse: most buckets empty
      val got = Timeseries.run(ev, fact, 15, Seq("dim"), Map.empty,
        start, finish, Step.Day)
      val nSeries = ev
        .where(col("ts") >= start && col("ts") < finish)
        .select("dim").distinct().count()
      val nGrid = TimeKernel.timeRange(start, finish, Step.Day).length
      assert(nGrid == 9) // finish exclusive
      assert(got.count() == nSeries * nGrid, s"seed $seed")
      // every absent bucket must carry the filler, never be missing
      assert(got.where(col("value").isNull).count() == 0)
    }
  }

  test("offset equivalence: collapse with offset == collapse of shifted events") {
    // time-dimension shifts the timestamp by offset hours BEFORE
    // truncation (query.clj:8-9) — so running with offset o must equal
    // running offset-free over events whose ts is shifted by o hours.
    for ((seed, off) <- Seq((9, -5), (10, 3))) {
      val ev = randomEvents(seed, 200)
      val shifted = ev.withColumn("ts",
        timestamp_seconds(unix_timestamp(col("ts")) + off * 3600L))
      val withOffset = Timeseries.collapse(
        Timeseries.scan(ev, 15, Seq("dim"), Map.empty, start, finish),
        fact, Seq("dim"), Step.Day, off)
        .collect().map(_.toSeq).toSet
      val preShifted = Timeseries.collapse(
        Timeseries.scan(shifted, 15, Seq("dim"), Map.empty,
          new Timestamp(start.getTime + off * 3600000L),
          new Timestamp(finish.getTime + off * 3600000L)),
        fact, Seq("dim"), Step.Day, 0)
        .collect().map(_.toSeq).toSet
      assert(withOffset == preShifted, s"seed $seed offset $off")
    }
  }

  test("as-of joins agree with a brute-force reference on random data") {
    import graft.operators.AsOfJoin
    for (seed <- Seq(11, 12)) {
      val rnd = new Random(seed)
      def t(min: Int) = new Timestamp(ts("2024-02-01T00:00").getTime + min * 60000L)
      // right timestamps unique per key (ties would make the match
      // payload ambiguous in ANY asof implementation)
      val rights = (for {
        k <- 0 until 4
        min <- rnd.shuffle((0 until 2000).toList).take(60)
      } yield ("k" + k, t(min), rnd.nextInt(1000).toLong))
      val lefts = (0 until 300).map(i =>
        (i.toLong, "k" + rnd.nextInt(5), t(rnd.nextInt(2000))))
      val lDF = lefts.toDF("id", "key", "ts")
      val rDF = rights.toDF("key", "ts", "v")
      val byKey = rights.groupBy(_._1)
      def expect(back: Boolean): Map[Long, Option[Long]] = lefts.map {
        case (id, k, lts) =>
          val cands = byKey.getOrElse(k, Seq.empty).filter(r =>
            if (back) !r._2.after(lts) else !r._2.before(lts))
          id -> (if (cands.isEmpty) None
            else Some((if (back) cands.maxBy(_._2.getTime)
              else cands.minBy(_._2.getTime))._3))
      }.toMap
      for (back <- Seq(true, false)) {
        val op = if (back) AsOfJoin.backward _ else AsOfJoin.forward _
        val got = op(lDF, rDF, Seq("key"), "ts", Seq("v"), None)
          .collect().map(r => r.getAs[Long]("id") ->
            (if (r.isNullAt(3)) None else Some(r.getAs[Long]("v")))).toMap
        assert(got == expect(back), s"seed $seed backward=$back")
      }
    }
  }

  test("slice invariance: query result independent of slice size for aligned ranges") {
    // With whole-hour query bounds and hour collapse, the slice size
    // (5/15/30/60) must not change results — slices nest inside hours.
    for (slice <- Seq(5, 15, 30, 60)) {
      val ev = randomEvents(8, 200)
      val f = FactDef("f", FactType.Counter, sliceMinutes = slice)
      val got = Timeseries.run(ev, f, slice, Seq("dim"), Map.empty,
        start, finish, Step.Hour)
        .collect().map(_.toSeq).toSet
      val base = Timeseries.run(ev, fact, 15, Seq("dim"), Map.empty,
        start, finish, Step.Hour)
        .collect().map(_.toSeq).toSet
      assert(got == base, s"slice $slice")
    }
  }

  test("PPM codec: encode/decode round-trips arbitrary images") {
    import graft.operators.Multimodal.Ppm
    val rnd = new Random(20260813)
    for (_ <- 0 until 50) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      val px = Array.fill(w * h * 3)(rnd.nextInt(256))
      val img = Ppm.decode(Ppm.encode(w, h, (x, y, c) => px((y * w + x) * 3 + c)))
      assert(img.width == w && img.height == h && img.maxVal == 255)
      assert(img.pixels.map(_ & 0xff).toSeq == px.toSeq)
      // resize to any geometry decodes to that geometry
      val tw = 1 + rnd.nextInt(20)
      val th = 1 + rnd.nextInt(20)
      val r = Ppm.decode(Ppm.resize(Ppm.encode(w, h,
        (x, y, c) => px((y * w + x) * 3 + c)), tw, th))
      assert(r.width == tw && r.height == th)
    }
  }

  test("morton: deinterleaving the code reconstructs both coordinates") {
    import graft.sources.Layout
    val rnd = new Random(31)
    val pts = (0 until 200).map(_ =>
      (rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
      .toDF("a", "b")
    val coded = pts.select(col("a"), col("b"),
      Layout.morton(Seq(col("a"), col("b")), bits = 16).as("z"))
      .collect()
    coded.foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var (da, db) = (0L, 0L)
      for (i <- 0 until 16) {
        da |= ((z >> (2 * i)) & 1L) << i
        db |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(da == a && db == b, s"($a,$b) -> $z -> ($da,$db)")
    }
  }

  test("int8 quantization: per-element roundtrip error within scale/2") {
    import graft.operators.Similarity
    val rnd = new Random(47)
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding")
    val q = Similarity.quantizeEmbeddings(vecs, "embedding")
      .select(col("embedding").cast("array<double>"), col("qvec"),
        col("qscale")).collect()
    q.foreach { r =>
      val xs = r.getSeq[Double](0)
      val codes = r.getSeq[Byte](1)
      val scale = r.getDouble(2)
      xs.zip(codes).foreach { case (x, c) =>
        assert(math.abs(c * scale - x) <= scale / 2 + 1e-12,
          s"x=$x code=$c scale=$scale") }
    }
  }

  test("partial-merge idempotence: compacting twice changes nothing") {
    // a synthetic partial frame with duplicate keys across "batches":
    // compactFrame must be idempotent (one row per key after one pass)
    val rnd = new Random(53)
    val partials = (0 until 400).map { _ =>
      ("s" + rnd.nextInt(3), ts(f"2024-02-0${1 + rnd.nextInt(5)}T10:15"),
        1L + rnd.nextInt(9), 1L + rnd.nextInt(4), rnd.nextInt(100).toLong,
        rnd.nextInt(50).toLong, (50 + rnd.nextInt(50)).toLong)
    }.toDF("dim", "bucket", "cnt", "cntv", "total", "mn", "mx")
    val once = graft.operators.Rollups.compactFrame(partials)
    val twice = graft.operators.Rollups.compactFrame(once)
    val a = once.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val b = twice.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(a == b)
    assert(once.groupBy(col("dim"), col("bucket")).count()
      .agg(max("count")).head().getLong(0) == 1L)
  }

  test("salted inner join ≡ plain join; bloom semi-join ≡ plain semi " +
      "on random frames (incl. high-fpp stress)") {
    import graft.operators.{BloomJoin, SkewJoin}
    for (seed <- Seq(11, 12, 13)) {
      val rnd = new Random(seed)
      // fact: duplicate keys, keys with no dim partner
      val fact = (0 until 5000).map(i =>
        (i.toLong, rnd.nextInt(200).toLong, rnd.nextInt(1000).toLong))
        .toDF("row_id", "k", "v")
      // dim: duplicate rows per key (salting must preserve the
      // one-row-per-dim-match multiplicity), keys with no fact partner
      val dim = (0 until 300).map(_ =>
        (rnd.nextInt(400).toLong, rnd.nextInt(50).toLong))
        .toDF("k", "p")
      val buckets = 1 + rnd.nextInt(16)
      def fp(df: org.apache.spark.sql.DataFrame): Seq[Any] =
        df.agg(count(lit(1)), sum(col("row_id")), sum(col("v")),
          sum(col("k") * col("p"))).head().toSeq
      assert(fp(SkewJoin.saltedInnerJoin(fact, dim, Seq("k"),
          col("row_id"), buckets)) == fp(fact.join(dim, "k")),
        s"salted != plain at seed=$seed buckets=$buckets")
      // fpp 0.3: force real false positives through the exact verify
      for (fpp <- Seq(0.3, 0.01)) {
        val got = BloomJoin.bloomSemiJoin(fact, dim, Seq("k"), fpp)
          .select(col("row_id")).collect().map(_.getLong(0)).sorted.toSeq
        val want = fact.join(dim.select("k").distinct(), Seq("k"),
            "left_semi")
          .select(col("row_id")).collect().map(_.getLong(0)).sorted.toSeq
        assert(got == want, s"bloom != semi at seed=$seed fpp=$fpp")
      }
    }
  }

  test("multi-fact law: dashboard read ≡ union of per-fact reads " +
      "for random events, fillers, and steps") {
    // the B85 contract as a property, not an example: for ANY event
    // placement, per-fact FILLER choice (including negative — gaps
    // must take each fact's own value), and calendar step, the shared
    // per-type pipeline returns exactly the union of the single-fact
    // reads
    for (seed <- Seq(11, 12, 13)) {
      val rnd = new Random(seed)
      val svc = new TimeSeriesService(spark)
      val fillers = Seq("fa" -> 0L, "fb" -> (-1L - rnd.nextInt(5)))
      fillers.foreach { case (id, f) =>
        svc.defineFact(id, FactType.Counter, slice = 15, filler = f) }
      svc.defineDimension("dim", facts = fillers.map(_._1).toSet)
      val n = 40 + rnd.nextInt(40)
      val rows = (0 until n).map { _ =>
        val day = 1 + rnd.nextInt(3)
        (fillers(rnd.nextInt(2))._1,
          ts(f"2024-02-$day%02dT${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d"),
          1L + rnd.nextInt(5), "d" + rnd.nextInt(3))
      }
      svc.ingest(rows.toDF("fact", "ts", "value", "dim")
        .select(col("fact"), col("ts"), col("value"),
          map(lit("dim"), col("dim")).as("categories")))
      val lo = ts("2024-02-01T00:00")
      val hi = ts("2024-02-04T00:00")
      for (step <- Seq(Step.NoStep, Step.Hour, Step.Day)) {
        val multi = svc.getTimeseriesMulti(fillers.map(_._1), "dim",
            Map("dim" -> None), lo, hi, step)
          .collect()
          .map(r => (r.getString(0), r.getString(1),
            Option(r.get(2)), r.getLong(3))).toSet
        val perFact = fillers.map(_._1).flatMap { id =>
          svc.getTimeseries(id, "dim", Map("dim" -> None), lo, hi, step)
            .collect()
            .map(r => (r.getString(0), id, Option(r.get(1)), r.getLong(2)))
        }.toSet
        assert(multi == perFact, s"seed=$seed step=$step")
      }
    }
  }
}
