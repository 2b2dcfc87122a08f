package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{Decontaminate, Dedup, Multimodal, Packing, Sampling}

/** Seeded-random property tests for the round-3 pipeline operators —
  * same style as [[PropertySpec]]: properties that must hold for ANY
  * input, checked over several seeds.
  *
  *  1. Wav codec: decode∘encode is the identity for arbitrary
  *     geometry/samples, and survives unknown-chunk injection;
  *  2. Packing: the distributed prefix sum equals the sequential scan
  *     for any token distribution and partition count, windows are
  *     capacity-bounded, and profile totals conserve tokens;
  *  3. Stratified sampling: samples are nested across rates, and a
  *     uniform rate map degenerates to hashSample;
  *  4. Decontamination: a train doc identical to an eval doc is always
  *     flagged with hits = its distinct shingle count, and
  *     report/clean partition the training set.
  */
class PipelinePropertySpec extends SparkTestBase {
  import spark.implicits._

  test("wav: decode∘encode is the identity; unknown chunks are skipped") {
    for (seed <- Seq(11, 12, 13)) {
      val rnd = new Random(seed)
      val rate = 1 + rnd.nextInt(96000)
      val channels = 1 + rnd.nextInt(4)
      val frames = rnd.nextInt(500)
      val samples = Array.fill(frames * channels)(
        (rnd.nextInt(65536) - 32768).toShort)
      val bytes = Multimodal.Wav.encode(rate, channels, samples)
      val back = Multimodal.Wav.decode(bytes)
      assert(back.sampleRate == rate && back.channels == channels,
        s"seed $seed")
      assert(back.samples.toSeq == samples.toSeq, s"seed $seed")
      // inject a junk chunk (odd size → pad byte) between fmt and data
      val sz = 1 + rnd.nextInt(7)
      val junk = "JUNK".getBytes("US-ASCII") ++
        Array[Byte](sz.toByte, 0, 0, 0) ++
        Array.fill[Byte](sz + (sz & 1))(rnd.nextInt(256).toByte)
      val injected = bytes.take(36) ++ junk ++ bytes.drop(36)
      assert(Multimodal.Wav.decode(injected).samples.toSeq == samples.toSeq,
        s"seed $seed junk")
    }
  }

  test("packing: distributed == sequential for any tokens and partitioning") {
    for (seed <- Seq(21, 22)) {
      val rnd = new Random(seed)
      val n = 200 + rnd.nextInt(800)
      val capacity = 64L + rnd.nextInt(4000)
      val toks = (0 until n).map(i => (i.toLong, rnd.nextInt(300).toLong))
      val df = toks.toDF("doc_id", "nt")
      val p = 1 + rnd.nextInt(40)
      val got = Packing.packSequences(df, "doc_id", "nt", capacity, p)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      var off = 0L
      toks.foreach { case (id, t) =>
        assert(got(id) == ((off, off / capacity, off % capacity)),
          s"seed $seed doc $id")
        off += t
      }
      // profile conserves tokens and counts every doc exactly once
      val prof = Packing.packProfile(
        Packing.packSequences(df, "doc_id", "nt", capacity, p))
        .agg(sum("n_docs"), sum("n_tokens")).head()
      assert(prof.getLong(0) == n && prof.getLong(1) == toks.map(_._2).sum,
        s"seed $seed profile")
    }
  }

  test("stratified: nested across rates; uniform map == hashSample") {
    val rnd = new Random(31)
    val rows = (0L until 1500L).map(i =>
      (i, Seq("a", "b", "c")(rnd.nextInt(3)))).toDF("id", "lang")
    for (lo <- Seq(500, 2000); hi <- Seq(4000, 9000)) {
      val small = Sampling.stratifiedSample(rows, "id", "lang",
        Map("a" -> lo, "b" -> lo), defaultE4 = lo)
        .collect().map(_.getLong(0)).toSet
      val big = Sampling.stratifiedSample(rows, "id", "lang",
        Map("a" -> hi, "b" -> hi), defaultE4 = hi)
        .collect().map(_.getLong(0)).toSet
      assert(small.subsetOf(big), s"$lo $hi")
    }
    val uniform = Sampling.stratifiedSample(rows, "id", "lang",
      Map("a" -> 3000, "b" -> 3000, "c" -> 3000))
      .collect().map(_.getLong(0)).toSet
    val flat = Sampling.hashSample(rows, "id", keepE4 = 3000)
      .collect().map(_.getLong(0)).toSet
    assert(uniform == flat)
  }

  test("decontamination: verbatim eval copies are always fully flagged") {
    for (seed <- Seq(41, 42)) {
      val rnd = new Random(seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "eta", "theta", "iota", "kappa")
      def doc(): String =
        (0 until (3 + rnd.nextInt(12))).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      val train = (0L until 60L).map(i => (i, doc()))
      val evalDocs = rnd.shuffle(train).take(8)
        .map { case (id, t) => (1000L + id, t) } // verbatim copies
      val trainDf = train.toDF("doc_id", "text")
      val evalDf = evalDocs.toDF("doc_id", "text")
      val report = Decontaminate
        .overlapReport(trainDf, evalDf, "text", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      evalDocs.foreach { case (eid, t) =>
        val srcId = eid - 1000L
        val nShingles = Dedup.shingleStrings(t, 3).length.toLong
        assert(report.get(srcId).exists(_ >= nShingles),
          s"seed $seed doc $srcId: copied eval doc must be fully hit")
      }
      // clean ∪ flagged partitions the train set
      val kept = Decontaminate.clean(trainDf, evalDf, "text", "doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept.intersect(report.keySet).isEmpty, s"seed $seed disjoint")
      assert(kept ++ report.keySet == train.map(_._1).toSet,
        s"seed $seed partition")
    }
  }

  test("scrubbing is idempotent: normalizeWs, redact, and strip fixpoints") {
    import graft.operators.{Boilerplate, Pii, TextAnalysis}
    val charPool = "ab c\t\r\n\u0000\u0007 .@-+09xZ"
    for (seed <- Seq(31, 32, 33)) {
      val rnd = new Random(seed)
      val docs = (0L until 60L).map { i =>
        // random dirty text over a pool rich in controls/spaces, plus
        // injected boilerplate-ish shared lines for some docs
        val body = (0 until (1 + rnd.nextInt(40)))
          .map(_ => charPool(rnd.nextInt(charPool.length))).mkString
        val withBp = if (i % 2 == 0) s"SHARED HEAD\n$body" else body
        (i, withBp)
      }
      val df = docs.toDF("id", "t")

      // normalize twice ≡ once (the cleaner must not keep changing text)
      val once = df.select(col("id"),
        TextAnalysis.normalizeWs(col("t")).as("n"))
      val twice = once.select(col("id"),
        TextAnalysis.normalizeWs(col("n")).as("n"))
      assert(twice.except(once).count() == 0, s"seed $seed normalize")

      // redact twice ≡ once (tags contain no redactable substrings)
      val r1 = df.select(col("id"), Pii.redact(col("t")).as("r"))
      val r2 = r1.select(col("id"), Pii.redact(col("r")).as("r"))
      assert(r2.except(r1).count() == 0, s"seed $seed redact")

      // strip twice ≡ once on surviving docs: removing hot lines never
      // raises a surviving line's df, so a second pass at the same
      // minDf drops nothing further. (Fully-stripped docs are excluded:
      // their empty clean view introduces a NEW "" line that can become
      // hot — a real but documented edge, not an idempotence break on
      // actual content.)
      val s1 = Boilerplate.strip(df, "t", "id", minDf = 10L)
        .where(col("n_kept") > 0)
        .select(col("id"), col("clean_text"))
      val s2 = Boilerplate.strip(s1, "clean_text", "id", minDf = 10L)
        .select(col("id"), col("clean_text"))
      assert(s2.except(s1).count() == 0, s"seed $seed strip")
    }
  }

  test("capped sessions: distributed fold == sequential reference, any input") {
    import java.sql.Timestamp
    for (seed <- Seq(31, 32, 33)) {
      val rnd = new Random(seed)
      val gapMin = 1 + rnd.nextInt(120)
      val capMin = gapMin + rnd.nextInt(300)
      val base = 1700000000000L
      val rows = (0 until 400).map { _ =>
        val user = rnd.nextInt(8).toLong
        // second-ish steps with occasional exact boundary collisions
        val t = base + rnd.nextInt(500000).toLong * 1000L
        (user, new Timestamp(t))
      }
      // sequential reference: per user, sort, greedy strict-split fold
      val expect = rows.groupBy(_._1).flatMap { case (u, rs) =>
        val ts = rs.map(_._2.getTime * 1000L).sorted
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Long)]
        var start = ts.head; var prev = ts.head; var n = 1L
        ts.tail.foreach { t =>
          if (t - prev > gapMin * 60000000L || t - start > capMin * 60000000L) {
            out += ((u, start, prev, n)); start = t; n = 0L
          }
          prev = t; n += 1L
        }
        out += ((u, start, prev, n))
        out
      }.toSet
      val got = graft.operators.Sessions.cappedSessions(
          rows.toDF("user_id", "ts").repartition(1 + rnd.nextInt(7)),
          "user_id", "ts", gapMin, capMin)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000L,
          r.getTimestamp(2).getTime * 1000L, r.getLong(3))).toSet
      assert(got == expect, s"seed $seed gap=$gapMin cap=$capMin")
    }
  }

  test("join-size estimate: >= exact and within depth*width bound, any input") {
    import graft.operators.Profiling
    for (seed <- Seq(41, 42)) {
      val rnd = new Random(seed)
      val a = (0 until 300).map(_ => Tuple1(rnd.nextInt(40).toLong))
        .toDF("k")
      val b = (0 until 300).map(_ => Tuple1(rnd.nextInt(60).toLong))
        .toDF("k")
      val r = Profiling.joinSizeEstimate(a, "k", b, "k",
        depth = 3, width = 64).head
      val est = r.getDecimal(0).longValueExact
      val exact = r.getDecimal(1).longValueExact
      assert(est >= exact, s"seed $seed: est $est < exact $exact")
      // disjoint key spaces: exact 0, estimate only collision mass
      val c = (0 until 100).map(i => Tuple1(1000000L + i)).toDF("k")
      val r2 = Profiling.joinSizeEstimate(a, "k", c, "k",
        depth = 3, width = 64).head
      assert(r2.getDecimal(1).longValueExact == 0L, s"seed $seed disjoint")
      assert(r2.getDecimal(0).longValueExact >= 0L, s"seed $seed est>=0")
    }
  }

  test("curriculum: stage-major permutation for any stage assignment") {
    for (seed <- Seq(51, 52)) {
      val rnd = new Random(seed)
      val n = 150
      val rows = (0 until n).map(i => (i.toLong, rnd.nextInt(8).toLong))
      val got = graft.operators.Packing.curriculumPositions(
          rows.toDF("doc_id", "stage").repartition(1 + rnd.nextInt(5)),
          "doc_id", "stage", seed = seed)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.map(_._3).sorted.toSeq == (0L until n.toLong), s"seed $seed")
      val stageOf = rows.toMap
      assert(got.forall { case (id, st, _) => stageOf(id) == st }, s"seed $seed")
      val byPos = got.sortBy(_._3).map(_._2)
      assert(byPos.toSeq == byPos.sorted.toSeq, s"seed $seed stage-major")
    }
  }

  test("source overlap matrix == brute-force shingle sets, any input") {
    for (seed <- Seq(91, 92)) {
      val rnd = new Random(seed)
      val words = Array.tabulate(60)(i => s"w$i")
      val rows = (0 until 80).map { i =>
        (i.toLong, Seq.fill(3 + rnd.nextInt(12))(words(rnd.nextInt(60)))
          .mkString(" "), s"s${rnd.nextInt(4)}")
      }
      val maxDf = 1 + rnd.nextInt(6)
      // replica: per doc distinct 3-gram shingles, df cap, per-source
      // distinct sets, pairwise intersections
      val docSh = rows.map { case (id, t, src) =>
        (id, src, graft.operators.Dedup.shingleStrings(t, 3).toSet) }
      val df = docSh.flatMap(d => d._3.map(_ -> d._1)).groupBy(_._1)
        .map { case (sh, xs) => sh -> xs.map(_._2).toSet.size }
      val kept = docSh.map { case (id, src, sh) =>
        (src, sh.filter(df(_) <= maxDf)) }
      val bySrc = kept.groupBy(_._1).map { case (s, xs) =>
        s -> xs.flatMap(_._2).toSet }
      val expect = bySrc.keys.toSeq.sorted.combinations(2).flatMap {
        case Seq(a, b) =>
          val common = (bySrc(a) & bySrc(b)).size.toLong
          if (common == 0) None
          else Some((a, b) -> (common, bySrc(a).size.toLong,
            bySrc(b).size.toLong))
      }.toMap
      val got = graft.operators.Dedup.sourceOverlapMatrix(
          rows.toDF("doc_id", "text", "source")
            .repartition(1 + rnd.nextInt(5)),
          "text", "doc_id", "source", maxDf)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(got == expect, s"seed $seed maxDf=$maxDf")
    }
  }

  test("entity resolution == brute-force union-find replica, any input") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = d(0); d(0) = j
        for (i <- 1 to a.length) {
          val t = d(i)
          d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      d(a.length)
    }
    for (seed <- Seq(81, 82)) {
      val rnd = new Random(seed)
      val words = Array("alpha", "bravo", "delta", "metal", "ridge")
      def value(): String = {
        val base = Seq.fill(2 + rnd.nextInt(2))(words(rnd.nextInt(5)))
          .mkString(" ")
        if (rnd.nextInt(3) == 0) { // one random substitution
          val i = rnd.nextInt(base.length)
          if (base(i) == ' ') base else base.updated(i, 'z')
        } else base
      }
      val rows = (0 until 120).map(i => (i.toLong, value()))
      // replica: distinct values, all-pairs lev<=1, union-find by
      // min record id (multi-token values: token blocking is
      // recall-complete for 1-edit pairs, so operator == replica)
      val vals = rows.groupBy(_._2).map { case (v, rs) =>
        v -> rs.map(_._1).min }.toSeq
      val parent = scala.collection.mutable.Map(vals.map(v => v._2 -> v._2): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      for (Seq((va, ia), (vb, ib)) <- vals.combinations(2))
        if (lev(va, vb) <= 1) {
          val (ra, rb) = (find(ia), find(ib))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
      val valEnt = vals.map { case (v, i) => v -> find(i) }.toMap
      val expect = rows.map { case (id, v) => id -> valEnt(v) }.toMap
      val got = graft.operators.EntityResolution.entities(
          rows.toDF("id", "name").repartition(1 + rnd.nextInt(5)),
          "id", "name", maxDist = 1, maxTokenDf = 10000)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == expect, s"seed $seed")
    }
  }

  test("next-event examples == sequential per-user replica, any partitioning") {
    import java.sql.Timestamp
    for (seed <- Seq(61, 62)) {
      val rnd = new Random(seed)
      val types = Array("a", "b", "c")
      val base = 1700000000000L
      val rows = (0 until 300).map { i =>
        (i.toLong, rnd.nextInt(6).toLong,
          // duplicate timestamps on purpose — id must break the tie
          new Timestamp(base + rnd.nextInt(200).toLong * 1000L),
          types(rnd.nextInt(3)))
      }
      val k = 1 + rnd.nextInt(4)
      val expect = rows.groupBy(_._2).flatMap { case (_, rs) =>
        val s = rs.sortBy(r => (r._3.getTime, r._1))
        s.zipWithIndex.drop(1).map { case ((id, u, ts, tp), i) =>
          val prefix = s.slice(math.max(0, i - k), i).map(_._4).mkString(" ")
          val gap = (ts.getTime - s(i - 1)._3.getTime) * 1000L
          (id, u, prefix, gap, tp)
        }
      }.toSet
      val got = graft.operators.Sessions.nextEventExamples(
          rows.toDF("event_id", "user_id", "ts", "event_type")
            .repartition(1 + rnd.nextInt(5)),
          "user_id", "ts", "event_type", "event_id", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getString(4))).toSet
      assert(got == expect, s"seed $seed k=$k")
    }
  }
}
