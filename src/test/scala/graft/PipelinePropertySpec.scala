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
}
