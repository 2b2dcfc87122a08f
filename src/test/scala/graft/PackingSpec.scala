package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Sequence-packing semantics: exclusive prefix offsets, window
  * assignment, and independence from the partition count (the
  * distributed prefix sum must equal the sequential one). */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, 600L), (2L, 600L), (3L, 600L), (4L, 1000L), (5L, 10L))
    .toDF("doc_id", "n_tokens")

  test("offsets are the exclusive prefix sum in id order") {
    val got = Packing.packSequences(docs, "doc_id", "n_tokens", 1024L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) == ((600L, 0L, 0L, 0L)))
    assert(got(2L) == ((600L, 600L, 0L, 600L)))
    assert(got(3L) == ((600L, 1200L, 1L, 176L)))
    assert(got(4L) == ((1000L, 1800L, 1L, 776L)))
    assert(got(5L) == ((10L, 2800L, 2L, 752L)))
  }

  test("partition count changes nothing") {
    val p1 = Packing.packSequences(docs, "doc_id", "n_tokens", 1024L,
      partitions = 1).collect().map(_.toSeq).toSet
    val p7 = Packing.packSequences(docs, "doc_id", "n_tokens", 1024L,
      partitions = 7).collect().map(_.toSeq).toSet
    assert(p1 == p7)
  }

  test("packProfile counts docs and tokens per window") {
    val prof = Packing.packProfile(
      Packing.packSequences(docs, "doc_id", "n_tokens", 1024L))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(prof == Map(0L -> ((2L, 1200L)), 1L -> ((2L, 1600L)),
      2L -> ((1L, 10L))))
  }

  test("coalesce(1) on the output cannot reseed partitions") {
    // Verify writes with coalesce(1), which merges every upstream
    // partition into ONE task: a TaskContext-based partition id would
    // collapse to 0 there and restart the running sum per merged
    // partition. mapPartitionsWithIndex must keep the RDD's own ids.
    val got = Packing.packSequences(docs, "doc_id", "n_tokens", 1024L,
      partitions = 5)
      .coalesce(1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 600L, 3L -> 1200L, 4L -> 1800L,
      5L -> 2800L))
  }

  test("packing leaves no cached storage behind") {
    // both passes share one RDD (shuffle-stage reuse), so nothing is
    // ever persisted: a reintroduced .cache() without an unpersist
    // would accumulate corpus-sized storage in a long-lived session
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Packing.packSequences(docs, "doc_id", "n_tokens", 1024L).count()
    Packing.packSequencesByGroup(
      Seq(("a", 1L, 10L), ("b", 2L, 20L)).toDF("grp", "doc_id", "n_tokens"),
      "grp", "doc_id", "n_tokens", 1024L).count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"packing persisted RDDs: $leaked")
  }

  test("shufflePositions is a deterministic permutation") {
    val ids = (0L until 200L).map(Tuple1(_)).toDF("doc_id")
    val a = Packing.shufflePositions(ids, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a permutation: positions are exactly 0..n-1
    assert(a.values.toSeq.sorted == (0L until 200L))
    // partition-count independent (the prefix-sum guarantee)
    val b = Packing.shufflePositions(ids.repartition(7), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // a different seed is a different permutation
    val c = Packing.shufflePositions(ids, "doc_id", seed = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c != a && c.values.toSeq.sorted == (0L until 200L))
    // and it is genuinely shuffled, not id order
    assert(a.toSeq.sortBy(_._1).map(_._2) != (0L until 200L))
  }

  test("curriculumPositions: stage-major permutation, shuffled within stage") {
    val rows = (0L until 200L).map(i => (i, i % 4)).toDF("doc_id", "stage")
    val a = Packing.curriculumPositions(rows, "doc_id", "stage")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // a permutation: positions are exactly 0..n-1
    assert(a.map(_._3).sorted.toSeq == (0L until 200L))
    // stage is carried through unchanged
    assert(a.forall { case (id, st, _) => st == id % 4 })
    // stages are consumed in order: position sequence is stage-sorted
    val byPos = a.sortBy(_._3).map(_._2)
    assert(byPos.toSeq == byPos.sorted.toSeq)
    // within a stage the order is the seeded shuffle, not id order
    val stage0 = a.filter(_._2 == 0L).sortBy(_._3).map(_._1)
    assert(stage0.toSeq != stage0.sorted.toSeq)
    // partition-count independent
    val b = Packing.curriculumPositions(rows.repartition(7), "doc_id", "stage")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.toSet == b.toSet)
    // contract: stage out of range raises instead of silently reordering
    val bad = Seq((1L, 8L)).toDF("doc_id", "stage")
    val e = intercept[Exception](
      Packing.curriculumPositions(bad, "doc_id", "stage").collect())
    assert(e.getMessage.contains("stage"))
  }

  test("packSequencesByGroup == independent packSequences per group") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 600L).map(i =>
      (Seq("train", "val", "test")(rnd.nextInt(3)), i, rnd.nextInt(200).toLong))
      .toDF("split", "doc_id", "nt")
    val grouped = Packing.packSequencesByGroup(rows, "split", "doc_id",
      "nt", 1024L, partitions = 7)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    for (g <- Seq("train", "val", "test")) {
      val solo = Packing.packSequences(
        rows.where(col("split") === g), "doc_id", "nt", 1024L, 3)
        .collect()
        .map(r => (g, r.getLong(0)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      solo.foreach { case (k, v) =>
        assert(grouped(k) == v, s"$k grouped=${grouped(k)} solo=$v")
      }
    }
  }

  test("chunkDocuments: overlapping windows, deterministic ids, short tails") {
    val d = Seq((1L, "a b c d e f g"), (2L, "x y")).toDF("doc_id", "text")
    val got = Packing.chunkDocuments(d, "text", "doc_id",
      window = 4, stride = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3)))
      .toMap
    assert(got == Map(
      (1L, 0L) -> (("a b c d", 4L)), (1L, 1L) -> (("c d e f", 4L)),
      (1L, 2L) -> (("e f g", 3L)), (1L, 3L) -> (("g", 1L)),
      (2L, 0L) -> (("x y", 2L))))
    // non-overlapping stride == window partitions the token stream
    val parts = Packing.chunkDocuments(d, "text", "doc_id", 3, 3)
      .agg(sum("n_tokens")).head().getLong(0)
    assert(parts == 9L) // 7 + 2 tokens, each exactly once
  }

  test("a large synthetic corpus matches the sequential closed form") {
    val n = 5000
    val big = (1 to n).map(i => (i.toLong, (i % 97 + 1).toLong))
      .toDF("doc_id", "n_tokens")
    val got = Packing.packSequences(big, "doc_id", "n_tokens", 2048L,
      partitions = 13)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    var off = 0L
    (1 to n).foreach { i =>
      assert(got(i.toLong) == off, s"doc $i")
      off += i % 97 + 1
    }
  }

  test("fim: prefix+middle+suffix reassembles the doc; cuts deterministic") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 50).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(40))("w" + rnd.nextInt(30))
        .mkString(" "))
    }
    val byId = rows.toMap
    def run(parts: Int) = Packing.fimExamples(
        rows.toDF("doc_id", "text").repartition(parts), "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4)))
      .toMap
    val got = run(3)
    got.foreach { case (id, (p, m, sfx, psm)) =>
      val rebuilt = Seq(p, m, sfx).filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == byId(id).trim, s"doc $id reassembly")
      assert(psm == s"<PRE> $p <SUF> $sfx <MID> $m", s"doc $id psm")
    }
    // pure function of (doc_id, text): partitioning cannot move cuts
    assert(run(7) == got)
    // the cuts actually vary across docs (not degenerate)
    assert(got.values.map(_._2).count(_.nonEmpty) > 10)
  }

  test("span corruption: splicing targets into input reconstructs the doc") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 40).map { i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(60))("w" + rnd.nextInt(50))
        .mkString(" "))
    }
    val byId = rows.toMap
    val got = Packing.spanCorruptionExamples(
        rows.toDF("doc_id", "text").repartition(3), "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(got.length == rows.length)
    got.foreach { case (id, input, targets, nSpans) =>
      // parse targets into sentinel -> span tokens
      val spans = if (targets.isEmpty) Map.empty[String, Seq[String]]
        else targets.split("<X").drop(1).map { seg =>
          val Array(k, rest) = seg.split(">", 2)
          s"<X$k>" -> rest.trim.split("\\s+").toSeq
        }.toMap
      assert(spans.size == nSpans, s"doc $id: ${spans.size} vs $nSpans")
      val rebuilt = input.split("\\s+").flatMap { t =>
        if (t.startsWith("<X")) spans(t) else Seq(t)
      }.mkString(" ")
      assert(rebuilt == byId(id).trim, s"doc $id round trip")
    }
    // selection rate lands near (span/block)/selectMod = 12.5%
    val totTok = rows.map(_._2.split("\\s+").length).sum
    val corrTok = got.map { case (id, _, targets, n) =>
      if (targets.isEmpty) 0
      else targets.split("\\s+").length - n.toInt }.sum
    val rate = corrTok.toDouble / totTok
    assert(rate > 0.04 && rate < 0.25, s"corruption rate $rate")
  }
}
