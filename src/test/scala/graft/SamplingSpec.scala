package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val ids = (0L until 2000L).toDF("id")

  test("splits are total, deterministic, and roughly proportional") {
    val split = Sampling.splitColumn(col("id"),
      Seq("train" -> 9000, "val" -> 500, "test" -> 500))
    val counts = ids.withColumn("s", split).groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test")) // total: no nulls
    assert(counts.values.sum == 2000L)
    assert(counts("train") > 1600 && counts("train") < 1990)
    // same expression evaluated again → identical assignment
    val again = ids.withColumn("s", split).groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts)
  }

  test("shortfall fractions leave the remainder unassigned (null)") {
    val split = Sampling.splitColumn(col("id"), Seq("a" -> 5000))
    val n = ids.withColumn("s", split).where(col("s").isNull).count()
    assert(n > 0 && n < 2000)
  }

  test("stratifiedSample applies per-stratum rates and nests across rates") {
    val rows = (0L until 3000L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "fr" else "de"))
      .toDF("id", "lang")
    val kept = Sampling.stratifiedSample(rows, "id", "lang",
      Map("en" -> 2000, "fr" -> 8000))
    val counts = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // en downsampled hard, fr lightly, de kept whole (default 10000)
    assert(counts("de") == 1000L)
    assert(counts("en") > 100 && counts("en") < 320)
    assert(counts("fr") > 700 && counts("fr") < 900)
    assert(counts("en") < counts("fr"))
    // nested: every row surviving the lower rate survives a higher one
    val low = Sampling.stratifiedSample(rows, "id", "lang",
      Map("en" -> 1000), defaultE4 = 0)
      .collect().map(_.getLong(0)).toSet
    val high = Sampling.stratifiedSample(rows, "id", "lang",
      Map("en" -> 3000), defaultE4 = 0)
      .collect().map(_.getLong(0)).toSet
    assert(low.subsetOf(high))
    // zero rate drops the stratum entirely
    val none = Sampling.stratifiedSample(rows, "id", "lang",
      Map("en" -> 0), defaultE4 = 0)
    assert(none.count() == 0L)
  }

  test("hashSample is a deterministic subset consistent with the split hash") {
    val kept = Sampling.hashSample(ids.toDF(), "id", keepE4 = 2500)
      .collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty && kept.size < 2000)
    val again = Sampling.hashSample(ids.toDF(), "id", keepE4 = 2500)
      .collect().map(_.getLong(0)).toSet
    assert(again == kept)
    // monotone: a larger keep fraction strictly contains a smaller one
    val wider = Sampling.hashSample(ids.toDF(), "id", keepE4 = 5000)
      .collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(wider))
  }

  test("fractions over 10000 basis points are rejected") {
    intercept[IllegalArgumentException] {
      Sampling.splitColumn(col("id"), Seq("a" -> 9000, "b" -> 2000))
    }
  }

  test("splitByGroup: cluster members share a split; per-doc hashing would not") {
    import graft.operators.Dedup
    // 200 docs in 100 two-member clusters (component = even id)
    val docs = (0 until 200).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val pairs = (0 until 100).map(i => (2L * i, 2L * i + 1)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(docs.select(col("doc_id")), "doc_id",
      pairs, "id_a", "id_b")
    val split = Sampling.splitByGroup(docs, "doc_id", comp, "doc_id",
        "component", Seq("train" -> 8000, "val" -> 1000, "test" -> 1000))
      .select(col("doc_id"), col("split_group"), col("split"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(split.length == 200)
    // the invariant: one split per component, always
    val perComp = split.groupBy(_._2).map { case (_, rows) =>
      rows.map(_._3).distinct.size }
    assert(perComp.forall(_ == 1), "a cluster straddled splits")
    // and the hazard is REAL: per-doc hashing separates at least one
    // of these pairs (if it never did, the test would prove nothing)
    val perDoc = docs
      .withColumn("split", Sampling.splitColumn(col("doc_id"),
        Seq("train" -> 8000, "val" -> 1000, "test" -> 1000)))
      .collect().map(r => (r.getLong(0), r.getString(2)))
      .toMap
    val straddled = (0 until 100).count(i =>
      perDoc(2L * i) != perDoc(2L * i + 1))
    assert(straddled > 0, "fixture never exercised the leakage hazard")
  }

  test("mixByTemperatureSqrt: sqrt-law rates, smallest source kept whole") {
    // counts 100 / 400 / 900 → rates 10000 / 5000 / 3333 (exact sqrt
    // ratios: 1, 1/2, 1/3 floored at e4)
    val docs = ((0 until 100).map(i => (i.toLong, "small")) ++
      (0 until 400).map(i => (1000L + i, "mid")) ++
      (0 until 900).map(i => (10000L + i, "big")))
      .toDF("doc_id", "source")
    val (mixed, rates) = Sampling.mixByTemperatureSqrt(docs, "doc_id", "source")
    assert(rates == Map("small" -> 10000, "mid" -> 5000, "big" -> 3333),
      s"rates $rates")
    val kept = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // smallest source is untouched; others are real subsets near n·rate
    assert(kept("small") == 100L)
    assert(kept("mid") < 400L && kept("big") < 900L)
    // membership is the stratifiedSample hash: recompute one source
    val expectMid = docs.where(col("source") === "mid")
      .collect().map(_.getLong(0))
      .count(id => {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"42:$id".getBytes("UTF-8"))
        val hex = md.map("%02x".format(_)).mkString.take(15)
        java.lang.Long.parseLong(hex, 16) % 10000 < 5000
      })
    assert(kept("mid") == expectMid.toLong)
    // empty input → empty result, no rates
    val (e, er) = Sampling.mixByTemperatureSqrt(docs.limit(0), "doc_id", "source")
    assert(e.count() == 0L && er.isEmpty)
  }

  test("weightedTopK: keys match the closed form; w<=0 raises loudly") {
    import spark.implicits._
    val rows = Seq((1L, 10L), (2L, 1000L), (3L, 500L), (4L, 1L))
      .toDF("doc_id", "w")
    val got = Sampling.weightedTopK(rows, "doc_id", "w", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def key(id: Long, w: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"42:$id".getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.take(15), 16)
      math.floor(1e9 * (math.log((h + 1).toDouble / (1L << 60)) / w)).toLong
    }
    val all = Seq(1L -> 10L, 2L -> 1000L, 3L -> 500L, 4L -> 1L)
      .map { case (id, w) => id -> key(id, w) }
    val expect = all.sortBy { case (id, k) => (-k, id) }.take(2).toMap
    assert(got == expect, s"got $got expect $expect")
    // a zero weight must fail the job, not silently win/lose the cut
    val bad = rows.unionByName(Seq((5L, 0L)).toDF("doc_id", "w"))
    val err = intercept[Exception] {
      Sampling.weightedTopK(bad, "doc_id", "w", k = 2).collect()
    }
    assert(err.getMessage != null)
  }
}
