package graft

import org.apache.spark.sql.functions._

import graft.operators.Decontaminate

/** Benchmark-decontamination semantics on a tiny corpus with known
  * shingle overlaps. */
class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  // eval doc 100 shares its only 3-gram run with train doc 1 (7 of 7
  // shingles) and exactly one 3-gram with train doc 2; doc 3 shares
  // nothing with the eval corpus
  private val train = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a story about the lazy dog sleeping all day"),
    (3L, "completely unrelated words appear here today friends"))
    .toDF("doc_id", "text")
  private val evalDocs = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"))
    .toDF("doc_id", "text")

  test("overlapReport counts distinct shared shingles per training doc") {
    val got = Decontaminate.overlapReport(train, evalDocs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: identical text → all 7 shingles shared
    // doc 2: only "the lazy dog" is shared
    assert(got == Map(1L -> 7L, 2L -> 1L))
  }

  test("minHits raises the flagging bar") {
    val got = Decontaminate
      .overlapReport(train, evalDocs, "text", "doc_id", minHits = 2L)
      .collect().map(r => r.getLong(0)).toSet
    assert(got == Set(1L)) // doc 2's single boilerplate hit tolerated
  }

  test("clean drops contaminated docs and keeps the rest intact") {
    val kept = Decontaminate.clean(train, evalDocs, "text", "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L))
    val keptTolerant = Decontaminate
      .clean(train, evalDocs, "text", "doc_id", minHits = 2L)
      .collect().map(_.getLong(0)).toSet
    assert(keptTolerant == Set(2L, 3L))
  }

  test("bloomOverlapReport is bit-equal to the exact report") {
    val exact = Decontaminate.overlapReport(train, evalDocs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloomed = Decontaminate
      .bloomOverlapReport(train, evalDocs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloomed == exact)
    // minHits composes the same way post-verify
    val strict = Decontaminate
      .bloomOverlapReport(train, evalDocs, "text", "doc_id", minHits = 2L)
      .collect().map(_.getLong(0)).toSet
    assert(strict == Set(1L))
  }

  test("bloomOverlapReport with an empty eval corpus reports nothing") {
    val empty = evalDocs.where(lit(false))
    val got = Decontaminate
      .bloomOverlapReport(train, empty, "text", "doc_id")
      .collect()
    assert(got.isEmpty)
  }

  test("bloom probe passes all members; false positives stay near fpp") {
    import graft.functions.BloomProbe
    graft.functions.GraftFunctions.register(spark)
    val members = spark.range(0, 2000)
      .select(xxhash64(col("id")).as("h"))
    val bf = members
      .agg(BloomProbe.bloomAgg(col("h"), 2000L,
        BloomProbe.bitsFor(2000L, 0.01)).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val probe = spark.range(0, 12000)
      .select(col("id"),
        BloomProbe.mightContain(lit(bf), xxhash64(col("id"))).as("m"))
    // no false negatives, ever
    assert(probe.where(col("id") < 2000 && !col("m")).count() == 0L)
    // false-positive rate on 10k non-members ~1%; allow generous slack
    val fp = probe.where(col("id") >= 2000 && col("m")).count()
    assert(fp < 500L, s"false positives $fp/10000 far above target 1%")
  }

  test("short docs fall back to whole-doc shingles and still match") {
    val t = Seq((1L, "ab"), (2L, "cd")).toDF("doc_id", "text")
    val e = Seq((9L, "ab")).toDF("doc_id", "text")
    val got = Decontaminate.overlapReport(t, e, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L))
  }
}
