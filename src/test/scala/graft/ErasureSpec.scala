package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Profiling, Similarity, TextAnalysis}

/** Right-to-erasure on the DERIVED serving stores (the retrieval
  * plane's extension of the event store's B21b contract): tombstones
  * exclude immediately from every serve, compaction physically closes,
  * batch replays can never resurrect, and repeat/unknown erasures are
  * exact no-ops. */
class ErasureSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val docs = Seq(
    (1L, "spark shuffles data between stages"),
    (2L, "spark broadcasts small tables"),
    (3L, "the optimizer prunes parquet partitions"),
    (4L, "spark spark spark everywhere spark"),
    (5L, "partitions and stages and shuffles")).toDF("doc_id", "text")

  private val bmQueries = Seq(
    "q1" -> Seq("spark", "partitions"),
    "q2" -> Seq("shuffles", "stages"))

  private def buildIdx(d: DataFrame): String = {
    val p = tmp("erase_idx")
    TextAnalysis.buildTextIndex(d, "text", "doc_id", p, nBuckets = 8)
    p
  }

  private def bm25(path: String): Seq[(String, Long, Long)] =
    TextAnalysis.bm25TopKFromIndex(spark, path, bmQueries, topK = 5)
      .select(col("query_id"), col("rk"), col("id").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(t => (t._1, t._2))

  test("erased serve == rebuild-without-the-doc, exactly (stats included)") {
    val idx = buildIdx(docs)
    assert(TextAnalysis.eraseFromTextIndex(spark, idx, Seq("4")) == 1L)
    // doc 4 spams 'spark' — its erasure moves df('spark'), n_docs and
    // sum_dl, so scores only match if the stats subtraction is exact
    val rebuilt = buildIdx(docs.where(col("doc_id") =!= 4))
    assert(bm25(idx) == bm25(rebuilt))
    assert(!bm25(idx).exists(_._3 == 4L))
  }

  test("phrase, proximity, top-terms and drift all exclude the subject") {
    val idx = buildIdx(docs)
    TextAnalysis.eraseFromTextIndex(spark, idx, Seq("4"))
    val ph = TextAnalysis.phraseHitsFromIndex(spark, idx,
      Seq("spark spark")).select(col("id").cast("long"))
      .collect().map(_.getLong(0))
    assert(ph.isEmpty) // only doc 4 repeats 'spark spark'
    val prox = TextAnalysis.proximityHitsFromIndex(spark, idx,
      "spark", "everywhere", slop = 2)
      .select(col("id").cast("long")).collect().map(_.getLong(0))
    assert(prox.isEmpty)
    val top = TextAnalysis.topTermsFromIndex(spark, idx, 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // doc 4's five 'spark's are gone: 2 left (docs 1, 2)
    assert(!top.headOption.contains(("spark", 7L)))
    assert(TextAnalysis.topTermsFromIndex(spark, idx, 100)
      .where(col("token") === "spark").head().getLong(1) == 2L)
    // the tombstone is logical until compaction: bytes still on disk
    assert(spark.read.parquet(s"$idx/postings")
      .where(col("id") === 4L).count() > 0)
  }

  test("token drift from an erased index drops the subject's counts") {
    val idx = buildIdx(docs.where(col("doc_id") <= 3))
    TextAnalysis.appendToTextIndex(docs.where(col("doc_id") >= 4),
      "text", "doc_id", idx)
    TextAnalysis.eraseFromTextIndex(spark, idx, Seq("4"))
    val drift = Profiling.tokenDriftFromIndex(spark, idx,
        batchesA = Seq(0L), batchesB = Seq(1L), k = 100)
      .where(col("token") === "spark")
    // batch 1 minus doc 4 has zero 'spark' rows left — the monitor
    // must not keep counting a deletion request's tokens
    assert(drift.select(col("cnt_b")).collect()
      .forall(r => r.isNullAt(0) || r.getLong(0) == 0L))
  }

  test("replaying the batch does not resurrect the erased doc") {
    val idx = buildIdx(docs)
    TextAnalysis.eraseFromTextIndex(spark, idx, Seq("2"))
    val served = bm25(idx)
    assert(!served.exists(_._3 == 2L))
    // a redelivered batch overwrites its own __batch_id dirs — the
    // tombstone sidecar lives outside that namespace and survives
    TextAnalysis.writePostingsBatch(docs, "text", "doc_id", idx,
      nBuckets = 8, batchId = 0L)
    assert(bm25(idx) == served)
  }

  test("repeat and unknown erasures are exact no-ops") {
    val idx = buildIdx(docs)
    assert(TextAnalysis.eraseFromTextIndex(spark, idx, Seq("3")) == 1L)
    val once = bm25(idx)
    // repeat: already tombstoned — never double-subtracts stats
    assert(TextAnalysis.eraseFromTextIndex(spark, idx, Seq("3")) == 0L)
    assert(bm25(idx) == once)
    // unknown id: 0-count no-op, serving unchanged
    assert(TextAnalysis.eraseFromTextIndex(spark, idx, Seq("99")) == 0L)
    assert(bm25(idx) == once)
  }

  test("compaction physically closes: no tombstones, same serve, bytes gone") {
    val idx = buildIdx(docs)
    TextAnalysis.eraseFromTextIndex(spark, idx, Seq("4"))
    val out = tmp("erase_closed")
    TextAnalysis.compactTextIndex(spark, idx, s"$out/idx")
    assert(bm25(s"$out/idx") == bm25(idx))
    assert(!new java.io.File(s"$out/idx/tombstones").exists())
    assert(spark.read.parquet(s"$out/idx/postings")
      .where(col("id") === 4L).count() == 0L)
    // the collapsed stats row absorbed the subtraction
    val st = spark.read.parquet(s"$out/idx/stats").head()
    assert(st.getAs[Long]("n_docs") == 4L)
  }

  // ----------------------------------------------------- vector plane

  private val vecs = Seq(
    (0L, Seq(1.0f, 0.0f), 0),
    (1L, Seq(0.9f, 0.1f), 0),
    (2L, Seq(0.8f, 0.2f), 0),
    (3L, Seq(0.0f, 1.0f), 1),
    (4L, Seq(0.1f, 0.9f), 1)).toDF("vec_id", "embedding", "label")

  private val index = Seq(
    (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("part", "centroid")

  private def buildStore(d: DataFrame): String = {
    val store = s"${tmp("erase_ivf")}/store"
    val assigned = Similarity.assignToCentroids(d, index, "vec_id",
      "embedding")
    Similarity.writeIvfCorpus(d, assigned, "vec_id", store)
    store
  }

  private def serve(store: String): Seq[(Long, Long, Int)] =
    Similarity.ivfTopKFromStore(store, index,
      vecs.where(col("vec_id") === 0L), "vec_id", "embedding",
      k = 3, nProbe = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSeq.sortBy(_._3)

  test("erased vectors never rank; deeper survivors take their place") {
    val store = buildStore(vecs)
    val before = serve(store)
    assert(before.map(_._2).contains(1L))
    assert(Similarity.eraseFromIvfStore(spark, store, "vec_id",
      Seq("1")) == 1L)
    // repeat-erase is 0 (found but already tombstoned) — the same
    // newly-erased semantics as eraseFromTextIndex, so summed returns
    // count each closure once
    assert(Similarity.eraseFromIvfStore(spark, store, "vec_id",
      Seq("1")) == 0L)
    val after = serve(store)
    assert(!after.map(_._2).contains(1L))
    // exclusion-then-rerank, not rank-then-filter: still k survivors
    assert(after.map(_._2).toSet == Set(2L, 3L, 4L))
  }

  test("erasure binds ids forever: a redelivering append stays excluded") {
    val store = buildStore(vecs)
    // the subject is tombstoned BEFORE its batch ever lands
    assert(Similarity.eraseFromIvfStore(spark, store, "vec_id",
      Seq("7")) == 0L)
    val late = Seq((7L, Seq(0.95f, 0.05f), 0)).toDF(
      "vec_id", "embedding", "label")
    Similarity.appendIvfCorpus(late, index, "vec_id", "embedding", store)
    assert(!serve(store).map(_._2).contains(7L))
  }

  test("the IVF-PQ ADC serve excludes erased vectors before the shortlist") {
    // m=1 subspace of dim 2, ks=2 codes: centers near the two axes, so
    // codes discriminate and the ADC shortlist is meaningful
    val codebook = Seq(Seq(Seq(1.0, 0.1), Seq(0.1, 1.0)))
    val store = s"${tmp("erase_pq")}/store"
    val assigned = Similarity.assignToCentroids(vecs, index, "vec_id",
      "embedding")
    Similarity.writeIvfPqCorpus(vecs, assigned, "vec_id", "embedding",
      codebook, store)
    def pq(): Seq[Long] = Similarity.ivfPqTopKFromStore(store, index,
        vecs.where(col("vec_id") === 0L), "vec_id", "embedding",
        codebook, k = 3, nProbe = 2, candidates = 4)
      .select(col("neighbor_id").cast("long"))
      .collect().map(_.getLong(0)).toSeq
    assert(pq().contains(1L))
    Similarity.eraseFromIvfStore(spark, store, "vec_id", Seq("1"))
    val after = pq()
    // excluded BEFORE the shortlist forms: a deeper survivor fills k,
    // and the rerank fetch cannot resurrect the subject
    assert(!after.contains(1L) && after.size == 3)
  }

  test("compactIvfStore closes: rows gone, layout kept, same serve") {
    val store = buildStore(vecs)
    Similarity.eraseFromIvfStore(spark, store, "vec_id", Seq("1"))
    val out = s"${tmp("erase_ivf_closed")}/store"
    Similarity.compactIvfStore(spark, store, out, "vec_id")
    assert(serve(out) == serve(store))
    // the sidecar is carried FORWARD (erasure binds ids forever, and
    // compaction must not dis-arm it against future appends) — but
    // none of its ids have physical rows in the output
    assert(new java.io.File(s"$out/__tombstones").exists())
    assert(spark.read.parquet(out).where(col("vec_id") === 1L).count() == 0L)
    // part= serving layout preserved (partition filters still prune)
    assert(new java.io.File(s"$out/part=0").exists())
  }

  test("compaction keeps forever-binding: redelivery after compact stays " +
      "excluded") {
    val store = buildStore(vecs)
    // subject tombstoned before its batch ever lands, then the store
    // is compacted — the carried sidecar must still exclude it when a
    // later append finally delivers the subject
    assert(Similarity.eraseFromIvfStore(spark, store, "vec_id",
      Seq("7")) == 0L)
    val out = s"${tmp("erase_ivf_rearm")}/store"
    Similarity.compactIvfStore(spark, store, out, "vec_id")
    val late = Seq((7L, Seq(0.95f, 0.05f), 0)).toDF(
      "vec_id", "embedding", "label")
    Similarity.appendIvfCorpus(late, index, "vec_id", "embedding", out)
    assert(spark.read.parquet(out).where(col("vec_id") === 7L).count() == 1L)
    assert(!serve(out).map(_._2).contains(7L))
  }
}
