package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — remove training documents that overlap
  * an evaluation/benchmark corpus, the standard pre-training hygiene
  * step (flag any training doc sharing word k-grams with an eval set,
  * then drop it so the model is never trained on test data).
  *
  * Scale design (100 TB posture): the eval corpus is SMALL relative to
  * the training corpus (benchmarks are MBs; training data is TBs), so
  * the eval side is reduced to its DISTINCT shingle hashes and
  * broadcast — the training scan then stays embarrassingly parallel:
  * shingling is row-local ([[Dedup.shingleStrings]] + md5, no raw-text
  * shuffle), the membership probe is a broadcast hash join (0 shuffle),
  * and the per-doc hit count is one map-side-combined aggregation on
  * `id`. Total: one small shuffle to distinct the eval shingles + one
  * shuffle of (id, count) partials — the 100 TB side is never
  * re-partitioned. If the eval corpus ever outgrows broadcast range,
  * the same plan degrades gracefully: AQE picks a shuffled hash join,
  * still keyed on compact 60-bit hashes rather than text.
  *
  * Exactness: matching is on md5-derived 60-bit shingle hashes (the
  * corpus-wide deterministic hashing shared by every dedup operator),
  * so results are reproducible across clusters and recomputable by the
  * SQL oracle. Shingles are distinct per doc at source
  * ([[Dedup.shingles]] semantics), so `count(*)` after the join IS the
  * distinct-overlap count.
  */
object Decontaminate {

  /** Per-document contamination report: `(id, hits)` for every
    * training doc sharing at least `minHits` distinct word k-shingles
    * with the eval corpus. Docs with no overlap are absent.
    *
    * @param train training documents (the 100 TB side)
    * @param evalDocs evaluation/benchmark documents (the broadcast side)
    * @param minHits minimum distinct shared shingles to flag (1 =
    *   GPT-3-style any-collision flagging; raise it to tolerate
    *   boilerplate n-grams shared by chance)
    */
  def overlapReport(train: DataFrame, evalDocs: DataFrame,
      textCol: String, idCol: String, k: Int = 3,
      minHits: Long = 1L): DataFrame = {
    val trainEx = Dedup.shingleHashKernel(train, textCol, idCol, k)
      .select(col("id"), explode(col("hs")).as("sh"))
    val evalSh = Dedup.shingleHashKernel(evalDocs, textCol, idCol, k)
      .select(explode(col("hs")).as("sh"))
      .distinct()
    trainEx
      .join(broadcast(evalSh), "sh")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("hits"))
      .where(col("hits") >= minHits)
  }

  /** Bloom-prefiltered contamination report — IDENTICAL output to
    * [[overlapReport]], different scale regime. [[overlapReport]]
    * broadcasts the eval shingle set exactly; once eval suites grow to
    * ~10⁸ distinct shingles that broadcast is ~1 GB of longs per
    * executor. Here the eval set is compressed into one of Spark's own
    * Bloom filters (~10 bits/element at fpp=1% — 60× smaller), and the
    * 100 TB training scan is gated by a row-local, codegen'd
    * `might_contain` probe BEFORE any join: only true overlaps plus
    * the fpp-sized sliver of false positives ever leave their input
    * partitions. Survivors are then verified EXACTLY against the real
    * shingle set (AQE sizes that join — the survivor side is tiny), so
    * false positives cannot reach the report and the result is
    * bit-equal to the exact operator; the shared oracle pins it.
    *
    * Driver-side cost: one scalar count over the SMALL side (sizing)
    * and one collected Bloom filter (`nBits/8` bytes, bounded by
    * construction).
    */
  def bloomOverlapReport(train: DataFrame, evalDocs: DataFrame,
      textCol: String, idCol: String, k: Int = 3, minHits: Long = 1L,
      fpp: Double = 0.01): DataFrame = {
    import graft.functions.BloomProbe
    graft.functions.GraftFunctions.register(train.sparkSession)
    // materialize the eval shingle set ONCE (eager local checkpoint):
    // sizing count, Bloom aggregate, and the exact verify join all
    // reuse it — without this the shingling+distinct runs three times
    // (the streaming twin persists to parquet for the same reason)
    val evalSh = Dedup.shingleHashKernel(evalDocs, textCol, idCol, k)
      .select(explode(col("hs")).as("sh"))
      .distinct()
      .localCheckpoint(true)
    val nItems = math.max(evalSh.count(), 1L)
    val bfRow = evalSh
      .agg(BloomProbe.bloomAgg(xxhash64(col("sh")), nItems,
        BloomProbe.bitsFor(nItems, fpp)).as("bf"))
      .head
    val trainEx = Dedup.shingleHashKernel(train, textCol, idCol, k)
      .select(col("id"), explode(col("hs")).as("sh"))
    if (bfRow.isNullAt(0)) {
      // empty eval corpus → nothing can overlap
      trainEx.select(col("id"), lit(0L).as("hits")).where(lit(false))
    } else {
      val bf = lit(bfRow.getAs[Array[Byte]]("bf"))
      trainEx
        .where(BloomProbe.mightContain(bf, xxhash64(col("sh"))))
        .join(evalSh, "sh") // exact verify — survivors only, AQE-sized
        .groupBy(col("id"))
        .agg(count(lit(1)).as("hits"))
        .where(col("hits") >= minHits)
    }
  }

  /** The clean view: `train` with contaminated docs removed (broadcast
    * anti-join against the report's id set — the report is bounded by
    * the eval corpus's reach, far smaller than the training corpus). */
  def clean(train: DataFrame, evalDocs: DataFrame,
      textCol: String, idCol: String, k: Int = 3,
      minHits: Long = 1L): DataFrame = {
    val contaminated =
      overlapReport(train, evalDocs, textCol, idCol, k, minHits)
        .select(col("id"))
    train.join(broadcast(contaminated),
      train(idCol) === contaminated("id"), "left_anti")
  }
}
