package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`) —
  * beyond-reference operators for the training-data-pipeline surface.
  *
  * Scale design (100 TB posture):
  *  - the dot product is a row-local expression over doubles (the
  *    unrolled variant stays inside whole-stage codegen — no UDF, no
  *    row conversion, no interpreted higher-order calls on hot paths);
  *  - brute-force top-k broadcasts the (small) query set against the
  *    corpus — one pass, no corpus shuffle, per-query k-selection via
  *    a window partitioned by query id (parallel across queries);
  *  - the IVF variant prunes the corpus to the partitions whose
  *    centroids are closest to each query: the corpus is bucketed once
  *    by partition key, candidate generation touches only
  *    `nProbe/nPartitions` of the data, and the centroid table is tiny
  *    (breadth × dim) so probe assignment is a broadcast join. With
  *    `nProbe = nPartitions` it degrades to exact brute force — which
  *    is the equivalence contract the tests pin.
  */
object Similarity {

  /** Double-precision dot product of two array<float/double> columns —
    * a sequential left fold, so the summation order is deterministic
    * (and matches DuckDB's list_dot_product over DOUBLE[]). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), _ * _),
      lit(0.0), _ + _)

  /** [[dot]] unrolled for a statically-known dimension: a flat
    * left-associated chain of `a[i]·b[i]` terms that stays inside
    * whole-stage codegen (higher-order array functions are
    * CodegenFallback), with the exact same sequential summation order.
    * Measured: wins in projections, but NOT in nested-loop join
    * conditions (per-element null checks dominate) — for quadratic
    * pair loops use [[nearDupPairsKernel]] instead. */
  def dotUnrolled(a: Column, b: Column, dim: Int): Column =
    (0 until dim).map { i =>
      element_at(a, i + 1).cast("double") * element_at(b, i + 1).cast("double")
    }.reduce(_ + _)

  /** Exact cosine top-k (embeddings are unit-norm ⇒ cosine = dot).
    *
    * @param corpus  (idCol, vecCol) rows to search
    * @param queries (idCol, vecCol) rows to search FOR — must be small
    *                (broadcast against the corpus)
    * @return (query_id, neighbor_id, rank) with rank 1..k by descending
    *         similarity, id-ascending tie-break, self excluded.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      dotFn: (Column, Column) => Column = dot): DataFrame = {
    val d = dotFn
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        d(col("qv"), col("cv")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** HYBRID retrieval rerank — the two-stage RAG/search pattern:
    * a cheap lexical recall stage (e.g. BM25 over the postings index)
    * produces a per-query candidate list; this stage reranks the
    * candidates by embedding cosine against the query's vector.
    * Precision of dense similarity at the cost of scoring only
    * |queries|·|candidates| pairs — the corpus's vectors are touched
    * ONLY for candidate ids (a semi-join-shaped probe into the
    * vector store), never scanned.
    *
    * Scale shape: query vectors broadcast (|queries| rows); the
    * candidate list is topN-bounded per query, so the vector join
    * input is small on one side and key-pruned on the other; one
    * window per query id for the final cut.
    *
    * @param candidates (queryIdCol, idCol, carried...) — stage-1 output
    * @param corpusVecs (idCol, vecCol) — the vector store
    * @param queryVecs  (queryIdCol, vecCol) — one vector per query
    * @return candidates' columns + `rank` (1..k by cosine desc, id) */
  def hybridRerank(candidates: DataFrame, corpusVecs: DataFrame,
      queryVecs: DataFrame, queryIdCol: String, idCol: String,
      vecCol: String, k: Int,
      dotFn: (Column, Column) => Column = dot): DataFrame = {
    val d = dotFn
    val q = queryVecs.select(col(queryIdCol), col(vecCol).as("__qv"))
    val c = corpusVecs.select(col(idCol), col(vecCol).as("__cv"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__sim").desc, col(idCol))
    candidates
      .join(c, Seq(idCol))
      .join(broadcast(q), Seq(queryIdCol))
      .withColumn("__sim", d(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .drop("__qv", "__cv", "__sim")
  }

  /** Read a persisted centroid index with its row bound made VISIBLE
    * IN-PLAN: a centroid table is k rows by construction, but a bare
    * parquet read of it is unbounded to any pre-execution audit
    * ([[graft.plans.PlanLint]]'s conditionless-broadcast rule, cost
    * estimators, humans reading the plan) — the no-op `limit`
    * annotates the contract where the plan can see it. `maxCentroids`
    * is a CEILING, not a truncation target: the default comfortably
    * exceeds any IVF breadth this engine builds. CAVEAT: a store that
    * somehow held MORE rows is mis-built, and this read would then
    * serve an arbitrary subset rather than failing — verifying costs
    * a count job per read, so do that check where stores are BUILT
    * (or pass a deliberately generous ceiling), not on the hot read
    * path. */
  def readCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String, maxCentroids: Int = 65536): DataFrame =
    spark.read.parquet(path).limit(maxCentroids)

  /** Per-DIMENSION embedding statistics — the calibration and
    * normalization profile a vector pipeline reads before it
    * quantizes or normalizes: count / sum / min / max / sum-of-squares
    * per vector position, enough for mean-centering, per-dimension
    * (asymmetric) quantization ranges, and dead/degenerate-dimension
    * detection (a position whose min = max carries no information and
    * wastes a byte in every quantized vector). One posexplode + one
    * map-side-combined aggregation; output is dim-sized regardless of
    * corpus size. Values are rounded to ×10⁶ integers FIRST so every
    * downstream sum is exact integer arithmetic (order-independent,
    * engine-independent — a float sum would hash differently per
    * partitioning); sums of squares run in decimal(38,0) so a
    * trillion-vector corpus cannot overflow. */
  def dimensionProfile(corpus: DataFrame, vecCol: String): DataFrame =
    corpus
      .select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("pos", "v")))
      .select(col("pos").cast("long").as("pos"),
        round(col("v") * 1000000d).cast("long").as("v_e6"))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n_vals"),
        sum(col("v_e6")).as("sum_e6"),
        min(col("v_e6")).as("min_e6"),
        max(col("v_e6")).as("max_e6"),
        sum((col("v_e6") * col("v_e6")).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("sumsq_e12"))

  /** Per-label embedding outliers — mislabeled-example detection, the
    * embedding-side data-quality scrub: for each label, the `k`
    * vectors farthest from the label's centroid. Distances are exact
    * integers: elements round to ×10⁶ first, and instead of a
    * fractional mean the score is the n²-scaled squared distance
    * `d2 = Σ_pos (n·x_e6 − s_e6)²` (s = per-label element sum, n =
    * label size) — identical ranking to true centroid distance within
    * a label, zero float drift across engines/partitionings. Summed in
    * decimal(38,0): safe while n·|x|·10⁶ stays under ~10¹⁸ (a
    * billion-vector label at unit scale — document-scale labels never
    * approach it).
    *
    * Scale shape: one posexplode aggregation builds the (label, pos)
    * sum table (labels × dim rows — tiny), which BROADCASTS back onto
    * the corpus; the per-vector score is then row-local higher-order
    * arithmetic (zip_with + aggregate, no second explode-shuffle), and
    * the only remaining exchange is the per-label top-k window.
    * Output: (`label`, `vec_id`, `d2` as decimal text), k rows per
    * label, ties broken by id. */
  def labelOutliers(corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int): DataFrame = {
    val base = corpus.select(
      col(idCol),
      col(labelCol).cast("long").as("label"),
      transform(col(vecCol).cast("array<double>"),
        x => round(x * 1000000d).cast("long")).as("xe6"))
    val sums = base
      .select(col("label"), posexplode(col("xe6")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("v")).as("s"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
        p => p.getField("s")).as("sarr"))
    val counts = base.groupBy(col("label")).agg(count(lit(1)).as("n"))
    val d2 = base
      .join(broadcast(sums), Seq("label"))
      .join(broadcast(counts), Seq("label"))
      .withColumn("d2",
        aggregate(
          zip_with(col("xe6"), col("sarr"), (x, s) => {
            val dlt = (col("n") * x - s).cast("decimal(38,0)")
            (dlt * dlt).cast("decimal(38,0)")
          }),
          lit(0).cast("decimal(38,0)"),
          (acc, y) => (acc + y).cast("decimal(38,0)")))
    val ranked = Window.partitionBy(col("label"))
      .orderBy(col("d2").desc, col(idCol).asc)
    d2.withColumn("__rk", row_number().over(ranked))
      .where(col("__rk") <= k)
      .select(col("label"), col(idCol), col("d2").cast("string").as("d2"))
  }

  /** Per-dimension embedding DRIFT between two cohorts (crawl
    * snapshots, label groups, time windows) — the embedding-side twin
    * of token drift: for each dimension, both cohorts' counts and
    * ×10⁶-rounded element sums, plus the cross-multiplied mean shift
    * `shift_x = sum_a·n_b − sum_b·n_a` (the sign/magnitude of
    * `mean_a − mean_b` scaled by the exact positive factor n_a·n_b —
    * all LONG arithmetic, no division, engine-exact). The monitoring
    * read that catches an encoder change or a population shift before
    * an IVF/PQ index trained on yesterday's geometry degrades.
    * One posexplode aggregation; output is dim-sized.
    * Output: (`pos`, `n_a`, `n_b`, `sum_a_e6`, `sum_b_e6`,
    * `shift_x`). */
  def cohortDrift(corpus: DataFrame, vecCol: String,
      cohortA: Column): DataFrame =
    corpus
      .select(cohortA.as("__a"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "v")))
      .select(col("__a"), col("pos").cast("long").as("pos"),
        round(col("v") * 1000000d).cast("long").as("v_e6"))
      .groupBy(col("pos"))
      .agg(
        sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("__a"), col("v_e6")).otherwise(0L)).as("sum_a_e6"),
        sum(when(!col("__a"), col("v_e6")).otherwise(0L)).as("sum_b_e6"))
      .select(col("pos"), col("n_a"), col("n_b"), col("sum_a_e6"),
        col("sum_b_e6"),
        (col("sum_a_e6") * col("n_b") - col("sum_b_e6") * col("n_a"))
          .as("shift_x"))

  /** Symmetric int8 scalar quantization of an embedding column: per
    * vector, `scale = max|x| / 127` and `q_i = round(x_i / scale)` —
    * 4× less memory/IO than float32 (the difference between a vector
    * corpus fitting executor memory or not at 100 TB), with the
    * approximate dot recovered as `(qa·qb)·scaleA·scaleB`. Row-local
    * column algebra, no UDF. Adds `qvec` (array<tinyint>) and
    * `qscale` (double); the all-zero vector quantizes to zeros with
    * scale 0. */
  def quantizeEmbeddings(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val m = array_max(transform(v, x => abs(x)))
    df.withColumn("qscale", m / lit(127.0))
      .withColumn("qvec",
        when(m === 0.0, transform(v, _ => lit(0).cast("tinyint")))
          .otherwise(transform(v,
            x => round(x / (m / lit(127.0))).cast("tinyint"))))
  }

  /** Approximate dot product of two quantized vectors: integer
    * multiply-accumulate (the int8 fast path real vector engines use)
    * rescaled by both quantization scales. */
  def dotQuantized(qa: Column, qb: Column, sa: Column, sb: Column): Column =
    aggregate(zip_with(qa, qb, (x, y) => x.cast("int") * y.cast("int")),
      lit(0), (acc, z) => acc + z).cast("double") * sa * sb

  /** [[bruteForceTopK]] over int8-quantized vectors: same
    * broadcast-queries shape, ranks by the approximate quantized
    * similarity (deterministic id tie-break). Recall vs the exact
    * ranking is the quantization trade — gate it explicitly
    * (`ann_int8_topk` pins recall in-plan against the exact top-k). */
  def bruteForceTopKQuantized(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = quantizeEmbeddings(queries, vecCol)
      .select(col(idCol).as("query_id"), col("qvec").as("qa"),
        col("qscale").as("sa"))
    val c = quantizeEmbeddings(corpus, vecCol)
      .select(col(idCol).as("neighbor_id"), col("qvec").as("qb"),
        col("qscale").as("sb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        dotQuantized(col("qa"), col("qb"), col("sa"), col("sb")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Deterministic BOUNDED training sample for index builds — the
    * FAISS-style posture fix for corpus-sized training: codebook /
    * centroid quality needs a few hundred points per cell, not the
    * corpus, so Lloyd trains over the `n` rows with the SMALLEST
    * content-addressed hash (the [[Dedup.seededHash]] md5 machinery,
    * id tie-break) — a distributed TakeOrdered, so membership is a
    * pure function of (row ids, seed, n), independent of partitioning,
    * row order, and cluster size, and the trained index is
    * REBUILDABLE byte-identically at any corpus layout. Serving never
    * changes: assignment/encode still covers every row. */
  private def trainingSample(corpus: DataFrame, idCol: String,
      n: Int, seed: Int): DataFrame =
    corpus.orderBy(
      Dedup.seededHash(col(idCol).cast("string"), seed), col(idCol))
      .limit(n)

  /** PRODUCT QUANTIZATION training (PQ — the FAISS-style memory scale
    * path past int8's 4×): split the `dim` dimensions into `m`
    * contiguous subspaces and k-means each subspace to `ks` centroids
    * via [[kmeansFit]] (deterministic seeding/stopping, so the
    * codebook is a pure function of the corpus). Returns the codebook
    * as `m × ks × (dim/m)` doubles — the ONE bounded driver-side
    * collect of this pipeline (dim × ks doubles total, the same
    * bounded-centroid footprint as the IVF index), broadcast back as
    * literals at encode/serve time.
    *
    * `trainSampleN` bounds the TRAINING input (the 100 TB posture):
    * Lloyd runs over the deterministic [[trainingSample]] of that
    * size instead of the whole corpus — FAISS trains PQ codebooks on
    * a bounded sample by default (hundreds of points per code
    * suffice), and a corpus-sized train loop was the one build stage
    * here that grew with the corpus. Sampling is the DEFAULT: the
    * `-1` sentinel resolves to `256·ks` points (the ~FAISS floor of
    * hundreds of points per code), so a default build stops growing
    * with the corpus; pass an explicit size to widen, or `0` to
    * opt OUT into full-corpus training (the pre-round-14 behavior —
    * an audit/repro knob, never the deployment default). The
    * codebook is a pure function of (corpus ids+vectors, trainSeed,
    * resolved sample size); a corpus of at most that many rows
    * trains on every row. Encode/serve recall gates are unchanged —
    * gate recall in-plan as ever, never assume a sampled codebook
    * ranks identically.
    *
    * EXECUTION (r14 VERDICT #4): the sampled path (the default) runs
    * Lloyd ON THE DRIVER over the one collected sample — the
    * distributed loop was maxIter sequential Spark jobs over ~4 KB/row
    * data, i.e. scheduler round-trips, not compute (measured ~4.5 s of
    * a ~7 s sf0.1 PQ build). One bounded job (the TakeOrdered sample
    * collect, sampleN × dim doubles — the same envelope the codebook
    * collect already pays) replaces them; the caller's `dotFn` Column
    * function is compiled ONCE into a driver-side scalar evaluator
    * (same catalyst expression, same sequential-fold arithmetic), so
    * assignment scoring is bit-identical to the in-plan form. Centroid
    * means sum in ascending-id order — deterministic and
    * layout-independent like before, though the final ulps of a mean
    * may differ from the distributed partial-aggregation order (the
    * serve gates recall in-plan, and the oracle never sees the
    * codebook). `trainSampleN = 0` opts out into the distributed
    * full-corpus loop unchanged (the audit/repro knob — never collect
    * an unbounded corpus to the driver). An EXPLICIT positive
    * trainSampleN is likewise collected — it is a caller-declared
    * driver budget (sampleN × dim doubles); use `0` when the training
    * set must stay distributed. */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String, m: Int,
      ks: Int, dotFn: (Column, Column) => Column = dot,
      maxIter: Int = 6, trainSampleN: Int = -1,
      trainSeed: Int = 42): Seq[Seq[Seq[Double]]] = {
    require(m > 0 && ks > 1, "need m >= 1 subspaces and ks >= 2 codes")
    val sampleN = if (trainSampleN < 0) 256 * ks else trainSampleN
    if (sampleN > 0)
      pqTrainLocal(corpus, idCol, vecCol, m, ks, dotFn, maxIter,
        sampleN, trainSeed)
    else
      pqTrainDistributed(corpus, idCol, vecCol, m, ks, dotFn, maxIter)
  }

  /** The sampled (default) PQ training path: ONE bounded sample
    * collect, then the joint Lloyd loop in plain driver-side loops —
    * semantics exactly [[pqTrainDistributed]]'s (smallest-id seeds of
    * the training frame, strict-improvement argmax with ties to the
    * lower part, empty clusters retain their centroid, converged
    * subspaces freeze, tol/maxIter identical); means sum in
    * ascending-id order. */
  private def pqTrainLocal(corpus: DataFrame, idCol: String,
      vecCol: String, m: Int, ks: Int,
      dotFn: (Column, Column) => Column, maxIter: Int,
      sampleN: Int, trainSeed: Int): Seq[Seq[Seq[Double]]] = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val spark = corpus.sparkSession
    // the one Spark job of this path: the deterministic bounded sample,
    // collected in ascending-id order (sum order below)
    val rows = trainingSample(corpus, idCol, sampleN, trainSeed)
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("fv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(rows.nonEmpty, "corpus is empty")
    val dim = rows(0)._2.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val score = scalarScoreEvaluator(spark, dotFn)
    val n = rows.length
    // per (row, subspace) subvectors, wrapped once for the evaluator
    val sv: Array[Array[Array[Double]]] = rows.map { case (_, fv) =>
      Array.tabulate(m)(j => java.util.Arrays.copyOfRange(fv, j * sub, (j + 1) * sub))
    }
    val svData: Array[Array[ArrayData]] =
      sv.map(_.map(a => ArrayData.toArrayData(a): ArrayData))
    val seeds = rows.take(ks).map(_._2)
    val tol = 1e-9
    val cent: Array[Array[Array[Double]]] = Array.tabulate(m)(j =>
      seeds.map(fv => java.util.Arrays.copyOfRange(fv, j * sub, (j + 1) * sub)))
    var active = (0 until m).toSet
    var iter = 0
    while (active.nonEmpty && iter < maxIter) {
      val act = active.toSeq.sorted
      val still = scala.collection.mutable.Set.empty[Int]
      act.foreach { j =>
        val nSeeds = cent(j).length
        val centData = cent(j).map(a => ArrayData.toArrayData(a): ArrayData)
        val sums = Array.fill(nSeeds, sub)(0.0)
        val counts = new Array[Long](nSeeds)
        var i = 0
        while (i < n) {
          var best = Double.NegativeInfinity
          var bestP = 0
          var p = 0
          while (p < nSeeds) {
            val s = score(svData(i)(j), centData(p))
            if (s > best) { best = s; bestP = p } // ties keep the lower part
            p += 1
          }
          val v = sv(i)(j)
          var d = 0
          while (d < sub) { sums(bestP)(d) += v(d); d += 1 }
          counts(bestP) += 1
          i += 1
        }
        var moved = 0.0
        var p = 0
        while (p < nSeeds) {
          if (counts(p) > 0) { // empty clusters retain their centroid
            val nv = Array.tabulate(sub)(d => sums(p)(d) / counts(p))
            var acc = 0.0
            var d = 0
            while (d < sub) {
              val df = cent(j)(p)(d) - nv(d); acc += df * df; d += 1
            }
            val dist = math.sqrt(acc)
            if (dist > moved) moved = dist
            cent(j)(p) = nv
          }
          p += 1
        }
        if (moved > tol) still += j
      }
      active = still.toSet
      iter += 1
    }
    (0 until m).map(j => cent(j).toSeq.map(_.toSeq))
  }

  /** Compile a caller's `(Column, Column) => Column` score function
    * into a driver-side scalar over two double arrays: the expression
    * is analyzed against a two-column local relation and bound into a
    * generated projection, so the arithmetic (and any registered
    * native function inside it, e.g. `graft_dot`) is the SAME catalyst
    * code the in-plan form runs — no re-derivation of the score
    * formula that could drift from the serve. */
  private def scalarScoreEvaluator(
      spark: org.apache.spark.sql.SparkSession,
      fn: (Column, Column) => Column)
      : (org.apache.spark.sql.catalyst.util.ArrayData,
         org.apache.spark.sql.catalyst.util.ArrayData) => Double = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, StructField, StructType}
    import org.apache.spark.sql.catalyst.expressions.{BindReferences, Expression, GenericInternalRow, UnsafeProjection}
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType), nullable = false),
      StructField("b", ArrayType(DoubleType), nullable = false)))
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    val analyzed = empty.select(fn(col("a"), col("b")).cast("double"))
      .queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Project]
    val bound = BindReferences.bindReference(
      analyzed.projectList.head: Expression, analyzed.child.output)
    val proj = UnsafeProjection.create(Seq(bound))
    val row = new GenericInternalRow(2)
    (a, b) => {
      row.update(0, a)
      row.update(1, b)
      val out = proj(row)
      // a null score loses to any non-null one (the window form's
      // descending NULLS LAST), ties keep the lower part either way
      if (out.isNullAt(0)) Double.NegativeInfinity else out.getDouble(0)
    }
  }

  /** The full-corpus (trainSampleN = 0) PQ training loop — the
    * distributed joint Lloyd formulation, retained as the audit/repro
    * opt-out (an unbounded corpus must never be collected). */
  private def pqTrainDistributed(corpus: DataFrame, idCol: String,
      vecCol: String, m: Int, ks: Int,
      dotFn: (Column, Column) => Column,
      maxIter: Int): Seq[Seq[Seq[Double]]] = {
    val dim = corpus.select(size(col(vecCol))).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val spark = corpus.sparkSession
    import spark.implicits._
    val train = corpus
    // ALL m subspace k-means runs share ONE Lloyd loop: the per-j
    // independent formulation is m × maxIter sequential Spark jobs
    // (the dominant wall-clock of the whole PQ pipeline at any corpus
    // size — job count, not data), where the joint loop is maxIter
    // jobs over an m×-exploded (id, j, subvector) frame. Semantics per
    // subspace are [[kmeansFit]]'s exactly: smallest-id seeds,
    // lower-part tie-break, empty clusters retain their centroid, and
    // a CONVERGED subspace is FROZEN out of later iterations (so a
    // sub-tol wobble can't keep nudging it past where the
    // independent run stopped). Contract: ids must be UNIQUE — a
    // duplicate id contributes ONE assignment row here (the window
    // keys on (id, subspace)), where the per-subspace formulation
    // re-joined the assignment onto every duplicate row with
    // partition-order-dependent tie behavior; neither semantics is
    // meaningful for duplicated ids, so dedupe upstream.
    val v = col(vecCol).cast("array<double>")
    val sliced = train.select(col(idCol).cast("long").as("id"),
        posexplode(array((0 until m).map(j =>
          slice(v, j * sub + 1, sub)): _*)).as(Seq("j", "sv")))
      .cache()
    // deterministic seeds: the ks smallest-id vectors OF THE TRAINING
    // FRAME, sliced locally (under sampling the seed set is the
    // sample's smallest ids — still a pure function of the inputs)
    val seedRows = train
      .select(col(idCol).cast("long").as("id"), v.as("fv"))
      .orderBy(col("id")).limit(ks)
      .collect().map(_.getSeq[Double](1))
    require(seedRows.nonEmpty, "corpus is empty")
    val tol = 1e-9
    // cent(j)(p) = subvector
    val cent: Array[Array[Seq[Double]]] = Array.tabulate(m)(j =>
      seedRows.map(fv => fv.slice(j * sub, (j + 1) * sub)).toArray)
    var active = (0 until m).toSet
    var iter = 0
    while (active.nonEmpty && iter < maxIter) {
      val centDf = active.toSeq.sorted.flatMap(j =>
          cent(j).zipWithIndex.map { case (cv, p) => (j, p.toLong, cv) })
        .toDF("j", "part", "cv")
      val w = Window.partitionBy(col("id"), col("j"))
        .orderBy(col("__csim").desc, col("part"))
      val assigned = sliced.where(col("j").isin(active.toSeq: _*))
        .join(broadcast(centDf), Seq("j"))
        .select(col("id"), col("j"), col("part"), col("sv"),
          dotFn(col("sv"), col("cv")).as("__csim"))
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
      val means = assigned
        .select(col("j"), col("part"),
          posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("j"), col("part"), col("pos"))
        .agg(avg(col("x")).as("mv"))
        .groupBy(col("j"), col("part"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mv"))))
          .as("pm"))
        .select(col("j"), col("part"),
          transform(col("pm"), _.getField("mv")).as("centroid"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2))
        .toMap
      val still = scala.collection.mutable.Set.empty[Int]
      active.foreach { j =>
        var moved = 0.0
        (0 until ks).foreach { p =>
          means.get((j, p.toLong)).foreach { nv =>
            val d = math.sqrt(cent(j)(p).lazyZip(nv)
              .map((a, b) => (a - b) * (a - b)).sum)
            if (d > moved) moved = d
            cent(j)(p) = nv
          }
        }
        if (moved > tol) still += j
      }
      active = still.toSet
      iter += 1
    }
    sliced.unpersist()
    (0 until m).map(j => cent(j).toSeq.map(_.toSeq))
  }

  /** PQ encode: each vector becomes `m` codes (the best-dot centroid
    * per subspace, first-index tie-break) — `dim` floats shrink to
    * `m` bytes (64-dim float32 → 8 bytes at m=8: 32×), which is the
    * difference between a trillion-vector corpus needing a float
    * scan and its codes fitting hot storage. Row-local column
    * algebra; each of the m×ks subspace dots is its own expression
    * evaluated once per row (no higher-order lambda re-evaluation). */
  def pqEncode(corpus: DataFrame, vecCol: String,
      codebook: Seq[Seq[Seq[Double]]],
      encodeDotFn: (Column, Column) => Column = l2Score()): DataFrame = {
    val m = codebook.size
    val sub = codebook.head.head.size
    val v = col(vecCol).cast("array<double>")
    val codes = (0 until m).map { j =>
      val sims = array(codebook(j).map(c =>
        encodeDotFn(slice(v, j * sub + 1, sub), typedlit(c))): _*)
      (array_position(sims, array_max(sims)) - 1L).cast("int")
    }
    corpus.withColumn("pq_codes", array(codes: _*))
  }

  /** PQ SHORTLIST + EXACT RERANK — the production PQ serving shape:
    * ADC over the codes selects `candidates` ≫ k cheap approximate
    * neighbours per query (no float touches the corpus), then ONLY
    * those candidate vectors are fetched and exactly re-scored for
    * the final top-k. Cost: a code scan + |queries|×candidates exact
    * dots, instead of |corpus| exact dots; the candidate fetch is a
    * broadcast semi join on ids (the shortlist is bounded by
    * construction). Result quality = exact top-k whenever the ADC
    * shortlist covers it — gate with the int8-style in-plan recall
    * verdict, never assume identity. */
  def pqRerankTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, codebook: Seq[Seq[Seq[Double]]], k: Int,
      candidates: Int, dotFn: (Column, Column) => Column = dot,
      encodeDotFn: (Column, Column) => Column = l2Score()): DataFrame = {
    require(candidates >= k, "shortlist must be at least k")
    val shortlist = pqTopK(corpus, queries, idCol, vecCol, codebook,
      candidates, dotFn, encodeDotFn)
      .select(col("query_id"), col("neighbor_id"))
    val cand = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(broadcast(shortlist), Seq("neighbor_id"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cand.join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        dotFn(col("qv"), col("cv")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Write the IVF-PQ serving store: the corpus with PQ codes BESIDE
    * the raw vector, laid out as `part=` directories by its IVF
    * assignment. The two scale levers compose — a probe set prunes
    * whole partitions before any byte is read, and the ADC candidate
    * stage then projects ONLY `(id, pq_codes)`, so parquet column
    * pruning keeps the float embeddings on disk until the final
    * rerank fetch touches just the shortlisted rows. */
  def writeIvfPqCorpus(corpus: DataFrame, assigned: DataFrame,
      idCol: String, vecCol: String, codebook: Seq[Seq[Seq[Double]]],
      path: String,
      encodeDotFn: (Column, Column) => Column = l2Score()): Unit =
    pqEncode(corpus, vecCol, codebook, encodeDotFn)
      .join(assigned, Seq(idCol))
      .write.mode("overwrite").partitionBy("part").parquet(path)

  /** IVF-PQ serve (the FAISS IVF-PQ read path): centroid probe →
    * `part=` PARTITION FILTER → ADC shortlist over the codes (the
    * scan reads `pq_codes`, never the embedding column) → exact
    * rerank fetching only the shortlisted vectors. Approximation
    * comes from both levers (unprobed partitions + code quantization)
    * — gate with the in-plan recall verdict like the other
    * approximate searches.
    *
    * `nProbe`/`candidates` default (sentinel -1) to the store's
    * STAMPED 2-D operating point ([[stampPqOperatingPoint]] — the
    * measured [[pqOperatingGrid]] answer, since the IVF curve's
    * one-pass identity cannot price the ADC lever). Either sentinel
    * against an unstamped store is LOUD; pass both explicitly to
    * override (the two levers are coupled — overriding one without
    * the other would serve an operating point nobody measured). */
  def ivfPqTopKFromStore(storePath: String, index: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String,
      codebook: Seq[Seq[Seq[Double]]], k: Int, nProbe: Int = -1,
      candidates: Int = -1,
      dotFn: (Column, Column) => Column = dot): DataFrame = {
    require((nProbe > 0) == (candidates > 0),
      "pass BOTH nProbe and candidates explicitly, or neither " +
        "(stamped operating point) — the levers are calibrated jointly")
    val spark0 = queries.sparkSession
    val (probeDepth, shortlistN) =
      if (nProbe > 0) (nProbe, candidates)
      else loadPqOperatingPoint(spark0, storePath)
        .map(t => (t._2, t._3)).getOrElse(
          throw new IllegalArgumentException(
            s"ivfPqTopKFromStore: no (nProbe, candidates) given and no " +
              s"stamped PQ operating point at $storePath — run " +
              s"stampPqOperatingPoint or pass both explicitly"))
    require(shortlistN >= k, "shortlist must be at least k")
    val m = codebook.size
    val sub = codebook.head.head.size
    val spark = queries.sparkSession
    val d = dotFn
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("part"))
    val probes = q
      .join(broadcast(index.select(col("part"), col("centroid"))))
      .select(col("query_id"), col("qv"), col("part"),
        d(col("qv"), col("centroid")).as("csim"))
      .withColumn("prank", row_number().over(probeW))
      .where(col("prank") <= probeDepth)
      .select(col("query_id"), col("qv"), col("part"))
    // bounded driver collect (|q| × probeDepth ids) — buys the
    // partition filter, same contract as ivfTopKFromStore
    val probedParts = probes.select(col("part").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val qvd = col("qv").cast("array<double>")
    val qtab = array((0 until m).map(j =>
      array(codebook(j).map(c =>
        d(slice(qvd, j * sub + 1, sub), typedlit(c))): _*)): _*)
    val qWithTab = probes.select(col("query_id"),
      col("part").cast("long").as("part"), qtab.as("__qtab"))
    // erased vectors (eraseFromIvfStore tombstones) leave before the
    // ADC shortlist forms — the rerank fetch joins on the shortlist,
    // so it can never resurrect them
    val storeTomb = loadStoreTombstones(spark, storePath)
    val codes = minusStoreTombstones(
      spark.read.parquet(storePath)
        .where(col("part").isin(probedParts: _*)),
      idCol, storeTomb)
      .select(col(idCol).as("neighbor_id"), col("pq_codes"),
        col("part").cast("long").as("part"))
    val adc = aggregate(
      zip_with(col("pq_codes"), col("__qtab"),
        (code, tab) => element_at(tab, code + 1)),
      lit(0.0), _ + _)
    val sw = Window.partitionBy(col("query_id"))
      .orderBy(col("asim").desc, col("neighbor_id"))
    val shortlist = codes.join(broadcast(qWithTab), Seq("part"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), adc.as("asim"))
      .withColumn("srank", row_number().over(sw))
      .where(col("srank") <= shortlistN)
      .select(col("query_id"), col("neighbor_id"))
    val fetch = spark.read.parquet(storePath)
      .where(col("part").isin(probedParts: _*))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(broadcast(shortlist), Seq("neighbor_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    fetch.join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        d(col("qv"), col("cv")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Minimum-L2 assignment as a max-score function: argmin ||x−c||² =
    * argmax (x·c − |c|²/2) (the |x|² term is constant per row). Use as
    * the `dotFn` of [[kmeansFit]]/[[pqTrain]]/[[pqEncode]] to make
    * them EUCLIDEAN k-means/coding — the metric PQ reconstruction
    * error is defined in; pure-dot assignment measurably halves PQ
    * recall on unnormalized embeddings. */
  def l2Score(dotFn: (Column, Column) => Column = dot)
      : (Column, Column) => Column =
    (a, b) => dotFn(a, b) - dotFn(b, b) * lit(0.5)

  /** PQ/ADC top-k: asymmetric distance computation — per QUERY, an
    * m × ks table of subspace dots is computed once (query side is
    * small; the codebook rides as literals), and a corpus row's
    * approximate dot is then `m` TABLE LOOKUPS on its codes: at serve
    * time no float multiply ever touches a corpus vector, and the
    * scan reads `pq_codes` instead of the embedding column. Ranks by
    * the ADC score (deterministic id tie-break); recall vs exact is
    * the quantization trade — gate it explicitly like int8
    * (`ann_pq_topk` pins recall in-plan against the exact top-k). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, codebook: Seq[Seq[Seq[Double]]], k: Int,
      dotFn: (Column, Column) => Column = dot,
      encodeDotFn: (Column, Column) => Column = l2Score()): DataFrame = {
    val m = codebook.size
    val sub = codebook.head.head.size
    val qv = col(vecCol).cast("array<double>")
    val qtab = array((0 until m).map(j =>
      array(codebook(j).map(c =>
        dotFn(slice(qv, j * sub + 1, sub), typedlit(c))): _*)): _*)
    val q = queries.select(col(idCol).as("query_id"), qtab.as("__qtab"))
    val c = pqEncode(corpus, vecCol, codebook, encodeDotFn)
      .select(col(idCol).as("neighbor_id"), col("pq_codes"))
    val score = aggregate(
      zip_with(col("pq_codes"), col("__qtab"),
        (code, tab) => element_at(tab, code + 1)),
      lit(0.0), _ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), score.as("sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Near-duplicate pairs: all (a < b) with cosine ≥ threshold, as a
    * broadcast nested-loop join with the threshold folded into the
    * join condition — the dot product (pass the codegen'd
    * [[graft.functions.GraftFunctions.dotNative]]) and the comparison
    * run inside whole-stage codegen, failing pairs never materialize
    * as rows, and nothing is collected outside Spark's managed
    * broadcast. Exact and inherently quadratic: one side must fit a
    * broadcast; beyond that the scale twins are [[lshNearDupPairs]] /
    * IVF bucketing (run the N² only within a bucket). */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double,
      dotFn: (Column, Column) => Column = dot): DataFrame = {
    val d = dotFn
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(broadcast(b),
        col("id_a") < col("id_b") && d(col("va"), col("vb")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** [[nearDupPairs]] as a broadcast primitive-array kernel: the N²
    * dot-product loop is genuinely compute-bound, and per-pair
    * expression evaluation (interpreted higher-order folds or 64-term
    * codegen chains) costs ~10× a fused while-loop over primitive
    * doubles. The corpus ships once as a broadcast of packed arrays;
    * each task owns a slice of row indices — no shuffle at all. The
    * inner sum is the same sequential left fold (bit-identical IEEE
    * results, DuckDB-parity preserved). Applicability: corpus must fit
    * in a broadcast (~1M × small dim); beyond that, run this kernel
    * per LSH bucket / IVF partition block. NOTE the explicit driver
    * collect: this is the per-bucket building block — the headline
    * all-pairs query path is [[nearDupPairs]] with the codegen'd dot,
    * which keeps everything inside Spark's managed broadcast join.
    */
  def nearDupPairsKernel(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, maxRows: Int = 1 << 20): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val rows = corpus
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    // LOUD contract on the driver collect: this kernel is the
    // per-bucket building block — a corpus past the broadcast envelope
    // must be bucketed (LSH bands / IVF partitions) before the kernel
    // runs per bucket, or served by the managed-broadcast nearDupPairs
    require(rows.length <= maxRows,
      s"nearDupPairsKernel: ${rows.length} rows exceed maxRows=$maxRows " +
        "— this driver-collected kernel is the per-bucket building " +
        "block; bucket first (lshNearDupPairs / IVF partitions) or use " +
        "nearDupPairs' managed broadcast join")
    val bc = spark.sparkContext.broadcast(rows)
    val n = rows.length
    val tasks = math.max(1, math.min(64, n / 16))
    spark.sparkContext.parallelize(0 until n, tasks)
      .flatMap { i =>
        val all = bc.value
        val (ida, va) = all(i)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var j = i + 1
        while (j < all.length) {
          val (idb, vb) = all(j)
          var s = 0.0
          var d = 0
          while (d < va.length) { s += va(d) * vb(d); d += 1 }
          if (s >= threshold) out += ((ida, idb))
          j += 1
        }
        out
      }.toDF("id_a", "id_b")
  }

  /** Deterministic random-projection hyperplanes (seeded, components
    * rounded to 6 decimals so the SAME doubles can ride as SQL literals
    * in the DuckDB oracle). Public LSH scheme: sign of ⟨v, plane⟩ per
    * plane → one bucket bit (Charikar, STOC'02). */
  def randomHyperplanes(nPlanes: Int, dim: Int,
      seed: Long = 20240813L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(
      math.rint(rnd.nextGaussian() * 1e6) / 1e6))
  }

  /** Sign-bit LSH bucket id of a vector under the given hyperplanes
    * (bit i = ⟨v, planeᵢ⟩ ≥ 0) — row-local, no shuffle. */
  def rpLshBucket(vec: Column, planes: Seq[Array[Double]],
      dotFn: (Column, Column) => Column = dot): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dotFn(vec, typedlit(p.toSeq)) >= 0d, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed near-dup pairs — the hash-bucket alternative to the
    * IVF scale path: candidates are pairs sharing a sign-bit bucket
    * (equality join on a small long — 2^nPlanes buckets; fan-out is
    * per-bucket, never corpus-quadratic), verified by the exact
    * threshold. Recall is the LSH collision probability (1 − θ/π per
    * plane) — a DOCUMENTED approximation, unlike the exact
    * [[nearDupPairs]]; more planes → smaller buckets and lower recall,
    * fewer planes → the reverse. */
  def lshNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      planes: Seq[Array[Double]], threshold: Double,
      dotFn: (Column, Column) => Column = dot): DataFrame = {
    val d = dotFn
    val b = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      rpLshBucket(col(vecCol), planes, dotFn).as("bucket"))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .where(d(col("a.v"), col("b.v")) >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
  }

  /** Per-partition centroids: mean of vectors grouped by `partCol`,
    * via posexplode → (part, pos) partial-aggregated means → re-packed
    * arrays. The dim-fan-out rows aggregate map-side, so the shuffle
    * carries one row per (partition × dim). */
  def centroids(corpus: DataFrame, partCol: String, vecCol: String): DataFrame =
    corpus.select(col(partCol).as("part"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .groupBy(col("part"), col("pos")).agg(avg(col("x")).as("m"))
      .groupBy(col("part"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("part"), transform(col("pm"), _.getField("m")).as("centroid"))

  /** Assign every corpus vector to its most-similar centroid — the IVF
    * index-BUILD step (and the assignment half of a Lloyd/k-means
    * iteration). The centroid table broadcasts; ties break on the lower
    * part id, so assignment is deterministic. One window shuffle on the
    * corpus id; at 100 TB the corpus never moves except that shuffle —
    * and Spark's WindowGroupLimit keeps the rank-1 cut MAP-SIDE, so the
    * exchange carries ~one row per id, not k× (round-14 measured: a
    * min_by(part, struct(-csim, part)) aggregation form — same result,
    * spec-pinned — benched 1.6× SLOWER here, the struct-ordered
    * aggregate being interpreted where the window path is codegen;
    * keep the window form).
    *
    * @param cent (part, centroid) rows — small (breadth × dim)
    * @return (idCol, part) */
  def assignToCentroids(corpus: DataFrame, cent: DataFrame, idCol: String,
      vecCol: String, dotFn: (Column, Column) => Column = dot): DataFrame = {
    val d = dotFn
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__csim").desc, col("part"))
    corpus.select(col(idCol), col(vecCol).as("__v"))
      .join(broadcast(cent.select(col("part"), col("centroid"))))
      .select(col(idCol), col("part"), d(col("__v"), col("centroid")).as("__csim"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(idCol), col("part"))
  }

  /** [[assignToCentroids]] CARRYING the full corpus row through the
    * window — the index-BUILD composition (r14 VERDICT #3): a build
    * that immediately derives the refined centroids AND lays the
    * corpus out by partition otherwise joins the corpus back onto the
    * assignment artifact once per consumer (re-scanning the corpus
    * each time). Same window, same (csim desc, part) tie-break, so the
    * (id, part) assignment is IDENTICAL to [[assignToCentroids]]
    * (spec-pinned); the exchange carries the corpus row once instead
    * of the joins shuffling/scanning it again downstream. Callers that
    * only need the (id, part) map should keep the plain form — its
    * exchange carries ids, not vectors.
    *
    * @return every corpus column plus `part` */
  def assignToCentroidsCarrying(corpus: DataFrame, cent: DataFrame,
      idCol: String, vecCol: String,
      dotFn: (Column, Column) => Column = dot): DataFrame = {
    val d = dotFn
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__csim").desc, col("part"))
    corpus
      .join(broadcast(cent.select(col("part"), col("centroid"))))
      .withColumn("__csim", d(col(vecCol), col("centroid")))
      .drop("centroid")
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn", "__csim")
  }

  /** [[writeIvfCorpus]] over an assignment that already CARRIES the
    * corpus row ([[assignToCentroidsCarrying]] output) — the join-free
    * build tail: no corpus re-scan, no corpus⋈assignment shuffle.
    * Identical store contents (same rows, same `part=` layout). */
  def writeIvfCorpusAssigned(assignedCorpus: DataFrame,
      path: String): Unit =
    assignedCorpus.write.mode("overwrite").partitionBy("part").parquet(path)

  /** [[writeIvfPqCorpus]] over a carrying assignment — encode runs
    * row-local on the already-assigned rows, so the store write is one
    * pass with ZERO joins. Identical store contents (columns may order
    * differently in the files; every consumer selects by name). */
  def writeIvfPqCorpusAssigned(assignedCorpus: DataFrame, vecCol: String,
      codebook: Seq[Seq[Seq[Double]]], path: String,
      encodeDotFn: (Column, Column) => Column = l2Score()): Unit =
    pqEncode(assignedCorpus, vecCol, codebook, encodeDotFn)
      .write.mode("overwrite").partitionBy("part").parquet(path)

  /** One Lloyd (k-means) iteration: assign to the given centroids, then
    * recompute each partition's mean vector. Iterating this to a fixed
    * point + [[assignToCentroids]] + [[ivfTopK]] is the full
    * self-contained IVF pipeline (no pre-existing partition column
    * needed). */
  def lloydStep(corpus: DataFrame, cent: DataFrame, idCol: String,
      vecCol: String, dotFn: (Column, Column) => Column = dot): DataFrame = {
    val assigned = assignToCentroids(corpus, cent, idCol, vecCol, dotFn)
    centroids(corpus.join(assigned, Seq(idCol)), "part", vecCol)
  }

  /** Full k-means driver: iterate [[lloydStep]] from deterministic
    * seeds until the centroids stop moving (max per-centroid L2
    * movement ≤ `tol`) or `maxIter` rounds — the index-BUILD loop that
    * turns a raw embedding corpus into an IVF layout with no
    * pre-existing partition column and no hand-rolled iteration at the
    * call site.
    *
    * Determinism: seeds are the `k` corpus vectors with the SMALLEST
    * ids (a distributed top-k, insensitive to partitioning and row
    * order), assignment ties break on the lower part id
    * ([[assignToCentroids]]), and empty clusters RETAIN their previous
    * centroid rather than respawning — so two runs over the same
    * corpus produce identical centroids, which a persisted serving
    * layout ([[writeIvfCorpus]]) needs to be rebuildable.
    *
    * Scale shape: the corpus stays distributed and is scanned once per
    * iteration (assign = broadcast join + one window shuffle; means =
    * map-side-combined aggregation). Centroids — k × dim doubles, the
    * same envelope every step broadcasts anyway — come back to the
    * driver between iterations, which also RESETS LINEAGE each round:
    * the next iteration's plan starts from a literal centroid frame,
    * not an ever-deepening recursive plan (the iterate-a-DataFrame
    * trap).
    *
    * `trainSampleN` bounds the TRAINING input like [[pqTrain]]'s
    * knob: Lloyd iterates over the deterministic [[trainingSample]]
    * instead of the corpus (FAISS caps k-means training points per
    * centroid the same way), so the index BUILD stops growing with
    * the corpus; [[assignToCentroids]] / [[writeIvfCorpus]] still
    * cover every row under the frozen trained centroids — exactly the
    * [[appendIvfCorpus]] contract, where assignment is centroid-
    * defined and never retrains. Sampling is the DEFAULT: the `-1`
    * sentinel resolves to `max(64·k, 10⁴)` points (FAISS's
    * points-per-centroid cap with a floor that keeps small-k fits
    * well-conditioned); pass an explicit size to widen, or `0` to
    * opt OUT into full-corpus training (audit/repro only — at corpus
    * scale that re-buys the O(corpus × maxIter) build). A corpus of
    * at most the resolved size trains on every row (small fixtures
    * byte-identical to the unsampled fit).
    *
    * @return converged (part, centroid) index for [[ivfTopK]] /
    *   [[assignToCentroids]] / [[writeIvfCorpus]] */
  def kmeansFit(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      maxIter: Int = 20, tol: Double = 1e-9,
      dotFn: (Column, Column) => Column = dot,
      trainSampleN: Int = -1, trainSeed: Int = 42): DataFrame = {
    require(k > 0, "k must be positive")
    require(maxIter >= 1, "maxIter must be >= 1")
    require(tol >= 0.0, "tol must be >= 0")
    val sampleN = if (trainSampleN < 0) math.max(64 * k, 10000) else trainSampleN
    val spark = corpus.sparkSession
    import spark.implicits._
    // the sample is scanned once per Lloyd iteration — pin it so the
    // TakeOrdered that defines it runs once, not once per iteration
    val train =
      if (sampleN > 0)
        trainingSample(corpus, idCol, sampleN, trainSeed)
          .localCheckpoint(true)
      else corpus
    var cent: Seq[(Long, Seq[Double])] = train
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .orderBy(col("id")).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Double](1)) }.toSeq
    require(cent.nonEmpty, "corpus is empty")
    var iter = 0
    var moved = Double.MaxValue
    while (iter < maxIter && moved > tol) {
      val prev = cent.toMap
      val stepped = lloydStep(train, cent.toDF("part", "centroid"),
        idCol, vecCol, dotFn)
        .select(col("part").cast("long"), col("centroid"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      cent = cent.map { case (p, old) => (p, stepped.getOrElse(p, old)) }
      moved = cent.map { case (p, v) =>
        math.sqrt(prev(p).lazyZip(v).map((a, b) => (a - b) * (a - b)).sum)
      }.max
      iter += 1
    }
    cent.toDF("part", "centroid")
  }

  /** Persist the IVF-partitioned corpus: vectors co-located by their
    * index partition as `part=<p>` parquet directories. This is the
    * serving layout of the index — [[ivfTopKFromStore]] turns the
    * probe set into a PARTITION FILTER on this store, so a query
    * reads ~nProbe/breadth of the data as whole-directory pruning
    * (the vector-store analogue of the rollups' `bucket_date`
    * layout), not a filtered full scan.
    * `assigned` is [[assignToCentroids]] output (idCol, part). */
  def writeIvfCorpus(corpus: DataFrame, assigned: DataFrame, idCol: String,
      path: String): Unit =
    corpus.join(assigned, Seq(idCol))
      .write.mode("overwrite").partitionBy("part").parquet(path)

  /** INCREMENTAL index maintenance — the daily-ingest ANN shape: a
    * new vector batch assigns to the EXISTING (offline-built, frozen)
    * centroid index and APPENDS into the persisted `part=` layout.
    * Cost scales with the batch (one broadcast join + one window
    * shuffle over the batch, appends touch only its partitions); the
    * standing corpus is never rewritten or re-shuffled, mirroring
    * [[graft.operators.Dedup.jaccardPairsAgainst]]'s batch-scaled
    * contract on the text plane. Queries over the store
    * ([[ivfTopKFromStore]]) see exactly what a full rebuild under the
    * same centroids would produce — the index is centroid-defined, so
    * append order cannot change any assignment.
    *
    * Centroid drift is the documented trade: appended vectors do not
    * move the centroids (frozen index = stable probe semantics);
    * [[refitIvfIndex]] measures the drift and refreshes the index when
    * it crosses the threshold, and a full [[kmeansFit]] +
    * [[writeIvfCorpus]] rewrite re-partitions when locality itself has
    * degraded. */
  def appendIvfCorpus(newBatch: DataFrame, index: DataFrame, idCol: String,
      vecCol: String, path: String,
      dotFn: (Column, Column) => Column = dot): Unit = {
    val assigned = assignToCentroids(newBatch, index, idCol, vecCol, dotFn)
    newBatch.join(assigned, Seq(idCol))
      .write.mode("append").partitionBy("part").parquet(path)
  }

  /** RIGHT-TO-ERASURE on a persisted vector store ([[writeIvfCorpus]]
    * or [[writeIvfPqCorpus]] layout — the ANN plane's twin of
    * `TextAnalysis.eraseFromTextIndex`, because a deletion request is
    * not closed while the subject still surfaces as somebody's nearest
    * neighbor): id-keyed TOMBSTONES land in `path/__tombstones` (the
    * leading underscore hides the sidecar from the store's own parquet
    * partition discovery, so `spark.read.parquet(path)` is unchanged),
    * and both store serves ([[ivfTopKFromStore]],
    * [[ivfPqTopKFromStore]]) anti-join them out before any ranking.
    * [[compactIvfStore]] is the physical closer.
    *
    * Unlike the text index there is no stats row to keep exact, so
    * EVERY requested id is tombstoned — including ids not (yet) in the
    * store: a later [[appendIvfCorpus]] batch redelivering the subject
    * stays excluded (erasure binds the id forever in this store).
    * The frozen centroid index is untouched — it is an aggregate model
    * parameter, the same anonymized-aggregate position the event
    * plane's erasure documents for retained rollup aggregates; a
    * corpus rewrite + [[kmeansFit]] refresh is the full-retrain path.
    *
    * @return how many requested ids were NEWLY erased — physically
    *   present and not already tombstoned, matching
    *   `TextAnalysis.eraseFromTextIndex`'s semantics exactly, so a
    *   repeat-erase of the same id returns 0 on both planes and a
    *   caller summing returns across stores counts each closure
    *   once. */
  def eraseFromIvfStore(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, ids: Seq[String]): Long = {
    require(ids.nonEmpty, "eraseFromIvfStore needs ids")
    import spark.implicits._
    val known = loadStoreTombstones(spark, path)
      .map(_.select(col("id")).as[String].collect().toSet)
      .getOrElse(Set.empty[String])
    // bounded collect: at most |ids| distinct values survive the filter
    val present = spark.read.parquet(path)
      .where(col(idCol).cast("string").isin(ids: _*))
      .select(col(idCol).cast("string")).distinct()
      .as[String].collect().toSet
    val fresh = ids.distinct.filterNot(known)
    if (fresh.nonEmpty)
      fresh.toDF("id").coalesce(1)
        .write.mode("append").parquet(s"$path/__tombstones")
    (present -- known).size.toLong
  }

  /** The store's tombstone ids, if any erasure ever ran. Stored as
    * strings; serves compare on a string-cast of the id column. */
  private[graft] def loadStoreTombstones(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/__tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)
      .dropDuplicates("id"))
    else None
  }

  /** Drop tombstoned rows from a store scan — broadcast anti join on
    * the string-cast id (tombstone side is deletion-request bounded). */
  private def minusStoreTombstones(rows: DataFrame, idCol: String,
      tomb: Option[DataFrame]): DataFrame =
    tomb.fold(rows)(t =>
      rows.join(broadcast(t.withColumnRenamed("id", "__tomb_id")),
        col(idCol).cast("string") === col("__tomb_id"), "left_anti"))

  /** Physically close [[eraseFromIvfStore]] requests: rewrite the
    * store WITHOUT tombstoned rows into a fresh directory (same
    * crash-safe swap contract as `compactTextIndex` — never in
    * place), preserving the `part=` serving layout. The tombstone
    * SIDECAR is carried forward verbatim: [[eraseFromIvfStore]]'s
    * contract is that erasure binds the id FOREVER in this store
    * (including ids tombstoned before they ever landed), and a later
    * [[appendIvfCorpus]] batch redelivering a subject must stay
    * excluded from the compacted store too. None of the carried ids
    * have physical rows in the output (the rewrite just dropped
    * them), so serving is byte-identical to the tombstoned input —
    * the sidecar only re-arms against future appends. Retire the
    * input once reads re-point, or the erased vectors still exist on
    * disk. */
  def compactIvfStore(spark: org.apache.spark.sql.SparkSession,
      inPath: String, outPath: String, idCol: String): Unit = {
    require(inPath != outPath,
      "compact writes a fresh directory (crash-safe swap), not in place")
    val tomb = loadStoreTombstones(spark, inPath)
    minusStoreTombstones(spark.read.parquet(inPath), idCol, tomb)
      .write.mode("overwrite").partitionBy("part").parquet(outPath)
    tomb.foreach(_.select(col("id")).coalesce(1)
      .write.mode("overwrite").parquet(s"$outPath/__tombstones"))
    // the calibrated operating points travel too: compaction keeps
    // the index (and thus the tuned recall/probe trade) unchanged
    import spark.implicits._
    loadOperatingPoint(spark, inPath).foreach { case (t, p) =>
      Seq((t, p)).toDF("target_recall_e4", "n_probe").coalesce(1)
        .write.mode("overwrite").parquet(s"$outPath/__operating_point")
    }
    loadPqOperatingPoint(spark, inPath).foreach { case (t, p, c) =>
      Seq((t, p, c)).toDF("target_recall_e4", "n_probe", "candidates")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$outPath/__pq_operating_point")
    }
  }

  /** Centroid DRIFT of a persisted IVF store against its serving
    * index: per part, the L2 distance between the index's centroid and
    * the partition's CURRENT mean vector — the number that says how
    * stale the index is after a run of [[appendIvfCorpus]] batches.
    * One store scan (the same map-side-combined mean aggregation as
    * [[centroids]]) joined against the k-row index; parts with no
    * store rows report no drift (no data moved nothing).
    * Output: (`part`, `drift`). */
  def ivfDrift(store: DataFrame, index: DataFrame,
      vecCol: String): DataFrame =
    centroids(store.select(col("part").cast("long").as("part"),
        col(vecCol)), "part", vecCol)
      .withColumnRenamed("centroid", "__cur")
      .join(index.select(col("part").cast("long").as("part"),
        col("centroid").cast("array<double>").as("__idx")), Seq("part"))
      .select(col("part"),
        sqrt(aggregate(zip_with(col("__cur"), col("__idx"),
          (a, b) => (a - b) * (a - b)), lit(0.0), _ + _)).as("drift"))

  /** The IVF MAINTENANCE trigger — closes the loop
    * [[appendIvfCorpus]] documents: measure [[ivfDrift]] on the store;
    * at or below `threshold` the serving index HOLDS (returned
    * unchanged, no IO); past it the index REFRESHES to the store's
    * current partition means (one Lloyd mean step — the `part=` layout
    * stays valid because partition membership is centroid-DEFINED at
    * assignment time, so refreshing the probe targets never orphans a
    * stored vector). When locality itself has degraded — drift large
    * relative to inter-centroid distances — re-partition fully with
    * [[kmeansFit]] + [[assignToCentroids]] + [[writeIvfCorpus]] to a
    * NEW path (never in place: the rewrite reads the store it
    * replaces).
    *
    * Driver data: one k-row drift frame (the index envelope).
    * The refreshed index carries the same in-plan row bound as
    * [[readCentroids]] (a no-op `limit` ceiling — the mean table has
    * at most one row per `part=` partition by construction), so a
    * serving plan built from it stays [[graft.plans.PlanLint]]-clean.
    * @return (serving index, whether the trigger fired) */
  def refitIvfIndex(store: DataFrame, index: DataFrame, vecCol: String,
      threshold: Double, maxCentroids: Int = 65536): (DataFrame, Boolean) = {
    val maxDrift = ivfDrift(store, index, vecCol)
      .agg(max(col("drift"))).head() match {
        case r if r.isNullAt(0) => 0.0 // empty store: nothing drifted
        case r => r.getDouble(0)
      }
    if (maxDrift <= threshold) (index, false)
    else (centroids(store.select(col("part").cast("long").as("part"),
      col(vecCol)), "part", vecCol).limit(maxCentroids), true)
  }

  /** [[ivfTopK]] served from a persisted [[writeIvfCorpus]] store:
    * probes are computed from the broadcast centroid index, their
    * part ids collected (bounded by |queries| × nProbe — the same
    * driver envelope as the centroids themselves) and re-issued as a
    * partition filter on the store scan, so unprobed `part=`
    * directories are pruned before any vector is read. Results are
    * identical to [[ivfTopK]] over the same assignment.
    *
    * `nProbe` defaults (sentinel -1) to the store's STAMPED operating
    * point ([[stampOperatingPoint]]) — the calibrated depth travels
    * with the index, so consumers serve at the tuned recall without
    * re-deriving it. A default serve against an unstamped store is
    * LOUD (no silent magic depth); pass nProbe explicitly to
    * override the stamp (audits, per-query recall tiers). The PQ twin
    * ([[ivfPqTopKFromStore]]) takes its depth explicitly — its
    * operating point couples (nProbe, candidates) and is calibrated
    * per deployment. */
  def ivfTopKFromStore(storePath: String, index: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = -1, dotFn: (Column, Column) => Column = dot): DataFrame = {
    val d = dotFn
    val spark = queries.sparkSession
    val probeDepth =
      if (nProbe > 0) nProbe
      else loadOperatingPoint(spark, storePath).map(_._2).getOrElse(
        throw new IllegalArgumentException(
          s"ivfTopKFromStore: no nProbe given and no stamped operating " +
            s"point at $storePath — run stampOperatingPoint or pass " +
            s"nProbe explicitly"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("part"))
    val probes = q.join(broadcast(index.select(col("part"), col("centroid"))))
      .select(col("query_id"), col("qv"), col("part"),
        d(col("qv"), col("centroid")).as("csim"))
      .withColumn("prank", row_number().over(probeW))
      .where(col("prank") <= probeDepth)
      .select(col("query_id"), col("qv"), col("part"))
    // the union of probed parts, to the driver: this small collect is
    // exactly what buys the partition filter below
    val probedParts = probes.select(col("part").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSeq
    // erased vectors (eraseFromIvfStore tombstones) never rank
    val c = minusStoreTombstones(
      spark.read.parquet(storePath)
        .where(col("part").isin(probedParts: _*)), // prunes part= dirs
      idCol, loadStoreTombstones(spark, storePath))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        col("part").cast("long").as("part"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(probes.withColumn("part", col("part").cast("long"))),
        Seq("part"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        d(col("qv"), col("cv")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** RECALL-CALIBRATED probe selection (the FAISS-autotune question —
    * "what nProbe do I need for recall R?" — answered Spark-first):
    * the ENTIRE probe/recall curve from ONE ground-truth pass, no
    * per-depth re-execution. The identity that makes it one-pass:
    * [[ivfTopK]]/[[ivfTopKFromStore]] rank EXACTLY within the probed
    * subset, so a true top-k neighbor is retrieved at probe depth `p`
    * IFF its partition's probe rank (the rank of that partition's
    * centroid in the query's similarity order) is ≤ `p` — any probed
    * impostor that displaced it would also outrank it globally,
    * contradicting ground-truth membership. recall@k(p) is therefore
    * a pure counting aggregation over the |queries|·k ground-truth
    * rows:
    *
    *  1. exact top-k per validation query ([[bruteForceTopK]] — the
    *     one corpus-sized pass every ground truth costs; calibrate on
    *     a SAMPLED validation set, the curve is a property of the
    *     index, not of any one query),
    *  2. each true neighbor joins its partition's per-query probe
    *     rank (assignment equi-join + a broadcast |queries|×|index|
    *     rank table),
    *  3. every depth 1..maxProbe counts ranks ≤ p from those same
    *     rows (a bounded maxProbe × |queries|·k fan-out — never
    *     corpus-sized, never re-scanning).
    *
    * Output: (`n_probe`, `hits`, `possible`, `recall_e4`) —
    * monotonically non-decreasing in `n_probe` by construction;
    * `recall_e4 = floor(10⁴·hits/possible)` is exact integer
    * arithmetic, so the curve hash-compares across engines.
    *
    * @param assigned (idCol, part) under the SAME frozen index that
    *   serves ([[assignToCentroids]] output, or the persisted store's
    *   own columns for a store-backed calibration). */
  def probeRecallCurve(corpus: DataFrame, assigned: DataFrame,
      index: DataFrame, valQueries: DataFrame, idCol: String,
      vecCol: String, k: Int, maxProbe: Int,
      dotFn: (Column, Column) => Column = dot): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxProbe >= 1, "maxProbe must be >= 1")
    val d = dotFn
    val spark = corpus.sparkSession
    import spark.implicits._
    // pinned: the ground truth is counted below (possible) AND joined
    // to probe ranks — one brute-force pass, not one per consumer
    val truth = bruteForceTopK(corpus, valQueries, idCol, vecCol, k, d)
      .join(assigned.select(col(idCol).as("neighbor_id"),
        col("part").cast("long").as("part")), Seq("neighbor_id"))
      .localCheckpoint(true)
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("part"))
    val pranks = valQueries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .join(broadcast(index.select(col("part").cast("long").as("part"),
        col("centroid"))))
      .select(col("query_id"), col("part"),
        d(col("qv"), col("centroid")).as("csim"))
      .withColumn("prank", row_number().over(probeW))
      .select(col("query_id"), col("part"), col("prank"))
    val hitsByRank = truth.join(broadcast(pranks), Seq("query_id", "part"))
    val depths = (1 to maxProbe).toDF("n_probe")
    // possible = the ACTUAL ground-truth row count (bounded driver
    // count over the checkpointed truth), not |queries|·k: a query
    // with fewer than k eligible neighbors (corpus ≤ k, filtered
    // variants) contributes only what exists, so full retrieval still
    // reads recall_e4 = 10000 and [[chooseProbe]] can never be
    // starved by an unreachable denominator
    val nPossible = truth.count()
    require(nPossible > 0,
      "probeRecallCurve: no ground-truth rows (empty corpus or queries)")
    hitsByRank.crossJoin(broadcast(depths))
      .groupBy(col("n_probe"))
      .agg(sum(when(col("prank") <= col("n_probe"), 1L).otherwise(0L))
        .as("hits"))
      .select(col("n_probe").cast("long").as("n_probe"), col("hits"),
        lit(nPossible).as("possible"),
        floor(lit(10000L) * col("hits") / lit(nPossible)).cast("long")
          .as("recall_e4"))
  }

  /** The smallest probe depth whose measured recall clears the
    * target — [[probeRecallCurve]]'s consumer. `None` when no depth
    * on the curve reaches the target (serve with the curve's max or
    * re-partition the index — an unreachable target must be loud,
    * never a silently-pessimal maxProbe). */
  def chooseProbe(curve: DataFrame, targetRecallE4: Long): Option[Int] = {
    val row = curve.where(col("recall_e4") >= targetRecallE4)
      .agg(min(col("n_probe"))).head()
    if (row.isNullAt(0)) None else Some(row.getLong(0).toInt)
  }

  /** Persist the calibrated OPERATING POINT with the store (the
    * FAISS-autotune step that actually ships the tuning): the curve's
    * [[chooseProbe]] answer for `targetRecallE4` lands as the 1-row
    * `path/__operating_point` sidecar (underscore-hidden from the
    * store's own partition discovery, like the tombstones), and
    * [[ivfTopKFromStore]] serves at it BY DEFAULT — without this,
    * every consumer re-derives or hard-codes nProbe and the
    * calibration pass tunes nothing. An unreachable target is LOUD
    * here (same contract as [[chooseProbe]]'s None): stamping a point
    * that does not exist would silently pin pessimal recall forever.
    *
    * @return the stamped probe depth */
  def stampOperatingPoint(spark: org.apache.spark.sql.SparkSession,
      path: String, curve: DataFrame, targetRecallE4: Long): Int = {
    import spark.implicits._
    val p = chooseProbe(curve, targetRecallE4).getOrElse(
      throw new IllegalArgumentException(
        s"stampOperatingPoint: no probe depth on the curve reaches " +
          s"recall_e4 >= $targetRecallE4 — re-partition the index or " +
          s"lower the target"))
    Seq((targetRecallE4, p)).toDF("target_recall_e4", "n_probe")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/__operating_point")
    p
  }

  /** The store's stamped (target recall, probe depth), if calibration
    * ever ran. */
  def loadOperatingPoint(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[(Long, Int)] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/__operating_point")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else spark.read.parquet(p.toString)
      .select(col("target_recall_e4").cast("long"),
        col("n_probe").cast("int"))
      .collect().headOption.map(r => (r.getLong(0), r.getInt(1)))
  }

  /** MEASURED recall grid for the IVF-PQ serve — the 2-D calibration
    * [[probeRecallCurve]] cannot answer: a PQ serve has TWO coupled
    * levers, probe depth (partitions read) and ADC shortlist size
    * (rerank fetches), and the one-pass containment identity does NOT
    * extend to the SHORTLIST lever — ADC ranks by approximate code
    * distances, so a true neighbor inside a probed partition can
    * still miss the shortlist.
    *
    * What DOES hold, and what this derivation exploits: a candidate's
    * ADC score and exact score are pure functions of (query,
    * candidate) — independent of BOTH levers. So ONE partition-pruned
    * scan at the deepest probe depth scores the whole candidate pool
    * (ADC + exact, each with the serve's exact expressions and
    * deterministic id tie-breaks), and every grid cell (p, c) is then
    * a cheap filter (centroid rank ≤ p) + rank (ADC top-c) + rank
    * (exact top-k) over that scored pool — row-for-row identical to
    * re-executing [[ivfPqTopKFromStore]] at (p, c), which the spec
    * pins cell by cell. |grid| serve re-executions (each rescanning
    * the store and re-ranking from scratch) collapse into one scan +
    * one all-cells job. The pool-wide exact scoring is bounded by the
    * one ground-truth pass the grid already pays: the pool is the
    * probed subset of the corpus, the truth pass scores all of it.
    *
    * Output: (`n_probe`, `candidates`, `hits`, `possible`,
    * `recall_e4`) per cell — integer-exact like the IVF curve;
    * `possible` is the actual ground-truth row count (a corpus
    * smaller than k+1 can still read full recall). */
  def pqOperatingGrid(storePath: String, index: DataFrame,
      corpus: DataFrame, valQueries: DataFrame, idCol: String,
      vecCol: String, codebook: Seq[Seq[Seq[Double]]], k: Int,
      probeDepths: Seq[Int], candidateCounts: Seq[Int],
      dotFn: (Column, Column) => Column = dot): DataFrame =
    pqOperatingGridFromTruth(storePath, index,
      bruteForceTopK(corpus, valQueries, idCol, vecCol, k, dotFn)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint(true), // ONE exact pass feeds every cell
      valQueries, idCol, vecCol, codebook, k, probeDepths,
      candidateCounts, dotFn)

  /** [[pqOperatingGrid]] with a CALLER-SUPPLIED ground truth — the
    * "don't compute twice" seam for callers that already pay the exact
    * pass for their own output (a calibration query typically emits
    * the brute-force baseline it calibrates against): `groundTruth`
    * must be [[bruteForceTopK]] over the SAME (corpus, valQueries, k)
    * — anything else and the grid's recall is against the wrong answer
    * key — and should be PINNED (localCheckpoint) by the caller: the
    * grid consumes it twice (possible-count + hit semi-join), and a
    * lazy frame would re-pay the exact pass, exactly what this seam
    * exists to avoid. No re-pin here — the pinned frame is
    * |valQueries|·k id pairs (~16 B each), and a second eager
    * checkpoint job would cost more than it saves on an
    * overhead-dominated calibration. [[pqOperatingGrid]] is exactly
    * this seam fed with its own pinned pass; grid values are identical
    * by construction. */
  def pqOperatingGridFromTruth(storePath: String, index: DataFrame,
      groundTruth: DataFrame, valQueries: DataFrame, idCol: String,
      vecCol: String, codebook: Seq[Seq[Seq[Double]]], k: Int,
      probeDepths: Seq[Int], candidateCounts: Seq[Int],
      dotFn: (Column, Column) => Column = dot): DataFrame = {
    require(probeDepths.nonEmpty && candidateCounts.nonEmpty,
      "pqOperatingGrid needs at least one probe depth and one " +
        "candidate count")
    require(candidateCounts.forall(_ >= k),
      s"every shortlist size must be >= k=$k")
    val spark = valQueries.sparkSession
    import spark.implicits._
    val truth = groundTruth.select(col("query_id"), col("neighbor_id"))
    val nPossible = truth.count()
    require(nPossible > 0,
      "pqOperatingGrid: no ground-truth rows (empty corpus or queries)")
    val depths = probeDepths.distinct.sorted
    val cands = candidateCounts.distinct.sorted
    val perCell = pqGridCells(storePath, index, valQueries, idCol,
      vecCol, codebook, k, depths, cands, dotFn)
    val hitCounts = perCell
      .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("n_probe"), col("candidates"))
      .agg(count(lit(1)).as("hits"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val cells = for {
      p <- depths
      c <- cands
    } yield {
      val hits = hitCounts.getOrElse((p.toLong, c.toLong), 0L)
      (p, c, hits, nPossible, 10000L * hits / nPossible)
    }
    cells.toDF("n_probe", "candidates", "hits", "possible", "recall_e4")
      .select(col("n_probe").cast("long"), col("candidates").cast("long"),
        col("hits"), col("possible"), col("recall_e4"))
  }

  /** The grid's one-pass cell derivation ([[pqOperatingGrid]] body —
    * exposed at package visibility for plan capture): every
    * (query, candidate) in the DEEPEST probe's partitions is scored
    * ONCE with the serve's exact ADC and rerank expressions, then each
    * cell (p, c) is a filter (centroid rank ≤ p) + rank (ADC top-c) +
    * rank (exact top-k) over that pinned pool, tagged and unioned.
    * Row-for-row equal to re-executing [[ivfPqTopKFromStore]] per cell
    * (spec-pinned): the probe window, tombstone exclusion,
    * self-exclusion, and both (score desc, id) tie-breaks are the
    * serve's own. */
  private[graft] def pqGridCells(storePath: String, index: DataFrame,
      valQueries: DataFrame, idCol: String, vecCol: String,
      codebook: Seq[Seq[Seq[Double]]], k: Int, depths: Seq[Int],
      cands: Seq[Int],
      dotFn: (Column, Column) => Column = dot): DataFrame = {
    // fail as loudly as the serve for direct callers: an empty lever
    // list would surface as an opaque reduce() throw below, and a
    // shortlist below k silently under-fills cells (ADVICE r14)
    require(depths.nonEmpty && cands.nonEmpty,
      "pqGridCells needs at least one probe depth and one shortlist size")
    require(cands.forall(_ >= k),
      s"every shortlist size must be >= k=$k, got ${cands.mkString(",")}")
    val spark = valQueries.sparkSession
    val pMax = depths.max
    val d = dotFn
    val m = codebook.size
    val sub = codebook.head.head.size
    // probe ranking at the DEEPEST depth, keeping each candidate
    // partition's per-query centroid rank — the rank a serve at depth
    // p admits iff prank <= p (same (csim desc, part) tie-break as
    // ivfPqTopKFromStore's probe window)
    val q = valQueries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("part"))
    val probes = q
      .join(broadcast(index.select(col("part"), col("centroid"))))
      .select(col("query_id"), col("qv"), col("part"),
        d(col("qv"), col("centroid")).as("csim"))
      .withColumn("prank", row_number().over(probeW))
      .where(col("prank") <= pMax)
    // bounded driver collect (|q| × pMax ids) — buys the partition
    // filter, same contract as the serve
    val probedParts = probes.select(col("part").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val qvd = col("qv").cast("array<double>")
    val qtab = array((0 until m).map(j =>
      array(codebook(j).map(c =>
        d(slice(qvd, j * sub + 1, sub), typedlit(c))): _*)): _*)
    val qWithTab = probes.select(col("query_id"), col("qv"),
      col("part").cast("long").as("part"), col("prank"),
      qtab.as("__qtab"))
    val storeTomb = loadStoreTombstones(spark, storePath)
    val codes = minusStoreTombstones(
      spark.read.parquet(storePath)
        .where(col("part").isin(probedParts: _*)),
      idCol, storeTomb)
      .select(col(idCol).as("neighbor_id"), col("pq_codes"),
        col(vecCol).as("cv"), col("part").cast("long").as("part"))
    val adc = aggregate(
      zip_with(col("pq_codes"), col("__qtab"),
        (code, tab) => element_at(tab, code + 1)),
      lit(0.0), _ + _)
    // the scored pool: every (query, candidate-in-a-probed-partition)
    // with the serve's ADC score AND its exact rerank score — both
    // pure per pair, so every cell ranks over these same values
    val pool = codes.join(broadcast(qWithTab), Seq("part"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("prank"), col("neighbor_id"),
        adc.as("asim"), d(col("qv"), col("cv")).as("sim"))
      .localCheckpoint(true) // ONE scan feeds every cell
    val sw = Window.partitionBy(col("query_id"))
      .orderBy(col("asim").desc, col("neighbor_id"))
    val rw = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    depths.flatMap { p =>
      val short = pool.where(col("prank") <= p)
        .withColumn("srank", row_number().over(sw))
      cands.map { c =>
        short.where(col("srank") <= c)
          .withColumn("rank", row_number().over(rw))
          .where(col("rank") <= k)
          .select(lit(p.toLong).as("n_probe"),
            lit(c.toLong).as("candidates"),
            col("query_id"), col("neighbor_id"))
      }
    }.reduce(_ unionAll _)
  }

  /** Stamp the CHEAPEST qualifying PQ operating point from a
    * [[pqOperatingGrid]]: smallest `n_probe` whose grid row clears the
    * target at ANY shortlist (probed partitions bound the bytes a
    * serve reads — the IO-dominant lever), then the smallest
    * `candidates` at that depth (rerank fetches — the secondary,
    * row-bounded lever). Lands as `path/__pq_operating_point`, the
    * default for [[ivfPqTopKFromStore]]'s sentinel arguments.
    * Unreachable target is LOUD, like [[stampOperatingPoint]].
    *
    * @return the stamped (nProbe, candidates) */
  def stampPqOperatingPoint(spark: org.apache.spark.sql.SparkSession,
      path: String, grid: DataFrame, targetRecallE4: Long): (Int, Int) = {
    import spark.implicits._
    val ok = grid.where(col("recall_e4") >= targetRecallE4)
      .select(col("n_probe").cast("long"), col("candidates").cast("long"))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt))
    require(ok.nonEmpty,
      s"stampPqOperatingPoint: no grid cell reaches recall_e4 >= " +
        s"$targetRecallE4 — widen the grid, re-train, or lower the " +
        s"target")
    val (p, c) = ok.minBy(identity)
    Seq((targetRecallE4, p, c))
      .toDF("target_recall_e4", "n_probe", "candidates")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/__pq_operating_point")
    (p, c)
  }

  /** The PQ store's stamped (target recall, probe depth, shortlist),
    * if calibration ever ran. */
  def loadPqOperatingPoint(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[(Long, Int, Int)] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/__pq_operating_point")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else spark.read.parquet(p.toString)
      .select(col("target_recall_e4").cast("long"),
        col("n_probe").cast("int"), col("candidates").cast("int"))
      .collect().headOption
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
  }

  /** IVF top-k: probe the `nProbe` partitions with the most-similar
    * centroids per query, exact-rank within the probed subset.
    * Output schema matches [[bruteForceTopK]].
    *
    * @param index pre-built centroid table ([[centroids]] output) — the
    *   IVF index is built ONCE offline in deployment; passing it here
    *   keeps query latency free of the index-build aggregation. Omitted
    *   → computed inline (convenience/tests). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, partCol: String, k: Int, nProbe: Int,
      dotFn: (Column, Column) => Column = dot,
      index: Option[DataFrame] = None): DataFrame = {
    val d = dotFn
    val cent = index.getOrElse(centroids(corpus, partCol, vecCol))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("part"))
    val probes = q.join(broadcast(cent))
      .select(col("query_id"), col("qv"), col("part"),
        d(col("qv"), col("centroid")).as("csim"))
      .withColumn("prank", row_number().over(probeW))
      .where(col("prank") <= nProbe)
      .select(col("query_id"), col("qv"), col("part"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(partCol).as("part"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(probes), Seq("part"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        d(col("qv"), col("cv")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }
}
