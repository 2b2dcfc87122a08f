package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Dataset profiling — the "dataset card" numbers every curation
  * pipeline wants before and after each stage: per column, row/null
  * counts, exact distinct cardinality, and min/max rendered as
  * strings.
  *
  * Scale shape: ONE single-column aggregation per profiled column,
  * unioned — deliberately not one wide aggregate, because k exact
  * `count(distinct)`s in one Aggregate plan via Expand multiply the
  * scanned rows by k BEFORE the shuffle, while k separate
  * aggregations each read ONLY their own column from parquet
  * (column pruning does the work) and run the standard two-phase
  * distinct. All map-side combinable; no collect; output is k rows.
  * For a quick inexact profile swap `count_distinct` for
  * `approx_count_distinct` at the call site — the shape is the same.
  */
object Profiling {

  /** COUNT-MIN JOIN-SIZE ESTIMATE — plan-time cardinality estimation,
    * the number the broadcast/salt/bucket decisions at 100 TB hinge
    * on: |A ⋈ B on k| = Σ_k cntA(k)·cntB(k), estimated from two
    * depth×width count-min sketches as `min_i Σ_bucket Ai(b)·Bi(b)`
    * (the classic CMS inner-product estimator — always an
    * OVERestimate, collisions only add mass; error shrinks as
    * 1/width). Each side costs one pass building a depth×width counter
    * table (fixed size regardless of input) instead of the per-key
    * count-and-join the exact answer needs — at a trillion rows the
    * sketch is KBs where the exact key profile is another shuffle of
    * the key universe. Hashes are the same seeded md5 family as
    * [[Dedup.seededHash]] (seeds 1000+i), so a SQL oracle replicates
    * the estimate bit-for-bit. Null keys never join and are excluded.
    *
    * Also returns the EXACT size (per-key count join — products and
    * sums in decimal(38,0), overflow-proof) so callers can gate the
    * estimate; skip reading `exact_rows` when only the estimate is
    * affordable. Output: ONE row (est_rows, exact_rows). */
  def joinSizeEstimate(a: DataFrame, aKey: String, b: DataFrame,
      bKey: String, depth: Int = 4, width: Int = 4096): DataFrame = {
    require(depth >= 1 && depth <= 16 && width >= 2,
      s"need 1 <= depth <= 16 and width >= 2, got ($depth, $width)")
    def sketch(df: DataFrame, key: String, cntName: String): DataFrame = {
      val k = col(key).cast(StringType)
      val hashes = array((0 until depth).map(i =>
        pmod(Dedup.seededHash(k, 1000 + i), lit(width.toLong))): _*)
      df.where(col(key).isNotNull)
        .select(posexplode(hashes).as(Seq("i", "bkt")))
        .groupBy(col("i"), col("bkt")).agg(count(lit(1)).as(cntName))
    }
    val dec = "decimal(38,0)"
    // cast ONE OPERAND before multiplying — a Long×Long product wraps
    // silently at ~4e9×4e9 rows per side, exactly the scale this
    // operator exists for; decimal×long promotes and cannot
    val prod = (c1: Column, c2: Column) => c1.cast(dec) * c2
    val sums = sketch(a, aKey, "ca").join(sketch(b, bKey, "cb"),
        Seq("i", "bkt"))
      .groupBy(col("i"))
      .agg(sum(prod(col("ca"), col("cb"))).as("e"))
    // a depth row whose buckets are DISJOINT across the two sketches
    // produces no join rows but means a ZERO estimate — the min must
    // see it, so the per-row sums join back onto the full 0..depth-1
    // spine (a shared key would collide in every row, so a missing
    // row also proves the exact size is 0)
    val spine = a.sparkSession.range(depth).select(col("id").cast("int").as("i"))
    val est = spine.join(sums, Seq("i"), "left")
      .agg(min(coalesce(col("e"), lit(0).cast(dec))).cast(dec)
        .as("est_rows"))
    val ea = a.where(col(aKey).isNotNull)
      .groupBy(col(aKey).cast(StringType).as("k"))
      .agg(count(lit(1)).as("ca"))
    val eb = b.where(col(bKey).isNotNull)
      .groupBy(col(bKey).cast(StringType).as("k"))
      .agg(count(lit(1)).as("cb"))
    val exact = ea.join(eb, Seq("k"))
      .agg(coalesce(sum(prod(col("ca"), col("cb"))),
        lit(0).cast(dec)).as("exact_rows"))
    // combine the two scalar aggregates WITHOUT a join: a 1×1 cross
    // join would be just as cheap, but it is indistinguishable from
    // the unbounded hazard to a pre-execution audit (and a
    // constant-key equi-join folds back into one) — this operator
    // should pass its own sibling linter ([[graft.plans.PlanLint]]),
    // so the scalars ride a tagged union into one final aggregation
    est.select(lit("e").as("__m"), col("est_rows").as("__v"))
      .unionByName(exact.select(lit("x").as("__m"),
        col("exact_rows").as("__v")))
      .agg(max(when(col("__m") === "e", col("__v"))).cast(dec)
          .as("est_rows"),
        max(when(col("__m") === "x", col("__v"))).cast(dec)
          .as("exact_rows"))
  }

  /** @return one row per profiled column:
    *   (column, n_rows, n_nulls, n_distinct, min_val, max_val) */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    cols.map { c =>
      df.select(col(c))
        .agg(count(lit(1L)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
          count_distinct(col(c)).as("n_distinct"),
          min(col(c)).cast(StringType).as("min_val"),
          max(col(c)).cast(StringType).as("max_val"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_.unionByName(_))
  }

  /** Token-distribution drift between two corpus snapshots — the
    * data-drift monitor a continuously-ingesting training pipeline
    * runs between yesterday's corpus and today's (or between a source
    * and the mixture): per-token KL contribution
    * `p·ln(p/q)` over the combined top-`k` vocabulary, with add-one
    * (Laplace) smoothing so a token absent on one side contributes a
    * finite penalty instead of ∞. Σ over the rows is the (truncated,
    * smoothed) KL divergence D(A ‖ B).
    *
    * Exactness: token counts and totals are exact longs; `p`, `q`
    * are single divisions of exactly-representable operands; each
    * token's contribution floors to an e9 integer so the consumer's
    * Σ is an exact integer sum — deterministic against the DuckDB
    * oracle (ln precedent: [[TextAnalysis.tfIdfTopTerms]]).
    *
    * Scale shape: one (token) aggregation per side (map-side
    * combined), an outer join on the ≤2·distinct-token key space,
    * a distributed TakeOrdered for the top-k cut (never a global
    * single-partition window), and 1-row broadcast totals. The
    * vocabulary size V that the smoothing needs is the actual cut
    * size, joined in as a broadcast count — both engines derive it
    * from the same cut, so build and oracle cannot disagree.
    *
    * @return top-k rows (token, cnt_a, cnt_b, kl_e9), the combined
    *   count (desc, token asc) cut. */
  def tokenDrift(dfA: DataFrame, dfB: DataFrame, textCol: String,
      k: Int = 100): DataFrame = {
    def tf(df: DataFrame) = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    tokenDriftFromCounts(tf(dfA), tf(dfB), k)
  }

  /** Drift scored from per-side `(token, cnt)` frames — the shared
    * tail of [[tokenDrift]] and [[tokenDriftFromIndex]], kept single
    * so the corpus-scan and index-derived forms cannot diverge in
    * their double arithmetic. */
  def tokenDriftFromCounts(ta0: DataFrame, tb0: DataFrame,
      k: Int): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val ta = ta0.withColumnRenamed("cnt", "cnt_a")
    val tb = tb0.withColumnRenamed("cnt", "cnt_b")
    val joined = ta.join(tb, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    val top = joined
      .orderBy((col("cnt_a") + col("cnt_b")).desc, col("token").asc)
      .limit(k)
    val totals = joined.agg(sum(col("cnt_a")).as("__tot_a"),
      sum(col("cnt_b")).as("__tot_b"))
    val vocab = top.agg(count(lit(1)).as("__v"))
    val p = (col("cnt_a") + lit(1.0)) / (col("__tot_a") + col("__v"))
    val q = (col("cnt_b") + lit(1.0)) / (col("__tot_b") + col("__v"))
    top.crossJoin(broadcast(totals)).crossJoin(broadcast(vocab))
      .withColumn("kl_e9",
        floor((lit(1000000000.0) * p) * log(p / q)).cast(LongType))
      .select(col("token"), col("cnt_a"), col("cnt_b"), col("kl_e9"))
  }

  /** Token drift derived FROM a BM25 postings index
    * (`TextAnalysis.buildTextIndex` layout) — the retrieval store
    * doubles as the drift-monitoring substrate: per-side token counts
    * are one `sum(tf)` aggregation over the chosen `__batch_id`
    * partitions (partition-pruned), no corpus re-scan, no
    * re-tokenization. With batches that mirror two ingest snapshots
    * this is the yesterday-vs-today check for free.
    *
    * @param batchesA/`batchesB` `__batch_id` partition values for
    *   each side (e.g. yesterday's batches vs today's). */
  def tokenDriftFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, batchesA: Seq[Long], batchesB: Seq[Long],
      k: Int = 100): DataFrame = {
    require(batchesA.nonEmpty && batchesB.nonEmpty,
      "both drift sides need at least one batch")
    require(batchesA.toSet.intersect(batchesB.toSet).isEmpty,
      "drift sides must not share batches")
    // erased docs (TextAnalysis.eraseFromTextIndex tombstones) leave
    // the drift profile too — the monitor must not keep counting a
    // deletion request's tokens
    val posts = TextAnalysis.minusTombstonesOf(spark, path,
      spark.read.parquet(s"$path/postings"))
    def side(ids: Seq[Long]) = posts
      .where(col("__batch_id").cast("long").isin(ids: _*))
      .groupBy(col("token")).agg(sum(col("tf")).as("cnt"))
    tokenDriftFromCounts(side(batchesA), side(batchesB), k)
  }
}
