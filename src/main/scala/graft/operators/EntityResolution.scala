package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Entity resolution (record linkage) over a noisy string attribute:
  * token blocking → edit-distance scoring → transitive entity
  * clusters → canonical value per entity. The classic curation step a
  * training-data platform runs over crawled metadata (publisher names,
  * site titles, author strings) before any groupBy on the attribute is
  * meaningful — "cold anvil" and "old anvil" are one vendor with a
  * typo, and every per-entity statistic is wrong until they merge.
  *
  * The reference engine has no linkage surface (its dimensions are
  * exact-match categories, `src/time_series_storage/core.clj:35-52`);
  * this plane is beyond-reference, built from the same bounded-pairs
  * discipline as [[Dedup]].
  *
  * Scale shape — the three levers, in order:
  *
  *  1. '''Distinct values first.''' All pairwise work runs over the
  *     DISTINCT normalized attribute values, never over records: a
  *     100 TB fact table with a million distinct vendor strings does
  *     its fuzzy matching on the million, and records rejoin the
  *     resolved entity by one equality hash join at the end. Pairwise
  *     cost scales with attribute cardinality, not corpus size.
  *  2. '''Token blocking with a df cap.''' Candidate pairs must share
  *     ≥1 whitespace token ([[Dedup]]'s posting-list shape): |values|²
  *     never materializes. A token shared by more than `maxTokenDf`
  *     distinct values is dropped as a block key — its pairs are the
  *     quadratic noise blocks ("inc", "ltd") that dominate runtime and
  *     match nothing. Recall argument for the `maxDist = 1` default:
  *     one edit touches at most one token of a multi-token value, so
  *     every true match still shares each untouched token verbatim and
  *     survives blocking unless ALL its shared tokens are df-hot.
  *  3. '''Early-exit scoring.''' The verifier is Spark's codegen'd
  *     `levenshtein(l, r, threshold)` (returns −1 the moment the
  *     distance exceeds the bound — O(maxDist·len) per pair, not
  *     O(len²)), so scoring cost is capped per candidate.
  *
  * Entity labels come from [[Dedup.connectedComponents]] over the
  * value-match graph (node = distinct value, keyed by the value's
  * minimum record id so labels are stable Long ids), giving the usual
  * transitive-closure semantics: a chain a~b~c is one entity even when
  * `dist(a, c) > maxDist`.
  */
object EntityResolution {

  /** Normalization applied to the attribute before any comparison:
    * lowercase, outer whitespace trimmed. Kept deliberately minimal —
    * domain scrubs (punctuation, legal suffixes) belong upstream. */
  def normalized(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lower(trim(c))

  /** The distinct normalized values of `valueCol` with a stable Long
    * node id (the value's minimum record id — deterministic under any
    * partitioning) and the value's record support. One hash
    * aggregation on the value; records never carry past this point.
    * MATERIALIZED eagerly (attribute-cardinality rows by
    * construction): every downstream ER stage references this frame
    * repeatedly — posting build, df cap, verify joins, label joins —
    * and without lineage truncation each reference re-runs the
    * records aggregation (measured 4.2→1.6 s on `er_incremental`).
    * Output: (`value`, `node_id`, `n_records`). */
  def distinctValues(records: DataFrame, idCol: String,
      valueCol: String): DataFrame =
    records
      .select(col(idCol).cast(LongType).as("__id"),
        normalized(col(valueCol)).as("value"))
      .where(col("value").isNotNull && length(col("value")) > 0)
      .groupBy(col("value"))
      .agg(min(col("__id")).as("node_id"),
        count(lit(1)).as("n_records"))
      .localCheckpoint(true)

  /** The token posting list of a distinct-values frame: one row per
    * (value, distinct whitespace token). */
  private def tokens(values: DataFrame): DataFrame =
    values.select(col("value"),
      explode(array_distinct(split(col("value"), "\\s+"))).as("t"))

  /** Token-blocked candidate pairs over a distinct-values frame
    * ([[distinctValues]] output or any frame with a `value` column):
    * unordered value pairs sharing ≥1 whitespace token whose df is ≤
    * `maxTokenDf`. Same posting-list join as
    * [[Dedup.jaccardPairsKernel]] — blocks bound the join fan-out, hot
    * block keys are dropped, and the pair set is DISTINCT so a pair
    * sharing k tokens costs one row downstream.
    * Output: (`val_a`, `val_b`) with `val_a < val_b`. */
  def candidatePairs(values: DataFrame, maxTokenDf: Long): DataFrame = {
    val tok = tokens(values)
    val keep = tok.groupBy(col("t"))
      .agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxTokenDf)
      .select(col("t"))
    val a = tok.join(keep, Seq("t")).select(col("t"), col("value").as("val_a"))
    val b = tok.select(col("t"), col("value").as("val_b"))
    a.join(b, Seq("t"))
      .where(col("val_a") < col("val_b"))
      .select(col("val_a"), col("val_b"))
      .distinct()
  }

  /** Multi-blocker candidate pairs: token blocks ∪ prefix-`p` blocks ∪
    * suffix-`p` blocks, one df cap across all block kinds. Every block
    * key is kind-tagged (`t`/`p`/`s` + `` separator), so the
    * three key spaces are STRICTLY disjoint — a token that happens to
    * start with `^`/`$` (or contain any marker) can never alias a
    * prefix/suffix key, and a value's own token can never dedup
    * against its prefix/suffix key, keeping block df counts identical
    * between the operator and any set-semantics oracle. Closes [[candidatePairs]]'s
    * single-token recall gap: a 1-edit typo inside a value's ONLY
    * token shares no token block, but any single edit at position i
    * preserves the first `p` chars (i ≥ p) or the last `p`
    * (i < len−p) — for values of length ≥ 2p+1 one of the two always
    * survives, so prefix ∪ suffix blocking has FULL 1-edit recall
    * there (spec-pinned). Cost honesty: prefix/suffix blocks are
    * hotter than token blocks (alphabet²-ish fan-in), so the df cap
    * is the lever that keeps them from going quadratic — a dropped
    * hot block costs recall on that prefix, exactly what
    * [[blockingProfile]] measures. */
  def candidatePairsMulti(values: DataFrame, maxBlockDf: Long,
      p: Int = 2): DataFrame = {
    val keys = values.select(col("value"), explode(array_union(
      transform(array_distinct(split(col("value"), "\\s+")),
        t => concat(lit("t"), t)),
      array(concat(lit("p"), expr(s"left(value, $p)")),
        concat(lit("s"), expr(s"right(value, $p)"))))).as("t"))
    val keep = keys.groupBy(col("t"))
      .agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxBlockDf)
      .select(col("t"))
    val a = keys.join(keep, Seq("t")).select(col("t"), col("value").as("val_a"))
    val b = keys.select(col("t"), col("value").as("val_b"))
    a.join(b, Seq("t"))
      .where(col("val_a") < col("val_b"))
      .select(col("val_a"), col("val_b"))
      .distinct()
  }

  /** [[matches]] over the multi-blocker candidates — full 1-edit
    * recall for values of length ≥ 2p+1 (modulo df-capped hot
    * blocks). Same verification and scoring. */
  def matchesMulti(records: DataFrame, idCol: String, valueCol: String,
      maxDist: Int, maxBlockDf: Long, p: Int = 2): DataFrame = {
    val values = distinctValues(records, idCol, valueCol)
    candidatePairsMulti(values, maxBlockDf, p)
      .withColumn("dist",
        levenshtein(col("val_a"), col("val_b"), maxDist).cast(LongType))
      .where(col("dist") >= 0)
      .withColumn("sim_e4", {
        val glen = greatest(length(col("val_a")), length(col("val_b")))
        floor(lit(10000) * (glen - col("dist")) / glen).cast(LongType)
      })
  }

  /** Blocking-quality profile — the observability read that tunes
    * `maxTokenDf` BEFORE paying for a bad blocking run: one row with
    * the distinct-value count, block-key (token) count, how many block
    * keys the df cap dropped, the surviving candidate-pair count, and
    * the blocking reduction in basis points of the all-pairs count
    * (`reduction_e4 = floor(10⁴·candidates / C(n_values, 2))` — the
    * fraction of the quadratic work the blocker actually does; near
    * 10⁴ means the blocking is useless, near 0 means it prunes hard).
    * Every aggregate is a count over frames the ER run needs anyway;
    * the 1-row combine is a bounded cross join. */
  def blockingProfile(records: DataFrame, idCol: String, valueCol: String,
      maxTokenDf: Long): DataFrame = {
    val values = distinctValues(records, idCol, valueCol)
    val dfc = tokens(values).groupBy(col("t"))
      .agg(count(lit(1)).as("c"))
    val nValues = values.agg(count(lit(1)).as("n_values"))
    val tokStats = dfc.agg(count(lit(1)).as("n_tokens"),
      sum(when(col("c") > maxTokenDf, 1L).otherwise(0L)).as("n_hot"))
    val nCand = candidatePairs(values, maxTokenDf)
      .agg(count(lit(1)).as("n_candidates"))
    nValues.crossJoin(tokStats).crossJoin(nCand)
      .select(col("n_values"), col("n_tokens"), col("n_hot"),
        col("n_candidates"),
        // < 2 values → no pairs exist; 0 avoids an ANSI DIV-by-zero
        when(col("n_values") >= 2,
          expr("10000 * n_candidates DIV (n_values * (n_values - 1) DIV 2)"))
          .otherwise(lit(0L)).as("reduction_e4"))
  }

  /** Scored matches between distinct normalized values of `valueCol`:
    * token-blocked candidates verified at `levenshtein ≤ maxDist`,
    * with a length-normalized similarity in basis points —
    * `sim_e4 = floor(10⁴·(1 − dist / max(len_a, len_b)))`, integral so
    * the score is exact and engine-independent. The threshold form of
    * `levenshtein` early-exits above `maxDist` (−1), so the verify
    * cost per candidate is bounded.
    * Output: (`val_a`, `val_b`, `dist`, `sim_e4`), `val_a < val_b`. */
  def matches(records: DataFrame, idCol: String, valueCol: String,
      maxDist: Int, maxTokenDf: Long): DataFrame =
    matchesOnValues(distinctValues(records, idCol, valueCol), maxDist,
      maxTokenDf)

  /** [[matches]] over a pre-built [[distinctValues]] frame (shared by
    * [[entities]] so the distinct pass runs once). */
  def matchesOnValues(values: DataFrame, maxDist: Int,
      maxTokenDf: Long): DataFrame =
    candidatePairs(values, maxTokenDf)
      .withColumn("dist",
        levenshtein(col("val_a"), col("val_b"), maxDist).cast(LongType))
      .where(col("dist") >= 0) // threshold levenshtein: −1 means > maxDist
      .withColumn("sim_e4", {
        // integral numerator (10⁴·(maxlen − dist)) / maxlen: quotients
        // have denominator ≤ maxlen, so the double division is never
        // within an ulp of an integer it shouldn't cross — floor is
        // exact and engine-independent
        val glen = greatest(length(col("val_a")), length(col("val_b")))
        floor(lit(10000) * (glen - col("dist")) / glen).cast(LongType)
      })

  /** Entity label per VALUE node: connected components run ONLY over
    * the matched subgraph (nodes touched by ≥1 match edge) — an
    * unmatched value is a singleton entity by construction and needs
    * no propagation rounds. CC cost scales with the match graph, not
    * attribute cardinality: a billion distinct values with a thousand
    * fuzzy matches converge in rounds over two thousand nodes.
    * Output: (`node_id`, `entity`) for every value. */
  private def entityLabels(values: DataFrame, m: DataFrame): DataFrame = {
    val ids = values.select(col("value"), col("node_id"))
    val edges = m
      .join(ids.withColumnRenamed("value", "val_a")
        .withColumnRenamed("node_id", "na"), Seq("val_a"))
      .join(ids.withColumnRenamed("value", "val_b")
        .withColumnRenamed("node_id", "nb"), Seq("val_b"))
      .select(col("na"), col("nb"))
    val matched = edges.select(col("na").as("node_id"))
      .union(edges.select(col("nb").as("node_id")))
      .distinct()
    val cc = Dedup.connectedComponents(matched, "node_id", edges, "na", "nb")
    values.select(col("node_id"))
      .join(cc.withColumnRenamed("component", "entity"), Seq("node_id"),
        "left")
      .select(col("node_id"),
        coalesce(col("entity"), col("node_id")).as("entity"))
  }

  /** Resolved entity per record: records → distinct values → match
    * graph → [[entityLabels]] → label join back onto the records. The
    * entity id is the minimum `node_id` (= minimum record id)
    * reachable in the match graph, so labels are stable across
    * partitionings and runs. Records shuffle exactly once (the
    * equality join on the normalized value); all fuzzy work happens at
    * attribute cardinality, and the propagation rounds only over the
    * matched subgraph.
    * Output: one row per input record, (`idCol`, `value`, `entity`). */
  def entities(records: DataFrame, idCol: String, valueCol: String,
      maxDist: Int, maxTokenDf: Long): DataFrame = {
    val values = distinctValues(records, idCol, valueCol)
    val m = matchesOnValues(values, maxDist, maxTokenDf)
    records
      .select(col(idCol), normalized(col(valueCol)).as("value"))
      .where(col("value").isNotNull && length(col("value")) > 0)
      .join(values.select(col("value"), col("node_id")), Seq("value"))
      .join(entityLabels(values, m), Seq("node_id"))
      .select(col(idCol), col("value"), col("entity"))
  }

  /** INCREMENTAL resolution — the daily-arrivals path: resolve a new
    * batch of records against an already-resolved corpus WITHOUT
    * re-pairing the corpus against itself (the [[Dedup
    * .jaccardPairsAgainst]] discipline — cost scales with the batch).
    * Each new value blocks against the corpus token postings (df cap
    * on CORPUS frequency, so a boilerplate corpus token never explodes
    * a batch), verifies at `levenshtein ≤ maxDist`, and adopts the
    * entity of its BEST corpus match (min distance, ties to the
    * smallest entity id — deterministic); unmatched new values become
    * singleton entities labeled by their own minimum record id.
    * Deliberately never merges two existing entities (that is a
    * full-resolve decision, not an ingest decision — same contract as
    * incremental dedup never re-pairing old×old).
    *
    * ID contract: new-batch record ids must be DISJOINT from the
    * resolved corpus's entity ids — an unmatched new value becomes a
    * singleton entity labeled by its own minimum record id, and an
    * overlapping id would silently fuse that singleton with an
    * unrelated existing entity. `validateDisjoint = true` enforces the
    * contract with one anti-join-shaped probe (new node ids × resolved
    * entity ids, `limit(1)`), the [[Dedup.jaccardPairsAgainst]] guard.
    *
    * @param resolved (`value`, `entity`) for the existing corpus —
    *   [[entities]] output collapsed to values, or any attached store
    * @return one row per new record: (idCol, `value`, `entity`) */
  def resolveIncremental(newRecords: DataFrame, idCol: String,
      valueCol: String, resolved: DataFrame, maxDist: Int,
      maxTokenDf: Long, validateDisjoint: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val newValues = distinctValues(newRecords, idCol, valueCol)
    if (validateDisjoint) {
      val overlap = newValues.select(col("node_id").as("__id")).distinct()
        .join(resolved.select(col("entity").as("__id")).distinct(),
          Seq("__id")).limit(1)
      require(overlap.isEmpty,
        "resolveIncremental: new-batch record ids overlap resolved " +
          "entity ids — singleton labels require disjoint id spaces")
    }
    val corpusValues = resolved.select(col("value")).distinct()
    val corpusTok = tokens(corpusValues)
    val keep = corpusTok.groupBy(col("t"))
      .agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxTokenDf)
      .select(col("t"))
    val cand = tokens(newValues.select(col("value")))
      .withColumnRenamed("value", "val_new")
      .join(corpusTok.join(keep, Seq("t"))
        .withColumnRenamed("value", "val_old"), Seq("t"))
      .select(col("val_new"), col("val_old"))
      .distinct()
    val scored = cand
      .withColumn("dist",
        levenshtein(col("val_new"), col("val_old"), maxDist).cast(LongType))
      .where(col("dist") >= 0)
      .join(resolved.withColumnRenamed("value", "val_old"), Seq("val_old"))
    val best = Window.partitionBy(col("val_new"))
      .orderBy(col("dist").asc, col("entity").asc)
    val assigned = scored
      .withColumn("__rk", row_number().over(best))
      .where(col("__rk") === 1)
      .select(col("val_new").as("value"), col("entity"))
    newRecords
      .select(col(idCol), normalized(col(valueCol)).as("value"))
      .where(col("value").isNotNull && length(col("value")) > 0)
      .join(newValues.select(col("value"), col("node_id")), Seq("value"))
      .join(assigned, Seq("value"), "left")
      .select(col(idCol), col("value"),
        coalesce(col("entity"), col("node_id")).as("entity"))
  }

  /** Canonical value per resolved entity — the survivorship rule:
    * highest record support wins, ties broken by the lexicographically
    * smallest value (deterministic). One window partitioned by entity
    * over the VALUES frame (attribute cardinality, never records).
    * Output: (`entity`, `canonical`, `n_values`, `n_records`). */
  def canonicalValues(records: DataFrame, idCol: String, valueCol: String,
      maxDist: Int, maxTokenDf: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val values = distinctValues(records, idCol, valueCol)
    val m = matchesOnValues(values, maxDist, maxTokenDf)
    val byEnt = Window.partitionBy(col("entity"))
    val ranked = Window.partitionBy(col("entity"))
      .orderBy(col("n_records").desc, col("value").asc)
    values
      .join(entityLabels(values, m), Seq("node_id"))
      .withColumn("n_values", count(lit(1)).over(byEnt))
      .withColumn("__tot", sum(col("n_records")).over(byEnt))
      .withColumn("__rk", row_number().over(ranked))
      .where(col("__rk") === 1)
      .select(col("entity"), col("value").as("canonical"),
        col("n_values"), col("__tot").as("n_records"))
  }
}
