package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Text-analysis scalar operators for the training-data-pipeline
  * surface: language-ID, quality scoring, token counting, document
  * fingerprinting. All are row-local column expressions (no UDFs, no
  * shuffles — they stay inside whole-stage codegen and scale linearly
  * with input splits), built from deterministic md5-derived hashes so
  * Spark results hash-match the DuckDB oracle exactly.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  /** Learned vocabulary: the corpus's top-`k` whitespace tokens by
    * occurrence count (ties broken by term), ids 1..k in that order.
    * One map-side-combined aggregation + a k-row driver collect — the
    * same bounded driver footprint as broadcast centroids
    * (Similarity). */
  def buildVocab(df: DataFrame, textCol: String, k: Int): Map[String, Long] = {
    require(k > 0, "k must be positive")
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => r.getString(0) -> (i + 1L) }.toMap
  }

  /** Tokenize against a learned vocabulary — the id-mapping step that
    * turns a curated corpus into trainer input. The vocab rides as a
    * MAP LITERAL, so the whole mapping is row-local codegen'd column
    * algebra: split → per-token `try_element_at` lookup → unk
    * fallback. Zero shuffles, zero joins, no UDF — linear in input
    * splits at any corpus size. (Map literals suit vocab sizes up to
    * ~10⁴ entries; a 10⁵+ BPE vocab should switch to a broadcast-join
    * formulation to keep codegen size bounded.)
    *
    * Output keeps trainer-shaped results scalar so the DuckDB oracle
    * can hash them: token count, unk count, and an md5 digest of the
    * comma-joined id sequence — the digest pins every id AND its
    * order without an array-compare dependency.
    * Output: (idCol, n_tokens, n_unk, ids_md5). */
  def tokenizeWithVocab(df: DataFrame, textCol: String, idCol: String,
      vocab: Map[String, Long], unkId: Long = 0L): DataFrame = {
    require(vocab.nonEmpty, "vocab must not be empty")
    require(!vocab.values.exists(_ == unkId),
      s"unkId $unkId collides with a vocab id")
    val m = typedlit(vocab)
    val toks = tokens(col(textCol))
    // raw lookups keep nulls so n_unk needs no sentinel comparison;
    // try_element_at (not element_at) because ANSI mode raises on
    // missing map keys — unknown tokens are expected input here
    val looked = transform(toks, t => try_element_at(m, t))
    val ids = transform(looked, x => coalesce(x, lit(unkId)))
    df.select(col(idCol),
      size(toks).cast(LongType).as("n_tokens"),
      size(filter(looked, x => x.isNull)).cast(LongType).as("n_unk"),
      md5(concat_ws(",", transform(ids, _.cast("string")))).as("ids_md5"))
  }

  /** [[buildVocab]]'s distributed twin: the top-`k` vocabulary as a
    * DataFrame `(token, tid)` with ids 1..k in (count desc, token)
    * order — for BPE-scale vocabularies (50k–250k entries) that should
    * ride a broadcast join rather than a collected map literal. The
    * ranking window runs over the already-`limit(k)`-bounded frame, so
    * the single-partition sort it implies is k rows, never the corpus
    * vocabulary — [[graft.plans.PlanLint]]'s `single-partition-window`
    * rule exempts exactly this shape (window input bounded by an
    * in-plan limit; exemption spec-pinned). The explicit `maxK` bound
    * makes the k-row envelope LOUD: past ~10⁶ entries the one-task
    * rank is no longer cheap and the id assignment should move to the
    * distributed prefix-sum machinery ([[graft.operators.Packing]]). */
  def buildVocabTable(df: DataFrame, textCol: String, k: Int,
      maxK: Int = 1 << 20): DataFrame = {
    require(k > 0, "k must be positive")
    require(k <= maxK,
      s"buildVocabTable: k=$k exceeds maxK=$maxK — the final rank runs " +
        "in one task over k rows; for larger vocabularies assign ids " +
        "with the distributed prefix-sum machinery instead")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("token"))
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)
      .withColumn("tid", row_number().over(w).cast(LongType))
      .select(col("token"), col("tid"))
  }

  /** [[tokenizeWithVocab]] at BPE scale: same output contract
    * (idCol, n_tokens, n_unk, ids_md5), but the vocabulary joins in as
    * a BROADCAST table instead of riding codegen as a map literal —
    * map literals blow up generated-code size past ~10⁴ entries, while
    * a 250k-row (token, tid) table is a few MB broadcast.
    *
    * Scale shape: posexplode to (doc, position, token) → broadcast
    * left join onto the vocab (unknown tokens keep a null tid) → one
    * hash aggregation back on the doc id, rebuilding the ORDERED id
    * sequence with a k-bounded per-doc sort (`array_sort` on
    * (position, id) structs collected per doc — state is the doc's
    * own token count, the same envelope the text column itself
    * occupies). One shuffle on the doc id, no skew (positions are
    * doc-local), vocabulary never collected to the driver. */
  def tokenizeWithVocabTable(df: DataFrame, textCol: String, idCol: String,
      vocabDf: DataFrame, unkId: Long = 0L): DataFrame = {
    val toks = df.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("__pos", "token")))
    toks.join(broadcast(vocabDf), Seq("token"), "left")
      .withColumn("__id", coalesce(col("tid"), lit(unkId)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("tid").isNull, 1L).otherwise(0L)).as("n_unk"),
        md5(concat_ws(",", transform(
          array_sort(collect_list(struct(col("__pos"), col("__id")))),
          s => s.getField("__id").cast("string")))).as("ids_md5"))
      .select(col(idCol), col("n_tokens"), col("n_unk"), col("ids_md5"))
  }

  /** Windowed token CO-OCCURRENCE with exact integral LIFT — the
    * association-mining read of a text corpus (collocations, feature
    * co-occurrence for taxonomy/embedding sanity checks, phrase-ish
    * signals without an n-gram index): every unordered token pair
    * within `window` positions of each other in a document, scored by
    * `lift_e4 = floor(10⁴ · P(a,b) / (P(a)·P(b)))`
    * `= (10⁴ · n_ab · N) DIV (n_a · n_b)` — the PMI exponential, kept
    * in EXACT integer arithmetic (decimal DIV: no float log, no
    * engine-dependent rounding), so rankings hash-compare across
    * engines.
    *
    * Scale shape: occurrences fan out `window`× on one side and meet
    * in ONE equi-join on (doc, position) — never a position-band range
    * join; Zipf-head tokens past `maxDf` (doc frequency) are removed
    * by a broadcast anti-join BEFORE the pair join (the hot-key
    * discipline — "the"-like tokens otherwise dominate the shuffle and
    * score ≈ independence anyway); `minCount` prunes the rare-pair
    * noise floor that dominates raw lift rankings. Totals (`n_a`,
    * `n_b`, `N`) are computed over the KEPT occurrences — the analyzed
    * universe — so probabilities sum to 1 over what was actually
    * paired. Same-token pairs (a, a) are legal output (a self-lift ≫
    * 10⁴ flags burst repetition).
    *
    * Output: (`tok_a`, `tok_b`, `n_ab`, `n_a`, `n_b`, `lift_e4`),
    * `tok_a ≤ tok_b`. */
  def cooccurrenceLift(df: DataFrame, textCol: String, idCol: String,
      window: Int, maxDf: Long, minCount: Long): DataFrame =
    cooccurrenceCore(df, textCol, idCol, window, minCount,
      dfTable => dfTable.where(col("__df") > maxDf))

  /** [[cooccurrenceLift]] with a FRACTIONAL df cap — the form that
    * survives a change of corpus size: a token is "hot" (excluded)
    * when it appears in more than `maxDfFracE4/10⁴` of the documents,
    * with the cap derived IN-PLAN as `N_docs · maxDfFracE4 DIV 10⁴`
    * (exact integer arithmetic — no float ceil to drift between
    * engines). An absolute cap tuned at one SF silently degenerates at
    * another (every collocation token "hot" at 10× the corpus → empty
    * result that gates nothing); the fraction keeps the kept-token
    * universe stable across scale. `maxDfFracE4 = 2000` ≡ "drop tokens
    * in >20% of docs". */
  def cooccurrenceLiftFrac(df: DataFrame, textCol: String, idCol: String,
      window: Int, maxDfFracE4: Long, minCount: Long): DataFrame = {
    require(maxDfFracE4 >= 1 && maxDfFracE4 <= 10000,
      s"maxDfFracE4: $maxDfFracE4 (1..10000)")
    // 1-row stats frame: the corpus size joins broadcast, never collects
    val nDocs = df.agg(count(lit(1)).as("__ndocs"))
    cooccurrenceCore(df, textCol, idCol, window, minCount,
      dfTable => dfTable.crossJoin(broadcast(nDocs))
        .where(col("__df") >
          expr(s"__ndocs * ${maxDfFracE4}L DIV 10000L")))
  }

  /** Shared co-occurrence body; `hotFilter` selects the excluded
    * Zipf-head rows from the per-token (tok, `__df`) doc-frequency
    * table. */
  private def cooccurrenceCore(df: DataFrame, textCol: String,
      idCol: String, window: Int, minCount: Long,
      hotFilter: DataFrame => DataFrame): DataFrame = {
    require(window >= 1 && window <= 16, s"window: $window (1..16)")
    require(minCount >= 1, "minCount must be >= 1")
    val occ = df
      .select(col(idCol).as("__doc"),
        posexplode(tokens(col(textCol))).as(Seq("__pos", "tok")))
      .where(length(col("tok")) > 0)
    val hot = hotFilter(occ.select(col("__doc"), col("tok")).distinct()
        .groupBy(col("tok")).agg(count(lit(1)).as("__df")))
      .select(col("tok"))
    val kept = occ.join(broadcast(hot), Seq("tok"), "left_anti")
    // left side fans out window×: (doc, pos + d, tok) meets the right
    // occurrence AT pos + d — one hash equi-join carries every offset
    val fan = kept.select(col("__doc"),
        explode(sequence(lit(1), lit(window))).as("__d"),
        col("__pos"), col("tok"))
      .select(col("__doc"), (col("__pos") + col("__d")).as("__pos"),
        col("tok").as("__tl"))
    val pairs = fan
      .join(kept.select(col("__doc"), col("__pos"),
        col("tok").as("__tr")), Seq("__doc", "__pos"))
      .select(least(col("__tl"), col("__tr")).as("tok_a"),
        greatest(col("__tl"), col("__tr")).as("tok_b"))
      .groupBy(col("tok_a"), col("tok_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minCount)
    val totals = kept.groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val bigN = kept.agg(count(lit(1)).as("N")) // 1-row stats frame
    pairs
      .join(totals.select(col("tok").as("tok_a"), col("n").as("n_a")),
        Seq("tok_a"))
      .join(totals.select(col("tok").as("tok_b"), col("n").as("n_b")),
        Seq("tok_b"))
      .crossJoin(broadcast(bigN))
      .select(col("tok_a"), col("tok_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        // decimal DIV: exact at any corpus size (10⁴·n_ab·N ≤ 10³⁰
        // fits DECIMAL(38,0); integer floor semantics match DuckDB's
        // HUGEINT //)
        expr("(CAST(10000 AS DECIMAL(38,0)) * n_ab * N) DIV " +
          "(CAST(n_a AS DECIMAL(38,0)) * n_b)")
          .cast(LongType).as("lift_e4"))
  }

  /** BPE MERGE TRAINING — the trainer-side twin of the vocab-mapped
    * tokenization above: learn the ordered merge table a byte-pair
    * tokenizer is defined by. The classic word-frequency formulation
    * (Sennrich et al. 2016, "Neural Machine Translation of Rare
    * Words with Subword Units"): training cost scales with the
    * DISTINCT-WORD dictionary, not the corpus — one corpus pass
    * builds (word, freq), then every iteration runs on that compact
    * frame. The most frequent pair wins each step (deterministic
    * tie-break: freq desc, then left/right asc — so the merge table
    * is independent of partitioning), and the merge applies
    * row-locally (greedy left-to-right, the BPE rule) to the
    * dictionary for the next round.
    *
    * Pair counts are DELTA-MAINTAINED (the classic fast-BPE trick,
    * distributed): the full adjacent-pair aggregation runs ONCE at
    * step 0; each merge step then recounts only the words that
    * actually CONTAIN the merged pair (typically a small fraction of
    * the dictionary), emitting −freq for their old pairs and +freq
    * for their post-merge pairs, folded into the standing count table
    * by one union-aggregate over (distinct pairs + deltas). A merge
    * step thus costs O(changed words + distinct pairs) instead of
    * O(total symbol occurrences) — at production nMerges (10⁴–10⁵)
    * this is the difference between hours and minutes. Zero-count
    * rows are dropped; a string-colliding revival (a later merge
    * fusing "a"+"b" into a symbol equal to an existing "ab") re-adds
    * its key through the same positive deltas, so the table always
    * equals the full recount (spec-pinned against a naive in-memory
    * reference on randomized dictionaries).
    *
    * Scale shape: the iterated state is the word dictionary — at
    * 100 TB of text still ~10⁸ rows of short symbol arrays, three
    * orders of magnitude under the corpus — plus the distinct-pair
    * count table (vocabulary²-bounded, far smaller in practice), both
    * checkpointed per step (O(1) lineage); the per-step driver
    * traffic is ONE argmax row.
    * O(nMerges) passes by construction; nMerges is a training
    * hyperparameter (10⁴–10⁵ in production BPE), so the loop is the
    * honest cost of the algorithm, not an artifact. Deliberately
    * NOT SQL-expressible (each step's tokenization depends on the
    * previous step's learned merge — an aggregation inside a
    * recursion), so the driver records the weaker rows-check; the
    * spec pins the merge table against a hand-computed reference.
    *
    * @return one row per learned merge: (step, left, right, freq) */
  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    require(nMerges >= 1 && nMerges <= 10000, s"nMerges: $nMerges")
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    var dict = words.as[(String, Long)]
      .map { case (w, f) =>
        (w.map(_.toString).toIndexedSeq :+ "</w>", f) }
      .localCheckpoint(true)
    def pairRows(syms: IndexedSeq[String],
        f: Long): Iterator[(String, String, Long)] =
      if (syms.length < 2) Iterator.empty
      else syms.sliding(2).map(p => (p(0), p(1), f))
    // the standing (l, r, freq) count table: full aggregation ONCE,
    // then delta-folded per merge step
    var pairCounts = dict
      .flatMap { case (syms, f) => pairRows(syms, f) }
      .toDF("l", "r", "freq")
      .groupBy(col("l"), col("r")).agg(sum(col("freq")).as("freq"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val top = pairCounts
        .orderBy(col("freq").desc, col("l").asc, col("r").asc)
        .head(1)
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, f) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step, l, r, f))
        // only words CONTAINING the merged pair change their pair
        // multiset — recount exactly those, as (−old, +new) deltas,
        // in ONE dict scan (the contains-check is the flatMap guard)
        val deltas = dict
          .flatMap { case (syms, freq) =>
            var i = 0
            var found = false
            while (i < syms.length - 1 && !found) {
              if (syms(i) == l && syms(i + 1) == r) found = true
              i += 1
            }
            if (!found) Iterator.empty
            else pairRows(syms, -freq) ++
              pairRows(mergePair(syms, l, r), freq)
          }
          .toDF("l", "r", "freq")
        pairCounts = pairCounts.unionByName(deltas)
          .groupBy(col("l"), col("r")).agg(sum(col("freq")).as("freq"))
          .where(col("freq") > 0)
          .localCheckpoint(true)
        dict = dict
          .map { case (syms, freq) => (mergePair(syms, l, r), freq) }
          .localCheckpoint(true)
        step += 1
      }
    }
    merges.toSeq.toDF("step", "left", "right", "freq")
  }

  /** BPE tokenization with a learned merge table — the SERVING side
    * of [[bpeTrain]] (subword-nmt semantics: repeatedly merge the
    * present pair with the LOWEST learned rank until none applies,
    * each application greedy left-to-right). The merge table
    * broadcasts as a rank map (a 50k-merge table is ~1 MB); the walk
    * is row-local — one pass over input splits, no shuffles beyond
    * the source read. Unknown characters pass through as themselves
    * (byte-fallback-style), so tokenization is total.
    *
    * Output: (idCol, n_pieces, pieces_md5) — the digest pins every
    * piece and its order for cross-run comparison. */
  def bpeTokenize(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rankBc = spark.sparkContext.broadcast(
      merges.zipWithIndex.toMap)
    df.select(col(idCol).cast(LongType), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rank = rankBc.value
        it.map { case (id, text) =>
          val pieces = text.toLowerCase.split("\\s+")
            .filter(_.nonEmpty)
            .flatMap { wd =>
              var syms: IndexedSeq[String] =
                wd.map(_.toString).toIndexedSeq :+ "</w>"
              var done = false
              while (!done && syms.length > 1) {
                var best = Int.MaxValue
                var bl = ""; var br = ""
                var i = 0
                while (i < syms.length - 1) {
                  val rk = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
                  if (rk < best) { best = rk; bl = syms(i); br = syms(i + 1) }
                  i += 1
                }
                if (best == Int.MaxValue) done = true
                else syms = mergePair(syms, bl, br)
              }
              syms
            }
          (id, pieces.length.toLong,
            graft.operators.Dedup.md5Hex(pieces.mkString(" ")))
        }
      }
      .toDF(idCol, "n_pieces", "pieces_md5")
  }

  /** One greedy left-to-right BPE merge application (the tokenizer
    * rule: after (l, r) is learned, every non-overlapping adjacent
    * occurrence becomes the fused symbol, scanning left to right). */
  private[graft] def mergePair(syms: IndexedSeq[String], l: String,
      r: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** Approximate heavy-hitters top-`k` terms via per-partition
    * MISRA–GRIES summaries + an exact recount of the merged candidate
    * set — the bounded-memory alternative to the exact
    * `vocab_top_terms` aggregation, whose shuffle carries the ENTIRE
    * vocabulary (billions of tokens at 100 TB) to find 50 winners.
    *
    * Guarantees (two-pass MG): each partition keeps at most
    * `capacity` counters; any token whose partition-local frequency
    * exceeds partitionTokens/capacity survives its summary, so any
    * token with GLOBAL frequency > N/capacity survives in at least
    * one partition — the candidate union (≤ capacity × partitions
    * rows, independent of vocabulary size) then gets EXACT counts in
    * a second pass filtered by the broadcast candidate set, so the
    * returned counts are exact and the top-k is the true top-k
    * whenever the kth frequency clears the N/capacity bar (at k ≪
    * capacity this holds for any Zipf-shaped corpus; a violation can
    * only DEMOTE a sub-bar tail term, never corrupt a count).
    *
    * Scale shape: pass 1 shuffles only candidate summaries (bounded
    * rows); pass 2 is a row-local broadcast `isin` filter + one hash
    * aggregation over ONLY candidate occurrences. The vocabulary
    * never materializes anywhere whole.
    *
    * @return (token, n) — the exact-recounted top-k,
    *         (n desc, token) ordered like the exact operator */
  def topTermsApprox(df: DataFrame, textCol: String, k: Int,
      capacity: Int = 4096): DataFrame = {
    require(k > 0 && capacity >= k, "need capacity >= k > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(explode(tokens(col(textCol))).as("token"))
      .as[String]
    val candidates = toks.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        if (counters.contains(t) || counters.size < capacity)
          counters(t) = counters.getOrElse(t, 0L) + 1L
        else {
          // decrement-all step; drop zeroed counters
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          counters.mapValuesInPlace((_, v) => v - 1L)
          counters.foreach { case (key, v) => if (v <= 0L) dead += key }
          dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("token").distinct()
    // candidate set ≤ capacity × partitions rows — broadcast-sized by
    // construction; the semi join is row-local on the occurrence side
    toks.toDF("token")
      .join(broadcast(candidates), Seq("token"), "left_semi")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)
  }

  /** Corpus bigram language model (beyond-reference; the n-gram LM
    * count step of classic LM training and LM-based quality scoring):
    * corpus counts of consecutive token pairs, each with its context
    * count (occurrences of `w1` as a bigram head) and the conditional
    * probability `cond_e6 = floor(10⁶·n_pair/n_ctx)` — P(w2|w1) in
    * parts-per-million, the same double expression the oracle
    * computes over identical integers. Top-`k` by pair count,
    * deterministic tie-break.
    *
    * Scale shape: the pair explode is the shingle explode (row-local),
    * then ONE hash aggregation on (w1, w2) keys; the context count
    * falls out of the PAIR table by a window sum over w1 — the
    * occurrence stream is never re-scanned or joined (the
    * [[tfIdfTopTerms]] df-from-tf trick on the bigram plane). The
    * window partitioning sees the Zipf head (w1 = "the" gathers many
    * distinct successors) but its input is the AGGREGATED pair table,
    * whose per-key multiplicity is bounded by vocabulary, not
    * occurrences. */
  def bigramLm(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // tokenize into a REAL projected column first: a lambda body that
    // referenced the split(...) expression directly would re-evaluate
    // the tokenizer on every element_at — O(tokens²) per document
    val t = col("__t")
    val pairCol = when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1), i =>
        struct(element_at(t, i).as("w1"), element_at(t, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val pairCounts = df.select(tokens(col(textCol)).as("__t"))
      .select(explode(pairCol).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_pair"))
    val byHead = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w1"))
    pairCounts
      .withColumn("n_ctx", sum(col("n_pair")).over(byHead))
      .withColumn("cond_e6",
        floor(col("n_pair") * lit(1000000.0) / col("n_ctx")).cast(LongType))
      .orderBy(col("n_pair").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** LM-based document quality scoring (the CCNet-style "score text by
    * a language model" filter, on the [[bigramLm]] counts): each
    * document's consecutive-pair stream is scored by the corpus
    * bigram conditionals — `mean_cond_e6 = floor(Σ cnt·cond_e6 / Σ
    * cnt)` over its pairs, an integer-exact perplexity proxy
    * (monotone in the arithmetic mean of P(w2|w1); fluent text scores
    * high, gibberish scores ~0). Pairs outside the top-`lmK` LM take
    * conditional 0 — the fixed-vocabulary backoff a production LM
    * filter uses, which also makes the broadcast bounded.
    *
    * Scale shape: per-doc pairs AGGREGATE to (id, w1, w2, cnt) before
    * any join (multiplicity bounded by doc vocabulary, the
    * tfIdf/rare-token shape), and the LM rides a BROADCAST join (≤
    * lmK rows by construction) — the Zipf-hot pairs ("of the") never
    * become shuffle keys. Output: (id, n_pairs, n_lm_pairs,
    * mean_cond_e6). Docs shorter than 2 tokens are absent (no
    * pairs). */
  def bigramLmScore(df: DataFrame, textCol: String, idCol: String,
      lmK: Int): DataFrame = {
    val lm = bigramLm(df, textCol, lmK)
      .select(col("w1"), col("w2"), col("cond_e6"))
    val t = col("__t")
    val pairCol = when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1), i =>
        struct(element_at(t, i).as("w1"), element_at(t, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val docPairs = df
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .select(col(idCol), explode(pairCol).as("p"))
      .groupBy(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))
    docPairs
      .join(broadcast(lm), Seq("w1", "w2"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_pairs"),
        sum(when(col("cond_e6").isNotNull, col("cnt")).otherwise(0L))
          .as("n_lm_pairs"),
        floor(sum(col("cnt") * coalesce(col("cond_e6"), lit(0L)))
          / sum(col("cnt"))).cast(LongType).as("mean_cond_e6"))
  }

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * other non-space characters — the shape of a byte-pair pre-tokenizer
    * split, as a codegen'd regexp. */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
      .cast(LongType)

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic (tiny, embedded — a real deployment would load larger
    * profiles; the mechanism is what matters). */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein"),
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "有", "人"))

  /** Text normalization (the "clean" stage that precedes tokenizing):
    * C0 control characters and DEL (except LF) become spaces, runs of
    * spaces/tabs collapse to one space, and each line is trimmed of
    * leading/trailing spaces. Newlines survive — line structure is
    * load-bearing for the boilerplate pass. Row-local, codegen'd, and
    * restricted to the java.util.regex ∩ RE2 subset like the PII
    * patterns, so the DuckDB oracle replicates it exactly. */
  def normalizeWs(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(text, "[\\x00-\\x09\\x0B-\\x1F\\x7F]", " "),
        " {2,}", " "),
      " ?\n ?", "\n"))

  /** Count of tokens contained in a fixed vocabulary. */
  def vocabHits(text: Column, vocab: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(vocab: _*))).cast(LongType)

  /** Language-ID: argmax of per-language stopword hits, ties resolved
    * to the alphabetically first language (deterministic). */
  def langId(text: Column): Column = {
    val scores = stopwords.map { case (lang, words) => lang -> vocabHits(text, words) }
    val best = greatest(scores.map(_._2): _*)
    // foldRight chains WHENs in list order → first (alphabetical) wins
    scores.foldRight(lit("und"): Column) { case ((lang, s), rest) =>
      when(s === best && best > 0, lit(lang)).otherwise(rest)
    }
  }

  /** Line-level language segmentation (the multilingual-document
    * detector): [[langId]] per non-blank LINE instead of per document
    * — a code-switching page (boilerplate in one language, content in
    * another) identifies per segment where the doc-level vote returns
    * whichever language owns more stopwords. Per doc: line counts,
    * identified-line counts, distinct identified languages, and a
    * `multilingual` flag (≥2 languages). Row-local explode + ONE
    * per-doc aggregation; the language vote never leaves the line. */
  def lineLangStats(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(col(idCol), explode(split(col(textCol), "\n")).as("line"))
      .where(trim(col("line")) =!= "")
      .withColumn("llang", langId(col("line")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"),
        count(when(col("llang") =!= "und", 1)).as("n_lang_lines"),
        count_distinct(when(col("llang") =!= "und", col("llang")))
          .as("n_langs"))
      .withColumn("multilingual", col("n_langs") >= 2)

  /** Integer-exact quality components: chars, tokens, English-stopword
    * hits, punctuation (non-alphanumeric-space) chars. */
  def nChars(text: Column): Column = length(text).cast(LongType)
  def nPunct(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", "")))
      .cast(LongType)

  /** Quality score ×10⁴ in [0, 10000]: equal-weight blend of length
    * saturation (500 chars), stopword ratio, non-punctuation ratio, and
    * mean-word-length saturation (10 chars). All arithmetic is
    * double-identical between Spark and DuckDB (same expression shape),
    * floored to an exact integer. */
  def qualityScoreE4(text: Column): Column = {
    val nt = tokenCount(text)
    val nc = nChars(text)
    val stop = vocabHits(text, stopwords.flatMap(_._2).distinct)
    val punct = nPunct(text)
    val lenScore = least(nc.cast("double") / 500.0, lit(1.0))
    val stopScore = stop.cast("double") / nt.cast("double")
    val punctScore = lit(1.0) - punct.cast("double") / nc.cast("double")
    val awl = (nc - punct).cast("double") / nt.cast("double")
    val awlScore = least(awl / 10.0, lit(1.0))
    floor(lit(2500.0) * lenScore + lit(2500.0) * stopScore +
      lit(2500.0) * punctScore + lit(2500.0) * awlScore).cast(LongType)
  }

  /** Repetition score ×10⁴: the fraction of NON-distinct word 3-grams
    * in the document (Gopher/C4-style repetition quality rule, public
    * heuristic family) — 0 for fully novel text, →10000 for a document
    * that repeats one phrase. Docs shorter than 3 tokens score 0.
    * Row-local array expression, integer-exact. */
  def repetitionE4(text: Column, k: Int = 3): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val grams = transform(sequence(lit(1), n - lit(k - 1)),
      i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + lit(j))): _*))
    when(n < k, lit(0L)).otherwise(
      floor(lit(10000.0) *
        (lit(1.0) - size(array_distinct(grams)).cast("double") /
          size(grams).cast("double"))).cast(LongType))
  }

  /** JVM replica of [[repetitionE4]] — the form for real corpora: the
    * declarative variant's nested higher-order expressions re-evaluate
    * the tokenizer per element (interpreted, no subtree memoization),
    * measured ~50× slower. Identical integer results (same double
    * division, same floor). */
  def repetitionJvm(text: String, k: Int = 3): Long = {
    val toks = text.trim.split("\\s+")
    if (toks.length < k) 0L
    else {
      val total = toks.length - k + 1
      val seen = new java.util.HashSet[String](total * 2)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < total) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      math.floor(10000.0 * (1.0 - seen.size.toDouble / total.toDouble)).toLong
    }
  }

  /** Repetition table op in kernel form: (id, rep3_e4). */
  def repetitionKernel(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, repetitionJvm(t, k)) })
      .toDF("id", "rep3_e4")
  }

  /** Rare-token profile: per document, how many of its token
    * OCCURRENCES use a token whose corpus document frequency is
    * ≤ `maxDf`, plus the fraction (×10⁴, floored). A high rare
    * fraction flags OCR noise, mojibake, and synthetic gibberish —
    * the df-based twin of the stopword-ratio quality signal (rare
    * tokens are rare BECAUSE no other document corroborates them).
    *
    * Scale shape — skew-immune by CONSTRUCTION, not by runtime rescue:
    *
    *  1. Occurrences collapse to (id, token) → cnt first (bounded by
    *     per-doc vocabulary; map-side combine absorbs hot keys), and
    *     the df table falls out of a second aggregation over those
    *     same pairs. Aggregations are skew-immune (partial combine);
    *     only JOINS can straggle.
    *  2. Per-doc totals need NO join at all (Σ cnt on the doc id).
    *  3. The rare join's key multiplicity is BOUNDED: the Zipf head —
    *     tokens in more than `hotDocFrac` of docs, a set pigeonhole-
    *     bounded by avg-doc-vocabulary / hotDocFrac regardless of
    *     corpus size — is broadcast and anti-joined out of the pair
    *     table ROW-LOCALLY, so every key that reaches the shuffle
    *     join matches ≤ max(maxDf, hotDocFrac·N) rows. "the" (df ≈
    *     50% of docs) never enters a shuffle; no partition can
    *     straggle. (AQE skew-split cannot save the naive single-join
    *     form here: the df table's final aggregation sits on the
    *     join's own exchange, which AQE must not split.)
    *  4. Totals and rare counts meet on the unique doc id — uniform
    *     keys, both sides already partitioned by it.
    *
    * No collect, no driver-side vocabulary: the df table stays
    * distributed (only the tiny Zipf head broadcasts), so a 100 TB
    * corpus's billion-token vocabulary never has to fit anywhere
    * whole. The repeated tf/df subtrees dedupe into one physical
    * shuffle each via exchange reuse (plan-pinned in ScaleSpec).
    *
    * @param hotDocFrac df fraction above which a token counts as the
    *   broadcastable Zipf head; the shuffle-join multiplicity bound.
    * @return one row per input doc: (idCol, n_tokens, n_rare, rare_e4) */
  def rareTokenStats(df: DataFrame, textCol: String, idCol: String,
      maxDf: Long = 2L, hotDocFrac: Double = 0.001): DataFrame = {
    val tf = df
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("__cnt"))
    val dfTable = tf.groupBy(col("token")).agg(count(lit(1)).as("__df"))
    // corpus size as a broadcast 1-row frame (lazy, no eager count job)
    val n = df.agg(count(lit(1)).as("__n"))
    val hotSet = dfTable.crossJoin(broadcast(n))
      .where(col("__df") >
        greatest(lit(maxDf), ceil(col("__n") * lit(hotDocFrac))))
      .select(col("token"))
    // hotcut ≥ maxDf, so dropping the head can never drop a rare token
    val coldTf = tf.join(broadcast(hotSet), Seq("token"), "left_anti")
    val rare = coldTf
      .join(dfTable.where(col("__df") <= maxDf), Seq("token"))
      .groupBy(col(idCol)).agg(sum(col("__cnt")).as("n_rare"))
    tf.groupBy(col(idCol)).agg(sum(col("__cnt")).as("n_tokens"))
      .join(rare, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"),
        floor(lit(10000.0) * coalesce(col("n_rare"), lit(0L)) /
          col("n_tokens")).cast(LongType).as("rare_e4"))
  }

  /** TF-IDF keyword extraction: per document the top-`k` terms by
    * `tf · ln(N/df)` (score ×10⁶, floored; ties broken by token so the
    * cut is deterministic). The per-doc signature terms a retrieval or
    * topic-labeling pipeline wants — the scoring twin of
    * [[rareTokenStats]]'s gate.
    *
    * Scale shape: term frequencies aggregate on (id, token) — already
    * distinct pairs, so the document-frequency table falls out of a
    * second aggregation over the SAME rows with no distinct pass.
    * The corpus size joins in as a broadcast 1-row frame (lazy — no
    * eager count job at build time). Everything shuffles compact
    * (id, token, counts) keys; the final top-k is one window
    * partitioning on the doc id, with k rows of state per doc.
    *
    * @return (idCol, rk 1..k, token, tf, df, score_e6) */
  def tfIdfTopTerms(df: DataFrame, textCol: String, idCol: String,
      topK: Int = 3): DataFrame = {
    val tf = df
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfTable = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfTable, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("score_e6",
        floor(lit(1000000.0) * col("tf") * log(col("__n") / col("df")))
          .cast(LongType))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score_e6").desc, col("token").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= topK)
      .select(col(idCol), col("rk").cast(LongType).as("rk"), col("token"),
        col("tf"), col("df"), col("score_e6"))
  }

  /** Okapi BM25 full-text retrieval: top-`k` documents per query from
    * a fixed query set, scored with the Lucene-shifted idf
    * `ln((N-df+0.5)/(df+0.5) + 1)` (always ≥ 0, so adding a matched
    * term never lowers a score) and the standard saturated tf
    * `tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))`.
    *
    * Scale shape — the ad-hoc search path (no persisted index):
    * the query set's term universe broadcasts, and the `isin` filter
    * prunes the exploded token stream MAP-SIDE, so the only (id,
    * token) pairs that ever shuffle are occurrences of query terms —
    * the tf aggregate is |matching docs|·|terms|-bounded no matter
    * how large the corpus. Document frequency falls out of the tf
    * rows (no distinct pass, the [[tfIdfTopTerms]] trick), corpus
    * stats (N, Σdl) join as a broadcast 1-row frame, and the final
    * per-query top-k is one window with k rows of state per query.
    * A standing query workload would amortize the corpus scan into a
    * persisted (token → postings) layout exactly like
    * [[graft.operators.Similarity]]'s IVF store; this form is the
    * one-shot scan-time variant.
    *
    * Determinism: each (doc, term) contribution is floored to an e6
    * integer BEFORE the cross-term sum, so the per-doc score is an
    * exact integer sum — no float-summation-order hazard between
    * engines. All fractional constants (0.5, 0.25, 0.75, 1.2, 2.2)
    * are written identically on both sides, and the double expression
    * tree is association-identical to the oracle SQL.
    *
    * @param queries (query_id, terms) — the broadcastable query set.
    * @return (query_id, rk 1..k, idCol, n_terms, score_e6), ties
    *   broken by doc id so the cut is deterministic. */
  def bm25TopK(df: DataFrame, textCol: String, idCol: String,
      queries: Seq[(String, Seq[String])], topK: Int = 5,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = df.sparkSession
    require(queries.nonEmpty, "bm25TopK needs at least one query")
    val terms = queries.flatMap(_._2).distinct
    val toks = df.select(col(idCol), tokens(col(textCol)).as("__toks"))
    val dl = toks.select(col(idCol),
      size(col("__toks")).cast(LongType).as("__dl"))
    val tf = toks
      .select(col(idCol), explode(col("__toks")).as("token"))
      .where(col("token").isin(terms: _*))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfTable = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__sumdl"))
    val postings = tf.join(dfTable, Seq("token")).join(dl, Seq(idCol))
    bm25Score(postings, stats, idCol, queries, topK, k1, b)
  }

  /** Shared BM25 scorer over a postings frame `(idCol, token, tf,
    * __dl, df)` + a 1-row stats frame `(__n, __sumdl)` — the scoring
    * tail of [[bm25TopK]] and [[bm25TopKFromIndex]], kept single so
    * the scan-time and indexed forms cannot drift. */
  private def bm25Score(postings: DataFrame, stats: DataFrame,
      idCol: String, queries: Seq[(String, Seq[String])], topK: Int,
      k1: Double, b: Double): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    val qDf = queries
      .flatMap { case (qid, ts) => ts.distinct.map(t => (qid, t)) }
      .toDF("query_id", "token")
    val avgdl = col("__sumdl").cast(DoubleType) / col("__n")
    val idf = log(
      (((col("__n") - col("df")) + lit(0.5)) / (col("df") + lit(0.5))) +
        lit(1.0))
    val den = col("tf") +
      lit(k1) * (lit(1.0 - b) + (lit(b) * col("__dl")) / avgdl)
    val contrib = postings
      .crossJoin(broadcast(stats))
      .withColumn("score_e6",
        floor((lit(1000000.0) * idf) * ((col("tf") * lit(k1 + 1.0)) / den))
          .cast(LongType))
    val perQuery = contrib.join(broadcast(qDf), Seq("token"))
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum(col("score_e6")).as("score_e6"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score_e6").desc, col(idCol).asc)
    perQuery.withColumn("rk", row_number().over(w))
      .where(col("rk") <= topK)
      .select(col("query_id"), col("rk").cast(LongType).as("rk"),
        col(idCol), col("n_terms"), col("score_e6"))
  }

  /** Build the PERSISTED postings index for [[bm25TopKFromIndex]] —
    * the standing-query-workload scale path the scan-time
    * [[bm25TopK]] documents. Layout (the text plane's analogue of
    * the IVF serving store, `Similarity.buildIvfStore`):
    *
    *   path/postings/part=<b>/  — (token, id, tf, dl, df) rows,
    *     bucketed by the content-addressed md5 hash of the token, so
    *     a query's terms prune to |terms| `part=` directories before
    *     any posting is read;
    *   path/stats/ — one row (n_docs, sum_dl, n_buckets): the corpus
    *     constants every query needs, plus the bucket count pinned
    *     INTO the store so build and probe can never disagree on the
    *     hash modulus.
    *
    * df is NOT stored: every posting row of a token lives in that
    * token's one bucket, so a query's pruned read necessarily sees
    * ALL postings of each queried term and recovers df exactly with
    * one |terms|-bounded aggregation. That is what makes the index
    * APPENDABLE ([[appendToTextIndex]]) and streaming-maintainable
    * (`StreamingIngest.maintainTextIndex`) — a denormalized df would
    * go stale on the first append and force a full rewrite.
    *
    * Each ingested batch owns a `__batch_id=<n>` directory under
    * BOTH `postings/` (then `part=` inside it) and `stats/` (one
    * 1-row parquet per batch) — the same per-batch-overwrite
    * idempotency contract as the streaming-maintained rollup stores:
    * replaying a batch overwrites its own directories and nothing
    * else. Readers sum the stats rows and treat `__batch_id` as just
    * another partition column; `part=` pruning is unaffected. A
    * store is maintained EITHER by build/append batches OR by one
    * streaming query — not both at once (batch-id namespaces would
    * collide, exactly as with any per-batch-dir store). */
  def buildTextIndex(df: DataFrame, textCol: String, idCol: String,
      path: String, nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    writePostingsBatch(df, textCol, idCol, path, nBuckets, batchId = 0L)
  }

  /** Incrementally index a NEW batch of documents into an existing
    * [[buildTextIndex]] store — the daily-ingest shape (the text
    * plane's mirror of `Similarity`'s incremental IVF maintenance
    * and `Dedup.jaccardPairsAgainst`): cost scales with the batch,
    * never the corpus. The batch lands in the next `__batch_id`
    * directory (prior ids listed driver-side from `stats/` —
    * bounded by the batch count, like any partition listing). The
    * batch MUST be new doc ids — re-appending an already indexed doc
    * double-counts it, exactly like re-ingesting a batch into any
    * append-only store. */
  def appendToTextIndex(newDocs: DataFrame, textCol: String,
      idCol: String, path: String): Unit = {
    val spark = newDocs.sparkSession
    val stats = spark.read.parquet(s"$path/stats")
    val nbs = stats.select(col("n_buckets")).distinct().collect()
      .map(_.getLong(0))
    require(nbs.length == 1,
      s"inconsistent n_buckets across index batches: ${nbs.mkString(",")}")
    // partition-column type is discovery-inferred (int) — cast
    val next = stats.agg(max(col("__batch_id").cast(LongType)))
      .head().getLong(0) + 1L
    writePostingsBatch(newDocs, textCol, idCol, path, nbs.head.toInt, next)
  }

  /** Ordered PROXIMITY search from positional postings: per doc, the
    * number of `(p₁, p₂)` position pairs with `term1` at `p₁`,
    * `term2` at `p₂`, and `0 < p₂ − p₁ ≤ slop` — the "A near B"
    * query between exact phrase (`slop = 1` ≡ adjacency) and
    * bag-of-words. Same probe shape as [[phraseHitsFromIndex]]: two
    * `part=`-pruned posting reads, one doc-id equi-join, then a
    * row-local nested count over the two (sorted, in-doc) position
    * arrays. */
  def proximityHitsFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, term1: String, term2: String, slop: Int): DataFrame = {
    require(slop >= 1, s"slop must be >= 1, got $slop")
    require(term1 != term2, "proximity terms must differ")
    val statsAll = spark.read.parquet(s"$path/stats")
    val nbs = statsAll.select(col("n_buckets")).distinct().collect()
      .map(_.getLong(0))
    require(nbs.length == 1,
      s"inconsistent n_buckets across index batches: ${nbs.mkString(",")}")
    val buckets = Seq(term1, term2)
      .map(t => Dedup.md5Hash60(t) % nbs.head).distinct
    val matched = minusTombstones(
      spark.read.parquet(s"$path/postings")
        .where(col("part").isin(buckets: _*)) // prunes part= dirs
        .where(col("token").isin(term1, term2)),
      loadTombstones(spark, path))
      .select(col("id"), col("token"), col("positions"))
    val a = matched.where(col("token") === term1)
      .select(col("id"), col("positions").as("__pa"))
    val b = matched.where(col("token") === term2)
      .select(col("id"), col("positions").as("__pb"))
    a.join(b, Seq("id"))
      .select(col("id"),
        aggregate(col("__pb"), lit(0L), (acc, pb) =>
          acc + size(filter(col("__pa"),
            pa => pb > pa && pb - pa <= lit(slop.toLong)))
            .cast(LongType))
          .as("n_hits"))
      .where(col("n_hits") > 0)
  }

  /** Corpus top-`k` terms served FROM a [[buildTextIndex]] store:
    * `Σ tf` per token over the postings — the (id, token)-aggregated
    * tf table already materialized, so the corpus is neither
    * re-scanned nor re-tokenized (the vocabulary step falls out of
    * the retrieval index, like [[graft.operators.Profiling
    * .tokenDriftFromIndex]]'s drift). Distributed TakeOrdered cut. */
  def topTermsFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, k: Int): DataFrame =
    minusTombstones(spark.read.parquet(s"$path/postings"),
      loadTombstones(spark, path))
      .groupBy(col("token")).agg(sum(col("tf")).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Compact a [[buildTextIndex]] store into a FRESH directory — the
    * small-file fix after many appended / streamed micro-batches
    * (each leaves its own `__batch_id=` directory pair). The whole
    * history lands as batch 0 of the output store with bounded file
    * count, stats collapse to one summed row, and serving/append
    * semantics are unchanged (appends continue at batch 1). Same
    * crash-safe contract as the event-store compaction: the output is
    * a fresh path and reads re-point — a store being read is never
    * rewritten in place. Doc-id disjointness across batches (the
    * append contract) is what makes this a pure re-layout: no two
    * batches carry postings for the same (id, token).
    *
    * Compaction is also the PHYSICAL CLOSER of [[eraseFromTextIndex]]
    * deletion requests: tombstoned postings are dropped from the
    * rewrite, the collapsed stats row absorbs the subtraction, and the
    * output store carries NO tombstones — the erased bytes are gone,
    * not just excluded, and serving from the compacted store is
    * identical to serving the tombstoned input (spec-pinned). Retire
    * the input directory once reads re-point, or the erased rows
    * still exist on disk.
    *
    * Compaction is a HISTORY BARRIER: the whole `__batch_id=` past
    * collapses into batch 0 and the stats subtraction is absorbed, so
    * replaying a PRE-compaction batch against the compacted store is
    * out of contract — it would re-add that batch's stats beside the
    * collapsed row and re-land its postings (erased or not), because
    * the store no longer carries the batch directory the replay would
    * have idempotently overwritten, nor the tombstones (already
    * absorbed — carrying them forward here would double-subtract the
    * stats every serve). [[eraseFromTextIndex]]'s replay immunity is
    * therefore scoped to the PRE-compaction store; after compacting,
    * advance the writer's checkpoint past every compacted batch (the
    * same re-point step that retires the input directory) before the
    * stream resumes. The ANN plane differs: `Similarity
    * .compactIvfStore` carries its sidecar forward because vector
    * appends are NEW batches, not replays, and that store has no
    * stats row to double-subtract. */
  def compactTextIndex(spark: org.apache.spark.sql.SparkSession,
      inPath: String, outPath: String, targetFiles: Int = 8): Unit = {
    require(inPath != outPath,
      "compact writes a fresh directory (crash-safe swap), not in place")
    val statsAll = spark.read.parquet(s"$inPath/stats")
    val nbs = statsAll.select(col("n_buckets")).distinct().collect()
      .map(_.getLong(0))
    require(nbs.length == 1,
      s"inconsistent n_buckets across index batches: ${nbs.mkString(",")}")
    val tomb = loadTombstones(spark, inPath)
    minusTombstones(spark.read.parquet(s"$inPath/postings"), tomb)
      .drop("__batch_id")
      .coalesce(targetFiles)
      .write.mode("overwrite").partitionBy("part")
      .parquet(s"$outPath/postings/__batch_id=0")
    val statsBase = statsAll
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    tomb.fold(statsBase) { t =>
      val sub = t.agg(count(lit(1)).as("__tn"),
        coalesce(sum(col("dl")), lit(0L)).as("__tdl"))
      statsBase.crossJoin(broadcast(sub))
        .select((col("n_docs") - col("__tn")).as("n_docs"),
          (col("sum_dl") - col("__tdl")).as("sum_dl"))
    }
      .withColumn("n_buckets", lit(nbs.head))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$outPath/stats/__batch_id=0")
  }

  /** RIGHT-TO-ERASURE on the postings store (the retrieval plane's
    * twin of `TimeSeriesService.eraseEvents` — a deletion request is
    * not closed while a DERIVED serving store still returns the
    * subject): writes id-keyed TOMBSTONES to `path/tombstones/` that
    * every serve from this store excludes immediately
    * ([[bm25TopKFromIndex]], [[phraseHitsFromIndex]],
    * [[proximityHitsFromIndex]], [[topTermsFromIndex]],
    * `Profiling.tokenDriftFromIndex`), with [[compactTextIndex]] as
    * the physical CLOSER that rewrites the bytes out (the LSM
    * delete: logical now, physical at the next compaction — until
    * the compacted store replaces this one, the erased postings
    * still exist on disk, exactly the `retiredStoreDir` caveat).
    *
    * Each tombstone carries the doc's `dl`, recovered here by one
    * COLUMN-PRUNED postings scan (a doc's postings spread across
    * every bucket its tokens hash to, so no doc-keyed pruning
    * exists — the scan reads two columns, never positions, and runs
    * once per erasure REQUEST, not per query). That is what keeps
    * served BM25 EXACT over the surviving corpus: df re-aggregates
    * from the anti-joined pruned read, and the 1-row corpus stats
    * subtract the tombstones' exact (count, Σdl).
    *
    * Only ids present in the store tombstone (their dl is known and
    * their stats contribution real); erasing an id the store never
    * indexed is a 0-count no-op — a request against a doc not yet
    * ingested is upstream's to honor (indexing it later would
    * re-count it in batch stats while the tombstone subtracted
    * nothing). Repeat-erasing an id never double-subtracts: already-
    * tombstoned ids are skipped. REPLAY IMMUNITY falls out of the
    * sidecar living outside the `__batch_id=` namespace: a replayed
    * batch overwrites its own postings/stats dirs, the tombstone
    * survives, and the erased doc stays excluded — a redelivery can
    * never resurrect erased rows (the B21b contract, spec-pinned).
    * Scope: replay immunity holds for THIS store's batch layout;
    * [[compactTextIndex]] collapses that layout (a history barrier —
    * see its docstring), so advance the writer's checkpoint past
    * compacted batches when the store is swapped.
    *
    * @return number of ids actually erased (found and not already
    *   tombstoned). */
  def eraseFromTextIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, ids: Seq[String]): Long = {
    require(ids.nonEmpty, "eraseFromTextIndex needs ids")
    val found = spark.read.parquet(s"$path/postings")
      .where(col("id").cast("string").isin(ids: _*))
      .select(col("id"), col("dl"))
      .dropDuplicates("id")
    val fresh = loadTombstones(spark, path).fold(found)(t =>
      found.join(broadcast(t.select(col("id"))), Seq("id"), "left_anti"))
    // count + write in one pass: the tombstone set is deletion-request
    // bounded, so the persist is a few rows
    val rows = fresh.persist()
    val n = rows.count()
    if (n > 0)
      rows.write.mode("append").parquet(s"$path/tombstones")
    rows.unpersist()
    n
  }

  /** The store's tombstone sidecar, if any erasure ever ran — the
    * (id, dl) rows every serve anti-joins. `dropDuplicates` is
    * defensive only (the eraser already skips known ids). */
  private[graft] def loadTombstones(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)
      .dropDuplicates("id"))
    else None
  }

  /** Exclude tombstoned docs from a postings read — a broadcast anti
    * join (the tombstone side is deletion-request bounded), row-local
    * on the postings side. */
  private def minusTombstones(postings: DataFrame,
      tomb: Option[DataFrame]): DataFrame =
    tomb.fold(postings)(t =>
      postings.join(broadcast(t.select(col("id"))), Seq("id"),
        "left_anti"))

  /** [[minusTombstones]] for readers OUTSIDE this object that scan a
    * store's postings directly (`Profiling.tokenDriftFromIndex`). */
  private[graft] def minusTombstonesOf(
      spark: org.apache.spark.sql.SparkSession, path: String,
      postings: DataFrame): DataFrame =
    minusTombstones(postings, loadTombstones(spark, path))

  /** One batch's postings + stats, written idempotently: overwrite of
    * the batch's own `__batch_id=` directories, nothing else touched
    * (replay-safe — the contract `StreamingIngest.maintainTextIndex`
    * relies on). */
  private[graft] def writePostingsBatch(df: DataFrame, textCol: String,
      idCol: String, path: String, nBuckets: Int, batchId: Long): Unit = {
    val toks = df.select(col(idCol).as("id"), tokens(col(textCol)).as("__toks"))
    toks
      .select(col("id"), size(col("__toks")).cast(LongType).as("dl"),
        posexplode(col("__toks")).as(Seq("pos", "token")))
      .groupBy(col("id"), col("dl"), col("token"))
      // POSITIONAL postings: sorted in-doc positions make the index
      // serve exact phrase queries ([[phraseHitsFromIndex]]), not just
      // bag-of-words scores; sort_array pins the collect order
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos").cast(LongType))).as("positions"))
      .withColumn("part",
        pmod(conv(substring(md5(col("token")), 1, 15), 16, 10)
          .cast(LongType), lit(nBuckets.toLong)))
      .select(col("part"), col("token"), col("id"), col("tf"), col("dl"),
        col("positions"))
      .write.mode("overwrite")
      .partitionBy("part").parquet(s"$path/postings/__batch_id=$batchId")
    df.agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col(textCol))).cast(LongType)).as("sum_dl"))
      .withColumn("n_buckets", lit(nBuckets.toLong))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$path/stats/__batch_id=$batchId")
  }

  /** BM25 served from a [[buildTextIndex]] store: the corpus is never
    * scanned — the query terms' md5 buckets become a `part=`
    * PARTITION FILTER (|terms|-bounded directory list, pruned from
    * the partition index before any row is read), the in-bucket
    * `isin` keeps only exact term matches, and df/dl/corpus stats
    * come from the store. Result-identical to [[bm25TopK]] over the
    * indexed corpus (same scorer, spec-pinned), so the driver query
    * shares the scan-time oracle. The 1-row stats read is the only
    * driver-side action (same bounded footprint as the IVF probe-id
    * collect). */
  def bm25TopKFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: Seq[(String, Seq[String])], topK: Int = 5,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "bm25TopKFromIndex needs at least one query")
    val statsAll = spark.read.parquet(s"$path/stats")
    // per-batch stats rows: the modulus must agree across batches
    // (bounded driver read — one value per ingested batch)
    val nbs = statsAll.select(col("n_buckets")).distinct().collect()
      .map(_.getLong(0))
    require(nbs.length == 1,
      s"inconsistent n_buckets across index batches: ${nbs.mkString(",")}")
    val nBuckets = nbs.head
    val terms = queries.flatMap(_._2).distinct
    val buckets = terms.map(t => Dedup.md5Hash60(t) % nBuckets).distinct
    // erased docs leave BEFORE df aggregates, so df/tf/dl and the
    // subtracted corpus stats are all exactly the surviving corpus's
    val tomb = loadTombstones(spark, path)
    val matched = minusTombstones(
      spark.read.parquet(s"$path/postings")
        .where(col("part").isin(buckets: _*)) // prunes part= dirs
        .where(col("token").isin(terms: _*)),
      tomb)
    // df recovered exactly from the pruned read (a token's bucket
    // holds ALL its postings); |terms|-bounded aggregation
    val dfTable = matched.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val postings = matched
      .select(col("id"), col("token"), col("tf"), col("dl").as("__dl"))
      .join(dfTable, Seq("token"))
    val statsBase = statsAll
      .agg(sum(col("n_docs")).as("__n"), sum(col("sum_dl")).as("__sumdl"))
    val stats = tomb.fold(statsBase) { t =>
      // 1-row × 1-row broadcast cross: the batch stats rows still sum
      // the erased docs, so subtract the tombstones' exact (n, Σdl)
      val sub = t.agg(count(lit(1)).as("__tn"),
        coalesce(sum(col("dl")), lit(0L)).as("__tdl"))
      statsBase.crossJoin(broadcast(sub))
        .select((col("__n") - col("__tn")).as("__n"),
          (col("__sumdl") - col("__tdl")).as("__sumdl"))
    }
    bm25Score(postings, stats, "id", queries, topK, k1, b)
  }

  /** Exact PHRASE search served from the positional postings of a
    * [[buildTextIndex]] store — the corpus is never scanned. Each
    * phrase term's bucket prunes to a `part=` directory; candidate
    * start positions then narrow by an `array_intersect` FOLD over
    * the phrase's terms (`candidates(i) = (candidates(i−1)+1) ∩
    * positions(termᵢ)`), so an n-term phrase is n−1 equi-joins on
    * the doc id over |phrase docs|-bounded inputs — no gram
    * materialization, no corpus scan. `n_hits` counts match
    * positions, overlapping occurrences individually — identical
    * semantics to the scan-time gram counting (shared oracle).
    *
    * @param phrases whitespace-separated multi-token phrases.
    * @return (id, phrase, n_hits), matches only. */
  def phraseHitsFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "phraseHitsFromIndex needs phrases")
    val phraseTerms = phrases.map(p => p -> p.trim.split("\\s+").toSeq)
    require(phraseTerms.forall(_._2.length >= 2),
      "phrases must have at least 2 tokens")
    val statsAll = spark.read.parquet(s"$path/stats")
    val nbs = statsAll.select(col("n_buckets")).distinct().collect()
      .map(_.getLong(0))
    require(nbs.length == 1,
      s"inconsistent n_buckets across index batches: ${nbs.mkString(",")}")
    val terms = phraseTerms.flatMap(_._2).distinct
    val buckets = terms.map(t => Dedup.md5Hash60(t) % nbs.head).distinct
    val matched = minusTombstones(
      spark.read.parquet(s"$path/postings")
        .where(col("part").isin(buckets: _*)) // prunes part= dirs
        .where(col("token").isin(terms: _*)),
      loadTombstones(spark, path))
      .select(col("id"), col("token"), col("positions"))
    phraseTerms.map { case (ph, ts) =>
      val start = matched.where(col("token") === ts.head)
        .select(col("id"), col("positions").as("__cand"))
      val folded = ts.zipWithIndex.drop(1).foldLeft(start) {
        case (acc, (t, i)) =>
          acc.join(matched.where(col("token") === t)
              .select(col("id"), col("positions").as(s"__p$i")), Seq("id"))
            .withColumn("__cand", array_intersect(
              transform(col("__cand"), p => p + lit(1L)), col(s"__p$i")))
            .drop(s"__p$i")
      }
      folded.select(col("id"), lit(ph).as("phrase"),
          size(col("__cand")).cast(LongType).as("n_hits"))
        .where(col("n_hits") > 0)
    }.reduce(_.unionByName(_))
  }

  /** Content fingerprint: md5 of the whitespace-normalized text —
    * the exact-dedup key in hash form. */
  def md5Fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** Rolling polynomial fingerprint over tokens:
    * `h ← (h·31 + hash60(tok) mod p) mod p`, p = 1e9+7 — an
    * order-sensitive document hash (same mechanism as a Rabin-Karp
    * rolling window), as a row-local array fold. */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text),
        t => conv(substring(md5(t), 1, 15), 16, 10).cast(LongType) % 1000000007L),
      lit(0L),
      (h, x) => (h * 31L + x) % 1000000007L)

  // ------------------------------------------------------- JVM kernels
  // Higher-order array expressions (transform/aggregate/filter) are
  // CodegenFallback — interpreted per element, with a Column-tree eval
  // and allocations per token. The kernels below are byte-identical JVM
  // replicas run via mapPartitions (the pattern of
  // [[Dedup.shingleHashKernel]]); DedupTextSpec pins kernel ≡
  // declarative, and the DuckDB oracles are unchanged.

  private val RollP = 1000000007L

  /** JVM replica of [[md5Fingerprint]] + [[rollingFingerprint]]. */
  def fingerprintJvm(text: String): (String, Long) = {
    val toks = text.trim.split("\\s+")
    var h = 0L
    var i = 0
    while (i < toks.length) {
      h = (h * 31L + (Dedup.md5Hash60(toks(i)) % RollP)) % RollP
      i += 1
    }
    (Dedup.md5Hex(toks.mkString(" ")), h)
  }

  /** Fingerprint table op: (id, fp_md5, fp_roll) in tight JVM loops. */
  def fingerprintKernel(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val (m, r) = fingerprintJvm(t); (id, m, r)
      }).toDF("id", "fp_md5", "fp_roll")
  }

  private lazy val bpePattern =
    java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9\\s]")
  private lazy val punctPattern =
    java.util.regex.Pattern.compile("[^a-zA-Z0-9\\s]")
  private lazy val stopSets: Seq[(String, Set[String])] =
    stopwords.map { case (l, ws) => (l, ws.toSet) }
  private lazy val allStopSet: Set[String] =
    stopwords.flatMap(_._2).toSet

  /** JVM replica of ([[langId]], [[tokenCount]], [[bpeishCount]],
    * [[qualityScoreE4]]): same tokenization, same regexes (both engines
    * run java.util.regex), same double-arithmetic association order —
    * results are bit-identical to the declarative columns. */
  def statsJvm(text: String): (String, Long, Long, Long) = {
    val toks = text.trim.split("\\s+")
    val nt = toks.length.toLong
    val scores = stopSets.map { case (l, s) => (l, toks.count(s.contains).toLong) }
    val best = scores.iterator.map(_._2).max
    // first language in (alphabetical) list order wins ties, as in the
    // declarative foldRight chain
    val lang = if (best > 0) scores.find(_._2 == best).get._1 else "und"
    val bm = bpePattern.matcher(text.toLowerCase(java.util.Locale.ROOT))
    var nb = 0L
    while (bm.find()) nb += 1
    val nc = text.length.toLong
    val pm = punctPattern.matcher(text)
    var np = 0L
    while (pm.find()) np += 1
    val nstop = toks.count(allStopSet.contains).toLong
    val lenScore = math.min(nc.toDouble / 500.0, 1.0)
    val stopScore = nstop.toDouble / nt.toDouble
    val punctScore = 1.0 - np.toDouble / nc.toDouble
    val awlScore = math.min(((nc - np).toDouble / nt.toDouble) / 10.0, 1.0)
    val q = math.floor(2500.0 * lenScore + 2500.0 * stopScore +
      2500.0 * punctScore + 2500.0 * awlScore).toLong
    (lang, nt, nb, q)
  }

  /** Per-document stats table op:
    * (id, lang_pred, n_tokens, n_bpeish, quality_e4). */
  def statsKernel(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val (lang, nt, nb, q) = statsJvm(t); (id, lang, nt, nb, q)
      }).toDF("id", "lang_pred", "n_tokens", "n_bpeish", "quality_e4")
  }

  /** (key, lang_pred, quality_e4) keyed by an arbitrary string column —
    * the kernel form feeding corpus roll-ups like `text_source_profile`
    * without a join back to the key. */
  def langQualityKernel(df: DataFrame, textCol: String, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(textCol)).as[(String, String)]
      .mapPartitions(_.map { case (k, t) =>
        val (lang, _, _, q) = statsJvm(t); (k, lang, q)
      }).toDF(keyCol, "lang_pred", "quality_e4")
  }

  /** DEFLATE size of a UTF-8 string at a fixed compression level —
    * deterministic for a given zlib build (one Deflater per batch,
    * reset between rows). */
  private def deflateJvm(bytes: Array[Byte],
      d: java.util.zip.Deflater): Long = {
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    n
  }

  /** Compression-ratio quality signal — the Gopher-rule heuristic "text
    * that deflates too well is repetitive boilerplate; text that barely
    * deflates is noise/binary": per document, the raw UTF-8 byte count,
    * the DEFLATE (level 6) byte count, and
    * `ratio_e4 = floor(10⁴·compressed / raw)`. Natural prose lands in a
    * mid band; spam pages, dumps, and minified blobs land outside it —
    * the filter is `ratio_e4 BETWEEN lo AND hi` downstream.
    *
    * Row-local mapPartitions kernel (one Deflater reused per batch —
    * the [[Multimodal]] binary-codec pattern; no SQL-expressible twin,
    * so the driver entry is a rows-only check and the spec pins the
    * semantics: repetition compresses, noise doesn't). Output:
    * (id, `n_bytes`, `n_deflate`, `ratio_e4`); empty docs get ratio 0. */
  def compressionStats(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val d = new java.util.zip.Deflater(6)
        it.map { case (id, t) =>
          val raw = Option(t).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val comp = if (raw.isEmpty) 0L else deflateJvm(raw, d)
          val ratio = if (raw.isEmpty) 0L else 10000L * comp / raw.length
          (id, raw.length.toLong, comp, ratio)
        }
      }.toDF("id", "n_bytes", "n_deflate", "ratio_e4")
  }
}
