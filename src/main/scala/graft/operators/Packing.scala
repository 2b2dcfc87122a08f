package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chunk step that turns a document
  * corpus into fixed-capacity training sequences: documents are
  * concatenated in a deterministic order and sliced into
  * `capacity`-token context windows; each document is assigned the
  * global token offset where it starts, the sequence (window) that
  * offset lands in, and its position within that sequence.
  *
  * Scale design (100 TB posture): the naive formulation is a running
  * sum over ONE global window (`sum over (order by id)`), which Spark
  * executes as a single partition — a non-starter at scale. This is
  * instead the classic two-pass distributed prefix sum:
  *
  *  1. sample range bounds from a PRUNED key-only scan (so the token
  *     expression is never computed twice), stamp each row with its
  *     range-bucket id, and hash-exchange + sort on it (one Tungsten
  *     shuffle — the same shuffle any global ordering costs),
  *  2. per-bucket token totals (a ≤P-row job, P = #buckets),
  *  3. exclusive prefix over the P totals on the driver (P is
  *     thousands at most — the same driver-side footprint AQE's
  *     per-partition statistics already accept), broadcast back,
  *  4. per-bucket running sum seeded by the broadcast offset —
  *     row-local, streaming, no second shuffle.
  *
  * The bucket id is an explicit row column, NOT the physical partition
  * index — the prefix arithmetic survives any re-partitioning (AQE
  * coalescing, a downstream coalesce(1)) because a bucket always
  * carries its own identity. The two passes share ONE materialized
  * RDD of the bucketed frame: the second job finds the shuffle map
  * stage already complete and re-reads its shuffle files, so nothing
  * is cached and nothing has to be unpersisted — at corpus scale a
  * cache of the bucketed rows would itself be the memory/spill
  * problem, while the re-read costs one extra pass over (int, long,
  * long) shuffle blocks.
  *
  * Determinism: output is a pure function of (ids, token counts,
  * capacity) — the partition count changes WHERE the prefix sum is
  * split, never its values — so the same corpus packs identically on
  * any cluster, and a SQL oracle can recompute it with a window
  * function.
  */
object Packing {

  /** Structural guard for the pass-2 reseed invariant: the bucketed
    * frame's one exchange must HASH-partition on the in-row bucket id
    * (`_1`), which is what keeps every bucket whole inside exactly one
    * partition. A round-robin or range exchange here could split a
    * bucket across partitions and silently double-seed the running
    * sum — wrong offsets that small-scale value specs may not catch.
    * Driver-side string check on the compiled plan, once per call; no
    * job runs. */
  private def requireBucketHashExchange(sorted: org.apache.spark.sql.Dataset[_]): Unit = {
    val plan = sorted.queryExecution.sparkPlan.toString
    // p == 1 folds the hash exchange to SinglePartition, where
    // wholeness holds trivially
    require(plan.contains("Exchange hashpartitioning(_1")
        || plan.contains("Exchange SinglePartition"),
      s"packing requires a hash exchange on the bucket id; got:\n${plan.take(800)}")
  }

  /** Assign pack coordinates to every document: returns
    * `(id, n_tokens, offset, seq_id, seq_pos)` where `offset` is the
    * exclusive global prefix sum of `tokenCol` in `idCol` order,
    * `seq_id = offset / capacity`, `seq_pos = offset % capacity`.
    *
    * @param capacity context-window size in tokens
    * @param partitions range-partition count (0 = session shuffle
    *   parallelism)
    */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
      capacity: Long, partitions: Int = 0): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val p =
      if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // Range bounds come from an explicit RangePartitioner built on an
    // ID-ONLY projection: `repartitionByRange` would run its sampling
    // job over the full (id, toks) plan, re-executing the caller's
    // token-count expression (typically a regex over the document
    // text) for every row a second time. The pruned scan decodes one
    // key column and nothing else — at 100 TB the sampling pass costs
    // a key-column read, not a second full compute pass.
    val keyOnly = df.select(col(idCol).cast("long")).as[Long]
      .rdd.map((_, null))
    val partitioner = new org.apache.spark.RangePartitioner(p, keyOnly)
    // The range-bucket id rides IN the rows, not in the physical
    // partition index: the shuffle stays a Dataset (Tungsten/UnsafeRow)
    // exchange — never a Java-serialized RDD shuffle — and the prefix
    // arithmetic is partitioning-independent (a bucket carries its own
    // identity, so AQE coalescing, a downstream coalesce(1), or cache
    // eviction can re-shape partitions without corrupting offsets).
    // Hash-partitioning ON the bucket id keeps each bucket whole in
    // exactly one partition; the within-partition (bkt, id) sort keeps
    // its rows contiguous and ordered.
    val sorted = df
      .select(col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("toks"))
      .as[(Long, Long)]
      .map { case (id, toks) => (partitioner.getPartition(id), id, toks) }
      .repartition(p, col("_1"))
      .sortWithinPartitions(col("_1"), col("_2"))
    requireBucketHashExchange(sorted)
    // ONE RDD shared by both passes: pass 2's job skips the already-
    // complete shuffle map stage and re-reads its shuffle files — no
    // cache, so no storage to release (PackingSpec pins zero
    // persistent RDDs) and no corpus-sized cache at scale
    val bucketed = sorted.as[(Int, Long, Long)].rdd
    // pass 1: per-bucket totals — at most P rows to the driver
    val totals = bucketed
      .mapPartitions { it =>
        val acc = scala.collection.mutable.LinkedHashMap.empty[Int, Long]
        it.foreach { case (b, _, t) => acc(b) = acc.getOrElse(b, 0L) + t }
        acc.iterator
      }
      .collect()
    // exclusive prefix over bucket totals in bucket (= key-range) order
    val offsets = new Array[Long](partitioner.numPartitions)
    var acc = 0L
    totals.sortBy(_._1).foreach { case (b, s) => offsets(b) = acc; acc += s }
    val bc = spark.sparkContext.broadcast(offsets)
    // pass 2: seeded running sum, row-local, reseeded at bucket change.
    // Reseed-on-change is correct ONLY because each bucket id is whole
    // in one partition (hash exchange on the bucket column above) and
    // its rows are contiguous (the within-partition sort): a split
    // bucket would seed twice. requireBucketHashExchange above fails
    // loudly if a refactor changes that exchange.
    spark.createDataset(bucketed
      .mapPartitions { it =>
        var cur = -1
        var run = 0L
        it.map { case (b, id, toks) =>
          if (b != cur) { cur = b; run = bc.value(b) }
          val off = run
          run += toks
          (id, toks, off)
        }
      })
      .toDF("id", "n_tokens", "offset")
      .withColumn("seq_id", expr(s"offset DIV ${capacity}L")) // exact long division, no double round-trip
      .withColumn("seq_pos", col("offset") % capacity)
  }

  /** [[packSequences]] generalized to independent packing PER GROUP —
    * the per-split form (train/val/test each concat-and-chunked into
    * their own sequence space, the usual dataset layout). Same
    * two-pass distributed prefix sum, with per-partition totals keyed
    * by (partition, group) and the driver prefix computed per group:
    * the range partition on (group, id) keeps each group's rows
    * contiguous and ordered, so the seeded running sum just resets at
    * group boundaries. Driver footprint: P × |groups| totals — groups
    * are splits/corpora (a handful), not a per-row key. */
  def packSequencesByGroup(df: DataFrame, groupCol: String, idCol: String,
      tokenCol: String, capacity: Long, partitions: Int = 0): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val p =
      if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // Same scheme as [[packSequences]]: pruned (grp, id)-only sampling
    // for the range bounds, explicit in-row bucket id, Tungsten
    // hash-exchange on the bucket + within-partition (bkt, grp, id)
    // sort. A bucket may span group boundaries and a group many
    // buckets; the per-(grp, bucket) seed map handles both.
    val keyOnly = df
      .select(col(groupCol).cast("string"), col(idCol).cast("long"))
      .as[(String, Long)]
      .rdd.map((_, null))
    val partitioner = new org.apache.spark.RangePartitioner(p, keyOnly)
    val sorted = df
      .select(col(groupCol).cast("string").as("grp"),
        col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("toks"))
      .as[(String, Long, Long)]
      .map { case (g, id, toks) =>
        (partitioner.getPartition((g, id)), g, id, toks)
      }
      .repartition(p, col("_1"))
      .sortWithinPartitions(col("_1"), col("_2"), col("_3"))
    requireBucketHashExchange(sorted)
    // shared-RDD scheme of [[packSequences]]: no cache, pass 2
    // re-reads the completed shuffle
    val bucketed = sorted.as[(Int, String, Long, Long)].rdd
    val totals = bucketed
      .mapPartitions { it =>
        val acc =
          scala.collection.mutable.LinkedHashMap.empty[(String, Int), Long]
        it.foreach { case (b, g, _, t) =>
          acc((g, b)) = acc.getOrElse((g, b), 0L) + t
        }
        acc.iterator
      }
      .collect()
    // per group: exclusive prefix across buckets in bucket order
    val offsets: Map[(String, Int), Long] = totals
      .groupBy(_._1._1)
      .flatMap { case (_, rows) =>
        var acc = 0L
        rows.sortBy(_._1._2).map { case ((g, b), s) =>
          val o = ((g, b), acc); acc += s; o
        }
      }
    val bc = spark.sparkContext.broadcast(offsets)
    // same wholeness invariant as [[packSequences]] pass 2: reseed at
    // (bucket, group) change requires the hash exchange on the bucket
    // column — guarded by requireBucketHashExchange above
    spark.createDataset(bucketed
      .mapPartitions { it =>
        var curB = -1
        var curG: String = null
        var run = 0L
        it.map { case (b, g, id, toks) =>
          if (b != curB || g != curG) {
            curB = b; curG = g; run = bc.value((g, b))
          }
          val off = run
          run += toks
          (g, id, toks, off)
        }
      })
      .toDF("group", "id", "n_tokens", "offset")
      .withColumn("seq_id", expr(s"offset DIV ${capacity}L"))
      .withColumn("seq_pos", col("offset") % capacity)
  }

  /** Packed (priority, id) ordering key with a row-local contract
    * guard: out-of-range inputs raise instead of silently reordering
    * the cut (a wrong-results bug a sampled spec would miss). */
  private def packedKey(priority: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val p = priority.cast("long")
    val i = id.cast("long")
    when(p.between(0L, (1L << 23) - 1) && i.between(0L, (1L << 40) - 1),
      p * lit(1L << 40) + i)
      .otherwise(raise_error(concat(
        lit("selectByBudget contract: 0 <= priority < 2^23 and "),
        lit("0 <= id < 2^40; got priority="), p, lit(" id="), i)))
  }

  /** Token-budget corpus selection: keep the best documents (lowest
    * `priorityCol` first — e.g. `10000 - quality_e4`) until the token
    * budget is exhausted; a document is selected iff its exclusive
    * cumulative token offset in priority order is `< budget` (it
    * STARTS inside the budget). The greedy quality-vs-budget cut every
    * curated pretraining mix makes, as a pure composition over the
    * [[packSequences]] distributed prefix sum — never a global
    * single-partition window.
    *
    * Ordering is (priority, id), encoded as one packed long key:
    * contract `0 <= priority < 2^23` and `0 <= id < 2^40` (scores in
    * basis points and 64-bit row ids well inside both).
    * Output: (idCol, n_tokens, offset). */
  def selectByBudget(df: DataFrame, idCol: String, tokenCol: String,
      priorityCol: String, budget: Long, partitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val keyed = df.select(
      packedKey(col(priorityCol), col(idCol)).as("bkey"),
      col(tokenCol))
    packSequences(keyed, "bkey", tokenCol, capacity = budget,
        partitions = partitions)
      .where(col("offset") < budget)
      .select((col("id") % lit(1L << 40)).as(idCol),
        col("n_tokens"), col("offset"))
  }

  /** [[selectByBudget]] with an independent token budget PER GROUP
    * (per-language / per-source curation quotas): each group's greedy
    * quality-first cut runs in its own token space via the grouped
    * prefix sum. Groups absent from `budgetsPerGroup` are dropped.
    * Output: (groupCol, idCol, n_tokens, offset). */
  def selectByBudgetByGroup(df: DataFrame, groupCol: String, idCol: String,
      tokenCol: String, priorityCol: String,
      budgetsPerGroup: Map[String, Long], partitions: Int = 0): DataFrame = {
    require(budgetsPerGroup.nonEmpty && budgetsPerGroup.values.forall(_ > 0),
      "budgets must be positive")
    val keyed = df.select(col(groupCol),
      packedKey(col(priorityCol), col(idCol)).as("bkey"),
      col(tokenCol))
    val budget = budgetsPerGroup.toSeq.sortBy(_._1)
      .foldLeft(lit(0L)) { case (acc, (g, b)) =>
        when(col("group") === g, lit(b)).otherwise(acc)
      }
    packSequencesByGroup(keyed, groupCol, "bkey", tokenCol,
        capacity = budgetsPerGroup.values.max, partitions = partitions)
      .where(col("offset") < budget)
      .select(col("group").as(groupCol),
        (col("id") % lit(1L << 40)).as(idCol),
        col("n_tokens"), col("offset"))
  }

  /** Deterministic global training-shuffle order: each row's position
    * in a seeded pseudo-random permutation of the corpus — the
    * data-ordering step of a training run (and the precondition for
    * reproducible curricula / resumable epochs). Position = 0-based
    * rank by (seeded 23-bit md5 hash, id), so the permutation is a
    * pure function of (ids, seed): any cluster, any partitioning,
    * any Spark version yields the same order, and the same md5
    * machinery as [[Sampling]] lets a SQL oracle replicate it.
    *
    * Computed via the SAME distributed two-pass prefix sum as
    * [[packSequences]] (each row contributes 1) — never the naive
    * `row_number() OVER (ORDER BY hash)` global window, which Spark
    * executes as a single partition. Contract: `0 <= id < 2^40`
    * (packedKey guard raises otherwise).
    * Output: (idCol, shuffle_pos). */
  def shufflePositions(df: DataFrame, idCol: String,
      seed: Int = 42): DataFrame = {
    val h = pmod(Dedup.seededHash(col(idCol).cast("string"), seed),
      lit(1L << 23))
    val keyed = df.select(packedKey(h, col(idCol)).as("bkey"),
      lit(1L).as("one"))
    packSequences(keyed, "bkey", "one", capacity = 1L)
      .select((col("id") % lit(1L << 40)).as(idCol),
        col("offset").as("shuffle_pos"))
  }

  /** CURRICULUM ordering — the staged training shuffle: position is
    * the 0-based rank by (stage asc, seeded 20-bit shuffle hash, id),
    * so a sequential reader consumes the stages in difficulty order
    * (the curriculum-learning schedule) while every stage is
    * internally shuffled exactly like [[shufflePositions]] — a pure
    * function of (ids, stages, seed) on any cluster and partitioning.
    * Same distributed two-pass prefix sum, never a global window;
    * stage and hash share the packed key's priority lane, so the
    * contract is `0 <= stage < 8` (curriculum schedules are a handful
    * of phases by design — rebalance the lane split if you genuinely
    * need more) and `0 <= id < 2^40`, both raised on violation.
    * Output: (idCol, stage, curriculum_pos). */
  def curriculumPositions(df: DataFrame, idCol: String, stageCol: String,
      seed: Int = 42): DataFrame = {
    val h = pmod(Dedup.seededHash(col(idCol).cast("string"), seed),
      lit(1L << 20))
    val stage = col(stageCol).cast("long")
    val priority = when(stage.between(0L, 7L),
        stage * (1L << 20) + h)
      .otherwise(raise_error(concat(
        lit("curriculumPositions contract: 0 <= stage < 8; got "), stage)))
    val keyed = df.select(packedKey(priority, col(idCol)).as("bkey"),
      lit(1L).as("one"))
    packSequences(keyed, "bkey", "one", capacity = 1L)
      .select((col("id") % lit(1L << 40)).as(idCol),
        expr("id DIV " + (1L << 60) + "L").as("stage"),
        col("offset").as("curriculum_pos"))
  }

  /** Sliding-window document chunking — the embedding/retrieval prep
    * step: each document splits into `window`-token chunks starting
    * every `stride` tokens (overlapping when `stride < window`, the
    * usual retrieval setting; trailing chunks are shorter). Row-local
    * generator (flatMap) — one input row fans out to its chunks with
    * no shuffle; chunk identity `(doc_id, chunk_idx)` is deterministic
    * so re-runs and downstream embedding joins line up. */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.trim.split("\\s+")
        Iterator.range(0, toks.length, stride).map { start =>
          val chunk = toks.slice(start, start + window)
          (id, (start / stride).toLong, chunk.mkString(" "),
            chunk.length.toLong)
        }
      }
      .toDF("doc_id", "chunk_idx", "chunk_text", "n_tokens")
  }

  /** Per-sequence packing profile: how many documents START in each
    * context window and how many tokens they carry — the occupancy
    * view a packing run is judged by. One map-side-combined
    * aggregation over [[packSequences]]' output. */
  def packProfile(packed: DataFrame): DataFrame =
    packed.groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))

  /** FIM (fill-in-the-middle) example generation — the infilling
    * dataset shape code models train on: each document splits at two
    * deterministic token cuts into (prefix, middle, suffix), plus the
    * PSM-ordered training string `<PRE> prefix <SUF> suffix <MID>
    * middle`. Cuts are hash-derived from the doc id (`hash(id:a)`,
    * `hash(id:b)` mod n+1, ordered), so the transform is a pure
    * function of (doc_id, text) — reproducible across regenerations,
    * engines, partitionings; any of the three parts may be empty,
    * exactly like the sampled transform it determinizes.
    *
    * Scale shape: ZERO shuffles — token split, cut arithmetic, and
    * slicing are row-local column algebra (no explode, no window).
    * Output: (`doc_id`, `prefix`, `middle`, `suffix`, `psm`). */
  def fimExamples(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val arr = split(trim(col(textCol)), "\\s+")
    val cut = (tag: String) =>
      pmod(Dedup.hash60(concat(col("doc_id"), lit(s":$tag"))),
        size(col("__arr")) + 1)
    df.select(col(idCol).cast("long").as("doc_id"), arr.as("__arr"))
      .withColumn("__lo", least(cut("a"), cut("b")))
      .withColumn("__hi", greatest(cut("a"), cut("b")))
      .select(col("doc_id"),
        array_join(slice(col("__arr"), lit(1), col("__lo").cast("int")), " ")
          .as("prefix"),
        array_join(slice(col("__arr"), col("__lo").cast("int") + 1,
          (col("__hi") - col("__lo")).cast("int")), " ").as("middle"),
        array_join(slice(col("__arr"), col("__hi").cast("int") + 1,
          (size(col("__arr")) - col("__hi")).cast("int")), " ")
          .as("suffix"))
      .withColumn("psm", concat_ws(" ", lit("<PRE>"), col("prefix"),
        lit("<SUF>"), col("suffix"), lit("<MID>"), col("middle")))
  }

  /** T5-style SPAN-CORRUPTION example generation — the
    * denoising-pretraining dataset shape: per document, a fraction of
    * token spans is replaced by numbered sentinels in `input`, and
    * `targets` lists each sentinel followed by the tokens it hides.
    *
    * Span selection is DETERMINISTIC and BLOCK-ALIGNED: tokens
    * partition into fixed blocks of `block`; a block is selected when
    * `md5(doc_id:blockIdx) mod selectMod == 0`, and a selected block's
    * first `span` tokens corrupt. Block alignment makes spans
    * non-overlapping BY CONSTRUCTION — no sequential greedy resolution
    * — so the whole generator is declarative column algebra (an SQL
    * oracle replicates it exactly), a pure function of (doc_id, text):
    * regeneration, any partitioning, any engine produces the same
    * examples. Corruption rate = (span/block)/selectMod (defaults:
    * 12.5%).
    *
    * Scale shape: one posexplode, ONE hash exchange on the doc id
    * serving both the sentinel-ordinal window (cumulative selected
    * blocks) and the ordered re-assembly aggregation; per-doc state is
    * the token list it already owns. Output: (`doc_id`, `input`,
    * `targets`, `n_spans`) — docs with no selected block pass through
    * with empty `targets`. */
  def spanCorruptionExamples(df: DataFrame, textCol: String,
      idCol: String, block: Int = 6, span: Int = 3,
      selectMod: Int = 4): DataFrame = {
    require(block > 0 && span > 0 && span <= block && selectMod > 0,
      "need 0 < span <= block and selectMod > 0")
    import org.apache.spark.sql.expressions.Window
    val tok = df
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("pos", "tok")))
      .withColumn("blk", expr(s"pos DIV $block"))
      .withColumn("inblk", pmod(col("pos"), lit(block)))
      .withColumn("sel",
        pmod(Dedup.hash60(concat(col("doc_id"), lit(":"), col("blk"))),
          lit(selectMod.toLong)) === 0L)
    // sentinel ordinal k = cumulative selected blocks up to this one;
    // a RANGE frame on blk gives every token of a block the same k
    val byBlk = Window.partitionBy(col("doc_id")).orderBy(col("blk"))
      .rangeBetween(Window.unboundedPreceding, 0L)
    val e = tok
      .withColumn("k",
        sum(when(col("sel") && col("inblk") === 0L, 1L).otherwise(0L))
          .over(byBlk))
      .withColumn("corr", col("sel") && col("inblk") < span)
      .withColumn("in_tok",
        when(col("corr") && col("inblk") === 0L,
          concat(lit("<X"), col("k"), lit(">")))
          .when(col("corr"), lit(null))
          .otherwise(col("tok")))
      .withColumn("tg_tok",
        when(col("corr") && col("inblk") === 0L,
          concat(lit("<X"), col("k"), lit("> "), col("tok")))
          .when(col("corr"), col("tok"))
          .otherwise(lit(null)))
    e.groupBy(col("doc_id"))
      .agg(
        {
          val ordered = array_sort(collect_list(struct(col("pos"),
            col("in_tok").as("i"), col("tg_tok").as("t"))))
          array_join(transform(
            filter(ordered, x => x.getField("i").isNotNull),
            x => x.getField("i")), " ").as("input")
        },
        {
          val ordered = array_sort(collect_list(struct(col("pos"),
            col("in_tok").as("i"), col("tg_tok").as("t"))))
          array_join(transform(
            filter(ordered, x => x.getField("t").isNotNull),
            x => x.getField("t")), " ").as("targets")
        },
        max(col("k")).as("n_spans"))
  }
}
