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
  *  1. range-partition + sort by the order key (one shuffle — the same
  *     shuffle any global ordering costs),
  *  2. per-partition token totals (a P-row job, P = #partitions),
  *  3. exclusive prefix over the P totals on the driver (P is
  *     thousands at most — the same driver-side footprint AQE's
  *     per-partition statistics already accept), broadcast back,
  *  4. per-partition running sum seeded by the broadcast offset —
  *     row-local, streaming, no second shuffle.
  *
  * The ranged input RDD is cached between the two passes so both read
  * the SAME partitioning (range bounds come from a sampling pass; the
  * sampling is deterministic for identical input, so an evicted block
  * recomputes to the same rows — the cache is an efficiency, not a
  * correctness dependency). Cache ownership passes to the caller with
  * the returned frame, per the kernel convention.
  *
  * Determinism: output is a pure function of (ids, token counts,
  * capacity) — the partition count changes WHERE the prefix sum is
  * split, never its values — so the same corpus packs identically on
  * any cluster, and a SQL oracle can recompute it with a window
  * function.
  */
object Packing {

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
    // the RDD (not Dataset) is what both passes share: partition ids
    // come from mapPartitionsWithIndex — the RDD's OWN partition index,
    // stable even when a downstream coalesce merges several of these
    // partitions into one task (TaskContext.getPartitionId() is the
    // TASK id and silently collapses to 0 under coalesce(1), reseeding
    // every merged partition — a wrong-results bug, not a perf one)
    val ranged = df
      .select(col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("toks"))
      .repartitionByRange(p, col("id"))
      .sortWithinPartitions(col("id"))
      .as[(Long, Long)]
      .rdd
      .cache()
    // pass 1: per-partition totals — P rows to the driver
    val totals = ranged
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(s += _._2)
        Iterator.single((pid, s))
      }
      .collect()
      .sortBy(_._1)
    // exclusive prefix over partition totals
    val offsets = new Array[Long](totals.length)
    var acc = 0L
    totals.foreach { case (pid, s) => offsets(pid) = acc; acc += s }
    val bc = spark.sparkContext.broadcast(offsets)
    // pass 2: seeded running sum, row-local
    spark
      .createDataset(ranged.mapPartitionsWithIndex { (pid, it) =>
        var run = bc.value(pid)
        it.map { case (id, toks) =>
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
    val ranged = df
      .select(col(groupCol).cast("string").as("grp"),
        col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("toks"))
      .repartitionByRange(p, col("grp"), col("id"))
      .sortWithinPartitions(col("grp"), col("id"))
      .as[(String, Long, Long)]
      .rdd
      .cache()
    val totals = ranged
      .mapPartitionsWithIndex { (pid, it) =>
        val acc = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { case (g, _, t) => acc(g) = acc.getOrElse(g, 0L) + t }
        acc.iterator.map { case (g, s) => (g, pid, s) }
      }
      .collect()
    // per group: exclusive prefix across partitions in pid order
    val offsets: Map[(String, Int), Long] = totals
      .groupBy(_._1)
      .flatMap { case (g, rows) =>
        var acc = 0L
        rows.sortBy(_._2).map { case (_, pid, s) =>
          val o = ((g, pid), acc); acc += s; o
        }
      }
    val bc = spark.sparkContext.broadcast(offsets)
    spark
      .createDataset(ranged.mapPartitionsWithIndex { (pid, it) =>
        var current: String = null
        var run = 0L
        it.map { case (g, id, toks) =>
          if (g != current) { current = g; run = bc.value((g, pid)) }
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
}
