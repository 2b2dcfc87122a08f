package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.TimeSeriesService
import graft.model.{FactDef, FactType}

/** Structured Streaming ingestion — the reference's write path
  * (`new-fact!`, one upsert transaction per event,
  * postgres/update.clj:83-93) re-expressed as a stream.
  *
  * Two modes, mirroring SURVEY §2.2's streaming disposition:
  *
  *  1. [[foreachBatchInto]] — exact reference parity: every micro-batch
  *     appends raw events into the service's store. Late data of ANY
  *     age lands in its own (old) bucket, because bucketing derives
  *     from the event's own timestamp at query time — the reference's
  *     unbounded-lateness semantics (`postgres/update.clj:24-26`).
  *     Per-micro-batch atomicity replaces the reference's
  *     per-event transaction.
  *
  *  2. [[sliceAggregation]] — the materialized-rollup path: watermarked
  *     tumbling-window aggregation in update mode, emitting per-slice
  *     partial aggregates (counter sums / (count,total) pairs — the
  *     same re-aggregable shapes the rollup tables hold). The watermark
  *     bounds state: this is a DOCUMENTED DEVIATION from the
  *     reference's unbounded lateness — events older than the horizon
  *     are dropped rather than upserted (configure per pipeline).
  *
  * Scale: state is keyed by (window × dims) — cardinality = active
  * series per horizon, not event volume; update-mode emission keeps
  * the sink write proportional to changed keys per micro-batch.
  */
object StreamingIngest {

  /** Mode 1: stream → service store, unbounded lateness (reference
    * parity). The stream must have the canonical event schema
    * (fact STRING, ts TIMESTAMP, value LONG, categories MAP). */
  def foreachBatchInto(stream: DataFrame, service: TimeSeriesService): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the batch id rides along so a replayed micro-batch
        // (at-least-once foreachBatch delivery) is skipped pre-spill
        // and overwrites its own partition dir post-spill
        service.ingest(batch.persist(), batchId)
        ()
      }

  /** Mode 2: watermarked per-slice aggregation (update mode).
    * Output: dims…, window.start as bucket, value columns by fact type. */
  def sliceAggregation(stream: DataFrame, fact: FactDef, dims: Seq[String],
      watermarkHorizon: String = "1 hour"): DataFrame = {
    val dimCols = dims.map(d => col("categories").getItem(d).as(d))
    val prepared = stream
      .where(col("fact") === lit(fact.id))
      .select(dimCols :+ col("ts") :+ col("value"): _*)
      .withWatermark("ts", watermarkHorizon)
    val keys = dims.map(col) :+ window(col("ts"), s"${fact.sliceMinutes} minutes")
    val agged = fact.ftype match {
      case FactType.Average =>
        prepared.groupBy(keys: _*)
          .agg(count(lit(1)).as("counter"), sum("value").as("total"))
      case FactType.Distinct =>
        // streaming aggregation cannot COUNT DISTINCT directly; emit
        // the tall (series × slice × value) partials instead — a plain
        // count over finer keys, fully streaming-legal, and the exact
        // re-aggregable shape Timeseries.sliceBuckets materializes
        prepared.groupBy(keys :+ col("value").as("dval"): _*)
          .agg(count(lit(1)).as("value"))
      case _ =>
        prepared.groupBy(keys: _*).agg(sum("value").as("value"))
    }
    val valueCols: Seq[String] = fact.ftype match {
      case FactType.Average => Seq("counter", "total")
      case FactType.Distinct => Seq("dval", "value")
      case _ => Seq("value")
    }
    agged.select((dims.map(col) :+ col("window.start").as("bucket")) ++
      valueCols.map(col): _*)
  }

  /** Mode 2b: streaming-MAINTAINED materialized rollup on disk. Each
    * micro-batch appends its slice-level partial aggregates into the
    * date-partitioned rollup parquet; partials are re-aggregable, so
    * duplicate (dims, bucket) rows across batches are summed away by
    * every reader ([[graft.operators.Rollups.run]] /
    * [[graft.operators.Rollups.collapsePartials]] / the routing rule)
    * — NO read-merge-overwrite cycle, no watermark, and late data of
    * any age appends into its own (old) date partition, preserving the
    * reference's unbounded-lateness semantics
    * (`postgres/update.clj:24-26`).
    *
    * Idempotency: each batch writes its partials under a DETERMINISTIC
    * batch-scoped partition directory (`__batch_id=<id>/bucket_date=…`)
    * in overwrite mode, so a replayed micro-batch (restart after a
    * crash anywhere between the data write and the marker write)
    * OVERWRITES its own prior — possibly partial — output instead of
    * re-appending it; the batch-id marker is only a fast-skip for
    * fully-committed batches. Readers discover `__batch_id` as an extra
    * partition column and ignore it ([[graft.operators.Rollups.run]] /
    * [[graft.operators.Rollups.compact]] drop it; the partials are
    * re-aggregable so per-batch row duplication per key is summed away
    * regardless). [[graft.operators.Rollups.compact]] bounds row/file/
    * dir counts offline; `TimeSeriesService.registerRollup` points
    * queries at the maintained path. */
  /** Per-stream writer lease on a maintained store — the streaming
    * twin of the event store's single-writer contract
    * (`TimeSeriesService` lease block): each maintained store must
    * have exactly ONE maintaining stream. The lease is RESTART-SAFE
    * by construction: a stream instance claims the store's
    * `__writer.lock` unconditionally on its FIRST batch (a crash
    * restart is a new instance — it re-claims the stale lock and
    * proceeds), then re-verifies ownership on every later batch, so
    * when TWO live streams maintain one directory the later claimer
    * wins and the earlier one fails LOUDLY on its next batch instead
    * of the two silently interleaving `__batch_id=` dirs and batch
    * markers (same-id overwrites, marker ping-pong — corrupted
    * history). Underscore-prefixed, so readers never see it as data. */
  private final class StreamLease {
    val token: String = java.util.UUID.randomUUID().toString
    var claimed = false
  }

  private def leaseCheck(lease: StreamLease, path: String,
      fs: org.apache.hadoop.fs.FileSystem): Unit = {
    val lock = new org.apache.hadoop.fs.Path(path, "__writer.lock")
    if (!lease.claimed) {
      fs.mkdirs(lock.getParent)
      val out = fs.create(lock, true)
      try out.write(lease.token.getBytes("UTF-8")) finally out.close()
      lease.claimed = true
    } else {
      val cur =
        if (!fs.exists(lock)) "<no lease>"
        else {
          val in = fs.open(lock)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        }
      if (cur != lease.token) throw new IllegalStateException(
        s"maintained store at $path is now leased to writer $cur — " +
          "two streams are maintaining the same directory; each " +
          "maintained store takes exactly ONE maintaining stream " +
          "(crash restarts re-claim automatically).")
    }
  }

  /** The idempotence choreography shared by every maintained store:
    * skip batches at or below the persisted high-water marker, write
    * the batch's own deterministic `__batch_id=` directory (a replay
    * OVERWRITES its possibly-partial prior output instead of
    * appending a duplicate), then advance the marker — so a crash
    * between data write and marker write re-runs the batch
    * harmlessly. Holds the per-stream writer lease throughout (see
    * [[StreamLease]]). */
  private def idempotentBatchWrite(path: String, batchId: Long,
      hconf: org.apache.hadoop.conf.Configuration,
      lease: StreamLease)
      (write: String => Unit): Unit = {
    val marker = new org.apache.hadoop.fs.Path(path, "_graft_last_batch")
    val fs = marker.getFileSystem(hconf)
    leaseCheck(lease, path, fs)
    val last =
      if (!fs.exists(marker)) -1L
      else {
        val in = fs.open(marker)
        try scala.io.Source.fromInputStream(in).mkString.trim.toLong
        finally in.close()
      }
    if (batchId > last) {
      write(s"$path/__batch_id=$batchId")
      val out = fs.create(marker, true)
      try out.write(batchId.toString.getBytes("UTF-8"))
      finally out.close()
    }
  }

  def maintainRollup(stream: DataFrame, fact: FactDef, dims: Seq[String],
      path: String): DataStreamWriter[Row] = {
    val lease = new StreamLease
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        idempotentBatchWrite(path, batchId,
            batch.sparkSession.sessionState.newHadoopConf(), lease) { outDir =>
          val dimCols = dims.map(d => col("categories").getItem(d).as(d))
          val prepared = batch
            .where(col("fact") === lit(fact.id))
            .select(dimCols :+ col("ts") :+ col("value"): _*)
          graft.operators.Rollups.build(prepared, fact, fact.sliceMinutes, dims)
            .withColumn("bucket_date", to_date(col("bucket")))
            .write.mode("overwrite")
            .partitionBy("bucket_date")
            .parquet(outDir)
        }
        ()
      }  }

  /** STREAMING manifest maintenance — the ingest-side half of the
    * manifest/result-cache loop: per micro-batch, the batch's
    * per-group content manifest
    * ([[graft.operators.Dedup.contentManifest]]) lands in an
    * idempotent `__batch_id=` directory; the read side
    * ([[readManifest]]) re-aggregates across batches EXACTLY, because
    * the digest is a commutative mod-2⁶⁰ sum — the re-aggregability
    * is precisely what that digest design buys. ZERO streaming state
    * (plain per-batch aggregation), store growth is groups × batches
    * rows, and replays are idempotent via the batch marker. */
  def maintainManifest(stream: DataFrame, textCol: String,
      groupCol: String, path: String): DataStreamWriter[Row] = {
    val lease = new StreamLease
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        idempotentBatchWrite(path, batchId,
            batch.sparkSession.sessionState.newHadoopConf(), lease) { outDir =>
          graft.operators.Dedup.contentManifest(batch, textCol, groupCol)
            .write.mode("overwrite").parquet(outDir)
        }
        ()
      }  }

  /** Collapse a [[maintainManifest]] store to the corpus manifest:
    * counts add, digests add mod 2⁶⁰ — bit-identical to the batch
    * [[graft.operators.Dedup.contentManifest]] over the union of all
    * ingested batches (shared oracle). */
  def readManifest(spark: SparkSession, path: String,
      groupCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col(groupCol))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        pmod(sum(col("digest60").cast("decimal(38,0)"))
          .cast("decimal(38,0)")
          .mod(lit(1152921504606846976L).cast("decimal(38,0)"))
          .cast("long"), lit(1L << 60)).as("digest60"))

  /** The APPROXIMATE-distinct maintained store: per micro-batch,
    * batch-local HLL sketch partials
    * ([[graft.operators.Rollups.sketchPartials]]) land in the batch's
    * idempotent directory; the read side
    * ([[graft.operators.Rollups.collapseSketchPartials]]) unions
    * sketches across batches AND slices in one pass, so a value
    * arriving in different micro-batches of the same calendar bucket
    * still counts once. The streaming twin of the exact tall-partial
    * distinct rollup for unique-per-event value domains where tall
    * partials would be the stream itself (SCALE.md §8) — state here
    * is ZERO (plain per-batch aggregation), store growth is
    * sketch-sized. */
  def maintainSketchRollup(stream: DataFrame, factId: String,
      dims: Seq[String], path: String, sliceMinutes: Int = 15,
      lgK: Int = 12): DataStreamWriter[Row] = {
    val lease = new StreamLease
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        idempotentBatchWrite(path, batchId,
            batch.sparkSession.sessionState.newHadoopConf(), lease) { outDir =>
          val dimCols = dims.map(d => col("categories").getItem(d).as(d))
          val prepared = batch
            .where(col("fact") === lit(factId))
            .select(dimCols :+ col("ts") :+ col("value"): _*)
          graft.operators.Rollups
            .sketchPartials(prepared, dims, sliceMinutes = sliceMinutes,
              lgK = lgK)
            .withColumn("bucket_date", to_date(col("bucket")))
            .write.mode("overwrite")
            .partitionBy("bucket_date")
            .parquet(outDir)
        }
        ()
      }  }

  /** The KLL twin of [[maintainSketchRollup]] on the quantile plane:
    * per-micro-batch value-distribution sketch partials
    * ([[graft.operators.Rollups.kllPartials]]) land in the batch's
    * idempotent directory; the read side
    * ([[graft.operators.Rollups.collapseKllQuantiles]]) merges
    * sketches across batches AND slices in one pass, so a calendar
    * bucket whose values arrived in different micro-batches reads as
    * one distribution. Zero streaming state (plain per-batch
    * aggregation); store growth is sketch-sized (~3 KB per series ×
    * slice × batch) at any value cardinality. */
  def maintainKllRollup(stream: DataFrame, factId: String,
      dims: Seq[String], path: String, sliceMinutes: Int = 15,
      k: Int = 200): DataStreamWriter[Row] = {
    val lease = new StreamLease
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        idempotentBatchWrite(path, batchId,
            batch.sparkSession.sessionState.newHadoopConf(), lease) { outDir =>
          val dimCols = dims.map(d => col("categories").getItem(d).as(d))
          val prepared = batch
            .where(col("fact") === lit(factId))
            .select(dimCols :+ col("ts") :+ col("value"): _*)
          graft.operators.Rollups
            .kllPartials(prepared, dims, sliceMinutes = sliceMinutes, k = k)
            .withColumn("bucket_date", to_date(col("bucket")))
            .write.mode("overwrite")
            .partitionBy("bucket_date")
            .parquet(outDir)
        }
        ()
      }  }

  /** Streaming-maintained BM25 postings index: each micro-batch of
    * documents lands as one `__batch_id=` postings + stats pair via
    * [[graft.operators.TextAnalysis.writePostingsBatch]] — the text
    * plane's maintained store beside the rollup/sketch maintainers
    * above. Zero streaming state (plain per-batch aggregation);
    * replaying a batch after a checkpoint restart overwrites its own
    * directories and nothing else, so delivery is effectively-once.
    * The serving side (`TextAnalysis.bm25TopKFromIndex`) sums the
    * per-batch stats rows and prunes `part=` directories exactly as
    * for a batch-built index — a query cannot tell how the store was
    * maintained. Same contract as every per-batch-dir store: new doc
    * ids only; one maintainer per store path. */
  def maintainTextIndex(stream: DataFrame, textCol: String,
      idCol: String, path: String, nBuckets: Int = 64): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.TextAnalysis.writePostingsBatch(
          batch, textCol, idCol, path, nBuckets, batchId)
        ()
      }

  /** STREAMING ERASURE for the maintained text index — deletion
    * requests consumed as a stream BESIDE [[maintainTextIndex]]'s
    * appends, so a right-to-erasure feed closes continuously instead
    * of waiting for an offline pass: each micro-batch's subject ids
    * (deletion-request bounded — the one driver-side collect, same
    * envelope as the batch eraser's id list) fold through
    * `TextAnalysis.eraseFromTextIndex`, which tombstones each id with
    * its exact `dl` and skips ids already tombstoned. That skip is
    * what makes this REPLAY-IDEMPOTENT with zero streaming state
    * (the `decontaminateStream` discipline): a redelivered or
    * re-checkpointed request batch finds its ids already tombstoned
    * and subtracts NOTHING again, so the served (n, Σdl) stats stay
    * exact under at-least-once delivery. Requests for ids the store
    * has not indexed are 0-count no-ops per the batch contract —
    * upstream honors them when (if) the doc lands. An empty batch is
    * skipped (the batch eraser requires ids). One eraser per store
    * path, like every maintainer; `compactTextIndex` remains the
    * physical closer and history barrier. */
  def eraseTextIndexStream(requests: DataFrame, idCol: String,
      path: String): DataStreamWriter[Row] =
    requests.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ids = batch.select(col(idCol).cast("string"))
          .distinct().collect().map(_.getString(0)).toSeq
        if (ids.nonEmpty)
          graft.operators.TextAnalysis.eraseFromTextIndex(
            batch.sparkSession, path, ids)
        ()
      }

  /** Streaming-maintained CDC STATE TABLE — the continuous form of
    * [[graft.operators.Cdc.applyChanges]]'s compaction loop: each
    * micro-batch of keyed changes applies onto the previous COMMITTED
    * state version and writes a full new version directory
    * (`v=<batchId>`); [[readState]] serves the highest committed
    * version. Replay safety is structural on two levels: a replayed
    * batch recomputes from the version BELOW its own id (its own
    * possibly-partial crash output is ignored and overwritten), and
    * CDC apply is itself idempotent — re-applying the same changes
    * under last-writer-wins cannot alter the state.
    *
    * Each version is the FULL state (reads never chase deltas — one
    * plain parquet scan at any version count); superseded `v=` dirs
    * are the caller's GC step, like retiring pre-erasure stores. No
    * watermark and no streaming state: lateness is handled by the
    * SEQUENCE columns, not arrival time — a late change with an old
    * sequence number simply loses the per-key pick, exactly as in the
    * batch operator. */
  def maintainState(stream: DataFrame, keys: Seq[String],
      payload: Seq[String], seqCols: Seq[String], opCol: String,
      path: String, deleteOp: String = "D"): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val prev = latestStateVersion(s, path, below = batchId)
          .map(v => s.read.parquet(s"$path/v=$v"))
        graft.operators.Cdc
          .applyChanges(prev, batch, keys, payload, seqCols, opCol, deleteOp)
          .write.mode("overwrite").parquet(s"$path/v=$batchId")
        ()
      }

  /** Streaming per-batch QUALITY MONITORING — the time axis of the
    * declarative gate ([[graft.operators.Quality.report]]): every
    * micro-batch's violation report lands under its own
    * `__batch_id=` directory with the batch id as a column, so a
    * degrading feed shows up as a per-batch trend, not a single
    * aggregate. Constraints evaluate WITHIN each micro-batch
    * (uniqueness/referential checks are per-batch by construction —
    * cross-batch invariants belong to an offline pass over the
    * store). Replays overwrite their own directory (effectively-once
    * like every maintained store); an empty batch reports zero
    * violations and passes. */
  def monitorQuality(stream: DataFrame,
      constraints: Seq[graft.operators.Quality.Constraint],
      path: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Quality.report(batch, constraints)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").parquet(s"$path/__batch_id=$batchId")
        ()
      }

  /** Per-batch LATENESS observability — the watermark-health monitor
    * a production stream needs beside the data-quality one: how much
    * of each micro-batch arrived with event times older than the
    * high-water mark the stream had already reached? A rising late
    * share is the operational signal that a watermark horizon is
    * about to start dropping rows (or that an upstream replays
    * history), surfaced as data, not as a silent loss.
    *
    * Semantics (deterministic, replay-stable): the high-water mark
    * entering batch N is max(event ts) over batches < N — the same
    * quantity Spark's own watermark tracks, minus the wall-clock
    * trigger coupling, so the report is a pure function of the batch
    * contents and order. A row is LATE when `ts < hwm − horizonSec`.
    * Batch 0 has no mark and therefore no late rows. The mark is
    * re-armed after a restart from the already-written reports
    * (their recorded `max_ts`), so a resumed monitor judges lateness
    * against everything the stream committed before the crash;
    * per-batch reports overwrite their own `__batch_id=` directory
    * (the idempotent replay discipline every maintained store here
    * uses). One row per batch: (batch_id, n_rows, n_late, max_ts). */
  def monitorLateness(stream: DataFrame, tsCol: String, horizonSec: Long,
      path: String): DataStreamWriter[org.apache.spark.sql.Row] = {
    require(horizonSec >= 0, "horizonSec must be >= 0")
    // driver-held high-water mark; Option so batch 0 is "no mark"
    // rather than epoch-0 (which would spuriously mark nothing late
    // only for nonnegative timestamps)
    var hwm: Option[java.sql.Timestamp] = None
    var armed = false
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (!armed) {
          armed = true
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
          // pre-created-but-empty report dirs must not trip schema
          // inference — re-arm only when committed batch dirs exist
          val hasReports = fs.exists(p) && fs.listStatus(p)
            .exists(_.getPath.getName.startsWith("__batch_id="))
          if (hasReports)
            hwm = spark.read.parquet(path)
              .where(col("__batch_id") < batchId)
              .agg(max(col("max_ts"))).head match {
                case r if r.isNullAt(0) => None
                case r => Some(r.getTimestamp(0))
              }
        }
        val lateBound = hwm.map(h =>
          java.sql.Timestamp.from(h.toInstant.minusSeconds(horizonSec)))
        val isLate = lateBound
          .map(b => col(tsCol) < lit(b)).getOrElse(lit(false))
        val rep = batch.agg(count(lit(1)).as("n_rows"),
            coalesce(sum(when(isLate, 1L).otherwise(0L)), lit(0L))
              .as("n_late"),
            max(col(tsCol)).as("max_ts"))
          .head
        val spark2 = batch.sparkSession
        import spark2.implicits._
        Seq((rep.getLong(0), rep.getLong(1),
            Option(rep.getTimestamp(2))))
          .toDF("n_rows", "n_late", "max_ts")
          .write.mode("overwrite").parquet(s"$path/__batch_id=$batchId")
        hwm = (hwm.toSeq ++ Option(rep.getTimestamp(2)).toSeq)
          .sortBy(_.getTime).lastOption
        ()
      }
  }

  /** STREAM-STATIC SCD enrichment — the streaming twin of
    * [[graft.operators.Scd.pointInTime]]: each micro-batch of facts
    * is enriched with the dimension attributes that were valid AT ITS
    * EVENT TIME against a static (offline-built) Type-2 dimension.
    * The enrichment is a pure function of (fact row, dimension
    * table), so batch boundaries cannot change any output row — a
    * replayed stream produces exactly what one batch pass over the
    * union would, which is what lets the driver query share the
    * batch oracle verbatim. Zero streaming state; per-batch
    * idempotent overwrite dirs like every maintained store here.
    * The dimension is static BY CONTRACT: enriching against a
    * concurrently-rewritten SCD table would tear reads — rebuild the
    * dimension offline and restart the enrichment to pick it up. */
  def enrichPointInTime(stream: DataFrame, scd2: DataFrame,
      keys: Seq[String], factTsCol: String, attrs: Seq[String],
      path: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Scd
          .pointInTime(batch, scd2, keys, factTsCol, attrs)
          .write.mode("overwrite").parquet(s"$path/__batch_id=$batchId")
        ()
      }

  /** The current CDC state: the highest committed version under
    * `path` (a version is committed once its `_SUCCESS` marker
    * exists). */
  def readState(spark: SparkSession, path: String): DataFrame =
    latestStateVersion(spark, path)
      .map(v => spark.read.parquet(s"$path/v=$v"))
      .getOrElse(throw new IllegalStateException(
        s"readState: no committed state version under $path"))

  private def latestStateVersion(spark: SparkSession, path: String,
      below: Long = Long.MaxValue): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val vs = fs.listStatus(p).toSeq.collect {
        case st if st.isDirectory && st.getPath.getName.startsWith("v=") &&
            fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")) =>
          st.getPath.getName.stripPrefix("v=").toLong
      }.filter(_ < below)
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** Streaming-maintained IVF vector store — the vector-plane mirror
    * of [[maintainTextIndex]]: each micro-batch of embeddings assigns
    * to the FROZEN (offline-built) centroid index and lands under its
    * own `__batch_id=` directory, `part=`-partitioned inside. Zero
    * streaming state; replays overwrite their own batch dirs
    * (effectively-once). The index is centroid-defined, so batch
    * boundaries cannot change any assignment — a query over the store
    * (`Similarity.ivfTopKFromStore`) sees exactly what a full rebuild
    * under the same centroids would produce, and the probe's `part=`
    * partition filter prunes across all batch directories. */
  def maintainIvfStore(stream: DataFrame, index: DataFrame, idCol: String,
      vecCol: String, path: String,
      dotFn: (Column, Column) => Column = graft.operators.Similarity.dot)
      : DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val assigned = graft.operators.Similarity
          .assignToCentroids(batch, index, idCol, vecCol, dotFn)
        batch.join(assigned, Seq(idCol))
          .write.mode("overwrite").partitionBy("part")
          .parquet(s"$path/__batch_id=$batchId")
        ()
      }

  /** Streaming benchmark decontamination — the continuous-ingest twin
    * of [[graft.operators.Decontaminate.bloomOverlapReport]]: each
    * micro-batch of incoming training documents is shingled row-locally,
    * pregated by a Bloom filter of the eval corpus built ONCE before
    * the stream starts (a static literal in every batch plan — no
    * per-batch eval work, no stream-stream join), and survivors are
    * verified exactly against the persisted eval shingle set. Per-doc
    * hit counts are batch-local (a doc's shingles all come from its one
    * row), so each batch writes its own complete report rows into a
    * deterministic `__batch_id=` dir — overwrite mode makes replays
    * idempotent, the engine's standard streaming-sink contract. The
    * union of the per-batch dirs IS the batch operator's report
    * (spec-pinned; the driver query shares the batch oracle).
    *
    * @return the configured writer — caller sets checkpoint/trigger
    *   and starts (the [[maintainIvfStore]] contract)
    */
  def decontaminateStream(stream: DataFrame, evalDocs: DataFrame,
      textCol: String, idCol: String, outPath: String,
      k: Int = 3, minHits: Long = 1L,
      fpp: Double = 0.01): DataStreamWriter[Row] = {
    import graft.functions.BloomProbe
    import graft.operators.Dedup
    val spark = evalDocs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    // eval side reduced once, up front: distinct shingle hashes
    // persisted (micro-batches re-read longs, never re-shingle the
    // eval corpus), plus the Bloom pregate as a driver-held literal
    // sibling of outPath, NOT inside it — the report read discovers
    // outPath's __batch_id= partition dirs and must not trip over a
    // foreign-schema subdirectory
    val evalDir = s"${outPath}__eval"
    Dedup.shingleHashKernel(evalDocs, textCol, idCol, k)
      .select(explode(col("hs")).as("sh")).distinct()
      .write.mode("overwrite").parquet(evalDir)
    val evalSh = spark.read.parquet(evalDir)
    val nItems = math.max(evalSh.count(), 1L)
    val bfRow = evalSh
      .agg(BloomProbe.bloomAgg(xxhash64(col("sh")), nItems,
        BloomProbe.bitsFor(nItems, fpp)).as("bf"))
      .head
    val bf = if (bfRow.isNullAt(0)) None
      else Some(lit(bfRow.getAs[Array[Byte]]("bf")))
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ex = Dedup.shingleHashKernel(batch, textCol, idCol, k)
          .select(col("id"), explode(col("hs")).as("sh"))
        val report = bf match {
          case None => // empty eval corpus: nothing can overlap
            ex.select(col("id"), lit(0L).as("hits")).where(lit(false))
          case Some(filter) =>
            ex.where(BloomProbe.mightContain(filter, xxhash64(col("sh"))))
              .join(evalSh, "sh")
              .groupBy(col("id"))
              .agg(count(lit(1)).as("hits"))
              .where(col("hits") >= minHits)
        }
        report.write.mode("overwrite")
          .parquet(s"$outPath/__batch_id=$batchId")
        ()
      }
  }

  /** Start mode-2 into an in-memory sink (testing / small pipelines). */
  def startToMemory(agged: DataFrame, queryName: String): StreamingQuery =
    agged.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .start()

  /** Mode 4: streaming exact deduplication — the streaming twin of
    * `Dedup.exact` for continuous document/event ingest: drop rows
    * whose content key was already seen within the watermark horizon.
    * Keys are md5 hashes of the content column (compact state, never
    * the raw payload — the same no-raw-text-in-state rule the batch
    * kernels follow), deduped by
    * `dropDuplicatesWithinWatermark`: state is bounded by the
    * watermark delay (an unbounded-horizon `dropDuplicates` would grow
    * state forever on an infinite stream). Exactness holds for any
    * duplicate arriving within `watermarkDelay` of the first
    * occurrence; later re-occurrences are late data by contract —
    * route them to the batch dedup pass (the standard lambda
    * reconciliation this engine's batch operators already serve). */
  def dedupStream(stream: DataFrame, contentCol: String, tsCol: String,
      watermarkDelay: String): DataFrame =
    stream
      .withColumn("__content_key", md5(col(contentCol).cast("string")))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__content_key")
      .drop("__content_key")

  /** The streaming twin of [[graft.operators.Dedup.jaccardPairsAgainst]]'s
    * exact-match special case: drop incoming rows whose CONTENT already
    * exists in a static historical corpus — the ingest-time gate that
    * keeps an already-deduped corpus closed under new arrivals. The
    * corpus side collapses to its distinct md5 content keys once
    * (32-byte keys, never the bodies — persist or broadcast-size it at
    * deployment); the stream anti-joins per micro-batch, a
    * stream-static join Structured Streaming executes stateless, so
    * no watermark and no state store are involved (compose with
    * [[dedupStream]] for within-stream duplicates). */
  def dedupStreamAgainst(stream: DataFrame, contentCol: String,
      corpus: DataFrame, corpusContentCol: String): DataFrame = {
    val keys = corpus
      .select(md5(col(corpusContentCol).cast("string")).as("__content_key"))
      .distinct()
    stream
      .withColumn("__content_key", md5(col(contentCol).cast("string")))
      .join(keys, Seq("__content_key"), "left_anti")
      .drop("__content_key")
  }

  /** Mode 6: STREAM-STREAM interval join — the streaming twin of
    * [[graft.operators.RangeJoin.band]]'s click→purchase attribution
    * read. Clicks and purchases are two event-type branches of one
    * incoming stream (a streaming self-join); each side carries its
    * own watermark, and the join condition bounds purchase time to
    * [click, click + windowSeconds) — the event-time range constraint
    * Spark's symmetric hash join needs to EVICT state: click-side rows
    * age out `windowSeconds` past the watermark (a later matching
    * purchase is provably impossible), purchase-side rows at the
    * watermark itself. Inner join ⇒ each matched pair emits in the
    * micro-batch where the later row arrives; no end-of-stream flush
    * is needed for output, only for state cleanup.
    *
    * Output columns (click_id, user_id, purchase_id) match the batch
    * operator's driver query, so both serve the SAME oracle. Scale:
    * state is bounded by events inside the watermark+window horizon
    * per key — never the stream's history. */
  def attributionStream(events: DataFrame, windowSeconds: Long,
      watermarkDelay: String): DataFrame = {
    require(windowSeconds > 0, "window must be positive")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermarkDelay)
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <
          col("click_ts") + expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(col("click_id"), col("c_user").as("user_id"),
        col("purchase_id"))
  }

  /** An open (not yet gap-closed) session interval in streaming state.
    * Bounds are epoch MICROSECONDS: `Timestamp.getTime` is
    * millisecond-truncating, and a session_start emitted at ms
    * precision would diverge from the µs-exact batch `session_window`
    * twin (the batch/stream-equivalence gate hashes them equal). */
  case class OpenSession(startUs: Long, endUs: Long, n: Long)

  /** Per-user streaming sessionization state: open intervals only —
    * cardinality is concurrent sessions per user inside the watermark
    * horizon, never event volume. */
  case class SessionBuf(open: Seq[OpenSession])

  /** A gap-closed session, emitted exactly once. */
  case class ClosedSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Mode 3: custom streaming state via `flatMapGroupsWithState` —
    * gap sessionization, the streaming twin of the batch
    * `session_window` operator (`event_sessions` driver query). Events
    * merge into a session while consecutive gaps stay under
    * `gapMinutes` (strict `<`, matching `session_window`'s
    * window-overlap rule); a session is emitted once the event-time
    * watermark passes its last event + gap.
    *
    * State holds a sorted list of open intervals per user, so
    * out-of-order events inside the watermark horizon merge correctly
    * (including bridging two previously-separate intervals). Emission
    * uses event-time timeouts: users with no new events still close
    * their sessions when the watermark advances. */
  def sessionizeStream(events: DataFrame, gapMinutes: Int,
      watermarkDelay: String): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L
    // µs-exact conversions: Timestamp.getTime truncates to ms, the
    // sub-ms fraction lives in getNanos — recombine (and split back on
    // emission) so streamed session bounds equal the batch twin's
    def toUs(t: Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def toTs(us: Long): Timestamp =
      Timestamp.from(java.time.Instant.ofEpochSecond(
        math.floorDiv(us, 1000000L), math.floorMod(us, 1000000L) * 1000L))
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), col("ts"))
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionBuf, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val existing = if (state.exists) state.get.open else Seq.empty
          val incoming =
            rows.map { r => val us = toUs(r._2); OpenSession(us, us, 1L) }.toSeq
          val merged = (existing ++ incoming)
            .sortBy(s => (s.startUs, s.endUs))
            .foldLeft(List.empty[OpenSession]) { (acc, s) =>
              acc match {
                case h :: t if s.startUs < h.endUs + gapUs =>
                  OpenSession(h.startUs, math.max(h.endUs, s.endUs), h.n + s.n) :: t
                case _ => s :: acc
              }
            }.reverse
          val (closed, open) = merged.partition(_.endUs + gapUs <= wmUs)
          if (open.nonEmpty) {
            state.update(SessionBuf(open))
            // earliest possible close, CEIL'd to ms (the timeout clock):
            // ceil keeps it strictly > wm, floor could re-arm in the past
            state.setTimeoutTimestamp(
              open.map(s => math.floorDiv(s.endUs + gapUs + 999L, 1000L)).min)
          } else {
            state.remove()
          }
          closed.iterator.map(s =>
            ClosedSession(user, toTs(s.startUs), toTs(s.endUs), s.n))
      }
  }

  /** Per-user CAPPED-session streaming state: watermark-gated pending
    * event times (µs) + the open session triple (`hasOpen` false ⇔
    * the triple is garbage). Pending is bounded by the watermark
    * horizon; the open session is three longs. */
  case class CappedSessBuf(pending: Seq[Long], startUs: Long,
      prevUs: Long, n: Long, hasOpen: Boolean)

  /** An event awaiting its watermark in next-example state. */
  case class PendingNe(us: Long, id: Long, etype: String)

  /** Per-user next-example state: watermark-bounded pending events +
    * the last ≤k drained event types (the trailing context) + the last
    * drained event time. `hasPrev` false ⇔ lastUs is garbage. */
  case class NeBuf(pending: Seq[PendingNe], recent: Seq[String],
      lastUs: Long, hasPrev: Boolean)

  /** One emitted training example — identical shape to the batch
    * [[graft.operators.Sessions.nextEventExamples]] output. */
  case class NextExample(event_id: Long, user_id: Long, prefix: String,
      gap_us: Long, label: String)

  /** STREAMING twin of
    * [[graft.operators.Sessions.nextEventExamples]] — online
    * training-example generation: the moment an event's floor-second
    * passes the watermark it is drained in exact (ts, event id) order
    * and emitted with the user's trailing ≤k event types and the
    * µs-exact gap since the previous event, labeled by itself. The
    * watermark-gated ordered drain ([[anomalyStream]]'s discipline)
    * makes the emitted examples EQUAL the batch window's (shared
    * oracle): a late-but-in-horizon arrival slots into its true
    * position before anything after it is processed. State per user:
    * horizon-bounded pending + ≤k type strings + one long. First
    * events (no predecessor) are not examples, exactly like batch. */
  def nextExampleStream(events: DataFrame, k: Int,
      watermarkDelay: String): Dataset[NextExample] = {
    val spark = events.sparkSession
    import spark.implicits._
    def toUs(t: Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), col("ts"),
        col("event_type"), col("event_id").cast("long"))
      .as[(Long, Timestamp, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[NeBuf, NextExample](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state) =>
          val wmMs = state.getCurrentWatermarkMs()
          val st = if (state.exists) state.get
            else NeBuf(Nil, Nil, 0L, hasPrev = false)
          val incoming = rows.map(r => PendingNe(toUs(r._2), r._4, r._3))
          val (ready, rest) = (st.pending ++ incoming)
            .partition(p => (math.floorDiv(p.us, 1000000L) + 1L) * 1000L <= wmMs)
          val out = Seq.newBuilder[NextExample]
          var recent = st.recent
          var last = st.lastUs
          var hasPrev = st.hasPrev
          ready.sortBy(p => (p.us, p.id)).foreach { p =>
            if (hasPrev)
              out += NextExample(p.id, user, recent.mkString(" "),
                p.us - last, p.etype)
            recent = (recent :+ p.etype).takeRight(k)
            last = p.us
            hasPrev = true
          }
          // the trailing context must survive idle periods — state is
          // permanent per user (like userFeatureStream), re-invoked on
          // the key's next data; only drain pending needs a timeout
          state.update(NeBuf(rest, recent, last, hasPrev))
          if (rest.nonEmpty) state.setTimeoutTimestamp(wmMs + 1L)
          out.result().iterator
      }
  }

  /** STREAMING twin of [[graft.operators.Sessions.cappedSessions]]
    * (gap + max-duration). The cap makes the fold order-sensitive in
    * a way plain gap-merge is not — a session's START decides later
    * splits, and a compressed (start, end, n) span cannot be re-split
    * when a late event lands inside it — so this twin uses the
    * watermark-gated ORDERED DRAIN ([[anomalyStream]]'s discipline):
    * events buffer until their whole floor-second passes the
    * watermark, then feed the greedy fold in exact event-time order.
    * The open session closes once the watermark proves no pending or
    * future event can still join it (every such event would split by
    * gap or cap anyway) — late-but-in-horizon arrivals therefore
    * slot into their true position and the emitted sessions equal
    * the batch fold's exactly (shared oracle). State per user:
    * horizon-bounded pending + three longs. */
  def cappedSessionStream(events: DataFrame, gapMinutes: Int,
      maxDurationMinutes: Int, watermarkDelay: String)
      : Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L
    val capUs = maxDurationMinutes * 60000000L
    def toUs(t: Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def toTs(us: Long): Timestamp =
      Timestamp.from(java.time.Instant.ofEpochSecond(
        math.floorDiv(us, 1000000L), math.floorMod(us, 1000000L) * 1000L))
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), col("ts"))
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CappedSessBuf, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state) =>
          val wmMs = state.getCurrentWatermarkMs()
          val wmUs = wmMs * 1000L
          val st = if (state.exists) state.get
            else CappedSessBuf(Nil, 0L, 0L, 0L, hasOpen = false)
          val incoming = rows.map(r => toUs(r._2)).toSeq
          val (ready, rest) = (st.pending ++ incoming)
            .partition(us => (math.floorDiv(us, 1000000L) + 1L) * 1000L <= wmMs)
          val out = Seq.newBuilder[ClosedSession]
          var hasOpen = st.hasOpen
          var start = st.startUs
          var prev = st.prevUs
          var n = st.n
          ready.sorted.foreach { t =>
            if (!hasOpen) { hasOpen = true; start = t; prev = t; n = 1L }
            else if (t - prev > gapUs || t - start > capUs) {
              out += ClosedSession(user, toTs(start), toTs(prev), n)
              start = t; prev = t; n = 1L
            } else { prev = t; n += 1L }
          }
          // close once NOTHING can still join: the watermark passed the
          // gap horizon AND every still-pending event would split
          // anyway. STRICTLY past: the split rule is `t − prev > gap`,
          // and an on-time event can carry ts == watermark — at
          // wm == prev+gap such an event still JOINS (gap not
          // exceeded), so `<=` here would close one event early and
          // diverge from the batch fold. (The gap-only sessionizer's
          // `<=` close is correct because ITS merge rule is strict
          // `<`; the rules invert together.)
          if (hasOpen && prev + gapUs < wmUs &&
              rest.forall(t => t - prev > gapUs || t - start > capUs)) {
            out += ClosedSession(user, toTs(start), toTs(prev), n)
            hasOpen = false
          }
          if (!hasOpen && rest.isEmpty) state.remove()
          else {
            state.update(CappedSessBuf(rest, start, prev, n, hasOpen))
            if (rest.nonEmpty) state.setTimeoutTimestamp(wmMs + 1L)
            // first ms STRICTLY past the gap edge — ceil-to-ms could
            // land ON the edge, where the close above (correctly)
            // refuses and the re-armed equal timeout would throw
            else state.setTimeoutTimestamp(
              math.floorDiv(prev + gapUs, 1000L) + 1L)
          }
          out.result().iterator
      }
  }

  /** An event awaiting its watermark in streaming funnel state (µs
    * timestamps: stage qualification compares strict ts order, which
    * must match the batch twin's microsecond-exact `>`). */
  case class PendingFunnelEv(us: Long, eventId: Long, etype: String)

  /** Per-user streaming funnel state: watermark-gated pending events +
    * the qualifying time (µs) of every stage reached so far. `reached`
    * is ≤ |stages| longs and NEVER removed — dropping it after
    * completion would let a later event replay stage 0. */
  case class FunnelBuf(pending: Seq[PendingFunnelEv], reached: Seq[Long])

  /** A stage advancement, emitted exactly once per (user, stage) —
    * qualifying times are monotone per user, so append mode fits. */
  case class FunnelHit(user_id: Long, stage_idx: Long, ts: Timestamp)

  /** STREAMING twin of [[graft.operators.Funnel.funnel]] for
    * event-type stages: per user, emit (stage_idx, qualifying ts) the
    * moment a stage is reached — stage 0 on the user's first matching
    * event, stage i on the first event of type `stages(i)` STRICTLY
    * after the stage i−1 qualifying time. Same watermark-gated
    * ordered drain as [[anomalyStream]] (a whole floor-second drains
    * at once, in (ts, event id) order), so the incremental chain of
    * earliest-qualifying times is exactly the batch computation —
    * an out-of-order arrival inside the horizon slots into its true
    * position before anything later is processed. Aggregating the
    * sink by stage reproduces the batch funnel counts verbatim.
    * State per user: pending (watermark-bounded) + ≤ |stages|
    * qualifying times. */
  def funnelStream(events: DataFrame, stages: Seq[String],
      watermarkDelay: String): Dataset[FunnelHit] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    def toUs(t: Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def toTs(us: Long): Timestamp =
      Timestamp.from(java.time.Instant.ofEpochSecond(
        math.floorDiv(us, 1000000L), math.floorMod(us, 1000000L) * 1000L))
    val stagesLocal = stages
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), col("ts"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelBuf, FunnelHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state) =>
          val wmMs = state.getCurrentWatermarkMs()
          val st = if (state.exists) state.get else FunnelBuf(Nil, Nil)
          val incoming = rows.map(r =>
            PendingFunnelEv(toUs(r._2), r._3, r._4)).toSeq
          // final once the whole floor-second passed the watermark —
          // same gate as anomalyStream, in µs
          val (ready, rest) = (st.pending ++ incoming).partition(e =>
            (math.floorDiv(e.us, 1000000L) + 1L) * 1000L <= wmMs)
          var reached = st.reached.toVector
          val hits = Seq.newBuilder[FunnelHit]
          ready.sortBy(e => (e.us, e.eventId)).foreach { e =>
            val i = reached.length
            if (i < stagesLocal.length && e.etype == stagesLocal(i) &&
              (i == 0 || e.us > reached(i - 1))) {
              reached = reached :+ e.us
              hits += FunnelHit(user, i.toLong, toTs(e.us))
            }
          }
          state.update(FunnelBuf(rest, reached))
          if (rest.nonEmpty) state.setTimeoutTimestamp(wmMs + 1L)
          hits.result().iterator
      }
  }

  /** An event awaiting its watermark in streaming anomaly state. */
  case class PendingObs(sec: Long, eventId: Long, x: Long)

  /** Per-entity streaming anomaly state: watermark-gated pending
    * events + the trailing ring of the last ≤ baseN PROCESSED values
    * (oldest first). Pending size is bounded by the watermark horizon;
    * the ring is fixed-size — state never grows with stream length. */
  case class AnomalyBuf(pending: Seq[PendingObs], ring: Seq[Long])

  /** A flagged observation, emitted exactly once. Column names match
    * the batch `event_anomalies` surface. */
  case class FlaggedObs(event_id: Long, user_id: Long, value_cents: Long,
      n_base: Long, base_sum: Long)

  /** Mode 4: streaming anomaly detection — the streaming twin of
    * [[graft.operators.Anomaly.trailingZFlags]] (`event_anomalies`
    * driver query). Per entity, an observation is flagged when it
    * deviates > `k` trailing sigmas from the previous ≤ `baseN`
    * observations in (floor-second, event id) order — the
    * cross-multiplied integer test `(n·x−S)² > k²·(n·Σx²−S²)`,
    * evaluated in BigInt so the verdict is exact over any long input
    * (the batch twin's decimal(38,0) domain and beyond).
    *
    * Event-time correctness: incoming events BUFFER in state until the
    * watermark passes them — only then are they processed, in
    * (sec, event id) order, against the trailing ring. Out-of-order
    * arrivals inside the watermark horizon therefore see exactly the
    * baseline the batch operator gives them; emission uses event-time
    * timeouts so buffered events drain when the watermark advances
    * with no new data. Input columns: `user_id, ts, event_id,
    * value_cents`.
    *
    * Scale: state per entity = (horizon-bounded pending, baseN ring);
    * one stateful shuffle on the entity key — identical posture to
    * [[sessionizeStream]]. */
  def anomalyStream(events: DataFrame, baseN: Int, minN: Int, k: Int,
      watermarkDelay: String): Dataset[FlaggedObs] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), col("ts"),
        col("event_id").cast("long"), col("value_cents").cast("long"))
      .as[(Long, Timestamp, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AnomalyBuf, FlaggedObs](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state) =>
          val wmMs = state.getCurrentWatermarkMs()
          val st = if (state.exists) state.get else AnomalyBuf(Nil, Nil)
          val incoming = rows.map { r =>
            PendingObs(math.floorDiv(r._2.getTime, 1000L), r._3, r._4)
          }.toSeq
          // An event is final once its WHOLE floor-second has passed
          // the watermark: any later arrival in that second would be
          // older than the watermark and dropped before reaching state,
          // so no future row can order before it on the (sec, event id)
          // key. Process final events in the batch twin's order; the
          // rest stay pending.
          val (ready, rest) = (st.pending ++ incoming)
            .partition(e => (e.sec + 1L) * 1000L <= wmMs)
          var ring = st.ring.toVector
          val flags = Seq.newBuilder[FlaggedObs]
          ready.sortBy(e => (e.sec, e.eventId)).foreach { e =>
            val n = ring.length
            if (n >= minN) {
              val nB = BigInt(n)
              val xB = BigInt(e.x)
              val s = ring.foldLeft(BigInt(0))(_ + BigInt(_))
              val sxx = ring.foldLeft(BigInt(0))((a, v) =>
                a + BigInt(v) * BigInt(v))
              val lhs = (nB * xB - s) * (nB * xB - s)
              val rhs = BigInt(k.toLong * k) * (nB * sxx - s * s)
              if (lhs > rhs) {
                // the verdict is BigInt-exact, but the emitted base_sum
                // diagnostic is a Long column: raise on overflow like
                // the batch twin's ANSI decimal→long cast does, rather
                // than silently wrapping (needs baseN extreme longs)
                if (!s.isValidLong) throw new ArithmeticException(
                  s"base_sum $s overflows LONG for entity $user — " +
                    "beyond the batch surface's emitted-column domain")
                flags += FlaggedObs(e.eventId, user, e.x, n.toLong, s.toLong)
              }
            }
            ring = (ring :+ e.x).takeRight(baseN)
          }
          state.update(AnomalyBuf(rest, ring))
          // wake on the next watermark advance while events are gated;
          // a ring with no pending needs no timer (future data re-arms)
          if (rest.nonEmpty) state.setTimeoutTimestamp(wmMs + 1L)
          flags.result().iterator
      }
  }

  /** Per-entity streaming EWMA state: watermark-gated pending events
    * plus the last `w−1` processed values (the next observation's
    * trailing frame). Bounded by (watermark horizon, w). */
  case class EwmaBuf(pending: Seq[PendingObs], ring: Seq[Long])

  /** One smoothed observation, emitted exactly once. Column names
    * match the batch `event_ewma` surface. */
  case class EwmaObs(event_id: Long, user_id: Long, value_cents: Long,
      ewma_e4: Long)

  /** Streaming EWMA twin of `Anomaly.ewma` (α = 1/2, trailing-`w`
    * frame): the same watermark-gated ordered drain as
    * [[anomalyStream]] — an event processes once its whole
    * floor-second passes the watermark, in (sec, event id) order, so
    * the Horner fold sees exactly the batch window's frame. State is
    * O(w + pending) per entity; arithmetic is the batch twin's exact
    * long fold with one double division. */
  def ewmaStream(events: DataFrame, w: Int,
      watermarkDelay: String): Dataset[EwmaObs] = {
    require(w >= 1 && w <= 62, s"ewma window must be in [1, 62], got $w")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), col("ts"),
        col("event_id").cast("long"), col("value_cents").cast("long"))
      .as[(Long, Timestamp, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EwmaBuf, EwmaObs](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state) =>
          val wmMs = state.getCurrentWatermarkMs()
          val st = if (state.exists) state.get else EwmaBuf(Nil, Nil)
          val incoming = rows.map { r =>
            PendingObs(math.floorDiv(r._2.getTime, 1000L), r._3, r._4)
          }.toSeq
          val (ready, rest) = (st.pending ++ incoming)
            .partition(e => (e.sec + 1L) * 1000L <= wmMs)
          var ring = st.ring.toVector
          val out = Seq.newBuilder[EwmaObs]
          ready.sortBy(e => (e.sec, e.eventId)).foreach { e =>
            val frame = (ring :+ e.x).takeRight(w)
            val num = frame.foldLeft(0L)((acc, x) => acc * 2L + x)
            val den = (1L << frame.length) - 1L
            out += EwmaObs(e.eventId, user, e.x,
              math.floor((10000.0 * num) / den).toLong)
            ring = frame.takeRight(w - 1)
          }
          state.update(EwmaBuf(rest, ring))
          if (rest.nonEmpty) state.setTimeoutTimestamp(wmMs + 1L)
          out.result().iterator
      }
  }

  /** Per-entity streaming CUSUM state: watermark-gated pending events
    * plus the two tabular statistics — O(1) beyond the horizon-bounded
    * pending buffer (the closed form's running sum/min collapse into
    * the recursion's single accumulator per side). */
  case class CusumBuf(pending: Seq[PendingObs], sPos: Long, sNeg: Long)

  /** A flagged drift observation, emitted exactly once. Column names
    * match the batch `event_cusum` surface. */
  case class ShiftObs(event_id: Long, user_id: Long, value_cents: Long,
      s_pos: Long, s_neg: Long)

  /** Streaming CUSUM twin of `Anomaly.cusumFlags` (Page's sequential
    * drift test) — the continuous-monitoring deployment the batch
    * operator's closed form exists to oracle: per entity the textbook
    * recursion `S⁺ = max(0, S⁺ + (x − target − slack))` /
    * `S⁻ = max(0, S⁻ + (target − slack − x))` advances one O(1) state
    * pair per processed event (AnomalySpec pins recursion ≡ closed
    * form, so this twin and the batch window algebra are
    * interchangeable row-for-row and share one oracle).
    *
    * Same watermark-gated ordered drain as [[anomalyStream]]: events
    * buffer until their whole floor-second passes the watermark, then
    * process in (sec, event id) order — out-of-order arrivals inside
    * the horizon see exactly the batch prefix. Rows where either
    * statistic reaches `threshold` are emitted (the batch query's
    * `is_shift` filter). Input columns: `user_id, ts, event_id,
    * value_cents`.
    *
    * Scale: state per entity = horizon-bounded pending + TWO longs —
    * the cheapest stateful twin in this module (the anomaly ring keeps
    * baseN values, EWMA keeps w−1; CUSUM's full history folds into
    * its accumulators). One stateful shuffle on the entity key. */
  def cusumStream(events: DataFrame, target: Long, slack: Long,
      threshold: Long, watermarkDelay: String): Dataset[ShiftObs] = {
    require(slack >= 0, s"cusum slack must be >= 0, got $slack")
    require(threshold > 0, s"cusum threshold must be > 0, got $threshold")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), col("ts"),
        col("event_id").cast("long"), col("value_cents").cast("long"))
      .as[(Long, Timestamp, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CusumBuf, ShiftObs](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state) =>
          val wmMs = state.getCurrentWatermarkMs()
          val st = if (state.exists) state.get else CusumBuf(Nil, 0L, 0L)
          val incoming = rows.map { r =>
            PendingObs(math.floorDiv(r._2.getTime, 1000L), r._3, r._4)
          }.toSeq
          val (ready, rest) = (st.pending ++ incoming)
            .partition(e => (e.sec + 1L) * 1000L <= wmMs)
          var sPos = st.sPos
          var sNeg = st.sNeg
          val out = Seq.newBuilder[ShiftObs]
          ready.sortBy(e => (e.sec, e.eventId)).foreach { e =>
            // Math.addExact: the batch twin raises under ANSI on a
            // prefix-sum overflow instead of wrapping — match it
            sPos = math.max(0L, Math.addExact(sPos, e.x - target - slack))
            sNeg = math.max(0L, Math.addExact(sNeg, target - slack - e.x))
            if (sPos >= threshold || sNeg >= threshold)
              out += ShiftObs(e.eventId, user, e.x, sPos, sNeg)
          }
          state.update(CusumBuf(rest, sPos, sNeg))
          if (rest.nonEmpty) state.setTimeoutTimestamp(wmMs + 1L)
          out.result().iterator
      }
  }

  /** Per-entity streaming Holt state: watermark-gated pending events
    * plus (level, trend, count) — O(1) beyond pending; the batch
    * operator's full-history fold is exactly this accumulator. */
  case class HoltBuf(pending: Seq[PendingObs], l: Long, b: Long, n: Long)

  /** One smoothed observation with its post-update state. */
  case class HoltObs(event_id: Long, user_id: Long, value_cents: Long,
      level_e4: Long, trend_e4: Long)

  /** Streaming Holt twin of `Anomaly.holt` (α = 1/2, β = 1/4 integer
    * floor-division recursion): the batch operator serves the FINAL
    * per-series state; this twin emits the state AFTER EVERY
    * observation — the continuous-forecasting read ("current level,
    * trend right now") a capacity dashboard polls. Same watermark-
    * gated ordered drain as the CUSUM twin; arithmetic is
    * `Math.floorDiv`, bit-identical to the batch fold's
    * floor(x / 2.0) inside the documented 2⁵³ domain (AnomalySpec
    * pins the equality). State per entity: pending + three longs. */
  def holtStream(events: DataFrame,
      watermarkDelay: String): Dataset[HoltObs] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), col("ts"),
        col("event_id").cast("long"), col("value_cents").cast("long"))
      .as[(Long, Timestamp, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HoltBuf, HoltObs](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state) =>
          val wmMs = state.getCurrentWatermarkMs()
          val st = if (state.exists) state.get else HoltBuf(Nil, 0L, 0L, 0L)
          val incoming = rows.map { r =>
            PendingObs(math.floorDiv(r._2.getTime, 1000L), r._3, r._4)
          }.toSeq
          val (ready, rest) = (st.pending ++ incoming)
            .partition(e => (e.sec + 1L) * 1000L <= wmMs)
          var (l, b, n) = (st.l, st.b, st.n)
          val out = Seq.newBuilder[HoltObs]
          ready.sortBy(e => (e.sec, e.eventId)).foreach { e =>
            if (n == 0L) { l = e.x * 10000L; b = 0L }
            else {
              val ln = Math.floorDiv(e.x * 10000L + l + b, 2L)
              b = Math.floorDiv(ln - l + 3L * b, 4L)
              l = ln
            }
            n += 1L
            out += HoltObs(e.eventId, user, e.x, l, b)
          }
          state.update(HoltBuf(rest, l, b, n))
          if (rest.nonEmpty) state.setTimeoutTimestamp(wmMs + 1L)
          out.result().iterator
      }
  }

  /** An event awaiting its watermark in streaming feature state. */
  case class PendingFeat(sec: Long, eventId: Long)

  /** Per-entity streaming rolling-feature state: watermark-gated
    * pending events + the PROCESSED event seconds still inside the
    * trailing window, run-length encoded as ascending (sec, count)
    * pairs — so a hot entity's state grows with DISTINCT seconds in
    * the window (≤ windowSecs entries), not with its event count —
    * plus the last processed second. Bounded by (watermark horizon,
    * windowSecs).
    *
    * STATE-SHAPE COMPATIBILITY: `recent` was `Seq[Long]` (one entry
    * per event) before the run-length encoding; checkpoints written by
    * that shape cannot be restored by this one (Spark's state encoder
    * has no migration hook). A deployment upgrading across the change
    * must restart the query from a NEW checkpoint location and replay
    * the source from an offset at or before the old watermark. */
  case class FeatBuf(pending: Seq[PendingFeat], recent: Seq[(Long, Long)],
      lastSec: Long, hasLast: Boolean)

  /** Rolling features for one observation, emitted exactly once.
    * Column names match the batch `event_user_features` surface. */
  case class UserFeatures(event_id: Long, user_id: Long, n_prev_1h: Long,
      secs_since_prev: Option[Long])

  /** Mode 5: streaming rolling entity features — the streaming twin of
    * the batch `event_user_features` windows: per entity, the
    * tie-complete trailing-window event count (RANGE frame — every
    * event in the same floor-second counts its peers) and the seconds
    * since the previous event in (sec, event id) order.
    *
    * Same watermark-gated ordered drain as [[anomalyStream]]: events
    * buffer until their whole floor-second passes the watermark — at
    * that point every same-second peer has either arrived or is late
    * (dropped), so the tie group is complete and the RANGE count is
    * exact. Input columns: `user_id, ts, event_id`;
    * `windowSecs` = trailing RANGE width (batch twin uses 3600). */
  def userFeatureStream(events: DataFrame, windowSecs: Long,
      watermarkDelay: String): Dataset[UserFeatures] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), col("ts"),
        col("event_id").cast("long"))
      .as[(Long, Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FeatBuf, UserFeatures](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state) =>
          val wmMs = state.getCurrentWatermarkMs()
          val st = if (state.exists) state.get
            else FeatBuf(Nil, Nil, 0L, hasLast = false)
          val incoming = rows.map { r =>
            PendingFeat(math.floorDiv(r._2.getTime, 1000L), r._3)
          }.toSeq
          val (ready, rest) = (st.pending ++ incoming)
            .partition(e => (e.sec + 1L) * 1000L <= wmMs)
          var recent = st.recent.toVector
          var lastSec = st.lastSec
          var hasLast = st.hasLast
          val out = Seq.newBuilder[UserFeatures]
          // drain whole SECONDS in order: the tie group at each second
          // is final, so the RANGE count includes all peers. `recent`
          // is run-length encoded — seconds are drained in ascending
          // order and a drained second can never recur (later arrivals
          // are behind the watermark), so each second appends exactly
          // one (sec, count) entry and the vector stays sorted.
          ready.groupBy(_.sec).toSeq.sortBy(_._1).foreach { case (t, g) =>
            recent = recent.dropWhile(_._1 < t - windowSecs)
            val tie = g.sortBy(_.eventId)
            val n = recent.iterator.map(_._2).sum + tie.length
            tie.zipWithIndex.foreach { case (e, i) =>
              val prev =
                if (i > 0) Some(0L)
                else if (hasLast) Some(t - lastSec)
                else None
              out += UserFeatures(e.eventId, user, n, prev)
            }
            recent = recent :+ (t -> tie.length.toLong)
            lastSec = t
            hasLast = true
          }
          state.update(FeatBuf(rest, recent, lastSec, hasLast))
          if (rest.nonEmpty) state.setTimeoutTimestamp(wmMs + 1L)
          out.result().iterator
      }
  }
}
