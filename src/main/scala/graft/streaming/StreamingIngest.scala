package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

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
      .foreachBatch { (batch: DataFrame, _: Long) =>
        service.ingest(batch.persist())
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
      case _ =>
        prepared.groupBy(keys: _*).agg(sum("value").as("value"))
    }
    val valueCols: Seq[String] = fact.ftype match {
      case FactType.Average => Seq("counter", "total")
      case _ => Seq("value")
    }
    agged.select((dims.map(col) :+ col("window.start").as("bucket")) ++
      valueCols.map(col): _*)
  }

  /** Start mode-2 into an in-memory sink (testing / small pipelines). */
  def startToMemory(agged: DataFrame, queryName: String): StreamingQuery =
    agged.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .start()
}
