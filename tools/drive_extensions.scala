// SparkSessionExtensions entry-point drive: run with
//   /opt/spark/bin/spark-shell --master 'local[4]' \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.shuffle.partitions=4 \
//     --conf spark.sql.extensions=graft.GraftExtensions \
//     --jars target/scala-2.13/timeseriesstoragespark_2.13-0.1.0.jar \
//     -I tools/drive_extensions.scala <<< ""
// Proves the rule injects through the standard extensions config — the
// production wiring where users never touch `experimental` — and that
// registered rollups serve user SQL transparently in such a session.
import graft.functions.TimeKernel.ts
import graft.operators.Rollups
import graft.plans.RollupRouting
import org.apache.spark.sql.functions.{col, count, lit}
import spark.implicits._
val evDir = java.nio.file.Files.createTempDirectory("drive-extev").toString
Seq((1L, ts("2024-01-05T10:05"), "click", 2.0), (2L, ts("2024-01-05T10:06"), "view", 3.0), (3L, ts("2024-01-06T11:06"), "click", 4.0)).toDF("event_id", "ts", "event_type", "value").write.mode("overwrite").parquet(evDir)
val ev = spark.read.parquet(evDir)
val rollDir = java.nio.file.Files.createTempDirectory("drive-extroll").toString
Rollups.materializePartials(ev, Seq("event_type"), rollDir)
// NOTE: no RollupRouting.install — the GraftExtensions conf must have
// injected the rule at session build
RollupRouting.register(spark, ev, Rollups.read(spark, rollDir), Seq("event_type"))
ev.createOrReplaceTempView("events_ext")
val q = spark.sql("SELECT event_type, count(*) AS n FROM events_ext GROUP BY 1")
assert(q.queryExecution.executedPlan.toString.contains(rollDir), "extensions-injected rule did not route")
val rows = q.collect().map(r => (r.getString(0), r.getLong(1))).toSet
assert(rows == Set(("click", 2L), ("view", 1L)), s"routed rows: $rows")
// the umbrella extensions also inject the SQL-surface functions —
// resolvable from plain SQL text with no register() call
val fn = spark.sql("SELECT graft_slice(TIMESTAMP '2014-03-21 16:46:30', 15), graft_week(TIMESTAMP '2023-12-31 10:00:00'), graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))").head
assert(fn.getTimestamp(0) == ts("2014-03-21T16:45"), s"graft_slice: $fn")
assert(fn.getTimestamp(1) == ts("2023-12-24T00:00"), s"graft_week: $fn")
assert(fn.getDouble(2) == 11.0, s"graft_dot: $fn")
val ew = spark.sql("SELECT graft_ewma_e4(array(100L, 200L))").head.getLong(0)
assert(ew == 1333333L, s"graft_ewma_e4: $ew")
// pipeline-plane SQL surface (graft.sql.PipelineViews): one install
// line per read, then consumption is pure SQL text — composable with
// user SQL and optimizer-transparent (the view IS the operator plan)
val docs = Seq((0L, "alpha beta", "s0"), (1L, "alpha beta", "s1"), (2L, "gamma delta", "s0")).toDF("doc_id", "text", "source")
graft.sql.PipelineViews.installDedupRate(spark, docs)
val dr = spark.sql("SELECT source, n_docs, n_canonical, dup_e4 FROM graft_dedup_rate_by_source ORDER BY source").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
assert(dr == Seq(("s0", 2L, 2L, 0L), ("s1", 1L, 0L, 10000L)), s"dedup rate view: $dr")
val idxDir = java.nio.file.Files.createTempDirectory("drive-extbm25").toString
graft.operators.TextAnalysis.buildTextIndex(docs, "text", "doc_id", idxDir, nBuckets = 8)
graft.sql.PipelineViews.installBm25(spark, idxDir, Seq("q0" -> Seq("alpha")), topK = 2)
val bm = spark.sql("SELECT query_id, id FROM graft_bm25_topk ORDER BY id").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
assert(bm == Seq(("q0", 0L), ("q0", 1L)), s"bm25 view: $bm")
// the zero-filled calendar read (getTimeseries) from pure SQL text:
// installTimeseries registers the routed read's plan as a view; the
// hourly grid is dense (finish-exclusive) even where no events landed
val tsvc = new graft.TimeSeriesService(spark)
tsvc.defineFact("clicks", graft.model.FactType.Counter, slice = 15)
tsvc.defineDimension("event_type", facts = Set("clicks"))
tsvc.ingest(Seq((ts("2024-01-05T10:05"), "click"), (ts("2024-01-05T10:20"), "click"), (ts("2024-01-05T13:40"), "view")).toDF("ts", "event_type").select(lit("clicks").as("fact"), col("ts"), lit(1L).as("value"), org.apache.spark.sql.functions.map(lit("event_type"), col("event_type")).as("categories")))
graft.sql.PipelineViews.installTimeseries(spark, tsvc, "clicks", "event_type", Map("event_type" -> Some("click")), ts("2024-01-05T08:00"), ts("2024-01-05T12:00"), graft.model.Step.Hour)
val tsr = spark.sql("SELECT bucket, value FROM graft_timeseries ORDER BY bucket").collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
// grid is start-inclusive, finish-EXCLUSIVE: 08..11, never 12
assert(tsr == Seq((ts("2024-01-05T08:00"), 0L), (ts("2024-01-05T09:00"), 0L), (ts("2024-01-05T10:00"), 2L), (ts("2024-01-05T11:00"), 0L)), s"timeseries view: ${tsr.mkString(",")}")
// user SQL composes over the view: a filter written in SQL text
val tsf = spark.sql("SELECT count(*) AS n FROM graft_timeseries WHERE value > 0").head.getLong(0)
assert(tsf == 1L, s"timeseries view filter: $tsf")
// the FOUR-TYPE dashboard (B85) from pure SQL text: counter, exact-
// distinct, average, and histogram tiles through ONE installed view —
// per-type fills, null-padded union schema, hist cells un-filled
tsvc.defineFact("uniq", graft.model.FactType.Distinct, slice = 15)
tsvc.defineFact("spend", graft.model.FactType.Average, slice = 15)
tsvc.defineFact("hist", graft.model.FactType.Histogram, slice = 15, start = Some(0L), end = Some(50L), step = Some(10L))
tsvc.updateDimension("event_type", "uniq")
tsvc.updateDimension("event_type", "spend")
tsvc.updateDimension("event_type", "hist")
tsvc.ingest(Seq((ts("2024-01-05T10:05"), "click", 7L), (ts("2024-01-05T10:20"), "click", 7L)).toDF("ts", "event_type", "v").select(lit("uniq").as("fact"), col("ts"), col("v").as("value"), org.apache.spark.sql.functions.map(lit("event_type"), col("event_type")).as("categories")))
tsvc.ingest(Seq((ts("2024-01-05T10:05"), "click", 100L), (ts("2024-01-05T10:20"), "click", 200L)).toDF("ts", "event_type", "v").select(lit("spend").as("fact"), col("ts"), col("v").as("value"), org.apache.spark.sql.functions.map(lit("event_type"), col("event_type")).as("categories")))
tsvc.ingest(Seq((ts("2024-01-05T10:05"), "click", 5L), (ts("2024-01-05T10:20"), "click", 25L)).toDF("ts", "event_type", "v").select(lit("hist").as("fact"), col("ts"), col("v").as("value"), org.apache.spark.sql.functions.map(lit("event_type"), col("event_type")).as("categories")))
graft.sql.PipelineViews.installTimeseriesMulti(spark, tsvc, Seq("clicks", "uniq", "spend", "hist"), "event_type", Map("event_type" -> Some("click")), ts("2024-01-05T08:00"), ts("2024-01-05T12:00"), graft.model.Step.Hour, name = "graft_ts_multi4")
val m4cols = spark.table("graft_ts_multi4").columns.toSeq
assert(m4cols == Seq("event_type", "fact", "bucket", "value", "counter", "total", "hist_bucket"), s"multi4 schema: $m4cols")
val m4h = spark.sql("SELECT hist_bucket, value FROM graft_ts_multi4 WHERE fact = 'hist' ORDER BY hist_bucket").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
assert(m4h == Seq((0L, 1L), (20L, 1L)), s"hist tile: $m4h")
val m4u = spark.sql("SELECT value FROM graft_ts_multi4 WHERE fact = 'uniq' AND bucket = TIMESTAMP '2024-01-05 10:00:00'").head.getLong(0)
assert(m4u == 1L, s"uniq tile must count ids not rows: $m4u")
val m4s = spark.sql("SELECT counter, total FROM graft_ts_multi4 WHERE fact = 'spend' AND bucket = TIMESTAMP '2024-01-05 10:00:00'").head
assert((m4s.getLong(0), m4s.getLong(1)) == ((2L, 300L)), s"spend tile: $m4s")
val m4n = spark.sql("SELECT count(*) AS n FROM graft_ts_multi4 WHERE fact IN ('clicks', 'uniq') AND hist_bucket IS NULL").head.getLong(0)
assert(m4n == 8L, s"filled value tiles with null-padded hist_bucket: $m4n")
// the PER-TILE-FILTERED dashboard (B94's tiles overload) as the same
// pure-SQL surface: clicks filtered to 'click' beside the UNFILTERED
// spend average, one view — the split the pairs overload cannot express
graft.sql.PipelineViews.installTimeseriesMultiTiles(spark, tsvc, Seq(("clicks", "event_type", Map("event_type" -> Option("click"))), ("spend", "event_type", Map.empty[String, Option[String]])), ts("2024-01-05T08:00"), ts("2024-01-05T12:00"), graft.model.Step.Hour, 0, name = "graft_ts_tiles")
val tfc = spark.sql("SELECT count(*) FROM graft_ts_tiles WHERE fact = 'clicks' AND event_type <> 'click'").head.getLong(0)
assert(tfc == 0L, s"filtered tile leaked other series: $tfc")
val tfs = spark.sql("SELECT counter, total FROM graft_ts_tiles WHERE fact = 'spend' AND bucket = TIMESTAMP '2024-01-05 10:00:00'").head
assert((tfs.getLong(0), tfs.getLong(1)) == ((2L, 300L)), s"unfiltered spend tile: $tfs")
// the PARAMETERIZED window (B91): one installed SQL table function,
// the window moved in pure SQL text — two different windows, each the
// exact fill for its range, with no Scala re-install between them
graft.sql.PipelineViews.installTimeseriesWindow(spark, tsvc, "clicks", "event_type", Map("event_type" -> Some("click")), graft.model.Step.Hour)
val w1 = spark.sql("SELECT bucket, value FROM graft_timeseries_window(TIMESTAMP '2024-01-05 09:00:00', TIMESTAMP '2024-01-05 11:00:00') ORDER BY bucket").collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
assert(w1 == Seq((ts("2024-01-05T09:00"), 0L), (ts("2024-01-05T10:00"), 2L)), s"window 1: $w1")
val w2 = spark.sql("SELECT bucket, value FROM graft_timeseries_window(TIMESTAMP '2024-01-05 10:00:00', TIMESTAMP '2024-01-05 12:00:00') ORDER BY bucket").collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
assert(w2 == Seq((ts("2024-01-05T10:00"), 2L), (ts("2024-01-05T11:00"), 0L)), s"window 2: $w2")
// a window with NO scanned series yields zero rows (series absent
// from the scan stay absent — the fillRange rule, in SQL text too)
val w3 = spark.sql("SELECT * FROM graft_timeseries_window(TIMESTAMP '2024-01-05 12:00:00', TIMESTAMP '2024-01-05 14:00:00')").count()
assert(w3 == 0L, s"window 3 must be empty: $w3")
// the HISTOGRAM windowed twin: the O21 distribution read with the
// window moved in SQL text (hist events 5 and 25 land in buckets 0/20)
graft.sql.PipelineViews.installHistogramWindow(spark, tsvc, "hist", "event_type", Map("event_type" -> Some("click")))
val hw = spark.sql("SELECT hist_bucket, value FROM graft_histogram_window(TIMESTAMP '2024-01-05 10:00:00', TIMESTAMP '2024-01-05 11:00:00') ORDER BY hist_bucket").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
assert(hw == Seq((0L, 1L), (20L, 1L)), s"hist window: $hw")
assert(spark.sql("SELECT * FROM graft_histogram_window(TIMESTAMP '2024-01-06 00:00:00', TIMESTAMP '2024-01-07 00:00:00')").count() == 0L, "hist window out of range must be empty")
println("DRIVE-EXT-OK " + rows)
sys.exit(0)
