// Canonical library-boundary drive: run against the packaged jar with
//   /opt/spark/bin/spark-shell --master 'local[4]' \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.shuffle.partitions=4 \
//     --jars target/scala-2.13/timeseriesstoragespark_2.13-0.1.0.jar \
//     -I tools/drive.scala <<< ""
// NOTE: -I scripts are REPL line-oriented — keep chains on one line.
import graft._
import graft.model._
import graft.functions.TimeKernel.ts

// 1. the reference flagship flow (SURVEY §7.3 golden)
val svc = TimeSeriesService(spark)
svc.defineFact("signups", FactType.Counter, slice = 10, name = Some("registros"))
svc.defineDimension("dependency", facts = Set("signups"))
svc.defineDimension("dependency_user", groupedBy = Seq(Seq("dependency")), facts = Set("signups"))
svc.newFact("signups", ts("2014-03-21T09:09"), 1, Map("dependency" -> "32", "dependency_user" -> "pepe"))
svc.newFact("signups", ts("2014-03-21T10:23"), 1, Map("dependency" -> "31", "dependency_user" -> "juanele"))
val out = svc.getTimeseries("signups", "dependency_user", Map("dependency" -> Some("31")), ts("2014-03-21T09:00"), ts("2014-03-21T13:00"), step = Step.Hour)
val rows = out.orderBy("bucket").collect()
assert(rows.length == 4, s"expected 4 buckets got ${rows.length}")
assert(rows.map(_.getLong(rows.head.length - 1)).toSeq == Seq(0L, 1L, 0L, 0L), "fill values mismatch")
println("DRIVE-OK-counter " + rows.mkString(" | "))

// 2. the DISTINCT fact type end to end (round-7 surface)
svc.defineFact("uniq", FactType.Distinct, slice = 15)
svc.defineDimension("dim", facts = Set("uniq"))
svc.newFact("uniq", ts("2024-02-01T10:05"), 5, Map("dim" -> "a"))
svc.newFact("uniq", ts("2024-02-01T10:20"), 5, Map("dim" -> "a"))
svc.newFact("uniq", ts("2024-02-01T10:40"), 6, Map("dim" -> "a"))
val du = svc.getTimeseries("uniq", "dim", Map("dim" -> Some("a")), ts("2024-02-01T10:00"), ts("2024-02-01T12:00"), step = Step.Hour).orderBy("bucket").collect()
assert(du.map(_.getLong(2)).toSeq == Seq(2L, 0L), s"distinct fill mismatch: ${du.mkString("|")}")
println("DRIVE-OK-distinct " + du.mkString(" | "))

// 3. histogram + percentile serving (the reference's stub, completed)
svc.defineFact("lat", FactType.Histogram, slice = 15, start = Some(0L), end = Some(300L), step = Some(100L))
svc.defineDimension("host", facts = Set("lat"))
svc.newFact("lat", ts("2024-02-01T10:05"), 50, Map("host" -> "h1"))
svc.newFact("lat", ts("2024-02-01T10:06"), 80, Map("host" -> "h1"))
svc.newFact("lat", ts("2024-02-01T10:07"), 250, Map("host" -> "h1"))
val pct = svc.getHistogramPercentiles("lat", "host", Map.empty, ts("2024-02-01T10:00"), ts("2024-02-01T11:00"), pcts = Seq(50L, 95L)).collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
assert(pct == Map(50L -> 0L, 95L -> 200L), s"percentiles mismatch: $pct")
println("DRIVE-OK-histogram " + pct)

// 4. materialize + incremental windowed refresh through the facade
val base = java.nio.file.Files.createTempDirectory("drive-roll").toString
svc.materializeRollups(base)
svc.newFact("uniq", ts("2024-02-02T09:00"), 7, Map("dim" -> "a"))
svc.refreshRollups(base, ts("2024-02-02T00:00"), ts("2024-02-02T23:59"))
val du2 = svc.getTimeseries("uniq", "dim", Map("dim" -> Some("a")), ts("2024-02-01T00:00"), ts("2024-02-03T00:00"), step = Step.Day).orderBy("bucket").collect()
assert(du2.map(_.getLong(2)).toSeq == Seq(2L, 1L), s"refresh mismatch: ${du2.mkString("|")}")
println("DRIVE-OK-refresh " + du2.mkString(" | "))

// 4b. restart recovery: a fresh instance re-attaches the store
val svcR = new TimeSeriesService(spark, svc.catalog)
assert(svcR.attachRollups(base).nonEmpty, "attach found no stores")
val du3 = svcR.getTimeseries("uniq", "dim", Map("dim" -> Some("a")), ts("2024-02-01T00:00"), ts("2024-02-03T00:00"), step = Step.Day).orderBy("bucket").collect()
assert(du3.map(_.getLong(2)).toSeq == Seq(2L, 1L), s"attached read mismatch: ${du3.mkString("|")}")
println("DRIVE-OK-attach " + du3.mkString(" | "))

// 5. round-8 surface: routed histogram, k-means fit, BPE-scale vocab
import graft.operators.{Rollups, Similarity, TextAnalysis, Timeseries}
import graft.plans.RollupRouting
import org.apache.spark.sql.functions.{col, count, lit}
import spark.implicits._
// routing registrations need a persistent (re-scannable) source — a
// LocalRelation gets constant-folded before the rule can match it
val evDir = java.nio.file.Files.createTempDirectory("drive-ev").toString
Seq((1L, ts("2024-01-05T10:05"), "click", 30.0), (2L, ts("2024-01-05T10:06"), "click", 150.0), (3L, ts("2024-01-05T11:06"), "view", 30.0)).toDF("event_id", "ts", "event_type", "value").write.mode("overwrite").parquet(evDir)
val ev = spark.read.parquet(evDir)
val hf = FactDef("h", FactType.Histogram, sliceMinutes = 15, start = Some(0L), end = Some(200L), step = Some(20L))
val hd = java.nio.file.Files.createTempDirectory("drive-hist").toString
Rollups.materializeHistogramPartials(ev, Seq("event_type"), Timeseries.histBucket(hf), hd)
RollupRouting.install(spark)
RollupRouting.registerHistogram(spark, ev, Rollups.read(spark, hd), Seq("event_type"), Timeseries.histBucket(hf))
val hq = ev.groupBy(col("event_type"), Timeseries.histBucket(hf)).agg(count(lit(1)).as("value"))
assert(hq.queryExecution.executedPlan.toString.contains(hd), "hist query not routed onto the partials")
val hrows = hq.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
assert(hrows == Set(("click", 20L, 1L), ("click", 140L, 1L), ("view", 20L, 1L)), s"routed hist mismatch: $hrows")
RollupRouting.clear(spark)
println("DRIVE-OK-routed-hist " + hrows)

val vecs = Seq((0L, Array(1.0f, 0f)), (1L, Array(0.9f, 0.1f)), (10L, Array(0f, 1.0f)), (11L, Array(0.1f, 0.9f))).toDF("vec_id", "embedding")
val fit = Similarity.kmeansFit(vecs, "vec_id", "embedding", k = 2, maxIter = 10, tol = 1e-9)
val cm = fit.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
assert(cm.size == 2 && math.abs(cm(0L)(0) - 0.95) < 1e-6 && math.abs(cm(1L)(1) - 0.95) < 1e-6, s"kmeansFit mismatch: $cm")
println("DRIVE-OK-kmeans " + cm)

val docsDf = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
val vt = TextAnalysis.buildVocabTable(docsDf, "text", k = 2)
val tk = TextAnalysis.tokenizeWithVocabTable(docsDf, "text", "doc_id", vt).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
assert(tk == Set((1L, 3L, 0L), (2L, 2L, 1L)), s"vocab tokenize mismatch: $tk")
println("DRIVE-OK-vocab-table " + tk)

// 6. sketch distinct partials + int8 quantized search
val skRaw = Seq(("click", ts("2024-03-01T10:05"), 7L), ("click", ts("2024-03-01T10:20"), 7L), ("click", ts("2024-03-02T09:10"), 8L)).toDF("event_type", "ts", "value")
val sk = Rollups.collapseSketchPartials(Rollups.sketchPartials(skRaw, Seq("event_type")), Seq("event_type"), Step.Day).collect().map(r => r.getTimestamp(1) -> r.getLong(2)).toMap
assert(sk == Map(ts("2024-03-01T00:00") -> 1L, ts("2024-03-02T00:00") -> 1L), s"sketch mismatch: $sk")
println("DRIVE-OK-sketch " + sk)
val qt = Similarity.bruteForceTopKQuantized(vecs, vecs.where(col("vec_id") === 0), "vec_id", "embedding", 1).collect()
assert(qt.length == 1 && qt.head.getLong(1) == 1L, s"quantized top-1: ${qt.toSeq}")
println("DRIVE-OK-int8 " + qt.head)

// 7. z-order layout roundtrip + dataset profile
val zin = Seq((1L, 10L, ts("2024-03-01T10:05")), (2L, 20L, ts("2024-03-02T10:05")), (3L, 30L, ts("2024-03-03T10:05"))).toDF("event_id", "user_id", "ts")
val zdir = java.nio.file.Files.createTempDirectory("drive-z").toString + "/e"
graft.sources.Layout.writeZOrdered(zin, Seq("user_id", "ts"), zdir, files = 2)
val zback = spark.read.parquet(zdir).collect().map(_.getAs[Long]("event_id")).sorted.toSeq
assert(zback == Seq(1L, 2L, 3L), s"zorder roundtrip: $zback")
val prof = graft.operators.Profiling.columnProfile(skRaw, Seq("event_type", "value")).collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
assert(prof == Map("event_type" -> ((3L, 0L, 1L)), "value" -> ((3L, 0L, 2L))), s"profile mismatch: $prof")
println("DRIVE-OK-layout-profile " + zback + " " + prof)
val tt = TextAnalysis.topTermsApprox(docsDf, "text", 1).collect().head
assert(tt.getString(0) == "a" && tt.getLong(1) == 2L, s"topTermsApprox: $tt")
println("DRIVE-OK-heavyhitters " + tt)
// 8. round-8 surface: rate + interpolation reads, funnel, PQ rerank,
//    temperature mixing, SQL-surface functions
val gaugeDf = Seq(("d", ts("2024-02-01T00:00"), 10L), ("d", ts("2024-02-01T01:00"), 17L), ("d", ts("2024-02-01T02:00"), 3L)).toDF("dim", "bucket", "gauge")
val rateRows = Timeseries.counterRate(gaugeDf, Seq("dim"), 3600L, "gauge").orderBy("bucket").collect()
assert(rateRows.map(r => Option(r.get(3))).toSeq == Seq(None, Some(7L), Some(3L)), s"rate: ${rateRows.mkString(",")}")
val interp = Timeseries.interpolateFill(Seq(("d", ts("2024-02-01T01:00"), 100L), ("d", ts("2024-02-01T04:00"), 40L)).toDF("dim", "bucket", "value"), Seq("dim"), ts("2024-02-01T00:00"), ts("2024-02-01T06:00"), Step.Hour).orderBy("bucket").collect().map(_.getLong(2)).toSeq
assert(interp == Seq(0L, 10000L, 8000L, 6000L, 4000L, 0L), s"interp: $interp")
println("DRIVE-OK-rate-interp " + rateRows.mkString(",") + " / " + interp)
val funEv = Seq((1L, "signup", ts("2024-01-01T10:00")), (1L, "click", ts("2024-01-01T11:00")), (1L, "purchase", ts("2024-01-01T12:00")), (2L, "click", ts("2024-01-01T09:00")), (2L, "signup", ts("2024-01-01T10:00"))).toDF("user_id", "event_type", "ts")
val fun = graft.operators.Funnel.funnel(funEv, "user_id", "ts", Seq("signup" -> (col("event_type") === "signup"), "click" -> (col("event_type") === "click"), "purchase" -> (col("event_type") === "purchase"))).collect().map(r => r.getString(1) -> r.getLong(2)).toMap
assert(fun == Map("signup" -> 2L, "click" -> 1L, "purchase" -> 1L), s"funnel: $fun")
println("DRIVE-OK-funnel " + fun)
val cbD = Similarity.pqTrain(vecs, "vec_id", "embedding", m = 2, ks = 2)
val pqr = Similarity.pqRerankTopK(vecs, vecs.where(col("vec_id") === 0), "vec_id", "embedding", cbD, k = 1, candidates = vecs.count().toInt).collect()
assert(pqr.length == 1 && pqr.head.getLong(1) == 1L, s"pq rerank: ${pqr.toSeq}")
println("DRIVE-OK-pq " + pqr.head)
val mixDocs = ((0 until 16).map(i => (i.toLong, "big")) ++ (0 until 4).map(i => (100L + i, "small"))).toDF("doc_id", "source")
val (mixed, mrates) = graft.operators.Sampling.mixByTemperatureSqrt(mixDocs, "doc_id", "source")
assert(mrates == Map("small" -> 10000, "big" -> 5000), s"temp rates: $mrates")
println("DRIVE-OK-tempmix " + mrates)
graft.functions.GraftFunctions.register(spark)
val sqlFn = spark.sql("SELECT graft_slice(TIMESTAMP '2014-03-21 16:46:30', 15), graft_week(TIMESTAMP '2023-12-31 10:00:00')").head
assert(sqlFn.getTimestamp(0) == ts("2014-03-21T16:45") && sqlFn.getTimestamp(1) == ts("2023-12-24T00:00"), s"sql surface: $sqlFn")
println("DRIVE-OK-sqlsurface " + sqlFn)
// 9. round-8 retrieval plane: BM25 (scan + appendable positional index),
//    phrase fold, hybrid rerank, EWMA, token drift
val irDocs = Seq((1L, "spark hash join beats sort merge join"), (2L, "the window sort spills"), (3L, "hash tables everywhere hash hash")).toDF("doc_id", "text")
val bm = TextAnalysis.bm25TopK(irDocs, "text", "doc_id", Seq("q" -> Seq("hash", "join")), topK = 3).orderBy("rk").collect()
assert(bm.length == 2 && bm.head.getLong(2) == 1L, s"bm25: ${bm.toSeq}")
val idxDir = java.nio.file.Files.createTempDirectory("drive-bm25").toString
TextAnalysis.buildTextIndex(irDocs.where(col("doc_id") < 3), "text", "doc_id", idxDir, nBuckets = 4)
TextAnalysis.appendToTextIndex(irDocs.where(col("doc_id") === 3), "text", "doc_id", idxDir)
val bmIdx = TextAnalysis.bm25TopKFromIndex(spark, idxDir, Seq("q" -> Seq("hash", "join")), topK = 3).orderBy("rk").collect()
assert(bmIdx.map(r => (r.getLong(2), r.getLong(4))).toSeq == bm.map(r => (r.getLong(2), r.getLong(4))).toSeq, s"indexed != scan: ${bmIdx.toSeq} vs ${bm.toSeq}")
val phr = TextAnalysis.phraseHitsFromIndex(spark, idxDir, Seq("hash join")).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
assert(phr == Map(1L -> 1L), s"phrase: $phr")
println("DRIVE-OK-bm25 " + bm.map(_.getLong(2)).mkString(",") + " phrase=" + phr)
val hybC = Seq(("q", 1L, 50L), ("q", 2L, 40L)).toDF("query_id", "doc_id", "score_e6")
val hybV = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f))).toDF("doc_id", "embedding")
val hybQ = Seq(("q", Array(0.0f, 1.0f))).toDF("query_id", "embedding")
val hyb = Similarity.hybridRerank(hybC, hybV, hybQ, "query_id", "doc_id", "embedding", k = 1).collect()
assert(hyb.length == 1 && hyb.head.getAs[Long]("doc_id") == 2L, s"hybrid: ${hyb.toSeq}")
println("DRIVE-OK-hybrid " + hyb.head)
val ewDf = Seq((1L, 1L, 1L, 100L), (2L, 1L, 2L, 200L)).toDF("event_id", "user_id", "sec", "cents")
val ew = graft.operators.Anomaly.ewma(ewDf, col("user_id"), Seq(col("sec"), col("event_id")), col("cents"), w = 4).orderBy("sec").collect().map(_.getAs[Long]("ewma_e4")).toSeq
assert(ew == Seq(1000000L, math.floor(10000.0 * 400 / 3).toLong), s"ewma: $ew")
val dr = graft.operators.Profiling.tokenDrift(irDocs, irDocs, "text", k = 10).collect()
assert(dr.nonEmpty && dr.forall(_.getLong(3) == 0L), "self-drift must be zero")
println("DRIVE-OK-ewma-drift " + ew + " drift0=" + dr.length)
// 10. round-8 session-2: proximity fold, weighted sampling, streamed stores
val prox = TextAnalysis.proximityHitsFromIndex(spark, idxDir, "hash", "tables", slop = 2).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
assert(prox == Map(3L -> 1L), s"proximity: $prox")
val wtk = graft.operators.Sampling.weightedTopK(Seq((1L, 10L), (2L, 1000L), (3L, 500L)).toDF("doc_id", "w"), "doc_id", "w", k = 2).collect().map(_.getLong(0)).toSet
assert(wtk.size == 2 && wtk.subsetOf(Set(1L, 2L, 3L)), s"weighted: $wtk")
println("DRIVE-OK-proximity-weighted " + prox + " " + wtk)
println("DRIVE-OK-ALL")
sys.exit(0)
