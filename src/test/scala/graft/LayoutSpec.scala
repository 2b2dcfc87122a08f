package graft

import org.apache.spark.sql.functions._

import graft.sources.Layout

/** Z-order layout: the whole point is per-file min/max tightness on
  * EVERY clustered dimension, so scan pruning works for predicates on
  * any of them — pinned here by comparing per-file spans against a
  * plain single-column sort of the same data into the same file
  * count. */
class LayoutSpec extends SparkTestBase {

  test("morton: interleaves bits; orders by locality") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L))
      .toDF("a", "b")
      .select(Layout.morton(Seq(col("a"), col("b")), bits = 2).as("z"))
    // a is bit j=0, b is bit j=1: (a,b) → a0 + 2·b0 + 4·a1 + 8·b1
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 15L))
  }

  test("z-ordered files are tight on BOTH dimensions; sorted are not") {
    val e = graft.sources.EventSource
      .wideEvents(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("ts"))
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    Layout.writeZOrdered(e, Seq("user_id", "ts"), s"$base/z", files = 8)
    // baseline: same data, same file count, plain sort on user_id only
    e.repartitionByRange(8, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.parquet(s"$base/plain")
    def spans(path: String): (Double, Double) = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col("user_id")) - min(col("user_id")))
            .cast("double").as("uspan"),
          (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
            .cast("double").as("tspan"))
        .agg(avg(col("uspan")), avg(col("tspan"))).head()
      (perFile.getDouble(0), perFile.getDouble(1))
    }
    val global = e.agg(
      (max(col("user_id")) - min(col("user_id"))).cast("double"),
      (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
        .cast("double")).head()
    val (gU, gT) = (global.getDouble(0), global.getDouble(1))
    val (zU, zT) = spans(s"$base/z")
    val (pU, pT) = spans(s"$base/plain")
    // the plain sort is tight on its leading column but every file
    // spans ~the full time domain; z-order is meaningfully tight on
    // BOTH (each dimension well under the global span)
    assert(pT > 0.9 * gT, s"baseline sanity: plain tspan $pT vs $gT")
    assert(zU < 0.6 * gU, s"z user span $zU vs global $gU")
    assert(zT < 0.6 * gT, s"z time span $zT vs global $gT")
    assert(zT < 0.7 * pT, s"z time span $zT not better than plain $pT")
    assert(pU <= zU, "plain sort should win its own leading column")
    // losslessness: same multiset of rows
    val orig = e.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getTimestamp(2))).sorted.toSeq
    val z = spark.read.parquet(s"$base/z").collect().map(r =>
      (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts"))).sorted.toSeq
    assert(z == orig)
  }

  test("empty input and all-null z-columns write cleanly (no NPE)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-zedge").toString
    // an empty ingest day must still produce an (empty) store
    val empty = Seq.empty[(Long, Long)].toDF("user_id", "event_id")
    Layout.writeZOrdered(empty, Seq("user_id", "event_id"), s"$base/empty", 4)
    assert(spark.read.parquet(s"$base/empty").count() == 0)
    // an all-null clustered column degrades to zero discrimination,
    // not a crash; content round-trips losslessly
    val nullCol = Seq((1L, 7L), (2L, 8L), (3L, 9L))
      .toDF("event_id", "keep")
      .withColumn("user_id", org.apache.spark.sql.functions
        .lit(null).cast("long"))
    Layout.writeZOrdered(nullCol, Seq("user_id", "event_id"),
      s"$base/nullcol", 2)
    val back = spark.read.parquet(s"$base/nullcol")
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("keep")))
      .sorted.toSeq
    assert(back == Seq((1L, 7L), (2L, 8L), (3L, 9L)))
  }
}
