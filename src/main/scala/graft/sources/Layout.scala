package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multi-dimensional file-clustering layouts.
  *
  * Date partitioning prunes on time and `bucketBy` co-locates joins;
  * what neither gives is SCAN pruning on a second predicate column.
  * Z-ORDER clustering does: each row's key columns are min/max
  * normalized to `bits`-bit integers whose bits are interleaved into
  * one Morton code, and the table is range-partitioned + sorted by
  * that code. Rows close in code are close in EVERY clustered
  * dimension, so parquet row-group (and per-file) min/max statistics
  * stay tight on ALL of them — a predicate on any clustered column
  * skips most files/row groups, where a plain sort only serves its
  * leading column and leaves every other column's min/max spanning
  * the full domain in every file.
  *
  * Everything is column algebra (shifts/ands/ors — codegen'd, no
  * UDF); the only driver-side data is the 2-per-column min/max used
  * for normalization (one 1-row aggregate). Layout cost is one range
  * exchange + per-partition sort — paid once at write time, like the
  * bucketed layout's shuffle.
  */
object Layout {

  /** Morton (bit-interleaved) code over already-normalized
    * `bits`-bit long columns. k·bits must fit a long (k·bits ≤ 63). */
  private[graft] def morton(normed: Seq[Column], bits: Int): Column = {
    val k = normed.size
    require(k >= 1 && k * bits <= 63, s"morton: $k cols × $bits bits > 63")
    val terms = for {
      i <- 0 until bits
      (c, j) <- normed.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Normalize a numeric/timestamp column into [0, 2^bits) by min/max
    * scaling (constant-domain columns map to 0). */
  private def normalize(c: Column, mn: Double, mx: Double,
      bits: Int): Column = {
    val top = (1L << bits) - 1L
    if (mx <= mn) lit(0L)
    else least(lit(top), greatest(lit(0L),
      floor((c.cast("double") - lit(mn)) * lit(top / (mx - mn)))
        .cast(LongType)))
  }

  /** Write `df` z-order clustered on `zCols` (numeric or timestamp
    * columns; timestamps cluster on their epoch seconds) into
    * `files` range partitions sorted by the Morton code. Content is
    * untouched — the code column is derived, used for the layout,
    * and dropped. */
  def writeZOrdered(df: DataFrame, zCols: Seq[String], path: String,
      files: Int, bits: Int = 16): Unit = {
    val numeric = zCols.map { c =>
      val f = df.schema(c)
      if (f.dataType.typeName.startsWith("timestamp"))
        unix_timestamp(col(c)).cast("double")
      else col(c).cast("double")
    }
    // bounded driver data: 2 doubles per clustered column. min/max
    // are null for an empty input or an all-null column — degrade
    // those to the constant domain (code 0) instead of NPE-ing: an
    // empty ingest day still writes an (empty) store, and an all-null
    // column simply contributes no discrimination to the code.
    val stats = df.select(numeric.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(c).as(s"mn$i"), max(c).as(s"mx$i")) }: _*).head()
    def bound(i: Int): Double =
      if (stats.isNullAt(i)) 0.0 else stats.getDouble(i)
    val normed = numeric.zipWithIndex.map { case (c, i) =>
      normalize(c, bound(2 * i), bound(2 * i + 1), bits) }
    df.withColumn("__z", morton(normed, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** The deployment layout for a RAW event feed at 100 TB: one
    * `event_date=` hive partition directory per calendar day of
    * `tsCol`, so any time-ranged read that also states its date bounds
    * prunes whole directories at the partition index — before a single
    * row group is opened. The in-partition shuffle keys on the date so
    * each day writes a bounded file count (a day's data is one task
    * set, not `spark.sql.shuffle.partitions` shards per day).
    *
    * Reading discipline (same as the ingested store's `__event_date`):
    * derive `event_date` bounds from the `ts` predicate and state BOTH
    * — Spark does not infer partition-column bounds from a predicate
    * on the timestamp the partition was derived from. */
  def writeDatePartitioned(df: DataFrame, tsCol: String,
      path: String): Unit =
    df.withColumn("event_date", to_date(col(tsCol)))
      .repartition(col("event_date"))
      .write.mode("overwrite").partitionBy("event_date").parquet(path)
}
