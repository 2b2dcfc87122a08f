package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Visualization-grade series downsampling — the rendering-side read
  * of the timeseries plane: a dashboard drawing a multi-month series
  * onto a few hundred pixels needs per-pixel-bucket extremes, not
  * every observation, and M4 (first/last/min/max per bucket —
  * Jugel et al., VLDB'14) is the canonical error-free choice: it
  * retains exactly the rows a min/max line rendering touches, so the
  * drawn image is pixel-identical to rendering the full series.
  *
  * Semantics: within each (entity, bucket) group, retain the rows
  * holding the FIRST and LAST positions (by the caller's order key)
  * and the MIN- and MAX-valued rows (EARLIEST order-key on value
  * ties — a deterministic, engine-independent choice); a row holding
  * several roles appears once. Everything is selection, not
  * synthesis — retained rows are input rows, so sums/filters over the
  * downsample remain meaningful and the result is exactly
  * oracle-comparable (no interpolation arithmetic to drift).
  *
  * Scale shape: ONE hash partitioning on (entity, bucket) serves all
  * six window aggregates (two chained selects over the same window
  * spec — Spark plans a single Exchange and reuses the sort); state
  * per open group is O(1) scalars. Output is ≤ 4 rows per (series ×
  * bucket) regardless of input density — the point of the operator.
  */
object Downsample {

  /** Filter `df` to its M4 rows per (entity, bucket).
    *
    * @param entityCol series key
    * @param bucketCol time bucket expression (e.g.
    *                  `date_trunc("day", col("ts"))`) — pre-aliased
    *                  columns work too
    * @param orderCols deterministic within-series order (e.g. sec, id)
    * @param valueCol  the rendered measure
    * @return input rows holding a first/last/min/max role, unchanged
    */
  def m4(df: DataFrame, entityCol: Column, bucketCol: Column,
      orderCols: Seq[Column], valueCol: Column): DataFrame = {
    require(orderCols.nonEmpty, "m4 needs at least one order column")
    val part = Window.partitionBy(entityCol, bucketCol)
    val okey = struct(orderCols: _*)
    val x = valueCol
    val stage1 = df
      .withColumn("graft_m4_minv", min(x).over(part))
      .withColumn("graft_m4_maxv", max(x).over(part))
      .withColumn("graft_m4_first", min(okey).over(part))
      .withColumn("graft_m4_last", max(okey).over(part))
    // earliest order key among the min-valued / max-valued rows —
    // windows over stage-1 columns, same spec, same single exchange
    val stage2 = stage1
      .withColumn("graft_m4_minkey",
        min(when(x === col("graft_m4_minv"), okey)).over(part))
      .withColumn("graft_m4_maxkey",
        min(when(x === col("graft_m4_maxv"), okey)).over(part))
    stage2
      .where(okey === col("graft_m4_first") ||
        okey === col("graft_m4_last") ||
        okey === col("graft_m4_minkey") ||
        okey === col("graft_m4_maxkey"))
      .drop("graft_m4_minv", "graft_m4_maxv", "graft_m4_first",
        "graft_m4_last", "graft_m4_minkey", "graft_m4_maxkey")
  }
}
