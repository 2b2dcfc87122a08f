package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the canonical time-series operator the
  * reference lacks: for every left row, the LATEST right row with
  * `right.ts <= left.ts` on the same keys.
  *
  * Implemented join-free by composition (the preferred custom-operator
  * path: existing ops express the semantics): both sides are tagged and
  * unioned, then a single `last(_, ignoreNulls) over (partition keys
  * order ts rows unbounded preceding)` window carries the most recent
  * right payload forward onto each left row.
  *
  * Scale design: ONE shuffle on the join keys (the window partition),
  * no range-join pair explosion (a naive `l.ts >= r.ts` theta join is
  * quadratic per key), no broadcast requirement on either side. Skewed
  * keys behave like any window partition (AQE-visible). Right rows at
  * exactly `left.ts` match (inclusive), mirroring DuckDB/`pandas
  * merge_asof(direction="backward")` semantics.
  */
object AsOfJoin {

  /** @param left       probe side; all its columns are preserved
    * @param right      reference side
    * @param keys       equality keys present on both sides
    * @param tsCol      timestamp column name present on both sides
    * @param rightCols  right columns to carry (aliased as-is on output)
    * @param tolerance  optional max age of the match; older matches
    *                   null out (like merge_asof's tolerance)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightCols: Seq[String],
      tolerance: Option[Column] = None): DataFrame =
    joined(left, right, keys, tsCol, rightCols, tolerance, backwards = true)

  /** Forward as-of: for every left row, the EARLIEST right row with
    * `right.ts >= left.ts` on the same keys (merge_asof
    * direction="forward"). Same single-shuffle window composition as
    * [[backward]], with the scan order reversed. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightCols: Seq[String],
      tolerance: Option[Column] = None): DataFrame =
    joined(left, right, keys, tsCol, rightCols, tolerance, backwards = false)

  private def joined(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightCols: Seq[String],
      tolerance: Option[Column], backwards: Boolean): DataFrame = {
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val rightStruct = struct((rightCols :+ tsCol).map(col).toIndexedSeq: _*)
    val rSchema = right.select((rightCols :+ tsCol).map(col): _*).schema
    val l = left.select(keys.map(col) :+ col(tsCol).as("__ts") :+
      lit(0).as("__side") :+ leftStruct.as("__l") :+
      lit(null).cast(rSchema).as("__r"): _*)
    val r = right.select(keys.map(col) :+ col(tsCol).as("__ts") :+
      lit(1).as("__side") :+ lit(null).cast(left.schema).as("__l") :+
      rightStruct.as("__r"): _*)
    // scan toward each left row along time (backward: ascending;
    // forward: descending); at equal ts the right row sorts FIRST
    // (side desc) so an exactly-simultaneous right row is visible —
    // both directions are ts-inclusive, like merge_asof
    val ord = if (backwards) col("__ts").asc else col("__ts").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 0)
    val withinTol = tolerance match {
      case Some(tol) if backwards =>
        when(col("__match").isNotNull &&
          col("__ts") <= col(s"__match.$tsCol") + tol, col("__match"))
      case Some(tol) =>
        when(col("__match").isNotNull &&
          col(s"__match.$tsCol") <= col("__ts") + tol, col("__match"))
      case None => col("__match")
    }
    val out = carried.withColumn("__match", withinTol)
    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val matchCols = rightCols.map(c => col(s"__match.$c").as(c)) :+
      col(s"__match.$tsCol").as(s"matched_$tsCol")
    out.select(leftCols ++ matchCols: _*)
  }
}
