package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-band (range) join — with as-of, the second canonical
  * time-series join Spark lacks a scalable native plan for: pairs of
  * rows on equal keys whose timestamps fall within a window of each
  * other. Spark executes the naive formulation
  * (`l.key = r.key AND r.ts BETWEEN l.ts AND l.ts + w`) as an equi-join
  * on the key with a residual filter — per-key CARTESIAN fan-out, which
  * detonates on hot keys at scale.
  *
  * Scalable form (the standard bucketed band join): floor both sides to
  * `window`-sized epoch buckets; a right row matching `[l.ts, l.ts+w)`
  * can only live in the left row's bucket or the next one, so the LEFT
  * side is duplicated into those two probe buckets and the join becomes
  * a pure equality join on (keys…, bucket) with the exact range check
  * as a cheap post-filter. Fan-out is exactly 2× the left rows —
  * independent of key skew — and the equality join shuffles/broadcasts
  * like any other (AQE skew handling applies).
  */
object RangeJoin {

  /** Pairs (l, r) with equal `keys` and `r.tsCol` ∈ [`l.tsCol`,
    * `l.tsCol` + windowSeconds).
    *
    * @param leftCols  left columns to carry into the output
    * @param rightCols right columns to carry (renamed as given)
    * @return leftCols ++ rightCols, one row per qualifying pair
    */
  def band(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, windowSeconds: Long,
      leftCols: Seq[String], rightCols: Seq[(String, String)]): DataFrame = {
    require(windowSeconds > 0, "window must be positive")
    def bucket(c: Column): Column =
      floor(unix_timestamp(c) / windowSeconds).cast("long")
    val l = left.select(
      (keys.map(col) :+ col(tsCol).as("__lts") :+
        explode(array(bucket(col(tsCol)), bucket(col(tsCol)) + 1)).as("__b")) ++
        leftCols.map(col): _*)
    val r = right.select(
      (keys.map(col) :+ col(tsCol).as("__rts") :+
        bucket(col(tsCol)).as("__b")) ++
        rightCols.map { case (c, a) => col(c).as(a) }: _*)
    // a right row occupies exactly ONE bucket and the left row probes
    // two DISTINCT buckets, so each qualifying (l, r) pair joins exactly
    // once — no dedup needed (and none wanted: projection-identical
    // distinct pairs are still distinct matches)
    l.join(r, keys :+ "__b")
      .where(col("__rts") >= col("__lts") &&
        col("__rts") < col("__lts") + expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(leftCols.map(col) ++ rightCols.map(p => col(p._2)): _*)
  }
}
