package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Dataset profiling — the "dataset card" numbers every curation
  * pipeline wants before and after each stage: per column, row/null
  * counts, exact distinct cardinality, and min/max rendered as
  * strings.
  *
  * Scale shape: ONE single-column aggregation per profiled column,
  * unioned — deliberately not one wide aggregate, because k exact
  * `count(distinct)`s in one Aggregate plan via Expand multiply the
  * scanned rows by k BEFORE the shuffle, while k separate
  * aggregations each read ONLY their own column from parquet
  * (column pruning does the work) and run the standard two-phase
  * distinct. All map-side combinable; no collect; output is k rows.
  * For a quick inexact profile swap `count_distinct` for
  * `approx_count_distinct` at the call site — the shape is the same.
  */
object Profiling {

  /** @return one row per profiled column:
    *   (column, n_rows, n_nulls, n_distinct, min_val, max_val) */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    cols.map { c =>
      df.select(col(c))
        .agg(count(lit(1L)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
          count_distinct(col(c)).as("n_distinct"),
          min(col(c)).cast(StringType).as("min_val"),
          max(col(c)).cast(StringType).as("max_val"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_.unionByName(_))
  }
}
