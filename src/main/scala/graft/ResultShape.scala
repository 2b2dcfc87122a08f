package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

/** Presentation-edge adapter to the reference's RESULT SHAPE: a nested
  * map `{ {dim→value,…} → { bucket-date → aggregate } }` with the
  * `bucket = NULL` row encoding the `:all` sentinel (`collapse`/
  * `fill-range`, query.clj:48-57,99-111; shapes asserted at
  * postgres_test.clj:113-114,123-125,138-143). A user of the reference
  * switching to this engine gets the same in-memory structure from
  * [[TimeSeriesService.getTimeseries]] output.
  *
  * This COLLECTS to the driver by design — a timeseries query result is
  * bounded by |series| × |calendar grid| (the reference returns exactly
  * this map in memory too); it is a parity/presentation helper, not a
  * data-plane operator. Keep results as DataFrames for anything large.
  */
/** One typed point of a counter/distinct/histogram series: dims as a
  * map (schema-independent across grouping paths), `:all` as None. */
case class TsPoint(series: Map[String, String],
    bucket: Option[Timestamp], value: Long)

/** One typed point of an average series — the re-aggregable
  * (counter, total) pair; the mean is `total.toDouble / counter` at
  * the edge, never stored. */
case class TsAvgPoint(series: Map[String, String],
    bucket: Option[Timestamp], counter: Long, total: Long)

object ResultShape {

  /** Typed, still-DISTRIBUTED result surface: the query result as
    * `Dataset[TsPoint]` with the series dims gathered into a map
    * column — the `Dataset[T]`/`Encoder` consumption path
    * (compile-time field access, typed lambdas) for pipelines that
    * post-process series at scale. Unlike [[nested]], nothing
    * collects; the map construction is a row-local projection. */
  def typed(df: DataFrame, dims: Seq[String], valueCol: String = "value")
      : org.apache.spark.sql.Dataset[TsPoint] = {
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    import spark.implicits._
    val entries = dims.flatMap(d => Seq(lit(d), col(d).cast("string")))
    df.select(
      (if (dims.isEmpty) map() else map(entries: _*)).as("series"),
      col("bucket").as("bucket"),
      col(valueCol).cast("long").as("value"))
      .as[TsPoint]
  }

  /** [[typed]] for average facts: keeps the (counter, total) pair. */
  def typedAvg(df: DataFrame, dims: Seq[String])
      : org.apache.spark.sql.Dataset[TsAvgPoint] = {
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    import spark.implicits._
    val entries = dims.flatMap(d => Seq(lit(d), col(d).cast("string")))
    df.select(
      (if (dims.isEmpty) map() else map(entries: _*)).as("series"),
      col("bucket").as("bucket"), col("counter"), col("total"))
      .as[TsAvgPoint]
  }

  /** Counter/histogram results: `{dims → {bucket(None ⇔ :all) → value}}`. */
  def nested(df: DataFrame, dims: Seq[String], valueCol: String = "value")
      : Map[Map[String, String], Map[Option[Timestamp], Long]] =
    df.collect().toSeq
      .groupBy(r => dims.map(d => d -> r.getAs[String](d)).toMap)
      .map { case (k, rows) =>
        k -> rows.map { r =>
          Option(r.getAs[Timestamp]("bucket")) -> r.getAs[Long](valueCol)
        }.toMap
      }

  /** Average results keep re-aggregable `(counter, total)` pairs — the
    * reference's `{:counter Σ, :total Σ}` merge (query.clj:66-72); the
    * mean itself is `total.toDouble / counter` at the edge. */
  def nestedAvg(df: DataFrame, dims: Seq[String])
      : Map[Map[String, String], Map[Option[Timestamp], (Long, Long)]] =
    df.collect().toSeq
      .groupBy(r => dims.map(d => d -> r.getAs[String](d)).toMap)
      .map { case (k, rows) =>
        k -> rows.map { r =>
          Option(r.getAs[Timestamp]("bucket")) ->
            ((r.getAs[Long]("counter"), r.getAs[Long]("total")))
        }.toMap
      }
}
