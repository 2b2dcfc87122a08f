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
object ResultShape {

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
