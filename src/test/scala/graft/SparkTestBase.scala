package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** Pivot a timeseries result DataFrame into the reference's nested-map
    * shape: {dims → {bucket(None ⇔ :all) → value}} — for golden parity
    * with `postgres_test.clj` / `mem_test.clj` expectations. */
  def pivot(df: DataFrame, dims: Seq[String], valueCol: String = "value")
      : Map[Map[String, String], Map[Option[java.sql.Timestamp], Long]] =
    df.collect().toSeq
      .groupBy(r => dims.map(d => d -> r.getAs[String](d)).toMap)
      .map { case (k, rows) =>
        k -> rows.map { r =>
          Option(r.getAs[java.sql.Timestamp]("bucket")) ->
            r.getAs[Long](valueCol)
        }.toMap
      }

  def pivotAvg(df: DataFrame, dims: Seq[String])
      : Map[Map[String, String], Map[Option[java.sql.Timestamp], (Long, Long)]] =
    df.collect().toSeq
      .groupBy(r => dims.map(d => d -> r.getAs[String](d)).toMap)
      .map { case (k, rows) =>
        k -> rows.map { r =>
          Option(r.getAs[java.sql.Timestamp]("bucket")) ->
            (r.getAs[Long]("counter"), r.getAs[Long]("total"))
        }.toMap
      }
}
