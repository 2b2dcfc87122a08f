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

  /** Reference nested-map shape, via the public presentation adapter
    * ([[graft.ResultShape]]) — golden parity with `postgres_test.clj` /
    * `mem_test.clj` expectations. */
  def pivot(df: DataFrame, dims: Seq[String], valueCol: String = "value")
      : Map[Map[String, String], Map[Option[java.sql.Timestamp], Long]] =
    ResultShape.nested(df, dims, valueCol)

  def pivotAvg(df: DataFrame, dims: Seq[String])
      : Map[Map[String, String], Map[Option[java.sql.Timestamp], (Long, Long)]] =
    ResultShape.nestedAvg(df, dims)
}
