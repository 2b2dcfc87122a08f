package graft

import org.apache.spark.sql.functions._

import graft.operators.Downsample

/** Pins [[Downsample.m4]] against a brute-force per-bucket replica and
  * pins the plan to one (entity, bucket) exchange. */
class DownsampleSpec extends SparkTestBase {

  /** (id, entity, bucket, sec, x) rows → retained ids per replica. */
  private def replica(rows: Seq[(Long, Long, Long, Long, Long)]): Set[Long] =
    rows.groupBy(r => (r._2, r._3)).values.flatMap { g =>
      val byOrder = g.sortBy(r => (r._4, r._1))
      val byMin = g.minBy(r => (r._5, r._4, r._1))
      val byMax = g.minBy(r => (-r._5, r._4, r._1))
      Set(byOrder.head._1, byOrder.last._1, byMin._1, byMax._1)
    }.toSet

  private def run(rows: Seq[(Long, Long, Long, Long, Long)]): Set[Long] = {
    import spark.implicits._
    val df = rows.toDF("event_id", "user_id", "bucket", "sec", "cents")
    Downsample.m4(df, col("user_id"), col("bucket"),
        Seq(col("sec"), col("event_id")), col("cents"))
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
  }

  test("m4 retains exactly the first/last/min/max rows (seeded runs)") {
    val rnd = new scala.util.Random(0x4D45EEDL)
    for (round <- 1 to 8) {
      val rows = (0 until 200).map { i =>
        (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(4).toLong,
          rnd.nextInt(50).toLong, rnd.nextInt(40).toLong - 20L)
      }
      assert(run(rows) === replica(rows), s"round $round")
    }
  }

  test("m4: value ties resolve to the EARLIEST row, deterministically") {
    // all-equal values: min and max roles both land on the first row,
    // so exactly {first, last} are retained
    val flat = (0 until 10).map(i => (i.toLong, 1L, 1L, i.toLong, 7L))
    assert(run(flat) === Set(0L, 9L))
    // a single row holds every role — output it once
    assert(run(Seq((5L, 1L, 1L, 1L, 1L))) === Set(5L))
  }

  test("m4 output is bounded by 4 rows per (series, bucket)") {
    val rnd = new scala.util.Random(7L)
    val rows = (0 until 500).map { i =>
      (i.toLong, rnd.nextInt(2).toLong, rnd.nextInt(3).toLong,
        rnd.nextInt(100).toLong, rnd.nextInt(1000).toLong)
    }
    import spark.implicits._
    val df = rows.toDF("event_id", "user_id", "bucket", "sec", "cents")
    val perGroup = Downsample.m4(df, col("user_id"), col("bucket"),
        Seq(col("sec"), col("event_id")), col("cents"))
      .groupBy(col("user_id"), col("bucket")).count()
      .agg(max(col("count"))).head.getLong(0)
    assert(perGroup <= 4L)
  }

  test("m4 plans ONE exchange: all six window aggregates share the spec") {
    import spark.implicits._
    val df = (0 until 50).map(i => (i.toLong, i % 3L, i % 2L, i.toLong, i * 7L))
      .toDF("event_id", "user_id", "bucket", "sec", "cents")
    val out = Downsample.m4(df, col("user_id"), col("bucket"),
      Seq(col("sec"), col("event_id")), col("cents"))
    out.collect()
    val p = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p.take(3000))
  }
}
