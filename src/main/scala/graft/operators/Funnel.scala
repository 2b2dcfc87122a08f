package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Product-analytics reads over the event stream (beyond-reference;
  * the classic funnel / cohort-retention pair every event warehouse
  * serves, expressible on the reference's data model but not its
  * query surface).
  *
  * Scale shape: every stage/cohort frame is keyed by the entity
  * column, so the whole analysis reuses ONE user_id hash
  * partitioning; stage frames shrink monotonically (stage i+1 joins a
  * subset of stage i), and only per-stage counts or per-(cohort ×
  * offset) counts reach the result — never per-user rows.
  */
object Funnel {

  /** Ordered funnel: for each named stage, the count of users who
    * reached it — stage 0 is the earliest matching event per user,
    * stage i > 0 requires a matching event STRICTLY AFTER the user's
    * qualifying time for stage i−1, and the qualifying time is the
    * earliest such event (the standard unordered-window funnel rule:
    * any later re-occurrence cannot un-qualify a user). Output:
    * (stage_idx, stage, n_users) — one row per stage, monotonically
    * non-increasing counts.
    *
    * Stage predicates are arbitrary `Column`s over the event row, so
    * funnels can mix event types with property conditions. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    stageCounts(qualFrames(events, userCol, tsCol, stages))
  }

  /** [[funnel]] with a CONVERSION WINDOW: stage i > 0 qualifies only
    * on an event within `(q_{i−1}, q_{i−1} + windowSec]` — "purchased
    * within 3 days of the click", the form every attribution report
    * actually runs (an unbounded funnel credits conversions that had
    * nothing to do with the journey). The qualifying time is the
    * earliest IN-WINDOW event; if the user's earliest event after
    * q_{i−1} already exceeds the window, every later one does too, so
    * the in-window rule keeps the funnel's earliest-qualifier
    * monotonicity intact. Same one-partitioning scale shape as
    * [[funnel]]. */
  def windowedFunnel(events: DataFrame, userCol: String, tsCol: String,
      stages: Seq[(String, Column)], windowSec: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(windowSec > 0, "windowSec must be positive")
    stageCounts(qualFrames(events, userCol, tsCol, stages, Some(windowSec)))
  }

  private def stageCounts(frames: List[(String, DataFrame)]): DataFrame =
    frames.zipWithIndex
      .map { case ((name, df), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i.toLong).as("stage_idx"), lit(name).as("stage"),
            col("n_users"))
      }.reduce(_.unionByName(_))

  /** Per-stage qualifying frames `(user, __q = qualifying time)` —
    * the funnel fold: qualified_i = min ts of a stage-i event strictly
    * after the user's stage-(i−1) qualifying time (and within the
    * conversion window when one is set). Shared by [[funnel]],
    * [[windowedFunnel]], and [[stageLatencies]]. */
  private def qualFrames(events: DataFrame, userCol: String,
      tsCol: String, stages: Seq[(String, Column)],
      windowSec: Option[Long] = None): List[(String, DataFrame)] =
    stages.foldLeft(List.empty[(String, DataFrame)]) {
      case (acc, (name, pred)) =>
        val matching = events.where(pred)
          .select(col(userCol), col(tsCol).as("__t"))
        val qualified = acc match {
          case Nil =>
            matching.groupBy(col(userCol)).agg(min(col("__t")).as("__q"))
          case (_, prev) :: _ =>
            // interval arithmetic, not unix_micros: works unchanged on
            // TIMESTAMP and TIMESTAMP_NTZ event times (µs-exact both)
            val inWindow = windowSec
              .map(w => col("__t") <=
                col("__prev") + lit(java.time.Duration.ofSeconds(w)))
              .getOrElse(lit(true))
            matching
              .join(prev.select(col(userCol), col("__q").as("__prev")),
                Seq(userCol))
              .where(col("__t") > col("__prev") && inWindow)
              .groupBy(col(userCol)).agg(min(col("__t")).as("__q"))
        }
        (name, qualified) :: acc
    }.reverse

  /** Step latencies: for each consecutive stage pair, the distribution
    * of seconds between the user's qualifying times — the
    * "where does the funnel stall" read. Percentiles are EXACT
    * discontinuous quantiles via the shared rank trick (value at row
    * `⌊(n−1)·p/100⌋+1` per step, deterministic `(latency, user)`
    * tie-break) — no interpolated doubles, so the result hash-matches
    * any engine. One window partitioning on the step name; input is
    * per-user qualifying rows (already ≤ one per user per stage),
    * never raw events. Output: (stage_idx, step, n_users, p50_secs,
    * p90_secs). */
  def stageLatencies(events: DataFrame, userCol: String, tsCol: String,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.size >= 2, "stageLatencies needs at least two stages")
    import org.apache.spark.sql.expressions.Window
    val frames = qualFrames(events, userCol, tsCol, stages)
    val pairs = frames.sliding(2).zipWithIndex.map {
      case (List((na, fa), (nb, fb)), i) =>
        fa.select(col(userCol), col("__q").as("__qa"))
          .join(fb.select(col(userCol), col("__q").as("__qb")),
            Seq(userCol))
          .select(lit((i + 1).toLong).as("stage_idx"),
            lit(s"$na->$nb").as("step"), col(userCol),
            (col("__qb").cast(LongType) - col("__qa").cast(LongType))
              .as("lat_secs"))
      case other => throw new IllegalStateException(
        s"sliding(2) emitted ${other._1.size} frames")
    }.reduce(_.unionByName(_))
    val byStep = Window.partitionBy(col("step"))
      .orderBy(col("lat_secs"), col(userCol))
    val ranked = pairs
      .withColumn("rn", row_number().over(byStep))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("step"))))
    def pick(p: Int) =
      max(when(col("rn") === floor((col("n") - 1) * p / lit(100)) + 1,
        col("lat_secs")))
    ranked.groupBy(col("stage_idx"), col("step"))
      .agg(max(col("n")).as("n_users"), pick(50).as("p50_secs"),
        pick(90).as("p90_secs"))
  }

  /** Cohort retention matrix: users grouped by their FIRST-seen day
    * (the cohort), activity counted per day offset from it — the
    * "day-N retention" read. A user active several times in one day
    * counts once per (cohort, offset) cell. Output:
    * (cohort_day, day_offset, n_users). */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val day = date_trunc("day", col(tsCol))
    val first = events
      .groupBy(col(userCol))
      .agg(min(day).as("cohort_day"))
    events
      .select(col(userCol), day.as("__activity_day"))
      .distinct()
      .join(first, Seq(userCol))
      .groupBy(col("cohort_day"),
        datediff(col("__activity_day"), col("cohort_day"))
          .cast(LongType).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
