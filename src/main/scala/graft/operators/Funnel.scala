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
    val spark = events.sparkSession
    // fold: qualified_i = (user, t_i = min ts of a stage-i event > t_{i-1})
    val frames = stages.zipWithIndex.foldLeft(
      List.empty[(String, DataFrame)]) { case (acc, ((name, pred), i)) =>
      val matching = events.where(pred)
        .select(col(userCol), col(tsCol).as("__t"))
      val qualified = acc match {
        case Nil =>
          matching.groupBy(col(userCol)).agg(min(col("__t")).as("__q"))
        case (_, prev) :: _ =>
          matching
            .join(prev.select(col(userCol), col("__q").as("__prev")),
              Seq(userCol))
            .where(col("__t") > col("__prev"))
            .groupBy(col(userCol)).agg(min(col("__t")).as("__q"))
      }
      (name, qualified) :: acc
    }.reverse
    frames.zipWithIndex.map { case ((name, df), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i.toLong).as("stage_idx"), lit(name).as("stage"),
          col("n_users"))
    }.reduce(_.unionByName(_))
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
