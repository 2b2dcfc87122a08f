package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap + MAX-DURATION sessionization — the production variant of the
  * gap-only sessionizer (`event_sessions` / Spark's own
  * `session_window`): a session closes when the user pauses longer
  * than `gapMinutes` OR when it has already spanned
  * `maxDurationMinutes` from its start (the Universal-Analytics-style
  * cap that stops a slow-drip bot or an idle-refresh tab from
  * accreting a week-long "session").
  *
  * The cap makes the semantics genuinely RECURSIVE: whether an event
  * opens a new session depends on the current session's START, which
  * depends on every earlier split — not expressible as one window
  * pass over lag() gaps (the gap-only form is), and not expressible
  * by `session_window` at all. So the operator runs the textbook
  * greedy left-to-right fold per user: one shuffle on the user key,
  * each group's timestamps sorted and folded in a tight JVM loop.
  * Per-user memory is that user's event-time array — the same
  * per-entity bound every sequential-state pass here has ([[Anomaly]]
  * Holt, SCALE §5c); pre-filter or pre-aggregate a pathological
  * entity before sessionizing it.
  *
  * Split rules (both STRICT, microsecond-exact): new session when
  * `t − prev > gap` (matching the gap-only oracle's `>` convention)
  * or `t − session_start > cap`. An event landing exactly on either
  * boundary stays in the session.
  *
  * Contract: the entity column must be NUMERIC (cast to long —
  * the streaming twin's keying convention; a non-numeric id casts
  * to null and fails the encoder loudly, never a silent regroup).
  * Hash string ids to longs upstream when needed.
  *
  * Output: (userCol, session_start, session_end, n_events). */
object Sessions {

  def cappedSessions(events: DataFrame, userCol: String, tsCol: String,
      gapMinutes: Int, maxDurationMinutes: Int): DataFrame = {
    require(gapMinutes > 0, "gapMinutes must be positive")
    require(maxDurationMinutes > 0, "maxDurationMinutes must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L
    val capUs = maxDurationMinutes * 60000000L
    def toUs(t: Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def toTs(us: Long): Timestamp =
      Timestamp.from(java.time.Instant.ofEpochSecond(
        math.floorDiv(us, 1000000L), math.floorMod(us, 1000000L) * 1000L))
    events.select(col(userCol).cast("long"), col(tsCol).cast("timestamp"))
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroups { (user: Long, it: Iterator[(Long, Timestamp)]) =>
        val ts = it.map(r => toUs(r._2)).toArray
        java.util.Arrays.sort(ts)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Timestamp, Timestamp, Long)]
        if (ts.nonEmpty) {
          var start = ts(0)
          var prev = ts(0)
          var n = 1L
          var i = 1
          while (i < ts.length) {
            val t = ts(i)
            if (t - prev > gapUs || t - start > capUs) {
              out += ((user, toTs(start), toTs(prev), n))
              start = t
              n = 0L
            }
            prev = t
            n += 1L
            i += 1
          }
          out += ((user, toTs(start), toTs(prev), n))
        }
        out.iterator
      }
      .toDF(userCol, "session_start", "session_end", "n_events")
  }

  /** Next-event training examples — the sequence-model dataset builder:
    * for every event with at least one predecessor, emit the user's
    * trailing context (the previous `k` event types, oldest first,
    * space-joined) plus the time since the previous event, labeled by
    * the event that actually happened. The standard supervised shape
    * for next-action / churn / recommendation models built from an
    * event log.
    *
    * Scale shape: ONE hash exchange on the user key serves every
    * window (trailing-type frame, lag) — the same single-partitioning
    * discipline as the rolling-feature queries; per-row state is the
    * bounded k-row frame, never the user's full history. Time gaps are
    * microsecond-exact integers via `timestampdiff` (works unchanged
    * on TIMESTAMP and TIMESTAMP_NTZ event times — `unix_micros` would
    * reject NTZ parquet reads at the library boundary), so the output
    * is engine-independent. Ordering ties break on the event id.
    *
    * Output: (`event_id`, userCol, `prefix`, `gap_us`, `label`) —
    * first events (empty context) are not examples and are absent. */
  def nextEventExamples(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    // k fixed lags instead of a collect_list frame: same prefix
    // (concat_ws skips the nulls a short history leaves), a fraction
    // of the window state — no per-row array buffer materializes
    val lags = (k to 1 by -1).map(i => lag(col(typeCol), i).over(byUser))
    events
      .select(col(idCol), col(userCol), col(tsCol), col(typeCol))
      .withColumn("prefix", concat_ws(" ", lags: _*))
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("gap_us",
        expr(s"timestampdiff(MICROSECOND, __prev_ts, `$tsCol`)"))
      .where(col("gap_us").isNotNull)
      .select(col(idCol), col(userCol), col("prefix"), col("gap_us"),
        col(typeCol).as("label"))
  }
}
