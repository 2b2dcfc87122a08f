package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture APPLY — the MERGE/upsert table-maintenance
  * operator: a log of keyed changes (upserts and deletes, ordered by
  * a sequence) collapses onto an optional base snapshot into the
  * current state of the table. The lakehouse compaction loop is
  * exactly repeated [[applyChanges]]: yesterday's state + today's
  * log → today's state, and the operator is COMPOSITIONAL — snapshot
  * at any cut + the remaining log gives bit-identical state to
  * replaying the full log (the driver query pins this end to end).
  *
  * Scale shape: one hash partition on the table key (union + window
  * row_number, the last-writer-wins pick), no joins — the snapshot
  * rides the same shuffle as the log, deletes are a row-local filter
  * after the pick. Determinism: the sequence columns must totally
  * order each key's changes (pass a tiebreaker — e.g. (ts, change_id)
  * — when timestamps can collide); snapshot rows rank below every
  * change (nulls-last descending), which is the only correct place
  * for them since a snapshot is by definition older than the log
  * being applied.
  */
object Cdc {

  /** @param snapshot base state (keys + payload, unique per key) or
    *   None for a from-scratch build
    * @param changes  change log carrying keys, payload, `seqCols`,
    *   and `opCol` (non-null)
    * @param payload  columns the state carries (besides the keys)
    * @param seqCols  change order within a key, later wins; must be
    *   non-null in `changes`
    * @param deleteOp `opCol` value marking a delete; anything else
    *   upserts
    * @return current state: keys ++ payload, one row per live key */
  def applyChanges(snapshot: Option[DataFrame], changes: DataFrame,
      keys: Seq[String], payload: Seq[String], seqCols: Seq[String],
      opCol: String, deleteOp: String = "D"): DataFrame = {
    require(seqCols.nonEmpty, "applyChanges needs sequence columns")
    val outCols = keys ++ payload
    val c = changes.select(
      (outCols.map(col) :+ col(opCol).as("__op")) ++
        seqCols.zipWithIndex.map { case (s, i) => col(s).as(s"__seq$i") }: _*)
    val all = snapshot match {
      case Some(base) =>
        val b = base.select(
          (outCols.map(col) :+ lit("U").as("__op")) ++
            seqCols.indices.map(i =>
              lit(null).cast(c.schema(s"__seq$i").dataType).as(s"__seq$i")): _*)
        c.unionByName(b)
      case None => c
    }
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(seqCols.indices.map(i => col(s"__seq$i").desc_nulls_last): _*)
    all.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col("__op") =!= deleteOp)
      .select(outCols.map(col): _*)
  }

  /** Snapshot DIFF — the other half of the CDC loop: given two keyed
    * snapshots (e.g. two crawl dumps of a corpus), classify every key
    * as `added` (new side only), `removed` (old side only), `changed`
    * (both sides, different content), or `unchanged`. The read that
    * decides whether a re-crawl is worth re-processing, and the input
    * a synthetic change log needs when the upstream system only ships
    * full dumps.
    *
    * Scale shape: content collapses to md5 digests BEFORE the join, so
    * the full-outer join shuffles 32-byte keys + digests — never the
    * payloads (the [[Dedup.exact]] discipline); one shuffle on the
    * key. Output: (keyCol, `status`), one row per key present on
    * either side.
    *
    * Contract: `keyCol` must be unique within each snapshot (duplicate
    * keys would fan out multiplicatively through the full-outer join)
    * — ENFORCED loudly in-plan: each side aggregates by key first (the
    * aggregation hash-partitions on the key, so the join reuses the
    * exchange — no extra shuffle) and a duplicate key raises at
    * runtime instead of silently multiplying rows.
    * NULL content is a real value: md5(null) is coalesced to a sentinel
    * digest so a present-with-null-text key still registers as present
    * (never misreported added/removed), and null-on-both-sides compares
    * equal (`unchanged`) via the null-safe comparison.
    * NULL KEYS: within one snapshot NULL keys count toward uniqueness —
    * `groupBy` puts all NULL keys in one group, so two NULL-keyed rows
    * on the same side raise `duplicate key ... null` like any other
    * duplicate. ACROSS sides a NULL key never matches (the full-outer
    * join uses SQL equality, where NULL ≠ NULL), so a NULL-keyed row
    * present in both snapshots reports as one `removed` plus one
    * `added`, never `changed`/`unchanged`. Keyed corpora should not
    * carry NULL keys; this contract just pins what happens if one
    * slips through. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCol: String, contentCol: String): DataFrame = {
    def digest(df: DataFrame, side: String): DataFrame =
      df.select(col(keyCol),
          coalesce(md5(col(contentCol)), lit("<null>")).as(side))
        .groupBy(col(keyCol))
        .agg(count(lit(1)).as("__n"), max(col(side)).as(side))
        .select(col(keyCol),
          when(col("__n") === 1, col(side)).otherwise(raise_error(
            concat(lit(s"snapshotDiff: duplicate key in $side snapshot: "),
              coalesce(col(keyCol).cast("string"), lit("null"))))).as(side))
    digest(oldSnap, "__old").join(digest(newSnap, "__new"),
        Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(col("__old") <=> col("__new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }
}
