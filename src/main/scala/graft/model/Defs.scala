package graft.model

import java.sql.Timestamp

/** Fact (metric) type algebra.
  *
  * Mirrors the reference's fact types (`:counter`, `:average`, `:histogram`)
  * declared at `src/time_series_storage/api.clj:5-6` and materialized as
  * value columns at `src/time_series_storage/postgres/schema.clj:156-173`.
  */
sealed abstract class FactType(val name: String)
object FactType {
  /** `counter integer` — schema.clj:158-160 */
  case object Counter extends FactType("counter")
  /** `counter integer, total integer` — schema.clj:168-173; kept as a
    * (counter, total) pair until the presentation edge so partial
    * aggregates re-aggregate exactly (reference query.clj:60-73). */
  case object Average extends FactType("average")
  /** one bucket per `[start, end) step` — schema.clj:162-166. The
    * reference's read path is an unimplemented stub (`get-histogram`,
    * postgres.clj:126-128); this engine completes it. */
  case object Histogram extends FactType("histogram")
  /** BEYOND-REFERENCE: exact distinct-value count per (series ×
    * bucket) — unique users/sessions per slice, the metrics-store
    * need the reference's scalar counters cannot express (distinct
    * counts are not re-aggregable from per-slice scalars). Rollup
    * partials are TALL (series × slice × value) rows, mirroring the
    * histogram design: re-bucketing stays EXACT at any collapse step
    * because the values themselves are retained at slice granularity,
    * and appended streaming partials merge by the same convention. */
  case object Distinct extends FactType("distinct")

  val all: Seq[FactType] = Seq(Counter, Average, Histogram, Distinct)
  def parse(s: String): FactType =
    all.find(_.name == s.toLowerCase.stripPrefix(":"))
      .getOrElse(throw new IllegalArgumentException(s"Unknown fact type: $s"))
}

/** A metric definition.
  *
  * Mirrors the `facts` catalog row (reference
  * `postgres/schema.clj:70-84`) with defaults applied as in
  * `postgres/schema.clj:114-128` (slice 15, filler 0, units "counter").
  * Histogram bucket bounds (`start`/`end`/`step`) are only meaningful for
  * [[FactType.Histogram]].
  */
final case class FactDef(
    id: String,
    ftype: FactType,
    sliceMinutes: Int = 15,
    name: Option[String] = None,
    filler: Long = 0L,
    units: String = "counter",
    start: Option[Long] = None,
    end: Option[Long] = None,
    step: Option[Long] = None) {
  require(sliceMinutes > 0 && sliceMinutes <= 60,
    s"slice must be in (0,60] minutes (reference floors within the hour, " +
      s"postgres/common.clj:7-23); got $sliceMinutes")

  /** Histogram bucket lower bounds, e.g. start=0 end=1000 step=100 →
    * 0,100,…,900 (reference `postgres/schema.clj:162-166` column fan-out). */
  def histogramBuckets: Seq[Long] = (ftype, start, end, step) match {
    case (FactType.Histogram, Some(s), Some(e), Some(st)) => s.until(e, st)
    case (FactType.Histogram, _, _, _) =>
      throw new IllegalArgumentException(
        s"Histogram fact '$id' requires start/end/step")
    case _ => Seq.empty
  }
}

/** A categorical dimension definition.
  *
  * Mirrors the `dimensions` catalog row (reference
  * `postgres/schema.clj:93-105`) with defaults per
  * `postgres/schema.clj:130-141` / `mem.clj:116-128`: size 40,
  * groupedBy `[[]]` (a single empty grouping path = a flat rollup),
  * facts empty, groupOnly false.
  *
  * `groupedBy` is a list of grouping paths; each path is the ordered list
  * of parent dimension ids under which this dimension is pre-grouped.
  * `facts` must name the facts this dimension tracks explicitly (the
  * reference is inconsistent here — SURVEY §2.3.4 — we follow the
  * mem-test convention of explicit association).
  */
final case class DimensionDef(
    id: String,
    name: Option[String] = None,
    sliceMinutes: Option[Int] = None,
    size: Int = 40,
    groupOnly: Boolean = false,
    groupedBy: Seq[Seq[String]] = Seq(Seq.empty),
    facts: Set[String] = Set.empty)

/** A fact occurrence — the canonical input row of the engine.
  *
  * Mirrors `new-fact!` (reference `api.clj:23-26`): dimension values are
  * strings (varchar columns, `postgres/schema.clj:189-193`), measures are
  * integral (`postgres/schema.clj:158-173`) → Long.
  */
final case class Event(
    fact: String,
    ts: Timestamp,
    value: Long,
    categories: Map[String, String])

/** Calendar collapse / grid step.
  *
  * Collapse supports hour/day/week/month/none (reference
  * `query.clj:6-37`); the fill grid additionally supports year
  * (reference `query.clj:84-97`). `NoStep` means "no re-bucketing":
  * one total per series, encoded as a NULL bucket (the reference's
  * `:all` sentinel).
  */
sealed abstract class Step(val name: String)
object Step {
  case object Hour extends Step("hour")
  case object Day extends Step("day")
  case object Week extends Step("week")
  case object Month extends Step("month")
  case object Year extends Step("year")
  case object NoStep extends Step("none")

  def parse(s: String): Step =
    Seq(Hour, Day, Week, Month, Year, NoStep)
      .find(_.name == s.toLowerCase.stripPrefix(":"))
      .getOrElse(throw new IllegalArgumentException(s"Unknown step: $s"))
}
