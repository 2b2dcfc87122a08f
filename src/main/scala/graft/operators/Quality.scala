package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints with a violations report —
  * the pre-ingest gate a production pipeline runs before a batch is
  * allowed into a store (the Deequ-shaped component): declare what
  * must hold (completeness, row predicates, key uniqueness,
  * referential integrity), get back one row per constraint with its
  * exact violation count, alert or quarantine on `fail`.
  *
  * Scale shape: every ROW-LOCAL constraint (not-null, predicate)
  * fuses into ONE aggregation pass over the frame — adding checks
  * adds columns to that pass, not scans. Uniqueness needs its own
  * hash aggregation on its key (violations = rows − key groups; a
  * count-distinct would silently drop null keys) and referential
  * integrity one anti-join per reference (AQE-sized — broadcast when
  * the reference is small); both are per-constraint by nature, and
  * the report says exactly what each cost. Violation counts are
  * exact longs — a release gate cannot be approximate.
  */
object Quality {

  sealed trait Constraint

  /** `column` must never be null. Reported as `not_null(column)`. */
  final case class NotNull(column: String) extends Constraint

  /** Row-local predicate that must hold on every row; a null
    * predicate value counts as a violation (unknown does not pass a
    * gate). Reported as `satisfies(name)`. */
  final case class Satisfies(name: String, predicate: Column)
      extends Constraint

  /** The column tuple must be unique across the frame (null keys
    * participate — a duplicated all-null key is still a duplicate).
    * Violations = surplus rows beyond one per key.
    * Reported as `unique(c1,c2)`. */
  final case class Unique(columns: Seq[String]) extends Constraint

  /** Every non-null `column` value must exist in `ref.refColumn`.
    * Reported as `foreign_key(column->refName.refColumn)`. */
  final case class ForeignKey(column: String, ref: DataFrame,
      refColumn: String, refName: String) extends Constraint

  /** One row per constraint: (`check`, `violations`, `status`) with
    * status `pass` iff violations = 0. Constraint order is not
    * significant (sort/compare by `check`). */
  def report(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "Quality.report: no constraints")
    // check labels are spliced into a stack() expression — keep them
    // to identifier-safe characters so a label can't break (or
    // inject into) the generated SQL
    val safe = "[A-Za-z0-9_.$-]+".r
    constraints.foreach {
      case NotNull(c) => require(safe.matches(c), s"unsafe column: $c")
      case Satisfies(n, _) => require(safe.matches(n), s"unsafe name: $n")
      case _ => ()
    }
    // duplicate declarations of the same check are one check (a
    // machine-generated constraint list easily repeats itself; two
    // identically-aliased agg columns would be an ambiguous reference)
    val rowLocal: Seq[(String, Column)] = constraints.collect {
      case NotNull(c) =>
        s"not_null($c)" -> col(c).isNull
      case Satisfies(n, p) =>
        s"satisfies($n)" -> !coalesce(p, lit(false))
    }.distinctBy(_._1)
    val fused: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        // coalesce: sum() over an EMPTY batch is NULL, and an empty
        // batch has zero violations, not a failed gate
        val aggs = rowLocal.map { case (n, violated) =>
          coalesce(sum(when(violated, 1L).otherwise(0L)), lit(0L)).as(n) }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val stackArgs = rowLocal
          .map { case (n, _) => s"'$n', `$n`" }.mkString(", ")
        Some(one.selectExpr(
          s"stack(${rowLocal.size}, $stackArgs) AS (check, violations)"))
      }
    val keyed: Seq[DataFrame] = constraints.collect {
      case Unique(cols) =>
        s"unique(${cols.mkString(",")})" ->
          df.groupBy(cols.map(col): _*)
            .agg(count(lit(1)).as("__cnt"))
            .agg(coalesce(sum(col("__cnt") - 1L), lit(0L)).as("violations"))
      case ForeignKey(c, ref, rc, rn) =>
        s"foreign_key($c->$rn.$rc)" ->
          df.where(col(c).isNotNull)
            .join(ref.select(col(rc).as(c)).distinct(), Seq(c), "left_anti")
            .agg(count(lit(1)).as("violations"))
    }.distinctBy(_._1).map { case (label, frame) =>
      frame.select(lit(label).as("check"), col("violations"))
    }
    (fused.toSeq ++ keyed)
      .reduce(_.unionByName(_))
      .withColumn("status",
        when(col("violations") === 0L, "pass").otherwise("fail"))
  }
}
