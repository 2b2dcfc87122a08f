package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** User-supplied reduction over LONG values as a typed `Aggregator` —
  * the engine's UDAF surface, existing to complete `get-histogram`'s
  * declared `merge-with` parameter ("single row histogram … merged
  * with `+` if merge-with unspecified", api.clj:38-41 — a stub in
  * every reference backend).
  *
  * The buffer tracks whether it has seen a value, so `f` needs no
  * identity element and may be any commutative+associative
  * (Long, Long) => Long (Spark merges partial buffers in arbitrary
  * order — non-commutative functions would be partitioning-dependent).
  */
final case class MergeWith(f: (Long, Long) => Long)
    extends Aggregator[Long, (Boolean, Long), Long] {
  override def zero: (Boolean, Long) = (false, 0L)
  override def reduce(b: (Boolean, Long), a: Long): (Boolean, Long) =
    if (b._1) (true, f(b._2, a)) else (true, a)
  override def merge(x: (Boolean, Long), y: (Boolean, Long)): (Boolean, Long) =
    if (!x._1) y else if (!y._1) x else (true, f(x._2, y._2))
  override def finish(r: (Boolean, Long)): Long = r._2
  override def bufferEncoder: Encoder[(Boolean, Long)] =
    Encoders.tuple(Encoders.scalaBoolean, Encoders.scalaLong)
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong

  /** Typed-column form for `Dataset.agg`. */
  def column: TypedColumn[Long, Long] = this.toColumn

  /** Untyped-column form for `DataFrame.groupBy(...).agg(...)`. */
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    udaf(this).apply(c)
}
