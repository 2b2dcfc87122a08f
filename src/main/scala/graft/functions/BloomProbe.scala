package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.call_function

/** SQL/Column surface over Spark's OWN Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the codegen'd
  * pair Catalyst uses for runtime row-level join filters), registered
  * as session functions so set-membership prefilters are expressible
  * without UDFs:
  *
  *  - `graft_bloom_agg(xxhash64(x), nItems, nBits)` — aggregates a
  *    column of 64-bit hashes into one serialized Bloom filter
  *    (BinaryType). `nItems`/`nBits` must be foldable long literals
  *    (they size the filter; ~10 bits/element ≈ 1% false positives).
  *  - `graft_bloom_might(bf, xxhash64(x))` — membership probe; the
  *    filter side must be a constant (literal or scalar subquery), so
  *    the deserialized filter is shared per-partition, not per-row.
  *
  * The probe is row-local and whole-stage-codegen'd: a 100 TB scan
  * filtered by `graft_bloom_might` never shuffles to discover that a
  * row CANNOT match — only might-contain survivors (true hits + the
  * configured false-positive rate) reach any join. Exactness is
  * restored downstream by verifying survivors against the real set
  * ([[graft.operators.Decontaminate.bloomOverlapReport]]).
  *
  * Hash discipline: agg input and probe input must be the SAME
  * expression over the same column (the engine standardizes on
  * `xxhash64`); the filter stores hashes, not values.
  */
object BloomProbe {

  val aggInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_agg"),
    new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
    (children: Seq[Expression]) => children match {
      case Seq(c) => new BloomFilterAggregate(c)
      case Seq(c, n) => new BloomFilterAggregate(c, n)
      case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
      case other => throw new IllegalArgumentException(
        s"graft_bloom_agg expects 1..3 arguments, got ${other.size}")
    })

  val mightInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_might"),
    new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_bloom_might"),
    (children: Seq[Expression]) => children match {
      case Seq(bf, v) => BloomFilterMightContain(bf, v)
      case other => throw new IllegalArgumentException(
        s"graft_bloom_might expects 2 arguments, got ${other.size}")
    })

  /** Bloom filter over a column of 64-bit hashes, sized for `nItems`
    * elements in `nBits` bits. Returns one BinaryType row. */
  def bloomAgg(hashed: Column, nItems: Long, nBits: Long): Column =
    call_function("graft_bloom_agg", hashed,
      org.apache.spark.sql.functions.lit(nItems),
      org.apache.spark.sql.functions.lit(nBits))

  /** Membership probe; `bf` must be a constant BinaryType column. */
  def mightContain(bf: Column, hashed: Column): Column =
    call_function("graft_bloom_might", bf, hashed)

  /** Bits for a target false-positive rate (standard Bloom sizing
    * m = −n·ln p ∕ ln²2, floored at 64). */
  def bitsFor(nItems: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    math.max(64L,
      math.ceil(-nItems.toDouble * math.log(fpp) /
        (math.log(2) * math.log(2))).toLong)
  }
}
