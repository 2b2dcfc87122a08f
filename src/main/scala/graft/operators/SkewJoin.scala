package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the skew rescue for the one join shape AQE can't
  * always save: a heavily skewed fact side against a dimension that is
  * too large to broadcast. A plain shuffle join sends EVERY row of a
  * hot key to one reducer; AQE's skew-split can divide the fact side's
  * partitions after the fact, but only within sort-merge joins whose
  * both sides it may replicate, and only at partition granularity.
  * Salting fixes the layout by construction instead: each fact row
  * gets a deterministic salt in `[0, buckets)`, the dimension side is
  * replicated `buckets` times, and the join key becomes
  * `(key, salt)` — a key carrying 50% of 100 TB fans across `buckets`
  * reducers instead of straggling on one.
  *
  * Semantics: EXACTLY an inner equi-join on `keys` — salting is a pure
  * partitioning trick, invisible in the result (spec-pinned equal to
  * the unsalted join, and the driver query shares a plain-SQL oracle).
  *
  * Cost model: the dimension side is shuffled ×`buckets`, so pick
  * `buckets` ≈ (hot-key share × fact partitions), not thousands —
  * salting trades dimension replication for fact-side balance. The
  * salt is `xxhash64(distributor) mod buckets` with a caller-chosen
  * distributor column (a per-row id or high-cardinality column), so
  * runs are deterministic and re-executions of a failed stage
  * repartition identically — `rand()` salts would break both.
  */
object SkewJoin {

  private val SaltCol = "__graft_salt"

  /** Inner equi-join of `big ⋈ small` on `keys`, with the big side
    * salted across `buckets` sub-keys.
    *
    * @param big the skewed (fact) side; every output column kept
    * @param small the replicated (dimension) side; must share `keys`
    * @param keys equi-join column names present on both sides
    * @param distributor column over `big` rows steering the salt —
    *   use a per-row id; a constant would defeat the fan-out
    * @param buckets number of salt buckets (1..4096)
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame,
      keys: Seq[String], distributor: Column,
      buckets: Int): DataFrame = {
    require(keys.nonEmpty, "saltedInnerJoin needs at least one key")
    require(buckets >= 1 && buckets <= 4096,
      s"buckets must be in 1..4096, got $buckets")
    require(!big.columns.contains(SaltCol) &&
      !small.columns.contains(SaltCol),
      s"$SaltCol is reserved by saltedInnerJoin")
    val bigS = big.withColumn(SaltCol,
      pmod(xxhash64(distributor), lit(buckets.toLong)).cast("int"))
    val smallS = small.withColumn(SaltCol,
      explode(lit((0 until buckets).toArray)))
    bigS.join(smallS, keys :+ SaltCol).drop(SaltCol)
  }
}
