package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomProbe

/** Bloom-prefiltered semi-join — "keep the fact rows whose key is in
  * this set" when the key set is too large to broadcast exactly but
  * its Bloom filter is not. The standard plan for a 100 TB fact
  * filtered by a 10⁸-key set is a shuffled left_semi join: BOTH sides
  * repartition, including the 100 TB that mostly doesn't match. Here
  * the key set is compressed ~60× into one of Spark's Bloom filters
  * (built with the engine's `graft_bloom_agg`), the fact scan is gated
  * by the row-local, codegen'd `might_contain` probe, and only
  * survivors (true matches + the configured false-positive sliver)
  * enter the exact semi-join that removes the false positives — so the
  * shuffle moves ~|matches|, not |fact|.
  *
  * Semantics: EXACTLY `big.join(smallKeys, keys, "left_semi")` — the
  * probe admits every true match (Bloom filters have no false
  * negatives) and the final semi-join evicts everything else. The
  * driver query shares a plain semi-join SQL oracle; a spec pins
  * equality and the probe-before-join plan shape.
  *
  * This is the same mechanism Spark's own InjectRuntimeFilter applies
  * WITHIN one query when statistics justify it; the operator form
  * makes it available across DataFrames, sessions, and materialization
  * boundaries (e.g. a key set loaded from yesterday's job), where the
  * optimizer cannot see the producing side.
  *
  * Eager: building the filter runs two small jobs over the key side
  * (a distinct count for sizing, then the aggregate) and collects
  * `nBits/8` bytes to the driver — bounded by construction via `fpp`.
  */
object BloomJoin {

  /** `big` rows whose `keys` tuple appears in `small` (left_semi),
    * Bloom-pregated. Key columns must carry the same names on both
    * sides (rename before calling).
    *
    * @param fpp target false-positive rate of the pregate — tunes the
    *   filter size vs how many non-matching rows reach the exact join
    */
  def bloomSemiJoin(big: DataFrame, small: DataFrame,
      keys: Seq[String], fpp: Double = 0.01): DataFrame = {
    require(keys.nonEmpty, "bloomSemiJoin needs at least one key")
    graft.functions.GraftFunctions.register(big.sparkSession)
    val keyCols = keys.map(col)
    // materialize the distinct key set ONCE (eager local checkpoint):
    // the sizing count, the Bloom aggregate, and the exact verify join
    // below would otherwise each recompute the distinct from scratch
    val smallKeys = small.select(keyCols: _*).distinct().localCheckpoint(true)
    val nItems = math.max(smallKeys.count(), 1L)
    val bfRow = smallKeys
      .agg(BloomProbe.bloomAgg(xxhash64(keyCols: _*), nItems,
        BloomProbe.bitsFor(nItems, fpp)).as("bf"))
      .head
    if (bfRow.isNullAt(0)) {
      // empty key set → empty semi-join
      big.where(lit(false))
    } else {
      val bf = lit(bfRow.getAs[Array[Byte]]("bf"))
      big
        .where(BloomProbe.mightContain(bf, xxhash64(keyCols: _*)))
        .join(smallKeys, keys, "left_semi")
    }
  }
}
