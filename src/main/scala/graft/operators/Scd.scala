package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD Type-2) handling — the warehouse
  * pattern for attributes that change over time: a change log becomes
  * a VALIDITY-INTERVAL table (`valid_from`/`valid_to`), and facts join
  * against the version that was current AT THEIR OWN timestamp, so a
  * reprocessed historical fact never picks up today's attribute value
  * (the training-data analogue: a document's source-quality tier at
  * CRAWL time, not at dataset-build time).
  *
  * Scale shape: interval build is two windows over one hash partition
  * on the dimension keys (same-instant collapse + `lead`), one row per
  * change — never an explosion. The point-in-time join delegates to
  * [[AsOfJoin]]'s single-shuffle union+window composition (no
  * interval theta-join, no per-key quadratic pairing); the `valid_to`
  * bound is a row-local post-check that only fires on GAPPED interval
  * tables (hand-maintained ones — [[buildType2]] output is gapless by
  * construction).
  */
object Scd {

  /** Validity intervals from a change log: per key set ordered by
    * `tsCol`, each change is valid from its own timestamp until the
    * next change (exclusive); the latest change stays OPEN
    * (`valid_to` null). Same-instant changes collapse first — the
    * greatest by `ordCol` supersedes — so zero-width intervals never
    * materialize and (keys, ts) is unique in the output, which keeps
    * every downstream read deterministic.
    *
    * Output: the change row's columns + `valid_from` + `valid_to`. */
  def buildType2(changes: DataFrame, keys: Seq[String], tsCol: String,
      ordCol: Column): DataFrame = {
    val collapse = Window
      .partitionBy(keys.map(col) :+ col(tsCol): _*)
      .orderBy(ordCol.desc)
    val seq = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol).asc)
    changes
      .withColumn("__rn", row_number().over(collapse))
      .where(col("__rn") === 1)
      .drop("__rn")
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(seq))
  }

  /** Point-in-time join: every fact row gets `attrs` from the interval
    * containing its timestamp — `valid_from` inclusive, `valid_to`
    * exclusive, open intervals extend to +∞; facts before the first
    * change (or inside a gap of a hand-maintained table) get null
    * attrs. `attrs` must not collide with fact column names; the
    * interval table needs (keys, valid_from) unique ([[buildType2]]
    * guarantees it). */
  def pointInTime(facts: DataFrame, scd2: DataFrame, keys: Seq[String],
      factTsCol: String, attrs: Seq[String]): DataFrame = {
    val dim = scd2.select(
      keys.map(col) ++ (attrs :+ "valid_to").map(col) :+
        col("valid_from").as(factTsCol): _*)
    val joined = AsOfJoin.backward(facts, dim, keys, factTsCol,
      attrs :+ "valid_to")
    val inRange = col("valid_to").isNull || col(factTsCol) < col("valid_to")
    attrs.foldLeft(joined) { (d, a) =>
        d.withColumn(a, when(inRange, col(a)))
      }
      .drop("valid_to", s"matched_$factTsCol")
  }
}
