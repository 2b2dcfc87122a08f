package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** PII detection and redaction — the scrubbing pass every
  * training-data pipeline runs before text reaches a trainer: find
  * emails / phone numbers / IPv4 addresses, count them per document,
  * and rewrite the text with typed placeholder tags.
  *
  * All operators are row-local regexp column expressions (codegen'd,
  * no UDFs, no shuffles — linear in input splits at any scale). The
  * patterns deliberately use only regex syntax that parses and matches
  * identically under `java.util.regex` (Spark) and RE2 (the DuckDB
  * oracle): character classes, bounded/unbounded greedy quantifiers,
  * no backrefs, no lookaround, no alternation whose leftmost-first vs
  * leftmost-longest semantics could diverge.
  */
object Pii {

  /** Email: local part, @, dotted domain, ≥2-letter TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International-ish phone: +CC-NNN-NNNN. */
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  /** Dotted-quad IPv4 (syntactic — no 0-255 range check, matching the
    * common scrubber heuristic). */
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Non-overlapping match count of `re` in `text`. */
  def countMatches(text: Column, re: String): Column =
    regexp_count(text, lit(re)).cast(LongType)

  /** Redact all three PII classes with typed tags. Order is fixed
    * (email → phone → IP) and each pass sees the previous pass's
    * output, so a dotted-quad inside an email domain is consumed by
    * the email tag — the oracle replicates the same sequence. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Per-document PII profile: match counts per class (on the raw
    * text) plus the redacted length — the audit artifact a pipeline
    * stores next to the cleaned corpus.
    * Output: (id, n_emails, n_phones, n_ips, clean_len). */
  def piiStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol).cast(LongType).as("id"),
      countMatches(t, EmailRe).as("n_emails"),
      countMatches(t, PhoneRe).as("n_phones"),
      countMatches(t, Ipv4Re).as("n_ips"),
      length(redact(t)).cast(LongType).as("clean_len"))
  }

  /** K-ANONYMITY suppression for released aggregates — the other half
    * of the privacy plane next to redaction and right-to-erasure:
    * a published statistic over a quasi-identifier combination must
    * not be re-identifiable, so any group backed by FEWER than `k`
    * distinct contributors is withheld entirely (suppression, the
    * standard k-anonymity release gate). The contributor count is
    * exact by necessity — the guarantee is about people, not rows —
    * and is released alongside the measures so auditors can check the
    * gate held.
    *
    * Scale shape: one hash aggregation on the quasi-identifier key
    * (the distinct-contributor count rides the same shuffle via a
    * two-level partial — Spark plans count(DISTINCT) with a
    * partial-dedup expand, never a per-group set collect); the filter
    * is post-aggregate and row-local.
    *
    * Output: quasiIds… + `n_contributors` + the named measures. */
  def kAnonymousAggregate(rows: DataFrame, quasiIds: Seq[String],
      contributorCol: String, k: Long,
      measures: Seq[(String, Column)]): DataFrame = {
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    require(quasiIds.nonEmpty, "need at least one quasi-identifier")
    val aggs = countDistinct(col(contributorCol)).as("n_contributors") +:
      measures.map { case (n, c) => c.as(n) }
    rows.groupBy(quasiIds.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .where(col("n_contributors") >= k)
  }
}
