package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus-level boilerplate line removal (C4/RefinedWeb-style): a line
  * that recurs across ≥ `minDf` distinct documents (nav menus, cookie
  * banners, copyright footers) is dropped from every document; the
  * remaining lines are reassembled in their original order.
  *
  * Scale shape (the part that must survive 100 TB):
  *  - line document-frequency is counted on 128-bit md5 line keys, so
  *    the df aggregation never shuffles raw line text;
  *  - the hot-line set (df ≥ minDf) is tiny by construction — at most
  *    `total_lines / minDf` distinct keys — and is broadcast, so the
  *    drop is a broadcast anti-join: document lines themselves are
  *    never re-partitioned to be filtered;
  *  - the only document-sized shuffle is the per-doc reassembly
  *    (groupBy id), which any order-preserving reconstruction needs.
  *
  * Lines are split on `\n`; for CRLF corpora compose with
  * [[TextAnalysis.normalizeWs]] first (it rewrites `\r\n` to a clean
  * `\n`), otherwise a trailing `\r` makes otherwise-identical lines
  * distinct and deflates their df.
  */
object Boilerplate {

  /** Document frequency per distinct line: (line, df) with df =
    * number of distinct documents containing the line — the audit
    * view for choosing `minDf`. */
  def lineDf(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        explode(split(col(textCol), "\n")).as("line"))
      .groupBy(col("line"))
      .agg(countDistinct(col("id")).as("df"))

  /** Strip boilerplate lines and reassemble each document.
    * Output: (id, n_lines, n_kept, clean_text, clean_len).
    *
    * The hot set joins as a broadcast LEFT join carrying a flag (not an
    * anti-join), so before/after line counts and the kept-line
    * reassembly all come out of ONE per-doc aggregation — 3 shuffles
    * total (distinct (line,doc) pairs → line df → reassembly), no
    * doc-sized totals⋈kept join, and a fully-boilerplate document
    * still appears with an empty clean view (its lines reach the
    * aggregation; only the collect skips them). */
  def strip(df: DataFrame, textCol: String, idCol: String,
      minDf: Long): DataFrame = {
    val lines = df
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("lh", md5(col("line")))
    // count-first on hashes only; the broadcast set is df-bounded
    val hot = lines.groupBy(col("lh"))
      .agg(countDistinct(col("id")).as("df"))
      .where(col("df") >= minDf)
      .select(col("lh"), lit(true).as("hot"))
    lines.join(broadcast(hot), Seq("lh"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lines"),
        count(when(col("hot").isNull, lit(1))).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("hot").isNull, struct(col("pos"), col("line"))))),
            s => s.getField("line")), "\n").as("clean_text"))
      .select(col("id"), col("n_lines"), col("n_kept"), col("clean_text"),
        length(col("clean_text")).cast(LongType).as("clean_len"))
  }
}
