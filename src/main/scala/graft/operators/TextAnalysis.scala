package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis scalar operators for the training-data-pipeline
  * surface: language-ID, quality scoring, token counting, document
  * fingerprinting. All are row-local column expressions (no UDFs, no
  * shuffles — they stay inside whole-stage codegen and scale linearly
  * with input splits), built from deterministic md5-derived hashes so
  * Spark results hash-match the DuckDB oracle exactly.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * other non-space characters — the shape of a byte-pair pre-tokenizer
    * split, as a codegen'd regexp. */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
      .cast(LongType)

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic (tiny, embedded — a real deployment would load larger
    * profiles; the mechanism is what matters). */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein"),
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "有", "人"))

  /** Count of tokens contained in a fixed vocabulary. */
  def vocabHits(text: Column, vocab: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(vocab: _*))).cast(LongType)

  /** Language-ID: argmax of per-language stopword hits, ties resolved
    * to the alphabetically first language (deterministic). */
  def langId(text: Column): Column = {
    val scores = stopwords.map { case (lang, words) => lang -> vocabHits(text, words) }
    val best = greatest(scores.map(_._2): _*)
    // foldRight chains WHENs in list order → first (alphabetical) wins
    scores.foldRight(lit("und"): Column) { case ((lang, s), rest) =>
      when(s === best && best > 0, lit(lang)).otherwise(rest)
    }
  }

  /** Integer-exact quality components: chars, tokens, English-stopword
    * hits, punctuation (non-alphanumeric-space) chars. */
  def nChars(text: Column): Column = length(text).cast(LongType)
  def nPunct(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", "")))
      .cast(LongType)

  /** Quality score ×10⁴ in [0, 10000]: equal-weight blend of length
    * saturation (500 chars), stopword ratio, non-punctuation ratio, and
    * mean-word-length saturation (10 chars). All arithmetic is
    * double-identical between Spark and DuckDB (same expression shape),
    * floored to an exact integer. */
  def qualityScoreE4(text: Column): Column = {
    val nt = tokenCount(text)
    val nc = nChars(text)
    val stop = vocabHits(text, stopwords.flatMap(_._2).distinct)
    val punct = nPunct(text)
    val lenScore = least(nc.cast("double") / 500.0, lit(1.0))
    val stopScore = stop.cast("double") / nt.cast("double")
    val punctScore = lit(1.0) - punct.cast("double") / nc.cast("double")
    val awl = (nc - punct).cast("double") / nt.cast("double")
    val awlScore = least(awl / 10.0, lit(1.0))
    floor(lit(2500.0) * lenScore + lit(2500.0) * stopScore +
      lit(2500.0) * punctScore + lit(2500.0) * awlScore).cast(LongType)
  }

  /** Content fingerprint: md5 of the whitespace-normalized text —
    * the exact-dedup key in hash form. */
  def md5Fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** Rolling polynomial fingerprint over tokens:
    * `h ← (h·31 + hash60(tok) mod p) mod p`, p = 1e9+7 — an
    * order-sensitive document hash (same mechanism as a Rabin-Karp
    * rolling window), as a row-local array fold. */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text),
        t => conv(substring(md5(t), 1, 15), 16, 10).cast(LongType) % 1000000007L),
      lit(0L),
      (h, x) => (h * 31L + x) % 1000000007L)
}
