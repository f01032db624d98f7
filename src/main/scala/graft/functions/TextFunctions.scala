package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines: tokenizing,
  * n-gram shingling, language-ID scoring, quality metrics, fingerprinting.
  * Pure Catalyst expressions (split/regexp/HOFs) — codegen-friendly, no
  * UDFs, and every construct has an exact ANSI-SQL twin for the oracle.
  */
object TextFunctions {

  /** Whitespace tokens (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Regex word tokens — the "BPE-ish" lexer split: letter runs, digit
    * runs, or single non-alphanumeric symbols. */
  val wordPattern = "[a-z]+"
  val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def wordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(wordPattern), lit(0)))

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(bpePattern), lit(0)))

  /** k-word shingles from a token array: ["a","b","c","d"], k=3 →
    * ["a b c","b c d"]. Returns distinct shingles.
    *
    * Built with zip_with over shifted slices, NOT element_at inside a
    * transform lambda: lambda-captured outer expressions are re-evaluated
    * per element in interpreted HOF eval, which turns an O(n) shingle pass
    * into O(n²)·(cost of toks). Pass an *attribute* column (bind the
    * split() to a column first) for the same reason. */
  def shingles(toks: Column, k: Int): Column =
    array_distinct(shinglesAll(toks, k))

  /** Like [[shingles]] but keeps every occurrence (and its order) — for
    * operators that count intra-document repeats (e.g. repeated-passage
    * detection), where collapsing duplicates would lose the signal. */
  def shinglesAll(toks: Column, k: Int): Column = {
    val n = size(toks)
    val joined = (2 to k).foldLeft(toks) { (acc, j) =>
      zip_with(acc, slice(toks, lit(j), greatest(n - j + 1, lit(0))),
        (a, b) => when(a.isNull || b.isNull, lit(null)).otherwise(concat(a, lit(" "), b)))
    }
    filter(joined, x => x.isNotNull)
  }

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. (zh uses romanized function words so the `\b`-delimited
    * count works on space-separated corpora.) */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "una"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "ein", "mit"),
    "zh" -> Seq("de", "le", "shi", "zai", "wo", "you", "he", "ni"))

  /** Count of matches of any word in `words` (word-boundary delimited). */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(regexp_extract_all(lower(text), lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))

  /** Argmax language by stopword hits; ties resolve in `stopwords` order.
    * Heuristic n-gram language ID — scalable because it is a pure
    * per-row projection (no shuffle, no model). */
  def langId(text: Column): Column = {
    val scores = stopwords.map { case (lang, words) => lang -> stopwordHits(text, words) }
    scores.tail.foldLeft((scores.head._2, lit(scores.head._1))) {
      case ((bestScore, bestLang), (lang, score)) =>
        (greatest(bestScore, score),
          when(score > bestScore, lang).otherwise(bestLang))
    }._2
  }

  /** Quality metrics: token count, mean token length, stopword ratio,
    * punctuation ratio, and a blended [0,1] score. */
  def nTokens(text: Column): Column = size(tokens(text))
  def meanTokenLen(text: Column): Column =
    (length(text) - nTokens(text) + 1).cast("double") / nTokens(text).cast("double")
  def stopwordRatio(text: Column): Column =
    stopwordHits(text, stopwords.flatMap(_._2).distinct).cast("double") / nTokens(text).cast("double")
  def punctRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0))).cast("double") / length(text).cast("double")

  /** Canonical-form document fingerprint: md5 of (lowercased, trimmed,
    * whitespace-collapsed) text — the exact-dedup key that survives
    * formatting noise. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))
}
