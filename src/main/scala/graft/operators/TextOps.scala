package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, quality scoring, language-ID heuristics and
  * document fingerprinting. All pure Catalyst expressions (split / higher-
  * order array functions / regexp) — no UDFs, so they stay inside
  * WholeStageCodegen and scale linearly with the documents scan. */
object TextOps {

  /** Whitespace tokenizer. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Word n-gram shingles (contiguous, space-joined). Empty array when the
    * document has fewer than `n` tokens — Spark's `sequence(1, 0)` would
    * count DOWN, so the guard is semantic, not just defensive. */
  def shingles(toks: Column, n: Int): Column = {
    val idx = sequence(lit(1), size(toks) - lit(n - 1))
    val make = transform(idx, i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*))
    when(size(toks) >= n, make).otherwise(array())
  }

  /** Distinct shingle set (for Jaccard / MinHash).
    *
    * NOTE: `toks` must be a *bound attribute* (a materialized column), not an
    * inline `tokens(text)` expression — the shingle lambda references it per
    * index, and an inline `split` would be re-evaluated for every element_at
    * (≈3× shingle-count regex splits per document; measured 13× slower). */
  def shingleSet(toks: Column, n: Int): Column = array_distinct(shingles(toks, n))

  /** Token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Count of tokens contained in a fixed marker set (stopwords / language
    * markers). */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  /** Normalized text: lowercase, collapsed whitespace — the canonical form
    * for exact-dup hashing. */
  def normalize(c: Column): Column = lower(trim(regexp_replace(c, "\\s+", " ")))

  /** MD5 content fingerprint of the normalized text. */
  def fingerprint(c: Column): Column = md5(normalize(c).cast("binary"))

  /** Order-insensitive "bag" fingerprint: MD5 of the sorted distinct token
    * set — catches word-reordered near-dups. */
  def bagFingerprint(c: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(normalize(c)))), " ").cast("binary"))

  /** Language markers for the n-gram-free language-ID heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "la", "les", "et"),
    "es" -> Seq("el", "los", "las", "y"))

  /** Deterministic arg-max language prediction from marker counts; ties
    * resolve in fixed en > de > fr > es order. */
  def predictLang(sEn: Column, sDe: Column, sFr: Column, sEs: Column): Column =
    when(sEn >= greatest(sDe, sFr, sEs), "en")
      .when(sDe >= greatest(sFr, sEs), "de")
      .when(sFr >= sEs, "fr")
      .otherwise("es")
}
