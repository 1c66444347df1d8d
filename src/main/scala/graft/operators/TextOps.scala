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

  /** Readability statistics as a struct (n_sentences, n_words,
    * n_syllables, flesch, fk_grade): Flesch reading ease and
    * Flesch–Kincaid grade from three linear regex counts —
    * sentences = terminal-punctuation runs `[.!?]+`, words = whitespace
    * tokens, syllables = vowel-group runs `[aeiouy]+` (the standard cheap
    * syllable proxy; no silent-e handling — documented heuristic, both
    * engines count the same runs). All three counts floor at 1 so the
    * ratios are total. Pure codegen'd regexp over one scan — the curation
    * signal that separates "readable prose" from word soup at the same
    * length/stopword profile. */
  def readability(text: Column): Column = {
    val sen = greatest(regexp_count(text, lit("[.!?]+")), lit(1)).cast("double")
    val words = greatest(size(tokens(text)), lit(1)).cast("double")
    val syl = greatest(regexp_count(lower(text), lit("[aeiouy]+")), lit(1))
      .cast("double")
    struct(
      sen.cast("long").as("n_sentences"),
      words.cast("long").as("n_words"),
      syl.cast("long").as("n_syllables"),
      (lit(206.835) - lit(1.015) * words / sen - lit(84.6) * syl / words)
        .as("flesch"),
      (lit(0.39) * words / sen + lit(11.8) * syl / words - lit(15.59))
        .as("fk_grade"))
  }

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

  /** Distinct HASHED shingle set: `xxhash64` the n consecutive tokens
    * directly — no shingle string is ever concatenated or allocated.
    * Multi-argument xxhash64 chains each field's hash as the next field's
    * SEED, so ("ab","c") and ("a","bc") hash apart where plain
    * concatenated-byte hashing could not tell them apart.
    * Same bound-attribute requirement as [[shingleSet]]. */
  def hashedShingleSet(toks: Column, n: Int): Column = {
    val idx = sequence(lit(1), size(toks) - lit(n - 1))
    val make = transform(idx, i => xxhash64((0 until n).map(j => element_at(toks, i + lit(j))): _*))
    array_distinct(when(size(toks) >= n, make).otherwise(array().cast("array<bigint>")))
  }

  /** POSITIONAL hashed shingles: one element per n-gram position, duplicates
    * kept (unlike [[hashedShingleSet]]) — the granularity of repeated-
    * substring measurement, where a gram occurring at three positions is
    * three positions of duplicated text, not one set member. */
  def hashedShingleSeq(toks: Column, n: Int): Column = {
    val idx = sequence(lit(1), size(toks) - lit(n - 1))
    val make = transform(idx, i => xxhash64((0 until n).map(j => element_at(toks, i + lit(j))): _*))
    when(size(toks) >= n, make).otherwise(array().cast("array<bigint>"))
  }

  /** Token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Allocation-free native token count ([[graft.functions.TokenCount]]),
    * bit-compatible with [[tokenCount]] (PropertySpec fuzzes the
    * identity). Callers must have run `VectorFunctions.register`. For
    * consumers that need ONLY the count (weights, packing budgets), this
    * skips materializing one UTF8String per token. */
  def tokenCountFast(c: Column): Column =
    call_function("graft_token_count", c)

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

  /** Hashes of every k-token gram, in document order — the winnowing
    * input. `toks` must be a bound attribute (see [[shingleSet]]'s note). */
  def gramHashes(toks: Column, k: Int): Column =
    transform(shingles(toks, k), g => xxhash64(g))

  /** md5-derived 60-bit gram hashes (15 hex digits) — the oracle-parity
    * twin of [[gramHashes]]: an external SQL engine reproduces the values
    * bit-for-bit (the q114 bucket-hash discipline), at ~2-3× the hash
    * cost. Production swaps [[gramHashes]] (xxhash64) back in — every
    * consumer only compares hashes for equality/minimum, never reads
    * their bits. */
  def gramHashesMd5(toks: Column, k: Int): Column =
    transform(shingles(toks, k),
      g => conv(substring(md5(g), 1, 15), 16, 10).cast("bigint"))

  /** Winnowing document sketch (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    * MOSS algorithm): slide a window of `w` consecutive gram hashes, keep
    * each window's minimum, dedup. The guarantee: two documents sharing a
    * run of ≥ w+k−1 tokens share at least one selected fingerprint, while
    * only ~2/(w+1) of gram hashes survive — a size-bounded sketch whose
    * shared-member equi-join finds overlapping-passage near-dups that
    * whole-document Jaccard misses. Pure builtins, fully codegen'd.
    *
    * `grams` must be a MATERIALIZED [[gramHashes]] column (a bound
    * attribute): the window lambda references it once per window, so an
    * inline expression would rebuild the whole gram array ~n times per
    * document — the repo's documented HOF re-expansion pitfall (measured
    * here too: ~3× at sf0.1 from binding it). */
  def winnowMins(grams: Column, w: Int): Column = {
    val nWin = size(grams) - lit(w - 1)
    val mins = transform(sequence(lit(1), nWin), i => array_min(slice(grams, i, lit(w))))
    // short docs (fewer than w grams but ≥1): keep the global min — the
    // paper's convention that every non-empty document has a sketch
    when(nWin >= 1, array_distinct(mins))
      .when(size(grams) >= 1, array(array_min(grams)))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Fraction of the document occupied by its single most frequent token —
    * the Gopher-style repetition signal (boilerplate and degenerate docs
    * score high). O(|distinct| · |tokens|) per document in pure HOFs; fine
    * for the ≤ thousands-of-tokens documents this targets. `toks` must be
    * a bound attribute (see [[shingleSet]]). */
  def topTokenFrac(toks: Column): Column =
    when(size(toks) > 0,
      array_max(transform(array_distinct(toks),
        x => size(filter(toks, y => y === x)))) / size(toks))

  /** Fraction of 2-grams that are repeats of an earlier 2-gram in the same
    * document (Gopher's duplicate-n-gram fraction, n=2): a high value means
    * looping/templated text. `toks` must be a bound attribute. */
  def dupBigramFrac(toks: Column): Column = {
    val g = shingles(toks, 2)
    when(size(g) > 0, (size(g) - size(array_distinct(g))) / size(g))
  }

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
