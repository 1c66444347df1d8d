package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-cleaning operators every large-scale training-data pipeline runs
  * before tokenization: PII redaction, C4-style heuristic line/document
  * filtering (Raffel et al. 2020 §2.2), and duplicate-line statistics
  * (Rae et al. 2021 "Gopher" §A1.1 repetition filters; RefinedWeb's
  * cross-document line dedup). All are single linear scans or one
  * hash-partitioned shuffle on an 8-byte line key — no all-pairs work, so
  * the shapes hold at 100 TB.
  *
  * Regex patterns are written in the RE2-compatible subset (no lookaround,
  * no backreferences) so Java (Spark) and RE2 (DuckDB oracle) agree. */
object CleanOps {

  /** PII patterns. Deliberately simple published shapes (the C4/Dolma
    * cleaning rules use the same character-class approach): lowercase
    * emails, NANP-style 3-4 digit phone fragments, dotted-quad IPv4. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Replace every email/IP/phone with a typed placeholder token. Email
    * first (it can contain dotted digits), then IP (a dotted quad contains
    * no dashes), then phone — each later pattern cannot match inside an
    * already-substituted placeholder. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        IpRe, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-document PII counts (on the ORIGINAL text) plus the md5 of the
    * redacted text — the audit row a redaction pass emits at scale. */
  def piiScan(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      regexp_count(col(textCol), lit(EmailRe)).as("n_emails"),
      regexp_count(col(textCol), lit(PhoneRe)).as("n_phones"),
      regexp_count(col(textCol), lit(IpRe)).as("n_ips"),
      md5(redactPii(col(textCol)).cast("binary")).as("redacted_fp"))

  /** C4-style heuristic cleaning (Raffel et al. 2020 §2.2) over
    * newline-separated documents, all in whole-stage-codegen'd HOFs:
    * keep a line iff it has ≥ `minWords` words, ends in terminal
    * punctuation, and has no `{` (code smell); drop the whole document if
    * it mentions "lorem ipsum" or keeps fewer than `minLines` lines.
    * Emits per-doc counters, the keep decision, and the md5 of the cleaned
    * text so the decision AND the artifact are both verifiable. */
  def c4Filter(docs: DataFrame, idCol: String, textCol: String,
               minWords: Int = 5, minLines: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l =>
      size(split(l, " ")) >= minWords &&
        substring(l, -1, 1).isin(".", "!", "?") &&
        !l.contains("{"))
    docs
      .select(
        col(idCol),
        size(lines).as("n_lines"),
        size(kept).as("n_kept"),
        col(textCol).contains("lorem ipsum").cast("int").as("has_lorem"),
        array_join(kept, "\n").as("clean"))
      .select(
        col(idCol), col("n_lines"), col("n_kept"), col("has_lorem"),
        (col("has_lorem") === 0 && col("n_kept") >= minLines).cast("int").as("doc_keep"),
        md5(col("clean").cast("binary")).as("clean_fp"))
  }

  /** Duplicate-line statistics, within-document AND cross-corpus, in one
    * shuffle on an 8-byte line hash:
    *
    *  - `dup_line_frac`  — fraction of the doc's lines that are repeats of
    *    an earlier identical line in the SAME doc (Gopher's
    *    duplicate-line-fraction filter);
    *  - `dup_char_frac`  — fraction of characters living in those
    *    duplicated lines (Gopher's character-weighted variant);
    *  - `corpus_dup_frac` — fraction of the doc's lines that also occur in
    *    at least one OTHER document (RefinedWeb's cross-document line
    *    dedup signal — boilerplate headers/footers at web scale).
    *
    * Lines travel the shuffle as xxhash64 keys, never as strings; at
    * 64 bits a billion-line corpus sees ~0.03 expected collisions per
    * 10^9 lines — production at 100 TB should widen to a 128-bit key
    * (e.g. two seeded xxhash64 lanes) if exactness matters. */
  /** Unicode-script composition per document: fractions of Latin,
    * Cyrillic, CJK, Arabic codepoints and of ASCII overall — the script-
    * mix signal behind wrong-language routing and spam detection (a
    * "Latin-labeled" page that is 40% Cyrillic is mislabeled or
    * adversarial). Pure column algebra over regexp class counts: one
    * linear scan, zero shuffle, and the class definitions are identical
    * RE2/Java ranges so the oracle agrees bit-for-bit.
    *
    * Returns (id, n_chars, latin_frac, cyrillic_frac, cjk_frac,
    * arabic_frac, ascii_frac) — fractions of the NON-whitespace count,
    * 0.0 for whitespace-only text. */
  def scriptMix(docs: DataFrame, idCol: String, textCol: String,
                scoreOut: Column => Column): DataFrame = {
    def classCount(ranges: String): Column =
      length(regexp_replace(col(textCol), s"[^$ranges]", ""))
    val nonWs = length(regexp_replace(col(textCol), "\\s", ""))
    def frac(c: Column): Column =
      scoreOut(when(nonWs > 0, c.cast("double") / nonWs).otherwise(lit(0.0)))
    // six full-text regex passes per row: spread the narrow gate scan so
    // they run at cluster parallelism (guide §2.5)
    Spread.ifNarrow(docs.select(col(idCol), col(textCol))).select(col(idCol),
      nonWs.cast("long").as("n_chars"),
      frac(classCount("a-zA-Z\\u00C0-\\u024F")).as("latin_frac"),
      frac(classCount("\\u0400-\\u04FF")).as("cyrillic_frac"),
      frac(classCount("\\u4E00-\\u9FFF\\u3040-\\u30FF")).as("cjk_frac"),
      frac(classCount("\\u0600-\\u06FF")).as("arabic_frac"),
      frac(classCount("\\x21-\\x7E")).as("ascii_frac"))
  }

  /** Mojibake / encoding-damage detection: counts of the Unicode
    * replacement character (U+FFFD — a decoder already gave up), C1
    * control codepoints (U+0080-U+009F — the signature of cp1252 bytes
    * read as latin-1), and the classic UTF-8-as-latin-1 double-decode
    * digraphs (Ã + a continuation-range char, Â + punctuation range).
    * Row-local regexp counts, zero shuffle; flagged = any signal > 0.
    *
    * Returns (id, n_replacement, n_c1, n_mojibake_pairs, flagged). */
  def mojibakeScan(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def cnt(pattern: String): Column =
      (length(col(textCol)) - length(regexp_replace(col(textCol), pattern, "")))
    val nRepl = cnt("\\uFFFD").cast("long")
    // each pair is 2 chars; count pairs, not chars
    val nPairs = (cnt("[\\u00C2\\u00C3][\\u0080-\\u00BF]") / 2).cast("long")
    val nC1 = cnt("[\\u0080-\\u009F]").cast("long")
    docs.select(col(idCol),
      nRepl.as("n_replacement"), nC1.as("n_c1"), nPairs.as("n_mojibake_pairs"),
      ((nRepl + nC1 + nPairs) > 0).cast("int").as("flagged"))
  }

  def dupLineStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ln = docs.select(col(idCol), explode(split(col(textCol), "\n")).as("line"))
      .select(col(idCol), xxhash64(col("line")).as("lh"), length(col("line")).as("len"))
    // one row per (doc, distinct line): repeat count and line length
    val perLine = ln.groupBy(col(idCol), col("lh"))
      .agg(count(lit(1)).as("cnt"), first(col("len")).as("len"))
    // docs-per-line across the corpus (perLine is already distinct per doc,
    // so count(*) == count of distinct docs containing the line)
    val spread = perLine.groupBy("lh").agg(count(lit(1)).as("n_docs"))
    val denomCh = sum(col("cnt") * col("len"))
    perLine.join(spread, "lh")
      .groupBy(idCol)
      .agg(
        sum("cnt").as("n_lines"),
        count(lit(1)).as("n_distinct"),
        ((sum("cnt") - count(lit(1))) / sum("cnt")).as("dup_line_frac"),
        when(denomCh > 0,
          sum(when(col("cnt") > 1, col("cnt") * col("len")).otherwise(0L)) / denomCh)
          .otherwise(lit(0.0)).as("dup_char_frac"),
        (sum(when(col("n_docs") >= 2, col("cnt")).otherwise(0L)) / sum("cnt"))
          .as("corpus_dup_frac"))
  }

  /** Duplicate-line REMOVAL (the rewrite behind [[dupLineStats]]'s
    * signal): keep each document's first occurrence of every line, drop
    * later repeats, reassemble in original order. This is the C4/
    * RefinedWeb within-document line dedup applied as a transform rather
    * than a filter.
    *
    * Deliberately ZERO-shuffle: a document's lines live in one row, so
    * first-occurrence dedup is pure column algebra — keep position `i`
    * iff `array_position(lines, lines[i]) == i` — fully codegen'd and
    * embarrassingly parallel, where the window formulation
    * (`row_number() over (id, line)`) would shuffle the entire corpus
    * text twice for a per-row computation. The O(L²) per-document scan is
    * bounded by line count, not corpus size; a pathological million-line
    * document should be length-capped upstream anyway. */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keepIdx = filter(
      sequence(lit(1), size(col("__l"))),
      i => array_position(col("__l"), element_at(col("__l"), i)) === i.cast("long"))
    docs
      .select(col(idCol), split(col(textCol), "\n").as("__l"))
      .select(col(idCol), col("__l"), keepIdx.as("__k"))
      .select(col(idCol),
        size(col("__l")).as("n_lines"),
        size(col("__k")).as("n_kept"),
        array_join(transform(col("__k"), i => element_at(col("__l"), i)), "\n")
          .as("text_deduped"))
  }
}
