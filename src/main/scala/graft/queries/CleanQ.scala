package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{CleanOps, SimilarityOps}
import Q.{dec6, r6}
import scala.collection.immutable.ListMap

/** Pre-tokenization corpus cleaning (PII redaction, C4 heuristics,
  * duplicate-line statistics) over the [[CorpusFixture]] enriched corpus,
  * plus int8 embedding quantization over the raw embeddings table. These
  * are the cleaning stages C4/Gopher/Dolma/RefinedWeb run ahead of
  * tokenization; every query is oracle-gated, with the fixture re-derived
  * inside the oracle SQL (KilnQ precedent). */
object CleanQ {

  val queries: ListMap[String, Q] = ListMap(

    // PII audit + redaction: counts on the original text, md5 of the
    // redacted artifact. The fixture plants one email / phone / IPv4 on
    // doc_id % 7/11/13 == 0 so every pattern binds (and most docs are
    // clean, like a real corpus).
    "q99_pii_redact" -> Q(
      (s, d) => CleanOps.piiScan(CorpusFixture.enriched(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH ${CorpusFixture.sql}
              |SELECT doc_id,
              |  len(regexp_extract_all(text, '${CleanOps.EmailRe}')) AS n_emails,
              |  len(regexp_extract_all(text, '${CleanOps.PhoneRe}')) AS n_phones,
              |  len(regexp_extract_all(text, '${CleanOps.IpRe}')) AS n_ips,
              |  md5(regexp_replace(regexp_replace(regexp_replace(text,
              |    '${CleanOps.EmailRe}', '<EMAIL>', 'g'),
              |    '${CleanOps.IpRe}', '<IP>', 'g'),
              |    '${CleanOps.PhoneRe}', '<PHONE>', 'g')) AS redacted_fp
              |FROM enr ORDER BY doc_id""".stripMargin)),

    // C4 line/document heuristics: ≥5-word terminal-punctuation lines, no
    // brace lines, no lorem-ipsum docs, ≥3 surviving lines. The fixture's
    // (doc_id + i) % 3 punctuation rule and % 17 / % 19 injections make
    // every rule bind on a known subset.
    "q100_c4_filter" -> Q(
      (s, d) => CleanOps.c4Filter(CorpusFixture.enriched(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH ${CorpusFixture.sql},
              |l AS (SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM enr),
              |k AS (SELECT doc_id,
              |  len(lines) AS n_lines,
              |  list_filter(lines, x -> len(string_split(x, ' ')) >= 5
              |    AND right(x, 1) IN ('.', '!', '?')
              |    AND NOT contains(x, '{')) AS kept,
              |  CAST(contains(text, 'lorem ipsum') AS INT) AS has_lorem
              |  FROM l)
              |SELECT doc_id, n_lines, len(kept) AS n_kept, has_lorem,
              |  CAST(has_lorem = 0 AND len(kept) >= 3 AS INT) AS doc_keep,
              |  md5(coalesce(array_to_string(kept, chr(10)), '')) AS clean_fp
              |FROM k ORDER BY doc_id""".stripMargin)),

    // Duplicate-line statistics: within-doc repeat fractions (line- and
    // char-weighted) plus the cross-document boilerplate fraction (the
    // shared lorem line lights it up corpus-wide). Spark ships 8-byte line
    // hashes through the shuffle; the oracle recomputes from the strings.
    "q101_dupline_stats" -> Q(
      (s, d) => {
        val st = CleanOps.dupLineStats(CorpusFixture.enriched(s, d), "doc_id", "text")
        st.select(
          col("doc_id"), col("n_lines"), col("n_distinct"),
          dec6(col("dup_line_frac")).as("dup_line_frac"),
          dec6(col("dup_char_frac")).as("dup_char_frac"),
          dec6(col("corpus_dup_frac")).as("corpus_dup_frac"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ${CorpusFixture.sql},
              |ln AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM enr),
              |pl AS (SELECT doc_id, line, count(*) AS cnt, len(line) AS len
              |  FROM ln GROUP BY doc_id, line),
              |sp AS (SELECT line, count(*) AS n_docs FROM pl GROUP BY line)
              |SELECT pl.doc_id,
              |  CAST(sum(cnt) AS BIGINT) AS n_lines,
              |  CAST(count(*) AS BIGINT) AS n_distinct,
              |  ${r6("(sum(cnt) - count(*)) / CAST(sum(cnt) AS DOUBLE)")} AS dup_line_frac,
              |  ${r6("CASE WHEN sum(cnt * len) > 0 THEN sum(CASE WHEN cnt > 1 THEN cnt * len ELSE 0 END) / CAST(sum(cnt * len) AS DOUBLE) ELSE 0.0 END")} AS dup_char_frac,
              |  ${r6("sum(CASE WHEN n_docs >= 2 THEN cnt ELSE 0 END) / CAST(sum(cnt) AS DOUBLE)")} AS corpus_dup_frac
              |FROM pl JOIN sp USING (line)
              |GROUP BY pl.doc_id ORDER BY pl.doc_id""".stripMargin)),

    // Symmetric int8 quantization of the embeddings table: scale, sum,
    // extrema, and saturation count per vector — linear scan, no shuffle.
    "q102_int8_quantize" -> Q(
      (s, d) => SimilarityOps.int8Quantize(Tables.embeddings(s, d), "vec_id", "embedding", dec6)
        .orderBy("vec_id"),
      Some(s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              |m AS (SELECT vec_id, v,
              |  list_max(list_transform(v, x -> abs(x))) AS max_abs FROM v),
              |s AS (SELECT vec_id, v, max_abs,
              |  CASE WHEN max_abs > 0 THEN 127.0 / max_abs ELSE 0.0 END AS scale FROM m),
              |q AS (SELECT vec_id, v, max_abs,
              |  list_transform(v, x -> CAST(floor(x * scale + 0.5) AS INT)) AS q FROM s)
              |SELECT vec_id,
              |  len(v) AS dim,
              |  ${r6("max_abs")} AS max_abs,
              |  CAST(list_sum(q) AS BIGINT) AS q_sum,
              |  list_min(q) AS q_min,
              |  list_max(q) AS q_max,
              |  len(list_filter(q, x -> abs(x) = 127)) AS n_sat
              |FROM q ORDER BY vec_id""".stripMargin)),

    // Duplicate-line REMOVAL over the enriched corpus — q101 measures the
    // signal, this applies the rewrite. Every doc gets its own first line
    // re-appended so each has at least one guaranteed within-doc repeat;
    // dedup keeps first occurrences in original order, zero shuffle (the
    // whole computation is per-row column algebra on both engines).
    "q115_dedup_lines" -> Q(
      (s, d) => {
        val withDup = CorpusFixture.enriched(s, d)
          .withColumn("text",
            concat_ws("\n", col("text"), element_at(split(col("text"), "\n"), 1)))
        CleanOps.dedupLines(withDup, "doc_id", "text")
          .orderBy("doc_id")
      },
      Some(s"""WITH ${CorpusFixture.sql},
              |wd AS (SELECT doc_id,
              |  text || chr(10) || string_split(text, chr(10))[1] AS text FROM enr),
              |l AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM wd),
              |k AS (SELECT doc_id, ls, list_filter(
              |  generate_series(1, len(ls)),
              |  i -> list_position(ls, ls[i]) = i) AS ki FROM l)
              |SELECT doc_id,
              |  len(ls) AS n_lines,
              |  len(ki) AS n_kept,
              |  array_to_string(list_transform(ki, i -> ls[i]), chr(10)) AS text_deduped
              |FROM k ORDER BY doc_id""".stripMargin)),

    // Unicode script composition: Latin/Cyrillic/CJK/Arabic/ASCII
    // fractions of non-whitespace codepoints — the script-mix signal for
    // wrong-language routing. Identical RE2/Java character classes on
    // both engines.
    "q160_script_mix" -> Q(
      (s, d) => CleanOps.scriptMix(Tables.documents(s, d), "doc_id", "text",
          scoreOut = Q.dec6)
        .orderBy("doc_id"),
      Some(s"""WITH x AS (SELECT doc_id, text,
              |  length(regexp_replace(text, '\\s', '', 'g')) AS nw FROM documents)
              |SELECT doc_id, CAST(nw AS BIGINT) AS n_chars,
              |  ${Q.r6("""CASE WHEN nw > 0 THEN CAST(length(regexp_replace(text,
              |    '[^a-zA-Z\x{00C0}-\x{024F}]', '', 'g')) AS DOUBLE) / nw
              |    ELSE 0.0 END""")} AS latin_frac,
              |  ${Q.r6("""CASE WHEN nw > 0 THEN CAST(length(regexp_replace(text,
              |    '[^\x{0400}-\x{04FF}]', '', 'g')) AS DOUBLE) / nw
              |    ELSE 0.0 END""")} AS cyrillic_frac,
              |  ${Q.r6("""CASE WHEN nw > 0 THEN CAST(length(regexp_replace(text,
              |    '[^\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}]', '', 'g')) AS DOUBLE) / nw
              |    ELSE 0.0 END""")} AS cjk_frac,
              |  ${Q.r6("""CASE WHEN nw > 0 THEN CAST(length(regexp_replace(text,
              |    '[^\x{0600}-\x{06FF}]', '', 'g')) AS DOUBLE) / nw
              |    ELSE 0.0 END""")} AS arabic_frac,
              |  ${Q.r6("""CASE WHEN nw > 0 THEN CAST(length(regexp_replace(text,
              |    '[^\x{21}-\x{7E}]', '', 'g')) AS DOUBLE) / nw
              |    ELSE 0.0 END""")} AS ascii_frac
              |FROM x ORDER BY doc_id""".stripMargin)),

    // Mojibake detection over deterministically damaged text (docs with
    // id % 9 = 0 get replacement chars, C1 controls and double-decode
    // digraphs appended — both engines inject the identical bytes):
    // decoder-damage triage before any text op trusts the content.
    "q161_mojibake_scan" -> Q(
      (s, d) => {
        val damage = lit("\u00C3\u00A9 \u00C2\u00B7 caf\uFFFD \u0085")
        val damaged = Tables.documents(s, d)
          .withColumn("text",
            when(col("doc_id") % 9 === 0, concat(col("text"), lit(" "), damage))
              .otherwise(col("text")))
        CleanOps.mojibakeScan(damaged, "doc_id", "text")
          .orderBy("doc_id")
      },
      Some("""WITH dmg AS (SELECT doc_id,
             |  CASE WHEN doc_id % 9 = 0 THEN text || ' ' ||
             |    chr(195) || chr(169) || ' ' || chr(194) || chr(183) ||
             |    ' caf' || chr(65533) || ' ' || chr(133)
             |  ELSE text END AS text FROM documents)
             |SELECT doc_id,
             |  CAST(length(text) - length(regexp_replace(text, '\x{FFFD}', '', 'g'))
             |    AS BIGINT) AS n_replacement,
             |  CAST(length(text) - length(regexp_replace(text, '[\x{80}-\x{9F}]', '', 'g'))
             |    AS BIGINT) AS n_c1,
             |  CAST((length(text) - length(regexp_replace(text,
             |    '[\x{C2}\x{C3}][\x{80}-\x{BF}]', '', 'g'))) // 2 AS BIGINT)
             |    AS n_mojibake_pairs,
             |  CAST((length(text) - length(regexp_replace(text, '\x{FFFD}', '', 'g')))
             |    + (length(text) - length(regexp_replace(text, '[\x{80}-\x{9F}]', '', 'g')))
             |    + (length(text) - length(regexp_replace(text,
             |      '[\x{C2}\x{C3}][\x{80}-\x{BF}]', '', 'g'))) // 2 > 0 AS INT) AS flagged
             |FROM dmg ORDER BY doc_id""".stripMargin))
  )
}
