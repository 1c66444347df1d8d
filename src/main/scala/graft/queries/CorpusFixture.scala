package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deterministic ENRICHED corpus derived from `documents.parquet`: the raw
  * testdata texts are single-line lowercase word soup, which cannot exercise
  * line-oriented cleaning (C4 heuristics, duplicate-line statistics) or PII
  * redaction. Following the KilnFixture precedent, this fixture derives the
  * missing structure from the testdata itself with integer-modular rules
  * only, so the DuckDB oracle can re-derive the exact same bytes:
  *
  *  - the token stream is re-chunked into 8-token lines; line `i` of doc
  *    `d` ends with '.' iff `(d + i) % 3 != 0` (≈2/3 "sentences", the rest
  *    the terminal-punctuation failures C4 filters on);
  *  - `doc_id % 17 == 0` prepends a boilerplate "lorem ipsum…" line (the
  *    same string corpus-wide — also the cross-document duplicate-line
  *    signal), `% 19 == 0` appends a code-looking `{`-brace line;
  *  - `doc_id % 7/11/13 == 0` append lines carrying a synthetic email /
  *    phone / IPv4 derived from doc_id — the PII the redactor must find.
  *
  * [[sql]] is the DuckDB CTE mirror; queries over the fixture prepend it to
  * their oracle. Keep the two derivations in lockstep. */
object CorpusFixture {

  val lineTokens = 8
  val lorem = "lorem ipsum dolor sit amet consectetur adipiscing elit."
  val braceLine = "function() { return 0; }"

  /** documents + `text` rebuilt as newline-joined enriched lines
    * (columns: doc_id, lang, source, text). */
  def enriched(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val toks = split(trim(col("text")), "\\s+")
    val nLines = ceil(size(col("t")) / lit(lineTokens.toDouble)).cast("int")
    val body = transform(sequence(lit(0), nLines - 1), i =>
      concat(
        array_join(slice(col("t"), i * lineTokens + 1, lit(lineTokens)), " "),
        when((id + i) % 3 =!= 0, lit(".")).otherwise(lit(""))))
    val empty = array().cast("array<string>")
    def iff(cond: Column, line: Column) = when(cond, array(line)).otherwise(empty)
    val idS = id.cast("string")
    val lines = concat(
      iff(id % 17 === 0, lit(lorem)),
      body,
      iff(id % 7 === 0, concat_ws("", lit("contact user"), idS, lit(" at user"), idS,
        lit("@example.com now."))),
      iff(id % 11 === 0, concat_ws("", lit("call 555-"),
        lpad((id % 10000).cast("string"), 4, "0"), lit(" today."))),
      iff(id % 13 === 0, concat_ws("", lit("server at 10."), (id % 256).cast("string"),
        lit("."), ((id * 7) % 256).cast("string"),
        lit("."), ((id * 13) % 256).cast("string"), lit(" responded."))),
      iff(id % 19 === 0, lit(braceLine)))
    Tables.documents(s, dir)
      .withColumn("t", toks)
      .select(id, col("lang"), col("source"), array_join(lines, "\n").as("text"))
  }

  /** DuckDB mirror of [[enriched]] as a CTE chain ending in `enr(doc_id,
    * lang, source, text)`. Prepend with `WITH` (and chain further CTEs
    * after it with a comma). Concatenation operators sit at line ENDS: this
    * constant is interpolated into oracle strings that call `.stripMargin`
    * AFTER interpolation, and a continuation line starting with `||` would
    * lose its first pipe to the margin strip. */
  val sql: String =
    s"""toks AS (SELECT doc_id, lang, source,
       |  string_split_regex(trim(text), '\\s+') AS t FROM documents),
       |body AS (SELECT doc_id, lang, source,
       |  list_transform(generate_series(0, CAST(ceil(len(t) / $lineTokens.0) AS INT) - 1),
       |    i -> concat(array_to_string(t[i*$lineTokens+1:i*$lineTokens+$lineTokens], ' '),
       |                CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END)) AS lines
       |  FROM toks),
       |enr AS (SELECT doc_id, lang, source, array_to_string(
       |  (CASE WHEN doc_id % 17 = 0 THEN ['$lorem'] ELSE [] END) ||
       |  lines ||
       |  (CASE WHEN doc_id % 7 = 0 THEN ['contact user' || CAST(doc_id AS VARCHAR) ||
       |     ' at user' || CAST(doc_id AS VARCHAR) || '@example.com now.'] ELSE [] END) ||
       |  (CASE WHEN doc_id % 11 = 0 THEN ['call 555-' ||
       |     lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today.'] ELSE [] END) ||
       |  (CASE WHEN doc_id % 13 = 0 THEN ['server at 10.' || CAST(doc_id % 256 AS VARCHAR) ||
       |     '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ||
       |     '.' || CAST((doc_id * 13) % 256 AS VARCHAR) || ' responded.'] ELSE [] END) ||
       |  (CASE WHEN doc_id % 19 = 0 THEN ['$braceLine'] ELSE [] END), chr(10)) AS text
       |  FROM body)""".stripMargin
}
