package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.SaxOps
import scala.collection.immutable.ListMap

/** SAX symbolization suite — the representation layer of the data-series
  * indexing literature (iSAX family): per-(series, day) SAX words over the
  * hourly grid, and word-bucket motif candidate pairs (the same
  * bucketed-equi-join candidate shape as the text/embedding dedup ops,
  * applied to subsequences). Both oracle-checked: symbols are categorical,
  * so the DuckDB mirror only has to reproduce the arithmetic up to the
  * breakpoint CASE, which both engines compute over identical doubles. */
object SaxQ {

  private val bp = SaxOps.Breakpoints(4)

  private def saxSql: String = {
    val sym = s"""CASE WHEN z < ${bp(0)} THEN 'a' WHEN z < ${bp(1)} THEN 'b'
                 |    WHEN z < ${bp(2)} THEN 'c' ELSE 'd' END""".stripMargin
    // the ffilled dense grid (WindowQ.sqlSeries): every hour populated per
    // type once the series starts, so day windows are complete and every
    // (type, day) yields a word — the raw hourly table leaves most days
    // with observation gaps and produces almost no complete windows
    s"""${WindowQ.sqlSeries},
       |dense AS (SELECT ts, event_type, v FROM series WHERE v IS NOT NULL),
       |seg AS (SELECT event_type, date_trunc('day', ts) AS win,
       |    CAST(floor(hour(ts) / 3) AS BIGINT) AS s,
       |    sum(v) AS segsum, sum(v * v) AS segsumsq, count(v) AS segn
       |  FROM dense GROUP BY 1, 2, 3),
       |day_stats AS (SELECT event_type, win,
       |    sum(segn) AS n, sum(segsum) AS vsum, sum(segsumsq) AS vsumsq
       |  FROM seg GROUP BY 1, 2),
       |z AS (SELECT seg.event_type, seg.win, seg.s,
       |    CASE WHEN sqrt(greatest(vsumsq / 24 - (vsum / 24) * (vsum / 24), 0.0)) > 1e-12
       |         THEN (segsum / 3 - vsum / 24) /
       |              sqrt(greatest(vsumsq / 24 - (vsum / 24) * (vsum / 24), 0.0))
       |         ELSE 0.0 END AS z
       |  FROM seg JOIN day_stats
       |    ON seg.event_type = day_stats.event_type AND seg.win = day_stats.win
       |  WHERE n = 24),
       |words AS (SELECT event_type, strftime(win, '%Y-%m-%d') AS win,
       |    string_agg($sym, '' ORDER BY s) AS sax_word
       |  FROM z GROUP BY event_type, win)""".stripMargin
  }

  /** Spark side shared by both queries: daily 8-segment alphabet-4 words
    * over the ffilled dense hourly grid (WindowQ.series). */
  private def words(s: org.apache.spark.sql.SparkSession, d: String) =
    SaxOps.saxWords(
      WindowQ.series(s, d).filter(col("v").isNotNull),
      Seq("event_type"), date_trunc("day", col("ts")), hour(col("ts")), col("v"),
      windowLen = 24, segments = 8, alphabet = 4)
      .select(col("event_type"), date_format(col("win"), "yyyy-MM-dd").as("win"),
        col("sax_word"))

  val queries: ListMap[String, Q] = ListMap(
    // Per-(series, day) SAX words: z-normalize the day, PAA into 8
    // three-hour buckets, Gaussian-breakpoint letters.
    "q108_sax_words" -> Q(
      (s, d) => words(s, d).orderBy("event_type", "win"),
      Some(s"""WITH $saxSql
              |SELECT event_type, win, sax_word FROM words
              |ORDER BY event_type, win""".stripMargin)),

    // Motif candidates: day-windows sharing an identical word — the
    // iSAX-style bucket join (equi-join on the compact key, never
    // all-pairs distance).
    "q109_sax_motifs" -> Q(
      (s, d) => {
        val ws = words(s, d)
        val a = ws.toDF("type_a", "day_a", "sax_word")
        val b = ws.toDF("type_b", "day_b", "sax_word")
        a.join(b, Seq("sax_word"))
          .filter(col("type_a") < col("type_b") ||
            (col("type_a") === col("type_b") && col("day_a") < col("day_b")))
          .select("sax_word", "type_a", "day_a", "type_b", "day_b")
          .orderBy("sax_word", "type_a", "day_a", "type_b", "day_b")
      },
      Some(s"""WITH $saxSql
              |SELECT a.sax_word AS sax_word, a.event_type AS type_a, a.win AS day_a,
              |       b.event_type AS type_b, b.win AS day_b
              |FROM words a JOIN words b ON a.sax_word = b.sax_word
              | AND (a.event_type < b.event_type
              |   OR (a.event_type = b.event_type AND a.win < b.win))
              |ORDER BY sax_word, type_a, day_a, type_b, day_b""".stripMargin))
  )
}
