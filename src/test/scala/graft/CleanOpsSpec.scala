package graft

import org.apache.spark.sql.functions._
import graft.operators.{CleanOps, SimilarityOps}
import graft.queries.{CorpusFixture, Q}

/** Edge semantics of the corpus-cleaning operators (q99-q102 oracle-check
  * the corpus paths; these pin crafted-input behavior). */
class CleanOpsSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces emails, phones, and IPs with typed placeholders") {
    val out = Seq("write bob.smith@corp.example.org or call 555-0199, host 192.168.1.12 up")
      .toDF("text").select(CleanOps.redactPii(col("text"))).as[String].head()
    assert(out == "write <EMAIL> or call <PHONE>, host <IP> up")
  }

  test("piiScan counts every occurrence and leaves clean text untouched") {
    val df = Seq(
      (0L, "a@b.io and c@d.net meet at 10.0.0.1"), // 2 emails, 1 ip
      (1L, "no pii here at all"))
      .toDF("doc_id", "text")
    val rows = CleanOps.piiScan(df, "doc_id", "text").orderBy("doc_id").collect()
    assert(rows(0).getAs[Int]("n_emails") == 2)
    assert(rows(0).getAs[Int]("n_phones") == 0)
    assert(rows(0).getAs[Int]("n_ips") == 1)
    assert(rows(1).getAs[Int]("n_emails") == 0 && rows(1).getAs[Int]("n_ips") == 0)
    // clean doc: redaction is the identity, so fp == md5(original)
    val cleanFp = df.filter($"doc_id" === 1)
      .select(md5($"text".cast("binary"))).as[String].head()
    assert(rows(1).getAs[String]("redacted_fp") == cleanFp)
  }

  test("c4Filter keeps >=5-word terminal-punctuation lines, drops brace lines and lorem docs") {
    val good = "one two three four five."   // kept
    val short = "one two three."            // < 5 words
    val noPunct = "one two three four five" // no terminal punctuation
    val brace = "if (x) { return y; } done."// contains '{'
    val df = Seq(
      (0L, Seq(good, short, noPunct, brace, good, good).mkString("\n")), // 3 kept -> keep
      (1L, Seq(good, good).mkString("\n")),                              // 2 kept -> drop
      (2L, Seq("lorem ipsum filler.", good, good, good).mkString("\n"))) // lorem -> drop
      .toDF("doc_id", "text")
    val rows = CleanOps.c4Filter(df, "doc_id", "text").orderBy("doc_id").collect()
    assert(rows(0).getAs[Int]("n_lines") == 6 && rows(0).getAs[Int]("n_kept") == 3)
    assert(rows(0).getAs[Int]("doc_keep") == 1)
    assert(rows(1).getAs[Int]("n_kept") == 2 && rows(1).getAs[Int]("doc_keep") == 0)
    assert(rows(2).getAs[Int]("has_lorem") == 1 && rows(2).getAs[Int]("doc_keep") == 0)
    // the cleaned artifact is exactly the kept lines re-joined
    val expect = spark.range(1)
      .select(md5(lit(Seq(good, good, good).mkString("\n")).cast("binary"))).as[String].head()
    assert(rows(0).getAs[String]("clean_fp") == expect)
  }

  test("dupLineStats separates within-doc repeats from cross-corpus boilerplate") {
    val df = Seq(
      (0L, "header\nbody a\nbody a\nbody b"), // 1 within-doc repeat, header shared
      (1L, "header\nbody c\nbody d"))         // no repeats, header shared
      .toDF("doc_id", "text")
    val m = CleanOps.dupLineStats(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(0L).getAs[Long]("n_lines") == 4 && m(0L).getAs[Long]("n_distinct") == 3)
    assert(m(0L).getAs[Double]("dup_line_frac") == 0.25)
    // duplicated chars: "body a" x2 = 12 of the doc's 4 x 6 = 24 chars
    assert(m(0L).getAs[Double]("dup_char_frac") == 12.0 / 24.0)
    // "header" is in both docs: 1 of doc 1's 3 lines is corpus-duplicated
    assert(m(1L).getAs[Double]("corpus_dup_frac") == 1.0 / 3.0)
    assert(m(1L).getAs[Double]("dup_line_frac") == 0.0)
  }

  test("int8Quantize maps max|x| to ±127, zero vectors to zeros, and counts saturation") {
    val df = Seq(
      (0L, Seq(0.5f, -1.0f, 0.25f)), // scale 127: -> 64, -127, 32
      (1L, Seq(0.0f, 0.0f)))         // zero vector -> all zeros, no saturation
      .toDF("vec_id", "embedding")
    val rows = SimilarityOps.int8Quantize(df, "vec_id", "embedding", Q.dec6)
      .orderBy("vec_id").collect()
    assert(rows(0).getAs[Int]("q_min") == -127 && rows(0).getAs[Int]("q_max") == 64)
    assert(rows(0).getAs[Long]("q_sum") == (64 - 127 + 32).toLong)
    assert(rows(0).getAs[Int]("n_sat") == 1)
    assert(rows(1).getAs[Long]("q_sum") == 0L && rows(1).getAs[Int]("n_sat") == 0)
    assert(rows(1).getAs[Double]("max_abs") == 0.0)
  }

  test("enriched fixture plants PII and boilerplate on the documented residues") {
    val e = CorpusFixture.enriched(spark, sfTiny).cache()
    val withEmail = e.filter($"doc_id" % 7 === 0)
      .filter($"text".rlike(CleanOps.EmailRe)).count()
    assert(withEmail == e.filter($"doc_id" % 7 === 0).count())
    assert(e.filter($"doc_id" % 7 =!= 0).filter($"text".rlike(CleanOps.EmailRe)).count() == 0)
    val loremDocs = e.filter($"text".contains(CorpusFixture.lorem)).count()
    assert(loremDocs == e.filter($"doc_id" % 17 === 0).count())
    e.unpersist()
  }

  test("scriptMix: pure-script strings score ~1.0 in their class, 0 elsewhere") {
    val rows = Seq(
      (1L, "hello plain words"),                       // latin + ascii
      (2L, "\u043f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440"), // cyrillic
      (3L, "\u4f60\u597d\u4e16\u754c"),                    // cjk
      (4L, "   ")                                      // whitespace only
    ).toDF("doc_id", "text")
    val m = CleanOps.scriptMix(rows, "doc_id", "text", Q.dec6)
      .orderBy("doc_id").collect()
    assert(m(0).getDouble(2) == 1.0 && m(0).getDouble(6) == 1.0) // latin, ascii
    assert(m(1).getDouble(3) == 1.0 && m(1).getDouble(2) == 0.0) // cyrillic
    assert(m(2).getDouble(4) == 1.0)                             // cjk
    assert(m(3).getLong(1) == 0L && m(3).getDouble(2) == 0.0)    // empty: all zero
  }

  test("mojibakeScan: damaged text flagged with exact counts; clean text is not") {
    val rows = Seq(
      (1L, "caf\u00C3\u00A9 ok"),              // one double-decode pair
      (2L, "bad \uFFFD twice \uFFFD"),          // two replacement chars
      (3L, "c1 \u0085 control"),               // one C1 control
      (4L, "perfectly clean text")
    ).toDF("doc_id", "text")
    val m = CleanOps.mojibakeScan(rows, "doc_id", "text").orderBy("doc_id").collect()
    assert(m(0).getLong(3) == 1L && m(0).getInt(4) == 1)
    assert(m(1).getLong(1) == 2L && m(1).getInt(4) == 1)
    assert(m(2).getLong(2) == 1L && m(2).getInt(4) == 1)
    assert(m(3).getLong(1) == 0L && m(3).getLong(2) == 0L &&
      m(3).getLong(3) == 0L && m(3).getInt(4) == 0)
  }
}
