package graft

import graft.operators.StatOps
import graft.queries.Q.dec6
import org.apache.spark.sql.functions._

/** PAVA isotonic calibration (q276): hand-worked pooling against the
  * textbook example, the two PAVA invariants (monotone fit, mass
  * conservation), duplicate-score collapse, and the already-monotone
  * fixed point. The carrier for the rows-only gate entry. */
class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  private def fit(rows: Seq[(Double, Long)]) =
    StatOps.isotonicCalibration(rows.toDF("score", "label"), "score", "label",
        scoreOut = identity)
      .orderBy("score").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))

  test("adjacent violators pool to the weighted block mean") {
    // observed rates by score: 0.0 → 0.0, 0.25 → 1.0, 0.5 → 0.0, 0.75 → 1.0
    // PAVA pools the (1.0, 0.0) violation at scores {0.25, 0.5} → 0.5 each
    val rows = Seq((0.0, 0L), (0.25, 1L), (0.5, 0L), (0.75, 1L))
    val out = fit(rows)
    assert(out.map(_._4).toSeq == Seq(0.0, 0.5, 0.5, 1.0), out.mkString(","))
  }

  test("weighted pooling: heavier block pulls the pooled mean") {
    // score 0.2: 3 rows rate 1.0; score 0.4: 1 row rate 0.0 → pooled 3/4
    val rows = Seq((0.2, 1L), (0.2, 1L), (0.2, 1L), (0.4, 0L))
    val out = fit(rows)
    assert(out.length == 2) // distinct-support collapse
    assert(out(0) == ((0.2, 3L, 1.0, 0.75)) && out(1) == ((0.4, 1L, 0.0, 0.75)))
  }

  test("already-monotone rates are a fixed point; cascading merge works") {
    val mono = fit(Seq((0.1, 0L), (0.2, 0L), (0.3, 1L), (0.4, 1L)))
    assert(mono.map(_._4).toSeq == Seq(0.0, 0.0, 1.0, 1.0))
    // strictly decreasing rates collapse to ONE block = the global mean
    val dec = fit(Seq((0.1, 1L), (0.2, 1L), (0.3, 0L), (0.4, 0L)))
    assert(dec.map(_._4).distinct.toSeq == Seq(0.5))
  }

  test("gate-shaped data: monotone fit + mass conservation") {
    val docs = graft.sources.Tables.documents(spark, sfTiny)
      .select((length(col("text")) % 97 / lit(97.0)).as("q"),
        (col("doc_id") % 3 === 0).cast("long").as("keep"))
    val out = StatOps.isotonicCalibration(docs, "q", "keep", scoreOut = dec6)
      .orderBy("score")
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(3)))
    assert(out.length > 1)
    // monotone non-decreasing in score (rounded output → allow equal)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._3 + 1e-9, s"fit must be monotone: $a then $b")
    }
    // Σ n·iso ≈ Σ labels (mass conservation, up to dec6 output rounding)
    val mass = out.map(r => r._2 * r._3).sum
    val labels = docs.agg(sum("keep")).head.getLong(0).toDouble
    assert(math.abs(mass - labels) < 1e-3 * labels + 0.05,
      s"mass $mass vs labels $labels")
  }
}
