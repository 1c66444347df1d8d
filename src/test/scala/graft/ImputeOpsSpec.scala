package graft

import graft.operators.ImputeOps
import graft.queries.Q.dec6

/** KNN imputation boundaries: exact neighbor means on a planted fixture,
  * k exceeding the complete set, and untouched complete rows. */
class ImputeOpsSpec extends SparkSpec {
  import spark.implicits._

  // feature space is 1-D ("x"); row 99 is missing its target. Its 2
  // nearest complete rows by |x| distance are x=1 (t=10) and x=2 (t=20).
  private val rows = Seq(
    (1L, 1.0, Some(10.0)), (2L, 2.0, Some(20.0)), (3L, 8.0, Some(80.0)),
    (99L, 0.0, Option.empty[Double])
  ).toDF("id", "x", "t")

  test("imputes the mean of the k nearest complete rows") {
    val out = ImputeOps.knnImputeColumn(rows, "id", Seq("x"), "t", k = 2, dec6)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(99L).getInt(2) == 1)
    assert(math.abs(out(99L).getDouble(1) - 15.0) < 1e-6,
      s"imputed ${out(99L).getDouble(1)}")
    // complete rows pass through unchanged and unflagged
    Seq(1L -> 10.0, 2L -> 20.0, 3L -> 80.0).foreach { case (id, v) =>
      assert(out(id).getInt(2) == 0 && math.abs(out(id).getDouble(1) - v) < 1e-6)
    }
  }

  test("k larger than the complete set averages what exists") {
    val out = ImputeOps.knnImputeColumn(rows, "id", Seq("x"), "t", k = 50, dec6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = (10.0 + 20.0 + 80.0) / 3
    assert(math.abs(out(99L) - want) < 1e-4, s"imputed ${out(99L)} want $want")
  }
}
