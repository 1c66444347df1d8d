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

  /** The q209 gate matrix, rebuilt with the identical steps (ffill →
    * pivot → complete-rows filter → deterministic md5 dropout). */
  private def gateMatrix = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val types = Seq("click", "error", "purchase", "signup", "view")
    val wS = Window.partitionBy("event_type").orderBy("ts")
    val filled = graft.queries.TimeSeriesQ.aligned(spark, sfTiny)
      .withColumn("vf", graft.operators.WindowOps.ffill(col("v"), wS))
    val wide = filled.groupBy(col("ts").as("h"))
      .pivot("event_type", types).agg(first("vf"))
      .filter(types.map(t => col(t).isNotNull).reduce(_ && _))
    val hs = (unix_micros(col("h")) / lit(3600000000L)).cast("long")
    wide.withColumn("click",
      when(conv(substring(md5(hs.cast("string")), 1, 1), 16, 10)
        .cast("int") < 2, lit(null).cast("double"))
        .otherwise(col("click")))
  }

  test("LSH-prefiltered impute equals the exact estimator on the q209 gate matrix") {
    val feats = Seq("error", "purchase", "signup", "view")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.get(0), r.getInt(2)) -> r.getDouble(1)).toMap
    val exact = collect(ImputeOps.knnImputeColumn(
      gateMatrix, "h", feats, "click", k = 5, dec6))
    val lsh = collect(ImputeOps.knnImputeColumnLsh(
      gateMatrix, "h", feats, "click", k = 5, dec6,
      nPlanes = 3, seed = 1L, probeHamming = 2))
    assert(exact.keySet == lsh.keySet, "row sets must agree")
    val diffs = exact.collect {
      case (k0, v) if math.abs(lsh(k0) - v) > 1e-9 => (k0, v, lsh(k0)) }
    assert(diffs.isEmpty, s"bucketed != exact on: ${diffs.take(5)}")
    assert(exact.keys.exists(_._2 == 1), "fixture must contain missing rows")
  }

  test("probeHamming = nPlanes degrades to the exact estimator by construction") {
    val out = ImputeOps.knnImputeColumnLsh(rows, "id", Seq("x"), "t", k = 2,
      dec6, nPlanes = 2, seed = 11L, probeHamming = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(99L) - 15.0) < 1e-6, s"imputed ${out(99L)}")
  }
}
