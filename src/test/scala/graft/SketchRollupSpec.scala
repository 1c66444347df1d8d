package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** DataSketches HLL rollup (q106): the union of per-day sketches IS the
  * single-pass sketch (register-wise max is order-free and lossless), and
  * the estimate lands within the lgK=12 error envelope of the exact
  * distinct count. */
class SketchRollupSpec extends SparkSpec {

  test("daily-sketch union equals the single-pass sketch exactly; estimate is accurate") {
    val ev = Tables.events(spark, sfTiny)
    val viaDays = ev
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est"))
      .head.getLong(0)
    val onePass = ev
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("est"))
      .head.getLong(0)
    assert(viaDays == onePass,
      s"sketch algebra must be lossless: union-of-days $viaDays != one-pass $onePass")
    val exact = ev.select("user_id").distinct().count()
    val relErr = math.abs(viaDays - exact).toDouble / exact
    // lgK=12 standard error is ~1.6%; 5% leaves margin without hiding bugs
    assert(relErr < 0.05, s"estimate $viaDays vs exact $exact (relErr $relErr)")
  }

  test("sketch union is order-insensitive (shuffle-safe aggregation)") {
    val ev = Tables.events(spark, sfTiny)
    def est(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))))
      .head.getLong(0)
    assert(est(ev) == est(ev.orderBy(col("user_id").desc, col("ts"))),
      "estimate must not depend on input order")
  }
}
