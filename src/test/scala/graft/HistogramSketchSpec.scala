package graft

import org.apache.spark.sql.functions._
import graft.functions.{HistogramSketch, VectorFunctions}
import graft.operators.EventOps

/** Guarantees of the mergeable histogram quantile sketch (the q141 gate is
  * rows-only): one-bin-width error vs the exact quantile, byte-exact
  * sketch-level merge ≡ one pass, repartition invariance, range-edge
  * clamping, and empty-sketch null. */
class HistogramSketchSpec extends SparkSpec {
  import spark.implicits._

  private val bins = 1000
  private val lo = 0.0
  private val hi = 500.0
  private val binW = (hi - lo) / bins

  test("quantile estimates are within one bin width of the exact quantile") {
    VectorFunctions.register(spark)
    val ev = graft.sources.Tables.events(spark, sfTiny)
      .select(col("value").cast("double").as("v"))
    val row = ev.agg(
      call_function("graft_hist_agg", col("v"), lit(bins), lit(lo), lit(hi)).as("sk"),
      expr("percentile(v, 0.5)").as("e50"),
      expr("percentile(v, 0.9)").as("e90"),
      expr("percentile(v, 0.99)").as("e99")).head()
    val sk = row.getAs[Array[Byte]](0)
    for ((q, exact) <- Seq(0.5 -> row.getDouble(1), 0.9 -> row.getDouble(2),
        0.99 -> row.getDouble(3))) {
      val est = HistogramSketch.quantile(sk, q).asInstanceOf[Double]
      assert(math.abs(est - exact) <= binW + 1e-9,
        s"q=$q: estimate $est vs exact $exact exceeds bin width $binW")
    }
  }

  test("sketch-level merge of daily sketches equals the one-pass sketch, byte for byte") {
    VectorFunctions.register(spark)
    val ev = graft.sources.Tables.events(spark, sfTiny)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("value").cast("double").as("v"))
    val daily = ev.groupBy("day")
      .agg(call_function("graft_hist_agg", col("v"), lit(bins), lit(lo), lit(hi)).as("sk"))
      .collect().map(_.getAs[Array[Byte]]("sk"))
    val onePass = ev
      .agg(call_function("graft_hist_agg", col("v"), lit(bins), lit(lo), lit(hi)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    assert(EventOps.mergeSketches(daily.toSeq).sameElements(onePass),
      "merged daily sketches must equal the one-pass sketch exactly")
  }

  test("sketch bytes are invariant under repartitioning") {
    VectorFunctions.register(spark)
    val ev = graft.sources.Tables.events(spark, sfTiny)
      .select(col("value").cast("double").as("v"))
    def sk(df: org.apache.spark.sql.DataFrame) = df
      .agg(call_function("graft_hist_agg", col("v"), lit(bins), lit(lo), lit(hi)))
      .head().getAs[Array[Byte]](0)
    assert(sk(ev).sameElements(sk(ev.repartition(13))))
  }

  test("out-of-range mass clamps to the range edges; empty sketch probes null") {
    VectorFunctions.register(spark)
    val df = Seq(-5.0, -1.0, 2.0, 600.0).toDF("v")
    val sk = df.agg(call_function("graft_hist_agg", col("v"),
      lit(10), lit(0.0), lit(10.0))).head().getAs[Array[Byte]](0)
    // 2 of 4 values are underflow → p25 resolves to lo; overflow → p99 to hi
    assert(HistogramSketch.quantile(sk, 0.25) == 0.0)
    assert(HistogramSketch.quantile(sk, 0.99) == 10.0)
    val empty = spark.emptyDataset[Double].toDF("v")
      .agg(call_function("graft_hist_agg", col("v"), lit(10), lit(0.0), lit(10.0)))
      .head().getAs[Array[Byte]](0)
    assert(HistogramSketch.quantile(empty, 0.5) == null)
    // the probe expression agrees with the library call (codegen path)
    val probed = df.agg(call_function("graft_hist_agg", col("v"),
        lit(10), lit(0.0), lit(10.0)).as("sk"))
      .select(call_function("graft_hist_quantile", col("sk"), lit(0.25)))
      .head().getDouble(0)
    assert(probed == 0.0)
  }
}
