package graft.operators

import org.apache.spark.sql.DataFrame

/** Scoped rebalance for per-row-EXPENSIVE stages (interpreted HOF
  * shingling, tokenizer lambdas, regex): a small parquet input arrives as
  * ONE row group = one scan partition, serializing the stage on one core
  * (measured 6.6 s single-task vs 0.8 s spread at sf0.1). But a blanket
  * `repartition(defaultParallelism)` is NOT free on a pre-split corpus —
  * repartition() always round-robin-shuffles every row, and at 100 TB
  * that is a full shuffle of the raw text. So the spread is gated on the
  * input's actual partition count: only inputs narrower than half the
  * cluster's parallelism are rebalanced; a corpus that already arrives
  * with enough splits passes through untouched, zero shuffle. */
object Spread {

  /** Repartition `df` to `defaultParallelism` only if its current
    * partition count is below `defaultParallelism / 2` (i.e. the scan is
    * genuinely starved, not merely unaligned). Plan compilation only —
    * no job is triggered by the partition-count probe. */
  def ifNarrow(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(1, par / 2)) df.repartition(par)
    else df
  }
}
