package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table co-location — the mechanism behind every "at 100 TB,
  * bucket this table by its join key" scaladoc in the repo
  * (DedupOps.incrementalDedup's fp index, minhashBands' (band, bh) index,
  * CorpusOps' base-side joins), made concrete and machine-verified:
  * writing both sides of a recurring equi-join with the SAME bucket count
  * and keys lets Spark's FileSourceScanExec report the bucket spec as its
  * output partitioning, so the join plans with ZERO Exchange nodes — the
  * shuffle that dominates a petabyte join simply disappears, and only the
  * within-bucket sort (or nothing, with sortBy) remains.
  * BucketedJoinSpec pins the no-Exchange plan property.
  *
  * Bucket-count discipline at scale: pick counts so one bucket ≈ one
  * task's worth of data (e.g. 100 TB / 512 MB ≈ 200k buckets is too many
  * files per partition-day — bucket WITHIN date partitions instead), and
  * keep the count IDENTICAL across tables that join; Spark only elides
  * the exchange when the bucket specs match. */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed (and sorted) by
    * `keys` — the persisted form a recurring join's both sides should
    * share. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String]): Unit = {
    require(buckets >= 1 && keys.nonEmpty, "need buckets >= 1 and keys")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }
}
