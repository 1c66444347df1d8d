package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merkle-style bucket anti-entropy between two snapshots of a keyed
  * table — the incremental-sync primitive behind replica repair
  * (Dynamo/Cassandra) and cheap snapshot reconciliation: instead of the
  * full-table compare ([[CorpusOps.snapshotDiff]], which joins every id),
  * each side collapses to `buckets` (bucket, count, XOR-digest) rows in
  * ONE map-side-combinable aggregate, and only buckets whose summaries
  * disagree need a row-level rescan. At 100 TB that turns "join two
  * snapshots" into "compare two 64-row tables, then re-read only the
  * changed shards" — the digest tables are mergeable and can be stored
  * per partition as write-time metadata.
  *
  * Digests: bucket = first 16 bits of md5(id) mod `buckets` (portable id
  * arithmetic, never a partitioner-dependent hash); per-row contribution
  * = first 48 bits of md5(id ':' payload); bucket digest = BIT_XOR of
  * contributions — order-independent, overflow-free, self-inverse (equal
  * rows cancel, and ids are unique per snapshot). 48-bit row hashes are
  * the cross-engine-verifiable gate form; production would xor the full
  * 128-bit md5 in two lanes for collision headroom.
  */
object SyncOps {

  /** One snapshot's (bucket, n, digest) summary. */
  def bucketDigests(df: DataFrame, idCol: String, payloadCol: String,
                    buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= 65536, s"bad bucket count $buckets")
    val idStr = col(idCol).cast("string")
    val b = conv(substring(md5(idStr.cast("binary")), 1, 4), 16, 10)
      .cast("long") % buckets
    val h = conv(substring(md5(concat(idStr, lit(":"), col(payloadCol))
      .cast("binary")), 1, 12), 16, 10).cast("long")
    df.select(b.as("bucket"), h.as("__h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), expr("bit_xor(__h)").as("digest"))
  }

  /** Bucket-level diff of two snapshots: which buckets need a row-level
    * rescan. Joins the two `buckets`-row summaries full-outer — never the
    * row tables.
    *
    * Returns (bucket, n_old, n_new, digest_old, digest_new, differs). */
  def merkleDiff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
                 payloadCol: String, buckets: Int): DataFrame = {
    val da = bucketDigests(oldSnap, idCol, payloadCol, buckets)
      .select(col("bucket"), col("n").as("n_old"), col("digest").as("digest_old"))
    val db = bucketDigests(newSnap, idCol, payloadCol, buckets)
      .select(col("bucket"), col("n").as("n_new"), col("digest").as("digest_new"))
    da.join(db, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("digest_old"), lit(0L)).as("digest_old"),
        coalesce(col("digest_new"), lit(0L)).as("digest_new"),
        (coalesce(col("n_old"), lit(0L)) =!= coalesce(col("n_new"), lit(0L)) ||
          coalesce(col("digest_old"), lit(0L)) =!=
            coalesce(col("digest_new"), lit(0L))).cast("int").as("differs"))
  }
}
