package graft

import graft.operators.{CorpusOps, SyncOps}
import org.apache.spark.sql.functions._

/** The anti-entropy guarantee: every row the full snapshot diff reports
  * as added/removed/changed lives in a bucket merkleDiff flags, and no
  * flagged-clean bucket hides a change — so rescanning ONLY differing
  * buckets reproduces the full diff. Plus the identity case (equal
  * snapshots → zero flagged buckets). */
class SyncOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = graft.sources.Tables.documents(spark, sfTiny)

  test("differing buckets cover exactly the changed rows; clean buckets hide none") {
    val v1 = docs.filter(col("doc_id") % 23 =!= 1)
    val v2 = docs.filter(col("doc_id") % 29 =!= 2)
      .withColumn("text", when(col("doc_id") % 31 === 0,
        concat(col("text"), lit(" rev2"))).otherwise(col("text")))
    val flagged = SyncOps.merkleDiff(v1, v2, "doc_id", "text", buckets = 64)
      .filter(col("differs") === 1)
      .select("bucket").as[Long].collect().toSet
    // ground truth from the row-level diff
    val changedIds = CorpusOps.snapshotDiff(v1, v2, "doc_id", "text")
      .filter(col("status") =!= "unchanged")
      .select("doc_id").as[Long].collect().toSet
    assert(changedIds.nonEmpty, "fixture must plant changes")
    // the same bucket function the operator uses, replayed per id
    def bucketOf(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 64
    }
    val changedBuckets = changedIds.map(bucketOf)
    assert(changedBuckets.subsetOf(flagged),
      s"changes outside flagged buckets: ${changedBuckets -- flagged}")
    // completeness of the flag: a clean bucket contains no changed id
    val cleanWithChanges = changedBuckets -- flagged
    assert(cleanWithChanges.isEmpty)
    // and flagging is not vacuous (some buckets must be clean)
    assert(flagged.size < 64, s"all 64 buckets flagged: not discriminating")
  }

  test("identical snapshots produce zero flagged buckets") {
    val out = SyncOps.merkleDiff(docs, docs, "doc_id", "text", buckets = 64)
    assert(out.filter(col("differs") === 1).count() == 0)
    // and counts reconcile: sum of per-bucket n equals the table size
    val n = out.agg(sum("n_old"), sum("n_new")).head()
    assert(n.getLong(0) == docs.count() && n.getLong(1) == docs.count())
  }
}
