package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.TextOps
import Q.{dec6, r6}
import scala.collection.immutable.ListMap

/** Composite flagships beyond q70: the full training-data cleaning flow and
  * the approximate-aggregate scale path. */
object FlagshipQ {

  val queries: ListMap[String, Q] = ListMap(

    // End-to-end corpus cleaning: quality-filter (length + stopword
    // heuristics) → exact-dedup keep-list → per-language corpus stats.
    // The canonical pre-training data pipeline, fully oracle-checked.
    "q71_corpus_clean" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d).withColumn("t", TextOps.tokens(col("text")))
        val stop = Seq("a", "the", "and", "of", "in", "to")
        val nStop = TextOps.markerCount(col("t"), stop)
        // `_rid` (non-deterministic, always >= 0) makes the scored projection
        // a pushdown barrier: PushPredicateThroughNonJoin refuses to push
        // predicates through a non-deterministic project, so the quality
        // filter evaluates against the BOUND n_tokens/stop_ratio attributes
        // instead of being alias-substituted into 3 inline split(text) copies
        // per row (measured: 6 splits/row without the barrier, 1 with).
        // Referencing _rid in the filter keeps ColumnPruning from deleting it
        // (which would re-enable the pushdown). Results are unchanged.
        val scored = docs
          .withColumn("n_tokens", size(col("t")))
          .withColumn("stop_ratio", nStop / size(col("t")))
          .withColumn("_rid", monotonically_increasing_id())
          .filter(col("n_tokens") >= 20 && col("stop_ratio") < 0.5 &&
            col("_rid") >= 0)
          .drop("_rid")
        val keep = scored
          .withColumn("fp", TextOps.fingerprint(col("text")))
          .withColumn("canon", min("doc_id").over(Window.partitionBy("fp")))
          .filter(col("doc_id") === col("canon"))
        keep.groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum("n_tokens").as("total_tokens"),
          dec6(avg("n_tokens")).as("avg_tokens"),
          dec6(avg("stop_ratio")).as("avg_stop_ratio"))
          .orderBy("lang")
      },
      Some(s"""WITH scored AS (
              |  SELECT doc_id, lang, text,
              |    len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
              |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
              |      x -> x IN ('a', 'the', 'and', 'of', 'in', 'to'))) AS DOUBLE)
              |      / len(string_split_regex(trim(text), '\\s+')) AS stop_ratio
              |  FROM documents),
              |filtered AS (SELECT * FROM scored WHERE n_tokens >= 20 AND stop_ratio < 0.5),
              |keep AS (SELECT *, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
              |  FROM filtered
              |  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY fp))
              |SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
              |${r6("avg(n_tokens)")} AS avg_tokens,
              |${r6("avg(stop_ratio)")} AS avg_stop_ratio
              |FROM keep GROUP BY lang ORDER BY lang""".stripMargin)),

    // The 100 TB statistics path: sketch-based aggregates
    // (approx_count_distinct / percentile_approx) replacing the exact A5/O5
    // operators. Sketch values are engine-specific → rows-only check; the
    // exact twins (q07/q17) stay oracle-verified.
    "q47_approx_stats" -> Q(
      (s, d) => Tables.lineitem(s, d).agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        approx_count_distinct(col("l_suppkey"), 0.02).as("approx_supps"),
        dec6(expr("percentile_approx(l_extendedprice, 0.5, 1000)")).as("p50_approx"),
        dec6(expr("percentile_approx(l_extendedprice, 0.99, 1000)")).as("p99_approx"),
        count(lit(1)).as("n_rows"))),

    // MERGEABLE-sketch rollup (DataSketches HLL): per-day user sketches,
    // then the corpus-wide distinct via hll_union_agg over the 30 daily
    // sketches — NO rescan of the raw events. This is the incremental
    // pattern a 100 TB log pipeline lives on: materialize kilobyte
    // sketches per partition/day, answer any day-range distinct query by
    // unioning sketches. Register-wise max means the union is EXACTLY the
    // single-pass sketch (pinned in SketchRollupSpec, with accuracy vs the
    // exact count); rows-only here since no other engine reproduces the
    // estimate bit-for-bit.
    "q106_hll_rollup" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
        val perDay = daily.select(col("day").cast("string").as("day"),
          hll_sketch_estimate(col("sk")).as("users_est"))
        val total = daily.agg(hll_union_agg(col("sk"), lit(false)).as("u"))
          .select(lit("ALL").as("day"), hll_sketch_estimate(col("u")).as("users_est"))
        perDay.unionByName(total).orderBy("day")
      })
  )
}
