package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval / range joins — the reference's event-labeling machinery
  * (SURVEY §2.5 J3-J5): timeline × event windows, look-back labeling.
  *
  * Scale design: the interval side (accretion_events analogue) is tiny, so
  * we force `broadcast()` — the non-equi condition then runs as a
  * BroadcastNestedLoopJoin where every big-side partition streams once past
  * the in-memory interval list; no shuffle of the big side at all. If the
  * interval side ever grows large, switch to bucketed range binning (map
  * each side to overlapping time buckets, equi-join on bucket, post-filter).
  */
object JoinOps {

  /** Point-in-interval left join: rows of `facts` matched to intervals where
    * `lo <= facts.ts < hi` (reference `create_target_variables`,
    * `pre_processing.py:1443-1562`). `intervals` is broadcast. */
  def pointInInterval(facts: DataFrame, intervals: DataFrame,
                      factTs: Column, lo: Column, hi: Column,
                      joinType: String = "left"): DataFrame =
    facts.join(broadcast(intervals), factTs >= lo && factTs < hi, joinType)

  /** Point-in-interval join via RANGE BINNING — the large-large scale path
    * [[pointInInterval]]'s scaladoc promises: when the interval side is too
    * big to broadcast, a BroadcastNestedLoopJoin is impossible and a plain
    * non-equi join degenerates to a cartesian product. Instead, quantize
    * time into `binSeconds`-wide bins: each interval is exploded to every
    * bin it overlaps, each fact maps to exactly ONE bin, and the join
    * becomes a hash equi-join on the bin id with the exact
    * `lo <= ts < hi` predicate as a post-filter. Because a fact has a
    * single bin, a matching (fact, interval) pair meets in exactly one bin
    * — no duplicate elimination pass is needed.
    *
    * Scale contract: both sides shuffle ONCE on an 8-byte bin key; the
    * interval side is amplified by its bins-per-interval factor
    * (`len/binSeconds + 1` rows per interval), so pick `binSeconds` near
    * the MEDIAN interval length — smaller bins cost interval duplication,
    * larger bins cost post-filter selectivity (more non-matching pairs per
    * bucket). A pathologically long interval (span ≫ bin) amplifies
    * linearly; cap it by clamping spans upstream or raising `binSeconds`.
    * Empty intervals (`hi <= lo`) contain no points and are dropped.
    *
    * Inner join only, by design: the reference's labeling composition
    * (q26) recovers unmatched keys with a cheap equi join-back against the
    * interval list, which is the right shape at 100 TB too (the join-back
    * key set is tiny after aggregation). */
  def binnedRangeJoin(facts: DataFrame, intervals: DataFrame,
                      factTs: Column, lo: Column, hi: Column,
                      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    val binUs = binSeconds * 1000000L
    // floor division in PURE LONG arithmetic: the double form
    // floor(us / binUs) loses exactness once |us| outgrows 2^53 µs, and a
    // boundary fact rounded into the wrong bin is a silently MISSED match
    // (the post-filter only removes false positives). Truncating integral
    // division is corrected to floor for negative (pre-1970) timestamps.
    def floorDiv(u: Column): Column = {
      val q = call_function("div", u, lit(binUs))
      when(u < 0 && u % binUs =!= 0, q - 1).otherwise(q)
    }
    def bin(c: Column) = floorDiv(unix_micros(c.cast("timestamp")))
    // hi is exclusive: the last occupied bin is the one holding hi - 1µs
    val iv = intervals
      .filter(hi > lo)
      .withColumn("__bin",
        explode(sequence(bin(lo), floorDiv(unix_micros(hi.cast("timestamp")) - 1))))
    // the interval side broadcasts (tiny), so the fact side streams at
    // scan parallelism — spread a narrow single-row-group scan or the
    // whole bin+join+filter pipeline runs single-task (guide §2.5)
    Spread.ifNarrow(facts).withColumn("__bin", bin(factTs))
      .join(iv, Seq("__bin"))
      .filter(factTs >= lo && factTs < hi)
      .drop("__bin")
  }

  /** Look-back window join: flag fact rows within `hours` *before* an event
    * timestamp (reference `accretion_next_{24,48,72}h`,
    * `simple_pre_processing.py:520-535`). */
  def lookbackFlag(facts: DataFrame, events: DataFrame,
                   factTs: Column, eventTs: Column, hours: Int): DataFrame = {
    val cond = factTs >= eventTs - expr(s"INTERVAL $hours HOURS") && factTs < eventTs
    facts.join(broadcast(events), cond, "left")
  }

  /** Native as-of join through the custom operator
    * ([[graft.plans.AsOfJoin]] → [[graft.plans.AsOfJoinExec]]): for each
    * left row, the latest right row at-or-before its timestamp per key;
    * `valueCols` from the right are appended (null when none). Registers
    * the planner strategy on the session (idempotent). Same semantics as
    * [[graft.operators.TimeSeriesOps.asofJoinLast]] (cross-validated in
    * spec + oracle), but a single forward merge pass per partition with
    * O(1) state instead of the union-then-window formulation.
    *
    * `rightTiebreak`: with duplicate right timestamps per key, the row
    * with the MAX tiebreak wins — resolved by the operator's required
    * sort ordering, so the right side needs no dedup pre-aggregation
    * (which would cost a second shuffle: hash(keys, ts) partitioning
    * from a groupBy cannot serve the merge's hash(keys) distribution). */
  def asofJoinNative(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String,
                     valueCols: Seq[String],
                     rightTiebreak: Seq[String] = Nil): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    val lp = left.queryExecution.analyzed
    val rpRaw = right.queryExecution.analyzed
    // Self-join safety: if the right plan shares lineage with the left, a
    // rightValues attribute whose exprId also occurs in left.output would
    // make AsOfJoinExec's output projection bind that slot to the LEFT
    // row's column — silently returning left-side values. Re-alias the
    // whole right output to fresh exprIds (what DeduplicateRelations does
    // for built-in joins) whenever the two outputs intersect.
    val rp: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
      if (rpRaw.outputSet.intersect(lp.outputSet).nonEmpty)
        org.apache.spark.sql.catalyst.plans.logical.Project(
          rpRaw.output.map(a =>
            org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rpRaw)
      else rpRaw
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name)
        .getOrElse(sys.error(s"column $name not found in ${plan.output.map(_.name)}"))
    org.apache.spark.sql.GraftSqlShim.ofRows(spark,
      graft.plans.AsOfJoin(lp, rp,
        keys.map(attr(lp, _)), keys.map(attr(rp, _)),
        attr(lp, leftTs), attr(rp, rightTs),
        valueCols.map(attr(rp, _)),
        rightTiebreak.map(attr(rp, _))))
  }

  /** Severity curve for active intervals: `((t - t0) / (t1 - t0)) ^ 1.5`
    * (reference `get_active_accretions`, `data_generator.py:131-151`). */
  def severity(t: Column, t0: Column, t1: Column): Column = {
    val el  = (unix_timestamp(t)  - unix_timestamp(t0)).cast("double")
    val tot = (unix_timestamp(t1) - unix_timestamp(t0)).cast("double")
    when(tot > 0, pow(least(el / tot, lit(1.0)), 1.5)).otherwise(lit(null))
  }
}
