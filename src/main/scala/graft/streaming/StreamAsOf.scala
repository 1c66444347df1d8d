package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of join — the event-time counterpart of the batch
  * [[graft.plans.AsOfJoin]] operator (SURVEY J6 over §2.11): each PROBE row
  * is answered with the latest REFERENCE row of the same key whose
  * timestamp is at or before the probe's (null value when none exists),
  * exactly like the reference's replay lookup, but over unbounded streams.
  *
  * Correctness contract (what makes this more than a toy):
  *  - A probe is emitted only once the event-time WATERMARK passes its
  *    timestamp. Until then a late reference row with a smaller timestamp
  *    could still arrive and change the answer — emitting eagerly would be
  *    nondeterministic under replay. This is the same completeness
  *    trigger Spark's own append-mode aggregates use.
  *  - Reference state is pruned per invocation to rows at or after the
  *    watermark PLUS the single newest row before it: that one row is the
  *    correct answer for any future probe that lands between it and the
  *    watermark, so state per key is O(rows inside the watermark window),
  *    never unbounded.
  *  - Both sides ride ONE union stream (side-tagged), so one
  *    flatMapGroupsWithState holds both buffers and no stream-stream join
  *    state is needed; everything is keyed, sorted per batch, and
  *    deterministic under replay.
  *
  * StreamAsOfSpec proves stream ≡ batch: the emitted rows match
  * [[graft.operators.TimeSeriesOps.asofJoinLast]] on the same closed
  * input, across multi-batch arrival orders with late reference rows. */
object StreamAsOf {

  case class TaggedRow(key: Long, ts: Timestamp, value: Double, is_ref: Boolean)
  case class AsOfState(refs: List[(Long, Double)], probes: List[Long])
  case class AsOfMatch(key: Long, ts: Timestamp, value: Option[Double])

  /** Tag + union the two sides. `refs`/`probes` are streaming frames with
    * (key, ts[, value]) columns; watermark applies to the union so both
    * sides share one lateness bound. */
  def tagged(refs: Dataset[_], probes: Dataset[_], keyCol: String, tsCol: String,
             valueCol: String, watermarkDelay: String): Dataset[TaggedRow] = {
    val spark = refs.sparkSession
    import spark.implicits._
    refs.toDF().select(col(keyCol).as("key"), col(tsCol).as("ts"),
        col(valueCol).cast("double").as("value"), lit(true).as("is_ref"))
      .unionByName(probes.toDF().select(col(keyCol).as("key"), col(tsCol).as("ts"),
        lit(0.0).as("value"), lit(false).as("is_ref")))
      .withWatermark("ts", watermarkDelay)
      .as[TaggedRow]
  }

  /** The stateful join itself. Emits one [[AsOfMatch]] per probe, in
    * watermark order per key.
    *
    * `refTtlMs` bounds reference retention: as-of semantics are a KV
    * lookup, so STRICT correctness requires keeping each key's newest
    * reference row forever — a probe may arrive years later and still
    * as-of to it — which means state grows with total key cardinality.
    * That is the semantic floor, not a leak, but key-churning workloads
    * need a bound: a survivor reference older than `watermark − refTtlMs`
    * is dropped (later probes for that key get null, exactly as if the
    * key had never been seen), the key's state is REMOVED when both
    * buffers empty, and an event-time timeout is registered for the
    * survivor's expiry so quiescent keys purge without new input. */
  def asofStream(spark: SparkSession, rows: Dataset[TaggedRow],
                 refTtlMs: Long = Long.MaxValue): Dataset[AsOfMatch] = {
    require(refTtlMs > 0, s"refTtlMs must be positive, got $refTtlMs")
    import spark.implicits._
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsOfState, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[TaggedRow], state: GroupState[AsOfState]) =>
          // getCurrentWatermarkMs() is 0 until the first watermark commits;
          // treating that 0 as a real watermark would classify pre-1970
          // probes (ts < 0) as ripe in their very first batch, before any
          // late reference row had a chance to arrive. Until a watermark is
          // established NOTHING is final: floor the ripeness/pruning bound
          // at Long.MinValue. (Spark exposes no has-watermark flag; a
          // genuine 0 watermark just delays finality by one batch.)
          val wmRaw = state.getCurrentWatermarkMs()
          val wm = if (wmRaw == 0L) Long.MinValue else wmRaw
          val prev = state.getOption.getOrElse(AsOfState(Nil, Nil))
          // merge the batch into the buffers (refs ascending by ts; probe
          // ts list unsorted until emission)
          var refs = prev.refs
          var probes = prev.probes
          if (!state.hasTimedOut) {
            val batch = it.toSeq
            refs = (refs ++ batch.filter(_.is_ref).map(r => (r.ts.getTime, r.value)))
              .sortBy(_._1)
            probes = probes ++ batch.filter(!_.is_ref).map(_.ts.getTime)
          }
          // a probe is final once the watermark passed it STRICTLY: a ref
          // with ts == wm is not late (Spark drops only ts < wm) and could
          // still arrive, so ts == wm probes stay buffered. Answer from
          // the refs buffer (latest at-or-before), emit in ts order.
          val (ripe, young) = probes.partition(_ < wm)
          val out = ripe.sorted.map { pts =>
            val hit = refs.takeWhile(_._1 <= pts).lastOption
            AsOfMatch(key, new Timestamp(pts), hit.map(_._2))
          }
          // prune refs: everything at/after the watermark stays; of the
          // older rows only the newest can still answer a future probe —
          // kept until the TTL expires it
          val expiry = if (refTtlMs == Long.MaxValue) Long.MinValue else wm - refTtlMs
          val (old, live) = refs.partition(_._1 < wm)
          val kept = old.lastOption.filter(_._1 >= expiry).toList ++ live
          if (kept.isEmpty && young.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(AsOfState(kept, young))
            // wake up when the watermark passes the oldest pending probe
            // (so buffered probes drain even if the key goes quiet), or at
            // the survivor ref's TTL expiry (so idle keys purge); the
            // timeout must sit strictly above the current watermark
            val probeWake = if (young.nonEmpty) Some(young.min) else None
            // saturating add: a large finite TTL on a recent ref would
            // overflow Long and register an immediate (pre-watermark) wake
            val ttlWake = if (refTtlMs != Long.MaxValue && kept.nonEmpty) {
              val base = kept.map(_._1).max
              val sum = base + refTtlMs
              Some(if (sum < base) Long.MaxValue else sum) // refTtlMs > 0
            } else None
            // the clamp floor uses the RAW watermark — Spark validates the
            // timeout against it, and wm may be the MinValue sentinel here
            (probeWake ++ ttlWake).minOption.foreach(t =>
              state.setTimeoutTimestamp(math.max(t, wmRaw + 1)))
          }
          out.iterator
      }
  }
}
