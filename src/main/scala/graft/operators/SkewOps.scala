package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY §4 / the 100 TB design rules):
  * salted two-phase aggregation — partial aggregates over (key, salt)
  * spread a hot key across `nSalts` reducers, then a cheap second hash agg
  * over the tiny partial results combines them. Exact for algebraic
  * aggregates (sum/count/min/max, and avg via sum+count).
  *
  * AQE's skew-join handling covers JOIN skew automatically; this covers
  * AGGREGATION skew, which AQE does not rebalance. */
object SkewOps {

  /** Deterministic per-row salt: hash of EVERY column, mod nSalts. A
    * nondeterministic source (monotonically_increasing_id, rand) used as
    * a shuffle partition key re-salts rows differently on stage retry —
    * the classic lost/duplicated-row hazard — so the salt must be a pure
    * function of row content. Identical duplicate rows share a salt;
    * spreading relies on rows of a hot key differing in SOME column,
    * which any real fact row (measures, timestamps) does. */
  private def rowSalt(df: DataFrame, nSalts: Int): Column =
    pmod(hash(df.columns.map(col): _*), lit(nSalts))

  /** Salted exact aggregation: `aggs` maps output name -> (partial, combine)
    * column builders. Convenience constructors below cover the common ones. */
  def saltedAgg(df: DataFrame, keys: Seq[String], nSalts: Int,
                aggs: Seq[SaltedAgg]): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(df, nSalts))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head.partial, aggs.tail.map(_.partial): _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(aggs.head.combine, aggs.tail.map(_.combine): _*)
  }

  /** Salted equi-join for hot keys: the BIG side takes a deterministic
    * per-row salt ([[rowSalt]]: hash of the full row content, retry-stable
    * by construction) and the
    * SMALL-but-unbroadcastable side replicates ×nSalts via one explode, so
    * a key holding 20% of the big table spreads over nSalts reducers
    * instead of melting one. Exact for inner joins on `keys` (every big
    * row meets every matching small row exactly once — at its own salt).
    * Use when AQE's skew split can't apply: the skew is in the JOIN KEY
    * population itself and the small side is too big to broadcast but
    * cheap to replicate (dimension tables in the 10s-100s of MB). Costs
    * nSalts× the small side's shuffle volume — size nSalts to the skew
    * factor, not higher. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 nSalts: Int): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    val b = big.withColumn("__salt", rowSalt(big, nSalts))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    b.join(s, keys :+ "__salt").drop("__salt")
  }

  /** One salted aggregate: a partial stage expression and its combiner. */
  case class SaltedAgg(partial: Column, combine: Column)

  def sumOf(c: String, out: String): SaltedAgg =
    SaltedAgg(sum(c).as(s"__p_$out"), sum(s"__p_$out").as(out))
  def countAll(out: String): SaltedAgg =
    SaltedAgg(count(lit(1)).as(s"__p_$out"), sum(s"__p_$out").as(out))
  def minOf(c: String, out: String): SaltedAgg =
    SaltedAgg(min(c).as(s"__p_$out"), min(s"__p_$out").as(out))
  def maxOf(c: String, out: String): SaltedAgg =
    SaltedAgg(max(c).as(s"__p_$out"), max(s"__p_$out").as(out))

  /** Exact avg from salted sum+count (two outputs consumed into one). */
  def avgOf(c: String, out: String): Seq[SaltedAgg] =
    Seq(sumOf(c, s"__sum_$out"), countAll(s"__cnt_$out"))
  def finishAvg(df: DataFrame, out: String): DataFrame =
    df.withColumn(out, col(s"__sum_$out") / col(s"__cnt_$out"))
      .drop(s"__sum_$out", s"__cnt_$out")
}
