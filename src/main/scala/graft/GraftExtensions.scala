package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{DotProduct, L2Norm, MinHashAgg, SortedIntersectCount}

/** Session-extension entry point: makes the engine's custom expressions
  * available to any session via
  * `--conf spark.sql.extensions=graft.GraftExtensions` (cluster-wide, no
  * code changes in user jobs). The library ops also self-register through
  * `VectorFunctions.register` for programmatic use. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(graft.functions.VectorFunctions.toDoubleArray(exprs(0)),
          graft.functions.VectorFunctions.toDoubleArray(exprs(1)))))
    e.injectFunction((
      new FunctionIdentifier("graft_l2norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "graft_l2norm"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        L2Norm(graft.functions.VectorFunctions.toDoubleArray(exprs.head))))
    e.injectFunction((
      new FunctionIdentifier("graft_isect_sorted"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "graft_isect_sorted"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedIntersectCount(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "graft_minhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
            org.apache.spark.sql.types.IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash numHashes must be an int literal, got $other")
        }
        MinHashAgg(exprs(0), k)
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[graft.functions.BloomAgg].getName, "graft_bloom_agg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
        val items = exprs(1) match {
          case Literal(v: Int, IntegerType) => v.toLong
          case Literal(v: Long, LongType) => v
          case other => throw new IllegalArgumentException(
            s"graft_bloom_agg expectedItems must be an integer literal, got $other")
        }
        val fpp = exprs(2) match {
          case Literal(v: Double, DoubleType) => v
          case other => throw new IllegalArgumentException(
            s"graft_bloom_agg fpp must be a double literal, got $other")
        }
        graft.functions.BloomAgg(exprs(0), items, fpp)
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[graft.functions.BloomMightContainLong].getName,
        "graft_bloom_contains"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.BloomMightContainLong(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_heavy_hitters"),
      new ExpressionInfo(classOf[graft.functions.HeavyHittersAgg].getName,
        "graft_heavy_hitters"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
            org.apache.spark.sql.types.IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_heavy_hitters capacity must be an int literal, got $other")
        }
        graft.functions.HeavyHittersAgg(exprs(0), k)
      }))
    // optimizer rule: size(array_intersect(a, b)) on non-null long arrays
    // never materializes the intersection
    e.injectOptimizerRule(_ => graft.functions.RewriteIntersectSize)
    // the native as-of join's planner strategy: sessions configured with
    // these extensions plan graft.plans.AsOfJoin without the programmatic
    // experimental.extraStrategies registration JoinOps.asofJoinNative does
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
