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
    locally {
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
      def intLit(x: org.apache.spark.sql.catalyst.expressions.Expression,
                 what: String): Int = x match {
        case Literal(v: Int, IntegerType) => v
        case Literal(v: Long, LongType) => v.toInt
        case other => throw new IllegalArgumentException(
          s"$what must be an integer literal, got $other")
      }
      def dblLit(x: org.apache.spark.sql.catalyst.expressions.Expression,
                 what: String): Double = x match {
        case Literal(v: Double, DoubleType) => v
        case other => throw new IllegalArgumentException(
          s"$what must be a double literal, got $other")
      }
      e.injectFunction((
        new FunctionIdentifier("graft_cms_agg"),
        new ExpressionInfo(classOf[graft.functions.CountMinAgg].getName, "graft_cms_agg"),
        exprs => graft.functions.CountMinAgg(exprs(0),
          intLit(exprs(1), "depth"), intLit(exprs(2), "width"))))
      e.injectFunction((
        new FunctionIdentifier("graft_cms_estimate"),
        new ExpressionInfo(classOf[graft.functions.CmsEstimateLong].getName,
          "graft_cms_estimate"),
        exprs => graft.functions.CmsEstimateLong(exprs(0), exprs(1))))
      e.injectFunction((
        new FunctionIdentifier("graft_char_entropy"),
        new ExpressionInfo(classOf[graft.functions.CharEntropyStats].getName,
          "graft_char_entropy"),
        exprs => graft.functions.CharEntropyStats(exprs.head)))
      e.injectFunction((
        new FunctionIdentifier("graft_hist_agg"),
        new ExpressionInfo(classOf[graft.functions.HistogramAgg].getName, "graft_hist_agg"),
        exprs => graft.functions.HistogramAgg(exprs(0),
          intLit(exprs(1), "bins"), dblLit(exprs(2), "lo"), dblLit(exprs(3), "hi"))))
      e.injectFunction((
        new FunctionIdentifier("graft_token_count"),
        new ExpressionInfo(classOf[graft.functions.TokenCountExpr].getName,
          "graft_token_count"),
        exprs => graft.functions.TokenCountExpr(exprs.head)))
      e.injectFunction((
        new FunctionIdentifier("graft_hist_quantile"),
        new ExpressionInfo(classOf[graft.functions.HistQuantile].getName,
          "graft_hist_quantile"),
        exprs => graft.functions.HistQuantile(exprs(0), exprs(1))))
    }
    // optimizer rule: size(array_intersect(a, b)) on non-null long arrays
    // never materializes the intersection
    e.injectOptimizerRule(_ => graft.functions.RewriteIntersectSize)
    // the native as-of join's planner strategy: sessions configured with
    // these extensions plan graft.plans.AsOfJoin without the programmatic
    // experimental.extraStrategies registration JoinOps.asofJoinNative does
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
