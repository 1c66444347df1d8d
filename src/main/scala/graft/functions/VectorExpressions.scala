package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Custom codegen'd Catalyst expressions for the embedding hot path.
  *
  * The portable formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * runs interpreted lambda machinery per element — fine for one vector,
  * hostile for millions of pair evaluations. These expressions emit a tight
  * Java loop inside WholeStageCodegen: identical left-to-right accumulation
  * (so results are bit-identical to the fold and to DuckDB's list_reduce
  * oracle), ~10x less per-element overhead.
  *
  * This is preference tier (b) of the build rules — a scalar `Expression`
  * with `doGenCode`, not a new operator: Spark genuinely lacks a
  * non-lambda vector dot product, and the semantics are a pure scalar
  * function of two array columns. Elements are assumed non-null (vectors
  * come from parquet float arrays); a null ARRAY yields null. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2 norm with the same left-to-right accumulation as [[DotProduct]]. */
case class L2Norm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < x.numElements()) { val v = x.getDouble(i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** |A∩B| of two ASCENDING-SORTED long arrays by linear merge — the dedup
  * verification kernel. Spark's `array_intersect` allocates and fills a
  * hash set per invocation; at one call per candidate pair (millions at
  * scale) the allocation + hashing dominates. The merge needs the inputs
  * sorted (callers use `sort_array` at collect time, amortized once per
  * document) and counts in O(|A|+|B|) with zero allocation, inside
  * WholeStageCodegen. Duplicate elements within one input are counted at
  * their multiplicity-min, matching set semantics for distinct inputs. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n, m) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      val u = x.getLong(i); val v = y.getLong(j)
      if (u == v) { c += 1; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val u = ctx.freshName("u"); val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $n && $j < $m) {
         |  long $u = $a.getLong($i);
         |  long $v = $b.getLong($j);
         |  if ($u == $v) { $c++; $i++; $j++; }
         |  else if ($u < $v) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Session registration: exposes the expressions as SQL functions
  * (`graft_dot`, `graft_l2norm`, `graft_isect_sorted`) — the stable way to
  * build Columns from custom expressions across Spark 4's Column API. */
object VectorFunctions {
  import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
  import org.apache.spark.sql.types.{ArrayType, IntegerType}

  /** The expressions read 8-byte double slots from ArrayData; a float/int
    * array input would be silently misread (or crash), so the SQL surface
    * coerces every argument to array<double> first. */
  def toDoubleArray(e: Expression): Expression = e.dataType match {
    case ArrayType(DoubleType, _) => e
    case _ => Cast(e, ArrayType(DoubleType))
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot",
      { exprs => DotProduct(toDoubleArray(exprs(0)), toDoubleArray(exprs(1))) }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_l2norm",
      { exprs => L2Norm(toDoubleArray(exprs.head)) }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_isect_sorted",
      { exprs => SortedIntersectCount(exprs(0), exprs(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_minhash",
      { exprs =>
        val k = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash numHashes must be an int literal, got $other")
        }
        MinHashAgg(exprs(0), k)
      }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_bloom_agg",
      { exprs => BloomAgg(exprs(0), longLit(exprs(1), "expectedItems"),
          doubleLit(exprs(2), "fpp")) }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_bloom_contains",
      { exprs => BloomMightContainLong(exprs(0), exprs(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_heavy_hitters",
      { exprs =>
        val k = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_heavy_hitters capacity must be an int literal, got $other")
        }
        HeavyHittersAgg(exprs(0), k)
      }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_cms_agg",
      { exprs => CountMinAgg(exprs(0),
          longLit(exprs(1), "depth").toInt, longLit(exprs(2), "width").toInt) },
      "scala_udf")
    reg.createOrReplaceTempFunction("graft_cms_estimate",
      { exprs => CmsEstimateLong(exprs(0), exprs(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_char_entropy",
      { exprs => CharEntropyStats(exprs.head) }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_hist_agg",
      { exprs => HistogramAgg(exprs(0), longLit(exprs(1), "bins").toInt,
          doubleLit(exprs(2), "lo"), doubleLit(exprs(3), "hi")) }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_hist_quantile",
      { exprs => HistQuantile(exprs(0), exprs(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_token_count",
      { exprs => TokenCountExpr(exprs.head) }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_tdigest_agg",
      { exprs => TDigestAgg(exprs(0), longLit(exprs(1), "delta").toInt) },
      "scala_udf")
    reg.createOrReplaceTempFunction("graft_tdigest_merge",
      { exprs => TDigestMergeAgg(exprs.head) }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_tdigest_quantile",
      { exprs => TDigestQuantile(exprs(0), exprs(1)) }, "scala_udf")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, org.apache.spark.sql.types.LongType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def doubleLit(e: Expression, what: String): Double = e match {
    case Literal(v: Double, org.apache.spark.sql.types.DoubleType) => v
    case other => throw new IllegalArgumentException(
      s"graft_bloom_agg $what must be a double literal, got $other")
  }
}
