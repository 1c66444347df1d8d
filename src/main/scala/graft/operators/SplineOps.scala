package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Natural cubic spline interpolation (reference T8: the dashboard's 3-D
  * kiln mesh upsamples 11 zone temperatures to a 50-point axis with
  * `scipy.interpolate.interp1d(kind='cubic')`, `dashboard.py:1342-1353`).
  *
  * Serving-side math over an already-collected small array (≤ tens of
  * knots), so a Scala UDF is the sanctioned tool here (SURVEY §2.12) — the
  * arrays never exceed per-row serving payloads; nothing distributed
  * depends on it. Thomas-algorithm tridiagonal solve for the natural
  * spline second derivatives, O(n) per row. */
object SplineOps {

  /** Second derivatives of the natural cubic spline through (xs, ys). */
  private def secondDerivs(xs: Array[Double], ys: Array[Double]): Array[Double] = {
    val n = xs.length
    val m = new Array[Double](n)
    if (n < 3) return m // natural spline of <3 points is linear: m = 0
    val a = new Array[Double](n); val b = new Array[Double](n)
    val c = new Array[Double](n); val d = new Array[Double](n)
    b(0) = 1.0; b(n - 1) = 1.0
    for (i <- 1 until n - 1) {
      val h0 = xs(i) - xs(i - 1); val h1 = xs(i + 1) - xs(i)
      a(i) = h0; b(i) = 2 * (h0 + h1); c(i) = h1
      d(i) = 6 * ((ys(i + 1) - ys(i)) / h1 - (ys(i) - ys(i - 1)) / h0)
    }
    // Thomas forward sweep
    for (i <- 1 until n) {
      val w = a(i) / b(i - 1)
      b(i) -= w * c(i - 1)
      d(i) -= w * d(i - 1)
    }
    m(n - 1) = d(n - 1) / b(n - 1)
    for (i <- n - 2 to 0 by -1) m(i) = (d(i) - c(i) * m(i + 1)) / b(i)
    m
  }

  /** Evaluate the natural spline at `qs` (clamped to the knot range, like
    * the dashboard's fixed axis). */
  def evalSpline(xs: Array[Double], ys: Array[Double], qs: Array[Double]): Array[Double] = {
    require(xs.length == ys.length, "xs/ys length mismatch")
    if (xs.isEmpty) return qs.map(_ => Double.NaN)
    if (xs.length == 1) return qs.map(_ => ys.head) // single knot: constant

    val m = secondDerivs(xs, ys)
    qs.map { q0 =>
      val q = math.min(math.max(q0, xs.head), xs.last)
      var i = java.util.Arrays.binarySearch(xs, q)
      if (i < 0) i = -i - 2
      i = math.min(math.max(i, 0), xs.length - 2)
      val h = xs(i + 1) - xs(i)
      val t = (q - xs(i)) / h
      val u = 1 - t
      u * ys(i) + t * ys(i + 1) +
        h * h / 6.0 * ((u * u * u - u) * m(i) + (t * t * t - t) * m(i + 1))
    }
  }

  /** Column form: spline(xsCol, ysCol, qsCol) -> array<double>. */
  val splineUdf = udf { (xs: Seq[Double], ys: Seq[Double], qs: Seq[Double]) =>
    evalSpline(xs.toArray, ys.toArray, qs.toArray).toSeq
  }

  def cubicInterp(xs: Column, ys: Column, qs: Column): Column = splineUdf(xs, ys, qs)
}
