package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SplineOps

class SplineOpsSpec extends AnyFunSuite {

  test("spline passes through every knot") {
    val xs = Array(0.0, 1.0, 2.5, 4.0, 5.0)
    val ys = Array(3.0, -1.0, 2.0, 0.5, 4.0)
    val out = SplineOps.evalSpline(xs, ys, xs)
    xs.indices.foreach(i => assert(math.abs(out(i) - ys(i)) < 1e-9))
  }

  test("spline of a straight line is the line everywhere") {
    val xs = (0 to 10).map(_.toDouble).toArray
    val ys = xs.map(x => 2.0 * x + 1.0)
    val qs = Array(0.5, 3.14, 7.77, 9.99)
    val out = SplineOps.evalSpline(xs, ys, qs)
    qs.indices.foreach(i => assert(math.abs(out(i) - (2.0 * qs(i) + 1.0)) < 1e-9))
  }

  test("queries outside the knot range clamp to the edge values") {
    val xs = Array(1.0, 2.0, 3.0)
    val ys = Array(10.0, 20.0, 15.0)
    val out = SplineOps.evalSpline(xs, ys, Array(-5.0, 99.0))
    assert(out(0) == 10.0 && out(1) == 15.0)
  }

  test("interpolated values are continuous (no jumps at knots)") {
    val xs = (0 to 10).map(_.toDouble).toArray
    val ys = Array(5.0, 8.0, 2.0, 9.0, 1.0, 7.0, 3.0, 8.0, 2.0, 6.0, 4.0)
    val eps = 1e-7
    (1 until 10).foreach { k =>
      val Array(l, r) = SplineOps.evalSpline(xs, ys, Array(k - eps, k + eps))
      assert(math.abs(l - r) < 1e-4, s"discontinuity at knot $k")
    }
  }
}
