package graft.queries

import Q.r6

/** Shared oracle generator for the Newton-logistic entries (q325, q335):
  * unrolls `iters` scoring+aggregate+Cramer-3x3 steps over a CTE named
  * `base(g, y, x1, x2)`, producing `bt$iters(g, b0, b1, b2)` — the exact
  * replay of [[graft.operators.RegressionOps.logisticNewton]]'s per-step
  * arithmetic (betas rounded per step, logit clamped to ±30). */
private[queries] object NewtonSql {

  val pExpr: String = "1.0 / (1.0 + exp(-least(30.0, greatest(-30.0, " +
    "b0 + b1 * x1 + b2 * x2))))"

  private val det = """h00 * (h11 * h22 - h12 * h12)
    |      - h01 * (h01 * h22 - h12 * h02)
    |      + h02 * (h01 * h12 - h11 * h02)""".stripMargin
  private val d0 = """g0 * (h11 * h22 - h12 * h12)
    |      - h01 * (g1 * h22 - h12 * g2)
    |      + h02 * (g1 * h12 - h11 * g2)""".stripMargin
  private val d1 = """h00 * (g1 * h22 - g2 * h12)
    |      - g0 * (h01 * h22 - h12 * h02)
    |      + h02 * (h01 * g2 - g1 * h02)""".stripMargin
  private val d2 = """h00 * (h11 * g2 - h12 * g1)
    |      - h01 * (h01 * g2 - g1 * h02)
    |      + g0 * (h01 * h12 - h11 * h02)""".stripMargin

  /** The CTE chain `bt0, j1, s1, bt1, ..., bt$iters` (prepend
    * `base AS (...)`). */
  def steps(iters: Int): String = {
    val its = (1 to iters).map { i =>
      s"""j$i AS (SELECT g, y, x1, x2, b0, b1, b2, $pExpr AS p
         |  FROM base JOIN bt${i - 1} USING (g)),
         |s$i AS (SELECT g,
         |    any_value(b0) AS pb0, any_value(b1) AS pb1,
         |    any_value(b2) AS pb2,
         |    sum(y - p) AS g0, sum((y - p) * x1) AS g1,
         |    sum((y - p) * x2) AS g2,
         |    sum(p * (1.0 - p)) AS h00,
         |    sum(p * (1.0 - p) * x1) AS h01,
         |    sum(p * (1.0 - p) * x2) AS h02,
         |    sum(p * (1.0 - p) * x1 * x1) AS h11,
         |    sum(p * (1.0 - p) * x1 * x2) AS h12,
         |    sum(p * (1.0 - p) * x2 * x2) AS h22
         |  FROM j$i GROUP BY 1),
         |bt$i AS (SELECT g,
         |    ${r6(s"pb0 + ($d0) / ($det)")} AS b0,
         |    ${r6(s"pb1 + ($d1) / ($det)")} AS b1,
         |    ${r6(s"pb2 + ($d2) / ($det)")} AS b2
         |  FROM s$i)""".stripMargin
    }.mkString(",\n")
    s"""bt0 AS (SELECT DISTINCT g, 0.0 AS b0, 0.0 AS b1, 0.0 AS b2
       |  FROM base),
       |$its""".stripMargin
  }
}
