package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.SplineOps
import Q.{dec4, r4}
import scala.collection.immutable.ListMap

/** Serving-path queries (SURVEY §3.3): the dashboard's callback bodies as
  * short DataFrame queries — status lights from latest readings vs trailing
  * baselines, and the 3-D mesh's cubic-spline upsampling. */
object ServingQ {

  val queries: ListMap[String, Q] = ListMap(

    // `update_accretion_status` shape (`dashboard.py:813-924`): latest row
    // per series (P3) fused with a trailing baseline and threshold rules (P6).
    "q45_status_board" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val w = Window.partitionBy("event_type").orderBy(col("ts").desc, col("event_id").desc)
        val latest = ev.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("event_type"), col("value").as("latest_value"), col("ts").as("latest_ts"))
        val cutoff = ev.agg((max("ts") - expr("INTERVAL 24 HOURS")).as("cut"))
        val base = ev.crossJoin(broadcast(cutoff)).filter(col("ts") >= col("cut"))
          .groupBy("event_type").agg(avg("value").as("avg24"))
        latest.join(base, Seq("event_type"), "left")
          .select(col("event_type"), col("latest_value"), dec4(col("avg24")).as("avg_24h"),
            when(col("latest_value") > col("avg24") * 1.5, "ALERT")
              .when(col("latest_value") > col("avg24"), "WATCH")
              .otherwise("NORMAL").as("status"))
          .orderBy("event_type")
      },
      Some(s"""WITH latest AS (SELECT event_type, value AS latest_value FROM events
              |  QUALIFY row_number() OVER (PARTITION BY event_type
              |    ORDER BY ts DESC, event_id DESC) = 1),
              |base AS (SELECT event_type, avg(value) AS avg24 FROM events
              |  WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 24 HOUR
              |  GROUP BY 1)
              |SELECT l.event_type, latest_value, ${r4("avg24")} AS avg_24h,
              |CASE WHEN latest_value > avg24 * 1.5 THEN 'ALERT'
              |     WHEN latest_value > avg24 THEN 'WATCH'
              |     ELSE 'NORMAL' END AS status
              |FROM latest l LEFT JOIN base b ON l.event_type = b.event_type
              |ORDER BY l.event_type""".stripMargin)),

    // T8: cubic-spline mesh upsampling (`dashboard.py:1342-1353`): the first
    // 12 hourly means per series, splined onto a 4x finer axis. HASH-green
    // against a DuckDB oracle that UNROLLS the Thomas solve via lateral
    // column aliases, mirroring the IEEE op order 1:1 (equally-spaced knots
    // make h=1, so the coefficients reduce to pure rational arithmetic).
    "q46_spline_mesh" -> Q(
      (s, d) => {
        val hourly = Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("ts"), col("event_type"))
          .agg(avg("value").as("v"))
        val w = Window.partitionBy("event_type").orderBy("ts")
        val knots = hourly.withColumn("rn", row_number().over(w)).filter(col("rn") <= 12)
          .groupBy("event_type")
          .agg(sort_array(collect_list(struct(col("rn"), col("v")))).as("pts"))
          // full 12-knot windows only — the unrolled oracle assumes n = 12,
          // so the contract is enforced on BOTH sides, not assumed
          .filter(size(col("pts")) === 12)
          .select(col("event_type"),
            expr("transform(pts, p -> cast(p.rn as double))").as("xs"),
            expr("transform(pts, p -> p.v)").as("ys"))
        val qs = array((1 to 45).map(i => lit(1.0 + (i - 1) * 0.25)): _*)
        knots
          .withColumn("mesh", SplineOps.cubicInterp(col("xs"), col("ys"), qs))
          .select(col("event_type"), posexplode(col("mesh")).as(Seq("pos", "v_interp")))
          .select(col("event_type"), col("pos"), dec4(col("v_interp")).as("v_interp"))
          .orderBy("event_type", "pos")
      },
      // DuckDB oracle: the knots are EQUALLY SPACED (xs = 1..12, h = 1), so
      // the 12-knot Thomas solve UNROLLS into lateral column aliases whose
      // IEEE operations mirror SplineOps.secondDerivs 1:1 — every
      // intermediate double is bit-identical, no recursion needed. Assumes
      // each series has >= 12 hourly knots (720 on this data).
      Some(splineOracleSql))
  )

  /** Unrolled natural-cubic-spline oracle for q46 (see above). */
  private lazy val splineOracleSql: String = {
    val n = 12
    // pivot: y0..y11 by knot rank
    val ys = (0 until n).map(i => s"max(CASE WHEN rn = ${i + 1} THEN v END) AS y$i").mkString(",\n|  ")
    // d(i) = 6*((y[i+1]-y[i])/h1 - (y[i]-y[i-1])/h0), h = 1.0
    val ds = (1 to n - 2).map(i =>
      s"6 * ((y${i + 1} - y$i) / 1.0 - (y$i - y${i - 1}) / 1.0) AS d$i").mkString(",\n|  ")
    // Thomas forward sweep, b(0)=1, d(0)=0, c(0)=0; interior a=c=1, b=4
    // i=1: w = 1/1; b1 = 4 - w*0; dd1 = d1 - w*0
    val sweep = new StringBuilder(
      "(1.0 / 1.0) AS w1, 2 * (1.0 + 1.0) - w1 * 0.0 AS b1, d1 - w1 * 0.0 AS dd1")
    for (i <- 2 to n - 2)
      sweep.append(s",\n|  (1.0 / b${i - 1}) AS w$i, 2 * (1.0 + 1.0) - w$i * 1.0 AS b$i, " +
        s"d$i - w$i * dd${i - 1} AS dd$i")
    // back substitution: m(11)=0 (d11=0/b11=1); m(i) = (dd(i) - c(i)*m(i+1))/b(i)
    val back = new StringBuilder(s"0.0 AS m${n - 1}")
    for (i <- n - 2 to 1 by -1)
      back.append(s",\n|  (dd$i - 1.0 * m${i + 1}) / b$i AS m$i")
    back.append(",\n|  0.0 AS m0")
    // evaluation at q = 1 + pos*0.25: i = min(floor(q)-1, 10), t = q-(i+1)
    def pick(prefix: String): String =
      (0 until n).map(j => s"WHEN $j THEN $prefix$j").mkString(s"CASE i ", " ", " END")
    s"""WITH h AS (SELECT date_trunc('hour', ts) AS ts, event_type, avg(value) AS v
       |  FROM events GROUP BY 1, 2),
       |k AS (SELECT event_type, v,
       |  row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn FROM h),
       |p AS (SELECT event_type,
       |  $ys
       |  FROM k WHERE rn <= $n GROUP BY event_type
       |  HAVING count(*) >= $n),
       |s AS (SELECT *,
       |  $ds
       |  FROM p),
       |w AS (SELECT *,
       |  ${sweep.result()}
       |  FROM s),
       |m AS (SELECT *,
       |  ${back.result()}
       |  FROM w),
       |g AS (SELECT unnest(generate_series(0, 44)) AS pos),
       |e AS (SELECT event_type, pos, 1.0 + pos * 0.25 AS q,
       |  least(CAST(floor(1.0 + pos * 0.25) AS INT) - 1, ${n - 2}) AS i
       |  FROM m CROSS JOIN g),
       |x AS (SELECT e.event_type, e.pos, e.q, e.i,
       |  (e.q - CAST(e.i + 1 AS DOUBLE)) / 1.0 AS t,
       |  ${pick("y")} AS yi,
       |  ${(0 until n).map(j => s"WHEN ${j - 1} THEN y$j").drop(1).mkString("CASE i ", " ", " END")} AS yi1,
       |  ${pick("m")} AS mi,
       |  ${(0 until n).map(j => s"WHEN ${j - 1} THEN m$j").drop(1).mkString("CASE i ", " ", " END")} AS mi1
       |  FROM e JOIN m ON e.event_type = m.event_type)
       |SELECT event_type, pos,
       |${r4("(1.0 - t) * yi + t * yi1 + 1.0 * 1.0 / 6.0 * (((1.0 - t) * (1.0 - t) * (1.0 - t) - (1.0 - t)) * mi + (t * t * t - t) * mi1)")}
       |  AS v_interp
       |FROM x ORDER BY event_type, pos""".stripMargin
  }
}
