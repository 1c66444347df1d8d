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
    // 12 hourly means per series, splined onto a 4x finer axis. Scala-UDF
    // math over collected small arrays -> rows-only check (deterministic:
    // same Thomas solve every run).
    "q46_spline_mesh" -> Q(
      (s, d) => {
        val hourly = Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("ts"), col("event_type"))
          .agg(avg("value").as("v"))
        val w = Window.partitionBy("event_type").orderBy("ts")
        val knots = hourly.withColumn("rn", row_number().over(w)).filter(col("rn") <= 12)
          .groupBy("event_type")
          .agg(sort_array(collect_list(struct(col("rn"), col("v")))).as("pts"))
          .select(col("event_type"),
            expr("transform(pts, p -> cast(p.rn as double))").as("xs"),
            expr("transform(pts, p -> p.v)").as("ys"))
        val qs = array((1 to 45).map(i => lit(1.0 + (i - 1) * 0.25)): _*)
        knots
          .withColumn("mesh", SplineOps.cubicInterp(col("xs"), col("ys"), qs))
          .select(col("event_type"), posexplode(col("mesh")).as(Seq("pos", "v_interp")))
          .select(col("event_type"), col("pos"), dec4(col("v_interp")).as("v_interp"))
          .orderBy("event_type", "pos")
      })
  )
}
