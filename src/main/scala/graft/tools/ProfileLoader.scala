package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch harness: A/B the events `ts` physical layouts through the same
  * query so layout cost separates from box noise. Not part of the driver
  * contract. */
object ProfileLoader {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label: $s%.3fs"); s
    }
    // copy current events (NTZ) to layout A; long-nanos to layout B
    val cur = spark.read.parquet(s"$d/events.parquet")
    cur.write.mode("overwrite").parquet("/tmp/evA/events.parquet")
    cur.withColumn("ts",
        (unix_micros(col("ts").cast(TimestampType)) * 1000L).as("ts"))
      .write.mode("overwrite").parquet("/tmp/evB/events.parquet")

    def q36(dir: String): Unit =
      graft.queries.Registry.all("q36_anomaly_zscore").fn(spark, dir)
        .queryExecution.toRdd.foreachPartition { it => while (it.hasNext) it.next() }
    // warm
    q36("/tmp/evA"); q36("/tmp/evB")
    val a = (1 to 3).map(i => time(s"q36 NTZ layout #$i")(q36("/tmp/evA"))).min
    val b = (1 to 3).map(i => time(s"q36 long-nanos layout #$i")(q36("/tmp/evB"))).min
    println(f"min NTZ=$a%.3f min nanos=$b%.3f")
    spark.stop()
  }
}
