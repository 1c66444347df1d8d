package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B harness for single-expression optimization experiments. */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", 10000)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val li = graft.sources.Tables.lineitem(spark, d)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (p <- 1 to 3) {
      time(s"decimal percentile p$p") {
        li.groupBy("l_returnflag")
          .agg(expr("percentile(l_extendedprice, 0.5)"),
            expr("percentile(l_extendedprice, 0.95)"),
            expr("percentile(l_extendedprice, 0.99)")).collect()
      }
      time(s"double percentile p$p") {
        li.groupBy("l_returnflag")
          .agg(expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.5)"),
            expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.95)"),
            expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.99)")).collect()
      }
      time(s"double percentile array p$p") {
        li.groupBy("l_returnflag")
          .agg(expr("percentile(CAST(l_extendedprice AS DOUBLE), array(0.5, 0.95, 0.99))"))
          .collect()
      }
    }
    spark.stop()
  }
}
