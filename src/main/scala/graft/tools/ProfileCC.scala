package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the bench pass-degradation investigation: replays
  * the Bench pass loop for one registry query at INFO log level so the
  * scheduler timeline (job submit/complete timestamps) can be diffed for
  * idle gaps. Not part of the driver contract. */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val qname = args.headOption.getOrElse("q65_neardup_clusters")
    val passes = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", 10000)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    val d = "/root/testdata/sf0.1"
    val fn = graft.SparkEntry.queries(qname)
    for (p <- 1 to passes) {
      val t0 = System.nanoTime()
      fn(spark, d).queryExecution.toRdd
        .foreachPartition { it => while (it.hasNext) it.next() }
      println(f"[pass] $qname p$p ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
