package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed physical plan of one registry query.
  *
  * Usage: runMain graft.Explain <query_name> [sfDir] [formatted|extended]
  * Also prints quick expensive-expression counts (split / lambda filters /
  * regexp) so re-expansion regressions are visible at a glance.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Explain <query> [sfDir] [mode|time]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "formatted"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    println(s"== expensive-expression census for $name ==")
    println("  split(            : " + "split\\(".r.findAllIn(plan).length)
    println("  lambda filter(    : " + "filter\\(lambda".r.findAllIn(plan).length)
    println("  transform(lambda  : " + "transform\\(lambda".r.findAllIn(plan).length)
    println("  regexp_replace(   : " + "regexp_replace\\(".r.findAllIn(plan).length)
    println("  xxhash64(         : " + "xxhash64\\(".r.findAllIn(plan).length)
    println("  Exchange          : " + "Exchange".r.findAllIn(plan).length)
    println("  ReusedExchange    : " + "ReusedExchange".r.findAllIn(plan).length)
    if (mode == "time") {
      // execute twice (warm codegen), report the warm run and the FINAL
      // adaptive plan — ReuseExchange decisions only exist post-execution
      df.count()
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"  rows=$n timeSec=${(System.nanoTime() - t0) / 1e9}%.2f")
      val fin = df.queryExecution.executedPlan.toString
      println("  final ReusedExchange / stage reuse: " +
        ("ReusedExchange".r.findAllIn(fin).length + "ReusedQueryStage".r.findAllIn(fin).length))
    } else df.explain(mode)
    spark.stop()
  }
}
