package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness: stage-level timing of the q114 DSIR pipeline (fit vs
  * score vs raw tokenize+hash), so plan work targets the real cost. Not
  * part of the driver contract. */
object ProfileDsir {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label: $s%.3fs"); s
    }
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreachPartition { it => while (it.hasNext) it.next() }

    val docs = graft.sources.Tables.documents(spark, d)
    // stage A: tokenize + bigram + md5 bucket + explode, count only
    val mk = {
      val n = 2
      transform(sequence(lit(1), size(col("__t")) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(col("__t"), i + lit(j))): _*))
    }
    val pos = docs
      .select(col("doc_id"), (col("lang") === "en").cast("int").as("__tgt"),
        graft.operators.TextOps.tokens(col("text")).as("__t"))
      .select(col("doc_id"), col("__tgt"),
        explode_outer(when(size(col("__t")) >= 2, mk)
          .otherwise(array().cast("array<string>"))).as("g"))
      .filter(col("g").isNotNull)
      .withColumn("b", conv(substring(md5(col("g")), 1, 3), 16, 10).cast("int") % 4096)
    (1 to 2).foreach { i =>
      time(s"A explode+md5 #$i")(drain(pos.groupBy("b").agg(count(lit(1)))))
    }
    (1 to 2).foreach { i =>
      time(s"B perDoc agg #$i")(
        drain(pos.groupBy("doc_id", "__tgt", "b").agg(count(lit(1)))))
    }
    (1 to 2).foreach { i =>
      spark.catalog.clearCache()
      time(s"C full dsir #$i")(
        drain(graft.operators.CorpusOps.dsirWeights(docs, "doc_id", "text",
          isTarget = col("lang") === "en")))
    }
    (1 to 2).foreach { i =>
      time(s"D tokenize only #$i")(
        drain(docs.select(size(graft.operators.TextOps.tokens(col("text"))).as("n"))
          .agg(sum("n"))))
    }
    spark.stop()
  }
}
