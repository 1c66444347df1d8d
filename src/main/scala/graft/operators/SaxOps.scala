package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SAX symbolization (Lin et al., "Experiencing SAX", DMKD'07) — the
  * representation under iSAX-style series indexing: z-normalize a window,
  * average it into `segments` PAA buckets, and map each bucket mean to a
  * letter by standard-normal breakpoints. Two series windows with the same
  * word are similarity candidates (the word is a lower-bounding bucket),
  * which turns subsequence motif discovery into the same shape as every
  * other dedup op here: an equi-join on a compact key, never all-pairs.
  *
  * Everything is column algebra: day stats are one grouped aggregate, PAA
  * is a second, symbols are CASE chains on the normalized mean — no UDF,
  * no arrays, hash-verifiable cross-engine (symbols are categorical, so
  * ulp noise only matters exactly ON a breakpoint, where both engines
  * compute the identical double anyway). */
object SaxOps {

  /** Standard-normal equiprobable breakpoints (public SAX tables). */
  val Breakpoints: Map[Int, Seq[Double]] = Map(
    3 -> Seq(-0.4307272992954576, 0.4307272992954576),
    4 -> Seq(-0.6744897501960817, 0.0, 0.6744897501960817),
    5 -> Seq(-0.8416212335729142, -0.2533471031357997,
             0.2533471031357997, 0.8416212335729142))

  /** Letter for a z-value under `alphabet` breakpoints ('a' lowest).
    * Chained whens, smallest breakpoint FIRST — a fold that nests the
    * largest breakpoint outermost would send every z below it to the top
    * letter. */
  def symbol(z: Column, alphabet: Int): Column = {
    val bps = Breakpoints.getOrElse(alphabet,
      sys.error(s"unsupported SAX alphabet size $alphabet"))
    bps.tail.zipWithIndex.foldLeft(when(z < bps.head, lit("a"))) {
      case (acc, (bp, i)) => acc.when(z < bp, lit(('b' + i).toChar.toString))
    }.otherwise(lit(('a' + bps.length).toChar.toString))
  }

  /** Per-(key, window) SAX words over a regular series. `winCol` assigns
    * each row to a window (e.g. `to_date(ts)` for daily words over hourly
    * data); `posCol` orders rows inside the window; `segments` PAA buckets
    * must divide the window length (rows with incomplete or null-holding
    * windows drop — `__segn` counts non-null values, not rows).
    * Returns one row per (key..., window) with the word. ONE grouped
    * aggregate over the input (segment sums, squares, counts from a
    * single shuffle), window-summed into day stats — no second scan, no
    * join. */
  def saxWords(df: DataFrame, keyCols: Seq[String], winCol: Column,
               posCol: Column, vCol: Column, windowLen: Int, segments: Int,
               alphabet: Int = 4): DataFrame = {
    require(windowLen % segments == 0,
      s"windowLen $windowLen must divide into $segments segments")
    val segLen = windowLen / segments
    val keys = keyCols.map(col)
    // one pass: segment sums, sums of squares, and VALUE counts (count of
    // __v, not rows — a null value must invalidate the window, not bias
    // its mean) from the same shuffle
    val seg = df
      .select(keys :+ winCol.as("__win") :+ posCol.as("__pos") :+ vCol.as("__v"): _*)
      .withColumn("__seg", floor(col("__pos") / segLen))
      .groupBy(keys :+ col("__win") :+ col("__seg"): _*)
      .agg(sum("__v").as("__segsum"),
        sum(col("__v") * col("__v")).as("__segsumsq"),
        count(col("__v")).as("__segn"))
    val wnd = Window.partitionBy(keys :+ col("__win"): _*)
    // day stats from the segment partials (sums of sums); the
    // z-normalized PAA mean is ((segsum/segLen) - mu) / sigma
    val joined = seg
      .withColumn("__n", sum("__segn").over(wnd))
      .withColumn("__sum", sum("__segsum").over(wnd))
      .withColumn("__sumsq", sum("__segsumsq").over(wnd))
      .filter(col("__n") === windowLen) // complete windows only
      .withColumn("__mu", col("__sum") / windowLen)
      .withColumn("__var", col("__sumsq") / windowLen - col("__mu") * col("__mu"))
      .withColumn("__sigma", sqrt(greatest(col("__var"), lit(0.0))))
      .withColumn("__z",
        when(col("__sigma") > 1e-12,
          (col("__segsum") / segLen - col("__mu")) / col("__sigma"))
          .otherwise(lit(0.0))) // flat window: all segments map to the midline
      .withColumn("__sym", symbol(col("__z"), alphabet))
    joined
      .groupBy(keys :+ col("__win").as("win"): _*)
      .agg(concat_ws("", array_sort(collect_list(struct(col("__seg"), col("__sym"))))
        .getField("__sym")).as("sax_word"))
  }
}
