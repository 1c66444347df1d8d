package graft

import java.nio.file.Files
import graft.pipeline.KilnSources
import org.apache.spark.sql.functions._

/** Replays the reference's exact table schemas (FIXTURES.md §A) through the
  * CSV loaders, reshapes, and the aligned-matrix builder. */
class KilnSourcesSpec extends SparkSpec {

  private val positions = Seq("O/L CONE", "1st no.")
  private lazy val dir = {
    val d = Files.createTempDirectory("kiln").toString
    def w(name: String, content: String): Unit =
      Files.writeString(java.nio.file.Paths.get(s"$d/$name"), content)
    w("zone_temperature.csv",
      "DATETIME," + (0 to 10).map(z => s"ZONE_$z").mkString(",") + "\n" +
        (0 until 180).map { i =>
          val ts = f"2024-06-01 ${i * 2 / 60}%02d:${i * 2 % 60}%02d:00"
          s"$ts," + (0 to 10).map(z => (800.0 + z).toString).mkString(",")
        }.mkString("\n"))
    w("qrt_temperature.csv",
      "DATETIME,ZONE,TEMPERATURE\n" +
        (for (h <- 0 until 6 by 2; z <- 2 to 10)
          yield f"2024-06-01 $h%02d:00:00,$z,${900.0 + z}").mkString("\n"))
    w("shell_temperature.csv",
      "DATE,POSITION,SHELL_TEMP_0,SHELL_TEMP_90,SHELL_TEMP_180,SHELL_TEMP_270,SHELL_TEMP_AVG\n" +
        positions.map(p => s"""2024-06-01,"$p",100,110,120,130,115""").mkString("\n"))
    w("air_calibration.csv",
      "DATE,FAN,DAMPER,VELOCITY,AIR_FLOW\n" +
        KilnSources.fans.map(f => s"2024-06-01,$f,45,12,55000").mkString("\n"))
    w("mis_report.csv",
      "DATE,CAMP_DAY,PRODUCTION ACTUAL,PRODUCTION PLAN,IRON ORE CONSUMPTION," +
        "GROSS COAL CONSUMPTION,COAL_PER_TDRI,POWER,KILN_AVAILABILITY,FEED_LOSS_REASON\n" +
        "2024-06-01,1,450,500,700,300,0.66,120,98.5,Normal operation")
    d
  }

  test("loaders parse the exact reference schemas, including spaced MIS columns") {
    val mis = KilnSources.loadMis(spark, s"$dir/mis_report.csv")
    assert(mis.count() == 1)
    assert(mis.select(col("`PRODUCTION ACTUAL`")).head.getDouble(0) == 450.0)
    assert(KilnSources.loadZone(spark, s"$dir/zone_temperature.csv").count() == 180)
  }

  test("qrt pivot emits QRT_ZONE_k; air pivot emits MEASURE_FAN flattened names") {
    val qrtW = KilnSources.qrtWide(KilnSources.loadQrt(spark, s"$dir/qrt_temperature.csv"))
    assert((2 to 10).forall(z => qrtW.columns.contains(s"QRT_ZONE_$z")))
    val airW = KilnSources.airWide(KilnSources.loadAir(spark, s"$dir/air_calibration.csv"))
    assert(airW.columns.contains("DAMPER_SAF02") && airW.columns.contains("AIR_FLOW_CB"))
    assert(airW.select(col("VELOCITY_SAF05")).head.getDouble(0) == 12.0)
  }

  test("zone wide->long discovers columns by name pattern and parses zone ids") {
    val long = KilnSources.zoneWideToLong(KilnSources.loadZone(spark, s"$dir/zone_temperature.csv"))
    assert(long.count() == 180L * 11)
    assert(long.filter(col("zone") === 7).select(avg("temp")).head.getDouble(0) == 807.0)
  }

  test("alignAll builds the prefixed hourly matrix with ffilled sparse sources") {
    val m = KilnSources.alignAll(
      KilnSources.loadZone(spark, s"$dir/zone_temperature.csv"),
      KilnSources.loadQrt(spark, s"$dir/qrt_temperature.csv"),
      KilnSources.loadShell(spark, s"$dir/shell_temperature.csv"),
      KilnSources.loadAir(spark, s"$dir/air_calibration.csv"),
      KilnSources.loadMis(spark, s"$dir/mis_report.csv"),
      positions).cache()
    assert(m.count() == 6) // 6 hourly slots from the 2-min zone data
    val cols = m.columns.toSet
    assert(cols.contains("ZONE_0") && cols.contains("qrt_QRT_ZONE_5"))
    assert(cols.contains("air_DAMPER_SAF02") && cols.contains("mis_PRODUCTION_ACTUAL"))
    assert(cols.contains("shell_SHELL_TEMP_AVG_O_L_CONE"))
    // qrt is 2-hourly: odd hours must carry the previous reading (ffill)
    val hour3 = m.filter(hour(col("ts")) === 3).select(col("qrt_QRT_ZONE_5")).head
    assert(!hour3.isNullAt(0) && hour3.getDouble(0) == 905.0)
    // daily mis value present on every hourly slot
    assert(m.filter(col("mis_PRODUCTION_ACTUAL") === 450.0).count() == 6)
  }
}
