package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{EventOps, SeasonalOps}
import graft.queries.Q.dec6

/** Closed-form boundaries of the round-7 event-analytics additions:
  * journey trigrams, winsorized stats, conversion lag (incl. the
  * to-before-from trap), gap outages, and the correlation matrix. */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("journeyTrigrams: counts and deterministic order on a known stream") {
    // user 1: a b c d  -> (a,b,c), (b,c,d); user 2: a b c -> (a,b,c)
    val rows = Seq(
      (1L, ts(0), 1L, "a"), (1L, ts(1), 2L, "b"), (1L, ts(2), 3L, "c"),
      (1L, ts(3), 4L, "d"),
      (2L, ts(0), 5L, "a"), (2L, ts(1), 6L, "b"), (2L, ts(2), 7L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = EventOps.journeyTrigrams(rows, "user_id", "ts", "event_id",
      "event_type", topK = 10, dec6).collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "a" && out(0).getString(2) == "c" &&
      out(0).getLong(3) == 2)
    assert(out(1).getString(0) == "b" && out(1).getLong(3) == 1)
    assert(math.abs(out(0).getDouble(4) - 2.0 / 3) < 1e-6)
  }

  test("winsorizedStats: clamp moves the mean, bounds count the clipped rows") {
    // 19 values of 10 plus one wild 1000: p95 of the 20 values clips it
    val rows = ((1 to 19).map(i => ("g", 10.0)) :+ ("g", 1000.0))
      .toDF("event_type", "value")
    val r = EventOps.winsorizedStats(rows, "event_type", "value",
      pLo = 0.05, pHi = 0.95, dec6).head()
    assert(r.getLong(1) == 20)
    assert(r.getLong(3) == 1, s"hi clips ${r.getLong(3)}") // the 1000
    val mRaw = r.getDouble(6); val mWin = r.getDouble(7)
    assert(mRaw > 59 && mRaw < 60, s"raw mean $mRaw")     // 59.5
    assert(mWin < mRaw - 40, s"winsorized $mWin vs raw $mRaw")
  }

  test("conversionLag: to-events BEFORE the first from must not erase the user") {
    val rows = Seq(
      // u1 converts 30 min after first view
      (1L, ts(0), "view"), (1L, ts(30), "purchase"),
      // u2: purchase BEFORE any view — counts as unconverted, not dropped
      (2L, ts(0), "purchase"), (2L, ts(10), "view"),
      // u3: view only
      (3L, ts(5), "view")
    ).toDF("user_id", "ts", "event_type")
    val r = EventOps.conversionLag(rows, "user_id", "ts", "event_type",
      "view", "purchase", dec6).head()
    assert(r.getLong(0) == 3, s"users_from ${r.getLong(0)}")
    assert(r.getLong(1) == 1, s"converted ${r.getLong(1)}")
    assert(math.abs(r.getDouble(2) - 1.0 / 3) < 1e-6)
    assert(math.abs(r.getDouble(3) - 1800.0) < 1e-6, s"median ${r.getDouble(3)}")
  }

  test("gapOutages: finds exactly the planted gap") {
    val rows = Seq(
      ("s", ts(0)), ("s", ts(60)), ("s", ts(60 + 200)), ("s", ts(60 + 260)),
      ("t", ts(0)), ("t", ts(30))
    ).toDF("event_type", "ts")
    val out = EventOps.gapOutages(rows, "event_type", "ts", minGapHours = 2.0,
      dec6).collect()
    assert(out.length == 1)
    val g = out.head
    assert(g.getString(0) == "s" && g.getTimestamp(1) == ts(60))
    assert(math.abs(g.getDouble(3) - 200.0 / 60) < 1e-6, s"hours ${g.getDouble(3)}")
  }

  test("conversionLag: zero conversions give null percentiles, exact counts") {
    val rows = Seq((1L, ts(0), "view"), (2L, ts(5), "view"))
      .toDF("user_id", "ts", "event_type")
    val r = EventOps.conversionLag(rows, "user_id", "ts", "event_type",
      "view", "purchase", dec6).head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 0)
    assert(r.getDouble(2) == 0.0)
    assert(r.isNullAt(3) && r.isNullAt(4), "no lags -> null percentiles")
  }

  test("coEngagement: single-type users produce no pairs; two-type overlap exact") {
    val rows = Seq(
      (1L, "a"), (1L, "b"),        // user 1 does both
      (2L, "a"), (3L, "b"), (4L, "a")
    ).toDF("user_id", "event_type")
    val out = EventOps.coEngagement(rows, "user_id", "event_type", dec6)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 3 && r.getLong(3) == 2 && r.getLong(4) == 1)
    assert(math.abs(r.getDouble(5) - 0.25) < 1e-6, s"jaccard ${r.getDouble(5)}") // 1/(3+2-1)
  }

  test("rollingActiveUsers: window carry-forward counts each user once") {
    // one user active on days 1 and 2: day-3 window must count them once
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (1L, Timestamp.valueOf("2024-01-02 10:00:00")),
      (2L, Timestamp.valueOf("2024-01-03 10:00:00"))
    ).toDF("user_id", "ts")
    val out = EventOps.rollingActiveUsers(rows, "user_id", "ts", windowDays = 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("2024-01-01" -> 1, "2024-01-02" -> 1, "2024-01-03" -> 2),
      s"got $out")
  }

  test("timeDecayAttribution: hand-computed half-life weights; revenue conserved") {
    def t(h: Int) = Timestamp.valueOf(f"2024-01-03 $h%02d:00:00")
    val rows = Seq(
      // user 1: touch a at -48h (w 0.25), b at -24h (w 0.5), conv 100
      (1L, Timestamp.valueOf("2024-01-01 12:00:00"), 1L, "a", 0.0),
      (1L, Timestamp.valueOf("2024-01-02 12:00:00"), 2L, "b", 0.0),
      (1L, Timestamp.valueOf("2024-01-03 12:00:00"), 3L, "purchase", 100.0),
      // user 2: touchless conversion -> (none)
      (2L, t(1), 4L, "purchase", 50.0),
      // user 3: touch after the conversion earns nothing
      (3L, t(1), 5L, "purchase", 10.0), (3L, t(2), 6L, "a", 0.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = EventOps.timeDecayAttribution(rows, "user_id", "ts",
        "event_id", "event_type", "value", "purchase",
        halfLifeHours = 24.0, scoreOut = dec6)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // weights 0.25 / 0.5 -> credits 100/3 and 200/3
    assert(out("a") == ((1L, 33.333333)), s"${out("a")}")
    assert(out("b") == ((1L, 66.666667)), s"${out("b")}")
    // user 2's conversion keeps its value; user 3's is touchless too
    assert(out("(none)") == ((2L, 60.0)), s"${out("(none)")}")
    // conservation: every credited conversion's value is fully distributed
    assert(math.abs(out.values.map(_._2).sum - 160.0) < 1e-5)
  }

  test("seriesCorrMatrix: perfect anti-correlation and the upper triangle") {
    val rows = (0 until 48).flatMap { i =>
      Seq(("a", ts(i * 60), 10.0 + i), ("b", ts(i * 60), 100.0 - i),
        ("c", ts(i * 60), if (i % 2 == 0) 1.0 else 2.0))
    }.toDF("event_type", "ts", "value")
    val out = SeasonalOps.seriesCorrMatrix(rows, "event_type", "ts", "value",
      dec6).collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size == 3) // (a,b) (a,c) (b,c): upper triangle only
    assert(out.keys.forall { case (x, y) => x < y })
    val ab = out(("a", "b"))
    assert(ab.getLong(2) == 48)
    assert(math.abs(ab.getDouble(3) + 1.0) < 1e-6, s"corr ${ab.getDouble(3)}")
  }

  test("activityStreaks: islands, longest streak, earliest-start tie") {
    def day(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 09:30:00")
    val rows = Seq(
      // user 1: Jan 1-3 and Jan 5-6 → longest 3 (Jan 1-3); a same-day
      // duplicate event must collapse
      (1L, day(1)), (1L, day(1)), (1L, day(2)), (1L, day(3)),
      (1L, day(5)), (1L, day(6)),
      // user 2: two streaks of 2 → tie goes to the EARLIEST start
      (2L, day(1)), (2L, day(2)), (2L, day(4)), (2L, day(5))
    ).toDF("user_id", "ts")
    val out = EventOps.activityStreaks(rows, "user_id", "ts")
      .collect().map(r => r.getLong(0) -> r).toMap
    val u1 = out(1L)
    assert(u1.getLong(1) == 5L && u1.getLong(2) == 2L && u1.getLong(3) == 3L)
    assert(u1.getString(4) == "2024-01-01" && u1.getString(5) == "2024-01-03")
    val u2 = out(2L)
    assert(u2.getLong(3) == 2L && u2.getString(4) == "2024-01-01"
      && u2.getString(5) == "2024-01-02")
  }

  test("itemNeighbors: cosine from co-occurrence counts, both directions") {
    val rows = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"),
        (3L, "c"), (3L, "a")) // duplicate interaction must collapse
      .toDF("u", "item")
    val out = EventOps.itemNeighbors(rows, "u", "item", k = 5, scoreOut = dec6)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // n: a=3 b=2 c=1; pairs ab=2 ac=1 → cos ab = 2/√6, ac = 1/√3
    val ab = out(("a", "b"))
    assert(ab.getLong(2) == 3L && ab.getLong(3) == 2L && ab.getLong(4) == 2L)
    assert(ab.getDouble(5) == 0.816497 && ab.getInt(6) == 1)
    assert(out(("a", "c")).getInt(6) == 2)           // a's 2nd neighbor
    assert(out(("b", "a")).getDouble(5) == 0.816497) // mirrored direction
    assert(!out.contains(("b", "c")))                // never co-occur
  }

  test("itemNeighbors: maxBasket caps a power user to the B most recent items") {
    def ts(m: Int) = new Timestamp(1704067200000L + m * 60000L)
    // power user 1: 50 items, recency increasing with item id; user 2
    // shares only the two MOST-RECENT of them (items 48, 49)
    val power = (0 until 50).map(i => (1L, f"i$i%02d", ts(i)))
    val rows = (power ++ Seq((2L, "i48", ts(100)), (2L, "i49", ts(101))))
      .map { case (u, i, t) => (u, i, t) }.toDF("u", "item", "ts")
    val out = EventOps.itemNeighbors(rows, "u", "item", k = 100,
      scoreOut = dec6, maxBasket = 3, recencyCol = Some("ts"))
      .collect()
    // capped basket for user 1 = {i47, i48, i49}: pair fanout is 3²-bounded
    // (3 undirected pairs → 6 directed rows), not 50²
    assert(out.length == 6)
    val pairs = out.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("i47", "i48"), ("i47", "i49"), ("i48", "i49"),
      ("i48", "i47"), ("i49", "i47"), ("i49", "i48")))
    // totals are computed over the CAPPED matrix: i48 kept for both users
    val m = out.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(m(("i48", "i49")).getLong(2) == 2L && m(("i48", "i49")).getLong(4) == 2L)
    assert(m(("i47", "i48")).getLong(2) == 1L)
  }

  test("shapleyAttribution: hand-worked 2-channel game + efficiency axiom") {
    // v(∅)=0 (4 users, 0 convert), v({A})=0.25, v({B})=0.5, v({A,B})=0.75
    // → φ_A = ½(v(A)−v(∅)) + ½(v(AB)−v(B)) = 0.125 + 0.125 = 0.25
    //   φ_B = ½(v(B)−v(∅)) + ½(v(AB)−v(A)) = 0.25  + 0.25  = 0.5
    // all sets observed → efficiency holds: Σφ = v(AB) − v(∅) = 0.75
    def u(id: Long, types: String*) = types.map(t => (id, t))
    val rows = (
      (1L to 4L).flatMap(i => u(i, "noise")) ++                // ∅, 0/4
      (11L to 14L).flatMap(i => u(i, "A")) ++ u(11L, "conv") ++ // A, 1/4
      (21L to 24L).flatMap(i => u(i, "B")) ++
        u(21L, "conv") ++ u(22L, "conv") ++                     // B, 2/4
      (31L to 34L).flatMap(i => u(i, "A", "B")) ++
        u(31L, "conv") ++ u(32L, "conv") ++ u(33L, "conv")      // AB, 3/4
    ).toDF("u", "t")
    val out = EventOps.shapleyAttribution(rows, "u", "t",
        channels = Seq("A", "B"), conversionType = "conv", scoreOut = dec6)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("A" -> 0.25, "B" -> 0.5), s"got $out")
  }

  test("growthAccounting: new/retained/resurrected/churned telescoping") {
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // weeks: w1=Jan1, w2=Jan8, w3=Jan15. u1 active w1,w2,w3 (new,
    // retained, retained); u2 active w1, w3 (new, resurrected; NOT
    // churned in w2's ledger — churn lands the week AFTER last activity);
    // u3 active w1 only (new, churned in w2)
    val rows = Seq((1L, ts(1)), (1L, ts(9)), (1L, ts(16)),
      (2L, ts(2)), (2L, ts(17)), (3L, ts(3)))
      .toDF("user_id", "ts")
    val out = EventOps.growthAccounting(rows, "user_id", "ts")
      .collect().map(r => r.getString(0) -> r).toMap
    def w(k: String) = (out(k).getLong(1), out(k).getLong(2),
      out(k).getLong(3), out(k).getLong(4))
    assert(w("2024-01-01") == ((3L, 0L, 0L, 0L)))
    assert(w("2024-01-08") == ((0L, 1L, 0L, 2L))) // u2+u3 churn here
    assert(w("2024-01-15") == ((0L, 1L, 1L, 0L))) // u2 resurrects
    assert(w("2024-01-22") == ((0L, 0L, 0L, 2L))) // u1+u2 horizon churn
  }

  test("revenueCohorts: week assignment, dollar retention, week-0 share") {
    def ts(d: Int, h: Int = 9) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // 2024-01-01 is a Monday. u1 starts week 1 (rev 10), returns week 2
    // (rev 5); u2 starts week 1 (rev 20) and never returns; u3 starts
    // week 2 (rev 8)
    val rows = Seq((1L, ts(1), 10.0), (1L, ts(9), 5.0),
      (2L, ts(2), 20.0), (3L, ts(10), 8.0))
      .toDF("user_id", "ts", "value")
    val out = EventOps.revenueCohorts(rows, "user_id", "ts", "value", dec6)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    val w10 = out(("2024-01-01", 0))
    assert(w10.getLong(2) == 2L && w10.getDouble(3) == 30.0
      && w10.getDouble(4) == 1.0)
    val w11 = out(("2024-01-01", 1))
    assert(w11.getLong(2) == 1L && w11.getDouble(3) == 5.0)
    assert(math.abs(w11.getDouble(4) - 5.0 / 30.0) < 1e-6)
    val w20 = out(("2024-01-08", 0))
    assert(w20.getLong(2) == 1L && w20.getDouble(3) == 8.0)
    assert(out.size == 3)
  }

  test("rfmSegments: hand quintiles, scores and segment labels") {
    // user u: u events on day u, value u each -> rec = 10-u, freq = u,
    // mon = u^2; every metric has distinct values so cuts are hand-known
    val rows = for (u <- 1 to 10; i <- 1 to u)
      yield (u.toLong, Timestamp.valueOf(f"2024-01-$u%02d ${i}%02d:00:00"), u.toDouble)
    val df = rows.toDF("user_id", "ts", "value")
    val out = EventOps.rfmSegments(df, "user_id", "ts", "value", dec6)
      .collect().map(r => r.getLong(0) -> r).toMap
    def scores(u: Long) = (out(u).getInt(4), out(u).getInt(5), out(u).getInt(6))
    // rec cuts (1.8, 3.6, 5.4, 7.2), freq cuts (2.8, 4.6, 6.4, 8.2),
    // mon cuts (8, 21.4, 41.2, 67.4) — strict threshold counting:
    assert(scores(7L) == ((4, 4, 4)) && out(7L).getString(7) == "champion")
    assert(scores(3L) == ((2, 2, 2)) && out(3L).getString(7) == "hibernating")
    assert(scores(10L) == ((5, 5, 5)) && out(10L).getString(7) == "champion")
    assert(scores(5L) == ((3, 3, 3)) && out(5L).getString(7) == "regular")
    assert(out(1L).getString(7) == "hibernating")
    assert(out(10L).getInt(1) == 0 && out(1L).getInt(1) == 9) // recency days
    assert(out(6L).getLong(2) == 6L && out(6L).getDouble(3) == 36.0)
  }
}
