package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Equality specs for the hybrid events executor: the [[LocalEvents]]
  * kernels must produce exactly the distributed window/groupBy
  * transforms' rows — window alignment, session boundaries (gap
  * strictly > 30 min), and rank tie-breaks included. */
class LocalEventsSpec extends SparkSpec {

  private def sorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector).toSeq.sortBy(_.mkString("|"))

  private def bothWays(q: => DataFrame): (Seq[Seq[Any]], Seq[Seq[Any]]) = {
    spark.conf.unset("spark.graft.localEventsMaxRows")
    val local = sorted(q)
    spark.conf.set("spark.graft.localEventsMaxRows", "0")
    val dist = try sorted(q)
    finally spark.conf.unset("spark.graft.localEventsMaxRows")
    (local, dist)
  }

  /** Synthetic stream: gap exactly 30 min (same session), 30 min + 1 µs
    * (new session), equal sums for rank ties, multiple hours. */
  private def microEvents: DataFrame = {
    val s = spark; import s.implicits._
    val min = 60L * 1000000
    Seq(
      // user 101: session of 3 (gaps exactly 30 min = SAME session),
      // then the +1 µs event opens a second session
      (1L, 0L, 101L, "click", 1.5),
      (2L, 30 * min, 101L, "click", 2.5),
      (3L, 60 * min, 101L, "view", 1.0),
      (4L, 90 * min + 1, 101L, "click", 4.0),
      // user 102: rank tie with user 103 on clicks (same total)
      (5L, 10 * min, 102L, "click", 4.0),
      (6L, 200 * min, 102L, "click", 2.0),
      // user 103
      (7L, 15 * min, 103L, "click", 6.0),
      // user 104: single event
      (8L, 500 * min, 104L, "view", 7.25)
    ).toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
  }

  /** Per-user variant where the rank ties are on user_id. */
  private def tieEvents: DataFrame = {
    val s = spark; import s.implicits._
    Seq(
      (1L, 1000L, 10L, "buy", 5.0),
      (2L, 2000L, 11L, "buy", 5.0),
      (3L, 3000L, 12L, "buy", 5.0),
      (4L, 4000L, 13L, "buy", 4.0)
    ).map { case (id, us, uid, et, v) =>
      (id, us, uid, et, v)
    }.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
  }

  test("windowedCounts: kernel ≡ distributed") {
    val (l, d) = bothWays(Events.windowedCounts(microEvents))
    assert(l === d)
    assert(l.nonEmpty)
  }

  test("sessionize: kernel ≡ distributed (boundary gaps)") {
    val (l, d) = bothWays(Events.sessionize(microEvents))
    assert(l === d)
    // user 101: events at 0/30/60 min are ONE session (gap not > 30 min),
    // the 90min+1µs event opens a second
    assert(l.count(_.head == 101L) === 2)
  }

  test("topUsers: kernel ≡ distributed (sum ties rank by user_id)") {
    val (l, d) = bothWays(Events.topUsers(tieEvents, 3))
    assert(l === d)
  }

  test("retention: kernel ≡ distributed; cohort = first active day") {
    val s = spark; import s.implicits._
    val dayUs = 86400L * 1000000
    val ev = Seq(
      // user 1: first day 0, active days 0, 1, 3 (two events day 1)
      (1L, 0L, 1L, "click", 0.0),
      (2L, dayUs + 5, 1L, "click", 0.0),
      (3L, dayUs + 6, 1L, "view", 0.0),
      (4L, 3 * dayUs, 1L, "click", 0.0),
      // user 2: first day 1, active days 1, 3
      (5L, dayUs, 2L, "click", 0.0),
      (6L, 3 * dayUs + 7, 2L, "click", 0.0)
    ).toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val (l, d) = bothWays(Events.retention(ev))
    assert(l === d)
    val m = l.map(r => (r(0), r(1)) -> r(2)).toMap
    assert(m((0L, 0L)) == 1L && m((0L, 1L)) == 1L && m((0L, 3L)) == 1L)
    assert(m((1L, 0L)) == 1L && m((1L, 2L)) == 1L)
    assert(m.size == 5)
  }

  /** As-of/range fixture: equal-us ties (rights at the left's exact us
    * count, highest event_id wins), a left with no prior right, and range
    * endpoints (us - window inclusive, us exclusive). */
  private def asofEvents: DataFrame = {
    val s = spark; import s.implicits._
    val min = 60L * 1000000
    Seq(
      (11L, 0L, 201L, "click", 1.0),
      (12L, 10 * min, 201L, "purchase", 5.0),
      (13L, 20 * min, 201L, "click", 2.0),
      (14L, 20 * min, 201L, "click", 3.0),   // same us as 13: higher id wins
      (15L, 20 * min, 201L, "purchase", 6.0), // right at equal us counts
      (16L, 80 * min, 201L, "purchase", 7.0),
      (21L, 5 * min, 202L, "purchase", 9.0),  // no prior click → nulls
      (22L, 6 * min, 202L, "view", 1.0),      // other types filtered out
      (31L, 0L, 203L, "click", 2.0)           // right-only user → no rows
    ).toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
  }

  test("asofJoin: kernel ≡ distributed; tie-break and null semantics") {
    val (l, d) = bothWays(Events.asofJoin(asofEvents))
    assert(l === d)
    val byId = l.map(r => r.head -> r).toMap
    assert(byId(12L)(4) === 11L, "purchase@10min sees click@0")
    assert(byId(15L)(4) === 14L, "equal-us rights count; max event_id wins")
    assert(byId(16L)(4) === 14L, "latest right carries forward")
    assert(byId(21L)(4) === null && byId(21L)(6) === null, "no prior → null")
    assert(!byId.contains(31L), "right-only user emits nothing")
  }

  test("rangeJoinCounts: kernel ≡ distributed; window endpoints") {
    val (l, d) = bothWays(Events.rangeJoinCounts(asofEvents))
    assert(l === d)
    val byId = l.map(r => r.head -> r).toMap
    // [us-1h, us): click@0 only (clicks at the purchase's own us excluded)
    assert(byId(15L)(3) === 1L && byId(15L)(4) === 1.0)
    // 80min purchase: clicks@20min exactly at us-1h are INCLUDED, click@0 not
    assert(byId(16L)(3) === 2L && byId(16L)(4) === 5.0)
    assert(byId(21L)(3) === 0L && byId(21L)(4) === 0.0, "no-match left kept")
  }

  /** Funnel fixture: full completion, dropout after step 1, a click
    * BEFORE signup (must not count), purchase before click (must not
    * count), and a user with no signup (excluded). */
  private def funnelEvents: DataFrame = {
    val s = spark; import s.implicits._
    val min = 60L * 1000000
    Seq(
      // user 301: signup@10, click@5 (too early), click@20, purchase@30
      (41L, 10 * min, 301L, "signup", 0.0),
      (42L, 5 * min, 301L, "click", 0.0),
      (43L, 20 * min, 301L, "click", 0.0),
      (44L, 30 * min, 301L, "purchase", 0.0),
      // user 302: purchase@5 precedes its click@20 → stops at 2 steps
      (45L, 5 * min, 302L, "purchase", 0.0),
      (46L, 10 * min, 302L, "signup", 0.0),
      (47L, 20 * min, 302L, "click", 0.0),
      // user 303: click/purchase but no signup → not in funnel
      (48L, 1 * min, 303L, "click", 0.0),
      (49L, 2 * min, 303L, "purchase", 0.0)
    ).toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
  }

  test("funnel: kernel ≡ distributed; step ordering constraints") {
    val min = 60L * 1000000
    val (l, d) = bothWays(Events.funnel(funnelEvents))
    assert(l === d)
    val byUser = l.map(r => r.head -> r).toMap
    assert(byUser(301L) ===
      Vector(301L, 10 * min, 20 * min, 30 * min, 3L))
    assert(byUser(302L) === Vector(302L, 10 * min, 20 * min, null, 2L))
    assert(!byUser.contains(303L))
  }

  test("kernel ≡ distributed on sf0.001 events") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val ev = (raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }).persist()
    try {
      val (lw, dw) = bothWays(Events.windowedCounts(ev))
      assert(lw === dw, "windowedCounts")
      val (ls, ds) = bothWays(Events.sessionize(ev))
      assert(ls === ds, "sessionize")
      val (lt, dt) = bothWays(Events.topUsers(ev, 3))
      assert(lt === dt, "topUsers")
      val (la, da) = bothWays(Events.asofJoin(ev))
      assert(la === da, "asofJoin")
      val (lr, dr) = bothWays(Events.rangeJoinCounts(ev))
      assert(lr === dr, "rangeJoinCounts")
      val (lf, df) = bothWays(Events.funnel(ev))
      assert(lf === df, "funnel")
      val (lre, dre) = bothWays(Events.retention(ev))
      assert(lre === dre, "retention")
      val (lp, dp) = bothWays(Events.propsProfile(ev))
      assert(lp === dp, "propsProfile")
      assert(lp.nonEmpty)
      val (lac, dac) = bothWays(Events.activeUsers(ev))
      assert(lac === dac, "activeUsers")
      val (lpk, dpk) = bothWays(Events.peakConcurrency(ev))
      assert(lpk === dpk, "peakConcurrency")
      val (lrf, drf) = bothWays(Events.rfm(ev))
      assert(lrf === drf, "rfm")
      assert(lrf.nonEmpty)
    } finally ev.unpersist()
  }

  test("rfm: kernel ≡ distributed; exact micro-quantized monetary") {
    val s = spark; import s.implicits._
    val ev = Seq(
      (1L, 1000L, 10L, "purchase", 0.1),
      (2L, 5000L, 10L, "purchase", 0.2),
      (3L, 3000L, 10L, "click", 99.9), // non-purchase value ignored
      (4L, 2000L, 11L, "view", 1.0) // zero purchases
    ).toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val (l, d) = bothWays(Events.rfm(ev))
    assert(l === d)
    val rows = l.map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long],
      r(2).asInstanceOf[Long], r(3).asInstanceOf[Long],
      r(4).asInstanceOf[Double])).sortBy(_._1)
    // 0.1 and 0.2 quantize to exactly 100000 + 200000 µunits = 0.3
    // (the naive double sum would be 0.30000000000000004)
    assert(rows === Seq((10L, 5000L, 3L, 2L, 0.3), (11L, 2000L, 1L, 0L, 0.0)))
  }

  test("audienceOverlap: type-pair distinct users, diagonal = audience") {
    val s = spark; import s.implicits._
    val ev = Seq(
      (1L, 1000L, 1L, "click", 0.0), (2L, 2000L, 1L, "click", 0.0),
      (3L, 3000L, 1L, "view", 0.0),
      (4L, 1000L, 2L, "click", 0.0),
      (5L, 1000L, 3L, "view", 0.0)
    ).toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val out = Events.audienceOverlap(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("click", "click") -> 2L, ("view", "view") -> 2L,
      ("click", "view") -> 1L))
  }

  test("attribution: exact integer split, remainder to latest click") {
    val s = spark; import s.implicits._
    val min = 60L * 1000000
    val ev = Seq(
      // user 1: three clicks then a purchase → 333333/333333/333334
      (1L, 10 * min, 1L, "click", 0.0),
      (2L, 20 * min, 1L, "click", 0.0),
      (3L, 30 * min, 1L, "click", 0.0),
      (4L, 40 * min, 1L, "purchase", 9.0),
      // user 1: second purchase sees only the later click e6
      (6L, 50 * min, 1L, "click", 0.0),
      (5L, 95 * min, 1L, "purchase", 5.0),
      // user 2: click with no purchase → no row
      (7L, 10 * min, 2L, "click", 0.0),
      // user 3: purchase with no clicks → no rows
      (8L, 10 * min, 3L, "purchase", 1.0),
      // user 4: click exactly window-start before the purchase counts
      (9L, 0L, 4L, "click", 0.0),
      (10L, 60 * min, 4L, "purchase", 2.0)
    ).toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val out = Events.attribution(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out === Map(
      1L -> ((1L, 333333L)), 2L -> ((1L, 333333L)), 3L -> ((1L, 333334L)),
      6L -> ((1L, 1000000L)), 9L -> ((1L, 1000000L))))
  }

  test("sessionStats: histogram over sessionize, both gate paths") {
    val (l, d) = bothWays(Events.sessionStats(microEvents))
    assert(l === d)
    // sessions: u101 [3 events, 2 events... see sessionize test] — sizes:
    // u101 → 3-event + 1-event, u102 → two 1-event, u103/104 → 1-event
    val m = l.map(r => r.head -> r(1)).toMap
    assert(m(3L) === 1L)
    assert(m(1L) === 5L)
  }

  test("latestRecord: kernel ≡ distributed; last write by (ts, event_id)") {
    val s = spark; import s.implicits._
    val ev = Seq(
      // user 10: later ts wins regardless of event_id order
      (5L, 1000L, 10L, "click", 1.0),
      (2L, 3000L, 10L, "view", 2.0),
      // user 11: equal ts — larger event_id wins (last write)
      (7L, 500L, 11L, "buy", 3.0),
      (8L, 500L, 11L, "click", 4.0),
      // user 12: single event
      (9L, 42L, 12L, "view", 5.5)
    ).toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val (l, d) = bothWays(Events.latestRecord(ev))
    assert(l === d)
    val m = l.map(r => r.head -> (r(1), r(2), r(3), r(4))).toMap
    assert(m(10L) === ((2L, 3000L, "view", 2.0)))
    assert(m(11L) === ((8L, 500L, "click", 4.0)))
    assert(m(12L) === ((9L, 42L, "view", 5.5)))
    assert(m.size === 3)
  }

  test("dwellByType: kernel ≡ distributed; gap attributed to prior type") {
    val s = spark; import s.implicits._
    val ev = Seq(
      // user 1: view →(10µs)→ click →(5µs)→ view; last event no dwell
      (1L, 100L, 1L, "view", 0.0),
      (2L, 110L, 1L, "click", 0.0),
      (3L, 115L, 1L, "view", 0.0),
      // user 2: click →(7µs)→ click; equal-ts tie broken by event_id
      (4L, 200L, 2L, "click", 0.0),
      (5L, 207L, 2L, "click", 0.0),
      // user 3: single event — contributes nothing
      (6L, 999L, 3L, "buy", 0.0)
    ).toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val (l, d) = bothWays(Events.dwellByType(ev))
    assert(l === d)
    val m = l.map(r => r.head -> (r(1), r(2), r(3), r(4), r(5))).toMap
    // view: one 10µs dwell; click: 5µs (u1) and 7µs (u2) → avg 6
    assert(m("view") === ((1L, 10L, 10L, 10L, 10L)))
    assert(m("click") === ((2L, 5L, 7L, 12L, 6L)))
    assert(!m.contains("buy"))
  }

  test("propsProfile kernel refuses exotic JSON (falls back distributed)") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    // nested object and quoted number — get_json_object territory the
    // strict kernel parser must NOT guess at
    val ev = Seq(
      (1L, 1000L, 1L, "a", 1.0, """{"k": {"x": 1}}"""),
      (2L, 2000L, 1L, "a", 1.0, """{"k": "7"}"""),
      (3L, 3000L, 2L, "b", 1.0, """{"k": 9}"""))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val (l, d) = bothWays(Events.propsProfile(ev))
    assert(l === d) // kernel declined → both sides ARE the distributed plan
    // quoted "7" still lands in decade 0 via get_json_object semantics
    assert(d.exists(r => r.head == "a" && r(1) == 0L))
  }
}
