package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

class EventsSpec extends SparkSpec {

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  private def evDf(rows: Ev*) = {
    val s = spark; import s.implicits._
    rows.toDF()
  }

  test("sessionize splits on >30min gaps") {
    val d = evDf(
      Ev(0, ts(0), 1, "a", 1.0), Ev(1, ts(10), 1, "a", 2.0),
      Ev(2, ts(50), 1, "a", 3.0),              // 40min gap → new session
      Ev(3, ts(5), 2, "b", 4.0))
    val r = Events.sessionize(d).orderBy("user_id", "session_idx").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq === Seq((1L, 1L, 2L, 600000000L), (1L, 2L, 1L, 0L),
      (2L, 1L, 1L, 0L)))
  }

  test("sessionWindows: native merge, exact-gap boundary MERGES (>)") {
    val d = evDf(
      Ev(0, ts(0), 1, "a", 1.5), Ev(1, ts(10), 1, "a", 2.0),
      Ev(2, ts(40), 1, "a", 3.0), // exactly 30min after ts(10): merges
      Ev(4, Timestamp.valueOf("2024-01-01 01:10:01"), 1, "a", 0.5),
      Ev(3, ts(5), 2, "b", 4.0))
    val r = Events.sessionWindows(d).orderBy("user_id", "start_us")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4)))
    val base = 1704067200L * 1000000L // 2024-01-01 00:00:00 UTC in µs
    val gap = 1800000000L
    assert(r.toSeq === Seq(
      // touching windows merge: 3 events through the exact-30min gap
      (1L, base, base + 2400000000L + gap, 3L, 6500000L),
      // 30min 1s after ts(40) → strictly greater → new session
      (1L, base + 4201000000L, base + 4201000000L + gap, 1L, 500000L),
      (2L, base + 300000000L, base + 300000000L + gap, 1L, 4000000L)))
  }

  test("activityDiff: full-outer reconciliation classifies all four ways") {
    def at(day: Int, h: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    val d = evDf(
      Ev(0, at(1, 1), 1, "a", 0.0), Ev(1, at(1, 2), 1, "a", 0.0), // dropped
      Ev(2, at(1, 3), 2, "a", 0.0), Ev(3, at(2, 1), 2, "a", 0.0), // same 1:1
      Ev(4, at(1, 4), 3, "a", 0.0), Ev(5, at(2, 2), 3, "a", 0.0),
      Ev(6, at(2, 3), 3, "a", 0.0),                               // changed
      Ev(7, at(2, 4), 4, "a", 0.0))                               // added
    val r = Events.activityDiff(d, "2024-01-01", "2024-01-02",
        "2024-01-02", "2024-01-03")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getString(3))).sortBy(_._1)
    assert(r.toSeq === Seq(
      (1L, 2L, 0L, "dropped"), (2L, 1L, 1L, "same"),
      (3L, 1L, 2L, "changed"), (4L, 0L, 1L, "added")))
  }

  test("peakConcurrency: interval sweep, ties start-before-end") {
    // user 1: session [00:00, 00:10]; user 2: session [00:10, 00:15]
    // (start tied with user 1's end → both open at 00:10 → peak 2);
    // user 3: singleton at 02:00 in a later hour bucket
    val d = evDf(
      Ev(0, ts(0), 1, "a", 0.0), Ev(1, ts(10), 1, "a", 0.0),
      Ev(2, ts(10), 2, "a", 0.0), Ev(3, ts(15), 2, "a", 0.0),
      Ev(4, Timestamp.valueOf("2024-01-01 02:00:00"), 3, "a", 0.0))
    val r = Events.peakConcurrency(d).orderBy("hour_bucket").collect()
      .map(x => (x.getLong(1), x.getLong(2)))
    assert(r.toSeq === Seq((2L, 2L), (1L, 1L)))
    // partition-count robustness of the two-phase prefix sum
    val r1 = Events.peakConcurrency(d.repartition(7))
      .orderBy("hour_bucket").collect().map(x => (x.getLong(1), x.getLong(2)))
    assert(r1.toSeq === r.toSeq)
  }

  test("windowedCounts tumbling hour") {
    val d = evDf(Ev(0, ts(1), 1, "a", 1.5), Ev(1, ts(59), 2, "a", 2.5),
      Ev(2, ts(30), 3, "b", 1.0))
    val r = Events.windowedCounts(d).orderBy("event_type").collect()
    assert(r.length === 2)
    assert(r(0).getLong(2) === 2L && r(0).getDouble(3) === 4.0)
  }

  test("rollingActivity: RANGE frame ages inactive days out of the window") {
    def tsDay(d: Int): Timestamp = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    val d = evDf(
      Ev(0, tsDay(1), 1, "a", 1.5), Ev(1, tsDay(1), 1, "a", 0.5),
      Ev(2, tsDay(3), 1, "a", 2.0),
      Ev(3, tsDay(10), 1, "a", 4.0), // 7 days after day 3 → alone in window
      Ev(4, tsDay(2), 2, "b", 1.0))
    val r = Events.rollingActivity(d, 7).orderBy("user_id", "day").collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5)))
    // user 1 day1: 2 events, 2.0 = 2_000_000 micros
    assert(r(0) === ((1L, 2L, 2000000L, 2L, 2000000L)))
    // day3: rolling window [day-3..day3] covers day1+day3
    assert(r(1) === ((1L, 1L, 2000000L, 3L, 4000000L)))
    // day10: window [day4..day10] — day3 aged out
    assert(r(2) === ((1L, 1L, 4000000L, 1L, 4000000L)))
    assert(r(3) === ((2L, 1L, 1000000L, 1L, 1000000L)))
  }

  test("hourlyAnomalies: exact integer z-predicate flags the burst hour") {
    def tsh(h: Int, n: Int): Seq[Ev] =
      (0 until n).map(i => Ev(h * 100L + i,
        Timestamp.valueOf(f"2024-01-01 $h%02d:${i % 60}%02d:00"), i.toLong,
        "a", 1.0))
    // hours 0-8 have 10 events each, hour 9 has 100 → clear outlier
    val d = evDf((0 to 8).flatMap(h => tsh(h, 10)) ++ tsh(9, 100): _*)
    val r = Events.hourlyAnomalies(d, 2L).orderBy("w_start").collect()
      .map(x => (x.getLong(2), x.getLong(5)))
    assert(r.length === 10)
    assert(r.take(9).forall { case (n, flag) => n == 10L && flag == 0L })
    assert(r(9) === ((100L, 1L)))
    // uniform counts: var_num = "0" (decimal rendered as a digit
    // string — wider than int64 at scale), nothing flagged
    val u = evDf((0 to 3).flatMap(h => tsh(h, 5)): _*)
    val ru = Events.hourlyAnomalies(u, 2L).collect()
    assert(ru.forall(x => x.getString(4) == "0" && x.getLong(5) == 0L))
  }

  test("typeTransitions: per-user consecutive pairs, exact conditionals") {
    val d = evDf(
      Ev(0, ts(0), 1, "view", 1.0), Ev(1, ts(1), 1, "view", 1.0),
      Ev(2, ts(2), 1, "buy", 1.0),
      Ev(3, ts(0), 2, "view", 1.0), Ev(4, ts(1), 2, "buy", 1.0),
      Ev(5, ts(0), 3, "buy", 1.0)) // single event → no transition
    val r = Events.typeTransitions(d).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getDouble(4))).toMap
    // from view: view→view once, view→buy twice → c1 = 3
    assert(r(("view", "view")) == ((1L, 3L, 0.333333)))
    assert(r(("view", "buy")) == ((2L, 3L, 0.666667)))
    assert(r.size == 2) // "buy" is never a from-state with a successor
  }

  test("gapStats: same-type per-user gaps, exact percentiles") {
    val d = evDf(
      Ev(0, ts(0), 1, "a", 1.0), Ev(1, ts(1), 1, "a", 1.0),  // gap 60 s
      Ev(2, ts(4), 1, "a", 1.0),                             // gap 180 s
      Ev(3, ts(2), 1, "b", 1.0),                             // interleaved type
      Ev(4, ts(0), 2, "a", 1.0), Ev(5, ts(2), 2, "a", 1.0))  // gap 120 s
    val r = Events.gapStats(d).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getLong(5))).toMap
    // type a gaps: 60e6, 180e6, 120e6 µs → doubled median 240e6
    assert(r("a") == ((3L, 60000000L, 240000000L, 180000000L, 360000000L)))
    assert(!r.contains("b")) // single event → no gap
  }

  test("topUsers ranks by total value") {
    val d = evDf(Ev(0, ts(1), 1, "a", 5.0), Ev(1, ts(2), 2, "a", 9.0),
      Ev(2, ts(3), 1, "a", 1.0))
    val r = Events.topUsers(d, 2).orderBy("rank").collect()
      .map(x => (x.getLong(1), x.getLong(2)))
    assert(r.toSeq === Seq((2L, 1L), (1L, 2L)))  // 9.0 beats 6.0
  }

  test("sessionizeStream carries session state across micro-batches") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Events.sessionizeStream(spark, mem.toDF())
      .writeStream.format("memory").queryName("sess")
      .outputMode("update").start()
    try {
      // batch 1: two close events → session 1 with 2 events
      mem.addData(Ev(0, ts(0), 1, "a", 1.0), Ev(1, ts(5), 1, "a", 1.0))
      q.processAllAvailable()
      val r1 = spark.sql("SELECT * FROM sess ORDER BY last_us DESC LIMIT 1").head()
      assert(r1.getLong(1) === 1L && r1.getLong(2) === 2L)
      // batch 2: 40-min gap (state remembered across batches) → session 2
      mem.addData(Ev(2, ts(45), 1, "a", 1.0))
      q.processAllAvailable()
      val r2 = spark.sql("SELECT * FROM sess ORDER BY last_us DESC LIMIT 1").head()
      assert(r2.getLong(1) === 2L && r2.getLong(2) === 1L)
    } finally q.stop()
  }

  test("funnelStream advances per-user step state across micro-batches") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Events.funnelStream(spark, mem.toDF(),
        Seq("signup", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    try {
      // batch 1: user 1 signs up and clicks; a click BEFORE the signup
      // must not count; user 2 clicks with no signup (no output row)
      mem.addData(
        Ev(1, ts(5), 1, "click", 0.0),
        Ev(2, ts(10), 1, "signup", 0.0),
        Ev(3, ts(20), 1, "click", 0.0),
        Ev(4, ts(1), 2, "click", 0.0))
      q.processAllAvailable()
      val r1 = spark.sql(
        "SELECT * FROM funnel_stream WHERE user_id = 1 ORDER BY steps_completed DESC LIMIT 1").head()
      def us(min: Int) = ts(min).getTime * 1000L
      assert(r1.getLong(1) === us(10) && r1.getLong(2) === us(20))
      assert(r1.isNullAt(3) && r1.getLong(4) === 2L)
      assert(spark.sql("SELECT * FROM funnel_stream WHERE user_id = 2").count() === 0L)
      // batch 2: the purchase completes the funnel using state from batch 1
      mem.addData(Ev(5, ts(30), 1, "purchase", 0.0))
      q.processAllAvailable()
      val r2 = spark.sql(
        "SELECT * FROM funnel_stream WHERE user_id = 1 ORDER BY steps_completed DESC LIMIT 1").head()
      assert(r2.getLong(3) === us(30) && r2.getLong(4) === 3L)
      // matches the batch funnel on the same (in-order) data
      val batch = Events.funnel(evDf(
        Ev(1, ts(5), 1, "click", 0.0), Ev(2, ts(10), 1, "signup", 0.0),
        Ev(3, ts(20), 1, "click", 0.0), Ev(4, ts(1), 2, "click", 0.0),
        Ev(5, ts(30), 1, "purchase", 0.0)),
        Seq("signup", "click", "purchase")).collect()
      assert(batch.length === 1)
      assert(batch.head.toSeq === r2.toSeq)
    } finally q.stop()
  }

  test("asofJoinStream carries the last right event across micro-batches") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Events.asofJoinStream(spark, mem.toDF())
      .writeStream.format("memory").queryName("asof")
      .outputMode("update").start()
    try {
      // batch 1: click then purchase → purchase matches the click
      mem.addData(Ev(0, ts(0), 1, "click", 2.0), Ev(1, ts(5), 1, "purchase", 9.0))
      q.processAllAvailable()
      val r1 = spark.sql("SELECT * FROM asof WHERE event_id = 1").head()
      assert(r1.getLong(4) === 0L && r1.getDouble(6) === 2.0)
      // batch 2: purchase only — the click state survives the batch gap
      mem.addData(Ev(2, ts(20), 1, "purchase", 1.0))
      q.processAllAvailable()
      val r2 = spark.sql("SELECT * FROM asof WHERE event_id = 2").head()
      assert(r2.getLong(4) === 0L)
      // batch 3: a user with no prior click → null match
      mem.addData(Ev(3, ts(21), 2, "purchase", 1.0))
      q.processAllAvailable()
      val r3 = spark.sql("SELECT * FROM asof WHERE event_id = 3").head()
      assert(r3.isNullAt(4) && r3.isNullAt(6))
    } finally q.stop()
  }

  test("batch asofJoinStream semantics ≡ asofJoin on in-order input") {
    val d = evDf(
      Ev(0, ts(0), 1, "click", 2.0), Ev(1, ts(5), 1, "purchase", 9.0),
      Ev(2, ts(6), 1, "click", 3.0), Ev(3, ts(7), 1, "purchase", 1.0),
      Ev(4, ts(8), 2, "purchase", 4.0))
    val batch = Events.asofJoin(d).orderBy("event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(batch.toSeq === Seq((1L, 0L), (3L, 2L), (4L, -1L)))
  }

  test("rangeJoinStream: watermarked stream-stream interval join") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lmem = MemoryStream[Ev]
    val rmem = MemoryStream[Ev]
    val q = Events.rangeJoinStream(lmem.toDF(), rmem.toDF())
      .writeStream.format("memory").queryName("rjs")
      .outputMode("append").start()
    try {
      // clicks at 0 and 30 min; purchases at 20 min (sees click@0) and
      // 25 min (sees click@0 too; click@30 is later)
      rmem.addData(Ev(0, ts(0), 1, "click", 2.0), Ev(1, ts(30), 1, "click", 3.0))
      lmem.addData(Ev(10, ts(20), 1, "purchase", 1.0), Ev(11, ts(25), 1, "purchase", 1.0))
      q.processAllAvailable()
      val got = spark.sql("SELECT event_id, r_event_id FROM rjs").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((10L, 0L), (11L, 0L)))
      // next batch: a purchase at 35 min matches both clicks (0 is within
      // the hour; 30 is strictly before)
      lmem.addData(Ev(12, ts(35), 1, "purchase", 1.0))
      q.processAllAvailable()
      val got2 = spark.sql("SELECT event_id, r_event_id FROM rjs WHERE event_id = 12")
        .collect().map(_.getLong(1)).toSet
      assert(got2 === Set(0L, 1L))
    } finally q.stop()
  }

  test("windowedCountsStream runs under Structured Streaming with watermark") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Events.windowedCountsStream(mem.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("evw")
      .outputMode("complete").start()
    try {
      mem.addData(Ev(0, ts(1), 1, "a", 1.0), Ev(1, ts(2), 2, "a", 2.0))
      q.processAllAvailable()
      val r = spark.sql("SELECT * FROM evw").collect()
      assert(r.length === 1 && r(0).getLong(2) === 2L)
      mem.addData(Ev(2, ts(3), 3, "b", 1.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM evw").count() === 2)
    } finally q.stop()
  }

  test("streaming top-k: update-mode sums + per-batch rank across batches") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val ranked = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, Long, Long, Double)]]
    val q = Events.userValueSums(mem.toDF())
      .writeStream.outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        ranked += Events.rankTopUsers(batch, 2).orderBy("event_type", "rank")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getDouble(3))).toSeq
        ()
      }
      .start()
    try {
      mem.addData(Ev(0, ts(0), 1, "a", 5.0), Ev(1, ts(1), 2, "a", 3.0))
      q.processAllAvailable()
      // user 1 leads after batch 1
      assert(ranked.last === Seq(("a", 1L, 1L, 5.0), ("a", 2L, 2L, 3.0)))
      // batch 2: user 2 overtakes via accumulated state
      mem.addData(Ev(2, ts(2), 2, "a", 4.0))
      q.processAllAvailable()
      assert(ranked.last === Seq(("a", 2L, 1L, 7.0), ("a", 1L, 2L, 5.0)))
    } finally q.stop()
  }

  test("activeUsers: trailing-7-day distinct, multi-day users count once") {
    val s = spark; import s.implicits._
    def tsd(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // user 1 active days 1 and 2 (counts ONCE in day 2's wau7);
    // user 2 active day 2; user 3 active day 9 (day 2 aged out of [3,9])
    val d = evDf(
      Ev(0, tsd(1), 1, "a", 0.0), Ev(1, tsd(2), 1, "a", 0.0),
      Ev(2, tsd(2), 2, "a", 0.0), Ev(3, tsd(9), 3, "a", 0.0))
    val r = Events.activeUsers(d).orderBy("day").collect()
      .map(x => (x.getLong(1), x.getLong(2)))
    assert(r.toSeq === Seq((1L, 1L), (2L, 2L), (1L, 1L)))
  }

  test("propsProfile: JSON sidecar extraction, decade buckets, null bucket") {
    val s = spark; import s.implicits._
    val d = Seq(
      (0L, ts(0), 1L, "a", 1.5, """{"k": 7}"""),
      (1L, ts(1), 2L, "a", 2.5, """{"k": 13}"""),
      (2L, ts(2), 3L, "a", 1.0, """{"k": 19}"""),
      (3L, ts(3), 4L, "b", 4.0, """{"k": -3}"""),   // floor → decade -1
      (4L, ts(4), 5L, "b", 0.5, "not json"))        // null bucket kept
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.propsProfile(d)
      .orderBy("event_type", "k_decade").collect()
      .map(x => (x.getString(0),
        if (x.isNullAt(1)) null else x.getLong(1), x.getLong(2)))
    assert(r.toSeq === Seq(("a", 0L, 1L), ("a", 1L, 2L),
      ("b", null, 1L), ("b", -1L, 1L)))   // Spark orders NULLS FIRST asc
  }
}
