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

  test("kernel ≡ distributed on sf0.001 events") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .persist()
    try {
      val (lw, dw) = bothWays(Events.windowedCounts(ev))
      assert(lw === dw, "windowedCounts")
      val (ls, ds) = bothWays(Events.sessionize(ev))
      assert(ls === ds, "sessionize")
      val (lt, dt) = bothWays(Events.topUsers(ev, 3))
      assert(lt === dt, "topUsers")
    } finally ev.unpersist()
  }
}
