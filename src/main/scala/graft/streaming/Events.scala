package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Event-stream analytics over the `events` table
 * (event_id, ts, user_id, event_type, value, props).
 *
 * Every transform here is expressed so it runs identically on a batch
 * DataFrame and (where marked) on a Structured Streaming DataFrame —
 * `windowedCounts` is watermark-ready (append-mode windowed aggregation),
 * the lag/window-function transforms are batch analytics.
 *
 * Scale notes: tumbling-window aggregation is one shuffle with partial
 * aggregation; sessionization shuffles once on user_id and sorts within
 * partitions (Spark window functions) — both hold at 100 TB with enough
 * partitions because state is per-key, never global.
 */
object Events {

  /** Tumbling 1-hour windowed aggregation per event_type. Streaming-safe:
    * same groupBy(window(...)) works under readStream + watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    LocalEvents.windowedCounts(events).getOrElse(events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"),
        col("n_events"), col("sum_value")))

  /** Streaming variant: watermarked append-mode windowed aggregation.
    * Use under spark.readStream; late data beyond `watermark` is dropped
    * and windows finalize incrementally. */
  def windowedCountsStream(events: DataFrame,
                           watermark: String = "1 hour"): DataFrame =
    windowedCounts(events.withWatermark("ts", watermark))

  val SessionGapUs: Long = 30L * 60 * 1000 * 1000 // 30 min in microseconds

  /** Gap-based sessionization: a new session starts when a user's
    * inter-event gap exceeds 30 minutes. Deterministic ordering by
    * (ts, event_id); all arithmetic on integral microseconds so the
    * DuckDB oracle compares bit-exactly. */
  def sessionize(events: DataFrame): DataFrame =
    LocalEvents.sessionize(events).getOrElse {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > SessionGapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("duration_us"),
        round(sum(col("value")), 6).as("sum_value"))
  }

  /** Per-user session state carried across micro-batches. */
  case class SessionState(sessionIdx: Long, lastUs: Long, nEvents: Long)

  /** One output row per (user, batch): the user's current session after
    * folding the batch's events. */
  case class SessionUpdate(user_id: Long, session_idx: Long,
                           n_events: Long, last_us: Long)

  /**
   * Stateful STREAMING sessionization via
   * `KeyValueGroupedDataset.flatMapGroupsWithState` — the custom-state
   * path of Structured Streaming (state store checkpointing, update
   * output mode). Each micro-batch folds a user's new events (sorted
   * within the batch) into [[SessionState]]; a gap > 30 min opens a new
   * session. Late cross-batch events are a watermark policy decision
   * left to the caller (compose with `withWatermark` upstream).
   *
   * The batch equivalent (identical session boundaries on ordered input)
   * is [[sessionize]].
   */
  def sessionizeStream(spark: SparkSession,
                       events: DataFrame): Dataset[SessionUpdate] = {
    import spark.implicits._
    events
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Long)],
         state: GroupState[SessionState]) => {
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L))
          rows.map(_._2).toSeq.sorted.foreach { us =>
            st =
              if (st.sessionIdx == 0L || us - st.lastUs > SessionGapUs)
                SessionState(st.sessionIdx + 1, us, 1L)
              else SessionState(st.sessionIdx, us, st.nEvents + 1)
          }
          state.update(st)
          Iterator(SessionUpdate(user, st.sessionIdx, st.nEvents, st.lastUs))
        })
  }

  /** Top-k users by summed value within each event_type (rank by rounded
    * sum desc, then user_id — deterministic). */
  def topUsers(events: DataFrame, k: Int = 3): DataFrame =
    LocalEvents.topUsers(events, k).getOrElse(
      rankTopUsers(userValueSums(events), k))

  /** The stateful half of top-k: running per-(event_type, user) value
    * sums. Streaming-safe — under readStream this is an update-mode
    * aggregation whose state Spark checkpoints. */
  def userValueSums(events: DataFrame): DataFrame =
    events.groupBy("event_type", "user_id")
      .agg(round(sum(col("value")), 6).as("total_value"))

  /** The rank half of top-k (window functions are unsupported on
    * streaming aggregates — under streaming apply this per micro-batch
    * via foreachBatch over [[userValueSums]]'s running state). */
  def rankTopUsers(sums: DataFrame, k: Int): DataFrame =
    sums.withColumn("rank", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(col("total_value").desc, col("user_id"))))
      .filter(col("rank") <= k)
      .select(col("event_type"), col("user_id"),
        col("rank").cast("long").as("rank"), col("total_value"))
}
