package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  /** Gap-based sessionization through Spark's NATIVE `session_window`
    * operator — the engine-level twin of [[sessionize]]'s window
    * formulation (same one-shuffle-per-user scale shape, but the
    * session merge runs inside the aggregation operator instead of a
    * lag + running-sum window pair, and the identical expression works
    * under Structured Streaming with a watermark). Boundary semantics
    * match [[sessionize]] and are pinned in the spec: `session_window`
    * merges touching windows, so only a gap STRICTLY greater than
    * `gap` opens a new session. The value sum is micro-quantized to
    * an integral long (order-free — a reducer-order double sum can't
    * enter the oracle compare). Output: (user_id, start_us, end_us,
    * n_events, sum_value_micro). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes")
      : DataFrame =
    events
      .select(col("user_id"), col("ts"),
        round(col("value") * lit(1000000d), 0).cast("long").as("vq"))
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), sum(col("vq")).as("sum_value_micro"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"), col("sum_value_micro"))

  /** Period-over-period per-user activity reconciliation — the
    * data-diff every warehouse runs after a backfill or between two
    * snapshot partitions: which users appeared, disappeared, or
    * changed volume between window A = [fromA, untilA) and window B =
    * [fromB, untilB). Scale shape: each side is a sargable-filtered
    * scan pre-aggregated to (user, count) BEFORE the single FULL
    * OUTER hash join on user_id (the join carries one row per active
    * user per side, never raw events); status classification is a
    * codegen map. */
  def activityDiff(events: DataFrame, fromA: String, untilA: String,
                   fromB: String, untilB: String): DataFrame = {
    def side(from: String, until: String, user: String, n: String) =
      events
        .filter(col("ts") >= lit(from).cast("timestamp") &&
          col("ts") < lit(until).cast("timestamp"))
        .groupBy(col("user_id").as(user))
        .agg(count(lit(1)).as(n))
    side(fromA, untilA, "user_a", "n_a")
      .join(side(fromB, untilB, "user_b", "n_b"),
        col("user_a") === col("user_b"), "full_outer")
      .select(
        coalesce(col("user_a"), col("user_b")).as("user_id"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        when(col("user_a").isNull, "added")
          .when(col("user_b").isNull, "dropped")
          .when(col("n_a") === col("n_b"), "same")
          .otherwise("changed").as("status"))
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

  /** Running per-user totals state for [[userStatsStream]]. */
  final case class UserStatsState(n_events: Long, sum_value_micro: Long,
                                  last_us: Long)

  /** Output row of [[userStatsStream]]: the user's running profile. */
  final case class UserStatsRow(user_id: Long, n_events: Long,
                                sum_value_micro: Long, last_us: Long)

  /** Spark 4 `transformWithState` processor — the current arbitrary
    * stateful API (typed `ValueState` handles, optional per-state TTL
    * and timers; supersedes map/flatMapGroupsWithState). Folds each
    * user's events into a running (count, micro-quantized value sum,
    * last-event µs) profile and emits the updated row once per
    * (user, batch). */
  final class UserStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Long), UserStatsRow] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[UserStatsState] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode)
        : Unit =
      state = getHandle.getValueState[UserStatsState]("userStats",
        org.apache.spark.sql.Encoders.product[UserStatsState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long,
                                 rows: Iterator[(Long, Long, Long)],
                                 timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserStatsRow] = {
      var st = if (state.exists()) state.get()
        else UserStatsState(0L, 0L, Long.MinValue)
      rows.foreach { case (_, vq, us) =>
        st = UserStatsState(st.n_events + 1, st.sum_value_micro + vq,
          math.max(st.last_us, us))
      }
      state.update(st)
      Iterator.single(UserStatsRow(key, st.n_events, st.sum_value_micro,
        st.last_us))
    }
  }

  /** STREAMING per-user running profile via `transformWithState` —
    * value sums micro-quantized (order-free longs), one updated row
    * per (user, batch); the batch equivalent is a plain
    * groupBy(user).agg(count, sum, max). */
  def userStatsStream(spark: SparkSession,
                      events: DataFrame): Dataset[UserStatsRow] = {
    import spark.implicits._
    events
      .select(col("user_id"),
        round(col("value") * lit(1000000d), 0).cast("long").as("vq"),
        unix_micros(col("ts")).as("us"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new UserStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Per-user funnel progress: first-completion µs per step, -1 unset. */
  final case class FunnelState(times: Array[Long])

  /** STREAMING funnel: per-user step state via `mapGroupsWithState`
    * (update mode). Each micro-batch advances a user's first-completion
    * times; a step fills only when its predecessor is already filled
    * and the event is at-or-after it — the batch cascade's recurrence,
    * applied incrementally. Matches [[funnel]] row-for-row on in-order
    * input (same contract as [[asofJoinStream]]: a step event arriving
    * in an earlier micro-batch than its predecessor is not
    * re-evaluated). State is one fixed-length long array per user —
    * watermark-free, bounded by the user universe. */
  def funnelStream(spark: SparkSession, events: DataFrame,
                   steps: Seq[String] = FunnelSteps): DataFrame = {
    import spark.implicits._
    require(steps.nonEmpty)
    val nS = steps.length
    val updated = events
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Long, String)],
         state: GroupState[FunnelState]) => {
          val t = state.getOption.map(_.times.clone())
            .getOrElse(Array.fill(nS)(-1L))
          rows.toSeq.sortBy(_._2).foreach { case (_, us, et) =>
            var k = 0
            var done = false
            while (k < nS && !done) {
              if (t(k) == -1L && steps(k) == et &&
                (k == 0 || (t(k - 1) != -1L && us >= t(k - 1)))) {
                t(k) = us
                done = true
              }
              k += 1
            }
          }
          state.update(FunnelState(t))
          (user, t)
        })
    updated.toDF("user_id", "times")
      .where(element_at(col("times"), 1) =!= -1L)
      .select(
        col("user_id") +:
          steps.indices.map(i =>
            when(element_at(col("times"), i + 1) =!= -1L,
              element_at(col("times"), i + 1)).as(s"t_${steps(i)}")) :+
          size(filter(col("times"), x => x =!= -1L)).cast("long")
            .as("steps_completed"): _*)
  }

  /** Default as-of/range pairing: each `purchase` looks back at `click`s. */
  val AsofLeftType = "purchase"
  val AsofRightType = "click"
  val RangeWindowUs: Long = 3600L * 1000 * 1000 // 1 hour

  /**
   * As-of join: each left-type event picks the latest right-type event of
   * the same user at-or-before its timestamp (ties on us: the right event
   * with the largest event_id; a right exactly at the left's us counts).
   *
   * Spark-first shape: instead of a non-equi join (which Catalyst can only
   * plan as a broadcast nested loop), union both sides and take a running
   * `last(ignoreNulls)` over one (user_id)-partitioned sort — a single
   * shuffle + sort, the same plan sessionize already pays, so it holds at
   * 100 TB with per-user state only.
   */
  def asofJoin(events: DataFrame,
               leftType: String = AsofLeftType,
               rightType: String = AsofRightType): DataFrame =
    LocalEvents.asofJoin(events, leftType, rightType).getOrElse {
      val e = events
        .filter(col("event_type").isin(leftType, rightType))
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("is_left",
          when(col("event_type") === leftType, 1).otherwise(0))
      // rights sort before lefts at equal us → at-or-before semantics
      val w = Window.partitionBy("user_id")
        .orderBy(col("us"), col("is_left"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def lastRight(c: Column): Column =
        last(when(col("is_left") === 0, c), ignoreNulls = true).over(w)
      // one projection → one Window node (three independent withColumns
      // would leave three)
      e.select(col("event_id"), col("user_id"), col("us"), col("value"),
          col("is_left"),
          lastRight(col("event_id")).as("asof_event_id"),
          lastRight(col("us")).as("asof_us"),
          lastRight(col("value")).as("asof_value"))
        .filter(col("is_left") === 1)
        .drop("is_left")
    }

  /** The as-of match emitted per left event (stream variant). */
  case class AsofMatch(event_id: Long, user_id: Long, us: Long, value: Double,
                       asof_event_id: java.lang.Long,
                       asof_us: java.lang.Long,
                       asof_value: java.lang.Double)

  /** Last-seen right event per user, carried across micro-batches. */
  case class AsofState(event_id: Long, us: Long, value: Double)

  /**
   * STREAMING as-of join via `mapGroupsWithState`-style custom state
   * (`flatMapGroupsWithState`, update mode): per user, the state is just
   * the latest right-type event; each micro-batch folds its events in
   * (us, is_left, event_id) order and emits one [[AsofMatch]] per left.
   * In-order delivery gives exactly [[asofJoin]]'s batch answer
   * (EventsSpec pins this); cross-batch late rights are a watermark
   * policy decision left to the caller, as with [[sessionizeStream]].
   */
  def asofJoinStream(spark: SparkSession, events: DataFrame,
                     leftType: String = AsofLeftType,
                     rightType: String = AsofRightType): Dataset[AsofMatch] = {
    import spark.implicits._
    events
      .filter(col("event_type").isin(leftType, rightType))
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("value"),
        when(col("event_type") === leftType, 1).otherwise(0).as("is_left"))
      .as[(Long, Long, Long, Double, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Long, Long, Double, Int)],
         state: GroupState[AsofState]) => {
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[AsofMatch]
          rows.toSeq.sortBy(r => (r._3, r._5, r._2)).foreach {
            case (_, eid, us, v, isLeft) =>
              if (isLeft == 0) st = AsofState(eid, us, v)
              else out += AsofMatch(eid, user, us, v,
                if (st == null) null else Long.box(st.event_id),
                if (st == null) null else Long.box(st.us),
                if (st == null) null else Double.box(st.value))
          }
          if (st != null) state.update(st)
          out.iterator
        })
  }

  /**
   * Range (interval) join: for each left-type event, count and sum the
   * right-type events of the same user in `[us - windowUs, us)` — strictly
   * before, within the window. Lefts with no prior rights still appear
   * (n_prior = 0, sum 0).
   *
   * Spark-first shape: the Flink-interval-join binning trick. Bucket both
   * sides by `floor(us / windowUs)`, replicate each right into its own and
   * the NEXT bin (any matching left lands in one of those two), then a
   * plain (user_id, bin) equi-join with the exact range as a residual
   * predicate — shuffle-hash-joinable, never a nested loop, ×2 right-side
   * replication independent of data size. Holds at 100 TB.
   */
  def rangeJoinCounts(events: DataFrame,
                      leftType: String = AsofLeftType,
                      rightType: String = AsofRightType,
                      windowUs: Long = RangeWindowUs): DataFrame =
    LocalEvents.rangeJoinCounts(events, leftType, rightType, windowUs)
      .getOrElse {
        val withUs = events.withColumn("us", unix_micros(col("ts")))
        val lhs = withUs.filter(col("event_type") === leftType)
          .select(col("event_id"), col("user_id").as("l_user"), col("us"),
            (col("us") - col("us") % windowUs).as("bin"))
        val rhs = withUs.filter(col("event_type") === rightType)
          .select(col("user_id").as("r_user"), col("us").as("r_us"),
            col("value").as("r_value"))
          .withColumn("bin", explode(array(
            col("r_us") - col("r_us") % windowUs,
            col("r_us") - col("r_us") % windowUs + windowUs)))
        lhs.join(rhs,
            lhs("l_user") === rhs("r_user") && lhs("bin") === rhs("bin") &&
              rhs("r_us") >= lhs("us") - windowUs && rhs("r_us") < lhs("us"),
            "left_outer")
          .groupBy(col("event_id"), col("l_user").as("user_id"), col("us"))
          .agg(count(col("r_us")).as("n_prior"),
            round(coalesce(sum(col("r_value")), lit(0.0)), 6)
              .as("sum_prior_value"))
      }

  /**
   * Linear marketing attribution: every purchase splits 1,000,000
   * micro-credits equally across the user's clicks in the prior hour;
   * per click, the total credit received and the number of purchases it
   * helped convert. EXACT integer semantics — each click gets
   * `1e6 div n`, and the remainder goes to the LATEST contributing
   * click (by (us, event_id)) so the split is deterministic and sums
   * to exactly 1e6 per converted purchase; a double `1/n` share would
   * drift across engines.
   *
   * Scale shape: candidate pairs come from the same Flink-style binned
   * (user, bin) equi-join as [[rangeJoinCounts]]; the share window
   * partitions by the PURCHASE id — conversion cardinality is the
   * scale axis, so partitions stay tiny; the final rollup is a
   * partial-agg'd groupBy per click.
   */
  def attribution(events: DataFrame,
                  convType: String = AsofLeftType,
                  touchType: String = AsofRightType,
                  windowUs: Long = RangeWindowUs): DataFrame = {
    val withUs = events.withColumn("us", unix_micros(col("ts")))
    val conv = withUs.filter(col("event_type") === convType)
      .select(col("event_id").as("conv_id"), col("user_id").as("l_user"),
        col("us"), (col("us") - col("us") % windowUs).as("bin"))
    val touch = withUs.filter(col("event_type") === touchType)
      .select(col("event_id").as("click_id"), col("user_id").as("r_user"),
        col("us").as("r_us"))
      .withColumn("bin", explode(array(
        col("r_us") - col("r_us") % windowUs,
        col("r_us") - col("r_us") % windowUs + windowUs)))
    val pairs = conv.join(touch,
      conv("l_user") === touch("r_user") && conv("bin") === touch("bin") &&
        touch("r_us") >= conv("us") - windowUs && touch("r_us") < conv("us"))
    val w = Window.partitionBy("conv_id")
    val sized = pairs
      .select(col("conv_id"), col("click_id"), col("r_user"), col("r_us"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(
        w.orderBy(col("r_us").desc, col("click_id").desc)))
    sized
      .select(col("click_id"), col("r_user"),
        (expr("1000000L div n") +
          when(col("rn") === 1, lit(1000000L) % col("n"))
            .otherwise(lit(0L))).as("credit"))
      .groupBy(col("click_id").as("event_id"), col("r_user").as("user_id"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("credit")).as("credit_micros"))
  }

  /** The NAIVE formulation of [[rangeJoinCounts]]: a plain left-outer
    * join on `(user, r.us ∈ [l.us − W, l.us))` with no hand binning —
    * the join a user writes first. Without help Spark plans it as a
    * per-user hash join whose residual tests every (purchase, click)
    * pair of a user (quadratic in per-user history). The injected
    * [[graft.plans.RangeJoinRewrite]] optimizer rule rewrites it into
    * the banded plan automatically, so this compiles to the SAME
    * execution shape as the hand-tuned operator — kept as a public
    * entry (and driver query `ev_range_auto`) to pin that the rewrite
    * is semantics-preserving end-to-end. */
  def rangeJoinCountsNaive(events: DataFrame,
                           leftType: String = AsofLeftType,
                           rightType: String = AsofRightType,
                           windowUs: Long = RangeWindowUs): DataFrame = {
    val withUs = events.withColumn("us", unix_micros(col("ts")))
    val lhs = withUs.filter(col("event_type") === leftType)
      .select(col("event_id"), col("user_id").as("l_user"), col("us"))
    val rhs = withUs.filter(col("event_type") === rightType)
      .select(col("user_id").as("r_user"), col("us").as("r_us"),
        col("value").as("r_value"))
    lhs.join(rhs,
        lhs("l_user") === rhs("r_user") &&
          rhs("r_us") >= lhs("us") - windowUs && rhs("r_us") < lhs("us"),
        "left_outer")
      .groupBy(col("event_id"), col("l_user").as("user_id"), col("us"))
      .agg(count(col("r_us")).as("n_prior"),
        round(coalesce(sum(col("r_value")), lit(0.0)), 6)
          .as("sum_prior_value"))
  }

  /** Default funnel: first signup → first click at-or-after it → first
    * purchase at-or-after that click. */
  val FunnelSteps: Seq[String] = Seq("signup", "click", "purchase")

  /**
   * Stepwise funnel analysis: per user, the first step-0 event, then for
   * each later step the first event at-or-after the previous step's
   * time. Users enter the result by completing step 0; later steps are
   * nullable. `steps_completed` counts the non-null prefix.
   *
   * Shape: ONE scan and ONE shuffle however many steps — filter to the
   * step types, then cascade per-step conditional `min` windows over a
   * single (user_id) partitioning (no order → whole-partition frames, so
   * no sort either). A null step time cascades: `us >= null` is null,
   * the conditional min skips it, all later steps stay null. The final
   * per-user groupBy reuses the window's partitioning. The step-joins
   * alternative re-scans the events table once per step — at 100 TB
   * that's the whole difference.
   */
  def funnel(events: DataFrame,
             steps: Seq[String] = FunnelSteps): DataFrame =
    LocalEvents.funnel(events, steps).getOrElse {
      require(steps.nonEmpty)
      val w = Window.partitionBy("user_id")
      val cascaded = steps.indices.foldLeft(
        events.filter(col("event_type").isin(steps: _*))
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_type"))) { (df, i) =>
        val eligible =
          if (i == 0) col("event_type") === steps(i)
          else col("event_type") === steps(i) && col("us") >= col(s"t${i - 1}")
        df.withColumn(s"t$i", min(when(eligible, col("us"))).over(w))
      }
      val nSteps = steps.indices.drop(1).foldLeft(lit(1L)) { (acc, i) =>
        acc + when(col(s"t$i").isNotNull, 1L).otherwise(0L)
      }
      cascaded
        .groupBy("user_id")
        .agg(min(col("t0")).as("t0"),
          steps.indices.drop(1).map(i => min(col(s"t$i")).as(s"t$i")): _*)
        .where(col("t0").isNotNull)
        .select(
          col("user_id") +:
            steps.indices.map(i => col(s"t$i").as(s"t_${steps(i)}")) :+
            nSteps.as("steps_completed"): _*)
      }

  /**
   * STREAMING range join: the stream-stream form of [[rangeJoinCounts]]'s
   * candidate generation — Structured Streaming's native watermarked
   * interval join. Emits one row per (left, prior-right-within-window)
   * match; both watermarks bound the join state so it runs forever.
   * (Aggregating matches per left event is a downstream `foreachBatch`
   * concern — chained stream aggregation after a stream-stream join is
   * restricted in append mode.)
   */
  def rangeJoinStream(left: DataFrame, right: DataFrame,
                      leftType: String = AsofLeftType,
                      rightType: String = AsofRightType,
                      window: String = "1 hour",
                      watermark: String = "2 hours"): DataFrame = {
    val l = left.filter(col("event_type") === leftType)
      .select(col("event_id").as("l_event_id"), col("user_id").as("l_user"),
        col("ts").as("l_ts"))
      .withWatermark("l_ts", watermark)
    val r = right.filter(col("event_type") === rightType)
      .select(col("event_id").as("r_event_id"), col("user_id").as("r_user"),
        col("ts").as("r_ts"), col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    l.join(r, expr(
      s"""l_user = r_user AND
         |r_ts >= l_ts - interval $window AND r_ts < l_ts""".stripMargin))
      .select(col("l_event_id").as("event_id"), col("l_user").as("user_id"),
        col("l_ts"), col("r_event_id"), col("r_ts"), col("r_value"))
  }

  /** Top-k users by summed value within each event_type (rank by rounded
    * sum desc, then user_id — deterministic). */
  /** Daily cohort retention: users grouped by their first active day;
    * n_users = distinct users from cohort c active on day c + offset —
    * the standard retention-curve table.
    *
    * Scale shape: the cohort map is a groupBy(user_id) min; joining it
    * back to the (user_id, day) activity set co-partitions on user_id
    * (one exchange feeds both the aggregate and the join probe), and
    * the final count shuffles the (cohort, offset, user) distinct set —
    * all partial-aggregated, nothing global. Day index is integer
    * µs-arithmetic (≡ UTC date cast), so the oracle is exact. */
  def retention(events: DataFrame): DataFrame =
    LocalEvents.retention(events).getOrElse {
      val day = expr("unix_micros(ts) div 86400000000").as("day")
      val ud = events.select(col("user_id"), day)
      val cohort = ud.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      ud.join(cohort, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }

  /** Per-user daily activity with a rolling `days`-day trailing window
    * (events + value), the engagement time-series behind churn / usage
    * dashboards. The rolling sums use a RANGE frame over the integer
    * day index, so a user's inactive days correctly age events out of
    * the window without needing explicit zero-filled rows.
    *
    * All window arithmetic is INTEGRAL: value is fixed-pointed to
    * micro-units before aggregation (`trunc(round(value,6)·1e6)`), so
    * the rolling sums are exact and engine-independent — a windowed
    * double sum would compare FP totals produced by different
    * association orders (Spark streams the frame; DuckDB aggregates
    * segment trees).
    *
    * Scale shape: one groupBy(user_id, day) with partial aggregation,
    * then one window over the ALREADY-AGGREGATED per-day table
    * partitioned by user_id — millions of small hash-distributed
    * partitions, nothing global. */
  def rollingActivity(events: DataFrame, days: Int = 7): DataFrame = {
    val perDay = events
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        (round(col("value"), 6) * lit(1000000d)).cast("long").as("v_micros"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_events"), sum("v_micros").as("value_micros"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rangeBetween(-(days - 1).toLong, 0L)
    perDay.select(col("user_id"), col("day"), col("n_events"),
      col("value_micros"),
      sum(col("n_events")).over(w).as("roll_events"),
      sum(col("value_micros")).over(w).as("roll_value_micros"))
  }

  /** Hourly volume anomalies per event_type: hours whose event count
    * deviates from the type's mean by more than `threshold` sample
    * standard deviations — the burst/outage detector a pipeline runs
    * over its ingest telemetry.
    *
    * The anomaly PREDICATE is exact integer arithmetic — no division,
    * no sqrt, no FP in the comparison:
    *   |z| > t  ⟺  (n·k − Σn)²·(k−1) > t²·(k·Σn² − (Σn)²)·k
    * with EVERY quadratic term decimal(38,0) from the aggregation
    * inward: Σn² accumulates `cast(n as decimal) * n` (n ~ 1e9, k ~ 1e4
    * ⇒ Σn² ~ 1e22 and (Σn)² ~ 1e26 silently wrap an int64 under
    * non-ANSI Spark if summed or squared as LongType — the cast must
    * precede the multiply, not follow the sum). `dev = n·k − Σn` (a
    * linear term, long-safe) and `var_num = k·Σn² − (Σn)²` ride along
    * for audit. The decimal(38,0) var_num is RENDERED as a string: it
    * genuinely exceeds int64 at scale, and a digit string is the one
    * physical form every engine materializes identically (DuckDB's
    * HUGEINT/DECIMAL and Spark's decimal hash differently in the
    * driver's frame even when every cell is value-identical).
    *
    * Scale shape: one windowed groupBy over the raw events (partial
    * agg), one tiny per-type stats aggregate broadcast back onto the
    * hourly table. Global stats make this batch analytics; a streaming
    * deployment recomputes per micro-batch via foreachBatch. */
  def hourlyAnomalies(events: DataFrame, threshold: Long = 2L): DataFrame = {
    val hourly = events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("w_start"), col("event_type"),
        col("n_events"))
    val dec = "decimal(38,0)"
    val stats = hourly.groupBy("event_type").agg(
      count(lit(1)).as("k"),
      sum(col("n_events")).as("sum_n"),
      sum(col("n_events").cast(dec) * col("n_events")).as("sum_n2"))
    val dev = (col("n_events").cast(dec) * col("k") - col("sum_n"))
      .cast(dec)
    val varNum = (col("k").cast(dec) * col("sum_n2") -
      col("sum_n").cast(dec) * col("sum_n")).cast(dec)
    hourly.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("w_start"), col("n_events"),
        dev.cast("long").as("dev"), varNum.cast("string").as("var_num"),
        when(dev * dev * (col("k") - 1).cast(dec) >
            lit(threshold * threshold) * varNum * col("k").cast(dec), 1L)
          .otherwise(0L).as("is_anomaly"))
  }

  /** Event-type transition matrix over per-user event sequences —
    * P(next type | type), the first-order Markov model behind
    * behavioral scoring and funnel diagnostics. Consecutive-event
    * pairs come from a lag window ordered by (ts, event_id) within
    * each user (deterministic total order), counts are exact integers,
    * and the one derived column (the conditional) is round6 of an
    * integer ratio — engine-exact everywhere else.
    *
    * Scale shape: one per-user window (millions of small
    * hash-distributed partitions) + one groupBy(from, to) with partial
    * aggregation; the denominator rides a window over the
    * ALREADY-AGGREGATED |types|² table, which is tiny.
    * Output: (from_type, to_type, c12, c1, p_cond). */
  def typeTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("to_type"))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .where(col("from_type").isNotNull)
    val counts = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("c12"))
    val wf = Window.partitionBy("from_type")
    counts
      .withColumn("c1", sum(col("c12")).over(wf))
      .select(col("from_type"), col("to_type"), col("c12"), col("c1"),
        round(col("c12").cast("double") / col("c1"), 6).as("p_cond"))
  }

  /** Per-type inter-arrival statistics: the distribution of gaps
    * between a user's consecutive SAME-TYPE events — ingest/burst
    * telemetry (a collapsing median flags hot loops; a fat max flags
    * dormancy). Everything is EXACT integer arithmetic: gaps are
    * integral microseconds from the deterministic order, and the
    * median ships DOUBLED (`p50_x2 = v[(n−1)÷2] + v[n÷2]` over the
    * sorted gaps) so no interpolation happens — an interpolated
    * percentile at 1e11 µs magnitudes differs across engines in the
    * last ulp, and decimal rounding cannot absorb that.
    *
    * One per-(user, type) lag window feeds the gaps; the exact median
    * is `OrderStats.selectRanks` — a range-partitioned global sort on
    * (event_type, gap_us) + two-phase prefix scan that ships only the
    * two middle order statistics per type out of the executors. A
    * `row_number` window partitioned by event_type would instead sort
    * every gap of a type in ONE task (type cardinality is tiny, gap
    * counts are not) — the classic low-cardinality-window bottleneck
    * that formulation exists to avoid.
    * Output: (event_type, n_gaps, min_gap_us, p50_x2_gap_us,
    * max_gap_us, sum_gap_us). */
  def gapStats(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("us", "event_id")
    val gaps = events
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("unix_micros(ts)").as("us"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .where(col("gap_us").isNotNull)
    // The lag window (scan + per-user shuffle) feeds the
    // range-partitioner sample and the selection sort. Persist its
    // projection once so the window runs once. The scalar stats
    // (n/min/max/sum per type) ride along INSIDE selectRanks' pass 1
    // (selectRanksWithStats) — the separate reduceByKey pass + shuffle
    // an earlier version paid for them is gone. Both consumers are
    // eager, so the cache is dropped before return and no corpus-sized
    // state outlives the call.
    val gapsRdd = gaps.select(col("event_type"), col("gap_us"))
      .as[(String, Long)].rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // the doubled median v[(n−1)÷2] + v[n÷2]: an odd-n type requests
      // the same rank twice and selectRanks emits it twice, so the sum
      // is already doubled.
      val (sel, keyStats) = graft.ops.OrderStats.selectRanksWithStats(
        spark, gapsRdd, n => Seq((n - 1) / 2, n / 2))
      val med = sel
        .groupBy(col("key").as("event_type"))
        .agg(sum(col("value")).as("p50_x2_gap_us"))
      val stats = keyStats.toSeq
        .map { case (t, s) => (t, s.n, s.min, s.max, s.sum) }
        .toDF("event_type", "n_gaps", "min_gap_us", "max_gap_us",
          "sum_gap_us")
      stats.join(med, "event_type")
        .select(col("event_type"), col("n_gaps"), col("min_gap_us"),
          col("p50_x2_gap_us"), col("max_gap_us"), col("sum_gap_us"))
    } finally gapsRdd.unpersist(blocking = false)
  }

  def topUsers(events: DataFrame, k: Int = 3): DataFrame =
    LocalEvents.topUsers(events, k).getOrElse(
      rankTopUsers(userValueSums(events), k))

  /** Daily + rolling-weekly active users — the engagement series every
    * event warehouse serves. For each day present in the data: `dau` =
    * distinct users that day, `wau7` = distinct users over the
    * trailing 7 days [day−6, day].
    *
    * The rolling distinct is NOT a window function (distinct doesn't
    * compose over frames) and NOT a 7× self-join: each distinct
    * (user, day) pair is exploded to the ≤7 trailing buckets it
    * feeds, re-distinct-ed, and counted — two hash-partitioned
    * distincts over the user-day set (≪ the event table), each a
    * single shuffle with partial aggregation. Day arithmetic is exact
    * integral µs division, matching the oracle's `epoch_us // 86400e6`. */
  def activeUsers(events: DataFrame): DataFrame =
    LocalEvents.activeUsers(events).getOrElse(activeUsersDistributed(events))

  private[streaming] def activeUsersDistributed(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + lit(6))).as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau7"))
    // inner join: phantom buckets past the last observed day drop out
    dau.join(wau, Seq("day"))
  }

  /** Semi-structured property profile: parse the JSON `props` sidecar
    * with the codegen JSONPath expression (`get_json_object` — one
    * shared parse per row, no interpreted UDF), project the numeric
    * field `$.k`, and profile it per (event_type, decade bucket).
    * This is the metadata-slicing primitive a training-data pipeline
    * runs over per-record sidecar attributes without maintaining a
    * separate exploded metadata table.
    *
    * Scale shape: one narrow codegen map (JSON parse + floor-div
    * bucket) feeding one partially-aggregated groupBy — the exchange
    * carries O(event_types × buckets) partial rows regardless of input
    * size. The bucket uses exact integral floor division
    * ((k − pmod(k,10)) div 10), never FP, so the grouping key cannot
    * drift between engines. Rows whose props lack a numeric `k` land
    * in a NULL bucket rather than being dropped — `try_cast`, because
    * under ANSI mode a plain cast would FAIL THE JOB on the first
    * malformed payload (a non-numeric `$.k` anywhere in 100 TB). */
  def propsProfile(events: DataFrame): DataFrame =
    LocalEvents.propsProfile(events).getOrElse(propsProfileDistributed(events))

  private[streaming] def propsProfileDistributed(events: DataFrame): DataFrame =
    events
      .withColumn("k",
        expr("try_cast(get_json_object(props, '$.k') AS BIGINT)"))
      .groupBy(col("event_type"), expr("(k - pmod(k, 10)) div 10").as("k_decade"))
      .agg(count(lit(1)).as("n_events"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        round(sum(col("value")), 6).as("sum_value"))

  /** Per-user RFM profile — the recency/frequency/monetary rollup a
    * lifecycle or LTV model consumes: last event time (exact integral
    * µs), total event count, purchase count, and purchase value summed
    * EXACTLY (each value micro-quantized once with the shared
    * round-half-away rule, then an order-free integer sum — a plain
    * double `sum` would vary with reducer order at scale, this cannot).
    * ONE partially-aggregated groupBy(user_id); the exchange carries a
    * single partial row per (user, map partition). */
  def rfm(events: DataFrame): DataFrame =
    LocalEvents.rfm(events).getOrElse(rfmDistributed(events))

  private[streaming] def rfmDistributed(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        (col("event_type") === "purchase").as("isp"),
        round(col("value") * lit(1000000.0), 0).cast("long").as("vmu"))
      .groupBy("user_id")
      .agg(max(col("us")).as("last_us"),
        count(lit(1)).as("n_events"),
        sum(when(col("isp"), 1L).otherwise(0L)).as("n_purchases"),
        (sum(when(col("isp"), col("vmu")).otherwise(0L)) / lit(1000000.0))
          .as("monetary"))

  /** Audience overlap between event types: for each unordered type
    * pair, how many distinct users did both — the cross-feature /
    * cross-product engagement matrix. The diagonal (a = a) carries each
    * type's full distinct audience, so overlap coefficients can be
    * read straight off the table.
    *
    * Scale shape: events first collapse to distinct (user, type) — one
    * shuffle keyed on the scale axis; the pair expansion is per-USER
    * (fan-out bounded by the type-set size squared, types are O(10));
    * the final rollup is O(types²) groups with map-side partials.
    * Never a user-keyed self-join of the raw event table. */
  def audienceOverlap(events: DataFrame): DataFrame = {
    val ut = events.select(col("user_id"), col("event_type")).distinct()
    val a = ut.select(col("user_id"), col("event_type").as("type_a"))
    val b = ut.select(col("user_id"), col("event_type").as("type_b"))
    a.join(b, Seq("user_id"))
      .filter(col("type_a") <= col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Session-length distribution — the engagement histogram read off
    * every sessionization run: for each session size (event count),
    * how many sessions, with exact integer duration mass and maximum.
    * Composes [[sessionize]] (hybrid gate flows through), then two
    * partially-aggregated groupBys — the exchange carries one row per
    * session, then one per distinct size; no window, no sort. All
    * output columns are exact integers (double sums of per-session
    * values would be reducer-order-sensitive; durations are integral
    * µs). */
  def sessionStats(events: DataFrame): DataFrame =
    sessionize(events)
      .groupBy(col("n_events"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("duration_us")).as("sum_duration_us"),
        max(col("duration_us")).as("max_duration_us"))

  /** Latest-record compaction — the CDC/upsert collapse every change
    * stream needs before serving: one row per user, the most recent
    * event by (ts, event_id) — "last write wins", with the unique
    * event_id as the deterministic tie-break.
    *
    * Scale shape: ONE partially-aggregating groupBy of
    * `max(struct(us, event_id, payload…))` — the argmax rides the
    * normal map-side combine, so the exchange carries one candidate
    * row per (user, map partition), never the event history, and no
    * window rank appears anywhere. Streaming-safe: under readStream
    * the same aggregate is an update-mode running state (struct max is
    * associative and commutative), which is exactly the compacted
    * changelog a CDC sink maintains. */
  def latestRecord(events: DataFrame): DataFrame =
    LocalEvents.latestRecord(events).getOrElse(latestRecordDistributed(events))

  private[streaming] def latestRecordDistributed(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("us"), col("event_id"),
          col("event_type"), col("value")).as("rec"))
      .groupBy("user_id")
      .agg(max(col("rec")).as("m"))
      .select(col("user_id"), col("m.event_id").as("event_id"),
        col("m.us").as("last_us"), col("m.event_type").as("event_type"),
        col("m.value").as("value"))

  /** Per-type dwell-time statistics: the gap from each event to the
    * user's NEXT event (of any type), attributed to the type of the
    * event the user was on — "how long do users stay on X before doing
    * anything else". The complement of [[gapStats]] (same-type
    * inter-arrival). Everything is exact integer microseconds: n, min,
    * max, sum, and the exact floor-div mean — no FP anywhere.
    *
    * Scale shape: one per-USER lead window (user cardinality is the
    * scale axis, so the window partitions are millions of small sorts,
    * never the low-cardinality single-task trap), then a
    * partially-aggregated groupBy of O(#types) groups. */
  def dwellByType(events: DataFrame): DataFrame =
    LocalEvents.dwellByType(events).getOrElse(dwellByTypeDistributed(events))

  private[streaming] def dwellByTypeDistributed(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    events
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("dwell_us", lead(col("us"), 1).over(w) - col("us"))
      .where(col("dwell_us").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_dwell"),
        min(col("dwell_us")).as("min_dwell_us"),
        max(col("dwell_us")).as("max_dwell_us"),
        sum(col("dwell_us")).as("sum_dwell_us"))
      .withColumn("avg_dwell_us", expr("sum_dwell_us div n_dwell"))
  }

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

  /** Peak session concurrency per hour — the capacity-planning sweep:
    * how many gap-sessions (the [[sessionize]] boundaries) are open
    * simultaneously, maxed within each hour bucket of the sweep
    * timeline. Sessions are CLOSED intervals [first_us, last_us]; at a
    * tied timestamp starts count before ends, so a session touching
    * another end-to-start overlaps it and a single-event session
    * counts itself.
    *
    * The sweep is the classic +1/−1 delta scan — and a running sum
    * over a GLOBAL ORDER BY is the other canonical single-task window
    * (one partition sorts every delta, the ev_gaps lesson). Instead:
    * range-partitioned sort on (us, −delta) + the two-phase prefix
    * sum (per-partition subtotals → driver scan of one long per
    * partition → per-partition offset replay, pids bound by
    * mapPartitionsWithIndex). Ties inside a rank never cross engines
    * differently: equal (us, delta) rows contribute identical deltas,
    * so the prefix-value multiset — and the hourly max — is
    * order-invariant. Output: (hour_bucket, peak_sessions, n_starts),
    * hour_bucket = us div 3600000000 (integer, no FP bucketing). */
  def peakConcurrency(events: DataFrame): DataFrame =
    LocalEvents.peakConcurrency(events).getOrElse(
      peakConcurrencyDistributed(events))

  private[streaming] def peakConcurrencyDistributed(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intervals = events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > SessionGapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("us")).as("s_us"), max(col("us")).as("e_us"))
    // explode, not union: a self-union would re-run the sessionize
    // window once per branch (Catalyst doesn't share the subplan)
    // persist the deltas: the range exchange SAMPLES its child before
    // the real shuffle, which would otherwise run the sessionize window
    // pipeline twice end-to-end
    val deltas = intervals
      .select(explode(array(
        struct(col("s_us").as("us"), lit(1L).as("delta")),
        struct(col("e_us").as("us"), lit(-1L).as("delta")))).as("d"))
      .select(col("d.us"), col("d.delta"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sorted = deltas
      .select(col("us"), col("delta"), (-col("delta")).as("negd"))
      .as[(Long, Long, Long)]
      .repartitionByRange(col("us"), col("negd"))
      .sortWithinPartitions("us", "negd")
      .rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // pass 1: one running-sum offset per partition (longs, driver-tiny)
      val subtotals = sorted
        .mapPartitionsWithIndex { (pid, it) =>
          var acc = 0L; it.foreach(acc += _._2); Iterator((pid, acc))
        }.collect().sortBy(_._1).map(_._2)
      val offsets = subtotals.scanLeft(0L)(_ + _)
      val bc = spark.sparkContext.broadcast(offsets)
      // pass 2: replay with the partition's offset, bucket hourly
      val swept = sorted.mapPartitionsWithIndex { (pid, it) =>
        var acc = bc.value(pid)
        it.map { case (us, d, _) => acc += d; (us, d, acc) }
      }
      swept.toDF("us", "delta", "running")
        .groupBy(expr("us div 3600000000").as("hour_bucket"))
        .agg(max(col("running")).as("peak_sessions"),
          sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_starts"))
        .localCheckpoint(eager = true)
    } finally {
      sorted.unpersist(blocking = false)
      deltas.unpersist(blocking = false)
    }
  }
}
