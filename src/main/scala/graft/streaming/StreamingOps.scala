package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (SURVEY §2.7) — the reference's
  * execution model (unbounded keyed streams with checkpointed state,
  * WordCount.java's keyBy→sum) re-expressed on Spark's engine.
  * Transform-only functions: callers bind any source (the emqx DSv2
  * source, MemoryStream in tests, Kafka in production) and any sink —
  * the operator is the plan, which is what scales.
  */
object StreamingOps {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  case class SessionState(start: Long, end: Long, n: Long, total: Double)

  /** X1 — tumbling event-time window with watermark: late data beyond
    * 10 minutes is dropped, state is bounded (Spark evicts windows
    * below the watermark — the scale-critical property).
    */
  def windowedCounts(events: DataFrame,
      window: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** X1b — sliding window variant (1h length, 30m slide). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(org.apache.spark.sql.functions.window(
        col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"))

  /** X2a — built-in session windows (gap-based). */
  def sessionWindowAgg(events: DataFrame,
      gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** X2b — custom keyed state via flatMapGroupsWithState: the direct
    * analogue of Flink keyed state + timers (what the reference's
    * keyBy feeds). Sessions close after `gapMs` of event-time silence,
    * enforced with an event-time timeout so state is evicted by the
    * watermark, never unbounded.
    */
  def statefulSessionize(events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      var out = List.empty[SessionOut]
      var st = state.getOption.orNull
      if (state.hasTimedOut) {
        if (st != null)
          out ::= SessionOut(userId, new Timestamp(st.start),
            new Timestamp(st.end), st.n, st.total)
        state.remove()
        return out.iterator
      }
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        if (st == null) st = SessionState(t, t, 1, e.value)
        else if (t - st.end > gapMs) {
          out ::= SessionOut(userId, new Timestamp(st.start),
            new Timestamp(st.end), st.n, st.total)
          st = SessionState(t, t, 1, e.value)
        } else st = SessionState(st.start, math.max(st.end, t), st.n + 1,
          st.total + e.value)
      }
      state.update(st)
      state.setTimeoutTimestamp(st.end + gapMs)
      out.reverseIterator
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** X3 — stream–static enrichment join: the static side is planned
    * per micro-batch (broadcast when small — dims at 100 TB stream
    * scale are still dimension-sized).
    */
  def enrich(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), Seq("user_id"), "left")

  /** X5 — stream–stream join: purchases joined to the same user's
    * clicks within the preceding 10 minutes. Both sides are
    * watermarked so the join state is evicted once the time-range
    * condition can no longer match — bounded state, the only safe
    * shape for an unbounded×unbounded join.
    */
  def streamStreamJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("purchase_id"),
        col("user_id"), col("ts").as("p_ts"), col("value"))
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c, col("user_id") === col("c_user") &&
      col("c_ts") <= col("p_ts") &&
      col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("p_ts"), col("c_ts"), col("value"))
  }

  /** X6 — streaming deduplication: drop duplicate event ids with a
    * watermark so the dedup state ages out instead of growing
    * unboundedly (the streaming twin of Dedup.dedupExact).
    */
  def streamingDedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** C10 — the WordCount running aggregation (keyBy→sum) on a
    * payload-bearing stream.
    */
  def runningWordCount(payloads: DataFrame): DataFrame =
    payloads
      .select(explode(split(col("payload").cast("string"), "\\s+"))
        .as("word"))
      .groupBy(col("word")).count()
}
