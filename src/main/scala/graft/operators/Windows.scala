package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Time-window operators over the `events` table (SURVEY §2.2
  * R9–R11). These are the batch twins of the Structured Streaming
  * windows in `graft.streaming` — same semantics, oracle-checkable.
  */
object Windows {

  /** R9 — tumbling 1-hour window: count + exact value sum per
    * (window_start, event_type). Uses date_trunc so the oracle is the
    * literal same expression in DuckDB.
    */
  def qEventsTumbling(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        dsum(col("value")).as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** R10 — sliding window (1h length, 30m slide): each event lands in
    * 2 windows. Spark's `window()` emits struct windows; for oracle
    * parity we expand the two covering window starts explicitly —
    * same shape DuckDB can produce with generate_series-free SQL.
    */
  def qEventsSliding(spark: SparkSession, sfDir: String): DataFrame = {
    val e = events(spark, sfDir)
    // A ts belongs to the windows starting at floor30(ts) and
    // floor30(ts) - 30m. floor30 = 30-minute tumble aligned to the
    // hour, expressed with pure timestamp arithmetic (identical
    // semantics in the DuckDB oracle — no epoch round-trips).
    val floor30 = when(minute(col("ts")) >= 30,
      date_trunc("hour", col("ts")) + expr("INTERVAL 30 MINUTES"))
      .otherwise(date_trunc("hour", col("ts")))
    val starts = array(floor30, floor30 - expr("INTERVAL 30 MINUTES"))
    e.withColumn("window_start", explode(starts))
      .groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** R11 — gap-based sessionization (30-minute inactivity gap) via
    * lag + conditional cumulative sum — the scalable formulation: two
    * window passes over data partitioned by user, no state explosion.
    * Returns per-session stats.
    */
  def qSessionize(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapSec = 1800L
    events(spark, sfDir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec,
          1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        dsum(col("value")).as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }
}
