package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-table analytics: the batch form of the stream-shaped operations a
  * large-scale telemetry/training-data pipeline needs — tumbling-window
  * aggregation and gap-based sessionization. Structured Streaming would run
  * the same plans over `readStream` with a watermark (`window()` is the
  * shared primitive); the reference has no streaming surface (SURVEY.md
  * §2.11), so these run in batch where the DuckDB oracle can check them.
  *
  * Scale: both are single-shuffle plans — the windowed aggregate is a plain
  * partial+final hash agg on (window, type); sessionization is one
  * hash-partitioned sort per user (Window.partitionBy, never a global sort).
  */
object Events {

  private val TsFmt = "yyyy-MM-dd HH:mm:ss"

  /** Tumbling 1-hour window × event type: event count + value sum. Window
    * start is emitted as a formatted string so engine-vs-oracle timestamp
    * encodings can never diverge.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .select(date_format(col("window.start"), TsFmt).as("window_start"),
        col("event_type"), col("n"), round(col("sv"), 6).as("sum_value"))

  /** Gap-based sessionization: a new session starts after `gapMinutes` of
    * user inactivity. Deterministic order (ts, event_id); microsecond
    * arithmetic so the gap predicate is exact integer math.
    */
  def sessions(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    // parquet event times arrive as TIMESTAMP_NTZ; the session is pinned to
    // UTC, so the cast preserves the wall time (matching DuckDB's epoch_us)
    val tsUs = unix_micros(col("ts").cast("timestamp"))
    events
      .withColumn("prev", lag(tsUs, 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev").isNull || tsUs - col("prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("sum_value"),
        date_format(min(col("ts")), TsFmt).as("start_ts"))
  }
}
