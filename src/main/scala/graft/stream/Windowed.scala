package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Event-time window aggregation with watermarks — the Structured Streaming
 * shape of the reference's per-record stream processing generalized to
 * grouped time-bucket analytics (events/sec rates, per-window quality
 * counters over a CDC or document stream).
 *
 * Every builder here returns a plan that works UNCHANGED on a batch frame
 * (Catalyst's EliminateEventTimeWatermark drops the watermark node when the
 * child is not streaming), so each has a DuckDB-oracle-able batch gate in
 * `SparkEntry` while `WindowedSpec` exercises the streaming semantics —
 * append-mode emission only after the watermark passes a window's end, and
 * late rows beyond the watermark dropped.
 *
 * Scale posture: windowed aggregation is hash-partitioned on (window, keys);
 * state per group is one aggregation buffer; the watermark bounds state
 * retention (windows older than watermark - lateness are evicted), so state
 * size is O(active windows × keys), independent of stream length. No sorts,
 * no driver state.
 */
object Windowed {

  /** Tumbling event-time windows: one aggregate row per (window, keys).
    * Emits `w_start`/`w_end` as epoch seconds (windows are whole-second
    * aligned by construction).
    */
  def tumbling(
      events: DataFrame,
      tsCol: String,
      windowDur: String,
      watermarkDelay: String,
      keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur) +: keyCols: _*)
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(
        unix_timestamp(col("window.start")).as("w_start") +:
          unix_timestamp(col("window.end")).as("w_end") +:
          keyCols :+ col("n") :+ col("total_value"): _*)
  }

  /** Sliding (hopping) windows: each event contributes to windowDur/slideDur
    * overlapping windows. Same output shape as [[tumbling]]. */
  def sliding(
      events: DataFrame,
      tsCol: String,
      windowDur: String,
      slideDur: String,
      watermarkDelay: String,
      keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur, slideDur) +: keyCols: _*)
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(
        unix_timestamp(col("window.start")).as("w_start") +:
          unix_timestamp(col("window.end")).as("w_end") +:
          keyCols :+ col("n") :+ col("total_value"): _*)
  }

  /** Session windows: per-key activity bursts separated by a silence
    * STRICTLY longer than the gap (Spark merges adjacent windows — an event
    * landing exactly at last event + gap extends the session; pinned in
    * WindowedSpec). Output: one row per session with
    * the session start (epoch MICROseconds — exact, no float drift) and the
    * event count.
    *
    * Session state merges in Spark's streaming state store (session_window
    * is merge-capable), so cross-batch session stitching is handled by the
    * engine; the watermark closes sessions whose end has passed.
    */
  def sessions(
      events: DataFrame,
      tsCol: String,
      gapDur: String,
      watermarkDelay: String,
      keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gapDur) +: keyCols: _*)
      .agg(count(lit(1)).as("n"))
      .select(
        // parquet event times arrive as TIMESTAMP_NTZ; the session is UTC,
        // so the cast to an instant is exact
        unix_micros(col("session_window.start").cast("timestamp")).as("s_start_us") +:
          keyCols :+ col("n"): _*)
  }
}
