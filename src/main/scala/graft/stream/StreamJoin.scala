package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Watermarked stream-stream interval join — the Structured Streaming
 * enrichment shape (correlate a CDC/event stream with another stream of
 * the same key within a bounded event-time window, e.g. "purchases within
 * 30 minutes of a signup").
 *
 * The time bound is what makes this scale: Spark's symmetric hash join
 * keeps BOTH sides' rows in state, and the watermark + interval condition
 * let it evict a row as soon as no future match can arrive — state is
 * O(events inside the interval horizon), independent of stream length.
 * An unbounded stream-stream equi-join would grow state forever.
 *
 * Works UNCHANGED on batch frames (the watermark node is eliminated), so
 * the arithmetic has a DuckDB-oracle-able batch gate in `SparkEntry`
 * (`q_stream_join`) while `StreamJoinSpec` gates the streaming semantics:
 * incremental emission across micro-batches and exactly-one output per
 * matched pair under checkpoint resume.
 */
object StreamJoin {

  /** Inner interval join: left rows pair with right rows of the same key
    * whose event time lies in `[leftTs - before, leftTs + after]`
    * (inclusive). Right columns are prefixed `r_` (both sides may carry
    * identically-named columns). `before`/`after` are SQL interval strings
    * ("30 minutes"). Both sides get `watermarkDelay` when streaming. */
  def interval(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               before: String, after: String,
               watermarkDelay: String): DataFrame = {
    val l = (if (left.isStreaming) left.withWatermark(leftTs, watermarkDelay) else left)
      .alias("l")
    val rPref = right.columns.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"r_$c"))
    val r = (if (rPref.isStreaming) rPref.withWatermark(s"r_$rightTs", watermarkDelay)
             else rPref).alias("r")
    l.join(r,
      col(key) === col(s"r_$key") &&
        col(s"r_$rightTs") >= col(leftTs) - expr(s"INTERVAL $before") &&
        col(s"r_$rightTs") <= col(leftTs) + expr(s"INTERVAL $after"))
  }
}
