package graft.stream

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Event-time windows under a real watermark: append-mode emission only for
  * closed windows, late rows beyond the watermark dropped, and batch/stream
  * plan parity (the SparkEntry oracles gate the batch arithmetic; this gates
  * the streaming semantics). */
class WindowedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val schema = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def frame(rows: Seq[(String, String, Double)]): DataFrame = {
    val data = rows.map { case (t, e, v) =>
      Row(java.sql.Timestamp.valueOf(t), e, v)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), schema)
  }

  /** Run one Trigger.AvailableNow pass of `build` over the files currently
    * in `srcDir`, against a persistent checkpoint — successive calls are
    * successive micro-batch epochs with the watermark restored from the
    * checkpoint (deterministic batch boundaries, unlike maxFilesPerTrigger
    * admission under AvailableNow). Appended rows land in `sink` (the
    * memory sink cannot recover from a checkpoint; foreachBatch can). */
  private def runPass(srcDir: String, ckpt: String,
                      sink: scala.collection.mutable.Buffer[Row])(
      build: DataFrame => DataFrame): Unit = {
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val q = build(stream)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink.synchronized { sink ++= batch.collect() }: Unit
      }
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("streaming tumbling windows close on watermark and drop late rows") {
    val srcDir = SparkTestBase.tempDir("win-src")
    val ckpt = SparkTestBase.tempDir("win-ckpt")
    val sink = scala.collection.mutable.Buffer[Row]()
    def pass(): Unit = runPass(srcDir, ckpt, sink)(
      Windowed.tumbling(_, "ts", "1 hour", "10 minutes", Seq("event_type")))
    // pass 1: two rows in hour 0, one in hour 3 (advances the watermark to
    // 02:50 with a 10-minute delay -> hour-0 window closes, emits n=2)
    frame(Seq(
      ("2024-01-01 00:10:00", "a", 1.0),
      ("2024-01-01 00:20:00", "a", 2.0),
      ("2024-01-01 03:00:00", "a", 3.0)))
      .coalesce(1).write.mode("append").parquet(srcDir)
    pass()
    // pass 2 (watermark restored from the checkpoint): a LATE row for the
    // already-closed hour-0 window (must be dropped) + a row in hour 6
    // (closes the hour-3 window)
    frame(Seq(
      ("2024-01-01 00:30:00", "a", 100.0),
      ("2024-01-01 06:00:00", "a", 4.0)))
      .coalesce(1).write.mode("append").parquet(srcDir)
    pass()

    val out = sink
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSet
    val h = 3600L
    val day = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
    // hour-0 window: n=2 (the late 00:30 row was DROPPED, not counted)
    assert(out.contains((day, 2L, 3.0)), s"hour-0 window wrong: $out")
    // hour-3 window closed by the 06:00 row
    assert(out.contains((day + 3 * h, 1L, 3.0)), s"hour-3 window missing: $out")
    // hour-6 window never closed -> append mode must NOT have emitted it
    assert(!out.exists(_._1 == day + 6 * h), s"unclosed window emitted: $out")
  }

  test("batch sliding windows: every event lands in exactly windows/slide buckets") {
    val df = frame(Seq(
      ("2024-01-01 00:10:00", "a", 1.0),
      ("2024-01-01 00:40:00", "b", 2.0),
      ("2024-01-01 01:20:00", "a", 3.0)))
    val out = Windowed.sliding(df, "ts", "1 hour", "30 minutes", "10 minutes", Seq("event_type"))
      .collect()
    // 3 events x 2 overlapping windows each = 6 (window, key) rows here
    assert(out.map(_.getLong(3)).sum == 6, out.mkString("\n"))
    // spot-check: 00:10 event appears in windows starting 23:30 and 00:00
    val day = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
    val aStarts = out.filter(r => r.getString(2) == "a").map(_.getLong(0)).toSet
    assert(aStarts.contains(day) && aStarts.contains(day - 1800), aStarts.toString)
  }

  test("streaming session windows merge across micro-batches") {
    val srcDir = SparkTestBase.tempDir("sess-src")
    val ckpt = SparkTestBase.tempDir("sess-ckpt")
    val sink = scala.collection.mutable.Buffer[Row]()
    def pass(): Unit = runPass(srcDir, ckpt, sink)(
      Windowed.sessions(_, "ts", "1 hour", "10 minutes", Seq("event_type")))
    // pass 1: one event at 00:00 opens a session in the state store
    frame(Seq(("2024-01-01 00:00:00", "u1", 1.0))).coalesce(1)
      .write.mode("append").parquet(srcDir)
    pass()
    // pass 2: 00:20 must MERGE into the restored session; 05:00 opens a new
    // one; 09:00 moves the watermark past both (closes them)
    frame(Seq(
      ("2024-01-01 00:20:00", "u1", 1.0),
      ("2024-01-01 05:00:00", "u1", 1.0),
      ("2024-01-01 09:00:00", "u1", 1.0))).coalesce(1)
      .write.mode("append").parquet(srcDir)
    pass()

    val out = sink
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val us = 1000000L
    val day = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond * us
    // cross-batch merged session: start 00:00, TWO events
    assert(out.contains((day, 2L)), s"merged session missing: $out")
    // 05:00 single-event session closed by the 09:00 watermark move
    assert(out.contains((day + 5 * 3600 * us, 1L)), s"05:00 session missing: $out")
  }

  test("batch sessions match the islands fold") {
    val df = frame(Seq(
      ("2024-01-01 00:00:00", "u1", 1.0),
      ("2024-01-01 00:30:00", "u1", 1.0),
      ("2024-01-01 01:30:00", "u1", 1.0), // EXACTLY gap after 00:30 -> merges (inclusive boundary)
      ("2024-01-01 03:00:00", "u1", 1.0), // 90min > gap after 01:30 -> new session
      ("2024-01-01 00:10:00", "u2", 1.0)))
    val out = Windowed.sessions(df, "ts", "1 hour", "10 minutes", Seq("event_type"))
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2))).toSet
    val us = 1000000L
    val day = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond * us
    assert(out == Set(
      // the exact-gap 01:30 event EXTENDS the 00:00 session: Spark merges
      // adjacent session windows (the oracle's break condition is > gap)
      ("u1", day, 3L),
      ("u1", day + 3 * 3600 * us, 1L),
      ("u2", day + 600 * us, 1L)), out.toString)
  }
}
