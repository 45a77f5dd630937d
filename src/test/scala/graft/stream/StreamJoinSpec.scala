package graft.stream

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join under real watermarks: batch/stream result
  * parity, incremental emission across micro-batches, and no duplicate
  * emission under checkpointed multi-pass execution. */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val schema = StructType(Seq(
    StructField("k", StringType),
    StructField("ts", TimestampType),
    StructField("id", LongType)))

  private def frame(rows: Seq[(String, String, Long)]): DataFrame = {
    val data = rows.map { case (k, t, i) => Row(k, java.sql.Timestamp.valueOf(t), i) }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), schema)
  }

  private val leftRows = Seq(
    ("a", "2024-01-01 00:00:00", 1L),
    ("a", "2024-01-01 02:00:00", 2L),
    ("b", "2024-01-01 00:30:00", 3L))
  private val rightRows = Seq(
    ("a", "2024-01-01 00:10:00", 10L), // matches left 1 (within 30m after)
    ("a", "2024-01-01 00:45:00", 11L), // matches nothing (too late for 1)
    ("a", "2024-01-01 01:55:00", 12L), // matches left 2 (within 10m before)
    ("b", "2024-01-01 00:31:00", 13L), // matches left 3
    ("c", "2024-01-01 00:00:00", 14L)) // no left key

  private val expectedPairs = Set((1L, 10L), (2L, 12L), (3L, 13L))

  private def pairsOf(df: DataFrame): Set[(Long, Long)] =
    df.select(col("id"), col("r_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("batch interval join matches hand-computed pairs") {
    val out = StreamJoin.interval(frame(leftRows), frame(rightRows), "k", "ts", "ts",
      before = "10 minutes", after = "30 minutes", watermarkDelay = "5 minutes")
    assert(pairsOf(out) == expectedPairs)
  }

  test("streaming interval join emits each matched pair exactly once across passes") {
    val lDir = SparkTestBase.tempDir("sj-l")
    val rDir = SparkTestBase.tempDir("sj-r")
    val ckpt = SparkTestBase.tempDir("sj-ckpt")
    val sink = scala.collection.mutable.Buffer[Row]()
    def pass(): Unit = {
      val l = spark.readStream.schema(schema).parquet(lDir)
      val r = spark.readStream.schema(schema).parquet(rDir)
      val q = StreamJoin.interval(l, r, "k", "ts", "ts",
        before = "10 minutes", after = "30 minutes", watermarkDelay = "5 minutes")
        .select(col("id"), col("r_id"))
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
    // pass 1: first left event + its match
    frame(leftRows.take(1)).coalesce(1).write.mode("append").parquet(lDir)
    frame(rightRows.take(2)).coalesce(1).write.mode("append").parquet(rDir)
    pass()
    // pass 2: the rest of both streams (redelivers nothing; checkpointed
    // state joins late-arriving counterparts across the pass boundary)
    frame(leftRows.drop(1)).coalesce(1).write.mode("append").parquet(lDir)
    frame(rightRows.drop(2)).coalesce(1).write.mode("append").parquet(rDir)
    pass()
    val got = sink.map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.size == got.distinct.size, s"duplicate emission: $got")
    assert(got.toSet == expectedPairs)
  }
}
