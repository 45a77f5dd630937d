package graft.stream

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** flatMapGroupsWithState keyed accounting across micro-batches. */
class KeyedStateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("per-key activity accumulates across batches and matches a batch fold") {
    val cfg = GenConfig(numDocs = 60, numEvents = 1000, seed = 77, withMetadata = false)
    val srcDir = SparkTestBase.tempDir("ks-src")
    ChangeGen.writeChunks(spark, cfg, srcDir, numChunks = 4)

    val eventSchema = ChangeGen.events(spark, GenConfig(numEvents = 1)).schema
    val stream = spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = KeyedState.trackActivity(stream)
      .writeStream
      .format("memory").queryName("key_activity")
      .outputMode("update")
      .option("checkpointLocation", SparkTestBase.tempDir("ks-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // latest state per key (update mode emits one row per key per batch)
    val latest = spark.table("key_activity")
      .groupBy("doc_id")
      .agg(max(struct(col("events"), col("inserts"), col("updates"), col("deletes"),
        col("firstLsn"), col("lastLsn"))).as("s"))
      .select(col("doc_id"), col("s.*"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap

    val expected = ChangeGen.events(spark, cfg)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("events"),
        count(when(col("op") === "c", 1)).as("inserts"),
        count(when(col("op") === "u", 1)).as("updates"),
        count(when(col("op") === "d", 1)).as("deletes"),
        min("lsn").as("firstLsn"), max("lsn").as("lastLsn"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap

    assert(latest.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(latest(k) == v, s"mismatch for $k") }
  }
}
