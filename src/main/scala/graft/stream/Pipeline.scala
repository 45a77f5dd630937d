package graft.stream

import graft.table.{IceLite, IceLiteTable}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * The CDC ingest pipeline: change-event source -> composable SMT chain ->
 * exactly-once MERGE into an IceLite table.
 *
 * This is the engine-side equivalent of the reference's deployment
 * (`doc/outbox.md:16-27`): Kafka Connect's source/worker/sink machinery is
 * replaced by Structured Streaming (checkpointed offsets), the SMT chain by
 * `DataFrame => DataFrame` stages, and the Kafka producer by the IceLite
 * MERGE sink. Exactly-once = Spark's at-least-once foreachBatch + the
 * table's idempotent (streamId, epochId) commit ledger.
 */
object Pipeline {

  /** Run the pipeline over a file-tailed event stream until exhausted
    * (processAllAvailable), resumable from `checkpointDir`. */
  def runFileStream(
      spark: SparkSession,
      sourceDir: String,
      table: IceLiteTable,
      checkpointDir: String,
      streamId: String,
      stages: Seq[DataFrame => DataFrame] = Nil,
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val eventSchema = ChangeGen.events(spark, GenConfig(numEvents = 1)).schema
    val source = spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val transformed = stages.foldLeft(source)((df, stage) => stage(df))
    transformed.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        table.merge(batch, s"$streamId/$epochId"): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Batch replay: apply the event stream to the table in `epochs` ordered
    * chunks by lsn — the bench path (same merge code, no streaming harness). */
  def replayBatch(
      spark: SparkSession,
      events: DataFrame,
      table: IceLiteTable,
      streamId: String,
      epochs: Int,
      lsnMax: Long,
      stages: Seq[DataFrame => DataFrame] = Nil): Unit = {
    val per = math.max(1L, (lsnMax + epochs - 1) / epochs)
    (0 until epochs).foreach { e =>
      val lo = e * per
      val hi = math.min(lsnMax, (e + 1) * per)
      val chunk = events.filter(org.apache.spark.sql.functions.col("lsn") >= lo &&
        org.apache.spark.sql.functions.col("lsn") < hi)
      val transformed = stages.foldLeft(chunk)((df, stage) => stage(df))
      table.merge(transformed, s"$streamId/$e")
    }
  }
}
