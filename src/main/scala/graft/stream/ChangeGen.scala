package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deterministic binlog/WAL-shaped change-event generator over the
 * `input_hint` table shape `(doc_id string, tokens array<int>, n_tok int,
 * source string)` — the engine's synthetic CDC feed (BASELINE.json: "no
 * external data", fixed seed, no wall-clock).
 *
 * Every column is a pure Catalyst expression of the event's LSN, so the
 * generator is:
 *  - deterministic across runs, partitionings and cluster sizes;
 *  - O(1) memory per row, fully codegen'd (spark.range -> expressions);
 *  - honest at 10^10-event scale (no driver-side materialization).
 *
 * Envelope mirrors the Debezium shape the reference consumes
 * (`doc/outbox.md:16-21`, FIXTURES.md §2.2): op c/u/d/r, after payload
 * (null for deletes — tombstone semantics per `smt/Outbox.java:79-97`),
 * ts_ms, source.lsn, key = doc_id, plus a JSON `metadata` column tagged for
 * the JSON-deserializer stage with an additive schema drift at `driftAt`.
 *
 * Key skew is a power-law over doc ranks (u^skew concentrates on low ranks)
 * to exercise hot-key collapse and AQE skew handling.
 */
final case class GenConfig(
    numDocs: Long = 10000L,
    numEvents: Long = 100000L,
    seed: Long = 42L,
    skew: Double = 2.0,          // 1.0 = uniform; >1 concentrates on low doc ranks
    deleteRatio: Double = 0.05,
    createRatio: Double = 0.30,
    startLsn: Long = 0L,
    driftAt: Long = Long.MaxValue, // lsn at which metadata JSON gains a field
    withMetadata: Boolean = true,
    numPartitions: Int = 0)       // 0 = spark default parallelism

object ChangeGen {

  /** Payload schema (input_hint). */
  val payloadSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("tokens", ArrayType(IntegerType, containsNull = false), nullable = true),
    StructField("n_tok", IntegerType, nullable = true),
    StructField("source", StringType, nullable = true)))

  /** Change events in [cfg.startLsn, cfg.startLsn + cfg.numEvents). */
  def events(spark: SparkSession, cfg: GenConfig): DataFrame = {
    val base =
      if (cfg.numPartitions > 0) spark.range(cfg.startLsn, cfg.startLsn + cfg.numEvents, 1, cfg.numPartitions)
      else spark.range(cfg.startLsn, cfg.startLsn + cfg.numEvents)
    val lsn = col("id")

    // Deterministic uniforms in [0,1) from (seed, lsn, tag).
    def u(tag: String) =
      pmod(xxhash64(lit(cfg.seed), lsn, lit(tag)), lit(1L << 40)).cast(DoubleType) / lit((1L << 40).toDouble)

    val docIdx = least(floor(lit(cfg.numDocs.toDouble) * pow(u("doc"), lit(cfg.skew))), lit(cfg.numDocs - 1))
      .cast(LongType)
    val docId = concat(lit("doc_"), lpad(docIdx.cast(StringType), 10, "0"))
    val op = when(u("op") < cfg.deleteRatio, "d")
      .when(u("op") < cfg.deleteRatio + cfg.createRatio, "c")
      .otherwise("u")
    val nTok = (lit(8) + pmod(xxhash64(lit(cfg.seed + 1), lsn), lit(120L)).cast(IntegerType)).cast(IntegerType)
    // native expression: the higher-order-function formulation is interpreted
    // (boxed) and was the pipeline's top CPU/GC cost — see TokenGenExpr
    val tokens = TokenGenExpr.tokens(lsn, docIdx, nTok)
    val sourceLabel = concat(lit("src_"), pmod(docIdx, lit(5L)).cast(StringType))
    val after = when(op === "d", lit(null).cast(payloadSchema))
      .otherwise(struct(docId.as("doc_id"), tokens.as("tokens"), nTok.as("n_tok"), sourceLabel.as("source")))

    val metadata =
      if (!cfg.withMetadata) lit(null).cast(StringType)
      else {
        val quality = round(u("quality") * 100, 2)
        val lang = element_at(array(lit("en"), lit("fr"), lit("de"), lit("es")),
          (pmod(xxhash64(lit(cfg.seed + 2), lsn), lit(4L)) + 1).cast(IntegerType))
        val pre = to_json(struct(quality.as("quality"), lang.as("lang")))
        val post = to_json(struct(quality.as("quality"), lang.as("lang"),
          struct(lit(2).as("version"), lit("tok_v2").as("tokenizer")).as("pipeline")))
        when(lsn < cfg.driftAt, pre).otherwise(post)
      }

    base.select(
      docId.as("doc_id"),
      op.as("op"),
      lit(null).cast(payloadSchema).as("before"),
      after.as("after"),
      (lit(1700000000000L) + lsn).as("ts_ms"),
      struct(lsn.as("lsn"), lit("public.documents").as("table")).as("source"),
      metadata.as("metadata"),
      lsn.as("lsn"))
  }

  /** Write the event stream as `numChunks` parquet files in LSN order —
    * a file-tailing stand-in for the WAL that Structured Streaming can
    * consume incrementally (maxFilesPerTrigger). */
  def writeChunks(spark: SparkSession, cfg: GenConfig, dir: String, numChunks: Int): Unit = {
    val perChunk = cfg.numEvents / numChunks
    (0 until numChunks).foreach { i =>
      val chunkCfg = cfg.copy(
        startLsn = cfg.startLsn + i * perChunk,
        numEvents = if (i == numChunks - 1) cfg.numEvents - i * perChunk else perChunk)
      events(spark, chunkCfg)
        .coalesce(1)
        .write.mode("append").parquet(dir)
    }
  }

  /** Plain-Scala oracle: fold a collected event list to the expected final
    * table state (last-write-wins by lsn; delete removes). Used by replay
    * tests for per-row token-array equality. */
  def oracleFold(events: Seq[(String, String, Long, Option[(Seq[Int], Int, String)])]): Map[String, (Seq[Int], Int, String)] = {
    val sorted = events.sortBy(_._3)
    val state = scala.collection.mutable.Map.empty[String, (Seq[Int], Int, String)]
    sorted.foreach { case (docId, op, _, payload) =>
      if (op == "d") state.remove(docId)
      else payload.foreach(p => state(docId) = p)
    }
    state.toMap
  }
}
