package graft.stream

import graft.SparkTestBase
import graft.table.IceLite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Structured-Streaming pipeline: file-tailed change stream -> foreachBatch
 * MERGE with checkpointing; a killed-and-restarted query resumes from the
 * checkpoint and converges to the same final state (north_rule: "resumable
 * from checkpoint").
 */
class StreamingPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("file-stream ingest converges to batch-replay state") {
    val cfg = GenConfig(numDocs = 120, numEvents = 2000, seed = 21, withMetadata = false)
    val srcDir = SparkTestBase.tempDir("stream-src")
    ChangeGen.writeChunks(spark, cfg, srcDir, numChunks = 4)

    val root = SparkTestBase.tempDir("stream-table")
    val ckpt = SparkTestBase.tempDir("stream-ckpt")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    val q = Pipeline.runFileStream(spark, srcDir, table, ckpt, "sq1", maxFilesPerTrigger = 1)
    q.awaitTermination()

    // expected: direct fold of all events
    val expectedRoot = SparkTestBase.tempDir("stream-expected")
    val expected = IceLite.create(spark, expectedRoot, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    expected.merge(ChangeGen.events(spark, cfg), "one/0")

    val a = table.read().orderBy("doc_id").collect().map(_.toString)
    val b = expected.read().orderBy("doc_id").collect().map(_.toString)
    assert(a.sameElements(b))
    // multiple epochs actually committed
    assert(table.snapshot.lineage("applied.epochs") >= 4L)
  }

  test("schema registry persists in snapshots, restores on resume; metrics observed") {
    import graft.schema.{InferOptions, SchemaRegistry}
    import graft.smt.{JsonDeserialize, JsonDeserializeConfig}
    val cfg = GenConfig(numDocs = 40, numEvents = 600, seed = 5, driftAt = 300, withMetadata = true)
    val srcDir = SparkTestBase.tempDir("reg-src")
    val root = SparkTestBase.tempDir("reg-table")
    val ckpt = SparkTestBase.tempDir("reg-ckpt")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    def mkStage() = new JsonDeserialize(JsonDeserializeConfig(
      Seq("metadata"), "docs", InferOptions(optionalStructFields = true)), new SchemaRegistry(true))
    val listener = Pipeline.attachMetricsListener(spark)

    // phase 1: pre-drift events only
    ChangeGen.writeChunks(spark, cfg.copy(numEvents = 300), srcDir, numChunks = 1)
    Pipeline.runFileStream(spark, srcDir, table, ckpt, "rq", stages = Seq(mkStage())).awaitTermination()
    val reg1 = graft.schema.SchemaRegistry.deserialize(table.snapshot.registryJson, true)
    val s1 = reg1.get("docs", "metadata")
    assert(s1.size == 1)
    assert(s1.head.asInstanceOf[graft.schema.JStruct].fieldMap.keySet == Set("quality", "lang"))

    // phase 2: post-drift events, FRESH stage (registry must restore from snapshot)
    ChangeGen.writeChunks(spark, cfg.copy(startLsn = 300, numEvents = 300), srcDir, numChunks = 1)
    Pipeline.runFileStream(spark, srcDir, table, ckpt, "rq", stages = Seq(mkStage())).awaitTermination()
    val reg2 = graft.schema.SchemaRegistry.deserialize(table.snapshot.registryJson, true)
    val s2 = reg2.get("docs", "metadata")
    assert(s2.size == 1) // drift unioned into the restored entry, no fan-out
    assert(s2.head.asInstanceOf[graft.schema.JStruct].fieldMap.keySet == Set("quality", "lang", "pipeline"))

    // observed metrics reached the listener (poll: listener delivery is async)
    val deadline = System.currentTimeMillis() + 10000
    while (listener.batches.synchronized(listener.batches.map(_("events")).sum) < 600 &&
      System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(listener.batches.synchronized(listener.batches.map(_("events")).sum) == 600)
    spark.streams.removeListener(listener)
  }

  test("tombstones are physically reclaimed once the lsn watermark passes") {
    val cfg = GenConfig(numDocs = 60, numEvents = 1200, seed = 19, deleteRatio = 0.3, withMetadata = false)
    val srcDir = SparkTestBase.tempDir("tomb-src")
    val root = SparkTestBase.tempDir("tomb-table")
    val ckpt = SparkTestBase.tempDir("tomb-ckpt")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    ChangeGen.writeChunks(spark, cfg, srcDir, numChunks = 3)
    spark.conf.set(Pipeline.TombstoneCompactConf, "1")
    try {
      Pipeline.runFileStream(spark, srcDir, table, ckpt, "tq").awaitTermination()
    } finally spark.conf.unset(Pipeline.TombstoneCompactConf)
    // deletes flowed through the stream...
    assert(table.snapshot.lineage("applied.deletes") > 0L)
    // ...but no tombstone survives: the watermark (last batch's max lsn)
    // passed them all and the auto-compaction rewrote their files
    assert(table.snapshot.files.map(_.tombstones).sum == 0L)
    // and the state still equals the one-shot fold
    val expectedRoot = SparkTestBase.tempDir("tomb-expected")
    val expected = IceLite.create(spark, expectedRoot, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    expected.merge(ChangeGen.events(spark, cfg), "one/0")
    val a = table.read().orderBy("doc_id").collect().map(_.toString)
    val b = expected.read().orderBy("doc_id").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("dedup-ingest suppresses near-duplicate content at the merge sink") {
    import graft.ops.Dedup
    import spark.implicits._
    // (doc_id, op, tokens, lsn) -> ChangeGen-shaped envelope
    def mkEvents(rows: Seq[(String, String, Seq[Int], Long)]) =
      rows.toDF("doc_id", "op", "tokens", "lsn").select(
        col("doc_id"), col("op"),
        lit(null).cast(ChangeGen.payloadSchema).as("before"),
        when(col("op") === "d", lit(null).cast(ChangeGen.payloadSchema))
          .otherwise(struct(col("doc_id").as("doc_id"), col("tokens").as("tokens"),
            size(col("tokens")).as("n_tok"), lit("src_0").as("source"))).as("after"),
        (lit(1700000000000L) + col("lsn")).as("ts_ms"),
        struct(col("lsn").as("lsn"), lit("public.documents").as("table")).as("source"),
        lit(null).cast("string").as("metadata"),
        col("lsn"))

    val tokA = 1 to 30
    val tokB = 200 to 230
    val tokC = (1 to 29) :+ 99        // near-dup of A (shares 27/31 3-grams)
    val tokD = 500 to 530             // novel
    val tokB2 = 200 to 232            // B's own updated content (self, passes)
    val tokE = (200 to 229) :+ 777    // near-dup of B's ORIGINAL content

    val srcDir = SparkTestBase.tempDir("dedup-src")
    val root = SparkTestBase.tempDir("dedup-table")
    val ckpt = SparkTestBase.tempDir("dedup-ckpt")
    val idx = SparkTestBase.tempDir("dedup-idx") + "/idx"
    // cold start: empty corpus index
    Dedup.buildMinhashIndex(Seq.empty[(String, String)].toDF("doc_id", "text"),
      "doc_id", "text", idx, numHashes = 32, bands = 16, nPartitions = 8)
    val di = DedupIngest(idx, threshold = 0.5, numHashes = 32, bands = 16, nPartitions = 8)

    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    mkEvents(Seq(("doc_A", "c", tokA, 0L), ("doc_B", "c", tokB, 1L)))
      .coalesce(1).write.mode("append").parquet(srcDir)
    Pipeline.runFileStream(spark, srcDir, table, ckpt, "dq",
      dedupIngest = Some(di)).awaitTermination()
    assert(table.read().count() == 2) // both accepted, both indexed

    mkEvents(Seq(("doc_C", "c", tokC, 2L), ("doc_D", "c", tokD, 3L),
      ("doc_B", "u", tokB2, 4L), ("doc_E", "c", tokE, 5L)))
      .coalesce(1).write.mode("append").parquet(srcDir)
    Pipeline.runFileStream(spark, srcDir, table, ckpt, "dq",
      dedupIngest = Some(di)).awaitTermination()

    val state = table.read().select("doc_id", "tokens").as[(String, Seq[Int])]
      .collect().toMap
    // C (near-dup of A) and E (near-dup of B's original) suppressed;
    // B's self-update applied; D accepted
    assert(state.keySet == Set("doc_A", "doc_B", "doc_D"), state.keySet.toString)
    assert(state("doc_B") == tokB2)
    // survivor segments landed per epoch; later batches dedup against them:
    // a near-dup of D (accepted in epoch 1) is suppressed in epoch 2
    mkEvents(Seq(("doc_F", "c", (500 to 529) :+ 9, 6L)))
      .coalesce(1).write.mode("append").parquet(srcDir)
    Pipeline.runFileStream(spark, srcDir, table, ckpt, "dq",
      dedupIngest = Some(di)).awaitTermination()
    assert(table.read().count() == 3)
    val segs = spark.read.parquet(idx).select("seg").distinct()
      .as[String].collect().toSet
    assert(segs.exists(_.startsWith("dq_")), segs.toString)
    // suppression counts ride the table's lineage (same atomic commit):
    // C + E in epoch 1, F in epoch 2 = 3 total
    assert(table.snapshot.lineage("dedup.suppressed") == 3L)
  }

  test("restart from checkpoint resumes without double-applying") {
    val cfg = GenConfig(numDocs = 80, numEvents = 1200, seed = 33, withMetadata = false)
    val srcDir = SparkTestBase.tempDir("resume-src")
    val root = SparkTestBase.tempDir("resume-table")
    val ckpt = SparkTestBase.tempDir("resume-ckpt")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)

    // phase 1: first half of the stream
    ChangeGen.writeChunks(spark, cfg.copy(numEvents = 600), srcDir, numChunks = 2)
    val q1 = Pipeline.runFileStream(spark, srcDir, table, ckpt, "sq2")
    q1.awaitTermination()
    val midEpochs = table.snapshot.lineage("applied.epochs")
    assert(midEpochs >= 2L)

    // phase 2: stream grows; restart from the same checkpoint
    ChangeGen.writeChunks(spark, cfg.copy(startLsn = 600, numEvents = 600), srcDir, numChunks = 2)
    val q2 = Pipeline.runFileStream(spark, srcDir, table, ckpt, "sq2")
    q2.awaitTermination()

    val expectedRoot = SparkTestBase.tempDir("resume-expected")
    val expected = IceLite.create(spark, expectedRoot, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    expected.merge(ChangeGen.events(spark, cfg), "one/0")
    val a = table.read().orderBy("doc_id").collect().map(_.toString)
    val b = expected.read().orderBy("doc_id").collect().map(_.toString)
    assert(a.sameElements(b))
  }
}
