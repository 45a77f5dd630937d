package graft.stream

import graft.SparkTestBase
import graft.table.IceLite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Dead-letter queue ([[Dlq]]): contract-violating change events route to a
 * parquet DLQ (marker-idempotent per epoch) and the clean remainder merges.
 */
class DlqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def mixedBatch = spark.sql(
    """SELECT * FROM VALUES
      |  (CAST(NULL AS STRING), 'u', 1L, named_struct('v', 1)),
      |  ('',                   'u', 2L, named_struct('v', 2)),
      |  ('k1',                 'x', 3L, named_struct('v', 3)),
      |  ('k2',                 'u', CAST(NULL AS BIGINT), named_struct('v', 4)),
      |  ('k3',                 'u', 5L, CAST(NULL AS STRUCT<v: INT>)),
      |  ('k4',                 'd', 6L, CAST(NULL AS STRUCT<v: INT>)),
      |  ('k5',                 'c', 7L, named_struct('v', 7))
      |AS t(doc_id, op, lsn, after)""".stripMargin)

  test("split routes each violation type once; redelivery and clean epochs publish nothing") {
    val dlqRoot = SparkTestBase.tempDir("dlq-split")
    val (clean, n) = Dlq.split(mixedBatch, "doc_id", dlqRoot, "s/0")
    assert(n == 5)
    assert(clean.select("doc_id").collect().map(_.getString(0)).sorted.toSeq == Seq("k4", "k5"))
    val routed = Dlq.read(spark, dlqRoot).collect()
      .map(r => (Option(r.getString(0)).getOrElse("<null>"), r.getString(4))).toSet
    assert(routed == Set(("<null>", "null_key"), ("", "null_key"), ("k1", "bad_op"),
      ("k2", "null_lsn"), ("k3", "null_payload")))

    // redelivered epoch: marker short-circuits, rows never double
    val (_, n2) = Dlq.split(mixedBatch, "doc_id", dlqRoot, "s/0")
    assert(n2 == 0 && Dlq.read(spark, dlqRoot).count() == 5)

    // an epoch with zero violations publishes no directory at all
    val (_, n3) = Dlq.split(mixedBatch.filter(col("doc_id").isin("k4", "k5")), "doc_id", dlqRoot, "s/1")
    assert(n3 == 0)
    assert(!new java.io.File(s"$dlqRoot/epoch_s_1").exists())
    assert(Dlq.read(spark, dlqRoot).count() == 5)

    // payload rides as JSON for re-injection after a fix
    val p = Dlq.read(spark, dlqRoot).filter(col("key") === "k1").head().getString(3)
    assert(p.contains("\"v\":3"))
  }

  test("splitJson routes only genuinely invalid JSON; null/empty/scalars pass; redelivery no-op") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  ('a', 1L, '{"x":1}'),
        |  ('b', 2L, '{"x":'),
        |  ('c', 3L, CAST(NULL AS STRING)),
        |  ('d', 4L, ''),
        |  ('e', 5L, '123'),
        |  ('f', 6L, '[{"y":2}]'),
        |  ('g', 7L, 'not json')
        |AS t(doc_id, lsn, js)""".stripMargin)
    val dlqRoot = SparkTestBase.tempDir("dlq-json")
    val (clean, n) = Dlq.splitJson(df, "js", "doc_id", dlqRoot, "j/0")
    assert(n == 2)
    assert(clean.select("doc_id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("a", "c", "d", "e", "f"))
    val routed = Dlq.read(spark, dlqRoot).collect()
      .map(r => (r.getString(0), r.getString(3), r.getString(4))).toSet
    assert(routed == Set(("b", "{\"x\":", "parse_error"), ("g", "not json", "parse_error")))
    // op/lsn: frame has lsn but no op -> op rides as null
    assert(Dlq.read(spark, dlqRoot).filter(col("op").isNull).count() == 2)
    val (_, n2) = Dlq.splitJson(df, "js", "doc_id", dlqRoot, "j/0")
    assert(n2 == 0 && Dlq.read(spark, dlqRoot).count() == 2)
  }

  test("wired pipeline: parse errors leave for the DLQ before a STRICT deserialize stage") {
    import graft.schema.{InferOptions, SchemaRegistry}
    import graft.smt.{JsonDeserialize, JsonDeserializeConfig}
    val cfg = GenConfig(numDocs = 30, numEvents = 300, seed = 23, withMetadata = true)
    val corrupted = ChangeGen.events(spark, cfg).withColumn("metadata",
      when(col("lsn") % 7 === 0, expr("substring(metadata, 1, length(metadata)-1)"))
        .otherwise(col("metadata")))
    val srcDir = SparkTestBase.tempDir("dlqp-src")
    corrupted.coalesce(1).write.mode("append").parquet(srcDir)

    val root = SparkTestBase.tempDir("dlqp-table")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    val dlqRoot = SparkTestBase.tempDir("dlqp-out")
    val stage = new JsonDeserialize(JsonDeserializeConfig(
      Seq("metadata"), "docs", InferOptions(optionalStructFields = true)), new SchemaRegistry(true))
    // STRICT mode: without the DLQ, the first corrupted payload would fail
    // the epoch (JsonParseException); with it, the epoch lands.
    Pipeline.runFileStream(spark, srcDir, table, SparkTestBase.tempDir("dlqp-ckpt"), "dp",
      stages = Seq(stage), dlqDir = Some(dlqRoot)).awaitTermination()

    val routed = Dlq.read(spark, dlqRoot)
    val expected = corrupted.filter(col("lsn") % 7 === 0).count()
    assert(routed.count() == expected)
    assert(routed.select("error").distinct().collect().map(_.getString(0)).toSeq == Seq("parse_error"))
    assert(routed.select("payload").head().getString(0).startsWith("{")) // raw text preserved
    assert(table.snapshot.lineage("dlq.routed") == expected)
    // state == replay of only the clean events through the same stage shape
    val cleanRoot = SparkTestBase.tempDir("dlqp-cleantable")
    val cleanT = IceLite.create(spark, cleanRoot, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    val cleanStage = new JsonDeserialize(JsonDeserializeConfig(
      Seq("metadata"), "docs", InferOptions(optionalStructFields = true)), new SchemaRegistry(true))
    val cleanSrc = SparkTestBase.tempDir("dlqp-cleansrc")
    corrupted.filter(col("lsn") % 7 =!= 0).coalesce(1).write.mode("append").parquet(cleanSrc)
    Pipeline.runFileStream(spark, cleanSrc, cleanT, SparkTestBase.tempDir("dlqp-cleanckpt"), "dpc",
      stages = Seq(cleanStage)).awaitTermination()
    def state(t: graft.table.IceLiteTable) =
      t.read().select("doc_id", "n_tok", "source").collect().map(_.toString).sorted.toSeq
    assert(state(table) == state(cleanT))
  }

  test("reinject drains active epochs through a fix into the table; still-bad rows stay active") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.types._
    val payload = StructType(Seq(
      StructField("doc_id", StringType, nullable = false), StructField("v", IntegerType)))
    val root = SparkTestBase.tempDir("rein-table")
    val table = IceLite.create(spark, root, payload, "doc_id", numBuckets = 2)
    table.merge(spark.sql(
      "SELECT 'k0' AS doc_id, 'c' AS op, 1L AS lsn, named_struct('doc_id','k0','v',1) AS after"), "e/0")

    // three violations: fixable bad_op, fixable null_key (key recoverable
    // from payload), and an unfixable one (null payload, non-delete)
    val dlqRoot = SparkTestBase.tempDir("rein-dlq")
    val batch = spark.sql(
      """SELECT * FROM VALUES
        |  ('k1',                 'x', 10L, named_struct('doc_id','k1','v',7)),
        |  (CAST(NULL AS STRING), 'u', 11L, named_struct('doc_id','k2','v',8)),
        |  ('k3',                 'u', 12L, CAST(NULL AS STRUCT<doc_id: STRING, v: INT>))
        |AS t(doc_id, op, lsn, after)""".stripMargin)
    val (_, n) = Dlq.split(batch, "doc_id", dlqRoot, "r/0")
    assert(n == 3)

    // fix: bad op -> 'u', recover the key from the JSON payload
    def fixer(dlq: DataFrame): DataFrame = dlq.select(
      coalesce(col("key"), get_json_object(col("payload"), "$.doc_id")).as("doc_id"),
      when(col("op") === "x", "u").otherwise(col("op")).as("op"),
      col("lsn"),
      from_json(col("payload"), payload).as("after"))

    val (reinjected, stillBad) = Dlq.reinject(table, dlqRoot, fixer)
    assert(reinjected == 2 && stillBad == 1)
    val got = table.read().collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("k0" -> 1, "k1" -> 7, "k2" -> 8))
    assert(table.snapshot.lineage("dlq.reinjected") == 2)
    // active view: only the unfixable row; audit view: originals + residual
    val active = Dlq.read(spark, dlqRoot).collect()
    assert(active.length == 1 && active.head.getString(4) == "null_payload")
    assert(Dlq.read(spark, dlqRoot, includeConsumed = true).count() == 4)

    // second reinject with the same fix: the residual row just re-routes —
    // nothing new lands in the table, active stays a single copy
    val v = table.snapshot.version
    val (r2, b2) = Dlq.reinject(table, dlqRoot, fixer)
    assert(r2 == 0 && b2 == 1)
    assert(table.snapshot.version == v)
    assert(Dlq.read(spark, dlqRoot).count() == 1)

    // crash-shaped: drop one consumed marker and re-run — value-idempotent
    // under the LWW fold, final state unchanged
    val consumed = new java.io.File(dlqRoot).listFiles()
      .filter(f => f.getName.startsWith("epoch_r_0")).head
    assert(new java.io.File(consumed, "_consumed").delete())
    val (r3, _) = Dlq.reinject(table, dlqRoot, fixer)
    assert(r3 == 2) // re-applied, same lsn/payload
    assert(table.read().collect().map(r => r.getString(0) -> r.getInt(1)).toMap == got)
    assert(Dlq.read(spark, dlqRoot).count() == 1)
  }

  test("crash-shaped staging residue is overwritten by the re-run") {
    val dlqRoot = SparkTestBase.tempDir("dlq-crash")
    val residue = new java.io.File(s"$dlqRoot/.stage_epoch_c_0")
    residue.mkdirs()
    java.nio.file.Files.writeString(residue.toPath.resolve("junk.parquet"), "not parquet")
    val (_, n) = Dlq.split(mixedBatch, "doc_id", dlqRoot, "c/0")
    assert(n == 5)
    assert(Dlq.read(spark, dlqRoot).count() == 5)
  }

  test("wired pipeline: violations routed, clean state merged, count in commit lineage") {
    val cfg = GenConfig(numDocs = 40, numEvents = 400, seed = 19, withMetadata = false)
    val corrupted = ChangeGen.events(spark, cfg)
      .withColumn("op", when(col("lsn") % 5 === 0, lit("x")).otherwise(col("op")))
    val srcDir = SparkTestBase.tempDir("dlq-src")
    corrupted.coalesce(1).write.mode("append").parquet(srcDir)

    val root = SparkTestBase.tempDir("dlq-table")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 8)
    val dlqRoot = SparkTestBase.tempDir("dlq-out")
    val ckpt = SparkTestBase.tempDir("dlq-ckpt")
    Pipeline.runFileStream(spark, srcDir, table, ckpt, "dlq1", dlqDir = Some(dlqRoot))
      .awaitTermination()

    val routed = Dlq.read(spark, dlqRoot)
    assert(routed.count() == 400 / 5)
    assert(routed.select("error").distinct().collect().map(_.getString(0)).toSeq == Seq("bad_op"))
    assert(table.snapshot.lineage("dlq.routed") == 400 / 5)

    // state == replay of only the clean events
    val cleanRoot = SparkTestBase.tempDir("dlq-cleantable")
    val cleanT = IceLite.create(spark, cleanRoot, ChangeGen.payloadSchema, "doc_id", numBuckets = 8)
    Pipeline.replayBatch(spark, corrupted.filter(col("lsn") % 5 =!= 0), cleanT, "ct",
      epochs = 2, lsnMax = cfg.numEvents)
    def state(t: graft.table.IceLiteTable) =
      t.read().select("doc_id", "n_tok", "source").collect().map(_.toString).sorted.toSeq
    assert(state(table) == state(cleanT))
  }
}
