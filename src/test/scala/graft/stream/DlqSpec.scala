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
