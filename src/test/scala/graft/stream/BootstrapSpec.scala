package graft.stream

import graft.SparkTestBase
import graft.hashing.KafkaMurmur2
import graft.table.IceLite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Debezium-style initial-snapshot bootstrap ([[Pipeline.bootstrap]]): a
 * consistent dump at source position W loads as op="r" events at lsn = W in
 * bucket-disjoint resumable chunks; the binlog tail starts strictly after W.
 */
class BootstrapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val cfg = GenConfig(numDocs = 60, numEvents = 600, seed = 11, withMetadata = false)

  /** Source state at W: LWW fold of events with lsn <= W, deletes dropped —
    * the "consistent dump" a CDC connector takes before streaming. */
  private def stateAt(changes: DataFrame, w: Long): DataFrame = {
    val byLsn = Window.partitionBy(col("doc_id")).orderBy(col("lsn").desc)
    changes.filter(col("lsn") <= w)
      .withColumn("__rn", row_number().over(byLsn))
      .filter(col("__rn") === 1 && col("op") =!= "d")
      .select(col("after.*"))
  }

  private def tokensOf(t: graft.table.IceLiteTable): Map[String, (String, String)] =
    t.read().collect().map(r => r.getString(0) ->
      ((r.getSeq[Int](1).mkString(","), r.getString(3)))).toMap

  test("bootstrap + tail converges to the full replay; both re-run as no-ops") {
    val changes = ChangeGen.events(spark, cfg)
    val w = cfg.numEvents / 2

    val bootRoot = SparkTestBase.tempDir("boot-a")
    val boot = IceLite.create(spark, bootRoot, ChangeGen.payloadSchema, "doc_id", numBuckets = 8)
    Pipeline.bootstrap(spark, stateAt(changes, w), boot, w, chunks = 4)
    assert(Pipeline.bootstrapWatermark(boot).contains(w))
    val vAfter = boot.snapshot.version
    // re-run: every chunk is a ledger no-op, the watermark is already
    // recorded — zero new versions
    Pipeline.bootstrap(spark, stateAt(changes, w), boot, w, chunks = 4)
    assert(boot.snapshot.version == vAfter)

    val tail = changes.filter(col("lsn") > w)
    Pipeline.replayBatch(spark, tail, boot, "tail", epochs = 3, lsnMax = cfg.numEvents)
    val vTail = boot.snapshot.version
    Pipeline.replayBatch(spark, tail, boot, "tail", epochs = 3, lsnMax = cfg.numEvents)
    assert(boot.snapshot.version == vTail) // redelivered tail: no-op

    val fullRoot = SparkTestBase.tempDir("boot-b")
    val full = IceLite.create(spark, fullRoot, ChangeGen.payloadSchema, "doc_id", numBuckets = 8)
    Pipeline.replayBatch(spark, changes, full, "full", epochs = 4, lsnMax = cfg.numEvents)
    assert(tokensOf(boot) == tokensOf(full), "handoff state diverged from full replay")
  }

  test("a bootstrap crashed between chunks resumes: committed chunks skip, the rest load") {
    val changes = ChangeGen.events(spark, cfg)
    val w = cfg.numEvents / 2
    val state = stateAt(changes, w)

    val root = SparkTestBase.tempDir("boot-resume")
    val t = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 8)
    // simulate the crash: chunk 0 committed (pinning the chunk contract —
    // epoch key `bootstrap/i`, chunk = pmod(bucketLabel(key), chunks) == i),
    // chunks 1-3 and the watermark property lost with the driver
    val ev0 = state.select(col("doc_id"), lit("r").as("op"), lit(w).as("lsn"),
        struct(col("doc_id"), col("tokens"), col("n_tok"), col("source")).as("after"))
      .filter(pmod(KafkaMurmur2.bucketLabel(col("doc_id"), 8), lit(4)) === 0)
    t.merge(ev0, "bootstrap/0")
    assert(Pipeline.bootstrapWatermark(t).isEmpty)

    Pipeline.bootstrap(spark, state, t, w, chunks = 4) // resume
    assert(Pipeline.bootstrapWatermark(t).contains(w))
    assert(t.snapshot.committedEpochs.count(_.startsWith("bootstrap/")) +
      t.snapshot.epochWatermarks.get("bootstrap").map(_.toInt + 1).getOrElse(0) >= 4)

    val oneShotRoot = SparkTestBase.tempDir("boot-oneshot")
    val oneShot = IceLite.create(spark, oneShotRoot, ChangeGen.payloadSchema, "doc_id", numBuckets = 8)
    Pipeline.bootstrap(spark, state, oneShot, w, chunks = 4)
    assert(tokensOf(t) == tokensOf(oneShot), "resumed bootstrap diverged from one-shot")
  }

  test("handoff stale guard: an accidentally re-sent pre-watermark change loses to the dump row") {
    val changes = ChangeGen.events(spark, cfg)
    val w = cfg.numEvents / 2
    val root = SparkTestBase.tempDir("boot-stale")
    val t = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 8)
    Pipeline.bootstrap(spark, stateAt(changes, w), t, w, chunks = 2)
    val before = tokensOf(t)
    val someKey = before.keysIterator.next()

    // overlap redelivery: an old (lsn < W) update for a key in the dump
    val stale = spark.range(1).select(lit(someKey).as("doc_id"), lit("u").as("op"),
      lit(w - 3).as("lsn"),
      struct(lit(someKey).as("doc_id"),
        array(lit(-1), lit(-1)).as("tokens"), lit(2).as("n_tok"),
        lit("STALE").as("source")).as("after"))
    t.merge(stale, "overlap/0")
    assert(tokensOf(t) == before, "pre-watermark redelivery must be stale-dropped")

    // a genuinely new post-watermark change applies
    val fresh = stale.withColumn("lsn", lit(cfg.numEvents + 5))
      .withColumn("after", col("after").withField("source", lit("FRESH")))
    t.merge(fresh, "overlap/1")
    assert(tokensOf(t)(someKey)._2 == "FRESH")
  }
}
