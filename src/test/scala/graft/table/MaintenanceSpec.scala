package graft.table

import graft.SparkTestBase
import graft.stream.Pipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Layout + metadata maintenance: rebucket (bucket-count evolution for a
 * table that outgrew its day-one layout) and the pipeline's opt-in
 * expire/vacuum cadence (metadata must stay O(horizon) on a long-running
 * ingest, not O(all batches ever)).
 */
class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val payload = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("val", IntegerType, nullable = true)))

  private def batch(rows: Seq[(String, Int)], lsn0: Long, op: String = "u") = {
    import spark.implicits._
    rows.zipWithIndex.toDF("kv", "i").select(
      col("kv._1").as("doc_id"),
      lit(op).as("op"),
      (lit(lsn0) + col("i")).as("lsn").cast(LongType),
      when(lit(op) =!= "d",
        struct(col("kv._1").as("doc_id"), col("kv._2").as("val"))).as("after"))
  }

  test("rebucket preserves state, tombstones, and the epoch ledger; ingest continues") {
    val root = SparkTestBase.tempDir("rebucket-cow")
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 4)
    t.merge(batch((0 until 30).map(i => s"k$i" -> i), lsn0 = 0), "s/0")
    t.merge(batch(Seq("k5" -> 0), lsn0 = 100, op = "d"), "s/1")
    val v = t.rebucket(16)
    val s = t.snapshot
    assert(s.version == v && s.numBuckets == 16)
    assert(s.lineage("rebucket.to") == 16L)
    // state identical: k5 stays deleted, everyone else intact
    val state = t.read().collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(state.size == 29 && !state.contains("k5") && state("k7") == 7)
    // the tombstone physically survived (no watermark passed): a late
    // pre-delete update must not resurrect k5
    t.merge(batch(Seq("k5" -> 555), lsn0 = 50), "s/2")
    assert(!t.read().collect().map(_.getString(0)).contains("k5"))
    // point lookup plans with the NEW bucket count
    assert(t.lookup(Seq("k7")).collect().map(_.getInt(1)).toSeq == Seq(7))
    // ledger carried over: replaying an old epoch is still a no-op
    val vBefore = t.snapshot.version
    t.merge(batch(Seq("k1" -> 999), lsn0 = 1000), "s/0")
    assert(t.snapshot.version == vBefore)
    // normal ingest continues under the new layout
    t.merge(batch(Seq("new1" -> 1), lsn0 = 2000), "s/3")
    assert(t.read().count() == 30)
  }

  test("rebucket collapses MOR deltas into one resolved generation") {
    val root = SparkTestBase.tempDir("rebucket-mor")
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 4,
      properties = Map("write.mode" -> "mor"))
    t.merge(batch((0 until 20).map(i => s"k$i" -> i), lsn0 = 0), "s/0")
    t.merge(batch(Seq("k3" -> 300, "k4" -> 400), lsn0 = 100), "s/1")
    assert(t.snapshot.files.groupBy(_.bucket).exists(_._2.size > 1)) // deltas stacked
    t.rebucket(8)
    // deltas collapsed: exactly one resolved generation per touched bucket
    assert(t.snapshot.files.groupBy(_.bucket).forall(_._2.size == 1))
    val state = t.read().collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(state("k3") == 300 && state("k4") == 400 && state("k5") == 5 && state.size == 20)
  }

  test("pipeline expire/vacuum cadence bounds metadata on a replay ingest") {
    val root = SparkTestBase.tempDir("expire-cadence")
    import graft.stream.{ChangeGen, GenConfig}
    val t = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    val cfg = GenConfig(numDocs = 60, numEvents = 1200, seed = 11, withMetadata = false)
    spark.conf.set(Pipeline.ExpireKeepConf, "3")
    spark.conf.set(Pipeline.ExpireEveryConf, "4")
    spark.conf.set(Pipeline.VacuumGraceConf, "0")
    try Pipeline.replayBatch(spark, ChangeGen.events(spark, cfg), t, "ex", epochs = 8,
      lsnMax = cfg.numEvents)
    finally Seq(Pipeline.ExpireKeepConf, Pipeline.ExpireEveryConf, Pipeline.VacuumGraceConf)
      .foreach(spark.conf.unset)
    // 8 merges happened, but at most keep + (cadence window) version files survive
    val versions = new java.io.File(root, "meta").listFiles()
      .map(_.getName).filter(n => n.startsWith("v") && n.endsWith(".json"))
    assert(versions.length <= 3 + 4, versions.mkString(","))
    // state equals an unmaintained replay of the same stream
    val root2 = SparkTestBase.tempDir("expire-oracle")
    val t2 = IceLite.create(spark, root2, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    t2.merge(ChangeGen.events(spark, cfg), "one/0")
    assert(t.read().orderBy("doc_id").collect().map(_.toString)
      .sameElements(t2.read().orderBy("doc_id").collect().map(_.toString)))
    // exactly-once survived expiry: ledger watermarks (not version files)
    // carry the history
    val vBefore = t.snapshot.version
    t.merge(ChangeGen.events(spark, cfg.copy(numEvents = 150)), "ex/0")
    assert(t.snapshot.version == vBefore)
  }

  test("compactSmallFiles bin-packs fragmented buckets only, preserving state") {
    val root = SparkTestBase.tempDir("compact-small")
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 4,
      properties = Map("write.mode" -> "mor"))
    // 6 tiny delta epochs: every touched bucket accumulates ~6 small files
    (0 until 6).foreach { e =>
      t.merge(batch((0 until 20).map(i => s"k$i" -> (100 * e + i)), lsn0 = 100L * e), s"s/$e")
    }
    val before = t.snapshot.files.groupBy(_.bucket).view.mapValues(_.size).toMap
    assert(before.values.max > 1, "fixture should be fragmented")
    val expected = t.read().collect().map(r => r.getString(0) -> r.getInt(1)).toMap

    val picked = t.compactSmallFiles(targetRowsPerFile = 1000000L)
    assert(picked == before.filter(_._2 > 1).keySet, s"picked $picked of $before")
    val after = t.snapshot.files.groupBy(_.bucket).view.mapValues(_.size).toMap
    assert(picked.forall(b => after(b) == 1), s"after: $after")
    assert(t.read().collect().map(r => r.getString(0) -> r.getInt(1)).toMap == expected)
    // already-packed table: planner picks nothing (idempotent, zero jobs)
    assert(t.compactSmallFiles(targetRowsPerFile = 1000000L).isEmpty)
  }

  test("pipeline compactSmallFiles cadence bounds file count during replay ingest") {
    val root = SparkTestBase.tempDir("compact-cadence")
    import graft.stream.{ChangeGen, GenConfig}
    val t = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4,
      properties = Map("write.mode" -> "mor"))
    val cfg = GenConfig(numDocs = 60, numEvents = 1200, seed = 12, withMetadata = false)
    spark.conf.set(Pipeline.CompactSmallEveryConf, "4")
    try Pipeline.replayBatch(spark, ChangeGen.events(spark, cfg), t, "cs", epochs = 8,
      lsnMax = cfg.numEvents)
    finally spark.conf.unset(Pipeline.CompactSmallEveryConf)
    // 8 MOR delta epochs would leave ~8 files/bucket; the epoch-4 compaction
    // caps the tail at (epochs since last compaction + 1)
    val perBucket = t.snapshot.files.groupBy(_.bucket).view.mapValues(_.size).toMap
    assert(perBucket.values.max <= 5, s"per-bucket files: $perBucket")
    // state equals an unmaintained one-shot merge of the same stream
    val root2 = SparkTestBase.tempDir("compact-oracle")
    val t2 = IceLite.create(spark, root2, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    t2.merge(ChangeGen.events(spark, cfg), "one/0")
    assert(t.read().orderBy("doc_id").collect().map(_.toString)
      .sameElements(t2.read().orderBy("doc_id").collect().map(_.toString)))
  }
}
