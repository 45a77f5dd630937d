package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Epoch-ledger watermark compaction: exactly-once state must be O(streams),
 * not O(micro-batches) — a long-running ingest commits one epoch key per
 * batch forever, and without compaction every snapshot rewrite carries (and
 * every epoch check scans) the full history. Contiguous-from-zero numeric
 * suffixes (`name/N`, the Structured Streaming batchId shape) fold into one
 * per-prefix watermark; anything else stays explicit.
 */
class LedgerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val payload = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("val", IntegerType, nullable = true)))

  private def batch(rows: Seq[(String, Int)], lsn0: Long) = {
    import spark.implicits._
    rows.zipWithIndex.toDF("kv", "i").select(
      col("kv._1").as("doc_id"),
      lit("u").as("op"),
      (lit(lsn0) + col("i")).as("lsn").cast(LongType),
      struct(col("kv._1").as("doc_id"), col("kv._2").as("val")).as("after"))
  }

  test("parseKey accepts name/N, rejects everything else") {
    assert(EpochLedger.parseKey("s/12") == Some(("s", 12L)))
    assert(EpochLedger.parseKey("a/b/7") == Some(("a/b", 7L))) // last slash splits
    assert(EpochLedger.parseKey("s/").isEmpty)
    assert(EpochLedger.parseKey("/7").isEmpty)
    assert(EpochLedger.parseKey("no-slash").isEmpty)
    assert(EpochLedger.parseKey("s/12x").isEmpty)
    assert(EpochLedger.parseKey("s/-3").isEmpty)
    assert(EpochLedger.parseKey("s/" + "9" * 19).isEmpty) // would overflow Long
  }

  test("compact folds the contiguous-from-zero prefix, keeps gaps and free-form keys") {
    val list = List("s/0", "s/1", "s/2", "s/4", "other", "t/1")
    val (kept, wms) = EpochLedger.compact(list, Map.empty)
    assert(wms == Map("s" -> 2L)) // s/4 is gapped; t/1 never saw t/0
    assert(kept == List("s/4", "other", "t/1"))
    // a later pass with the gap filled absorbs the tail
    val (kept2, wms2) = EpochLedger.compact("s/3" :: kept, wms)
    assert(wms2("s") == 4L && !kept2.exists(_.startsWith("s/")))
    // covered() honors watermarks and leaves free-form keys to the list
    assert(EpochLedger.covered("s/1", wms2) && EpochLedger.covered("s/004", wms2))
    assert(!EpochLedger.covered("s/5", wms2) && !EpochLedger.covered("other", wms2))
  }

  test("merge replay compacts the ledger and stays exactly-once across compaction") {
    val root = SparkTestBase.tempDir("ledger-replay")
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 4,
      properties = Map("write.ledger.compact-threshold" -> "2"))
    (0 until 8).foreach(e => t.merge(batch(Seq(s"k$e" -> e), lsn0 = e * 10), s"s/$e"))
    val s = t.snapshot
    // list stays at/under threshold+1; the watermark carries the history
    assert(s.committedEpochs.size <= 3, s.committedEpochs)
    assert(s.epochWatermarks("s") >= 5L)
    assert((0 until 8).forall(e => t.isEpochCommitted(s"s/$e")))
    // re-delivering an epoch ABSORBED by the watermark must still no-op
    val vBefore = s.version
    val st = t.merge(batch(Seq("k1" -> 999), lsn0 = 10), "s/1")
    assert(st.inserted == 0 && st.updated == 0 && st.deleted == 0)
    assert(t.snapshot.version == vBefore)
    val state = t.read().collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(state == (0 until 8).map(e => s"k$e" -> e).toMap)
  }

  test("rebase under compaction: concurrent writer's epochs and watermarks both survive") {
    val root = SparkTestBase.tempDir("ledger-rebase")
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 4,
      properties = Map("write.ledger.compact-threshold" -> "2"))
    (0 until 4).foreach(e => t.merge(batch(Seq(s"a$e" -> e), lsn0 = e * 10), s"w/$e"))
    val base = t.snapshot
    assert(base.epochWatermarks.get("w").exists(_ >= 1L))
    // writer A advances (and compacts) while writer B holds a stale base
    t.merge(batch(Seq("a9" -> 9), lsn0 = 100), "w/4")
    // writer B: metadata-only candidate against the stale base (no files)
    val candB = base.copy(
      version = base.version + 1,
      committedEpochs = base.committedEpochs :+ "x/0",
      parentVersion = base.version)
    assert(t.commitRebasing(base, candB) == CommitOutcome.Committed)
    val s = t.snapshot
    assert((0 to 4).forall(e => s.epochCommitted(s"w/$e")))
    assert(s.epochCommitted("x/0"))
    // a racing duplicate of an epoch the winner's WATERMARK (not list)
    // covers must yield EpochWon: base predates w/4, the candidate claims
    // w/4, and by commit time the table has absorbed w/4 into the watermark
    val candDup = base.copy(
      version = base.version + 1, // stale version -> conflict -> rebase path
      committedEpochs = base.committedEpochs :+ "w/4",
      parentVersion = base.version)
    assert(t.commitRebasing(base, candDup) == CommitOutcome.EpochWon)
    // and re-merging an absorbed epoch through the full merge path no-ops
    val st = t.merge(batch(Seq("a0" -> 111), lsn0 = 5), "w/0")
    assert(st.inserted == 0 && st.updated == 0)
  }

  test("rollback reverts watermarks with the rest of the ledger") {
    val root = SparkTestBase.tempDir("ledger-rollback")
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 4,
      properties = Map("write.ledger.compact-threshold" -> "1"))
    (0 until 4).foreach(e => t.merge(batch(Seq(s"k$e" -> e), lsn0 = e * 10), s"s/$e"))
    val mid = t.snapshot.version
    val wmMid = t.snapshot.epochWatermarks.getOrElse("s", -1L)
    (4 until 6).foreach(e => t.merge(batch(Seq(s"k$e" -> e), lsn0 = e * 10), s"s/$e"))
    assert(t.snapshot.epochWatermarks("s") > wmMid)
    t.rollbackTo(mid)
    assert(t.snapshot.epochWatermarks.getOrElse("s", -1L) == wmMid)
    // rolled-back epochs are replayable again (exactly-once across rollback)
    val st = t.merge(batch(Seq("k4" -> 4), lsn0 = 40), "s/4")
    assert(st.inserted == 1)
  }
}
