package graft.table

import graft.SparkTestBase
import graft.hashing.KafkaMurmur2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Write-audit-publish staged commits ([[IceLiteTable.mergeStaged]] /
  * [[IceLiteTable.publishStaged]]): a merged epoch parks invisibly, gets
  * audited over its net delta, and publishes atomically (rebasing over
  * concurrent ingest) or drops without a trace. */
class WapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val payloadType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("v", LongType)))

  private def batch(keys: Seq[String], vBase: Long, lsnBase: Long,
                    deletes: Set[String] = Set.empty): DataFrame =
    keys.zipWithIndex.map { case (k, i) =>
      (k, if (deletes(k)) "d" else "u", lsnBase + i, vBase + i)
    }.toDF("doc_id", "op", "lsn", "v0")
      .select(col("doc_id"), col("op"), col("lsn"),
        when(col("op") === "d", lit(null).cast(payloadType))
          .otherwise(struct(col("doc_id"), col("v0").as("v"))).as("after"))

  private def mkTable(mode: String = "cow") =
    IceLite.create(spark, SparkTestBase.tempDir("wap"), payloadType, "doc_id",
      numBuckets = 8, properties = Map("write.mode" -> mode))

  private def rows(df: DataFrame): Seq[(String, Long)] =
    df.select("doc_id", "v").as[(String, Long)].collect().sortBy(_._1).toSeq

  private def keysInBuckets(n: Int, buckets: Set[Int], prefix: String = "doc"): Seq[String] =
    Iterator.from(0).map(i => s"$prefix$i")
      .filter(k => buckets(KafkaMurmur2.bucketLabelOf(k, 8))).take(n).toSeq

  test("a staged merge is invisible until published, then lands exactly-once") {
    val t = mkTable()
    t.merge(batch(Seq("a", "b", "c"), 0, 0), "e0")
    val v0 = t.snapshot.version
    val want0 = rows(t.read())

    t.mergeStaged(batch(Seq("b", "d"), 100, 10, deletes = Set("b")), "e1", "s1")
    // invisible: published read and version unchanged
    assert(rows(t.read()) == want0 && t.snapshot.version == v0)
    assert(t.stagedNames == Seq("s1"))
    // the audit views see the post-publish world
    assert(rows(t.readStaged("s1")) == Seq(("a", 0L), ("c", 2L), ("d", 101L)))
    val delta = t.stagedChanges("s1").select("doc_id", "change_op")
      .as[(String, String)].collect().sortBy(_._1).toSeq
    assert(delta == Seq(("b", "delete"), ("d", "insert")))

    assert(t.publishStaged("s1") == CommitOutcome.Committed)
    assert(rows(t.read()) == Seq(("a", 0L), ("c", 2L), ("d", 101L)))
    assert(t.stagedNames.isEmpty && t.isEpochCommitted("e1"))
    // exactly-once across the gap: replaying the published epoch is a no-op
    val s = t.merge(batch(Seq("b", "d"), 100, 10, deletes = Set("b")), "e1")
    assert(s.inserted + s.updated + s.deleted == 0 && rows(t.read()).size == 3)
  }

  test("dropStaged erases the stage and reclaims its data files") {
    val t = mkTable()
    t.merge(batch(Seq("a", "b"), 0, 0), "e0")
    val before = rows(t.read())
    t.mergeStaged(batch(Seq("x", "y", "z"), 50, 10), "e1", "bad")
    assert(t.dropStaged("bad") && t.stagedNames.isEmpty)
    assert(rows(t.read()) == before)
    // nothing left for vacuum: the staged files were deleted eagerly
    assert(t.vacuum(keepSnapshots = 100) == 0)
    assert(!t.dropStaged("bad")) // idempotent
    // the epoch never published — a real merge still applies it
    t.merge(batch(Seq("x", "y", "z"), 50, 10), "e1")
    assert(rows(t.read()).size == 5)
  }

  test("publishStagedIf gates on the delta: reject drops, accept publishes") {
    val t = mkTable()
    t.merge(batch((0 until 20).map(i => s"doc$i"), 0, 0), "e0")
    val want0 = rows(t.read())
    // audit rule: refuse a batch that deletes more than half its keys
    def audit(delta: DataFrame): Boolean = {
      val byOp = delta.groupBy("change_op").count().as[(String, Long)].collect().toMap
      byOp.getOrElse("delete", 0L) * 2 <= byOp.values.sum
    }
    t.mergeStaged(batch((0 until 10).map(i => s"doc$i"), 0, 100,
      deletes = (0 until 8).map(i => s"doc$i").toSet), "e1", "mass-del")
    assert(t.publishStagedIf("mass-del")(audit).isEmpty)
    assert(rows(t.read()) == want0 && t.stagedNames.isEmpty)
    // the rejected epoch re-stages (new content) and passes
    t.mergeStaged(batch(Seq("doc0", "doc1"), 500, 200), "e1", "fixed")
    assert(t.publishStagedIf("fixed")(audit).contains(CommitOutcome.Committed))
    assert(rows(t.read()).count(_._2 >= 500) == 2)
  }

  test("publish rebases over concurrent ingest in disjoint buckets") {
    val t = mkTable()
    val stageKeys = keysInBuckets(5, Set(0, 1))
    val otherKeys = keysInBuckets(5, Set(4, 5), prefix = "oth")
    t.merge(batch(stageKeys ++ otherKeys, 0, 0), "e0")
    // young tables rewrite every bucket in no-prune mode, which would make
    // any concurrent commit overlap — force pruning so the staged rewrite
    // touches only its own buckets (the mature-table shape)
    spark.conf.set("graft.merge.filePruning", "always")
    try {
      t.mergeStaged(batch(stageKeys, 100, 50), "e1", "s1")
      // concurrent ingest lands in OTHER buckets while the audit runs
      t.merge(batch(otherKeys, 200, 60), "e2")
    } finally spark.conf.unset("graft.merge.filePruning")
    assert(t.publishStaged("s1") == CommitOutcome.Committed)
    val got = rows(t.read())
    assert(stageKeys.forall(k => got.exists(r => r._1 == k && r._2 >= 100)), s"$got")
    assert(otherKeys.forall(k => got.exists(r => r._1 == k && r._2 >= 200)), s"$got")
  }

  test("publish yields on overlapping concurrent ingest; re-staging succeeds") {
    val t = mkTable()
    val keys = keysInBuckets(5, Set(2, 3))
    t.merge(batch(keys, 0, 0), "e0")
    t.mergeStaged(batch(keys, 100, 50), "e1", "s1")
    t.merge(batch(keys, 200, 60), "e2") // same buckets — rewrote the staged base files
    assert(t.publishStaged("s1") == CommitOutcome.Overlap)
    assert(t.stagedNames.isEmpty) // consumed; its files were reclaimed
    assert(rows(t.read()).forall(_._2 >= 200))
    assert(t.vacuum(keepSnapshots = 100) == 0) // no orphans left behind
    // recompute against the fresh head (lsn advances past the conflict)
    t.mergeStaged(batch(keys, 300, 70), "e1", "s2")
    assert(t.publishStaged("s2") == CommitOutcome.Committed)
    assert(rows(t.read()).forall(_._2 >= 300))
  }

  test("a same-epoch duplicate published first makes publish a no-op (EpochWon)") {
    val t = mkTable()
    t.merge(batch(Seq("a"), 0, 0), "e0")
    t.mergeStaged(batch(Seq("b"), 100, 10), "e1", "s1")
    t.merge(batch(Seq("b"), 100, 10), "e1") // concurrent duplicate delivery wins
    assert(t.publishStaged("s1") == CommitOutcome.EpochWon)
    assert(rows(t.read()) == Seq(("a", 0L), ("b", 100L)))
    assert(t.stagedNames.isEmpty && t.vacuum(keepSnapshots = 100) == 0)
  }

  test("vacuum never reclaims a parked stage's files") {
    val t = mkTable()
    val held = keysInBuckets(2, Set(0, 1), prefix = "held")
    val hot = keysInBuckets(1, Set(4, 5), prefix = "hot")
    t.merge(batch(held ++ hot, 0, 0), "e0")
    spark.conf.set("graft.merge.filePruning", "always")
    try {
      t.mergeStaged(batch(held, 100, 10), "e1", "held")
      t.merge(batch(hot, 500, 20), "e2") // concurrent ingest ages the staged base
    } finally spark.conf.unset("graft.merge.filePruning")
    // the staged files are referenced by NO retained version — only the
    // stage marker protects them through the sweep
    assert(t.vacuum(keepSnapshots = 1) >= 0)
    assert(t.publishStaged("held") == CommitOutcome.Committed)
    val got = rows(t.read())
    assert(held.forall(k => got.exists(r => r._1 == k && r._2 >= 100)), s"$got")
    assert(hot.forall(k => got.exists(r => r._1 == k && r._2 == 500)), s"$got")
  }

  test("re-staging the same name replaces it and reclaims the old attempt") {
    val t = mkTable()
    t.merge(batch(Seq("a"), 0, 0), "e0")
    t.mergeStaged(batch(Seq("b"), 100, 10), "e1", "s")
    t.mergeStaged(batch(Seq("c"), 200, 20), "e1b", "s") // replaces
    assert(t.stagedNames == Seq("s"))
    assert(rows(t.readStaged("s")) == Seq(("a", 0L), ("c", 200L)))
    assert(t.publishStaged("s") == CommitOutcome.Committed)
    assert(rows(t.read()) == Seq(("a", 0L), ("c", 200L)))
    assert(t.vacuum(keepSnapshots = 100) == 0) // first attempt's files reclaimed
  }

  test("MOR tables stage and publish the same way") {
    val t = mkTable("mor")
    t.merge(batch(Seq("a", "b"), 0, 0), "e0")
    t.mergeStaged(batch(Seq("b", "c"), 100, 10, deletes = Set("b")), "e1", "s1")
    assert(rows(t.read()) == Seq(("a", 0L), ("b", 1L)))
    assert(rows(t.readStaged("s1")) == Seq(("a", 0L), ("c", 101L)))
    assert(t.publishStaged("s1") == CommitOutcome.Committed)
    assert(rows(t.read()) == Seq(("a", 0L), ("c", 101L)))
  }
}
