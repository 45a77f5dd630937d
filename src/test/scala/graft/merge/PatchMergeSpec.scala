package graft.merge

import graft.SparkTestBase
import graft.table.IceLite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Patch merge (`write.merge.fold = patch`): partial CDC updates where a
  * null payload column means "unchanged". Covers the COW coalesce path, the
  * MOR delta + read-time column fold, the persisted reset watermark, salted
  * two-level folds, compaction, and exactly-once. */
class PatchMergeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val payloadType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("a", StringType),
    StructField("b", IntegerType)))

  /** (key, op, lsn, a, b) -> canonical change frame; null a/b = unchanged. */
  private def changes(rows: (String, String, Long, String, Integer)*): DataFrame =
    rows.toDF("doc_id", "op", "lsn", "a", "b")
      .select(col("doc_id"), col("op"), col("lsn"),
        when(col("op") === "d", lit(null).cast(payloadType))
          .otherwise(struct(col("doc_id"), col("a"), col("b"))).as("after"))

  private def mkTable(mode: String) = IceLite.create(
    spark, SparkTestBase.tempDir(s"patch-$mode"), payloadType, "doc_id", numBuckets = 4,
    properties = Map("write.mode" -> mode, "write.merge.fold" -> "patch"))

  private def state(t: graft.table.IceLiteTable): Seq[(String, Option[String], Option[Int])] =
    t.read().select("doc_id", "a", "b").as[(String, Option[String], Option[Int])]
      .collect().sortBy(_._1).toSeq

  // k1: insert full, then two partial updates touching different columns
  // k2: insert, delete, then partial re-create (only b)
  // k3: insert, then delete in a later epoch (stays deleted)
  // k4: set a, then a mid-batch delete followed by a partial b (reset path)
  private val e1 = Seq(
    ("k1", "c", 1L, "a1", Integer.valueOf(1)),
    ("k2", "c", 2L, "a2", Integer.valueOf(2)),
    ("k3", "c", 3L, "a3", Integer.valueOf(3)),
    ("k4", "u", 4L, "a4", null: Integer))
  private val e2 = Seq(
    ("k1", "u", 10L, null: String, Integer.valueOf(11)), // b only
    ("k2", "d", 12L, null: String, null: Integer),
    ("k4", "d", 13L, null: String, null: Integer),
    ("k4", "u", 14L, null: String, Integer.valueOf(44))) // b only, after delete
  private val e3 = Seq(
    ("k1", "u", 20L, "a1x", null: Integer), // a only
    ("k2", "u", 21L, null: String, Integer.valueOf(22)), // partial re-create
    ("k3", "d", 23L, null: String, null: Integer))

  private val expected = Seq(
    ("k1", Some("a1x"), Some(11)), // a from e3, b from e2
    ("k2", None, Some(22)), // deleted then partially re-created: a gone
    ("k4", None, Some(44))) // mid-batch delete reset a4

  test("COW patch: partial updates coalesce, deletes reset, last state matches") {
    val t = mkTable("cow")
    t.merge(changes(e1: _*), "e1")
    t.merge(changes(e2: _*), "e2")
    t.merge(changes(e3: _*), "e3")
    assert(state(t) == expected)
  }

  test("MOR patch: delta stacking + read-time column fold equals COW") {
    val t = mkTable("mor")
    t.merge(changes(e1: _*), "e1")
    t.merge(changes(e2: _*), "e2")
    t.merge(changes(e3: _*), "e3")
    assert(state(t) == expected)
  }

  test("MOR patch: different epoch splits converge (associativity)") {
    val oneShot = mkTable("mor")
    oneShot.merge(changes(e1 ++ e2 ++ e3: _*), "all")
    assert(state(oneShot) == expected)
  }

  test("MOR patch: compaction preserves the folded state") {
    val t = mkTable("mor")
    t.merge(changes(e1: _*), "e1")
    t.merge(changes(e2: _*), "e2")
    val mid = state(t)
    t.compactBuckets((0 until 4).toSet)
    assert(state(t) == mid)
    // post-compaction deltas still fold correctly
    t.merge(changes(e3: _*), "e3")
    assert(state(t) == expected)
  }

  test("salted patch fold is exact (two-level associativity)") {
    val t = mkTable("cow")
    spark.conf.set("graft.merge.dedupSalt", "3")
    try {
      t.merge(changes(e1: _*), "e1")
      t.merge(changes(e2: _*), "e2")
      t.merge(changes(e3: _*), "e3")
    } finally spark.conf.unset("graft.merge.dedupSalt")
    assert(state(t) == expected)
  }

  test("patch merge is exactly-once under epoch redelivery") {
    val t = mkTable("mor")
    t.merge(changes(e1: _*), "e1")
    t.merge(changes(e2: _*), "e2")
    val v = t.snapshot.version
    val s = t.merge(changes(e2: _*), "e2") // redelivery
    assert(s.inserted + s.updated + s.deleted == 0)
    assert(t.snapshot.version == v)
  }

  test("changesBetween classifies patch updates with folded payloads") {
    val t = mkTable("mor")
    t.merge(changes(e1: _*), "e1")
    val v1 = t.snapshot.version
    t.merge(changes(e2: _*), "e2")
    val ch = t.changesBetween(v1, t.snapshot.version)
      .select("doc_id", "change_op", "a", "b")
      .as[(String, String, Option[String], Option[Int])].collect().sortBy(_._1).toSeq
    assert(ch == Seq(
      ("k1", "update", Some("a1"), Some(11)), // folded: a carried, b patched
      ("k2", "delete", None, None),
      ("k4", "update", None, Some(44)))) // reset wiped a4, b patched
  }

  test("preDeduped (LWW-shaped) is rejected on a patch table") {
    val t = mkTable("cow")
    val ch = changes(e1: _*)
    val pre = MergeInto.dedupe(ch, "doc_id", 4)
    val ex = intercept[IllegalArgumentException] {
      MergeInto.run(t, ch, "e1", preDeduped = Some(pre))
    }
    assert(ex.getMessage.contains("patch"))
  }
}
