package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only column RENAME evolution (`IceLiteTable.renameColumn`):
  * data files untouched, pre- and post-rename files interoperate through the
  * logical->physical column mapping, retired physical names never leak into
  * re-added columns, and every downstream path (merge, lookup, CDC-out,
  * compaction, time travel, rebucket) speaks the current logical schema. */
class RenameSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val payload = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("tokens", ArrayType(IntegerType, containsNull = false)),
    StructField("n_tok", IntegerType),
    StructField("source", StringType)))

  /** (doc_id, op, lsn) -> change frame; `srcField` names the payload field
    * that carries the source string (post-rename batches use the new name). */
  private def changes(rows: Seq[(String, String, Long)], srcField: String = "source"): DataFrame =
    rows.toDF("doc_id", "op", "lsn").select(
      col("doc_id"), col("op"), col("lsn"),
      when(col("op") =!= "d", struct(
        col("doc_id"),
        array(lit(7), col("lsn").cast(IntegerType)).as("tokens"),
        lit(2).as("n_tok"),
        concat(lit("s"), col("lsn")).as(srcField)))
        .as("after"))

  private def state(df: DataFrame, srcField: String): Set[(String, Int, String)] =
    df.select(col("doc_id"), col("n_tok"), col(srcField)).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet

  private def mkTable(mode: String): (IceLiteTable, String) = {
    val root = SparkTestBase.tempDir(s"ren-$mode")
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 4,
      properties = Map("write.mode" -> mode))
    (t, root)
  }

  for (mode <- Seq("cow", "mor")) {
    test(s"[$mode] rename is metadata-only and both file vintages read under the new name") {
      val (t, _) = mkTable(mode)
      t.merge(changes(Seq(("k1", "c", 1), ("k2", "c", 2))), "e0")
      val filesBefore = t.snapshot.files.map(_.path).toSet
      val vBefore = t.snapshot.version

      t.renameColumn("source", "origin")
      assert(t.snapshot.files.map(_.path).toSet == filesBefore, "rename rewrote data files")
      assert(t.snapshot.schema.fieldNames.toSeq == Seq("doc_id", "tokens", "n_tok", "origin"))
      assert(t.snapshot.columnMapping == Map("origin" -> "source"))

      // post-rename batches speak the NEW name; pre-rename files still read
      t.merge(changes(Seq(("k2", "u", 10), ("k3", "c", 11)), srcField = "origin"), "e1")
      assert(state(t.read(), "origin") ==
        Set(("k1", 2, "s1"), ("k2", 2, "s10"), ("k3", 2, "s11")))

      // time travel: the pre-rename snapshot still shows the old name
      assert(t.readVersion(vBefore).columns.contains("source"))
      assert(state(t.readVersion(vBefore), "source") == Set(("k1", 2, "s1"), ("k2", 2, "s2")))
    }
  }

  test("re-adding a retired name is a NEW column; old data never leaks into it") {
    val (t, _) = mkTable("cow")
    t.merge(changes(Seq(("k1", "c", 1))), "e0")
    t.renameColumn("source", "origin")
    // batch adds a column named "source" (the retired physical name)
    val withNew = changes(Seq(("k2", "c", 10)), srcField = "origin")
      .withColumn("after", when(col("op") =!= "d",
        col("after").withField("source", lit("fresh"))))
    t.merge(withNew, "e1")
    val snap = t.snapshot
    assert(snap.schema.fieldNames.contains("source") && snap.schema.fieldNames.contains("origin"))
    // the new "source" stores under a minted physical name, not the retired one
    assert(snap.physicalName("source") != "source")
    val rows = t.read().select("doc_id", "origin", "source").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2)))).toSet
    // k1 predates the new column -> null (NOT the old physical "source" bytes)
    assert(rows == Set(("k1", "s1", None), ("k2", "s10", Some("fresh"))))
  }

  test("renaming the KEY column: merges, lookups and manifest pruning keep working") {
    val (t, root) = mkTable("cow")
    t.merge(changes(Seq(("k1", "c", 1), ("k2", "c", 2), ("k3", "c", 3))), "e0")
    t.renameColumn("doc_id", "document_id")
    assert(t.snapshot.keyColumn == "document_id")
    val post = changes(Seq(("k2", "u", 10), ("k9", "c", 11)))
      .withColumnRenamed("doc_id", "document_id")
      .withColumn("after", when(col("op") =!= "d",
        struct(col("document_id"), col("after.tokens").as("tokens"),
          col("after.n_tok").as("n_tok"), col("after.source").as("source"))))
    t.merge(post, "e1")
    assert(state(t.read().withColumnRenamed("document_id", "doc_id"), "source") ==
      Set(("k1", 2, "s1"), ("k2", 2, "s10"), ("k3", 2, "s3"), ("k9", 2, "s11")))
    // point lookup prunes via the manifest and resolves under the new key name
    val lk = t.lookup(Seq("k2")).collect()
    assert(lk.length == 1 && lk.head.getAs[String]("document_id") == "k2")
    // reload from disk: mapping round-trips through the snapshot serde
    val t2 = IceLite.load(spark, root)
    assert(t2.snapshot.columnMapping == Map("document_id" -> "doc_id"))
  }

  test("changesBetween across a rename boundary uses the current names") {
    val (t, _) = mkTable("mor")
    t.merge(changes(Seq(("k1", "c", 1), ("k2", "c", 2))), "e0")
    val v1 = t.snapshot.version
    t.renameColumn("source", "origin")
    t.merge(changes(Seq(("k2", "u", 10), ("k3", "c", 11)), srcField = "origin"), "e1")
    val ch = t.changesBetween(v1, t.snapshot.version)
    assert(ch.columns.contains("origin") && !ch.columns.contains("source"))
    val got = ch.select("doc_id", "change_op", "origin").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("k2", "update", "s10"), ("k3", "insert", "s11")))
  }

  test("compaction and rebucket after a rename preserve data and mapping") {
    val (t, _) = mkTable("mor")
    t.merge(changes(Seq(("k1", "c", 1), ("k2", "c", 2))), "e0")
    t.renameColumn("source", "origin")
    t.merge(changes(Seq(("k1", "u", 10), ("k3", "c", 11)), srcField = "origin"), "e1")
    t.compactBuckets((0 until 4).toSet)
    assert(state(t.read(), "origin") ==
      Set(("k1", 2, "s10"), ("k2", 2, "s2"), ("k3", 2, "s11")))
    t.rebucket(8)
    assert(t.snapshot.numBuckets == 8)
    assert(t.snapshot.columnMapping == Map("origin" -> "source"))
    assert(state(t.read(), "origin") ==
      Set(("k1", 2, "s10"), ("k2", 2, "s2"), ("k3", 2, "s11")))
  }

  test("rename validates: missing source column, existing destination") {
    val (t, _) = mkTable("cow")
    t.merge(changes(Seq(("k1", "c", 1))), "e0")
    intercept[IllegalArgumentException] { t.renameColumn("nope", "x") }
    intercept[IllegalArgumentException] { t.renameColumn("source", "n_tok") }
  }

  test("a concurrent data-only merge rebases under a rename (no recompute lost)") {
    val (t, _) = mkTable("cow")
    t.merge(changes(Seq(("k1", "c", 1), ("k2", "c", 2))), "e0")
    // rename commits between the merge's snapshot read and its commit:
    // simulate by committing the rename from a second handle mid-flight is
    // racy to stage deterministically, so assert the rebase algebra instead:
    // a rename candidate built on v1 commits cleanly on top of a data commit.
    val snap = t.snapshot
    t.merge(changes(Seq(("k3", "c", 3))), "e1") // intervening data-only commit
    val cand = snap.copy(
      version = snap.version + 1,
      schemaJson = StructType(snap.schema.fields.map(f =>
        if (f.name == "source") f.copy(name = "origin") else f)).json,
      columnMapping = Map("origin" -> "source"),
      parentVersion = snap.version,
      stats = None)
    assert(t.commitRebasing(snap, cand) == CommitOutcome.Committed)
    // the rebased rename kept the intervening commit's file and the rename
    assert(state(t.read(), "origin") ==
      Set(("k1", 2, "s1"), ("k2", 2, "s2"), ("k3", 2, "s3")))
  }
}
