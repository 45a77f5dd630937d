package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only column DROP evolution ([[IceLiteTable.dropColumn]]): zero
  * files rewritten, the column vanishes from reads (bytes shed on the next
  * compaction), its physical name is RETIRED so a re-added column of the
  * same name can never read the old data, and time travel still shows it. */
class DropColumnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val payload = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("n_tok", IntegerType),
    StructField("source", StringType)))

  private def changes(rows: Seq[(String, Long, Int, String)],
                      withSource: Boolean = true): DataFrame =
    rows.toDF("doc_id", "lsn", "v", "src").select(
      col("doc_id"), lit("u").as("op"), col("lsn"),
      (if (withSource)
        struct(col("doc_id"), col("v").as("n_tok"), col("src").as("source"))
      else struct(col("doc_id"), col("v").as("n_tok"))).as("after"))

  test("drop is metadata-only; reads lose the column; time travel keeps it") {
    val root = SparkTestBase.tempDir("drop-basic")
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 2)
    t.merge(changes(Seq(("a", 1L, 5, "x"), ("b", 2L, 6, "y"))), "e/0")
    val vPre = t.snapshot.version
    val filesBefore = t.snapshot.files.map(_.path).toSet
    t.dropColumn("source")
    assert(t.snapshot.files.map(_.path).toSet == filesBefore)
    assert(t.read().columns.toSeq == Seq("doc_id", "n_tok"))
    // time travel to the pre-drop version still shows the column
    val old = t.readVersion(vPre)
    assert(old.columns.contains("source"))
    assert(old.filter(col("doc_id") === "a").select("source").head().getString(0) == "x")
    // post-drop merges (without the column) work; state correct
    t.merge(changes(Seq(("a", 3L, 7, "")), withSource = false), "e/1")
    assert(t.read().collect().map(r => r.getString(0) -> r.getInt(1)).toMap ==
      Map("a" -> 7, "b" -> 6))
    // guards
    assert(intercept[IllegalArgumentException](t.dropColumn("doc_id"))
      .getMessage.contains("key column"))
    assert(intercept[IllegalArgumentException](t.dropColumn("nope"))
      .getMessage.contains("no column"))
  }

  test("re-added column after drop mints a fresh physical name: old bytes never leak") {
    val root = SparkTestBase.tempDir("drop-readd")
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 2)
    t.merge(changes(Seq(("a", 1L, 5, "OLD_A"), ("b", 2L, 6, "OLD_B"))), "e/0")
    t.dropColumn("source")
    assert(t.snapshot.retiredPhysical == List("source"))
    // a batch RE-ADDS `source` with a new value for `a` only
    t.merge(changes(Seq(("a", 3L, 7, "NEW_A"))), "e/1")
    val t2 = IceLite.load(spark, root) // fresh load: retiredPhysical round-trips serde
    assert(t2.snapshot.schema.fieldNames.contains("source"))
    assert(t2.snapshot.columnMapping("source").startsWith("source__p")) // fresh storage name
    val got = t2.read().select("doc_id", "source").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    // b's row predates the re-add: its OLD_B bytes (retired physical name)
    // must NOT surface — the re-added column is null for it
    assert(got == Map("a" -> Some("NEW_A"), "b" -> None))
  }

  test("compaction after drop physically sheds the retired bytes") {
    val root = SparkTestBase.tempDir("drop-compact")
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 1,
      properties = Map("write.mode" -> "mor")) // deltas stack -> compactable
    t.merge(changes(Seq(("a", 1L, 5, "x"))), "e/0")
    t.merge(changes(Seq(("b", 2L, 6, "y"))), "e/1")
    t.dropColumn("source")
    val picked = t.compactSmallFiles(targetRowsPerFile = 1000000L)
    assert(picked.nonEmpty, "compaction must pick the stacked bucket")
    val files = t.snapshot.files.map(f => s"$root/${f.path}")
    val physical = spark.read.parquet(files: _*).schema.fieldNames.toSet
    assert(!physical.exists(_.startsWith("source")), s"retired bytes survive: $physical")
    assert(t.read().collect().map(r => r.getString(0) -> r.getInt(1)).toMap ==
      Map("a" -> 5, "b" -> 6))
  }

  test("changesBetween crosses the drop boundary; SQL DROP COLUMN works") {
    val root = SparkTestBase.tempDir("drop-changes")
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 2)
    t.merge(changes(Seq(("a", 1L, 5, "x"))), "e/0")
    val v1 = t.snapshot.version
    // drop via SQL
    val parser = new graft.sql.GraftSqlParser(spark.sessionState.sqlParser)
    val v = org.apache.spark.sql.graftbridge.Exprs.ofRows(spark, parser.parsePlan(
      s"ALTER TABLE icelite.`$root` DROP COLUMN source")).head().getLong(0)
    assert(v == t.snapshot.version && !t.snapshot.schema.fieldNames.contains("source"))
    t.merge(changes(Seq(("b", 2L, 8, "")), withSource = false), "e/1")
    val ch = t.changesBetween(v1, t.snapshot.version)
    assert(!ch.columns.contains("source"))
    assert(ch.filter(col("doc_id") === "b").count() == 1)
  }
}
