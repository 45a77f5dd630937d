package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Named snapshot tags ([[IceLiteTable.tagSnapshot]]): a tagged version is
  * pinned against snapshot expiry and file vacuum — the "corpus revision
  * this model trained on" stays readable forever — until the tag drops. */
class TagSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val payload = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("v", IntegerType)))

  private def ch(rows: Seq[(String, Long, Int)]): DataFrame =
    rows.toDF("doc_id", "lsn", "n").select(
      col("doc_id"), lit("u").as("op"), col("lsn"),
      struct(col("doc_id"), col("n").as("v")).as("after"))

  test("tagged snapshot survives expiry and vacuum; dropTag releases it") {
    val root = SparkTestBase.tempDir("tag-pin")
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 2)
    t.merge(ch(Seq(("a", 1L, 10))), "e/0") // v1
    t.tagSnapshot("train-v1")              // pins v1 (current), commits v2
    assert(t.tags == Map("train-v1" -> 1L))
    // COW churn: every merge rewrites a's bucket -> v1's file goes stale
    t.merge(ch(Seq(("a", 2L, 20))), "e/1")
    t.merge(ch(Seq(("a", 3L, 30))), "e/2")
    t.expireSnapshots(keepSnapshots = 1)
    t.vacuum(keepSnapshots = 1)
    // untagged old versions are gone, the tagged one is intact AND readable
    assert(t.readTag("train-v1").collect().map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("a", 10)))
    assert(intercept[Exception](t.readVersion(2L)).getMessage != null) // v2 expired
    assert(t.read().head().getInt(1) == 30) // current unaffected
    // drop the tag: the pinned version becomes reclaimable
    t.dropTag("train-v1")
    t.expireSnapshots(keepSnapshots = 1)
    t.vacuum(keepSnapshots = 1)
    assert(intercept[Exception](t.readTag("train-v1")).getMessage.contains("no tag"))
    assert(intercept[Exception](t.readVersion(1L)).getMessage != null)
  }

  test("tag validation; explicit version; SQL TVF resolves tags by name") {
    val root = SparkTestBase.tempDir("tag-sql")
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 2)
    t.merge(ch(Seq(("a", 1L, 1))), "e/0")  // v1
    t.merge(ch(Seq(("a", 2L, 2))), "e/1")  // v2
    t.tagSnapshot("old", version = 1L)
    assert(intercept[IllegalArgumentException](t.tagSnapshot("bad name"))
      .getMessage.contains("invalid tag name"))
    assert(intercept[IllegalArgumentException](t.tagSnapshot("x", version = 99L))
      .getMessage.contains("does not exist"))
    graft.GraftExtensions.register(spark)
    val viaTag = spark.sql(s"SELECT v FROM icelite_at('$root', 'old')").head().getInt(0)
    val viaVer = spark.sql(s"SELECT v FROM icelite_at('$root', 1)").head().getInt(0)
    assert(viaTag == 1 && viaVer == 1)
  }
}
