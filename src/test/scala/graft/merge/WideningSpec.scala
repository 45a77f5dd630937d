package graft.merge

import graft.SparkTestBase
import graft.table.IceLite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg-style TYPE-WIDENING schema evolution ([[MergeInto.widenType]] /
  * `evolveSchema`): common columns may widen along the safe-promotion
  * lattice (byte->short->int->long, float->double) with ZERO data files
  * rewritten — narrow-vintage parquet promotes at scan time under the
  * widened snapshot schema — and batches NARROWER than the table coerce up
  * with no schema change at all. */
class WideningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def payload(nTok: DataType) = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("n_tok", nTok),
    StructField("source", StringType)))

  /** (doc_id, op, lsn, n_tok) with the given n_tok payload type. */
  private def changes(rows: Seq[(String, String, Long, Long)], nTok: DataType): DataFrame =
    rows.toDF("doc_id", "op", "lsn", "v").select(
      col("doc_id"), col("op"), col("lsn"),
      when(col("op") =!= "d", struct(
        col("doc_id"),
        col("v").cast(nTok).as("n_tok"),
        concat(lit("s"), col("lsn")).as("source"))).as("after"))

  test("widenType: promotion lattice, recursion, and rejections") {
    import MergeInto.widenType
    assert(widenType(IntegerType, LongType).contains(LongType))
    assert(widenType(LongType, IntegerType).contains(LongType)) // narrower batch: keep wide
    assert(widenType(ByteType, ShortType).contains(ShortType))
    assert(widenType(ShortType, LongType).contains(LongType))
    assert(widenType(FloatType, DoubleType).contains(DoubleType))
    assert(widenType(IntegerType, IntegerType).contains(IntegerType))
    // lossy or shape-changing promotions are rejected
    assert(widenType(IntegerType, DoubleType).isEmpty) // int->double lossy above 2^53? (Iceberg: disallowed)
    assert(widenType(IntegerType, FloatType).isEmpty)
    assert(widenType(IntegerType, StringType).isEmpty)
    assert(widenType(LongType, ArrayType(LongType)).isEmpty)
    // recursion: array elements, map values, struct fields (+ nested adds)
    assert(widenType(ArrayType(IntegerType), ArrayType(LongType)).contains(ArrayType(LongType)))
    assert(widenType(MapType(StringType, IntegerType), MapType(StringType, LongType))
      .contains(MapType(StringType, LongType)))
    assert(widenType(MapType(IntegerType, IntegerType), MapType(LongType, IntegerType)).isEmpty) // keys identify
    val narrowStruct = StructType(Seq(StructField("a", IntegerType)))
    val wideStruct = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val merged = widenType(narrowStruct, wideStruct).get.asInstanceOf[StructType]
    assert(merged("a").dataType == LongType && merged("b").dataType == StringType)
    assert(widenType(
      StructType(Seq(StructField("a", StringType))),
      StructType(Seq(StructField("a", LongType)))).isEmpty)
  }

  test("int->long widening on MOR is metadata-only: no pre-widening file rewritten") {
    val root = SparkTestBase.tempDir("widen-mor")
    val t = IceLite.create(spark, root, payload(IntegerType), "doc_id", numBuckets = 4,
      properties = Map("write.mode" -> "mor"))
    t.merge(changes(Seq(("a", "c", 1L, 5L), ("b", "c", 2L, 6L)), IntegerType), "e/0")
    val before = t.snapshot.files.map(_.path).toSet
    // wide batch: b updates beyond int range, c inserts
    t.merge(changes(Seq(("b", "u", 3L, 4000000007L), ("c", "c", 4L, 4000000009L)), LongType), "e/1")
    val s = t.snapshot
    assert(s.schema("n_tok").dataType == LongType)
    assert(before.subsetOf(s.files.map(_.path).toSet)) // old deltas all still live
    val got = t.read().select("doc_id", "n_tok").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 5L, "b" -> 4000000007L, "c" -> 4000000009L))
  }

  test("narrower batch after widening coerces up with no schema change; lookup crosses vintages") {
    val root = SparkTestBase.tempDir("widen-narrow")
    val t = IceLite.create(spark, root, payload(IntegerType), "doc_id", numBuckets = 4)
    t.merge(changes(Seq(("a", "c", 1L, 5L)), IntegerType), "e/0")
    t.merge(changes(Seq(("b", "c", 2L, 4000000007L)), LongType), "e/1")
    val vWide = t.snapshot.version
    // an old producer still speaks INT: no new evolution, values land as long
    t.merge(changes(Seq(("c", "c", 3L, 9L), ("a", "u", 4L, 11L)), IntegerType), "e/2")
    val s = t.snapshot
    assert(s.schema("n_tok").dataType == LongType)
    val got = t.read().select("doc_id", "n_tok").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 11L, "b" -> 4000000007L, "c" -> 9L))
    // point lookup resolves across vintages under the wide schema
    assert(t.lookup(Seq("b")).select("n_tok").head().getLong(0) == 4000000007L)
    // time travel BEFORE the last merge still reads the widened schema of v2
    assert(t.readVersion(vWide).schema("n_tok").dataType == LongType)
  }

  test("float->double and incompatible rejection through the merge path") {
    val root = SparkTestBase.tempDir("widen-float")
    val pf = StructType(Seq(
      StructField("doc_id", StringType, nullable = false),
      StructField("score", FloatType)))
    val t = IceLite.create(spark, root, pf, "doc_id", numBuckets = 2)
    def ch(rows: Seq[(String, Long, Double)], dt: DataType): DataFrame =
      rows.toDF("doc_id", "lsn", "v").select(
        col("doc_id"), lit("u").as("op"), col("lsn"),
        struct(col("doc_id"), col("v").cast(dt).as("score")).as("after"))
    t.merge(ch(Seq(("a", 1L, 1.5)), FloatType), "e/0")
    t.merge(ch(Seq(("b", 2L, 2.25)), DoubleType), "e/1")
    assert(t.snapshot.schema("score").dataType == DoubleType)
    val got = t.read().select("doc_id", "score").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 1.5, "b" -> 2.25))
    // a string batch for a numeric column still throws
    val bad = Seq(("c", 3L)).toDF("doc_id", "lsn").select(
      col("doc_id"), lit("u").as("op"), col("lsn"),
      struct(col("doc_id"), lit("oops").as("score")).as("after"))
    val e = intercept[IllegalArgumentException](t.merge(bad, "e/2"))
    assert(e.getMessage.contains("Incompatible type evolution"))
  }

  test("patch-fold table widens across epochs; read-time column fold spans vintages") {
    val root = SparkTestBase.tempDir("widen-patch")
    val t = IceLite.create(spark, root, payload(IntegerType), "doc_id", numBuckets = 2,
      properties = Map("write.mode" -> "mor", "write.merge.fold" -> "patch"))
    // patch semantics: null column = unchanged
    t.merge(changes(Seq(("a", "c", 1L, 7L)), IntegerType), "e/0")
    val wideNullSource = Seq(("a", 2L, 4000000021L)).toDF("doc_id", "lsn", "v").select(
      col("doc_id"), lit("u").as("op"), col("lsn"),
      struct(col("doc_id"), col("v").cast(LongType).as("n_tok"),
        lit(null).cast(StringType).as("source")).as("after"))
    t.merge(wideNullSource, "e/1")
    val row = t.read().select("doc_id", "n_tok", "source").head()
    assert(row.getString(0) == "a" && row.getLong(1) == 4000000021L && row.getString(2) == "s1")
  }
}
