package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering ([[IceLiteTable.clusterZOrder]]): the Morton-curve
  * rewrite that makes zone maps tight on SEVERAL columns at once, where the
  * linear `write.sort.columns` sort only serves its leading column. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- kernel ---------------------------------------------------------

  test("encodings preserve order (longs trivially, doubles and strings by trick)") {
    val ds = Seq(Double.NegativeInfinity, -1e18, -2.5, -0.0, 0.0, 1e-9, 3.14, 1e18, Double.PositiveInfinity)
    val encD = ds.map(ZOrderKernel.encDouble)
    assert(encD == encD.sorted, s"double encoding must be monotone: $encD")
    val ss = Seq("", "a", "ab", "abc", "b", "clickz", "purchase", "signup", "zz", "ÿÿ")
    val encS = ss.map(s => ZOrderKernel.encString(UTF8String.fromString(s)))
    assert(encS == encS.sorted, s"string-prefix encoding must be monotone: $encS")
  }

  test("cell is exact on narrow integer ranges and clamps at the bounds") {
    // 0..99 over 16 bits: every distinct value gets its own cell band
    val cells = (0L to 99L).map(ZOrderKernel.cell(_, 0L, 99L, 16))
    assert(cells.head == 0L && cells.last == (1L << 16) - 1)
    assert(cells == cells.sorted && cells.distinct.size == 100)
    // out-of-bounds clamps
    assert(ZOrderKernel.cell(-5L, 0L, 99L, 16) == 0L)
    assert(ZOrderKernel.cell(1000L, 0L, 99L, 16) == (1L << 16) - 1)
    // degenerate range
    assert(ZOrderKernel.cell(7L, 7L, 7L, 16) == 0L)
    // full-span extremes cannot overflow
    assert(ZOrderKernel.cell(Long.MaxValue, Long.MinValue, Long.MaxValue, 16) == (1L << 16) - 1)
    assert(ZOrderKernel.cell(0L, Long.MinValue, Long.MaxValue, 16) == (1L << 15))
  }

  test("interleave weaves bits MSB-first across columns") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def z(a: Long, b: Long, bits: Int): Long =
      ZOrderKernel.zvalue(new GenericArrayData(Array(a, b)),
        Array(0L, 0L), Array((1L << bits) - 1, (1L << bits) - 1), bits)
    // bounds = full cell range makes cell(v) == v, so z is a pure interleave
    assert(z(0L, 0L, 4) == 0L)
    assert(z(0x8L, 0x0L, 4) == 0x80L) // a's MSB lands above b's MSB
    assert(z(0x0L, 0x8L, 4) == 0x40L)
    assert(z(0xFL, 0xFL, 4) == 0xFFL)
    // locality: adjacent (x, y) cells sit closer on the curve than far ones
    assert(math.abs(z(3, 3, 4) - z(3, 4, 4)) < math.abs(z(3, 3, 4) - z(12, 12, 4)))
  }

  // ---- table rewrite --------------------------------------------------

  private val payloadType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("x", LongType),
    StructField("y", LongType),
    StructField("tag", StringType)))

  /** n rows with INDEPENDENT pseudo-uniform x and y in [0, 100). */
  private def changes(n: Int, lsnBase: Long = 0L, vShift: Long = 0L): DataFrame =
    spark.range(0, n).select(
      concat(lit("doc"), col("id")).as("doc_id"),
      lit("u").as("op"),
      (col("id") + lsnBase).as("lsn"),
      struct(concat(lit("doc"), col("id")).as("doc_id"),
        ((col("id") + vShift) % 100).as("x"),
        ((col("id") * 37 + vShift) % 100).as("y"),
        concat(lit("t"), col("id") % 7).as("tag")).as("after"))

  private def rows(df: DataFrame): Seq[(String, Long, Long)] =
    df.select("doc_id", "x", "y").as[(String, Long, Long)].collect().sortBy(_._1).toSeq

  private def withSmallFiles[T](body: => T): T = {
    val prev = spark.conf.getOption("graft.merge.maxRecordsPerFile")
    spark.conf.set("graft.merge.maxRecordsPerFile", "25")
    try body
    finally prev match {
      case Some(p) => spark.conf.set("graft.merge.maxRecordsPerFile", p)
      case None => spark.conf.unset("graft.merge.maxRecordsPerFile")
    }
  }

  test("COW: clusterZOrder prunes range scans on BOTH curve columns; linear sort cannot") {
    val t = IceLite.create(spark, SparkTestBase.tempDir("zo"), payloadType, "doc_id",
      numBuckets = 2, properties = Map(
        "write.stats.columns" -> "x,y", "write.sort.columns" -> "x"))
    withSmallFiles {
      t.merge(changes(400), "e1")
      val before = t.snapshot
      // linear x-sort: x prunes well, y is shredded across every file
      val keptY0 = t.scanRangeFiles(before, "y", 10L, 29L)
      assert(keptY0.size > before.files.size * 7 / 10,
        s"precondition: y must NOT prune under the x-sort (kept ${keptY0.size}/${before.files.size})")
      val wantX = rows(t.read().filter(col("x").between(10, 29)))
      val wantY = rows(t.read().filter(col("y").between(10, 29)))

      t.clusterZOrder(Seq("x", "y"))
      val after = t.snapshot
      assert(after.files.nonEmpty && after.version == before.version + 1)
      // transparent: same rows out of every scan
      assert(rows(t.scanRange("x", 10L, 29L)) == wantX && wantX.size == 80)
      assert(rows(t.scanRange("y", 10L, 29L)) == wantY && wantY.size == 80)
      assert(rows(t.read()) == rows(t.readVersion(before.version)))
      // and BOTH columns now prune: a 20%-of-domain range keeps well under
      // the shredded layout's near-100%
      val keptX = t.scanRangeFiles(after, "x", 10L, 29L)
      val keptY = t.scanRangeFiles(after, "y", 10L, 29L)
      assert(keptX.size <= after.files.size * 6 / 10,
        s"x must prune after z-order: kept ${keptX.size}/${after.files.size}")
      assert(keptY.size <= after.files.size * 6 / 10,
        s"y must prune after z-order: kept ${keptY.size}/${after.files.size}")
    }
  }

  test("clusterZOrder extends the stats columns and records the curve") {
    val t = IceLite.create(spark, SparkTestBase.tempDir("zo"), payloadType, "doc_id",
      numBuckets = 2) // no stats configured up front
    t.merge(changes(100), "e1")
    t.clusterZOrder(Seq("x", "tag"))
    val s = t.snapshot
    assert(s.statsColumns.toSet == Set("x", "tag"))
    assert(s.properties("table.zorder.columns") == "x,tag")
    // the rewrite itself collected both zone maps (string included)
    assert(s.files.forall(f => f.colStats.contains("x") && f.colStats.contains("tag")))
    assert(rows(t.scanRange("tag", "t2", "t3")) ==
      rows(t.read().filter(col("tag").between("t2", "t3"))))
  }

  test("MOR: clusterZOrder resolves winners, keeps tombstones above the watermark") {
    val t = IceLite.create(spark, SparkTestBase.tempDir("zo"), payloadType, "doc_id",
      numBuckets = 2, properties = Map("write.mode" -> "mor", "write.stats.columns" -> "x,y"))
    t.merge(changes(200), "e1")
    t.merge(changes(100, lsnBase = 1000, vShift = 13), "e2") // updates half
    val del = Seq(("doc7", "d", 9000L), ("doc42", "d", 9001L)).toDF("doc_id", "op", "lsn")
      .select(col("doc_id"), col("op"), col("lsn"), lit(null).cast(payloadType).as("after"))
    t.merge(del, "e3")
    val want = rows(t.read())
    t.clusterZOrder(Seq("x", "y"))
    assert(rows(t.read()) == want)
    // resolved rewrite: one file set, no stale versions left behind
    val raw = t.readInternal()
    assert(raw.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
    // tombstones survived (no watermark passed): deletes cannot resurrect
    assert(t.read().filter(col("doc_id").isin("doc7", "doc42")).count() == 0)
    assert(raw.filter(col("doc_id").isin("doc7", "doc42")).count() == 2)
    // a second pass WITH the watermark physically drops them
    t.clusterZOrder(Seq("x", "y"), lsnWatermark = 10000L)
    assert(t.readInternal().filter(col("doc_id").isin("doc7", "doc42")).count() == 0)
    assert(rows(t.read()) == want)
  }

  test("null curve values cluster first and read back unchanged") {
    val t = IceLite.create(spark, SparkTestBase.tempDir("zo"), payloadType, "doc_id",
      numBuckets = 2, properties = Map("write.stats.columns" -> "x"))
    val ch = spark.range(0, 100).select(
      concat(lit("doc"), col("id")).as("doc_id"), lit("u").as("op"), col("id").as("lsn"),
      struct(concat(lit("doc"), col("id")).as("doc_id"),
        when(col("id") % 10 === 0, lit(null)).otherwise(col("id") % 100).cast(LongType).as("x"),
        (col("id") * 37 % 100).as("y"),
        lit("t").as("tag")).as("after"))
    t.merge(ch, "e1")
    val want = t.read().select("doc_id", "x").as[(String, Option[Long])].collect().sortBy(_._1).toSeq
    t.clusterZOrder(Seq("x", "y"))
    val got = t.read().select("doc_id", "x").as[(String, Option[Long])].collect().sortBy(_._1).toSeq
    assert(got == want && got.count(_._2.isEmpty) == 10)
  }
}
