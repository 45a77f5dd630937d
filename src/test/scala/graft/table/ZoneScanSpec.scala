package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Zone-map range scans (`write.stats.columns` + [[IceLiteTable.scanRange]]):
  * per-file secondary-column min/max in the manifest, file skipping that is
  * exact under COW, candidate-nomination under MOR (sound even with STALE
  * delta rows), full-read fallback for patch folds, and the
  * `write.sort.columns` clustering that makes the ranges tight. */
class ZoneScanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val payloadType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("v", LongType),
    StructField("tag", StringType)))

  /** n rows doc{base}..doc{base+n-1}, v = vBase + i, lsn = lsnBase + i. */
  private def changes(n: Int, keyBase: Int, vBase: Long, lsnBase: Long): DataFrame =
    spark.range(0, n).select(
      concat(lit("doc"), col("id") + keyBase).as("doc_id"),
      lit("u").as("op"),
      (col("id") + lsnBase).as("lsn"),
      struct(concat(lit("doc"), col("id") + keyBase).as("doc_id"),
        (col("id") + vBase).as("v"),
        concat(lit("t"), (col("id") % 5)).as("tag")).as("after"))

  private def mkTable(mode: String, props: Map[String, String] = Map.empty) =
    IceLite.create(spark, SparkTestBase.tempDir("zone"), payloadType, "doc_id",
      numBuckets = 8, properties =
        props + ("write.mode" -> mode) + ("write.stats.columns" -> "v,tag"))

  private def rows(df: DataFrame): Seq[(String, Long, String)] =
    df.select("doc_id", "v", "tag").as[(String, Long, String)].collect().sortBy(_._1).toSeq

  test("manifest carries per-file zone maps for the stats columns") {
    val t = mkTable("cow")
    t.merge(changes(200, 0, 1000, 0), "e1")
    val s = t.snapshot // re-read from disk: exercises the JSON round-trip
    assert(s.files.nonEmpty)
    s.files.foreach { f =>
      val v = f.colStats("v")
      assert(v.numeric && BigDecimal(v.min) >= 1000 && BigDecimal(v.max) <= 1199, s"$v")
      val tag = f.colStats("tag")
      assert(!tag.numeric && tag.min >= "t0" && tag.max <= "t4", s"$tag")
    }
  }

  test("COW scanRange equals full-scan filter and skips files under value clustering") {
    // sort by v within the bucket + small files => tight disjoint per-file
    // v ranges, so a narrow range prunes most files of each bucket
    val t = mkTable("cow", Map("write.sort.columns" -> "v"))
    val prev = spark.conf.getOption("graft.merge.maxRecordsPerFile")
    spark.conf.set("graft.merge.maxRecordsPerFile", "10")
    try t.merge(changes(400, 0, 0, 0), "e1")
    finally prev match {
      case Some(p) => spark.conf.set("graft.merge.maxRecordsPerFile", p)
      case None => spark.conf.unset("graft.merge.maxRecordsPerFile")
    }
    val got = rows(t.scanRange("v", 100L, 119L))
    val want = rows(t.read().filter(col("v") >= 100 && col("v") <= 119))
    assert(got == want && got.size == 20)
    val s = t.snapshot
    // ~5 value-sorted files per bucket; a 5%-of-range scan touches 1-2 of them
    val kept = t.scanRangeFiles(s, "v", 100L, 119L)
    assert(kept.size < s.files.size / 2,
      s"zone maps must skip files: kept ${kept.size} of ${s.files.size}")
  }

  test("MOR scanRange skips whole epochs for time-correlated values") {
    val t = mkTable("mor")
    t.merge(changes(100, 0, 0, 0), "e1")       // v in [0, 100)
    t.merge(changes(100, 100, 1000, 200), "e2") // v in [1000, 1100)
    t.merge(changes(100, 200, 2000, 400), "e3") // v in [2000, 2100)
    val got = rows(t.scanRange("v", 1000L, 1099L))
    val want = rows(t.read().filter(col("v") >= 1000 && col("v") <= 1099))
    assert(got == want && got.size == 100)
    val s = t.snapshot
    val kept = t.scanRangeFiles(s, "v", 1000L, 1099L)
    assert(kept.nonEmpty && kept.size <= s.files.size / 2,
      s"epoch files outside the range must be skipped: kept ${kept.size} of ${s.files.size}")
  }

  test("MOR scanRange is sound under stale deltas (skipped winner, in-range stale row)") {
    val t = mkTable("mor")
    // e1: doc5 v=25 (in range) at lsn 100
    val e1 = Seq(("doc5", "u", 100L, 25L)).toDF("doc_id", "op", "lsn", "v0")
      .select(col("doc_id"), col("op"), col("lsn"),
        struct(col("doc_id"), col("v0").as("v"), lit("tx").as("tag")).as("after"))
    t.merge(e1, "e1")
    // e2: the WINNER doc5 v=500 (out of range) at lsn 200 — its file will not
    // nominate, but it must still out-rank
    val e2 = Seq(("doc5", "u", 200L, 500L)).toDF("doc_id", "op", "lsn", "v0")
      .select(col("doc_id"), col("op"), col("lsn"),
        struct(col("doc_id"), col("v0").as("v"), lit("tx").as("tag")).as("after"))
    t.merge(e2, "e2")
    // e3: a STALE redelivery doc5 v=22 (in range) at lsn 50 — must lose
    val e3 = Seq(("doc5", "u", 50L, 22L)).toDF("doc_id", "op", "lsn", "v0")
      .select(col("doc_id"), col("op"), col("lsn"),
        struct(col("doc_id"), col("v0").as("v"), lit("tx").as("tag")).as("after"))
    t.merge(e3, "e3")
    // winner v=500 is outside [20,30]: doc5 must NOT surface via the stale row
    assert(t.scanRange("v", 20L, 30L).count() == 0)
    // and the winner itself is reachable
    assert(rows(t.scanRange("v", 400L, 600L)) == Seq(("doc5", 500L, "tx")))
  }

  test("MOR scanRange equals full-scan filter across epochs, updates and deletes") {
    val t = mkTable("mor")
    t.merge(changes(300, 0, 0, 0), "e1")
    t.merge(changes(150, 0, 5000, 1000), "e2") // updates half the keys out of range
    val del = Seq(("doc7", "d", 9000L), ("doc201", "d", 9001L))
      .toDF("doc_id", "op", "lsn")
      .select(col("doc_id"), col("op"), col("lsn"), lit(null).cast(payloadType).as("after"))
    t.merge(del, "e3")
    for ((lo, hi) <- Seq((0L, 80L), (100L, 299L), (5000L, 5149L), (400L, 450L)))
      assert(rows(t.scanRange("v", lo, hi)) ==
        rows(t.read().filter(col("v") >= lo && col("v") <= hi)), s"range [$lo,$hi]")
  }

  test("string-column zone maps prune and compare by unsigned UTF-8 order") {
    val t = mkTable("cow", Map("write.sort.columns" -> "tag"))
    t.merge(changes(200, 0, 0, 0), "e1")
    val got = rows(t.scanRange("tag", "t1", "t2"))
    val want = rows(t.read().filter(col("tag") >= "t1" && col("tag") <= "t2"))
    assert(got == want && got.nonEmpty)
  }

  test("patch tables fall back to the full resolved read") {
    val t = IceLite.create(spark, SparkTestBase.tempDir("zonep"), payloadType, "doc_id",
      numBuckets = 8, properties = Map("write.mode" -> "mor",
        "write.merge.fold" -> "patch", "write.stats.columns" -> "v"))
    t.merge(changes(50, 0, 0, 0), "e1")
    // partial update: v only (tag unchanged => null in patch semantics)
    val partial = spark.range(10, 20).select(
      concat(lit("doc"), col("id")).as("doc_id"), lit("u").as("op"),
      (col("id") + 100).as("lsn"),
      struct(concat(lit("doc"), col("id")).as("doc_id"),
        (col("id") + 7000).as("v"), lit(null).cast(StringType).as("tag")).as("after"))
    t.merge(partial, "e2")
    assert(rows(t.scanRange("v", 7000L, 7019L)) ==
      rows(t.read().filter(col("v") >= 7000 && col("v") <= 7019)))
  }

  test("scanRange follows rename evolution to the physical stats") {
    val t = mkTable("cow")
    t.merge(changes(100, 0, 0, 0), "e1")
    t.renameColumn("v", "score")
    val got = t.scanRange("score", 40L, 50L).select("doc_id", "score")
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(got == (40 to 50).map(i => (s"doc$i", i.toLong)).sortBy(_._1))
    val s = t.snapshot
    assert(t.scanRangeFiles(s, "score", 40L, 50L).forall(_.colStats.contains("v")))
  }

  test("files without usable stats match every range (never wrongly pruned)") {
    val t = IceLite.create(spark, SparkTestBase.tempDir("zonen"), payloadType, "doc_id",
      numBuckets = 4) // NO stats columns configured
    t.merge(changes(100, 0, 0, 0), "e1")
    val s = t.snapshot
    assert(s.files.forall(_.colStats.isEmpty))
    assert(t.scanRangeFiles(s, "v", 10L, 20L).size == s.files.size)
    assert(rows(t.scanRange("v", 10L, 20L)) ==
      rows(t.read().filter(col("v") >= 10 && col("v") <= 20)))
  }
}
