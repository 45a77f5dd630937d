package graft.merge

import graft.SparkTestBase
import graft.table.IceLite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class HotKeysSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val payloadType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("v", LongType)))

  /** 2000 events: half on one hot key, the rest spread over 100 cold keys. */
  private def skewed: DataFrame =
    spark.range(0, 2000).select(
      when(col("id") % 2 === 0, lit("hot")).otherwise(concat(lit("k"), col("id") % 100))
        .as("doc_id"),
      lit("u").as("op"),
      col("id").as("lsn"),
      struct(
        when(col("id") % 2 === 0, lit("hot")).otherwise(concat(lit("k"), col("id") % 100))
          .as("doc_id"),
        col("id").as("v")).as("after"))

  test("detect flags the planted hot key and only it") {
    val hot = HotKeys.detect(skewed, "doc_id", col("lsn"), minShare = 0.1,
      sampleFraction = 0.25)
      .as[(String, Long, Double)].collect()
    assert(hot.map(_._1).toSeq == Seq("hot"))
    assert(hot.head._3 > 0.4 && hot.head._3 < 0.6) // ~50% share in the sample
  }

  test("detect is deterministic across re-evaluation") {
    val a = HotKeys.detect(skewed, "doc_id", col("lsn"), 0.02, 0.25).collect().toSeq
    val b = HotKeys.detect(skewed, "doc_id", col("lsn"), 0.02, 0.25).collect().toSeq
    assert(a == b)
  }

  test("recommendSalt: 0 on a uniform stream, >=2 on the skewed one") {
    val uniform = spark.range(0, 2000).select(
      concat(lit("k"), col("id") % 100).as("doc_id"), lit("u").as("op"),
      col("id").as("lsn"),
      struct(concat(lit("k"), col("id") % 100).as("doc_id"), col("id").as("v")).as("after"))
    assert(HotKeys.recommendSalt(uniform, "doc_id", col("lsn"), 0.1, 32, 0.25) == 0)
    val s = HotKeys.recommendSalt(skewed, "doc_id", col("lsn"), 0.1, 32, 0.25)
    assert(s >= 2 && s <= 64)
  }

  test("auto-salted merge equals the unsalted merge exactly") {
    def replay(autoSalt: Boolean): Seq[(String, Long)] = {
      val t = IceLite.create(spark, SparkTestBase.tempDir("hotkeys"), payloadType,
        "doc_id", numBuckets = 4)
      if (autoSalt) spark.conf.set("graft.merge.autoSaltShare", "0.05")
      try {
        t.merge(skewed.filter(col("lsn") < 1000), "e1")
        t.merge(skewed.filter(col("lsn") >= 1000), "e2")
      } finally if (autoSalt) spark.conf.unset("graft.merge.autoSaltShare")
      t.read().select("doc_id", "v").as[(String, Long)].collect().sortBy(_._1).toSeq
    }
    assert(replay(autoSalt = true) == replay(autoSalt = false))
  }
}
