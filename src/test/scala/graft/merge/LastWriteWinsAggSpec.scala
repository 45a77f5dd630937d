package graft.merge

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The merge engine's intra-batch dedup kernel: last_write_wins(struct(lsn,
  * op, after)) must pick the max-lsn event per group, collapse duplicate
  * (key, lsn) redeliveries, survive partial/final serialization across a
  * shuffle, and plan as ObjectHashAggregate (hash, not sort). */
class LastWriteWinsAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def lwwOf(rows: Seq[(String, Long, String)]) =
    rows.toDF("k", "lsn", "v")
      .repartition(4) // force buffers through partial/final serde
      .groupBy("k")
      .agg(LastWriteWinsAgg.lww(struct(col("lsn"), col("v"))).as("w"))
      .select(col("k"), col("w.lsn").as("lsn"), col("w.v").as("v"))

  test("picks the max-lsn row per key and collapses duplicate (key, lsn)") {
    val rows = Seq(
      ("a", 1L, "a1"), ("a", 5L, "a5"), ("a", 3L, "a3"),
      ("b", 2L, "b2"), ("b", 2L, "b2"), // in-batch redelivery
      ("c", 7L, "c7"))
    val out = lwwOf(rows).collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(out === Array(("a", 5L, "a5"), ("b", 2L, "b2"), ("c", 7L, "c7")))
  }

  test("handles null payload fields (delete tombstones) inside the struct") {
    val rows = Seq(("a", 1L, "a1"), ("a", 9L, null), ("b", 4L, "b4"))
    val out = lwwOf(rows).collect().map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)))).sortBy(_._1)
    assert(out === Array(("a", 9L, None), ("b", 4L, Some("b4"))))
  }

  test("plans as ObjectHashAggregate, not SortAggregate") {
    val plan = lwwOf(Seq(("a", 1L, "x"))).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }

  test("many groups across many partitions stay exact") {
    val n = 50000
    val df = spark.range(n * 4).select(
      concat(lit("k"), (col("id") % n).cast("string")).as("k"),
      col("id").as("lsn"),
      concat(lit("v"), col("id").cast("string")).as("v"))
    val out = df.repartition(8)
      .groupBy("k")
      .agg(LastWriteWinsAgg.lww(struct(col("lsn"), col("v"))).as("w"))
      .select(col("w.lsn").as("lsn"))
      .agg(sum("lsn")).head().getLong(0)
    // winner for key i is lsn 3n + i; sum = 3n*n + n(n-1)/2
    assert(out === 3L * n * n + n.toLong * (n - 1) / 2)
  }
}
