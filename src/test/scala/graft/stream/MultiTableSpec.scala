package graft.stream

import graft.SparkTestBase
import graft.table.IceLite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Routed multi-table ingest: per-topic slices land in per-topic tables
  * with convergent exactly-once across partial-epoch crashes. */
class MultiTableSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val payloadType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("v", LongType)))

  private def changes(n: Int): DataFrame =
    spark.range(0, n).select(
      when(col("id") % 2 === 0, "t0").otherwise("t1").as("topic"),
      concat(lit("doc"), col("id")).as("doc_id"),
      lit("u").as("op"),
      col("id").as("lsn"),
      struct(concat(lit("doc"), col("id")).as("doc_id"), (col("id") * 7).as("v")).as("after"))

  private def mk() = IceLite.create(spark, SparkTestBase.tempDir("mt"), payloadType,
    "doc_id", numBuckets = 4)

  private def rows(t: graft.table.IceLiteTable): Set[(String, Long)] =
    t.read().select("doc_id", "v").as[(String, Long)].collect().toSet

  test("routes each topic's slice to its table") {
    val (t0, t1) = (mk(), mk())
    val stats = MultiTable.mergeRouted(changes(100), "topic",
      Map("t0" -> t0, "t1" -> t1), "e1")
    assert(stats("t0").inserted == 50 && stats("t1").inserted == 50)
    assert(rows(t0).forall { case (d, _) => d.stripPrefix("doc").toInt % 2 == 0 })
    assert(rows(t0).size == 50 && rows(t1).size == 50)
  }

  test("partial-epoch crash converges on retry (per-table ledgers)") {
    val (t0, t1) = (mk(), mk())
    val ch = changes(100)
    // crash-shaped: only t0's slice committed before the failure
    t0.merge(ch.filter(col("topic") === "t0").drop("topic"), "e1")
    val v0 = t0.snapshot.version
    // full retry of the epoch: t0 no-ops, t1 applies
    val stats = MultiTable.mergeRouted(ch, "topic", Map("t0" -> t0, "t1" -> t1), "e1")
    assert(stats("t0").inserted == 0 && t0.snapshot.version == v0)
    assert(stats("t1").inserted == 50)
    // end state equals a clean run
    val (c0, c1) = (mk(), mk())
    MultiTable.mergeRouted(ch, "topic", Map("t0" -> c0, "t1" -> c1), "e1")
    assert(rows(t0) == rows(c0) && rows(t1) == rows(c1))
  }

  test("a table with no rows this epoch still advances its ledger") {
    val (t0, t1) = (mk(), mk())
    val onlyT0 = changes(100).filter(col("topic") === "t0")
    MultiTable.mergeRouted(onlyT0, "topic", Map("t0" -> t0, "t1" -> t1), "e1")
    assert(t1.isEpochCommitted("e1"))
    // redelivery after the empty-slice epoch no-ops both
    val stats = MultiTable.mergeRouted(onlyT0, "topic", Map("t0" -> t0, "t1" -> t1), "e1")
    assert(stats.values.forall(s => s.inserted + s.updated + s.deleted == 0))
  }
}
