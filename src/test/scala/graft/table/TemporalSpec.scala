package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TemporalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val payloadType = StructType(Seq(
    StructField("v", StringType),
    StructField("n", IntegerType)))

  /** (key, op, lsn, v, n) -> canonical change frame with a struct payload. */
  private def changes(rows: (String, String, Long, String, Integer)*) =
    rows.toDF("doc_id", "op", "lsn", "v", "n")
      .select(col("doc_id"), col("op"), col("lsn"),
        when(col("op") === "d", lit(null).cast(payloadType))
          .otherwise(struct(col("v"), col("n"))).as("after"))

  test("scd2: versions chain, deletes terminate, last open version is current") {
    val ch = changes(
      ("a", "c", 1L, "a1", 1),
      ("a", "u", 3L, "a2", 2),
      ("a", "d", 7L, null, null),
      ("a", "c", 9L, "a3", 3),
      ("b", "c", 2L, "b1", 10))
    val out = Temporal.scd2(ch, "doc_id", "lsn", "op", "after")
      .select("doc_id", "v", "n", "valid_from", "valid_to", "is_current")
      .as[(String, String, Integer, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._4))
    assert(out.toSeq == Seq(
      ("a", "a1", 1, 1L, Some(3L), false),
      ("a", "a2", 2, 3L, Some(7L), false), // closed BY the delete
      ("a", "a3", 3, 9L, None, true), // re-created after delete
      ("b", "b1", 10, 2L, None, true)))
  }

  test("scd2: key whose last event is a delete has no current version") {
    val ch = changes(
      ("x", "c", 1L, "x1", 1),
      ("x", "d", 2L, null, null))
    val out = Temporal.scd2(ch, "doc_id", "lsn", "op", "after")
    assert(out.count() == 1)
    assert(out.filter(col("is_current")).count() == 0)
  }

  test("asofJoin: inclusive bound, latest-below, miss stays null") {
    val versions = Seq(
      ("a", 10L, "v10"), ("a", 20L, "v20"), ("a", 30L, "v30"),
      ("b", 5L, "w5")).toDF("doc_id", "lsn", "v")
    val probes = Seq(
      (1L, "a", 20L), // exact hit -> inclusive
      (2L, "a", 25L), // between -> v20
      (3L, "a", 9L), // before first -> miss
      (4L, "b", 100L), // far after -> w5
      (5L, "c", 50L)) // unknown key -> miss
      .toDF("probe_id", "doc_id", "as_of")
    val out = Temporal.asofJoin(versions, probes, "doc_id", "lsn", "as_of")
      .select("probe_id", "lsn", "v")
      .as[(Long, Option[Long], Option[String])]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, Some(20L), Some("v20")),
      (2L, Some(20L), Some("v20")),
      (3L, None, None),
      (4L, Some(5L), Some("w5")),
      (5L, None, None)))
  }

  test("asofJoin: equals the naive range-join formulation on a generated stream") {
    val versions = spark.range(0, 400)
      .select((col("id") % 23).cast(StringType).as("doc_id"), col("id").as("lsn"),
        concat(lit("s"), col("id")).as("v"))
    val probes = spark.range(0, 97)
      .select(col("id").as("probe_id"), ((col("id") * 7) % 23).cast(StringType).as("doc_id"),
        (col("id") * 5 - 30).as("as_of"))
    val fast = Temporal.asofJoin(versions, probes, "doc_id", "lsn", "as_of")
      .select("probe_id", "lsn", "v")
    val naive = probes.join(versions, Seq("doc_id"), "left")
      .filter(col("lsn").isNull || col("lsn") <= col("as_of"))
      .groupBy("probe_id")
      .agg(max(struct(col("lsn"), col("v"))).as("m"))
      .select(col("probe_id"), col("m.lsn").as("lsn"), col("m.v").as("v"))
      // the naive left-join keeps a (null lsn) row only for keys with NO
      // version at all; keys where every version is > as_of vanish — re-add
      .unionByName(
        probes.join(versions.groupBy("doc_id").agg(min("lsn").as("minLsn")), Seq("doc_id"), "left")
          .filter(col("minLsn").isNotNull && col("minLsn") > col("as_of"))
          .select(col("probe_id"), lit(null).cast(LongType).as("lsn"),
            lit(null).cast(StringType).as("v")))
      .unionByName(
        probes.join(versions.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
          .select(col("probe_id"), lit(null).cast(LongType).as("lsn"),
            lit(null).cast(StringType).as("v")))
      .dropDuplicates("probe_id")
    val f = fast.as[(Long, Option[Long], Option[String])].collect().sortBy(_._1).toSeq
    val n = naive.as[(Long, Option[Long], Option[String])].collect().sortBy(_._1).toSeq
    assert(f == n)
  }

  test("asofJoin plans a single exchange (no range-join fan-out)") {
    val versions = Seq(("a", 1L, "x")).toDF("doc_id", "lsn", "v")
    val probes = Seq((1L, "a", 2L)).toDF("probe_id", "doc_id", "as_of")
    val plan = Temporal.asofJoin(versions, probes, "doc_id", "lsn", "as_of")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 hash exchange, got $exchanges:\n$plan")
  }
}
