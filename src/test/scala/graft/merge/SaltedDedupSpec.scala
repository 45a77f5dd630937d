package graft.merge

import graft.SparkTestBase
import graft.stream.ChangeGen
import graft.table.IceLite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Hot-key salting for the LWW dedup (`graft.merge.dedupSalt`): the two-level
 * (bucket, key, salt) -> (bucket, key) fold must be EXACTLY equivalent to the
 * single-pass dedup — last-write-wins is associative and commutative — even
 * when one key carries half the stream (the case salting exists for).
 */
class SaltedDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def skewedEvents(n: Long) = {
    // key "hot" receives every even lsn (50% of the stream); odd lsns spread
    // over 200 cold keys. op: every 37th hot event is a delete, later upserts
    // resurrect — exercises tombstone + stale interplay through the fold.
    import org.apache.spark.sql.types._
    val payload = ChangeGen.payloadSchema
    spark.range(n).select(
      when(col("id") % 2 === 0, lit("hot"))
        .otherwise(concat(lit("k"), (col("id") % 200).cast(StringType))).as("doc_id"),
      when(col("id") % 37 === 0, "d").otherwise("u").as("op"),
      col("id").as("lsn"),
      when(col("id") % 37 === 0, lit(null).cast(payload)).otherwise(struct(
        when(col("id") % 2 === 0, lit("hot"))
          .otherwise(concat(lit("k"), (col("id") % 200).cast(StringType))).as("doc_id"),
        array((col("id") % 97).cast(IntegerType)).as("tokens"),
        lit(1).as("n_tok"),
        lit("s").as("source"))).as("after"))
  }

  test("salted two-level dedup produces the identical table state") {
    val events = skewedEvents(20000)
    def replay(salt: Int): Map[String, String] = {
      spark.conf.set("graft.merge.dedupSalt", salt.toString)
      try {
        val root = SparkTestBase.tempDir(s"icelite-salt-$salt")
        val t = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
        t.merge(events, "e0")
        t.read().collect().map(r => r.getString(0) -> r.toString).toMap
      } finally spark.conf.unset("graft.merge.dedupSalt")
    }
    val unsalted = replay(0)
    val salted = replay(16)
    assert(salted == unsalted)
    assert(unsalted.contains("hot")) // last hot event (lsn 19998) is an upsert
  }
}
