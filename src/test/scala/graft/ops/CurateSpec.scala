package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Curation ops: determinism under repartitioning (the property that makes
  * them safe to re-run at 100 TB), statistical sanity, and the bounded
  * top-n plan for quotas. */
class CurateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docs = (0 until 1000)
    .map(i => (i.toLong, s"src${i % 7}", s"l${i % 3}", (i * 131) % 997))
    .toDF("doc_id", "source", "lang", "n_chars")

  test("hashSample: membership is a pure function of the key") {
    val a = Curate.hashSample(docs, col("doc_id"), 0.5, "t1")
      .select("doc_id").as[Long].collect().toSet
    val b = Curate.hashSample(docs.repartition(13), col("doc_id"), 0.5, "t1")
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "sample membership changed under repartitioning")
    assert(math.abs(a.size - 500) < 80, s"fraction off: ${a.size}/1000")
    // a different salt re-rolls
    val c = Curate.hashSample(docs, col("doc_id"), 0.5, "t2")
      .select("doc_id").as[Long].collect().toSet
    assert(a != c, "salt had no effect")
  }

  test("hashSample is monotone in fraction (nested samples)") {
    val small = Curate.hashSample(docs, col("doc_id"), 0.2, "t1")
      .select("doc_id").as[Long].collect().toSet
    val big = Curate.hashSample(docs, col("doc_id"), 0.6, "t1")
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(big), "smaller fraction must be a subset of larger")
  }

  test("stratifiedSample applies per-stratum fractions") {
    val out = Curate.stratifiedSample(docs, col("lang"), col("doc_id"),
      Map("l0" -> 0.1, "l1" -> 0.9), defaultFraction = 0.5, salt = "t1")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ~334 docs per lang; thresholds are statistical but well-separated
    assert(out("l0") < 80, s"l0 kept ${out("l0")} of ~334 at 0.1")
    assert(out("l1") > 250, s"l1 kept ${out("l1")} of ~334 at 0.9")
    val l2 = out.getOrElse("l2", 0L)
    assert(l2 > 100 && l2 < 250, s"l2 (default 0.5) kept $l2 of ~334")
  }

  test("quotaPerStratum keeps exactly the top-n per stratum, bounded-heap plan") {
    val q = Curate.quotaPerStratum(docs, col("source"),
      Seq(col("n_chars").desc, col("doc_id")), n = 5)
    val out = q.select("source", "n_chars", "doc_id").collect()
      .groupBy(_.getString(0))
    assert(out.keySet.size == 7 && out.values.forall(_.length == 5))
    // per stratum, kept rows are the 5 largest n_chars
    val expected = docs.collect()
      .groupBy(_.getString(1))
      .map { case (s, rows) =>
        s -> rows.map(r => (-r.getInt(3), r.getLong(0))).sorted.take(5)
          .map(t => (-t._1, t._2)).toSet
      }
    out.foreach { case (s, rows) =>
      assert(rows.map(r => (r.getInt(1), r.getLong(2))).toSet == expected(s), s)
    }
    // rank<=n windows plan as WindowGroupLimit: the stratum is never fully
    // sorted for small n — the property that keeps quotas cheap at scale
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("deterministicShuffle: stable (shard,pos), contiguous positions, balanced shards") {
    val a = Curate.deterministicShuffle(docs, col("doc_id"), shards = 8, salt = "t1")
      .select("doc_id", "shard", "pos").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val b = Curate.deterministicShuffle(docs.repartition(17), col("doc_id"), 8, "t1")
      .select("doc_id", "shard", "pos").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(a == b, "(shard,pos) changed under repartitioning")
    val byShard = a.values.groupBy(_._1)
    assert(byShard.keySet == (0 until 8).toSet)
    byShard.foreach { case (s, rows) =>
      val ps = rows.map(_._2).toSeq.sorted
      assert(ps == (1 to rows.size), s"shard $s positions not contiguous")
    }
    val sizes = byShard.values.map(_.size)
    assert(sizes.max < 2 * sizes.min, s"shards unbalanced: $sizes")
  }

  test("quality filter gates on words, repetition, URLs, and PII independently") {
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"), // pass
      (2L, "too short"), // fails minWords
      (3L, "aa bb cc dd ee. aa bb cc dd ee. aa bb cc dd ee"), // fails dup ratio
      (4L, "good words here with a link http://x.y/aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa plus more"), // fails URL
      (5L, "clean text of many proper words mail me a.b@c.de thanks")) // fails PII
      .toDF("id", "text")
    val kept = Curate.qualityFilter(rows).select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), kept.toString)
  }
}
