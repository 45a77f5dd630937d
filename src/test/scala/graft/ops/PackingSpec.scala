package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docs(n: Int, minTok: Int, maxTok: Int) =
    (0 until n).map { i =>
      val len = minTok + (i * 31) % (maxTok - minTok + 1)
      (i.toLong, (0 until len).map(j => (i * 131 + j) % 32000).toArray)
    }.toDF("doc_id", "tokens")

  test("packed chunks are exactly chunkLen and preserve per-shard concatenation order") {
    val L = 64
    val d = docs(200, 5, 90)
    val out = Packing.packChunks(d, "tokens", "doc_id", chunkLen = L, nShards = 4)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getSeq[Int](r.fieldIndex("tokens")).size == L))

    // invariant: per shard, concatenating chunks in chunk order reproduces
    // the prefix of the shard's doc-ordered token stream
    val byShard = d.withColumn("shard",
        TextHashExprs.md5Mod(col("doc_id").cast("string"), 4))
      .orderBy("shard", "doc_id")
      .collect()
      .groupBy(_.getAs[Int]("shard"))
      .view.mapValues(_.flatMap(r => r.getSeq[Int](r.fieldIndex("tokens")))).toMap
    val packedByShard = out.groupBy(_.getAs[Int]("shard"))
      .view.mapValues(_.sortBy(_.getAs[Long]("chunk")).flatMap(r => r.getSeq[Int](r.fieldIndex("tokens")))).toMap
    packedByShard.foreach { case (s, packed) =>
      val stream = byShard(s)
      assert(packed.length == (stream.length / L) * L, s"shard $s length")
      assert(packed.sameElements(stream.take(packed.length)), s"shard $s content")
    }
  }

  test("a document longer than chunkLen spans multiple chunks intact") {
    val L = 16
    val big = Seq((1L, (0 until 50).toArray)).toDF("doc_id", "tokens")
    val out = Packing.packChunks(big, "tokens", "doc_id", chunkLen = L, nShards = 1)
      .orderBy("chunk").collect()
    // 50 tokens -> 3 full chunks of 16, 2-token tail dropped
    assert(out.length == 3)
    assert(out.flatMap(r => r.getSeq[Int](r.fieldIndex("tokens"))).toSeq == (0 until 48))
    assert(out.forall(_.getAs[Long]("n_frags") == 1L))
  }

  test("chunk boundaries stitch fragments from adjacent docs") {
    val L = 10
    val d = Seq(
      (1L, Array(1, 1, 1, 1, 1, 1)), // 6 tokens
      (2L, Array(2, 2, 2, 2, 2, 2)), // 6 tokens -> chunk 0 = 6x1 + 4x2
      (3L, Array(3, 3, 3, 3, 3, 3, 3, 3))
    ).toDF("doc_id", "tokens")
    val out = Packing.packChunks(d, "tokens", "doc_id", chunkLen = L, nShards = 1)
      .orderBy("chunk").collect()
    assert(out.length == 2)
    assert(out(0).getSeq[Int](out(0).fieldIndex("tokens")) == Seq(1, 1, 1, 1, 1, 1, 2, 2, 2, 2))
    assert(out(0).getAs[Long]("n_frags") == 2L)
    assert(out(1).getSeq[Int](out(1).fieldIndex("tokens")) == Seq(2, 2, 3, 3, 3, 3, 3, 3, 3, 3))
  }

  test("tokenize_md5 ids are md5-lower mod vocab and bounded") {
    val d = Seq((1L, "Hello World hello")).toDF("id", "text")
    val toks = d.select(TextHashExprs.tokenizeMd5(col("text"), 32000).as("t"))
      .head().getSeq[Int](0)
    assert(toks.size == 3)
    assert(toks.forall(t => t >= 0 && t < 32000))
    // lowercasing: "Hello" and "hello" get the same id
    assert(toks(0) == toks(2))
    val expected = java.lang.Long.remainderUnsigned(
      TextHashKernel.md5Lower(org.apache.spark.unsafe.types.UTF8String.fromString("hello")), 32000L).toInt
    assert(toks(0) == expected)
  }

  test("empty-token documents are skipped, not emitted as empty chunks") {
    val d = Seq((1L, Array.empty[Int]), (2L, (0 until 8).toArray)).toDF("doc_id", "tokens")
    val out = Packing.packChunks(d, "tokens", "doc_id", chunkLen = 8, nShards = 1).collect()
    assert(out.length == 1)
    assert(out.head.getSeq[Int](out.head.fieldIndex("tokens")) == (0 until 8))
  }
}
