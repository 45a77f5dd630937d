package graft

import graft.ops.Similarity
import graft.stream.{ChangeGen, GenConfig}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Physical-plan assertions: the properties that make the engine scale are
 * pinned here so a regression shows up as a failing test, not a slow bench.
 *
 *  - filters and column pruning reach the parquet scan (no full-row reads);
 *  - hot paths stay inside whole-stage codegen;
 *  - the LWW dedup is ONE hash-shuffle + hash aggregate — no SortAggregate
 *    (a complex declarative buffer would force two full sorts), no second
 *    exchange;
 *  - the ANN ranking broadcasts the small query side (no shuffle of the
 *    candidate table).
 */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val sf = "/root/testdata/sf0.001"
  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("filter and projection push down to the parquet scan") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") < 10)
      .select("l_orderkey")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,"), p)
    // ReadSchema carries only the two referenced columns, not the full row
    val readSchema = p.linesIterator.mkString
    assert(readSchema.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), p)
  }

  test("aggregation query runs inside whole-stage codegen") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    df.collect() // finalize the adaptive plan — codegen spans appear post-execution
    val p = plan(df)
    // "*(n)" prefixes mark WholeStageCodegen spans in the simpleString form
    assert(p.contains("*(1)") && p.contains("HashAggregate"), p)
  }

  test("LWW dedup plans one exchange, hash aggregation, and no sorts") {
    val changes = ChangeGen.events(spark, GenConfig(numDocs = 100, numEvents = 1000, withMetadata = false))
      .select(col("doc_id"), col("op"), col("lsn"), col("after"))
    val p = plan(graft.merge.MergeInto.dedupe(changes, "doc_id", 8))
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("SortAggregate"), s"LWW dedup fell back to SortAggregate:\n$p")
    assert(!p.contains("\nSort") && !p.contains("Sort ["), s"unexpected sort in dedup plan:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 shuffle, found $exchanges:\n$p")
  }

  test("persisted LSH index scan prunes to the probed bucket partitions") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val idx = SparkTestBase.tempDir("plan-lsh-index")
    Similarity.buildLshIndex(emb, idx, bits = 4, dim = dim)
    val df = Similarity.lshTopKIndexed(emb.filter(col("vec_id") < 3), idx, k = 3, bits = 4, dim = dim)
    val p = plan(df)
    // the index scan carries a partition filter on bucket — the probe reads
    // O(|probed buckets|) directories, never the whole index
    assert(raw"PartitionFilters: \[[^\]]*bucket".r.findFirstIn(p).isDefined, p)
  }

  test("minhash index probe scan prunes to the batch's own bucket partitions") {
    import graft.ops.Dedup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val idx = SparkTestBase.tempDir("plan-mh-index") + "/idx"
    Dedup.buildMinhashIndex(docs, "doc_id", "text", idx,
      numHashes = 32, bands = 8, nPartitions = 16)
    val batch = docs.filter(col("doc_id") < 3)
    val df = Dedup.dedupAgainstIndex(batch, idx,
      "doc_id", "text", numHashes = 32, bands = 8, nPartitions = 16, threshold = 0.4)
    // The probe enumerates its p= directories driver-side and points the
    // scan at exactly those paths (no whole-root listing, no listing job):
    // every index file the plan reads must sit under a probed p= dir, and
    // the probe must NOT plan the full index (16 partitions at 8 bands of
    // 3 doc_ids would be a full-corpus read).
    val idxFiles: Seq[String] = df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.inputFiles.toSeq
          case _ => Seq.empty[String]
        }
    }.flatten.filter(_.contains("seg="))
    assert(idxFiles.nonEmpty, "probe must read the index")
    val probedDirs = idxFiles.map(_.replaceAll("/[^/]*$", "")).distinct
    assert(probedDirs.forall(_.matches(".*seg=[^/]+/p=\\d+$")), probedDirs.mkString("\n"))
    val allPs = probedDirs.map(_.replaceAll(".*p=", "").toInt).distinct
    assert(allPs.size < 16, s"probe must prune partitions, read ${allPs.sorted}")
  }

  test("ANN top-k broadcasts the query side and never shuffles candidates") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb, k = 3))
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), s"candidate side must not sort-merge:\n$p")
  }

  test("k-means IVF probe broadcasts queries; candidates never sort-merge") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(Similarity.kmeansIvfTopK(
      emb.filter(col("vec_id") < 5), emb, k = 3, nCells = 4, nprobe = 2, iters = 1))
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), s"candidate side must not sort-merge:\n$p")
  }

  test("token n-gram top-N partially aggregates before the shuffle") {
    import org.apache.spark.sql.functions.typedlit
    val d = spark.range(100).select(typedlit(Seq(1, 2, 3, 4)).as("tokens"))
    val df = graft.ops.TextOps.topTokenNgrams(d, "tokens", 2, 5)
    df.collect()
    val p = plan(df)
    // partial_count before the exchange = map-side combine; top-N is a
    // TakeOrdered, never a global Sort+Limit materialization
    assert(p.contains("partial_count") || p.contains("Partial"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("deterministic sampling is a codegen'd scan-side filter, no shuffle") {
    val df = graft.ops.Curate.stratifiedSample(
      spark.read.parquet(s"$sf/documents.parquet"),
      col("lang"), col("doc_id"), Map("en" -> 0.25), 0.5)
      .select("doc_id", "lang")
    val p = plan(df)
    assert(!p.contains("Exchange"), s"sampling must not shuffle:\n$p")
    assert(p.contains("*(1)"), s"sampling filter must stay in whole-stage codegen:\n$p")
  }

  test("per-stratum quota plans a map-side (Partial) WindowGroupLimit") {
    // the bounded top-n must run BEFORE the exchange too — at corpus scale
    // the shuffle then carries at most n rows per stratum per partition
    val df = graft.ops.Curate.quotaPerStratum(
      spark.read.parquet(s"$sf/documents.parquet"),
      col("source"), Seq(col("n_chars").desc, col("doc_id")), 5)
    val p = plan(df)
    assert(p.contains("WindowGroupLimit") &&
      raw"WindowGroupLimit .*Partial".r.findFirstIn(p).isDefined,
      s"expected partial+final WindowGroupLimit:\n$p")
  }

  test("PQ top-k broadcasts the query LUT and never shuffles the code index") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val p = plan(Similarity.pqTopK(emb.filter(col("vec_id") < 3), emb, k = 3,
      dim = dim, m = 4, ksub = 8))
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), s"code index must not sort-merge:\n$p")
  }

  test("context-window packing plans exactly one shuffle") {
    // the chunk assembly's (shard, chunk) grouping must reuse the window
    // stage's hash(shard) partitioning — a second exchange would reshuffle
    // every token at corpus scale
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        graft.ops.TextHashExprs.tokenizeMd5(col("text"), 32000).as("tokens"))
    val p = plan(graft.ops.Packing.packChunks(docs, "tokens", "doc_id", 128, 8))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 shuffle, found $exchanges:\n$p")
    assert(!p.contains("SortAggregate"), s"chunk assembly fell back to SortAggregate:\n$p")
  }
}
