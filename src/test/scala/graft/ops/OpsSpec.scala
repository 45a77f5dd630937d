package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit specs for the training-data operators: known near-dups found,
  * signatures deterministic, ANN recall sane, multimodal plumbing real. */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (2L, "the quick brown fox jumps over the lazy dog and runs far away house"), // near-dup of 1
    (3L, "completely different text about spark catalyst optimizer internals here"),
    (4L, "the quick brown fox jumps over the lazy dog and runs far away home"), // exact dup of 1
    (5L, "numbers 123 and punctuation, everywhere! truly; different content")
  ).toDF("doc_id", "text")

  test("exact dedup keeps one row per content and reports groups") {
    val (kept, groups) = Dedup.exact(docs, "doc_id", Seq("text"))
    assert(kept.count() == 4) // 1&4 collapse
    val dupGroup = groups.filter(col("n") > 1).collect()
    assert(dupGroup.length == 1 && dupGroup(0).getAs[Long]("keep_id") == 1L)
  }

  test("minhash LSH finds the near-duplicate pair and not unrelated docs") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      numHashes = 32, bands = 16, shingleWidth = 3, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((1L, 4L))) // near/exact dups collide
    assert(pairs.contains((1L, 4L))) // exact dup always collides
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(3L) && Set(a, b).intersect(Set(1L, 2L, 4L)).nonEmpty })
  }

  test("md5-derived hashes match the cross-engine md5_number_lower pin") {
    // DuckDB: SELECT md5_number_lower('abc') = 8250560606382298838 — the
    // little-endian uint64 of md5 bytes [8,16). Both oracle-reproducible
    // kernels (simhash word hash, LSH hyperplanes) derive from it.
    val pin = 8250560606382298838L
    assert(TextHashKernel.md5Lower(org.apache.spark.unsafe.types.UTF8String.fromString("abc")) == pin)
    assert(Similarity.md5LowerLE("abc") == pin)
    assert(Similarity.md5Unit("abc") == pin.toDouble / 1.8446744073709552E19)
  }

  test("md5 minhash kernel finds the same near-dup pairs as the xx kernel") {
    def pairs(kernel: String) = Dedup.minhashLsh(docs, "doc_id", "text",
      numHashes = 32, bands = 16, shingleWidth = 3, threshold = 0.4, hashKernel = kernel)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val xx = pairs("xx"); val md5 = pairs("md5")
    assert(md5.contains((1L, 4L))) // exact dup always collides
    assert(xx == md5) // same algorithm, different hash primitive
  }

  test("incremental minhash index dedups batches against the corpus and grows with survivors") {
    import graft.SparkTestBase
    val idx = SparkTestBase.tempDir("mh-index") + "/idx"
    val corpus = docs.filter(col("doc_id") <= 3)
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", idx,
      numHashes = 32, bands = 16, shingleWidth = 3, nPartitions = 8)
    // batch 1: an exact dup of doc 1 plus a fresh doc
    val b1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog and runs far away home"),
      (11L, "entirely novel sentence with no overlap to the corpus at all today")
    ).toDF("doc_id", "text")
    val d1 = Dedup.dedupAgainstIndex(b1, idx, "doc_id", "text",
      numHashes = 32, bands = 16, shingleWidth = 3, threshold = 0.4,
      nPartitions = 8, appendSurvivors = true).collect()
    assert(d1.map(_.getLong(0)).toSet == Set(10L), d1.mkString(","))
    assert(d1.head.getLong(1) == 1L && d1.head.getDouble(2) == 1.0)
    // batch 2: a near-dup of batch 1's SURVIVOR — only found because the
    // survivor's signatures were appended
    val b2 = Seq(
      (20L, "entirely novel sentence with no overlap to the corpus at all tonight")
    ).toDF("doc_id", "text")
    val d2 = Dedup.dedupAgainstIndex(b2, idx, "doc_id", "text",
      numHashes = 32, bands = 16, shingleWidth = 3, threshold = 0.4,
      nPartitions = 8, appendSurvivors = true).collect()
    assert(d2.length == 1 && d2.head.getLong(0) == 20L && d2.head.getLong(1) == 11L, d2.mkString(","))
    // duplicates are NOT appended: re-probing the exact dup still resolves
    // to the original corpus doc, not to id 10
    val d3 = Dedup.dedupAgainstIndex(
      Seq((30L, "the quick brown fox jumps over the lazy dog and runs far away home"))
        .toDF("doc_id", "text"),
      idx, "doc_id", "text", numHashes = 32, bands = 16, shingleWidth = 3,
      threshold = 0.4, nPartitions = 8).collect()
    assert(d3.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((30L, 1L)), d3.mkString(","))
  }

  test("dedupAgainstIndex with checkpointDir materializes through a reliable checkpoint") {
    import graft.SparkTestBase
    val base = SparkTestBase.tempDir("mh-ckpt")
    val idx = base + "/idx"
    Dedup.buildMinhashIndex(docs.filter(col("doc_id") <= 3), "doc_id", "text", idx,
      numHashes = 32, bands = 16, shingleWidth = 3, nPartitions = 8)
    val b1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog and runs far away home"),
      (11L, "entirely novel sentence with no overlap to the corpus at all today")
    ).toDF("doc_id", "text")
    val d = Dedup.dedupAgainstIndex(b1, idx, "doc_id", "text",
      numHashes = 32, bands = 16, shingleWidth = 3, threshold = 0.4,
      nPartitions = 8, appendSurvivors = true, segment = Some("e1"),
      checkpointDir = Some(base + "/ckpt")).collect()
    // same dupes as the local-checkpoint path, and the reliable checkpoint
    // actually landed on disk (survives executor loss on a real cluster)
    assert(d.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((10L, 1L)), d.mkString(","))
    val ckpt = new java.io.File(base + "/ckpt")
    assert(ckpt.exists && ckpt.listFiles().nonEmpty, "no reliable checkpoint written")
    // survivor append still happened exactly once
    assert(spark.read.parquet(idx).filter(col("seg") === "e1")
      .select("id").distinct().collect().map(_.getLong(0)).toSet == Set(11L))
  }

  test("segment-keyed index append is idempotent under batch redelivery") {
    import graft.SparkTestBase
    val idx = SparkTestBase.tempDir("mh-redeliver") + "/idx"
    Dedup.buildMinhashIndex(docs.filter(col("doc_id") <= 3), "doc_id", "text", idx,
      numHashes = 32, bands = 16, shingleWidth = 3, nPartitions = 8)
    val b1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog and runs far away home"),
      (11L, "entirely novel sentence with no overlap to the corpus at all today")
    ).toDF("doc_id", "text")
    def run() = Dedup.dedupAgainstIndex(b1, idx, "doc_id", "text",
      numHashes = 32, bands = 16, shingleWidth = 3, threshold = 0.4,
      nPartitions = 8, appendSurvivors = true, segment = Some("e1"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val first = run()
    assert(first == Set((10L, 1L)), first.toString)
    // count survivor signature rows in seg=e1 before and after redelivery
    def segRows() = spark.read.parquet(idx).filter(col("seg") === "e1").count()
    val rowsAfterFirst = segRows()
    assert(rowsAfterFirst > 0)
    // redelivery: same batch, same segment — same dupes (own segment is
    // excluded from the corpus view), same on-disk state (rewrite, not
    // double-append)
    val second = run()
    assert(second == first, second.toString)
    assert(segRows() == rowsAfterFirst)
    // a LATER segment dedups against e1's survivors
    val d2 = Dedup.dedupAgainstIndex(
      Seq((20L, "entirely novel sentence with no overlap to the corpus at all tonight"))
        .toDF("doc_id", "text"),
      idx, "doc_id", "text", numHashes = 32, bands = 16, shingleWidth = 3,
      threshold = 0.4, nPartitions = 8, segment = Some("e2")).collect()
    assert(d2.length == 1 && d2.head.getLong(1) == 11L, d2.mkString(","))
  }

  test("compacting the index folds segments into base without changing probe results") {
    import graft.SparkTestBase
    val idx = SparkTestBase.tempDir("mh-compact") + "/idx"
    Dedup.buildMinhashIndex(docs.filter(col("doc_id") <= 3), "doc_id", "text", idx,
      numHashes = 32, bands = 16, shingleWidth = 3, nPartitions = 8)
    Dedup.dedupAgainstIndex(
      Seq((11L, "entirely novel sentence with no overlap to the corpus at all today"))
        .toDF("doc_id", "text"),
      idx, "doc_id", "text", numHashes = 32, bands = 16, shingleWidth = 3,
      threshold = 0.4, nPartitions = 8, appendSurvivors = true, segment = Some("e1"))
      .collect(): Unit
    val probe = Seq(
      (30L, "the quick brown fox jumps over the lazy dog and runs far away home"),
      (31L, "entirely novel sentence with no overlap to the corpus at all tonight")
    ).toDF("doc_id", "text")
    def hits() = Dedup.dedupAgainstIndex(probe, idx, "doc_id", "text",
      numHashes = 32, bands = 16, shingleWidth = 3, threshold = 0.4, nPartitions = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = hits()
    assert(before == Set((30L, 1L), (31L, 11L)), before.toString)
    Dedup.compactMinhashIndex(spark, idx, nPartitions = 8)
    assert(hits() == before)
    val segs = spark.read.parquet(idx).select("seg").distinct().collect().map(_.getString(0)).toSet
    assert(segs == Set("base"), segs.toString)
  }

  test("minhash index build and probe drop degenerate buckets above maxBucket") {
    import graft.SparkTestBase
    val idx = SparkTestBase.tempDir("mh-cap") + "/idx"
    // three identical docs: every band bucket holds all 3 of them
    val boiler = Seq.tabulate(3)(i =>
      (100L + i, "same boilerplate text repeated across the whole corpus here"))
      .toDF("doc_id", "text")
    Dedup.buildMinhashIndex(boiler, "doc_id", "text", idx,
      numHashes = 32, bands = 16, shingleWidth = 3, nPartitions = 8, maxBucket = 2)
    val probe = Seq((200L, "same boilerplate text repeated across the whole corpus here"))
      .toDF("doc_id", "text")
    // capped at build: the boilerplate buckets never made it into the index
    assert(Dedup.dedupAgainstIndex(probe, idx, "doc_id", "text",
      numHashes = 32, bands = 16, shingleWidth = 3, threshold = 0.4,
      nPartitions = 8).isEmpty)
    // uncapped build finds the exact dup
    Dedup.buildMinhashIndex(boiler, "doc_id", "text", idx,
      numHashes = 32, bands = 16, shingleWidth = 3, nPartitions = 8)
    val hits = Dedup.dedupAgainstIndex(probe, idx, "doc_id", "text",
      numHashes = 32, bands = 16, shingleWidth = 3, threshold = 0.4,
      nPartitions = 8).collect()
    assert(hits.length == 1 && hits.head.getLong(1) == 100L, hits.mkString(","))
    // batch-side cap: a degenerate BATCH bucket is dropped before the join
    val bigBatch = Seq.tabulate(4)(i =>
      (300L + i, "same boilerplate text repeated across the whole corpus here"))
      .toDF("doc_id", "text")
    assert(Dedup.dedupAgainstIndex(bigBatch, idx, "doc_id", "text",
      numHashes = 32, bands = 16, shingleWidth = 3, threshold = 0.4,
      nPartitions = 8, maxBucket = 2).isEmpty)
  }

  test("simhash is deterministic and exact dups have hamming 0") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Number](4).longValue)).toMap
    assert(pairs(((1L, 4L))) == 0L)
    val sigs1 = docs.select(Dedup.simhash(col("text"))).collect().map(_.getLong(0))
    val sigs2 = docs.select(Dedup.simhash(col("text"))).collect().map(_.getLong(0))
    assert(sigs1.sameElements(sigs2))
  }

  test("brute-force topk: self-similar vector ranks first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f)), // closest to 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs.filter(col("vec_id") === 0), vecs, k = 2)
      .orderBy("rank").collect()
    assert(top(0).getAs[Long]("cid") == 1L)
    assert(top(1).getAs[Long]("cid") == 2L)
  }

  test("lsh topk places identical vectors in the same bucket and finds them") {
    def pseudo(i: Int, d: Int): Float = {
      val h = scala.util.hashing.MurmurHash3.productHash((i, d))
      (h % 1000) / 1000.0f
    }
    val base = (0 until 50).map(i => (i.toLong, Array.tabulate(8)(d => pseudo(i, d))))
    val plusDup = base :+ (100L, base(5)._2.clone())
    val vecs = plusDup.toDF("vec_id", "embedding")
    val out = Similarity.lshTopK(vecs.filter(col("vec_id") === 5), vecs, k = 3, bits = 4, dim = 8)
      .orderBy("rank").collect()
    assert(out.nonEmpty && out(0).getAs[Long]("cid") == 100L) // the exact dup wins
    assert(math.abs(out(0).getAs[Double]("sim") - 1.0) < 1e-9)
  }

  test("PQ encode is deterministic, in-range, and identical vectors share codes") {
    def pseudo(i: Int, d: Int): Float = {
      val h = scala.util.hashing.MurmurHash3.productHash((i, d))
      (h % 1000) / 1000.0f
    }
    val base = (0 until 40).map(i => (i.toLong, Array.tabulate(8)(d => pseudo(i, d))))
    val plusDup = base :+ (100L, base(7)._2.clone())
    val vecs = plusDup.toDF("vec_id", "embedding")
    val enc = Similarity.pqEncode(vecs, "embedding", dim = 8, m = 2, ksub = 4)
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc.values.forall(c => c.length == 2 && c.forall(j => j >= 0 && j < 4)))
    assert(enc(100L) == enc(7L), "identical vectors must share PQ codes")
    val enc2 = Similarity.pqEncode(vecs.repartition(7), "embedding", 8, 2, 4)
      .select("vec_id", "codes").collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc == enc2, "codes changed under repartitioning")
  }

  test("IVF-PQ with nprobe = nCells equals PQ-flat exactly") {
    def pseudo(i: Int, d: Int): Float = {
      val h = scala.util.hashing.MurmurHash3.productHash((i, d, 3))
      (h % 1000) / 1000.0f
    }
    val vecs = (0 until 60).map(i => (i.toLong, Array.tabulate(8)(d => pseudo(i, d))))
      .toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 5)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val flat = norm(Similarity.pqTopK(q, vecs, k = 3, dim = 8, m = 2, ksub = 4))
    val ivf = norm(Similarity.ivfPqTopK(q, vecs, k = 3, nCells = 3, nprobe = 3, dim = 8, m = 2, ksub = 4))
    assert(flat == ivf, s"flat $flat != ivfpq $ivf")
    // narrower probe returns a subset-shaped result (<= k per query), all
    // drawn from the flat candidate ordering's universe
    val narrow = norm(Similarity.ivfPqTopK(q, vecs, k = 3, nCells = 3, nprobe = 1, dim = 8, m = 2, ksub = 4))
    assert(narrow.map(_._1).subsetOf(flat.map(_._1)), "unknown qid appeared")
    assert(narrow.size <= flat.size)
  }

  test("PQ ADC ranks a planted exact duplicate first (pre-encoded index path)") {
    def pseudo(i: Int, d: Int): Float = {
      val h = scala.util.hashing.MurmurHash3.productHash((i, d, 9))
      (h % 1000) / 1000.0f
    }
    val base = (0 until 50).map(i => (i.toLong, Array.tabulate(16)(d => pseudo(i, d))))
    val plusDup = base :+ (100L, base(5)._2.clone())
    val vecs = plusDup.toDF("vec_id", "embedding")
    // pre-encoded candidates: the persisted-index path (codes stored, floats
    // not needed at probe time)
    val encoded = Similarity.pqEncode(vecs, "embedding", 16, 4, 8)
      .select("vec_id", "codes")
    val out = Similarity.pqTopK(vecs.filter(col("vec_id") === 5), encoded, k = 3,
      dim = 16, m = 4, ksub = 8).orderBy("rank").collect()
    // the dup shares ALL codes with the query -> maximal ADC score
    assert(out(0).getAs[Long]("cid") == 100L, out.mkString(", "))
  }

  test("embedding near-dup pairs finds the duplicate") {
    def pseudo2(i: Int, d: Int): Float = {
      val h = scala.util.hashing.MurmurHash3.productHash((i * 31, d))
      (h % 1000) / 1000.0f
    }
    val base = (0 until 30).map(i => (i.toLong, Array.tabulate(8)(d => pseudo2(i, d))))
    val plusDup = base :+ (200L, base(7)._2.clone())
    val vecs = plusDup.toDF("vec_id", "embedding")
    val dups = Dedup.embeddingNearDups(vecs, "vec_id", "embedding", dim = 8,
      bands = 4, rowsPerBand = 4, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dups.contains((7L, 200L)))
  }

  test("language id predicts stopword-bearing languages") {
    val df = Seq(
      (1L, "the cat is on the mat and it was there for the night"),
      (2L, "le chat est dans la maison avec le chien et il est la"),
      (3L, "der hund ist in dem haus und die katze ist auch da"),
      (4L, "el perro es grande y la casa es de los padres como siempre"),
      (5L, "xyzzy plugh qwerty")).toDF("doc_id", "text")
    val preds = TextOps.langId(df).select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(1L) == "en" && preds(2L) == "fr" && preds(3L) == "de" && preds(4L) == "es")
    assert(preds(5L) == "und")
  }

  test("fingerprint is order-sensitive") {
    val df = Seq((1L, "a bb cccc"), (2L, "cccc bb a"), (3L, "a bb cccc"))
      .toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(3L) && fps(1L) != fps(2L))
  }

  test("multimodal feature extraction is deterministic and batched per partition") {
    val media = Multimodal.syntheticMedia(spark, 200)
    val f1 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media.repartition(7)).orderBy("media_id").collect()
    assert(f1.length == 200)
    assert(f1.map(_.toString).sameElements(f2.map(_.toString))) // partitioning-invariant
    // decoded values equal the synthesis parameters (real PNG/WAV decode)
    f1.foreach { r =>
      val id = r.getLong(0)
      r.getString(1) match {
        case "image" =>
          assert(r.getInt(3) == 16 + (id % 16).toInt && r.getInt(4) == 16 + (id % 8).toInt)
          assert(r.getDouble(5) == ((id * 37) % 256).toDouble)
        case "audio" =>
          assert(r.getInt(6) == 16000)
          assert(r.getInt(7) == 800 + (id % 10).toInt * 160)
          assert(r.getDouble(8) == (1000 + (id % 50).toInt * 100).toDouble) // DC RMS = amplitude
        case "video" =>
          assert(r.getInt(9) == 2 + ((id / 3) % 3).toInt)
      }
    }
  }

  test("multi-probe LSH recall is a superset of single-probe and both are measured") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dim = emb.select(org.apache.spark.sql.functions.size(col("embedding"))).head().getInt(0)
    val queries = emb.filter(col("vec_id") < 20)
    val k = 5
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("qid").cast("long"), col("cid").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, emb, k))
    val single = pairs(Similarity.lshTopK(queries, emb, k, bits = 4, dim = dim))
    val multi = pairs(Similarity.lshTopKMultiProbe(queries, emb, k, bits = 4, dim = dim))
    val rs = single.intersect(exact).size.toDouble / exact.size
    val rm = multi.intersect(exact).size.toDouble / exact.size
    info(f"recall@$k single-probe=$rs%.3f multi-probe=$rm%.3f (n=${exact.size})")
    assert(rm >= rs) // multi-probe probes a superset of buckets
    assert(multi.nonEmpty && single.nonEmpty)
    // bits=0: one bucket = probe everything = exact recall
    val all = pairs(Similarity.lshTopK(queries, emb, k, bits = 0, dim = dim))
    assert(all == exact)
    // IVF: recall grows with nprobe; nprobe = nCells probes every inverted
    // list = exact
    val ivf1 = pairs(Similarity.ivfTopK(queries, emb, k, nCells = 8, nprobe = 1, dim = dim))
    val ivf2 = pairs(Similarity.ivfTopK(queries, emb, k, nCells = 8, nprobe = 2, dim = dim))
    val ivfAll = pairs(Similarity.ivfTopK(queries, emb, k, nCells = 8, nprobe = 8, dim = dim))
    val r1 = ivf1.intersect(exact).size.toDouble / exact.size
    val r2 = ivf2.intersect(exact).size.toDouble / exact.size
    info(f"IVF recall@$k nprobe1=$r1%.3f nprobe2=$r2%.3f")
    assert(r2 >= r1 && ivf1.nonEmpty)
    assert(ivfAll == exact)
  }

  test("k-means IVF: training is deterministic, recall sane, nprobe=nCells exact") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val k = 5
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("qid").cast("long"), col("cid").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // deterministic across runs (seeds fixed, updates 6-dp quantized)
    val c1 = Similarity.kmeansCentroids(emb, 4, 2)
    val c2 = Similarity.kmeansCentroids(emb, 4, 2)
    assert(c1 == c2)
    assert(c1.size == 4 && c1.forall(_.size == 64))
    // every trained component is on the 1e-6 grid (floor(x*1e6+0.5)/1e6)
    assert(c1.flatten.forall(x => math.abs(x * 1e6 - math.rint(x * 1e6)) < 1e-6))
    val exact = pairs(Similarity.bruteForceTopK(queries, emb, k))
    val km2 = pairs(Similarity.kmeansIvfTopK(queries, emb, k, nCells = 4, nprobe = 2, iters = 2))
    val kmAll = pairs(Similarity.kmeansIvfTopK(queries, emb, k, nCells = 4, nprobe = 4, iters = 2))
    val r2km = km2.intersect(exact).size.toDouble / exact.size
    info(f"k-means IVF recall@$k nprobe2of4=$r2km%.3f")
    assert(r2km >= 0.5) // trained quantizer at half the cells probed
    assert(kmAll == exact) // probing every cell degenerates to brute force
  }

  test("langIdCol (scalar SQL form) agrees with langId (DataFrame form)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val both = TextOps.langId(d, "text", "lp")
      .withColumn("lc", TextOps.langIdCol(col("text")))
    assert(both.filter(col("lp") =!= col("lc")).count() == 0)
  }

  test("URL density: count and character ratio") {
    val d = Seq((1L, "see https://a.io/x and http://b.co end"),
                (2L, "no links at all here")).toDF("id", "text")
    val out = d.select(col("id"), TextOps.urlCount(col("text")).as("n"),
      TextOps.urlCharRatio(col("text")).as("r")).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 2)
    val expected = ("https://a.io/x".length + "http://b.co".length).toDouble /
      "see https://a.io/x and http://b.co end".length
    assert(math.abs(out(1L).getDouble(2) - expected) < 1e-12)
    assert(out(2L).getInt(1) == 0 && out(2L).getDouble(2) == 0.0)
  }

  test("top token n-grams: counts, short-array guard, deterministic ties") {
    val d = Seq(Seq(1, 2, 3, 1, 2), Seq(1, 2), Seq(9)).toDF("tokens")
    val out = TextOps.topTokenNgrams(d, "tokens", 2, 10).collect()
    assert(out.length == 3) // [9] yields no bigram
    assert(out(0).getSeq[Int](0) == Seq(1, 2) && out(0).getLong(1) == 3)
    // cnt=1 ties order by the gram itself
    assert(out(1).getSeq[Int](0) == Seq(2, 3) && out(2).getSeq[Int](0) == Seq(3, 1))
  }

  test("corpus profile: exact stats correct; approx mode tracks exact") {
    val d = Seq(
      ("a", "one two three"), ("a", "one two three"), ("a", "four five"),
      ("b", "six")).toDF("source", "text")
    val ex = TextOps.corpusProfile(d).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = ex("a")
    assert(a.getAs[Long]("n_docs") == 3 && a.getAs[Long]("distinct_texts") == 2)
    assert(a.getAs[Long]("total_tokens") == 8)
    assert(math.abs(a.getAs[Double]("tok_mean") - 8.0 / 3) < 1e-6)
    assert(a.getAs[Double]("tok_p50") == 3.0 && ex("b").getAs[Long]("n_docs") == 1)
    // approx mode (the 100 TB path): same shape, near-exact on tiny input
    val ap = TextOps.corpusProfile(d, approx = true).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(ap("a").getAs[Long]("n_docs") == 3)
    assert(math.abs(ap("a").getAs[Double]("tok_p50") - 3.0) <= 1.0)
  }

  test("media codecs round-trip: PNG decode, WAV decode, resize, frame sampling") {
    // real ImageIO decode of a synthesized PNG
    val png = MediaCodec.encodePng(20, 10, 77)
    assert(png.take(4).map(_ & 0xff).sameElements(Seq(0x89, 0x50, 0x4e, 0x47))) // PNG magic
    assert(MediaCodec.decodeImage(png) == ((20, 10, 77.0)))
    // nearest-neighbour resize keeps a constant image constant
    assert(MediaCodec.decodeImage(MediaCodec.resizePng(png, 8, 8)) == ((8, 8, 77.0)))
    // real javax.sound WAV decode
    val wav = MediaCodec.encodeWavDc(16000, 1600, 2500)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    val (rate, n, rms) = MediaCodec.decodeWav(wav)
    assert(rate == 16000 && n == 1600 && math.abs(rms - 2500.0) < 1e-9)
    // frame container: every-2nd-frame sampling over 4 frames -> frames 0 and 2
    val vid = MediaCodec.encodeFrameContainer(4, 12, 6, f => 10 + f * 20)
    assert(MediaCodec.decodeFrames(vid, 2) == ((4, 12, 6, (10.0 + 50.0) / 2)))
  }

  test("connected components resolves duplicate groups (chain, ring, pair)") {
    // chain 1-2-3-4-5 (stresses pointer jumping), ring 10-11-12-10,
    // isolated pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L)).toDF("id_a", "id_b")
    val out = Dedup.components(pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert((1L to 5L).forall(i => out(i)._1 == 1L))
    assert(Seq(10L, 11L, 12L).forall(i => out(i)._1 == 10L))
    assert(out(20L)._1 == 20L && out(21L)._1 == 20L)
    assert(out.count(_._2._2) == 3) // one keeper per group
    assert(out(1L)._2 && out(10L)._2 && out(20L)._2)
    // long path: 64 nodes converge well inside the O(log n) iteration cap
    val longChain = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val lc = Dedup.components(longChain).collect()
    assert(lc.forall(_.getLong(1) == 0L) && lc.length == 64)
  }

  test("persisted LSH index returns the same top-k as the inline probe") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dim = emb.select(org.apache.spark.sql.functions.size(col("embedding"))).head().getInt(0)
    val idx = graft.SparkTestBase.tempDir("lsh-index")
    Similarity.buildLshIndex(emb, idx, bits = 4, dim = dim)
    val q = emb.filter(col("vec_id") < 10)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid").cast("long"), col("cid").cast("long"), col("rank").cast("int"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val inline = key(Similarity.lshTopK(q, emb, k = 5, bits = 4, dim = dim))
    val persisted = key(Similarity.lshTopKIndexed(q, idx, k = 5, bits = 4, dim = dim))
    assert(persisted == inline)
  }

  test("incremental LSH index append equals a rebuilt index") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dim = emb.select(org.apache.spark.sql.functions.size(col("embedding"))).head().getInt(0)
    val incr = graft.SparkTestBase.tempDir("lsh-incr")
    val full = graft.SparkTestBase.tempDir("lsh-full")
    // build on half the corpus, append the other half incrementally
    Similarity.buildLshIndex(emb.filter(col("vec_id") % 2 === 0), incr, bits = 4, dim = dim)
    Similarity.appendToLshIndex(emb.filter(col("vec_id") % 2 === 1), incr, bits = 4, dim = dim)
    Similarity.buildLshIndex(emb, full, bits = 4, dim = dim)
    val q = emb.filter(col("vec_id") < 10)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("cid")),
        r.getInt(r.fieldIndex("rank")))).toSet
    assert(key(Similarity.lshTopKIndexed(q, incr, k = 5, bits = 4, dim = dim)) ==
      key(Similarity.lshTopKIndexed(q, full, k = 5, bits = 4, dim = dim)))
  }

  test("components with a reliable checkpoint dir truncates lineage to a checkpoint scan") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val dir = graft.SparkTestBase.tempDir("comp-ckpt")
    val out = Dedup.components(pairs, checkpointDir = Some(dir))
    val rows = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).forall(rows(_) == 1L) && rows(10L) == 10L && rows(11L) == 10L)
    // reliable checkpoint files landed under the requested dir...
    def fileCount(d: java.io.File): Int =
      if (d.isDirectory) d.listFiles().map(fileCount).sum else 1
    assert(fileCount(new java.io.File(dir)) > 0, "no checkpoint data written")
    // ...and the result plan reads from checkpointed RDDs, not the full
    // iteration lineage (executor loss replays from the checkpoint)
    val planStr = out.queryExecution.optimizedPlan.toString
    assert(planStr.contains("LogicalRDD") || planStr.contains("ExistingRDD"),
      s"expected checkpoint scan in plan, got:\n$planStr")
  }

  test("degenerate LSH buckets are capped, not quadratic") {
    // 40 identical boilerplate docs share every band bucket: uncapped, the
    // self-join would emit 40*39/2 = 780 pairs from one bucket. With
    // maxBucket = 10 those buckets drop (counted via observe) and only the
    // genuine near-dup pair among the distinct docs survives.
    val boiler = (100L until 140L).map(i => (i, "lorem ipsum dolor sit amet boilerplate footer text"))
    val mixed = (boiler ++ Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away home"),
      (2L, "the quick brown fox jumps over the lazy dog and runs far away house")))
      .toDF("doc_id", "text")
    val obs = org.apache.spark.sql.Observation()
    val capped = Dedup.minhashLsh(mixed, "doc_id", "text",
      numHashes = 32, bands = 16, shingleWidth = 3, threshold = 0.4,
      maxBucket = 10, dropObs = Some(obs)).collect()
    val cappedPairs = capped.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cappedPairs.contains((1L, 2L)))
    assert(!cappedPairs.exists { case (a, b) => a >= 100L && b >= 100L })
    assert(obs.get("dropped_buckets").asInstanceOf[Long] > 0)
    // candidate volume stays O(docs x bands), not O(bucket^2)
    assert(capped.length < 40)
    // uncapped (default) finds the boilerplate pairs too — the cap is the
    // only difference
    val uncapped = Dedup.minhashLsh(mixed, "doc_id", "text",
      numHashes = 32, bands = 16, shingleWidth = 3, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((100L, 101L)))

    // same posture for simhash banding
    val obs2 = org.apache.spark.sql.Observation()
    val sim = Dedup.simhashPairs(mixed, "doc_id", "text", maxBucket = 10, dropObs = Some(obs2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!sim.exists { case (a, b) => a >= 100L && b >= 100L })
    assert(obs2.get("dropped_buckets").asInstanceOf[Long] > 0)
  }

  test("decontamination drops exactly the docs sharing a shingle with the benchmark") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated content about spark plans"),
      (3L, "xx yy quick brown fox zz"), // shares shingle "quick brown fox"
      (4L, "short one"), // < 3 words vs benchmark: whole-text shingle differs
      (10L, "benchmark doc with quick brown fox inside")).toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") === 10)
    val corpus = docs.filter(col("doc_id") =!= 10)
    for (kernel <- Seq("xx", "md5")) {
      val kept = Dedup.decontaminate(corpus, "doc_id", "text", bench, "text",
        shingleWidth = 3, hashKernel = kernel)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(2L, 4L), s"kernel=$kernel kept $kept")
    }
  }

  test("segment dedup keeps first occurrences in order and reports the ratio") {
    val df = Seq((1L, "a b. c d. a b. e f. c d")).toDF("id", "text")
    val out = df.select(
      TextOps.dedupSegments(col("text"), "\\. ", ". ").as("clean"),
      TextOps.segmentDupRatio(col("text"), "\\. ").as("r")).head()
    assert(out.getString(0) == "a b. c d. e f", out.getString(0))
    assert(math.abs(out.getDouble(1) - 0.4) < 1e-12) // 2 repeats of 5 segments
  }

  test("PII redaction scrubs emails and phones and counts them") {
    val df = Seq(
      (1L, "reach me at a.b+c@mail-host.org today"),
      (2L, "call 555-123-4567 or 555.987.6543"),
      (3L, "nothing sensitive here")).toDF("id", "text")
    val out = df.select(col("id"), TextOps.redactPii(col("text")).as("clean"),
      TextOps.piiCount(col("text")).as("n")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(1L) == (("reach me at <EMAIL> today", 1)))
    assert(out(2L) == (("call <PHONE> or <PHONE>", 2)))
    assert(out(3L) == (("nothing sensitive here", 0)))
  }

  test("quality features penalize junk") {
    val df = Seq(
      (1L, "this is a perfectly normal english sentence with many common words in it"),
      (2L, "1234 5678 !!!! ;;;; 9999 ####")).toDF("doc_id", "text")
    val q = TextOps.qualityFeatures(df).select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q(1L) > q(2L))
  }
}
