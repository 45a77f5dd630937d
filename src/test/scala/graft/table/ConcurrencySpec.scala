package graft.table

import graft.SparkTestBase
import graft.stream.{ChangeGen, GenConfig, Pipeline}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Optimistic multi-writer commits: the version-file commit is atomic
 * (link(2) on local FS, rename on HDFS), a losing writer rebases its
 * manifest delta when the intervening commit touched disjoint buckets,
 * yields on a same-epoch race, and recomputes on an overlapping-bucket
 * conflict — so N concurrent merge streams against one table converge to
 * the same state as their sequential application.
 */
class ConcurrencySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val payload = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("val", IntegerType, nullable = true)))

  /** A merge-shaped change batch over the tiny (doc_id, val) payload. */
  private def batch(rows: Seq[(String, Int)], lsn0: Long) = {
    import spark.implicits._
    rows.zipWithIndex.toDF("kv", "i").select(
      col("kv._1").as("doc_id"),
      lit("u").as("op"),
      (lit(lsn0) + col("i")).as("lsn").cast(LongType),
      struct(col("kv._1").as("doc_id"), col("kv._2").as("val")).as("after"))
  }

  /** Hand-write one data file for `rows` at `lsn`, returning its manifest
    * entry — a stand-in for a concurrent writer's merge output. */
  private def writeFile(t: IceLiteTable, rows: Seq[(String, Int)], lsn: Long): DataFileMeta = {
    import spark.implicits._
    val sub = s"data/ctest-${java.util.UUID.randomUUID().toString.take(8)}"
    rows.toDF("doc_id", "val")
      .withColumn("__lsn", lit(lsn)).withColumn("__deleted", lit(false))
      .coalesce(1).write.parquet(s"${t.root}/$sub")
    val part = new java.io.File(s"${t.root}/$sub").listFiles()
      .map(_.getName).filter(n => n.startsWith("part-") && n.endsWith(".parquet")).head
    val bucket = graft.hashing.KafkaMurmur2.bucketLabelOf(rows.head._1, t.snapshot.numBuckets)
    assert(rows.forall(r =>
      graft.hashing.KafkaMurmur2.bucketLabelOf(r._1, t.snapshot.numBuckets) == bucket))
    DataFileMeta(s"$sub/$part", bucket, rows.size, rows.map(_._1).min, rows.map(_._1).max)
  }

  /** A key whose manifest bucket label is the b-th of numBuckets' labels —
    * distinct b give keys guaranteed to land in distinct buckets. */
  private def keyInBucket(t: IceLiteTable, b: Int, not: Set[String] = Set.empty): String = {
    val n = t.snapshot.numBuckets
    val want = graft.hashing.KafkaMurmur2.labels(n)(b)
    (0 until 10000).map(i => s"k$i").find(k =>
      !not(k) && graft.hashing.KafkaMurmur2.bucketLabelOf(k, n) == want).get
  }

  private def freshTable(name: String): IceLiteTable = {
    val root = SparkTestBase.tempDir(name)
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 4)
    t.merge(batch(Seq(keyInBucket(t, 0) -> 1), lsn0 = 0), "seed/0")
    t
  }

  test("rebase: disjoint-bucket candidate commits without recompute") {
    val t = freshTable("conc-rebase")
    val base = t.snapshot
    val kA = keyInBucket(t, 1)
    val kB = keyInBucket(t, 2)

    // writer A commits normally (wins the version race)
    t.merge(batch(Seq(kA -> 10), lsn0 = 100), "a/0")
    // writer B's candidate was built against the now-stale base
    val fB = writeFile(t, Seq(kB -> 20), lsn = 200)
    val cand = base.copy(
      version = base.version + 1,
      files = base.files :+ fB,
      committedEpochs = base.committedEpochs :+ "b/0",
      lineage = base.lineage + ("b.rows" -> 1L),
      parentVersion = base.version)
    assert(t.commitRebasing(base, cand) == CommitOutcome.Committed)

    val s = t.snapshot
    assert(s.version == base.version + 2)
    assert(s.committedEpochs.contains("a/0") && s.committedEpochs.contains("b/0"))
    assert(s.lineage("b.rows") == 1L)
    val state = t.read().collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(state(kA) == 10 && state(kB) == 20) // both writers' rows present
  }

  test("alterProperties is metadata-only and rebases across concurrent merges") {
    val t = freshTable("conc-props")
    // property-edit candidate built against a base a merge has since buried
    val base = t.snapshot
    t.merge(batch(Seq(keyInBucket(t, 1) -> 7), lsn0 = 100), "pr/0")
    val cand = base.copy(version = base.version + 1, parentVersion = base.version,
      properties = base.properties + ("write.stats.columns" -> "val"), stats = None)
    assert(t.commitRebasing(base, cand) == CommitOutcome.Committed)
    assert(t.snapshot.properties("write.stats.columns") == "val")
    assert(t.read().count() == 2) // the concurrent merge's row survived the rebase

    // the reverse: a data candidate built before a property edit rebases
    // over it and the edit survives (properties are one-sided)
    val base2 = t.snapshot
    val filesBefore = base2.files.map(_.path).toSet
    val f = writeFile(t, Seq(keyInBucket(t, 2) -> 5), lsn = 300)
    assert(t.alterProperties(Map("graft.custom" -> "1")) == base2.version + 1)
    assert(t.snapshot.files.map(_.path).toSet == filesBefore) // zero data files touched
    val cand2 = base2.copy(version = base2.version + 1, parentVersion = base2.version,
      files = base2.files :+ f, committedEpochs = base2.committedEpochs :+ "pr/1")
    assert(t.commitRebasing(base2, cand2) == CommitOutcome.Committed)
    assert(t.snapshot.properties("graft.custom") == "1")
    assert(t.read().count() == 3)

    // unset removes; layout-semantic keys are create-time-only
    t.alterProperties(Map("write.parquet.bloom" -> "true"), unset = Seq("graft.custom"))
    assert(!t.snapshot.properties.contains("graft.custom"))
    assert(t.snapshot.properties("write.parquet.bloom") == "true")
    intercept[IllegalArgumentException](t.alterProperties(Map("write.mode" -> "mor")))
    intercept[IllegalArgumentException](t.alterProperties(Map.empty))

    // two DIVERGENT property edits: the built-in retry re-reads and reapplies,
    // so both edits land (whole-edit last-writer-wins over a fresh snapshot)
    val base3 = t.snapshot
    t.alterProperties(Map("a" -> "1"))
    val cand3 = base3.copy(version = base3.version + 1, parentVersion = base3.version,
      properties = base3.properties + ("b" -> "2"), stats = None)
    assert(t.commitRebasing(base3, cand3) == CommitOutcome.Overlap) // raw protocol refuses
    assert(t.alterProperties(Map("b" -> "2")) > 0)                  // API retry lands it
    assert(t.snapshot.properties("a") == "1" && t.snapshot.properties("b") == "2")
  }

  test("rebase yields EpochWon on a same-epoch race and deletes its files") {
    val t = freshTable("conc-epoch")
    val base = t.snapshot
    val k = keyInBucket(t, 1)
    t.merge(batch(Seq(k -> 10), lsn0 = 100), "dup/0") // winner applies dup/0
    val fB = writeFile(t, Seq(keyInBucket(t, 2) -> 99), lsn = 100)
    val cand = base.copy(version = base.version + 1, files = base.files :+ fB,
      committedEpochs = base.committedEpochs :+ "dup/0", parentVersion = base.version)
    assert(t.commitRebasing(base, cand) == CommitOutcome.EpochWon)
    assert(!new java.io.File(s"${t.root}/${fB.path}").exists()) // abandoned
    assert(t.snapshot.committedEpochs.count(_ == "dup/0") == 1)
  }

  test("rebase returns Overlap when the intervening commit touched its bucket") {
    val t = freshTable("conc-overlap")
    val base = t.snapshot
    val k1 = keyInBucket(t, 1)
    t.merge(batch(Seq(k1 -> 10), lsn0 = 100), "a/0") // touches bucket 1
    val k1b = keyInBucket(t, 1, not = Set(k1))
    val fB = writeFile(t, Seq(k1b -> 20), lsn = 200) // candidate also bucket 1
    val cand = base.copy(version = base.version + 1, files = base.files :+ fB,
      committedEpochs = base.committedEpochs :+ "b/0", parentVersion = base.version)
    assert(t.commitRebasing(base, cand) == CommitOutcome.Overlap)
    assert(!new java.io.File(s"${t.root}/${fB.path}").exists())
    assert(!t.snapshot.committedEpochs.contains("b/0"))
  }

  test("rebase returns Overlap on divergent schema evolution") {
    val t = freshTable("conc-schema")
    val base = t.snapshot
    // writer A evolves the schema (additive merge with an extra column)
    val evolved = batch(Seq(keyInBucket(t, 1) -> 10), lsn0 = 100)
      .withColumn("after", struct(col("after.doc_id"), col("after.val"),
        (col("lsn") * 2).cast(IntegerType).as("extra")))
    t.merge(evolved, "a/0")
    // writer B's candidate ALSO evolved the schema, differently
    val otherSchema = StructType(payload.fields :+ StructField("other", StringType))
    val fB = writeFile(t, Seq(keyInBucket(t, 2) -> 20), lsn = 200)
    val cand = base.copy(version = base.version + 1, schemaJson = otherSchema.json,
      files = base.files :+ fB,
      committedEpochs = base.committedEpochs :+ "b/0", parentVersion = base.version)
    assert(t.commitRebasing(base, cand) == CommitOutcome.Overlap)
    // one-sided evolution rebases fine: candidate kept base's schema
    val fC = writeFile(t, Seq(keyInBucket(t, 2) -> 20), lsn = 200)
    val cand2 = base.copy(version = base.version + 1, files = base.files :+ fC,
      committedEpochs = base.committedEpochs :+ "c/0", parentVersion = base.version)
    assert(t.commitRebasing(base, cand2) == CommitOutcome.Committed)
    assert(t.snapshot.schema.fieldNames.contains("extra")) // A's evolution kept
  }

  test("two concurrent merge streams over disjoint keys converge to the sequential state") {
    val cfg = GenConfig(numDocs = 120, numEvents = 2400, seed = 11, withMetadata = false)
    val root = SparkTestBase.tempDir("conc-e2e")
    IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)

    val epochs = 4
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def runWriter(parity: Int): Thread = new Thread(() => {
      try {
        val sess = spark.newSession() // own confs, like a separate driver
        val table = IceLite.load(sess, root)
        val half = ChangeGen.events(sess, cfg)
          .filter(pmod(hash(col("doc_id")), lit(2)) === parity)
        Pipeline.replayBatch(sess, half, table, s"w$parity", epochs, lsnMax = cfg.numEvents)
      } catch { case t: Throwable => errs.add(t): Unit }
    })
    val ws = Seq(runWriter(0), runWriter(1))
    ws.foreach(_.start()); ws.foreach(_.join())
    assert(errs.isEmpty, s"writer failed: ${Option(errs.peek()).map(_.toString)}")

    val t = IceLite.load(spark, root)
    val s = t.snapshot
    // every epoch committed exactly one version, regardless of interleaving
    assert(s.version == epochs * 2)
    assert((0 until epochs).forall(e =>
      s.committedEpochs.contains(s"w0/$e") && s.committedEpochs.contains(s"w1/$e")))

    // final state == last-write-wins fold over the FULL stream (the halves
    // partition it by key, so interleaving cannot change the per-key fold)
    val evs = ChangeGen.events(spark, cfg)
      .select("doc_id", "op", "lsn", "after.tokens", "after.n_tok", "after.source")
      .collect()
      .map { r =>
        val p = if (r.isNullAt(3)) None
                else Some((r.getSeq[Int](3), r.getInt(4), r.getString(5)))
        (r.getString(0), r.getString(1), r.getLong(2), p)
      }.toSeq
    val expected = ChangeGen.oracleFold(evs)
    val actual = t.read().select("doc_id", "tokens", "n_tok", "source").collect()
      .map(r => r.getString(0) -> ((r.getSeq[Int](1), r.getInt(2), r.getString(3)))).toMap
    assert(actual == expected)
  }

  test("compaction concurrent with ingest converges (rebase or recompute, never corruption)") {
    val root = SparkTestBase.tempDir("conc-compact")
    val t0 = IceLite.create(spark, root, payload, "doc_id", numBuckets = 4,
      properties = Map("write.mode" -> "mor"))
    val k1 = keyInBucket(t0, 1)
    val k2 = keyInBucket(t0, 2)
    t0.merge(batch(Seq(k1 -> 0, k2 -> 0), lsn0 = 0), "seed/0")

    // writer: 6 epochs of updates to k2 (bucket 2); maintainer: compacts
    // bucket 1 (disjoint → rebase) and bucket 2 (overlap → recompute) in a
    // loop. Any interleaving must preserve the last-write-wins state.
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writer = new Thread(() => {
      try {
        val sess = spark.newSession()
        val t = IceLite.load(sess, root)
        (1 to 6).foreach { e => t.merge(batch(Seq(k2 -> e, k1 -> e), lsn0 = e * 10), s"w/$e"): Unit }
      } catch { case x: Throwable => errs.add(x): Unit }
    })
    val maintainer = new Thread(() => {
      try {
        val sess = spark.newSession()
        val t = IceLite.load(sess, root)
        (1 to 4).foreach { _ =>
          t.compactBuckets(Set(t.snapshot.files.map(_.bucket).min)): Unit
          t.compactTombstones(lsnWatermark = 0): Unit
        }
      } catch { case x: Throwable => errs.add(x): Unit }
    })
    writer.start(); maintainer.start(); writer.join(); maintainer.join()
    assert(errs.isEmpty, s"concurrent maintenance failed: ${Option(errs.peek())}")

    val state = t0.read().collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(state == Map(k1 -> 6, k2 -> 6))
    assert((1 to 6).forall(e => t0.snapshot.committedEpochs.contains(s"w/$e")))
  }

  test("vacuum graceMs spares young unreferenced files (in-flight writers)") {
    val t = freshTable("conc-vacuum")
    val orphan = writeFile(t, Seq(keyInBucket(t, 3) -> 7), lsn = 50) // never committed
    val f = new java.io.File(s"${t.root}/${orphan.path}")
    assert(f.exists())
    assert(t.vacuum(keepSnapshots = 1, graceMs = 3600L * 1000) == 0) // young → spared
    assert(f.exists())
    assert(t.vacuum(keepSnapshots = 1) >= 1) // grace 0 → reaped
    assert(!f.exists())
  }

  test("concurrent duplicate delivery of the SAME epoch applies it once") {
    val root = SparkTestBase.tempDir("conc-dup")
    val t0 = IceLite.create(spark, root, payload, "doc_id", numBuckets = 4)
    val rows = Seq("a" -> 1, "b" -> 2, "c" -> 3)
    val ws = (0 until 2).map { _ =>
      new Thread(() => {
        val sess = spark.newSession()
        val table = IceLite.load(sess, root)
        table.merge(batch(rows, lsn0 = 10), "e/0"): Unit
      })
    }
    ws.foreach(_.start()); ws.foreach(_.join())
    val s = t0.snapshot
    assert(s.committedEpochs.count(_ == "e/0") == 1)
    val state = t0.read().collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(state == rows.toMap)
  }
}
