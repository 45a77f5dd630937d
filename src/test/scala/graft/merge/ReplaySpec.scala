package graft.merge

import graft.SparkTestBase
import graft.stream.{ChangeGen, GenConfig, Pipeline}
import graft.table.IceLite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Replay correctness: the BASELINE.json gate — a deterministic change log
 * replayed through the MERGE sink must equal a plain-Scala last-write-wins
 * fold, with per-row token-array equality; re-delivered epochs are no-ops
 * (exactly-once); schema evolution is additive.
 */
class ReplaySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def collectOracle(cfg: GenConfig): Map[String, (Seq[Int], Int, String)] = {
    val evs = ChangeGen.events(spark, cfg)
      .select("doc_id", "op", "lsn", "after.tokens", "after.n_tok", "after.source")
      .collect()
      .map { r =>
        val payload =
          if (r.isNullAt(3)) None
          else Some((r.getSeq[Int](3), r.getInt(4), r.getString(5)))
        (r.getString(0), r.getString(1), r.getLong(2), payload)
      }.toSeq
    ChangeGen.oracleFold(evs)
  }

  private def tableState(table: graft.table.IceLiteTable): Map[String, (Seq[Int], Int, String)] =
    tableState2(table.read())

  private def tableState2(df: org.apache.spark.sql.DataFrame): Map[String, (Seq[Int], Int, String)] =
    df.select("doc_id", "tokens", "n_tok", "source").collect()
      .map(r => r.getString(0) -> ((r.getSeq[Int](1), r.getInt(2), r.getString(3)))).toMap

  test("multi-epoch replay matches the oracle fold with token-array equality") {
    val cfg = GenConfig(numDocs = 300, numEvents = 5000, seed = 7, withMetadata = false)
    val root = SparkTestBase.tempDir("icelite-replay")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 8)

    val events = ChangeGen.events(spark, cfg)
    Pipeline.replayBatch(spark, events, table, "t1", epochs = 5, lsnMax = cfg.numEvents)

    val expected = collectOracle(cfg)
    val actual = tableState(table)
    assert(actual.keySet == expected.keySet)
    // per-row token-array equality (input_hint invariant)
    expected.foreach { case (k, (toks, n, src)) =>
      val (aToks, aN, aSrc) = actual(k)
      assert(aToks == toks, s"token mismatch for $k")
      assert(aN == n && aSrc == src)
      assert(aToks.size == aN) // n_tok = size(tokens) invariant
    }
  }

  test("generator-sliced replay (replayGen) equals filtered replay and the oracle") {
    // replayGen slices epochs by re-generating [startLsn, startLsn+n) at full
    // width; the stream must be event-identical to lsn-filtering one frame.
    // Both the pipelined (lookahead dedup overlapping the previous merge) and
    // the sequential path must land on the oracle state.
    val cfg = GenConfig(numDocs = 300, numEvents = 5000, seed = 7, withMetadata = false)
    val expected = collectOracle(cfg)
    for (lookahead <- Seq(true, false)) {
      val root = SparkTestBase.tempDir(s"icelite-replaygen-$lookahead")
      val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 8)
      Pipeline.replayGen(spark, cfg, table, "g1", epochs = 5, lookahead = lookahead)
      assert(tableState(table) == expected, s"lookahead=$lookahead")
      assert(table.snapshot.committedEpochs.size == 5)
    }
  }

  test("re-delivered epoch is a no-op (exactly-once)") {
    val cfg = GenConfig(numDocs = 50, numEvents = 500, seed = 11, withMetadata = false)
    val root = SparkTestBase.tempDir("icelite-eo")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    val events = ChangeGen.events(spark, cfg)
    val batch = events.select(col("doc_id"), col("op"), col("lsn"), col("after"))

    val s1 = table.merge(batch, "s/0")
    val v1 = table.snapshot.version
    val state1 = tableState(table)
    val s2 = table.merge(batch, "s/0") // re-delivery
    assert(s2.inserted == 0 && s2.updated == 0 && s2.deleted == 0)
    assert(table.snapshot.version == v1)
    assert(tableState(table) == state1)
    assert(s1.inserted > 0)
  }

  test("duplicated (key, lsn) events within one batch write a single row") {
    val cfg = GenConfig(numDocs = 40, numEvents = 400, seed = 29, withMetadata = false)
    val root = SparkTestBase.tempDir("icelite-dup")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    val events = ChangeGen.events(spark, cfg)
    table.merge(events.unionAll(events).unionAll(events.limit(50)), "s/0")
    val dupKeys = table.read().groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(dupKeys == 0)
    // and the state still matches the oracle fold
    val expected = collectOracle(cfg)
    assert(tableState(table) == expected)
  }

  test("copy-on-write touches only affected buckets/files") {
    val cfg = GenConfig(numDocs = 200, numEvents = 2000, seed = 3, withMetadata = false)
    val root = SparkTestBase.tempDir("icelite-cow")
    // force pruning: auto mode skips it for young tables (files <= 2x buckets)
    spark.conf.set("graft.merge.filePruning", "always")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 8)
    table.merge(ChangeGen.events(spark, cfg), "s/0")
    val before = table.snapshot.files.map(f => f.path -> f).toMap

    // a single-key update must rewrite only that key's bucket (lsn bumped
    // above the table's high-water mark so the change actually applies —
    // a stale change now commits marker-only without rewriting anything)
    val oneKey = ChangeGen.events(spark, cfg).filter(col("op") =!= "d").limit(1)
      .withColumn("lsn", col("lsn") + 1000000L)
    val stats = table.merge(oneKey, "s/1")
    assert(stats.touchedBuckets == 1)
    val after = table.snapshot.files
    val unchanged = after.filter(f => before.contains(f.path))
    // all files from untouched buckets survive commit untouched
    assert(unchanged.size == before.size - stats.rewrittenFiles)
    spark.conf.set("graft.merge.filePruning", "auto")
  }

  test("additive schema evolution: new column appears, old rows read null") {
    val root = SparkTestBase.tempDir("icelite-evolve")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    val cfg = GenConfig(numDocs = 40, numEvents = 300, seed = 5, withMetadata = false)
    table.merge(ChangeGen.events(spark, cfg), "s/0")

    // evolve: payload gains a `lang` column
    val evolved = ChangeGen.events(spark, cfg.copy(startLsn = 300, numEvents = 100, seed = 5))
      .filter(col("op") =!= "d")
      .withColumn("after", struct(
        col("after.doc_id"), col("after.tokens"), col("after.n_tok"), col("after.source"),
        lit("en").as("lang")))
    table.merge(evolved, "s/1")

    val df = table.read()
    assert(df.schema.fieldNames.contains("lang"))
    val updatedKeys = evolved.select("doc_id").distinct().collect().map(_.getString(0)).toSet
    val rows = df.select("doc_id", "lang").collect()
    rows.foreach { r =>
      if (updatedKeys.contains(r.getString(0))) assert(r.getString(1) == "en")
      else assert(r.isNullAt(1), s"old row ${r.getString(0)} should read null for evolved column")
    }
    // incompatible type change refuses
    intercept[Exception] {
      MergeInto.evolveSchema(table.snapshot.schema,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("n_tok", org.apache.spark.sql.types.StringType))))
    }
  }

  test("out-of-order replayed batch is stale-guarded by the per-row lsn") {
    val cfg = GenConfig(numDocs = 60, numEvents = 800, seed = 17, withMetadata = false)
    val root = SparkTestBase.tempDir("icelite-stale")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    table.merge(ChangeGen.events(spark, cfg), "s/0")
    val state1 = tableState(table)
    // replay an old prefix out of order under a NEW epoch key: stale rows
    // are guarded; equal-lsn re-applies are idempotent; deleted keys are
    // not resurrected (tombstones carry the delete's lsn)
    val stats = table.merge(ChangeGen.events(spark, cfg.copy(numEvents = 100)), "s/1")
    assert(stats.stale > 0)
    assert(tableState(table) == state1)
  }

  test("tombstone compaction drops old tombstones, keeps live rows") {
    val cfg = GenConfig(numDocs = 60, numEvents = 600, seed = 19, deleteRatio = 0.3, withMetadata = false)
    val root = SparkTestBase.tempDir("icelite-compact")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    table.merge(ChangeGen.events(spark, cfg), "s/0")
    val tombsBefore = table.snapshot.files.map(_.tombstones).sum
    assert(tombsBefore > 0)
    val state = tableState(table)
    table.compactTombstones(lsnWatermark = Long.MaxValue)
    assert(table.snapshot.files.map(_.tombstones).sum == 0)
    assert(tableState(table) == state)
  }

  test("merge-on-read replay matches the oracle fold with token-array equality") {
    val cfg = GenConfig(numDocs = 300, numEvents = 5000, seed = 7, withMetadata = false)
    val root = SparkTestBase.tempDir("icelite-mor")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id",
      numBuckets = 8, properties = Map("write.mode" -> "mor", "mor.compact.threshold" -> "4"))

    val events = ChangeGen.events(spark, cfg)
    Pipeline.replayBatch(spark, events, table, "t1", epochs = 5, lsnMax = cfg.numEvents)

    val expected = collectOracle(cfg)
    val actual = tableState(table)
    assert(actual.keySet == expected.keySet)
    expected.foreach { case (k, (toks, n, src)) =>
      val (aToks, aN, aSrc) = actual(k)
      assert(aToks == toks, s"token mismatch for $k")
      assert(aN == n && aSrc == src)
    }
    // delta writes: merges never rewrite files (compaction does)
    assert(table.snapshot.files.nonEmpty)

    // exactly-once in MOR: re-delivering an epoch appends nothing
    val v = table.snapshot.version
    val state = tableState(table)
    table.merge(events.limit(100), "t1/0")
    assert(table.snapshot.version == v && tableState(table) == state)

    // full compaction preserves state and drops resolved tombstones
    table.compactBuckets(table.snapshot.files.map(_.bucket).toSet, lsnWatermark = Long.MaxValue)
    assert(tableState(table) == state)
    assert(table.snapshot.files.map(_.tombstones).sum == 0)
    // post-compaction each bucket holds exactly its resolved rows
    assert(table.snapshot.files.groupBy(_.bucket).forall(_._2.size <= 2))
  }

  test("merge-on-read out-of-order replay is out-ranked at read") {
    val cfg = GenConfig(numDocs = 60, numEvents = 800, seed = 17, withMetadata = false)
    val root = SparkTestBase.tempDir("icelite-mor-stale")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id",
      numBuckets = 4, properties = Map("write.mode" -> "mor"))
    table.merge(ChangeGen.events(spark, cfg), "s/0")
    val state1 = tableState(table)
    table.merge(ChangeGen.events(spark, cfg.copy(numEvents = 100)), "s/1")
    assert(tableState(table) == state1) // older lsn rows lose the read-side argmax
  }

  test("time travel reads older snapshot") {
    val root = SparkTestBase.tempDir("icelite-tt")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    val cfg = GenConfig(numDocs = 30, numEvents = 200, seed = 9, withMetadata = false)
    table.merge(ChangeGen.events(spark, cfg), "s/0")
    val v1Count = table.read().count()
    table.merge(ChangeGen.events(spark, cfg.copy(startLsn = 200, numEvents = 200)), "s/1")
    assert(table.readVersion(1).count() == v1Count)
    assert(table.snapshot.lineage("applied.epochs") == 2L)
  }

  test("rollback reverts state AND the epoch ledger; history stays readable") {
    val root = SparkTestBase.tempDir("icelite-rollback")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    val cfg = GenConfig(numDocs = 30, numEvents = 200, seed = 31, withMetadata = false)
    table.merge(ChangeGen.events(spark, cfg), "s/0")
    val goodState = tableState(table)
    val goodVersion = table.snapshot.version
    val bad = ChangeGen.events(spark, cfg.copy(startLsn = 200, numEvents = 200))
    table.merge(bad, "s/1")
    assert(tableState(table) != goodState)
    // rollback = NEW version with the old content (append-only history)
    val newV = table.rollbackTo(goodVersion)
    assert(newV == table.snapshot.version && newV > goodVersion + 1)
    assert(tableState(table) == goodState)
    assert(table.snapshot.lineage("rollback.to") == goodVersion)
    // the undone version is still time-travel readable
    assert(table.readVersion(newV - 1).count() > 0)
    // the rolled-back epoch is REPLAYABLE again (ledger reverted) and
    // re-merging it reproduces the pre-rollback state exactly
    assert(!table.isEpochCommitted("s/1"))
    table.merge(bad, "s/1")
    assert(tableState(table) == tableState2(table.readVersion(newV - 1)))
    // a rollback to a non-past version is rejected
    intercept[IllegalArgumentException] { table.rollbackTo(table.snapshot.version) }
    // metadata tables reflect the history and the live files
    val h = table.history.collect().map(r => r.getLong(0) -> r).toMap
    assert(h.size == table.snapshot.version + 1)
    assert(h(newV).getLong(7) == goodVersion) // rollback_to recorded
    assert(h(table.snapshot.version).getLong(1) == newV) // parent chain
    val files = table.filesMeta.collect()
    assert(files.nonEmpty && files.map(_.getLong(2)).sum == table.readInternal().count())
  }

  test("vacuum removes unreferenced files and keeps readable state") {
    val cfg = GenConfig(numDocs = 40, numEvents = 400, seed = 23, withMetadata = false)
    val root = SparkTestBase.tempDir("icelite-vacuum")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    table.merge(ChangeGen.events(spark, cfg), "s/0")
    table.merge(ChangeGen.events(spark, cfg.copy(startLsn = 400, numEvents = 400)), "s/1")
    val state = tableState(table)
    val removed = table.vacuum(keepSnapshots = 1)
    assert(removed > 0) // v1's rewritten files are unreferenced by v2
    assert(tableState(table) == state) // current snapshot fully readable
  }

  test("loading a missing table fails clearly") {
    val t = IceLite.load(spark, SparkTestBase.tempDir("not-a-table"))
    intercept[IllegalStateException] { t.snapshot }
  }

  test("empty and all-stale batches commit only the epoch marker") {
    val cfg = GenConfig(numDocs = 40, numEvents = 400, seed = 13, withMetadata = false)
    val root = SparkTestBase.tempDir("icelite-noop")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    val batch = ChangeGen.events(spark, cfg).select(col("doc_id"), col("op"), col("lsn"), col("after"))
    table.merge(batch, "e0")
    val snap1 = table.snapshot
    val state = tableState(table)

    // empty batch: version bumps, epoch recorded, data files untouched
    val s0 = table.merge(batch.filter(lit(false)), "e-empty")
    assert(s0.inserted == 0 && s0.deleted == 0)
    val snap2 = table.snapshot
    assert(snap2.version == snap1.version + 1)
    assert(snap2.committedEpochs.contains("e-empty"))
    assert(snap2.files.map(_.path) == snap1.files.map(_.path))

    // all-stale batch (lsn below every stored row): marker-only commit too
    val stale = batch.filter(col("op") =!= "d").withColumn("lsn", col("lsn") - 10000L)
    val s1 = table.merge(stale, "e-stale")
    assert(s1.inserted == 0 && s1.updated == 0 && s1.deleted == 0 && s1.stale > 0)
    assert(table.snapshot.files.map(_.path) == snap1.files.map(_.path))
    assert(tableState(table) == state)

    // the abandoned no-op rewrites were deleted immediately: nothing on disk
    // is unreferenced (vacuum finds no orphans)
    assert(table.vacuum(keepSnapshots = 100) == 0)

    // a no-op epoch that CARRIES additive schema evolution still commits the
    // evolved schema (metadata-only): the exactly-once ledger would otherwise
    // silently drop the evolution forever
    val evolvedStale = stale.withColumn("after", struct(
      col("after.doc_id"), col("after.tokens"), col("after.n_tok"), col("after.source"),
      lit("x").as("evolved_col")))
    table.merge(evolvedStale, "e-stale-evolve")
    assert(table.snapshot.schema.fieldNames.contains("evolved_col"))
    assert(table.read().select("evolved_col").collect().forall(_.isNullAt(0)))
  }

  test("a caller's session confs survive a merge (scoped overrides)") {
    val spark2 = spark
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val coPart = "spark.sql.requireAllClusterKeysForCoPartition"
    val priorCoPart = spark2.conf.get(coPart)
    spark2.conf.set(key, "777")
    try {
      val cfg = GenConfig(numDocs = 30, numEvents = 200, seed = 31, withMetadata = false)
      val root = SparkTestBase.tempDir("icelite-confscope")
      val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
      table.merge(ChangeGen.events(spark, cfg), "s/0")
      assert(spark2.conf.get(key) == "777", "merge leaked its fallbackThreshold override")
      assert(spark2.conf.get(coPart) == priorCoPart, "merge leaked requireAllClusterKeysForCoPartition")
    } finally spark2.conf.unset(key)
  }

  test("generator is deterministic and skewed") {
    val cfg = GenConfig(numDocs = 100, numEvents = 1000, seed = 42)
    val a = ChangeGen.events(spark, cfg).select("doc_id", "lsn", "metadata").collect().map(_.toString).sorted
    val b = ChangeGen.events(spark, cfg).select("doc_id", "lsn", "metadata").collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // skew: the top doc receives far more than 1/numDocs of events
    val counts = ChangeGen.events(spark, cfg).groupBy("doc_id").count()
      .orderBy(col("count").desc).limit(1).collect()
    assert(counts(0).getLong(1) > 3 * (cfg.numEvents / cfg.numDocs))
  }
}
