package graft.stream

import graft.smt.JsonDeserialize
import graft.table.IceLiteTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

/**
 * The CDC ingest pipeline: change-event source -> composable SMT chain ->
 * exactly-once MERGE into an IceLite table.
 *
 * This is the engine-side equivalent of the reference's deployment
 * (`doc/outbox.md:16-27`): Kafka Connect's source/worker/sink machinery is
 * replaced by Structured Streaming (checkpointed offsets), the SMT chain by
 * `DataFrame => DataFrame` stages, and the Kafka producer by the IceLite
 * MERGE sink. Exactly-once = Spark's at-least-once foreachBatch + the
 * table's idempotent (streamId, epochId) commit ledger.
 *
 * Schema-registry state (the reference's JVM-local known-schema map,
 * `smt/DebeziumJsonDeserializer.java:56` — lost on restart there) is
 * persisted into every table snapshot and re-seeded on resume.
 */
/** Ingest-time duplicate suppression for [[Pipeline.runFileStream]]: each
  * batch's LWW-winning token sequences are probed against a persisted
  * MinHash index ([[graft.ops.Dedup.buildMinhashIndex]] layout); events
  * whose content near-duplicates an already-accepted document are dropped
  * before the MERGE, and survivors' signatures are appended under a
  * per-epoch index segment (idempotently rewritten on batch redelivery, so
  * the dedup decision — like the table commit — is exactly-once).
  *
  * Rules: the probed content is the doc's LAST non-delete event in the
  * batch (the only version LWW would keep); a duplicate verdict drops ALL
  * of that doc's non-delete events in the batch; deletes always pass. A
  * doc updating its own content never matches itself (self-exclusion), so
  * routine updates flow; an update that morphs a doc into a near-copy of
  * another accepted doc is suppressed. Parameters must match the index
  * build. */
case class DedupIngest(
    indexPath: String,
    threshold: Double = 0.5,
    numHashes: Int = 64,
    bands: Int = 16,
    shingleWidth: Int = 3,
    hashKernel: String = "xx",
    nPartitions: Int = 64,
    maxBucket: Int = 100000)

object Pipeline {

  /** Run the pipeline over a file-tailed event stream until exhausted
    * (AvailableNow), resumable from `checkpointDir`. Stages run inside
    * foreachBatch (batch-level stages like JsonDeserialize need actions). */
  def runFileStream(
      spark: SparkSession,
      sourceDir: String,
      table: IceLiteTable,
      checkpointDir: String,
      streamId: String,
      stages: Seq[DataFrame => DataFrame] = Nil,
      maxFilesPerTrigger: Int = 1,
      dedupIngest: Option[DedupIngest] = None,
      dlqDir: Option[String] = None): StreamingQuery = {
    // Restore registry state from the table's last snapshot.
    val registryJson = table.snapshot.registryJson
    if (registryJson != null && registryJson.nonEmpty) {
      stages.collect { case j: JsonDeserialize =>
        val restored = graft.schema.SchemaRegistry.deserialize(registryJson, j.registry.optionalStructFields)
        restored.entries.foreach { case (k, schemas) =>
          val Array(topic, field) = k.split("\\|", 2)
          j.registry.seed(topic, field, schemas)
        }
      }
    }

    val eventSchema = ChangeGen.events(spark, GenConfig(numEvents = 1)).schema
    val source = spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      // Per-batch source metrics, surfaced through StreamingQueryProgress
      // (observedMetrics) for listeners — the engine's lineage counters.
      .observe("graft_source",
        count(lit(1)).as("events"),
        count(when(col("op") === "c", 1)).as("inserts"),
        count(when(col("op") === "u", 1)).as("updates"),
        count(when(col("op") === "d", 1)).as("deletes"),
        max(col("lsn")).as("max_lsn"))
    val autoCompact = spark.conf.getOption(TombstoneCompactConf).isDefined
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        // Batch-level stages (schema inference) scan the batch before the
        // merge does; cache so the source — and its observe() metrics —
        // materialize exactly once per batch. (Auto tombstone compaction
        // also re-reads the batch for its lsn watermark.)
        val needCache = stages.nonEmpty || autoCompact || dlqDir.isDefined
        val base = if (needCache) batch.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY) else batch
        try {
          // Deserialization errors route BEFORE the stages run (the
          // converter half of errors.tolerance=all): rows whose JSON payload
          // can't parse leave for the DLQ instead of being silently nulled
          // (lenient) or failing the epoch (strict). Per-column epoch keys
          // keep each publish independently marker-idempotent.
          val (preStaged, parseRouted) = (dlqDir, stages.collectFirst { case j: JsonDeserialize => j }) match {
            case (Some(dir), Some(j)) =>
              j.cfg.columns.foldLeft((base, 0L)) { case ((df, acc), c) =>
                val (clean, n) = Dlq.splitJson(df, c, table.snapshot.keyColumn,
                  dir, s"${streamId}_${epochId}_json_$c")
                (clean, acc + n)
              }
            case _ => (base, 0L)
          }
          val staged = stages.foldLeft(preStaged)((df, stage) => stage(df))
          // DLQ next: contract-violating rows must not reach the content
          // dedup (a null key would pollute its per-doc grouping) or the
          // merge. Routing is marker-idempotent per epoch.
          val (transformed0, contractRouted) = dlqDir match {
            case None => (staged, 0L)
            case Some(dir) => Dlq.split(staged, table.snapshot.keyColumn, dir, s"${streamId}_$epochId")
          }
          val dlqRouted = contractRouted + parseRouted
          val (transformed, suppressed) = dedupIngest match {
            case None => (transformed0, 0L)
            case Some(di) => applyDedupIngest(transformed0, di, s"${streamId}_$epochId")
          }
          val registrySnapshot = stages.collectFirst { case j: JsonDeserialize => j.registry.serialize }
          // suppression counts ride the SAME atomic commit as the data —
          // a redelivered epoch is a ledger no-op, so they never double-count
          val extra = (if (dedupIngest.isDefined) Map("dedup.suppressed" -> suppressed) else Map.empty[String, Long]) ++
            (if (dlqDir.isDefined) Map("dlq.routed" -> dlqRouted) else Map.empty[String, Long])
          table.merge(transformed, s"$streamId/$epochId", registrySnapshot, extra): Unit
          if (autoCompact) {
            // The file-tailed source delivers chunks in lsn order, so this
            // batch's max lsn is the stream's low-water mark: nothing at or
            // below it can still arrive.
            val wmRow = base.agg(max(col("lsn"))).head()
            if (!wmRow.isNullAt(0)) maybeCompactTombstones(spark, table, wmRow.getLong(0) + 1)
          }
          maybeExpireSnapshots(spark, table, epochId)
          maybeCompactSmallFiles(spark, table, epochId)
        } finally if (needCache) { base.unpersist(): Unit }
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** See [[DedupIngest]]. Probes one content per doc (its LWW winner in
    * this batch — several versions of one doc would otherwise race the
    * candidate dedup nondeterministically), drops every non-delete event of
    * duplicate docs, and lets the index append ride the epoch segment for
    * redelivery idempotence. */
  private[stream] def applyDedupIngest(batch: DataFrame, di: DedupIngest, segKey: String): (DataFrame, Long) = {
    val latest = batch
      .filter(col("op") =!= "d" && col("after.tokens").isNotNull)
      .groupBy(col("doc_id"))
      .agg(max_by(array_join(col("after.tokens"), " "), col("lsn")).as("__text"))
    val dupes = graft.ops.Dedup.dedupAgainstIndex(latest, di.indexPath, "doc_id", "__text",
      di.numHashes, di.bands, di.shingleWidth, di.threshold, di.hashKernel,
      di.nPartitions, appendSurvivors = true, di.maxBucket,
      segment = Some(segKey.replaceAll("[^A-Za-z0-9_.-]", "_")))
    val nDup = dupes.count() // dupes is already materialized (checkpointed)
    if (nDup > 0)
      System.err.println(s"[pipeline] dedup-ingest $segKey: suppressed $nDup duplicate doc(s)")
    val kept = batch
      .join(dupes.select(col("id").as("doc_id"), lit(true).as("__dup")), Seq("doc_id"), "left")
      .filter(col("op") === "d" || col("__dup").isNull)
      .drop("__dup")
    (kept, nDup)
  }

  /** Table property recording the source position an initial-snapshot
    * bootstrap was consistent at: the binlog tail must start STRICTLY after
    * it. Written by [[bootstrap]] in its final metadata commit. */
  val BootstrapWatermarkProp = "bootstrap.watermark"

  /** Source position the table was bootstrapped at, if it was. */
  def bootstrapWatermark(table: IceLiteTable): Option[Long] =
    table.snapshot.properties.get(BootstrapWatermarkProp).map(_.toLong)

  /** Debezium-style INITIAL-SNAPSHOT bootstrap — the "consistent dump, then
    * stream" handoff every CDC deployment starts with: load `state` (a full
    * dump of the source table, consistent at source position
    * `watermarkLsn`) into the IceLite table; the binlog tail then starts
    * STRICTLY after `watermarkLsn`.
    *
    * Mechanics:
    *  - dump rows become op = "r" (Debezium's snapshot-read op) change
    *    events at lsn = `watermarkLsn` and flow through the normal MERGE
    *    path — no special write mode, every table invariant (ledger, stats,
    *    manifests, bloom, MOR/patch fold) holds;
    *  - the dump splits into `chunks` DISJOINT epochs by the table's own
    *    bucket function (each bucket label belongs wholly to one chunk), so
    *    a crashed bootstrap resumes by simply re-running it: committed
    *    chunks are exact ledger no-ops, and bucket-disjointness means a
    *    resumed chunk never rewrites a finished chunk's files — chunks can
    *    even commit from CONCURRENT writers (disjoint-bucket rebase);
    *  - `watermarkLsn` persists as table property `bootstrap.watermark`
    *    (metadata-only commit, skipped when already recorded), so a
    *    restarted tail re-reads its start position from the table itself.
    *
    * Handoff contract: events with lsn <= watermark are already reflected
    * in the dump and must not be re-delivered — a key DELETED before the
    * watermark has no row (a dump carries no tombstones), so a replayed
    * pre-watermark insert of it would resurrect. For keys present in the
    * dump the per-row __lsn guard additionally absorbs any accidental
    * overlap (a re-sent lsn <= W change loses to the dump row's lsn = W).
    *
    * 10^10 posture: the dump is the one-time O(table) cost; each chunk is a
    * bucket-disjoint merge into empty buckets (no files to read or rewrite
    * — pure bucketed writes), so bootstrap cost is a single pass over the
    * dump, parallelizable across writers. */
  def bootstrap(
      spark: SparkSession,
      state: DataFrame,
      table: IceLiteTable,
      watermarkLsn: Long,
      chunks: Int = 8,
      streamId: String = "bootstrap"): Unit = {
    require(chunks >= 1, s"bootstrap: chunks must be >= 1, got $chunks")
    val snap = table.snapshot
    val key = snap.keyColumn
    val payload = snap.schema
    // cast target must be DEEPLY nullable (fields and array elements): the
    // dump columns' nullability is whatever the caller's plan derived, and
    // Cast refuses nullable -> NOT NULL (the merge re-asserts the contract)
    import org.apache.spark.sql.types.{ArrayType, DataType, StructType}
    def deepNullable(dt: DataType): DataType = dt match {
      case st: StructType => StructType(st.fields.map(f =>
        f.copy(dataType = deepNullable(f.dataType), nullable = true)))
      case at: ArrayType => ArrayType(deepNullable(at.elementType), containsNull = true)
      case other => other
    }
    val nullablePayload = deepNullable(payload).asInstanceOf[StructType]
    val events = state.select(
      col(key).cast(org.apache.spark.sql.types.StringType).as(key),
      lit("r").as("op"),
      lit(watermarkLsn).as("lsn"),
      struct(payload.fieldNames.map(col).toIndexedSeq: _*).cast(nullablePayload).as("after"))
    (0 until chunks).foreach { i =>
      val epochKey = s"$streamId/$i"
      if (!table.isEpochCommitted(epochKey)) {
        val chunk =
          if (chunks == 1) events
          else events.filter(pmod(
            graft.hashing.KafkaMurmur2.bucketLabel(col(key), snap.numBuckets),
            lit(chunks)) === i)
        table.merge(chunk, epochKey): Unit
      }
    }
    if (!bootstrapWatermark(table).contains(watermarkLsn))
      table.alterProperties(Map(BootstrapWatermarkProp -> watermarkLsn.toString)): Unit
  }

  /** Batch replay: apply the event stream to the table in `epochs` ordered
    * chunks by lsn — the bench path (same merge code, no streaming harness). */
  def replayBatch(
      spark: SparkSession,
      events: DataFrame,
      table: IceLiteTable,
      streamId: String,
      epochs: Int,
      lsnMax: Long,
      stages: Seq[DataFrame => DataFrame] = Nil): Unit = {
    val per = math.max(1L, (lsnMax + epochs - 1) / epochs)
    (0 until epochs).foreach { e =>
      val lo = e * per
      val hi = math.min(lsnMax, (e + 1) * per)
      val chunk = events.filter(col("lsn") >= lo && col("lsn") < hi)
      val transformed = stages.foldLeft(chunk)((df, stage) => stage(df))
      val registrySnapshot = stages.collectFirst { case j: JsonDeserialize => j.registry.serialize }
      table.merge(transformed, s"$streamId/$e", registrySnapshot)
      // epochs are lsn-ordered by construction: `hi` is the low-water mark
      maybeCompactTombstones(spark, table, hi)
      maybeExpireSnapshots(spark, table, e.toLong)
      maybeCompactSmallFiles(spark, table, e.toLong)
    }
  }

  /** Conf key enabling opportunistic tombstone reclamation: when at least
    * this many files carry tombstones AND the stream's low-water mark (the
    * lsn below which no change can still arrive — epoch upper bound in the
    * replay paths, last batch's max lsn for the lsn-ordered file source)
    * has passed them, `compactTombstones` runs right after the commit.
    * Opt-in, like Iceberg/Hudi compaction policies: rewriting tombstoned
    * files competes with ingest for I/O, so the threshold is a deployment
    * decision. */
  val TombstoneCompactConf = "graft.merge.tombstoneCompact.minFiles"

  private[graft] def maybeCompactTombstones(spark: SparkSession, table: IceLiteTable,
                                            watermark: Long): Unit =
    spark.conf.getOption(TombstoneCompactConf).map(_.toInt).foreach { minFiles =>
      val tombFiles = table.snapshot.files.count(_.tombstones > 0)
      if (tombFiles >= minFiles) table.compactTombstones(watermark): Unit
    }

  /** Conf keys enabling in-pipeline METADATA maintenance: without it a
    * long-running ingest leaves one version file per micro-batch forever
    * (a year of 10 s epochs = ~3M v{N}.json, plus every data file and
    * manifest shard they pin). When `keepSnapshots` is set, every
    * `everyEpochs`-th epoch (default 64) runs `expireSnapshots(keep)` +
    * `vacuum(keep, graceMs)` right after the commit. Opt-in like tombstone
    * compaction — reclamation revokes time travel past the horizon, a
    * deployment decision. `graceMs` (default 1h) protects concurrent
    * writers' in-flight files exactly as in [[IceLiteTable.vacuum]]. */
  val ExpireKeepConf = "graft.table.expire.keepSnapshots"
  val ExpireEveryConf = "graft.table.expire.everyEpochs"
  val VacuumGraceConf = "graft.table.vacuum.graceMs"

  /** Conf key enabling in-pipeline small-file compaction: every
    * `everyEpochs`-th epoch runs [[IceLiteTable.compactSmallFiles]] (bucket
    * bin-packing) right after the commit. Opt-in like the other maintenance
    * cadences — the rewrite competes with ingest for I/O. */
  val CompactSmallEveryConf = "graft.table.compactSmall.everyEpochs"

  private[graft] def maybeCompactSmallFiles(spark: SparkSession, table: IceLiteTable,
                                            epochId: Long): Unit =
    spark.conf.getOption(CompactSmallEveryConf).map(_.toLong).foreach { every =>
      if (every > 0 && epochId > 0 && epochId % every == 0)
        table.compactSmallFiles(): Unit
    }

  private[graft] def maybeExpireSnapshots(spark: SparkSession, table: IceLiteTable,
                                          epochId: Long): Unit =
    spark.conf.getOption(ExpireKeepConf).map(_.toInt).foreach { keep =>
      val every = spark.conf.getOption(ExpireEveryConf).map(_.toLong).getOrElse(64L)
      if (epochId % every == every - 1) {
        table.expireSnapshots(keep): Unit
        val grace = spark.conf.getOption(VacuumGraceConf).map(_.toLong).getOrElse(3600000L)
        table.vacuum(keep, grace): Unit
      }
    }

  /** Generator-driven replay: like [[replayBatch]], but each epoch's slice is
    * GENERATED at full width (`cfg.copy(startLsn, numEvents)`) instead of
    * lsn-filtered out of one pre-partitioned frame. `spark.range` partitions
    * the lsn space contiguously, so filtering an E-epoch slice leaves only
    * width/E populated map tasks — halving (E=2) the generation/shuffle-write
    * stage's parallelism at every width. Every ChangeGen column is a pure
    * function of (seed, lsn), so the sliced stream is event-identical. */
  def replayGen(
      spark: SparkSession,
      cfg: GenConfig,
      table: IceLiteTable,
      streamId: String,
      epochs: Int,
      stages: Seq[DataFrame => DataFrame] = Nil,
      // Measured on this host: pipelining LOSES ~2x at widths 8 and 32 — the
      // cache materialization breaks the dedup-agg/merge-join stage fusion
      // (winners get an extra write+read) and the job is memory-bandwidth
      // bound, so overlapping two epochs adds traffic without adding idle
      // cores to fill. Kept behind an opt-in flag for cluster topologies
      // where reducer slots actually sit idle between epochs.
      lookahead: Boolean = sys.env.get("SPARK_GRAFT_LOOKAHEAD").contains("true")): Unit =
    // The replay pipelines dedupe across epochs, so the merge-tuned session
    // confs must stay set between merges; restore them once at the end.
    graft.merge.MergeInto.withMergeConfs(spark) {
      replayGenInner(spark, cfg, table, streamId, epochs, stages, lookahead)
    }

  private def replayGenInner(
      spark: SparkSession,
      cfg: GenConfig,
      table: IceLiteTable,
      streamId: String,
      epochs: Int,
      stages: Seq[DataFrame => DataFrame],
      lookahead: Boolean): Unit = {
    val per = math.max(1L, (cfg.numEvents + epochs - 1) / epochs)
    def slice(e: Int): Option[DataFrame] = {
      val lo = e * per
      val n = math.min(cfg.numEvents - lo, per)
      if (n <= 0) None
      else Some(ChangeGen.events(spark, cfg.copy(startLsn = cfg.startLsn + lo, numEvents = n)))
    }

    def epochWatermark(e: Int): Long =
      cfg.startLsn + math.min(cfg.numEvents, (e + 1).toLong * per)

    if (stages.nonEmpty || !lookahead) {
      (0 until epochs).foreach { e =>
        slice(e).foreach { chunk =>
          val transformed = stages.foldLeft(chunk)((df, stage) => stage(df))
          val registrySnapshot = stages.collectFirst { case j: JsonDeserialize => j.registry.serialize }
          table.merge(transformed, s"$streamId/$e", registrySnapshot): Unit
          maybeCompactTombstones(spark, table, epochWatermark(e))
          maybeExpireSnapshots(spark, table, e.toLong)
        }
      }
    } else {
      // Micro-batch pipelining: epoch N+1's dedup (generate -> shuffle ->
      // LWW winners, no table-state dependency) materializes to cache on a
      // background thread WHILE epoch N's merge join + write + commit runs.
      // The scheduler interleaves the two jobs' tasks, filling the cores a
      // single epoch's barriers leave idle. Winners (<= distinct keys) are
      // ~10x smaller than the raw batch, so the cache materialization is
      // cheap relative to the overlap it buys.
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val snap0 = table.snapshot
      val (key, nBuckets) = (snap0.keyColumn, snap0.numBuckets)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val level = org.apache.spark.storage.StorageLevel.fromString(
        spark.conf.getOption("graft.merge.dedupStorageLevel").getOrElse("DISK_ONLY"))
      def dedupAsync(e: Int): Future[Option[(DataFrame, DataFrame)]] = Future {
        slice(e).map { chunk =>
          val d = graft.merge.MergeInto.dedupe(chunk, key, nBuckets).persist(level)
          d.count(): Unit // materialize now, overlapping the previous merge
          (chunk, d)
        }
      }
      try {
        var cur = Await.result(dedupAsync(0), Duration.Inf)
        (0 until epochs).foreach { e =>
          val nextF =
            if (e + 1 < epochs) dedupAsync(e + 1)
            else Future.successful(None)
          cur.foreach { case (chunk, deduped) =>
            graft.merge.MergeInto.run(table, chunk, s"$streamId/$e",
              registryJson = None, preDeduped = Some(deduped)): Unit
            deduped.unpersist(blocking = false): Unit
            maybeCompactTombstones(spark, table, epochWatermark(e))
          }
          cur = Await.result(nextF, Duration.Inf)
        }
      } finally pool.shutdown()
    }
  }

  /** Collects per-batch observed metrics + progress for the pipeline —
    * the engine's surface for the reference's per-record logging context
    * (`utils/LoggingContext.java`), aggregated to batch granularity. */
  final class MetricsListener extends StreamingQueryListener {
    import scala.collection.mutable
    val batches: mutable.Buffer[Map[String, Long]] = mutable.Buffer.empty
    private val seen = mutable.Set.empty[(java.util.UUID, Long)]

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val om = e.progress.observedMetrics
      if (om != null && om.containsKey("graft_source")) {
        val r = om.get("graft_source")
        batches.synchronized {
          // progress for a batch can be re-reported (e.g. final AvailableNow
          // progress); count each (run, batch) once
          if (seen.add((e.progress.runId, e.progress.batchId))) {
            batches += Map(
              "batchId" -> e.progress.batchId,
              "events" -> r.getAs[Long]("events"),
              "inserts" -> r.getAs[Long]("inserts"),
              "updates" -> r.getAs[Long]("updates"),
              "deletes" -> r.getAs[Long]("deletes"))
          }
        }
      }
    }
  }

  def attachMetricsListener(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.streams.addListener(l)
    l
  }
}
