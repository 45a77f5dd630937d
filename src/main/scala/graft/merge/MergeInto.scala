package graft.merge

import graft.hashing.KafkaMurmur2
import graft.table.{CommitStats, DataFileMeta, IceLiteTable, Snapshot}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, IntegerType, LongType, MapType, ShortType, StructField, StructType}
import org.apache.spark.storage.StorageLevel
import java.util.UUID

/**
 * Key-partitioned MERGE-INTO upsert against an IceLite table — the engine's
 * generalization of the reference's per-record tombstone/delete semantics
 * (`smt/Outbox.java:79-97`: null value / `__deleted == "true"` => delete,
 * otherwise upsert the payload) into a set-at-a-time, copy-on-write merge.
 *
 * Change-batch contract (Debezium-shaped, see `graft.stream.ChangeGen`):
 *   key column (table.keyColumn) : string, never null
 *   op                           : "c" | "u" | "r" (upsert) | "d" (delete)
 *   lsn                          : long, total order per key (last write wins)
 *   after                        : struct of payload columns; null iff op = "d"
 *
 * Scale posture (10^10-event shape):
 *  - intra-batch last-write-wins via groupBy(key).max_by(lsn): Spark's
 *    partial aggregation collapses hot keys map-side before the shuffle —
 *    the skew-salting effect without explicit salts; AQE skew-join handles
 *    residual skew in the merge join;
 *  - file pruning: only files whose (bucket, key-range) intersects the
 *    deduped change keys are read and rewritten — O(changed files);
 *  - exactly-once: the caller passes an epoch key; re-delivery is a no-op.
 */
object MergeInto {

  private val BUCKET = "__bucket"
  private val ACTION = "__action"
  /** Per-row high-water mark persisted in the table: the LSN of the change
    * that produced the row. A matched change with a smaller LSN is stale
    * (out-of-order replay / duplicated source segment) and is ignored,
    * making merges safe under cross-batch reordering, not just under the
    * epoch ledger. */
  val LSN = "__lsn"
  /** Deletes persist as tombstone rows (payload nulls, __deleted = true)
    * rather than physically vanishing, so a late out-of-order update cannot
    * resurrect a deleted key — the tombstone's LSN stale-guards it. Readers
    * filter tombstones; `compactTombstones` reclaims them once the stream's
    * low-water mark passes their LSN. */
  val DELETED = "__deleted"
  /** Patch tables only (`write.merge.fold = patch`): the max delete-LSN a
    * stored MOR delta row already absorbed when its batch was folded. The
    * read-time patch resolve feeds it back into [[PatchFoldAgg]] so column
    * values from OLDER deltas never leak past a mid-batch delete. COW
    * tables never need it (the delete is applied at merge time); files
    * without the column read as null. */
  val RESET = "__reset"

  /** Physical file schema for a user-facing payload schema. */
  def dataSchemaOf(payload: StructType): StructType = dataSchemaOf(payload, patch = false)

  def dataSchemaOf(payload: StructType, patch: Boolean): StructType =
    StructType(payload.fields ++ Seq(
      StructField(LSN, org.apache.spark.sql.types.LongType, nullable = false),
      StructField(DELETED, org.apache.spark.sql.types.BooleanType, nullable = false)) ++
      (if (patch) Seq(StructField(RESET, org.apache.spark.sql.types.LongType, nullable = true))
       else Nil))

  /** Public dedup kernel for callers that pipeline epochs: materializing
    * epoch N+1's winner set (cache + count) while epoch N's merge/write runs
    * overlaps the two epochs' work — the micro-batch pipelining a streaming
    * engine does. Pass the result to [[run]] as `preDeduped`. */
  def dedupe(changes: DataFrame, key: String, nBuckets: Int): DataFrame =
    dedupeBatch(changes, key, nBuckets)

  /** The session confs the merge tunes for its own jobs. [[run]] saves and
    * restores them, so a caller's settings survive a merge; [[dedupe]] (the
    * caller-pipelined kernel) sets them WITHOUT restoring because its result
    * executes after it returns — callers that pipeline epochs should wrap
    * the whole replay in [[withMergeConfs]] (as [[graft.stream.Pipeline]]
    * does). */
  private val MergeConfKeys = Seq(
    "spark.sql.requireAllClusterKeysForCoPartition",
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold")

  /** Run `body` and restore the merge-tuned session confs afterwards. */
  def withMergeConfs[T](spark: SparkSession)(body: => T): T = {
    val prior = MergeConfKeys.map(k => k -> spark.conf.getOption(k))
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Thrown by the commit step when a concurrent writer's commit overlapped
    * this merge's buckets (or evolved schema divergently): the manifest-only
    * rebase is impossible and the merge must recompute against the new
    * snapshot. Internal control flow — [[run]] retries. */
  private final class RebaseOverlap extends RuntimeException("merge rebase overlap")

  def run(table: IceLiteTable, changes: DataFrame, epochKey: String,
          registryJson: Option[String] = None,
          preDeduped: Option[DataFrame] = None,
          extraLineage: Map[String, Long] = Map.empty,
          commitFn: Option[(Snapshot, Snapshot) => graft.table.CommitOutcome] = None): CommitStats =
    withMergeConfs(table.spark) {
      // Concurrent-writer loop: a same-bucket conflict recomputes the merge
      // against the fresh snapshot (disjoint-bucket and same-epoch races are
      // absorbed inside commitRebasing without recompute). Each retry
      // re-reads the snapshot at runInner entry, so progress is guaranteed
      // as long as the competing writer stream is finite; the bound guards
      // against a pathological livelock.
      var attempt = 0
      while (true) {
        try return runInner(table, changes, epochKey, registryJson, preDeduped, extraLineage, commitFn)
        catch {
          case _: RebaseOverlap if attempt < 5 =>
            attempt += 1
            // the pre-deduped winner set was computed against the stale
            // snapshot's bucket layout only if nBuckets changed (it cannot);
            // it remains valid — but runInner unpersisted a non-caller-owned
            // cache, so only caller-owned pipelining survives a retry.
        }
      }
      throw new IllegalStateException("unreachable")
    }

  private def runInner(table: IceLiteTable, changes: DataFrame, epochKey: String,
                       registryJson: Option[String],
                       preDeduped: Option[DataFrame],
                       extraLineage: Map[String, Long],
                       commitFn: Option[(Snapshot, Snapshot) => graft.table.CommitOutcome] = None): CommitStats = {
    // commitFn overrides how the candidate snapshot lands: the default is
    // the rebasing chain commit; mergeStaged parks it as a staged snapshot
    // instead (write-audit-publish).
    val commitTo: (Snapshot, Snapshot) => graft.table.CommitOutcome =
      commitFn.getOrElse(table.commitRebasing(_, _))
    val snap = table.snapshot
    if (snap.epochCommitted(epochKey)) {
      // Re-delivered epoch (at-least-once upstream): exactly-once via no-op.
      return CommitStats(epochKey, 0, 0, 0, 0, 0, 0, 0)
    }
    val spark = table.spark
    val key = snap.keyColumn
    val nBuckets = snap.numBuckets
    val verbose = spark.conf.getOption("graft.merge.verboseTiming").contains("true") ||
      sys.env.get("SPARK_GRAFT_MERGE_VERBOSE").contains("true")
    var tMark = System.nanoTime()
    def mark(phase: String): Unit = if (verbose) {
      val now = System.nanoTime()
      System.err.println(f"[merge $epochKey] $phase: ${(now - tMark) / 1e9}%.2fs")
      tMark = now
    }

    // NOTE deliberately NO up-front emptiness job: a pre-check isEmpty scan
    // cost 0.3-0.9s of serial driver time per epoch (profiled — executeTake
    // over the batch's lsn-filtered empty prefix partitions). Emptiness is
    // instead detected post-hoc from the write job's observed action counts:
    // a no-op epoch commits only the marker and abandons any identically
    // rewritten files as vacuum-able orphans (bounded: no-op epochs only
    // reach the rewrite in no-prune mode, i.e. on young/small tables).

    // 1. Schema evolution (additive): table schema ∪ batch payload schema.
    val afterSchema = changes.schema("after").dataType.asInstanceOf[StructType]
    val newSchema = evolveSchema(snap.schema, afterSchema)
    val payloadCols = newSchema.fieldNames.toSeq
    // Patch tables fold partial updates column-wise (see [[PatchFoldAgg]]);
    // the caller-supplied preDeduped contract is LWW-shaped, so reject it.
    val patch = snap.fold == "patch"
    require(!(patch && preDeduped.isDefined),
      "preDeduped is a last-write-wins winner set; patch tables fold their own batches")
    // Physical file schema = payload + LSN high-water mark + tombstone flag
    // (+ the patch reset watermark on patch tables).
    val dataSchema = dataSchemaOf(newSchema, patch)
    // Rename-evolution bookkeeping: physical storage names for any columns
    // this batch adds (fresh names when a retired physical name collides).
    val newMapping = evolveMapping(snap, newSchema)

    if (snap.writeMode == "mor")
      return runMor(table, changes, epochKey, registryJson, snap, afterSchema, newSchema, mark,
        preDeduped, extraLineage, commitFn)

    // 2. Intra-batch dedup: last write per key by lsn, ONE ObjectHashAggregate
    // with map-side partial combine (see dedupeBatch). The winner set then
    // clusters by BUCKET; the COW merge join and the bucket-partitioned write
    // reuse that clustering (bucket = f(key), so HashPartitioning(bucket)
    // satisfies every (bucket, key, ...) clustering via the subset rule; the
    // co-partition knob below re-enables subset reuse for joins, which
    // Spark 3.3+ disables by default).
    // Deliberately NOT max_by(struct(...)): a complex DECLARATIVE aggregation
    // buffer forces SortAggregate (two full sorts of the batch); the typed
    // imperative LWW buffer keeps the hash-aggregate shape.
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    // preDeduped: caller already ran (and cached) the winner set — its cache
    // lifecycle belongs to the caller, so no persist/unpersist here.
    val callerOwned = preDeduped.isDefined
    val dedupedRaw = preDeduped.getOrElse(dedupeBatch(changes, key, nBuckets, snap.fold))

    // 3. Plan: which data files does this batch touch? Adaptive:
    //  - a young/compact table (few files per bucket) is near-fully touched
    //    by any broad batch — pruning would cost a full extra job + a cache
    //    of the deduped batch for zero skipped files; read everything and
    //    keep the epoch to ONE Spark job;
    //  - a mature table (files >> buckets, the 10^10 shape) prunes via a
    //    bucket equi-join + key-range condition against the broadcast
    //    manifest — O(changed keys), rewrites only intersecting files.
    val pruneMode = spark.conf.getOption("graft.merge.filePruning").getOrElse("auto")
    val doPrune = pruneMode match {
      case "always" => snap.files.nonEmpty
      case "never" => false
      case _ => snap.files.size > nBuckets * 2
    }
    val deduped =
      if (doPrune && !callerOwned) {
        val level = storageLevel(spark)
        if (level != StorageLevel.NONE) dedupedRaw.persist(level)
        dedupedRaw
      } else dedupedRaw

    try {
      val (affectedPaths, affectedFiles): (Set[String], Seq[DataFileMeta]) =
        if (!doPrune) (snap.files.map(_.path).toSet, snap.files)
        else {
          val filesDf = spark.createDataFrame(snap.files.map(f =>
            Row(f.path, f.bucket, f.minKey, f.maxKey, f.fullRange)).asJava2(spark),
            StructType(Seq(
              StructField("path", org.apache.spark.sql.types.StringType, nullable = false),
              StructField("bucket", org.apache.spark.sql.types.IntegerType, nullable = false),
              StructField("minKey", org.apache.spark.sql.types.StringType, nullable = false),
              StructField("maxKey", org.apache.spark.sql.types.StringType, nullable = false),
              StructField("fullRange", org.apache.spark.sql.types.BooleanType, nullable = false))))
          val paths = deduped.select(col(key), col(BUCKET))
            .join(broadcast(filesDf),
              col(BUCKET) === col("bucket") &&
                (col("fullRange") || (col(key) >= col("minKey") && col(key) <= col("maxKey"))))
            .select("path").distinct().collect().map(_.getString(0)).toSet
          (paths, snap.files.filter(f => paths.contains(f.path)))
        }
      mark("plan (dedup + file pruning)")

      // 4. COW merge: affected target rows FULL OUTER JOIN deduped changes.
      val target = table.readFiles(
          snap.copy(schemaJson = dataSchema.json, columnMapping = newMapping), affectedFiles)
        .withColumn(BUCKET, KafkaMurmur2.bucketLabel(col(key), nBuckets))
      val t = target.alias("t")
      // Join strategy for the COW merge is tunable: shuffled-hash avoids
      // sorting both inputs; sort-merge is more robust under tight memory.
      val useShj = spark.conf.getOption("graft.merge.shuffleHashJoin").forall(_ == "true")
      val c = (if (useShj) deduped.hint("shuffle_hash") else deduped).alias("c")
      // Equi-join on (bucket, key): bucket = f(key) adds nothing semantically
      // but lets the changes side reuse its bucket clustering (no re-shuffle;
      // only the affected target rows shuffle, aligned to the batch's
      // partitioning).
      val joined = t.join(c, t(BUCKET) === c(BUCKET) && t(key) === c(key), "full_outer")

      val isDelete = c("op") === "d"
      val matched = t(key).isNotNull && c(key).isNotNull
      // A matched change older than the stored row is stale: out-of-order
      // replay or duplicated source segment. Keep the newer row (which may
      // itself be a tombstone — deleted keys cannot be resurrected by a
      // late update).
      val stale = matched && c("lsn") < t(LSN)
      val wasTombstone = coalesce(t(DELETED), lit(false))
      val action = when(c(key).isNull, lit("carry"))
        .when(stale, lit("stale"))
        .when(isDelete, lit("delete")) // tombstone, matched or not
        .when(matched && !wasTombstone, lit("update"))
        .otherwise(lit("insert"))

      val keepTarget = col(ACTION).isin("carry", "stale")
      val isDel = col(ACTION) === "delete"
      // Surviving row: carry/stale keeps target columns; delete writes a
      // tombstone (null payload); upsert takes after.* (absent evolving
      // fields come out null via the schema'd read/cast).
      val outCols = payloadCols.map { cn =>
        val fromAfter =
          if (afterSchema.fieldNames.contains(cn)) c(s"after.$cn")
          else lit(null).cast(newSchema(cn).dataType)
        val nullLit = lit(null).cast(newSchema(cn).dataType)
        if (!patch)
          when(keepTarget, t(cn)).when(isDel, nullLit).otherwise(fromAfter).as(cn)
        else
          // Patch semantics: an update's null column means "unchanged" —
          // keep the stored value — UNLESS the batch absorbed a delete
          // (reset watermark set): then older state must not leak through.
          when(keepTarget, t(cn)).when(isDel, nullLit)
            .when(col(ACTION) === "update" && c(RESET).isNull, coalesce(fromAfter, t(cn)))
            .otherwise(fromAfter).as(cn)
      }
      val keyOut = coalesce(t(key), c(key))
      val merged = joined
        .withColumn(ACTION, action)
        .select(outCols.updated(payloadCols.indexOf(key), keyOut.as(key)) ++ Seq(
          when(keepTarget, t(LSN)).otherwise(c("lsn")).as(LSN),
          when(keepTarget, wasTombstone).otherwise(isDel).as(DELETED),
          col(ACTION),
          coalesce(t(BUCKET), c(BUCKET)).as(BUCKET)): _*)

      // 5. Write surviving rows of touched buckets, key-sorted, bounded
      // files. Action counts piggyback on the write job via observe() —
      // the whole merge is ONE job (plus the planning collect), no cache.
      val obs = org.apache.spark.sql.Observation()
      val observed = merged.observe(obs,
        count(when(col(ACTION) === "insert", 1)).as("insert"),
        count(when(col(ACTION) === "update", 1)).as("update"),
        count(when(col(ACTION) === "delete", 1)).as("delete"),
        count(when(col(ACTION) === "carry", 1)).as("carry"),
        count(when(col(ACTION) === "stale", 1)).as("stale"))
      val version = snap.version + 1
      val newFiles: List[DataFileMeta] =
        writeDataFiles(table, snap.copy(columnMapping = newMapping), observed.drop(ACTION),
          version, bucketClustered = true, mark = mark)
      mark("footer stats")
      val actionCounts: Map[String, Long] =
        obs.get.map { case (k, v) => k -> v.asInstanceOf[Long] }

      // No-op epoch (empty batch, or every change stale): the table DATA is
      // unchanged, so commit only the epoch marker + metadata — keep the old
      // files but still commit the evolved schema (additive evolution is
      // metadata-only and must not be dropped: the exactly-once ledger will
      // prevent this batch from ever replaying) and delete the abandoned
      // identical rewrite (those files were never referenced by any
      // snapshot, so the delete is safe at every version).
      val applied = Seq("insert", "update", "delete").map(actionCounts.getOrElse(_, 0L)).sum
      if (applied == 0L) {
        val s0 = CommitStats(epochKey, 0, 0, 0,
          carried = actionCounts.getOrElse("carry", 0L),
          stale = actionCounts.getOrElse("stale", 0L), 0, 0)
        val ledger0 = graft.table.EpochLedger.appended(snap, epochKey)
        val cand0 = snap.copy(
          version = version,
          schemaJson = newSchema.json,
          columnMapping = newMapping,
          committedEpochs = ledger0._1,
          epochWatermarks = ledger0._2,
          registryJson = registryJson.getOrElse(snap.registryJson),
          // caller counters still land on a no-op epoch — e.g. a batch
          // whose every event was suppressed by ingest dedup writes no
          // data, but its suppression count must survive in the ledger
          lineage = snap.lineage ++ extraLineage.map { case (k, v) =>
            k -> (snap.lineage.getOrElse(k, 0L) + v) },
          parentVersion = snap.version,
          stats = Some(s0))
        val out0 = commitTo(snap, cand0)
        table.deleteDataFiles(newFiles.map(_.path))
        out0 match {
          case graft.table.CommitOutcome.Overlap => throw new RebaseOverlap
          case _ => // Committed, or a concurrent duplicate delivery won the
                    // epoch — either way this epoch is applied exactly once
        }
        mark("commit (no-op epoch)")
        return s0
      }

      val stats = CommitStats(
        epochKey,
        inserted = actionCounts.getOrElse("insert", 0L),
        updated = actionCounts.getOrElse("update", 0L),
        deleted = actionCounts.getOrElse("delete", 0L),
        carried = actionCounts.getOrElse("carry", 0L),
        stale = actionCounts.getOrElse("stale", 0L),
        rewrittenFiles = affectedFiles.size,
        touchedBuckets = newFiles.map(_.bucket).distinct.size)

      // 6. Atomic snapshot commit with epoch ledger + lineage counters.
      // Optimistic under concurrent writers: a conflicting commit that
      // touched DISJOINT buckets is absorbed by a driver-side manifest
      // rebase (no recompute); a same-epoch race yields to the winner; an
      // overlapping-bucket conflict recomputes the merge (RebaseOverlap).
      val keptFiles = snap.files.filterNot(f => affectedPaths.contains(f.path))
      val lineage = updateLineage(snap.lineage, newFiles, stats, extraLineage)
      val ledger = graft.table.EpochLedger.appended(snap, epochKey)
      commitTo(snap, snap.copy(
        version = version,
        schemaJson = newSchema.json,
        columnMapping = newMapping,
        files = keptFiles ++ newFiles,
        committedEpochs = ledger._1,
        epochWatermarks = ledger._2,
        registryJson = registryJson.getOrElse(snap.registryJson),
        lineage = lineage,
        parentVersion = snap.version,
        stats = Some(stats))) match {
        case graft.table.CommitOutcome.Committed =>
          mark("commit")
          stats
        case graft.table.CommitOutcome.EpochWon =>
          mark("commit (lost same-epoch race)")
          CommitStats(epochKey, 0, 0, 0, 0, 0, 0, 0)
        case graft.table.CommitOutcome.Overlap =>
          throw new RebaseOverlap
      }
    } finally {
      if (!callerOwned) deduped.unpersist(): Unit
    }
  }

  /**
   * Intra-batch last-write-wins dedup around ONE full-data shuffle and ONE
   * read of it: cluster by BUCKET, then
   * groupBy(bucket, key).last_write_wins(struct(lsn, op, after)) — a
   * [[LastWriteWinsAgg]] through ObjectHashAggregate. HashPartitioning
   * (bucket) satisfies the agg's (bucket, key) clustering (subset rule), so
   * partial+final fuse into the post-shuffle stage: the shuffled batch is
   * read once and collapsed to winners in a single hash pass. In-batch
   * (key, lsn) redeliveries collapse in the same pass (ties keep first-seen;
   * duplicate deliveries are byte-identical by the CDC contract).
   *
   * Two shapes deliberately rejected:
   *  - max-lsn hash agg + two self-equi-joins over a reused full-batch
   *    exchange (round 1): reads the shuffled batch THREE times and plans
   *    three exchanges — dominated per-epoch Catalyst time and shuffle I/O;
   *  - pre-shuffle partial aggregation (groupBy before the repartition):
   *    a CDC batch spreads each key's events across ALL input partitions,
   *    so per-partition duplication is ~1.1x and the map-side pass is pure
   *    overhead (measured 2x slower at width 32) — partial agg pays only
   *    when keys repeat within a partition.
   *
   * Output carries (key, op, after, lsn, BUCKET), physically clustered by
   * BUCKET; the merge join and bucket-partitioned write reuse the
   * clustering.
   */
  private def dedupeBatch(changes: DataFrame, key: String, nBuckets: Int,
                          fold: String = "lww"): DataFrame = {
    // Sort-based fallback would turn the one-pass hash collapse into a full
    // sort; the default threshold (128 in-memory groups) is sized for
    // collect_list-style aggregates, not a ~330-byte LWW buffer. The
    // threshold is derived from the heap and task width (NOT a fixed 2M):
    // budget ~15% of heap split across concurrently-running tasks, so a
    // high-cardinality batch falls back to the graceful sort instead of
    // OOMing the executor. [[run]] restores the conf afterwards.
    val spark = changes.sparkSession
    val derivedThreshold = {
      // Per-task budget from EXECUTOR memory and cores when configured (a
      // real cluster: tasks run in executors, not the driver); local mode
      // has neither conf, so this JVM's heap / parallelism IS the truth.
      def parseMemMb(s: String): Option[Long] = {
        val t = s.trim.toLowerCase
        try Some(
          if (t.endsWith("g")) t.dropRight(1).toDouble.toLong * 1024
          else if (t.endsWith("m")) t.dropRight(1).toDouble.toLong
          else if (t.endsWith("k")) (t.dropRight(1).toDouble / 1024).toLong
          else t.toDouble.toLong) // Spark's unitless executor memory is MiB
        catch { case _: NumberFormatException => None }
      }
      val execMemBytes = spark.conf.getOption("spark.executor.memory")
        .flatMap(parseMemMb).map(_ * 1024L * 1024L)
      val execCores = spark.conf.getOption("spark.executor.cores")
        .flatMap(s => scala.util.Try(s.trim.toInt).toOption).filter(_ > 0)
      val (memBytes, cores) = (execMemBytes, execCores) match {
        case (Some(m), Some(c)) => (m, c)
        case (Some(m), None)    => (m, 1)
        case _ => (Runtime.getRuntime.maxMemory,
                   math.max(1, spark.sparkContext.defaultParallelism))
      }
      val perTask = (memBytes * 0.15 / 330 / cores).toLong
      math.max(65536L, math.min(2000000L, perTask))
    }
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      spark.conf.getOption("graft.merge.aggFallbackThreshold").getOrElse(derivedThreshold.toString))
    val base = changes
      .select(col(key), col("op"), col("after"),
        col("lsn").cast(org.apache.spark.sql.types.LongType).as("lsn"))
      .withColumn(BUCKET, KafkaMurmur2.bucketLabel(col(key), nBuckets))
    // Hot-key salting (graft.merge.dedupSalt = S, default off): a key hot
    // enough to overwhelm its bucket's partition (think one doc_id carrying
    // a double-digit share of the stream) first collapses under
    // (bucket, key, salt) — the salt spreads the hot key's events across S
    // partitions, each emitting one partial winner — then the <= S winners
    // per key collapse under (bucket, key). LWW is associative+commutative,
    // so the two-level fold is exact (SaltedDedupSpec). Costs a second
    // (tiny) shuffle; the unsalted single-pass is faster under normal skew,
    // which is why this is opt-in rather than default.
    // graft.merge.autoSaltShare = S (opt-in): sample the batch, and if any
    // key carries a sampled share >= S, salt the fold just enough to spread
    // it (see [[HotKeys]]). An explicit graft.merge.dedupSalt wins. Costs
    // one sampled scan per batch — noise at the 10^8-events/epoch design
    // point, and the detection is deterministic (md5-keyed sample), so
    // retries make the same decision.
    val salt = spark.conf.getOption("graft.merge.dedupSalt").map(_.toInt)
      .orElse(spark.conf.getOption("graft.merge.autoSaltShare").map { s =>
        HotKeys.recommendSalt(changes, key, col("lsn"), s.toDouble,
          spark.conf.get("spark.sql.shuffle.partitions").toInt)
      })
      .getOrElse(0)
    // Fold kernel: row-level last-write-wins (default), or the column-level
    // patch fold for partial-update streams ([[PatchFoldAgg]] — both are
    // associative, so the salted two-level variant is exact for either).
    val patch = fold == "patch"
    val foldAgg: Column => Column =
      if (patch) PatchFoldAgg.fold else LastWriteWinsAgg.lww
    val rawStruct =
      if (patch) struct(col("lsn"), col("op"), col("after"),
        lit(null).cast(org.apache.spark.sql.types.LongType).as("reset"))
      else struct(col("lsn"), col("op"), col("after"))
    val refoldStruct =
      if (patch) struct(col("__w.lsn").as("lsn"), col("__w.op").as("op"),
        col("__w.after").as("after"), col("__w.reset").as("reset"))
      else struct(col("__w.lsn").as("lsn"), col("__w.op").as("op"),
        col("__w.after").as("after"))
    // Partition count for the bucket-clustered exchange: never more than the
    // number of distinct bucket labels — a hash partition with no label is
    // provably empty, and scheduling empty tasks is pure per-epoch constant
    // (24 empty tasks/stage at 8 buckets x 32-partition sessions, measured
    // on the driver's serial path). Tables with buckets >= the session's
    // shuffle partitions (the 100 TB layout) keep the session's setting.
    val sessParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val bucketParts = math.max(1, math.min(nBuckets, sessParts))
    val deduped =
      if (salt > 1) {
        base
          .withColumn("__salt", pmod(xxhash64(col("lsn")), lit(salt.toLong)))
          .repartition(math.max(1, math.min(nBuckets.toLong * salt, sessParts.toLong)).toInt,
            col(BUCKET), col("__salt"))
          .groupBy(col(BUCKET), col(key), col("__salt"))
          .agg(foldAgg(rawStruct).as("__w"))
          .repartition(bucketParts, col(BUCKET))
          .groupBy(col(BUCKET), col(key))
          .agg(foldAgg(refoldStruct).as("__w"))
      } else {
        base
          .repartition(bucketParts, col(BUCKET))
          .groupBy(col(BUCKET), col(key))
          .agg(foldAgg(rawStruct).as("__w"))
      }
    deduped.select(
      Seq(col(key), col("__w.op").as("op"), col("__w.after").as("after"),
        col("__w.lsn").as("lsn"), col(BUCKET)) ++
        (if (patch) Seq(col("__w.reset").as(RESET)) else Nil): _*)
  }

  /**
   * Merge-on-read: the change batch appends as DELTA files — no target read,
   * no rewrite; readers resolve the winner per key by the __lsn high-water
   * mark ([[graft.table.IceLiteTable.resolveMor]]). Cuts COW's write
   * amplification for update-heavy epochs (write volume = O(batch), never
   * O(affected files)); buckets whose file count crosses
   * `mor.compact.threshold` (table property, default 16) compact inline to
   * bound read amplification. Same dedup, exactly-once ledger, evolution and
   * stale semantics as COW (stale changes are simply out-ranked at read).
   */
  private def runMor(table: IceLiteTable, changes: DataFrame, epochKey: String,
                     registryJson: Option[String], snap: Snapshot,
                     afterSchema: StructType, newSchema: StructType,
                     mark: String => Unit,
                     preDeduped: Option[DataFrame] = None,
                     extraLineage: Map[String, Long] = Map.empty,
                     commitFn: Option[(Snapshot, Snapshot) => graft.table.CommitOutcome] = None): CommitStats = {
    val key = snap.keyColumn
    val nBuckets = snap.numBuckets
    // Same one-shuffle shape as the COW path: cluster by bucket once, then
    // dedup + write reuse the clustering.
    table.spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    val patch = snap.fold == "patch"
    val deduped = preDeduped.getOrElse(dedupeBatch(changes, key, nBuckets, snap.fold))
    val isDelete = col("op") === "d"
    val outCols = newSchema.fieldNames.toSeq.map { cn =>
      val v =
        if (cn == key) col(key)
        else if (afterSchema.fieldNames.contains(cn))
          when(isDelete, lit(null).cast(newSchema(cn).dataType)).otherwise(col(s"after.$cn"))
        else lit(null).cast(newSchema(cn).dataType)
      v.as(cn)
    }
    val obs = org.apache.spark.sql.Observation()
    // Patch deltas persist the batch's reset watermark: the read-time fold
    // needs it to stop older deltas' columns from leaking past a mid-batch
    // delete (see [[PatchFoldAgg]] and the RESET doc).
    val rows = deduped.select(outCols ++ Seq(
      col("lsn").as(LSN), isDelete.as(DELETED)) ++
      (if (patch) Seq(col(RESET)) else Nil) ++ Seq(col(BUCKET)): _*)
      .observe(obs,
        count(when(!col(DELETED), 1)).as("upsert"),
        count(when(col(DELETED), 1)).as("delete"))
    val version = snap.version + 1
    val newMapping = evolveMapping(snap, newSchema)
    val newFiles = writeDataFiles(table,
      snap.copy(schemaJson = newSchema.json, columnMapping = newMapping), rows, version,
      bucketClustered = true)
    mark("mor delta write + footer stats")
    val counts = obs.get.map { case (k, v) => k -> v.asInstanceOf[Long] }
    // MOR cannot tell insert from update without reading the base — the
    // distinction is deferred to read/compaction; report upserts as inserts.
    val stats = CommitStats(
      epochKey,
      inserted = counts.getOrElse("upsert", 0L),
      updated = 0L,
      deleted = counts.getOrElse("delete", 0L),
      carried = 0L, stale = 0L,
      rewrittenFiles = 0,
      touchedBuckets = newFiles.map(_.bucket).distinct.size)
    val ledgerMor = graft.table.EpochLedger.appended(snap, epochKey)
    val candMor = snap.copy(
      version = version,
      schemaJson = newSchema.json,
      columnMapping = newMapping,
      files = snap.files ++ newFiles,
      committedEpochs = ledgerMor._1,
      epochWatermarks = ledgerMor._2,
      registryJson = registryJson.getOrElse(snap.registryJson),
      lineage = updateLineage(snap.lineage, newFiles, stats, extraLineage),
      parentVersion = snap.version,
      stats = Some(stats))
    commitFn match {
      case Some(f) => f(snap, candMor): Unit // staged: parks, never conflicts
      case None => table.commit(candMor)
    }
    mark("mor commit")
    // Inline compaction bounds read amplification: any bucket whose file
    // count crossed the threshold is rewritten to its resolved state.
    // Skipped for staged commits: maintenance operates on PUBLISHED state
    // only (the staged delta is not in table.snapshot yet).
    if (commitFn.isEmpty) {
      val threshold = snap.properties.getOrElse("mor.compact.threshold", "16").toInt
      val crowded = table.snapshot.files.groupBy(_.bucket)
        .collect { case (b, fs) if fs.size > threshold => b }.toSet
      if (crowded.nonEmpty) {
        table.compactBuckets(crowded)
        mark(s"mor compaction (${crowded.size} buckets)")
      }
    }
    stats
  }

  /** Write data-schema rows bucket-partitioned and key-sorted; return per-file
    * manifest entries (stats gathered in one pass over just-written files —
    * O(changed data)). `df` must carry the table's payload + internal columns;
    * the bucket is (re)computed from the key. */
  private[graft] def writeDataFiles(table: IceLiteTable, snap: Snapshot,
                                    df: DataFrame, version: Long,
                                    bucketClustered: Boolean = false,
                                    mark: String => Unit = _ => (),
                                    sortOverride: Option[Seq[Column]] = None): List[DataFileMeta] = {
    val spark = table.spark
    val key = snap.keyColumn
    val commitId = UUID.randomUUID().toString.take(8)
    val outDir = s"${table.root}/data/c$version-$commitId"
    val withBucket =
      if (df.columns.contains(BUCKET)) df
      else df.withColumn(BUCKET, KafkaMurmur2.bucketLabel(col(key), snap.numBuckets))
    // bucketClustered: the caller guarantees rows are already physically
    // clustered by BUCKET (e.g. the output of the co-partitioned merge
    // join) — skipping the repartition saves a full shuffle of the write
    // set; the dynamic-partition writer is correct under ANY distribution
    // (a non-clustered input only costs extra files per bucket).
    // write.parquet.bloom = true: build a parquet bloom filter on the key
    // column in every data file. Point lookups push an IN filter down to
    // the scan, and the bloom skips row groups the min/max range check
    // cannot (hashed keys interleave lexically, so ranges are wide but
    // membership is sparse). Costs ~1M bits/file at default NDV; off by
    // default — full-scan analytics never consult it.
    val physKey = snap.physicalName(key)
    val bloomOpts: Map[String, String] =
      if (snap.properties.get("write.parquet.bloom").contains("true"))
        Map(s"parquet.bloom.filter.enabled#$physKey" -> "true")
      else Map.empty
    // write.sort.columns (physical names): secondary value clustering within
    // the bucket so the zone maps gathered below get tight per-file ranges
    // (see IceLiteTable.scanRange). The key stays last in the sort — point
    // lookups keep locality within equal sort values.
    // sortOverride (e.g. a z-order curve, see IceLiteTable.clusterZOrder)
    // replaces the linear secondary sort; the bucket stays the leading term
    // and the key the last, so point-lookup locality within equal curve
    // values is preserved either way.
    val sortCols: Seq[Column] = sortOverride.getOrElse(
      snap.sortColumns.map(snap.logicalName).filter(withBucket.columns.contains).map(col))
    // Same label-count cap as dedupeBatch: partitions beyond the bucket
    // count are empty by construction.
    val writeParts = math.max(1, math.min(snap.numBuckets,
      spark.conf.get("spark.sql.shuffle.partitions").toInt))
    val clustered = (if (bucketClustered) withBucket
                     else withBucket.repartition(writeParts, col(BUCKET)))
      .sortWithinPartitions((col(BUCKET) +: sortCols) :+ col(key): _*)
    // Renamed table: files ALWAYS store the immutable physical names
    // (IceLiteTable.renameColumn is metadata-only; readers alias back).
    // The rename-only Project preserves the clustering and sort order.
    val toPhysical =
      if (snap.columnMapping.isEmpty) clustered
      else clustered.select(clustered.columns.toSeq.map(c =>
        col(s"`$c`").as(snap.physicalName(c))): _*)
    toPhysical
      .write
      // Fork-free local FS for the whole write job (committer + tasks):
      // see IceLite.localFsOptions — per-operation conf, not session-global.
      .options(graft.table.IceLite.localFsOptions(table.root))
      .options(bloomOpts)
      .option("maxRecordsPerFile", maxRecordsPerFile(spark))
      // High-cardinality token arrays defeat dictionary encoding; the
      // failed dict attempt more than doubles write time (measured 13.8s
      // vs 5.9s per 2M rows). Snappy stays on.
      .option("parquet.enable.dictionary",
        spark.conf.getOption("graft.merge.parquet.dictionary").getOrElse("false"))
      .partitionBy(BUCKET)
      .parquet(outDir)
    mark("merge join + write job")
    // Per-file stats from parquet footers, driver-side — O(files) metadata
    // reads, no extra Spark job (the Iceberg planning model).
    footerStats(spark, table.root, outDir, physKey,
      snap.statsColumns.filterNot(_ == physKey))
  }

  /** Collect (rows, min/max key, tombstone presence) for every parquet file
    * under `outDir` from footer metadata. `tombstones` is a presence flag
    * (1 when a file may contain tombstone rows) — compaction planning only
    * needs the flag. */
  private def footerStats(spark: SparkSession, tableRoot: String, outDir: String,
                          key: String, statCols: Seq[String] = Nil): List[DataFileMeta] = {
    // Hadoop FileSystem walk (portable: local FS here, HDFS/S3A on cluster).
    // fsFor gives the fork-free raw FS on file-scheme paths, and the walk is
    // a plain listStatus recursion: `fs.listFiles` yields LocatedFileStatus,
    // whose constructor loads permissions — on a non-native local FS that is
    // one `ls -ld` SUBPROCESS per written file per epoch (profiled on the
    // driver's serial path between epochs).
    val conf = spark.sparkContext.hadoopConfiguration
    val dirP = new org.apache.hadoop.fs.Path(outDir)
    val fs = graft.table.IceLite.fsFor(dirP, conf)
    val rootUri = fs.makeQualified(new org.apache.hadoop.fs.Path(tableRoot)).toUri
    val files = {
      val buf = List.newBuilder[org.apache.hadoop.fs.Path]
      def walk(p: org.apache.hadoop.fs.Path): Unit = fs.listStatus(p).foreach { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) buf += st.getPath
      }
      walk(dirP)
      buf.result()
    }
    // footer reads are independent metadata fetches; do them concurrently
    // (they are on the driver's serial path between epochs)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(32, math.max(1, files.size)))
    implicit val ec: scala.concurrent.ExecutionContext = scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = files.map { p => scala.concurrent.Future(footerStatOne(conf, rootUri.getPath, key, p, statCols)) }
    try scala.concurrent.Await.result(scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration(300, "s")).toList
    finally pool.shutdown()
  }

  private def footerStatOne(conf: org.apache.hadoop.conf.Configuration, rootPath: String,
                            key: String, p: org.apache.hadoop.fs.Path,
                            statCols: Seq[String] = Nil): DataFileMeta = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    {
      // table-relative path (URI.relativize needs a trailing-slash base, so
      // strip the qualified root's path prefix instead)
      val rel = p.toUri.getPath.stripPrefix(rootPath).stripPrefix("/")
      val bucket = raw"$BUCKET=(\d+)".r.findFirstMatchIn(p.toString)
        .map(_.group(1).toInt)
        .getOrElse(throw new IllegalStateException(s"no bucket dir in path $p"))
      // Footer metadata only: local paths open via parquet's LocalInputFile
      // (no Hadoop FS, no .crc verification of the whole file); remote
      // schemes keep the Hadoop path.
      val scheme = p.toUri.getScheme
      val inputFile: org.apache.parquet.io.InputFile =
        if (scheme == null || scheme == "file")
          new org.apache.parquet.io.LocalInputFile(java.nio.file.Paths.get(p.toUri.getPath))
        else HadoopInputFile.fromPath(p, conf)
      val reader = ParquetFileReader.open(inputFile)
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        var rows = 0L
        // Min/max selected by UNSIGNED BYTE order (the order Spark's
        // UTF8String comparison — and therefore the prune join — uses).
        // Java String '<' is UTF-16 code-unit order, which disagrees for
        // supplementary-plane characters and would let a file that contains
        // a changed key be wrongly pruned.
        var mnB: Array[Byte] = null
        var mxB: Array[Byte] = null
        var statsMissing = false
        var tomb = 0L
        // Zone-map accumulation for write.stats.columns: running min/max
        // across row groups. A group with unusable stats (absent, NaN — not
        // provably all-null) POISONS the column for this file: no entry is
        // emitted and the scan treats the file as matching every range.
        val zMin = scala.collection.mutable.Map.empty[String, Any]
        val zMax = scala.collection.mutable.Map.empty[String, Any]
        val zBad = scala.collection.mutable.Set.empty[String]
        def cmpVal(a: Any, b: Any): Int = (a, b) match {
          case (x: org.apache.parquet.io.api.Binary, y: org.apache.parquet.io.api.Binary) =>
            java.util.Arrays.compareUnsigned(x.getBytes, y.getBytes)
          case (x: java.lang.Number, y: java.lang.Number) =>
            BigDecimal(x.toString).compare(BigDecimal(y.toString))
          case _ => String.valueOf(a).compareTo(String.valueOf(b))
        }
        def finite(v: Any): Boolean = v match {
          case d: java.lang.Double => !d.isNaN && !d.isInfinite
          case f: java.lang.Float => !f.isNaN && !f.isInfinite
          case _ => true
        }
        blocks.foreach { b =>
          rows += b.getRowCount
          b.getColumns.asScala.foreach { c =>
            val colName = c.getPath.toDotString
            if (colName == key) {
              val st = c.getStatistics
              if (st != null && st.hasNonNullValue) {
                val lo = st.getMinBytes
                val hi = st.getMaxBytes
                if (mnB == null || java.util.Arrays.compareUnsigned(lo, mnB) < 0) mnB = lo
                if (mxB == null || java.util.Arrays.compareUnsigned(hi, mxB) > 0) mxB = hi
              } else statsMissing = true
            } else if (colName == DELETED) {
              val st = c.getStatistics
              // conservative: flag unless stats prove all-false
              if (st == null || !st.hasNonNullValue ||
                st.genericGetMax.toString.toBoolean) tomb = 1L
            } else if (statCols.contains(colName)) {
              val st = c.getStatistics
              if (st == null) zBad += colName
              else if (!st.hasNonNullValue) {
                // an all-null group never extends a range; anything else
                // means stats were not written for this group
                if (!(st.isNumNullsSet && st.getNumNulls == b.getRowCount))
                  zBad += colName
              } else {
                val (mn, mx) = (st.genericGetMin, st.genericGetMax)
                if (!finite(mn) || !finite(mx)) zBad += colName
                else {
                  if (!zMin.get(colName).exists(cmpVal(_, mn) <= 0)) zMin(colName) = mn
                  if (!zMax.get(colName).exists(cmpVal(_, mx) >= 0)) zMax(colName) = mx
                }
              }
            }
          }
        }
        def renderStat(v: Any): (String, Boolean) = v match {
          case b: org.apache.parquet.io.api.Binary =>
            (new String(b.getBytes, java.nio.charset.StandardCharsets.UTF_8), false)
          case n: java.lang.Number =>
            (BigDecimal(n.toString).bigDecimal.toPlainString, true)
          case other => (String.valueOf(other), false)
        }
        val colStats: Map[String, graft.table.ColRange] =
          zMin.keysIterator.filterNot(zBad).map { cn =>
            val (mnS, num) = renderStat(zMin(cn))
            val (mxS, _) = renderStat(zMax(cn))
            cn -> graft.table.ColRange(mnS, mxS, num)
          }.toMap
        if (mnB == null || mxB == null || statsMissing) {
          // parquet-mr omits binary column stats for long values (above its
          // truncation/size threshold): fall back to an always-affected file
          // instead of failing every future merge of this table.
          DataFileMeta(rel, bucket, rows, "", "", tomb, fullRange = true, colStats)
        } else {
          val mn = new String(mnB, java.nio.charset.StandardCharsets.UTF_8)
          val mx = new String(mxB, java.nio.charset.StandardCharsets.UTF_8)
          DataFileMeta(rel, bucket, rows, mn, mx, tomb, colStats = colStats)
        }
      } finally reader.close()
    }
  }

  /** Additive + widening evolution: batch may add columns, and common
    * columns may WIDEN along Iceberg's safe-promotion lattice
    * ([[widenType]]); anything else throws (renames happen upstream in the
    * SMT chain). Widening is METADATA-ONLY: existing narrow files are never
    * rewritten — every read goes through the snapshot schema and Spark's
    * parquet readers promote int32->int64 / float->double at scan time
    * (both vectorized and row paths since 4.0); a batch NARROWER than the
    * table needs no schema change at all, its values coerce up in the merge
    * projection. */
  private[merge] def evolveSchema(table: StructType, batch: StructType): StructType = {
    val existing = table.fieldNames.toSet
    val merged = table.fields.map { tf =>
      batch.fields.find(_.name == tf.name) match {
        case None => tf
        case Some(bf) =>
          val t = widenType(tf.dataType, bf.dataType).getOrElse(throw new IllegalArgumentException(
            s"Incompatible type evolution for column ${tf.name}: table=${tf.dataType.catalogString} batch=${bf.dataType.catalogString}"))
          tf.copy(dataType = t)
      }
    }
    val added = batch.fields.filterNot(f => existing.contains(f.name))
      .map(_.copy(nullable = true)) // evolved columns are null for old rows
    StructType(merged ++ added)
  }

  /** The type both sides safely promote to, or None when evolution is
    * incompatible. Iceberg's rules: byte->short->int->long and
    * float->double (NOT int->float/double — lossy above 2^24), recursing
    * through struct (with additive nested fields), array, and map values
    * (map keys must match exactly — they identify entries). */
  private[merge] def widenType(table: DataType, batch: DataType): Option[DataType] = {
    val ints: Seq[DataType] = Seq(ByteType, ShortType, IntegerType, LongType)
    val floats: Seq[DataType] = Seq(FloatType, DoubleType)
    (table, batch) match {
      case (a, b) if org.apache.spark.sql.graftbridge.Exprs.sameTypeIgnoreNullability(a, b) => Some(a)
      case (a, b) if ints.contains(a) && ints.contains(b) =>
        Some(ints(math.max(ints.indexOf(a), ints.indexOf(b))))
      case (a, b) if floats.contains(a) && floats.contains(b) =>
        Some(floats(math.max(floats.indexOf(a), floats.indexOf(b))))
      case (StructType(tf), StructType(bf)) =>
        val bMap = bf.map(f => f.name -> f).toMap
        val mergedExisting = tf.map { fa =>
          bMap.get(fa.name) match {
            case None => Some(fa)
            case Some(fb) => widenType(fa.dataType, fb.dataType)
              .map(t => fa.copy(dataType = t, nullable = fa.nullable || fb.nullable))
          }
        }
        if (mergedExisting.contains(None)) None
        else {
          val tNames = tf.map(_.name).toSet
          val added = bf.filterNot(f => tNames.contains(f.name)).map(_.copy(nullable = true))
          Some(StructType(mergedExisting.flatten ++ added))
        }
      case (ArrayType(a, n1), ArrayType(b, n2)) =>
        widenType(a, b).map(t => ArrayType(t, n1 || n2))
      case (MapType(ka, va, n1), MapType(kb, vb, n2)) if ka == kb =>
        widenType(va, vb).map(t => MapType(ka, t, n1 || n2))
      case _ => None
    }
  }

  /** Column mapping after additive evolution: a new logical column normally
    * stores under its own name, UNLESS that physical name is already in use —
    * i.e. it is the RETIRED storage name of a column renamed away
    * ([[graft.table.IceLiteTable.renameColumn]]) or dropped
    * ([[graft.table.IceLiteTable.dropColumn]]). Then a fresh physical name
    * is minted (Iceberg's new-field-id semantics): the re-added name is a NEW
    * column, and the old column's data — still sitting under the retired
    * physical name in pre-rename/pre-drop files — can never leak into it. */
  private[graft] def evolveMapping(snap: Snapshot, newSchema: StructType): Map[String, String] = {
    if (snap.columnMapping.isEmpty && snap.retiredPhysical.isEmpty)
      return snap.columnMapping // no renames or drops ever: identity
    val oldNames = snap.schema.fieldNames.toSet
    val inUsePhysical = snap.schema.fieldNames.map(snap.physicalName).toSet ++ snap.retiredPhysical
    newSchema.fieldNames.filterNot(oldNames).foldLeft(snap.columnMapping) { (m, name) =>
      if (!inUsePhysical.contains(name)) m
      else m + (name -> s"${name}__p${snap.version + 1}")
    }
  }

  private def updateLineage(prev: Map[String, Long], newFiles: Seq[DataFileMeta], s: CommitStats,
                            extra: Map[String, Long] = Map.empty): Map[String, Long] = {
    val perBucket = newFiles.groupBy(_.bucket).map { case (b, fs) =>
      s"applied.bucket.$b" -> (prev.getOrElse(s"applied.bucket.$b", 0L) + fs.map(_.rows).sum)
    }
    prev ++ perBucket ++ Map(
      "applied.inserts" -> (prev.getOrElse("applied.inserts", 0L) + s.inserted),
      "applied.updates" -> (prev.getOrElse("applied.updates", 0L) + s.updated),
      "applied.deletes" -> (prev.getOrElse("applied.deletes", 0L) + s.deleted),
      "applied.epochs" -> (prev.getOrElse("applied.epochs", 0L) + 1L)) ++
      // caller-supplied counters (e.g. ingest-dedup suppression) ride the
      // same atomic commit as everything else
      extra.map { case (k, v) => k -> (prev.getOrElse(k, 0L) + v) }
  }

  private def maxRecordsPerFile(spark: SparkSession): Long =
    spark.conf.getOption("graft.merge.maxRecordsPerFile").map(_.toLong).getOrElse(1000000L)

  // DISK_ONLY measured most stable for the deduped-batch cache (columnar
  // memory encode of token arrays is CPU/GC-heavy and variance-prone;
  // local disk re-read is cheap and flat). Override via conf if executors
  // have memory to burn.
  private def storageLevel(spark: SparkSession): StorageLevel =
    StorageLevel.fromString(
      spark.conf.getOption("graft.merge.dedupStorageLevel").getOrElse("DISK_ONLY"))

  // Helper: Seq[Row] -> java List for createDataFrame.
  private implicit class SeqRowOps(val rows: Seq[Row]) extends AnyVal {
    def asJava2(spark: SparkSession): java.util.List[Row] = {
      val l = new java.util.ArrayList[Row](rows.size)
      rows.foreach(l.add)
      l
    }
  }
}
