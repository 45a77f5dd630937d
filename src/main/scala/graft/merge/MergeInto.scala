package graft.merge

import graft.hashing.KafkaMurmur2
import graft.table.{CommitStats, DataFileMeta, IceLiteTable, Snapshot}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}
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

  /** Physical file schema for a user-facing payload schema. */
  def dataSchemaOf(payload: StructType): StructType =
    StructType(payload.fields ++ Seq(
      StructField(LSN, org.apache.spark.sql.types.LongType, nullable = false),
      StructField(DELETED, org.apache.spark.sql.types.BooleanType, nullable = false)))

  def run(table: IceLiteTable, changes: DataFrame, epochKey: String): CommitStats = {
    val snap = table.snapshot
    if (snap.committedEpochs.contains(epochKey)) {
      // Re-delivered epoch (at-least-once upstream): exactly-once via no-op.
      return CommitStats(epochKey, 0, 0, 0, 0, 0, 0, 0)
    }
    val spark = table.spark
    val key = snap.keyColumn
    val nBuckets = snap.numBuckets

    // 1. Schema evolution (additive): table schema ∪ batch payload schema.
    val afterSchema = changes.schema("after").dataType.asInstanceOf[StructType]
    val newSchema = evolveSchema(snap.schema, afterSchema)
    val payloadCols = newSchema.fieldNames.toSeq
    // Physical file schema = payload + LSN high-water mark + tombstone flag.
    val dataSchema = dataSchemaOf(newSchema)

    // 2. Intra-batch dedup: last write per key by lsn (map-side combined).
    val deduped = changes
      .groupBy(col(key))
      .agg(max_by(struct(col("op"), col("after")), col("lsn")).as("last"), max("lsn").as("lsn"))
      .select(col(key), col("last.op").as("op"), col("last.after").as("after"), col("lsn"))
      .withColumn(BUCKET, KafkaMurmur2.kafkaPartition(col(key), nBuckets))
      .persist(StorageLevel.MEMORY_AND_DISK)

    try {
      // 3. Plan: which data files does this batch touch? (bucket equi-join +
      // key-range condition against the broadcast manifest — O(changed keys)).
      val filesDf = spark.createDataFrame(snap.files.map(f =>
        Row(f.path, f.bucket, f.minKey, f.maxKey)).asJava2(spark),
        StructType(Seq(
          StructField("path", org.apache.spark.sql.types.StringType, nullable = false),
          StructField("bucket", org.apache.spark.sql.types.IntegerType, nullable = false),
          StructField("minKey", org.apache.spark.sql.types.StringType, nullable = false),
          StructField("maxKey", org.apache.spark.sql.types.StringType, nullable = false))))
      val affectedPaths: Set[String] =
        if (snap.files.isEmpty) Set.empty
        else deduped.select(col(key), col(BUCKET))
          .join(broadcast(filesDf),
            col(BUCKET) === col("bucket") && col(key) >= col("minKey") && col(key) <= col("maxKey"))
          .select("path").distinct().collect().map(_.getString(0)).toSet
      val affectedFiles = snap.files.filter(f => affectedPaths.contains(f.path))

      // 4. COW merge: affected target rows FULL OUTER JOIN deduped changes.
      val target = table.readFiles(snap.copy(schemaJson = dataSchema.json), affectedFiles)
        .withColumn(BUCKET, KafkaMurmur2.kafkaPartition(col(key), nBuckets))
      val t = target.alias("t")
      val c = deduped.alias("c")
      val joined = t.join(c, t(key) === c(key), "full_outer")

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
        when(keepTarget, t(cn)).when(isDel, lit(null).cast(newSchema(cn).dataType))
          .otherwise(fromAfter).as(cn)
      }
      val keyOut = coalesce(t(key), c(key))
      val merged = joined
        .withColumn(ACTION, action)
        .select(outCols.updated(payloadCols.indexOf(key), keyOut.as(key)) ++ Seq(
          when(keepTarget, t(LSN)).otherwise(c("lsn")).as(LSN),
          when(keepTarget, wasTombstone).otherwise(isDel).as(DELETED),
          col(ACTION),
          KafkaMurmur2.kafkaPartition(keyOut, nBuckets).as(BUCKET)): _*)
        .persist(StorageLevel.MEMORY_AND_DISK)

      // Stats in one small agg over the persisted merge result + join stats.
      val actionCounts = joined.withColumn(ACTION, action)
        .groupBy(ACTION).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap

      // 5. Write surviving rows of touched buckets, key-sorted, bounded files.
      val version = snap.version + 1
      val newFiles: List[DataFileMeta] =
        if (merged.isEmpty) Nil
        else writeDataFiles(table, snap, merged.drop(ACTION), version)

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
      val keptFiles = snap.files.filterNot(f => affectedPaths.contains(f.path))
      val lineage = updateLineage(snap.lineage, newFiles, stats)
      table.commit(snap.copy(
        version = version,
        schemaJson = newSchema.json,
        files = keptFiles ++ newFiles,
        committedEpochs = snap.committedEpochs :+ epochKey,
        lineage = lineage,
        parentVersion = snap.version,
        stats = Some(stats)))
      merged.unpersist()
      stats
    } finally {
      deduped.unpersist()
    }
  }

  /** Write data-schema rows bucket-partitioned and key-sorted; return per-file
    * manifest entries (stats gathered in one pass over just-written files —
    * O(changed data)). `df` must carry the table's payload + internal columns;
    * the bucket is (re)computed from the key. */
  private[graft] def writeDataFiles(table: IceLiteTable, snap: Snapshot,
                                    df: DataFrame, version: Long): List[DataFileMeta] = {
    val spark = table.spark
    val key = snap.keyColumn
    val commitId = UUID.randomUUID().toString.take(8)
    val outDir = s"${table.root}/data/c$version-$commitId"
    val withBucket =
      if (df.columns.contains(BUCKET)) df
      else df.withColumn(BUCKET, KafkaMurmur2.kafkaPartition(col(key), snap.numBuckets))
    withBucket
      .repartition(col(BUCKET))
      .sortWithinPartitions(col(BUCKET), col(key))
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile(spark))
      .partitionBy(BUCKET)
      .parquet(outDir)
    spark.read.parquet(outDir)
      .groupBy(input_file_name().as("f"), col(BUCKET))
      .agg(min(col(key)).as("mn"), max(col(key)).as("mx"), count(lit(1)).as("n"),
        sum(col(DELETED).cast("long")).as("tomb"))
      .collect()
      .map { r =>
        val abs = r.getString(0).stripPrefix("file://").stripPrefix("file:")
        val rel = abs.stripPrefix(s"${table.root}/").stripPrefix(table.root).stripPrefix("/")
        DataFileMeta(rel, r.getInt(1), r.getLong(4), r.getString(2), r.getString(3), r.getLong(5))
      }.toList
  }

  /** Additive evolution: batch may add columns; common columns must keep
    * their type (renames happen upstream in the SMT chain). */
  private[merge] def evolveSchema(table: StructType, batch: StructType): StructType = {
    val existing = table.fieldNames.toSet
    batch.fields.filter(f => existing.contains(f.name)).foreach { f =>
      val tf = table(f.name)
      require(org.apache.spark.sql.graftbridge.Exprs.sameTypeIgnoreNullability(tf.dataType, f.dataType),
        s"Incompatible type evolution for column ${f.name}: table=${tf.dataType.catalogString} batch=${f.dataType.catalogString}")
    }
    val added = batch.fields.filterNot(f => existing.contains(f.name))
      .map(_.copy(nullable = true)) // evolved columns are null for old rows
    StructType(table.fields ++ added)
  }

  private def updateLineage(prev: Map[String, Long], newFiles: Seq[DataFileMeta], s: CommitStats): Map[String, Long] = {
    val perBucket = newFiles.groupBy(_.bucket).map { case (b, fs) =>
      s"applied.bucket.$b" -> (prev.getOrElse(s"applied.bucket.$b", 0L) + fs.map(_.rows).sum)
    }
    prev ++ perBucket ++ Map(
      "applied.inserts" -> (prev.getOrElse("applied.inserts", 0L) + s.inserted),
      "applied.updates" -> (prev.getOrElse("applied.updates", 0L) + s.updated),
      "applied.deletes" -> (prev.getOrElse("applied.deletes", 0L) + s.deleted),
      "applied.epochs" -> (prev.getOrElse("applied.epochs", 0L) + 1L))
  }

  private def maxRecordsPerFile(spark: SparkSession): Long =
    spark.conf.getOption("graft.merge.maxRecordsPerFile").map(_.toLong).getOrElse(1000000L)

  // Helper: Seq[Row] -> java List for createDataFrame.
  private implicit class SeqRowOps(val rows: Seq[Row]) extends AnyVal {
    def asJava2(spark: SparkSession): java.util.List[Row] = {
      val l = new java.util.ArrayList[Row](rows.size)
      rows.foreach(l.add)
      l
    }
  }
}
