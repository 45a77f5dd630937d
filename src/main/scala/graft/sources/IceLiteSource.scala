package graft.sources

import java.util.{Map => JMap}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.hashing.KafkaMurmur2
import graft.merge.{MergeInto, PatchFoldAgg}
import graft.table.{CdcOut, DataFileMeta, IceLite, IceLiteTable, Snapshot}

/**
 * DataSource V2 read connector for IceLite tables — the STANDARD-API
 * surface: `spark.read.format("icelite").load(path)` (and SQL
 * `CREATE TEMPORARY VIEW v USING icelite OPTIONS (path '...')`) next to
 * the library-native `IceLiteTable.read()` / `icelite_scan(...)` TVF.
 *
 * What Catalyst sees is a first-class V2 scan:
 *  - column pruning reaches the parquet readers (only requested + the
 *    table's internal resolution columns are materialized);
 *  - pushed filters prune MANIFEST-side before any file opens: key
 *    equality/IN prunes to the keys' buckets (and, on COW, to files whose
 *    key range can hold them), and range predicates over
 *    `write.stats.columns` zone maps (or the key itself) skip files (COW)
 *    or whole buckets (MOR/patch) — the same planning
 *    [[IceLiteTable.lookup]] / [[IceLiteTable.scanRange]] do;
 *  - `estimateStatistics` reports manifest row counts (post-prune), so
 *    joins against a small IceLite table auto-broadcast.
 *
 * Read-side resolution happens INSIDE the partition readers with zero
 * shuffle, because the layout guarantees a key's rows never leave its
 * bucket: COW partitions stream file-at-a-time (tombstones filtered);
 * MOR (lww) partitions read their bucket's base+delta files and keep the
 * max-`__lsn` row per key in a hash map UP TO a memory watermark
 * (`graft.icelite.maxResolveKeysInMemory`), beyond which the partition
 * re-resolves through Spark's external row sorter — disk-spilling, so an
 * over-grown bucket degrades to sort instead of OOMing the executor
 * (see [[BucketResolve]]); MOR+patch partitions
 * drive the exact [[PatchFoldAgg]] kernel per key — one code path for
 * the agg and the connector, so the two can never diverge. Rows
 * materialize through Spark's own parquet `RecordMaterializer`
 * ([[ParquetReadSupport]]'s public no-arg constructor, the documented
 * third-party `ParquetReader` entry point), which also null-fills
 * columns added by schema evolution and reads renamed columns under
 * their immutable physical names.
 *
 * All pushed filters are ALSO returned as residuals — pruning is an
 * optimization, Spark re-applies the exact predicate above the scan.
 *
 * Options: `path` (required), `version` (time travel), `tag` (named
 * snapshot). The snapshot is pinned when the table object is created, so
 * a multi-stage query reads one consistent version.
 */
class IceLiteDataSource extends TableProvider with DataSourceRegister
  with org.apache.spark.sql.sources.StreamSinkProvider {
  override def shortName(): String = "icelite"

  override def supportsExternalMetadata(): Boolean = false

  /** Streaming sink: `df.writeStream.format("icelite").option("path", p)`.
    * Each micro-batch upserts through [[IceLiteWrites.append]] under epoch
    * `<epochPrefix>/<batchId>` — batchIds are contiguous-from-zero, exactly
    * the shape the epoch-ledger watermark compacts, and a batch replayed
    * after a crash hits its committed epoch and no-ops: exactly-once sink
    * semantics with the consumer's own checkpoint. Change-shape batches
    * (`key, op, lsn, after`) carry deletes; plain rows upsert by LWW. */
  override def createSink(sqlContext: org.apache.spark.sql.SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val lower = parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    val path = lower.getOrElse("path",
      throw new IllegalArgumentException("icelite sink: `path` option is required"))
    if (outputMode == org.apache.spark.sql.streaming.OutputMode.Complete())
      throw new UnsupportedOperationException(
        "icelite sink: Complete mode is unsupported (append/update batches upsert)")
    // Epoch prefix defaults to a checkpoint-derived value: batchIds restart
    // at 0 under a FRESH checkpoint, and a constant prefix would make the
    // new query's batches silently no-op against the old run's committed
    // epochs. Same checkpoint -> same prefix -> resume stays exactly-once.
    // With NEITHER option present (checkpoint set via conf / default dir,
    // invisible here) there is no safe derivation — fail fast rather than
    // risk silent data loss on the second query against this path.
    val prefix = lower.getOrElse("epochprefix",
      lower.get("checkpointlocation")
        .map(c => "sink-" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(c)))
        .getOrElse(throw new IllegalArgumentException(
          "icelite sink: pass `checkpointLocation` (or `epochPrefix`) as a " +
            "writeStream OPTION — a checkpoint configured only via " +
            "spark.sql.streaming.checkpointLocation is not visible to the " +
            "sink, and without it epoch keys cannot be made unique per " +
            "query (a fresh checkpoint would silently no-op against a " +
            "previous run's committed epochs)")))
    new org.apache.spark.sql.execution.streaming.Sink {
      override def addBatch(batchId: Long, data: org.apache.spark.sql.DataFrame): Unit =
        IceLiteWrites.append(
          org.apache.spark.sql.graftbridge.Exprs.asBatch(data), path,
          k => lower.get(k.toLowerCase(java.util.Locale.ROOT)), s"$prefix/$batchId")
      override def toString: String = s"IceLiteSink[$path]"
    }
  }

  /** One provider instance serves one read: `inferSchema` and `getTable`
    * both call [[load]], which would otherwise read the snapshot (and
    * manifest shards) twice — and a commit landing between the two calls
    * would pin a DIFFERENT snapshot than the schema Spark planned with.
    * The memo makes the pair share one loaded table. */
  @volatile private var memo: (java.util.Map[String, String], IceLiteSparkTable) = _

  private def load(options: CaseInsensitiveStringMap): IceLiteSparkTable = {
    val m = memo
    if (m != null && m._1.equals(options.asCaseSensitiveMap())) return m._2
    val t = doLoad(options)
    memo = (new java.util.HashMap[String, String](options.asCaseSensitiveMap()), t)
    t
  }

  private def doLoad(options: CaseInsensitiveStringMap): IceLiteSparkTable = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("icelite: `path` option is required"))
    val spark = SparkSession.active
    if (!IceLite.exists(path)) {
      // Write-side create-on-first-append: `df.write.format("icelite")
      // .option("key", k).mode("append").save(path)` materializes the table
      // from the batch's schema. Reads of a missing table keep a clear error.
      if (!options.containsKey("key"))
        throw new IllegalStateException(
          s"icelite: no table at $path (to create one on write, pass option 'key')")
      return new IceLiteSparkTable(path, None, spark.sessionState.newHadoopConf())
    }
    val t = new IceLiteTable(spark, path)
    val snap = (Option(options.get("version")), Option(options.get("tag"))) match {
      case (Some(v), _) => t.snapshotAt(v.toLong)
      case (None, Some(tag)) => t.snapshotAt(t.tags.getOrElse(tag,
        throw new IllegalArgumentException(s"icelite: no tag '$tag' at $path")))
      case _ => t.snapshot
    }
    // The connector's readers (winner maps, change-feed diff) key their
    // hash maps on the STRING key the table contract prescribes; a
    // non-string key would ClassCastException deep in a task — fail the
    // plan with a clear message instead.
    require(snap.schema(snap.keyColumn).dataType == StringType,
      s"icelite: key column `${snap.keyColumn}` must be STRING " +
        s"(got ${snap.schema(snap.keyColumn).dataType.catalogString})")
    val changeFeed = options.getBoolean("changefeed", false)
    val includeBefore = options.getBoolean("includebefore", false)
    val startingVersion = Option(options.get("startingversion")) match {
      case Some("latest") => snap.version
      case Some(v) => v.toLong
      case None => 0L
    }
    val maxVersions = options.getLong("maxversionsperbatch", Long.MaxValue)
    new IceLiteSparkTable(path, Some(snap), spark.sessionState.newHadoopConf(),
      changeFeed, includeBefore, startingVersion, maxVersions)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    load(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    load(new CaseInsensitiveStringMap(properties))
}

class IceLiteSparkTable(path: String, snapOpt: Option[Snapshot], hadoopConf: Configuration,
                        changeFeed: Boolean = false, includeBefore: Boolean = false,
                        startingVersion: Long = 0L, maxVersionsPerBatch: Long = Long.MaxValue)
  extends Table with SupportsRead
  with org.apache.spark.sql.connector.catalog.SupportsWrite
  with org.apache.spark.sql.connector.catalog.SupportsDelete {

  private def snap: Snapshot = snapOpt.getOrElse(
    throw new IllegalStateException(s"icelite: no table at $path yet (write-side create pending)"))

  /** `DELETE FROM <catalog>.ns.t WHERE ...` — Spark's analyzer hands the
    * condition as V1 filters (the SupportsDelete mixin adapts V2
    * predicates); translated to a Column, the delete rides the engine's
    * merge-path correction ([[graft.table.IceLiteTable.deleteWhere]]):
    * victims' buckets only, rebasing commit, statement-digest
    * exactly-once. An untranslatable condition declines here and Spark
    * reports it can't delete, rather than silently over-deleting. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => IceLiteFilters.toColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    import org.apache.spark.sql.functions.lit
    val cond = filters.toSeq.map(f => IceLiteFilters.toColumn(f).getOrElse(
      throw new UnsupportedOperationException(s"icelite: cannot delete by $f")))
      .reduceOption(_ && _).getOrElse(lit(true))
    IceLite.load(SparkSession.active, path).deleteWhere(cond): Unit
  }

  override def name(): String =
    if (changeFeed) s"icelite.`$path` changes" else s"icelite.`$path`"
  override def schema(): StructType =
    if (changeFeed) CdcOut.changeSchema(snap, includeBefore)
    else snapOpt.map(_.schema).getOrElse(new StructType())
  override def capabilities(): java.util.Set[TableCapability] =
    if (changeFeed)
      java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
    else java.util.EnumSet.of(TableCapability.BATCH_READ,
      // BATCH_WRITE routes DataFrameWriter.save through the V2 path;
      // V1_BATCH_WRITE makes the planner pick the V1 fallback exec for the
      // driver-orchestrated merge; ACCEPT_ANY_SCHEMA defers shape checks to
      // the insert (both change-stream and plain-row batches are legal).
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    if (changeFeed)
      () => new IceLiteChangeScan(path, snap, hadoopConf, includeBefore,
        startingVersion, maxVersionsPerBatch)
    else new IceLiteScanBuilder(path, snap, hadoopConf)

  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new IceLiteWriteBuilder(path, info.options())
}

class IceLiteScanBuilder(path: String, snap: Snapshot, hadoopConf: Configuration)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
  with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private var required: StructType = snap.schema
  private var used: Array[Filter] = Array.empty
  private var countStar = false

  /** Metadata-only `count(*)`: a filterless, group-less count over a COW
    * table whose files are all tombstone-free is answered from the manifest
    * (sum of row counts) — zero files open. The manifest's `tombstones` is
    * a PRESENCE FLAG (0/1, footerStats), not a row count, so any flagged
    * file declines the pushdown and the count stays exact through the
    * readers. MOR/patch decline (net winners are not knowable from counts),
    * as does any pushed filter (the manifest prune is best-effort and a
    * completely pushed aggregate has no residual re-application). */
  private def countPushable(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean =
    snap.writeMode != "mor" && used.isEmpty && keys.isEmpty && bounds.isEmpty &&
      snap.files.forall(_.tombstones == 0L) &&
      agg.groupByExpressions().isEmpty && agg.aggregateExpressions().length == 1 &&
      agg.aggregateExpressions()(0)
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    countPushable(agg)

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (!countPushable(agg)) return false
    countStar = true
    true
  }
  /** Pushed key-equality values (None = no key predicate). */
  private var keys: Option[Set[String]] = None
  /** Pushed per-column [lo, hi] bounds (logical column name). */
  private val bounds = mutable.Map.empty[String, (Option[String], Option[String])]

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // Preserve the table's field order for determinism; Spark passes the
    // pruned set, possibly reordered.
    val want = requiredSchema.fieldNames.toSet
    required = StructType(snap.schema.fields.filter(f => want.contains(f.name)))
  }

  private def str(v: Any): String = String.valueOf(v)

  private def narrow(col: String, lo: Option[String], hi: Option[String]): Unit = {
    val (clo, chi) = bounds.getOrElse(col, (None, None))
    // Latest bound per side wins; with multiple bounds on one column this
    // can only keep a LOOSER range than the conjunction — pruning stays
    // sound (conservative) and the exact predicate re-applies above the
    // scan.
    bounds(col) = (lo.orElse(clo), hi.orElse(chi))
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val usable = mutable.ArrayBuffer.empty[Filter]
    filters.foreach {
      case f @ EqualTo(a, v) if a == snap.keyColumn && v != null =>
        keys = Some(keys.getOrElse(Set.empty) ++ Set(str(v))); usable += f
      case f @ EqualNullSafe(a, v) if a == snap.keyColumn && v != null =>
        keys = Some(keys.getOrElse(Set.empty) ++ Set(str(v))); usable += f
      case f @ In(a, vs) if a == snap.keyColumn && vs != null && vs.nonEmpty && !vs.contains(null) =>
        keys = Some(keys.getOrElse(Set.empty) ++ vs.map(str).toSet); usable += f
      case f @ EqualTo(a, v) if v != null && prunableCol(a) =>
        narrow(a, Some(str(v)), Some(str(v))); usable += f
      case f @ GreaterThan(a, v) if v != null && prunableCol(a) =>
        narrow(a, Some(str(v)), None); usable += f
      case f @ GreaterThanOrEqual(a, v) if v != null && prunableCol(a) =>
        narrow(a, Some(str(v)), None); usable += f
      case f @ LessThan(a, v) if v != null && prunableCol(a) =>
        narrow(a, None, Some(str(v))); usable += f
      case f @ LessThanOrEqual(a, v) if v != null && prunableCol(a) =>
        narrow(a, None, Some(str(v))); usable += f
      case _ => ()
    }
    used = usable.toArray
    filters // everything stays a residual: pruning is best-effort
  }

  /** A column we can prune files by: the key (manifest min/max) or a
    * column with zone-map stats in at least one file. */
  private def prunableCol(logical: String): Boolean =
    logical == snap.keyColumn || {
      val phys = snap.physicalName(logical)
      snap.files.exists(_.colStats.contains(phys))
    }

  override def pushedFilters(): Array[Filter] = used

  override def build(): Scan =
    if (countStar) new IceLiteCountScan(snap)
    else new IceLiteScan(path, snap, hadoopConf, required, keys, bounds.toMap)
}

/** Completely pushed `count(*)`: one row, straight from the manifest.
  * Only planned when every file is tombstone-free (see `countPushable`),
  * so live rows = stored rows. */
class IceLiteCountScan(snap: Snapshot) extends Scan with Batch {
  private val total = snap.files.map(_.rows).sum
  override def readSchema(): StructType =
    StructType(Seq(StructField("count(*)", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String = s"IceLiteCountScan rows=$total (manifest-only)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(IceLiteCountPartition(total))
  override def createReaderFactory(): PartitionReaderFactory = IceLiteCountReaderFactory()
}

final case class IceLiteCountPartition(count: Long) extends InputPartition

final case class IceLiteCountReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = if (emitted) false else { emitted = true; true }
      override def get(): InternalRow = new GenericInternalRow(
        Array[Any](partition.asInstanceOf[IceLiteCountPartition].count))
      override def close(): Unit = ()
    }
}

class IceLiteScan(path: String, snap: Snapshot, hadoopConf: Configuration,
                  required: StructType, pushedKeys: Option[Set[String]],
                  bounds: Map[String, (Option[String], Option[String])])
  extends Scan with Batch with SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

  /** Key values delivered at RUNTIME (DPP-style: the build side of a join
    * on the key finishes first and its key set lands here before
    * `planInputPartitions`). Conjunctive with the statically pushed set. */
  @volatile private var runtimeKeys: Option[Set[String]] = None

  /** Effective key predicate: intersection of static and runtime sets. */
  private def keys: Option[Set[String]] = (pushedKeys, runtimeKeys) match {
    case (Some(a), Some(b)) => Some(a.intersect(b))
    case (a, b) => a.orElse(b)
  }

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(snap.keyColumn))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In(a, vs) if a == snap.keyColumn && vs != null =>
      runtimeKeys = Some(vs.filter(_ != null).map(String.valueOf).toSet)
    case EqualTo(a, v) if a == snap.keyColumn && v != null =>
      runtimeKeys = Some(Set(String.valueOf(v)))
    case _ => () // unsupported runtime shape: keep the full plan (sound)
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val k = keys.map(ks => s" keys=${ks.size}").getOrElse("")
    val b = if (bounds.isEmpty) "" else s" bounds=${bounds.keys.mkString(",")}"
    s"IceLiteScan v${snap.version} mode=${snap.writeMode}/${snap.fold} files=${keptFiles.length}$k$b"
  }

  /** Manifest-side pruning (driver-only, no job): COW prunes per file; MOR
    * and patch prune whole BUCKETS (a kept file nominates its bucket, and
    * the bucket's other files must be read so winners resolve against the
    * full per-key history — dropping them could elect a stale row).
    * Recomputed per call — runtime filters may land between planning and
    * execution; the work is a driver-side pass over the manifest. */
  private def keptFiles: Seq[DataFileMeta] = {
    val keys = this.keys
    val keyBuckets = keys.map(_.map(k => KafkaMurmur2.bucketLabelOf(k, snap.numBuckets)))

    def fileMatches(f: DataFileMeta): Boolean = {
      val keyOk = keys match {
        case None => true
        case Some(ks) =>
          keyBuckets.get.contains(f.bucket) &&
            (snap.writeMode == "mor" || ks.exists(f.keyInRange))
      }
      keyOk && bounds.forall { case (col, (lo, hi)) =>
        if (col == snap.keyColumn) {
          f.keyRangeOverlaps(lo, hi)
        } else {
          val phys = snap.physicalName(col)
          f.colStats.get(phys).forall { r =>
            r.overlaps(lo.getOrElse(r.min), hi.getOrElse(r.max))
          }
        }
      }
    }

    val nominated = snap.files.filter(fileMatches)
    if (snap.writeMode != "mor") nominated
    else {
      val bks = nominated.map(_.bucket).toSet
      snap.files.filter(f => bks.contains(f.bucket))
    }
  }

  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = keptFiles.map(_.rows).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(math.max(1L, rows * required.defaultSize))
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(rows)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    def abs(f: DataFileMeta): String = s"$path/${f.path}"
    if (snap.writeMode != "mor")
      keptFiles.sortBy(_.path).map(f => IceLitePartition(Array(abs(f)))).toArray
    else
      keptFiles.groupBy(_.bucket).toSeq.sortBy(_._1).map { case (_, fs) =>
        IceLitePartition(fs.map(abs).sortBy(identity).toArray)
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // Internal read schema under PHYSICAL names: required payload columns
    // + key + __lsn/__deleted (+ __reset for patch). Ordinals are fixed
    // here so the readers do zero name lookups.
    val patch = snap.fold == "patch"
    val mode = if (snap.writeMode != "mor") "cow" else if (patch) "patch" else "mor"
    val payloadNames = required.fieldNames.toSeq
    val withKey =
      if (mode == "cow" || payloadNames.contains(snap.keyColumn)) payloadNames
      else payloadNames :+ snap.keyColumn
    val internalLogical = StructType(
      withKey.map(n => snap.schema(n)) ++
        Seq(StructField(MergeInto.LSN, LongType), StructField(MergeInto.DELETED, BooleanType)) ++
        (if (patch) Seq(StructField(MergeInto.RESET, LongType)) else Nil))
    val internalPhys = StructType(internalLogical.fields.map(f =>
      f.copy(name = snap.physicalName(f.name), nullable = true)))
    val outOrds = required.fieldNames.map(n => withKey.indexOf(n))
    val keyOrd = if (mode == "cow") -1 else withKey.indexOf(snap.keyColumn)
    val lsnOrd = withKey.length
    val delOrd = withKey.length + 1
    val resetOrd = if (patch) withKey.length + 2 else -1
    val confKV = IceLiteSourceConf.captureKV(hadoopConf)
    // Pushed key values ride to the readers so parquet can skip ROW GROUPS
    // (stats + dictionary + bloom when written), not just whole files —
    // the same deep prune the native lookup() path gets. Sound in every
    // mode: a key's winner depends only on that key's rows, and Spark
    // re-applies the exact predicate above the scan. Very large IN-sets
    // stay manifest-pruned only (a 1000-way OR predicate costs more to
    // evaluate per row group than it saves).
    val pushedKeyValues = keys.filter(_.size <= 1000).map(_.toArray.sorted).orNull
    IceLiteReaderFactory(mode, confKV, internalPhys.json, required.json,
      outOrds, keyOrd, lsnOrd, delOrd, resetOrd,
      IceLiteSourceConf.maxResolveKeysInMemory(SparkSession.active),
      pushedKeyValues, snap.physicalName(snap.keyColumn))
  }
}

final case class IceLitePartition(files: Array[String]) extends InputPartition

final case class IceLiteReaderFactory(
    mode: String, confKV: Array[(String, String)],
    internalSchemaJson: String, outputSchemaJson: String,
    outOrds: Array[Int], keyOrd: Int, lsnOrd: Int, delOrd: Int, resetOrd: Int,
    maxResolveKeys: Long = Long.MaxValue,
    pushedKeyValues: Array[String] = null, physKeyName: String = null)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[IceLitePartition]
    val internal = DataType.fromJson(internalSchemaJson).asInstanceOf[StructType]
    val output = DataType.fromJson(outputSchemaJson).asInstanceOf[StructType]
    new IceLitePartitionReader(p.files, mode, confKV, internal, output,
      outOrds, keyOrd, lsnOrd, delOrd, resetOrd, maxResolveKeys,
      IceLiteFilters.keyPredicate(pushedKeyValues, physKeyName))
  }
}

/** Per-partition reader. COW streams; MOR/patch resolve their bucket's
  * rows through [[BucketResolve.winnersIter]] — in-heap winner map up to
  * `maxResolveKeys` live keys, external-sort resolve (disk-spilling)
  * beyond it — then stream winners. A pushed key predicate reaches the
  * parquet readers so point reads skip row groups, not just files. */
final class IceLitePartitionReader(
    files: Array[String], mode: String, confKV: Array[(String, String)],
    internal: StructType, output: StructType,
    outOrds: Array[Int], keyOrd: Int, lsnOrd: Int, delOrd: Int, resetOrd: Int,
    maxResolveKeys: Long = Long.MaxValue,
    keyFilter: Option[org.apache.parquet.filter2.predicate.FilterPredicate] = None)
  extends PartitionReader[InternalRow] {

  private val conf = IceLiteSourceConf.restore(confKV, internal)

  private val outProj = UnsafeProjection.create(
    outOrds.toIndexedSeq.map(i => BoundReference(i, internal(i).dataType, nullable = true)
      : org.apache.spark.sql.catalyst.expressions.Expression))

  private val scanner = new RawFileScanner(files, conf, keyFilter)
  private var row: InternalRow = _
  private var resolved: Iterator[InternalRow] = _

  private def deleted(r: InternalRow): Boolean = !r.isNullAt(delOrd) && r.getBoolean(delOrd)

  /** Stream the partition's files record-at-a-time (COW path). */
  private def nextRaw(): InternalRow = scanner.next()

  /** Resolve the bucket (MOR paths) through the shared bounded
    * [[BucketResolve.winnersIter]] kernel, then rebuild live winners in
    * `internal` ordinal space so `outProj` applies. */
  private def resolveBucket(): Iterator[InternalRow] = {
    val payloadOrds = (0 until lsnOrd).filter(_ != keyOrd).toArray
    BucketResolve.winnersIter(files, conf, mode, internal,
      keyOrd, payloadOrds, lsnOrd, delOrd, resetOrd, _ => true, maxResolveKeys,
      keyFilter)
      .flatMap { case (k, w) =>
        if (w.deleted) None
        else {
          val vals = new Array[Any](internal.length)
          var i = 0
          while (i < payloadOrds.length) { vals(payloadOrds(i)) = w.payload(i); i += 1 }
          vals(keyOrd) = UTF8String.fromString(k)
          vals(lsnOrd) = java.lang.Long.valueOf(w.lsn)
          vals(delOrd) = java.lang.Boolean.FALSE
          Some(new GenericInternalRow(vals): InternalRow)
        }
      }
  }

  override def next(): Boolean = {
    if (mode == "cow") {
      var r = nextRaw()
      while (r != null && deleted(r)) r = nextRaw()
      row = r
      row != null
    } else {
      if (resolved == null) resolved = resolveBucket()
      if (resolved.hasNext) { row = resolved.next(); true } else { row = null; false }
    }
  }

  // The projection's buffer is reused across rows — the V2 row-reader
  // contract (same as Spark's own file readers); consumers copy if they
  // buffer. The winner maps hold owned copies already.
  override def get(): InternalRow = outProj(row)

  override def close(): Unit = scanner.close()
}

/** V1 `Filter` -> `Column` translation for the SupportsDelete surface.
  * Total for the filter shapes Spark's DML analyzer produces; `None` for
  * anything else, which makes the table DECLINE the delete (fail-safe:
  * never a broader delete than the user wrote). */
private[sources] object IceLiteFilters {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit, not}

  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case In(a, vs) if vs != null => Some(col(a).isin(vs.toIndexedSeq.map(lit(_)): _*))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case Or(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case Not(c) => toColumn(c).map(not)
    case _: AlwaysTrue => Some(lit(true))
    case _: AlwaysFalse => Some(lit(false))
    case _ => None
  }

  /** Parquet predicate `physKey IN (values)` for row-group / dictionary /
    * bloom skipping inside the readers (None when no keys were pushed). */
  def keyPredicate(values: Array[String], physKey: String)
      : Option[org.apache.parquet.filter2.predicate.FilterPredicate] = {
    import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
    import org.apache.parquet.io.api.Binary
    if (values == null || values.isEmpty || physKey == null) None
    else Some(values.map(v =>
      FilterApi.eq(FilterApi.binaryColumn(physKey), Binary.fromString(v)): FilterPredicate)
      .reduce(FilterApi.or))
  }
}

/** Hadoop-conf capture/restore shared by the batch and change-feed readers. */
private[sources] object IceLiteSourceConf {
  /** Watermark for the per-bucket in-heap winner map
    * (`graft.icelite.maxResolveKeysInMemory`, or derived from the executor
    * memory/cores conf the same way the merge sizes its agg fallback
    * threshold: ~15% of per-core heap at ~400 bytes per resolved entry,
    * clamped to [64k, 8M]). Past it the reader re-resolves through the
    * external sorter instead of growing the heap. */
  def maxResolveKeysInMemory(spark: SparkSession): Long =
    spark.conf.getOption("graft.icelite.maxResolveKeysInMemory").map(_.toLong)
      .getOrElse {
        def parseMemMb(s: String): Option[Long] = {
          val t = s.trim.toLowerCase(java.util.Locale.ROOT)
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
        val perTask = (memBytes * 0.15 / 400 / cores).toLong
        math.max(65536L, math.min(8000000L, perTask))
      }
  /** Driver-side: the session Hadoop conf plus the SQLConf keys Spark's
    * ParquetReadSupport / ParquetToSparkSchemaConverter read straight off
    * the Hadoop conf with `.toBoolean` (no default). */
  def captureKV(hadoopConf: Configuration): Array[(String, String)] = {
    val sqlConf = org.apache.spark.sql.internal.SQLConf.get
    import org.apache.spark.sql.internal.SQLConf._
    val sqlKV = Seq(
      PARQUET_BINARY_AS_STRING, PARQUET_INT96_AS_TIMESTAMP, CASE_SENSITIVE,
      PARQUET_INFER_TIMESTAMP_NTZ_ENABLED, LEGACY_PARQUET_NANOS_AS_LONG,
      PARQUET_FIELD_ID_READ_ENABLED, SESSION_LOCAL_TIMEZONE,
      PARQUET_REBASE_MODE_IN_READ, PARQUET_INT96_REBASE_MODE_IN_READ
    ).map(e => (e.key, String.valueOf(sqlConf.getConf(e))))
    (hadoopConf.iterator().asScala.map(e => (e.getKey, e.getValue)) ++ sqlKV).toArray
  }

  /** Executor-side: rebuild the conf and request the internal read schema.
    * File-scheme reads route through the fork-free local FS (the scanner's
    * per-file opens otherwise go through the checksummed default — a .crc
    * existence stat per open; see graft.table.NoPermLocalFileSystem). The
    * rebuilt conf is private to the scanner, so the override never touches
    * the session FS cache (disable.cache). */
  def restore(confKV: Array[(String, String)], internal: StructType): Configuration = {
    val c = new Configuration()
    confKV.foreach { case (k, v) => c.set(k, v) }
    graft.table.IceLite.localFsOptions("/").foreach { case (k, v) => c.set(k, v) }
    c.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, internal.json)
    c
  }
}

/** File-at-a-time record cursor over a partition's parquet files, through
  * Spark's own `RecordMaterializer` (null-fills evolved columns). An
  * optional parquet predicate skips row groups via column stats,
  * dictionaries, and bloom filters (when written), and drops non-matching
  * records — callers only pass predicates whose result set is exact for
  * their resolution (key-subset filters). */
private[sources] final class RawFileScanner(
    files: Array[String], conf: Configuration,
    filter: Option[org.apache.parquet.filter2.predicate.FilterPredicate] = None) {
  private var fileIdx = 0
  private var current: org.apache.parquet.hadoop.ParquetReader[InternalRow] = _

  private def openFile(f: String) = {
    val b = org.apache.parquet.hadoop.ParquetReader
      .builder[InternalRow](new ParquetReadSupport(), new Path(f))
      .withConf(conf)
    filter.fold(b)(p =>
      b.withFilter(org.apache.parquet.filter2.compat.FilterCompat.get(p))).build()
  }

  /** Next record, or null when the partition is exhausted. The returned row
    * buffer is REUSED by the materializer — copy anything you keep. */
  def next(): InternalRow = {
    while (true) {
      if (current == null) {
        if (fileIdx >= files.length) return null
        current = openFile(files(fileIdx)); fileIdx += 1
      }
      val r = current.read()
      if (r == null) { current.close(); current = null }
      else return r
    }
    null // unreachable
  }

  def close(): Unit =
    if (current != null) { current.close(); current = null }
}

/**
 * Write surface: `df.write.format("icelite").mode("append").save(path)`
 * routes through the merge engine as a V1 write (the merge is a
 * driver-orchestrated multi-job commit — exactly the shape the V1
 * fallback exists for; per-task V2 writers cannot express it).
 *
 * Two accepted input shapes, detected from the batch's schema:
 *  - change stream (`key, op, lsn, after`): passed to `merge` verbatim —
 *    upserts AND deletes, caller-controlled ordering;
 *  - plain rows in table schema: upserts at `lsn` = option `lsn` (or the
 *    current snapshot version + 1 — later appends win by LWW).
 *
 * Options: `epoch` (idempotence key — pass one to make a retried write
 * exactly-once; defaults to a fresh UUID per invocation), `lsn`, and for
 * create-on-first-append `key` (required), `buckets`, `write.*` table
 * properties. Appending to a missing path with `key` set CREATES the
 * table from the batch's schema. `ACCEPT_ANY_SCHEMA` skips Spark's
 * by-name append validation — the shapes above are checked here instead;
 * additive schema evolution flows through the merge like any CDC batch.
 */
private[sources] class IceLiteWriteBuilder(path: String, options: CaseInsensitiveStringMap)
  extends org.apache.spark.sql.connector.write.WriteBuilder {

  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.V1Write {
      override def toInsertableRelation: InsertableRelation = new InsertableRelation {
        override def insert(data: org.apache.spark.sql.DataFrame, overwrite: Boolean): Unit = {
          if (overwrite) throw new UnsupportedOperationException(
            "icelite: overwrite writes are not supported — append is an upsert; " +
              "use SQL DELETE / the merge API for removals")
          IceLiteWrites.append(data, path, k => Option(options.get(k)),
            Option(options.get("epoch")).getOrElse(java.util.UUID.randomUUID().toString))
        }
      }
    }
}

/** Shared append kernel for the batch V1 write and the streaming sink. */
private[sources] object IceLiteWrites {
  /** Upsert `data` into the table at `path` (creating it when absent and
    * `key` is given): change-shape batches pass to `merge` verbatim, plain
    * rows upsert at `lsn` (option, or snapshot version + 1). */
  def append(data: org.apache.spark.sql.DataFrame, path: String,
             opt: String => Option[String], epoch: String): Unit = {
    import org.apache.spark.sql.functions.{col, lit, struct}
    val spark = data.sparkSession
    val isChange = {
      val names = data.schema.fieldNames.toSet
      names("op") && names("lsn") && names("after") &&
        data.schema("after").dataType.isInstanceOf[StructType]
    }
    val table =
      if (IceLite.exists(path)) IceLite.load(spark, path)
      else {
        val key = opt("key").getOrElse(throw new IllegalArgumentException(
          s"icelite: creating $path on write requires option 'key'"))
        val payload =
          if (isChange) data.schema("after").dataType.asInstanceOf[StructType]
          else data.schema
        val props = Seq("write.mode", "write.merge.fold", "write.stats.columns")
          .flatMap(k => opt(k).map(k -> _)).toMap
        IceLite.create(spark, path, payload, key,
          opt("buckets").map(_.toInt).getOrElse(16), props)
      }
    val snap = table.snapshot
    val changes =
      if (isChange) data
      else {
        val key = snap.keyColumn
        // ACCEPT_ANY_SCHEMA means the table resolves columns itself:
        // `INSERT INTO t VALUES ...` arrives with positional names
        // (col1..colN) — map them to the table schema BY POSITION (with a
        // cast), the standard INSERT contract. The fallback fires ONLY for
        // Spark's positional aliases: a same-arity batch with real (but
        // wrong/reordered) column names must keep failing fast on the
        // missing key below, not silently write mis-mapped data through
        // non-ANSI casts. Batches that carry the key column resolve by
        // name (order-free, additive evolution allowed).
        val positionalNames =
          (1 to data.schema.length).map(i => s"col$i") == data.schema.fieldNames.toSeq
        val batch =
          if (!data.schema.fieldNames.contains(key) && positionalNames &&
              data.schema.length == snap.schema.length) {
            val renamed = data.toDF(snap.schema.fieldNames.toIndexedSeq: _*)
            renamed.select(snap.schema.fields.toIndexedSeq.map(f =>
              col(f.name).cast(f.dataType).as(f.name)): _*)
          } else data
        require(batch.schema.fieldNames.contains(key),
          s"icelite append: batch must carry the key column `$key` " +
            s"(got ${data.schema.fieldNames.mkString(", ")})")
        val lsn = opt("lsn").map(_.toLong).getOrElse(snap.version + 1)
        batch.select(col(key), lit("u").as("op"), lit(lsn).as("lsn"),
          struct(batch.columns.toIndexedSeq.map(col): _*).as("after"))
      }
    table.merge(changes, epoch): Unit
  }
}

// ---------------------------------------------------------------------------
// Change feed: batch CDF + Structured Streaming tail over the version ledger
// ---------------------------------------------------------------------------

/** Offset = table version; snapshots are immutable, so a (from, to] version
  * range always re-plans to the same change rows — replay after failure is
  * deterministic, which is what makes a checkpointed downstream exactly-once
  * with any idempotent sink. */
final case class IceLiteOffset(version: Long)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"""{"version":$version}"""
}

private[sources] object IceLiteOffset {
  private val Re = """\{"version":(\d+)\}""".r
  def parse(json: String): IceLiteOffset = json.trim match {
    case Re(v) => IceLiteOffset(v.toLong)
    case other => throw new IllegalArgumentException(s"bad icelite offset: $other")
  }
}

/**
 * Change-feed scan: `spark.read.format("icelite").option("changeFeed",
 * "true")` (batch CDF from `startingVersion`, default 0 = full history as
 * inserts) and `spark.readStream.format("icelite").option("changeFeed",
 * "true")` — a Structured Streaming CDC tail STRAIGHT off the table's
 * version ledger, no export step. Offsets are table versions; each
 * micro-batch emits the net row-level changes of the committed range
 * since the last batch, in [[CdcOut.changeSchema]] shape (`change_op`
 * insert/update/delete, `lsn`, payload, optional `before_*` pre-images).
 *
 * Scale posture (same as [[IceLiteTable.changesBetween]]): only buckets
 * that gained a file in the range are planned — one input partition per
 * touched bucket; a key's winner never leaves its bucket, so each reader
 * resolves its bucket's before/after winners locally and diffs them with
 * ZERO shuffle. On MOR/patch tables the range's added delta files name
 * the changed keys exactly, and both sides restrict to those keys first —
 * per-partition memory is O(changed keys in bucket), not O(live keys).
 * COW rewrites whole buckets, so its readers diff full bucket maps (the
 * same O(bucket) the write amplification already paid).
 *
 * The output schema and physical column mapping are PINNED at stream
 * start. Additive evolution mid-stream is safe (new columns are simply
 * absent until restart); restart the stream to pick up renames/widening.
 */
class IceLiteChangeScan(path: String, startSnap: Snapshot, hadoopConf: Configuration,
                        includeBefore: Boolean, startingVersion: Long,
                        maxVersionsPerBatch: Long = Long.MaxValue)
  extends Scan {

  override def readSchema(): StructType = CdcOut.changeSchema(startSnap, includeBefore)
  override def description(): String =
    s"IceLiteChangeFeed `$path` from v$startingVersion" +
      (if (includeBefore) " +before" else "")

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      IceLiteChangeFeed.planPartitions(path, startingVersion, startSnap.version)
    override def createReaderFactory(): PartitionReaderFactory =
      IceLiteChangeFeed.readerFactory(startSnap, hadoopConf, includeBefore)
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new IceLiteChangeStream(path, startSnap, hadoopConf, includeBefore,
      startingVersion, maxVersionsPerBatch)
}

/** Micro-batch tail: `latestOffset` polls the ledger's HEAD version (one
  * small JSON read per trigger); planning is manifest-only. Admission
  * control caps each batch at `maxVersionsPerBatch` committed versions —
  * a tail resuming after long downtime catches up in bounded bites
  * instead of one giant replay batch. */
class IceLiteChangeStream(path: String, startSnap: Snapshot, hadoopConf: Configuration,
                          includeBefore: Boolean, startingVersion: Long,
                          maxVersionsPerBatch: Long = Long.MaxValue)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  override def initialOffset(): Offset = IceLiteOffset(startingVersion)

  private def headVersion: Long =
    new IceLiteTable(SparkSession.active, path).snapshot.version

  /** Trigger.AvailableNow pins the catch-up target here — implementing the
    * interface ourselves keeps per-batch admission control live (Spark's
    * generic wrapper would pin the head AND bypass the batch cap). */
  @volatile private var availableNowTarget: Long = -1L

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = headVersion

  private def head: Long =
    if (availableNowTarget >= 0) availableNowTarget else headVersion

  override def latestOffset(): Offset = IceLiteOffset(head)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[IceLiteOffset].version
    val h = head
    val step = math.max(1L, maxVersionsPerBatch)
    IceLiteOffset(if (h - from <= step) h else from + step)
  }

  override def reportLatestOffset(): Offset = IceLiteOffset(head)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    IceLiteChangeFeed.planPartitions(path,
      start.asInstanceOf[IceLiteOffset].version, end.asInstanceOf[IceLiteOffset].version)

  override def createReaderFactory(): PartitionReaderFactory =
    IceLiteChangeFeed.readerFactory(startSnap, hadoopConf, includeBefore)

  override def deserializeOffset(json: String): Offset = IceLiteOffset.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] object IceLiteChangeFeed {

  /** One input partition per bucket that gained OR LOST a file in
    * (fromV, toV]. Removed-only buckets matter: a compaction can leave a
    * bucket with zero files (every key tombstoned and the tombstones
    * dropped below the watermark) — keyed off added files alone, that
    * bucket would plan no partition and its delete events would be missed
    * ([[graft.table.IceLiteTable.changesBetweenSnapshots]] nominates the
    * same way). Buckets untouched in the range still plan nothing. */
  def planPartitions(path: String, fromV: Long, toV: Long): Array[InputPartition] = {
    if (fromV >= toV) return Array.empty
    val t = new IceLiteTable(SparkSession.active, path)
    val from = t.snapshotAt(fromV)
    val to = t.snapshotAt(toV)
    val fromPaths = from.files.map(_.path).toSet
    val toPaths = to.files.map(_.path).toSet
    val added = to.files.filterNot(f => fromPaths(f.path))
    val removed = from.files.filterNot(f => toPaths(f.path))
    val buckets = (added.map(_.bucket) ++ removed.map(_.bucket)).toSet
    def abs(p: String): String = s"$path/$p"
    buckets.toSeq.sorted.map { b =>
      IceLiteChangePartition(b,
        from.files.filter(_.bucket == b).map(f => abs(f.path)).sorted.toArray,
        to.files.filter(_.bucket == b).map(f => abs(f.path)).sorted.toArray,
        added.filter(_.bucket == b).map(f => abs(f.path)).sorted.toArray,
        removed.filter(_.bucket == b).map(f => abs(f.path)).sorted.toArray)
    }.toArray
  }

  /** Internal read layout (physical names, fixed ordinals) + output schema. */
  def readerFactory(snap: Snapshot, hadoopConf: Configuration,
                    includeBefore: Boolean): PartitionReaderFactory = {
    val patch = snap.fold == "patch"
    val mode = if (snap.writeMode != "mor") "cow" else if (patch) "patch" else "mor"
    val fields = snap.schema.fields.toSeq
    val internalLogical = StructType(
      fields ++
        Seq(StructField(MergeInto.LSN, LongType), StructField(MergeInto.DELETED, BooleanType)) ++
        (if (patch) Seq(StructField(MergeInto.RESET, LongType)) else Nil))
    val internalPhys = StructType(internalLogical.fields.map(f =>
      f.copy(name = snap.physicalName(f.name), nullable = true)))
    val keyOrd = fields.indexWhere(_.name == snap.keyColumn)
    val payloadOrds = fields.indices.filterNot(_ == keyOrd).toArray
    val lsnOrd = fields.length
    val delOrd = fields.length + 1
    val resetOrd = if (patch) fields.length + 2 else -1
    IceLiteChangeReaderFactory(mode, IceLiteSourceConf.captureKV(hadoopConf),
      internalPhys.json, CdcOut.changeSchema(snap, includeBefore).json,
      keyOrd, payloadOrds, lsnOrd, delOrd, resetOrd, includeBefore,
      IceLiteSourceConf.maxResolveKeysInMemory(SparkSession.active))
  }
}

final case class IceLiteChangePartition(bucket: Int, fromFiles: Array[String],
                                        toFiles: Array[String], addedFiles: Array[String],
                                        removedFiles: Array[String])
  extends InputPartition

final case class IceLiteChangeReaderFactory(
    mode: String, confKV: Array[(String, String)],
    internalSchemaJson: String, outputSchemaJson: String,
    keyOrd: Int, payloadOrds: Array[Int], lsnOrd: Int, delOrd: Int, resetOrd: Int,
    includeBefore: Boolean, maxResolveKeys: Long = Long.MaxValue)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[IceLiteChangePartition]
    val internal = DataType.fromJson(internalSchemaJson).asInstanceOf[StructType]
    new IceLiteChangeReader(p, mode, confKV, internal,
      keyOrd, payloadOrds, lsnOrd, delOrd, resetOrd, includeBefore, maxResolveKeys)
  }
}

/** The ONE per-bucket winner-resolution kernel, shared by the batch reader
  * (MOR/patch resolution) and the change-feed reader (before/after sides of
  * the diff) — a fix to the fold or the tie contract lands in both by
  * construction.
  *
  * MEMORY BOUND: the hash-map resolve is O(live keys in the bucket), which
  * is the bucket's design bound at write time — but nothing used to enforce
  * it, so a 100x-grown bucket could OOM an executor through the
  * standard-API read path while the native plan (ObjectHashAggregate)
  * degraded gracefully to sort. [[winnersIter]] closes that: past
  * `maxInHeapKeys` entries it abandons the map and re-resolves the
  * partition through Spark's own external row sorter
  * (task-memory-managed, spills to disk) streaming first-winner-per-key —
  * the same sort-based fallback shape the agg path has. */
private[sources] object BucketResolve {
  /** Resolved per-key winner: lsn, dead?, payload values (payloadOrds order,
    * values copied out of the materializer's reused buffer). */
  final case class W(lsn: Long, deleted: Boolean, payload: Array[Any])

  /** Control-flow marker: the in-heap winner map passed its watermark. */
  private final class SpillToSort extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  /** The patch-fold machinery shared by the map path and the sort path —
    * both drive the exact [[PatchFoldAgg]] kernel, so the connector and
    * the SQL agg can never diverge. */
  private final class PatchKernel(internal: StructType, payloadOrds: Array[Int],
                                  lsnOrd: Int, delOrd: Int, resetOrd: Int) {
    val payload: StructType = StructType(payloadOrds.map(i => internal(i)))
    private val evType = StructType(Seq(
      StructField("lsn", LongType, nullable = false),
      StructField("op", StringType),
      StructField("after", payload),
      StructField("reset", LongType)))
    val agg: PatchFoldAgg = PatchFoldAgg(BoundReference(0, evType, nullable = true))
    private val holder = new GenericInternalRow(1)

    def update(buf: PatchFoldAgg.Buf, r: InternalRow, isDel: Boolean,
               afterVals: Array[Any]): Unit = {
      val ev = new GenericInternalRow(Array[Any](
        r.getLong(lsnOrd),
        UTF8String.fromString(if (isDel) "d" else "u"),
        if (isDel) null else new GenericInternalRow(afterVals),
        if (resetOrd < 0 || r.isNullAt(resetOrd)) null
        else java.lang.Long.valueOf(r.getLong(resetOrd))))
      holder.update(0, ev)
      agg.update(buf, holder): Unit
    }

    /** Fold result -> winner, or null when the fold produced nothing. */
    def eval(buf: PatchFoldAgg.Buf): W = {
      val w = agg.eval(buf).asInstanceOf[InternalRow]
      if (w == null) return null
      val dead = !w.isNullAt(1) && w.getUTF8String(1).toString == "d"
      val vals =
        if (dead) new Array[Any](payloadOrds.length)
        else {
          val after = w.getStruct(2, payloadOrds.length)
          val a = new Array[Any](payloadOrds.length)
          var i = 0
          while (i < payloadOrds.length) {
            a(i) = if (after == null || after.isNullAt(i)) null
            else after.get(i, payload(i).dataType)
            i += 1
          }
          a
        }
      W(w.getLong(0), dead, vals)
    }
  }

  private def isDeleted(r: InternalRow, delOrd: Int): Boolean =
    !r.isNullAt(delOrd) && r.getBoolean(delOrd)

  private def copyPayload(r: InternalRow, internal: StructType,
                          payloadOrds: Array[Int]): Array[Any] = {
    val vals = new Array[Any](payloadOrds.length)
    var i = 0
    while (i < payloadOrds.length) {
      val o = payloadOrds(i)
      vals(i) = if (r.isNullAt(o)) null
      else InternalRow.copyValue(r.get(o, internal(o).dataType))
      i += 1
    }
    vals
  }

  /** Resolve per-key winners over `files`: mode "cow"/"mor" keeps the
    * max-`__lsn` row per key (equal LSNs keep the first-read row — the same
    * tie contract as the merge's LastWriteWinsAgg); "patch" drives the exact
    * [[PatchFoldAgg]] kernel, so the connector and the SQL agg share one
    * fold. Dead winners (tombstoned keys) stay in the map with
    * `deleted = true` — callers filter or diff as needed. `keep` restricts
    * the resolution to a key subset (the change feed's added-file keys,
    * which also bound THIS map to O(changed keys) for that caller).
    * Throws [[SpillToSort]] past `maxInHeapKeys` entries. */
  def winners(files: Array[String], conf: Configuration, mode: String,
              internal: StructType, keyOrd: Int, payloadOrds: Array[Int],
              lsnOrd: Int, delOrd: Int, resetOrd: Int,
              keep: String => Boolean,
              maxInHeapKeys: Long = Long.MaxValue,
              filter: Option[org.apache.parquet.filter2.predicate.FilterPredicate] = None)
      : java.util.LinkedHashMap[String, W] = {
    val m = new java.util.LinkedHashMap[String, W]()
    val sc = new RawFileScanner(files, conf, filter)
    try {
      if (mode == "patch") {
        val kernel = new PatchKernel(internal, payloadOrds, lsnOrd, delOrd, resetOrd)
        val bufs = new java.util.LinkedHashMap[String, PatchFoldAgg.Buf]()
        var r = sc.next()
        while (r != null) {
          val k = r.getUTF8String(keyOrd).toString
          if (keep(k)) {
            var buf = bufs.get(k)
            if (buf == null) {
              if (bufs.size() >= maxInHeapKeys) throw new SpillToSort
              buf = kernel.agg.createAggregationBuffer(); bufs.put(k, buf)
            }
            val isDel = isDeleted(r, delOrd)
            kernel.update(buf, r, isDel,
              if (isDel) null else copyPayload(r, internal, payloadOrds))
          }
          r = sc.next()
        }
        bufs.entrySet().iterator().asScala.foreach { e =>
          val w = kernel.eval(e.getValue)
          if (w != null) m.put(e.getKey, w): Unit
        }
      } else {
        var r = sc.next()
        while (r != null) {
          val k = r.getUTF8String(keyOrd).toString
          if (keep(k)) {
            val lsn = r.getLong(lsnOrd)
            val cur = m.get(k)
            if (cur == null && m.size() >= maxInHeapKeys) throw new SpillToSort
            if (cur == null || cur.lsn < lsn)
              m.put(k, W(lsn, isDeleted(r, delOrd),
                copyPayload(r, internal, payloadOrds))): Unit
          }
          r = sc.next()
        }
      }
    } finally sc.close()
    m
  }

  /** Bounded resolve: the hash-map fast path while the bucket's live-key
    * count stays under `maxInHeapKeys`, else ONE wasted partial pass and a
    * re-resolve through [[sortedWinners]] (external sort, spills under the
    * task memory manager — never an executor OOM). Iterator order:
    * insertion order on the fast path, key-sorted on the spill path; both
    * produce the identical winner SET, and the batch reader's output
    * contract has no row order. */
  def winnersIter(files: Array[String], conf: Configuration, mode: String,
                  internal: StructType, keyOrd: Int, payloadOrds: Array[Int],
                  lsnOrd: Int, delOrd: Int, resetOrd: Int,
                  keep: String => Boolean,
                  maxInHeapKeys: Long,
                  filter: Option[org.apache.parquet.filter2.predicate.FilterPredicate] = None)
      : Iterator[(String, W)] =
    winnersMapOrSpill(files, conf, mode, internal, keyOrd, payloadOrds,
      lsnOrd, delOrd, resetOrd, keep, maxInHeapKeys, filter) match {
      case Some(m) => m.entrySet().iterator().asScala.map(e => (e.getKey, e.getValue))
      case None =>
        sortedWinners(files, conf, mode, internal, keyOrd, payloadOrds,
          lsnOrd, delOrd, resetOrd, keep, filter)
    }

  /** The map fast path alone: Some(map) under the watermark, None when the
    * live-key count would exceed it (callers switch to [[sortedWinners]] —
    * the change reader needs to know BEFORE diffing, because a merge-diff
    * requires both sides sorted). */
  def winnersMapOrSpill(files: Array[String], conf: Configuration, mode: String,
                        internal: StructType, keyOrd: Int, payloadOrds: Array[Int],
                        lsnOrd: Int, delOrd: Int, resetOrd: Int,
                        keep: String => Boolean, maxInHeapKeys: Long,
                        filter: Option[org.apache.parquet.filter2.predicate.FilterPredicate] = None)
      : Option[java.util.LinkedHashMap[String, W]] =
    try Some(winners(files, conf, mode, internal, keyOrd, payloadOrds,
      lsnOrd, delOrd, resetOrd, keep, maxInHeapKeys, filter))
    catch { case _: SpillToSort => None }

  /** External-sort streaming resolve: feed every row (plus a sequence
    * number) through Spark's [[UnsafeExternalRowSorter]] ordered by
    * (key asc, lsn desc, seq asc), then emit the first row per key group
    * (mor — seq asc preserves the first-read tie contract of the map path)
    * or fold each group through the exact [[PatchFoldAgg]] kernel (patch —
    * the fold is order-independent, so feeding it sorted is just one legal
    * order). Memory is O(one row group) + the sorter's managed pages; the
    * sorter spills to disk under pressure, so a bucket of ANY live-key
    * cardinality resolves without heap growth. Must run inside a task
    * (the sorter acquires from the task memory manager) — true for every
    * DSv2 partition reader. */
  /** Key-ASCENDING-sorted winner stream (the spill path). Public enough for
    * the change reader's merge-diff, which relies on the sort order. */
  def sortedWinners(files: Array[String], conf: Configuration, mode: String,
                    internal: StructType, keyOrd: Int, payloadOrds: Array[Int],
                    lsnOrd: Int, delOrd: Int, resetOrd: Int,
                    keep: String => Boolean,
                    filter: Option[org.apache.parquet.filter2.predicate.FilterPredicate] = None)
      : Iterator[(String, W)] = {
    import org.apache.spark.sql.execution.UnsafeExternalRowSorter
    import org.apache.spark.util.collection.unsafe.sort.PrefixComparators
    val seqOrd = internal.length
    val sortSchema = StructType(internal.fields :+
      StructField("__seq", LongType, nullable = false))
    val ordering: Ordering[InternalRow] = new Ordering[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = {
        val c = a.getUTF8String(keyOrd).compareTo(b.getUTF8String(keyOrd))
        if (c != 0) return c
        val la = a.getLong(lsnOrd); val lb = b.getLong(lsnOrd)
        if (la != lb) return if (la > lb) -1 else 1 // lsn DESC: winner first
        java.lang.Long.compare(a.getLong(seqOrd), b.getLong(seqOrd)) // read order
      }
    }
    val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
      private val result = new UnsafeExternalRowSorter.PrefixComputer.Prefix
      override def computePrefix(row: InternalRow)
          : UnsafeExternalRowSorter.PrefixComputer.Prefix = {
        val k = row.getUTF8String(keyOrd)
        result.isNull = k == null
        result.value =
          if (k == null) 0L else PrefixComparators.StringPrefixComparator.computePrefix(k)
        result
      }
    }
    val pageSize = org.apache.spark.SparkEnv.get.memoryManager.pageSizeBytes
    val sorter = UnsafeExternalRowSorter.create(
      sortSchema, ordering, PrefixComparators.STRING, prefixComputer, pageSize, false)
    val toUnsafe = UnsafeProjection.create(sortSchema)
    val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
    val seqRow = new GenericInternalRow(1)
    val sc = new RawFileScanner(files, conf, filter)
    try {
      var seq = 0L
      var r = sc.next()
      while (r != null) {
        if (keep(r.getUTF8String(keyOrd).toString)) {
          seqRow.update(0, seq)
          sorter.insertRow(toUnsafe(joined(r, seqRow)))
        }
        seq += 1
        r = sc.next()
      }
    } finally sc.close()
    val sorted = sorter.sort()
    val kernel =
      if (mode == "patch") new PatchKernel(internal, payloadOrds, lsnOrd, delOrd, resetOrd)
      else null

    new Iterator[(String, W)] {
      /** First row of the NEXT unconsumed key group (copied key). */
      private var pending: InternalRow = if (sorted.hasNext) sorted.next() else null
      private var out: (String, W) = _
      advance()

      private def advance(): Unit = {
        out = null
        while (out == null && pending != null) {
          val keyU = pending.getUTF8String(keyOrd).copy()
          if (kernel == null) {
            // mor/cow: the group's first row IS the winner (lsn desc, seq asc)
            val w = W(pending.getLong(lsnOrd), isDeleted(pending, delOrd),
              copyPayload(pending, internal, payloadOrds))
            pending = null
            while (pending == null && sorted.hasNext) {
              val r = sorted.next()
              if (!r.getUTF8String(keyOrd).equals(keyU)) pending = r
            }
            out = (keyU.toString, w)
          } else {
            val buf = kernel.agg.createAggregationBuffer()
            var r = pending
            pending = null
            while (r != null) {
              val isDel = isDeleted(r, delOrd)
              kernel.update(buf, r, isDel,
                if (isDel) null else copyPayload(r, internal, payloadOrds))
              r = if (sorted.hasNext) sorted.next() else null
              if (r != null && !r.getUTF8String(keyOrd).equals(keyU)) {
                pending = r; r = null
              }
            }
            val w = kernel.eval(buf)
            if (w != null) out = (keyU.toString, w) // null fold: skip group
          }
        }
      }

      override def hasNext: Boolean = out != null
      override def next(): (String, W) = {
        val o = out; advance(); o
      }
    }
  }
}

/** Per-bucket change reader: resolve the bucket's winners at both snapshot
  * versions locally (LWW max-lsn map, or the exact [[PatchFoldAgg]] fold on
  * patch tables), diff, emit change rows. No shuffle; memory is O(changed
  * keys) on MOR/patch (added delta files name them), O(bucket) on COW —
  * BOUNDED: past `maxResolveKeys` in-heap entries the key-restriction set
  * itself is abandoned (full-bucket diff, see [[changedKeys]]) and both
  * sides re-resolve as key-SORTED external-sort streams
  * ([[BucketResolve.sortedWinners]]) so the diff becomes a streaming
  * merge-join — O(1) heap at ANY changed-key or bucket cardinality, same
  * change set, so an over-grown range degrades to sort instead of OOMing
  * the executor (the same guarantee the batch reader has). */
final class IceLiteChangeReader(
    p: IceLiteChangePartition, mode: String, confKV: Array[(String, String)],
    internal: StructType,
    keyOrd: Int, payloadOrds: Array[Int], lsnOrd: Int, delOrd: Int, resetOrd: Int,
    includeBefore: Boolean, maxResolveKeys: Long = Long.MaxValue)
  extends PartitionReader[InternalRow] {

  import BucketResolve.W

  private val conf = IceLiteSourceConf.restore(confKV, internal)

  /** Keys named by the range's added AND removed files (MOR/patch
    * restriction) — read under a KEY-ONLY requested schema, so the payload
    * columns of the delta files are never materialized for this pass.
    * Removed files name keys whose files a compaction dropped (possibly
    * without writing a replacement — fully-tombstoned keys): their delete
    * events must still diff. Removed files are from-side files, which this
    * reader reads in full anyway, so the extra pass stays a cheap
    * key-column scan.
    *
    * Returns null once the set would exceed `maxResolveKeys` (the same
    * watermark that bounds the winner maps): the restriction is purely a
    * work-saving device for small incremental ranges, and past the
    * watermark the set itself would be the unbounded in-heap structure.
    * The caller then drops the restriction and diffs the WHOLE bucket —
    * same change set (a key untouched by the range resolves to the same
    * winner on both sides and classifies to no change), with heap still
    * O(1): the unrestricted winner maps trip their own watermark and
    * degrade to the key-sorted external-sort merge-diff. */
  private def changedKeys(): java.util.HashSet[String] = {
    val ks = new java.util.HashSet[String]()
    val keyConf = IceLiteSourceConf.restore(confKV, StructType(Array(internal(keyOrd))))
    val sc = new RawFileScanner(p.addedFiles ++ p.removedFiles, keyConf)
    try {
      var r = sc.next()
      while (r != null) {
        ks.add(r.getUTF8String(0).toString): Unit
        if (ks.size.toLong > maxResolveKeys) return null // full-bucket diff
        r = sc.next()
      }
    } finally sc.close()
    ks
  }

  /** Diff the two winner sides into change rows ([[IceLiteTable
    * .changesBetween]] semantics: same-lsn carried rows drop, dead-on-both
    * keys emit nothing, deletes carry the tombstone's lsn — null when the
    * tombstone itself was compacted away by the range's end). */
  private lazy val changes: Iterator[InternalRow] = {
    val keep: String => Boolean =
      if (mode == "cow") _ => true
      else changedKeys() match {
        case null => _ => true // over-watermark range: unrestricted diff
        case ks => ks.contains(_)
      }
    val nOut = 3 + payloadOrds.length + (if (includeBefore) payloadOrds.length else 0)

    def emit(key: String, op: String, lsn: Any, a: W, b: W): InternalRow = {
      val vals = new Array[Any](nOut)
      vals(0) = UTF8String.fromString(key)
      vals(1) = UTF8String.fromString(op)
      vals(2) = lsn
      var i = 0
      while (i < payloadOrds.length) {
        vals(3 + i) = if (a != null && !a.deleted) a.payload(i) else null
        i += 1
      }
      if (includeBefore) {
        i = 0
        while (i < payloadOrds.length) {
          vals(3 + payloadOrds.length + i) =
            if (b != null && !b.deleted) b.payload(i) else null
          i += 1
        }
      }
      new GenericInternalRow(vals)
    }

    /** The four-way classification shared by both diff shapes. `a`/`b` null
      * = the key has no winner on that side at all. */
    def classify(k: String, a: W, b: W): Option[InternalRow] = {
      val liveB = b != null && !b.deleted
      val liveA = a != null && !a.deleted
      if (!liveB && liveA) Some(emit(k, "insert", a.lsn, a, null))
      else if (liveB && liveA && a.lsn != b.lsn) Some(emit(k, "update", a.lsn, a, b))
      else if (liveB && !liveA)
        Some(emit(k, "delete", if (a != null) a.lsn else null, null, b))
      else None
    }

    def mapSide(files: Array[String]) =
      BucketResolve.winnersMapOrSpill(files, conf, mode, internal,
        keyOrd, payloadOrds, lsnOrd, delOrd, resetOrd, keep, maxResolveKeys)

    val beforeOpt = mapSide(p.fromFiles)
    val afterOpt = if (beforeOpt.isDefined) mapSide(p.toFiles) else None
    (beforeOpt, afterOpt) match {
      case (Some(before), Some(after)) =>
        val keys = new java.util.LinkedHashSet[String]()
        keys.addAll(after.keySet()): Unit
        keys.addAll(before.keySet()): Unit
        keys.iterator().asScala.flatMap(k => classify(k, after.get(k), before.get(k)))

      case _ =>
        // Watermark tripped: streaming merge-diff of two key-sorted winner
        // streams. Both sides come from the SAME external sorter ordering
        // (UTF8String binary order), so one cursor per side suffices —
        // O(1) heap regardless of bucket cardinality.
        def sortedSide(files: Array[String]) =
          BucketResolve.sortedWinners(files, conf, mode, internal,
            keyOrd, payloadOrds, lsnOrd, delOrd, resetOrd, keep)
        val bs = sortedSide(p.fromFiles)
        val as = sortedSide(p.toFiles)
        def utf8Cmp(x: String, y: String): Int =
          UTF8String.fromString(x).compareTo(UTF8String.fromString(y))
        new Iterator[(String, W, W)] {
          private var bCur: (String, W) = if (bs.hasNext) bs.next() else null
          private var aCur: (String, W) = if (as.hasNext) as.next() else null
          override def hasNext: Boolean = bCur != null || aCur != null
          override def next(): (String, W, W) = {
            val cmp =
              if (aCur == null) -1
              else if (bCur == null) 1
              else utf8Cmp(bCur._1, aCur._1)
            if (cmp < 0) { // key only on the before side
              val o = (bCur._1, null: W, bCur._2)
              bCur = if (bs.hasNext) bs.next() else null
              o
            } else if (cmp > 0) { // key only on the after side
              val o = (aCur._1, aCur._2, null: W)
              aCur = if (as.hasNext) as.next() else null
              o
            } else {
              val o = (aCur._1, aCur._2, bCur._2)
              bCur = if (bs.hasNext) bs.next() else null
              aCur = if (as.hasNext) as.next() else null
              o
            }
          }
        }.flatMap { case (k, a, b) => classify(k, a, b) }
    }
  }

  private var row: InternalRow = _

  override def next(): Boolean =
    if (changes.hasNext) { row = changes.next(); true } else { row = null; false }

  override def get(): InternalRow = row

  override def close(): Unit = ()
}
