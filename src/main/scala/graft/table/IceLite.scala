package graft.table

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import scala.jdk.CollectionConverters._

/**
 * "IceLite" — a minimal Iceberg-style table format: immutable Parquet data
 * files + JSON snapshot manifests with file-level key statistics, atomic
 * snapshot commits, an idempotent-epoch ledger for exactly-once sinks, and
 * persisted schema-registry state.
 *
 * Design goals (BASELINE.json north_rule):
 *  - all operations are O(changed data), never O(table): readers plan from
 *    the manifest; MERGE rewrites only files whose key range intersects the
 *    changed keys (copy-on-write);
 *  - rows are hash-bucketed by key with the same Kafka-murmur2 placement the
 *    reference uses for topic partitions (`smt/Outbox.java:225`), so a change
 *    batch prunes to its buckets;
 *  - commits are atomic (temp file + atomic rename of `meta/v{N}.json`);
 *    a re-delivered foreachBatch epoch is a no-op via `committedEpochs`
 *    (exactly-once on top of Spark's at-least-once);
 *  - additive schema evolution: the snapshot schema may gain columns; old
 *    files read as null for new columns.
 *
 * Single-writer is assumed (one streaming query owns the table), as in any
 * single Kafka Connect sink task in the reference deployment.
 */
/** Per-file min/max of a secondary stats column (`write.stats.columns`) — a
  * zone map. Values render as strings for JSON stability: canonical decimal
  * for numeric columns, UTF-8 text for binary/string ones (compared by
  * UNSIGNED byte order, matching Spark's UTF8String comparison — same
  * rationale as the key stats). */
final case class ColRange(min: String, max: String, numeric: Boolean) {
  def overlaps(lower: String, upper: String): Boolean =
    try {
      if (numeric)
        BigDecimal(min) <= BigDecimal(upper) && BigDecimal(max) >= BigDecimal(lower)
      else {
        def cmp(a: String, b: String): Int = java.util.Arrays.compareUnsigned(
          a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        cmp(min, upper) <= 0 && cmp(max, lower) >= 0
      }
    } catch {
      // un-parseable bound for this column's stored representation (e.g. a
      // Timestamp object against numeric micros): pruning is an optimization
      // — keep the file, the exact post-filter decides
      case _: NumberFormatException => true
    }
}

final case class DataFileMeta(
    path: String,
    bucket: Int,
    rows: Long,
    minKey: String,
    maxKey: String,
    tombstones: Long = 0L,
    /** True when the parquet footer lacked key min/max statistics (parquet-mr
      * omits binary stats above its truncation threshold): the file must be
      * treated as intersecting every key range instead of failing the merge. */
    fullRange: Boolean = false,
    /** Zone maps for the table's `write.stats.columns` (keyed by the
      * column's immutable PHYSICAL name). A column absent from the map has
      * no usable stats in this file — the file matches every range. */
    colStats: Map[String, ColRange] = Map.empty) {

  /** Does this file's key range possibly contain `k`? Manifest min/max are
    * selected by UNSIGNED UTF-8 BYTE order (footerStats), so the test must
    * compare the same way — Java String `<` is UTF-16 code-unit order,
    * which disagrees for supplementary-plane characters and would wrongly
    * prune a file that contains the key. */
  def keyInRange(k: String): Boolean =
    fullRange ||
      (DataFileMeta.utf8Cmp(k, minKey) >= 0 && DataFileMeta.utf8Cmp(k, maxKey) <= 0)

  /** Does [lo, hi] (either side open) overlap this file's key range? Same
    * byte-order contract as [[keyInRange]]. */
  def keyRangeOverlaps(lo: Option[String], hi: Option[String]): Boolean =
    fullRange ||
      (lo.forall(DataFileMeta.utf8Cmp(_, maxKey) <= 0) &&
        hi.forall(DataFileMeta.utf8Cmp(_, minKey) >= 0))
}

object DataFileMeta {
  /** The key order of the manifest's min/max stats: unsigned UTF-8 bytes
    * (what parquet binary stats and Spark's UTF8String comparisons use). */
  def utf8Cmp(a: String, b: String): Int = java.util.Arrays.compareUnsigned(
    a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
    b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}

final case class CommitStats(
    epochKey: String,
    inserted: Long,
    updated: Long,
    deleted: Long,
    carried: Long,
    stale: Long,
    rewrittenFiles: Int,
    touchedBuckets: Int)

/** Outcome of an optimistic commit with manifest rebase
  * ([[IceLiteTable.commitRebasing]]). */
sealed trait CommitOutcome
object CommitOutcome {
  /** The candidate (possibly rebased onto newer snapshots) is committed. */
  case object Committed extends CommitOutcome
  /** A concurrent writer committed one of this candidate's epoch keys first;
    * the candidate's new data files have been deleted (exactly-once: the
    * epoch is applied exactly once, by the winner). */
  case object EpochWon extends CommitOutcome
  /** An intervening commit touched this candidate's buckets (or evolved
    * schema/registry divergently), so a metadata-only rebase would be wrong;
    * the candidate's new data files have been deleted and the caller must
    * recompute against the current snapshot. */
  case object Overlap extends CommitOutcome
}

final case class Snapshot(
    version: Long,
    schemaJson: String,
    keyColumn: String,
    numBuckets: Int,
    files: List[DataFileMeta],
    committedEpochs: List[String],
    registryJson: String,
    lineage: Map[String, Long],
    parentVersion: Long,
    stats: Option[CommitStats],
    /** Table properties, e.g. `write.mode` = cow (default) | mor. */
    properties: Map[String, String] = Map.empty,
    /** Compacted exactly-once ledger: `prefix -> W` asserts every epoch key
      * `prefix/N` with 0 <= N <= W is committed (contiguous-from-zero, the
      * shape Structured Streaming batchIds take). [[committedEpochs]] holds
      * only keys not yet absorbed — without this, a long-running stream's
      * ledger grows one entry per micro-batch FOREVER (a year of 10 s
      * batches = ~3M strings rewritten into every snapshot and scanned per
      * epoch check). See [[EpochLedger]]. */
    epochWatermarks: Map[String, Long] = Map.empty,
    /** Metadata-only RENAME evolution (Iceberg's field-id semantics, keyed
      * here by the column's immutable PHYSICAL storage name): `logical ->
      * physical` for every column whose current name differs from the name
      * its data is stored under. [[IceLiteTable.renameColumn]] only rewrites
      * this map — data files are untouched; readers alias physical ->
      * logical at the scan boundary ([[IceLiteTable.readFiles]]) and writers
      * alias back ([[graft.merge.MergeInto.writeDataFiles]]). Absent = the
      * names coincide. */
    columnMapping: Map[String, String] = Map.empty,
    /** Physical storage names RETIRED by [[IceLiteTable.dropColumn]]: their
      * bytes still sit in pre-drop files, so a later re-add of the same
      * logical name must mint a FRESH storage name (Iceberg's new-field-id
      * semantics — [[graft.merge.MergeInto.evolveMapping]]) or the old data
      * would leak into the new column. Compaction rewrites shed the retired
      * bytes physically; the name stays reserved regardless. */
    retiredPhysical: List[String] = Nil) {
  /** Storage (parquet) name of a logical column. */
  def physicalName(logical: String): String = columnMapping.getOrElse(logical, logical)
  /** `logical` with every field renamed to its storage name. */
  def physicalSchemaOf(logical: StructType): StructType =
    if (columnMapping.isEmpty) logical
    else StructType(logical.fields.map(f => f.copy(name = physicalName(f.name))))
  def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  def writeMode: String = properties.getOrElse("write.mode", "cow")
  /** Batch fold semantics: `lww` (default, full row images) or `patch`
    * (partial updates: null payload column = unchanged — see
    * [[graft.merge.PatchFoldAgg]]). */
  def fold: String = properties.getOrElse("write.merge.fold", "lww")
  /** Exactly-once membership: in the explicit list, or covered by a
    * watermark. */
  def epochCommitted(key: String): Boolean =
    committedEpochs.contains(key) || EpochLedger.covered(key, epochWatermarks)
  /** List-size threshold past which commits fold contiguous numeric epoch
    * keys into [[epochWatermarks]] (O(1) exactly-once state per stream,
    * instead of O(batches)). */
  def ledgerCompactThreshold: Int =
    properties.getOrElse("write.ledger.compact-threshold", "256").toInt
  /** File-count threshold past which the snapshot stops inlining [[files]]
    * and offloads it to content-addressed manifest shards (see
    * [[IceLite.writeSnapshot]]). Below it, v{N}.json stays self-contained —
    * the right trade for small tables and for test readability. */
  def manifestInlineThreshold: Int =
    properties.getOrElse("write.manifest.inline-threshold", "1024").toInt
  /** Number of manifest shards (buckets map to shards by modulo): a commit
    * touching K buckets rewrites at most min(K, shards) manifest files. */
  def manifestShards: Int =
    properties.getOrElse("write.manifest.shards", "16").toInt
  /** Secondary columns whose per-file min/max zone maps the writer collects
    * (`write.stats.columns`, comma-separated). Names are PHYSICAL (storage)
    * names — i.e. the column's logical name at the time it was added, which
    * [[IceLiteTable.renameColumn]] never changes — so the property survives
    * rename evolution without a rewrite. */
  def statsColumns: Seq[String] =
    properties.get("write.stats.columns")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
  /** Secondary sort (`write.sort.columns`, physical names): rows cluster by
    * (bucket, these..., key) at write time, so zone maps on these columns get
    * TIGHT per-file ranges — the OPTIMIZE-ZORDER-lite knob that makes
    * [[IceLiteTable.scanRange]] skip files. Trades key-range tightness (point
    * lookups) for value-range tightness; off by default. */
  def sortColumns: Seq[String] =
    properties.get("write.sort.columns")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
  /** Current logical name of a physical column (inverse of [[physicalName]]). */
  def logicalName(physical: String): String =
    columnMapping.collectFirst { case (l, p) if p == physical => l }.getOrElse(physical)
}

/**
 * Exactly-once epoch-ledger compaction. Epoch keys are free-form strings,
 * but every built-in writer emits `name/N` with N a monotonically
 * increasing batch id starting at 0 (Structured Streaming's batchId
 * contract), so in steady state the committed set per stream is a dense
 * prefix 0..W — representable as ONE number. Compaction folds exactly such
 * contiguous runs into per-prefix watermarks; gapped or non-numeric keys
 * stay in the explicit list (no correctness assumption about them is ever
 * made). Watermarks are mergeable under concurrent commits by per-prefix
 * MAX: commit-ness is monotone (only [[IceLiteTable.rollbackTo]] rewinds
 * it, and that replaces the whole ledger), and contiguous-from-zero means
 * any two truthful watermarks for one prefix are nested, never disjoint.
 */
object EpochLedger {
  /** `name/N` -> (name, N); None for keys the compactor must not touch. */
  private[table] def parseKey(key: String): Option[(String, Long)] = {
    val i = key.lastIndexOf('/')
    if (i <= 0 || i == key.length - 1) return None
    val num = key.substring(i + 1)
    if (num.length <= 18 && num.forall(c => c >= '0' && c <= '9'))
      Some((key.substring(0, i), num.toLong))
    else None
  }

  private[table] def covered(key: String, wms: Map[String, Long]): Boolean =
    wms.nonEmpty && parseKey(key).exists { case (p, n) => wms.get(p).exists(n <= _) }

  /** Fold contiguous-from-watermark numeric keys into advanced watermarks;
    * return the surviving list (order preserved) and the new watermark map. */
  private[table] def compact(list: List[String],
                             wms: Map[String, Long]): (List[String], Map[String, Long]) = {
    val parsed = list.map(k => k -> parseKey(k))
    val byPrefix = parsed.collect { case (_, Some(pn)) => pn }.groupBy(_._1)
    val advanced = byPrefix.flatMap { case (p, pns) =>
      var wm = wms.getOrElse(p, -1L)
      pns.map(_._2).distinct.sorted.foreach { n =>
        if (n == wm + 1) wm = n // n <= wm is already covered; a gap stops the run
      }
      if (wm >= 0) Some(p -> wm) else None
    }
    val newWms = wms ++ advanced
    val kept = parsed.collect {
      case (k, None) => k
      case (k, Some((p, n))) if !newWms.get(p).exists(n <= _) => k
    }
    (kept, newWms)
  }

  /** Ledger after committing `epochKey` on top of `snap`: the new key is
    * ALWAYS appended explicitly (so a concurrent-commit rebase can see it as
    * a list delta — see [[IceLiteTable.commitRebasing]]); when the list has
    * outgrown the table's threshold, the OLD entries are folded into
    * watermarks first. */
  def appended(snap: Snapshot, epochKey: String): (List[String], Map[String, Long]) = {
    val (list, wms) =
      if (snap.committedEpochs.size >= snap.ledgerCompactThreshold)
        compact(snap.committedEpochs, snap.epochWatermarks)
      else (snap.committedEpochs, snap.epochWatermarks)
    (list :+ epochKey, wms)
  }
}

object IceLite {
  private[table] val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m
  }

  /** Hadoop configuration for path resolution: the active session's when one
    * exists (picks up s3a/hdfs settings), a vanilla Configuration otherwise
    * (file:// still works). All table I/O goes through the Hadoop
    * `FileSystem` API so the same code runs against the local FS in-sandbox
    * and HDFS/S3A on a cluster. */
  private[table] def hadoopConf: Configuration =
    SparkSession.getActiveSession.map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** Fork-free local filesystem for table metadata: Hadoop's default
    * `file:` FileSystem is a ChecksumFileSystem over RawLocalFileSystem,
    * and without the native hadoop library both FORK A SUBPROCESS per
    * permission operation — `chmod` on every create/mkdirs and `ls -ld`
    * behind every LocatedFileStatus. Profiled here at ~25% of the driver's
    * inter-job wall at bench scale (per-epoch snapshot/manifest writes),
    * and it grows with commit rate, so it is exactly the kind of per-epoch
    * serial constant the scaling legs pay hardest. Table metadata needs
    * neither permissions nor .crc shadow files: a no-op setPermission
    * leaves files under the process umask, same as any JVM-written file.
    * Non-file schemes (hdfs/s3a on a real cluster) keep the normal path. */
  private lazy val rawLocalFs: FileSystem = {
    val fs = new NoPermLocalFileSystem
    fs.initialize(java.net.URI.create("file:///"), new Configuration())
    fs
  }

  private[graft] def fsFor(root: Path, conf: Configuration): FileSystem = {
    val scheme = root.toUri.getScheme
    if (scheme == null || scheme == "file") rawLocalFs else root.getFileSystem(conf)
  }

  /** Per-operation Hadoop options for Spark parquet reads/writes of
    * file-scheme table data: route the job's `file:` filesystem to
    * [[NoPermLocalFileSystem]] (Spark merges DataFrame reader/writer
    * options into the job's Hadoop conf via `newHadoopConfWithOptions`),
    * so scan listings and the write committer stop forking a subprocess
    * per file (see [[NoPermLocalFileSystem]]) — WITHOUT mutating the
    * session-global Hadoop configuration. `disable.cache` keeps the
    * override out of the process-wide FileSystem cache (instances are
    * cheap: no IO in the constructor). Empty for non-file schemes. */
  private[graft] def localFsOptions(path: String): Map[String, String] = {
    val scheme = new Path(path).toUri.getScheme
    if (scheme == null || scheme == "file")
      Map("fs.file.impl" -> classOf[NoPermLocalFileSystem].getName,
          "fs.file.impl.disable.cache" -> "true")
    else Map.empty
  }

  def create(spark: SparkSession, root: String, schema: StructType, keyColumn: String,
             numBuckets: Int = 16, properties: Map[String, String] = Map.empty): IceLiteTable = {
    val rootP = new Path(root)
    val fs = fsFor(rootP, spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(rootP, "data"))
    fs.mkdirs(new Path(rootP, "meta"))
    require(schema.fieldNames.contains(keyColumn), s"key column $keyColumn missing from schema")
    val mode = properties.getOrElse("write.mode", "cow")
    require(mode == "cow" || mode == "mor", s"unknown write.mode: $mode")
    val snap = Snapshot(0L, schema.json, keyColumn, numBuckets, Nil, Nil, "", Map.empty, -1L, None, properties)
    writeSnapshot(fs, rootP, snap)
    new IceLiteTable(spark, root)
  }

  def load(spark: SparkSession, root: String): IceLiteTable = new IceLiteTable(spark, root)

  def exists(root: String): Boolean = {
    val rootP = new Path(root)
    val fs = fsFor(rootP, hadoopConf)
    fs.isDirectory(new Path(rootP, "meta")) && currentVersion(fs, rootP).isDefined
  }

  private[table] def currentVersion(fs: FileSystem, root: Path): Option[Long] = {
    val meta = new Path(root, "meta")
    if (!fs.isDirectory(meta)) return None
    val versions = fs.listStatus(meta).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") => s.stripPrefix("v").stripSuffix(".json").toLong }
    if (versions.isEmpty) None else Some(versions.max)
  }

  private def readBytes(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try org.apache.commons.io.IOUtils.toByteArray(in)
    finally in.close()
  }

  private def parseFileArray(n: com.fasterxml.jackson.databind.JsonNode): List[DataFileMeta] =
    n.elements().asScala.map { f =>
      val cs = f.path("colStats")
      val colStats =
        if (cs.isMissingNode || cs.isNull || !cs.isObject) Map.empty[String, ColRange]
        else cs.fields().asScala.map { e =>
          e.getKey -> ColRange(e.getValue.path("min").asText(),
            e.getValue.path("max").asText(), e.getValue.path("numeric").asBoolean())
        }.toMap
      DataFileMeta(f.path("path").asText(), f.path("bucket").asInt(), f.path("rows").asLong(),
        f.path("minKey").asText(), f.path("maxKey").asText(), f.path("tombstones").asLong(),
        f.path("fullRange").asBoolean(false), colStats)
    }.toList

  /** Manifest-shard names referenced by a version file, WITHOUT loading the
    * shards — the cheap walk vacuum's manifest GC needs. Empty for inline
    * snapshots (and for missing version files: an expired version references
    * nothing). */
  private[table] def mapperTree(fs: FileSystem, p: Path): com.fasterxml.jackson.databind.JsonNode =
    mapper.readTree(readBytes(fs, p))

  private[table] def manifestRefsOf(fs: FileSystem, root: Path, version: Long): Seq[String] = {
    val p = new Path(new Path(root, "meta"), s"v$version.json")
    if (!fs.exists(p)) return Nil
    mapper.readTree(readBytes(fs, p)).path("manifests").elements().asScala
      .map(_.path("name").asText()).toSeq
  }

  // Snapshot serde is hand-rolled on the Jackson tree API: Scala generics
  // erase, so data-binding would deserialize Long fields inside collections
  // as Integer and blow up at use sites.
  private[table] def readSnapshot(fs: FileSystem, root: Path, version: Long): Snapshot = {
    val meta = new Path(root, "meta")
    parseSnapshot(fs, meta, mapper.readTree(readBytes(fs, new Path(meta, s"v$version.json"))))
  }

  private[table] def parseSnapshot(fs: FileSystem, meta: Path,
                                   n: com.fasterxml.jackson.databind.JsonNode): Snapshot = {
    // Inline file list, or content-addressed manifest shards (big tables —
    // see writeSnapshot). Shards load in stored order; within a shard the
    // writer sorted by (bucket, path), so the full list is deterministic.
    val files =
      if (n.has("manifests"))
        n.path("manifests").elements().asScala.flatMap { m =>
          parseFileArray(mapper.readTree(readBytes(fs, new Path(meta, m.path("name").asText()))))
        }.toList
      else parseFileArray(n.path("files"))
    val epochs = n.path("committedEpochs").elements().asScala.map(_.asText()).toList
    val lineage = n.path("lineage").fields().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
    val stats = Option(n.get("stats")).filter(!_.isNull).map { s =>
      CommitStats(s.path("epochKey").asText(), s.path("inserted").asLong(), s.path("updated").asLong(),
        s.path("deleted").asLong(), s.path("carried").asLong(), s.path("stale").asLong(),
        s.path("rewrittenFiles").asInt(), s.path("touchedBuckets").asInt())
    }
    val props = n.path("properties").fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    val wms = n.path("epochWatermarks").fields().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
    val colMap = n.path("columnMapping").fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    val retired = n.path("retiredPhysical").elements().asScala.map(_.asText()).toList
    Snapshot(n.path("version").asLong(), n.path("schemaJson").asText(), n.path("keyColumn").asText(),
      n.path("numBuckets").asInt(), files, epochs, n.path("registryJson").asText(),
      lineage, n.path("parentVersion").asLong(), stats, props, wms, colMap, retired)
  }

  // ---- staged snapshots (write-audit-publish) -----------------------------
  // A staged snapshot is a fully-built candidate (data files written, ledger
  // marker included) parked at meta/staged-<name>.json instead of the
  // version chain — invisible to every reader of the table until published.
  // Same body format as a version file (manifest sharding included), so the
  // staged metadata cost is O(touched buckets) on big tables too.

  private[table] def stagedPath(root: Path, name: String): Path = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '-' || c == '_'),
      s"stage name must be [A-Za-z0-9_-]+: '$name'")
    new Path(new Path(root, "meta"), s"staged-$name.json")
  }

  private[table] def writeStagedSnapshot(fs: FileSystem, root: Path,
                                         name: String, snap: Snapshot): Unit = {
    val p = stagedPath(root, name)
    // Overwrite is deliberate (re-staging after a failed audit); callers
    // reclaim the previous attempt's data files first (dropStaged).
    val out = fs.create(p, true)
    try out.write(snapshotBody(fs, new Path(root, "meta"), snap))
    finally out.close()
  }

  private[table] def readStagedSnapshot(fs: FileSystem, root: Path,
                                        name: String): Option[Snapshot] = {
    val p = stagedPath(root, name)
    if (!fs.exists(p)) None
    else Some(parseSnapshot(fs, new Path(root, "meta"), mapper.readTree(readBytes(fs, p))))
  }

  private[table] def stagedNamesOf(fs: FileSystem, root: Path): Seq[String] = {
    val meta = new Path(root, "meta")
    if (!fs.isDirectory(meta)) return Nil
    fs.listStatus(meta).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("staged-") && s.endsWith(".json") =>
        s.stripPrefix("staged-").stripSuffix(".json") }
      .sorted
  }

  /** Atomic commit: write to temp, atomically publish as the version file;
    * a duplicate version number MUST fail, atomically, because concurrent
    * writers race on it ([[IceLiteTable.commitRebasing]] turns the loser's
    * failure into a rebase). HDFS rename already refuses an existing
    * destination. The LOCAL FS delegates rename to File.renameTo, which on
    * POSIX silently REPLACES the destination — there the publish uses
    * link(2) (`Files.createLink`), which is atomic and fails with EEXIST:
    * the classic POSIX create-if-absent commit. A non-atomic existence
    * pre-check remains only as a fast path for better error locality. */
  /** Write a manifest shard if (and only if) its content-addressed name is
    * not already present. Concurrent writers of the SAME content race
    * harmlessly — both bodies are byte-identical, so whoever publishes
    * first wins and the loser's temp is discarded. Never overwrites. */
  private def writeManifestIfAbsent(fs: FileSystem, meta: Path, name: String,
                                    bytes: Array[Byte]): Unit = {
    val dst = new Path(meta, name)
    if (fs.exists(dst)) return
    val tmp = new Path(meta, s".$name-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, false)
    try out.write(bytes)
    finally out.close()
    if (!fs.rename(tmp, dst)) {
      fs.delete(tmp, false): Unit
      if (!fs.exists(dst)) throw new java.io.IOException(s"manifest publish failed: $dst")
    }
  }

  /**
   * Snapshot body for v{N}.json. Small tables inline `files` (self-contained
   * version files, as before). Past `write.manifest.inline-threshold` the
   * file list offloads to CONTENT-ADDRESSED manifest shards
   * (`meta/man-{shard}-{md5(body)}.json`, shard = bucket mod
   * `write.manifest.shards`): an unchanged shard hashes to the SAME name as
   * the parent version's and is simply referenced again — zero bytes
   * written. Commit metadata I/O is then O(touched buckets), never O(table
   * files): at the 10^10-event design point a table holds 10^4-10^6 file
   * entries and a merge touches a handful of buckets, so inlining would
   * rewrite megabytes of unchanged JSON per 10-second epoch. Orphan shards
   * (from losing concurrent commits) are reclaimed by [[IceLiteTable.vacuum]]'s
   * manifest GC.
   */
  private def snapshotBody(fs: FileSystem, meta: Path, snap: Snapshot): Array[Byte] = {
    if (snap.files.size <= snap.manifestInlineThreshold)
      return mapper.writeValueAsBytes(snap)
    val shards = snap.manifestShards
    val node = mapper.valueToTree[com.fasterxml.jackson.databind.node.ObjectNode](
      snap.copy(files = Nil))
    node.remove("files")
    val arr = node.putArray("manifests")
    snap.files.groupBy(f => math.floorMod(f.bucket, shards)).toSeq.sortBy(_._1)
      .foreach { case (shard, fsOfShard) =>
        val body = mapper.writeValueAsBytes(fsOfShard.sortBy(f => (f.bucket, f.path)))
        val hash = java.security.MessageDigest.getInstance("MD5").digest(body)
          .take(8).map(b => f"$b%02x").mkString
        val name = s"man-$shard-$hash.json"
        writeManifestIfAbsent(fs, meta, name, body)
        val e = arr.addObject()
        e.put("name", name)
        e.put("shard", shard)
        e.put("count", fsOfShard.size)
      }
    mapper.writeValueAsBytes(node)
  }

  private[table] def writeSnapshot(fs: FileSystem, root: Path, snap: Snapshot): Unit = {
    val meta = new Path(root, "meta")
    val dst = new Path(meta, s"v${snap.version}.json")
    if (fs.exists(dst))
      throw new IllegalStateException(s"commit conflict: $dst already exists")
    val tmp = new Path(meta, s".v${snap.version}-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val body = snapshotBody(fs, meta, snap)
    val out = fs.create(tmp, false)
    try out.write(body)
    finally out.close()
    val local = fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]
    if (local) {
      val dstNio = java.nio.file.Paths.get(dst.toUri.getPath)
      val tmpNio = java.nio.file.Paths.get(tmp.toUri.getPath)
      try java.nio.file.Files.createLink(dstNio, tmpNio)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new IllegalStateException(s"commit conflict: $dst already exists")
      } finally fs.delete(tmp, false): Unit
    } else if (!fs.rename(tmp, dst)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(s"commit conflict: $dst already exists")
    }
  }
}

object IceLiteTable {
  /** Maintenance (compaction / z-order) yields to ingest under contention:
    * bounded recomputes with attempt-scaled backoff, so a steady merge
    * stream leaves gaps the maintenance commit can land in instead of the
    * two racing head-to-head until the cap. */
  private[table] val MaintenanceAttempts = 8
  private[table] def maintenanceBackoff(attempt: Int): Unit =
    Thread.sleep(math.min(50L * attempt, 400L))

  /** MOR read-side resolve: one winner row per key by the __lsn high-water
    * mark — the SAME [[graft.merge.LastWriteWinsAgg]] ObjectHashAggregate
    * kernel the merge's intra-batch dedup runs (one shuffle, map-side
    * partial, no sorts; equal-LSN redeliveries collapse to the first-seen
    * buffer). The previous formulation (max-lsn agg + equi-join +
    * dropDuplicates) planned two exchanges plus a broadcast join, and its
    * `first()`-based dedup aggregate tripped a Catalyst binding failure
    * when the read fed set operators (`exceptAll`). */
  private[graft] def resolveMor(df: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.merge.MergeInto.LSN
    val cols = df.columns.toSeq
    val packed = LSN +: cols.filterNot(c => c == key || c == LSN)
    val w = graft.merge.LastWriteWinsAgg.lww(struct(packed.map(col): _*))
    df.groupBy(col(key)).agg(w.as("__w"))
      .select(cols.map(c =>
        if (c == key) col(key) else col(s"__w.`$c`").as(c)): _*)
  }

  /** MOR read-side resolve for PATCH tables: delta rows are partial (null
    * column = unchanged), so the winner is a column-level fold, not a row
    * pick — every stored row re-enters [[graft.merge.PatchFoldAgg]] as an
    * event (tombstones as deletes, its persisted `__reset` watermark fed
    * back). One hash aggregate, same shuffle shape as the merge's own
    * dedup; associativity of the fold makes per-epoch delta stacking +
    * read-time resolution equal the one-shot fold over the raw stream. */
  private[graft] def resolvePatch(df: DataFrame, key: String, payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.merge.MergeInto.{DELETED, LSN, RESET}
    val ev = struct(
      col(LSN),
      when(coalesce(col(DELETED), lit(false)), lit("d")).otherwise(lit("u")).as("op"),
      struct(payload.map(col): _*).as("after"),
      col(RESET).cast(org.apache.spark.sql.types.LongType).as("reset"))
    df.groupBy(col(key)).agg(graft.merge.PatchFoldAgg.fold(ev).as("__w"))
      .select(
        col(key) +:
          payload.map(c => col(s"__w.after.$c").as(c)) :+
          col("__w.lsn").as(LSN) :+
          (col("__w.op") === "d").as(DELETED): _*)
  }

  /** Mode-dispatched resolve: COW rows are already final; MOR resolves by
    * row LWW, MOR+patch by column-level fold. */
  private[graft] def resolve(df: DataFrame, s: Snapshot): DataFrame =
    if (s.writeMode != "mor") df
    else if (s.fold == "patch")
      resolvePatch(df, s.keyColumn, s.schema.fieldNames.toSeq.filterNot(_ == s.keyColumn))
    else resolveMor(df, s.keyColumn)
}

/** Handle to an IceLite table; all reads plan from the current snapshot.
  * All metadata I/O goes through the Hadoop FileSystem of `root`'s scheme
  * (local FS in-sandbox; HDFS/S3A on a cluster with the same code). */
final class IceLiteTable(val spark: SparkSession, val root: String) {
  private val rootP = new Path(root)
  private val fs: FileSystem = IceLite.fsFor(rootP, spark.sparkContext.hadoopConfiguration)

  def snapshot: Snapshot = {
    val v = IceLite.currentVersion(fs, rootP)
      .getOrElse(throw new IllegalStateException(s"No IceLite table at $root"))
    IceLite.readSnapshot(fs, rootP, v)
  }

  def snapshotAt(version: Long): Snapshot = IceLite.readSnapshot(fs, rootP, version)

  /** Read the full table as of the current snapshot (tombstones filtered,
    * internal columns hidden). */
  def read(): DataFrame = readSnap(snapshot)

  /** Read as of an older snapshot (time travel). */
  def readVersion(version: Long): DataFrame = readSnap(snapshotAt(version))

  /** Read including tombstone rows and internal __lsn/__deleted columns. */
  def readInternal(): DataFrame = {
    val s = snapshot
    readFiles(s.copy(schemaJson =
      graft.merge.MergeInto.dataSchemaOf(s.schema, s.fold == "patch").json), s.files)
  }

  private def readSnap(s: Snapshot): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = readFiles(s.copy(schemaJson =
      graft.merge.MergeInto.dataSchemaOf(s.schema, s.fold == "patch").json), s.files)
    val resolved = IceLiteTable.resolve(raw, s)
    resolved
      .filter(!coalesce(col(graft.merge.MergeInto.DELETED), lit(false)))
      .select(s.schema.fieldNames.map(col).toSeq: _*)
  }

  private[graft] def readFiles(snap: Snapshot, files: Seq[DataFileMeta]): DataFrame = {
    if (files.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    else if (snap.columnMapping.isEmpty)
      spark.read.options(IceLite.localFsOptions(root))
        .schema(snap.schema).parquet(files.map(f => s"$root/${f.path}"): _*)
    else {
      // Renamed table: scan under the immutable PHYSICAL names (all file
      // vintages agree on them), then alias to the current logical names.
      // The alias-only Project is transparent to Catalyst — filter pushdown
      // and column pruning still reach the parquet scan.
      import org.apache.spark.sql.functions.col
      val phys = snap.physicalSchemaOf(snap.schema)
      spark.read.options(IceLite.localFsOptions(root))
        .schema(phys).parquet(files.map(f => s"$root/${f.path}"): _*)
        .select(snap.schema.fieldNames.toSeq.map(n =>
          col(s"`${snap.physicalName(n)}`").as(n)): _*)
    }
  }

  def isEpochCommitted(epochKey: String): Boolean =
    snapshot.epochCommitted(epochKey)

  /** Point lookup: the current rows for `keys`, reading ONLY files whose
    * (bucket, key-range) manifest entry can contain them — O(candidate
    * files), never O(table). The bucket is computed driver-side
    * ([[graft.hashing.KafkaMurmur2.bucketLabelOf]]), the key-range check
    * uses the per-file min/max from the manifest, and with
    * `write.parquet.bloom = true` the pushed-down IN filter additionally
    * skips row groups via parquet bloom filters — the 10^10-row
    * point-read path (metadata prune -> range prune -> bloom prune).
    * MOR/patch tables resolve winners over just the candidate rows (a
    * key's winner only depends on rows of that key, so pruning is exact). */
  def lookup(keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val s = snapshot
    val cand = lookupFiles(s, keys)
    val raw = readFiles(s.copy(schemaJson =
      graft.merge.MergeInto.dataSchemaOf(s.schema, s.fold == "patch").json), cand)
      .filter(col(s.keyColumn).isin(keys: _*))
    IceLiteTable.resolve(raw, s)
      .filter(!coalesce(col(graft.merge.MergeInto.DELETED), lit(false)))
      .select(s.schema.fieldNames.map(col).toSeq: _*)
  }

  /** Manifest-side candidate planning for [[lookup]] (driver-only, no job). */
  private[graft] def lookupFiles(s: Snapshot, keys: Seq[String]): Seq[DataFileMeta] = {
    val byBucket = keys.groupBy(k =>
      graft.hashing.KafkaMurmur2.bucketLabelOf(k, s.numBuckets))
    s.files.filter { f =>
      byBucket.get(f.bucket).exists(ks => ks.exists(f.keyInRange))
    }
  }

  /** Range scan over a secondary column with ZONE-MAP file skipping:
    * `read().filter(column BETWEEN lower AND upper)` (inclusive; null never
    * matches), planned from the per-file min/max the writer collected for
    * `write.stats.columns` — the manifest is the index, no data file is
    * opened to decide. With `write.sort.columns` clustering the column,
    * per-file ranges are tight and skipping approaches the selectivity of
    * the predicate; on MOR ingest the per-epoch delta files carry naturally
    * tight ranges for time-correlated columns (the "recent changes" scan at
    * the 10^10-row design point reads the recent files, not the table).
    *
    * Mode-dependent soundness (each is the CHEAPEST exact plan):
    *  - COW: a key has exactly ONE live row, so a skipped file holds only
    *    out-of-range rows the exact post-filter would drop anyway —
    *    file-level skipping is exact.
    *  - MOR (lww): a delta row may be STALE (lower lsn than the winner), so
    *    skipping a file that holds a key's true winner could elect an
    *    in-range stale row. In-range files therefore only NOMINATE candidate
    *    keys; winners resolve over every file of the candidates' BUCKETS (a
    *    key's rows never leave its bucket), then the exact predicate
    *    re-applies on the winner.
    *  - patch fold: the winner is a column-level fold over ALL versions —
    *    nothing can be skipped; falls back to the full resolved read.
    * A file with no usable stats for the column matches every range. */
  def scanRange(column: String, lower: Any, upper: Any): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    import graft.merge.MergeInto.DELETED
    val s = snapshot
    val pred = col(column) >= lit(lower) && col(column) <= lit(upper)
    if (s.fold == "patch") return read().filter(pred)
    val dataJson = graft.merge.MergeInto.dataSchemaOf(s.schema).json
    val nominate = scanRangeFiles(s, column, lower, upper)
    if (nominate.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s.schema)
    if (s.writeMode != "mor") {
      readFiles(s.copy(schemaJson = dataJson), nominate)
        .filter(!coalesce(col(DELETED), lit(false)))
        .select(s.schema.fieldNames.map(col).toSeq: _*)
        .filter(pred)
    } else {
      val keptBuckets = nominate.map(_.bucket).toSet
      val cand = readFiles(s.copy(schemaJson = dataJson), nominate)
        .filter(pred).select(col(s.keyColumn)).distinct()
      val bucketFiles = s.files.filter(f => keptBuckets(f.bucket))
      val raw = readFiles(s.copy(schemaJson = dataJson), bucketFiles)
        .join(cand, Seq(s.keyColumn), "left_semi")
      IceLiteTable.resolve(raw, s)
        .filter(!coalesce(col(DELETED), lit(false)))
        .select(s.schema.fieldNames.map(col).toSeq: _*)
        .filter(pred)
    }
  }

  /** Manifest-side zone-map planning for [[scanRange]] (driver-only, no
    * job): files whose stored range for `column` can intersect
    * [lower, upper]. Exposed for plan-regression tests. */
  private[graft] def scanRangeFiles(s: Snapshot, column: String,
                                    lower: Any, upper: Any): Seq[DataFileMeta] = {
    val phys = s.physicalName(column)
    val (lo, hi) = (String.valueOf(lower), String.valueOf(upper))
    s.files.filter(_.colStats.get(phys).forall(_.overlaps(lo, hi)))
  }

  /** MERGE a change batch into the table. See [[graft.merge.MergeInto]].
    * `registryJson` persists the SMT chain's schema-registry state in the
    * same atomic commit (restored on resume by [[graft.stream.Pipeline]]);
    * `extraLineage` adds caller counters (e.g. ingest-dedup suppression) to
    * the snapshot's lineage map in that same commit. */
  def merge(changes: DataFrame, epochKey: String, registryJson: Option[String] = None,
            extraLineage: Map[String, Long] = Map.empty): CommitStats =
    graft.merge.MergeInto.run(this, changes, epochKey, registryJson, extraLineage = extraLineage)

  /** Resolved LIVE rows (tombstones filtered) with the internal `__lsn`
    * kept — the per-row causality handle the DML paths build their change
    * events from. */
  private def readLiveWithLsn(s: Snapshot): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = readFiles(s.copy(schemaJson =
      graft.merge.MergeInto.dataSchemaOf(s.schema, s.fold == "patch").json), s.files)
    IceLiteTable.resolve(raw, s)
      .filter(!coalesce(col(graft.merge.MergeInto.DELETED), lit(false)))
  }

  /** Epoch key for an ad-hoc DML statement: digest of (statement, snapshot
    * version). A crashed-and-retried statement hits the ledger no-op
    * (exactly-once); a deliberate re-run sees the advanced version and
    * applies freshly. Free-form key — it stays explicit in the ledger
    * (never watermark-compacted), which is the right durability for rare
    * corrections. */
  private def dmlEpochKey(kind: String, stmt: String, version: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(stmt.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"sql-$kind-${hex.take(16)}-v$version"
  }

  /** Correction ordering for ad-hoc DML: strictly above every lsn the
    * table has EVER stored (tombstones included) plus a reserved stride
    * (`write.dml.lsn.stride` property, default 1). Basing corrections on
    * the table-wide max — not each victim's winner lsn + 1 — keeps them
    * clear of the stream's LIVE positions: under a global binlog lsn a
    * key's very next upstream event can land at exactly winner + 1 and tie
    * with a per-row correction (the LWW tie contract is first-seen, i.e.
    * nondeterministic for distinct payloads), whereas colliding with
    * tableMax + stride requires the upstream counter to jump exactly
    * `stride` past everything already applied; deployments that need a
    * wider guard band raise the stride. Semantics: a correction supersedes
    * every event applied up to its emission point; upstream events at
    * higher lsn still win. Cost: one column-pruned max(__lsn) probe per
    * statement — corrections are rare by contract. */
  private def correctionLsn(s: Snapshot): Long = {
    import org.apache.spark.sql.functions._
    val raw = readFiles(s.copy(schemaJson =
      graft.merge.MergeInto.dataSchemaOf(s.schema, s.fold == "patch").json), s.files)
    val maxLsn = Option(raw.agg(max(col(graft.merge.MergeInto.LSN))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val stride = s.properties.get("write.dml.lsn.stride").map(_.toLong).getOrElse(1L)
    require(stride >= 1, s"write.dml.lsn.stride must be >= 1, got $stride")
    maxLsn + stride
  }

  /** Ad-hoc row-level DELETE — the GDPR / bad-batch correction path,
    * outside the CDC stream. Rows of the CURRENT resolved state matching
    * `cond` become delete events at [[correctionLsn]] (above every applied
    * lsn) and flow through the normal MERGE: only the victims' buckets
    * rewrite (COW) or gain a tombstone delta (MOR/patch), the commit
    * rebases across concurrent ingest, and an upstream change at a higher
    * lsn still wins — the correction sits inside the same total order as
    * the stream it corrects, rather than above it. Cost: one scan reading
    * only (key, __lsn, cond's columns) — parquet column pruning — plus the
    * merge's touched-buckets write; the standard lakehouse DML shape at
    * 10^10 rows. */
  def deleteWhere(cond: Column, epochKey: String = null): CommitStats = {
    import org.apache.spark.sql.functions._
    val s = snapshot
    val victims = readLiveWithLsn(s).filter(cond).select(
      col(s.keyColumn),
      lit("d").as("op"),
      lit(null).cast(s.schema).as("after"),
      lit(correctionLsn(s)).as("lsn"))
    merge(victims, Option(epochKey).getOrElse(
      dmlEpochKey("delete", cond.toString, s.version)))
  }

  /** Ad-hoc row-level UPDATE: matching live rows re-emit as update events
    * (full `after` payload = the row with `set` assignments applied, so
    * expressions may reference the row's current values) at
    * [[correctionLsn]], merged like any change batch — same causality,
    * concurrency, and exactly-once story as [[deleteWhere]]. The key
    * column is immutable (that is what MERGE's key identity means).
    * On patch-fold tables an assignment that evaluates to NULL raises at
    * execution: the patch fold reads a null column as "unchanged", so a
    * SET-to-null would otherwise be silently dropped instead of applied —
    * model an explicit null as a delete + reinsert. */
  def updateWhere(set: Seq[(String, Column)], cond: Column,
                  epochKey: String = null): CommitStats = {
    import org.apache.spark.sql.functions._
    val s = snapshot
    val unknown = set.map(_._1).filterNot(s.schema.fieldNames.contains)
    require(unknown.isEmpty, s"UPDATE: unknown column(s) ${unknown.mkString(", ")}")
    require(!set.exists(_._1 == s.keyColumn),
      s"UPDATE: cannot assign the key column ${s.keyColumn}")
    val m = set.toMap
    def assigned(f: org.apache.spark.sql.types.StructField, c: Column): Column =
      if (s.fold != "patch") c.cast(f.dataType)
      else when(c.cast(f.dataType).isNull,
        raise_error(concat(
          lit(s"UPDATE on a patch-fold table: SET ${f.name} evaluated to NULL for key "),
          col(s.keyColumn),
          lit(" — the patch fold treats null as 'unchanged', so the assignment " +
            "would be silently dropped; use delete + reinsert to null a column")))
          .cast(f.dataType))
        .otherwise(c.cast(f.dataType))
    val after = struct(s.schema.fields.toSeq.map(f =>
      m.get(f.name).map(assigned(f, _)).getOrElse(col(f.name)).as(f.name)): _*)
    val changed = readLiveWithLsn(s).filter(cond).select(
      col(s.keyColumn),
      lit("u").as("op"),
      after.as("after"),
      lit(correctionLsn(s)).as("lsn"))
    merge(changed, Option(epochKey).getOrElse(
      dmlEpochKey("update",
        set.map { case (k, v) => s"$k=$v" }.mkString(",") + "|" + cond.toString,
        s.version)))
  }

  private[graft] def commit(newSnap: Snapshot): Unit = IceLite.writeSnapshot(fs, rootP, newSnap)

  /** Optimistic multi-writer commit: try `candidate` (built against `base`);
    * on a version conflict, REBASE the candidate's manifest delta onto the
    * current snapshot and retry — the Iceberg commit protocol, driver-side
    * metadata only, no data recompute. The delta is derived from
    * (base, candidate): files removed/added, epoch keys appended, lineage
    * counter increments. A rebase is legal iff no intervening commit touched
    * the candidate's buckets (its removed files must all still be present —
    * per-bucket file sets in the current snapshot equal base's) and at most
    * one side changed the schema / registry; otherwise [[CommitOutcome.Overlap]]
    * is returned (new files deleted) and the caller recomputes. A conflict
    * on one of the candidate's own epoch keys means a concurrent duplicate
    * delivery already applied this epoch: [[CommitOutcome.EpochWon]], also
    * cleaned up. Contention cost is O(retries x snapshot read), zero jobs. */
  private[graft] def commitRebasing(base: Snapshot, candidate: Snapshot,
                                    maxRetries: Int = 10): CommitOutcome = {
    val basePaths = base.files.map(_.path).toSet
    val candPaths = candidate.files.map(_.path).toSet
    val removedPaths = basePaths -- candPaths
    val added = candidate.files.filterNot(f => basePaths.contains(f.path))
    val touched: Set[Int] =
      (added.map(_.bucket) ++ base.files.filter(f => removedPaths(f.path)).map(_.bucket)).toSet
    // New epoch keys appear as explicit list entries ([[EpochLedger.appended]]
    // never folds the key being committed), so the delta vs base is exact
    // even when the candidate also compacted the old entries away.
    val newEpochs = candidate.committedEpochs.filterNot(base.epochCommitted)
    val lineageDelta: Map[String, Long] = candidate.lineage.flatMap { case (k, v) =>
      val d = v - base.lineage.getOrElse(k, 0L)
      if (d != 0L) Some(k -> d) else None
    }
    def abandon(): Unit = deleteDataFiles(added.map(_.path))
    /** Pick the evolved value when at most one side diverged from base. */
    def oneSided[T](b: T, cur: T, cand: T): Option[T] =
      if (cur == b || cur == cand) Some(cand)
      else if (cand == b) Some(cur)
      else None

    var cand = candidate
    var attempt = 0
    while (true) {
      try { commit(cand); return CommitOutcome.Committed }
      catch {
        case e: IllegalStateException =>
          attempt += 1
          if (attempt > maxRetries) throw e
          val cur = snapshot
          if (newEpochs.exists(cur.epochCommitted)) {
            abandon(); return CommitOutcome.EpochWon
          }
          def filesIn(s: Snapshot): Set[String] =
            s.files.iterator.filter(f => touched(f.bucket)).map(_.path).toSet
          val schemaJson = oneSided(base.schemaJson, cur.schemaJson, candidate.schemaJson)
          val registryJson = oneSided(base.registryJson, cur.registryJson, candidate.registryJson)
          // Rename evolution rides the same one-sided rule as the schema: a
          // concurrent rename rebases onto a data-only commit (and vice
          // versa); two divergent renames recompute.
          val keyColumn = oneSided(base.keyColumn, cur.keyColumn, candidate.keyColumn)
          val colMap = oneSided(base.columnMapping, cur.columnMapping, candidate.columnMapping)
          val retired = oneSided(base.retiredPhysical, cur.retiredPhysical, candidate.retiredPhysical)
          // Table properties follow the same rule: a property change rebases
          // across a data-only commit (and a merge rebases across a property
          // change); two divergent property edits recompute.
          val props = oneSided(base.properties, cur.properties, candidate.properties)
          if (filesIn(cur) != filesIn(base) || schemaJson.isEmpty || registryJson.isEmpty ||
              keyColumn.isEmpty || colMap.isEmpty || props.isEmpty || retired.isEmpty) {
            abandon(); return CommitOutcome.Overlap
          }
          cand = cur.copy(
            version = cur.version + 1,
            schemaJson = schemaJson.get,
            keyColumn = keyColumn.get,
            columnMapping = colMap.get,
            retiredPhysical = retired.get,
            properties = props.get,
            files = cur.files.filterNot(f => removedPaths(f.path)) ++ added,
            committedEpochs = cur.committedEpochs ++ newEpochs,
            registryJson = registryJson.get,
            lineage = cur.lineage ++ lineageDelta.map { case (k, d) =>
              k -> (cur.lineage.getOrElse(k, 0L) + d) },
            parentVersion = cur.version,
            stats = candidate.stats,
            // Watermarks merge by per-prefix MAX: contiguous-from-zero makes
            // any two truthful watermarks for one prefix nested (commit-ness
            // is monotone), so the larger one subsumes the smaller. Entries
            // in cur's list that the merged watermark now covers are swept by
            // the next compaction pass.
            epochWatermarks = cur.epochWatermarks ++
              candidate.epochWatermarks.map { case (p, w) =>
                p -> math.max(w, cur.epochWatermarks.getOrElse(p, -1L)) })
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Best-effort delete of data files that were written but never referenced
    * by any snapshot (abandoned no-op-epoch rewrites). */
  private[graft] def deleteDataFiles(paths: Seq[String]): Unit =
    paths.foreach { p =>
      try fs.delete(new Path(rootP, p), false): Unit catch { case _: Throwable => () }
    }

  /** MOR: rewrite `buckets` to their resolved state (one winner row per
    * key), dropping resolved tombstones below `lsnWatermark`. O(files of the
    * chosen buckets). Returns the number of files replaced.
    *
    * Concurrency-safe: commits through [[commitRebasing]], so a concurrent
    * merge into OTHER buckets is absorbed by a metadata rebase; a merge that
    * landed in one of the compacting buckets invalidates the rewrite
    * (compacted files would resurrect rows the merge superseded), so the
    * compaction recomputes against the fresh snapshot — bounded retries,
    * since maintenance must yield to the ingest path under contention. */
  def compactBuckets(buckets: Set[Int], lsnWatermark: Long = Long.MinValue): Int = {
    import org.apache.spark.sql.functions._
    import graft.merge.MergeInto.{DELETED, LSN}
    var attempt = 0
    while (true) {
      val snap = snapshot
      val affected = snap.files.filter(f => buckets.contains(f.bucket))
      if (affected.isEmpty) return 0
      val dataSchema = graft.merge.MergeInto.dataSchemaOf(snap.schema, snap.fold == "patch")
      // Patch tables fold column-wise; the folded row's reset watermark is
      // consumed by the fold, so compacted files carry no __reset (reads
      // null-fill it, and crediting surviving columns at the fold's max LSN
      // is safe because later epochs carry strictly newer LSNs).
      val resolved = IceLiteTable.resolve(
        readFiles(snap.copy(schemaJson = dataSchema.json), affected), snap)
        .filter(!(coalesce(col(DELETED), lit(false)) && col(LSN) < lsnWatermark))
      val newFiles = graft.merge.MergeInto.writeDataFiles(this, snap, resolved, snap.version + 1)
      commitRebasing(snap, snap.copy(
        version = snap.version + 1,
        files = snap.files.filterNot(f => buckets.contains(f.bucket)) ++ newFiles,
        parentVersion = snap.version)) match {
        case CommitOutcome.Committed => return affected.size
        case CommitOutcome.Overlap if attempt < IceLiteTable.MaintenanceAttempts =>
          attempt += 1; IceLiteTable.maintenanceBackoff(attempt) // recompute
        case out => throw new IllegalStateException(
          s"compactBuckets: gave up after $attempt recomputes under contention ($out)")
      }
    }
    -1 // unreachable
  }

  /** Physically drop tombstone rows older than `lsnWatermark` (the stream's
    * low-water mark: no change below it can still arrive). Rewrites only
    * files that contain tombstones — O(tombstoned files). In MOR mode a
    * tombstone can only vanish together with every older version of its key,
    * so the whole bucket compacts instead (same big-O for the common case of
    * tombstones spread across buckets). */
  def compactTombstones(lsnWatermark: Long): Int = {
    import org.apache.spark.sql.functions._
    import graft.merge.MergeInto.{DELETED, LSN}
    var attempt = 0
    while (true) {
      val snap = snapshot
      if (snap.writeMode == "mor")
        return compactBuckets(snap.files.filter(_.tombstones > 0).map(_.bucket).toSet, lsnWatermark)
      val affected = snap.files.filter(_.tombstones > 0)
      if (affected.isEmpty) return 0
      val dataSchema = graft.merge.MergeInto.dataSchemaOf(snap.schema)
      val df = readFiles(snap.copy(schemaJson = dataSchema.json), affected)
        .filter(!(coalesce(col(DELETED), lit(false)) && col(LSN) < lsnWatermark))
      val stats = graft.merge.MergeInto.writeDataFiles(this, snap, df, snap.version + 1)
      commitRebasing(snap, snap.copy(
        version = snap.version + 1,
        files = snap.files.filterNot(f => affected.exists(_.path == f.path)) ++ stats,
        parentVersion = snap.version)) match {
        case CommitOutcome.Committed => return affected.size
        case CommitOutcome.Overlap if attempt < IceLiteTable.MaintenanceAttempts =>
          attempt += 1; IceLiteTable.maintenanceBackoff(attempt) // recompute
        case out => throw new IllegalStateException(
          s"compactTombstones: gave up after $attempt recomputes under contention ($out)")
      }
    }
    -1 // unreachable
  }

  /** Small-file compaction planner (Iceberg's rewrite_data_files /
    * bin-packing): pick every bucket whose rows would FIT IN FEWER FILES
    * than it currently has at `targetRowsPerFile`, and rewrite those buckets
    * to their resolved state. The steady-state antidote to streaming
    * ingest's file-count growth — a 10-second-epoch MERGE leaves one small
    * file per touched bucket per epoch, and scan cost at 10^10 rows is
    * driven by file COUNT (footer reads, task scheduling) as much as bytes.
    * Planning is driver-side manifest arithmetic (zero jobs); the rewrite is
    * O(files of chosen buckets) and commits through the rebasing protocol,
    * yielding to concurrent ingest. Returns the set of buckets compacted. */
  def compactSmallFiles(targetRowsPerFile: Long = 0L,
                        lsnWatermark: Long = Long.MinValue): Set[Int] = {
    val target =
      if (targetRowsPerFile > 0L) targetRowsPerFile
      else spark.conf.getOption("graft.merge.maxRecordsPerFile").map(_.toLong).getOrElse(1000000L)
    val picked = snapshot.files.groupBy(_.bucket).collect {
      case (b, fs) if fs.size > 1 &&
        math.max(1L, (fs.map(_.rows).sum + target - 1) / target) < fs.size => b
    }.toSet
    if (picked.nonEmpty) compactBuckets(picked, lsnWatermark): Unit
    picked
  }

  /** Z-ORDER the table: rewrite every bucket to its resolved state sorted
    * along a Morton curve over `columns`, so the per-file zone maps
    * ([[scanRange]]) get tight ranges on ALL of them at once — the
    * multi-column analogue of `write.sort.columns` (which only tightens its
    * leading column), and this engine's `rewrite_data_files(zorder(...))`.
    *
    * Mechanics: one small agg job computes each column's order-preserving
    * encoded bounds ([[ZEncExpr]]); the rewrite then sorts within each
    * bucket by the codegen'd interleaved curve ([[ZValueExpr]]) and commits
    * through the rebasing protocol (yields to concurrent ingest like every
    * maintenance op). The committed snapshot extends `write.stats.columns`
    * with `columns` so this rewrite — and every future merge — collects
    * their zone maps, and records the curve in `table.zorder.columns`.
    * Layout-only: the resolved row set is exactly [[compactBuckets]]'s.
    * O(table) rewrite by design — run it at compaction cadence, not per
    * epoch; at the 10^10-row design point restrict via lsnWatermark-driven
    * bucket selection the same way compaction does. */
  def clusterZOrder(columns: Seq[String], lsnWatermark: Long = Long.MinValue): Int = {
    import org.apache.spark.sql.functions._
    import graft.merge.MergeInto.{DELETED, LSN}
    require(columns.nonEmpty, "clusterZOrder: at least one column")
    var attempt = 0
    while (true) {
      val snap = snapshot
      columns.foreach(c => require(snap.schema.fieldNames.contains(c),
        s"clusterZOrder: no such column $c"))
      val affected = snap.files
      if (affected.isEmpty) return 0
      val dataSchema = graft.merge.MergeInto.dataSchemaOf(snap.schema, snap.fold == "patch")
      val resolved = IceLiteTable.resolve(
        readFiles(snap.copy(schemaJson = dataSchema.json), affected), snap)
        .filter(!(coalesce(col(DELETED), lit(false)) && col(LSN) < lsnWatermark))
      // Encoded bounds per curve column — ONE tiny agg job (partial
      // aggregation: the shuffle is 2k longs per input partition).
      val aggs = columns.zipWithIndex.flatMap { case (c, i) =>
        Seq(min(ZOrder.enc(col(c))).as(s"__zlo$i"), max(ZOrder.enc(col(c))).as(s"__zhi$i")) }
      val bounds = resolved.agg(aggs.head, aggs.tail: _*).head()
      def bound(idx: Int, dflt: Long): Long =
        if (bounds.isNullAt(idx)) dflt else bounds.getLong(idx)
      val los = columns.indices.map(i => bound(2 * i, 0L))
      val his = columns.indices.map(i => bound(2 * i + 1, 0L))
      val zcol = ZOrder.zvalue(columns.map(col), los, his)
      val physCols = columns.map(snap.physicalName)
      val snapForWrite = snap.copy(properties = snap.properties ++ Map(
        "write.stats.columns" -> (snap.statsColumns ++ physCols).distinct.mkString(","),
        "table.zorder.columns" -> columns.mkString(",")))
      val newFiles = graft.merge.MergeInto.writeDataFiles(
        this, snapForWrite, resolved, snap.version + 1, sortOverride = Some(Seq(zcol)))
      commitRebasing(snap, snapForWrite.copy(
        version = snap.version + 1,
        files = newFiles,
        parentVersion = snap.version)) match {
        case CommitOutcome.Committed => return affected.size
        case CommitOutcome.Overlap if attempt < IceLiteTable.MaintenanceAttempts =>
          attempt += 1; IceLiteTable.maintenanceBackoff(attempt) // recompute
        case out => throw new IllegalStateException(
          s"clusterZOrder: gave up after $attempt recomputes under contention ($out)")
      }
    }
    -1 // unreachable
  }

  /** Delete data files not referenced by the last `keepSnapshots` snapshots
    * (orphans from failed commits, and files rewritten away by COW merges). */
  /** Incremental CDC-out: the NET row-level changes between two snapshots,
    * one row per key whose last-write-wins state differs, classified as
    * `insert` / `update` / `delete`. The inverse of `merge` — downstream
    * consumers (index maintenance, replication, cache invalidation) tail the
    * table without replaying the source stream.
    *
    * Plan shape (scale posture): only buckets that gained a file between the
    * two versions are read — a key's winner lives in its hash bucket, so
    * untouched buckets cannot have changed. In MOR mode the added delta
    * files name the changed keys exactly, so both sides are further
    * restricted by a semi-join on those keys before resolving winners; in
    * COW the rewritten files carry the full bucket and the before/after
    * bucket scans are the floor. One key-hashed join classifies; no sorts,
    * nothing driver-side. Cost is O(touched buckets), never O(table).
    *
    * Unchanged carried rows (same `__lsn` both sides) are dropped; a key
    * that is dead on both sides (tombstoned, or compacted away) emits
    * nothing. Deletes emit null payload columns with the tombstone's lsn
    * (null lsn if the tombstone was itself compacted away by `toVersion`).
    */
  /** `includeBefore = true` additionally emits the PRE-image payload as
    * `before_<col>` columns (null for inserts) — the retraction side that
    * incremental view maintenance needs (see [[Maintain]]). */
  def changesBetween(fromVersion: Long, toVersion: Long,
                     includeBefore: Boolean = false): DataFrame = {
    require(fromVersion <= toVersion,
      s"changesBetween: fromVersion $fromVersion > toVersion $toVersion")
    changesBetweenSnapshots(snapshotAt(fromVersion), snapshotAt(toVersion), includeBefore)
  }

  private[graft] def changesBetweenSnapshots(from: Snapshot, to: Snapshot,
                                             includeBefore: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.merge.MergeInto.{DELETED, LSN}
    val key = to.keyColumn
    val fromPaths = from.files.map(_.path).toSet
    val toPaths = to.files.map(_.path).toSet
    val added = to.files.filterNot(f => fromPaths(f.path))
    // Buckets that only LOST files in the range must also be diffed: a
    // compaction can leave a bucket with zero files (every key tombstoned
    // and the tombstones dropped below the watermark), and keyed off added
    // files alone those keys' delete events would be silently missed.
    val removed = from.files.filterNot(f => toPaths(f.path))
    val buckets = (added.map(_.bucket) ++ removed.map(_.bucket)).toSet
    val dataJson = graft.merge.MergeInto.dataSchemaOf(to.schema, to.fold == "patch").json
    val payloadCols = to.schema.fieldNames.filterNot(_ == key).toSeq

    // MOR deltas name the changed keys exactly; restrict both sides to
    // them. Removed files contribute their keys too (a dropped key may have
    // no surviving row on the to-side to name it); they are from-side files
    // the diff reads in full anyway, so this stays a key-column scan.
    val candKeys: Option[DataFrame] =
      if (to.writeMode == "mor" && (added.nonEmpty || removed.nonEmpty)) {
        val sides =
          (if (added.isEmpty) Nil
           else Seq(readFiles(to.copy(schemaJson = dataJson), added).select(col(key)))) ++
          (if (removed.isEmpty) Nil
           else Seq(readFiles(from.copy(schemaJson = dataJson,
             columnMapping = to.columnMapping), removed).select(col(key))))
        Some(sides.reduce(_ union _).distinct())
      } else None

    def side(s: Snapshot): DataFrame = {
      val bucketFiles = s.files.filter(f => buckets(f.bucket))
      // to's columnMapping covers columns renamed after `fromVersion` too —
      // physical names are immutable, so it is valid for BOTH file vintages
      val raw = readFiles(s.copy(schemaJson = dataJson, columnMapping = to.columnMapping), bucketFiles)
      val narrowed = candKeys.fold(raw)(k => raw.join(k, Seq(key), "left_semi"))
      // resolve with TO's payload columns: the from-side snapshot may
      // predate additive evolution, but its files were read under dataJson
      val resolved = IceLiteTable.resolve(narrowed, s.copy(schemaJson = to.schema.json))
      resolved.select(
        col(key) +: col(LSN) +:
          coalesce(col(DELETED), lit(false)).as(DELETED) +: payloadCols.map(col): _*)
    }

    val before = side(from).select(
      col(key).as("__bk") +: col(LSN).as("__blsn") +: col(DELETED).as("__bdel") +:
        payloadCols.map(c => col(c).as(s"__b_$c")): _*)
    val after = side(to)
    val j = after.join(before, after(key) === before("__bk"), "full_outer")
    val liveB = col("__bk").isNotNull && !col("__bdel")
    val liveA = after(key).isNotNull && !after(DELETED)
    val beforeImage =
      if (includeBefore)
        payloadCols.map(c => when(liveB, col(s"__b_$c")).otherwise(lit(null)).as(s"before_$c"))
      else Nil
    j.withColumn("change_op",
        when(!liveB && liveA, lit("insert"))
          .when(liveB && liveA && col(LSN) =!= col("__blsn"), lit("update"))
          .when(liveB && !liveA, lit("delete")))
      .filter(col("change_op").isNotNull)
      .select(
        coalesce(after(key), col("__bk")).as(key) +:
          col("change_op") +:
          when(after(key).isNotNull, col(LSN)).as("lsn") +:
          (payloadCols.map(c => when(liveA, col(c)).otherwise(lit(null)).as(c)) ++
            beforeImage): _*)
  }

  // ---- write-audit-publish (staged commits) -----------------------------

  /** MERGE a change batch WITHOUT publishing it: the full merge compute
    * runs (data files written, epoch-ledger marker built, stats collected),
    * but the candidate snapshot parks at `meta/staged-<stage>.json` instead
    * of the version chain — invisible to every reader until
    * [[publishStaged]]. The write-audit-publish pattern for training-data
    * governance: stage an epoch, run quality gates over [[stagedChanges]]
    * (or [[readStaged]]), then publish atomically or [[dropStaged]] —
    * readers never observe a batch that failed its audit.
    *
    * Re-staging the same name first reclaims the previous attempt's files.
    * Exactly-once holds across the gap: the staged ledger marker rides into
    * the publish commit, and a concurrent duplicate delivery of the same
    * epoch makes publish a no-op ([[CommitOutcome.EpochWon]]). */
  def mergeStaged(changes: DataFrame, epochKey: String, stage: String,
                  registryJson: Option[String] = None,
                  extraLineage: Map[String, Long] = Map.empty): CommitStats = {
    dropStaged(stage): Unit
    graft.merge.MergeInto.run(this, changes, epochKey, registryJson,
      extraLineage = extraLineage,
      commitFn = Some((_, cand) => {
        IceLite.writeStagedSnapshot(fs, rootP, stage, cand)
        CommitOutcome.Committed
      }))
  }

  /** The staged candidate snapshot, if `stage` exists. */
  def stagedSnapshot(stage: String): Option[Snapshot] =
    IceLite.readStagedSnapshot(fs, rootP, stage)

  private def requireStaged(stage: String): Snapshot =
    stagedSnapshot(stage).getOrElse(
      throw new IllegalArgumentException(s"no staged commit named '$stage'"))

  /** Read the table AS IF `stage` were published (tombstones filtered,
    * internal columns hidden) — the audit's whole-table view. */
  def readStaged(stage: String): DataFrame = readSnap(requireStaged(stage))

  /** The NET row-level changes `stage` would publish (same shape as
    * [[changesBetween]]: change_op insert/update/delete, optional
    * before-images) — the audit's delta view, O(touched buckets). */
  def stagedChanges(stage: String, includeBefore: Boolean = false): DataFrame = {
    val cand = requireStaged(stage)
    changesBetweenSnapshots(snapshotAt(cand.parentVersion), cand, includeBefore)
  }

  /** Names of parked staged commits. */
  def stagedNames: Seq[String] = IceLite.stagedNamesOf(fs, rootP)

  /** Publish a staged commit atomically onto the CURRENT head via the
    * rebasing protocol: ingest that landed in other buckets since the stage
    * is absorbed driver-side; a same-epoch duplicate yields
    * ([[CommitOutcome.EpochWon]]); an overlapping-bucket commit returns
    * [[CommitOutcome.Overlap]] (stage the batch again — its data files were
    * reclaimed). The stage marker is consumed in every outcome. */
  def publishStaged(stage: String): CommitOutcome = {
    val cand = requireStaged(stage)
    val base = snapshotAt(cand.parentVersion)
    val out = commitRebasing(base, cand)
    fs.delete(IceLite.stagedPath(rootP, stage), false): Unit
    out
  }

  /** Discard a staged commit: its added data files are deleted (diffed
    * against the base snapshot; if the base was expired meanwhile the files
    * are left to [[vacuum]], which stops protecting them once the marker is
    * gone). Returns false when no such stage exists. */
  def dropStaged(stage: String): Boolean =
    stagedSnapshot(stage) match {
      case None => false
      case Some(cand) =>
        try {
          val basePaths = snapshotAt(cand.parentVersion).files.map(_.path).toSet
          deleteDataFiles(cand.files.map(_.path).filterNot(basePaths))
        } catch { case _: Throwable => () }
        fs.delete(IceLite.stagedPath(rootP, stage), false)
    }

  /** Audit-and-publish in one call: `audit` sees the staged DELTA
    * ([[stagedChanges]]); true publishes, false drops. Returns the commit
    * outcome, or None when the audit rejected the stage. */
  def publishStagedIf(stage: String)(audit: DataFrame => Boolean): Option[CommitOutcome] =
    if (audit(stagedChanges(stage))) Some(publishStaged(stage))
    else { dropStaged(stage): Unit; None }

  /** Metadata table (Iceberg's `table$history` analog): one row per
    * snapshot version with parent, epoch count, write mode and the commit
    * stats — driver-side metadata only, no data files touched. */
  def history: DataFrame = {
    import spark.implicits._
    existingVersions.map { v =>
      val s = IceLite.readSnapshot(fs, rootP, v)
      (s.version, s.parentVersion, s.committedEpochs.size.toLong, s.files.size.toLong,
        s.files.map(_.rows).sum, s.writeMode,
        s.stats.map(_.epochKey).getOrElse(""),
        s.lineage.getOrElse("rollback.to", -1L))
    }.toDF("version", "parent_version", "epochs", "data_files", "rows",
      "write_mode", "last_epoch", "rollback_to")
  }

  /** Metadata table (`table$files` analog): the current snapshot's data
    * files with per-file stats — what the merge's adaptive pruning reads. */
  def filesMeta: DataFrame = {
    import spark.implicits._
    snapshot.files
      .map(f => (f.path, f.bucket, f.rows, f.minKey, f.maxKey, f.tombstones, f.fullRange))
      .toDF("path", "bucket", "rows", "min_key", "max_key", "tombstones", "full_range")
  }

  /** METADATA-ONLY column rename (Iceberg-style rename evolution): no data
    * file is touched. The snapshot's [[Snapshot.columnMapping]] binds the new
    * logical name to the column's immutable physical (storage) name; reads
    * alias physical -> logical at the scan, writes alias back, so files
    * written before and after the rename interoperate and the rename costs
    * O(1) metadata regardless of table size — the 10^10-row posture (a
    * rewrite would be O(table)). Time travel to pre-rename versions shows the
    * old name; re-adding the retired name later creates a fresh column whose
    * storage name is minted to avoid the retired physical name (old data can
    * never leak into it — see [[graft.merge.MergeInto.evolveMapping]]).
    * Renaming the key column is allowed (manifest key stats store VALUES, not
    * names). Commits through [[commitRebasing]]: concurrent data-only merges
    * rebase under the rename; a concurrent divergent schema change aborts.
    * Returns the committed version. */
  def renameColumn(oldName: String, newName: String): Long = {
    val snap = snapshot
    require(snap.schema.fieldNames.contains(oldName),
      s"renameColumn: no column $oldName in ${snap.schema.fieldNames.mkString(",")}")
    require(!snap.schema.fieldNames.contains(newName),
      s"renameColumn: column $newName already exists")
    val phys = snap.physicalName(oldName)
    val newSchema = StructType(snap.schema.fields.map(f =>
      if (f.name == oldName) f.copy(name = newName) else f))
    val mapping = (snap.columnMapping - oldName) ++
      (if (phys == newName) Map.empty[String, String] else Map(newName -> phys))
    val cand = snap.copy(
      version = snap.version + 1,
      schemaJson = newSchema.json,
      keyColumn = if (snap.keyColumn == oldName) newName else snap.keyColumn,
      columnMapping = mapping,
      parentVersion = snap.version,
      stats = None)
    commitRebasing(snap, cand) match {
      case CommitOutcome.Committed => snapshot.version
      case out => throw new IllegalStateException(
        s"renameColumn($oldName -> $newName) lost to a concurrent schema change: $out")
    }
  }

  /** Tag a snapshot under a stable name (Iceberg tags): `ref.<name> ->
    * version` rides the table properties — metadata-only, rebases across
    * concurrent data merges. A tagged version is PINNED: [[expireSnapshots]]
    * keeps its version file and [[vacuum]] keeps its data files, however old
    * it gets — the "corpus revision this model trained on" handle, readable
    * forever via [[readTag]] / `icelite_at(path, 'name')`. Tags live in
    * snapshot properties, so [[rollbackTo]] restores the ref set as of the
    * rollback target. Defaults to the current version. Returns the
    * committed version. */
  def tagSnapshot(name: String, version: Long = -1L): Long = {
    require(name.matches("[A-Za-z0-9._-]+"), s"tagSnapshot: invalid tag name '$name'")
    val v = if (version < 0L) snapshot.version else version
    require(versionExists(v), s"tagSnapshot: version $v does not exist")
    alterProperties(Map(s"ref.$name" -> v.toString))
  }

  /** Remove a tag — its snapshot becomes reclaimable by the normal
    * [[expireSnapshots]]/[[vacuum]] retention again. */
  def dropTag(name: String): Long = {
    require(tags.contains(name), s"dropTag: no tag '$name'")
    alterProperties(Map.empty, Seq(s"ref.$name"))
  }

  /** Current tag map: name -> pinned version. */
  def tags: Map[String, Long] = snapshot.properties.collect {
    case (k, v) if k.startsWith("ref.") => k.stripPrefix("ref.") -> v.toLong
  }

  /** Table state at the tagged version (time travel by name). */
  def readTag(name: String): DataFrame = readVersion(tags.getOrElse(name,
    throw new IllegalArgumentException(s"readTag: no tag '$name'")))

  /** METADATA-ONLY additive column (`ALTER TABLE ... ADD COLUMN`): existing
    * files read null for it; subsequent merges populate it like any
    * additive evolution. Re-adding a previously-dropped logical name mints
    * a fresh physical storage name (the merge's own
    * [[graft.merge.MergeInto.evolveMapping]] rule), so bytes of the retired
    * column can never leak into the new one. Nullable by contract (old rows
    * have no value). Returns the committed version. */
  def addColumn(name: String, dataType: org.apache.spark.sql.types.DataType): Long = {
    val snap = snapshot
    require(!snap.schema.fieldNames.contains(name),
      s"addColumn: column $name already exists")
    val newSchema = StructType(snap.schema.fields :+
      org.apache.spark.sql.types.StructField(name, dataType, nullable = true))
    val cand = snap.copy(
      version = snap.version + 1,
      schemaJson = newSchema.json,
      columnMapping = graft.merge.MergeInto.evolveMapping(snap, newSchema),
      parentVersion = snap.version,
      stats = None)
    commitRebasing(snap, cand) match {
      case CommitOutcome.Committed => snapshot.version
      case out => throw new IllegalStateException(
        s"addColumn($name) lost to a concurrent schema change: $out")
    }
  }

  /** METADATA-ONLY column drop (Iceberg-style): no data file is touched —
    * the column leaves the snapshot schema, its bytes stay in existing
    * files (invisible: every read projects the current schema) until
    * compaction naturally rewrites them, and its PHYSICAL name is retired
    * so a later re-add of the same logical name mints a fresh storage name
    * — old data can never leak into the new column
    * ([[graft.merge.MergeInto.evolveMapping]]). Time travel to pre-drop
    * versions still shows the column. The key column cannot be dropped.
    * Commits through [[commitRebasing]] (concurrent data-only merges
    * rebase; divergent schema changes abort). Returns the committed
    * version. */
  def dropColumn(name: String): Long = {
    val snap = snapshot
    require(snap.schema.fieldNames.contains(name),
      s"dropColumn: no column $name in ${snap.schema.fieldNames.mkString(",")}")
    require(snap.keyColumn != name, s"dropColumn: $name is the key column")
    val phys = snap.physicalName(name)
    val cand = snap.copy(
      version = snap.version + 1,
      schemaJson = StructType(snap.schema.fields.filterNot(_.name == name)).json,
      columnMapping = snap.columnMapping - name,
      retiredPhysical = (snap.retiredPhysical :+ phys).distinct,
      parentVersion = snap.version,
      stats = None)
    commitRebasing(snap, cand) match {
      case CommitOutcome.Committed => snapshot.version
      case out => throw new IllegalStateException(
        s"dropColumn($name) lost to a concurrent schema change: $out")
    }
  }

  /** METADATA-ONLY table-property evolution (the `ALTER TABLE ... SET
    * TBLPROPERTIES` of Iceberg/Delta): tune compaction cadence, stats
    * columns, bloom filters, thresholds — zero data files touched. Commits
    * through the optimistic protocol, so a property edit rebases across
    * concurrent data merges (one-sided, like renames); two DIVERGENT
    * property edits recompute against the fresh snapshot — last writer
    * wins per whole edit, bounded retries.
    *
    * Layout-semantic keys are create-time-only: `write.mode` and
    * `write.merge.fold` decide how EXISTING delta files resolve at read, so
    * flipping them on a non-empty table would reinterpret data already
    * written (MOR deltas read under COW rules resurrect superseded rows).
    * Returns the committed version. */
  def alterProperties(set: Map[String, String], unset: Seq[String] = Nil): Long = {
    val frozen = Set("write.mode", "write.merge.fold")
    val touched = set.keySet ++ unset
    require(touched.nonEmpty, "alterProperties: nothing to change")
    val bad = touched.intersect(frozen)
    require(bad.isEmpty,
      s"alterProperties: ${bad.mkString(", ")} is create-time-only (decides how existing files resolve)")
    var attempt = 0
    while (attempt < 10) {
      val base = snapshot
      val cand = base.copy(
        version = base.version + 1,
        parentVersion = base.version,
        properties = base.properties -- unset ++ set,
        stats = None)
      commitRebasing(base, cand) match {
        case CommitOutcome.Committed => return snapshot.version
        case _ => attempt += 1 // divergent concurrent property edit: re-read, reapply
      }
    }
    throw new IllegalStateException("alterProperties: too much property-edit contention")
  }

  /** Roll the table back to an earlier snapshot by committing a NEW version
    * whose content equals `version`'s (Iceberg-style rollback: history is
    * append-only, nothing is deleted — time travel to the undone versions
    * keeps working until [[vacuum]] reclaims their files). The epoch ledger
    * reverts too, so epochs merged after `version` become replayable —
    * exactly-once redelivery semantics hold across the rollback. Returns
    * the new current version. */
  def rollbackTo(version: Long): Long = {
    val cur = snapshot
    require(version < cur.version,
      s"rollbackTo($version): target must precede current version ${cur.version}")
    val target = snapshotAt(version)
    val rolled = target.copy(
      version = cur.version + 1,
      parentVersion = cur.version,
      lineage = target.lineage + ("rollback.to" -> version) + ("rollback.from" -> cur.version),
      stats = None)
    commit(rolled)
    rolled.version
  }

  /** `graceMs` protects CONCURRENT WRITERS: a writer's data files exist on
    * disk before its snapshot commit references them, so an unreferenced
    * parquet younger than the grace window may be a commit in flight, not
    * an orphan. Size it above the longest write-files-to-commit latency
    * (Iceberg's equivalent knob defaults to days); 0 = single-writer
    * semantics, reap everything unreferenced. */
  def vacuum(keepSnapshots: Int = 1, graceMs: Long = 0L): Int = {
    val current = IceLite.currentVersion(fs, rootP).getOrElse(return 0)
    val keepFrom = math.max(0, current - keepSnapshots + 1)
    // tagged versions' files stay referenced however old the tag gets
    val kept = ((keepFrom to current) ++ tags.values).distinct.filter(versionExists)
    // parked staged commits (write-audit-publish) hold their files too —
    // their bases may have been rewritten since, so include the full lists
    val stagedSnaps = stagedNames.flatMap(stagedSnapshot)
    val referenced = (kept.map(v => IceLite.readSnapshot(fs, rootP, v)) ++ stagedSnaps)
      .flatMap(_.files.map(_.path)).toSet
    val dataDir = new Path(rootP, "data")
    if (!fs.isDirectory(dataDir)) return 0
    var removed = 0
    val rootPath = fs.makeQualified(rootP).toUri.getPath
    val cutoff = System.currentTimeMillis() - graceMs
    // plain listStatus walk: fs.listFiles' LocatedFileStatus loads
    // permissions, which forks a subprocess per file on a non-native local FS
    def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
      if (st.isDirectory) walk(st.getPath)
      else {
        val rel = st.getPath.toUri.getPath.stripPrefix(rootPath).stripPrefix("/")
        if (!referenced.contains(rel) && rel.endsWith(".parquet") &&
            st.getModificationTime <= cutoff) {
          fs.delete(st.getPath, false); removed += 1
        }
      }
    }
    walk(dataDir)
    removed + gcManifests(cutoff)
  }

  private def versionExists(v: Long): Boolean =
    fs.exists(new Path(new Path(rootP, "meta"), s"v$v.json"))

  /** Versions whose v{N}.json still exists (gaps after [[expireSnapshots]]). */
  private def existingVersions: Seq[Long] = {
    val meta = new Path(rootP, "meta")
    if (!fs.isDirectory(meta)) return Nil
    fs.listStatus(meta).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toLong }
      .sorted
  }

  /** Delete manifest shards referenced by NO surviving version file (losing
    * concurrent commits orphan their shards; [[expireSnapshots]] drops the
    * versions that referenced old ones). The same grace window as data-file
    * vacuum protects a concurrent writer whose shards exist before its
    * version file does. Returns the number of shards removed. */
  private def gcManifests(cutoff: Long): Int = {
    val meta = new Path(rootP, "meta")
    val stagedRefs = stagedNames.flatMap { n =>
      try IceLite.mapperTree(fs, IceLite.stagedPath(rootP, n)).path("manifests")
        .elements().asScala.map(_.path("name").asText()).toSeq
      catch { case _: Throwable => Nil }
    }
    val referenced = (existingVersions
      .flatMap(v => IceLite.manifestRefsOf(fs, rootP, v)) ++ stagedRefs).toSet
    var removed = 0
    fs.listStatus(meta).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("man-") && name.endsWith(".json") &&
          !referenced.contains(name) && st.getModificationTime <= cutoff) {
        fs.delete(st.getPath, false); removed += 1
      }
    }
    removed
  }

  /** Rewrite the table into a NEW bucket count — the layout-evolution
    * maintenance op for a table that outgrew its day-one choice (at the
    * 10^10-event design point, bucket count bounds merge parallelism and
    * per-bucket file sizes; Iceberg calls this partition-spec evolution,
    * done here as a full rewrite because bucket membership changes for
    * every key). Deliberately O(table): one resolve + one clustered write,
    * the same shape as a full compaction. Tombstones above `lsnWatermark`
    * survive (late-arrival guard); MOR deltas collapse (the rewrite IS a
    * compaction). Commits via plain [[commit]], NOT the rebasing path — a
    * concurrent merge's bucket labels would belong to the OLD layout, so
    * layout changes require the maintenance window any full rewrite does
    * (a racing commit makes this throw; nothing is corrupted). */
  def rebucket(newNumBuckets: Int, lsnWatermark: Long = Long.MinValue): Long = {
    import org.apache.spark.sql.functions._
    import graft.merge.MergeInto.{DELETED, LSN}
    require(newNumBuckets > 0, s"rebucket: need a positive bucket count, got $newNumBuckets")
    val snap = snapshot
    val dataSchema = graft.merge.MergeInto.dataSchemaOf(snap.schema, snap.fold == "patch")
    val resolved = IceLiteTable.resolve(
      readFiles(snap.copy(schemaJson = dataSchema.json), snap.files), snap)
      .filter(!(coalesce(col(DELETED), lit(false)) && col(LSN) < lsnWatermark))
    val version = snap.version + 1
    val reSnap = snap.copy(numBuckets = newNumBuckets)
    val newFiles = graft.merge.MergeInto.writeDataFiles(this, reSnap, resolved, version)
    commit(reSnap.copy(
      version = version,
      files = newFiles,
      parentVersion = snap.version,
      lineage = snap.lineage + ("rebucket.to" -> newNumBuckets.toLong),
      stats = None))
    version
  }

  /** Expire old snapshot VERSION FILES, keeping the most recent
    * `keepSnapshots` (Iceberg's expire_snapshots): bounds metadata growth on
    * a long-running ingest — without it a year of 10-second epochs leaves
    * ~3M version JSONs in meta/. Time travel and rollback to expired
    * versions stop working (by design); manifest shards and data files they
    * alone referenced become unreferenced and are reclaimed by the next
    * [[vacuum]]. The current version is never expired. Returns the number
    * of version files removed. */
  def expireSnapshots(keepSnapshots: Int): Int = {
    require(keepSnapshots >= 1, "expireSnapshots: must keep at least the current version")
    val current = IceLite.currentVersion(fs, rootP).getOrElse(return 0)
    val keepFrom = current - keepSnapshots + 1
    val pinned = tags.values.toSet // tagged versions never expire
    var removed = 0
    existingVersions.filter(v => v < keepFrom && !pinned(v)).foreach { v =>
      fs.delete(new Path(new Path(rootP, "meta"), s"v$v.json"), false); removed += 1
    }
    removed
  }
}
