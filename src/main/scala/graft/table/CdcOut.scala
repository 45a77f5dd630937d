package graft.table

import org.apache.hadoop.fs.Path

/**
 * CDC-out: the "binlog out" side of the engine. Exports the net per-key
 * changes of every not-yet-exported snapshot range ([[IceLiteTable
 * .changesBetween]]) as a parquet directory per range under `outRoot`,
 * for downstream consumers (replication, cache invalidation, derived-view
 * maintenance) that cannot read the table's snapshots directly.
 *
 * Exactly-once under crashes and re-runs WITHOUT side state: a range
 * directory counts only once its `_committed` marker exists, and the
 * marker is written strictly after the parquet data. Resume scans the
 * markers to find the high-water version; a crash between data write and
 * marker leaves an uncommitted directory that the re-run simply
 * overwrites. Re-invoking after a table [[IceLiteTable.rollbackTo]] keeps
 * exporting forward (the rollback itself is a change-producing commit, so
 * consumers see the revert as regular change rows).
 *
 * Scale: each export reads only the files the range's commits added
 * (touched buckets; MOR deltas name changed keys exactly) — O(changes),
 * never O(table).
 */
object CdcOut {

  private val Marker = "_committed"
  private val DirRe = "^range_(\\d+)_(\\d+)$".r

  /** Versions already exported to `outRoot`: max committed `to` (0 if none). */
  def exportedThrough(table: IceLiteTable, outRoot: String): Long = {
    val fs = IceLite.fsFor(new Path(outRoot), table.spark.sparkContext.hadoopConfiguration)
    val root = new Path(outRoot)
    if (!fs.exists(root)) return 0L
    fs.listStatus(root).toSeq.flatMap { st =>
      st.getPath.getName match {
        case DirRe(_, to) if fs.exists(new Path(st.getPath, Marker)) => Some(to.toLong)
        case _ => None
      }
    }.foldLeft(0L)(math.max)
  }

  /** Export everything committed since the last export. Returns the
    * (from, to] range written, or None when already up to date.
    *
    * Publication is ATOMIC: data + marker are staged in a dot-prefixed
    * directory and become visible in one rename — so [[tailStream]]'s file
    * source can never list a half-written range, and a crash at any point
    * leaves either invisible staging residue (overwritten by the re-run) or
    * a fully committed range (skipped by the re-run). On object stores
    * whose rename is copy-based (S3A) the marker check still provides
    * batch-reader correctness; for streaming tails prefer an HDFS-semantics
    * store for the export root. */
  def exportLatest(table: IceLiteTable, outRoot: String,
                   includeBefore: Boolean = false): Option[(Long, Long)] = {
    val cur = table.snapshot.version
    val last = exportedThrough(table, outRoot)
    if (cur <= last) return None
    val dirName = s"range_${last}_$cur"
    val fs = IceLite.fsFor(new Path(outRoot), table.spark.sparkContext.hadoopConfiguration)
    val finalP = new Path(outRoot, dirName)
    val staging = new Path(outRoot, s".stage_$dirName")
    table.changesBetween(last, cur, includeBefore)
      .write.options(IceLite.localFsOptions(outRoot))
      .mode("overwrite").parquet(staging.toString)
    val out = fs.create(new Path(staging, Marker), true)
    try out.write(Array.emptyByteArray) finally out.close()
    // a markerless final dir is residue of a crashed pre-staging layout or a
    // partial manual copy — the rename below must not land INSIDE it
    if (fs.exists(finalP)) fs.delete(finalP, true): Unit
    if (!fs.rename(staging, finalP))
      throw new java.io.IOException(s"CDC export publish failed: $finalP")
    Some((last, cur))
  }

  /** Schema of [[IceLiteTable.changesBetween]] / the exported ranges, for
    * consumers that need it up front (the streaming file source does). */
  def changeSchema(table: IceLiteTable, includeBefore: Boolean = false)
      : org.apache.spark.sql.types.StructType =
    changeSchema(table.snapshot, includeBefore)

  /** Same, from a pinned snapshot (the DataSource V2 change feed plans
    * against one without a table handle). */
  def changeSchema(s: Snapshot, includeBefore: Boolean)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    val payload = s.schema.fields.filterNot(_.name == s.keyColumn).toSeq
    StructType(
      Seq(s.schema(s.keyColumn),
        StructField("change_op", StringType),
        StructField("lsn", LongType)) ++
        payload.map(_.copy(nullable = true)) ++
        (if (includeBefore) payload.map(f =>
          StructField(s"before_${f.name}", f.dataType)) else Nil))
  }

  /** The export root as a continuous, exactly-once STREAMING source: a
    * downstream consumer (`readStream` -> transforms -> `writeStream` with a
    * checkpoint) tails the table's change feed without ever touching its
    * snapshots. Built on Spark's file stream source — each range's files
    * are ingested exactly once (tracked in the consumer's own checkpoint
    * file log), ranges become visible atomically (see [[exportLatest]]),
    * and the `_committed` marker is invisible to the source (underscore
    * convention). Glob cost per micro-batch is a LISTING of committed range
    * dirs — O(retained exports), so pair a long-running tail with export
    * housekeeping the way any file-based CDC feed is retained. */
  def tailStream(table: IceLiteTable, outRoot: String,
                 includeBefore: Boolean = false): org.apache.spark.sql.DataFrame =
    table.spark.readStream
      .schema(changeSchema(table, includeBefore))
      .parquet(s"$outRoot/range_*")

  /** All committed exported changes under `outRoot` as one DataFrame —
    * what a downstream consumer replays, in (from, to] range order by the
    * `__export_to` column. */
  def readExports(table: IceLiteTable, outRoot: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val fs = IceLite.fsFor(new Path(outRoot), table.spark.sparkContext.hadoopConfiguration)
    val root = new Path(outRoot)
    val dirs =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq.collect {
        case st if DirRe.matches(st.getPath.getName) &&
          fs.exists(new Path(st.getPath, Marker)) => st.getPath.toString
      }
    require(dirs.nonEmpty, s"no committed CDC exports under $outRoot")
    table.spark.read.options(IceLite.localFsOptions(outRoot)).parquet(dirs: _*)
      .withColumn("__export_to",
        regexp_extract(input_file_name(), "range_\\d+_(\\d+)/", 1).cast("long"))
  }
}
