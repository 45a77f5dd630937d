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
    * (from, to] range written, or None when already up to date. */
  def exportLatest(table: IceLiteTable, outRoot: String,
                   includeBefore: Boolean = false): Option[(Long, Long)] = {
    val cur = table.snapshot.version
    val last = exportedThrough(table, outRoot)
    if (cur <= last) return None
    val dirName = s"range_${last}_$cur"
    val dir = s"$outRoot/$dirName"
    table.changesBetween(last, cur, includeBefore)
      .write.mode("overwrite").parquet(dir)
    val fs = IceLite.fsFor(new Path(outRoot), table.spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(new Path(dir), Marker), true)
    try out.write(Array.emptyByteArray) finally out.close()
    Some((last, cur))
  }

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
    table.spark.read.parquet(dirs: _*)
      .withColumn("__export_to",
        regexp_extract(input_file_name(), "range_\\d+_(\\d+)/", 1).cast("long"))
  }
}
