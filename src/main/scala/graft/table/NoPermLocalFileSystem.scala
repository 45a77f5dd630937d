package graft.table

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/**
 * Fork-free local filesystem for table data and metadata I/O.
 *
 * Without the native hadoop library, Hadoop's local filesystems shell out
 * to a subprocess per permission operation: `chmod` behind every
 * create/mkdirs (`RawLocalFileSystem.setPermission`) and `ls -ld` behind
 * every lazy permission load (`DeprecatedRawLocalFileStatus` — triggered
 * by the `LocatedFileStatus` wrapping every Spark scan listing and every
 * `fs.listFiles`). Profiled on this engine's merge path at ~25% of the
 * driver's inter-job wall, plus per-task forks in every write stage.
 *
 * Table I/O needs neither permissions nor `.crc` shadow files (this class
 * extends Raw, not Checksum): setPermission is a no-op (files land under
 * the process umask like any JVM-written file), and statuses are returned
 * with a pre-filled default permission so nothing ever loads one lazily.
 * Used for `file:`-scheme paths only — real clusters (hdfs/s3a) keep
 * their native filesystems; see [[IceLite.fsFor]] and
 * [[IceLite.localFsOptions]].
 */
final class NoPermLocalFileSystem extends RawLocalFileSystem {

  override def setPermission(p: Path, permission: FsPermission): Unit = ()

  private def strip(s: FileStatus): FileStatus =
    if (s == null) s
    else new FileStatus(s.getLen, s.isDirectory, 1, s.getBlockSize,
      s.getModificationTime, s.getAccessTime,
      if (s.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
      "", "", null, s.getPath)

  override def getFileStatus(f: Path): FileStatus = strip(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] = {
    val ss = super.listStatus(f)
    if (ss == null) ss else ss.map(strip)
  }
}
