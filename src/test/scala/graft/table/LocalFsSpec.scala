package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fork-free local filesystem the table/data IO paths rely on:
  * no subprocess-backed permission ops, statuses with pre-filled
  * permissions (nothing lazily shells out `ls -ld`), and normal
  * create/rename/list/delete semantics. */
class LocalFsSpec extends AnyFunSuite {

  private def newFs(): NoPermLocalFileSystem = {
    val fs = new NoPermLocalFileSystem
    fs.initialize(java.net.URI.create("file:///"), new Configuration())
    fs
  }

  test("fsFor returns the fork-free FS for file-scheme paths only") {
    val conf = new Configuration()
    assert(IceLite.fsFor(new Path("/tmp/x"), conf).isInstanceOf[NoPermLocalFileSystem])
    assert(IceLite.fsFor(new Path("file:///tmp/x"), conf).isInstanceOf[NoPermLocalFileSystem])
  }

  test("localFsOptions set only for local paths") {
    assert(IceLite.localFsOptions("/tmp/x").get("fs.file.impl")
      .contains(classOf[NoPermLocalFileSystem].getName))
    assert(IceLite.localFsOptions("file:///tmp/x").nonEmpty)
    assert(IceLite.localFsOptions("hdfs://nn/x").isEmpty)
    assert(IceLite.localFsOptions("s3a://bucket/x").isEmpty)
  }

  test("create/list/rename/delete round-trip with pre-filled statuses") {
    val fs = newFs()
    val dir = java.nio.file.Files.createTempDirectory("graft-fs-spec").toString
    val p = new Path(dir, "a.bin")
    val out = fs.create(p, false)
    try out.write(Array[Byte](1, 2, 3)) finally out.close()
    // no .crc shadow file (Raw, not Checksum)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, ".a.bin.crc")))
    val st = fs.getFileStatus(p)
    assert(st.getLen == 3 && !st.isDirectory)
    // permission is pre-filled — reading it must not lazily load (the
    // DeprecatedRawLocalFileStatus subclass would; ours returns a plain
    // FileStatus whose permission is already set)
    assert(st.getClass == classOf[org.apache.hadoop.fs.FileStatus])
    assert(st.getPermission != null)
    val listed = fs.listStatus(new Path(dir))
    assert(listed.map(_.getPath.getName).toSet == Set("a.bin"))
    assert(listed.forall(_.getClass == classOf[org.apache.hadoop.fs.FileStatus]))
    val p2 = new Path(dir, "b.bin")
    assert(fs.rename(p, p2))
    assert(fs.getFileStatus(p2).getLen == 3)
    assert(fs.delete(p2, false))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("a Spark parquet write with localFsOptions produces readable files") {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fs-wr").toString + "/out"
    Seq((1, "a"), (2, "b")).toDF("id", "s")
      .write.options(IceLite.localFsOptions(dir)).parquet(dir)
    // written without .crc shadows, readable through the default FS
    val crcs = new java.io.File(dir).listFiles().count(_.getName.endsWith(".crc"))
    assert(crcs == 0, s"expected no .crc files, found $crcs")
    assert(spark.read.parquet(dir).count() == 2)
  }
}
