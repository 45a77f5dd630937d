package graft.sources

import graft.SparkTestBase
import graft.table.IceLite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Change feed through the DataSource V2 connector: batch CDF must equal
  * the library-native `changesBetween`, and the streaming tail must resume
  * from its checkpoint and emit each committed range exactly once. */
class IceLiteChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val payloadType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("tokens", ArrayType(IntegerType)),
    StructField("n_tok", IntegerType),
    StructField("source", StringType)))

  private def changes(n: Int, lsnBase: Long): DataFrame =
    spark.range(0, n).select(
      concat(lit("doc"), col("id")).as("doc_id"),
      lit("u").as("op"),
      (col("id") + lsnBase).as("lsn"),
      struct(
        concat(lit("doc"), col("id")).as("doc_id"),
        sequence(lit(1), (col("id") % 5 + 1).cast("int")).as("tokens"),
        (col("id") % 5 + 1).cast("int").as("n_tok"),
        concat(lit("s"), col("id") % 3).as("source")).as("after"))

  private def deletes(keys: Seq[String], lsn: Long): DataFrame =
    keys.toDF("doc_id").select(col("doc_id"), lit("d").as("op"), lit(lsn).as("lsn"),
      lit(null).cast(payloadType).as("after"))

  private def mkTable(mode: String, props: Map[String, String] = Map.empty) =
    IceLite.create(spark, SparkTestBase.tempDir("cfeed"), payloadType, "doc_id",
      numBuckets = 8, properties = props + ("write.mode" -> mode))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private def cdf(root: String, opts: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("icelite").option("changeFeed", "true")
    opts.foreach { case (k, v) => r.option(k, v) }
    r.load(root)
  }

  test("change diff spills to a sorted merge-diff past the in-heap watermark") {
    // Cap the in-heap side maps far below the bucket cardinality: every
    // partition must take the sorted merge-diff path, and the change set
    // must be identical to the unbounded map diff on every mode and with
    // pre-images. Insert + update + delete + carried all present.
    for (mode <- Seq("cow", "mor")) {
      val t = mkTable(mode)
      t.merge(changes(200, 0), "e1")
      val v1 = t.snapshot.version
      t.merge(changes(80, 1000), "e2") // docs 0..79 updated; 80..199 carried
      t.merge(deletes(Seq("doc150", "doc199"), 5000), "e3")
      val unbounded = sortedRows(cdf(t.root,
        Map("startingVersion" -> v1.toString, "includeBefore" -> "true")))
      spark.conf.set("graft.icelite.maxResolveKeysInMemory", "4")
      try {
        val spilled = sortedRows(cdf(t.root,
          Map("startingVersion" -> v1.toString, "includeBefore" -> "true")))
        assert(spilled == unbounded, s"[$mode] spilled diff diverged")
        assert(spilled.nonEmpty && spilled.exists(_.contains("delete")))
      } finally spark.conf.unset("graft.icelite.maxResolveKeysInMemory")
    }
  }

  test("full-history diff past the changed-key watermark equals the unbounded diff") {
    // The MOR key-restriction set is itself watermarked: a range naming more
    // keys than maxResolveKeysInMemory abandons the restriction (full-bucket
    // diff) and the winner resolve degrades to the key-sorted merge — the
    // change set must be identical, including deletes whose files a
    // compaction removed (removed-only keys).
    val t = mkTable("mor")
    t.merge(changes(150, 0), "e1")
    val v1 = t.snapshot.version
    t.merge(changes(120, 1000), "e2")
    t.merge(deletes((0 until 30).map(i => s"doc$i"), 5000), "e3")
    t.compactBuckets((0 until 8).toSet) // drops replaced delta files from the manifest
    val unbounded = sortedRows(cdf(t.root,
      Map("startingVersion" -> v1.toString, "includeBefore" -> "true")))
    spark.conf.set("graft.icelite.maxResolveKeysInMemory", "4")
    try {
      val bounded = sortedRows(cdf(t.root,
        Map("startingVersion" -> v1.toString, "includeBefore" -> "true")))
      assert(bounded == unbounded, "watermarked full-history diff diverged")
      assert(bounded.exists(_.contains("delete")) && bounded.exists(_.contains("update")))
    } finally spark.conf.unset("graft.icelite.maxResolveKeysInMemory")
  }

  test("batch CDF from v0 is the current state as inserts") {
    val t = mkTable("mor")
    t.merge(changes(100, 0), "e1")
    t.merge(changes(40, 1000), "e2") // overwrite first 40: still net inserts from v0
    val feed = cdf(t.root)
    assert(feed.schema.fieldNames.toSeq ==
      Seq("doc_id", "change_op", "lsn") ++ payloadType.fieldNames.filterNot(_ == "doc_id"))
    assert(feed.filter($"change_op" =!= "insert").isEmpty)
    assert(sortedRows(feed.select("doc_id", "n_tok", "source")) ==
      sortedRows(t.read().select("doc_id", "n_tok", "source")))
  }

  test("batch CDF between versions equals changesBetween on every mode") {
    for (props <- Seq(Map("write.mode" -> "cow"), Map("write.mode" -> "mor"),
      Map("write.mode" -> "mor", "write.merge.fold" -> "patch"))) {
      val t = IceLite.create(spark, SparkTestBase.tempDir("cfeed"), payloadType,
        "doc_id", numBuckets = 8, properties = props)
      t.merge(changes(120, 0), "e1")
      val v1 = t.snapshot.version
      t.merge(changes(30, 1000), "e2")           // 30 updates
      t.merge(deletes(Seq("doc3", "doc77"), 9000), "e3")
      val feed = cdf(t.root, Map("startingVersion" -> v1.toString))
      val native = t.changesBetween(v1, t.snapshot.version)
      assert(feed.schema.fieldNames.toSeq == native.schema.fieldNames.toSeq,
        s"schema mismatch for $props")
      assert(sortedRows(feed) == sortedRows(native), s"rows mismatch for $props")
      // 30 keys updated, minus doc3 whose NET change over the range is the
      // later delete (doc77 is outside the updated range)
      assert(feed.filter($"change_op" === "update").count() == 29)
    }
  }

  test("classification and before-images") {
    val t = mkTable("mor")
    t.merge(changes(50, 0), "e1")
    val v1 = t.snapshot.version
    t.merge(changes(10, 1000), "e2")              // updates doc0..doc9
    t.merge(deletes(Seq("doc20"), 9000), "e3")    // delete
    val extra = Seq(("docNEW", 9001L)).toDF("doc_id", "lsn").select(
      col("doc_id"), lit("u").as("op"), col("lsn"),
      struct(col("doc_id"), lit(Array(1, 2)).as("tokens"), lit(2).as("n_tok"),
        lit("sX").as("source")).as("after"))
    t.merge(extra, "e4")                          // insert
    val feed = cdf(t.root,
      Map("startingVersion" -> v1.toString, "includeBefore" -> "true"))
    val byOp = feed.groupBy("change_op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byOp == Map("insert" -> 1L, "update" -> 10L, "delete" -> 1L))
    val native = t.changesBetween(v1, t.snapshot.version, includeBefore = true)
    assert(sortedRows(feed) == sortedRows(native))
    // update rows carry the pre-image; the delete's payload is null
    val up = feed.filter($"change_op" === "update" && $"doc_id" === "doc7").head()
    assert(up.getAs[String]("before_source") == "s1")
    val del = feed.filter($"change_op" === "delete").head()
    assert(del.isNullAt(del.fieldIndex("n_tok")) &&
      del.getAs[String]("before_source") != null)
  }

  test("planning touches only buckets that gained files") {
    val t = mkTable("mor")
    t.merge(changes(200, 0), "e1")
    val v1 = t.snapshot.version
    t.merge(changes(1, 5000), "e2") // one key -> one bucket
    val parts = IceLiteChangeFeed.planPartitions(t.root, v1, t.snapshot.version)
    assert(parts.length == 1, s"one changed key must plan one bucket, got ${parts.length}")
    assert(cdf(t.root, Map("startingVersion" -> v1.toString)).count() == 1)
  }

  test("streaming tail resumes from the checkpoint, each range exactly once") {
    val t = mkTable("mor")
    t.merge(changes(60, 0), "e1")
    val ckpt = SparkTestBase.tempDir("cfeed-ckpt")
    val outDir = SparkTestBase.tempDir("cfeed-out")

    def runOnce(): Unit = {
      val q = spark.readStream.format("icelite")
        .option("changeFeed", "true").option("path", t.root).load()
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", outDir)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    runOnce()
    val got1 = spark.read.parquet(outDir)
    assert(got1.count() == 60 && got1.filter($"change_op" =!= "insert").isEmpty)

    t.merge(changes(15, 1000), "e2")
    t.merge(deletes(Seq("doc42"), 9000), "e3")
    runOnce()
    val got2 = spark.read.parquet(outDir)
    assert(got2.count() == 60 + 16, s"resume must append only the new ranges: ${got2.count()}")
    assert(got2.filter($"change_op" === "update").count() == 15)
    assert(got2.filter($"change_op" === "delete").count() == 1)

    runOnce() // nothing new committed -> nothing appended
    assert(spark.read.parquet(outDir).count() == 76)
  }

  test("admission control bounds catch-up batches to maxVersionsPerBatch") {
    val t = mkTable("mor")
    (0 until 5).foreach(i => t.merge(changes(10, i * 100L), s"e$i")) // 5 versions
    val ckpt = SparkTestBase.tempDir("cfeed-adm")
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("icelite")
      .option("changeFeed", "true").option("path", t.root)
      .option("maxVersionsPerBatch", "2").load()
      .writeStream.foreachBatch { (b: DataFrame, id: Long) =>
        batchSizes += b.count(): Unit
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // 5 committed versions at <=2/batch -> at least 3 micro-batches, and
    // the union of batches covers the full state exactly once
    assert(batchSizes.length >= 3, s"expected bounded batches, got $batchSizes")
    assert(batchSizes.sum >= 10, s"all changes must arrive: $batchSizes")
  }

  test("streaming tail feeds a downstream merge exactly-once (end-to-end CDC relay)") {
    // source table -> change feed stream -> merge into a REPLICA table;
    // the replica must converge to the source's state.
    val src = mkTable("mor")
    val dst = mkTable("mor")
    src.merge(changes(80, 0), "e1")
    src.merge(deletes(Seq("doc5", "doc6"), 5000), "e2")
    val ckpt = SparkTestBase.tempDir("cfeed-relay")

    val q = spark.readStream.format("icelite")
      .option("changeFeed", "true").option("path", src.root).load()
      .writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
        val asChanges = batch.select(
          col("doc_id"),
          when(col("change_op") === "delete", "d").otherwise("u").as("op"),
          coalesce(col("lsn"), lit(Long.MaxValue)).as("lsn"),
          when(col("change_op") =!= "delete",
            struct(col("doc_id"), col("tokens"), col("n_tok"), col("source"))).as("after"))
        dst.merge(asChanges, s"relay-$id"): Unit
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    assert(sortedRows(dst.read()) == sortedRows(src.read()))
    assert(dst.read().count() == 78)
  }
}
