package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental CDC-out (`changesBetween`): net per-key changes between two
  * snapshots, identical across COW and MOR, carried rows silent, and
  * version-bound sanity. */
class ChangesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val payload = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("tokens", ArrayType(IntegerType, containsNull = false)),
    StructField("n_tok", IntegerType),
    StructField("source", StringType)))

  /** (doc_id, op, lsn) -> change frame in the merge's input shape. */
  private def changes(rows: Seq[(String, String, Long)]): DataFrame =
    rows.toDF("doc_id", "op", "lsn").select(
      col("doc_id"), col("op"), col("lsn"),
      when(col("op") =!= "d", struct(
        col("doc_id"),
        array(lit(7), col("lsn").cast(IntegerType)).as("tokens"),
        lit(2).as("n_tok"),
        concat(lit("s"), col("lsn")).as("source")))
        .as("after"))

  private def collectChanges(df: DataFrame): Set[(String, String, Option[Long])] =
    df.select("doc_id", "change_op", "lsn").collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

  private def runMode(mode: String): Set[(String, String, Option[Long])] = {
    val root = SparkTestBase.tempDir(s"chg-$mode")
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 4,
      properties = Map("write.mode" -> mode))
    // epoch 1: k1 insert, k2 insert, k3 insert, k4 insert+delete
    t.merge(changes(Seq(
      ("k1", "c", 1), ("k2", "c", 2), ("k3", "c", 3),
      ("k4", "c", 4), ("k4", "d", 5))), "e1")
    val v1 = t.snapshot.version
    // epoch 2: k2 updated, k3 deleted, k5 inserted, k6 insert+delete (net
    // nothing), k4 resurrected (dead before -> insert)
    t.merge(changes(Seq(
      ("k2", "u", 10), ("k3", "d", 11), ("k5", "c", 12),
      ("k6", "c", 13), ("k6", "d", 14), ("k4", "u", 15))), "e2")
    val out = collectChanges(t.changesBetween(v1, t.snapshot.version))
    // sanity: from == to -> empty
    assert(t.changesBetween(v1, v1).count() == 0)
    out
  }

  test("net changes classified; carried keys silent; COW == MOR") {
    val expected = Set(
      ("k2", "update", Some(10L)),
      ("k3", "delete", Some(11L)),
      ("k5", "insert", Some(12L)),
      ("k4", "insert", Some(15L)))
    // k1 carried (same lsn both sides) and k6 dead-both-sides emit NOTHING
    val cow = runMode("cow")
    val mor = runMode("mor")
    assert(cow == expected, s"cow: $cow")
    assert(mor == expected, s"mor: $mor")
  }

  test("payload columns carry the after-state; deletes carry nulls") {
    val root = SparkTestBase.tempDir("chg-payload")
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 2)
    t.merge(changes(Seq(("a", "c", 1), ("b", "c", 2))), "e1")
    val v1 = t.snapshot.version
    t.merge(changes(Seq(("a", "u", 9), ("b", "d", 8))), "e2")
    val rows = t.changesBetween(v1, t.snapshot.version)
      .select("doc_id", "change_op", "source", "n_tok").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2)),
        if (r.isNullAt(3)) None else Some(r.getInt(3)))).toSet
    assert(rows == Set(
      ("a", "update", Some("s9"), Some(2)),
      ("b", "delete", None, None)), rows.toString)
  }

  test("changesBetween reads only buckets that gained a file") {
    val root = SparkTestBase.tempDir("chg-prune")
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 8)
    t.merge(changes((0 until 32).map(i => (s"k$i", "c", i.toLong))), "e1")
    val v1 = t.snapshot.version
    t.merge(changes(Seq(("k0", "u", 100L))), "e2")
    val from = t.snapshotAt(v1)
    val to = t.snapshot
    val fromPaths = from.files.map(_.path).toSet
    val touched = to.files.filterNot(f => fromPaths(f.path)).map(_.bucket).toSet
    assert(touched.nonEmpty && touched.size < 8, s"single-key update touched $touched")
    val df = t.changesBetween(v1, to.version)
    val read = df.inputFiles
    assert(read.nonEmpty)
    // every scanned file belongs to a touched bucket (partition dir encodes it)
    read.foreach { p =>
      assert(touched.exists(b => p.contains(s"__bucket=$b/")),
        s"read an untouched bucket's file: $p (touched: $touched)")
    }
    assert(collectChanges(df) == Set(("k0", "update", Some(100L))))
  }

  test("removed-only buckets still emit deletes (tombstones compacted to zero files)") {
    for (mode <- Seq("cow", "mor")) {
      val root = SparkTestBase.tempDir(s"chg-removed-$mode")
      val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 4,
        properties = Map("write.mode" -> mode))
      val keys = (0 until 24).map(i => s"k$i")
      t.merge(changes(keys.zipWithIndex.map { case (k, i) => (k, "c", i.toLong) }), "e1")
      val v1 = t.snapshot.version
      // delete EVERY key of one bucket, then drop the tombstones below the
      // watermark: the bucket ends the range with only REMOVED files, and a
      // plan keyed off added files alone would silently miss the deletes
      val byBucket = keys.groupBy(k => graft.hashing.KafkaMurmur2.bucketLabelOf(k, 4))
      val (victimBucket, victims) = byBucket.maxBy(_._2.size)
      t.merge(changes(victims.zipWithIndex.map { case (k, i) => (k, "d", 100L + i) }), "e2")
      t.compactTombstones(lsnWatermark = 1000L)
      val to = t.snapshot
      assert(!to.files.exists(_.bucket == victimBucket),
        s"[$mode] expected bucket $victimBucket to end with zero files: ${to.files.map(_.path)}")
      // native path: deletes with null lsn (the tombstone itself is gone)
      val out = collectChanges(t.changesBetween(v1, to.version))
      assert(out == victims.map(k => (k, "delete", None: Option[Long])).toSet,
        s"[$mode] $out")
      // connector CDF path agrees
      val feed = spark.read.format("icelite")
        .option("changeFeed", "true").option("startingVersion", v1.toString)
        .load(root)
      assert(collectChanges(feed) == out, s"[$mode] connector disagreed")
    }
  }

  test("pre/post images + Maintain.sumCount == from-scratch aggregate") {
    val root = SparkTestBase.tempDir("chg-incr")
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 4)
    // sources are per-row here (concat "s"+lsn in changes()), so an update
    // MOVES a key between groups — the retraction algebra's hard case
    t.merge(changes(Seq(("a", "c", 1), ("b", "c", 2), ("c", "c", 3), ("d", "c", 4))), "e1")
    val v1 = t.snapshot.version
    t.merge(changes(Seq(("a", "u", 10), ("b", "d", 11), ("e", "c", 12))), "e2")

    val ch = t.changesBetween(v1, t.snapshot.version, includeBefore = true)
    val img = ch.select("doc_id", "change_op", "source", "before_source").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2)), Option(r.getString(3))))
      .toSet
    assert(img == Set(
      ("a", "update", Some("s10"), Some("s1")), // group moved s1 -> s10
      ("b", "delete", None, Some("s2")),        // pre-image on the retraction
      ("e", "insert", Some("s12"), None)), img.toString)

    val base = t.readVersion(v1).groupBy(col("source"))
      .agg(sum(col("n_tok")).cast("long").as("sum_n_tok"), count(lit(1)).as("n"))
    val maintained = Maintain.sumCount(base, ch, "source", "n_tok")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val scratch = t.read().groupBy(col("source"))
      .agg(sum(col("n_tok")).cast("long").as("sum_n_tok"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(maintained == scratch, s"maintained $maintained != scratch $scratch")
    // groups s1 (a left) and s2 (b deleted) must have VANISHED, not linger at 0
    assert(!maintained.exists(r => r._1 == "s1" || r._1 == "s2"), maintained.toString)
  }

  test("changesBetween spans additive schema evolution (old rows read null)") {
    val root = SparkTestBase.tempDir("chg-evolve")
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 2)
    t.merge(changes(Seq(("a", "c", 1), ("b", "c", 2))), "e1")
    val v1 = t.snapshot.version
    // epoch 2 evolves the payload: adds a `lang` column
    val evolved = changes(Seq(("a", "u", 9), ("c", "c", 10)))
      .withColumn("after",
        when(col("after").isNotNull,
          col("after").withField("lang", concat(lit("L"), col("lsn")))))
    t.merge(evolved, "e2")
    val rows = t.changesBetween(v1, t.snapshot.version)
      .select("doc_id", "change_op", "source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(rows == Set(
      ("a", "update", "s9", "L9"),
      ("c", "insert", "s10", "L10")), rows.toString)
  }

  test("CdcOut exports incrementally, exactly-once, and replays committed ranges") {
    val root = SparkTestBase.tempDir("cdcout-table")
    val out = SparkTestBase.tempDir("cdcout-export") + "/exp"
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 4)
    t.merge(changes(Seq(("k1", "c", 1), ("k2", "c", 2))), "e1")
    // first export covers (0, v1]
    val Some((f1, t1)) = CdcOut.exportLatest(t, out): @unchecked
    assert(f1 == 0 && t1 == t.snapshot.version)
    // idempotent: nothing new -> no-op, high-water unchanged
    assert(CdcOut.exportLatest(t, out).isEmpty)
    assert(CdcOut.exportedThrough(t, out) == t1)
    // more commits -> next export covers exactly (v1, v2]
    t.merge(changes(Seq(("k2", "u", 10), ("k3", "c", 11), ("k1", "d", 12))), "e2")
    val Some((f2, t2)) = CdcOut.exportLatest(t, out): @unchecked
    assert(f2 == t1 && t2 == t.snapshot.version)
    val replay = CdcOut.readExports(t, out)
    val byKey = replay.select("doc_id", "change_op", "__export_to").collect()
      .map(r => (r.getString(0), r.getLong(2)) -> r.getString(1)).toMap
    assert(byKey(("k1", t1)) == "insert" && byKey(("k1", t2)) == "delete")
    assert(byKey(("k2", t2)) == "update" && byKey(("k3", t2)) == "insert")
    // crash-shaped: a data directory WITHOUT its marker is invisible to the
    // high-water scan and gets overwritten by the re-run
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    t.merge(changes(Seq(("k5", "c", 20))), "e3")
    val v3 = t.snapshot.version
    val uncommitted = new org.apache.hadoop.fs.Path(s"$out/range_${t2}_$v3")
    fs.mkdirs(uncommitted) // simulated partial write, no _committed
    assert(CdcOut.exportedThrough(t, out) == t2)
    val Some((f3, t3)) = CdcOut.exportLatest(t, out): @unchecked
    assert(f3 == t2 && t3 == v3)
    assert(CdcOut.readExports(t, out).filter(col("doc_id") === "k5").count() == 1)
  }

  test("tailStream consumes exports exactly-once across restarts; staging invisible") {
    val root = SparkTestBase.tempDir("cdctail-table")
    val out = SparkTestBase.tempDir("cdctail-export") + "/exp"
    val ckpt = SparkTestBase.tempDir("cdctail-ckpt")
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 4)
    t.merge(changes(Seq(("k1", "c", 1), ("k2", "c", 2))), "e1")
    CdcOut.exportLatest(t, out)
    t.merge(changes(Seq(("k2", "u", 10), ("k3", "c", 11))), "e2")
    CdcOut.exportLatest(t, out)
    // staging residue (simulated crash mid-export) must be invisible to the tail
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$out/.stage_range_99_100"))

    // one sink dir across restarts — the parquet sink's _spark_metadata log
    // and the checkpoint are a pair; duplicates would show up as extra rows
    val sinkDir = SparkTestBase.tempDir("cdctail-sink")
    def drain(): Seq[(String, String)] = {
      val q = CdcOut.tailStream(t, out)
        .writeStream
        .format("parquet")
        .option("path", sinkDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(sinkDir).select("doc_id", "change_op").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
    }

    val first = drain()
    assert(first.toSet == Set(("k1", "insert"), ("k2", "insert"),
      ("k2", "update"), ("k3", "insert")), first.toString)
    assert(first.size == 4)
    // restart with the SAME checkpoint after one more export: exactly the new
    // range's rows are added (each file ingested exactly once — no replays)
    t.merge(changes(Seq(("k1", "d", 20))), "e3")
    CdcOut.exportLatest(t, out)
    val second = drain()
    assert(second.size == 5, second.toString)
    assert((second diff first) == Seq(("k1", "delete")), second.toString)
  }

  test("changesBetween rejects inverted version ranges") {
    val root = SparkTestBase.tempDir("chg-bad")
    val t = IceLite.create(spark, root, payload, "doc_id", numBuckets = 2)
    t.merge(changes(Seq(("a", "c", 1))), "e1")
    val v = t.snapshot.version
    intercept[IllegalArgumentException](t.changesBetween(v, v - 1))
  }
}
