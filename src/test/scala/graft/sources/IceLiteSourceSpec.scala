package graft.sources

import graft.SparkTestBase
import graft.table.IceLite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 connector: `spark.read.format("icelite")` must equal the
  * library-native `table.read()` on every write mode, prune columns and
  * files, and report manifest statistics. */
class IceLiteSourceSpec extends AnyFunSuite {
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
    IceLite.create(spark, SparkTestBase.tempDir("dsv2"), payloadType, "doc_id",
      numBuckets = 8, properties = props + ("write.mode" -> mode))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.orderBy("doc_id").collect().map(_.toString).toSeq

  test("cow: format read equals table.read(), tombstones filtered") {
    val t = mkTable("cow")
    t.merge(changes(200, 0), "e1")
    t.merge(changes(60, 1000), "e2")
    t.merge(deletes(Seq("doc3", "doc77"), 5000), "e3")
    val v2 = spark.read.format("icelite").load(t.root)
    assert(v2.schema.fieldNames.toSeq == payloadType.fieldNames.toSeq)
    assert(sortedRows(v2) == sortedRows(t.read()))
  }

  test("mor lww: winners resolve in-reader with no shuffle in the scan") {
    val t = mkTable("mor")
    t.merge(changes(150, 0), "e1")
    t.merge(changes(150, 1000), "e2")
    t.merge(deletes(Seq("doc5"), 9000), "e3")
    val v2 = spark.read.format("icelite").load(t.root)
    assert(sortedRows(v2) == sortedRows(t.read()))
    // the resolution is in-reader: the physical plan has no Exchange
    val plan = v2.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scan must not shuffle:\n$plan")
  }

  test("mor patch: per-key column fold equals resolvePatch") {
    val t = mkTable("mor", Map("write.merge.fold" -> "patch"))
    t.merge(changes(80, 0), "e1")
    // partial updates: only n_tok set, other columns null = unchanged
    val partial = spark.range(0, 40).select(
      concat(lit("doc"), col("id")).as("doc_id"),
      lit("u").as("op"),
      (col("id") + 2000).as("lsn"),
      struct(
        concat(lit("doc"), col("id")).as("doc_id"),
        lit(null).cast(ArrayType(IntegerType)).as("tokens"),
        lit(99).as("n_tok"),
        lit(null).cast(StringType).as("source")).as("after"))
    t.merge(partial, "e2")
    t.merge(deletes(Seq("doc11"), 9000), "e3")
    val v2 = spark.read.format("icelite").load(t.root)
    assert(sortedRows(v2) == sortedRows(t.read()))
    // spot-check the fold semantics end-to-end: folded row keeps e1 tokens
    val r = v2.filter($"doc_id" === "doc7").select("n_tok", "source").head
    assert(r.getInt(0) == 99 && r.getString(1) == "s1")
  }

  test("winner resolve spills to external sort past the in-heap key watermark") {
    // Cap the in-heap winner map far below the buckets' live-key counts:
    // every MOR/patch partition MUST take the external-sort path, and the
    // result must be byte-identical to the unbounded map resolve and the
    // native read — including LWW ties, deletes, and the patch fold.
    val t = mkTable("mor")
    t.merge(changes(400, 0), "e1")
    t.merge(changes(400, 1000), "e2") // every key rewritten: winner = e2
    t.merge(deletes(Seq("doc5", "doc111", "doc399"), 9000), "e3")
    val tp = mkTable("mor", Map("write.merge.fold" -> "patch"))
    tp.merge(changes(300, 0), "p1")
    tp.merge(changes(120, 1000), "p2")
    tp.merge(deletes(Seq("doc7"), 9000), "p3")
    val unbounded = Seq(t, tp).map(x =>
      sortedRows(spark.read.format("icelite").load(x.root)))
    spark.conf.set("graft.icelite.maxResolveKeysInMemory", "8")
    try {
      // ~50 live keys per bucket >> 8: the map path throws its watermark
      // marker and the sort path produces the rows (equality proves it)
      assert(sortedRows(spark.read.format("icelite").load(t.root)) == unbounded(0))
      assert(sortedRows(spark.read.format("icelite").load(t.root)) == sortedRows(t.read()))
      assert(sortedRows(spark.read.format("icelite").load(tp.root)) == unbounded(1))
      assert(sortedRows(spark.read.format("icelite").load(tp.root)) == sortedRows(tp.read()))
      // pushed key filters compose with the spill path
      val one = spark.read.format("icelite").load(t.root)
        .filter(col("doc_id") === "doc42")
      assert(one.count() == 1)
    } finally spark.conf.unset("graft.icelite.maxResolveKeysInMemory")
  }

  test("column pruning reaches the reader schema") {
    val t = mkTable("cow")
    t.merge(changes(50, 0), "e1")
    val v2 = spark.read.format("icelite").load(t.root).select("doc_id", "n_tok")
    assert(v2.collect().length == 50)
    assert(v2.queryExecution.executedPlan.toString.contains("IceLiteScan"))
  }

  test("key-equality pushdown prunes partitions (cow: files; mor: buckets)") {
    val tCow = mkTable("cow")
    tCow.merge(changes(400, 0), "e1")
    val sCow = tCow.snapshot
    val b = new IceLiteScanBuilder(tCow.root, sCow, spark.sessionState.newHadoopConf())
    b.pushFilters(Array(org.apache.spark.sql.sources.EqualTo("doc_id", "doc17")))
    val scan = b.build().asInstanceOf[IceLiteScan]
    val parts = scan.toBatch.planInputPartitions()
    assert(parts.length < sCow.files.size,
      s"expected pruning: ${parts.length} of ${sCow.files.size} files")
    // correctness end-to-end through the same pushdown
    val row = spark.read.format("icelite").load(tCow.root)
      .filter($"doc_id" === "doc17").select("n_tok").head
    assert(row.getInt(0) == 17 % 5 + 1)

    val tMor = mkTable("mor")
    tMor.merge(changes(400, 0), "e1")
    tMor.merge(changes(400, 1000), "e2")
    val sMor = tMor.snapshot
    val bm = new IceLiteScanBuilder(tMor.root, sMor, spark.sessionState.newHadoopConf())
    bm.pushFilters(Array(org.apache.spark.sql.sources.EqualTo("doc_id", "doc17")))
    val pm = bm.build().asInstanceOf[IceLiteScan].toBatch.planInputPartitions()
    assert(pm.length == 1, "a single-key MOR scan reads exactly the key's bucket")
    val got = spark.read.format("icelite").load(tMor.root)
      .filter($"doc_id" === "doc17").select("n_tok").head
    assert(got.getInt(0) == 17 % 5 + 1) // winner from e2 has same derived n_tok
  }

  test("pushed key values reach the parquet readers as a row-group predicate") {
    val t = mkTable("mor")
    t.merge(changes(300, 0), "e1")
    t.merge(changes(300, 1000), "e2")
    val s = t.snapshot
    val b = new IceLiteScanBuilder(t.root, s, spark.sessionState.newHadoopConf())
    b.pushFilters(Array(org.apache.spark.sql.sources.In("doc_id",
      Array[Any]("doc17", "doc42"))))
    val factory = b.build().asInstanceOf[IceLiteScan].toBatch
      .createReaderFactory().asInstanceOf[IceLiteReaderFactory]
    // the factory carries the pushed keys + the key's PHYSICAL name, and
    // builds a parquet FilterPredicate from them — row-group stats,
    // dictionary, and bloom skipping all hang off this predicate
    assert(factory.pushedKeyValues != null &&
      factory.pushedKeyValues.toSeq == Seq("doc17", "doc42"))
    assert(factory.physKeyName == s.physicalName(s.keyColumn))
    assert(IceLiteFilters.keyPredicate(factory.pushedKeyValues, factory.physKeyName)
      .exists(_.toString.contains("doc17")))
    // end-to-end: the record-level filter must keep ALL rows of the probed
    // keys (the winner resolve is exact) and the result equals native lookup
    val v2 = spark.read.format("icelite").load(t.root)
      .filter($"doc_id".isin("doc17", "doc42", "absent"))
    assert(sortedRows(v2) == sortedRows(t.lookup(Seq("doc17", "doc42", "absent"))))
    // an unfiltered scan pushes no key predicate into the readers
    val all = new IceLiteScanBuilder(t.root, s, spark.sessionState.newHadoopConf())
    val f2 = all.build().asInstanceOf[IceLiteScan].toBatch
      .createReaderFactory().asInstanceOf[IceLiteReaderFactory]
    assert(f2.pushedKeyValues == null)
  }

  test("zone-map range pushdown prunes files on a stats column") {
    val t = mkTable("cow", Map("write.stats.columns" -> "n_tok"))
    t.merge(changes(300, 0), "e1")
    val s = t.snapshot
    val b = new IceLiteScanBuilder(t.root, s, spark.sessionState.newHadoopConf())
    b.pushFilters(Array(org.apache.spark.sql.sources.GreaterThan("n_tok", 100)))
    val kept = b.build().asInstanceOf[IceLiteScan].toBatch.planInputPartitions()
    assert(kept.isEmpty, "n_tok <= 5 everywhere: every file must be skipped")
    assert(spark.read.format("icelite").load(t.root).filter($"n_tok" > 100).count() == 0)
  }

  test("time travel via version option; schema evolution null-fills") {
    val t = mkTable("cow")
    t.merge(changes(30, 0), "e1")
    val v1 = t.snapshot.version
    // evolve: add a column
    val evolved = StructType(payloadType.fields :+ StructField("lang", StringType))
    val withLang = spark.range(0, 10).select(
      concat(lit("doc"), col("id")).as("doc_id"),
      lit("u").as("op"),
      (col("id") + 500).as("lsn"),
      struct(
        concat(lit("doc"), col("id")).as("doc_id"),
        sequence(lit(1), lit(2)).cast(ArrayType(IntegerType)).as("tokens"),
        lit(2).as("n_tok"),
        lit("s9").as("source"),
        lit("en").as("lang")).as("after"))
    t.merge(withLang, "e2")
    val now = spark.read.format("icelite").load(t.root)
    assert(now.schema.fieldNames.contains("lang"))
    // old rows (from e1 files) null-fill lang; new rows carry it
    assert(now.filter($"lang" === "en").count() == 10)
    assert(now.filter($"lang".isNull).count() == 20)
    val old = spark.read.format("icelite").option("version", v1).load(t.root)
    assert(!old.schema.fieldNames.contains("lang") && old.count() == 30)
  }

  test("renamed column reads under its logical name") {
    val t = mkTable("cow")
    t.merge(changes(25, 0), "e1")
    t.renameColumn("source", "origin")
    val v2 = spark.read.format("icelite").load(t.root)
    assert(v2.schema.fieldNames.contains("origin"))
    assert(v2.select("origin").distinct().count() == 3)
    assert(sortedRows(v2) == sortedRows(t.read()))
  }

  test("estimateStatistics reports manifest row counts post-prune") {
    val t = mkTable("cow")
    t.merge(changes(120, 0), "e1")
    val s = t.snapshot
    val b = new IceLiteScanBuilder(t.root, s, spark.sessionState.newHadoopConf())
    val stats = b.build().asInstanceOf[IceLiteScan].estimateStatistics()
    assert(stats.numRows().getAsLong == 120)
    assert(stats.sizeInBytes().getAsLong > 0)
  }

  test("SQL surface: CREATE TEMPORARY VIEW USING icelite") {
    val t = mkTable("mor")
    t.merge(changes(40, 0), "e1")
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW dsv2_v USING icelite OPTIONS (path '${t.root}')")
    assert(spark.sql("SELECT count(*) FROM dsv2_v").head.getLong(0) == 40)
    val joined = spark.sql(
      "SELECT v.doc_id FROM dsv2_v v JOIN dsv2_v w ON v.doc_id = w.doc_id WHERE v.n_tok = 3")
    assert(joined.count() == 8) // ids with id%5+1==3: 2,7,...,37
  }

  test("runtime key filter prunes at execution time (DPP-style)") {
    val t = mkTable("mor")
    t.merge(changes(400, 0), "e1")
    val s = t.snapshot
    val b = new IceLiteScanBuilder(t.root, s, spark.sessionState.newHadoopConf())
    val scan = b.build().asInstanceOf[IceLiteScan]
    val all = scan.toBatch.planInputPartitions().length
    scan.filter(Array[org.apache.spark.sql.sources.Filter](org.apache.spark.sql.sources.In("doc_id", Array[Any]("doc17"))))
    val pruned = scan.toBatch.planInputPartitions().length
    assert(all > 1 && pruned == 1,
      s"runtime In must prune to the key's bucket ($all -> $pruned)")
    // conjunctive with a statically pushed key: disjoint sets -> empty scan
    val b2 = new IceLiteScanBuilder(t.root, s, spark.sessionState.newHadoopConf())
    b2.pushFilters(Array(org.apache.spark.sql.sources.EqualTo("doc_id", "doc17")))
    val scan2 = b2.build().asInstanceOf[IceLiteScan]
    scan2.filter(Array[org.apache.spark.sql.sources.Filter](org.apache.spark.sql.sources.In("doc_id", Array[Any]("doc999"))))
    assert(scan2.toBatch.planInputPartitions().isEmpty)
    // end-to-end: a key join stays correct whether or not the filter fires
    val dim = Seq("doc1", "doc42", "doc399").toDF("doc_id")
    val j = spark.read.format("icelite").load(t.root).join(dim, "doc_id")
    assert(j.count() == 3)
  }

  test("count(*) on a tombstone-free COW table is answered from the manifest") {
    val t = mkTable("cow")
    t.merge(changes(120, 0), "e1")
    val df = spark.read.format("icelite").load(t.root).groupBy().count()
    assert(df.head.getLong(0) == 120)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("IceLiteCountScan"), s"count must push to the manifest:\n$plan")
    // tombstoned files decline the pushdown (the manifest's `tombstones` is
    // a 0/1 presence flag, NOT a row count — two deletes in one bucket
    // would make a flag-based count wrong): exact via readers. Both deletes
    // target keys in the SAME bucket to pin exactly that case.
    val sameBucket = (1 until 120).map(i => s"doc$i")
      .groupBy(k => graft.hashing.KafkaMurmur2.bucketLabelOf(k, 8))
      .values.find(_.size >= 2).get.take(2)
    t.merge(deletes(sameBucket, 5000), "e2")
    val dDel = spark.read.format("icelite").load(t.root).groupBy().count()
    assert(!dDel.queryExecution.executedPlan.toString.contains("IceLiteCountScan"))
    assert(dDel.head.getLong(0) == 118)
    // MOR declines (net winners unknowable from counts): exact via readers
    val tm = mkTable("mor")
    tm.merge(changes(50, 0), "e1")
    tm.merge(deletes(Seq("doc1"), 5000), "e2")
    val dm = spark.read.format("icelite").load(tm.root).groupBy().count()
    assert(dm.head.getLong(0) == 49)
    assert(!dm.queryExecution.executedPlan.toString.contains("IceLiteCountScan"))
    // a filter declines the pushdown (manifest pruning is best-effort)
    val dfF = spark.read.format("icelite").load(t.root)
      .filter($"n_tok" > 2).groupBy().count()
    assert(!dfF.queryExecution.executedPlan.toString.contains("IceLiteCountScan"))
    assert(dfF.head.getLong(0) ==
      t.read().filter($"n_tok" > 2).count())
  }

  test("supplementary-plane keys are not wrongly pruned (UTF-8 byte-order stats)") {
    // Manifest minKey/maxKey are selected by unsigned UTF-8 byte order; a
    // UTF-16 comparison sees the surrogate pair (0xD83D) BELOW U+E000 and
    // would prune the file that contains the emoji key.
    val t = mkTable("cow")
    val emoji = "😀doc" // U+1F600, UTF-8 leading byte 0xF0
    val high = "doc"        // U+E000,  UTF-8 leading byte 0xEE
    val ch = Seq((emoji, 1L), (high, 2L)).toDF("doc_id", "lsn").select(
      col("doc_id"), lit("u").as("op"), col("lsn"),
      struct(col("doc_id"), lit(Array(1)).as("tokens"), lit(1).as("n_tok"),
        lit("s").as("source")).as("after"))
    t.merge(ch, "e1")
    val got = spark.read.format("icelite").load(t.root).filter($"doc_id" === emoji)
    assert(got.count() == 1, "byte-order stats must not prune the emoji key's file")
    assert(t.lookup(Seq(emoji)).count() == 1, "native lookup shares the comparator")
  }

  test("tag option reads the tagged snapshot") {
    val t = mkTable("cow")
    t.merge(changes(20, 0), "e1")
    t.tagSnapshot("rc1")
    t.merge(changes(50, 1000), "e2")
    val tagged = spark.read.format("icelite").option("tag", "rc1").load(t.root)
    assert(tagged.count() == 20)
    assert(spark.read.format("icelite").load(t.root).count() == 50)
  }
}
