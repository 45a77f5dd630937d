package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Ad-hoc row-level DML ([[IceLiteTable.deleteWhere]] /
  * [[IceLiteTable.updateWhere]] and the SQL `DELETE FROM` / `UPDATE` /
  * `OPTIMIZE` / `VACUUM` statements): corrections outside the CDC stream
  * ride the merge path — touched-buckets-only writes, per-row lsn+1
  * causality (a later upstream event still wins), statement-digest
  * exactly-once. */
class DmlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val payloadType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("n_tok", IntegerType),
    StructField("source", StringType)))

  private def batch(rows: Seq[(String, Int, String)], lsnBase: Long): DataFrame =
    rows.zipWithIndex.map { case ((k, n, s), i) => (k, "u", lsnBase + i, n, s) }
      .toDF("doc_id", "op", "lsn", "n_tok", "source")
      .select(col("doc_id"), col("op"), col("lsn"),
        struct(col("doc_id"), col("n_tok"), col("source")).as("after"))

  private def mkTable(mode: String = "cow") =
    IceLite.create(spark, SparkTestBase.tempDir("dml"), payloadType, "doc_id",
      numBuckets = 8, properties = Map("write.mode" -> mode))

  private def state(t: IceLiteTable): Seq[(String, Int, String)] =
    t.read().select("doc_id", "n_tok", "source")
      .as[(String, Int, String)].collect().sortBy(_._1).toSeq

  private val seed = Seq(
    ("a", 5, "web"), ("b", 50, "web"), ("c", 7, "book"), ("d", 70, "book"))

  for (mode <- Seq("cow", "mor")) {
    test(s"deleteWhere removes matching rows through the merge path ($mode)") {
      val t = mkTable(mode)
      t.merge(batch(seed, 10), "s/0")
      val preVersion = t.snapshot.version
      val stats = t.deleteWhere(col("n_tok") > 20)
      assert(stats.deleted == 2)
      assert(state(t) == Seq(("a", 5, "web"), ("c", 7, "book")))
      // time travel still shows the pre-DML state
      assert(t.readVersion(preVersion).count() == 4)
    }

    test(s"updateWhere rewrites matching rows, expressions see current values ($mode)") {
      val t = mkTable(mode)
      t.merge(batch(seed, 10), "s/0")
      val stats = t.updateWhere(
        Seq("n_tok" -> (col("n_tok") + 1), "source" -> lit("fixed")),
        col("source") === "book")
      // COW joins the target and reports updates; MOR appends deltas and
      // reports upserts as inserted — either way, 2 rows changed
      assert(stats.updated + stats.inserted == 2)
      assert(state(t) == Seq(
        ("a", 5, "web"), ("b", 50, "web"), ("c", 8, "fixed"), ("d", 71, "fixed")))
    }
  }

  test("a later upstream change outranks the correction; an earlier one loses") {
    val t = mkTable()
    t.merge(batch(seed, lsnBase = 10), "s/0")
    t.updateWhere(Seq("source" -> lit("fixed")), col("doc_id") === "a")
    // replayed STALE event (lsn 10 < the correction's row-lsn+1): loses
    t.merge(batch(Seq(("a", 99, "stale")), lsnBase = 10), "s/1")
    assert(state(t).find(_._1 == "a").get == (("a", 5, "fixed")))
    // genuinely NEW upstream event (lsn far above): wins over the correction
    t.merge(batch(Seq(("a", 42, "new")), lsnBase = 1000), "s/2")
    assert(state(t).find(_._1 == "a").get == (("a", 42, "new")))
  }

  test("corrections order above the table-wide max lsn, not per-row winner+1") {
    val t = mkTable()
    t.merge(batch(seed, lsnBase = 10), "s/0") // lsns 10..13; a's winner = 10
    t.updateWhere(Seq("source" -> lit("fixed")), col("doc_id") === "a") // lsn 14
    // an upstream event below the table max at correction time (lsn 12)
    // would have OUTRANKED a per-row winner+1 correction (11) — and lsn 11
    // would have TIED nondeterministically; the table-wide ordering makes
    // the correction supersede the whole applied window deterministically
    t.merge(batch(Seq(("a", 99, "concurrent")), lsnBase = 12), "s/1")
    assert(state(t).find(_._1 == "a").get == (("a", 5, "fixed")))
    // events above the correction's lsn still win
    t.merge(batch(Seq(("a", 42, "new")), lsnBase = 15), "s/2")
    assert(state(t).find(_._1 == "a").get == (("a", 42, "new")))
    // write.dml.lsn.stride reserves a wider guard band
    val t2 = IceLite.create(spark, SparkTestBase.tempDir("dml-stride"), payloadType,
      "doc_id", numBuckets = 8, properties = Map("write.dml.lsn.stride" -> "1000"))
    t2.merge(batch(seed, 10), "s/0")
    t2.deleteWhere(col("doc_id") === "a") // correction lsn = 13 + 1000
    t2.merge(batch(Seq(("a", 1, "mid")), lsnBase = 500), "s/1") // inside band: loses
    assert(!state(t2).exists(_._1 == "a"))
    t2.merge(batch(Seq(("a", 1, "post")), lsnBase = 2000), "s/2") // beyond: wins
    assert(state(t2).find(_._1 == "a").get == (("a", 1, "post")))
  }

  test("patch-fold UPDATE rejects assignments that evaluate to NULL") {
    val t = IceLite.create(spark, SparkTestBase.tempDir("dml-patch"), payloadType,
      "doc_id", numBuckets = 8,
      properties = Map("write.mode" -> "mor", "write.merge.fold" -> "patch"))
    t.merge(batch(seed, 10), "s/0")
    // a non-null assignment applies normally through the fold
    t.updateWhere(Seq("source" -> lit("fixed")), col("doc_id") === "a")
    assert(state(t).find(_._1 == "a").get == (("a", 5, "fixed")))
    // literal null and a null-evaluating expression both raise instead of
    // silently no-opping (the patch fold reads null as "unchanged")
    intercept[Exception] {
      t.updateWhere(Seq("source" -> lit(null)), col("doc_id") === "a")
    }
    intercept[Exception] {
      t.updateWhere(Seq("n_tok" -> when(col("n_tok") < 0, 1)), col("doc_id") === "a")
    }
    assert(state(t).find(_._1 == "a").get == (("a", 5, "fixed")))
  }

  test("malformed icelite DDL fails with a targeted grammar error, not a delegate error") {
    val p = SparkTestBase.tempDir("ddl-bad") + "/t"
    // a ')' inside a TBLPROPERTIES value is outside the scoped grammar on
    // both CREATE and ALTER — it must fail with the grammar message, not
    // fall through to the delegate's unrelated "table not found"
    val e = intercept[IllegalArgumentException] {
      sql(s"CREATE TABLE icelite.`$p` (doc_id STRING) KEY doc_id TBLPROPERTIES ('a'='x)y')")
    }
    assert(e.getMessage.contains("scoped icelite grammar"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      sql(s"ALTER TABLE icelite.`$p` SET TBLPROPERTIES ('a'='v(1)x)y')")
    }
    assert(e2.getMessage.contains("scoped icelite grammar"), e2.getMessage)
  }

  test("statement retry at the same version is an exactly-once ledger no-op") {
    val t = mkTable()
    t.merge(batch(seed, 10), "s/0")
    val s1 = t.updateWhere(Seq("n_tok" -> (col("n_tok") + 1)), col("doc_id") === "a")
    assert(s1.updated == 1)
    // same statement, same pre-statement snapshot version -> same epoch key;
    // the merge path replays it as a no-op instead of double-applying
    val v = t.snapshot.version
    val s2 = graft.merge.MergeInto.run(t,
      batch(Seq(("a", 0, "zzz")), 5000), s1.epochKey)
    assert(s2.inserted == 0 && s2.updated == 0 && t.snapshot.version == v)
    assert(state(t).find(_._1 == "a").get == (("a", 6, "web")))
    // a DELIBERATE re-run sees the advanced version -> fresh key, applies
    val s3 = t.updateWhere(Seq("n_tok" -> (col("n_tok") + 1)), col("doc_id") === "a")
    assert(s3.updated == 1 && s3.epochKey != s1.epochKey)
    assert(state(t).find(_._1 == "a").get == (("a", 7, "web")))
  }

  test("zero-match DML leaves the table untouched") {
    val t = mkTable()
    t.merge(batch(seed, 10), "s/0")
    val v = t.snapshot.version
    val stats = t.deleteWhere(col("n_tok") > 1000000)
    assert(stats.deleted == 0 && state(t).size == 4)
    assert(t.snapshot.version >= v) // marker-only commit allowed; data equal
  }

  test("updateWhere refuses key-column assignment and unknown columns") {
    val t = mkTable()
    t.merge(batch(seed, 10), "s/0")
    intercept[IllegalArgumentException] {
      t.updateWhere(Seq("doc_id" -> lit("x")), lit(true))
    }
    intercept[IllegalArgumentException] {
      t.updateWhere(Seq("nope" -> lit(1)), lit(true))
    }
  }

  // The shared test session has no injected extensions; drive the graft
  // parser explicitly, exactly like GraftExtensionsSpec's MERGE INTO case.
  private def sql(stmt: String) = {
    val parser = new graft.sql.GraftSqlParser(spark.sessionState.sqlParser)
    org.apache.spark.sql.graftbridge.Exprs.ofRows(spark, parser.parsePlan(stmt))
  }

  test("SQL DELETE FROM / UPDATE route to the table DML (full expression language)") {
    val t = mkTable()
    t.merge(batch(seed, 10), "s/0")
    val del = sql(
      s"DELETE FROM icelite.`${t.root}` WHERE n_tok > 20 AND source = 'web'").head()
    assert(del.getLong(1) == 1)
    val upd = sql(
      s"UPDATE icelite.`${t.root}` SET n_tok = n_tok * 2, source = upper(source) " +
        "WHERE doc_id IN ('a', 'c')").head()
    assert(upd.getLong(1) == 2)
    assert(state(t) == Seq(
      ("a", 10, "WEB"), ("c", 14, "BOOK"), ("d", 70, "book")))
    // a DELETE on a non-icelite relation passes through to Spark's own
    // analyzer untouched (fails there — temp views are not row-deletable —
    // proving the statement wasn't swallowed)
    batch(seed, 0).createOrReplaceTempView("dml_passthrough")
    intercept[Exception] { sql("DELETE FROM dml_passthrough WHERE op = 'u'").collect() }
  }

  test("SQL OPTIMIZE compacts; OPTIMIZE ZORDER clusters; VACUUM expires + reaps") {
    // MOR: delta files accumulate per epoch, so compaction has work to do
    // (a COW table keeps one resolved file per bucket by construction)
    val t = mkTable("mor")
    // several tiny epochs -> many small files
    (0 until 4).foreach(i => t.merge(batch(seed.map { case (k, n, s) =>
      (k + i, n + i, s) }, 100 + i * 10), s"s/$i"))
    val before = t.snapshot.files.size
    val compacted = sql(s"OPTIMIZE icelite.`${t.root}`").head().getLong(0)
    assert(compacted > 0 && t.snapshot.files.size < before)
    val z = sql(
      s"OPTIMIZE icelite.`${t.root}` ZORDER BY (n_tok, source)").head().getLong(0)
    assert(z > 0 && t.snapshot.properties.contains("table.zorder.columns"))
    val vac = sql(s"VACUUM icelite.`${t.root}` RETAIN 1 SNAPSHOTS").head()
    assert(vac.getLong(0) > 0) // expired snapshots
    assert(state(t).size == 16) // data intact after maintenance
  }

  test("SQL CREATE TABLE / DESCRIBE: creation and inspection without the Scala API") {
    val root = SparkTestBase.tempDir("ddl") + "/t1"
    val v = sql(
      s"""CREATE TABLE icelite.`$root` (
         |  doc_id STRING NOT NULL, tokens ARRAY<INT>, score DECIMAL(10,2),
         |  n_tok INT) KEY doc_id BUCKETS 8
         |TBLPROPERTIES ('write.mode'='mor')""".stripMargin).head().getLong(0)
    assert(v == 0L)
    val t = IceLite.load(spark, root)
    assert(t.snapshot.keyColumn == "doc_id" && t.snapshot.numBuckets == 8)
    assert(t.snapshot.writeMode == "mor")
    assert(t.snapshot.schema.fieldNames.toSeq ==
      Seq("doc_id", "tokens", "score", "n_tok"))
    assert(t.snapshot.schema("score").dataType.simpleString == "decimal(10,2)")
    // duplicate CREATE throws; IF NOT EXISTS returns the current version
    intercept[IllegalArgumentException] {
      sql(s"CREATE TABLE icelite.`$root` (doc_id STRING) KEY doc_id").collect()
    }
    assert(sql(s"CREATE TABLE IF NOT EXISTS icelite.`$root` (doc_id STRING) KEY doc_id")
      .head().getLong(0) == 0L)
    // the created table is immediately mergeable and describable
    val d = sql(s"DESCRIBE icelite.`$root`").collect()
    assert(d.map(_.getString(0)).take(4).toSeq == Seq("doc_id", "tokens", "score", "n_tok"))
    assert(d.find(_.getString(0) == "doc_id").get.getString(2) == "key")
    assert(d.exists(r => r.getString(0) == "# buckets" && r.getString(1) == "8"))
    assert(d.exists(r => r.getString(0) == "# property:write.mode" && r.getString(1) == "mor"))
    // a non-icelite CREATE/DESCRIBE still parses through the delegate
    assert(sql("DESCRIBE SELECT 1 AS x").collect().nonEmpty)
  }
}
