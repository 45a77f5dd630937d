package graft

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** SQL surface for the custom Catalyst expressions. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("kafka_partition in SQL reproduces reference placements") {
    GraftExtensions.register(spark)
    val rows = spark.sql(
      """SELECT kafka_partition('some-partition-key', 3) AS a,
        |       kafka_partition('another-partition-key', 3) AS b,
        |       kafka_partition('1234-5678', 3) AS c""".stripMargin).head()
    assert(rows.getInt(0) == 1 && rows.getInt(1) == 2 && rows.getInt(2) == 2)
  }

  test("SQL MERGE INTO icelite runs the merge with exactly-once epochs") {
    import graft.stream.{ChangeGen, GenConfig}
    import graft.table.IceLite
    val root = SparkTestBase.tempDir("sql-merge")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    ChangeGen.events(spark, GenConfig(numDocs = 20, numEvents = 100, seed = 3, withMetadata = false))
      .createOrReplaceTempView("chg_ext")
    val parser = new graft.sql.GraftSqlParser(spark.sessionState.sqlParser)
    def mergeSql() = org.apache.spark.sql.graftbridge.Exprs.ofRows(spark, parser.parsePlan(
      s"MERGE INTO icelite.`$root` USING (SELECT doc_id, op, lsn, after FROM chg_ext) EPOCH 'sq/0'")).head()
    val first = mergeSql()
    assert(first.getLong(1) > 0) // inserted
    assert(table.read().count() > 0)
    val again = mergeSql()
    assert(again.getLong(1) == 0 && again.getLong(3) == 0) // re-delivery no-op
    // non-MERGE SQL still parses through the delegate
    assert(parser.parsePlan("SELECT 1").isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan])
    // ALTER TABLE ... RENAME COLUMN: metadata-only rename through SQL
    val filesBefore = table.snapshot.files.map(_.path).toSet
    val v = org.apache.spark.sql.graftbridge.Exprs.ofRows(spark, parser.parsePlan(
      s"ALTER TABLE icelite.`$root` RENAME COLUMN source TO origin")).head().getLong(0)
    assert(v == table.snapshot.version)
    assert(table.snapshot.files.map(_.path).toSet == filesBefore)
    assert(table.read().columns.contains("origin"))
    // ALTER TABLE ... SET/UNSET TBLPROPERTIES: metadata-only property evolution
    val v2 = org.apache.spark.sql.graftbridge.Exprs.ofRows(spark, parser.parsePlan(
      s"ALTER TABLE icelite.`$root` SET TBLPROPERTIES ('write.stats.columns'='val', 'graft.note'='x')"))
      .head().getLong(0)
    assert(v2 == table.snapshot.version)
    assert(table.snapshot.properties("write.stats.columns") == "val")
    assert(table.snapshot.properties("graft.note") == "x")
    assert(table.snapshot.files.map(_.path).toSet == filesBefore)
    org.apache.spark.sql.graftbridge.Exprs.ofRows(spark, parser.parsePlan(
      s"ALTER TABLE icelite.`$root` UNSET TBLPROPERTIES ('graft.note')")).head()
    assert(!table.snapshot.properties.contains("graft.note"))
  }

  test("table-valued functions: icelite_scan / _at / _changes / _history / _files") {
    import graft.stream.{ChangeGen, GenConfig}
    import graft.table.IceLite
    GraftExtensions.register(spark)
    val root = SparkTestBase.tempDir("tvf-table")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    val ev = ChangeGen.events(spark, GenConfig(numDocs = 15, numEvents = 80, seed = 9, withMetadata = false))
    table.merge(ev.filter(org.apache.spark.sql.functions.col("lsn") < 40), "tv/0")
    table.merge(ev.filter(org.apache.spark.sql.functions.col("lsn") >= 40), "tv/1")
    val v1 = 1L
    val v2 = table.snapshot.version

    // scan == read()
    val viaSql = spark.sql(s"SELECT doc_id, n_tok FROM icelite_scan('$root')")
      .collect().map(_.toString).sorted.toSeq
    val viaApi = table.read().select("doc_id", "n_tok")
      .collect().map(_.toString).sorted.toSeq
    assert(viaSql == viaApi && viaSql.nonEmpty)

    // time travel: v1 equals readVersion(v1), and differs from now
    val atV1 = spark.sql(s"SELECT doc_id FROM icelite_at('$root', $v1)").count()
    assert(atV1 == table.readVersion(v1).count())

    // changes between v1 and v2 equal the API frame
    val chSql = spark.sql(s"SELECT * FROM icelite_changes('$root', $v1, $v2)")
    assert(chSql.collect().map(_.toString).sorted.toSeq ==
      table.changesBetween(v1, v2).collect().map(_.toString).sorted.toSeq)
    assert(chSql.count() > 0)

    // metadata tables
    assert(spark.sql(s"SELECT * FROM icelite_history('$root')").count() == v2 + 1) // incl. create (v0)
    assert(spark.sql(s"SELECT * FROM icelite_files('$root')").count() ==
      table.snapshot.files.size)

    // TVFs compose with ordinary SQL (joins, aggregates, predicates push)
    val agg = spark.sql(
      s"""SELECT source, count(*) AS c FROM icelite_scan('$root')
         |WHERE n_tok >= 0 GROUP BY source""".stripMargin)
    assert(agg.collect().map(_.getLong(1)).sum == viaApi.size)
  }

  test("table-valued functions: icelite_staged / _staged_changes (audit views)") {
    import graft.stream.{ChangeGen, GenConfig}
    import graft.table.IceLite
    GraftExtensions.register(spark)
    val root = SparkTestBase.tempDir("tvf-staged")
    val table = IceLite.create(spark, root, ChangeGen.payloadSchema, "doc_id", numBuckets = 4)
    val ev = ChangeGen.events(spark, GenConfig(numDocs = 12, numEvents = 60, seed = 5, withMetadata = false))
    table.merge(ev.filter(org.apache.spark.sql.functions.col("lsn") < 30), "tv/0")
    table.mergeStaged(ev.filter(org.apache.spark.sql.functions.col("lsn") >= 30), "tv/1", "audit")

    assert(spark.sql(s"SELECT * FROM icelite_staged('$root', 'audit')")
      .collect().map(_.toString).sorted.toSeq ==
      table.readStaged("audit").collect().map(_.toString).sorted.toSeq)
    val deltaSql = spark.sql(
      s"""SELECT change_op, count(*) AS c
         |FROM icelite_staged_changes('$root', 'audit') GROUP BY change_op""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(deltaSql.values.sum == table.stagedChanges("audit").count() && deltaSql.values.sum > 0)
    // the published scan still excludes the stage
    assert(spark.sql(s"SELECT count(*) FROM icelite_scan('$root')").head().getLong(0) ==
      table.read().count())
  }

  test("bucket labels pack perfectly into any power-of-two partition count") {
    val ls = graft.hashing.KafkaMurmur2.labels(64)
    for (p <- Seq(2, 4, 8, 16, 32, 64)) {
      val bins = ls.map(v => {
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(v, 42)
        ((h % p) + p) % p
      }).groupBy(identity).map(_._2.length)
      assert(bins.size == p && bins.forall(_ == 64 / p), s"uneven packing at P=$p")
    }
  }

  test("dedup/ANN kernels are SQL-callable and agree with the Scala API") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat")).toDF("id", "text")
    docs.createOrReplaceTempView("docs_ext")
    val sqlRows = spark.sql(
      """SELECT id, simhash64(text) AS sig,
        |       minhash_bands(shingle_hashes(text, 3), 16, 4) AS bk,
        |       cosine_sim(array(1.0D, 2.0D, 2.0D), array(2.0D, 4.0D, 4.0D)) AS cs,
        |       lsh_bucket(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)), 2, 2) AS lb
        |FROM docs_ext""".stripMargin).orderBy("id").collect()
    val apiRows = docs.select(col("id"),
        graft.ops.Dedup.simhash(col("text")).as("sig"),
        graft.ops.MinHashSigExpr.minhashBands(
          graft.ops.TextHashExprs.shingleHashes(col("text"), 3), 16, 4).as("bk"))
      .orderBy("id").collect()
    val apiLb = spark.range(1).select(graft.ops.Similarity.lshBucket(
      expr("array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT))"), 2, 2)).head().getLong(0)
    sqlRows.zip(apiRows).foreach { case (sq, ap) =>
      assert(sq.getLong(1) == ap.getLong(1), "simhash64 mismatch")
      assert(sq.getSeq[Long](2) == ap.getSeq[Long](2), "minhash_bands mismatch")
    }
    assert(math.abs(sqlRows(0).getDouble(3) - 1.0) < 1e-12)
    assert(sqlRows(0).getLong(4) == apiLb)
  }

  test("tokenize_md5 and md5_mod are SQL-callable and agree with the Scala API") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val sqlRow = spark.sql(
      "SELECT tokenize_md5('Hello World', 32000) AS toks, md5_mod('42', 8) AS sh").head()
    val apiRow = spark.range(1).select(
        graft.ops.TextHashExprs.tokenizeMd5(lit("Hello World"), 32000).as("toks"),
        graft.ops.TextHashExprs.md5Mod(lit("42"), 8).as("sh")).head()
    assert(sqlRow.getSeq[Int](0) == apiRow.getSeq[Int](0), "tokenize_md5 mismatch")
    assert(sqlRow.getInt(1) == apiRow.getInt(1), "md5_mod mismatch")
    assert(sqlRow.getSeq[Int](0).forall(t => t >= 0 && t < 32000))
  }

  test("pq_codes / redact_pii / pii_count are SQL-callable and agree with the Scala API") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val sqlRow = spark.sql(
      """SELECT pq_codes(array(0.1F, -0.2F, 0.3F, 0.4F, -0.5F, 0.6F, 0.7F, -0.8F), 8, 2, 4) AS codes,
        |       redact_pii('mail a@b.co or 555-123-4567') AS clean,
        |       pii_count('mail a@b.co or 555-123-4567') AS n""".stripMargin).head()
    val apiRow = spark.range(1).select(
      graft.ops.PqExprs.pqCodes(
        array(Seq(0.1f, -0.2f, 0.3f, 0.4f, -0.5f, 0.6f, 0.7f, -0.8f).map(lit(_)): _*), 8, 2, 4).as("codes"),
      graft.ops.TextOps.redactPii(lit("mail a@b.co or 555-123-4567")).as("clean"),
      graft.ops.TextOps.piiCount(lit("mail a@b.co or 555-123-4567")).as("n")).head()
    assert(sqlRow.getSeq[Int](0) == apiRow.getSeq[Int](0), "pq_codes mismatch")
    assert(sqlRow.getString(1) == "mail <EMAIL> or <PHONE>" && sqlRow.getString(1) == apiRow.getString(1))
    assert(sqlRow.getInt(2) == 2 && apiRow.getInt(2) == 2)
  }

  test("text-analysis ops are SQL-callable: lang_id, counts, fingerprint, segment dedup") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT lang_id('the cat is on the mat and it is warm') AS lang,
        |       token_count('one two  three') AS tc,
        |       bpe_token_count('ab12, cd') AS bc,
        |       doc_fingerprint('ab cde') AS fp,
        |       dedup_segments('a b. c d. a b', '\\. ', '. ') AS ds,
        |       segment_dup_ratio('a b. c d. a b', '\\. ') AS sr""".stripMargin).head()
    assert(r.getString(0) == "en")
    assert(r.getInt(1) == 3)
    assert(r.getInt(2) == 4) // "ab", "12", ",", "cd"
    assert(r.getLong(3) == (1L * 2 + 2L * 3)) // 1*len("ab") + 2*len("cde")
    assert(r.getString(4) == "a b. c d")
    assert(math.abs(r.getDouble(5) - 1.0 / 3) < 1e-12)
    val u = spark.sql(
      "SELECT url_count('x http://a.io y') AS n, url_char_ratio('x http://a.io y') AS r").head()
    assert(u.getInt(0) == 1 && math.abs(u.getDouble(1) - 11.0 / 15) < 1e-12)
  }

  test("kernel shape arguments must be constants") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_hashes('a b c', CAST(id AS INT)) FROM range(1)").collect()
    }
    assert(e.getMessage.contains("must be a constant"))
  }

  test("kafka_murmur2 and token_gen are SQL-callable and codegen-compatible") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT kafka_murmur2(cast('key' AS BINARY)) AS h,
        |       token_gen(7L, 3L, 4) AS toks""".stripMargin).head()
    assert(r.getInt(0) == graft.hashing.KafkaMurmur2.hash("key".getBytes("UTF-8")))
    assert(r.getSeq[Int](1) == graft.stream.TokenGenExpr.makeSeq(7L, 3L, 4))
  }

  test("last_write_wins and patch_fold are SQL-callable aggregates") {
    GraftExtensions.register(spark)
    spark.sql(
      """SELECT * FROM VALUES
        |  ('k1', 'c', 1L, 'a1', 1),
        |  ('k1', 'u', 2L, NULL, 22),
        |  ('k1', 'u', 3L, 'a3', NULL),
        |  ('k2', 'c', 1L, 'b1', 5),
        |  ('k2', 'd', 9L, NULL, NULL)
        |AS t(doc_id, op, lsn, a, b)""".stripMargin)
      .createOrReplaceTempView("pf_ext")
    val lww = spark.sql(
      """SELECT doc_id, last_write_wins(struct(lsn, op, a)).op AS op
        |FROM pf_ext GROUP BY doc_id ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(lww == Seq(("k1", "u"), ("k2", "d")))
    val pf = spark.sql(
      """SELECT doc_id, w.op AS op, w.after.a AS a, w.after.b AS b FROM (
        |  SELECT doc_id,
        |         patch_fold(struct(lsn, op, struct(a, b) AS after,
        |                           CAST(NULL AS BIGINT) AS reset)) AS w
        |  FROM pf_ext GROUP BY doc_id) ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), if (r.isNullAt(3)) None else Some(r.getInt(3)))).toSeq
    // k1: last non-null per column (a from lsn 3, b from lsn 2); k2: deleted
    assert(pf == Seq(("k1", "u", Some("a3"), Some(22)), ("k2", "d", None, None)))
  }
}
