package graft.sources

import graft.SparkTestBase
import graft.table.IceLite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** V2 TableCatalog surface: standard Spark SQL (`graft_test.ns.t`) resolves
  * IceLite tables — CREATE/INSERT/SELECT/time travel/DELETE/ALTER/SHOW/DROP
  * through Spark's own parser and analyzer, no scoped grammar involved. */
class IceLiteCatalogSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.graft_test", classOf[IceLiteCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_test.warehouse", warehouse)
    s
  }
  private lazy val warehouse = SparkTestBase.tempDir("catalog-wh")

  private def sql(q: String) = spark.sql(q)

  test("CREATE TABLE / INSERT INTO / SELECT / DESCRIBE / SHOW TABLES") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft_test.ns1")
    sql("""CREATE TABLE graft_test.ns1.docs (
          |  doc_id STRING, tokens ARRAY<INT>, n_tok INT, source STRING)
          |TBLPROPERTIES ('key'='doc_id', 'buckets'='4', 'write.mode'='mor')""".stripMargin)
    // the created table is a real IceLite table at <warehouse>/ns1/docs
    val t = IceLite.load(spark, s"$warehouse/ns1/docs")
    assert(t.snapshot.keyColumn == "doc_id" && t.snapshot.numBuckets == 4)
    assert(t.snapshot.writeMode == "mor")
    // INSERT routes through the connector's upsert write path
    sql("INSERT INTO graft_test.ns1.docs VALUES ('a', array(1,2), 2, 'web')")
    sql("INSERT INTO graft_test.ns1.docs VALUES ('b', array(3), 1, 'book'), ('a', array(9), 1, 'web2')")
    val rows = sql("SELECT doc_id, n_tok, source FROM graft_test.ns1.docs ORDER BY doc_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq
    // second insert upserts 'a' by LWW (later insert wins)
    assert(rows == Seq(("a", 1, "web2"), ("b", 1, "book")))
    assert(sql("SHOW TABLES IN graft_test.ns1").collect().map(_.getString(1)).toSeq == Seq("docs"))
    val desc = sql("DESCRIBE TABLE graft_test.ns1.docs").collect().map(_.getString(0))
    assert(desc.contains("doc_id") && desc.contains("tokens"))
  }

  test("VERSION AS OF: numeric version and tag; DELETE FROM via merge path") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft_test.ns2")
    sql("""CREATE TABLE graft_test.ns2.t (doc_id STRING, n_tok INT)
          |TBLPROPERTIES ('key'='doc_id')""".stripMargin)
    sql("INSERT INTO graft_test.ns2.t VALUES ('a', 1), ('b', 2), ('c', 30)")
    val t = IceLite.load(spark, s"$warehouse/ns2/t")
    val v1 = t.snapshot.version
    t.tagSnapshot("first")
    sql("INSERT INTO graft_test.ns2.t VALUES ('d', 40)")
    assert(sql("SELECT count(*) FROM graft_test.ns2.t").head().getLong(0) == 4)
    assert(sql(s"SELECT count(*) FROM graft_test.ns2.t VERSION AS OF $v1").head().getLong(0) == 3)
    assert(sql("SELECT count(*) FROM graft_test.ns2.t VERSION AS OF 'first'").head().getLong(0) == 3)
    // DELETE flows through deleteWhere (merge-path correction)
    sql("DELETE FROM graft_test.ns2.t WHERE n_tok >= 30")
    assert(sql("SELECT doc_id FROM graft_test.ns2.t ORDER BY doc_id")
      .collect().map(_.getString(0)).toSeq == Seq("a", "b"))
    // time travel still sees the pre-delete state
    assert(sql(s"SELECT count(*) FROM graft_test.ns2.t VERSION AS OF $v1").head().getLong(0) == 3)
  }

  test("ALTER TABLE: rename/add/drop column and properties, metadata-only") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft_test.ns3")
    sql("""CREATE TABLE graft_test.ns3.t (doc_id STRING, n_tok INT, source STRING)
          |TBLPROPERTIES ('key'='doc_id')""".stripMargin)
    sql("INSERT INTO graft_test.ns3.t VALUES ('a', 1, 'web')")
    val filesBefore = IceLite.load(spark, s"$warehouse/ns3/t").snapshot.files.map(_.path).toSet
    sql("ALTER TABLE graft_test.ns3.t RENAME COLUMN source TO origin")
    sql("ALTER TABLE graft_test.ns3.t ADD COLUMN score DOUBLE")
    sql("ALTER TABLE graft_test.ns3.t SET TBLPROPERTIES ('write.stats.columns'='n_tok')")
    val snap = IceLite.load(spark, s"$warehouse/ns3/t").snapshot
    assert(snap.schema.fieldNames.toSeq == Seq("doc_id", "n_tok", "origin", "score"))
    assert(snap.properties("write.stats.columns") == "n_tok")
    assert(snap.files.map(_.path).toSet == filesBefore, "evolution must be metadata-only")
    // the renamed + added columns read correctly (null-filled score)
    val r = sql("SELECT origin, score FROM graft_test.ns3.t").head()
    assert(r.getString(0) == "web" && r.isNullAt(1))
    sql("ALTER TABLE graft_test.ns3.t DROP COLUMN origin")
    assert(sql("SELECT * FROM graft_test.ns3.t").schema.fieldNames.toSeq ==
      Seq("doc_id", "n_tok", "score"))
  }

  test("DROP TABLE, table-not-found, and namespace listing") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft_test.ns4")
    sql("CREATE TABLE graft_test.ns4.gone (doc_id STRING) TBLPROPERTIES ('key'='doc_id')")
    assert(sql("SHOW TABLES IN graft_test.ns4").count() == 1)
    sql("DROP TABLE graft_test.ns4.gone")
    assert(sql("SHOW TABLES IN graft_test.ns4").count() == 0)
    intercept[Exception] { sql("SELECT * FROM graft_test.ns4.gone").collect() }
    val nss = sql("SHOW NAMESPACES IN graft_test").collect().map(_.getString(0)).toSet
    assert(nss.contains("ns4"), nss.toString)
    // CREATE without the key property fails with the engine's message
    val e = intercept[Exception] {
      sql("CREATE TABLE graft_test.ns4.nokey (doc_id STRING)")
    }
    assert(e.getMessage.contains("key"), e.getMessage)
  }

  test("CREATE TABLE rejects a non-STRING key column at analysis time") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft_test.ns5")
    val e = intercept[Exception] {
      sql("CREATE TABLE graft_test.ns5.intkey (id INT, v STRING) TBLPROPERTIES ('key'='id')")
    }
    assert(e.getMessage.contains("must be STRING"), e.getMessage)
    assert(!IceLite.exists(s"$warehouse/ns5/intkey"))
  }

  test("an all-digit tag resolves as a tag, not a version number") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft_test.ns6")
    sql("""CREATE TABLE graft_test.ns6.t (doc_id STRING, n_tok INT)
          |TBLPROPERTIES ('key'='doc_id', 'buckets'='2')""".stripMargin)
    sql("INSERT INTO graft_test.ns6.t VALUES ('a', 1)")
    val t = IceLite.load(spark, s"$warehouse/ns6/t")
    val tagged = t.snapshot.version
    t.tagSnapshot("123") // a tag that LOOKS like a version number
    sql("INSERT INTO graft_test.ns6.t VALUES ('b', 2)")
    // the tag must win over numeric-version interpretation
    val viaTag = sql("SELECT count(*) FROM graft_test.ns6.t VERSION AS OF '123'").head().getLong(0)
    assert(viaTag == 1, s"tag '123' must read the tagged snapshot (v$tagged), got $viaTag rows")
    // empty version string: targeted error, not NumberFormatException
    val e = intercept[Exception] {
      sql("SELECT * FROM graft_test.ns6.t VERSION AS OF ''").collect()
    }
    assert(e.getMessage.contains("no version or tag"), e.getMessage)
  }

  test("non-cascade DROP NAMESPACE refuses child namespaces") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft_test.ns7")
    sql("CREATE NAMESPACE IF NOT EXISTS graft_test.ns7.child")
    sql("""CREATE TABLE graft_test.ns7.child.t (doc_id STRING)
          |TBLPROPERTIES ('key'='doc_id')""".stripMargin)
    val e = intercept[Exception] { sql("DROP NAMESPACE graft_test.ns7") }
    assert(e.getMessage.contains("not empty"), e.getMessage)
    assert(IceLite.exists(s"$warehouse/ns7/child/t"), "child table must survive")
    sql("DROP NAMESPACE graft_test.ns7 CASCADE")
    assert(!IceLite.exists(s"$warehouse/ns7/child/t"))
  }

  test("a key-less batch with NON-positional names fails fast instead of mapping by position") {
    import spark.implicits._
    sql("CREATE NAMESPACE IF NOT EXISTS graft_test.ns8")
    sql("""CREATE TABLE graft_test.ns8.t (doc_id STRING, n_tok INT)
          |TBLPROPERTIES ('key'='doc_id', 'buckets'='2')""".stripMargin)
    // same arity, real-but-wrong names: must NOT silently write by position
    val e = intercept[Exception] {
      Seq(("x", 1)).toDF("wrong_name", "other")
        .write.format("icelite").option("epoch", "m1").mode("append")
        .save(s"$warehouse/ns8/t")
    }
    assert(e.getMessage.contains("key column"), e.getMessage)
    // positional aliases (col1..colN) still map by position
    Seq(("y", 2)).toDF("col1", "col2")
      .write.format("icelite").option("epoch", "m2").mode("append")
      .save(s"$warehouse/ns8/t")
    assert(sql("SELECT doc_id, n_tok FROM graft_test.ns8.t").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq == Seq(("y", 2)))
  }
}
