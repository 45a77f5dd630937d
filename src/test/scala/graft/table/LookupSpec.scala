package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Point-lookup path: manifest pruning (bucket + key range), MOR/patch
  * winner resolution over candidates only, and parquet bloom filters on the
  * key column when `write.parquet.bloom = true`. */
class LookupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val payloadType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("v", LongType)))

  private def changes(n: Int, lsnBase: Long): DataFrame =
    spark.range(0, n).select(
      concat(lit("doc"), col("id")).as("doc_id"),
      lit("u").as("op"),
      (col("id") + lsnBase).as("lsn"),
      struct(concat(lit("doc"), col("id")).as("doc_id"),
        (col("id") * 10 + lsnBase).as("v")).as("after"))

  private def mkTable(mode: String, props: Map[String, String] = Map.empty) =
    IceLite.create(spark, SparkTestBase.tempDir("lookup"), payloadType, "doc_id",
      numBuckets = 8, properties = props + ("write.mode" -> mode))

  test("lookup equals full-scan filter and prunes to the keys' buckets") {
    val t = mkTable("cow")
    t.merge(changes(500, 0), "e1")
    val keys = Seq("doc7", "doc123", "doc456", "missing")
    val got = t.lookup(keys).select("doc_id", "v").as[(String, Long)]
      .collect().sortBy(_._1).toSeq
    val want = t.read().filter(col("doc_id").isin(keys: _*))
      .select("doc_id", "v").as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(got == want && got.size == 3)
    val s = t.snapshot
    val cand = t.lookupFiles(s, keys)
    val wantBuckets = keys.map(graft.hashing.KafkaMurmur2.bucketLabelOf(_, s.numBuckets)).toSet
    assert(cand.nonEmpty && cand.size < s.files.size,
      s"lookup must prune files: ${cand.size} of ${s.files.size}")
    assert(cand.map(_.bucket).toSet.subsetOf(wantBuckets))
  }

  test("lookup resolves MOR winners and honors tombstones") {
    val t = mkTable("mor")
    t.merge(changes(100, 0), "e1")
    t.merge(changes(100, 1000), "e2") // newer versions of every key
    // delete doc5
    val del = Seq(("doc5", "d", 5000L)).toDF("doc_id", "op", "lsn")
      .select(col("doc_id"), col("op"), col("lsn"), lit(null).cast(payloadType).as("after"))
    t.merge(del, "e3")
    val got = t.lookup(Seq("doc5", "doc42")).select("doc_id", "v")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("doc42", 1420L))) // winner from e2; doc5 tombstoned
  }

  test("lookup folds patch tables") {
    val t = mkTable("mor", Map("write.merge.fold" -> "patch"))
    t.merge(changes(50, 0), "e1")
    val partialNull = spark.range(10, 20).select(
      concat(lit("doc"), col("id")).as("doc_id"), lit("u").as("op"),
      (col("id") + 100).as("lsn"),
      struct(concat(lit("doc"), col("id")).as("doc_id"),
        lit(null).cast(LongType).as("v")).as("after"))
    t.merge(partialNull, "e2") // null v = unchanged under patch
    val got = t.lookup(Seq("doc15")).select("doc_id", "v").as[(String, Long)].collect().toSeq
    assert(got == Seq(("doc15", 150L))) // v survived the partial update
  }

  test("write.parquet.bloom stamps a bloom filter on the key column") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    def bloomOffsets(t: IceLiteTable): Seq[Long] = {
      val conf = spark.sparkContext.hadoopConfiguration
      t.snapshot.files.map { f =>
        val p = new org.apache.hadoop.fs.Path(s"${t.root}/${f.path}")
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
        try r.getFooter.getBlocks.get(0).getColumns.asScala
          .find(_.getPath.toDotString == "doc_id").get.getBloomFilterOffset
        finally r.close()
      }
    }
    val withBloom = mkTable("cow", Map("write.parquet.bloom" -> "true"))
    withBloom.merge(changes(200, 0), "e1")
    assert(bloomOffsets(withBloom).forall(_ > 0), "expected bloom filters present")
    val without = mkTable("cow")
    without.merge(changes(200, 0), "e1")
    assert(bloomOffsets(without).forall(_ < 0), "expected no bloom filters")
    // lookup still correct through the bloom-filtered files
    val got = withBloom.lookup(Seq("doc99")).select("v").as[Long].collect().toSeq
    assert(got == Seq(990L))
  }
}
