package graft.sources

import graft.SparkTestBase
import graft.table.IceLite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 write surface: `df.write.format("icelite")` appends route
  * through the merge engine (upserts, deletes via the change shape,
  * create-on-first-append, epoch idempotence). */
class IceLiteWriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val payloadType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("tokens", ArrayType(IntegerType)),
    StructField("n_tok", IntegerType),
    StructField("source", StringType)))

  private def rows(n: Int, src: String): DataFrame =
    spark.range(0, n).select(
      concat(lit("doc"), col("id")).as("doc_id"),
      sequence(lit(1), (col("id") % 5 + 1).cast("int")).as("tokens"),
      (col("id") % 5 + 1).cast("int").as("n_tok"),
      lit(src).as("source"))

  test("streaming sink without a visible checkpoint fails fast instead of recycling epochs") {
    // checkpoint set only via conf (or defaulted) is invisible to the V1
    // sink provider; a constant fallback prefix would make a later query's
    // restarted batchIds silently no-op against this run's committed epochs
    val e = intercept[IllegalArgumentException] {
      new IceLiteDataSource().createSink(
        spark.sqlContext, Map("path" -> SparkTestBase.tempDir("sink-nockpt")), Nil,
        org.apache.spark.sql.streaming.OutputMode.Append())
    }
    assert(e.getMessage.contains("checkpointLocation"), e.getMessage)
  }

  test("create-on-first-append, then append upserts by LWW") {
    val root = SparkTestBase.tempDir("w-create")
    rows(40, "a").write.format("icelite")
      .option("key", "doc_id").option("buckets", "4").option("write.mode", "mor")
      .mode("append").save(root)
    val t = IceLite.load(spark, root)
    assert(t.snapshot.writeMode == "mor" && t.snapshot.numBuckets == 4)
    assert(t.read().count() == 40)
    // second append overwrites the first 10 keys (same key, higher default lsn)
    rows(10, "b").write.format("icelite").mode("append").save(root)
    val st = t.read().groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st == Map("a" -> 30L, "b" -> 10L))
  }

  test("append equals table state read back through the format (round trip)") {
    val root = SparkTestBase.tempDir("w-round")
    rows(25, "x").write.format("icelite").option("key", "doc_id").mode("append").save(root)
    val back = spark.read.format("icelite").load(root)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val in = rows(25, "x").orderBy("doc_id").collect().map(_.toString).toSeq
    assert(back == in)
  }

  test("change-stream shape passes through: deletes and explicit lsn ordering") {
    val root = SparkTestBase.tempDir("w-change")
    rows(20, "s").write.format("icelite").option("key", "doc_id").mode("append").save(root)
    val ch = Seq(("doc3", "d", 100L), ("doc7", "d", 101L)).toDF("doc_id", "op", "lsn")
      .withColumn("after", lit(null).cast(payloadType))
    ch.write.format("icelite").mode("append").save(root)
    assert(IceLite.load(spark, root).read().count() == 18)
    // a LOWER-lsn late change loses to the delete
    val late = Seq(("doc3", "u", 50L)).toDF("doc_id", "op", "lsn")
      .withColumn("after", struct(lit("doc3").as("doc_id"),
        lit(Array(1)).as("tokens"), lit(1).as("n_tok"), lit("late").as("source")))
    late.write.format("icelite").mode("append").save(root)
    assert(IceLite.load(spark, root).read().filter($"doc_id" === "doc3").isEmpty)
  }

  test("epoch option makes a retried append exactly-once") {
    val root = SparkTestBase.tempDir("w-epoch")
    rows(15, "e").write.format("icelite").option("key", "doc_id")
      .option("epoch", "batch-1").mode("append").save(root)
    val v1 = IceLite.load(spark, root).snapshot.version
    rows(15, "e").write.format("icelite")
      .option("epoch", "batch-1").mode("append").save(root) // retry: no-op
    val t = IceLite.load(spark, root)
    assert(t.snapshot.version == v1, "retried epoch must not commit a new version")
    assert(t.read().count() == 15)
  }

  test("streaming sink: zero-code CDC relay, exactly-once across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    // source table -> readStream change feed -> writeStream icelite sink:
    // standard-API replication with no custom foreachBatch code.
    val srcRoot = SparkTestBase.tempDir("w-sink-src")
    val repRoot = SparkTestBase.tempDir("w-sink-rep")
    val ckpt = SparkTestBase.tempDir("w-sink-ck")
    rows(40, "a").write.format("icelite").option("key", "doc_id")
      .option("write.mode", "mor").mode("append").save(srcRoot)

    def relay(): Unit = {
      val q = spark.readStream.format("icelite")
        .option("changeFeed", "true").option("path", srcRoot).load()
        .select(col("doc_id"),
          when(col("change_op") === "delete", "d").otherwise("u").as("op"),
          coalesce(col("lsn"), lit(Long.MaxValue)).as("lsn"),
          when(col("change_op") =!= "delete",
            struct(col("doc_id"), col("tokens"), col("n_tok"), col("source"))).as("after"))
        .writeStream.format("icelite")
        .option("path", repRoot).option("key", "doc_id").option("write.mode", "mor")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    relay()
    assert(IceLite.load(spark, repRoot).read().count() == 40)
    // more source changes; resumed relay applies ONLY the new ranges
    rows(10, "b").write.format("icelite").mode("append").save(srcRoot)
    Seq("doc33").toDF("doc_id").select(col("doc_id"), lit("d").as("op"),
      lit(99999L).as("lsn"), lit(null).cast(payloadType).as("after"))
      .write.format("icelite").mode("append").save(srcRoot)
    relay()
    val src = IceLite.load(spark, srcRoot).read()
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val rep = IceLite.load(spark, repRoot).read()
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(src == rep, "replica must converge to the source state")
    val vAfter = IceLite.load(spark, repRoot).snapshot.version
    relay() // nothing new: no version bump on the replica
    assert(IceLite.load(spark, repRoot).snapshot.version == vAfter)

    // A FRESH checkpoint restarts batchIds at 0 — the epoch prefix derives
    // from the checkpoint location, so the new run's batches must still
    // apply instead of no-oping against the old run's committed epochs.
    rows(5, "c").write.format("icelite").option("lsn", "200000")
      .mode("append").save(srcRoot)
    val ckpt2 = SparkTestBase.tempDir("w-sink-ck2")
    val q2 = spark.readStream.format("icelite")
      .option("changeFeed", "true").option("path", srcRoot).load()
      .select(col("doc_id"),
        when(col("change_op") === "delete", "d").otherwise("u").as("op"),
        coalesce(col("lsn"), lit(Long.MaxValue)).as("lsn"),
        when(col("change_op") =!= "delete",
          struct(col("doc_id"), col("tokens"), col("n_tok"), col("source"))).as("after"))
      .writeStream.format("icelite").option("path", repRoot)
      .option("checkpointLocation", ckpt2)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(IceLite.load(spark, repRoot).read()
      .filter($"source" === "c").count() == 5,
      "a fresh-checkpoint relay must apply, not no-op on recycled batchIds")
  }

  test("overwrite mode and missing key column give clear errors") {
    val root = SparkTestBase.tempDir("w-err")
    rows(5, "z").write.format("icelite").option("key", "doc_id").mode("append").save(root)
    val e1 = intercept[Exception] {
      rows(5, "z").write.format("icelite").mode("overwrite").save(root)
    }
    assert(e1.getMessage != null)
    val e2 = intercept[Exception] {
      spark.range(3).select(col("id").as("other")).write
        .format("icelite").mode("append").save(root)
    }
    assert(e2.getMessage.contains("doc_id") || e2.getCause != null)
  }
}
