package graft.smt

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Port of the reference's OutboxTest behavioral contract
  * (`smt/OutboxTest.java`) to the OutboxRoute stage. */
class OutboxRouteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val srcTopic = "a-database-name.public.the_database_table"

  private def mkDf(valueSchema: StructType, values: Seq[Row], topic: String = srcTopic) = {
    val schema = StructType(Seq(
      StructField("topic", StringType),
      StructField("key", StringType),
      StructField("value", valueSchema),
      StructField("ts_ms", LongType)))
    val rows = values.map(v => Row(topic, "1234", v, 1700000000000L))
    spark.createDataFrame(rows.asJava, schema)
  }

  private val pnSchema = StructType(Seq(
    StructField("key", StringType),
    StructField("partition_number", IntegerType),
    StructField("payload", StringType)))
  private val pkSchema = StructType(Seq(
    StructField("key", StringType),
    StructField("partition_key", StringType),
    StructField("payload", StringType)))
  private val pkTopicSchema = StructType(pkSchema.fields :+ StructField("topic", StringType))

  // OutboxTest.java:78-102
  test("routes to explicit partition_number and extracts payload") {
    val df = mkDf(pnSchema, Seq(Row("1234", 1, """["foo", "bar"]""")))
    val out = OutboxRoute(OutboxConfig(topic = Some("caregivers.matches.v1")))(df).collect()(0)
    assert(out.getAs[String]("topic") == "caregivers.matches.v1")
    assert(out.getAs[Int]("partition") == 1)
    assert(out.getAs[String]("payload") == """["foo", "bar"]""")
    assert(!out.getAs[Boolean]("tombstone"))
  }

  // OutboxTest.java:104-124 — signal passthrough predicate
  test("dbz_signal rows are passthrough") {
    val df = mkDf(pnSchema, Seq(Row("k", 0, "x")), topic = "public.dbz_signal")
    assert(df.filter(OutboxRoute.isPassthrough()).count() == 1)
    val normal = mkDf(pnSchema, Seq(Row("k", 0, "x")))
    assert(normal.filter(OutboxRoute.isPassthrough()).count() == 0)
  }

  // OutboxTest.java:104-124 — heartbeat passthrough matches the VALUE SCHEMA
  // NAME io.debezium.connector.common.Heartbeat (`Outbox.java:84-88`), not a
  // configured topic set; the name rides in a schema-name column.
  test("heartbeat rows pass through by value schema name") {
    val schema = StructType(Seq(
      StructField("topic", StringType),
      StructField("value_schema_name", StringType),
      StructField("key", StringType)))
    val rows = Seq(
      Row("any.topic", OutboxRoute.HeartbeatSchemaName, "hb"),
      Row("any.topic", "some.other.Schema", "normal"),
      Row("x.dbz_signal", null, "sig"))
    val df = spark.createDataFrame(rows.asJava, schema)
    val pass = df.filter(OutboxRoute.isPassthrough(df)).select("key").collect().map(_.getString(0)).toSet
    assert(pass == Set("hb", "sig"))
  }

  // Outbox.java:107-109 — a non-string topic field is a data error
  test("non-string topic field in the value throws") {
    val badSchema = StructType(Seq(
      StructField("payload", StringType),
      StructField("topic", IntegerType)))
    val df = mkDf(badSchema, Seq(Row("p", 42)))
    val e = intercept[IllegalArgumentException] {
      OutboxRoute(OutboxConfig(topic = Some("t")))(df)
    }
    assert(e.getMessage.contains("must be a string"))
  }

  // OutboxTest.java:126-151 — struct headers promoted
  test("struct headers are promoted to string headers") {
    val hSchema = StructType(Seq(StructField("agency_id", StringType)))
    val schema = StructType(pnSchema.fields :+ StructField("headers", hSchema))
    val df = mkDf(schema, Seq(Row("1234", 1, """["foo", "bar"]""", Row("1234"))))
    val out = OutboxRoute(OutboxConfig(topic = Some("t")))(df).collect()(0)
    assert(out.getAs[Map[String, String]]("headers") == Map("agency_id" -> "1234"))
  }

  // OutboxTest.java:152-176 — JSON string headers
  test("JSON string headers are parsed") {
    val schema = StructType(pnSchema.fields :+ StructField("headers", StringType))
    val df = mkDf(schema, Seq(Row("1234", 1, "p", """{"agency_id": "1234"}""")))
    val out = OutboxRoute(OutboxConfig(topic = Some("t")))(df).collect()(0)
    assert(out.getAs[Map[String, String]]("headers") == Map("agency_id" -> "1234"))
  }

  // OutboxTest.java:178-199 — numeric header stringified, null kept
  test("numeric header values stringified and nulls kept") {
    val schema = StructType(pnSchema.fields :+ StructField("headers", StringType))
    val df = mkDf(schema, Seq(Row("1234", 1, "p", """{"event_number": 1234, "agency_id": null}""")))
    val out = OutboxRoute(OutboxConfig(topic = Some("t")))(df).collect()(0)
    val h = out.getAs[Map[String, String]]("headers")
    assert(h("event_number") == "1234")
    assert(h.contains("agency_id") && h("agency_id") == null)
  }

  // OutboxTest.java:201-221 — null headers field
  test("null headers field yields empty headers") {
    val schema = StructType(pnSchema.fields :+ StructField("headers", StringType))
    val df = mkDf(schema, Seq(Row("1234", 1, """["foo", "bar"]""", null)))
    val out = OutboxRoute(OutboxConfig(topic = Some("caregivers.matches.v1")))(df).collect()(0)
    assert(out.getAs[String]("topic") == "caregivers.matches.v1")
    assert(out.getAs[Map[String, String]]("headers").isEmpty)
  }

  // OutboxTest.java:223-269 — murmur2 partition pinning + partition_key echo
  test("partition-key mode: kafka murmur2 placement and header echo") {
    val df = mkDf(pkSchema, Seq(
      Row("1", "some-partition-key", "p1"),
      Row("2", "another-partition-key", "p2")))
    val out = OutboxRoute(OutboxConfig(topic = Some("t"), partitionByKey = true, numPartitions = Some(3)))(df)
      .orderBy("key").collect()
    assert(out(0).getAs[Int]("partition") == 1)
    assert(out(1).getAs[Int]("partition") == 2)
    assert(out(0).getAs[Map[String, String]]("headers")("partition_key") == "some-partition-key")
  }

  // OutboxTest.java:271-326 — missing partition info throws
  test("missing partition_number throws") {
    val df = mkDf(pkSchema, Seq(Row("1", "k", "p"))) // no partition_number field
    intercept[Exception] {
      OutboxRoute(OutboxConfig(topic = Some("t")))(df).collect()
    }
  }

  test("missing num-partitions in key mode throws") {
    val df = mkDf(pkSchema, Seq(Row("1", "k", "p")))
    intercept[Exception] {
      OutboxRoute(OutboxConfig(topic = Some("t"), partitionByKey = true))(df).collect()
    }
  }

  // OutboxTest.java:328-341 — null value dropped
  test("debezium tombstones (null value) are dropped") {
    val df = mkDf(pnSchema, Seq(Row("1", 1, "p"), null).map {
      case null => null
      case r => r
    })
    val df2 = mkDf(pnSchema, Seq(Row("1", 1, "p")))
      .union(mkDf(pnSchema, Seq(Row("x", 1, "p"))).withColumn("value", lit(null).cast(pnSchema)))
    assert(OutboxRoute(OutboxConfig(topic = Some("t")))(df2).count() == 1)
  }

  // OutboxTest.java:343-372 — __deleted => tombstone with key/partition kept
  test("__deleted true becomes a tombstone with partition preserved") {
    val delSchema = StructType(Seq(
      StructField("key", StringType),
      StructField("partition_number", IntegerType),
      StructField("__deleted", StringType),
      StructField("payload", StringType)))
    val df = mkDf(delSchema, Seq(Row("1234", 2, "true", """{"x":1}""")))
    val out = OutboxRoute(OutboxConfig(topic = Some("t")))(df).collect()(0)
    assert(out.getAs[Boolean]("tombstone"))
    assert(out.isNullAt(out.fieldIndex("payload")))
    assert(out.getAs[Int]("partition") == 2)
    assert(out.getAs[String]("key") == "1234")
  }

  // OutboxTest.java:434-465 — null payload => tombstone
  test("null payload becomes a tombstone") {
    val df = mkDf(pnSchema, Seq(Row("1234", 1, null)))
    val out = OutboxRoute(OutboxConfig(topic = Some("t")))(df).collect()(0)
    assert(out.getAs[Boolean]("tombstone"))
  }

  // OutboxTest.java:374-403 — per-record topic override
  test("topic field in the table overrides config") {
    val df = mkDf(pkTopicSchema, Seq(Row("1234", "1234-5678", "p", "my.topic.v1")))
    val out = OutboxRoute(OutboxConfig(partitionByKey = true, numPartitions = Some(3)))(df).collect()(0)
    assert(out.getAs[String]("topic") == "my.topic.v1")
  }

  // OutboxTest.java:405-432 — topic@N syntax carries partition count
  test("topic@N syntax resolves partitions without num-partitions config") {
    val df = mkDf(pkTopicSchema, Seq(Row("1234", "1234-5678", "p", "my.topic.v1@3")))
    val out = OutboxRoute(OutboxConfig(partitionByKey = true))(df).collect()(0)
    assert(out.getAs[String]("topic") == "my.topic.v1")
    assert(out.getAs[Int]("partition") == 2) // pinned by OutboxTest.java:431
  }

  // OutboxTest.java:467-531 — topic prefix
  test("topic prefix applies to config and per-record topics") {
    val df1 = mkDf(pnSchema, Seq(Row("1234", 1, "p")))
    val out1 = OutboxRoute(OutboxConfig(topic = Some("caregivers.matches.v1"),
      topicPrefix = Some("integration")))(df1).collect()(0)
    assert(out1.getAs[String]("topic") == "integration.caregivers.matches.v1")

    val df2 = mkDf(pkTopicSchema, Seq(Row("1234", "1234-5678", "p", "my.topic.v1@3")))
    val out2 = OutboxRoute(OutboxConfig(partitionByKey = true, topicPrefix = Some("integration")))(df2).collect()(0)
    assert(out2.getAs[String]("topic") == "integration.my.topic.v1")
    assert(out2.getAs[Int]("partition") == 2)
  }

  test("no topic anywhere throws") {
    val df = mkDf(pnSchema, Seq(Row("1234", 1, "p")))
    intercept[Exception] { OutboxRoute(OutboxConfig())(df).collect() }
  }
}
