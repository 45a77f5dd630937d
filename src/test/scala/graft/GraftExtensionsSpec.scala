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

  test("kafka_murmur2 and token_gen are SQL-callable and codegen-compatible") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT kafka_murmur2(cast('key' AS BINARY)) AS h,
        |       token_gen(7L, 3L, 4) AS toks""".stripMargin).head()
    assert(r.getInt(0) == graft.hashing.KafkaMurmur2.hash("key".getBytes("UTF-8")))
    assert(r.getSeq[Int](1) == graft.stream.TokenGenExpr.makeSeq(7L, 3L, 4))
  }
}
