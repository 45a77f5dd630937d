package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Session extensions exposing the engine's custom Catalyst expressions to
 * SQL (`SparkSession.builder.withExtensions(new GraftExtensions)` or
 * `spark.sql.extensions=graft.GraftExtensions`):
 *
 *   kafka_murmur2(bin)            -> INT   Kafka default-partitioner hash
 *   kafka_partition(key, n)       -> INT   toPositive(murmur2(key)) % n
 *   token_gen(lsn, doc, n)        -> ARRAY<INT> deterministic token array
 *
 * These are the operators Spark's built-ins genuinely cannot express
 * (murmur2 placement is pinned by the reference's OutboxTest; token_gen is
 * the codegen'd generator kernel). Everything else in the engine is
 * DataFrame-level and already SQL-reachable through views.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(kafkaMurmur2Descriptor)
    ext.injectFunction(kafkaPartitionDescriptor)
    ext.injectFunction(tokenGenDescriptor)
    // SQL `MERGE INTO icelite.`<path>` USING (<query>) EPOCH '<key>'`
    ext.injectParser((_, delegate) => new graft.sql.GraftSqlParser(delegate))
  }
}

object GraftExtensions {
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  type Descriptor = (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder)

  val kafkaMurmur2Descriptor: Descriptor = (
    FunctionIdentifier("kafka_murmur2"),
    info("kafka_murmur2", "kafka_murmur2(bin) - Kafka default-partitioner murmur2 hash of binary input."),
    (children: Seq[Expression]) => graft.hashing.KafkaMurmur2Expr(children.head))

  val kafkaPartitionDescriptor: Descriptor = (
    FunctionIdentifier("kafka_partition"),
    info("kafka_partition", "kafka_partition(key, n) - Kafka partition placement: toPositive(murmur2(utf8(key))) % n."),
    (children: Seq[Expression]) => {
      import org.apache.spark.sql.catalyst.expressions._
      import org.apache.spark.sql.types.{BinaryType, IntegerType, StringType}
      val keyBytes = Cast(Cast(children(0), StringType), BinaryType)
      Cast(Pmod(BitwiseAnd(graft.hashing.KafkaMurmur2Expr(keyBytes),
        Literal(0x7fffffff)), children(1)), IntegerType)
    })

  val tokenGenDescriptor: Descriptor = (
    FunctionIdentifier("token_gen"),
    info("token_gen", "token_gen(lsn, doc, n) - deterministic token array (engine generator kernel)."),
    (children: Seq[Expression]) =>
      graft.stream.TokenGenExpr(children(0), children(1), children(2)))

  /** Register on an existing session (tests / REPL convenience). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Seq(kafkaMurmur2Descriptor, kafkaPartitionDescriptor, tokenGenDescriptor).foreach {
      case (id, _, builder) =>
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          id.funcName, builder, "scala_udf")
    }
  }
}
