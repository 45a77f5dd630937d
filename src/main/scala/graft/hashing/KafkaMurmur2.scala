package graft.hashing

import org.apache.spark.sql.graftbridge.Exprs
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/**
 * Kafka's default-partitioner murmur2 hash (32-bit MurmurHash2 with Kafka's
 * seed 0x9747b28c), as used by the reference's Outbox key-routing
 * (`smt/Outbox.java:225`: `Utils.toPositive(Utils.murmur2(key.getBytes())) % n`).
 *
 * Spark's built-in `hash()` is Murmur3 and `xxhash64` is xxHash — neither
 * reproduces Kafka partition placement (pinned by `OutboxTest.java:265-268`),
 * so this is a from-scratch implementation of the public MurmurHash2
 * algorithm with Kafka's parameters.
 */
object KafkaMurmur2 {

  /** 32-bit MurmurHash2, Kafka parameters. Public algorithm (Austin Appleby);
    * parameters m=0x5bd1e995, r=24, seed=0x9747b28c as fixed by Kafka. */
  def hash(data: Array[Byte]): Int = {
    val length = data.length
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    var h = seed ^ length
    val length4 = length / 4
    var i = 0
    while (i < length4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) + ((data(i4 + 1) & 0xff) << 8) +
        ((data(i4 + 2) & 0xff) << 16) + ((data(i4 + 3) & 0xff) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 1
    }
    // Handle the last few bytes of the input array
    val rem = length % 4
    val base = length & ~3
    if (rem >= 3) h ^= (data(base + 2) & 0xff) << 16
    if (rem >= 2) h ^= (data(base + 1) & 0xff) << 8
    if (rem >= 1) { h ^= data(base) & 0xff; h *= m }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }

  /** Kafka Utils.toPositive: mask sign bit. */
  def toPositive(h: Int): Int = h & 0x7fffffff

  /** Kafka default partition for a key: toPositive(murmur2(bytes)) % n. */
  def partition(keyBytes: Array[Byte], numPartitions: Int): Int =
    toPositive(hash(keyBytes)) % numPartitions

  def partition(key: String, numPartitions: Int): Int =
    partition(key.getBytes(java.nio.charset.StandardCharsets.UTF_8), numPartitions)

  /** Column form: murmur2 hash of a binary/string column (Int). */
  def murmur2(c: Column): Column =
    Exprs.column(KafkaMurmur2Expr(Exprs.expression(castToBinary(c))))

  /** Column form: Kafka partition of a key column for n partitions. */
  def kafkaPartition(c: Column, numPartitions: Int): Column = {
    import org.apache.spark.sql.functions._
    pmod(murmur2(c).bitwiseAND(lit(0x7fffffff)), lit(numPartitions)).cast(IntegerType)
  }

  /**
   * Shuffle-packed bucket label for a key: same placement as
   * [[kafkaPartition]], but each bucket id b is renamed to a label v chosen
   * so Spark's own hash partitioner (pmod(murmur3(v, 42), P)) assigns the n
   * labels PERFECTLY EVENLY to any power-of-two partition count P <= n
   * (v satisfies pmod(murmur3(v), n) == b, so pmod(murmur3(v), P) == b mod
   * P for P | n). Without this, hashing n bucket values into P ~ n shuffle
   * partitions leaves ~1/e of the cores idle (balls-in-bins), which
   * measured as a 28% packing loss in the merge stages.
   */
  /** JVM-side twin of [[bucketLabel]]: the label a key's rows carry, for
    * DRIVER-side planning (point lookups prune the file manifest without
    * running a Spark job). */
  def bucketLabelOf(key: String, numBuckets: Int): Int =
    labels(numBuckets)(
      toPositive(hash(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))) % numBuckets)

  def bucketLabel(c: Column, numBuckets: Int): Column = {
    import org.apache.spark.sql.functions._
    element_at(typedlit(labels(numBuckets).toSeq), kafkaPartition(c, numBuckets) + 1)
  }

  private val labelCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Int]]()

  /** labels(n)(b) = smallest v >= 0 with pmod(murmur3_int(v, 42), n) == b. */
  def labels(n: Int): Array[Int] = labelCache.computeIfAbsent(n, _ => {
    val out = new Array[Int](n)
    val found = new Array[Boolean](n)
    var remaining = n
    var v = 0
    while (remaining > 0) {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(v, 42)
      val b = ((h % n) + n) % n
      if (!found(b)) { found(b) = true; out(b) = v; remaining -= 1 }
      v += 1
    }
    out
  })

  private def castToBinary(c: Column): Column = {
    import org.apache.spark.sql.functions._
    c.cast(org.apache.spark.sql.types.StringType).cast(BinaryType)
  }
}

/** Catalyst expression computing Kafka murmur2 over binary input, with
  * whole-stage-codegen support (emits a static call — stays inside the
  * codegen'd stage, no interpretation boundary). */
case class KafkaMurmur2Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kafka_murmur2 requires BINARY input, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    KafkaMurmur2.hash(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.hashing.KafkaMurmur2.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): KafkaMurmur2Expr =
    copy(child = newChild)
  override def prettyName: String = "kafka_murmur2"
}
