package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video ride as opaque `binary`
 * columns with typed metadata; decode/feature-extraction runs per partition
 * against a pluggable [[MediaDecoder]].
 *
 * The Spark side — schema, bucketed partitioning by media size class,
 * per-partition batched decode via `mapPartitions`, feature schema — is real
 * and tested. The actual pixel/sample decoding is STUBBED behind
 * [[DeterministicFakeDecoder]] (this container ships no image/audio codecs);
 * swapping in a real decoder is a one-class change with the same signature.
 */
object Multimodal {

  /** Canonical multimodal record layout. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Deterministic synthetic media table (no external data): bytes derived
    * from the id, metadata plausible per modality. Modality and payload
    * length are simple functions of the id so the SQL oracle can reproduce
    * the aggregate shape (`q_multimodal_features`). */
  def syntheticMedia(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val base = spark.range(n)
    val modality = element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("id"), lit(3L)) + 1).cast(IntegerType))
    // payload length 3*(12 + (id*7) % 37) bytes = base64 of 4x that many
    // chars; deterministic pseudo-bytes from a repeated hash string prefix
    val b64chars = (lit(4) * (lit(12) + pmod(col("id") * 7, lit(37L)))).cast(IntegerType)
    val bytes = unbase64(repeat(sha2(concat(lit(seed), col("id")), 256), 3).substr(lit(1), b64chars))
    base.select(
      col("id").as("media_id"),
      modality.as("modality"),
      bytes.as("bytes"),
      struct(
        when(modality === "image", lit(224)).otherwise(lit(null).cast(IntegerType)).as("width"),
        when(modality === "image", lit(224)).otherwise(lit(null).cast(IntegerType)).as("height"),
        when(modality === "audio", lit(16000)).otherwise(lit(null).cast(IntegerType)).as("sample_rate"),
        when(modality =!= "image", pmod(xxhash64(col("id")), lit(60000L))).otherwise(lit(null).cast(LongType)).as("duration_ms")
      ).as("meta"))
  }

  /** Per-partition batched decode/feature-extract through the decoder. The
    * mapPartitions boundary is where a real codec (JNI, native lib) would
    * amortize init cost per partition, exactly like a Pandas-UDF batch. */
  def extractFeatures(df: DataFrame, decoder: MediaDecoder = DeterministicFakeDecoder): DataFrame = {
    val spark = df.sparkSession
    implicit val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    df.select("media_id", "modality", "bytes").as("media")
      .mapPartitions { rows =>
        decoder.init() // once per partition, not per row
        rows.map { r =>
          val id = r.getLong(0)
          val modality = r.getString(1)
          val bytes = if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
          val feats = decoder.decode(modality, bytes)
          Row(id, modality, bytes.length, feats)
        }
      }(enc)
  }
}

/** Pluggable decode/feature-extraction kernel. Implementations must be
  * deterministic for a given byte payload. */
trait MediaDecoder extends Serializable {
  def init(): Unit = ()
  /** Returns a fixed-width feature vector for the payload. */
  def decode(modality: String, bytes: Array[Byte]): Seq[Float]
}

/**
 * STUB decoder: real image/audio decoding is unavailable in this container,
 * so features are a deterministic fold of the payload bytes (8 floats).
 * The Spark plumbing (schema, batching, partitioning) is identical to what
 * a real decoder would see.
 */
object DeterministicFakeDecoder extends MediaDecoder {
  override def decode(modality: String, bytes: Array[Byte]): Seq[Float] = {
    val acc = new Array[Long](8)
    var i = 0
    while (i < bytes.length) {
      acc(i % 8) = acc(i % 8) * 31 + (bytes(i) & 0xff)
      i += 1
    }
    val modSalt = modality.hashCode
    acc.toSeq.map(v => (((v ^ modSalt) % 1000).toFloat) / 1000.0f)
  }
}
