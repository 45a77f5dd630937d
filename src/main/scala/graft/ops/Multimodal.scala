package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal columns: image/audio/video ride as opaque `binary` columns with
 * typed metadata; decode + feature-extraction runs per partition against a
 * pluggable [[MediaDecoder]].
 *
 * The production decoder [[JdkMediaDecoder]] is REAL: PNG frames decode
 * through `javax.imageio`, WAV through `javax.sound.sampled` (both ship with
 * the JDK — no external codecs, zero egress), video through a RIFF-style
 * container of PNG frames with every-`frameStep`-th frame sampled. Synthetic
 * media is generated with the same formats (constant-pixel PNGs, DC-level
 * PCM16 WAVs), so every decoded dimension/mean is an arithmetic function of
 * the id and the DuckDB oracle can verify the decode end-to-end.
 *
 * Scale posture: `mapPartitions` batches the decode so a per-partition codec
 * init amortizes (the JVM equivalent of a Pandas-UDF batch); media bytes
 * never shuffle — features are extracted where the bytes live and only the
 * small typed rows move on.
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

  /** Typed decode output; null = not applicable to the modality. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("mean_px", DoubleType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_samples", IntegerType, nullable = true),
    StructField("rms", DoubleType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true)))

  // Deterministic synthesis parameters — arithmetic in the id so the SQL
  // oracle reproduces every decoded value (q_multimodal_features).
  private[ops] def widthOf(id: Long): Int = 16 + (id % 16).toInt
  private[ops] def heightOf(id: Long): Int = 16 + (id % 8).toInt
  private[ops] def pxOf(id: Long, frame: Int): Int = ((id * 37 + frame * 11) % 256).toInt
  private[ops] def samplesOf(id: Long): Int = 800 + (id % 10).toInt * 160
  private[ops] def ampOf(id: Long): Int = 1000 + (id % 50).toInt * 100
  private[ops] def framesOf(id: Long): Int = 2 + ((id / 3) % 3).toInt

  /** Deterministic synthetic media (no external data): REAL format bytes —
    * PNG (image), PCM16 WAV (audio), PNG-frame container (video). */
  def syntheticMedia(spark: SparkSession, n: Long): DataFrame = {
    implicit val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    spark.range(n).mapPartitions { ids =>
      ids.map { boxed =>
        val id = boxed.longValue()
        val (modality, bytes): (String, Array[Byte]) = (id % 3) match {
          case 0 => ("image", MediaCodec.encodePng(widthOf(id), heightOf(id), pxOf(id, 0)))
          case 1 => ("audio", MediaCodec.encodeWavDc(16000, samplesOf(id), ampOf(id)))
          case _ => ("video", MediaCodec.encodeFrameContainer(framesOf(id), widthOf(id), heightOf(id), f => pxOf(id, f)))
        }
        val meta = modality match {
          case "image" => Row(widthOf(id), heightOf(id), null, null)
          case "audio" => Row(null, null, 16000, samplesOf(id).toLong * 1000 / 16000)
          case _       => Row(widthOf(id), heightOf(id), null, framesOf(id).toLong * 40L)
        }
        Row(id, modality, bytes, meta)
      }
    }(enc).toDF()
  }

  /** Per-partition batched decode/feature-extract through the decoder; the
    * mapPartitions boundary is where codec init amortizes. */
  def extractFeatures(df: DataFrame, decoder: MediaDecoder = JdkMediaDecoder): DataFrame = {
    implicit val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    df.select("media_id", "modality", "bytes").mapPartitions { rows =>
      decoder.init() // once per partition, not per row
      rows.map { r =>
        val id = r.getLong(0)
        val modality = r.getString(1)
        val bytes = if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
        val d = decoder.decode(modality, bytes)
        Row(id, modality, bytes.length,
          d.width.map(Int.box).orNull, d.height.map(Int.box).orNull,
          d.meanPx.map(v => Double.box(math.rint(v * 10000) / 10000)).orNull,
          d.sampleRate.map(Int.box).orNull, d.nSamples.map(Int.box).orNull,
          d.rms.map(v => Double.box(math.rint(v * 10000) / 10000)).orNull,
          d.nFrames.map(Int.box).orNull)
      }
    }(enc).toDF()
  }
}

/** Typed decode result; None = field not applicable to the modality. */
final case class DecodedMedia(
    width: Option[Int] = None,
    height: Option[Int] = None,
    meanPx: Option[Double] = None,
    sampleRate: Option[Int] = None,
    nSamples: Option[Int] = None,
    rms: Option[Double] = None,
    nFrames: Option[Int] = None)

/** Pluggable decode kernel. Implementations must be deterministic. */
trait MediaDecoder extends Serializable {
  def init(): Unit = ()
  def decode(modality: String, bytes: Array[Byte]): DecodedMedia
}

/** JDK-codec decoder: ImageIO PNG, javax.sound WAV, PNG-frame container
  * with every-2nd-frame sampling. */
object JdkMediaDecoder extends MediaDecoder {
  val frameStep = 2

  override def init(): Unit = System.setProperty("java.awt.headless", "true")

  override def decode(modality: String, bytes: Array[Byte]): DecodedMedia = modality match {
    case "image" =>
      val (w, h, mean) = MediaCodec.decodeImage(bytes)
      DecodedMedia(width = Some(w), height = Some(h), meanPx = Some(mean))
    case "audio" =>
      val (rate, n, rms) = MediaCodec.decodeWav(bytes)
      DecodedMedia(sampleRate = Some(rate), nSamples = Some(n), rms = Some(rms))
    case "video" =>
      val (frames, w, h, mean) = MediaCodec.decodeFrames(bytes, frameStep)
      DecodedMedia(width = Some(w), height = Some(h), meanPx = Some(mean), nFrames = Some(frames))
    case other => throw new IllegalArgumentException(s"unknown modality: $other")
  }
}
