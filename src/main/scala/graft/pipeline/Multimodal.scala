package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline: image/audio/video payloads travel as opaque
  * `binary` columns next to typed metadata; decode/feature-extraction is a
  * per-partition batch transform (the Scala analogue of a Pandas-UDF
  * `mapInPandas` stage).
  *
  * The codec layer is REAL for the two formats parseable without external
  * libraries (graft.pipeline.Codecs): audio rows carry actual RIFF/WAV PCM16
  * payloads (decoded: sample rate, duration, RMS, zero-crossing rate) and
  * image rows actual 24-bit BMPs (decoded: dimensions, per-channel means).
  * Video stays a DECLARED STUB — container formats genuinely require codec
  * libraries this container does not ship — with a deterministic
  * hash-derived feature so downstream plumbing is still exercised.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           payload_hash: Long, feature: Array[Float])

  /** Synthesize a media table with REAL encoded payloads (deterministic per
    * id): audio = a sine tone WAV (freq/duration a function of id), image = a
    * gradient BMP, video = opaque bytes (stub format). In production this
    * column comes straight out of parquet/Iceberg binary columns; encoding
    * here is per-partition compute, no driver-side loop.
    */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 5L): DataFrame = {
    import spark.implicits._
    spark.range(0, n).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
        val w = (id * 37 % 48 + 16).toInt
        val h = (id * 53 % 48 + 16).toInt
        val payload = kind match {
          case "audio" =>
            val sampleRate = 8000
            val freq = 200.0 + (id % 200)
            val nSamp = (sampleRate / 10 * (id % 3 + 1)).toInt // 0.1-0.3 s
            Codecs.wavEncodePcm16(sampleRate, Array.tabulate(nSamp)(i =>
              (16384 * math.sin(2 * math.Pi * freq * i / sampleRate)).toShort))
          case "image" =>
            Codecs.bmpEncode24(w, h, (x, y) =>
              ((x * 255 / math.max(w - 1, 1)), (y * 255 / math.max(h - 1, 1)),
                ((id % 256).toInt)))
          case _ => // video container: stub bytes (no codec libs shipped)
            Array.tabulate[Byte](64)(i => ((id * 31 + i * 7 + seed) % 251).toByte)
        }
        MediaRow(id, kind, payload, w, h)
      }
    }.toDF()
  }

  /** Decode + featurize, batched per partition. Audio/image payloads are
    * genuinely parsed (Codecs); the feature vector layout is
    * [f0..f(dim-1)]: audio = (sampleRate/1e4, duration, rms, zcr, ...0),
    * image = (width/1e3, height/1e3, meanR/255, meanG/255, meanB/255, ...0),
    * video = deterministic hash-derived stub values.
    */
  def decodeAndFeaturize(spark: SparkSession, media: DataFrame, dim: Int = 8): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"), col("width"), col("height"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val h = java.util.Arrays.hashCode(r.payload).toLong
          val feat = new Array[Float](dim)
          r.kind match {
            case "audio" =>
              val w = Codecs.wavDecode(r.payload)
              feat(0) = (w.sampleRate / 10000.0).toFloat
              feat(1) = w.durationSec.toFloat
              feat(2) = w.rms.toFloat
              feat(3) = w.zeroCrossRate.toFloat
            case "image" =>
              val b = Codecs.bmpDecode(r.payload)
              feat(0) = b.width / 1000.0f
              feat(1) = b.height / 1000.0f
              feat(2) = (b.meanR / 255.0).toFloat
              feat(3) = (b.meanG / 255.0).toFloat
              if (dim > 4) feat(4) = (b.meanB / 255.0).toFloat
            case _ => // video: stub feature (no container codec available)
              var i = 0
              while (i < dim) {
                feat(i) = (((h * (i + 1) + r.width * 31 + r.height) % 1000).toFloat) / 1000.0f
                i += 1
              }
          }
          MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, h, feat)
        }
      }.toDF()
  }

  /** Frame-sampling plumbing for video-ish payloads: slice the binary into
    * fixed-size "frames", explode one row per sampled frame — the schema and
    * partitioning pattern of real frame extraction.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 8, everyNth: Int = 2): DataFrame = {
    val nFrames = floor(length(col("payload")) / frameBytes).cast("int")
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(everyNth)),
          i => substring(col("payload"), (i * frameBytes + 1).cast("int"), lit(frameBytes))))
          .as(Seq("frame_idx", "frame")))
      .select(col("media_id"), col("frame_idx"),
        xxhash64(col("frame")).as("frame_hash"), length(col("frame")).as("frame_bytes"))
  }
}
