package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline: image/audio/video payloads travel as opaque
  * `binary` columns next to typed metadata; decode/feature-extraction is a
  * per-partition batch transform (the Scala analogue of a Pandas-UDF
  * `mapInPandas` stage).
  *
  * The codec layer is REAL for all three modalities (graft.pipeline.Codecs,
  * pure JVM, no external libraries): audio rows carry actual RIFF/WAV PCM16
  * payloads (decoded: sample rate, duration, RMS, zero-crossing rate), image
  * rows actual 24-bit BMPs (decoded: dimensions, per-channel means), and
  * video rows actual animated GIF89a payloads — LZW-compressed multi-frame
  * streams, decoded frame-by-frame (frame count, dimensions, per-channel
  * means across frames; sampleFrames hashes real decoded pixel data).
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           payload_hash: Long, feature: Array[Float])
  case class FrameRow(media_id: Long, frame_idx: Int, frame_hash: Long,
                      frame_bytes: Long)

  /** Deterministic 16-color palette for synthesized GIFs (id-tinted). */
  private def gifPalette(id: Long): Array[Int] =
    Array.tabulate(16) { i =>
      val v = i * 17 // 0..255 gray ramp
      val tint = (id % 3) match {
        case 0 => (v << 16) | ((v / 2) << 8) | (v / 3)
        case 1 => ((v / 3) << 16) | (v << 8) | (v / 2)
        case _ => ((v / 2) << 16) | ((v / 3) << 8) | v
      }
      tint
    }

  /** Synthesize a media table with REAL encoded payloads (deterministic per
    * id): audio = a sine tone WAV (freq/duration a function of id), image = a
    * gradient BMP, video = an animated GIF (3-6 frames of a moving gradient,
    * really LZW-encoded). In production this column comes straight out of
    * parquet/Iceberg binary columns; encoding here is per-partition compute,
    * no driver-side loop.
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
          case _ => // video: animated GIF, frame f = gradient shifted by f
            val nFrames = (id % 4 + 3).toInt
            val frames = (0 until nFrames).map { f =>
              (Array.tabulate[Byte](w * h) { p =>
                val (x, y) = (p % w, p / w)
                (((x + y + f * 3 + (id % 7)) % 16)).toByte
              }, 4 + f) // per-frame delay in centiseconds
            }
            Codecs.gifEncode(w, h, gifPalette(id + seed), frames)
        }
        MediaRow(id, kind, payload, w, h)
      }
    }.toDF()
  }

  /** Decode + featurize, batched per partition. All payloads are genuinely
    * parsed (Codecs); the feature vector layout is [f0..f(dim-1)]:
    * audio = (sampleRate/1e4, duration, rms, zcr, ...0),
    * image = (width/1e3, height/1e3, meanR/255, meanG/255, meanB/255, ...0),
    * video = (nFrames/10, width/1e3, height/1e3, meanR/255, meanG/255,
    *          meanB/255, ...0) over the DECODED frame pixels.
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
            case _ => // video: decode the GIF, average channels across frames
              val g = Codecs.gifDecode(r.payload)
              var (sr, sg, sb, np) = (0.0, 0.0, 0.0, 0L)
              g.frames.foreach(_.rgb.foreach { c =>
                sr += (c >> 16) & 0xFF; sg += (c >> 8) & 0xFF; sb += c & 0xFF; np += 1
              })
              val d = math.max(np, 1L).toDouble
              feat(0) = g.frames.size / 10.0f
              feat(1) = g.width / 1000.0f
              feat(2) = g.height / 1000.0f
              feat(3) = (sr / d / 255.0).toFloat
              if (dim > 4) feat(4) = (sg / d / 255.0).toFloat
              if (dim > 5) feat(5) = (sb / d / 255.0).toFloat
          }
          MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, h, feat)
        }
      }.toDF()
  }

  case class MediaInvariants(media_id: Long, kind: String, width: Long,
                             height: Long, n_frames: Long, n_samples: Long,
                             sample_rate: Long, n_bytes: Long)

  /** Decoded-invariant extraction — the oracle-able face of the media
    * pipeline. Every output is obtained by genuinely PARSING the payload
    * (Codecs.wavDecode / bmpDecode / gifDecode), yet each is a closed-form
    * function of `media_id` under [[synthesize]], so DuckDB can replay the
    * whole table from `range(n)` with no engine-internal state: width/height
    * (image+video), frame count (video), sample count + rate and exact RIFF
    * byte length 44+2n (audio), exact BMP byte length 54+h·rowStride
    * (image). GIF byte length is LZW-data-dependent (not closed-form) so
    * video rows report n_bytes=0; non-applicable fields are 0, never NULL.
    * Pixel/sample content stays with the rows-only `media_features` twin.
    */
  def invariants(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"), col("width"), col("height"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          r.kind match {
            case "audio" =>
              val w = Codecs.wavDecode(r.payload)
              MediaInvariants(r.media_id, r.kind, 0L, 0L, 0L,
                w.nSamples.toLong, w.sampleRate.toLong, r.payload.length.toLong)
            case "image" =>
              val b = Codecs.bmpDecode(r.payload)
              MediaInvariants(r.media_id, r.kind, b.width.toLong, b.height.toLong,
                0L, 0L, 0L, r.payload.length.toLong)
            case _ =>
              val g = Codecs.gifDecode(r.payload)
              MediaInvariants(r.media_id, r.kind, g.width.toLong, g.height.toLong,
                g.frames.size.toLong, 0L, 0L, 0L)
          }
        }
      }.toDF()
  }

  /** Frame sampling over the video rows: decode the GIF, keep every
    * `everyNth` frame, one output row per sampled frame with a hash of the
    * DECODED pixel data (not the container bytes) — the schema and
    * per-partition batch shape of real frame extraction, now with real
    * frames behind it.
    */
  def sampleFrames(media: DataFrame, everyNth: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("kind"), col("payload"), col("width"), col("height"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val g = Codecs.gifDecode(r.payload)
          g.frames.zipWithIndex.collect {
            case (f, i) if i % everyNth == 0 =>
              FrameRow(r.media_id, i,
                java.util.Arrays.hashCode(f.rgb).toLong,
                f.width.toLong * f.height * 3)
          }
        }
      }.toDF()
  }
}
