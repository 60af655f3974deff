package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns next to typed metadata; decode/feature-extraction is a
  * per-partition batch transform (the Scala analogue of a Pandas-UDF
  * `mapInPandas` stage). The actual codec is STUBBED with a deterministic
  * fake (this container ships no image/audio libs) — the Spark-side contract
  * (schema, batching, partition-parallel execution, metadata pushdown) is
  * real and tested.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           payload_hash: Long, feature: Array[Float])

  /** Synthesize an opaque-binary media table (deterministic). In production
    * this column comes straight out of parquet/Iceberg binary columns.
    */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 5L): DataFrame = {
    val kinds = typedLit(Seq("image", "audio", "video"))
    spark.range(0, n).select(
      col("id").as("media_id"),
      element_at(kinds, (pmod(col("id"), lit(3)) + 1).cast("int")).as("kind"),
      // opaque payload: deterministic bytes; unhex gives binary
      unhex(repeat(lower(hex(xxhash64(col("id"), lit(seed)))), 8)).as("payload"),
      (pmod(col("id") * 37, lit(512)) + 16).cast("int").as("width"),
      (pmod(col("id") * 53, lit(512)) + 16).cast("int").as("height"))
  }

  /** STUB decode: a real implementation calls the codec here (per partition,
    * batched). The fake derives a deterministic d-dim feature from the bytes
    * so downstream plumbing (ANN over media features, groupBys, joins) is
    * exercised end-to-end.
    */
  def decodeAndFeaturize(spark: SparkSession, media: DataFrame, dim: Int = 8): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"), col("width"), col("height"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          // ??? <- real codec call site (e.g. image decode + resize + embed)
          val h = java.util.Arrays.hashCode(r.payload).toLong
          val feat = Array.tabulate(dim)(i =>
            (((h * (i + 1) + r.width * 31 + r.height) % 1000).toFloat) / 1000.0f)
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
