package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Streaming front door for the DOCUMENT pipeline — the ingest-time half of
  * the dedup family in [[graft.pipeline.Dedup]]. Exact duplicates are dropped
  * as documents arrive; anything subtler (near-dup, cross-horizon) belongs to
  * the batch passes over the landed log, and the honest contract here is to
  * say so rather than pretend unbounded streaming state.
  *
  * 100 TB design: the dedup state is one 64-char hash per distinct document
  * seen inside the watermark horizon — bounded by arrival rate × horizon, not
  * by corpus size, and sharded by the state store across executors. The
  * landed log is batch-keyed exactly like [[EdgeStream.appendBatch]], so
  * crash-replays overwrite their own batch directory (exactly-once landing on
  * top of foreachBatch's at-least-once contract).
  */
object DocStream {

  /** Drop exact-duplicate documents as they arrive: dedup key = sha256 of
    * the text (the same key [[graft.pipeline.Dedup.exact]] uses, so the
    * stream and the batch pass agree on what "duplicate" means), state
    * bounded by the event-time watermark: a duplicate arriving within
    * `lateness` of the first copy is dropped; one arriving after the horizon
    * has expired is the batch pass's job.
    *
    * Input must carry (doc_id, text, ts). Output keeps the first-arriving
    * copy per content hash, with the hash attached for downstream joins.
    */
  def dedupExact(docs: DataFrame, lateness: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_sha", sha2(col("text"), 256))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("content_sha")

  /** Land the deduped stream into a batch-keyed parquet log (the document
    * analogue of [[EdgeStream.ingest]]; same idempotent `batch=<id>`
    * overwrite discipline).
    */
  def ingest(docs: DataFrame, outDir: String, checkpointDir: String,
             lateness: String = "10 minutes",
             queryName: String = "graft-doc-ingest"): StreamingQuery =
    dedupExact(docs, lateness)
      .writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch=$id")
      }
      .start()
}
