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

  /** NEAR-dup-aware streaming landing: each arriving document is flagged as
    * a MinHash-LSH candidate if it shares any band bucket with an earlier
    * document — earlier micro-batch, or a smaller doc_id in the same batch
    * (the same candidate definition as the batch pass
    * [[graft.pipeline.Dedup.minhashCandidates]], so stream flags and batch
    * verification agree). Exact Jaccard verification of the flagged pairs
    * stays a batch job over the landed log — the honest streaming contract.
    *
    * 100 TB design: the dedup state is NOT executor memory — it is the
    * batch-keyed `buckets/batch=<id>` parquet store on the lakehouse, one
    * (band, bucket, first-doc) row per NEW bucket per batch. Each micro-batch
    * does one equi-join of its own buckets against the store; replays of a
    * batch id overwrite their own `docs/` and `buckets/` partitions and read
    * only `batch < id`, so the landing is exactly-once AND self-exclusive
    * under foreachBatch's at-least-once contract.
    */
  def minhashIngest(docs: DataFrame, outDir: String, checkpointDir: String,
                    numPerm: Int = 32, bands: Int = 8,
                    queryName: String = "graft-doc-minhash-ingest"): StreamingQuery =
    docs.writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        landBatchMinhash(batch, id, outDir, numPerm, bands)
      }
      .start()

  /** One micro-batch of [[minhashIngest]] — factored out so tests replay the
    * exact landing logic (including crash-replay) without a streaming
    * harness. */
  private[streaming] def landBatchMinhash(batch0: DataFrame, id: Long,
                                          outDir: String, numPerm: Int,
                                          bands: Int): Unit = {
    import graft.pipeline.Dedup
    val spark = batch0.sparkSession
    val batch = batch0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bk = Dedup.minhashBuckets(
      Dedup.minhashSignatures(
        Dedup.shingles(batch.select(col("doc_id"), col("text"))), numPerm),
      bands)
    val prior =
      try spark.read.parquet(s"$outDir/buckets").filter(col("batch") < id)
        .select(col("band"), col("bkt"), col("rep"))
      catch { case _: org.apache.spark.sql.AnalysisException =>
        spark.emptyDataFrame.select(lit(0).as("band"), lit(0L).as("bkt"),
          lit(0L).as("rep")).limit(0)
      }
    val batchMin = bk.groupBy("band", "bkt").agg(min("doc_id").as("bmin"))
    val hits = bk.join(prior, Seq("band", "bkt"), "left")
      .join(batchMin, Seq("band", "bkt"))
      .groupBy("doc_id")
      .agg(min(col("rep")).as("prior_rep"),
        min(when(col("bmin") < col("doc_id"), col("bmin"))).as("batch_rep"))
      .select(col("doc_id"),
        (col("prior_rep").isNotNull || col("batch_rep").isNotNull).as("nd_candidate"),
        coalesce(least(col("prior_rep"), col("batch_rep")),
          col("prior_rep"), col("batch_rep")).as("nd_rep"))
    batch.join(hits, Seq("doc_id"), "left")
      .withColumn("nd_candidate", coalesce(col("nd_candidate"), lit(false)))
      .write.mode("overwrite").parquet(s"$outDir/docs/batch=$id")
    batchMin.join(prior.select("band", "bkt"), Seq("band", "bkt"), "left_anti")
      .select(col("band"), col("bkt"), col("bmin").as("rep"))
      .write.mode("overwrite").parquet(s"$outDir/buckets/batch=$id")
    batch.unpersist(false)
  }

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
