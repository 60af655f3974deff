package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import graft.core.{GBMatrix, Monoid}

/** Structured-Streaming front door for the engine — the Spark-native analogue
  * of the reference's NON-BLOCKING mode (the only "streaming" the reference
  * has, /root/reference/Source/Shared/GB_matrix.h:313-331): `GrB_setElement`
  * appends to a cheap-to-update pending-tuple list inside the matrix, and the
  * matrix is finalized (pending tuples assembled through the dup/accum
  * operator, GB_matrix.h:335-341) only when an operation needs it.
  *
  * Mapped to Spark's execution model:
  *  - the pending list  → an append-only parquet tuple log written by a
  *    `foreachBatch` sink (blind appends, no read-modify-write per batch —
  *    this is what makes ingest O(batch) at any accumulated size, exactly
  *    like the reference's O(1)-amortized setElement vs the O(nnz) eager
  *    insert it avoids, GB_matrix.h:316-321);
  *  - `GrB_wait(matrix)` → `assemble()`: one shuffle groupBy over the log
  *    folding duplicates with the dup monoid (GB_builder semantics).
  *
  * At 100 TB the pending log is the standard streaming-lakehouse shape: many
  * small batch files compacted on assembly; the assembly shuffle is the same
  * one-pass build every batch pipeline here already runs.
  */
object EdgeStream {

  /** Start the non-blocking ingest: each micro-batch of (src,dst,w) triplets
    * is appended to the pending log at `pendingDir`. `checkpointDir` carries
    * the stream's exactly-once offsets, so a restarted stream neither drops
    * nor re-appends batches (the resumability contract the batch algorithms
    * get from graft.core.Checkpoint).
    */
  def ingest(triplets: DataFrame, pendingDir: String, checkpointDir: String,
             queryName: String = "graft-edge-ingest"): StreamingQuery =
    triplets
      .select(col("src").cast("long"), col("dst").cast("long"),
        col("w").cast("double"))
      .writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        appendBatch(batch, pendingDir, id)
      }
      .start()

  /** Idempotent batch landing: each micro-batch overwrites ITS OWN
    * `batch=<id>` partition directory, so a crash between the parquet commit
    * and the streaming offset commit is healed by the replayed batch
    * overwriting the same directory — foreachBatch alone is at-least-once;
    * keying the write by batchId is what makes the log exactly-once. The
    * batch-partitioned layout is the log's on-disk format from its first
    * write; a pendingDir must never mix it with flat files (Spark's
    * partition discovery rejects mixed structures).
    */
  def appendBatch(batch: DataFrame, pendingDir: String, id: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$pendingDir/batch=$id")

  /** GrB_wait analogue: assemble the pending-tuple log into a finalized
    * matrix, folding structural duplicates with the dup monoid — the
    * "pending operator" (GB_matrix.h:335-341; GrB_setElement's default dup
    * for the double domain is SECOND-style last-write, but the engine keeps
    * build's explicit-monoid contract, GraphBLAS.h:2923).
    */
  def assemble(spark: SparkSession, pendingDir: String,
               dup: Monoid = Monoid.Plus): GBMatrix = {
    import spark.implicits._
    val pending =
      try spark.read.parquet(pendingDir).select("src", "dst", "w")
      catch { // ONLY the empty-log cases — a log that exists but is
        // malformed (wrong columns, mixed layouts) must surface, not read
        // as "no pending tuples"
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" ||
               e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
          Seq.empty[(Long, Long, Double)].toDF("src", "dst", "w")
      }
    GBMatrix.fromTuples(pending, dup)
  }

  /** Continuously-maintained per-src arrival counts over the edge stream via
    * typed per-key state (`mapGroupsWithState` — the stateful-operator route
    * for incremental vertex aggregates when per-batch re-assembly would be
    * wasteful). Counts raw tuple incidences (multi-edges each count; for
    * structural out-degrees, assemble() the pending log and use
    * GBMatrix.rowDegrees). Emits (id, v) updates for vertices touched in
    * each batch; state is one long per distinct src, partitioned by the
    * state store.
    */
  def runningDegrees(triplets: DataFrame): DataFrame = {
    val spark = triplets.sparkSession
    import spark.implicits._
    triplets.select(col("src").cast("long")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState[Long, (Long, Double)](GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val next = state.getOption.getOrElse(0L) + rows.size
          state.update(next)
          (id, next.toDouble)
      }
      .toDF("id", "v")
  }

  /** Watermarked per-window edge arrival counts — the standard streaming
    * windowed aggregation over the ingest (event-time column `ts`), with
    * late data beyond `lateness` dropped by the watermark.
    */
  def arrivalCounts(triplets: DataFrame, windowLen: String = "1 minute",
                    lateness: String = "5 minutes"): DataFrame =
    triplets
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen))
      .agg(count(lit(1)).as("edges"))
      .select(col("window.start").as("win_start"), col("edges"))
}
