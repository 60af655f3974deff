package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.{GBMatrix, Monoid}

/** Non-blocking-mode analogue (GB_matrix.h:313-341): streamed pending tuples
  * must be semantically invisible — assembling the pending log after ANY
  * batch split yields exactly the matrix a one-shot build produces, the
  * reference's GrB_wait contract.
  */
class StreamingSpec extends SparkTestBase {

  private val tuples = Seq(
    (1L, 2L, 1.0), (1L, 2L, 2.0), (3L, 4L, 5.0),
    (5L, 6L, 7.0), (3L, 4L, -1.0), (1L, 2L, 0.5))

  test("ingest + assemble == one-shot build, for any batch split and dup monoid") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Double)]
    val dir = Files.createTempDirectory("graft-pending").toString
    val ckpt = Files.createTempDirectory("graft-pending-ckpt").toString
    val q = EdgeStream.ingest(mem.toDS().toDF("src", "dst", "w"), dir, ckpt)
    // three uneven micro-batches, duplicates split across batches
    mem.addData(tuples.take(2)); q.processAllAvailable()
    mem.addData(tuples.slice(2, 3)); q.processAllAvailable()
    mem.addData(tuples.drop(3)); q.processAllAvailable()
    q.stop()
    val want = GBMatrix.fromTuples(tuples.toDF("src", "dst", "w"))
    assertMatrixEq(toMap(EdgeStream.assemble(spark, dir)), toMap(want))
    // a different pending operator folds the same log differently but still
    // matches its one-shot build (the accum-as-pending-op rule)
    assertMatrixEq(
      toMap(EdgeStream.assemble(spark, dir, Monoid.Max)),
      toMap(GBMatrix.fromTuples(tuples.toDF("src", "dst", "w"), Monoid.Max)))
  }

  test("ingest restart from checkpoint neither drops nor re-appends batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Double)]
    val dir = Files.createTempDirectory("graft-pending2").toString
    val ckpt = Files.createTempDirectory("graft-pending2-ckpt").toString
    val q1 = EdgeStream.ingest(mem.toDS().toDF("src", "dst", "w"), dir, ckpt)
    mem.addData(tuples.take(3)); q1.processAllAvailable()
    q1.stop()
    // restart the SAME source + checkpoint: only the new batch lands
    val q2 = EdgeStream.ingest(mem.toDS().toDF("src", "dst", "w"), dir, ckpt)
    mem.addData(tuples.drop(3)); q2.processAllAvailable()
    q2.stop()
    assertMatrixEq(toMap(EdgeStream.assemble(spark, dir)),
      toMap(GBMatrix.fromTuples(tuples.toDF("src", "dst", "w"))))
  }

  test("batch replay after a crash is idempotent; empty log assembles empty") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-pending3").toString
    // nothing committed yet: GrB_wait on a matrix with no pending tuples
    assert(EdgeStream.assemble(spark, dir).nvals == 0)
    EdgeStream.appendBatch(tuples.take(3).toDF("src", "dst", "w"), dir, 0L)
    // crash between parquet commit and offset commit = the same batch id is
    // re-executed; the keyed overwrite must leave the log unchanged
    EdgeStream.appendBatch(tuples.take(3).toDF("src", "dst", "w"), dir, 0L)
    EdgeStream.appendBatch(tuples.drop(3).toDF("src", "dst", "w"), dir, 1L)
    assertMatrixEq(toMap(EdgeStream.assemble(spark, dir)),
      toMap(GBMatrix.fromTuples(tuples.toDF("src", "dst", "w"))))
  }

  test("DocStream.dedupExact drops in-horizon duplicates across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String, Timestamp)]
    val dir = Files.createTempDirectory("graft-docs").toString
    val ckpt = Files.createTempDirectory("graft-docs-ckpt").toString
    val q = DocStream.ingest(
      mem.toDS().toDF("doc_id", "text", "ts"), dir, ckpt, lateness = "10 minutes")
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    // batch 1: two distinct docs + an in-batch duplicate
    mem.addData(Seq((1L, "alpha", ts(0)), (2L, "beta", ts(1)), (3L, "alpha", ts(2))))
    q.processAllAvailable()
    // batch 2: cross-batch duplicate (in horizon) + one new doc
    mem.addData(Seq((4L, "beta", ts(3)), (5L, "gamma", ts(4))))
    q.processAllAvailable()
    q.stop()
    val landed = spark.read.parquet(dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // first-arriving copy per content survives; duplicates 3 and 4 are gone
    assert(landed == Map(1L -> "alpha", 2L -> "beta", 5L -> "gamma"), s"$landed")
  }

  test("minhashIngest landing: cross/within-batch flags, replay-idempotent, split-invariant") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docsAll = Seq(
      (1L, base), (2L, base),                               // within-batch dup pair
      (3L, "completely different content about sparse engines and planning"),
      (10L, base),                                          // cross-batch dup of 1
      (11L, "unrelated words regarding benchmarks and scaling laws tonight"))

    def land(dir: String, batches: Seq[Seq[(Long, String)]]): Map[Long, (Boolean, Option[Long])] = {
      batches.zipWithIndex.foreach { case (b, i) =>
        DocStream.landBatchMinhash(b.toDF("doc_id", "text"), i.toLong, dir, 32, 8)
      }
      spark.read.parquet(s"$dir/docs").collect()
        .map(r => r.getLong(0) ->
          ((r.getBoolean(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    }

    val d1 = Files.createTempDirectory("graft-mh1").toString
    val got = land(d1, Seq(docsAll.take(3), docsAll.drop(3)))
    assert(got(1L) == ((false, None)))            // first copy lands clean
    assert(got(2L) == ((true, Some(1L))))         // same-batch dup -> rep 1
    assert(got(3L)._1 == false && got(11L)._1 == false)
    assert(got(10L) == ((true, Some(1L))))        // cross-batch dup -> rep 1

    // crash-replay of batch 1 overwrites its own partitions, changes nothing
    DocStream.landBatchMinhash(docsAll.drop(3).toDF("doc_id", "text"), 1L, d1, 32, 8)
    val replayed = spark.read.parquet(s"$d1/docs").collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(replayed == got)
    // the bucket store holds each (band,bkt) exactly once
    val store = spark.read.parquet(s"$d1/buckets")
    assert(store.groupBy("band", "bkt").count().filter(col("count") > 1).count() == 0)

    // flags are invariant to how the stream was split into batches
    val d2 = Files.createTempDirectory("graft-mh2").toString
    assert(land(d2, Seq(docsAll)) == got)
  }

  test("runningDegrees stateful counts converge to the batch rowDegrees") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Double)]
    val ckpt = Files.createTempDirectory("graft-deg-ckpt").toString
    val q = EdgeStream.runningDegrees(mem.toDS().toDF("src", "dst", "w"))
      .writeStream.outputMode("update").format("memory").queryName("deg")
      .option("checkpointLocation", ckpt).start()
    mem.addData(tuples.take(4)); q.processAllAvailable()
    mem.addData(tuples.drop(4)); q.processAllAvailable()
    q.stop()
    // updates accumulate across batches; the max per id is the final count
    val got = spark.table("deg").groupBy("id").agg(max("v").as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // raw incidence counts (multi-edges each count, per the op's contract)
    val want = tuples.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    assert(got == want)
  }

  test("arrivalCounts windowed aggregation matches the batch window count") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def t(min: Int, sec: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:$sec%02d")
    val timed = Seq((t(0, 10), 1L, 2L, 1.0), (t(0, 50), 2L, 3L, 1.0),
      (t(1, 5), 3L, 4L, 1.0), (t(2, 30), 4L, 5L, 1.0), (t(2, 59), 5L, 6L, 1.0))
    val mem = MemoryStream[(Timestamp, Long, Long, Double)]
    val ckpt = Files.createTempDirectory("graft-win-ckpt").toString
    val q = EdgeStream.arrivalCounts(
        mem.toDS().toDF("ts", "src", "dst", "w"))
      .writeStream.outputMode("complete").format("memory").queryName("rates")
      .option("checkpointLocation", ckpt).start()
    mem.addData(timed.take(3)); q.processAllAvailable()
    mem.addData(timed.drop(3)); q.processAllAvailable()
    q.stop()
    val got = spark.table("rates")
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    val want = timed.toDF("ts", "src", "dst", "w")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("edges"))
      .select(col("window.start").as("win_start"), col("edges"))
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    assert(got == want)
    assert(got.values.sum == timed.size)
  }

  test("EventStream.sessions: closed sessions equal the batch sessionization") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def t(h: Int, min: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$min%02d:00")
    // user 1: two sessions (65-min gap > 30); user 2: one session
    val evs = Seq(
      (1L, t(10, 0), 1.5), (1L, t(10, 20), 2.5), // session A: 2 events
      (2L, t(10, 5), 1.0),                       // session C: 1 event
      (1L, t(11, 25), 4.0),                      // session B (gap 65 min)
      (2L, t(10, 30), 3.0))                      // joins C (gap 25 min)
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val ckpt = Files.createTempDirectory("graft-sess-ckpt").toString
    val q = graft.streaming.EventStream.sessions(
        mem.toDS().toDF("user_id", "ts", "value"),
        gapMinutes = 30, lateness = "1 minute")
      .writeStream.outputMode("append").format("memory").queryName("sess")
      .option("checkpointLocation", ckpt).start()
    mem.addData(evs.take(3)); q.processAllAvailable()
    mem.addData(evs.drop(3)); q.processAllAvailable()
    // advance the watermark far past every session's last+gap, then run two
    // empty-ish batches so timeouts fire and the closures land
    mem.addData(Seq((99L, t(20, 0), 0.0))); q.processAllAvailable()
    mem.addData(Seq((99L, t(21, 0), 0.0))); q.processAllAvailable()
    q.stop()
    val got = spark.table("sess")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .filter(_._1 != 99L).toSet // 99 is only the watermark-advancer
    // batch replica over the same events (event_id = arrival index)
    val batch = graft.pipeline.Events.sessions(
        evs.zipWithIndex.map { case ((u, ts, v), i) => (i.toLong, ts, u, v) }
          .toDF("event_id", "ts", "user_id", "value"), gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getString(4)))
      .toSet
    assert(got == batch, s"stream=$got batch=$batch")
    assert(got.size == 3 && got.contains((1L, 2L, 4.0, "2026-01-01 10:00:00")))
  }
}
