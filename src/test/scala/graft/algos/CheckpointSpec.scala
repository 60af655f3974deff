package graft.algos

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.ref.DenseMimic

/** North-rule resumability: vertex-state checkpoints with per-partition
  * lineage + iteration metrics; a killed run resumed from the newest complete
  * checkpoint must produce the identical converged answer.
  */
class CheckpointSpec extends SparkTestBase {

  def randGraph(n: Int, m: Int, seed: Long): Set[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until m).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2).toSet
  }

  test("checkpoint schema carries (id, r, iter, part) lineage columns") {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    val es = randGraph(30, 100, 23L)
    PageRank.run(spark, edgesDF(es), tol = 0.0, maxIter = 4,
      checkpointDir = Some(dir), checkpointEvery = 2)
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.contains("iter=00002") && files.contains("iter=00004"), files.mkString(","))
    val ck = spark.read.parquet(s"$dir/iter=00004")
    assert(ck.columns.sorted.toSeq == Seq("id", "iter", "part", "r"))
    assert(ck.select("iter").distinct().collect().map(_.getInt(0)).toSeq == Seq(4))
    assert(ck.select("part").distinct().count() >= 1)
  }

  test("resume from mid-run checkpoint reproduces the uninterrupted answer") {
    val dir = Files.createTempDirectory("graft-resume").toString
    val es = randGraph(50, 250, 24L)

    // "killed" run: stops after 6 iterations, checkpointing every 3
    val partial = PageRank.run(spark, edgesDF(es), tol = 0.0, maxIter = 6,
      checkpointDir = Some(dir), checkpointEvery = 3)
    assert(partial.iterations == 6)

    // resumed run: picks up at iter=6 and converges
    val resumed = PageRank.run(spark, edgesDF(es), tol = 1e-8, maxIter = 60,
      checkpointDir = Some(dir), checkpointEvery = 50)
    assert(resumed.metrics.head.iter == 7, "resume must continue at iteration 7")

    // uninterrupted reference run
    val full = PageRank.run(spark, edgesDF(es), tol = 1e-8, maxIter = 60)
    assert(resumed.iterations == full.iterations)
    val a = dfToVec(resumed.ranks.withColumnRenamed("r", "v"))
    val b = dfToVec(full.ranks.withColumnRenamed("r", "v"))
    assertVecEq(a, b, tol = 1e-12, ctx = "resume-vs-full")

    // and both match the dense mimic
    val (want, _) = DenseMimic.pagerank(es, tol = 1e-8, maxIter = 60)
    assertVecEq(a, want, tol = 1e-9, ctx = "resume-vs-mimic")
  }

  test("SSSP and BFS resume from mid-run checkpoints to the uninterrupted answer") {
    import org.apache.spark.sql.functions.col
    val es = randGraph(40, 160, 26L)
    val wdf = edgesDF(es).withColumn("w",
      (org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(col("src"), col("dst")),
        org.apache.spark.sql.functions.lit(5L)) + 1).cast("double"))

    // SSSP: kill after 2 rounds, resume, compare with uninterrupted
    val sdir = Files.createTempDirectory("graft-sssp-ckpt").toString
    SSSP.run(spark, wdf, source = 0L, maxIter = 2,
      checkpointDir = Some(sdir), checkpointEvery = 1)
    val sResumed = SSSP.run(spark, wdf, source = 0L,
        checkpointDir = Some(sdir), checkpointEvery = 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sFull = SSSP.run(spark, wdf, source = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sResumed == sFull)

    // BFS: kill after 1 level, resume; levels+parents must match end-to-end
    val bdir = Files.createTempDirectory("graft-bfs-ckpt").toString
    BFS.run(spark, edgesDF(es), source = 0L, maxIter = 1,
      checkpointDir = Some(bdir), checkpointEvery = 1)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "level", "parent").collect()
        .map(r => (r.getLong(0), r.getAs[Number](1).intValue, r.getLong(2))).toSet
    val bResumed = rows(BFS.run(spark, edgesDF(es), source = 0L,
      checkpointDir = Some(bdir), checkpointEvery = 100))
    val bFull = rows(BFS.run(spark, edgesDF(es), source = 0L))
    assert(bResumed == bFull)
  }

  test("k-truss resumes its edge-peeling from a mid-run snapshot") {
    // K5 plus a pendant triangle: the 4-truss is the K5
    val k5 = (for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j)).toSet
    val es = k5 ++ Set((4L, 10L), (4L, 11L), (10L, 11L))
    val dir = Files.createTempDirectory("graft-ktruss-ckpt").toString
    KTruss.run(spark, edgesDF(es), k = 4, maxIter = 1,
      checkpointDir = Some(dir), checkpointEvery = 1)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val resumed = pairs(KTruss.run(spark, edgesDF(es), k = 4,
      checkpointDir = Some(dir), checkpointEvery = 100))
    val full = pairs(KTruss.run(spark, edgesDF(es), k = 4))
    assert(resumed == full)
    assert(resumed == k5.map { case (a, b) => (math.min(a, b), math.max(a, b)) })
  }

  test("checkpoint dir accumulates a parseable per-iteration metrics log") {
    val dir = Files.createTempDirectory("graft-metrics").toString
    val es = randGraph(30, 100, 28L)
    graft.algos.ConnectedComponents.run(spark, edgesDF(es),
      checkpointDir = Some(dir), checkpointEvery = 2)
    val log = new java.io.File(s"$dir/metrics.jsonl")
    assert(log.exists())
    val lines = scala.io.Source.fromFile(log).getLines().toList
    assert(lines.nonEmpty)
    // every line is one JSON object with iter/changed/millis numeric fields
    val re = """\{"iter":(\d+),"changed":(\d+),"millis":(\d+)\}""".r
    lines.foreach { l => assert(re.matches(l), s"unparseable metric line: $l") }
    val iters = lines.map { case re(i, _, _) => i.toInt }
    assert(iters == (1 to iters.max).toList, "one record per iteration, in order")
    // a resumed run appends to the same log
    ConnectedComponents.run(spark, edgesDF(es),
      checkpointDir = Some(dir), checkpointEvery = 2)
    assert(scala.io.Source.fromFile(log).getLines().size > lines.size)
  }

  test("snapshots from a different run identity (other source) are not resumed") {
    import org.apache.spark.sql.functions.{col, lit}
    val es = randGraph(30, 120, 27L)
    val wdf = edgesDF(es).withColumn("w", lit(1.0))
    val dir = Files.createTempDirectory("graft-tag").toString
    SSSP.run(spark, wdf, source = 0L, maxIter = 3,
      checkpointDir = Some(dir), checkpointEvery = 1)
    // same dir, different source: the run tag mismatches, so this must be a
    // FRESH source-5 run, not source-0 distances wearing a source-5 label
    val other = SSSP.run(spark, wdf, source = 5L,
        checkpointDir = Some(dir), checkpointEvery = 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fresh = SSSP.run(spark, wdf, source = 5L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(other == fresh)
    assert(other(5L) == 0.0)
  }

  test("incomplete checkpoint dirs (no _SUCCESS) are ignored on resume") {
    val dir = Files.createTempDirectory("graft-broken").toString
    val es = randGraph(20, 60, 25L)
    PageRank.run(spark, edgesDF(es), tol = 0.0, maxIter = 2,
      checkpointDir = Some(dir), checkpointEvery = 2)
    // corrupt a newer fake checkpoint: directory without _SUCCESS
    val fake = new java.io.File(s"$dir/iter=00009")
    assert(fake.mkdirs())
    val resumed = PageRank.run(spark, edgesDF(es), tol = 0.0, maxIter = 3,
      checkpointDir = Some(dir), checkpointEvery = 100)
    // resumes from iter=2 (the last COMPLETE one), so first new metric is iter 3
    assert(resumed.metrics.head.iter == 3)
  }
}
