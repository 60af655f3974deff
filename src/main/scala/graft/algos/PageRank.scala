package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.GBMatrix

/** PageRank with the exact semantics of the reference's
  * GraphBLAS/@GrB/pagerank.m:
  *  - damp=0.85, tol (inf-norm of r-prior < tol), maxit (pagerank.m:40-54)
  *  - unweighted: semiring +.2nd — each in-neighbor contributes r(i)/d(i)
  *    regardless of stored weight (pagerank.m:74-85)
  *  - out-degree d with sinks forced to d=1 (pagerank.m:97-104)
  *  - per-iteration: r = (1-damp)/n + damp*sinkMass/n + damp * Σ_{i→j} r(i)/d(i)
  *    (pagerank.m:113-142); sinkMass = Σ r(sinks) of the prior iteration
  *  - convergence via normdiff inf-norm (pagerank.m:143-150, normdiff.m:12-16)
  *
  * Spark shape (SURVEY.md §2.10): adjacency cached + hash-partitioned once;
  * each iteration is one join (gather r(src)/d(src)) + one hash-agg scatter on
  * dst, with the dense teleport/sink terms folded in as column arithmetic on
  * the full vertex set — the analogue of the reference's in-place dense
  * accumulation (GB_AxB_dot4.c). Lineage is cut every `checkpointEvery`
  * iterations by persisting the vertex-state vector to parquet (the
  * resumable-checkpoint path mandated by the north rule).
  */
object PageRank {

  case class Result(ranks: DataFrame, iterations: Int, finalDelta: Double,
                    metrics: Seq[IterMetric])
  case class IterMetric(iter: Int, delta: Double, sinkMass: Double, millis: Long)

  /** @param edges        (src,dst,w) edge table (weights ignored: unweighted)
    * @param checkpointDir when set, vertex state is written to
    *                      `$dir/iter=%05d` every `checkpointEvery` iterations
    *                      with per-partition lineage, and `run` resumes from
    *                      the newest complete checkpoint found there.
    */
  def run(spark: SparkSession, edges: DataFrame, damp: Double = 0.85,
          tol: Double = 1e-6, maxIter: Int = 100,
          checkpointDir: Option[String] = None, checkpointEvery: Int = 10,
          numPartitions: Int = 0): Result = {

    val parts = if (numPartitions > 0) numPartitions
                else spark.conf.get("spark.sql.shuffle.partitions").toInt

    // distinct structural edges, partitioned by src and cached: the loop's
    // reusable CSR-side (reference keeps A by-row; we keep the partitioning)
    val adj = edges.select(col("src"), col("dst")).distinct()
      .repartition(parts, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // vertex universe = all ids appearing on either side
    val vertices = adj.select(col("src").as("id"))
      .union(adj.select(col("dst").as("id"))).distinct()
      .repartition(parts, col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = vertices.count()

    // out-degree; sinks (no out-edges) get d=1 (pagerank.m:97-104)
    val outDeg = adj.groupBy("src").agg(count(lit(1)).cast("double").as("d"))
    val degrees = vertices.join(outDeg, vertices("id") === outDeg("src"), "left")
      .select(col("id"), coalesce(col("d"), lit(1.0)).as("d"),
        col("src").isNull.as("isSink"))
      .repartition(parts, col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    degrees.count() // materialize once

    val teleport = (1.0 - damp) / n

    // resume from newest complete checkpoint if present
    val (startIter, r0) = checkpointDir.flatMap(newestCheckpoint(spark, _))
      .getOrElse((0, vertices.select(col("id"), lit(1.0 / n).as("r"))))

    var r = r0.repartition(parts, col("id")).persist(StorageLevel.MEMORY_AND_DISK)
    r.count()
    var iter = startIter
    var delta = Double.PositiveInfinity
    val metrics = scala.collection.mutable.ArrayBuffer[IterMetric]()

    while (iter < maxIter && delta >= tol) {
      val t0 = System.nanoTime()
      // sink mass of the prior vector (pagerank.m:130-136)
      val sinkMass = degrees.filter(col("isSink"))
        .join(r, Seq("id")).agg(sum(col("r"))).collect()(0) match {
          case row if row.isNullAt(0) => 0.0
          case row => row.getDouble(0)
        }
      val base = teleport + damp * sinkMass / n

      // t = r ./ d on sources; scatter-add into dst (semiring +.2nd over the
      // structural adjacency: contribution is r(src)/d(src), "second" ignores
      // the edge weight)
      val contrib = adj
        .join(degrees.select(col("id").as("src"), col("d")), Seq("src"))
        .join(r.select(col("id").as("src"), col("r")), Seq("src"))
        .select(col("dst"), (col("r") / col("d")).as("t"))
        .groupBy(col("dst").as("id")).agg(sum(col("t")).as("s"))

      val rNext = vertices.join(contrib, Seq("id"), "left")
        .select(col("id"), (lit(base) + lit(damp) * coalesce(col("s"), lit(0.0))).as("r"))
        .repartition(parts, col("id"))
        .persist(StorageLevel.MEMORY_AND_DISK)

      // inf-norm convergence (normdiff.m:12-16)
      delta = rNext.join(r.select(col("id"), col("r").as("rp")), Seq("id"))
        .agg(max(abs(col("r") - col("rp")))).collect()(0).getDouble(0)

      r.unpersist(false)
      r = rNext
      iter += 1
      metrics += IterMetric(iter, delta, sinkMass, (System.nanoTime() - t0) / 1000000)

      checkpointDir.foreach { dir =>
        if (iter % checkpointEvery == 0 || delta < tol) writeCheckpoint(r, dir, iter)
      }
      // cut lineage even without an external checkpoint dir
      if (checkpointDir.isEmpty && iter % checkpointEvery == 0) {
        r = r.localCheckpoint(true)
      }
    }

    adj.unpersist(false); vertices.unpersist(false); degrees.unpersist(false)
    Result(r, iter, delta, metrics.toSeq)
  }

  /** Vertex-state checkpoint with per-partition lineage (north rule): columns
    * (id, r, iter, part) + a _SUCCESS marker from the parquet commit protocol.
    */
  def writeCheckpoint(r: DataFrame, dir: String, iter: Int): Unit =
    r.select(col("id"), col("r"), lit(iter).as("iter"),
        spark_partition_id().as("part"))
      .write.mode("overwrite").parquet(f"$dir/iter=$iter%05d")

  /** Newest complete (has _SUCCESS) checkpoint under `dir`, if any. */
  def newestCheckpoint(spark: SparkSession, dir: String): Option[(Int, DataFrame)] = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) return None
    val done = d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("iter=") &&
      new java.io.File(f, "_SUCCESS").exists())
    if (done.isEmpty) None
    else {
      val best = done.maxBy(_.getName)
      val it = best.getName.stripPrefix("iter=").toInt
      Some((it, spark.read.parquet(best.getAbsolutePath).select(col("id"), col("r"))))
    }
  }

  /** Fixed-iteration-count variant with no early exit — used by the unrolled
    * SQL oracle (same math, k iterations exactly).
    */
  def runFixed(spark: SparkSession, edges: DataFrame, k: Int, damp: Double = 0.85): DataFrame =
    run(spark, edges, damp = damp, tol = 0.0, maxIter = k).ranks
}
