package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Iterate

/** Label-propagation community detection (north rule): synchronous rounds;
  * each vertex adopts the most frequent label among its neighbors, ties
  * broken by the SMALLEST label so the whole run is deterministic and exactly
  * reproducible (SURVEY.md §2.10 "deterministic min tie-break").
  *
  * Each round = one join (gather neighbor labels) + one two-level hash-agg
  * (count per (vertex,label), then max_by with min-label tie-break). The
  * count-then-argmax is the semiring view: plus.pair to count, max.second
  * with tie-break to pick — all shuffle-partial-aggregated by Spark.
  * Synchronous LPA can 2-cycle on bipartite-ish structures, so the loop also
  * stops after `maxIter` (reported fixpoint-or-maxit, like pagerank.m's
  * convergence warning).
  */
object LabelPropagation {

  /** @param checkpointDir snapshot/resume of the label state every
    *                       `checkpointEvery` rounds (graft.core.Checkpoint).
    */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 20,
          numPartitions: Int = 0,
          checkpointDir: Option[String] = None, checkpointEvery: Int = 10): DataFrame =
    // fixed layout + known partition counts: AQE only adds stage barriers
    Iterate.withoutAQE(spark)(runLoop(spark, edges, maxIter, numPartitions,
      checkpointDir, checkpointEvery))

  private def runLoop(spark: SparkSession, edges: DataFrame, maxIter: Int,
          numPartitions: Int,
          checkpointDir: Option[String], checkpointEvery: Int): DataFrame = {
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val parts = if (numPartitions > 0) numPartitions
                else spark.conf.get("spark.sql.shuffle.partitions").toInt

    // repartition(src) FIRST: hash(src) satisfies the distinct agg's
    // ClusteredDistribution(src,dst) (subset rule), so symmetrize+dedup is
    // ONE exchange, not two — and the layout is keyed on the PER-ITERATION
    // JOIN KEY (src), so every round's gather join against the hash(id)
    // label state is co-partitioned: r5's plan re-shuffled the whole edge
    // table by src EVERY round because und was laid out by dst (the dst
    // grouping never reused that layout anyway — the gather join's output
    // partitioning replaced it). One data-sized exchange per round removed
    // (guide §2.4), plus the vertex-universe distinct below reuses hash(src)
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(parts, col("src"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    val vertices = und.select(col("src").as("id")).distinct()
    // labels is referenced twice per iteration: cut() keeps plans leaf-sized
    val (startIter, l0) = checkpointDir
      .flatMap(graft.core.Checkpoint.newest(spark, _, Seq("id", "label")))
      .getOrElse((0, vertices.select(col("id"), col("id").as("label"))))
    var labels = Iterate.cutKeyed(l0, parts, "id")

    var iter = startIter
    var changed = 1L
    while (iter < maxIter && changed > 0) {
      val t0 = System.nanoTime()
      // histogram of neighbor labels per vertex...
      val hist = und
        .join(labels.select(col("id").as("src"), col("label").as("l")), Seq("src"))
        .groupBy(col("dst"), col("l")).agg(count(lit(1)).as("cnt"))
      // ...then deterministic argmax: max count, then min label. max_by with a
      // composite orderable key: struct(cnt, -l) compares lexicographically.
      val best = hist.groupBy(col("dst").as("id"))
        .agg(max(struct(col("cnt"), negate(col("l")).as("nl"))).as("m"))
        .select(col("id"), negate(col("m.nl")).as("nlabel"))

      // changed-count observed during the state materialization (no extra job)
      val merged = labels.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("nlabel"), col("label")).as("label"),
          (coalesce(col("nlabel"), col("label")) =!= col("label")).as("chg"))
        .observe(s"lpa_$iter", sum(when(col("chg"), 1L).otherwise(0L)).as("changed"))
      val next = Iterate.cutKeyed(merged, parts, "id")
      changed = Iterate.observedLong(merged, s"lpa_$iter")(
        next.filter(col("chg")).count())
      Iterate.free(labels)
      labels = next
      iter += 1
      checkpointDir.foreach { dir =>
        graft.core.Checkpoint.logMetric(spark, dir, "iter" -> iter.toLong,
          "changed" -> changed, "millis" -> (System.nanoTime() - t0) / 1000000)
        if (iter % checkpointEvery == 0 || changed == 0 || iter == maxIter)
          graft.core.Checkpoint.write(labels.select(col("id"), col("label")), dir, iter)
      }
    }
    und.unpersist(false)
    labels.select(col("id"), col("label"))
  }

  /** Fixed-iteration-count variant: exactly `k` synchronous rounds, no
    * convergence action — the SQL-oracle-checkable unrolled form (same shape
    * as PageRank.runFixed). Identical per-round math to run(); converged
    * rounds are no-ops, so k >= the fixpoint depth gives the fixpoint.
    */
  def runFixed(spark: SparkSession, edges: DataFrame, k: Int,
               numPartitions: Int = 0): DataFrame = Iterate.withoutAQE(spark) {
    val parts = if (numPartitions > 0) numPartitions
                else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // same src-keyed one-exchange layout as runLoop (see the comment there)
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(parts, col("src"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val vertices = und.select(col("src").as("id")).distinct()
    var labels = Iterate.cutKeyed(
      vertices.select(col("id"), col("id").as("label")), parts, "id")
    for (_ <- 1 to k) {
      val hist = und
        .join(labels.select(col("id").as("src"), col("label").as("l")), Seq("src"))
        .groupBy(col("dst"), col("l")).agg(count(lit(1)).as("cnt"))
      val best = hist.groupBy(col("dst").as("id"))
        .agg(max(struct(col("cnt"), negate(col("l")).as("nl"))).as("m"))
        .select(col("id"), negate(col("m.nl")).as("nlabel"))
      val next = Iterate.cutKeyed(labels.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("nlabel"), col("label")).as("label")),
        parts, "id")
      Iterate.free(labels)
      labels = next
    }
    und.unpersist(false)
    labels.select(col("id"), col("label"))
  }
}
