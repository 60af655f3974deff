package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Iterate

/** k-truss (GraphBLAS/@GrB/ktruss.m): iterate C<C> = C*C (plus-and semiring —
  * per surviving edge, count common neighbors = triangle support), keep edges
  * with support >= k-2 (select '>=', ktruss.m:83-88), fixpoint when the edge
  * count stops changing (ktruss.m:79-90).
  *
  * Spark shape: support = the masked wedge-join of TriangleCount.edgeSupport
  * (the <C> mask = left-semi against the surviving edges); each round
  * filters, then recomputes on the shrunken graph. Returns the canonical
  * (lo,hi) edges of the k-truss.
  */
object KTruss {

  def run(spark: SparkSession, edges: DataFrame, k: Int, maxIter: Int = 100,
          numPartitions: Int = 0, checkpointDir: Option[String] = None,
          checkpointEvery: Int = 10): DataFrame = {
    require(k >= 3, "k-truss needs k >= 3")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    // the loop state IS the surviving edge set, so the snapshot is the
    // canonical (lo,hi) table; resuming simply continues peeling from it
    // (the filter is monotone — rounds already applied are never re-done)
    val resumed = checkpointDir
      .flatMap(graft.core.Checkpoint.newest(spark, _, Seq("lo", "hi"), s"k=$k"))
    var canon = resumed.map(r => canonicalize(spark,
        r._2.select(col("lo").as("src"), col("hi").as("dst")), numPartitions))
      .getOrElse(canonicalize(spark, edges, numPartitions))
    var nvals = canon.count()
    var iter = resumed.map(_._1).getOrElse(0)
    var stable = false
    while (!stable && iter < maxIter && nvals > 0) {
      val t0 = System.nanoTime()
      val (kept, newN) = round(canon, k)
      stable = newN == nvals
      canon = kept
      nvals = newN
      iter += 1
      checkpointDir.foreach { dir =>
        graft.core.Checkpoint.logMetric(spark, dir, "iter" -> iter.toLong,
          "edges" -> nvals, "millis" -> (System.nanoTime() - t0) / 1000000)
        if (iter % checkpointEvery == 0 || stable || iter == maxIter)
          graft.core.Checkpoint.write(canon.select(col("lo"), col("hi")),
            dir, iter, s"k=$k")
      }
    }
    canon
  }

  /** Fixed-round variant: exactly `rounds` support-filter rounds, no
    * fixpoint detection — the SQL-oracle-checkable unrolled form (same
    * per-round math; converged rounds are no-ops, so the Spark query and the
    * unrolled oracle agree by construction).
    */
  def runFixed(spark: SparkSession, edges: DataFrame, k: Int, rounds: Int,
               numPartitions: Int = 0): DataFrame = {
    require(k >= 3, "k-truss needs k >= 3")
    var canon = canonicalize(spark, edges, numPartitions)
    for (_ <- 1 to rounds) canon = round(canon, k)._1
    canon
  }

  /** Simple undirected canonical edges, cut (it is referenced 4x per round:
    * 3x in edgeSupport + the semi-join — graft.core.Iterate).
    */
  private def canonicalize(spark: SparkSession, edges: DataFrame,
                           numPartitions: Int): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
                else spark.conf.get("spark.sql.shuffle.partitions").toInt
    Iterate.cut(edges.select(
        least(col("src"), col("dst")).as("lo"), greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
      .repartition(parts, col("lo")))
  }

  /** One support-filter round; the surviving-edge count is observed during
    * the cut pass (no extra job). Frees the superseded state.
    */
  private def round(canon: DataFrame, k: Int): (DataFrame, Long) = {
    val support = TriangleCount.edgeSupport(canon)
    val keptPre = canon.join(
        support.filter(col("support") >= k - 2), Seq("lo", "hi"), "left_semi")
      .observe(s"ktruss_${System.identityHashCode(canon)}", count(lit(1)).as("n"))
    val kept = Iterate.cut(keptPre)
    val n = Iterate.observedLong(
      keptPre, s"ktruss_${System.identityHashCode(canon)}")(kept.count())
    Iterate.free(canon)
    (kept, n)
  }

  /** Full truss decomposition: (src, dst, trussness) per canonical edge,
    * where trussness is the largest k for which the edge survives in the
    * k-truss (edges in no triangle get the conventional 2). Same level-peel
    * shape as [[KCore.coreness]] — O(max trussness) outer levels, each
    * level a [[run]]-style support fixpoint over the SHRINKING survivor
    * set, so total work tracks the peel, not levels × input.
    */
  def trussness(spark: SparkSession, edges: DataFrame, maxK: Int = 1000,
                numPartitions: Int = 0): DataFrame = {
    var canon = canonicalize(spark, edges, numPartitions)
    var nvals = canon.count()
    // level-start snapshot, persisted + materialized BEFORE round() frees
    // the canon leaf it projects from (same contract as KCore.coreness)
    var alive = canon.select(col("lo"), col("hi"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    alive.count()
    var out: DataFrame = null
    var k = 3
    while (nvals > 0 && k <= maxK) {
      var stable = false
      while (!stable && nvals > 0) {
        val (kept, newN) = round(canon, k)
        stable = newN == nvals
        canon = kept
        nvals = newN
      }
      val surv = canon.select(col("lo"), col("hi"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      surv.count()
      val peeled = alive.join(surv, Seq("lo", "hi"), "left_anti")
        .select(col("lo"), col("hi"), lit(k - 1).cast("long").as("trussness"))
      out = if (out == null) peeled else out.unionByName(peeled)
      out = Iterate.cut(out)
      alive.unpersist(false)
      alive = surv
      k += 1
    }
    // maxK reached with survivors: their trussness is >= maxK — cap there
    val res =
      if (nvals > 0) {
        val capped = alive.select(col("lo"), col("hi"),
          lit(maxK).cast("long").as("trussness"))
        if (out == null) capped else out.unionByName(capped)
      } else if (out == null)
        alive.select(col("lo"), col("hi"), lit(2L).as("trussness"))
      else out
    // materialize before dropping alive's blocks (res may project from them)
    val cut = Iterate.cut(
      res.select(col("lo").as("src"), col("hi").as("dst"), col("trussness")))
    alive.unpersist(false)
    cut
  }
}
