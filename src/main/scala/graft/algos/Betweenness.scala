package graft.algos

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Iterate

/** Batched Brandes betweenness centrality — the classic multi-source
  * GraphBLAS showcase (LAGraph's `LAGr_Betweenness`; the reference defers
  * algorithms to LAGraph per `Demo/DO_NOT_BENCHMARK.txt`): all sources of a
  * batch advance TOGETHER as one (source, vertex) wavefront, which is
  * exactly the mxm-over-a-frontier-matrix formulation — and, in Spark
  * terms, one co-partitioned join per level instead of |batch| separate
  * BFS loops.
  *
  * Forward: level-synchronous BFS counting shortest paths —
  * σ(s,v) = Σ_{u∈pred(v)} σ(s,u), pred = neighbors one level shallower.
  * Backward: dependency accumulation down the levels —
  * δ(s,u) = σ(s,u) · Σ_{v∈succ(u)} (1+δ(s,v))/σ(s,v);
  * bc(v) = Σ_s δ(s,v) over non-source levels, halved (each unordered pair
  * is counted from both endpoints when the batch is all vertices).
  *
  * Scale shape: the graph is symmetrized once, hash-partitioned by src and
  * persisted; each forward level is frontier ⋈ adj (broadcast when the
  * wavefront is small, shuffle-hash when it saturates) + one partial
  * aggregation; each backward level joins two adjacent level slices. State
  * never lives on the driver; per-level plans are cut to leaf size
  * (`Iterate.cut`), the same discipline as [[BFS]]/[[PageRank]]. The
  * (source × vertex) wavefront is the memory bound — batch the sources
  * (LAGraph does the same) to fit the cluster.
  */
object Betweenness {

  /** The batched level-synchronous forward pass shared by [[run]] and
    * [[runEdges]]: (symmetrized cached adjacency, vertex table, per-level
    * (s, v, sigma) slices).
    */
  private def forwardPass(spark: SparkSession, edges: DataFrame,
                          sources: Seq[Long], maxIter: Int)
      : (DataFrame, DataFrame, ArrayBuffer[DataFrame]) = {
    import spark.implicits._
    val adj = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verts = Iterate.cut(adj.select(col("src").as("id")).distinct())

    val srcDf =
      if (sources.nonEmpty) sources.toDF("s")
      else verts.select(col("id").as("s"))

    val levels = ArrayBuffer[DataFrame]()
    levels += Iterate.cut(
      srcDf.select(col("s"), col("s").as("v"), lit(1.0).as("sigma")))
    var visited = levels.head.select("s", "v")
    var frontierSize = 1L
    var l = 0
    while (frontierSize > 0 && l < maxIter) {
      l += 1
      val nextPre = levels.last
        .join(adj, levels.last("v") === adj("src"))
        .groupBy(col("s"), col("dst").as("v2"))
        .agg(sum(col("sigma")).as("sigma"))
        .withColumnRenamed("v2", "v")
        .join(visited, Seq("s", "v"), "left_anti")
        .observe(s"bc_fwd_$l", count(lit(1)).as("n"))
      val next = Iterate.cut(nextPre)
      frontierSize = Iterate.observedLong(nextPre, s"bc_fwd_$l")(next.count())
      if (frontierSize > 0) {
        levels += next
        val nv = Iterate.cut(visited.unionByName(next.select("s", "v")))
        Iterate.free(visited)
        visited = nv
      }
    }
    (adj, verts, levels)
  }

  /** Betweenness over an undirected view of `edges` from a batch of source
    * vertices (all vertices when `sources` is empty — exact BC). Returns
    * (id, bc) for every vertex of the symmetrized graph.
    */
  def run(spark: SparkSession, edges: DataFrame, sources: Seq[Long] = Nil,
          maxIter: Int = 10000): DataFrame = {
    import spark.implicits._
    val (adj, verts, levels) = forwardPass(spark, edges, sources, maxIter)

    // ---- backward: delta(l) from delta(l+1), accumulate bc ---------------
    // deepest level has delta = 0 and contributes sigma-weighted terms only
    var delta = levels.last.select(col("s"), col("v"), col("sigma"),
      lit(0.0).as("delta"))
    var acc = if (levels.size > 1) delta.select(col("v"), col("delta"))
              else spark.emptyDataset[(Long, Double)].toDF("v", "delta")
    for (li <- (levels.size - 2) to 1 by -1) {
      val terms = delta
        .select(col("s"), col("v"),
          ((lit(1.0) + col("delta")) / col("sigma")).as("t"))
        .join(adj, delta("v") === adj("src"))
        .groupBy(col("s"), col("dst").as("u"))
        .agg(sum(col("t")).as("tsum"))
      val cur = Iterate.cut(levels(li)
        .join(terms, levels(li)("s") === terms("s") &&
          levels(li)("v") === terms("u"), "left")
        .select(levels(li)("s"), levels(li)("v"), levels(li)("sigma"),
          (coalesce(col("tsum"), lit(0.0)) * col("sigma")).as("delta")))
      acc = Iterate.cut(acc.unionByName(cur.select(col("v"), col("delta"))))
      delta = cur
    }

    val bc = verts
      .join(acc.groupBy("v").agg(sum(col("delta")).as("bcsum")),
        verts("id") === col("v"), "left")
      .select(col("id"), (coalesce(col("bcsum"), lit(0.0)) / 2.0).as("bc"))
    adj.unpersist(false)
    bc
  }

  /** EDGE betweenness (Girvan–Newman centrality — the community-detection
    * / graph-sparsification companion of [[run]]): the dependency flowing
    * over each shortest-path-DAG edge, summed over the source batch. Same
    * forward pass; in the backward sweep each (u at level l) → (v at level
    * l+1) tree edge carries σ(s,u)·(1+δ(s,v))/σ(s,v), accumulated per
    * CANONICAL undirected edge (least, greatest) and halved under the
    * all-sources batch (each unordered (s,t) pair is seen from both ends),
    * so on a path graph edge (i,i+1) scores exactly (i+1)·(n−1−i). The
    * sweep runs one level DEEPER than the vertex variant — source-adjacent
    * edges carry dependency even though source vertices score zero.
    *
    * Returns (u, v, ebc) with u < v for every edge of the symmetrized
    * graph reached by the batch. Scale shape identical to [[run]]: one
    * co-partitioned join per level, per-edge accumulation is the same
    * partial hash aggregate, nothing driver-sized.
    */
  def runEdges(spark: SparkSession, edges: DataFrame, sources: Seq[Long] = Nil,
               maxIter: Int = 10000): DataFrame = {
    import spark.implicits._
    val (adj, _, levels) = forwardPass(spark, edges, sources, maxIter)

    var delta = levels.last.select(col("s"), col("v"), col("sigma"),
      lit(0.0).as("delta"))
    var eacc = spark.emptyDataset[(Long, Long, Double)].toDF("u", "v", "c")
    for (li <- (levels.size - 2) to 0 by -1) {
      val t = delta.select(col("s"), col("v").as("dv"),
        ((lit(1.0) + col("delta")) / col("sigma")).as("t"))
      // tree edges: u ∈ pred(dv) ⟺ (u, dv) adjacent ∧ u one level shallower
      val pairs = t.join(adj, col("dv") === adj("src"))
        .select(col("s"), col("dv"), col("dst").as("u"), col("t"))
        .join(levels(li).select(col("s"), col("v").as("u"),
          col("sigma").as("su")), Seq("s", "u"))
      val contrib = pairs.select(
        least(col("u"), col("dv")).as("u"), greatest(col("u"), col("dv")).as("v"),
        (col("su") * col("t")).as("c"))
      eacc = Iterate.cut(eacc.unionByName(contrib))
      if (li > 0) {
        val terms = pairs.groupBy(col("s"), col("u")).agg(sum(col("t")).as("tsum"))
        delta = Iterate.cut(levels(li)
          .join(terms, levels(li)("s") === terms("s") &&
            levels(li)("v") === terms("u"), "left")
          .select(levels(li)("s"), levels(li)("v"), levels(li)("sigma"),
            (coalesce(col("tsum"), lit(0.0)) * col("sigma")).as("delta")))
      }
    }
    val out = eacc.groupBy("u", "v").agg((sum(col("c")) / 2.0).as("ebc"))
    adj.unpersist(false)
    out
  }
}
