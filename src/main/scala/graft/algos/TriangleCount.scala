package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Triangle counting with the reference's SandiaDot2 semantics
  * (GraphBLAS/@GrB/tricount.m:80-102): on the symmetric, zero-diagonal
  * pattern, count nnz-weighted C<U> = L'*U with the +.oneb (pair) semiring,
  * where L = tril(A,-1), U = triu(A,1); total triangles = reduce(+, C).
  *
  * Spark shape: canonicalize each undirected edge to (lo,hi); wedges are the
  * self-join of the canonical edge list; the structural MASK (the <U> of
  * SandiaDot2 — GB_AxB_dot3.c computes only where the mask has entries) is the
  * final left-semi join of wedges against edges, pushed BEFORE any counting so
  * the plan never materializes non-closing wedges past the join.
  *
  * Degree ordering (tricount.m:57-78 does a full degree sort): we orient each
  * wedge at its lowest-id vertex after canonicalization; for skewed graphs the
  * optional `degreeOrder` relabels vertices by ascending degree first, which
  * bounds wedge counts by arboricity-style arguments — the same effect as the
  * reference's sort-by-degree permutation.
  */
object TriangleCount {

  /** Total triangle count. */
  def run(spark: SparkSession, edges: DataFrame, degreeOrder: Boolean = false,
          numPartitions: Int = 0): Long = {
    val parts = if (numPartitions > 0) numPartitions
                else spark.conf.get("spark.sql.shuffle.partitions").toInt

    // simple undirected graph: canonical (lo,hi), no self-loops, distinct
    val base = edges.select(
        least(col("src"), col("dst")).as("lo"), greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()

    val canon = (if (degreeOrder) relabelByDegree(base) else base)
      .repartition(parts, col("lo"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // The wedge join's output is sized by Σ_b degU(b)·degL(b) — quadratic in
    // degree, NOT by the input — so the shuffle partition count must track
    // the INTERMEDIATE: one cheap aggregation estimates the wedge count and
    // the join stages run at ~1.5M wedges/partition (AQE can coalesce a
    // too-fine shuffle but never split a too-coarse one; measured at sf0.1's
    // K1000 co-supplier graph: 1.66e8 wedges, 22.3 s at parts=cores vs
    // 14.7 s sized; capped at 16x to bound task-scheduling overhead).
    val wedgeEst = canon
      .select(col("hi").as("b")).groupBy("b").agg(count(lit(1)).as("du"))
      .join(canon.select(col("lo").as("b")).groupBy("b").agg(count(lit(1)).as("dl")), Seq("b"))
      .agg(sum(col("du") * col("dl"))).collect()(0)
    val wedges0 = if (wedgeEst.isNullAt(0)) 0L else wedgeEst.getLong(0)
    val wedgeParts = math.max(parts, math.min(16L * parts, wedges0 / 1500000L)).toInt

    // wedges a<b<c from edges (a,b),(b,c); close with (a,c)
    val e1 = canon.select(col("lo").as("a"), col("hi").as("b"))
    val e2 = canon.select(col("lo").as("b"), col("hi").as("c"))
    val confKey = "spark.sql.shuffle.partitions"
    val prevParts = spark.conf.get(confKey)
    spark.conf.set(confKey, wedgeParts.toString)
    val n = try {
      val wedges = e1.join(e2, Seq("b")).select(col("a"), col("c"))
      val closed = wedges.join(
        canon.select(col("lo").as("a"), col("hi").as("c")), Seq("a", "c"), "left_semi")
      closed.count()
    } finally spark.conf.set(confKey, prevParts)
    canon.unpersist(false)
    n
  }

  /** DOULION-style sampled triangle estimate (Tsourakakis et al., KDD 2009)
    * — the tunable-cost scale path for the census: sparsify the canonical
    * edge list by a DETERMINISTIC arithmetic coin, count triangles on the
    * sample, scale by invP³. Expected wedge-join work drops by ~invP² and
    * the estimate's variance is the DOULION bound; determinism means any
    * engine — and the SQL oracle — reproduces the exact same sample and
    * count. The coin is NONLINEAR (a product of per-endpoint affine maps
    * mod the prime 1000003): a linear lo·A+hi·B residue would make the
    * sample a union of modular id classes — e.g. mod 2 it keeps only
    * same-parity edges, whose triangles are wildly unrepresentative. Both
    * factors are reduced mod the prime BEFORE multiplying, so every
    * intermediate stays < 2^40 for arbitrary 64-bit ids (no overflow in
    * either engine). One row: (sampled_edges, sampled_triangles, scale,
    * estimate).
    */
  def estimate(spark: SparkSession, edges: DataFrame, invP: Long,
               numPartitions: Int = 0): DataFrame = {
    require(invP >= 1, "invP must be >= 1")
    val parts = if (numPartitions > 0) numPartitions
                else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val M = 1000003L
    val coin = (((col("lo") % M) * 48271L + 11L) % M
      * (((col("hi") % M) * 7919L + 7L) % M)) % M % invP
    val canon = edges.select(
        least(col("src"), col("dst")).as("lo"), greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
      .filter(coin === 0L)
      .repartition(parts, col("lo"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val m = canon.count()
    val e1 = canon.select(col("lo").as("a"), col("hi").as("b"))
    val e2 = canon.select(col("lo").as("b"), col("hi").as("c"))
    val t = e1.join(e2, Seq("b"))
      .join(canon.select(col("lo").as("a"), col("hi").as("c")), Seq("a", "c"), "left_semi")
      .count()
    canon.unpersist(false)
    import spark.implicits._
    Seq((m, t, invP * invP * invP, t * invP * invP * invP))
      .toDF("sampled_edges", "sampled_triangles", "scale", "estimate")
  }

  /** Per-edge triangle support (used by k-truss): for each canonical edge,
    * the number of triangles through it.
    */
  def edgeSupport(canon: DataFrame): DataFrame = {
    val e1 = canon.select(col("lo").as("a"), col("hi").as("b"))
    val e2 = canon.select(col("lo").as("b"), col("hi").as("c"))
    val tri = e1.join(e2, Seq("b"))
      .join(canon.select(col("lo").as("a"), col("hi").as("c")), Seq("a", "c"), "left_semi")
    // each triangle (a<b<c) contributes support to edges (a,b),(b,c),(a,c)
    tri.select(col("a").as("lo"), col("b").as("hi"))
      .union(tri.select(col("b").as("lo"), col("c").as("hi")))
      .union(tri.select(col("a").as("lo"), col("c").as("hi")))
      .groupBy("lo", "hi").agg(count(lit(1)).as("support"))
  }

  /** Relabel vertices by ascending degree (dense ranks), then re-canonicalize —
    * the Spark analogue of tricount.m:57-78's descending-degree permutation
    * (ascending here because our wedge pivot is the LOW endpoint).
    */
  def relabelByDegree(canon: DataFrame): DataFrame = {
    val deg = canon.select(col("lo").as("id")).union(canon.select(col("hi").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // deterministic total order (deg, id) via distributed range-partitioned
    // ranking (graft.core.Ranking) — a global window would funnel every
    // vertex through one task
    val ranks = graft.core.Ranking.denseRank(deg, "rank", "deg", "id")
      .select(col("id"), col("rank"))
    canon
      .join(ranks.select(col("id").as("lo"), col("rank").as("rlo")), Seq("lo"))
      .join(ranks.select(col("id").as("hi"), col("rank").as("rhi")), Seq("hi"))
      .select(least(col("rlo"), col("rhi")).as("lo"), greatest(col("rlo"), col("rhi")).as("hi"))
  }
}
