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

    val n = closedWedges(spark, canon, parts).count()
    canon.unpersist(false)
    n
  }

  /** The SandiaDot2 core shared by [[run]] and [[estimate]]: the frame of
    * closing wedges a<b<c (one row per triangle) over a PERSISTED canonical
    * edge list.
    *
    * The wedge join's output is sized by Σ_b degU(b)·degL(b) — quadratic in
    * degree, NOT by the input — so the join's partition count must track the
    * INTERMEDIATE: one cheap aggregation estimates the wedge count and the
    * join runs at ~1.5M wedges/partition via an EXPLICIT
    * `repartition(wedgeParts, b)` of both join inputs (plan-local; the old
    * session-global `spark.sql.shuffle.partitions` mutation would race a
    * concurrent query — VERDICT r5 #5). Measured at sf0.1's K1000
    * co-supplier graph: 1.66e8 wedges, 22.3 s at parts=cores vs 14.7 s sized
    * (r5); capped at 16x to bound task-scheduling overhead.
    *
    * The closing mask semi-join picks its strategy deliberately (guide
    * §3.1): when the edge list fits (`graft.tricount.broadcastMaskMaxEdges`,
    * default 4M rows ≈ tens of MB hashed), it is BROADCAST, so the
    * wedge stream is generated, mask-probed and counted inside ONE stage —
    * the 1.66e8-row wedge exchange (the dominant shuffle of r5's plan)
    * disappears. Beyond the cap (cluster-scale graphs) both sides are
    * explicitly repartitioned by (a,c) at the same sized partition count —
    * the r5 shape, minus the conf mutation.
    */
  private[graft] def closedWedges(spark: SparkSession, canon: DataFrame,
                                  parts: Int): DataFrame = {
    // one setup pass: edge count (materializes the persisted canon) + id
    // bounds for the packed-key fast path below
    val stats = canon.agg(count(lit(1)).as("m"),
      min(col("lo")).as("mn"), max(col("hi")).as("mx")).collect()(0)
    val edgeCount = stats.getLong(0)
    val packable = edgeCount > 0 && !stats.isNullAt(1) &&
      stats.getLong(1) >= 0 && stats.getLong(2) < (1L << 31)
    val wedgeEst = canon
      .select(col("hi").as("b")).groupBy("b").agg(count(lit(1)).as("du"))
      .join(canon.select(col("lo").as("b")).groupBy("b").agg(count(lit(1)).as("dl")), Seq("b"))
      .agg(sum(col("du") * col("dl"))).collect()(0)
    val wedges0 = if (wedgeEst.isNullAt(0)) 0L else wedgeEst.getLong(0)
    val wedgeParts = math.max(parts, math.min(16L * parts, wedges0 / 1500000L)).toInt

    // wedges a<b<c from edges (a,b),(b,c); close with (a,c)
    val e1 = canon.select(col("lo").as("a"), col("hi").as("b"))
      .repartition(wedgeParts, col("b"))
    val e2 = canon.select(col("lo").as("b"), col("hi").as("c"))
      .repartition(wedgeParts, col("b"))
    val wedges = e1.join(e2, Seq("b")).select(col("a"), col("c"))
    val mask = canon.select(col("lo").as("a"), col("hi").as("c"))
    val bcastMax = spark.conf.get("graft.tricount.broadcastMaskMaxEdges",
      "4000000").toLong
    if (edgeCount <= bcastMax && packable)
      // pack the 2-long key into ONE long (ids proven < 2^31 above, so
      // (a << 32) + c is injective and positive): the broadcast relation
      // becomes a LongHashedRelation, whose primitive-key probe is ~15x
      // cheaper than the 2-long UnsafeRow-key probe (measured on the sf0.1
      // K1000 graph: 1.66e8 probes in 1.5-2.7 s packed vs 22-23 s struct)
      wedges.select((shiftleft(col("a"), 32) + col("c")).as("ac"))
        .join(broadcast(
          canon.select((shiftleft(col("lo"), 32) + col("hi")).as("ac"))),
          Seq("ac"), "left_semi")
    else if (edgeCount <= bcastMax)
      wedges.join(broadcast(mask), Seq("a", "c"), "left_semi")
    else
      wedges.repartition(wedgeParts, col("a"), col("c"))
        .join(mask.repartition(wedgeParts, col("a"), col("c")),
          Seq("a", "c"), "left_semi")
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
    val t = closedWedges(spark, canon, parts).count()
    canon.unpersist(false)
    import spark.implicits._
    Seq((m, t, invP * invP * invP, t * invP * invP * invP))
      .toDF("sampled_edges", "sampled_triangles", "scale", "estimate")
  }

  /** Per-edge triangle support (used by k-truss): for each canonical edge,
    * the number of triangles through it. Same closing-probe strategy ladder
    * as [[closedWedges]] (packed-long broadcast semi when the ids fit and
    * the edge list is broadcastable, struct-key broadcast next, shuffled
    * semi at cluster scale) — k-truss passes a CUT (cached-leaf) canon, so
    * the stats pass costs one cheap action per round.
    */
  def edgeSupport(canon: DataFrame): DataFrame = {
    val spark = canon.sparkSession
    val stats = canon.agg(count(lit(1)).as("m"),
      min(col("lo")).as("mn"), max(col("hi")).as("mx")).collect()(0)
    val m = stats.getLong(0)
    val packable = m > 0 && !stats.isNullAt(1) &&
      stats.getLong(1) >= 0 && stats.getLong(2) < (1L << 31)
    val bcastMax = spark.conf.get("graft.tricount.broadcastMaskMaxEdges",
      "4000000").toLong
    val e1 = canon.select(col("lo").as("a"), col("hi").as("b"))
    val e2 = canon.select(col("lo").as("b"), col("hi").as("c"))
    val wedges = e1.join(e2, Seq("b"))
    val tri =
      if (m <= bcastMax && packable)
        wedges.withColumn("ac", shiftleft(col("a"), 32) + col("c"))
          .join(broadcast(
            canon.select((shiftleft(col("lo"), 32) + col("hi")).as("ac"))),
            Seq("ac"), "left_semi")
          .select(col("a"), col("b"), col("c"))
      else if (m <= bcastMax)
        wedges.join(broadcast(canon.select(col("lo").as("a"), col("hi").as("c"))),
          Seq("a", "c"), "left_semi")
      else
        wedges.join(canon.select(col("lo").as("a"), col("hi").as("c")),
          Seq("a", "c"), "left_semi")
    // each triangle (a<b<c) contributes support to edges (a,b),(b,c),(a,c).
    // ONE explode pass over the triangle stream, not a 3-way union of
    // projections: a union's branches each re-execute the (expensive) wedge
    // join subtree — there is no exchange boundary to reuse — so the old
    // plan paid the join three times (guide §1.2 "don't compute things you
    // throw away"; measured 11.4 s union vs one-pass explode on sf0.1)
    tri.select(explode(array(
        struct(col("a").as("lo"), col("b").as("hi")),
        struct(col("b").as("lo"), col("c").as("hi")),
        struct(col("a").as("lo"), col("c").as("hi")))).as("e"))
      .groupBy(col("e.lo").as("lo"), col("e.hi").as("hi"))
      .agg(count(lit(1)).as("support"))
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
