package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic GraphSAGE-style neighbor fanout sampling — the
  * graph-side training-data op (minibatch neighborhood construction for
  * GNN training over a web-scale link graph). The reference has no
  * sampling layer (its loops are exact); this is part of the
  * training-pipeline surface built on the same edge-table data model
  * (`Source/GB_mxm.c`-shaped joins, but top-k-truncated).
  *
  * Determinism: each directed edge gets the LCG priority
  * `(dst*48271 + src*2000003 + seed) mod 1e9+7` (injective-enough and
  * exactly mirrorable in ANSI SQL, like Coloring's priorities); a vertex
  * keeps its k smallest (priority, dst) neighbors. Re-running at any
  * parallelism yields bit-identical samples — the property a reproducible
  * training pipeline needs.
  *
  * Scale shape: exact per-vertex top-k WITHOUT a global window (a window
  * partitioned by src funnels every hub neighbor through one task). Phase
  * 1 computes top-k per (src, slot) over `salts` hash slots of the
  * neighbor set — map-side-combinable, hub work split `salts` ways; phase
  * 2 merges the ≤ salts·k survivors per vertex. Size `salts` so
  * maxDegree/salts rows fit a task comfortably (the phase-1 buffers hold
  * (long,long) structs). Both phases are plain hash aggregations — no
  * shuffle beyond the two groupBys, and the output is |V|·k rows.
  */
object NeighborSample {

  private def prio(seed: Long) =
    (col("dst") * 48271L + col("src") * 2000003L + lit(seed)) % 1000000007L

  /** ≤ `k` sampled out-neighbors per source: (src, rank, dst), rank 1..k
    * by ascending (priority, dst). Duplicate input edges are collapsed
    * first (the sample is over the neighbor SET).
    */
  def fanout(spark: SparkSession, edges: DataFrame, k: Int, seed: Long = 7L,
             salts: Int = 16): DataFrame = {
    require(k >= 1 && salts >= 1)
    val e = edges.select(col("src"), col("dst")).distinct()
      .withColumn("h", prio(seed))
    val partial = e
      .groupBy(col("src"), pmod(xxhash64(col("dst")), lit(salts)).as("slot"))
      .agg(slice(array_sort(collect_list(struct(col("h"), col("dst")))), 1, k)
        .as("part"))
    partial.groupBy(col("src"))
      .agg(slice(array_sort(flatten(collect_list(col("part")))), 1, k).as("top"))
      .select(col("src"), posexplode(col("top")))
      .select(col("src"), (col("pos") + 1).cast("long").as("rank"),
        col("col.dst").as("dst"))
  }

  /** Deterministic negative sampling for link-prediction training: per
    * source vertex, propose `m` LCG-indexed candidates over the
    * dense-ranked vertex universe, drop self-pairs and TRUE edges, keep the
    * first `k` by proposal index. May under-fill a vertex when proposals
    * collide with its neighbors — size `m` generously (the standard
    * rejection-sampling contract; exactly mirrorable in SQL, unlike
    * resample-until-k). Scale shape: the universe index is a distributed
    * range rank (no global window), proposals are |V|·m rows joined back by
    * index, and the per-src ranking window holds ≤ m rows per vertex.
    */
  def negatives(spark: SparkSession, edges: DataFrame, k: Int, m: Int,
                seed: Long = 7L): DataFrame = {
    require(k >= 1 && m >= k)
    val e = edges.select(col("src"), col("dst")).distinct()
    val verts = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    val idx = graft.core.Iterate.cut(
      graft.core.Ranking.denseRank(verts, "ridx", "id"))
    val n = idx.count()
    val ts = spark.range(m).select(col("id").as("t"))
    val props = idx.select(col("id").as("src"), col("ridx")).crossJoin(ts)
      .select(col("src"), col("t"),
        ((col("ridx") * 48271L + col("t") * 2000003L + lit(seed)) % n).as("cidx"))
      .join(idx.select(col("ridx").as("cidx"), col("id").as("neg")), Seq("cidx"))
      .filter(col("neg") =!= col("src"))
      .join(e.select(col("src"), col("dst").as("neg")), Seq("src", "neg"),
        "left_anti")
      // colliding proposals collapse to their earliest index (set semantics)
      .groupBy(col("src"), col("neg")).agg(min(col("t")).as("t"))
    import org.apache.spark.sql.expressions.Window
    props
      .withColumn("rnk", row_number()
        .over(Window.partitionBy(col("src")).orderBy(col("t"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("src"), col("rnk"), col("neg"))
  }

  /** Two-hop sampled neighborhood (root, h1, h2): fanout `k1` at the root,
    * then every hop-1 vertex contributes its own shared `k2`-sample
    * (GraphSAGE minibatch sharing — the per-vertex sample is computed once
    * and joined, not resampled per root, so hop-2 work is one |V|·k2-row
    * co-partitioned join, never |roots|·k1·deg).
    */
  def fanout2(spark: SparkSession, edges: DataFrame, k1: Int, k2: Int,
              seed: Long = 7L, salts: Int = 16): DataFrame = {
    val h1 = fanout(spark, edges, k1, seed, salts)
    val h2 = fanout(spark, edges, k2, seed + 1, salts)
    h1.select(col("src").as("root"), col("dst").as("h1"))
      .join(h2.select(col("src").as("h1"), col("dst").as("h2")), Seq("h1"))
      .select(col("root"), col("h1"), col("h2"))
  }
}
