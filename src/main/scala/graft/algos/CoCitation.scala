package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Co-citation and bibliographic coupling — the two classic DIRECTED
  * link-analysis pair measures (Small 1973 / Kessler 1963; the symmetric
  * companions of HITS on a web graph):
  *
  *   cocitation(a,b)  = |{z : z→a ∧ z→b}|   (cited together — A'A off-diag)
  *   coupling(a,b)    = |{z : a→z ∧ b→z}|   (cite the same things — AA')
  *
  * In GraphBLAS terms these are the off-diagonal entries of AᵀA and AAᵀ
  * under the plus-times semiring (reference: `Source/GB_mxm.c`); computed
  * here as a single self-join on the shared endpoint — the same wedge plan
  * as triangle counting, WITHOUT materializing the dense product matrix.
  *
  * Scale: the wedge fan-out is quadratic in the shared endpoint's degree
  * (out-degree for co-citation's citing page z, in-degree for coupling's
  * cited page z). On a web graph the in-degree tail is extreme (popular
  * pages), so `maxDegree` caps the wedge CENTER degree — dropped centers
  * are the standard approximation at 100 TB (a page cited by 10⁷ others
  * co-cites 10¹⁴ pairs; those pairs carry no discrimination anyway, the
  * same reason IDF down-weights stop-words). 0 = exact.
  */
object CoCitation {

  /** (a, b, n) with a<b: number of common citers, pairs with ≥1 only. */
  def cocitation(spark: SparkSession, edges: DataFrame,
                 maxDegree: Long = 0L): DataFrame =
    wedgePairs(edges.select(col("src").as("z"), col("dst").as("u")), maxDegree)

  /** (a, b, n) with a<b: number of common citations, pairs with ≥1 only. */
  def coupling(spark: SparkSession, edges: DataFrame,
               maxDegree: Long = 0L): DataFrame =
    wedgePairs(edges.select(col("dst").as("z"), col("src").as("u")), maxDegree)

  /** Bipartite butterfly (4-cycle) count: Σ_{a<b, src side} C(n_ab, 2) over
    * the common-neighbor counts — the bipartite clustering primitive
    * (Wang et al., "Butterfly Counting in Bipartite Networks"). Reuses the
    * capped wedge plan; the C(n,2) fold is exact long arithmetic
    * (shiftright, no FP division).
    */
  def butterflies(spark: SparkSession, edges: DataFrame,
                  maxDegree: Long = 0L): DataFrame =
    coupling(spark, edges, maxDegree)
      .agg(coalesce(sum(shiftright(col("n") * (col("n") - 1), 1)), lit(0L))
        .as("butterflies"))

  // one co-partitioned self-join on the wedge center z; count per (a,b) pair
  // with map-side partial aggregation — never a per-center array
  private def wedgePairs(zu: DataFrame, maxDegree: Long): DataFrame = {
    val e = zu.filter(col("z") =!= col("u")).distinct()
    val kept = if (maxDegree > 0) {
      val ok = e.groupBy("z").agg(count(lit(1)).as("d"))
        .filter(col("d") <= maxDegree).select("z")
      e.join(ok, Seq("z"), "left_semi")
    } else e
    kept.alias("l")
      .join(kept.alias("r"), col("l.z") === col("r.z") && col("l.u") < col("r.u"))
      .select(col("l.u").as("a"), col("r.u").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
  }
}
