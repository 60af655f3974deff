package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link prediction — the classic web-graph
  * "who should link to whom" scores over an undirected graph: for every
  * non-adjacent pair sharing at least one neighbor,
  *   common     = |N(a) ∩ N(b)|,
  *   jaccard    = common / |N(a) ∪ N(b)|,
  *   adamic_adar = Σ_{z ∈ N(a)∩N(b)} 1/ln(deg z).
  * (The GraphBLAS formulation is the masked A² of triangle counting with a
  * COMPLEMENT structural mask — pairs NOT in A; same wedge algebra, other
  * mask polarity. Reference mask semantics: `Source/GB_mxm.c`,
  * `GB_accum_mask.c`.)
  *
  * Plan shape at scale: one co-partitioned self-join of the undirected
  * edge list on the shared neighbor z — the SAME quadratic-in-degree wedge
  * intermediate triangle counting pays, carrying one extra double
  * (1/ln deg z, attached to z's rows by a per-vertex-sized join before the
  * wedge join) — then one partial-aggregated groupBy on the (a,b) pair and
  * one anti-join against the edge list to keep non-adjacent pairs only.
  * Degrees join per-vertex-sized at the end. Hub vertices fan out as
  * deg², exactly like tricount's wedges — cap with `maxDegree` (drop
  * wedge centers above the cap, the standard approximation at web scale;
  * 0 = exact).
  */
object LinkPrediction {

  /** (a, b, common, jaccard, adamic_adar) for non-adjacent pairs a<b with
    * ≥1 shared neighbor; `maxDegree` > 0 drops wedge CENTERS of larger
    * degree (documented approximation; endpoints are never dropped).
    */
  def run(spark: SparkSession, edges: DataFrame, maxDegree: Long = 0L): DataFrame = {
    val canon = edges.select(
        least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val und = canon.unionByName(canon.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy(col("a").as("id")).agg(count(lit(1)).as("deg"))

    // z-centered wedges (u < v through z), z carrying its 1/ln(deg) weight;
    // deg-1 vertices can never center a wedge (one neighbor), and filtering
    // them FIRST also keeps ln(1)=0 out of the divisor (ANSI mode errors)
    val zw = deg.filter(col("deg") >= 2).select(col("id").as("z"),
      (lit(1.0) / log(col("deg").cast("double"))).as("zw"))
    val centers = if (maxDegree > 0) zw.join(
        deg.filter(col("deg") <= maxDegree).select(col("id").as("z")), Seq("z"))
      else zw
    val nbrs = und.select(col("a").as("z"), col("b").as("u"))
      .join(centers, Seq("z"))
    val pairs = nbrs.alias("l")
      .join(nbrs.alias("r"), col("l.z") === col("r.z") && col("l.u") < col("r.u"))
      .select(col("l.u").as("a"), col("r.u").as("b"), col("l.zw").as("zw"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("common"), sum(col("zw")).as("aa"))
      .join(canon, Seq("a", "b"), "left_anti")

    pairs
      .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
      .select(col("a"), col("b"), col("common"),
        (col("common").cast("double") /
          (col("da") + col("db") - col("common")).cast("double")).as("jaccard"),
        col("aa").as("adamic_adar"))
  }

  /** Neighborhood Jaccard similarity for EXISTING edges (LAGraph's
    * SimilarityJaccard shape): (src, dst, common, jaccard) per canonical
    * edge, jaccard = |N(a)∩N(b)| / |N(a)∪N(b)| with the union counted as
    * deg(a)+deg(b)−common (endpoints included — the plain set formula).
    * Same one-wedge-join plan as [[run]], semi-joined TO the edge list
    * instead of anti-joined away from it; edges with zero common neighbors
    * report 0.
    */
  def edgeSimilarity(spark: SparkSession, edges: DataFrame): DataFrame = {
    val canon = edges.select(
        least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val und = canon.unionByName(canon.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy(col("a").as("id")).agg(count(lit(1)).as("deg"))

    val nbrs = und.select(col("a").as("z"), col("b").as("u"))
    val common = nbrs.alias("l")
      .join(nbrs.alias("r"), col("l.z") === col("r.z") && col("l.u") < col("r.u"))
      .select(col("l.u").as("a"), col("r.u").as("b"))
      .join(canon, Seq("a", "b"), "left_semi")
      .groupBy("a", "b").agg(count(lit(1)).as("common"))

    canon.join(common, Seq("a", "b"), "left")
      .select(col("a"), col("b"), coalesce(col("common"), lit(0L)).as("common"))
      .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
      .select(col("a").as("src"), col("b").as("dst"), col("common"),
        (col("common").cast("double") /
          (col("da") + col("db") - col("common")).cast("double")).as("jaccard"))
  }
}
