package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-vertex local clustering coefficient — the LAGraph algorithm-layer
  * companion to [[TriangleCount]] (the reference defers algorithms to
  * LAGraph per `Demo/DO_NOT_BENCHMARK.txt`; triangle machinery per
  * `Source/GB_mxm.c` masked-multiply semantics):
  * lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)), 0 when deg < 2.
  *
  * Plan shape: one canonical lo<hi edge list (as [[TriangleCount]]), one
  * wedge self-join + one semi-join mask to enumerate triangles, then each
  * triangle (a<b<c) is attributed to its three corners with a 3-row
  * explode BEFORE the per-vertex aggregation — so the per-vertex count is
  * a partial-aggregated shuffle of (vertex, n) rows, and the quadratic
  * wedge intermediate is the same one tricount already pays, never more.
  * Degrees ride a separate (vertex, d) aggregation; the final join is
  * per-vertex-sized.
  */
object ClusteringCoefficient {

  /** (id, degree, triangles, lcc) for every vertex of the undirected view
    * of `edges` (self-loops dropped, duplicate edges collapsed).
    */
  def run(spark: SparkSession, edges: DataFrame): DataFrame = {
    val canon = edges.select(
        least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val und = canon.unionByName(canon.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy(col("a").as("id")).agg(count(lit(1)).as("deg"))

    // triangles a<b<c: wedge (a,b)+(b,c) closed by (a,c)
    val e1 = canon.select(col("a").as("x"), col("b").as("y"))
    val e2 = canon.select(col("a").as("y2"), col("b").as("z"))
    val wedges = e1.join(e2, col("y") === col("y2"))
      .select(col("x"), col("y"), col("z"))
    val tris = wedges.join(canon,
        wedges("x") === canon("a") && wedges("z") === canon("b"), "left_semi")
    val perVertex = tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("tri"))

    deg.join(perVertex, Seq("id"), "left")
      .na.fill(0L, Seq("tri"))
      .select(col("id"), col("deg"), col("tri"),
        when(col("deg") >= 2,
          col("tri").cast("double") * 2.0 /
            (col("deg").cast("double") * (col("deg").cast("double") - 1.0)))
          .otherwise(0.0).as("lcc"))
  }
}
