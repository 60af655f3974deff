package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-row structural profile of an undirected graph — the "know your
  * graph before you run on it" primitive (the reference surfaces the same
  * scalars piecemeal: GrB_Matrix_nvals / nrows, `GrB.entries 'degree'`,
  * LAGraph triangle count): vertex/edge counts, degree min/max/mean,
  * density, wedge count (Σ d(d-1)/2) and triangle count, and the global
  * clustering coefficient 3·tri/wedges.
  *
  * Plan shape: one canonical distinct pass, one degree aggregation with
  * every degree scalar partial-aggregated map-side, and [[TriangleCount]]'s
  * wedge-join count for tri — three shuffles total, all
  * output-row-bounded. Nothing here is quadratic except the triangle
  * wedge join tricount itself already pays.
  */
object GraphStats {

  def run(spark: SparkSession, edges: DataFrame): DataFrame = {
    val canon = edges.select(
        least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val und = canon.unionByName(canon.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy(col("a").as("id")).agg(count(lit(1)).as("deg"))

    val degStats = deg.agg(
      count(lit(1)).as("n"),
      min(col("deg")).as("min_deg"),
      max(col("deg")).as("max_deg"),
      sum(col("deg")).as("deg_sum"),
      sum(col("deg") * (col("deg") - 1) / 2).cast("double").as("wedges"))

    // triangles a<b<c: same wedge algebra as TriangleCount.run
    val e1 = canon.select(col("a").as("x"), col("b").as("y"))
    val e2 = canon.select(col("a").as("y2"), col("b").as("z"))
    val tris = e1.join(e2, col("y") === col("y2"))
      .select(col("x"), col("z"))
      .join(canon, col("x") === col("a") && col("z") === col("b"), "left_semi")
      .agg(count(lit(1)).as("triangles"))

    degStats.crossJoin(tris).select(
      col("n"),
      (col("deg_sum") / 2).cast("long").as("m"),
      col("min_deg"), col("max_deg"),
      (col("deg_sum").cast("double") / col("n")).as("avg_deg"),
      (col("deg_sum").cast("double") / (col("n").cast("double") * (col("n") - 1)))
        .as("density"),
      col("wedges").cast("long").as("wedges"),
      col("triangles"),
      when(col("wedges") > 0,
        lit(3.0) * col("triangles") / col("wedges")).otherwise(0.0)
        .as("global_cc"))
  }
}
