package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Iterate

/** Transitive reduction of a DAG — the minimal equivalent graph (Aho,
  * Garey & Ullman 1972): drop every edge (u,v) for which a length-≥2
  * u→v path exists. On a dependency graph this is exactly "prune the
  * redundant imports": the reduction preserves all reachability with the
  * fewest edges, and for a DAG it is unique.
  *
  * The closure is built by PATH DOUBLING (R ← R ∪ R·R), so a DAG of
  * longest-path length L needs ⌈log₂ L⌉ joins, not L — each round is one
  * self-equi-join + distinct, both keyed exchanges. Transitive closure is
  * inherently |pairs|-sized; the 100 TB design point is the CONDENSED
  * dependency DAG ([[SCC.condense]] / the repo-level quotient graph), whose
  * vertex count is orders below the raw edge table — same scoping as the
  * reference's reachability demos. Caller must pass a DAG (e.g. edges with
  * src < dst, or a condensation output); a cycle would make "redundant"
  * ill-defined.
  */
object TransitiveReduction {

  def run(spark: SparkSession, edges: DataFrame): DataFrame =
    Iterate.withoutAQE(spark)(loop(spark, edges))

  private def loop(spark: SparkSession, edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var reach = Iterate.cut(e.select(col("src").as("a"), col("dst").as("b")))
    var size = reach.count()
    var grew = true
    while (grew) {
      val ext = reach.as("l").join(reach.as("r"), col("l.b") === col("r.a"))
        .select(col("l.a").as("a"), col("r.b").as("b"))
      val next = Iterate.cut(reach.unionByName(ext).distinct())
      val n = next.count()
      grew = n > size
      size = n
      Iterate.free(reach)
      reach = next
    }

    // redundant = one edge then any reachability step (length >= 2)
    val p2 = e.as("x").join(reach.as("r"), col("x.dst") === col("r.a"))
      .select(col("x.src").as("src"), col("r.b").as("dst")).distinct()
    val out = e.join(p2, Seq("src", "dst"), "left_anti")
    e.unpersist(false)
    out
  }
}
