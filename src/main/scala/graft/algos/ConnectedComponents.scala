package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Iterate

/** Connected components by min-label propagation to fixpoint (north rule:
  * "min-plus label propagation, exact assignments"; semiring view: iterate
  * w = min.second(A, w) ⊕ w until unchanged — SURVEY.md §2.10).
  *
  * Deterministic and exact: labels are vertex ids, min is order-insensitive,
  * so the fixpoint is unique. Works on the symmetrized structure (components
  * are an undirected notion, matching the reference's 2blocks fixture usage).
  *
  * Scale notes: plain min-propagation needs O(diameter) rounds. Each round is
  * one shuffle join + one hash-agg, both on the same `id` partitioning; the
  * label vector shrinks nothing but converges fast on social-like graphs
  * (small diameter). Lineage cut every 10 rounds.
  */
object ConnectedComponents {

  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 200,
          numPartitions: Int = 0, skewSalts: Int = 8): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
                else spark.conf.get("spark.sql.shuffle.partitions").toInt

    // symmetrize; structure only
    val undPlain = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(parts, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // hub skew in the gather join: salt hot srcs (graft.core.Skew); min is
    // order-insensitive so the salted two-phase result is identical
    val hot = if (skewSalts > 0) graft.core.Skew.hotKeys(undPlain, "src", parts)
              else Seq.empty[Long]
    val und = if (hot.isEmpty) undPlain else {
      val s = graft.core.Skew.saltEdges(undPlain, hot, skewSalts)
        .repartition(parts, col("src"), col("salt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      s.count()
      undPlain.unpersist(false)
      s
    }

    val vertices = und.select(col("src").as("id")).distinct()
    // labels is referenced twice per iteration (gather + merge): cut() keeps
    // the plan leaf-sized across the fixpoint loop (graft.core.Iterate)
    var labels = Iterate.cutKeyed(
      vertices.select(col("id"), col("id").as("comp")), parts, "id")

    var iter = 0
    var changed = 1L
    while (iter < maxIter && changed > 0) {
      // neighbor-min gather: min.second semiring vxm over the adjacency
      val labT = labels.select(col("id").as("src"), col("comp").as("c"))
      val gathered =
        if (hot.isEmpty) und.join(labT, Seq("src"))
        else und.join(graft.core.Skew.saltState(labT, "src", hot, skewSalts),
          Seq("src", "salt"))
      val neighborMin = gathered
        .groupBy(col("dst").as("id")).agg(min(col("c")).as("nmin"))

      val next = Iterate.cutKeyed(labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"),
          (col("nmin") < col("comp")).as("chg")), parts, "id")

      changed = next.filter(col("chg")).count()
      Iterate.free(labels)
      labels = next
      iter += 1
    }
    und.unpersist(false)
    labels.select(col("id"), col("comp"))
  }
}
