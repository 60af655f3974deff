package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Iterate

/** Maximal independent set — Luby's algorithm per GraphBLAS/@GrB/mis.m:
  * candidates start as all vertices; per round each candidate draws a score
  * (mis.m uses random/degree; here a DETERMINISTIC per-round hash/(deg+1) so
  * runs reproduce exactly), neighbor_max = mxm(max.second, A, prob) restricted
  * to candidates, winners (score > neighbor_max, ties impossible with distinct
  * hash) join the set, winners+their neighbors leave the candidate pool
  * (complemented structural masks in mis.m).
  *
  * Returns (id, inSet). Result is a valid MIS: no two set members adjacent,
  * every non-member has a set neighbor (asserted in tests).
  */
object MIS {

  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 100, seed: Long = 42L,
          numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
                else spark.conf.get("spark.sql.shuffle.partitions").toInt

    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
      .repartition(parts, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val deg = und.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val vertices = und.select(col("src").as("id")).distinct()
      .join(deg, Seq("id"), "left")
      .select(col("id"), coalesce(col("deg"), lit(0L)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var candidates = Iterate.cut(vertices)
    var inSet = Iterate.cut(spark.emptyDataFrame.select(lit(0L).as("id")).limit(0))
    var iter = 0
    var nCand = candidates.count()

    while (nCand > 0 && iter < maxIter) {
      iter += 1
      // deterministic "random" score; strictly positive, distinct w.h.p.
      val scored = Iterate.cut(candidates.select(col("id"),
        ((abs(xxhash64(col("id"), lit(iter), lit(seed))) % 1000000007L).cast("double") + lit(1.0))
          / (col("deg").cast("double") + lit(1.0))).toDF("id", "score"))

      // neighbor max over candidate neighbors only (max.second masked to candidates)
      val nbrMax = und
        .join(scored.select(col("id").as("src"), col("score").as("s")), Seq("src"))
        .groupBy(col("dst").as("id")).agg(max(col("s")).as("nmax"))

      val winners = Iterate.cut(scored.join(nbrMax, Seq("id"), "left")
        .filter(col("nmax").isNull || col("score") > col("nmax"))
        .select("id"))

      // removed = winners + neighbors(winners)
      val removed = winners.unionByName(
        und.join(winners.select(col("id").as("src")), Seq("src"))
          .select(col("dst").as("id"))).distinct()

      val newInSet = Iterate.cut(inSet.unionByName(winners))
      val newCand = Iterate.cut(candidates.join(removed, Seq("id"), "left_anti")
        .select(col("id"), col("deg")))
      nCand = newCand.count()

      Iterate.free(inSet); Iterate.free(candidates)
      Iterate.free(scored); Iterate.free(winners)
      inSet = newInSet
      candidates = newCand
    }
    und.unpersist(false)
    vertices.join(inSet.select(col("id"), lit(true).as("inSet")), Seq("id"), "left")
      .select(col("id"), coalesce(col("inSet"), lit(false)).as("inSet"))
  }
}
