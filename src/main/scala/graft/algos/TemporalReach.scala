package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Iterate

/** Earliest-arrival time-respecting reachability over a TEMPORAL edge table
  * (src, dst, ts): a path is valid only if its edge timestamps strictly
  * increase, and `arrival(v)` = the earliest time any such path from the
  * source reaches v (Wu et al., "Path Problems in Temporal Graphs", VLDB
  * 2014). This is the crawl-frontier / event-propagation primitive — "which
  * pages could a signal starting at s have reached, and when" — that a
  * static closure over the same edges overstates (an edge taken BEFORE the
  * signal arrived cannot carry it).
  *
  * Semiring view: min-arrival Bellman-Ford where the edge relaxation is
  * GATED (edge u→v at ts contributes ts only when ts > arrival(u)).
  * Monotone: arrivals only decrease, and decreasing arrival(u) only ENABLES
  * more edges, so the delta-frontier fixpoint is exact. Round count is
  * bounded by the longest strictly-increasing timestamp chain, i.e. the
  * number of distinct timestamps — at web scale that's the crawl-epoch
  * count, a small constant, not graph diameter.
  *
  * Spark shape: adjacency hash-partitioned by src once; each round joins
  * only vertices whose arrival improved, one max-free min-aggregate by dst.
  * The source is seeded at arrival −1 ("present at start"; every real
  * timestamp ≥ 0 qualifies) and is emitted with that sentinel.
  */
object TemporalReach {

  /** (id, arrival) for every temporally reachable vertex; the source row
    * carries arrival −1.
    */
  def run(spark: SparkSession, edges: DataFrame, source: Long,
          maxIter: Int = 10000, numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
                else spark.conf.get("spark.sql.shuffle.partitions").toInt

    val adj = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("ts").cast("long").as("ts"))
      .repartition(parts, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var arr = Iterate.cut(spark.range(1)
      .select(lit(source).as("id"), lit(-1L).as("arr")))
    var frontier = arr
    var active = 1L
    var iter = 0

    while (active > 0 && iter < maxIter) {
      iter += 1
      val cand = adj.join(frontier.select(col("id").as("src"), col("arr")), Seq("src"))
        .filter(col("ts") > col("arr"))
        .groupBy(col("dst").as("id")).agg(min(col("ts")).as("na"))
      val improvedPre = cand.join(arr, Seq("id"), "left")
        .filter(col("arr").isNull || col("na") < col("arr"))
        .select(col("id"), col("na").as("arr"))
        .observe(s"treach_$iter", count(lit(1)).as("n"))
      val improved = Iterate.cut(improvedPre)
      active = Iterate.observedLong(improvedPre, s"treach_$iter")(improved.count())
      if (active > 0) {
        val next = Iterate.cut(arr.join(improved.select("id"), Seq("id"), "left_anti")
          .unionByName(improved))
        Iterate.free(arr)
        if (frontier ne arr) Iterate.free(frontier)
        arr = next
        frontier = improved
      } else Iterate.free(improved)
    }
    adj.unpersist(false)
    arr.select(col("id"), col("arr").as("arrival"))
  }
}
