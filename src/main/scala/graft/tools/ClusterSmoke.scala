package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Iterate

/** Multi-executor (local-cluster) smoke for the Iterate.free safety guard:
  * on a REAL cluster an executor death after an unpersist could lose
  * successor blocks whose truncated lineage references the freed state, so
  * free() must refuse outside local mode (Iterate.scala's documented
  * contract). This main runs under `local-cluster[2,1,1024]` — two separate
  * executor JVMs — and asserts (1) free() leaves the cut state's blocks
  * persisted, and (2) a fixpoint loop that calls free() every round still
  * completes with the exact answer. Launched as a child process by
  * Round4Spec (one SparkContext per JVM — the suite's shared local session
  * can't coexist with a local-cluster one).
  */
object ClusterSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local-cluster[2,1,1024]")
      .appName("graft-cluster-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
      .config("spark.local.dir", "/dev/shm/spark-graft-smoke")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    try {
      require(!spark.sparkContext.isLocal, "local-cluster session reports isLocal")

      // (1) the guard: free() on a cut frame must NOT unpersist here
      val state = Iterate.cutKeyed(
        (0L until 100L).map(i => (i, i * 2.0)).toDF("id", "v"), 4, "id")
      val rdd = state.queryExecution.logical match {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
        case other => sys.error(s"cutKeyed leaf is not LogicalRDD: ${other.getClass}")
      }
      require(rdd.getStorageLevel != StorageLevel.NONE, "cut state not persisted")
      Iterate.free(state)
      require(rdd.getStorageLevel != StorageLevel.NONE,
        "free() unpersisted on a non-local master — guard broken")

      // (2) a fixpoint loop calling free() per round completes with the
      // exact fixpoint across two executor JVMs
      val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (5L, 6L))
        .map { case (s, d) => (s, d, 1.0) }.toDF("src", "dst", "w")
      val comps = graft.algos.ConnectedComponents.run(spark, edges, skewSalts = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      require(comps == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 5L -> 5L, 6L -> 5L),
        s"wrong components: $comps")
      println("CLUSTERSMOKE OK")
    } finally spark.stop()
  }
}
