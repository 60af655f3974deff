package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Repeated wall-clock timing of named SparkEntry queries — the profiling
  * loop for plan changes: `runMain graft.tools.QueryTime <sfDir> <reps>
  * <name...>` prints per-rep seconds and the median, with the same session
  * settings as Bench's query phase (medians because the shared host spikes
  * single runs 2-7x).
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-querytime").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-graft"))
      .config("spark.shuffle.compress", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val q = SparkEntry.queries(name)
      val times = (1 to reps).map { r =>
        val t0 = System.nanoTime()
        q(spark, sfDir).write.mode("overwrite")
          .format("noop").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[qt] $name rep$r: $s%.3f s")
        s
      }
      val med = times.sorted.apply(reps / 2)
      println(f"[qt] $name MEDIAN of $reps: $med%.3f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
