package graft.tools

import graft.{Bench, SparkEntry}

/** Repeated wall-clock timing of named SparkEntry queries — the profiling
  * loop for plan changes: `runMain graft.tools.QueryTime <sfDir> <reps>
  * <name...>` prints per-rep seconds and the median, reusing Bench's session
  * builder and cache-dropping verbatim so timings predict the bench
  * (medians because the shared host spikes single runs 2-7x).
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    require(reps >= 1, "need at least one rep")
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus)
    for (name <- names) {
      val q = SparkEntry.queries(name)
      val times = (1 to reps).map { r =>
        val t0 = System.nanoTime()
        q(spark, sfDir).write.mode("overwrite").format("noop").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[qt] $name rep$r: $s%.3f s")
        s
      }.sorted
      val med = if (reps % 2 == 1) times(reps / 2)
                else (times(reps / 2 - 1) + times(reps / 2)) / 2.0
      println(f"[qt] $name MEDIAN of $reps: $med%.3f s")
      Bench.dropCaches(spark)
    }
    spark.stop()
  }
}
