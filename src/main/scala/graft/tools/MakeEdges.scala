package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.Corpus

/** Materialize the corpus-derived benchmark edge tables up front (the same
  * `/tmp/graft_bench_edges_<nfiles>` caches graft.Bench builds lazily), so
  * bench iterations and scaling experiments start from warm parquet.
  * Usage: runMain graft.tools.MakeEdges <nfiles> [<nfiles> ...]
  */
object MakeEdges {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .appName("graft-make-edges")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-graft"))
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.map(_.toLong).foreach { n =>
      val path = s"/tmp/graft_bench_edges_$n"
      if (!new java.io.File(s"$path/_SUCCESS").exists()) {
        val t0 = System.nanoTime()
        Corpus.deriveEdges(Corpus.synthesize(spark, n))
          .write.mode("overwrite").parquet(path)
        println(f"[make-edges] $n files -> $path in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      } else println(s"[make-edges] $path already exists")
    }
    spark.stop()
  }
}
