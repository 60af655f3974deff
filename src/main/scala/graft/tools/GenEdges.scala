package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.Corpus

/** Materialize the corpus-derived edge table at a given file count (the
  * north-rule input at bench scale). Usage: runMain graft.tools.GenEdges <nFiles> <outPath>
  */
object GenEdges {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val out = args(1)
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.local.dir", "/dev/shm/spark-graft")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Corpus.deriveEdges(Corpus.synthesize(spark, n)).write.mode("overwrite").parquet(out)
    println(s"edges=${spark.read.parquet(out).count()}")
    spark.stop()
  }
}
