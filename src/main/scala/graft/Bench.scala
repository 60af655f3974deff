package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.algos.PageRank
import graft.corpus.Corpus

/** Round benchmark (driver-run): one JSON line.
  *
  * Reports the BASELINE.json target metric — edges/sec per PageRank iteration
  * and iterations-to-1e-6 on the corpus-derived edge table — plus the
  * two-parallelism scaling evidence (same input, local[N/4] vs local[N]; the
  * sandbox stand-in for N vs 4N executors, per BASELINE.md) and per-query
  * wall times for the headline driver queries at the given SF.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-graft"))
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Headline operator queries (subset of SparkEntry.queries: one per family). */
  private val headline = Seq(
    "gb_build", "gb_transpose", "gb_ewise_add", "gb_select", "gb_reduce_rows",
    "gb_mxv", "gb_mxm", "gb_mxm_masked", "gb_sort_topk",
    "algo_tricount", "algo_pagerank", "algo_cc", "algo_bfs", "algo_labelprop",
    "corpus_edges", "dedup_exact", "dedup_minhash", "dedup_simhash",
    "ann_lsh_topk", "text_quality", "text_tokens", "media_features")

  /** PageRank throughput on a pre-materialized edge table: MEDIAN sec/iter
    * from the engine's per-iteration metrics, skipping the first two
    * iterations (codegen/JIT warm-up) — medians are robust to GC spikes.
    */
  private def pagerankThroughput(spark: SparkSession, edgesPath: String,
                                 iters: Int): (Long, Double) = {
    val edges = spark.read.parquet(edgesPath)
    val nnz = edges.count()
    val res = PageRank.run(spark, edges, tol = 0.0, maxIter = iters)
    val steady = res.metrics.drop(2).map(_.millis).sorted
    val medianMs = if (steady.isEmpty) res.metrics.map(_.millis).max
                   else steady(steady.size / 2)
    (nnz, nnz / (medianMs / 1000.0))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString).toInt
    val lowCpus = math.max(1, cpus / 4)
    val corpusFiles = sys.env.getOrElse("SPARK_GRAFT_CORPUS_FILES", "2000000").toLong
    val scaleIters = sys.env.getOrElse("SPARK_GRAFT_SCALE_ITERS", "10").toInt
    val edgesPath = s"/tmp/graft_bench_edges_$corpusFiles"

    // --- phase 1 (full parallelism): headline queries + convergence ---------
    var spark = session(cpus)
    val queryTimes = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        spark.catalog.clearCache() // queries may leave persisted frames
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    }

    // corpus-derived edge table (the north-rule input), materialized once
    if (!new java.io.File(s"$edgesPath/_SUCCESS").exists()) {
      Corpus.deriveEdges(Corpus.synthesize(spark, corpusFiles))
        .write.mode("overwrite").parquet(edgesPath)
    }

    // iterations-to-1e-6 + converged-run wall time at full parallelism
    val edges = spark.read.parquet(edgesPath)
    val tConv0 = System.nanoTime()
    val conv = PageRank.run(spark, edges, tol = 1e-6, maxIter = 100)
    val convSec = (System.nanoTime() - tConv0) / 1e9
    val itersTo1e6 = conv.iterations
    spark.stop()

    // --- throughput at both parallelism levels, each in a FRESH session so
    // neither inherits the other's (or the query phase's) heap/cache state
    def freshThroughput(cores: Int): (Long, Double) = {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val s = session(cores)
      try pagerankThroughput(s, edgesPath, scaleIters) finally s.stop()
    }
    val (nnz, tputHi) = freshThroughput(cpus)
    val (_, tputLo) = freshThroughput(lowCpus)

    // strong-scaling efficiency lowCpus -> cpus (ideal speedup = cpus/lowCpus)
    val idealSpeedup = cpus.toDouble / lowCpus
    val efficiency = (tputHi / tputLo) / idealSpeedup

    val qs = queryTimes.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = queryTimes.collect { case (_, v) if v >= 0 => v }.sum
    println(
      f"""{"metric":"pagerank_edges_per_sec_per_iter","value":$tputHi%.0f,"unit":"edges/sec","queries":$qs,"sf":"$sfDir","total_query_sec":$total%.1f,"pagerank":{"corpus_files":$corpusFiles,"edges":$nnz,"iters_to_1e-6":$itersTo1e6,"converged_run_sec":$convSec%.1f,"edges_per_sec_per_iter_c$cpus":$tputHi%.0f,"edges_per_sec_per_iter_c$lowCpus":$tputLo%.0f},"scaling":{"cores_low":$lowCpus,"cores_high":$cpus,"ideal_speedup":$idealSpeedup%.1f,"measured_speedup":${tputHi / tputLo}%.2f,"efficiency":$efficiency%.3f}}""")
  }
}
