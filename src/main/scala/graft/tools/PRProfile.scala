package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algos.PageRank

/** Diagnostic: per-iteration PageRank timings + the iteration physical plan
  * at a given core count. Usage: runMain graft.tools.PRProfile <cores> <edgesPath> [iters]
  */
object PRProfile {
  def main(args: Array[String]): Unit = {
    // arg0: core count (local[N]) or a full master URL like local-cluster[4,4,6144]
    val (master, cores) =
      if (args(0).forall(_.isDigit)) (s"local[${args(0)}]", args(0).toInt)
      else (args(0), {
        val m = "\\[(\\d+),(\\d+)".r.findFirstMatchIn(args(0)).get
        m.group(1).toInt * m.group(2).toInt
      })
    val edgesPath = args(1)
    val iters = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.executor.memory",
        sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "5g"))
      .config("spark.executor.extraClassPath",
        new java.io.File("target/scala-2.13/classes").getAbsolutePath)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.local.dir", "/dev/shm/spark-graft")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = for (a <- i.completionTime; b <- i.submissionTime) yield a - b
        println(s"    [stage ${i.stageId}] tasks=${i.numTasks} " +
          s"wall=${ms.getOrElse(-1L)}ms ${i.name.takeWhile(_ != '\n').take(60)}")
      }
    })
    val edges = spark.read.parquet(edgesPath)
    val t0 = System.nanoTime()
    val res = PageRank.run(spark, edges, tol = 0.0, maxIter = iters)
    val total = (System.nanoTime() - t0) / 1e9
    println(s"cores=$cores total=${"%.1f".format(total)}s iters=${res.iterations}")
    res.metrics.foreach(m => println(s"  iter ${m.iter}: ${m.millis} ms"))

    // decompose one iteration: gather+agg vs merge vs cut vs stats
    val adj = edges.select(col("src"), col("dst")).distinct()
      .repartition(cores, col("src")).cache()
    adj.count()
    var state = graft.core.Iterate.cutKeyed(res.ranks.withColumn("d", lit(2.0))
      .withColumn("isSink", lit(false)), cores, "id")
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"  $label: ${(System.nanoTime() - s) / 1e6}%.0f ms"); r
    }
    for (k <- 1 to 3) {
      println(s"decomposed iteration $k (cutKeyed)")
      val contrib = adj
        .join(state.select(col("id").as("src"), (col("r") / col("d")).as("t")), Seq("src"))
        .groupBy(col("dst").as("id")).agg(sum(col("t")).as("s"))
      val merged = state.join(contrib, Seq("id"), "left")
        .select(col("id"), (lit(0.1) + lit(0.85) * coalesce(col("s"), lit(0.0))).as("r"),
          col("r").as("rp"), col("d"), col("isSink"))
      val next = t("merge+cutKeyed") { graft.core.Iterate.cutKeyed(merged, cores, "id") }
      t("stats agg") { next.agg(max(abs(col("r") - col("rp"))),
        sum(when(col("isSink"), col("r")))).collect() }
      graft.core.Iterate.free(state)
      state = next
    }
    val contrib = adj
      .join(state.select(col("id").as("src"), (col("r") / col("d")).as("t")), Seq("src"))
      .groupBy(col("dst").as("id")).agg(sum(col("t")).as("s"))
    state.join(contrib, Seq("id"), "left")
      .select(col("id"), (lit(0.1) + lit(0.85) * coalesce(col("s"), lit(0.0))).as("r"))
      .repartition(cores, col("id"))
      .explain("formatted")
    spark.stop()
  }
}
