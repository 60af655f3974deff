package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algos.PageRank

/** Scratch diagnostic: grouped vs flat gather on the sf0.001 edgesBi graph. */
object GatherDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = graft.SparkEntry.edgesBi(spark, "/root/testdata/sf0.001")
    val f = PageRank.run(spark, edges, tol = 1e-6, maxIter = 100, grouped = false)
    val g = PageRank.run(spark, edges, tol = 1e-6, maxIter = 100, grouped = true)
    println(s"flat iters=${f.iterations} delta=${f.finalDelta}")
    println(s"grouped iters=${g.iterations} delta=${g.finalDelta}")
    val j = f.ranks.select(col("id"), col("r").as("rf"))
      .join(g.ranks.select(col("id"), col("r").as("rg")), Seq("id"))
      .select(max(abs(col("rf") - col("rg"))).as("maxdiff"))
    println("max |rf-rg| = " + j.head.getDouble(0))
    // per-iteration deltas
    println("flat deltas: " + f.metrics.map(_.delta).mkString(", "))
    println("grouped deltas: " + g.metrics.map(_.delta).mkString(", "))
    println("flat sink: " + f.metrics.map(_.sinkMass).mkString(", "))
    println("grouped sink: " + g.metrics.map(_.sinkMass).mkString(", "))
    spark.stop()
  }
}
