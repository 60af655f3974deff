package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: does localCheckpoint preserve hash partitioning through a join? */
object CutExp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // replicate the CC initial-labels shape that failed the cut check
    val und = spark.range(0, 100).select(col("id").as("src"), (col("id") + 1).as("dst"))
      .union(spark.range(0, 100).select((col("id") + 1).as("src"), col("id").as("dst")))
      .distinct().repartition(4, col("src")).cache()
    und.count()
    val vertices = und.select(col("src").as("id")).distinct()
    val labels = vertices.select(col("id"), col("id").as("comp"))
    val cds = labels.repartition(4, labels.col("id"))
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val qe = cds.queryExecution
    qe.toRdd.map(_.copy()).count()
    val fin = qe.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    println(s"final plan class: ${fin.getClass.getSimpleName}")
    println(s"outputPartitioning: ${fin.outputPartitioning}")
    println(fin.treeString.take(1500))

    val df = spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v"))
      .repartition(4, col("id"))
    val cut = df.localCheckpoint(true)
    println("== self-join on id after cut ==")
    val j = cut.join(cut.select(col("id"), col("v").as("v2")), Seq("id"))
    j.explain()
    println("== join on renamed key ==")
    val k = cut.select(col("id").as("src"), col("v"))
      .join(cut.select(col("id").as("src"), col("v").as("v2")), Seq("src"))
    k.explain()
    spark.stop()
  }
}
