package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.{Dataset => CDataset}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.storage.StorageLevel

/** Spark-internal bridge (hence the org.apache.spark.sql package): a
  * partitioning-preserving eager materialization for iterative loops.
  *
  * `Dataset.localCheckpoint` wraps the cached rows in a `LogicalRDD` with
  * UnknownPartitioning, so every consumer re-shuffles the loop state each
  * iteration (two exchanges per PageRank step). This variant materializes
  * the rows into a cached RDD and declares `HashPartitioning(keys, parts)`
  * on the `LogicalRDD`, so co-partitioned joins and aggregations on the keys
  * skip their exchanges entirely.
  *
  * The declared partitioning is never assumed: after materialization the
  * final physical plan's output partitioning is inspected, and only if it
  * already IS hash(keys, parts) do we declare it directly; otherwise the
  * rows are laid out with an explicit `repartition(parts, keys)` — an
  * exchange whose layout is exact and which AQE never coalesces because the
  * partition count is user-specified.
  */
object GraftSqlInternals {

  /** Column <-> Catalyst Expression bridge for the engine's custom
    * expressions (graft.functions): Spark 4 hides the Expression-backed
    * Column constructor behind the classic ExpressionUtils.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  def cutHashPartitioned(df: DataFrame, parts: Int, keys: Seq[String]): DataFrame = {
    val attempt = materialize(df, parts, keys)
    attempt match {
      case Some(cutDf) => cutDf
      case None =>
        val cds = df.asInstanceOf[CDataset[Row]]
        val laid = cds.repartition(parts, keys.map(df.col): _*)
        // last resort (exotic partitioning report): plain eager checkpoint —
        // correct, merely without the declared-partitioning fast path
        materialize(laid, parts, keys).getOrElse(laid.localCheckpoint(true))
    }
  }

  /** Execute + cache; Some(leaf frame) if the final physical layout is
    * hash(keys, parts), None otherwise (caller re-lays-out explicitly).
    */
  private def materialize(df: DataFrame, parts: Int, keys: Seq[String]): Option[DataFrame] = {
    val cds = df.asInstanceOf[CDataset[Row]]
    val session = cds.sparkSession
    val qe = cds.queryExecution
    val output = qe.analyzed.output
    val keyAttrs: Seq[Attribute] = keys.map(k => output.find(_.name == k).getOrElse(
      throw new IllegalArgumentException(s"no column $k in ${output.map(_.name)}")))
    val rdd: RDD[InternalRow] = qe.toRdd.map(_.copy())
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Truncate RDD lineage (keeps the cached blocks and the partitioner).
    // The declared-partitioning leaves make successive iterations NARROW
    // dependencies of each other, so without truncation the task object
    // graph grows per iteration and long fixpoints (100+ small iterations)
    // die in task (de)serialization with StackOverflowError.
    rdd.localCheckpoint()
    rdd.count() // eager: the loop must not re-run the producing plan

    val finalPlan = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // the plan may report a PartitioningCollection (e.g. hash(id) or
    // hash(comp) when comp aliases id) — any member matching the keys works
    def flatten(p: org.apache.spark.sql.catalyst.plans.physical.Partitioning)
        : Seq[org.apache.spark.sql.catalyst.plans.physical.Partitioning] = p match {
      case c: org.apache.spark.sql.catalyst.plans.physical.PartitioningCollection =>
        c.partitionings.flatMap(flatten)
      case other => Seq(other)
    }
    val ok = flatten(finalPlan.outputPartitioning).exists {
      case h: HashPartitioning =>
        h.numPartitions == parts &&
          h.expressions.length == keyAttrs.length &&
          h.expressions.zip(keyAttrs).forall {
            case (e: Attribute, k) => e.exprId == k.exprId
            case _ => false
          }
      case _ => false
    }
    if (ok) {
      val lr = LogicalRDD(output, rdd, HashPartitioning(keyAttrs, parts), Nil, false)(session)
      Some(CDataset.ofRows(session, lr))
    } else {
      rdd.unpersist(false)
      None
    }
  }
}
