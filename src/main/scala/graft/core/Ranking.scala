package graft.core

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global ranking.
  *
  * `Window.orderBy` with no partitionBy collapses the whole dataset into ONE
  * task — a straggler/OOM at scale, not a plan. The scalable equivalent of a
  * global dense rank is: range-partition by the sort keys (each partition owns
  * a disjoint key range, in partition-index order), sort within partitions,
  * then `zipWithIndex` (which assigns global offsets from per-partition counts
  * — one lightweight count job plus one map, no single-task funnel).
  */
object Ranking {

  /** Append a 0-based global rank column `rankCol`, ordering by `keys`
    * ascending. Rows must be distinct on `keys` (callers rank de-duplicated
    * id/edge sets), making the rank a deterministic dense rank regardless of
    * how the range sampler places partition boundaries.
    */
  def denseRank(df: DataFrame, rankCol: String, keys: String*): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val cols = keys.map(col)
    val sorted = df.repartitionByRange(parts, cols: _*).sortWithinPartitions(cols: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(ranked, schema)
  }
}
