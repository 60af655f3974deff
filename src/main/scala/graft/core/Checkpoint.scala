package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vertex-state checkpointing shared by the iterative algorithms (the north
  * rule's "resumable from checkpoint with per-partition lineage"): state
  * snapshots land under `dir/iter=%05d` with (state columns, iter, part)
  * where `part` is the producing partition id (the lineage record), and a
  * `_SUCCESS` marker from the parquet commit protocol marks completeness.
  * Resume picks the NEWEST complete snapshot; a torn write (no _SUCCESS) is
  * skipped, so a mid-write kill falls back to the previous snapshot.
  */
object Checkpoint {

  def write(state: DataFrame, dir: String, iter: Int): Unit =
    state.select(state.columns.map(col) :+ lit(iter).as("iter") :+
        spark_partition_id().as("part"): _*)
      .write.mode("overwrite").parquet(f"$dir/iter=$iter%05d")

  /** Newest complete (has _SUCCESS) snapshot under `dir`, with the state
    * columns `cols`, if any exists.
    */
  def newest(spark: SparkSession, dir: String, cols: Seq[String]): Option[(Int, DataFrame)] = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) return None
    val done = d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("iter=") &&
      new java.io.File(f, "_SUCCESS").exists())
    if (done.isEmpty) None
    else {
      val best = done.maxBy(_.getName)
      val it = best.getName.stripPrefix("iter=").toInt
      Some((it, spark.read.parquet(best.getAbsolutePath).select(cols.map(col): _*)))
    }
  }
}
