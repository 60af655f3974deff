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

  // '=' must not appear in the marker name: Spark's data-source file filter
  // skips "_"-prefixed files ONLY when the name has no '=' (names with '='
  // look partition-like), so an '=' would get the marker read as parquet
  private def tagFile(d: java.io.File, tag: String) =
    new java.io.File(d, "_TAG_" + tag.replaceAll("[^A-Za-z0-9._-]", "_"))

  /** `tag` records the run identity (e.g. "src=5" for SSSP/BFS, "damp=0.85"
    * for PageRank) as a marker file in the snapshot dir, so `newest` refuses
    * to resume a run with different semantics from a stale directory. The
    * INPUT edge table is the caller's responsibility — as with any external
    * checkpoint store, the dir must belong to the same job.
    */
  def write(state: DataFrame, dir: String, iter: Int, tag: String = ""): Unit = {
    val path = f"$dir/iter=$iter%05d"
    state.select(state.columns.map(col) :+ lit(iter).as("iter") :+
        spark_partition_id().as("part"): _*)
      .write.mode("overwrite").parquet(path)
    if (tag.nonEmpty) tagFile(new java.io.File(path), tag).createNewFile()
  }

  /** Append one iteration-metrics record (numbers only) to
    * `dir/metrics.jsonl` — the run's durable per-iteration log next to its
    * state snapshots (the north rule's "iteration metrics"). Driver-side
    * single-writer append; a resumed run keeps appending to the same log.
    */
  def logMetric(dir: String, fields: (String, Long)*): Unit = {
    new java.io.File(dir).mkdirs()
    val line = fields.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    val w = new java.io.FileWriter(s"$dir/metrics.jsonl", true)
    try w.write(line + "\n") finally w.close()
  }

  /** Newest complete (has _SUCCESS, and the matching run tag when one is
    * expected) snapshot under `dir`, with the state columns `cols`.
    */
  def newest(spark: SparkSession, dir: String, cols: Seq[String],
             tag: String = ""): Option[(Int, DataFrame)] = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) return None
    val done = d.listFiles().filter { f =>
      f.isDirectory && f.getName.startsWith("iter=") &&
        new java.io.File(f, "_SUCCESS").exists() &&
        (tag.isEmpty || tagFile(f, tag).exists())
    }
    if (done.isEmpty) None
    else {
      val best = done.maxBy(_.getName)
      val it = best.getName.stripPrefix("iter=").toInt
      Some((it, spark.read.parquet(best.getAbsolutePath).select(cols.map(col): _*)))
    }
  }
}
