package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vertex-state checkpointing shared by the iterative algorithms (the north
  * rule's "resumable from checkpoint with per-partition lineage"): state
  * snapshots land under `dir/iter=%05d` with (state columns, iter, part)
  * where `part` is the producing partition id (the lineage record), and a
  * `_SUCCESS` marker from the parquet commit protocol marks completeness.
  * Resume picks the NEWEST complete snapshot; a torn write (no _SUCCESS) is
  * skipped, so a mid-write kill falls back to the previous snapshot.
  *
  * All side-channel IO (tag markers, snapshot discovery, the metrics log)
  * goes through Hadoop's FileSystem API resolved from the checkpoint path
  * itself, so a non-local `dir` (hdfs://, s3a://) works the same as a local
  * one — snapshots and markers live on the same store.
  */
object Checkpoint {

  private def fs(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  // '=' must not appear in the marker name: Spark's data-source file filter
  // skips "_"-prefixed files ONLY when the name has no '=' (names with '='
  // look partition-like), so an '=' would get the marker read as parquet
  private def tagName(tag: String): String =
    "_TAG_" + tag.replaceAll("[^A-Za-z0-9._-]", "_")

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
    if (tag.nonEmpty) {
      val (hfs, p) = fs(state.sparkSession, path)
      hfs.create(new Path(p, tagName(tag)), true).close()
    }
  }

  /** Append one iteration-metrics record (numbers only) to
    * `dir/metrics.jsonl` — the run's durable per-iteration log next to its
    * state snapshots (the north rule's "iteration metrics"). Driver-side
    * single-writer append; a resumed run keeps appending to the same log.
    * Stores without append support (e.g. plain S3) fall back to
    * read-whole + rewrite — metrics lines are tiny and one-per-iteration.
    */
  def logMetric(spark: SparkSession, dir: String, fields: (String, Long)*): Unit = {
    val (hfs, d) = fs(spark, dir)
    hfs.mkdirs(d)
    val f = new Path(d, "metrics.jsonl")
    val line = fields.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}") + "\n"
    val bytes = line.getBytes("UTF-8")
    try {
      val out = if (hfs.exists(f)) hfs.append(f) else hfs.create(f, false)
      try out.write(bytes) finally out.close()
    } catch {
      case _: UnsupportedOperationException | _: java.io.IOException =>
        // no-append store: write prior+new to a TEMP file and rename it over
        // metrics.jsonl, so a crash mid-write can never truncate the history
        // (rename is atomic on HDFS; object stores make it copy+delete, where
        // the worst case is a leftover temp file, never a lost log)
        val prior =
          if (hfs.exists(f)) {
            val in = hfs.open(f)
            try in.readAllBytes() finally in.close()
          } else Array.emptyByteArray
        val tmp = new Path(d, s"_metrics.tmp.${System.nanoTime()}")
        val o = hfs.create(tmp, true)
        try { o.write(prior); o.write(bytes) } finally o.close()
        hfs.delete(f, false)
        hfs.rename(tmp, f)
    }
  }

  /** Newest complete (has _SUCCESS, and the matching run tag when one is
    * expected) snapshot under `dir`, with the state columns `cols`. Newest
    * is by the NUMERIC iteration (lexicographic %05d names overflow past
    * iter 99999 — "iter=100000" sorts before "iter=99999").
    */
  def newest(spark: SparkSession, dir: String, cols: Seq[String],
             tag: String = ""): Option[(Int, DataFrame)] = {
    val (hfs, d) = fs(spark, dir)
    if (!hfs.exists(d) || !hfs.getFileStatus(d).isDirectory) return None
    val done = hfs.listStatus(d).filter { st =>
      st.isDirectory && st.getPath.getName.startsWith("iter=") &&
        hfs.exists(new Path(st.getPath, "_SUCCESS")) &&
        (tag.isEmpty || hfs.exists(new Path(st.getPath, tagName(tag))))
    }
    if (done.isEmpty) None
    else {
      val best = done.maxBy(_.getPath.getName.stripPrefix("iter=").toInt)
      val it = best.getPath.getName.stripPrefix("iter=").toInt
      Some((it, spark.read.parquet(best.getPath.toString).select(cols.map(col): _*)))
    }
  }
}
