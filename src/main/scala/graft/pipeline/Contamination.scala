package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag training documents
  * whose word w-gram overlap with a benchmark/eval set exceeds a threshold —
  * the standard n-gram decontamination pass run before every large pretrain.
  *
  * Plan shape at 100 TB: the BENCHMARK side is small (eval suites are
  * thousands of documents, at most millions of n-grams), so its distinct
  * n-gram set is built once and BROADCAST; the corpus side streams through
  * one projection (tokenize + window + per-doc distinct, all inside codegen,
  * as in [[Dedup.shingles]]) → explode → broadcast LEFT SEMI join → a
  * partially-aggregated per-doc count whose shuffle rows are (doc_id, n) —
  * the corpus text itself never crosses an exchange.
  */
object Contamination {

  /** Distinct lowercase word w-grams per doc, as STRINGS, not hashes: the
    * matched n-grams themselves are the audit evidence a decontamination
    * report needs (and exact strings make the op verifiable by any engine).
    */
  private def grams(docsDf: DataFrame, w: Int): DataFrame = {
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val g = transform(sequence(lit(0), size(col("toks")) - w),
      i => concat_ws(" ", slice(col("toks"), i + 1, lit(w))))
    docsDf.select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        when(size(col("toks")) >= w, array_distinct(g))
          .otherwise(array().cast("array<string>")).as("grams"))
  }

  /** Per-document contamination counts of `corpus` vs `bench`:
    * (doc_id, n_grams, matched, contaminated) — `matched` counts the doc's
    * DISTINCT w-grams that appear anywhere in the benchmark set,
    * `contaminated` = 1 iff matched/n_grams >= threshold (0 for gram-less
    * docs). Every corpus doc appears in the output exactly once.
    */
  def ngramOverlap(corpus: DataFrame, bench: DataFrame, w: Int = 3,
                   threshold: Double = 0.1): DataFrame = {
    require(w >= 1, "w must be >= 1")
    val cg = grams(corpus, w)
    val bg = grams(bench, w).select(explode(col("grams")).as("g")).distinct()
    val matched = cg.select(col("doc_id"), explode(col("grams")).as("g"))
      .join(broadcast(bg), Seq("g"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("matched"))
    cg.select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"))
      .join(matched, Seq("doc_id"), "left")
      .na.fill(0L, Seq("matched"))
      .withColumn("contaminated",
        ((col("n_grams") > 0) &&
          col("matched").cast("double") / col("n_grams") >= threshold)
          .cast("int"))
  }
}
