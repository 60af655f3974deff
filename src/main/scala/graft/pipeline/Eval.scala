package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model/index evaluation operators — the measurement half of a training-
  * data pipeline (score a filter, a retrieval index, a classifier; decide
  * with numbers). Shapes chosen so the arithmetic is EXACT: integer rank
  * sums and counts, one final division — any engine reproduces the result
  * bit-for-bit.
  */
object Eval {

  /** Exact tie-aware ROC-AUC of a score column against a boolean label —
    * the Mann-Whitney U statistic: AUC = (#correctly-ordered pairs + ½·#tied
    * pairs) / (P·N). Computed per DISTINCT SCORE GROUP: sort the (score,
    * p_cnt, n_cnt) group table, running-sum the negatives below, and fold
    * Σ p_cnt·(2·cum_n_below + n_cnt) — an exact integer; AUC is that over
    * 2·P·N in one division.
    *
    * Scale shape: the corpus-sized pass is ONE groupBy(score); the window
    * runs over the distinct-score table (≤ #distinct scores rows — for
    * quantized/integer scores a tiny fraction of the data). Never a global
    * sort of raw rows.
    *
    * @param scored (score: numeric, positive: boolean) rows
    * @return one row (p, n, auc)
    */
  def auc(scored: DataFrame, scoreCol: String = "score",
          labelCol: String = "positive"): DataFrame = {
    val groups = scored.groupBy(col(scoreCol).as("s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("p_cnt"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("n_cnt"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = groups.withColumn("cum_n_le", sum(col("n_cnt")).over(w))
      .withColumn("contrib",
        col("p_cnt") * (lit(2L) * (col("cum_n_le") - col("n_cnt")) + col("n_cnt")))
    cum.agg(sum(col("p_cnt")).as("p"), sum(col("n_cnt")).as("n"),
        sum(col("contrib")).as("num2"))
      .select(col("p"), col("n"),
        (col("num2").cast("double") / (lit(2.0) * col("p") * col("n"))).as("auc"))
  }

  /** Classifier confusion matrix + per-class exact counts: one row per
    * (truth, predicted) pair with its count and the truth-class total —
    * recall per class is `cnt/truth_total` for the diagonal rows, derivable
    * without a second pass. One corpus-sized groupBy.
    */
  def confusion(rows: DataFrame, truthCol: String, predCol: String): DataFrame = {
    val counts = rows.groupBy(col(truthCol).as("truth"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy("truth").agg(sum(col("cnt")).as("truth_total"))
    counts.join(totals, Seq("truth"))
      .select(col("truth"), col("pred"), col("cnt"), col("truth_total"))
  }
}
