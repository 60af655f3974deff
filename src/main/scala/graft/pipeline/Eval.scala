package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Exact tie-aware Spearman rank correlation between two numeric columns —
    * Pearson over AVERAGE ranks, with every intermediate an integer: the
    * average rank of a tie group is `cum_below + (cnt+1)/2`, a half-integer,
    * so DOUBLED ranks `2a = 2·cum_below + cnt + 1` are exact longs. The five
    * rank-moment sums stay in int64 (Σ(2a)² ≤ 4n³ — fine to n ≈ 10⁶); the
    * three cross products promote to DECIMAL(38,0) (exact to n ≈ 3·10⁸);
    * one final double division. Any engine reproduces the value bit-for-bit.
    *
    * Scale shape: ranks come from ONE groupBy per column plus a window over
    * the DISTINCT-VALUE table (never a global sort of raw rows), joined back
    * by value; the moment pass is a single corpus-sized aggregate.
    *
    * @param rows (x: numeric, y: numeric)
    * @return one row (n, rho)
    */
  def spearman(rows: DataFrame, xCol: String = "x", yCol: String = "y"): DataFrame = {
    def ranks2(c: String, out: String) = {
      val g = rows.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.withColumn("cum_le", sum(col("cnt")).over(w))
        .select(col("v").as(c),
          (lit(2L) * (col("cum_le") - col("cnt")) + col("cnt") + lit(1L)).as(out))
    }
    val ranked = rows.join(ranks2(xCol, "ra"), Seq(xCol))
      .join(ranks2(yCol, "rb"), Seq(yCol))
    val dec = "decimal(38,0)"
    ranked.agg(count(lit(1)).as("n"),
        sum(col("ra")).as("sa"), sum(col("rb")).as("sb"),
        sum(col("ra") * col("ra")).as("saa"),
        sum(col("rb") * col("rb")).as("sbb"),
        sum(col("ra") * col("rb")).as("sab"))
      .select(col("n"),
        ((col("n").cast(dec) * col("sab").cast(dec)
            - col("sa").cast(dec) * col("sb").cast(dec)).cast("double")
          / sqrt((col("n").cast(dec) * col("saa").cast(dec)
              - col("sa").cast(dec) * col("sa").cast(dec)).cast("double")
            * (col("n").cast(dec) * col("sbb").cast(dec)
              - col("sb").cast(dec) * col("sb").cast(dec)).cast("double")))
          .as("rho"))
  }

  /** Calibration-curve bins for an INTEGER score against a boolean label:
    * min-max-normalize the score to a confidence in [0,1], drop it into
    * `bins` equal-width bins (top edge closed), and report per-bin count,
    * positive count, accuracy, and mean confidence — the inputs to ECE
    * (Σ_b cnt_b/n · |acc_b − conf_b|), which the caller folds in one pass.
    * Per-bin confidence averages `Σ(score−min) / (cnt·(max−min))` come from
    * integer sums, so every engine agrees bit-for-bit.
    *
    * Scale shape: one 2-row-broadcast min/max join, one corpus-sized groupBy.
    *
    * @param scored (score: integral, positive: boolean)
    * @return one row per non-empty bin (bin, cnt, pos_cnt, acc, conf)
    */
  def calibrationBins(scored: DataFrame, bins: Int = 10,
                      scoreCol: String = "score",
                      labelCol: String = "positive"): DataFrame = {
    val mm = scored.agg(min(col(scoreCol)).as("mn"), max(col(scoreCol)).as("mx"))
    val conf = (col(scoreCol) - col("mn")).cast("double") /
      (col("mx") - col("mn")).cast("double")
    scored.crossJoin(broadcast(mm))
      .withColumn("bin",
        when(col("mx") === col("mn"), lit(0))
          .otherwise(least(lit(bins - 1), floor(conf * bins).cast("int"))))
      .groupBy("bin")
      .agg(count(lit(1)).as("cnt"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("pos_cnt"),
        sum((col(scoreCol) - col("mn")).cast("long")).as("num"),
        first(col("mx") - col("mn")).as("rng"))
      .select(col("bin"), col("cnt"), col("pos_cnt"),
        (col("pos_cnt").cast("double") / col("cnt")).as("acc"),
        when(col("rng") === 0, lit(0.0))
          .otherwise(col("num").cast("double")
            / (col("cnt") * col("rng")).cast("double")).as("conf"))
  }

  /** Precision-recall curve at every distinct score threshold (predict
    * positive when score ≥ t, one row per candidate t): running positive /
    * negative counts over the distinct-score group table, descending —
    * integer cumulative sums, two final divisions. The companion of [[auc]]
    * over the same grouped shape (window over distinct scores, never raw
    * rows).
    *
    * @return (threshold, tp, fp, precision, recall) per distinct score
    */
  def prCurve(scored: DataFrame, scoreCol: String = "score",
              labelCol: String = "positive"): DataFrame = {
    val groups = scored.groupBy(col(scoreCol).as("threshold"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("p_cnt"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("n_cnt"))
    val w = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = groups.agg(sum(col("p_cnt")).as("p_tot"))
    groups.withColumn("tp", sum(col("p_cnt")).over(w))
      .withColumn("fp", sum(col("n_cnt")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("threshold"), col("tp"), col("fp"),
        (col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
          .as("precision"),
        (col("tp").cast("double") / col("p_tot").cast("double")).as("recall"))
  }

  /** Per-class precision / recall / F1 from (truth, pred) rows — the
    * summary layer over [[confusion]]. Every count is an exact integer and
    * each metric is ONE division (F1 in the 2·tp/(pred_total+truth_total)
    * form, algebraically equal to 2PR/(P+R) with no intermediate quotient),
    * so any engine reproduces the values bit-for-bit. Classes appearing
    * only as predictions (or only as truths) still get a row, with the
    * absent-side total 0 and the affected metrics 0.
    *
    * @return (cls, tp, pred_total, truth_total, precision, recall, f1)
    */
  def f1PerClass(rows: DataFrame, truthCol: String, predCol: String): DataFrame = {
    val counts = rows.groupBy(col(truthCol).as("truth"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("cnt"))
    val classes = counts.select(col("truth").as("cls"))
      .unionByName(counts.select(col("pred").as("cls"))).distinct()
    val tp = counts.filter(col("truth") === col("pred"))
      .select(col("truth").as("cls"), col("cnt").as("tp"))
    val predTot = counts.groupBy(col("pred").as("cls")).agg(sum("cnt").as("pred_total"))
    val truthTot = counts.groupBy(col("truth").as("cls")).agg(sum("cnt").as("truth_total"))
    def div(n: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
      when(d === 0L, lit(0.0)).otherwise(n.cast("double") / d.cast("double"))
    classes.join(tp, Seq("cls"), "left").join(predTot, Seq("cls"), "left")
      .join(truthTot, Seq("cls"), "left")
      .select(col("cls"), coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("pred_total"), lit(0L)).as("pred_total"),
        coalesce(col("truth_total"), lit(0L)).as("truth_total"))
      .select(col("cls"), col("tp"), col("pred_total"), col("truth_total"),
        div(col("tp"), col("pred_total")).as("precision"),
        div(col("tp"), col("truth_total")).as("recall"),
        div(lit(2L) * col("tp"), col("pred_total") + col("truth_total")).as("f1"))
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

  /** Mean-reciprocal-rank inputs per query: the rank of the first FULLY
    * relevant document (rel == nterms, i.e. the doc contains every query
    * term) in the ranking, and its reciprocal — (query_id, first_rank, rr).
    * A query with no fully-relevant document in the ranking keeps a row
    * with (0, 0.0). Integer rank, ONE division — bit-identical anywhere.
    *
    * Scale shape: the ranking is already top-k-bounded per query, so every
    * join here is k·|queries| rows; `nterms` is a |queries|-row broadcast.
    *
    * @param ranked    (query_id, doc_id, rk) from e.g. TextStats.bm25Multi
    * @param relevance (query_id, doc_id, rel) from TextStats.queryRelevance
    * @param nterms    (query_id, nterms) — distinct term count per query
    */
  def mrr(ranked: DataFrame, relevance: DataFrame, nterms: DataFrame): DataFrame = {
    val hit = ranked.join(relevance, Seq("query_id", "doc_id"))
      .join(broadcast(nterms), Seq("query_id"))
      .filter(col("rel") === col("nterms"))
      .groupBy("query_id").agg(min(col("rk")).as("first_rank"))
    nterms.select("query_id").join(hit, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("first_rank"), lit(0L)).as("first_rank"),
        when(col("first_rank").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("first_rank").cast("double")).as("rr"))
  }

  /** Precision@k of a ranking against binary relevance (fully relevant =
    * rel == nterms), one row per (query_id, k): (query_id, k, rel_cnt,
    * prec). Exact integer counts, one division per row.
    */
  def precisionAtK(ranked: DataFrame, relevance: DataFrame,
                   nterms: DataFrame, ks: Seq[Int]): DataFrame = {
    val spark = ranked.sparkSession
    import spark.implicits._
    val binary = ranked.join(relevance, Seq("query_id", "doc_id"), "left")
      .join(broadcast(nterms), Seq("query_id"))
      .select(col("query_id"), col("rk"),
        (coalesce(col("rel"), lit(0L)) === col("nterms")).as("isrel"))
    val kdf = ks.map(_.toLong).toDF("k")
    val counts = binary.crossJoin(broadcast(kdf))
      .groupBy("query_id", "k")
      .agg(sum(when(col("isrel") && col("rk") <= col("k"), 1L).otherwise(0L))
        .as("rel_cnt"))
    // grid from the query set, not the ranking — a query whose ranking is
    // EMPTY (no doc matches any term) still reports (rel_cnt 0, prec 0.0)
    nterms.select("query_id").crossJoin(broadcast(kdf))
      .join(counts, Seq("query_id", "k"), "left")
      .select(col("query_id"), col("k"),
        coalesce(col("rel_cnt"), lit(0L)).as("rel_cnt"),
        (coalesce(col("rel_cnt"), lit(0L)).cast("double")
          / col("k").cast("double")).as("prec"))
  }

  /** NDCG@k of a ranking against GRADED relevance (rel = # distinct query
    * terms present): (query_id, dcg, idcg, ndcg), each rounded to 6 dp
    * like the BM25 scores that feed it. Gain at position i is
    * rel·ln2/ln(i+1) (≡ rel/log₂(i+1), written via ln on both sides so the
    * engine and the SQL oracle evaluate the same libm calls); DCG and IDCG
    * are UNROLLED k-term sums — position i's gain is isolated with
    * max(CASE rk=i) and the terms added left-to-right textually, so the
    * floating-point addition ORDER is pinned identically in Spark and the
    * oracle (a groupBy sum's order is partition-dependent; this isn't).
    * The ideal ranking orders by rel desc, doc_id asc — deterministic ties.
    */
  def ndcg(ranked: DataFrame, relevance: DataFrame, k: Int = 10): DataFrame = {
    val ln2 = lit(math.log(2.0))
    def unrolled(df: DataFrame, rkCol: String, out: String): DataFrame =
      df.groupBy("query_id").agg(
        (1 to k).map(i => coalesce(max(when(col(rkCol) === i, col("g"))), lit(0.0)))
          .reduceLeft(_ + _).as(out))
    val gains = ranked.filter(col("rk") <= k)
      .join(relevance, Seq("query_id", "doc_id"), "left")
      .select(col("query_id"), col("rk"),
        (coalesce(col("rel"), lit(0L)).cast("double") * ln2
          / log(col("rk").cast("double") + lit(1.0))).as("g"))
    val dcg = unrolled(gains, "rk", "dcg")
    val iw = Window.partitionBy("query_id").orderBy(col("rel").desc, col("doc_id"))
    val ideal = relevance.withColumn("irk", row_number().over(iw))
      .filter(col("irk") <= k)
      .select(col("query_id"), col("irk"),
        (col("rel").cast("double") * ln2
          / log(col("irk").cast("double") + lit(1.0))).as("g"))
    val idcg = unrolled(ideal, "irk", "idcg")
    dcg.join(idcg, Seq("query_id"))
      .select(col("query_id"), round(col("dcg"), 6).as("dcg"),
        round(col("idcg"), 6).as("idcg"),
        when(col("idcg") === 0.0, lit(0.0))
          .otherwise(round(col("dcg") / col("idcg"), 6)).as("ndcg"))
  }

  /** Recall@k of a ranking against binary relevance (fully relevant =
    * rel == nterms), one row per (query_id, k): (query_id, k, rel_cnt,
    * tot_rel, recall). The denominator is the CORPUS-WIDE fully-relevant
    * count (from the full relevance table, not the top-k window), so a
    * perfect top-k over a query with > k relevant docs reports k/tot_rel,
    * not 1.0. Exact integer counts, one division per row; tot_rel = 0
    * (no fully-relevant doc exists) reports recall 0.0.
    *
    * Scale shape: identical to [[precisionAtK]] — the ranking is already
    * ≤ topK rows/query, the k-grid is a broadcast literal, and the
    * denominator is one count over the (query,doc) relevance pairs.
    */
  def recallAtK(ranked: DataFrame, relevance: DataFrame,
                nterms: DataFrame, ks: Seq[Int]): DataFrame = {
    val spark = ranked.sparkSession
    import spark.implicits._
    val binary = ranked.join(relevance, Seq("query_id", "doc_id"), "left")
      .join(broadcast(nterms), Seq("query_id"))
      .select(col("query_id"), col("rk"),
        (coalesce(col("rel"), lit(0L)) === col("nterms")).as("isrel"))
    val tot = relevance.join(broadcast(nterms), Seq("query_id"))
      .filter(col("rel") === col("nterms"))
      .groupBy("query_id").agg(count(lit(1)).as("tot_rel"))
    val kdf = ks.map(_.toLong).toDF("k")
    val counts = binary.crossJoin(broadcast(kdf))
      .groupBy("query_id", "k")
      .agg(sum(when(col("isrel") && col("rk") <= col("k"), 1L).otherwise(0L))
        .as("rel_cnt"))
    nterms.select("query_id").crossJoin(broadcast(kdf))
      .join(counts, Seq("query_id", "k"), "left")
      .join(tot, Seq("query_id"), "left")
      .select(col("query_id"), col("k"),
        coalesce(col("rel_cnt"), lit(0L)).as("rel_cnt"),
        coalesce(col("tot_rel"), lit(0L)).as("tot_rel"),
        when(coalesce(col("tot_rel"), lit(0L)) === 0L, lit(0.0))
          .otherwise(coalesce(col("rel_cnt"), lit(0L)).cast("double")
            / col("tot_rel").cast("double")).as("recall"))
  }

  /** Average precision at k (the per-query term of MAP):
    * AP@k = (Σ_{i ≤ k, pos i relevant} cumRel(i)/i) / min(tot_rel, k),
    * one row per query: (query_id, tot_rel, sum_prec, ap).
    *
    * Exactness: cumRel(i) is an exact integer (per-query running count
    * over integer ranks), so each position's precision term is ONE IEEE
    * division; the k-term position sum is UNROLLED (max(CASE rk=i) terms
    * added left-to-right, the [[ndcg]] trick) so the fp addition order is
    * pinned identically in a SQL oracle; AP is one final division by the
    * exact integer min(tot_rel, k). tot_rel = 0 reports ap 0.0.
    */
  def avgPrecision(ranked: DataFrame, relevance: DataFrame,
                   nterms: DataFrame, k: Int = 20): DataFrame = {
    val binary = ranked.filter(col("rk") <= k)
      .join(relevance, Seq("query_id", "doc_id"), "left")
      .join(broadcast(nterms), Seq("query_id"))
      .select(col("query_id"), col("rk"),
        (coalesce(col("rel"), lit(0L)) === col("nterms")).as("isrel"))
    val w = Window.partitionBy("query_id").orderBy("rk")
    val terms = binary
      .withColumn("cum", sum(when(col("isrel"), 1L).otherwise(0L)).over(w))
      .select(col("query_id"), col("rk"),
        when(col("isrel"), col("cum").cast("double") / col("rk").cast("double"))
          .otherwise(lit(0.0)).as("g"))
    val sums = terms.groupBy("query_id").agg(
      (1 to k).map(i => coalesce(max(when(col("rk") === i, col("g"))), lit(0.0)))
        .reduceLeft(_ + _).as("sum_prec"))
    val tot = relevance.join(broadcast(nterms), Seq("query_id"))
      .filter(col("rel") === col("nterms"))
      .groupBy("query_id").agg(count(lit(1)).as("tot_rel"))
    nterms.select("query_id")
      .join(sums, Seq("query_id"), "left")
      .join(tot, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("tot_rel"), lit(0L)).as("tot_rel"),
        coalesce(col("sum_prec"), lit(0.0)).as("sum_prec"),
        when(coalesce(col("tot_rel"), lit(0L)) === 0L, lit(0.0))
          .otherwise(coalesce(col("sum_prec"), lit(0.0))
            / least(col("tot_rel"), lit(k.toLong)).cast("double")).as("ap"))
  }

  /** Rank-biased overlap (RBO, Webber et al. 2010) at depth k with
    * persistence p = 1/2 between two rankings of the same corpus —
    * the standard top-weighted "how similar are these two orderings"
    * statistic (e.g. BM25 vs a quality prior):
    * RBO@k = (1−p)·Σ_{i=1..k} p^{i−1}·|top_i(A) ∩ top_i(B)|/i.
    *
    * p = 1/2 is chosen deliberately: every weight (1−p)·p^{i−1} = 2^{−i}
    * is an exact dyadic double, each overlap count is an exact integer
    * from ONE join on doc_id (m = max(rk_a, rk_b); overlap@i = #{m ≤ i}),
    * so each term is one division scaled by an exact power of two and the
    * k-term sum is UNROLLED left-to-right — bit-reproducible in any
    * engine. Returns one row (overlap_k, rbo).
    *
    * Scale shape: both inputs are already top-k tables (≤ k rows each);
    * everything after the k-row join is constant-size.
    */
  def rbo(rankA: DataFrame, rankB: DataFrame, k: Int = 10): DataFrame = {
    val joined = rankA.filter(col("rk") <= k).select(col("doc_id"), col("rk").as("rk_a"))
      .join(rankB.filter(col("rk") <= k).select(col("doc_id"), col("rk").as("rk_b")),
        Seq("doc_id"))
      .select(greatest(col("rk_a"), col("rk_b")).as("m"))
    joined.agg(
      sum(when(col("m") <= k, 1L).otherwise(0L)).as("overlap_k"),
      (1 to k).map { i =>
        sum(when(col("m") <= i, 1L).otherwise(0L)).cast("double") /
          lit(i.toDouble) * lit(math.pow(0.5, i))
      }.reduceLeft(_ + _).as("rbo"))
      .select(coalesce(col("overlap_k"), lit(0L)).as("overlap_k"),
        coalesce(col("rbo"), lit(0.0)).as("rbo"))
  }

  /** Population stability index between two samples of an INTEGER score —
    * the model-monitoring standard for "has the input distribution
    * shifted": PSI = Σ_bins (p_a − p_b)·ln(p_a/p_b) over `bins` equal-width
    * bins of the pooled min-max range (top edge closed), add-one smoothed
    * so empty bins stay finite. Returns one row per bin
    * (bin, a_cnt, b_cnt, term, psi) with `psi` the all-bin total repeated.
    *
    * Exactness: bin assignment is PURE INTEGER arithmetic
    * ((s−mn)·bins div (mx−mn) — no fp in the bucketing, unlike a float
    * histogram); the full bin grid is materialized so absent bins
    * contribute their smoothing term; each p is ONE division; the total is
    * an UNROLLED bins-term sum (max(CASE bin=i), left-to-right).
    *
    * Scale shape: one union-sized groupBy(bin) with map-side combine; the
    * grid, totals and psi row are constant-size broadcasts.
    */
  def psi(a: DataFrame, b: DataFrame, bins: Int = 10,
          scoreCol: String = "score"): DataFrame = {
    require(bins >= 1, s"bad bins $bins")
    val spark = a.sparkSession
    import spark.implicits._
    val u = a.select(col(scoreCol).as("s"), lit(0).as("g"))
      .unionByName(b.select(col(scoreCol).as("s"), lit(1).as("g")))
    val mm = u.groupBy().agg(min(col("s")).as("mn"), max(col("s")).as("mx"))
    val binned = u.crossJoin(broadcast(mm))
      .withColumn("bin",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(lit(bins - 1L), expr(s"(s - mn) * $bins div (mx - mn)"))))
    val counts = binned.groupBy("bin").agg(
      sum(when(col("g") === 0, 1L).otherwise(0L)).as("a_cnt"),
      sum(when(col("g") === 1, 1L).otherwise(0L)).as("b_cnt"))
    val tots = counts.groupBy().agg(
      coalesce(sum(col("a_cnt")), lit(0L)).as("ta"),
      coalesce(sum(col("b_cnt")), lit(0L)).as("tb"))
    val pa = (col("a_cnt") + 1L).cast("double") / (col("ta") + bins.toLong).cast("double")
    val pb = (col("b_cnt") + 1L).cast("double") / (col("tb") + bins.toLong).cast("double")
    val terms = (0L until bins.toLong).toDF("bin")
      .join(counts, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("a_cnt"), lit(0L)).as("a_cnt"),
        coalesce(col("b_cnt"), lit(0L)).as("b_cnt"))
      .crossJoin(broadcast(tots))
      .select(col("bin"), col("a_cnt"), col("b_cnt"),
        ((pa - pb) * log(pa / pb)).as("term"))
    val psiRow = terms.groupBy().agg(
      (0 until bins).map(i => coalesce(max(when(col("bin") === i, col("term"))), lit(0.0)))
        .reduceLeft(_ + _).as("psi"))
    terms.crossJoin(broadcast(psiRow))
  }

  /** Cohen's kappa — chance-corrected agreement between a truth and a
    * prediction column — computed as ONE division of exact integers:
    * kappa = (po − pe)/(1 − pe) = (n·A − S) / (n² − S), where A = Σ
    * diagonal (agreeing) counts and S = Σ_class rowTotal·colTotal. Every
    * intermediate is an exact integer (DECIMAL(38,0) cross products), so
    * any engine reproduces the value bit-for-bit. Returns one row
    * (n, agree, s, kappa); the degenerate n² = S case (chance agreement
    * is total, e.g. a single class on both sides) reports 0.0.
    *
    * Scale shape: the corpus-sized pass is ONE groupBy(truth, pred); the
    * margins and the S fold run over the class-pair table (≤ |classes|²
    * rows — tiny and corpus-size-independent).
    */
  def kappa(rows: DataFrame, truthCol: String = "truth",
            predCol: String = "pred"): DataFrame = {
    val dec = "decimal(38,0)"
    val counts = rows.groupBy(col(truthCol).as("t"), col(predCol).as("p"))
      .agg(count(lit(1)).as("cnt"))
    val a = counts.filter(col("t") === col("p"))
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("a"))
    val rt = counts.groupBy("t").agg(sum(col("cnt")).as("rt"))
      .withColumnRenamed("t", "cls")
    val ct = counts.groupBy("p").agg(sum(col("cnt")).as("ct"))
      .withColumnRenamed("p", "cls")
    val s = rt.join(ct, Seq("cls"))
      .agg(coalesce(sum(col("rt").cast(dec) * col("ct")), lit(0).cast(dec)).as("s"))
    val n = counts.agg(coalesce(sum(col("cnt")), lit(0L)).as("n"))
    n.crossJoin(a).crossJoin(s)
      .select(col("n"), col("a").as("agree"), col("s").cast("long").as("s"),
        when(col("n").cast(dec) * col("n") - col("s") === 0, lit(0.0))
          .otherwise((col("n").cast(dec) * col("a") - col("s")).cast("double")
            / (col("n").cast(dec) * col("n") - col("s")).cast("double"))
          .as("kappa"))
  }

  /** Multiclass Matthews correlation coefficient (the R_k statistic) —
    * the chance-and-imbalance-corrected single-number classifier score:
    * R_k = (n·A − S) / sqrt((n² − Sp)·(n² − St)), where A = Σ diagonal
    * counts, S = Σ_class truthTotal·predTotal, Sp = Σ predTotal²,
    * St = Σ truthTotal². The numerator is [[kappa]]'s numerator; only the
    * normalizer differs. Every intermediate is an exact integer
    * (DECIMAL(38,0) cross products); the final value is one IEEE division
    * by a sqrt of a double product — the same pinned shape as [[kendall]]'s
    * tau, so any engine reproduces it bit-for-bit. A degenerate margin
    * (either factor 0 — single truth class or single predicted class)
    * reports 0.0 by convention.
    *
    * Scale shape: ONE corpus-sized groupBy(truth, pred); everything after
    * runs on the |classes|-row margin tables.
    *
    * @return one row (n, agree, s, sp, st, mcc)
    */
  def mcc(rows: DataFrame, truthCol: String = "truth",
          predCol: String = "pred"): DataFrame = {
    val dec = "decimal(38,0)"
    val counts = rows.groupBy(col(truthCol).as("t"), col(predCol).as("p"))
      .agg(count(lit(1)).as("cnt"))
    val a = counts.filter(col("t") === col("p"))
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("a"))
    val rt = counts.groupBy("t").agg(sum(col("cnt")).as("rt"))
      .withColumnRenamed("t", "cls")
    val ct = counts.groupBy("p").agg(sum(col("cnt")).as("ct"))
      .withColumnRenamed("p", "cls")
    // classes on only one side contribute rt·ct = 0, so the inner join is S
    val s = rt.join(ct, Seq("cls"))
      .agg(coalesce(sum(col("rt").cast(dec) * col("ct")), lit(0).cast(dec)).as("s"))
    val sp = ct.agg(coalesce(sum(col("ct").cast(dec) * col("ct")), lit(0).cast(dec)).as("sp"))
    val st = rt.agg(coalesce(sum(col("rt").cast(dec) * col("rt")), lit(0).cast(dec)).as("st"))
    val n = counts.agg(coalesce(sum(col("cnt")), lit(0L)).as("n"))
    val n2 = col("n").cast(dec) * col("n")
    n.crossJoin(a).crossJoin(s).crossJoin(sp).crossJoin(st)
      .select(col("n"), col("a").as("agree"), col("s").cast("long").as("s"),
        col("sp").cast("long").as("sp"), col("st").cast("long").as("st"),
        when(n2 - col("sp") === 0 || n2 - col("st") === 0, lit(0.0))
          .otherwise((col("n").cast(dec) * col("a") - col("s")).cast("double")
            / sqrt((n2 - col("sp")).cast("double")
              * (n2 - col("st")).cast("double"))).as("mcc"))
  }

  /** Macro-averaged F1 over [[f1PerClass]] — Σ_class f1 / |classes|, with
    * the floating-point addition ORDER pinned by folding the per-class F1s
    * in CLASS-SORTED order (sort_array over (cls, f1) structs, then a
    * left-to-right aggregate fold from 0.0 — a groupBy sum's order is
    * partition-dependent; this isn't). Each per-class F1 is itself ONE
    * division of exact integers, so any engine reproduces the macro value
    * bit-for-bit. Returns one row (classes, macro_f1).
    *
    * Scale shape: the corpus-sized pass is f1PerClass's ONE groupBy; the
    * collect_list holds |classes| structs — tiny and corpus-independent.
    */
  def macroF1(rows: DataFrame, truthCol: String, predCol: String): DataFrame = {
    val per = f1PerClass(rows, truthCol, predCol)
    per.agg(count(lit(1)).as("classes"),
        sort_array(collect_list(struct(col("cls"), col("f1")))).as("arr"))
      .select(col("classes"),
        (aggregate(col("arr"), lit(0.0),
          (acc, x) => acc + x.getField("f1"))
          / col("classes").cast("double")).as("macro_f1"))
  }

  /** Brier score of an INTEGER score against a boolean label, with the
    * score min-max-normalized to a confidence p = (score−mn)/(mx−mn) (the
    * same normalization as [[calibrationBins]]): mean (p − y)². Computed
    * EXACTLY: (p − y)² = (off − y·rng)²/rng², so the numerator
    * Σ (off − y·rng)² is an exact integer and the score is ONE division by
    * n·rng² — bit-identical in any engine. Degenerate rng = 0 reports 0.0.
    *
    * Scale shape: one 2-row-broadcast min/max join, one corpus-sized
    * aggregate.
    *
    * @param scored (score: integral, positive: boolean)
    * @return one row (n, num, rng, brier)
    */
  def brier(scored: DataFrame, scoreCol: String = "score",
            labelCol: String = "positive"): DataFrame = {
    val dec = "decimal(38,0)"
    val mm = scored.agg(min(col(scoreCol)).as("mn"), max(col(scoreCol)).as("mx"))
    val err = col("off") - col("y") * col("rng")
    scored.crossJoin(broadcast(mm))
      .select((col(scoreCol) - col("mn")).cast("long").as("off"),
        (col("mx") - col("mn")).cast("long").as("rng"),
        when(col(labelCol), 1L).otherwise(0L).as("y"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum((err.cast(dec) * err)), lit(0).cast(dec)).as("num"),
        max(col("rng")).as("rng"))
      .select(col("n"), col("num").cast("long").as("num"), col("rng"),
        when(col("rng") === 0L || col("rng").isNull, lit(0.0))
          .otherwise(col("num").cast("double")
            / (col("n").cast("double") * col("rng").cast("double")
              * col("rng").cast("double"))).as("brier"))
  }

  /** Exact tie-aware Kendall tau-b between two numeric columns, computed
    * over the DISTINCT-PAIR group table: with G = groupBy(x, y) counts,
    * C − D = Σ over group pairs (a, b) with x_a < x_b of
    * cnt_a·cnt_b·sign(y_b − y_a), and the tie terms are
    * m0 = n(n−1), m1 = Σ_x t_x(t_x−1), m2 = Σ_y t_y(t_y−1) — all DOUBLED
    * (no halving) so every intermediate is an exact integer; then
    * tau_b = 2(C−D) / sqrt((m0−m1)·(m0−m2)), with the product taken in
    * IEEE double exactly as the SQL oracle does. Bit-identical anywhere.
    *
    * Scale shape: the corpus-sized pass is ONE groupBy(x, y); the pair fold
    * is a range self-join of the g-row group table against itself. g is
    * bounded by |dom(x)|·|dom(y)| — INDEPENDENT of corpus size for the
    * quantized/integer statistics this is meant for (int8 codes, binned
    * scores, length buckets) — so the g² term never grows with the data.
    * For unbounded-domain doubles, quantize first; that is the documented
    * contract (an exact Kendall over 10¹² distinct values is O(g log g)
    * with order statistics no SQL engine exposes, and approximations
    * belong in a different operator).
    *
    * @param rows (x: numeric, y: numeric)
    * @return one row (n, cd, tau) — cd = C − D
    */
  def kendall(rows: DataFrame, xCol: String = "x", yCol: String = "y"): DataFrame = {
    val dec = "decimal(38,0)"
    // every downstream branch reads the same groupBy(x,y) subtree, so the
    // one corpus-sized exchange is planned once and shared (ReuseExchange)
    val g = rows.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("cnt"))
    val a = g.select(col("x").as("xa"), col("y").as("ya"), col("cnt").as("ca"))
    val b = g.select(col("x").as("xb"), col("y").as("yb"), col("cnt").as("cb"))
    val sgn = when(col("yb") > col("ya"), lit(1L))
      .when(col("yb") < col("ya"), lit(-1L)).otherwise(lit(0L))
    val cd = a.join(broadcast(b), col("xa") < col("xb"))
      .agg(coalesce(sum(col("ca").cast(dec) * col("cb") * sgn),
        lit(0).cast(dec)).as("cd"))
    val tieX = g.groupBy("x").agg(sum(col("cnt")).as("t"))
      .agg(coalesce(sum((col("t").cast(dec) * (col("t") - 1))), lit(0).cast(dec)).as("m1"))
    val tieY = g.groupBy("y").agg(sum(col("cnt")).as("t"))
      .agg(coalesce(sum((col("t").cast(dec) * (col("t") - 1))), lit(0).cast(dec)).as("m2"))
    val tot = g.agg(sum(col("cnt")).as("n"))
      .select(col("n"), (col("n").cast(dec) * (col("n") - 1)).as("m0"))
    tot.crossJoin(cd).crossJoin(tieX).crossJoin(tieY)
      .select(col("n"), col("cd").cast("long").as("cd"),
        (lit(2.0) * col("cd").cast("double")
          / sqrt((col("m0") - col("m1")).cast("double")
            * (col("m0") - col("m2")).cast("double"))).as("tau"))
  }

  /** Per-cluster purity table for a clustering scored against ground-truth
    * labels: (cluster, size, majority_label, majority_cnt) — every column
    * an exact integer, majority ties broken to the smallest label, so the
    * table is hash-exact in any engine. Corpus purity = Σ majority_cnt / Σ
    * size, derivable from the rows (kept integer here so the oracle needs
    * no float discipline at all).
    */
  def purityByCluster(assign: DataFrame, labels: DataFrame): DataFrame = {
    val cnt = assign.join(labels, Seq("vec_id"))
      .groupBy("cluster", "label").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("cluster").orderBy(col("c").desc, col("label").asc)
    cnt.withColumn("rn", row_number().over(w))
      .groupBy("cluster")
      .agg(sum(col("c")).as("size"),
        max(when(col("rn") === 1, col("label"))).as("majority_label"),
        max(when(col("rn") === 1, col("c"))).as("majority_cnt"))
  }

  /** Per-point SIMPLIFIED silhouette over integer codes: squared-L2
    * distances (exact 64-bit integers), a(i) = mean d² to own cluster
    * (excluding self), b(i) = min over other clusters of mean d², s =
    * (b−a)/max(a,b); singleton clusters (a undefined) score 0 by the
    * standard convention, as does the degenerate all-identical case
    * (max = 0). Every s is a FIXED chain on exact integers — integer sums,
    * one division per mean, an order-free min — so the whole column is
    * engine-reproducible bit-for-bit with no tolerance.
    *
    * This is the exact all-pairs eval baseline (O(n²) distances — fine at
    * evaluation scale; sample the corpus first at 100 TB, the standard
    * practice). Inputs: codes (vec_id, x: array<long>), assign (vec_id,
    * cluster); returns (vec_id, cluster, s).
    */
  def silhouetteInt8(codes: DataFrame, assign: DataFrame): DataFrame = {
    val x = codes.join(assign, Seq("vec_id"))
    val l = x.select(col("vec_id").as("i"), col("x").as("xi"), col("cluster").as("ci"))
    val r = x.select(col("vec_id").as("j"), col("x").as("xj"), col("cluster").as("cj"))
    val per = l.join(r, col("i") =!= col("j"))
      .select(col("i"), col("ci"), col("cj"),
        aggregate(zip_with(col("xi"), col("xj"), (u, v) => (u - v) * (u - v)),
          lit(0L), _ + _).as("d2"))
      .groupBy("i", "ci", "cj").agg(sum(col("d2")).as("sd"), count(lit(1)).as("c"))
    val a = per.filter(col("cj") === col("ci"))
      .select(col("i"), (col("sd").cast("double") / col("c")).as("a"))
    val b = per.filter(col("cj") =!= col("ci"))
      .groupBy("i").agg(min(col("sd").cast("double") / col("c")).as("b"))
    assign.select(col("vec_id"), col("cluster"))
      .join(a, col("vec_id") === a("i"), "left").drop("i")
      .join(b, col("vec_id") === b("i"), "left").drop("i")
      .select(col("vec_id"), col("cluster"),
        when(col("a").isNull || col("b").isNull, 0.0)
          .when(greatest(col("a"), col("b")) === 0.0, 0.0)
          .otherwise((col("b") - col("a")) / greatest(col("a"), col("b"))).as("s"))
  }

  /** Pair-counting agreement between two clusterings of the same ids —
    * Rand index and Adjusted Rand Index (Hubert–Arabie), the standard way
    * to score a near-dup clustering against an exact/reference partition.
    * Every aggregate is an exact integer (Σ C(n_ij,2) over the contingency
    * cells and Σ C(a_i,2)/Σ C(b_j,2) over the marginals; all ≤ C(n,2)² in
    * magnitude, within long for n up to ~3·10⁹ pairs), and each output is
    * a fixed chain of IEEE ops on those integers — one division for Rand,
    * the Hubert–Arabie expected-index form for ARI — so any SQL engine
    * reproduces both doubles bit-for-bit.
    *
    * Inputs are (doc_id, rep_id) tables; returns one row
    * (n, rand_index, ari).
    */
  def clusterAgreement(x: DataFrame, y: DataFrame): DataFrame = {
    val j = x.select(col("doc_id"), col("rep_id").as("ra"))
      .join(y.select(col("doc_id"), col("rep_id").as("rb")), Seq("doc_id"))
      .cache()
    def pairs(c: Column): Column = (c * (c - 1) / 2).cast("long")
    val a = j.groupBy("ra", "rb").agg(count(lit(1)).as("c"))
      .agg(sum(pairs(col("c"))).as("a"))
    val sa = j.groupBy("ra").agg(count(lit(1)).as("c"))
      .agg(sum(pairs(col("c"))).as("sa"))
    val sb = j.groupBy("rb").agg(count(lit(1)).as("c"))
      .agg(sum(pairs(col("c"))).as("sb"))
    val nn = j.agg(count(lit(1)).as("n"))
    val c2n = pairs(col("n"))
    val exp = (col("sa") * col("sb")).cast("double") / c2n.cast("double")
    nn.crossJoin(a).crossJoin(sa).crossJoin(sb)
      .select(col("n"),
        ((c2n + lit(2L) * col("a") - col("sa") - col("sb")).cast("double")
          / c2n.cast("double")).as("rand_index"),
        ((col("a").cast("double") - exp)
          / ((col("sa") + col("sb")).cast("double") / 2.0 - exp)).as("ari"))
  }
}
