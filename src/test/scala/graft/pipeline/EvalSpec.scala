package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Evaluation operators: exact tie-aware AUC against hand-computed
  * Mann-Whitney values; confusion-matrix counts.
  */
class EvalSpec extends SparkTestBase {
  import spark.implicits._

  test("auc: hand case with ties matches the tie-corrected Mann-Whitney value") {
    // scores: pos {3, 2, 2}, neg {2, 1}; pairs P*N = 6:
    //   (3 vs 2): 1, (3 vs 1): 1, (2 vs 2): 0.5 twice, (2 vs 1): 1 twice
    // => U = 5, AUC = 5/6
    val d = Seq((3L, true), (2L, true), (2L, true), (2L, false), (1L, false))
      .toDF("score", "positive")
    val r = Eval.auc(d).collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((3L, 2L)))
    assert(r.getDouble(2) == 5.0 / 6.0, r.getDouble(2).toString)

    // perfect and inverted separations
    val perfect = Seq((10L, true), (9L, true), (1L, false)).toDF("score", "positive")
    assert(Eval.auc(perfect).collect()(0).getDouble(2) == 1.0)
    val inverted = Seq((1L, true), (9L, false)).toDF("score", "positive")
    assert(Eval.auc(inverted).collect()(0).getDouble(2) == 0.0)
    // all-tied scores: AUC exactly 1/2
    val tied = Seq((5L, true), (5L, false), (5L, true), (5L, false))
      .toDF("score", "positive")
    assert(Eval.auc(tied).collect()(0).getDouble(2) == 0.5)
    // partitioning-invariant (integer sums)
    assert(Eval.auc(d.repartition(5)).collect()(0).getDouble(2) == 5.0 / 6.0)
  }

  test("spearman: hand cases — monotone, inverted, tie-corrected") {
    // perfectly monotone and perfectly inverted
    val mono = Seq((1L, 10L), (2L, 20L), (3L, 25L)).toDF("x", "y")
    assert(Eval.spearman(mono).collect()(0).getDouble(1) == 1.0)
    val inv = Seq((1L, 9L), (2L, 5L), (3L, 1L)).toDF("x", "y")
    assert(Eval.spearman(inv).collect()(0).getDouble(1) == -1.0)

    // tie case, hand-computed: x = (1,2,2,3), y = (1,3,2,4)
    // avg ranks: ax = (1, 2.5, 2.5, 4), ay = (1, 3, 2, 4); both means 2.5
    // deviations dx = (-1.5, 0, 0, 1.5), dy = (-1.5, .5, -.5, 1.5)
    // Σdxdy = 4.5, Σdx² = 4.5, Σdy² = 5  => rho = 4.5/sqrt(4.5·5)
    val tied = Seq((1L, 1L), (2L, 3L), (2L, 2L), (3L, 4L)).toDF("x", "y")
    val rho = Eval.spearman(tied).collect()(0).getDouble(1)
    assert(math.abs(rho - 4.5 / math.sqrt(4.5 * 5.0)) < 1e-15, rho.toString)

    // partitioning-invariant (integer moments)
    assert(Eval.spearman(tied.repartition(7)).collect()(0).getDouble(1) == rho)
  }

  test("kendall: monotone, inverted, ties — matches the brute tau-b") {
    def brute(xs: Seq[(Long, Long)]): (Long, Double) = {
      val ps = for (i <- xs.indices; j <- xs.indices if i < j) yield {
        val sx = math.signum((xs(j)._1 - xs(i)._1).toDouble)
        val sy = math.signum((xs(j)._2 - xs(i)._2).toDouble)
        (sx * sy).toLong
      }
      val cd = ps.sum
      val n = xs.size.toLong
      val m0 = n * (n - 1)
      val m1 = xs.groupBy(_._1).values.map(g => g.size.toLong * (g.size - 1)).sum
      val m2 = xs.groupBy(_._2).values.map(g => g.size.toLong * (g.size - 1)).sum
      (cd, 2.0 * cd / math.sqrt((m0 - m1).toDouble * (m0 - m2).toDouble))
    }
    val mono = Seq((1L, 10L), (2L, 20L), (3L, 25L))
    val rMono = Eval.kendall(mono.toDF("x", "y")).collect()(0)
    assert(rMono.getDouble(2) == 1.0 && rMono.getLong(1) == 3L)
    val inv = Seq((1L, 9L), (2L, 5L), (3L, 1L))
    assert(Eval.kendall(inv.toDF("x", "y")).collect()(0).getDouble(2) == -1.0)

    // tie-heavy fixed case, differential vs the O(n²) brute fold
    val tied = Seq((1L, 1L), (2L, 3L), (2L, 2L), (3L, 4L), (3L, 4L),
      (1L, 4L), (5L, 2L), (5L, 5L), (2L, 2L), (4L, 1L))
    val (bcd, btau) = brute(tied)
    val r = Eval.kendall(tied.toDF("x", "y")).collect()(0)
    assert(r.getLong(0) == 10L)
    assert(r.getLong(1) == bcd, s"cd ${r.getLong(1)} vs brute $bcd")
    assert(math.abs(r.getDouble(2) - btau) < 1e-15, r.getDouble(2).toString)

    // duplicate-count weighting: exploding a group is the same as counting it
    val dup = tied ++ tied
    val (bcd2, btau2) = brute(dup)
    val r2 = Eval.kendall(dup.toDF("x", "y").repartition(7)).collect()(0)
    assert(r2.getLong(1) == bcd2 && math.abs(r2.getDouble(2) - btau2) < 1e-15)
  }

  test("calibrationBins: hand case — bin edges, acc, conf; degenerate range") {
    // scores 0..10, mn=0 mx=10: conf = s/10; bins of width 0.1; score 10 -> bin 9
    val d = Seq((0L, false), (1L, false), (5L, true), (9L, true), (10L, true))
      .toDF("score", "positive")
    val got = Eval.calibrationBins(d, bins = 10).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got.keySet == Set(0, 1, 5, 9), got.toString)
    assert(got(0) == ((1L, 0L, 0.0, 0.0)))
    assert(got(1) == ((1L, 0L, 0.0, 0.1)))
    assert(got(5) == ((1L, 1L, 1.0, 0.5)))
    // bin 9 holds scores 9 and 10: conf = (9+10)/(2*10) = 0.95, acc = 1
    assert(got(9) == ((2L, 2L, 1.0, 0.95)), got(9).toString)

    // ECE from the bins: sum cnt/n * |acc-conf|
    val n = got.values.map(_._1).sum
    val ece = got.values.map { case (c, _, a, cf) => c.toDouble / n * math.abs(a - cf) }.sum
    assert(math.abs(ece - (0.2 * 0.0 + 0.2 * 0.1 + 0.2 * 0.5 + 0.4 * 0.05)) < 1e-15)

    // all-equal scores collapse to bin 0 with conf 0
    val flat = Seq((7L, true), (7L, false)).toDF("score", "positive")
    val f = Eval.calibrationBins(flat).collect()
    assert(f.length == 1 && f(0).getInt(0) == 0 && f(0).getDouble(4) == 0.0)
  }

  test("prCurve: hand case — thresholds descending, exact tp/fp") {
    // scores: pos {3, 2}, neg {2, 1}
    val d = Seq((3L, true), (2L, true), (2L, false), (1L, false))
      .toDF("score", "positive")
    val got = Eval.prCurve(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got(3L) == ((1L, 0L, 1.0, 0.5)))          // t=3: only the top pos
    assert(got(2L) == ((2L, 1L, 2.0 / 3.0, 1.0)))    // t=2: both pos, one neg
    assert(got(1L) == ((2L, 2L, 0.5, 1.0)))          // t=1: everything
  }

  test("f1PerClass: hand-computed metrics incl. pred-only / truth-only classes") {
    // truths: en,en,en,de,fr ; preds: en,en,de,de,xx
    val d = Seq(("en", "en"), ("en", "en"), ("en", "de"),
      ("de", "de"), ("fr", "xx")).toDF("lang", "pred_lang")
    val got = Eval.f1PerClass(d, "lang", "pred_lang").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    // en: tp=2, pred=2, truth=3 -> P=1, R=2/3, F1=4/5
    assert(got("en") == ((2L, 2L, 3L, 1.0, 2.0 / 3.0, 0.8)), got("en").toString)
    // de: tp=1, pred=2, truth=1 -> P=1/2, R=1, F1=2/3
    assert(got("de") == ((1L, 2L, 1L, 0.5, 1.0, 2.0 / 3.0)))
    // fr truth-only: all zero-division metrics report 0
    assert(got("fr") == ((0L, 0L, 1L, 0.0, 0.0, 0.0)))
    // xx pred-only: a row exists with truth_total 0
    assert(got("xx") == ((0L, 1L, 0L, 0.0, 0.0, 0.0)))
  }

  test("confusion: counts and truth totals on a hand case") {
    val d = Seq(("en", "en"), ("en", "en"), ("en", "de"),
      ("de", "de"), ("fr", "en")).toDF("lang", "pred_lang")
    val got = Eval.confusion(d, "lang", "pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      ("en", "en") -> ((2L, 3L)), ("en", "de") -> ((1L, 3L)),
      ("de", "de") -> ((1L, 1L)), ("fr", "en") -> ((1L, 1L))), got.toString)
  }

  test("mrr: hand ranking, no-hit and rankless queries keep zero rows") {
    val ranked = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L)).toDF("query_id", "doc_id", "rk")
    val rel = Seq((1L, 11L, 2L), (1L, 12L, 1L), (2L, 20L, 1L))
      .toDF("query_id", "doc_id", "rel")
    val nt = Seq((1L, 2L), (2L, 2L), (3L, 1L)).toDF("query_id", "nterms")
    val got = Eval.mrr(ranked, rel, nt).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // q1: first fully-relevant (rel==2) is doc 11 at rank 2 -> rr 0.5;
    // q2: no doc reaches rel==2 -> (0, 0.0); q3: never ranked -> (0, 0.0)
    assert(got == Map(1L -> ((2L, 0.5)), 2L -> ((0L, 0.0)), 3L -> ((0L, 0.0))), got.toString)
  }

  test("precisionAtK: hand counts incl. a rankless query; partition-stable") {
    val ranked = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L), (2L, 21L, 2L))
      .toDF("query_id", "doc_id", "rk")
    val rel = Seq((1L, 11L, 2L), (2L, 20L, 1L)).toDF("query_id", "doc_id", "rel")
    val nt = Seq((1L, 2L), (2L, 2L), (3L, 1L)).toDF("query_id", "nterms")
    val got = Eval.precisionAtK(ranked, rel, nt, ks = Seq(1, 2)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      (1L, 1L) -> ((0L, 0.0)), (1L, 2L) -> ((1L, 0.5)),   // doc11 relevant at rank 2
      (2L, 1L) -> ((0L, 0.0)), (2L, 2L) -> ((0L, 0.0)),   // rel 1 != nterms 2
      (3L, 1L) -> ((0L, 0.0)), (3L, 2L) -> ((0L, 0.0))), got.toString)
    val got7 = Eval.precisionAtK(ranked.repartition(7), rel.repartition(3), nt, Seq(1, 2))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got7 == got)
  }

  test("ndcg: hand gains vs a scala replica; perfect ranking scores 1.0") {
    val ln2 = math.log(2.0)
    // q1 ranking [rel 0, rel 2, rel 1]; ideal [2, 1] -> ndcg < 1
    val ranked = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (2L, 20L, 1L))
      .toDF("query_id", "doc_id", "rk")
    val rel = Seq((1L, 11L, 2L), (1L, 12L, 1L), (2L, 20L, 1L))
      .toDF("query_id", "doc_id", "rel")
    val got = Eval.ndcg(ranked, rel, k = 3).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dcg1 = 0.0 + 2.0 * ln2 / math.log(3.0) + 1.0 * ln2 / math.log(4.0)
    val idcg1 = 2.0 * ln2 / math.log(2.0) + 1.0 * ln2 / math.log(3.0)
    assert(got(1L) == ((r6(dcg1), r6(idcg1), r6(dcg1 / idcg1))), got(1L).toString)
    assert(got(2L) == ((1.0, 1.0, 1.0)))
    // partition layout changes nothing (the unrolled sum pins the order)
    val got7 = Eval.ndcg(ranked.repartition(5), rel.repartition(3), k = 3).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got7 == got)
  }

  test("kappa: hand confusion, perfect, degenerate single-class, partition-stable") {
    // counts: (a,a)=3 (a,b)=1 (b,a)=1 (b,b)=5 -> n=10, A=8
    // rowTot a=4 b=6; colTot a=4 b=6; S = 16 + 36 = 52
    // kappa = (10*8 - 52) / (100 - 52) = 28/48 = 7/12
    val d = (Seq.fill(3)(("a", "a")) ++ Seq(("a", "b"), ("b", "a")) ++
      Seq.fill(5)(("b", "b"))).toDF("truth", "pred")
    val r = Eval.kappa(d).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((10L, 8L, 52L)))
    assert(r.getDouble(3) == 28.0 / 48.0, r.getDouble(3).toString)
    // perfect agreement over 2 classes -> kappa 1.0
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("truth", "pred")
    assert(Eval.kappa(perfect).collect()(0).getDouble(3) == 1.0)
    // single class on both sides: n^2 == S -> degenerate 0.0 by convention
    val degen = Seq(("x", "x"), ("x", "x")).toDF("truth", "pred")
    assert(Eval.kappa(degen).collect()(0).getDouble(3) == 0.0)
    // partition layout changes nothing
    val r7 = Eval.kappa(d.repartition(7)).collect()(0)
    assert(r7.getDouble(3) == r.getDouble(3))
  }

  test("mcc: hand confusion, binary closed form, degenerate margins, partition-stable") {
    // same confusion as the kappa test: (a,a)=3 (a,b)=1 (b,a)=1 (b,b)=5
    // n=10, A=8, S=52, Sp = 4²+6² = 52, St = 52
    // binary MCC = (tp·tn − fp·fn)/sqrt((tp+fp)(tp+fn)(tn+fp)(tn+fn))
    //            = (3·5 − 1·1)/sqrt(4·4·6·6) = 14/24
    // multiclass R_k must agree on the 2-class case:
    // (10·8 − 52)/sqrt((100−52)(100−52)) = 28/48 = 14/24 ✓
    val d = (Seq.fill(3)(("a", "a")) ++ Seq(("a", "b"), ("b", "a")) ++
      Seq.fill(5)(("b", "b"))).toDF("truth", "pred")
    val r = Eval.mcc(d).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((10L, 8L, 52L, 52L, 52L)))
    assert(r.getDouble(5) == 28.0 / math.sqrt(48.0 * 48.0), r.getDouble(5).toString)
    // perfect agreement -> 1.0
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("truth", "pred")
    assert(Eval.mcc(perfect).collect()(0).getDouble(5) == 1.0)
    // single predicted class: n² == Sp -> degenerate 0.0 by convention
    val degen = Seq(("x", "x"), ("y", "x")).toDF("truth", "pred")
    assert(Eval.mcc(degen).collect()(0).getDouble(5) == 0.0)
    // partition layout changes nothing
    assert(Eval.mcc(d.repartition(7)).collect()(0).getDouble(5) == r.getDouble(5))
  }

  test("macroF1: hand case incl. a pred-only class; fold order partition-stable") {
    // (a,a)=2 (a,b)=1 (b,b)=1 (b,c)=1:
    //  a: tp=2 predTot=2 truthTot=3 -> f1 = 4/5
    //  b: tp=1 predTot=2 truthTot=2 -> f1 = 2/4
    //  c: tp=0 predTot=1 truthTot=0 -> f1 = 0
    // macro = ((0 + 0.8) + 0.5 + 0.0)/3  (class-sorted left-to-right)
    val d = (Seq.fill(2)(("a", "a")) ++ Seq(("a", "b"), ("b", "b"), ("b", "c")))
      .toDF("truth", "pred")
    val r = Eval.macroF1(d, "truth", "pred").collect()(0)
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == ((0.0 + 4.0 / 5.0) + 2.0 / 4.0 + 0.0) / 3.0,
      r.getDouble(1).toString)
    val r7 = Eval.macroF1(d.repartition(7), "truth", "pred").collect()(0)
    assert(r7.getDouble(1) == r.getDouble(1))
  }

  test("brier: exact rational hand case, perfect, worst, degenerate rng=0") {
    // scores {0, 5, 10}, labels {F, T, T}: mn=0 rng=10
    // p = (0, .5, 1), y = (0, 1, 1) -> errs² = (0² + (5−10)² + 0²) = 25
    // brier = 25 / (3·100) = 1/12
    val d = Seq((0L, false), (5L, true), (10L, true)).toDF("score", "positive")
    val r = Eval.brier(d).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 25L, 10L)))
    assert(r.getDouble(3) == 25.0 / 300.0, r.getDouble(3).toString)
    // perfectly calibrated extremes -> 0.0
    val perfect = Seq((0L, false), (10L, true)).toDF("score", "positive")
    assert(Eval.brier(perfect).collect()(0).getDouble(3) == 0.0)
    // perfectly anti-calibrated -> 1.0
    val worst = Seq((10L, false), (0L, true)).toDF("score", "positive")
    assert(Eval.brier(worst).collect()(0).getDouble(3) == 1.0)
    // constant score: rng=0 -> 0.0 by convention
    val flat = Seq((7L, true), (7L, false)).toDF("score", "positive")
    assert(Eval.brier(flat).collect()(0).getDouble(3) == 0.0)
    // partition layout changes nothing (integer numerator)
    assert(Eval.brier(d.repartition(5)).collect()(0).getDouble(3) == 25.0 / 300.0)
  }
}
