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

  test("confusion: counts and truth totals on a hand case") {
    val d = Seq(("en", "en"), ("en", "en"), ("en", "de"),
      ("de", "de"), ("fr", "en")).toDF("lang", "pred_lang")
    val got = Eval.confusion(d, "lang", "pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      ("en", "en") -> ((2L, 3L)), ("en", "de") -> ((1L, 3L)),
      ("de", "de") -> ((1L, 1L)), ("fr", "en") -> ((1L, 1L))), got.toString)
  }
}
