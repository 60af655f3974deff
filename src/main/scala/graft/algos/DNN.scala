package graft.algos

import org.apache.spark.sql.SparkSession
import graft.core.{BinOp, GBMatrix, Iterate, Semiring}

/** Sparse-DNN inference (GraphChallenge) with the reference's semantics
  * (GraphBLAS/@GrB/dnn.m:50-60): per layer k,
  *   Y = Y ⊕.⊗ W(k)            (+.* mxm)
  *   Y = select(Y ⊕.⊕ bias(k), '>0')   (+.+ mxm against the diagonal bias
  *                                      matrix = colScale with plus; ReLU)
  *   Y(Y > 32) = 32            (clip via scalar subassign)
  */
object DNN {

  /** @param y0     input features (rows = samples, cols = neurons)
    * @param layers (weight matrix, bias vector (id,v)) per layer
    */
  def run(spark: SparkSession, y0: GBMatrix,
          layers: Seq[(GBMatrix, org.apache.spark.sql.DataFrame)],
          clip: Double = 32.0): GBMatrix = {
    var y = GBMatrix(Iterate.cut(y0.df))
    for ((w, bias) <- layers) {
      val yw = y.mxm(w, Semiring.PlusTimes)
      val biased = yw.colScale(bias, BinOp.PlusOp) // Y + bias(j) per column j
      val relu = biased.select((_, _, v) => v > 0.0)
      val clipped = relu.assignScalar((_, _, v) => v > clip, clip)
      val next = GBMatrix(Iterate.cut(clipped.df))
      Iterate.free(y.df)
      y = next
    }
    y
  }
}
