package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Fused vector kernels for the similarity/ANN hot path: one pass over two
  * numeric arrays with a double accumulator, no intermediate array. The
  * `zip_with` + `aggregate` higher-order form is codegen'd too, but it
  * materializes the elementwise product array per row and pays a lambda
  * dispatch per element; these are the tight loops you actually want under
  * a 10⁹-vector scan. Used by [[graft.pipeline.Similarity]]; the HOF forms
  * remain the readable spec in its scaladoc.
  *
  * Contract: dense arrays (no null elements — embeddings are dense by
  * construction); the fold runs over min(len(a), len(b)) in element order,
  * products in double precision. Null ARRAY inputs are null-propagated by
  * [[BinaryExpression]].
  */
abstract class VecFold extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float|double> args, got ${left.dataType} / ${right.dataType}")

  /** per-element combine in the interpreted path */
  protected def combine(x: Double, y: Double): Double
  /** Java source for the per-element combine, given element vars `x`, `y`. */
  protected def combineCode(x: String, y: String): String

  private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case _ => throw new IllegalStateException("unreachable: checked input types")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (la, ra) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left).get, elemType(right).get)
    val n = math.min(la.numElements(), ra.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += combine(get(la, i, lt), get(ra, i, rt)); i += 1 }
    acc
  }

  private def getCode(arr: String, i: String, t: DataType): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val (lt, rt) = (elemType(left).get, elemType(right).get)
      val (n, i, acc, x, y) = (ctx.freshName("n"), ctx.freshName("i"),
        ctx.freshName("acc"), ctx.freshName("x"), ctx.freshName("y"))
      s"""
         |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${getCode(l, i, lt)};
         |  double $y = ${getCode(r, i, rt)};
         |  $acc += ${combineCode(x, y)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ — the inner product. */
case class VecDot(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "vec_dot"
  protected def combine(x: Double, y: Double): Double = x * y
  protected def combineCode(x: String, y: String): String = s"$x * $y"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Σ (aᵢ−bᵢ)² — squared L2 distance. */
case class VecSqDist(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "vec_sqdist"
  protected def combine(x: Double, y: Double): Double = { val d = x - y; d * d }
  protected def combineCode(x: String, y: String): String = s"($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSqDist =
    copy(left = l, right = r)
}
