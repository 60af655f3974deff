package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType}

import graft.functions.SpecialMath

/** Shared shape of the six special-function expressions: double → double,
  * null-safe, whole-stage-codegen'd via a static-method call.
  */
abstract class SpecialUnary extends UnaryExpression with ExpectsInputTypes {
  protected def fn: String // static method name on SpecialMath
  protected def eval0(x: Double): Double
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = fn
  override protected def nullSafeEval(input: Any): Any = eval0(input.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SpecialMath.$fn($c)")
}

case class Erf(child: Expression) extends SpecialUnary {
  protected def fn = "erf"; protected def eval0(x: Double) = SpecialMath.erf(x)
  override protected def withNewChildInternal(c: Expression): Erf = copy(child = c)
}
case class Erfc(child: Expression) extends SpecialUnary {
  protected def fn = "erfc"; protected def eval0(x: Double) = SpecialMath.erfc(x)
  override protected def withNewChildInternal(c: Expression): Erfc = copy(child = c)
}
case class Gamma(child: Expression) extends SpecialUnary {
  protected def fn = "gamma"; protected def eval0(x: Double) = SpecialMath.gamma(x)
  override protected def withNewChildInternal(c: Expression): Gamma = copy(child = c)
}
case class LGamma(child: Expression) extends SpecialUnary {
  protected def fn = "lgamma"; protected def eval0(x: Double) = SpecialMath.lgamma(x)
  override protected def withNewChildInternal(c: Expression): LGamma = copy(child = c)
}
case class FrexpX(child: Expression) extends SpecialUnary {
  protected def fn = "frexpx"; protected def eval0(x: Double) = SpecialMath.frexpx(x)
  override protected def withNewChildInternal(c: Expression): FrexpX = copy(child = c)
}
case class FrexpE(child: Expression) extends SpecialUnary {
  protected def fn = "frexpe"; protected def eval0(x: Double) = SpecialMath.frexpe(x)
  override protected def withNewChildInternal(c: Expression): FrexpE = copy(child = c)
}

/** SQL-surface registration for the special-function expressions, so the
  * reference's scalar-op tail is reachable from `spark.sql(...)` as well as
  * the typed Column API: `gb_erf/gb_erfc/gb_gamma/gb_lgamma/gb_frexpx/
  * gb_frexpe`. Two entry points, one function list:
  *
  *  - [[SpecialFunctionRegistry.register]] — add to an EXISTING session's
  *    function registry (session-scoped, the notebook/REPL path);
  *  - [[graft.GraftExtensions]] — a `SparkSessionExtensions` injector for
  *    `spark-submit --conf spark.sql.extensions=graft.GraftExtensions`
  *    (cluster-wide, applied at session build).
  *
  * Both produce the same codegen'd Expressions the Column API uses — the
  * SQL path pays zero extra cost.
  */
object SpecialFunctionRegistry {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private def unary(name: String, f: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[SpecialUnary].getName, name),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name expects exactly 1 argument, got ${args.length}")
        f(args.head)
      })

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    unary("gb_erf", Erf), unary("gb_erfc", Erfc),
    unary("gb_gamma", Gamma), unary("gb_lgamma", LGamma),
    unary("gb_frexpx", FrexpX), unary("gb_frexpe", FrexpE))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }

  def inject(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    all.foreach(ext.injectFunction)
}

