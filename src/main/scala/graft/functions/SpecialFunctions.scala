package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.{GraftSqlInternals => GI}
import org.apache.spark.sql.graft.{Erf, Erfc, Gamma, LGamma, FrexpX, FrexpE}

/** The special-function tail of the reference's unary-op inventory —
  * GxB_ERF/ERFC/TGAMMA/LGAMMA/FREXPX/FREXPE (GraphBLAS.h:849-950) — which has
  * no Spark builtin, implemented as native Catalyst Expressions WITH
  * `doGenCode`: the generated Java calls the same static `SpecialMath`
  * methods the interpreted path uses, so the expressions stay inside
  * whole-stage codegen (no UDF boxing, no codegen fallback).
  */
object SpecialMath {

  /** erf via its Maclaurin series for |x| <= 2 (max term ~x^2=4 → no
    * destructive cancellation in double) and the continued-fraction erfc
    * (modified Lentz) beyond — both classical, ~1e-14 absolute.
    */
  def erf(x: Double): Double =
    if (x.isNaN) x
    else if (x >= 6.0) 1.0
    else if (x <= -6.0) -1.0
    else if (math.abs(x) <= 2.0) {
      val x2 = x * x
      var term = x; var sum = x; var n = 1
      while (math.abs(term) > 1e-18 * math.abs(sum) && n < 200) {
        term = -term * x2 / n
        sum += term / (2 * n + 1)
        n += 1
      }
      sum * 2.0 / math.sqrt(math.Pi)
    } else if (x > 0) 1.0 - erfc(x)
    else erfc(-x) - 1.0

  /** Complementary error function; for x > 2 the Laplace continued fraction
    * erfc(x) = exp(-x²)/√π · 1/(x + (1/2)/(x + 1/(x + (3/2)/(x + ...))))
    * evaluated with modified Lentz; elsewhere 1 - erf(x).
    */
  def erfc(x: Double): Double =
    if (x.isNaN) x
    else if (x > 27.2) 0.0 // exp(-x^2) underflows
    else if (x <= 2.0) 1.0 - erf(x)
    else {
      val tiny = 1e-300
      var f = x; var c = f; var d = 0.0
      var k = 1
      var delta = 0.0
      do {
        val a = k / 2.0 // a_k = k/2
        d = x + a * d; if (d == 0.0) d = tiny
        c = x + a / c; if (c == 0.0) c = tiny
        d = 1.0 / d
        delta = c * d
        f *= delta
        k += 1
      } while (math.abs(delta - 1.0) > 1e-16 && k < 300)
      math.exp(-x * x) / (f * math.sqrt(math.Pi))
    }

  // Lanczos approximation, g = 7, n = 9 (the widely published coefficient
  // set; ~15 significant digits over the real line via reflection)
  private val LanczosG = 7.0
  private val LanczosC = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  /** log|Γ(x)|; +∞ at the poles (non-positive integers). */
  def lgamma(x: Double): Double =
    if (x.isNaN) x
    else if (x == Double.PositiveInfinity) x
    else if (x < 0.5) {
      // reflection: Γ(x)Γ(1-x) = π/sin(πx)
      val s = math.sin(math.Pi * x)
      if (s == 0.0) Double.PositiveInfinity
      else math.log(math.Pi / math.abs(s)) - lgamma(1.0 - x)
    } else {
      val z = x - 1.0
      var a = LanczosC(0)
      var i = 1
      while (i < LanczosC.length) { a += LanczosC(i) / (z + i); i += 1 }
      val t = z + LanczosG + 0.5
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
    }

  /** Γ(x) (tgamma): Lanczos directly for x ≥ 0.5, reflection below; NaN at
    * the poles' sign ambiguity is avoided — poles yield ±∞ per C tgamma.
    */
  def gamma(x: Double): Double =
    if (x.isNaN) x
    else if (x == Double.PositiveInfinity) x
    else if (x < 0.5) {
      val s = math.sin(math.Pi * x)
      if (s == 0.0) { // pole at 0, -1, -2, ...
        if (x == 0.0) 1.0 / x else Double.NaN // C tgamma: ±inf at 0, NaN at -n
      } else math.Pi / (s * gamma(1.0 - x))
    } else {
      val z = x - 1.0
      var a = LanczosC(0)
      var i = 1
      while (i < LanczosC.length) { a += LanczosC(i) / (z + i); i += 1 }
      val t = z + LanczosG + 0.5
      math.sqrt(2.0 * math.Pi) * math.pow(t, z + 0.5) * math.exp(-t) * a
    }

  /** C frexp's exponent e with x = m·2^e, m ∈ [0.5, 1): GxB_FREXPE.
    * Subnormals are pre-scaled by 2^54 so getExponent is exact; 0/inf/NaN
    * return 0 (glibc convention).
    */
  def frexpe(x: Double): Double =
    if (x == 0.0 || x.isNaN || x.isInfinite) 0.0
    else {
      var v = x; var adj = 0
      if (math.abs(v) < java.lang.Double.MIN_NORMAL) {
        v = v * 1.8014398509481984e16 // 2^54
        adj = -54
      }
      (java.lang.Math.getExponent(v) + 1 + adj).toDouble
    }

  /** C frexp's mantissa m ∈ ±[0.5, 1): GxB_FREXPX; 0/inf/NaN pass through. */
  def frexpx(x: Double): Double =
    if (x == 0.0 || x.isNaN || x.isInfinite) x
    else java.lang.Math.scalb(x, -frexpe(x).toInt)
}

/** Column-level entry points (the `functions._`-style surface). */
object SpecialFunctions {
  private def wrap(f: Expression => Expression)(c: Column): Column =
    GI.column(f(GI.expression(c)))
  val erf:    Column => Column = wrap(Erf.apply)
  val erfc:   Column => Column = wrap(Erfc.apply)
  val gamma:  Column => Column = wrap(Gamma.apply)
  val lgamma: Column => Column = wrap(LGamma.apply)
  val frexpx: Column => Column = wrap(FrexpX.apply)
  val frexpe: Column => Column = wrap(FrexpE.apply)
}
