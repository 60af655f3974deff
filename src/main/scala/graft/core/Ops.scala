package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's string-named elementwise function inventory as Column
  * builders — the @GrB string-op surface (`'sqrt'`, `'+.2nd.double'`, …;
  * /root/reference/Include/GraphBLAS.h:782-950 unary, :986-1390 binary)
  * resolved to codegen'd Catalyst expressions over the engine's double
  * domain. Booleans are the reference's {0,1} doubles; bitwise ops operate
  * on the long reinterpretation, as GrB does on integer types.
  *
  * Not carried over: complex parts (no complex type here by design,
  * SURVEY.md §1.2). The special-function tail (erf/erfc/tgamma/lgamma/
  * frexpx/frexpe) has no Spark builtin and is carried by the engine's own
  * codegen'd Catalyst Expressions (graft.functions.SpecialFunctions).
  */
object Ops {

  private def b2d(c: Column): Column = c.cast("double")

  /** GrB_UnaryOp inventory (GraphBLAS.h:782-950). */
  val unary: Map[String, Column => Column] = Map(
    "identity" -> (c => c),
    "ainv"     -> (c => -c),
    "minv"     -> (c => lit(1.0) / c),
    "lnot"     -> (c => b2d(c === 0.0)),
    "one"      -> (_ => lit(1.0)),
    "abs"      -> (c => abs(c)),
    "sqrt"     -> (c => sqrt(c)),
    "log"      -> (c => log(c)),
    "exp"      -> (c => exp(c)),
    "log2"     -> (c => log2(c)),
    "log10"    -> (c => log10(c)),
    "log1p"    -> (c => log1p(c)),
    "expm1"    -> (c => expm1(c)),
    "sin"      -> (c => sin(c)),
    "cos"      -> (c => cos(c)),
    "tan"      -> (c => tan(c)),
    "asin"     -> (c => asin(c)),
    "acos"     -> (c => acos(c)),
    "atan"     -> (c => atan(c)),
    "sinh"     -> (c => sinh(c)),
    "cosh"     -> (c => cosh(c)),
    "tanh"     -> (c => tanh(c)),
    "asinh"    -> (c => asinh(c)),
    "acosh"    -> (c => acosh(c)),
    "atanh"    -> (c => atanh(c)),
    "signum"   -> (c => signum(c)),
    "ceil"     -> (c => ceil(c).cast("double")),
    "floor"    -> (c => floor(c).cast("double")),
    "round"    -> (c => round(c, 0)),
    // |x| >= 2^63 overflows the long cast, but such doubles have no
    // fractional part (ulp > 1 past 2^52), so trunc(x) = x there; NaN must
    // also bypass the cast (GxB_TRUNC(NaN) = NaN; the cast would throw
    // under ANSI mode and yield 0 under legacy)
    "trunc"    -> (c => when(isnan(c) || abs(c) >= 9.223372036854776e18, c)
                          .otherwise(c.cast("long").cast("double"))),
    "isinf"    -> (c => b2d(c === Double.PositiveInfinity ||
                            c === Double.NegativeInfinity)),
    "isnan"    -> (c => b2d(isnan(c))),
    "isfinite" -> (c => b2d(!isnan(c) && c =!= Double.PositiveInfinity &&
                            c =!= Double.NegativeInfinity)),
    "bnot"     -> (c => bitwise_not(c.cast("long")).cast("double")),
    "cbrt"     -> (c => cbrt(c)),
    "pow2"     -> (c => pow(lit(2.0), c)),
    // special functions: native Catalyst Expressions with doGenCode
    // (GxB_ERF/ERFC/TGAMMA/LGAMMA/FREXPX/FREXPE, GraphBLAS.h:849-950)
    "erf"      -> graft.functions.SpecialFunctions.erf,
    "erfc"     -> graft.functions.SpecialFunctions.erfc,
    "gamma"    -> graft.functions.SpecialFunctions.gamma,
    "lgamma"   -> graft.functions.SpecialFunctions.lgamma,
    "frexpx"   -> graft.functions.SpecialFunctions.frexpx,
    "frexpe"   -> graft.functions.SpecialFunctions.frexpe)

  /** GrB_BinaryOp inventory (GraphBLAS.h:986-1390); positional
    * FIRSTI/SECONDJ live on GBMatrix.apply's (i, j, w) signature instead.
    */
  val binary: Map[String, (Column, Column) => Column] = Map(
    "first"     -> ((a, _) => a),
    "second"    -> ((_, b) => b),
    "oneb"      -> ((_, _) => lit(1.0)),
    "pair"      -> ((_, _) => lit(1.0)),
    "plus"      -> ((a, b) => a + b),
    "minus"     -> ((a, b) => a - b),
    "rminus"    -> ((a, b) => b - a),
    "times"     -> ((a, b) => a * b),
    "div"       -> ((a, b) => a / b),
    "rdiv"      -> ((a, b) => b / a),
    "pow"       -> ((a, b) => pow(a, b)),
    "min"       -> ((a, b) => least(a, b)),
    "max"       -> ((a, b) => greatest(a, b)),
    "any"       -> ((a, _) => a),
    "iseq"      -> ((a, b) => b2d(a === b)),
    "isne"      -> ((a, b) => b2d(a =!= b)),
    "islt"      -> ((a, b) => b2d(a < b)),
    "isgt"      -> ((a, b) => b2d(a > b)),
    "isle"      -> ((a, b) => b2d(a <= b)),
    "isge"      -> ((a, b) => b2d(a >= b)),
    "lor"       -> ((a, b) => b2d(a =!= 0.0 || b =!= 0.0)),
    "land"      -> ((a, b) => b2d(a =!= 0.0 && b =!= 0.0)),
    "lxor"      -> ((a, b) => b2d((a =!= 0.0) =!= (b =!= 0.0))),
    "atan2"     -> ((a, b) => atan2(a, b)),
    "hypot"     -> ((a, b) => hypot(a, b)),
    "fmod"      -> ((a, b) => a % b),
    // IEEE remainder rounds the quotient half-to-even — bround, not round
    // (HALF_UP differs at exact half-way quotients: remainder(5,2) = 1, not -1)
    "remainder" -> ((a, b) => a - bround(a / b, 0) * b),
    "copysign"  -> ((a, b) => when(b < 0.0, -abs(a)).otherwise(abs(a))),
    "ldexp"     -> ((a, b) => a * pow(lit(2.0), b)),
    // NOTE: these double-domain entries are exact only for |values| < 2^53
    // (the long->double round-trip loses low bits past that); for full 64-bit
    // patterns (e.g. xxhash64 outputs) use the long-typed `bitwise` registry
    // below and keep the column long end-to-end.
    "bor"       -> ((a, b) => b2d(a.cast("long").bitwiseOR(b.cast("long")))),
    "band"      -> ((a, b) => b2d(a.cast("long").bitwiseAND(b.cast("long")))),
    "bxor"      -> ((a, b) => b2d(a.cast("long").bitwiseXOR(b.cast("long")))),
    "bxnor"     -> ((a, b) => b2d(bitwise_not(
      a.cast("long").bitwiseXOR(b.cast("long"))))))

  /** Exact 64-bit bitwise inventory (GrB_BOR/BAND/BXOR/BXNOR and
    * GxB_BGET/BSET/BCLR/BSHIFT, GraphBLAS.h:1245-1334) over LONG columns —
    * no double round-trip, bit-exact for any 64-bit pattern. `bshift`
    * follows GxB semantics: positive k shifts left, negative shifts right
    * (arithmetic, matching the signed-integer variants).
    */
  val bitwise: Map[String, (Column, Column) => Column] = {
    def sl(a: Column, k: Column) = call_function("shiftleft", a, k.cast("int"))
    def sr(a: Column, k: Column) = call_function("shiftright", a, k.cast("int"))
    Map(
      "bor"    -> ((a, b) => a.bitwiseOR(b)),
      "band"   -> ((a, b) => a.bitwiseAND(b)),
      "bxor"   -> ((a, b) => a.bitwiseXOR(b)),
      "bxnor"  -> ((a, b) => bitwise_not(a.bitwiseXOR(b))),
      "bget"   -> ((a, k) => sr(a, k).bitwiseAND(lit(1L))),
      "bset"   -> ((a, k) => a.bitwiseOR(sl(lit(1L), k))),
      "bclr"   -> ((a, k) => a.bitwiseAND(bitwise_not(sl(lit(1L), k)))),
      // |k| >= 64 must SATURATE (GB_bitshift_int64: left or non-negative
      // right shifts go to 0, negative right shifts to -1) — Java/Spark
      // shifts would mask the count mod 64 instead (bshift(x, 64) = x)
      "bshift" -> ((a, k) =>
        when(k >= 64, lit(0L))
          .when(k <= -64, when(a < 0, lit(-1L)).otherwise(lit(0L)))
          .when(k >= 0, sl(a, k)).otherwise(sr(a, -k))))
  }

  /** Exact unary complement over a LONG column (GrB_BNOT). */
  val bitwiseNot: Column => Column = c => bitwise_not(c)
}
