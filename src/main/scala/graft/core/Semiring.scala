package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** GraphBLAS-style algebra objects re-expressed as Catalyst column algebra.
  *
  * A reference `GrB_Monoid` is (binary op, identity, optional terminal value)
  * (/root/reference/Source/Shared/GB_opaque.h:411-426); here the binary op is a
  * Spark aggregate-function builder so the semiring-add compiles into Spark's
  * partial+final hash aggregation (map-side combine = the reference's
  * per-task Gustavson/hash accumulators, Source/GB_AxB_saxpy3.c:24-76).
  * The terminal early-exit has no Spark analogue (harmless: aggregation is
  * already O(nnz)).
  */
sealed abstract class Monoid(val name: String) extends Serializable {
  /** Aggregate expression for the semiring-add / reduction. */
  def agg(c: Column): Column
  /** Additive identity (the implicit value of absent entries). */
  def identity: Double
  /** Scala-side combine, for driver-side folds and the dense test mimic. */
  def combine(a: Double, b: Double): Double
}

object Monoid {
  case object Plus extends Monoid("plus") {
    def agg(c: Column): Column = sum(c)
    def identity = 0.0
    def combine(a: Double, b: Double): Double = a + b
  }
  case object Min extends Monoid("min") {
    def agg(c: Column): Column = min(c)
    def identity = Double.PositiveInfinity
    def combine(a: Double, b: Double): Double = math.min(a, b)
  }
  case object Max extends Monoid("max") {
    def agg(c: Column): Column = max(c)
    def identity = Double.NegativeInfinity
    def combine(a: Double, b: Double): Double = math.max(a, b)
  }
  case object Times extends Monoid("times") {
    // true product aggregate — exact for zero and negative values (the
    // exp(sum(log)) shortcut silently drops non-positive inputs: Spark's LOG
    // returns null there)
    def agg(c: Column): Column = product(c)
    def identity = 1.0
    def combine(a: Double, b: Double): Double = a * b
  }
  /** GraphBLAS ANY monoid: "pick an arbitrary member" (GraphBLAS.h:8318-8322).
    * Made deterministic here (min) so results are exactly reproducible — the
    * spec allows any member, so min is a valid ANY.
    */
  case object Any extends Monoid("any") {
    def agg(c: Column): Column = min(c)
    def identity = Double.NaN
    def combine(a: Double, b: Double): Double = math.min(a, b)
  }
  /** Logical OR over {0,1}-encoded booleans. */
  case object LOr extends Monoid("lor") {
    def agg(c: Column): Column = max(c)
    def identity = 0.0
    def combine(a: Double, b: Double): Double = math.max(a, b)
  }
  /** Logical AND over {0,1}-encoded booleans. */
  case object LAnd extends Monoid("land") {
    def agg(c: Column): Column = min(c)
    def identity = 1.0
    def combine(a: Double, b: Double): Double = math.min(a, b)
  }
}

/** Binary multiply operators (the ⊗ of a semiring), as Column expressions so
  * they stay inside whole-stage codegen. Mirrors the subset of
  * GraphBLAS.h:986-1390 the algorithms need.
  */
sealed abstract class BinOp(val name: String) extends Serializable {
  def apply(a: Column, b: Column): Column
  def eval(a: Double, b: Double): Double
}

object BinOp {
  case object TimesOp extends BinOp("times") {
    def apply(a: Column, b: Column): Column = a * b
    def eval(a: Double, b: Double): Double = a * b
  }
  case object PlusOp extends BinOp("plus") {
    def apply(a: Column, b: Column): Column = a + b
    def eval(a: Double, b: Double): Double = a + b
  }
  case object MinusOp extends BinOp("minus") {
    def apply(a: Column, b: Column): Column = a - b
    def eval(a: Double, b: Double): Double = a - b
  }
  case object DivOp extends BinOp("div") {
    def apply(a: Column, b: Column): Column = a / b
    def eval(a: Double, b: Double): Double = a / b
  }
  case object FirstOp extends BinOp("first") {
    def apply(a: Column, b: Column): Column = a
    def eval(a: Double, b: Double): Double = a
  }
  case object SecondOp extends BinOp("second") {
    def apply(a: Column, b: Column): Column = b
    def eval(a: Double, b: Double): Double = b
  }
  /** ONEB / PAIR: 1 whenever both present (GraphBLAS.h "oneb"); the multiply
    * of the triangle-counting semiring +.oneb (tricount.m:95-99).
    */
  case object PairOp extends BinOp("pair") {
    def apply(a: Column, b: Column): Column = lit(1.0)
    def eval(a: Double, b: Double): Double = 1.0
  }
  case object MinOp extends BinOp("min") {
    def apply(a: Column, b: Column): Column = least(a, b)
    def eval(a: Double, b: Double): Double = math.min(a, b)
  }
  case object MaxOp extends BinOp("max") {
    def apply(a: Column, b: Column): Column = greatest(a, b)
    def eval(a: Double, b: Double): Double = math.max(a, b)
  }
  case object LAndOp extends BinOp("land") {
    def apply(a: Column, b: Column): Column = least(a, b)
    def eval(a: Double, b: Double): Double = math.min(a, b)
  }
}

/** A GraphBLAS semiring = (add monoid, multiply binop)
  * (/root/reference/Source/Shared/GB_opaque.h:428-442). The engine needs the
  * handful SURVEY.md §2.9 lists, not the reference's 1,553 pregenerated ones —
  * any (Monoid, BinOp) pair composes here.
  */
final case class Semiring(add: Monoid, mult: BinOp) extends Serializable {
  def name = s"${add.name}_${mult.name}"
}

object Semiring {
  val PlusTimes  = Semiring(Monoid.Plus, BinOp.TimesOp)
  val PlusSecond = Semiring(Monoid.Plus, BinOp.SecondOp)  // unweighted PageRank (pagerank.m:84)
  val PlusFirst  = Semiring(Monoid.Plus, BinOp.FirstOp)
  val PlusPair   = Semiring(Monoid.Plus, BinOp.PairOp)    // triangle count (tricount.m:95-99)
  val MinPlus    = Semiring(Monoid.Min, BinOp.PlusOp)     // shortest paths
  val MinFirst   = Semiring(Monoid.Min, BinOp.FirstOp)    // connected components
  val MinSecond  = Semiring(Monoid.Min, BinOp.SecondOp)
  val AnyPair    = Semiring(Monoid.Any, BinOp.PairOp)     // BFS reachability (bfs.m:140)
  val AnyFirst   = Semiring(Monoid.Any, BinOp.FirstOp)    // BFS parent (bfs.m:154)
  val MaxSecond  = Semiring(Monoid.Max, BinOp.SecondOp)   // MIS (mis.m)
  val PlusPlus   = Semiring(Monoid.Plus, BinOp.PlusOp)    // DNN bias (dnn.m:54)
  val PlusLAnd   = Semiring(Monoid.Plus, BinOp.LAndOp)    // k-truss (ktruss.m:83)
}

/** Descriptor: per-call execution modifiers
  * (/root/reference/Source/Shared/GB_opaque.h:444-465). `dot3` is the
  * GxB_AxB_METHOD = GxB_AxB_DOT hint (GraphBLAS.h:444-471): with a sparse
  * mask, compute ONLY the masked dot products (mask-first join order,
  * Source/GB_AxB_dot3.c) instead of the full product filtered by the mask —
  * a win when Σ_{(i,j)∈M} deg_A(i) ≪ Σ_k deg_A(k)·deg_B(k). The default
  * (auto) stays saxpy-shaped and lets AQE pick join strategies, mirroring
  * GB_AxB_meta_adotb_control's auto mode.
  */
final case class Desc(
    transposeA: Boolean = false,
    transposeB: Boolean = false,
    maskComplement: Boolean = false,
    maskStructural: Boolean = false,
    replace: Boolean = false,
    dot3: Boolean = false)

object Desc { val default: Desc = Desc() }
