package graft.core

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Algebraic laws of the GraphBLAS operator algebra, checked EXACTLY on
  * integral-weight sprand fixtures (integer-valued doubles make every sum
  * and product exact, so the laws hold bit-for-bit, not just within
  * tolerance). Each law is the reference's own contract: semiring
  * associativity/distributivity (GraphBLAS C API spec §2.3), transpose
  * anti-homomorphism (GB_AxB_meta.c's swap_rule relies on it), mask
  * idempotence (GB_spec_mask.m).
  */
class AlgebraLawsSpec extends SparkTestBase {

  // sprand with small-integer weights: exact arithmetic under +.*
  private def intRand(n: Long, density: Double, seed: Long): GBMatrix =
    GBMatrix.random(spark, n, n, density, seed)
      .apply((_, _, w) => floor(w * 5.0) + 1.0)

  private val seeds = Seq(11L, 29L, 47L)

  test("transpose is an involution; (A*B)' == B'*A'") {
    for (s <- seeds) {
      val a = intRand(12, 0.3, s); val b = intRand(12, 0.3, s + 1)
      assertMatrixEq(toMap(a.transpose.transpose), toMap(a), tol = 0.0)
      assertMatrixEq(
        toMap(a.mxm(b, Semiring.PlusTimes).transpose),
        toMap(b.transpose.mxm(a.transpose, Semiring.PlusTimes)), tol = 0.0,
        ctx = s"seed $s")
    }
  }

  test("mxm is associative over plus-times: (A*B)*C == A*(B*C)") {
    for (s <- seeds) {
      val a = intRand(10, 0.3, s); val b = intRand(10, 0.3, s + 1)
      val c = intRand(10, 0.3, s + 2)
      val sr = Semiring.PlusTimes
      assertMatrixEq(toMap(a.mxm(b, sr).mxm(c, sr)),
        toMap(a.mxm(b.mxm(c, sr), sr)), tol = 0.0, ctx = s"seed $s")
    }
  }

  test("mxm distributes over eWiseAdd: A*(B (+) C) == A*B (+) A*C") {
    for (s <- seeds) {
      val a = intRand(10, 0.3, s); val b = intRand(10, 0.3, s + 1)
      val c = intRand(10, 0.3, s + 2)
      val sr = Semiring.PlusTimes
      assertMatrixEq(
        toMap(a.mxm(b.eWiseAdd(c, BinOp.PlusOp), sr)),
        toMap(a.mxm(b, sr).eWiseAdd(a.mxm(c, sr), BinOp.PlusOp)), tol = 0.0,
        ctx = s"seed $s")
    }
  }

  test("the identity matrix is the mxm unit: A*I == A == I*A") {
    for (s <- seeds) {
      val a = intRand(15, 0.3, s)
      val i = GBMatrix.eye(spark, 15)
      assertMatrixEq(toMap(a.mxm(i, Semiring.PlusTimes)), toMap(a), tol = 0.0)
      assertMatrixEq(toMap(i.mxm(a, Semiring.PlusTimes)), toMap(a), tol = 0.0)
    }
  }

  test("eWiseAdd(plus) is commutative and associative") {
    for (s <- seeds) {
      val a = intRand(12, 0.4, s); val b = intRand(12, 0.4, s + 1)
      val c = intRand(12, 0.4, s + 2)
      assertMatrixEq(toMap(a.eWiseAdd(b, BinOp.PlusOp)),
        toMap(b.eWiseAdd(a, BinOp.PlusOp)), tol = 0.0)
      assertMatrixEq(toMap(a.eWiseAdd(b, BinOp.PlusOp).eWiseAdd(c, BinOp.PlusOp)),
        toMap(a.eWiseAdd(b.eWiseAdd(c, BinOp.PlusOp), BinOp.PlusOp)), tol = 0.0)
    }
  }

  test("masking is idempotent and intersects like eWiseMult's pattern") {
    for (s <- seeds) {
      val a = intRand(12, 0.4, s); val m = intRand(12, 0.4, s + 7)
      val once = a.maskBy(m)
      assertMatrixEq(toMap(once.maskBy(m)), toMap(once), tol = 0.0)
      // structural mask == keep exactly the pattern intersection
      assertMatrixEq(toMap(once),
        toMap(a.eWiseMult(m.pattern, BinOp.FirstOp)), tol = 0.0)
    }
  }

  test("tril/triu/offdiag partition the pattern; reduceRows == A * ones-vector") {
    for (s <- seeds) {
      val a = intRand(12, 0.4, s)
      val parts = toMap(a.tril(-1)) ++ toMap(a.triu(1)) ++
        toMap(GBMatrix(a.df.filter(col("src") === col("dst"))))
      assertMatrixEq(parts, toMap(a), tol = 0.0)
      // row sums two ways: reduce, and the semiring product with the ones
      // vector over the column universe
      val ones = a.df.select(col("dst").as("id")).distinct()
        .withColumn("v", lit(1.0))
      val viaMxv = a.mxv(ones, Semiring.PlusTimes)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val viaReduce = dfToVec(a.reduceRows(Monoid.Plus))
      assert(viaMxv == viaReduce, s"seed $s")
    }
  }

  test("min-plus (tropical) laws: associativity, idempotent add, distributivity") {
    for (s <- seeds) {
      val a = intRand(10, 0.35, s); val b = intRand(10, 0.35, s + 1)
      val c = intRand(10, 0.35, s + 2)
      val sr = Semiring.MinPlus
      // associative products (shortest 3-hop = either grouping)
      assertMatrixEq(toMap(a.mxm(b, sr).mxm(c, sr)),
        toMap(a.mxm(b.mxm(c, sr), sr)), tol = 0.0, ctx = s"seed $s")
      // min is idempotent: A (min) A == A
      assertMatrixEq(toMap(a.eWiseAdd(a, BinOp.MinOp)), toMap(a), tol = 0.0)
      // distributivity of + over min inside the product:
      // A *(min.+) (B (min) C) == (A *(min.+) B) (min) (A *(min.+) C)
      assertMatrixEq(
        toMap(a.mxm(b.eWiseAdd(c, BinOp.MinOp), sr)),
        toMap(a.mxm(b, sr).eWiseAdd(a.mxm(c, sr), BinOp.MinOp)), tol = 0.0,
        ctx = s"seed $s")
    }
  }

  test("kron mixed-product law on patterns: (A (x) B)(C (x) D) == AC (x) BD") {
    // dims: A,C are 4x4; B,D are 3x3 => kron blocks line up
    for (s <- seeds.take(2)) {
      val a = intRand(4, 0.5, s); val c = intRand(4, 0.5, s + 1)
      val b = intRand(3, 0.5, s + 2); val d = intRand(3, 0.5, s + 3)
      val sr = Semiring.PlusTimes
      val lhs = a.kron(b, 3, 3).mxm(c.kron(d, 3, 3), sr)
      val rhs = a.mxm(c, sr).kron(b.mxm(d, sr), 3, 3)
      assertMatrixEq(toMap(lhs), toMap(rhs), tol = 0.0, ctx = s"seed $s")
    }
  }
}
