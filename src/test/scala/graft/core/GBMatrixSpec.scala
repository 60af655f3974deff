package graft.core

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.ref.DenseMimic

/** Differential tests of every GBMatrix operator against the dense GB_spec
  * mimic (the strategy of the reference's Test/test*.m × GB_spec_*.m suites,
  * Test/GB_spec_mxm.m:16-44) on seeded sprand matrices.
  */
class GBMatrixSpec extends SparkTestBase {

  private val semirings = Seq(
    Semiring.PlusTimes, Semiring.PlusSecond, Semiring.PlusPair,
    Semiring.MinPlus, Semiring.MinFirst, Semiring.MaxSecond)

  private val binops = Seq(BinOp.PlusOp, BinOp.TimesOp, BinOp.MinOp,
    BinOp.MaxOp, BinOp.FirstOp, BinOp.SecondOp, BinOp.MinusOp)

  private def trials: Seq[(Map[(Long, Long), Double], Map[(Long, Long), Double])] =
    Seq((8, 0.3, 1L), (12, 0.2, 2L), (16, 0.15, 3L)).map { case (n, d, s) =>
      (sprand(n, d, s), sprand(n, d, s + 100))
    }

  test("build combines duplicate tuples with the dup monoid") {
    import spark.implicits._
    val raw = Seq((1L, 2L, 1.5), (1L, 2L, 2.5), (3L, 4L, 1.0)).toDF("src", "dst", "w")
    assertMatrixEq(toMap(GBMatrix.fromTuples(raw, Monoid.Plus)),
      Map((1L, 2L) -> 4.0, (3L, 4L) -> 1.0))
    assertMatrixEq(toMap(GBMatrix.fromTuples(raw, Monoid.Max)),
      Map((1L, 2L) -> 2.5, (3L, 4L) -> 1.0))
  }

  test("transpose is an involution and matches the mimic") {
    for ((a, _) <- trials) {
      val m = toMatrix(a)
      assertMatrixEq(toMap(m.transpose), DenseMimic.transpose(a), ctx = "transpose")
      assertMatrixEq(toMap(m.transpose.transpose), a, ctx = "transpose^2")
    }
  }

  test("tril/triu/offdiag/diag/select/apply/prune") {
    val a = sprand(10, 0.4, 7L) + ((3L, 3L) -> 5.0) + ((4L, 4L) -> 0.0)
    val m = toMatrix(a)
    assertMatrixEq(toMap(m.tril()), a.filter { case ((i, j), _) => j <= i })
    assertMatrixEq(toMap(m.tril(-1)), a.filter { case ((i, j), _) => j <= i - 1 })
    assertMatrixEq(toMap(m.triu(1)), a.filter { case ((i, j), _) => j >= i + 1 })
    assertMatrixEq(toMap(m.offdiag), a.filter { case ((i, j), _) => i != j })
    assert(dfToVec(m.diag) == a.collect { case ((i, j), w) if i == j => i -> w }.toMap)
    assertMatrixEq(toMap(m.select((i, j, w) => w >= 3.0)), a.filter(_._2 >= 3.0))
    assertMatrixEq(toMap(m.apply((i, j, w) => w * 2.0 + 1.0)), a.map { case (k, w) => k -> (w * 2 + 1) })
    assertMatrixEq(toMap(m.prune), a.filter(_._2 != 0.0))
    assertMatrixEq(toMap(m.pattern), a.map { case (k, _) => k -> 1.0 })
  }

  test("eWiseMult = intersection, eWiseAdd = union, for all binops") {
    for ((a, b) <- trials; op <- binops) {
      val (ma, mb) = (toMatrix(a), toMatrix(b))
      assertMatrixEq(toMap(ma.eWiseMult(mb, op)), DenseMimic.eWiseMult(a, b, op),
        ctx = s"eWiseMult ${op.name}")
      assertMatrixEq(toMap(ma.eWiseAdd(mb, op)), DenseMimic.eWiseAdd(a, b, op),
        ctx = s"eWiseAdd ${op.name}")
    }
  }

  test("eWiseUnion fills missing sides with scalar defaults") {
    val (a, b) = trials.head
    val got = toMap(toMatrix(a).eWiseUnion(toMatrix(b), BinOp.MinusOp, 100.0, 0.5))
    val want = (a.keySet ++ b.keySet).map { k =>
      k -> (a.getOrElse(k, 100.0) - b.getOrElse(k, 0.5))
    }.toMap
    assertMatrixEq(got, want)
  }

  test("maskBy: structural, valued, complemented") {
    val a = sprand(10, 0.4, 21L)
    val mask = sprand(10, 0.3, 22L) + ((0L, 0L) -> 0.0)
    val withZeroKey = a + ((0L, 0L) -> 9.0)
    val (mm, mk) = (toMatrix(withZeroKey), toMatrix(mask))
    assertMatrixEq(toMap(mm.maskBy(mk)),
      DenseMimic.mask(withZeroKey, mask, complement = false, structural = true))
    assertMatrixEq(toMap(mm.maskBy(mk, complement = true)),
      DenseMimic.mask(withZeroKey, mask, complement = true, structural = true))
    assertMatrixEq(toMap(mm.maskBy(mk, structural = false)),
      DenseMimic.mask(withZeroKey, mask, complement = false, structural = false))
  }

  test("mxm matches the mimic across semirings") {
    for ((a, b) <- trials; sr <- semirings) {
      val got = toMap(toMatrix(a).mxm(toMatrix(b), sr))
      assertMatrixEq(got, DenseMimic.mxm(a, b, sr), tol = 1e-9, ctx = s"mxm ${sr.name}")
    }
  }

  test("mxm with mask = mask applied to the product (dot3 pushdown is invisible)") {
    val (a, b) = trials.head
    val mask = sprand(8, 0.4, 55L)
    for (comp <- Seq(false, true)) {
      val got = toMap(toMatrix(a).mxm(toMatrix(b), Semiring.PlusTimes,
        Some(toMatrix(mask)), Desc(maskComplement = comp)))
      val want = DenseMimic.mask(DenseMimic.mxm(a, b, Semiring.PlusTimes), mask, comp, structural = true)
      assertMatrixEq(got, want, ctx = s"mxm masked comp=$comp")
    }
  }

  test("mxm transpose descriptors") {
    val (a, b) = trials.head
    val gotTA = toMap(toMatrix(a).mxm(toMatrix(b), Semiring.PlusTimes, desc = Desc(transposeA = true)))
    assertMatrixEq(gotTA, DenseMimic.mxm(DenseMimic.transpose(a), b, Semiring.PlusTimes), ctx = "A'B")
    val gotTB = toMap(toMatrix(a).mxm(toMatrix(b), Semiring.PlusTimes, desc = Desc(transposeB = true)))
    assertMatrixEq(gotTB, DenseMimic.mxm(a, DenseMimic.transpose(b), Semiring.PlusTimes), ctx = "AB'")
  }

  test("mxv / vxm / vxmSalted match the mimic") {
    for ((a, _) <- trials; sr <- Seq(Semiring.PlusTimes, Semiring.MinPlus)) {
      val u = sprand(16, 0.5, 77L).collect { case ((i, 0L), w) => i -> w }
      val m = toMatrix(a)
      assertVecEq(dfToVec(m.mxv(vecToDF(u), sr)), DenseMimic.mxv(a, u, sr), ctx = s"mxv ${sr.name}")
      assertVecEq(dfToVec(m.vxm(vecToDF(u), sr)), DenseMimic.vxm(u, a, sr), ctx = s"vxm ${sr.name}")
      assertVecEq(dfToVec(m.vxmSalted(vecToDF(u), sr, salts = 4)),
        DenseMimic.vxm(u, a, sr), ctx = s"vxmSalted ${sr.name}")
    }
  }

  test("reductions match the mimic") {
    for ((a, _) <- trials; mo <- Seq(Monoid.Plus, Monoid.Min, Monoid.Max)) {
      val m = toMatrix(a)
      assertVecEq(dfToVec(m.reduceRows(mo)), DenseMimic.reduceRows(a, mo), ctx = s"reduceRows ${mo.name}")
      assert(math.abs(m.reduceScalar(mo) - DenseMimic.reduceScalar(a, mo)) < 1e-9)
    }
    assert(toMatrix(Map.empty).reduceScalar(Monoid.Plus) == 0.0)
  }

  test("rowDegrees / argmaxRows deterministic") {
    val a = Map((1L, 2L) -> 5.0, (1L, 7L) -> 5.0, (1L, 1L) -> 3.0, (2L, 9L) -> 1.0)
    val m = toMatrix(a)
    assert(dfToVec(m.rowDegrees) == Map(1L -> 3.0, 2L -> 1.0))
    val am = m.argmaxRows.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(am == Map(1L -> (2L, 5.0), 2L -> (9L, 1.0))) // tie 5.0@{2,7} -> min dst
  }

  test("kron matches the mimic") {
    val a = sprand(4, 0.5, 31L)
    val b = sprand(3, 0.6, 32L)
    assertMatrixEq(toMap(toMatrix(a).kron(toMatrix(b), 3, 3)),
      DenseMimic.kron(a, b, 3, 3, BinOp.TimesOp))
  }

  test("accumMask epilogue: accum + mask + replace (GB_spec_accum/mask semantics)") {
    val c = sprand(8, 0.3, 41L)
    val t = sprand(8, 0.3, 42L)
    val mask = sprand(8, 0.4, 43L)
    val (mc, mt, mm) = (toMatrix(c), toMatrix(t), toMatrix(mask))

    // no accum, no mask: C = T
    assertMatrixEq(toMap(mc.accumMask(mt, None)), t)
    // accum, no mask: Z = eWiseAdd(C, T, accum)
    assertMatrixEq(toMap(mc.accumMask(mt, Some(BinOp.PlusOp))),
      DenseMimic.eWiseAdd(c, t, BinOp.PlusOp))
    // accum + mask, keep: Z where M, old C where !M
    val z = DenseMimic.eWiseAdd(c, t, BinOp.PlusOp)
    val wantKeep = DenseMimic.mask(z, mask, complement = false, structural = true) ++
      DenseMimic.mask(c, mask, complement = true, structural = true)
        .filter { case (k, _) => !DenseMimic.mask(z, mask, complement = false, structural = true).contains(k) }
    assertMatrixEq(toMap(mc.accumMask(mt, Some(BinOp.PlusOp), Some(mm))), wantKeep)
    // accum + mask + replace: only Z where M survives
    assertMatrixEq(toMap(mc.accumMask(mt, Some(BinOp.PlusOp), Some(mm), Desc(replace = true))),
      DenseMimic.mask(z, mask, complement = false, structural = true))
  }

  test("diagOf / extractRange / resize") {
    val v = Map(1L -> 2.0, 5L -> 3.0)
    assertMatrixEq(toMap(GBMatrix.diagOf(vecToDF(v))), Map((1L, 1L) -> 2.0, (5L, 5L) -> 3.0))
    assertMatrixEq(toMap(GBMatrix.diagOf(vecToDF(v), 2)), Map((1L, 3L) -> 2.0, (5L, 7L) -> 3.0))
    val a = sprand(10, 0.4, 61L)
    assertMatrixEq(toMap(toMatrix(a).extractRange(2, 5, 3, 8)),
      a.filter { case ((i, j), _) => i >= 2 && i <= 5 && j >= 3 && j <= 8 })
    assertMatrixEq(toMap(toMatrix(a).resize(4, 6)),
      a.filter { case ((i, j), _) => i < 4 && j < 6 })
  }

  test("long vertex ids near 2^59 survive (hugeIdx fixture)") {
    val base = 1L << 59
    val a = Map((base, base + 1) -> 1.0, (base + 1, base + 2) -> 2.0)
    val m = toMatrix(a)
    assertMatrixEq(toMap(m.mxm(m, Semiring.PlusTimes)),
      Map((base, base + 2) -> 2.0))
    assertMatrixEq(toMap(m.transpose.transpose), a)
  }

  test("groupedAdjacency round-trips the edge set") {
    val a = sprand(10, 0.3, 71L)
    val g = toMatrix(a).groupedAdjacency
    val back = g.select(col("src"), explode(arrays_zip(col("dsts"), col("ws"))).as("z"))
      .select(col("src"), col("z.dsts").as("dst"), col("z.ws").as("w"))
    assertMatrixEq(toMap(GBMatrix(back)), a)
  }
}
