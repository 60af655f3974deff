package graft.core

import graft.SparkTestBase

/** The remaining @GrB utility surface: eye/speye, ones, repmat, mpower,
  * matrix norms, bandwidth, structural predicates, flip
  * (/root/reference/GraphBLAS/@GrB/{eye,speye,repmat,mpower,norm,bandwidth,
  * istril,istriu,isdiag,isbanded,issymmetric,flip}.m).
  */
class UtilityOpsSpec extends SparkTestBase {

  test("eye/speye: square, rectangular, and shifted diagonals") {
    assertMatrixEq(toMap(GBMatrix.eye(spark, 3)),
      Map((0L, 0L) -> 1.0, (1L, 1L) -> 1.0, (2L, 2L) -> 1.0))
    // rectangular 2x4 truncates at min(m, n-k)
    assertMatrixEq(toMap(GBMatrix.eye(spark, 2, 4)),
      Map((0L, 0L) -> 1.0, (1L, 1L) -> 1.0))
    // superdiagonal k=2 of 3x4: entries (0,2),(1,3)
    assertMatrixEq(toMap(GBMatrix.eye(spark, 3, 4, 2)),
      Map((0L, 2L) -> 1.0, (1L, 3L) -> 1.0))
    // subdiagonal k=-2 of 4x3: entries (2,0),(3,1)
    assertMatrixEq(toMap(GBMatrix.speye(spark, 4, 3, -2)),
      Map((2L, 0L) -> 1.0, (3L, 1L) -> 1.0))
    // fully out-of-range diagonal is empty
    assert(GBMatrix.eye(spark, 3, 3, 5).nvals == 0)
  }

  test("ones and repmat tile correctly with the 2nd op") {
    assertMatrixEq(toMap(GBMatrix.ones(spark, 2, 2)),
      Map((0L, 0L) -> 1.0, (0L, 1L) -> 1.0, (1L, 0L) -> 1.0, (1L, 1L) -> 1.0))
    // G = [[5, .], [., 7]] (2x2), tiled 2x1 -> stacked twice vertically
    val g = toMatrix(Map((0L, 0L) -> 5.0, (1L, 1L) -> 7.0))
    assertMatrixEq(toMap(g.repmat(2, 1, 2, 2)),
      Map((0L, 0L) -> 5.0, (1L, 1L) -> 7.0, (2L, 0L) -> 5.0, (3L, 1L) -> 7.0))
  }

  test("matrixPower matches repeated mxm; binary exponentiation grouping is equivalent") {
    // path graph 0->1->2->3, A^2 = two-hop, A^3 = three-hop
    val a = toMatrix(Map((0L, 1L) -> 1.0, (1L, 2L) -> 1.0, (2L, 3L) -> 1.0))
    assertMatrixEq(toMap(a.matrixPower(1)), toMap(a))
    assertMatrixEq(toMap(a.matrixPower(2)), Map((0L, 2L) -> 1.0, (1L, 3L) -> 1.0))
    assertMatrixEq(toMap(a.matrixPower(3)), Map((0L, 3L) -> 1.0))
    // weighted cycle with self loop: verify against naive chain A*A*A*A
    val b = toMatrix(Map((0L, 1L) -> 2.0, (1L, 0L) -> 3.0, (0L, 0L) -> 1.0))
    val naive = b.mxm(b, Semiring.PlusTimes).mxm(b, Semiring.PlusTimes)
      .mxm(b, Semiring.PlusTimes)
    assertMatrixEq(toMap(b.matrixPower(4)), toMap(naive))
  }

  test("norms: 1 / inf / fro per @GrB/norm.m; empty matrix is 0") {
    val a = toMatrix(Map((0L, 0L) -> 3.0, (0L, 1L) -> -4.0, (1L, 1L) -> 2.0))
    assert(a.norm("1") == 6.0)   // max col sum of abs: col 1 -> 4+2
    assert(a.norm("inf") == 7.0) // max row sum of abs: row 0 -> 3+4
    assert(a.norm("fro") == math.sqrt(9 + 16 + 4))
    val empty = toMatrix(Map.empty[(Long, Long), Double])
    assert(empty.norm("1") == 0.0 && empty.norm("fro") == 0.0)
    intercept[IllegalArgumentException](a.norm("2"))
  }

  test("bandwidth and structural predicates") {
    val a = toMatrix(Map((0L, 2L) -> 1.0, (3L, 1L) -> 1.0, (2L, 2L) -> 1.0))
    assert(a.bandwidth == (2L, 2L)) // lo: 3-1=2, hi: 2-0=2
    assert(a.isbanded(2, 2) && !a.isbanded(1, 2))
    assert(!a.istril && !a.istriu && !a.isdiag)
    assert(a.tril().istril && a.triu().istriu)
    assert(toMatrix(Map((1L, 1L) -> 2.0)).isdiag)
    assert(toMatrix(Map.empty[(Long, Long), Double]).bandwidth == (0L, 0L))
    // symmetry: values must match too, not just pattern
    val sym = toMatrix(Map((0L, 1L) -> 2.0, (1L, 0L) -> 2.0, (0L, 0L) -> 1.0))
    val asym = toMatrix(Map((0L, 1L) -> 2.0, (1L, 0L) -> 3.0))
    assert(sym.issymmetric && !asym.issymmetric)
  }

  test("wathen matches a driver-side replica of the reference generator") {
    import org.apache.spark.sql.functions._
    val e = Seq(
      Seq( 6.0, -6, 2, -8, 3, -8, 2, -6), Seq(-6.0, 32, -6, 20, -8, 16, -8, 20),
      Seq( 2.0, -6, 6, -6, 2, -8, 3, -8), Seq(-8.0, 20, -6, 32, -6, 20, -8, 16),
      Seq( 3.0, -8, 2, -6, 6, -6, 2, -8), Seq(-8.0, 16, -8, 20, -6, 32, -6, 20),
      Seq( 2.0, -8, 3, -8, 2, -6, 6, -6), Seq(-6.0, 20, -8, 16, -8, 20, -6, 32))
      .map(_.map(_ / 45.0))
    for ((nx, ny) <- Seq((1L, 1L), (3L, 2L))) {
      val m = GBMatrix.wathen(spark, nx, ny)
      val got = toMap(m)
      // the same hash-derived per-cell density, fetched once
      val rho = spark.range(nx * ny)
        .select((pmod(col("id"), lit(nx)) + 1L).as("i"),
          ((col("id") / nx).cast("long") + 1L).as("j"))
        .select(col("i"), col("j"), (lit(100.0) *
          (abs(xxhash64(col("i"), col("j"), lit(42L))).cast("double") /
            Long.MaxValue.toDouble)).as("rho"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // wathen.c:165-190 verbatim, driver-side
      val acc = scala.collection.mutable.Map[(Long, Long), Double]()
        .withDefaultValue(0.0)
      for (j <- 1L to ny; i <- 1L to nx) {
        val nn0 = 3 * j * nx + 2 * i + 2 * j + 1
        val nn3 = (3 * j - 1) * nx + 2 * j + i - 1
        val nn4 = 3 * (j - 1) * nx + 2 * i + 2 * j - 3
        val nn = Array(nn0, nn0 - 1, nn0 - 2, nn3, nn4, nn4 + 1, nn4 + 2, nn3 + 1)
          .map(_ - 1)
        for (kr <- 0 until 8; kc <- 0 until 8)
          acc((nn(kr), nn(kc))) += e(kr)(kc) * rho((i, j))
      }
      assertMatrixEq(got, acc.toMap, tol = 1e-9, ctx = s"wathen($nx,$ny)")
      val n = 3 * nx * ny + 2 * nx + 2 * ny + 1
      assert(got.keys.flatMap(k => Seq(k._1, k._2)).max == n - 1)
      assert(m.issymmetric)
    }
  }

  test("flip reverses rows or columns given the dimension size") {
    val a = toMatrix(Map((0L, 0L) -> 1.0, (2L, 1L) -> 2.0))
    assertMatrixEq(toMap(a.flip(3, 1)), Map((2L, 0L) -> 1.0, (0L, 1L) -> 2.0))
    assertMatrixEq(toMap(a.flip(2, 2)), Map((0L, 1L) -> 1.0, (2L, 0L) -> 2.0))
    // involution: flip twice is identity
    assertMatrixEq(toMap(a.flip(3, 1).flip(3, 1)), toMap(a))
    intercept[IllegalArgumentException](a.flip(3, 0))
  }
}
