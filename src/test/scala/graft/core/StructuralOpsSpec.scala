package graft.core

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.algos.DNN
import graft.sources.TripletReader

/** The structural / interface operators added for SURVEY §2 completeness:
  * concat, split, reshape, row/col scale, assign family, expand, compact,
  * laplacian, incidence, DNN, triplet-text IO.
  */
class StructuralOpsSpec extends SparkTestBase {

  private val a = Map((0L, 0L) -> 1.0, (0L, 2L) -> 2.0, (1L, 1L) -> 3.0, (2L, 0L) -> 4.0)
  private val b = Map((0L, 1L) -> 5.0, (1L, 0L) -> 6.0)

  test("concat: 2x2 grid with offsets, split recovers tiles") {
    val g = GBMatrix.concat(
      Seq(Seq(toMatrix(a), toMatrix(b)), Seq(toMatrix(b), toMatrix(a))),
      rowHeights = Seq(3L, 2L), colWidths = Seq(3L, 2L))
    val want = a ++ b.map { case ((i, j), w) => ((i, j + 3), w) } ++
      b.map { case ((i, j), w) => ((i + 3, j), w) } ++
      a.map { case ((i, j), w) => ((i + 3, j + 3), w) }
    assertMatrixEq(toMap(g), want)
    // split the top-right tile back out
    assertMatrixEq(toMap(g.splitTile(0, 2, 3, 4)), b)
  }

  test("reshape: by-row relinearization preserves entries") {
    val m = toMatrix(a) // treat as 3x3 -> 9x1... use n=3, n2=1? use 3x3 -> reshape(3, 1): linear idx
    val r = toMap(m.reshape(3, 1))
    val want = a.map { case ((i, j), w) => ((i * 3 + j, 0L), w) }
    assertMatrixEq(r, want)
    // and 3x3 -> (9/3=3 wide) identity-ish: n2 = 3 keeps the matrix
    assertMatrixEq(toMap(m.reshape(3, 3)), a)
  }

  test("rowScale / colScale are diagonal multiplies") {
    val d = Map(0L -> 10.0, 1L -> 100.0, 2L -> 1000.0)
    val rs = toMap(toMatrix(a).rowScale(vecToDF(d)))
    assertMatrixEq(rs, a.map { case ((i, j), w) => ((i, j), d(i) * w) })
    val cs = toMap(toMatrix(a).colScale(vecToDF(d)))
    assertMatrixEq(cs, a.map { case ((i, j), w) => ((i, j), w * d(j)) })
  }

  test("assignRange replaces the target region and keeps the rest") {
    val c = sprand(8, 0.5, 91L)
    val sub = Map((0L, 0L) -> 7.0, (1L, 1L) -> 8.0) // extent 2x2
    val got = toMap(toMatrix(c).assignRange(toMatrix(sub), 4L, 4L))
    val want = c.filter { case ((i, j), _) => !(i >= 4 && i < 6 && j >= 4 && j < 6) } ++
      sub.map { case ((i, j), w) => ((i + 4, j + 4), w) }
    assertMatrixEq(got, want)
  }

  test("assignScalar clamps under the predicate") {
    val got = toMap(toMatrix(a).assignScalar((_, _, w) => w > 2.5, 2.5))
    assertMatrixEq(got, a.map { case (k, w) => k -> math.min(w, 2.5) })
  }

  test("expand: scalar times pattern") {
    assertMatrixEq(toMap(toMatrix(a).expand(9.0)), a.map { case (k, _) => k -> 9.0 })
  }

  test("compact re-ranks occupied ids densely and preserves structure") {
    val sparse = Map((10L, 50L) -> 1.0, (50L, 900L) -> 2.0, (900L, 10L) -> 3.0)
    val got = toMap(toMatrix(sparse).compact)
    // ids 10,50,900 -> ranks 0,1,2
    assertMatrixEq(got, Map((0L, 1L) -> 1.0, (1L, 2L) -> 2.0, (2L, 0L) -> 3.0))
  }

  test("laplacian: D - A on the symmetrized pattern") {
    val tri = Set((0L, 1L), (1L, 2L), (2L, 0L)) // triangle
    val got = toMap(GBMatrix(edgesDF(tri)).laplacian)
    val offdiag = (tri ++ tri.map(e => (e._2, e._1))).map(e => (e, -1.0)).toMap
    val diag = Map((0L, 0L) -> 2.0, (1L, 1L) -> 2.0, (2L, 2L) -> 2.0)
    assertMatrixEq(got, offdiag ++ diag)
  }

  test("incidence: one edge row per canonical edge, -1 at lo, +1 at hi") {
    val tri = Set((0L, 1L), (1L, 2L), (0L, 2L))
    val inc = GBMatrix(edgesDF(tri)).incidence.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(inc.size == 6)
    // edges ordered (0,1),(0,2),(1,2) -> ids 0,1,2
    assert(inc((0L, 0L)) == -1.0 && inc((0L, 1L)) == 1.0)
    assert(inc((1L, 0L)) == -1.0 && inc((1L, 2L)) == 1.0)
    assert(inc((2L, 1L)) == -1.0 && inc((2L, 2L)) == 1.0)
  }

  test("DNN: relu(Y*W + bias) layers with clip, vs hand-computed") {
    // Y0 = [[1, 2]] (1x2), W1 = [[1, -1], [0.5, 1]], bias1 = (-1.5, 0)
    val y0 = toMatrix(Map((0L, 0L) -> 1.0, (0L, 1L) -> 2.0))
    val w1 = toMatrix(Map((0L, 0L) -> 1.0, (0L, 1L) -> -1.0, (1L, 0L) -> 0.5, (1L, 1L) -> 1.0))
    val bias1 = vecToDF(Map(0L -> -1.5, 1L -> 0.0))
    // Y0*W1 = [1*1+2*0.5, 1*(-1)+2*1] = [2, 1]; +bias = [0.5, 1]; relu keeps both
    val out = DNN.run(spark, y0, Seq((w1, bias1)))
    assertMatrixEq(toMap(out), Map((0L, 0L) -> 0.5, (0L, 1L) -> 1.0))
    // clip: big weights push above 32
    val w2 = toMatrix(Map((0L, 0L) -> 100.0, (1L, 0L) -> 100.0))
    val out2 = DNN.run(spark, y0, Seq((w2, vecToDF(Map(0L -> 0.0)))))
    assertMatrixEq(toMap(out2), Map((0L, 0L) -> 32.0))
  }

  test("triplet text IO round-trips (0- and 1-based)") {
    val m = toMatrix(sprand(6, 0.4, 93L))
    for (oneBased <- Seq(false, true)) {
      val path = java.nio.file.Files.createTempDirectory("graft-trip").toString + "/m"
      TripletReader.write(m, path, oneBased)
      assertMatrixEq(toMap(TripletReader.read(spark, path, oneBased)), toMap(m))
    }
  }

  test("triplet read combines duplicate entries with dup monoid and defaults w=1") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-trip2").toString + "/m"
    Seq("0 1 2.0", "0 1 3.0", "2 3").toDF("value").coalesce(1)
      .write.mode("overwrite").text(path)
    assertMatrixEq(toMap(TripletReader.read(spark, path)),
      Map((0L, 1L) -> 5.0, (2L, 3L) -> 1.0))
  }
}
