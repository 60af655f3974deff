package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.{GBMatrix, Monoid, Semiring}
import graft.algos.{BFS, ConnectedComponents, PageRank, TriangleCount}
import graft.ref.DenseMimic

/** Validation against the reference's OWN bundled matrices and demo output
  * (north rule: "validated ... against GraphBLAS's demo/test outputs on its
  * bundled matrices"). The matrices are the actual files under
  * /root/reference/Demo/Matrix (0-based `i j x` triplets,
  * Demo/Include/read_matrix.c:47), and the per-entry expectation for
  * west0067 is parsed from the committed demo output
  * Demo/Output/import_demo.out (produced by `import_demo < Matrix/west0067`,
  * Demo/demo:11).
  */
class DemoMatrixSpec extends SparkTestBase {

  private val dir = "/root/reference/Demo/Matrix"

  test("west0067 read+build reproduces the reference's import_demo output") {
    // read_matrix.c:193 sums duplicates: 299 triplet lines -> 294 entries
    val m = TripletReader.read(spark, s"$dir/west0067", dup = Monoid.Plus)
    assert(m.nvals == 294) // "C to export, 294 entries" (import_demo.out:7)
    val got = toMap(m)
    assert(got.keys.map(_._1).max < 67 && got.keys.map(_._2).max < 67) // 67x67
    // the first 29 row-major entries as printed by GxB_print (then "...")
    val src = scala.io.Source.fromFile("/root/reference/Demo/Output/import_demo.out")
    val re = """\s*\((\d+),(\d+)\)\s+(-?[\d.eE+-]+)\s*""".r
    val expected = try src.getLines().takeWhile(!_.contains("...")).collect {
      case re(i, j, x) => ((i.toLong, j.toLong), x.toDouble)
    }.toList finally src.close()
    assert(expected.size == 29, s"parsed ${expected.size} entries from the demo output")
    expected.foreach { case ((i, j), x) =>
      val g = got.getOrElse((i, j), Double.NaN)
      // GxB_print shows ~6 significant digits
      assert(math.abs(g - x) <= 1e-5 * math.max(1.0, math.abs(x)),
        s"($i,$j): got $g, demo output says $x")
    }
  }

  test("eye3 is the 3x3 identity; t1 matches read_matrix's dup-sum semantics") {
    val eye3 = TripletReader.read(spark, s"$dir/eye3")
    assert(eye3.isdiag && eye3.issymmetric)
    assert(toMap(eye3) == toMap(GBMatrix.eye(spark, 3)))
    val t1 = TripletReader.read(spark, s"$dir/t1") // 4x4, duplicates summed
    val raw = spark.read.text(s"$dir/t1").count()
    assert(t1.nvals <= raw && toMap(t1).keys.map(_._1).max <= 3)
  }

  test("2blocks: connected components finds the two disjoint cliques") {
    val m = TripletReader.read(spark, s"$dir/2blocks")
    val edges = m.df
    val got = graft.algos.CheckpointedCollect.labels(
      ConnectedComponents.run(spark, edges))
    val es = toMap(m).keys.toSet
    assert(got == DenseMimic.components(es))
    assert(got.values.toSet.size == 2) // two blocks, two components
  }

  test("ibm32a: BFS levels, components, PageRank, triangles vs the dense mimic") {
    val m = TripletReader.read(spark, s"$dir/ibm32a")
    val es = toMap(m).keys.toSet
    val edges = m.pattern.df // algorithms on the structure
    // BFS levels from vertex 0
    val lv = BFS.run(spark, edges, source = 0L)
      .select("id", "level").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).intValue).toMap
    assert(lv == DenseMimic.bfsLevels(es, 0L))
    // components
    val cc = graft.algos.CheckpointedCollect.labels(ConnectedComponents.run(spark, edges))
    assert(cc == DenseMimic.components(es))
    // PageRank to 1e-6, allclose vs mimic per the north rule
    val pr = dfToVec(PageRank.run(spark, edges, tol = 1e-6, maxIter = 200).ranks)
    val want = DenseMimic.pagerank(es, tol = 1e-6, maxIter = 200)._1
    pr.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-6, s"vertex $k") }
    // triangle count, exact
    assert(TriangleCount.run(spark, edges) == DenseMimic.triangles(es))
  }

  test("cover.mtx via MatrixMarket: the book-cover digraph, algorithms vs mimic") {
    val (m, nr, nc) = TripletReader.readMatrixMarket(spark, s"$dir/cover.mtx")
    assert(nr == 7 && nc == 7)
    assert(m.nvals == 12) // 12 arcs on the cover graph
    val es = toMap(m).keys.toSet
    val lv = BFS.run(spark, m.pattern.df, source = 0L)
      .select("id", "level").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).intValue).toMap
    assert(lv == DenseMimic.bfsLevels(es, 0L))
    val pr = dfToVec(PageRank.run(spark, m.pattern.df, tol = 1e-8, maxIter = 100).ranks)
    val want = DenseMimic.pagerank(es, tol = 1e-8, maxIter = 100)._1
    pr.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-6, s"vertex $k") }
  }
}
