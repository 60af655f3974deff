package graft.sources

import org.apache.spark.sql.DataFrame
import graft.SparkTestBase
import graft.core.Gauss

/** Golden-output replay of the reference's FC64 complex demo
  * (`Demo/Program/complex_demo.c`, committed output
  * `Demo/Output/complex_demo_out.m`): C = A·B over the plus-times complex
  * semiring, validated the same way the demo's own Octave script does —
  * `norm(C−E,1) < 1e-12`, applied per entry. [[Gauss.mxm]] is
  * column-type-generic, so the SAME two-column (re, im) pipeline that
  * replays the Gaussian-integer demo exactly also computes FC64: the
  * struct-of-columns recipe is the full complex-type mapping, float and
  * integer both. `complex_demo_out2.m` is the identical run over the
  * built-in GxB_FC64 type — the demo's point is that user-defined and
  * built-in complex agree, which the byte-identical goldens witness.
  */
class ComplexDemoSpec extends SparkTestBase {
  import spark.implicits._

  private type CCells = Map[(Long, Long), (Double, Double)]

  /** Parse `    A (1,2) =  (re) + (im)*1i ;` lines per matrix name
    * (Octave 1-based indices kept as-is — both sides use the same ids).
    */
  private def parse(path: String): Map[String, CCells] = {
    val src = scala.io.Source.fromFile(path)
    val lines = try src.getLines().toVector finally src.close()
    val entry =
      """\s*(\w+) \((\d+),(\d+)\) =\s*\(\s*([-0-9.e]+)\) \+ \(\s*([-0-9.e]+)\)\*1i ;""".r
    lines.collect {
      case entry(m, i, j, re, im) =>
        (m, (i.toLong, j.toLong), (re.toDouble, im.toDouble))
    }.groupBy(_._1).map { case (m, es) =>
      m -> es.map(e => e._2 -> e._3).toMap
    }
  }

  private def df(c: CCells): DataFrame =
    c.toSeq.map { case ((i, j), (re, im)) => (i, j, re, im) }
      .toDF("i", "j", "re", "im")

  test("complex_demo golden replay: C = A*B over FC64, |err| < 1e-12 per entry") {
    val g = parse("/root/reference/Demo/Output/complex_demo_out.m")
    val a = g("A"); val b = g("B"); val c = g("C")
    assert(a.size == 10 && b.size == 13 && c.size == 11)

    val e = Gauss.mxm(df(a), df(b)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(e.keySet == c.keySet) // exact structural agreement
    for ((k, (gr, gi)) <- c; (er, ei) = e(k)) {
      assert(math.abs(er - gr) < 1e-12, s"$k re: $er vs $gr")
      assert(math.abs(ei - gi) < 1e-12, s"$k im: $ei vs $gi")
    }
  }

  test("complex_demo: the user-defined and built-in FC64 goldens agree") {
    assert(parse("/root/reference/Demo/Output/complex_demo_out.m")
      == parse("/root/reference/Demo/Output/complex_demo_out2.m"))
  }
}
