package graft.sources

import org.apache.spark.sql.DataFrame
import graft.SparkTestBase
import graft.core.WildType

/** Golden-output replay of the reference's arbitrary-struct UDT demo
  * (`Demo/Program/wildtype_demo.c`, committed output
  * `Demo/Output/wildtype_demo.out`): the full chain — construction,
  * transpose/extract, C = A·B over the InTheWild block-matmul semiring,
  * the masked C⟨M⟩ = C·C', and the WildAdder scalar reduction — recomputed
  * with [[WildType]] and compared against every printed 4×4 block AND tag.
  * All demo values are exact binary fractions (integers, halves, quarters),
  * so the engine's arithmetic is exact; goldens print at one decimal
  * (`%10.1f`), so blocks compare within the 0.05 print-rounding radius and
  * everything else (pattern, tags, entry counts) compares exactly.
  */
class WildTypeDemoSpec extends SparkTestBase {
  import spark.implicits._

  private case class Blk(i: Long, j: Long, tag: String, v: Seq[Double])

  /** (matrix dumps in print order: (name, entries), standalone scalars:
    * (name, tag, values)) parsed from the committed .out file.
    */
  private lazy val (matrices, scalars): (Vector[(String, Vector[Blk])],
      Vector[(String, String, Seq[Double])]) = {
    val src = scala.io.Source.fromFile("/root/reference/Demo/Output/wildtype_demo.out")
    val lines = try src.getLines().toVector finally src.close()
    val matHdr = """=+ printing the WildType matrix: (.+) \(\d+-by-\d+.*""".r
    val matEnd = """=+ that was the WildType matrix.*""".r
    val entryHdr = """-+\s+.*\((\d+),(\d+)\):""".r
    val scalarHdr = """a wildtype scalar:\s*(.*?)\s*\[(.*)\]""".r
    val num = """\s*(-?\d+\.\d+)\s+(-?\d+\.\d+)\s+(-?\d+\.\d+)\s+(-?\d+\.\d+)\s*""".r

    val mats = scala.collection.mutable.ArrayBuffer[(String, Vector[Blk])]()
    val scal = scala.collection.mutable.ArrayBuffer[(String, String, Seq[Double])]()
    var inMat: Option[String] = None
    var pending: Option[(Long, Long)] = None
    var cur: Option[(String, String)] = None // (scalar name, tag)
    var rows = Vector.empty[Double]
    def close(): Unit = {
      (cur, inMat, pending) match {
        case (Some((_, tag)), Some(_), Some((i, j))) if rows.size == 16 =>
          mats(mats.size - 1) = (mats.last._1, mats.last._2 :+ Blk(i, j, tag, rows))
        case (Some((name, tag)), None, _) if rows.size == 16 =>
          scal += ((name, tag, rows))
        case _ => ()
      }
      cur = None; pending = None; rows = Vector.empty
    }
    for (ln <- lines) ln match {
      case matHdr(name)     => close(); inMat = Some(name); mats += ((name, Vector.empty))
      case matEnd()         => close(); inMat = None
      case entryHdr(i, j)   => close(); pending = Some((i.toLong, j.toLong))
      case scalarHdr(n, t)  => rows = Vector.empty; cur = Some((n, t))
      case num(a, b, c, d) if cur.isDefined =>
        rows ++= Seq(a, b, c, d).map(_.toDouble)
        if (rows.size == 16) close()
      case _ => ()
    }
    (mats.toVector, scal.toVector)
  }

  private def mat(name: String, nth: Int): Vector[Blk] =
    matrices.filter(_._1 == name).apply(nth)._2

  private def blk(f: (Int, Int) => Double): Seq[Double] =
    for { i <- 0 until 4; j <- 0 until 4 } yield f(i, j)

  // the demo's inputs, built exactly as wildtype_demo.c:258-337 does
  private val s1 = blk((i, j) => 100.0 * i + j)
  private val s1b = s1.updated(2 * 4 + 3, 909.0)
  private val s1c = s1b.updated(3 * 4 + 3, 42.0)
  private val s2 = blk((i, j) => (j - i) + 0.5)
  private val s2b = s2.updated(0, -1.0)
  private val s2c = s2b.updated(3, 77.0)

  private def aMat: DataFrame = Seq(
    (2L, 7L, s1, "this is A(2,7)"),
    (3L, 7L, s1b, "this is A(3,7)"),
    (2L, 4L, s1c, "this is A(2,4)")).toDF("i", "j", "stuff", "tag")
  private def bMat: DataFrame = Seq(
    (7L, 2L, s2, "this is B(7,2)"),
    (7L, 5L, s2b, "here is B(7,5)"),
    (4L, 2L, s2c, "finally, B(4,2)")).toDF("i", "j", "stuff", "tag")

  private def collect(df: DataFrame): Vector[Blk] =
    df.collect().map(r => Blk(r.getLong(0), r.getLong(1), r.getString(3),
      r.getSeq[Double](2).toVector)).toVector.sortBy(b => (b.i, b.j))

  /** Entry-set compare: exact pattern + tags, values within the %10.1f
    * print-rounding radius.
    */
  private def assertSame(got: Vector[Blk], want: Vector[Blk]): Unit = {
    assert(got.map(b => (b.i, b.j)) == want.sortBy(b => (b.i, b.j)).map(b => (b.i, b.j)))
    for ((g, w) <- got.zip(want.sortBy(b => (b.i, b.j)))) {
      assert(g.tag == w.tag, s"tag at (${g.i},${g.j}): ${g.tag} vs ${w.tag}")
      for ((gv, wv) <- g.v.zip(w.v))
        assert(math.abs(gv - wv) <= 0.0500001, s"(${g.i},${g.j}): $gv vs $wv")
    }
  }

  test("wildtype_demo golden replay: inputs, block-matmul semiring, mask, reduce") {
    // the committed input dumps match the construction chain (c:258-337)
    assertSame(collect(aMat), mat("input A", 0))
    assertSame(collect(bMat), mat("input B", 0))

    // scalar2 = C(7,2) with C = A' keeps A(2,7)'s block and tag (c:307-315)
    val c72 = collect(WildType.transpose(aMat).filter($"i" === 7 && $"j" === 2))
    val g2 = scalars.find(_._1.startsWith("got scalar2")).get
    assert(c72.head.tag == g2._2)
    assert(c72.head.v == g2._3)

    // C = A*B over InTheWild: 4 entries, C(2,2) combined => "added" (c:366)
    val c = WildType.mxm(aMat, bMat)
    assertSame(collect(c), mat("output C", 0))

    // C<M> = C*C' masked to {2,3}x{2,3}, replace+T1 (c:370-382)
    val mask = Seq((2L, 2L), (2L, 3L), (3L, 2L), (3L, 3L)).toDF("i", "j")
    val cc = WildType.mxmMasked(c, WildType.transpose(c), mask)
    assertSame(collect(cc), mat("output C", 1))
    // the by-column re-print (c:404-406) is the same matrix
    assert(mat("output C", 2) == mat("output C", 1))

    // sum = reduce(WildAdder, C), printed twice (c:385-394)
    val (sum, tag) = WildType.reduceScalar(cc)
    for (name <- Seq("sum (first time)", "sum (again)")) {
      val g = scalars.find(_._1 == name).get
      assert(tag == g._2)
      for ((gv, wv) <- sum.zip(g._3))
        assert(math.abs(gv - wv) <= 0.0500001, s"$name: $gv vs $wv")
    }
  }

  test("wildtype reduce edge cases: one-entry fold is the entry; empty is identity") {
    import org.apache.spark.sql.functions.col
    // monoid fold of one element returns it VERBATIM — values and tag
    val (one, oneTag) = WildType.reduceScalar(
      aMat.filter(col("i") === 2 && col("j") === 7))
    assert(one == s1 && oneTag == "this is A(2,7)")
    // empty matrix reduces to the WildAdder identity (c:341-350)
    val (zero, zeroTag) = WildType.reduceScalar(aMat.filter(col("i") === 99))
    assert(zero == Seq.fill(16)(0.0) && zeroTag == "identity")
  }
}
