package graft.sources

import org.apache.spark.sql.DataFrame
import graft.SparkTestBase
import graft.core.Gauss

/** Golden-output replay of the reference's Gaussian-integer UDT demo: every
  * 4×4 matrix the demo prints (`Demo/Output/gauss_demo.out`, produced by
  * `Demo/Program/gauss_demo.c:380-495`) is recomputed with [[Gauss]]'s
  * column-expression semiring and compared ENTRY-FOR-ENTRY (exact integers —
  * no tolerance anywhere). The input A and every expected result are parsed
  * from the committed .out file itself, so this is the same validation the
  * reference's own `make demos` diff performs.
  */
class GaussDemoSpec extends SparkTestBase {
  import spark.implicits._

  private type Cells = Map[(Long, Long), (Long, Long)]

  private lazy val demoLines: Vector[String] = {
    val src = scala.io.Source.fromFile("/root/reference/Demo/Output/gauss_demo.out")
    try src.getLines().toVector finally src.close()
  }

  /** Parse the gauss dumps: sections begin `=============== <title>`, rows
    * look like `row  0:  .  (   1,   1) (   1,   0) (   1,  -1)`.  A
    * section's dump is one contiguous run of `row i:` lines — the first
    * non-row line after rows began CLOSES it, so the un-headered dumps that
    * follow (`Gauss D matrix`, fprint blocks) can't overwrite its cells.
    * Repeated titles get `#1`, `#2`, … suffixes in file order (the demo
    * prints `C Tile from Z:` eight times).
    */
  private lazy val sections: Map[String, Cells] = {
    val cell = """\.|\(\s*(-?\d+),\s*(-?\d+)\)""".r
    val rowRe = """\s*row\s+(\d+):(.*)""".r
    val out = scala.collection.mutable.Map[String, Cells]()
    def store(t: String, c: Cells): Unit = {
      val key = if (!out.contains(t)) t
        else Iterator.from(1).map(k => s"$t#$k").find(!out.contains(_)).get
      out(key) = c
    }
    var title: Option[String] = None
    var cells = Map.empty[(Long, Long), (Long, Long)]
    for (ln <- demoLines) {
      if (ln.startsWith("===============")) {
        title.foreach(store(_, cells))
        title = Some(ln.stripPrefix("===============").trim.stripSuffix(":").trim)
        cells = Map.empty
      } else ln match {
        case rowRe(i, rest) =>
          cell.findAllMatchIn(rest).zipWithIndex.foreach { case (m, j) =>
            if (m.matched != ".")
              cells += ((i.toLong, j.toLong) -> ((m.group(1).toLong, m.group(2).toLong)))
          }
        case _ =>
          if (title.isDefined && cells.nonEmpty) {
            title.foreach(store(_, cells))
            title = None
            cells = Map.empty
          }
      }
    }
    title.foreach(store(_, cells))
    out.toMap
  }

  /** The three int-typed `GxB_Matrix_fprint` blocks (RealGauss(C),
    * RealGauss(C'), ijgauss(C)): marker `  4x4 GraphBLAS intNN_t matrix`,
    * entries `    (0,0)   17`, in file order.  UDT fprints print
    * `[user-defined value]` so they never match.
    */
  private lazy val intDumps: Vector[Map[(Long, Long), Long]] = {
    val marker = """\s*4x4 GraphBLAS int\d+_t matrix.*""".r
    val entry = """\s*\((\d+),(\d+)\)\s+(-?\d+)\s*""".r
    val out = scala.collection.mutable.ArrayBuffer[Map[(Long, Long), Long]]()
    var cur: Option[Map[(Long, Long), Long]] = None
    for (ln <- demoLines) ln match {
      case marker() =>
        cur.foreach(out += _); cur = Some(Map.empty)
      case entry(i, j, v) if cur.isDefined =>
        cur = cur.map(_ + ((i.toLong, j.toLong) -> v.toLong))
      case _ =>
        if (cur.exists(_.nonEmpty)) { out += cur.get; cur = None }
    }
    cur.filter(_.nonEmpty).foreach(out += _)
    out.toVector
  }

  private def df(c: Cells): DataFrame =
    c.toSeq.map { case ((i, j), (re, im)) => (i, j, re, im) }
      .toDF("i", "j", "re", "im")

  private def collect(m: DataFrame): Cells =
    m.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap

  private def golden(name: String): Cells =
    sections.getOrElse(name,
      fail(s"section '$name' not in gauss_demo.out: ${sections.keys.toList.sorted}"))

  private def intCollect(m: DataFrame): Map[(Long, Long), Long] =
    m.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  // shared demo state: A² and C = A'·(1,-2), the value C holds from
  // gauss_demo.c:490 through the tile trials
  private lazy val a2 = {
    val a0 = df(golden("Gauss A matrix"))
    Gauss.mxm(a0, a0)
  }
  private lazy val cState = Gauss.multScalar(Gauss.transpose(a2), 1, -2)

  test("gauss_demo golden replay: the full mxm/mask/select/accum/apply chain") {
    val a0 = df(golden("Gauss A matrix"))               // demo input (c:391)
    assert(collect(a0).size == 15)                      // (0,0) is empty

    val a1 = Gauss.mxm(a0, a0)                          // A = A^2 (c:402)
    assert(collect(a1) == golden("Gauss A = A^2 matrix"))

    // C<diag mask> = A*A' (c:417) — mask pushes to a post-product filter
    val aat = Gauss.mxm(a1, Gauss.transpose(a1))
    assert(collect(aat.filter($"i" === $"j")) == golden("Gauss C = diag(AA') matrix"))

    val d = Gauss.selectDiag(a1)                        // D = select(DIAG, A) (c:425)
    assert(collect(Gauss.mxm(d, a1)) == golden("Gauss C = D*A matrix"))
    assert(collect(Gauss.mxm(a1, d)) == golden("Gauss C = A*D matrix"))

    val ciso = (1L, -2L)
    val cFull = Gauss.full(spark, 4, ciso._1, ciso._2)  // C = (1,-2) (c:451)
    assert(collect(cFull) == golden("Gauss C = (1,-2) matrix"))

    // C += A*A' with C full (c:455)
    val c1 = Gauss.ewiseAdd(cFull, aat)
    assert(collect(c1) == golden("Gauss C += A*A' matrix"))

    val b = Gauss.full(spark, 4, ciso._1, ciso._2)      // B = (1,-2) (c:462)
    assert(collect(b) == golden("Gauss B = (1,-2) matrix"))
    val c2 = Gauss.ewiseAdd(c1, Gauss.mxm(b, a1))       // C += B*A (c:465)
    assert(collect(c2) == golden("Gauss C += B*A"))
    val c3 = Gauss.ewiseAdd(c2, Gauss.mxm(a1, b))       // C += A*B (c:470)
    assert(collect(c3) == golden("Gauss C += A*B"))

    // scalar applies on A's pattern (c:475-495)
    assert(collect(Gauss.addScalar(a1, ciso._1, ciso._2))
      == golden("Gauss C = (1,-2) + A"))
    val am = Gauss.multScalar(a1, ciso._1, ciso._2)
    assert(collect(am) == golden("Gauss C = A*(1,-2)"))
    val atm = Gauss.multScalar(Gauss.transpose(a1), ciso._1, ciso._2)
    assert(collect(atm) == golden("Gauss C = A'*(1,-2)"))
    assert(collect(atm) == golden("Gauss C = (1,-2)*A'"))  // commutative (c:493)
  }

  test("gauss_demo golden replay: RealGauss / IJGauss positional applies") {
    assert(intDumps.size == 3)
    // R = RealGauss(C) and RealGauss(C') — UDT→int32 unary (c:508-516)
    assert(intCollect(Gauss.realPart(cState)) == intDumps(0))
    assert(collect(cState) == golden("R = RealGauss (C')")) // header prints C
    assert(intCollect(Gauss.realPart(Gauss.transpose(cState))) == intDumps(1))
    // R = ijgauss(C): z = x.real + ciso.real + i − j (c:123-127, 526)
    assert(collect(cState) == golden("C"))
    assert(intCollect(Gauss.ijApply(cState, 1)) == intDumps(2))
  }

  test("gauss_demo golden replay: transpose, tile concat/split, scalar-accum tail") {
    val d = Gauss.selectDiag(a2)
    val c4 = Gauss.transpose(cState)                     // C = C' (c:541)
    assert(collect(c4) == golden("C = C'"))

    // trial 0: Z(256×8) = [C D ; E E ; D C] with E 248×4 empty (c:546-581)
    val e = Gauss.empty(spark)
    val z0 = Gauss.concatTiles(Seq(Seq(c4, d), Seq(e, e), Seq(d, c4)),
      Seq(4L, 248L, 4L), Seq(4L, 4L))
    assert(collect(z0) == golden("Z = [C D ; E E ; D C]"))
    val t0 = Gauss.splitTiles(z0, Seq(128L, 128L), Seq(3L, 5L))
    assert(collect(t0(0)) == golden("C Tile from Z"))
    for (k <- 1 to 3) assert(collect(t0(k)) == golden(s"C Tile from Z#$k"))

    // trial 1: same grid at 16×8 with E 8×4
    val z1 = Gauss.concatTiles(Seq(Seq(c4, d), Seq(e, e), Seq(d, c4)),
      Seq(4L, 8L, 4L), Seq(4L, 4L))
    assert(collect(z1) == golden("Z = [C D ; E E ; D C]#1"))
    val t1 = Gauss.splitTiles(z1, Seq(8L, 8L), Seq(3L, 5L))
    for (k <- 0 to 3) assert(collect(t1(k)) == golden(s"C Tile from Z#${k + 4}"))

    // C += ciso on full C, then split {1,3}×{2,2} (c:590-604)
    val c5 = Gauss.addScalar(c4, 1, -2)
    assert(collect(c5) == golden("C = C + ciso"))
    val s = Gauss.splitTiles(c5, Seq(1L, 3L), Seq(2L, 2L))
    assert(collect(s(0)) == golden("S Tile from C"))
    for (k <- 1 to 3) assert(collect(s(k)) == golden(s"S Tile from C#$k"))

    // JIT-pause tail: the chain of scalar accums (c:618-663) — JIT state
    // changes the reference's kernel dispatch, never the values
    assert(collect(c5) == golden("C#2"))
    val c6 = Gauss.addScalar(c5, 1, -2)
    assert(collect(c6) == golden("C = C + ciso (JIT paused)"))
    assert(collect(c6) == golden("C#3"))
    val c7 = Gauss.multScalar(c6, 1, -2)
    assert(collect(c7) == golden("C = C * ciso (JIT paused)"))
    val c8 = Gauss.addScalar(c7, 1, -2)
    assert(collect(c8) == golden("C = C + ciso (JIT run)"))
    val c9 = Gauss.multScalar(c8, 1, -2)
    assert(collect(c9) == golden("C = C * ciso (JIT not loaded)"))
    val c10 = Gauss.multScalar(c9, 1, -2)
    assert(collect(c10) == golden("C = C * ciso (full JIT)"))
    // the demo's own exit gate: C(3,3) == (65,1170) (gauss_demo.c:686)
    assert(collect(c10)((3L, 3L)) == ((65L, 1170L)))
  }
}
