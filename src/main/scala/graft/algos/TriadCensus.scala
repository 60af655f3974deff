package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Directed triad census — the Holland-Leinhardt 16-class MAN census
  * (003, 012, 102, 021D/U/C, 111D/U, 030T/C, 201, 120D/U/C, 210, 300),
  * the classic dyad/triad structure profile of a directed web/social graph.
  *
  * Counting is the Batagelj-Mrvar scheme (Social Networks 23, 2001): only
  * triples with AT LEAST TWO connected dyads are enumerated (via wedge
  * joins on the undirected support — the same quadratic-in-degree bound as
  * triangle counting, never an all-triples scan); the single-dyad classes
  * fall out of exact-integer corrections
  *   census(012) = A·(n−2) − Σ_{enumerated t} asym(t)
  *   census(102) = M·(n−2) − Σ_{enumerated t} mutual(t)
  *   census(003) = C(n,3) − everything else
  * where A/M are the graph's asymmetric/mutual dyad counts. All integer
  * arithmetic end to end; Σ census = C(n,3) exactly.
  *
  * Class assignment is a pure 64-entry lookup on the triple's 6-bit
  * adjacency code (a<b<c; bit order ab,ba,ac,ca,bc,cb) — [[ClassOf]] is
  * generated from the classifier below and shared verbatim by the engine
  * expression, the DuckDB oracle, and the test replica, so the naming
  * convention (igraph's: 111D = A↔B←C, 021D = A←B→C diverging) cannot
  * drift between them.
  *
  * Spark shape: one groupBy to canonical dyad codes, three co-keyed
  * self-joins for the wedge union, a distinct sized by the wedge count, and
  * scalar aggregates for the corrections — each stage is the shape that
  * survives 100×: work tracks Σ deg², not n³.
  */
object TriadCensus {

  /** MAN class of one triple a<b<c from its six adjacency bits. */
  def classify(ab: Int, ba: Int, ac: Int, ca: Int, bc: Int, cb: Int): String = {
    val dyads = Seq(((0, 1), ab, ba), ((0, 2), ac, ca), ((1, 2), bc, cb))
    val m = dyads.count { case (_, x, y) => x == 1 && y == 1 }
    // (tail, head) of each asymmetric dyad
    val asym = dyads.collect {
      case ((u, v), 1, 0) => (u, v)
      case ((u, v), 0, 1) => (v, u)
    }
    (m, asym.size) match {
      case (0, 0) => "003"
      case (0, 1) => "012"
      case (1, 0) => "102"
      case (2, 0) => "201"
      case (2, 1) => "210"
      case (3, 0) => "300"
      case (mm, 2) => // 021* / 120*: U = heads meet, D = tails diverge, C = chain
        val sub = if (asym(0)._2 == asym(1)._2) "U"
                  else if (asym(0)._1 == asym(1)._1) "D" else "C"
        (if (mm == 0) "021" else "120") + sub
      case (1, 1) => // 111D = asym head inside the mutual pair (A↔B←C)
        val (u, v) = dyads.collectFirst { case (p, 1, 1) => p }.get
        if (Set(u, v)(asym.head._2)) "111D" else "111U"
      case (0, 3) => // 030C = directed 3-cycle (all tails and heads distinct)
        if (asym.map(_._1).distinct.size == 3 &&
            asym.map(_._2).distinct.size == 3) "030C" else "030T"
      case other => sys.error(s"impossible dyad profile $other")
    }
  }

  val Classes: Seq[String] = Seq("003", "012", "102", "021D", "021U", "021C",
    "111D", "111U", "030T", "030C", "201", "120D", "120U", "120C", "210", "300")

  /** code = ab + 2·ba + 4·ac + 8·ca + 16·bc + 32·cb  →  class name. */
  val ClassOf: IndexedSeq[String] = (0 until 64).map { c =>
    classify(c & 1, (c >> 1) & 1, (c >> 2) & 1, (c >> 3) & 1, (c >> 4) & 1, (c >> 5) & 1)
  }

  /** @param edges directed (src, dst); self-loops and duplicates are dropped.
    * @return all 16 rows (clazz, cnt), Σ cnt = C(n,3) over the endpoint set.
    */
  def run(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()

    // canonical dyad codes on a<b: ab = bit(a→b), ba = bit(b→a)
    val dyads = e.select(
        least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"),
        when(col("src") < col("dst"), 1).otherwise(0).as("f"),
        when(col("src") > col("dst"), 1).otherwise(0).as("r"))
      .groupBy("a", "b").agg(max("f").as("ab"), max("r").as("ba"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val Seq(nMut, nAsym) = dyads
      .agg(sum(when(col("ab") + col("ba") === 2, 1L).otherwise(0L)),
           sum(when(col("ab") + col("ba") === 1, 1L).otherwise(0L)))
      .head().toSeq.map(v => if (v == null) 0L else v.asInstanceOf[Long])
    val n = e.select(col("src").as("v")).unionByName(e.select(col("dst").as("v")))
      .distinct().count()

    // triples with ≥2 connected dyads: wedges centered at the min / mid /
    // max vertex of the (x<y<z) triple; distinct collapses the 3× repeats
    // of fully-connected triples
    val p1 = dyads.select(col("a"), col("b"))
    val wedges = p1.as("l").join(p1.as("r"), col("l.a") === col("r.a") && col("l.b") < col("r.b"))
        .select(col("l.a").as("x"), col("l.b").as("y"), col("r.b").as("z"))
      .unionByName(p1.as("l").join(p1.as("r"), col("l.b") === col("r.b") && col("l.a") < col("r.a"))
        .select(col("l.a").as("x"), col("r.a").as("y"), col("l.b").as("z")))
      .unionByName(p1.as("l").join(p1.as("r"), col("l.b") === col("r.a"))
        .select(col("l.a").as("x"), col("l.b").as("y"), col("r.b").as("z")))
      .distinct()

    def code(p: String, bitF: Int, bitR: Int) = // dyad p absent ⇒ both bits 0
      coalesce(col(s"$p.ab"), lit(0)) * bitF + coalesce(col(s"$p.ba"), lit(0)) * bitR
    val coded = wedges
      .join(dyads.as("xy"), col("x") === col("xy.a") && col("y") === col("xy.b"), "left")
      .join(dyads.as("xz"), col("x") === col("xz.a") && col("z") === col("xz.b"), "left")
      .join(dyads.as("yz"), col("y") === col("yz.a") && col("z") === col("yz.b"), "left")
      .select((code("xy", 1, 2) + code("xz", 4, 8) + code("yz", 16, 32)).as("code"))

    val table = typedLit(ClassOf)
    def dyadBits(shift: Int) = shiftright(col("code"), shift).bitwiseAND(lit(3))
    val enumerated = coded
      .select(element_at(table, col("code") + 1).as("clazz"),
        // mutual / asym dyad counts of the triple, for the corrections
        ((dyadBits(0) === 3).cast("long") + (dyadBits(2) === 3).cast("long") +
         (dyadBits(4) === 3).cast("long")).as("mut"),
        ((dyadBits(0) === 1 || dyadBits(0) === 2).cast("long") +
         (dyadBits(2) === 1 || dyadBits(2) === 2).cast("long") +
         (dyadBits(4) === 1 || dyadBits(4) === 2).cast("long")).as("asym"))
      .groupBy("clazz")
      .agg(count(lit(1)).as("cnt"), sum("mut").as("muts"), sum("asym").as("asyms"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val (cntEnum, mutConsumed, asymConsumed) = enumerated
      .agg(sum("cnt"), sum("muts"), sum("asyms")).head() match {
        case r => (if (r.isNullAt(0)) 0L else r.getLong(0),
                   if (r.isNullAt(1)) 0L else r.getLong(1),
                   if (r.isNullAt(2)) 0L else r.getLong(2))
      }
    val c012 = nAsym * (n - 2) - asymConsumed
    val c102 = nMut * (n - 2) - mutConsumed
    val cAll = n * (n - 1) * (n - 2) / 6
    val c003 = cAll - cntEnum - c012 - c102

    dyads.unpersist(false)
    val base = Classes.toDF("clazz")
    val formula = Seq(("003", c003), ("012", c012), ("102", c102))
      .toDF("clazz", "fcnt")
    base.join(enumerated.select(col("clazz"), col("cnt")), Seq("clazz"), "left")
      .join(formula, Seq("clazz"), "left")
      .select(col("clazz"),
        coalesce(col("fcnt"), col("cnt"), lit(0L)).as("cnt"))
  }
}
