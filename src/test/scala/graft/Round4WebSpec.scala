package graft

import org.apache.spark.sql.functions._
import graft.algos.{Bowtie, Node2Vec, PageRank, RandomWalk, TrustRank, WidestPath}

/** Round-4 web-structure batch: Broder bow-tie decomposition and
  * TrustRank/spam-mass — pinned on hand-built graphs where every class and
  * every mass value is known exactly, plus an algebraic identity tying
  * TrustRank back to PageRank.
  */
class Round4WebSpec extends SparkTestBase {

  test("Bowtie classifies all six classes exactly on a hand-built graph") {
    // core 3-cycle {10,11,12}; chain 0→1→core (IN); core→20→21 (OUT);
    // 1→30→20 bypasses the core (TUBE); 1→40 dead end and 41→20 (TENDRILs,
    // one hanging off IN, one feeding OUT); 50→51 detached (DISC)
    val es = Set(
      (10L, 11L), (11L, 12L), (12L, 10L),
      (0L, 1L), (1L, 10L),
      (12L, 20L), (20L, 21L),
      (1L, 30L), (30L, 20L),
      (1L, 40L), (41L, 20L),
      (50L, 51L))
    val got = Bowtie.run(spark, edgesDF(es)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = Map(
      10L -> "CORE", 11L -> "CORE", 12L -> "CORE",
      0L -> "IN", 1L -> "IN",
      20L -> "OUT", 21L -> "OUT",
      30L -> "TUBE",
      40L -> "TENDRIL", 41L -> "TENDRIL",
      50L -> "DISC", 51L -> "DISC")
    assert(got == want, s"got=$got")
  }

  test("Bowtie core tie-break picks the smallest component label") {
    // two disjoint 2-cycles, equal size: core must be {0,1} (label 0), the
    // other weakly-disconnected 2-cycle is DISC
    val es = Set((0L, 1L), (1L, 0L), (5L, 6L), (6L, 5L))
    val got = Bowtie.run(spark, edgesDF(es)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(0L -> "CORE", 1L -> "CORE", 5L -> "DISC", 6L -> "DISC"))
  }

  test("TrustRank with an all-trusted seed set IS uniform PageRank") {
    val es = cover
    val tr = dfToVec(TrustRank.runFixed(spark, edgesDF(es), k = 7, lit(true)))
    val pr = dfToVec(PageRank.runFixed(spark, edgesDF(es), k = 7))
    assertVecEq(tr, pr, tol = 1e-12, ctx = "trusted=all vs uniform")
  }

  test("spam mass: unreachable farm scores 1, trusted cluster stays low") {
    // trusted mutual pair {0,1}; spam farm {10,11} the seeds cannot reach
    val es = Set((0L, 1L), (1L, 0L), (10L, 11L), (11L, 10L))
    val rows = TrustRank.spamMass(spark, edgesDF(es), k = 10,
      trusted = col("id") <= 1).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    // no trust flows into the farm: tr=0 exactly, mass = (pr-0)/pr = 1
    assert(rows(10L)._2 == 0.0 && rows(10L)._3 == 1.0, s"farm: ${rows(10L)}")
    assert(rows(11L)._2 == 0.0 && rows(11L)._3 == 1.0, s"farm: ${rows(11L)}")
    // the trusted pair holds ALL the trust (tr=0.5 each by symmetry) while
    // uniform pr splits across 4 vertices (0.25 each): mass is negative
    assert(math.abs(rows(0L)._2 - 0.5) < 1e-8 && rows(0L)._3 < 0.0, s"seed: ${rows(0L)}")
    // tr is a probability distribution
    assert(math.abs(rows.values.map(_._2).sum - 1.0) < 1e-8)
  }

  test("TrustRank matches a dense in-memory mimic on the cover digraph") {
    val es = cover
    val trusted = Set(0L, 6L)
    val k = 6
    val verts = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val n = verts.size
    val idx = verts.zipWithIndex.toMap
    val outDeg = verts.map(v => es.count(_._1 == v).toDouble max 1.0)
    val sink = verts.map(v => !es.exists(_._1 == v))
    val ns = trusted.size.toDouble
    var r = verts.map(v => if (trusted(v)) 1.0 / ns else 0.0).toArray
    for (_ <- 1 to k) {
      val sinkMass = verts.indices.collect { case i if sink(i) => r(i) }.sum
      val base = 0.15 / ns + 0.85 * sinkMass / ns
      val nxt = Array.fill(n)(0.0)
      for ((s, d) <- es.toSeq)
        nxt(idx(d)) += 0.85 * r(idx(s)) / outDeg(idx(s))
      for (i <- verts.indices if trusted(verts(i))) nxt(i) += base
      r = nxt
    }
    val want = verts.zipWithIndex.map { case (v, i) => v -> r(i) }.toMap
    val got = dfToVec(TrustRank.runFixed(spark, edgesDF(es), k,
      col("id").isin(trusted.toSeq: _*)))
    assertVecEq(got, want, tol = 1e-12, ctx = "dense mimic")
  }

  test("anti-trust propagates backward from spam seeds (hand-computed chain)") {
    // 0→1→2 with 2 known-spam: scores flow along reversed edges; two
    // iterations by hand: r2 = {2: 0.15, 1: 0.85·0.15, 0: 0.85·0.85}
    val es = Set((0L, 1L), (1L, 2L))
    val got = dfToVec(TrustRank.antiTrust(spark, edgesDF(es), k = 2,
      spam = col("id") === 2))
    assertVecEq(got, Map(2L -> 0.15, 1L -> 0.1275, 0L -> 0.7225),
      tol = 1e-12, ctx = "anti-trust chain")
  }

  test("WidestPath matches a max-min closure mimic on a seeded weighted graph") {
    val rnd = new scala.util.Random(7L)
    val n = 30
    val es = (for { a <- 0 until n; b <- 0 until n
                    if a != b && rnd.nextDouble() < 0.12 }
      yield (a.toLong, b.toLong, (1 + rnd.nextInt(9)).toDouble))
    import spark.implicits._
    val df = es.toDF("src", "dst", "w")
    // Floyd-Warshall-style max-min closure from source 0
    val wmat = Array.fill(n, n)(0.0)
    es.foreach { case (a, b, w) => wmat(a.toInt)(b.toInt) = math.max(wmat(a.toInt)(b.toInt), w) }
    val best = Array.fill(n)(0.0); best(0) = WidestPath.Unbounded
    var changed = true
    while (changed) {
      changed = false
      for (a <- 0 until n; b <- 0 until n if wmat(a)(b) > 0) {
        val cand = math.min(best(a), wmat(a)(b))
        if (cand > best(b)) { best(b) = cand; changed = true }
      }
    }
    val vertsInGraph = es.flatMap(e => Seq(e._1, e._2)).toSet
    val want = (0 until n).collect {
      case v if best(v) > 0 && vertsInGraph(v.toLong) => v.toLong -> best(v)
    }.toMap
    val got = WidestPath.run(spark, df, source = 0L).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want, s"extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
  }

  test("Node2Vec step 1 equals RandomWalk's uniform first hop; all steps deterministic") {
    val es = randWeighted(40, 0.15, 31L)
    import spark.implicits._
    val df = es.toDF("src", "dst").withColumn("w", lit(1.0))
    val starts = es.flatMap(e => Seq(e._1, e._2)).distinct.toDF("id")
    val n2v = Node2Vec.run(spark, df, starts, steps = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rw = RandomWalk.run(spark, df, starts, steps = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rw.foreach { case ((w, t), v) => assert(n2v((w, t)) == v, s"walk $w step $t") }
    val again = Node2Vec.run(spark, df, starts, steps = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(n2v == again)
  }

  test("Node2Vec replays a driver-side mimic of the biased slot choice") {
    val es = randWeighted(25, 0.2, 17L)
    import spark.implicits._
    val df = es.toDF("src", "dst").withColumn("w", lit(1.0))
    val undAdj = scala.collection.mutable.Map[Long, List[Long]]()
    val eset = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    eset.foreach { case (a, b) =>
      undAdj(a) = b :: undAdj.getOrElse(a, Nil)
      undAdj(b) = a :: undAdj.getOrElse(b, Nil)
    }
    val adj = undAdj.map { case (k, v) => k -> v.sorted.toIndexedSeq }.toMap
    val startIds = adj.keySet.toSeq.sorted
    val steps = 4
    val want = scala.collection.mutable.Map[(Long, Long), Long]()
    for (w <- startIds) {
      var prev = -1L; var v = w
      want((w, 0L)) = v
      for (t <- 1 to steps) {
        val nbrs = adj(v)
        val nv = if (t == 1) nbrs(((w * 48271 + t * 11213 + v * 7919) % nbrs.size).toInt)
        else {
          val wgts = nbrs.map { x =>
            if (x == prev) 1L
            else if (eset((math.min(prev, x), math.max(prev, x)))) 2L
            else 4L
          }
          val tot = wgts.sum
          val slot = (w * 48271 + t * 11213 + v * 7919) % tot
          var acc = 0L; var pick = nbrs.head
          nbrs.indices.foreach { i =>
            if (slot >= acc && slot < acc + wgts(i)) pick = nbrs(i)
            acc += wgts(i)
          }
          pick
        }
        prev = v; v = nv
        want((w, t.toLong)) = v
      }
    }
    val got = Node2Vec.run(spark, df, startIds.toDF("id"), steps).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want.toMap,
      s"diff=${(got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)}")
  }

  test("WL refinement: stable partitions on path/star, blind to regularity") {
    import graft.algos.WLRefinement
    // P4 path: ends {0,3} vs middles {1,2} — stable at 2 classes, early exit
    val p4 = Set((0L, 1L), (1L, 2L), (2L, 3L))
    val got = WLRefinement.run(spark, edgesDF(p4), maxRounds = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == got(3L) && got(1L) == got(2L) && got(0L) != got(1L), s"$got")
    // C6 hexagon: 2-regular — 1-WL cannot refine past one class (the known
    // expressiveness ceiling; asserting it pins our combiner is honest WL)
    val c6 = (0 until 6).map(i => (i.toLong, ((i + 1) % 6).toLong)).toSet
    val hex = WLRefinement.run(spark, edgesDF(c6), maxRounds = 10).collect()
      .map(_.getLong(1)).toSet
    assert(hex.size == 1, s"regular graph split into $hex")
    // star K1,4: center vs leaves
    val star = (1 to 4).map(i => (0L, i.toLong)).toSet
    val sc = WLRefinement.run(spark, edgesDF(star), maxRounds = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1 to 4).map(i => sc(i.toLong)).toSet.size == 1 && sc(0L) != sc(1L))
  }

  test("WL refinement replays the arithmetic mimic exactly (3 fixed rounds)") {
    import graft.algos.WLRefinement.P
    val A = 1566083941L % P; val B = 1103515245L % P; val C = 12345L; val D = 69069L
    val es = randWeighted(30, 0.15, 41L)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val adj = scala.collection.mutable.Map[Long, List[Long]]()
    es.foreach { case (a, b) =>
      adj(a) = b :: adj.getOrElse(a, Nil); adj(b) = a :: adj.getOrElse(b, Nil)
    }
    var c = adj.keys.map(_ -> 1L).toMap
    for (_ <- 1 to 3) {
      c = c.map { case (v, _) =>
        // BigInt stands in for the engine's decimal(38,0) multiset sum
        val sg = adj(v).map { u =>
          val cu = c(u); BigInt((A * cu % P * cu % P + B * cu % P + C) % P)
        }.sum
        v -> ((BigInt(D * c(v) % P) + sg) % P).toLong
      }
    }
    val got = graft.algos.WLRefinement.run(spark, edgesDF(es), maxRounds = 3,
      earlyExit = false).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == c, s"diff=${(got.toSet diff c.toSet) ++ (c.toSet diff got.toSet)}")
  }

  test("conductance: hand case and brute force on a seeded labeling") {
    import graft.algos.GraphStats
    import spark.implicits._
    // two triangles bridged by one edge, labeled by triangle: vol 7/7,
    // cut 1/1, phi = 1/7 each
    val es = Set((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L))
    val labels = (0L to 5L).map(i => (i, if (i <= 2) 0L else 1L)).toDF("id", "label")
    val got = GraphStats.conductance(spark, edgesDF(es), labels).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(0L) == ((7L, 1L, 1.0 / 7.0)) && got(1L) == ((7L, 1L, 1.0 / 7.0)), s"$got")
    // brute force on a seeded graph with id%3 labels
    val res = randWeighted(40, 0.12, 53L)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val lab = (v: Long) => v % 3
    val m = res.size
    val want = (0L to 2L).map { l =>
      val vol = res.toSeq.map { case (a, b) =>
        (if (lab(a) == l) 1 else 0) + (if (lab(b) == l) 1 else 0) }.sum.toLong
      val cut = res.count { case (a, b) =>
        lab(a) != lab(b) && (lab(a) == l || lab(b) == l) }.toLong
      val den = math.min(vol, 2L * m - vol)
      l -> ((vol, cut, if (den == 0) 0.0 else cut.toDouble / den))
    }.toMap
    val verts = res.flatMap(e => Seq(e._1, e._2)).toSeq.distinct
    val ldf = verts.map(v => (v, lab(v))).toDF("id", "label")
    val got2 = GraphStats.conductance(spark, edgesDF(res), ldf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got2 == want.filter(_._2._1 > 0), s"got=$got2 want=$want")
  }

  test("4-clique counts: planted K5 exact, brute force on a seeded graph") {
    import graft.algos.CliqueCount
    // K5: 5 K4s total, each vertex in C(4,3)=4 of them
    val k5 = (for { a <- 0 until 5; b <- a + 1 until 5 } yield (a.toLong, b.toLong)).toSet
    val got = CliqueCount.fourCliques(spark, edgesDF(k5)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 4L).map(_ -> 4L).toMap, s"$got")
    assert(got.values.sum / 4 == 5)
    // seeded random graph vs brute enumeration
    val es = randWeighted(22, 0.3, 61L)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val vs = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    def conn(x: Long, y: Long) = es((math.min(x, y), math.max(x, y)))
    val counts = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      i <- vs.indices; j <- i + 1 until vs.size
      k <- j + 1 until vs.size; l <- k + 1 until vs.size
      quad = Seq(vs(i), vs(j), vs(k), vs(l))
      if quad.combinations(2).forall { case Seq(x, y) => conn(x, y) }
    } quad.foreach(v => counts(v) += 1)
    val got2 = CliqueCount.fourCliques(spark, edgesDF(es)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == counts.toMap, s"got=$got2 want=$counts")
  }

  test("sampled triangle estimate: invP=1 is exact, invP=2 matches the coin mimic") {
    import graft.algos.TriangleCount
    val es = randWeighted(30, 0.25, 71L)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val exact = TriangleCount.run(spark, edgesDF(es))
    val full = TriangleCount.estimate(spark, edgesDF(es), invP = 1).collect()(0)
    assert(full.getLong(1) == exact && full.getLong(3) == exact, s"$full vs $exact")
    // invP=2: replay the nonlinear coin driver-side and brute-count the sample
    val M = 1000003L
    def keep(lo: Long, hi: Long) =
      ((lo % M * 48271 + 11) % M * ((hi % M * 7919 + 7) % M)) % M % 2 == 0
    val sample = es.filter { case (a, b) => keep(a, b) }
    def conn(x: Long, y: Long) = sample((math.min(x, y), math.max(x, y)))
    val vs = sample.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val wantT = (for {
      i <- vs.indices; j <- i + 1 until vs.size; k <- j + 1 until vs.size
      if conn(vs(i), vs(j)) && conn(vs(j), vs(k)) && conn(vs(i), vs(k))
    } yield 1).size.toLong
    val got = TriangleCount.estimate(spark, edgesDF(es), invP = 2).collect()(0)
    assert(got.getLong(0) == sample.size.toLong && got.getLong(1) == wantT
      && got.getLong(2) == 8L && got.getLong(3) == wantT * 8, s"$got want t=$wantT")
  }

  test("incremental CC equals batch CC, including delta-only vertices") {
    import graft.algos.ConnectedComponents
    val rnd = new scala.util.Random(83L)
    val es = randWeighted(50, 0.05, 83L)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      // a delta-only island (vertices 100,101 appear in no "old" edge)
      .union(Set((100L, 101L), (100L, 3L)))
    val (oldE, deltaE) = es.partition(_ => rnd.nextDouble() < 0.8) match {
      case (o, d0) =>
        // force the island edges into the delta
        (o -- Set((100L, 101L), (100L, 3L)),
          (d0 ++ Set((100L, 101L), (100L, 3L))))
    }
    val batch = ConnectedComponents.run(spark, edgesDF(es)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oldComp = ConnectedComponents.run(spark, edgesDF(oldE))
    val got = ConnectedComponents.incremental(spark, oldComp, edgesDF(deltaE))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == batch,
      s"diff=${(got.toSet diff batch.toSet) ++ (batch.toSet diff got.toSet)}")
  }

  test("pivot-sampled betweenness: all-vertex pivots reproduce exact BC") {
    import graft.algos.Betweenness
    val es = randWeighted(20, 0.18, 97L)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val verts = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val exact = Betweenness.run(spark, edgesDF(es)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // pivots = every vertex → scale factor n/|S| = 1: identical numbers
    val est = Betweenness.run(spark, edgesDF(es), sources = verts).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(exact.keySet == est.keySet)
    exact.foreach { case (v, bc) =>
      assert(math.abs(est(v) - bc) < 1e-9, s"v=$v ${est(v)} vs $bc") }
  }

  test("power-law alpha MLE matches a driver-side replica; pure power law recovered") {
    import graft.algos.GraphStats
    import spark.implicits._
    val es = randWeighted(60, 0.08, 113L)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val degs = es.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map(_._2.size.toLong).toSeq
    val tail = degs.filter(_ >= 2)
    val want = 1.0 + tail.size / tail.map(d => math.log(d / 1.5)).sum
    val row = GraphStats.powerLawAlpha(spark, edgesDF(es), dmin = 2L).collect()(0)
    assert(row.getLong(0) == 2L && row.getLong(1) == tail.size.toLong)
    assert(math.abs(row.getDouble(2) - want) < 1e-6, s"${row.getDouble(2)} vs $want")
    // a synthetic exact-Zipf degree multiset recovers its exponent closely:
    // degrees d with multiplicity ∝ d^-2.5 → alpha ≈ 2.5 (MLE on the tail)
    val star = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var next = 10000L
    var vid = 20000L
    for (d <- 2 to 40; _ <- 1 to math.max(1, math.round(2000.0 * math.pow(d, -2.5)).toInt)) {
      vid += 100
      for (i <- 0 until d) star += ((vid, next + i))
      next += d
    }
    val zrow = GraphStats.powerLawAlpha(spark,
      star.toSeq.toDF("src", "dst"), dmin = 2L).collect()(0)
    // hub side only dominates the tail (leaves are degree-1, excluded)
    assert(math.abs(zrow.getDouble(2) - 2.5) < 0.25, s"alpha=${zrow.getDouble(2)}")
  }

  test("hop plot: path hand case and BFS replica on a seeded graph") {
    import graft.algos.GraphStats
    import spark.implicits._
    val p4 = Set((0L, 1L), (1L, 2L), (2L, 3L))
    val got = GraphStats.hopPlot(spark, edgesDF(p4)).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((6L, 6L)), 2L -> ((4L, 10L)), 3L -> ((2L, 12L))))
    // seeded graph vs an exact driver-side all-pairs BFS
    val es = randWeighted(40, 0.07, 331L)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.filter(e => e._1 != e._2).toSet
    val adj = es.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => (v, xs.map(_._2).distinct) }
    val verts = adj.keys.toSeq
    val cnt = scala.collection.mutable.Map[Long, Long]()
    for (s <- verts) {
      val dist = scala.collection.mutable.Map(s -> 0L)
      var front = Seq(s); var d = 0L
      while (front.nonEmpty) {
        d += 1
        front = front.flatMap(adj(_)).distinct.filterNot(dist.contains)
        front.foreach(v => dist(v) = d)
      }
      dist.foreach { case (v, dd) => if (v != s) cnt(dd) = cnt.getOrElse(dd, 0L) + 1 }
    }
    val want = cnt.toSeq.sortBy(_._1)
    val wcum = want.scanLeft(0L)(_ + _._2).tail
    val got2 = GraphStats.hopPlot(spark, es.toSeq.toDF("src", "dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got2.toSeq == want.zip(wcum).map { case ((dd, p), c) => (dd, p, c) },
      s"got ${got2.mkString(",")} want $want")
  }

  test("Fiedler: barbell bisects exactly; path matches the cosine closed form") {
    import graft.algos.Fiedler
    // two K5s bridged by one edge — the spectral cut is the bridge
    def k5(base: Long) = (for (i <- 0 until 5; j <- i + 1 until 5)
      yield (base + i, base + j)).toSet
    val barbell = k5(0L) ++ k5(10L) + ((4L, 10L))
    val f = Fiedler.runFixed(spark, edgesDF(barbell), k = 40).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((0L to 4L).forall(f(_) > 0) && (10L to 14L).forall(f(_) < 0),
      s"barbell sides: $f")
    // bridge endpoints sit closest to the cut
    assert((0L to 3L).forall(i => f(i) > f(4L)) &&
           (11L to 14L).forall(i => f(i) < f(10L)))
    // mirror symmetry of the barbell (bridge 4 ↔ bridge 10, inner ↔ inner)
    assert(math.abs(f(4L) + f(10L)) < 1e-6)
    assert((0L to 3L).forall(i => math.abs(f(i) + f(i + 11)) < 1e-6))

    // P6 path: Fiedler vector is cos(π(i+1/2)/6) — monotone, antisymmetric
    val p6 = (0L to 4L).map(i => (i, i + 1)).toSet
    val g = Fiedler.runFixed(spark, edgesDF(p6), k = 200).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((0L to 4L).forall(i => g(i) > g(i + 1)), s"path monotone: $g")
    assert((0L to 5L).forall(i => math.abs(g(i) + g(5L - i)) < 1e-9))
    val want = (0 to 5).map(i => math.cos(math.Pi * (i + 0.5) / 6.0))
    val scale = g(0L) / want(0)
    assert((0 to 5).forall(i => math.abs(g(i.toLong) - want(i) * scale) < 1e-4),
      s"cosine profile: $g")
    // deflation is exact: the iterate stays centered and L1-normalized
    assert(math.abs(g.values.sum) < 1e-12)
    assert(math.abs(g.values.map(math.abs).sum - 1.0) < 1e-12)
  }

  test("Bipartite: even cycle passes, odd cycle certified, mixed components split") {
    import graft.algos.Bipartite
    // C4 (bipartite) ∪ C5 (odd cycle) ∪ an isolated edge (bipartite)
    val c4 = Set((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val c5 = Set((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 10L))
    val iso = Set((20L, 21L))
    val got = Bipartite.run(spark, edgesDF(c4 ++ c5 ++ iso)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // comps are min ids; BFS parity from the root
    assert(got(0L) == ((0L, 0L, 0L, 1L)) && got(1L) == ((0L, 1L, 0L, 1L)) &&
           got(2L) == ((0L, 0L, 0L, 1L)) && got(3L) == ((0L, 1L, 0L, 1L)))
    // C5: dists from 10 are 0,1,2,2,1 → sides 0,1,0,0,1; one same-side edge
    assert(got(10L) == ((10L, 0L, 1L, 0L)) && got(11L) == ((10L, 1L, 1L, 0L)) &&
           got(12L) == ((10L, 0L, 1L, 0L)) && got(13L) == ((10L, 0L, 1L, 0L)) &&
           got(14L) == ((10L, 1L, 1L, 0L)))
    assert(got(20L) == ((20L, 0L, 0L, 1L)) && got(21L) == ((20L, 1L, 0L, 1L)))
  }

  test("HittingTime: path hand case and DP replica on a seeded graph") {
    import graft.algos.HittingTime
    // P3 0-1-2, seed {0}: h_4 = (0, 2.25, 3) by hand (exact limit 0,3,4)
    val p3 = Set((0L, 1L), (1L, 2L))
    val got = HittingTime.runFixed(spark, edgesDF(p3), seeds = Seq(0L), k = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(0L -> 0.0, 1L -> 2.25, 2L -> 3.0), s"got $got")

    // seeded graph vs an exact driver-side DP, seeds {1,3}
    val es = randWeighted(40, 0.07, 733L)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2).toSet
    val adj = es.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => (v, xs.map(_._2).distinct) }
    val seeds = Set(1L, 3L).filter(adj.contains)
    var h = adj.keys.map(_ -> 0.0).toMap
    for (_ <- 1 to 6)
      h = adj.map { case (v, ns) =>
        v -> (if (seeds(v)) 0.0 else 1.0 + ns.map(h).sum / ns.size) }
    import spark.implicits._
    val got2 = HittingTime.runFixed(spark, es.toSeq.toDF("src", "dst"),
        seeds = seeds.toSeq, k = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got2.keySet == h.keySet)
    assert(h.forall { case (v, x) => math.abs(got2(v) - x) < 1e-9 },
      s"got $got2 want $h")
    // truncation bound: every value ≤ k
    assert(got2.values.forall(_ <= 6.0 + 1e-12))
  }

  test("DensestSubgraph: planted clique found; peel replica matches exactly") {
    import graft.algos.DensestSubgraph
    // K8 planted in a 50-vertex path: the peel must surface density 3.5
    val k8 = (for (i <- 0 until 8; j <- i + 1 until 8)
      yield (100L + i, 100L + j)).toSet
    val path = (0L until 49L).map(i => (i, i + 1)).toSet
    val stats = DensestSubgraph.peel(spark, edgesDF(k8 ++ path)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(stats.map(_._4).max == 3.5, s"rounds: ${stats.toSeq}")
    // round 0 is the whole graph
    assert(stats.head == ((0L, 58L, 77L, BigDecimal(77.0 / 58)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))

    // seeded graph vs an exact driver-side peel replica
    val es = randWeighted(60, 0.06, 911L)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2).toSet
    var cur = es
    val want = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    var r = 0L
    while (cur.nonEmpty && r < 12) {
      val deg = cur.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (v, xs) => (v, xs.size.toLong) }
      val n = deg.size.toLong; val m = cur.size.toLong
      want += ((r, n, m, BigDecimal(m.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      val keep = deg.filter { case (_, d) => d * n > 3 * m }.keySet
      cur = cur.filter { case (a, b) => keep(a) && keep(b) }
      r += 1
    }
    val got = DensestSubgraph.peel(spark, edgesDF(es)).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(got.sortBy(_._1).toSeq == want.sortBy(_._1).toSeq,
      s"got ${got.toSeq} want $want")
  }

  test("percolation: two-star hand case and union-find replica on a seeded graph") {
    import graft.algos.GraphStats
    import spark.implicits._
    // two 5-spoke stars whose hubs (0 and 10) are bridged: removing the
    // first hub strands its spokes; removing both shreds the graph
    val stars = (1L to 5L).map(i => (0L, i)) ++ (11L to 15L).map(i => (10L, i)) :+ ((0L, 10L))
    val out = GraphStats.percolation(spark, stars.toDF("src", "dst"), pcts = Seq(0, 10, 20))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(0L) == ((0L, 12L, 1L, 0L)))   // intact: one giant of 12
    assert(out(10L) == ((1L, 6L, 1L, 5L)))   // hub 0 gone: star-10 giant, 5 singletons
    assert(out(20L) == ((2L, 0L, 0L, 10L)))  // both hubs gone: all spokes stranded
    // seeded sparse graph vs a driver-side exact replica (rank + union-find)
    val es = randWeighted(50, 0.06, 227L)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.filter(e => e._1 != e._2).toSet
    val verts = es.toSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val degm = es.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (v, xs) => (v, xs.size) }
    for (p <- Seq(0, 10, 30)) {
      val k = verts.size * p / 100
      val removed = verts.sortBy(v => (-degm(v), v)).take(k).toSet
      val surv = es.filter(e => !removed(e._1) && !removed(e._2))
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = { val p0 = parent.getOrElse(x, x); if (p0 == x) x else { val r = find(p0); parent(x) = r; r } }
      surv.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
      val comps = surv.toSeq.flatMap(e => Seq(e._1, e._2)).distinct.groupBy(find)
      val giant = if (comps.isEmpty) 0L else comps.values.map(_.size).max.toLong
      val survVerts = surv.toSeq.flatMap(e => Seq(e._1, e._2)).distinct.size
      val row = GraphStats.percolation(spark, es.toSeq.toDF("src", "dst"), pcts = Seq(p))
        .collect()(0)
      assert(row.getLong(1) == k.toLong && row.getLong(2) == giant &&
        row.getLong(3) == comps.size.toLong &&
        row.getLong(4) == (verts.size - k - survVerts).toLong,
        s"p=$p got ${row.mkString(",")} want k=$k giant=$giant comps=${comps.size}")
    }
  }

  test("ego network: path hand case and brute-force ball on a seeded graph") {
    import graft.algos.GraphStats
    val p5 = Set((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val got = GraphStats.egoNet(spark, edgesDF(p5), Seq(0L), hops = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L), (1L, 2L)), s"$got")
    val es = randWeighted(40, 0.08, 101L)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set())
    es.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val seeds = Set(0L, 7L)
    val ball = seeds ++ seeds.flatMap(adj) ++ seeds.flatMap(adj).flatMap(adj)
    val want = es.filter { case (a, b) => ball(a) && ball(b) }
    val got2 = GraphStats.egoNet(spark, edgesDF(es), seeds.toSeq, hops = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 == want, s"extra=${got2 -- want} missing=${want -- got2}")
  }

  test("TriadCensus: hand triads, brute-force replica, sum = C(n,3)") {
    import graft.algos.TriadCensus
    def census(es: Set[(Long, Long)]): Map[String, Long] =
      TriadCensus.run(spark, edgesDF(es)).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    def only(m: Map[String, Long], kv: (String, Long)*): Boolean =
      m.filter(_._2 != 0L) == kv.toMap

    // directed 3-cycle / transitive triangle / mutual pair with in- and
    // out-edge from the third vertex (the 111D vs 111U convention lock)
    assert(only(census(Set((1L, 2L), (2L, 3L), (3L, 1L))), "030C" -> 1L))
    assert(only(census(Set((1L, 2L), (1L, 3L), (2L, 3L))), "030T" -> 1L))
    assert(only(census(Set((1L, 2L), (2L, 1L), (3L, 1L))), "111D" -> 1L))
    assert(only(census(Set((1L, 2L), (2L, 1L), (1L, 3L))), "111U" -> 1L))
    assert(only(census(Set((2L, 1L), (2L, 3L))), "021D" -> 1L))
    assert(only(census(Set((1L, 2L), (3L, 2L))), "021U" -> 1L))

    // seeded directed graphs vs an all-triples brute-force replica through
    // the same classifier table
    for (seed <- Seq(7L, 8L)) {
      val es = randWeighted(24, 0.12, seed).toSet
      val verts = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val want = (for {
        i <- verts.indices; j <- i + 1 until verts.size; k <- j + 1 until verts.size
        (x, y, z) = (verts(i), verts(j), verts(k))
      } yield {
        def b(u: Long, v: Long) = if (es((u, v))) 1 else 0
        TriadCensus.ClassOf(b(x, y) + 2 * b(y, x) + 4 * b(x, z) + 8 * b(z, x)
          + 16 * b(y, z) + 32 * b(z, y))
      }).groupBy(identity).map { case (c, xs) => (c, xs.size.toLong) }
      val got = census(es)
      assert(got.filter(_._2 != 0L) == want.filter(_._2 != 0L),
        s"seed $seed: got $got want $want")
      val n = verts.size.toLong
      assert(got.values.sum == n * (n - 1) * (n - 2) / 6)
      assert(got.keySet == TriadCensus.Classes.toSet)
    }
  }

  test("ANF runLcgTrace: exact sketch replica on seeded digraphs") {
    import graft.algos.ANF
    val P = 1000000007L
    def rho(u: Long, j: Int): Long = {
      val x = ((u % P) * 1000003L + 7919L * j + 12345L) % P
      if (x == 0L) 62L else java.lang.Long.numberOfTrailingZeros(x).toLong
    }
    for (seed <- Seq(41L, 42L)) {
      val es = randWeighted(18, 0.15, seed).filter(e => e._1 != e._2).toSet
      val verts = es.flatMap(e => Seq(e._1, e._2))
      val adj = es.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
      var ball: Map[Long, Set[Long]] = verts.map(v => v -> Set(v)).toMap
      val want = scala.collection.mutable.Map[(Long, Long), Long]()
      for (h <- 0 to 3) {
        if (h > 0) ball = ball.map { case (v, b) =>
          v -> (b ++ b.flatMap(u => adj.getOrElse(u, Set.empty))) }
        for (v <- verts) {
          val rs = (0 until 16).map { j =>
            val bits = ball(v).map(u => rho(u, j))
            Iterator.from(0).map(_.toLong).find(c => !bits(c)).get
          }
          want((h.toLong, v)) = rs.sum
        }
      }
      val got = ANF.runLcgTrace(spark, edgesDF(es), k = 16, hops = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == want.toMap, s"seed $seed")
    }
  }

  test("TransitiveReduction: chain/diamond hand cases + closure replica") {
    import graft.algos.TransitiveReduction
    def red(es: Set[(Long, Long)]): Set[(Long, Long)] =
      TransitiveReduction.run(spark, edgesDF(es)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    // shortcut edge over a chain is dropped; diamond keeps all four
    assert(red(Set((1L, 2L), (2L, 3L), (1L, 3L))) == Set((1L, 2L), (2L, 3L)))
    assert(red(Set((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)))
      == Set((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)))
    // long shortcut: 1->5 implied through the chain
    assert(red(Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L)))
      == Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))

    // random DAGs (src < dst is acyclic) vs a Floyd-Warshall replica
    for (seed <- Seq(31L, 32L)) {
      val es = randWeighted(20, 0.25, seed).collect {
        case (u, v) if u < v => (u, v)
      }.toSet
      val verts = es.flatMap(e => Seq(e._1, e._2))
      var reach = es
      var grew = true
      while (grew) {
        val nxt = reach ++ (for ((a, b) <- reach; (c, d) <- reach if b == c)
          yield (a, d))
        grew = nxt.size > reach.size; reach = nxt
      }
      val want = es.filter { case (u, v) =>
        !es.exists(e => e._1 == u && e._2 != v && reach((e._2, v)))
      }
      assert(red(es) == want, s"seed $seed")
      assert(verts.nonEmpty)
    }
  }

  test("sweepCut: PPR ordering finds the planted cluster; brute force profile") {
    import graft.algos.{GraphStats, PageRank}
    import spark.implicits._
    // two triangles bridged by one edge; PPR seeded in the left triangle.
    // The degree-normalized PPR sweep must hit its best conductance (1/7)
    // exactly at prefix {0,1,2}
    val es = Set((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L))
    val e = edgesDF(es)
    val und = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    val ppr = PageRank.runFixed(spark, und, k = 10, seeds = Seq(0L))
    val deg = und.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val scores = ppr.join(deg, Seq("id"))
      .select(col("id"), (col("r") / col("deg")).as("score"))
    val prof = GraphStats.sweepCut(spark, e, scores).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(prof(3L)._4 == 1.0 / 7.0, prof.toString)             // φ({0,1,2}) = 1/7
    assert((1L to 3L).map(prof(_)._1).toSet == Set(0L, 1L, 2L)) // the planted cluster
    // best PROPER prefix (the whole graph has φ = 0 by convention)
    assert((1L to 5L).map(prof(_)._4).min == 1.0 / 7.0)
    assert(prof(6L)._4 == 0.0)                                  // whole graph: φ = 0

    // brute force on a seeded graph with an arbitrary deterministic score,
    // tiny rangeSize so the two-level scan crosses ranges
    val res = randWeighted(30, 0.15, 97L)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      .filter(e2 => e2._1 != e2._2)
    val verts = res.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val sc = (v: Long) => (v * 37 + 11) % 101
    val order = verts.sortBy(v => (-sc(v), v))
    val degM = verts.map(v => v -> res.count(p => p._1 == v || p._2 == v).toLong).toMap
    val m = res.size.toLong
    var vol = 0L
    val want = order.zipWithIndex.map { case (v, i) =>
      vol += degM(v)
      val pre = order.take(i + 1).toSet
      val internal = res.count(p => pre(p._1) && pre(p._2)).toLong
      val cut = vol - 2 * internal
      val den = math.min(vol, 2 * m - vol)
      (i + 1).toLong -> ((v, vol, cut, if (den == 0) 0.0 else cut.toDouble / den))
    }.toMap
    val sdf = verts.map(v => (v, sc(v))).toDF("id", "score")
    val got = GraphStats.sweepCut(spark, edgesDF(res), sdf, rangeSize = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got == want, s"diff=${(got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)}")
  }

  /** Seeded directed pair list (may contain both directions). */
  private def randWeighted(n: Int, p: Double, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    for { a <- 0 until n; b <- 0 until n if a != b && rnd.nextDouble() < p }
      yield (a.toLong, b.toLong)
  }
}
