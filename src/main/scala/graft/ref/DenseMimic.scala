package graft.ref

import graft.core.{BinOp, Monoid, Semiring}

/** Dense, triple-loop reference mimic of the GraphBLAS spec — the Scala
  * analogue of the reference's Test/GB_spec_*.m golden models ("a clean *.m
  * interpretation of the entire GraphBLAS spec", GB_spec_mxm.m:70-72; the
  * literal ijk loop with explicit identity handling, GB_spec_mxm.m:16-44).
  *
  * Matrices are Map[(Long,Long), Double] (present entries only); absent =
  * the semiring-add identity. Deliberately naive and allocation-happy — it
  * exists purely to differential-test the distributed engine on small inputs.
  */
object DenseMimic {

  type M = Map[(Long, Long), Double]
  type V = Map[Long, Double]

  def mxm(a: M, b: M, sr: Semiring): M =
    a.toSeq.flatMap { case ((i, k), wa) =>
      b.collect { case ((k2, j), wb) if k2 == k => ((i, j), sr.mult.eval(wa, wb)) }
    }.groupBy(_._1).map { case (ij, ts) => ij -> ts.map(_._2).reduce(sr.add.combine) }

  def mxv(a: M, u: V, sr: Semiring): V =
    a.toSeq.collect { case ((i, j), w) if u.contains(j) => (i, sr.mult.eval(w, u(j))) }
      .groupBy(_._1).map { case (i, ts) => i -> ts.map(_._2).reduce(sr.add.combine) }

  def vxm(u: V, a: M, sr: Semiring): V =
    a.toSeq.collect { case ((i, j), w) if u.contains(i) => (j, sr.mult.eval(u(i), w)) }
      .groupBy(_._1).map { case (j, ts) => j -> ts.map(_._2).reduce(sr.add.combine) }

  def eWiseMult(a: M, b: M, op: BinOp): M =
    a.keySet.intersect(b.keySet).map(k => k -> op.eval(a(k), b(k))).toMap

  def eWiseAdd(a: M, b: M, op: BinOp): M =
    (a.keySet ++ b.keySet).map { k =>
      k -> ((a.get(k), b.get(k)) match {
        case (Some(x), Some(y)) => op.eval(x, y)
        case (Some(x), None)    => x
        case (None, Some(y))    => y
        case _                  => throw new IllegalStateException
      })
    }.toMap

  def mask(z: M, m: M, complement: Boolean, structural: Boolean): M = {
    val present = if (structural) m.keySet else m.filter(_._2 != 0.0).keySet
    z.filter { case (k, _) => present.contains(k) != complement }
  }

  def reduceRows(a: M, mo: Monoid): V =
    a.groupBy(_._1._1).map { case (i, es) => i -> es.values.reduce(mo.combine) }

  def reduceScalar(a: M, mo: Monoid): Double =
    if (a.isEmpty) mo.identity else a.values.reduce(mo.combine)

  def transpose(a: M): M = a.map { case ((i, j), w) => ((j, i), w) }

  def kron(a: M, b: M, bm: Long, bn: Long, op: BinOp): M =
    for { ((ia, ja), wa) <- a; ((ib, jb), wb) <- b }
      yield ((ia * bm + ib, ja * bn + jb), op.eval(wa, wb))

  /** PageRank exactly per @GrB/pagerank.m (see algos.PageRank scaladoc). */
  def pagerank(edges: Set[(Long, Long)], damp: Double = 0.85, tol: Double = 1e-6,
               maxIter: Int = 100): (Map[Long, Double], Int) = {
    val verts = (edges.map(_._1) ++ edges.map(_._2)).toSeq.sorted
    val n = verts.size
    val outDeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toDouble }
    val sinks = verts.filterNot(outDeg.contains)
    var r = verts.map(_ -> 1.0 / n).toMap
    var iter = 0
    var delta = Double.PositiveInfinity
    val inc = edges.groupBy(_._2) // dst -> incoming edges
    while (iter < maxIter && delta >= tol) {
      val sinkMass = sinks.map(r).sum
      val base = (1.0 - damp) / n + damp * sinkMass / n
      val next = verts.map { v =>
        val s = inc.getOrElse(v, Set.empty).iterator.map { case (u, _) => r(u) / outDeg(u) }.sum
        v -> (base + damp * s)
      }.toMap
      delta = verts.map(v => math.abs(next(v) - r(v))).max
      r = next
      iter += 1
    }
    (r, iter)
  }

  /** Connected components on the symmetrized graph: exact min-reachable-id. */
  def components(edges: Set[(Long, Long)]): Map[Long, Long] = {
    val verts = (edges.map(_._1) ++ edges.map(_._2)).toSeq
    val adj = (edges ++ edges.map { case (a, b) => (b, a) })
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var labels = verts.map(v => v -> v).toMap
    var changed = true
    while (changed) {
      changed = false
      val next = labels.map { case (v, l) =>
        val nl = (adj.getOrElse(v, Set.empty).map(labels) + l).min
        if (nl != l) changed = true
        v -> nl
      }
      labels = next
    }
    labels
  }

  /** Triangle count: brute force over vertex triples via edge sets. */
  def triangles(edges: Set[(Long, Long)]): Long = {
    val und = (edges ++ edges.map { case (a, b) => (b, a) }).filter(e => e._1 != e._2)
    val es = und.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    var count = 0L
    for ((a, b) <- es; (b2, c) <- es if b2 == b && a < b)
      if (b < c && es.contains((a, c))) count += 1
    count
  }

  /** Label propagation, synchronous, min tie-break — mirror of the engine. */
  def labelProp(edges: Set[(Long, Long)], maxIter: Int = 20): Map[Long, Long] = {
    val und = (edges ++ edges.map { case (a, b) => (b, a) }).filter(e => e._1 != e._2)
    val verts = (und.map(_._1) ++ und.map(_._2)).toSeq
    val adj = und.groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSeq }
    var labels = verts.map(v => v -> v).toMap
    var iter = 0
    var changed = true
    while (changed && iter < maxIter) {
      changed = false
      val next = labels.map { case (v, l) =>
        val nbrs = adj.getOrElse(v, Seq.empty)
        if (nbrs.isEmpty) v -> l
        else {
          val hist = nbrs.map(labels).groupBy(identity).map { case (lb, xs) => (lb, xs.size) }
          val best = hist.toSeq.sortBy { case (lb, c) => (-c, lb) }.head._1
          if (best != l) changed = true
          v -> best
        }
      }
      labels = next
      iter += 1
    }
    labels
  }

  /** Shortest paths from source (Dijkstra, exact). */
  def sssp(edges: Set[(Long, Long, Double)], source: Long): Map[Long, Double] = {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(e => (e._2, e._3)) }
    val dist = scala.collection.mutable.Map(source -> 0.0)
    val pq = scala.collection.mutable.PriorityQueue((0.0, source))(Ordering.by(-_._1))
    while (pq.nonEmpty) {
      val (d, v) = pq.dequeue()
      if (d <= dist.getOrElse(v, Double.PositiveInfinity)) {
        for ((u, w) <- adj.getOrElse(v, Set.empty)) {
          val nd = d + w
          if (nd < dist.getOrElse(u, Double.PositiveInfinity)) {
            dist(u) = nd; pq.enqueue((nd, u))
          }
        }
      }
    }
    dist.toMap
  }

  /** BFS levels from source over the directed graph. */
  def bfsLevels(edges: Set[(Long, Long)], source: Long): Map[Long, Int] = {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var levels = Map(source -> 0)
    var frontier = Set(source)
    var l = 0
    while (frontier.nonEmpty) {
      l += 1
      val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty)) -- levels.keySet
      next.foreach(v => levels += v -> l)
      frontier = next
    }
    levels
  }
}
