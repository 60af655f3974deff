package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.algos.{TemporalReach, Toposort}

/** Round-4 path-algorithm additions: topological layering and
  * time-respecting reachability, each against a dense brute-force mimic.
  */
class Round4PathSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("Toposort layers = longest path; ord is a valid topological order") {
    val rnd = new scala.util.Random(11L)
    // random DAG: edges only low -> high
    val n = 40
    val es = (for { a <- 0 until n; b <- a + 1 until n
                    if rnd.nextDouble() < 0.10 } yield (a.toLong, b.toLong))
    val got = Toposort.run(spark, es.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // brute-force longest path ending at v over the edge-endpoint vertices
    val verts = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val layer = scala.collection.mutable.Map(verts.map(_ -> 0L): _*)
    var changed = true
    while (changed) {
      changed = false
      es.foreach { case (a, b) =>
        if (layer(a) + 1 > layer(b)) { layer(b) = layer(a) + 1; changed = true }
      }
    }
    assert(got.keySet == layer.keySet)
    layer.foreach { case (v, l) => assert(got(v)._1 == l, s"layer($v)") }
    // ord: a permutation of 1..|V| where every edge goes forward and ties
    // sit in id order
    val ord = got.map { case (v, (_, o)) => v -> o }
    assert(ord.values.toSeq.sorted == (1L to verts.size.toLong))
    es.foreach { case (a, b) => assert(ord(a) < ord(b), s"edge $a->$b") }
  }

  test("TemporalReach: earliest arrival matches event-enumeration mimic; gates static reachability") {
    // hand case: 0 -(ts 5)-> 1 -(ts 3)-> 2 is NOT time-respecting (3 < 5),
    // so 2 is statically reachable but temporally not
    val hand = Seq((0L, 1L, 5L), (1L, 2L, 3L)).toDF("src", "dst", "ts")
    val h = TemporalReach.run(spark, hand, source = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h == Map(0L -> -1L, 1L -> 5L))

    val rnd = new scala.util.Random(23L)
    val n = 30
    val es = (for { a <- 0 until n; b <- 0 until n
                    if a != b && rnd.nextDouble() < 0.12 }
      yield (a.toLong, b.toLong, rnd.nextInt(12).toLong))
    val got = TemporalReach.run(spark, es.toDF("src", "dst", "ts"), source = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // mimic: BFS over (vertex, arrival) events with strict ts increase
    val best = scala.collection.mutable.Map[Long, Long](0L -> -1L)
    var frontier = Map(0L -> -1L)
    while (frontier.nonEmpty) {
      val nf = scala.collection.mutable.Map[Long, Long]()
      frontier.foreach { case (u, t) =>
        es.foreach { case (a, b, ts) =>
          if (a == u && ts > t && ts < best.getOrElse(b, Long.MaxValue)) {
            best(b) = ts
            nf(b) = math.min(ts, nf.getOrElse(b, Long.MaxValue))
          }
        }
      }
      frontier = nf.toMap
    }
    assert(got == best.toMap,
      s"extra=${got.keySet -- best.keySet} missing=${best.keySet -- got.keySet}")
  }
}
