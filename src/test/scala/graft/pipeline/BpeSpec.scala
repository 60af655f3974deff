package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** BPE trainer: differential-tested against a plain-Scala reference
  * implementation of classic within-word BPE (pair counts weighted by word
  * frequency, lexicographic tie-break, greedy left-to-right rewrite).
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference BPE: trains k merges over (word -> count). */
  private def refBpe(words: Map[String, Long], k: Int): Seq[(Int, String, String, Long)] = {
    var voc: Map[Vector[String], Long] =
      words.groupMapReduce { case (w, _) => w.map(_.toString).toVector :+ Bpe.EndTok }(_._2)(_ + _)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (rank <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- voc; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((rank, l, r, c))
        voc = voc.groupMapReduce { case (syms, _) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.size) {
            if (i + 1 < syms.size && syms(i) == l && syms(i + 1) == r) {
              b += l + r; i += 2
            } else { b += syms(i); i += 1 }
          }
          b.result()
        }(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  test("trainMerges == reference BPE on a hand corpus (incl. same-symbol runs)") {
    // 'aaaa' exercises the overlapping same-pair case: (a,a) merges
    // left-to-right into aa,aa — never aa,a,a or a,aa,a
    val docs = Seq(
      (1L, "the cat sat, the cat!"),
      (2L, "low lower lowest low"),
      (3L, "aaaa aaa the THE The")).toDF("doc_id", "text")
    val words = Map("the" -> 5L, "cat" -> 2L, "sat" -> 1L, "low" -> 2L,
      "lower" -> 1L, "lowest" -> 1L, "aaaa" -> 1L, "aaa" -> 1L)
    val want = refBpe(words, 8)
    val got = Bpe.trainMerges(spark, docs, 8)
    assert(got == want, s"got=$got\nwant=$want")
    // the (a,a) count: aaaa has 3 adjacent occurrences, aaa has 2 => 5
    assert(want.exists { case (_, l, r, c) => l == "a" && r == "a" && c == 5L })
  }

  test("greedy left-to-right rewrite: aaaa -> [aa][aa], aaa -> [aa][a]") {
    // train exactly one (a,a) merge, then segment
    val docs = Seq((1L, "aaaa"), (2L, "aaa")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(spark, docs, 1)
    assert(merges.head._2 == "a" && merges.head._3 == "a")
    val counts = Bpe.tokenCounts(spark, docs, merges.map(m => (m._2, m._3)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // aaaa -> aa,aa,</w> = 3 tokens; aaa -> aa,a,</w> = 3 tokens
    assert(counts == Map(1L -> 3L, 2L -> 3L), counts.toString)
  }

  test("tokenCounts: merges shrink token counts; 0-merge = chars+1 per word") {
    val docs = Seq((1L, "banana and ananas"), (2L, "a banana bandana")).toDF("doc_id", "text")
    val zero = Bpe.tokenCounts(spark, docs, Nil).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc1: banana(7)+and(4)+ananas(7)=18; doc2: a(2)+banana(7)+bandana(8)=17
    assert(zero == Map(1L -> ((3L, 18L)), 2L -> ((3L, 17L))), zero.toString)
    val merges = Bpe.trainMerges(spark, docs, 6).map(m => (m._2, m._3))
    val six = Bpe.tokenCounts(spark, docs, merges).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(six(1L) < 18L && six(2L) < 17L, six.toString)
  }

  test("schedule is partitioning-invariant and early-stops when fully merged") {
    val docs = Seq((1L, "ab ab ab"), (2L, "ab")).toDF("doc_id", "text")
    val a = Bpe.trainMerges(spark, docs, 10)
    val b = Bpe.trainMerges(spark, docs.repartition(7), 10)
    assert(a == b)
    // 'ab' has 2 pairs ((a,b) then (ab,</w>)) — only 2 merges possible
    assert(a.size == 2 && a(0)._2 == "a" && a(0)._3 == "b"
      && a(1)._2 == "ab" && a(1)._3 == Bpe.EndTok, a.toString)
  }
}
