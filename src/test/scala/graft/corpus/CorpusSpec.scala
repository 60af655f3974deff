package graft.corpus

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.algos.PageRank

/** North-rule input contract: deterministic corpus synthesis over
  * (repo, path, commit, lang, content), honest parse+join edge derivation,
  * sha256 row provenance, collision-free (repo,path) vertex ids.
  */
class CorpusSpec extends SparkTestBase {

  test("synthesis is deterministic: same seed → identical sha256 multiset") {
    val a = Corpus.synthesize(spark, 500).select(sha2(col("content"), 256))
      .collect().map(_.getString(0)).sorted.toSeq
    val b = Corpus.synthesize(spark, 500).select(sha2(col("content"), 256))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(a == b)
    assert(a.distinct.size == a.size, "contents must be pairwise distinct")
  }

  test("vertex ids are collision-free at test scale") {
    val c = Corpus.synthesize(spark, 5000)
    val n = c.count()
    val ids = c.select(Corpus.vertexId(col("repo"), col("path"))).distinct().count()
    assert(ids == n, s"xxhash64 collisions: $ids distinct ids for $n files")
  }

  test("derived edges resolve only real files, no self-loops, dup imports weighted") {
    val c = Corpus.synthesize(spark, 1000).cache()
    val vids = c.select(Corpus.vertexId(col("repo"), col("path")).as("vid"))
    val edges = Corpus.deriveEdges(c).cache()
    assert(edges.count() > 0)
    assert(edges.filter(col("src") === col("dst")).count() == 0)
    assert(edges.join(vids.withColumnRenamed("vid", "src"), Seq("src"), "left_anti").count() == 0)
    assert(edges.join(vids.withColumnRenamed("vid", "dst"), Seq("dst"), "left_anti").count() == 0)
    assert(edges.agg(min("w")).collect()(0).getDouble(0) >= 1.0)
    // weights count duplicate import lines: total weight == resolved import lines
    val importLines = c.select(explode(split(col("content"), "\n")).as("l"))
      .filter(col("l").startsWith("import ")).count()
    val totalW = edges.agg(sum("w")).collect()(0).getDouble(0)
    assert(totalW <= importLines, "edge weight cannot exceed emitted import lines")
    assert(totalW > importLines * 0.5, "most imports should resolve (self-loops drop a few)")
    c.unpersist(); edges.unpersist()
  }

  test("edge distribution is hub-skewed (the salting-relevant shape)") {
    val edges = Corpus.deriveEdges(Corpus.synthesize(spark, 2000))
    val indeg = edges.groupBy("dst").agg(sum("w").as("d"))
    val stats = indeg.agg(max("d").as("mx"), avg("d").as("av")).collect()(0)
    assert(stats.getDouble(0) > 10 * stats.getDouble(1),
      s"expected hub skew: max=${stats.getDouble(0)} avg=${stats.getDouble(1)}")
  }

  test("sha256 provenance: identity passes, tampering is caught") {
    val c = Corpus.synthesize(spark, 300).cache()
    assert(Corpus.provenanceViolations(c, c).count() == 0)
    val tampered = c.withColumn("content",
      when(col("path").endsWith("f0.scala"), concat(col("content"), lit("x")))
        .otherwise(col("content")))
    val bad = Corpus.provenanceViolations(tampered, c).count()
    assert(bad > 0, "tampered rows must be flagged")
    c.unpersist()
  }

  test("provenance survives a parquet round-trip (checkpoint-sink invariant)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    val c = Corpus.synthesize(spark, 300)
    c.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(Corpus.provenanceViolations(back, c).count() == 0)
  }

  test("PageRank over the derived corpus graph: mass conserved, converges") {
    val edges = Corpus.deriveEdges(Corpus.synthesize(spark, 1000))
    val res = PageRank.run(spark, edges, tol = 1e-6, maxIter = 100)
    assert(res.finalDelta < 1e-6, s"no convergence in ${res.iterations} iters")
    val mass = res.ranks.agg(sum("r")).collect()(0).getDouble(0)
    assert(math.abs(mass - 1.0) < 1e-9)
  }

  test("arith corpus: parse+resolve equals the generator formula exactly") {
    val c = Corpus.synthesizeArith(spark, 300).cache()
    val named = Corpus.deriveEdgesNamed(c).cache()
    // driver-side replica of the target formula, through the NAMES
    def repo(x: Long) = s"org${(x % 13) % 7}/repo${x % 13}"
    def path(x: Long) = s"src/f${x / 13}." + Corpus.Langs((x % 5).toInt)
    val want = (for (i <- 0L until 300L; k <- 0 to 3) yield {
      val mix = ((i + 1) * 48271L + (k + 1) * 7919L) % 1000003L
      val t = if (mix % 4 == 0) mix % math.max(1L, i / 16 + 1) else mix % 300L
      (i, t)
    }).filter { case (i, t) => i != t }
      .groupBy(identity).map { case ((i, t), xs) =>
        ((repo(i), path(i), repo(t), path(t)), xs.size.toLong) }
    val got = named.collect().map(r =>
      ((r.getString(0), r.getString(1), r.getString(2), r.getString(3)),
        r.getLong(4))).toMap
    assert(got == want, s"sizes got=${got.size} want=${want.size}")
    // the arith corpus keeps the schema and resolvability invariants
    assert(c.columns.toSeq == Seq("repo", "path", "commit", "lang", "content"))
    c.unpersist(); named.unpersist()
  }

  test("license taint: hand fixture with chain + cycle; forward imports don't taint") {
    import spark.implicits._
    // seed repo s/r0 = {a}; b→a, c→b (chain); d→{e,a}, e→d (cycle hanging
    // off the seed); f imports g only (both clean — taint flows dst→src)
    val c = Seq(
      ("s/r0", "a.c", ""),
      ("s/r1", "b.c", "import s/r0/a.c"),
      ("s/r1", "c.c", "import s/r1/b.c"),
      ("s/r2", "d.c", "import s/r2/e.c\nimport s/r0/a.c"),
      ("s/r2", "e.c", "import s/r2/d.c"),
      ("s/r3", "f.c", "import s/r3/g.c"),
      ("s/r3", "g.c", "")
    ).map { case (r, p, ct) => (r, p, "1", "c", ct) }
      .toDF("repo", "path", "commit", "lang", "content")
    val got = Corpus.licenseTaint(spark, c, "s/r0").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("s/r0", "a.c", 0L), ("s/r1", "b.c", 1L),
      ("s/r1", "c.c", 2L), ("s/r2", "d.c", 1L), ("s/r2", "e.c", 2L)))
  }

  test("license taint + dead files: BFS/anti-join replicas on the arith corpus") {
    val c = Corpus.synthesizeArith(spark, 300).cache()
    def repo(x: Long) = s"org${(x % 13) % 7}/repo${x % 13}"
    def path(x: Long) = s"src/f${x / 13}." + Corpus.Langs((x % 5).toInt)
    val edges = (for (i <- 0L until 300L; k <- 0 to 3) yield {
      val mix = ((i + 1) * 48271L + (k + 1) * 7919L) % 1000003L
      val t = if (mix % 4 == 0) mix % math.max(1L, i / 16 + 1) else mix % 300L
      (i, t)
    }).filter { case (i, t) => i != t }.toSet
    // replica: min reverse-hop BFS from repo0's files, bounded at 20
    val rev = edges.groupBy(_._2).map { case (t, xs) => (t, xs.map(_._1)) }
    var depth = Map.empty[Long, Long] ++
      (0L until 300L).filter(_ % 13 == 0).map(_ -> 0L)
    var frontier = depth.keySet
    var d = 0L
    while (frontier.nonEmpty && d < 20) {
      d += 1
      val next = frontier.flatMap(v => rev.getOrElse(v, Set.empty[Long]))
        .diff(depth.keySet)
      depth = depth ++ next.map(_ -> d)
      frontier = next
    }
    val want = depth.map { case (v, dd) => (repo(v), path(v), dd) }.toSet
    val got = Corpus.licenseTaint(spark, c, "org0/repo0").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want, s"taint sizes got=${got.size} want=${want.size}")
    assert(want.exists(_._3 > 0), "fixture must propagate beyond the seeds")

    val deadWant = (0L until 300L).filterNot(edges.map(_._2).contains)
      .map(v => (repo(v), path(v))).toSet
    val deadGot = Corpus.deadFiles(c).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(deadGot == deadWant, s"dead sizes got=${deadGot.size} want=${deadWant.size}")
    c.unpersist()
  }

  test("repo cycles: hand fixture (3-cycle + 2-cycle + isolated repo)") {
    import spark.implicits._
    // a→b→c→a (3-cycle), d↔e (2-cycle), f imports a (acyclic tail),
    // g has no cross-repo edges at all (isolated singleton)
    val c = Seq(
      ("a/r", "x.c", "import b/r/x.c"), ("b/r", "x.c", "import c/r/x.c"),
      ("c/r", "x.c", "import a/r/x.c"),
      ("d/r", "x.c", "import e/r/x.c"), ("e/r", "x.c", "import d/r/x.c"),
      ("f/r", "x.c", "import a/r/x.c"), ("g/r", "x.c", "")
    ).map { case (r, p, ct) => (r, p, "1", "c", ct) }
      .toDF("repo", "path", "commit", "lang", "content")
    val got = Corpus.repoCycles(spark, c).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(
      "a/r" -> (("a/r", 3L)), "b/r" -> (("a/r", 3L)), "c/r" -> (("a/r", 3L)),
      "d/r" -> (("d/r", 2L)), "e/r" -> (("d/r", 2L)),
      "f/r" -> (("f/r", 1L)), "g/r" -> (("g/r", 1L))), got.toString)
  }

  test("symbol xref + coupling metrics: hand fixture with multi-def file") {
    import spark.implicits._
    // lib declares two symbols and is imported by both apps; app1 also
    // imports app2 (so app2 has Ca=1, Ce=1); lib has Ca=2, Ce=0 (stable)
    val c = Seq(
      ("lib/r", "l.c", "def alpha(): 1\ndef beta(): 2"),
      ("app1/r", "a.c", "import lib/r/l.c\nimport app2/r/b.c\ndef main_a(): 3"),
      ("app2/r", "b.c", "import lib/r/l.c\ndef main_b(): 4")
    ).map { case (r, p, ct) => (r, p, "1", "c", ct) }
      .toDF("repo", "path", "commit", "lang", "content")

    val xref = Corpus.symbolXref(c).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(xref == Set(
      ("alpha", "lib/r", "l.c", 2L), ("beta", "lib/r", "l.c", 2L),
      ("main_a", "app1/r", "a.c", 0L), ("main_b", "app2/r", "b.c", 1L)), xref.toString)

    val m = Corpus.couplingMetrics(c).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))).toMap
    assert(m == Map(
      "lib/r" -> ((2L, 0L, 0.0)),          // maximally stable
      "app1/r" -> ((0L, 2L, 1.0)),         // maximally unstable
      "app2/r" -> ((1L, 1L, 0.5))), m.toString)
  }
}
