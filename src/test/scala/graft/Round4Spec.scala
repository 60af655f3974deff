package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType
import graft.core.{GBMatrix, Iterate, Ops}
import graft.algos.{ConnectedComponents, MIS}
import graft.pipeline.{Codecs, Similarity}

/** Round-4 additions: strided/backwards extract, FastSV connected
  * components, MIS stall-reseed, bshift saturation, trunc(NaN), truncated-GIF
  * parse errors, the lshTopK candidate-plan fix, and the multi-executor
  * Iterate.free guard smoke.
  */
class Round4Spec extends SparkTestBase {

  // --- extractStride (GxB_STRIDE / GxB_BACKWARDS) ----------------------------

  test("extractStride: forward stride filters by modulo and reindexes") {
    // A(i,j) = 100i + j on a 10x10 grid
    val m = toMatrix((for (i <- 0L until 10L; j <- 0L until 10L)
      yield (i, j) -> (100.0 * i + j)).toMap)
    // I = 1:3:9 -> rows {1,4,7} -> k {0,1,2}; J = 0:4:8 -> cols {0,4,8} -> l {0,1,2}
    val got = toMap(m.extractStride(1, 9, 3, 0, 9, 4))
    val want = (for (k <- 0L until 3L; l <- 0L until 3L)
      yield (k, l) -> (100.0 * (1 + 3 * k) + 4 * l)).toMap
    assertMatrixEq(got, want, ctx = "forward stride")
  }

  test("extractStride: negative increment is GxB_BACKWARDS (descending list)") {
    val m = toMatrix((for (i <- 0L until 10L; j <- 0L until 10L)
      yield (i, j) -> (100.0 * i + j)).toMap)
    // I = 8:-2:0 -> rows {8,6,4,2,0} at positions k = (8-i)/2
    val got = toMap(m.extractStride(8, 0, -2, 0, 9, 1))
    val want = (for (k <- 0L until 5L; l <- 0L until 10L)
      yield (k, l) -> (100.0 * (8 - 2 * k) + l)).toMap
    assertMatrixEq(got, want, ctx = "backwards stride")
  }

  test("extractStride law: inc=1 equals extractRange rebased (splitTile)") {
    val m = toMatrix(sprand(12, 0.4, 41L))
    assertMatrixEq(
      toMap(m.extractStride(2, 9, 1, 3, 11, 1)),
      toMap(m.splitTile(2, 9, 3, 11)), ctx = "stride-1 = range")
  }

  test("sortRowsBy: identity key == sortRows; negation key == descending") {
    val m = toMatrix(sprand(15, 0.5, 7L))
    def ranks(df: DataFrame) = df.select("src", "dst", "k").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(ranks(m.sortRowsBy(identity)) == ranks(m.sortRows(ascending = true)))
    // a DIFFERENT comparator (descending via key negation, GxB user lt-op
    // style); dst tie-break keeps determinism, so only true reorderings move
    val desc = ranks(m.sortRows(ascending = false))
    val negKey = ranks(m.sortRowsBy(w => -w))
    assert(negKey.keySet == desc.keySet &&
      negKey.groupBy(_._1._1).forall { case (_, g) => g.values.toSeq.sorted ==
        desc.filter(kv => kv._1._1 == g.head._1._1).values.toSeq.sorted })
  }

  // --- FastSV connected components ------------------------------------------

  test("FastSV: 1e5-vertex path converges in O(log n) rounds (<= 20)") {
    val n = 100000L
    val path = spark.range(1, n).select(col("id").as("src"), (col("id") + 1).as("dst"))
    val (labs, rounds) = ConnectedComponents.runCounted(spark, path, fastsv = true)
    assert(rounds <= 20, s"FastSV took $rounds rounds on a diameter-$n path")
    val comps = labs.select("comp").distinct().collect().map(_.getLong(0)).toSeq
    assert(comps == Seq(1L), s"expected single component 1, got $comps")
    assert(labs.count() == n)
  }

  test("FastSV output is EXACTLY the min-label fixpoint on a random graph") {
    val rnd = new scala.util.Random(77L)
    val edges = edgesDF((0 until 300).map(_ =>
      (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong)).filter(e => e._1 != e._2).toSet)
    def m(df: DataFrame) = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val slow = m(ConnectedComponents.run(spark, edges, fastsv = false))
    val fast = m(ConnectedComponents.run(spark, edges, fastsv = true))
    assert(fast == slow)
  }

  test("FastSV handles two components + isolated self-referencing labels") {
    val (labs, _) = ConnectedComponents.runCounted(spark, edgesDF(twoBlocks), fastsv = true)
    val got = labs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L))
  }

  // --- MIS stall detection ---------------------------------------------------

  test("MIS: forced equal scores on adjacent candidates stall, reseed, terminate") {
    import spark.implicits._
    val edges = Seq((0L, 1L, 1.0)).toDF("src", "dst", "w")
    // salt 0: every candidate draws the SAME score (ties on both sides of the
    // edge -> zero winners -> stalled round). The reseed bumps salt; salt>0
    // draws distinct scores and the run finishes. Without stall detection
    // this fixture spins to maxIter with both vertices undecided.
    val scoreFn = (cand: DataFrame, _: Int, salt: Long) =>
      if (salt == 0L) cand.select(col("id"), lit(1.0).as("score"))
      else cand.select(col("id"), (col("id") + 1.0).as("score"))
    val res = MIS.runWithScores(spark, edges, maxIter = 5, scoreFn = scoreFn)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // a valid MIS on a single edge: exactly one endpoint in the set
    assert(res.size == 2 && res.values.count(identity) == 1, s"not a MIS: $res")
  }

  // --- bshift saturation (GB_bitshift_int64) ---------------------------------

  test("bshift saturates at |k| >= 64 instead of masking the count") {
    import spark.implicits._
    val bs = Ops.bitwise("bshift")
    val rows = Seq(
      (5L, 64L), (5L, 100L), (-5L, 64L),   // left/over-left -> 0
      (5L, -64L), (5L, -100L),             // right shift-out of positive -> 0
      (-5L, -64L), (-5L, -100L),           // arithmetic right of negative -> -1
      (5L, 63L), (1L, -63L), (-8L, -2L), (3L, 2L)) // in-range sanity
    val got = rows.toDF("a", "k").select(bs(col("a"), col("k"))).as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 0L, 0L, 0L, -1L, -1L,
      5L << 63, 0L, -2L, 12L), s"got $got")
  }

  test("trunc(NaN) passes NaN through (no long cast)") {
    import spark.implicits._
    val t = Ops.unary("trunc")
    val got = Seq(Double.NaN, 2.7, -2.7, 1.9e19).toDF("x")
      .select(t(col("x"))).as[Double].collect().toSeq
    assert(got(0).isNaN && got(1) == 2.0 && got(2) == -2.0 && got(3) == 1.9e19, s"got $got")
  }

  // --- truncated GIF ---------------------------------------------------------

  test("gifDecode raises a clear parse error on truncated payloads") {
    val palette = Array.tabulate(4)(i => i * 0x404040)
    val pixels = Array.tabulate[Byte](16)(i => (i % 4).toByte)
    val full = Codecs.gifEncode(4, 4, palette, Seq((pixels, 5)))
    assert(Codecs.gifDecode(full).frames.head.rgb.length == 16) // sanity
    for (cut <- Seq(14, full.length / 2, full.length - 2)) {
      val e = intercept[IllegalArgumentException](Codecs.gifDecode(full.take(cut)))
      assert(e.getMessage.contains("truncated GIF") || e.getMessage.contains("GIF"),
        s"cut=$cut -> ${e.getMessage}")
    }
  }

  // --- lshTopK candidate-plan lock -------------------------------------------

  test("lshTopK: no shuffle exchange carries embedding arrays (bare-id distinct)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      val q = e.filter(col("vec_id") < 3)
      val df = Similarity.lshTopK(e, q, k = 3, dim = 64)
      df.collect()
      val arrayShuffles = df.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeLike
          if s.output.exists(_.dataType.isInstanceOf[ArrayType]) => s
      }
      assert(arrayShuffles.isEmpty,
        s"embedding arrays ride an exchange:\n${arrayShuffles.headOption}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  // --- int8 embedding quantization --------------------------------------------

  test("quantizeInt8: codes clamp to ±127, dequantize within scale/2, zeros stay zero") {
    import spark.implicits._
    val rnd = new scala.util.Random(5L)
    val vecs = (0L until 20L).map(i =>
      (i, Array.fill(16)((rnd.nextFloat() - 0.5f) * 4.0f))) :+ (20L, Array.fill(16)(0.0f))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(df).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getSeq[Long](2)))).toMap
    vecs.foreach { case (id, v) =>
      val (scale, q) = got(id)
      if (v.forall(_ == 0.0f)) {
        assert(scale == 0.0 && q.forall(_ == 0L))
      } else {
        assert(math.abs(scale - v.map(x => math.abs(x.toDouble)).max / 127.0) < 1e-12)
        assert(q.forall(c => c >= -127L && c <= 127L))
        v.zip(q).foreach { case (x, c) =>
          assert(math.abs(x.toDouble - c * scale) <= scale / 2 + 1e-9,
            s"vec $id: $x dequantizes to ${c * scale}")
        }
      }
    }
  }

  test("quantizedTopK recall >= 0.9 vs exact float top-k") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    def pairs(df: DataFrame) =
      df.select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(e, q, k = 5))
    val quant = pairs(Similarity.quantizedTopK(Similarity.quantizeInt8(e), q, k = 5))
    val recall = exact.intersect(quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"int8 recall $recall < 0.9")
  }

  // --- repetition / formatting signals -----------------------------------------

  test("repetitionScores: hand-computed fixture (dup lines, bullets, top bigram)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b\na b\n- c\nend..."),
      (2L, ""),
      (3L, "x y z")).toDF("doc_id", "text")
    val got = graft.pipeline.TextStats.repetitionScores(docs).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    // doc 1: lines [a b, a b, - c, end...]; toks 7; bigrams 6 w/ "a b" twice
    assert(got(1L) == Seq(4L, 0.25, 0.2, 0.25, 0.25, 0.142857, 0.333333), s"${got(1L)}")
    // doc 2: empty -> all-zero signals
    assert(got(2L) == Seq(0L, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0), s"${got(2L)}")
    // doc 3: one line, bigrams [x y, y z] all distinct -> top share 1/2
    assert(got(3L) == Seq(1L, 0.0, 0.0, 0.0, 0.0, 0.0, 0.5), s"${got(3L)}")
  }

  // --- sequence packing / stratified sampling ----------------------------------

  test("packSequences: two-level scan == naive global prefix sum; spans + empties") {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    // sparse doc_ids (gaps!), some empty docs, sizes larger than the budget
    val docs = (0 until 400).map { i =>
      val id = i.toLong * 3 + (i % 2)
      val n = rnd.nextInt(40)
      (id, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val got = graft.pipeline.TextStats.packSequences(docs, budget = 64, rangeSize = 100)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // naive reference: running offset in doc_id order
    var off = 0L
    docs.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).foreach {
      case (id, text) =>
        val n = text.split("\\s+").count(_.nonEmpty).toLong
        val first = off / 64
        val last = if (n > 0) (off + n - 1) / 64 else first
        assert(got(id) == ((n, off, first, last)), s"doc $id: ${got(id)} != ($n,$off,$first,$last)")
        off += n
    }
  }

  test("stratifiedSample: deterministic, repartition-stable, rate-accurate") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rates = Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.0)
    def ids(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.TextStats.stratifiedSample(df, rates)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(docs)
    val b = ids(docs.repartition(17)) // stable under any partitioning
    assert(a == b && a.nonEmpty)
    val byLang = graft.pipeline.TextStats.stratifiedSample(docs, rates)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") == totals("de"))            // rate 1.0 keeps all
    assert(!byLang.contains("fr"))                  // rate 0.0 drops all
    assert(!byLang.contains("es") && !byLang.contains("zh")) // unlisted -> 0
    val enFrac = byLang("en").toDouble / totals("en")
    assert(enFrac > 0.3 && enFrac < 0.7, s"en keep fraction $enFrac far from 0.5")
  }

  // --- Iterate.free guard on a real multi-executor cluster --------------------

  test("Iterate.free refuses to unpersist on local-cluster; loops still complete") {
    import scala.jdk.CollectionConverters._
    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val inherited = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala
      .filterNot(a => a.startsWith("-Xmx") || a.startsWith("-Xms") || a.startsWith("-agentlib"))
    val cmd = Seq(javaBin) ++ inherited ++ Seq("-Xmx2g",
      "-cp", System.getProperty("java.class.path"), "graft.tools.ClusterSmoke")
    val pb = new ProcessBuilder(cmd.asJava)
    pb.environment().put("SPARK_HOME", "/opt/spark")
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val code = p.waitFor()
    assert(code == 0 && out.contains("CLUSTERSMOKE OK"),
      s"cluster smoke failed (exit $code):\n${out.takeRight(3000)}")
  }

  // --- batched Brandes betweenness -------------------------------------------

  /** Brute-force BC: per-source BFS path counts, then the pair-sum
    * definition bc(v) = Σ_{s<t} σ_st(v)/σ_st.
    */
  private def bruteBc(edges: Seq[(Long, Long)], n: Int): Array[Double] = {
    val ad = {
      val b = Array.fill(n)(Set.empty[Int])
      for ((a, c) <- edges if a != c) {
        b(a.toInt) += c.toInt; b(c.toInt) += a.toInt
      }
      b.map(_.toArray)
    }
    val dist = Array.ofDim[Int](n, n); val sig = Array.ofDim[Double](n, n)
    for (s <- 0 until n) {
      val d = Array.fill(n)(-1); val sg = Array.fill(n)(0.0)
      d(s) = 0; sg(s) = 1.0
      var frontier = List(s)
      while (frontier.nonEmpty) {
        val nxt = scala.collection.mutable.LinkedHashSet[Int]()
        for (u <- frontier; v <- ad(u)) {
          if (d(v) == -1) { d(v) = d(u) + 1; nxt += v }
          if (d(v) == d(u) + 1) sg(v) += sg(u)
        }
        frontier = nxt.toList
      }
      dist(s) = d; sig(s) = sg
    }
    val bc = Array.fill(n)(0.0)
    for (s <- 0 until n; t <- (s + 1) until n if dist(s)(t) > 0;
         v <- 0 until n if v != s && v != t &&
           dist(s)(v) >= 0 && dist(t)(v) >= 0 &&
           dist(s)(v) + dist(t)(v) == dist(s)(t))
      bc(v) += sig(s)(v) * sig(t)(v) / sig(s)(t)
    bc
  }

  /** Brute edge betweenness by the pair-counting formula: edge u→v carries
    * σ_s(u)·σ_t(v)/σ_s(t) of pair (s,t) when dist_s(u)+1+dist_t(v) =
    * dist_s(t); accumulated per canonical undirected edge.
    */
  private def bruteEbc(edges: Seq[(Long, Long)], n: Int): Map[(Long, Long), Double] = {
    val ad = {
      val b = Array.fill(n)(Set.empty[Int])
      for ((a, c) <- edges if a != c) {
        b(a.toInt) += c.toInt; b(c.toInt) += a.toInt
      }
      b.map(_.toArray)
    }
    val dist = Array.ofDim[Int](n, n); val sig = Array.ofDim[Double](n, n)
    for (s <- 0 until n) {
      val d = Array.fill(n)(-1); val sg = Array.fill(n)(0.0)
      d(s) = 0; sg(s) = 1.0
      var frontier = List(s)
      while (frontier.nonEmpty) {
        val nxt = scala.collection.mutable.LinkedHashSet[Int]()
        for (u <- frontier; v <- ad(u)) {
          if (d(v) == -1) { d(v) = d(u) + 1; nxt += v }
          if (d(v) == d(u) + 1) sg(v) += sg(u)
        }
        frontier = nxt.toList
      }
      dist(s) = d; sig(s) = sg
    }
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2).toInt, math.max(e._1, e._2).toInt)).distinct
    val acc = scala.collection.mutable.Map[(Long, Long), Double]()
      .withDefaultValue(0.0)
    for (s <- 0 until n; t <- (s + 1) until n if dist(s)(t) > 0;
         (a, b) <- und; (u, v) <- Seq((a, b), (b, a)))
      if (dist(s)(u) >= 0 && dist(t)(v) >= 0 &&
          dist(s)(u) + 1 + dist(t)(v) == dist(s)(t))
        acc((a.toLong, b.toLong)) += sig(s)(u) * sig(t)(v) / sig(s)(t)
    acc.toMap
  }

  test("Edge betweenness: brute differential on a random graph; path closed form") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val n = 12
    val edges0 = (for (i <- 0 until n; j <- (i + 1) until n
      if rnd.nextDouble() < 0.3) yield (i.toLong, j.toLong)).toList
    val got = graft.algos.Betweenness.runEdges(spark, edges0.toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val want = bruteEbc(edges0, n)
    assert(got.keySet == want.keySet, s"edge sets differ: ${got.keySet} vs ${want.keySet}")
    for ((k, w) <- want)
      assert(math.abs(got(k) - w) < 1e-9, s"edge $k got=${got(k)} want=$w")
    // 6-path closed form: edge (i, i+1) carries (i+1)·(5−i) pairs
    val path = (0L until 5L).map(i => (i, i + 1)).toDF("src", "dst")
    val g = graft.algos.Betweenness.runEdges(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (i <- 0L until 5L)
      assert(math.abs(g((i, i + 1)) - (i + 1) * (5 - i)) < 1e-9, s"edge $i: ${g((i, i + 1))}")
  }

  test("Betweenness: brute-force differential on a random graph; star + path forms") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val n = 12
    val edges0 = (for (i <- 0 until n; j <- (i + 1) until n
      if rnd.nextDouble() < 0.3) yield (i.toLong, j.toLong)).toList
    val got = graft.algos.Betweenness.run(spark, edges0.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = bruteBc(edges0, n)
    for (v <- 0 until n if got.contains(v.toLong))
      assert(math.abs(got(v.toLong) - want(v)) < 1e-9,
        s"v=$v got=${got(v.toLong)} want=${want(v)}")
    // star K_{1,7}: hub carries every pair = C(7,2) = 21, leaves 0
    val star = (1L until 8L).map(i => (0L, i)).toDF("src", "dst")
    val g2 = graft.algos.Betweenness.run(spark, star)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(g2(0L) - 21.0) < 1e-9 &&
      (1L until 8L).forall(i => g2(i) == 0.0), s"star: $g2")
    // 6-path: closed form i*(5-i)
    val path = (0L until 5L).map(i => (i, i + 1)).toDF("src", "dst")
    val g3 = graft.algos.Betweenness.run(spark, path)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (i <- 0L until 6L)
      assert(math.abs(g3(i) - i * (5 - i)) < 1e-9, s"path v=$i: ${g3(i)}")
  }

  test("Betweenness: source batching sums the batch's dependencies") {
    import spark.implicits._
    // path 0-1-2-3; from source 0 only: delta contributions at non-source
    // vertices: bc = delta/2 with delta_0(1)=2, delta_0(2)=1 -> (1.0, 0.5)
    val path = (0L until 3L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = graft.algos.Betweenness.run(spark, path, sources = Seq(0L))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(0L -> 0.0, 1L -> 1.0, 2L -> 0.5, 3L -> 0.0), s"got $got")
  }

  // --- training-pipeline operator batch 2 ------------------------------------

  test("Contamination.ngramOverlap: planted benchmark 3-grams are found") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x alpha beta gamma y"),          // 1 matched 3-gram of 3
      (2L, "beta gamma delta epsilon tail"), // 2 matched of 3
      (3L, "nothing shared here at all"),    // 0 of 3
      (4L, "too short")                      // 0 grams
    ).toDF("doc_id", "text")
    val got = graft.pipeline.Contamination
      .ngramOverlap(corpus, bench, w = 3, threshold = 0.3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(got == Map(1L -> ((3L, 1L, 1)), 2L -> ((3L, 2L, 1)),
      3L -> ((3L, 0L, 0)), 4L -> ((0L, 0L, 0))), s"got $got")
  }

  test("shuffleOrder: two-level rank == global sort rank; a permutation") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i * 7L, "t")).toDF("doc_id", "text")
    // small rangeWidth forces many ranges through the two-level scan
    val got = graft.pipeline.TextStats.shuffleOrder(docs, rangeWidth = 1L << 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byKey = got.sortBy(t => (t._2, t._1)).map(_._3)
    assert(byKey.sameElements(0L until 500L), "rank must equal global key order")
    assert(got.map(_._3).distinct.length == 500, "rank must be a permutation")
  }

  test("temperatureSample: τ=2 rates upweight rare sources, clamp at 1, deterministic") {
    import spark.implicits._
    val docs = ((0L until 900L).map(i => (i, "big")) ++
      (900L until 1000L).map(i => (i, "small"))).toDF("doc_id", "source")
    val out = graft.pipeline.TextStats.temperatureSample(docs, frac = 0.3, tau = 2.0)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact mirror of the rate arithmetic
    def rate(n: Long, counts: Seq[Long]): Double = {
      val wgts = counts.map(c => math.floor(math.sqrt(c.toDouble * 1e6)).toLong)
      val w = math.floor(math.sqrt(n.toDouble * 1e6)).toLong
      math.min(1.0, 0.3 * counts.sum.toDouble * w.toDouble /
        (wgts.sum.toDouble * n.toDouble))
    }
    val rBig = rate(900, Seq(900, 100)); val rSmall = rate(100, Seq(900, 100))
    assert(rSmall > rBig, "temperature must upweight the rare source")
    // slot draw is uniform over [0,10000): expected keep = n * floor(r*1e4)/1e4
    def expected(n: Long, r: Double): Double = n * math.floor(r * 10000) / 10000.0
    assert(math.abs(bySrc.getOrElse("big", 0L) - expected(900, rBig)) <= 60,
      s"big: got ${bySrc.get("big")}, expected ~${expected(900, rBig)}")
    assert(math.abs(bySrc.getOrElse("small", 0L) - expected(100, rSmall)) <= 30,
      s"small: got ${bySrc.get("small")}, expected ~${expected(100, rSmall)}")
    assert(out.collect().map(_.getLong(0)).sorted
      .sameElements(out.collect().map(_.getLong(0)).sorted), "deterministic")
  }

  test("redactPii: emails/IPs/phones replaced with typed tokens and counted") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a.b+c@sub.example.org and 192.168.0.1 then call +44 (0) 20-7946"),
      (2L, "no pii here, just 1.5 and v2.0 markers"),
      (3L, "two mails: x@y.io z@w.co plus 10.0.0.255")
    ).toDF("doc_id", "text")
    val got = graft.pipeline.TextStats.redactPii(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(1L) == (("mail <EMAIL> and <IP> then call <PHONE>", 1L, 1L, 1L)), got(1L))
    assert(got(2L) == (("no pii here, just 1.5 and v2.0 markers", 0L, 0L, 0L)), got(2L))
    assert(got(3L) == (("two mails: <EMAIL> <EMAIL> plus <IP>", 2L, 1L, 0L)), got(3L))
  }

  test("unigramLogProb: add-k arithmetic exact on a tiny corpus; OOV scores worse") {
    import spark.implicits._
    // corpus: "a" x3, "b" x2, "z" x1; vocabSize=2 -> vocab {a,b}, z is OOV
    val docs = Seq((1L, "a a b"), (2L, "a b z")).toDF("doc_id", "text")
    val got = graft.pipeline.TextStats.unigramLogProb(docs, vocabSize = 2, k = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val denom = 6.0 + 0.5 * 3.0 // N + k(V+1)
    def nlp(c: Long): Double = -math.log((c + 0.5) / denom)
    def r6(x: Double): Double = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L)._1 == 3L &&
      got(1L)._2 == r6((2 * nlp(3) + nlp(2)) / 3.0), s"got ${got(1L)}")
    assert(got(2L)._1 == 3L &&
      got(2L)._2 == r6((nlp(3) + nlp(2) + nlp(0)) / 3.0), s"got ${got(2L)}")
    assert(got(2L)._2 > got(1L)._2, "the OOV-bearing doc must score worse")
  }

  test("Dedup.incrementalNew: only content absent from the base survives") {
    import spark.implicits._
    val base = Seq((1L, "aa"), (2L, "bb")).toDF("doc_id", "text")
    val delta = Seq((10L, "aa"), (11L, "cc"), (12L, "cc"), (13L, "dd"))
      .toDF("doc_id", "text")
    val got = graft.pipeline.Dedup.incrementalNew(delta, base)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(11L -> 2L, 13L -> 1L), s"got $got")
  }
}
