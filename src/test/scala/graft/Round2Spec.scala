package graft

import org.apache.spark.sql.functions._
import graft.core._
import graft.algos.{LabelPropagation, PageRank}
import graft.pipeline.Dedup

/** Round-2 surface: true product monoid, explicit-index extract, row/col
  * assign, assign-vs-subassign mask scope, distributed ranking, hub-skew
  * salting, pigeonhole-complete SimHash blocking, the n-gram df cap, the
  * fixed-k label-propagation variant, and comment-tolerant triplet reads.
  */
class Round2Spec extends SparkTestBase {

  test("Times monoid is a true product: zeros and negatives exact") {
    import spark.implicits._
    val raw = Seq((1L, 1L, -2.0), (1L, 1L, 3.0), (1L, 1L, -0.5),
      (2L, 2L, 4.0), (2L, 2L, 0.0), (3L, 3L, -2.0)).toDF("src", "dst", "w")
    assertMatrixEq(toMap(GBMatrix.fromTuples(raw, Monoid.Times)),
      Map((1L, 1L) -> 3.0, (2L, 2L) -> 0.0, (3L, 3L) -> -2.0))
    assert(GBMatrix.of(spark, Seq((0L, 0L, -2.0), (0L, 1L, 3.0), (1L, 0L, 0.0)))
      .reduceScalar(Monoid.Times) == 0.0)
    assert(GBMatrix.of(spark, Seq((0L, 0L, -2.0), (0L, 1L, 3.0)))
      .reduceScalar(Monoid.Times) == -6.0)
  }

  test("extractIndex: explicit lists reindex; duplicate indices duplicate rows") {
    val a = Map((1L, 10L) -> 1.0, (2L, 10L) -> 2.0, (2L, 20L) -> 3.0, (5L, 30L) -> 4.0)
    val m = toMatrix(a)
    assertMatrixEq(toMap(m.extractIndex(Seq(2L, 1L, 2L), Seq(10L, 30L))),
      Map((0L, 0L) -> 2.0, (1L, 0L) -> 1.0, (2L, 0L) -> 2.0))
    assertMatrixEq(toMap(m.extractIndex(Seq(2L, 5L), Seq(20L, 30L))),
      Map((0L, 0L) -> 3.0, (1L, 1L) -> 4.0))
  }

  test("assignRow / assignCol replace exactly one row/col") {
    val m = toMatrix(Map((1L, 1L) -> 1.0, (1L, 2L) -> 2.0, (2L, 1L) -> 3.0))
    val u = vecToDF(Map(5L -> 9.0))
    assertMatrixEq(toMap(m.assignRow(1L, u)), Map((1L, 5L) -> 9.0, (2L, 1L) -> 3.0))
    assertMatrixEq(toMap(m.assignCol(1L, u)), Map((5L, 1L) -> 9.0, (1L, 2L) -> 2.0))
  }

  test("subassign vs assign: mask scope + replace (GB_assign.c:28-30)") {
    val c = toMatrix(Map((0L, 0L) -> 1.0, (0L, 1L) -> 2.0, (5L, 5L) -> 7.0))
    val a = toMatrix(Map((0L, 0L) -> 10.0))
    val mask = toMatrix(Map((0L, 0L) -> 1.0))
    // subassign+replace: inside-unmasked (0,1) cleared, OUTSIDE (5,5) survives
    assertMatrixEq(toMap(c.subassignRange(a, 0, 1, 0, 1, mask, replace = true)),
      Map((0L, 0L) -> 10.0, (5L, 5L) -> 7.0))
    assertMatrixEq(toMap(c.subassignRange(a, 0, 1, 0, 1, mask)),
      Map((0L, 0L) -> 10.0, (0L, 1L) -> 2.0, (5L, 5L) -> 7.0))
    // assign (C-wide mask)+replace: (5,5) is unmasked -> cleared TOO
    assertMatrixEq(toMap(c.assignRangeMasked(a, 0, 1, 0, 1, mask, replace = true)),
      Map((0L, 0L) -> 10.0))
    assertMatrixEq(toMap(c.assignRangeMasked(a, 0, 1, 0, 1, mask)),
      Map((0L, 0L) -> 10.0, (0L, 1L) -> 2.0, (5L, 5L) -> 7.0))
  }

  test("Ranking.denseRank: 0-based global order without a global window") {
    import spark.implicits._
    val ids = Seq(30L, 5L, 17L, 2L, 100L, 42L).toDF("id")
    val got = Ranking.denseRank(ids, "k", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 0L, 5L -> 1L, 17L -> 2L, 30L -> 3L, 42L -> 4L, 100L -> 5L))
  }

  test("hub-skew salting: detection fires and results are identical") {
    import spark.implicits._
    // vertex 0 owns ~6000 of ~6003 edges (out-degree hub)
    val edges = ((1L to 6000L).map(i => (0L, i, 1.0)) ++
      Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 0L, 1.0))).toDF("src", "dst", "w")
    val hot = Skew.hotKeys(edges.select("src", "dst"), "src", parts = 4)
    assert(hot == Seq(0L))
    val salted = dfToVec(PageRank.run(spark, edges, tol = 0.0, maxIter = 8,
      skewSalts = 4).ranks.withColumnRenamed("r", "v"))
    val plain = dfToVec(PageRank.run(spark, edges, tol = 0.0, maxIter = 8,
      skewSalts = -1).ranks.withColumnRenamed("r", "v"))
    assertVecEq(salted, plain, tol = 1e-12, ctx = "salted-vs-plain")
  }

  test("simhash blocking is pigeonhole-complete at the requested radius") {
    import spark.implicits._
    val base = 0x123456789ABCDEFL
    // 6 flips in 6 DIFFERENT 9/10-bit blocks (the adversarial case the old
    // fixed 4x16 blocking missed: those flips touch all four 16-bit blocks)
    val flips = Seq(0, 10, 20, 30, 40, 50).map(1L << _).reduce(_ | _)
    val sig = Seq((1L, base), (2L, base ^ flips), (3L, ~base)).toDF("doc_id", "simhash")
    val got = Dedup.simhashCandidatePairs(sig, maxHamming = 6).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(got.head.getAs[Number]("hamming").intValue == 6)
  }

  test("ngram jaccard df cap: boilerplate-only pairs dropped, real dups kept") {
    import spark.implicits._
    val boiler = "common header line three"
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, s"$boiler unrelated one two"),
      (4L, s"$boiler something else four"),
      (5L, s"$boiler misc stuff five")).toDF("doc_id", "text")
    def pairs(maxDf: Int) =
      Dedup.ngramJaccardPairs(docs, threshold = 0.1, w = 3, maxDf = maxDf)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // boiler shingles have df=3 > 2 -> capped; docs 3/4/5 share ONLY boiler
    assert(pairs(maxDf = 2) == Set((1L, 2L)))
    assert(pairs(maxDf = 100) == Set((1L, 2L), (3L, 4L), (3L, 5L), (4L, 5L)))
  }

  test("CC and LPA resume from checkpoint to the identical fixpoint") {
    import spark.implicits._
    import graft.algos.{ConnectedComponents, LabelPropagation}
    val e = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0), (4L, 5L, 1.0),
      (10L, 11L, 1.0)).toDF("src", "dst", "w")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ccFull = m(ConnectedComponents.run(spark, e))
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    ConnectedComponents.run(spark, e, maxIter = 2,
      checkpointDir = Some(dir), checkpointEvery = 1) // killed mid-run stand-in
    assert(m(ConnectedComponents.run(spark, e,
      checkpointDir = Some(dir), checkpointEvery = 1)) == ccFull)
    val lpaFull = m(LabelPropagation.run(spark, e, maxIter = 10))
    val dir2 = java.nio.file.Files.createTempDirectory("graft_lpa_ckpt").toString
    LabelPropagation.run(spark, e, maxIter = 2,
      checkpointDir = Some(dir2), checkpointEvery = 1)
    assert(m(LabelPropagation.run(spark, e, maxIter = 10,
      checkpointDir = Some(dir2), checkpointEvery = 1)) == lpaFull)
  }

  test("labelprop runFixed(k) reaches run()'s fixpoint for k >= depth") {
    import spark.implicits._
    val e = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0),
      (10L, 11L, 1.0)).toDF("src", "dst", "w")
    def labs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labs(LabelPropagation.runFixed(spark, e, k = 6)) ==
      labs(LabelPropagation.run(spark, e, maxIter = 20)))
  }

  test("setElements upserts (SECOND accum) / removeElements deletes") {
    import spark.implicits._
    val m = toMatrix(Map((1L, 1L) -> 1.0, (2L, 2L) -> 2.0))
    val upd = Seq((1L, 1L, 9.0), (3L, 3L, 5.0), (3L, 3L, 1.0)).toDF("src", "dst", "w")
    assertMatrixEq(toMap(m.setElements(upd, Monoid.Plus)),
      Map((1L, 1L) -> 9.0, (2L, 2L) -> 2.0, (3L, 3L) -> 6.0))
    val del = Seq((2L, 2L), (9L, 9L)).toDF("src", "dst")
    assertMatrixEq(toMap(m.removeElements(del)), Map((1L, 1L) -> 1.0))
  }

  test("argminRows / normInf / isequal") {
    val m = toMatrix(Map((1L, 1L) -> 3.0, (1L, 2L) -> -5.0, (2L, 7L) -> 2.0))
    assert(dfToVec(m.argminRows.select("id", "v")) == Map(1L -> -5.0, 2L -> 2.0))
    assert(m.normInf == 5.0)
    assert(m.isequal(m))
    assert(!m.isequal(m.prune.apply((_, _, w) => w + 1.0)))
    assert(!m.isequal(toMatrix(Map((1L, 1L) -> 3.0)))) // pattern differs
  }

  test("random/sprand: deterministic, in-bounds, ~density, partitioning-independent") {
    val a = GBMatrix.random(spark, 100, 50, 0.05, seed = 3L)
    val b = GBMatrix.random(spark, 100, 50, 0.05, seed = 3L)
    val m = toMap(a)
    assert(m == toMap(b)) // bit-identical regeneration
    assert(m.keys.forall { case (i, j) => i >= 0 && i < 100 && j >= 0 && j < 50 })
    assert(m.values.forall(w => w > 0.0 && w < 1.0))
    assert(m.size > 150 && m.size <= 250) // ~250 draws minus collisions
    assert(toMap(GBMatrix(a.df.repartition(7))) == m)
  }

  test("triplet reader skips %% and # comment lines (MatrixMarket banners)") {
    val path = "/tmp/graft_triplet_comment_test.txt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      "%%MatrixMarket matrix coordinate real general\n# a comment\n1 2 3.5\n2 3\n")
    val m = graft.sources.TripletReader.read(spark, path, oneBased = true)
    assertMatrixEq(toMap(m), Map((0L, 1L) -> 3.5, (1L, 2L) -> 1.0))
  }

  test("MatrixMarket reader: banner, dims line, 1-based; symmetric mirroring") {
    val gen = "/tmp/graft_mm_general.mtx"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(gen),
      "%%MatrixMarket matrix coordinate real general\n% comment\n3 4 3\n1 2 5.0\n3 4 1.5\n2 2 -2.0\n")
    val (m, r, c) = graft.sources.TripletReader.readMatrixMarket(spark, gen)
    assert((r, c) == (3L, 4L))
    assertMatrixEq(toMap(m),
      Map((0L, 1L) -> 5.0, (2L, 3L) -> 1.5, (1L, 1L) -> -2.0))
    val sym = "/tmp/graft_mm_symmetric.mtx"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(sym),
      "%%MatrixMarket matrix coordinate pattern symmetric\n3 3 2\n2 1\n3 3\n")
    val (ms, rs, cs) = graft.sources.TripletReader.readMatrixMarket(spark, sym)
    assert((rs, cs) == (3L, 3L))
    assertMatrixEq(toMap(ms),
      Map((1L, 0L) -> 1.0, (0L, 1L) -> 1.0, (2L, 2L) -> 1.0))
  }

  test("buildVector combines duplicate (id,v) tuples with the dup monoid") {
    import spark.implicits._
    val raw = Seq((1L, 2.0), (1L, 3.0), (4L, 1.0)).toDF("id", "v")
    assert(dfToVec(GBMatrix.buildVector(raw, Monoid.Plus)) == Map(1L -> 5.0, 4L -> 1.0))
    assert(dfToVec(GBMatrix.buildVector(raw, Monoid.Min)) == Map(1L -> 2.0, 4L -> 1.0))
  }

  test("Ops registry: named unary/binary functions match scala math") {
    import spark.implicits._
    val vals = Seq(0.25, 1.0, 2.5, 7.0)
    val df = vals.map(v => (v, 3.0)).toDF("a", "b")
    val uExpect: Map[String, Double => Double] = Map(
      "ainv" -> (-_), "minv" -> (1.0 / _), "abs" -> math.abs, "sqrt" -> math.sqrt,
      "log" -> math.log, "exp" -> math.exp, "sin" -> math.sin, "tanh" -> math.tanh,
      "signum" -> (v => math.signum(v)), "floor" -> math.floor,
      "one" -> (_ => 1.0), "lnot" -> (v => if (v == 0.0) 1.0 else 0.0),
      "cbrt" -> math.cbrt, "pow2" -> (v => math.pow(2.0, v)))
    for ((name, f) <- uExpect) {
      val got = df.select(Ops.unary(name)(col("a"))).collect().map(_.getDouble(0))
      got.zip(vals).foreach { case (g, v) =>
        assert(math.abs(g - f(v)) < 1e-12, s"unary $name($v)") }
    }
    val bExpect: Map[String, (Double, Double) => Double] = Map(
      "plus" -> (_ + _), "minus" -> (_ - _), "rminus" -> ((a, b) => b - a),
      "times" -> (_ * _), "div" -> (_ / _), "rdiv" -> ((a, b) => b / a),
      "pow" -> math.pow, "min" -> math.min, "max" -> math.max,
      "iseq" -> ((a, b) => if (a == b) 1.0 else 0.0),
      "islt" -> ((a, b) => if (a < b) 1.0 else 0.0),
      "lor" -> ((a, b) => if (a != 0 || b != 0) 1.0 else 0.0),
      "atan2" -> math.atan2, "hypot" -> math.hypot,
      "fmod" -> ((a, b) => a % b),
      "copysign" -> ((a, b) => math.copySign(a, b)),
      "band" -> ((a, b) => (a.toLong & b.toLong).toDouble))
    for ((name, f) <- bExpect) {
      val got = df.select(Ops.binary(name)(col("a"), col("b"))).collect()
        .map(_.getDouble(0))
      got.zip(vals).foreach { case (g, v) =>
        assert(math.abs(g - f(v, 3.0)) < 1e-12, s"binary $name($v, 3)") }
    }
  }

  test("ktruss runFixed(rounds) reaches run()'s fixpoint for enough rounds") {
    import spark.implicits._
    // K4 plus a pendant triangle: 4-truss = the K4
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j, 1.0)
    val extra = Seq((3L, 10L, 1.0), (3L, 11L, 1.0), (10L, 11L, 1.0))
    val e = (k4 ++ extra).toDF("src", "dst", "w")
    def setOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = setOf(graft.algos.KTruss.runFixed(spark, e, k = 4, rounds = 3))
    val full = setOf(graft.algos.KTruss.run(spark, e, k = 4))
    assert(fixed == full)
    assert(fixed == k4.map { case (a, b, _) => (a, b) }.toSet)
  }

  test("codecs: WAV/BMP round-trip with analytic features; pipeline decodes them") {
    import graft.pipeline.{Codecs, Multimodal}
    val sr = 8000; val freq = 440.0; val n = 800
    val wav = Codecs.wavEncodePcm16(sr, Array.tabulate(n)(i =>
      (16384 * math.sin(2 * math.Pi * freq * i / sr)).toShort))
    val wi = Codecs.wavDecode(wav)
    assert(wi.sampleRate == sr && wi.channels == 1 && wi.nSamples == n)
    assert(math.abs(wi.durationSec - 0.1) < 1e-9)
    assert(math.abs(wi.rms - 0.5 / math.sqrt(2)) < 0.01)      // sine RMS = A/sqrt(2)
    assert(math.abs(wi.zeroCrossRate - 2 * freq / sr) < 0.01) // ~2f/sr crossings/sample
    val bmp = Codecs.bmpEncode24(10, 5, (x, y) => (x * 20, y * 50, 7))
    val bi = Codecs.bmpDecode(bmp)
    assert(bi.width == 10 && bi.height == 5)
    assert(math.abs(bi.meanR - (0 until 10).map(_ * 20).sum / 10.0) < 1e-9)
    assert(math.abs(bi.meanG - (0 until 5).map(_ * 50).sum / 5.0) < 1e-9)
    assert(bi.meanB == 7.0)
    // end-to-end: the Spark pipeline really decodes its audio payloads
    val feats = Multimodal.decodeAndFeaturize(spark, Multimodal.synthesize(spark, 12))
      .filter(col("kind") === "audio").select("feature").collect()
    assert(feats.nonEmpty && feats.forall { r =>
      val a = r.getSeq[Float](0)
      a(0) == 0.8f && math.abs(a(2) - 16384.0 / 32768 / math.sqrt(2)) < 0.01
    })
  }

  test("weighted PageRank: heavy edge attracts more rank (+.* semiring)") {
    import spark.implicits._
    // pagerank.m's weighted mode divides by the out-degree COUNT (not the
    // weight sum), so mass conservation needs row-stochastic-after-/d
    // weights: vertex 1's weights sum to its degree (1.8 + 0.2 = 2)
    val e = Seq((1L, 2L, 1.8), (1L, 3L, 0.2), (2L, 1L, 1.0), (3L, 1L, 1.0))
      .toDF("src", "dst", "w")
    val w = dfToVec(PageRank.run(spark, e, tol = 1e-9, maxIter = 60, weighted = true)
      .ranks.withColumnRenamed("r", "v"))
    val u = dfToVec(PageRank.run(spark, e, tol = 1e-9, maxIter = 60)
      .ranks.withColumnRenamed("r", "v"))
    assert(w(2L) > u(2L) && w(3L) < u(3L), s"weighted=$w unweighted=$u")
    assert(math.abs(u(2L) - u(3L)) < 1e-9) // unweighted splits evenly
  }

  test("extractRow/extractCol and save/load round-trip") {
    val m = toMatrix(Map((1L, 10L) -> 2.0, (1L, 11L) -> 3.0, (2L, 10L) -> 4.0))
    assert(dfToVec(m.extractRow(1L)) == Map(10L -> 2.0, 11L -> 3.0))
    assert(dfToVec(m.extractCol(10L)) == Map(1L -> 2.0, 2L -> 4.0))
    val path = "/tmp/graft_save_load_test"
    m.save(path)
    assert(GBMatrix.load(spark, path).isequal(m))
  }

  test("events: tumbling-window counts and gap sessionization") {
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (0L, ts("2024-01-01 00:05:00"), 1L, "click", 1.0, "{}"),
      (1L, ts("2024-01-01 00:20:00"), 1L, "click", 2.0, "{}"),
      (2L, ts("2024-01-01 01:10:00"), 1L, "view", 4.0, "{}"),  // >30min gap: new session
      (3L, ts("2024-01-01 00:10:00"), 2L, "view", 8.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val win = graft.pipeline.Events.windowedCounts(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(win == Set(
      ("2024-01-01 00:00:00", "click", 2L, 3.0),
      ("2024-01-01 01:00:00", "view", 1L, 4.0),
      ("2024-01-01 00:00:00", "view", 1L, 8.0)))
    val sess = graft.pipeline.Events.sessions(ev, gapMinutes = 30).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(sess == Set((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 4.0), (2L, 1L, 1L, 8.0)))
  }

  test("mxm dot3 (mask-first) matches the saxpy-shaped masked product") {
    val a = toMatrix(sprand(12, 0.3, 21L))
    val b = toMatrix(sprand(12, 0.3, 22L))
    val mask = toMatrix(sprand(12, 0.2, 23L))
    for (sr <- Seq(Semiring.PlusTimes, Semiring.MinPlus, Semiring.PlusPair)) {
      val saxpy = toMap(a.mxm(b, sr, Some(mask)))
      val dot3 = toMap(a.mxm(b, sr, Some(mask), Desc(dot3 = true)))
      assertMatrixEq(dot3, saxpy, ctx = s"dot3 ${sr.name}")
    }
  }
}
