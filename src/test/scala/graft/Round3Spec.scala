package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Codecs, Dedup, Similarity}

/** Round-3 additions: GIF codec round-trip, LSH bucket caps +
  * cluster-representative dedup, multiprobe cosine near-dup recall,
  * exact 64-bit bitwise ops, IEEE remainder, MIS checkpoint parity,
  * MatrixMarket symmetry kinds.
  */
class Round3Spec extends SparkTestBase {
  import spark.implicits._

  // --- GIF codec -------------------------------------------------------------

  private def palette16: Array[Int] = Array.tabulate(16)(i => i * 0x111111)

  test("GIF round-trip: multi-frame pixels exact, delays preserved") {
    val (w, h) = (23, 17) // non-power-of-two, odd sizes
    val frames = (0 until 4).map { f =>
      (Array.tabulate[Byte](w * h)(p => (((p % w) + (p / w) + f) % 16).toByte), 10 + f)
    }
    val gif = Codecs.gifEncode(w, h, palette16, frames)
    val dec = Codecs.gifDecode(gif)
    assert(dec.width == w && dec.height == h)
    assert(dec.frames.size == 4)
    for ((frame, f) <- dec.frames.zipWithIndex) {
      assert(frame.width == w && frame.height == h && frame.delayCs == 10 + f)
      val expect = frames(f)._1.map(i => palette16(i & 0xFF))
      assert(frame.rgb.sameElements(expect), s"frame $f pixel mismatch")
    }
  }

  test("GIF LZW: KwKwK runs and dictionary-full clears decode exactly") {
    // constant runs exercise the code==next (KwKwK) path immediately
    val (w, h) = (64, 8)
    val runs = Array.fill[Byte](w * h)(5)
    val decRuns = Codecs.gifDecode(Codecs.gifEncode(w, h, palette16, Seq((runs, 0))))
    assert(decRuns.frames.head.rgb.forall(_ == palette16(5)))
    // a large high-entropy frame forces code-size growth to 12 bits and a
    // mid-stream dictionary-full CLEAR/reset
    val (bw, bh) = (160, 120)
    val rnd = new scala.util.Random(7)
    val big = Array.fill[Byte](bw * bh)((rnd.nextInt(16)).toByte)
    val dec = Codecs.gifDecode(Codecs.gifEncode(bw, bh, palette16, Seq((big, 0))))
    val expect = big.map(i => palette16(i & 0xFF))
    assert(dec.frames.head.rgb.sameElements(expect), "19200-pixel frame must round-trip")
  }

  // --- LSH bucket caps + clusters --------------------------------------------

  /** 1000 identical docs (a duplicate mega-cluster) + 3 distinct ones. */
  private lazy val megaDocs = {
    val dup = (0L until 1000L).map(i => (i, "common boilerplate license text " +
      "repeated verbatim across the whole crawl again and again"))
    val uniq = Seq(
      (2000L, "a genuinely unique document about sparse matrix engines"),
      (2001L, "another unique one regarding benchmarks and scaling laws"),
      (2002L, "the third unique document mentions streaming watermarks"))
    (dup ++ uniq).toDF("doc_id", "text")
  }

  test("minhash bucket cap keeps candidate volume O(f); overCap reports the drop") {
    val sigs = Dedup.minhashSignatures(Dedup.shingles(megaDocs, 3), numPerm = 32)
    val buckets = Dedup.minhashBuckets(sigs, bands = 8).cache()
    // uncapped would emit 8 bands x 1000*999/2 pairs from the mega-cluster;
    // with the cap the mega buckets are excluded wholesale
    val capped = Dedup.minhashCandidates(sigs, bands = 8, maxBucket = 100).count()
    assert(capped <= 3 * 2 / 2 * 8, s"capped candidates: $capped")
    val dropped = Dedup.overCapBuckets(buckets, Seq("band", "bkt"), 100).collect()
    assert(dropped.nonEmpty && dropped.forall(_.getLong(2) == 1000L),
      "the audit view must report the 1000-doc buckets")
    buckets.unpersist()
  }

  test("simhash bucket cap: identical-fingerprint mega-cluster excluded from pairs") {
    val sig = Dedup.simhash(megaDocs).cache()
    val pairs = Dedup.simhashCandidatePairs(sig, maxHamming = 3, maxBucket = 100)
    // every pair among the 1000 identical docs is suppressed by the cap
    assert(pairs.filter(col("a") < 1000 && col("b") < 1000).count() == 0)
    sig.unpersist()
  }

  test("minhashClusters: linear output covers the mega-cluster the cap drops") {
    val c = Dedup.minhashClusters(megaDocs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c.size == 1003)
    for (i <- 0L until 1000L) assert(c(i) == 0L, s"doc $i -> ${c(i)}")
    for (i <- 2000L to 2002L) assert(c(i) == i, s"unique doc $i -> ${c(i)}")
  }

  test("simhashClusters groups identical fingerprints under the min doc id") {
    val c = Dedup.simhashClusters(megaDocs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (i <- 0L until 1000L) assert(c(i) == 0L, s"doc $i -> ${c(i)}")
  }

  test("exactClusters matches groupBy semantics; clustersFromBuckets merges transitively") {
    val docs = Seq((1L, "aa"), (2L, "aa"), (3L, "bb"), (4L, "cc")).toDF("doc_id", "text")
    val ec = Dedup.exactClusters(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ec == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L))
    // transitive merge: 1-2 share bucket A, 2-3 share bucket B => one cluster
    val buckets = Seq((1L, "A"), (2L, "A"), (2L, "B"), (3L, "B")).toDF("doc_id", "bkt")
    val cl = Dedup.clustersFromBuckets(docs, buckets, Seq("bkt")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  // --- multiprobe cosine near-dup recall -------------------------------------

  test("cosineNearDups multiprobe recall >= 0.9 on planted pairs at cosine ~0.5") {
    val dim = 64
    val rnd = new scala.util.Random(17L)
    def unit(): Array[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    // 80 planted pairs at cosine ~0.55 (above the 0.35 threshold, at the
    // driver's natural max-similarity regime) + 40 unrelated vectors
    val target = 0.55
    val base = (0 until 80).map(_ => unit())
    val partner = base.map { b =>
      val u0 = unit()
      // orthogonalize u against b, then mix for an exact target cosine
      val d = b.zip(u0).map { case (x, y) => x * y }.sum
      val u = u0.zip(b).map { case (x, y) => x - d * y }
      val un = math.sqrt(u.map(x => x * x).sum)
      val s = math.sqrt(1 - target * target)
      b.zip(u).map { case (x, y) => target * x + s * y / un }
    }
    val rows =
      base.zipWithIndex.map { case (v, i) => (i.toLong, v.map(_.toFloat)) } ++
      partner.zipWithIndex.map { case (v, i) => (1000L + i, v.map(_.toFloat)) } ++
      (0 until 40).map(i => (2000L + i.toLong, unit().map(_.toFloat)))
    val corpus = rows.toDF("vec_id", "embedding")
    val found = Similarity.cosineNearDups(corpus, threshold = 0.35, dim = dim,
        bits = 6, tables = 8, probes = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 80).map(i => (i.toLong, 1000L + i)).toSet
    val recall = planted.count(found.contains).toDouble / planted.size
    assert(recall >= 0.9, s"multiprobe recall $recall (found ${found.size} pairs)")
    // without multiprobe the same settings miss far more — the upgrade is real
    val found0 = Similarity.cosineNearDups(corpus, threshold = 0.35, dim = dim,
        bits = 6, tables = 8, probes = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.count(found0.contains) < planted.count(found.contains))
  }

  // --- exact 64-bit bitwise --------------------------------------------------

  test("Ops.bitwise: bit-exact on values beyond 2^53 (xxhash64-scale)") {
    val vals = Seq(
      (0x7FF123456789ABCDL, 0x0123456789ABCDEFL),
      (-4616189618054758400L, 9007199254740993L), // > 2^53
      (Long.MinValue, Long.MaxValue), (-1L, 0x8000000000000001L))
    val df = vals.toDF("a", "b")
    def runOp(op: String) =
      df.select(graft.core.Ops.bitwise(op)(col("a"), col("b")).as("r"))
        .collect().map(_.getLong(0)).toSeq
    assert(runOp("bor") == vals.map { case (a, b) => a | b })
    assert(runOp("band") == vals.map { case (a, b) => a & b })
    assert(runOp("bxor") == vals.map { case (a, b) => a ^ b })
    assert(runOp("bxnor") == vals.map { case (a, b) => ~(a ^ b) })
    val dfk = Seq((0x7FF123456789ABCDL, 7L), (-1L, 63L), (12345678901234567L, 1L))
      .toDF("a", "b")
    def runK(op: String) =
      dfk.select(graft.core.Ops.bitwise(op)(col("a"), col("b")).as("r"))
        .collect().map(_.getLong(0)).toSeq
    assert(runK("bget") == Seq((0x7FF123456789ABCDL >> 7) & 1, (-1L >> 63) & 1,
      (12345678901234567L >> 1) & 1))
    assert(runK("bset") == Seq(0x7FF123456789ABCDL | (1L << 7), -1L,
      12345678901234567L | 2L))
    assert(runK("bclr") == Seq(0x7FF123456789ABCDL & ~(1L << 7),
      -1L & ~(1L << 63), 12345678901234567L & ~2L))
    assert(df.select(graft.core.Ops.bitwiseNot(col("a")).as("r"))
      .collect().map(_.getLong(0)).toSeq == vals.map { case (a, _) => ~a })
    // bshift: positive = left, negative = arithmetic right
    val dfs = Seq((0x0123456789ABCDEFL, 8L), (0x0123456789ABCDEFL, -8L), (-256L, -4L))
      .toDF("a", "b")
    assert(dfs.select(graft.core.Ops.bitwise("bshift")(col("a"), col("b")).as("r"))
      .collect().map(_.getLong(0)).toSeq ==
      Seq(0x0123456789ABCDEFL << 8, 0x0123456789ABCDEFL >> 8, -256L >> 4))
  }

  test("remainder is IEEE half-even; trunc survives huge magnitudes") {
    val cases = Seq((5.0, 2.0), (-5.0, 2.0), (7.0, 2.0), (6.0, 4.0), (7.5, 1.5), (9.3, 2.7))
    val df = cases.toDF("a", "b")
    val got = df.select(graft.core.Ops.binary("remainder")(col("a"), col("b")).as("r"))
      .collect().map(_.getDouble(0)).toSeq
    for (((a, b), r) <- cases.zip(got))
      assert(math.abs(r - Math.IEEEremainder(a, b)) < 1e-12,
        s"remainder($a,$b) = $r, IEEE ${Math.IEEEremainder(a, b)}")
    val big = Seq(1.5e20, -3.7e25, 2.5, -2.5).toDF("x")
    val tr = big.select(graft.core.Ops.unary("trunc")(col("x")).as("t"))
      .collect().map(_.getDouble(0)).toSeq
    assert(tr == Seq(1.5e20, -3.7e25, 2.0, -2.0))
  }

  // --- MIS checkpoint parity -------------------------------------------------

  test("MIS resumes from checkpoint to the identical set; tag guards the seed") {
    val edges = edgesDF(hubSkew(400))
    val dir = java.nio.file.Files.createTempDirectory("mis_ckpt").toString
    val full = graft.algos.MIS.run(spark, edges, seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // partial run: stop after 1 round, snapshot every round
    graft.algos.MIS.run(spark, edges, maxIter = 1, seed = 7L,
      checkpointDir = Some(dir), checkpointEvery = 1)
    assert(graft.core.Checkpoint.newest(spark, dir,
      Seq("id", "deg", "cand", "inSet"), tag = "seed=7").isDefined)
    // a different seed must refuse the stale state
    assert(graft.core.Checkpoint.newest(spark, dir,
      Seq("id", "deg", "cand", "inSet"), tag = "seed=8").isEmpty)
    // resume with the same seed: identical final MIS
    val resumed = graft.algos.MIS.run(spark, edges, seed = 7L,
        checkpointDir = Some(dir), checkpointEvery = 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(resumed == full, "kill+resume must reproduce the uninterrupted run")
    // metrics.jsonl recorded per-iteration candidate counts
    val log = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/metrics.jsonl")), "UTF-8")
    assert(log.linesIterator.nonEmpty && log.contains("\"candidates\":"))
  }

  // --- sort permutation output -----------------------------------------------

  test("sortRowsFull: P really permutes — C(i,k) == A(i, P(i,k))") {
    val a = Seq((0L, 3L, 5.0), (0L, 1L, 2.0), (0L, 7L, 9.0),
                (1L, 2L, 4.0), (1L, 0L, 4.0)).toDF("src", "dst", "w")
    val (c, p) = graft.core.GBMatrix(a).sortRowsFull(ascending = true)
    val cm = c.df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val pm = p.df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val am = Map((0L, 1L) -> 2.0, (0L, 3L) -> 5.0, (0L, 7L) -> 9.0,
                 (1L, 0L) -> 4.0, (1L, 2L) -> 4.0)
    assert(cm.keySet == pm.keySet)
    for ((key, v) <- cm) assert(am((key._1, pm(key).toLong)) == v, s"at $key")
    // ties ranked deterministically by original column
    assert(pm((1L, 0L)) == 0.0 && pm((1L, 1L)) == 2.0)
  }

  // --- Iterate.free guard ----------------------------------------------------

  test("Iterate.free releases cut blocks locally, no-ops on uncut frames") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val cut = graft.core.Iterate.cut(Seq((1L, 2.0)).toDF("id", "v"))
    assert(sc.getPersistentRDDs.size > before, "cut must pin blocks")
    graft.core.Iterate.free(cut)
    assert(sc.getPersistentRDDs.values.count(_.getStorageLevel.useMemory) ==
      sc.getPersistentRDDs.values.count(_.getStorageLevel.useMemory)) // no throw
    // an uncut frame is left alone (guard matches only LogicalRDD leaves)
    graft.core.Iterate.free(Seq((1L, 2.0)).toDF("id", "v")) // must not throw
    assert(sc.isLocal, "tests run local; the free() fast path is local-only by design")
  }

  // --- MatrixMarket symmetry kinds -------------------------------------------

  private def writeTmp(lines: Seq[String]): String = {
    val f = java.nio.file.Files.createTempFile("mm", ".mtx")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("MatrixMarket: skew-symmetric mirrors with negated weights") {
    val p = writeTmp(Seq(
      "%%MatrixMarket matrix coordinate real skew-symmetric",
      "3 3 2", "2 1 5.0", "3 2 -2.0"))
    val (m, nr, nc) = graft.sources.TripletReader.readMatrixMarket(spark, p)
    assert(nr == 3 && nc == 3)
    val got = m.df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == Map((1L, 0L) -> 5.0, (0L, 1L) -> -5.0,
      (2L, 1L) -> -2.0, (1L, 2L) -> 2.0))
  }

  test("MatrixMarket: real hermitian = symmetric; complex field rejected") {
    val p = writeTmp(Seq(
      "%%MatrixMarket matrix coordinate real hermitian",
      "2 2 2", "1 1 3.0", "2 1 4.0"))
    val (m, _, _) = graft.sources.TripletReader.readMatrixMarket(spark, p)
    val got = m.df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == Map((0L, 0L) -> 3.0, (1L, 0L) -> 4.0, (0L, 1L) -> 4.0))
    val bad = writeTmp(Seq(
      "%%MatrixMarket matrix coordinate complex general", "1 1 1", "1 1 1.0 0.0"))
    intercept[Exception] {
      graft.sources.TripletReader.readMatrixMarket(spark, bad)
    }
  }
}
