package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Training-data pipeline operators: dedup family, similarity search, text
  * analysis, multimodal plumbing — correctness on planted fixtures.
  */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  /** Docs with planted structure: 0/1 identical, 2 near-dup of 0 (one word
    * changed), 3/4 unrelated, 5 empty-ish.
    */
  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy cat again and again today"),
    (3L, "completely different content about distributed sparse matrix engines"),
    (4L, "unrelated words regarding graph analytics benchmarks and scaling laws"),
    (5L, "tiny")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical docs, keeps min id") {
    val r = Dedup.exact(docs).collect()
      .map(x => x.getLong(1) -> x.getLong(2)).toMap // keep_id -> n_copies
    assert(r(0L) == 2L) // docs 0 and 1
    assert(r.values.sum == 6L)
    // normalized variant also collapses whitespace-differing copies
    val extra = docs.union(Seq((6L, "THE  quick brown fox jumps over the lazy dog again and again today"))
      .toDF("doc_id", "text"))
    val rn = Dedup.exact(extra, normalize = true).collect()
      .map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert(rn(0L) == 3L)
  }

  test("shingles: distinct w-grams per doc") {
    val sh = Dedup.shingles(Seq((0L, "a b c d")).toDF("doc_id", "text"), w = 3)
    assert(sh.count() == 2) // "a b c", "b c d"
  }

  test("minhash near-dups find planted pair, skip unrelated") {
    val pairs = Dedup.minhashNearDups(docs, threshold = 0.5, numPerm = 32, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) == 1.0, s"identical pair missing: $pairs")
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)),
      s"near-dup 2 not found: $pairs") // 1 word of 13 changed
    // no pair may straddle the dup cluster {0,1,2} and the unrelated docs {3,4}
    assert(!pairs.keySet.exists { case (a, b) =>
      (a <= 2 && b >= 3) || (a >= 3 && b <= 2) }, s"unrelated docs paired: $pairs")
  }

  test("ngram jaccard agrees with hand-computed overlap") {
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.1, w = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) == 1.0)
    // doc0 vs doc2: 13 tokens → 11 shingles each; one word differs at token 8
    // → 3 shingles differ per side: inter = 8, union = 14, J = 4/7
    assert(math.abs(pairs((0L, 2L)) - 8.0 / 14.0) < 1e-9, s"${pairs((0L, 2L))}")
  }

  test("simhash: identical docs share fingerprints; near-dups within hamming budget") {
    val sig = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(0L) == sig(1L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(0L), sig(2L)) <= 16, s"near-dup hamming ${ham(sig(0L), sig(2L))}")
    assert(ham(sig(0L), sig(3L)) > 16, s"unrelated hamming ${ham(sig(0L), sig(3L))}")
    val nd = Dedup.simhashNearDups(docs, maxHamming = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nd.contains((0L, 1L)))
  }

  // --- similarity ------------------------------------------------------------

  /** Deterministic embeddings in 3 tight clusters around orthogonal axes. */
  private lazy val embs = {
    val rnd = new scala.util.Random(3L)
    (0 until 60).map { i =>
      val c = i % 3
      val base = Array.fill(16)(0.0f)
      base(c * 5) = 1.0f
      val v = base.map(x => x + (rnd.nextDouble() * 0.05).toFloat)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("brute-force cosine top-k returns same-cluster neighbors") {
    val q = embs.filter(col("vec_id") < 3) // one query per cluster
    val top = Similarity.bruteForceTopK(embs, q, k = 5).collect()
    assert(top.length == 15)
    for (r <- top) {
      val (qid, id) = (r.getLong(0), r.getLong(1))
      assert(qid % 3 == id % 3, s"query $qid matched cross-cluster $id")
    }
  }

  test("IVF top-k: high recall with few probes on clustered data; deterministic index") {
    val q = embs.filter(col("vec_id") < 6)
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = keyset(Similarity.bruteForceTopK(embs, q, k = 5).select("qid", "id"))
    // 6 lists over 3 tight clusters, probing 2: same-cluster lists are found
    val approx = keyset(Similarity.ivfTopK(embs, q, k = 5, nlist = 6, nprobe = 2)
      .select("qid", "id"))
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall")
    // the index is a pure function of the data (hash sampling, no RNG state)
    val (a1, c1) = Similarity.ivfIndex(embs, nlist = 6)
    val (a2, c2) = Similarity.ivfIndex(embs.repartition(7), nlist = 6)
    assert(a1.select("vec_id", "list").collect().toSet ==
      a2.select("vec_id", "list").collect().toSet)
    assert(c1.count() == c2.count())
  }

  test("PQ/ADC top-k: same-cluster recall on clustered data; codes deterministic") {
    val q = embs.filter(col("vec_id") < 6)
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cluster identity survives 4x compression: every ADC hit is same-cluster
    val approx = Similarity.pqTopK(embs, q, k = 5, m = 4, ksub = 6)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(approx.length == 30)
    for ((qid, id) <- approx)
      assert(qid % 3 == id % 3, s"PQ matched cross-cluster: $qid -> $id")
    // and recall vs exact is high on this easy geometry
    val exact = keyset(Similarity.bruteForceTopK(embs, q, k = 5).select("qid", "id"))
    val recall = exact.intersect(approx.toSet).size.toDouble / exact.size
    assert(recall >= 0.6, s"PQ recall $recall")
    // codes and codebook are pure functions of the data (any partitioning)
    val (k1, b1) = Similarity.pqIndex(embs, m = 4, ksub = 6)
    val (k2, b2) = Similarity.pqIndex(embs.repartition(7), m = 4, ksub = 6)
    assert(k1.collect().toSet == k2.collect().toSet)
    assert(b1.select("sub", "code").collect().toSet ==
      b2.select("sub", "code").collect().toSet)
    // every vector gets exactly m codes in [0, ksub)
    val perVec = k1.groupBy("vec_id").count().collect().map(_.getLong(1)).toSet
    assert(perVec == Set(4L))
  }

  test("LCG-PQ/ADC twin: same-cluster recall on clustered data; partition-invariant") {
    val q = embs.filter(col("vec_id") < 6)
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = keyset(Similarity.bruteForceTopK(embs, q, k = 5).select("qid", "id"))
    val approx = keyset(Similarity.pqTopKLcg(embs, q, k = 5, m = 4, ksub = 6)
      .select("qid", "id"))
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"LCG-PQ recall $recall")
    // exact-integer index + pinned ADC fold ⇒ bit-identical at any parallelism
    val rep = keyset(Similarity.pqTopKLcg(embs.repartition(7), q.repartition(3),
      k = 5, m = 4, ksub = 6).select("qid", "id"))
    assert(rep == approx)
  }

  test("LSH top-k recall >= 0.8 vs brute force on clustered data") {
    val q = embs.filter(col("vec_id") < 6)
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = keyset(Similarity.bruteForceTopK(embs, q, k = 5).select("qid", "id"))
    val approx = keyset(Similarity.lshTopK(embs, q, k = 5, dim = 16).select("qid", "id"))
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall")
  }

  test("LCG-LSH twin: recall vs brute force on clustered data; partition-invariant") {
    val q = embs.filter(col("vec_id") < 6)
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = keyset(Similarity.bruteForceTopK(embs, q, k = 5).select("qid", "id"))
    val approx = keyset(Similarity.lshTopKLcg(embs, q, k = 5, dim = 16).select("qid", "id"))
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"LCG-LSH recall $recall")
    // integer bucket bits ⇒ bit-identical results at any parallelism
    val rep = keyset(Similarity.lshTopKLcg(embs.repartition(7), q.repartition(3),
      k = 5, dim = 16).select("qid", "id"))
    assert(rep == approx)
  }

  test("LCG-IVF twin: recall vs brute force on clustered data; partition-invariant") {
    val q = embs.filter(col("vec_id") < 6)
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = keyset(Similarity.bruteForceTopK(embs, q, k = 5).select("qid", "id"))
    val approx = keyset(Similarity.ivfTopKLcg(embs, q, k = 5, nlist = 4, nprobe = 2)
      .select("qid", "id"))
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"LCG-IVF recall $recall")
    // integer kmeans index + exact rational probe distances ⇒ bit-identical
    // at any parallelism
    val rep = keyset(Similarity.ivfTopKLcg(embs.repartition(7), q.repartition(3),
      k = 5, nlist = 4, nprobe = 2).select("qid", "id"))
    assert(rep == approx)
  }

  test("cosine near-dups: same-cluster pairs above threshold, none across clusters") {
    val nd = Similarity.cosineNearDups(embs, threshold = 0.95, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nd.nonEmpty)
    for ((a, b) <- nd) assert(a % 3 == b % 3, s"cross-cluster near-dup $a,$b")
  }

  test("purityByCluster: hand example with a majority tie broken to the low label") {
    val asg = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L))
      .toDF("vec_id", "cluster")
    val lab = Seq((0L, 7L), (1L, 7L), (2L, 3L), (3L, 3L), (4L, 3L), (5L, 9L))
      .toDF("vec_id", "label")
    val r = Eval.purityByCluster(asg, lab).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    // cluster 0: labels {7:2, 3:2} tie → majority 3 (smallest); cluster 1: {3:1, 9:1} → 3
    assert(r(0L) == ((4L, 3L, 2L)))
    assert(r(1L) == ((2L, 3L, 1L)))
  }

  test("silhouetteInt8: hand-computed two-cluster fixture; singleton scores 0") {
    val codes = Seq(
      (0L, Seq(0L, 0L)), (1L, Seq(0L, 2L)),          // cluster 0
      (2L, Seq(10L, 0L)), (3L, Seq(10L, 2L)),        // cluster 1
      (4L, Seq(100L, 100L)))                         // singleton cluster 2
      .toDF("vec_id", "x")
    val asg = Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L), (4L, 2L))
      .toDF("vec_id", "cluster")
    val s = Eval.silhouetteInt8(codes, asg).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // point 0: a = 4, b = min(mean d² to cluster1 = (100+104)/2, to {4} = 20000)
    assert(math.abs(s(0L) - (102.0 - 4.0) / 102.0) < 1e-15)
    assert(s(4L) == 0.0) // singleton: a undefined → 0 by convention
    assert(s.values.forall(v => v >= -1.0 && v <= 1.0))
  }

  test("clusterAgreement: hand-computed Rand/ARI; identical partitions score 1") {
    // X = {0,1,2 | 3,4,5}, Y = {0,1 | 2,3 | 4,5}: a=2, sa=6, sb=3, C(6,2)=15
    // → Rand = (15+4−6−3)/15 = 2/3; ARI = (2−1.2)/(4.5−1.2) = 0.8/3.3
    val x = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 3L), (4L, 3L), (5L, 3L))
      .toDF("doc_id", "rep_id")
    val y = Seq((0L, 0L), (1L, 0L), (2L, 2L), (3L, 2L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "rep_id")
    val r = Eval.clusterAgreement(x, y).collect()(0)
    assert(r.getLong(0) == 6L)
    assert(math.abs(r.getDouble(1) - 2.0 / 3.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 0.8 / 3.3) < 1e-12)
    val same = Eval.clusterAgreement(x, x).collect()(0)
    assert(same.getDouble(1) == 1.0 && same.getDouble(2) == 1.0)
  }

  test("LCG near-dup twin: same-cluster pairs only; partition-invariant pair set") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nd = pairs(Similarity.cosineNearDupsLcg(embs, tNum = 19, tDen = 20, dim = 16))
    assert(nd.nonEmpty)
    for ((a, b) <- nd) assert(a % 3 == b % 3, s"cross-cluster near-dup $a,$b")
    // integer bucket bits + integer threshold decision ⇒ identical pair set
    // at any parallelism
    assert(pairs(Similarity.cosineNearDupsLcg(embs.repartition(7),
      tNum = 19, tDen = 20, dim = 16)) == nd)
  }

  // --- text analysis ---------------------------------------------------------

  test("token counts on a known string") {
    val r = TextStats.tokenCounts(Seq((1L, "Hello, world!  foo_bar baz"))
      .toDF("doc_id", "text")).collect()(0)
    assert(r.getLong(1) == 4L) // ws tokens
    assert(r.getLong(2) == 5L) // alnum runs: Hello world foo bar baz
    assert(r.getLong(3) == ceilDiv("Hello,world!foo_barbaz".length, 4)) // bpe est
  }

  private def ceilDiv(a: Int, b: Int): Long = ((a + b - 1) / b).toLong

  test("quality scores: english prose scores higher than junk") {
    val r = TextStats.qualityScores(Seq(
      (1L, "The quick brown fox is a classic example of a sentence that covers the alphabet."),
      (2L, "XXXX YYYY !!!! @@@@ ZZZZ !!!! XXXX")).toDF("doc_id", "text"))
      .collect().map(x => x.getLong(0) -> x.getDouble(6)).toMap
    assert(r(1L) > r(2L), s"quality ordering: $r")
  }

  test("langId picks the obvious language, und for nonsense") {
    val r = TextStats.langId(Seq(
      (1L, "the cat and the dog went to the park with a ball"),
      (2L, "der Hund und die Katze sind nicht mit dem Ball"),
      (3L, "el perro y la gata que es en la casa por un rato"),
      (4L, "zzz qqq xxx www")).toDF("doc_id", "text"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "und"))
  }

  test("fingerprints: whitespace-insensitive, order-sensitive, deterministic") {
    val fp = TextStats.fingerprints(Seq(
      (1L, "alpha beta gamma"), (2L, "alpha   beta\tgamma"),
      (3L, "gamma beta alpha")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  // --- multimodal plumbing ---------------------------------------------------

  test("multimodal synthesize/decode: schema, determinism, batch shape") {
    val media = Multimodal.synthesize(spark, 100)
    assert(media.count() == 100)
    val f1 = Multimodal.decodeAndFeaturize(spark, media)
    assert(f1.columns.toSeq == Seq("media_id", "kind", "n_bytes", "payload_hash", "feature"))
    val a = f1.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val b = Multimodal.decodeAndFeaturize(spark, Multimodal.synthesize(spark, 100))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(a == b, "decode must be deterministic")
    val dim = f1.select(size(col("feature"))).distinct().collect().map(_.getInt(0)).toSeq
    assert(dim == Seq(8))
  }

  test("frame sampling: only video rows, real decoded frames, stride respected") {
    val media = Multimodal.synthesize(spark, 99)
    val frames = Multimodal.sampleFrames(media, everyNth = 2)
    val vids = media.filter(col("kind") === "video").count()
    assert(frames.select("media_id").distinct().count() == vids)
    // every sampled index honors the stride
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() == 0)
    // frame_bytes = w*h*3 of the DECODED frame — matches the synthesized dims
    val sizes = frames.join(media.select(col("media_id"),
        (col("width").cast("long") * col("height") * 3).as("expect")), Seq("media_id"))
      .filter(col("frame_bytes") =!= col("expect")).count()
    assert(sizes == 0, "decoded frame dims must match the encoded dims")
    // frame hashes vary across frames of one video (the gradient moves)
    val someVid = frames.groupBy("media_id").agg(
      countDistinct(col("frame_hash")).as("nh"), count(lit(1)).as("n"))
      .filter(col("n") >= 2 && col("nh") < 2).count()
    assert(someVid == 0, "distinct frames must hash differently")
  }

  private def round6(x: Double): Double = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("tfidf: exact scores and ranks vs a driver-side replica") {
    val d = Seq(
      (0L, "apple banana apple cherry"),
      (1L, "Banana banana durian"),
      (2L, "apple elderberry")).toDF("doc_id", "text")
    val got = TextStats.tfidfTopTerms(d, topK = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    val toks = Map(0L -> Seq("apple", "banana", "apple", "cherry"),
      1L -> Seq("banana", "banana", "durian"), 2L -> Seq("apple", "elderberry"))
    val tf = toks.toSeq.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, xs) => ((id, t), xs.size.toLong) } }.toMap
    val df = tf.keys.toSeq.groupBy(_._2).map { case (t, ks) => (t, ks.size) }
    val want = tf.toSeq.map { case ((id, t), f) =>
        (id, t, f, round6(f * (math.log(4.0 / (df(t) + 1.0)) + 1.0))) }
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._4, r._2)).zipWithIndex
          .map { case ((id, t, f, s), i) => (id, t, f, s, i + 1L) } }
    assert(got.sortBy(r => (r._1, r._5)).toSeq == want.sortBy(r => (r._1, r._5)))
    // the doc-0-only term outranks the everywhere term within doc 0
    val d0 = got.filter(_._1 == 0L).sortBy(_._5).map(_._2)
    assert(d0.indexOf("cherry") < d0.indexOf("banana"))
  }

  test("projectJL: exact vs replica, partition-stable, distances roughly kept") {
    import spark.implicits._
    val vecs = (0L until 20L).map(v =>
      (v, Array.tabulate(16)(i => math.sin(v * 17.0 + i * 3.0).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    def signIJ(i: Int, j: Int): Double =
      if (((i + 1L) * (j + 3L) * 48271L + (j + 1L) * 7919L) % 1009L % 2L == 0L) 1.0 else -1.0
    val want = (for ((v, e) <- vecs; j <- 0 until 8) yield {
      val y = e.indices.map(i => e(i).toDouble * signIJ(i, j)).sum / math.sqrt(8.0)
      ((v, j.toLong), BigDecimal(y).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }).toMap
    val got = Similarity.projectJL(df, dp = 8).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.keySet == want.keySet)
    assert(want.forall { case (k, y) => math.abs(got(k) - y) < 2e-6 },
      s"first diffs: ${want.collect { case (k, y) if math.abs(got(k) - y) >= 2e-6 => (k, y, got(k)) }.take(3)}")
    val got7 = Similarity.projectJL(df.repartition(7), dp = 8).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got7 == got)
    // JL property (coarse at dp=8): projected pair distances within 2.5× of
    // the original — sanity that the signs are not structured/degenerate
    val orig = vecs.toMap
    def d2(a: Array[Float], b: Array[Float]) =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum.toDouble
    def pd2(a: Long, b: Long) =
      (0 until 8).map(j => math.pow(got((a, j.toLong)) - got((b, j.toLong)), 2)).sum
    val ratios = (for (a <- 0L until 10L; b <- a + 1 until 10L)
      yield pd2(a, b) / d2(orig(a), orig(b))).sorted
    assert(ratios.forall(r => r > 0.05 && r < 4.0), s"ratios: $ratios")
    val median = ratios(ratios.size / 2)
    assert(median > 0.5 && median < 2.0, s"median distortion $median")
  }

  test("topTermsExact: exact top-k, certification semantics, partition-stable") {
    import spark.implicits._
    // 40 'alpha', 25 'beta', 12 'gamma', 5 singles
    val words = Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
      Seq.fill(12)("gamma") ++ Seq("u1", "u2", "u3", "u4", "u5")
    val d = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val got = TextStats.topTermsExact(d, topK = 3, cap = 64).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("alpha", 40L, 1L, 1L), ("beta", 25L, 2L, 1L),
      ("gamma", 12L, 3L, 1L)))
    // partition layout must not change a certified answer
    val got7 = TextStats.topTermsExact(d.repartition(7), topK = 3, cap = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got7.toSeq == got.toSeq)
    // tiny cap: the dominant term still survives the sketch (count > N/(cap+1))
    // but the k-th count can no longer be certified
    val tiny = TextStats.topTermsExact(d, topK = 3, cap = 2).collect()
      .map(r => (r.getString(0), r.getLong(3)))
    assert(tiny.exists(_._1 == "alpha"), s"heavy hitter lost: ${tiny.toSeq}")
    assert(tiny.forall(_._2 == 0L), "cap=2 over 82 tokens cannot certify top-3")
  }

  test("oovRate: hand vocabulary cut, empty docs kept, partition-stable") {
    import spark.implicits._
    // vocab K=2 keeps {alpha (4), beta (3)}; gamma/delta are OOV
    val d = Seq(
      (0L, "alpha beta alpha gamma"),    // 4 toks, 1 oov
      (1L, "beta beta alpha delta gamma"), // 5 toks, 2 oov
      (2L, "alpha"),                     // 1 tok, 0 oov
      (3L, "")                           // empty: kept with rate 0.0
    ).toDF("doc_id", "text")
    val got = TextStats.oovRate(d, vocabK = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(0L) == ((4L, 1L, 0.25)))
    assert(got(1L) == ((5L, 2L, 0.4)))
    assert(got(2L) == ((1L, 0L, 0.0)))
    assert(got(3L) == ((0L, 0L, 0.0)))
    // tie at the vocabulary boundary breaks by term asc: with K=1 over
    // {x:2, y:2} the vocab keeps 'x', so 'y' tokens are OOV
    val tie = Seq((0L, "x y"), (1L, "y x")).toDF("doc_id", "text")
    val t = TextStats.oovRate(tie, vocabK = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(t == Map(0L -> 1L, 1L -> 1L), t.toString)
    // partition layout changes nothing
    val got7 = TextStats.oovRate(d.repartition(7), vocabK = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got7 == got)
  }

  test("bm25: exact scores vs a replica; more hits rank higher") {
    val d = Seq(
      (0L, "spark shuffle spark partition join"),
      (1L, "spark row filter table scan"),
      (2L, "sort merge window stream"),
      (3L, "partition partition shuffle spark spark spark")).toDF("doc_id", "text")
    val got = TextStats.bm25(d, Seq("spark", "shuffle", "partition"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val toks = Map(0L -> Seq("spark", "shuffle", "spark", "partition", "join"),
      1L -> Seq("spark", "row", "filter", "table", "scan"),
      2L -> Seq("sort", "merge", "window", "stream"),
      3L -> Seq("partition", "partition", "shuffle", "spark", "spark", "spark"))
    val q = Seq("spark", "shuffle", "partition")
    val n = 4.0
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val df = q.map(t => t -> toks.values.count(_.contains(t))).toMap
    val scores = toks.flatMap { case (id, ts) =>
      val s = q.map { t =>
        val f = ts.count(_ == t).toDouble
        if (f == 0) 0.0
        else math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0) * f * 2.25 /
          (f + 1.25 * (0.25 + 0.75 * ts.size / avgdl))
      }.sum
      if (s > 0) Some(id -> round6(s)) else None
    }
    val want = scores.toSeq.sortBy(r => (-r._2, r._1)).zipWithIndex
      .map { case ((id, s), i) => (id, s, i + 1L) }
    assert(got.sortBy(_._3).toSeq == want)
    // doc 2 has no query terms — absent; doc 3 (most hits) is rank 1
    assert(!got.exists(_._1 == 2L) && got.minBy(_._3)._1 == 3L)
  }

  test("pmiBigrams: hand-computed collocation values") {
    // tokens a,b,a,b -> bigrams (a,b)x2, (b,a)x1; Nt=4, Nb=3, c(a)=c(b)=2
    // PMI(a,b) = ln(2·16 / (3·2·2)) = ln(8/3)
    val d = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val got = TextStats.pmiBigrams(d, minCount = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet == Set(("a", "b"))) // (b,a) falls under minCount
    val (c12, c1, c2, pmi) = got(("a", "b"))
    assert((c12, c1, c2) == ((2L, 2L, 2L)))
    assert(math.abs(pmi - math.log(8.0 / 3.0)) < 1e-12, pmi.toString)
    // the more-frequent direction of a pair scores the higher PMI:
    // (x,y) occurs 3x, (y,x) 2x over the same unigram masses
    val d2 = Seq((1L, "x y x y x y"), (2L, "x q x r x s x t")).toDF("doc_id", "text")
    val g2 = TextStats.pmiBigrams(d2, minCount = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(g2(("x", "y")) > g2(("y", "x")), g2.toString)
    // and a doc with no alphabetic tokens must not crash the pair slices
    val d3 = Seq((1L, "a b a b"), (2L, "1234 !!"), (3L, "")).toDF("doc_id", "text")
    assert(TextStats.pmiBigrams(d3, minCount = 2).collect().nonEmpty)
    assert(TextStats.textrank(spark, d3, k = 2).collect().nonEmpty)
  }

  test("textrank: hub word ranks first; scores positive; partition-invariant") {
    // 'core' co-occurs with every other word; satellites touch only 'core'
    val d = Seq(
      (1L, "core alpha core beta core gamma"),
      (2L, "core delta core epsilon"),
      (3L, "alpha beta")).toDF("doc_id", "text")
    val got = TextStats.textrank(spark, d, k = 5).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.values.forall(_ > 0))
    assert(got.maxBy(_._2)._1 == "core", got.toString)
    val got2 = TextStats.textrank(spark, d.repartition(5), k = 5).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got2.keySet == got.keySet &&
      got.forall { case (t, v) => math.abs(got2(t) - v) <= 1e-9 * math.abs(v) })
  }

  test("rrfFuse: hand fusion, absent-list zeros, doc_id tie-break") {
    val a = Seq((1L, 1L), (2L, 2L), (7L, 5L)).toDF("doc_id", "rk")
    val b = Seq((2L, 1L), (3L, 2L), (9L, 5L)).toDF("doc_id", "rk")
    val got = TextStats.rrfFuse(a, b, kRrf = 60, topK = 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))))
      .toMap
    // doc2 in both lists wins; docs 1 and 3 follow; 7 and 9 tie on rrf
    // (1/65 each) and break by doc_id
    assert(got(2L)._4 == 1L && got(2L)._1 == 2L && got(2L)._2 == 1L)
    val byRank = got.toSeq.sortBy(_._2._4).map(_._1)
    assert(byRank == Seq(2L, 1L, 3L, 7L, 9L), byRank.toString)
    assert(got(1L)._2 == 0L && got(3L)._1 == 0L) // absent-list ranks report 0
    val expected2 = 1.0 / 62 + 1.0 / 61
    assert(math.abs(got(2L)._3 - expected2) < 1e-8)
  }

  test("quantiles: exact lower quantiles — hand fixture, ties, brute replica") {
    import graft.pipeline.Events
    def evq(rows: (String, Double)*): org.apache.spark.sql.DataFrame =
      rows.zipWithIndex.map { case ((ty, v), i) => (i.toLong, ty, i.toLong, v) }
        .toDF("event_id", "event_type", "user_id", "value")

    // type a: values 1..10 -> q50=5 (ceil(5)=5th), q90=9, q99=10;
    // type b: all-tied 7.0 at any q
    val d = evq(((1 to 10).map(i => ("a", i.toDouble)) ++
      Seq(("b", 7.0), ("b", 7.0), ("b", 7.0))): _*)
    val got = Events.quantiles(d).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(("a", 0.5)) == ((10L, 5.0)), got.toString)
    assert(got(("a", 0.9)) == ((10L, 9.0)))
    assert(got(("a", 0.99)) == ((10L, 10.0)))
    assert(Seq(0.5, 0.9, 0.99).forall(q => got(("b", q)) == ((3L, 7.0))))

    // brute replica on seeded values with heavy duplication
    val rnd = new scala.util.Random(5L)
    val vals = Seq.fill(200)(("x", (rnd.nextInt(20) + 1).toDouble))
    val want = Seq(0.5, 0.9, 0.99).map { q =>
      val sorted = vals.map(_._2).sorted
      val target = math.ceil(q * sorted.size).toInt
      q -> sorted(target - 1)
    }.toMap
    val got2 = Events.quantiles(evq(vals: _*).repartition(7)).collect()
      .map(r => r.getDouble(1) -> r.getDouble(3)).toMap
    assert(got2 == want, s"got=$got2 want=$want")
  }

  test("events funnel/retention/kmv: hand fixtures + estimator replica") {
    import graft.pipeline.Events
    def ev(rows: (Long, String, String)*): org.apache.spark.sql.DataFrame =
      rows.zipWithIndex.map { case ((u, ty, ts), i) => (i.toLong, ts, u, ty, 1.0) }
        .toDF("event_id", "s", "user_id", "event_type", "value")
        .withColumn("ts", to_timestamp(col("s"))).drop("s")

    // u1 full funnel; u2's click precedes signup; u3 skips click; u4 stops
    val f = Events.funnel(ev(
      (1L, "signup", "2024-01-01 10:00:00"), (1L, "click", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"),
      (2L, "click", "2024-01-01 09:00:00"), (2L, "signup", "2024-01-01 10:00:00"),
      (2L, "purchase", "2024-01-01 11:00:00"),
      (3L, "signup", "2024-01-01 10:00:00"), (3L, "purchase", "2024-01-01 11:00:00"),
      (4L, "signup", "2024-01-01 10:00:00"), (4L, "click", "2024-01-01 11:00:00")),
      Seq("signup", "click", "purchase")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f == Map("signup" -> 4L, "signup>click" -> 2L,
      "signup>click>purchase" -> 1L), f.toString)

    val r = Events.retention(ev(
      (1L, "view", "2024-01-01 10:00:00"), (1L, "view", "2024-01-03 10:00:00"),
      (2L, "view", "2024-01-02 10:00:00"))).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    assert(r == Set(("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-02", 0L, 1L)), r.toString)

    // KMV: 20 users of one type -> estimator path; 3 of another -> exact
    val P = 1000000007L
    val rows = (0L until 20L).map(u => (u, "click", "2024-01-01 10:00:00")) ++
      (0L until 3L).map(u => (u, "view", "2024-01-01 10:00:00"))
    val kmv = Events.kmvDistinct(ev(rows: _*), k = 8).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    val kth = (0L until 20L).map(u => (u % P * 48271L + 11213L) % P).sorted.apply(7)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(kmv("click") == ((8L, r6(7.0 * P / kth))))
    assert(kmv("view") == ((3L, 3.0)))
  }

  test("chunkOverlap: tail-anchored windows, exact starts, text roundtrip") {
    val d = Seq((7L, (1 to 10).map(i => s"t$i").mkString("  "))) // messy ws
      .toDF("doc_id", "text")
    val got = TextStats.chunkOverlap(d, chunkSize = 4, overlap = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(_._1)
    // n=10, stride=2, jmax=ceil(6/2)=3 -> starts 0,2,4,6; all full chunks
    assert(got.map(x => (x._1, x._2, x._3)).toSeq ==
      Seq((0L, 0L, 4L), (1L, 2L, 4L), (2L, 4L, 4L), (3L, 6L, 4L)))
    assert(got.head._4 == "t1 t2 t3 t4" && got.last._4 == "t7 t8 t9 t10")
    // short doc: single chunk, truncated
    val s = TextStats.chunkOverlap(Seq((8L, "a b")).toDF("doc_id", "text"),
      chunkSize = 4, overlap = 2).collect()
    assert(s.length == 1 && s.head.getLong(3) == 2L)
    // empty doc: nothing
    assert(TextStats.chunkOverlap(Seq((9L, "  ")).toDF("doc_id", "text"),
      chunkSize = 4, overlap = 2).count() == 0L)
  }

  test("winnowLcg: brute replica + shared-substring guarantee") {
    val k = 3; val w = 4
    val a = "x1 x2 x3 x4 SHARED RUN OF COMMON TOKENS HERE y1 y2 y3"
    val b = "z1 z2 SHARED RUN OF COMMON TOKENS HERE z3 z4 z5 z6 z7"
    val d = Seq((0L, a), (1L, b)).toDF("doc_id", "text")
    val got = TextStats.winnowLcg(d, k, w).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // brute replica: same dense-rank vocab across the corpus
    val P = 2147483647L
    val tokss = Seq(a, b).map(_.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
    val vocab = tokss.flatten.distinct.sorted.zipWithIndex.toMap
    val want = (for ((toks, did) <- tokss.zipWithIndex) yield {
      val sids = toks.map(t => vocab(t).toLong)
      val grams = sids.sliding(k).map(_.foldLeft(0L)((acc, x) =>
        (acc * 8191L + x + 1L) % P)).toIndexedSeq
      (0 to grams.size - w).map { j =>
        val win = grams.slice(j, j + w)
        val mn = win.min
        val pos = (j until j + w).filter(grams(_) == mn).max
        (did.toLong, pos.toLong, mn)
      }
    }).flatten.toSet
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")

    // guarantee: the shared >= w+k-1 token substring forces a common (pos-
    // independent) fingerprint value between the two docs
    val fpsA = got.collect { case (0L, _, f) => f }
    val fpsB = got.collect { case (1L, _, f) => f }
    assert(fpsA.intersect(fpsB).nonEmpty, "winnowing guarantee violated")
  }

  test("editVerify: prefix blocks, exact distances, cap drops mega-blocks") {
    val common = "PREFIXPREFIXPREFIXPREFIXPREFIXPX " // 33 chars: block key
    val d = Seq(
      (0L, common + "alpha beta gamma"),
      (1L, common + "alpha beta gamna"),         // 1 substitution vs 0
      (2L, common + "totally different tail xx"),
      (3L, "other block entirely, no partner here")
    ).toDF("doc_id", "text")
    val got = Dedup.editVerify(d, prefixLen = 32, window = 256, maxBucket = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.contains((0L, 1L, 1L)), got.toString) // one char apart
    assert(got.size == 3, "3 intra-block pairs expected") // (0,1),(0,2),(1,2)
    // cap: a 3-doc block with maxBucket=2 emits nothing
    assert(Dedup.editVerify(d, prefixLen = 32, window = 256, maxBucket = 2)
      .count() == 0L)
  }

  test("pcaTopComponent: recovers the planted direction; repartition-stable") {
    val rnd = new scala.util.Random(5L)
    val rows = (0L until 60L).map { i =>
      val t = (i.toDouble - 30) / 10 // dominant spread along (1,1,0,0)
      Seq(t + rnd.nextDouble() * 0.01, t + rnd.nextDouble() * 0.01,
        rnd.nextDouble() * 0.01, rnd.nextDouble() * 0.01).map(_.toFloat)
    }.zipWithIndex.map { case (e, i) => (i.toLong, e) }
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.pcaTopComponent(df, iters = 8).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // projection onto the top PC is monotone in the planted t (either sign)
    val xs = (0L until 60L).map(got)
    assert(xs.sliding(2).forall(p => p(0) <= p(1)) ||
           xs.sliding(2).forall(p => p(0) >= p(1)), xs.take(10).toString)
    // mean-centered: scores sum to ~0
    assert(math.abs(xs.sum) < 1e-3, s"not centered: ${xs.sum}")
    val again = Similarity.pcaTopComponent(df.repartition(7), iters = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == got, "not bit-stable under repartition")
  }

  test("fingerprintsLcg: replica fold, order-sensitive, whitespace-insensitive") {
    val d = Seq((0L, "b a c"), (1L, "a b c"), (2L, " a   b  c "))
      .toDF("doc_id", "text")
    val got = TextStats.fingerprintsLcg(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def fold(sids: Seq[Long]) =
      sids.foldLeft(0L)((a, x) => (a * 8191L + x + 1L) % 2147483647L)
    // corpus vocab sorted: a->0, b->1, c->2
    assert(got(0L) == ((fold(Seq(1L, 0L, 2L)), 3L)))
    assert(got(1L) == ((fold(Seq(0L, 1L, 2L)), 3L)))
    assert(got(2L) == got(1L), "whitespace must not matter")
    assert(got(0L)._1 != got(1L)._1, "token order must matter")
  }

  test("bigramLogProb: exact interpolated add-k arithmetic on a hand corpus") {
    val d = Seq((0L, "a b a"), (1L, "b b"), (2L, "c")).toDF("doc_id", "text")
    val got = TextStats.bigramLogProb(d, vocabSize = 2, k = 0.5, lambda = 0.75)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // vocab = {b(3), a(2)}; c -> <oov>; uni a:2 b:3 oov:1, N=6, V=3
    def p(cb: Double, cup: Double, cuq: Double) =
      0.75 * ((cb + 0.5) / (cup + 0.5 * 4)) + 0.25 * ((cuq + 0.5) / (6 + 0.5 * 4))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d0 = (-math.log(p(1, 2, 3)) - math.log(p(1, 3, 2))) / 2
    assert(got(0L) == ((2L, r6(d0))))
    assert(got(1L) == ((1L, r6(-math.log(p(1, 3, 3))))))
    assert(!got.contains(2L), "single-token doc has no transitions")
  }

  test("minhashNearDupsLcg: planted dup + near-dup found, unrelated not") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val d = Seq(
      (0L, base), (1L, base),                     // exact dup: jaccard 1.0
      (2L, base + " tail1"),                      // superset: jaccard 10/11
      (3L, "zz yy xx ww vv uu tt ss rr qq")       // unrelated
    ).toDF("doc_id", "text")
    val got = Dedup.minhashNearDupsLcg(d, threshold = 0.5, w = 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got((0L, 1L)) == 1.0)
    // identical docs share EVERY band, so the pair cannot be missed; the
    // 10/11-jaccard superset misses a band with prob (1-(10/11)^4)^8 ≈ 1e-4
    assert(got.contains((0L, 2L)) && got.contains((1L, 2L)))
    assert(math.abs(got((0L, 2L)) - 10.0 / 11.0) < 1e-6)
    assert(!got.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    // deterministic under repartition
    val again = Dedup.minhashNearDupsLcg(d.repartition(7), threshold = 0.5, w = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(again == got)
  }

  test("containmentPairs: quoted doc has containment 1.0, tiny jaccard") {
    val quote = "alpha beta gamma delta epsilon zeta"
    val article = ("intro words here " * 8) + quote + (" closing remarks now" * 8)
    val d = Seq((0L, quote), (1L, article), (2L, "totally unrelated text body here"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, threshold = 0.8, w = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // doc 0's shingles all appear inside doc 1 => containment exactly 1.0,
    // one direction only (the article is NOT contained in the quote)
    assert(got.toSeq == Seq((0L, 1L, 1.0)), got.toSeq.toString)
    // and symmetric jaccard misses it at the same threshold
    assert(Dedup.ngramJaccardPairs(d, threshold = 0.8, w = 3).count() == 0L)
  }

  test("dupSpans: hand spans (overlap/adjacent/within-doc/short-doc) + replica") {
    def spans(d: org.apache.spark.sql.DataFrame, w: Int) =
      TextStats.dupSpans(d, w = w, minCount = 2L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val d = Seq(
      (0L, "a b c d e f g"),              // shares "a b c"/"b c d" with doc 1
      (1L, "x a b c d y z a b c d"),      // two hit regions
      (2L, "p q r s p q r"),              // WITHIN-doc repeat, non-adjacent
      (3L, "m n o m n o"),                // windows exactly adjacent -> merge
      (4L, "q w")                         // shorter than w: no grams, no rows
    ).toDF("doc_id", "text")
    assert(spans(d, 3) == Set(
      (0L, 0L, 3L), (1L, 1L, 4L), (1L, 7L, 10L),
      (2L, 0L, 2L), (2L, 4L, 6L), (3L, 0L, 5L)))

    // seeded random corpus over a 6-word vocab vs a driver-side replica
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val rnd = new scala.util.Random(11L)
    val docs = (0L until 30L).map(i =>
      (i, Seq.fill(4 + rnd.nextInt(20))(vocab(rnd.nextInt(6))).mkString(" ")))
    for (w <- Seq(3, 5)) {
      val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }
      val cnt = toks.flatMap { case (_, ts) => ts.sliding(w).filter(_.size == w) }
        .groupBy(identity).map { case (g, xs) => (g.toSeq, xs.size) }
      val want = toks.flatMap { case (id, ts) =>
        val hit = ts.sliding(w).zipWithIndex
          .filter { case (g, _) => g.size == w && cnt(g.toSeq) >= 2 }
          .map { case (_, p) => (p.toLong, (p + w - 1).toLong) }.toSeq
        hit.foldLeft(List.empty[(Long, Long)]) {
          case ((s0, e0) :: tl, (s, e)) if s <= e0 + 1 => (s0, math.max(e0, e)) :: tl
          case (acc, (s, e)) => (s, e) :: acc
        }.map { case (s, e) => (id, s, e) }
      }.toSet
      assert(spans(docs.toDF("doc_id", "text"), w) == want, s"w=$w")
    }
  }

  /** Driver-side replica of kmeansInt8: same quantization, same BigInt
    * rational distances compared through the same one double division,
    * same smallest-cid tie-break and k-smallest-ids init. */
  private def kmeansReplica(vecs: Seq[(Long, Array[Float])], k: Int,
                            steps: Int): Map[Long, Long] = {
    val q = vecs.sortBy(_._1).map { case (id, v) =>
      val d = v.map(_.toDouble)
      val mx = if (d.isEmpty) 0.0 else d.map(math.abs).max
      val s = mx / 127.0
      id -> (if (s > 0)
        d.map(x => math.max(-127.0, math.min(127.0, math.floor(x / s + 0.5))).toLong)
      else d.map(_ => 0L))
    }
    var cents: Seq[(Int, Array[Long], Long)] =
      q.take(k).zipWithIndex.map { case ((_, x), i) => (i, x, 1L) }
    var assign = Map.empty[Long, Long]
    for (_ <- 1 to steps) {
      assign = q.map { case (id, x) =>
        val ds = cents.map { case (cid, sv, c) =>
          val a = x.map(v => BigInt(v) * BigInt(v)).sum
          val b = x.zip(sv).map { case (u, v) => BigInt(u) * BigInt(v) }.sum
          val dd = sv.map(v => BigInt(v) * BigInt(v)).sum
          val num = a * c * c - 2 * b * c + dd
          (cid, num.toDouble / (c * c).toDouble)
        }
        var best = ds.head
        for (cand <- ds.tail) if (cand._2 < best._2) best = cand
        id -> best._1.toLong
      }.toMap
      val groups = q.groupBy { case (id, _) => assign(id) }
      cents = groups.keys.toSeq.sorted.map { cid =>
        val xs = groups(cid).map(_._2)
        (cid.toInt, xs.map(_.toSeq).transpose.map(_.sum).toArray, xs.size.toLong)
      }
    }
    assign
  }

  test("kmeansInt8: separates planted clusters, replica-exact, partition-invariant") {
    val got = Similarity.kmeansInt8(embs, k = 3, steps = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each planted cluster lands whole in one k-means cluster, all distinct
    for (c <- 0 until 3) {
      val ids = (0 until 60).filter(_ % 3 == c).map(_.toLong)
      assert(ids.map(got).toSet.size == 1, s"planted cluster $c split")
    }
    assert((0L until 3L).map(got).toSet.size == 3)

    // bit-exact vs the driver-side replica
    val local = embs.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(got == kmeansReplica(local.toSeq, k = 3, steps = 3))

    // invariant to input partitioning (integer sums, deterministic ties)
    val got2 = Similarity.kmeansInt8(embs.repartition(7), 3, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == got)
  }

  test("bm25Multi: per-query scores == single-query bm25; relevance minTf cut") {
    import spark.implicits._
    val d = Seq(
      (0L, "spark shuffle spark partition join"),
      (1L, "join merge sort join merge"),
      (2L, "spark spark spark merge"),
      (3L, "sort sort merge join table row"),
      (4L, "vector stream vector")
    ).toDF("doc_id", "text")
    val qs: Seq[(Long, Seq[String])] =
      Seq(1L -> Seq("spark", "join"), 2L -> Seq("merge", "sort"))
    val multi = TextStats.bm25Multi(d, qs, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3)))).toMap
    for ((qid, terms) <- qs) {
      val single = TextStats.bm25(d, terms, topK = 10).collect()
        .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
      val mine = multi.collect { case ((q, doc), v) if q == qid => doc -> v }.toMap
      assert(mine == single, s"query $qid: $mine vs $single")
    }
    // graded relevance with minTf=2: only terms occurring twice+ count
    val rel = TextStats.queryRelevance(d, qs, minTf = 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // q1 (spark, join): doc0 spark x2 -> 1; doc1 join x2 -> 1; doc2 spark x3 -> 1
    // q2 (merge, sort): doc1 merge x2 -> 1; doc3 sort x2 -> 1
    assert(rel == Map((1L, 0L) -> 1L, (1L, 1L) -> 1L, (1L, 2L) -> 1L,
      (2L, 1L) -> 1L, (2L, 3L) -> 1L), rel.toString)
  }
}
