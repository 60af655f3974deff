package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (array<float>). Dot products
  * are `zip_with` + `aggregate` higher-order functions — codegen'd column
  * algebra, no UDFs.
  *
  * Scale path: brute-force top-k is the exact baseline (a crossJoin that is
  * only viable when one side is small and broadcast); the random-hyperplane
  * LSH variant buckets both sides so the join is equi-key and shuffle-
  * parallel, touching only same-bucket pairs — the 100 TB shape.
  */
object Similarity {

  import org.apache.spark.sql.graft.{GraftSqlInternals => GI, VecDot, VecSqDist}

  /** Sum of elementwise double products Σ aᵢ·bᵢ — a fused codegen'd kernel
    * (`VecDot`): one loop, double accumulator, no intermediate array. The
    * HOF spelling `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` is the
    * readable spec; the Expression is the same fold without the per-row
    * product-array allocation — the version you want under a 10⁹-vector scan.
    */
  def dot(a: Column, b: Column): Column =
    GI.column(VecDot(GI.expression(a), GI.expression(b)))

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Squared L2 distance ‖a − b‖² (fused kernel, same shape as [[dot]]). */
  def sqdist(a: Column, b: Column): Column =
    GI.column(VecSqDist(GI.expression(a), GI.expression(b)))

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors. Queries are broadcast (small side); ranking is a window
    * per query with deterministic (score desc, id asc) tie-break.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("id"), col("embedding").as("e"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("qid"), col("id"), cosine(col("qe"), col("e")).as("score"))
      .filter(col("qid") =!= col("id"))
    val win = Window.partitionBy("qid").orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(win)).filter(col("rank") <= k)
  }

  /** Random-hyperplane (SRP) LSH bucket id: `bits` sign bits of dot products
    * with deterministic pseudo-random hyperplanes (hyperplane component
    * h[b][i] = ±1 from xxhash64(b,i) — a valid SRP family, cheap to build as
    * column algebra).
    */
  def srpBucket(e: Column, dim: Int, bits: Int, seed: Long): Column = {
    val bitVals = (0 until bits).map { b =>
      val signs = typedLit((0 until dim).map(i =>
        if (((scala.util.hashing.MurmurHash3.productHash((b, i, seed)) >> 1) & 1) == 0) 1.0f
        else -1.0f))
      when(dot(e, signs) > 0, 1L << b).otherwise(0L)
    }
    bitVals.reduce(_ + _)
  }

  /** ANN via SRP-LSH with multiple hash tables: same-bucket candidates in any
    * table, exact cosine on candidates, top-k per query. Recall grows with
    * `tables`; each table contributes one equi-join keyed on (table, bucket).
    *
    * Plan shape (same as [[cosineNearDups]]): the bucket join and the
    * candidate `distinct()` carry only bare (qid, id) — the dim-float
    * embedding arrays are re-joined AFTER dedup, so each array crosses the
    * wire once per side, not once per colliding table. Corpus-side buckets
    * over `maxBucket` members are excluded before the join (an f-vector
    * duplicate cluster shares every bucket ⇒ f·|queries| candidates per
    * table otherwise); query buckets are left uncapped — the query side is
    * small by contract and capping it would silently drop whole queries.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              bits: Int = 12, tables: Int = 4, seed: Long = 99L,
              maxBucket: Int = 100000): DataFrame = {
    def buckets(df: DataFrame): DataFrame =
      df.select(col("vec_id"),
          posexplode(array((0 until tables).map(t =>
            srpBucket(col("embedding"), dim, bits, seed + t)): _*)).as(Seq("tbl", "bkt")))

    val c = graft.pipeline.Dedup.capBuckets(
        buckets(corpus.select(col("vec_id"), col("embedding"))), Seq("tbl", "bkt"), maxBucket)
      .select(col("vec_id").as("id"), col("tbl"), col("bkt"))
    val q = buckets(queries.select(col("vec_id"), col("embedding")))
      .select(col("vec_id").as("qid"), col("tbl"), col("bkt"))

    val cands = c.join(q, Seq("tbl", "bkt"))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id"))
      .distinct()
    val ce = corpus.select(col("vec_id").as("id"), col("embedding").as("e"))
    val qe = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val scored = cands.join(qe, Seq("qid")).join(ce, Seq("id"))
      .select(col("qid"), col("id"), cosine(col("qe"), col("e")).as("score"))
    val win = Window.partitionBy("qid").orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(win)).filter(col("rank") <= k)
  }

  /** SQL-re-derivable SRP-LSH twin of [[lshTopK]] (the recipe of
    * Dedup.minhashNearDupsLcg): each hyperplane sign is a ±1 LCG of the
    * flattened (table, bit, dim) index and the hyperplane test runs on the
    * int8 codes of [[quantizeInt8]], so every bucket bit is an exact
    * INTEGER comparison — identical at any parallelism and replayable in
    * DuckDB. Candidate scoring dequantizes the corpus side (code·scale,
    * [[quantizedTopK]]'s exact contract) against the raw query vector. The
    * xxhash64 [[lshTopK]] stays the production path; this twin turns the
    * rows-only index check into a full oracle of the bucket CONTENTS.
    * Same scale shape: bucket equi-joins, corpus-side cap, candidate dedup
    * before any embedding crosses the wire.
    */
  /** The LCG-sign SRP bucket table (vec_id, tbl, bkt) over int8 codes —
    * every bucket bit an exact integer comparison (see [[lshTopKLcg]]).
    */
  private[pipeline] def lcgBuckets(df: DataFrame, dim: Int, bits: Int,
                                   tables: Int): DataFrame = {
    val P = 2147483647L // 2^31-1: idx*48271 ≪ 2^62, no overflow either side
    val qz = quantizeInt8(df)
    def bkt(t: Int): Column = (0 until bits).map { b =>
      val s = transform(col("qvec"), (x, i) =>
        x * when((((i + lit((t.toLong * bits + b) * dim)) * 48271L + 16807L)
          % P) % 2 === 1, 1L).otherwise(-1L))
      when(aggregate(s, lit(0L), _ + _) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    qz.select(col("vec_id"),
      posexplode(array((0 until tables).map(bkt): _*)).as(Seq("tbl", "bkt")))
  }

  def lshTopKLcg(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
                 bits: Int = 6, tables: Int = 4,
                 maxBucket: Int = 100000): DataFrame = {
    def buckets(df: DataFrame): DataFrame = lcgBuckets(df, dim, bits, tables)
    val c = graft.pipeline.Dedup.capBuckets(
        buckets(corpus), Seq("tbl", "bkt"), maxBucket)
      .select(col("vec_id").as("id"), col("tbl"), col("bkt"))
    val q = buckets(queries)
      .select(col("vec_id").as("qid"), col("tbl"), col("bkt"))
    val cands = c.join(q, Seq("tbl", "bkt"))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id"))
      .distinct()
    val ce = quantizeInt8(corpus).select(col("vec_id").as("id"),
      transform(col("qvec"), qc => qc * col("scale")).as("e"))
    val qe = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val scored = cands.join(qe, Seq("qid")).join(ce, Seq("id"))
      .select(col("qid"), col("id"), cosine(col("qe"), col("e")).as("score"))
    val win = Window.partitionBy("qid").orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(win)).filter(col("rank") <= k)
  }

  /** IVF (inverted-file) coarse index: `nlist` deterministic centroids —
    * hash-sampled corpus vectors refined by `lloydSteps` Lloyd iterations —
    * and every corpus vector assigned to its nearest centroid's list.
    * Returns (assignments: vec_id/list/embedding, centroids: list/ce).
    *
    * Scale shape: centroids are a K-row broadcast (assignment is a
    * broadcast-join argmax, no shuffle of the corpus); a Lloyd step is one
    * posexplode + (list, dim) average — the standard distributed k-means
    * update — over K·dim output cells. Everything is deterministic (hash
    * sampling, no RNG state), so the index is identical at any parallelism.
    */
  def ivfIndex(corpus: DataFrame, nlist: Int, seed: Long = 7L,
               lloydSteps: Int = 1): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    val e = corpus.select(col("vec_id"), col("embedding"))
    val win = Window.orderBy(col("h"))

    // The centroid table is K rows — materialize it driver-side into a
    // LocalRelation so (a) its producing plan (global top-K sample / Lloyd
    // aggregation over the corpus) runs exactly once, not once per consumer,
    // and (b) every downstream use is a broadcast of literal rows.
    def localize(df: DataFrame): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)

    var cents = localize(e.select(col("embedding").as("ce"),
        xxhash64(col("vec_id"), lit(seed)).as("h"))
      .orderBy(col("h")).limit(nlist)
      .select((row_number().over(win) - 1).as("list"), col("ce")))

    def assign(cs: DataFrame): DataFrame =
      e.crossJoin(broadcast(cs))
        .select(col("vec_id"), col("list"), cosine(col("embedding"), col("ce")).as("s"))
        .groupBy("vec_id").agg(max_by(col("list"), struct(col("s"), -col("list"))).as("list"))

    for (_ <- 1 to lloydSteps) {
      // decimal sums are exact and order-independent (double sums are not),
      // so the refined centroids — and hence the whole index — are identical
      // at any partitioning; empty lists fall away, survivors keep their ids
      cents = localize(assign(cents).join(e, Seq("vec_id"))
        .select(col("list"), posexplode(col("embedding")).as(Seq("p", "x")))
        .groupBy("list", "p")
        .agg((sum(col("x").cast("decimal(38,15)")) / count(lit(1)))
          .cast("double").as("m"))
        .groupBy("list").agg(transform(
          array_sort(collect_list(struct(col("p"), col("m")))),
          s => s.getField("m").cast("float")).as("ce")))
    }
    (assign(cents).join(e, Seq("vec_id")), cents)
  }

  /** ANN via IVF: queries probe only their `nprobe` nearest centroid lists,
    * then exact cosine + top-k within the probed lists. Per-query search
    * work is ~nprobe/nlist of the corpus (vs all of it for brute force);
    * the list lookup is an equi-join on the centroid id — the clustered
    * scale path next to the hash-bucketed LSH one.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nlist: Int = 16,
              nprobe: Int = 4, seed: Long = 7L): DataFrame = {
    val (assigned, cents) = ivfIndex(corpus, nlist, seed)
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val probeWin = Window.partitionBy("qid").orderBy(col("cs").desc, col("list").asc)
    val probes = q.crossJoin(broadcast(cents))
      .select(col("qid"), col("qe"), col("list"), cosine(col("qe"), col("ce")).as("cs"))
      .withColumn("pr", row_number().over(probeWin)).filter(col("pr") <= nprobe)
      .select(col("qid"), col("qe"), col("list"))
    val scored = probes.join(assigned, Seq("list"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("id"),
        cosine(col("qe"), col("embedding")).as("score"))
    val win = Window.partitionBy("qid").orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(win)).filter(col("rank") <= k)
  }

  /** Exact rational squared distance ‖x − s/c‖² = (A·c² − 2Bc + D)/c² over
    * integer codes with the centroid held as an integer (sum-vector, count)
    * pair — exact integer/decimal arithmetic and ONE IEEE division, so any
    * SQL engine reproduces the double bit-for-bit. This is the ONE shared
    * assignment kernel of [[kmeansInt8]], [[ivfTopKLcg]], [[pqIndexInt8]]
    * and [[pqTopKLcg]] (and their DuckDB mirrors). Column-centroid shape.
    */
  private def ratDistCols(x: Column, s: Column, cnt: Column): Column = {
    val dec = "decimal(38,0)"
    val a = aggregate(transform(x, v => v * v), lit(0L), _ + _).cast(dec)
    val b = aggregate(zip_with(x, s, (u, v) => u * v), lit(0L), _ + _).cast(dec)
    val d = aggregate(transform(s, v => v.cast(dec) * v.cast(dec)),
      lit(0L).cast(dec), _ + _)
    val c2 = cnt.cast(dec) * cnt.cast(dec)
    (a * c2 - lit(2L).cast(dec) * b * cnt.cast(dec) + d).cast("double") /
      c2.cast("double")
  }

  /** [[ratDistCols]] with a driver-side constant centroid: ‖S‖² and c² are
    * exact BigInt constants (a long c·c would wrap past c ≈ 3·10⁹).
    */
  private def ratDistConst(x: Column, s: Array[Long], c: Long): Column = {
    val dec = "decimal(38,0)"
    val a = aggregate(transform(x, v => v * v), lit(0L), _ + _).cast(dec)
    val b = aggregate(zip_with(x, array(s.map(lit(_)): _*), (u, v) => u * v),
      lit(0L), _ + _).cast(dec)
    val dSq = s.map(v => BigInt(v) * BigInt(v)).sum
    val c2 = BigInt(c) * BigInt(c)
    val num = a * lit(BigDecimal(c2)).cast(dec) -
      lit(2L).cast(dec) * b * lit(c).cast(dec) + lit(BigDecimal(dSq)).cast(dec)
    num.cast("double") / lit(BigDecimal(c2)).cast(dec).cast("double")
  }

  /** SQL-re-derivable near-dup twin of [[cosineNearDups]]: candidate pairs
    * from the [[lcgBuckets]] LCG-sign index (more tables instead of
    * multiprobe) and an INTEGER-EXACT threshold decision — with the
    * threshold the rational tNum/tDen, `cos(a,b) ≥ t` over the int8 codes
    * is decided as `dot > 0 ∧ tDen²·dot² ≥ tNum²·‖a‖²·‖b‖²`, all in 64-bit
    * integers (|dot| ≤ 127²·dim ≈ 10⁶ ⇒ tDen²·dot² ≤ ~10¹⁵). The emitted
    * pair set is therefore bit-identical at any parallelism and replayable
    * in DuckDB. Contract: the QUANTIZED cosine (the float path's threshold
    * moves by O(1/127)); the xxhash64 [[cosineNearDups]] stays production.
    */
  def cosineNearDupsLcg(corpus: DataFrame, tNum: Int, tDen: Int, dim: Int,
                        bits: Int = 6, tables: Int = 8,
                        maxBucket: Int = 10000): DataFrame = {
    // |dot| and each norm² are ≤ 127²·dim, so the comparison operands are
    // bounded by (16129·dim·max(tNum,tDen))² — keep that base under √2⁶³ or
    // the 64-bit products would wrap SILENTLY (non-ANSI Spark) and flip the
    // decision away from the oracle
    require(BigInt(16129L) * dim * math.max(tNum, tDen) <= 3037000499L,
      s"integer threshold decision overflows 64-bit: 16129*dim*max(tNum,tDen)" +
        s" = ${BigInt(16129L) * dim * math.max(tNum, tDen)} > 3037000499")
    val bk = graft.pipeline.Dedup.capBuckets(
      lcgBuckets(corpus, dim, bits, tables), Seq("tbl", "bkt"), maxBucket)
    val cands = bk.as("x").join(bk.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bkt") === col("y.bkt") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b")).distinct()
    val codes = quantizeInt8(corpus)
      .select(col("vec_id"), transform(col("qvec"), _.cast("long")).as("x"))
    def isum(c: Column): Column = aggregate(c, lit(0L), _ + _)
    val scored = cands
      .join(codes.select(col("vec_id").as("a"), col("x").as("xa")), Seq("a"))
      .join(codes.select(col("vec_id").as("b"), col("x").as("xb")), Seq("b"))
      .select(col("a"), col("b"),
        isum(zip_with(col("xa"), col("xb"), _ * _)).as("dot"),
        isum(transform(col("xa"), v => v * v)).as("na"),
        isum(transform(col("xb"), v => v * v)).as("nb"))
    scored.filter(col("dot") > 0 &&
        col("dot") * col("dot") * (tDen.toLong * tDen) >=
          col("na") * col("nb") * (tNum.toLong * tNum))
      .select(col("a"), col("b"))
  }

  /** SQL-re-derivable IVF twin of [[ivfTopK]]: the coarse quantizer is the
    * bit-exact integer k-means of [[kmeansInt8]] (the oracle replays the
    * index verbatim via the shared kmeans CTE chain), probe selection ranks
    * the query's int8 codes against the final (sum-vector, count) centroids
    * with the same exact rational distance (A·c² − 2Bc + D)/c² — one IEEE
    * division, ties to the smallest list — and candidate scoring
    * dequantizes the corpus side against the raw query vector
    * ([[quantizedTopK]]'s contract). The xxhash64 [[ivfTopK]] stays the
    * production path; this twin oracles the IVF QUERY path — probes,
    * lists, ranks — end to end. Driver state is nlist·dim integers (the
    * same K-row bound as [[ivfIndex]]'s localized centroids); probing is a
    * zero-shuffle explode of a literal centroid array.
    */
  def ivfTopKLcg(corpus: DataFrame, queries: DataFrame, k: Int,
                 nlist: Int = 8, nprobe: Int = 2, steps: Int = 2): DataFrame = {
    val assigned = kmeansInt8(corpus, nlist, steps) // (vec_id, cluster), cached
    val codes = quantizeInt8(corpus)
      .select(col("vec_id"), transform(col("qvec"), _.cast("long")).as("x"))
    // ONE pass, one collect: per-(cluster, pos) integer sums carry the
    // member count alongside (count is pos-invariant, read off pos 0)
    val cellRows = codes.join(assigned, Seq("vec_id"))
      .select(col("cluster"), posexplode(col("x")).as(Seq("pos", "v")))
      .groupBy("cluster", "pos").agg(sum("v").as("sv"), count(lit(1)).as("c"))
      .collect()
    val sums = cellRows.groupBy(_.getLong(0)).map { case (cid, rows) =>
      cid -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toArray
    }
    val cnts = cellRows.filter(_.getInt(1) == 0)
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val qCodes = quantizeInt8(queries)
      .select(col("vec_id").as("qid"), transform(col("qvec"), _.cast("long")).as("x"))
    val dists = cnts.keys.toSeq.sorted.map { cid =>
      struct(lit(cid).as("list"),
        ratDistConst(col("x"), sums(cid), cnts(cid)).as("dist"))
    }
    val probeWin = Window.partitionBy("qid").orderBy(col("dist").asc, col("list").asc)
    val probes = qCodes.select(col("qid"), explode(array(dists: _*)).as("pc"))
      .select(col("qid"), col("pc.list").as("list"), col("pc.dist").as("dist"))
      .withColumn("pr", row_number().over(probeWin)).filter(col("pr") <= nprobe)
      .select(col("qid"), col("list"))
    val cands = probes.join(
        assigned.select(col("vec_id").as("id"), col("cluster").as("list")), Seq("list"))
      .filter(col("qid") =!= col("id")).select(col("qid"), col("id"))
    val ce = quantizeInt8(corpus).select(col("vec_id").as("id"),
      transform(col("qvec"), qc => qc * col("scale")).as("e"))
    val qe = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val scored = cands.join(qe, Seq("qid")).join(ce, Seq("id"))
      .select(col("qid"), col("id"), cosine(col("qe"), col("e")).as("score"))
    val win = Window.partitionBy("qid").orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(win)).filter(col("rank") <= k)
  }

  /** Scalar int8 quantization of the embedding column — the standard 4×
    * storage/bandwidth compressor in front of ANN at 100 TB (a 100 TB float32
    * embedding store becomes 25 TB of int8 + one float scale per vector).
    * Per-vector symmetric scheme: scale = max|x|/127, q_i = floor(x_i/scale
    * + 0.5) (floor(x+0.5), NOT round(): half-up ties then agree bit-for-bit
    * with any SQL mirror), clamped to [-127, 127]; all-zero vectors get
    * scale 0 and zero codes. Pure projection — quantization shuffles nothing.
    */
  def quantizeInt8(corpus: DataFrame): DataFrame = {
    val absMax = aggregate(col("embedding"), lit(0.0),
      (acc, v) => greatest(acc, abs(v.cast("double"))))
    val scale = absMax / 127.0
    val q = when(scale > 0, transform(col("embedding"), v =>
        greatest(lit(-127L), least(lit(127L),
          floor(v.cast("double") / scale + 0.5)))))
      .otherwise(transform(col("embedding"), _ => lit(0L)))
    corpus.select(col("vec_id"), scale.as("scale"), q.as("qvec"))
  }

  /** Brute-force cosine top-k over the int8-quantized corpus: scoring reads
    * dequantized codes (q_i · scale), so the scan moves ~1/4 the bytes of
    * the float path for a small, measured recall cost (PipelineSpec pins
    * recall ≥ 0.9 vs the exact float top-k). Same deterministic ranking
    * contract as [[bruteForceTopK]].
    */
  def quantizedTopK(quantized: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = quantized.select(col("vec_id").as("id"),
      transform(col("qvec"), q => q * col("scale")).as("e"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("qid"), col("id"), cosine(col("qe"), col("e")).as("score"))
      .filter(col("qid") =!= col("id"))
    val win = Window.partitionBy("qid").orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(win)).filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, LSH-bucketed
    * (the near-dup flavor of similarity search for dedup pipelines).
    *
    * Candidate pairs are DEDUPLICATED before scoring, so the (exact) cosine
    * is computed once per (a,b) — not once per colliding table/probe.
    * Scoring is exact on every emitted pair; only recall is approximate.
    *
    * Recall: per bit the agreement probability is p = 1 - acos(s)/π; a pair
    * at cosine s lands in the same `bits`-bit bucket of one table with p^bits.
    * With `probes` = 1 (the default) each vector ALSO probes the `bits`
    * single-bit-flip neighbor buckets, raising the per-table hit rate to
    * p^bits + bits·p^(bits-1)·(1-p); across T tables recall = 1-(1-hit)^T.
    * At the driver settings (threshold 0.35, bits=6, T=8): ≈0.91 at s=0.35
    * and ≈0.97 at s=0.5 (vs ≈0.35 without multiprobe) for ~(bits+1)× the
    * bucket lookups — still equi-key joins, never all-pairs.
    *
    * Buckets over `maxBucket` vectors are excluded before the join (same
    * rationale as Dedup.capBuckets: an f-vector duplicate cluster shares
    * every bucket ⇒ f²/2 pairs; use Dedup.clustersFromBuckets over the
    * bucket table for linear output on such data).
    */
  def cosineNearDups(corpus: DataFrame, threshold: Double, dim: Int,
                     bits: Int = 10, tables: Int = 4, seed: Long = 99L,
                     probes: Int = 1, maxBucket: Int = 1000): DataFrame = {
    val b0 = corpus.select(col("vec_id"),
      posexplode(array((0 until tables).map(t =>
        srpBucket(col("embedding"), dim, bits, seed + t)): _*)).as(Seq("tbl", "bkt")))
    val b = graft.pipeline.Dedup.capBuckets(b0, Seq("tbl", "bkt"), maxBucket)
    // multiprobe on ONE side only: if codes differ in ≤1 bit, the x-side
    // probe set of either ordering contains the other's exact bucket, so
    // the (a < b) pair is still found — no symmetric blowup
    val probeCols =
      if (probes <= 0) array(col("bkt"))
      else array(col("bkt") +: (0 until bits).map(i =>
        col("bkt").bitwiseXOR(lit(1L << i))): _*)
    val x = b.select(col("vec_id"), col("tbl"), explode(probeCols).as("bkt"))
    val pairs = x.as("x").join(b.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bkt") === col("y.bkt") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .distinct()
    val e = corpus.select(col("vec_id"), col("embedding"))
    pairs
      .join(e.select(col("vec_id").as("a"), col("embedding").as("ea")), Seq("a"))
      .join(e.select(col("vec_id").as("b"), col("embedding").as("eb")), Seq("b"))
      .select(col("a"), col("b"), cosine(col("ea"), col("eb")).as("score"))
      .filter(col("score") >= threshold)
  }

  /** Johnson–Lindenstrauss random projection to `dp` dimensions with a
    * DETERMINISTIC Rademacher (±1/√dp) matrix whose signs come from a
    * Lehmer mix of (row, column) — no materialized projection matrix, no
    * randomness source, bit-reproducible at any partitioning. The standard
    * cheap preprocessing before LSH/IVF when the native dimension is wide:
    * pairwise distances are preserved within (1±ε) for dp = O(log n / ε²).
    *
    * Zero-shuffle projection: one pass of higher-order array expressions
    * (zip_with index + aggregate) inside whole-stage codegen — at 100 TB
    * this is a map-only scan. Output is exploded (vec_id, dim, y) rows,
    * y rounded to 6 dp (the oracle-compare float discipline).
    */
  def projectJL(corpus: DataFrame, dp: Int = 8): DataFrame = {
    require(dp >= 1, "need at least one output dimension")
    // sign(i, j) for 0-based element i, output dim j — mirrored verbatim in
    // the DuckDB oracle (whose list lambda index is 1-based: its i IS i+1)
    def sign(i: Column, j: Column): Column =
      when(pmod(pmod((i + 1L) * (j + 3L) * 48271L + (j + 1L) * 7919L,
        lit(1009L)), lit(2L)) === 0L, 1.0).otherwise(-1.0)
    val idx = sequence(lit(0L), size(col("embedding")).cast("long") - 1L)
    val proj = transform(sequence(lit(0), lit(dp - 1)), j =>
      round(aggregate(
        zip_with(col("embedding"), idx,
          (e, i) => e.cast("double") * sign(i, j.cast("long"))),
        lit(0.0), (acc, x) => acc + x) / math.sqrt(dp.toDouble), 6))
    corpus.select(col("vec_id"), posexplode(proj).as(Seq("dim", "y")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"), col("y"))
  }

  /** Top principal component by power iteration — the embedding-drift /
    * dominant-direction diagnostic, BIT-EXACTLY oracle-mirrorable:
    *
    *  1. quantize each coordinate to q = round(x·10⁴) (long) — from here on
    *     every corpus-wide sum is EXACT integer arithmetic at any
    *     parallelism: s(p) = Σᵢ qᵢₚ, Gram g(p,q) = Σᵢ qᵢₚqᵢ_q; the 10⁴
    *     scale keeps n·g and s·s under 2⁵³ for corpora to ~10⁸ rows of
    *     unit-range coordinates, so the scaled covariance
    *     C = n·g − s·sᵀ is exact as a long AND as the double it seeds;
    *  2. `iters` power steps w = C·v with L1 renormalization, every
    *     reduction an ORDERED LEFT FOLD (ascending dim) — dim² driver-side
    *     flops on the constant-size C summary, like the IVF centroid
    *     collect; sign fixed at the max-|v| component (min dim on ties);
    *  3. per-row score = fold_p(qᵢₚ·vₚ) − fold_p(sₚ·vₚ)/n, rescaled by 10⁻⁴
    *     — one distributed projection pass, v a broadcast literal.
    *
    * A DuckDB oracle replays every stage bit for bit (integer sums;
    * list_reduce over ORDER BY dim lists for every float fold).
    *
    * 100 TB shape: two corpus passes — (dim, q)/(dim, dim, q·q) partial-
    * aggregated integer sums (≤ dim² rows cross an exchange), then the
    * scoring projection; nothing data-sized ever reaches the driver.
    */
  def pcaTopComponent(embeddings: DataFrame, iters: Int = 3): DataFrame = {
    val quant = transform(col("embedding"),
      x => round(x.cast("double") * 1e4, 0).cast("long"))
    val q = embeddings.select(col("vec_id"), quant.as("q")).cache()
    val n = q.count()
    val pe = q.select(col("vec_id"), posexplode(col("q")).as(Seq("p", "x")))
    val s = pe.groupBy("p").agg(sum(col("x")).as("s")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val dim = s.keys.max + 1
    val sv = (0 until dim).map(p => s(p))
    val gRows = pe.as("a").join(pe.as("b"), col("a.vec_id") === col("b.vec_id"))
      .groupBy(col("a.p").as("p"), col("b.p").as("q"))
      .agg(sum(col("a.x") * col("b.x")).as("g")).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // C = n·g − s·sᵀ: exact long (bounded 2^53 by the 10⁴ quantization),
    // hence the double is the same number
    val c = Array.tabulate(dim, dim)((p, pq) =>
      (n * gRows((p, pq)) - sv(p) * sv(pq)).toDouble)

    var v = Array.fill(dim)(1.0)
    for (_ <- 1 to iters) {
      // ordered left folds, ascending dim — the oracle's list_reduce order
      val w = Array.tabulate(dim)(p =>
        (0 until dim).foldLeft(0.0)((acc, pq) => acc + c(p)(pq) * v(pq)))
      val l1 = w.indices.foldLeft(0.0)((acc, p) => acc + math.abs(w(p)))
      v = w.map(_ / l1)
    }
    val pSign = v.indices.minBy(p => (-math.abs(v(p)), p))
    if (v(pSign) < 0) v = v.map(x => -x)
    val mdot = v.indices.foldLeft(0.0)((acc, p) => acc + sv(p).toDouble * v(p)) / n

    val vLit = typedLit(v.toSeq)
    val rowdot = aggregate(zip_with(col("q"), vLit, (a, b) => a.cast("double") * b),
      lit(0.0), (acc, x) => acc + x)
    q.select(col("vec_id"), round((rowdot - mdot) / 1e4, 6).as("pc1"))
  }

  /** Product quantization codebook + codes (Jégou, Douze & Schmid, PAMI
    * 2011): split each d-dim vector into `m` contiguous d/m-dim subvectors
    * and vector-quantize each subspace independently against `ksub`
    * centroids — a vector compresses to m small codes (m·log₂ksub bits),
    * the standard 10–100× memory/bandwidth step beyond [[quantizeInt8]] for
    * billion-scale ANN.
    *
    * Determinism is the [[ivfIndex]] recipe per subspace: hash-sampled seed
    * centroids refined by decimal-exact Lloyd steps (order-independent
    * sums), so codebook and codes are identical at any parallelism. All m
    * subspaces train in ONE plan — the subspace index is just another group
    * key. The codebook is m·ksub rows, localized and broadcast; assignment
    * never shuffles the corpus.
    *
    * @return (codes: (vec_id, sub, code), codebook: (sub, code, ce))
    */
  def pqIndex(corpus: DataFrame, m: Int = 4, ksub: Int = 8, seed: Long = 7L,
              lloydSteps: Int = 1): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    val e0 = corpus.select(col("vec_id"), col("embedding"))
    // (vec_id, sub, sv): the m subvectors, sliced by contiguous position
    // (integer width len//m — fractional widths would overlap when m ∤ dim)
    val dsub = floor(size(col("embedding")) / m).cast("int")
    val sub = e0.select(col("vec_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("embedding"))
      .select(col("vec_id"), col("sub").cast("int").as("sub"),
        slice(col("embedding"), (col("sub") * dsub + 1).cast("int"), dsub).as("sv"))

    def localize(df: DataFrame): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)

    // seed: per subspace, the ksub hash-least corpus subvectors
    val seedWin = Window.partitionBy("sub").orderBy(col("h"), col("vec_id"))
    var book = localize(sub
      .select(col("sub"), col("sv"), col("vec_id"),
        xxhash64(col("vec_id"), col("sub"), lit(seed)).as("h"))
      .withColumn("rn", row_number().over(seedWin)).filter(col("rn") <= ksub)
      .select(col("sub"), (col("rn") - 1).as("code"), col("sv").as("ce")))

    // nearest centroid per (vector, subspace) by L2 (tie: low code). Dot
    // would degenerate here — it is scale-sensitive, so the largest-norm
    // centroid swallows every vector; k-means geometry needs the distance.
    def assign(b: DataFrame): DataFrame =
      sub.join(broadcast(b), Seq("sub"))
        .select(col("vec_id"), col("sub"), col("code"), sqdist(col("sv"), col("ce")).as("d"))
        .groupBy("vec_id", "sub")
        .agg(min_by(col("code"), struct(col("d"), col("code"))).as("code"))

    for (_ <- 1 to lloydSteps) {
      book = localize(assign(book)
        .join(sub, Seq("vec_id", "sub"))
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("p", "x")))
        .groupBy("sub", "code", "p")
        .agg((sum(col("x").cast("decimal(38,15)")) / count(lit(1)))
          .cast("double").as("mm"))
        .groupBy("sub", "code").agg(transform(
          array_sort(collect_list(struct(col("p"), col("mm")))),
          s => s.getField("mm").cast("float")).as("ce")))
    }
    (assign(book), book)
  }

  /** ANN by asymmetric distance computation (ADC) over the PQ codes: the
    * query stays full-precision; score(q, v) ≈ Σ_sub ⟨q_sub, ce(sub,
    * code_v[sub])⟩, i.e. the inner product against v's RECONSTRUCTION. The
    * per-query work is one m·ksub lookup table (broadcast — it is tiny) plus
    * a code-indexed sum per corpus vector; the corpus embeddings themselves
    * are never read at query time — that is the entire point at 100 TB.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 4,
             ksub: Int = 8, seed: Long = 7L): DataFrame = {
    val (codes, book) = pqIndex(corpus, m, ksub, seed)
    val dsub = floor(size(col("embedding")) / m).cast("int")
    val qsub = queries.select(col("vec_id").as("qid"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("embedding"))
      .select(col("qid"), col("sub").cast("int").as("sub"),
        slice(col("embedding"), (col("sub") * dsub + 1).cast("int"), dsub).as("qv"))
    // ADC lookup table of squared L2 distances: |queries|·m·ksub rows —
    // broadcast side
    val lut = qsub.join(broadcast(book), Seq("sub"))
      .select(col("qid"), col("sub"), col("code"), sqdist(col("qv"), col("ce")).as("c"))
    val scored = codes.join(broadcast(lut), Seq("sub", "code"))
      .groupBy(col("qid"), col("vec_id").as("id"))
      // decimal sum: the m-term ADC total is order-independent, so ranks
      // are stable at any partitioning (double partial-aggs would not be)
      .agg(sum(col("c").cast("decimal(38,15)")).cast("double").as("dist"))
      .filter(col("qid") =!= col("id"))
    val win = Window.partitionBy("qid").orderBy(col("dist").asc, col("id").asc)
    scored.withColumn("rank", row_number().over(win)).filter(col("rank") <= k)
  }

  /** EXACT-arithmetic k-means over the int8-quantized codes — the
    * oracle-backed face of the Lloyd machinery the IVF/PQ indexes use
    * internally (those train on float vectors; this variant is engine-exact
    * end to end, so any engine replays the full clustering bit-for-bit).
    *
    * The integer trick: keep each centroid as (SUM vector, COUNT) instead
    * of a fractional mean. Squared distance to centroid j is then the exact
    * rational (A·c_j² − 2·B_j·c_j + D_j) / c_j² with A=‖x‖², B_j=x·S_j,
    * D_j=‖S_j‖² all integers; the one double division is identical IEEE in
    * every engine, and ties break on the smallest centroid id. Init:
    * centroids 0..k−1 are the k smallest vec_ids' codes. Clusters that
    * empty out drop (standard Lloyd).
    *
    * Scale shape: centroids are K·dim driver-side integers (precedent:
    * [[ivfIndex]]); each step is one broadcast-literal assignment pass
    * (zip_with folds, no shuffle) plus one (cluster,pos)-keyed sum whose
    * result is K·dim rows. Never a vector-sized shuffle.
    *
    * @return (vec_id, cluster) after `steps` assignment rounds
    */
  def kmeansInt8(corpus: DataFrame, k: Int, steps: Int): DataFrame = {
    require(k >= 1 && steps >= 1, "k and steps must be >= 1")
    val dec = "decimal(38,0)"
    val q = quantizeInt8(corpus)
      .select(col("vec_id"), transform(col("qvec"), _.cast("long")).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // init: (cid, sumVector, count=1) from the k smallest vec_ids
    var cents: Seq[(Int, Array[Long], Long)] =
      q.orderBy("vec_id").limit(k).collect().zipWithIndex.map { case (r, i) =>
        (i, r.getSeq[Long](1).toArray, 1L)
      }.toSeq

    def assignExpr: Column = {
      // shared exact rational-distance kernel (the oracle mirrors it with
      // HUGEINT); Catalyst's common-subexpression elimination dedupes the
      // per-centroid ‖x‖² folds inside the one projection
      val scored = cents.map { case (cid, s, c) =>
        (cid, ratDistConst(col("x"), s, c))
      }
      scored.tail.foldLeft(
        struct(scored.head._2.as("d"), lit(scored.head._1).as("cid"))) {
        case (best, (cid, d)) =>
          when(d < best.getField("d"), struct(d.as("d"), lit(cid).as("cid")))
            .otherwise(best)
      }.getField("cid")
    }

    var assigned: DataFrame = null
    for (step <- 1 to steps) {
      assigned = q.withColumn("cluster", assignExpr)
      if (step < steps) { // the last round's assignment IS the output —
        val cnts = assigned.groupBy("cluster").agg(count(lit(1)).as("cnt"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val sums = assigned
          .select(col("cluster"), posexplode(col("x")).as(Seq("pos", "v")))
          .groupBy("cluster", "pos").agg(sum("v").as("sv"))
          .collect().groupBy(_.getInt(0))
          .map { case (cid, rows) =>
            cid -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toArray
          }
        cents = cnts.keys.toSeq.sorted.map(cid => (cid, sums(cid), cnts(cid)))
      }
    }
    val out = assigned.select(col("vec_id"), col("cluster").cast("long").as("cluster"))
    out.cache(); out.count(); q.unpersist(false)
    out
  }

  /** EXACT-arithmetic product quantization over the int8 codes — the
    * oracle-backed twin of [[pqIndex]] (which trains on floats with xxhash64
    * seeding, replayable only rows-only). Same structure: m contiguous
    * subspaces, ksub centroids each, seeded from the hash-least subvectors,
    * one Lloyd refinement, nearest-centroid codes out. Every arithmetic step
    * is engine-exact: seeding uses a Lehmer hash ((id·48271 + sub·1013 +
    * seed) mod 1000003) any SQL engine computes; centroids stay (sum-vector,
    * count) integer pairs; squared distance to centroid j is the exact
    * rational (A·c² − 2·B·c + D)/c² with one IEEE division (the
    * [[kmeansInt8]] trick), ties to the smallest code.
    *
    * Scale shape: all m subspaces train in ONE plan (sub is a group key);
    * the codebook is m·ksub rows, localized and broadcast; the corpus never
    * shuffles for assignment — only the K·dim-sized centroid update does.
    *
    * @return (vec_id, sub, code) — the PQ code matrix after one Lloyd step
    */
  def pqCodesInt8(corpus: DataFrame, m: Int = 4, ksub: Int = 8,
                  seed: Long = 7L): DataFrame =
    pqIndexInt8(corpus, m, ksub, seed)._1

  /** The full exact-integer PQ index: (codes, codebook) where the codebook
    * rows are (sub, code, s = integer sum-vector, cnt) — the rational
    * centroid representation [[pqTopKLcg]] queries against.
    */
  private[pipeline] def pqIndexInt8(corpus: DataFrame, m: Int = 4, ksub: Int = 8,
                                    seed: Long = 7L): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    val dec = "decimal(38,0)"
    val q = quantizeInt8(corpus)
      .select(col("vec_id"), transform(col("qvec"), _.cast("long")).as("x"))
    // integer subvector width, exactly the oracle's len//m (a fractional
    // dsub would overlap/skip positions whenever m ∤ dim)
    val dsub = floor(size(col("x")) / m).cast("int")
    val sub = q.select(col("vec_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("x"))
      .select(col("vec_id"), col("sub").cast("long").as("sub"),
        slice(col("x"), (col("sub") * dsub + 1).cast("int"), dsub).as("sv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def localize(df: DataFrame): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)

    // seed book: per subspace the ksub Lehmer-least subvectors, count=1
    val seedWin = Window.partitionBy("sub").orderBy(col("h"), col("vec_id"))
    val book0 = localize(sub
      .withColumn("h", (col("vec_id") * 48271L + col("sub") * 1013L + lit(seed)) % 1000003L)
      .withColumn("rn", row_number().over(seedWin)).filter(col("rn") <= ksub)
      .select(col("sub"), (col("rn") - 1).cast("long").as("code"),
        col("sv").as("s"), lit(1L).as("cnt")))

    // nearest centroid, exact rational distance, tie -> smallest code
    def assign(book: DataFrame): DataFrame =
      sub.join(broadcast(book), Seq("sub"))
        .select(col("vec_id"), col("sub"), col("code"),
          ratDistCols(col("sv"), col("s"), col("cnt")).as("d"))
        .groupBy("vec_id", "sub")
        .agg(min_by(col("code"), struct(col("d"), col("code"))).as("code"))

    // one Lloyd step: integer (sum-vector, count) centroids from the codes
    val book1 = localize(assign(book0)
      .join(sub, Seq("vec_id", "sub"))
      .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("p", "v")))
      .groupBy("sub", "code", "p")
      .agg(sum(col("v")).as("spv"), count(lit(1)).as("c"))
      .groupBy("sub", "code")
      .agg(transform(array_sort(collect_list(struct(col("p"), col("spv")))),
        s => s.getField("spv")).as("s"), max(col("c")).as("cnt")))

    val out = assign(book1)
    out.cache(); out.count(); sub.unpersist(false)
    (out, book1)
  }

  /** SQL-re-derivable ADC twin of [[pqTopK]]: the index is the exact-integer
    * PQ of [[pqIndexInt8]] (codes already oracled by ann_pq_codes), the
    * query's int8 subvectors are scored against every (sub, code) centroid
    * with the same exact rational distance (one IEEE division each), and
    * the per-vector ADC score is the m per-subspace distances added LEFT TO
    * RIGHT (d0+d1+…+d(m−1): a pinned fold, not an order-free groupBy sum),
    * ranked ascending with id tie-break. Query time reads the 1-byte codes
    * only — the corpus embeddings never re-enter the plan. The float
    * [[pqTopK]] stays the production path; this twin oracles ADC end to end.
    */
  def pqTopKLcg(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 4,
                ksub: Int = 8, seed: Long = 7L): DataFrame = {
    val (codes, book) = pqIndexInt8(corpus, m, ksub, seed)
    val qz = quantizeInt8(queries)
      .select(col("vec_id"), transform(col("qvec"), _.cast("long")).as("x"))
    // integer subvector width, exactly the oracle's len//m partitions (a
    // fractional dsub would overlap/skip positions whenever m ∤ dim)
    val dsub = floor(size(col("x")) / m).cast("int")
    val qsub = qz.select(col("vec_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("x"))
      .select(col("vec_id").as("qid"), col("sub").cast("long").as("sub"),
        slice(col("x"), (col("sub") * dsub + 1).cast("int"), dsub).as("sv"))
    val qd = qsub.join(broadcast(book), Seq("sub"))
      .select(col("qid"), col("sub"), col("code"),
        ratDistCols(col("sv"), col("s"), col("cnt")).as("d"))
    val jd = qd.join(codes.select(col("vec_id").as("id"), col("sub"), col("code")),
        Seq("sub", "code"))
      .filter(col("qid") =!= col("id"))
    val aggs = (0 until m).map(s => max(when(col("sub") === s, col("d"))).as(s"d$s"))
    val pv = jd.groupBy("qid", "id").agg(aggs.head, aggs.tail: _*)
      .select(col("qid"), col("id"),
        (0 until m).map(s => col(s"d$s")).reduce(_ + _).as("dist"))
    val win = Window.partitionBy("qid").orderBy(col("dist").asc, col("id").asc)
    pv.withColumn("rank", row_number().over(win)).filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("rank"))
  }
}
