package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale training-data deduplication operators over a `documents` table
  * (doc_id: long, text: string, ...). All hash-based stages use Spark's
  * codegen'd xxhash64 — no UDFs anywhere, every stage is a declarative plan
  * whose heavy steps are shuffle-parallel group-bys/joins.
  *
  * Scale design: every method emits CANDIDATE pairs from bounded-size buckets
  * (bands/buckets), never an all-pairs product; verification joins run only on
  * candidates. At 100 TB the bucket-join is the only shuffle that grows with
  * corpus size and it is keyed on (band, bucket-hash) — uniformly distributed
  * by construction.
  */
object Dedup {

  /** Exact dedup: group identical normalized text; keep the smallest doc_id.
    * The groupBy key is a 256-bit content hash so the shuffle carries hashes,
    * not full documents (column-pruned scan reads only (doc_id, text)).
    */
  def exact(docs: DataFrame, normalize: Boolean = false): DataFrame = {
    val t = if (normalize) lower(regexp_replace(col("text"), "\\s+", " ")) else col("text")
    docs.select(col("doc_id"), sha2(t.cast("binary"), 256).as("h"))
      .groupBy("h")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** Word w-shingles of the text, distinct per doc: (doc_id, shingle_hash).
    * Empty tokens (leading/doubled whitespace) are dropped BEFORE windowing so
    * shingles are over the real token stream.
    */
  def shingles(docs: DataFrame, w: Int = 3): DataFrame = {
    // All-array, whole-stage-codegen plan: tokenization, windowing, hashing
    // and per-doc dedup happen inside one projection — no per-token explode,
    // no per-doc window sort, no shuffle at all before the consumer's.
    val toks = filter(split(lower(col("text")), "\\s+"),
      t => length(t) > 0)
    val starts = sequence(lit(0), size(col("toks")) - w)
    val hashed = transform(starts,
      i => xxhash64(concat_ws(" ", slice(col("toks"), i + 1, lit(w)))))
    docs.select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        explode(when(size(col("toks")) >= w, array_distinct(hashed))
          .otherwise(array().cast("array<bigint>"))).as("sh"))
  }

  /** MinHash signatures: numPerm universal-hash permutations
    * h_i(x) = (a_i * x + b_i) mod p over the shingle hashes, min per doc.
    * Plan: ONE shuffle (group the doc's shingle hashes), then the whole
    * numPerm × |shingles| min-reduction runs as a codegen'd nested
    * higher-order transform — the previous plan posexploded numPerm× rows
    * through two shuffles; this one moves each shingle hash once.
    */
  def minhashSignatures(sh: DataFrame, numPerm: Int = 32, seed: Long = 7L): DataFrame = {
    val p = lit(2147483647L) // 2^31 - 1: keeps a*x+b < 2^62, no long overflow
    // per permutation, a LONG-accumulator min-fold over the shingle hashes:
    // the previous spelling materialized a fresh |shingles|-element array per
    // permutation (transform + array_min = numPerm array allocations per doc
    // inside the interpreted HOF) — the fold computes the identical minimum
    // with zero per-permutation allocation (guide §1.2 per-task work)
    val sig = transform(sequence(lit(0), lit(numPerm - 1)), i => {
      val a = abs(xxhash64(lit("a"), i, lit(seed))) % (p - 1) + 1
      val b = abs(xxhash64(lit("b"), i, lit(seed))) % p
      aggregate(col("shs"), p, (acc, x) => least(acc, pmod(a * pmod(x, p) + b, p)))
    })
    sh.groupBy("doc_id").agg(collect_list(col("sh")).as("shs"))
      .select(col("doc_id"), sig.as("sig"))
  }

  /** Per-bucket population cap applied BEFORE a bucket self-join: a cluster
    * of f exact/near-identical documents (boilerplate, licenses, templates —
    * ubiquitous at web scale) shares every band, so an uncapped self-join
    * emits f²/2 pairs from one key. Capping drops over-populated buckets from
    * the PAIR output (the same df-cap discipline as ngramJaccardPairs'
    * maxDf); `clustersFromBuckets` is the linear-output path that still
    * covers those mega-clusters. `overCapBuckets` reports what was dropped
    * so pipelines can log it — silent truncation is not an option at scale.
    */
  private[pipeline] def capBuckets(buckets: DataFrame, keys: Seq[String],
                                   maxBucket: Int): DataFrame =
    if (maxBucket <= 0) buckets
    else buckets.join(
      buckets.groupBy(keys.map(col): _*).agg(count(lit(1)).as("pop"))
        .filter(col("pop") <= maxBucket).select(keys.map(col): _*),
      keys, "left_semi")

  /** The (key..., pop) rows a `maxBucket` cap would drop — the audit view of
    * the cap (count/log these next to the pair output).
    */
  def overCapBuckets(buckets: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame =
    buckets.groupBy(keys.map(col): _*).agg(count(lit(1)).as("pop"))
      .filter(col("pop") > maxBucket)

  /** (doc_id, band, bkt) LSH band-bucket table for MinHash signatures —
    * the banding stage shared by the pair and cluster outputs.
    */
  def minhashBuckets(sigs: DataFrame, bands: Int = 8): DataFrame =
    sigs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b => {
        val rows = size(col("sig")) / bands
        xxhash64(to_json(struct(slice(col("sig"), b * rows + 1, rows))), b)
      })).as(Seq("band", "bkt")))

  /** LSH banding: signature split into `bands` bands of rows = numPerm/bands;
    * docs sharing a band-bucket hash are near-dup candidates. Emits candidate
    * pairs (a < b) with the number of colliding bands. Buckets over
    * `maxBucket` docs are excluded (see capBuckets) — duplicate mega-clusters
    * belong to the cluster output, not a quadratic pair list.
    */
  def minhashCandidates(sigs: DataFrame, bands: Int = 8,
                        maxBucket: Int = 1000): DataFrame = {
    // the band-bucket table is referenced 4x downstream (cap population agg,
    // cap semi-join, and both sides of the candidate self-join); without a
    // cache each reference re-runs the whole signature pipeline INCLUDING
    // its collect_list shuffle (no exchange reuse across the cap semi-join).
    // docs × bands rows of (long, int, long) — bounded, safe to pin.
    val buckets = capBuckets(minhashBuckets(sigs, bands).cache(),
      Seq("band", "bkt"), maxBucket)
    buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bkt") === col("y.bkt") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("bands_hit"))
  }

  /** Cluster-representative dedup output over any (doc_id, bucket-key...)
    * table: each bucket contributes one STAR of links (doc → min doc_id of
    * the bucket) — O(docs × buckets/doc) links, linear in cluster size where
    * the pair output is quadratic — and connected components over those
    * links merges transitively-linked buckets. Returns (doc_id, rep_id)
    * with rep_id = min doc_id of the whole (transitive) cluster; docs in no
    * bucket map to themselves.
    */
  def clustersFromBuckets(docs: DataFrame, buckets: DataFrame,
                          keys: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    val bmin = buckets.groupBy(keys.map(col): _*).agg(min(col("doc_id")).as("rep"))
    val links = buckets.join(bmin, keys)
      .select(col("doc_id").as("src"), col("rep").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val comp = graft.algos.ConnectedComponents.run(spark, links)
    docs.select(col("doc_id"))
      .join(comp.select(col("id").as("doc_id"), col("comp")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("rep_id"))
  }

  /** The report every production dedup run emits — ONE integer-exact row:
    * corpus size and bytes, exact-duplicate share and reclaimable bytes
    * (non-representative copies), and the LCG near-dup cluster count and
    * membership. Every number is a count or byte sum, so the oracle replays
    * the row exactly (the near side reuses the dedup_minhash_clusters_lcg
    * chain). Scale shape: two aggregations over tables the dedup pipeline
    * already builds; the only wide value crossing a shuffle is the 32-byte
    * content hash inside [[exactClusters]].
    */
  def dedupStats(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"),
      octet_length(col("text")).cast("long").as("b"))
    val s1 = base.join(exactClusters(docs), Seq("doc_id")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("b")).as("total_bytes"),
      countDistinct(col("rep_id")).as("exact_unique"),
      sum(when(col("doc_id") =!= col("rep_id"), 1L).otherwise(0L)).as("exact_dup_docs"),
      sum(when(col("doc_id") =!= col("rep_id"), col("b")).otherwise(0L)).as("exact_dup_bytes"))
    val s2 = minhashClustersLcg(docs).agg(
      countDistinct(col("rep_id")).as("near_clusters"),
      sum(when(col("doc_id") =!= col("rep_id"), 1L).otherwise(0L)).as("near_dup_docs"))
    s1.crossJoin(s2)
  }

  /** Exact-duplicate clusters: (doc_id, rep_id = min doc_id with identical
    * text). One hash-groupBy + one hash-join; the shuffle carries 32-byte
    * content hashes. The SQL-expressible base case of clustersFromBuckets
    * (single bucket per doc ⇒ no transitive merging needed).
    */
  def exactClusters(docs: DataFrame, normalize: Boolean = false): DataFrame = {
    val t = if (normalize) lower(regexp_replace(col("text"), "\\s+", " ")) else col("text")
    val withH = docs.select(col("doc_id"), sha2(t.cast("binary"), 256).as("h"))
    withH.join(withH.groupBy("h").agg(min(col("doc_id")).as("rep_id")), Seq("h"))
      .select(col("doc_id"), col("rep_id"))
  }

  /** Snapshot-incremental exact dedup — the recurring-crawl shape: of the
    * `delta` docs, keep one representative per content hash that does NOT
    * already exist in `base`. The base side is reduced to its distinct
    * 32-byte hashes before the anti-join, so the exchange carries hashes,
    * never text, and the delta (typically ≪ base) drives the join. Output
    * is (keep_id, n_copies) per new content, same rule as [[exact]].
    */
  def incrementalNew(delta: DataFrame, base: DataFrame,
                     normalize: Boolean = false): DataFrame = {
    def hashed(df: DataFrame): DataFrame = {
      val t = if (normalize) lower(regexp_replace(col("text"), "\\s+", " "))
              else col("text")
      df.select(col("doc_id"), sha2(t.cast("binary"), 256).as("h"))
    }
    hashed(delta)
      .join(hashed(base).select("h").distinct(), Seq("h"), "left_anti")
      .groupBy("h")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
  }

  /** MinHash near-dup clusters: the linear-output flavor of minhashNearDups —
    * (doc_id, rep_id) via band-bucket star links + connected components,
    * immune to the f² pair blowup on duplicate mega-clusters (no cap needed:
    * a 10⁶-doc identical cluster emits 10⁶·bands links, not 10¹² pairs).
    */
  def minhashClusters(docs: DataFrame, numPerm: Int = 32, bands: Int = 8,
                      w: Int = 3): DataFrame = {
    val sigs = minhashSignatures(shingles(docs, w), numPerm)
    clustersFromBuckets(docs, minhashBuckets(sigs, bands), Seq("band", "bkt"))
  }

  /** SimHash near-dup clusters — clustersFromBuckets over the pigeonhole
    * blocks: docs whose fingerprints share a block merge transitively
    * (the superset of the Hamming-radius pairs; the pair path verifies
    * exact distance, the cluster path favors linear output — pick per use).
    */
  def simhashClusters(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    clustersFromBuckets(docs, simhashBlocks(simhash(docs), maxHamming), Seq("blk", "bv"))

  /** Exact Jaccard similarity for given candidate pairs (verification step):
    * |A∩B| via a join of the shingle sets restricted to candidates,
    * |A∪B| = |A|+|B|-|A∩B|.
    */
  def jaccardVerify(sh: DataFrame, cands: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.select(col("doc_id").as("a"), col("sh"))
      .join(cands.select("a", "b"), Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("sh")), Seq("b", "sh"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sa")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("sb")), Seq("b"))
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("sa") + col("sb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Full MinHash+LSH near-dup pipeline: shingle → sign → band → candidate →
    * exact-Jaccard verify. Returns (a, b, jaccard) pairs above threshold.
    */
  def minhashNearDups(docs: DataFrame, threshold: Double = 0.7, numPerm: Int = 32,
                      bands: Int = 8, w: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val sh = shingles(docs, w).cache()
    val cands = minhashCandidates(minhashSignatures(sh, numPerm), bands, maxBucket)
    jaccardVerify(sh, cands, threshold)
  }

  /** SimHash: 64-bit fingerprint; per bit, sign of the weighted sum of token
    * hash bits. Hamming-close fingerprints = near-dups. Pure column algebra:
    * token → hash → per-bit ±1 vote → per-doc sum → sign bits → packed long.
    */
  def simhash(docs: DataFrame): DataFrame = {
    // SimHash is per-doc-local, so the whole fingerprint is ONE projection:
    // a single aggregate() pass over the token-hash array carrying a 64-long
    // per-bit set-count accumulator — zero shuffles. The accumulator update
    // is an INDEX-LAMBDA transform (bit position = the lambda's index
    // argument, shifted by a column-valued ShiftRight), not a 64-way
    // unrolled array(...) of per-bit whens: the unrolled expression tree was
    // ~64× larger and cost ~4.6 s of one-shot driver-side plan processing
    // per fresh query (measured this round: fingerprint pass 4.95 s first
    // run vs 0.34 s re-run of the same compiled plan; the index-lambda tree
    // drops the first run to ~1 s). Same math bit for bit: the sign test
    // votes_b > 0 with ±1 votes is exactly 2·cnt_b > n_tokens.
    val toks = filter(split(lower(col("text")), "\\s+"),
      t => length(t) > 0)
    val hs = transform(col("toks"), t => xxhash64(t))
    val zero = array_repeat(lit(0L), 64)
    def shr(v: Column, n: Column): Column = {
      import org.apache.spark.sql.graft.{GraftSqlInternals => GI}
      GI.column(org.apache.spark.sql.catalyst.expressions.ShiftRight(
        GI.expression(v), GI.expression(n)))
    }
    val cnts = aggregate(col("hs"), zero, (acc, h) =>
      transform(acc, (v, i) => v + shr(h, i).bitwiseAND(1)))
    val powers = typedLit((0 until 64).map(b => 1L << b))
    val fp = aggregate(
      zip_with(col("cnts"), powers,
        (c, p) => when(c * 2 > size(col("hs")), p).otherwise(lit(0L))),
      lit(0L), (a, x) => a + x)
    docs.select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), hs.as("hs"))
      .filter(size(col("hs")) > 0) // token-less docs have no fingerprint
      .select(col("doc_id"), col("hs"), cnts.as("cnts"))
      .select(col("doc_id"), fp.as("simhash"))
  }

  /** SimHash near-dup candidates: block on (maxHamming+1) sub-fingerprints —
    * by pigeonhole, ANY pair within Hamming distance maxHamming has all its
    * differing bits confined to at most maxHamming blocks, so it collides on
    * at least one block. Blocking is therefore COMPLETE for the requested
    * radius (round 1 hard-coded 4 blocks, silently incomplete past d=3);
    * exact Hamming distance is verified on the candidates.
    */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3,
                      maxBucket: Int = 1000): DataFrame =
    simhashCandidatePairs(simhash(docs).cache(), maxHamming, maxBucket)

  /** (doc_id, simhash, blk, bv) pigeonhole block table for precomputed
    * fingerprints — the blocking stage shared by the pair and cluster paths.
    */
  def simhashBlocks(sig: DataFrame, maxHamming: Int): DataFrame = {
    val nBlocks = maxHamming + 1
    val bounds = (0 to nBlocks).map(b => b * 64 / nBlocks)
    val blockCols = array((0 until nBlocks).map { b =>
      val width = bounds(b + 1) - bounds(b)
      val m = if (width >= 64) -1L else (1L << width) - 1
      shiftright(col("simhash"), bounds(b)).bitwiseAND(lit(m))
    }: _*)
    sig.select(col("doc_id"), col("simhash"),
      posexplode(blockCols).as(Seq("blk", "bv")))
  }

  /** Blocked pair search over precomputed (doc_id, simhash) fingerprints —
    * the blocking stage of simhashNearDups, exposed so completeness is
    * directly testable on adversarial bit patterns. Blocks over `maxBucket`
    * docs are excluded from the PAIR output (capBuckets; identical-fingerprint
    * mega-clusters go quadratic otherwise — use clustersFromBuckets over
    * simhashBlocks for linear cluster output on such data).
    */
  def simhashCandidatePairs(sig: DataFrame, maxHamming: Int,
                            maxBucket: Int = 1000): DataFrame = {
    // same 4-reference shape as minhashCandidates: pin the block table so
    // the cap agg/semi and both self-join sides scan one materialization
    val blocks = capBuckets(simhashBlocks(sig, maxHamming).cache(),
      Seq("blk", "bv"), maxBucket)
    val hamming = bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
    blocks.as("x").join(blocks.as("y"),
        col("x.blk") === col("y.blk") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"), hamming.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard over pairs sharing at least one NON-UBIQUITOUS
    * shingle. The inverted-index self-join has a document-frequency cap
    * (standard practice): one boilerplate shingle shared by f documents would
    * emit f²/2 candidate pairs — quadratic blowup at web scale. Capping df at
    * `maxDf` bounds the worst shingle's pair emission at maxDf²/2 and makes
    * the result an under-approximation ONLY for pairs whose every shared
    * shingle occurs in > maxDf documents (such pairs share nothing
    * distinctive; the exact-Jaccard verify still uses the FULL shingle sets).
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double, w: Int = 3,
                        maxDf: Int = 1000): DataFrame = {
    val sh = shingles(docs, w).cache()
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("sh")
    val shCapped = sh.join(rare, Seq("sh"), "left_semi")
    val cands = shCapped.select(col("doc_id").as("a"), col("sh"))
      .join(shCapped.select(col("doc_id").as("b"), col("sh")), Seq("sh"))
      .filter(col("a") < col("b")).select("a", "b").distinct()
    jaccardVerify(sh, cands, threshold)
  }

  /** MinHash+LSH near-dup with every hash SQL-RE-DERIVABLE — the
    * [[graft.algos.MIS.runLcg]] trick applied to the flagship dedup path, so
    * a DuckDB oracle replays the ENTIRE pipeline (shingle ids → 32 LCG
    * permutations → banded bucket codes → capped candidates → exact Jaccard)
    * and pins it end to end, where the xxhash64 production path
    * ([[minhashNearDups]]) is rows-only by nature. Differences from the
    * production path, both deliberate: shingles stay strings and are mapped
    * to dense-rank ids (ONE global-ordered rank over the distinct-shingle
    * vocabulary — fine at oracle scale, the production path hashes instead),
    * and band buckets are an arithmetic fold (acc·8191 + sig) mod p rather
    * than a hash of the band slice. Same banding math, same cap discipline,
    * same full-set exact verify.
    */
  /** The SQL-re-derivable LCG LSH stage shared by the near-dup and cluster
    * twins: (shingle table, (doc_id, band, bkt) buckets) — dense-rank shingle
    * ids, `numPerm` LCG permutations mod 2^31-1, banded folds.
    */
  private[pipeline] def minhashBucketsLcg(docs: DataFrame, numPerm: Int,
                                          bands: Int, w: Int): (DataFrame, DataFrame) = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    val P = 2147483647L // 2^31 - 1 (prime): sig < 2^31, fold stays < 2^44
    val r = numPerm / bands
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val sh = docs.select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), explode(when(size(col("toks")) >= w,
        array_distinct(transform(sequence(lit(0), size(col("toks")) - w),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(w))))))
        .otherwise(array().cast("array<string>"))).as("sh")).cache()
    val vocab = sh.select("sh").distinct()
      .withColumn("sid", (dense_rank().over(
        org.apache.spark.sql.expressions.Window.orderBy("sh")) - 1).cast("long"))
    val shs = sh.join(vocab, "sh").select("doc_id", "sid")
    val sig = transform(sequence(lit(0), lit(numPerm - 1)), j => {
      val a = (lit(48271L) * j + 16807L) % P
      val b = (lit(69621L) * j + 12345L) % P
      array_min(transform(col("sids"), x => (a * pmod(x, lit(P)) + b) % P))
    })
    val sigs = shs.groupBy("doc_id").agg(collect_list(col("sid")).as("sids"))
      .select(col("doc_id"), sig.as("sig"))
    val buckets = sigs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        aggregate(slice(col("sig"), b * r + 1, lit(r)), lit(0L),
          (acc, x) => (acc * 8191L + x) % P)))).toDF("doc_id", "band", "bkt")
    (sh, buckets)
  }

  def minhashNearDupsLcg(docs: DataFrame, threshold: Double = 0.5,
                         numPerm: Int = 32, bands: Int = 8, w: Int = 3,
                         maxBucket: Int = 1000): DataFrame = {
    val (sh, buckets) = minhashBucketsLcg(docs, numPerm, bands, w)
    val capped = capBuckets(buckets, Seq("band", "bkt"), maxBucket)
    val cands = capped.as("x").join(capped.as("y"),
        col("x.band") === col("y.band") && col("x.bkt") === col("y.bkt") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    jaccardVerify(sh, cands, threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** SQL-re-derivable cluster twin of [[minhashClusters]]: the LCG buckets
    * above feed the same star-link + connected-components representative
    * assignment, so DuckDB can replay the buckets and converge the
    * min-label propagation itself (the engine runs CC to fixpoint; the
    * oracle unrolls enough rounds to cover the link graph's diameter).
    */
  def minhashClustersLcg(docs: DataFrame, numPerm: Int = 32, bands: Int = 8,
                         w: Int = 3): DataFrame = {
    val (_, buckets) = minhashBucketsLcg(docs, numPerm, bands, w)
    clustersFromBuckets(docs, buckets, Seq("band", "bkt"))
  }

  /** SQL-re-derivable SimHash twin of [[simhash]]: token ids come from a
    * dense_rank over the sorted distinct-token vocabulary and each of the
    * `bits` hyperplane signs is an LCG of the token id mod 2^31-1 (same
    * recipe as [[minhashNearDupsLcg]]), so DuckDB replays the ENTIRE
    * fingerprint bit for bit — votes are per-OCCURRENCE (multiset), exactly
    * like the production xxhash64 variant. The production variant stays the
    * scale path (zero-shuffle projection); this twin pays one global-window
    * vocab rank for oracle-checkability.
    */
  def simhashLcg(docs: DataFrame, bits: Int = 32): DataFrame = {
    val P = 2147483647L // 2^31 - 1: a*tid + c < 2^62, no overflow
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val tok = docs.select(col("doc_id"), explode(toks).as("tok"))
    val vocab = tok.select("tok").distinct()
      .withColumn("tid", (dense_rank().over(
        org.apache.spark.sql.expressions.Window.orderBy("tok")) - 1).cast("long"))
    val tids = tok.join(vocab, "tok").select("doc_id", "tid")
    val votes = transform(sequence(lit(0), lit(bits - 1)), b => {
      val a = (lit(48271L) * b + 16807L) % P
      val c = (lit(69621L) * b + 12345L) % P
      aggregate(col("tids"), lit(0L), (acc, x) =>
        acc + when((a * x + c) % P % 2 === 1, lit(1L)).otherwise(lit(-1L)))
    })
    val powers = typedLit((0 until bits).map(b => 1L << b))
    val fp = aggregate(
      zip_with(votes, powers, (s, p) => when(s > 0, p).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
    tids.groupBy("doc_id").agg(collect_list(col("tid")).as("tids"))
      .select(col("doc_id"), fp.as("simhash"))
  }

  /** ASYMMETRIC n-gram containment C(x ⊆ y) = |Sx ∩ Sy| / |Sx| — the
    * doc-in-doc detector (Broder's containment, the measure behind quote /
    * boilerplate / sub-document duplication that symmetric Jaccard misses:
    * a tweet quoted inside an article has tiny Jaccard but containment ≈ 1).
    * Same df-capped inverted-index candidates and full-set exact verify as
    * [[ngramJaccardPairs]]; each undirected candidate pair emits up to two
    * directed rows (contained, container, containment ≥ threshold).
    */
  def containmentPairs(docs: DataFrame, threshold: Double, w: Int = 3,
                       maxDf: Int = 1000): DataFrame = {
    val sh = shingles(docs, w).cache()
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("sh")
    val shCapped = sh.join(rare, Seq("sh"), "left_semi")
    val cands = shCapped.select(col("doc_id").as("a"), col("sh"))
      .join(shCapped.select(col("doc_id").as("b"), col("sh")), Seq("sh"))
      .filter(col("a") < col("b")).select("a", "b").distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.select(col("doc_id").as("a"), col("sh"))
      .join(cands, Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("sh")), Seq("b", "sh"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sa")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("sb")), Seq("b"))
    inter.select(col("a").as("contained"), col("b").as("container"),
        (col("inter").cast("double") / col("sa")).as("containment"))
      .unionByName(inter.select(col("b").as("contained"), col("a").as("container"),
        (col("inter").cast("double") / col("sb")).as("containment")))
      .filter(col("containment") >= threshold)
      .select(col("contained"), col("container"),
        round(col("containment"), 6).as("containment"))
  }

  /** Prefix-blocked edit-distance verification — the exact-tail stage of a
    * dedup cascade: block documents on their first `prefixLen` characters
    * (templated / boilerplate near-dups share long prefixes), cap block
    * population like every other bucketed method here, and score each
    * intra-block pair with true Levenshtein distance over the first
    * `window` characters. Output is every candidate pair with its distance
    * — thresholding is the caller's policy, auditing wants the scores.
    *
    * Scale shape: the only quadratic work is inside capped blocks (≤
    * maxBucket² per block); the pair join carries the truncated text once.
    * Levenshtein is O(window²) per pair — `window` bounds the cost
    * independent of document length, which is exactly why the exact stage
    * sits BEHIND the cheap blocking, never on the raw corpus.
    *
    * @return (a, b, dist) for a < b in a shared block
    */
  def editVerify(docs: DataFrame, prefixLen: Int = 32, window: Int = 256,
                 maxBucket: Int = 64): DataFrame = {
    val keyed = docs.select(col("doc_id"),
      substring(col("text"), 1, prefixLen).as("blk"),
      substring(col("text"), 1, window).as("head"))
    val capped = capBuckets(keyed, Seq("blk"), maxBucket)
    capped.as("x").join(capped.as("y"),
        col("x.blk") === col("y.blk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        levenshtein(col("x.head"), col("y.head")).cast("long").as("dist"))
  }
}
