package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.algos._
import graft.corpus.Corpus
import graft.pipeline._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Graph queries run over edge tables derived from the driver's TPC-H-ish
  * parquet (so the DuckDB oracle can derive the SAME graph in SQL):
  *  - bipartite:  supplier --ships--> part, weight = line count (integral,
  *    so float compares are exact); part ids offset by PartOffset because the
  *    raw supplier/part key spaces overlap numerically.
  *  - unipartite: supplier co-occurrence (two suppliers ship the same part),
  *    canonical lo<hi.
  * Corpus/pipeline queries with engine-internal hashing (minhash, simhash,
  * LSH, xxhash vertex ids) have no DuckDB-equivalent SQL → no oracle entry
  * (driver records rows-only), but each is differential-tested in ScalaTest.
  */
object SparkEntry {

  val PartOffset = 1000000L

  private def li(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")

  /** Bipartite supplier→part edge table (GrB_Matrix_build with dup=plus over
    * the raw line-item tuples).
    */
  def edgesBi(spark: SparkSession, dir: String): DataFrame =
    li(spark, dir).select(col("l_suppkey").as("src"),
        (col("l_partkey") + PartOffset).as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).cast("double").as("w"))

  private val edgesBiSql =
    s"""SELECT l_suppkey AS src, l_partkey + $PartOffset AS dst,
       |CAST(count(*) AS DOUBLE) AS w FROM lineitem GROUP BY 1, 2""".stripMargin

  /** Unipartite supplier co-occurrence graph, canonical lo<hi, w=1. */
  def edgesSup(spark: SparkSession, dir: String): DataFrame = {
    val l = li(spark, dir).select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
    val a = l.as("a"); val b = l.as("b")
    a.join(b, col("a.pk") === col("b.pk") && col("a.sk") < col("b.sk"))
      .select(col("a.sk").as("src"), col("b.sk").as("dst")).distinct()
      .withColumn("w", lit(1.0))
  }

  private val edgesSupSql =
    """SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst, 1.0 AS w
      |FROM lineitem a JOIN lineitem b
      |ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey""".stripMargin

  /** 32×32-bounded nation adjacency (nationkey → regionkey), the small
    * fixture matrix for structural ops.
    */
  def nationAdj(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey").cast("long").as("src"),
        col("n_regionkey").cast("long").as("dst"), lit(1.0).as("w"))

  private val nationAdjSql =
    """SELECT CAST(n_nationkey AS BIGINT) AS src,
      |CAST(n_regionkey AS BIGINT) AS dst, 1.0 AS w FROM nation""".stripMargin

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  private def embs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Flagship: PageRank to 1e-6 on the sf0.001-derived bipartite graph. */
  def entry(spark: SparkSession): DataFrame = {
    val e = edgesBi(spark, "/root/testdata/sf0.001")
    PageRank.run(spark, e, tol = 1e-6, maxIter = 100).ranks
  }

  // ---------------------------------------------------------------------------
  // queries: one per implemented operator (SURVEY.md §2 + pipeline ops)
  // ---------------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 construction: build with dup=plus
    "gb_build" -> ((s, d) => edgesBi(s, d)),

    // §2.7 transpose
    "gb_transpose" -> ((s, d) => GBMatrix(edgesBi(s, d)).transpose.df),

    // §2.3 eWiseAdd (union) of bipartite graph and its reverse-scaled self
    "gb_ewise_add" -> ((s, d) => {
      val a = GBMatrix(edgesBi(s, d))
      val b = a.transpose.apply((_, _, w) => w * 2.0)
      a.eWiseAdd(b, BinOp.PlusOp).df
    }),

    // §2.3 eWiseMult (intersection) of the co-supplier graph and its transpose
    // direction flipped (intersection = mutual pairs after un-canonicalizing)
    "gb_ewise_mult" -> ((s, d) => {
      val a = GBMatrix(edgesBi(s, d))
      val halved = a.apply((_, _, w) => w / 2.0)
      a.eWiseMult(halved, BinOp.PlusOp).df // w + w/2 on the intersection (= all)
    }),

    // §2.3 eWiseUnion with scalar defaults
    "gb_ewise_union" -> ((s, d) => {
      val a = GBMatrix(edgesBi(s, d))
      val big = GBMatrix(a.df.filter(col("w") >= 2.0))
      a.eWiseUnion(big, BinOp.PlusOp, alpha = 100.0, beta = 0.5).df
    }),

    // §2.4 select: entries strictly below the diagonal of the co-supplier
    // graph flipped (tril) + value predicate
    "gb_select" -> ((s, d) =>
      GBMatrix(edgesBi(s, d)).select((i, j, w) => w >= 3.0 && (j - i) % 2 === 0).df),

    // §2.4 apply with positional op: w' = w * 2 + (src % 10)
    "gb_apply" -> ((s, d) =>
      GBMatrix(edgesBi(s, d)).apply((i, _, w) => w * 2.0 + (i % 10).cast("double")).df),

    // §2.5 extract: A(I,J) for ranges
    "gb_extract" -> ((s, d) =>
      GBMatrix(edgesBi(s, d)).extractRange(1, 50, PartOffset + 1, PartOffset + 500).df),

    // §2.6 reduce to vector (row sums + degree)
    "gb_reduce_rows" -> ((s, d) => {
      val m = GBMatrix(edgesBi(s, d))
      m.reduceRows(Monoid.Plus).withColumnRenamed("v", "sum_w")
        .join(m.rowDegrees.withColumnRenamed("v", "degree"), Seq("id"))
    }),

    // §2.6 reduce to scalar (all four monoids at once)
    "gb_reduce_scalar" -> ((s, d) => {
      val e = edgesBi(s, d)
      e.agg(sum(col("w")).as("sum_w"), min(col("w")).as("min_w"),
        max(col("w")).as("max_w"), count(lit(1)).as("nvals"))
    }),

    // §2.2 mxv: w = A·u with plus-times, u = part vector (integral values)
    "gb_mxv" -> ((s, d) => {
      val m = GBMatrix(edgesBi(s, d))
      val u = m.reduceCols(Monoid.Plus) // in-degree-weight vector over parts
      m.mxv(u, Semiring.PlusTimes).withColumnRenamed("v", "y")
    }),

    // §2.2 mxm: C = A·Aᵀ with plus-pair = #shared parts per supplier pair
    "gb_mxm" -> ((s, d) => {
      val a = GBMatrix(edgesBi(s, d))
      a.mxm(a.transpose, Semiring.PlusPair).df.withColumnRenamed("w", "shared")
    }),

    // §2.2 + §2.8 masked mxm: same product computed ONLY where the mask
    // (src<dst pairs) has entries — dot3-style mask pushdown
    "gb_mxm_masked" -> ((s, d) => {
      val a = GBMatrix(edgesBi(s, d))
      val mask = GBMatrix(edgesSup(s, d))
      a.mxm(a.transpose, Semiring.PlusPair, Some(mask)).df.withColumnRenamed("w", "shared")
    }),

    // §2.8 accum-mask epilogue: C<M> = accum(C, T)
    "gb_accum_mask" -> ((s, d) => {
      val c = GBMatrix(edgesBi(s, d))
      val t = c.apply((_, _, w) => w * 10.0)
      val m = GBMatrix(c.df.filter(col("src") <= 50))
      c.accumMask(t, Some(BinOp.PlusOp), Some(m)).df
    }),

    // §2.7 kron on the nation adjacency (25×25-ish, cross-join semantics)
    "gb_kron" -> ((s, d) => {
      val nation = s.read.parquet(s"$d/nation.parquet")
        .select(col("n_nationkey").as("src"), col("n_regionkey").as("dst"),
          lit(1.0).as("w"))
      GBMatrix(nation).kron(GBMatrix(nation), 32, 32, BinOp.TimesOp).df
    }),

    // §2.6 argmax per row (deterministic tie-break)
    "gb_argmax" -> ((s, d) => GBMatrix(edgesBi(s, d)).argmaxRows),

    // §2.1 concat: 2×2 tile grid of the nation adjacency (offset unions)
    "gb_concat" -> ((s, d) => {
      val n = GBMatrix(nationAdj(s, d))
      GBMatrix.concat(Seq(Seq(n, n.transpose), Seq(n.apply((_, _, w) => w * 2.0), n)),
        rowHeights = Seq(32L, 32L), colWidths = Seq(32L, 32L)).df
    }),

    // §2.1 split: one tile back out of the bipartite matrix (re-based ranges)
    "gb_split" -> ((s, d) =>
      GBMatrix(edgesBi(s, d)).splitTile(1, 50, PartOffset + 1, PartOffset + 1000).df),

    // §2.1 reshape: nation adjacency 32×32 → 64×16 by-row relinearization
    "gb_reshape" -> ((s, d) => GBMatrix(nationAdj(s, d)).reshape(32, 16).df),

    // §2.2 rowscale/colscale: D*A and A*D diagonal scaling (no agg, no
    // shuffle beyond the key join)
    "gb_rowscale" -> ((s, d) => {
      val m = GBMatrix(edgesBi(s, d))
      m.rowScale(m.rowDegrees, BinOp.TimesOp).df
    }),
    "gb_colscale" -> ((s, d) => {
      val m = GBMatrix(edgesBi(s, d))
      m.colScale(m.reduceCols(Monoid.Max), BinOp.TimesOp).df
    }),

    // §2.5 assign: place the nation adjacency into a far-away submatrix of
    // the bipartite graph (outside region survives, inside replaced)
    "gb_assign_range" -> ((s, d) =>
      GBMatrix(edgesBi(s, d)).assignRange(GBMatrix(nationAdj(s, d)),
        100000L, 200000L).df),

    // §2.5 scalar subassign under a value mask: clamp heavy edges
    "gb_assign_scalar" -> ((s, d) =>
      GBMatrix(edgesBi(s, d)).assignScalar((_, _, w) => w > 3.0, 3.0).df),

    // §2.10 interface conveniences: expand / compact / laplacian / incidence
    "gb_expand" -> ((s, d) => GBMatrix(edgesBi(s, d)).expand(3.5).df),
    "gb_compact" -> ((s, d) => GBMatrix(edgesBi(s, d)).compact.df),
    "gb_laplacian" -> ((s, d) => GBMatrix(nationAdj(s, d)).laplacian.df),
    "gb_incidence" -> ((s, d) => GBMatrix(nationAdj(s, d)).incidence),

    // §2.1 triplet text roundtrip (Demo/Matrix format, read_matrix.c:58)
    "gb_triplet_io" -> ((s, d) => {
      val m = GBMatrix(nationAdj(s, d))
      val path = s"/tmp/graft_triplet_${d.replace('/', '_')}"
      graft.sources.TripletReader.write(m, path, oneBased = true)
      graft.sources.TripletReader.read(s, path, oneBased = true).df
    }),

    // §2.10 sparse DNN inference (dnn.m): 2 deterministic layers over the
    // bipartite features; differential-tested vs the mimic in ScalaTest
    "algo_dnn" -> ((s, d) => {
      val y0 = GBMatrix(edgesBi(s, d))
      val w1 = GBMatrix(nationAdj(s, d)).offsetBy(PartOffset, 0)
        .apply((_, _, w) => w * 0.5)
      val bias1 = s.range(0, 32).select(col("id"), lit(-0.2).as("v"))
      val w2 = GBMatrix(nationAdj(s, d)).transpose.apply((_, _, w) => w * 0.25)
      val bias2 = s.range(0, 32).select(col("id"), lit(0.1).as("v"))
      DNN.run(s, y0, Seq((w1, bias1), (w2, bias2))).df
    }),

    // §2.7 sort within rows: top-3 heaviest entries per supplier
    "gb_sort_topk" -> ((s, d) =>
      GBMatrix(edgesBi(s, d)).sortRows(ascending = false).filter(col("k") <= 3)),

    // §2.10 triangle count (SandiaDot2 masked wedge join) on co-supplier graph
    "algo_tricount" -> ((s, d) => {
      import s.implicits._
      Seq(TriangleCount.run(s, edgesSup(s, d))).toDF("triangles")
    }),

    // §2.10 per-edge triangle support (k-truss building block)
    "algo_edge_support" -> ((s, d) => {
      val canon = edgesSup(s, d).select(col("src").as("lo"), col("dst").as("hi"))
      TriangleCount.edgeSupport(canon)
    }),

    // §2.10 PageRank, 5 fixed iterations (SQL-oracle-checkable unrolled form)
    "algo_pagerank5" -> ((s, d) =>
      PageRank.runFixed(s, edgesBi(s, d), k = 5)
        .select(col("id"), round(col("r"), 8).as("r"))),

    // §2.10 PageRank to convergence at 1e-6 (flagship; no SQL equivalent)
    "algo_pagerank" -> ((s, d) => {
      val res = PageRank.run(s, edgesBi(s, d), tol = 1e-6, maxIter = 100)
      res.ranks.select(col("id"), round(col("r"), 8).as("r"))
    }),

    // §2.10 connected components (min-label propagation to fixpoint)
    "algo_cc" -> ((s, d) => ConnectedComponents.run(s, edgesSup(s, d))),

    // §2.10 BFS levels (any-pair frontier expansion) from the min supplier
    "algo_bfs" -> ((s, d) => {
      val e = edgesSup(s, d)
      val und = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst"),
        col("w")))
      BFS.run(s, und, source = 1L).select(col("id"), col("level"))
    }),

    // §2.9 min-plus semiring: hop-count SSSP on the directed bipartite graph
    "algo_sssp" -> ((s, d) => {
      val e = edgesBi(s, d).withColumn("w", lit(1.0))
      SSSP.run(s, e, source = 1L)
    }),

    // §2.10 label propagation communities (deterministic min tie-break)
    "algo_labelprop" -> ((s, d) => LabelPropagation.run(s, edgesSup(s, d), maxIter = 20)),

    // §2.10 k-truss (k=4) on the co-supplier graph
    "algo_ktruss" -> ((s, d) => KTruss.run(s, edgesSup(s, d), k = 4)),

    // §2.10 maximal independent set (Luby, deterministic hash scores)
    "algo_mis" -> ((s, d) => MIS.run(s, edgesSup(s, d))),

    // north rule: corpus synthesis → edge derivation → PageRank; provenance
    "corpus_edges" -> ((s, _) => {
      val c = Corpus.synthesize(s, 2000)
      Corpus.deriveEdges(c)
    }),
    "corpus_pagerank" -> ((s, _) => {
      val c = Corpus.synthesize(s, 2000)
      val res = PageRank.run(s, Corpus.deriveEdges(c), tol = 1e-6)
      res.ranks.select(col("id"), round(col("r"), 8).as("r"))
    }),
    "corpus_provenance" -> ((s, _) => {
      import s.implicits._
      val c = Corpus.synthesize(s, 2000)
      val roundtrip = c // in production: read back from the Iceberg/parquet sink
      val violations = Corpus.provenanceViolations(roundtrip, c).count()
      Seq((2000L, violations)).toDF("rows", "violations")
    }),

    // pipeline: deduplication family
    "dedup_exact" -> ((s, d) =>
      docs(s, d).groupBy("text")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select("keep_id", "n_copies")),
    "dedup_minhash" -> ((s, d) =>
      Dedup.minhashNearDups(docs(s, d), threshold = 0.5)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))),
    "dedup_simhash" -> ((s, d) => Dedup.simhashNearDups(docs(s, d), maxHamming = 6)),
    "dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(docs(s, d), threshold = 0.5)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))),

    // pipeline: similarity search
    "ann_brute_topk" -> ((s, d) => {
      val e = embs(s, d)
      val q = e.filter(col("vec_id") < 10)
      Similarity.bruteForceTopK(e, q, k = 5).select(col("qid"), col("id"), col("rank"))
    }),
    "ann_lsh_topk" -> ((s, d) => {
      val e = embs(s, d)
      val q = e.filter(col("vec_id") < 10)
      Similarity.lshTopK(e, q, k = 5, dim = 64).select(col("qid"), col("id"), col("rank"))
    }),
    // driver embeddings are uniform-random (max pairwise cosine ~0.5), so the
    // near-dup threshold is 0.35 with wide LSH (6-bit buckets × 8 tables)
    "ann_cosine_neardup" -> ((s, d) =>
      Similarity.cosineNearDups(embs(s, d), threshold = 0.35, dim = 64,
          bits = 6, tables = 8)
        .select(col("a"), col("b"), round(col("score"), 6).as("score"))),

    // pipeline: text analysis
    "text_tokens" -> ((s, d) => TextStats.tokenCounts(docs(s, d))),
    "text_quality" -> ((s, d) => TextStats.qualityScores(docs(s, d))),
    "text_langid" -> ((s, d) => TextStats.langId(docs(s, d))),
    "text_fingerprint" -> ((s, d) => TextStats.fingerprints(docs(s, d))),

    // pipeline: multimodal plumbing (stubbed codec, real schema/partitioning)
    "media_features" -> ((s, _) =>
      Multimodal.decodeAndFeaturize(s, Multimodal.synthesize(s, 1000))
        .select(col("media_id"), col("kind"), col("n_bytes"), col("payload_hash"))),
    "media_frames" -> ((s, _) => Multimodal.sampleFrames(Multimodal.synthesize(s, 1000)))
  )

  // ---------------------------------------------------------------------------
  // oracle SQL (DuckDB dialect) — same tables, same column names
  // ---------------------------------------------------------------------------

  def oracleSql: Map[String, String] = Map(
    "gb_build" -> edgesBiSql,

    "gb_transpose" ->
      s"""SELECT dst AS src, src AS dst, w FROM ($edgesBiSql)""",

    "gb_ewise_add" ->
      s"""WITH a AS ($edgesBiSql),
         |b AS (SELECT dst AS src, src AS dst, w * 2.0 AS w FROM a)
         |SELECT COALESCE(a.src, b.src) AS src, COALESCE(a.dst, b.dst) AS dst,
         |COALESCE(a.w + b.w, a.w, b.w) AS w
         |FROM a FULL OUTER JOIN b ON a.src = b.src AND a.dst = b.dst""".stripMargin,

    "gb_ewise_mult" ->
      s"""SELECT src, dst, w + w / 2.0 AS w FROM ($edgesBiSql)""",

    "gb_ewise_union" ->
      s"""WITH a AS ($edgesBiSql), b AS (SELECT * FROM a WHERE w >= 2.0)
         |SELECT COALESCE(a.src, b.src) AS src, COALESCE(a.dst, b.dst) AS dst,
         |COALESCE(a.w, 100.0) + COALESCE(b.w, 0.5) AS w
         |FROM a FULL OUTER JOIN b ON a.src = b.src AND a.dst = b.dst""".stripMargin,

    "gb_select" ->
      s"""SELECT * FROM ($edgesBiSql) WHERE w >= 3.0 AND (dst - src) % 2 = 0""",

    "gb_apply" ->
      s"""SELECT src, dst, w * 2.0 + CAST(src % 10 AS DOUBLE) AS w FROM ($edgesBiSql)""",

    "gb_extract" ->
      s"""SELECT * FROM ($edgesBiSql) WHERE src BETWEEN 1 AND 50
         |AND dst BETWEEN ${PartOffset + 1} AND ${PartOffset + 500}""".stripMargin,

    "gb_reduce_rows" ->
      s"""SELECT src AS id, sum(w) AS sum_w, CAST(count(*) AS DOUBLE) AS degree
         |FROM ($edgesBiSql) GROUP BY src""".stripMargin,

    "gb_reduce_scalar" ->
      s"""SELECT CAST(sum(w) AS DOUBLE) AS sum_w, min(w) AS min_w, max(w) AS max_w,
         |count(*) AS nvals FROM ($edgesBiSql)""".stripMargin,

    "gb_mxv" ->
      s"""WITH a AS ($edgesBiSql),
         |u AS (SELECT dst AS id, CAST(sum(w) AS DOUBLE) AS v FROM a GROUP BY dst)
         |SELECT a.src AS id, CAST(sum(a.w * u.v) AS DOUBLE) AS y
         |FROM a JOIN u ON a.dst = u.id GROUP BY a.src""".stripMargin,

    "gb_mxm" ->
      s"""WITH a AS ($edgesBiSql)
         |SELECT x.src AS src, y.src AS dst, CAST(count(*) AS DOUBLE) AS shared
         |FROM a x JOIN a y ON x.dst = y.dst GROUP BY 1, 2""".stripMargin,

    "gb_mxm_masked" ->
      s"""WITH a AS ($edgesBiSql), m AS ($edgesSupSql)
         |SELECT x.src AS src, y.src AS dst, CAST(count(*) AS DOUBLE) AS shared
         |FROM a x JOIN a y ON x.dst = y.dst
         |WHERE EXISTS (SELECT 1 FROM m WHERE m.src = x.src AND m.dst = y.src)
         |GROUP BY 1, 2""".stripMargin,

    "gb_accum_mask" ->
      s"""WITH c AS ($edgesBiSql),
         |t AS (SELECT src, dst, w * 10.0 AS w FROM c),
         |z AS (SELECT COALESCE(c.src, t.src) AS src, COALESCE(c.dst, t.dst) AS dst,
         |      COALESCE(c.w + t.w, c.w, t.w) AS w
         |      FROM c FULL OUTER JOIN t ON c.src = t.src AND c.dst = t.dst)
         |SELECT z.src, z.dst, z.w FROM z WHERE z.src <= 50
         |UNION ALL
         |SELECT c.src, c.dst, c.w FROM c WHERE c.src > 50""".stripMargin,

    "gb_kron" ->
      """WITH n AS (SELECT n_nationkey AS src, n_regionkey AS dst, 1.0 AS w FROM nation)
        |SELECT a.src * 32 + b.src AS src, a.dst * 32 + b.dst AS dst, a.w * b.w AS w
        |FROM n a CROSS JOIN n b""".stripMargin,

    "gb_concat" ->
      s"""WITH n AS ($nationAdjSql), t AS (SELECT dst AS src, src AS dst, w FROM n)
         |SELECT src, dst, w FROM n
         |UNION ALL SELECT src, dst + 32, w FROM t
         |UNION ALL SELECT src + 32, dst, w * 2.0 AS w FROM n
         |UNION ALL SELECT src + 32, dst + 32, w FROM n""".stripMargin,

    "gb_split" ->
      s"""SELECT src - 1 AS src, dst - ${PartOffset + 1} AS dst, w FROM ($edgesBiSql)
         |WHERE src BETWEEN 1 AND 50
         |AND dst BETWEEN ${PartOffset + 1} AND ${PartOffset + 1000}""".stripMargin,

    "gb_reshape" ->
      s"""SELECT (src * 32 + dst) // 16 AS src, (src * 32 + dst) % 16 AS dst, w
         |FROM ($nationAdjSql)""".stripMargin,

    "gb_rowscale" ->
      s"""WITH a AS ($edgesBiSql),
         |dg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS v FROM a GROUP BY src)
         |SELECT a.src, a.dst, dg.v * a.w AS w FROM a JOIN dg ON a.src = dg.id""".stripMargin,

    "gb_colscale" ->
      s"""WITH a AS ($edgesBiSql),
         |u AS (SELECT dst AS id, max(w) AS v FROM a GROUP BY dst)
         |SELECT a.src, a.dst, a.w * u.v AS w FROM a JOIN u ON a.dst = u.id""".stripMargin,

    "gb_assign_range" ->
      s"""WITH c AS ($edgesBiSql), a AS ($nationAdjSql),
         |ext AS (SELECT max(src) + 1 AS mi, max(dst) + 1 AS mj FROM a)
         |SELECT c.src, c.dst, c.w FROM c, ext
         |WHERE NOT (c.src >= 100000 AND c.src < 100000 + ext.mi
         |       AND c.dst >= 200000 AND c.dst < 200000 + ext.mj)
         |UNION ALL SELECT src + 100000 AS src, dst + 200000 AS dst, w FROM a""".stripMargin,

    "gb_assign_scalar" ->
      s"""SELECT src, dst, CASE WHEN w > 3.0 THEN 3.0 ELSE w END AS w
         |FROM ($edgesBiSql)""".stripMargin,

    "gb_expand" ->
      s"""SELECT src, dst, 3.5 AS w FROM ($edgesBiSql)""",

    "gb_compact" ->
      s"""WITH a AS ($edgesBiSql),
         |ids AS (SELECT DISTINCT id FROM (SELECT src AS id FROM a UNION SELECT dst FROM a)),
         |rk AS (SELECT id, row_number() OVER (ORDER BY id) - 1 AS k FROM ids)
         |SELECT rs.k AS src, rd.k AS dst, a.w
         |FROM a JOIN rk rs ON a.src = rs.id JOIN rk rd ON a.dst = rd.id""".stripMargin,

    "gb_laplacian" ->
      s"""WITH n AS ($nationAdjSql),
         |und AS (SELECT DISTINCT src, dst FROM
         |  (SELECT src, dst FROM n UNION SELECT dst, src FROM n) WHERE src <> dst),
         |deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS w FROM und GROUP BY src)
         |SELECT src, dst, -1.0 AS w FROM und
         |UNION ALL SELECT src, src AS dst, w FROM deg""".stripMargin,

    "gb_incidence" ->
      s"""WITH n AS ($nationAdjSql),
         |canon AS (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
         |          FROM n WHERE src <> dst),
         |e AS (SELECT row_number() OVER (ORDER BY lo, hi) - 1 AS edge, lo, hi FROM canon)
         |SELECT edge, lo AS vertex, -1.0 AS w FROM e
         |UNION ALL SELECT edge, hi AS vertex, 1.0 AS w FROM e""".stripMargin,

    "gb_triplet_io" -> nationAdjSql,

    "gb_argmax" ->
      s"""SELECT src AS id, dst AS arg, w AS v FROM (
         |  SELECT src, dst, w,
         |  row_number() OVER (PARTITION BY src ORDER BY w DESC, dst ASC) AS rn
         |  FROM ($edgesBiSql)) WHERE rn = 1""".stripMargin,

    "gb_sort_topk" ->
      s"""SELECT * FROM (
         |  SELECT src, dst, w,
         |  row_number() OVER (PARTITION BY src ORDER BY w DESC, dst ASC) AS k
         |  FROM ($edgesBiSql)) WHERE k <= 3""".stripMargin,

    "algo_tricount" ->
      s"""WITH e AS (SELECT src AS lo, dst AS hi FROM ($edgesSupSql))
         |SELECT count(*) AS triangles
         |FROM e x JOIN e y ON x.hi = y.lo JOIN e z ON z.lo = x.lo AND z.hi = y.hi""".stripMargin,

    "algo_edge_support" ->
      s"""WITH e AS (SELECT src AS lo, dst AS hi FROM ($edgesSupSql)),
         |tri AS (SELECT x.lo AS a, x.hi AS b, y.hi AS c
         |        FROM e x JOIN e y ON x.hi = y.lo
         |        JOIN e z ON z.lo = x.lo AND z.hi = y.hi)
         |SELECT lo, hi, count(*) AS support FROM (
         |  SELECT a AS lo, b AS hi FROM tri
         |  UNION ALL SELECT b, c FROM tri
         |  UNION ALL SELECT a, c FROM tri) GROUP BY lo, hi""".stripMargin,

    "algo_pagerank5" -> pagerankUnrolledSql(5),

    "algo_cc" ->
      s"""WITH RECURSIVE e AS (SELECT src, dst FROM ($edgesSupSql)),
         |und AS (SELECT src AS s, dst AS d FROM e UNION SELECT dst, src FROM e),
         |verts AS (SELECT DISTINCT s AS v FROM und),
         |reach(node, lab) AS (
         |  SELECT v, v FROM verts
         |  UNION
         |  SELECT und.d, reach.lab FROM reach JOIN und ON und.s = reach.node)
         |SELECT node AS id, min(lab) AS comp FROM reach GROUP BY node""".stripMargin,

    "algo_bfs" ->
      s"""WITH RECURSIVE e AS (SELECT src, dst FROM ($edgesSupSql)),
         |und AS (SELECT src AS s, dst AS d FROM e UNION SELECT dst, src FROM e),
         |reach(node, lvl) AS (
         |  SELECT CAST(1 AS BIGINT), 0
         |  UNION
         |  SELECT und.d, reach.lvl + 1 FROM reach JOIN und ON und.s = reach.node
         |  WHERE reach.lvl < 25)
         |SELECT node AS id, CAST(min(lvl) AS INT) AS level FROM reach GROUP BY node""".stripMargin,

    "algo_sssp" ->
      s"""WITH RECURSIVE e AS (SELECT src, dst FROM ($edgesBiSql)),
         |reach(node, dist) AS (
         |  SELECT CAST(1 AS BIGINT), 0.0
         |  UNION
         |  SELECT e.dst, reach.dist + 1.0 FROM reach JOIN e ON e.src = reach.node
         |  WHERE reach.dist < 25)
         |SELECT node AS id, min(dist) AS dist FROM reach GROUP BY node""".stripMargin,

    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |CAST(len(list_filter(regexp_split_to_array(text, '\s+'), t -> len(t) > 0)) AS BIGINT) AS ws_tokens,
        |CAST(len(list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'), t -> len(t) > 0)) AS BIGINT) AS alnum_runs,
        |CAST(ceil(len(regexp_replace(text, '\s+', '', 'g')) / 4.0) AS BIGINT) AS bpe_est
        |FROM documents""".stripMargin,

    "media_features" -> "", // engine-internal synthesis: rows-only
    "media_frames" -> ""
  ).filter(_._2.nonEmpty)

  /** k unrolled PageRank iterations as DuckDB SQL (same math as
    * algos.PageRank: damp=0.85, sinks d=1 contribute damp*mass/n, start 1/n).
    */
  private def pagerankUnrolledSql(k: Int): String = {
    val prelude =
      s"""WITH e AS (SELECT src, dst FROM ($edgesBiSql)),
         |verts AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
         |deg AS (SELECT verts.id, COALESCE(o.d, 1.0) AS d, o.d IS NULL AS sink
         |        FROM verts LEFT JOIN (SELECT src AS id, CAST(count(*) AS DOUBLE) AS d
         |                              FROM e GROUP BY src) o ON verts.id = o.id),
         |r0 AS (SELECT id, 1.0 / n.n AS r FROM verts, n)""".stripMargin
    val iters = (1 to k).map { i =>
      s"""s$i AS (SELECT sum(r${i - 1}.r) AS m FROM r${i - 1}
         |        JOIN deg ON deg.id = r${i - 1}.id AND deg.sink),
         |c$i AS (SELECT e.dst AS id, sum(r${i - 1}.r / deg.d) AS c
         |        FROM e JOIN r${i - 1} ON r${i - 1}.id = e.src
         |        JOIN deg ON deg.id = e.src GROUP BY e.dst),
         |r$i AS (SELECT verts.id,
         |        0.15 / n.n + 0.85 * COALESCE(s$i.m, 0) / n.n + 0.85 * COALESCE(c$i.c, 0) AS r
         |        FROM verts CROSS JOIN n CROSS JOIN s$i
         |        LEFT JOIN c$i ON c$i.id = verts.id)""".stripMargin
    }.mkString(",\n")
    s"$prelude,\n$iters\nSELECT id, round(r, 8) AS r FROM r$k"
  }
}
