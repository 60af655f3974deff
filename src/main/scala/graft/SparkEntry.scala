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

  /** Unipartite supplier co-occurrence graph, canonical lo<hi, w=1.
    *
    * The (pk, sk) projection is DISTINCT'd before the quadratic self-join
    * (guide §2.3 "shuffle fewer bytes"): duplicate line items of the same
    * (part, supplier) multiply the join output d× per side without changing
    * the DISTINCT pair set — at sf0.1 the pre-join dedup shrinks the join
    * input ~2× and its output ~4×, and the final distinct over the pair
    * stream shrinks with it. Output rows are identical by construction.
    */
  def edgesSup(spark: SparkSession, dir: String): DataFrame = {
    val l = li(spark, dir).select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .distinct()
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

  /** SQUARE 25×25 nation co-region adjacency (nations sharing a region,
    * self-loops included) — the fixture for square-only ops (mpower:
    * `@GrB/mpower.m` errors on non-square A).
    */
  def nationCoRegion(spark: SparkSession, dir: String): DataFrame = {
    val n = spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey").cast("long").as("k"), col("n_regionkey").as("r"))
    n.as("a").join(n.as("b"), col("a.r") === col("b.r"))
      .select(col("a.k").as("src"), col("b.k").as("dst"), lit(1.0).as("w"))
  }

  private val nationCoRegionSql =
    """SELECT CAST(a.n_nationkey AS BIGINT) AS src,
      |CAST(b.n_nationkey AS BIGINT) AS dst, 1.0 AS w
      |FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey""".stripMargin

  /** Deterministic SPARSE undirected fixture graph over the 0-based
    * supplier ids (the co-supplier graph is near-complete at small SFs —
    * degenerate for neighborhood-overlap ops like LCC / link prediction):
    * each vertex i gets edges to (2i+1)%N, (3i+7)%N, (7i+11)%N, canonical
    * lo<hi, distinct, no self-loops. 264 edges / 100 vertices / degrees
    * 3-7 / 11 triangles at sf0.01 — non-degenerate and engine-independent.
    */
  def edgesArith(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey").cast("long").as("i"))
    val n = s.count()
    val e0 = s.select(col("i").as("u"), ((col("i") * 2 + 1) % n).as("v"))
      .unionByName(s.select(col("i").as("u"), ((col("i") * 3 + 7) % n).as("v")))
      .unionByName(s.select(col("i").as("u"), ((col("i") * 7 + 11) % n).as("v")))
    e0.filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("src"),
        greatest(col("u"), col("v")).as("dst")).distinct()
      .withColumn("w", lit(1.0))
  }

  /** [[edgesArith]] with deterministic INTEGER weights ((7·src+13·dst) mod
    * 97 + 1, exact in FP64 and in DuckDB's BIGINT arithmetic) so
    * weight-sensitive algorithms (MSF) have a non-trivial, engine-
    * independent input with an exactly mirrorable oracle.
    */
  def edgesArithWeighted(spark: SparkSession, dir: String): DataFrame =
    edgesArith(spark, dir).select(col("src"), col("dst"),
      ((col("src") * 7 + col("dst") * 13) % 97 + 1).cast("double").as("w"))

  /** Disconnected 5-clique on ids 1e6..1e6+4 (every vertex degree exactly
    * 4): unioned into the k-core fixtures so the 4-core is non-empty at
    * every SF (the sf0.001 arith graph's 3-core is already empty).
    */
  private def plantedClique(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (for { a <- 0 until 5; b <- a + 1 until 5 }
      yield (1000000L + a, 1000000L + b, 1.0)).toDF("src", "dst", "w")
  }

  private val plantedCliqueSql = {
    val rows = (for { a <- 0 until 5; b <- a + 1 until 5 }
      yield s"(${1000000 + a}, ${1000000 + b})").mkString(", ")
    s"SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst, 1.0 AS w FROM (VALUES $rows) t(src, dst)"
  }

  /** Directed appendix grafted onto the arithmetic fixture so the bow-tie
    * query exercises classes beyond CORE at every SF: 2000000 feeds vertex 0
    * (IN-side when 0 reaches the giant SCC), 0 feeds 2000001 (OUT-side),
    * 2000002 is a dead-end off 2000000 (tendril), 2000003 bridges
    * 2000000→2000001 bypassing the core (tube), and 2000004⇄2000005 is a
    * detached 2-cycle (DISC). Classification is computed, not assumed — the
    * oracle runs the same closure whatever the arith graph's core is.
    */
  private val plantedBowtiePairs: Seq[(Long, Long)] = Seq(
    (2000000L, 0L), (0L, 2000001L), (2000000L, 2000002L),
    (2000000L, 2000003L), (2000003L, 2000001L),
    (2000004L, 2000005L), (2000005L, 2000004L))

  private def plantedBowtie(spark: SparkSession): DataFrame = {
    import spark.implicits._
    plantedBowtiePairs.toDF("src", "dst")
  }

  private val plantedBowtieSql = {
    val rows = plantedBowtiePairs.map { case (a, b) => s"($a, $b)" }.mkString(", ")
    s"SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst FROM (VALUES $rows) t(src, dst)"
  }

  /** Directed variant of the arithmetic fixture (no canonicalization): the
    * three residue maps give out-degree ≤3 per vertex and long cycles, so
    * the graph has a non-trivial SCC structure (sf0.01: one 80-vertex giant
    * SCC + one of 20 — verified against the transitive-closure oracle).
    */
  def edgesArithDirected(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey").cast("long").as("i"))
    val n = s.count()
    val e0 = s.select(col("i").as("src"), ((col("i") * 2 + 1) % n).as("dst"))
      .unionByName(s.select(col("i").as("src"), ((col("i") * 3 + 7) % n).as("dst")))
      .unionByName(s.select(col("i").as("src"), ((col("i") * 7 + 11) % n).as("dst")))
    e0.filter(col("src") =!= col("dst")).distinct()
  }

  /** Shared DuckDB replay of `Corpus.synthesizeArith(500)` →
    * `deriveEdgesNamed`: a CTE list `base, tgt, named` where `named` has one
    * row per resolved import occurrence (pre-grouping). Names are injective
    * in the file index, so the name self-loop filter equals `i <> t`.
    */
  private val corpusNamedCte =
    """base AS (SELECT range AS i FROM range(0, 500)),
      |tgt AS (
      |  SELECT b.i,
      |    CASE WHEN ((b.i+1)*48271 + (kk.k+1)*7919) % 1000003 % 4 = 0
      |      THEN ((b.i+1)*48271 + (kk.k+1)*7919) % 1000003 % greatest(1, b.i // 16 + 1)
      |      ELSE ((b.i+1)*48271 + (kk.k+1)*7919) % 1000003 % 500 END AS t
      |  FROM base b CROSS JOIN (SELECT range AS k FROM range(0, 4)) kk),
      |named AS (
      |  SELECT
      |    'org' || CAST((i % 13) % 7 AS VARCHAR) || '/repo' || CAST(i % 13 AS VARCHAR) AS src_repo,
      |    'src/f' || CAST(i // 13 AS VARCHAR) || '.' || (['scala','c','py','go','rs'])[(i % 5) + 1] AS src_path,
      |    'org' || CAST((t % 13) % 7 AS VARCHAR) || '/repo' || CAST(t % 13 AS VARCHAR) AS dst_repo,
      |    'src/f' || CAST(t // 13 AS VARCHAR) || '.' || (['scala','c','py','go','rs'])[(t % 5) + 1] AS dst_path
      |  FROM tgt WHERE i <> t)""".stripMargin

  private val edgesArithDirSql =
    """SELECT DISTINCT u AS src, v AS dst FROM (
      |  WITH s AS (SELECT CAST(s_suppkey AS BIGINT) AS i FROM supplier),
      |  nn AS (SELECT count(*) AS n FROM s)
      |  SELECT i AS u, (2*i+1) % nn.n AS v FROM s, nn
      |  UNION ALL SELECT i, (3*i+7) % nn.n FROM s, nn
      |  UNION ALL SELECT i, (7*i+11) % nn.n FROM s, nn
      |) WHERE u <> v""".stripMargin

  private val edgesArithSql =
    """SELECT DISTINCT least(u,v) AS src, greatest(u,v) AS dst, 1.0 AS w FROM (
      |  WITH s AS (SELECT CAST(s_suppkey AS BIGINT) AS i FROM supplier),
      |  nn AS (SELECT count(*) AS n FROM s)
      |  SELECT i AS u, (2*i+1) % nn.n AS v FROM s, nn
      |  UNION ALL SELECT i, (3*i+7) % nn.n FROM s, nn
      |  UNION ALL SELECT i, (7*i+11) % nn.n FROM s, nn
      |) WHERE u <> v""".stripMargin

  /** BPE merge schedules are deterministic in (data dir, k) and k-row-sized;
    * memoize so text_bpe_train and text_bpe_apply share ONE training run. */
  private val bpeMemo = scala.collection.concurrent.TrieMap
    .empty[(String, Int), Seq[(Int, String, String, Long)]]
  private def bpeSchedule(s: SparkSession, dir: String, k: Int) =
    bpeMemo.getOrElseUpdate((dir, k), Bpe.trainMerges(s, docs(s, dir), k))

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  private def embs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Shared scored table for the eval_* queries: an integer-exact signed
    * Lehmer fold over the int8-quantized embedding codes as the score,
    * label==0 as the positive class — every engine reproduces it exactly.
    */
  private def int8FoldScored(s: SparkSession, d: String): DataFrame = {
    val q = Similarity.quantizeInt8(embs(s, d))
    q.select(col("vec_id"), posexplode(col("qvec")).as(Seq("p", "x")))
      .withColumn("sgn",
        when(((col("p") + 1) * 48271L % 1000003L) % 2L === 0L, 1L).otherwise(-1L))
      .groupBy("vec_id").agg(sum(col("x") * col("sgn")).as("score"))
      .join(embs(s, d).select(col("vec_id"), (col("label") === 0).as("positive")),
        Seq("vec_id"))
  }

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

    // §2.5 GrB_Col_extract + row twin: single-column/row vectors (ids exist
    // at every SF: supplier/part key spaces start at 0)
    "gb_col_extract" -> ((s, d) =>
      GBMatrix(edgesBi(s, d)).extractCol(PartOffset + 7)),
    "gb_row_extract" -> ((s, d) => GBMatrix(edgesBi(s, d)).extractRow(7)),

    // §2.5 extract with EXPLICIT index lists (incl. a duplicated index —
    // duplicates duplicate rows, GraphBLAS.h:4991 / GB_subref.c semantics)
    "gb_extract_index" -> ((s, d) =>
      GBMatrix(edgesBi(s, d)).extractIndex(
        Seq(7L, 3L, 21L, 3L, 50L, 11L),
        Seq(PartOffset + 5, PartOffset + 40, PartOffset + 17, PartOffset + 200,
          PartOffset + 1, PartOffset + 333, PartOffset + 77)).df),

    // §2.5 extract with STRIDED ranges (GxB_STRIDE) — i = 2:3:50 — and a
    // BACKWARDS column range (GxB_BACKWARDS) — j = hi:-7:lo
    "gb_extract_stride" -> ((s, d) =>
      GBMatrix(edgesBi(s, d)).extractStride(
        2, 50, 3, PartOffset + 500, PartOffset + 1, -7).df),

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

    // §2.2 vxm: w' = u'·A (the frontier-push direction), plus-times
    "gb_vxm" -> ((s, d) => {
      val m = GBMatrix(edgesBi(s, d))
      val u = m.reduceRows(Monoid.Plus) // out-weight vector over suppliers
      m.vxm(u, Semiring.PlusTimes).withColumnRenamed("v", "y")
    }),
    // the generic salting API for one-shot products (two-phase semiring agg;
    // integral weights keep the regrouped sums exact, so the vxm oracle
    // applies verbatim)
    "gb_vxm_salted" -> ((s, d) => {
      val m = GBMatrix(edgesBi(s, d))
      val u = m.reduceRows(Monoid.Plus)
      m.vxmSalted(u, Semiring.PlusTimes, salts = 16).withColumnRenamed("v", "y")
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
    // same product through the dot3 (mask-first) method on a SPARSE mask —
    // work is Sum over mask entries of deg(src), not the full pair product
    "gb_mxm_masked_dot3" -> ((s, d) => {
      val a = GBMatrix(edgesBi(s, d))
      val mask = GBMatrix(edgesSup(s, d).filter(col("src") < 20))
      a.mxm(a.transpose, Semiring.PlusPair, Some(mask), Desc(dot3 = true))
        .df.withColumnRenamed("w", "shared")
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

    // §2.6 argmax / argmin per row (deterministic tie-break)
    "gb_argmax" -> ((s, d) => GBMatrix(edgesBi(s, d)).argmaxRows),
    "gb_argmin" -> ((s, d) => GBMatrix(edgesBi(s, d)).argminRows),

    // §2.1 batched setElement: upserts overwrite existing entries (implied
    // SECOND accum, GB_setElement.c) and insert new ones in one merge
    "gb_set_elements" -> ((s, d) => {
      val m = GBMatrix(edgesBi(s, d))
      m.setElements(GBMatrix(nationAdj(s, d)).offsetBy(1, PartOffset + 1).df).df
    }),

    // §2.1 batched removeElement (bulk zombie sweep): drop heavy entries
    "gb_remove_elements" -> ((s, d) => {
      val m = GBMatrix(edgesBi(s, d))
      m.removeElements(m.df.filter(col("w") >= 4.0)).df
    }),

    // @GrB/isequal.m as a first-class op: pattern+value equality
    "gb_isequal" -> ((s, d) => {
      import s.implicits._
      val m = GBMatrix(edgesBi(s, d))
      Seq((m.isequal(m.apply((_, _, w) => w * 1.0)),
        m.isequal(m.assignScalar((_, _, w) => w > 3.0, 3.0))))
        .toDF("eq_self", "eq_clamped")
    }),

    // @GrB/random.m sprand: deterministic hash-positioned sparse random
    // (engine-internal hashing — rows-only check; differential-tested)
    "gb_random" -> ((s, _) =>
      GBMatrix.random(s, 1000, 1000, 0.01, seed = 7L).df
        .select(col("src"), col("dst"), round(col("w"), 6).as("w"))),

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

    // §2.1 dup + resize (GrB_Matrix_dup GraphBLAS.h:3320, GrB_Matrix_resize
    // :5543): duplicate — for an immutable Dataset a deep copy IS the value,
    // taken here as a fresh wrapper — then shrink the dims, keeping the
    // surviving triplets
    "gb_dup_resize" -> ((s, d) => {
      val dupOf = GBMatrix(GBMatrix(nationAdj(s, d)).df)
      dupOf.resize(20, 12).df
    }),

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

    // §2.5 GrB_Row_assign: replace supplier 7's row by the part in-degree
    // vector (row entries not covered by u are deleted; other rows untouched)
    "gb_assign_row" -> ((s, d) => {
      val m = GBMatrix(edgesBi(s, d))
      m.assignRow(7L, m.reduceCols(Monoid.Plus)).df
    }),

    // §2.5 GrB_Col_assign: replace one part's column by supplier out-weights
    "gb_assign_col" -> ((s, d) => {
      val m = GBMatrix(edgesBi(s, d))
      m.assignCol(PartOffset + 7, m.reduceRows(Monoid.Plus)).df
    }),

    // §2.5 GxB_subassign with a SUBMATRIX-scoped structural mask
    // (the assign-vs-subassign mask-scope distinction, GB_assign.c:28-30)
    "gb_subassign_masked" -> ((s, d) => {
      val c = GBMatrix(edgesBi(s, d))
      val a = GBMatrix(nationAdj(s, d)).apply((_, _, w) => w * 5.0)
      val mask = GBMatrix(nationAdj(s, d)).select((i, _, _) => i % 2 === 0)
      c.subassignRange(a, 1L, 32L, PartOffset + 1, PartOffset + 32, mask).df
    }),

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
        .select(col("src"), col("dst"), round(col("w"), 6).as("w"))
    }),

    // §2.7 sort within rows: top-3 heaviest entries per supplier
    "gb_sort_topk" -> ((s, d) =>
      GBMatrix(edgesBi(s, d)).sortRows(ascending = false).filter(col("k") <= 3)),
    // GxB_Matrix_sort's explicit permutation output P: P(i,k) = original
    // column of row i's k-th ranked value (GraphBLAS.h:10932-10941)
    "gb_sort_perm" -> ((s, d) =>
      GBMatrix(edgesBi(s, d)).sortRowsFull(ascending = true)._2.df),
    // §2.7 sort by an ARBITRARY key (GxB sort's user lt-op): rank by
    // distance from 50 — an order no asc/desc value sort produces
    "gb_sort_by" -> ((s, d) =>
      GBMatrix(edgesBi(s, d)).sortRowsBy(w => abs(w - 50.0))
        .select(col("src"), col("dst"), col("k").cast("int").as("k"))),
    // the special-function unary tail (GxB_TGAMMA/LGAMMA/ERF/ERFC) through
    // the engine's own codegen'd Catalyst Expressions, oracle'd against
    // DuckDB's gamma/lgamma; erf+erfc is pinned by its identity (= 1)
    "gb_apply_special" -> ((s, d) => {
      val ops = graft.core.Ops.unary
      GBMatrix(edgesBi(s, d)).df.select(col("src"), col("dst"),
        round(ops("lgamma")(col("w")), 6).as("lg"),
        round(ops("gamma")(col("w") / 2.0), 6).as("g"),
        round(ops("erf")(col("w") / 10.0) + ops("erfc")(col("w") / 10.0), 6).as("erf_id"))
    }),

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

    // §2.10 WEIGHTED PageRank (pagerank.m:74-85 +.* semiring), 5 iterations
    "algo_pagerank5w" -> ((s, d) =>
      PageRank.runFixed(s, edgesBi(s, d), k = 5, weighted = true)
        .select(col("id"), round(col("r"), 8).as("r"))),

    // §2.10 PageRank to convergence at 1e-6 (flagship; no SQL equivalent)
    "algo_pagerank" -> ((s, d) => {
      val res = PageRank.run(s, edgesBi(s, d), tol = 1e-6, maxIter = 100)
      res.ranks.select(col("id"), round(col("r"), 8).as("r"))
    }),

    // the convergence OBSERVABLE of the flagship run: iterations to
    // ||Δr||∞ < 1e-6. Deterministic at any parallelism (the crossing sits
    // 22% from the threshold at sf0.01 — far beyond fp-reorder noise), so
    // the driver can pin it against the mimic-derived constant
    "algo_pagerank_iters" -> ((s, d) => {
      import s.implicits._
      Seq(PageRank.run(s, edgesBi(s, d), tol = 1e-6, maxIter = 100)
        .iterations.toLong).toDF("iters")
    }),

    // beyond §2: batched Brandes betweenness (the LAGraph surface the
    // reference defers to — Demo/DO_NOT_BENCHMARK.txt) on a 25-vertex path,
    // whose exact BC has the closed form i·(n−1−i); general graphs are
    // differential-tested against brute-force Brandes in Round4Spec
    "algo_betweenness" -> ((s, d) => {
      val n = s.read.parquet(s"$d/nation.parquet")
        .select(col("n_nationkey").cast("long").as("k"))
      val path = n.filter(col("k") < 24)
        .select(col("k").as("src"), (col("k") + 1L).as("dst"))
      Betweenness.run(s, path).select(col("id"), round(col("bc"), 6).as("bc"))
    }),

    // Girvan–Newman EDGE betweenness on the same closed-form path fixture:
    // edge (i, i+1) carries the (i+1)·(24−i) crossing pairs
    "algo_edge_betweenness" -> ((s, d) => {
      val n = s.read.parquet(s"$d/nation.parquet")
        .select(col("n_nationkey").cast("long").as("k"))
      val path = n.filter(col("k") < 24)
        .select(col("k").as("src"), (col("k") + 1L).as("dst"))
      Betweenness.runEdges(s, path)
        .select(col("u"), col("v"), round(col("ebc"), 6).as("ebc"))
    }),

    // Brandes-Pich pivot-sampled BC estimate (the scale path: |S| sources
    // instead of n, extrapolated by n/|S|) on the same closed-form fixture
    "algo_betweenness_est" -> ((s, d) => {
      val n = s.read.parquet(s"$d/nation.parquet")
        .select(col("n_nationkey").cast("long").as("k"))
      val path = n.filter(col("k") < 24)
        .select(col("k").as("src"), (col("k") + 1L).as("dst"))
      Betweenness.run(s, path, sources = Seq(0L, 5L, 10L, 15L, 20L))
        .select(col("id"), round(col("bc") * 5.0, 6).as("bc_est"))
    }),

    // §2.10 connected components (min-label propagation to fixpoint)
    "algo_cc" -> ((s, d) => ConnectedComponents.run(s, edgesSup(s, d))),

    // §2.10 connected components, FastSV (hook+shortcut, O(log n) rounds —
    // the high-diameter web-graph path); exact same (id, min-id) output
    "algo_cc_fastsv" -> ((s, d) =>
      ConnectedComponents.run(s, edgesSup(s, d), fastsv = true)),

    // incremental components for a crawl delta: solve ~90% of the edges as
    // the "existing" corpus, absorb the deterministic-coin 10% as the delta
    // via label contraction — must equal the batch answer (the oracle)
    "algo_cc_delta" -> ((s, d) => {
      val e = edgesSup(s, d)
      val M = 1000003L
      val coin = (((col("src") % M) * 48271L + 11L) % M
        * (((col("dst") % M) * 7919L + 7L) % M)) % M % 10L
      ConnectedComponents.incremental(s,
        ConnectedComponents.run(s, e.filter(coin =!= 0L)),
        e.filter(coin === 0L))
    }),

    // §2.10 BFS levels + parents (any-pair frontier, min-determinized
    // any.first parent per bfs.m:149-167) from the min supplier
    "algo_bfs" -> ((s, d) => {
      val e = edgesSup(s, d)
      val und = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst"),
        col("w")))
      BFS.run(s, und, source = 1L).select(col("id"), col("level"), col("parent"))
    }),

    // double-sweep BFS diameter lower bound (Magnien-Latapy-Habib) on the
    // same undirected supplier graph — two O(m) BFS passes, O(1) driver state
    "algo_diameter" -> ((s, d) =>
      GraphStats.doubleSweepDiameter(s, edgesSup(s, d), seed = 1L)),

    // §2.9 min-plus semiring: hop-count SSSP on the directed bipartite graph
    "algo_sssp" -> ((s, d) => {
      val e = edgesBi(s, d).withColumn("w", lit(1.0))
      SSSP.run(s, e, source = 1L)
    }),

    // §2.9 min-plus over SIGNED weights (Bellman-Ford, 8 synchronous
    // rounds — the case SSSP's nonneg-only delta frontier excludes):
    // w = (3·src+5·dst) mod 7 + pot(src) − pot(dst), pot(v) = 13·v mod 17.
    // Negative edges everywhere, but the potential terms telescope away on
    // any cycle, so no negative cycle exists and the fixpoint is finite
    "algo_bellman8" -> ((s, d) => {
      val e = edgesArithDirected(s, d).select(col("src"), col("dst"),
        ((col("src") * 3 + col("dst") * 5) % 7
          + (col("src") * 13) % 17 - (col("dst") * 13) % 17).as("w"))
      BellmanFord.runFixed(s, e, source = 1L, k = 8)
    }),

    // §2.10 label propagation communities (deterministic min tie-break)
    "algo_labelprop" -> ((s, d) => LabelPropagation.run(s, edgesSup(s, d), maxIter = 20)),

    // §2.10 label propagation, 5 fixed rounds (SQL-oracle-checkable unrolled
    // form, like algo_pagerank5)
    "algo_labelprop5" -> ((s, d) => LabelPropagation.runFixed(s, edgesSup(s, d), k = 5)),

    // §2.10 k-truss (k=4) on the co-supplier graph
    "algo_ktruss" -> ((s, d) => KTruss.run(s, edgesSup(s, d), k = 4)),

    // §2.10 k-truss, 3 fixed rounds (SQL-oracle-checkable unrolled form)
    "algo_ktruss3" -> ((s, d) => KTruss.runFixed(s, edgesSup(s, d), k = 4, rounds = 3)),

    // §2.10 maximal independent set (Luby, deterministic hash scores)
    "algo_mis" -> ((s, d) => MIS.run(s, edgesSup(s, d))),

    // LAGraph layer: per-vertex local clustering coefficient on the sparse
    // arithmetic fixture (the co-supplier graph is near-complete — lcc≡1)
    "algo_lcc" -> ((s, d) =>
      ClusteringCoefficient.run(s, edgesArith(s, d))
        .select(col("id"), col("deg"), col("tri"), round(col("lcc"), 8).as("lcc"))),

    // LAGraph layer: neighborhood-overlap link prediction (common
    // neighbors / Jaccard / Adamic-Adar over non-adjacent pairs)
    "algo_linkpred" -> ((s, d) =>
      LinkPrediction.run(s, edgesArith(s, d))
        .select(col("a"), col("b"), col("common"),
          round(col("jaccard"), 8).as("jaccard"),
          round(col("adamic_adar"), 8).as("adamic_adar"))),

    // LAGraph layer: k-core (k=4) peel to fixpoint; a disconnected planted
    // 5-clique (every vertex degree exactly 4) keeps the 4-core non-empty
    // at every SF while the arith part exercises real peeling at sf0.01
    "algo_kcore4" -> ((s, d) =>
      KCore.run(s, edgesArith(s, d).unionByName(plantedClique(s)), k = 4)),

    // LAGraph layer: full coreness decomposition (peel levels)
    "algo_coreness" -> ((s, d) =>
      KCore.coreness(s, edgesArith(s, d).unionByName(plantedClique(s)))),

    // LAGraph layer: full truss decomposition (edge-level peel; the planted
    // 5-clique pins a non-trivial max trussness of 5 at every SF)
    "algo_trussness" -> ((s, d) =>
      KTruss.trussness(s, edgesArith(s, d).unionByName(plantedClique(s)))),

    // LAGraph layer: HITS hubs/authorities, 5 fixed L1-normalized
    // iterations on the directed bipartite graph (SQL-unrollable form)
    "algo_hits5" -> ((s, d) =>
      HITS.runFixed(s, edgesBi(s, d), k = 5)
        .select(col("id"), round(col("hub"), 8).as("hub"),
          round(col("auth"), 8).as("auth"))),

    // §2.10 PERSONALIZED PageRank: teleport + sink mass concentrated on a
    // 3-seed watchlist, 5 fixed iterations (SQL-unrollable form)
    "algo_ppr5" -> ((s, d) =>
      PageRank.runFixed(s, edgesBi(s, d), k = 5, seeds = Seq(1L, 3L, 7L))
        .select(col("id"), round(col("r"), 8).as("r"))),

    // BATCHED multi-persona PPR (N-RHS SpMM): three personas advance in one
    // loop — the adjacency is scanned once per round, state is the sparse
    // (pid, id, r) table. Nonzero support only; rounded like algo_ppr5
    "algo_ppr_multi" -> ((s, d) =>
      PageRank.pprMulti(s, edgesBi(s, d),
        personas = Seq(1L -> Seq(1L, 3L), 2L -> Seq(7L), 3L -> Seq(2L, 5L)), k = 5)
        .select(col("pid"), col("id"), round(col("r"), 8).as("r"))
        // drop support that rounds to zero — the oracle's WHERE r <> 0
        // filters the same ROUNDED value, so the cut is identical
        .filter(col("r") =!= 0.0)),

    // training-pipeline sampling: deterministic Lehmer-slot random walks
    // (DeepWalk-style corpus generation, bit-reproducible in any engine)
    "algo_randomwalk" -> ((s, d) => {
      val starts = edgesArith(s, d)
      val verts = starts.select(col("src").as("id"))
        .unionByName(starts.select(col("dst").as("id"))).distinct()
        .filter(col("id") % 10 === 0)
      RandomWalk.run(s, starts, verts, steps = 4)
    }),

    // node2vec SECOND-ORDER biased walks (p=2, q=1/2 as integer weights
    // 1/2/4), same Lehmer slots — window prefix-sum oracle replays them
    "algo_node2vec" -> ((s, d) => {
      val e = edgesArith(s, d)
      val verts = e.select(col("src").as("id"))
        .unionByName(e.select(col("dst").as("id"))).distinct()
        .filter(col("id") % 10 === 0)
      Node2Vec.run(s, e, verts, steps = 4)
    }),

    // MAX-MIN (bottleneck) semiring: single-source widest path over the
    // undirected integer-weighted fixture; finite-closure recursive oracle
    "algo_widest" -> ((s, d) => {
      val e = edgesArithWeighted(s, d)
      WidestPath.run(s, e.unionByName(
        e.select(col("dst").as("src"), col("src").as("dst"), col("w"))), source = 0L)
    }),

    // one-row structural graph profile (n, m, degree stats, wedges,
    // triangles, global clustering coefficient)
    "gb_graph_stats" -> ((s, d) =>
      GraphStats.run(s, edgesArith(s, d))
        .select(col("n"), col("m"), col("min_deg"), col("max_deg"),
          round(col("avg_deg"), 8).as("avg_deg"),
          round(col("density"), 8).as("density"),
          col("wedges"), col("triangles"),
          round(col("global_cc"), 8).as("global_cc"))),

    // web-graph bowtie: strongly connected components of the DIRECTED
    // arithmetic fixture (trim + forward-max coloring + backward sweep;
    // exact min-member labels vs a transitive-closure oracle)
    "algo_scc" -> ((s, d) => SCC.run(s, edgesArithDirected(s, d))),

    // Newman modularity of the (id % 5) labeling — integer-exact aggregates,
    // one mirrored float expression
    "gb_modularity" -> ((s, d) => {
      val e = edgesArith(s, d)
      val verts = e.select(col("src").as("id"))
        .unionByName(e.select(col("dst").as("id"))).distinct()
      GraphStats.modularity(s, e, verts.select(col("id"), (col("id") % 5).as("label")))
        .select(col("m"), col("communities"), col("intra_edges"),
          round(col("modularity"), 8).as("modularity"))
    }),

    // degree assortativity (Pearson r over the directed pair list) —
    // decimal-exact moment sums, mirrored final expression
    "gb_assortativity" -> ((s, d) =>
      GraphStats.assortativity(s, edgesArith(s, d))
        .select(col("pairs"), round(col("assortativity"), 8).as("assortativity"))),

    // degree-distribution power-law exponent (CSN discrete MLE, dmin=2) —
    // the estimator the R-MAT generator's skew calibrates against
    "gb_powerlaw_alpha" -> ((s, d) =>
      GraphStats.powerLawAlpha(s, edgesArith(s, d), dmin = 2L)),

    // exact hop plot (distance histogram over all reachable ordered pairs)
    // — the exact twin of the ANF sketch's neighborhood function
    "gb_hopplot" -> ((s, d) =>
      GraphStats.hopPlot(s, edgesArith(s, d))),

    // effective diameter d90 + true diameter off the hop plot — the pct
    // selection is exact integer arithmetic (100·cum ≥ 90·total)
    "gb_eff_diameter" -> ((s, d) =>
      GraphStats.effectiveDiameter(s, edgesArith(s, d), pct = 90)),

    // hub-removal percolation curve (targeted-attack robustness): giant
    // component / components / singletons after deleting the top-p% hubs
    "gb_percolation" -> ((s, d) =>
      GraphStats.percolation(s, edgesArith(s, d), pcts = Seq(0, 5, 10, 20))),

    // 2-hop ego network around vertex 0: induced subgraph of the ball
    // (neighborhood feature-extraction primitive; unrolled-hop oracle)
    "gb_egonet" -> ((s, d) =>
      GraphStats.egoNet(s, edgesArith(s, d), seeds = Seq(0L), hops = 2)),

    // per-community conductance of the id%5 labeling (cut-quality metric;
    // exact integer vol/cut, one mirrored division)
    "gb_conductance" -> ((s, d) => {
      val e = edgesArith(s, d)
      val verts = e.select(col("src").as("id"))
        .unionByName(e.select(col("dst").as("id"))).distinct()
      GraphStats.conductance(s, e,
        verts.select(col("id"), (col("id") % 5).as("label")))
        .select(col("label"), col("vol"), col("cut"),
          round(col("conductance"), 8).as("conductance"))
    }),

    // ACL sweep cut: conductance profile of the degree-descending ordering
    // (the local-clustering certificate scan; integral scores keep every
    // prefix statistic an exact integer). rangeSize=64 forces the sf0.01
    // run through MULTIPLE ranges of the two-level prefix scan
    "algo_sweep" -> ((s, d) => {
      val e = edgesArith(s, d)
      val deg = e.select(col("src").as("id")).unionByName(e.select(col("dst").as("id")))
        .groupBy("id").agg(count(lit(1)).as("score"))
      GraphStats.sweepCut(s, e, deg, rangeSize = 64)
        .select(col("pos"), col("id"), col("score"), col("vol"), col("cut"),
          round(col("conductance"), 8).as("conductance"))
    }),

    // 1-WL color refinement, 3 exact rounds (arithmetic multiset combiner
    // mod the largest prime < 2^31 — engine-independent colors)
    "algo_wl_refine" -> ((s, d) =>
      WLRefinement.run(s, edgesArith(s, d), maxRounds = 3, earlyExit = false)),

    // batched multi-source BFS: 64 traversals share one frontier via a
    // 64-bit mask + bit_or semiring (exact hop counts from 3 seeds)
    "algo_msbfs" -> ((s, d) =>
      MSBFS.run(s, edgesArithDirected(s, d), Seq(1L, 3L, 7L))),

    // bowtie skeleton: SCC condensation DAG + longest-path topological
    // level per component (max-plus fixpoint, rounds = DAG depth)
    "algo_condensation" -> ((s, d) =>
      SCC.condense(s, edgesArithDirected(s, d))),

    // full Broder bow-tie decomposition (CORE/IN/OUT/TUBE/TENDRIL/DISC) of
    // the directed fixture + a planted appendix covering the non-core
    // classes; transitive-closure oracle
    "algo_bowtie" -> ((s, d) =>
      Bowtie.run(s, edgesArithDirected(s, d)
        .unionByName(plantedBowtie(s)))),

    // TrustRank + relative spam mass: teleport biased onto the id%10==0
    // trusted set (a PREDICATE, not a watchlist literal); mass computed
    // from 8-dp-rounded pr/tr identically on both sides
    "algo_spam_mass" -> ((s, d) =>
      TrustRank.spamMass(s, edgesBi(s, d), k = 5,
        trusted = col("id") % 10 === 0)),

    // Anti-TrustRank: spam score propagated BACKWARD from the id%7==3
    // known-spam set (reversed-edge TrustRank; completes the spam triad)
    "algo_antitrust5" -> ((s, d) =>
      TrustRank.antiTrust(s, edgesBi(s, d), k = 5,
        spam = col("id") % 7 === 3)
        .select(col("id"), round(col("r"), 8).as("atr"))),

    // multi-level Louvain communities (integer-exact ΔQ, deterministic).
    // No SQL oracle — a two-level data-dependent fixpoint; differential-
    // tested on ring-of-cliques/known-Q fixtures in Round4LinkSpec. Small
    // partition count: the fixture is 100 vertices (the algorithm takes
    // numPartitions for real graphs)
    "algo_louvain" -> ((s, d) =>
      Louvain.run(s, edgesArith(s, d), numPartitions = 8)),
    // level-1 move phase alone with a fixed round budget — SQL-replayable
    // (quiet rounds are the identity, so fixed-k unrolling == early stop):
    // the oracle-green twin of the multi-level algo_louvain
    "algo_louvain_l1" -> ((s, d) =>
      Louvain.level1(s, edgesArith(s, d), rounds = 6, numPartitions = 8)),

    // eigenvector centrality — fixed-k power iteration, L1-renormalized
    "algo_eigen5" -> ((s, d) =>
      Eigenvector.runFixed(s, edgesArith(s, d), k = 5)
        .select(col("id"), round(col("eig"), 8).as("eig"))),

    // Fiedler vector (spectral bisection) — deflated power iteration on
    // σI − L, fixed k=8, sign-fixed at the min id
    "algo_fiedler8" -> ((s, d) =>
      Fiedler.runFixed(s, edgesArith(s, d), k = 8)
        .select(col("id"), round(col("f"), 6).as("f"))),

    // bipartiteness / odd-cycle certificate — BFS-parity 2-coloring via a
    // lexicographic (comp, dist) min-label fixpoint
    "algo_bipartite" -> ((s, d) => Bipartite.run(s, edgesArith(s, d))),

    // truncated hitting time E[min(T_S, 6)] to trusted seeds {1,3,7}
    // (the distance companion of TrustRank's mass propagation)
    "algo_hitting6" -> ((s, d) =>
      HittingTime.runFixed(s, edgesArith(s, d), seeds = Seq(1L, 3L, 7L), k = 6)
        .select(col("id"), round(col("h"), 6).as("h"))),

    // densest-subgraph peel (Bahmani 2(1+ε)-approx, ε=1/2 → exact integer
    // peel test): per-round (n, m, density) — the link-farm detector
    "algo_densest" -> ((s, d) =>
      DensestSubgraph.peel(s, edgesArith(s, d), rounds = 12)),

    // in/out degree distribution of the directed fixture (power-law view)
    "gb_degree_hist" -> ((s, d) =>
      GraphStats.degreeHistogram(s, edgesArithDirected(s, d))),

    // transitive reduction (minimal equivalent graph) of the dependency
    // DAG: arith edges kept only where src < dst (strictly increasing =>
    // acyclic) — the "prune redundant imports" op
    "algo_transreduce" -> ((s, d) =>
      TransitiveReduction.run(s,
        edgesArithDirected(s, d).filter(col("src") < col("dst")))),

    // topological layering of the same dependency DAG: layer = longest
    // path from a source ((max,+) level), ord = rank by (layer, id) — a
    // concrete deterministic linearization / parallel schedule
    "algo_toposort" -> ((s, d) =>
      Toposort.run(s, edgesArithDirected(s, d).filter(col("src") < col("dst")))),

    // earliest-arrival time-respecting reachability from vertex 0 over the
    // directed arith graph with deterministic edge timestamps
    // ts = (37·src + 53·dst) mod 16 — paths must strictly increase in ts
    "algo_temporal" -> ((s, d) =>
      TemporalReach.run(s, edgesArithDirected(s, d)
        .withColumn("ts", (col("src") * 37L + col("dst") * 53L) % 16L),
        source = 0L)),

    // Holland-Leinhardt 16-class directed triad census (Batagelj-Mrvar
    // wedge enumeration + exact dyad corrections; Σ cnt = C(n,3))
    "algo_triad_census" -> ((s, d) =>
      TriadCensus.run(s, edgesArithDirected(s, d))),

    // co-citation (AᵀA off-diag) / bibliographic coupling (AAᵀ off-diag)
    "algo_cocitation" -> ((s, d) =>
      CoCitation.cocitation(s, edgesArithDirected(s, d))),
    "algo_bibcoupling" -> ((s, d) =>
      CoCitation.coupling(s, edgesArithDirected(s, d))),

    // bipartite butterfly (4-cycle) count over the supplier→part graph
    "gb_butterfly" -> ((s, d) => CoCitation.butterflies(s, edgesBi(s, d))),

    // per-vertex K4 participation (ordered triangle extension; the planted
    // 5-clique pins C(4,3)=4 per member at every SF)
    "gb_4cliques" -> ((s, d) =>
      CliqueCount.fourCliques(s,
        edgesArith(s, d).unionByName(plantedClique(s)))),

    // DOULION sampled triangle estimate at p=1/2 (deterministic arithmetic
    // coin — the tunable-cost census path; same sample in any engine)
    "algo_tricount_est" -> ((s, d) =>
      TriangleCount.estimate(s, edgesSup(s, d), invP = 2)),

    // SALSA — degree-normalized hub/authority walk (stochastic HITS)
    "algo_salsa5" -> ((s, d) =>
      SALSA.runFixed(s, edgesArithDirected(s, d), k = 5)
        .select(col("id"), round(col("hub"), 8).as("hub"),
          round(col("auth"), 8).as("auth"))),

    // page→host-style quotient graph: contract by id % 10
    "gb_contract" -> ((s, d) => {
      val e = edgesArithDirected(s, d)
      val verts = e.select(col("src").as("id"))
        .unionByName(e.select(col("dst").as("id"))).distinct()
      GraphStats.contract(s, e, verts.select(col("id"), (col("id") % 10).as("grp")))
    }),

    // Katz centrality, truncated power series (PageRank-shaped loop)
    "algo_katz5" -> ((s, d) =>
      Katz.runFixed(s, edgesArith(s, d), k = 5)
        .select(col("id"), round(col("katz"), 8).as("katz"))),

    // directed-edge mutuality (web/social reciprocity scalar)
    "gb_reciprocity" -> ((s, d) =>
      GraphStats.reciprocity(s, edgesArithDirected(s, d))
        .select(col("m"), col("reciprocal"),
          round(col("reciprocity"), 8).as("reciprocity"))),

    // neighborhood Jaccard per EXISTING edge (LAGraph SimilarityJaccard)
    "algo_edge_jaccard" -> ((s, d) =>
      LinkPrediction.edgeSimilarity(s, edgesArith(s, d))
        .select(col("src"), col("dst"), col("common"),
          round(col("jaccard"), 8).as("jaccard"))),

    // ANF neighborhood function + effective diameter (FM sketches, bit_or
    // semiring; deterministic decimal sums). No SQL oracle — xxhash64
    // sketches are engine-internal; differential-tested against exact N(h)
    // in Round4LinkSpec
    "algo_anf" -> ((s, d) => {
      val e = edgesArith(s, d)
      val both = e.select(col("src"), col("dst"))
        .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      val (df, eff) = ANF.runWithDiameter(s, both, k = 64)
      df.select(col("h"), round(col("nf"), 4).as("nf"),
        round(col("ratio"), 6).as("ratio"), lit(eff.toLong).as("eff_diameter"))
    }),

    // the ANF sketch dynamics under the DuckDB oracle: LCG sketch hashes
    // (SQL re-derivable, like algo_mis_lcg), fixed 4 hops, per-(h, vertex)
    // integer sketch summary rsum = Σ_j lowestZeroBit(FM word)
    "algo_anf_lcg4" -> ((s, d) =>
      ANF.runLcgTrace(s, edgesArithDirected(s, d), k = 16, hops = 4)),

    // Jones-Plassmann greedy coloring (LCG priorities → deterministic AND
    // SQL-mirrorable; run-to-convergence = the unrolled oracle's fixpoint)
    "algo_coloring" -> ((s, d) =>
      Coloring.run(s, edgesArith(s, d)).select(col("id"), col("color"))),

    // Luby-style maximal matching (unique packed edge priorities)
    "algo_matching" -> ((s, d) => Matching.run(s, edgesArith(s, d))),

    // Borůvka minimum spanning forest over deterministic integer weights
    // (strict (w,src,dst) order ⇒ unique forest, mirrored by the unrolled
    // min-edge-hook + path-doubling oracle)
    "algo_boruvka" -> ((s, d) => Boruvka.msf(s, edgesArithWeighted(s, d))),

    // Luby MIS with LCG priorities — same schedule as the unrolled oracle
    // (the hash-score algo_mis stays rows-only; this one is DuckDB-exact)
    "algo_mis_lcg" -> ((s, d) =>
      MIS.runLcg(s, edgesArith(s, d))
        .select(col("id"), col("inSet").cast("long").as("in_set"))),

    // SimRank (3 exact iterations, decimal-exact sums, dyadic C=13/16) —
    // vertex-pair similarity over the directed fixture's in-link structure
    "algo_simrank3" -> ((s, d) =>
      SimRank.runFixed(s, edgesArithDirected(s, d), k = 3)
        .select(col("a"), col("b"), round(col("s"), 6).as("s"))),

    // GraphSAGE-style deterministic neighbor fanout sampling (1- and
    // 2-hop): reproducible GNN minibatch neighborhoods at any parallelism
    "sample_fanout" -> ((s, d) =>
      NeighborSample.fanout(s, edgesArithDirected(s, d), k = 2, seed = 7L)
        .select(col("src"), col("rank").as("rnk"), col("dst"))),
    "sample_fanout2" -> ((s, d) =>
      NeighborSample.fanout2(s, edgesArithDirected(s, d), k1 = 2, k2 = 2,
        seed = 7L)),

    // deterministic link-prediction negative sampling (LCG proposals over
    // the dense-ranked vertex universe, true edges rejected)
    "sample_negatives" -> ((s, d) =>
      NeighborSample.negatives(s, edgesArithDirected(s, d), k = 2, m = 8,
        seed = 7L)),

    // rich-club coefficient per degree threshold (web-graph diagnostic)
    "gb_rich_club" -> ((s, d) => GraphStats.richClub(s, edgesArith(s, d))),

    // exact distance centralities (harmonic/closeness/eccentricity) with
    // ALL vertices as landmarks — ceil(n/64) MSBFS waves, never all-pairs;
    // the vertex set stays distributed (dense-ranked wave membership, only
    // the wave COUNT reaches the driver)
    "algo_centrality" -> ((s, d) =>
      GraphStats.distanceStatsAll(s, edgesArith(s, d))
        .select(col("id"), col("reached"), col("sum_dist"),
          round(col("harmonic"), 8).as("harmonic"),
          round(col("closeness"), 8).as("closeness"), col("ecc"))),

    // north rule: corpus synthesis → edge derivation → PageRank; provenance
    "corpus_edges" -> ((s, _) => {
      val c = Corpus.synthesize(s, 2000)
      Corpus.deriveEdges(c)
    }),
    // the same parse+resolve derivation over the ARITHMETIC-mix corpus —
    // named endpoints, so DuckDB re-derives the identical edge table from
    // the same formulas (the north rule's derivation, oracle-checked)
    "corpus_edges_arith" -> ((s, _) =>
      Corpus.deriveEdgesNamed(Corpus.synthesizeArith(s, 500))),

    // repo-level quotient of the file import graph (cross-repo dependency
    // edges with import multiplicity) — the contraction a crawl rolls up
    "corpus_repo_graph" -> ((s, _) =>
      Corpus.deriveEdgesNamed(Corpus.synthesizeArith(s, 500))
        .filter(col("src_repo") =!= col("dst_repo"))
        .groupBy(col("src_repo"), col("dst_repo"))
        .agg(sum(col("w")).as("w"), count(lit(1)).as("file_pairs"))),

    // license-taint propagation: min reverse-import-hops from every file of
    // the seed repo (copyleft contamination), bounded at depth 20
    "corpus_license_taint" -> ((s, _) =>
      Corpus.licenseTaint(s, Corpus.synthesizeArith(s, 500),
        seedRepo = "org0/repo0")),

    // orphan sweep: files nothing imports (in-degree 0 in the file graph)
    "corpus_dead_files" -> ((s, _) =>
      Corpus.deadFiles(Corpus.synthesizeArith(s, 500))),

    // cyclic dependency groups among repos (SCC of the repo quotient graph)
    "corpus_repo_cycles" -> ((s, _) =>
      Corpus.repoCycles(s, Corpus.synthesizeArith(s, 500))),

    // build schedule over STRONG dependencies (repo pairs with ≥16 import
    // lines — the raw quotient is one giant SCC; thresholding exposes the
    // skeleton): SCC-condensed DAG layered (max,+), cycles build together.
    // At n=500 this yields 9 components over 4 layers with real cycles.
    "corpus_build_layers" -> ((s, _) =>
      Corpus.buildLayers(s, Corpus.synthesizeArith(s, 500), minW = 16L)),

    // ctags-style symbol index: every `def` declaration + definer fan-in
    "corpus_symbol_xref" -> ((s, _) =>
      Corpus.symbolXref(Corpus.synthesizeArith(s, 500))),

    // Martin afferent/efferent coupling + instability per repo
    "corpus_coupling" -> ((s, _) =>
      Corpus.couplingMetrics(Corpus.synthesizeArith(s, 500))),
    "corpus_pagerank" -> ((s, _) => {
      val c = Corpus.synthesize(s, 2000)
      val res = PageRank.run(s, Corpus.deriveEdges(c), tol = 1e-6)
      res.ranks.select(col("id"), round(col("r"), 8).as("r"))
    }),
    "corpus_provenance" -> ((s, _) => {
      import s.implicits._
      val c = Corpus.synthesize(s, 2000)
      // REAL sink roundtrip: write the corpus to the (parquet-as-Iceberg)
      // sink, read it back, verify per-row sha256(content) equality
      val sink = "/tmp/graft_corpus_sink"
      c.write.mode("overwrite").parquet(sink)
      val roundtrip = s.read.parquet(sink)
      val violations = Corpus.provenanceViolations(roundtrip, c).count()
      Seq((2000L, violations)).toDF("rows", "violations")
    }),
    // the oracle-green twin of corpus_provenance: same REAL sink roundtrip,
    // but over the ARITHMETIC corpus and emitting the per-row sha256 itself —
    // DuckDB re-derives the content strings from the same Lehmer formulas and
    // re-computes sha256 INDEPENDENTLY, so the north rule's row-level
    // provenance (sha256(content) equality vs the source table) is checked by
    // an engine-external hasher, row by row
    "corpus_provenance_arith" -> ((s, _) => {
      val c = Corpus.synthesizeArith(s, 500)
      val sink = "/tmp/graft_corpus_sink_arith"
      c.write.mode("overwrite").parquet(sink)
      val rt = s.read.parquet(sink)
      rt.select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
        .join(c.select(col("repo"), col("path"),
          sha2(col("content"), 256).as("s_sha")), Seq("repo", "path"))
        .select(col("repo"), col("path"), col("sha"),
          (col("sha") === col("s_sha")).as("ok"))
    }),
    // lakehouse CDC: diff two deterministic snapshots of the arithmetic
    // corpus by CONTENT sha256 (never commit metadata) — one full-outer
    // hash join of (repo, path, sha) projections; the oracle re-derives
    // every status closed-form from the evolution rules (i%11==5 deleted,
    // i%7==3 modified, [n, n+40) added)
    "corpus_snapshot_diff" -> ((s, _) =>
      Corpus.snapshotDiff(Corpus.synthesizeArith(s, 500),
        Corpus.synthesizeArithV2(s, 500, nNew = 40))),
    // the oracle-green twin of corpus_pagerank: the full north-rule chain
    // corpus -> parse+resolve file edges -> PageRank, over the arithmetic
    // corpus with NAMED (repo/path) string vertices, 2 fixed iterations —
    // DuckDB replays synthesis, edge derivation, AND the rank iterations
    "corpus_pagerank_arith" -> ((s, _) => {
      val e = Corpus.deriveEdgesNamed(Corpus.synthesizeArith(s, 500))
        .select(concat_ws("/", col("src_repo"), col("src_path")).as("src"),
                concat_ws("/", col("dst_repo"), col("dst_path")).as("dst"))
      // +1e-12 before rounding ON BOTH SIDES: this graph's 2-iteration ranks
      // are coarse rationals that land EXACTLY on the 8th-decimal half
      // (e.g. 0.003816875), where Spark (binary-exact HALF_UP) and DuckDB
      // disagree; the nudge moves halves strictly above the boundary for both
      PageRank.runFixed(s, e, k = 2)
        .select(col("id"), round(col("r") + lit(1e-12), 8).as("r"))
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
    // the oracle-green twin of dedup_simhash's fingerprint stage: LCG
    // hyperplane signs over dense-rank token ids, so DuckDB re-derives every
    // 32-bit fingerprint bit for bit (the xxhash64 production variant stays
    // the zero-shuffle scale path)
    "dedup_simhash_lcg" -> ((s, d) => Dedup.simhashLcg(docs(s, d))),
    "dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(docs(s, d), threshold = 0.5)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))),
    // asymmetric doc-in-doc containment |Sa∩Sb|/|Sa| (Broder) — catches
    // quote/boilerplate inclusion that symmetric Jaccard misses
    "dedup_containment" -> ((s, d) =>
      Dedup.containmentPairs(docs(s, d), threshold = 0.8)),
    // exact-tail stage of the dedup cascade: prefix-blocked (capped)
    // candidate pairs scored by true Levenshtein over a 256-char window
    "dedup_edit_verify" -> ((s, d) => Dedup.editVerify(docs(s, d))),
    // the flagship MinHash+LSH path with SQL-re-derivable hashes: DuckDB
    // replays shingle ids -> 32 LCG permutations -> banded fold buckets ->
    // capped candidates -> exact Jaccard, end to end
    "dedup_minhash_lcg" -> ((s, d) =>
      Dedup.minhashNearDupsLcg(docs(s, d), threshold = 0.5)),
    // cluster-representative outputs (linear in cluster size — the scale
    // path for duplicate mega-clusters the pair queries cap away)
    "dedup_exact_clusters" -> ((s, d) => Dedup.exactClusters(docs(s, d))),
    // the one-row integer-exact dedup report (counts + reclaimable bytes)
    "dedup_stats" -> ((s, d) => Dedup.dedupStats(docs(s, d))),
    // per-cluster purity of the exact-integer k-means against the
    // embeddings' ground-truth labels — all-integer majority table
    "eval_purity" -> ((s, d) => {
      val e = embs(s, d)
      val cl = Similarity.kmeansInt8(e, k = 4, steps = 2)
      Eval.purityByCluster(cl,
        e.select(col("vec_id"), col("label").cast("long").as("label")))
    }),
    // per-point simplified silhouette of the exact-integer k-means (exact
    // integer d², fixed per-point IEEE chains — the O(n²) eval baseline)
    "eval_silhouette" -> ((s, d) => {
      val e = embs(s, d)
      val codes = Similarity.quantizeInt8(e)
        .select(col("vec_id"), transform(col("qvec"), _.cast("long")).as("x"))
      Eval.silhouetteInt8(codes, Similarity.kmeansInt8(e, k = 4, steps = 2))
    }),
    // pair-counting agreement (Rand + ARI) between the two LCG near-dup
    // views: identical-SimHash clusters vs MinHash-LSH clusters — exact
    // integer pair sums, fixed IEEE chains, fully SQL-replayable
    "eval_cluster_ari" -> ((s, d) => {
      val dd = docs(s, d)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("simhash")
      val sc = Dedup.simhashLcg(dd)
        .select(col("doc_id"), min(col("doc_id")).over(w).as("rep_id"))
      Eval.clusterAgreement(sc, Dedup.minhashClustersLcg(dd))
    }),
    // minhash flavor: band buckets are engine-internal xxhash64 → rows-only
    // (cluster-merge correctness is unit-tested on planted duplicates)
    "dedup_minhash_clusters" -> ((s, d) => Dedup.minhashClusters(docs(s, d))),
    // the oracle-green twin: LCG buckets (same chain as dedup_minhash_lcg)
    // through the SAME star-link + connected-components representative
    // assignment — DuckDB replays the buckets and converges the min-label
    // propagation itself
    "dedup_minhash_clusters_lcg" -> ((s, d) => Dedup.minhashClustersLcg(docs(s, d))),

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
    // the oracle-green twin: LCG hyperplane signs over int8 codes (exact
    // integer bucket bits), quantized-cosine scoring — DuckDB replays the
    // whole index, buckets included
    "ann_lsh_lcg_topk" -> ((s, d) => {
      val e = embs(s, d)
      val q = e.filter(col("vec_id") < 10)
      Similarity.lshTopKLcg(e, q, k = 5, dim = 64)
        .select(col("qid"), col("id"), col("rank"))
    }),
    // IVF coarse-quantizer variant (clustered scale path; centroid sampling
    // is engine-internal xxhash64 → rows-only check, recall differential in
    // PipelineSpec)
    "ann_ivf_topk" -> ((s, d) => {
      val e = embs(s, d)
      val q = e.filter(col("vec_id") < 10)
      Similarity.ivfTopK(e, q, k = 5, nlist = 32, nprobe = 8)
        .select(col("qid"), col("id"), col("rank"))
    }),
    // the oracle-green twin: coarse quantizer = bit-exact integer k-means
    // (shared kmeans CTE chain), exact rational probe distances, quantized-
    // cosine scoring — DuckDB replays probes, lists, and ranks end to end
    "ann_ivf_lcg_topk" -> ((s, d) => {
      val e = embs(s, d)
      val q = e.filter(col("vec_id") < 10)
      Similarity.ivfTopKLcg(e, q, k = 5)
        .select(col("qid"), col("id"), col("rank"))
    }),
    // product quantization + ADC: m=4 subspaces × 8 centroids (decimal-exact
    // Lloyd, deterministic at any parallelism); corpus embeddings are never
    // read at query time — only the 4-byte codes
    "ann_pq_topk" -> ((s, d) => {
      val e = embs(s, d)
      val q = e.filter(col("vec_id") < 10)
      Similarity.pqTopK(e, q, k = 5, m = 4, ksub = 8)
        .select(col("qid"), col("id"), col("rank"))
    }),
    // the oracle-green ADC twin: exact-integer PQ index (ann_pq_codes'
    // chain), exact rational per-subspace distances, left-to-right pinned
    // m-term ADC sums — DuckDB replays the whole query path
    "ann_pq_lcg_topk" -> ((s, d) => {
      val e = embs(s, d)
      val q = e.filter(col("vec_id") < 10)
      Similarity.pqTopKLcg(e, q, k = 5, m = 4, ksub = 8)
        .select(col("qid"), col("id"), col("rank"))
    }),
    // driver embeddings are uniform-random (max pairwise cosine ~0.5), so the
    // near-dup threshold is 0.35 with 6-bit buckets × 8 tables; multiprobe
    // (1-bit-flip neighbor buckets) lifts recall to ≈0.91 at the threshold
    // itself and ≈0.97 at s=0.5 (formula in Similarity.cosineNearDups;
    // measured on planted pairs in PipelineSpec)
    "ann_cosine_neardup" -> ((s, d) =>
      Similarity.cosineNearDups(embs(s, d), threshold = 0.35, dim = 64,
          bits = 6, tables = 8, probes = 1)
        .select(col("a"), col("b"), round(col("score"), 6).as("score"))),
    // the oracle-green twin: LCG bucket index + integer-exact threshold
    // decision (400·dot² vs 49·‖a‖²·‖b‖² over int8 codes) — the pair SET is
    // bit-identical at any parallelism and in DuckDB
    "ann_cosine_lcg_neardup" -> ((s, d) =>
      Similarity.cosineNearDupsLcg(embs(s, d), tNum = 7, tDen = 20, dim = 64)
        .select(col("a"), col("b"))),

    // embedding int8 quantization (4x storage compressor; scale + per-code
    // checksums are exact integer/double arithmetic, so DuckDB mirrors them)
    "ann_quantize_int8" -> ((s, d) => {
      val q = Similarity.quantizeInt8(embs(s, d))
      q.select(col("vec_id"), round(col("scale"), 8).as("scale"),
        aggregate(col("qvec"), lit(0L), (a, x) => a + x.cast("long")).as("qsum"),
        aggregate(col("qvec"), lit(0L), (a, x) => a + (x * x).cast("long")).as("qnorm2"))
    }),
    // EXACT integer k-means over the int8 codes (sum/count centroids,
    // rational distances, one shared IEEE division, smallest-cid ties) —
    // the oracle replays both Lloyd rounds bit-for-bit
    "ann_kmeans" -> ((s, d) =>
      Similarity.kmeansInt8(embs(s, d), k = 4, steps = 2)),
    // EXACT integer product quantization (Lehmer-seeded, sum/count
    // centroids, rational distances, one Lloyd step) — the oracle-green
    // twin of the rows-only xxhash64-seeded ann_pq_topk index
    "ann_pq_codes" -> ((s, d) => Similarity.pqCodesInt8(embs(s, d))),
    // top-k over the dequantized int8 corpus (the 1/4-bytes scan path)
    "ann_quantized_topk" -> ((s, d) => {
      val e = embs(s, d)
      val q = e.filter(col("vec_id") < 10)
      Similarity.quantizedTopK(Similarity.quantizeInt8(e), q, k = 5)
        .select(col("qid"), col("id"), col("rank"))
    }),

    // deterministic JL random projection to 8 dims (zero-shuffle map scan)
    "ann_project_jl" -> ((s, d) => Similarity.projectJL(embs(s, d), dp = 8)),
    // top principal component, bit-exact pipeline: 10^4 quantization makes
    // the Gram/covariance exact integers; power-iteration floats are ordered
    // left folds mirrored by list_reduce in the oracle
    "ann_pca3" -> ((s, d) => Similarity.pcaTopComponent(embs(s, d), iters = 3)),

    // pipeline: text analysis
    "text_tokens" -> ((s, d) => TextStats.tokenCounts(docs(s, d))),
    // BPE tokenizer TRAINING (Sennrich-style, word-frequency weighted,
    // lexicographic tie-break, greedy left-to-right rewrite): the learned
    // 4-merge schedule — the DuckDB oracle unrolls all four rounds and
    // replays the carry-fold rewrite bit-for-bit
    "text_bpe_train" -> ((s, d) => {
      import s.implicits._
      bpeSchedule(s, d, 4).toDF("merge_rank", "lft", "rgt", "cnt")
        .select(col("merge_rank").cast("long"), col("lft"), col("rgt"), col("cnt"))
    }),
    // tokenize with the learned schedule: per-doc word + BPE token counts
    // (the schedule is memoized per (dir, k) — one training serves both
    // bpe queries in a Verify run instead of re-paying the k groupBy rounds)
    "text_bpe_apply" -> ((s, d) =>
      Bpe.tokenCounts(s, docs(s, d), bpeSchedule(s, d, 4).map(x => (x._2, x._3)))),
    "text_quality" -> ((s, d) => TextStats.qualityScores(docs(s, d))),
    // per-doc character Shannon entropy (nats) — zero-shuffle per-row array
    // algebra with a char-sorted left-to-right fold (pinned fp order)
    "text_entropy" -> ((s, d) => TextStats.charEntropy(docs(s, d))),
    // vocabulary richness: type-token ratio + hapax share — zero-shuffle
    // per-row array algebra, integer counts, one division per ratio
    "text_ttr" -> ((s, d) => TextStats.ttr(docs(s, d))),
    "text_repetition" -> ((s, d) => TextStats.repetitionScores(docs(s, d))),
    // rangeSize=100 forces the sf0.01 run through MULTIPLE ranges, so the
    // driver pins the two-level distributed scan == the naive global window
    "text_pack_sequences" -> ((s, d) =>
      TextStats.packSequences(docs(s, d), budget = 512, rangeSize = 100)),
    "text_sample_strata" -> ((s, d) =>
      TextStats.stratifiedSample(docs(s, d),
          Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.25, "es" -> 0.1))
        .select(col("doc_id"), col("lang"))),
    "text_langid" -> ((s, d) => TextStats.langId(docs(s, d))),
    // exact tie-aware ROC-AUC (Mann-Whitney, tie-corrected) of a signed
    // Lehmer fold over the int8-quantized embedding codes vs label==0 —
    // integer rank sums, one final division, bit-identical in any engine
    "eval_auc" -> ((s, d) => Eval.auc(int8FoldScored(s, d))),
    // PR curve at every distinct threshold of the same integer score —
    // running integer tp/fp over the distinct-score groups, descending.
    // No rounding: precision/recall are each ONE IEEE division of exact
    // integers (like eval_auc), bit-identical in any engine — round() on a
    // quotient is engine-specific (Spark BigDecimal HALF_UP vs DuckDB
    // binary-double) and was the r4 hash mismatch.
    "eval_pr_curve" -> ((s, d) => Eval.prCurve(int8FoldScored(s, d))),
    // calibration-curve bins (ECE inputs) of the min-max-normalized integer
    // score vs label==0 — integer per-bin sums, bit-identical in any engine
    "eval_calibration" -> ((s, d) =>
      Eval.calibrationBins(int8FoldScored(s, d), bins = 10)
        .select(col("bin"), col("cnt"), col("pos_cnt"),
          round(col("acc"), 8).as("acc"), round(col("conf"), 8).as("conf"))),
    // exact tie-aware Spearman rho between two integer document statistics
    // (char length vs whitespace token count) — doubled average ranks keep
    // every moment an integer; DECIMAL(38,0) cross products; one division
    "eval_spearman" -> ((s, d) =>
      Eval.spearman(
        docs(s, d).select(length(col("text")).cast("long").as("x"),
          size(filter(split(col("text"), "\\s+"), t => length(t) > 0))
            .cast("long").as("y")))
        .select(col("n"), round(col("rho"), 8).as("rho"))),
    // exact tie-aware Kendall tau-b over the same two integer statistics —
    // doubled tie terms m0/m1/m2 and the signed pair fold over the
    // distinct-(x,y) group table keep every intermediate an exact integer;
    // one final division (2·cd / sqrt of a double product, like spearman)
    "eval_kendall" -> ((s, d) =>
      Eval.kendall(
        docs(s, d).select(length(col("text")).cast("long").as("x"),
          size(filter(split(col("text"), "\\s+"), t => length(t) > 0))
            .cast("long").as("y")))
        .select(col("n"), col("cd"), round(col("tau"), 8).as("tau"))),
    // retrieval evals over the multi-query BM25 ranking vs term-containment
    // ground truth (rel = # distinct query terms present; fully relevant =
    // all present). Query 1's terms include two absent from the corpus, so
    // its zero-fully-relevant path (first_rank 0, rr 0.0) is exercised.
    "eval_mrr" -> ((s, d) => {
      val ds = docs(s, d)
      Eval.mrr(TextStats.bm25Multi(ds, retrievalQueries, topK = 20),
        TextStats.queryRelevance(ds, retrievalQueries, minTf = 2L), retrievalNterms(s))
    }),
    // precision@k (k = 5, 10, 20) of the same ranking, binary relevance
    "eval_precision_at_k" -> ((s, d) => {
      val ds = docs(s, d)
      Eval.precisionAtK(TextStats.bm25Multi(ds, retrievalQueries, topK = 20),
        TextStats.queryRelevance(ds, retrievalQueries, minTf = 2L), retrievalNterms(s),
        ks = Seq(5, 10, 20))
    }),
    // NDCG@10 of the same ranking against the GRADED relevance — unrolled
    // position sums pin the fp addition order identically in the oracle
    "eval_ndcg" -> ((s, d) => {
      val ds = docs(s, d)
      Eval.ndcg(TextStats.bm25Multi(ds, retrievalQueries, topK = 20),
        TextStats.queryRelevance(ds, retrievalQueries, minTf = 2L), k = 10)
    }),
    // recall@k (k = 5, 10, 20) of the same ranking — denominator is the
    // CORPUS-WIDE fully-relevant count, so recall < 1 even for a perfect
    // top-k when a query has more than k relevant docs
    "eval_recall_at_k" -> ((s, d) => {
      val ds = docs(s, d)
      Eval.recallAtK(TextStats.bm25Multi(ds, retrievalQueries, topK = 20),
        TextStats.queryRelevance(ds, retrievalQueries, minTf = 2L), retrievalNterms(s),
        ks = Seq(5, 10, 20))
    }),
    // average precision @20 (the per-query term of MAP) — unrolled
    // per-position precision sums (each term ONE division of exact
    // integers), denominator min(tot_rel, 20)
    "eval_map" -> ((s, d) => {
      val ds = docs(s, d)
      Eval.avgPrecision(TextStats.bm25Multi(ds, retrievalQueries, topK = 20),
        TextStats.queryRelevance(ds, retrievalQueries, minTf = 2L), retrievalNterms(s),
        k = 20)
    }),
    // rank-biased overlap (p = 1/2, depth 10) between two rankers of the
    // SAME query — BM25 vs raw term-frequency (the classic ranker-A/B
    // comparison; the two top-10s genuinely overlap AND genuinely differ:
    // bm25 length-normalizes, tf doesn't) — every weight an exact dyadic
    // 2^-i, every overlap an exact integer, sum unrolled
    "eval_rbo" -> ((s, d) => {
      val ds = docs(s, d)
      val terms = Seq("spark", "shuffle", "partition")
      val a = TextStats.bm25(ds, terms, topK = 20)
        .select(col("doc_id"), col("rk"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("s").desc, col("doc_id"))
      val b = ds.select(col("doc_id"), explode(
          filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0)).as("term"))
        .filter(col("term").isin(terms.map(lit): _*))
        .groupBy("doc_id").agg(count(lit(1)).as("s"))
        .orderBy(col("s").desc, col("doc_id")).limit(20)
        .withColumn("rk", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("rk"))
      Eval.rbo(a, b, k = 10)
    }),
    // population stability index of the int8-fold score between even and
    // odd vec_ids — integer bin assignment, full bin grid, unrolled total
    "eval_psi" -> ((s, d) => {
      val scored = int8FoldScored(s, d)
      Eval.psi(scored.filter(col("vec_id") % 2 === 0),
        scored.filter(col("vec_id") % 2 =!= 0), bins = 10)
    }),
    // language-ID confusion matrix vs the documents table's lang truth
    "eval_langid_confusion" -> ((s, d) =>
      Eval.confusion(
        docs(s, d).select(col("doc_id"), col("lang"))
          .join(TextStats.langId(docs(s, d)), Seq("doc_id")),
        truthCol = "lang", predCol = "pred_lang")),
    // per-class precision/recall/F1 of the same classifier — exact integer
    // counts, one division per metric (F1 as 2tp/(predTot+truthTot))
    "eval_langid_f1" -> ((s, d) =>
      Eval.f1PerClass(
        docs(s, d).select(col("doc_id"), col("lang"))
          .join(TextStats.langId(docs(s, d)), Seq("doc_id")),
        truthCol = "lang", predCol = "pred_lang")
        .select(col("cls"), col("tp"), col("pred_total"), col("truth_total"),
          round(col("precision"), 8).as("precision"),
          round(col("recall"), 8).as("recall"),
          round(col("f1"), 8).as("f1"))),
    // Cohen's kappa of the same classifier — chance-corrected agreement as
    // ONE division of exact integers ((n·A − S)/(n² − S))
    "eval_kappa" -> ((s, d) =>
      Eval.kappa(
        docs(s, d).select(col("doc_id"), col("lang"))
          .join(TextStats.langId(docs(s, d)), Seq("doc_id")),
        truthCol = "lang", predCol = "pred_lang")),
    // multiclass Matthews correlation (R_k) of the same classifier —
    // kappa's exact-integer numerator over a sqrt-of-double-product
    // normalizer (the kendall tau shape); one final IEEE division
    "eval_mcc" -> ((s, d) =>
      Eval.mcc(
        docs(s, d).select(col("doc_id"), col("lang"))
          .join(TextStats.langId(docs(s, d)), Seq("doc_id")),
        truthCol = "lang", predCol = "pred_lang")),
    // macro-averaged F1 of the same classifier — per-class one-division
    // F1s folded in CLASS-SORTED order (pinned fp addition order), then
    // one division by the class count
    "eval_macro_f1" -> ((s, d) =>
      Eval.macroF1(
        docs(s, d).select(col("doc_id"), col("lang"))
          .join(TextStats.langId(docs(s, d)), Seq("doc_id")),
        truthCol = "lang", predCol = "pred_lang")),
    // Brier score of the min-max-normalized integer score vs label==0 —
    // exact integer numerator Σ(off − y·rng)², ONE division by n·rng²
    "eval_brier" -> ((s, d) => Eval.brier(int8FoldScored(s, d))),
    "text_fingerprint" -> ((s, d) => TextStats.fingerprints(docs(s, d))),
    // LCG fold over dense-rank token ids — the fingerprint chain a DuckDB
    // oracle replays exactly (list_reduce), unlike the xxhash64 production one
    "text_fingerprint_lcg" -> ((s, d) => TextStats.fingerprintsLcg(docs(s, d))),
    // RAG sliding-window chunking: 64-token chunks every 48 (16 overlap),
    // tail-anchored; zero shuffles — pure per-doc array expressions
    "text_chunks" -> ((s, d) =>
      TextStats.chunkOverlap(docs(s, d), chunkSize = 64, overlap = 16)),
    // MOSS winnowing (k=4 token grams, w=5 windows, rightmost-min picks)
    // over the LCG gram hash a DuckDB oracle replays bit-for-bit
    "text_winnow" -> ((s, d) => TextStats.winnowLcg(docs(s, d), k = 4, w = 5)),
    // top-5 terms per doc by smoothed tf-idf (sklearn idf smoothing)
    "text_tfidf" -> ((s, d) => TextStats.tfidfTopTerms(docs(s, d), topK = 5)),
    // adjacent-bigram PMI collocations (exact integer counts, one ln of an
    // exact rational)
    "text_pmi" -> ((s, d) =>
      TextStats.pmiBigrams(docs(s, d))
        .select(col("t1"), col("t2"), col("c12"), col("c1"), col("c2"),
          round(col("pmi"), 8).as("pmi"))),
    // TextRank keywords: 5 weighted PageRank iterations over the word
    // co-occurrence graph — the oracle reuses the unrolled PageRank chain
    // with the word graph as its edge CTE
    "text_textrank5" -> ((s, d) => {
      val tr = TextStats.textrank(s, docs(s, d), k = 5)
      val tot = tr.agg(sum(col("r")).as("tot"))
      tr.crossJoin(broadcast(tot))
        .select(col("term"), round(col("r") / col("tot"), 8).as("r"))
    }),
    // BM25 retrieval, fixed query, dyadic k1=5/4 b=3/4 (exact constants)
    "text_bm25" -> ((s, d) =>
      TextStats.bm25(docs(s, d), Seq("spark", "shuffle", "partition"), topK = 20)),
    // hybrid retrieval: RRF-fuse the BM25 top-20 with the quality top-20
    "text_rrf" -> ((s, d) => {
      val ds = docs(s, d)
      val a = TextStats.bm25(ds, Seq("spark", "shuffle", "partition"), topK = 20)
        .select(col("doc_id"), col("rk"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("quality").desc, col("doc_id"))
      val b = TextStats.qualityScores(ds).select(col("doc_id"), col("quality"))
        .orderBy(col("quality").desc, col("doc_id")).limit(20)
        .withColumn("rk", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("rk"))
      TextStats.rrfFuse(a, b)
    }),
    // C4-style cross-document span REMOVAL: 10-token chunks occurring in
    // ≥2 distinct docs are scrubbed and the doc rebuilt in original order
    // (the duplicate-doc fixtures get gutted; unique text survives intact)
    "text_span_scrub" -> ((s, d) => TextStats.spanScrub(docs(s, d))),
    // temperature-scaled (α = 1/2) domain mixing weights per source —
    // sqrt is correctly-rounded IEEE so both engines agree bit-for-bit;
    // the sqrt-sum denominator is a source-ordered pinned fold
    "text_domain_mix" -> ((s, d) => TextStats.domainMix(docs(s, d))),
    // per-language KL drift vs the corpus over the top-24 vocabulary —
    // integer counts + grid-materialized zero terms, term-sorted pinned fold
    "text_kl_drift" -> ((s, d) => TextStats.klDrift(docs(s, d))),
    // bounded-memory heavy hitters: Misra-Gries candidates + exact recount,
    // a-posteriori certified equal to the unbounded exact top-k
    "text_top_terms" -> ((s, d) =>
      TextStats.topTermsExact(docs(s, d), topK = 20, cap = 4096)),
    // top-K vocabulary coverage curve (all-integer; distributed rank)
    "text_vocab_coverage" -> ((s, d) => TextStats.vocabCoverage(docs(s, d))),
    // vocabulary-coverage filter: per-doc OOV rate vs the corpus' own top-16
    // vocabulary (count desc, term asc — deterministic boundary); K=16 so
    // the synthetic corpus' ~40-term vocabulary leaves a real OOV tail
    "text_oov_rate" -> ((s, d) => TextStats.oovRate(docs(s, d), vocabK = 16)),
    // deterministic global training order; rangeWidth 2^27 → ~16 key ranges
    // at any SF, so the driver pins the two-level rank == one global sort
    "text_shuffle_order" -> ((s, d) =>
      TextStats.shuffleOrder(docs(s, d), rangeWidth = 1L << 27)),
    // τ=2 keeps the whole rate derivation in exact integer + IEEE sqrt
    // arithmetic — DuckDB reproduces the rates bit-for-bit
    "text_temperature_sample" -> ((s, d) =>
      TextStats.temperatureSample(docs(s, d), frac = 0.3, tau = 2.0)),
    // the corpus has no real PII, so the query plants deterministic PII
    // derived from doc_id — identically in the SQL mirror — and the driver
    // compares the redacted text and per-category counts
    "text_redact_pii" -> ((s, d) => {
      val planted = docs(s, d).select(col("doc_id"),
        concat(col("text"),
          lit(" reach user"), col("doc_id"), lit("@mail.example via 10."),
          col("doc_id") % 200, lit(".0.1 tel +1 555 01"),
          lpad((col("doc_id") % 100).cast("string"), 2, "0")).as("text"))
      TextStats.redactPii(planted)
    }),
    // self-trained unigram LM; vocabSize=20 forces real OOV traffic on the
    // synthetic corpus's small vocabulary
    "text_unigram_lm" -> ((s, d) =>
      TextStats.unigramLogProb(docs(s, d), vocabSize = 20, k = 0.5)),
    // interpolated bigram LM (λ=3/4, k=1/2 — dyadic, bit-identical floats)
    "text_bigram_lm" -> ((s, d) =>
      TextStats.bigramLogProb(docs(s, d), vocabSize = 20, k = 0.5, lambda = 0.75)),
    // benchmark decontamination: every 97th doc plays the eval set
    "text_contamination" -> ((s, d) => {
      val all = docs(s, d)
      Contamination.ngramOverlap(
        all.filter(col("doc_id") % 97 =!= 0),
        all.filter(col("doc_id") % 97 === 0), w = 3, threshold = 0.1)
    }),
    // exact duplicated 7-gram span marking (ExactSubstr at token level):
    // small shared vocab → real cross-doc repeats at every SF
    "text_dup_spans" -> ((s, d) =>
      TextStats.dupSpans(docs(s, d), w = 7, minCount = 2L)),
    // snapshot-incremental exact dedup: last decile of doc_ids is the delta
    "dedup_incremental" -> ((s, d) => {
      val all = docs(s, d)
      Dedup.incrementalNew(
        all.filter(col("doc_id") % 10 >= 8), all.filter(col("doc_id") % 10 < 8))
    }),

    // pipeline: stream-shaped event analytics (batch form; SURVEY.md §2.11)
    "events_windowed" -> ((s, d) =>
      Events.windowedCounts(s.read.parquet(s"$d/events.parquet"))),
    // exact per-type value quantiles (smallest v with cum ≥ ⌈q·n⌉) —
    // distinct-value histogram + window, never a raw-row global sort
    "events_quantiles" -> ((s, d) =>
      Events.quantiles(s.read.parquet(s"$d/events.parquet"))),
    // per-type z>3 outliers — exact-integer decision predicate
    // (n·v − S)² > 9·(n·Q − S²), one double division per flagged row
    "events_zscore" -> ((s, d) =>
      Events.zscoreOutliers(s.read.parquet(s"$d/events.parquet"))),
    // per-type CUSUM changepoint (H-scaled integer arithmetic, window-only
    // prefix identity — no fp anywhere in the statistic)
    "events_cusum" -> ((s, d) =>
      Events.cusum(s.read.parquet(s"$d/events.parquet"))),
    // user-journey Markov transition matrix — per-user lag pairs, exact
    // counts, one division per cell
    "events_markov" -> ((s, d) =>
      Events.transitions(s.read.parquet(s"$d/events.parquet"))),
    "events_sessions" -> ((s, d) =>
      Events.sessions(s.read.parquet(s"$d/events.parquet"), gapMinutes = 30)),
    // ordered conversion funnel signup -> click -> purchase (strictly-after)
    "events_funnel" -> ((s, d) =>
      Events.funnel(s.read.parquet(s"$d/events.parquet"),
        Seq("signup", "click", "purchase"))),
    // day-grain retention triangle
    "events_retention" -> ((s, d) =>
      Events.retention(s.read.parquet(s"$d/events.parquet"))),
    // KMV distinct-user sketch per type (LCG hash — oracle replays exactly)
    "events_kmv_distinct" -> ((s, d) =>
      Events.kmvDistinct(s.read.parquet(s"$d/events.parquet"), k = 8)),

    // §2.10 remaining @GrB utility surface
    "gb_eye" -> ((s, _) => GBMatrix.eye(s, 30, 20, -3).df),
    "gb_norms" -> ((s, d) => {
      import s.implicits._
      val a = GBMatrix(edgesBi(s, d))
      Seq((a.norm("1"), a.norm("inf"), a.norm("fro")))
        .toDF("norm1", "norminf", "normfro")
    }),
    "gb_bandwidth" -> ((s, d) => {
      import s.implicits._
      val (lo, hi) = GBMatrix(edgesBi(s, d)).bandwidth
      Seq((lo, hi)).toDF("lo", "hi")
    }),
    "gb_structure" -> ((s, d) => {
      import s.implicits._
      val a = GBMatrix(edgesBi(s, d))
      val sym = a.eWiseAdd(a.transpose, BinOp.PlusOp)
      Seq((a.istril, a.tril().istril, a.istriu, a.isdiag,
        a.issymmetric, sym.issymmetric))
        .toDF("istril_raw", "istril_tril", "istriu_raw", "isdiag_raw",
          "issym_raw", "issym_sym")
    }),
    "gb_flip" -> ((s, d) => GBMatrix(nationAdj(s, d)).flip(25, 1).df),
    // the reference's Wathen FEM demo generator with a SQL-expressible
    // density (the rho_given path), so DuckDB rebuilds it cell-for-cell
    "gb_wathen" -> ((s, _) => GBMatrix.wathen(s, 4, 3,
        rhoFn = Some((i, j) => (pmod(i * lit(31L) + j, lit(7L)) + 1L).cast("double")))
      .df.select(col("src"), col("dst"), round(col("w"), 6).as("w"))),
    // deterministic R-MAT power-law generator (zero-shuffle projection),
    // dup-collapsed to a weighted simple multigraph histogram
    "gb_rmat" -> ((s, d) => {
      val n = s.read.parquet(s"$d/supplier.parquet").count()
      GBMatrix.rmat(s, scale = 7, m = n * 20, seed = 11L)
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    }),
    "gb_repmat" -> ((s, d) => GBMatrix(nationAdj(s, d)).repmat(2, 3, 25, 5).df),
    "gb_mpower" -> ((s, d) => GBMatrix(nationCoRegion(s, d)).matrixPower(3).df),

    // §2.1 GrB_Matrix_diag (GraphBLAS.h:3656): vector -> diagonal-k matrix
    "gb_diag" -> ((s, d) =>
      GBMatrix.diagOf(
        s.read.parquet(s"$d/nation.parquet")
          .select(col("n_nationkey").cast("long").as("id"),
            (col("n_regionkey") + 1).cast("double").as("v")), k = 3).df),
    // §2.1 GxB_Vector_diag: the diagonal of a square matrix as a vector
    "gb_vector_diag" -> ((s, d) => GBMatrix(nationCoRegion(s, d)).diag),
    // serialize/deserialize (GxB_Matrix_serialize, GraphBLAS.h:10827) as a
    // driver-verified round trip: write a decoy snapshot at iter=3 (zeroed
    // values) then the real state at iter=7; Checkpoint.newest must pick the
    // complete, tag-matching iter=7 snapshot, so restored values equaling
    // the source vector proves both the round trip and newest-selection
    "gb_checkpoint_roundtrip" -> ((s, d) => {
      val v = s.read.parquet(s"$d/nation.parquet")
        .select(col("n_nationkey").cast("long").as("id"),
          (col("n_regionkey") + 1).cast("double").as("v"))
      val dir = "/tmp/graft_ckpt_roundtrip"
      Checkpoint.write(v.withColumn("v", lit(0.0)), dir, iter = 3, tag = "rt")
      Checkpoint.write(v, dir, iter = 7, tag = "rt")
      val (it, restored) = Checkpoint.newest(s, dir, Seq("id", "v"), tag = "rt").get
      restored.select(col("id"), col("v"), lit(it.toLong).as("iter"))
    }),

    // pipeline: multimodal — real pure-JVM codecs (WAV RIFF/PCM16, 24-bit
    // BMP, animated GIF89a with LZW — Codecs.scala), mapPartitions batch shape
    "media_features" -> ((s, _) =>
      Multimodal.decodeAndFeaturize(s, Multimodal.synthesize(s, 1000))
        .select(col("media_id"), col("kind"), col("n_bytes"), col("payload_hash"))),
    "media_frames" -> ((s, _) => Multimodal.sampleFrames(Multimodal.synthesize(s, 1000))),
    // decoded invariants of the same payloads — every value comes from
    // actually parsing the WAV/BMP/GIF bytes, yet each is closed-form in
    // media_id under the synthesis, so DuckDB replays it from range(1000):
    // the oracle-green twin of the rows-only media_features/media_frames
    "media_invariants" -> ((s, _) =>
      Multimodal.invariants(Multimodal.synthesize(s, 1000)))
  )

  // ---------------------------------------------------------------------------
  // oracle SQL (DuckDB dialect) — same tables, same column names
  // ---------------------------------------------------------------------------


  /** gb_wathen oracle: the wathen.c assembly in SQL over the same element
    * block (numerators/45.0 divides identically in both engines) and the
    * same integral density (i*31+j)%7+1; per-entry sums rounded to 6 dp on
    * both sides (summation order differs between engines).
    */
  private def wathenOracleSql: String = {
    val nx = 4L; val ny = 3L
    val eVals = (for (kr <- 0 until 8; kc <- 0 until 8) yield
      s"($kr, $kc, ${math.round(GBMatrix.WathenE(kr)(kc) * 45).toInt}/45.0)")
      .mkString(",\n         |")
    def nnCase(k: String) =
      s"""CASE $k WHEN 0 THEN 3*j*$nx + 2*i + 2*j
         | WHEN 1 THEN 3*j*$nx + 2*i + 2*j - 1
         | WHEN 2 THEN 3*j*$nx + 2*i + 2*j - 2
         | WHEN 3 THEN (3*j-1)*$nx + 2*j + i - 2
         | WHEN 4 THEN 3*(j-1)*$nx + 2*i + 2*j - 4
         | WHEN 5 THEN 3*(j-1)*$nx + 2*i + 2*j - 3
         | WHEN 6 THEN 3*(j-1)*$nx + 2*i + 2*j - 2
         | ELSE (3*j-1)*$nx + 2*j + i - 1 END""".stripMargin.replace("\n", " ")
    s"""WITH cells AS (SELECT CAST(c % $nx + 1 AS BIGINT) AS i,
       |CAST(c // $nx + 1 AS BIGINT) AS j FROM range(${nx * ny}) t(c)),
       |e(kr, kc, v) AS (VALUES $eVals),
       |t AS (SELECT ${nnCase("kr")} AS src, ${nnCase("kc")} AS dst,
       |e.v * CAST((i*31 + j) % 7 + 1 AS DOUBLE) AS x FROM cells, e)
       |SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
       |round(sum(x), 6) AS w FROM t GROUP BY 1, 2""".stripMargin
  }

  /** DuckDB replay of TextStats.langId — shared by the text_langid oracle
    * and the eval_langid_confusion one. */
  /** Shared oracle CTE chain for the eval_* queries — mirrors
    * [[int8FoldScored]]: int8 quantization, signed Lehmer fold, label==0.
    * Ends defining `lab(score, pos)`; embed as `WITH $int8FoldScoredSql, …`.
    */
  /** int8 quantization alone (ends defining `q(vec_id, qv)`) — shared by
    * the eval fold chain and the exact-k-means oracle. */
  /** CTE chain (no WITH) for the LCG-sign SRP bucket index over int8 codes
    * (mirrors Similarity.lcgBuckets): quant CTEs c0/m/qt (qt keeps scale+qv)
    * then bk(vec_id, tbl, bkt) at the given geometry — shared by the
    * LSH-top-k and cosine-near-dup LCG twins. */
  private def lcgBucketCtes(dim: Int, bits: Int, tables: Int): String =
    s"""$int8QuantSql,
      |qt AS (SELECT q.vec_id, m.scale, q.qv FROM q JOIN m USING (vec_id)),
      |dots AS (
      |  SELECT vec_id, tb.t, tb.b,
      |    list_sum(list_transform(qv, (x, i) ->
      |      x * (CASE WHEN (((i - 1 + (tb.t*$bits + tb.b)*$dim) * 48271 + 16807)
      |                      % 2147483647) % 2 = 1 THEN 1 ELSE -1 END))) AS d
      |  FROM qt CROSS JOIN (SELECT t.range AS t, b.range AS b
      |                      FROM range(0, $tables) t, range(0, $bits) b) tb),
      |bk AS (SELECT vec_id, t AS tbl,
      |  CAST(sum(CASE WHEN d > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS bkt
      |  FROM dots GROUP BY vec_id, t)""".stripMargin

  private val int8QuantSql: String =
    """c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |m AS (SELECT vec_id, e,
      |  list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale FROM c),
      |q AS (SELECT vec_id,
      |  CASE WHEN scale > 0
      |       THEN list_transform(e, x -> greatest(-127.0, least(127.0, floor(x / scale + 0.5))))
      |       ELSE list_transform(e, x -> 0.0) END AS qv
      |  FROM m)""".stripMargin

  private val int8FoldScoredSql: String =
    s"""$int8QuantSql,
      |xx AS (SELECT vec_id, CAST(i AS BIGINT) AS p, CAST(qv[i] AS BIGINT) AS x
      |       FROM q, UNNEST(range(1, len(qv) + 1)) AS u(i)),
      |sc AS (SELECT vec_id,
      |  sum(x * (CASE WHEN (p * 48271) % 1000003 % 2 = 0 THEN 1 ELSE -1 END)) AS score
      |  FROM xx GROUP BY vec_id),
      |lab AS (SELECT sc.score, (emb.label = 0) AS pos
      |        FROM sc JOIN embeddings emb USING (vec_id))""".stripMargin

  /** Unrolled DuckDB replay of the k-round BPE training schedule — the CTE
    * chain w0/s0, then (p_r, b_r, s_r) per round: p_r counts adjacent
    * symbol pairs weighted by word frequency, b_r picks the winner
    * (cnt DESC, l, r), s_r rewrites the vocabulary with the SAME greedy
    * left-to-right carry fold the engine uses (list_reduce over a
    * "merged-prefix|carry" state string — bit-identical replay).
    */
  private def bpeChainSql(k: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """w0 AS (SELECT w, count(*) AS wcnt FROM (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
        |                t -> len(t) > 0)) AS w FROM documents) GROUP BY 1),
        |s0 AS (SELECT w,
        |  list_append(list_transform(range(1, length(w) + 1), i -> w[i:i]), '</w>') AS syms,
        |  wcnt FROM w0)""".stripMargin)
    for (r <- 1 to k) {
      sb.append(s""",
        |p$r AS (SELECT syms[i] AS l, syms[i+1] AS r, sum(wcnt) AS cnt
        |       FROM s${r - 1}, UNNEST(range(1, len(syms))) AS u(i) GROUP BY 1, 2),
        |b$r AS (SELECT l, r, cnt FROM p$r ORDER BY cnt DESC, l, r LIMIT 1),
        |s$r AS (SELECT w, string_split(
        |    CASE WHEN string_split(acc,'|')[2] = '' THEN string_split(acc,'|')[1]
        |         WHEN string_split(acc,'|')[1] = '' THEN string_split(acc,'|')[2]
        |         ELSE string_split(acc,'|')[1] || ' ' || string_split(acc,'|')[2] END, ' ') AS syms,
        |  wcnt FROM (
        |    SELECT w, wcnt, list_reduce(list_prepend('|', syms), (acc, x) ->
        |      -- LEFT JOIN ON TRUE: an exhausted schedule (empty b) leaves
        |      -- NULL l/r, the merge branch never fires, syms pass through
        |      CASE WHEN string_split(acc,'|')[2] = b.l AND x = b.r THEN
        |             (CASE WHEN string_split(acc,'|')[1] = '' THEN b.l || b.r
        |                   ELSE string_split(acc,'|')[1] || ' ' || b.l || b.r END) || '|'
        |           WHEN string_split(acc,'|')[2] = '' THEN string_split(acc,'|')[1] || '|' || x
        |           ELSE (CASE WHEN string_split(acc,'|')[1] = '' THEN string_split(acc,'|')[2]
        |                      ELSE string_split(acc,'|')[1] || ' ' || string_split(acc,'|')[2] END) || '|' || x
        |      END) AS acc
        |    FROM s${r - 1} LEFT JOIN b$r b ON TRUE))""".stripMargin)
    }
    sb.toString
  }

  /** Unrolled DuckDB replay of [[Similarity.kmeansInt8]]: integer (sum,
    * count) centroids, exact rational distances compared as the same one
    * IEEE division, smallest-cid tie-break, k smallest vec_ids as init. */
  private def kmeansSql(k: Int, steps: Int): String =
    s"WITH ${kmeansCtes(k, steps)}\nSELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM a$steps"

  /** The k-means CTE chain (no WITH / final SELECT) ending at
    * `a<steps>(vec_id, x, cid)` — shared by the ann_kmeans oracle and the
    * IVF-LCG twin, which continues the chain with centroid/probe CTEs. */
  private def kmeansCtes(k: Int, steps: Int): String = {
    val sb = new StringBuilder
    sb.append(s"""$int8QuantSql,
      |qi AS (SELECT vec_id, list_transform(qv, v -> CAST(v AS BIGINT)) AS x FROM q),
      |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, x AS s,
      |         CAST(1 AS BIGINT) AS cnt FROM qi ORDER BY vec_id LIMIT $k)""".stripMargin)
    for (r <- 1 to steps) {
      sb.append(s""",
        |d$r AS (SELECT vec_id, x, cid, cnt,
        |  list_sum(list_transform(range(1, len(x)+1), i -> x[i]*x[i])) AS A,
        |  list_sum(list_transform(range(1, len(x)+1), i -> x[i]*s[i])) AS B,
        |  list_sum(list_transform(range(1, len(s)+1), i -> s[i]*s[i])) AS D
        |  FROM qi, c${r - 1}),
        |a$r AS (SELECT vec_id, x, cid FROM (
        |  SELECT vec_id, x, cid, row_number() OVER (PARTITION BY vec_id ORDER BY
        |    CAST(CAST(A AS HUGEINT)*cnt*cnt - 2*CAST(B AS HUGEINT)*cnt + D AS DOUBLE)
        |      / CAST(CAST(cnt AS HUGEINT)*cnt AS DOUBLE) ASC, cid ASC) AS rn
        |  FROM d$r) WHERE rn = 1)""".stripMargin)
      if (r < steps) sb.append(s""",
        |n$r AS (SELECT cid, count(*) AS cnt FROM a$r GROUP BY 1),
        |u$r AS (SELECT cid, i AS pos, sum(x[i]) AS sv
        |        FROM a$r, UNNEST(range(1, len(x)+1)) AS t(i) GROUP BY 1, 2),
        |c$r AS (SELECT u.cid, list(u.sv ORDER BY u.pos) AS s, n$r.cnt AS cnt
        |        FROM u$r u JOIN n$r USING (cid) GROUP BY u.cid, n$r.cnt)""".stripMargin)
    }
    sb.toString
  }

  /** Exact-integer PQ replay (mirrors Similarity.pqCodesInt8 op-for-op):
    * int8 codes split into `m` contiguous subvectors, per-subspace seed book
    * from the `ksub` Lehmer-least rows, nearest-centroid assignment with the
    * exact rational (A·c² − 2Bc + D)/c² distance (HUGEINT integers, ONE
    * double division, ties to the smallest code), one integer sum/count
    * Lloyd update, final assignment out. */
  private def pqCodesSql(m: Int, ksub: Int, seed: Long): String =
    s"WITH ${pqCodesCtes(m, ksub, seed)}\n" +
      "SELECT vec_id, CAST(sub AS BIGINT) AS sub, CAST(code AS BIGINT) AS code FROM a1"

  /** The PQ CTE chain (no WITH / final SELECT) ending at the final
    * assignment `a1(vec_id, sub, code)` and codebook `bk1(sub, code, s,
    * cnt)` — shared by the ann_pq_codes oracle and the ADC twin. */
  private def pqCodesCtes(m: Int, ksub: Int, seed: Long): String = {
    def assignFrom(book: String, out: String) =
      s"""$out AS (SELECT vec_id, sub, code FROM (
        |  SELECT v.vec_id, v.sub, b.code,
        |    row_number() OVER (PARTITION BY v.vec_id, v.sub ORDER BY
        |      CAST(CAST(list_sum(list_transform(range(1, len(v.sv)+1), i -> v.sv[i]*v.sv[i])) AS HUGEINT)*b.cnt*b.cnt
        |         - 2*CAST(list_sum(list_transform(range(1, len(v.sv)+1), i -> v.sv[i]*b.s[i])) AS HUGEINT)*b.cnt
        |         + list_sum(list_transform(range(1, len(b.s)+1), i -> b.s[i]*b.s[i])) AS DOUBLE)
        |       / CAST(CAST(b.cnt AS HUGEINT)*b.cnt AS DOUBLE) ASC, b.code ASC) AS rn
        |  FROM sv v JOIN $book b ON v.sub = b.sub) WHERE rn = 1)""".stripMargin
    s"""$int8QuantSql,
      |qi AS (SELECT vec_id, list_transform(qv, v -> CAST(v AS BIGINT)) AS x FROM q),
      |sv AS (SELECT vec_id, t.sub AS sub,
      |         x[t.sub*(len(x)//$m)+1 : (t.sub+1)*(len(x)//$m)] AS sv
      |       FROM qi, (SELECT unnest(range(0, $m)) AS sub) t),
      |sd AS (SELECT vec_id, sub, sv,
      |         (vec_id*48271 + sub*1013 + $seed) % 1000003 AS h FROM sv),
      |bk0 AS (SELECT sub, CAST(rn - 1 AS BIGINT) AS code, sv AS s,
      |          CAST(1 AS BIGINT) AS cnt FROM (
      |        SELECT sub, sv, row_number() OVER (PARTITION BY sub ORDER BY h, vec_id) AS rn
      |        FROM sd) WHERE rn <= $ksub),
      |${assignFrom("bk0", "a0")},
      |ex AS (SELECT a.sub, a.code, t.i AS p, v.sv[t.i] AS vv
      |       FROM a0 a JOIN sv v ON a.vec_id = v.vec_id AND a.sub = v.sub,
      |       UNNEST(range(1, len(v.sv)+1)) AS t(i)),
      |ag AS (SELECT sub, code, p, CAST(sum(vv) AS BIGINT) AS spv, count(*) AS c
      |       FROM ex GROUP BY 1, 2, 3),
      |bk1 AS (SELECT sub, code, list(spv ORDER BY p) AS s,
      |          CAST(max(c) AS BIGINT) AS cnt FROM ag GROUP BY 1, 2),
      |${assignFrom("bk1", "a1")}""".stripMargin
  }

  /** BM25 CTE chain (fixed 3-term query, k1=1.25 b=0.75, Lucene idf) ending
    * in `rk(doc_id, bm25, rk)` — shared by text_bm25 and text_rrf. */
  /** Fixed query set for the retrieval evals (MRR / precision@k / NDCG):
    * query 1 reuses text_bm25's terms (two of which never occur in the
    * synthetic corpus — its fully-relevant set is EMPTY, pinning the
    * no-hit path), queries 2-3 have hundreds of fully-relevant docs. */
  private val retrievalQueries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("spark", "shuffle", "partition"),
    2L -> Seq("join", "merge", "sort"),
    3L -> Seq("vector", "stream"))

  private def retrievalNterms(s: SparkSession): DataFrame = {
    import s.implicits._
    retrievalQueries.map { case (id, ts) =>
      (id, ts.map(_.toLowerCase).distinct.size.toLong) }
      .toDF("query_id", "nterms")
  }

  /** Multi-query BM25 + relevance CTE chain (mirrors TextStats.bm25Multi /
    * queryRelevance op-for-op) ending in `ranked(query_id, doc_id, bm25,
    * rk ≤ 20)`, `mrel(query_id, doc_id, rel)`, `nterms(query_id, nterms)`
    * — shared by eval_mrr / eval_precision_at_k / eval_ndcg. */
  private val retrievalCtesSql: String = {
    val vals = retrievalQueries.flatMap { case (id, ts) =>
      ts.map(_.toLowerCase).distinct.map(t => s"($id, '$t')") }.mkString(", ")
    s"""qset AS (SELECT CAST(query_id AS BIGINT) AS query_id, term
      |  FROM (VALUES $vals) AS q(query_id, term)),
      |nterms AS (SELECT query_id, count(*) AS nterms FROM qset GROUP BY 1),
      |toks AS (
      |  SELECT doc_id, t.term FROM documents,
      |  unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS t(term)),
      |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents),
      |avgdl AS (SELECT CAST(sum(dl) AS DOUBLE) / (SELECT n FROM n) AS avgdl FROM dl),
      |mqtf AS (SELECT q.query_id, t.doc_id, t.term, count(*) AS tf
      |         FROM toks t JOIN qset q USING (term) GROUP BY 1, 2, 3),
      |mdf AS (SELECT query_id, term, count(*) AS df FROM mqtf GROUP BY 1, 2),
      |mcontrib AS (
      |  SELECT mqtf.query_id, mqtf.doc_id,
      |         ln((n.n - mdf.df + 0.5) / (mdf.df + 0.5) + 1.0) * mqtf.tf * 2.25 /
      |           (mqtf.tf + 1.25 * (0.25 + 0.75 * dl.dl / avgdl.avgdl)) AS c
      |  FROM mqtf JOIN mdf USING (query_id, term) JOIN dl USING (doc_id)
      |  CROSS JOIN n CROSS JOIN avgdl),
      |mscores AS (SELECT query_id, doc_id, round(sum(c), 6) AS bm25
      |            FROM mcontrib GROUP BY 1, 2),
      |ranked AS (SELECT * FROM (
      |  SELECT query_id, doc_id, bm25,
      |         row_number() OVER (PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rk
      |  FROM mscores) WHERE rk <= 20),
      |mrel AS (SELECT query_id, doc_id, count(*) AS rel FROM (
      |    SELECT q.query_id, t.doc_id, t.term FROM toks t
      |    JOIN qset q USING (term) GROUP BY 1, 2, 3 HAVING count(*) >= 2)
      |  GROUP BY 1, 2)""".stripMargin
  }

  private val bm25CtesSql: String =
    """toks AS (
      |  SELECT doc_id, t.term FROM documents,
      |  unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS t(term)),
      |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents),
      |avgdl AS (SELECT CAST(sum(dl) AS DOUBLE) / (SELECT n FROM n) AS avgdl FROM dl),
      |qtf AS (SELECT doc_id, term, count(*) AS tf FROM toks
      |        WHERE term IN ('spark', 'shuffle', 'partition') GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM qtf GROUP BY 1),
      |contrib AS (
      |  SELECT qtf.doc_id,
      |         ln((n.n - df.df + 0.5) / (df.df + 0.5) + 1.0) * qtf.tf * 2.25 /
      |           (qtf.tf + 1.25 * (0.25 + 0.75 * dl.dl / avgdl.avgdl)) AS c
      |  FROM qtf JOIN df USING (term) JOIN dl USING (doc_id)
      |  CROSS JOIN n CROSS JOIN avgdl),
      |scores AS (SELECT doc_id, round(sum(c), 6) AS bm25 FROM contrib GROUP BY 1),
      |rk AS (SELECT doc_id, bm25,
      |       row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rk FROM scores)""".stripMargin

  /** Quality-score CTE chain (mirrors TextStats.qualityScores op-for-op)
    * ending in `qual(doc_id, n_tokens, ..., quality)` — shared by
    * text_quality and text_rrf. */
  private val qualityCtesSql: String = {
    val stop = TextStats.DefaultStopwords.map(s => s"'$s'").mkString("[", ",", "]")
    s"""qt AS (SELECT doc_id, text,
       |  list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0) AS toks
       |  FROM documents),
       |qm AS (SELECT doc_id,
       |  CAST(len(toks) AS DOUBLE) AS ntok,
       |  CAST(len(list_filter(toks, x -> list_contains($stop, x))) AS DOUBLE) AS nstop,
       |  CAST(len(text) AS DOUBLE) AS tlen,
       |  CAST(len(text) - len(regexp_replace(text, '[.,;:!?''"()]', '', 'g')) AS DOUBLE) AS npunct,
       |  CAST(len(text) - len(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE) AS nupper,
       |  CAST(len(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) AS nchars
       |  FROM qt),
       |qr AS (SELECT doc_id, ntok,
       |  nstop / greatest(ntok, 1.0) AS sr,
       |  npunct / greatest(tlen, 1.0) AS pr,
       |  nupper / greatest(tlen, 1.0) AS ur,
       |  nchars / greatest(ntok, 1.0) AS mwl
       |  FROM qm),
       |qual AS (SELECT doc_id, CAST(ntok AS BIGINT) AS n_tokens,
       |  round(sr, 6) AS stop_ratio, round(pr, 6) AS punct_ratio,
       |  round(ur, 6) AS upper_ratio, round(mwl, 6) AS mean_word_len,
       |  round((CASE WHEN ntok BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END) * 0.3
       |      + (CASE WHEN mwl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) * 0.2
       |      + least(sr * 4.0, 1.0) * 0.3
       |      + (1.0 - least(ur * 5.0, 1.0)) * 0.2, 6) AS quality
       |FROM qr)""".stripMargin
  }

  private val langidSql: String =
    s"""WITH t AS (SELECT doc_id,
      |  list_filter(regexp_split_to_array(lower(text), '[^a-zà-ÿ]+'), x -> len(x) > 0) AS toks
      |  FROM documents),
      |h AS (SELECT doc_id,
      |  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','zu'], x))) AS h_de,
      |  len(list_filter(toks, x -> list_contains(['the','and','of','to','is','that','it','with','for'], x))) AS h_en,
      |  len(list_filter(toks, x -> list_contains(['el','la','los','las','que','y','es','en','un','una','por'], x))) AS h_es,
      |  len(list_filter(toks, x -> list_contains(['le','la','les','et','est','que','des','une','dans','pour'], x))) AS h_fr,
      |  len(list_filter(toks, x -> list_contains(['il','la','che','di','e','un','una','per','non','sono'], x))) AS h_it
      |  FROM t),
      |x AS (SELECT doc_id, greatest(h_de, h_en, h_es, h_fr, h_it) AS mx,
      |      h_de, h_en, h_es, h_fr, h_it FROM h)
      |SELECT doc_id,
      |  CASE WHEN mx > 0 THEN (CASE WHEN h_de = mx THEN 'de' WHEN h_en = mx THEN 'en'
      |    WHEN h_es = mx THEN 'es' WHEN h_fr = mx THEN 'fr' ELSE 'it' END)
      |  ELSE 'und' END AS pred_lang,
      |  CAST(mx AS BIGINT) AS marker_hits
      |FROM x""".stripMargin

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

    "gb_vxm" ->
      s"""WITH a AS ($edgesBiSql),
         |u AS (SELECT src AS id, CAST(sum(w) AS DOUBLE) AS v FROM a GROUP BY src)
         |SELECT a.dst AS id, CAST(sum(u.v * a.w) AS DOUBLE) AS y
         |FROM a JOIN u ON a.src = u.id GROUP BY a.dst""".stripMargin,

    "gb_vxm_salted" ->
      s"""WITH a AS ($edgesBiSql),
         |u AS (SELECT src AS id, CAST(sum(w) AS DOUBLE) AS v FROM a GROUP BY src)
         |SELECT a.dst AS id, CAST(sum(u.v * a.w) AS DOUBLE) AS y
         |FROM a JOIN u ON a.src = u.id GROUP BY a.dst""".stripMargin,

    "gb_extract_index" ->
      s"""WITH a AS ($edgesBiSql),
         |im AS (SELECT * FROM (VALUES (7, 0), (3, 1), (21, 2), (3, 3), (50, 4),
         |       (11, 5)) v(id, pos)),
         |jm AS (SELECT * FROM (VALUES (${PartOffset + 5}, 0), (${PartOffset + 40}, 1),
         |       (${PartOffset + 17}, 2), (${PartOffset + 200}, 3), (${PartOffset + 1}, 4),
         |       (${PartOffset + 333}, 5), (${PartOffset + 77}, 6)) v(id, pos))
         |SELECT CAST(im.pos AS BIGINT) AS src, CAST(jm.pos AS BIGINT) AS dst, a.w
         |FROM a JOIN im ON a.src = im.id JOIN jm ON a.dst = jm.id""".stripMargin,

    // strided rows i = 2:3:50 (k = (src-2)/3), backwards cols j = hi:-7:lo
    // (l = (hi-dst)/7); `//` = DuckDB integral division (exact: the modulo
    // filter guarantees divisibility)
    "gb_extract_stride" ->
      s"""SELECT CAST((src - 2) // 3 AS BIGINT) AS src,
         |CAST((${PartOffset + 500} - dst) // 7 AS BIGINT) AS dst, w
         |FROM ($edgesBiSql)
         |WHERE src BETWEEN 2 AND 50 AND (src - 2) % 3 = 0
         |AND dst BETWEEN ${PartOffset + 1} AND ${PartOffset + 500}
         |AND (${PartOffset + 500} - dst) % 7 = 0""".stripMargin,

    "gb_assign_row" ->
      s"""WITH a AS ($edgesBiSql),
         |u AS (SELECT dst AS id, CAST(sum(w) AS DOUBLE) AS v FROM a GROUP BY dst)
         |SELECT src, dst, w FROM a WHERE src <> 7
         |UNION ALL SELECT CAST(7 AS BIGINT) AS src, id AS dst, v AS w FROM u""".stripMargin,

    "gb_assign_col" ->
      s"""WITH a AS ($edgesBiSql),
         |u AS (SELECT src AS id, CAST(sum(w) AS DOUBLE) AS v FROM a GROUP BY src)
         |SELECT src, dst, w FROM a WHERE dst <> ${PartOffset + 7}
         |UNION ALL SELECT id AS src, CAST(${PartOffset + 7} AS BIGINT) AS dst, v AS w FROM u""".stripMargin,

    "gb_subassign_masked" ->
      s"""WITH c AS ($edgesBiSql), n AS ($nationAdjSql),
         |aa AS (SELECT src, dst, w * 5.0 AS w FROM n),
         |m AS (SELECT src, dst FROM n WHERE src % 2 = 0)
         |SELECT src, dst, w FROM c
         |WHERE NOT (src BETWEEN 1 AND 32 AND dst BETWEEN ${PartOffset + 1} AND ${PartOffset + 32})
         |UNION ALL
         |SELECT aa.src + 1 AS src, aa.dst + ${PartOffset + 1} AS dst, aa.w
         |FROM aa JOIN m ON aa.src = m.src AND aa.dst = m.dst
         |UNION ALL
         |SELECT c.src, c.dst, c.w FROM c
         |WHERE src BETWEEN 1 AND 32 AND dst BETWEEN ${PartOffset + 1} AND ${PartOffset + 32}
         |AND NOT EXISTS (SELECT 1 FROM m
         |                WHERE m.src = c.src - 1 AND m.dst = c.dst - ${PartOffset + 1})""".stripMargin,

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

    "gb_mxm_masked_dot3" ->
      s"""WITH a AS ($edgesBiSql), m AS (SELECT * FROM ($edgesSupSql) WHERE src < 20)
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

    "gb_dup_resize" ->
      s"""SELECT src, dst, w FROM ($nationAdjSql)
         |WHERE src < 20 AND dst < 12""".stripMargin,

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

    "gb_argmin" ->
      s"""SELECT src AS id, dst AS arg, w AS v FROM (
         |  SELECT src, dst, w,
         |  row_number() OVER (PARTITION BY src ORDER BY w ASC, dst ASC) AS rn
         |  FROM ($edgesBiSql)) WHERE rn = 1""".stripMargin,

    "gb_set_elements" ->
      s"""WITH c AS ($edgesBiSql), n AS ($nationAdjSql),
         |u AS (SELECT src + 1 AS src, dst + ${PartOffset + 1} AS dst, w FROM n)
         |SELECT COALESCE(c.src, u.src) AS src, COALESCE(c.dst, u.dst) AS dst,
         |COALESCE(u.w, c.w) AS w
         |FROM c FULL OUTER JOIN u ON c.src = u.src AND c.dst = u.dst""".stripMargin,

    "gb_remove_elements" ->
      s"""SELECT src, dst, w FROM ($edgesBiSql) WHERE w < 4.0""",

    "gb_isequal" ->
      s"""SELECT true AS eq_self,
         |(SELECT count(*) FROM ($edgesBiSql) WHERE w > 3.0) = 0 AS eq_clamped""".stripMargin,

    "gb_sort_topk" ->
      s"""SELECT * FROM (
         |  SELECT src, dst, w,
         |  row_number() OVER (PARTITION BY src ORDER BY w DESC, dst ASC) AS k
         |  FROM ($edgesBiSql)) WHERE k <= 3""".stripMargin,

    "gb_sort_perm" ->
      s"""SELECT src, CAST(k - 1 AS BIGINT) AS dst, CAST(dst AS DOUBLE) AS w FROM (
         |  SELECT src, dst,
         |  row_number() OVER (PARTITION BY src ORDER BY w ASC, dst ASC) AS k
         |  FROM ($edgesBiSql))""".stripMargin,

    "gb_sort_by" ->
      s"""SELECT src, dst, CAST(k AS INT) AS k FROM (
         |  SELECT src, dst,
         |  row_number() OVER (PARTITION BY src ORDER BY abs(w - 50.0) ASC, dst ASC) AS k
         |  FROM ($edgesBiSql))""".stripMargin,

    "gb_apply_special" ->
      s"""SELECT src, dst, round(lgamma(w), 6) AS lg, round(gamma(w / 2.0), 6) AS g,
         |round(1.0, 6) AS erf_id FROM ($edgesBiSql)""".stripMargin,

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

    // converged-fixpoint oracles (sf0.01 constants, like algo_pagerank_iters):
    // the converged run stops at iteration 2 there (delta 7.8e-7 < 1e-6 with a
    // 22% margin), so its state IS the unrolled-2 prefix; LPA and k-truss hit
    // their fixpoints within 5 resp. 3 rounds on the sf0.01 co-supplier graph
    // (a fixpoint state equals ANY unrolling at or past convergence)
    "algo_pagerank" -> pagerankUnrolledSql(2),
    "algo_labelprop" -> labelPropUnrolledSql(5),
    "algo_ktruss" -> ktrussUnrolledSql(4, 3),
    "algo_pagerank5w" -> pagerankUnrolledSql(5, weighted = true),

    "algo_ktruss3" -> ktrussUnrolledSql(4, 3),

    // link-analysis layer over the sparse arithmetic fixture
    "algo_lcc" -> lccSql,
    "algo_linkpred" -> linkpredSql,
    "algo_kcore4" -> kcoreUnrolledSql(4, 3),
    "algo_coreness" -> corenessUnrolledSql(5, 4),
    "algo_trussness" -> trussnessUnrolledSql(6, 4),
    "algo_simrank3" -> simrankUnrolledSql(3),
    "algo_mis_lcg" -> misUnrolledSql(24),
    "sample_fanout" -> fanoutSql(2, 7L),
    "sample_negatives" -> negativesSql(2, 8, 7L),
    "gb_rich_club" -> richClubSql,
    "sample_fanout2" ->
      s"""WITH h1 AS MATERIALIZED (${fanoutSql(2, 7L)}),
         |h2 AS MATERIALIZED (${fanoutSql(2, 8L)})
         |SELECT h1.src AS root, h1.dst AS h1, h2.dst AS h2
         |FROM h1 JOIN h2 ON h2.src = h1.dst""".stripMargin,
    "algo_hits5" -> hitsUnrolledSql(5),
    "algo_ppr5" -> pagerankUnrolledSql(5, seeds = Seq(1L, 3L, 7L)),
    // three independent unrolled PPR chains (identical math to algo_ppr5),
    // tagged with pid and restricted to the nonzero support the engine's
    // sparse state materializes (zeros are EXACT on both sides: base 0 +
    // 0.85·COALESCE(NULL,0))
    "algo_ppr_multi" -> Seq(
        1L -> Seq(1L, 3L), 2L -> Seq(7L), 3L -> Seq(2L, 5L))
      .map { case (pid, ss) =>
        s"""SELECT $pid AS pid, id, r FROM (
           |${pagerankUnrolledSql(5, seeds = ss)}
           |) t$pid WHERE r <> 0""".stripMargin }
      .mkString("\nUNION ALL\n"),
    "algo_randomwalk" -> randomWalkSql(4),
    "algo_node2vec" -> node2vecSql(4),
    "algo_widest" -> widestSql,
    "gb_graph_stats" -> graphStatsSql,
    "algo_scc" -> sccSql,
    "gb_modularity" -> modularitySql,
    "gb_assortativity" -> assortativitySql,
    "algo_msbfs" -> msbfsSql,
    "algo_triad_census" -> triadCensusSql,
    // re-derives the FULL sketch state: ≤4-step out-ball membership →
    // per-(vertex, sketch) ρ bit sets → lowest missing bit → Σ_j
    "algo_anf_lcg4" ->
      s"""WITH RECURSIVE e AS MATERIALIZED (SELECT src, dst FROM ($edgesArithDirSql)),
         |verts AS MATERIALIZED (SELECT DISTINCT v FROM
         |  (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |walk AS (
         |  SELECT v, v AS u, 0 AS d FROM verts
         |  UNION
         |  SELECT w.v, e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.u WHERE w.d < 4),
         |dmin AS MATERIALIZED (SELECT v, u, MIN(d) AS d FROM walk GROUP BY v, u),
         |js AS (SELECT CAST(j AS BIGINT) AS j FROM range(16) t(j)),
         |rho AS MATERIALIZED (
         |  SELECT u, j, CASE WHEN x = 0 THEN 62
         |               ELSE CAST(log2(x & (-x)) AS BIGINT) END AS r
         |  FROM (SELECT verts.v AS u, js.j,
         |          ((verts.v % 1000000007) * 1000003 + 7919 * js.j + 12345)
         |            % 1000000007 AS x
         |        FROM verts CROSS JOIN js)),
         |hs AS (SELECT CAST(h AS BIGINT) AS h FROM range(5) t(h)),
         |bits AS MATERIALIZED (SELECT DISTINCT d.v, r.j, hs.h, r.r
         |  FROM dmin d JOIN rho r ON r.u = d.u CROSS JOIN hs WHERE d.d <= hs.h),
         |keys AS (SELECT DISTINCT v, j, h FROM bits),
         |cs AS (SELECT CAST(c AS BIGINT) AS c FROM range(64) t(c)),
         |grid AS (SELECT k.v, k.j, k.h, cs.c FROM keys k CROSS JOIN cs),
         |low AS (SELECT g.v, g.j, g.h, MIN(g.c) AS r FROM grid g
         |        ANTI JOIN bits b ON b.v = g.v AND b.j = g.j AND b.h = g.h AND b.r = g.c
         |        GROUP BY 1, 2, 3)
         |SELECT h, v AS id, CAST(SUM(r) AS BIGINT) AS rsum
         |FROM low GROUP BY h, v""".stripMargin,

    "algo_transreduce" ->
      s"""WITH RECURSIVE e AS MATERIALIZED (
         |  SELECT src, dst FROM ($edgesArithDirSql) WHERE src < dst),
         |reach AS (
         |  SELECT src AS a, dst AS b FROM e
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b),
         |p2 AS (SELECT DISTINCT e.src, r.b AS dst
         |       FROM e JOIN reach r ON r.a = e.dst)
         |SELECT src, dst FROM e ANTI JOIN p2 USING (src, dst)""".stripMargin,
    // longest-path layering: self-referential recursive CTE (UNION dedups
    // there), layer = max path length ending at the vertex
    "algo_toposort" ->
      s"""WITH RECURSIVE e AS MATERIALIZED (
         |  SELECT src, dst FROM ($edgesArithDirSql) WHERE src < dst),
         |v AS (SELECT DISTINCT id FROM (
         |  SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
         |p AS (
         |  SELECT id, CAST(0 AS BIGINT) AS len FROM v
         |  UNION
         |  SELECT e.dst, p.len + 1 FROM p JOIN e ON e.src = p.id),
         |l AS (SELECT id, max(len) AS layer FROM p GROUP BY id)
         |SELECT id, layer,
         |  CAST(row_number() OVER (ORDER BY layer, id) AS BIGINT) AS ord
         |FROM l""".stripMargin,

    // earliest arrival enumerates every (vertex, arrival-time) event of a
    // strictly-increasing-ts path, then mins; equal to the engine's gated
    // min-arrival relaxation because earliest arrival at u enables a
    // SUPERSET of the departures any later arrival does
    "algo_temporal" ->
      s"""WITH RECURSIVE e AS MATERIALIZED (
         |  SELECT src, dst, (37*src + 53*dst) % 16 AS ts
         |  FROM ($edgesArithDirSql)),
         |r AS (
         |  SELECT CAST(0 AS BIGINT) AS id, CAST(-1 AS BIGINT) AS t
         |  UNION
         |  SELECT e.dst, e.ts FROM r JOIN e ON e.src = r.id AND e.ts > r.t)
         |SELECT id, CAST(min(t) AS BIGINT) AS arrival FROM r GROUP BY id""".stripMargin,

    "algo_centrality" -> centralitySql,
    "algo_louvain_l1" -> louvainL1Sql(6),
    "algo_coloring" -> coloringUnrolledSql(32),
    "algo_matching" -> matchingUnrolledSql(32),
    "algo_boruvka" -> boruvkaUnrolledSql(8, 8),
    "algo_katz5" -> katzUnrolledSql(5),
    "gb_reciprocity" -> reciprocitySql,
    "algo_edge_jaccard" -> edgeJaccardSql,
    "algo_condensation" -> condensationSql,
    "algo_bowtie" -> bowtieSql,
    "algo_spam_mass" -> spamMassSql,
    "algo_antitrust5" -> antiTrustSql(5),
    "gb_conductance" -> conductanceSql,

    // mirrors GraphStats.sweepCut over the degree-descending ordering:
    // row_number rank, edge enters at its later endpoint's rank, prefix
    // sums of degree/internal edges, one final division
    "algo_sweep" ->
      s"""WITH canon AS MATERIALIZED (SELECT src, dst FROM ($edgesArithSql)),
         |und AS (SELECT src AS v FROM canon UNION ALL SELECT dst FROM canon),
         |deg AS (SELECT v AS id, count(*) AS score FROM und GROUP BY 1),
         |rk AS (SELECT id, score,
         |         row_number() OVER (ORDER BY score DESC, id ASC) AS pos
         |       FROM deg),
         |eh AS (SELECT greatest(ra.pos, rb.pos) AS pos, count(*) AS icnt
         |       FROM canon c
         |       JOIN rk ra ON ra.id = c.src JOIN rk rb ON rb.id = c.dst
         |       GROUP BY 1),
         |mm AS (SELECT count(*) AS m FROM canon),
         |base AS (SELECT rk.pos, rk.id, rk.score, rk.score AS deg,
         |           coalesce(eh.icnt, 0) AS icnt
         |         FROM rk LEFT JOIN eh USING (pos)),
         |cum AS (SELECT pos, id, score,
         |          sum(deg) OVER (ORDER BY pos) AS vol,
         |          sum(icnt) OVER (ORDER BY pos) AS inte
         |        FROM base)
         |SELECT CAST(pos AS BIGINT) AS pos, id, CAST(score AS BIGINT) AS score,
         |  CAST(vol AS BIGINT) AS vol, CAST(vol - 2*inte AS BIGINT) AS cut,
         |  round(CASE WHEN least(vol, 2*mm.m - vol) = 0 THEN 0.0
         |        ELSE CAST(vol - 2*inte AS DOUBLE) / least(vol, 2*mm.m - vol)
         |        END, 8) AS conductance
         |FROM cum, mm""".stripMargin,
    "algo_wl_refine" -> wlRefineSql(3),
    "gb_4cliques" -> fourCliquesSql,
    "algo_tricount_est" -> tricountEstSql(2),
    "gb_egonet" -> egonetSql,
    "gb_percolation" -> percolationSql(Seq(0, 5, 10, 20)),
    "gb_hopplot" ->
      s"""WITH RECURSIVE canon AS MATERIALIZED (SELECT src, dst FROM ($edgesArithSql)),
         |und AS (SELECT src AS s, dst AS d FROM canon UNION ALL SELECT dst, src FROM canon),
         |verts AS (SELECT DISTINCT s AS v FROM und),
         |r AS (
         |  SELECT v AS s, v, 0 AS d FROM verts
         |  UNION
         |  SELECT r.s, und.d, r.d + 1 FROM r JOIN und ON und.s = r.v WHERE r.d < 300),
         |mind AS (SELECT s, v, MIN(d) AS dist FROM r GROUP BY s, v),
         |hist AS (SELECT dist, count(*) AS pairs FROM mind WHERE dist > 0 GROUP BY dist)
         |SELECT CAST(dist AS BIGINT) AS dist, CAST(pairs AS BIGINT) AS pairs,
         |  CAST(SUM(pairs) OVER (ORDER BY dist) AS BIGINT) AS cum_pairs
         |FROM hist ORDER BY dist""".stripMargin,

    // effective diameter: integer pct selection over the hopplot histogram
    "gb_eff_diameter" ->
      s"""WITH RECURSIVE canon AS MATERIALIZED (SELECT src, dst FROM ($edgesArithSql)),
         |und AS (SELECT src AS s, dst AS d FROM canon UNION ALL SELECT dst, src FROM canon),
         |verts AS (SELECT DISTINCT s AS v FROM und),
         |r AS (
         |  SELECT v AS s, v, 0 AS d FROM verts
         |  UNION
         |  SELECT r.s, und.d, r.d + 1 FROM r JOIN und ON und.s = r.v WHERE r.d < 300),
         |mind AS (SELECT s, v, MIN(d) AS dist FROM r GROUP BY s, v),
         |hist AS (SELECT dist, count(*) AS pairs FROM mind WHERE dist > 0 GROUP BY dist),
         |cum AS (SELECT dist, pairs, SUM(pairs) OVER (ORDER BY dist) AS cum_pairs FROM hist),
         |tot AS (SELECT CAST(sum(pairs) AS BIGINT) AS total_pairs FROM hist)
         |SELECT tot.total_pairs,
         |  CAST((SELECT min(dist) FROM cum, tot
         |        WHERE cum_pairs * 100 >= tot.total_pairs * 90) AS BIGINT) AS eff_diameter,
         |  CAST((SELECT max(dist) FROM hist) AS BIGINT) AS diameter
         |FROM tot""".stripMargin,
    "gb_powerlaw_alpha" ->
      s"""WITH canon AS MATERIALIZED (SELECT src, dst FROM ($edgesArithSql)),
         |und AS (SELECT src AS a, dst AS b FROM canon UNION ALL SELECT dst, src FROM canon),
         |deg AS (SELECT a, count(*) AS deg FROM und GROUP BY a),
         |t AS (SELECT count(*) AS n, sum(ln(CAST(deg AS DOUBLE) / 1.5)) AS s
         |      FROM deg WHERE deg >= 2)
         |SELECT CAST(2 AS BIGINT) AS dmin, CAST(n AS BIGINT) AS n_tail,
         |  round(1.0 + CAST(n AS DOUBLE) / s, 6) AS alpha FROM t""".stripMargin,
    "algo_eigen5" -> eigenUnrolledSql(5),
    "algo_fiedler8" -> fiedlerUnrolledSql(8),
    "algo_hitting6" -> hittingUnrolledSql(6, Seq(1L, 3L, 7L)),
    "algo_densest" -> densestUnrolledSql(12),

    // mirrors Bipartite.run: comp = min reachable id (recursive closure),
    // side = BFS level from the comp root mod 2, odd edge = same-side edge
    "algo_bipartite" ->
      s"""WITH RECURSIVE canon AS MATERIALIZED (
         |  SELECT least(src, dst) AS src, greatest(src, dst) AS dst
         |  FROM ($edgesArithSql) WHERE src <> dst),
         |und AS (SELECT src AS s, dst AS d FROM canon UNION SELECT dst, src FROM canon),
         |verts AS (SELECT DISTINCT s AS v FROM und),
         |reach(node, lab) AS (
         |  SELECT v, v FROM verts
         |  UNION
         |  SELECT und.d, reach.lab FROM reach JOIN und ON und.s = reach.node),
         |comp AS MATERIALIZED (SELECT node AS id, min(lab) AS comp FROM reach GROUP BY node),
         |roots AS (SELECT DISTINCT comp AS r FROM comp),
         |walk(v, dist) AS (
         |  SELECT r, 0 FROM roots
         |  UNION
         |  SELECT und.d, walk.dist + 1 FROM walk JOIN und ON und.s = walk.v
         |  WHERE walk.dist < 600),
         |lev AS (SELECT v AS id, min(dist) AS dist FROM walk GROUP BY v),
         |side AS MATERIALIZED (SELECT comp.id, comp.comp, lev.dist % 2 AS side
         |  FROM comp JOIN lev ON lev.id = comp.id),
         |odd AS (SELECT s1.comp, count(*) AS odd_edges FROM canon
         |  JOIN side s1 ON s1.id = canon.src JOIN side s2 ON s2.id = canon.dst
         |  WHERE s1.side = s2.side GROUP BY s1.comp)
         |SELECT side.id, side.comp, CAST(side.side AS BIGINT) AS side,
         |  CAST(COALESCE(odd.odd_edges, 0) AS BIGINT) AS odd_edges,
         |  CAST(CASE WHEN COALESCE(odd.odd_edges, 0) = 0 THEN 1 ELSE 0 END AS BIGINT)
         |    AS bipartite
         |FROM side LEFT JOIN odd ON odd.comp = side.comp""".stripMargin,
    "gb_degree_hist" -> degreeHistSql,
    "algo_cocitation" -> cocitationSql(common = "src", paired = "dst"),
    "algo_bibcoupling" -> cocitationSql(common = "dst", paired = "src"),
    "gb_butterfly" ->
      s"""WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ($edgesBiSql)),
         |p AS (SELECT l.src AS a, r.src AS b, count(*) AS n
         |      FROM e l JOIN e r ON l.dst = r.dst AND l.src < r.src GROUP BY 1, 2)
         |SELECT CAST(COALESCE(SUM(n*(n-1)//2), 0) AS BIGINT) AS butterflies FROM p""".stripMargin,
    "gb_contract" -> contractSql,
    "algo_salsa5" -> salsaUnrolledSql(5),

    "gb_col_extract" ->
      s"""SELECT src AS id, w AS v FROM ($edgesBiSql) WHERE dst = ${PartOffset + 7}""",
    "gb_row_extract" ->
      s"""SELECT dst AS id, w AS v FROM ($edgesBiSql) WHERE src = 7""",

    "algo_cc" -> ccFullSql,
    // the incremental path must land on the BATCH answer for the same graph
    "algo_cc_delta" -> ccFullSql,

    // path-graph BC closed form: vertex i sits on i·(24−i) shortest pairs
    "algo_betweenness" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id,
        |round(CAST(n_nationkey * (24 - n_nationkey) AS DOUBLE), 6) AS bc
        |FROM nation""".stripMargin,

    // path-graph EDGE BC closed form: (i+1)·(24−i) unordered pairs cross
    // edge (i, i+1)
    "algo_edge_betweenness" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS u,
        |CAST(n_nationkey + 1 AS BIGINT) AS v,
        |round(CAST((n_nationkey + 1) * (24 - n_nationkey) AS DOUBLE), 6) AS ebc
        |FROM nation WHERE n_nationkey < 24""".stripMargin,

    // Brandes-Pich pivot estimate on the path: δ_s(v) has the closed form
    // (v>s: 24−v; v<s: v; else 0); halve (both-endpoint convention) and
    // scale by n/|S| = 5
    "algo_betweenness_est" ->
      """WITH verts AS (SELECT CAST(n_nationkey AS BIGINT) AS v FROM nation),
        |piv AS (SELECT CAST(s AS BIGINT) AS s FROM (VALUES (0),(5),(10),(15),(20)) t(s)),
        |dep AS (SELECT verts.v, sum(CASE WHEN verts.v > piv.s THEN 24 - verts.v
        |                                 WHEN verts.v < piv.s THEN verts.v
        |                                 ELSE 0 END) AS dsum
        |        FROM verts CROSS JOIN piv GROUP BY verts.v)
        |SELECT v AS id, round(CAST(dsum AS DOUBLE) / 2.0 * 5.0, 6) AS bc_est
        |FROM dep""".stripMargin,

    // the sf0.01 bipartite graph's mimic-derived convergence constant:
    // delta crosses 1e-6 at iteration 2 (1.93e-5 → 7.8e-7; the 22% margin
    // to the threshold makes the count parallelism-independent)
    "algo_pagerank_iters" -> "SELECT CAST(2 AS BIGINT) AS iters",

    // FastSV reaches the identical fixpoint (exact min component id)
    "algo_cc_fastsv" ->
      s"""WITH RECURSIVE e AS (SELECT src, dst FROM ($edgesSupSql)),
         |und AS (SELECT src AS s, dst AS d FROM e UNION SELECT dst, src FROM e),
         |verts AS (SELECT DISTINCT s AS v FROM und),
         |reach(node, lab) AS (
         |  SELECT v, v FROM verts
         |  UNION
         |  SELECT und.d, reach.lab FROM reach JOIN und ON und.s = reach.node)
         |SELECT node AS id, min(lab) AS comp FROM reach GROUP BY node""".stripMargin,

    // levels via recursive CTE; parent(v) = min neighbor one level up (the
    // min-determinized any.first of bfs.m:149-167); source parents itself
    "algo_bfs" ->
      s"""WITH RECURSIVE e AS (SELECT src, dst FROM ($edgesSupSql)),
         |und AS (SELECT src AS s, dst AS d FROM e UNION SELECT dst, src FROM e),
         |reach(node, lvl) AS (
         |  SELECT CAST(1 AS BIGINT), 0
         |  UNION
         |  SELECT und.d, reach.lvl + 1 FROM reach JOIN und ON und.s = reach.node
         |  WHERE reach.lvl < 25),
         |lv AS (SELECT node AS id, CAST(min(lvl) AS INT) AS level FROM reach GROUP BY node),
         |par AS (SELECT u.d AS id, min(u.s) AS parent
         |        FROM und u JOIN lv a ON a.id = u.s JOIN lv b ON b.id = u.d
         |        WHERE b.level = a.level + 1 GROUP BY u.d)
         |SELECT l.id, l.level, COALESCE(p.parent, CAST(1 AS BIGINT)) AS parent
         |FROM lv l LEFT JOIN par p ON p.id = l.id""".stripMargin,

    // double-sweep diameter: two chained recursive-CTE BFS passes — the
    // second seeded from the first's (max level, min id) argmax
    "algo_diameter" ->
      s"""WITH RECURSIVE e AS (SELECT src, dst FROM ($edgesSupSql)),
         |und AS (SELECT src AS s, dst AS d FROM e UNION SELECT dst, src FROM e),
         |reach(node, lvl) AS (
         |  SELECT CAST(1 AS BIGINT), 0
         |  UNION
         |  SELECT und.d, reach.lvl + 1 FROM reach JOIN und ON und.s = reach.node
         |  WHERE reach.lvl < 25),
         |lv AS (SELECT node, min(lvl) AS lvl FROM reach GROUP BY node),
         |far AS (SELECT node AS fid, lvl AS flvl FROM lv
         |        ORDER BY lvl DESC, node LIMIT 1),
         |reach2(node, lvl) AS (
         |  SELECT fid, 0 FROM far
         |  UNION
         |  SELECT und.d, reach2.lvl + 1 FROM reach2 JOIN und ON und.s = reach2.node
         |  WHERE reach2.lvl < 25)
         |SELECT CAST(1 AS BIGINT) AS seed, far.fid AS far_id,
         |  CAST(far.flvl AS INT) AS far_level,
         |  CAST((SELECT max(lvl) FROM (
         |    SELECT node, min(lvl) AS lvl FROM reach2 GROUP BY node)) AS INT)
         |    AS diameter_lb
         |FROM far""".stripMargin,

    "algo_labelprop5" -> labelPropUnrolledSql(5),

    "algo_dnn" ->
      s"""WITH y0 AS ($edgesBiSql),
         |w1 AS (SELECT CAST(n_nationkey + $PartOffset AS BIGINT) AS src,
         |       CAST(n_regionkey AS BIGINT) AS dst, 0.5 AS w FROM nation),
         |y1p AS (SELECT y0.src, w1.dst, sum(y0.w * w1.w) AS w
         |        FROM y0 JOIN w1 ON y0.dst = w1.src GROUP BY 1, 2),
         |y1 AS (SELECT src, dst, CASE WHEN w > 32 THEN 32 ELSE w END AS w
         |       FROM (SELECT src, dst, w + (-0.2) AS w FROM y1p) WHERE w > 0),
         |w2 AS (SELECT CAST(n_regionkey AS BIGINT) AS src,
         |       CAST(n_nationkey AS BIGINT) AS dst, 0.25 AS w FROM nation),
         |y2p AS (SELECT y1.src, w2.dst, sum(y1.w * w2.w) AS w
         |        FROM y1 JOIN w2 ON y1.dst = w2.src GROUP BY 1, 2),
         |y2 AS (SELECT src, dst, CASE WHEN w > 32 THEN 32 ELSE w END AS w
         |       FROM (SELECT src, dst, w + 0.1 AS w FROM y2p) WHERE w > 0)
         |SELECT src, dst, round(w, 6) AS w FROM y2""".stripMargin,

    "algo_bellman8" -> bellmanUnrolledSql(8),

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

    "dedup_exact_clusters" ->
      """SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep_id
        |FROM documents""".stripMargin,

    // mirrors Eval.purityByCluster over the ann_kmeans chain: per-cluster
    // label counts, majority ties to the smallest label, all integers
    "eval_purity" ->
      s"""WITH ${kmeansCtes(4, 2)},
        |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
        |cnt AS (SELECT a.cid AS cluster, lab.label, count(*) AS c
        |        FROM a2 a JOIN lab USING (vec_id) GROUP BY 1, 2),
        |rk AS (SELECT cluster, label, c,
        |  row_number() OVER (PARTITION BY cluster ORDER BY c DESC, label ASC) AS rn
        |  FROM cnt)
        |SELECT CAST(cluster AS BIGINT) AS cluster, CAST(sum(c) AS BIGINT) AS size,
        |  max(CASE WHEN rn = 1 THEN label END) AS majority_label,
        |  CAST(max(CASE WHEN rn = 1 THEN c END) AS BIGINT) AS majority_cnt
        |FROM rk GROUP BY cluster""".stripMargin,

    // mirrors Eval.silhouetteInt8 over the ann_kmeans chain: exact integer
    // pairwise d², one division per mean, order-free min, fixed s chain
    "eval_silhouette" ->
      s"""WITH ${kmeansCtes(4, 2)},
        |per AS (SELECT a.vec_id AS i, a.cid AS ci, bq.cid AS cj,
        |  CAST(sum(list_sum(list_transform(range(1, len(a.x)+1),
        |    t -> (a.x[t]-bq.x[t])*(a.x[t]-bq.x[t])))) AS BIGINT) AS sd,
        |  count(*) AS c
        |  FROM a2 a JOIN a2 bq ON a.vec_id <> bq.vec_id
        |  GROUP BY 1, 2, 3),
        |aa AS (SELECT i, CAST(sd AS DOUBLE) / c AS a FROM per WHERE cj = ci),
        |bb AS (SELECT i, min(CAST(sd AS DOUBLE) / c) AS b FROM per
        |       WHERE cj <> ci GROUP BY i)
        |SELECT v.vec_id, CAST(v.cid AS BIGINT) AS cluster,
        |  CASE WHEN aa.a IS NULL OR bb.b IS NULL THEN 0.0
        |       WHEN greatest(aa.a, bb.b) = 0.0 THEN 0.0
        |       ELSE (bb.b - aa.a) / greatest(aa.a, bb.b) END AS s
        |FROM a2 v LEFT JOIN aa ON aa.i = v.vec_id
        |          LEFT JOIN bb ON bb.i = v.vec_id""".stripMargin,

    // mirrors Eval.clusterAgreement over the SimHash-vs-MinHash LCG
    // clusterings: exact integer pair sums (a, sa, sb, C(n,2)), Rand as one
    // division, ARI as the Hubert–Arabie chain with the expected index
    // computed identically on both sides
    "eval_cluster_ari" ->
      s"""WITH sc AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY simhash) AS ra
        |  FROM ($simhashLcgSql) s0),
        |mc AS (SELECT doc_id, rep_id AS rb FROM (${minhashClustersLcgSql(14)}) q),
        |j AS (SELECT sc.doc_id, ra, rb FROM sc JOIN mc USING (doc_id)),
        |pa AS (SELECT CAST(sum(c*(c-1)//2) AS BIGINT) AS a FROM
        |       (SELECT count(*) AS c FROM j GROUP BY ra, rb)),
        |ma AS (SELECT CAST(sum(c*(c-1)//2) AS BIGINT) AS sa FROM
        |       (SELECT count(*) AS c FROM j GROUP BY ra)),
        |mb AS (SELECT CAST(sum(c*(c-1)//2) AS BIGINT) AS sb FROM
        |       (SELECT count(*) AS c FROM j GROUP BY rb)),
        |nn AS (SELECT count(*) AS n, CAST(count(*)*(count(*)-1)//2 AS BIGINT) AS c2n FROM j)
        |SELECT n,
        |  CAST(c2n + 2*a - sa - sb AS DOUBLE) / CAST(c2n AS DOUBLE) AS rand_index,
        |  (CAST(a AS DOUBLE) - CAST(sa*sb AS DOUBLE) / CAST(c2n AS DOUBLE))
        |    / (CAST(sa + sb AS DOUBLE) / 2.0
        |       - CAST(sa*sb AS DOUBLE) / CAST(c2n AS DOUBLE)) AS ari
        |FROM nn, pa, ma, mb""".stripMargin,

    // mirrors Dedup.dedupStats: every column a count or byte sum — the near
    // side replays the full dedup_minhash_clusters_lcg chain in a subquery
    "dedup_stats" ->
      s"""WITH ex AS (
        |  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep_id,
        |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS b
        |  FROM documents),
        |s1 AS (SELECT count(*) AS n_docs, CAST(sum(b) AS BIGINT) AS total_bytes,
        |  count(DISTINCT rep_id) AS exact_unique,
        |  CAST(sum(CASE WHEN doc_id <> rep_id THEN 1 ELSE 0 END) AS BIGINT) AS exact_dup_docs,
        |  CAST(sum(CASE WHEN doc_id <> rep_id THEN b ELSE 0 END) AS BIGINT) AS exact_dup_bytes
        |  FROM ex),
        |s2 AS (SELECT count(DISTINCT rep_id) AS near_clusters,
        |  CAST(sum(CASE WHEN doc_id <> rep_id THEN 1 ELSE 0 END) AS BIGINT) AS near_dup_docs
        |  FROM (${minhashClustersLcgSql(14)}) mcq)
        |SELECT s1.n_docs, s1.total_bytes, s1.exact_unique, s1.exact_dup_docs,
        |  s1.exact_dup_bytes, s2.near_clusters, s2.near_dup_docs
        |FROM s1, s2""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |CAST(len(list_filter(regexp_split_to_array(text, '\s+'), t -> len(t) > 0)) AS BIGINT) AS ws_tokens,
        |CAST(len(list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'), t -> len(t) > 0)) AS BIGINT) AS alnum_runs,
        |CAST(ceil(len(regexp_replace(text, '\s+', '', 'g')) / 4.0) AS BIGINT) AS bpe_est
        |FROM documents""".stripMargin,

    // the learned 4-merge BPE schedule, full unrolled replay
    "text_bpe_train" -> {
      val rows = (1 to 4).map(r =>
        s"SELECT CAST($r AS BIGINT) AS merge_rank, l AS lft, r AS rgt, CAST(cnt AS BIGINT) AS cnt FROM b$r")
        .mkString("\nUNION ALL ")
      s"WITH ${bpeChainSql(4)}\n$rows"
    },

    // tokenize with the learned schedule: join word occurrences to the
    // round-4 rewritten vocabulary, sum symbol counts per document
    "text_bpe_apply" ->
      s"""WITH ${bpeChainSql(4)},
         |dw AS (SELECT doc_id,
         |  unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
         |         t -> len(t) > 0)) AS w FROM documents)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS words,
         |  CAST(sum(len(s4.syms)) AS BIGINT) AS bpe_tokens
         |FROM dw JOIN s4 USING (w) GROUP BY doc_id""".stripMargin,

    // mirrors TextStats.qualityScores exactly (same op order so the float
    // results are bit-identical; round(,6) on both sides regardless)
    "text_quality" ->
      s"""WITH $qualityCtesSql
         |SELECT * FROM qual""".stripMargin,

    // mirrors TextStats.charEntropy: per-doc char counts via per-row list
    // algebra (no unnest — same shape as the engine's zero-shuffle plan),
    // char-sorted left-to-right fold from 0.0 pins the fp addition order
    "text_entropy" ->
      """WITH c AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(text, ''), x -> len(x) > 0) AS cs
        |  FROM documents),
        |k AS (SELECT doc_id, len(cs) AS n,
        |  list_sort(list_transform(list_distinct(cs),
        |    cc -> struct_pack(ch := cc,
        |      cnt := len(list_filter(cs, x -> x = cc))))) AS counts
        |  FROM c)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
        |  CASE WHEN n = 0 THEN 0.0
        |       ELSE ln(CAST(n AS DOUBLE))
        |          - list_reduce(list_prepend(0.0, list_transform(counts,
        |              s -> CAST(s.cnt AS DOUBLE) * ln(CAST(s.cnt AS DOUBLE)))),
        |              (a, b) -> a + b) / CAST(n AS DOUBLE)
        |  END AS h_nats
        |FROM k""".stripMargin,

    // mirrors TextStats.ttr: per-row list algebra, one division per ratio
    "text_ttr" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents),
        |m AS (SELECT doc_id, len(tk) AS n_tokens,
        |  len(list_distinct(tk)) AS n_types,
        |  len(list_filter(list_distinct(tk),
        |    u -> len(list_filter(tk, x -> x = u)) = 1)) AS hapax_cnt
        |  FROM t)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_types AS BIGINT) AS n_types,
        |  CAST(hapax_cnt AS BIGINT) AS hapax_cnt,
        |  CASE WHEN n_tokens = 0 THEN 0.0
        |       ELSE CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) END AS ttr,
        |  CASE WHEN n_types = 0 THEN 0.0
        |       ELSE CAST(hapax_cnt AS DOUBLE) / CAST(n_types AS DOUBLE) END AS hapax_ratio
        |FROM m""".stripMargin,

    // mirrors TextStats.repetitionScores. The top-bigram share is expressed
    // the natural SQL way (unnest + groupBy + max) — value-identical to the
    // engine's sorted-run aggregate, which exists only to avoid the shuffle
    "text_repetition" ->
      """WITH t AS (SELECT doc_id, text,
        |  list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
        |              l -> len(l) > 0) AS lines,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |b AS (SELECT doc_id, text, lines, toks,
        |  CASE WHEN len(toks) >= 2
        |       THEN list_transform(toks[1:len(toks)-1], (x, i) -> x || ' ' || toks[i+1])
        |       ELSE [] END AS bigrams
        |  FROM t),
        |tb AS (SELECT doc_id, max(c) AS top_bg FROM (
        |         SELECT doc_id, count(*) AS c
        |         FROM (SELECT doc_id, UNNEST(bigrams) AS bg FROM b) GROUP BY doc_id, bg)
        |       GROUP BY doc_id),
        |m AS (SELECT b.doc_id,
        |  CAST(len(lines) AS DOUBLE) AS nl,
        |  CAST(len(list_distinct(lines)) AS DOUBLE) AS nld,
        |  CAST(list_sum(list_transform(lines, l -> len(l))) AS DOUBLE) AS call,
        |  CAST(list_sum(list_transform(list_distinct(lines), l -> len(l))) AS DOUBLE) AS cdist,
        |  CAST(len(list_filter(lines, l -> list_contains(['-','*','•'], l[1:1]))) AS DOUBLE) AS nbul,
        |  CAST(len(list_filter(lines, l -> ends_with(l, '...') OR ends_with(l, '…'))) AS DOUBLE) AS nell,
        |  CAST(len(toks) AS DOUBLE) AS ntok,
        |  (len(b.text) - len(replace(b.text, '#', ''))) / 1.0 AS chash,
        |  (len(b.text) - len(replace(b.text, '...', ''))) / 3.0 AS cdots,
        |  (len(b.text) - len(replace(b.text, '…', ''))) / 1.0 AS cell,
        |  CAST(len(bigrams) AS DOUBLE) AS nbg,
        |  CAST(coalesce(tb.top_bg, 0) AS DOUBLE) AS topbg
        |  FROM b LEFT JOIN tb ON tb.doc_id = b.doc_id)
        |SELECT doc_id, CAST(nl AS BIGINT) AS n_lines,
        |  round(CASE WHEN nl > 0 THEN 1.0 - nld / nl ELSE 0.0 END, 6) AS dup_line_frac,
        |  round(CASE WHEN call > 0 THEN 1.0 - cdist / call ELSE 0.0 END, 6) AS dup_line_char_frac,
        |  round(CASE WHEN nl > 0 THEN nbul / nl ELSE 0.0 END, 6) AS bullet_line_frac,
        |  round(CASE WHEN nl > 0 THEN nell / nl ELSE 0.0 END, 6) AS ellipsis_line_frac,
        |  round(CASE WHEN ntok > 0 THEN (chash + cdots + cell) / ntok ELSE 0.0 END, 6) AS symbol_word_ratio,
        |  round(CASE WHEN nbg > 0 THEN topbg / nbg ELSE 0.0 END, 6) AS top_bigram_frac
        |FROM m""".stripMargin,

    // the NAIVE global-window spelling of packSequences — the oracle pins
    // the engine's two-level scan (5 ranges at sf0.01) to exact equality
    "text_pack_sequences" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |  CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
        |  FROM t)
        |SELECT doc_id, n_tok, start_tok,
        |  CAST(start_tok // 512 AS BIGINT) AS seq_first,
        |  CAST(CASE WHEN n_tok > 0 THEN (start_tok + n_tok - 1) // 512
        |            ELSE start_tok // 512 END AS BIGINT) AS seq_last
        |FROM c""".stripMargin,

    // exact Lehmer slot arithmetic — reproducible in any engine by design
    "text_sample_strata" ->
      """SELECT doc_id, lang FROM documents
        |WHERE (doc_id * 48271) % 10000 <
        |  CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 10000
        |            WHEN 'fr' THEN 2500 WHEN 'es' THEN 1000 ELSE 0 END""".stripMargin,

    // the engine's two-level distributed rank == the naive global sort rank
    "text_shuffle_order" ->
      """SELECT doc_id, shuffle_key,
        |  CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 AS BIGINT)
        |    AS shuffle_rank
        |FROM (SELECT doc_id,
        |        (doc_id % 2147483647) * 48271 % 2147483647 AS shuffle_key
        |      FROM documents)""".stripMargin,

    // mirrors TextStats.temperatureSample at τ=2: integer counts, exact
    // integer weights floor(sqrt(n_s·10⁶)), one IEEE-identical double
    // expression for the rate, Lehmer slot draw
    "text_temperature_sample" ->
      """WITH c AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
        |r AS (SELECT source, n_s,
        |        CAST(floor(sqrt(CAST(n_s AS DOUBLE) * 1000000.0)) AS BIGINT) AS wgt
        |      FROM c),
        |rr AS (SELECT source,
        |         least(1.0, 0.3 * CAST((SELECT sum(n_s) FROM r) AS DOUBLE)
        |           * CAST(wgt AS DOUBLE)
        |           / (CAST((SELECT sum(wgt) FROM r) AS DOUBLE) * CAST(n_s AS DOUBLE)))
        |           AS rate
        |       FROM r)
        |SELECT d.doc_id, d.source FROM documents d JOIN rr USING (source)
        |WHERE (d.doc_id * 48271 + 11213) % 10000 < floor(rate * 10000.0)""".stripMargin,

    // same planted PII, same RE2-safe patterns; DuckDB regexp_replace needs
    // the explicit 'g' flag (Spark replaces all matches by default)
    "text_redact_pii" ->
      """WITH planted AS (SELECT doc_id,
        |  text || ' reach user' || CAST(doc_id AS VARCHAR) || '@mail.example via 10.'
        |       || CAST(doc_id % 200 AS VARCHAR) || '.0.1 tel +1 555 01'
        |       || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS text
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+[0-9][0-9 ()-]{6,}[0-9]', '<PHONE>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text,
        |    '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(text,
        |    '\+[0-9][0-9 ()-]{6,}[0-9]')) AS BIGINT) AS n_phones
        |FROM planted""".stripMargin,

    // add-k unigram LM with the same deterministic top-V vocabulary
    // (count desc, token asc); ln/avg agree to well inside round(,6)
    "text_unigram_lm" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS tok FROM documents),
        |c AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
        |v AS (SELECT tok, c FROM c ORDER BY c DESC, tok ASC LIMIT 20),
        |tot AS (SELECT (SELECT sum(c) FROM c) AS n_total,
        |               (SELECT count(*) FROM v) AS v),
        |s AS (SELECT t.doc_id,
        |        -ln((CAST(coalesce(v.c, 0) AS DOUBLE) + 0.5) /
        |            (CAST(tot.n_total AS DOUBLE) + 0.5 * (CAST(tot.v AS DOUBLE) + 1.0)))
        |          AS nlp
        |      FROM t LEFT JOIN v USING (tok), tot)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |       round(avg(nlp), 6) AS mean_nlp
        |FROM s GROUP BY doc_id""".stripMargin,

    // mirrors TextStats.fingerprintsLcg: dense-rank token ids in position
    // order, LCG fold replayed via list_reduce with a prepended 0 seed
    "text_fingerprint_lcg" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> len(x) > 0) AS tk FROM documents),
        |s AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, tk[i] AS tok
        |      FROM t, UNNEST(range(1, len(tk) + 1)) AS u(i)),
        |vocab AS (SELECT tok, CAST(dense_rank() OVER (ORDER BY tok) - 1 AS BIGINT) AS sid
        |          FROM (SELECT DISTINCT tok FROM s)),
        |m AS (SELECT s.doc_id, s.pos, v.sid FROM s JOIN vocab v USING (tok))
        |SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list(sid ORDER BY pos)),
        |    (a, x) -> (a * 8191 + x + 1) % 2147483647) AS fingerprint,
        |  CAST(count(*) AS BIGINT) AS n_tokens
        |FROM m GROUP BY doc_id""".stripMargin,

    // sliding-window chunking replayed with list_slice; chunk count is the
    // same exact-integer ceil((n-64)/48) both sides
    "text_chunks" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> len(x) > 0) AS tk FROM documents),
        |b AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n
        |      FROM t WHERE len(tk) > 0),
        |c AS (SELECT doc_id, tk, CAST(j AS BIGINT) AS chunk_id
        |      FROM b, UNNEST(range(0, (greatest(0, n - 64) + 47) // 48 + 1)) AS u(j))
        |SELECT doc_id, chunk_id, chunk_id * 48 AS start_tok,
        |  CAST(len(list_slice(tk, chunk_id*48 + 1, chunk_id*48 + 64)) AS BIGINT) AS n_tok_chunk,
        |  array_to_string(list_slice(tk, chunk_id*48 + 1, chunk_id*48 + 64), ' ') AS chunk_text
        |FROM c""".stripMargin,

    // winnowing: LCG gram hashes as rows, frame min over w=5 grams,
    // rightmost minimal picked by a frame-bounded join — the same two-phase
    // relational plan the engine runs
    "text_winnow" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> len(x) > 0) AS tk FROM documents),
        |s AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, tk[i] AS tok
        |      FROM t, UNNEST(range(1, len(tk) + 1)) AS u(i)),
        |vocab AS (SELECT tok, CAST(dense_rank() OVER (ORDER BY tok) - 1 AS BIGINT) AS sid
        |          FROM (SELECT DISTINCT tok FROM s)),
        |sl AS (SELECT doc_id, list(sid ORDER BY pos) AS sids
        |       FROM s JOIN vocab USING (tok) GROUP BY doc_id),
        |g AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS gpos,
        |        list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(sids, i, i + 3)),
        |          (a, x) -> (a * 8191 + x + 1) % 2147483647) AS gh
        |      FROM sl, UNNEST(range(1, len(sids) - 4 + 2)) AS u(i)
        |      WHERE len(sids) >= 4),
        |f AS (SELECT doc_id, gpos, gh,
        |        min(gh) OVER (PARTITION BY doc_id ORDER BY gpos
        |                      ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS minh,
        |        count(*) OVER (PARTITION BY doc_id) AS ng
        |      FROM g),
        |wf AS (SELECT * FROM f WHERE gpos <= ng - 5),
        |p AS (SELECT wf.doc_id, wf.gpos AS ws, wf.minh AS fp, max(g2.gpos) AS pos
        |      FROM wf JOIN g g2 ON g2.doc_id = wf.doc_id
        |        AND g2.gpos BETWEEN wf.gpos AND wf.gpos + 4 AND g2.gh = wf.minh
        |      GROUP BY 1, 2, 3)
        |SELECT DISTINCT doc_id, pos, fp FROM p""".stripMargin,

    // prefix-blocked exact Levenshtein verify (capped blocks, a < b)
    "dedup_edit_verify" ->
      """WITH k AS (SELECT doc_id, substring(text, 1, 32) AS blk,
        |                  substring(text, 1, 256) AS head FROM documents),
        |cap AS (SELECT blk FROM k GROUP BY blk HAVING count(*) <= 64),
        |c AS (SELECT k.* FROM k JOIN cap USING (blk))
        |SELECT x.doc_id AS a, y.doc_id AS b,
        |  CAST(levenshtein(x.head, y.head) AS BIGINT) AS dist
        |FROM c x JOIN c y ON x.blk = y.blk AND x.doc_id < y.doc_id""".stripMargin,

    // interpolated bigram LM over the same OOV-mapped stream; identical
    // expression tree (λ·(a/b) + (1−λ)·(c/d), parenthesized divisions) so
    // the doubles match bit-for-bit before the final round
    "text_bigram_lm" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> len(x) > 0) AS tk FROM documents),
        |s AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, tk[i] AS tok
        |      FROM t, UNNEST(range(1, len(tk) + 1)) AS u(i)),
        |c AS (SELECT tok, count(*) AS c FROM s GROUP BY tok),
        |vb AS (SELECT tok FROM c ORDER BY c DESC, tok ASC LIMIT 20),
        |m AS (SELECT s.doc_id, s.pos,
        |        CASE WHEN vb.tok IS NULL THEN '<oov>' ELSE s.tok END AS m
        |      FROM s LEFT JOIN vb ON vb.tok = s.tok),
        |uni AS (SELECT m, count(*) AS cu FROM m GROUP BY m),
        |tot AS (SELECT (SELECT sum(cu) FROM uni) AS n_total,
        |               (SELECT count(*) FROM uni) AS v),
        |tr AS (SELECT x.doc_id, x.m AS p, y.m AS q FROM m x
        |       JOIN m y ON y.doc_id = x.doc_id AND y.pos = x.pos + 1),
        |bi AS (SELECT p, q, count(*) AS cb FROM tr GROUP BY p, q),
        |sc AS (SELECT tr.doc_id,
        |    -ln(0.75 * ((CAST(cb AS DOUBLE) + 0.5) /
        |          (CAST(up.cu AS DOUBLE) + 0.5 * (CAST(tot.v AS DOUBLE) + 1.0)))
        |      + 0.25 * ((CAST(uq.cu AS DOUBLE) + 0.5) /
        |          (CAST(tot.n_total AS DOUBLE) + 0.5 * (CAST(tot.v AS DOUBLE) + 1.0)))) AS nlp
        |  FROM tr JOIN bi USING (p, q)
        |  JOIN uni up ON up.m = tr.p JOIN uni uq ON uq.m = tr.q, tot)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trans,
        |       round(avg(nlp), 6) AS mean_nlp
        |FROM sc GROUP BY doc_id""".stripMargin,

    // decontamination vs the doc_id%97 eval slice: distinct 3-grams per doc,
    // matched = grams also present anywhere in the eval slice
    "text_contamination" ->
      """WITH toks AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents),
        |g AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS g
        |      FROM toks, UNNEST(range(1, len(tk) - 1)) AS u(i)),
        |bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
        |base AS (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0),
        |tot AS (SELECT doc_id, count(*) AS n_grams FROM g
        |        WHERE doc_id % 97 <> 0 GROUP BY doc_id),
        |m AS (SELECT doc_id, count(*) AS matched FROM g
        |      WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM bench)
        |      GROUP BY doc_id)
        |SELECT b.doc_id, coalesce(t.n_grams, 0) AS n_grams,
        |       coalesce(m.matched, 0) AS matched,
        |       CAST(coalesce(t.n_grams, 0) > 0 AND
        |            CAST(coalesce(m.matched, 0) AS DOUBLE) / t.n_grams >= 0.1
        |            AS INT) AS contaminated
        |FROM base b LEFT JOIN tot t USING (doc_id) LEFT JOIN m USING (doc_id)""".stripMargin,

    // mirrors TextStats.dupSpans: w=7 grams with corpus count >= 2 mark
    // their windows; overlapping-or-adjacent windows merge per doc
    "text_dup_spans" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> len(x) > 0) AS tk FROM documents),
        |g AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
        |        array_to_string(tk[i:i+6], ' ') AS gram
        |      FROM t, UNNEST(range(1, len(tk) - 5)) AS u(i) WHERE len(tk) >= 7),
        |hv AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        |h AS (SELECT doc_id, pos, pos + 6 AS e FROM g
        |      WHERE gram IN (SELECT gram FROM hv)),
        |m AS (SELECT doc_id, pos, e, max(e) OVER (PARTITION BY doc_id ORDER BY pos
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM h),
        |i AS (SELECT doc_id, pos, e,
        |        SUM(CASE WHEN pm IS NULL OR pos > pm + 1 THEN 1 ELSE 0 END)
        |          OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM m)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        |       CAST(max(e) AS BIGINT) AS span_end
        |FROM i GROUP BY doc_id, island""".stripMargin,

    // delta (doc_id%10 >= 8) content not present in the base snapshot
    "dedup_incremental" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents
        |WHERE doc_id % 10 >= 8 AND text NOT IN
        |  (SELECT text FROM documents WHERE doc_id % 10 < 8)
        |GROUP BY text""".stripMargin,

    // mirrors TextStats.pmiBigrams: exact integer counts, one ln
    "text_pmi" ->
      """WITH tkt AS (SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
        |                    t -> len(t) > 0) AS tk FROM documents),
        |pairs AS (SELECT tk[i] AS t1, tk[i+1] AS t2
        |          FROM tkt, UNNEST(range(1, len(tk))) AS u0(i)),
        |big AS (SELECT t1, t2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
        |toks AS (SELECT t, count(*) AS c
        |         FROM (SELECT unnest(tk) AS t FROM tkt) GROUP BY 1),
        |tot AS (SELECT (SELECT sum(c12) FROM big) AS nb,
        |               (SELECT sum(c) FROM toks) AS nt)
        |SELECT b.t1, b.t2, CAST(b.c12 AS BIGINT) AS c12,
        |  CAST(a1.c AS BIGINT) AS c1, CAST(a2.c AS BIGINT) AS c2,
        |  round(ln(CAST(CAST(b.c12 AS DECIMAL(38,0)) * nt * nt AS DOUBLE)
        |        / CAST(CAST(nb AS DECIMAL(38,0)) * a1.c * a2.c AS DOUBLE)), 8) AS pmi
        |FROM big b JOIN toks a1 ON a1.t = b.t1 JOIN toks a2 ON a2.t = b.t2, tot
        |WHERE b.c12 >= 2""".stripMargin,

    // TextRank = the unrolled weighted-PageRank chain over the word graph
    "text_textrank5" -> {
      val base =
        """SELECT least(tk[i], tk[i+1]) AS u, greatest(tk[i], tk[i+1]) AS v
          |FROM (SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
          |             t -> len(t) > 0) AS tk FROM documents),
          |UNNEST(range(1, len(tk))) AS u0(i)
          |WHERE tk[i] <> tk[i+1]""".stripMargin
      val canon = s"SELECT u, v, CAST(count(*) AS DOUBLE) AS w FROM ($base) GROUP BY 1, 2"
      val wordEdges =
        s"SELECT u AS src, v AS dst, w FROM ($canon) UNION ALL SELECT v, u, w FROM ($canon)"
      // scores are L1-normalized before rounding: the count-normalized
      // weighted iteration grows mass to ~1e7, where 8-dp rounding would
      // sit below fp-noise; shares are O(1e-2) with noise at 1e-17. The
      // window sum runs the iteration chain once, not per-row
      s"""SELECT id AS term, round(r / sum(r) OVER (), 8) AS r
         |FROM (${pagerankUnrolledSql(5, weighted = true, edgesSql = wordEdges,
        rawFinal = true)})""".stripMargin
    },

    // mirrors TextStats.tfidfTopTerms: same tokenization, sklearn idf
    // smoothing, rank on the ROUNDED score with term tie-break
    "text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, t.term FROM documents,
        |  unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS t(term)),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |         round(tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |rk AS (SELECT doc_id, term, tf, tfidf,
        |       row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk FROM scored)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, tfidf, CAST(rk AS BIGINT) AS rk
        |FROM rk WHERE rk <= 5""".stripMargin,

    // mirrors TextStats.bm25: dyadic k1=5/4 b=3/4 (so k1+1 = 2.25 and
    // 1-b = 0.25 are exact), Lucene non-negative idf, rank on the rounded
    // score with doc_id tie-break
    "text_bm25" ->
      s"""WITH $bm25CtesSql
        |SELECT doc_id, bm25, CAST(rk AS BIGINT) AS rk FROM rk WHERE rk <= 20""".stripMargin,

    // reciprocal-rank fusion (Cormack et al. 2009) of the BM25 top-20 and
    // the quality-score top-20: score = Σ 1/(60 + rank) over the lists a
    // doc appears in; integer ranks, two exact divisions, doc_id ties
    "text_rrf" ->
      s"""WITH $bm25CtesSql,
        |$qualityCtesSql,
        |qrank AS (SELECT doc_id,
        |  row_number() OVER (ORDER BY quality DESC, doc_id) AS rk FROM qual),
        |fused AS (
        |  SELECT COALESCE(a.doc_id, q.doc_id) AS doc_id,
        |    COALESCE(a.rk, 0) AS rk_a, COALESCE(q.rk, 0) AS rk_b,
        |    COALESCE(1.0 / (60 + a.rk), 0.0) + COALESCE(1.0 / (60 + q.rk), 0.0) AS rrf
        |  FROM (SELECT doc_id, rk FROM rk WHERE rk <= 20) a
        |  FULL OUTER JOIN (SELECT doc_id, rk FROM qrank WHERE rk <= 20) q
        |    ON a.doc_id = q.doc_id)
        |SELECT * FROM (
        |  SELECT doc_id, CAST(rk_a AS BIGINT) AS rk_a, CAST(rk_b AS BIGINT) AS rk_b,
        |    round(rrf, 8) AS rrf,
        |    CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS fused_rk
        |  FROM fused)
        |WHERE fused_rk <= 20""".stripMargin,

    // C4-style span scrub: 10-token chunk grid (cid = pos/10, last chunk
    // short), boilerplate = chunk text in ≥2 DISTINCT docs, doc rebuilt
    // from kept chunks in cid order (string_agg skips the removed NULLs
    // exactly like the engine's null-skipping collect_list)
    "text_span_scrub" ->
      s"""WITH tk AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0) AS tk
        |  FROM documents),
        |ch AS (SELECT doc_id, unnest(
        |    CASE WHEN len(tk) = 0 THEN [] ELSE range((len(tk) - 1) // 10 + 1) END) AS cid,
        |    tk FROM tk),
        |c2 AS (SELECT doc_id, cid,
        |    array_to_string(tk[cid * 10 + 1 : cid * 10 + 10], ' ') AS chunk FROM ch),
        |boiler AS (SELECT chunk FROM c2 GROUP BY chunk
        |           HAVING count(DISTINCT doc_id) >= 2),
        |f AS (SELECT c2.doc_id, c2.cid, c2.chunk, (b.chunk IS NOT NULL) AS dup
        |      FROM c2 LEFT JOIN boiler b USING (chunk))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |  COALESCE(string_agg(CASE WHEN NOT dup THEN chunk END, ' ' ORDER BY cid), '')
        |    AS text_scrub
        |FROM f GROUP BY doc_id""".stripMargin,

    // α = 1/2 domain mixing: integer token sums per source; p is one
    // division; the sqrt-sum denominator is the same source-ordered
    // list_reduce fold the engine pins with array_sort + aggregate
    "text_domain_mix" ->
      s"""WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(list_filter(regexp_split_to_array(text, '\\s+'),
        |      x -> len(x) > 0))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |d AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tok_total,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(sqrt(CAST(n_tokens AS DOUBLE)) ORDER BY source)),
        |      (a, x) -> a + x) AS sq_total
        |  FROM s)
        |SELECT source, n_docs, n_tokens,
        |  CAST(n_tokens AS DOUBLE) / CAST(tok_total AS DOUBLE) AS p,
        |  sqrt(CAST(n_tokens AS DOUBLE)) / sq_total AS w
        |FROM s CROSS JOIN d""".stripMargin,

    // per-language KL(P_lang ‖ P_corpus) over the top-24 vocabulary with
    // add-one smoothing; the langs × vocab grid materializes zero counts,
    // and the Σ p·ln(p/q) fold is term-ordered exactly like the engine's
    "text_kl_drift" ->
      s"""WITH toks AS (SELECT lang, t.term FROM documents,
        |  unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |    x -> len(x) > 0)) AS t(term)),
        |vocab AS (SELECT term, CAST(count(*) AS BIGINT) AS gcnt FROM toks
        |          GROUP BY 1 ORDER BY gcnt DESC, term LIMIT 24),
        |gtot AS (SELECT CAST(sum(gcnt) AS BIGINT) AS gtot FROM vocab),
        |lc AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS lcnt FROM toks
        |       WHERE term IN (SELECT term FROM vocab) GROUP BY 1, 2),
        |grid AS (SELECT l.lang, v.term, v.gcnt, COALESCE(c.lcnt, 0) AS lcnt
        |  FROM (SELECT DISTINCT lang FROM documents) l
        |  CROSS JOIN vocab v
        |  LEFT JOIN lc c ON c.lang = l.lang AND c.term = v.term),
        |nl AS (SELECT lang, CAST(sum(lcnt) AS BIGINT) AS nl FROM grid GROUP BY 1),
        |pq AS (SELECT grid.lang, grid.term,
        |    CAST(lcnt + 1 AS DOUBLE) / CAST(nl + 24 AS DOUBLE) AS p,
        |    CAST(gcnt + 1 AS DOUBLE) / CAST(gtot + 24 AS DOUBLE) AS q
        |  FROM grid JOIN nl USING (lang) CROSS JOIN gtot),
        |g AS (SELECT lang, term, p * ln(p / q) AS g FROM pq),
        |k AS (SELECT lang, list_reduce(
        |    list_prepend(CAST(0.0 AS DOUBLE), list(g ORDER BY term)),
        |    (a, x) -> a + x) AS kl_nats
        |  FROM g GROUP BY 1)
        |SELECT k.lang, nl.nl AS n_vocab_tokens, k.kl_nats
        |FROM k JOIN nl USING (lang)""".stripMargin,

    // SCC of the repo quotient graph: transitive closure (self-referential
    // CTE dedups) + mutual-reachability pairs; a repo's cycle = its mutual
    // set plus itself — identical to the engine's SCC min-label grouping
    "corpus_repo_cycles" ->
      s"""WITH RECURSIVE $corpusNamedCte,
         |redges AS (SELECT DISTINCT src_repo, dst_repo FROM named
         |           WHERE src_repo <> dst_repo),
         |repos AS (SELECT DISTINCT
         |  'org' || CAST((i % 13) % 7 AS VARCHAR) || '/repo' || CAST(i % 13 AS VARCHAR) AS repo
         |  FROM base),
         |reach AS (
         |  SELECT src_repo AS a, dst_repo AS b FROM redges
         |  UNION
         |  SELECT r.a, e.dst_repo FROM reach r JOIN redges e ON e.src_repo = r.b),
         |mutual AS (SELECT x.a, x.b FROM reach x
         |           JOIN reach y ON y.a = x.b AND y.b = x.a),
         |members AS (SELECT repo, repo AS m FROM repos
         |            UNION ALL SELECT a, b FROM mutual)
         |SELECT repo, min(m) AS cycle_rep,
         |  CAST(count(DISTINCT m) AS BIGINT) AS cycle_size
         |FROM members GROUP BY repo""".stripMargin,

    // mirrors Corpus.buildLayers: STRONG repo edges (≥16 import lines),
    // the repo_cycles SCC chain on the thresholded graph, condensation
    // edges between representatives, then recursive longest-path layers
    // (the algo_toposort (max,+) oracle pattern on the condensation DAG)
    "corpus_build_layers" ->
      s"""WITH RECURSIVE $corpusNamedCte,
         |redges AS (SELECT src_repo, dst_repo FROM named
         |           WHERE src_repo <> dst_repo
         |           GROUP BY 1, 2 HAVING count(*) >= 16),
         |repos AS (SELECT DISTINCT
         |  'org' || CAST((i % 13) % 7 AS VARCHAR) || '/repo' || CAST(i % 13 AS VARCHAR) AS repo
         |  FROM base),
         |reach AS (
         |  SELECT src_repo AS a, dst_repo AS b FROM redges
         |  UNION
         |  SELECT r.a, e.dst_repo FROM reach r JOIN redges e ON e.src_repo = r.b),
         |mutual AS (SELECT x.a, x.b FROM reach x
         |           JOIN reach y ON y.a = x.b AND y.b = x.a),
         |members AS (SELECT repo, repo AS m FROM repos
         |            UNION ALL SELECT a, b FROM mutual),
         |cyc AS (SELECT repo, min(m) AS cycle_rep,
         |  CAST(count(DISTINCT m) AS BIGINT) AS cycle_size
         |  FROM members GROUP BY repo),
         |cedges AS (SELECT DISTINCT a.cycle_rep AS src, b.cycle_rep AS dst
         |  FROM redges e JOIN cyc a ON a.repo = e.src_repo
         |  JOIN cyc b ON b.repo = e.dst_repo
         |  WHERE a.cycle_rep <> b.cycle_rep),
         |creps AS (SELECT DISTINCT cycle_rep AS rep FROM cyc),
         |p AS (
         |  SELECT rep, CAST(0 AS BIGINT) AS len FROM creps
         |  UNION
         |  SELECT e.dst, p.len + 1 FROM p JOIN cedges e ON e.src = p.rep),
         |lay AS (SELECT rep, max(len) AS layer FROM p GROUP BY rep)
         |SELECT c.repo, c.cycle_rep, c.cycle_size,
         |  CAST(l.layer AS BIGINT) AS build_layer
         |FROM cyc c JOIN lay l ON l.rep = c.cycle_rep""".stripMargin,

    // symbol index: the arith corpus declares exactly `def body_<i>` per
    // file, so the regexp extraction replays as 'body_' || i; fan-in counts
    // DISTINCT importing files (deriveEdgesNamed's grouped rows)
    "corpus_symbol_xref" ->
      s"""WITH $corpusNamedCte,
         |fpairs AS (SELECT DISTINCT src_repo, src_path, dst_repo, dst_path FROM named),
         |fanin AS (SELECT dst_repo AS repo, dst_path AS path, count(*) AS fi
         |          FROM fpairs GROUP BY 1, 2),
         |defs AS (SELECT
         |  'org' || CAST((i % 13) % 7 AS VARCHAR) || '/repo' || CAST(i % 13 AS VARCHAR) AS repo,
         |  'src/f' || CAST(i // 13 AS VARCHAR) || '.' || (['scala','c','py','go','rs'])[(i % 5) + 1] AS path,
         |  'body_' || CAST(i AS VARCHAR) AS symbol FROM base)
         |SELECT d.symbol, d.repo, d.path,
         |  CAST(coalesce(f.fi, 0) AS BIGINT) AS fan_in
         |FROM defs d LEFT JOIN fanin f USING (repo, path)""".stripMargin,

    // Martin coupling: Ca/Ce from the distinct cross-repo quotient edges,
    // instability from the exact integer counts, rounded to 6 dp
    "corpus_coupling" ->
      s"""WITH $corpusNamedCte,
         |redges AS (SELECT DISTINCT src_repo, dst_repo FROM named
         |           WHERE src_repo <> dst_repo),
         |repos AS (SELECT DISTINCT
         |  'org' || CAST((i % 13) % 7 AS VARCHAR) || '/repo' || CAST(i % 13 AS VARCHAR) AS repo
         |  FROM base),
         |ce AS (SELECT src_repo AS repo, count(*) AS ce FROM redges GROUP BY 1),
         |ca AS (SELECT dst_repo AS repo, count(*) AS ca FROM redges GROUP BY 1)
         |SELECT r.repo, CAST(coalesce(ca.ca, 0) AS BIGINT) AS ca,
         |  CAST(coalesce(ce.ce, 0) AS BIGINT) AS ce,
         |  CASE WHEN coalesce(ca.ca, 0) + coalesce(ce.ce, 0) = 0 THEN NULL
         |       ELSE round(CAST(coalesce(ce.ce, 0) AS DOUBLE)
         |                  / (coalesce(ca.ca, 0) + coalesce(ce.ce, 0)), 6)
         |  END AS instability
         |FROM repos r LEFT JOIN ca USING (repo) LEFT JOIN ce USING (repo)""".stripMargin,

    // mirrors Corpus.synthesizeArith + deriveEdgesNamed: DuckDB re-derives
    // the identical edge table from the same Lehmer formulas — the oracle
    // for the parse+resolve derivation itself (names are injective in the
    // file index, so the name self-loop filter equals i <> t)
    "corpus_edges_arith" ->
      """WITH base AS (SELECT range AS i FROM range(0, 500)),
        |tgt AS (
        |  SELECT b.i,
        |    CASE WHEN ((b.i+1)*48271 + (kk.k+1)*7919) % 1000003 % 4 = 0
        |      THEN ((b.i+1)*48271 + (kk.k+1)*7919) % 1000003 % greatest(1, b.i // 16 + 1)
        |      ELSE ((b.i+1)*48271 + (kk.k+1)*7919) % 1000003 % 500 END AS t
        |  FROM base b CROSS JOIN (SELECT range AS k FROM range(0, 4)) kk),
        |named AS (
        |  SELECT
        |    'org' || CAST((i % 13) % 7 AS VARCHAR) || '/repo' || CAST(i % 13 AS VARCHAR) AS src_repo,
        |    'src/f' || CAST(i // 13 AS VARCHAR) || '.' || (['scala','c','py','go','rs'])[(i % 5) + 1] AS src_path,
        |    'org' || CAST((t % 13) % 7 AS VARCHAR) || '/repo' || CAST(t % 13 AS VARCHAR) AS dst_repo,
        |    'src/f' || CAST(t // 13 AS VARCHAR) || '.' || (['scala','c','py','go','rs'])[(t % 5) + 1] AS dst_path
        |  FROM tgt WHERE i <> t)
        |SELECT src_repo, src_path, dst_repo, dst_path, CAST(count(*) AS BIGINT) AS w
        |FROM named GROUP BY 1, 2, 3, 4""".stripMargin,

    // mirrors Corpus.synthesizeArith's content formula and re-computes
    // sha256 with DuckDB's own hasher — independent row-level provenance
    "corpus_provenance_arith" ->
      """WITH base AS (SELECT range AS i FROM range(0, 500)),
        |tgt AS (
        |  SELECT b.i, kk.k,
        |    CASE WHEN ((b.i+1)*48271 + (kk.k+1)*7919) % 1000003 % 4 = 0
        |      THEN ((b.i+1)*48271 + (kk.k+1)*7919) % 1000003 % greatest(1, b.i // 16 + 1)
        |      ELSE ((b.i+1)*48271 + (kk.k+1)*7919) % 1000003 % 500 END AS t
        |  FROM base b CROSS JOIN (SELECT range AS k FROM range(0, 4)) kk),
        |lines AS (
        |  SELECT i, k, 'import ' ||
        |    'org' || CAST((t % 13) % 7 AS VARCHAR) || '/repo' || CAST(t % 13 AS VARCHAR) ||
        |    '/' || 'src/f' || CAST(t // 13 AS VARCHAR) || '.' ||
        |    (['scala','c','py','go','rs'])[(t % 5) + 1] AS line
        |  FROM tgt),
        |content AS (
        |  SELECT i, string_agg(line, chr(10) ORDER BY k) || chr(10) ||
        |    'def body_' || CAST(i AS VARCHAR) || '(): x = ' ||
        |    CAST((i*48271 + 11) % 1000 AS VARCHAR) || ' // ' ||
        |    repeat('filler ', 8) AS content
        |  FROM lines GROUP BY i)
        |SELECT
        |  'org' || CAST((i % 13) % 7 AS VARCHAR) || '/repo' || CAST(i % 13 AS VARCHAR) AS repo,
        |  'src/f' || CAST(i // 13 AS VARCHAR) || '.' ||
        |    (['scala','c','py','go','rs'])[(i % 5) + 1] AS path,
        |  sha256(content) AS sha, true AS ok
        |FROM content""".stripMargin,

    // mirrors Corpus.snapshotDiff over (synthesizeArith 500, V2 +40):
    // every status and commit is closed-form in i from the evolution rules —
    // if the engine's sha256-compare logic misclassified anything, the
    // statuses would disagree
    "corpus_snapshot_diff" ->
      """WITH base AS (SELECT range AS i FROM range(0, 540)),
        |st AS (SELECT i,
        |  CASE WHEN i >= 500 THEN 'added'
        |       WHEN i % 11 = 5 THEN 'deleted'
        |       WHEN i % 7 = 3 THEN 'modified'
        |       ELSE NULL END AS status
        |  FROM base),
        |d AS (SELECT i, status FROM st WHERE status IS NOT NULL)
        |SELECT
        |  'org' || CAST((i % 13) % 7 AS VARCHAR) || '/repo' || CAST(i % 13 AS VARCHAR) AS repo,
        |  'src/f' || CAST(i // 13 AS VARCHAR) || '.' || (['scala','c','py','go','rs'])[(i % 5) + 1] AS path,
        |  status,
        |  CASE WHEN status = 'added' THEN NULL
        |       ELSE CAST((i*69621 + 3) % 1000003 AS VARCHAR) END AS old_commit,
        |  CASE WHEN status = 'deleted' THEN NULL
        |       WHEN status = 'modified' THEN CAST((i*16807 + 17) % 1000003 AS VARCHAR)
        |       ELSE CAST((i*69621 + 3) % 1000003 AS VARCHAR) END AS new_commit
        |FROM d""".stripMargin,

    // the north-rule chain end to end: the named file graph above feeds the
    // unrolled 2-iteration PageRank replay (string vertices, unweighted);
    // the outer +1e-12 nudge mirrors the engine side — this graph's coarse
    // rational ranks land exactly on 8th-decimal halves otherwise
    "corpus_pagerank_arith" ->
      s"""SELECT id, round(r + 1e-12, 8) AS r FROM (
         |${pagerankUnrolledSql(2, rawFinal = true, edgesSql =
      """WITH base AS (SELECT range AS i FROM range(0, 500)),
        |tgt AS (
        |  SELECT b.i,
        |    CASE WHEN ((b.i+1)*48271 + (kk.k+1)*7919) % 1000003 % 4 = 0
        |      THEN ((b.i+1)*48271 + (kk.k+1)*7919) % 1000003 % greatest(1, b.i // 16 + 1)
        |      ELSE ((b.i+1)*48271 + (kk.k+1)*7919) % 1000003 % 500 END AS t
        |  FROM base b CROSS JOIN (SELECT range AS k FROM range(0, 4)) kk),
        |named AS (
        |  SELECT DISTINCT
        |    'org' || CAST((i % 13) % 7 AS VARCHAR) || '/repo' || CAST(i % 13 AS VARCHAR) ||
        |      '/' || 'src/f' || CAST(i // 13 AS VARCHAR) || '.' ||
        |      (['scala','c','py','go','rs'])[(i % 5) + 1] AS src,
        |    'org' || CAST((t % 13) % 7 AS VARCHAR) || '/repo' || CAST(t % 13 AS VARCHAR) ||
        |      '/' || 'src/f' || CAST(t // 13 AS VARCHAR) || '.' ||
        |      (['scala','c','py','go','rs'])[(t % 5) + 1] AS dst
        |  FROM tgt WHERE i <> t)
        |SELECT src, dst, 1.0 AS w FROM named""".stripMargin)})""".stripMargin,

    // repo quotient of the same derivation: cross-repo only, import
    // multiplicity summed, distinct file pairs counted
    "corpus_repo_graph" ->
      """WITH base AS (SELECT range AS i FROM range(0, 500)),
        |tgt AS (
        |  SELECT b.i,
        |    CASE WHEN ((b.i+1)*48271 + (kk.k+1)*7919) % 1000003 % 4 = 0
        |      THEN ((b.i+1)*48271 + (kk.k+1)*7919) % 1000003 % greatest(1, b.i // 16 + 1)
        |      ELSE ((b.i+1)*48271 + (kk.k+1)*7919) % 1000003 % 500 END AS t
        |  FROM base b CROSS JOIN (SELECT range AS k FROM range(0, 4)) kk),
        |named AS (
        |  SELECT
        |    'org' || CAST((i % 13) % 7 AS VARCHAR) || '/repo' || CAST(i % 13 AS VARCHAR) AS src_repo,
        |    'src/f' || CAST(i // 13 AS VARCHAR) || '.' || (['scala','c','py','go','rs'])[(i % 5) + 1] AS src_path,
        |    'org' || CAST((t % 13) % 7 AS VARCHAR) || '/repo' || CAST(t % 13 AS VARCHAR) AS dst_repo,
        |    'src/f' || CAST(t // 13 AS VARCHAR) || '.' || (['scala','c','py','go','rs'])[(t % 5) + 1] AS dst_path
        |  FROM tgt WHERE i <> t),
        |files AS (SELECT src_repo, src_path, dst_repo, dst_path, count(*) AS w
        |  FROM named GROUP BY 1, 2, 3, 4)
        |SELECT src_repo, dst_repo, CAST(sum(w) AS BIGINT) AS w,
        |  CAST(count(*) AS BIGINT) AS file_pairs
        |FROM files WHERE src_repo <> dst_repo GROUP BY 1, 2""".stripMargin,

    // mirrors Corpus.licenseTaint: bounded-depth recursive closure along
    // REVERSED import edges from the seed repo's files, min depth per file
    // (the self-referential CTE dedups states, so cycles stay finite under
    // the d <= 20 bound — identical to the engine's maxDepth)
    "corpus_license_taint" ->
      """WITH RECURSIVE base AS (SELECT range AS i FROM range(0, 500)),
        |tgt AS (
        |  SELECT b.i,
        |    CASE WHEN ((b.i+1)*48271 + (kk.k+1)*7919) % 1000003 % 4 = 0
        |      THEN ((b.i+1)*48271 + (kk.k+1)*7919) % 1000003 % greatest(1, b.i // 16 + 1)
        |      ELSE ((b.i+1)*48271 + (kk.k+1)*7919) % 1000003 % 500 END AS t
        |  FROM base b CROSS JOIN (SELECT range AS k FROM range(0, 4)) kk),
        |fedges AS (
        |  SELECT DISTINCT
        |    'org' || CAST((i % 13) % 7 AS VARCHAR) || '/repo' || CAST(i % 13 AS VARCHAR) AS src_repo,
        |    'src/f' || CAST(i // 13 AS VARCHAR) || '.' || (['scala','c','py','go','rs'])[(i % 5) + 1] AS src_path,
        |    'org' || CAST((t % 13) % 7 AS VARCHAR) || '/repo' || CAST(t % 13 AS VARCHAR) AS dst_repo,
        |    'src/f' || CAST(t // 13 AS VARCHAR) || '.' || (['scala','c','py','go','rs'])[(t % 5) + 1] AS dst_path
        |  FROM tgt WHERE i <> t),
        |allf AS (
        |  SELECT 'org' || CAST((i % 13) % 7 AS VARCHAR) || '/repo' || CAST(i % 13 AS VARCHAR) AS repo,
        |    'src/f' || CAST(i // 13 AS VARCHAR) || '.' || (['scala','c','py','go','rs'])[(i % 5) + 1] AS path
        |  FROM base),
        |reach(repo, path, d) AS (
        |  SELECT repo, path, 0 FROM allf WHERE repo = 'org0/repo0'
        |  UNION
        |  SELECT f.src_repo, f.src_path, r.d + 1
        |  FROM fedges f JOIN reach r ON f.dst_repo = r.repo AND f.dst_path = r.path
        |  WHERE r.d + 1 <= 20)
        |SELECT repo, path, CAST(min(d) AS BIGINT) AS depth
        |FROM reach GROUP BY 1, 2""".stripMargin,

    // mirrors Corpus.deadFiles: all files anti-joined against the resolved
    // import targets (names are injective in the file index)
    "corpus_dead_files" ->
      """WITH base AS (SELECT range AS i FROM range(0, 500)),
        |tgt AS (
        |  SELECT b.i,
        |    CASE WHEN ((b.i+1)*48271 + (kk.k+1)*7919) % 1000003 % 4 = 0
        |      THEN ((b.i+1)*48271 + (kk.k+1)*7919) % 1000003 % greatest(1, b.i // 16 + 1)
        |      ELSE ((b.i+1)*48271 + (kk.k+1)*7919) % 1000003 % 500 END AS t
        |  FROM base b CROSS JOIN (SELECT range AS k FROM range(0, 4)) kk),
        |dsts AS (
        |  SELECT DISTINCT
        |    'org' || CAST((t % 13) % 7 AS VARCHAR) || '/repo' || CAST(t % 13 AS VARCHAR) AS repo,
        |    'src/f' || CAST(t // 13 AS VARCHAR) || '.' || (['scala','c','py','go','rs'])[(t % 5) + 1] AS path
        |  FROM tgt WHERE i <> t),
        |allf AS (
        |  SELECT 'org' || CAST((i % 13) % 7 AS VARCHAR) || '/repo' || CAST(i % 13 AS VARCHAR) AS repo,
        |    'src/f' || CAST(i // 13 AS VARCHAR) || '.' || (['scala','c','py','go','rs'])[(i % 5) + 1] AS path
        |  FROM base)
        |SELECT a.repo, a.path FROM allf a
        |ANTI JOIN dsts d ON a.repo = d.repo AND a.path = d.path""".stripMargin,

    // mirrors TextStats.vocabCoverage: (count desc, token asc) rank prefix
    // sums — every column an exact integer
    "text_vocab_coverage" ->
      """WITH tok AS (SELECT unnest(list_filter(
        |    regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0)) AS tok
        |  FROM documents),
        |cnt AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
        |rk AS (SELECT tok, c,
        |  row_number() OVER (ORDER BY c DESC, tok ASC) - 1 AS rk FROM cnt),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total_occurrences,
        |        count(*) AS vocab_size FROM cnt),
        |kk AS (SELECT CAST(unnest([10, 100, 1000]) AS BIGINT) AS k)
        |SELECT kk.k, count(*) AS types, CAST(sum(rk.c) AS BIGINT) AS covered,
        |  tot.total_occurrences, tot.vocab_size
        |FROM kk JOIN rk ON rk.rk < kk.k CROSS JOIN tot
        |GROUP BY kk.k, tot.total_occurrences, tot.vocab_size""".stripMargin,

    // mirrors TextStats.topTermsExact's CERTIFIED output: the plain exact
    // top-k (what certification proves the bounded-memory path equals)
    "text_top_terms" ->
      """WITH toks AS (
        |  SELECT doc_id, t.term FROM documents,
        |  unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS t(term)),
        |cnt AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
        |rk AS (SELECT term, cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rk FROM cnt)
        |SELECT term, CAST(cnt AS BIGINT) AS cnt, CAST(rk AS BIGINT) AS rk,
        |  CAST(CASE WHEN (SELECT CAST(min(cnt) AS DOUBLE) FROM rk WHERE rk <= 20)
        |    > (SELECT n FROM n) / 4097.0 THEN 1 ELSE 0 END AS BIGINT) AS certified
        |FROM rk WHERE rk <= 20""".stripMargin,

    // mirrors TextStats.oovRate: top-16 vocabulary (count desc, term asc),
    // per-doc in/out token counts, one IEEE division; empty docs keep 0.0
    "text_oov_rate" ->
      """WITH toks AS (
        |  SELECT doc_id, t.term FROM documents,
        |  unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS t(term)),
        |vocab AS (SELECT term FROM (
        |  SELECT term, count(*) AS cnt FROM toks GROUP BY 1)
        |  ORDER BY cnt DESC, term LIMIT 16),
        |per_doc AS (SELECT doc_id, count(*) AS tok_cnt,
        |    sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS oov_cnt
        |  FROM toks LEFT JOIN vocab v ON v.term = toks.term GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(p.tok_cnt, 0) AS BIGINT) AS tok_cnt,
        |  CAST(COALESCE(p.oov_cnt, 0) AS BIGINT) AS oov_cnt,
        |  CASE WHEN COALESCE(p.tok_cnt, 0) = 0 THEN 0.0
        |       ELSE CAST(p.oov_cnt AS DOUBLE) / CAST(p.tok_cnt AS DOUBLE)
        |  END AS oov_rate
        |FROM documents d LEFT JOIN per_doc p USING (doc_id)""".stripMargin,

    // mirrors TextStats.langId: marker-word hits per language, argmax with
    // alphabetical tie-break (the CASE checks in alphabetical order)
    "text_langid" -> langidSql,

    // exact tie-aware ROC-AUC (Mann-Whitney with tie correction) of an
    // integer-exact score: signed Lehmer fold over the int8-quantized codes,
    // positives = label 0. Every count is an integer; one final division
    "eval_auc" ->
      s"""WITH $int8FoldScoredSql,
        |g AS (SELECT score AS s,
        |        sum(CASE WHEN pos THEN 1 ELSE 0 END) AS p_cnt,
        |        sum(CASE WHEN pos THEN 0 ELSE 1 END) AS n_cnt
        |      FROM lab GROUP BY 1),
        |cumt AS (SELECT s, p_cnt, n_cnt,
        |  sum(n_cnt) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n_le
        |  FROM g)
        |SELECT CAST(sum(p_cnt) AS BIGINT) AS p, CAST(sum(n_cnt) AS BIGINT) AS n,
        |  CAST(sum(p_cnt * (2*(cum_n_le - n_cnt) + n_cnt)) AS DOUBLE)
        |    / (2.0 * sum(p_cnt) * sum(n_cnt)) AS auc
        |FROM cumt""".stripMargin,

    // PR curve per distinct threshold: cumulative integer tp/fp descending
    "eval_pr_curve" ->
      s"""WITH $int8FoldScoredSql,
        |g AS (SELECT score AS threshold,
        |        sum(CASE WHEN pos THEN 1 ELSE 0 END) AS p_cnt,
        |        sum(CASE WHEN pos THEN 0 ELSE 1 END) AS n_cnt
        |      FROM lab GROUP BY 1),
        |cumt AS (SELECT threshold,
        |  sum(p_cnt) OVER (ORDER BY threshold DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
        |  sum(n_cnt) OVER (ORDER BY threshold DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp
        |  FROM g)
        |SELECT CAST(threshold AS BIGINT) AS threshold,
        |  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
        |  CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS "precision",
        |  CAST(tp AS DOUBLE) / CAST((SELECT sum(p_cnt) FROM g) AS DOUBLE) AS recall
        |FROM cumt""".stripMargin,

    // PSI between even/odd vec_id score samples: integer `div` bucketing,
    // materialized 0..9 bin grid, add-one smoothing, unrolled total
    "eval_psi" -> {
      val unrolled = (0 until 10)
        .map(i => s"coalesce(max(CASE WHEN bin = $i THEN term END), 0.0)")
        .mkString(" + ")
      s"""WITH $int8FoldScoredSql,
        |u AS (SELECT score AS s, CAST(vec_id % 2 <> 0 AS INT) AS g FROM sc),
        |mm AS (SELECT min(s) AS mn, max(s) AS mx FROM u),
        |binned AS (SELECT
        |    CASE WHEN mm.mx = mm.mn THEN 0
        |         ELSE least(9, (u.s - mm.mn) * 10 // (mm.mx - mm.mn)) END AS bin,
        |    u.g FROM u CROSS JOIN mm),
        |counts AS (SELECT bin,
        |    sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS a_cnt,
        |    sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS b_cnt
        |  FROM binned GROUP BY 1),
        |tots AS (SELECT CAST(coalesce(sum(a_cnt), 0) AS BIGINT) AS ta,
        |    CAST(coalesce(sum(b_cnt), 0) AS BIGINT) AS tb FROM counts),
        |grid AS (SELECT CAST(range AS BIGINT) AS bin FROM range(0, 10)),
        |terms AS (SELECT g.bin,
        |    CAST(coalesce(c.a_cnt, 0) AS BIGINT) AS a_cnt,
        |    CAST(coalesce(c.b_cnt, 0) AS BIGINT) AS b_cnt,
        |    (CAST(coalesce(c.a_cnt, 0) + 1 AS DOUBLE) / CAST(t.ta + 10 AS DOUBLE)
        |     - CAST(coalesce(c.b_cnt, 0) + 1 AS DOUBLE) / CAST(t.tb + 10 AS DOUBLE))
        |    * ln((CAST(coalesce(c.a_cnt, 0) + 1 AS DOUBLE) / CAST(t.ta + 10 AS DOUBLE))
        |         / (CAST(coalesce(c.b_cnt, 0) + 1 AS DOUBLE) / CAST(t.tb + 10 AS DOUBLE))) AS term
        |  FROM grid g LEFT JOIN counts c ON c.bin = g.bin CROSS JOIN tots t),
        |p AS (SELECT $unrolled AS psi FROM terms)
        |SELECT terms.bin, terms.a_cnt, terms.b_cnt, terms.term, p.psi
        |FROM terms CROSS JOIN p""".stripMargin
    },

    // calibration bins: min-max normalize the integer score, 10 equal bins
    // (top edge closed), per-bin integer sums -> acc/conf
    "eval_calibration" ->
      s"""WITH $int8FoldScoredSql,
        |mm AS (SELECT min(score) AS mn, max(score) AS mx FROM lab),
        |b AS (SELECT
        |  CASE WHEN mx = mn THEN 0
        |       ELSE least(9, CAST(floor(CAST(score - mn AS DOUBLE) / (mx - mn) * 10) AS INT))
        |  END AS bin,
        |  score - mn AS off, mx - mn AS rng,
        |  CASE WHEN pos THEN 1 ELSE 0 END AS posi
        |  FROM lab, mm)
        |SELECT bin, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(posi) AS BIGINT) AS pos_cnt,
        |  round(CAST(sum(posi) AS DOUBLE) / count(*), 8) AS acc,
        |  round(CASE WHEN max(rng) = 0 THEN 0.0
        |        ELSE CAST(sum(off) AS DOUBLE) / (count(*) * max(rng)) END, 8) AS conf
        |FROM b GROUP BY bin""".stripMargin,

    // exact tie-aware Spearman rho via doubled average ranks (integers) and
    // DECIMAL(38,0) cross products — bit-identical arithmetic to the engine
    "eval_spearman" ->
      """WITH rows_xy AS (SELECT CAST(length(text) AS BIGINT) AS x,
        |  CAST(len(list_filter(regexp_split_to_array(text, '\s+'), t -> len(t) > 0)) AS BIGINT) AS y
        |  FROM documents),
        |gx AS (SELECT x AS v, count(*) AS cnt FROM rows_xy GROUP BY 1),
        |rx AS (SELECT v, 2 * (sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt) + cnt + 1 AS ra FROM gx),
        |gy AS (SELECT y AS v, count(*) AS cnt FROM rows_xy GROUP BY 1),
        |ry AS (SELECT v, 2 * (sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt) + cnt + 1 AS rb FROM gy),
        |r AS (SELECT rx.ra, ry.rb FROM rows_xy t
        |      JOIN rx ON rx.v = t.x JOIN ry ON ry.v = t.y),
        |s AS (SELECT count(*) AS n, sum(ra) AS sa, sum(rb) AS sb,
        |        sum(ra * ra) AS saa, sum(rb * rb) AS sbb,
        |        sum(ra * rb) AS sab
        |      FROM r)
        |SELECT CAST(n AS BIGINT) AS n,
        |  round(CAST(CAST(n AS DECIMAL(38,0)) * sab - CAST(sa AS DECIMAL(38,0)) * sb AS DOUBLE)
        |    / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * saa - CAST(sa AS DECIMAL(38,0)) * sa AS DOUBLE)
        |         * CAST(CAST(n AS DECIMAL(38,0)) * sbb - CAST(sb AS DECIMAL(38,0)) * sb AS DOUBLE)), 8) AS rho
        |FROM s""".stripMargin,

    // exact tie-aware Kendall tau-b over the distinct-(x,y) group table —
    // doubled tie terms, signed pair fold, same final IEEE arithmetic as
    // the engine (2·cd / sqrt(double(m0−m1)·double(m0−m2)))
    "eval_kendall" ->
      """WITH rows_xy AS (SELECT CAST(length(text) AS BIGINT) AS x,
        |  CAST(len(list_filter(regexp_split_to_array(text, '\s+'), t -> len(t) > 0)) AS BIGINT) AS y
        |  FROM documents),
        |g AS (SELECT x, y, count(*) AS cnt FROM rows_xy GROUP BY 1, 2),
        |cd AS (SELECT COALESCE(sum(CAST(a.cnt AS DECIMAL(38,0)) * b.cnt *
        |         (CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END)),
        |         0) AS cd
        |       FROM g a JOIN g b ON a.x < b.x),
        |m1 AS (SELECT COALESCE(sum(CAST(t AS DECIMAL(38,0)) * (t - 1)), 0) AS m1
        |       FROM (SELECT sum(cnt) AS t FROM g GROUP BY x)),
        |m2 AS (SELECT COALESCE(sum(CAST(t AS DECIMAL(38,0)) * (t - 1)), 0) AS m2
        |       FROM (SELECT sum(cnt) AS t FROM g GROUP BY y)),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
        |          CAST(sum(cnt) AS DECIMAL(38,0)) * (sum(cnt) - 1) AS m0 FROM g)
        |SELECT n, CAST(cd AS BIGINT) AS cd,
        |  round(2.0 * CAST(cd AS DOUBLE)
        |    / sqrt(CAST(m0 - m1 AS DOUBLE) * CAST(m0 - m2 AS DOUBLE)), 8) AS tau
        |FROM tot, cd, m1, m2""".stripMargin,

    // first fully-relevant rank per query (0 / rr 0.0 when none in top-20)
    "eval_mrr" ->
      s"""WITH $retrievalCtesSql,
        |hit AS (SELECT r.query_id, min(r.rk) AS first_rank
        |  FROM ranked r JOIN mrel USING (query_id, doc_id)
        |  JOIN nterms USING (query_id)
        |  WHERE mrel.rel = nterms.nterms GROUP BY 1)
        |SELECT n.query_id, CAST(COALESCE(h.first_rank, 0) AS BIGINT) AS first_rank,
        |  CASE WHEN h.first_rank IS NULL THEN 0.0 ELSE 1.0 / h.first_rank END AS rr
        |FROM nterms n LEFT JOIN hit h USING (query_id)""".stripMargin,

    // precision@k over the same ranking, binary (all-terms) relevance
    "eval_precision_at_k" ->
      s"""WITH $retrievalCtesSql,
        |ks AS (SELECT CAST(k AS BIGINT) AS k FROM (VALUES (5), (10), (20)) AS t(k)),
        |bin AS (SELECT r.query_id, r.rk,
        |    CASE WHEN mrel.rel = nterms.nterms THEN 1 ELSE 0 END AS isrel
        |  FROM ranked r LEFT JOIN mrel USING (query_id, doc_id)
        |  JOIN nterms USING (query_id)),
        |cnts AS (SELECT bin.query_id, ks.k,
        |    sum(CASE WHEN isrel = 1 AND rk <= k THEN 1 ELSE 0 END) AS rel_cnt
        |  FROM bin CROSS JOIN ks GROUP BY 1, 2)
        |SELECT g.query_id, g.k,
        |  CAST(COALESCE(c.rel_cnt, 0) AS BIGINT) AS rel_cnt,
        |  CAST(COALESCE(c.rel_cnt, 0) AS DOUBLE) / CAST(g.k AS DOUBLE) AS prec
        |FROM (SELECT query_id, k FROM nterms CROSS JOIN ks) g
        |LEFT JOIN cnts c ON c.query_id = g.query_id AND c.k = g.k""".stripMargin,

    // NDCG@10: graded gains rel·ln(2)/ln(i+1); the position sums are
    // UNROLLED (max(CASE rk=i) terms added left-to-right) so the fp
    // addition order is pinned identically to the engine's
    "eval_ndcg" -> {
      def unrolled(rkCol: String): String = (1 to 10)
        .map(i => s"coalesce(max(CASE WHEN $rkCol = $i THEN g END), 0.0)")
        .mkString(" + ")
      s"""WITH $retrievalCtesSql,
        |g AS (SELECT r.query_id, r.rk,
        |    COALESCE(mrel.rel, 0) * ln(2) / ln(r.rk + 1.0) AS g
        |  FROM ranked r LEFT JOIN mrel USING (query_id, doc_id)
        |  WHERE r.rk <= 10),
        |dcg AS (SELECT query_id, ${unrolled("rk")} AS dcg FROM g GROUP BY 1),
        |ig AS (SELECT query_id, irk, rel * ln(2) / ln(irk + 1.0) AS g FROM (
        |    SELECT query_id, doc_id, rel,
        |      row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id) AS irk
        |    FROM mrel) WHERE irk <= 10),
        |idcg AS (SELECT query_id, ${unrolled("irk")} AS idcg FROM ig GROUP BY 1)
        |SELECT d.query_id, round(d.dcg, 6) AS dcg, round(i.idcg, 6) AS idcg,
        |  CASE WHEN i.idcg = 0 THEN 0.0 ELSE round(d.dcg / i.idcg, 6) END AS ndcg
        |FROM dcg d JOIN idcg i ON d.query_id = i.query_id""".stripMargin
    },

    // recall@k: same binary relevance; the denominator counts fully-
    // relevant docs over the WHOLE corpus (mrel), not the top-k window
    "eval_recall_at_k" ->
      s"""WITH $retrievalCtesSql,
        |ks AS (SELECT CAST(k AS BIGINT) AS k FROM (VALUES (5), (10), (20)) AS t(k)),
        |bin AS (SELECT r.query_id, r.rk,
        |    CASE WHEN mrel.rel = nterms.nterms THEN 1 ELSE 0 END AS isrel
        |  FROM ranked r LEFT JOIN mrel USING (query_id, doc_id)
        |  JOIN nterms USING (query_id)),
        |tot AS (SELECT mrel.query_id, count(*) AS tot_rel
        |  FROM mrel JOIN nterms USING (query_id)
        |  WHERE mrel.rel = nterms.nterms GROUP BY 1),
        |cnts AS (SELECT bin.query_id, ks.k,
        |    sum(CASE WHEN isrel = 1 AND rk <= k THEN 1 ELSE 0 END) AS rel_cnt
        |  FROM bin CROSS JOIN ks GROUP BY 1, 2)
        |SELECT g.query_id, g.k,
        |  CAST(COALESCE(c.rel_cnt, 0) AS BIGINT) AS rel_cnt,
        |  CAST(COALESCE(t.tot_rel, 0) AS BIGINT) AS tot_rel,
        |  CASE WHEN COALESCE(t.tot_rel, 0) = 0 THEN 0.0
        |       ELSE CAST(COALESCE(c.rel_cnt, 0) AS DOUBLE)
        |            / CAST(t.tot_rel AS DOUBLE) END AS recall
        |FROM (SELECT query_id, k FROM nterms CROSS JOIN ks) g
        |LEFT JOIN cnts c ON c.query_id = g.query_id AND c.k = g.k
        |LEFT JOIN tot t ON t.query_id = g.query_id""".stripMargin,

    // average precision @20: per-position precision = exact-integer running
    // relevant count / rank (one division), position sum UNROLLED like ndcg
    "eval_map" -> {
      val unrolled = (1 to 20)
        .map(i => s"coalesce(max(CASE WHEN rk = $i THEN g END), 0.0)")
        .mkString(" + ")
      s"""WITH $retrievalCtesSql,
        |bin AS (SELECT r.query_id, r.rk,
        |    CASE WHEN mrel.rel = nterms.nterms THEN 1 ELSE 0 END AS isrel
        |  FROM ranked r LEFT JOIN mrel USING (query_id, doc_id)
        |  JOIN nterms USING (query_id)
        |  WHERE r.rk <= 20),
        |cum AS (SELECT query_id, rk, isrel,
        |    sum(isrel) OVER (PARTITION BY query_id ORDER BY rk
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        |  FROM bin),
        |g AS (SELECT query_id, rk,
        |    CASE WHEN isrel = 1 THEN CAST(c AS DOUBLE) / CAST(rk AS DOUBLE)
        |         ELSE 0.0 END AS g
        |  FROM cum),
        |sums AS (SELECT query_id, $unrolled AS sum_prec FROM g GROUP BY 1),
        |tot AS (SELECT mrel.query_id, count(*) AS tot_rel
        |  FROM mrel JOIN nterms USING (query_id)
        |  WHERE mrel.rel = nterms.nterms GROUP BY 1)
        |SELECT n.query_id, CAST(COALESCE(t.tot_rel, 0) AS BIGINT) AS tot_rel,
        |  COALESCE(s.sum_prec, 0.0) AS sum_prec,
        |  CASE WHEN COALESCE(t.tot_rel, 0) = 0 THEN 0.0
        |       ELSE COALESCE(s.sum_prec, 0.0)
        |            / CAST(least(t.tot_rel, 20) AS DOUBLE) END AS ap
        |FROM nterms n LEFT JOIN sums s ON s.query_id = n.query_id
        |LEFT JOIN tot t ON t.query_id = n.query_id""".stripMargin
    },

    // RBO(p = 1/2)@10 between the BM25 and raw-tf rankings of the same
    // query: m = max of the two ranks per shared doc; overlap@i = #{m ≤ i};
    // each term is an exact integer count / i scaled by the exact dyadic
    // 2^-i, sum unrolled
    "eval_rbo" -> {
      val terms = (1 to 10).map { i =>
        val wgt = BigDecimal(math.pow(0.5, i)).underlying.toPlainString
        s"CAST(sum(CASE WHEN m <= $i THEN 1 ELSE 0 END) AS DOUBLE) / CAST($i AS DOUBLE) * $wgt"
      }.mkString(" + ")
      s"""WITH $bm25CtesSql,
        |tfr AS (SELECT doc_id,
        |  row_number() OVER (ORDER BY sum(tf) DESC, doc_id) AS rk
        |  FROM qtf GROUP BY doc_id),
        |j AS (SELECT greatest(a.rk, b.rk) AS m
        |  FROM (SELECT doc_id, rk FROM rk WHERE rk <= 10) a
        |  JOIN (SELECT doc_id, rk FROM tfr WHERE rk <= 10) b USING (doc_id))
        |SELECT CAST(COALESCE(sum(CASE WHEN m <= 10 THEN 1 ELSE 0 END), 0) AS BIGINT)
        |    AS overlap_k,
        |  COALESCE($terms, 0.0) AS rbo
        |FROM j""".stripMargin
    },

    // language-ID confusion matrix against the documents table's lang truth
    "eval_langid_confusion" ->
      s"""WITH pred AS ($langidSql),
         |j AS (SELECT d.lang AS truth, p.pred_lang AS pred
         |      FROM documents d JOIN pred p ON p.doc_id = d.doc_id),
         |counts AS (SELECT truth, pred, CAST(count(*) AS BIGINT) AS cnt
         |           FROM j GROUP BY 1, 2),
         |tot AS (SELECT truth, CAST(sum(cnt) AS BIGINT) AS truth_total
         |        FROM counts GROUP BY 1)
         |SELECT c.truth, c.pred, c.cnt, t.truth_total
         |FROM counts c JOIN tot t USING (truth)""".stripMargin,

    // mirrors Eval.f1PerClass over the same langid classifier
    "eval_langid_f1" ->
      s"""WITH pred AS ($langidSql),
         |j AS (SELECT d.lang AS truth, p.pred_lang AS pred
         |      FROM documents d JOIN pred p ON p.doc_id = d.doc_id),
         |counts AS (SELECT truth, pred, count(*) AS cnt FROM j GROUP BY 1, 2),
         |classes AS (SELECT DISTINCT cls FROM (
         |  SELECT truth AS cls FROM counts UNION ALL SELECT pred FROM counts)),
         |tp AS (SELECT truth AS cls, cnt AS tp FROM counts WHERE truth = pred),
         |pt AS (SELECT pred AS cls, sum(cnt) AS pred_total FROM counts GROUP BY 1),
         |tt AS (SELECT truth AS cls, sum(cnt) AS truth_total FROM counts GROUP BY 1),
         |m AS (SELECT c.cls, COALESCE(tp.tp, 0) AS tp,
         |        COALESCE(pt.pred_total, 0) AS pred_total,
         |        COALESCE(tt.truth_total, 0) AS truth_total
         |      FROM classes c LEFT JOIN tp USING (cls)
         |      LEFT JOIN pt USING (cls) LEFT JOIN tt USING (cls))
         |SELECT cls, CAST(tp AS BIGINT) AS tp,
         |  CAST(pred_total AS BIGINT) AS pred_total,
         |  CAST(truth_total AS BIGINT) AS truth_total,
         |  round(CASE WHEN pred_total = 0 THEN 0.0
         |        ELSE CAST(tp AS DOUBLE) / pred_total END, 8) AS "precision",
         |  round(CASE WHEN truth_total = 0 THEN 0.0
         |        ELSE CAST(tp AS DOUBLE) / truth_total END, 8) AS recall,
         |  round(CASE WHEN pred_total + truth_total = 0 THEN 0.0
         |        ELSE CAST(2 * tp AS DOUBLE) / (pred_total + truth_total) END, 8) AS f1
         |FROM m""".stripMargin,

    // mirrors Eval.kappa over the same classifier: (n·A − S)/(n² − S) as
    // one division of exact DECIMAL(38,0) integers
    "eval_kappa" ->
      s"""WITH pred AS ($langidSql),
         |j AS (SELECT d.lang AS t, p.pred_lang AS p
         |      FROM documents d JOIN pred p ON p.doc_id = d.doc_id),
         |counts AS (SELECT t, p, count(*) AS cnt FROM j GROUP BY 1, 2),
         |a AS (SELECT COALESCE(sum(cnt), 0) AS a FROM counts WHERE t = p),
         |rt AS (SELECT t AS cls, sum(cnt) AS rt FROM counts GROUP BY 1),
         |ct AS (SELECT p AS cls, sum(cnt) AS ct FROM counts GROUP BY 1),
         |s AS (SELECT COALESCE(sum(CAST(rt.rt AS DECIMAL(38,0)) * ct.ct), 0) AS s
         |      FROM rt JOIN ct USING (cls)),
         |n AS (SELECT count(*) AS n FROM j)
         |SELECT CAST(n.n AS BIGINT) AS n, CAST(a.a AS BIGINT) AS agree,
         |  CAST(s.s AS BIGINT) AS s,
         |  CASE WHEN CAST(n.n AS DECIMAL(38,0)) * n.n - s.s = 0 THEN 0.0
         |       ELSE CAST(CAST(n.n AS DECIMAL(38,0)) * a.a - s.s AS DOUBLE)
         |          / CAST(CAST(n.n AS DECIMAL(38,0)) * n.n - s.s AS DOUBLE)
         |  END AS kappa
         |FROM n, a, s""".stripMargin,

    // mirrors Eval.mcc: kappa's exact-integer numerator n·A − S over
    // sqrt(double(n² − Sp)·double(n² − St)) — the kendall-tau normalizer shape
    "eval_mcc" ->
      s"""WITH pred AS ($langidSql),
         |j AS (SELECT d.lang AS t, p.pred_lang AS p
         |      FROM documents d JOIN pred p ON p.doc_id = d.doc_id),
         |counts AS (SELECT t, p, count(*) AS cnt FROM j GROUP BY 1, 2),
         |a AS (SELECT COALESCE(sum(cnt), 0) AS a FROM counts WHERE t = p),
         |rt AS (SELECT t AS cls, sum(cnt) AS rt FROM counts GROUP BY 1),
         |ct AS (SELECT p AS cls, sum(cnt) AS ct FROM counts GROUP BY 1),
         |s AS (SELECT COALESCE(sum(CAST(rt.rt AS DECIMAL(38,0)) * ct.ct), 0) AS s
         |      FROM rt JOIN ct USING (cls)),
         |sp AS (SELECT COALESCE(sum(CAST(ct AS DECIMAL(38,0)) * ct), 0) AS sp FROM ct),
         |st AS (SELECT COALESCE(sum(CAST(rt AS DECIMAL(38,0)) * rt), 0) AS st FROM rt),
         |n AS (SELECT count(*) AS n FROM j)
         |SELECT CAST(n.n AS BIGINT) AS n, CAST(a.a AS BIGINT) AS agree,
         |  CAST(s.s AS BIGINT) AS s, CAST(sp.sp AS BIGINT) AS sp,
         |  CAST(st.st AS BIGINT) AS st,
         |  CASE WHEN CAST(n.n AS DECIMAL(38,0)) * n.n - sp.sp = 0
         |         OR CAST(n.n AS DECIMAL(38,0)) * n.n - st.st = 0 THEN 0.0
         |       ELSE CAST(CAST(n.n AS DECIMAL(38,0)) * a.a - s.s AS DOUBLE)
         |          / sqrt(CAST(CAST(n.n AS DECIMAL(38,0)) * n.n - sp.sp AS DOUBLE)
         |               * CAST(CAST(n.n AS DECIMAL(38,0)) * n.n - st.st AS DOUBLE))
         |  END AS mcc
         |FROM n, a, s, sp, st""".stripMargin,

    // mirrors Eval.macroF1: per-class one-division F1s (the eval_langid_f1
    // m chain, unrounded) folded in CLASS-SORTED order from 0.0 — the fp
    // addition order is pinned identically to the engine's sorted-struct
    // aggregate fold — then ONE division by the class count
    "eval_macro_f1" ->
      s"""WITH pred AS ($langidSql),
         |j AS (SELECT d.lang AS truth, p.pred_lang AS pred
         |      FROM documents d JOIN pred p ON p.doc_id = d.doc_id),
         |counts AS (SELECT truth, pred, count(*) AS cnt FROM j GROUP BY 1, 2),
         |classes AS (SELECT DISTINCT cls FROM (
         |  SELECT truth AS cls FROM counts UNION ALL SELECT pred FROM counts)),
         |tp AS (SELECT truth AS cls, cnt AS tp FROM counts WHERE truth = pred),
         |pt AS (SELECT pred AS cls, sum(cnt) AS pred_total FROM counts GROUP BY 1),
         |tt AS (SELECT truth AS cls, sum(cnt) AS truth_total FROM counts GROUP BY 1),
         |f AS (SELECT c.cls,
         |        CASE WHEN COALESCE(pt.pred_total, 0) + COALESCE(tt.truth_total, 0) = 0
         |             THEN 0.0
         |             ELSE CAST(2 * COALESCE(tp.tp, 0) AS DOUBLE)
         |                / (COALESCE(pt.pred_total, 0) + COALESCE(tt.truth_total, 0))
         |        END AS f1
         |      FROM classes c LEFT JOIN tp USING (cls)
         |      LEFT JOIN pt USING (cls) LEFT JOIN tt USING (cls))
         |SELECT CAST(count(*) AS BIGINT) AS classes,
         |  list_reduce(list_prepend(0.0, list(f1 ORDER BY cls)),
         |    (a, b) -> a + b) / count(*) AS macro_f1
         |FROM f""".stripMargin,

    // mirrors Eval.brier: exact integer numerator Σ(off − y·rng)² over the
    // min-max-normalized integer score, one division by n·rng²
    "eval_brier" ->
      s"""WITH $int8FoldScoredSql,
        |mm AS (SELECT min(score) AS mn, max(score) AS mx FROM lab),
        |b AS (SELECT score - mn AS off, mx - mn AS rng,
        |        CASE WHEN pos THEN 1 ELSE 0 END AS y
        |      FROM lab, mm)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(COALESCE(sum(CAST(off - y*rng AS DECIMAL(38,0)) * (off - y*rng)), 0) AS BIGINT) AS num,
        |  CAST(max(rng) AS BIGINT) AS rng,
        |  CASE WHEN max(rng) = 0 THEN 0.0
        |       ELSE CAST(COALESCE(sum(CAST(off - y*rng AS DECIMAL(38,0)) * (off - y*rng)), 0) AS DOUBLE)
        |          / (CAST(count(*) AS DOUBLE) * max(rng) * max(rng))
        |  END AS brier
        |FROM b""".stripMargin,

    // mirrors Dedup.ngramJaccardPairs: distinct 3-word shingles, df-capped
    // inverted-index candidates, exact Jaccard on the FULL shingle sets
    "dedup_ngram_jaccard" ->
      s"""WITH toks AS (SELECT doc_id,
         |  list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0) AS tk
         |  FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS sh
         |       FROM toks, UNNEST(range(1, len(tk) - 1)) AS u(i)),
         |rare AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
         |         WHERE df <= 1000),
         |shc AS (SELECT s.doc_id, s.sh FROM sh s JOIN rare r ON s.sh = r.sh),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |         FROM shc x JOIN shc y ON x.sh = y.sh AND x.doc_id < y.doc_id),
         |inter AS (SELECT c.a, c.b, count(*) AS ic
         |          FROM cand c JOIN sh x ON x.doc_id = c.a
         |          JOIN sh y ON y.doc_id = c.b AND y.sh = x.sh
         |          GROUP BY 1, 2)
         |SELECT i.a, i.b, round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 6) AS jaccard
         |FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
         |WHERE CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic) >= 0.5""".stripMargin,

    // mirrors Dedup.containmentPairs: same shingles/candidates as the
    // jaccard oracle, but both DIRECTED containment rows |Sa∩Sb|/|S_x|
    "dedup_containment" ->
      s"""WITH toks AS (SELECT doc_id,
         |  list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0) AS tk
         |  FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS sh
         |       FROM toks, UNNEST(range(1, len(tk) - 1)) AS u(i)),
         |rare AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
         |         WHERE df <= 1000),
         |shc AS (SELECT s.doc_id, s.sh FROM sh s JOIN rare r ON s.sh = r.sh),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |         FROM shc x JOIN shc y ON x.sh = y.sh AND x.doc_id < y.doc_id),
         |inter AS (SELECT c.a, c.b, count(*) AS ic, any_value(sa.sz) AS sa, any_value(sb.sz) AS sb
         |          FROM cand c JOIN sh x ON x.doc_id = c.a
         |          JOIN sh y ON y.doc_id = c.b AND y.sh = x.sh
         |          JOIN sizes sa ON sa.doc_id = c.a JOIN sizes sb ON sb.doc_id = c.b
         |          GROUP BY 1, 2)
         |SELECT contained, container, round(containment, 6) AS containment FROM (
         |  SELECT a AS contained, b AS container, CAST(ic AS DOUBLE) / sa AS containment FROM inter
         |  UNION ALL
         |  SELECT b, a, CAST(ic AS DOUBLE) / sb FROM inter)
         |WHERE containment >= 0.8""".stripMargin,

    // mirrors Dedup.simhashLcg bit for bit: dense-rank token ids, 32 LCG
    // hyperplane signs mod 2^31-1, per-occurrence ±1 votes, sign -> bit
    "dedup_simhash_lcg" -> simhashLcgSql,

    // mirrors Dedup.minhashClustersLcg: the LCG bucket chain, star links to
    // each bucket's min doc, then min-label propagation unrolled past the
    // link graph's diameter (each round widens the min by one hop, so K
    // rounds with K >= diameter IS the connected-components fixpoint the
    // engine computes)
    "dedup_minhash_clusters_lcg" -> minhashClustersLcgSql(rounds = 14),

    // mirrors Dedup.minhashNearDupsLcg bit for bit: dense-rank shingle ids,
    // 32 LCG permutations mod 2^31-1, 8 bands × 4 rows folded
    // (acc·8191 + sig) mod p, 1000-cap, exact full-set Jaccard ≥ 0.5
    "dedup_minhash_lcg" ->
      s"""WITH $minhashLcgBucketsCtes,
         |pop AS (SELECT band, bkt FROM bk GROUP BY band, bkt HAVING count(*) <= 1000),
         |cap AS (SELECT b.doc_id, b.band, b.bkt FROM bk b JOIN pop USING (band, bkt)),
         |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM cap x JOIN cap y
         |         ON x.band = y.band AND x.bkt = y.bkt AND x.doc_id < y.doc_id),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |inter AS (SELECT c.a, c.b, count(*) AS ic FROM cand c
         |          JOIN sh x ON x.doc_id = c.a
         |          JOIN sh y ON y.doc_id = c.b AND y.sh = x.sh GROUP BY 1, 2)
         |SELECT i.a, i.b, round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 6) AS jaccard
         |FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
         |WHERE CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic) >= 0.5""".stripMargin,

    // mirrors Similarity.bruteForceTopK: exact cosine, rank by (score desc,
    // id asc) — only the integer ranking is emitted, so the last-ULP
    // difference between the two engines' dot-product orders is irrelevant
    "ann_brute_topk" ->
      s"""WITH c AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
         |      FROM embeddings WHERE vec_id < 10),
         |s AS (SELECT q.qid, c.id, list_cosine_similarity(q.qe, c.e) AS score
         |      FROM c, q WHERE q.qid <> c.id)
         |SELECT qid, id, CAST(rn AS INT) AS rank FROM (
         |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rn
         |  FROM s) WHERE rn <= 5""".stripMargin,

    // mirrors Similarity.pcaTopComponent BIT for BIT: exact integer
    // quantized sums/Gram, C = n·g − s·sᵀ exact under 2^53, and every float
    // reduction a list_reduce left fold over an ORDER BY dim list — the
    // same fold order as the engine's driver-side foldLeft
    "ann_pca3" -> pcaUnrolledSql(3),

    // mirrors Similarity.quantizeInt8 op-for-op: scale = max|x|/127 (exact
    // double), codes = clamp(floor(x/scale + 0.5), ±127) — every code is an
    // exact integer, so the checksums compare exactly; scale rounds at 8dp
    // mirrors Similarity.projectJL: DuckDB's list-lambda index is 1-based,
    // so its i equals the engine's 0-based i+1 — the sign mix uses i directly
    "ann_project_jl" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |proj AS (
        |  SELECT c.vec_id, d.j,
        |    round(list_sum(list_transform(c.e, (x, i) ->
        |      x * (CASE WHEN (i*(d.j+3)*48271 + (d.j+1)*7919) % 1009 % 2 = 0
        |           THEN 1.0 ELSE -1.0 END))) / sqrt(8.0), 6) AS y
        |  FROM c CROSS JOIN (SELECT range AS j FROM range(0, 8)) d)
        |SELECT vec_id, CAST(j AS BIGINT) AS dim, y FROM proj""".stripMargin,

    "ann_quantize_int8" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |m AS (SELECT vec_id, e,
        |  list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale FROM c),
        |q AS (SELECT vec_id, scale,
        |  CASE WHEN scale > 0
        |       THEN list_transform(e, x -> greatest(-127.0, least(127.0, floor(x / scale + 0.5))))
        |       ELSE list_transform(e, x -> 0.0) END AS qv
        |  FROM m)
        |SELECT vec_id, round(scale, 8) AS scale,
        |  CAST(list_sum(qv) AS BIGINT) AS qsum,
        |  CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS qnorm2
        |FROM q""".stripMargin,

    // mirrors Similarity.lshTopKLcg end-to-end: int8 codes (exact), ±1 LCG
    // hyperplane signs of the flattened (table,bit,dim) index — DuckDB's
    // list-lambda i is 1-based so (i-1) matches the engine's 0-based i —
    // integer bucket bits, capped bucket equi-join, candidate dedup,
    // quantized-cosine scoring, (score desc, id asc) ranks
    "ann_lsh_lcg_topk" ->
      s"""WITH ${lcgBucketCtes(64, 6, 4)},
        |pop AS (SELECT tbl, bkt FROM bk GROUP BY tbl, bkt HAVING count(*) <= 100000),
        |cap AS (SELECT b.vec_id, b.tbl, b.bkt FROM bk b JOIN pop USING (tbl, bkt)),
        |cand AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id AS id
        |  FROM cap c JOIN bk q USING (tbl, bkt)
        |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |ce AS (SELECT vec_id AS id, list_transform(qv, q -> q * scale) AS e FROM qt),
        |qe AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
        |       FROM embeddings WHERE vec_id < 10),
        |s AS (SELECT cand.qid, cand.id, list_cosine_similarity(qe.qe, ce.e) AS score
        |      FROM cand JOIN qe USING (qid) JOIN ce USING (id))
        |SELECT qid, id, CAST(rn AS INT) AS rank FROM (
        |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rn
        |  FROM s) WHERE rn <= 5""".stripMargin,

    // the exact-k-means schedule, both rounds unrolled
    "ann_kmeans" -> kmeansSql(4, 2),

    // mirrors Similarity.cosineNearDupsLcg: the 8-table LCG bucket index,
    // capped pair join, and the integer-exact threshold decision
    // dot>0 ∧ 400·dot² ≥ 49·‖a‖²·‖b‖² over the int8 codes
    "ann_cosine_lcg_neardup" ->
      s"""WITH ${lcgBucketCtes(64, 6, 8)},
        |pop AS (SELECT tbl, bkt FROM bk GROUP BY tbl, bkt HAVING count(*) <= 10000),
        |cap AS (SELECT b.vec_id, b.tbl, b.bkt FROM bk b JOIN pop USING (tbl, bkt)),
        |cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
        |  FROM cap x JOIN cap y
        |  ON x.tbl = y.tbl AND x.bkt = y.bkt AND x.vec_id < y.vec_id),
        |xi AS (SELECT vec_id, list_transform(qv, v -> CAST(v AS BIGINT)) AS x FROM qt),
        |sc AS (SELECT cand.a, cand.b,
        |  list_sum(list_transform(range(1, len(xa.x)+1), i -> xa.x[i]*xb.x[i])) AS dot,
        |  list_sum(list_transform(xa.x, v -> v*v)) AS na,
        |  list_sum(list_transform(xb.x, v -> v*v)) AS nb
        |  FROM cand JOIN xi xa ON xa.vec_id = cand.a
        |            JOIN xi xb ON xb.vec_id = cand.b)
        |SELECT a, b FROM sc WHERE dot > 0 AND dot*dot*400 >= na*nb*49""".stripMargin,

    // mirrors Similarity.ivfTopKLcg: the kmeans chain at (nlist=8, steps=2),
    // final (sum,count) centroids, exact rational probe distance with one
    // IEEE division (ties to the smallest list), nprobe=2, candidates from
    // probed lists, quantized-cosine (score desc, id asc) ranks
    "ann_ivf_lcg_topk" ->
      s"""WITH ${kmeansCtes(8, 2)},
        |fn AS (SELECT cid, count(*) AS cnt FROM a2 GROUP BY 1),
        |fu AS (SELECT cid, t.i AS pos, CAST(sum(x[t.i]) AS BIGINT) AS sv
        |       FROM a2, UNNEST(range(1, len(x)+1)) AS t(i) GROUP BY 1, 2),
        |fc AS (SELECT u.cid, list(u.sv ORDER BY u.pos) AS s, fn.cnt AS cnt
        |       FROM fu u JOIN fn USING (cid) GROUP BY u.cid, fn.cnt),
        |qq AS (SELECT vec_id AS qid, x FROM qi WHERE vec_id < 10),
        |pd AS (SELECT qid, cid,
        |  CAST(CAST(A AS HUGEINT)*cnt*cnt - 2*CAST(B AS HUGEINT)*cnt + D AS DOUBLE)
        |    / CAST(CAST(cnt AS HUGEINT)*cnt AS DOUBLE) AS dist FROM (
        |  SELECT qid, cid, cnt,
        |    list_sum(list_transform(range(1, len(x)+1), i -> x[i]*x[i])) AS A,
        |    list_sum(list_transform(range(1, len(x)+1), i -> x[i]*s[i])) AS B,
        |    list_sum(list_transform(range(1, len(s)+1), i -> s[i]*s[i])) AS D
        |  FROM qq, fc)),
        |pr AS (SELECT qid, cid FROM (
        |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY dist ASC, cid ASC) AS rn
        |  FROM pd) WHERE rn <= 2),
        |cand AS (SELECT pr.qid, a.vec_id AS id FROM pr JOIN a2 a ON a.cid = pr.cid
        |         WHERE a.vec_id <> pr.qid),
        |ce AS (SELECT q.vec_id AS id, list_transform(q.qv, v -> v * m.scale) AS e
        |       FROM q JOIN m USING (vec_id)),
        |qe AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
        |       FROM embeddings WHERE vec_id < 10),
        |s2 AS (SELECT cand.qid, cand.id, list_cosine_similarity(qe.qe, ce.e) AS score
        |       FROM cand JOIN qe USING (qid) JOIN ce USING (id))
        |SELECT qid, id, CAST(rn AS INT) AS rank FROM (
        |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rn
        |  FROM s2) WHERE rn <= 5""".stripMargin,
    "ann_pq_codes" -> pqCodesSql(4, 8, 7L),

    // mirrors Similarity.pqTopKLcg: the PQ chain's a1/bk1, exact rational
    // query-to-centroid distances (one IEEE division each), ADC score =
    // d0+d1+d2+d3 added left to right (max-CASE pivot pins the order),
    // (dist asc, id asc) ranks
    "ann_pq_lcg_topk" ->
      s"""WITH ${pqCodesCtes(4, 8, 7L)},
        |qsv AS (SELECT vec_id AS qid, sub, sv FROM sv WHERE vec_id < 10),
        |qd AS (SELECT qid, sub, code,
        |  CAST(CAST(A AS HUGEINT)*cnt*cnt - 2*CAST(B AS HUGEINT)*cnt + D AS DOUBLE)
        |    / CAST(CAST(cnt AS HUGEINT)*cnt AS DOUBLE) AS d FROM (
        |  SELECT q.qid, b.sub, b.code, b.cnt,
        |    list_sum(list_transform(range(1, len(q.sv)+1), i -> q.sv[i]*q.sv[i])) AS A,
        |    list_sum(list_transform(range(1, len(q.sv)+1), i -> q.sv[i]*b.s[i])) AS B,
        |    list_sum(list_transform(range(1, len(b.s)+1), i -> b.s[i]*b.s[i])) AS D
        |  FROM qsv q JOIN bk1 b USING (sub))),
        |jd AS (SELECT qd.qid, a.vec_id AS id, qd.sub, qd.d
        |       FROM qd JOIN a1 a ON a.sub = qd.sub AND a.code = qd.code
        |       WHERE a.vec_id <> qd.qid),
        |pv AS (SELECT qid, id,
        |  max(CASE WHEN sub = 0 THEN d END) + max(CASE WHEN sub = 1 THEN d END)
        |  + max(CASE WHEN sub = 2 THEN d END) + max(CASE WHEN sub = 3 THEN d END) AS dist
        |  FROM jd GROUP BY qid, id)
        |SELECT qid, id, CAST(rn AS INT) AS rank FROM (
        |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY dist ASC, id ASC) AS rn
        |  FROM pv) WHERE rn <= 5""".stripMargin,

    // mirrors Similarity.quantizedTopK: dequantize (code · scale), exact
    // cosine, rank by (score desc, id asc) — integer ranks only, like
    // ann_brute_topk
    "ann_quantized_topk" ->
      """WITH c0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |m AS (SELECT vec_id, e,
        |  list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale FROM c0),
        |qt AS (SELECT vec_id, scale,
        |  CASE WHEN scale > 0
        |       THEN list_transform(e, x -> greatest(-127.0, least(127.0, floor(x / scale + 0.5))))
        |       ELSE list_transform(e, x -> 0.0) END AS qv
        |  FROM m),
        |c AS (SELECT vec_id AS id, list_transform(qv, q -> q * scale) AS e FROM qt),
        |q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
        |      FROM embeddings WHERE vec_id < 10),
        |s AS (SELECT q.qid, c.id, list_cosine_similarity(q.qe, c.e) AS score
        |      FROM c, q WHERE q.qid <> c.id)
        |SELECT qid, id, CAST(rn AS INT) AS rank FROM (
        |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rn
        |  FROM s) WHERE rn <= 5""".stripMargin,

    "events_windowed" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |event_type, count(*) AS n, round(sum(value), 6) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "events_sessions" ->
      """WITH w AS (SELECT user_id, event_id, ts, value,
        |  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |s AS (SELECT *, CASE WHEN prev IS NULL OR epoch_us(ts) - prev > 1800000000
        |      THEN 1 ELSE 0 END AS new_sess FROM w),
        |c AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sess FROM s)
        |SELECT user_id, CAST(sess AS BIGINT) AS sess, count(*) AS n_events,
        |round(sum(value), 6) AS sum_value,
        |strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts
        |FROM c GROUP BY 1, 2""".stripMargin,

    // ordered funnel: each stage's first hit must be STRICTLY after the
    // user's previous-stage first hit (timestamp order == micros order)
    "events_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t
        |       WHERE e.event_type = 'click' GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t
        |       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT 'signup' AS funnel_stage,
        |       CAST((SELECT count(*) FROM s1) AS BIGINT) AS users
        |UNION ALL SELECT 'signup>click', (SELECT count(*) FROM s2)
        |UNION ALL SELECT 'signup>click>purchase', (SELECT count(*) FROM s3)""".stripMargin,

    "events_retention" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort
        |           FROM events GROUP BY user_id)
        |SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
        |       CAST(date_diff('day', f.cohort, CAST(e.ts AS DATE)) AS BIGINT) AS offset,
        |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
        |FROM events e JOIN f ON f.user_id = e.user_id
        |GROUP BY 1, 2""".stripMargin,

    // KMV sketch replayed exactly: same LCG hash, same k smallest, same
    // (k-1)·P/kth estimator (or the exact count when fewer than k survive)
    // mirrors Events.quantiles: distinct-value cumulative histogram per
    // type, lower quantile at target ceil(q*n)
    "events_quantiles" ->
      """WITH g AS (SELECT event_type AS k, value AS v, count(*) AS cnt
        |           FROM events GROUP BY 1, 2),
        |cum AS (SELECT k, v, cnt,
        |  sum(cnt) OVER (PARTITION BY k ORDER BY v
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM g),
        |n AS (SELECT k, sum(cnt) AS n FROM g GROUP BY 1),
        |t AS (SELECT k, n, q, CAST(ceil(CAST(q AS DOUBLE) * n) AS BIGINT) AS target
        |      FROM n, UNNEST([0.5, 0.9, 0.99]) AS u(q))
        |SELECT t.k AS event_type, t.q AS q, CAST(t.n AS BIGINT) AS n,
        |  min(c.v) AS quantile
        |FROM cum c JOIN t ON c.k = t.k AND c.cum >= t.target
        |GROUP BY 1, 2, 3""".stripMargin,

    // per-type z>3 outliers: the flag predicate (n·v − S)² > 9·(n·Q − S²)
    // is pure HUGEINT arithmetic (mirrors the engine's DECIMAL(38,0)); the
    // reported z is the one double division over a correctly-rounded sqrt
    "events_zscore" ->
      """WITH v AS (SELECT event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS s,
        |    sum(CAST(v AS HUGEINT) * v) AS q FROM v GROUP BY 1),
        |j AS (SELECT v.event_id, v.event_type, v.v,
        |    CAST(s.n AS HUGEINT) * v.v - s.s AS num,
        |    CAST(s.n AS HUGEINT) * s.q - CAST(s.s AS HUGEINT) * s.s AS den2
        |  FROM v JOIN s USING (event_type))
        |SELECT event_id, event_type, v AS v_cents,
        |  CAST(num AS DOUBLE) / sqrt(CAST(den2 AS DOUBLE)) AS z
        |FROM j WHERE den2 > 0 AND num * num > 9 * den2""".stripMargin,

    // per-type CUSUM changepoint: H-scaled integer prefix sums, the
    // max(0,·) reset via the prefix-minus-running-min identity — the same
    // window-only arithmetic as the engine, bit-exact in HUGEINT
    "events_cusum" ->
      """WITH v AS (SELECT event_type,
        |    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |h AS (SELECT event_type, hour, CAST(sum(v) AS BIGINT) AS x
        |      FROM v GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nh,
        |      CAST(sum(x) AS BIGINT) AS s FROM h GROUP BY 1),
        |p AS (SELECT h.event_type, h.hour, t.nh, t.s,
        |    sum(CAST(t.nh AS HUGEINT) * h.x - t.s) OVER (
        |      PARTITION BY h.event_type ORDER BY h.hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
        |  FROM h JOIN t USING (event_type)),
        |c AS (SELECT event_type, hour, nh, s,
        |    pre - least(CAST(0 AS HUGEINT), min(pre) OVER (
        |      PARTITION BY event_type ORDER BY hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS c
        |  FROM p),
        |r AS (SELECT *, row_number() OVER (
        |    PARTITION BY event_type ORDER BY c DESC, hour) AS rk FROM c)
        |SELECT event_type, nh AS n_hours, s AS s_cents,
        |  CAST(c AS BIGINT) AS max_cusum, hour AS peak_hour
        |FROM r WHERE rk = 1""".stripMargin,

    // user-journey transition matrix: per-user (ts, event_id)-ordered lag
    // pairs, exact counts, one division per cell
    "events_markov" ->
      """WITH p AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT prev AS prev_type, event_type AS next_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM p WHERE prev IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_total
        |      FROM c GROUP BY 1)
        |SELECT c.prev_type, c.next_type, c.n, t.row_total,
        |  CAST(c.n AS DOUBLE) / CAST(t.row_total AS DOUBLE) AS p
        |FROM c JOIN t USING (prev_type)""".stripMargin,

    "events_kmv_distinct" ->
      """WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
        |h AS (SELECT event_type,
        |        (user_id % 1000000007 * 48271 + 11213) % 1000000007 AS h FROM du),
        |rk AS (SELECT event_type, h,
        |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk FROM h),
        |k AS (SELECT event_type, count(*) AS n_kept,
        |        max(CASE WHEN rk = 8 THEN h END) AS kth
        |      FROM rk WHERE rk <= 8 GROUP BY event_type)
        |SELECT event_type, n_kept,
        |  CASE WHEN n_kept < 8 THEN CAST(n_kept AS DOUBLE)
        |       ELSE round(7.0 * 1000000007 / kth, 6) END AS est_distinct
        |FROM k""".stripMargin,

    "gb_eye" ->
      """SELECT CAST(i AS BIGINT) AS src, CAST(i - 3 AS BIGINT) AS dst,
        |1.0 AS w FROM range(3, 23) t(i)""".stripMargin,

    "gb_norms" ->
      s"""WITH e AS ($edgesBiSql)
         |SELECT (SELECT max(s) FROM (SELECT sum(abs(w)) AS s FROM e GROUP BY dst)) AS norm1,
         |(SELECT max(s) FROM (SELECT sum(abs(w)) AS s FROM e GROUP BY src)) AS norminf,
         |(SELECT sqrt(sum(w * w)) FROM e) AS normfro""".stripMargin,

    "gb_bandwidth" ->
      s"""SELECT CAST(COALESCE(max(greatest(src - dst, 0)), 0) AS BIGINT) AS lo,
         |CAST(COALESCE(max(greatest(dst - src, 0)), 0) AS BIGINT) AS hi
         |FROM ($edgesBiSql)""".stripMargin,

    "gb_structure" ->
      s"""WITH e AS ($edgesBiSql),
         |t AS (SELECT dst AS src, src AS dst, w FROM e),
         |sym AS (SELECT COALESCE(a.src, b.src) AS src, COALESCE(a.dst, b.dst) AS dst,
         |        COALESCE(a.w + b.w, a.w, b.w) AS w
         |        FROM e a FULL OUTER JOIN t b ON a.src = b.src AND a.dst = b.dst)
         |SELECT
         |(SELECT count(*) FROM e WHERE dst > src) = 0 AS istril_raw,
         |(SELECT count(*) FROM e WHERE dst > src AND dst <= src) = 0 AS istril_tril,
         |(SELECT count(*) FROM e WHERE dst < src) = 0 AS istriu_raw,
         |(SELECT count(*) FROM e WHERE dst <> src) = 0 AS isdiag_raw,
         |(SELECT count(*) FROM (SELECT src, dst, w FROM e EXCEPT
         |  SELECT dst, src, w FROM e)) = 0 AS issym_raw,
         |(SELECT count(*) FROM (SELECT src, dst, w FROM sym EXCEPT
         |  SELECT dst, src, w FROM sym)) = 0 AS issym_sym""".stripMargin,

    "gb_wathen" -> wathenOracleSql,
    "gb_rmat" -> rmatSql(scale = 7, seed = 11L, mult = 20, a16 = 9, b16 = 3, c16 = 3),

    "gb_flip" ->
      """SELECT CAST(24 - n_nationkey AS BIGINT) AS src,
        |CAST(n_regionkey AS BIGINT) AS dst, 1.0 AS w FROM nation""".stripMargin,

    "gb_repmat" ->
      """SELECT CAST(ti * 25 + n_nationkey AS BIGINT) AS src,
        |CAST(tj * 5 + n_regionkey AS BIGINT) AS dst, 1.0 AS w
        |FROM nation, range(2) t1(ti), range(3) t2(tj)""".stripMargin,

    "gb_mpower" ->
      s"""WITH e AS ($nationCoRegionSql),
         |p2 AS (SELECT a.src AS src, b.dst AS dst, sum(a.w * b.w) AS w
         |       FROM e a JOIN e b ON a.dst = b.src GROUP BY 1, 2),
         |p3 AS (SELECT a.src AS src, b.dst AS dst, sum(a.w * b.w) AS w
         |       FROM p2 a JOIN e b ON a.dst = b.src GROUP BY 1, 2)
         |SELECT src, dst, w FROM p3""".stripMargin,

    "gb_diag" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS src,
        |CAST(n_nationkey + 3 AS BIGINT) AS dst,
        |CAST(n_regionkey + 1 AS DOUBLE) AS w FROM nation""".stripMargin,

    "gb_vector_diag" ->
      s"""SELECT src AS id, w AS v FROM ($nationCoRegionSql) WHERE src = dst""",

    "gb_checkpoint_roundtrip" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id,
        |CAST(n_regionkey + 1 AS DOUBLE) AS v,
        |CAST(7 AS BIGINT) AS iter FROM nation""".stripMargin,

    "media_features" -> "", // pixel/sample hashes: rows-only (see media_invariants)
    "media_frames" -> "",

    // closed-form replay of the decoded media invariants: kind = id%3,
    // w = id*37%48+16, h = id*53%48+16, audio n = 8000/10*(id%3+1) = 1600
    // samples @8000 Hz in a 44+2n-byte RIFF, image bytes = 54+h*rowStride
    // (rows padded to 4), video frames = id%4+3; 0 = not applicable
    "media_invariants" ->
      """WITH ids AS (SELECT CAST(range AS BIGINT) AS media_id FROM range(0, 1000)),
        |base AS (SELECT media_id,
        |  CASE media_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  media_id * 37 % 48 + 16 AS w,
        |  media_id * 53 % 48 + 16 AS h FROM ids)
        |SELECT media_id, kind,
        |  CAST(CASE WHEN kind = 'audio' THEN 0 ELSE w END AS BIGINT) AS width,
        |  CAST(CASE WHEN kind = 'audio' THEN 0 ELSE h END AS BIGINT) AS height,
        |  CAST(CASE WHEN kind = 'video' THEN media_id % 4 + 3 ELSE 0 END AS BIGINT) AS n_frames,
        |  CAST(CASE WHEN kind = 'audio' THEN 1600 ELSE 0 END AS BIGINT) AS n_samples,
        |  CAST(CASE WHEN kind = 'audio' THEN 8000 ELSE 0 END AS BIGINT) AS sample_rate,
        |  CAST(CASE kind WHEN 'audio' THEN 44 + 2 * 1600
        |            WHEN 'image' THEN 54 + h * ((w * 3 + 3) // 4 * 4)
        |            ELSE 0 END AS BIGINT) AS n_bytes
        |FROM base""".stripMargin
  ).filter(_._2.nonEmpty)

  /** `rounds` unrolled k-truss support-filter rounds as DuckDB SQL (same
    * per-round math as algos.KTruss.runFixed: wedge-join support over the
    * canonical surviving edges, keep support >= k-2).
    */
  private def ktrussUnrolledSql(k: Int, rounds: Int): String = {
    val prelude = s"WITH e0 AS (SELECT src AS lo, dst AS hi FROM ($edgesSupSql))"
    val rs = (1 to rounds).map { r =>
      val p = r - 1
      s"""t$r AS (SELECT x.lo AS a, x.hi AS b, y.hi AS c
         |      FROM e$p x JOIN e$p y ON x.hi = y.lo
         |      JOIN e$p z ON z.lo = x.lo AND z.hi = y.hi),
         |s$r AS (SELECT lo, hi, count(*) AS support FROM (
         |      SELECT a AS lo, b AS hi FROM t$r
         |      UNION ALL SELECT b, c FROM t$r
         |      UNION ALL SELECT a, c FROM t$r) GROUP BY lo, hi),
         |e$r AS (SELECT e.lo, e.hi FROM e$p e JOIN s$r s
         |      ON e.lo = s.lo AND e.hi = s.hi AND s.support >= ${k - 2})""".stripMargin
    }.mkString(",\n")
    s"$prelude,\n$rs\nSELECT lo, hi FROM e$rounds"
  }

  /** k unrolled label-propagation rounds as DuckDB SQL (same math as
    * algos.LabelPropagation.runFixed: symmetrized structure, per-round
    * neighbor-label histogram, argmax with min-label tie-break).
    */
  private def labelPropUnrolledSql(k: Int): String = {
    val prelude =
      s"""WITH e AS (SELECT src, dst FROM ($edgesSupSql)),
         |und AS (SELECT src AS s, dst AS d FROM e UNION SELECT dst, src FROM e),
         |l0 AS (SELECT DISTINCT s AS id, s AS label FROM und)""".stripMargin
    val iters = (1 to k).map { i =>
      s"""h$i AS (SELECT und.d AS id, l.label AS lab, count(*) AS cnt
         |        FROM und JOIN l${i - 1} l ON und.s = l.id GROUP BY 1, 2),
         |b$i AS (SELECT id, lab FROM (
         |        SELECT id, lab,
         |        row_number() OVER (PARTITION BY id ORDER BY cnt DESC, lab ASC) AS rn
         |        FROM h$i) WHERE rn = 1),
         |l$i AS (SELECT v.id, COALESCE(b.lab, v.label) AS label
         |        FROM l${i - 1} v LEFT JOIN b$i b ON b.id = v.id)""".stripMargin
    }.mkString(",\n")
    s"$prelude,\n$iters\nSELECT id, label FROM l$k"
  }

  /** k unrolled PageRank iterations as DuckDB SQL (same math as
    * algos.PageRank: damp=0.85, sinks d=1 contribute damp*mass/n, start 1/n;
    * weighted multiplies each contribution by the edge weight — +.* semiring,
    * pagerank.m:74-85 — while d stays the out-degree count).
    */
  private def pagerankUnrolledSql(k: Int, weighted: Boolean = false,
                                  seeds: Seq[Long] = Nil,
                                  edgesSql: String = edgesBiSql,
                                  rawFinal: Boolean = false): String = {
    val term = if (weighted) "r%d.r / deg.d * e.w" else "r%d.r / deg.d"
    // personalized: teleport + sink mass land on the seed set only
    val ns = seeds.size
    val seedList = seeds.mkString(", ")
    val r0Expr = if (seeds.isEmpty) "1.0 / n.n"
      else s"CASE WHEN id IN ($seedList) THEN 1.0 / $ns ELSE 0.0 END"
    def baseExpr(i: Int) = if (seeds.isEmpty)
      s"0.15 / n.n + 0.85 * COALESCE(s$i.m, 0) / n.n"
    else
      s"""CASE WHEN verts.id IN ($seedList)
         |THEN 0.15 / $ns + 0.85 * COALESCE(s$i.m, 0) / $ns ELSE 0.0 END""".stripMargin
    val prelude =
      s"""WITH e AS MATERIALIZED (SELECT src, dst, w FROM ($edgesSql)),
         |verts AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
         |deg AS MATERIALIZED (SELECT verts.id, COALESCE(o.d, 1.0) AS d, o.d IS NULL AS sink
         |        FROM verts LEFT JOIN (SELECT src AS id, CAST(count(*) AS DOUBLE) AS d
         |                              FROM e GROUP BY src) o ON verts.id = o.id),
         |r0 AS MATERIALIZED (SELECT id, $r0Expr AS r FROM verts, n)""".stripMargin
    val iters = (1 to k).map { i =>
      s"""s$i AS (SELECT sum(r${i - 1}.r) AS m FROM r${i - 1}
         |        JOIN deg ON deg.id = r${i - 1}.id AND deg.sink),
         |c$i AS MATERIALIZED (SELECT e.dst AS id, sum(${term.format(i - 1)}) AS c
         |        FROM e JOIN r${i - 1} ON r${i - 1}.id = e.src
         |        JOIN deg ON deg.id = e.src GROUP BY e.dst),
         |r$i AS MATERIALIZED (SELECT verts.id,
         |        ${baseExpr(i)} + 0.85 * COALESCE(c$i.c, 0) AS r
         |        FROM verts CROSS JOIN n CROSS JOIN s$i
         |        LEFT JOIN c$i ON c$i.id = verts.id)""".stripMargin
    }.mkString(",\n")
    val fin = if (rawFinal) s"SELECT id, r FROM r$k"
      else s"SELECT id, round(r, 8) AS r FROM r$k"
    s"$prelude,\n$iters\n$fin"
  }

  /** The LCG LSH bucket chain shared (verbatim, like the Scala side's
    * Dedup.minhashBucketsLcg) by the dedup_minhash_lcg and
    * dedup_minhash_clusters_lcg oracles: documents -> shingles ->
    * dense-rank ids -> 32 LCG permutations -> banded folds `bk(doc_id,
    * band, bkt)`. Keep ONE copy so the two DuckDB replays cannot drift.
    */
  private val minhashLcgBucketsCtes =
    """toks AS (SELECT doc_id,
      |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS tk
      |  FROM documents),
      |sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS sh
      |       FROM toks, UNNEST(range(1, len(tk) - 1)) AS u(i)),
      |vocab AS (SELECT sh, CAST(dense_rank() OVER (ORDER BY sh) - 1 AS BIGINT) AS sid
      |          FROM (SELECT DISTINCT sh FROM sh)),
      |shs AS (SELECT s.doc_id, v.sid FROM sh s JOIN vocab v USING (sh)),
      |js AS (SELECT CAST(j AS BIGINT) AS j FROM range(32) t(j)),
      |sig AS MATERIALIZED (SELECT doc_id, j,
      |    MIN(((48271*j + 16807) % 2147483647 * (sid % 2147483647)
      |         + (69621*j + 12345) % 2147483647) % 2147483647) AS m
      |  FROM shs CROSS JOIN js GROUP BY doc_id, j),
      |bl AS (SELECT doc_id, CAST(j // 4 AS BIGINT) AS band,
      |         list(m ORDER BY j) AS l FROM sig GROUP BY doc_id, band),
      |bk AS (SELECT doc_id, band,
      |  ((((l[1]*8191 + l[2]) % 2147483647) * 8191 + l[3]) % 2147483647
      |    * 8191 + l[4]) % 2147483647 AS bkt FROM bl)""".stripMargin

  /** Oracle for dedup_minhash_clusters_lcg: the shared LCG bucket chain,
    * star links doc -> per-bucket min doc, then `rounds` unrolled rounds of
    * undirected min-label propagation — the connected-components fixpoint
    * once rounds >= the link graph's diameter (measured 3 at sf0.01; the
    * unroll carries a >4x margin).
    */
  /** The dedup_simhash_lcg query (also nested as a subquery by the
    * eval_cluster_ari oracle). */
  private val simhashLcgSql: String =
    s"""WITH tok AS (SELECT doc_id,
       |  unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |                     x -> len(x) > 0)) AS tok
       |  FROM documents),
       |vocab AS (SELECT tok,
       |  CAST(dense_rank() OVER (ORDER BY tok) - 1 AS BIGINT) AS tid
       |  FROM (SELECT DISTINCT tok FROM tok)),
       |tids AS (SELECT t.doc_id, v.tid FROM tok t JOIN vocab v USING (tok)),
       |votes AS (
       |  SELECT doc_id, bb.range AS b,
       |    sum(CASE WHEN ((48271*bb.range + 16807) % 2147483647 * tid
       |                   + (69621*bb.range + 12345) % 2147483647)
       |             % 2147483647 % 2 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM tids CROSS JOIN range(0, 32) bb GROUP BY 1, 2)
       |SELECT doc_id,
       |  CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
       |FROM votes GROUP BY doc_id""".stripMargin

  private def minhashClustersLcgSql(rounds: Int): String = {
    val prop = (1 to rounds).map { i =>
      s"""l$i AS MATERIALIZED (SELECT l.v,
         |  min(least(l.lbl, coalesce(n.lbl, l.lbl))) AS lbl
         |  FROM l${i - 1} l LEFT JOIN und u ON u.a = l.v
         |  LEFT JOIN l${i - 1} n ON n.v = u.b
         |  GROUP BY l.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH $minhashLcgBucketsCtes,
       |bmin AS (SELECT band, bkt, min(doc_id) AS rep FROM bk GROUP BY 1, 2),
       |links AS (SELECT DISTINCT b.doc_id AS src, m.rep AS dst
       |          FROM bk b JOIN bmin m USING (band, bkt) WHERE b.doc_id <> m.rep),
       |und AS (SELECT src AS a, dst AS b FROM links
       |        UNION SELECT dst AS a, src AS b FROM links),
       |l0 AS (SELECT v, v AS lbl FROM (SELECT DISTINCT a AS v FROM und)),
       |$prop
       |SELECT d.doc_id, coalesce(lf.lbl, d.doc_id) AS rep_id
       |FROM documents d LEFT JOIN l$rounds lf ON lf.v = d.doc_id""".stripMargin
  }

  // --- link-analysis oracle SQL over the sparse arithmetic fixture -------

  private val arithCanonCte =
    s"canon AS MATERIALIZED (SELECT src, dst FROM ($edgesArithSql))"

  private def lccSql: String =
    s"""WITH $arithCanonCte,
       |und AS (SELECT src AS a, dst AS b FROM canon UNION ALL SELECT dst, src FROM canon),
       |deg AS MATERIALIZED (SELECT a AS vid, count(*) AS deg FROM und GROUP BY a),
       |tri AS MATERIALIZED (SELECT x.src AS a, x.dst AS b, y.dst AS c
       |     FROM canon x JOIN canon y ON x.dst = y.src
       |     JOIN canon z ON z.src = x.src AND z.dst = y.dst),
       |pv AS (SELECT tid, count(*) AS tri FROM (
       |       SELECT a AS tid FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
       |     GROUP BY tid)
       |SELECT deg.vid AS id, deg.deg, COALESCE(pv.tri, 0) AS tri,
       |  round(CASE WHEN deg.deg >= 2
       |    THEN CAST(COALESCE(pv.tri, 0) AS DOUBLE) * 2.0
       |         / (CAST(deg.deg AS DOUBLE) * (CAST(deg.deg AS DOUBLE) - 1.0))
       |    ELSE 0.0 END, 8) AS lcc
       |FROM deg LEFT JOIN pv ON deg.vid = pv.tid""".stripMargin

  private def linkpredSql: String =
    s"""WITH $arithCanonCte,
       |und AS (SELECT src AS a, dst AS b FROM canon UNION ALL SELECT dst, src FROM canon),
       |deg AS MATERIALIZED (SELECT a AS vid, count(*) AS deg FROM und GROUP BY a),
       |nbrs AS MATERIALIZED (SELECT und.a AS z, und.b AS u, 1.0 / ln(CAST(deg.deg AS DOUBLE)) AS zw
       |     FROM und JOIN deg ON deg.vid = und.a),
       |pairs AS MATERIALIZED (SELECT l.u AS a, r.u AS b, count(*) AS common, sum(l.zw) AS aa
       |     FROM nbrs l JOIN nbrs r ON l.z = r.z AND l.u < r.u GROUP BY 1, 2),
       |np AS (SELECT p.* FROM pairs p ANTI JOIN canon c ON p.a = c.src AND p.b = c.dst)
       |SELECT np.a, np.b, np.common,
       |  round(CAST(np.common AS DOUBLE) / CAST(da.deg + db.deg - np.common AS DOUBLE), 8) AS jaccard,
       |  round(np.aa, 8) AS adamic_adar
       |FROM np JOIN deg da ON da.vid = np.a JOIN deg db ON db.vid = np.b""".stripMargin

  private def kcoreUnrolledSql(k: Int, rounds: Int): String = {
    val rs = (0 until rounds).map { i =>
      s"""d$i AS MATERIALIZED (SELECT nid, count(*) AS deg FROM (
         |  SELECT src AS nid FROM c$i UNION ALL SELECT dst FROM c$i) GROUP BY nid),
         |k$i AS (SELECT nid FROM d$i WHERE deg >= $k),
         |c${i + 1} AS MATERIALIZED (SELECT c$i.src, c$i.dst FROM c$i
         |  JOIN k$i ka ON ka.nid = c$i.src JOIN k$i kb ON kb.nid = c$i.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH c0 AS MATERIALIZED (SELECT src, dst FROM ($edgesArithSql)
       |  UNION ALL SELECT src, dst FROM ($plantedCliqueSql)),
       |$rs
       |SELECT nid AS id, count(*) AS core_deg FROM (
       |  SELECT src AS nid FROM c$rounds UNION ALL SELECT dst FROM c$rounds) GROUP BY nid
       |HAVING count(*) >= $k""".stripMargin
  }

  private def corenessUnrolledSql(maxK: Int, rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(s"""WITH c1_0 AS MATERIALIZED (SELECT src, dst FROM ($edgesArithSql)
      |  UNION ALL SELECT src, dst FROM ($plantedCliqueSql))""".stripMargin)
    for (k <- 1 to maxK) {
      if (k > 1) sb.append(s",\nc${k}_0 AS (SELECT src, dst FROM c${k - 1}_$rounds)")
      for (r <- 0 until rounds) {
        sb.append(s""",
d${k}_$r AS MATERIALIZED (SELECT nid, count(*) AS deg FROM (
  SELECT src AS nid FROM c${k}_$r UNION ALL SELECT dst FROM c${k}_$r) GROUP BY nid),
q${k}_$r AS (SELECT nid FROM d${k}_$r WHERE deg >= $k),
c${k}_${r + 1} AS MATERIALIZED (SELECT c.src, c.dst FROM c${k}_$r c
  JOIN q${k}_$r ka ON ka.nid = c.src JOIN q${k}_$r kb ON kb.nid = c.dst)""")
      }
      sb.append(s""",
surv$k AS (SELECT DISTINCT nid FROM (
  SELECT src AS nid FROM c${k}_$rounds UNION ALL SELECT dst FROM c${k}_$rounds))""")
    }
    val unions = (1 to maxK).map(k => s"SELECT nid, $k AS k FROM surv$k").mkString(" UNION ALL ")
    sb.append(s""",
univ AS (SELECT DISTINCT nid FROM (SELECT src AS nid FROM c1_0 UNION ALL SELECT dst FROM c1_0)),
mk AS (SELECT nid, max(k) AS mk FROM ($unions) GROUP BY nid)
SELECT univ.nid AS id, CAST(COALESCE(mk.mk, 0) AS BIGINT) AS coreness
FROM univ LEFT JOIN mk ON mk.nid = univ.nid""")
    sb.toString
  }

  /** Truss decomposition, unrolled like [[corenessUnrolledSql]] but peeling
    * EDGES by triangle support: level k keeps edges in >= k-2 triangles
    * (`rounds` filter rounds each — converged rounds are no-ops), and an
    * edge's trussness is the largest k whose survivor set still contains it
    * (2 if it is in no triangle).
    */
  private def trussnessUnrolledSql(maxK: Int, rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(s"""WITH c3_0 AS MATERIALIZED (
      |  SELECT src, dst FROM ($edgesArithSql)
      |  UNION ALL SELECT src, dst FROM ($plantedCliqueSql))""".stripMargin)
    for (k <- 3 to maxK) {
      if (k > 3) sb.append(s",\nc${k}_0 AS (SELECT src, dst FROM c${k - 1}_$rounds)")
      for (r <- 0 until rounds) {
        sb.append(s""",
tri${k}_$r AS (SELECT x.src AS a, x.dst AS b, y.dst AS c FROM c${k}_$r x
  JOIN c${k}_$r y ON y.src = x.dst
  JOIN c${k}_$r z ON z.src = x.src AND z.dst = y.dst),
sup${k}_$r AS MATERIALIZED (SELECT src, dst, count(*) AS s FROM (
  SELECT a AS src, b AS dst FROM tri${k}_$r
  UNION ALL SELECT b, c FROM tri${k}_$r
  UNION ALL SELECT a, c FROM tri${k}_$r) GROUP BY src, dst),
c${k}_${r + 1} AS MATERIALIZED (SELECT c.src, c.dst FROM c${k}_$r c
  JOIN sup${k}_$r q ON q.src = c.src AND q.dst = c.dst WHERE q.s >= ${k - 2})""")
      }
    }
    val unions = (3 to maxK)
      .map(k => s"SELECT src, dst, $k AS k FROM c${k}_$rounds").mkString(" UNION ALL ")
    sb.append(s""",
mk AS (SELECT src, dst, max(k) AS mk FROM ($unions) GROUP BY src, dst)
SELECT u.src, u.dst, CAST(COALESCE(mk.mk, 2) AS BIGINT) AS trussness
FROM c3_0 u LEFT JOIN mk ON mk.src = u.src AND mk.dst = u.dst""")
    sb.toString
  }

  /** GBMatrix.rmat mirror: the same per-level LCG quadrant residues, bits
    * summed as integer CASE terms — exact in both engines.
    */
  // squared-Lehmer residue, shared by both rmat SQL bit expressions
  private def rmatR(l: Int, seed: Long): String =
    s"(((i*48271 + $l*2000003 + ${seed + 987654321L}) % 1000000007) * ((i*48271 + $l*2000003 + ${seed + 987654321L}) % 1000000007)) % 1000000007 % 16"

  private def rmatSql(scale: Int, seed: Long, mult: Int,
                      a16: Int, b16: Int, c16: Int): String = {
    val rowTerms = (0 until scale).map { l =>
      s"(CASE WHEN ${rmatR(l, seed)} < ${a16 + b16} THEN 0 ELSE ${1L << l} END)"
    }.mkString(" + ")
    val colTerms = (0 until scale).map { l =>
      val r = rmatR(l, seed)
      s"(CASE WHEN $r < $a16 THEN 0 WHEN $r < ${a16 + b16} THEN ${1L << l}" +
        s" WHEN $r < ${a16 + b16 + c16} THEN 0 ELSE ${1L << l} END)"
    }.mkString(" + ")
    s"""WITH ids AS (SELECT CAST((s.rn - 1) * $mult + t.x AS BIGINT) AS i
       |  FROM (SELECT row_number() OVER () AS rn FROM supplier) s,
       |       generate_series(0, ${mult - 1}) t(x)),
       |e AS (SELECT $rowTerms AS src, $colTerms AS dst FROM ids)
       |SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM e GROUP BY 1, 2""".stripMargin
  }

  /** MIS.runLcg mirror: round i draws the same LCG priority for every
    * remaining candidate, winners beat every CANDIDATE neighbor strictly,
    * winners+neighbors leave the pool. Over-provisioned rounds are no-ops
    * (empty candidate set ⇒ empty winners).
    */
  private def misUnrolledSql(rounds: Int): String = {
    val prelude =
      s"""WITH $arithCanonCte,
         |und AS MATERIALIZED (SELECT src AS a, dst AS b FROM canon UNION ALL SELECT dst, src FROM canon),
         |verts AS MATERIALIZED (SELECT DISTINCT a AS id FROM und),
         |u0 AS (SELECT id FROM verts),
         |m0 AS (SELECT id FROM verts WHERE 1=0)""".stripMargin
    val rs = (1 to rounds).map { i =>
      val j = i - 1
      s"""sc$i AS MATERIALIZED (SELECT id, (id*48271 + $i*2000003 + 11213) % 1000000007 AS p FROM u$j),
         |nm$i AS (SELECT und.a AS id, MAX(sc.p) AS mp FROM und
         |  JOIN sc$i sc ON sc.id = und.b GROUP BY und.a),
         |win$i AS MATERIALIZED (SELECT s.id FROM sc$i s
         |  LEFT JOIN nm$i ON nm$i.id = s.id WHERE s.p > COALESCE(nm$i.mp, -1)),
         |m$i AS MATERIALIZED (SELECT * FROM m$j UNION ALL SELECT id FROM win$i),
         |rm$i AS (SELECT DISTINCT id FROM (
         |  SELECT id FROM win$i UNION ALL
         |  SELECT und.b FROM und JOIN win$i w ON w.id = und.a)),
         |u$i AS MATERIALIZED (SELECT uu.id FROM u$j uu ANTI JOIN rm$i r ON r.id = uu.id)""".stripMargin
    }.mkString(",\n")
    s"""$prelude,
       |$rs
       |SELECT v.id, CAST(m.id IS NOT NULL AS BIGINT) AS in_set
       |FROM verts v LEFT JOIN m$rounds m ON m.id = v.id""".stripMargin
  }

  /** SimRank mirror (SimRank.scala): DECIMAL(38,15) contribution sums make
    * the per-iteration values bit-identical to the engine's regardless of
    * aggregation order; round(,6) only at the output.
    */
  private def simrankUnrolledSql(k: Int): String = {
    val prelude =
      s"""WITH e AS MATERIALIZED (SELECT src, dst FROM ($edgesArithDirSql)),
         |verts AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
         |ind AS MATERIALIZED (SELECT dst AS id, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY dst),
         |s0 AS MATERIALIZED (SELECT id AS a, id AS b, CAST(1.0 AS DOUBLE) AS s FROM verts)""".stripMargin
    val its = (1 to k).map { i =>
      s"""s$i AS MATERIALIZED (
         |  SELECT q.na AS a, q.nb AS b,
         |    0.8125 * CAST(q.ssum AS DOUBLE) / (da.d * db.d) AS s
         |  FROM (SELECT e1.dst AS na, e2.dst AS nb,
         |          SUM(CAST(p.s AS DECIMAL(38,15))) AS ssum
         |        FROM s${i - 1} p JOIN e e1 ON e1.src = p.a
         |        JOIN e e2 ON e2.src = p.b
         |        WHERE e1.dst <> e2.dst GROUP BY e1.dst, e2.dst) q
         |  JOIN ind da ON da.id = q.na JOIN ind db ON db.id = q.nb
         |  UNION ALL SELECT id, id, 1.0 FROM verts)""".stripMargin
    }.mkString(",\n")
    s"$prelude,\n$its\nSELECT a, b, round(s, 6) AS s FROM s$k"
  }

  /** NeighborSample.negatives mirror: dense rank = ROW_NUMBER()-1 over id,
    * the same LCG proposal indices, true-edge rejection, min-t dedup.
    */
  private def negativesSql(k: Int, m: Int, seed: Long): String =
    s"""WITH e AS MATERIALIZED (SELECT src, dst FROM ($edgesArithDirSql)),
       |idx AS MATERIALIZED (SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 AS ridx
       |  FROM (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e))),
       |nn AS (SELECT count(*) AS n FROM idx),
       |props AS (
       |  SELECT i.id AS src, MIN(t.x) AS t, c.id AS neg
       |  FROM idx i CROSS JOIN nn
       |  JOIN (SELECT CAST(x AS BIGINT) AS x FROM generate_series(0, ${m - 1}) s(x)) t ON TRUE
       |  JOIN idx c ON c.ridx = (i.ridx * 48271 + t.x * 2000003 + $seed) % nn.n
       |  WHERE c.id <> i.id
       |    AND NOT EXISTS (SELECT 1 FROM e WHERE e.src = i.id AND e.dst = c.id)
       |  GROUP BY i.id, c.id)
       |SELECT src, CAST(rn AS BIGINT) AS rnk, neg FROM (
       |  SELECT src, neg, ROW_NUMBER() OVER (PARTITION BY src ORDER BY t) AS rn
       |  FROM props) WHERE rn <= $k""".stripMargin

  /** GraphStats.richClub mirror over the sparse arithmetic fixture. */
  private def richClubSql: String =
    s"""WITH $arithCanonCte,
       |deg AS MATERIALIZED (SELECT id, count(*) AS deg FROM (
       |  SELECT src AS id FROM canon UNION ALL SELECT dst FROM canon) GROUP BY id),
       |hist AS MATERIALIZED (SELECT deg, count(*) AS nv FROM deg GROUP BY deg),
       |em AS MATERIALIZED (SELECT m, count(*) AS ne FROM (
       |  SELECT least(da.deg, db.deg) AS m FROM canon
       |  JOIN deg da ON da.id = canon.src JOIN deg db ON db.id = canon.dst) GROUP BY m),
       |ks AS (SELECT deg AS k FROM hist),
       |nk AS (SELECT ks.k, CAST(SUM(hist.nv) AS BIGINT) AS nk FROM ks JOIN hist ON hist.deg > ks.k GROUP BY ks.k),
       |ek AS (SELECT ks.k, CAST(COALESCE(SUM(em.ne), 0) AS BIGINT) AS ek FROM ks LEFT JOIN em ON em.m > ks.k GROUP BY ks.k)
       |SELECT nk.k, nk.nk, ek.ek,
       |  round(2.0 * ek.ek / (CAST(nk.nk AS DOUBLE) * (nk.nk - 1)), 6) AS phi
       |FROM nk JOIN ek ON ek.k = nk.k WHERE nk.nk >= 2""".stripMargin

  /** NeighborSample.fanout mirror: global per-src top-k by the same LCG
    * priority (the engine's two-phase salted top-k computes exactly this).
    */
  private def fanoutSql(k: Int, seed: Long): String =
    s"""SELECT src, CAST(rn AS BIGINT) AS rnk, dst FROM (
       |  SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src
       |    ORDER BY (dst*48271 + src*2000003 + $seed) % 1000000007, dst) AS rn
       |  FROM ($edgesArithDirSql)) t WHERE rn <= $k""".stripMargin

  private def hitsUnrolledSql(k: Int): String = {
    val prelude =
      s"""WITH e AS MATERIALIZED (SELECT src, dst FROM ($edgesBiSql)),
         |verts AS MATERIALIZED (SELECT DISTINCT vid FROM (SELECT src AS vid FROM e UNION ALL SELECT dst FROM e)),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
         |hs0 AS MATERIALIZED (SELECT vid, 1.0 / nn.n AS h, 1.0 / nn.n AS a FROM verts, nn)""".stripMargin
    val its = (1 to k).map { i =>
      s"""ar$i AS MATERIALIZED (SELECT e.dst AS vid, sum(p.h) AS r FROM e JOIN hs${i - 1} p ON p.vid = e.src GROUP BY e.dst),
         |asum$i AS (SELECT sum(r) AS s FROM ar$i),
         |a$i AS MATERIALIZED (SELECT v.vid, COALESCE(ar$i.r, 0) / asum$i.s AS a, p.h
         |  FROM verts v CROSS JOIN asum$i LEFT JOIN ar$i ON ar$i.vid = v.vid
         |  JOIN hs${i - 1} p ON p.vid = v.vid),
         |hr$i AS MATERIALIZED (SELECT e.src AS vid, sum(q.a) AS r FROM e JOIN a$i q ON q.vid = e.dst GROUP BY e.src),
         |hsum$i AS (SELECT sum(r) AS s FROM hr$i),
         |hs$i AS MATERIALIZED (SELECT v.vid, COALESCE(hr$i.r, 0) / hsum$i.s AS h, q.a
         |  FROM verts v CROSS JOIN hsum$i LEFT JOIN hr$i ON hr$i.vid = v.vid
         |  JOIN a$i q ON q.vid = v.vid)""".stripMargin
    }.mkString(",\n")
    s"$prelude,\n$its\nSELECT vid AS id, round(h, 8) AS hub, round(a, 8) AS auth FROM hs$k"
  }

  // SALSA = HITS with degree-normalized half-steps: the 1/outdeg and
  // 1/indeg weights ride the edge table (ew), mirroring SALSA.scala
  private def salsaUnrolledSql(k: Int): String = {
    val prelude =
      s"""WITH e AS MATERIALIZED (SELECT src, dst FROM ($edgesArithDirSql)),
         |outd AS (SELECT src, CAST(count(*) AS DOUBLE) AS od FROM e GROUP BY src),
         |ind AS (SELECT dst, CAST(count(*) AS DOUBLE) AS idg FROM e GROUP BY dst),
         |ew AS MATERIALIZED (SELECT e.src, e.dst, 1.0 / outd.od AS wo, 1.0 / ind.idg AS wi
         |  FROM e JOIN outd ON outd.src = e.src JOIN ind ON ind.dst = e.dst),
         |verts AS MATERIALIZED (SELECT DISTINCT vid FROM (SELECT src AS vid FROM e UNION ALL SELECT dst FROM e)),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
         |hs0 AS MATERIALIZED (SELECT vid, 1.0 / nn.n AS h, 1.0 / nn.n AS a FROM verts, nn)""".stripMargin
    val its = (1 to k).map { i =>
      s"""ar$i AS MATERIALIZED (SELECT ew.dst AS vid, sum(p.h * ew.wo) AS r FROM ew JOIN hs${i - 1} p ON p.vid = ew.src GROUP BY ew.dst),
         |asum$i AS (SELECT sum(r) AS s FROM ar$i),
         |a$i AS MATERIALIZED (SELECT v.vid, COALESCE(ar$i.r, 0) / asum$i.s AS a, p.h
         |  FROM verts v CROSS JOIN asum$i LEFT JOIN ar$i ON ar$i.vid = v.vid
         |  JOIN hs${i - 1} p ON p.vid = v.vid),
         |hr$i AS MATERIALIZED (SELECT ew.src AS vid, sum(q.a * ew.wi) AS r FROM ew JOIN a$i q ON q.vid = ew.dst GROUP BY ew.src),
         |hsum$i AS (SELECT sum(r) AS s FROM hr$i),
         |hs$i AS MATERIALIZED (SELECT v.vid, COALESCE(hr$i.r, 0) / hsum$i.s AS h, q.a
         |  FROM verts v CROSS JOIN hsum$i LEFT JOIN hr$i ON hr$i.vid = v.vid
         |  JOIN a$i q ON q.vid = v.vid)""".stripMargin
    }.mkString(",\n")
    s"$prelude,\n$its\nSELECT vid AS id, round(h, 8) AS hub, round(a, 8) AS auth FROM hs$k"
  }

  private def randomWalkSql(steps: Int): String = {
    val prelude =
      s"""WITH $arithCanonCte,
         |und AS (SELECT src AS a, dst AS b FROM canon UNION ALL SELECT dst, src FROM canon),
         |ranked AS MATERIALIZED (SELECT a AS v, b AS nxt,
         |    CAST(row_number() OVER (PARTITION BY a ORDER BY b) - 1 AS BIGINT) AS rk,
         |    CAST(count(*) OVER (PARTITION BY a) AS BIGINT) AS deg
         |  FROM und),
         |w0 AS (SELECT DISTINCT v AS walk, v FROM ranked WHERE v % 10 = 0)""".stripMargin
    val hops = (1 to steps).map { t =>
      s"""w$t AS MATERIALIZED (SELECT w.walk, r.nxt AS v FROM w${t - 1} w JOIN ranked r ON r.v = w.v
         |  AND r.rk = (w.walk * 48271 + $t * 11213 + w.v * 7919) % r.deg)""".stripMargin
    }.mkString(",\n")
    val sel = (0 to steps)
      .map(t => s"SELECT walk, CAST($t AS BIGINT) AS step, v FROM w$t")
      .mkString(" UNION ALL ")
    s"$prelude,\n$hops\nSELECT walk, step, v FROM ($sel)"
  }

  /** node2vec second-order walk replay: per hop, rank the neighborhood,
    * weight each neighbor by its return/common/outward class (1/2/4), prefix-
    * sum in rank order, and land the Lehmer slot in its weight interval —
    * the same pure function of (walk, step, position) the engine computes.
    */
  private def node2vecSql(steps: Int): String = {
    val prelude =
      s"""WITH $arithCanonCte,
         |und AS (SELECT src AS a, dst AS b FROM canon UNION ALL SELECT dst, src FROM canon),
         |ranked AS MATERIALIZED (SELECT a AS v, b AS nxt,
         |    CAST(row_number() OVER (PARTITION BY a ORDER BY b) - 1 AS BIGINT) AS rk,
         |    CAST(count(*) OVER (PARTITION BY a) AS BIGINT) AS deg
         |  FROM und),
         |w0 AS (SELECT DISTINCT v AS walk, v FROM ranked WHERE v % 10 = 0),
         |w1 AS MATERIALIZED (SELECT w.walk, w.v AS prev, r.nxt AS v
         |  FROM w0 w JOIN ranked r ON r.v = w.v
         |  AND r.rk = (w.walk * 48271 + 11213 + w.v * 7919) % r.deg)""".stripMargin
    val hops = (2 to steps).map { t =>
      s"""n$t AS (SELECT w.walk, w.prev, w.v, r.nxt, r.rk,
         |    CASE WHEN r.nxt = w.prev THEN 1
         |         WHEN c.src IS NOT NULL THEN 2 ELSE 4 END AS wgt
         |  FROM w${t - 1} w JOIN ranked r ON r.v = w.v
         |  LEFT JOIN canon c ON c.src = LEAST(w.prev, r.nxt) AND c.dst = GREATEST(w.prev, r.nxt)),
         |c$t AS MATERIALIZED (SELECT *,
         |    COALESCE(sum(wgt) OVER (PARTITION BY walk ORDER BY rk
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
         |    sum(wgt) OVER (PARTITION BY walk) AS tot
         |  FROM n$t),
         |w$t AS MATERIALIZED (SELECT walk, v AS prev, nxt AS v FROM c$t
         |  WHERE (walk * 48271 + $t * 11213 + v * 7919) % tot >= cum
         |    AND (walk * 48271 + $t * 11213 + v * 7919) % tot < cum + wgt)""".stripMargin
    }.mkString(",\n")
    val sel = (s"SELECT walk, CAST(0 AS BIGINT) AS step, v FROM w0" +:
      (1 to steps).map(t => s"SELECT walk, CAST($t AS BIGINT) AS step, v FROM w$t"))
      .mkString(" UNION ALL ")
    s"$prelude,\n$hops\nSELECT walk, step, v FROM ($sel)"
  }

  /** Widest path by finite closure: (id, width) states only ever take
    * values from the finite edge-weight set (plus the 1e18 seed), so the
    * recursive UNION terminates; MAX per id is the max-min fixpoint.
    */
  private def widestSql: String =
    s"""WITH RECURSIVE canon AS MATERIALIZED (SELECT src, dst FROM ($edgesArithSql)),
       |ew AS MATERIALIZED (SELECT src AS a, dst AS b,
       |  CAST((src*7 + dst*13) % 97 + 1 AS DOUBLE) AS w FROM canon),
       |ue AS (SELECT a, b, w FROM ew UNION ALL SELECT b, a, w FROM ew),
       |wp AS (
       |  SELECT CAST(0 AS BIGINT) AS id, CAST(1e18 AS DOUBLE) AS wd
       |  UNION
       |  SELECT ue.b, LEAST(wp.wd, ue.w) FROM wp JOIN ue ON ue.a = wp.id
       |)
       |SELECT id, MAX(wd) AS width FROM wp GROUP BY id""".stripMargin

  /** SCC by brute transitive closure — viable because the oracle runs at
    * sf0.01 (100 vertices); the engine side is the scalable trim+color+sweep.
    */
  private def sccSql: String =
    s"""WITH RECURSIVE e AS MATERIALIZED (SELECT src, dst FROM ($edgesArithDirSql)),
       |verts AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
       |reach AS (
       |  SELECT src AS a, dst AS b FROM e
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
       |),
       |mutual AS (SELECT r1.a AS v, r1.b AS u FROM reach r1
       |           JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a)
       |SELECT verts.id AS id,
       |  CAST(LEAST(verts.id, COALESCE(MIN(m.u), verts.id)) AS BIGINT) AS scc
       |FROM verts LEFT JOIN mutual m ON m.v = verts.id
       |GROUP BY verts.id""".stripMargin

  /** Condensation DAG levels: reuse the transitive-closure SCC labeling,
    * contract, then longest-path-from-anywhere per component (recursion
    * seeded at EVERY dag vertex — a path from a true source dominates any
    * suffix, so MAX(d) is the topological level). Isolated components
    * level 0 via the left join.
    */
  private def condensationSql: String =
    s"""WITH RECURSIVE e AS MATERIALIZED (SELECT src, dst FROM ($edgesArithDirSql)),
       |verts AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
       |reach AS (
       |  SELECT src AS a, dst AS b FROM e
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
       |),
       |mutual AS (SELECT r1.a AS v, r1.b AS u FROM reach r1
       |           JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a),
       |sccm AS MATERIALIZED (SELECT verts.id AS id,
       |    CAST(LEAST(verts.id, COALESCE(MIN(m.u), verts.id)) AS BIGINT) AS scc
       |  FROM verts LEFT JOIN mutual m ON m.v = verts.id GROUP BY verts.id),
       |dag AS MATERIALIZED (SELECT DISTINCT sa.scc AS a, sb.scc AS b FROM e
       |  JOIN sccm sa ON sa.id = e.src JOIN sccm sb ON sb.id = e.dst
       |  WHERE sa.scc <> sb.scc),
       |dv AS (SELECT DISTINCT a AS v FROM dag UNION SELECT DISTINCT b FROM dag),
       |lp AS (
       |  SELECT v, 0 AS d FROM dv
       |  UNION
       |  SELECT dag.b, lp.d + 1 FROM lp JOIN dag ON dag.a = lp.v WHERE lp.d < 300
       |),
       |ml AS (SELECT v AS scc, MAX(d) AS level FROM lp GROUP BY v),
       |sccs AS (SELECT DISTINCT scc FROM sccm)
       |SELECT sccs.scc, CAST(COALESCE(ml.level, 0) AS BIGINT) AS level
       |FROM sccs LEFT JOIN ml ON ml.scc = sccs.scc""".stripMargin

  /** Broder bow-tie classification via two transitive closures (directed +
    * undirected) — mirrors algos/Bowtie exactly: CORE = largest SCC (tie:
    * min label); IN/OUT = backward/forward reach minus CORE; TUBE =
    * weak-component vertex both reachable from IN and reaching OUT; TENDRIL
    * = rest of the weak component; DISC = the rest.
    */
  private def bowtieSql: String =
    s"""WITH RECURSIVE e AS MATERIALIZED (
       |  SELECT src, dst FROM ($edgesArithDirSql)
       |  UNION SELECT src, dst FROM ($plantedBowtieSql)),
       |verts AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
       |reach AS (
       |  SELECT src AS a, dst AS b FROM e
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
       |),
       |mutual AS (SELECT r1.a AS v, r1.b AS u FROM reach r1
       |           JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a),
       |sccm AS MATERIALIZED (SELECT verts.id AS id,
       |    CAST(LEAST(verts.id, COALESCE(MIN(m.u), verts.id)) AS BIGINT) AS scc
       |  FROM verts LEFT JOIN mutual m ON m.v = verts.id GROUP BY verts.id),
       |corel AS (SELECT scc FROM (SELECT scc, count(*) AS sz FROM sccm GROUP BY scc)
       |          ORDER BY sz DESC, scc ASC LIMIT 1),
       |core AS MATERIALIZED (SELECT id FROM sccm WHERE scc = (SELECT scc FROM corel)),
       |-- NOTE: under WITH RECURSIVE, DuckDB executes a TOP-LEVEL-UNION CTE
       |-- without the final dedup (and rejects EXCEPT outright), so every set
       |-- here is a DISTINCT over UNION ALL, and set difference is ANTI JOIN
       |fwd AS (SELECT DISTINCT id FROM (SELECT id FROM core
       |  UNION ALL SELECT r.b FROM reach r JOIN core c ON c.id = r.a)),
       |bwd AS (SELECT DISTINCT id FROM (SELECT id FROM core
       |  UNION ALL SELECT r.a FROM reach r JOIN core c ON c.id = r.b)),
       |ins AS MATERIALIZED (SELECT bwd.id FROM bwd ANTI JOIN core ON core.id = bwd.id),
       |outs AS MATERIALIZED (SELECT fwd.id FROM fwd ANTI JOIN core ON core.id = fwd.id),
       |ue AS (SELECT DISTINCT s, t FROM (SELECT src AS s, dst AS t FROM e
       |  UNION ALL SELECT dst, src FROM e)),
       |ureach AS (
       |  SELECT s AS a, t AS b FROM ue
       |  UNION
       |  SELECT r.a, ue.t FROM ureach r JOIN ue ON ue.s = r.b
       |),
       |weakv AS (SELECT DISTINCT id FROM (SELECT id FROM core
       |  UNION ALL SELECT r.b FROM ureach r JOIN core c ON c.id = r.a)),
       |fin AS (SELECT DISTINCT id FROM (SELECT id FROM ins
       |  UNION ALL SELECT r.b FROM reach r JOIN ins i ON i.id = r.a)),
       |tout AS (SELECT DISTINCT id FROM (SELECT id FROM outs
       |  UNION ALL SELECT r.a FROM reach r JOIN outs o ON o.id = r.b))
       |SELECT v.id,
       |  CASE WHEN c.id IS NOT NULL THEN 'CORE'
       |       WHEN i.id IS NOT NULL THEN 'IN'
       |       WHEN o.id IS NOT NULL THEN 'OUT'
       |       WHEN w.id IS NOT NULL AND f.id IS NOT NULL AND t.id IS NOT NULL THEN 'TUBE'
       |       WHEN w.id IS NOT NULL THEN 'TENDRIL'
       |       ELSE 'DISC' END AS cls
       |FROM verts v
       |LEFT JOIN core c ON c.id = v.id
       |LEFT JOIN ins i ON i.id = v.id
       |LEFT JOIN outs o ON o.id = v.id
       |LEFT JOIN weakv w ON w.id = v.id
       |LEFT JOIN fin f ON f.id = v.id
       |LEFT JOIN tout t ON t.id = v.id""".stripMargin

  /** Two unrolled 5-iteration chains over one shared prelude: `p_*` uniform
    * PageRank, `t_*` TrustRank (teleport + sink mass on the id%10==0 seed
    * set — a predicate, like the engine's). Mass from 8-dp-rounded ranks,
    * the identical float expression on both sides.
    */
  private def spamMassSql: String = {
    val k = 5
    def iters(px: String, base: Int => String) = (1 to k).map { i =>
      s"""${px}s$i AS (SELECT sum(${px}r${i - 1}.r) AS m FROM ${px}r${i - 1}
         |        JOIN deg ON deg.id = ${px}r${i - 1}.id AND deg.sink),
         |${px}c$i AS MATERIALIZED (SELECT e.dst AS id, sum(${px}r${i - 1}.r / deg.d) AS c
         |        FROM e JOIN ${px}r${i - 1} ON ${px}r${i - 1}.id = e.src
         |        JOIN deg ON deg.id = e.src GROUP BY e.dst),
         |${px}r$i AS MATERIALIZED (SELECT verts.id,
         |        ${base(i)} + 0.85 * COALESCE(${px}c$i.c, 0) AS r
         |        FROM verts CROSS JOIN n CROSS JOIN ns CROSS JOIN ${px}s$i
         |        LEFT JOIN ${px}c$i ON ${px}c$i.id = verts.id)""".stripMargin
    }.mkString(",\n")
    val pBase = (i: Int) => s"0.15 / n.n + 0.85 * COALESCE(p_s$i.m, 0) / n.n"
    val tBase = (i: Int) =>
      s"""CASE WHEN verts.id % 10 = 0
         |THEN 0.15 / ns.c + 0.85 * COALESCE(t_s$i.m, 0) / ns.c ELSE 0.0 END""".stripMargin
    s"""WITH e AS MATERIALIZED (SELECT src, dst, w FROM ($edgesBiSql)),
       |verts AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
       |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
       |ns AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM verts WHERE id % 10 = 0),
       |deg AS MATERIALIZED (SELECT verts.id, COALESCE(o.d, 1.0) AS d, o.d IS NULL AS sink
       |        FROM verts LEFT JOIN (SELECT src AS id, CAST(count(*) AS DOUBLE) AS d
       |                              FROM e GROUP BY src) o ON verts.id = o.id),
       |p_r0 AS MATERIALIZED (SELECT id, 1.0 / n.n AS r FROM verts, n),
       |t_r0 AS MATERIALIZED (SELECT id, CASE WHEN id % 10 = 0 THEN 1.0 / ns.c ELSE 0.0 END AS r FROM verts, ns),
       |${iters("p_", pBase)},
       |${iters("t_", tBase)},
       |pr8 AS (SELECT id, round(r, 8) AS pr FROM p_r$k),
       |tr8 AS (SELECT id, round(r, 8) AS tr FROM t_r$k)
       |SELECT pr8.id, pr8.pr, tr8.tr,
       |  round((pr8.pr - tr8.tr) / pr8.pr, 6) AS spam_mass
       |FROM pr8 JOIN tr8 ON tr8.id = pr8.id""".stripMargin
  }

  /** Anti-TrustRank: one unrolled biased chain over the REVERSED bipartite
    * edges with the id%7==3 spam-seed predicate — the same iteration algebra
    * as the TrustRank chain in [[spamMassSql]].
    */
  private def antiTrustSql(k: Int): String = {
    val iters = (1 to k).map { i =>
      s"""s$i AS (SELECT sum(r${i - 1}.r) AS m FROM r${i - 1}
         |        JOIN deg ON deg.id = r${i - 1}.id AND deg.sink),
         |c$i AS MATERIALIZED (SELECT e.dst AS id, sum(r${i - 1}.r / deg.d) AS c
         |        FROM e JOIN r${i - 1} ON r${i - 1}.id = e.src
         |        JOIN deg ON deg.id = e.src GROUP BY e.dst),
         |r$i AS MATERIALIZED (SELECT verts.id,
         |        CASE WHEN verts.id % 7 = 3
         |          THEN 0.15 / ns.c + 0.85 * COALESCE(s$i.m, 0) / ns.c
         |          ELSE 0.0 END + 0.85 * COALESCE(c$i.c, 0) AS r
         |        FROM verts CROSS JOIN ns CROSS JOIN s$i
         |        LEFT JOIN c$i ON c$i.id = verts.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT dst AS src, src AS dst, w FROM ($edgesBiSql)),
       |verts AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
       |ns AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM verts WHERE id % 7 = 3),
       |deg AS MATERIALIZED (SELECT verts.id, COALESCE(o.d, 1.0) AS d, o.d IS NULL AS sink
       |        FROM verts LEFT JOIN (SELECT src AS id, CAST(count(*) AS DOUBLE) AS d
       |                              FROM e GROUP BY src) o ON verts.id = o.id),
       |r0 AS MATERIALIZED (SELECT id, CASE WHEN id % 7 = 3 THEN 1.0 / ns.c ELSE 0.0 END AS r FROM verts, ns),
       |$iters
       |SELECT id, round(r, 8) AS atr FROM r$k""".stripMargin
  }

  /** Per-community conductance of the id%5 labeling — exact integer vol/cut
    * (each boundary edge counted toward both communities), one mirrored
    * float division with the min-volume denominator.
    */
  private def conductanceSql: String =
    s"""WITH $arithCanonCte,
       |tagged AS MATERIALIZED (SELECT src % 5 AS la, dst % 5 AS lb FROM canon),
       |m AS (SELECT count(*) AS m FROM tagged),
       |vol AS (SELECT l, count(*) AS vol FROM (
       |  SELECT la AS l FROM tagged UNION ALL SELECT lb FROM tagged) GROUP BY l),
       |cut AS (SELECT l, count(*) AS cut FROM (
       |  SELECT la AS l FROM tagged WHERE la <> lb
       |  UNION ALL SELECT lb FROM tagged WHERE la <> lb) GROUP BY l)
       |SELECT vol.l AS label, CAST(vol.vol AS BIGINT) AS vol,
       |  CAST(COALESCE(cut.cut, 0) AS BIGINT) AS cut,
       |  round(CASE WHEN LEAST(vol.vol, 2*m.m - vol.vol) = 0 THEN 0.0
       |    ELSE CAST(COALESCE(cut.cut, 0) AS DOUBLE)
       |         / CAST(LEAST(vol.vol, 2*m.m - vol.vol) AS DOUBLE) END, 8)
       |    AS conductance
       |FROM vol LEFT JOIN cut ON cut.l = vol.l, m""".stripMargin

  /** Batch min-label components over the full co-supplier graph — the
    * oracle for BOTH `algo_cc` (direct) and `algo_cc_delta` (the
    * incremental path must reproduce the batch answer).
    */
  private def ccFullSql: String =
    s"""WITH RECURSIVE e AS (SELECT src, dst FROM ($edgesSupSql)),
       |und AS (SELECT src AS s, dst AS d FROM e UNION SELECT dst, src FROM e),
       |verts AS (SELECT DISTINCT s AS v FROM und),
       |reach(node, lab) AS (
       |  SELECT v, v FROM verts
       |  UNION
       |  SELECT und.d, reach.lab FROM reach JOIN und ON und.s = reach.node)
       |SELECT node AS id, min(lab) AS comp FROM reach GROUP BY node""".stripMargin

  /** Hub-removal percolation: per pct, a ranked top-k delete, a recursive
    * min-label closure over the survivor graph, and exact integer summary
    * scalars. One recursive CTE per pct (DuckDB allows several per
    * WITH RECURSIVE list); non-recursive unions are SELECT DISTINCT over
    * UNION ALL (top-level UNION in a non-self-referential CTE under
    * WITH RECURSIVE skips the dedup).
    */
  private def percolationSql(pcts: Seq[Int]): String = {
    val blocks = pcts.map { p =>
      s"""rm$p AS (SELECT v FROM ranked, nn WHERE rk <= (nn.n * $p) // 100),
         |surv$p AS (SELECT src, dst FROM canon
         |  WHERE src NOT IN (SELECT v FROM rm$p) AND dst NOT IN (SELECT v FROM rm$p)),
         |und$p AS (SELECT src AS s, dst AS d FROM surv$p UNION ALL SELECT dst, src FROM surv$p),
         |sv$p AS (SELECT DISTINCT s AS v FROM und$p),
         |reach$p(node, lab) AS (
         |  SELECT v, v FROM sv$p
         |  UNION
         |  SELECT und$p.d, reach$p.lab FROM reach$p JOIN und$p ON und$p.s = reach$p.node),
         |sizes$p AS (SELECT min_lab, count(*) AS sz FROM (
         |  SELECT node, min(lab) AS min_lab FROM reach$p GROUP BY node) GROUP BY min_lab),
         |sum$p AS (SELECT CAST(COALESCE(SUM(sz), 0) AS BIGINT) AS survivors,
         |  CAST(COALESCE(MAX(sz), 0) AS BIGINT) AS giant,
         |  CAST(count(*) AS BIGINT) AS comps FROM sizes$p)""".stripMargin
    }
    val rows = pcts.map { p =>
      s"""SELECT CAST($p AS BIGINT) AS pct,
         |  CAST((SELECT count(*) FROM rm$p) AS BIGINT) AS removed,
         |  sum$p.giant AS giant, sum$p.comps AS comps,
         |  CAST(nn.n - (SELECT count(*) FROM rm$p) - sum$p.survivors AS BIGINT) AS singletons
         |FROM sum$p, nn""".stripMargin
    }
    s"""WITH RECURSIVE canon AS MATERIALIZED (SELECT src, dst FROM ($edgesArithSql)),
       |vv AS (SELECT DISTINCT v FROM (SELECT src AS v FROM canon UNION ALL SELECT dst FROM canon)),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vv),
       |degt AS MATERIALIZED (SELECT v, count(*) AS deg FROM
       |  (SELECT src AS v FROM canon UNION ALL SELECT dst AS v FROM canon) GROUP BY v),
       |ranked AS MATERIALIZED (SELECT v, row_number() OVER (ORDER BY deg DESC, v) AS rk FROM degt),
       |${blocks.mkString(",\n")}
       |${rows.mkString("\nUNION ALL\n")}
       |ORDER BY pct""".stripMargin
  }

  /** 2-hop ego ball around vertex 0 by two unrolled frontier hops, then the
    * induced canonical edges.
    */
  private def egonetSql: String =
    s"""WITH $arithCanonCte,
       |und AS (SELECT src AS a, dst AS b FROM canon UNION ALL SELECT dst, src FROM canon),
       |b0 AS (SELECT CAST(0 AS BIGINT) AS id),
       |b1 AS (SELECT DISTINCT id FROM (SELECT id FROM b0
       |  UNION ALL SELECT und.b FROM und JOIN b0 ON b0.id = und.a)),
       |b2 AS (SELECT DISTINCT id FROM (SELECT id FROM b1
       |  UNION ALL SELECT und.b FROM und JOIN b1 ON b1.id = und.a))
       |SELECT canon.src, canon.dst FROM canon
       |JOIN b2 x ON x.id = canon.src JOIN b2 y ON y.id = canon.dst""".stripMargin

  /** DOULION sampled triangle estimate — the identical nonlinear coin
    * (product of per-endpoint affine maps mod 1000003) selects the sample,
    * then a brute ordered 3-join counts it.
    */
  private def tricountEstSql(invP: Long): String =
    s"""WITH canon AS MATERIALIZED (SELECT src, dst FROM ($edgesSupSql)
       |  WHERE ((((src % 1000003) * 48271 + 11) % 1000003)
       |       * (((dst % 1000003) * 7919 + 7) % 1000003)) % 1000003 % $invP = 0),
       |m AS (SELECT count(*) AS m FROM canon),
       |t AS (SELECT count(*) AS t FROM canon e1
       |  JOIN canon e2 ON e2.src = e1.dst
       |  JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst)
       |SELECT CAST(m.m AS BIGINT) AS sampled_edges, CAST(t.t AS BIGINT) AS sampled_triangles,
       |  CAST(${invP * invP * invP} AS BIGINT) AS scale,
       |  CAST(t.t * ${invP * invP * invP} AS BIGINT) AS estimate
       |FROM m, t""".stripMargin

  /** Per-vertex K4 participation by brute ordered enumeration a<b<c<d over
    * the canonical edge list (6 existence joins) — viable at oracle scale;
    * the engine extends its triangle table instead.
    */
  private def fourCliquesSql: String =
    s"""WITH canon AS MATERIALIZED (SELECT src, dst FROM ($edgesArithSql)
       |  UNION ALL SELECT src, dst FROM ($plantedCliqueSql)),
       |k4 AS MATERIALIZED (
       |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c, e4.dst AS d
       |  FROM canon e1
       |  JOIN canon e2 ON e2.src = e1.src AND e2.dst > e1.dst
       |  JOIN canon e3 ON e3.src = e1.dst AND e3.dst = e2.dst
       |  JOIN canon e4 ON e4.src = e2.dst
       |  JOIN canon e5 ON e5.src = e1.src AND e5.dst = e4.dst
       |  JOIN canon e6 ON e6.src = e1.dst AND e6.dst = e4.dst)
       |SELECT id, CAST(count(*) AS BIGINT) AS cliques4 FROM (
       |  SELECT a AS id FROM k4 UNION ALL SELECT b FROM k4
       |  UNION ALL SELECT c FROM k4 UNION ALL SELECT d FROM k4)
       |GROUP BY id""".stripMargin

  /** 1-WL color refinement, unrolled k exact rounds — the identical
    * arithmetic the engine runs: per-neighbor g(c) = (A·c²+B·c+C) mod P in
    * BIGINT (every intermediate < 2^62), multiset-summed in DECIMAL(38,0),
    * then c' = (D·c + Σg) mod P.
    */
  private def wlRefineSql(rounds: Int): String = {
    import graft.algos.WLRefinement.{P}
    val A = 1566083941L % P; val B = 1103515245L % P
    val C = 12345L; val D = 69069L
    val prelude =
      s"""WITH $arithCanonCte,
         |und AS (SELECT src AS a, dst AS b FROM canon UNION ALL SELECT dst, src FROM canon),
         |verts AS (SELECT DISTINCT a AS id FROM und),
         |c0 AS MATERIALIZED (SELECT id, CAST(1 AS BIGINT) AS c FROM verts)""".stripMargin
    val rs = (1 to rounds).map { i =>
      val j = i - 1
      s"""g$i AS (SELECT und.b AS id,
         |    sum(CAST(($A*c.c % $P * c.c % $P + $B*c.c % $P + $C) % $P AS DECIMAL(38,0))) AS sg
         |  FROM und JOIN c$j c ON c.id = und.a GROUP BY und.b),
         |c$i AS MATERIALIZED (SELECT c$j.id,
         |    CAST((CAST($D*c$j.c % $P AS DECIMAL(38,0)) + COALESCE(g$i.sg, 0)) % $P AS BIGINT) AS c
         |  FROM c$j LEFT JOIN g$i ON g$i.id = c$j.id)""".stripMargin
    }.mkString(",\n")
    s"$prelude,\n$rs\nSELECT id, c AS color FROM c$rounds"
  }

  private def modularitySql: String =
    s"""WITH canon AS MATERIALIZED (SELECT src, dst FROM ($edgesArithSql)),
       |tagged AS (SELECT src % 5 AS la, dst % 5 AS lb FROM canon),
       |und AS (SELECT la AS l FROM tagged UNION ALL SELECT lb FROM tagged),
       |perc AS (SELECT l, count(*) AS dc FROM und GROUP BY l),
       |agg AS (SELECT count(*) AS communities, sum(dc * dc) AS sum_dc2 FROM perc),
       |intra AS (SELECT count(*) AS m,
       |          sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS intra_edges FROM tagged)
       |SELECT CAST(m AS BIGINT) AS m, CAST(communities AS BIGINT) AS communities,
       |  CAST(intra_edges AS BIGINT) AS intra_edges,
       |  round(CAST(intra_edges AS DOUBLE)/m
       |    - CAST(sum_dc2 AS DOUBLE)/(4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)), 8) AS modularity
       |FROM intra, agg""".stripMargin

  private def assortativitySql: String =
    s"""WITH canon AS MATERIALIZED (SELECT src, dst FROM ($edgesArithSql)),
       |und AS (SELECT src AS a, dst AS b FROM canon UNION ALL SELECT dst, src FROM canon),
       |deg AS MATERIALIZED (SELECT a AS vid, count(*) AS deg FROM und GROUP BY a),
       |pairs AS (SELECT da.deg AS x, db.deg AS y FROM und
       |          JOIN deg da ON da.vid = und.a JOIN deg db ON db.vid = und.b),
       |s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
       |      sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy FROM pairs)
       |SELECT CAST(n AS BIGINT) AS pairs,
       |  round((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) /
       |    sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) *
       |         (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 8)
       |    AS assortativity
       |FROM s""".stripMargin

  /** Jones-Plassmann coloring, unrolled: round i selects the uncolored
    * vertices whose LCG priority beats every uncolored neighbor and assigns
    * each the mex of its colored neighborhood. `rounds` only needs to be ≥
    * the convergence round — later rounds see an empty uncolored set and
    * add nothing, so over-provisioning is harmless (the engine runs the
    * same schedule to convergence).
    */
  private def coloringUnrolledSql(rounds: Int): String = {
    val prelude =
      s"""WITH $arithCanonCte,
         |und AS MATERIALIZED (SELECT src AS a, dst AS b FROM canon UNION ALL SELECT dst, src FROM canon),
         |pr AS MATERIALIZED (SELECT DISTINCT a AS id, (a*48271 + 11213) % 1000000007 AS p FROM und),
         |ser AS MATERIALIZED (SELECT CAST(x AS BIGINT) AS c FROM generate_series(0, 40) t(x)),
         |u0 AS (SELECT id FROM pr),
         |acc0 AS (SELECT id, CAST(0 AS BIGINT) AS color FROM pr WHERE 1=0)""".stripMargin
    val rs = (1 to rounds).map { i =>
      val j = i - 1
      s"""nm$i AS (SELECT und.a AS id, MAX(pr.p) AS mp FROM und
         |  JOIN u$j uu ON uu.id = und.b JOIN pr ON pr.id = und.b GROUP BY und.a),
         |sel$i AS MATERIALIZED (SELECT uu.id FROM u$j uu JOIN pr ON pr.id = uu.id
         |  LEFT JOIN nm$i ON nm$i.id = uu.id WHERE pr.p > COALESCE(nm$i.mp, -1)),
         |used$i AS (SELECT s.id, c.color FROM sel$i s
         |  JOIN und ON und.a = s.id JOIN acc$j c ON c.id = und.b),
         |newc$i AS (SELECT av.id, MIN(av.c) AS color FROM (
         |    SELECT s.id, ser.c FROM sel$i s CROSS JOIN ser
         |    ANTI JOIN used$i ux ON ux.id = s.id AND ux.color = ser.c) av
         |  GROUP BY av.id),
         |acc$i AS MATERIALIZED (SELECT * FROM acc$j UNION ALL SELECT id, color FROM newc$i),
         |u$i AS MATERIALIZED (SELECT uu.id FROM u$j uu ANTI JOIN sel$i s ON s.id = uu.id)""".stripMargin
    }.mkString(",\n")
    s"$prelude,\n$rs\nSELECT id, color FROM acc$rounds"
  }

  /** Luby maximal matching, unrolled: round i keeps the candidate edges
    * whose packed priority is the max at BOTH endpoints, adds them to the
    * matching, and drops every edge touching a matched vertex. Same
    * over-provisioning contract as the coloring oracle.
    */
  private def matchingUnrolledSql(rounds: Int): String = {
    val prelude =
      s"""WITH $arithCanonCte,
         |c0 AS MATERIALIZED (SELECT a, b,
         |    ((((a*2000003 + b)*48271) % 1000000007) % 1048576) * 4398046511104
         |      + a * 2097152 + b AS q
         |  FROM (SELECT src AS a, dst AS b FROM canon)),
         |m0 AS (SELECT a, b FROM c0 WHERE 1=0)""".stripMargin
    val rs = (1 to rounds).map { i =>
      val j = i - 1
      s"""vmax$i AS (SELECT v, MAX(q) AS vq FROM (
         |    SELECT a AS v, q FROM c$j UNION ALL SELECT b, q FROM c$j) GROUP BY v),
         |sel$i AS MATERIALIZED (SELECT c.a, c.b FROM c$j c
         |  JOIN vmax$i va ON va.v = c.a JOIN vmax$i vb ON vb.v = c.b
         |  WHERE c.q = va.vq AND c.q = vb.vq),
         |m$i AS MATERIALIZED (SELECT * FROM m$j UNION ALL SELECT * FROM sel$i),
         |mv$i AS (SELECT DISTINCT v FROM (SELECT a AS v FROM m$i UNION ALL SELECT b FROM m$i)),
         |c$i AS MATERIALIZED (SELECT c.a, c.b, c.q FROM c$j c
         |  ANTI JOIN mv$i x ON x.v = c.a ANTI JOIN mv$i y ON y.v = c.b)""".stripMargin
    }.mkString(",\n")
    s"$prelude,\n$rs\nSELECT a AS src, b AS dst FROM m$rounds"
  }

  /** Borůvka MSF, unrolled: round i relabels edges by component, takes each
    * component's min crossing edge under the strict (w,a,b,oc) order
    * (row_number mirror of the engine's min(struct)), hooks every component
    * to its chosen neighbor (mutual pairs root at the smaller id), resolves
    * roots by `hops` path-doubling compositions (covers depth 2^hops), and
    * coarsens the labels. Extra rounds past convergence are no-ops, so the
    * unroll only has to over-provision (components at least halve per round
    * ⇒ rounds ≥ log2(n), hops ≥ log2(n)).
    */
  private def boruvkaUnrolledSql(rounds: Int, hops: Int): String = {
    val prelude =
      s"""WITH $arithCanonCte,
         |ew AS MATERIALIZED (SELECT src AS a, dst AS b,
         |  CAST((src*7 + dst*13) % 97 + 1 AS DOUBLE) AS w FROM canon),
         |verts AS MATERIALIZED (SELECT DISTINCT a AS id FROM
         |  (SELECT a FROM ew UNION ALL SELECT b FROM ew)),
         |comp0 AS MATERIALIZED (SELECT id, id AS comp FROM verts),
         |f0 AS (SELECT a, b, w FROM ew WHERE 1=0)""".stripMargin
    val rs = (1 to rounds).map { i =>
      val j = i - 1
      val jumps = (1 to hops).map { k =>
        s"""p${i}_$k AS MATERIALIZED (SELECT x.c, COALESCE(y.p, x.p) AS p
           |  FROM p${i}_${k - 1} x LEFT JOIN p${i}_${k - 1} y ON y.c = x.p)""".stripMargin
      }.mkString(",\n")
      s"""ce$i AS MATERIALIZED (SELECT ew.a, ew.b, ew.w, ca.comp AS ca, cb.comp AS cb
         |  FROM ew JOIN comp$j ca ON ca.id = ew.a JOIN comp$j cb ON cb.id = ew.b
         |  WHERE ca.comp <> cb.comp),
         |ch$i AS MATERIALIZED (SELECT c, oc, w, a, b FROM (
         |    SELECT c, oc, w, a, b,
         |      ROW_NUMBER() OVER (PARTITION BY c ORDER BY w, a, b, oc) AS rn
         |    FROM (SELECT ca AS c, cb AS oc, w, a, b FROM ce$i
         |          UNION ALL SELECT cb, ca, w, a, b FROM ce$i))
         |  WHERE rn = 1),
         |f$i AS MATERIALIZED (SELECT * FROM f$j UNION SELECT a, b, w FROM ch$i),
         |p${i}_0 AS MATERIALIZED (SELECT h.c,
         |    CASE WHEN h2.oc = h.c THEN LEAST(h.c, h.oc) ELSE h.oc END AS p
         |  FROM ch$i h LEFT JOIN ch$i h2 ON h2.c = h.oc),
         |$jumps,
         |comp$i AS MATERIALIZED (SELECT cm.id, COALESCE(pp.p, cm.comp) AS comp
         |  FROM comp$j cm LEFT JOIN p${i}_$hops pp ON pp.c = cm.comp)""".stripMargin
    }.mkString(",\n")
    s"$prelude,\n$rs\nSELECT a AS src, b AS dst, w FROM f$rounds"
  }

  private def katzUnrolledSql(k: Int): String = {
    val prelude =
      s"""WITH $arithCanonCte,
         |und AS MATERIALIZED (SELECT src AS a, dst AS b FROM canon UNION ALL SELECT dst, src FROM canon),
         |verts AS MATERIALIZED (SELECT DISTINCT a AS id FROM und),
         |x0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS x FROM verts)""".stripMargin
    val rs = (1 to k).map { i =>
      val j = i - 1
      s"""x$i AS MATERIALIZED (SELECT v.id, 1.0 + 0.0625 * COALESCE(s.s, 0) AS x
         |  FROM verts v LEFT JOIN (
         |    SELECT und.b AS id, sum(xp.x) AS s FROM und
         |    JOIN x$j xp ON xp.id = und.a GROUP BY und.b) s ON s.id = v.id)""".stripMargin
    }.mkString(",\n")
    s"$prelude,\n$rs\nSELECT id, round(x, 8) AS katz FROM x$k"
  }

  /** Mirrors [[Fiedler.runFixed]]: k deflated power steps on σI − L
    * (σ = 2·maxdeg), center + L1-normalize each step, sign fixed at the
    * minimum id. x0 = vertex id (centered/normalized).
    */
  private def fiedlerUnrolledSql(k: Int): String = {
    val prelude =
      s"""WITH $arithCanonCte,
         |und AS MATERIALIZED (SELECT src AS a, dst AS b FROM canon UNION ALL SELECT dst, src FROM canon),
         |deg AS MATERIALIZED (SELECT a AS id, CAST(count(*) AS DOUBLE) AS d FROM und GROUP BY a),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
         |sig AS (SELECT 2.0 * max(d) AS s FROM deg),
         |y0 AS (SELECT id, CAST(id AS DOUBLE) AS y FROM deg)""".stripMargin
    val steps = (0 to k).map { i =>
      val norm =
        s"""m$i AS (SELECT (SELECT sum(y) FROM y$i) / (SELECT n FROM nn) AS m),
           |l$i AS (SELECT sum(abs(y - (SELECT m FROM m$i))) AS l FROM y$i),
           |x$i AS MATERIALIZED (SELECT id, (y - (SELECT m FROM m$i)) / (SELECT l FROM l$i) AS x FROM y$i)""".stripMargin
      if (i == 0) norm
      else {
        val j = i - 1
        s"""y$i AS MATERIALIZED (
           |  SELECT deg.id, ((SELECT s FROM sig) - deg.d) * xp.x + COALESCE(g.s, 0) AS y
           |  FROM deg JOIN x$j xp ON xp.id = deg.id
           |  LEFT JOIN (SELECT und.b AS id, sum(xq.x) AS s FROM und
           |    JOIN x$j xq ON xq.id = und.a GROUP BY und.b) g ON g.id = deg.id),
           |$norm""".stripMargin
      }
    }.mkString(",\n")
    s"""$prelude,
       |$steps,
       |sgn AS (SELECT CASE WHEN (SELECT x FROM x$k ORDER BY id LIMIT 1) >= 0
       |        THEN 1.0 ELSE -1.0 END AS g)
       |SELECT id, round(x * (SELECT g FROM sgn), 6) AS f FROM x$k""".stripMargin
  }

  /** Mirrors [[DensestSubgraph.peel]]: R rounds of the exact-integer peel
    * (drop v when deg·n ≤ 3·m), emitting each non-empty round's stats.
    */
  private def densestUnrolledSql(rounds: Int): String = {
    val prelude = s"WITH $arithCanonCte,\ne0 AS MATERIALIZED (SELECT src, dst FROM canon)"
    val steps = (0 until rounds).map { i =>
      s"""b$i AS (SELECT src AS v FROM e$i UNION ALL SELECT dst FROM e$i),
         |deg$i AS MATERIALIZED (SELECT v, count(*) AS d FROM b$i GROUP BY v),
         |s$i AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(COALESCE(sum(d), 0) // 2 AS BIGINT) AS m FROM deg$i),
         |keep$i AS (SELECT v FROM deg$i, s$i WHERE d * n > 3 * m),
         |e${i + 1} AS MATERIALIZED (SELECT src, dst FROM e$i
         |  WHERE src IN (SELECT v FROM keep$i) AND dst IN (SELECT v FROM keep$i))""".stripMargin
    }.mkString(",\n")
    val rows = (0 until rounds).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS round, n, m,
         |  round(CAST(m AS DOUBLE) / n, 6) AS density FROM s$i WHERE n > 0""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"$prelude,\n$steps\n$rows"
  }

  /** Mirrors [[HittingTime.runFixed]]: k DP steps of
    * h ← 0 on seeds, else 1 + (Σ neighbor h)/deg.
    */
  private def hittingUnrolledSql(k: Int, seeds: Seq[Long]): String = {
    val seedList = seeds.mkString(", ")
    val prelude =
      s"""WITH $arithCanonCte,
         |und AS MATERIALIZED (SELECT src AS a, dst AS b FROM canon UNION ALL SELECT dst, src FROM canon),
         |deg AS MATERIALIZED (SELECT a AS id, CAST(count(*) AS DOUBLE) AS d FROM und GROUP BY a),
         |h0 AS (SELECT id, 0.0 AS h FROM deg)""".stripMargin
    val steps = (1 to k).map { i =>
      val j = i - 1
      s"""h$i AS MATERIALIZED (
         |  SELECT deg.id, CASE WHEN deg.id IN ($seedList) THEN 0.0
         |    ELSE 1.0 + COALESCE(g.s, 0) / deg.d END AS h
         |  FROM deg LEFT JOIN (SELECT und.b AS id, sum(hp.h) AS s FROM und
         |    JOIN h$j hp ON hp.id = und.a GROUP BY und.b) g ON g.id = deg.id)""".stripMargin
    }.mkString(",\n")
    s"$prelude,\n$steps\nSELECT id, round(h, 6) AS h FROM h$k"
  }

  private def eigenUnrolledSql(k: Int): String = {
    val prelude =
      s"""WITH $arithCanonCte,
         |und AS MATERIALIZED (SELECT src AS a, dst AS b FROM canon UNION ALL SELECT dst, src FROM canon),
         |verts AS MATERIALIZED (SELECT DISTINCT a AS id FROM und),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
         |x0 AS (SELECT id, 1.0 / nn.n AS x FROM verts, nn)""".stripMargin
    val rs = (1 to k).map { i =>
      val j = i - 1
      s"""s$i AS MATERIALIZED (SELECT v.id, COALESCE(g.s, 0) AS s FROM verts v
         |  LEFT JOIN (SELECT und.b AS id, sum(xp.x) AS s FROM und
         |    JOIN x$j xp ON xp.id = und.a GROUP BY und.b) g ON g.id = v.id),
         |l$i AS (SELECT sum(s) AS l1 FROM s$i),
         |x$i AS MATERIALIZED (SELECT id, s / l$i.l1 AS x FROM s$i, l$i)""".stripMargin
    }.mkString(",\n")
    s"$prelude,\n$rs\nSELECT id, round(x, 8) AS eig FROM x$k"
  }

  // co-citation (common=src: pairs of dst cited by one src) and
  // bibliographic coupling (common=dst: pairs of src citing one dst)
  private def cocitationSql(common: String, paired: String): String =
    s"""WITH e AS MATERIALIZED (SELECT src, dst FROM ($edgesArithDirSql))
       |SELECT l.$paired AS a, r.$paired AS b, CAST(count(*) AS BIGINT) AS n
       |FROM e l JOIN e r ON l.$common = r.$common AND l.$paired < r.$paired
       |GROUP BY 1, 2""".stripMargin

  private def contractSql: String =
    s"""WITH e AS MATERIALIZED (SELECT src, dst FROM ($edgesArithDirSql))
       |SELECT src % 10 AS gsrc, dst % 10 AS gdst,
       |  CAST(count(*) AS BIGINT) AS weight
       |FROM e WHERE src % 10 <> dst % 10 GROUP BY 1, 2""".stripMargin

  private def degreeHistSql: String =
    s"""WITH e AS MATERIALIZED (SELECT src, dst FROM ($edgesArithDirSql)),
       |outs AS (SELECT deg, CAST(count(*) AS BIGINT) AS vertices FROM (
       |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src) GROUP BY deg),
       |ins AS (SELECT deg, CAST(count(*) AS BIGINT) AS vertices FROM (
       |  SELECT dst, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY dst) GROUP BY deg)
       |SELECT 'out' AS side, deg, vertices FROM outs
       |UNION ALL SELECT 'in', deg, vertices FROM ins""".stripMargin

  private def reciprocitySql: String =
    s"""WITH e AS MATERIALIZED (SELECT src, dst FROM ($edgesArithDirSql)),
       |r AS (SELECT count(*) AS reciprocal FROM e
       |      SEMI JOIN e rv ON rv.src = e.dst AND rv.dst = e.src),
       |mm AS (SELECT count(*) AS m FROM e)
       |SELECT CAST(mm.m AS BIGINT) AS m, CAST(r.reciprocal AS BIGINT) AS reciprocal,
       |  round(CAST(r.reciprocal AS DOUBLE) / mm.m, 8) AS reciprocity
       |FROM mm, r""".stripMargin

  private def edgeJaccardSql: String =
    s"""WITH $arithCanonCte,
       |und AS MATERIALIZED (SELECT src AS a, dst AS b FROM canon UNION ALL SELECT dst, src FROM canon),
       |deg AS MATERIALIZED (SELECT a AS vid, count(*) AS deg FROM und GROUP BY a),
       |com AS (SELECT l.b AS a, r.b AS b, count(*) AS common
       |  FROM und l JOIN und r ON l.a = r.a AND l.b < r.b
       |  SEMI JOIN canon c ON c.src = l.b AND c.dst = r.b
       |  GROUP BY 1, 2)
       |SELECT c.src, c.dst, CAST(COALESCE(com.common, 0) AS BIGINT) AS common,
       |  round(CAST(COALESCE(com.common, 0) AS DOUBLE)
       |    / (da.deg + db.deg - COALESCE(com.common, 0)), 8) AS jaccard
       |FROM canon c LEFT JOIN com ON com.a = c.src AND com.b = c.dst
       |JOIN deg da ON da.vid = c.src JOIN deg db ON db.vid = c.dst""".stripMargin

  /** Multi-source BFS oracle: min hop count per (seed, reachable vertex) by
    * bounded-depth recursive walk enumeration (the 300 cap ≫ any test-SF
    * diameter; UNION dedups (s,v,d) triples so the recursion terminates).
    */
  /** Mirrors [[graft.pipeline.Similarity.pcaTopComponent]] bit for bit —
    * see that scaladoc for the exactness argument. Every float fold is
    * `list_reduce(list_prepend(0.0, list(… ORDER BY dim)), +)`, the SQL
    * spelling of the engine's ascending-dim foldLeft.
    */
  private def pcaUnrolledSql(iters: Int): String = {
    def fold(expr: String, order: String) =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list($expr ORDER BY $order)), (a, x) -> a + x)"
    val rounds = (1 to iters).map { i =>
      s"""w$i AS (SELECT c.p, ${fold(s"c.c * v${i - 1}.v", "c.q")} AS w
         |        FROM c JOIN v${i - 1} ON v${i - 1}.p = c.q GROUP BY c.p),
         |l$i AS (SELECT ${fold("abs(w)", "p")} AS l FROM w$i),
         |v$i AS (SELECT p, w / (SELECT l FROM l$i) AS v FROM w$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |pe AS MATERIALIZED (SELECT vec_id, CAST(i - 1 AS BIGINT) AS p,
       |        CAST(round(e[i] * 10000.0) AS BIGINT) AS x
       |      FROM e, UNNEST(range(1, len(e) + 1)) AS u(i)),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
       |s AS MATERIALIZED (SELECT p, sum(x) AS s FROM pe GROUP BY p),
       |g AS (SELECT a.p AS p, b.p AS q, sum(a.x * b.x) AS g
       |      FROM pe a JOIN pe b ON a.vec_id = b.vec_id GROUP BY 1, 2),
       |c AS MATERIALIZED (SELECT g.p, g.q, CAST(nn.n * g.g - sa.s * sb.s AS DOUBLE) AS c
       |     FROM g JOIN s sa ON sa.p = g.p JOIN s sb ON sb.p = g.q, nn),
       |v0 AS (SELECT p, 1.0 AS v FROM s),
       |$rounds,
       |sg AS (SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS sg FROM v$iters
       |       ORDER BY abs(v) DESC, p ASC LIMIT 1),
       |vf AS (SELECT p, v * (SELECT sg FROM sg) AS v FROM v$iters),
       |md AS (SELECT ${fold("CAST(s.s AS DOUBLE) * vf.v", "s.p")}
       |         / (SELECT CAST(n AS DOUBLE) FROM nn) AS m
       |       FROM s JOIN vf ON vf.p = s.p),
       |rd AS (SELECT pe.vec_id, ${fold("CAST(pe.x AS DOUBLE) * vf.v", "pe.p")} AS r
       |       FROM pe JOIN vf ON vf.p = pe.p GROUP BY pe.vec_id)
       |SELECT vec_id, round((r - (SELECT m FROM md)) / 10000.0, 6) AS pc1 FROM rd""".stripMargin
  }

  /** Mirrors [[graft.algos.BellmanFord.runFixed]]: k unrolled synchronous
    * min-plus rounds over the signed-weight arith graph (each round merges
    * the previous table with every one-edge relaxation via UNION ALL + min —
    * the same integer min the engine's outer-join/least computes).
    */
  private def bellmanUnrolledSql(k: Int): String = {
    val rounds = (1 to k).map { i =>
      s"""d$i AS MATERIALIZED (SELECT id, min(dist) AS dist FROM (
         |  SELECT id, dist FROM d${i - 1}
         |  UNION ALL
         |  SELECT e.dst, d${i - 1}.dist + e.w FROM d${i - 1} JOIN e ON e.src = d${i - 1}.id)
         |GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT src, dst,
       |  (3*src + 5*dst) % 7 + (13*src) % 17 - (13*dst) % 17 AS w
       |  FROM ($edgesArithDirSql)),
       |d0 AS (SELECT CAST(1 AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist),
       |$rounds
       |SELECT id, dist FROM d$k""".stripMargin
  }

  /** Mirrors [[TriadCensus.run]] by BRUTE FORCE: every C(n,3) triple of the
    * fixture classified through the SAME 64-entry code table the engine
    * uses — maximally independent of the engine's wedge+corrections scheme.
    */
  private def triadCensusSql: String = {
    val tbl = TriadCensus.ClassOf.map(c => s"'$c'").mkString("[", ",", "]")
    val classes = TriadCensus.Classes.map(c => s"('$c')").mkString(", ")
    s"""WITH e AS MATERIALIZED (SELECT src, dst FROM ($edgesArithDirSql)),
       |verts AS MATERIALIZED (SELECT DISTINCT v FROM
       |  (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
       |dy AS MATERIALIZED (
       |  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
       |    max(CASE WHEN src < dst THEN 1 ELSE 0 END) AS ab,
       |    max(CASE WHEN src > dst THEN 1 ELSE 0 END) AS ba
       |  FROM e GROUP BY 1, 2),
       |tri AS (
       |  SELECT COALESCE(xy.ab,0) + 2*COALESCE(xy.ba,0) + 4*COALESCE(xz.ab,0)
       |       + 8*COALESCE(xz.ba,0) + 16*COALESCE(yz.ab,0) + 32*COALESCE(yz.ba,0) AS code
       |  FROM verts x JOIN verts y ON x.v < y.v JOIN verts z ON y.v < z.v
       |  LEFT JOIN dy xy ON xy.a = x.v AND xy.b = y.v
       |  LEFT JOIN dy xz ON xz.a = x.v AND xz.b = z.v
       |  LEFT JOIN dy yz ON yz.a = y.v AND yz.b = z.v),
       |cnts AS (SELECT ($tbl)[code + 1] AS clazz, count(*) AS cnt FROM tri GROUP BY 1)
       |SELECT c.clazz, CAST(COALESCE(cnts.cnt, 0) AS BIGINT) AS cnt
       |FROM (VALUES $classes) AS c(clazz) LEFT JOIN cnts ON cnts.clazz = c.clazz""".stripMargin
  }

  private def msbfsSql: String =
    s"""WITH RECURSIVE e AS MATERIALIZED (SELECT src, dst FROM ($edgesArithDirSql)),
       |seeds(s) AS (SELECT CAST(x AS BIGINT) FROM (VALUES (1), (3), (7)) t(x)),
       |r AS (
       |  SELECT s, s AS v, 0 AS d FROM seeds
       |  UNION
       |  SELECT r.s, e.dst, r.d + 1 FROM r JOIN e ON e.src = r.v WHERE r.d < 300
       |)
       |SELECT v AS id, s AS src, CAST(MIN(d) AS BIGINT) AS dist
       |FROM r GROUP BY v, s""".stripMargin

  private def centralitySql: String =
    s"""WITH RECURSIVE $arithCanonCte,
       |und AS MATERIALIZED (SELECT src AS a, dst AS b FROM canon UNION ALL SELECT dst, src FROM canon),
       |verts AS (SELECT DISTINCT a AS id FROM und),
       |r AS (
       |  SELECT id AS s, id AS v, 0 AS d FROM verts
       |  UNION
       |  SELECT r.s, und.b, r.d + 1 FROM r JOIN und ON und.a = r.v WHERE r.d < 300
       |),
       |md AS (SELECT s, v, MIN(d) AS d FROM r GROUP BY s, v)
       |SELECT v AS id,
       |  CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS reached,
       |  CAST(sum(d) AS BIGINT) AS sum_dist,
       |  round(sum(CASE WHEN d > 0 THEN 1.0/d ELSE 0 END), 8) AS harmonic,
       |  round(CASE WHEN sum(d) > 0
       |    THEN CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS DOUBLE) / sum(d)
       |    ELSE 0 END, 8) AS closeness,
       |  CAST(MAX(d) AS BIGINT) AS ecc
       |FROM md GROUP BY v""".stripMargin

  /** Unrolled replay of Louvain.level1 (k parity-gated synchronous rounds
    * of integer ΔQ moves, mirrors algos/Louvain.movePhase op for op): score
    * = 2m·w_vc − deg(v)·vol'(c) in HUGEINT (the engine's decimal(38,0)),
    * best by (score DESC, community ASC), a vertex moves on STRICT
    * improvement and only in its parity round; final label = min original
    * member id.
    */
  private def louvainL1Sql(rounds: Int): String = {
    val sb = new StringBuilder(
      s"""g AS MATERIALIZED (SELECT src AS a, dst AS b, CAST(1 AS BIGINT) AS w
        |  FROM ($edgesArithSql)),
        |und AS MATERIALIZED (SELECT a AS v, b AS u, w FROM g
        |  UNION ALL SELECT b, a, w FROM g),
        |deg AS MATERIALIZED (SELECT v AS id, CAST(sum(w) AS HUGEINT) AS deg
        |  FROM und GROUP BY 1),
        |m2 AS MATERIALIZED (SELECT sum(deg) AS m2 FROM deg),
        |c0 AS (SELECT id, id AS c FROM deg)""".stripMargin)
    for (r <- 1 to rounds) {
      val p = r - 1
      sb.append(s""",
        |vol$r AS (SELECT c, sum(deg) AS vol FROM c$p JOIN deg USING (id) GROUP BY c),
        |wvc$r AS (SELECT id, c, sum(wc) AS wc FROM (
        |  SELECT e.v AS id, cm.c AS c, CAST(e.w AS HUGEINT) AS wc
        |  FROM und e JOIN c$p cm ON cm.id = e.u
        |  UNION ALL SELECT id, c, CAST(0 AS HUGEINT) FROM c$p) GROUP BY 1, 2),
        |sc$r AS MATERIALIZED (SELECT w.id, w.c, cm.c AS cur,
        |  m2.m2 * w.wc - d.deg * (v.vol -
        |    CASE WHEN w.c = cm.c THEN d.deg ELSE CAST(0 AS HUGEINT) END) AS score
        |  FROM wvc$r w JOIN c$p cm ON cm.id = w.id JOIN deg d ON d.id = w.id
        |  JOIN vol$r v ON v.c = w.c CROSS JOIN m2),
        |c$r AS MATERIALIZED (SELECT b.id,
        |  CASE WHEN b.bsc > s.score AND b.bc <> b.cur AND b.id % 2 = ${r % 2}
        |       THEN b.bc ELSE b.cur END AS c
        |  FROM (SELECT id, cur, c AS bc, score AS bsc FROM (
        |          SELECT id, c, cur, score, row_number() OVER (
        |            PARTITION BY id ORDER BY score DESC, c ASC) AS rn FROM sc$r)
        |        WHERE rn = 1) b
        |  JOIN (SELECT id, score FROM sc$r WHERE c = cur) s ON s.id = b.id)""".stripMargin)
    }
    sb.append(s""",
      |rep AS (SELECT c, min(id) AS community FROM c$rounds GROUP BY c)
      |SELECT f.id, r.community FROM c$rounds f JOIN rep r ON r.c = f.c""".stripMargin)
    s"WITH ${sb.toString}"
  }

  private def graphStatsSql: String =
    s"""WITH $arithCanonCte,
       |und AS (SELECT src AS a, dst AS b FROM canon UNION ALL SELECT dst, src FROM canon),
       |deg AS MATERIALIZED (SELECT a AS vid, count(*) AS deg FROM und GROUP BY a),
       |ds AS (SELECT count(*) AS n, min(deg) AS min_deg, max(deg) AS max_deg,
       |         sum(deg) AS deg_sum,
       |         CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS wedges FROM deg),
       |tri AS (SELECT count(*) AS triangles FROM (
       |  SELECT x.src AS a FROM canon x JOIN canon y ON x.dst = y.src
       |  JOIN canon z ON z.src = x.src AND z.dst = y.dst))
       |SELECT n, CAST(deg_sum // 2 AS BIGINT) AS m, min_deg, max_deg,
       |  round(CAST(deg_sum AS DOUBLE) / n, 8) AS avg_deg,
       |  round(CAST(deg_sum AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)), 8) AS density,
       |  wedges, triangles,
       |  round(CASE WHEN wedges > 0 THEN 3.0 * triangles / wedges ELSE 0.0 END, 8) AS global_cc
       |FROM ds, tri""".stripMargin
}
