package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A sparse matrix as a Spark-native edge table: columns `src: long,
  * dst: long, w: double`. Entry (src,dst,w) = A(src,dst)=w; absent entries are
  * the semiring-add identity (the reference's implicit zero,
  * /root/reference/Test/GB_spec_mxm.m:34-39).
  *
  * This is the COO "tuples" view (GrB_Matrix_extractTuples,
  * GraphBLAS.h:3432); Spark Datasets are naturally hypersparse — only present
  * rows exist. CSR-vs-CSC orientation (GB_matrix.h:430-432) dissolves into
  * *which key the next shuffle hashes on*; a hash partitioning by `src` IS the
  * CSR index (SURVEY.md §1.4).
  *
  * All operations are declarative DataFrame plans — Catalyst prunes columns
  * (= the reference's pattern-only operand elision, GB_AxB_meta.c:536-556) and
  * pushes filters; AQE picks broadcast vs shuffle joins (= the dot/saxpy
  * method auto-select, GB_AxB_meta.c:558-649).
  *
  * DOMAIN CONTRACT: the value domain is FP64 (the reference's 13 numeric
  * types collapse onto `w: double` — SURVEY.md §1.2). Integer semantics are
  * exact for |values| ≤ 2^53 (every count/degree/label here by construction);
  * full 64-bit bit patterns (hashes) must NOT round-trip through `w` — use
  * long-typed columns end-to-end with the graft.core.Ops.bitwise registry.
  */
final case class GBMatrix(df: DataFrame) {
  import GBMatrix._

  def spark: SparkSession = df.sparkSession

  // --- construction-adjacent -------------------------------------------------

  /** nvals: number of stored entries. */
  def nvals: Long = df.count()

  /** GrB_transpose (GraphBLAS.h:7991): free column swap; the real cost is the
    * regrouping shuffle of whatever consumes the result — exactly the
    * reference's "transpose elision" insight (GB_AxB_meta.c:266-447).
    */
  def transpose: GBMatrix =
    GBMatrix(df.select(col("dst").as("src"), col("src").as("dst"), col("w")))

  /** Deduplicate structurally-duplicate entries with the dup monoid
    * (GrB_Matrix_build_*, GraphBLAS.h:2923; 5-step GB_builder.c pipeline
    * collapses to a single shuffle+agg).
    */
  def build(dup: Monoid = Monoid.Plus): GBMatrix =
    GBMatrix(df.groupBy("src", "dst").agg(dup.agg(col("w")).as("w")))

  // --- select / apply family (§2.4) -----------------------------------------

  /** GrB_select TRIL (GraphBLAS.h:1515): keep entries on/below diagonal k. */
  def tril(k: Long = 0): GBMatrix = GBMatrix(df.filter(col("dst") <= col("src") + lit(k)))

  /** GrB_select TRIU (GraphBLAS.h:1516). */
  def triu(k: Long = 0): GBMatrix = GBMatrix(df.filter(col("dst") >= col("src") + lit(k)))

  /** GrB_select OFFDIAG (GraphBLAS.h:1518). */
  def offdiag: GBMatrix = GBMatrix(df.filter(col("src") =!= col("dst")))

  /** Diagonal as a vector: w = diag(A) (GxB_Vector_diag). */
  def diag: DataFrame =
    df.filter(col("src") === col("dst")).select(col("src").as("id"), col("w").as("v"))

  /** GrB_select with an arbitrary predicate over (i, j, a_ij) — the
    * IndexUnaryOp family (GraphBLAS.h:7390-7544) as one Catalyst filter.
    */
  def select(pred: (Column, Column, Column) => Column): GBMatrix =
    GBMatrix(df.filter(pred(col("src"), col("dst"), col("w"))))

  /** GrB_Matrix_apply (GraphBLAS.h:6056): C = f(A) elementwise; f may use the
    * positional columns (apply_IndexOp, GraphBLAS.h:6979).
    */
  def apply(f: (Column, Column, Column) => Column): GBMatrix =
    GBMatrix(df.select(col("src"), col("dst"), f(col("src"), col("dst"), col("w")).as("w")))

  /** GrB.prune: drop explicit zeros. */
  def prune: GBMatrix = GBMatrix(df.filter(col("w") =!= 0.0))

  /** Batched GrB_Matrix_setElement (Source/GB_setElement.c pending-tuple
    * semantics): apply a batch of (src,dst,w) upserts — an update overwrites
    * an existing entry (the implied SECOND accum of setElement), duplicates
    * WITHIN the batch combine via `dup` first (GB_builder assembly). In Spark
    * the per-element C call becomes one batched merge, exactly the
    * union+compact the reference's GB_wait performs (SURVEY.md §3.3).
    */
  def setElements(updates: DataFrame, dup: Monoid = Monoid.Plus): GBMatrix = {
    val u = GBMatrix(updates.select(col("src").cast("long"),
      col("dst").cast("long"), col("w").cast("double"))).build(dup)
      .df.withColumnRenamed("w", "wu")
    GBMatrix(df.join(u, Seq("src", "dst"), "full_outer")
      .select(col("src"), col("dst"), coalesce(col("wu"), col("w")).as("w")))
  }

  /** Batched GrB_Matrix_removeElement (zombie deletion): drop the entries
    * whose (src,dst) appear in `keys` — one anti join, the bulk form of the
    * reference's zombie sweep (GB_matrix.h:362-390).
    */
  def removeElements(keys: DataFrame): GBMatrix =
    GBMatrix(df.join(keys.select("src", "dst"), Seq("src", "dst"), "left_anti"))

  /** Structure only: all weights become 1.0 (spones / iso pattern). */
  def pattern: GBMatrix = GBMatrix(df.select(col("src"), col("dst"), lit(1.0).as("w")))

  /** GrB_Matrix_extract C = A(I,J) for contiguous ranges (GxB_RANGE,
    * GraphBLAS.h:4991) — a pure pushed-down filter; general index lists are a
    * semi-join against the index set.
    */
  def extractRange(i0: Long, i1: Long, j0: Long, j1: Long): GBMatrix =
    GBMatrix(df.filter(col("src").between(i0, i1) && col("dst").between(j0, j1)))

  /** GrB_Matrix_extract with STRIDED ranges (GxB_STRIDE / GxB_BACKWARDS,
    * GraphBLAS.h:4991, Source/GB_subref.c): I = i0 : iInc : i1, so
    * C(k,l) = A(i0 + k*iInc, j0 + l*jInc). A negative increment is
    * GxB_BACKWARDS — the range descends from i0 down to i1 (i0 >= i1) and
    * k still counts list position, i.e. k = (i0 - src)/|inc|. Like
    * extractRange this is a pure pushed-down filter (range + modulo) plus
    * exact integer reindex arithmetic — no join, no shuffle.
    */
  def extractStride(i0: Long, i1: Long, iInc: Long,
                    j0: Long, j1: Long, jInc: Long): GBMatrix = {
    require(iInc != 0 && jInc != 0, "stride increment must be nonzero")
    // integral DIV (not fp /): exact reindex for indices beyond 2^53
    def dim(name: String, b0: Long, b1: Long, inc: Long): (Column, Column) =
      if (inc > 0)
        (col(name).between(b0, b1) && (col(name) - b0) % inc === 0,
          expr(s"($name - ${b0}L) DIV ${inc}L"))
      else
        (col(name).between(b1, b0) && (lit(b0) - col(name)) % (-inc) === 0,
          expr(s"(${b0}L - $name) DIV ${-inc}L"))
    val (fi, ki) = dim("src", i0, i1, iInc)
    val (fj, kj) = dim("dst", j0, j1, jInc)
    GBMatrix(df.filter(fi && fj).select(ki.as("src"), kj.as("dst"), col("w")))
  }

  /** resize keeping entries inside the new bounds (GraphBLAS.h:9010). */
  def resize(m: Long, n: Long): GBMatrix =
    GBMatrix(df.filter(col("src") < m && col("dst") < n))

  /** GrB_Col_extract w = A(:,j) (GraphBLAS.h:5004): one pushed-down filter. */
  def extractCol(j: Long): DataFrame =
    df.filter(col("dst") === j).select(col("src").as("id"), col("w").as("v"))

  /** Row twin: w' = A(i,:). */
  def extractRow(i: Long): DataFrame =
    df.filter(col("src") === i).select(col("dst").as("id"), col("w").as("v"))

  /** GrB.save (@GrB/save.m analogue): the serialize/deserialize surface is
    * a compressed columnar parquet write (GxB_Matrix_serialize's
    * LZ4/ZSTD blob, GraphBLAS.h:10827, maps to parquet's codec).
    */
  def save(path: String): Unit = df.write.mode("overwrite").parquet(path)

  /** GrB_Matrix_extract with EXPLICIT index lists (GraphBLAS.h:4991,
    * Source/GB_subref.c): C(k,l) = A(I(k), J(l)). Index lists arrive as
    * (id, pos) DataFrames — at scale an index list can itself be data-sized,
    * so the reindex is a join (broadcast when small, per AQE), never a
    * driver-side array. Duplicate indices duplicate rows/cols, matching the
    * reference.
    */
  def extractIndex(iList: DataFrame, jList: DataFrame): GBMatrix =
    GBMatrix(df
      .join(iList.select(col("id").as("src"), col("pos").as("si")), Seq("src"))
      .join(jList.select(col("id").as("dst"), col("pos").as("dj")), Seq("dst"))
      .select(col("si").as("src"), col("dj").as("dst"), col("w")))

  /** extractIndex convenience for literal index lists (position = list order,
    * exactly GrB's I[k] convention).
    */
  def extractIndex(i: Seq[Long], j: Seq[Long]): GBMatrix = {
    val sp = spark
    import sp.implicits._
    extractIndex(
      i.zipWithIndex.map { case (v, p) => (v, p.toLong) }.toDF("id", "pos"),
      j.zipWithIndex.map { case (v, p) => (v, p.toLong) }.toDF("id", "pos"))
  }

  // --- element-wise set ops (§2.3): joins on the index key -------------------

  /** GrB_eWiseMult (GraphBLAS.h:4736): op on the pattern INTERSECTION = inner
    * join on (src,dst).
    */
  def eWiseMult(other: GBMatrix, op: BinOp): GBMatrix = {
    val b = other.df.withColumnRenamed("w", "wb")
    GBMatrix(df.join(b, Seq("src", "dst"), "inner")
      .select(col("src"), col("dst"), op(col("w"), col("wb")).as("w")))
  }

  /** GrB_eWiseAdd (GraphBLAS.h:4837): op on the UNION; a side absent passes
    * the other through = full-outer join + coalesce.
    */
  def eWiseAdd(other: GBMatrix, op: BinOp): GBMatrix = {
    val b = other.df.withColumnRenamed("w", "wb")
    GBMatrix(df.join(b, Seq("src", "dst"), "full_outer")
      .select(col("src"), col("dst"),
        coalesce(op(col("w"), col("wb")), col("w"), col("wb")).as("w")))
  }

  /** GxB_eWiseUnion (GraphBLAS.h:4912): like eWiseAdd but a missing side is
    * replaced by the given scalar before op.
    */
  def eWiseUnion(other: GBMatrix, op: BinOp, alpha: Double, beta: Double): GBMatrix = {
    val b = other.df.withColumnRenamed("w", "wb")
    GBMatrix(df.join(b, Seq("src", "dst"), "full_outer")
      .select(col("src"), col("dst"),
        op(coalesce(col("w"), lit(alpha)), coalesce(col("wb"), lit(beta))).as("w")))
  }

  // --- masks (§2.8) ----------------------------------------------------------

  /** C<M> restriction: keep only entries where the mask has an entry
    * (structural) or a nonzero value. Complement = anti join. The semi/anti
    * join IS the reference's dot3 mask pushdown (GB_AxB_dot3.c): Omega(nnz(M))
    * work, not O(m*n).
    */
  def maskBy(m: GBMatrix, complement: Boolean = false, structural: Boolean = true): GBMatrix = {
    val mk = if (structural) m.df else m.df.filter(col("w") =!= 0.0)
    val how = if (complement) "left_anti" else "left_semi"
    GBMatrix(df.join(mk.select("src", "dst"), Seq("src", "dst"), how))
  }

  // --- reductions (§2.6) ------------------------------------------------------

  /** GrB_Matrix_reduce to vector over rows: w(i) = ⊕_j A(i,j)
    * (GraphBLAS.h:7620) = one partial+final hash agg.
    */
  def reduceRows(m: Monoid = Monoid.Plus): DataFrame =
    df.groupBy(col("src").as("id")).agg(m.agg(col("w")).as("v"))

  /** Reduce over columns: w(j) = ⊕_i A(i,j). */
  def reduceCols(m: Monoid = Monoid.Plus): DataFrame =
    df.groupBy(col("dst").as("id")).agg(m.agg(col("w")).as("v"))

  /** GrB_Matrix_reduce to scalar (GraphBLAS.h:7796). */
  def reduceScalar(m: Monoid = Monoid.Plus): Double = {
    val r = df.agg(m.agg(col("w"))).collect()(0)
    if (r.isNullAt(0)) m.identity else r.getDouble(0)
  }

  /** Per-row entry count (GrB.entries 'degree', @GrB/entries.m:16-34). */
  def rowDegrees: DataFrame = df.groupBy(col("src").as("id")).agg(count(lit(1)).cast("double").as("v"))

  /** argmax per row (interface @GrB/argmax.m): deterministic tie-break on
    * smallest column index. Window + row_number = the reference's sort+pick.
    */
  def argmaxRows: DataFrame = {
    val win = Window.partitionBy("src").orderBy(col("w").desc, col("dst").asc)
    df.withColumn("rn", row_number().over(win)).filter(col("rn") === 1)
      .select(col("src").as("id"), col("dst").as("arg"), col("w").as("v"))
  }

  /** argmin per row (@GrB/argmin.m), same deterministic tie-break. */
  def argminRows: DataFrame = {
    val win = Window.partitionBy("src").orderBy(col("w").asc, col("dst").asc)
    df.withColumn("rn", row_number().over(win)).filter(col("rn") === 1)
      .select(col("src").as("id"), col("dst").as("arg"), col("w").as("v"))
  }

  /** GrB.norm (@GrB/norm.m): inf-norm = max |a_ij| over stored entries. */
  def normInf: Double = {
    val r = df.agg(max(abs(col("w")))).collect()(0)
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** @GrB/norm.m matrix norms over stored entries: "1" = max abs column sum
    * (norm.m:5), "inf" = max abs row sum (norm.m:6), "fro" = sqrt of the sum
    * of squares (norm.m:7-8). The 2-norm is unsupported for sparse matrices,
    * exactly as in the reference (norm.m:9-10). Each is one partial-agg
    * shuffle (or none for fro) + a scalar fetch.
    */
  def norm(kind: String = "fro"): Double = {
    val r = kind match {
      case "1" =>
        df.groupBy("dst").agg(sum(abs(col("w"))).as("s")).agg(max(col("s")))
      case "inf" =>
        df.groupBy("src").agg(sum(abs(col("w"))).as("s")).agg(max(col("s")))
      case "fro" =>
        df.agg(sqrt(sum(col("w") * col("w"))))
      case other => throw new IllegalArgumentException(s"unknown norm: $other")
    }
    val row = r.collect()(0)
    if (row.isNullAt(0)) 0.0 else row.getDouble(0)
  }

  /** @GrB/bandwidth.m: (lower, upper) bandwidth — max i−j and max j−i over
    * stored entries, 0 for an empty matrix (gbbandwidth semantics). One
    * scalar aggregate.
    */
  def bandwidth: (Long, Long) = {
    val r = df.agg(
      max(greatest(col("src") - col("dst"), lit(0L))),
      max(greatest(col("dst") - col("src"), lit(0L)))).collect()(0)
    (if (r.isNullAt(0)) 0L else r.getLong(0),
     if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** @GrB/istril.m: no entries above the diagonal. Existence probe — Spark
    * stops the scan at the first violating entry (limit-1 pushdown).
    */
  def istril: Boolean = df.filter(col("dst") > col("src")).limit(1).count() == 0

  /** @GrB/istriu.m: no entries below the diagonal. */
  def istriu: Boolean = df.filter(col("dst") < col("src")).limit(1).count() == 0

  /** @GrB/isdiag.m: entries only on the main diagonal. */
  def isdiag: Boolean = df.filter(col("dst") =!= col("src")).limit(1).count() == 0

  /** @GrB/isbanded.m: bandwidth within (lo, hi). */
  def isbanded(lo: Long, hi: Long): Boolean = {
    val (l, h) = bandwidth
    l <= lo && h <= hi
  }

  /** @GrB/issymmetric.m: A == A' (pattern and values). */
  def issymmetric: Boolean = isequal(transpose)

  /** @GrB/flip.m: reverse element order along a dimension — flip(1) maps row
    * i → m−1−i (A(end:-1:1,:)), flip(2) maps col j → n−1−j. Dims are not
    * stored in the COO view, so the caller passes the flipped dimension's
    * size, as resize/reshape already do.
    */
  def flip(dimSize: Long, dim: Int = 1): GBMatrix = dim match {
    case 1 => GBMatrix(df.select((lit(dimSize - 1) - col("src")).as("src"), col("dst"), col("w")))
    case 2 => GBMatrix(df.select(col("src"), (lit(dimSize - 1) - col("dst")).as("dst"), col("w")))
    case d => throw new IllegalArgumentException(s"flip dim must be 1 or 2, got $d")
  }

  /** @GrB/repmat.m: m×n tiling of this gm×gn matrix = ones(m,n) ⊗_2nd G
    * (repmat.m:15-21 uses gbkronecker with the '2nd' op) — the tile grid is
    * tiny, so the crossJoin side stays broadcast-sized.
    */
  def repmat(m: Long, n: Long, gm: Long, gn: Long): GBMatrix =
    GBMatrix.ones(spark, m, n).kron(this, gm, gn, BinOp.SecondOp)

  /** @GrB/mpower.m: A^k for a square matrix, k ≥ 1, by binary exponentiation
    * (⌈log2 k⌉ mxm rounds instead of k−1). A^0 is the identity — build it
    * with GBMatrix.eye(n) since COO carries no dims (mpower.m:61-63).
    */
  def matrixPower(k: Int, sr: Semiring = Semiring.PlusTimes): GBMatrix = {
    require(k >= 1, "matrixPower needs k >= 1; A^0 = GBMatrix.eye(n)")
    var acc: GBMatrix = null
    var base = this
    var e = k
    while (e > 0) {
      if ((e & 1) == 1) acc = if (acc == null) base else acc.mxm(base, sr)
      e >>= 1
      if (e > 0) base = base.mxm(base, sr)
    }
    acc
  }

  /** @GrB/isequal.m: same pattern AND same values (within tol; the reference
    * compares exactly — tol=0 gives that). One full-outer join, one count.
    */
  def isequal(other: GBMatrix, tol: Double = 0.0): Boolean = {
    val b = other.df.withColumnRenamed("w", "wb")
    df.join(b, Seq("src", "dst"), "full_outer")
      .filter(col("w").isNull || col("wb").isNull ||
        abs(col("w") - col("wb")) > tol)
      .limit(1).count() == 0
  }

  /** GxB_Matrix_sort within rows (GraphBLAS.h:10932): rank of each entry in
    * its row by value (permutation matrix P analogue).
    */
  def sortRows(ascending: Boolean = true): DataFrame = {
    val ord = if (ascending) Seq(col("w").asc, col("dst").asc) else Seq(col("w").desc, col("dst").asc)
    val win = Window.partitionBy("src").orderBy(ord: _*)
    df.withColumn("k", row_number().over(win))
  }

  /** GxB_Matrix_sort with an arbitrary sort KEY (GraphBLAS.h:10932 accepts
    * any binary lt-op): rank within rows by `key(w)`. This is the
    * distributed-sort form of a comparator — a shuffle sort always orders by
    * key, so a pairwise lt-op is admissible exactly when it is induced by a
    * key transform (abs for magnitude order, negation for descending,
    * struct(k1, k2) for lexicographic ties). Same deterministic dst
    * tie-break as [[sortRows]].
    */
  def sortRowsBy(key: Column => Column, ascending: Boolean = true): DataFrame = {
    val k0 = key(col("w"))
    val ord = if (ascending) Seq(k0.asc, col("dst").asc) else Seq(k0.desc, col("dst").asc)
    val win = Window.partitionBy("src").orderBy(ord: _*)
    df.withColumn("k", row_number().over(win))
  }

  /** GxB_Matrix_sort's full [C,P] output (GraphBLAS.h:10932-10941): C(i,k)
    * is the k-th ranked value of row i and P(i,k) its ORIGINAL column index
    * — the explicit permutation matrix the reference returns next to the
    * sorted values. Both views are selections over one ranking window.
    */
  def sortRowsFull(ascending: Boolean = true): (GBMatrix, GBMatrix) = {
    val s = sortRows(ascending)
    (GBMatrix(s.select(col("src"), (col("k") - 1).cast("long").as("dst"), col("w"))),
     GBMatrix(s.select(col("src"), (col("k") - 1).cast("long").as("dst"),
       col("dst").cast("double").as("w"))))
  }

  // --- multiply family (§2.2): THE kernel ------------------------------------

  /** GrB_mxm C<M> = A ⊕.⊗ B (GraphBLAS.h:4640) as join→multiply→agg.
    * The mask is pushed below the aggregation (dot3 semantics,
    * GB_AxB_dot3.c): candidate products are semi-joined against M *before*
    * the shuffle-agg so masked-out groups never aggregate.
    */
  def mxm(other: GBMatrix, sr: Semiring, mask: Option[GBMatrix] = None,
          desc: Desc = Desc.default): GBMatrix = {
    val a = (if (desc.transposeA) transpose else this).df.select(
      col("src"), col("dst").as("k"), col("w").as("wa"))
    val b = (if (desc.transposeB) other.transpose else other).df.select(
      col("src").as("k"), col("dst"), col("w").as("wb"))
    mask match {
      case Some(m) if desc.dot3 && !desc.maskComplement =>
        // dot3 (GB_AxB_dot3.c): start FROM the mask and compute only the
        // masked dot products — work is Σ_{(i,j)∈M} deg_A(i), not the full
        // product. The right method when the mask is sparse (Desc scaladoc).
        val prod = m.df.select("src", "dst")
          .join(a, Seq("src"))
          .join(b, Seq("k", "dst"))
          .select(col("src"), col("dst"), sr.mult(col("wa"), col("wb")).as("t"))
        GBMatrix(prod.groupBy("src", "dst").agg(sr.add.agg(col("t")).as("w")))
      case _ =>
        val prod = a.join(b, Seq("k"))
          .select(col("src"), col("dst"), sr.mult(col("wa"), col("wb")).as("t"))
        val masked = mask match {
          case Some(m) if !desc.maskComplement =>
            prod.join(m.df.select("src", "dst"), Seq("src", "dst"), "left_semi")
          case Some(m) =>
            prod.join(m.df.select("src", "dst"), Seq("src", "dst"), "left_anti")
          case None => prod
        }
        GBMatrix(masked.groupBy("src", "dst").agg(sr.add.agg(col("t")).as("w")))
    }
  }

  /** GrB_mxv w = A·u (GraphBLAS.h:4662): gather on dst, scatter-agg on src.
    * The vector side is broadcast when small (reference dot methods), else a
    * shuffle-hash join (saxpy) — left to AQE + autoBroadcastJoinThreshold.
    */
  def mxv(u: DataFrame, sr: Semiring): DataFrame =
    df.join(u.select(col("id").as("dst"), col("v")), Seq("dst"))
      .select(col("src"), sr.mult(col("w"), col("v")).as("t"))
      .groupBy(col("src").as("id")).agg(sr.add.agg(col("t")).as("v"))

  /** GrB_vxm w' = u'·A (GraphBLAS.h:4651): the frontier-push direction. */
  def vxm(u: DataFrame, sr: Semiring): DataFrame =
    df.join(u.select(col("id").as("src"), col("v")), Seq("src"))
      .select(col("dst"), sr.mult(col("v"), col("w")).as("t"))
      .groupBy(col("dst").as("id")).agg(sr.add.agg(col("t")).as("v"))

  /** vxm with hub-vertex salting: two-phase aggregation for power-law skew
    * (north rule; analogue of the reference's coarse/fine task slicing with
    * atomics, GB_AxB_saxpy3.c:24-51). Phase 1 aggregates on (dst, salt) —
    * salt derived from src so a hot dst key spreads over `salts` reducers —
    * phase 2 combines the partials.
    *
    * Note Spark's hash agg already does map-side partial aggregation, which
    * handles *input*-side skew; salting additionally protects the reduce side
    * when a single dst key's partials overwhelm one reducer.
    */
  def vxmSalted(u: DataFrame, sr: Semiring, salts: Int = 16): DataFrame =
    df.join(u.select(col("id").as("src"), col("v")), Seq("src"))
      .select(col("dst"), pmod(col("src"), lit(salts)).as("salt"),
        sr.mult(col("v"), col("w")).as("t"))
      .groupBy("dst", "salt").agg(sr.add.agg(col("t")).as("p"))
      .groupBy(col("dst").as("id")).agg(sr.add.agg(col("p")).as("v"))

  /** GrB_kronecker (GraphBLAS.h:8016). Dimensions of other = (bm, bn). */
  def kron(other: GBMatrix, bm: Long, bn: Long, op: BinOp = BinOp.TimesOp): GBMatrix = {
    val b = other.df.select(col("src").as("bi"), col("dst").as("bj"), col("w").as("wb"))
    GBMatrix(df.crossJoin(b).select(
      (col("src") * bm + col("bi")).as("src"),
      (col("dst") * bn + col("bj")).as("dst"),
      op(col("w"), col("wb")).as("w")))
  }

  // --- accumulate / mask epilogue (§2.8) --------------------------------------

  /** The reusable C<M> = accum(C, T) epilogue (GB_accum_mask.c semantics,
    * mimicked by Test/GB_spec_accum.m + GB_spec_mask.m):
    *  Z = accum(C,T): both present → accum; one present → that value
    *  C<M> = Z:  where M present → Z, elsewhere keep old C (or drop if replace)
    */
  def accumMask(t: GBMatrix, accum: Option[BinOp], mask: Option[GBMatrix] = None,
                desc: Desc = Desc.default): GBMatrix = {
    val z = accum match {
      case Some(op) => eWiseAdd(t, op)
      case None     => t // no accum: Z = T on T's pattern... but outside T, C survives unless replaced
    }
    mask match {
      case None => z // implicit all-true mask: C = Z everywhere
      case Some(m) =>
        val zMasked = z.maskBy(m, desc.maskComplement, desc.maskStructural)
        val keepOld =
          if (desc.replace) spark.emptyDataFrame.select(lit(0L).as("src"), lit(0L).as("dst"), lit(0.0).as("w")).limit(0)
          else maskBy(m, !desc.maskComplement, desc.maskStructural).df
        GBMatrix(zMasked.df.unionByName(
          keepOld.join(zMasked.df.select("src", "dst"), Seq("src", "dst"), "left_anti")))
    }
  }

  // --- structural rearrangement (§2.1, §2.7) ----------------------------------

  /** Shift all indices by (di, dj) — the building block of GxB_Matrix_concat
    * (GraphBLAS.h:3613): tiles are offset-unions.
    */
  def offsetBy(di: Long, dj: Long): GBMatrix =
    GBMatrix(df.select((col("src") + di).as("src"), (col("dst") + dj).as("dst"), col("w")))

  /** GxB_Matrix_split (GraphBLAS.h:3632): one tile of the partition — the
    * inverse of concat; a pure pushed-down range filter plus re-basing.
    */
  def splitTile(i0: Long, i1: Long, j0: Long, j1: Long): GBMatrix =
    extractRange(i0, i1, j0, j1).offsetBy(-i0, -j0)

  /** GxB_Matrix_reshape (GraphBLAS.h:10979): by-row relinearization of an
    * m×n matrix into m2×n2 (m*n == m2*n2); pure index arithmetic.
    */
  def reshape(n: Long, n2: Long): GBMatrix = {
    val linear = col("src") * n + col("dst")
    // integral DIV, not fp division: exact for indices beyond 2^53
    GBMatrix(df.select(expr(s"(src * ${n}L + dst) DIV ${n2}L").as("src"),
      pmod(linear, lit(n2)).as("dst"), col("w")))
  }

  /** GB_rowscale: C = D*A, D diagonal given as a vector (id,v) — scales row i
    * by v(i) (Source/GB_rowscale.c). A co-partitioned join, no agg needed.
    */
  def rowScale(d: DataFrame, op: BinOp = BinOp.TimesOp): GBMatrix =
    GBMatrix(df.join(d.select(col("id").as("src"), col("v")), Seq("src"))
      .select(col("src"), col("dst"), op(col("v"), col("w")).as("w")))

  /** GB_colscale: C = A*D (Source/GB_colscale.c). */
  def colScale(d: DataFrame, op: BinOp = BinOp.TimesOp): GBMatrix =
    GBMatrix(df.join(d.select(col("id").as("dst"), col("v")), Seq("dst"))
      .select(col("src"), col("dst"), op(col("w"), col("v")).as("w")))

  // --- assign family (§2.5) ----------------------------------------------------

  /** GrB_Matrix_assign with contiguous ranges (GraphBLAS.h:5579):
    * C(i0:?, j0:?) = A (A's indices re-based into the submatrix); entries of
    * C inside the target region not covered by A are DELETED (no accum), C
    * outside the region survives — the reference's assign-with-GrB_ALL-mask
    * semantics restricted to ranges.
    */
  def assignRange(a: GBMatrix, i0: Long, j0: Long): GBMatrix = {
    val placed = a.offsetBy(i0, j0)
    // ONE fused aggregate for both extents (two separate collects would
    // execute a's plan twice)
    val ext = a.df.agg(max(col("src")), max(col("dst"))).collect()(0)
    val (iMax, jMax) =
      if (ext.isNullAt(0)) (i0, j0)
      else (i0 + ext.getLong(0) + 1, j0 + ext.getLong(1) + 1)
    val outside = df.filter(!(col("src") >= i0 && col("src") < iMax &&
      col("dst") >= j0 && col("dst") < jMax))
    GBMatrix(outside.unionByName(placed.df))
  }

  /** Scalar subassign under a predicate mask: C(i,j) = x where pred
    * (GxB_subassign scalar expansion, GraphBLAS.h:5101).
    */
  def assignScalar(pred: (Column, Column, Column) => Column, x: Double): GBMatrix =
    GBMatrix(df.select(col("src"), col("dst"),
      when(pred(col("src"), col("dst"), col("w")), lit(x)).otherwise(col("w")).as("w")))

  /** GrB_Row_assign (GraphBLAS.h:5592): C(i,:) = u — row i is replaced by
    * u's pattern (row-i entries not covered by u are deleted; other rows
    * untouched). u: (id, v) over column indices.
    */
  def assignRow(i: Long, u: DataFrame): GBMatrix =
    GBMatrix(df.filter(col("src") =!= i).unionByName(
      u.select(lit(i).as("src"), col("id").as("dst"), col("v").as("w"))))

  /** GrB_Col_assign (GraphBLAS.h:5604): C(:,j) = u. */
  def assignCol(j: Long, u: DataFrame): GBMatrix =
    GBMatrix(df.filter(col("dst") =!= j).unionByName(
      u.select(col("id").as("src"), lit(j).as("dst"), col("v").as("w"))))

  /** GxB_subassign C(i0:i1, j0:j1)<M> = A (GraphBLAS.h:5101): the mask is
    * SUBMATRIX-sized (0-based submatrix coordinates, like A) and — unlike
    * GrB_assign — the operation can never touch C outside the region, even
    * with replace (Source/GB_assign.c:28-30 documents exactly this scope
    * distinction). Inside the region: where M present, C takes A's entry (or
    * is deleted if A has none there); where M absent, old C survives unless
    * `replace`.
    */
  def subassignRange(a: GBMatrix, i0: Long, i1: Long, j0: Long, j1: Long,
                     mask: GBMatrix, replace: Boolean = false): GBMatrix = {
    val inRegion = col("src").between(i0, i1) && col("dst").between(j0, j1)
    val outside = df.filter(!inRegion)
    val insideOld = GBMatrix(df.filter(inRegion)
      .select((col("src") - i0).as("src"), (col("dst") - j0).as("dst"), col("w")))
    val newIn = a.maskBy(mask).df
    val keptOld = if (replace) insideOld.df.limit(0)
                  else insideOld.maskBy(mask, complement = true).df
    GBMatrix(outside.unionByName(
      newIn.unionByName(keptOld)
        .select((col("src") + i0).as("src"), (col("dst") + j0).as("dst"), col("w"))))
  }

  /** GrB_Matrix_assign with a mask over ALL of C (GraphBLAS.h:5579,
    * Source/GB_assign.c:28-30): the mask is C-sized; with `replace`, entries
    * of C OUTSIDE the assigned region are also cleared wherever the mask is
    * absent — the behavior that distinguishes assign from subassign.
    */
  def assignRangeMasked(a: GBMatrix, i0: Long, i1: Long, j0: Long, j1: Long,
                        mask: GBMatrix, replace: Boolean = false): GBMatrix = {
    val inRegion = col("src").between(i0, i1) && col("dst").between(j0, j1)
    val newIn = a.offsetBy(i0, j0).maskBy(mask).df
    val insideKept = if (replace) df.limit(0)
                     else GBMatrix(df.filter(inRegion)).maskBy(mask, complement = true).df
    val outsideOld = GBMatrix(df.filter(!inRegion))
    val outsideKept = if (replace) outsideOld.maskBy(mask).df else outsideOld.df
    GBMatrix(outsideKept.unionByName(insideKept).unionByName(newIn))
  }

  // --- graph-matrix conveniences (§2.10 interface layer) -----------------------

  /** GrB.expand (@GrB/expand.m): scalar × pattern. */
  def expand(x: Double): GBMatrix = GBMatrix(df.select(col("src"), col("dst"),
    lit(x).as("w")))

  /** GrB.compact (@GrB/compact.m): drop empty rows/cols by densely re-ranking
    * the ids that actually occur (deterministic ascending order). The rank is
    * a distributed range-partition + zipWithIndex (graft.core.Ranking), not a
    * single-task global window.
    */
  def compact: GBMatrix = {
    val ids = df.select(col("src").as("id")).union(df.select(col("dst").as("id")))
      .distinct()
    val rank = Ranking.denseRank(ids, "k", "id")
    GBMatrix(df
      .join(rank.select(col("id").as("src"), col("k").as("si")), Seq("src"))
      .join(rank.select(col("id").as("dst"), col("k").as("di")), Seq("dst"))
      .select(col("si").as("src"), col("di").as("dst"), col("w")))
  }

  /** GrB.laplacian (@GrB/laplacian.m): L = D - A over the symmetrized,
    * self-loop-free pattern; D = degree diagonal.
    */
  def laplacian: GBMatrix = {
    val und = df.select(col("src"), col("dst"))
      .union(df.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
    val deg = und.groupBy("src").agg(count(lit(1)).cast("double").as("w"))
      .select(col("src"), col("src").as("dst"), col("w"))
    GBMatrix(und.select(col("src"), col("dst"), lit(-1.0).as("w"))
      .unionByName(deg))
  }

  /** GrB.incidence (@GrB/incidence.m): E(edge, src) = -1, E(edge, dst) = +1
    * per undirected-canonical edge; the edge id is a deterministic dense rank
    * of the canonical (lo,hi) pair.
    */
  def incidence: DataFrame = {
    val canon = df.select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
    // distributed edge numbering (graft.core.Ranking) — no global window
    val withId = Ranking.denseRank(canon, "edge", "lo", "hi")
    withId.select(col("edge"), col("lo").as("vertex"), lit(-1.0).as("w"))
      .unionByName(withId.select(col("edge"), col("hi").as("vertex"), lit(1.0).as("w")))
  }

  // --- physical layout knobs ---------------------------------------------------

  /** Hash-partition by src: the CSR-like layout (and the analogue of the
    * reference's hyper_hash O(1) row lookup, GB_matrix.h:240-309) — reusing
    * this partitioning across iterations avoids re-shuffling the big side.
    */
  def repartitionBySrc(n: Int): GBMatrix = GBMatrix(df.repartition(n, col("src")))

  def cache(): GBMatrix = { df.cache(); this }
  def unpersist(): GBMatrix = { df.unpersist(); this }

  /** Grouped-adjacency (CSR rows) materialization:
    * (src, dsts array, ws array) — used when an algorithm re-reads the same
    * orientation many times.
    */
  def groupedAdjacency: DataFrame =
    df.groupBy("src").agg(collect_list(col("dst")).as("dsts"), collect_list(col("w")).as("ws"))
}

object GBMatrix {
  /** Build from raw (src,dst,w) tuples, combining duplicates with `dup`
    * (GrB_Matrix_build semantics).
    */
  def fromTuples(df: DataFrame, dup: Monoid = Monoid.Plus): GBMatrix =
    GBMatrix(df.select(col("src").cast("long"), col("dst").cast("long"),
      col("w").cast("double"))).build(dup)

  /** Diagonal matrix from a vector on diagonal k (GrB_Matrix_diag,
    * GraphBLAS.h:3656).
    */
  def diagOf(v: DataFrame, k: Long = 0): GBMatrix =
    GBMatrix(v.select(col("id").as("src"), (col("id") + k).as("dst"), col("v").as("w")))

  /** GrB_Vector_build (GraphBLAS.h:2255-2393): a vector from (id, v) tuples,
    * duplicates combined with the dup monoid — the named vector-side twin of
    * Matrix build (same one-shuffle groupBy+agg plan).
    */
  def buildVector(v: DataFrame, dup: Monoid = Monoid.Plus): DataFrame =
    v.select(col("id").cast("long"), col("v").cast("double"))
      .groupBy("id").agg(dup.agg(col("v")).as("v"))

  /** GrB.eye / GrB.speye (@GrB/eye.m, speye.m — identical for the double
    * domain): sparse m×n identity on diagonal k, generated distributed via
    * spark.range (no driver-side materialization).
    */
  def eye(spark: SparkSession, m: Long, n: Long = -1L, k: Long = 0L): GBMatrix = {
    val nn = if (n < 0) m else n
    val lo = math.max(0L, -k)
    val hi = math.min(m, nn - k) // exclusive; i in [lo, hi) has 0<=i+k<nn
    val rows = spark.range(lo, math.max(lo, hi))
    GBMatrix(rows.select(col("id").as("src"), (col("id") + k).as("dst"),
      lit(1.0).as("w")))
  }

  /** @GrB/speye.m: "SPEYE sparse identity matrix, same as GrB.eye". */
  def speye(spark: SparkSession, m: Long, n: Long = -1L, k: Long = 0L): GBMatrix =
    eye(spark, m, n, k)

  /** @GrB/ones.m analogue: fully-populated m×n matrix of 1.0 (the reference
    * materializes full matrices the same way, as an explicit all-entries
    * structure). Intended for small tile/grid operands (repmat); a 100 TB
    * operand would never be dense-ones.
    */
  def ones(spark: SparkSession, m: Long, n: Long): GBMatrix =
    GBMatrix(spark.range(m * n).select((col("id") / n).cast("long").as("src"),
      pmod(col("id"), lit(n)).as("dst"), lit(1.0).as("w")))

  /** The reference's 8×8 Wathen element stiffness block
    * (Demo/Include/wathen.c:75-83, scaled by 1/45).
    */
  private[graft] val WathenE: Seq[Seq[Double]] = {
    val d = 45.0
    Seq(
      Seq( 6, -6,  2, -8,  3, -8,  2, -6),
      Seq(-6, 32, -6, 20, -8, 16, -8, 20),
      Seq( 2, -6,  6, -6,  2, -8,  3, -8),
      Seq(-8, 20, -6, 32, -6, 20, -8, 16),
      Seq( 3, -8,  2, -6,  6, -6,  2, -8),
      Seq(-8, 16, -8, 20, -6, 32, -6, 20),
      Seq( 2, -8,  3, -8,  2, -6,  6, -6),
      Seq(-6, 20, -8, 16, -8, 20, -6, 32)).map(_.map(_ / d))
  }

  /** Wathen finite-element matrix on an nx×ny mesh (the reference's demo
    * generator, Demo/Include/wathen.c:74-195 = wathen.m): n = 3·nx·ny +
    * 2·nx + 2·ny + 1, one 8×8 element block per mesh cell scaled by a
    * per-cell density RHO(i,j) = 100·uniform, duplicate node contributions
    * summed (GrB_Matrix_build with PLUS, wathen.c:193). RHO here is a pure
    * hash of (i,j,seed) — the rho_given path with a deterministic source —
    * so the matrix is O(nx·ny·64) fully-distributed arithmetic over a
    * spark.range, identical at any parallelism.
    */
  def wathen(spark: SparkSession, nx: Long, ny: Long, seed: Long = 42L,
             rhoFn: Option[(Column, Column) => Column] = None): GBMatrix = {
    val cells = nx * ny
    val base = spark.range(cells * 64L)
    val cell = (col("id") / 64L).cast("long")
    val krow = (pmod(col("id"), lit(64L)) / 8L).cast("long")
    val kcol = pmod(col("id"), lit(8L))
    val i = pmod(cell, lit(nx)) + 1L // 1-based, as in wathen.m
    val j = (cell / nx).cast("long") + 1L
    // node ids of the cell's 8 mesh nodes (wathen.c:169-177), made 0-based
    val nn0 = lit(3L) * j * nx + lit(2L) * i + lit(2L) * j + 1L
    val nn3 = (lit(3L) * j - 1L) * nx + lit(2L) * j + i - 1L
    val nn4 = lit(3L) * (j - 1L) * nx + lit(2L) * i + lit(2L) * j - 3L
    val nn = array(Seq(nn0, nn0 - 1L, nn0 - 2L, nn3, nn4, nn4 + 1L,
      nn4 + 2L, nn3 + 1L).map(_ - 1L): _*)
    // default density: 100·uniform from a hash of the cell — the reference's
    // RHO = 100*rand(nx,ny); rhoFn is the rho_given path (wathen.c:118-122)
    val rho = rhoFn.map(_(i, j)).getOrElse(lit(100.0) *
      (abs(xxhash64(i, j, lit(seed))).cast("double") / Long.MaxValue.toDouble))
    val e = typedLit(WathenE)
    GBMatrix(base.select(
      element_at(nn, (krow + 1L).cast("int")).as("src"),
      element_at(nn, (kcol + 1L).cast("int")).as("dst"),
      (element_at(element_at(e, (krow + 1L).cast("int")),
        (kcol + 1L).cast("int")) * rho).as("w")))
      .build(Monoid.Plus)
  }

  /** Deterministic R-MAT power-law edge generator (Chakrabarti et al. 2004;
    * the Graph500 web-graph fixture family — the reference's `GrB.random`
    * kin for SCALE-FREE inputs). Edge i picks one of four quadrants per
    * recursion level by an LCG residue mod 16, with quadrant weights
    * (a,b,c,16-a-b-c) in SIXTEENTHS — default 9/3/3/1 ≈ the paper's
    * .57/.19/.19/.05, exact integer thresholds so the stream is mirrorable
    * in ANSI SQL. A pure ZERO-SHUFFLE projection over `spark.range(m)`:
    * generating 10^12 test edges fleet-wide moves no data at all.
    * Duplicate edges are kept (natural R-MAT multi-edges) — feed through
    * `build(dup)` / groupBy for a weighted simple graph.
    */
  def rmat(spark: SparkSession, scale: Int, m: Long, seed: Long = 42L,
           a16: Int = 9, b16: Int = 3, c16: Int = 3): DataFrame = {
    require(scale >= 1 && scale <= 62, "scale in [1,62]")
    require(a16 >= 0 && b16 >= 0 && c16 >= 0 && a16 + b16 + c16 <= 16)
    val base = spark.range(m).select(col("id").as("i"))
    val bits = (0 until scale).map { l =>
      // a NON-LINEAR mix before taking 4 low bits: 48271 ≡ -1 (mod 16), so
      // the raw LCG's low bits form an arithmetic progression across levels
      // (classic defect), and any further LINEAR map preserves that
      // structure. Squaring mod 1e9+7 destroys it (h1 < 1e9+7 ⇒ h1² < 2⁶³,
      // exact in Long and in DuckDB BIGINT; i ≤ 10^12 keeps the first
      // product < 5e16). Verified: P(vertex 0) matches (a+b)/16^scale.
      val h1 = (col("i") * 48271L + lit(l.toLong) * 2000003L +
        lit(seed + 987654321L)) % 1000000007L
      val r = (h1 * h1) % 1000000007L % 16L
      val rowBit = when(r < a16 + b16, 0L).otherwise(1L)
      val colBit = when(r < a16, 0L)
        .otherwise(when(r < a16 + b16, 1L)
          .otherwise(when(r < a16 + b16 + c16, 0L).otherwise(1L)))
      (rowBit * (1L << l), colBit * (1L << l))
    }
    base.select(bits.map(_._1).reduce(_ + _).as("src"),
      bits.map(_._2).reduce(_ + _).as("dst"))
  }

  /** In-memory matrix for tests/fixtures. */
  def of(spark: SparkSession, entries: Seq[(Long, Long, Double)]): GBMatrix = {
    import spark.implicits._
    GBMatrix(entries.toDF("src", "dst", "w"))
  }

  /** GrB.load (@GrB/load.m analogue): read a matrix saved with save(). */
  def load(spark: SparkSession, path: String): GBMatrix =
    GBMatrix(spark.read.parquet(path).select(col("src"), col("dst"), col("w")))

  /** GrB.random / sprand (@GrB/random.m): deterministic sparse random m×n
    * matrix with ~`density`·m·n entries, weights uniform in (0,1). O(nnz)
    * work and fully distributed: positions/values are pure hash functions of
    * a row index (no RNG state), so the result is identical at any
    * parallelism. Collisions collapse via build (slightly fewer than nnz
    * entries, like sprand's duplicate draws).
    */
  def random(spark: SparkSession, m: Long, n: Long, density: Double,
             seed: Long = 42L): GBMatrix = {
    val nnz = math.max(1L, (density * m * n).toLong)
    val base = spark.range(0, nnz)
    GBMatrix(base.select(
      pmod(xxhash64(col("id"), lit(seed)), lit(m)).as("src"),
      pmod(xxhash64(col("id"), lit(seed + 1)), lit(n)).as("dst"),
      (abs(xxhash64(col("id"), lit(seed + 2))).cast("double") /
        lit(Long.MaxValue.toDouble)).as("w"))).build(Monoid.Max)
  }

  /** GxB_Matrix_concat (GraphBLAS.h:3613): assemble a 2-D grid of tiles.
    * `tiles(i)(j)` is placed at row offset Σ rowHeights(<i), col offset
    * Σ colWidths(<j).
    */
  def concat(tiles: Seq[Seq[GBMatrix]], rowHeights: Seq[Long], colWidths: Seq[Long]): GBMatrix = {
    val rowOff = rowHeights.scanLeft(0L)(_ + _)
    val colOff = colWidths.scanLeft(0L)(_ + _)
    val placed = for {
      (row, i) <- tiles.zipWithIndex
      (t, j) <- row.zipWithIndex
    } yield t.offsetBy(rowOff(i), colOff(j)).df
    GBMatrix(placed.reduce(_ unionByName _))
  }
}
