package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** User-defined-type (UDT) semiring algebra over GAUSSIAN INTEGERS — the
  * Spark-first answer to the reference's user-defined `gauss` type and
  * AddGauss/MultGauss/GaussSemiring ops (`Demo/Program/gauss_demo.c:380-495`,
  * `typedef struct { int32_t real ; int32_t imag ; } gauss`): the complex
  * payload is a PAIR OF INTEGER COLUMNS (re, im) on the sparse edge table
  * (i, j, re, im), the binary ops are plain column expressions (whole-stage
  * codegen — the reference needs a JIT compile per UDT kernel; Catalyst gets
  * the same for free), and the plus-times gauss semiring's reduction is two
  * INDEPENDENT integer sums, so every result is exact and
  * partition-order-free. GaussDemoSpec replays the reference's committed
  * golden output `Demo/Output/gauss_demo.out` entry-for-entry against these
  * ops. The same two-column recipe is the general FC32/FC64 complex mapping
  * (SURVEY §2: StructType/struct-of-columns if needed).
  *
  * Scale shape: mxm is the standard join→multiply→groupBy-sum pipeline of
  * [[GBMatrix.mxm]] with a 2-component value; nothing here is demo-only.
  */
object Gauss {

  /** C = A·B over the gauss plus-times semiring:
    * (xr,xi)·(yr,yi) = (xr·yr − xi·yi, xr·yi + xi·yr), ⊕ = componentwise
    * integer sum (exact, order-free).
    */
  def mxm(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("i"), col("j").as("k"), col("re").as("xr"), col("im").as("xi"))
      .join(b.select(col("i").as("k"), col("j"), col("re").as("yr"),
        col("im").as("yi")), Seq("k"))
      .groupBy("i", "j")
      .agg(sum(col("xr") * col("yr") - col("xi") * col("yi")).as("re"),
        sum(col("xr") * col("yi") + col("xi") * col("yr")).as("im"))

  /** Array (non-conjugate) transpose — the demo's explicit convention
    * ("all transposes are array transposes", gauss_demo.out:1).
    */
  def transpose(a: DataFrame): DataFrame =
    a.select(col("j").as("i"), col("i").as("j"), col("re"), col("im"))

  /** GrB_select(GrB_DIAG): keep the diagonal (gauss_demo.c:425). */
  def selectDiag(a: DataFrame): DataFrame = a.filter(col("i") === col("j"))

  /** Dense n×n constant matrix — GrB_Matrix_assign_UDT over GrB_ALL
    * (gauss_demo.c:451).
    */
  def full(spark: SparkSession, n: Int, re: Long, im: Long): DataFrame = {
    val r = spark.range(n.toLong).select(col("id"))
    r.select(col("id").as("i"))
      .crossJoin(r.select(col("id").as("j")))
      .select(col("i"), col("j"), lit(re).as("re"), lit(im).as("im"))
  }

  /** eWiseAdd / AddGauss-accum union: entries present on one side pass
    * through, shared entries add componentwise (exact integers).
    */
  def ewiseAdd(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("i"), col("j"), col("re").as("ar"), col("im").as("ai"))
      .join(b.select(col("i"), col("j"), col("re").as("br"), col("im").as("bi")),
        Seq("i", "j"), "full_outer")
      .select(col("i"), col("j"),
        (coalesce(col("ar"), lit(0L)) + coalesce(col("br"), lit(0L))).as("re"),
        (coalesce(col("ai"), lit(0L)) + coalesce(col("bi"), lit(0L))).as("im"))

  /** apply(AddGauss, ciso, A): per-entry scalar add on A's pattern. */
  def addScalar(a: DataFrame, cr: Long, ci: Long): DataFrame =
    a.select(col("i"), col("j"),
      (col("re") + cr).as("re"), (col("im") + ci).as("im"))

  /** apply(MultGauss, ·, ciso) / (ciso, ·): per-entry complex scalar
    * multiply on A's pattern (commutative over the integers, so 1st/2nd
    * bind produce identical values — gauss_demo.c:481-495).
    */
  def multScalar(a: DataFrame, cr: Long, ci: Long): DataFrame =
    a.select(col("i"), col("j"),
      (col("re") * cr - col("im") * ci).as("re"),
      (col("re") * ci + col("im") * cr).as("im"))

  /** Empty gauss matrix (pattern-free, any logical shape). */
  def empty(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long, Long)].toDF("i", "j", "re", "im")
  }

  /** `GrB_apply(RealGauss)` — UDT→int unary extracting the real part
    * (gauss_demo.c:500-516): a pure projection, no shuffle.
    */
  def realPart(a: DataFrame): DataFrame =
    a.select(col("i"), col("j"), col("re").as("v"))

  /** `GrB_apply(IJGauss, thunk)` — the demo's positional IndexUnaryOp
    * `z = x.real + y.real + i − j` (gauss_demo.c:123-127): row/col indices
    * are ordinary columns here, so the "positional op" is a plain
    * column expression.
    */
  def ijApply(a: DataFrame, yr: Long): DataFrame =
    a.select(col("i"), col("j"),
      (col("re") + yr + col("i") - col("j")).as("v"))

  /** `GxB_Matrix_concat` over a tile grid (gauss_demo.c:558): same global
    * offset arithmetic as [[GBMatrix.concat]] with a 2-component payload —
    * a union of shifted projections, no shuffle.  `rowHeights(r)` /
    * `colWidths(c)` are the logical tile dimensions (empty tiles occupy
    * space without contributing entries).
    */
  def concatTiles(tiles: Seq[Seq[DataFrame]], rowHeights: Seq[Long],
                  colWidths: Seq[Long]): DataFrame = {
    val rOff = rowHeights.scanLeft(0L)(_ + _)
    val cOff = colWidths.scanLeft(0L)(_ + _)
    tiles.zipWithIndex.flatMap { case (rowTiles, r) =>
      rowTiles.zipWithIndex.map { case (t, c) =>
        t.select((col("i") + rOff(r)).as("i"), (col("j") + cOff(c)).as("j"),
          col("re"), col("im"))
      }
    }.reduce(_ unionAll _)
  }

  /** `GxB_Matrix_split` into a row-major tile sequence (gauss_demo.c:572):
    * disjoint range filters + offset subtraction — each tile's plan is a
    * filtered projection of the parent, so Catalyst pushes the range
    * predicate into the parent's scan.
    */
  def splitTiles(m: DataFrame, rowHeights: Seq[Long],
                 colWidths: Seq[Long]): Seq[DataFrame] = {
    val rOff = rowHeights.scanLeft(0L)(_ + _)
    val cOff = colWidths.scanLeft(0L)(_ + _)
    for {
      r <- rowHeights.indices
      c <- colWidths.indices
    } yield m.filter(col("i") >= rOff(r) && col("i") < rOff(r + 1) &&
        col("j") >= cOff(c) && col("j") < cOff(c + 1))
      .select((col("i") - rOff(r)).as("i"), (col("j") - cOff(c)).as("j"),
        col("re"), col("im"))
  }
}
