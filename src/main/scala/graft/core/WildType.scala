package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Arbitrary-STRUCT user-defined-type semiring — the Spark-first answer to
  * the reference's `wildtype` demo (`Demo/Program/wildtype_demo.c:45-48`:
  * `typedef struct { double stuff [4][4] ; char whatstuff [64] ; }`): each
  * sparse entry of the (i, j) edge table carries a 4×4 dense block as a
  * 16-element row-major `array<double>` column plus a free-text `tag`
  * column. The `InTheWild` semiring (wildtype_demo.c:354-356) multiplies
  * entries with a 4×4 dense MATMUL (`wildmult`, c:151-166 — z(i,j) =
  * Σ_k x(i,k)·y(k,j), note NON-commutative) and adds with an elementwise
  * block sum (`wildadd`, c:110-126); both are pure column expressions, so
  * the whole "matrix of matrices" runs inside whole-stage codegen where the
  * reference JIT-compiles a C kernel per op. The tag mirrors the demo's
  * observable strcpy semantics: a combined entry reads "this was added", a
  * single product keeps "this was multiplied" (a monoid fold of one element
  * is the element itself).
  *
  * Scale shape: [[mxm]] is the standard join→blockMultiply→groupBy pipeline
  * of [[GBMatrix.mxm]] with a 16-component payload (the reduction is 16
  * independent sums — still one hash aggregate); [[mxmMasked]] pushes the
  * output mask into a semi-join BEFORE the aggregate (dot3 semantics, as
  * `C<M>=C*C'` in the demo, c:370-382). WildTypeDemoSpec replays the
  * committed `Demo/Output/wildtype_demo.out` dumps entry-for-entry.
  */
object WildType {

  val AddTag = "this was added"
  val MultTag = "this was multiplied"

  /** wildmult: 4×4 row-major dense matmul of two 16-element blocks. */
  def blockMult(x: Column, y: Column): Column =
    transform(sequence(lit(0), lit(15)), p => {
      val bi = (p / 4).cast("int")
      val bj = (p % 4).cast("int")
      (0 until 4).map(k =>
        element_at(x, bi * 4 + k + 1) * element_at(y, lit(k * 4 + 1) + bj))
        .reduce(_ + _)
    })

  /** wildadd: elementwise block sum. */
  def blockAdd(x: Column, y: Column): Column = zip_with(x, y, _ + _)

  private def productPairs(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("i"), col("j").as("k"), col("stuff").as("xs"))
      .join(b.select(col("i").as("k"), col("j"), col("stuff").as("ys")), Seq("k"))
      .select(col("i"), col("j"), blockMult(col("xs"), col("ys")).as("pb"))

  private def reduceBlocks(pairs: DataFrame): DataFrame = {
    val sums = (1 to 16).map(p => sum(element_at(col("pb"), p)).as(s"s$p"))
    pairs.groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sums: _*)
      .select(col("i"), col("j"),
        array((1 to 16).map(p => col(s"s$p")): _*).as("stuff"),
        when(col("n") > 1, AddTag).otherwise(MultTag).as("tag"))
  }

  /** C = A·B over the InTheWild (blockAdd, blockMult) semiring. */
  def mxm(a: DataFrame, b: DataFrame): DataFrame =
    reduceBlocks(productPairs(a, b))

  /** C⟨M⟩ = A·B with an output-structure mask, replace semantics: the mask
    * semi-join runs BEFORE the reduction (dot3), so unmasked products are
    * never aggregated.
    */
  def mxmMasked(a: DataFrame, b: DataFrame, mask: DataFrame): DataFrame =
    reduceBlocks(productPairs(a, b).join(mask, Seq("i", "j"), "left_semi"))

  /** Array transpose (positions move, blocks don't — the demo's
    * GrB_transpose / DESC_T1 convention).
    */
  def transpose(a: DataFrame): DataFrame =
    a.select(col("j").as("i"), col("i").as("j"), col("stuff"), col("tag"))

  /** GrB_Matrix_reduce_UDT with the WildAdder monoid: 16 independent sums
    * over every entry (order-free). A monoid fold of ONE entry is that
    * entry verbatim — tag included; an empty matrix reduces to the monoid
    * identity (the demo's `scalar_identity`, wildtype_demo.c:341-350);
    * otherwise the combined result reads [[AddTag]].
    */
  def reduceScalar(a: DataFrame): (Seq[Double], String) = {
    val sums = (1 to 16).map(p => sum(element_at(col("stuff"), p)).as(s"s$p"))
    val r = a.select(col("stuff"), col("tag"))
      .agg(count(lit(1)).as("n"), sums :+ min_by(struct(col("stuff"), col("tag")),
        col("tag")).as("one"): _*).collect()(0)
    r.getLong(0) match {
      case 0 => (Seq.fill(16)(0.0), "identity")
      case 1 =>
        val one = r.getStruct(17)
        (one.getSeq[Double](0), one.getString(1))
      case _ => ((1 to 16).map(p => r.getDouble(p)), AddTag)
    }
  }
}
