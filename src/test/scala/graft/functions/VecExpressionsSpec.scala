package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.pipeline.Similarity

/** The fused VecDot/VecSqDist kernels: bit-equivalence with the HOF
  * (zip_with + aggregate) spelling they replace, codegen residency, and
  * null/length edge cases.
  */
class VecExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val vecs = {
    val rnd = new scala.util.Random(17L)
    (0 until 50).map { i =>
      (i.toLong,
        Array.fill(24)((rnd.nextDouble() * 2 - 1).toFloat),
        Array.fill(24)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("id", "a", "b")
  }

  test("VecDot/VecSqDist equal the HOF fold bit-for-bit on float arrays") {
    // the HOF spelling with the SAME arithmetic (double products, left fold)
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    def hofSq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }), lit(0.0), (acc, v) => acc + v)
    val rows = vecs.select(
      Similarity.dot(col("a"), col("b")).as("d1"), hofDot(col("a"), col("b")).as("d2"),
      Similarity.sqdist(col("a"), col("b")).as("s1"), hofSq(col("a"), col("b")).as("s2"))
      .collect()
    for (r <- rows) {
      assert(r.getDouble(0) == r.getDouble(1), s"dot: ${r.getDouble(0)} vs ${r.getDouble(1)}")
      assert(r.getDouble(2) == r.getDouble(3), s"sqdist: ${r.getDouble(2)} vs ${r.getDouble(3)}")
    }
  }

  test("VecDot: null arrays propagate, length mismatch folds the prefix, codegen") {
    val d = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f, 99.0f)), // extra tail ignored
      (2L, null, Seq(1.0f))
    ).toDF("id", "a", "b")
    val got = d.select(col("id"), Similarity.dot(col("a"), col("b")).as("v")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got(1L) == 11.0 && got(2L) == null)
    // double arrays work too (both element types accepted)
    val dd = Seq((Seq(0.5, 0.25), Seq(4.0, 8.0))).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(dd == 4.0)
    // fused kernel lives inside whole-stage codegen (repartition blocks the
    // ConvertToLocalRelation collapse that would pre-evaluate the fixture)
    val q = vecs.repartition(2)
      .select(Similarity.dot(col("a"), col("b")).as("v"))
    q.collect() // finalize the adaptive plan so codegen stages are marked
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("Project") &&
      l.contains("*") && l.contains("vec_dot")), plan)
  }
}
