package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The custom codegen'd Catalyst Expressions for the reference's
  * special-function unary tail: reference values, identities, and the
  * codegen-vs-interpreted agreement (the Spark pipeline exercises the
  * doGenCode path; SpecialMath direct calls are the interpreted oracle).
  */
class SpecialFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def sparkEval(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                        xs: Seq[Double]): Seq[Double] =
    xs.toDF("x").select(f(col("x")).as("y")).collect().map(_.getDouble(0)).toSeq

  test("erf/erfc match published reference values to 1e-12") {
    // (x, erf(x)) — standard tabulated values
    val ref = Seq(
      0.0 -> 0.0,
      0.5 -> 0.5204998778130465,
      1.0 -> 0.8427007929497149,
      2.0 -> 0.9953222650189527,
      3.0 -> 0.9999779095030014,
      -1.0 -> -0.8427007929497149)
    val got = sparkEval(SpecialFunctions.erf, ref.map(_._1))
    for (((_, e), g) <- ref.zip(got)) assert(math.abs(g - e) < 1e-12, s"erf: $g vs $e")
    // erfc at large x (the continued-fraction branch)
    val erfc = sparkEval(SpecialFunctions.erfc, Seq(3.0, 5.0, 10.0))
    val refC = Seq(2.209049699858544e-5, 1.5374597944280347e-12, 2.088487583762545e-45)
    for ((g, e) <- erfc.zip(refC))
      assert(math.abs(g / e - 1.0) < 1e-10, s"erfc rel: $g vs $e")
    // identity erf + erfc = 1 across both branches
    val xs = Seq(0.1, 0.9, 1.7, 2.1, 2.9, 4.0)
    val s = sparkEval(SpecialFunctions.erf, xs).zip(sparkEval(SpecialFunctions.erfc, xs))
    for ((a, b) <- s) assert(math.abs(a + b - 1.0) < 1e-12)
  }

  test("gamma/lgamma: factorials, half-integers, reflection, log-consistency") {
    val g = sparkEval(SpecialFunctions.gamma, Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
    for ((got, expect) <- g.zip(Seq(1.0, 1.0, 2.0, 6.0, 24.0, 120.0)))
      assert(math.abs(got / expect - 1.0) < 1e-12, s"gamma: $got vs $expect")
    val half = sparkEval(SpecialFunctions.gamma, Seq(0.5, -0.5, 1.5))
    assert(math.abs(half(0) - math.sqrt(math.Pi)) < 1e-12)
    assert(math.abs(half(1) - (-2.0 * math.sqrt(math.Pi))) < 1e-12)
    assert(math.abs(half(2) - math.sqrt(math.Pi) / 2.0) < 1e-12)
    // lgamma == log(gamma) where gamma fits, including the reflection branch
    val xs = Seq(0.25, 0.75, 1.3, 4.7, 20.5, 100.0)
    val lg = sparkEval(SpecialFunctions.lgamma, xs)
    for ((x, l) <- xs.zip(lg))
      assert(math.abs(l - math.log(SpecialMath.gamma(x).abs)) < 1e-10, s"lgamma($x)")
    // large argument where tgamma overflows but lgamma is finite
    assert(sparkEval(SpecialFunctions.lgamma, Seq(1000.0)).head > 5000.0)
  }

  test("frexp: x == frexpx * 2^frexpe with mantissa in [0.5, 1), incl. subnormals") {
    val xs = Seq(1.0, -3.75, 1e300, 1e-300, 4.9e-324, // min subnormal
      7.234e-310, 0.0, 123456.789)
    val m = sparkEval(SpecialFunctions.frexpx, xs)
    val e = sparkEval(SpecialFunctions.frexpe, xs)
    for (((x, mi), ei) <- xs.zip(m).zip(e)) {
      assert(java.lang.Math.scalb(mi, ei.toInt) == x, s"frexp($x) = $mi * 2^$ei")
      if (x != 0.0) assert(math.abs(mi) >= 0.5 && math.abs(mi) < 1.0, s"mantissa $mi")
    }
  }

  test("expressions live inside whole-stage codegen (no fallback)") {
    val df = spark.range(0, 4).select(
      SpecialFunctions.erf(col("id").cast("double")).as("y"))
    // the "*(n)" node prefix marks operators fused into a WholeStageCodegen
    // stage; a codegen-fallback expression would strip it from the Project
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(1) Project") &&
      l.contains("erf")), plan)
    // and the registry route resolves the same expressions
    val viaRegistry = Seq(0.5).toDF("x")
      .select(graft.core.Ops.unary("erf")(col("x"))).collect()(0).getDouble(0)
    assert(math.abs(viaRegistry - 0.5204998778130465) < 1e-12)
  }

  test("SQL surface: SpecialFunctionRegistry + GraftExtensions resolve gb_* functions") {
    import org.apache.spark.sql.SparkSession
    import graft.functions.SpecialMath
    // path 1: register into the existing session
    org.apache.spark.sql.graft.SpecialFunctionRegistry.register(spark)
    val r = spark.sql(
      "SELECT gb_gamma(4.0D) g, gb_erf(0.5D) e, gb_lgamma(10.0D) l, " +
      "gb_erfc(2.0D) c, gb_frexpx(24.0D) mx, gb_frexpe(24.0D) ex").collect()(0)
    assert(r.getDouble(0) == SpecialMath.gamma(4.0) && math.abs(r.getDouble(0) - 6.0) < 1e-12)
    assert(r.getDouble(1) == SpecialMath.erf(0.5))
    assert(r.getDouble(2) == SpecialMath.lgamma(10.0))
    assert(r.getDouble(3) == SpecialMath.erfc(2.0))
    assert(r.getDouble(4) == 0.75 && r.getDouble(5) == 5.0)
    // wrong arity is rejected at analysis
    intercept[Exception](spark.sql("SELECT gb_erf(1.0D, 2.0D)").collect())

    // path 2: a fresh session built with the extensions injector (shares
    // the test SparkContext; extensions are per-session state)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new graft.GraftExtensions).getOrCreate()
      val v = s2.sql("SELECT gb_gamma(5.0D) g").collect()(0).getDouble(0)
      assert(math.abs(v - 24.0) < 1e-11, s"gamma(5) via extensions: $v")
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
