package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extensions injector: makes every graft-specific Catalyst
  * Expression available as a SQL function at session build time —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * spark.sql("SELECT gb_gamma(w), gb_erf(w) FROM edges")
  * }}}
  *
  * or programmatically `SparkSession.builder().withExtensions(new
  * GraftExtensions)`. For an already-built session use
  * `SpecialFunctionRegistry.register(spark)` instead (same function list,
  * session-scoped). See `org.apache.spark.sql.graft.SpecialExpressions`
  * for the expression implementations (codegen'd, null-safe, double→double).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    org.apache.spark.sql.graft.SpecialFunctionRegistry.inject(ext)
}
