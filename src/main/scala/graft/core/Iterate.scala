package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** State-transition helpers for iterative (fixpoint) algorithms.
  *
  * Every iteration of the graph algorithms references the previous vertex
  * state MORE THAN ONCE (gather join + merge join), so carrying the raw
  * logical plan across iterations grows it EXPONENTIALLY — Catalyst
  * re-analysis, not execution, becomes the bottleneck after ~15 iterations.
  * The reference has no analogue (its C loops mutate in place); the
  * Spark-native equivalent of that in-place update is an eager local
  * checkpoint per iteration: materialize the state into cached partitions and
  * replace the plan with a constant-size leaf (`LogicalRDD`), preserving the
  * partitioning so co-partitioned joins stay shuffle-free (SURVEY.md §7.4
  * "iterative lineage blowup").
  */
object Iterate {

  /** Run `body` with AQE disabled, restoring the previous setting after.
    *
    * Fixpoint loops have a fully-known, fixed layout (declared hash
    * partitioning, user-specified partition counts, shuffle-hash joins), so
    * AQE's per-stage materialization barriers and replanning add only driver
    * round-trips there — measured ~10% of an 8M-edge PageRank iteration at
    * 32 cores. AQE stays ON for the ad-hoc analytic queries, where runtime
    * stats genuinely pick join strategies.
    */
  def withoutAQE[A](spark: org.apache.spark.sql.SparkSession)(body: => A): A = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prev)
  }

  /** Eagerly materialize `df` (one job over its — usually co-partitioned —
    * inputs) and return a frame whose plan is a leaf over the cached blocks.
    */
  def cut(df: DataFrame): DataFrame = df.localCheckpoint(true)

  /** cut() that also lays the rows out hash-partitioned by `keys` into
    * `parts` partitions and DECLARES that partitioning on the leaf, so the
    * next iteration's joins/aggs on the keys skip their exchanges. Use for
    * loop states consumed through key joins (PageRank r, CC/LPA labels).
    */
  def cutKeyed(df: DataFrame, parts: Int, keys: String*): DataFrame =
    org.apache.spark.sql.graft.GraftSqlInternals.cutHashPartitioned(df, parts, keys)

  /** Read a CollectMetrics observation (`df.observe(name, …)`) as a Long.
    *
    * CONTRACT: this works because cutKeyed/cutHashPartitioned executes the
    * observed frame's OWN QueryExecution (GraftSqlInternals materializes
    * `qe.toRdd` — a derived `.select` would re-plan and never populate the
    * accumulator). If a future cutKeyed change breaks that (e.g. a
    * repartition-first rewrite), the key is simply absent — then this falls
    * back to `fallback` (one extra count job) instead of throwing
    * NoSuchElementException mid-loop. A null observation (empty input)
    * reads as 0.
    */
  def observedLong(df: DataFrame, name: String)(fallback: => Long): Long =
    df.queryExecution.observedMetrics.get(name)
      .map(r => if (r.isNullAt(0)) 0L else r.getLong(0))
      .getOrElse(fallback)

  /** Multi-column variant of [[observedLong]] — same contract, returns the
    * whole observation Row (callers index columns in declaration order).
    */
  def observedRow(df: DataFrame, name: String)(
      fallback: => org.apache.spark.sql.Row): org.apache.spark.sql.Row =
    df.queryExecution.observedMetrics.getOrElse(name, fallback)

  /** Best-effort release of the cached blocks behind a cut() frame; safe to
    * call only once the successor state has been cut (the truncated lineage
    * cannot recompute). LOCAL MODE ONLY: on a real cluster an executor death
    * after free() could lose successor blocks whose lineage references the
    * freed (truncated) predecessor — there, the last K states must stay
    * pinned and the ContextCleaner handles release. Non-local sessions and
    * non-cut frames are therefore left alone.
    */
  def free(df: DataFrame): Unit = df.queryExecution.logical match {
    case lr: LogicalRDD if df.sparkSession.sparkContext.isLocal =>
      lr.rdd.unpersist(false)
    case _ => ()
  }
}
