package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-table analytics: the batch form of the stream-shaped operations a
  * large-scale telemetry/training-data pipeline needs — tumbling-window
  * aggregation and gap-based sessionization. Structured Streaming would run
  * the same plans over `readStream` with a watermark (`window()` is the
  * shared primitive); the reference has no streaming surface (SURVEY.md
  * §2.11), so these run in batch where the DuckDB oracle can check them.
  *
  * Scale: both are single-shuffle plans — the windowed aggregate is a plain
  * partial+final hash agg on (window, type); sessionization is one
  * hash-partitioned sort per user (Window.partitionBy, never a global sort).
  */
object Events {

  private val TsFmt = "yyyy-MM-dd HH:mm:ss"

  /** EXACT distributed quantiles of `value` per event type — lower
    * quantile: the smallest v whose ≤-cumulative count reaches ⌈q·n⌉.
    * No approximation and no raw-row global sort: one corpus-sized
    * groupBy(type, value), a window over the DISTINCT-VALUE table, and a
    * broadcast of the per-type (q, target) pairs. Values are selected, not
    * computed, so the output is engine-exact; the only float op is ⌈q·n⌉,
    * identical IEEE everywhere. The percentile companion of the KMV sketch:
    * use this when exactness matters and value cardinality is bounded, the
    * sketch when it is not.
    *
    * @return (event_type, q, n, quantile) per type × requested quantile
    */
  def quantiles(events: DataFrame,
                qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), "qs must be in (0,1]")
    val g = events.groupBy(col("event_type").as("k"), col("value").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("k").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g.withColumn("cum", sum(col("cnt")).over(w))
    val t = g.groupBy("k").agg(sum(col("cnt")).as("n"))
      .select(col("k"), col("n"), explode(array(qs.map(lit(_)): _*)).as("q"))
      .withColumn("target", ceil(col("q") * col("n")).cast("long"))
    cum.join(broadcast(t), Seq("k"))
      .filter(col("cum") >= col("target"))
      .groupBy("k", "q")
      .agg(max(col("n")).as("n"), min(col("v")).as("quantile"))
      .select(col("k").as("event_type"), col("q"), col("n"), col("quantile"))
  }

  /** Per-type z-score OUTLIERS — the classic metric-anomaly flag, computed
    * so the decision predicate is EXACT INTEGER ARITHMETIC (no fp in the
    * filter, so the flagged set is bit-stable in any engine):
    * with per-type n, S = Σv, Q = Σv² over cent-scaled integer values,
    * z = (n·v − S) / √(n·Q − S²)  (the algebraic form of (v−μ)/σ with the
    * population σ — cent scaling cancels), and v is flagged when
    * (n·v − S)² > t²·(n·Q − S²), all DECIMAL(38,0). The reported z is the
    * one double division per flagged row (√ of an exact integer is
    * correctly-rounded IEEE). Degenerate all-equal types (σ = 0) flag
    * nothing. Returns (event_id, event_type, v_cents, z).
    *
    * Scale shape: one corpus-sized groupBy(event_type) with map-side
    * combine; the |types|-row stats table is BROADCAST back; the filter
    * prunes to the outlier set before anything else happens — no sort, no
    * second shuffle.
    */
  def zscoreOutliers(events: DataFrame, threshold: Int = 3): DataFrame = {
    require(threshold >= 1, s"bad threshold $threshold")
    val dec = "decimal(38,0)"
    val v = events.select(col("event_id"), col("event_type"),
      round(col("value") * 100.0).cast("long").as("v"))
    val stats = v.groupBy("event_type").agg(
      count(lit(1)).as("n"), sum(col("v")).as("s"),
      sum(col("v").cast(dec) * col("v")).as("q"))
    val num = col("n").cast(dec) * col("v") - col("s").cast(dec)
    val den2 = col("n").cast(dec) * col("q") - col("s").cast(dec) * col("s")
    v.join(broadcast(stats), Seq("event_type"))
      .filter(den2 > 0 && num * num > lit(threshold.toLong * threshold).cast(dec) * den2)
      .select(col("event_id"), col("event_type"), col("v").as("v_cents"),
        (num.cast("double") / sqrt(den2.cast("double"))).as("z"))
  }

  /** User-journey transition matrix — the Markov view of event flow: for
    * each ordered per-user pair of consecutive events, count (prev_type →
    * next_type) and report the row-conditional probability. Deterministic
    * order (ts, event_id) exactly like [[sessions]]; exact integer counts,
    * ONE division per cell — bit-identical in any engine. Returns
    * (prev_type, next_type, n, row_total, p), ≤ |types|² rows.
    *
    * Scale shape: one per-user window (keyed — never a global sort) over
    * the events, one groupBy on the pair table, and the |types|-row totals
    * broadcast back.
    */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
    val cnt = pairs
      .groupBy(col("prev").as("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy("prev_type").agg(sum(col("n")).as("row_total"))
    cnt.join(broadcast(tot), Seq("prev_type"))
      .select(col("prev_type"), col("next_type"), col("n"), col("row_total"),
        (col("n").cast("double") / col("row_total").cast("double")).as("p"))
  }

  /** Per-type CUSUM changepoint statistic over the hourly value series —
    * the classic drift detector (Page 1954): with hourly cent sums x_h,
    * H hours and S = Σx_h, the mean-centred one-sided CUSUM
    * C_h = max(0, C_{h-1} + (x_h − S/H)) is computed SCALED BY H so every
    * intermediate stays an exact integer: C'_h = max(0, C'_{h-1} +
    * (H·x_h − S)) — and the max(0,·) reset is rewritten with the standard
    * prefix identity C'_h = P_h − min(0, min_{j≤h} P_j) over the plain
    * prefix sums P_h, so BOTH engine and oracle are window-only (no fold,
    * no recursion). All DECIMAL(38,0); the argmax hour is deterministic
    * (earliest on ties). Returns one row per type:
    * (event_type, n_hours, s_cents, max_cusum, peak_hour) with max_cusum
    * in H-scaled cents.
    *
    * Scale shape: one corpus-sized groupBy(type, hour); every window runs
    * over the per-type DISTINCT-HOUR table (bounded by the time range,
    * corpus-size-independent), with the |types|-row totals broadcast.
    */
  def cusum(events: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val hourly = events.select(col("event_type"),
        date_format(date_trunc("hour", col("ts")), TsFmt).as("hour"),
        round(col("value") * 100.0).cast("long").as("v"))
      .groupBy("event_type", "hour").agg(sum(col("v")).as("x"))
    val tot = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("nh"), sum(col("x")).as("s"))
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = hourly.join(broadcast(tot), Seq("event_type"))
      .withColumn("pre", sum(col("nh").cast(dec) * col("x") - col("s")).over(w))
      .withColumn("c", col("pre") - least(lit(0L).cast(dec), min(col("pre")).over(w)))
    val pick = Window.partitionBy("event_type").orderBy(col("c").desc, col("hour"))
    c.withColumn("rk", row_number().over(pick)).filter(col("rk") === 1)
      .select(col("event_type"), col("nh").as("n_hours"), col("s").as("s_cents"),
        col("c").cast("long").as("max_cusum"), col("hour").as("peak_hour"))
  }

  /** Tumbling 1-hour window × event type: event count + value sum. Window
    * start is emitted as a formatted string so engine-vs-oracle timestamp
    * encodings can never diverge.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .select(date_format(col("window.start"), TsFmt).as("window_start"),
        col("event_type"), col("n"), round(col("sv"), 6).as("sum_value"))

  /** Gap-based sessionization: a new session starts after `gapMinutes` of
    * user inactivity. Deterministic order (ts, event_id); microsecond
    * arithmetic so the gap predicate is exact integer math.
    */
  def sessions(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    // parquet event times arrive as TIMESTAMP_NTZ; the session is pinned to
    // UTC, so the cast preserves the wall time (matching DuckDB's epoch_us)
    val tsUs = unix_micros(col("ts").cast("timestamp"))
    events
      .withColumn("prev", lag(tsUs, 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev").isNull || tsUs - col("prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("sum_value"),
        date_format(min(col("ts")), TsFmt).as("start_ts"))
  }

  /** Sequential funnel: users reaching stage i must hit `stages(i)` STRICTLY
    * AFTER their first qualifying hit of stage i−1 (the classic ordered
    * conversion funnel, not a bag-of-events one). One row per prefix:
    * (funnel_stage "a>b>…", users).
    *
    * Scale: each stage is one user-keyed aggregation joined against the
    * shrinking reached-set — stage tables are ≤ |users| rows, and the event
    * scan is filtered to one type before anything wide happens.
    */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val spark = events.sparkSession
    import spark.implicits._
    val e = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts").cast("timestamp")).as("t"))
    var reached = e.filter(col("event_type") === stages.head)
      .groupBy("user_id").agg(min(col("t")).as("t"))
    val out = scala.collection.mutable.ListBuffer(
      (stages.head, reached.count()))
    for ((st, i) <- stages.tail.zipWithIndex) {
      reached = e.filter(col("event_type") === st).as("e")
        .join(reached.as("r"),
          col("e.user_id") === col("r.user_id") && col("e.t") > col("r.t"))
        .groupBy(col("e.user_id").as("user_id")).agg(min(col("e.t")).as("t"))
      out += ((stages.take(i + 2).mkString(">"), reached.count()))
    }
    out.toSeq.toDF("funnel_stage", "users")
  }

  /** Day-grain retention cohorts: cohort = the user's first active day,
    * offset = days since it; (cohort_day, offset, active_users). The
    * standard DAU-retention triangle, two user/(cohort,offset)-keyed
    * aggregations.
    */
  def retention(events: DataFrame): DataFrame = {
    val first = events.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("cohort"))
    events.select(col("user_id"), to_date(col("ts")).as("d"))
      .join(first, Seq("user_id"))
      .groupBy(col("cohort"), datediff(col("d"), col("cohort")).as("offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("offset").cast("long").as("offset"), col("active_users"))
  }

  /** K-minimum-values distinct-count sketch per event type — the
    * bounded-memory cardinality estimator family (Bar-Yossef et al. 2002),
    * with an LCG hash so a SQL oracle replays the sketch EXACTLY: keep the k
    * smallest distinct hash values; if fewer than k exist the count is
    * exact, else est = (k−1)·P / kth_min. At scale the min-k fold is a
    * per-type aggregate over (type, user) pairs — nothing user-cardinality-
    * sized leaves the executors (the fixture uses the window form; the
    * estimate depends only on the k survivors either way).
    */
  def kmvDistinct(events: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val P = 1000000007L
    val du = events.select(col("event_type"), col("user_id")).distinct()
      .withColumn("h", (col("user_id") % P * 48271L + 11213L) % P)
    val w = Window.partitionBy("event_type").orderBy("h")
    du.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_kept"),
        max(when(col("rk") === k, col("h"))).as("kth"))
      .select(col("event_type"), col("n_kept"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * P / col("kth"), 6))
          .as("est_distinct"))
  }
}
