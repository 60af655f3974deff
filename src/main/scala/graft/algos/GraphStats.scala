package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-row structural profile of an undirected graph — the "know your
  * graph before you run on it" primitive (the reference surfaces the same
  * scalars piecemeal: GrB_Matrix_nvals / nrows, `GrB.entries 'degree'`,
  * LAGraph triangle count): vertex/edge counts, degree min/max/mean,
  * density, wedge count (Σ d(d-1)/2) and triangle count, and the global
  * clustering coefficient 3·tri/wedges.
  *
  * Plan shape: one canonical distinct pass, one degree aggregation with
  * every degree scalar partial-aggregated map-side, and [[TriangleCount]]'s
  * wedge-join count for tri — three shuffles total, all
  * output-row-bounded. Nothing here is quadratic except the triangle
  * wedge join tricount itself already pays.
  */
object GraphStats {

  def run(spark: SparkSession, edges: DataFrame): DataFrame = {
    val canon = edges.select(
        least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val und = canon.unionByName(canon.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy(col("a").as("id")).agg(count(lit(1)).as("deg"))

    val degStats = deg.agg(
      count(lit(1)).as("n"),
      min(col("deg")).as("min_deg"),
      max(col("deg")).as("max_deg"),
      sum(col("deg")).as("deg_sum"),
      sum(col("deg") * (col("deg") - 1) / 2).cast("double").as("wedges"))

    // triangles a<b<c: same wedge algebra as TriangleCount.run
    val e1 = canon.select(col("a").as("x"), col("b").as("y"))
    val e2 = canon.select(col("a").as("y2"), col("b").as("z"))
    val tris = e1.join(e2, col("y") === col("y2"))
      .select(col("x"), col("z"))
      .join(canon, col("x") === col("a") && col("z") === col("b"), "left_semi")
      .agg(count(lit(1)).as("triangles"))

    degStats.crossJoin(tris).select(
      col("n"),
      (col("deg_sum") / 2).cast("long").as("m"),
      col("min_deg"), col("max_deg"),
      (col("deg_sum").cast("double") / col("n")).as("avg_deg"),
      (col("deg_sum").cast("double") / (col("n").cast("double") * (col("n") - 1)))
        .as("density"),
      col("wedges").cast("long").as("wedges"),
      col("triangles"),
      when(col("wedges") > 0,
        lit(3.0) * col("triangles") / col("wedges")).otherwise(0.0)
        .as("global_cc"))
  }

  /** Newman modularity Q of a vertex labeling over an undirected graph:
    * Q = Σ_c [ e_c/m − (D_c/2m)² ] with e_c = intra-community edge count and
    * D_c = total degree of community c. One row:
    * (m, communities, intra_edges, modularity).
    *
    * Every aggregate is an INTEGER sum (edge counts, degree sums, ΣD_c² —
    * decimal-exact at any m), so the only floating-point step is the final
    * two-term expression — bit-identical at any partitioning and in any
    * engine that mirrors the expression (the SQL oracle does). Plan: one
    * canonical distinct, two label joins on the edge endpoints, one degree
    * agg — all equi-key, nothing quadratic.
    *
    * @param labels (id, label) — a community assignment (e.g. from
    *               [[LabelPropagation]] or [[ConnectedComponents]]); every
    *               edge endpoint must be labeled.
    */
  def modularity(spark: SparkSession, edges: DataFrame, labels: DataFrame): DataFrame = {
    val canon = edges.select(
        least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val la = labels.select(col("id").as("a"), col("label").as("la"))
    val lb = labels.select(col("id").as("b"), col("label").as("lb"))
    val tagged = canon.join(la, Seq("a")).join(lb, Seq("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val und = tagged.select(col("la").as("l"))
      .unionByName(tagged.select(col("lb").as("l")))
    // D_c as exact longs; ΣD_c² in decimal so 100 TB degree sums can't wrap
    val perC = und.groupBy("l").agg(count(lit(1)).as("dc"))
    val agg = perC.agg(
      count(lit(1)).as("communities"),
      sum(col("dc").cast("decimal(38,0)") * col("dc")).as("sum_dc2"))
    val intra = tagged.agg(
      count(lit(1)).as("m"),
      sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("intra_edges"))

    val out = intra.crossJoin(agg).select(
      col("m"), col("communities"), col("intra_edges"),
      (col("intra_edges").cast("double") / col("m") -
        col("sum_dc2").cast("double") /
          (lit(4.0) * col("m").cast("double") * col("m").cast("double")))
        .as("modularity"))
    out.cache(); out.count(); tagged.unpersist(false)
    out
  }

  /** Per-community conductance of a labeling — the cut-quality companion to
    * [[modularity]]: φ(C) = cut(C) / min(vol(C), 2m − vol(C)), with cut(C)
    * the boundary-edge count and vol(C) the degree sum inside C (each
    * boundary edge counts toward BOTH its communities' cuts). Low φ = a
    * well-separated community; φ(whole graph) is emitted as 0 (the min is
    * 0). One pass tags each canonical edge with both endpoint labels; vol
    * and cut are two label-keyed aggregations — no per-vertex shuffle
    * beyond the label join, exact integer counts, one mirrored float
    * division. Output: (label, vol, cut, conductance).
    */
  def conductance(spark: SparkSession, edges: DataFrame,
                  labels: DataFrame): DataFrame = {
    val canon = edges.select(
        least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val la = labels.select(col("id").as("a"), col("label").as("la"))
    val lb = labels.select(col("id").as("b"), col("label").as("lb"))
    val tagged = canon.join(la, Seq("a")).join(lb, Seq("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = tagged.count()

    val vol = tagged.select(col("la").as("l"))
      .unionByName(tagged.select(col("lb").as("l")))
      .groupBy("l").agg(count(lit(1)).as("vol"))
    val boundary = tagged.filter(col("la") =!= col("lb"))
    val cut = boundary.select(col("la").as("l"))
      .unionByName(boundary.select(col("lb").as("l")))
      .groupBy("l").agg(count(lit(1)).as("cut"))

    val denom = least(col("vol"), lit(2L * m) - col("vol"))
    val out = vol.join(cut, Seq("l"), "left")
      .select(col("l").as("label"), col("vol"),
        coalesce(col("cut"), lit(0L)).as("cut"),
        when(denom === 0L, lit(0.0))
          .otherwise(coalesce(col("cut"), lit(0L)).cast("double")
            / denom.cast("double")).as("conductance"))
    out.cache(); out.count(); tagged.unpersist(false)
    out
  }

  /** ACL-style SWEEP CUT — the conductance profile of a vertex ordering
    * (Andersen-Chung-Lang local clustering: order vertices by a score,
    * usually a personalized-PageRank vector normalized by degree, and scan
    * prefixes S_1 ⊂ S_2 ⊂ … reporting φ(S_k); the best prefix is the local
    * cluster certificate). Ordering is (score DESC, id ASC) — ties
    * deterministic. For prefix S_k: vol = Σ deg, internal = #edges with BOTH
    * endpoints ranked ≤ k (an edge enters exactly at the LATER endpoint's
    * rank — so the edge pass is one groupBy(max(ra,rb)), never per-prefix),
    * cut = vol − 2·internal, φ = cut / min(vol, 2m − vol).
    *
    * Plan shape at scale: the global order comes from [[graft.core.Ranking]]
    * (range-partition + per-partition index — no single-task window); the
    * two running sums are textbook two-level scans (per-range window +
    * broadcast range offsets, same shape as TextStats.packSequences); the
    * edge pass is one join to the rank table and one groupBy. Everything is
    * exact integer arithmetic except the one final division.
    *
    * @param scores (id, score) — must cover every vertex incident to edges;
    *               integral scores make the output engine-exact
    * @return (pos, id, score, vol, cut, conductance), pos 1-based
    */
  def sweepCut(spark: SparkSession, edges: DataFrame, scores: DataFrame,
               rangeSize: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val canon = edges.select(
        least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = canon.count()

    val ranked = graft.core.Ranking.denseRank(
        scores.select(col("id"), col("score"), (-col("score")).as("neg")),
        "rk0", "neg", "id")
      .select(col("id"), col("score"), (col("rk0") + 1).as("rank"),
        expr(s"rk0 DIV ${rangeSize}L").as("rng"))

    val deg = canon.select(col("a").as("id")).unionByName(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val ehist = canon
      .join(ranked.select(col("id").as("a"), col("rank").as("ra")), Seq("a"))
      .join(ranked.select(col("id").as("b"), col("rank").as("rb")), Seq("b"))
      .groupBy(greatest(col("ra"), col("rb")).as("rank"))
      .agg(count(lit(1)).as("icnt"))
    val base = ranked.join(deg, Seq("id"), "left")
      .withColumn("deg", coalesce(col("deg"), lit(0L)))
      .join(ehist, Seq("rank"), "left")
      .withColumn("icnt", coalesce(col("icnt"), lit(0L)))

    val w = Window.partitionBy("rng").orderBy("rank")
    val local = base
      .withColumn("ldeg", sum(col("deg")).over(w))
      .withColumn("lint", sum(col("icnt")).over(w))
    val w2 = Window.orderBy("rng").rowsBetween(Window.unboundedPreceding, -1)
    val offs = base.groupBy("rng")
      .agg(sum("deg").as("dtot"), sum("icnt").as("itot"))
      .withColumn("doff", coalesce(sum(col("dtot")).over(w2), lit(0L)))
      .withColumn("ioff", coalesce(sum(col("itot")).over(w2), lit(0L)))
      .select("rng", "doff", "ioff")

    val vol = col("doff") + col("ldeg")
    val cut = vol - lit(2L) * (col("ioff") + col("lint"))
    val denom = least(vol, lit(2L * m) - vol)
    val out = local.join(broadcast(offs), Seq("rng"))
      .select(col("rank").as("pos"), col("id"), col("score"),
        vol.as("vol"), cut.as("cut"),
        when(denom === 0L, lit(0.0))
          .otherwise(cut.cast("double") / denom.cast("double")).as("conductance"))
    out.cache(); out.count(); canon.unpersist(false)
    out
  }

  /** Degree assortativity r of an undirected graph: the Pearson correlation
    * of (deg(u), deg(v)) over the DIRECTED pair list (each edge both ways —
    * Newman 2002's definition; r∈[-1,1], −1 for a star, +1 for
    * degree-homogeneous unions of cliques). One row: (pairs, assortativity).
    *
    * All five moment sums (Σx, Σy, Σxy, Σx², Σy²) are sums of integer
    * products taken in decimal(38,0) — EXACT and order-independent at any
    * parallelism (a double Σx² over 10¹² hub pairs is neither), so the
    * result is engine-identical down to the final double division. Degrees
    * come from one agg; the pair list is two co-keyed joins.
    */
  def assortativity(spark: SparkSession, edges: DataFrame): DataFrame = {
    val canon = edges.select(
        least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val und = canon.unionByName(canon.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy(col("a").as("id")).agg(count(lit(1)).as("deg"))
    val pairs = und
      .join(deg.select(col("id").as("a"), col("deg").as("x")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("y")), Seq("b"))

    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    pairs.agg(
        count(lit(1)).as("n"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * col("y")).as("sxy"),
        sum(dec(col("x")) * col("x")).as("sxx"),
        sum(dec(col("y")) * col("y")).as("syy"))
      .select(col("n").as("pairs"), {
        val num = col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")
        val den = sqrt((col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) *
          (col("n").cast("double") * col("syy").cast("double") -
            col("sy").cast("double") * col("sy").cast("double")))
        // a degree-regular graph has zero variance: r is 0/0 — report NaN
        // explicitly (ANSI mode would otherwise raise DIVIDE_BY_ZERO)
        when(den =!= 0.0, num / den).otherwise(lit(Double.NaN))
          .as("assortativity")
      })
  }

  /** Per-vertex distance statistics over an UNDIRECTED graph from a set of
    * landmark sources, batched through [[MSBFS]] (64 traversals per wave):
    * (id, reached, sum_dist, harmonic, closeness, ecc) where, over the
    * sources that reach v (excluding v itself),
    *
    *   - reached    = how many sources reach v
    *   - sum_dist   = Σ d(s,v)                      (exact integer)
    *   - harmonic   = Σ 1/d(s,v)     — harmonic centrality (Boldi-Vigna's
    *                  recommended centrality for disconnected web graphs)
    *   - closeness  = reached/sum_dist — classic closeness (0 if isolated)
    *   - ecc        = max d(s,v)     — eccentricity within the landmark set
    *
    * With sources = ALL vertices these are the exact textbook centralities
    * (what the oracle mirrors at test scale); at 100 TB you pass k sampled
    * landmarks and these become the standard Eppstein-Wang estimators with
    * the same code path — ceil(k/64) MSBFS waves, never an all-pairs join.
    * Every aggregate except harmonic/closeness is integer-exact; those two
    * are one float expression over integer-derived terms, mirrored by the
    * SQL oracle and rounded on both sides.
    */
  /** [[distanceStats]] with sources = EVERY vertex of the graph, without
    * materializing the vertex set on the driver: the ids stay a DataFrame
    * end to end ([[MSBFS.runFrom]] derives wave membership from a
    * distributed dense rank; the driver sees one count). Exact all-vertex
    * centralities are inherently O(n·m) — at scale prefer sampled landmarks
    * through [[distanceStats]]; this entry point just removes the O(n)
    * driver state from the exact path.
    */
  def distanceStatsAll(spark: SparkSession, edges: DataFrame): DataFrame = {
    val und = undirect(edges)
    val verts = und.select(col("src").as("id")).distinct()
    aggDistances(MSBFS.runFrom(spark, und, verts))
  }

  def distanceStats(spark: SparkSession, edges: DataFrame,
                    sources: Seq[Long]): DataFrame =
    aggDistances(MSBFS.run(spark, undirect(edges), sources))

  /** Double-sweep BFS diameter lower bound (Magnien-Latapy-Habib, the
    * standard cheap diameter estimator for web-scale graphs): BFS from a
    * seed, then BFS again from the farthest vertex found — the second
    * sweep's eccentricity lower-bounds the diameter (exact on trees,
    * empirically tight on web graphs). Two O(m) level-synchronous BFS
    * passes; the only driver state is the ONE (id, level) row of the first
    * sweep's argmax, determinized as (max level, min id).
    *
    * @return one row (seed, far_id, far_level, diameter_lb)
    */
  def doubleSweepDiameter(spark: SparkSession, edges: DataFrame,
                          seed: Long): DataFrame = {
    val und = undirect(edges)
    val b1 = BFS.run(spark, und, source = seed)
    val far = b1.orderBy(col("level").desc, col("id")).limit(1).collect()(0)
    val (farId, farLevel) = (far.getLong(0), far.getInt(1))
    BFS.run(spark, und, source = farId)
      .agg(max(col("level")).as("diameter_lb"))
      .select(lit(seed).as("seed"), lit(farId).as("far_id"),
        lit(farLevel).as("far_level"), col("diameter_lb"))
  }

  /** Canonicalize to a loop-free undirected (symmetric) edge list. */
  private def undirect(edges: DataFrame): DataFrame = {
    val canon = edges.select(
        least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    canon.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(canon.select(col("b").as("src"), col("a").as("dst")))
  }

  /** Fold (id, src, dist) MSBFS rows into the per-vertex centrality row. */
  private def aggDistances(d: DataFrame): DataFrame = {
    d.groupBy("id").agg(
        sum(when(col("dist") > 0, 1L).otherwise(0L)).as("reached"),
        sum(col("dist")).as("sum_dist"),
        sum(when(col("dist") > 0, lit(1.0) / col("dist")).otherwise(0.0))
          .as("harmonic"),
        max(col("dist")).as("ecc"))
      .select(col("id"), col("reached"), col("sum_dist"),
        col("harmonic"),
        when(col("sum_dist") > 0,
          col("reached").cast("double") / col("sum_dist")).otherwise(0.0)
          .as("closeness"),
        col("ecc"))
  }

  /** Reciprocity of a DIRECTED graph: the fraction of directed edges whose
    * reverse edge also exists (the standard web/social-graph mutuality
    * scalar). One row: (m, reciprocal, reciprocity). One self-semi-join on
    * the reversed key — integer-exact counts, one mirrored division.
    */
  def reciprocity(spark: SparkSession, edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rec = e.join(
        e.select(col("dst").as("src"), col("src").as("dst")), Seq("src", "dst"),
        "left_semi")
      .agg(count(lit(1)).as("reciprocal"))
    val out = e.agg(count(lit(1)).as("m")).crossJoin(rec)
      .select(col("m"), col("reciprocal"),
        (col("reciprocal").cast("double") / col("m")).as("reciprocity"))
    out.cache(); out.count(); e.unpersist(false)
    out
  }

  /** Quotient (contracted) graph: collapse vertices by a (id, grp) mapping
    * and sum parallel edges — the page→host / page→domain coarsening every
    * web-graph pipeline runs before host-level PageRank, and the contraction
    * step of multi-level methods ([[Louvain]] does the same internally with
    * its community labels). Output: (gsrc, gdst, weight = original edge
    * count), self-loops dropped unless `keepSelfLoops` (Louvain-style
    * contraction keeps them — intra-group mass).
    *
    * Scale: two per-edge equi-joins against the mapping (shuffle on vertex
    * id — co-partitioned if the edge table is already id-bucketed) and one
    * partially-aggregated groupBy on the group pair; output is bounded by
    * the quotient's edge count, never the input's.
    */
  def contract(spark: SparkSession, edges: DataFrame, mapping: DataFrame,
               keepSelfLoops: Boolean = false): DataFrame = {
    val m = mapping.select(col("id"), col("grp"))
    val g = edges.select(col("src"), col("dst"))
      .join(m.select(col("id").as("src"), col("grp").as("gsrc")), Seq("src"))
      .join(m.select(col("id").as("dst"), col("grp").as("gdst")), Seq("dst"))
    val q = if (keepSelfLoops) g else g.filter(col("gsrc") =!= col("gdst"))
    q.groupBy("gsrc", "gdst").agg(count(lit(1)).as("weight"))
  }

  /** Degree distribution of a DIRECTED graph: one row per (side, degree)
    * with the vertex count — side ∈ {in, out}. The web-graph power-law
    * diagnostic; exact integers, two aggregations, output bounded by the
    * number of DISTINCT degrees (≈ thousands even at 10¹² edges under a
    * power law — never a per-vertex table).
    */
  def degreeHistogram(spark: SparkSession, edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    def side(key: String, name: String) =
      e.groupBy(col(key).as("id")).agg(count(lit(1)).as("deg"))
        .groupBy(col("deg")).agg(count(lit(1)).as("vertices"))
        .select(lit(name).as("side"), col("deg"), col("vertices"))
    side("src", "out").unionByName(side("dst", "in"))
  }

  /** Rich-club coefficient φ(k) for every distinct degree value k: among
    * the n_k vertices of degree > k, the realized fraction of the
    * n_k·(n_k−1)/2 possible undirected edges (Zhou & Mondragón's web-graph
    * "rich club" diagnostic). Scale shape: one degree aggregation and one
    * edge-degree join at data size; everything after is HISTOGRAM-sized
    * (distinct degree values), so the theta joins below broadcast.
    */
  def richClub(spark: SparkSession, edges: DataFrame): DataFrame = {
    val canon = edges.select(
        least(col("src"), col("dst")).as("lo"), greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = canon.select(col("lo").as("id"))
      .unionByName(canon.select(col("hi").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hist = deg.groupBy("deg").agg(count(lit(1)).as("nv"))
    // per-edge min endpoint degree, histogram'd
    val em = canon
      .join(deg.select(col("id").as("lo"), col("deg").as("dlo")), Seq("lo"))
      .join(deg.select(col("id").as("hi"), col("deg").as("dhi")), Seq("hi"))
      .select(least(col("dlo"), col("dhi")).as("m"))
      .groupBy("m").agg(count(lit(1)).as("ne"))
    val ks = hist.select(col("deg").as("k"))
    val nk = ks.join(hist, col("deg") > col("k"))
      .groupBy("k").agg(sum(col("nv")).as("nk"))
    val ek = ks.join(em, col("m") > col("k"), "left")
      .groupBy("k").agg(coalesce(sum(col("ne")), lit(0L)).as("ek"))
    val res = nk.join(ek, Seq("k")).filter(col("nk") >= 2)
      .select(col("k"), col("nk"), col("ek"),
        round(lit(2.0) * col("ek") / (col("nk").cast("double") * (col("nk") - 1)), 6)
          .as("phi"))
    val cut = graft.core.Iterate.cut(res)
    canon.unpersist(false); deg.unpersist(false)
    cut
  }

  /** Discrete power-law exponent MLE for the degree distribution
    * (Clauset-Shalizi-Newman 2009, eq. 3.7 approximation):
    * α ≈ 1 + n / Σ_{d ≥ dmin} ln(d / (dmin − ½)) — the standard estimate of
    * the web graph's degree exponent (the quantity the R-MAT generator's
    * skew is calibrated against). Undirected degrees; one row
    * (dmin, n_tail, alpha). The log-sum is a double aggregate over the
    * degree TABLE (vertex-sized, not edge-sized); n_tail/dmin are exact
    * integers, alpha one mirrored float rounded on both sides.
    */
  def powerLawAlpha(spark: SparkSession, edges: DataFrame,
                    dmin: Long = 2L): DataFrame = {
    require(dmin >= 1, "dmin must be >= 1")
    val canon = edges.select(
        least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val und = canon.unionByName(canon.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy(col("a").as("id")).agg(count(lit(1)).as("deg"))
    deg.filter(col("deg") >= dmin)
      .agg(count(lit(1)).as("n"),
        sum(log(col("deg").cast("double") / (dmin - 0.5))).as("s"))
      .select(lit(dmin).as("dmin"), col("n").as("n_tail"),
        round(lit(1.0) + col("n").cast("double") / col("s"), 6).as("alpha"))
  }

  /** Hub-removal percolation (targeted-attack robustness): for each `pct`
    * (integer percent of vertices), remove the `k = n·pct/100` (integer
    * division) highest-degree vertices — ties broken by smallest id — and
    * report the surviving structure: giant-component size, component count,
    * and stranded singletons. The classic web-graph resilience curve
    * (Albert-Jeong-Barabási attack tolerance; the bow-tie's CORE is what
    * hub removal shreds).
    *
    * Output: one row per pct — (pct, removed, giant, comps, singletons),
    * all exact integers. `singletons` = surviving vertices incident to no
    * surviving edge; `giant`/`comps` are over surviving-edge vertices only
    * (an empty survivor graph reports 0/0).
    *
    * Spark shape per pct: distributed top-k hubs (TakeOrderedAndProject —
    * k rows, broadcast into two anti-joins; never a global row_number
    * window), then one FastSV components run (O(log n) rounds — hub
    * removal RAISES the diameter, so min-propagation would be the wrong
    * loop here) and output-row-bounded aggregates. The curve costs
    * |pcts| component runs — exactly what it costs on a cluster. At a
    * scale where k itself is huge, swap the exact top-k for a degree
    * threshold from approxQuantile; the fixture keeps exact-rank
    * semantics so the oracle can mirror it.
    */
  def percolation(spark: SparkSession, edges: DataFrame,
                  pcts: Seq[Int] = Seq(0, 5, 10, 20)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 0 && p <= 100), "pcts in [0,100]")
    import spark.implicits._
    val canon = edges.select(
        least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val und = canon.unionByName(canon.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy(col("a").as("id")).agg(count(lit(1)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = deg.count()
    val rows = pcts.map { p =>
      val k = n * p / 100
      val hubs = deg.orderBy(col("deg").desc, col("id")).limit(k.toInt)
        .select(col("id"))
      val surv = canon
        .join(broadcast(hubs.select(col("id").as("a"))), Seq("a"), "left_anti")
        .join(broadcast(hubs.select(col("id").as("b"))), Seq("b"), "left_anti")
      val comp = ConnectedComponents.run(spark,
        surv.select(col("a").as("src"), col("b").as("dst")), fastsv = true)
      val sizes = comp.groupBy("comp").agg(count(lit(1)).as("sz"))
      val agg = sizes.agg(
        coalesce(sum(col("sz")), lit(0L)).as("survivors"),
        coalesce(max(col("sz")), lit(0L)).as("giant"),
        count(lit(1)).as("comps")).collect()(0)
      val survivors = agg.getLong(0)
      (p.toLong, k, agg.getLong(1), agg.getLong(2), n - k - survivors)
    }
    canon.unpersist(false); deg.unpersist(false)
    rows.toDF("pct", "removed", "giant", "comps", "singletons")
  }

  /** Exact hop plot: the distance histogram over ALL ordered reachable
    * pairs (s ≠ v) of the undirected graph — (dist, pairs, cum_pairs).
    * This is the exact quantity [[ANF]] sketches at scale (neighborhood
    * function N(h) = cum_pairs at h); at fixture scale the exact answer is
    * cheap and gives the approximate path its oracle twin.
    *
    * Spark shape: one [[MSBFS]] run seeded at every vertex (⌈n/64⌉
    * bitmask waves over the same cached adjacency — never an n² state
    * join), one histogram aggregation, and a cumulative window over the
    * histogram ROWS (≤ diameter of them, so the unpartitioned window is
    * output-bounded, not data-bounded).
    */
  def hopPlot(spark: SparkSession, edges: DataFrame): DataFrame = {
    val canon = edges.select(
        least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val und = canon.unionByName(canon.select(col("b").as("a"), col("a").as("b")))
      .select(col("a").as("src"), col("b").as("dst"))
    // sources stay a FRAME (runFrom derives wave membership distributively)
    // — the driver never holds the O(n) vertex list
    val verts = und.select(col("src").as("id")).distinct()
    val dists = MSBFS.runFrom(spark, und, verts).filter(col("dist") > 0)
    val hist = dists.groupBy(col("dist")).agg(count(lit(1)).as("pairs"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("dist")).rowsBetween(Long.MinValue, 0)
    hist.select(col("dist"), col("pairs"),
      sum(col("pairs")).over(w).as("cum_pairs")).orderBy("dist")
  }

  /** Effective diameter (the web-measurement standard: smallest h that
    * covers ≥ pct% of all reachable ordered pairs) + the true diameter,
    * read EXACTLY off the [[hopPlot]] histogram. The pct selection is pure
    * integer arithmetic (100·cum ≥ pct·total — no fp percentile anywhere),
    * so any engine reproduces the row bit-for-bit. One row
    * (total_pairs, eff_diameter, diameter).
    *
    * Scale shape: everything after the MSBFS histogram runs on ≤ diameter
    * rows; the totals are 1-row broadcasts.
    */
  def effectiveDiameter(spark: SparkSession, edges: DataFrame,
                        pct: Int = 90): DataFrame = {
    require(pct >= 1 && pct <= 100, s"bad pct $pct")
    val hp = hopPlot(spark, edges)
    val tot = hp.agg(sum(col("pairs")).as("total_pairs"))
    val eff = hp.crossJoin(broadcast(tot))
      .filter(col("cum_pairs") * 100L >= col("total_pairs") * pct.toLong)
      .agg(min(col("dist")).as("eff_diameter"))
    val dm = hp.agg(max(col("dist")).as("diameter"))
    tot.crossJoin(eff).crossJoin(dm)
  }

  /** k-hop ego network: the subgraph INDUCED on all vertices within `hops`
    * undirected steps of the seed set — the standard neighborhood-feature
    * extraction primitive (and the "crawl frontier around a site" view).
    * `hops` is a small constant, so the ball is grown by `hops` unrolled
    * frontier semi-joins (no fixpoint machinery), then the canonical edge
    * list is filtered by two semi-joins. Output: canonical (src, dst)
    * induced edges. At scale the ball stays ball-sized — the full edge set
    * is touched only by the final co-keyed semi-joins.
    */
  def egoNet(spark: SparkSession, edges: DataFrame, seeds: Seq[Long],
             hops: Int): DataFrame = {
    require(hops >= 0, "hops must be >= 0")
    import spark.implicits._
    val canon = edges.select(
        least(col("src"), col("dst")).as("lo"), greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val und = canon.unionByName(canon.select(col("hi").as("lo"), col("lo").as("hi")))
    var ball = seeds.toDF("id")
    for (_ <- 1 to hops)
      ball = ball.unionByName(
        und.join(ball.select(col("id").as("lo")), Seq("lo"), "left_semi")
          .select(col("hi").as("id"))).distinct()
    val out = canon
      .join(ball.select(col("id").as("lo")), Seq("lo"), "left_semi")
      .join(ball.select(col("id").as("hi")), Seq("hi"), "left_semi")
      .select(col("lo").as("src"), col("hi").as("dst"))
    out.cache(); out.count()
    canon.unpersist(false)
    out
  }
}
