package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{GBMatrix, Iterate, Semiring}

/** Physical-plan shape assertions: the properties the 100 TB story depends
  * on, checked against the ACTUAL executed plans (not hopes): column pruning
  * and predicate pushdown reach the parquet scan, the loop-state join runs
  * without a shuffle, masks sit below aggregations, small sides broadcast.
  */
class PlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Final physical plan string (execute first so AQE settles). */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("lineitem scan prunes to the two referenced columns") {
    val plan = finalPlan(SparkEntry.edgesBi(spark, sf))
    val scan = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scan.contains("l_suppkey") && scan.contains("l_partkey"), scan)
    assert(!scan.contains("l_quantity") && !scan.contains("l_orderkey"),
      s"scan reads more than the projection needs: $scan")
  }

  test("extractRange predicates push below the build aggregation to the scan") {
    val df = GBMatrix(SparkEntry.edgesBi(spark, sf))
      .extractRange(1, 5, SparkEntry.PartOffset + 1, SparkEntry.PartOffset + 50).df
    val plan = finalPlan(df)
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    // the src range is a group key: Catalyst must push it through the groupBy
    // into the parquet scan
    assert(pushed.contains("l_suppkey"), s"no pushed filter on l_suppkey: $pushed")
  }

  test("cutKeyed loop-state join is exchange-free (declared partitioning)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // disable auto-broadcast so the join exercises the co-partitioned
    // shuffle-hash path the loops rely on at scale
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val parts = 4
      val adj = (1L to 400L).map(i => (i % 50, i % 37)).toDF("src", "dst")
        .repartition(parts, col("src")).cache()
      adj.count()
      val state = Iterate.cutKeyed(
        (0L until 50L).map(i => (i, i * 2.0)).toDF("id", "v"), parts, "id")
      val j = adj.join(state.select(col("id").as("src"), col("v")), Seq("src"))
      j.collect()
      val exec = j.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // the cache's one-time setup repartition lives INSIDE the
      // InMemoryRelation (a leaf here); the JOIN itself must add no shuffle
      val shuffles = exec.collect {
        case s: ShuffleExchangeLike => s
        case q: ShuffleQueryStageExec => q
      }
      assert(shuffles.isEmpty, s"state join re-shuffled:\n$exec")
      adj.unpersist()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("masked mxm: the mask semi-join sits BELOW the aggregation") {
    val a = toMatrix(sprand(10, 0.4, 31L))
    val m = toMatrix(sprand(10, 0.3, 32L))
    val plan = finalPlan(a.mxm(a.transpose, Semiring.PlusPair, Some(m)).df)
    val aggAt = plan.indexOf("HashAggregate")
    val semiAt = plan.indexOf("Semi")
    assert(aggAt >= 0 && semiAt >= 0, plan)
    assert(aggAt < semiAt, // parents print before children: agg above semi
      s"mask semi-join is not below the aggregation:\n$plan")
  }

  // AQE wraps stages in (Result/Shuffle)QueryStage nodes whose plans are not
  // `children`, so count "Exchange" lines in the printed final plan instead
  // of collecting node instances.
  private def exchangeCount(df: DataFrame): Int =
    finalPlan(df).split("== Initial Plan ==")(0) // AQE prints both plans
      // tree-drawing prefix includes ':' on non-last-child branches
      .linesIterator.count(_.replaceAll("^[\\s:+-]*", "").startsWith("Exchange"))

  test("simhash is a pure projection: zero exchanges") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val df = graft.pipeline.Dedup.simhash(docs)
    assert(exchangeCount(df) == 0, s"simhash shuffled:\n${finalPlan(df)}")
  }

  test("charEntropy and ttr are pure projections: zero exchanges") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val ent = graft.pipeline.TextStats.charEntropy(docs)
    assert(exchangeCount(ent) == 0, s"charEntropy shuffled:\n${finalPlan(ent)}")
    val t = graft.pipeline.TextStats.ttr(docs)
    assert(exchangeCount(t) == 0, s"ttr shuffled:\n${finalPlan(t)}")
  }

  test("snapshotDiff: one hash-join exchange pair, contents reduced to sha before the join") {
    import graft.corpus.Corpus
    val d = Corpus.snapshotDiff(Corpus.synthesizeArith(spark, 200),
      Corpus.synthesizeArithV2(spark, 200, nNew = 20))
    // full-outer on (repo,path): at most one exchange per side, never more
    assert(exchangeCount(d) <= 2, s"snapshotDiff over-shuffled:\n${finalPlan(d)}")
    // the join's output carries shas, not contents: content is consumed by
    // the projection below the exchange (sha256 computed scan-side)
    val plan = finalPlan(d)
    val joinLine = plan.linesIterator.find(_.contains("SortMergeJoin")).orElse(
      plan.linesIterator.find(_.contains("HashJoin"))).getOrElse("")
    assert(!joinLine.contains("content"),
      s"contents cross the join:\n$joinLine")
  }

  test("zscoreOutliers: one stats exchange, the per-event join broadcasts") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val df = graft.pipeline.Events.zscoreOutliers(ev)
    val plan = finalPlan(df)
    // one groupBy(event_type) shuffle for the stats; the |types|-row stats
    // table must come BACK as a broadcast, never a second shuffle
    assert(exchangeCount(df) <= 2, s"zscore over-shuffled:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"stats join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"stats join sort-merged:\n$plan")
  }

  test("domainMix: grouping exchanges only, no global sort anywhere") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val df = graft.pipeline.TextStats.domainMix(docs)
    val plan = finalPlan(df)
    // perSrc grouping feeds both the fold and the final join; the denom is
    // a 1-row broadcast — a Sort would mean a global ordering crept in
    assert(exchangeCount(df) <= 4, s"domainMix over-shuffled:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"denominator join sort-merged:\n$plan")
  }

  test("minhash signatures: exactly one exchange (the per-doc grouping)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val df = graft.pipeline.Dedup.minhashSignatures(
      graft.pipeline.Dedup.shingles(docs))
    assert(exchangeCount(df) == 1,
      s"expected the single groupBy(doc_id) exchange:\n${finalPlan(df)}")
  }

  test("fanout sampling has no global window (two salted aggregations)") {
    val e = SparkEntry.edgesArithDirected(spark, sf)
    val df = graft.algos.NeighborSample.fanout(spark, e, k = 2)
    val plan = finalPlan(df)
    assert(!plan.contains("Window"),
      s"fanout must never funnel a hub through a window:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected the salted collect_list aggregations:\n$plan")
  }

  test("brute-force ANN broadcasts the query side") {
    val e = spark.read.parquet(s"$sf/../sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 3)
    val plan = finalPlan(
      graft.pipeline.Similarity.bruteForceTopK(e, q, k = 3))
    assert(plan.contains("Broadcast"), s"query side not broadcast:\n$plan")
  }

  test("node2vec walk plan: equi-joins only, cached adjacency reused") {
    import spark.implicits._
    val es = (0L until 60L).flatMap(i => Seq((i, (i * 2 + 1) % 60), (i, (i * 3 + 7) % 60)))
      .filter(e => e._1 != e._2)
    val df = es.toDF("src", "dst").withColumn("w", lit(1.0))
    val starts = es.map(_._1).distinct.toDF("id")
    val out = graft.algos.Node2Vec.run(spark, df, starts, steps = 3)
    val plan = finalPlan(out)
    // the weight classes come from an equi-join on the canonical pair and a
    // frontier-sized window — never a cartesian (the printed exchange count
    // is NOT meaningful here: each union branch re-prints the shared hop
    // lineage, so it grows quadratically in the printout while execution
    // reuses the cached adjacency and deduped exchanges)
    assert(!plan.contains("CartesianProduct"), s"cartesian in walk plan:\n$plan")
    assert(plan.contains("InMemoryTableScan"),
      s"ranked adjacency not served from cache:\n$plan")
  }

  test("dupSpans: per-doc window only, heavy grams semi-joined") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val df = graft.pipeline.TextStats.dupSpans(docs, w = 7, minCount = 2L)
    val plan = finalPlan(df)
    // every windowspec is doc-partitioned — the span merge never sorts the
    // corpus globally
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("doc_id")),
      s"non-doc-partitioned window in:\n$plan")
    assert(plan.contains("LeftSemi"),
      s"heavy-gram filter should be a semi-join:\n$plan")
  }

  test("pmiBigrams: zero-shuffle pair generation, 1-row totals broadcast") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val plan = finalPlan(graft.pipeline.TextStats.pmiBigrams(docs))
    assert(!plan.contains("Window"), s"no window belongs in PMI:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"1-row totals must broadcast:\n$plan")
    val cartesians = plan.linesIterator
      .count(_.replaceAll("^[\\s:+-]*", "").startsWith("CartesianProduct"))
    assert(cartesians == 0, s"cartesian in PMI plan:\n$plan")
  }

  test("quantiles: cumulative window is per-key, targets broadcast") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val plan = finalPlan(graft.pipeline.Events.quantiles(ev))
    // the only windows run over the DISTINCT-VALUE table partitioned by key
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.startsWith("k#")),
      s"global (non-key) window in quantiles:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"(q, target) pairs must broadcast onto the histogram:\n$plan")
  }

  test("sweepCut: range-prefix windows only, range offsets broadcast") {
    val e = SparkEntry.edgesArith(spark, sf)
    val deg = e.select(col("src").as("id")).unionByName(e.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("score"))
    val plan = finalPlan(
      graft.algos.GraphStats.sweepCut(spark, e, deg, rangeSize = 64))
    // the per-vertex running sums are two-level: rng-partitioned local
    // windows plus one tiny window over the range-offset table
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("rng")),
      s"non-range window in sweepCut:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"range offsets must broadcast:\n$plan")
  }

  test("bigramLogProb: vocab and count tables broadcast, no cartesian blowup") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val plan = finalPlan(
      graft.pipeline.TextStats.bigramLogProb(docs, vocabSize = 20))
    assert(plan.contains("BroadcastHashJoin"),
      s"count sides should broadcast:\n$plan")
    // the only product with no join keys is the 1-row totals crossJoin
    val cartesians = plan.linesIterator
      .count(_.replaceAll("^[\\s:+-]*", "").startsWith("CartesianProduct"))
    assert(cartesians == 0, s"cartesian in LM plan:\n$plan")
  }

  test("bm25Multi: query set broadcast, per-query top-k is WindowGroupLimit") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val qs: Seq[(Long, Seq[String])] =
      Seq(1L -> Seq("spark", "join"), 2L -> Seq("merge", "sort"))
    val plan = finalPlan(graft.pipeline.TextStats.bm25Multi(docs, qs, topK = 20))
    assert(plan.contains("BroadcastHashJoin"),
      s"the query-term and df sides must broadcast:\n$plan")
    // Spark 4 plans rank-limit filters as WindowGroupLimit: per-partition
    // top-k heads flow into the final per-query window — the ranking never
    // globally sorts a query's full candidate set
    assert(plan.contains("WindowGroupLimit"),
      s"rk <= topK must plan as WindowGroupLimit:\n$plan")
  }

  test("pqTopKLcg: codebook broadcast, codes from cache, no cartesian") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") < 3)
    val plan = finalPlan(
      graft.pipeline.Similarity.pqTopKLcg(e, q, k = 3, m = 4, ksub = 4))
    // the m·ksub-row codebook is a LocalRelation → broadcast; corpus codes
    // come from the cached index, never a re-scan of the embeddings; the
    // (sub, code) candidate join is an equi-join, never a cartesian
    assert(plan.contains("Broadcast"), s"codebook not broadcast:\n$plan")
    assert(plan.contains("InMemoryTableScan"), s"codes not read from cache:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in ADC plan:\n$plan")
  }

  test("ivfTopKLcg: literal-centroid probes, lists from cache, no cartesian") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") < 3)
    val plan = finalPlan(
      graft.pipeline.Similarity.ivfTopKLcg(e, q, k = 3, nlist = 4, nprobe = 2))
    // probe distances come from an explode over a literal centroid array
    // (driver state = nlist·dim ints), the inverted lists are the cached
    // kmeans assignment, and every join is an equi-join
    assert(plan.contains("InMemoryTableScan"), s"lists not read from cache:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in IVF plan:\n$plan")
  }
}
