package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over `documents`
  * (doc_id, text, lang, ...). All pure column expressions (whole-stage
  * codegen; the parquet scan reads only the referenced columns).
  */
object TextStats {

  /** Whitespace tokens + a BPE-ish sub-token estimate (split on non-alnum
    * boundaries and count ~4-char chunks, a common heuristic proxy).
    */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val wsTokens = size(filter(split(col("text"), "\\s+"), t => length(t) > 0))
    val alnumRuns = size(filter(split(col("text"), "[^A-Za-z0-9]+"), t => length(t) > 0))
    val chars = length(regexp_replace(col("text"), "\\s+", ""))
    docs.select(col("doc_id"),
      wsTokens.cast("long").as("ws_tokens"),
      alnumRuns.cast("long").as("alnum_runs"),
      ceil(chars.cast("double") / 4.0).cast("long").as("bpe_est"))
  }

  /** Per-document character-level Shannon entropy (nats) — the standard
    * cheap gibberish/boilerplate filter (low entropy = repeated runs,
    * near-log2(alphabet) = keyboard mash or base64 blobs):
    * H = ln(n) − (Σ_c cnt_c·ln cnt_c)/n over the doc's character counts.
    *
    * Zero shuffles and no explode — the whole computation is per-row array
    * algebra: split to chars, count each DISTINCT char with a filter scan,
    * sort the (char, count) structs, and fold Σ cnt·ln(cnt) LEFT-TO-RIGHT
    * from 0.0 so the floating-point addition order is pinned (char-sorted —
    * a groupBy sum's order would be partition-dependent) and a SQL oracle
    * replays the value bit-for-bit. O(len·|alphabet|) per doc.
    *
    * @return (doc_id, n_chars, h_nats)
    */
  def charEntropy(docs: DataFrame): DataFrame = {
    val cs = filter(split(col("text"), ""), c => length(c) > 0)
    val counts = array_sort(transform(array_distinct(cs),
      c => struct(c.as("ch"),
        size(filter(cs, x => x === c)).cast("long").as("cnt"))))
    val sclc = aggregate(counts, lit(0.0),
      (acc, x) => acc + x.getField("cnt").cast("double")
        * log(x.getField("cnt").cast("double")))
    val n = size(cs).cast("long")
    docs.select(col("doc_id"), n.as("n_chars"),
      when(n === 0L, lit(0.0))
        .otherwise(log(n.cast("double")) - sclc / n.cast("double")).as("h_nats"))
  }

  /** Per-document vocabulary richness — type-token ratio and hapax share,
    * the classic template/boilerplate detectors (machine-generated spam has
    * abnormally LOW TTR; OCR noise and gibberish abnormally HIGH hapax):
    * (doc_id, n_tokens, n_types, hapax_cnt, ttr, hapax_ratio), each ratio
    * ONE division of exact integers. Zero shuffles — per-row array algebra
    * only (distinct + filter-count scans, O(len·types) per doc), the same
    * shape as [[charEntropy]].
    */
  def ttr(docs: DataFrame): DataFrame = {
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val types = array_distinct(toks)
    val hapax = filter(types, t => size(filter(toks, x => x === t)) === 1)
    docs.select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(types).cast("long").as("n_types"),
        size(hapax).cast("long").as("hapax_cnt"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"), col("hapax_cnt"),
        when(col("n_tokens") === 0L, lit(0.0))
          .otherwise(col("n_types").cast("double") / col("n_tokens").cast("double"))
          .as("ttr"),
        when(col("n_types") === 0L, lit(0.0))
          .otherwise(col("hapax_cnt").cast("double") / col("n_types").cast("double"))
          .as("hapax_ratio"))
  }

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean word
    * length, uppercase ratio — plus a composite [0,1] score with fixed
    * deterministic weights (the C4/Gopher-style cheap filters).
    */
  def qualityScores(docs: DataFrame, stopwords: Seq[String] = DefaultStopwords): DataFrame = {
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast("double")
    val len = length(col("text")).cast("double")
    val nPunct = (len - length(regexp_replace(col("text"), "[.,;:!?'\"()]", ""))).cast("double")
    val nUpper = (len - length(regexp_replace(col("text"), "[A-Z]", ""))).cast("double")
    val meanWordLen = length(regexp_replace(col("text"), "\\s+", "")).cast("double") /
      greatest(nTok, lit(1.0))
    val stopRatio = nStop / greatest(nTok, lit(1.0))
    val punctRatio = nPunct / greatest(len, lit(1.0))
    val upperRatio = nUpper / greatest(len, lit(1.0))
    val lengthOk = when(nTok.between(5, 100000), 1.0).otherwise(0.0)
    val wordLenOk = when(meanWordLen.between(2.0, 12.0), 1.0).otherwise(0.0)
    val score = (lengthOk * 0.3 + wordLenOk * 0.2 +
      least(stopRatio * lit(4.0), lit(1.0)) * 0.3 +
      (lit(1.0) - least(upperRatio * lit(5.0), lit(1.0))) * 0.2)
    docs.select(col("doc_id"), nTok.cast("long").as("n_tokens"),
      round(stopRatio, 6).as("stop_ratio"), round(punctRatio, 6).as("punct_ratio"),
      round(upperRatio, 6).as("upper_ratio"), round(meanWordLen, 6).as("mean_word_len"),
      round(score, 6).as("quality"))
  }

  val DefaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "at", "by", "be", "this", "are", "was", "from", "not")

  /** Language ID, n-gram/stopword heuristic: score each candidate language by
    * hits of its most frequent function words; argmax with deterministic
    * tie-break (alphabetical), "und" when nothing matches. (A real model is a
    * table of char-trigram frequencies — same plan shape: explode, join the
    * broadcast trigram table, groupBy argmax.)
    */
  def langId(docs: DataFrame): DataFrame = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"),
      "en" -> Seq("the", "and", "of", "to", "is", "that", "it", "with", "for"),
      "es" -> Seq("el", "la", "los", "las", "que", "y", "es", "en", "un", "una", "por"),
      "fr" -> Seq("le", "la", "les", "et", "est", "que", "des", "une", "dans", "pour"),
      "it" -> Seq("il", "la", "che", "di", "e", "un", "una", "per", "non", "sono"))
    val toks = filter(split(lower(col("text")), "[^a-zà-ÿ]+"), t => length(t) > 0)
    val scores = markers.map { case (lang, words) =>
      struct(size(filter(toks, t => t.isin(words.map(lit): _*))).as("hits"),
        lit(lang).as("lang"))
    }
    // argmax hits; array_max on (hits, lang) structs compares hits first, and
    // REVERSED lang gives... we need min lang on ties: negate via sort order:
    // pick max hits then min lang by two-step: max hits, then filter+min.
    val arr = array(scores: _*)
    val maxHits = array_max(transform(arr, s => s.getField("hits")))
    val best = array_min(transform(
      filter(arr, s => s.getField("hits") === maxHits), s => s.getField("lang")))
    docs.select(col("doc_id"),
      when(maxHits > 0, best).otherwise(lit("und")).as("pred_lang"),
      maxHits.cast("long").as("marker_hits"))
  }

  /** Gopher-style repetition + formatting signals (the MassiveText quality
    * filters' repetition family, plus C4's symbol ratios): duplicate-line
    * fraction by line and by character, bullet / ellipsis line fractions,
    * symbol-to-word ratio, and the token share of the single most frequent
    * bigram. These catch the boilerplate/spam failure modes the length/
    * stopword scores in [[qualityScores]] miss (repeated nav bars, SEO
    * keyword stuffing, template pages).
    *
    * Plan shape: a pure zero-shuffle projection. The top-bigram share — the
    * one signal that naively wants explode+groupBy — is computed as a
    * longest-equal-run `aggregate` over the SORTED per-doc bigram array, so
    * per-document signals stay what they must be at 100 TB: projections.
    */
  def repetitionScores(docs: DataFrame): DataFrame = {
    val lines = filter(transform(split(col("text"), "\n"), l => trim(l)),
      l => length(l) > 0)
    val nLines = size(lines).cast("double")
    val distinctLines = array_distinct(lines)
    def sumLen(a: Column): Column = aggregate(a, lit(0L), (acc, x) => acc + length(x))
    val charAll = sumLen(lines).cast("double")
    val dupLineFrac =
      when(nLines > 0, lit(1.0) - size(distinctLines).cast("double") / nLines)
        .otherwise(0.0)
    val dupCharFrac =
      when(charAll > 0, lit(1.0) - sumLen(distinctLines).cast("double") / charAll)
        .otherwise(0.0)
    val bulletFrac = when(nLines > 0,
      size(filter(lines, l => substring(l, 1, 1).isin("-", "*", "•"))).cast("double")
        / nLines).otherwise(0.0)
    val ellipsisFrac = when(nLines > 0,
      size(filter(lines, l => l.endsWith("...") || l.endsWith("…"))).cast("double")
        / nLines).otherwise(0.0)

    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val nTok = size(toks).cast("double")
    def count(needle: String): Column =
      ((length(col("text")) - length(replace(col("text"), lit(needle), lit("")))) /
        needle.length).cast("double")
    val symbolRatio =
      when(nTok > 0, (count("#") + count("...") + count("…")) / nTok).otherwise(0.0)

    // most-frequent-bigram token share: longest equal run in the sorted
    // bigram array (equivalent to groupBy-max per doc, without the shuffle)
    val bigrams = when(size(toks) >= 2,
      transform(slice(toks, lit(1), size(toks) - 1),
        (t, i) => concat(t, lit(" "), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))
    val best = aggregate(array_sort(bigrams),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val nBg = size(bigrams).cast("double")
    val topBigramFrac = when(nBg > 0, best.cast("double") / nBg).otherwise(0.0)

    docs.select(col("doc_id"),
      size(lines).cast("long").as("n_lines"),
      round(dupLineFrac, 6).as("dup_line_frac"),
      round(dupCharFrac, 6).as("dup_line_char_frac"),
      round(bulletFrac, 6).as("bullet_line_frac"),
      round(ellipsisFrac, 6).as("ellipsis_line_frac"),
      round(symbolRatio, 6).as("symbol_word_ratio"),
      round(topBigramFrac, 6).as("top_bigram_frac"))
  }

  /** Token-budget sequence packing — "concatenate and chunk", the standard
    * way training batches are cut from a document stream: documents in
    * doc_id order are laid head-to-tail into one global token stream, which
    * is split every `budget` tokens into training sequences. Emits each
    * document's token count, absolute start offset, and the first/last
    * sequence it lands in (a document may span sequences).
    *
    * Plan shape — the global prefix sum is the textbook two-level scan, NOT
    * one global window: docs are grouped into doc_id ranges (`rangeSize` ids
    * per range) and the running sum is a per-range window (parallel tasks);
    * range totals — |docs|/rangeSize rows, ~10⁶ at 10¹² docs — are
    * prefix-summed in one tiny window and broadcast back. A no-partition
    * window would collapse 100 TB into ONE task; this does it in
    * |docs|/rangeSize parallel windows + a broadcast join, and is
    * value-identical to the naive global window (the driver oracle pins
    * exactly that equality).
    */
  def packSequences(docs: DataFrame, budget: Long, rangeSize: Long = 1L << 20): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(rangeSize > 0, "rangeSize must be positive")
    import org.apache.spark.sql.expressions.Window
    val nTok = size(filter(split(col("text"), "\\s+"), t => length(t) > 0)).cast("long")
    val base = docs.select(col("doc_id"), nTok.as("n_tok"),
      expr(s"doc_id DIV ${rangeSize}L").as("rng"))
    val w = Window.partitionBy("rng").orderBy("doc_id")
    val local = base.withColumn("lcum", sum(col("n_tok")).over(w) - col("n_tok"))
    val w2 = Window.orderBy("rng").rowsBetween(Window.unboundedPreceding, -1)
    val offs = base.groupBy("rng").agg(sum("n_tok").as("rtot"))
      .withColumn("roff", coalesce(sum(col("rtot")).over(w2), lit(0L)))
      .select("rng", "roff")
    local.join(broadcast(offs), Seq("rng"))
      .withColumn("start_tok", col("roff") + col("lcum"))
      .select(col("doc_id"), col("n_tok"), col("start_tok"),
        expr(s"start_tok DIV ${budget}L").as("seq_first"),
        when(col("n_tok") > 0, expr(s"(start_tok + n_tok - 1) DIV ${budget}L"))
          .otherwise(expr(s"start_tok DIV ${budget}L")).as("seq_last"))
  }

  /** Deterministic per-stratum sampling: each doc draws a stable slot in
    * [0, 10000) from an exact multiplicative hash of doc_id (Lehmer 48271 —
    * exact in 64-bit for doc_id < 1.9e14, far past the 10¹² design point,
    * and reproducible in ANY engine — the point: a training-data sample
    * must be re-derivable bit-for-bit years later) and is kept iff
    * slot < 10000·rate(stratum). Unknown strata default to rate 0. A pure
    * pushed-down filter: no shuffle, no RNG state, rerun-stable under any
    * partitioning — everything `df.sample()` is not.
    */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Double],
                       strataCol: String = "lang"): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0), "rates must be in [0,1]")
    val slot = (col("doc_id") * 48271L) % 10000L
    val keepBelow = rates.foldLeft(lit(0L)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(math.round(r * 10000).toLong)).otherwise(acc)
    }
    docs.filter(slot < keepBelow)
  }

  /** Deterministic global training order ("the shuffle"): each doc draws a
    * stable pseudo-random key from an exact multiplicative hash of doc_id
    * (Lehmer 48271 mod 2³¹−1, a full-period permutation of [1, 2³¹−1) —
    * bit-reproducible in any engine, unlike `rand()`), and `shuffle_rank` is
    * the doc's position in global key order. A training run years later can
    * re-derive the identical example order from doc_ids alone.
    *
    * Plan shape — the global rank is the same two-level scan as
    * [[packSequences]], never one global window: keys are uniform, so
    * key-interval ranges (`rangeWidth` wide) are balanced; each range ranks
    * its rows in a parallel window, and the |ranges|-row count table is
    * prefix-summed in one tiny window and broadcast back.
    */
  def shuffleOrder(docs: DataFrame, rangeWidth: Long = 1L << 19): DataFrame = {
    require(rangeWidth > 0, "rangeWidth must be positive")
    import org.apache.spark.sql.expressions.Window
    val M = 2147483647L // 2^31 - 1 (prime); doc_id%M * 48271 < 2^47: exact
    val key = col("doc_id") % M * 48271L % M
    val base = docs.select(col("doc_id"), key.as("shuffle_key"))
      .withColumn("rng", expr(s"shuffle_key DIV ${rangeWidth}L"))
    val w = Window.partitionBy("rng").orderBy("shuffle_key", "doc_id")
    val local = base.withColumn("lrank", row_number().over(w).cast("long") - 1L)
    val w2 = Window.orderBy("rng").rowsBetween(Window.unboundedPreceding, -1)
    val offs = base.groupBy("rng").agg(count(lit(1)).as("cnt"))
      .withColumn("roff", coalesce(sum(col("cnt")).over(w2), lit(0L)))
      .select("rng", "roff")
    local.join(broadcast(offs), Seq("rng"))
      .select(col("doc_id"), col("shuffle_key"),
        (col("roff") + col("lrank")).as("shuffle_rank"))
  }

  /** Temperature-based source mixing — the multi-corpus sampling rule used
    * to rebalance web/books/code mixtures: source s holding n_s of N docs is
    * drawn with weight ∝ n_s^(1/τ) (τ=1: natural frequency; τ→∞: uniform
    * over sources), with per-source keep rates scaled so the expected output
    * is `frac`·N and clamped at 1 (a starved source cannot emit more docs
    * than it has; the clamp mass is not redistributed — the standard
    * single-pass approximation). The per-doc draw reuses the exact Lehmer
    * slot of [[stratifiedSample]]: a pure pushed-down filter, rerun-stable
    * under any partitioning.
    *
    * Weights are EXACT integers — floor(sqrt(n_s·10⁶)) for τ=2 (sqrt is
    * IEEE-754 exact-rounded, so any engine reproduces the rates bit-for-bit;
    * other τ use pow, documented as engine-local). The source-count table is
    * K rows, so its windows and the broadcast join are free at any scale.
    */
  def temperatureSample(docs: DataFrame, frac: Double, tau: Double = 2.0,
                        sourceCol: String = "source"): DataFrame = {
    require(frac > 0 && frac <= 1, "frac must be in (0,1]")
    require(tau > 0, "tau must be positive")
    import org.apache.spark.sql.expressions.Window
    val counts = docs.groupBy(sourceCol).agg(count(lit(1)).as("n_s"))
    val wgt =
      if (tau == 2.0) floor(sqrt(col("n_s").cast("double") * 1e6)).cast("long")
      else floor(pow(col("n_s").cast("double") * 1e6, 1.0 / tau)).cast("long")
    val wAll = Window.partitionBy() // counts is K rows: a global window is free
    val rates = counts.withColumn("wgt", wgt)
      .withColumn("rate", least(lit(1.0),
        lit(frac) * sum(col("n_s")).over(wAll).cast("double") *
          col("wgt").cast("double") /
          (sum(col("wgt")).over(wAll).cast("double") * col("n_s").cast("double"))))
      .select(col(sourceCol), col("rate"))
    val slot = (col("doc_id") * 48271L + 11213L) % 10000L
    docs.join(broadcast(rates), Seq(sourceCol))
      .filter(slot < floor(col("rate") * 10000.0))
      .select(col("doc_id"), col(sourceCol))
  }

  /** PII scrubbing — the pre-training privacy pass: replace emails, IPv4
    * addresses, and international-format phone numbers with typed
    * placeholder tokens, and count each category. A pure regexp projection
    * (whole-stage codegen, column-pruned scan); the patterns avoid
    * backreferences/lookarounds so an RE2-based engine audits the exact
    * same redactions.
    */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val phone = "\\+[0-9][0-9 ()-]{6,}[0-9]"
    val c = col(textCol)
    docs.select(col("doc_id"),
      regexp_replace(regexp_replace(regexp_replace(c,
        email, "<EMAIL>"), ip, "<IP>"), phone, "<PHONE>").as("redacted"),
      regexp_count(c, lit(email)).cast("long").as("n_emails"),
      regexp_count(c, lit(ip)).cast("long").as("n_ips"),
      regexp_count(c, lit(phone)).cast("long").as("n_phones"))
  }

  /** Self-trained unigram-LM scoring — the cheap statistical stand-in for
    * KenLM-perplexity quality filtering: train add-k-smoothed unigram
    * probabilities on the corpus itself (top `vocabSize` tokens by count,
    * everything else is one OOV bucket), then score each doc by the mean
    * negative log-probability of its tokens. High scores = improbable token
    * streams (gibberish, boilerplate soup); low = fluent text.
    *
    * Plan shape at 100 TB: pass 1 is a partial-aggregated token count
    * (shuffle rows are (token, n), not text) + a top-V sort-limit on the
    * ~|vocab|-row aggregate; pass 2 re-streams the corpus once, LEFT-joins
    * the BROADCAST vocab on the exploded token stream, and partial-aggregates
    * (doc_id, sum, n) — corpus text never crosses an exchange.
    */
  def unigramLogProb(docs: DataFrame, vocabSize: Int = 32768,
                     k: Double = 0.5): DataFrame = {
    require(vocabSize > 0 && k > 0, "vocabSize and k must be positive")
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val tokStream = docs.select(col("doc_id"), explode(toks).as("tok"))
    val counts = tokStream.groupBy("tok").agg(count(lit(1)).as("c"))
    // deterministic top-V: (count desc, token asc) breaks boundary ties
    val vocab = counts.orderBy(col("c").desc, col("tok").asc).limit(vocabSize)
    // two 1-row frames (total tokens, distinct vocab entries) join for free
    val totals = counts.agg(sum(col("c")).as("n_total"))
      .crossJoin(vocab.agg(count(lit(1)).as("v")))
    val scored = tokStream
      .join(broadcast(vocab), Seq("tok"), "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(totals))
      .withColumn("nlp", -log((col("c").cast("double") + k) /
        (col("n_total").cast("double") + lit(k) * (col("v").cast("double") + 1.0))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), avg(col("nlp")).as("mean_nlp"))
    scored.select(col("doc_id"), col("n_tok"),
      round(col("mean_nlp"), 6).as("mean_nlp"))
  }

  /** Interpolated bigram-LM scoring — one smoothing notch above
    * [[unigramLogProb]] toward real KenLM perplexity filtering:
    * p(wᵢ|wᵢ₋₁) = λ·(c(wᵢ₋₁wᵢ)+k)/(c(wᵢ₋₁)+k(V+1))
    *           + (1−λ)·(c(wᵢ)+k)/(N+k(V+1))
    * over the OOV-mapped token stream (top `vocabSize` types, rest one
    * bucket), scored as mean −ln p per transition. λ and k default DYADIC
    * (3/4, 1/2) so both engines do the identical float arithmetic from
    * identical integer counts.
    *
    * Plan shape at 100 TB: same two corpus passes as the unigram scorer —
    * token counts, then a re-stream mapped through the BROADCAST vocab; the
    * transition stream is a (doc, pos)-keyed self-join (co-partitioned, one
    * exchange) and the bigram count table shuffles (type, type, n) rows
    * only. Docs with < 2 tokens have no transitions and are absent.
    */
  def bigramLogProb(docs: DataFrame, vocabSize: Int = 32768, k: Double = 0.5,
                    lambda: Double = 0.75): DataFrame = {
    require(vocabSize > 0 && k > 0 && lambda >= 0 && lambda <= 1,
      "need vocabSize > 0, k > 0, lambda in [0,1]")
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val tokStream = docs.select(col("doc_id"), posexplode(toks).as(Seq("pos", "tok")))
    val counts = tokStream.groupBy("tok").agg(count(lit(1)).as("c"))
    val vocab = counts.orderBy(col("c").desc, col("tok").asc).limit(vocabSize)
      .select(col("tok"), lit(1).as("inv"))
    val mapped = tokStream.join(broadcast(vocab), Seq("tok"), "left")
      .select(col("doc_id"), col("pos"),
        when(col("inv").isNotNull, col("tok")).otherwise(lit("<oov>")).as("m"))
    val uni = mapped.groupBy("m").agg(count(lit(1)).as("cu"))
    val totals = uni.agg(sum(col("cu")).as("n_total"), count(lit(1)).as("v"))
    val trans = mapped.as("x").join(mapped.as("y"),
        col("x.doc_id") === col("y.doc_id") && col("y.pos") === col("x.pos") + 1)
      .select(col("x.doc_id").as("doc_id"), col("x.m").as("p"), col("y.m").as("q"))
    val denomK = lit(k) * (col("v").cast("double") + 1.0)
    val prob =
      lit(lambda) * ((col("cb").cast("double") + k) /
        (col("cup").cast("double") + denomK)) +
      lit(1 - lambda) * ((col("cuq").cast("double") + k) /
        (col("n_total").cast("double") + denomK))
    trans
      .join(trans.groupBy("p", "q").agg(count(lit(1)).as("cb")), Seq("p", "q"))
      .join(broadcast(uni.select(col("m").as("p"), col("cu").as("cup"))), Seq("p"))
      .join(broadcast(uni.select(col("m").as("q"), col("cu").as("cuq"))), Seq("q"))
      .crossJoin(broadcast(totals))
      .withColumn("nlp", -log(prob))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trans"), round(avg(col("nlp")), 6).as("mean_nlp"))
  }

  /** SQL-re-derivable document fingerprint: the rolling hash of
    * [[fingerprints]] with the opaque xxhash64 chain swapped for an LCG fold
    * acc ← (acc·8191 + sid + 1) mod 2³¹−1 over DENSE-RANK token ids in
    * position order — order-sensitive, whitespace-insensitive, and exactly
    * replayable by a DuckDB oracle (list_reduce over list(sid ORDER BY pos)).
    * The global-ordered vocabulary rank is the oracle-scale concession, as
    * in [[graft.pipeline.Dedup.minhashNearDupsLcg]]; production fingerprints
    * stay on the xxhash path.
    */
  def fingerprintsLcg(docs: DataFrame): DataFrame = {
    val P = 2147483647L
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val tokStream = docs.select(col("doc_id"), posexplode(toks).as(Seq("pos", "tok")))
    val vocab = tokStream.select("tok").distinct()
      .withColumn("sid", (dense_rank().over(
        org.apache.spark.sql.expressions.Window.orderBy("tok")) - 1).cast("long"))
    tokStream.join(vocab, Seq("tok"))
      .groupBy("doc_id")
      .agg(
        aggregate(
          transform(array_sort(collect_list(struct(col("pos"), col("sid")))),
            s => s.getField("sid")),
          lit(0L), (acc, x) => (acc * 8191L + x + 1L) % P).as("fingerprint"),
        count(lit(1)).as("n_tokens"))
  }

  /** Document fingerprint: 64-bit rolling hash of the normalized token
    * stream — xxhash64-chained (hash of (acc, token) per step) so it is
    * order-sensitive and whitespace-insensitive without the long-overflow a
    * polynomial hash hits under ANSI arithmetic. aggregate() keeps it one
    * pass, no UDF.
    */
  def fingerprints(docs: DataFrame): DataFrame = {
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val fp = aggregate(toks, lit(1469598103934665603L),
      (acc, t) => xxhash64(acc, t))
    docs.select(col("doc_id"), fp.as("fingerprint"),
      size(toks).cast("long").as("n_tokens"))
  }

  /** (doc_id, term) exploded token table — lowercase, split on non-alnum
    * runs, empties dropped. The shared front end of [[tfidfTopTerms]] and
    * [[bm25]]; one narrow projection + generate, no shuffle.
    */
  private def termTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(
      filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0)).as("term"))

  /** Top-k terms per document by smoothed tf-idf
    * (idf = ln((N+1)/(df+1)) + 1, the sklearn smoothing — never negative,
    * never a zero division). Output (doc_id, term, tf, tfidf, rk), ties
    * broken by term so the ranking is deterministic.
    *
    * Spark shape: explode → ONE (doc_id,term) aggregation → a term-keyed
    * shuffle join against the (term, df) side (itself a rollup of the same
    * aggregate, so Spark reuses the exchange) → per-doc window. Every stage
    * is keyed on doc or term — no global ordering, no driver data; the df
    * side is the vocabulary (heavy-tailed but bounded), standard at 100 TB.
    * N (corpus size) is the one scalar collect.
    */
  def tfidfTopTerms(docs: DataFrame, topK: Int = 5): DataFrame = {
    val n = docs.count()
    val tf = termTable(docs).groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term").select(col("doc_id"), col("term"), col("tf"),
      round(col("tf") * (log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0), 6).as("tfidf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
  }

  /** Per-document out-of-vocabulary rate against the corpus' own top-K
    * vocabulary (count desc, term asc tie-break — deterministic at the
    * boundary): (doc_id, tok_cnt, oov_cnt, oov_rate). The training-data use
    * is vocabulary-coverage filtering — documents whose tokens mostly fall
    * outside the head vocabulary are boilerplate/garbled/wrong-domain.
    * Docs with zero tokens keep a row with rate 0.0. Exact integer counts,
    * one IEEE division — bit-identical in any engine.
    *
    * Scale shape: one vocabulary-sized groupBy(term) → TakeOrdered top-K
    * (never a global sort of raw tokens), the K-row vocab BROADCAST into a
    * left join on the token table, one groupBy(doc_id). Both corpus-sized
    * passes are single shuffles; the vocabulary never crosses the wire.
    */
  def oovRate(docs: DataFrame, vocabK: Int = 16): DataFrame = {
    val toks = termTable(docs)
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(vocabK)
      .select(col("term"), lit(1L).as("iv"))
    val perDoc = toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("tok_cnt"),
        sum(when(col("iv").isNull, 1L).otherwise(0L)).as("oov_cnt"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("tok_cnt"), lit(0L)).as("tok_cnt"),
        coalesce(col("oov_cnt"), lit(0L)).as("oov_cnt"),
        when(coalesce(col("tok_cnt"), lit(0L)) === 0L, lit(0.0))
          .otherwise(col("oov_cnt").cast("double") / col("tok_cnt").cast("double"))
          .as("oov_rate"))
  }

  /** Exact global top-k frequent terms at BOUNDED memory — the two-pass
    * heavy-hitter shape a 100 TB vocabulary needs when the full term
    * dictionary cannot be shuffled:
    *
    *  1. sketch pass: a per-partition Misra-Gries summary with `cap`
    *     counters. Any term with global count > N/(cap+1) survives in at
    *     least one partition (if it were wiped everywhere its count would be
    *     ≤ Σ_p N_p/(cap+1) = N/(cap+1)), so the union of survivors is a
    *     candidate superset of every possible top-k member above that bound.
    *     ≤ cap·partitions candidate rows ever leave the executors.
    *  2. recount pass: EXACT counts for candidates only (broadcast semi
    *     join — the vocabulary-wide shuffle never happens), global top-k by
    *     (count desc, term asc).
    *
    * The output column `certified` = 1 iff the k-th count > N/(cap+1) —
    * the standard a-posteriori proof that the heavy-hitter bound cannot
    * hide a true top-k member outside the candidate set, i.e. the answer
    * equals the unbounded-memory exact top-k (which is what the SQL oracle
    * computes). mapPartitions is the honest shape for the sketch: Misra-
    * Gries is inherently imperative per-partition state, like the media
    * codecs — no Catalyst expression maintains a counter map.
    */
  def topTermsExact(docs: DataFrame, topK: Int = 20, cap: Int = 4096): DataFrame = {
    import org.apache.spark.sql.Encoders
    val toks = termTable(docs)
    val nTok = toks.count()

    val cand = toks.select(col("term")).as[String](Encoders.STRING)
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { t =>
          if (m.contains(t)) m(t) += 1L
          else if (m.size < cap) m(t) = 1L
          else {
            // decrement-all step, amortized: drop zeros as they appear
            val dead = scala.collection.mutable.ArrayBuffer.empty[String]
            m.keysIterator.foreach { k =>
              if (m(k) == 1L) dead += k else m(k) -= 1L
            }
            dead.foreach(m.remove)
          }
        }
        m.keysIterator
      }(Encoders.STRING)
      .toDF("term").distinct()

    val counts = toks.join(broadcast(cand), Seq("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("term"))
    val ranked = counts.withColumn("rk", row_number().over(w).cast("long"))
    val kth = ranked.agg(min(col("cnt"))).head.getLong(0)
    val certified = if (kth.toDouble > nTok.toDouble / (cap + 1.0)) 1L else 0L
    ranked.withColumn("certified", lit(certified))
  }

  /** BM25 retrieval for a fixed query term set: the top-k documents by
    * Robertson/Sparck-Jones BM25 with the standard k1/b defaults kept
    * DYADIC (k1 = 5/4, b = 3/4) so every constant is exact in binary and
    * the oracle arithmetic matches bit-for-bit before the final round.
    * idf = ln((N - df + 0.5)/(df + 0.5) + 1) (the Lucene non-negative form).
    *
    * Spark shape: the per-doc term frequencies are FILTERED to the query
    * terms before anything wide happens (predicate pushes into the
    * aggregation's input), the per-term df table is |query| rows →
    * broadcast, doc length joins doc-keyed, and the global top-k is
    * TakeOrderedAndProject (per-partition heads, never a full sort).
    */
  def bm25(docs: DataFrame, query: Seq[String], topK: Int = 20,
           k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    val n = docs.count()
    val toks = termTable(docs)
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val avgdl = dl.agg(sum("dl")).head.getLong(0).toDouble / n
    val qterms = query.map(_.toLowerCase).distinct
    val qtf = toks.filter(col("term").isin(qterms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = qtf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val contrib = qtf.join(broadcast(df), "term").join(dl, "doc_id")
      .select(col("doc_id"),
        (idf * col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))).as("c"))
    val scores = contrib.groupBy("doc_id").agg(round(sum("c"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bm25").desc, col("doc_id"))
    scores.withColumn("rk", row_number().over(w).cast("long"))
  }

  /** Multi-query BM25 (the batch-evaluation companion of [[bm25]]): rank
    * the corpus against a FIXED QUERY SET in one pass, returning
    * (query_id, doc_id, bm25, rk ≤ topK). Same Robertson/Sparck-Jones
    * arithmetic with dyadic k1 = 5/4, b = 3/4 and the Lucene non-negative
    * idf — the per-(query,doc) score is bit-for-bit the single-query
    * [[bm25]] score, so the SQL oracle replays it exactly.
    *
    * Spark shape: the query set is a FEW-ROW broadcast (query_id, term)
    * table joined into the token stream before anything wide happens, so
    * the corpus-sized work is one filtered (query,doc,term) aggregation;
    * the per-query df table is |queries|·|terms| rows → broadcast; the
    * per-query top-k is a rank-limited window (Spark 4 plans it as
    * WindowGroupLimit — per-partition heads, never a full per-query sort).
    */
  def bm25Multi(docs: DataFrame, queries: Seq[(Long, Seq[String])],
                topK: Int = 20, k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val n = docs.count()
    val toks = termTable(docs)
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val avgdl = dl.agg(sum("dl")).head.getLong(0).toDouble / n
    val q = queries.flatMap { case (id, ts) =>
      ts.map(_.toLowerCase).distinct.map((id, _)) }.toDF("query_id", "term")
    val qtf = toks.join(broadcast(q), Seq("term"))
      .groupBy("query_id", "doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfq = qtf.groupBy("query_id", "term").agg(count(lit(1)).as("df"))
    val idf = log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val contrib = qtf.join(broadcast(dfq), Seq("query_id", "term")).join(dl, "doc_id")
      .select(col("query_id"), col("doc_id"),
        (idf * col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))).as("c"))
    val scores = contrib.groupBy("query_id", "doc_id")
      .agg(round(sum("c"), 6).as("bm25"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("bm25").desc, col("doc_id"))
    scores.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
  }

  /** Graded relevance judgments for [[bm25Multi]]'s query set: rel =
    * number of DISTINCT query terms occurring at least `minTf` times in
    * the document (query_id, doc_id, rel ≥ 1; absent pair ⇒ 0). minTf > 1
    * makes the truth STRICTER than the tf-weighted BM25 ranking, so the
    * retrieval evals (MRR, precision@k, NDCG) measure a ranking that can
    * actually be imperfect instead of one saturated at 1.0.
    *
    * Spark shape: broadcast the query terms into the token stream FIRST
    * (the tf aggregation runs over query-term tokens only, a tiny
    * fraction of the corpus), then one (query,doc) aggregation.
    */
  def queryRelevance(docs: DataFrame, queries: Seq[(Long, Seq[String])],
                     minTf: Long = 1L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val q = queries.flatMap { case (id, ts) =>
      ts.map(_.toLowerCase).distinct.map((id, _)) }.toDF("query_id", "term")
    termTable(docs).join(broadcast(q), Seq("term"))
      .groupBy("query_id", "doc_id", "term").agg(count(lit(1)).as("tf"))
      .filter(col("tf") >= minTf)
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("rel"))
  }

  /** Exact duplicated-substring span marking (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better" ExactSubstr
    * surface, at token granularity): every w-token gram occurring at least
    * `minCount` times ANYWHERE in the corpus marks its w positions as
    * duplicated; per document, overlapping-or-adjacent marked windows merge
    * into maximal spans (doc_id, span_start, span_end) — the regions a
    * training pipeline cuts out, the token-level analogue of the paper's
    * suffix-array 50-char spans.
    *
    * Spark shape: one generate emits (doc_id, pos, gram) straight off the
    * token array (no window, no self-join); the single wide stage is the
    * gram-keyed count — keyed here on the gram TEXT so the DuckDB oracle is
    * exact; at 100 TB the key would be a 128-bit gram hash with identical
    * plan shape (and spans verified exactly, like the LSH pipelines). The
    * position table then semi-joins the heavy grams (exchange reused — same
    * key), and span merging is the classic gaps-and-islands running max
    * inside a PER-DOC window, never a global sort.
    */
  def dupSpans(docs: DataFrame, w: Int = 7, minCount: Long = 2L): DataFrame = {
    require(w >= 1 && minCount >= 1, s"bad dupSpans params w=$w minCount=$minCount")
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val grams = docs.select(col("doc_id"), toks.as("tk"))
      .select(col("doc_id"), posexplode(
        when(size(col("tk")) >= w,
          transform(sequence(lit(0), size(col("tk")) - w),
            i => concat_ws(" ", slice(col("tk"), i + 1, lit(w)))))
        .otherwise(array())))
      .toDF("doc_id", "pos", "gram")
    val heavy = grams.groupBy("gram").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount).select("gram")
    val hits = grams.join(heavy, Seq("gram"), "leftsemi")
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        (col("pos") + (w - 1)).cast("long").as("e"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val prevMax = max(col("e")).over(
      byDoc.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    hits
      .withColumn("island",
        sum(when(prevMax.isNull || col("pos") > prevMax + 1L, 1L).otherwise(0L))
          .over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min("pos").as("span_start"), max("e").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"))
  }

  /** C4/RefinedWeb-style cross-document span REMOVAL — the destructive
    * sibling of [[dupSpans]] (which only reports intervals). The doc is
    * segmented into consecutive non-overlapping `span`-token chunks (last
    * chunk short), a chunk is "boilerplate" when its normalized text occurs
    * in ≥ `minDocs` DISTINCT documents, and the doc is rebuilt from the
    * surviving chunks in original order. Returns
    * (doc_id, n_chunks, n_removed, text_scrub).
    *
    * Spark shape: one generate off the token array (chunk id = pos/span —
    * no window, no self-join), one chunk-keyed count whose shuffle rows
    * carry (chunk, doc_id) pairs — at 100 TB the key would be a 128-bit
    * chunk hash with the identical plan, like [[dupSpans]]. The boilerplate
    * set (only chunks crossing the threshold) is small → AQE broadcasts the
    * flag join; the rebuild is a per-doc collect_list of the KEPT chunks
    * only (null-skipping), sorted by chunk id — array_sort on (cid, chunk)
    * structs, never a global sort. All strings/integers: any engine
    * reproduces the rebuilt text byte-for-byte.
    */
  def spanScrub(docs: DataFrame, span: Int = 10, minDocs: Long = 2L): DataFrame = {
    require(span >= 1 && minDocs >= 1, s"bad spanScrub params span=$span minDocs=$minDocs")
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val chunks = docs.select(col("doc_id"), toks.as("tk"))
      .select(col("doc_id"), posexplode(
        when(size(col("tk")) > 0,
          transform(sequence(lit(0), floor((size(col("tk")) - 1) / lit(span)).cast("int")),
            i => concat_ws(" ", slice(col("tk"), i * span + 1, lit(span)))))
        .otherwise(array())))
      .toDF("doc_id", "cid", "chunk")
    val boiler = chunks.groupBy("chunk")
      .agg(countDistinct(col("doc_id")).as("ndocs"))
      .filter(col("ndocs") >= minDocs)
      .select(col("chunk"), lit(true).as("dup"))
    chunks.join(boiler, Seq("chunk"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_removed"),
        array_sort(collect_list(when(coalesce(col("dup"), lit(false)) === false,
          struct(col("cid"), col("chunk"))))).as("kept"))
      .select(col("doc_id"), col("n_chunks"), col("n_removed"),
        array_join(transform(col("kept"), x => x.getField("chunk")), " ")
          .as("text_scrub"))
  }

  /** Temperature-scaled domain mixing weights — the data-mixture step of a
    * multi-source training pipeline (XLM-R-style α-sampling): per `source`,
    * token mass p = tokens_d / Σ tokens, and resampling weight
    * w = tokens_d^α / Σ_d tokens_d^α with α = 1/2, which UPWEIGHTS small
    * domains relative to their raw mass. α = 1/2 is chosen deliberately:
    * tokens^α = sqrt(tokens) is a correctly-rounded IEEE op on an exact
    * integer, identical in every engine (a general pow() is not).
    * Returns (source, n_docs, n_tokens, p, w).
    *
    * Exactness: token totals are integer sums; both denominators are
    * pinned — Σ tokens is an exact long, and Σ sqrt(tokens) is a
    * LEFT-TO-RIGHT fold over the per-source array sorted by source name
    * (a groupBy double-sum's order would be partition-dependent).
    *
    * Scale shape: the corpus-sized pass is ONE groupBy(source) with
    * map-side combine carrying (count, tokenSum) longs; everything after
    * runs on the |sources|-row table (collected into a single sorted array
    * — domains are a bounded categorical, thousands at web scale, so the
    * one-row fold is driver-safe) and is re-broadcast for the final join.
    */
  def domainMix(docs: DataFrame): DataFrame = {
    val nTok = size(filter(split(col("text"), "\\s+"), t => length(t) > 0))
    val perSrc = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(nTok.cast("long")).as("n_tokens"))
    val denom = perSrc.agg(
      sum(col("n_tokens")).as("tok_total"),
      aggregate(
        array_sort(collect_list(struct(col("source"), col("n_tokens")))),
        lit(0.0),
        (acc, x) => acc + sqrt(x.getField("n_tokens").cast("double")))
        .as("sq_total"))
    perSrc.crossJoin(broadcast(denom))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("tok_total").cast("double")).as("p"),
        (sqrt(col("n_tokens").cast("double")) / col("sq_total")).as("w"))
  }

  /** Per-language distribution drift vs the corpus — KL(P_lang ‖ P_corpus)
    * in nats over the corpus' own top-`vocabK` vocabulary (count desc, term
    * asc tie-break, the [[oovRate]] vocabulary rule) with add-one smoothing
    * on both sides: p = (c_l+1)/(n_l+K), q = (c_g+1)/(n_g+K). The training-
    * data use is domain/language shift monitoring — a subcorpus whose head-
    * vocabulary distribution diverges from the pool is over/under-mixed.
    * Returns (lang, n_vocab_tokens, kl_nats).
    *
    * Exactness: all counts integers (zero-count vocab terms materialized
    * via the langs × vocab grid, so smoothing covers absent terms); each
    * p, q is ONE division; the K-term Σ p·ln(p/q) is a LEFT-TO-RIGHT fold
    * over the term-sorted array, pinning fp addition order for a SQL
    * oracle (ln agrees between JVM and DuckDB — bm25/ndcg precedent).
    *
    * Scale shape: one corpus-sized groupBy(term) → TakeOrdered top-K
    * (never a global sort), one corpus-sized groupBy(lang, term) AFTER a
    * broadcast semi-join on the K-term vocab (so the shuffle carries only
    * head-vocab hits); everything after runs on the |langs|·K grid.
    */
  def klDrift(docs: DataFrame, vocabK: Int = 24): DataFrame = {
    val toks = docs.select(col("lang"), explode(
      filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0)).as("term"))
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("gcnt"))
      .orderBy(col("gcnt").desc, col("term")).limit(vocabK)
    val gtot = vocab.agg(sum(col("gcnt")).as("gtot"))
    val lcnt = toks.join(broadcast(vocab.select("term")), Seq("term"), "leftsemi")
      .groupBy("lang", "term").agg(count(lit(1)).as("lcnt"))
    val grid = docs.select(col("lang")).distinct.crossJoin(broadcast(vocab))
      .join(lcnt, Seq("lang", "term"), "left")
      .select(col("lang"), col("term"), col("gcnt"),
        coalesce(col("lcnt"), lit(0L)).as("lcnt"))
    val nl = grid.groupBy("lang").agg(sum(col("lcnt")).as("nl"))
    val contrib = grid.join(broadcast(nl), Seq("lang")).crossJoin(broadcast(gtot))
      .select(col("lang"),  col("term"),
        ((col("lcnt") + 1L).cast("double")
          / (col("nl") + vocabK.toLong).cast("double")).as("p"),
        ((col("gcnt") + 1L).cast("double")
          / (col("gtot") + vocabK.toLong).cast("double")).as("q"))
      .select(col("lang"), col("term"), (col("p") * log(col("p") / col("q"))).as("g"))
    contrib.groupBy("lang").agg(
      aggregate(array_sort(collect_list(struct(col("term"), col("g")))), lit(0.0),
        (acc, x) => acc + x.getField("g")).as("kl_nats"))
      .join(broadcast(nl), Seq("lang"))
      .select(col("lang"), col("nl").as("n_vocab_tokens"), col("kl_nats"))
  }

  /** Sliding-window chunking with overlap — the RAG / context-window
    * splitter: whitespace tokens, chunks of `chunkSize` tokens starting
    * every `stride = chunkSize − overlap`, last chunk anchored so it covers
    * the document tail (the HF text-splitter convention: the final start is
    * the largest j·stride with j ≤ ⌈(n − chunkSize)/stride⌉, so no chunk is
    * a strict suffix of its predecessor). Zero-token docs emit nothing.
    *
    * Pure per-doc array expressions (slice/sequence/array_join) after one
    * narrow projection — no shuffle at all; chunk text re-joins tokens with
    * single spaces, so the output is whitespace-normalized by construction.
    *
    * @return (doc_id, chunk_id, start_tok, n_tok_chunk, chunk_text)
    */
  def chunkOverlap(docs: DataFrame, chunkSize: Int = 64, overlap: Int = 16): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got $overlap/$chunkSize")
    val stride = (chunkSize - overlap).toLong
    val toks = filter(split(col("text"), "\\s+"), t => length(t) > 0)
    val base = docs.select(col("doc_id"), toks.as("tk"))
      .filter(size(col("tk")) > 0)
      .withColumn("n", size(col("tk")).cast("long"))
    // ceil((n - chunkSize)/stride) in exact integer arithmetic, floored at 0
    // (Column./ is double division; floor+cast is exact for these magnitudes)
    val jmax = floor((greatest(lit(0L), col("n") - chunkSize) + (stride - 1L)) / stride)
      .cast("long")
    base.select(col("doc_id"), col("tk"),
        explode(sequence(lit(0L), jmax)).as("chunk_id"))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("piece",
        slice(col("tk"), (col("start_tok") + 1L).cast("int"), lit(chunkSize)))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        size(col("piece")).cast("long").as("n_tok_chunk"),
        array_join(col("piece"), " ").as("chunk_text"))
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
    * the MOSS code-plagiarism sketch) at token level: hash every k-gram of
    * the token stream, slide a window of `w` consecutive gram hashes, and in
    * each window pick the minimum hash (RIGHTMOST occurrence on ties); the
    * output is the distinct picked (position, hash) set per document. Any
    * shared substring of ≥ w+k−1 tokens between two documents is guaranteed
    * to share a fingerprint — the property exact-dup spans and MinHash both
    * lack at this granularity.
    *
    * Gram hash = the [[fingerprintsLcg]] LCG fold over DENSE-RANK token ids,
    * so a SQL oracle replays every pick bit-for-bit (the global-rank
    * vocabulary is the documented oracle-scale concession; production use
    * swaps xxhash64 grams, same plan shape). Spark shape: gram hashes are
    * ROWS (doc_id, gpos, gh); the window min is one frame aggregate over the
    * per-doc ordering and the rightmost-tie pick is one self-join bounded to
    * the w-row frame — all relational, skew-free (per-doc work ∝ doc length).
    * Docs shorter than k+w−1 tokens emit nothing (no full window exists).
    *
    * @return (doc_id, pos, fp) — pos = gram start offset in the token stream
    */
  def winnowLcg(docs: DataFrame, k: Int = 4, w: Int = 5): DataFrame = {
    require(k >= 1 && w >= 1, s"need k,w >= 1, got $k/$w")
    val P = 2147483647L
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val tokStream = docs.select(col("doc_id"), posexplode(toks).as(Seq("pos", "tok")))
    val vocab = tokStream.select("tok").distinct()
      .withColumn("sid", (dense_rank().over(
        org.apache.spark.sql.expressions.Window.orderBy("tok")) - 1).cast("long"))
    val sids = tokStream.join(vocab, Seq("tok"))
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("sid")))),
        s => s.getField("sid")).as("sids"))
      .filter(size(col("sids")) >= k)
    val grams = sids.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), size(col("sids")) - k), i =>
        aggregate(slice(col("sids"), i + 1, lit(k)), lit(0L),
          (a, x) => (a * 8191L + x + 1L) % P))).as(Seq("gpos", "gh")))
    val perDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val frame = perDoc.orderBy("gpos").rowsBetween(0, w - 1)
    val windows = grams
      .withColumn("minh", min(col("gh")).over(frame))
      .withColumn("ng", count(lit(1)).over(perDoc))
      .filter(col("gpos") <= col("ng") - w) // only complete windows
    windows.as("f").join(grams.as("g"),
        col("g.doc_id") === col("f.doc_id") &&
        col("g.gpos").between(col("f.gpos"), col("f.gpos") + (w - 1)) &&
        col("g.gh") === col("f.minh"))
      .groupBy(col("f.doc_id").as("doc_id"), col("f.gpos").as("ws"),
        col("f.minh").as("fp"))
      .agg(max(col("g.gpos")).cast("long").as("pos")) // rightmost minimal in the window
      .select(col("doc_id"), col("pos"), col("fp")).distinct()
  }

  /** Pointwise mutual information of adjacent word pairs — the collocation
    * detector (Church & Hanks): PMI(a,b) = ln( P(a,b) / (P(a)·P(b)) ) with
    * P(a,b) over the adjacent-bigram stream and P(·) over the token stream.
    * Every count is an exact integer (two corpus-sized groupBys + two
    * 1-row broadcast totals); the single float op is one ln of the exact
    * rational (c12·Nt²)/(Nb·c1·c2), so engines agree to rounding.
    *
    * @return (t1, t2, c12, c1, c2, pmi) for bigrams with c12 ≥ minCount
    */
  def pmiBigrams(docs: DataFrame, minCount: Long = 2): DataFrame = {
    val tk = filter(split(lower(col("text")), "[^a-z]+"), t => length(t) > 0)
    // slice length must be >= 0: token-free docs contribute no pairs
    val adj = when(size(tk) >= 2,
      arrays_zip(slice(tk, lit(1), size(tk) - 1), slice(tk, lit(2), size(tk) - 1)))
      .otherwise(array())
    val pairs = docs.select(explode(adj).as("p"))
      .select(col("p.0").as("t1"), col("p.1").as("t2"))
    val big = pairs.groupBy("t1", "t2").agg(count(lit(1)).as("c12"))
    val toks = docs.select(explode(tk).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val totals = big.agg(sum(col("c12")).as("nb"))
      .crossJoin(toks.agg(sum(col("c")).as("nt")))
    val dec = "decimal(38,0)"
    big.filter(col("c12") >= minCount)
      .join(toks.select(col("t").as("t1"), col("c").as("c1")), Seq("t1"))
      .join(toks.select(col("t").as("t2"), col("c").as("c2")), Seq("t2"))
      .crossJoin(broadcast(totals))
      .select(col("t1"), col("t2"), col("c12"), col("c1"), col("c2"),
        log((col("c12").cast(dec) * col("nt").cast(dec) * col("nt").cast(dec))
            .cast("double")
          / (col("nb").cast(dec) * col("c1").cast(dec) * col("c2").cast(dec))
            .cast("double")).as("pmi"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of two
    * top-K rankings — the standard hybrid-retrieval combiner (lexical BM25
    * ∪ a second ranking): score(d) = Σ over the lists containing d of
    * 1/(kRrf + rank_d). Ranks are exact integers and each term is one IEEE
    * division in a fixed order, so the fused scores — and the (rrf DESC,
    * doc_id) fused order — are engine-exact. Absent-list ranks report 0.
    *
    * Scale shape: both inputs are already top-K lists (K rows each); the
    * join, window, and output are all K-sized. The expensive work lives in
    * the rankers, not here.
    *
    * @param a,b (doc_id, rk) top-K lists
    * @return (doc_id, rk_a, rk_b, rrf, fused_rk) — fused top-K
    */
  def rrfFuse(a: DataFrame, b: DataFrame, kRrf: Int = 60,
              topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val aa = a.select(col("doc_id"), col("rk").as("rk_a"))
    val bb = b.select(col("doc_id"), col("rk").as("rk_b"))
    val rrf = coalesce(lit(1.0) / (lit(kRrf) + col("rk_a")), lit(0.0)) +
      coalesce(lit(1.0) / (lit(kRrf) + col("rk_b")), lit(0.0))
    aa.join(bb, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), coalesce(col("rk_a"), lit(0L)).as("rk_a"),
        coalesce(col("rk_b"), lit(0L)).as("rk_b"), rrf.as("rrf"))
      .withColumn("fused_rk", row_number()
        .over(Window.orderBy(col("rrf").desc, col("doc_id"))).cast("long"))
      .filter(col("fused_rk") <= topK)
      .select(col("doc_id"), col("rk_a"), col("rk_b"),
        round(col("rrf"), 8).as("rrf"), col("fused_rk"))
  }

  /** TextRank keywords (Mihalcea & Tarau): the engine running on its own
    * output — build the word co-occurrence graph (adjacent pairs, canonical
    * undirected, integer co-occurrence weights, both directions emitted)
    * and rank terms with k fixed WEIGHTED PageRank iterations (the same
    * count-normalized semiring SpMV as algo_pagerank5w, so the unrolled
    * SQL oracle replays it). Graph construction is zero-shuffle per doc
    * (array slices); the corpus-sized shuffle is one (t1,t2) groupBy.
    *
    * @return (term, r) — every term with its round-k score
    */
  def textrank(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
               k: Int = 5): DataFrame = {
    val tk = filter(split(lower(col("text")), "[^a-z]+"), t => length(t) > 0)
    val adj = when(size(tk) >= 2,
      arrays_zip(slice(tk, lit(1), size(tk) - 1), slice(tk, lit(2), size(tk) - 1)))
      .otherwise(array())
    val pairs = docs.select(explode(adj).as("p"))
      .select(least(col("p.0"), col("p.1")).as("u"),
        greatest(col("p.0"), col("p.1")).as("v"))
      .filter(col("u") =!= col("v"))
    val canon = pairs.groupBy("u", "v").agg(count(lit(1)).cast("double").as("w"))
    val edges = canon.select(col("u").as("src"), col("v").as("dst"), col("w"))
      .unionByName(canon.select(col("v").as("src"), col("u").as("dst"), col("w")))
    graft.algos.PageRank.runFixed(spark, edges, k = k, weighted = true)
      .select(col("id").as("term"), col("r"))
  }

  /** Top-K vocabulary coverage — the tokenizer-design curve: for each K,
    * how many of the corpus' token OCCURRENCES the K most frequent types
    * cover (plus the type count actually used, capped by the vocabulary).
    * Every column is an exact integer. Ordering is (count desc, token asc)
    * ranked DISTRIBUTEDLY via [[graft.core.Ranking]] — never a single-task
    * global window; the K prefix filter is a broadcast theta-join of the
    * few K rows against the ranked vocabulary.
    */
  def vocabCoverage(docs: DataFrame,
                    ks: Seq[Long] = Seq(10L, 100L, 1000L)): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val cnt = docs.select(explode(toks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val ranked = graft.core.Ranking.denseRank(
      cnt.withColumn("nc", -col("c")), "rk", "nc", "tok")
    val total = cnt.agg(sum(col("c")).as("total_occurrences"),
      count(lit(1)).as("vocab_size"))
    ks.toDF("k").join(ranked, col("rk") < col("k"))
      .groupBy("k").agg(count(lit(1)).as("types"), sum(col("c")).as("covered"))
      .crossJoin(total)
  }
}
