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
}
