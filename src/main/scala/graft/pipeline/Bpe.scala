package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING as a distributed pipeline — the
  * missing half of the token-counting story (TextStats.tokenCounts only
  * ESTIMATES a BPE count; this learns the actual merge table from the
  * corpus, Sennrich et al. 2016).
  *
  * Scale shape — the classic BPE trick is what makes this distributable:
  * training runs on the WORD VOCABULARY with frequencies, not the corpus.
  * One corpus-sized pass builds (word, count); every merge round after that
  * is a vocabulary-sized pair-count aggregation plus a 1-row argmax
  * `collect` (the schedule is driver-side by nature — each round's winner
  * parameterizes the next round's rewrite). A 100 TB corpus with a 10⁸-row
  * vocabulary trains in k rounds of small aggregations after the single
  * big groupBy.
  *
  * Determinism — every step is engine-exact and SQL-replayable (the
  * oracle unrolls the full k-round schedule in DuckDB):
  *  - words: lowercased maximal [a-z]+ runs; symbols: single chars + a
  *    final `</w>` end marker (the classic within-word BPE universe);
  *  - pair counts: ALL adjacent occurrences weighted by word frequency
  *    (the standard count — overlapping occurrences each count);
  *  - winner: max count, ties broken (left, right) lexicographic;
  *  - rewrite: greedy LEFT-TO-RIGHT non-overlapping merge, expressed as a
  *    carry fold — state is "merged-prefix|carry"; seeing (carry=l, x=r)
  *    closes the merged token into the prefix so it cannot merge again in
  *    the same round (exactly python-BPE's scan). Pure string algebra, so
  *    `functions.aggregate` (engine) and `list_reduce` (oracle) replay it
  *    bit-for-bit. Symbols are drawn from [a-z</w>]+, so ' ' and '|' are
  *    safe separators.
  */
object Bpe {

  val EndTok = "</w>"

  /** Split a word column into single-character symbols + the end marker. */
  private def symsOf(w: org.apache.spark.sql.Column) =
    concat(transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))),
      array(lit(EndTok)))

  /** One greedy left-to-right merge rewrite of a symbol array, as a carry
    * fold (see object doc). `l`/`r` are the round's winning pair. */
  private def applyMerge(syms: org.apache.spark.sql.Column, l: String, r: String) = {
    def pre(acc: org.apache.spark.sql.Column) = substring_index(acc, "|", 1)
    def carry(acc: org.apache.spark.sql.Column) = substring_index(acc, "|", -1)
    def jo(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      when(a === "", b).otherwise(concat(a, lit(" "), b))
    split(
      aggregate(syms, lit("|"),
        (acc, x) =>
          when(carry(acc) === l && x === r, concat(jo(pre(acc), lit(l + r)), lit("|")))
            .when(carry(acc) === "", concat(pre(acc), lit("|"), x))
            .otherwise(concat(jo(pre(acc), carry(acc)), lit("|"), x)),
        acc => when(carry(acc) === "", pre(acc)).otherwise(jo(pre(acc), carry(acc)))),
      " ")
  }

  /** Train `k` merges; returns the schedule (rank, left, right, count) as a
    * driver-side list (it IS driver-sized: k rows). Stops early if no pair
    * remains. */
  def trainMerges(spark: SparkSession, docs: DataFrame, k: Int,
                  textCol: String = "text"): Seq[(Int, String, String, Long)] = {
    require(k >= 1, "k must be >= 1")
    var voc = docs.select(explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => length(t) > 0)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wcnt"))
      .select(col("w"), symsOf(col("w")).as("syms"), col("wcnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    voc.count()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    while (rank <= k) {
      // adjacent pairs via two shifted slices (safe at size 1: empty slices)
      val n1 = size(col("syms")) - 1
      val top = voc.select(col("wcnt"),
          explode(arrays_zip(slice(col("syms"), lit(1), n1),
            slice(col("syms"), lit(2), n1))).as("p"))
        .groupBy(col("p.0").as("l"), col("p.1").as("r"))
        .agg(sum(col("wcnt")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) { rank = k + 1 }
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += ((rank, l, r, c))
        val next = voc.select(col("w"), applyMerge(col("syms"), l, r).as("syms"),
            col("wcnt"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count(); voc.unpersist(false)
        voc = next
        rank += 1
      }
    }
    voc.unpersist(false)
    out.toSeq
  }

  /** The learned merge table as a DataFrame — the driver-facing artifact
    * (what you'd ship next to the tokenizer). */
  def train(spark: SparkSession, docs: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    trainMerges(spark, docs, k)
      .toDF("merge_rank", "lft", "rgt", "cnt")
      .select(col("merge_rank").cast("long"), col("lft"), col("rgt"), col("cnt"))
  }

  /** Tokenize with a learned schedule: per-document BPE token count (and
    * word count) after applying the merges in order. The corpus pass joins
    * each word occurrence to the rewritten vocabulary — token counts ride
    * the (word)-keyed join, text never re-splits per merge.
    */
  def tokenCounts(spark: SparkSession, docs: DataFrame,
                  merges: Seq[(String, String)],
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val words = docs.select(col(idCol),
      explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => length(t) > 0)).as("w"))
    val voc0 = words.select("w").distinct()
      .select(col("w"), symsOf(col("w")).as("syms"))
    val rewritten = merges.foldLeft(voc0) { case (v, (l, r)) =>
      v.select(col("w"), applyMerge(col("syms"), l, r).as("syms"))
    }
    words.join(rewritten.select(col("w"), size(col("syms")).cast("long").as("ntok")),
        Seq("w"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("words"), sum(col("ntok")).as("bpe_tokens"))
  }
}
