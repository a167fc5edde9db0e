package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the
  * vocabulary-building stage of a training-data pipeline, missing from
  * every SQL engine's surface.
  *
  * Scale shape (100 TB): the corpus is touched EXACTLY ONCE — one
  * explode + groupBy(word) shuffle producing the word-frequency table,
  * which is vocab-sized (millions of rows, not corpus-sized). All k
  * merge iterations then run against that small table: each iteration is
  * one aggregate (pair counts weighted by word frequency) + one argmax
  * pulled to the driver (a single row — legitimate driver-side model
  * state, like a k-means centroid set) + one projection applying the
  * merge. The per-iteration DataFrame is persisted and the previous one
  * released so the lineage (and recompute cost) never grows with k.
  *
  * Merge application is the standard greedy left-to-right fold over the
  * symbol array, expressed with the `aggregate` higher-order function —
  * codegen'd per row, no UDF.
  */
object BpeTrainer {

  /** One learned merge: `left`+`right` → `merged`, with the weighted
    * pair count that won the argmax at that step. */
  final case class MergeStep(step: Int, left: String, right: String,
      merged: String, pairCount: Long)

  private val EndOfWord = "</w>"

  /** Word-frequency table: the single corpus-sized shuffle. */
  def wordCounts(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbol sequence: characters plus the end-of-word marker. */
  private def initialSymbols(word: Column): Column =
    concat(split(word, ""), array(lit(EndOfWord)))

  /** Adjacent symbol pairs of `s` as (l, r) structs. */
  private def pairs(s: Column): Column =
    transform(slice(s, lit(1), size(s) - 1),
      (x, i) => struct(x.as("l"), element_at(s, i + lit(2)).as("r")))

  /** Greedy left-to-right merge of (left, right) → left+right. */
  private def applyMerge(s: Column, left: String, right: String): Column =
    aggregate(s, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(left) && x === lit(right),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
        .otherwise(concat(acc, array(x))))

  /** Weighted pair-count table for a (symbols, freq) vocabulary — one
    * aggregate over the vocab-sized table. Exposed for the oracle query. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(explode(pairs(col("symbols"))).as("p"), col("freq"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("pair_count"))

  /** Character-level vocabulary from a word-frequency table. */
  def initVocab(words: DataFrame): DataFrame =
    words.select(col("word"), col("freq"),
      initialSymbols(col("word")).as("symbols"))

  /** Learn `numMerges` merges. Returns the merge list (the tokenizer
    * model) and the final symbolized vocabulary. Ties in the argmax
    * break on (count desc, l asc, r asc) — fully deterministic. */
  def train(words: DataFrame, numMerges: Int): (Seq[MergeStep], DataFrame) = {
    var vocab = initVocab(words).persist(StorageLevel.MEMORY_AND_DISK)
    vocab.count() // materialize before the loop so persists don't nest
    val merges = scala.collection.mutable.ArrayBuffer.empty[MergeStep]
    // ONE action per iteration: the argmax collect both reads the
    // statistic AND (as a side effect of computing over a fresh persist)
    // populates the current vocab's cache — so the PREVIOUS iteration's
    // cache can only be dropped after that collect has run, one step
    // late. The earlier persist+count idiom paid a second job per
    // iteration just to materialize eagerly.
    var prev: DataFrame = null
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      val top = pairCounts(vocab)
        .filter(col("pair_count") > 1)
        .orderBy(col("pair_count").desc, col("l"), col("r"))
        .limit(1).collect()
      // vocab's cache is now populated; its parent is safe to drop
      if (prev != null) prev.unpersist()
      if (top.isEmpty) exhausted = true
      else {
        val row = top.head
        val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += MergeStep(step + 1, l, r, l + r, c)
        val next = vocab.withColumn("symbols", applyMerge(col("symbols"), l, r))
          .persist(StorageLevel.MEMORY_AND_DISK)
        prev = vocab
        vocab = next
        step += 1
      }
    }
    // NOTE: the final vocab's cache is not yet materialized (no action
    // has touched it), so its cached parent `prev` is deliberately left
    // persisted — a consumer of the returned vocab computes one
    // projection from that cache instead of replaying every merge; the
    // vocab-sized block is released with the session (or the caller's
    // unpersist).
    (merges.toSeq, vocab)
  }

  /** Tokenize a text column with a learned merge list: per-word char
    * split + the merges replayed in order. Pure projection, zero
    * shuffle — the inference path for the trained tokenizer. */
  def tokenize(textCol: Column, merges: Seq[MergeStep]): Column = {
    val perWord = (w: Column) =>
      merges.foldLeft(initialSymbols(w))((s, m) => applyMerge(s, m.left, m.right))
    flatten(transform(
      filter(split(textCol, "\\s+"), w => length(w) > 0), perWord))
  }
}
