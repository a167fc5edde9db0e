package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.BpeTrainer
import Q._

/** BPE tokenizer-training surface (operators.BpeTrainer). The
  * pair-count statistics pass is fully SQL-expressible so q_bpe_pairs is
  * oracle-checked; the iterative merge loop and the tokenize projection
  * are argmax-dependent sequences DuckDB cannot replay in one query, so
  * they get rows-only checks plus BpeSpec's hand-computed Sennrich
  * example. */
object BpeQueries {

  val defs: Seq[QueryDef] = Seq(

    // Weighted symbol-pair counts of the character-level vocabulary —
    // the statistic every merge iteration argmaxes over (one corpus
    // shuffle for word counts, then vocab-sized work only).
    QueryDef("q_bpe_pairs", (s, dir) => {
      val words = BpeTrainer.wordCounts(t(s, dir, "documents"), "text")
      BpeTrainer.pairCounts(BpeTrainer.initVocab(words))
        .orderBy(col("pair_count").desc, col("l"), col("r"))
        .limit(20)
    }, Some("""
      WITH wc AS (
        SELECT w AS word, COUNT(*) AS freq
        FROM (SELECT unnest(string_split_regex(text, '\s+')) AS w FROM documents)
        WHERE len(w) > 0 GROUP BY w),
      sym AS (
        SELECT freq, list_append(string_split(word, ''), '</w>') AS s FROM wc),
      pr AS (
        SELECT s[i] AS l, s[i+1] AS r, freq
        FROM sym, (SELECT unnest(generate_series(1, 32)) AS i) g
        WHERE i <= len(s) - 1)
      SELECT l, r, CAST(SUM(freq) AS BIGINT) AS pair_count
      FROM pr GROUP BY l, r
      ORDER BY pair_count DESC, l, r
      LIMIT 20""")),

    // Full training run: the learned merge table IS the tokenizer model.
    QueryDef("q_bpe_merges", (s, dir) => {
      val words = BpeTrainer.wordCounts(t(s, dir, "documents"), "text")
      val (merges, vocab) = BpeTrainer.train(words, numMerges = 8)
      vocab.unpersist()
      import s.implicits._
      merges.toDF().select(col("step"), col("left"), col("right"),
        col("merged"), col("pairCount").as("pair_count"))
    }, None),

    // Inference path: tokenize the corpus with the learned merges —
    // a zero-shuffle projection over documents.
    QueryDef("q_bpe_tokenize", (s, dir) => {
      val words = BpeTrainer.wordCounts(t(s, dir, "documents"), "text")
      val (merges, vocab) = BpeTrainer.train(words, numMerges = 8)
      vocab.unpersist()
      t(s, dir, "documents")
        .select(col("doc_id"),
          BpeTrainer.tokenize(col("text"), merges).as("toks"))
        .select(col("doc_id"), size(col("toks")).as("n_tokens"),
          // scalar-ize for the driver's comparator (no array columns)
          substring(concat_ws("|", col("toks")), 1, 120).as("head_tokens"))
      // bench=false: re-trains the same model q_bpe_merges already
      // times; the projection itself is zero-shuffle
    }, None, bench = false)
  )
}
