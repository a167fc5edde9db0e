package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.BpeTrainer
import Q._

/** BPE tokenizer-training surface (operators.BpeTrainer). Everything is
  * oracle-checked, including the iterative merge loop: each of the 8
  * argmax-merge iterations is replayed in DuckDB as a chained CTE pair
  * (pair-count argmax, then the greedy left-to-right merge fold — a
  * list_reduce over a '|'-joined symbol string, since DuckDB's reduce
  * accumulator must be element-typed), the same technique as
  * q_pagerank's iteration replay. The corpus is ASCII below 0x7C, so
  * the '|' separator and the '</w>' marker cannot collide with word
  * content (asserted impossible by the codepoint scan in TESTDATA).
  */
object BpeQueries {

  /** CTE chain v0..v{n} / m1..m{n}: v0 is the char-level vocabulary
    * (with the source word carried through), mK the K-th argmax merge,
    * vK the vocabulary after applying it. */
  private def mergeChain(n: Int): String = {
    val ctes = Seq.newBuilder[String]
    ctes += """wc AS (
      SELECT w AS word, COUNT(*) AS freq
      FROM (SELECT unnest(string_split_regex(text, '\s+')) AS w
            FROM documents)
      WHERE len(w) > 0 GROUP BY w),
    v0 AS (SELECT word, freq,
      list_append(string_split(word, ''), '</w>') AS s FROM wc)"""
    for (k <- 1 to n) {
      ctes += s"""p$k AS (
      SELECT s[i] AS l, s[i+1] AS r, freq
      FROM v${k - 1}, (SELECT unnest(generate_series(1, 40)) AS i) g
      WHERE i <= len(s) - 1),
    m$k AS (
      SELECT l, r, CAST(SUM(freq) AS BIGINT) AS c
      FROM p$k GROUP BY l, r HAVING SUM(freq) > 1
      ORDER BY c DESC, l, r LIMIT 1)"""
      ctes += s"""v$k AS (
      SELECT word, freq, string_split(list_reduce(s,
        (acc, x) -> CASE WHEN x = m.r
            AND (acc = m.l OR ends_with(acc, '|' || m.l))
          THEN substr(acc, 1, length(acc) - length(m.l)) || m.l || m.r
          ELSE acc || '|' || x END), '|') AS s
      FROM v${k - 1}, m$k AS m)"""
    }
    ctes.result().mkString(",\n    ")
  }

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
    // Oracle = the 8 argmax iterations replayed as chained CTEs.
    QueryDef("q_bpe_merges", (s, dir) => {
      val words = BpeTrainer.wordCounts(t(s, dir, "documents"), "text")
      val (merges, vocab) = BpeTrainer.train(words, numMerges = 8)
      vocab.unpersist()
      import s.implicits._
      merges.toDF().select(col("step"), col("left"), col("right"),
        col("merged"), col("pairCount").as("pair_count"))
    }, Some {
      val sel = (1 to 8).map(k =>
        s"""SELECT $k AS step, l AS "left", r AS "right",
           l || r AS merged, c AS pair_count FROM m$k""")
      s"WITH ${mergeChain(8)}\n${sel.mkString("\nUNION ALL\n")}"
    }),

    // Inference path: tokenize the corpus with the learned merges —
    // a zero-shuffle projection over documents. Oracle: the replayed
    // chain's FINAL vocabulary is exactly the per-word token table, so
    // each document is its words' token lists concatenated in order.
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
    }, Some(s"""
      WITH ${mergeChain(8)},
      docw AS (
        SELECT d.doc_id, g.i, d.ws[g.i] AS w
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS ws
              FROM documents) d,
          (SELECT unnest(generate_series(1, 4000)) AS i) g
        WHERE g.i <= len(d.ws) AND len(d.ws[g.i]) > 0),
      tok AS (
        SELECT docw.doc_id, docw.i, v8.s
        FROM docw JOIN v8 ON v8.word = docw.w),
      agg AS (
        SELECT doc_id, flatten(list(s ORDER BY i)) AS toks
        FROM tok GROUP BY doc_id)
      SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
        substr(array_to_string(toks, '|'), 1, 120) AS head_tokens
      FROM agg"""), bench = false)
  )
}
