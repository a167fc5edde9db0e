package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.{BpeTrainer, Unigram, WordPiece}
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
      FROM agg"""), bench = false),

    // WordPiece INFERENCE (operators.WordPiece): corpus-derived piece
    // vocabulary (top word-initial + top "##"-continuation n-grams,
    // frequency-weighted, tie on piece — a deterministic total order),
    // then greedy longest-match-first tokenization. The oracle rebuilds
    // the identical vocabulary in SQL and replays the greedy matcher as
    // a RECURSIVE CTE: each step left-joins the 4 candidate substring
    // lengths (longest wins via COALESCE; near the word end the shorter
    // probes coincide, which is exactly the min(maxPiece, remaining)
    // start), advancing by the matched length; a no-match collapses the
    // word to one [UNK] (5 chars — cannot collide with <=4-char pieces).
    QueryDef("q_wordpiece", (s, dir) => {
      val docs = t(s, dir, "documents")
      val wc = BpeTrainer.wordCounts(docs, "text")
      val (init, cont) = WordPiece.buildVocab(wc, initK = 60, contK = 120)
      docs
        .select(col("source"),
          WordPiece.tokenize(col("text"), init, cont).as("toks"))
        .select(col("source"), size(col("toks")).as("nt"),
          size(filter(col("toks"), x => x === lit("[UNK]"))).as("nu"))
        .groupBy(col("source"))
        .agg(sum(col("nt")).cast("long").as("n_tokens"),
          sum(col("nu")).cast("long").as("n_unk"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("source"))
    }, Some("""
      WITH RECURSIVE wc AS (
        SELECT w AS word, COUNT(*) AS freq
        FROM (SELECT unnest(string_split_regex(text, '\s+')) AS w FROM documents)
        WHERE len(w) > 0 GROUP BY w),
      init_c AS (
        SELECT piece FROM (
          SELECT substr(word, 1, n) AS piece, SUM(freq) AS wt
          FROM wc, (SELECT unnest([1, 2, 3, 4]) AS n) ln
          WHERE n <= len(word)
          GROUP BY 1 ORDER BY wt DESC, piece LIMIT 60)),
      cont_c AS (
        SELECT piece FROM (
          SELECT substr(word, p, n) AS piece, SUM(freq) AS wt
          FROM wc,
            (SELECT unnest(generate_series(2, 40)) AS p) pp,
            (SELECT unnest([1, 2, 3, 4]) AS n) ln
          WHERE p <= len(word) AND n <= len(word) - p + 1
          GROUP BY 1 ORDER BY wt DESC, piece LIMIT 120)),
      uw AS (SELECT DISTINCT word AS w FROM wc),
      tk AS (
        SELECT w, 1 AS pos, CAST([] AS VARCHAR[]) AS toks FROM uw
        UNION ALL
        SELECT w,
          CASE WHEN raw IS NULL THEN len(w) + 1 ELSE pos + len(raw) END,
          CASE WHEN raw IS NULL THEN ['[UNK]']
               WHEN pos = 1 THEN list_append(toks, raw)
               ELSE list_append(toks, '##' || raw) END
        FROM (
          SELECT t0.w, t0.pos, t0.toks,
            COALESCE(i4.piece, i3.piece, i2.piece, i1.piece,
                     c4.piece, c3.piece, c2.piece, c1.piece) AS raw
          FROM tk t0
          LEFT JOIN init_c i4 ON t0.pos = 1 AND i4.piece = substr(t0.w, t0.pos, 4)
          LEFT JOIN init_c i3 ON t0.pos = 1 AND i3.piece = substr(t0.w, t0.pos, 3)
          LEFT JOIN init_c i2 ON t0.pos = 1 AND i2.piece = substr(t0.w, t0.pos, 2)
          LEFT JOIN init_c i1 ON t0.pos = 1 AND i1.piece = substr(t0.w, t0.pos, 1)
          LEFT JOIN cont_c c4 ON t0.pos > 1 AND c4.piece = substr(t0.w, t0.pos, 4)
          LEFT JOIN cont_c c3 ON t0.pos > 1 AND c3.piece = substr(t0.w, t0.pos, 3)
          LEFT JOIN cont_c c2 ON t0.pos > 1 AND c2.piece = substr(t0.w, t0.pos, 2)
          LEFT JOIN cont_c c1 ON t0.pos > 1 AND c1.piece = substr(t0.w, t0.pos, 1)
          WHERE t0.pos <= len(t0.w))),
      done AS (SELECT w, toks FROM tk WHERE pos = len(w) + 1),
      words_d AS (
        SELECT d.doc_id, d.ws[g.i] AS w
        FROM (SELECT doc_id, string_split_regex(text, '\s+') AS ws
              FROM documents) d,
          (SELECT unnest(generate_series(1, 4000)) AS i) g
        WHERE g.i <= len(d.ws) AND len(d.ws[g.i]) > 0),
      per_doc AS (
        SELECT wd.doc_id,
          SUM(len(dn.toks)) AS n_tok,
          SUM(len(list_filter(dn.toks, x -> x = '[UNK]'))) AS n_unk
        FROM words_d wd JOIN done dn ON dn.w = wd.w
        GROUP BY 1)
      SELECT doc.source,
        CAST(SUM(COALESCE(pd.n_tok, 0)) AS BIGINT) AS n_tokens,
        CAST(SUM(COALESCE(pd.n_unk, 0)) AS BIGINT) AS n_unk,
        COUNT(*) AS n_docs
      FROM documents doc LEFT JOIN per_doc pd ON pd.doc_id = doc.doc_id
      GROUP BY 1 ORDER BY 1""")),

    // Unigram-LM (SentencePiece-family) Viterbi segmentation
    // (operators.Unigram / functions.UnigramSegment): exact-arithmetic
    // objective (fewest pieces, then heaviest, then longest-last-piece)
    // over a top-200-ngram + full-alphabet weighted vocabulary. The
    // oracle rebuilds the vocabulary and replays the Viterbi DP cell by
    // cell as a recursive CTE that carries the per-position (cnt, wt)
    // tables as growing lists, realizing the tie-break as a
    // (cnt, -wt, -j) struct sort — summed token counts AND chosen-piece
    // weights hash-match per source.
    QueryDef("q_unigram_lm", (s, dir) => {
      val docs = t(s, dir, "documents")
      val wc = BpeTrainer.wordCounts(docs, "text")
      val vocab = Unigram.buildVocab(wc, 200)
      docs.select(col("source"), Unigram.segment(col("text"), vocab).as("seg"))
        .groupBy(col("source"))
        .agg(sum(size(col("seg").getField("toks"))).cast("long").as("n_tokens"),
          sum(col("seg").getField("wt")).as("sum_wt"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("source"))
    }, Some("""
      WITH RECURSIVE wc AS MATERIALIZED (
        SELECT w AS word, COUNT(*) AS freq
        FROM (SELECT unnest(string_split_regex(text, '\s+')) AS w FROM documents)
        WHERE len(w) > 0 GROUP BY w),
      grams AS MATERIALIZED (
        SELECT substr(word, p, n) AS piece, CAST(SUM(freq) AS BIGINT) AS w
        FROM wc,
          (SELECT unnest(generate_series(1, 40)) AS p) pp,
          (SELECT unnest([1, 2, 3, 4]) AS n) ln
        WHERE p <= len(word) AND n <= len(word) - p + 1
        GROUP BY 1),
      vocab AS MATERIALIZED (
        -- GROUP BY, not UNION-dedup: inside a WITH RECURSIVE clause
        -- DuckDB (1.0) skips the distinct of a plain UNION in a
        -- NON-recursive member, leaving duplicate (piece, w) rows that
        -- fan out every DP join (the same rows dedup fine outside
        -- RECURSIVE). Both branches carry the same w per piece, so
        -- MAX is a no-op numerically.
        SELECT piece, MAX(w) AS w FROM (
          SELECT piece, w FROM (
            SELECT piece, w FROM grams ORDER BY w DESC, piece LIMIT 200)
          UNION ALL
          SELECT piece, w FROM grams WHERE len(piece) = 1)
        GROUP BY piece),
      uw AS MATERIALIZED (
        SELECT DISTINCT word AS w FROM wc WHERE len(word) <= 40),
      dp AS (
        SELECT w, 0 AS pos, [0] AS cnts, [CAST(0 AS BIGINT)] AS wts FROM uw
        UNION ALL
        SELECT w, pos + 1,
          list_append(cnts, best.cnt), list_append(wts, -best.negwt)
        FROM (
          SELECT t0.w, t0.pos, t0.cnts, t0.wts,
            list_sort(list_filter([
              CASE WHEN v4.piece IS NOT NULL THEN
                {'cnt': t0.cnts[t0.pos - 2] + 1,
                 'negwt': -(t0.wts[t0.pos - 2] + v4.w), 'negj': -4} END,
              CASE WHEN v3.piece IS NOT NULL THEN
                {'cnt': t0.cnts[t0.pos - 1] + 1,
                 'negwt': -(t0.wts[t0.pos - 1] + v3.w), 'negj': -3} END,
              CASE WHEN v2.piece IS NOT NULL THEN
                {'cnt': t0.cnts[t0.pos] + 1,
                 'negwt': -(t0.wts[t0.pos] + v2.w), 'negj': -2} END,
              CASE WHEN v1.piece IS NOT NULL THEN
                {'cnt': t0.cnts[t0.pos + 1] + 1,
                 'negwt': -(t0.wts[t0.pos + 1] + v1.w), 'negj': -1} END
            ], x -> x IS NOT NULL))[1] AS best
          FROM dp t0
          LEFT JOIN vocab v4
            ON t0.pos + 1 >= 4 AND v4.piece = substr(t0.w, t0.pos - 2, 4)
          LEFT JOIN vocab v3
            ON t0.pos + 1 >= 3 AND v3.piece = substr(t0.w, t0.pos - 1, 3)
          LEFT JOIN vocab v2
            ON t0.pos + 1 >= 2 AND v2.piece = substr(t0.w, t0.pos, 2)
          LEFT JOIN vocab v1 ON v1.piece = substr(t0.w, t0.pos + 1, 1)
          WHERE t0.pos < len(t0.w))),
      seg AS (
        SELECT w, cnts[len(w) + 1] AS cnt, wts[len(w) + 1] AS wt
        FROM dp WHERE pos = len(w)),
      segall AS (
        SELECT w, cnt, wt FROM seg
        UNION ALL
        SELECT DISTINCT word AS w, 1 AS cnt, CAST(0 AS BIGINT) AS wt
        FROM wc WHERE len(word) > 40),
      words_d AS (
        SELECT d.doc_id, d.ws[g.i] AS w
        FROM (SELECT doc_id, string_split_regex(text, '\s+') AS ws
              FROM documents) d,
          (SELECT unnest(generate_series(1, 4000)) AS i) g
        WHERE g.i <= len(d.ws) AND len(d.ws[g.i]) > 0),
      per_doc AS (
        SELECT wd.doc_id, SUM(sa.cnt) AS n_tok, SUM(sa.wt) AS swt
        FROM words_d wd JOIN segall sa ON sa.w = wd.w
        GROUP BY 1)
      SELECT doc.source,
        CAST(SUM(COALESCE(pd.n_tok, 0)) AS BIGINT) AS n_tokens,
        CAST(SUM(COALESCE(pd.swt, 0)) AS BIGINT) AS sum_wt,
        COUNT(*) AS n_docs
      FROM documents doc LEFT JOIN per_doc pd ON pd.doc_id = doc.doc_id
      GROUP BY 1 ORDER BY 1"""))
  )
}
