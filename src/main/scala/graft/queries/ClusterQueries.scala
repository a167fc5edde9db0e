package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.{Drift, GlobalRank, HashedTfIdf, KMeans, SequencePacking, Sketches}
import Q._

/** Clustering + curation-recipe surface: distributed k-means (full
  * Lloyd's over the corpus, engine-exact by integer quantization),
  * the DCLM-style cluster-balanced cap, the C4 page/line filters
  * (Raffel et al. 2020, §2.2 heuristics), and an exact stratified
  * train/test split (per-stratum exact proportions, not hash-expected).
  *
  * Every query is fully value-oracled: the k-means oracle replays each
  * Lloyd round as chained CTEs (integer squared-L2, floor-quantized
  * centroid updates — the same bits in both engines), the same
  * discipline as the LPA / k-core / PageRank oracles.
  */
object ClusterQueries {

  private val K = 6        // clusters
  private val Iters = 2    // Lloyd update rounds
  private val Scale = 1024 // quantization grid
  private val Cap = 40     // cluster-balanced cap at sf0.01

  /** Portable hash of an integer id column, DuckDB side. */
  private def hx(c: String) =
    s"('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 8))::BIGINT"

  /** Chained-CTE replay of `KMeans.fit(k=K, iters=Iters)`: quantize,
    * hash-seeded init, then per round assignment (exact integer L2,
    * ties to the smaller cluster id) and floor-quantized centroid
    * update. Ends with CTE `af(vec_id, cid, d)` — the assignment under
    * the final centroids. */
  private def kmeansCtes: String = {
    val rounds = (1 to Iters).map { i =>
      val (prevC, a, c) = (s"c${i - 1}", s"a$i", s"c$i")
      s"""
      d$i AS (
        SELECT x.vec_id, c.cid,
          CAST(SUM((x.v - c.v) * (x.v - c.v)) AS BIGINT) AS d
        FROM xq x JOIN $prevC c ON c.pos = x.pos
        GROUP BY 1, 2),
      $a AS (
        SELECT vec_id, cid, d FROM d$i
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1),
      $c AS (
        SELECT a.cid, x.pos,
          CAST(floor(CAST(SUM(x.v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS v
        FROM $a a JOIN xq x ON x.vec_id = a.vec_id
        GROUP BY 1, 2),"""
    }.mkString
    s"""
      xq AS (
        SELECT vec_id, i - 1 AS pos, CAST(floor(x * $Scale + 0.5) AS BIGINT) AS v
        FROM (
          SELECT vec_id,
            unnest(CAST(embedding AS DOUBLE[])) AS x,
            unnest(generate_series(1, len(embedding))) AS i
          FROM embeddings)),
      seeds AS (
        SELECT vec_id,
          CAST(row_number() OVER (ORDER BY ${hx("vec_id")}, vec_id) AS INT) - 1 AS cid
        FROM embeddings
        QUALIFY row_number() OVER (ORDER BY ${hx("vec_id")}, vec_id) <= $K),
      c0 AS (SELECT s.cid, x.pos, x.v FROM seeds s JOIN xq x ON x.vec_id = s.vec_id),
      $rounds
      df AS (
        SELECT x.vec_id, c.cid,
          CAST(SUM((x.v - c.v) * (x.v - c.v)) AS BIGINT) AS d
        FROM xq x JOIN c$Iters c ON c.pos = x.pos
        GROUP BY 1, 2),
      af AS (
        SELECT vec_id, cid, d FROM df
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1)"""
  }

  val defs: Seq[QueryDef] = Seq(

    // Distributed k-means: full-corpus Lloyd's, 2 update rounds + final
    // assignment. The per-row assignment table (cluster AND exact
    // integer distance) hash-matches the chained-CTE replay.
    QueryDef("q_kmeans", (s, dir) => {
      KMeans.fit(t(s, dir, "embeddings"), "vec_id", "embedding",
        K, Iters, Scale).assignments.orderBy(col("vec_id"))
    }, Some(s"""
      WITH $kmeansCtes
      SELECT vec_id, cid AS cluster, d AS dist FROM af ORDER BY vec_id""")),

    // Cluster-balanced cap (DCLM-style "cluster then cap"): at most
    // $Cap docs per k-means cluster, chosen by the deterministic
    // portable-hash sample rank. Compiles to WindowGroupLimit — the
    // map-side partial top-k ships at most Cap rows per cluster.
    QueryDef("q_cluster_cap", (s, dir) => {
      val m = KMeans.fit(t(s, dir, "embeddings"), "vec_id", "embedding",
        K, Iters, Scale)
      KMeans.capPerCluster(m.assignments, "vec_id", Cap)
        .select(col("vec_id"), col("cluster")).orderBy(col("vec_id"))
    }, Some(s"""
      WITH $kmeansCtes
      SELECT vec_id, cid AS cluster FROM af
      QUALIFY row_number() OVER (PARTITION BY cid
        ORDER BY ${hx("vec_id")}, vec_id) <= $Cap
      ORDER BY vec_id""")),

    // C4 page/line heuristics (Raffel et al. 2020 §2.2): keep lines of
    // >= 5 words ending in terminal punctuation, drop lines mentioning
    // "javascript", drop pages containing "lorem ipsum" or "{", keep
    // pages with >= 3 retained lines. One codegen'd scan, no shuffle.
    // The synthetic corpus is single-line and punctuation-free, so the
    // demo first SYNTHESIZES multi-line pages deterministically (both
    // engines apply the identical transform): sentence breaks at every
    // ' value ' token plus injected javascript / lorem-ipsum / brace
    // lines on doc_id residues — every rule genuinely fires and the
    // result is a non-empty, non-trivial keep set.
    QueryDef("q_c4_filters", (s, dir) => {
      t(s, dir, "documents")
        .withColumn("__page", concat(
          expr("replace(text, ' value ', concat('.', chr(10)))"),
          when(col("doc_id") % 13 === 0,
            lit("\nplease enable javascript to continue.")).otherwise(lit("")),
          when(col("doc_id") % 7 === 0, lit("\nlorem ipsum")).otherwise(lit("")),
          when(col("doc_id") % 11 === 0, lit("\nx { y")).otherwise(lit(""))))
        .withColumn("__kept", expr("""
          filter(split(__page, '\n'), l ->
            size(split(trim(l), '\\s+')) >= 5
            AND right(rtrim(l), 1) IN ('.', '!', '?', '"')
            AND NOT contains(lower(l), 'javascript'))"""))
        .filter(size(col("__kept")) >= 3
          && !lower(col("__page")).contains("lorem ipsum")
          && !col("__page").contains("{"))
        .select(col("doc_id"), size(col("__kept")).as("kept_lines"),
          length(concat_ws("\n", col("__kept"))).as("clean_chars"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH pages AS (
        SELECT doc_id,
          replace(text, ' value ', '.' || chr(10))
          || CASE WHEN doc_id % 13 = 0
               THEN chr(10) || 'please enable javascript to continue.'
               ELSE '' END
          || CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'lorem ipsum' ELSE '' END
          || CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'x { y' ELSE '' END
            AS page
        FROM documents),
      k AS (
        SELECT doc_id,
          list_filter(string_split(page, chr(10)), l ->
            len(string_split_regex(trim(l), '\s+')) >= 5
            AND right(rtrim(l), 1) IN ('.', '!', '?', '"')
            AND NOT contains(lower(l), 'javascript')) AS kept
        FROM pages
        WHERE NOT contains(lower(page), 'lorem ipsum')
          AND NOT contains(page, '{'))
      SELECT doc_id, CAST(len(kept) AS INT) AS kept_lines,
        CAST(length(list_aggregate(kept, 'string_agg', chr(10))) AS INT)
          AS clean_chars
      FROM k WHERE len(kept) >= 3 ORDER BY doc_id""")),

    // Corpus-wide duplicate-line removal (RefinedWeb/C4-style): every
    // non-blank trimmed line is kept only at its FIRST occurrence in
    // (doc_id, position) order; docs report surviving line count and
    // chars. The keep rule is an argmin aggregate (min(struct(doc,pos))
    // per line — map-side combinable, no window state), so the only
    // shuffles are line-hash and doc_id, both O(corpus lines).
    QueryDef("q_line_dedup", (s, dir) => {
      val lines = t(s, dir, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), "\n"))
          .as(Seq("pos", "line")))
        .select(col("doc_id"), col("pos"), trim(col("line")).as("l"))
        .filter(length(col("l")) > 0)
      lines.groupBy(col("l"))
        .agg(min(struct(col("doc_id"), col("pos"))).as("k"))
        .groupBy(col("k.doc_id").as("doc_id"))
        .agg(count(lit(1)).as("kept_lines"),
          sum(length(col("l")).cast("long")).as("kept_chars"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH l AS (
        SELECT doc_id, i AS pos, trim(x) AS line
        FROM (
          SELECT doc_id, unnest(string_split(text, chr(10))) AS x,
            unnest(generate_series(1, len(string_split(text, chr(10))))) AS i
          FROM documents)
        WHERE length(trim(x)) > 0),
      k AS (
        SELECT doc_id, line FROM l
        QUALIFY row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) = 1)
      SELECT doc_id, COUNT(*) AS kept_lines,
        CAST(SUM(length(line)) AS BIGINT) AS kept_chars
      FROM k GROUP BY 1 ORDER BY doc_id""")),

    // User-journey Markov transition matrix: per-user event bigrams
    // (lag over the time order) → global transition counts and
    // 2^-20-quantized row-normalized probabilities computed ENTIRELY
    // in integer arithmetic ((cnt·2^20) div total — no doubles
    // anywhere). The per-prev totals table is tiny (|event_type|²
    // rows) and broadcasts.
    QueryDef("q_markov_transitions", (s, dir) => {
      val w = Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val tr = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val tot = tr.groupBy(col("prev")).agg(sum(col("cnt")).as("total"))
      tr.join(broadcast(tot), Seq("prev"))
        .select(col("prev"), col("event_type"), col("cnt"),
          expr("(cnt * 1048576) div total").as("prob_q"))
        .orderBy(col("prev"), col("event_type"))
    }, Some("""
      WITH tr AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev,
               event_type
        FROM events),
      c AS (SELECT prev, event_type, COUNT(*) AS cnt FROM tr
            WHERE prev IS NOT NULL GROUP BY 1, 2),
      tt AS (SELECT prev, CAST(SUM(cnt) AS BIGINT) AS total FROM c GROUP BY 1)
      SELECT c.prev, c.event_type, c.cnt,
        (c.cnt * 1048576) // tt.total AS prob_q
      FROM c JOIN tt USING (prev) ORDER BY 1, 2""")),

    // Distributed time-series subsequence search (UCR-suite shape, cf.
    // "Time Series Similarity Search for Streaming Data in Distributed
    // Systems", EDBT 2019): the query pattern is user 0's first 8
    // values; candidate windows are EVERY length-8 contiguous window
    // of every user's value series, formed with lead() over the
    // (user, time) window — no per-user arrays, state is 8 rows per
    // partition at any series length. Values are exact integer cents
    // (decimal-cast discipline), distances exact integer sums, global
    // top-10 via TakeOrderedAndProject. The pattern rides as 8 plan
    // literals (bounded driver model state).
    QueryDef("q_ts_subseq_search", (s, dir) => {
      val M = 8
      val ev = t(s, dir, "events").select(
        col("user_id"), col("event_id"), col("ts"),
        (money(col("value")) * 100).cast("long").as("v"))
      val pat = ev.filter(col("user_id") === 0)
        .orderBy(col("ts"), col("event_id")).limit(M)
        .select(col("v")).collect().map(_.getLong(0))
      require(pat.length == M,
        s"query pattern needs $M events for user 0, got ${pat.length}")
      val win = Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val lagged = ev.select(
        Seq(col("user_id"), col("event_id").as("start_id"),
          col("v").as("v0")) ++
        (1 until M).map(i => lead(col("v"), i).over(win).as(s"v$i")): _*)
      val dist = (0 until M).map { i =>
        val d = col(s"v$i") - lit(pat(i)); d * d
      }.reduce(_ + _)
      lagged.filter(col(s"v${M - 1}").isNotNull)
        .select(col("user_id"), col("start_id"), dist.as("dist"))
        .orderBy(col("dist"), col("user_id"), col("start_id"))
        .limit(10)
    }, Some("""
      WITH s AS (
        SELECT user_id, event_id, ts,
          CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
        FROM events),
      qp AS (
        SELECT MAX(CASE WHEN i = 1 THEN v END) AS q0,
               MAX(CASE WHEN i = 2 THEN v END) AS q1,
               MAX(CASE WHEN i = 3 THEN v END) AS q2,
               MAX(CASE WHEN i = 4 THEN v END) AS q3,
               MAX(CASE WHEN i = 5 THEN v END) AS q4,
               MAX(CASE WHEN i = 6 THEN v END) AS q5,
               MAX(CASE WHEN i = 7 THEN v END) AS q6,
               MAX(CASE WHEN i = 8 THEN v END) AS q7
        FROM (
          SELECT v, row_number() OVER (ORDER BY ts, event_id) AS i
          FROM s WHERE user_id = 0) WHERE i <= 8),
      w AS (
        SELECT user_id, event_id AS start_id, v AS v0,
          lead(v, 1) OVER win AS v1, lead(v, 2) OVER win AS v2,
          lead(v, 3) OVER win AS v3, lead(v, 4) OVER win AS v4,
          lead(v, 5) OVER win AS v5, lead(v, 6) OVER win AS v6,
          lead(v, 7) OVER win AS v7
        FROM s WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT user_id, start_id,
        (v0-q0)*(v0-q0) + (v1-q1)*(v1-q1) + (v2-q2)*(v2-q2)
        + (v3-q3)*(v3-q3) + (v4-q4)*(v4-q4) + (v5-q5)*(v5-q5)
        + (v6-q6)*(v6-q6) + (v7-q7)*(v7-q7) AS dist
      FROM w, qp WHERE v7 IS NOT NULL
      ORDER BY dist, user_id, start_id LIMIT 10""")),

    // Corpus datasheet ("datasheet for datasets", Gebru et al. 2021):
    // one query, one (metric, key, v) table — doc/token totals, per-
    // lang and per-source shares, exact-duplicate count, and exact
    // length deciles (the value at rank ceil(i*N/10) under the total
    // (n_chars, doc_id) order). Every value is an exact integer; the
    // whole report replays in DuckDB. Each section is a small
    // aggregate; the decile section's global sort moves only (n_chars,
    // doc_id) pairs.
    QueryDef("q_corpus_datasheet", (s, dir) => {
      val d = t(s, dir, "documents")
      val toks = d.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      val totals = d.agg(count(lit(1)).as("v")).select(
        lit("docs").as("metric"), lit("all").as("k"), col("v"))
        .unionByName(toks.agg(sum(col("n_tok")).as("v")).select(
          lit("tokens").as("metric"), lit("all").as("k"), col("v")))
      val langs = d.groupBy(col("lang")).agg(count(lit(1)).as("v"))
        .select(lit("lang_share").as("metric"), col("lang").as("k"), col("v"))
      val sources = d.groupBy(col("source")).agg(count(lit(1)).as("v"))
        .select(lit("source_share").as("metric"), col("source").as("k"), col("v"))
      val dups = d.select(md5(col("text")).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1)
        .agg(coalesce(sum(col("c")), lit(0L)).as("v"))
        .select(lit("dup_docs").as("metric"), lit("all").as("k"), col("v"))
      val n = d.count() // driver scalar: rank thresholds are plan literals
      // distributed exact rank — a bare row_number().over(orderBy) would
      // funnel every (n_chars, doc_id) pair through ONE task
      val ranked = GlobalRank.withRank(
        d.select(col("doc_id"), col("n_chars")),
        "r", col("n_chars"), col("doc_id"))
      val deciles = {
        import s.implicits._
        // ceil(i*N/10); a broadcast spec join evaluates the window ONCE
        // and emits one row per decile even when ranks collide at tiny N
        val spec = (1 to 9).map(i => ((i.toLong * n + 9) / 10, i.toString))
          .toDF("rk", "k")
        ranked.join(broadcast(spec), col("r") === col("rk"))
          .select(lit("len_decile").as("metric"), col("k"),
            col("n_chars").as("v"))
      }
      totals.unionByName(langs).unionByName(sources)
        .unionByName(dups).unionByName(deciles)
        .orderBy(col("metric"), col("k"))
    }, Some("""
      WITH docs AS (SELECT doc_id, text, lang, source, n_chars FROM documents),
      n AS (SELECT COUNT(*) AS n FROM docs),
      ranked AS (
        SELECT n_chars, row_number() OVER (ORDER BY n_chars, doc_id) AS r
        FROM docs)
      SELECT 'docs' AS metric, 'all' AS k, COUNT(*) AS v FROM docs
      UNION ALL
      SELECT 'tokens', 'all',
        CAST(SUM(len(string_split(text, ' '))) AS BIGINT) FROM docs
      UNION ALL
      SELECT 'lang_share', lang, COUNT(*) FROM docs GROUP BY lang
      UNION ALL
      SELECT 'source_share', source, COUNT(*) FROM docs GROUP BY source
      UNION ALL
      SELECT 'dup_docs', 'all', CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM (
        SELECT COUNT(*) AS c FROM docs GROUP BY md5(text) HAVING COUNT(*) > 1)
      UNION ALL
      SELECT 'len_decile', CAST(i AS VARCHAR), r.n_chars
      FROM (SELECT unnest(generate_series(1, 9)) AS i) g
      JOIN n ON true
      JOIN ranked r ON r.r = (i * n.n + 9) // 10
      ORDER BY metric, k""")),

    // Contrastive negative sampling: for each of the five pinned
    // anchor docs, 3 deterministic hard-constraint negatives (docs in
    // a DIFFERENT language, ranked by the portable md5 of the
    // (anchor, candidate) pair — a pure function of the data, so the
    // training triplets are retry/repartition-stable). The anchor set
    // broadcasts (5 rows); candidate scan is one corpus pass.
    QueryDef("q_negative_sample", (s, dir) => {
      val docs = t(s, dir, "documents")
      val anchors = docs
        .filter(col("doc_id") % 100 === 0 && col("doc_id") < 500)
        .select(col("doc_id").as("qid"), col("lang").as("qlang"))
      val h = Sketches.portableHash32(concat_ws("|",
        col("qid").cast("string"), col("doc_id").cast("string")))
      broadcast(anchors)
        .join(docs.select(col("doc_id"), col("lang")),
          col("lang") =!= col("qlang"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(h, col("doc_id"))))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("doc_id").as("neg_id"), col("rk"))
        .orderBy(col("qid"), col("rk"))
    }, Some("""
      WITH a AS (
        SELECT doc_id AS qid, lang AS qlang FROM documents
        WHERE doc_id % 100 = 0 AND doc_id < 500),
      c AS (
        SELECT a.qid, d.doc_id AS neg_id,
          row_number() OVER (PARTITION BY a.qid ORDER BY
            ('0x' || substr(md5(CAST(a.qid AS VARCHAR) || '|'
              || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT,
            d.doc_id) AS rk
        FROM a JOIN documents d ON d.lang <> a.qlang)
      SELECT qid, neg_id, CAST(rk AS INT) AS rk
      FROM c WHERE rk <= 3 ORDER BY qid, rk""")),

    // SFT loss-mask spans: treat the first third of each doc's tokens
    // as the prompt, the rest as the completion, pack the corpus into
    // 2048-token context windows (distributed two-phase prefix sum),
    // and emit each doc's loss-mask span in GLOBAL token space —
    // [tok_offset + prompt_tok, tok_offset + n_tok). The trainer
    // masks prompt tokens out of the loss; all arithmetic is integral
    // so the span table replays exactly against the sequential global
    // cumsum.
    QueryDef("q_sft_mask", (s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("p_tok", expr("n_tok div 3"))
      SequencePacking.pack(docs, "doc_id", "n_tok", 2048L)
        .select(col("doc_id"), col("n_tok"), col("p_tok"),
          (col("tok_offset") + col("p_tok")).as("mask_start"),
          (col("tok_offset") + col("n_tok")).as("mask_end"),
          col("seq_first"), col("seq_last"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, n_tok, p_tok,
        off + p_tok AS mask_start,
        off + n_tok AS mask_end,
        off // 2048 AS seq_first,
        (off + n_tok - 1) // 2048 AS seq_last
      FROM (
        SELECT doc_id, n_tok, n_tok // 3 AS p_tok,
          CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS off
        FROM (SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
              FROM documents))
      ORDER BY doc_id""")),

    // Preference-pair (DPO/RLHF) construction: per prompt the
    // (chosen, rejected) response pair = the reward-argmax vs
    // reward-argmin with DETERMINISTIC tie-breaks (higher/lower id
    // respectively), kept only when the reward margin clears a
    // threshold. The Spark-first shape is ONE aggregation of
    // max(struct)/min(struct) per prompt — no rank windows, no
    // self-join, map-side combinable, so a 100 TB response pool
    // shuffles one struct per prompt. Rewards compare in exact
    // DECIMAL(12,2) so the margin gate replays bit-identically.
    // (events stands in: user_id = prompt, event_id = response,
    // value = reward.)
    QueryDef("q_pref_pairs", (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          money(col("value")).as("v"))
      ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_resp"),
          max(struct(col("v"), col("event_id"))).as("best"),
          min(struct(col("v"), col("event_id"))).as("worst"))
        .filter(col("n_resp") >= 2 &&
          col("best.v") - col("worst.v") >= 50)
        .select(col("user_id").as("prompt_id"),
          col("best.event_id").as("chosen_id"),
          col("worst.event_id").as("rejected_id"),
          col("best.v").cast("double").as("chosen_reward"),
          col("worst.v").cast("double").as("rejected_reward"),
          (col("best.v") - col("worst.v")).cast("double").as("margin"))
        .orderBy(col("prompt_id"))
    }, Some(s"""
      WITH r AS (
        SELECT user_id, event_id, ${moneySql("value")} AS v FROM events),
      ranked AS (
        SELECT user_id, event_id, v,
          row_number() OVER (PARTITION BY user_id
            ORDER BY v DESC, event_id DESC) AS rb,
          row_number() OVER (PARTITION BY user_id
            ORDER BY v ASC, event_id ASC) AS rw,
          COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM r)
      SELECT user_id AS prompt_id,
        MAX(CASE WHEN rb = 1 THEN event_id END) AS chosen_id,
        MAX(CASE WHEN rw = 1 THEN event_id END) AS rejected_id,
        CAST(MAX(CASE WHEN rb = 1 THEN v END) AS DOUBLE) AS chosen_reward,
        CAST(MAX(CASE WHEN rw = 1 THEN v END) AS DOUBLE) AS rejected_reward,
        CAST(MAX(CASE WHEN rb = 1 THEN v END)
          - MAX(CASE WHEN rw = 1 THEN v END) AS DOUBLE) AS margin
      FROM ranked
      GROUP BY user_id
      HAVING MAX(n) >= 2
        AND MAX(CASE WHEN rb = 1 THEN v END)
          - MAX(CASE WHEN rw = 1 THEN v END) >= 50
      ORDER BY prompt_id""")),

    // Hashed TF-IDF retrieval: feature-hashed document vectors (64
    // buckets, exact-integer tf·idf weights, the one ln quantized to
    // 2^-10) + exact cosine top-5 for each held-out query doc — full
    // text-to-vector-to-retrieval with no external model. IDF is fit
    // on the WHOLE corpus, then split into query/corpus sides. The
    // query workload is FIXED (the first five doc_id%100==0 docs) so
    // the benched cost is linear in the corpus, not quadratic — the
    // realistic retrieval shape: fixed queries, growing corpus.
    QueryDef("q_tfidf_retrieval", (s, dir) => {
      val w = HashedTfIdf.weights(t(s, dir, "documents"), "doc_id", "text", 64)
      val isQ = col("doc_id") % 100 === 0 && col("doc_id") < 500
      HashedTfIdf.cosineTopK(
        w.filter(!isQ), w.filter(isQ), "doc_id", 5)
        .orderBy(col("qid"), col("rk"))
    }, Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      tb AS (
        SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT % 64 AS b
        FROM toks WHERE length(w) > 0),
      tf AS (SELECT doc_id, b, COUNT(*) AS tf FROM tb GROUP BY 1, 2),
      nn AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
      idf AS (
        SELECT b, CAST(floor(ln(CAST(n AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
          * 1024) AS BIGINT) AS lnq
        FROM tf, nn GROUP BY b, n),
      wt AS (SELECT tf.doc_id, tf.b, tf.tf * idf.lnq AS w
             FROM tf JOIN idf USING (b)),
      qv AS (SELECT * FROM wt WHERE doc_id % 100 = 0 AND doc_id < 500),
      cv AS (SELECT * FROM wt WHERE NOT (doc_id % 100 = 0 AND doc_id < 500)),
      qn AS (SELECT doc_id, CAST(SUM(w*w) AS BIGINT) AS n2 FROM qv GROUP BY 1),
      cn AS (SELECT doc_id, CAST(SUM(w*w) AS BIGINT) AS n2 FROM cv GROUP BY 1),
      dots AS (
        SELECT q.doc_id AS qid, c.doc_id AS did,
          CAST(SUM(q.w * c.w) AS BIGINT) AS dot
        FROM qv q JOIN cv c ON q.b = c.b GROUP BY 1, 2),
      sims AS (
        SELECT qid, did,
          CAST(floor(CAST(dot AS DOUBLE)
            / (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(cn.n2 AS DOUBLE)))
            * 1048576) AS BIGINT) AS simq
        FROM dots JOIN qn ON qn.doc_id = dots.qid
                  JOIN cn ON cn.doc_id = dots.did
        WHERE qn.n2 > 0 AND cn.n2 > 0)
      SELECT qid, did, simq, CAST(rk AS INT) AS rk FROM (
        SELECT qid, did, simq,
          row_number() OVER (PARTITION BY qid ORDER BY simq DESC, did) AS rk
        FROM sims) WHERE rk <= 5
      ORDER BY qid, rk""")),

    // Cross-dataset contamination matrix: for every source pair, the
    // exact count of shared distinct word-5-grams plus each side's
    // distinct-gram count (containment = n_overlap/n_b is a ratio of
    // these exact integers). Grams are hashed to a portable 60-bit
    // md5 prefix right after the per-source distinct, so the shuffle
    // and the self-join carry (source, int64) rows — never gram
    // strings — and the oracle replays the identical hash. The join
    // key is the gram hash: at 100 TB this is the same banded shape
    // as the dedup paths (no all-pairs over docs, only over the
    // source-pair space which is tiny).
    QueryDef("q_contamination_matrix", (s, dir) => {
      val g = t(s, dir, "documents")
        .select(col("source"), split(col("text"), " ").as("ws"))
        .select(col("source"), explode(expr(
          """transform(sequence(1, greatest(size(ws) - 4, 1)),
               i -> array_join(slice(ws, i, 5), ' '))""")).as("g"))
        .select(col("source"),
          conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("h"))
        .distinct()
      val sizes = g.groupBy(col("source")).agg(count(lit(1)).as("n"))
      g.as("a").join(g.as("b"),
          col("a.h") === col("b.h") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("n_overlap"))
        .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("n_a"))), Seq("src_a"))
        .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("n_b"))), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("n_overlap"),
          col("n_a"), col("n_b"))
        .orderBy(col("src_a"), col("src_b"))
    }, Some("""
      WITH w AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
      g AS (
        SELECT DISTINCT source,
          ('0x' || substr(md5(gs), 1, 15))::BIGINT AS h
        FROM (
          SELECT source,
            unnest(list_transform(generate_series(1, greatest(len(ws) - 4, 1)),
              i -> array_to_string(ws[i:i+4], ' '))) AS gs
          FROM w)),
      sz AS (SELECT source, COUNT(*) AS n FROM g GROUP BY 1),
      ov AS (
        SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_overlap
        FROM g a JOIN g b ON a.h = b.h AND a.source < b.source
        GROUP BY 1, 2)
      SELECT src_a, src_b, n_overlap, sa.n AS n_a, sb.n AS n_b
      FROM ov JOIN sz sa ON sa.source = ov.src_a
              JOIN sz sb ON sb.source = ov.src_b
      ORDER BY src_a, src_b""")),

    // Corpus drift (PSI) between two snapshots (even vs odd doc_id —
    // deterministic halves) over the (lang, source) mix. One map-side
    // combined groupBy + a broadcast totals row; the single ln per
    // bucket is floor-quantized to 2^-20, the term numerator runs in
    // DECIMAL(38,0) (HUGEINT in the replay — no 2^63 wraparound), and
    // the emitted psi_term is the normalized contribution × 2^20.
    QueryDef("q_corpus_drift", (s, dir) => {
      Drift.psiTable(t(s, dir, "documents"),
        concat_ws("|", col("lang"), col("source")),
        col("doc_id") % 2 === 0)
        .orderBy(col("bucket"))
    }, Some("""
      WITH c AS (
        SELECT lang || '|' || source AS bucket,
          COUNT(*) FILTER (WHERE doc_id % 2 = 0) + 1 AS cnt_a,
          COUNT(*) FILTER (WHERE doc_id % 2 = 1) + 1 AS cnt_b
        FROM documents GROUP BY 1),
      tt AS (
        SELECT bucket, cnt_a, cnt_b,
          CAST(SUM(cnt_a) OVER () AS BIGINT) AS n_a,
          CAST(SUM(cnt_b) OVER () AS BIGINT) AS n_b
        FROM c),
      lq AS (
        SELECT bucket, cnt_a, cnt_b, n_a, n_b,
          CAST(floor(ln(CAST(cnt_a * n_b AS DOUBLE)
            / CAST(cnt_b * n_a AS DOUBLE)) * 1048576) AS BIGINT) AS lnq
        FROM tt)
      SELECT bucket, cnt_a, cnt_b, lnq,
        CAST(((CAST(cnt_a AS HUGEINT) * n_b - CAST(cnt_b AS HUGEINT) * n_a)
              * lnq)
          // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS psi_term
      FROM lq ORDER BY bucket""")),

    // Curriculum ordering (Bengio et al. 2009 applied to data prep):
    // rank the corpus by an exact-integer difficulty score — here the
    // 2^-20-quantized type-token ratio, richer vocabulary = harder —
    // and cut the rank order into 4 curriculum phases (exact quartiles
    // via integer arithmetic on the rank), sharding within each phase
    // by portable hash. The global rank is the distributed two-phase
    // GlobalRank; phase and shard are pure projections of it, so a
    // trainer can stream phase 0 → 3 with no further sort.
    QueryDef("q_curriculum", (s, dir) => {
      val d = t(s, dir, "documents")
      val toks = d.select(col("doc_id"),
        split(lower(col("text")), " ").as("ws"))
        .select(col("doc_id"), size(col("ws")).cast("long").as("n_tok"),
          size(array_distinct(col("ws"))).cast("long").as("n_types"))
      val scored = toks.withColumn("difficulty",
        expr("(n_types * 1048576) div n_tok"))
      val n = d.count() // plan literal, same discipline as the datasheet
      GlobalRank.withRank(scored, "r", col("difficulty"), col("doc_id"))
        .withColumn("phase", expr(s"((r - 1) * 4) div $n").cast("int"))
        .withColumn("shard",
          pmod(Sketches.portableHash32(col("doc_id")), lit(8)).cast("int"))
        .select(col("doc_id"), col("difficulty"), col("r"),
          col("phase"), col("shard"))
        .orderBy(col("r"))
    }, Some(s"""
      WITH toks AS (
        SELECT doc_id,
          CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok,
          CAST(len(list_distinct(string_split(lower(text), ' '))) AS BIGINT)
            AS n_types
        FROM documents),
      scored AS (
        SELECT doc_id, (n_types * 1048576) // n_tok AS difficulty
        FROM toks),
      ranked AS (
        SELECT doc_id, difficulty,
          row_number() OVER (ORDER BY difficulty, doc_id) AS r,
          COUNT(*) OVER () AS n
        FROM scored)
      SELECT doc_id, difficulty, r,
        CAST(((r - 1) * 4) // n AS INT) AS phase,
        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
          AS INT) AS shard
      FROM ranked ORDER BY r""")),

    // Exact stratified split: per-language EXACT floor(n/5) test rows
    // (hash-bucket splits only hit the ratio in expectation; stratified
    // eval sets need exact counts). Deterministic sample rank per
    // stratum; the split is a pure function of the data.
    QueryDef("q_stratified_split", (s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("doc_id"), col("lang"))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("lang"))))
        .withColumn("__r", Sketches.sampleRank(Seq(col("lang")), col("doc_id")))
        .withColumn("split",
          when(col("__r") <= expr("__n div 5"), lit("test"))
            .otherwise(lit("train")))
        .select(col("doc_id"), col("lang"), col("split"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      SELECT doc_id, lang,
        CASE WHEN row_number() OVER (PARTITION BY lang
            ORDER BY ${hx("doc_id")}, doc_id)
          <= COUNT(*) OVER (PARTITION BY lang) // 5
        THEN 'test' ELSE 'train' END AS split
      FROM documents ORDER BY doc_id"""))
  )
}
