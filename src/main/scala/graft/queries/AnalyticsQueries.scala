package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.{CountMin, SetSimJoin, TriangleCount}
import Q._

/** Synopsis / graph / set-analytics surface added in round 4:
  * Count-Min heavy hitters (operators.CountMin), degree-ordered
  * triangle counting (operators.TriangleCount), the EXACT prefix-filter
  * set-similarity join (operators.SetSimJoin — the exact counterpart of
  * the MinHash-LSH candidate path), and quantile winsorization (robust
  * per-group outlier clipping for corpus stats). All four are fully
  * value-oracled: CMS buckets replay in SQL because the hashes are the
  * portable md5 prefix; triangle counts are order-invariant so the
  * oracle's id-ordered replay must equal the engine's degree-ordered
  * one; the sim-join oracle is the brute-force all-pairs join the
  * operator exists to avoid.
  */
object AnalyticsQueries {

  private val CmsDepth = 4
  private val CmsWidth = 1024
  private val SimTau = 0.5

  val defs: Seq[QueryDef] = Seq(

    // Heavy hitters via Count-Min: estimate the top-20 part frequencies
    // from a 4x1024 sketch and report estimate vs exact. One sketch pass
    // + one exact groupBy for the comparison column (the sketch path is
    // the one that scales; exact is the demo's ground truth).
    QueryDef("q_countmin_topk", (s, dir) => {
      val li = fanOut(t(s, dir, "lineitem")) // CPU-dense sketch per row (§2.5 guard)
      val sk = li.agg(
        CountMin.sketch(col("l_partkey"), CmsDepth, CmsWidth).as("sk"))
      val top = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("l_partkey")).limit(20)
      top.crossJoin(broadcast(sk))
        .select(col("l_partkey"), col("exact"),
          CountMin.estimate(col("sk"), col("l_partkey"), CmsDepth, CmsWidth)
            .as("cms_est"))
        .orderBy(col("l_partkey"))
    }, Some(s"""
      WITH ks AS (SELECT i FROM (VALUES (0),(1),(2),(3)) AS v(i)),
      cms AS (
        SELECT i,
          ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1 + 8 * i, 8))::BIGINT % $CmsWidth AS b,
          COUNT(*) AS c
        FROM lineitem CROSS JOIN ks
        GROUP BY 1, 2),
      top AS (
        SELECT l_partkey, COUNT(*) AS exact FROM lineitem GROUP BY 1
        ORDER BY exact DESC, l_partkey LIMIT 20)
      SELECT t.l_partkey, MAX(t.exact) AS exact, MIN(c.c) AS cms_est
      FROM top t JOIN cms c
        ON c.b = ('0x' || substr(md5(CAST(t.l_partkey AS VARCHAR)), 1 + 8 * c.i, 8))::BIGINT % $CmsWidth
      GROUP BY t.l_partkey
      ORDER BY t.l_partkey""")),

    // Triangle count of the part co-order graph at MINIMUM SUPPORT 2
    // (edge = parts co-ordered at least twice — the standard
    // frequent-itemset threshold; without it random co-occurrence
    // densifies the graph super-linearly with SF and triangle work
    // explodes while meaning nothing). The engine orients edges by
    // (degree, id); the oracle replays with plain id order — the
    // triangle count is order-invariant so they must agree exactly.
    QueryDef("q_triangles", (s, dir) => {
      val e = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val pairs = e.as("x")
        .join(e.as("y"), col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .groupBy(col("x.p").as("u"), col("y.p").as("v"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .select(col("u"), col("v"))
      TriangleCount.run(pairs, "u", "v")
    }, Some("""
      WITH pp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      e AS (SELECT u, v FROM (
        SELECT a.p AS u, b.p AS v, COUNT(*) AS c
        FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2) WHERE c >= 2),
      nodes AS (SELECT u AS n FROM e UNION SELECT v FROM e),
      tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM e e1 JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
      SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
             (SELECT COUNT(*) FROM e) AS n_edges,
             n_triangles
      FROM tri""")),

    // Exact Jaccard >= tau near-dup pairs over documents via prefix
    // filtering on word 3-gram shingles (whole-word sets are useless on
    // a small shared vocabulary — shingles encode sequence, splitting
    // the corpus bimodally into planted near-dups at J >= 0.9 vs
    // background < 0.3); the oracle is the all-pairs join the prefix
    // filter exists to avoid.
    QueryDef("q_set_simjoin", (s, dir) => {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      // shingles via the native NGrams generator: one compiled pass per
      // document (an interpreted transform() over split() re-evaluates
      // the split per element — the round-3 HOF lesson)
      val tok = t(s, dir, "documents").select(col("doc_id"),
        ColumnBridge.column(graft.functions.NGrams(
          ColumnBridge.expression(lower(col("text"))), 3)).as("token"))
      SetSimJoin.jaccardJoinTokens(tok, "doc_id", "token", SimTau)
        .orderBy(col("id_a"), col("id_b"))
    }, Some(s"""
      WITH w AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      tok AS (
        SELECT DISTINCT doc_id,
          unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                  FOR i IN range(1, greatest(len(ws) - 1, 1))]) AS token
        FROM w),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY 1),
      i AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b, inter, sa.n + sb.n - inter AS union_n,
        CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
      FROM i JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= $SimTau
      ORDER BY id_a, id_b""")),

    // Winsorized corpus stats: per-source p10/p90 length clipping with
    // clipped-tail counts — the robust-outlier gate for quality filters.
    QueryDef("q_winsorize", (s, dir) => {
      val d = t(s, dir, "documents")
      val q = d.groupBy(col("source"))
        .agg(expr("percentile(n_chars, array(0.1D, 0.9D))").as("__q"),
          count(lit(1)).as("n_docs"))
        .select(col("source"), round(col("__q").getItem(0), 4).as("lo"),
          round(col("__q").getItem(1), 4).as("hi"), col("n_docs"))
      d.join(q, "source")
        .groupBy(col("source"))
        .agg(max(col("lo")).as("p10"), max(col("hi")).as("p90"),
          max(col("n_docs")).as("n_docs"),
          count(when(col("n_chars") < col("lo"), 1)).as("n_below"),
          count(when(col("n_chars") > col("hi"), 1)).as("n_above"))
        .orderBy(col("source"))
    }, Some("""
      WITH q AS (
        SELECT source, ROUND(QUANTILE_CONT(n_chars, 0.1), 4) AS p10,
          ROUND(QUANTILE_CONT(n_chars, 0.9), 4) AS p90, COUNT(*) AS n_docs
        FROM documents GROUP BY source)
      SELECT d.source, MAX(q.p10) AS p10, MAX(q.p90) AS p90,
        MAX(q.n_docs) AS n_docs,
        COUNT(CASE WHEN d.n_chars < q.p10 THEN 1 END) AS n_below,
        COUNT(CASE WHEN d.n_chars > q.p90 THEN 1 END) AS n_above
      FROM documents d JOIN q USING (source)
      GROUP BY d.source ORDER BY d.source""")),

    // Deterministic sampled quantiles (Sketches.sampleRank /
    // interpolatedQuantile): per-group p50/p95 of l_extendedprice from a
    // bottom-256-by-hash uniform sample — the portable, mergeable
    // replacement for a full sort (or for approx_percentile, whose GK
    // sketch no other engine can replay). The rank filter compiles to
    // WindowGroupLimit: each task ships <= k rows per group. Accuracy is
    // certified IN the query: the fraction of the full group below each
    // estimate must straddle the target rank (~0.5 / ~0.95) — and the
    // oracle hash-matches estimates AND fractions bit-for-bit.
    QueryDef("q_quantile_sample", (s, dir) => {
      val k = 256
      val li = fanOut(t(s, dir, "lineitem")) // hash-rank per row (§2.5 guard)
      val keyed = li.select(col("l_returnflag"), col("l_extendedprice").as("v"),
        concat_ws(":", col("l_orderkey"), col("l_linenumber")).as("rk"))
      val sample = keyed
        .withColumn("__rn",
          graft.operators.Sketches.sampleRank(Seq(col("l_returnflag")), col("rk")))
        .filter(col("__rn") <= k)
        .groupBy(col("l_returnflag"))
        .agg(sort_array(collect_list(col("v"))).as("__s"),
          count(lit(1)).as("n_sample"))
        .select(col("l_returnflag"), col("n_sample"),
          graft.operators.Sketches.interpolatedQuantile(col("__s"), 0.5).as("p50_est"),
          graft.operators.Sketches.interpolatedQuantile(col("__s"), 0.95).as("p95_est"))
      // one certification pass (r14): the broadcast sample join keeps
      // row multiplicity (exactly one sample row per flag), so
      // count(*) in the final aggregate IS the old pre-joined n_rows
      // table — the separate full-table count aggregate and its join
      // are gone: two scans of the fact table instead of three, one
      // aggregation instead of two. Values are bit-identical (same
      // counts, same single double division).
      li.select(col("l_returnflag"), col("l_extendedprice").as("v"))
        .join(broadcast(sample), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"), max(col("n_sample")).as("n_sample"),
          max(col("p50_est")).as("p50_est"), max(col("p95_est")).as("p95_est"),
          (count(when(col("v") < col("p50_est"), 1)).cast("double") /
            count(lit(1)).cast("double")).as("frac_below_p50"),
          (count(when(col("v") < col("p95_est"), 1)).cast("double") /
            count(lit(1)).cast("double")).as("frac_below_p95"))
        .orderBy(col("l_returnflag"))
    }, Some("""
      WITH s AS (
        SELECT l_returnflag, l_extendedprice AS v,
          ('0x' || substr(md5(l_orderkey || ':' || l_linenumber), 1, 8))::BIGINT AS h,
          l_orderkey || ':' || l_linenumber AS rk
        FROM lineitem),
      r AS (
        SELECT l_returnflag, v,
          ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h, rk) AS rn
        FROM s),
      g AS (
        SELECT l_returnflag, LIST(v ORDER BY v) AS sm, COUNT(*) AS n_sample
        FROM r WHERE rn <= 256 GROUP BY 1),
      est AS (
        SELECT l_returnflag, n_sample,
          sm[CAST(FLOOR((n_sample - 1) * 0.5) AS INT) + 1]
            + (sm[LEAST(CAST(FLOOR((n_sample - 1) * 0.5) AS INT) + 2, CAST(n_sample AS INT))]
               - sm[CAST(FLOOR((n_sample - 1) * 0.5) AS INT) + 1])
              * ((n_sample - 1) * 0.5 - FLOOR((n_sample - 1) * 0.5)) AS p50_est,
          sm[CAST(FLOOR((n_sample - 1) * 0.95) AS INT) + 1]
            + (sm[LEAST(CAST(FLOOR((n_sample - 1) * 0.95) AS INT) + 2, CAST(n_sample AS INT))]
               - sm[CAST(FLOOR((n_sample - 1) * 0.95) AS INT) + 1])
              * ((n_sample - 1) * 0.95 - FLOOR((n_sample - 1) * 0.95)) AS p95_est
        FROM g),
      nr AS (SELECT l_returnflag, COUNT(*) AS n_rows FROM lineitem GROUP BY 1)
      SELECT li.l_returnflag, MAX(nr.n_rows) AS n_rows,
        MAX(est.n_sample) AS n_sample,
        MAX(est.p50_est) AS p50_est, MAX(est.p95_est) AS p95_est,
        CAST(COUNT(CASE WHEN li.l_extendedprice < est.p50_est THEN 1 END) AS DOUBLE)
          / CAST(MAX(nr.n_rows) AS DOUBLE) AS frac_below_p50,
        CAST(COUNT(CASE WHEN li.l_extendedprice < est.p95_est THEN 1 END) AS DOUBLE)
          / CAST(MAX(nr.n_rows) AS DOUBLE) AS frac_below_p95
      FROM lineitem li
        JOIN est ON li.l_returnflag = est.l_returnflag
        JOIN nr ON li.l_returnflag = nr.l_returnflag
      GROUP BY li.l_returnflag ORDER BY li.l_returnflag""")),

    // Content-defined chunking (TextAnalysis.contentChunks /
    // functions.ContentChunks): Rabin-boundary chunks of every
    // document, reporting chunk counts, DISTINCT chunks (the
    // chunk-level dedup rate CDC exists for), and total chars (proof
    // no text is lost). The boundary rule is positional (pure window
    // hash, no min/max clamps), so the oracle recomputes every
    // boundary set-based: per position, the same 16-term polynomial
    // mod 1048573, cut where hv % 64 = 0.
    QueryDef("q_content_chunks", (s, dir) => {
      val docs = t(s, dir, "documents")
      docs.select(col("source"),
          explode(graft.operators.TextAnalysis.contentChunks(col("text"))).as("ch"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct(col("ch")).as("n_uniq"),
          sum(length(col("ch"))).cast("long").as("total_chars"))
        .orderBy(col("source"))
    }, Some("""
      WITH pw AS (SELECT * FROM (VALUES
          (1, 381454), (2, 519679), (3, 456488), (4, 758874),
          (5, 971578), (6, 674015), (7, 765891), (8, 633555),
          (9, 155737), (10, 410923), (11, 317680), (12, 923521),
          (13, 29791), (14, 961), (15, 31), (16, 1)) v(j, p)),
      posh AS (
        SELECT doc_id, i,
          CAST(SUM(unicode(substr(text, i - 16 + j, 1)) * p) AS BIGINT)
            % 1048573 AS hv
        FROM documents,
          (SELECT unnest(generate_series(16, 4000)) AS i) gi, pw
        WHERE i <= len(text)
        GROUP BY doc_id, i),
      cuts AS (
        SELECT doc_id, LIST(i ORDER BY i) AS cs
        FROM posh WHERE hv % 64 = 0 GROUP BY 1),
      b AS (
        SELECT d.doc_id, d.source, d.text,
          list_prepend(0, COALESCE(c.cs, CAST([] AS BIGINT[]))) AS st,
          list_append(COALESCE(c.cs, CAST([] AS BIGINT[])), len(d.text)) AS en
        FROM documents d LEFT JOIN cuts c USING (doc_id)),
      chunk AS (
        SELECT b.doc_id, b.source,
          substr(b.text, CAST(st[k] AS INT) + 1, CAST(en[k] - st[k] AS INT)) AS ch
        FROM b, (SELECT unnest(generate_series(1, 200)) AS k) gk
        WHERE k <= len(st) AND en[k] > st[k])
      SELECT source, COUNT(*) AS n_chunks, COUNT(DISTINCT ch) AS n_uniq,
        CAST(SUM(len(ch)) AS BIGINT) AS total_chars
      FROM chunk GROUP BY 1 ORDER BY 1""")),

    // Word-entropy + type-token-ratio quality signals (operators.
    // TextAnalysis.wordEntropy) with a low-entropy gate — the cheap
    // stand-in for the perplexity filter. The quantized c·ln c terms
    // make even the entropy DOUBLES hash-comparable: the oracle
    // recomputes the identical histogram and op sequence.
    QueryDef("q_entropy", (s, dir) => {
      graft.operators.TextAnalysis
        .wordEntropy(t(s, dir, "documents"), "doc_id", "text")
        .withColumn("low_entropy", col("entropy") < 3.0)
    }, Some("""
      WITH w AS (
        SELECT doc_id,
          unnest(regexp_extract_all(lower(text), '\S+')) AS w
        FROM documents),
      c AS (SELECT doc_id, w, COUNT(*) AS cnt FROM w GROUP BY 1, 2),
      agg AS (
        SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_words,
          COUNT(*) AS n_distinct,
          SUM(floor(cnt * ln(CAST(cnt AS DOUBLE)) * 1024) / 1024.0) AS st
        FROM c GROUP BY 1)
      SELECT doc_id, n_words, n_distinct,
        greatest(0.0, floor(ln(CAST(n_words AS DOUBLE)) * 1024) / 1024.0
          - st / CAST(n_words AS DOUBLE)) AS entropy,
        CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) AS ttr,
        greatest(0.0, floor(ln(CAST(n_words AS DOUBLE)) * 1024) / 1024.0
          - st / CAST(n_words AS DOUBLE)) < 3.0 AS low_entropy
      FROM agg""")),

    // Key-skew report (operators.SkewReport) over lineitem's join key —
    // the degree histogram + hot keys + headline skew factor you
    // profile before choosing broadcast/salting at scale. Integer
    // buckets (length(bin(cnt))-1, no float log) and single-division
    // shares make every row hash-exact.
    QueryDef("q_skew_report", (s, dir) => {
      graft.operators.SkewReport
        .report(t(s, dir, "lineitem"), "l_orderkey", 10)
        .orderBy(col("kind"), col("k"))
    }, Some("""
      WITH c AS (
        SELECT l_orderkey AS k, COUNT(*) AS cnt
        FROM lineitem GROUP BY 1),
      tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
          MAX(cnt) AS max_cnt
        FROM c),
      b AS (
        SELECT 'bucket' AS kind,
          CAST(length(format('{:b}', cnt)) - 1 AS BIGINT) AS k,
          COUNT(*) AS cnt, CAST(SUM(cnt) AS BIGINT) AS rows_in_bucket
        FROM c GROUP BY 2),
      hot AS (
        SELECT 'hotkey' AS kind, k, cnt
        FROM c ORDER BY cnt DESC, k ASC LIMIT 10)
      SELECT kind, k, cnt,
        CAST(rows_in_bucket AS DOUBLE) / CAST(n_rows AS DOUBLE) AS share
      FROM b, tot
      UNION ALL
      SELECT kind, k, cnt,
        CAST(cnt AS DOUBLE) / CAST(n_rows AS DOUBLE) AS share
      FROM hot, tot
      UNION ALL
      SELECT 'total' AS kind, CAST(n_keys AS BIGINT) AS k, n_rows AS cnt,
        CAST(max_cnt AS DOUBLE)
          / (CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)) AS share
      FROM tot
      ORDER BY kind, k"""))
  )
}
