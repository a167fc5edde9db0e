package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.operators.{DataSplit, Relevance, Similarity, TextAnalysis, TextDedup, Urls}
import Q._

/** Curation-layer additions: the Gopher document-quality rule set,
  * deterministic weighted sampling (A-ES), hybrid lexical+semantic
  * retrieval fused with RRF, and MMR diversification — each a published
  * public technique a large-scale training-data / RAG pipeline runs,
  * each with a full DuckDB value oracle.
  */
object CurationQueries {

  /** The raw double cosine used by every proven embedding oracle. */
  private def cosRaw(a: String, b: String): String =
    s"""(list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))
      / (sqrt(list_dot_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[])))
       * sqrt(list_dot_product(CAST($b AS DOUBLE[]),
                               CAST($b AS DOUBLE[])))))"""

  /** One BM25 term-score summand in the DuckDB replay (the proven
    * q_rag_e2e formula: q1024 idf, k1=1.2, b=0.75). */
  private def bm25Term(i: Int): String =
    s"""floor(ln((s.n - s.df$i + 0.5) / (s.df$i + 0.5) + 1.0) * 1024) / 1024.0
      * (t.tf$i * (1.2 + 1.0) / (t.tf$i + 1.2 *
          (1.0 - 0.75 + 0.75 * (t.dl / (s.sum_dl / s.n)))))"""

  private val PcaK = 4       // components
  private val PcaIters = 8   // fixed power-iteration count
  private val PcaDim = 64
  private val PcaScale = 1024  // input quantization grid
  private val PcaGrid = 32768L // iterate/component grid (2^15)

  /** Chained-CTE DuckDB replay of `Similarity.pcaFitExact` +
    * `pcaProjectExact` — every CTE MATERIALIZED (the iteration chain
    * references each step 2-3×; inlining would re-execute the moment
    * join exponentially and reopen the parquet view hundreds of
    * times). Arithmetic mirrors the Scala bit-for-bit: HUGEINT sums
    * (exact), `//` truncating division (= BigInt `/`), and the single
    * double step floor(u/√n2·grid + 0.5) on <2^53 integers. */
  private def pcaExactOracle: String = {
    val (k, t, dim, scale, grid) = (PcaK, PcaIters, PcaDim, PcaScale, PcaGrid)
    val ctes = scala.collection.mutable.ArrayBuffer[String]()
    ctes += s"""
      xq AS MATERIALIZED (
        SELECT vec_id, i - 1 AS pos, CAST(floor(x * $scale + 0.5) AS BIGINT) AS v
        FROM (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x,
              unnest(generate_series(1, len(embedding))) AS i FROM embeddings)),
      nr AS MATERIALIZED (SELECT COUNT(*) AS n FROM embeddings),
      sv AS MATERIALIZED (SELECT pos AS i, SUM(v) AS s FROM xq GROUP BY 1),
      mom AS MATERIALIZED (SELECT a.pos AS i, b.pos AS j, SUM(a.v * b.v) AS m
        FROM xq a JOIN xq b ON a.vec_id = b.vec_id GROUP BY 1, 2),
      amat AS MATERIALIZED (SELECT m.i, m.j, nr.n * m.m - sa.s * sb.s AS a
        FROM mom m JOIN sv sa ON sa.i = m.i JOIN sv sb ON sb.i = m.j
        CROSS JOIN nr)"""
    for (c <- 0 until k) {
      ctes += s"""v${c}_0 AS MATERIALIZED (
        SELECT i - 1 AS i, CASE WHEN i - 1 = $c THEN $grid ELSE 1 END AS v
        FROM (SELECT unnest(generate_series(1, $dim)) AS i))"""
      for (it <- 1 to t) {
        ctes += s"""w${c}_$it AS MATERIALIZED (SELECT a.i, SUM(a.a * v.v) AS w
          FROM amat a JOIN v${c}_${it - 1} v ON v.i = a.j GROUP BY 1)"""
        ctes += s"""s${c}_$it AS MATERIALIZED (
          SELECT greatest(MAX(ABS(w)) // $grid, 1) AS dv FROM w${c}_$it)"""
        ctes += s"""u${c}_${it}_0 AS MATERIALIZED (
          SELECT i, w // dv AS u FROM w${c}_$it CROSS JOIN s${c}_$it)"""
        for (p <- 0 until c) {
          ctes += s"""d${c}_${it}_$p AS MATERIALIZED (SELECT SUM(u.u * c.v) AS d
            FROM u${c}_${it}_$p u JOIN comp$p c ON c.i = u.i)"""
          ctes += s"""u${c}_${it}_${p + 1} AS MATERIALIZED (
            SELECT u.i, u.u - (d.d * c.v) // np.q AS u
            FROM u${c}_${it}_$p u JOIN comp$p c ON c.i = u.i
            CROSS JOIN d${c}_${it}_$p d CROSS JOIN np2_$p np)"""
        }
        ctes += s"""n2${c}_$it AS MATERIALIZED (
          SELECT SUM(u * u) AS q FROM u${c}_${it}_$c)"""
        ctes += s"""v${c}_$it AS MATERIALIZED (SELECT u.i,
          CASE WHEN nn.q = 0 THEN p.v
               ELSE CAST(floor(CAST(u.u AS DOUBLE) / sqrt(CAST(nn.q AS DOUBLE))
                 * $grid + 0.5) AS BIGINT) END AS v
          FROM u${c}_${it}_$c u JOIN v${c}_${it - 1} p ON p.i = u.i
          CROSS JOIN n2${c}_$it nn)"""
      }
      ctes += s"comp$c AS MATERIALIZED (SELECT i, v FROM v${c}_$t)"
      ctes += s"np2_$c AS MATERIALIZED (SELECT SUM(v * v) AS q FROM comp$c)"
    }
    for (c <- 0 until k) {
      ctes += s"""pj$c AS MATERIALIZED (SELECT x.vec_id, SUM(x.v * cp.v) AS t
        FROM xq x JOIN comp$c cp ON cp.i = x.pos GROUP BY 1)"""
      ctes += s"""sd$c AS MATERIALIZED (SELECT SUM(s.s * cp.v) AS t
        FROM sv s JOIN comp$c cp ON cp.i = s.i)"""
    }
    val sel = (0 until k).map(c =>
      s"""CAST(nr.n * pj$c.t - sd$c.t AS DOUBLE)
        / (CAST(nr.n AS DOUBLE) * $scale * $grid) AS pc${c + 1}""").mkString(", ")
    val joins = (1 until k).map(c =>
      s"JOIN pj$c ON pj$c.vec_id = pj0.vec_id").mkString(" ")
    val crosses = (0 until k).map(c => s"CROSS JOIN sd$c").mkString(" ")
    s"WITH ${ctes.mkString(",\n")}\n" +
      s"SELECT pj0.vec_id, $sel FROM pj0 $joins $crosses CROSS JOIN nr " +
      "ORDER BY pj0.vec_id"
  }

  def defs: Seq[QueryDef] = Seq(

    // The Gopher quality rules (Rae et al. 2021, Appendix A): the
    // canonical pretraining pre-filter. Every ratio threshold is an
    // exact integer cross-multiplication, so the oracle replays the
    // decision with no float anywhere. On this corpus the symbol /
    // bullet / ellipsis counters are legitimately zero (TESTDATA text
    // has no punctuation or newlines); the word-count, word-length,
    // alpha-fraction and stopword rules carry real signal.
    QueryDef("q_gopher_rules", (s, dir) => {
      TextAnalysis.gopherRules(t(s, dir, "documents"), "doc_id", "text")
    }, Some("""
      SELECT doc_id, n_words, n_word_chars, n_symbols, n_lines,
        n_bullet_lines, n_ellipsis_lines, n_alpha_words, n_stop_hits,
        n_words BETWEEN 50 AND 100000 AS ok_word_count,
        (n_word_chars >= 3 * n_words AND n_word_chars <= 10 * n_words)
          AS ok_mean_word_len,
        10 * n_symbols <= n_words AS ok_symbol_ratio,
        10 * n_bullet_lines <= 9 * n_lines AS ok_bullets,
        10 * n_ellipsis_lines <= 3 * n_lines AS ok_ellipsis,
        5 * n_alpha_words >= 4 * n_words AS ok_alpha_words,
        n_stop_hits >= 2 AS ok_stopwords,
        (n_words BETWEEN 50 AND 100000
          AND n_word_chars >= 3 * n_words AND n_word_chars <= 10 * n_words
          AND 10 * n_symbols <= n_words
          AND 10 * n_bullet_lines <= 9 * n_lines
          AND 10 * n_ellipsis_lines <= 3 * n_lines
          AND 5 * n_alpha_words >= 4 * n_words
          AND n_stop_hits >= 2) AS keep
      FROM (
        SELECT doc_id,
          len(regexp_extract_all(text, '\S+')) AS n_words,
          length(regexp_replace(text, '\s', '', 'g')) AS n_word_chars,
          len(regexp_extract_all(text, '#|\.\.\.')) AS n_symbols,
          len(string_split(text, chr(10))) AS n_lines,
          len(list_filter(string_split(text, chr(10)),
            l -> regexp_matches(trim(l), '^[-*•]'))) AS n_bullet_lines,
          len(list_filter(string_split(text, chr(10)),
            l -> regexp_matches(l, '\.\.\.$'))) AS n_ellipsis_lines,
          len(list_filter(regexp_extract_all(text, '\S+'),
            w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha_words,
          len(list_intersect(
            list_transform(regexp_extract_all(text, '\S+'), w -> lower(w)),
            ['the','be','to','of','and','that','have','with']))
            AS n_stop_hits
        FROM documents)""")),

    // HTML -> text extraction + markup-density boilerplate signals
    // (TextAnalysis.extractHtmlText / htmlStats): documents are wrapped
    // in a deterministic crawl-page template (nav links, script, style,
    // comment, entities) — same synthesis discipline as the CDC
    // envelope queries — then extracted back. The oracle replays the
    // wrap AND the full regex chain in DuckDB, so tag stripping,
    // entity decoding, block-break normalization and the quantized
    // link-char fraction must all match byte-for-byte.
    QueryDef("q_html_extract", (s, dir) => {
      val html = concat(
        lit("<html><head><title>d</title><style>body { margin:0 }</style>" +
          "<script>var x = 1 < 2;</script></head><body>\n" +
          "<!-- boilerplate -->\n" +
          "<div class=\"nav\"><a href=\"/\">Home</a> " +
          "<a href=\"/a\">About &amp; more</a></div>\n<h1>Doc "),
        col("doc_id").cast("string"),
        lit("</h1>\n<p>"), col("text"),
        lit("</p>\n<div class=\"foot\">&nbsp;end&nbsp;</div></body></html>"))
      val docs = t(s, dir, "documents").select(col("doc_id"), html.as("h"))
      val (nTags, nLinks, frac) = TextAnalysis.htmlStats(col("h"))
      docs.select(col("doc_id"),
        TextAnalysis.extractHtmlText(col("h")).as("text_out"),
        nTags.as("n_tags"), nLinks.as("n_links"),
        frac.as("link_char_frac"))
    }, Some("""
      WITH wrapped AS (
        SELECT doc_id,
          '<html><head><title>d</title><style>body { margin:0 }</style>' ||
          '<script>var x = 1 < 2;</script></head><body>' || chr(10) ||
          '<!-- boilerplate -->' || chr(10) ||
          '<div class="nav"><a href="/">Home</a> ' ||
          '<a href="/a">About &amp; more</a></div>' || chr(10) ||
          '<h1>Doc ' || doc_id || '</h1>' || chr(10) ||
          '<p>' || text || '</p>' || chr(10) ||
          '<div class="foot">&nbsp;end&nbsp;</div></body></html>' AS h
        FROM documents),
      extracted AS (
        -- DuckDB lateral column aliases: each step references the prior
        SELECT doc_id, h,
          regexp_replace(h,
            '(?is)<(script|style)\b[^>]*>.*?</(script|style)>', '', 'g') AS s1,
          regexp_replace(s1, '(?s)<!--.*?-->', '', 'g') AS s2,
          regexp_replace(s2,
            '(?i)<br\s*/?>|</(p|div|li|h[1-6]|tr)>', chr(10), 'g') AS s3,
          regexp_replace(s3, '(?s)<[^>]*>', '', 'g') AS s4,
          regexp_replace(s4, '&lt;', '<', 'g') AS s5,
          regexp_replace(s5, '&gt;', '>', 'g') AS s6,
          regexp_replace(s6, '&quot;', '"', 'g') AS s7,
          regexp_replace(s7, '&#39;', chr(39), 'g') AS s8,
          regexp_replace(s8, '&nbsp;', ' ', 'g') AS s9,
          regexp_replace(s9, '&amp;', '&', 'g') AS s10,
          regexp_replace(s10, '[ \t\x0B\f\r]+', ' ', 'g') AS s11,
          regexp_replace(s11, ' ?\n ?', chr(10), 'g') AS s12,
          trim(regexp_replace(s12, '\n{3,}', chr(10) || chr(10), 'g'))
            AS text_out
        FROM wrapped),
      anchors AS (
        SELECT doc_id,
          coalesce(SUM(length(trim(regexp_replace(regexp_replace(
            a, '(?s)<[^>]*>', '', 'g'), '&amp;', '&', 'g')))), 0) AS a_chars
        FROM (SELECT doc_id,
                unnest(regexp_extract_all(h, '(?is)<a\b[^>]*>(.*?)</a>', 1))
                  AS a
              FROM wrapped)
        GROUP BY doc_id)
      SELECT w.doc_id, e.text_out,
        CAST(len(regexp_extract_all(w.h, '(?s)<[^>]*>')) AS BIGINT)
          AS n_tags,
        CAST(len(regexp_extract_all(w.h, '(?is)<a\b[^>]*>')) AS BIGINT)
          AS n_links,
        floor(CAST(coalesce(a.a_chars, 0) AS DOUBLE)
          / greatest(length(e.text_out), 1) * 1048576) / 1048576.0
          AS link_char_frac
      FROM wrapped w
      JOIN extracted e USING (doc_id)
      LEFT JOIN anchors a USING (doc_id)""")),

    // URL canonicalization + registrable-domain extraction
    // (operators.Urls) — the crawl-frontier dedup key and the
    // per-domain-cap key. Synthesized messy URLs (uppercase host,
    // default port, unsorted + tracking params, fragment; subdomain
    // and public-suffix variants derived from doc_id) canonicalize to
    // a clean form the oracle replays exactly, then the domain
    // histogram demonstrates the cap key collapsing subdomains.
    QueryDef("q_url_canonical", (s, dir) => {
      val tld = when(pmod(col("doc_id"), lit(3)) === 0, "co.uk")
        .when(pmod(col("doc_id"), lit(3)) === 1, "com")
        .otherwise("io")
      val sub = when(pmod(col("doc_id"), lit(2)) === 0, "WWW.")
        .otherwise("News.")
      val url = concat(lit("HTTPS://"), sub, col("source"),
        lit("-site."), tld, lit(":443/Docs/"), col("doc_id"),
        lit("?utm_source=feed&b=2&a=1&gclid=x#frag"))
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), url.as("url"))
      docs.select(col("doc_id"),
          Urls.canonicalizeUrl(col("url")).as("url_canonical"),
          Urls.registrableDomain(col("url")).as("domain"))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("url_canonical")).as("first_url"))
    }, Some("""
      WITH urls AS (
        SELECT doc_id,
          'HTTPS://' ||
          CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE 'News.' END ||
          source || '-site.' ||
          CASE WHEN doc_id % 3 = 0 THEN 'co.uk'
               WHEN doc_id % 3 = 1 THEN 'com' ELSE 'io' END ||
          ':443/Docs/' || doc_id ||
          '?utm_source=feed&b=2&a=1&gclid=x#frag' AS url
        FROM documents),
      canon AS (
        SELECT doc_id, url,
          regexp_replace(
            lower(regexp_extract(url,
              '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)),
            ':(80|443)$', '') AS prefix_lc,
          regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
          regexp_extract(url, '\?([^#]*)', 1) AS query,
          list_sort(list_filter(string_split(
            regexp_extract(url, '\?([^#]*)', 1), '&'),
            p -> NOT regexp_matches(p,
              '^(utm_[A-Za-z]+|fbclid|gclid|msclkid|ref|mc_eid)=')
              AND p <> '')) AS kept,
          lower(regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host
        FROM urls),
      out AS (
        SELECT doc_id,
          prefix_lc || path ||
          CASE WHEN len(kept) > 0
            THEN '?' || array_to_string(kept, '&') ELSE '' END
            AS url_canonical,
          CASE
            WHEN len(string_split(host, '.')) <= 1 THEN host
            WHEN len(string_split(host, '.')) >= 3 AND
              (string_split(host, '.')[-2] || '.' ||
               string_split(host, '.')[-1]) IN
              ('co.uk','org.uk','ac.uk','gov.uk','com.au','net.au',
               'org.au','co.jp','or.jp','ne.jp','com.br','com.cn',
               'com.mx','co.in','co.kr','com.tr','com.ar','co.za',
               'github.io','blogspot.com')
            THEN string_split(host, '.')[-3] || '.' ||
                 string_split(host, '.')[-2] || '.' ||
                 string_split(host, '.')[-1]
            ELSE string_split(host, '.')[-2] || '.' ||
                 string_split(host, '.')[-1]
          END AS domain
        FROM canon)
      SELECT domain, COUNT(*) AS n_docs, MIN(url_canonical) AS first_url
      FROM out GROUP BY domain""")),

    // END-TO-END CRAWL CURATION DAG — the front half of a web-corpus
    // pipeline composed from this round's ops plus the existing stack:
    // raw page (messy URL + HTML) → canonical domain (Urls) → text
    // (extractHtmlText) → Gopher gate → exact dedup on normalized text
    // (keep-first) → per-domain cap (capPerKey) → domain histogram.
    // One green row certifies the five-stage composition: the DuckDB
    // oracle replays every stage (url normalization, the 13-regex
    // extraction chain, all seven Gopher rules, the md5 dedup, the
    // ROW_NUMBER cap) over the same synthesized pages.
    QueryDef("q_crawl_e2e", (s, dir) => {
      val tld = when(pmod(col("doc_id"), lit(3)) === 0, "co.uk")
        .when(pmod(col("doc_id"), lit(3)) === 1, "com")
        .otherwise("io")
      val url = concat(lit("HTTPS://WWW."), col("source"), lit("-site."),
        tld, lit(":443/d/"), col("doc_id"), lit("?utm_source=x&p=1#f"))
      val html = concat(
        lit("<html><head><style>body { margin:0 }</style>" +
          "<script>var x = 1 < 2;</script></head><body>\n" +
          "<div class=\"nav\"><a href=\"/\">Home</a></div>\n<p>"),
        col("text"),
        lit("</p>\n</body></html>"))
      val pages = t(s, dir, "documents")
        .select(col("doc_id"), url.as("url"), html.as("h"))
      val canon = pages.select(col("doc_id"),
        Urls.registrableDomain(col("url")).as("domain"),
        TextAnalysis.extractHtmlText(col("h")).as("text_out"))
      val gated = TextAnalysis.gopherRules(
          canon.select(col("doc_id"), col("text_out").as("text")),
          "doc_id", "text")
        .filter(col("keep"))
        .select(col("doc_id"))
        .join(canon, "doc_id")
      val deduped = graft.operators.Dedup.keepFirst(
        gated.withColumn("chash", TextDedup.normalizedHash(col("text_out"))),
        Seq("chash"), Seq(col("doc_id")))
      val capped = DataSplit.capPerKey(deduped, "domain", "doc_id", 20)
      capped.groupBy(col("domain"))
        .agg(count(lit(1)).as("n_kept"),
          min(col("doc_id")).as("first_doc"),
          sum(length(col("text_out"))).cast("long").as("sum_chars"))
    }, Some("""
      WITH pages AS (
        SELECT doc_id,
          'HTTPS://WWW.' || source || '-site.' ||
          CASE WHEN doc_id % 3 = 0 THEN 'co.uk'
               WHEN doc_id % 3 = 1 THEN 'com' ELSE 'io' END ||
          ':443/d/' || doc_id || '?utm_source=x&p=1#f' AS url,
          '<html><head><style>body { margin:0 }</style>' ||
          '<script>var x = 1 < 2;</script></head><body>' || chr(10) ||
          '<div class="nav"><a href="/">Home</a></div>' || chr(10) ||
          '<p>' || text || '</p>' || chr(10) || '</body></html>' AS h
        FROM documents),
      canon AS (
        SELECT doc_id,
          lower(regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host,
          regexp_replace(h,
            '(?is)<(script|style)\b[^>]*>.*?</(script|style)>', '', 'g')
            AS s1,
          regexp_replace(s1, '(?s)<!--.*?-->', '', 'g') AS s2,
          regexp_replace(s2,
            '(?i)<br\s*/?>|</(p|div|li|h[1-6]|tr)>', chr(10), 'g') AS s3,
          regexp_replace(s3, '(?s)<[^>]*>', '', 'g') AS s4,
          regexp_replace(s4, '&lt;', '<', 'g') AS s5,
          regexp_replace(s5, '&gt;', '>', 'g') AS s6,
          regexp_replace(s6, '&quot;', '"', 'g') AS s7,
          regexp_replace(s7, '&#39;', chr(39), 'g') AS s8,
          regexp_replace(s8, '&nbsp;', ' ', 'g') AS s9,
          regexp_replace(s9, '&amp;', '&', 'g') AS s10,
          regexp_replace(s10, '[ \t\x0B\f\r]+', ' ', 'g') AS s11,
          regexp_replace(s11, ' ?\n ?', chr(10), 'g') AS s12,
          trim(regexp_replace(s12, '\n{3,}', chr(10) || chr(10), 'g'))
            AS text_out
        FROM pages),
      dom AS (
        SELECT doc_id, text_out,
          CASE
            WHEN len(string_split(host, '.')) <= 1 THEN host
            WHEN len(string_split(host, '.')) >= 3 AND
              (string_split(host, '.')[-2] || '.' ||
               string_split(host, '.')[-1]) IN
              ('co.uk','org.uk','ac.uk','gov.uk','com.au','net.au',
               'org.au','co.jp','or.jp','ne.jp','com.br','com.cn',
               'com.mx','co.in','co.kr','com.tr','com.ar','co.za',
               'github.io','blogspot.com')
            THEN string_split(host, '.')[-3] || '.' ||
                 string_split(host, '.')[-2] || '.' ||
                 string_split(host, '.')[-1]
            ELSE string_split(host, '.')[-2] || '.' ||
                 string_split(host, '.')[-1]
          END AS domain
        FROM canon),
      counted AS (
        SELECT doc_id, domain, text_out,
          len(regexp_extract_all(text_out, '\S+')) AS n_words,
          length(regexp_replace(text_out, '\s', '', 'g')) AS n_word_chars,
          len(regexp_extract_all(text_out, '#|\.\.\.')) AS n_symbols,
          len(string_split(text_out, chr(10))) AS n_lines,
          len(list_filter(string_split(text_out, chr(10)),
            l -> regexp_matches(trim(l), '^[-*•]'))) AS n_bullet_lines,
          len(list_filter(string_split(text_out, chr(10)),
            l -> regexp_matches(l, '\.\.\.$'))) AS n_ellipsis_lines,
          len(list_filter(regexp_extract_all(text_out, '\S+'),
            w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha_words,
          len(list_intersect(
            list_transform(regexp_extract_all(text_out, '\S+'),
              w -> lower(w)),
            ['the','be','to','of','and','that','have','with']))
            AS n_stop_hits
        FROM dom),
      gated AS (
        SELECT doc_id, domain, text_out FROM counted
        WHERE n_words BETWEEN 50 AND 100000
          AND n_word_chars >= 3 * n_words AND n_word_chars <= 10 * n_words
          AND 10 * n_symbols <= n_words
          AND 10 * n_bullet_lines <= 9 * n_lines
          AND 10 * n_ellipsis_lines <= 3 * n_lines
          AND 5 * n_alpha_words >= 4 * n_words
          AND n_stop_hits >= 2),
      deduped AS (
        SELECT doc_id, domain, text_out FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY md5(lower(regexp_replace(text_out, '\s+', ' ', 'g')))
            ORDER BY doc_id) AS rn
          FROM gated) WHERE rn = 1),
      capped AS (
        SELECT doc_id, domain, text_out FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY domain ORDER BY doc_id) AS rn
          FROM deduped) WHERE rn <= 20)
      SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_kept,
        MIN(doc_id) AS first_doc,
        CAST(SUM(length(text_out)) AS BIGINT) AS sum_chars
      FROM capped GROUP BY domain""")),

    // Deterministic weighted sampling without replacement (A-ES,
    // Efraimidis & Spirakis 2006): 5 documents per source, selection
    // probability proportional to n_chars — the reproducible "prefer
    // long documents" subsample. Content-addressed u from md5(doc_id),
    // ln(u) floor-quantized to 2^-20, one IEEE division by the weight:
    // the oracle replays the selection and ranks bit-for-bit.
    QueryDef("q_weighted_sample", (s, dir) => {
      DataSplit.weightedSample(t(s, dir, "documents"), "doc_id",
          col("n_chars"), col("source"), 5)
        .select(col("source"), col("doc_id"), col("n_chars"),
          col("rk").cast("long").as("rk"))
    }, Some("""
      SELECT source, doc_id, n_chars, rk FROM (
        SELECT source, doc_id, n_chars,
          ROW_NUMBER() OVER (PARTITION BY source ORDER BY
            floor(ln(((('0x' || substr(md5(doc_id::VARCHAR || 'wsample'),
                1, 8))::BIGINT % 1048576) + 0.5) / 1048576.0) * 1048576)
              / 1048576.0 / CAST(n_chars AS DOUBLE) DESC,
            doc_id) AS rk
        FROM documents)
      WHERE rk <= 5""")),

    // Temperature (α=0.5) mixture sampling over the LANGUAGE domains —
    // the multilingual rebalancing shape (en is ~2.5x the other
    // languages here, so α<1 upsamples the low-resource ones relative
    // to proportional). The oracle recomputes the rate table from the
    // same corpus with the identical quantized arithmetic, then replays
    // the md5 keep decision.
    QueryDef("q_temperature_sample", (s, dir) => {
      DataSplit.temperatureSample(t(s, dir, "documents"), "doc_id", "lang",
          alpha = 0.5, budgetRows = 200)
        .select(col("doc_id"), col("lang"))
    }, Some("""
      WITH tot AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
      qp AS (SELECT lang, n,
        floor(pow(CAST(n AS DOUBLE), 0.5) * 1048576) / 1048576.0 AS p
        FROM tot),
      s AS (SELECT SUM(p) AS sp FROM qp),
      rates AS (
        SELECT lang,
          CAST(least(10000.0,
            floor(200.0 * p / sp / n * 10000.0)) AS BIGINT) AS bp
        FROM qp, s)
      SELECT d.doc_id, d.lang FROM documents d
      JOIN rates r ON d.lang = r.lang
      WHERE ('0x' || substr(md5(d.doc_id::VARCHAR || 'temp'), 1, 8))::BIGINT
        % 10000 < r.bp""")),

    // Deterministic corpus shuffle into 8 training shards: shard and
    // within-shard position are both pure md5 functions of the doc id,
    // so a retried job writes byte-identical shards. The oracle replays
    // bucket and ordering exactly.
    QueryDef("q_shuffle_shards", (s, dir) => {
      DataSplit.shuffleShards(t(s, dir, "documents"), "doc_id", 8)
        .select(col("doc_id"), col("shard"), col("shard_pos"))
    }, Some("""
      SELECT doc_id, shard, shard_pos FROM (
        SELECT doc_id,
          ('0x' || substr(md5(doc_id::VARCHAR || 'shard'), 1, 8))::BIGINT
            % 8 AS shard,
          ROW_NUMBER() OVER (
            PARTITION BY ('0x' || substr(md5(doc_id::VARCHAR || 'shard'),
              1, 8))::BIGINT % 8
            ORDER BY md5(doc_id::VARCHAR || 'shard' || 'pos'), doc_id)
            AS shard_pos
        FROM documents)""")),

    // Hybrid retrieval with reciprocal-rank fusion (Cormack et al.,
    // SIGIR 2009): BM25 top-20 (lexical) + exact cosine top-20 against
    // the vec_id=7 query embedding (semantic), fused by
    // sum(1/(60+rank)) with 2^-20-quantized contributions. The oracle
    // replays both rankers (the proven q_rag_e2e BM25 and q_ann_brute
    // cosine formulas) and the fusion arithmetic.
    QueryDef("q_hybrid_rrf", (s, dir) => {
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val lex = Relevance.bm25TopK(docs, "doc_id", "text",
          Seq("spark", "window", "hash"), 20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))))
        .select(col("doc_id"), col("rank"))
      val qv = emb.filter(col("vec_id") === 7)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val sem = Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 7),
          qv, "vec_id", "embedding", "qid", "qvec", 20)
        .select(col("vec_id").as("doc_id"), col("rank"))
      Relevance.rrfFuse(Seq(lex, sem), "doc_id", k = 60, topK = 10)
    }, Some(s"""
      WITH w AS (
        SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS ws
        FROM documents),
      tf AS (
        SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl,
          CAST(len(list_filter(ws, x -> x = 'spark')) AS DOUBLE) AS tf0,
          CAST(len(list_filter(ws, x -> x = 'window')) AS DOUBLE) AS tf1,
          CAST(len(list_filter(ws, x -> x = 'hash')) AS DOUBLE) AS tf2
        FROM w),
      st AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(dl) AS sum_dl,
          CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
          CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
          CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
        FROM tf),
      lexs AS (
        SELECT t.doc_id,
          ${bm25Term(0)} + ${bm25Term(1)} + ${bm25Term(2)} AS score
        FROM tf t, st s),
      lex AS (
        SELECT doc_id,
          ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
        FROM lexs WHERE score > 0.0
        QUALIFY rank <= 20),
      qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 7),
      sem AS (
        SELECT e.vec_id AS doc_id,
          ROW_NUMBER() OVER (ORDER BY ${cosRaw("e.embedding", "q.qe")}
            DESC, e.vec_id) AS rank
        FROM embeddings e, qv q WHERE e.vec_id <> 7
        QUALIFY rank <= 20),
      fused AS (
        SELECT doc_id,
          floor(1.0 / (60 + rank) * 1048576) / 1048576.0 AS c FROM lex
        UNION ALL
        SELECT doc_id,
          floor(1.0 / (60 + rank) * 1048576) / 1048576.0 AS c FROM sem)
      SELECT doc_id, SUM(c) AS rrf_score, COUNT(*) AS n_lists
      FROM fused GROUP BY doc_id
      ORDER BY rrf_score DESC, doc_id LIMIT 10""")),

    // Incremental exact dedup — the corpus-maintenance shape: dedup a
    // new feed drop against the existing corpus's hash index (semi-join
    // on the 16-byte hash, O(batch) not O(corpus)) plus within-batch
    // keep-first. Scenario: the index holds a deterministic half of the
    // feed (a re-crawl where half the items were already ingested), so
    // the anti-join path carries real signal; the within-batch path is
    // exercised in CurationOpsSpec with planted duplicates.
    QueryDef("q_incremental_dedup", (s, dir) => {
      val docs = t(s, dir, "documents")
      val index = docs
        .filter(DataSplit.hashBucket(col("doc_id"), 2, "corp") === 0)
        .select(TextDedup.normalizedHash(col("text")).as("h"))
      TextDedup.incrementalDedup(docs, "doc_id", "text", index, "h")
        .select(col("doc_id"), col("content_hash"))
    }, Some("""
      WITH h AS (
        SELECT doc_id,
          md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS content_hash
        FROM documents),
      idx AS (
        SELECT DISTINCT content_hash FROM h
        WHERE ('0x' || substr(md5(doc_id::VARCHAR || 'corp'), 1, 8))::BIGINT
          % 2 = 0)
      SELECT doc_id, content_hash FROM (
        SELECT f.doc_id, f.content_hash,
          ROW_NUMBER() OVER (PARTITION BY f.content_hash
            ORDER BY f.doc_id) AS rn
        FROM h f
        WHERE f.content_hash NOT IN (SELECT content_hash FROM idx))
      WHERE rn = 1""")),

    // Incremental NEAR-dup — q_incremental_dedup's MinHash-LSH twin: a
    // new feed drop is dropped wherever an LSH band collides with the
    // EXISTING corpus's band index AND the signature-estimated jaccard
    // clears 0.5 (>= 16 of 32 positions agree — exactly representable,
    // no float boundary), then near-deduplicated within itself (a doc
    // drops when any smaller-id corpus-survivor is its near-dup, so a
    // transitive cluster collapses to its smallest id). The corpus is
    // the deterministic half of the feed, so corpus docs re-arriving in
    // the batch are dropped by their own index entries (est = 1). The
    // oracle replays the full chain: signatures (DuckHash.minhashSig),
    // banding on the raw slice (bucket-equivalent to the engine's
    // xxhash64 band key), index bucket cap, the est>=16/32 verify on
    // both paths, and the smallest-id-survives within-batch rule.
    QueryDef("q_incremental_neardup", (s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs
        .filter(DataSplit.hashBucket(col("doc_id"), 2, "nd") === 0)
      val index = TextDedup.nearDupIndex(corpus, "doc_id", "text",
        n = 3, numHashes = 32, bands = 16)
      TextDedup.incrementalNearDup(docs, "doc_id", "text", index,
        n = 3, numHashes = 32, bands = 16, estThreshold = 0.5)
        .select(col("doc_id"),
          md5(concat_ws(",", transform(col("minhash_sig"),
            x => x.cast("string")))).as("sig_hash"))
    }, Some(s"""
      WITH ${DuckHash.minhashSig},
      corp AS (
        SELECT doc_id FROM documents
        WHERE ('0x' || substr(md5(doc_id::VARCHAR || 'nd'), 1, 8))::BIGINT
          % 2 = 0),
      idx AS (
        SELECT b AS band_idx,
          array_to_string(sig[b*2+1 : b*2+2], ',') AS band_key, sig
        FROM sig JOIN corp USING (doc_id), generate_series(0, 15) AS gs(b)),
      idx_capped AS (
        SELECT band_idx, band_key, sig FROM (
          SELECT idx.*,
            COUNT(*) OVER (PARTITION BY band_idx, band_key) AS bn
          FROM idx)
        WHERE bn <= 1000),
      batch AS (
        SELECT doc_id, b AS band_idx,
          array_to_string(sig[b*2+1 : b*2+2], ',') AS band_key, sig
        FROM sig, generate_series(0, 15) AS gs(b)),
      drop_corpus AS (
        SELECT DISTINCT ba.doc_id
        FROM batch ba
        JOIN idx_capped ix
          ON ba.band_idx = ix.band_idx AND ba.band_key = ix.band_key
        WHERE len(list_filter(generate_series(1, 32),
          i -> ba.sig[i] = ix.sig[i])) >= 16),
      surv AS (
        SELECT * FROM batch
        WHERE doc_id NOT IN (SELECT doc_id FROM drop_corpus)),
      surv_capped AS (
        SELECT doc_id, band_idx, band_key, sig FROM (
          SELECT surv.*,
            COUNT(*) OVER (PARTITION BY band_idx, band_key) AS bn
          FROM surv)
        WHERE bn BETWEEN 2 AND 1000),
      drop_batch AS (
        SELECT DISTINCT b.doc_id
        FROM surv_capped a
        JOIN surv_capped b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id
        WHERE len(list_filter(generate_series(1, 32),
          i -> a.sig[i] = b.sig[i])) >= 16)
      SELECT doc_id, md5(array_to_string(sig, ',')) AS sig_hash
      FROM sig
      WHERE doc_id NOT IN (SELECT doc_id FROM drop_corpus)
        AND doc_id NOT IN (SELECT doc_id FROM drop_batch)""")),

    // Distributed PCA over the embedding table, ENGINE-EXACT: one-pass
    // integer moment aggregation (n/Σx_q/Σx_q·x_qᵀ, map-side combined,
    // order-free — the corpus is scanned once, never shuffled),
    // driver-side quantized orthogonal power iteration on the integral
    // matrix A = n·M − S·Sᵀ, zero-shuffle exact projection. The full
    // fixed-count iteration replays in DuckDB as chained MATERIALIZED
    // CTEs (the q_kmeans Lloyd's-replay discipline applied to an
    // eigensolver), so the projection table is hash-oracled — the
    // round-4/5 rows-only status is closed. The double-precision path
    // (pcaFit) remains invariant-gated by q_pca_gate below.
    QueryDef("q_pca_project", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val model = Similarity.pcaFitExact(emb, "embedding",
        dim = 64, k = PcaK, iters = PcaIters)
      Similarity.pcaProjectExact(emb, "vec_id", "embedding", model)
        .orderBy(col("vec_id"))
    }, Some(pcaExactOracle)),

    // PCA gate oracle (q_semdedup_gate style): (1) components
    // orthonormal, (2) variances decreasing and non-negative, (3) the
    // DISTRIBUTED projected second moment E[proj_c²] equals the
    // driver-side Rayleigh quotient vᵀΣv exactly (this holds whether or
    // not power iteration converged — it certifies the one-pass moment
    // aggregation and the projection against the driver model), (4)
    // captured variance bounded by the trace and top-1 above the
    // per-dimension average.
    QueryDef("q_pca_gate", (s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val dim = 64
      val k = 4
      val model = Similarity.pcaFit(emb, "embedding", dim, k)
      def dotArr(x: Array[Double], y: Array[Double]): Double =
        x.zip(y).map { case (a, b) => a * b }.sum
      val orth = (for { i <- 0 until k; j <- i until k } yield
        math.abs(dotArr(model.components(i), model.components(j)) -
          (if (i == j) 1.0 else 0.0))).max <= 1e-6
      val dec = (0 until k - 1).forall(c =>
        model.variances(c) >= model.variances(c + 1) - 1e-9) &&
        model.variances(k - 1) >= -1e-9
      val proj = Similarity.pcaProject(emb, "vec_id", "embedding", model)
      val e2 = proj.select((0 until k).map(c =>
        avg(pow(element_at(col("proj"), c + 1), 2)).as(s"v$c")): _*).head()
      val varMatch = (0 until k).forall { c =>
        math.abs(e2.getDouble(c) - model.variances(c)) <=
          1e-6 * math.max(1.0, model.variances(c))
      }
      val trace = emb.select(avg(Similarity.dot(col("embedding"),
          col("embedding")))).head().getDouble(0) -
        model.mean.map(m => m * m).sum
      val bounded = model.variances.sum <= trace + 1e-9 &&
        model.variances(0) >= trace / dim
      Seq(("components_orthonormal", orth),
        ("variances_decreasing_nonneg", dec),
        ("projected_variance_matches_model", varMatch),
        ("captured_variance_bounded", bounded))
        .toDF("variant", "ok")
    }, Some("""
      SELECT * FROM (VALUES
        ('components_orthonormal', true),
        ('variances_decreasing_nonneg', true),
        ('projected_variance_matches_model', true),
        ('captured_variance_bounded', true)) AS t(variant, ok)"""),
      bench = false),

    // Composed curation DAG v2 over today's operators: Gopher gates
    // (the three rules with signal on this corpus) → temperature
    // (α=0.5) language rebalancing → incremental dedup against the
    // half-feed index → A-ES weighted top-3 per language. One green row
    // certifies the four-stage composition end-to-end; each stage's
    // replay is the oracle pattern proven by its standalone query.
    QueryDef("q_curation_v2", (s, dir) => {
      val docs = t(s, dir, "documents")
      val gated = TextAnalysis.gopherRules(docs, "doc_id", "text")
        .filter(col("ok_word_count") && col("ok_mean_word_len") &&
          col("ok_alpha_words"))
        .select(col("doc_id"))
        .join(docs, "doc_id")
      val rebalanced = DataSplit.temperatureSample(gated, "doc_id", "lang",
        alpha = 0.5, budgetRows = 150)
      val index = docs
        .filter(DataSplit.hashBucket(col("doc_id"), 2, "corp") === 0)
        .select(TextDedup.normalizedHash(col("text")).as("h"))
      val deduped = TextDedup.incrementalDedup(rebalanced, "doc_id", "text",
        index, "h")
      DataSplit.weightedSample(deduped, "doc_id", col("n_chars"),
          col("lang"), 3)
        .select(col("lang"), col("doc_id"), col("n_chars"),
          col("rk").cast("long").as("rk"))
    }, Some("""
      WITH gated AS (
        SELECT d.* FROM documents d JOIN (
          SELECT doc_id FROM (
            SELECT doc_id,
              len(regexp_extract_all(text, '\S+')) AS n_words,
              length(regexp_replace(text, '\s', '', 'g')) AS n_word_chars,
              len(list_filter(regexp_extract_all(text, '\S+'),
                w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha_words
            FROM documents)
          WHERE n_words BETWEEN 50 AND 100000
            AND n_word_chars >= 3 * n_words AND n_word_chars <= 10 * n_words
            AND 5 * n_alpha_words >= 4 * n_words) g
        ON d.doc_id = g.doc_id),
      tot AS (SELECT lang, COUNT(*) AS n FROM gated GROUP BY lang),
      qp AS (SELECT lang, n,
        floor(pow(CAST(n AS DOUBLE), 0.5) * 1048576) / 1048576.0 AS p
        FROM tot),
      sm AS (SELECT SUM(p) AS sp FROM qp),
      rates AS (
        SELECT lang,
          CAST(least(10000.0,
            floor(150.0 * p / sp / n * 10000.0)) AS BIGINT) AS bp
        FROM qp, sm),
      rebal AS (
        SELECT g.* FROM gated g JOIN rates r ON g.lang = r.lang
        WHERE ('0x' || substr(md5(g.doc_id::VARCHAR || 'temp'), 1, 8))::BIGINT
          % 10000 < r.bp),
      idx AS (
        SELECT DISTINCT
          md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS h
        FROM documents
        WHERE ('0x' || substr(md5(doc_id::VARCHAR || 'corp'), 1, 8))::BIGINT
          % 2 = 0),
      hashed AS (
        SELECT r.*,
          md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS content_hash
        FROM rebal r),
      fresh AS (
        SELECT * FROM (
          SELECT h.*,
            ROW_NUMBER() OVER (PARTITION BY h.content_hash
              ORDER BY h.doc_id) AS dedup_rn
          FROM hashed h
          WHERE h.content_hash NOT IN (SELECT h FROM idx))
        WHERE dedup_rn = 1)
      SELECT lang, doc_id, n_chars, rk FROM (
        SELECT lang, doc_id, n_chars,
          ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
            floor(ln(((('0x' || substr(md5(doc_id::VARCHAR || 'wsample'),
                1, 8))::BIGINT % 1048576) + 0.5) / 1048576.0) * 1048576)
              / 1048576.0 / CAST(n_chars AS DOUBLE) DESC,
            doc_id) AS rk
        FROM fresh)
      WHERE rk <= 3""")),

    // MMR diversification (Carbonell & Goldstein, SIGIR 1998): top-12
    // cosine candidates for the vec_id=3 query, then 4 greedy
    // selections balancing relevance (λ=0.7) against redundancy with
    // the already-selected set. The oracle unrolls the 4 selection
    // rounds as chained CTEs with the identical 6-dp-rounded cosines,
    // the identical (1.0 - 0.7) double for the redundancy weight, and
    // the operator's 2^-20 score quantization (which absorbs the
    // 1-ulp FMA-contraction delta between engines).
    QueryDef("q_mmr_rerank", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") === 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val cands = Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 3),
        qv, "vec_id", "embedding", "qid", "qvec", 12)
      val withVec = cands
        .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
        .select(col("qid"), col("vec_id"), col("sim"), col("embedding"))
      Similarity.mmrRerank(withVec, "qid", "vec_id", "sim", "embedding",
          k = 4, lambda = 0.7)
        .select(col("sel_rank"), col("vec_id"), col("sim"), col("mmr"))
    }, Some(s"""
      WITH qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 3),
      c0 AS (
        SELECT vec_id, embedding, rel FROM (
          SELECT e.vec_id, e.embedding,
            ROUND(${cosRaw("e.embedding", "q.qe")}, 6) AS rel,
            ROW_NUMBER() OVER (ORDER BY ${cosRaw("e.embedding", "q.qe")}
              DESC, e.vec_id) AS rnk
          FROM embeddings e, qv q WHERE e.vec_id <> 3)
        WHERE rnk <= 12),
      s1 AS (
        SELECT vec_id, embedding, rel,
          floor(0.7 * rel * 1048576) / 1048576.0 AS mmr, 1 AS sel_rank
        FROM c0 ORDER BY floor(0.7 * rel * 1048576) / 1048576.0 DESC,
          vec_id LIMIT 1),
      r1 AS (SELECT c.* FROM c0 c
        WHERE c.vec_id NOT IN (SELECT vec_id FROM s1)),
      m2 AS (
        SELECT r.vec_id, r.embedding, r.rel,
          floor((0.7 * r.rel - (1.0 - 0.7) *
            MAX(ROUND(${cosRaw("r.embedding", "s.embedding")}, 6)))
            * 1048576) / 1048576.0 AS mmr
        FROM r1 r CROSS JOIN s1 s
        GROUP BY r.vec_id, r.embedding, r.rel),
      s2 AS (SELECT vec_id, embedding, rel, mmr, 2 AS sel_rank
        FROM m2 ORDER BY mmr DESC, vec_id LIMIT 1),
      sel2 AS (SELECT vec_id, embedding FROM s1
        UNION ALL SELECT vec_id, embedding FROM s2),
      r2 AS (SELECT r.* FROM r1 r
        WHERE r.vec_id NOT IN (SELECT vec_id FROM s2)),
      m3 AS (
        SELECT r.vec_id, r.embedding, r.rel,
          floor((0.7 * r.rel - (1.0 - 0.7) *
            MAX(ROUND(${cosRaw("r.embedding", "s.embedding")}, 6)))
            * 1048576) / 1048576.0 AS mmr
        FROM r2 r CROSS JOIN sel2 s
        GROUP BY r.vec_id, r.embedding, r.rel),
      s3 AS (SELECT vec_id, embedding, rel, mmr, 3 AS sel_rank
        FROM m3 ORDER BY mmr DESC, vec_id LIMIT 1),
      sel3 AS (SELECT vec_id, embedding FROM sel2
        UNION ALL SELECT vec_id, embedding FROM s3),
      r3 AS (SELECT r.* FROM r2 r
        WHERE r.vec_id NOT IN (SELECT vec_id FROM s3)),
      m4 AS (
        SELECT r.vec_id, r.embedding, r.rel,
          floor((0.7 * r.rel - (1.0 - 0.7) *
            MAX(ROUND(${cosRaw("r.embedding", "s.embedding")}, 6)))
            * 1048576) / 1048576.0 AS mmr
        FROM r3 r CROSS JOIN sel3 s
        GROUP BY r.vec_id, r.embedding, r.rel),
      s4 AS (SELECT vec_id, embedding, rel, mmr, 4 AS sel_rank
        FROM m4 ORDER BY mmr DESC, vec_id LIMIT 1),
      allsel AS (
        SELECT vec_id, rel, mmr, sel_rank FROM s1
        UNION ALL SELECT vec_id, rel, mmr, sel_rank FROM s2
        UNION ALL SELECT vec_id, rel, mmr, sel_rank FROM s3
        UNION ALL SELECT vec_id, rel, mmr, sel_rank FROM s4)
      SELECT CAST(sel_rank AS BIGINT) AS sel_rank, vec_id,
        rel AS sim, mmr
      FROM allsel"""),
      bench = false)
  )
}
