package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * Spark expressions — per-row, codegen-friendly, zero shuffle — so they
  * compose into a single scan pass over a 100 TB corpus.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(textCol: Column): Column = size(split(textCol, "\\s+"))

  /** Content-defined chunks (Rabin-boundary CDC rule, window 16,
    * divisor 64 → ~64-char expected chunks) — see
    * graft.functions.ContentChunks for the boundary arithmetic. */
  def contentChunks(textCol: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.ContentChunks(
      ColumnBridge.expression(textCol), 16, 31L, 1048573L, 64L))
  }

  /** BPE-ish token estimate: words + digit runs + punctuation marks
    * counted separately (a regex approximation of subword tokenizers). */
  def bpeishTokenCount(textCol: Column): Column =
    size(regexp_extract_all(textCol,
      lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** PII redaction: replaces emails, IPv4 addresses and international
    * phone numbers with typed placeholder tokens — the standard scrub
    * pass before pretraining. Pure regexp_replace chain (codegen'd,
    * zero shuffle); patterns are RE2-safe so the same rules run
    * identically in other engines. */
  def redactPii(textCol: Column): Column = {
    val email = regexp_replace(textCol,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\+\\d{7,15}\\b", "<PHONE>")
  }

  /** Gopher-style repetition signal (Rae et al. 2021, public): the
    * fraction of word n-grams that are duplicates of an earlier n-gram
    * in the same document. High values flag boilerplate/spam — the
    * standard cheap repetition filter for pretraining corpora. Pure
    * expression, zero shuffle. */
  def dupNgramFraction(textCol: Column, n: Int): Column = {
    // native 64-bit gram hashes: distinct-counting hashes instead of
    // materialized gram strings (collision odds ~grams^2/2^65 per doc)
    val g = TextDedup.gramHashes(textCol, n, distinct = false)
    lit(1.0) - size(array_distinct(g)).cast("double") / size(g)
  }

  /** Heuristic quality score in [0,1]: combines length band, mean word
    * length band, punctuation density and non-alnum density — the
    * standard cheap pre-filter shape (Gopher/C4-style rules, public). */
  def qualityScore(textCol: Column): Column = {
    val nChars = length(textCol).cast("double")
    val nWords = tokenCount(textCol).cast("double")
    val meanWordLen = (nChars - nWords + 1.0) / nWords
    val punct = size(regexp_extract_all(textCol,
      lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double")
    val lengthOk = when(nWords >= 10 && nWords <= 100000, 1.0).otherwise(0.0)
    val wordLenOk = when(meanWordLen >= 2.5 && meanWordLen <= 12.0, 1.0)
      .otherwise(0.0)
    val punctOk = when(punct / nChars <= 0.2, 1.0).otherwise(0.0)
    round((lengthOk + wordLenOk + punctOk) / 3.0, 4)
  }

  /** Canonical text cleanup — the standard first pass of a curation
    * pipeline, in normalization order: (1) Unicode NFC composition
    * (native [[graft.functions.NfcNormalize]] expression, so combining
    * marks and precomposed characters dedup identically), (2) strip
    * C0/DEL control characters (tab/newline survive as whitespace),
    * (3) collapse whitespace runs to one space, (4) trim. Pure per-row
    * projection with codegen — composes into the single 100-TB curation
    * scan; every step is RE2-safe so other engines replay it exactly. */
  def cleanText(textCol: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val nfc = ColumnBridge.column(graft.functions.NfcNormalize(
      ColumnBridge.expression(textCol)))
    val noCtl = regexp_replace(nfc, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    trim(regexp_replace(noCtl, "\\s+", " "))
  }

  /** HTML → text extraction — the front-of-pipeline stage that turns a
    * raw crawl payload into curable text (the role trafilatura /
    * jusText play in public curation stacks, reduced to the
    * deterministic core): (1) drop <script>/<style> subtrees and
    * comments, (2) block-level closers (</p>, </div>, </li>, </h_>,
    * </tr>, <br>) become newlines so paragraph structure survives,
    * (3) strip remaining tags, (4) decode the six ubiquitous entities
    * (&amp; last, so &amp;lt; decodes to the literal "&lt;"), (5)
    * collapse intra-line whitespace and 3+ newline runs.
    *
    * Every step is one RE2-safe regexp_replace — a chain of codegen'd
    * projections in the same single 100-TB scan as [[cleanText]] /
    * [[qualityScore]], zero shuffle, and any engine with regex
    * replace-all replays it byte-for-byte (the DuckDB oracle does). */
  def extractHtmlText(htmlCol: Column): Column = {
    val noScript = regexp_replace(htmlCol,
      "(?is)<(script|style)\\b[^>]*>.*?</(script|style)>", "")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", "")
    val blocks = regexp_replace(noComment,
      "(?i)<br\\s*/?>|</(p|div|li|h[1-6]|tr)>", "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]*>", "")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        regexp_replace(c, java.util.regex.Pattern.quote(from), to) }
    val oneSpace = regexp_replace(ent, "[ \\t\\x0B\\f\\r]+", " ")
    trim(regexp_replace(
      regexp_replace(oneSpace, " ?\\n ?", "\n"), "\\n{3,}", "\n\n"))
  }

  /** Markup-density signals over the RAW html — the link/tag-density
    * boilerplate heuristic (jusText's core signal): pages whose text is
    * mostly anchor text are navigation, not content. Returns
    * (n_tags, n_links, link_char_fraction·2^-20-quantized) columns to
    * gate on. */
  def htmlStats(htmlCol: Column): (Column, Column, Column) = {
    val nTags = size(regexp_extract_all(htmlCol, lit("(?s)<[^>]*>"), lit(0)))
      .cast("long")
    val nLinks = size(regexp_extract_all(htmlCol,
      lit("(?is)<a\\b[^>]*>"), lit(0))).cast("long")
    val anchorChars = coalesce(aggregate(
      transform(
        regexp_extract_all(htmlCol, lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)),
        a => length(extractHtmlText(a)).cast("long")),
      lit(0L), (acc, x) => acc + x), lit(0L))
    val textChars = greatest(length(extractHtmlText(htmlCol)).cast("long"),
      lit(1L))
    val frac = floor(anchorChars.cast("double") / textChars * 1048576) /
      lit(1048576.0)
    (nTags, nLinks, frac)
  }

  /** Overlapping fixed-size word-window chunking — how a pretraining /
    * RAG pipeline slices documents into model-sized pieces. Each
    * document of n words yields ceil(n / stride) chunks starting at
    * 0, stride, 2·stride, ... each `chunkSize` words long (the last
    * ones shorter), so consecutive chunks overlap by
    * `chunkSize - stride` words.
    *
    * Scale shape: split + explode-over-sequence + slice — all native
    * expressions in one scan pass, zero shuffle. The only 100-TB cost
    * is the deliberate output inflation of the overlap, a factor of
    * chunkSize/stride (1.33× at 32/24); everything else is per-row.
    *
    * Returns (idCol, chunk_idx, chunk_text, n_tokens).
    */
  def chunkWords(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be > 0")
    // \S+ extraction, not split-on-space: split("") yields [""], which
    // would emit a phantom (chunk_text="", n_tokens=1) chunk for empty /
    // whitespace-only documents; extraction yields [] and the filter
    // below drops such documents entirely
    val words = regexp_extract_all(col(textCol), lit("\\S+"), lit(0))
    df.select(col(idCol), words.as("__w"))
      .filter(size(col("__w")) > 0)
      .select(col(idCol), col("__w"),
        explode(sequence(lit(0), greatest(size(col("__w")) - 1, lit(0)),
          lit(stride))).as("__s"))
      .select(col(idCol),
        (col("__s") / stride).cast("int").as("chunk_idx"),
        array_join(slice(col("__w"), col("__s") + 1, lit(chunkSize)), " ")
          .as("chunk_text"),
        size(slice(col("__w"), col("__s") + 1, lit(chunkSize)))
          .cast("long").as("n_tokens"))
  }

  /** Shannon word-entropy per document (nats) — the "perplexity-lite"
    * quality signal of corpus curation (low entropy ⇒ repetitive /
    * template / spam text; used alongside the repetition ratios, cf.
    * the Gopher quality heuristics, Rae et al. 2021, public). Also
    * reports the type-token ratio (distinct/total words).
    *
    * Numeric discipline: H = ln(N) − (Σ c·ln c)/N over the word
    * histogram. Each c·ln c term is floor-quantized to a multiple of
    * 2^-10 BEFORE the sum, so the Σ is exact and order/partition-free
    * (the PageRank trick); ln(N) is quantized the same way, leaving ONE
    * IEEE division + subtraction — a fixed op sequence any engine
    * reproduces bit-for-bit, which is what lets the DuckDB oracle
    * hash-match the entropy doubles.
    *
    * Scale shape: explode → count by (doc, word) → sum by doc. Both
    * aggregations are partial-aggregate friendly, so the shuffled data
    * is the per-doc VOCABULARY (distinct words), not the token stream;
    * per-doc state is O(1) afterward. Returns
    * (idCol, n_words, n_distinct, entropy, ttr); empty/whitespace-only
    * documents are dropped (entropy of nothing is undefined).
    */
  def wordEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val q = 1024.0
    val counts = df
      .select(col(idCol), explode(
        regexp_extract_all(lower(col(textCol)), lit("\\S+"), lit(0)))
        .as("__w"))
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__c"))
    counts.groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        sum(floor(col("__c") * log(col("__c").cast("double")) * q) / q)
          .as("__st"))
      .select(col(idCol), col("n_words"), col("n_distinct"),
        // the two floors quantize on different grids, so a uniform doc
        // can land a hair BELOW zero — clamp (entropy is nonnegative)
        greatest(lit(0.0),
          floor(log(col("n_words").cast("double")) * q) / q
            - col("__st") / col("n_words").cast("double")).as("entropy"),
        (col("n_distinct").cast("double") / col("n_words").cast("double"))
          .as("ttr"))
  }

  /** The Gopher document-quality rule set (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training
    * Gopher", Appendix A — public): the canonical cheap pre-filter a
    * pretraining pipeline runs before any model-based scoring. Emits
    * the per-document counters, one boolean per rule, and the combined
    * keep decision:
    *
    *  - word count in [50, 100000]
    *  - mean word length in [3, 10] characters
    *  - symbol-to-word ratio (# or ellipsis) <= 0.1
    *  - at most 90% of lines start with a bullet (-, *, •)
    *  - at most 30% of lines end with an ellipsis
    *    (Gopher removes documents with MORE than 90%/30%, so the
    *    exact-boundary document is kept)
    *  - >= 80% of words contain at least one alphabetic character
    *  - at least 2 distinct required stopwords present
    *    (the/be/to/of/and/that/have/with)
    *
    * Numeric discipline: every ratio threshold is an exact integer
    * cross-multiplication (e.g. mean word length in [3,10] ⇔
    * 3·n_words <= n_word_chars <= 10·n_words), so there is no float
    * anywhere and any engine replays the decision bit-for-bit.
    *
    * Scale shape: pure per-row expressions over one scan — zero
    * shuffle, composes into the single 100-TB curation pass alongside
    * [[qualityScore]] / [[dupNgramFraction]] / [[redactPii]]. */
  def gopherRules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val base = df.select(col(idCol),
      regexp_extract_all(col(textCol), lit("\\S+"), lit(0)).as("__w"),
      split(col(textCol), "\n").as("__l"),
      col(textCol).as("__t"))
    val counted = base.select(
      col(idCol),
      size(col("__w")).cast("long").as("n_words"),
      length(regexp_replace(col("__t"), "\\s", "")).cast("long")
        .as("n_word_chars"),
      size(regexp_extract_all(col("__t"), lit("#|\\.\\.\\."), lit(0)))
        .cast("long").as("n_symbols"),
      size(col("__l")).cast("long").as("n_lines"),
      size(filter(col("__l"), l => trim(l).rlike("^[-*•]")))
        .cast("long").as("n_bullet_lines"),
      size(filter(col("__l"), l => l.rlike("\\.\\.\\.$")))
        .cast("long").as("n_ellipsis_lines"),
      size(filter(col("__w"), w => w.rlike("[A-Za-z]")))
        .cast("long").as("n_alpha_words"),
      size(array_intersect(transform(col("__w"), w => lower(w)),
        typedlit(stops))).cast("long").as("n_stop_hits"))
    val okWords = col("n_words") >= 50 && col("n_words") <= 100000
    val okWordLen = col("n_word_chars") >= lit(3) * col("n_words") &&
      col("n_word_chars") <= lit(10) * col("n_words")
    val okSymbols = lit(10) * col("n_symbols") <= col("n_words")
    val okBullets = lit(10) * col("n_bullet_lines") <= lit(9) * col("n_lines")
    val okEllipsis = lit(10) * col("n_ellipsis_lines") <= lit(3) * col("n_lines")
    val okAlpha = lit(5) * col("n_alpha_words") >= lit(4) * col("n_words")
    val okStops = col("n_stop_hits") >= 2
    counted.select(col(idCol), col("n_words"), col("n_word_chars"),
      col("n_symbols"), col("n_lines"), col("n_bullet_lines"),
      col("n_ellipsis_lines"), col("n_alpha_words"), col("n_stop_hits"),
      okWords.as("ok_word_count"), okWordLen.as("ok_mean_word_len"),
      okSymbols.as("ok_symbol_ratio"), okBullets.as("ok_bullets"),
      okEllipsis.as("ok_ellipsis"), okAlpha.as("ok_alpha_words"),
      okStops.as("ok_stopwords"),
      (okWords && okWordLen && okSymbols && okBullets && okEllipsis &&
        okAlpha && okStops).as("keep"))
  }

  /** Language-ID via stopword hit-rates: fraction of tokens that are
    * high-frequency function words of each language (an n-gram-free
    * variant of the classic heuristic; deterministic). Returns the
    * arg-max language code among the profiled set, 'und' if no hits. */
  def langId(textCol: Column): Column = {
    val profiles: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it",
        "was", "for", "on", "with", "as", "at", "by"),
      "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den",
        "nicht", "ein", "eine", "zu", "im", "für", "auf"),
      "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "se",
        "las", "por", "un", "una", "con", "para"),
      "fr" -> Seq("le", "la", "les", "de", "des", "et", "est", "en", "un",
        "une", "du", "que", "pour", "dans", "qui"),
      "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这",
        "他", "也", "就", "人", "都", "说"))
    val words = split(lower(textCol), "\\s+")
    val scores = profiles.map { case (lang, stops) =>
      val stopArr = array(stops.map(lit): _*)
      struct(
        (size(array_intersect(words, stopArr)).cast("double") /
          greatest(size(words), lit(1)).cast("double")).as("score"),
        lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    when(best.getField("score") > 0.0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Hashing-trick linear classifier score — the evaluation plumbing of
    * a fastText-style document quality classifier (public: Weinberger
    * et al. 2009 feature hashing; Joulin et al. 2016 fastText): each
    * token hashes into one of `weights.size` buckets and the document
    * score is the mean bucket weight. The weight vector is trained
    * offline and supplied here; scoring is a pure zero-shuffle
    * projection with the weights riding along as a literal array, so it
    * composes into the single curation scan at corpus scale. The token
    * hash is the portable md5 bucket of [[DataSplit.hashBucket]], so
    * the same weights score identically in any engine. */
  def hashingTrickScore(textCol: Column, weights: Seq[Double],
      seed: String = "feat"): Column = {
    val dim = weights.size
    val wlit = typedlit(weights)
    // \S+ extraction, not split-on-\s+: split emits empty tokens for
    // leading/trailing whitespace, which would hash the ''-bucket weight
    // into the score and skew the divisor
    val toks = regexp_extract_all(textCol, lit("\\S+"), lit(0))
    val total = aggregate(toks, lit(0.0), (acc, tok) =>
      acc + element_at(wlit,
        (DataSplit.hashBucket(tok, dim, seed) + 1).cast("int")))
    total / size(toks).cast("double")
  }

  /** [[hashingTrickScore]] with xxhash64 feature hashing — the
    * production variant for 100 TB scans: md5-per-token (the portable
    * oracle path above) costs a full digest per word, xxhash64 is a
    * native codegen'd expression an order of magnitude cheaper. Same
    * estimator, different (engine-local) bucket assignment — weights
    * trained against one hash are NOT interchangeable with the other. */
  def hashingTrickScoreFast(textCol: Column, weights: Seq[Double],
      seed: String = "feat"): Column = {
    val dim = weights.size
    val wlit = typedlit(weights)
    val toks = regexp_extract_all(textCol, lit("\\S+"), lit(0))
    val total = aggregate(toks, lit(0.0), (acc, tok) =>
      acc + element_at(wlit,
        (pmod(xxhash64(concat_ws("|", lit(seed), tok)), lit(dim)) + 1)
          .cast("int")))
    total / size(toks).cast("double")
  }

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD 2003,
    * public algorithm): k-gram hashes, then the minimum hash in each
    * sliding window of size w — a compact, position-robust signature
    * used for plagiarism/near-dup detection. Returns array<long>. */
  def winnowingFingerprint(textCol: Column, k: Int = 5, w: Int = 4): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // native expression: rolling k-gram hashes + monotonic-deque window
    // minima — O(len) per row (the declarative slice/array_min version
    // is O(len·w) with interpreted per-gram allocation)
    ColumnBridge.column(graft.functions.WinnowFingerprint(
      ColumnBridge.expression(textCol), k, w))
  }
}
