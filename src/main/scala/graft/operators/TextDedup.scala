package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection for large text corpora — the operators a
  * training-data pipeline runs over billions of documents: exact dedup,
  * MinHash+LSH, SimHash, and n-gram Jaccard verification.
  *
  * Everything is built from native Spark expressions (split / transform /
  * aggregate / hash) — no UDFs, no serialization boundary — so the
  * shingling+hashing stage runs inside the scan stage. The only shuffles
  * are the LSH band group-bys, which move (band_key, doc_id) pairs —
  * tiny compared to the corpus. That is the property that matters at
  * 100 TB: signature computation is embarrassingly parallel, candidate
  * generation shuffles O(bands × docs) small rows, and verification only
  * touches candidate pairs.
  *
  * MinHash math: h_i(x) = (a_i * x + b_i) mod p with p = 2^31 - 1
  * (Mersenne prime) over base hashes folded into [0, p) — a*h stays
  * below 2^62 (no Long overflow under ANSI) while a*h+b >> p, so the
  * modulo genuinely permutes (a*h+b < p would be order-preserving and
  * all signatures would be perfectly correlated). Signature = element-
  * wise min. Banding: b bands of r rows; P[collide] = 1 - (1 - s^r)^b
  * for Jaccard s (Leskovec et al., Mining of Massive Datasets ch. 3).
  */
object TextDedup {

  val MersennePrime: Long = 2147483647L // 2^31 - 1

  /** Deterministic SplitMix64-derived coefficients (public-domain mixing
    * constants) in [1, p). */
  private def coef(seed: Long, n: Int): Seq[Long] =
    (0 until n).map { i =>
      var z = seed + (i + 1) * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      (math.abs(z ^ (z >>> 31)) % (MersennePrime - 1)) + 1
    }

  /** Word n-gram shingles of a text column, as an array column. */
  def shingles(textCol: Column, n: Int): Column = {
    val words = split(textCol, " ")
    transform(
      sequence(lit(1), greatest(size(words) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(words, i, lit(n))))
  }

  /** 31-bit hashes of each shingle (murmur3 folded to [0, 2^31-1)). */
  def shingleHashes(textCol: Column, n: Int): Column =
    transform(shingles(textCol, n),
      s => pmod(hash(s).cast("long"), lit(MersennePrime)))

  /** 64-bit word n-gram hashes, one compiled pass, no gram strings
    * (graft.functions.WordGramHashes). */
  def gramHashes(textCol: Column, n: Int, distinct: Boolean): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.WordGramHashes(
      ColumnBridge.expression(textCol), n, distinct))
  }

  /** MinHash signature: array of `numHashes` minima over permuted shingle
    * hashes. Delegates to the native single-pass expression
    * (graft.functions.MinHashSig) — per-row compute, no shuffle, no
    * boxing; see TextHashExprs for why this matters at corpus scale. */
  def minHashSignature(textCol: Column, n: Int, numHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.MinHashSig(
      ColumnBridge.expression(textCol), n, numHashes))
  }

  /** Per-document signatures: input columns + `minhash_sig`. */
  def withSignature(df: DataFrame, textCol: String,
      n: Int = 3, numHashes: Int = 32): DataFrame =
    df.withColumn("minhash_sig", minHashSignature(col(textCol), n, numHashes))

  /** LSH candidate pairs: docs whose signatures collide in >= 1 band.
    * Returns (id_a, id_b, n_bands) with id_a < id_b.
    *
    * Scale shape: explode to (band_idx, band_hash, id) — `bands` rows per
    * doc — then a per-bucket self-join. Degenerate buckets (boilerplate /
    * empty docs) are capped at `maxBucket` members, the standard guard
    * against quadratic blowup on skewed buckets.
    */
  def lshCandidates(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 32, bands: Int = 8,
      maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val banded = withSignature(df, textCol, n, numHashes)
      .select(col(idCol).as("__id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            transform(slice(col("minhash_sig"), lit(b * r + 1), lit(r)),
              x => x.cast("string"))))))
          .as(Seq("band_idx", "band_hash")))
    // one window pass computes bucket sizes (signatures are the
    // expensive part, so the plan must not re-reference `banded` — a
    // count-aggregate+join formulation recomputes the signature chain
    // per branch and benches slower); keeping only buckets of
    // 2..maxBucket members: singleton buckets — the vast majority —
    // never reach the pair join, degenerate (boilerplate) buckets are
    // dropped
    val capped = banded
      .withColumn("__bucket_n", count(lit(1)).over(
        Window.partitionBy(col("band_idx"), col("band_hash"))))
      .filter(col("__bucket_n").between(2, maxBucket))
      .drop("__bucket_n")
    val a = capped.select(col("band_idx"), col("band_hash"),
      col("__id").as("id_a"))
    val b = capped.select(col("band_idx").as("bi"),
      col("band_hash").as("bh"), col("__id").as("id_b"))
    a.join(b, col("band_idx") === col("bi") &&
        col("band_hash") === col("bh") && col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(countDistinct(col("band_idx")).as("n_bands"))
  }

  /** Exact n-gram Jaccard similarity: |A ∩ B| / |A ∪ B| over distinct
    * shingle sets. For verifying LSH candidates. */
  /** Benchmark decontamination: ids of corpus documents sharing at
    * least one word n-gram with an evaluation set — the pretraining
    * hygiene pass that keeps test data out of the training corpus
    * (the n-gram overlap rule of GPT-3 appendix C / PaLM, public).
    *
    * Scale shape: eval sets are tiny relative to a 100 TB corpus, so
    * the distinct benchmark grams BROADCAST and the probe is a map-side
    * LEFT SEMI join over the exploded corpus grams — no corpus shuffle
    * until the final distinct on (already small) matching ids. */
  def contaminated(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int): DataFrame = {
    // both sides probe 64-bit gram hashes, not gram strings: the
    // broadcast table and the join keys shrink ~10x, and the corpus
    // side never allocates gram strings at all
    val grams = docs.select(col(idCol),
      explode(gramHashes(col(textCol), n, distinct = true)).as("__g"))
    val bgrams = bench
      .select(explode(gramHashes(col(benchTextCol), n, distinct = true))
        .as("__g")).distinct()
    grams.join(broadcast(bgrams), Seq("__g"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** Exact duplicated-span pairs: documents sharing at least one
    * verbatim run of `spanTokens` words (the exact-substring dedup
    * signal of Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better" — here at word, not byte, granularity).
    * Returns (id_a, id_b, n_spans) with id_a < id_b, n_spans = number
    * of distinct shared spans.
    *
    * Scale shape: like [[lshCandidates]] but keyed by the exact span
    * hash instead of a banded signature — explode to (span_hash, id),
    * drop hashes seen once (a self-join can't match them; the
    * count-aggregate prunes the overwhelmingly-unique tail with
    * map-side partial aggregation and NO per-bucket materialization,
    * so a boilerplate span shared by 10^8 docs costs a counter, not a
    * list), cap degenerate buckets at `maxBucket`, then pair up within
    * the surviving buckets. Every stage shuffles on the span hash —
    * one exchange, reused — and moves (hash, id) pairs only, never the
    * text. Caveat: a bucket over `maxBucket` is dropped entirely, so
    * at thresholds where that fires the result undercounts boilerplate
    * (by design — those spans need a dictionary pass, not a join). */
  def sharedSpanPairs(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int, maxBucket: Int = 1000): DataFrame = {
    // 64-bit span keys: at corpus scale a 31-bit key would take birthday
    // collisions (~N^2/2^32 spurious pairs); the single-pass native
    // 64-bit gram hash keeps the expected collision count negligible
    // while never materializing span strings.
    val spans = df.select(col(idCol).as("__id"),
        explode(gramHashes(col(textCol), spanTokens, distinct = true))
          .as("__h"))
    val eligible = spans.groupBy(col("__h"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n").between(2, maxBucket))
      .select(col("__h"))
    val ok = spans.join(eligible, Seq("__h"))
    val b = ok.select(col("__h").as("__hb"), col("__id").as("id_b"))
    ok.select(col("__h"), col("__id").as("id_a"))
      .join(b, col("__h") === col("__hb") && col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(countDistinct(col("__h")).as("n_spans"))
  }

  /** Bloom-filter decontamination — the constant-memory scale shape of
    * [[contaminated]]. The benchmark grams are folded into one Bloom
    * filter DISTRIBUTED (Catalyst's BloomFilterAggregate: per-partition
    * partial filters OR-merged by the final aggregate), the single
    * binary blob comes back to the driver (small model state, like a
    * k-means codebook), and the corpus probe is then a pure projection:
    * might_contain(blob, xxhash64(gram)) evaluated map-side inside the
    * scan stage — no join against the eval set at all. The only shuffle
    * is the final distinct over the (already tiny) matching ids.
    *
    * Compared to the broadcast-semi-join of [[contaminated]], the probe
    * side here is O(1) memory per executor regardless of eval-set gram
    * count, at the cost of false positives (rate `fpp`, never false
    * negatives) — the standard trade once eval suites reach millions of
    * grams. */
  def contaminatedBloom(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int,
      expectedGrams: Long = 1L << 20, fpp: Double = 1e-4): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.types.BinaryType

    val blob = buildGramBloom(bench, benchTextCol, n, expectedGrams, fpp)
    if (blob == null) return docs.select(col(idCol)).filter(lit(false))

    val grams = docs.select(col(idCol),
      explode(gramHashes(col(textCol), n, distinct = true)).as("__g"))
    val probe = ColumnBridge.column(BloomFilterMightContain(
      Literal.create(blob, BinaryType),
      ColumnBridge.expression(col("__g"))))
    grams.filter(probe).select(col(idCol)).distinct()
  }

  /** Distributed Bloom build over the benchmark grams: per-partition
    * partial filters, OR-merged; one binary blob back to the driver.
    * Bit count m = -n ln(p) / (ln 2)^2 (optimal for target fpp).
    * Returns null when `bench` has no rows. */
  private def buildGramBloom(bench: DataFrame, benchTextCol: String,
      n: Int, expectedGrams: Long, fpp: Double): Array[Byte] = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

    val numBits = math.max(64L,
      (-expectedGrams * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val bgrams = bench
      .select(explode(gramHashes(col(benchTextCol), n, distinct = true))
        .as("__h"))
    val aggExpr = new BloomFilterAggregate(
      ColumnBridge.expression(col("__h")),
      Literal(expectedGrams), Literal(numBits)).toAggregateExpression()
    bgrams.agg(ColumnBridge.column(aggExpr).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Boilerplate span mining — the dictionary pass that handles what
    * [[sharedSpanPairs]]' `maxBucket` cap drops: spans repeated across
    * at least `minDf` documents (headers, licenses, navigation chrome)
    * are surfaced with their document frequency so a curation pipeline
    * can strip or down-weight them. Returns (span_hash, df). One
    * explode + one count aggregate — map-side partial counts, no pair
    * blowup regardless of how degenerate a span is; at 100 TB this is
    * the only safe way to even LOOK at spans shared by 10^8 docs. */
  def boilerplateSpans(df: DataFrame, textCol: String, spanTokens: Int,
      minDf: Long): DataFrame =
    df.select(explode(gramHashes(col(textCol), spanTokens,
        distinct = true)).as("span_hash"))
      .groupBy(col("span_hash"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)

  def jaccard(shinglesA: Column, shinglesB: Column): Column = {
    val ai = array_distinct(shinglesA)
    val bi = array_distinct(shinglesB)
    size(array_intersect(ai, bi)).cast("double") /
      size(array_union(ai, bi)).cast("double")
  }

  /** SimHash-64 (Charikar 2002): per-token 64-bit hashes vote ±1 per
    * bit; the fingerprint takes the sign of each bit's vote sum.
    * Delegates to the native expression (graft.functions.SimHash64Expr):
    * one compiled pass per row, no shuffle. */
  def simHash64(textCol: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.SimHash64Expr(
      ColumnBridge.expression(textCol)))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: all (id_a < id_b) whose 64-bit
    * fingerprints differ in at most `maxDist` bits — the web-scale
    * near-dup detector of Manku, Jain & Das Sarma, "Detecting
    * near-duplicates for web crawling", WWW'07 (public). Complements
    * [[minhashLsh]]: MinHash buckets by set similarity of shingles,
    * SimHash by bit-proximity of ONE 64-bit fingerprint — 8 bytes of
    * state per document however long the text, which is what makes a
    * 10^10-document dedup table fit a cluster.
    *
    * Pigeonhole banding makes it exact WITHOUT the all-pairs join:
    * split the 64 bits into maxDist+1 disjoint bands; two fingerprints
    * within maxDist differ in at most maxDist bands, so they MATCH on
    * at least one — bucket-joining per band finds every qualifying
    * pair, and an 8-byte XOR+popcount verifies each candidate. Scale
    * shape: fingerprint scan (one compiled pass, no shuffle) ->
    * explode k bands -> one aggregation per (band, bits) bucket ->
    * bounded pair expansion -> verification join against the
    * fingerprint table. `maxBucket` caps a degenerate bucket's k^2/2
    * blowup (identical boilerplate corpora), trading recall for
    * survival exactly like [[TextDedup.lshCandidates]].
    *
    * Returns (id_a, id_b, dist), id_a < id_b, dist <= maxDist. */
  def simhashNearDup(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, maxBucket: Int = 10000): DataFrame = {
    require(maxDist >= 0 && maxDist < 64, s"maxDist in [0,64), got $maxDist")
    require(maxBucket > 1, s"maxBucket must be > 1, got $maxBucket")
    val k = maxDist + 1
    // fingerprints materialized once: the banding pass and BOTH sides
    // of the verification join read this doc-sized table, not the text
    val fp = docs.select(col(idCol).cast("long").as("id"),
        simHash64(col(textCol)).as("sh"))
      .localCheckpoint(true)
    // k near-equal disjoint bit ranges covering all 64 bits
    val widths = Array.tabulate(k)(i => 64 / k + (if (i < 64 % k) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val bandCols = (0 until k).map { b =>
      val mask = if (widths(b) == 64) -1L else (1L << widths(b)) - 1L
      struct(lit(b).as("band"),
        shiftrightunsigned(col("sh"), offsets(b))
          .bitwiseAND(lit(mask)).as("bits"))
    }
    val cand = fp.select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .groupBy(col("bb.band"), col("bb.bits"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
    cand
      .join(fp.select(col("id").as("id_a"), col("sh").as("sha")), "id_a")
      .join(fp.select(col("id").as("id_b"), col("sh").as("shb")), "id_b")
      .select(col("id_a"), col("id_b"),
        hamming64(col("sha"), col("shb")).cast("int").as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** Exact dedup key: hash of normalized text (lowercase, collapsed
    * whitespace) — the first pass of any corpus dedup. */
  def normalizedHash(textCol: Column): Column =
    md5(lower(regexp_replace(textCol, "\\s+", " ")))

  /** Incremental exact dedup — the production corpus-maintenance shape:
    * a NEW batch (today's crawl / feed drop) is deduplicated (1) against
    * the hash index of the EXISTING corpus and (2) within itself
    * (keep-first by id). A pipeline that re-deduplicates the whole
    * corpus on every drop does O(total) work per day; this does
    * O(batch) + one semi-join against the index, which is the only
    * shape that survives a corpus that grows by terabytes daily.
    *
    * Scale shape: the index side carries ONLY the 16-byte content hash
    * (never text), so the anti-join shuffles hashes — or broadcasts
    * them when the index fits (AQE decides). Within-batch keep-first is
    * ROW_NUMBER over the hash key, which WindowGroupLimit bounds
    * map-side. Returns the surviving batch rows with their
    * `content_hash`, ready to append to both corpus and index. */
  def incrementalDedup(batch: DataFrame, idCol: String, textCol: String,
      corpusHashes: DataFrame, hashCol: String): DataFrame = {
    val hashed = batch.withColumn("content_hash", normalizedHash(col(textCol)))
    val fresh = hashed.join(
      corpusHashes.select(col(hashCol).as("content_hash")).distinct(),
      Seq("content_hash"), "left_anti")
    val w = Window.partitionBy(col("content_hash")).orderBy(col(idCol))
    val rn = Iterator.from(0).map(i => s"__graft_inc_rn$i")
      .find(n => !batch.columns.contains(n)).get
    fresh.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1).drop(rn)
  }

  /** (band_idx, band_hash, minhash_sig) rows per document — bands per
    * doc — shared by the incremental near-dup paths. Band hash =
    * xxhash64 over the band's signature slice, the same key
    * [[lshCandidates]] buckets on. */
  private def bandedSig(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    withSignature(df, textCol, n, numHashes)
      .select(col(idCol), col("minhash_sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            transform(slice(col("minhash_sig"), lit(b * r + 1), lit(r)),
              x => x.cast("string"))))))
          .as(Seq("band_idx", "band_hash")))
  }

  /** Estimated Jaccard from two MinHash signatures: the fraction of
    * agreeing positions (the unbiased MinHash estimator). */
  private def estJaccard(a: Column, b: Column, numHashes: Int): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), v => v))
      .cast("double") / numHashes

  /** Corpus-side NEAR-dup index: (band_idx, band_hash, minhash_sig)
    * rows, `bands` per document. This is what a growing corpus
    * persists instead of re-scanning text: fixed `bands x (8B key +
    * numHashes x 8B signature)` per document (~4 KB at the defaults),
    * independent of document size — never text. Degenerate buckets
    * (boilerplate that hashes millions of docs into one band bucket)
    * are capped at `maxBucket` members, the same quadratic-blowup
    * guard as [[lshCandidates]] (documented recall trade: a new doc
    * matching ONLY a capped bucket is not flagged). */
  def nearDupIndex(corpus: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 32, bands: Int = 16,
      maxBucket: Int = 1000): DataFrame =
    bandedSig(corpus, idCol, textCol, n, numHashes, bands)
      .select(col("band_idx"), col("band_hash"), col("minhash_sig"))
      .withColumn("__bucket_n", count(lit(1)).over(
        Window.partitionBy(col("band_idx"), col("band_hash"))))
      .filter(col("__bucket_n") <= maxBucket)
      .drop("__bucket_n")

  /** Incremental NEAR-dup — [[incrementalDedup]]'s MinHash-LSH twin,
    * the corpus-maintenance shape for fuzzy duplicates: a new batch is
    * (1) dropped against the EXISTING corpus wherever any of its LSH
    * bands collides with an index bucket AND the signature-estimated
    * Jaccard clears `estThreshold`, then (2) near-deduplicated within
    * itself keep-first: a doc is dropped when ANY smaller-`idCol`
    * corpus-surviving batch doc is its near-dup, so a transitive
    * near-dup cluster collapses to its smallest id. Corpus check
    * first: within-batch pairs are computed among corpus-survivors.
    *
    * Scale shape: O(batch x bands) rows join the index on
    * (band_idx, band_hash) — hash-partitioned or broadcast when the
    * index fits (AQE decides); the corpus is never re-scanned and no
    * text moves. The signature verify is 32 integer compares per
    * colliding band row, map-side. Returns surviving batch rows with
    * `minhash_sig`, ready to append to corpus and (banded) index.
    *
    * Reference counterpart: the reference has no fuzzy-dedup operator;
    * this extends its streaming-upsert maintenance idiom
    * (flink-table-runtime deduplicate functions) to the MinHash-LSH
    * curation op the training-data pipeline needs. */
  def incrementalNearDup(batch: DataFrame, idCol: String, textCol: String,
      index: DataFrame, n: Int = 3, numHashes: Int = 32, bands: Int = 16,
      estThreshold: Double = 0.5, maxBucket: Int = 1000): DataFrame = {
    val banded = bandedSig(batch, idCol, textCol, n, numHashes, bands)
    val dupVsCorpus = banded
      .join(index.select(col("band_idx").as("bi"), col("band_hash").as("bh"),
        col("minhash_sig").as("corpus_sig")),
        col("band_idx") === col("bi") && col("band_hash") === col("bh"))
      .filter(estJaccard(col("minhash_sig"), col("corpus_sig"),
        numHashes) >= estThreshold)
      .select(col(idCol)).distinct()
    val surv = banded.join(dupVsCorpus, Seq(idCol), "left_anti")
      .withColumn("__bucket_n", count(lit(1)).over(
        Window.partitionBy(col("band_idx"), col("band_hash"))))
      .filter(col("__bucket_n").between(2, maxBucket))
      .drop("__bucket_n")
    val droppedInBatch = surv
      .select(col("band_idx"), col("band_hash"), col(idCol).as("id_a"),
        col("minhash_sig").as("sig_a"))
      .join(surv.select(col("band_idx").as("bi"), col("band_hash").as("bh"),
        col(idCol).as("id_b"), col("minhash_sig").as("sig_b")),
        col("band_idx") === col("bi") && col("band_hash") === col("bh") &&
          col("id_a") < col("id_b"))
      .filter(estJaccard(col("sig_a"), col("sig_b"),
        numHashes) >= estThreshold)
      .select(col("id_b").as(idCol)).distinct()
    withSignature(batch, textCol, n, numHashes)
      .join(dupVsCorpus, Seq(idCol), "left_anti")
      .join(droppedInBatch, Seq(idCol), "left_anti")
  }

  /** Scala-side twin of [[normalizedHash]] for typed key extractors
    * (e.g. streaming keep-first dedup via `StatefulOps.keepFirst`). */
  def normalizedHashString(text: String): String = {
    // Locale.ROOT: default-locale toLowerCase turns 'I' into dotless 'ı'
    // under tr/az locales, silently diverging from Spark's lower()
    val normalized = text.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ")
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(normalized.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  /** Decontamination as a reusable PREDICATE: builds the Bloom filter
    * over the benchmark grams once (same distributed build as
    * [[contaminatedBloom]]) and returns a text-column -> boolean Column
    * function — true iff the text shares an n-gram with the eval set.
    * Being a pure projection, the probe drops into any batch or
    * STREAMING plan (the bloom blob rides along as a literal), which is
    * how a firehose ingestion pipeline filters contamination on the
    * fly. */
  def contaminatedProbe(bench: DataFrame, benchTextCol: String, n: Int,
      expectedGrams: Long = 1L << 20, fpp: Double = 1e-4)
      : Column => Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.types.BinaryType

    val blob = buildGramBloom(bench, benchTextCol, n, expectedGrams, fpp)
    if (blob == null) { _: Column => lit(false) }
    else { textCol: Column =>
      exists(gramHashes(textCol, n, distinct = true),
        h => ColumnBridge.column(BloomFilterMightContain(
          Literal.create(blob, BinaryType), ColumnBridge.expression(h))))
    }
  }
}
