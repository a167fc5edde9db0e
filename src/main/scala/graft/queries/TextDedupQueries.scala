package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.operators.{DataSplit, GlobalRank, SequencePacking, Similarity, TextAnalysis, TextDedup}
import graft.multimodal.Multimodal
import Q._

/** Text deduplication + decontamination — exact/keep-best dedup,
  * MinHash-LSH, SimHash, n-gram Jaccard, substring/span dedup (Lee et
  * al. 2022), boilerplate, Bloom decontamination, dedup-group
  * resolution. Hash-kernel oracles replay the native TextHash
  * expressions bit-exactly via [[DuckHash]].
  */
object TextDedupQueries {

  val defs: Seq[QueryDef] = Seq(


    // ---- deduplication ----

    // Exact dedup on normalized text: corpus summary + survivor pick.
    QueryDef("q_dedup_exact", (s, dir) => {
      t(s, dir, "documents")
        .groupBy(TextDedup.normalizedHash(col("text")).as("text_hash"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))
        .groupBy(col("n_copies"))
        .agg(count(lit(1)).as("n_groups"), min(col("keep_id")).as("min_keep"))
    }, Some("""
      SELECT n_copies, COUNT(*) AS n_groups, MIN(keep_id) AS min_keep
      FROM (SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g')))
              AS text_hash,
            COUNT(*) AS n_copies, MIN(doc_id) AS keep_id
            FROM documents GROUP BY 1)
      GROUP BY n_copies""")),


    // n-gram Jaccard similarity, exact, oracle-checked: all pairs within
    // a small id range (the verification kernel of LSH dedup).
    QueryDef("q_ngram_jaccard", (s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 40)
        .select(col("doc_id"), TextDedup.shingles(col("text"), 3).as("sh"))
      val a = d.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      val b = d.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(TextDedup.jaccard(col("sh_a"), col("sh_b")), 6).as("jac"))
        .filter(col("jac") > 0.05)
    }, Some("""
      WITH sh AS (
        SELECT doc_id,
          list_distinct(list_transform(
            generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
            i -> array_to_string(string_split(text,' ')[i:i+2], ' ')))
            AS grams
        FROM documents WHERE doc_id < 40)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
          / len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jac
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
          / len(list_distinct(list_concat(a.grams, b.grams))) > 0.05"""),
      bench = false),


    // MinHash signatures — deterministic, and the oracle replays the
    // full native kernel (FNV-1a word hashes → rolling 3-gram shingle
    // combine → 32 affine permutations mod 2^31-1) in DuckDB, with the
    // permutation coefficients inlined from the same TextHash.coef the
    // expression uses. sig_hash digests all 32 values via md5 (portable,
    // unlike xxhash64) so the whole signature is value-checked.
    QueryDef("q_minhash_signature", (s, dir) => {
      TextDedup.withSignature(t(s, dir, "documents"), "text")
        .select(col("doc_id"),
          element_at(col("minhash_sig"), 1).as("mh0"),
          element_at(col("minhash_sig"), 2).as("mh1"),
          md5(concat_ws(",",
            transform(col("minhash_sig"), x => x.cast("string"))))
            .as("sig_hash"))
    }, Some(s"""
      WITH ${DuckHash.minhashSig}
      SELECT doc_id, sig[1] AS mh0, sig[2] AS mh1,
        md5(array_to_string(sig, ',')) AS sig_hash
      FROM sig""")),


    // Full MinHash-LSH near-dup candidate pipeline. The oracle replays
    // the whole thing: signatures (DuckHash.minhashSig), banding —
    // grouped on the RAW per-band signature slice, which buckets
    // identically to the engine's xxhash64 band key (the hash is only a
    // bucket id; equal slice <=> equal hash, collisions aside) — the
    // 2..maxBucket size gate, the per-bucket self-join, and the exact
    // jaccard verify.
    QueryDef("q_minhash_lsh", (s, dir) => {
      val docs = fanOut(t(s, dir, "documents")) // minhash sigs per row (§2.5 guard)
      val cands = TextDedup.lshCandidates(docs, "doc_id", "text",
        n = 3, numHashes = 32, bands = 16)
      // verify candidates with exact jaccard
      val sh = docs.select(col("doc_id"),
        TextDedup.shingles(col("text"), 3).as("sh"))
      cands
        .join(sh.withColumnRenamed("doc_id", "id_a")
          .withColumnRenamed("sh", "sh_a"), Seq("id_a"))
        .join(sh.withColumnRenamed("doc_id", "id_b")
          .withColumnRenamed("sh", "sh_b"), Seq("id_b"))
        .select(col("id_a"), col("id_b"), col("n_bands"),
          round(TextDedup.jaccard(col("sh_a"), col("sh_b")), 6).as("jac"))
    }, Some(s"""
      WITH ${DuckHash.minhashSig},
      banded AS (
        SELECT doc_id, b AS band_idx,
          array_to_string(sig[b*2+1 : b*2+2], ',') AS band_key
        FROM sig, generate_series(0, 15) AS gs(b)),
      sizes AS (
        SELECT band_idx, band_key, COUNT(*) AS n
        FROM banded GROUP BY 1, 2),
      capped AS (
        SELECT banded.* FROM banded
        JOIN sizes USING (band_idx, band_key)
        WHERE sizes.n BETWEEN 2 AND 1000),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          COUNT(DISTINCT a.band_idx) AS n_bands
        FROM capped a
        JOIN capped b ON a.band_idx = b.band_idx
          AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      grams AS (
        SELECT doc_id, list_transform(
            generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
            i -> array_to_string(string_split(text,' ')[i:i+2], ' ')) AS g
        FROM documents)
      SELECT p.id_a, p.id_b, p.n_bands,
        ROUND(CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
          / len(list_distinct(list_concat(ga.g, gb.g))), 6) AS jac
      FROM pairs p
      JOIN grams ga ON ga.doc_id = p.id_a
      JOIN grams gb ON gb.doc_id = p.id_b""")),


    // MinHash-LSH recall gate: fraction of exact jaccard>=0.9 pairs
    // (the planted near-dups) surfaced as LSH candidates, computed in
    // Spark over a bounded id range (keeps the quadratic exact side
    // affordable at every SF), emitted as a floor boolean the oracle
    // asserts — the hash-gated quality check for the rows-only LSH
    // pipeline. bench=false: contains the exact all-pairs verify.
    QueryDef("q_text_dedup_gate", (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").filter(col("doc_id") < 1000)
      val sh = docs.select(col("doc_id"),
        TextDedup.shingles(col("text"), 3).as("sh"))
      val exact = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")),
          col("id_a") < col("id_b"))
        .withColumn("jac", TextDedup.jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jac") >= 0.9)
        .select(col("id_a"), col("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val cands = TextDedup.lshCandidates(docs, "doc_id", "text",
          n = 3, numHashes = 32, bands = 16)
        .select(col("id_a"), col("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall =
        if (exact.isEmpty) 1.0
        else (exact & cands).size.toDouble / exact.size
      // SimHash gate: the planted pairs must land within hamming 8 of
      // each other (64-bit fingerprints; jaccard>=0.9 text overlap)
      val shMap = docs.select(col("doc_id"),
          TextDedup.simHash64(col("text")).as("f"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val simRecall =
        if (exact.isEmpty) 1.0
        else exact.count { case (a, b) =>
          java.lang.Long.bitCount(shMap(a) ^ shMap(b)) <= 8
        }.toDouble / exact.size
      // winnowing gate: planted pairs must share >= half their
      // fingerprint sets (position-robust rolling-hash signatures)
      val fpMap = docs.select(col("doc_id"),
          TextAnalysis.winnowingFingerprint(col("text")).as("f"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      val fpRecall =
        if (exact.isEmpty) 1.0
        else exact.count { case (a, b) =>
          val (fa, fb) = (fpMap(a), fpMap(b))
          (fa & fb).size.toDouble / math.max(math.min(fa.size, fb.size), 1) >= 0.5
        }.toDouble / exact.size
      Seq(("minhash_lsh", recall >= 0.7),
        ("simhash_h8", simRecall >= 0.8),
        ("winnow_fp", fpRecall >= 0.8)).toDF("variant", "recall_ok")
    }, Some("""
      SELECT * FROM (VALUES ('minhash_lsh', true), ('simhash_h8', true),
        ('winnow_fp', true)) AS t(variant, recall_ok)"""),
      bench = false),


    // SimHash fingerprints + popcount. The oracle replays Charikar's
    // bit-vote construction over the same per-word splitmix64 hashes.
    QueryDef("q_simhash", (s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextDedup.simHash64(col("text")).as("sh"))
        .select(col("doc_id"), col("sh"),
          TextDedup.hamming64(col("sh"), lit(0L)).as("popcount"))
    }, Some(s"""
      WITH ${DuckHash.wordFnv},
      z0 AS (SELECT doc_id, fnv AS z FROM u),
      ${DuckHash.mixStages("z0")},
      hh AS (SELECT doc_id, list_transform(z, x -> xor(x, x >> 31)) AS h
        FROM m3),
      fp AS (SELECT doc_id,
          list_reduce(
            list_prepend(CAST(0 AS HUGEINT),
              list_reverse(list_transform(generate_series(0, 63), b ->
                CASE WHEN 2 * len(list_filter(h, x -> ((x >> b) & 1) = 1))
                       > len(h)
                     THEN CAST(1 AS HUGEINT) ELSE CAST(0 AS HUGEINT) END))),
            (a, x) -> a * 2 + x) AS fpu
        FROM hh)
      SELECT doc_id,
        ${DuckHash.toSigned("fpu")} AS sh,
        CAST(bit_count(${DuckHash.toSigned("fpu")}) AS INTEGER) AS popcount
      FROM fp""")),


    // SimHash near-dup JOIN (Manku et al. WWW'07): all pairs within
    // Hamming distance 3 via pigeonhole banding (4 disjoint 16-bit
    // bands — a matching band is guaranteed, so banding is exact, not
    // probabilistic). The oracle recomputes the fingerprints and runs
    // the all-pairs join the banding exists to avoid.
    QueryDef("q_simhash_neardup", (s, dir) => {
      TextDedup.simhashNearDup(t(s, dir, "documents"), "doc_id", "text", 3)
        .orderBy(col("id_a"), col("id_b"))
    }, Some(s"""
      WITH ${DuckHash.wordFnv},
      z0 AS (SELECT doc_id, fnv AS z FROM u),
      ${DuckHash.mixStages("z0")},
      hh AS (SELECT doc_id, list_transform(z, x -> xor(x, x >> 31)) AS h
        FROM m3),
      fp AS (SELECT doc_id,
          list_reduce(
            list_prepend(CAST(0 AS HUGEINT),
              list_reverse(list_transform(generate_series(0, 63), b ->
                CASE WHEN 2 * len(list_filter(h, x -> ((x >> b) & 1) = 1))
                       > len(h)
                     THEN CAST(1 AS HUGEINT) ELSE CAST(0 AS HUGEINT) END))),
            (a, x) -> a * 2 + x) AS fpu
        FROM hh),
      sgn AS (SELECT doc_id, ${DuckHash.toSigned("fpu")} AS sh FROM fp)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS dist
      FROM sgn a JOIN sgn b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sh, b.sh)) <= 3
      ORDER BY 1, 2""")),


    // Dedup GROUP resolution: connected components over the near-dup
    // pair graph — the step that turns LSH pairs into keep/drop
    // decisions. Spark side: min-label propagation
    // (operators.ConnectedComponents); oracle: DuckDB recursive CTE
    // computing min reachable id over the same (exactly-defined) edge
    // set. Every embedding gets a group id; singletons map to
    // themselves.
    // bench=false: at sf0.1 the synthetic 0.4-threshold graph is one
    // long sparse component, so convergence takes ~10 driver-synced
    // rounds of ~0.4 s fixed job overhead on a 920-edge graph — pure
    // small-data constant cost (the per-round work is linear in |E|
    // and the rounds are O(log diameter); at real scale the fixed
    // overhead vanishes). Correctness stays oracle-gated below.
    QueryDef("q_dedup_groups", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val pairs = Similarity.cosineNearDupExact(emb, "vec_id", "embedding", 0.4)
      graft.operators.ConnectedComponents
        .withSingletons(emb, "vec_id", pairs, "id_a", "id_b")
        .select(col("id").as("vec_id"), col("comp").as("group_id"))
    }, Some("""
      WITH RECURSIVE pairs AS (
        SELECT a.vec_id AS src, b.vec_id AS dst
        FROM embeddings a, embeddings b
        WHERE a.vec_id <> b.vec_id
          AND ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[]))
            / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                     CAST(a.embedding AS DOUBLE[])))
             * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])))), 6)
            >= 0.4
      ),
      reach(id, lbl) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT p.dst, r.lbl FROM reach r JOIN pairs p ON p.src = r.id
      )
      SELECT id AS vec_id, MIN(lbl) AS group_id FROM reach GROUP BY id"""),
      bench = false),


    // Dedup-cluster CANONICAL SELECTION — the keep/drop decision that
    // follows group resolution in every production dedup (Dolma /
    // DataComp "fuzzy dedup, keep longest"): exact 3-gram Jaccard
    // pairs (SetSimJoin, the LSH path's exact counterpart) → connected
    // components → keep the LONGEST document per cluster (ties to the
    // smaller doc_id). Every document gets (group_id, keep); exactly
    // one keep per group. The per-group argmax compiles to
    // WindowGroupLimit-style partial work, never a global sort.
    // bench=false: inherits q_dedup_groups' driver-synced CC rounds at
    // tiny SF (constant overhead, not scaling work).
    QueryDef("q_dedup_keep_best", (s, dir) => {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      val docs = t(s, dir, "documents")
      val tok = docs.select(col("doc_id"),
        ColumnBridge.column(graft.functions.NGrams(
          ColumnBridge.expression(lower(col("text"))), 3)).as("token"))
      val pairs = graft.operators.SetSimJoin
        .jaccardJoinTokens(tok, "doc_id", "token", 0.6)
        .select(col("id_a"), col("id_b"))
      val groups = graft.operators.ConnectedComponents
        .withSingletons(docs, "doc_id", pairs, "id_a", "id_b")
      groups.join(docs, groups("id") === docs("doc_id"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("comp"))
            .orderBy(col("n_chars").desc, col("doc_id"))))
        .select(col("doc_id"), col("comp").as("group_id"),
          (col("rk") === 1).as("keep"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH RECURSIVE w AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      tok AS (
        SELECT DISTINCT doc_id,
          unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                  FOR i IN range(1, greatest(len(ws) - 1, 1))]) AS token
        FROM w),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY 1),
      i AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM tok a JOIN tok b ON a.token = b.token
          AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      p0 AS (
        SELECT id_a, id_b FROM i
        JOIN sz sa ON sa.doc_id = i.id_a
        JOIN sz sb ON sb.doc_id = i.id_b
        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.6),
      pairs AS (
        SELECT id_a AS src, id_b AS dst FROM p0
        UNION ALL SELECT id_b, id_a FROM p0),
      reach(id, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT p.dst, r.lbl FROM reach r JOIN pairs p ON p.src = r.id),
      grp AS (SELECT id AS doc_id, MIN(lbl) AS group_id FROM reach GROUP BY id)
      SELECT d.doc_id, g.group_id,
        (row_number() OVER (PARTITION BY g.group_id
           ORDER BY d.n_chars DESC, d.doc_id) = 1) AS keep
      FROM documents d JOIN grp g ON g.doc_id = d.doc_id
      ORDER BY d.doc_id"""),
      bench = false),


    // Benchmark decontamination: docs sharing a 5-gram with the "eval
    // set" (every 50th doc). Spark side broadcasts the eval grams and
    // probes with a map-side semi join; the oracle recomputes the
    // overlap with DuckDB list intersection.
    QueryDef("q_decontaminate", (s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 50 === 0)
      TextDedup.contaminated(docs, "doc_id", "text", bench, "text", 5)
    }, Some("""
      WITH g AS (
        SELECT doc_id,
          list_transform(
            generate_series(1, greatest(len(string_split(text,' ')) - 4, 1)),
            i -> array_to_string(string_split(text,' ')[i:i+4], ' '))
            AS grams
        FROM documents),
      b AS (SELECT grams FROM g WHERE doc_id % 50 = 0)
      SELECT DISTINCT g.doc_id
      FROM g, b WHERE len(list_intersect(g.grams, b.grams)) > 0""")),


    // Bloom-filter decontamination: same contamination rule as
    // q_decontaminate but probed through a distributed-built Bloom
    // filter (constant executor memory at any eval-set size). FULLY
    // oracled, false positives included: Spark's BloomFilterImpl is the
    // standard double-hash scheme over Murmur3_x86_32.hashLong — DuckDB
    // replays the word-5-gram mix64 hashes, both murmur passes (seed 0,
    // then seed h1), the 13 combined-hash bit indices (sign-flip and
    // modulo the word-rounded bit size) and the all-bits-present
    // membership test. The superset-of-exact property stays asserted in
    // TextDedupSpec.
    QueryDef("q_decontaminate_bloom", (s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 50 === 0)
      // blob sized to the eval set (~2% of docs x ~100 grams): 2^17
      // expected grams keeps the literal ~0.3 MB instead of the 2.4 MB
      // default — plan-serialization weight matters per micro-batch
      TextDedup.contaminatedBloom(docs, "doc_id", "text", bench, "text", 5,
        expectedGrams = 1L << 17)
    }, Some {
      // mirror contaminatedBloom's sizing + the sketch library's
      // rounding: BitArray rounds bits up to whole 64-bit words;
      // k = max(1, round(m/n * ln 2))
      val expected = 1L << 17
      val numBits = math.max(64L,
        (-expected * math.log(1e-4) / (math.log(2) * math.log(2))).toLong)
      val bitSize = ((numBits + 63) / 64) * 64
      val k = math.max(1L, math.round(
        numBits.toDouble / expected * math.log(2)))
      import DuckHash.{fnv, mulmod, mixK1, mixH1, mul32}
      s"""
      WITH dg0 AS (
        SELECT doc_id,
          array_to_string(ws[g : least(g + 4, len(ws))], ' ') AS span
        FROM (SELECT doc_id, string_split(text, ' ') AS ws
              FROM documents),
          generate_series(1, 4000) AS gs(g)
        WHERE g <= greatest(len(ws) - 4, 1)),
      f0 AS (
        SELECT doc_id, ${fnv("list_transform(generate_series(1, " +
          "length(span)), i -> CAST(unicode(span[i]) AS UBIGINT))")} AS z
        FROM dg0),
      w1 AS (SELECT doc_id, ${mulmod("z", "11400714819323198485")} AS z
        FROM f0),
      w2 AS (SELECT doc_id, list_transform([xor(z, z >> 30)], x ->
        ${mulmod("x", "13787848793156543929")})[1] AS z FROM w1),
      w3 AS (SELECT doc_id, list_transform([xor(z, z >> 27)], x ->
        ${mulmod("x", "10723151780598845931")})[1] AS z FROM w2),
      dgu AS (SELECT DISTINCT doc_id, xor(z, z >> 31) AS u FROM w3),
      gd AS (SELECT DISTINCT u FROM dgu),
      mm0 AS (SELECT u, u % 4294967296 AS lo, u >> 32 AS hi FROM gd),
      h1a AS (SELECT u, lo, hi,
        ${mixH1("CAST(0 AS UBIGINT)", mixK1("lo"))} AS h FROM mm0),
      h1b AS (SELECT u, lo, hi, ${mixH1("h", mixK1("hi"))} AS h FROM h1a),
      h1c AS (SELECT u, lo, hi, xor(h, CAST(8 AS UBIGINT)) AS h FROM h1b),
      h1d AS (SELECT u, lo, hi,
        ${mul32("xor(h, h >> 16)", "2246822507")} AS h FROM h1c),
      h1e AS (SELECT u, lo, hi,
        ${mul32("xor(h, h >> 13)", "3266489917")} AS h FROM h1d),
      h1f AS (SELECT u, lo, hi, xor(h, h >> 16) AS h1 FROM h1e),
      h2a AS (SELECT u, lo, hi, h1,
        ${mixH1("h1", mixK1("lo"))} AS h FROM h1f),
      h2b AS (SELECT u, lo, hi, h1,
        ${mixH1("h", mixK1("hi"))} AS h FROM h2a),
      h2c AS (SELECT u, lo, hi, h1, xor(h, CAST(8 AS UBIGINT)) AS h
        FROM h2b),
      h2d AS (SELECT u, lo, hi, h1,
        ${mul32("xor(h, h >> 16)", "2246822507")} AS h FROM h2c),
      h2e AS (SELECT u, lo, hi, h1,
        ${mul32("xor(h, h >> 13)", "3266489917")} AS h FROM h2d),
      h2f AS (SELECT u, h1, xor(h, h >> 16) AS h2 FROM h2e),
      ubits AS (
        SELECT u, bit FROM (
          SELECT u,
            CASE WHEN comb >= 2147483648 THEN 4294967295 - comb
              ELSE comb END % $bitSize AS bit
          FROM (SELECT u,
              CAST((CAST(h1 AS HUGEINT) + i * CAST(h2 AS HUGEINT))
                % 4294967296 AS UBIGINT) AS comb
            FROM h2f, generate_series(1, $k) AS ks(i)))),
      ebits AS (
        SELECT DISTINCT b.bit
        FROM dgu d JOIN ubits b ON b.u = d.u
        WHERE d.doc_id % 50 = 0),
      contained AS (
        SELECT ub.u FROM ubits ub
        LEFT JOIN ebits e ON e.bit = ub.bit
        GROUP BY ub.u
        HAVING COUNT(*) = COUNT(e.bit))
      SELECT DISTINCT d.doc_id
      FROM dgu d JOIN contained c ON c.u = d.u"""
    }),


    // Exact duplicated-span pairs (Lee et al. 2022 substring dedup at
    // word granularity): docs sharing a verbatim 6-token run. The
    // oracle recomputes the same pairs by joining the span STRINGS
    // (Spark joins 64-bit span hashes — collision odds ~N^2/2^65), so a
    // green row proves the hash-bucketed plan equals the string join.
    QueryDef("q_substring_dup", (s, dir) => {
      // maxBucket uncapped: the oracle joins ALL span strings, so the
      // Spark side must not drop degenerate buckets (the cap is the
      // production default, exercised in TextDedupSpec instead)
      TextDedup.sharedSpanPairs(t(s, dir, "documents"), "doc_id", "text", 6,
        maxBucket = Int.MaxValue)
    }, Some("""
      WITH g AS (
        SELECT doc_id,
          list_distinct(list_transform(
            generate_series(1, greatest(len(string_split(text,' ')) - 5, 1)),
            i -> array_to_string(string_split(text,' ')[i:i+5], ' ')))
            AS spans
        FROM documents),
      e AS (SELECT doc_id, unnest(spans) AS span FROM g)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        COUNT(DISTINCT a.span) AS n_spans
      FROM e a JOIN e b ON a.span = b.span AND a.doc_id < b.doc_id
      GROUP BY 1, 2""")),


    // Boilerplate span mining (the dictionary pass complementing the
    // substring-dedup bucket cap): 3-token spans appearing in >= 2
    // docs, summarized as a document-frequency histogram so the DuckDB
    // oracle can verify without replicating the span hash.
    QueryDef("q_boilerplate", (s, dir) => {
      TextDedup.boilerplateSpans(t(s, dir, "documents"), "text", 3, 2)
        .groupBy(col("df")).agg(count(lit(1)).as("n_spans"))
    }, Some("""
      WITH e AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
          generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
          i -> array_to_string(string_split(text,' ')[i:i+2], ' '))))
          AS span
        FROM documents),
      d AS (SELECT span, COUNT(DISTINCT doc_id) AS df FROM e GROUP BY span)
      SELECT df, COUNT(*) AS n_spans FROM d WHERE df >= 2 GROUP BY df"""))
  )
}
