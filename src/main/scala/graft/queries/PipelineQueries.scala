package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.operators.{DataSplit, GlobalRank, SequencePacking, Similarity, TextAnalysis, TextDedup}
import graft.multimodal.Multimodal
import Q._

/** Training-data pipeline operators over the documents/embeddings
  * tables: dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard),
  * similarity search (brute force + SRP-LSH), text analysis (lang-ID,
  * quality, token counts, fingerprints), multimodal plumbing.
  *
  * Oracle-checked where DuckDB can express the same computation; the
  * hash-based ops (MinHash/SimHash/LSH/fingerprints) are deterministic
  * but engine-specific, so they get the driver's rows-only check plus
  * ScalaTest property/unit coverage.
  */
object PipelineQueries {

  /** DuckDB SQL fragments replaying the native TextHash kernels
    * (functions/TextHashExprs.scala) bit-exactly, so the hash-based
    * dedup signatures get real value oracles instead of rows-only
    * checks. 64-bit wrap-around arithmetic is emulated in HUGEINT with
    * a 32-bit operand split (a full 64x64 product overflows signed
    * INT128); Java's signed-long view is recovered with an explicit
    * 2^64 offset. The corpus is ASCII (TESTDATA), so DuckDB code
    * points == Java chars. */
  private object DuckHash {
    val T = "18446744073709551616" // 2^64

    /** (x * k) mod 2^64 for UBIGINT x and a 64-bit constant k. */
    def mulmod(x: String, k: String): String =
      s"CAST(((((CAST($x >> 32 AS HUGEINT) * $k) % 4294967296) * 4294967296" +
        s" + CAST($x % 4294967296 AS HUGEINT) * $k) % $T) AS UBIGINT)"

    /** Reinterpret UBIGINT as Java signed long. */
    def toSigned(u: String): String =
      s"CAST(CASE WHEN $u >= 9223372036854775808 THEN CAST($u AS HUGEINT)" +
        s" - $T ELSE CAST($u AS HUGEINT) END AS BIGINT)"

    /** FNV-1a fold over a UBIGINT char-code list (prime 2^40 — the
      * direct HUGEINT product cannot overflow). */
    def fnv(codes: String): String =
      s"list_reduce(list_prepend(CAST(14695981039346656037 AS UBIGINT)," +
        s" $codes), (h, c) -> CAST((CAST(xor(h, c) AS HUGEINT)" +
        s" * 1099511628211) % $T AS UBIGINT))"

    /** Three CTEs applying the splitmix64 finalization stages to a
      * UBIGINT list column `z` of table `src`, leaving `doc_id, z`.
      * The single-element list_transform is a let-binding so each
      * xor-shifted value is computed once. */
    def mixStages(src: String): String =
      s"""m1 AS (SELECT doc_id, list_transform(z, x ->
             ${mulmod("x", "11400714819323198485")}) AS z FROM $src),
         m2 AS (SELECT doc_id, list_transform(z, x0 ->
             list_transform([xor(x0, x0 >> 30)], x ->
               ${mulmod("x", "13787848793156543929")})[1]) AS z FROM m1),
         m3 AS (SELECT doc_id, list_transform(z, x0 ->
             list_transform([xor(x0, x0 >> 27)], x ->
               ${mulmod("x", "10723151780598845931")})[1]) AS z FROM m2)"""

    /** CTE prefix: per-word FNV-1a hashes of the space-split text,
      * exactly TextHash.wordBounds + hashChars. */
    val wordFnv: String =
      s"""w AS (SELECT doc_id, string_split(text, ' ') AS words
             FROM documents),
         u AS (SELECT doc_id, list_transform(words, wd ->
             ${fnv("list_transform(generate_series(1, length(wd))," +
               " i -> CAST(unicode(wd[i]) AS UBIGINT))")}) AS fnv FROM w)"""

    /** rotl(x, r) mod 2^64: the shifted halves are disjoint, so OR ==
      * XOR; the left shift is a mulmod by 2^r (UBIGINT << overflows). */
    def rotl(x: String, r: Int): String =
      s"xor(${mulmod(x, (1L << r).toString)}, ($x >> ${64 - r}))"

    /** CTE chain ending in `sample(vec_id, embedding, rnk)`: the
      * embeddings table ranked by Spark's xxhash64(vec_id) — XXH64 of
      * the 8-byte long with seed 42, replayed step-for-step — exactly
      * Similarity.sampleVectors' deterministic training order. */
    val xxhSample: String = {
      val (p1, p2, p3, p4, p5) =
        ("-7046029288634856825", "-4417276706812531889",
          "1609587929392839161", "-8796714831421723037",
          "2870177450012600261")
      // unsigned views of the XXH64 primes and the seed-42 initial hash
      def u(s: String): String = {
        val v = java.lang.Long.parseLong(s)
        java.lang.Long.toUnsignedString(v)
      }
      val h0 = java.lang.Long.toUnsignedString(
        42L + java.lang.Long.parseLong(p5) + 8L)
      s"""xh0 AS (SELECT vec_id, embedding,
             ${mulmod("CAST(vec_id AS UBIGINT)", u(p2))} AS k
           FROM embeddings),
         xh1 AS (SELECT vec_id, embedding, ${rotl("k", 31)} AS k FROM xh0),
         xh2 AS (SELECT vec_id, embedding, ${mulmod("k", u(p1))} AS k FROM xh1),
         xh3 AS (SELECT vec_id, embedding,
             xor(CAST($h0 AS UBIGINT), k) AS h FROM xh2),
         xh4 AS (SELECT vec_id, embedding, ${rotl("h", 27)} AS h FROM xh3),
         xh5 AS (SELECT vec_id, embedding,
             CAST((CAST(${mulmod("h", u(p1))} AS HUGEINT) + ${u(p4)}) % $T
               AS UBIGINT) AS h FROM xh4),
         xh6 AS (SELECT vec_id, embedding, xor(h, h >> 33) AS h FROM xh5),
         xh7 AS (SELECT vec_id, embedding, ${mulmod("h", u(p2))} AS h FROM xh6),
         xh8 AS (SELECT vec_id, embedding, xor(h, h >> 29) AS h FROM xh7),
         xh9 AS (SELECT vec_id, embedding, ${mulmod("h", u(p3))} AS h FROM xh8),
         xhA AS (SELECT vec_id, embedding, xor(h, h >> 32) AS h FROM xh9),
         sample AS (
           SELECT vec_id, embedding,
             ROW_NUMBER() OVER (ORDER BY ${toSigned("h")}, vec_id) AS rnk
           FROM xhA QUALIFY rnk <= 8192)"""
    }

    /** Sequential-order squared-L2 between a FLOAT vector and a REAL
      * centroid — the exact double fold of NearestCentroid/lloyd. */
    def d2n(v: String, c: String, n: Int): String =
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         list_transform(generate_series(1, $n), i ->
           (CAST($v[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))
           * (CAST($v[i] AS DOUBLE) - CAST($c[i] AS DOUBLE)))),
         (a, x) -> a + x)"""
    def d2(v: String, c: String): String = d2n(v, c, 64)

    /** L2-unitized sample vectors (rounded to FLOAT per component —
      * Similarity.unitize), as CTE `usample0(rnk, v)`. */
    val unitSample: String =
      """usample0 AS (
        SELECT rnk,
          list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * (CASE
            WHEN list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[])) > 0
            THEN 1.0 / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[])))
            ELSE 0.0 END) AS REAL)) AS v
        FROM sample)"""

    /** Generic Lloyd chain over `src(rnk, v)` — or `src(j, rnk, v)`
      * when `subspaced` (one independent run per subspace j). Produces
      * `<prefix>{iters}(cell[, j], c)`; semantics identical to
      * [[lloydCtes]]. */
    def lloydChain(prefix: String, src: String, subspaced: Boolean,
        dims: Int, nlist: Int, iters: Int): String = {
      val jkey = if (subspaced) "j, " else ""
      val jsel = if (subspaced) "s.j, " else ""
      val jon = if (subspaced) "p.j = s.j AND " else ""
      val jpr = if (subspaced) "p.j, " else ""
      val jcond = if (subspaced) "a.j = p.j AND " else ""
      val chain = (1 to iters).map { it =>
        s"""${prefix}a$it AS (
           SELECT ${jkey}rnk, v, cell FROM (
             SELECT ${jsel}s.rnk, s.v, p.cell,
               ROW_NUMBER() OVER (PARTITION BY ${jsel}s.rnk
                 ORDER BY ${d2n("s.v", "p.c", dims)}, p.cell) AS r
             FROM $src s JOIN $prefix${it - 1} p ON ${jon}TRUE)
           WHERE r = 1),
         ${prefix}p$it AS (
           SELECT ${jkey}cell, COUNT(*) AS cnt,
             list(v ORDER BY rnk) AS mem
           FROM ${prefix}a$it GROUP BY ${jkey}cell),
         $prefix$it AS (
           SELECT ${jpr}p.cell,
             CASE WHEN a.cnt IS NULL THEN p.c ELSE
               list_transform(generate_series(1, $dims), d ->
                 CAST(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(a.mem, m -> CAST(m[d] AS DOUBLE))),
                   (x, y) -> x + y) / a.cnt AS REAL)) END AS c
           FROM $prefix${it - 1} p
           LEFT JOIN ${prefix}p$it a ON ${jcond}a.cell = p.cell)"""
      }.mkString(",\n      ")
      s"""${prefix}0 AS (SELECT ${jkey}rnk - 1 AS cell, v AS c
           FROM $src WHERE rnk <= $nlist),
         $chain"""
    }

    /** Raw double cosine (the proven q_ann_brute formula). */
    def cosRaw(a: String, b: String): String =
      s"""(list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))
        / (sqrt(list_dot_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[])))
         * sqrt(list_dot_product(CAST($b AS DOUBLE[]),
                                 CAST($b AS DOUBLE[])))))"""

    /** CTE chain cent0..cent{iters}: Similarity.trainKMeans replayed —
      * init = first nlist sample vectors, then Lloyd iterations with
      * the driver's exact semantics (strict-< argmin ties to the lowest
      * cell; per-cell mean as an ORDERED double fold over members in
      * sample order, cast to float; empty cells keep their centroid).
      * The raw (non-unitized) variant over the nlist*256-row sample. */
    def lloydCtes(nlist: Int, iters: Int): String =
      s"""rawsrc AS (SELECT rnk, embedding AS v FROM sample
           WHERE rnk <= ${nlist * 256}),
         ${lloydChain("cent", "rawsrc", subspaced = false, 64, nlist, iters)}"""

    // ---- 32-bit wrap-around helpers (Murmur3_x86_32 replay) ----
    def mul32(x: String, k: String): String =
      s"CAST((CAST($x AS HUGEINT) * $k) % 4294967296 AS UBIGINT)"
    def rotl32(x: String, r: Int): String =
      s"xor(${mul32(x, (1L << r).toString)}, ($x >> ${32 - r}))"
    /** Murmur3_x86_32 mixK1 (C1=0xcc9e2d51, C2=0x1b873593). */
    def mixK1(k: String): String =
      mul32(rotl32(mul32(k, "3432918353"), 15), "461845907")
    /** Murmur3_x86_32 mixH1 (0xe6546b64). */
    def mixH1(h: String, k: String): String =
      s"""CAST((CAST(${rotl32(s"xor($h, $k)", 13)} AS HUGEINT) * 5
         + 3864292196) % 4294967296 AS UBIGINT)"""

    /** CTE chain ending in `sig(doc_id, sig)`: the full 32-permutation
      * MinHash signature over word 3-gram shingles (MinHashSig), with
      * the permutation coefficients inlined from TextHash.coef. */
    val minhashSig: String = {
      val aLit = graft.functions.TextHash.coef(0x5eed5eedL, 32)
        .mkString("[", ",", "]")
      val bLit = graft.functions.TextHash.coef(0xc0ffee42L, 32)
        .mkString("[", ",", "]")
      s"""$wordFnv,
      wh AS (SELECT doc_id, list_transform(fnv, x ->
          (((${toSigned("x")}) % 2147483647) + 2147483647)
            % 2147483647) AS wh FROM u),
      sh AS (SELECT doc_id,
          list_transform(generate_series(1, greatest(len(wh) - 2, 1)), g ->
            list_reduce(
              list_prepend(CAST(0 AS BIGINT), wh[g:least(g+2, len(wh))]),
              (a, x) -> (a * 8191 + x) % 2147483647)) AS sh FROM wh),
      sig AS (SELECT doc_id, list_transform(generate_series(1, 32), k ->
            list_min(list_transform(sh, s ->
              ($aLit[k] * s + $bLit[k]) % 2147483647))) AS sig
          FROM sh)"""
    }
  }

  /** Deterministic "trained" weight vector for the classifier demo:
    * 64 buckets in [-0.5, 0.5]. Every weight is an exact multiple of
    * 1/1024 (a binary fraction), so the token-weight SUM is exact —
    * no rounding in any accumulation order — and the single final
    * division is the only inexact op, performed identically by every
    * engine. (Decimal-looking weights like 0.113 are NOT exact doubles
    * and turned one row in 500 into a cross-engine last-ulp rounding
    * flip at the ROUND(,6) boundary.) */
  val classifierWeights: Seq[Double] =
    (0 until 64).map(i => ((i * 37 + 11) % 1025) / 1024.0 - 0.5)

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
      val docs = t(s, dir, "documents")
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

    // ---- similarity search ----

    // Brute-force exact cosine top-5 (oracle: DuckDB list functions).
    QueryDef("q_ann_brute", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", "qid", "qvec", 5)
    }, Some("""
      SELECT qid, vec_id, sim, rank FROM (
        SELECT q.vec_id AS qid, c.vec_id AS vec_id,
          ROUND(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                 CAST(q.embedding AS DOUBLE[]))
            / (sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                     CAST(c.embedding AS DOUBLE[])))
             * sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                     CAST(q.embedding AS DOUBLE[])))), 6)
            AS sim,
          ROW_NUMBER() OVER (PARTITION BY q.vec_id
            ORDER BY list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                      CAST(q.embedding AS DOUBLE[]))
              / (sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                       CAST(c.embedding AS DOUBLE[])))
               * sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                       CAST(q.embedding AS DOUBLE[]))))
              DESC, c.vec_id) AS rank
        FROM embeddings c, embeddings q
        WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id)
      WHERE rank <= 5""")),

    // SRP-LSH approximate top-5. Deterministic end to end, so the oracle
    // replays it: inlined SplitMix64 hyperplanes (seed = table index,
    // planes=10/tables=6 — lshTopK defaults), sign-bit buckets via
    // sequential-order dots, candidates = shared bucket in any table,
    // exact cosine re-rank (q_ann_brute's proven formula).
    QueryDef("q_ann_lsh", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.lshTopK(emb, queries,
        "vec_id", "embedding", "qid", "qvec", 5, dim = 64)
    }, Some {
      val planeRows = (0 until 6).flatMap { tbl =>
        graft.functions.SrpBucket.weights(64, 10, tbl).zipWithIndex.map {
          case (w, p) => s"($tbl, $p, [${w.mkString(",")}])"
        }
      }.mkString(",\n        ")
      val cosRaw =
        """list_dot_product(CAST(c.embedding AS DOUBLE[]),
                            CAST(q.embedding AS DOUBLE[]))
          / (sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                   CAST(c.embedding AS DOUBLE[])))
           * sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                   CAST(q.embedding AS DOUBLE[]))))"""
      s"""
      WITH planes(tbl, plane, w) AS (VALUES
        $planeRows),
      bits AS (
        SELECT e.vec_id, p.tbl, p.plane,
          CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(generate_series(1, 64),
                i -> CAST(e.embedding[i] AS DOUBLE) * p.w[i])),
              (a, x) -> a + x) > 0
            THEN CAST(1 AS BIGINT) << p.plane
            ELSE CAST(0 AS BIGINT) END AS bit
        FROM embeddings e, planes p),
      buckets AS (
        SELECT vec_id, tbl, CAST(SUM(bit) AS BIGINT) AS bucket
        FROM bits GROUP BY 1, 2),
      cand AS (
        SELECT DISTINCT qb.vec_id AS qid, cb.vec_id AS vec_id
        FROM buckets cb
        JOIN buckets qb ON cb.tbl = qb.tbl AND cb.bucket = qb.bucket
        WHERE qb.vec_id < 8 AND cb.vec_id <> qb.vec_id)
      SELECT qid, vec_id, sim, rank FROM (
        SELECT cand.qid, cand.vec_id,
          ROUND($cosRaw, 6) AS sim,
          ROW_NUMBER() OVER (PARTITION BY cand.qid
            ORDER BY $cosRaw DESC, cand.vec_id) AS rank
        FROM cand
        JOIN embeddings c ON c.vec_id = cand.vec_id
        JOIN embeddings q ON q.vec_id = cand.qid)
      WHERE rank <= 5"""
    }),

    // IVF coarse-quantizer ANN (rows-only; recall asserted in
    // SimilaritySpec against brute force).
    // IVF is now FULLY oracled, trained model included: the sample
    // order is Spark's xxhash64(vec_id) — XXH64 replayed in DuckDB —
    // so the k-means init and all 3 Lloyd iterations re-run exactly
    // (ordered double folds), then cell assignment, nprobe probing and
    // the exact-cosine re-rank.
    QueryDef("q_ann_ivf", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.ivfTopK(emb, queries,
        "vec_id", "embedding", "qid", "qvec", 5, dim = 64,
        nlist = 16, nprobe = 4, iters = 3)
    }, Some(s"""
      WITH ${DuckHash.xxhSample},
      ${DuckHash.lloydCtes(16, 3)},
      indexed AS (
        SELECT vec_id, embedding, cell FROM (
          SELECT e.vec_id, e.embedding, p.cell,
            ROW_NUMBER() OVER (PARTITION BY e.vec_id
              ORDER BY ${DuckHash.d2("e.embedding", "p.c")}, p.cell) AS r
          FROM embeddings e, cent3 p)
        WHERE r = 1),
      probes AS (
        SELECT qid, qvec, cell FROM (
          SELECT e.vec_id AS qid, e.embedding AS qvec, p.cell,
            ROW_NUMBER() OVER (PARTITION BY e.vec_id
              ORDER BY ${DuckHash.d2("e.embedding", "p.c")}, p.cell) AS r
          FROM embeddings e, cent3 p WHERE e.vec_id < 8)
        WHERE r <= 4)
      SELECT qid, vec_id, sim, rank FROM (
        SELECT p.qid, i.vec_id,
          ROUND(${DuckHash.cosRaw("i.embedding", "p.qvec")}, 6) AS sim,
          ROW_NUMBER() OVER (PARTITION BY p.qid
            ORDER BY ${DuckHash.cosRaw("i.embedding", "p.qvec")} DESC,
              i.vec_id) AS rank
        FROM indexed i JOIN probes p
          ON i.cell = p.cell AND i.vec_id <> p.qid)
      WHERE rank <= 5""")),

    // Product-quantization ANN (Jégou et al. 2011): codes are 32× smaller
    // than the vectors, scoring is m table lookups per pair (ADC), exact
    // re-rank on the survivors. Depends on the k-means codebooks →
    // rows-only check; recall vs brute force asserted in SimilaritySpec.
    // PQ is FULLY oracled, codebooks included: the xxhash64-ordered
    // sample is unitized (float-rounded, Similarity.unitize), the 16
    // subspace codebooks re-run their 5 Lloyd iterations exactly
    // (lloydChain subspaced), encode/ADC replay PqCodes/AdcTables'
    // double-normalized arithmetic, and the k*refine ADC survivors
    // re-rank by exact cosine.
    QueryDef("q_ann_pq", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.pqTopK(emb, queries,
        "vec_id", "embedding", "qid", "qvec", 5, dim = 64,
        m = 16, codebookSize = 32, refine = 8)
    }, Some {
      // PqCodes/AdcTables normalize in DOUBLE (no float rounding)
      val inv =
        """(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]),
              CAST(e.embedding AS DOUBLE[])) > 0
            THEN 1.0 / sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
              CAST(e.embedding AS DOUBLE[]))) ELSE 0.0 END)"""
      val d2enc =
        s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(generate_series(1, 4), t ->
             (CAST(e.embedding[p.j*4+t] AS DOUBLE) * $inv
               - CAST(p.c[t] AS DOUBLE))
             * (CAST(e.embedding[p.j*4+t] AS DOUBLE) * $inv
               - CAST(p.c[t] AS DOUBLE)))), (a, x) -> a + x)"""
      val adcdot =
        s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(generate_series(1, 4), t ->
             CAST(e.embedding[p.j*4+t] AS DOUBLE) * $inv
               * CAST(p.c[t] AS DOUBLE))), (a, x) -> a + x)"""
      s"""
      WITH ${DuckHash.xxhSample},
      ${DuckHash.unitSample},
      slices AS (
        SELECT rnk, j, v[j*4+1 : j*4+4] AS v
        FROM usample0, generate_series(0, 15) AS gj(j)),
      ${DuckHash.lloydChain("pc", "slices", subspaced = true, 4, 32, 5)},
      codes AS (
        SELECT vec_id, j, code FROM (
          SELECT e.vec_id, p.j, p.cell AS code,
            ROW_NUMBER() OVER (PARTITION BY e.vec_id, p.j
              ORDER BY $d2enc, p.cell) AS r
          FROM embeddings e, pc5 p)
        WHERE r = 1),
      qtab AS (
        SELECT e.vec_id AS qid, p.j, p.cell, $adcdot AS tv
        FROM embeddings e, pc5 p WHERE e.vec_id < 8),
      adc AS (
        SELECT q.qid, c.vec_id,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list(q.tv ORDER BY q.j)), (a, x) -> a + x) AS s
        FROM codes c JOIN qtab q ON q.j = c.j AND q.cell = c.code
        WHERE c.vec_id <> q.qid
        GROUP BY q.qid, c.vec_id),
      cand AS (
        SELECT qid, vec_id FROM (
          SELECT qid, vec_id,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s DESC, vec_id)
              AS r
          FROM adc)
        WHERE r <= 40)
      SELECT qid, vec_id, sim, rank FROM (
        SELECT cand.qid, cand.vec_id,
          ROUND(${DuckHash.cosRaw("c.embedding", "q.embedding")}, 6) AS sim,
          ROW_NUMBER() OVER (PARTITION BY cand.qid
            ORDER BY ${DuckHash.cosRaw("c.embedding", "q.embedding")} DESC,
              cand.vec_id) AS rank
        FROM cand
        JOIN embeddings c ON c.vec_id = cand.vec_id
        JOIN embeddings q ON q.vec_id = cand.qid)
      WHERE rank <= 5"""
    }),

    // IVF-PQ: coarse cells bound the compute, PQ codes bound the
    // memory/IO, ADC + exact re-rank — the composed billion-scale index
    // shape. Rows-only (k-means model); recall asserted in SimilaritySpec.
    // IVFADC fully oracled: unit-space coarse quantizer (3 Lloyd
    // iterations over the unitized sample), residual PQ codebooks
    // (float-subtracted residual slices, 16 subspace Lloyd runs),
    // PqCodesResidual's double-normalized encode, probes carrying
    // IP(q̂, centroid) with the float-rounded q̂ (incl. the zero-norm
    // guard) plus ADC tables of the raw query, and the exact re-rank.
    QueryDef("q_ann_ivfpq", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.ivfPqTopK(emb, queries,
        "vec_id", "embedding", "qid", "qvec", 5, dim = 64,
        nlist = 16, nprobe = 8, m = 16, codebookSize = 32, refine = 12)
    }, Some(s"""
      WITH ${DuckHash.xxhSample},
      ${DuckHash.unitSample},
      ucsrc AS (SELECT rnk, v FROM usample0 WHERE rnk <= 4096),
      ${DuckHash.lloydChain("uc", "ucsrc", subspaced = false, 64, 16, 3)},
      rsd AS (
        SELECT rnk, v, cvv FROM (
          SELECT u.rnk, u.v, p.c AS cvv,
            ROW_NUMBER() OVER (PARTITION BY u.rnk
              ORDER BY ${DuckHash.d2("u.v", "p.c")}, p.cell) AS r
          FROM usample0 u, uc3 p)
        WHERE r = 1),
      rslices AS (
        SELECT rnk, j,
          list_transform(generate_series(1, 4), t ->
            CAST(CAST(v[j*4+t] AS REAL) - CAST(cvv[j*4+t] AS REAL)
              AS REAL)) AS v
        FROM rsd, generate_series(0, 15) AS gj(j)),
      ${DuckHash.lloydChain("rc", "rslices", subspaced = true, 4, 32, 3)},
      hats AS (
        SELECT vec_id, embedding,
          list_transform(generate_series(1, 64), i ->
            CAST(embedding[i] AS DOUBLE) * (CASE
              WHEN list_dot_product(CAST(embedding AS DOUBLE[]),
                                    CAST(embedding AS DOUBLE[])) > 0
              THEN 1.0 / sqrt(list_dot_product(
                CAST(embedding AS DOUBLE[]),
                CAST(embedding AS DOUBLE[])))
              ELSE 0.0 END)) AS hat
        FROM embeddings),
      cells AS (
        SELECT vec_id, hat, cell, cvv FROM (
          SELECT h.vec_id, h.hat, p.cell, p.c AS cvv,
            ROW_NUMBER() OVER (PARTITION BY h.vec_id
              ORDER BY ${DuckHash.d2("h.hat", "p.c")}, p.cell) AS r
          FROM hats h, uc3 p)
        WHERE r = 1),
      codes AS (
        SELECT vec_id, cell, j, code FROM (
          SELECT c.vec_id, c.cell, p.j, p.cell AS code,
            ROW_NUMBER() OVER (PARTITION BY c.vec_id, p.j
              ORDER BY list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(generate_series(1, 4), t ->
                  ((c.hat[p.j*4+t] - CAST(c.cvv[p.j*4+t] AS DOUBLE))
                    - CAST(p.c[t] AS DOUBLE))
                  * ((c.hat[p.j*4+t] - CAST(c.cvv[p.j*4+t] AS DOUBLE))
                    - CAST(p.c[t] AS DOUBLE)))), (a, x) -> a + x),
                p.cell) AS r
          FROM cells c, rc3 p)
        WHERE r = 1),
      qhat AS (
        SELECT e.vec_id AS qid, e.embedding,
          list_transform(e.embedding, x -> CAST(CAST(x AS DOUBLE)
            / greatest(
              sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[]))),
              CAST(CAST(0.000000000001 AS REAL) AS DOUBLE)) AS REAL))
            AS qh
        FROM embeddings e WHERE e.vec_id < 8),
      probes AS (
        SELECT qid, cell, ipqc FROM (
          SELECT q.qid, p.cell,
            list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(generate_series(1, 64), i ->
                CAST(q.qh[i] AS DOUBLE) * CAST(p.c[i] AS DOUBLE))),
              (a, x) -> a + x) AS ipqc,
            ROW_NUMBER() OVER (PARTITION BY q.qid
              ORDER BY ${DuckHash.d2("q.qh", "p.c")}, p.cell) AS r
          FROM qhat q, uc3 p)
        WHERE r <= 8),
      qtab AS (
        SELECT h.vec_id AS qid, p.j, p.cell,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1, 4), t ->
              h.hat[p.j*4+t] * CAST(p.c[t] AS DOUBLE))),
            (a, x) -> a + x) AS tv
        FROM hats h, rc3 p WHERE h.vec_id < 8),
      adc AS (
        SELECT pr.qid, c.vec_id,
          pr.ipqc + list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list(q.tv ORDER BY q.j)), (a, x) -> a + x) AS s
        FROM codes c
        JOIN probes pr ON pr.cell = c.cell AND c.vec_id <> pr.qid
        JOIN qtab q ON q.qid = pr.qid AND q.j = c.j AND q.cell = c.code
        GROUP BY pr.qid, c.vec_id, pr.ipqc),
      cand AS (
        SELECT qid, vec_id FROM (
          SELECT qid, vec_id,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s DESC, vec_id)
              AS r
          FROM adc)
        WHERE r <= 60)
      SELECT qid, vec_id, sim, rank FROM (
        SELECT cand.qid, cand.vec_id,
          ROUND(${DuckHash.cosRaw("c.embedding", "q.embedding")}, 6) AS sim,
          ROW_NUMBER() OVER (PARTITION BY cand.qid
            ORDER BY ${DuckHash.cosRaw("c.embedding", "q.embedding")} DESC,
              cand.vec_id) AS rank
        FROM cand
        JOIN embeddings c ON c.vec_id = cand.vec_id
        JOIN embeddings q ON q.vec_id = cand.qid)
      WHERE rank <= 5""")),

    // SQ8 flat compressed index: int8 codes (4x less scan I/O), integer
    // dots, exact re-rank — the no-recall-cliff compression baseline.
    // Rows-only (quantized); recall asserted in SimilaritySpec.
    QueryDef("q_ann_sq8", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.sq8TopK(emb, queries,
        "vec_id", "embedding", "qid", "qvec", 5)
    }, Some {
      // SQ8 uses a PER-VECTOR scale (no trained model), so unlike the
      // k-means-trained variants the whole index is replayable: DuckDB
      // emulates the float32 encode path step-for-step (REAL casts;
      // Java Math.round(float) = floor(f + 0.5f)), scores with the
      // integer dot scaled in double, takes k*refine=15 ADC survivors
      // and re-ranks them by exact cosine.
      val cosRaw =
        """list_dot_product(CAST(c.embedding AS DOUBLE[]),
                            CAST(q.embedding AS DOUBLE[]))
          / (sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                   CAST(c.embedding AS DOUBLE[])))
           * sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                   CAST(q.embedding AS DOUBLE[]))))"""
      s"""
      WITH enc AS (
        SELECT vec_id,
          list_transform(embedding,
            x -> CAST(CAST(x AS DOUBLE) / sqrt(list_dot_product(
              CAST(embedding AS DOUBLE[]),
              CAST(embedding AS DOUBLE[]))) AS REAL)) AS u
        FROM embeddings),
      sc AS (
        SELECT vec_id, u,
          CAST(list_max(list_transform(u, x -> abs(x)))
            / CAST(127 AS REAL) AS REAL) AS scale
        FROM enc),
      codes AS (
        SELECT vec_id, scale,
          list_transform(u, x -> greatest(-127, least(127,
            CAST(floor(CAST(CAST(x / scale AS REAL)
              + CAST(0.5 AS REAL) AS REAL)) AS INTEGER)))) AS q
        FROM sc),
      scored AS (
        SELECT q.vec_id AS qid, c.vec_id AS vec_id,
          CAST(c.scale AS DOUBLE) * CAST(q.scale AS DOUBLE)
            * CAST(list_sum(list_transform(generate_series(1, 64),
                i -> c.q[i] * q.q[i])) AS BIGINT) AS s
        FROM codes c, codes q
        WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
      cand AS (
        SELECT qid, vec_id FROM (
          SELECT qid, vec_id,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s DESC, vec_id)
              AS r
          FROM scored)
        WHERE r <= 15)
      SELECT qid, vec_id, sim, rank FROM (
        SELECT cand.qid, cand.vec_id,
          ROUND($cosRaw, 6) AS sim,
          ROW_NUMBER() OVER (PARTITION BY cand.qid
            ORDER BY $cosRaw DESC, cand.vec_id) AS rank
        FROM cand
        JOIN embeddings c ON c.vec_id = cand.vec_id
        JOIN embeddings q ON q.vec_id = cand.qid)
      WHERE rank <= 5"""
    }),

    // Recall gate over every approximate index variant: mean recall@5
    // vs the exact brute-force baseline, computed in Spark (all variants
    // are deterministic), emitted as floor booleans the DuckDB oracle
    // asserts as a static truth table — turning five rows-only checks
    // into a hash-gated quality floor. bench=false: the gate runs brute
    // force once per variant by construction.
    QueryDef("q_ann_recall_gates", (s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select(col("qid"), col("vec_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = pairs(Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", "qid", "qvec", 5))
      def recall(df: org.apache.spark.sql.DataFrame): Double =
        (brute & pairs(df)).size.toDouble / brute.size
      // SRP-LSH is gated on the NEAR-DUP task it is built for (pair
      // recall vs the exact all-pairs baseline): top-k over near-random
      // vectors sits far below its high-similarity regime and would
      // gate nothing (see lshTopK's scaladoc).
      val exactPairs = Similarity.cosineNearDupExact(
          emb, "vec_id", "embedding", 0.4)
        .select(col("id_a"), col("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val lshPairs = Similarity.cosineNearDup(
          emb, "vec_id", "embedding", 0.4, dim = 64,
          planes = 6, tables = 16)
        .select(col("id_a"), col("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val lshPairRecall =
        (exactPairs & lshPairs).size.toDouble / math.max(exactPairs.size, 1)
      val gates = Seq(
        ("lsh_neardup", lshPairRecall, 0.50),
        ("ivf", recall(Similarity.ivfTopK(emb, queries,
          "vec_id", "embedding", "qid", "qvec", 5, dim = 64,
          nlist = 16, nprobe = 4, iters = 3)), 0.40),
        ("pq", recall(Similarity.pqTopK(emb, queries,
          "vec_id", "embedding", "qid", "qvec", 5, dim = 64,
          m = 16, codebookSize = 32, refine = 8)), 0.60),
        ("ivfpq", recall(Similarity.ivfPqTopK(emb, queries,
          "vec_id", "embedding", "qid", "qvec", 5, dim = 64,
          nlist = 16, nprobe = 8, m = 16, codebookSize = 32,
          refine = 12)), 0.50),
        ("sq8", recall(Similarity.sq8TopK(emb, queries,
          "vec_id", "embedding", "qid", "qvec", 5, refine = 6)), 0.80))
      gates.map { case (v, r, floor) => (v, r >= floor) }
        .toDF("variant", "recall_ok")
    }, Some("""
      SELECT * FROM (VALUES
        ('lsh_neardup', true), ('ivf', true), ('pq', true),
        ('ivfpq', true), ('sq8', true)) AS t(variant, recall_ok)"""),
      bench = false),

    // Embedding-cosine near-duplicate pairs, exact baseline (oracle via
    // DuckDB list functions; threshold applied to the rounded sim so
    // both engines cut at identical values).
    QueryDef("q_embed_neardup", (s, dir) => {
      Similarity.cosineNearDupExact(
        t(s, dir, "embeddings"), "vec_id", "embedding", 0.4)
    }, Some("""
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[]))
          / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                   CAST(a.embedding AS DOUBLE[])))
           * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])))), 6)
          AS sim
      FROM embeddings a, embeddings b
      WHERE a.vec_id < b.vec_id
        AND ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[]))
          / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                   CAST(a.embedding AS DOUBLE[])))
           * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])))), 6)
          >= 0.4""")),

    // The LSH-bucketed near-dup scale path. Fully oracled: the SRP
    // hyperplanes are deterministic (SrpBucket.weights — SplitMix64), so
    // the oracle inlines the exact plane weights and replays bucketing
    // (sequential-order dot products via list_reduce, matching the
    // expression's accumulation), the 2..maxBucket gate, the per-bucket
    // self-join and the cosine verify.
    QueryDef("q_embed_neardup_lsh", (s, dir) => {
      // planes=6/tables=16: the 0.4 threshold sits well below SRP-LSH's
      // high-similarity sweet spot, so collision probability needs short
      // codes and many tables ((1-acos(0.4)/pi)^6 ~ 7% per table, ~2/3
      // over 16) — the standard recall-vs-compute dial of banded LSH
      Similarity.cosineNearDup(
        t(s, dir, "embeddings"), "vec_id", "embedding", 0.4, dim = 64,
        planes = 6, tables = 16)
    }, Some {
      val planeRows = (0 until 16).flatMap { tbl =>
        graft.functions.SrpBucket.weights(64, 6, tbl).zipWithIndex.map {
          case (w, p) => s"($tbl, $p, [${w.mkString(",")}])"
        }
      }.mkString(",\n        ")
      s"""
      WITH planes(tbl, plane, w) AS (VALUES
        $planeRows),
      bits AS (
        SELECT e.vec_id, p.tbl, p.plane,
          CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(generate_series(1, 64),
                i -> CAST(e.embedding[i] AS DOUBLE) * p.w[i])),
              (a, x) -> a + x) > 0
            THEN CAST(1 AS BIGINT) << p.plane
            ELSE CAST(0 AS BIGINT) END AS bit
        FROM embeddings e, planes p),
      buckets AS (
        SELECT vec_id, tbl, CAST(SUM(bit) AS BIGINT) AS bucket
        FROM bits GROUP BY 1, 2),
      sizes AS (SELECT tbl, bucket, COUNT(*) AS n FROM buckets GROUP BY 1, 2),
      capped AS (SELECT buckets.* FROM buckets JOIN sizes USING (tbl, bucket)
                 WHERE sizes.n BETWEEN 2 AND 2000),
      cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM capped a JOIN capped b
          ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
      SELECT * FROM (
        SELECT c.id_a, c.id_b,
          ROUND(list_dot_product(CAST(ea.embedding AS DOUBLE[]),
                                 CAST(eb.embedding AS DOUBLE[]))
            / (sqrt(list_dot_product(CAST(ea.embedding AS DOUBLE[]),
                                     CAST(ea.embedding AS DOUBLE[])))
             * sqrt(list_dot_product(CAST(eb.embedding AS DOUBLE[]),
                                     CAST(eb.embedding AS DOUBLE[])))), 6)
            AS sim
        FROM cand c
        JOIN embeddings ea ON ea.vec_id = c.id_a
        JOIN embeddings eb ON eb.vec_id = c.id_b)
      WHERE sim >= 0.4"""
    }),

    // SemDeDup (Abbas et al. 2023): cluster-scoped semantic dedup — the
    // published scale path where pairwise cosine is confined to k-means
    // cells. Depends on the trained quantizer → rows-only check; the
    // survivor-per-component and nlist=1-equals-global-graph properties
    // are asserted in SemDedupSpec.
    // SemDedup is FULLY oracled too: the same replayed quantizer
    // (xxhash64 sample order + Lloyd), then cell-scoped near-dup pairs,
    // connected components as a recursive CTE (the q_dedup_groups
    // technique) and the keep-least-prototypical survivor rule.
    QueryDef("q_semdedup", (s, dir) => {
      Similarity.semDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
        eps = 0.4, dim = 64, nlist = 16, iters = 3)
    }, Some(s"""
      WITH RECURSIVE ${DuckHash.xxhSample},
      ${DuckHash.lloydCtes(16, 3)},
      cells AS (
        SELECT vec_id, embedding, cell,
          ${DuckHash.cosRaw("embedding", "c")} AS csim FROM (
          SELECT e.vec_id, e.embedding, p.cell, p.c,
            ROW_NUMBER() OVER (PARTITION BY e.vec_id
              ORDER BY ${DuckHash.d2("e.embedding", "p.c")}, p.cell) AS r
          FROM embeddings e, cent3 p)
        WHERE r = 1),
      capped AS (
        SELECT * FROM (
          SELECT cells.*, COUNT(*) OVER (PARTITION BY cell) AS n
          FROM cells)
        WHERE n <= 5000),
      pairs AS (
        SELECT a.vec_id AS src, b.vec_id AS dst
        FROM capped a JOIN capped b
          ON a.cell = b.cell AND a.vec_id <> b.vec_id
        WHERE ROUND(${DuckHash.cosRaw("a.embedding", "b.embedding")}, 6)
          >= 0.4),
      reach(id, lbl) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT p.dst, r.lbl FROM reach r JOIN pairs p ON p.src = r.id),
      comps AS (SELECT id AS vec_id, MIN(lbl) AS comp FROM reach GROUP BY id)
      SELECT vec_id, cell, group_id FROM (
        SELECT c.vec_id, c.cell, k.comp AS group_id,
          ROW_NUMBER() OVER (PARTITION BY k.comp
            ORDER BY c.csim, c.vec_id) AS rn
        FROM cells c JOIN comps k ON k.vec_id = c.vec_id)
      WHERE rn = 1""")),

    // SemDedup gate oracle (q_ann_recall_gates style): the raw output is
    // cluster-dependent (rows-only above), but its defining invariants
    // are exact and driver-checkable — one survivor per near-dup
    // component, no two surviving near-dups in a cell, the corpus
    // actually shrinks, and (recall side) tight planted pairs collapse.
    QueryDef("q_semdedup_gate", (s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val eps = 0.4
      val out = Similarity.semDedup(emb, "vec_id", "embedding",
          eps = eps, dim = 64, nlist = 16, iters = 3).collect()
      val survivors = out.map(_.getLong(0)).toSet
      val oneSurvivorPerGroup =
        out.map(_.getLong(2)).distinct.length == out.length
      // distinct components in one cell are non-adjacent by definition,
      // so survivors sharing a cell must sit below eps (mirror the
      // operator's round-to-6 comparison)
      val vecs = emb.select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var (dot, na, nb) = (0.0, 0.0, 0.0)
        var i = 0
        while (i < a.length) {
          dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
          nb += b(i).toDouble * b(i); i += 1
        }
        BigDecimal(dot / math.sqrt(na * nb))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val byCell = out.groupBy(_.get(1)).values
      val noNearDupSurvivorsInCell = byCell.forall { cell =>
        cell.combinations(2).forall { case Array(x, y) =>
          cos(vecs(x.getLong(0)), vecs(y.getLong(0))) < eps
        }
      }
      val dedupReduces = out.length < vecs.size
      // recall side: recompute the (deterministic) cell assignment with
      // the operator's own quantizer, then every exact near-dup pair
      // that lands in one cell must have collapsed to at most one
      // survivor — the paper's within-cluster dedup contract
      val cs = Similarity.trainKMeans(emb, "vec_id", "embedding",
        dim = 64, nlist = 16, iters = 3)
      val cellOf = emb.select(col("vec_id"),
          Similarity.nearestCentroid(col("embedding"), cs).as("cell"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val sameCellPairs = Similarity.cosineNearDupExact(
          emb, "vec_id", "embedding", eps)
        .select(col("id_a"), col("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .filter { case (a, b) => cellOf(a) == cellOf(b) }
      val sameCellCollapsed = sameCellPairs.nonEmpty &&
        sameCellPairs.forall { case (a, b) =>
          !(survivors(a) && survivors(b))
        }
      Seq(("one_survivor_per_group", oneSurvivorPerGroup),
        ("no_neardup_survivors_within_cell", noNearDupSurvivorsInCell),
        ("dedup_reduces_corpus", dedupReduces),
        ("same_cell_pairs_collapsed", sameCellCollapsed))
        .toDF("variant", "ok")
    }, Some("""
      SELECT * FROM (VALUES
        ('one_survivor_per_group', true),
        ('no_neardup_survivors_within_cell', true),
        ('dedup_reduces_corpus', true),
        ('same_cell_pairs_collapsed', true)) AS t(variant, ok)"""),
      bench = false),

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

    // END-TO-END embedding curation: exact near-dup pairs -> connected
    // components -> keep the min-id representative per group -> ANN
    // top-3 over the deduplicated corpus. The DuckDB oracle replays the
    // DAG (recursive-CTE components + list-function cosine ranking), so
    // one green row certifies the composition of Similarity +
    // ConnectedComponents + bruteForceTopK. bench=false: inherits the
    // CC driver-synced rounds and the O(N^2) exact pair baseline (both
    // individually benched/owned elsewhere).
    QueryDef("q_embed_pipeline", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val pairs = Similarity.cosineNearDupExact(emb, "vec_id", "embedding",
        0.4)
      val groups = graft.operators.ConnectedComponents
        .withSingletons(emb, "vec_id", pairs, "id_a", "id_b")
      val reps = groups.groupBy(col("comp")).agg(min(col("id")).as("vec_id"))
      val corpus = emb.join(reps.select(col("vec_id")), Seq("vec_id"))
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.bruteForceTopK(corpus, queries,
        "vec_id", "embedding", "qid", "qvec", 3)
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
      ),
      comp AS (SELECT id, MIN(lbl) AS comp FROM reach GROUP BY id),
      reps AS (SELECT MIN(id) AS vec_id FROM comp GROUP BY comp),
      corpus AS (
        SELECT e.* FROM embeddings e JOIN reps r ON e.vec_id = r.vec_id)
      SELECT qid, vec_id, sim, rank FROM (
        SELECT q.vec_id AS qid, c.vec_id AS vec_id,
          ROUND(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                 CAST(q.embedding AS DOUBLE[]))
            / (sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                     CAST(c.embedding AS DOUBLE[])))
             * sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                     CAST(q.embedding AS DOUBLE[])))), 6)
            AS sim,
          ROW_NUMBER() OVER (PARTITION BY q.vec_id
            ORDER BY list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                      CAST(q.embedding AS DOUBLE[]))
              / (sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                       CAST(c.embedding AS DOUBLE[])))
               * sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                       CAST(q.embedding AS DOUBLE[]))))
              DESC, c.vec_id) AS rank
        FROM corpus c, embeddings q
        WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id)
      WHERE rank <= 3"""),
      bench = false),

    // ---- text analysis ----

    QueryDef("q_text_stats", (s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextAnalysis.bpeishTokenCount(col("text")).cast("long")
            .as("n_bpeish"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
    }, Some("""
      SELECT doc_id,
        LENGTH(text) AS n_chars,
        LEN(regexp_extract_all(text, '\S+')) AS n_tokens,
        LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
          AS n_bpeish,
        ROUND((
          (CASE WHEN LEN(regexp_extract_all(text, '\S+')) BETWEEN 10 AND 100000
            THEN 1.0 ELSE 0.0 END) +
          (CASE WHEN (LENGTH(text) - LEN(regexp_extract_all(text, '\S+')) + 1.0)
                  / LEN(regexp_extract_all(text, '\S+')) BETWEEN 2.5 AND 12.0
            THEN 1.0 ELSE 0.0 END) +
          (CASE WHEN CAST(LEN(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
                  AS DOUBLE) / LENGTH(text) <= 0.2
            THEN 1.0 ELSE 0.0 END)) / 3.0, 4) AS quality
      FROM documents""")),

    // Canonical text cleanup: NFC + control strip + whitespace collapse.
    // The test corpus is ASCII, so the oracle certifies the control/
    // whitespace pipeline; NFC behavior on combining marks is proven in
    // TextAnalysisSpec. DuckDB replays the identical normalization order.
    QueryDef("q_clean_text", (s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.cleanText(concat(lit("  "), col("text"),
            lit("\tx\u0007y  "))).as("cleaned"))
        .select(col("doc_id"), length(col("cleaned")).cast("long").as("n"),
          when(length(col("cleaned")) >= 8,
            substring(col("cleaned"), -8, 8))
            .otherwise(col("cleaned")).as("tail8"))
    }, Some("""
      WITH c AS (
        SELECT doc_id,
          trim(regexp_replace(regexp_replace(
            nfc_normalize('  ' || text || chr(9) || 'x' || chr(7) || 'y  '),
            '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
            '\s+', ' ', 'g')) AS cleaned
        FROM documents)
      SELECT doc_id, LENGTH(cleaned) AS n,
        CASE WHEN LENGTH(cleaned) >= 8
          THEN substr(cleaned, LENGTH(cleaned) - 7, 8) ELSE cleaned END
          AS tail8
      FROM c""")),

    // Overlapping word-window chunking (32-word chunks, stride 24) — the
    // model-sized document slicer. Fully SQL-expressible: the oracle
    // replays split/slice with DuckDB list functions.
    QueryDef("q_chunk", (s, dir) => {
      TextAnalysis.chunkWords(t(s, dir, "documents"), "doc_id", "text",
        chunkSize = 32, stride = 24)
    }, Some("""
      WITH w AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS w
        FROM documents)
      SELECT doc_id,
        CAST(s / 24 AS INT) AS chunk_idx,
        array_to_string(w[s + 1:s + 32], ' ') AS chunk_text,
        CAST(len(w[s + 1:s + 32]) AS BIGINT) AS n_tokens
      FROM w, LATERAL unnest(range(0, greatest(len(w), 1), 24)) AS t(s)
      WHERE len(w) > 0""")),

    // RAG-style retrieval pipeline, end-to-end and fully oracled: clean
    // text -> overlapping chunks -> BM25-rank the CHUNKS against a term
    // query -> top-k. Composes three already-oracled operators into the
    // retrieval DAG a RAG corpus build runs; DuckDB replays every stage
    // (chunk ids are doc_id*1000 + chunk_idx — chunk counts are bounded
    // by doc length / stride, far under 1000).
    // Scale shape: the chunker is one scan pass, BM25 adds one stats
    // aggregate + broadcast + TakeOrderedAndProject — no explode-by-term,
    // no per-term shuffle, independent of query length.
    QueryDef("q_rag_e2e", (s, dir) => {
      val cleaned = t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.cleanText(col("text")).as("text"))
      val chunks = TextAnalysis
        .chunkWords(cleaned, "doc_id", "text", chunkSize = 32, stride = 24)
        .select((col("doc_id") * 1000 + col("chunk_idx")).as("chunk_id"),
          col("chunk_text"))
      graft.operators.Relevance.bm25TopK(chunks, "chunk_id", "chunk_text",
        Seq("spark", "hash", "window", "stream"), 50)
    }, Some("""
      WITH cleaned AS (
        SELECT doc_id,
          trim(regexp_replace(regexp_replace(nfc_normalize(text),
            '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
            '\s+', ' ', 'g')) AS text
        FROM documents),
      wsplit AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM cleaned),
      chunks AS (
        SELECT doc_id * 1000 + CAST(s / 24 AS INT) AS chunk_id,
          array_to_string(w[s + 1:s + 32], ' ') AS chunk_text
        FROM wsplit, LATERAL unnest(range(0, greatest(len(w), 1), 24))
          AS t(s)
        WHERE len(w) > 0),
      w AS (
        SELECT chunk_id,
          regexp_extract_all(lower(chunk_text), '\S+') AS ws
        FROM chunks),
      tf AS (
        SELECT chunk_id, CAST(len(ws) AS DOUBLE) AS dl,
          CAST(len(list_filter(ws, x -> x = 'spark')) AS DOUBLE) AS tf0,
          CAST(len(list_filter(ws, x -> x = 'hash')) AS DOUBLE) AS tf1,
          CAST(len(list_filter(ws, x -> x = 'window')) AS DOUBLE) AS tf2,
          CAST(len(list_filter(ws, x -> x = 'stream')) AS DOUBLE) AS tf3
        FROM w),
      st AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(dl) AS sum_dl,
          CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
          CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
          CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2,
          CAST(SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df3
        FROM tf)
      SELECT chunk_id, dl, score FROM (
        SELECT t.chunk_id, t.dl,
          floor(ln((s.n - s.df0 + 0.5) / (s.df0 + 0.5) + 1.0) * 1024) / 1024.0
            * (t.tf0 * (1.2 + 1.0) / (t.tf0 + 1.2 *
                (1.0 - 0.75 + 0.75 * (t.dl / (s.sum_dl / s.n)))))
          + floor(ln((s.n - s.df1 + 0.5) / (s.df1 + 0.5) + 1.0) * 1024) / 1024.0
            * (t.tf1 * (1.2 + 1.0) / (t.tf1 + 1.2 *
                (1.0 - 0.75 + 0.75 * (t.dl / (s.sum_dl / s.n)))))
          + floor(ln((s.n - s.df2 + 0.5) / (s.df2 + 0.5) + 1.0) * 1024) / 1024.0
            * (t.tf2 * (1.2 + 1.0) / (t.tf2 + 1.2 *
                (1.0 - 0.75 + 0.75 * (t.dl / (s.sum_dl / s.n)))))
          + floor(ln((s.n - s.df3 + 0.5) / (s.df3 + 0.5) + 1.0) * 1024) / 1024.0
            * (t.tf3 * (1.2 + 1.0) / (t.tf3 + 1.2 *
                (1.0 - 0.75 + 0.75 * (t.dl / (s.sum_dl / s.n)))))
          AS score
        FROM tf t, st s)
      WHERE score > 0.0
      ORDER BY score DESC, chunk_id LIMIT 50""")),

    // Language ID (heuristic, engine-specific → rows-only; accuracy is
    // asserted in ScalaTest on real multilingual samples).
    // Language-ID heuristic (stopword-profile arg-max) — the scoring is
    // plain set arithmetic, so DuckDB can replicate it exactly: the
    // oracle recomputes the arg-max with the same tie-break (score desc,
    // then language code desc, matching Spark's greatest-over-structs).
    QueryDef("q_lang_id", (s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang").as("labeled"),
          TextAnalysis.langId(col("text")).as("predicted"))
        .groupBy(col("labeled"), col("predicted"))
        .agg(count(lit(1)).as("n"))
    }, Some("""
      WITH words AS (
        SELECT doc_id, lang AS labeled,
          regexp_split_to_array(lower(text), '\s+') AS w
        FROM documents),
      scored AS (
        SELECT doc_id, labeled, s.lang,
          CAST(len(list_intersect(w, s.stops)) AS DOUBLE)
            / greatest(len(w), 1) AS score
        FROM words, (VALUES
          ('en', ['the','and','of','to','in','is','that','it','was','for','on','with','as','at','by']),
          ('de', ['der','die','das','und','ist','von','mit','den','nicht','ein','eine','zu','im','für','auf']),
          ('es', ['el','la','de','que','y','en','los','del','se','las','por','un','una','con','para']),
          ('fr', ['le','la','les','de','des','et','est','en','un','une','du','que','pour','dans','qui']),
          ('zh', ['的','是','在','了','和','有','我','不','这','他','也','就','人','都','说'])
        ) AS s(lang, stops)),
      best AS (
        SELECT doc_id, labeled, lang, score,
          ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY score DESC, lang DESC) AS rn
        FROM scored)
      SELECT labeled,
        CASE WHEN score > 0 THEN lang ELSE 'und' END AS predicted,
        COUNT(*) AS n
      FROM best WHERE rn = 1
      GROUP BY 1, 2""")),

    // Winnowing fingerprints (Schleimer et al., k=5 w=4). The oracle
    // replays the char-5-gram hashes and takes each length-4 window's
    // SIGNED minimum (the deque compares Java longs), then the distinct
    // sorted set; fp_hash md5-digests the full set per doc.
    QueryDef("q_fingerprint", (s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.winnowingFingerprint(col("text")).as("fp"))
        .select(col("doc_id"), size(col("fp")).as("n_fp"),
          md5(concat_ws(",",
            transform(col("fp"), x => x.cast("string")))).as("fp_hash"))
    }, Some(s"""
      WITH cs AS (SELECT doc_id, length(text) AS L,
          list_transform(generate_series(1, length(text)),
            i -> CAST(unicode(text[i]) AS UBIGINT)) AS codes
        FROM documents),
      g0 AS (SELECT doc_id,
          CASE WHEN L >= 5 THEN
            list_transform(generate_series(1, L - 4), i ->
              ${DuckHash.fnv("codes[i:i+4]")})
          ELSE [${DuckHash.fnv("codes")}] END AS z FROM cs),
      ${DuckHash.mixStages("g0")},
      gh AS (SELECT doc_id,
          list_transform(z, x -> ${DuckHash.toSigned("xor(x, x >> 31)")})
            AS gs FROM m3),
      sel AS (SELECT doc_id, list_sort(list_distinct(
            CASE WHEN len(gs) >= 4 THEN
              list_transform(generate_series(4, len(gs)), i ->
                list_min(gs[i-3:i]))
            ELSE [list_min(gs)] END)) AS fp
        FROM gh)
      SELECT doc_id, CAST(len(fp) AS INTEGER) AS n_fp,
        md5(array_to_string(fp, ',')) AS fp_hash
      FROM sel""")),

    // ---- multimodal plumbing ----

    // Binary payload + metadata + batched decode stub. The stub decoder
    // is deterministic (FakeCodec: float32 accumulation of payload
    // bytes), so even the feature value is oracled — DuckDB replays the
    // same IEEE single-precision adds in the same order via REAL casts;
    // the corpus is ASCII so payload bytes == code points == length.
    QueryDef("q_multimodal", (s, dir) => {
      val media = Multimodal.withFakeMedia(t(s, dir, "documents"))
      Multimodal.decodeFeatures(s, media)
        .toDF()
        .select(col("doc_id"), col("mediaType").as("media_type"),
          col("nBytes").as("n_bytes"),
          round(element_at(col("features"), 1).cast("double"), 4).as("f0"))
    }, Some("""
      WITH cs AS (
        SELECT doc_id, text,
          list_transform(generate_series(1, length(text)),
            i -> unicode(text[i])) AS codes
        FROM documents)
      SELECT doc_id,
        CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
          ELSE 'video' END AS media_type,
        CAST(length(text) AS BIGINT) AS n_bytes,
        ROUND(CAST(list_reduce(
          list_prepend(CAST(0 AS REAL),
            list_transform(list_filter(generate_series(1, len(codes)),
                i -> (i - 1) % 8 = 0),
              i -> CAST(codes[i] AS REAL) / CAST(255 AS REAL))),
          (a, x) -> CAST(a + x AS REAL)) AS DOUBLE), 4) AS f0
      FROM cs""")),

    QueryDef("q_multimodal_meta", (s, dir) => {
      Multimodal.withFakeMedia(t(s, dir, "documents"))
        .select(col("doc_id"),
          col("meta.mediaType").as("media_type"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.nBytes").as("n_bytes"))
    }, Some("""
      SELECT doc_id,
        ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
        CAST(doc_id % 4 AS INT) * 160 + 320 AS width,
        CAST(doc_id % 4 AS INT) * 90 + 180 AS height,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents""")),

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
      SELECT df, COUNT(*) AS n_spans FROM d WHERE df >= 2 GROUP BY df""")),

    // Per-domain cap: URL host extraction (parse_url) + keep-first-K per
    // domain — row-level output so the oracle checks the exact kept set.
    QueryDef("q_domain_cap", (s, dir) => {
      val docs = t(s, dir, "documents").withColumn("__url",
        concat(lit("https://w"), col("doc_id") % 2, lit("."), col("source"),
          lit(".example.com/p/"), col("doc_id")))
      val dom = docs.withColumn("domain",
        parse_url(col("__url"), lit("HOST")))
      DataSplit.capPerKey(dom, "domain", "doc_id", 8)
        .select(col("doc_id"), col("domain"))
    }, Some("""
      SELECT doc_id, domain FROM (
        SELECT doc_id, domain,
          ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
        FROM (SELECT doc_id,
                'w' || (doc_id % 2)::VARCHAR || '.' || source ||
                  '.example.com' AS domain
              FROM documents))
      WHERE rn <= 8""")),

    // Z-order (Morton) layout key: the write-side clustering value that
    // makes parquet min/max stats prune multi-dimensional filters
    // (operators.Layout). Row-level oracle: DuckDB recomputes the
    // bit interleave arithmetically, proving the codegen'd expression
    // bit-exact.
    QueryDef("q_zorder", (s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"),
          graft.operators.Layout.zorder(16,
            col("l_orderkey"), col("l_partkey")).as("z"))
    }, Some("""
      SELECT l_orderkey, l_partkey,
        CAST(list_sum(list_transform(generate_series(0, 15),
          i -> ((((l_orderkey & 65535) >> i) & 1) << (2*i))
             + ((((l_partkey  & 65535) >> i) & 1) << (2*i + 1))))
          AS BIGINT) AS z
      FROM lineitem""")),

    // PII scrubbing: deterministic synthetic PII appended per doc, then
    // redacted; the oracle replays the same regexes (RE2-safe) and the
    // md5 of the full redacted text proves byte-identical output.
    QueryDef("q_pii_redact", (s, dir) => {
      val withPii = t(s, dir, "documents").withColumn("__aug",
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com at 10.0."), col("doc_id") % 256,
          lit(".7 or +1555"), (col("doc_id") % 10000) + 10000))
      withPii.select(col("doc_id"),
        md5(TextAnalysis.redactPii(col("__aug"))).as("redacted_md5"),
        (length(col("__aug")) - length(TextAnalysis.redactPii(col("__aug"))))
          .cast("long").as("chars_removed"))
    }, Some("""
      WITH aug AS (
        SELECT doc_id,
          text || ' contact user' || doc_id::VARCHAR ||
            '@example.com at 10.0.' || (doc_id % 256)::VARCHAR ||
            '.7 or +1555' || ((doc_id % 10000) + 10000)::VARCHAR AS a
        FROM documents),
      red AS (
        SELECT doc_id, a,
          regexp_replace(regexp_replace(regexp_replace(a,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
            '\+\d{7,15}\b', '<PHONE>', 'g') AS r
        FROM aug)
      SELECT doc_id, md5(r) AS redacted_md5,
        length(a) - length(r) AS chars_removed
      FROM red""")),

    // Hashing-trick linear classifier scoring (fastText-style quality
    // model evaluation): deterministic weight vector, portable md5
    // feature hash — the oracle rescoring in DuckDB proves the whole
    // feature-hash + weight-lookup + mean pipeline engine-exact.
    QueryDef("q_quality_classifier", (s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          round(TextAnalysis.hashingTrickScore(col("text"),
            PipelineQueries.classifierWeights), 6).as("score"))
    }, Some(s"""
      SELECT doc_id,
        ROUND(list_sum(list_transform(regexp_extract_all(text, '\\S+'),
            t -> ([${PipelineQueries.classifierWeights.mkString(",")}])
              [CAST(('0x' || substr(md5(t || 'feat'), 1, 8))::BIGINT
                 % ${PipelineQueries.classifierWeights.size} AS INT) + 1]))
          / len(regexp_extract_all(text, '\\S+')), 6) AS score
      FROM documents""")),

    // DSIR importance resampling (Xie et al. 2023, public): select the
    // documents whose unigram distribution is closest to a target domain
    // (here: the lang='en' slice) by log-likelihood-ratio score, sampled
    // without replacement via deterministic hash-Gumbel top-k. Every ln
    // is floor-quantized to k/1024 so the score SUM is exact and
    // order-free; the DuckDB oracle replays the full DAG (vocab cap, raw
    // counts, weights, scoring, Gumbel key, top-k) and checks the exact
    // kept set and scores.
    QueryDef("q_importance_resample", (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Relevance.importanceResample(
        docs, "doc_id", "text", docs.filter(col("lang") === "en"), "text",
        keepN = 200, dim = 1024)
    }, Some("""
      WITH tb AS (
        SELECT ('0x' || substr(md5(word || 'dsir_feat'), 1, 8))::BIGINT
                 % 1024 AS b,
               COUNT(*) AS tcnt
        FROM (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS word
              FROM documents WHERE lang = 'en')
        GROUP BY 1),
      cw AS (
        SELECT doc_id,
          ('0x' || substr(md5(word || 'dsir_feat'), 1, 8))::BIGINT
            % 1024 AS b
        FROM (SELECT doc_id,
                unnest(regexp_extract_all(lower(text), '\S+')) AS word
              FROM documents)),
      raw AS (SELECT b, COUNT(*) AS rcnt FROM cw GROUP BY b),
      base AS (
        SELECT COALESCE(r.b, t.b) AS b, COALESCE(t.tcnt, 0) AS tcnt,
               COALESCE(r.rcnt, 0) AS rcnt
        FROM raw r FULL OUTER JOIN tb t ON r.b = t.b),
      tot AS (SELECT SUM(tcnt) AS t, SUM(rcnt) AS r FROM base),
      wts AS (
        SELECT b,
          floor((ln(CAST(tcnt + 1 AS DOUBLE) / CAST(t + 1024 AS DOUBLE))
               - ln(CAST(rcnt + 1 AS DOUBLE) / CAST(r + 1024 AS DOUBLE)))
            * 1024) / 1024.0 AS weight
        FROM base, tot),
      sc AS (
        SELECT c.doc_id, SUM(w.weight) AS score
        FROM cw c JOIN wts w ON c.b = w.b GROUP BY c.doc_id)
      SELECT doc_id, score, sel_key FROM (
        SELECT d.doc_id, COALESCE(s.score, 0.0) AS score,
          COALESCE(s.score, 0.0) + floor(-ln(-ln(
            (CAST(('0x' || substr(md5(d.doc_id::VARCHAR || 'dsir'), 1, 8))
               ::BIGINT % 1048576 AS DOUBLE) + 0.5) / 1048576.0)) * 1024)
            / 1024.0 AS sel_key
        FROM documents d LEFT JOIN sc s ON d.doc_id = s.doc_id)
      ORDER BY sel_key DESC, doc_id LIMIT 200""")),

    // CCNet-style LM quality score (Wenzek et al. 2020, public): mean
    // log-prob of each document under an add-one-smoothed word-bigram
    // model trained on the lang='en' slice — the "perplexity filter"
    // stage of corpus curation. Quantized logp (k/1024) makes the SUM
    // exact; the DuckDB oracle retrains the identical model and rescores
    // every document.
    QueryDef("q_lm_score", (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Relevance.lmScore(
        docs, "doc_id", "text", docs.filter(col("lang") === "en"), "text")
    }, Some("""
      WITH tw AS (
        SELECT regexp_extract_all(lower(text), '\S+') AS ws
        FROM documents WHERE lang = 'en'),
      tbi AS (
        SELECT
          unnest(list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
            i -> ws[i])) AS w1,
          unnest(list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
            i -> ws[i+1])) AS w2
        FROM tw),
      big AS (SELECT w1, w2, COUNT(*) AS c12 FROM tbi GROUP BY 1, 2),
      ctx AS (SELECT w1, COUNT(*) AS c1 FROM tbi GROUP BY 1),
      voc AS (
        SELECT COUNT(DISTINCT word) AS v
        FROM (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS word
              FROM documents WHERE lang = 'en')),
      dw AS (
        SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws
        FROM documents),
      dbi AS (
        SELECT doc_id,
          unnest(list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
            i -> ws[i])) AS w1,
          unnest(list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
            i -> ws[i+1])) AS w2
        FROM dw),
      sc AS (
        SELECT d.doc_id,
          SUM(floor(ln(CAST(COALESCE(b.c12, 0) + 1 AS DOUBLE)
            / CAST(COALESCE(c.c1, 0) + v.v AS DOUBLE)) * 1024) / 1024.0)
            AS sum_lp,
          COUNT(*) AS n_bi
        FROM dbi d
        CROSS JOIN voc v
        LEFT JOIN big b ON d.w1 = b.w1 AND d.w2 = b.w2
        LEFT JOIN ctx c ON d.w1 = c.w1
        GROUP BY d.doc_id)
      SELECT d.doc_id, COALESCE(s.n_bi, 0) AS n_bigrams,
        COALESCE(s.sum_lp / s.n_bi, 0.0) AS lm_score
      FROM documents d LEFT JOIN sc s ON d.doc_id = s.doc_id""")),

    // BM25 relevance ranking (Robertson & Spärck Jones, public): top-50
    // documents for a literal term set. Zero explode, zero per-term
    // shuffle — tf is a pure projection, corpus stats come from one agg
    // pass broadcast back, top-k is TakeOrderedAndProject. The oracle
    // recomputes the identical expression tree (same literals, same
    // parenthesization, idf floor-quantized) in DuckDB.
    QueryDef("q_bm25", (s, dir) => {
      graft.operators.Relevance.bm25TopK(t(s, dir, "documents"),
        "doc_id", "text", Seq("spark", "hash", "window", "stream"), 50)
    }, Some("""
      WITH w AS (
        SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws
        FROM documents),
      tf AS (
        SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl,
          CAST(len(list_filter(ws, x -> x = 'spark')) AS DOUBLE) AS tf0,
          CAST(len(list_filter(ws, x -> x = 'hash')) AS DOUBLE) AS tf1,
          CAST(len(list_filter(ws, x -> x = 'window')) AS DOUBLE) AS tf2,
          CAST(len(list_filter(ws, x -> x = 'stream')) AS DOUBLE) AS tf3
        FROM w),
      st AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(dl) AS sum_dl,
          CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
          CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
          CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2,
          CAST(SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df3
        FROM tf)
      SELECT doc_id, dl, score FROM (
        SELECT t.doc_id, t.dl,
          floor(ln((s.n - s.df0 + 0.5) / (s.df0 + 0.5) + 1.0) * 1024) / 1024.0
            * (t.tf0 * (1.2 + 1.0) / (t.tf0 + 1.2 *
                (1.0 - 0.75 + 0.75 * (t.dl / (s.sum_dl / s.n)))))
          + floor(ln((s.n - s.df1 + 0.5) / (s.df1 + 0.5) + 1.0) * 1024) / 1024.0
            * (t.tf1 * (1.2 + 1.0) / (t.tf1 + 1.2 *
                (1.0 - 0.75 + 0.75 * (t.dl / (s.sum_dl / s.n)))))
          + floor(ln((s.n - s.df2 + 0.5) / (s.df2 + 0.5) + 1.0) * 1024) / 1024.0
            * (t.tf2 * (1.2 + 1.0) / (t.tf2 + 1.2 *
                (1.0 - 0.75 + 0.75 * (t.dl / (s.sum_dl / s.n)))))
          + floor(ln((s.n - s.df3 + 0.5) / (s.df3 + 0.5) + 1.0) * 1024) / 1024.0
            * (t.tf3 * (1.2 + 1.0) / (t.tf3 + 1.2 *
                (1.0 - 0.75 + 0.75 * (t.dl / (s.sum_dl / s.n)))))
          AS score
        FROM tf t, st s)
      WHERE score > 0.0
      ORDER BY score DESC, doc_id LIMIT 50""")),

    // ---- splitting / sampling / packing ----

    // Deterministic train/val/test split: content-addressed md5 buckets
    // (operators.DataSplit) — pure projection, stable under reruns and
    // repartitioning. The oracle recomputes the same md5-mod in DuckDB,
    // proving the assignment is engine-portable.
    QueryDef("q_split_hash", (s, dir) => {
      DataSplit.assignSplit(t(s, dir, "documents"), "doc_id")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"))
    }, Some("""
      SELECT CASE WHEN b < 80 THEN 'train'
                  WHEN b < 90 THEN 'val'
                  ELSE 'test' END AS split,
        COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        MIN(doc_id) AS min_id
      FROM (SELECT doc_id, n_chars,
              ('0x' || substr(md5(doc_id::VARCHAR || 'split'), 1, 8))::BIGINT
                % 100 AS b
            FROM documents)
      GROUP BY 1""")),

    // Leakage-guarded split: hash the dedup-GROUP key (normalized-text
    // md5), not the row id, so exact-duplicate documents can never
    // straddle train/test (the eval-contamination bug). Row-level
    // output: the oracle checks the exact assignment of every doc.
    QueryDef("q_group_split", (s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("gkey", TextDedup.normalizedHash(col("text")))
      DataSplit.groupAwareSplit(docs, "gkey")
        .select(col("doc_id"), col("gkey"), col("split"))
    }, Some("""
      SELECT doc_id, gkey,
        CASE WHEN b < 80 THEN 'train'
             WHEN b < 90 THEN 'val'
             ELSE 'test' END AS split
      FROM (SELECT doc_id,
              md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS gkey,
              ('0x' || substr(md5(
                md5(lower(regexp_replace(text, '\s+', ' ', 'g')))
                  || 'gsplit'), 1, 8))::BIGINT % 100 AS b
            FROM documents)""")),

    // Deterministic ~5% hash sample — row-level output so the oracle
    // verifies the exact membership, not just the count.
    QueryDef("q_sample_hash", (s, dir) => {
      DataSplit.sampleByHash(t(s, dir, "documents"), "doc_id", 500)
        .select(col("doc_id"), col("lang"))
    }, Some("""
      SELECT doc_id, lang FROM documents
      WHERE ('0x' || substr(md5(doc_id::VARCHAR || 'sample'), 1, 8))::BIGINT
              % 10000 < 500""")),

    // Domain-mixture reweighting: per-source keep rates, deterministic
    // by content hash. Row-level output so the oracle checks exact
    // membership under the target mixture.
    QueryDef("q_mixture_sample", (s, dir) => {
      val rates = (0 until 20).map { i =>
        s"src$i" -> (if (i < 5) 10000 else if (i < 10) 5000 else 1000)
      }.toMap
      DataSplit.mixtureSample(t(s, dir, "documents"), "doc_id", "source",
          rates)
        .select(col("doc_id"), col("source"))
    }, Some("""
      SELECT doc_id, source FROM documents
      WHERE ('0x' || substr(md5(doc_id::VARCHAR || 'mixture'), 1, 8))::BIGINT
              % 10000
        < CASE WHEN source IN ('src0','src1','src2','src3','src4')
                 THEN 10000
               WHEN source IN ('src5','src6','src7','src8','src9')
                 THEN 5000
               ELSE 1000 END""")),

    // Token-budget mixture planning: per-domain token totals → basis-
    // point sampling rates (min(1, budget*weight/tokens)) → hash-keyed
    // keep decision. The oracle replays the WHOLE pipeline — totals,
    // rate formula (floor to int bp, exact same fp op order), md5
    // membership — so the end-to-end plan is engine-portable.
    QueryDef("q_token_budget", (s, dir) => {
      DataSplit.tokenBudgetSample(t(s, dir, "documents"), "doc_id",
          "source", "n_chars", budget = 5000L,
          weights = Map("src1" -> 2.0, "src2" -> 1.0, "src3" -> 1.0))
        .select(col("doc_id"), col("source"))
    }, Some("""
      WITH tot AS (
        SELECT source, SUM(n_chars) AS tok FROM documents GROUP BY source),
      rates AS (
        SELECT source,
          CAST(FLOOR(LEAST(10000.0,
            (5000 * (CASE source WHEN 'src1' THEN 2.0
                                 WHEN 'src2' THEN 1.0
                                 WHEN 'src3' THEN 1.0 END / 4.0))
              / tok * 10000.0)) AS INT) AS bp
        FROM tot
        WHERE source IN ('src1', 'src2', 'src3') AND tok > 0)
      SELECT d.doc_id, d.source
      FROM documents d JOIN rates r ON d.source = r.source
      WHERE ('0x' || substr(md5(d.doc_id::VARCHAR || 'budget'), 1, 8))::BIGINT
              % 10000 < r.bp""")),

    // Gopher-style repetition filter: duplicate word-n-gram fractions.
    QueryDef("q_repetition", (s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          round(TextAnalysis.dupNgramFraction(col("text"), 2), 6)
            .as("dup2"),
          round(TextAnalysis.dupNgramFraction(col("text"), 3), 6)
            .as("dup3"))
        .filter(col("dup2") > 0.2)
    }, Some("""
      WITH g AS (
        SELECT doc_id,
          list_transform(
            generate_series(1, greatest(len(string_split(text,' ')) - 1, 1)),
            i -> array_to_string(string_split(text,' ')[i:i+1], ' ')) AS g2,
          list_transform(
            generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
            i -> array_to_string(string_split(text,' ')[i:i+2], ' ')) AS g3
        FROM documents)
      SELECT doc_id,
        ROUND(1 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 6)
          AS dup2,
        ROUND(1 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3), 6)
          AS dup3
      FROM g
      WHERE ROUND(1 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 6)
              > 0.2""")),

    // END-TO-END curation pipeline: exact-dedup keep-first -> quality
    // gate -> repetition gate -> benchmark decontamination -> train
    // split -> sequence packing, all as ONE composed Spark plan over
    // the operator layer. The oracle replays the identical DAG as a
    // DuckDB CTE chain, so a green row proves the operators compose
    // (each is also oracled individually). At scale the whole thing is
    // one scan + the dedup/pack shuffles — the gates and split are
    // zero-shuffle projections fused into the scan stage.
    QueryDef("q_pipeline_e2e", (s, dir) => {
      val docs = t(s, dir, "documents")
      val deduped = DataSplit.capPerKey(
        docs.withColumn("__h", TextDedup.normalizedHash(col("text"))),
        "__h", "doc_id", 1).drop("__h")
      val filtered = deduped
        .filter(TextAnalysis.qualityScore(col("text")) >= 0.66)
        .filter(round(TextAnalysis.dupNgramFraction(col("text"), 2), 6)
          <= 0.2)
      val bench = docs.filter(col("doc_id") % 50 === 0)
      val contam = TextDedup.contaminated(
        filtered, "doc_id", "text", bench, "text", 5)
      val clean = filtered.join(contam, Seq("doc_id"), "left_anti")
      val train = DataSplit.assignSplit(clean, "doc_id")
        .filter(col("split") === "train")
        .select(col("doc_id"), expr("(n_chars + 3) div 4").as("n_tok"))
      SequencePacking.pack(train, "doc_id", "n_tok", 2048L)
        .select(col("doc_id"), col("n_tok"), col("tok_offset"),
          col("seq_first"), col("pos_in_seq"))
    }, Some("""
      WITH dedup AS (
        SELECT doc_id, text, n_chars FROM (
          SELECT doc_id, text, n_chars,
            ROW_NUMBER() OVER (
              PARTITION BY md5(lower(regexp_replace(text, '\s+', ' ', 'g')))
              ORDER BY doc_id) AS rn
          FROM documents) WHERE rn = 1),
      quality AS (
        SELECT doc_id, text, n_chars FROM dedup
        WHERE ROUND((
            (CASE WHEN LEN(regexp_extract_all(text, '\S+'))
                BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END) +
            (CASE WHEN (LENGTH(text) - LEN(regexp_extract_all(text, '\S+'))
                  + 1.0) / LEN(regexp_extract_all(text, '\S+'))
                BETWEEN 2.5 AND 12.0 THEN 1.0 ELSE 0.0 END) +
            (CASE WHEN CAST(LEN(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
                  AS DOUBLE) / LENGTH(text) <= 0.2
              THEN 1.0 ELSE 0.0 END)) / 3.0, 4) >= 0.66
          AND ROUND(1 - CAST(len(list_distinct(list_transform(
                generate_series(1,
                  greatest(len(string_split(text,' ')) - 1, 1)),
                i -> array_to_string(string_split(text,' ')[i:i+1], ' '))))
                AS DOUBLE)
              / len(list_transform(
                generate_series(1,
                  greatest(len(string_split(text,' ')) - 1, 1)),
                i -> array_to_string(string_split(text,' ')[i:i+1], ' '))),
              6) <= 0.2),
      qgrams AS (
        SELECT doc_id,
          list_transform(
            generate_series(1, greatest(len(string_split(text,' ')) - 4, 1)),
            i -> array_to_string(string_split(text,' ')[i:i+4], ' '))
            AS grams
        FROM quality),
      bgrams AS (
        SELECT list_transform(
            generate_series(1, greatest(len(string_split(text,' ')) - 4, 1)),
            i -> array_to_string(string_split(text,' ')[i:i+4], ' '))
            AS grams
        FROM documents WHERE doc_id % 50 = 0),
      contam AS (
        SELECT DISTINCT q.doc_id
        FROM qgrams q, bgrams b
        WHERE len(list_intersect(q.grams, b.grams)) > 0),
      train AS (
        SELECT doc_id, (n_chars + 3) // 4 AS n_tok FROM quality
        WHERE doc_id NOT IN (SELECT doc_id FROM contam)
          AND ('0x' || substr(md5(doc_id::VARCHAR || 'split'), 1, 8))::BIGINT
                % 100 < 80)
      SELECT doc_id, n_tok,
        off AS tok_offset,
        off // 2048 AS seq_first,
        off % 2048 AS pos_in_seq
      FROM (
        SELECT doc_id, n_tok,
          CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS off
        FROM train)""")),

    // GPT-style sequence packing: global token offsets via the
    // distributed two-phase prefix sum (operators.SequencePacking).
    // The oracle is the SEQUENTIAL definition — DuckDB's global window
    // cumsum — so a green row proves the distributed decomposition is
    // exact. Token proxy: (n_chars+3) div 4, integer in both engines.
    QueryDef("q_seq_pack", (s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), expr("(n_chars + 3) div 4").as("n_tok"))
      SequencePacking.pack(docs, "doc_id", "n_tok", 2048L)
        .select(col("doc_id"), col("n_tok"), col("tok_offset"),
          col("seq_first"), col("seq_last"), col("pos_in_seq"))
    }, Some("""
      SELECT doc_id, n_tok,
        off AS tok_offset,
        off // 2048 AS seq_first,
        (off + n_tok - 1) // 2048 AS seq_last,
        off % 2048 AS pos_in_seq
      FROM (
        SELECT doc_id, (n_chars + 3) // 4 AS n_tok,
          CAST(COALESCE(SUM((n_chars + 3) // 4) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS off
        FROM documents)""")),

    // Length-sorted sequence packing: rank the corpus by descending
    // token count (distributed two-phase GlobalRank — never a
    // single-partition window) and pack in RANK order. Sorting before
    // packing is the standard padding/fragmentation reducer (long
    // documents land at window starts instead of straddling
    // boundaries); the emitted per-doc boundary-split flag lets the
    // oracle certify the whole composition, and the split count is
    // strictly comparable to q_seq_pack's arrival-order packing.
    QueryDef("q_pack_sorted", (s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), expr("(n_chars + 3) div 4").as("n_tok"))
      val ranked = GlobalRank.withRank(docs, "r",
        col("n_tok").desc, col("doc_id"))
      SequencePacking.pack(ranked, "r", "n_tok", 2048L)
        .select(col("doc_id"), col("n_tok"), col("r"), col("tok_offset"),
          col("seq_first"), col("seq_last"),
          (col("seq_last") > col("seq_first")).as("split"))
        .orderBy(col("r"))
    }, Some("""
      SELECT doc_id, n_tok, r,
        off AS tok_offset,
        off // 2048 AS seq_first,
        (off + n_tok - 1) // 2048 AS seq_last,
        (off + n_tok - 1) // 2048 > off // 2048 AS split
      FROM (
        SELECT doc_id, n_tok,
          row_number() OVER (ORDER BY n_tok DESC, doc_id) AS r,
          CAST(COALESCE(SUM(n_tok) OVER (ORDER BY n_tok DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS off
        FROM (SELECT doc_id, (n_chars + 3) // 4 AS n_tok FROM documents))
      ORDER BY r"""))
  )
}
