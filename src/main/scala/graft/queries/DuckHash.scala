package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.operators.{DataSplit, GlobalRank, SequencePacking, Similarity, TextAnalysis, TextDedup}
import graft.multimodal.Multimodal
import Q._

  /** DuckDB SQL fragments replaying the native TextHash kernels
    * (functions/TextHashExprs.scala) bit-exactly, so the hash-based
    * dedup signatures get real value oracles instead of rows-only
    * checks. 64-bit wrap-around arithmetic is emulated in HUGEINT with
    * a 32-bit operand split (a full 64x64 product overflows signed
    * INT128); Java's signed-long view is recovered with an explicit
    * 2^64 offset. The corpus is ASCII (TESTDATA), so DuckDB code
    * points == Java chars. */
  private[queries] object DuckHash {
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
