package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.operators.{DataSplit, GlobalRank, SequencePacking, Similarity, TextAnalysis, TextDedup}
import graft.multimodal.Multimodal
import Q._

/** Embedding similarity — ANN (brute/SRP-LSH/IVF/PQ/IVFADC/SQ8 with
  * recall gates), embedding near-dup (exact oracle + LSH scale path),
  * SemDeDup, and the embedding pipeline DAG. Engine-exact quantized
  * Lloyd's iterations are replayed in DuckDB via [[DuckHash]] CTEs.
  */
object AnnQueries {

  val defs: Seq[QueryDef] = Seq(


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
          >= 0.4"""),
      // Exact all-pairs oracle anchor (O(N²) theta-join by design, like
      // q_set_simjoin's brute twin) — out of the bench set per the
      // repo's all-pairs-anchor convention; q_embed_neardup_lsh is the
      // benched scale path.
      bench = false),


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


    // Incremental EMBEDDING near-dup — the vector twin of
    // q_incremental_neardup: a new batch joins the corpus's persisted
    // SRP bucket index on (tbl, bucket), EXACT cosine >= 0.4 verifies
    // each collision, then within-batch near-dup clusters collapse to
    // the smallest id (computed among corpus-survivors). The corpus is
    // the deterministic md5 half of the table, so re-arriving corpus
    // vectors drop against their own index entries (cos = 1). The
    // oracle replays SRP planes, the bucket caps, both drop sets, and
    // the exact-cosine verify.
    QueryDef("q_incremental_embed_neardup", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val corpus = emb
        .filter(DataSplit.hashBucket(col("vec_id"), 2, "nd") === 0)
      val index = Similarity.embedNearDupIndex(corpus, "embedding",
        dim = 64, planes = 6, tables = 16)
      Similarity.incrementalEmbedNearDup(emb, "vec_id", "embedding",
        index, threshold = 0.4, dim = 64, planes = 6, tables = 16)
        .select(col("vec_id"))
    }, Some {
      val planeRows = (0 until 16).flatMap { tbl =>
        graft.functions.SrpBucket.weights(64, 6, tbl).zipWithIndex.map {
          case (w, p) => s"($tbl, $p, [${w.mkString(",")}])"
        }
      }.mkString(",\n        ")
      def cosSql(a: String, b: String): String =
        s"""ROUND(list_dot_product(CAST($a AS DOUBLE[]),
                                   CAST($b AS DOUBLE[]))
          / (sqrt(list_dot_product(CAST($a AS DOUBLE[]),
                                   CAST($a AS DOUBLE[])))
           * sqrt(list_dot_product(CAST($b AS DOUBLE[]),
                                   CAST($b AS DOUBLE[])))), 6)"""
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
      corp AS (
        SELECT vec_id FROM embeddings
        WHERE ('0x' || substr(md5(vec_id::VARCHAR || 'nd'), 1, 8))::BIGINT
          % 2 = 0),
      idx AS (
        SELECT b.tbl, b.bucket, b.vec_id AS cid
        FROM buckets b JOIN corp ON b.vec_id = corp.vec_id),
      idx_capped AS (
        SELECT tbl, bucket, cid FROM (
          SELECT idx.*, COUNT(*) OVER (PARTITION BY tbl, bucket) AS n
          FROM idx)
        WHERE n <= 2000),
      drop_corpus AS (
        SELECT DISTINCT b.vec_id
        FROM buckets b
        JOIN idx_capped i ON b.tbl = i.tbl AND b.bucket = i.bucket
        JOIN embeddings ea ON ea.vec_id = b.vec_id
        JOIN embeddings eb ON eb.vec_id = i.cid
        WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.4),
      surv AS (
        SELECT * FROM buckets
        WHERE vec_id NOT IN (SELECT vec_id FROM drop_corpus)),
      surv_capped AS (
        SELECT vec_id, tbl, bucket FROM (
          SELECT surv.*, COUNT(*) OVER (PARTITION BY tbl, bucket) AS n
          FROM surv)
        WHERE n BETWEEN 2 AND 2000),
      drop_batch AS (
        SELECT DISTINCT b.vec_id
        FROM surv_capped a
        JOIN surv_capped b
          ON a.tbl = b.tbl AND a.bucket = b.bucket
            AND a.vec_id < b.vec_id
        JOIN embeddings ea ON ea.vec_id = a.vec_id
        JOIN embeddings eb ON eb.vec_id = b.vec_id
        WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.4)
      SELECT vec_id FROM embeddings
      WHERE vec_id NOT IN (SELECT vec_id FROM drop_corpus)
        AND vec_id NOT IN (SELECT vec_id FROM drop_batch)"""
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
      bench = false)
  )
}
