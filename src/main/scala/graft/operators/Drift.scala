package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus drift monitoring: Population Stability Index between two
  * corpus snapshots over a categorical bucket (language, source,
  * domain…) — the standard "did the crawl mix shift?" gate a
  * continuously-ingesting training pipeline runs per snapshot.
  *
  * PSI = Σ_b (p_b - q_b) · ln(p_b / q_b) with Laplace add-one
  * smoothing (a bucket present in only one snapshot must not produce
  * ln 0 / ln ∞).
  *
  * Engine-exact construction (the repo's quantized-transcendental
  * discipline, same as the A-ES sampler's ln and the RRF fusion):
  * every quantity stays an exact integer except ONE double division
  * and ONE ln per bucket, and the ln is floor-quantized to 2^-20
  * before any further arithmetic:
  *
  *   lnq_b  = floor(2^20 · ln((cnt_a·N_b) / (cnt_b·N_a)))     (BIGINT)
  *   term_b = ((cnt_a·N_b - cnt_b·N_a) · lnq_b) div (N_a·N_b)
  *   PSI    ≈ Σ term_b / 2^20
  *
  * The term numerator runs in DecimalType(38,0) — exact in Spark,
  * HUGEINT in the DuckDB replay — so there is no 2^63 wraparound
  * hazard: |diff·lnq| ≤ N_a·N_b · 2^20·ln(N_a·N_b) stays under 10^38
  * up to ~10^14 rows PER SNAPSHOT (far past a 100 TB corpus; the
  * round-5 BIGINT formulation hard-failed at ~4·10^5 balanced rows).
  * The emitted `psi_term` is the bucket's PSI contribution scaled by
  * 2^20 and floor-quantized — always ≥ 0 (diff and lnq share a sign),
  * always BIGINT-sized (≤ 2^20·ln(N_a·N_b) ≈ 10^8), and normalized,
  * so terms are comparable across snapshots of different sizes.
  *
  * Scale shape: one groupBy on the bucket column (map-side combined
  * conditional counts), then a broadcast of the 1-row totals — the
  * corpus is scanned once, never reshuffled, and no driver action runs.
  */
object Drift {

  private val Quant = 1L << 20

  /** Per-bucket PSI table between rows where `inA` is true (snapshot A)
    * and the rest (snapshot B). Output: bucket, smoothed counts, the
    * quantized log-ratio, and the normalized integer PSI term. */
  def psiTable(df: DataFrame, bucketCol: Column, inA: Column): DataFrame = {
    def dec(c: Column): Column = c.cast(DecimalType(38, 0))
    val c = df.groupBy(bucketCol.as("bucket"))
      .agg(
        (sum(when(inA, 1L).otherwise(0L)) + 1L).as("cnt_a"),
        (sum(when(inA, 0L).otherwise(1L)) + 1L).as("cnt_b"))
    val totals = c.agg(
      sum(col("cnt_a")).as("n_a"), sum(col("cnt_b")).as("n_b"))
    // empty input → c has no groups → the join output is empty; no
    // driver-side guard needed.
    val j = c.crossJoin(broadcast(totals))
    val lnq = floor(
      log((col("cnt_a") * col("n_b")).cast("double") /
          (col("cnt_b") * col("n_a")).cast("double")) * Quant)
      .cast("long")
    j.select(col("bucket"), col("cnt_a"), col("cnt_b"),
        lnq.as("lnq"),
        (dec(col("cnt_a")) * dec(col("n_b")) -
         dec(col("cnt_b")) * dec(col("n_a"))).as("__diff"),
        (dec(col("n_a")) * dec(col("n_b"))).as("__den"))
      .withColumn("psi_term", expr("(__diff * lnq) div __den"))
      .select(col("bucket"), col("cnt_a"), col("cnt_b"),
        col("lnq"), col("psi_term"))
  }
}
