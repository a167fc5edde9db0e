package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  *   lnq_b  = floor(2^20 · ln((cnt_a·N_b) / (cnt_b·N_a)))   (BIGINT)
  *   term_b = (cnt_a·N_b - cnt_b·N_a) · lnq_b               (exact)
  *   PSI    ≈ Σ term_b / (N_a · N_b · 2^20)
  *
  * Scale shape: one groupBy on the bucket column (map-side combined
  * conditional counts), then a broadcast of the 1-row totals — the
  * corpus is scanned once and never reshuffled.
  */
object Drift {

  private val Quant = 1L << 20

  /** Per-bucket PSI table between rows where `inA` is true (snapshot A)
    * and the rest (snapshot B). Output: bucket, smoothed counts, the
    * quantized log-ratio, and the exact integer PSI term. */
  def psiTable(df: DataFrame, bucketCol: Column, inA: Column): DataFrame = {
    val c = df.groupBy(bucketCol.as("bucket"))
      .agg(
        (sum(when(inA, 1L).otherwise(0L)) + 1L).as("cnt_a"),
        (sum(when(inA, 0L).otherwise(1L)) + 1L).as("cnt_b"))
    val totals = c.agg(
      sum(col("cnt_a")).as("n_a"), sum(col("cnt_b")).as("n_b"))
      .localCheckpoint(true) // 1 row; reused below and by the guard
    // Exactness bound, checked LOUDLY instead of wrapping: the term is
    // (cnt_a·n_b − cnt_b·n_a)·lnq with |diff| ≤ n_a·n_b and
    // |lnq| ≤ 2^20·ln(n_a·n_b); the product must stay under 2^62
    // (Spark would wrap silently, DuckDB would raise — both wrong).
    // Holds to ~5·10^7 rows per snapshot; beyond that, pre-aggregate
    // buckets or shrink the quantization.
    val t = totals.head()
    if (t.isNullAt(0)) // empty input: no buckets, empty report
      return c.select(col("bucket"), col("cnt_a"), col("cnt_b"),
        lit(0L).as("lnq"), lit(0L).as("psi_term"))
    val (na, nb) = (t.getLong(0), t.getLong(1))
    val bound = na.toDouble * nb * (math.log(na.toDouble * nb) * Quant)
    require(bound < math.pow(2, 62),
      s"psiTable exactness bound exceeded (n_a=$na, n_b=$nb): " +
        "pre-aggregate the snapshots or reduce the quantization")
    val j = c.crossJoin(broadcast(totals))
    val lnq = floor(
      log((col("cnt_a") * col("n_b")).cast("double") /
          (col("cnt_b") * col("n_a")).cast("double")) * Quant)
      .cast("long")
    j.select(col("bucket"), col("cnt_a"), col("cnt_b"),
      lnq.as("lnq"),
      ((col("cnt_a") * col("n_b") - col("cnt_b") * col("n_a")) * lnq)
        .as("psi_term"))
  }
}
