package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear quality classifier over hashing-trick text
  * features — the fastText-style quality filter of the DCLM /
  * CCNet-lineage curation recipes (Li et al. 2024 "DataComp-LM",
  * Joulin et al. 2016): train a cheap linear model on labeled examples
  * (or on an upstream rule to distill it), then score the whole corpus
  * with a zero-shuffle projection and keep what clears a threshold.
  *
  * The reference has no model-training operator; this extends the
  * training-data surface with the [[KMeans]]/[[Similarity]] discipline:
  * ENGINE-EXACT fixed-point arithmetic so the fitted weights and every
  * score hash-match a DuckDB replay of the same iteration.
  *
  *  - Features: binary presence of each of `dim` hash buckets of the
  *    per-word 64-bit hash ([[TextDedup.gramHashes]] n=1 =
  *    splitmix64-finalized FNV-1a), plus an intercept. `dim` MUST be a
  *    power of two: `pmod(signed hash, 2^k)` and the replay's unsigned
  *    `hash % 2^k` agree exactly because 2^64 is divisible by 2^k.
  *  - Moments: one aggregation computes the integer Gram matrix
  *    A = XᵀX ((dim+1)², map-side combined) and b = Xᵀy — the corpus
  *    is scanned ONCE and never shuffled (the [[Similarity]] PCA moment
  *    shape); labels are ±1 longs.
  *  - Fit: ridge least-squares by `iters` full-batch gradient steps in
  *    fixed point (weights are longs at `scale`): Ahat = floor(A*scale/
  *    n) + λfx·I and bhat = floor(b*scale/n) are computed once (one
  *    double multiply+divide each, exact below 2^53 — enforced), then
  *    w -= floor((floor(Ahat·w / scale) - bhat) / 2^etaShift). Every
  *    step is integer math plus floor-of-double-division, identical in
  *    any engine; no exp/sigmoid whose libm rounding could diverge
  *    cross-engine (why ridge LS rather than logistic — the sign of
  *    the linear score is the decision either way).
  *  - Score: dot(w, x) — an exact integer at `scale`, zero shuffle.
  *
  * Scale notes: moments are O(dim²) longs of driver state and the
  * gradient loop never touches the corpus again. Binary presence
  * features bound every |A/n| entry by 1, so the gradient step is
  * stable whenever (dim+1) / 2^etaShift < 2. The (dim+1)² explode in
  * [[moments]] is the right shape up to dim ≈ a few hundred; a 2^20-dim
  * hashing layer (fastText-sized) would switch to sharded SGD over a
  * weight table, which no longer fits the exact-replay contract. */
object QualityClassifier {

  /** Binary presence features + intercept: array<long> of length
    * dim+1, x(b) = 1 iff some word hashes into bucket b, x(dim) = 1. */
  def featurize(textCol: Column, dim: Int): Column = {
    require(dim >= 2 && (dim & (dim - 1)) == 0, "dim must be a power of 2")
    val hs = TextDedup.gramHashes(textCol, 1, distinct = false)
    concat(
      transform(sequence(lit(0), lit(dim - 1)),
        b => when(exists(hs, h => pmod(h, lit(dim)) === b.cast("long")),
          lit(1L)).otherwise(lit(0L))),
      array(lit(1L)))
  }

  /** Fixed-point model: weights at `scale` (index dim = intercept). */
  final case class Model(w: Array[Long], dim: Int, scale: Long)

  /** Integer moments A = XᵀX, b = Xᵀy, n — ONE corpus pass via the
    * [[Similarity.IntMomentAgg]] typed aggregator (map-side combined,
    * shuffle = partitions x (dim+2)² longs, never the corpus — the PCA
    * moment shape). The label rides as an extra trailing coordinate,
    * so b falls out of the same Gram matrix as its cross-row. Integer
    * sums are order-free, so this is value-identical to any per-cell
    * formulation — the DuckDB oracle needs no knowledge of the
    * aggregation layout. */
  private def moments(docs: DataFrame, textCol: String, labelCol: String,
      dim: Int): (Array[Array[Long]], Array[Long], Long) = {
    val d1 = dim + 1
    val d2 = d1 + 1
    val spark = docs.sparkSession
    import spark.implicits._
    val v = concat(featurize(col(textCol), dim),
      array(col(labelCol).cast("long")))
    val mom = docs.select(v.as("v")).as[Array[Long]]
      .select(new Similarity.IntMomentAgg(d2).toColumn).head()
    val a = Array.tabulate(d1, d1)((i, j) => mom.m(i * d2 + j))
    val b = Array.tabulate(d1)(i => mom.m(i * d2 + d1))
    (a, b, mom.n)
  }

  /** Fit by `iters` exact fixed-point ridge-GD steps (class doc). */
  def fitExact(docs: DataFrame, textCol: String, labelCol: String,
      dim: Int = 32, iters: Int = 60, etaShift: Int = 6,
      lambdaFx: Long = 1024L, scale: Long = 1L << 20): Model = {
    val d1 = dim + 1
    val (a, b, n) = moments(docs, textCol, labelCol, dim)
    require(n > 0, "fitExact needs a non-empty corpus")
    // binary features bound |A| and |b| entries by n, so exactness
    // needs n*scale < 2^53 (~8.6e9 docs at the default scale)
    def norm(v: Long): Long = {
      require(math.abs(v.toDouble * scale) < (1L << 53).toDouble,
        "moment normalization would lose integer exactness")
      math.floor(v.toDouble * scale / n).toLong
    }
    val ahat = Array.tabulate(d1, d1)((i, j) =>
      norm(a(i)(j)) + (if (i == j) lambdaFx else 0L))
    val bhat = Array.tabulate(d1)(i => norm(b(i)))
    val w = new Array[Long](d1)
    for (_ <- 1 to iters) {
      val g = Array.tabulate(d1) { i =>
        var dot = 0L
        var j = 0
        while (j < d1) { dot += ahat(i)(j) * w(j); j += 1 }
        math.floor(dot.toDouble / scale).toLong - bhat(i)
      }
      var i = 0
      while (i < d1) {
        w(i) -= math.floor(g(i).toDouble / (1L << etaShift)).toLong
        i += 1
      }
    }
    Model(w, dim, scale)
  }

  /** Exact integer score at model scale: dot(w, featurize(text)).
    * Positive = predicted quality class; `score / scale` is the
    * real-valued margin. Pure projection — zero shuffle. */
  def score(textCol: Column, model: Model): Column =
    aggregate(
      zip_with(featurize(textCol, model.dim), typedLit(model.w.toSeq),
        (x, w) => x * w),
      lit(0L), (acc, v) => acc + v)
}
