package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct sketch — Bar-Yossef et al. 2002,
  * Beyer et al. 2007 ("Distinct-value synopses"): keep the k smallest
  * distinct hash values; with hashes uniform on [0, 2^32), the k-th
  * minimum h_k estimates the cardinality as (k-1) * 2^32 / h_k. Unlike
  * Spark's built-in approx_count_distinct (HLL++), KMV sketches support
  * set ALGEBRA: the union of two sketches is the k smallest of their
  * merged value sets (exact sketch identity, not an approximation of a
  * sketch), and intersections estimate via the Jaccard of the combined
  * synopsis — the audience-overlap / cross-corpus-dedup estimator.
  *
  * Engine portability: values are hashed with [[portableHash32]]
  * (md5-prefix, identical in Spark / DuckDB / anything with md5), so a
  * KMV estimate is DETERMINISTIC — the oracle recomputes the same
  * synopsis in SQL and hash-matches even the estimate's double bits.
  *
  * Scale shape: a bounded k-length sorted buffer per group; reduce and
  * merge are O(k) (insertion into a sorted array — k is 256-ish;
  * a production impl would use a treeset for large k). Map-side partial
  * aggregation applies as with any Aggregator.
  */
object Sketches {

  /** Uniform 32-bit hash portable across engines: first 8 hex chars of
    * md5 of the value's string form. */
  def portableHash32(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  private val HashSpace = 4294967296.0 // 2^32

  /** Estimate from a k-bounded ascending synopsis. */
  def estimateFrom(synopsis: Seq[Long], k: Int): Double =
    if (synopsis.size < k) synopsis.size.toDouble
    else (k - 1) * HashSpace / synopsis.last

  private[operators] def union2(a: List[Long], b: List[Long], k: Int): List[Long] =
    (a ++ b).distinct.sorted.take(k)

  /** Typed Aggregator over PRE-HASHED values (apply [[portableHash32]]
    * in the projection so hashing stays codegen'd). Output: the
    * synopsis (ascending).
    *
    * The buffer is a SORTED PRIMITIVE Array[Long] (the typed-imperative
    * aggregate keeps it as a live object per group, serializing only at
    * shuffle boundaries): a warm sketch rejects almost every row with
    * one O(1) compare against the k-th minimum, membership is a binary
    * search, and the rare true insert is an in-place arraycopy splice —
    * no per-row allocation. The earlier List buffer walked (and
    * re-allocated) 256 cons cells per row and dominated the whole
    * aggregation at corpus scale. */
  class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      val n = b.length
      if (n == k && h >= b(n - 1)) b // warm fast path: not a k-minimum
      else {
        val pos = java.util.Arrays.binarySearch(b, h)
        if (pos >= 0) b // already present
        else {
          val ins = -pos - 1
          if (n < k) {
            val nb = new Array[Long](n + 1)
            System.arraycopy(b, 0, nb, 0, ins)
            nb(ins) = h
            System.arraycopy(b, ins, nb, ins + 1, n - ins)
            nb
          } else { // full: drop the current max, splice h in place
            System.arraycopy(b, ins, b, ins + 1, n - ins - 1)
            b(ins) = h
            b
          }
        }
      }
    }
    // single-pass two-way merge of sorted arrays, dedup, cap k — merge
    // runs once per pre-aggregated group on the combine side (with a
    // distinct-agg in the same Aggregate, Spark's Expand rewrite makes
    // that one merge PER DISTINCT KEY, so this path is as hot as reduce)
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      val out = new Array[Long](math.min(x.length + y.length, k))
      var i = 0
      var j = 0
      var n = 0
      while (n < out.length && (i < x.length || j < y.length)) {
        val take =
          if (j >= y.length || (i < x.length && x(i) <= y(j))) {
            val v = x(i); if (i < x.length && j < y.length && x(i) == y(j)) j += 1
            i += 1; v
          } else { val v = y(j); j += 1; v }
        if (n == 0 || out(n - 1) != take) { out(n) = take; n += 1 }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Distinct-count estimate as a ready aggregate Column. */
  def kmvDistinct(hashed: Column, k: Int = 256): Column = {
    val agg = udaf(new KmvSketch(k), Encoders.scalaLong)
    val syn = agg(hashed)
    // estimate from the synopsis column: exact below k, else the
    // k-th-minimum formula — identical fp op order to estimateFrom
    when(size(syn) < k, size(syn).cast("double"))
      .otherwise(lit((k - 1) * HashSpace) / element_at(syn, k).cast("double"))
  }

  /** Union cardinality estimate of two synopses (driver-side algebra —
    * sketches are just Seq[Long]). */
  def estimateUnion(a: Seq[Long], b: Seq[Long], k: Int): Double =
    estimateFrom(union2(a.toList, b.toList, k), k)

  /** Intersection estimate via the combined synopsis' observed Jaccard
    * (Beyer et al. 2007 §4): |A∩B| ≈ J * |A∪B|. */
  def estimateIntersection(a: Seq[Long], b: Seq[Long], k: Int): Double = {
    val u = union2(a.toList, b.toList, k)
    if (u.isEmpty) 0.0
    else {
      val inBoth = u.count(h => a.contains(h) && b.contains(h))
      inBoth.toDouble / u.size * estimateFrom(u, k)
    }
  }

  // ---------------------------------------------------------------------
  // Deterministic sampled quantiles (bottom-k-by-hash sample)
  // ---------------------------------------------------------------------
  // The full-sort exact quantile doesn't scale (global sort of 100 TB)
  // and approx_percentile's GK sketch is engine-private (not replayable
  // by another system, merge order-dependent). The portable alternative:
  // a BOTTOM-k-BY-HASH sample — the k rows whose md5-derived hash of a
  // unique row key is smallest form a uniform random sample of the
  // group that is DETERMINISTIC (a pure function of the data, not of
  // partitioning or seeds) and MERGEABLE (k smallest of a union), the
  // sample-based quantile estimator of Cormode et al., "Synopses for
  // Massive Data" §2. Estimate error is O(1/sqrt(k)) in rank space.
  //
  // Plan shape: the rank filter compiles to WindowGroupLimit (map-side
  // partial top-k per group BEFORE the shuffle — asserted in PlanSpec),
  // so each of 1000 executors ships at most k rows per group, never the
  // corpus.

  /** Rank of a row inside its group under the portable-hash order:
    * `filter(sampleRank(...) <= k)` IS the deterministic uniform
    * k-sample. `rowKey` must be unique per row (it is also the
    * tie-break, making the sample a pure function of the data). */
  def sampleRank(groupCols: Seq[Column], rowKey: Column): Column =
    row_number().over(
      Window.partitionBy(groupCols: _*).orderBy(portableHash32(rowKey), rowKey))

  /** Linear-interpolated quantile over an ASCENDING array column —
    * h = (n-1)q; v = v[lo] + (v[hi] - v[lo]) * (h - lo). The arithmetic
    * (operand order included) is mirrored verbatim in the DuckDB oracle
    * so the double bits hash-match. */
  def interpolatedQuantile(sortedVals: Column, q: Double): Column = {
    val n = size(sortedVals)
    val h = (n - lit(1)).cast("double") * lit(q)
    val lo = floor(h).cast("int")
    val frac = h - floor(h).cast("double")
    val vlo = element_at(sortedVals, lo + lit(1))
    val vhi = element_at(sortedVals, least(lo + lit(2), n))
    vlo + (vhi - vlo) * frac
  }
}
