package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
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

  /** Insert into a sorted, distinct, k-bounded synopsis. O(k). */
  private[operators] def insert(s: List[Long], h: Long, k: Int): List[Long] =
    if (s.contains(h)) s
    else {
      val merged = (h :: s).sorted
      if (merged.size > k) merged.take(k) else merged
    }

  private[operators] def union2(a: List[Long], b: List[Long], k: Int): List[Long] =
    (a ++ b).distinct.sorted.take(k)

  /** Typed Aggregator over PRE-HASHED values (apply [[portableHash32]]
    * in the projection so hashing stays codegen'd). Output: the
    * synopsis (ascending). */
  class KmvSketch(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
    override def zero: List[Long] = Nil
    override def reduce(b: List[Long], h: Long): List[Long] = insert(b, h, k)
    override def merge(x: List[Long], y: List[Long]): List[Long] = union2(x, y, k)
    override def finish(b: List[Long]): Seq[Long] = b
    override def bufferEncoder: Encoder[List[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
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
}
