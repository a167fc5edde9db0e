package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — frequency
  * estimation / heavy-hitter detection in bounded memory. In a
  * training-data pipeline this is the domain / n-gram heavy-hitter
  * detector: estimate per-key frequencies over 100 TB without the full
  * exact groupBy, with a one-sided error bound (estimate >= true count,
  * overestimate <= eps * N with probability 1 - delta for
  * width >= e/eps, depth >= ln(1/delta)).
  *
  * Engine portability: bucket hashes reuse the md5-prefix scheme of
  * [[Sketches.portableHash32]], seeded per row as md5("<row>:<value>"),
  * so the whole sketch — and therefore every estimate read from it —
  * is a DETERMINISTIC, order-independent function of the data: counts
  * are added per bucket, addition commutes, and the DuckDB oracle
  * rebuilds the identical d x w count matrix in SQL and hash-matches
  * the estimates exactly (reference analogue: Flink has no sketch
  * library; this is the missing synopsis layer next to KMV/HLL).
  *
  * Scale shape: the buffer is one primitive Array[Long] of d*w counts
  * per group; reduce is d in-place increments (the d bucket indexes are
  * PRE-COMPUTED in the projection with codegen'd md5 — the Aggregator
  * never hashes), merge is an elementwise vector add that runs once per
  * pre-aggregated partial. Map-side combine therefore compresses any
  * partition to a single d*w vector — constant state per group, no
  * shuffle growth with cardinality, the exact reason to sketch at all.
  */
object CountMin {

  /** Bucket index of `value` in hash row `row`: the row's 8-hex-char
    * slice of ONE md5 per value (32 hex chars = 4 independent 32-bit
    * hashes — one hash invocation instead of depth, and the slices are
    * as independent as md5 bits are, which is the usual CM heuristic).
    * Codegen'd — keep this in the projection, not inside the
    * Aggregator. Depth is capped at 4 by the digest width. */
  def bucket(row: Int, value: Column, width: Int): Column =
    pmod(
      conv(substring(md5(value.cast("string")), 8 * row + 1, 8), 16, 10)
        .cast("long"),
      lit(width.toLong))

  /** All d bucket indexes of `value` as one array column. */
  def buckets(value: Column, depth: Int, width: Int): Column = {
    require(depth >= 1 && depth <= 4, s"depth must be 1..4 (md5 slices), got $depth")
    array((0 until depth).map(i => bucket(i, value, width).cast("int")): _*)
  }

  /** Aggregate Column building the sketch over pre-computed bucket
    * arrays (from [[buckets]]). Output: the flattened d*w count matrix
    * (row-major). */
  def sketch(value: Column, depth: Int, width: Int): Column = {
    val agg = udaf(new CmsAggregator(depth, width), ExpressionEncoder[Seq[Int]]())
    agg(buckets(value, depth, width))
  }

  /** Point estimate for `key` from a sketch column: min over the d rows
    * of the count at the key's bucket — the CM minimum rule. */
  def estimate(sketch: Column, key: Column, depth: Int, width: Int): Column =
    (0 until depth)
      .map(i => element_at(sketch, (bucket(i, key, width) + lit(i.toLong * width) + lit(1L)).cast("int")))
      .reduce(least(_, _))

  class CmsAggregator(depth: Int, width: Int)
      extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](depth * width)
    override def reduce(b: Array[Long], bs: Seq[Int]): Array[Long] = {
      var i = 0
      while (i < depth) { b(i * width + bs(i)) += 1L; i += 1 }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }
}
