package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized range join — the scalable plan for range predicates with
  * NO equi key, where Catalyst can only pick BroadcastNestedLoopJoin
  * (fine when one side broadcasts, quadratic disaster otherwise).
  * Reference behavior: Flink's interval join
  * (flink-table-runtime/.../operators/join/interval/TimeIntervalJoin.java:52)
  * always rides a key; for keyless ranges its batch planner also falls
  * back to nested loop. The bucket technique below is the standard fix
  * (same idea as Databricks' range-join optimization, public docs).
  *
  * Idea: quantize the range dimension into width-`w` buckets. An
  * interval [s, e] is EXPLODED to its covered buckets ((e-s)/w + 1
  * rows); a point p maps to exactly ONE bucket. The join becomes a
  * plain equi-join on bucket plus the exact residual predicate — one
  * hash shuffle on a dense integer key, no nested loop, and each true
  * match is produced exactly once (a point lives in one bucket).
  *
  * Choosing `w`: ~ the typical interval length. Replication factor of
  * the interval side is len/w + 1 (bounded, controlled); too-small w
  * inflates the interval side, too-large w inflates bucket population
  * (residual work). Both degrade gracefully — correctness never
  * depends on w.
  */
object RangeJoin {

  /** Point-in-interval join: rows of `points` matched to rows of
    * `intervals` where `points(pCol)` BETWEEN `intervals(startCol)` AND
    * `intervals(endCol)`. Columns must be numeric (cast timestamps with
    * unix_micros first). `w` is the bucket width in the same units. */
  def pointInInterval(points: DataFrame, pCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      w: Long): DataFrame = {
    require(w > 0, "bucket width must be positive")
    val p = points.withColumn("__bkt", bucket(col(pCol), w))
    val iv = intervals.withColumn("__bkt",
      explode(sequence(bucket(col(startCol), w), bucket(col(endCol), w))))
    p.join(iv, Seq("__bkt"))
      .filter(col(pCol) >= col(startCol) && col(pCol) <= col(endCol))
      .drop("__bkt")
  }

  /** Interval-overlap join: pairs where [aStart,aEnd] and [bStart,bEnd]
    * intersect. Both sides explode to covered buckets; the canonical-
    * bucket condition (bucket == bucket of max(aStart,bStart), the first
    * bucket the overlap occupies) makes every true pair appear exactly
    * once WITHOUT a distinct — no exchange of deduplicated payloads. */
  def intervalOverlap(a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String, w: Long): DataFrame = {
    require(w > 0, "bucket width must be positive")
    val ae = a.withColumn("__bkt",
      explode(sequence(bucket(col(aStart), w), bucket(col(aEnd), w))))
    val be = b.withColumn("__bkt",
      explode(sequence(bucket(col(bStart), w), bucket(col(bEnd), w))))
    ae.join(be, Seq("__bkt"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
        col("__bkt") === bucket(greatest(col(aStart), col(bStart)), w))
      .drop("__bkt")
  }

  /** Floor-division bucket id in exact integer arithmetic (a double
    * floor would silently lose precision past 2^53 — micro-epoch values
    * are within range today, but exactness costs nothing). pmod makes
    * it true floor division for negative values too. */
  private def bucket(c: Column, w: Long): Column = {
    val v = c.cast("long")
    ((v - pmod(v, lit(w))) / w).cast("long")
  }
}
