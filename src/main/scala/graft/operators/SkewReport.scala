package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-skew diagnostic — the profile you run BEFORE picking a join or
  * aggregation strategy at 100 TB: is the hot key 2× the median or
  * 2000×, and is a broadcast / salting / AQE-skew-join warranted? The
  * reference surfaces the same decision as table/exec config
  * (table.optimizer.skewed-join-optimization in its docs); here the
  * evidence is a first-class relational result.
  *
  * One combinable shuffle builds the per-key count table; everything
  * else reads that table, which is |keys| rows, not |rows| — the report
  * costs one aggregation pass no matter how skewed the input. The
  * count table materializes once via eager localCheckpoint and feeds
  * three cheap derivations:
  *
  *  - kind='bucket': degree histogram — k = floor(log2(cnt)) exponent,
  *    cnt = #keys in the bucket, share = fraction of ROWS carried by
  *    the bucket. The exponent is computed integer-exactly as
  *    length(bin(cnt)) - 1, no float log anywhere.
  *  - kind='hotkey': top-N keys by count (ties to smallest key),
  *    share = key's fraction of all rows — the salting candidates.
  *  - kind='total': k = n_keys, cnt = n_rows, share = max_cnt / mean
  *    count — the headline skew factor (1.0 = perfectly uniform).
  *
  * All counts are integral and the two share divisions are single IEEE
  * ops, so the whole report is hash-exact across engines.
  */
object SkewReport {

  /** Profile `keyCol` (integral) in `df`. Returns
    * (kind, k, cnt, share) — see object doc for row kinds. */
  def report(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK > 0, "topK must be > 0")
    val counts = df.groupBy(col(keyCol).cast("long").as("k"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val totals = counts.agg(
      sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"),
      max(col("cnt")).as("max_cnt"))
    val buckets = counts
      .groupBy((length(bin(col("cnt"))) - 1).cast("long").as("k"))
      .agg(count(lit(1)).as("cnt"), sum(col("cnt")).as("rows_in_bucket"))
      .crossJoin(broadcast(totals.select(col("n_rows"))))
      .select(lit("bucket").as("kind"), col("k"), col("cnt"),
        (col("rows_in_bucket").cast("double") / col("n_rows").cast("double"))
          .as("share"))
    val hot = counts
      .orderBy(col("cnt").desc, col("k").asc).limit(topK)
      .crossJoin(broadcast(totals.select(col("n_rows"))))
      .select(lit("hotkey").as("kind"), col("k"), col("cnt"),
        (col("cnt").cast("double") / col("n_rows").cast("double"))
          .as("share"))
    val total = totals.select(lit("total").as("kind"),
      col("n_keys").cast("long").as("k"), col("n_rows").cast("long").as("cnt"),
      (col("max_cnt").cast("double") /
        (col("n_rows").cast("double") / col("n_keys").cast("double")))
        .as("share"))
    buckets.unionAll(hot).unionAll(total)
  }
}
