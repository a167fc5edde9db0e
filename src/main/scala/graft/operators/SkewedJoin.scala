package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join: salt-and-replicate. AQE's skew-join split
  * (OptimizeSkewedJoin) handles most cases at runtime by splitting
  * oversized partitions — but it only fires for sort-merge/shuffled-hash
  * joins AND both sides' partitions must be splittable. When one hot key
  * (null-ish user id, empty-doc hash, a viral item) dominates a
  * fact-to-medium-table join, the classic explicit fix still wins:
  *
  *  - fact side: each row gets a random-but-deterministic salt in
  *    [0, buckets) appended to the join key;
  *  - build side: each row is REPLICATED `buckets` times, once per salt
  *    value (explode over a sequence literal — zero extra shuffle,
  *    the replication happens map-side after the exchange).
  *
  * The join key becomes (key, salt): the hot key's rows now spread over
  * `buckets` reducers. Cost: build side shuffles `buckets`× its size —
  * so salt ONLY the hot keys when they are known (`hotKeys` variant
  * splits the input and unions a salted hot-path with a plain join).
  *
  * Reference: Flink has no built-in either (users hand-roll the same
  * pattern); its batch planner relies on hash-partition splitting.
  */
object SkewedJoin {

  /** Deterministic per-row salt — stable under retries (no rand()):
    * hash of the whole row's partition offset would not be; position
    * within the partition is. */
  private def salt(buckets: Int): Column =
    pmod(hash(spark_partition_id(), monotonically_increasing_id()),
      lit(buckets))

  /** Inner equi-join of `fact` and `build` on `key`, salted
    * `buckets` ways across the full key space. */
  def saltedJoin(fact: DataFrame, build: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val f = fact.withColumn("__salt", salt(buckets))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    f.join(b, Seq(key, "__salt")).drop("__salt")
  }

  /** Salt only the known-hot keys: hot rows take the salted path,
    * everything else a plain join — build-side replication cost is
    * `buckets`× the HOT build rows only. */
  def saltedJoinHotKeys[K](fact: DataFrame, build: DataFrame, key: String,
      hotKeys: Seq[K], buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val isHot = col(key).isin(hotKeys.map(_.asInstanceOf[Any]): _*)
    val cold = fact.filter(!isHot).join(build.filter(!isHot), Seq(key))
    val hot = saltedJoin(fact.filter(isHot), build.filter(isHot),
      key, buckets)
    // unionByName: the salted path's column order matches after drop
    cold.unionByName(hot)
  }
}
