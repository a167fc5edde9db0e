package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queryable state — reference: flink-queryable-state
  * (QueryableStateClient.java: ad-hoc reads of a running job's keyed
  * state by state name + key). The Spark-native shape is the public
  * STATE DATA SOURCE (`spark.read.format("statestore")`, SPARK-45511):
  * a running (or stopped) streaming query's state store is itself a
  * queryable table addressed by checkpoint location + operator — batch
  * reads against live state, which is strictly more general than the
  * reference's point-lookup client (full SQL over the state, joins
  * included), at the cost of reading snapshots rather than sub-second
  * point lookups.
  *
  * Scale shape: the state source lists one partition per state-store
  * shard, so the read parallelizes like the query that wrote it; key
  * filters prune to the matching shard files. No driver materialization.
  */
object QueryableState {

  /** The keyed state of `operatorId` at `checkpointDir` as a DataFrame
    * of (key struct, value struct) — the raw store view. */
  def store(spark: SparkSession, checkpointDir: String,
      operatorId: Int = 0, storeName: Option[String] = None,
      batchId: Option[Long] = None): DataFrame = {
    val r = spark.read.format("statestore")
      .option("operatorId", operatorId)
    val r2 = storeName.fold(r)(n => r.option("storeName", n))
    val r3 = batchId.fold(r2)(b => r2.option("batchId", b))
    r3.load(checkpointDir)
  }

  /** Flattened (key..., value...) view — the QueryableStateClient
    * `getKvState` analogue: one row per live key, columns = key fields
    * then value fields. */
  def flattened(spark: SparkSession, checkpointDir: String,
      operatorId: Int = 0): DataFrame = {
    val df = store(spark, checkpointDir, operatorId)
    df.select(col("key.*") +: df.columns.filter(_ == "value")
      .map(_ => col("value.*")): _*)
  }

  /** Point lookup of one key (string-rendered comparison on the first
    * key field) — the literal client call shape. Returns the matching
    * state rows; empty means "state not found", the client's
    * UnknownKeyOrNamespaceException case. */
  def lookup(spark: SparkSession, checkpointDir: String, key: Any,
      operatorId: Int = 0): DataFrame = {
    val df = store(spark, checkpointDir, operatorId)
    val keyField = df.select(col("key.*")).columns.head
    df.filter(col(s"key.$keyField") === lit(key)).select(col("key.*"),
      col("value.*"))
  }
}
