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
    * then value fields (fails loudly if the source schema lacks
    * key/value structs). */
  def flattened(spark: SparkSession, checkpointDir: String,
      operatorId: Int = 0): DataFrame =
    store(spark, checkpointDir, operatorId)
      .select(col("key.*"), col("value.*"))

  /** Point lookup of one (possibly composite) key — the literal client
    * call shape. `key` supplies one value per key field IN ORDER; fewer
    * values than key fields RAISES (a prefix match would silently
    * return every key sharing the prefix). Empty result means "state
    * not found", the client's UnknownKeyOrNamespaceException case. */
  def lookup(spark: SparkSession, checkpointDir: String, key: Any,
      operatorId: Int = 0): DataFrame =
    lookupComposite(spark, checkpointDir, Seq(key), operatorId)

  def lookupComposite(spark: SparkSession, checkpointDir: String,
      key: Seq[Any], operatorId: Int = 0): DataFrame = {
    val df = store(spark, checkpointDir, operatorId)
    val keyFields = df.select(col("key.*")).columns
    require(key.length == keyFields.length,
      s"lookup key has ${key.length} value(s) but the state key has " +
        s"${keyFields.length} field(s) ${keyFields.mkString("(", ", ", ")")} " +
        "— supply one value per field (prefix lookups would silently " +
        "match multiple keys)")
    val cond = keyFields.zip(key)
      .map { case (f, v) => col(s"key.$f") === lit(v) }
      .reduce(_ && _)
    df.filter(cond).select(col("key.*"), col("value.*"))
  }
}
