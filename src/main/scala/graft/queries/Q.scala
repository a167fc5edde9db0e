package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables

/** Shared helpers for the query/oracle inventory.
  *
  * Floating-point discipline: a parallel double SUM is order-dependent, so
  * a Spark result and a DuckDB oracle can differ in the last ulps and fail
  * a hash compare. Money-style aggregates therefore cast each row to
  * DECIMAL(18,4) (exact, associative), sum exactly, and convert the final
  * decimal to double ONCE — the same bits on any engine, any parallelism.
  * This is also the right call at 100 TB: decimal partial aggregation is
  * codegen'd and associative, so map-side combine stays correct.
  */
object Q {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact sum of a money-ish double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Money factor (values have exactly 2 decimals, < 1e10): casting the
    * raw column is unambiguous in both engines (no rounding ties), and
    * tight precisions keep decimal products under precision 38 so neither
    * engine's overflow capping kicks in. */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))
  def moneySql(x: String): String = s"CAST($x AS DECIMAL(12,2))"

  /** Rate factor (discount/tax, 2 decimals in [0,1)). */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))
  def rateSql(x: String): String = s"CAST($x AS DECIMAL(4,2))"

  /** Exact revenue term price*(1-disc): DECIMAL(12,2)*DECIMAL(5,2) —
    * exact decimal arithmetic, identical across engines. */
  def revenue(price: Column, disc: Column): Column =
    money(price) * (lit(1) - rate(disc))
  def revenueSql(p: String, d: String): String =
    s"${moneySql(p)} * (1 - ${rateSql(d)})"

  def dsumSql(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"

  /** Exact average: exact decimal sum divided by count, both engines
    * perform one identical double division. */
  def davg(c: Column): Column = dsum(c) / count(c)

  def davgSql(x: String): String = s"${dsumSql(x)} / COUNT($x)"

  /** Run a SQL query with all test tables registered as views. */
  def sql(s: SparkSession, dir: String, q: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q)
  }

  /** Input-skew guard (optimization guide §2.5 "one huge unsplittable
    * file"): when a CPU-dense-per-byte computation (shingling, hashing,
    * per-row decode) reads an input whose SCAN parallelism is below the
    * cluster's core count — the one-small-file shape of the bench
    * tables, where `files.openCostInBytes` floors the split size — one
    * round-robin redistribution lets the expensive projection run on
    * every core instead of 1-3 scan tasks. A NO-OP whenever the scan is
    * already parallel (any real multi-file table at scale), so
    * production plans are unchanged. Row content is untouched and the
    * assignment is deterministic (Spark sorts before round-robin
    * repartition, SPARK-23207). Call on scan-stage frames only: the
    * partition probe plans the frame, and a frame with exchanges below
    * would materialize AQE stages at construction. */
  def fanOut(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val p = df.rdd.getNumPartitions
    if (p > 0 && p < sc.defaultParallelism) df.repartition(sc.defaultParallelism)
    else df
  }
}
