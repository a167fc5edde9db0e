package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator demonstration: a Spark-native query over the
  * driver's test tables plus, where SQL-expressible, an equivalent DuckDB
  * oracle query. Queries without an oracle get a weaker rows-only check
  * from the driver (used for ops whose semantics DuckDB cannot replicate,
  * e.g. MinHash-LSH dedup).
  *
  * @param bench whether Bench.scala times this query at sf0.1 (exclude
  *              quadratic demos that only make sense at tiny SF).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = true)
