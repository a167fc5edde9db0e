package graft

import org.apache.spark.sql.SparkSession

/** Registration for graft's custom Catalyst expressions, making them
  * callable from SQL and `expr()` — the analogue of the reference's
  * function catalog (BuiltInFunctionDefinitions.java registration).
  */
package object functions {

  /** TEMPORAL_OVERLAPS(s1, e1, s2, e2): do [s1,e1) and [s2,e2) overlap —
    * reference BuiltInFunctionDefinitions TEMPORAL_OVERLAPS, expanded to
    * a boolean expression (SURVEY.md §2.7). */
  def temporalOverlaps(s1: org.apache.spark.sql.Column,
      e1: org.apache.spark.sql.Column, s2: org.apache.spark.sql.Column,
      e2: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    s1 < e2 && s2 < e1

  /** Idempotently register all graft SQL functions on a session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("split_index",
      exprs => SplitIndex(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      exprs => MinHashSig(exprs.head, 3, 32), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64Expr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("winnow_fingerprint",
      exprs => WinnowFingerprint(exprs.head, 5, 4), "built-in")
    reg.createOrReplaceTempFunction("json_value",
      exprs => JsonValue(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("json_query",
      exprs => JsonQuery(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("json_exists",
      exprs => JsonExists(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("ngrams",
      exprs => NGrams(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int]), "built-in")
    spark.udf.register("weighted_avg",
      org.apache.spark.sql.functions.udaf(new Aggregators.WeightedAvg))
  }
}
