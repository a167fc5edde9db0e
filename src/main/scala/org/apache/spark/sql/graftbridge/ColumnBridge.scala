package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the classic Column <-> Expression converters, which are
  * private[sql] in Spark 4 — the sanctioned pattern for libraries that
  * define custom Catalyst expressions and expose them as Columns.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly converts a Column's node tree to catalyst expressions
    * (UnresolvedFunction et al.), unlike `expression` whose lazy
    * ColumnNodeExpression wrapper only resolves through the Dataset
    * analysis path. Needed when a composed Column is returned from a
    * FunctionRegistry builder: the analyzer resolves the returned
    * catalyst tree by fixpoint, but never looks inside the lazy
    * wrapper. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Analyzed logical plan of a DataFrame (private[sql] surface). */
  def analyzedPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Build a DataFrame from a logical plan (Dataset.ofRows). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The persisted RDD backing a localCheckpoint'd DataFrame (its plan
    * is a LogicalRDD leaf) — the precise unpersist handle
    * Dataset.localCheckpoint does not expose. None for any other plan
    * shape. */
  def backingRdd(df: org.apache.spark.sql.DataFrame)
      : Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
      case _ => None
    }
}
