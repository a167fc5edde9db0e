package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: injects graft's custom Catalyst
  * functions into every session built with
  * `.withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=graft.GraftExtensions` — the Spark analogue of
  * the reference's module/function-catalog registration
  * (BuiltInFunctionDefinitions.java + FlinkSqlOperatorTable.java).
  * Builders (with arity/parameter validation) are shared with
  * `graft.functions.register`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), b))
    }
    // keyless-range-join bucketization (off until
    // spark.graft.rangejoin.bucketWidth is set)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
  }
}
