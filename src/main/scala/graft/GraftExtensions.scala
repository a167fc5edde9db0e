package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: injects graft's custom Catalyst
  * functions into every session built with
  * `.withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=graft.GraftExtensions` — the Spark analogue of
  * the reference's module/function-catalog registration
  * (BuiltInFunctionDefinitions.java + FlinkSqlOperatorTable.java).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    def info(name: String) =
      new ExpressionInfo("graft", name)
    ext.injectFunction((FunctionIdentifier("split_index"), info("split_index"),
      (exprs: Seq[Expression]) =>
        functions.SplitIndex(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"), info("minhash_sig"),
      (exprs: Seq[Expression]) => functions.MinHashSig(exprs.head, 3, 32)))
    ext.injectFunction((FunctionIdentifier("simhash64"), info("simhash64"),
      (exprs: Seq[Expression]) => functions.SimHash64Expr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("winnow_fingerprint"),
      info("winnow_fingerprint"),
      (exprs: Seq[Expression]) => functions.WinnowFingerprint(exprs.head, 5, 4)))
  }
}
