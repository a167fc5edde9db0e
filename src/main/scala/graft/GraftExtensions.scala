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
    import org.apache.spark.sql.AnalysisException
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
    import org.apache.spark.sql.types.IntegerType
    def info(name: String) =
      new ExpressionInfo("graft", name)
    def arityErr(name: String, msg: String): Nothing =
      throw new AnalysisException(
        errorClass = "INTERNAL_ERROR",
        messageParameters = Map("message" -> s"$name: $msg"))
    // extra parameters must be foldable ints — a silently-ignored argument
    // would return results for different hash parameters than requested
    def intArg(name: String, e: Expression): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case _ => arityErr(name, s"parameter must be an INT literal, got $e")
    }
    ext.injectFunction((FunctionIdentifier("split_index"), info("split_index"),
      (exprs: Seq[Expression]) =>
        if (exprs.length == 3) functions.SplitIndex(exprs(0), exprs(1), exprs(2))
        else arityErr("split_index", s"expects 3 arguments, got ${exprs.length}")))
    ext.injectFunction((FunctionIdentifier("minhash_sig"), info("minhash_sig"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(t) => functions.MinHashSig(t, 3, 32)
        case Seq(t, n, h) => functions.MinHashSig(t,
          intArg("minhash_sig", n), intArg("minhash_sig", h))
        case _ => arityErr("minhash_sig",
          s"expects (text) or (text, ngram INT, numHashes INT), got ${exprs.length} args")
      }))
    ext.injectFunction((FunctionIdentifier("simhash64"), info("simhash64"),
      (exprs: Seq[Expression]) =>
        if (exprs.length == 1) functions.SimHash64Expr(exprs.head)
        else arityErr("simhash64", s"expects 1 argument, got ${exprs.length}")))
    ext.injectFunction((FunctionIdentifier("winnow_fingerprint"),
      info("winnow_fingerprint"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(t) => functions.WinnowFingerprint(t, 5, 4)
        case Seq(t, k, w) => functions.WinnowFingerprint(t,
          intArg("winnow_fingerprint", k), intArg("winnow_fingerprint", w))
        case _ => arityErr("winnow_fingerprint",
          s"expects (text) or (text, k INT, w INT), got ${exprs.length} args")
      }))
  }
}
