package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SPLIT_INDEX(str, delim, index) — reference: Flink's SPLIT_INDEX
  * built-in (flink-table/flink-table-common/.../functions/
  * BuiltInFunctionDefinitions.java; runtime in flink-table-runtime
  * SqlFunctionUtils). Returns the 0-based `index` field of `str` split by
  * the literal delimiter, or NULL when out of range.
  *
  * Implemented as a native Catalyst expression WITH codegen (not a UDF):
  * participates in whole-stage codegen, so it can sit in a 100-TB scan
  * projection without breaking the codegen span.
  */
case class SplitIndex(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == StringType && second.dataType == StringType &&
      third.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"split_index expects (string, string, int), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "split_index"

  // splitSQL, not split: the delimiter is a LITERAL separator (Flink
  // semantics), not a regex — split() would make '.' or '|' split wrong.
  override protected def nullSafeEval(str: Any, delim: Any, idx: Any): Any = {
    val parts = str.asInstanceOf[UTF8String]
      .splitSQL(delim.asInstanceOf[UTF8String], -1)
    val i = idx.asInstanceOf[Int]
    if (i >= 0 && i < parts.length) parts(i) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (str, delim, idx) => {
      val parts = ctx.freshName("parts")
      s"""
        org.apache.spark.unsafe.types.UTF8String[] $parts =
          $str.splitSQL($delim, -1);
        if ($idx >= 0 && $idx < $parts.length) {
          ${ev.value} = $parts[$idx];
        } else {
          ${ev.isNull} = true;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
