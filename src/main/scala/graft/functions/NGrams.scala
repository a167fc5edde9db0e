package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ngrams(text, n) — a custom table function (UDTF): emits one row per
  * word n-gram of `text`. Reference: the TableFunction surface
  * (flink-table-common/.../functions/TableFunction.java, §2.9) whose
  * Spark-native mapping is a Catalyst `Generator` usable in
  * LATERAL VIEW / SELECT generator position.
  */
case class NGrams(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    new StructType().add("ngram", StringType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val words = v.asInstanceOf[UTF8String].toString.split(" ")
      if (words.length < n) Nil
      else (0 to words.length - n).map { i =>
        InternalRow(UTF8String.fromString(
          words.slice(i, i + n).mkString(" ")))
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
