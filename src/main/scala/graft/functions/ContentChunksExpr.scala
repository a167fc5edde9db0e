package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** CONTENT_CHUNKS(text) — content-defined chunking: split where a
  * rolling polynomial hash of the trailing `window` characters hits
  * 0 mod `divisor` (the Rabin-fingerprint boundary rule of LBFS /
  * Muthitacharoen et al. 2001, the basis of CDC dedup in storage
  * systems and chunk-level corpus dedup). Unlike fixed-size chunking,
  * boundaries are a pure function of LOCAL content, so an insertion
  * shifts only its own chunk — neighboring chunks still dedup.
  *
  * This is the PURE rule (no min/max chunk clamps): every boundary
  * decision is positional — h(i) depends only on chars i-w+1..i — so
  * a SQL oracle can recompute every boundary set-based (no sequential
  * state), which the clamped variant would break (a clamp makes cut
  * eligibility depend on the previous cut). Documented delta: clamps
  * are a one-line filter a production caller can add at the cost of
  * oracle replayability.
  *
  * Arithmetic is exact integer: h(i) = Σ code(c) * B^k mod M with
  * M ~ 2^20 prime, so terms and sums stay far under 2^63 on any
  * engine. Characters are UTF-16 units (= codepoints on the BMP; the
  * corpus is ASCII — mirrors DuckDB's unicode() per char). Zero
  * shuffle; embarrassingly parallel.
  */
case class ContentChunks(child: Expression, window: Int, base: Long,
    mod: Long, divisor: Long)
    extends UnaryExpression with CodegenFallback {

  // pows(k) = base^k mod mod; oldest window char takes the highest power
  @transient private lazy val pows: Array[Long] = {
    val a = new Array[Long](window)
    a(0) = 1L
    var k = 1
    while (k < window) { a(k) = a(k - 1) * base % mod; k += 1 }
    a
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "content_chunks"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (n > 0) {
      var start = 0
      var i = window // 1-based boundary position candidate
      while (i <= n) {
        var h = 0L
        var j = 0
        while (j < window) { // char at 0-based i - window + j
          h += s.charAt(i - window + j).toLong * pows(window - 1 - j)
          j += 1
        }
        if (h % mod % divisor == 0L && i > start) {
          out += UTF8String.fromString(s.substring(start, i))
          start = i
        }
        i += 1
      }
      if (start < n) out += UTF8String.fromString(s.substring(start))
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
