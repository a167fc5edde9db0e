package graft.functions

import java.util.Locale

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** term_stats(text, terms): ONE whitespace-tokenization pass producing
  * the document length and each query term's frequency —
  * struct(dl double, tf array&lt;double&gt;) — for BM25-style scoring
  * (graft.operators.Relevance.bm25TopK).
  *
  * Replaces the declarative formulation
  * `size(filter(words(text), _ === term))` per term: CollapseProject
  * inlines the `words(text)` alias into every term's filter lambda, so
  * n terms cost n+1 interpreted regexp tokenizations per row (the
  * round-3 HOF lesson). Here the text is scanned once and each token
  * does one hash-map probe. Duplicate subtrees left behind by
  * CollapseProject (one GetStructField per output column) collapse back
  * to a single evaluation via Spark's subexpression elimination — the
  * same mechanism `from_json` relies on.
  *
  * Tokenization matches `regexp_extract_all(lower(text), "\\S+")`:
  * Java-regex whitespace [ \t\n\x0B\f\r] as delimiters, tokens
  * lowercased with Locale.ROOT (ASCII-equivalent for the ASCII query
  * terms BM25 is called with; a tr/az default locale would otherwise
  * fold 'I' differently — see TextDedup.normalizedHashString).
  */
case class TermStats(child: Expression, terms: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("dl", DoubleType, nullable = false),
    StructField("tf", ArrayType(DoubleType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "term_stats"

  @transient private lazy val termIdx: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    terms.zipWithIndex.foreach { case (t, i) => m.put(t, Integer.valueOf(i)) }
    m
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val tf = new Array[Double](terms.length)
    var dl = 0
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(s.charAt(i))) i += 1
        dl += 1
        val idx = termIdx.get(s.substring(start, i).toLowerCase(Locale.ROOT))
        if (idx != null) tf(idx.intValue) += 1.0
      }
    }
    InternalRow(dl.toDouble, new GenericArrayData(tf))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
