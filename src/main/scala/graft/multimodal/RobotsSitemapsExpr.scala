package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots_sitemaps(robots_txt): the `Sitemap:` directives of a
  * robots.txt file, in document order — the link between the
  * compliance gate ([[RobotsCheckExpr]]) and the discovery inventory
  * ([[SitemapEntriesExpr]]): robots.txt names the sitemaps, the
  * sitemaps name the URLs. Per RFC 9309 §2.2.4 / sitemaps.org the
  * directive is FILE-scoped (independent of user-agent groups, so it
  * is a separate expression rather than a robots_check field) and its
  * value is an absolute URL taken verbatim (trimmed, '#' comments
  * stripped — the robots.txt line discipline [[RobotsCheckExpr]]
  * applies). Case-insensitive key match; duplicate URLs deduplicated
  * keeping first occurrence; an empty or sitemap-less file yields an
  * empty array (not NULL — absence of the directive is a valid
  * parse). Never throws.
  *
  * Scale shape: per-row map-side parse, zero shuffle; one robots.txt
  * per host, dictionary-encoded at scan like the robots_check input. */
case class RobotsSitemapsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "robots_sitemaps"

  override protected def nullSafeEval(input: Any): Any = {
    try {
      val txt = input.asInstanceOf[UTF8String].toString
      val seen = scala.collection.mutable.LinkedHashSet[String]()
      for (raw <- txt.linesIterator) {
        val line = raw.takeWhile(_ != '#').trim
        val colon = line.indexOf(':')
        if (colon > 0 &&
            line.substring(0, colon).trim.equalsIgnoreCase("sitemap")) {
          val value = line.substring(colon + 1).trim
          if (value.nonEmpty) seen += value
        }
      }
      new GenericArrayData(
        seen.toArray.map(s => UTF8String.fromString(s): Any))
    } catch { case _: Exception => new GenericArrayData(Array.empty[Any]) }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
