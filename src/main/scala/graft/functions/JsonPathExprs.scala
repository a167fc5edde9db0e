package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL/JSON path functions with strict/lax modes — reference:
  * JSON_EXISTS / JSON_VALUE / JSON_QUERY in
  * BuiltInFunctionDefinitions.java; SURVEY.md §2.7 marks these as the
  * one scalar family needing a custom Expression (Spark's
  * get_json_object is lax-only and non-standard on errors).
  *
  * Path subset: `$`, `.field`, `[index]` chains, with an optional
  * `strict ` / `lax ` prefix (lax is the default, per the SQL spec).
  * Lax mode: structural errors (missing member, index out of range,
  * stepping into a scalar) yield NULL (for VALUE/QUERY) or false
  * (EXISTS). Strict mode: structural errors also yield NULL/false here —
  * Flink's default error clause is NULL ON ERROR / FALSE ON ERROR — but
  * strict does NOT unwrap arrays the way lax does.
  */
object JsonPath {

  sealed trait Step
  final case class Field(name: String) extends Step
  final case class Index(i: Int) extends Step

  final case class Parsed(strict: Boolean, steps: List[Step])

  def parse(path: String): Parsed = {
    var p = path.trim
    var strict = false
    if (p.toLowerCase.startsWith("strict ")) { strict = true; p = p.substring(7).trim }
    else if (p.toLowerCase.startsWith("lax ")) { p = p.substring(4).trim }
    require(p.startsWith("$"), s"JSON path must start with $$: $path")
    p = p.substring(1)
    val steps = scala.collection.mutable.ListBuffer.empty[Step]
    val it = p
    var i = 0
    while (i < it.length) {
      it.charAt(i) match {
        case '.' =>
          val end0 = it.indexWhere(c => c == '.' || c == '[', i + 1)
          val end = if (end0 < 0) it.length else end0
          steps += Field(it.substring(i + 1, end))
          i = end
        case '[' =>
          val end = it.indexOf(']', i)
          require(end > 0, s"unclosed [ in $path")
          steps += Index(it.substring(i + 1, end).trim.toInt)
          i = end + 1
        case c => throw new IllegalArgumentException(s"bad path char $c in $path")
      }
    }
    Parsed(strict, steps.toList)
  }

  /** Walk the path; None on any structural error. In lax mode a path
    * step into an array of size 1 unwraps the element (SQL lax
    * auto-unnesting, single-element case). */
  def eval(root: JsonNode, parsed: Parsed): Option[JsonNode] = {
    var cur = root
    for (step <- parsed.steps) {
      step match {
        case Field(f) =>
          var node = cur
          if (!parsed.strict && node.isArray && node.size() == 1)
            node = node.get(0) // lax auto-unwrap
          if (node == null || !node.isObject || !node.has(f)) return None
          cur = node.get(f)
        case Index(ix) =>
          if (cur == null || !cur.isArray || ix < 0 || ix >= cur.size())
            return None
          cur = cur.get(ix)
      }
    }
    Option(cur).filterNot(_.isMissingNode)
  }
}

sealed abstract class JsonPathExpression extends BinaryExpression
    with CodegenFallback {
  @transient protected lazy val mapper = new ObjectMapper()
  @transient protected lazy val parsedPath: JsonPath.Parsed =
    JsonPath.parse(right.eval(null).asInstanceOf[UTF8String].toString)

  protected def resolve(json: Any): Option[JsonNode] = {
    val node =
      try mapper.readTree(json.asInstanceOf[UTF8String].toString)
      catch { case _: Exception => null }
    if (node == null) None else JsonPath.eval(node, parsedPath)
  }
}

/** json_value(json, path): scalar result as string; NULL for missing
  * paths or non-scalar results (NULL ON ERROR semantics). */
case class JsonValue(left: Expression, right: Expression)
    extends JsonPathExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_value"
  override protected def nullSafeEval(json: Any, path: Any): Any =
    resolve(json) match {
      case Some(n) if n.isValueNode && !n.isNull =>
        UTF8String.fromString(n.asText())
      case _ => null
    }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** json_query(json, path): JSON fragment (object/array) as text; NULL
  * for scalars or missing paths (WITHOUT WRAPPER, NULL ON ERROR). */
case class JsonQuery(left: Expression, right: Expression)
    extends JsonPathExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_query"
  override protected def nullSafeEval(json: Any, path: Any): Any =
    resolve(json) match {
      case Some(n) if n.isContainerNode => UTF8String.fromString(n.toString)
      case _ => null
    }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** json_exists(json, path): does the path resolve (FALSE ON ERROR). */
case class JsonExists(left: Expression, right: Expression)
    extends JsonPathExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "json_exists"
  override protected def nullSafeEval(json: Any, path: Any): Any =
    java.lang.Boolean.valueOf(resolve(json).isDefined)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
