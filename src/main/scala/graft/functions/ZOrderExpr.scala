package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{DataType, LongType}

/** z_order(c0, c1, ...): Morton / Z-order interleave of the low `bits`
  * bits of each (long) input — bit i of column c lands at output bit
  * i * numCols + c. Sorting by this value clusters rows that are close
  * in EVERY input dimension, which is what makes parquet min/max
  * row-group stats selective for filters on ANY subset of the
  * dimensions — the standard lakehouse data-layout optimization
  * (public: Morton 1966; Z-order clustering as in Databricks
  * OPTIMIZE ZORDER BY / Iceberg sort orders).
  *
  * Inputs are masked to their low `bits` bits, so callers normalize the
  * domain first (e.g. scale/offset to non-negative, or bucket by range
  * rank). numCols * bits must stay within the 63 usable sign-free bits.
  *
  * Real codegen: the layout pass touches every row of a 100 TB table,
  * so the interleave must stay inside the whole-stage compiled loop.
  */
case class ZOrder64(children: Seq[Expression], bits: Int)
    extends Expression {

  require(children.nonEmpty, "z_order needs at least one column")
  require(bits > 0 && children.size * bits <= 63,
    s"numCols * bits must be in (0, 63], got ${children.size} * $bits")

  // callers (Layout.zorder) cast inputs to long; no ExpectsInputTypes —
  // that trait's AbstractDataType is private[sql] in Spark 4
  override def dataType: DataType = LongType
  override def prettyName: String = "z_order"
  override def nullable: Boolean = children.exists(_.nullable)

  private val mask = (1L << bits) - 1
  private val nc = children.size

  override def eval(input: InternalRow): Any = {
    var z = 0L
    var c = 0
    while (c < nc) {
      val v = children(c).eval(input)
      if (v == null) return null
      val x = v.asInstanceOf[Long] & mask
      var i = 0
      while (i < bits) {
        z |= ((x >>> i) & 1L) << (i * nc + c)
        i += 1
      }
      c += 1
    }
    java.lang.Long.valueOf(z)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val z = ctx.freshName("z")
    val x = ctx.freshName("x")
    val i = ctx.freshName("i")
    val interleave = evals.zipWithIndex.map { case (e, c) =>
      val nullCheck =
        if (children(c).nullable)
          s"if (${e.isNull}) { ${ev.isNull} = true; }"
        else ""
      s"""
        ${e.code}
        $nullCheck
        if (!${ev.isNull}) {
          long $x$c = ((long) ${e.value}) & ${mask}L;
          for (int $i = 0; $i < $bits; $i++) {
            $z |= (($x$c >>> $i) & 1L) << ($i * $nc + $c);
          }
        }
      """
    }.mkString("\n")
    ev.copy(code = code"""
      boolean ${ev.isNull} = false;
      long $z = 0L;
      $interleave
      long ${ev.value} = $z;
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
