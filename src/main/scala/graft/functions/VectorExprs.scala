package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector kernels for the similarity-search operators. The
  * zip_with/aggregate formulations are interpreted per element; these
  * run one compiled loop per row over the primitive float arrays —
  * the ANN signature/scan stage is pure map-side CPU at corpus scale.
  *
  * Accumulation is double, in index order — bit-identical to the HOF
  * formulation and to engines that sum in array order, which keeps the
  * DuckDB oracle comparison exact.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** srp_bucket(vec): sign-random-projection bucket id — `planes` sign
  * bits of deterministic pseudo-random hyperplane projections packed
  * into a long (Charikar 2002). One pass over the vector computes every
  * plane's dot product simultaneously. */
case class SrpBucket(child: Expression, dim: Int, planes: Int, seed: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "srp_bucket"

  // SplitMix64 finalizer — full-avalanche, so (seed, plane, dim) triples
  // can't collide by linear combination (a linear p*K+d scheme would make
  // plane p dim d>=K alias plane p+1 dim d-K for realistic dims like 1536).
  private def mix64(v: Long): Long = {
    var z = v * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // plane-major weight matrix, deterministic (SplitMix64)
  @transient private lazy val weights: Array[Array[Double]] =
    Array.tabulate(planes, dim) { (p, d) =>
      val z = mix64(mix64(seed.toLong) ^ mix64((p.toLong << 32) | d.toLong))
      ((z >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val dots = new Array[Double](planes)
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      var p = 0
      while (p < planes) { dots(p) += x * weights(p)(i); p += 1 }
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < planes) {
      if (dots(p) > 0) bucket |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(bucket)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
