package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
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
    extends BinaryExpression {

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

  // real codegen (not CodegenFallback): the ANN scan / near-dup verify
  // evaluates this once per candidate pair — the fallback's boxed path
  // would dominate; the generated loop keeps the whole-stage span intact
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = (double) $a.getFloat($i);
          double $yi = (double) $b.getFloat($i);
          $dot += $xi * $yi;
          $nx += $xi * $xi;
          $ny += $yi * $yi;
        }
        ${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny));
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** sorted_intersect_count(a, b): intersection size of two SORTED
  * ascending distinct int arrays — one merge pass per row, zero
  * allocation. This is the exact-verification kernel of
  * operators.SetSimJoin: the built-in array_intersect materializes a
  * hash set AND the intersection array per row, which dominated the
  * whole join at candidate volume (~5 s for 400k pairs vs ~0.3 s for
  * this merge loop). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Integer.valueOf(SortedIntersectCount.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SortedIntersectCount {
  def count(x: ArrayData, y: ArrayData): Int = {
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val a = x.getInt(i)
      val b = y.getInt(j)
      if (a == b) { c += 1; i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    c
  }
}

/** srp_bucket(vec): sign-random-projection bucket id — `planes` sign
  * bits of deterministic pseudo-random hyperplane projections packed
  * into a long (Charikar 2002). One pass over the vector computes every
  * plane's dot product simultaneously. */
case class SrpBucket(child: Expression, dim: Int, planes: Int, seed: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "srp_bucket"

  // plane-major weight matrix, deterministic (SplitMix64)
  @transient private lazy val weights: Array[Array[Double]] =
    SrpBucket.weights(dim, planes, seed)

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

object SrpBucket {
  // SplitMix64 finalizer — full-avalanche, so (seed, plane, dim) triples
  // can't collide by linear combination (a linear p*K+d scheme would make
  // plane p dim d>=K alias plane p+1 dim d-K for realistic dims like 1536).
  private def mix64(v: Long): Long = {
    var z = v * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The deterministic plane-major hyperplane matrix — public so oracle
    * replays can inline the exact weights (Double.toString round-trips). */
  def weights(dim: Int, planes: Int, seed: Int): Array[Array[Double]] =
    Array.tabulate(planes, dim) { (p, d) =>
      val z = mix64(mix64(seed.toLong) ^ mix64((p.toLong << 32) | d.toLong))
      ((z >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
}

/** nearest_centroid(vec): argmin over a driver-local centroid table by
  * squared L2 distance, ties broken by lowest cell index. The IVF coarse
  * quantizer's assignment step as a pure PROJECTION — the corpus is
  * scanned, never shuffled (the centroid table is nlist x dim, carried
  * in the serialized expression like a broadcast literal). */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Float]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  @transient private lazy val cs: Array[Array[Float]] =
    centroids.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      val cv = cs(c)
      val n = math.min(v.numElements(), cv.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val diff = v.getFloat(i).toDouble - cv(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    Integer.valueOf(best)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** pq_codes(vec): product-quantization codes — the vector is L2-
  * normalized ONCE, then each of the m subvectors maps to its nearest
  * subspace centroid (squared L2, ties to the lowest index). One
  * compiled pass, O(dim·k); the codebooks ([m][k][dim/m]) ride in the
  * serialized expression. The declarative slice+argmin formulation
  * evaluated the whole-vector norm aggregate once PER CENTROID after
  * projection collapse — this expression exists to make encode cost
  * O(dim·k), not O(dim²·k), per row. */
case class PqCodes(child: Expression, codebooks: Seq[Seq[Seq[Float]]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  @transient private lazy val cbs: Array[Array[Array[Float]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = cbs.length
    val ds = cbs(0)(0).length
    val n = v.numElements()
    var norm2 = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      norm2 += x * x
      i += 1
    }
    val inv = if (norm2 > 0) 1.0 / math.sqrt(norm2) else 0.0
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val sub = cbs(j)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < sub.length) {
        val cv = sub(c)
        var d = 0.0
        var t = 0
        while (t < ds) {
          val idx = j * ds + t
          val x = if (idx < n) v.getFloat(idx).toDouble * inv else 0.0
          val diff = x - cv(t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** adc_tables(qvec): the query-side ADC lookup tables — [m][k] inner
  * products of the (once-)normalized query subvectors with every
  * subspace centroid. Evaluated once per QUERY row on the broadcast
  * side; O(dim·k) compiled. */
case class AdcTables(child: Expression, codebooks: Seq[Seq[Seq[Float]]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "adc_tables"

  @transient private lazy val cbs: Array[Array[Array[Float]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = cbs.length
    val ds = cbs(0)(0).length
    val n = v.numElements()
    var norm2 = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      norm2 += x * x
      i += 1
    }
    val inv = if (norm2 > 0) 1.0 / math.sqrt(norm2) else 0.0
    val tables = new Array[ArrayData](m)
    var j = 0
    while (j < m) {
      val sub = cbs(j)
      val row = new Array[Double](sub.length)
      var c = 0
      while (c < sub.length) {
        val cv = sub(c)
        var dot = 0.0
        var t = 0
        while (t < ds) {
          val idx = j * ds + t
          val x = if (idx < n) v.getFloat(idx).toDouble * inv else 0.0
          dot += x * cv(t)
          t += 1
        }
        row(c) = dot
        c += 1
      }
      tables(j) = ArrayData.toArrayData(row)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      tables.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** pq_codes_residual(vec): the IVFADC index entry (Jégou et al. 2011
  * §A): L2-normalize once, assign the nearest COARSE centroid, then
  * PQ-encode the RESIDUAL (normalized vector − centroid) — residuals
  * are much tighter around zero than raw vectors, so the same codebook
  * budget quantizes them with far less error. One compiled pass,
  * O(dim·(nlist + k)); returns struct(cell INT, codes ARRAY<INT>). */
case class PqCodesResidual(child: Expression,
    coarse: Seq[Seq[Float]], codebooks: Seq[Seq[Seq[Float]]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "pq_codes_residual"

  @transient private lazy val cc: Array[Array[Float]] =
    coarse.map(_.toArray).toArray
  @transient private lazy val cbs: Array[Array[Array[Float]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val dim = cc(0).length
    // normalize once
    var norm2 = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      norm2 += x * x
      i += 1
    }
    val inv = if (norm2 > 0) 1.0 / math.sqrt(norm2) else 0.0
    val hat = new Array[Double](dim)
    i = 0
    while (i < math.min(n, dim)) {
      hat(i) = v.getFloat(i).toDouble * inv
      i += 1
    }
    // nearest coarse centroid
    var cell = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cc.length) {
      val cv = cc(c)
      var d = 0.0
      var t = 0
      while (t < dim) {
        val diff = hat(t) - cv(t)
        d += diff * diff
        t += 1
      }
      if (d < bestD) { bestD = d; cell = c }
      c += 1
    }
    // residual PQ codes
    val cv = cc(cell)
    val m = cbs.length
    val ds = cbs(0)(0).length
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val sub = cbs(j)
      var best = 0
      var bd = Double.MaxValue
      var k = 0
      while (k < sub.length) {
        val kv = sub(k)
        var d = 0.0
        var t = 0
        while (t < ds) {
          val idx = j * ds + t
          val diff = (hat(idx) - cv(idx)) - kv(t)
          d += diff * diff
          t += 1
        }
        if (d < bd) { bd = d; best = k }
        k += 1
      }
      out(j) = best
      j += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      Integer.valueOf(cell), ArrayData.toArrayData(out))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** sq8_encode(vec): int8 scalar quantization — per-vector symmetric
  * scale (max|x| / 127), values rounded into one byte each: a 4× storage
  * and scan-I/O reduction with ~0.4% worst-case per-component error.
  * The flat-SQ8 compressed index shape (as in FAISS
  * ScalarQuantizer, public). Returns struct(scale FLOAT, q BINARY). */
case class Sq8Encode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("scale", FloatType, nullable = false),
    StructField("q", BinaryType, nullable = false)))
  override def prettyName: String = "sq8_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var maxAbs = 0.0f
    var i = 0
    while (i < n) {
      val a = math.abs(v.getFloat(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = if (maxAbs > 0) maxAbs / 127f else 1f
    val out = new Array[Byte](n)
    i = 0
    while (i < n) {
      out(i) = math.max(-127, math.min(127,
        math.round(v.getFloat(i) / scale))).toByte
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      java.lang.Float.valueOf(scale), out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** sq8_dot(a, b): inner product of two sq8-encoded vectors —
  * scaleA·scaleB·Σ qa[i]·qb[i], the integer accumulation running over
  * raw bytes (one multiply-add per component, no float decode). */
case class Sq8Dot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq8_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ra = a.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    val rb = b.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    val qa = ra.getBinary(1)
    val qb = rb.getBinary(1)
    val n = math.min(qa.length, qb.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += qa(i).toLong * qb(i).toLong
      i += 1
    }
    java.lang.Double.valueOf(
      ra.getFloat(0).toDouble * rb.getFloat(0).toDouble * acc)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** adc_score(codes, tables): sum over subspaces of tables[j][codes[j]] —
  * the ADC approximate inner product, m lookups per (corpus, query)
  * pair. This is the hot per-pair kernel of PQ search; real codegen so
  * it stays inside the whole-stage span of the scoring scan. */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_score"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val tables = b.asInstanceOf[ArrayData]
    val m = math.min(codes.numElements(), tables.numElements())
    var s = 0.0
    var j = 0
    while (j < m) {
      s += tables.getArray(j).getDouble(codes.getInt(j))
      j += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      s"""
        int $m = Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $j = 0; $j < $m; $j++) {
          $s += $b.getArray($j).getDouble($a.getInt($j));
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** nearest_cells(vec): the `nprobe` nearest centroid cell ids, ascending
  * by squared L2 distance (ties by cell index) — the IVF query-side probe
  * list as a projection, replacing the crossJoin+window formulation. */
case class NearestCells(child: Expression, centroids: Seq[Seq[Float]],
    nprobe: Int) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  @transient private lazy val cs: Array[Array[Float]] =
    centroids.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dists = new Array[Double](cs.length)
    var c = 0
    while (c < cs.length) {
      val cv = cs(c)
      val n = math.min(v.numElements(), cv.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val diff = v.getFloat(i).toDouble - cv(i)
        d += diff * diff
        i += 1
      }
      dists(c) = d
      c += 1
    }
    val m = math.min(nprobe, cs.length)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](cs.length)
    var j = 0
    while (j < m) {
      var best = -1
      var bestD = Double.MaxValue
      var k = 0
      while (k < dists.length) {
        if (!taken(k) && dists(k) < bestD) { bestD = dists(k); best = k }
        k += 1
      }
      taken(best) = true
      out(j) = best
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
