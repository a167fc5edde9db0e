package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fast single-pass text-hashing expressions for the corpus-dedup
  * operators. The declarative higher-order-function formulations (see
  * graft.operators.TextDedup) are semantically clean but evaluate
  * interpreted with per-element boxing — O(tokens × numHashes) boxed ops
  * per row. These native expressions do the same math in one compiled
  * JVM pass over primitive arrays: at 100 TB the signature stage is pure
  * map-side CPU, so per-row constant factors are the whole cost.
  *
  * Reference semantics: MinHash/LSH and SimHash as in Flink-ecosystem
  * dedup pipelines (no direct reference operator — SURVEY.md §7.3 item 8;
  * algorithms from Broder 1997 / Charikar 2002, public).
  */
object TextHash {

  val MersennePrime: Long = 2147483647L // 2^31 - 1

  private[functions] def mix64(x0: Long): Long = {
    var z = x0 * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def coef(seed: Long, n: Int): Array[Long] =
    Array.tabulate(n) { i =>
      (math.abs(mix64(seed + i + 1)) % (MersennePrime - 1)) + 1
    }

  /** 64-bit hash of a char range of a string (FNV-1a over chars). */
  private[functions] def hashChars(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Split on single spaces without regex; returns (starts, ends). */
  private[functions] def wordBounds(s: String): (Array[Int], Array[Int]) = {
    val starts = scala.collection.mutable.ArrayBuffer[Int](0)
    val ends = scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') { ends += i; starts += i + 1 }
      i += 1
    }
    ends += s.length
    (starts.toArray, ends.toArray)
  }
}

/** minhash_sig(text): Array[Long] of `numHashes` MinHash values over
  * word n-gram shingles. One pass: word hashes, rolling n-gram combine,
  * k permutations tracked in a primitive min array. */
case class MinHashSig(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  import TextHash._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val as: Array[Long] = coef(0x5eed5eedL, numHashes)
  @transient private lazy val bs: Array[Long] = coef(0xc0ffee42L, numHashes)

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val (starts, ends) = wordBounds(s)
    val nWords = starts.length
    // word hashes folded to [0, p)
    val wh = new Array[Long](nWords)
    var i = 0
    while (i < nWords) {
      val h = hashChars(s, starts(i), ends(i))
      wh(i) = ((h % MersennePrime) + MersennePrime) % MersennePrime
      i += 1
    }
    val nShingles = math.max(nWords - (n - 1), 1)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var g = 0
    while (g < nShingles) {
      // combine up to n word hashes into one 31-bit shingle hash
      var sh = 0L
      var j = 0
      while (j < n && g + j < nWords) {
        sh = (sh * 8191L + wh(g + j)) % MersennePrime
        j += 1
      }
      var k = 0
      while (k < numHashes) {
        val v = (as(k) * sh + bs(k)) % MersennePrime
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      g += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** word_gram_hashes(text, n): 64-bit hashes of the word n-grams of a
  * text — the shared kernel of exact-substring dedup, decontamination
  * and repetition scoring. Each gram hash is the mixed FNV-1a of the
  * exact source substring spanning the n words (separator included),
  * so equal hash <=> equal span string up to 64-bit collisions. One
  * compiled pass, no gram strings materialized — the declarative
  * split/slice/concat_ws formulation allocates O(tokens * n) string
  * data per row, which dominates a curation scan at corpus scale.
  * With `distinct`, returns the deduplicated (sorted) hash set. */
case class WordGramHashes(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with CodegenFallback {
  import TextHash._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_gram_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val (starts, ends) = wordBounds(s)
    val nWords = starts.length
    val nG = math.max(nWords - (n - 1), 1)
    val out = new Array[Long](nG)
    var g = 0
    while (g < nG) {
      val until = ends(math.min(g + n - 1, nWords - 1))
      out(g) = mix64(hashChars(s, starts(g), until))
      g += 1
    }
    if (!distinct) new GenericArrayData(out)
    else {
      java.util.Arrays.sort(out)
      var uniq = 0
      var i = 0
      while (i < nG) {
        if (i == 0 || out(i) != out(i - 1)) { out(uniq) = out(i); uniq += 1 }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** simhash64(text): 64-bit SimHash fingerprint (Charikar 2002) over
  * whitespace tokens, one compiled pass. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import TextHash._

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val (starts, ends) = wordBounds(s)
    val votes = new Array[Int](64)
    var i = 0
    while (i < starts.length) {
      val h = mix64(hashChars(s, starts(i), ends(i)))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** winnow_fingerprint(text, k, w): winnowing document fingerprint
  * (Schleimer et al. 2003): rolling char k-gram hashes, minimum of each
  * length-w window via monotonic deque — O(len) total — deduplicated
  * and sorted for determinism. */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  import TextHash._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val L = s.length
    val nGrams = math.max(L - (k - 1), 1)
    val grams = new Array[Long](nGrams)
    if (L < k) grams(0) = mix64(hashChars(s, 0, L))
    else {
      var i = 0
      while (i < nGrams) { grams(i) = mix64(hashChars(s, i, i + k)); i += 1 }
    }
    val out = new java.util.TreeSet[java.lang.Long]()
    // monotonic deque of indices, increasing hash values
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < nGrams) {
      while (tail > head && grams(deque(tail - 1)) >= grams(i)) tail -= 1
      deque(tail) = i; tail += 1
      val windowStart = i - w + 1
      while (deque(head) < windowStart) head += 1
      if (windowStart >= 0 || i == nGrams - 1) out.add(grams(deque(head)))
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
