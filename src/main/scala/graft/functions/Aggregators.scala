package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregate functions — reference: the UDAGG surface
  * (AggregateFunction.java: createAccumulator / accumulate / retract /
  * merge / getValue, §2.9), with WeightedAvg being the reference docs'
  * canonical example. Spark's `Aggregator[IN, BUF, OUT]` is the direct
  * analogue: zero=createAccumulator, reduce=accumulate, merge=merge,
  * finish=getValue. `retract` has no Spark equivalent (needed only for
  * changelog-consuming aggregates — SURVEY.md §7.4 documents the delta).
  *
  * Buffers use BigDecimal so partial sums are exact and associative —
  * merge order (which Spark doesn't guarantee) cannot change the result.
  */
object Aggregators {

  /** Weighted average: sum(v*w)/sum(w), exact decimal accumulation. */
  class WeightedAvg extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {
    override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))
    override def reduce(b: (BigDecimal, BigDecimal), a: (Double, Double)): (BigDecimal, BigDecimal) = {
      val v = BigDecimal(a._1).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      val w = BigDecimal(a._2).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      (b._1 + v * w, b._2 + w)
    }
    override def merge(x: (BigDecimal, BigDecimal), y: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(b: (BigDecimal, BigDecimal)): Double =
      if (b._2 == 0) Double.NaN else b._1.toDouble / b._2.toDouble
    override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(BigDecimal, BigDecimal)]()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** COLLECT aggregate → MULTISET, carried as the count-map convention
    * (SURVEY §1.2: MULTISET<T> ≡ MAP<T, INT>) — reference:
    * BuiltInFunctionDefinitions.COLLECT and LogicalTypeRoot.java:53-141
    * (MULTISET). Nulls are skipped, like the reference aggregate. The
    * buffer cardinality is the group's DISTINCT element count, so
    * memory stays bounded by the value domain, not the row count. */
  class CollectMultiset extends Aggregator[String, Map[String, Int], Map[String, Int]] {
    override def zero: Map[String, Int] = Map.empty
    override def reduce(m: Map[String, Int], e: String): Map[String, Int] =
      if (e == null) m else m.updated(e, m.getOrElse(e, 0) + 1)
    override def merge(x: Map[String, Int], y: Map[String, Int]): Map[String, Int] = {
      val (big, small) = if (x.size >= y.size) (x, y) else (y, x)
      small.foldLeft(big) { case (m, (k, v)) =>
        m.updated(k, m.getOrElse(k, 0) + v)
      }
    }
    override def finish(b: Map[String, Int]): Map[String, Int] = b
    override def bufferEncoder: Encoder[Map[String, Int]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Map[String, Int]]()
    override def outputEncoder: Encoder[Map[String, Int]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Map[String, Int]]()
  }

  /** First non-null value by an explicit order key (reference
    * FIRST_VALUE with ignore-nulls). */
  class FirstValueByOrder extends Aggregator[(Long, String), (Long, String), String] {
    override def zero: (Long, String) = (Long.MaxValue, null)
    override def reduce(b: (Long, String), a: (Long, String)): (Long, String) =
      if (a._2 != null && a._1 < b._1) a else b
    override def merge(x: (Long, String), y: (Long, String)): (Long, String) =
      if (x._1 <= y._1) x else y
    override def finish(b: (Long, String)): String = b._2
    override def bufferEncoder: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }
}
