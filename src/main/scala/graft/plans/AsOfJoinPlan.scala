package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** As-of join as a first-class physical operator — the layer-(c) path
  * from SURVEY.md §7.1: custom LogicalPlan + SparkStrategy + SparkPlan.
  * Reference: TemporalRowTimeJoinOperator.java:78 (event-time temporal
  * join) and BatchExecSortMergeJoin's merge machinery.
  *
  * Semantics: for each left row, attach the single latest right row with
  * the same key and right.ts <= left.ts (backward, inclusive), or nulls.
  *
  * Execution: both children are hash-distributed on the key and sorted
  * by (key, ts) — Catalyst's EnsureRequirements inserts the exchanges /
  * sorts — then one streaming merge pass per partition keeps O(1) state
  * (the current candidate). Versus the union+window formulation this
  * avoids row widening, null-padding and the window buffer; versus a
  * range join it never materializes the per-key cross product. At 100 TB
  * it is one co-partitioned shuffle per side and a linear merge.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    rightVals: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.withNullability(true))
  // keys/timestamps must survive column pruning even when the parent
  // only selects a subset of rightVals
  override def references: AttributeSet =
    AttributeSet(Seq(leftKey, rightKey, leftTs, rightTs) ++ rightVals)
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): LogicalPlan = copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, rv) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, rv) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    rightVals: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable expression metadata; code-generated
    // projections are built per partition on the executor
    val lOut = left.output
    val rOut = right.output
    val (lk, rk, lts, rts, rv) = (leftKey, rightKey, leftTs, rightTs, rightVals)
    val out = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rOut)
      val lTsProj = UnsafeProjection.create(Seq(lts), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rts), rOut)
      val rValProj = UnsafeProjection.create(rv, rOut)
      val keyOrdering = RowOrdering.create(
        Seq(SortOrder(BoundReference(0, lk.dataType, lk.nullable),
          Ascending)), Seq.empty)
      val nullRightRow = new GenericInternalRow(rv.length)
      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val outProj = UnsafeProjection.create(out, out)
        private var rRow: InternalRow = _        // lookahead right row
        private var rKey: UnsafeRow = _
        private var rTs: Long = _
        private var rValid = false
        private var candVals: UnsafeRow = _      // latest right <= ts, projected
        private var candKey: UnsafeRow = _
        // Null keys/timestamps never match (SQL join semantics; the
        // reference temporal join likewise drops null-keyed builds) —
        // skip them on the right, null-pad on the left. Safe w.r.t. the
        // merge order: nulls sort first, so the right cursor has not
        // passed any valid key when a null-keyed left row is emitted.
        private def advanceRight(): Unit = {
          rValid = false
          while (!rValid && rIter.hasNext) {
            rRow = rIter.next()
            val k = rKeyProj(rRow)
            val t = rTsProj(rRow)
            if (!k.anyNull && !t.anyNull) {
              rKey = k.copy()
              rTs = t.getLong(0)
              rValid = true
            }
          }
        }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTsRow = lTsProj(lRow)
          if (lKey.anyNull || lTsRow.anyNull) {
            return outProj(joined(lRow, nullRightRow))
          }
          val lTsV = lTsRow.getLong(0)
          // drop candidate from a previous key
          if (candKey != null && keyOrdering.compare(candKey, lKey) != 0) {
            candKey = null; candVals = null
          }
          // consume right rows with key < lKey, or key == lKey && ts <= lTs
          var cont = rValid
          while (cont) {
            val c = keyOrdering.compare(rKey, lKey)
            if (c < 0) advanceRight()
            else if (c == 0 && rTs <= lTsV) {
              candKey = rKey
              candVals = rValProj(rRow).copy()
              advanceRight()
            } else cont = false
            cont = cont && rValid
          }
          val rv: InternalRow =
            if (candVals != null && candKey != null &&
              keyOrdering.compare(candKey, lKey) == 0) candVals
            else nullRightRow
          outProj(joined(lRow, rv))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): SparkPlan = copy(left = l, right = r)
}

/** User-facing API for the planned as-of join. */
object PlannedAsOfJoin {

  /** Backward (inclusive) as-of join on a shared key/timestamp column
    * name; `rightVals` are carried from the right side. */
  def asOf(leftDf: DataFrame, rightDf: DataFrame, key: String, ts: String,
      rightVals: Seq[String]): DataFrame =
    asOf(leftDf, rightDf, key, key, ts, ts, rightVals)

  /** General form with distinct column names per side (the SQL
    * `FOR SYSTEM_TIME AS OF` surface needs this). Registers the strategy
    * on the session (idempotent). */
  def asOf(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      rightVals: Seq[String]): DataFrame = {
    val spark: SparkSession = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = ColumnBridge.analyzedPlan(leftDf)
    // re-alias the right side so its attribute ids can never collide
    // with the left's (both sides often derive from the same base
    // DataFrame; ambiguous ids would let the optimizer collapse the
    // right key/ts onto the left's and mis-prune the right child)
    val rPlanRaw = ColumnBridge.analyzedPlan(rightDf)
    val rPlan: LogicalPlan = org.apache.spark.sql.catalyst.plans.logical.Project(
      rPlanRaw.output.map(a => Alias(a, a.name)()), rPlanRaw)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n"))
    val plan = AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTs), attr(rPlan, rightTs),
      rightVals.map(attr(rPlan, _)))
    ColumnBridge.ofRows(spark, plan)
  }
}
