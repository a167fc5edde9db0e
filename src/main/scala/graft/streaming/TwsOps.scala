package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig, ValueState}

/** Operators on Spark 4's `transformWithState` (StatefulProcessor) —
  * the direct analogue of the reference's keyed state primitives
  * (ValueStateDescriptor/ListStateDescriptor/MapStateDescriptor +
  * StateTtlConfig, flink-core/.../api/common/state/; SURVEY.md §1.1).
  * Requires the RocksDB state store provider.
  *
  * The flatMapGroupsWithState versions in [[StatefulOps]] remain the
  * default (they run on any state store); these demonstrate the
  * state-primitive API with store-native TTL.
  */
object TwsOps {

  /** Keep-last dedup as a StatefulProcessor with ValueState + TTL. */
  class KeepLastProcessor[K, T](seqFn: T => Long, ttl: TTLConfig)(
      implicit tEnc: Encoder[(Long, T)])
      extends StatefulProcessor[K, T, T] {
    @transient private var last: ValueState[(Long, T)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[(Long, T)]("last", tEnc, ttl)

    override def handleInputRows(key: K, rows: Iterator[T],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[T] = {
      val prev = Option(last.get())
      var cur = prev
      rows.foreach { r =>
        val s = seqFn(r)
        if (cur.isEmpty || s >= cur.get._1) cur = Some((s, r))
      }
      cur match {
        case Some(c) if prev != cur =>
          last.update(c)
          Iterator.single(c._2)
        case _ => Iterator.empty
      }
    }
  }

  /** Keep-last dedup via transformWithState. Set
    * spark.sql.streaming.stateStore.providerClass to the RocksDB
    * provider before starting the query. */
  def keepLastTws[K, T](ds: Dataset[T], keyFn: T => K, seqFn: T => Long,
      ttl: TTLConfig = TTLConfig.NONE)(
      implicit kEnc: Encoder[K], tEnc: Encoder[T],
      stEnc: Encoder[(Long, T)]): Dataset[T] = {
    ds.groupByKey(keyFn)
      .transformWithState(new KeepLastProcessor[K, T](seqFn, ttl),
        TimeMode.None(), OutputMode.Update())
  }
}
