package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Async I/O operator — reference: AsyncDataStream.orderedWait /
  * unorderedWait (flink-streaming-java/.../AsyncDataStream.java:115-307)
  * and AsyncWaitOperator. Overlaps up to `capacity` in-flight external
  * calls per partition while preserving (ordered mode) input order —
  * the sliding-window pipeline the reference implements with its
  * operator mailbox.
  *
  * Per the reference's docs (asyncio.md): ordered mode buffers results
  * until their predecessors complete; unordered emits on completion.
  * Here unordered still emits within the partition's iterator pull
  * cycle — micro-batch boundaries, not record boundaries, as always on
  * Spark.
  */
object AsyncIO {

  /** Ordered async map: up to `capacity` concurrent `asyncFn` calls in
    * flight per partition, results emitted in input order. */
  def orderedWait[T, O](ds: Dataset[T], capacity: Int, timeout: Duration)(
      asyncFn: (T, ExecutionContext) => Future[O])(
      implicit oEnc: Encoder[O]): Dataset[O] = {
    ds.mapPartitions { rows =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(capacity)
      // release threads even when the task fails mid-iteration
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val inflight = scala.collection.mutable.Queue.empty[Future[O]]
      new Iterator[O] {
        private def fill(): Unit =
          while (inflight.size < capacity && rows.hasNext)
            inflight.enqueue(asyncFn(rows.next(), ec))
        def hasNext: Boolean = {
          fill()
          val h = inflight.nonEmpty
          if (!h) pool.shutdown()
          h
        }
        def next(): O = {
          fill()
          Await.result(inflight.dequeue(), timeout)
        }
      }
    }
  }

  /** Unordered async map: emits whichever in-flight call completes
    * first within each pull cycle. */
  def unorderedWait[T, O](ds: Dataset[T], capacity: Int, timeout: Duration)(
      asyncFn: (T, ExecutionContext) => Future[O])(
      implicit oEnc: Encoder[O]): Dataset[O] = {
    ds.mapPartitions { rows =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(capacity)
      // release threads even when the task fails mid-iteration
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Future[O]]
      new Iterator[O] {
        private def fill(): Unit =
          while (buf.size < capacity && rows.hasNext)
            buf += asyncFn(rows.next(), ec)
        def hasNext: Boolean = {
          fill()
          val h = buf.nonEmpty
          if (!h) pool.shutdown()
          h
        }
        def next(): O = {
          fill()
          // take the first completed future, or block on the head
          val idx = buf.indexWhere(_.isCompleted) match {
            case -1 => 0
            case i => i
          }
          val f = buf.remove(idx)
          Await.result(f, timeout)
        }
      }
    }
  }
}
