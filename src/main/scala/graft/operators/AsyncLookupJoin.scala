package graft.operators

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{Dataset, Encoder}

/** Async cached lookup join — reference: AsyncLookupJoinRunner +
  * AsyncLookupJoinWithCalcRunner (flink-table-runtime/.../operators/
  * join/lookup/), the retry wrapper (RetryableAsyncLookupFunction
  * Delegator) and the shared partition cache (LookupCacheManager.java,
  * CachingAsyncLookupFunction.java).
  *
  * Combines the AsyncIO pipeline with the LookupJoin cache: per
  * PARTITION one async lookup function, one LRU cache, and up to
  * `capacity` in-flight lookups; results emit in INPUT ORDER (the
  * runner's ordered ResultFetcher). A cache hit short-circuits the
  * dispatch entirely; a miss dispatches with up to `maxRetries`
  * fixed-delay retries (the reference's FIXED_DELAY retry strategy).
  *
  * Scale shape: zero shuffle of the probe side, no driver involvement;
  * at 1000 executors this is 1000 independent caches and connection
  * pools, identical to the reference's per-subtask runners.
  */
object AsyncLookupJoin {

  /** Async lookup function contract (reference AsyncLookupFunction:
    * open once per partition, async fetch per key, close at end). */
  trait AsyncLookupFn[K, V] extends Serializable {
    def open(): Unit = ()
    def asyncLookup(key: K)(implicit ec: ExecutionContext): Future[Option[V]]
    def close(): Unit = ()
  }

  /** Ordered async cached lookup join (left outer via Option).
    *
    * `maxRetries` always re-attempts thrown failures (transient store
    * errors); a lookup MISS (`Success(None)`) is re-attempted only when
    * `retryOnMiss` is set — the reference's explicit 'lookup_miss'
    * retry predicate. Callers retrying for transient failures only must
    * not pay maxRetries×retryDelayMs for every legitimately-absent key,
    * the common case in lookup joins. */
  def ordered[T, K, V, O](ds: Dataset[T], keyFn: T => K,
      fn: AsyncLookupFn[K, V], combine: (T, Option[V]) => O,
      capacity: Int = 16, cacheSize: Int = 10000,
      timeout: Duration = Duration.Inf,
      maxRetries: Int = 0, retryDelayMs: Long = 0,
      retryOnMiss: Boolean = false)(
      implicit oEnc: Encoder[O]): Dataset[O] = {
    ds.mapPartitions { rows =>
      fn.open()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(2, capacity))
      // close exactly once, whether the iterator is fully drained, the
      // partition is cut short (LIMIT), or the task fails — the task
      // completion listener is the only path that fires in all three
      val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
      def closeAll(): Unit = if (closed.compareAndSet(false, true)) {
        try fn.close() finally pool.shutdownNow()
      }
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => closeAll()))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      // cache + in-flight map guarded by ONE lock so a key is fetched at
      // most once per partition: the miss check, the pending lookup, and
      // the completion's cache-insert/pending-remove are each atomic
      // (a two-lock scheme had a window where a just-completed key was
      // neither pending nor yet visible as a hit -> duplicate fetch)
      val lock = new Object
      val cache = new java.util.LinkedHashMap[K, Option[V]](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[K, Option[V]]): Boolean = size() > cacheSize
      }
      val pending = scala.collection.mutable.Map.empty[K, Future[Option[V]]]
      def withRetry(k: K, attempt: Int): Future[Option[V]] =
        fn.asyncLookup(k).transformWith {
          case scala.util.Success(hit @ Some(_)) => Future.successful(hit)
          case scala.util.Success(None) if retryOnMiss && attempt < maxRetries =>
            // fixed-delay miss retry (reference 'lookup_miss' retry
            // predicate: the row may not have reached the store yet);
            // gated behind retryOnMiss so failure-only retry users don't
            // pay the delay for every legitimately-absent key. A miss
            // that survives all attempts is a legitimate no-match.
            if (retryDelayMs > 0) Thread.sleep(retryDelayMs)
            withRetry(k, attempt + 1)
          case scala.util.Failure(_) if attempt < maxRetries =>
            // fixed-delay retry of thrown (transient) failures — the
            // reference FIXED_DELAY strategy; a surviving failure
            // propagates.
            if (retryDelayMs > 0) Thread.sleep(retryDelayMs)
            withRetry(k, attempt + 1)
          case scala.util.Success(none) => Future.successful(none)
          case scala.util.Failure(e) => Future.failed(e)
        }
      // duplicate keys already in flight share one future (the
      // reference's LookupCacheManager semantics) — a hot probe key
      // costs one store round-trip, not `capacity` of them
      def dispatch(k: K): Future[Option[V]] = lock.synchronized {
        Option(cache.get(k)) match {
          case Some(hit) => Future.successful(hit)
          case None => pending.getOrElseUpdate(k, {
            val f = withRetry(k, 0)
            f.onComplete { r =>
              lock.synchronized {
                r.foreach(v => cache.put(k, v))
                pending.remove(k)
              }
            }
            f
          })
        }
      }
      val inflight = scala.collection.mutable.Queue.empty[(T, Future[Option[V]])]
      new Iterator[O] {
        private def fill(): Unit =
          while (inflight.size < capacity && rows.hasNext) {
            val r = rows.next()
            inflight.enqueue((r, dispatch(keyFn(r))))
          }
        def hasNext: Boolean = {
          fill()
          val h = inflight.nonEmpty
          if (!h) closeAll() // eager cleanup on drain; idempotent
          h
        }
        def next(): O = {
          fill()
          val (r, f) = inflight.dequeue()
          combine(r, Await.result(f, timeout))
        }
      }
    }
  }
}
