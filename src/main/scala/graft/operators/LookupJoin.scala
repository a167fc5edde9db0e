package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}

/** Lookup join — reference: CommonExecLookupJoin / StreamExecLookupJoin
  * (flink-table-planner/.../StreamExecLookupJoin.java:79), runners under
  * flink-table-runtime/.../operators/join/lookup/ and the partition-
  * level caches (LookupCacheManager.java, CachingLookupFunction.java).
  *
  * Per probe row, fetch the matching dimension row(s) from an external
  * system. Two strategies, mirroring the reference's:
  *
  *  1. `perPartition`: a connection + LRU cache per PARTITION (not per
  *     row) via mapPartitions — for dimension stores too big to
  *     broadcast. At 1000 executors this is 1000 cache instances and
  *     zero shuffle of the probe side.
  *  2. Stream-static join ("periodic-refresh broadcast"): Spark
  *     re-resolves a static DataFrame per micro-batch, covering the
  *     common refresh-the-dim-table case with zero custom code — see
  *     `streamStatic`.
  */
object LookupJoin {

  /** A user lookup function: open once per partition, look up per key,
    * close at partition end (reference LookupFunction.java contract). */
  trait LookupFn[K, V] extends Serializable {
    def open(): Unit = ()
    def lookup(key: K): Option[V]
    def close(): Unit = ()
  }

  /** Simple bounded LRU cache (reference LookupCacheManager default). */
  final class LruCache[K, V](capacity: Int) extends Serializable {
    private val m = new java.util.LinkedHashMap[K, Option[V]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[K, Option[V]]): Boolean = size() > capacity
    }
    def getOrFetch(k: K)(fetch: K => Option[V]): Option[V] = {
      val cached = m.get(k)
      if (cached != null) cached
      else { val v = fetch(k); m.put(k, v); v }
    }
  }

  /** Synchronous cached lookup join (left outer): one lookup-function
    * instance and cache per partition. */
  def perPartition[T, K, V, O](ds: Dataset[T], keyFn: T => K, fn: LookupFn[K, V],
      combine: (T, Option[V]) => O, cacheSize: Int = 10000)(
      implicit oEnc: Encoder[O]): Dataset[O] = {
    ds.mapPartitions { rows =>
      fn.open()
      val cache = new LruCache[K, V](cacheSize)
      new Iterator[O] {
        def hasNext: Boolean = {
          val h = rows.hasNext
          if (!h) fn.close()
          h
        }
        def next(): O = {
          val r = rows.next()
          combine(r, cache.getOrFetch(keyFn(r))(fn.lookup))
        }
      }
    }
  }

  /** Stream-static left join: `dim` is re-read every micro-batch, so an
    * updated dimension table is picked up at batch boundaries — the
    * reference's periodic-cache lookup with TTL = trigger interval. */
  def streamStatic(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(dim, keys, "left")
}
