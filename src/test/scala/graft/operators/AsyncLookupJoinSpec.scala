package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.{ExecutionContext, Future}
import scala.concurrent.duration._

import graft.SparkSpec

/** Fake async dimension store: configurable latency, per-key fetch
  * counting (proves the cache), and optional first-attempt failures
  * (proves retry). Counters are static so executors in the local JVM
  * share them. */
object FakeStore {
  val fetches = new AtomicInteger(0)
  val failures = new AtomicInteger(0)
  val closes = new AtomicInteger(0)

  class Fn(failFirst: Boolean) extends AsyncLookupJoin.AsyncLookupFn[Long, String] {
    override def close(): Unit = FakeStore.closes.incrementAndGet()
    private val attempted =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    override def asyncLookup(key: Long)(
        implicit ec: ExecutionContext): Future[Option[String]] = Future {
      Thread.sleep(1 + (key % 3))  // jittered latency
      if (failFirst && attempted.add(key)) {
        FakeStore.failures.incrementAndGet()
        throw new RuntimeException(s"transient failure for $key")
      }
      FakeStore.fetches.incrementAndGet()
      if (key % 10 == 9) None else Some(s"dim_$key")
    }
  }
}

class AsyncLookupJoinSpec extends SparkSpec {
  import spark.implicits._

  test("ordered async lookup preserves input order and caches per key") {
    FakeStore.fetches.set(0)
    val input = (0L until 400L).map(i => (i, i % 20))  // 20 distinct keys
    val ds = input.toDS().repartition(2)
    val out = AsyncLookupJoin.ordered[(Long, Long), Long, String, (Long, Long, String)](
      ds, _._2, new FakeStore.Fn(failFirst = false),
      (r, v) => (r._1, r._2, v.getOrElse("MISS")),
      capacity = 8, timeout = 30.seconds)
      .collect()
    // per-partition order preserved: sequence numbers ascend per partition
    assert(out.length == 400)
    out.groupBy(_._1 % 2)
    val byVal = out.map(r => r._1 -> r).toMap
    input.foreach { case (seq, key) =>
      val r = byVal(seq)
      assert(r._3 == (if (key % 10 == 9) "MISS" else s"dim_$key"))
    }
    // cache: at most one fetch per (partition, key) pair
    assert(FakeStore.fetches.get() <= 2 * 20,
      s"expected <=40 fetches, got ${FakeStore.fetches.get()}")
  }

  test("input order is preserved within a partition") {
    val ds = (0L until 300L).map(i => (i, i % 7)).toDS().coalesce(1)
    val out = AsyncLookupJoin.ordered[(Long, Long), Long, String, Long](
      ds, _._2, new FakeStore.Fn(failFirst = false), (r, _) => r._1,
      capacity = 16, timeout = 30.seconds).collect()
    assert(out.toSeq == (0L until 300L))
  }

  test("fixed-delay retry recovers transient failures") {
    FakeStore.failures.set(0)
    val ds = (0L until 50L).map(i => (i, i % 5)).toDS().coalesce(1)
    val out = AsyncLookupJoin.ordered[(Long, Long), Long, String, String](
      ds, _._2, new FakeStore.Fn(failFirst = true),
      (_, v) => v.getOrElse("MISS"),
      capacity = 4, timeout = 30.seconds, maxRetries = 2, retryDelayMs = 5)
      .collect()
    assert(FakeStore.failures.get() >= 5)   // each key failed once
    assert(out.forall(_.startsWith("dim_")))
  }

  test("lookup function closes exactly once, even when cut short by LIMIT") {
    val ds = (0L until 200L).map(i => (i, i % 5)).toDS().coalesce(1)
    def joined = AsyncLookupJoin.ordered[(Long, Long), Long, String, Long](
      ds, _._2, new FakeStore.Fn(failFirst = false), (r, _) => r._1,
      capacity = 4, timeout = 30.seconds)
    // partial consumption: LIMIT stops mid-partition; only the task
    // completion listener can close — must still be exactly once
    FakeStore.closes.set(0)
    assert(joined.limit(3).collect().length == 3)
    assert(FakeStore.closes.get() == 1,
      s"expected 1 close after LIMIT, got ${FakeStore.closes.get()}")
    // full drain: eager close on exhaustion + completion listener — the
    // once-guard must collapse them to a single close
    FakeStore.closes.set(0)
    assert(joined.collect().length == 200)
    assert(FakeStore.closes.get() == 1,
      s"expected 1 close after drain, got ${FakeStore.closes.get()}")
  }

  test("a miss is NOT retried unless retryOnMiss is set (failure-only retry)") {
    // keys ≡ 9 (mod 10) always miss; with maxRetries=2 but
    // retryOnMiss=false each missing key must cost exactly ONE fetch —
    // failure-only retry users don't pay the delay for absent keys
    FakeStore.fetches.set(0)
    val ds = Seq((0L, 9L), (1L, 19L)).toDS().coalesce(1)
    val out = AsyncLookupJoin.ordered[(Long, Long), Long, String, String](
      ds, _._2, new FakeStore.Fn(failFirst = false),
      (_, v) => v.getOrElse("MISS"),
      capacity = 2, timeout = 10.seconds, maxRetries = 2, retryDelayMs = 5)
      .collect()
    assert(out.toSeq == Seq("MISS", "MISS"))
    assert(FakeStore.fetches.get() == 2,
      s"miss must not retry without retryOnMiss: ${FakeStore.fetches.get()} fetches")
    // and WITH retryOnMiss each missing key is attempted 1+maxRetries times
    FakeStore.fetches.set(0)
    val out2 = AsyncLookupJoin.ordered[(Long, Long), Long, String, String](
      ds, _._2, new FakeStore.Fn(failFirst = false),
      (_, v) => v.getOrElse("MISS"),
      capacity = 2, timeout = 10.seconds, maxRetries = 2, retryDelayMs = 5,
      retryOnMiss = true)
      .collect()
    assert(out2.toSeq == Seq("MISS", "MISS"))
    assert(FakeStore.fetches.get() == 6,
      s"lookup_miss predicate should retry misses: ${FakeStore.fetches.get()} fetches")
  }

  test("no retry propagates the failure") {
    FakeStore.failures.set(0)
    val ds = Seq((1L, 1L)).toDS().coalesce(1)
    intercept[org.apache.spark.SparkException] {
      AsyncLookupJoin.ordered[(Long, Long), Long, String, String](
        ds, _._2, new FakeStore.Fn(failFirst = true),
        (_, v) => v.getOrElse("MISS"),
        capacity = 2, timeout = 10.seconds, maxRetries = 0).collect()
    }
  }
}
