package graft.api

import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.{ExecutionContext, Future}

import graft.SparkSpec
import graft.operators.{AsyncLookupJoin, LookupJoin}
import org.apache.spark.sql.Row

/** Lookup join SQL route: `FOR SYSTEM_TIME AS OF <proctime>` (+ LOOKUP
  * hint) through TableEnv.executeSql → LookupJoin / AsyncLookupJoin. */
class LookupJoinSqlSpec extends SparkSpec {

  private lazy val env = {
    val e = TableEnv(spark)
    e.executeSql(s"""
      CREATE TABLE lk_orders (
        o_orderkey BIGINT,
        o_custkey BIGINT,
        o_totalprice DOUBLE,
        pt AS PROCTIME()
      ) WITH ('connector' = 'filesystem',
              'path' = '$sfDir/orders.parquet',
              'format' = 'parquet')""")
    e.executeSql(s"""
      CREATE TABLE lk_customer (
        c_custkey BIGINT,
        c_name STRING,
        c_nationkey BIGINT
      ) WITH ('connector' = 'filesystem',
              'path' = '$sfDir/customer.parquet',
              'format' = 'parquet')""")
    e
  }

  private lazy val expected = { env; spark.sql("""
    SELECT o.o_orderkey, o.o_custkey, c.c_name
    FROM lk_orders o JOIN lk_customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey < 500
    """).collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet }

  test("DDL parses the PROCTIME() computed column") {
    assert(env.tableSpec("lk_orders").flatMap(_.proctime).contains("pt"))
    // virtual: present on read, absent from the physical column list
    assert(env.from("lk_orders").columns.contains("pt"))
    assert(env.showCreateTable("lk_orders").contains("pt AS PROCTIME()"))
    assert(!env.showCreateTable("lk_orders").contains("pt TIMESTAMP"))
  }

  test("sync lookup join via FOR SYSTEM_TIME AS OF proctime (snapshot fallback)") {
    val got = env.executeSql("""
      SELECT o.o_orderkey, o.o_custkey, c.c_name
      FROM lk_orders AS o
      JOIN lk_customer FOR SYSTEM_TIME AS OF o.pt AS c
      ON o.o_custkey = c.c_custkey
      WHERE o.o_orderkey < 500
      """).collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("async lookup join via LOOKUP hint with retry options") {
    val got = env.executeSql("""
      SELECT /*+ LOOKUP('table'='c', 'async'='true', 'capacity'='8',
                 'retry-predicate'='lookup_miss',
                 'retry-strategy'='fixed_delay',
                 'fixed-delay'='1ms', 'max-attempts'='2') */
        o.o_orderkey, o.o_custkey, c.c_name
      FROM lk_orders AS o
      JOIN lk_customer FOR SYSTEM_TIME AS OF o.pt AS c
      ON o.o_custkey = c.c_custkey
      WHERE o.o_orderkey < 500
      """).collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("LOOKUP hint routes through AsyncLookupJoin with retry options applied") {
    // the registered async function, NOT the snapshot join, must serve
    // the hinted query — proven by invocation counting; the first
    // attempt per key is a simulated miss, so complete results also
    // prove retry-predicate='lookup_miss' + max-attempts='2' were bound
    val cmap = { env; spark.table("lk_customer").collect()
      .map(r => r.getLong(0) -> r).toMap }
    LookupJoinSqlSpec.invocations.set(0)
    LookupJoinSqlSpec.attempts.clear()
    env.registerAsyncLookupFunction("lk_customer",
      new AsyncLookupJoin.AsyncLookupFn[Any, Row] {
        def asyncLookup(key: Any)(
            implicit ec: ExecutionContext): Future[Option[Row]] = Future {
          LookupJoinSqlSpec.invocations.incrementAndGet()
          val n = LookupJoinSqlSpec.attempts
            .computeIfAbsent(key, _ => new AtomicInteger(0))
            .incrementAndGet()
          if (n == 1) None // first attempt misses -> retry must fire
          else cmap.get(key.asInstanceOf[Long])
        }
      })
    try {
      val got = env.executeSql("""
        SELECT /*+ LOOKUP('table'='c', 'async'='true', 'capacity'='4',
                   'retry-predicate'='lookup_miss',
                   'retry-strategy'='fixed_delay',
                   'fixed-delay'='1ms', 'max-attempts'='2') */
          o.o_orderkey, o.o_custkey, c.c_name
        FROM lk_orders AS o
        JOIN lk_customer FOR SYSTEM_TIME AS OF o.pt AS c
        ON o.o_custkey = c.c_custkey
        WHERE o.o_orderkey < 500
        """).collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got == expected && got.nonEmpty)
      assert(LookupJoinSqlSpec.invocations.get() > 0,
        "registered async function was never invoked — snapshot fallback ran instead")
      import scala.collection.JavaConverters._
      val perKey = LookupJoinSqlSpec.attempts.values().asScala.map(_.get())
      assert(perKey.forall(_ == 2),
        s"every key should see exactly miss+retry (2 attempts), got ${perKey.toSet}")
    } finally env.registerAsyncLookupFunction("lk_customer", null)
  }

  test("LEFT lookup join null-pads misses; inner drops them") {
    // dim covering only even customer keys
    spark.sql("SELECT c_custkey, c_name FROM lk_customer WHERE c_custkey % 2 = 0")
      .createOrReplaceTempView("lk_cust_even")
    val left = env.executeSql("""
      SELECT o.o_orderkey, o.o_custkey, c.c_name
      FROM lk_orders AS o
      LEFT JOIN lk_cust_even FOR SYSTEM_TIME AS OF o.pt AS c
      ON o.o_custkey = c.c_custkey
      WHERE o.o_orderkey < 500
      """).collect()
    val inner = env.executeSql("""
      SELECT o.o_orderkey, o.o_custkey, c.c_name
      FROM lk_orders AS o
      JOIN lk_cust_even FOR SYSTEM_TIME AS OF o.pt AS c
      ON o.o_custkey = c.c_custkey
      WHERE o.o_orderkey < 500
      """).collect()
    assert(left.length == expected.size) // every probe row survives
    val padded = left.count(_.isNullAt(2))
    assert(padded > 0 && inner.length == left.length - padded)
    assert(inner.forall(r => r.getLong(1) % 2 == 0 && !r.isNullAt(2)))
  }

  test("snapshot fallback plans a broadcast hash join (guard-railed build, zero probe shuffle)") {
    val df = env.executeSql("""
      SELECT o.o_orderkey, o.o_custkey, c.c_name
      FROM lk_orders AS o
      JOIN lk_customer FOR SYSTEM_TIME AS OF o.pt AS c
      ON o.o_custkey = c.c_custkey
      WHERE o.o_orderkey < 500
      """)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"snapshot lookup should broadcast-hash-join, got:\n$plan")
  }

  test("snapshot fallback rejects a non-unique dimension key") {
    spark.sql(
      "SELECT c_custkey % 10 AS k, c_name FROM lk_customer").limit(40)
      .createOrReplaceTempView("lk_cust_dup")
    val e = intercept[IllegalArgumentException] {
      env.executeSql("""
        SELECT o.o_orderkey, c.c_name
        FROM lk_orders AS o
        JOIN lk_cust_dup FOR SYSTEM_TIME AS OF o.pt AS c
        ON o.o_custkey = c.k
        WHERE o.o_orderkey < 500
        """)
    }
    assert(e.getMessage.contains("unique"))
  }

  test("registered sync LookupFunction is used (external-store case)") {
    // static counters: the fn closure is serialized per partition, so
    // instance fields would count in the deserialized copies only
    LookupJoinSqlSpec.opens.set(0)
    LookupJoinSqlSpec.lookups.set(0)
    val opens = LookupJoinSqlSpec.opens
    val lookups = LookupJoinSqlSpec.lookups
    env.registerLookupFunction("lk_customer",
      new LookupJoin.LookupFn[Any, Row] {
        override def open(): Unit = { LookupJoinSqlSpec.opens.incrementAndGet(); () }
        def lookup(key: Any): Option[Row] = {
          LookupJoinSqlSpec.lookups.incrementAndGet()
          Some(Row(key, s"dim-$key", 0L))
        }
      })
    try {
      val got = env.executeSql("""
        SELECT o.o_custkey, c.c_name
        FROM lk_orders AS o
        JOIN lk_customer FOR SYSTEM_TIME AS OF o.pt AS c
        ON o.o_custkey = c.c_custkey
        WHERE o.o_orderkey < 500
        """).collect()
      assert(got.nonEmpty)
      assert(got.forall(r => r.getString(1) == s"dim-${r.getLong(0)}"))
      assert(opens.get() > 0)
      // per-partition LRU: duplicate probe keys hit the cache, so the
      // fetch count stays well under the probe row count
      val probes = spark.table("lk_orders").count()
      assert(lookups.get() > 0 && lookups.get() < probes)
    } finally env.registerLookupFunction("lk_customer", null)
  }

  test("registered async LookupFunction serves the async hint") {
    env.registerAsyncLookupFunction("lk_customer",
      new AsyncLookupJoin.AsyncLookupFn[Any, Row] {
        def asyncLookup(key: Any)(
            implicit ec: ExecutionContext): Future[Option[Row]] =
          Future(Some(Row(key, s"async-$key", 0L)))
      })
    try {
      val got = env.executeSql("""
        SELECT /*+ LOOKUP('table'='lk_customer', 'async'='true') */
          o.o_custkey, c.c_name
        FROM lk_orders AS o
        JOIN lk_customer FOR SYSTEM_TIME AS OF o.pt AS c
        ON o.o_custkey = c.c_custkey
        WHERE o.o_orderkey < 500
        """).collect()
      assert(got.nonEmpty)
      assert(got.forall(r => r.getString(1) == s"async-${r.getLong(0)}"))
    } finally env.registerAsyncLookupFunction("lk_customer", null)
  }


  test("lookup join never shuffles the probe side (scale contract)") {
    val df = env.executeSql("""
      SELECT o.o_orderkey, c.c_name
      FROM lk_orders AS o
      JOIN lk_customer FOR SYSTEM_TIME AS OF o.pt AS c
      ON o.o_custkey = c.c_custkey""")
    // probes flow scan -> broadcast hash join -> project/filter: the
    // only Exchange is the dim's BroadcastExchange — the probe side is
    // never hash-shuffled, and the dim is built executor-side (no
    // driver collect)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") &&
      !plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      s"unexpected probe shuffle:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"broadcast join missing:\n$plan")
  }

  test("hint validation: unknown options and wrong table raise") {
    val e1 = intercept[IllegalArgumentException](env.executeSql("""
      SELECT /*+ LOOKUP('table'='c', 'bogus'='1') */ o.o_orderkey
      FROM lk_orders AS o
      JOIN lk_customer FOR SYSTEM_TIME AS OF o.pt AS c
      ON o.o_custkey = c.c_custkey"""))
    assert(e1.getMessage.contains("bogus"))
    val e2 = intercept[IllegalArgumentException](env.executeSql("""
      SELECT /*+ LOOKUP('table'='nope') */ o.o_orderkey
      FROM lk_orders AS o
      JOIN lk_customer FOR SYSTEM_TIME AS OF o.pt AS c
      ON o.o_custkey = c.c_custkey"""))
    assert(e2.getMessage.contains("nope"))
  }

  test("event-time FOR SYSTEM_TIME AS OF still routes to the as-of join") {
    // no proctime declared, no hint → TemporalJoinSql (raises its own
    // message when the right side lacks a version-time column)
    val env2 = TableEnv(spark)
    spark.range(3).selectExpr("id AS k", "timestamp_seconds(id) AS ts")
      .createOrReplaceTempView("lk_probe_ev")
    spark.range(3).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("lk_dim_ev")
    val e = intercept[IllegalArgumentException](env2.executeSql("""
      SELECT p.k FROM lk_probe_ev AS p
      JOIN lk_dim_ev FOR SYSTEM_TIME AS OF p.ts AS d
      ON p.k = d.k"""))
    assert(e.getMessage.contains("version"))
  }
}

/** Cross-closure counters (the lookup fn is deserialized per partition;
  * statics are JVM-shared in local mode). */
object LookupJoinSqlSpec {
  val opens = new AtomicInteger(0)
  val lookups = new AtomicInteger(0)
  // retry test: per-key attempt counts + total async invocations
  val invocations = new AtomicInteger(0)
  val attempts =
    new java.util.concurrent.ConcurrentHashMap[Any, AtomicInteger]()
}
