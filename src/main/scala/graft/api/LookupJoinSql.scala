package graft.api

import scala.concurrent.{ExecutionContext, Future}
import scala.concurrent.duration.{Duration, DurationLong}
import scala.util.matching.Regex

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.operators.{AsyncLookupJoin, LookupJoin}

/** Processing-time temporal ("lookup") join SQL surface — reference:
  * CommonExecLookupJoin.java / StreamExecLookupJoin.java:79 and the
  * LOOKUP join hint (docs/content/docs/dev/table/sql/queries/hints.md).
  *
  * Form (same grammar as the event-time temporal join, but the AS OF
  * attribute is a PROCESSING-time column — declared `pt AS PROCTIME()`
  * in the probe table's DDL):
  * {{{
  * SELECT [/*+ LOOKUP('table'='d' [,'async'='true'] [,'capacity'='N']
  *            [,'timeout'='180s'] [,'retry-predicate'='lookup_miss']
  *            [,'retry-strategy'='fixed_delay'] [,'fixed-delay'='10s']
  *            [,'max-attempts'='3']) */] <cols>
  * FROM <probe> [AS] o
  * [LEFT] JOIN <dim> FOR SYSTEM_TIME AS OF o.<proctime> [AS] d
  * ON o.<key> = d.<key>
  * [WHERE <pred>]
  * }}}
  *
  * Routing (reference: a LookupTableSource provides the lookup runner):
  *  - a [[TableEnv.registerLookupFunction]] /
  *    [[TableEnv.registerAsyncLookupFunction]] registration for the dim
  *    table is used directly — the external-store case;
  *  - otherwise the dim's CURRENT snapshot joins as a plan-native
  *    BROADCAST HASH JOIN: probes stay put (zero shuffle), each of
  *    1000 executors holds one copy of the build map, and the build
  *    goes through Spark's broadcast machinery (compact
  *    HashedRelation, maxResultSize / 8GB guard rails) rather than a
  *    hand-rolled driver map; dims too fat to broadcast belong on a
  *    registered LookupFunction.
  *
  * Registered functions go through the lookup operators:
  * sync → [[LookupJoin.perPartition]] (one LRU cache per partition),
  * async → [[AsyncLookupJoin.ordered]] (per-partition async runner with
  * in-flight capacity, input-order emit, fixed-delay retries) — the
  * reference's LookupJoinRunner / AsyncLookupJoinRunner split.
  *
  * Dimension keys must be unique (the PK-dimension contract): the
  * operator API is Option-per-key, so a duplicate dim key raises rather
  * than silently dropping matches. Inner JOIN drops probe rows with no
  * match; LEFT JOIN null-pads.
  */
object LookupJoinSql {

  private val HintBlock: Regex = """(?is)/\*\+\s*LOOKUP\s*\(([^)]*)\)\s*\*/""".r

  private def stripHint(sql: String): (String, Option[String]) = {
    val hint = HintBlock.findFirstMatchIn(sql).map(_.group(1))
    (HintBlock.replaceAllIn(sql, " "), hint)
  }

  /** A FOR SYSTEM_TIME AS OF statement is a LOOKUP join when the AS OF
    * column is the probe table's declared PROCTIME() attribute, or when
    * the statement carries an explicit LOOKUP hint. */
  def isLookupJoin(sql: String, proctimeOf: String => Option[String]): Boolean = {
    val (stripped, hint) = stripHint(sql)
    if (hint.isDefined) true
    else TemporalJoinSql.P.findFirstMatchIn(stripped).exists { m =>
      proctimeOf(m.group(2)).contains(m.group(7))
    }
  }

  private def parseDuration(s: String): Duration = {
    val m = """(?i)^\s*(\d+)\s*(ms|s|min|h)?\s*$""".r.findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(
        s"LOOKUP hint: cannot parse duration '$s'"))
    val n = m.group(1).toLong
    Option(m.group(2)).map(_.toLowerCase).getOrElse("s") match {
      case "ms" => n.millis
      case "s" => n.seconds
      case "min" => n.minutes
      case "h" => n.hours
    }
  }

  private def parseHint(hint: String): Map[String, String] =
    """'([^']*)'\s*=\s*'([^']*)'""".r.findAllMatchIn(hint)
      .map(m => m.group(1).toLowerCase -> m.group(2)).toMap

  def execute(env: TableEnv, sql: String): DataFrame = {
    val spark = env.spark
    val (stripped, hintStr) = stripHint(sql)
    val m = TemporalJoinSql.P.findFirstMatchIn(stripped).getOrElse(
      throw new IllegalArgumentException(
        "lookup join: expected SELECT [/*+ LOOKUP(...) */] ... FROM t [AS] o " +
          "[LEFT] JOIN dim FOR SYSTEM_TIME AS OF o.proctime [AS] d " +
          "ON o.k = d.k [WHERE ...]"))
    val outerSelect = m.group(1).trim
    val (leftTable, leftAlias) = (m.group(2), m.group(3))
    val leftOuter = m.group(4) != null
    val (rightTable, rightAlias) = (m.group(5), m.group(8))
    val (tsAlias, _) = (m.group(6), m.group(7))
    val (onA, onACol, onB, onBCol) =
      (m.group(9), m.group(10), m.group(11), m.group(12))
    val whereClause = Option(m.group(13)).map(_.trim)

    if (tsAlias != leftAlias) throw new IllegalArgumentException(
      s"FOR SYSTEM_TIME AS OF must reference the probe side's time " +
        s"attribute ($tsAlias vs $leftAlias)")
    val (leftKey, rightKey) =
      if (onA == leftAlias && onB == rightAlias) (onACol, onBCol)
      else if (onA == rightAlias && onB == leftAlias) (onBCol, onACol)
      else throw new IllegalArgumentException(
        s"ON clause must equate $leftAlias.<col> = $rightAlias.<col>")

    // ---- hint options (reference LookupJoinHintOptions) ----
    val opts = hintStr.map(parseHint).getOrElse(Map.empty)
    val known = Set("table", "async", "output-mode", "capacity", "timeout",
      "retry-predicate", "retry-strategy", "fixed-delay", "max-attempts",
      "cache-size")
    val unknown = opts.keySet -- known
    require(unknown.isEmpty,
      s"LOOKUP hint: unsupported option(s) $unknown (supported: $known)")
    opts.get("table").foreach(t => require(
      t == rightTable || t == rightAlias,
      s"LOOKUP hint names table '$t' but the lookup table is " +
        s"$rightTable (alias $rightAlias)"))
    opts.get("retry-predicate").foreach(p => require(
      p.equalsIgnoreCase("lookup_miss"),
      s"LOOKUP hint: only retry-predicate='lookup_miss' is supported"))
    opts.get("retry-strategy").foreach(s => require(
      s.equalsIgnoreCase("fixed_delay"),
      s"LOOKUP hint: only retry-strategy='fixed_delay' is supported"))
    val async = opts.get("async").exists(_.equalsIgnoreCase("true"))
    val capacity = opts.get("capacity").map(_.toInt).getOrElse(16)
    val cacheSize = opts.get("cache-size").map(_.toInt).getOrElse(10000)
    val timeout = opts.get("timeout").map(parseDuration).getOrElse(Duration.Inf)
    val maxRetries = opts.get("max-attempts").map(_.toInt - 1).getOrElse(0)
    val retryDelayMs = opts.get("fixed-delay").map(parseDuration(_).toMillis)
      .getOrElse(0L)
    // miss-retry only when the hint explicitly asks for the lookup_miss
    // predicate; bare max-attempts retries thrown failures only
    val retryOnMiss = opts.contains("retry-predicate")

    val left = spark.table(leftTable)
    val dim0 = spark.table(rightTable)

    // rename dim columns colliding with probe columns (same convention
    // as the event-time route)
    val leftCols = left.columns.toSet
    val renames = dim0.columns.filter(leftCols.contains)
      .map(c => c -> s"__r_$c").toMap
    val dim = renames.foldLeft(dim0) { case (df, (o, n)) =>
      df.withColumnRenamed(o, n)
    }
    val rightKey2 = renames.getOrElse(rightKey, rightKey)

    val keyIdx = left.schema.fieldIndex(leftKey)
    val dimSchema = StructType(dim.schema.fields.map(_.copy(nullable = true)))
    val outSchema = StructType(left.schema.fields ++ dimSchema.fields)
    val nulls: Seq[Any] = Seq.fill(dimSchema.length)(null)
    val enc = Encoders.row(outSchema)
    def combine(probe: Row, hit: Option[Row]): Row =
      Row.fromSeq(probe.toSeq ++ hit.map(_.toSeq).getOrElse(nulls))

    // ---- resolve the lookup route ----
    // Snapshot fallback (no registered lookup function): the dim's
    // CURRENT snapshot joined as a plan-native broadcast hash join.
    // Honest memory note: BroadcastExchange still stages the dim
    // through the driver to build the HashedRelation — what this buys
    // over the previous hand-rolled collect().groupBy is Spark's own
    // guard rails (spark.driver.maxResultSize / the 8GB broadcast cap
    // fail FAST with a tuning message instead of an opaque OOM, the
    // build is the compact HashedRelation rather than a boxed Scala
    // Map with 2-3x amplification, and AQE can veto the broadcast) plus
    // the standard knobs every Spark operator shares. A dimension too
    // fat to broadcast belongs on the registered-LookupFunction path
    // (per-partition LRU, reference LookupCacheManager.java shape).
    // The PK-dimension uniqueness contract is asserted with one
    // aggregate over the dim (at most 1 row returns to the driver).
    def snapshotJoin(): DataFrame = {
      val dups = dim.groupBy(dim.col(rightKey2))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("__n"))
        .filter(col("__n") > 1).limit(1).collect()
      if (dups.nonEmpty) throw new IllegalArgumentException(
        s"lookup join: dimension $rightTable has duplicate key " +
          s"${dups.head.get(0)} on $rightKey — lookup dimensions must " +
          "be unique per key")
      left.join(org.apache.spark.sql.functions.broadcast(dim),
        left.col(leftKey) === dim.col(rightKey2), "left_outer")
    }

    val registeredAsync = env.asyncLookupFn(rightTable)
    val registeredSync = env.lookupFn(rightTable)
    val joined: DataFrame =
      if (async && (registeredAsync.isDefined || registeredSync.isDefined)) {
        val fn: AsyncLookupJoin.AsyncLookupFn[Any, Row] =
          registeredAsync.getOrElse {
            val sync = registeredSync.get
            new AsyncLookupJoin.AsyncLookupFn[Any, Row] {
              override def open(): Unit = sync.open()
              def asyncLookup(key: Any)(
                  implicit ec: ExecutionContext): Future[Option[Row]] =
                Future(sync.lookup(key))
              override def close(): Unit = sync.close()
            }
          }
        AsyncLookupJoin.ordered[Row, Any, Row, Row](
          left, _.get(keyIdx), fn, combine,
          capacity = capacity, cacheSize = cacheSize, timeout = timeout,
          maxRetries = maxRetries, retryDelayMs = retryDelayMs,
          retryOnMiss = retryOnMiss)(enc).toDF()
      } else if (registeredSync.isDefined) {
        LookupJoin.perPartition[Row, Any, Row, Row](
          left, _.get(keyIdx), registeredSync.get, combine,
          cacheSize = cacheSize)(enc).toDF()
      } else {
        // async on a static snapshot adds only thread-pool overhead —
        // the broadcast join IS the async-friendly static plan
        snapshotJoin()
      }

    // inner join drops probe rows with no match; the dim key (non-null
    // by the uniqueness contract) doubles as the match marker
    val result = if (leftOuter) joined
      else joined.filter(col(rightKey2).isNotNull)

    def rewrite(s: String): String = {
      var out = s
      out = out.replaceAll(
        s"(?i)\\b${Regex.quote(rightAlias)}\\.(\\w+)", "__R__$1")
      out = out.replaceAll(s"(?i)\\b${Regex.quote(leftAlias)}\\.(\\w+)", "$1")
      renames.foreach { case (o, n) =>
        out = out.replaceAll(s"__R__${Regex.quote(o)}\\b", n)
      }
      out.replaceAll("__R__", "")
    }

    val v = s"__lj_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    result.createOrReplaceTempView(v)
    val where = whereClause.map(w => s" WHERE ${rewrite(w)}").getOrElse("")
    // analysis resolves the view subtree eagerly, so the scratch view
    // can be dropped immediately — otherwise every lookup-join statement
    // leaks a __lj_* entry into SHOW TABLES for the session's lifetime
    val out = spark.sql(s"SELECT ${rewrite(outerSelect)} FROM $v$where")
    spark.catalog.dropTempView(v)
    out
  }
}
