package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Multi-sink statement set — reference: TableEnvironment.createStatementSet /
  * StatementSetImpl (flink-table/flink-table-api-java/src/main/java/org/
  * apache/flink/table/api/internal/StatementSetImpl.java) and the
  * `EXECUTE STATEMENT SET BEGIN ... END` SQL statement. The reference
  * compiles all INSERTs into ONE job graph and deduplicates common
  * sub-DAGs, so a source feeding two sinks is scanned once.
  *
  * Spark-native analogue: the INSERT statements run in one batch; any
  * registered source table referenced by MORE THAN ONE statement is
  * persisted (memory-and-disk) for the duration of `execute()` and
  * unpersisted after, so the shared scan + its decode cost are paid once
  * instead of per sink.
  *
  * Scale note (100 TB): persisting a raw 100 TB fact table is not the
  * move at scale — there you'd let both sinks re-scan (columnar scans
  * are cheap relative to the shuffle work above them) or materialize the
  * shared *derived* prefix explicitly. The cache here matches the
  * reference's semantics for the common case where the shared input is a
  * source that fits executor storage (MEMORY_AND_DISK spills, it never
  * OOMs); pass `shareSources = false` to get pure re-scan behavior.
  */
final class StatementSet private[api] (env: TableEnv, shareSources: Boolean) {

  private val inserts = scala.collection.mutable.ArrayBuffer.empty[Either[String, (String, DataFrame)]]

  /** Reference StatementSet.addInsertSql. */
  def addInsertSql(sql: String): StatementSet = {
    require(StatementSet.isInsert(sql), s"not an INSERT statement: $sql")
    inserts += Left(sql); this
  }

  /** Reference StatementSet.addInsert(targetPath, table). */
  def addInsert(target: String, table: DataFrame): StatementSet = {
    inserts += Right((target, table)); this
  }

  /** Table names a SQL statement references (word-level scan over the
    * registered catalog — same approach the dialect uses; false
    * positives only cost an unneeded cache). */
  private def referencedTables(sql: String): Set[String] = {
    val words = "[A-Za-z_][A-Za-z0-9_]*".r.findAllIn(sql).toSet
    env.registeredTables.filter(words.contains)
  }

  /** Run all statements as one batch; shared sources are scanned once. */
  def execute(): Unit = {
    val refCounts = inserts.collect { case Left(sql) => referencedTables(sql) }
      .flatten.groupBy(identity).view.mapValues(_.size)
    val shared =
      if (shareSources) refCounts.filter(_._2 > 1).keys.toSeq else Nil
    val cached = shared.map { name =>
      val df = env.from(name)
      df.persist(StorageLevel.MEMORY_AND_DISK)
      // re-point the temp view at the cached plan so every INSERT's
      // analysis resolves to the same InMemoryRelation
      df.createOrReplaceTempView(name)
      name -> df
    }
    try inserts.foreach {
      case Left(sql) => env.executeSql(sql)
      case Right((target, table)) =>
        val spec = env.tableSpec(target).getOrElse(throw new IllegalArgumentException(
          s"addInsert target $target is not a registered table (use CREATE TABLE)"))
        table.write.format(spec.format).mode("append").save(spec.path)
        env.refreshTable(target)
    } finally cached.foreach { case (name, df) =>
      df.unpersist()
      env.refreshTable(name) // restore the un-cached view
    }
    inserts.clear()
  }
}

object StatementSet {
  private val InsertP = """(?is)^\s*INSERT\s+(INTO|OVERWRITE)\s.*""".r
  private[api] def isInsert(sql: String): Boolean =
    InsertP.pattern.matcher(sql).matches()

  /** `EXECUTE STATEMENT SET BEGIN <insert>; <insert>; ... END` —
    * reference docs/content/docs/dev/table/sql/insert.md statement-set
    * syntax. */
  private val SetP =
    """(?is)^\s*EXECUTE\s+STATEMENT\s+SET\s+BEGIN\s+(.*?)\s*;?\s*END\s*;?\s*$""".r

  def matches(sql: String): Boolean = SetP.pattern.matcher(sql).matches()

  def statements(sql: String): Seq[String] = sql match {
    case SetP(body) =>
      body.split(";").map(_.trim).filter(_.nonEmpty).toSeq
    case _ => throw new IllegalArgumentException(s"not a statement set: $sql")
  }
}
