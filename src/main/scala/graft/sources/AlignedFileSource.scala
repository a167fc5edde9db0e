package graft.sources

import java.util.concurrent.ConcurrentHashMap

import scala.collection.JavaConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.types.{StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Watermark-ALIGNMENT group registry — the coordinator half of
  * FLIP-182 (reference: flink-core/.../eventtime/WatermarkStrategy.java
  * `withWatermarkAlignment(group, maxDrift, interval)` and
  * flink-runtime/.../source/coordinator/SourceCoordinator.java's
  * `WatermarkAggregator`, whose combined watermark is the SMALLEST
  * watermark across all registered keys).
  *
  * Each publisher is a named MEMBER; the group watermark is the MIN
  * over the members' (individually monotonic) watermarks — a fast
  * member can never drag the group forward past a slow one, which is
  * what makes pausing the fast member sound. [[attach]] bridges one
  * running query's global watermark in as one member, filtering the
  * session-wide listener bus down to that query by name. */
object AlignmentGroups {
  /** group -> (member -> monotonic-max watermark millis). */
  private val groups =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, java.lang.Long]]()

  /** Combined group watermark: the MIN over member watermarks
    * (reference: SourceCoordinator.WatermarkAggregator#aggregate).
    * None until at least one member has published. */
  def get(group: String): Option[Long] = {
    val m = groups.get(group)
    if (m == null) None
    else {
      val vs = m.values.asScala
      if (vs.isEmpty) None else Some(vs.map(_.longValue).min)
    }
  }

  /** Monotonic publish for one member (stale/smaller values ignored).
    * The GROUP value may still be smaller — it is the min over members. */
  def publish(group: String, member: String, watermarkMs: Long): Unit =
    groups.computeIfAbsent(group,
        _ => new ConcurrentHashMap[String, java.lang.Long]())
      .merge(member, java.lang.Long.valueOf(watermarkMs),
        (a, b) => if (a.longValue >= b.longValue) a else b)

  /** Single-publisher convenience (tests, an external coordinator that
    * already aggregated its members). */
  def publish(group: String, watermarkMs: Long): Unit =
    publish(group, "__default", watermarkMs)

  /** Forget a group (tests / teardown). */
  def clear(group: String): Unit = groups.remove(group)

  /** Feed the named query's global watermark into `group` as member
    * `queryName` after every progress event. The listener bus is
    * session-wide, so events are filtered to `queryName` — without the
    * filter every query on the session would publish into the group
    * and the min would be meaningless. Returns the listener so callers
    * can detach. */
  def attach(spark: SparkSession, group: String,
      queryName: String): StreamingQueryListener = {
    val l = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.name == queryName) {
          val wm = Option(e.progress.eventTime.get("watermark"))
          wm.foreach(ts => publish(group, queryName,
            java.time.Instant.parse(ts).toEpochMilli))
        }
    }
    spark.streams.addListener(l)
    l
  }
}

/** Event-time-aligned streaming file source — the genuine THROTTLING
  * half of FLIP-182 watermark alignment (reference:
  * flink-runtime/.../source/operator/SourceOperator.java, which PAUSES
  * the split reader while `sourceWatermark > groupWatermark + drift`),
  * complementing [[graft.streaming.Watermarks.alignedBuffer]] which
  * can only bound what downstream SEES by holding rows in keyed state.
  * Here held rows stay UNREAD: admission control stops advancing the
  * offset past files whose event time exceeds the alignment bound, so
  * the excess sits in the source (zero executor state), exactly the
  * reference's back-pressure shape.
  *
  * Files are named `<maxEventTimeMillis>-<anything>.csv` (the
  * file-name carries the file's MAX event time, the per-split
  * watermark analogue); rows are `epochMillis,value` lines. Admission
  * is per FILE — the micro-batch analogue of the reference's per-SPLIT
  * pause granularity.
  *
  * Admission rule (per trigger, files considered in event-time order):
  * admit the next pending file while the CURRENT source watermark
  * `sourceMaxTs - watermarkDelayMs <= groupWm + maxDriftMs`, where
  * `sourceMaxTs` is the max event time this source has admitted so far
  * and `groupWm` comes from [[AlignmentGroups]]. The check is on the
  * watermark already emitted, not on the candidate file — the
  * reference's SourceOperator likewise pauses AFTER its emitted
  * watermark crosses `maxAllowedWatermark`, letting the record that
  * crossed it through; checking the candidate instead would deadlock a
  * slow source whose next file jumps past the bound. Consequence: a
  * source at the bound still admits ONE more file (drift is bounded to
  * maxDrift + one file's span — the per-split-granularity analogue of
  * the reference's in-flight records). When the group has no watermark
  * yet, alignment is INACTIVE and everything is admitted — the
  * reference behaves identically before the first combined watermark
  * is announced. The slowest group member is never paused (its own
  * watermark IS the group minimum), which is the liveness argument
  * FLIP-182 makes; set `alignment.watermarkDelayMs` to the query's
  * `withWatermark` delay so the comparison happens in watermark space,
  * not raw-event-time space.
  *
  * Offsets are COMPACTED: once a batch commits, admitted files older
  * than `alignment.compactRetentionMs` below the max committed event
  * time fold into a single high-watermark `hw` field instead of being
  * re-serialized into every subsequent offset forever (the same shape
  * as FileStreamSource's compacted metadata log + maxFileAge). Files
  * whose name-time is <= hw are treated as already admitted; a
  * straggler arriving with an event time that far in the past is
  * dropped by policy — identical to FileStreamSource discarding files
  * older than maxFileAge. Because only COMMITTED names fold into hw,
  * any (start, end) range the engine can ever replan still lists the
  * batch's files explicitly. Event times come from the file NAME, so
  * deleting an already-committed admitted file neither corrupts the
  * source watermark nor breaks restarts.
  *
  * `reportLatestOffset` reports what is AVAILABLE (the full current
  * listing), not what admission has allowed: it feeds backlog metrics
  * and `Trigger.AvailableNow`'s target snapshot, both of which are
  * about data that exists, not data alignment has released. Under
  * AvailableNow the engine drains to that snapshot directly (alignment
  * is a pacing mechanism for continuous triggers; a drain-and-stop run
  * has no peer sources to stay aligned with).
  *
  * Options: `path` (required), `alignment.group`,
  * `alignment.maxDriftMs` (default 5000), `alignment.watermarkDelayMs`
  * (default 0), `alignment.compactRetentionMs` (default 7 days).
  * `ReadLimit.maxFiles` is honored on top of the alignment bound.
  * Scale note: this source demonstrates the alignment mechanics
  * end-to-end; a production deployment would put the same
  * `latestOffset` admission rule on a Hadoop-FS listing, as Spark's
  * FileStreamSource does — the throttling logic is listing-layer and
  * carries over unchanged. */
class AlignedFileSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AlignedFileSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new AlignedFileTable
}

object AlignedFileSource {
  val schema: StructType = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** `(maxTsMillis, fileName)` for every data file under `path`,
    * event-time-ordered (name is the deterministic tie-break). */
  private[sources] def listFiles(path: String): Seq[(Long, String)] = {
    val dir = new java.io.File(path)
    val names = Option(dir.list()).getOrElse(Array.empty[String])
    names.toSeq
      .filter(n => n.endsWith(".csv") && n.takeWhile(_ != '-').nonEmpty &&
        n.takeWhile(_ != '-').forall(_.isDigit))
      .map(n => (n.takeWhile(_ != '-').toLong, n))
      .sortBy(identity)
  }

  /** The max event time encoded in the file name. */
  private[sources] def nameTs(name: String): Long =
    name.takeWhile(_ != '-').toLong
}

private final class AlignedFileTable extends Table with SupportsRead {
  override def name(): String = "graft_aligned_file"
  override def schema(): StructType = AlignedFileSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = AlignedFileSource.schema
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream = new AlignedMicroBatchStream(
          options.get("path"),
          Option(options.get("alignment.group")),
          Option(options.get("alignment.maxDriftMs"))
            .map(_.toLong).getOrElse(5000L),
          Option(options.get("alignment.watermarkDelayMs"))
            .map(_.toLong).getOrElse(0L),
          Option(options.get("alignment.compactRetentionMs"))
            .map(_.toLong).getOrElse(7L * 24 * 3600 * 1000))
      }
    }
}

/** Offset = a compaction high-watermark `hw` plus the event-time-sorted
  * list of admitted file names NOT covered by it. A file is admitted
  * iff its name-time is <= hw OR its name is listed. Names (not a
  * count) because a straggler file with a SMALL event time may appear
  * after larger ones were admitted — it joins the pending list and is
  * admitted next trigger without disturbing prior offsets. Invariant
  * maintained by the stream: only names present in a COMMITTED offset
  * ever fold into hw, so for any replannable (start, end) pair the
  * batch's files are all explicit in `end.files`. */
private final case class AlignedOffset(hw: Long, files: Seq[String])
    extends Offset {
  override def json(): String =
    s"""{"hw":$hw,"files":${files.map(f => "\"" + f + "\"")
      .mkString("[", ",", "]")}}"""
}

private object AlignedOffset {
  val initial: AlignedOffset = AlignedOffset(Long.MinValue, Nil)

  private def names(body: String): Seq[String] = {
    val b = body.trim.stripPrefix("[").stripSuffix("]").trim
    if (b.isEmpty) Nil
    else b.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
  }

  def fromJson(json: String): AlignedOffset = {
    val t = json.trim
    if (t.startsWith("[")) AlignedOffset(Long.MinValue, names(t)) // legacy
    else {
      val hw = t.split("\"hw\":")(1).takeWhile(c =>
        c == '-' || c.isDigit).toLong
      val fs = names(t.substring(t.indexOf('[')).stripSuffix("}"))
      AlignedOffset(hw, fs)
    }
  }
}

private final class AlignedMicroBatchStream(path: String,
    group: Option[String], maxDriftMs: Long, watermarkDelayMs: Long,
    compactRetentionMs: Long)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  require(path != null && path.nonEmpty, "path option is required")
  require(maxDriftMs > 0, "alignment.maxDriftMs must be positive")
  require(compactRetentionMs >= 0,
    "alignment.compactRetentionMs must be non-negative")

  /** The most recently COMMITTED offset — the compaction frontier.
    * Only names durably in here may fold into the hw of later offsets. */
  @volatile private var committed: AlignedOffset = AlignedOffset.initial

  /** Trigger.AvailableNow: the prepare-time listing snapshot. While
    * set, admission DRAINS exactly this set — alignment is suspended
    * (a drain-and-stop run has no peer sources to stay aligned with)
    * and files that appear after prepare wait for the next run, per
    * the SupportsTriggerAvailableNow contract. */
  @volatile private var availableNowTarget: Option[Set[String]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget =
      Some(AlignedFileSource.listFiles(path).map(_._2).toSet)

  override def initialOffset(): Offset = AlignedOffset.initial
  override def deserializeOffset(json: String): Offset =
    AlignedOffset.fromJson(json)
  override def commit(end: Offset): Unit =
    committed = AlignedOffset.fromJson(end.json())
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  // Never called once SupportsAdmissionControl is implemented; the
  // engine routes every poll through the two-arg overload.
  override def latestOffset(): Offset = throw new IllegalStateException(
    "latestOffset(start, limit) is the admission-controlled entry point")

  /** What is AVAILABLE right now — the full listing, independent of
    * the admission bound (see class scaladoc). Computed fresh so the
    * AvailableNow prepare-time snapshot and backlog metrics are valid
    * even before the first latestOffset(start, limit) poll. */
  override def reportLatestOffset(): Offset = {
    val all = AlignedFileSource.listFiles(path)
    val base = committed
    AlignedOffset(base.hw,
      all.collect { case (ts, n) if ts > base.hw => n }.sorted)
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startOff = Option(start).map(o => AlignedOffset.fromJson(o.json()))
      .getOrElse(AlignedOffset.initial)
    val admittedSet = startOff.files.toSet
    val all = AlignedFileSource.listFiles(path)
    all.foreach { case (_, n) => require(!n.contains("\"") && !n.contains(","),
      s"file name '$n' would corrupt the offset json") }
    // Source watermark from the OFFSET's own names (event time is in
    // the file name), never the listing — deleting an already-committed
    // file must not regress the watermark and re-open the bound.
    var sourceMaxTs = (startOff.hw +: startOff.files.map(
      AlignedFileSource.nameTs)).max
    val fileCap = limit match {
      case mf: ReadMaxFiles => mf.maxFiles()
      case _ => Int.MaxValue
    }
    val target = availableNowTarget
    // drain mode suspends alignment and pins the file set to the
    // prepare-time snapshot
    val groupWm =
      if (target.isDefined) None else group.flatMap(AlignmentGroups.get)
    val out = Seq.newBuilder[String]
    var n = 0
    var blocked = false
    // event-time order; stop at the FIRST held file so later (larger-ts)
    // files cannot overtake it — per-split pause, not per-row filtering.
    // The bound is checked against the watermark ALREADY admitted (see
    // class scaladoc): a source at/below the bound always admits the
    // next file, then pauses if that file pushed it past.
    for ((ts, name) <- all
         if ts > startOff.hw && !admittedSet(name) && !blocked && n < fileCap
           && target.forall(_(name))) {
      val ok = groupWm.forall(wm =>
        sourceMaxTs == Long.MinValue ||
        sourceMaxTs - watermarkDelayMs <= wm + maxDriftMs)
      if (ok) { out += name; sourceMaxTs = math.max(sourceMaxTs, ts); n += 1 }
      else blocked = true
    }
    // Compaction: fold names into hw once they are (a) committed and
    // (b) older than the retention window below the max committed event
    // time. A straggler with an event time under the new hw is dropped
    // by policy — FileStreamSource's maxFileAge makes the same trade.
    val base = committed
    val committedNames = base.files.toSet
    val maxCommittedTs = (base.hw +: base.files.map(
      AlignedFileSource.nameTs)).max
    val newHw =
      if (maxCommittedTs == Long.MinValue) startOff.hw // nothing committed yet
      else math.max(startOff.hw, maxCommittedTs - compactRetentionMs)
    val allNames = startOff.files ++ out.result()
    // Fold a name only when it is durably committed (explicitly or via
    // base.hw); an admitted-but-uncommitted name stays explicit even
    // under newHw so the in-flight batch remains replannable.
    val kept = allNames.distinct.filter(nm =>
      AlignedFileSource.nameTs(nm) > newHw ||
        !(committedNames(nm) || AlignedFileSource.nameTs(nm) <= base.hw))
    AlignedOffset(newHw, kept.sorted)
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = AlignedOffset.fromJson(start.json())
    val e = AlignedOffset.fromJson(end.json()).files
    val sNames = s.files.toSet
    // Everything admitted by `end` but not by `start` is explicit in
    // end.files (only committed names — necessarily already in start —
    // fold into hw; see AlignedOffset scaladoc).
    e.filter(n => !sNames(n) && AlignedFileSource.nameTs(n) > s.hw)
      .map(n => AlignedFilePartition(new java.io.File(path, n).getPath)
        : InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AlignedReaderFactory
}

private final case class AlignedFilePartition(file: String)
    extends InputPartition

private final class AlignedReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[AlignedFilePartition].file
    AlignedReadCounter.opened.add(file)
    new PartitionReader[InternalRow] {
      private val lines = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(file)).asScala.iterator
        .map(_.trim).filter(_.nonEmpty)
      private var row: InternalRow = _
      override def next(): Boolean =
        if (!lines.hasNext) false
        else {
          val l = lines.next()
          val i = l.indexOf(',')
          row = InternalRow(l.substring(0, i).toLong * 1000L,
            UTF8String.fromString(l.substring(i + 1)))
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

/** Test observability: which files were physically OPENED — the
  * held-means-unread claim is asserted against this, not against sink
  * contents (a buffering aligner would also keep rows out of the sink;
  * only a throttling source keeps the FILE unopened). */
object AlignedReadCounter {
  val opened: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def clear(): Unit = opened.clear()
  def openedNames: Set[String] =
    opened.asScala.map(f => new java.io.File(f).getName).toSet
}
