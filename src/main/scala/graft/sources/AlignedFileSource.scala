package graft.sources

import java.util.concurrent.ConcurrentHashMap

import scala.collection.JavaConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.types.{StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Watermark-ALIGNMENT group registry — the coordinator half of
  * FLIP-182 (reference: flink-core/.../eventtime/WatermarkStrategy.java
  * `withWatermarkAlignment(group, maxDrift, interval)` and
  * flink-runtime/.../source/coordinator/SourceCoordinator.java's
  * alignment announcements): sources that share a group name observe a
  * combined watermark and PAUSE reading once they run more than
  * `maxDrift` ahead of it.
  *
  * In Spark's micro-batch model the combined watermark of one query is
  * its global watermark (the MIN over watermark nodes — exactly the
  * reference's group minimum). [[attach]] bridges it here through a
  * `StreamingQueryListener`; [[publish]] sets it directly (cross-query
  * groups, tests, or an external coordinator). Values are monotonic
  * per group, like the reference's combined watermark. */
object AlignmentGroups {
  private val groups = new ConcurrentHashMap[String, java.lang.Long]()

  /** Current group watermark in epoch millis, if any member published. */
  def get(group: String): Option[Long] = Option(groups.get(group)).map(_.longValue)

  /** Monotonic publish (stale/smaller values are ignored). */
  def publish(group: String, watermarkMs: Long): Unit =
    groups.merge(group, java.lang.Long.valueOf(watermarkMs),
      (a, b) => if (a.longValue >= b.longValue) a else b)

  /** Forget a group (tests / teardown). */
  def clear(group: String): Unit = groups.remove(group)

  /** Feed a running query's global watermark into `group` after every
    * progress event. Returns the listener so callers can detach. */
  def attach(spark: SparkSession, group: String): StreamingQueryListener = {
    val l = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val wm = Option(e.progress.eventTime.get("watermark"))
        wm.foreach(ts => publish(group,
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
  * Options: `path` (required), `alignment.group`,
  * `alignment.maxDriftMs` (default 5000), `alignment.watermarkDelayMs`
  * (default 0). `ReadLimit.maxFiles` is honored on top of the
  * alignment bound. Scale note: this source demonstrates the alignment
  * mechanics end-to-end; a production deployment would put the same
  * `latestOffset` admission rule on a Hadoop-FS listing with a
  * compacted metadata log, as Spark's FileStreamSource does — the
  * throttling logic is listing-layer and carries over unchanged. */
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
            .map(_.toLong).getOrElse(0L))
      }
    }
}

/** Offset = the event-time-sorted list of admitted file names. A set
  * (not a count) because a straggler file with a SMALL event time may
  * appear after larger ones were admitted — it joins the pending list
  * and is admitted next trigger without disturbing prior offsets. */
private final case class AlignedOffset(files: Seq[String]) extends Offset {
  override def json(): String =
    files.map(f => "\"" + f + "\"").mkString("[", ",", "]")
}

private object AlignedOffset {
  def fromJson(json: String): AlignedOffset = {
    val body = json.trim.stripPrefix("[").stripSuffix("]").trim
    if (body.isEmpty) AlignedOffset(Nil)
    else AlignedOffset(body.split(",").toSeq
      .map(_.trim.stripPrefix("\"").stripSuffix("\"")))
  }
}

private final class AlignedMicroBatchStream(path: String,
    group: Option[String], maxDriftMs: Long, watermarkDelayMs: Long)
    extends MicroBatchStream with SupportsAdmissionControl {
  require(path != null && path.nonEmpty, "path option is required")
  require(maxDriftMs > 0, "alignment.maxDriftMs must be positive")

  @volatile private var lastAdmitted: AlignedOffset = AlignedOffset(Nil)

  override def initialOffset(): Offset = AlignedOffset(Nil)
  override def deserializeOffset(json: String): Offset =
    AlignedOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  // Never called once SupportsAdmissionControl is implemented; the
  // engine routes every poll through the two-arg overload.
  override def latestOffset(): Offset = throw new IllegalStateException(
    "latestOffset(start, limit) is the admission-controlled entry point")

  override def reportLatestOffset(): Offset = lastAdmitted

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val admitted = Option(start).map(o =>
      AlignedOffset.fromJson(o.json()).files).getOrElse(Nil)
    val admittedSet = admitted.toSet
    val all = AlignedFileSource.listFiles(path)
    all.foreach { case (_, n) => require(!n.contains("\"") && !n.contains(","),
      s"file name '$n' would corrupt the offset json") }
    var sourceMaxTs = all.collect {
      case (ts, n) if admittedSet(n) => ts }.foldLeft(Long.MinValue)(math.max)
    val fileCap = limit match {
      case mf: ReadMaxFiles => mf.maxFiles()
      case _ => Int.MaxValue
    }
    val groupWm = group.flatMap(AlignmentGroups.get)
    val out = Seq.newBuilder[String]
    var n = 0
    var blocked = false
    // event-time order; stop at the FIRST held file so later (larger-ts)
    // files cannot overtake it — per-split pause, not per-row filtering.
    // The bound is checked against the watermark ALREADY admitted (see
    // class scaladoc): a source at/below the bound always admits the
    // next file, then pauses if that file pushed it past.
    for ((ts, name) <- all if !admittedSet(name) && !blocked && n < fileCap) {
      val ok = groupWm.forall(wm =>
        sourceMaxTs == Long.MinValue ||
        sourceMaxTs - watermarkDelayMs <= wm + maxDriftMs)
      if (ok) { out += name; sourceMaxTs = math.max(sourceMaxTs, ts); n += 1 }
      else blocked = true
    }
    val res = AlignedOffset((admitted ++ out.result()).distinct.sorted)
    lastAdmitted = res
    res
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = AlignedOffset.fromJson(start.json()).files.toSet
    val e = AlignedOffset.fromJson(end.json()).files
    e.filterNot(s).map(n =>
      AlignedFilePartition(new java.io.File(path, n).getPath)
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
