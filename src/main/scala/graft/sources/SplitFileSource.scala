package graft.sources

import scala.collection.JavaConverters._
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** PER-SPLIT watermark semantics — the reference's SourceOperator
  * machinery (flink-runtime/.../source/operator/SourceOperator.java:
  * one WatermarkGenerator per split via WatermarkMultiplexer;
  * flink-core/.../eventtime/WatermarksWithIdleness.java: a split with
  * no data for the idleness timeout stops holding the combined
  * watermark back; IndexedCombinedWatermarkStatus: the operator
  * watermark is the MIN over ACTIVE splits). Spark has no per-split
  * watermark hook — its global watermark is max-seen-minus-delay over
  * the whole batch — so the semantics are enforced where the reference
  * enforces them: at the SOURCE, by admission control. Each trigger
  * admits files per split only while that split's own watermark stays
  * within `maxDriftMs` of the combined (min-over-active-splits)
  * watermark, so no split's admitted data can outrun the slowest
  * active split by more than the drift bound, and therefore the
  * query-global watermark is automatically within drift of every
  * active split's — exactly the property the reference's per-split
  * generators guarantee downstream.
  *
  * Layout: each SUBDIRECTORY of `path` is one split (the analogue of a
  * Kafka partition / file-source split); files inside follow the
  * [[AlignedFileSource]] convention `<maxEventTimeMillis>-<x>.csv` of
  * `epochMillis,value` rows. The emitted schema gains a `split`
  * column so tests (and users) can observe per-split progress.
  *
  * Semantics, per trigger:
  *  - split watermark = max admitted event time (name-derived) in that
  *    split; a split that has admitted nothing contributes
  *    Long.MinValue — a brand-new split HOLDS the combined watermark,
  *    as a new reader with no records does in the reference, until
  *    idleness (below) releases it.
  *  - combined watermark = MIN over ACTIVE splits' watermarks.
  *  - a split is IDLE when it has no pending files and has admitted
  *    nothing new for `idlenessMs` of processing time
  *    (WatermarksWithIdleness); idle splits are excluded from the MIN.
  *    A split with pending files is never idle — a split paused by the
  *    drift bound is backlogged, not idle, and keeps holding the
  *    combined watermark (pausing it is the point).
  *  - admission per split, files in event-time order: admit while the
  *    split's CURRENT watermark <= combined + maxDriftMs (the
  *    one-more-file rule of [[AlignedFileSource]]: the bound is
  *    checked on what was already admitted, so the slowest split —
  *    whose watermark IS the combined — always makes progress; a
  *    fast split at the bound admits one bound-crossing file, then
  *    pauses).
  *  - offsets compact per split exactly like [[AlignedFileSource]]
  *    (committed names older than `compactRetentionMs` under the
  *    split's max committed event time fold into a per-split high
  *    watermark).
  *
  * Idleness is processing-time state and intentionally NOT persisted
  * in offsets — the reference's idleness timers likewise restart on
  * recovery (WatermarksWithIdleness keeps no checkpointed state).
  *
  * Options: `path` (required), `split.maxDriftMs` (default 5000),
  * `split.idlenessMs` (default Long.MaxValue = never idle),
  * `split.compactRetentionMs` (default 7 days). */
class SplitFileSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SplitFileSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SplitFileTable
}

object SplitFileSource {
  import org.apache.spark.sql.types.{StringType, StructField, TimestampType}
  val schema: StructType = StructType(Seq(
    StructField("split", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** Injectable processing-time clock (tests drive idleness
    * deterministically). */
  @volatile var nowMs: () => Long = () => System.currentTimeMillis()

  /** Subdirectory names under `path` = the live split set. */
  private[sources] def listSplits(path: String): Seq[String] = {
    val dir = new java.io.File(path)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
  }
}

private final class SplitFileTable extends Table with SupportsRead {
  override def name(): String = "graft_split_file"
  override def schema(): StructType = SplitFileSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = SplitFileSource.schema
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream = new SplitMicroBatchStream(
          options.get("path"),
          Option(options.get("split.maxDriftMs"))
            .map(_.toLong).getOrElse(5000L),
          Option(options.get("split.idlenessMs"))
            .map(_.toLong).getOrElse(Long.MaxValue),
          Option(options.get("split.compactRetentionMs"))
            .map(_.toLong).getOrElse(7L * 24 * 3600 * 1000))
      }
    }
}

/** Offset = per-split (hw, admitted-files) in split-name order. Same
  * per-split semantics as [[AlignedOffset]]: a file is admitted iff
  * its name-time is <= the split's hw or its name is listed. */
private final case class SplitOffset(splits: Map[String, (Long, Seq[String])])
    extends Offset {
  override def json(): String =
    splits.toSeq.sortBy(_._1).map { case (s, (hw, fs)) =>
      s""""$s":{"hw":$hw,"files":${fs.map(f => "\"" + f + "\"")
        .mkString("[", ",", "]")}}"""
    }.mkString("{", ",", "}")
}

private object SplitOffset {
  val initial: SplitOffset = SplitOffset(Map.empty)

  def fromJson(json: String): SplitOffset = {
    val t = json.trim.stripPrefix("{").stripSuffix("}").trim
    if (t.isEmpty) initial
    else SplitOffset(t.split("""},""").toSeq.map { entry =>
      val e = entry.trim.stripSuffix("}")
      val nameEnd = e.indexOf('"', 1)
      val name = e.substring(1, nameEnd)
      // search the FIELD key strictly after the split name — a split
      // literally named "hw" must not hijack the parse
      val rest = e.substring(nameEnd + 1)
      val hw = rest.split("\"hw\":")(1).takeWhile(c => c == '-' || c.isDigit)
        .toLong
      val body = rest.substring(rest.indexOf('[') + 1).stripSuffix("]").trim
      val files =
        if (body.isEmpty) Nil
        else body.split(",").toSeq
          .map(_.trim.stripPrefix("\"").stripSuffix("\""))
      name -> (hw, files)
    }.toMap)
  }
}

private final class SplitMicroBatchStream(path: String, maxDriftMs: Long,
    idlenessMs: Long, compactRetentionMs: Long)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  require(path != null && path.nonEmpty, "path option is required")
  require(maxDriftMs > 0, "split.maxDriftMs must be positive")
  require(idlenessMs > 0, "split.idlenessMs must be positive")

  @volatile private var committed: SplitOffset = SplitOffset.initial

  /** Trigger.AvailableNow: drain the prepare-time snapshot with the
    * alignment bound suspended — a drain-and-stop run has no live
    * sibling splits to pace against, and a paused split would
    * otherwise make the single-batch fallback TERMINATE with admitted
    * data missing (the AlignedFileSource drain-mode rationale). Files
    * appearing after prepare wait for the next run. */
  @volatile private var availableNowTarget
      : Option[Map[String, Set[String]]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(SplitFileSource.listSplits(path).map(sp =>
      sp -> AlignedFileSource.listFiles(s"$path/$sp").map(_._2).toSet)
      .toMap)

  /** split -> processing time of the last NEW file admitted (or first
    * sighting). Transient — see class scaladoc on idleness recovery. */
  private val lastActivity = TrieMap.empty[String, Long]

  override def initialOffset(): Offset = SplitOffset.initial
  override def deserializeOffset(json: String): Offset =
    SplitOffset.fromJson(json)
  override def commit(end: Offset): Unit =
    committed = SplitOffset.fromJson(end.json())
  override def stop(): Unit = ()
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(): Offset = throw new IllegalStateException(
    "latestOffset(start, limit) is the admission-controlled entry point")

  /** AVAILABLE files per split (full listing), independent of
    * admission — backlog metrics / AvailableNow snapshot. */
  override def reportLatestOffset(): Offset = {
    val base = committed.splits
    SplitOffset(SplitFileSource.listSplits(path).map { sp =>
      val hw = base.get(sp).map(_._1).getOrElse(Long.MinValue)
      sp -> (hw, AlignedFileSource.listFiles(s"$path/$sp")
        .collect { case (ts, n) if ts > hw => n }.sorted)
    }.toMap)
  }

  /** The combined (min-over-active-splits) watermark as of the last
    * poll — observable for tests and operators. */
  @volatile private[sources] var combinedWatermark: Long = Long.MinValue

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val now = SplitFileSource.nowMs()
    val startOff = Option(start).map(o => SplitOffset.fromJson(o.json()))
      .getOrElse(SplitOffset.initial)
    // Union in splits known only from offset state: a split directory
    // that is deleted (or transiently missing from a listing) must
    // carry its (hw, files) state forward unchanged, not be erased —
    // erasing it would re-admit every file (duplicate rows) when the
    // directory reappears. A carried split has no pending files, so it
    // ages into idleness like any drained split.
    val splits = (SplitFileSource.listSplits(path) ++
      startOff.splits.keys ++ committed.splits.keys).distinct.sorted
    splits.foreach(s => require(s.forall(c =>
      c.isLetterOrDigit || c == '_' || c == '-'),
      s"split name '$s' would corrupt the offset json"))
    val fileCap = limit match {
      case mf: ReadMaxFiles => mf.maxFiles()
      case _ => Int.MaxValue
    }
    // per-split state as of the START offset
    final case class S(hw: Long, files: Seq[String], pending: Seq[(Long, String)])
    val st = splits.map { sp =>
      val (hw, files) = startOff.splits.getOrElse(sp, (Long.MinValue, Nil))
      val admitted = files.toSet
      val pending = AlignedFileSource.listFiles(s"$path/$sp")
        .filter { case (ts, n) => ts > hw && !admitted(n) }
      pending.foreach { case (_, n) =>
        require(!n.exists(c => c == '"' || c == ',' || c == '{' || c == '}'),
          s"file name '$n' would corrupt the offset json") }
      // activity: first sighting, or new pending data, marks the split active
      if (pending.nonEmpty || !lastActivity.contains(sp))
        lastActivity.update(sp, math.max(lastActivity.getOrElse(sp, 0L), now))
      sp -> S(hw, files,  pending)
    }.toMap
    def splitWm(sp: String): Long =
      (st(sp).hw +: st(sp).files.map(AlignedFileSource.nameTs)).max
    def isIdle(sp: String): Boolean =
      st(sp).pending.isEmpty &&
        now - lastActivity.getOrElse(sp, now) >= idlenessMs
    val active = splits.filterNot(isIdle)
    // combined watermark: MIN over active splits (WatermarkAggregator /
    // IndexedCombinedWatermarkStatus). All-idle => keep the last value
    // (monotonic; the reference marks the source idle downstream).
    val combined =
      if (active.isEmpty) combinedWatermark
      else math.max(combinedWatermark, active.map(splitWm).min)
    combinedWatermark = combined
    val target = availableNowTarget
    // drain mode: alignment suspended, file set pinned to the snapshot
    val drift = if (target.isDefined) Long.MaxValue else maxDriftMs
    var n = 0
    val out = splits.map { sp =>
      var wm = splitWm(sp)
      val adm = Seq.newBuilder[String]
      var blocked = false
      for ((ts, name) <- st(sp).pending
           if !blocked && n < fileCap &&
             target.forall(_.getOrElse(sp, Set.empty)(name))) {
        // one-more-file rule: bound checked on the split's CURRENT
        // watermark, so the slowest split (wm == combined) always
        // progresses; a fast split admits the bound-crossing file then
        // pauses (see AlignedFileSource scaladoc for the liveness
        // argument)
        if (wm == Long.MinValue || drift == Long.MaxValue ||
            wm <= combined + drift) {
          adm += name; wm = math.max(wm, ts); n += 1
          lastActivity.update(sp, now)
        } else blocked = true
      }
      sp -> adm.result()
    }.toMap
    // per-split compaction against the COMMITTED offset (same rule as
    // AlignedFileSource: only committed names fold into hw)
    val res = splits.map { sp =>
      val (baseHw, baseFiles) = committed.splits
        .getOrElse(sp, (Long.MinValue, Nil))
      val committedNames = baseFiles.toSet
      val maxCommittedTs =
        (baseHw +: baseFiles.map(AlignedFileSource.nameTs)).max
      val newHw =
        if (maxCommittedTs == Long.MinValue) st(sp).hw
        else math.max(st(sp).hw, maxCommittedTs - compactRetentionMs)
      val allNames = st(sp).files ++ out(sp)
      val kept = allNames.distinct.filter(nm =>
        AlignedFileSource.nameTs(nm) > newHw ||
          !(committedNames(nm) || AlignedFileSource.nameTs(nm) <= baseHw))
      sp -> (newHw, kept.sorted)
    }.toMap
    SplitOffset(res)
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = SplitOffset.fromJson(start.json()).splits
    val e = SplitOffset.fromJson(end.json()).splits
    e.toSeq.sortBy(_._1).flatMap { case (sp, (_, files)) =>
      val (sHw, sFiles) = s.getOrElse(sp, (Long.MinValue, Nil))
      val sNames = sFiles.toSet
      files.filter(n => !sNames(n) && AlignedFileSource.nameTs(n) > sHw)
        .map(n => SplitFilePartition(sp,
          new java.io.File(s"$path/$sp", n).getPath): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SplitReaderFactory
}

private final case class SplitFilePartition(split: String, file: String)
    extends InputPartition

private final class SplitReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SplitFilePartition]
    AlignedReadCounter.opened.add(p.file)
    new PartitionReader[InternalRow] {
      private val lines = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(p.file)).asScala.iterator
        .map(_.trim).filter(_.nonEmpty)
      private var row: InternalRow = _
      override def next(): Boolean =
        if (!lines.hasNext) false
        else {
          val l = lines.next()
          val i = l.indexOf(',')
          row = InternalRow(UTF8String.fromString(p.split),
            l.substring(0, i).toLong * 1000L,
            UTF8String.fromString(l.substring(i + 1)))
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
